"""Curated-dictionary entity tagging (deterministic subset of the
reference's spaCy EntityTagger, SURVEY.md §7.1 stage 9): an actor-pool
stage whose compiled per-entity regexes are built once per actor
(/root/reference/src/barks_ocr/pipeline/entity_tagger.py:38-60 builds its
curated maps + rules in __init__ the same way)."""

from __future__ import annotations

import re

import pyarrow as pa
from ray.data import Dataset

#: curated entity dictionary (names drawn from the documents-table
#: vocabulary so the tagger has real hits to find)
CURATED_ENTITIES: dict[str, str] = {
    "spark": "ENGINE",
    "table": "SCHEMA_OBJECT",
    "row": "SCHEMA_OBJECT",
    "column": "SCHEMA_OBJECT",
    "join": "OPERATOR",
    "filter": "OPERATOR",
    "scan": "OPERATOR",
    "merge": "OPERATOR",
    "hash": "OPERATOR",
    "window": "OPERATOR",
    "customer": "TABLE_NAME",
    "order": "TABLE_NAME",
}


class EntityTagger:
    """Stateful tagger: compiled word-boundary regex per entity."""

    def __init__(self, entities: dict[str, str] | None = None):
        self.entities = entities or CURATED_ENTITIES
        self.patterns = {
            name: re.compile(rf"\b{re.escape(name)}\b")
            for name in self.entities
        }

    def __call__(self, batch: pa.Table) -> pa.Table:
        doc_ids, names, types, counts = [], [], [], []
        id_col = batch.column("doc_id").to_pylist()
        for i, s in enumerate(batch.column("text")):
            text = (s.as_py() or "").lower()
            for name in sorted(self.entities):
                n = len(self.patterns[name].findall(text))
                if n > 0:
                    doc_ids.append(id_col[i])
                    names.append(name)
                    types.append(self.entities[name])
                    counts.append(n)
        return pa.table(
            {
                "doc_id": pa.array(doc_ids, pa.int64()),
                "name": pa.array(names, pa.string()),
                "entity_type": pa.array(types, pa.string()),
                "n": pa.array(counts, pa.int64()),
            }
        )


def tag_entities(
    docs: Dataset,
    entities: dict[str, str] | None = None,
    concurrency: int = 4,
) -> Dataset:
    return docs.map_batches(
        EntityTagger,
        fn_constructor_kwargs={"entities": entities},
        batch_format="pyarrow",
        concurrency=(1, concurrency),
    )
