"""Query registry hub — the 296-query surface, split (round 5,
VERDICT r4 §7) into ordered band modules under
``barks_ocr_ray/pipelines/qband/``.

The split is ORDER-PRESERVING and chained: each band module does
``from <previous band> import *`` and re-exports its whole namespace, so
every top-level name (queries, SQL oracles, shared helpers, constants)
still resolves exactly as it did in the single file, and this hub
re-exports the union — ``from barks_ocr_ray.pipelines.queries import
anything`` keeps working, no query renames. build_registry() lives in
the last band.

Band map (ordered by query number, the build's wave order):
* qband/b01_relational_extraction.py
* qband/b02_text_search_windows.py
* qband/b03_dedup_quality_prep.py
* qband/b04_curation_splits_sketches.py
* qband/b05_graph_embeddings_ranking.py
* qband/b06_sessions_stats_drift.py
* qband/b07_estimators_audits.py
* qband/b08_waves_r4_r5_registry.py
"""

from barks_ocr_ray.pipelines.qband.b08_waves_r4_r5_registry import *  # noqa: F401,F403

__all__ = [_n for _n in dict(globals()) if not _n.startswith("__")]
