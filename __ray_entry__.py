"""Driver contract for the graft builder (Ray Data target).

Ray is initialised by the driver BEFORE this module is imported: nothing
here (or in the library code) calls ``ray.init`` / ``ray.shutdown``.

``entry()`` runs the flagship extraction pipeline; ``queries()`` exposes
one entry per implemented operator/pipeline from SURVEY.md §2;
``oracle_sql()`` gives the DuckDB-equivalent SQL for every
SQL-expressible query (the rest get the driver's rows-only check).
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable
from typing import Any

_REPO = os.path.dirname(os.path.abspath(__file__))
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)

# Ray workers spawned by the already-running driver session may not have
# this repo on their import path; ship the package by value instead.
try:
    import barks_ocr_ray
    from ray import cloudpickle

    cloudpickle.register_pickle_by_value(barks_ocr_ray)
except Exception:  # pragma: no cover - ray not importable yet
    pass


def entry() -> Any:
    """Flagship pipeline: read the sf0.001 documents table (smoke that the
    testdata path works), then run the full extraction pipeline — sniff ->
    dedup(url) -> actor-pool extract with oversize routing — over the
    deterministically synthesized sf0.001-scale pages corpus."""
    from barks_ocr_ray.pipelines.queries import q24_extraction_pipeline, read_table

    read_table("/root/testdata/sf0.001", "documents", ["doc_id"]).count()
    return q24_extraction_pipeline("/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[str], Any]]:
    from barks_ocr_ray.pipelines.queries import build_registry

    return build_registry()[0]


def oracle_sql() -> dict[str, str]:
    from barks_ocr_ray.pipelines.queries import build_registry

    return build_registry()[1]
