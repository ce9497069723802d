"""Report/queue sinks and auxiliary sources (SURVEY.md §2.1 parity).

* ``write_queue_file`` — the queue-file sink family (S13): typed issue
  records deduped on their key and lexically sorted, written as a single
  text work-list (the hand-off unit between automated checkers and a
  human editor: writers at /root/reference/src/barks_ocr/tools/ocr_check.py:521-538,
  /root/reference/src/barks_ocr/pipeline/whoosh_index.py:159-181).
* ``write_text_report`` — the fixed-width formatted debug dump (S6,
  /root/reference/src/barks_ocr/pipeline/gemini_grouper.py:339-358) with
  the per-file max-width aggregation done as a global aggregate.
* ``read_csv_table`` / ``write_jsonl`` / ``read_jsonl`` — CSV source
  (S14) and the JSONL request/result round-trip (S7/S8) as plain Ray Data
  sources/sinks keyed by url — the positional file_index join (J6) is
  eliminated by construction.
"""

from __future__ import annotations

import os

import ray.data as rd
from ray.data import Dataset


def write_queue_file(
    ds: Dataset, path: str, key_cols: list[str], *, sep: str = " "
) -> int:
    """Dedup on the key columns, sort lexically, write one line per
    record. Driver-local materialization is fine: queue files are small
    by design (human-reviewed). Returns the number of lines."""
    tbl = ds.select_columns(key_cols).to_pandas()
    lines = sorted(
        {sep.join(str(v) for v in row) for row in tbl.itertuples(index=False)}
    )
    tmp = path + ".tmp"
    with open(tmp, "w") as f:
        for line in lines:
            f.write(line + "\n")
    os.replace(tmp, path)
    return len(lines)


def write_text_report(
    ds: Dataset, path: str, cols: list[str], *, max_col_width: int = 60
) -> int:
    """Fixed-width formatted dump; column widths = global max over the
    data (A5 analog), capped. Debug sink — materializes on the driver."""
    tbl = ds.select_columns(cols).to_pandas()
    widths = {
        c: min(max_col_width, max([len(c)] + [len(str(v)) for v in tbl[c]]))
        for c in cols
    }
    tmp = path + ".tmp"
    with open(tmp, "w") as f:
        f.write(
            "  ".join(c.ljust(widths[c]) for c in cols).rstrip() + "\n"
        )
        for row in tbl.itertuples(index=False):
            f.write(
                "  ".join(
                    str(v)[: widths[c]].ljust(widths[c])
                    for c, v in zip(cols, row)
                ).rstrip()
                + "\n"
            )
    os.replace(tmp, path)
    return len(tbl)


def read_csv_table(path: str, **kwargs) -> Dataset:
    from barks_ocr_ray.context import configure

    configure()
    return rd.read_csv(path, **kwargs)


def write_jsonl(ds: Dataset, dir_path: str) -> None:
    ds.write_json(dir_path)


def read_jsonl(dir_path: str) -> Dataset:
    from barks_ocr_ray.context import configure

    configure()
    return rd.read_json(dir_path)
