"""Contracts for the dataset-maintenance operators (q96/q97 machinery):
union-by-name schema-evolution reads with typed nulls, widening casts,
and small-file compaction that preserves content while hitting the file
size target."""

import os

import pyarrow as pa
import pyarrow.parquet as pq


def _write(path, table):
    os.makedirs(os.path.dirname(path), exist_ok=True)
    pq.write_table(table, path)


def test_evolving_read_nulls_missing_columns(ray_session, tmp_path):
    from barks_ocr_ray.functions.storage import read_evolving_parquet

    a = str(tmp_path / "gen_a")
    b = str(tmp_path / "gen_b")
    _write(
        f"{a}/p0.parquet",
        pa.table({"id": pa.array([1, 2], pa.int64()), "x": ["u", "v"]}),
    )
    _write(
        f"{b}/p0.parquet",
        pa.table(
            {"id": pa.array([3], pa.int64()), "y": pa.array([9], pa.int64())}
        ),
    )
    out = read_evolving_parquet([a, b])
    assert out.schema().names == ["id", "x", "y"]
    rows = sorted(out.take_all(), key=lambda r: r["id"])
    assert rows[0] == {"id": 1, "x": "u", "y": None}
    assert rows[2] == {"id": 3, "x": None, "y": 9}


def test_evolving_read_widens_types_first_seen_wins(ray_session, tmp_path):
    from barks_ocr_ray.functions.storage import read_evolving_parquet

    a = str(tmp_path / "wide")
    b = str(tmp_path / "narrow")
    _write(f"{a}/p0.parquet", pa.table({"v": pa.array([1], pa.int64())}))
    _write(f"{b}/p0.parquet", pa.table({"v": pa.array([2], pa.int32())}))
    out = read_evolving_parquet([a, b])
    assert out.schema().types == [pa.int64()]
    assert sorted(r["v"] for r in out.take_all()) == [1, 2]


def test_evolving_read_empty_dirs_typed_empty(ray_session, tmp_path):
    from barks_ocr_ray.functions.storage import read_evolving_parquet

    d = str(tmp_path / "nothing")
    os.makedirs(d)
    out = read_evolving_parquet([d])
    assert out.count() == 0


def test_compaction_reduces_files_and_preserves_rows(
    ray_session, tmp_path
):
    from barks_ocr_ray.functions.storage import (
        _dir_parquet_files,
        compact_parquet,
    )

    small = str(tmp_path / "small")
    for i in range(20):
        _write(
            f"{small}/part-{i:03d}.parquet",
            pa.table(
                {
                    "id": pa.array(
                        range(i * 50, (i + 1) * 50), pa.int64()
                    ),
                    "v": pa.array([i] * 50, pa.int64()),
                }
            ),
        )
    out = str(tmp_path / "compacted")
    stats = compact_parquet(small, out, target_rows_per_file=500)
    assert stats == {
        "files_before": 20,
        "files_after": 2,
        "rows": 1000,
    }
    got = pq.ParquetDataset(_dir_parquet_files(out)).read()
    assert sorted(got.column("id").to_pylist()) == list(range(1000))
