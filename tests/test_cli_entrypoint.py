"""The cluster job entrypoint (tools/run_extraction.py) runs from a
fresh process with no PYTHONPATH, produces byte-exact output, and its
--resume mode skips committed buckets on the second run."""

import json
import os
import shutil
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _run(args):
    env = {
        k: v
        for k, v in os.environ.items()
        if k not in ("PYTHONPATH", "RAY_ADDRESS")
    }
    env["RAY_ADDRESS"] = "local"
    out = subprocess.run(
        [sys.executable, os.path.join(REPO, "tools", "run_extraction.py")]
        + args,
        capture_output=True,
        text=True,
        env=env,
        timeout=300,
    )
    assert out.returncode == 0, out.stderr[-2000:]
    return json.loads(out.stdout.strip().splitlines()[-1])


def test_cli_entrypoint_and_resume(tmp_path):
    import pyarrow.dataset as pads

    from barks_ocr_ray.datagen import write_pages_corpus
    from barks_ocr_ray.extract.golden import golden_corpus

    pages = str(tmp_path / "pages")
    out_dir = str(tmp_path / "out")
    write_pages_corpus(pages, 200, rows_per_file=100)

    s1 = _run(
        ["--input", pages, "--output", out_dir, "--resume",
         "--num-buckets", "8", "--num-partitions", "8"]
    )
    assert s1["resume"]["computed"] == 8 and s1["resume"]["skipped"] == 0
    got = pads.dataset(out_dir).to_table().to_pandas().set_index("url")
    gold = golden_corpus(200)
    assert set(got.index) == set(gold)
    assert all(
        got.loc[u, "extracted_text"] == g["extracted_text"]
        for u, g in gold.items()
    )

    s2 = _run(
        ["--input", pages, "--output", out_dir, "--resume",
         "--num-buckets", "8", "--num-partitions", "8"]
    )
    assert s2["resume"]["skipped"] == 8 and s2["resume"]["computed"] == 0
    assert s2["resume"]["input_scans"] == 0
    shutil.rmtree(pages, ignore_errors=True)
