"""Run EVERY registered query in the driver's exact conditions: a fresh
process, ray.init before __ray_entry__ import, NO PYTHONPATH — workers
resolve our code only through cloudpickle by-value shipping. Catches
worker-body package imports that pytest's PYTHONPATH masks.

    python tools/driver_smoke.py [sf_dir]
"""

import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

_SCRIPT = r"""
import ray, sys, os, importlib.util
os.environ.pop("PYTHONPATH", None)
ray.init(address="local", num_cpus=8, include_dashboard=False,
         logging_level="ERROR")
sys.path.insert(0, {repo!r})
spec = importlib.util.spec_from_file_location(
    "__ray_entry__", os.path.join({repo!r}, "__ray_entry__.py"))
m = importlib.util.module_from_spec(spec)
spec.loader.exec_module(m)
qs = m.queries()
import ray.data as rd
bad = []
for name, fn in qs.items():
    try:
        r = fn({sf_dir!r})
        n = r.count() if isinstance(r, rd.Dataset) else len(r)
        print("ok  ", name, n, flush=True)
    except Exception as e:
        bad.append(name)
        print("FAIL", name, type(e).__name__, str(e)[:160], flush=True)
print("FAILURES:", len(bad), bad, flush=True)
ray.shutdown()
sys.exit(1 if bad else 0)
"""


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    env = {k: v for k, v in os.environ.items() if k != "PYTHONPATH"}
    env["RAY_ADDRESS"] = "local"
    proc = subprocess.run(
        [sys.executable, "-c", _SCRIPT.format(repo=REPO, sf_dir=sf_dir)],
        env=env,
        cwd="/tmp",
    )
    return proc.returncode


if __name__ == "__main__":
    raise SystemExit(main())
