import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO not in sys.path:
    sys.path.insert(0, REPO)
# workers inherit this env (set before ray.init) so they can import the pkg
os.environ["PYTHONPATH"] = (
    REPO + os.pathsep + os.environ.get("PYTHONPATH", "")
).rstrip(os.pathsep)

import pytest  # noqa: E402
import ray  # noqa: E402


@pytest.fixture(scope="session", autouse=True)
def ray_session():
    """Initialise Ray ONCE per pytest session (driver contract)."""
    from barks_ocr_ray.context import configure

    ray.init(
        address="local",
        num_cpus=4,
        include_dashboard=False,
        ignore_reinit_error=True,
        logging_level="ERROR",
    )
    configure()
    yield
    ray.shutdown()
