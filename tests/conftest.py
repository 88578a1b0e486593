"""Test env bootstrap.

Tests run on the JAX CPU backend with 8 virtual devices so sharding paths are
exercised without TPU hardware (SURVEY.md §4 item 6).  The sandbox's
sitecustomize eagerly registers the axon TPU plugin at interpreter start, and
an in-process JAX_PLATFORMS override does NOT win against it — so if the env
isn't already clean we re-exec the interpreter once with a corrected env.
"""

import os
import sys

if os.environ.get("NGMTPU_TEST_ENV") != "1":
    # pytest's fd-level capture is already active during conftest import; stop
    # it so the re-exec'd child inherits the real stdout/stderr.
    try:
        import gc

        from _pytest.capture import CaptureManager

        for _obj in gc.get_objects():
            if isinstance(_obj, CaptureManager):
                _obj.stop_global_capturing()
    except Exception:
        pass
    env = dict(os.environ)
    env.pop("PALLAS_AXON_POOL_IPS", None)  # prevents axon plugin registration
    env["JAX_PLATFORMS"] = "cpu"
    env["XLA_FLAGS"] = (
        env.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
    ).strip()
    env["NGMTPU_TEST_ENV"] = "1"
    os.execve(sys.executable, [sys.executable, "-m", "pytest"] + sys.argv[1:], env)

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402
import pytest  # noqa: E402

from nextgenmap_tpu.index.genome import Genome  # noqa: E402
from nextgenmap_tpu.io.simulate import random_genome  # noqa: E402


@pytest.fixture(scope="session")
def toy_genome() -> Genome:
    """Small deterministic genome: two chromosomes."""
    rng = np.random.default_rng(42)
    c1 = rng.integers(0, 4, 5000).astype(np.uint8)
    c2 = rng.integers(0, 4, 3000).astype(np.uint8)
    from nextgenmap_tpu.index.genome import CHROM_GAP

    codes = np.concatenate([c1, np.full(CHROM_GAP, 4, np.uint8), c2])
    return Genome(
        codes=codes,
        names=["chr1", "chr2"],
        starts=np.array([0, 5000 + CHROM_GAP], dtype=np.int64),
        lengths=np.array([5000, 3000], dtype=np.int64),
    )


@pytest.fixture(scope="session")
def ecoli_like() -> np.ndarray:
    """200kb random genome standing in for E. coli in fast tests."""
    return random_genome(200_000, seed=7)
