"""Test configuration.

Forces JAX onto a virtual 8-device CPU platform *before* jax is imported, so
sharding/collective code paths (pjit / shard_map over a Mesh) are exercised
without TPU hardware, per SURVEY.md §4.
"""

import os

# NOTE: in this sandbox a sitecustomize imports jax at interpreter start with
# JAX_PLATFORMS=axon (tunneled TPU), so env vars alone are too late; the
# config update below wins as long as no devices have been queried yet.
# (Package resolution comes from `pip install -e .` or pytest.ini pythonpath.)
_flags = os.environ.get("XLA_FLAGS", "")
if "--xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (_flags + " --xla_force_host_platform_device_count=8").strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np
import pytest

# The 6 KITTI fixture scans vendored by the reference repo (data/*.bin).
# Overridable so hosted CI can point at a checkout of the upstream repo
# (.github/workflows/ci.yml fetches them there); golden-parity tests skip
# cleanly when the fixtures are absent instead of erroring.
REFERENCE_DATA = os.environ.get("PPK_DATA_DIR", "/root/reference/data")
GOLDEN_NPZ = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                          "golden", "reference_ground_indices.npz")
SCAN_NAMES = [f"{i:06d}" for i in range(6)]


def load_scan(name: str) -> np.ndarray:
    """KITTI velodyne .bin: float32 (N, 4) = x, y, z, intensity."""
    path = os.path.join(REFERENCE_DATA, f"{name}.bin")
    return np.fromfile(path, dtype=np.float32).reshape(-1, 4)


@pytest.fixture(scope="session")
def golden():
    return np.load(GOLDEN_NPZ)


@pytest.fixture(scope="session")
def scans():
    if not all(
        os.path.exists(os.path.join(REFERENCE_DATA, f"{n}.bin"))
        for n in SCAN_NAMES
    ):
        pytest.skip(
            f"KITTI fixture scans not found under {REFERENCE_DATA} "
            "(set PPK_DATA_DIR to the reference repo's data/ directory)"
        )
    return {name: load_scan(name) for name in SCAN_NAMES}
