"""The NumPy oracle must reproduce the C++ reference's ground labels exactly.

Golden fixtures: per-point ground-index sets from the compiled reference on
the 6 bundled KITTI scans (golden/README.md) — both fresh-per-scan and
sequential (adapted cross-frame state) variants.
"""

import numpy as np
import pytest

from patchworkpp_tpu.oracle import NumpyPatchworkpp
from tests.conftest import SCAN_NAMES


@pytest.mark.parametrize("name", SCAN_NAMES)
def test_fresh_exact(name, scans, golden):
    eng = NumpyPatchworkpp()
    mask = eng.estimate_ground(scans[name])
    ours = np.flatnonzero(mask)
    ref = np.sort(golden[f"fresh_{name}"])
    np.testing.assert_array_equal(ours, ref)


def test_sequential_exact(scans, golden):
    eng = NumpyPatchworkpp()
    for name in SCAN_NAMES:
        mask = eng.estimate_ground(scans[name])
        ours = np.flatnonzero(mask)
        ref = np.sort(golden[f"seq_{name}"])
        np.testing.assert_array_equal(ours, ref, err_msg=f"scan {name}")


def test_point_conservation(scans):
    """ground + nonground == all points (reference invariant :545-548)."""
    eng = NumpyPatchworkpp()
    mask = eng.estimate_ground(scans["000000"])
    assert mask.shape[0] == scans["000000"].shape[0]
    assert mask.dtype == bool


def test_sensor_height_adapts(scans):
    eng = NumpyPatchworkpp()
    h0 = eng.sensor_height
    eng.estimate_ground(scans["000000"])
    assert eng.sensor_height != h0  # online self-calibration kicked in
    assert 1.5 < eng.sensor_height < 2.0
