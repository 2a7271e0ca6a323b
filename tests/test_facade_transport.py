"""Facade transport encoding (r5): the packed single-buffer result fetch
and the bucketed device-side upload extension are pure TRANSPORT choices —
these tests pin that they cannot change any value.

models/patchworkpp.py:_pack_result bit-packs the ground mask (8 labels/
byte) and bitcasts the patch tables into one uint8 buffer;
estimate_ground uploads only the 8192-quantum bucket of real rows and
zero-extends on device. Both paths must be invisible: identical labels,
centers, and normals versus the raw device-side FrameResult, for even and
odd capacities, single frames and sequences.
"""

import numpy as np
import pytest

from patchworkpp_tpu import Params
from patchworkpp_tpu.models import PatchworkPP


@pytest.fixture(scope="module")
def cloud(scans):
    return scans["000000"][::32].copy()  # ~3.9k points


def test_packed_fetch_equals_device_mask(cloud):
    """The unpacked host mask must equal a direct fetch of the device-side
    FrameResult mask (last_result keeps it), and the centers/normals must
    equal directly-fetched patch tables under the processed filter."""
    m = PatchworkPP(capacity=8192)
    res = m.estimate_ground(cloud)
    dev = m.last_result
    np.testing.assert_array_equal(
        res.ground_mask, np.asarray(dev.ground_mask)[: len(cloud)]
    )
    proc = np.asarray(dev.patch_processed)
    np.testing.assert_array_equal(res.centers, np.asarray(dev.patch_mean)[proc])
    np.testing.assert_array_equal(
        res.normals, np.asarray(dev.patch_normal)[proc]
    )
    assert len(res.ground_indices) + len(res.nonground_indices) == len(cloud)


def test_packed_fetch_odd_capacity(cloud):
    """A fixed capacity that is NOT a multiple of 8 exercises the bit-pad
    branch of the packer; labels must equal an aligned-capacity run."""
    a = PatchworkPP(capacity=4100).estimate_ground(cloud)  # 4100 % 8 = 4
    b = PatchworkPP(capacity=8192).estimate_ground(cloud)
    np.testing.assert_array_equal(a.ground_mask, b.ground_mask)
    np.testing.assert_array_equal(a.centers, b.centers)


def test_bucketed_upload_equals_tight_capacity(cloud):
    """Auto-bucketed upload on a head-roomed fixed capacity == a tight
    capacity run (the zero-extension is done on device; padding rows are
    zeros either way), for the frame AND the sequence dispatch."""
    wide = PatchworkPP(capacity=131072)
    tight = PatchworkPP(capacity=8192)
    rw = wide.estimate_ground(cloud)
    rt = tight.estimate_ground(cloud)
    np.testing.assert_array_equal(rw.ground_mask, rt.ground_mask)

    wide.reset()
    tight.reset()
    sw = wide.estimate_ground_sequence([cloud, cloud[::2]])
    st = tight.estimate_ground_sequence([cloud, cloud[::2]])
    for a, b in zip(sw, st):
        np.testing.assert_array_equal(a.ground_mask, b.ground_mask)


def test_verbose_print_uses_packed_count(cloud, capsys):
    """params.verbose reports num_ground from the packed buffer (no extra
    device fetch); the printed count must match the mask sum."""
    m = PatchworkPP(Params(verbose=True), capacity=8192)
    res = m.estimate_ground(cloud)
    out = capsys.readouterr().out
    assert f"-> {int(res.ground_mask.sum())} ground" in out
