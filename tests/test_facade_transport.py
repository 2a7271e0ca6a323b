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


def test_mixed_density_stream_on_one_server(scans):
    """Heterogeneous feed through ONE GroundSegmentationServer (fixed
    capacity): interleaved 64-beam-class and sparse scans, each message
    taking its own upload bucket, must reproduce per-scan single-model
    labels exactly and keep the adaptation chain identical."""
    from patchworkpp_tpu.serve import CloudMsg, GroundSegmentationServer
    from patchworkpp_tpu.serve.server import ServerConfig

    feed = [
        scans["000000"][::8],    # ~15.6k -> bucket 16384
        scans["000001"][::32],   # ~3.9k  -> bucket 8192
        scans["000002"][::16],   # ~7.8k  -> bucket 8192
    ]
    got = []
    srv = GroundSegmentationServer(config=ServerConfig(capacity=32768))
    srv.on_result(lambda r: got.append(r.result))
    with srv:
        import time

        for c in feed:
            srv.publish(CloudMsg(points=c, stamp=0.0))
        t_end = time.time() + 300
        while len(got) < len(feed) and time.time() < t_end:
            time.sleep(0.05)
    assert len(got) == len(feed)

    ref = PatchworkPP(capacity=32768)
    for c, r in zip(feed, got):
        want = ref.estimate_ground(c)
        np.testing.assert_array_equal(r.ground_mask, want.ground_mask)
    assert srv.sensor_height == ref.sensor_height


def test_verbose_print_uses_packed_count(cloud, capsys):
    """params.verbose reports num_ground from the packed buffer (no extra
    device fetch); the printed count must match the mask sum."""
    m = PatchworkPP(Params(verbose=True), capacity=8192)
    res = m.estimate_ground(cloud)
    out = capsys.readouterr().out
    assert f"-> {int(res.ground_mask.sum())} ground" in out
