"""Multi-stream multiplexing: N adaptive streams through one engine."""

import numpy as np


def test_multi_stream_segmenter_isolated_states(scans):
    """Two interleaved streams adapt independently and match two separate
    engines frame-for-frame (the one-chip multiplexing pattern)."""
    from patchworkpp_tpu.serve import MultiStreamSegmenter
    from patchworkpp_tpu.models import PatchworkPP

    sub = 16
    cap = 8192
    a_frames = [scans["000000"][::sub], scans["000001"][::sub]]
    b_frames = [scans["000002"][::sub], scans["000003"][::sub]]

    ms = MultiStreamSegmenter(capacity=cap)
    ref_a, ref_b = PatchworkPP(capacity=cap), PatchworkPP(capacity=cap)
    for fa, fb in zip(a_frames, b_frames):
        got_a = ms.segment("a", fa).ground_mask
        got_b = ms.segment("b", fb).ground_mask
        np.testing.assert_array_equal(got_a, ref_a.estimate_ground(fa).ground_mask)
        np.testing.assert_array_equal(got_b, ref_b.estimate_ground(fb).ground_mask)
    assert ms.sensor_height("a") == ref_a.sensor_height
    assert ms.sensor_height("b") == ref_b.sensor_height
    assert sorted(ms.streams) == ["a", "b"]
