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


def test_multi_stream_checkpoint_roundtrip(scans, tmp_path):
    """save_states/load_states must resume EVERY stream's chain exactly."""
    from patchworkpp_tpu.serve import MultiStreamSegmenter

    sub, cap = 16, 8192
    ms = MultiStreamSegmenter(capacity=cap)
    ms.segment("a", scans["000000"][::sub])
    ms.segment("b", scans["000002"][::sub])
    path = str(tmp_path / "streams.npz")
    ms.save_states(path)
    cont_a = ms.segment("a", scans["000001"][::sub]).ground_mask
    cont_b = ms.segment("b", scans["000003"][::sub]).ground_mask

    ms2 = MultiStreamSegmenter(capacity=cap)
    ms2.load_states(path)
    assert sorted(ms2.streams) == ["a", "b"]
    np.testing.assert_array_equal(
        ms2.segment("a", scans["000001"][::sub]).ground_mask, cont_a
    )
    np.testing.assert_array_equal(
        ms2.segment("b", scans["000003"][::sub]).ground_mask, cont_b
    )


def test_multi_stream_chunked_matches_plain(scans):
    """chunks=K serving path returns exactly the plain engine's labels
    (the dense-scan switch threads through MultiStreamSegmenter and
    ServerConfig to PatchworkPP(chunks=K) -> parallel/chunked.py)."""
    from patchworkpp_tpu.serve import MultiStreamSegmenter
    from patchworkpp_tpu.models import PatchworkPP

    sub, cap = 16, 8192
    cloud = scans["000000"][::sub]
    ms = MultiStreamSegmenter(capacity=cap, chunks=4)
    ref = PatchworkPP(capacity=cap)
    np.testing.assert_array_equal(
        ms.segment("s", cloud).ground_mask,
        ref.estimate_ground(cloud).ground_mask,
    )


def test_server_chunked_config(scans):
    """GroundSegmentationServer(ServerConfig(chunks=K)) serves exact labels."""
    from patchworkpp_tpu.serve import GroundSegmentationServer, ServerConfig
    from patchworkpp_tpu.serve.server import CloudMsg
    from patchworkpp_tpu.models import PatchworkPP

    sub, cap = 16, 8192
    cloud = scans["000001"][::sub]
    want = PatchworkPP(capacity=cap).estimate_ground(cloud).ground_mask

    srv = GroundSegmentationServer(
        config=ServerConfig(capacity=cap, chunks=4)
    )
    res = srv.process(CloudMsg(points=cloud, stamp=0.0))
    np.testing.assert_array_equal(res.result.ground_mask, want)
