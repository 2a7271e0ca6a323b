"""Streaming server + IO/eval layer tests."""

import os
import threading
import time

import numpy as np
import pytest

from patchworkpp_tpu.io import evaluate_masks, pad_cloud, read_bin, ScanDataset
from patchworkpp_tpu.serve import CloudMsg, GroundSegmentationServer, ServerConfig

SUB = 16
from conftest import REFERENCE_DATA as DATA


_need_scans = pytest.mark.skipif(
    not os.path.exists(os.path.join(DATA, "000000.bin")),
    reason="KITTI fixture scans absent (PPK_DATA_DIR)",
)


@_need_scans
def test_read_bin_shape():
    pts = read_bin(os.path.join(DATA, "000000.bin"))
    assert pts.shape == (124668, 4) and pts.dtype == np.float32


@_need_scans
def test_scan_dataset():
    ds = ScanDataset(DATA)
    assert len(ds) == 6
    assert ds.scan(0).shape[1] == 4
    assert ds.labels(0) is None


def test_pad_cloud():
    pts = np.ones((10, 3), np.float32)
    padded, n = pad_cloud(pts, 16)
    assert padded.shape == (16, 4) and n == 10
    assert (padded[10:] == 0).all()
    with pytest.raises(ValueError):
        pad_cloud(np.ones((20, 3), np.float32), 16)


def test_evaluate_masks():
    pred = np.array([1, 1, 0, 0], bool)
    true = np.array([1, 0, 1, 0], bool)
    r = evaluate_masks(pred, true)
    assert r.tp == 1 and r.fp == 1 and r.fn == 1 and r.tn == 1
    assert r.precision == 0.5 and r.recall == 0.5 and abs(r.f1 - 0.5) < 1e-9


def test_server_stream(scans):
    results = []
    done = threading.Event()
    srv = GroundSegmentationServer(config=ServerConfig(capacity=8192))

    def collect(out):
        results.append(out)
        if len(results) == 3:
            done.set()

    srv.on_result(collect)
    with srv:
        for name in ["000000", "000001", "000002"]:
            srv.publish(CloudMsg(points=scans[name][::SUB], stamp=time.time()))
        assert done.wait(timeout=300), "server did not process 3 frames in time"

    assert srv.frames_processed == 3
    for out in results:
        n = len(out.msg.points)
        r = out.result
        assert r.ground_indices.size + r.nonground_indices.size == n
        assert r.ground_indices.size > 0
    # adaptive state advanced across streamed frames
    assert srv.sensor_height != 1.723
    # serving-loop timing accumulated (the getTimeTaken/verbose analog)
    assert srv.timer.frames == 3 and srv.timer.totals["infer"] > 0
    assert "infer" in srv.timing_report()


def test_server_sync_process(scans):
    srv = GroundSegmentationServer(config=ServerConfig(capacity=8192))
    out = srv.process(CloudMsg(points=scans["000000"][::SUB], stamp=0.0))
    assert out.result.ground_indices.size > 0
    assert out.latency_s > 0


def test_server_checkpoint_restart(scans, tmp_path):
    """A restarted server resuming from a checkpoint must continue the
    adaptation chain exactly: frame 3 after restore == frame 3 without."""
    a, b, c = (scans[n][::SUB] for n in ["000000", "000001", "000002"])
    srv1 = GroundSegmentationServer(config=ServerConfig(capacity=8192))
    srv1.process(CloudMsg(points=a, stamp=0.0))
    srv1.process(CloudMsg(points=b, stamp=1.0))
    path = str(tmp_path / "server_state.npz")
    srv1.save_state(path)
    r_cont = srv1.process(CloudMsg(points=c, stamp=2.0))

    srv2 = GroundSegmentationServer(config=ServerConfig(capacity=8192))
    srv2.load_state(path)
    r_resume = srv2.process(CloudMsg(points=c, stamp=2.0))
    np.testing.assert_array_equal(
        r_resume.result.ground_mask, r_cont.result.ground_mask
    )
    assert srv2.sensor_height == srv1.sensor_height


def test_server_requires_start(scans):
    srv = GroundSegmentationServer(config=ServerConfig(capacity=8192))
    with pytest.raises(RuntimeError):
        srv.publish(CloudMsg(points=scans["000000"][::SUB], stamp=0.0))


def test_server_backlog_batching_matches_sequential(scans):
    """Throughput mode: a queued backlog drains through one sequence
    dispatch; labels and adapted state must equal the per-frame path."""
    from patchworkpp_tpu.models import PatchworkPP

    names = ["000000", "000001", "000002", "000003"]
    clouds = [scans[n][::SUB] for n in names]

    results = []
    done = threading.Event()
    srv = GroundSegmentationServer(
        config=ServerConfig(capacity=8192, queue_depth=8, batch_max=2)
    )

    def collect(out):
        results.append(out)
        if len(results) == len(names):
            done.set()

    srv.on_result(collect)
    srv.start()
    for name, cloud in zip(names, clouds):
        srv.publish(CloudMsg(points=cloud, stamp=time.time()))
    assert done.wait(timeout=600), "server did not process the backlog"
    srv.stop()
    assert srv.frames_processed == len(names)

    ref = PatchworkPP(capacity=8192)
    for out, cloud in zip(results, clouds):
        r = ref.estimate_ground(cloud)
        np.testing.assert_array_equal(out.result.ground_mask, r.ground_mask)
    assert srv.sensor_height == ref.sensor_height
