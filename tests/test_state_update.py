"""Fuzz the batched adaptive-state update against a plain list FIFO model.

_update_state runs all rings of interest as one batched op set
(pipeline._compact_rows / _write_at / _append_rings). This fuzz mirrors the
reference semantics directly with Python lists — push accepted samples in
sector order (patchworkpp.cpp:253-259), compute mean/stdev BEFORE trimming
(:354-355, :372-373), trim from the front, elevation ring 0 recalibrates
sensor_height (:346-349), flatness `break` on a starved ring freezes later
rings (:363-364) — and checks thresholds, buffers, and counts exactly
against long random streams, including many trims and freeze flips.
"""

import numpy as np
import jax.numpy as jnp

from patchworkpp_tpu.params import Params
from patchworkpp_tpu.state import BUF_CAP, init_state
from patchworkpp_tpu.pipeline import _update_state


def _model_stats(vals):
    """Reference calc_mean_stdev (:557-566): zeros unless n > 1."""
    if len(vals) <= 1:
        return 0.0, 0.0
    v = np.asarray(vals, np.float32)
    mean = np.float32(v.sum(dtype=np.float32) / len(v))
    var = np.float32(
        (np.square(v - mean, dtype=np.float32)).sum(dtype=np.float32)
        / (len(v) - 1)
    )
    return mean, np.float32(np.sqrt(var))


def _run_model(p, frames):
    """List-based mirror of update_elevation_thr / update_flatness_thr."""
    n_roi = p.num_rings_of_interest
    elev = [list() for _ in range(n_roi)]
    flat = [list() for _ in range(n_roi)]
    elev_thr = list(np.asarray(p.elevation_thr, np.float32))
    flat_thr = list(np.asarray(p.flatness_thr, np.float32))
    sh = np.float32(p.sensor_height)
    for acc, e_vals, f_vals in frames:
        for i in range(n_roi):
            for j in np.flatnonzero(acc[i]):
                elev[i].append(np.float32(e_vals[i][j]))
                flat[i].append(np.float32(f_vals[i][j]))
        for i in range(n_roi):
            if not elev[i]:
                continue
            mean, stdev = _model_stats(elev[i])
            elev_thr[i] = np.float32(mean + (3.0 if i == 0 else 2.0) * stdev)
            if i == 0:
                sh = np.float32(-mean)
            exceed = len(elev[i]) - p.max_elevation_storage
            if exceed > 0:
                del elev[i][:exceed]
        for i in range(n_roi):
            if len(flat[i]) <= 1:
                break
            mean, stdev = _model_stats(flat[i])
            flat_thr[i] = np.float32(mean + stdev)
            exceed = len(flat[i]) - p.max_flatness_storage
            if exceed > 0:
                del flat[i][:exceed]
    return elev, flat, elev_thr, flat_thr, sh


def _run_engine(p, frames, w):
    st = init_state(p)
    for acc, e_vals, f_vals in frames:
        st = _update_state(
            st,
            p,
            jnp.asarray(acc),
            jnp.asarray(e_vals, jnp.float32),
            jnp.asarray(f_vals, jnp.float32),
        )
    return st


def _check(p, frames, w):
    n_roi = p.num_rings_of_interest
    elev, flat, elev_thr, flat_thr, sh = _run_model(p, frames)
    st = _run_engine(p, frames, w)
    # Thresholds: the retained SAMPLE SETS are exact (asserted below), but the
    # list model's np.float32 summation order differs from XLA's reduction
    # tree, so the mean/stdev-derived values are compared to a few ulps.
    # (Exactness vs the REFERENCE's order is separately enforced by the
    # golden-parity and long-horizon oracle tests.)
    assert np.allclose(
        np.asarray(st.elevation_thr)[:n_roi],
        np.asarray(elev_thr, np.float32),
        rtol=2e-6, atol=1e-7,
    )
    assert np.allclose(
        np.asarray(st.flatness_thr)[:n_roi],
        np.asarray(flat_thr, np.float32),
        rtol=2e-6, atol=1e-7,
    )
    assert np.allclose(np.float32(st.sensor_height), sh, rtol=2e-6, atol=1e-7)
    for i in range(n_roi):
        got_e = np.asarray(st.elev_buf)[i]
        assert int(st.elev_cnt[i]) == len(elev[i])
        assert np.array_equal(got_e[: len(elev[i])], np.asarray(elev[i], np.float32))
        assert not got_e[len(elev[i]) :].any(), "zeros-beyond-count broken"
        got_f = np.asarray(st.flat_buf)[i]
        assert int(st.flat_cnt[i]) == len(flat[i])
        assert np.array_equal(got_f[: len(flat[i])], np.asarray(flat[i], np.float32))
        assert not got_f[len(flat[i]) :].any()


def _random_frames(rng, n_roi, w, n_frames, p_accept):
    frames = []
    for _ in range(n_frames):
        acc = rng.random((n_roi, w)) < p_accept
        e_vals = rng.normal(-1.7, 0.2, (n_roi, w)).astype(np.float32) * acc
        f_vals = rng.random((n_roi, w)).astype(np.float32) * 0.01 * acc
        frames.append((acc, e_vals, f_vals))
    return frames


def test_update_state_fuzz_with_trims():
    """Small storage cap: every frame past the first few trims both buffers."""
    rng = np.random.default_rng(7)
    p = Params(max_elevation_storage=23, max_flatness_storage=19)
    w = 32
    frames = _random_frames(rng, p.num_rings_of_interest, w, 40, 0.4)
    _check(p, frames, w)


def test_update_state_freeze_cascade():
    """Starved rings freeze later flatness rings (the reference `break`)."""
    rng = np.random.default_rng(11)
    p = Params(max_elevation_storage=50, max_flatness_storage=50)
    n_roi, w = p.num_rings_of_interest, 16
    frames = []
    for t in range(30):
        acc = rng.random((n_roi, w)) < 0.5
        # Periodically starve ring 1 while its buffer is still <= 1.
        if t < 3:
            acc[1] = False
        if t % 7 == 3:
            acc[2] = False
        e_vals = rng.normal(-1.7, 0.3, (n_roi, w)).astype(np.float32) * acc
        f_vals = rng.random((n_roi, w)).astype(np.float32) * 0.02 * acc
        frames.append((acc, e_vals, f_vals))
    _check(p, frames, w)


def test_update_state_empty_and_full_rows():
    """All-empty frames keep thresholds; all-full frames exercise w-wide writes."""
    rng = np.random.default_rng(3)
    p = Params(max_elevation_storage=40, max_flatness_storage=40)
    n_roi, w = p.num_rings_of_interest, 24
    empty = np.zeros((n_roi, w), bool)
    full = np.ones((n_roi, w), bool)
    frames = []
    for t in range(12):
        acc = [empty, full][t % 2]
        e_vals = rng.normal(-1.7, 0.2, (n_roi, w)).astype(np.float32) * acc
        f_vals = rng.random((n_roi, w)).astype(np.float32) * 0.01 * acc
        frames.append((acc, e_vals, f_vals))
    _check(p, frames, w)


def test_update_state_default_storage_long_stream():
    """Default 1000-cap storage: long stream approaches (but respects) BUF_CAP."""
    rng = np.random.default_rng(5)
    p = Params()
    w = 32
    # ~16 accepted/ring/frame * 70 frames ~ 1100 samples: crosses the trim.
    frames = _random_frames(rng, p.num_rings_of_interest, w, 70, 0.5)
    _check(p, frames, w)
    assert BUF_CAP >= p.max_elevation_storage + w
