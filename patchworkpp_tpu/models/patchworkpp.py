"""Flagship model: stateful Patchwork++ engine over the jitted frame step.

NumPy in / NumPy out, hiding padding, platform placement, and the functional
adaptive state. Capability parity with the reference's ``PatchWorkpp`` class
(reference: cpp/patchworkpp/include/patchwork/patchworkpp.h:114-235) plus
genuine additions: checkpointable state, batched multi-stream estimation, and
device-resident operation for streaming.
"""

from __future__ import annotations

import math
import time
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np

from patchworkpp_tpu.params import CZMGeometry, Params
from patchworkpp_tpu.pipeline import FrameResult, make_frame_fn
from patchworkpp_tpu.state import AdaptiveState, init_state


class SegmentationResult(NamedTuple):
    """Per-frame result trimmed to the real point count, original row order."""

    ground_mask: np.ndarray       # (N,) bool
    ground_indices: np.ndarray    # (G,) int32, ascending
    nonground_indices: np.ndarray # (N-G,) int32, ascending
    centers: np.ndarray           # (K, 3) per-processed-patch plane centroids
    normals: np.ndarray           # (K, 3) per-processed-patch plane normals
    time_taken_s: float           # host wall time of the frame step


def _round_capacity(n: int, quantum: int = 8192) -> int:
    return max(quantum, -(-n // quantum) * quantum)


def _pack_result(res: FrameResult) -> jnp.ndarray:
    """Device-side packing of everything SegmentationResult needs into ONE
    uint8 buffer: bit-packed ground mask (8 labels/byte) + bitcast
    patch_mean/patch_normal + patch_processed + num_ground.

    Why: the result readback is the serving path's host-boundary cost —
    fetching the bool mask and three patch arrays is ~149 KB across four
    transfers per frame (each paying a round trip; on a tunneled dev pod
    at ~2.5 MB/s D2H that is ~60 ms/frame, the closed-loop p50's dominant
    term — SERVE_r05.jsonl). One fused buffer is ~30 KB and ONE transfer.
    Purely a transport encoding: labels are bit-identical after
    np.unpackbits (little bit order matches the 1,2,4,... weights).
    svals are deliberately excluded (SegmentationResult does not carry
    them; `last_result` keeps the full device-side FrameResult).
    """
    flat = res.ground_mask.reshape(-1)
    pad = (-flat.shape[0]) % 8
    if pad:
        flat = jnp.concatenate([flat, jnp.zeros(pad, bool)])
    bits = flat.reshape(-1, 8).astype(jnp.uint8)
    weights = jnp.asarray([1, 2, 4, 8, 16, 32, 64, 128], jnp.uint8)
    packed = jnp.sum(
        bits * weights[None, :], axis=1, dtype=jnp.uint32
    ).astype(jnp.uint8)

    def _u8(x):
        return jax.lax.bitcast_convert_type(x, jnp.uint8).reshape(-1)

    return jnp.concatenate([
        packed,
        _u8(jnp.atleast_1d(res.num_ground).astype(jnp.int32)),
        _u8(res.patch_mean.astype(jnp.float32)),
        _u8(res.patch_normal.astype(jnp.float32)),
        res.patch_processed.reshape(-1).astype(jnp.uint8),
    ])


def _unpack_result(buf: np.ndarray, res: FrameResult):
    """Host-side inverse of :func:`_pack_result` (shapes read off the
    device FrameResult — static at trace time). Returns
    (mask_flat_bool, num_ground_int_array, patch_mean, patch_normal,
    patch_processed_bool) with the FrameResult's leading batch dims."""
    nmask = int(np.prod(res.ground_mask.shape))
    m8 = (nmask + 7) // 8
    off = 0
    mask = np.unpackbits(buf[:m8], bitorder="little")[:nmask].astype(bool)
    mask = mask.reshape(res.ground_mask.shape)
    off += m8
    ng_n = int(np.prod(res.num_ground.shape)) if res.num_ground.shape else 1
    num_ground = buf[off : off + 4 * ng_n].copy().view(np.int32)
    num_ground = num_ground.reshape(res.num_ground.shape)
    off += 4 * ng_n
    out = []
    for f in (res.patch_mean, res.patch_normal):
        k = int(np.prod(f.shape)) * 4
        out.append(buf[off : off + k].copy().view(np.float32).reshape(f.shape))
        off += k
    k = int(np.prod(res.patch_processed.shape))
    proc = buf[off : off + k].astype(bool).reshape(res.patch_processed.shape)
    return mask, num_ground, out[0], out[1], proc


_PACK = jax.jit(_pack_result)  # jit caches one executable per shape set


def _zero_extend(a: jnp.ndarray, cap: int) -> jnp.ndarray:
    """Device-side zero-extension of the row axis (axis -2) to ``cap`` —
    the single pad program behind the bucketed uploads of both the frame
    ((rows, 4)) and the sequence ((B, rows, 4)) dispatches; jit's own
    shape-keyed cache replaces any hand-rolled registry."""
    pad_shape = a.shape[:-2] + (cap - a.shape[-2], a.shape[-1])
    return jnp.concatenate([a, jnp.zeros(pad_shape, a.dtype)], axis=-2)


_EXTEND = jax.jit(_zero_extend, static_argnums=1)


class PatchworkPP:
    """Stateful convenience wrapper (one LiDAR stream).

    Functional core: ``estimate_ground`` feeds the jitted frame step and
    threads :class:`AdaptiveState` through; ``reset``/``save_state``/
    ``load_state`` expose the state explicitly (a capability the in-memory
    reference lacks).
    """

    def __init__(
        self,
        params: Optional[Params] = None,
        capacity: Optional[int] = None,
        device: Optional[jax.Device] = None,
        fused: Optional[bool] = None,
        chunks: int = 1,
    ) -> None:
        """``chunks`` > 1 processes each frame as that many contiguous row
        chunks on one device (parallel/chunked.py). Labels stay exactly the
        single-device program's (tests/test_chunked.py); a fixed capacity
        must be divisible by ``chunks``. NOTE: this is a correctness /
        mesh-emulation feature, NOT a throughput lever — chunked execution
        measured 2-5x SLOWER on TPU at every K (ROOFLINE.md "Single-chip
        CHUNKING"); leave it at 1 unless you are reproducing the sharded
        program's reduction structure on one device."""
        self.params = params or Params()
        self.geom = CZMGeometry.create(self.params)
        self._fns = {}  # (enable_rnr, capacity) -> jitted frame fn
        self._fixed_capacity = capacity
        self._device = device
        self._fused = fused
        if chunks < 1:
            raise ValueError(f"chunks must be >= 1, got {chunks}")
        self._chunks = chunks
        self.state = init_state(self.params)
        self.last_result: Optional[FrameResult] = None

    # ------------------------------------------------------------------ state

    def reset(self) -> None:
        self.state = init_state(self.params)

    def save_state(self, path: str) -> None:
        self.state.save(path)

    def load_state(self, path: str) -> None:
        self.state = AdaptiveState.load(path)

    @property
    def sensor_height(self) -> float:
        """Adapted sensor height (reference getHeight(), patchworkpp.h:154)."""
        return float(self.state.sensor_height)

    # ------------------------------------------------------------------ run

    def _capacity(self, n: int) -> int:
        """Padded capacity for an n-point scan: the fixed capacity when set,
        else the 8192-quantum rounding — rounded up to an lcm(8192, chunks)
        multiple when ``chunks`` does not divide the quantum. That keeps the
        capacity on-quantum AND chunk-divisible with the smallest bump (the
        chunk width itself lands on a whole 8192 quantum for odd ``chunks``;
        for K like 6 it is a 128-multiple, which ops/tiled.py's TILE
        rounding absorbs without filler-tile waste)."""
        cap = self._fixed_capacity or _round_capacity(n)
        if cap % self._chunks:
            if self._fixed_capacity:
                raise ValueError(
                    f"capacity {cap} not divisible by chunks={self._chunks}"
                )
            q = math.lcm(8192, self._chunks)
            cap = -(-cap // q) * q
        return cap

    def _get_fn(self, enable_rnr: bool, capacity: int):
        key = (enable_rnr, capacity)
        fn = self._fns.get(key)
        if fn is None:
            p = self.params if enable_rnr == self.params.enable_RNR else (
                self.params.replace(enable_RNR=enable_rnr)
            )
            if self._chunks > 1:
                from patchworkpp_tpu.parallel.chunked import (
                    make_chunked_frame_fn,
                )

                fn = make_chunked_frame_fn(
                    p, self._chunks, self.geom,
                    fused="tiled" if self._fused is None else self._fused,
                )
            else:
                fn = jax.jit(make_frame_fn(p, self.geom, fused=self._fused))
            self._fns[key] = fn
        return fn

    def estimate_ground(self, cloud: np.ndarray) -> SegmentationResult:
        """Segment one scan. ``cloud`` is (N, 3) or (N, 4) float32.

        RNR requires intensity; with a 3-column cloud it is disabled, exactly
        as the reference refuses RNR without 4 columns (patchworkpp.cpp:379).
        """
        cloud = np.asarray(cloud, np.float32)
        if cloud.ndim != 2 or cloud.shape[1] not in (3, 4):
            raise ValueError(f"cloud must be (N,3) or (N,4); got {cloud.shape}")
        n = cloud.shape[0]
        enable_rnr = self.params.enable_RNR and cloud.shape[1] >= 4

        cap = self._capacity(n)
        if n > cap:
            raise ValueError(f"scan has {n} points > fixed capacity {cap}")

        fn = self._get_fn(enable_rnr, cap)
        # Upload only the 8192-quantum bucket holding the real rows and
        # zero-extend to capacity ON DEVICE: padding rows are zeros either
        # way (the frame masks by npts), so this is bitwise-identical input
        # while cutting host->device bytes whenever the scan sits below
        # capacity (~6% on a full KITTI scan; 2x+ for sparse feeds on a
        # head-roomed server). One tiny concat program compiles per
        # (bucket, capacity) pair — at most capacity/8192 variants.
        n_q = min(cap, _round_capacity(max(n, 1)))
        if self._device is None and n_q < cap:
            padded = np.zeros((n_q, 4), np.float32)
            padded[:n, : cloud.shape[1]] = cloud
            x = _EXTEND(jnp.asarray(padded), cap)
        else:
            padded = np.zeros((cap, 4), np.float32)
            padded[:n, : cloud.shape[1]] = cloud
            x = jnp.asarray(padded)
            if self._device is not None:
                x = jax.device_put(x, self._device)
        t0 = time.perf_counter()
        new_state, res = fn(self.state, x, jnp.int32(n))
        # ONE device->host transfer for everything the result needs (the
        # packed buffer; see _pack_result) — also the frame's sync point
        # (block_until_ready is not a reliable sync on relayed devices).
        buf = np.asarray(_PACK(res))
        dt = time.perf_counter() - t0

        self.state = new_state
        self.last_result = res
        mask_full, num_ground, means, normals, proc = _unpack_result(buf, res)
        if self.params.verbose:
            print(
                f"patchworkpp_tpu: {n} pts -> {int(num_ground)} ground "
                f"in {dt * 1e3:.2f} ms (sensor_height={self.sensor_height:.4f})"
            )

        mask = mask_full[:n]
        gi = np.flatnonzero(mask).astype(np.int32)
        ngi = np.flatnonzero(~mask).astype(np.int32)
        return SegmentationResult(
            ground_mask=mask,
            ground_indices=gi,
            nonground_indices=ngi,
            centers=means[proc],
            normals=normals[proc],
            time_taken_s=dt,
        )

    def estimate_ground_sequence(self, clouds) -> list:
        """Segment an ordered batch of scans as ONE device dispatch.

        Bitwise-equal to calling :meth:`estimate_ground` on each cloud in
        order (the adaptive state is the lax.scan carry — see
        pipeline.make_sequence_fn), but the whole chain is one compiled
        program, amortizing per-call dispatch overhead. Use this when scans
        are available in batches (offline processing, log replay); use
        :meth:`estimate_ground` for live streams.

        Args:
          clouds: sequence of (N_i, 3|4) float32 scans. RNR gates per cloud
            exactly as :meth:`estimate_ground` does (a 3-column scan turns
            it off for that frame only); a mixed batch is dispatched as
            consecutive uniform-width runs, one device call per run.

        Returns: list of :class:`SegmentationResult` (time_taken_s holds
        each dispatch's wall time on its run's first entry, 0.0 on the rest).
        """
        clouds = [np.asarray(c, np.float32) for c in clouds]
        if not clouds:
            return []
        for c in clouds:
            if c.ndim != 2 or c.shape[1] not in (3, 4):
                raise ValueError(f"cloud must be (N,3) or (N,4); got {c.shape}")
        nmax = max(c.shape[0] for c in clouds)
        cap = self._capacity(nmax)
        if nmax > cap:
            raise ValueError(f"scan has {nmax} points > fixed capacity {cap}")

        out: list = []
        run: list = []
        run_rnr: Optional[bool] = None
        for c in clouds:
            rnr = self.params.enable_RNR and c.shape[1] >= 4
            if run and rnr != run_rnr:
                out.extend(self._dispatch_sequence(run, run_rnr, cap))
                run = []
            run.append(c)
            run_rnr = rnr
        out.extend(self._dispatch_sequence(run, run_rnr, cap))
        return out

    def _dispatch_sequence(self, clouds, enable_rnr: bool, cap: int):
        from patchworkpp_tpu.pipeline import make_sequence_fn

        key = ("seq", enable_rnr, cap, len(clouds))
        fn = self._fns.get(key)
        if fn is None:
            p = self.params if enable_rnr == self.params.enable_RNR else (
                self.params.replace(enable_RNR=enable_rnr)
            )
            if self._chunks > 1:
                from patchworkpp_tpu.parallel.chunked import (
                    make_chunked_sequence_fn,
                )

                fn = make_chunked_sequence_fn(
                    p, self._chunks, self.geom,
                    fused="tiled" if self._fused is None else self._fused,
                )
            else:
                fn = jax.jit(
                    make_sequence_fn(p, self.geom, fused=self._fused)
                )
            self._fns[key] = fn

        npts = np.asarray([c.shape[0] for c in clouds], np.int32)
        # Same bucketed-upload trick as estimate_ground: ship only the
        # quantum bucket holding the batch's longest scan, zero-extend to
        # capacity on device (bitwise-identical; padding is zeros).
        n_q = min(cap, _round_capacity(max(int(npts.max()), 1)))
        rows = n_q if (self._device is None and n_q < cap) else cap
        stack = np.zeros((len(clouds), rows, 4), np.float32)
        for i, c in enumerate(clouds):
            stack[i, : c.shape[0], : c.shape[1]] = c
        if rows < cap:
            x = _EXTEND(jnp.asarray(stack), cap)
        else:
            x = jnp.asarray(stack)
            if self._device is not None:
                x = jax.device_put(x, self._device)
        t0 = time.perf_counter()
        new_state, res = fn(self.state, x, jnp.asarray(npts))
        # ONE packed device->host transfer for the whole batch (also the
        # sync point) — see _pack_result.
        buf = np.asarray(_PACK(res))
        dt = time.perf_counter() - t0
        self.state = new_state
        self.last_result = jax.tree.map(lambda a: a[-1], res)

        out = []
        masks, _, means, normals, procs = _unpack_result(buf, res)
        for i, c in enumerate(clouds):
            mask = masks[i, : c.shape[0]]
            gi = np.flatnonzero(mask).astype(np.int32)
            ngi = np.flatnonzero(~mask).astype(np.int32)
            out.append(
                SegmentationResult(
                    ground_mask=mask,
                    ground_indices=gi,
                    nonground_indices=ngi,
                    centers=means[i][procs[i]],
                    normals=normals[i][procs[i]],
                    time_taken_s=dt if i == 0 else 0.0,
                )
            )
        return out

    # ------------------------------------------------------------- profiling

    def profile_stages(self, cloud: np.ndarray, frames: int = 3):
        """Per-stage device-time split of the frame program (verbose analog of
        the reference's czm/sort/pca/gle clock() breakdown,
        patchworkpp.cpp:320-333). Traces ``frames`` repetitions with
        jax.profiler and aggregates op durations by the pipeline's
        ``stage_*`` named scopes. Returns (stage -> seconds total, top-op
        table); divide by ``frames`` for per-frame numbers."""
        from patchworkpp_tpu.utils.roofline import profile_frames

        cloud = np.asarray(cloud, np.float32)
        self.estimate_ground(cloud)  # compile outside the trace

        def run():
            for _ in range(frames):
                res = self.estimate_ground(cloud)
                res.ground_mask  # estimate_ground already synchronizes

        stages, ops = profile_frames(run)
        if self.params.verbose:
            from patchworkpp_tpu.utils.roofline import format_report

            print(format_report(stages, frames, header="per-stage device time:"))
        return stages, ops
