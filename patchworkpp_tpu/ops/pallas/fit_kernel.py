"""Fused R-VPF + R-GPF fit-loop Pallas kernel over the tiled patch layout.

The unfused pipeline spends ~5 ms/frame re-reading HBM: ~30 P-sized XLA ops
(seed ranks, plane lookups, masked moment reductions) each pay degraded
small-transfer bandwidth. This kernel keeps the whole tiled point cloud
(ops/tiled.py: every 128-lane tile holds one patch) resident in VMEM and runs
the *entire* iterative fit — R-VPF seed/fit/peel iterations, R-GPF seeding
and refinement, final plane statistics — as ~15 array-level passes inside a
single kernel launch. Cross-tile state is tiny: per-patch tables (512, C) and
per-tile columns (NT, 1).

Key design points:
- per-patch -> per-tile broadcast and per-tile -> per-patch reduction go
  through one (NT, 512) one-hot built once in scratch (exact selection; dots
  at HIGHEST precision preserve f32 values bit-exactly);
- LPR ("mean of the <= num_lpr lowest eligible z per patch",
  reference patchworkpp.cpp:77-149) decomposes into: per-tile eligible
  counts -> a head-flag segmented scan over tiles (z-sorted tiles of a patch
  are consecutive) -> per-tile take quotas -> an in-tile lane prefix sum
  (7 shifted adds) selecting each tile's contribution;
- the plane fit needs only the *smallest* eigenvalue: monotone Newton from a
  Gershgorin lower bound on det(cov - x I) (quadratic convergence, exact for
  the PSD covariances here; NaN covariances — the reference's n==1 quirk —
  propagate to NaN planes exactly like Eigen's float SVD). The full
  eigenvalue triple for A-GLE is recovered outside the kernel from the
  returned covariance with the same closed-form solver as the unfused path;
- the reference's plane-carry staleness (estimate_plane early-returns on an
  empty fit, patchworkpp.cpp:49) is a per-patch where() on the fit gate.

Output: a (512, 48) table with the final plane/moments plus the per-iteration
R-VPF snapshots and the pre-final R-GPF plane that the original-order label
pass replays (pipeline.py).
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from patchworkpp_tpu.params import Params
from patchworkpp_tpu.ops.trig import cardano_cos_pair

S = 512
LANE = 128
HIGHEST = jax.lax.Precision.HIGHEST

# Output column layout (512, 48)
OUT_NORMAL = 0      # 0:3
OUT_D = 3
OUT_MEAN = 4        # 4:7
OUT_N = 7
OUT_GCOUNT = 8
OUT_COV = 9         # 9:15 (cxx,cxy,cxz,cyy,cyz,czz)
OUT_SNAP = 16       # 3 x 5: [gate, nx, ny, nz, d] at 16,21,26
OUT_CARRY2 = 31     # 31:35: [nx, ny, nz, d] of the plane defining final g
OUT_COLS = 48


class PassSpec(NamedTuple):
    kind: str            # 'count' | 'lprsum' | 'fitseed' | 'fitdist'
    peel_snap: int       # snapshot slot to peel with before counting (-1: none)
    th: float            # seed threshold / distance threshold
    gate_alive: bool     # fit gate: alive (R-VPF) vs processed (R-GPF)
    snap_slot: int       # R-VPF snapshot slot to record (-1: none)
    is_final: bool       # last R-GPF iteration (save carry2 + final stats)


def build_pass_program(p: Params):
    passes = []
    if p.enable_RVPF:
        for i in range(p.num_iter):
            passes.append(PassSpec("count", i - 1, 0.0, True, -1, False))
            passes.append(PassSpec("lprsum", -1, 0.0, True, -1, False))
            passes.append(
                PassSpec("fitseed", -1, p.th_seeds_v, True, i, False)
            )
        last_snap = p.num_iter - 1
    else:
        last_snap = -1
    passes.append(PassSpec("count", last_snap, 0.0, False, -1, False))
    passes.append(PassSpec("lprsum", -1, 0.0, False, -1, False))
    passes.append(PassSpec("fitseed", -1, p.th_seeds, False, -1, False))
    for i in range(p.num_iter):
        passes.append(
            PassSpec("fitdist", -1, p.th_dist, False, -1, i == p.num_iter - 1)
        )
    return passes


def _chunks(nt: int, target: int = 256) -> int:
    """Number of equal row-chunks (VMEM pressure control)."""
    n = max(1, -(-nt // target))
    while nt % n:
        n += 1
    return n


def _seg_scan_sum(vals, heads):
    """Inclusive segmented prefix sum over tile rows ((NT,1) f32).

    heads[t] == 1 marks the first tile of a patch run. Hillis-Steele with
    head-flag propagation; rows shifted via pltpu.roll along the sublane axis.
    """
    nt = vals.shape[0]
    v, f = vals, heads
    sh = 1
    while sh < nt:
        v_s = pltpu.roll(v, sh, 0)
        f_s = pltpu.roll(f, sh, 0)
        first = (
            jax.lax.broadcasted_iota(jnp.int32, v.shape, 0) < sh
        ).astype(jnp.float32)
        blocked = jnp.maximum(f, first)  # no carry across array start / heads
        v = v + v_s * (1.0 - blocked)
        f = jnp.maximum(f, f_s * (1.0 - first))
        sh *= 2
    return v


def _lane_prefix_exclusive(m):
    """Exclusive prefix sum along lanes of (R, 128) f32.

    One strictly-lower-triangular matmul — lane-axis rolls lower to
    pathologically slow Mosaic compiles at full NT, the MXU form compiles in
    ~1 s and is exact (small-integer counts, f32 accumulation).
    """
    lanes = m.shape[1]
    row = jax.lax.broadcasted_iota(jnp.int32, (lanes, lanes), 0)
    col = jax.lax.broadcasted_iota(jnp.int32, (lanes, lanes), 1)
    lt = (row < col).astype(jnp.float32)
    return jnp.dot(m, lt, preferred_element_type=jnp.float32)


def _plane_from_cov(cxx, cxy, cxz, cyy, cyz, czz):
    """Normal = eigenvector of the smallest eigenvalue, sign-fixed to
    nz >= 0. Delegates to ops/eigen3.py:eig3_plane_columns — the deflation
    construction (Mosaic-compatible: add/mul/sqrt/select + the shared trig
    polynomials), traced identically by the kernels and the XLA paths so
    every engine resolves every eigenproblem the same way. The old direct
    cross-product-at-e2 form lost sqrt(eps) accuracy on clustered small
    eigenvalues (see the eigen3 module docstring for the measured flip)."""
    from patchworkpp_tpu.ops.eigen3 import eig3_plane_columns

    _, _, _, vx, vy, vz = eig3_plane_columns(cxx, cxy, cxz, cyy, cyz, czz)
    flip = vz < 0
    return (
        jnp.where(flip, -vx, vx),
        jnp.where(flip, -vy, vy),
        jnp.where(flip, -vz, vz),
    )


def plane_row_from_moments(momp, spx, spy, spz):
    """(S, 10) raw moment sums + per-patch shift columns -> the (S, 14)
    plane-state row [nx, ny, nz, d, n, cxx, cxy, cxz, cyy, cyz, czz, mx, my,
    mz] (reference estimate_plane, cpp/patchworkpp/src/patchworkpp.cpp:47-75,
    with the n==1 NaN covariance resolved to the [0,0,0,1e30] sentinel).

    THE one source of truth for the fit math: the unrolled kernel
    (make_fit_kernel), the grid kernel (fit_kernel_grid) and the XLA tiled
    engine (ops/tiled_fit.py) all trace this exact op sequence, so their
    per-patch planes agree to the last ulp of the backend's arithmetic.
    """
    n = momp[:, 0:1]
    safe_n = jnp.maximum(n, 1.0)
    mqx = momp[:, 1:2] / safe_n
    mqy = momp[:, 2:3] / safe_n
    mqz = momp[:, 3:4] / safe_n
    denom = n - 1.0
    cxx = (momp[:, 4:5] - n * mqx * mqx) / denom
    cxy = (momp[:, 5:6] - n * mqx * mqy) / denom
    cxz = (momp[:, 6:7] - n * mqx * mqz) / denom
    cyy = (momp[:, 7:8] - n * mqy * mqy) / denom
    cyz = (momp[:, 8:9] - n * mqy * mqz) / denom
    czz = (momp[:, 9:10] - n * mqz * mqz) / denom
    nx, ny, nz = _plane_from_cov(cxx, cxy, cxz, cyy, cyz, czz)
    mx = mqx + spx
    my = mqy + spy
    mz = mqz + spz
    d = -(nx * mx + ny * my + nz * mz)
    nx, ny, nz, d = apply_plane_sentinel(nx, ny, nz, d)
    return jnp.concatenate(
        [nx, ny, nz, d, n, cxx, cxy, cxz, cyy, cyz, czz, mx, my, mz], axis=1
    )


def apply_plane_sentinel(nx, ny, nz, d):
    """Non-finite plane (1-point fit: cov is 0/0) -> the [0,0,0,1e30]
    sentinel. One source of truth for both kernels; pipeline._fit_planes
    mirrors it on (S,3)/(S,)-shaped arrays and MUST stay decision-identical
    (the fused == unfused label invariant depends on it). A NaN row would
    poison every tile through the broadcast dots, while the sentinel
    reproduces the reference's NaN decisions per consumer (dist 1e30 fails
    < th and |.| < th_dist_v, uprightness 0 fails > 0.707, heading 0 fails
    < 0)."""
    fin = (
        jnp.isfinite(nx) & jnp.isfinite(ny) & jnp.isfinite(nz)
        & jnp.isfinite(d)
    )
    return (
        jnp.where(fin, nx, 0.0),
        jnp.where(fin, ny, 0.0),
        jnp.where(fin, nz, 0.0),
        jnp.where(fin, d, jnp.float32(1e30)),
    )


def make_fit_kernel(params: Params, nt: int, num_zone0_patches: int):
    """Build the kernel body for a given tile count and parameter set."""
    p = params
    passes = build_pass_program(p)
    nchunks = _chunks(nt)
    ch = nt // nchunks
    num_lpr = float(p.num_lpr)

    def kernel(
        xs_ref, ys_ref, zs_ref, val_ref, tp_ref, gates_ref, consts_ref,
        out_ref,
        oh_ref, active_ref, mt_ref, prior_ref, take_ref, momt_ref,
        plane_ref, alive_ref, lpr_ref, snap_ref,
    ):
        margin_thr = consts_ref[0, 0]

        tp = tp_ref[:]                      # (NT,1) int32
        oh_ref[:] = (
            tp == jax.lax.broadcasted_iota(jnp.int32, (nt, S), 1)
        ).astype(jnp.float32)
        zone0_t = (tp < num_zone0_patches).astype(jnp.float32)  # (NT,1)
        heads = jnp.concatenate(
            [jnp.ones((1, 1), jnp.float32),
             (tp[1:] != tp[:-1]).astype(jnp.float32)],
            axis=0,
        )

        def patch_col(table_cols):
            """(S, k) -> (NT, k) per-tile broadcast."""
            return jnp.dot(
                oh_ref[:], table_cols,
                preferred_element_type=jnp.float32, precision=HIGHEST,
            )

        def tile_reduce(tile_cols):
            """(NT, k) -> (S, k) per-patch sums."""
            return jax.lax.dot_general(
                oh_ref[:], tile_cols, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32, precision=HIGHEST,
            )

        # active := valid & processed (gates col 0)
        proc_t = patch_col(gates_ref[:, 0:1])         # (NT,1)
        shift_t = patch_col(gates_ref[:, 1:4])        # (NT,3)
        for c in range(nchunks):
            rows = pl.ds(c * ch, ch)
            active_ref[rows, :] = val_ref[rows, :] * (proc_t[c*ch:(c+1)*ch] > 0.5)

        # plane scratch: [nx,ny,nz,d, n, cov6, mean3, pad] = 15 cols
        plane_ref[:] = jnp.zeros((S, 16), jnp.float32)
        alive_ref[:] = gates_ref[:, 0:1]  # processed
        patch_iota = jax.lax.broadcasted_iota(jnp.int32, (S, 1), 0)
        zone0_patch = (patch_iota < num_zone0_patches).astype(jnp.float32)

        def run_fit(momp, gate, th_unused):
            """momp (S,10) raw moments -> updated plane cols, with carry."""
            row = plane_row_from_moments(
                momp, gates_ref[:, 1:2], gates_ref[:, 2:3], gates_ref[:, 3:4]
            )
            upd = (gate > 0.5) & (momp[:, 0:1] > 0)
            old = plane_ref[:]
            new = jnp.concatenate([row, old[:, 14:16] * 0], axis=1)
            plane_ref[:] = jnp.where(upd, new, old)

        for ps in passes:
            if ps.kind == "count":
                if ps.peel_snap >= 0:
                    snap = snap_ref[:, ps.peel_snap * 5 : ps.peel_snap * 5 + 5]
                    peel_t = patch_col(snap)  # [gate, nx, ny, nz, d] per tile
                for c in range(nchunks):
                    rows = pl.ds(c * ch, ch)
                    seg = slice(c * ch, (c + 1) * ch)
                    x, y, z = xs_ref[rows, :], ys_ref[rows, :], zs_ref[rows, :]
                    act = active_ref[rows, :]
                    if ps.peel_snap >= 0:
                        dist = (
                            x * peel_t[seg, 1:2] + y * peel_t[seg, 2:3]
                            + z * peel_t[seg, 3:4] + peel_t[seg, 4:5]
                        )
                        hit = (
                            (peel_t[seg, 0:1] > 0.5)
                            & (jnp.abs(dist) < jnp.float32(p.th_dist_v))
                        )
                        act = act * (1.0 - hit.astype(jnp.float32))
                        active_ref[rows, :] = act
                    elig = act * jnp.where(
                        (zone0_t[seg] > 0.5) & (z < margin_thr), 0.0, 1.0
                    )
                    mt_ref[rows, :] = jnp.sum(elig, axis=1, keepdims=True)
                prior_incl = _seg_scan_sum(mt_ref[:], heads)
                prior_ref[:] = prior_incl - mt_ref[:]  # exclusive

            elif ps.kind == "lprsum":
                for c in range(nchunks):
                    rows = pl.ds(c * ch, ch)
                    seg = slice(c * ch, (c + 1) * ch)
                    z = zs_ref[rows, :]
                    act = active_ref[rows, :]
                    elig = act * jnp.where(
                        (zone0_t[seg] > 0.5) & (z < margin_thr), 0.0, 1.0
                    )
                    quota = jnp.clip(
                        jnp.float32(num_lpr) - prior_ref[rows, :], 0.0, None
                    )
                    rank = _lane_prefix_exclusive(elig)
                    take = elig * (rank < quota).astype(jnp.float32)
                    take_ref[rows, 0:1] = jnp.sum(z * take, axis=1, keepdims=True)
                    take_ref[rows, 1:2] = jnp.sum(take, axis=1, keepdims=True)
                sums = tile_reduce(take_ref[:])  # (S,2)
                cnt = sums[:, 1:2]
                lpr_ref[:] = jnp.where(cnt > 0, sums[:, 0:1] / jnp.maximum(cnt, 1.0), 0.0)

            elif ps.kind == "fitseed":
                lpr_t = patch_col(lpr_ref[:])         # (NT,1)
                gate_col = alive_ref[:] if ps.gate_alive else gates_ref[:, 0:1]
                gate_t = patch_col(gate_col)
                for c in range(nchunks):
                    rows = pl.ds(c * ch, ch)
                    seg = slice(c * ch, (c + 1) * ch)
                    x, y, z = xs_ref[rows, :], ys_ref[rows, :], zs_ref[rows, :]
                    act = active_ref[rows, :]
                    seed = (
                        act
                        * (z < lpr_t[seg] + jnp.float32(ps.th)).astype(jnp.float32)
                        * (gate_t[seg] > 0.5)
                    )
                    qx = x - shift_t[seg, 0:1]
                    qy = y - shift_t[seg, 1:2]
                    qz = z - shift_t[seg, 2:3]
                    momt_ref[rows, 0:10] = jnp.concatenate(
                        [
                            jnp.sum(f, axis=1, keepdims=True)
                            for f in (
                                seed, qx * seed, qy * seed, qz * seed,
                                qx * qx * seed, qx * qy * seed, qx * qz * seed,
                                qy * qy * seed, qy * qz * seed, qz * qz * seed,
                            )
                        ],
                        axis=1,
                    )
                momp = tile_reduce(momt_ref[:][:, 0:10])
                gate = alive_ref[:] if ps.gate_alive else gates_ref[:, 0:1]
                run_fit(momp, gate, ps.th)
                if ps.snap_slot >= 0:
                    pr = plane_ref[:]
                    vert = (
                        (alive_ref[:] > 0.5)
                        & (zone0_patch > 0.5)
                        & (pr[:, 2:3] < jnp.float32(p.uprightness_thr))
                    ).astype(jnp.float32)
                    snap_ref[:, ps.snap_slot * 5 : ps.snap_slot * 5 + 5] = (
                        jnp.concatenate([vert, pr[:, 0:4]], axis=1)
                    )
                    alive_ref[:] = vert

            elif ps.kind == "fitdist":
                pr = plane_ref[:]
                if ps.is_final:
                    out_ref[:, OUT_CARRY2:OUT_CARRY2 + 4] = pr[:, 0:4]
                plane_t = patch_col(pr[:, 0:4])
                for c in range(nchunks):
                    rows = pl.ds(c * ch, ch)
                    seg = slice(c * ch, (c + 1) * ch)
                    x, y, z = xs_ref[rows, :], ys_ref[rows, :], zs_ref[rows, :]
                    act = active_ref[rows, :]
                    dist = (
                        x * plane_t[seg, 0:1] + y * plane_t[seg, 1:2]
                        + z * plane_t[seg, 2:3] + plane_t[seg, 3:4]
                    )
                    g = act * (dist < jnp.float32(p.th_dist)).astype(jnp.float32)
                    qx = x - shift_t[seg, 0:1]
                    qy = y - shift_t[seg, 1:2]
                    qz = z - shift_t[seg, 2:3]
                    momt_ref[rows, 0:10] = jnp.concatenate(
                        [
                            jnp.sum(f, axis=1, keepdims=True)
                            for f in (
                                g, qx * g, qy * g, qz * g,
                                qx * qx * g, qx * qy * g, qx * qz * g,
                                qy * qy * g, qy * qz * g, qz * qz * g,
                            )
                        ],
                        axis=1,
                    )
                momp = tile_reduce(momt_ref[:][:, 0:10])
                if ps.is_final:
                    out_ref[:, OUT_GCOUNT:OUT_GCOUNT + 1] = momp[:, 0:1]
                run_fit(momp, gates_ref[:, 0:1], ps.th)

        pr = plane_ref[:]
        out_ref[:, OUT_NORMAL:OUT_NORMAL + 3] = pr[:, 0:3]
        out_ref[:, OUT_D:OUT_D + 1] = pr[:, 3:4]
        out_ref[:, OUT_MEAN:OUT_MEAN + 3] = pr[:, 11:14]
        out_ref[:, OUT_N:OUT_N + 1] = pr[:, 4:5]
        out_ref[:, OUT_COV:OUT_COV + 6] = pr[:, 5:11]
        for slot in range(3):
            a = OUT_SNAP + slot * 5
            if p.enable_RVPF and slot < p.num_iter:
                out_ref[:, a:a + 5] = snap_ref[:, slot * 5 : slot * 5 + 5]
            else:
                out_ref[:, a:a + 5] = jnp.zeros((S, 5), jnp.float32)
        out_ref[:, 35:OUT_COLS] = jnp.zeros((S, OUT_COLS - 35), jnp.float32)

    return kernel


@functools.partial(
    jax.jit, static_argnames=("params", "num_zone0_patches", "interpret")
)
def fused_fit(
    xs, ys, zs, valid_f, tile_patch, gates, consts,
    params: Params,
    num_zone0_patches: int,
    interpret: bool = False,
):
    """Run the fused fit loop.

    Args:
      xs, ys, zs, valid_f: (NT, 128) f32 tiled point data.
      tile_patch: (NT, 1) int32 patch of each tile (sentinels clamped < 512).
      gates: (512, 8) f32: [processed, shift_x, shift_y, shift_z, 0...].
      consts: (1, 8) f32: [margin_thr, ...].

    Returns:
      (512, 48) f32 result table (see OUT_* layout).
    """
    nt = xs.shape[0]
    kernel = make_fit_kernel(params, nt, num_zone0_patches)
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((S, OUT_COLS), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 7,
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((nt, S), jnp.float32),    # one-hot
            pltpu.VMEM((nt, LANE), jnp.float32), # active
            pltpu.VMEM((nt, 1), jnp.float32),    # per-tile elig counts
            pltpu.VMEM((nt, 1), jnp.float32),    # exclusive tile prior
            pltpu.VMEM((nt, 2), jnp.float32),    # lpr partial sums
            pltpu.VMEM((nt, 16), jnp.float32),   # per-tile moments
            pltpu.VMEM((S, 16), jnp.float32),    # plane + cov + mean carry
            pltpu.VMEM((S, 1), jnp.float32),     # alive
            pltpu.VMEM((S, 1), jnp.float32),     # lpr per patch
            pltpu.VMEM((S, 16), jnp.float32),    # R-VPF snapshots (3 x 5)
        ],
        interpret=interpret,
    )(xs, ys, zs, valid_f, tile_patch, gates, consts)
