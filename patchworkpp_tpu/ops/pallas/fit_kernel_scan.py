"""Segment-matrix fused fit kernel: no one-hot, no rolls.

Mosaic compile pathologies found by bisection: the in-kernel (NT, 512)
one-hot build + dot compiles >9 min; a single backward segmented fill via
sublane rolls ~6.6 min; lane-axis rolls minutes. This variant therefore does
ALL cross-tile movement as MXU dots against a precomputed strictly-lower
same-segment matrix L ((NT, NT) bf16 0/1, built in XLA from tile_patch):

- per-tile -> per-patch totals broadcast to every row: (L + L^T + I) @ v;
- the LPR quota's exclusive tile prefix: L @ m;
- in-tile lane prefix: one strictly-lower-triangular (128,128) matmul;
- per-patch quantities live per-tile-replicated (NT, C); the plane fit
  (closed-form Cardano smallest-eigenvalue + cross-product normal,
  see fit_kernel.py)
  is computed redundantly per tile row; the final (512, C) patch table is a
  head-row gather outside the kernel.

Movement is exact: L is 0/1 (exact bf16) and f32 payloads go through the
bf16x3 split. Semantics are identical to fit_kernel.py; both validate
exactly against the NumPy oracle in interpret mode. Whole-kernel Mosaic
compile still exceeds 40 min unrolled — the grid-ified variant
(fit_kernel_grid.py) compiles each pass KIND once instead.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from patchworkpp_tpu.params import Params
from patchworkpp_tpu.ops.pallas.fit_kernel import (
    OUT_CARRY2,
    OUT_COLS,
    OUT_COV,
    OUT_D,
    OUT_GCOUNT,
    OUT_MEAN,
    OUT_N,
    OUT_NORMAL,
    OUT_SNAP,
    _lane_prefix_exclusive,
    _plane_from_cov,
    build_pass_program,
)

LANE = 128


def _split3(x):
    """f32 -> three bf16 terms summing back to x to ~2^-24 relative.

    The segment matrix is exactly bf16 (0/1), so three single-pass bf16 dots
    move f32 values through it bit-faithfully."""
    hi = x.astype(jnp.bfloat16)
    r1 = x - hi.astype(jnp.float32)
    mid = r1.astype(jnp.bfloat16)
    r2 = r1 - mid.astype(jnp.float32)
    return hi, mid, r2.astype(jnp.bfloat16)


def _seg_dots(lb, v, transpose: bool):
    """out[t] = sum_u L[t,u] * v[u] (or L[u,t] with transpose=True).

    Mosaic compiles sublane rolls pathologically (a single backward
    segmented fill: ~6.6 min), so all cross-tile movement is MXU dots
    against the precomputed strictly-lower same-segment matrix ``lb``
    ((NT, NT) bf16 0/1, built in XLA from tile_patch). ``v`` is (NT, C) f32,
    moved exactly via the bf16x3 split.

    The three split parts are PACKED along the lane axis into one
    (NT, 3C) operand: an (NT, NT) MXU dot costs the same for C=10 as for
    C=128 (one lane tile), so one packed dot is ~3x cheaper than three
    narrow dots while computing bit-identical column sums (each output
    column is an independent contraction; the part slices are added in
    the same hi+mid+lo order as the unpacked form).
    """
    contract = 0 if transpose else 1
    dims = (((contract,), (0,)), ((), ()))
    c = v.shape[1]
    packed = jnp.concatenate(_split3(v), axis=1)  # (NT, 3C) bf16
    d = jax.lax.dot_general(
        lb, packed, dims, preferred_element_type=jnp.float32
    )
    return d[:, :c] + d[:, c : 2 * c] + d[:, 2 * c :]


def _prior_exclusive(lb, v):
    """Exclusive segmented prefix over tiles: prior[t] = sum_{u<t, same seg} v[u]."""
    return _seg_dots(lb, v, transpose=False)


def _patch_total_mat(lb, v):
    """Per-patch totals broadcast to every tile row: (L + L^T + I) @ v."""
    return (
        _seg_dots(lb, v, transpose=False)
        + _seg_dots(lb, v, transpose=True)
        + v
    )


def _patch_total_sym(sb, v):
    """Per-patch totals via the PRECOMPUTED symmetric same-segment matrix
    ``sb`` = L + L^T + I ((NT, NT) bf16 0/1): one dot set instead of two
    plus an add — half the MXU work of :func:`_patch_total_mat` per pass."""
    return _seg_dots(sb, v, transpose=False)


def make_fit_kernel_scan(params: Params, nt: int, num_zone0_patches: int):
    p = params
    passes = build_pass_program(p)
    num_lpr = float(p.num_lpr)

    def kernel(
        xs_ref, ys_ref, zs_ref, val_ref, tp_ref, lb_ref, gates_t_ref,
        consts_ref,
        out_ref,
        active_ref, plane_ref, alive_ref, lpr_ref, snap_ref, quota_ref,
    ):
        margin_thr = consts_ref[0, 0]

        tp = tp_ref[:]                       # (NT, 1) int32
        lb = lb_ref[:]                       # (NT, NT) bf16 same-seg strict-lower
        zone0_t = (tp < num_zone0_patches).astype(jnp.float32)
        proc_t = gates_t_ref[:, 0:1]        # (NT,1) processed
        sx = gates_t_ref[:, 1:2]
        sy = gates_t_ref[:, 2:3]
        sz = gates_t_ref[:, 3:4]

        active_ref[:] = val_ref[:] * proc_t
        # plane cols: [nx,ny,nz,d, n, cov6, mean3] = 14 of 16
        plane_ref[:] = jnp.zeros((nt, 16), jnp.float32)
        alive_ref[:] = proc_t

        def elig_of(act):
            return act * jnp.where(
                (zone0_t > 0.5) & (zs_ref[:] < margin_thr), 0.0, 1.0
            )

        def moments(mask):
            qx = xs_ref[:] - sx
            qy = ys_ref[:] - sy
            qz = zs_ref[:] - sz
            per_tile = jnp.concatenate(
                [
                    jnp.sum(f, axis=1, keepdims=True)
                    for f in (
                        mask, qx * mask, qy * mask, qz * mask,
                        qx * qx * mask, qx * qy * mask, qx * qz * mask,
                        qy * qy * mask, qy * qz * mask, qz * qz * mask,
                    )
                ],
                axis=1,
            )
            return _patch_total_mat(lb, per_tile)  # (NT,10)

        def run_fit(momp, gate_t):
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
            mx, my, mz = mqx + sx, mqy + sy, mqz + sz
            d = -(nx * mx + ny * my + nz * mz)
            upd = (gate_t > 0.5) & (n > 0)
            old = plane_ref[:]
            new = jnp.concatenate(
                [nx, ny, nz, d, n, cxx, cxy, cxz, cyy, cyz, czz, mx, my, mz,
                 old[:, 14:16] * 0],
                axis=1,
            )
            plane_ref[:] = jnp.where(upd, new, old)

        for ps in passes:
            if ps.kind == "count":
                act = active_ref[:]
                if ps.peel_snap >= 0:
                    snap = snap_ref[:, ps.peel_snap * 5 : ps.peel_snap * 5 + 5]
                    dist = (
                        xs_ref[:] * snap[:, 1:2] + ys_ref[:] * snap[:, 2:3]
                        + zs_ref[:] * snap[:, 3:4] + snap[:, 4:5]
                    )
                    hit = (
                        (snap[:, 0:1] > 0.5)
                        & (jnp.abs(dist) < jnp.float32(p.th_dist_v))
                    ).astype(jnp.float32)
                    act = act * (1.0 - hit)
                    active_ref[:] = act
                m_t = jnp.sum(elig_of(act), axis=1, keepdims=True)
                prior = _prior_exclusive(lb, m_t)
                quota_ref[:] = jnp.clip(
                    jnp.float32(num_lpr) - prior, 0.0, None
                )

            elif ps.kind == "lprsum":
                elig = elig_of(active_ref[:])
                rank = _lane_prefix_exclusive(elig)
                take = elig * (rank < quota_ref[:]).astype(jnp.float32)
                per_tile = jnp.concatenate(
                    [
                        jnp.sum(zs_ref[:] * take, axis=1, keepdims=True),
                        jnp.sum(take, axis=1, keepdims=True),
                    ],
                    axis=1,
                )
                tot = _patch_total_mat(lb, per_tile)
                cnt = tot[:, 1:2]
                lpr_ref[:] = jnp.where(
                    cnt > 0, tot[:, 0:1] / jnp.maximum(cnt, 1.0), 0.0
                )

            elif ps.kind == "fitseed":
                gate_t = alive_ref[:] if ps.gate_alive else proc_t
                seed = (
                    active_ref[:]
                    * (zs_ref[:] < lpr_ref[:] + jnp.float32(ps.th)).astype(
                        jnp.float32
                    )
                    * (gate_t > 0.5)
                )
                run_fit(moments(seed), gate_t)
                if ps.snap_slot >= 0:
                    pr = plane_ref[:]
                    vert = (
                        (alive_ref[:] > 0.5)
                        & (zone0_t > 0.5)
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
                dist = (
                    xs_ref[:] * pr[:, 0:1] + ys_ref[:] * pr[:, 1:2]
                    + zs_ref[:] * pr[:, 2:3] + pr[:, 3:4]
                )
                g = active_ref[:] * (
                    dist < jnp.float32(p.th_dist)
                ).astype(jnp.float32)
                momp = moments(g)
                if ps.is_final:
                    out_ref[:, OUT_GCOUNT:OUT_GCOUNT + 1] = momp[:, 0:1]
                run_fit(momp, proc_t)

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
                out_ref[:, a:a + 5] = jnp.zeros((nt, 5), jnp.float32)
        out_ref[:, 35:OUT_COLS] = jnp.zeros((nt, OUT_COLS - 35), jnp.float32)

    return kernel


@functools.partial(
    jax.jit, static_argnames=("params", "num_zone0_patches", "interpret")
)
def fused_fit_scan(
    xs, ys, zs, valid_f, tile_patch, gates_t, consts,
    params: Params,
    num_zone0_patches: int,
    interpret: bool = False,
):
    """Scan-based fused fit loop.

    Args:
      xs, ys, zs, valid_f: (NT, 128) f32 tiled point data.
      tile_patch: (NT, 1) int32.
      gates_t: (NT, 8) f32 per-tile [processed, shift_x, shift_y, shift_z, 0..]
        (precomputed outside by a patch_lookup over tile_patch).
      consts: (1, 8) f32: [margin_thr, ...].

    Returns:
      (NT, 48) f32 per-tile result table; gather each patch's head-tile row
      outside the kernel for the (512, 48) patch table.
    """
    nt = xs.shape[0]
    # Strictly-lower same-segment matrix (exact 0/1 in bf16), built in XLA.
    tpc = tile_patch[:, 0]
    same = tpc[:, None] == tpc[None, :]
    lower = (
        jnp.arange(nt, dtype=jnp.int32)[:, None]
        > jnp.arange(nt, dtype=jnp.int32)[None, :]
    )
    lb = (same & lower).astype(jnp.bfloat16)
    kernel = make_fit_kernel_scan(params, nt, num_zone0_patches)
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((nt, OUT_COLS), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 8,
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((nt, LANE), jnp.float32),  # active
            pltpu.VMEM((nt, 16), jnp.float32),    # plane/cov/mean carry
            pltpu.VMEM((nt, 1), jnp.float32),     # alive
            pltpu.VMEM((nt, 1), jnp.float32),     # lpr
            pltpu.VMEM((nt, 16), jnp.float32),    # R-VPF snapshots (3 x 5)
            pltpu.VMEM((nt, 1), jnp.float32),     # LPR quota per tile
        ],
        interpret=interpret,
    )(xs, ys, zs, valid_f, tile_patch, lb, gates_t, consts)
