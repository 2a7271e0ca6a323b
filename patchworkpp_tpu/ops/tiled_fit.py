"""XLA tiled fit engine: the grid kernel's program, composable with comms.

The Pallas grid kernel (ops/pallas/fit_kernel_grid.py) is the fastest
single-chip fit path, but a pallas_call is one opaque device program — XLA
collectives cannot interleave with its grid steps, so a point-sharded frame
could not use it and fell back to the ~3x-slower unfused sorted-layout path
(round-2 VERDICT's top gap). This module runs the SAME design — the tiled
single-patch-per-tile layout (ops/tiled.py), the same pass program
(fit_kernel.build_pass_program, fused into seedfit/fitdist steps exactly as
fit_kernel_grid._pass_config does), the same one-hot tile movement, and the
same fit math (fit_kernel.plane_row_from_moments — literally the same traced
ops) — as ordinary XLA over (NT, 128) arrays, so the two cross-shard sync
points per seed pass (the LPR candidate merge and the plane-moment
reduction) are plain FrameComm hooks between ops:

  per seedfit pass:  peel -> eligibility -> local LPR candidates
                     == comm.merge_lpr_table ==        (all_gather + sort)
                     seed mask -> local moments
                     == comm.reduce_patches ==         (fixed-order sum)
                     fit -> carry/snapshot update      (replicated)
  per fitdist pass:  distance mask -> local moments -> reduce -> fit

Under the identity comm this is also a fast single-chip path: every
patch<->tile movement is a (NT, SPAD) dot instead of the unfused path's
(P, SPAD) one-hot builds — ~85x fewer compare ops per movement at KITTI
scale — and the per-point work runs on the same (NT, 128) arrays the kernel
uses. The reference semantics anchors are the same as the kernel's: seed
selection cpp/patchworkpp/src/patchworkpp.cpp:77-149, the R-VPF/R-GPF loop
:467-549.

Exactness notes:
- per-patch broadcasts ride onehot.patch_lookup (bf16x3 chop, single addend
  -> bitwise);
- per-tile -> patch reductions ride _reduce_tiles_split3 — the grid
  kernel's movement profile (rne-bf16x3 packed dot, per-part f32
  accumulation), NOT patch_reduce's HIGHEST dot: the two profiles differ by
  ~1 ulp per covariance entry, which was measured to flip a near-degenerate
  patch's uprightness decision on TPU (see _rne_bf16_split3);
- the per-tile moment partials use the kernel's monomial order
  ((qx*qx)*mask, not (qx*mask)^2), so per-tile partials are bitwise the
  kernel's;
- LPR counts/priors are small integers: exact in any of these forms.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from patchworkpp_tpu.params import Params
from patchworkpp_tpu.ops.onehot import SPAD, mxu_dot_c0, patch_lookup
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
    plane_row_from_moments,
)
from patchworkpp_tpu.ops.pallas.fit_kernel_grid import (
    K_FITDIST,
    K_SEEDFIT,
    _pass_config,
)

_HIGHEST = jax.lax.Precision.HIGHEST


def out_layout(params: Params):
    """(snap_off, carry2_off, out_cols) of the per-patch result table.

    The canonical 48-col layout (fit_kernel.OUT_*) holds exactly 3 R-VPF
    snapshots — enough for the default num_iter=3. The reference accepts any
    num_iter (patchworkpp.h:85), so for num_iter > 3 with R-VPF enabled the
    tiled engine extends the snapshot region and shifts the carry2 block;
    the Pallas kernels keep the fixed layout and are gated to num_iter <= 3
    (pipeline.make_frame_fn raises).
    """
    nsnap = params.num_iter if params.enable_RVPF else 0
    if nsnap <= 3:
        return OUT_SNAP, OUT_CARRY2, OUT_COLS
    carry2 = OUT_SNAP + 5 * nsnap
    return OUT_SNAP, carry2, carry2 + 4

# Per-call-site barrier counter, same role as onehot._SITE: keep each
# one-hot's iota structurally distinct so XLA fuses it into its consumer
# dot instead of CSE-sharing (a shared (NT, SPAD) one-hot gets materialized
# to HBM and re-read per dot).
_SITE = [0]


def _rne_bf16_split3(x):
    """f32 -> three bf16 parts summing back exactly, via ROUND-TO-NEAREST
    truncations — the same split movement._split3 computes with float
    converts inside Mosaic kernels. In XLA the float-convert form is
    silently elided (convert(convert(x, bf16), f32) folds to x — the
    documented hazard in ops/onehot.py), so the rounding is done in integer
    space: bf16_rne(x) = top 16 bits of (bits + 0x7FFF + lsb(bits >> 16)).

    Why rne and not the truncation chop: the tiled engine's tile->patch
    moment reduction must carry the SAME rounding profile as the grid
    kernel's _seg_dots (per-part f32 accumulation of the rne split) — a
    1-ulp covariance difference was measured to rotate a near-degenerate
    6-point patch's normal across the uprightness threshold (scan 000004,
    patch 343), flipping labels vs golden. Matching the split makes the two
    engines' sums agree at the profile level, not by luck.
    """

    def part(v):
        bits = jax.lax.bitcast_convert_type(v, jnp.int32)
        lsb = (bits >> 16) & jnp.int32(1)
        r = bits + jnp.int32(0x7FFF) + lsb
        pb = jax.lax.bitcast_convert_type(
            (r >> 16).astype(jnp.int16), jnp.bfloat16
        )
        kept = jax.lax.bitcast_convert_type(
            r & jnp.int32(-65536), jnp.float32
        )
        return pb, v - kept

    hi, r1 = part(x)
    mid, r2 = part(r1)
    lo, _ = part(r2)  # r2 fits 8 significand bits: exact
    return hi, mid, lo


def _reduce_tiles_split3(v, tpc, width: int = SPAD):
    """(NT, C) f32 per-tile partials -> (width, C) per-patch sums, via the
    grid kernel's movement profile: rne-bf16x3 parts packed along the lane
    axis into ONE dot, per-part f32 accumulation over tiles in order, parts
    re-added hi+mid+lo (movement._seg_dots transpose=True)."""
    c = v.shape[1]
    hi, mid, lo = _rne_bf16_split3(v)
    packed = jnp.concatenate([hi, mid, lo], axis=1)  # (NT, 3C) bf16
    _SITE[0] += 1
    iota = jnp.arange(width, dtype=tpc.dtype)
    iota = jax.lax.optimization_barrier(
        iota + tpc.dtype.type(_SITE[0])
    ) - tpc.dtype.type(_SITE[0])
    oh = (tpc[:, None] == iota[None, :]).astype(jnp.bfloat16)  # (NT, width)
    d = mxu_dot_c0(oh, packed)  # (width, 3C)
    return d[:, :c] + d[:, c : 2 * c] + d[:, 2 * c :]


def _tile_moments(xs, ys, zs, sx, sy, sz, mask):
    """(NT, 128) masked monomial partial sums -> (NT, 10).

    Same expression order as the kernels' per-pass moment block
    (fit_kernel_grid.py: qx*qx*mask etc.), so per-tile partials are bitwise
    identical to the kernel's."""
    qx = xs - sx
    qy = ys - sy
    qz = zs - sz
    return jnp.concatenate(
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


def tiled_fit(
    xs, ys, zs, valid_f, tile_patch, gates_p, margin_thr,
    params: Params,
    num_zone0_patches: int,
    comm,
    spad: int = SPAD,
):
    """Run the fused fit program on the tiled layout as composed XLA.

    Args:
      xs, ys, zs, valid_f: (NT, 128) f32 tiled point data (this shard's).
      tile_patch: (NT, 1) int32 patch owning each tile (sentinels < spad).
      gates_p: (spad, 8) f32 [processed(global), shift_x/y/z, ...].
      margin_thr: () f32 zone-0 seed margin (margin * sensor_height).
      comm: FrameComm — reduce_patches / merge_lpr_table are the only
        cross-shard movement.

    Returns:
      (spad, OUT_COLS) f32 per-patch result table (fit_kernel OUT_* layout).
      ``spad`` is the padded patch-space width (geom.spad; 512 default CZM).
    """
    p = params
    nt = xs.shape[0]
    tpc = tile_patch[:, 0]
    num_lpr = p.num_lpr

    npasses, kind, peel, snap, gate_alive, final, th_arr = _pass_config(p)

    # Movement operands (same construction as fused_fit_grid's lb/oh).
    iota_t = jnp.arange(nt, dtype=jnp.int32)
    lb = (
        (tpc[:, None] == tpc[None, :]) & (iota_t[:, None] > iota_t[None, :])
    ).astype(jnp.float32)  # strict-lower same-segment

    proc_p = gates_p[:, 0:1]
    zone0_p = (
        jax.lax.broadcasted_iota(jnp.int32, (spad, 1), 0) < num_zone0_patches
    )
    gt = patch_lookup(
        jnp.concatenate(
            [gates_p[:, 0:4], zone0_p.astype(jnp.float32)], axis=1
        ),
        tpc,
    )  # (NT, 5): [processed, shift_x/y/z, zone0]
    proc_t = gt[:, 0:1]
    sx, sy, sz = gt[:, 1:2], gt[:, 2:3], gt[:, 3:4]
    zone0_t = gt[:, 4:5]

    active = valid_f * proc_t
    plane = jnp.zeros((spad, 14), jnp.float32)
    alive = proc_p
    nsnap = max(3, p.num_iter if p.enable_RVPF else 0)
    snaps = [jnp.zeros((spad, 5), jnp.float32) for _ in range(nsnap)]
    g_count = jnp.zeros((spad, 1), jnp.float32)
    final_tab = jnp.zeros((spad, 4), jnp.float32)

    for i in range(npasses):
        gate = alive if gate_alive[i] else proc_p
        th = jnp.float32(th_arr[i])

        if kind[i] == K_SEEDFIT:
            if peel[i] >= 0:
                snap_t = patch_lookup(snaps[int(peel[i])], tpc)  # (NT, 5)
                dist = (
                    xs * snap_t[:, 1:2] + ys * snap_t[:, 2:3]
                    + zs * snap_t[:, 3:4] + snap_t[:, 4:5]
                )
                hit = (
                    (snap_t[:, 0:1] > 0.5)
                    & (jnp.abs(dist) < jnp.float32(p.th_dist_v))
                ).astype(jnp.float32)
                active = active * (1.0 - hit)

            elig = active * jnp.where(
                (zone0_t > 0.5) & (zs < margin_thr), 0.0, 1.0
            )
            m_t = jnp.sum(elig, axis=1, keepdims=True)
            prior = jnp.dot(lb, m_t, precision=_HIGHEST)  # exclusive tile prefix
            quota = jnp.clip(jnp.float32(num_lpr) - prior, 0.0, None)
            rank = _lane_prefix_exclusive(elig)
            take = elig * (rank < quota).astype(jnp.float32)

            if getattr(comm, "is_sharded", False):
                # Dense local candidate table: slot r of a patch = its
                # r-th lowest eligible z IN THIS SHARD (tiles and lanes are
                # z-ascending, so shard rank = prior + lane rank). Each
                # (patch, slot) has exactly one contributing point, so the
                # tile reduction is an exact selection.
                grank = prior + rank  # (NT, 128) shard-global rank
                riota = jnp.arange(num_lpr, dtype=jnp.float32)
                sel = (
                    (grank[:, :, None] == riota[None, None, :])
                    & (take[:, :, None] > 0.5)
                )
                zslots = jnp.sum(
                    jnp.where(sel, zs[:, :, None], 0.0), axis=1
                )  # (NT, num_lpr)
                occ = jnp.sum(sel.astype(jnp.float32), axis=1)
                loc = _reduce_tiles_split3(
                    jnp.concatenate([zslots, occ, m_t], axis=1), tpc, spad
                )  # (spad, 2*num_lpr + 1)
                lpr_sum, lpr_cnt = comm.merge_lpr_table(
                    loc[:, :num_lpr],
                    loc[:, num_lpr : 2 * num_lpr],
                    loc[:, 2 * num_lpr],
                    num_lpr,
                )
                cnt = lpr_cnt[:, None]
                lpr_p = jnp.where(
                    cnt > 0, lpr_sum[:, None] / jnp.maximum(cnt, 1.0), 0.0
                )
            else:
                per = jnp.concatenate(
                    [
                        jnp.sum(zs * take, axis=1, keepdims=True),
                        jnp.sum(take, axis=1, keepdims=True),
                    ],
                    axis=1,
                )
                tot = _reduce_tiles_split3(per, tpc, spad)  # (spad, 2)
                cnt = tot[:, 1:2]
                lpr_p = jnp.where(
                    cnt > 0, tot[:, 0:1] / jnp.maximum(cnt, 1.0), 0.0
                )

            lg_t = patch_lookup(
                jnp.concatenate([lpr_p, gate], axis=1), tpc
            )  # (NT, 2)
            mask = (
                active
                * (zs < lg_t[:, 0:1] + th).astype(jnp.float32)
                * (lg_t[:, 1:2] > 0.5)
            )
        else:  # K_FITDIST
            if final[i]:
                final_tab = plane[:, 0:4]
            pl_t = patch_lookup(plane[:, 0:4], tpc)
            dist = (
                xs * pl_t[:, 0:1] + ys * pl_t[:, 1:2]
                + zs * pl_t[:, 2:3] + pl_t[:, 3:4]
            )
            mask = active * (dist < th).astype(jnp.float32)

        momp = comm.reduce_patches(
            _reduce_tiles_split3(
                _tile_moments(xs, ys, zs, sx, sy, sz, mask), tpc, spad
            )
        )
        if kind[i] == K_FITDIST and final[i]:
            g_count = momp[:, 0:1]

        row = plane_row_from_moments(
            momp, gates_p[:, 1:2], gates_p[:, 2:3], gates_p[:, 3:4]
        )
        upd = (gate > 0.5) & (momp[:, 0:1] > 0)
        plane = jnp.where(upd, row, plane)

        if kind[i] == K_SEEDFIT and snap[i] >= 0:
            vert = (
                (alive > 0.5)
                & zone0_p
                & (plane[:, 2:3] < jnp.float32(p.uprightness_thr))
            ).astype(jnp.float32)
            snaps[int(snap[i])] = jnp.concatenate(
                [vert, plane[:, 0:4]], axis=1
            )
            alive = vert

    zero = jnp.zeros((spad, 1), jnp.float32)
    # [normal(3), d, mean(3), n, gcount, cov(6), pad, snaps(5*nsnap),
    #  carry2(4), pad] — the canonical 48-col layout when nsnap == 3
    # (out_layout extends it for num_iter > 3).
    snap_off, carry2_off, out_cols = out_layout(p)
    # the concatenate below hard-codes these offsets; catch layout drift
    assert snap_off == 16 and carry2_off == snap_off + 5 * nsnap
    out = jnp.concatenate(
        [
            plane[:, 0:3],           # OUT_NORMAL
            plane[:, 3:4],           # OUT_D
            plane[:, 11:14],         # OUT_MEAN
            plane[:, 4:5],           # OUT_N
            g_count,                 # OUT_GCOUNT
            plane[:, 5:11],          # OUT_COV
            zero,                    # col 15 pad
            *snaps,                  # snap_off : snap_off + 5*nsnap
            final_tab,               # carry2_off : carry2_off + 4
            jnp.zeros((spad, out_cols - (16 + 5 * nsnap + 4)), jnp.float32),
        ],
        axis=1,
    )
    assert out.shape == (spad, out_cols)
    return out
