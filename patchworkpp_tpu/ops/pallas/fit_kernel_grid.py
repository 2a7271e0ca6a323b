"""Grid-ified fused fit kernel: the pass program runs as the Pallas grid.

STATUS (round-4 policy): experimental Pallas canary, not a product path —
strictly dominated by the XLA tiled engine (ops/tiled_fit.py, which runs
this kernel's exact pass program composed in XLA: 1650 vs 1192 scans/s),
unshardable, 512-patch-native, ~110 s Mosaic compile. Retained as the
Pallas-toolchain regression canary and as the bitwise reference for the
tiled engine (shared _pass_config / plane_row_from_moments). Gate on
hardware with `scripts/tpu_parity.py --grid` when kernel code changes.

The unrolled fused kernel (fit_kernel.py) is semantically complete and
oracle-exact, but Mosaic compiles its ~11 unrolled passes for >40 minutes
on this toolchain (an unrolled segment-matrix variant, since removed, had
the same pathology). Here each grid step executes ONE pass, and the body
contains each pass *kind* exactly once — compiled code size is independent
of the number of passes:

  grid = (len(pass_program),)
  kind/config per pass arrive as scalar-prefetch arrays (SMEM); the per-pass
  f32 thresholds ride as a plain f32 scalar-prefetch array (verified to
  compile and run correctly on the real TPU toolchain).

Pass fusion: the scan/unrolled variants run a count -> lprsum -> fitseed
triple per seed round (reference seed selection + plane fit,
cpp/patchworkpp/src/patchworkpp.cpp:77-149, :467-549). The three stages are
sequentially dependent *through the seg-dots*, but splitting them into
separate grid steps duplicated the eligibility elementwise work and paid
3x the per-step overhead. Here each triple is ONE `seedfit` grid step
(peel -> count -> LPR -> seed mask -> moments -> fit -> snapshot) issuing
the same seg-dots in the same order on the same operands — bit-identical
results, 7 grid steps instead of 15 (4 with R-VPF off).

Patch-level state: fit state (plane carry, alive, snapshots, LPR) lives at
(SPAD, .) patch rows, not replicated per tile. Cross-tile movement uses two
0/1 bf16 matrices built in XLA:

  oh (NT, SPAD): tile t belongs to patch p. Patch totals are one
    contraction `oh^T @ per_tile` ((SPAD,C): 4x12 MXU tiles) and patch->tile
    broadcasts one `oh @ w` (12x4) — vs 12x12 for the (NT,NT) symmetric
    same-segment form, with the same contraction order (so totals are
    bitwise identical) and 6x less VMEM traffic per dot.
  lb (NT, NT) strict-lower same-segment: the LPR quota's exclusive tile
    prefix (no cheaper shape exists for a cross-tile prefix without Mosaic
    roll pathologies).

Broadcast exactness: f32 payloads ride the bf16x3 split (movement._split3)
packed into one wide dot. A broadcast row has exactly ONE contributing
addend, and chop-splitting into 8+8+8 significand bits makes (hi+mid)+lo
reconstruct the f32 value bitwise (Dekker), so per-tile plane / LPR / gate
values equal the per-patch originals exactly.
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from patchworkpp_tpu.params import Params
from patchworkpp_tpu.ops.onehot import SPAD
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
    build_pass_program,
    plane_row_from_moments,
)
from patchworkpp_tpu.ops.pallas.movement import (
    _seg_dots,
    _prior_exclusive,
)

LANE = 128
K_SEEDFIT, K_FITDIST = 0, 1


def _pass_config(p: Params):
    """Fuse each (count, lprsum, fitseed) triple of the canonical pass
    program (fit_kernel.build_pass_program) into one `seedfit` pass."""
    passes = build_pass_program(p)
    fused = []
    i = 0
    while i < len(passes):
        ps = passes[i]
        if ps.kind == "count":
            assert passes[i + 1].kind == "lprsum"
            seed = passes[i + 2]
            assert seed.kind == "fitseed"
            fused.append(
                (K_SEEDFIT, ps.peel_snap, seed.snap_slot,
                 int(seed.gate_alive), 0, seed.th)
            )
            i += 3
        else:
            assert ps.kind == "fitdist"
            fused.append(
                (K_FITDIST, -1, -1, int(ps.gate_alive), int(ps.is_final),
                 ps.th)
            )
            i += 1
    kind, peel, snap, gate_alive, final, th = map(np.array, zip(*fused))
    return (
        len(fused),
        kind.astype(np.int32), peel.astype(np.int32), snap.astype(np.int32),
        gate_alive.astype(np.int32), final.astype(np.int32),
        th.astype(np.float32),
    )


def make_fit_kernel_grid(
    params: Params, nt: int, num_zone0_patches: int, prefix_mode: str = "lb"
):
    p = params

    def kernel(
        # scalar-prefetch (SMEM):
        kind_ref, peel_ref, snapslot_ref, gatea_ref, final_ref, th_ref,
        # VMEM inputs:
        xs_ref, ys_ref, zs_ref, val_ref, lb_ref, oh_ref, gates_t_ref,
        gates_p_ref, consts_ref,
        # output:
        out_ref,
        # scratch:
        active_ref, plane_ref, alive_ref, snap_ref, mask_ref, *extra_scratch,
    ):
        phase = pl.program_id(0)
        kind = kind_ref[phase]
        margin_thr = consts_ref[0, 0]
        th = th_ref[phase]

        oh = oh_ref[:]
        proc_t = gates_t_ref[:, 0:1]
        sx = gates_t_ref[:, 1:2]
        sy = gates_t_ref[:, 2:3]
        sz = gates_t_ref[:, 3:4]
        zone0_t = gates_t_ref[:, 4:5]
        proc_p = gates_p_ref[:, 0:1]
        spx = gates_p_ref[:, 1:2]
        spy = gates_p_ref[:, 2:3]
        spz = gates_p_ref[:, 3:4]
        zone0_p = (
            jax.lax.broadcasted_iota(jnp.int32, (SPAD, 1), 0)
            < num_zone0_patches
        )

        def bcast(w):
            """Patch rows -> tile rows, bitwise exact (single addend)."""
            return _seg_dots(oh, w, transpose=False)

        def reduce_p(v):
            """Per-tile rows -> patch totals (same contraction order as the
            (NT,NT) symmetric form: addends sit at the same K positions)."""
            return _seg_dots(oh, v, transpose=True)

        @pl.when(phase == 0)
        def _():
            active_ref[:] = val_ref[:] * proc_t
            plane_ref[:] = jnp.zeros((SPAD, 16), jnp.float32)
            alive_ref[:] = proc_p
            snap_ref[:] = jnp.zeros((SPAD, 16), jnp.float32)
            if prefix_mode == "iota":
                # Static strict-lower all-tiles triangle, built once in VMEM
                # from iotas: saves the per-frame HBM write+read of the
                # data-dependent (NT, NT) same-segment matrix (~9 MB of
                # traffic). Data-dependence is re-introduced arithmetically
                # in the SEEDFIT prior below.
                r = jax.lax.broadcasted_iota(jnp.int32, (nt, nt), 0)
                cc = jax.lax.broadcasted_iota(jnp.int32, (nt, nt), 1)
                extra_scratch[0][:] = (r > cc).astype(jnp.bfloat16)

        gate_p = jnp.where(gatea_ref[phase] > 0, alive_ref[:], proc_p)

        # ---- kind: SEEDFIT (peel -> count -> LPR -> seed mask) ----
        @pl.when(kind == K_SEEDFIT)
        def _():
            peel_slot = peel_ref[phase]
            for slot in range(3):
                @pl.when(peel_slot == slot)
                def _():
                    snap_t = bcast(snap_ref[:, slot * 5 : slot * 5 + 5])
                    dist = (
                        xs_ref[:] * snap_t[:, 1:2] + ys_ref[:] * snap_t[:, 2:3]
                        + zs_ref[:] * snap_t[:, 3:4] + snap_t[:, 4:5]
                    )
                    hit = (
                        (snap_t[:, 0:1] > 0.5)
                        & (jnp.abs(dist) < jnp.float32(p.th_dist_v))
                    ).astype(jnp.float32)
                    active_ref[:] = active_ref[:] * (1.0 - hit)
            act = active_ref[:]
            elig = act * jnp.where(
                (zone0_t > 0.5) & (zs_ref[:] < margin_thr), 0.0, 1.0
            )
            m_t = jnp.sum(elig, axis=1, keepdims=True)
            if prefix_mode == "lb":
                prior = _prior_exclusive(lb_ref[:], m_t)
            else:
                # Segmented exclusive prefix from the static triangle:
                #   A[t]  = #eligible in ALL tiles before t   (L_all @ m)
                #   B[p]  = A at patch p's FIRST tile          (oh^T pick)
                #   prior = A - bcast(B)
                # All quantities are integer counts < 2^24: exact in f32,
                # and the picks/broadcasts have a single addend each.
                a_t = _seg_dots(extra_scratch[0][:], m_t, transpose=False)
                b_p = reduce_p(a_t * lb_ref[:])  # lb_ref = first-tile flags
                prior = a_t - bcast(b_p)
            quota = jnp.clip(jnp.float32(p.num_lpr) - prior, 0.0, None)
            rank = _lane_prefix_exclusive(elig)
            take = elig * (rank < quota).astype(jnp.float32)
            per_tile = jnp.concatenate(
                [
                    jnp.sum(zs_ref[:] * take, axis=1, keepdims=True),
                    jnp.sum(take, axis=1, keepdims=True),
                ],
                axis=1,
            )
            tot = reduce_p(per_tile)  # (SPAD, 2)
            cnt = tot[:, 1:2]
            lpr_p = jnp.where(
                cnt > 0, tot[:, 0:1] / jnp.maximum(cnt, 1.0), 0.0
            )
            lg_t = bcast(jnp.concatenate([lpr_p, gate_p], axis=1))
            mask_ref[:] = (
                act
                * (zs_ref[:] < lg_t[:, 0:1] + th).astype(jnp.float32)
                * (lg_t[:, 1:2] > 0.5)
            )

        # ---- kind: FITDIST ----
        @pl.when(kind == K_FITDIST)
        def _():
            pr = plane_ref[:]
            @pl.when(final_ref[phase] > 0)
            def _():
                out_ref[:, OUT_CARRY2:OUT_CARRY2 + 4] = pr[:, 0:4]
            pl_t = bcast(pr[:, 0:4])
            dist = (
                xs_ref[:] * pl_t[:, 0:1] + ys_ref[:] * pl_t[:, 1:2]
                + zs_ref[:] * pl_t[:, 2:3] + pl_t[:, 3:4]
            )
            mask_ref[:] = active_ref[:] * (dist < th).astype(jnp.float32)

        # ---- shared: moments + fit + snapshot (every pass fits) ----
        mask = mask_ref[:]
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
        momp = reduce_p(per_tile)  # (SPAD, 10)

        @pl.when((kind == K_FITDIST) & (final_ref[phase] > 0))
        def _():
            out_ref[:, OUT_GCOUNT:OUT_GCOUNT + 1] = momp[:, 0:1]

        row = plane_row_from_moments(momp, spx, spy, spz)
        upd = (gate_p > 0.5) & (momp[:, 0:1] > 0)
        old = plane_ref[:]
        new = jnp.concatenate([row, old[:, 14:16] * 0], axis=1)
        plane_ref[:] = jnp.where(upd, new, old)

        snap_slot = snapslot_ref[phase]
        for slot in range(3):
            @pl.when(snap_slot == slot)
            def _():
                pr2 = plane_ref[:]
                vert = (
                    (alive_ref[:] > 0.5)
                    & zone0_p
                    & (pr2[:, 2:3] < jnp.float32(p.uprightness_thr))
                ).astype(jnp.float32)
                snap_ref[:, slot * 5 : slot * 5 + 5] = jnp.concatenate(
                    [vert, pr2[:, 0:4]], axis=1
                )
                alive_ref[:] = vert

        # ---- final output assembly on the last pass ----
        @pl.when(phase == pl.num_programs(0) - 1)
        def _():
            pr = plane_ref[:]
            out_ref[:, OUT_NORMAL:OUT_NORMAL + 3] = pr[:, 0:3]
            out_ref[:, OUT_D:OUT_D + 1] = pr[:, 3:4]
            out_ref[:, OUT_MEAN:OUT_MEAN + 3] = pr[:, 11:14]
            out_ref[:, OUT_N:OUT_N + 1] = pr[:, 4:5]
            out_ref[:, OUT_COV:OUT_COV + 6] = pr[:, 5:11]
            out_ref[:, OUT_SNAP:OUT_SNAP + 15] = snap_ref[:, 0:15]
            out_ref[:, 35:OUT_COLS] = jnp.zeros(
                (SPAD, OUT_COLS - 35), jnp.float32
            )

    return kernel


@functools.partial(
    jax.jit,
    static_argnames=("params", "num_zone0_patches", "interpret", "prefix_mode"),
)
def fused_fit_grid(
    xs, ys, zs, valid_f, tile_patch, gates_t, gates_p, consts,
    params: Params,
    num_zone0_patches: int,
    interpret: bool = False,
    prefix_mode: str = "lb",
):
    """Grid-ified fused fit loop.

    Args:
      xs, ys, zs, valid_f: (NT, 128) f32 tiled point data.
      tile_patch: (NT, 1) int32 patch owning each tile.
      gates_t: (NT, 8) f32 per-tile [processed, shift_x/y/z, zone0, 0..].
      gates_p: (SPAD, 8) f32 per-patch [processed, shift_x/y/z, 0..].
      consts: (1, 8) f32: [margin_thr, ...].
      prefix_mode: how the LPR quota's exclusive tile prefix is computed.
        "lb": dot against a data-dependent (NT, NT) strict-lower same-segment
        bf16 input (4.7 MB written+read through HBM every frame). "iota":
        build the STATIC all-tiles triangle once in VMEM scratch and
        re-segment arithmetically (prior = A - bcast(A at each patch's first
        tile)) — two extra (NT, SPAD) dots per seed pass, no big HBM input.
        Bit-identical outputs (integer counts, exact in f32 either way).

    Returns:
      (SPAD, 48) f32 per-patch result table (see fit_kernel OUT_* layout).
    """
    nt = xs.shape[0]
    npasses, kind, peel, snap, gate_alive, final, th_arr = _pass_config(params)

    tpc = tile_patch[:, 0]
    if prefix_mode == "lb":
        same = tpc[:, None] == tpc[None, :]
        lower = (
            jnp.arange(nt, dtype=jnp.int32)[:, None]
            > jnp.arange(nt, dtype=jnp.int32)[None, :]
        )
        # strict-lower same-segment: exclusive prefix
        prior_arg = (same & lower).astype(jnp.bfloat16)
        prior_spec = pl.BlockSpec(
            (nt, nt), lambda i, *_: (0, 0), memory_space=pltpu.VMEM
        )
        extra_scratch = []
    elif prefix_mode == "iota":
        first = jnp.concatenate(
            [jnp.ones(1, bool), tpc[1:] != tpc[:-1]]
        )  # first tile of each patch run
        prior_arg = first.astype(jnp.float32)[:, None]  # (NT, 1)
        prior_spec = pl.BlockSpec(
            (nt, 1), lambda i, *_: (0, 0), memory_space=pltpu.VMEM
        )
        extra_scratch = [pltpu.VMEM((nt, nt), jnp.bfloat16)]  # static triangle
    else:
        raise ValueError(f"unknown prefix_mode {prefix_mode!r}")
    oh = (
        tpc[:, None] == jnp.arange(SPAD, dtype=jnp.int32)[None, :]
    ).astype(jnp.bfloat16)                    # tile -> patch one-hot

    kernel = make_fit_kernel_grid(
        params, nt, num_zone0_patches, prefix_mode=prefix_mode
    )
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=6,
        grid=(npasses,),
        in_specs=[
            pl.BlockSpec((nt, LANE), lambda i, *_: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((nt, LANE), lambda i, *_: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((nt, LANE), lambda i, *_: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((nt, LANE), lambda i, *_: (0, 0), memory_space=pltpu.VMEM),
            prior_spec,
            pl.BlockSpec((nt, SPAD), lambda i, *_: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((nt, 8), lambda i, *_: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((SPAD, 8), lambda i, *_: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 8), lambda i, *_: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (SPAD, OUT_COLS), lambda i, *_: (0, 0), memory_space=pltpu.VMEM
        ),
        scratch_shapes=[
            pltpu.VMEM((nt, LANE), jnp.float32),   # active
            pltpu.VMEM((SPAD, 16), jnp.float32),   # plane carry
            pltpu.VMEM((SPAD, 1), jnp.float32),    # alive
            pltpu.VMEM((SPAD, 16), jnp.float32),   # snapshots
            pltpu.VMEM((nt, LANE), jnp.float32),   # fit mask
        ] + extra_scratch,
    )
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((SPAD, OUT_COLS), jnp.float32),
        # All blocks are whole-array with constant index maps; the kernel's
        # working set (~30 MB at NT=1532: the (NT,NT) prefix triangle + the
        # (NT,SPAD) one-hot + the tiled point planes + scratch) exceeds the
        # default 16 MB *scoped* vmem budget but fits comfortably in the
        # 128 MB physical VMEM of a v5e core, so raise the scoped limit
        # explicitly.
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=interpret,
    )(
        jnp.asarray(kind), jnp.asarray(peel), jnp.asarray(snap),
        jnp.asarray(gate_alive), jnp.asarray(final), jnp.asarray(th_arr),
        xs, ys, zs, valid_f, prior_arg, oh, gates_t, gates_p, consts,
    )
