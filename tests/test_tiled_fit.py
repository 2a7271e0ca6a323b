"""XLA tiled fit engine (ops/tiled_fit.py): parity with the other engines.

The tiled engine is the point-shardable fused path: the grid kernel's
layout, pass program, and fit math (fit_kernel.plane_row_from_moments is
shared verbatim), composed in XLA so collectives interleave at pass
boundaries. Its correctness bar is the repo-wide one: per-point label
equality with the unfused path (itself golden-exact) on real scans, single
device and sharded.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh

from patchworkpp_tpu import Params, init_state
from patchworkpp_tpu.pipeline import make_frame_fn

SUB = 16
CAPACITY = 8192


def _pad(cloud, cap=CAPACITY):
    out = np.zeros((cap, 4), np.float32)
    out[: len(cloud)] = cloud
    return out


def test_rne_split3_reconstructs_bitwise():
    """The integer-ops round-to-nearest bf16x3 split must sum back to the
    input EXACTLY (hi + mid + lo == x bitwise, incl. negatives, powers of
    two, rounding-up-at-boundary cases) for |x| above the bf16 DENORMAL
    floor of the third part (~1e-33; below it the lo part quantizes — the
    kernels' float-convert _split3 has the identical floor, and engine
    payloads at that magnitude are decision-dead). It is the carrier of
    every f32 payload through the tiled engine's movement dots; the float
    convert form of the same split is silently elided by XLA (the
    documented onehot.py hazard), hence this integer implementation."""
    from patchworkpp_tpu.ops.tiled_fit import _rne_bf16_split3

    rng = np.random.default_rng(3)
    vals = np.concatenate([
        (rng.normal(size=4096) * np.exp(rng.uniform(-60, 80, 4096))),
        [0.0, -0.0, 1.0, -1.0, 1e30, -1e30, 1.5],
        # rounding boundary: significand just above a bf16 midpoint
        [np.float32(1.0039063), np.float32(-1.0039063)],
    ]).astype(np.float32)
    vals = np.where(np.abs(vals) < 1e-30, np.float32(1e-30), vals)
    hi, mid, lo = jax.jit(_rne_bf16_split3)(jnp.asarray(vals))
    back = (
        np.asarray(hi, np.float32)
        + np.asarray(mid, np.float32)
        + np.asarray(lo, np.float32)
    )
    nz = vals != 0.0
    np.testing.assert_array_equal(
        back[nz].view(np.int32), vals[nz].view(np.int32)
    )
    assert (back[~nz] == 0.0).all()
    # parts really are bf16-representable (convert roundtrip is identity)
    for part in (hi, mid, lo):
        assert part.dtype == jnp.bfloat16
        p32 = np.asarray(part, np.float32)
        np.testing.assert_array_equal(
            p32, p32.astype(jnp.bfloat16).astype(np.float32)
        )


def test_reduce_tiles_split3_exact_selection():
    """Tile->patch reduction: single-tile patches are exact SELECTIONS
    (bitwise), multi-tile sums match a float64 reference to f32 tolerance."""
    from patchworkpp_tpu.ops.tiled_fit import _reduce_tiles_split3

    rng = np.random.default_rng(5)
    nt, c = 96, 10
    v = (rng.normal(size=(nt, c)) * np.exp(rng.uniform(-30, 30, (nt, c)))
         ).astype(np.float32)
    # patches 0..47 own one tile each; patch 48 owns the rest
    tpc = np.concatenate([np.arange(48), np.full(nt - 48, 48)]).astype(np.int32)
    out = np.asarray(
        jax.jit(_reduce_tiles_split3)(jnp.asarray(v), jnp.asarray(tpc))
    )
    nzmask = v[:48] != 0.0
    np.testing.assert_array_equal(
        out[:48][nzmask].view(np.int32), v[:48][nzmask].view(np.int32)
    )
    ref = v[48:].astype(np.float64).sum(0)
    # column sums accumulate in f32 per bf16 part: error ~ n * ulp(max |v|)
    np.testing.assert_allclose(
        out[48], ref, rtol=1e-5, atol=np.abs(v[48:]).max() * 1e-5
    )
    assert (out[49:] == 0).all()


def test_tiled_matches_unfused_chain(scans):
    """Single device: per-frame labels identical to the unfused path through
    a 3-scan adaptive chain (each engine evolves its own state — threshold
    feedback included), and num_ground agrees."""
    p = Params()
    uf = jax.jit(make_frame_fn(p, fused=False))
    tl = jax.jit(make_frame_fn(p, fused="tiled"))
    st_u, st_t = init_state(p), init_state(p)
    for name in ["000000", "000001", "000002"]:
        cloud = scans[name][::SUB]
        x = jnp.asarray(_pad(cloud))
        n = jnp.int32(len(cloud))
        st_u, ru = uf(st_u, x, n)
        st_t, rt = tl(st_t, x, n)
        np.testing.assert_array_equal(
            np.asarray(rt.ground_mask), np.asarray(ru.ground_mask),
            err_msg=name,
        )
        assert int(rt.num_ground) == int(ru.num_ground)
        np.testing.assert_array_equal(
            np.asarray(rt.patch_processed), np.asarray(ru.patch_processed)
        )


def test_tiled_rvpf_tgr_off_matches_unfused(scans):
    """Pass-program coverage: with R-VPF and TGR disabled the program is the
    4-pass (seed + 3 fitdist) variant; labels must still agree."""
    p = Params(enable_RVPF=False, enable_TGR=False)
    cloud = scans["000000"][::SUB]
    x = jnp.asarray(_pad(cloud))
    n = jnp.int32(len(cloud))
    _, ru = jax.jit(make_frame_fn(p, fused=False))(init_state(p), x, n)
    _, rt = jax.jit(make_frame_fn(p, fused="tiled"))(init_state(p), x, n)
    np.testing.assert_array_equal(
        np.asarray(rt.ground_mask), np.asarray(ru.ground_mask)
    )


def test_single_chip_kernels_reject_sharded_comm():
    """The Pallas kernels are whole-frame, single-chip programs: asking for
    one under a sharded comm must fail loudly, pointing at 'tiled'."""
    from patchworkpp_tpu.parallel.point_sharded import MeshComm

    with pytest.raises(ValueError, match="tiled"):
        make_frame_fn(Params(), comm=MeshComm("point"), fused="grid")


def test_tiled_sharded_matches_single_device(scans):
    """8-device point-sharded tiled engine == single-device labels, exactly,
    through a 2-frame adaptive chain (the LPR table merge and fixed-order
    moment reduction are the only cross-shard movement)."""
    devs = jax.devices()
    assert len(devs) >= 8
    mesh = Mesh(np.array(devs[:8]), ("d",))
    from patchworkpp_tpu.parallel import make_point_sharded_frame_fn

    p = Params()
    fn = make_point_sharded_frame_fn(p, mesh, axis="d", fused="tiled")
    single = jax.jit(make_frame_fn(p))
    st_s, st_1 = init_state(p), init_state(p)
    for name in ["000000", "000001"]:
        cloud = scans[name][::SUB]
        x = jnp.asarray(_pad(cloud))
        n = jnp.int32(len(cloud))
        st_s, rs = fn(st_s, x, n)
        st_1, r1 = single(st_1, x, n)
        np.testing.assert_array_equal(
            np.asarray(rs.ground_mask)[: len(cloud)],
            np.asarray(r1.ground_mask)[: len(cloud)],
            err_msg=name,
        )
