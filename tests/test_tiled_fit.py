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
