"""Compat facade: reference pybind11 API surface + behavior."""

import numpy as np
import pytest

from patchworkpp_tpu.compat import pypatchworkpp
from patchworkpp_tpu.oracle import NumpyPatchworkpp

SUB = 16


@pytest.fixture(scope="module")
def engine():
    return pypatchworkpp.patchworkpp(pypatchworkpp.Parameters())


def test_parameters_surface():
    """All fields the reference binds (pybinding.cpp:14-43) exist, same defaults."""
    p = pypatchworkpp.Parameters()
    assert p.sensor_height == 1.723
    assert p.num_iter == 3 and p.num_lpr == 20 and p.num_min_pts == 10
    assert p.th_seeds == 0.125 and p.th_dist == 0.125
    assert p.th_seeds_v == 0.25 and p.th_dist_v == 0.1
    assert p.max_range == 80.0 and p.min_range == 2.7
    assert p.uprightness_thr == 0.707
    assert p.adaptive_seed_selection_margin == -1.2
    assert p.RNR_ver_angle_thr == -15.0 and p.RNR_intensity_thr == 0.2
    assert p.num_sectors_each_zone == [16, 32, 54, 32]
    assert p.num_rings_each_zone == [2, 4, 4, 4]
    assert p.max_flatness_storage == 1000 and p.max_elevation_storage == 1000
    assert p.elevation_thr == [0, 0, 0, 0] and p.flatness_thr == [0, 0, 0, 0]
    assert p.enable_RNR and p.enable_RVPF and p.enable_TGR
    assert p.intensity_thr == 0.2


def test_estimate_and_getters(engine, scans):
    cloud = scans["000000"][::SUB]
    engine.estimateGround(cloud)

    gi = engine.getGroundIndices()
    ngi = engine.getNongroundIndices()
    assert gi.size + ngi.size == len(cloud)
    assert np.intersect1d(gi, ngi).size == 0

    g = engine.getGround()
    ng = engine.getNonground()
    assert g.shape == (gi.size, 3)
    assert ng.shape == (ngi.size, 3)
    np.testing.assert_allclose(g, cloud[gi, :3])

    c = engine.getCenters()
    n = engine.getNormals()
    assert c.shape == n.shape and c.shape[1] == 3
    assert 0 < len(c) <= 504

    assert engine.getTimeTaken() > 0
    assert 1.5 < engine.getHeight() < 2.0


def test_matches_oracle_via_compat(scans):
    cloud = scans["000002"][::SUB]
    params = pypatchworkpp.Parameters()
    eng = pypatchworkpp.patchworkpp(params)
    eng.estimateGround(cloud)
    ref = NumpyPatchworkpp().estimate_ground(cloud)
    np.testing.assert_array_equal(np.flatnonzero(ref), eng.getGroundIndices())


def test_custom_params_roundtrip(scans):
    params = pypatchworkpp.Parameters()
    params.enable_RNR = False
    params.sensor_height = 1.88
    params.uprightness_thr = 0.101
    eng = pypatchworkpp.patchworkpp(params)
    cloud = scans["000000"][::SUB]
    eng.estimateGround(cloud)
    assert eng.getGroundIndices().size > 0


def test_requires_estimate_first():
    eng = pypatchworkpp.patchworkpp(pypatchworkpp.Parameters())
    with pytest.raises(RuntimeError):
        eng.getGround()
