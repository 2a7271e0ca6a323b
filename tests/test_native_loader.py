"""Native prefetching loader: ordering, padding, lifecycle, fallback."""

import glob

import numpy as np
import pytest

from patchworkpp_tpu.io import read_bin
from patchworkpp_tpu.io.native_loader import NativeScanLoader, available

pytestmark = pytest.mark.skipif(not available(), reason="native loader not built")

PATHS = sorted(glob.glob("/root/reference/data/*.bin"))
CAP = 131072


def test_ordered_iteration_matches_numpy():
    with NativeScanLoader(PATHS, capacity=CAP, queue_depth=3, n_threads=3) as ld:
        seen = 0
        for view, npts, idx in ld:
            ref = read_bin(PATHS[idx])
            assert idx == seen
            assert npts == len(ref)
            np.testing.assert_array_equal(view[:npts], ref)
            assert (view[npts:] == 0).all()
            seen += 1
        assert seen == len(PATHS)
        assert ld.io_errors == 0


def test_loop_mode_wraps():
    with NativeScanLoader(PATHS[:2], capacity=CAP, loop=True) as ld:
        it = iter(ld)
        idxs = [next(it)[2] for _ in range(5)]
        assert idxs == [0, 1, 2, 3, 4]  # monotonically increasing epoch index


def test_missing_file_counts_error(tmp_path):
    bad = str(tmp_path / "nope.bin")
    with NativeScanLoader([PATHS[0], bad], capacity=CAP) as ld:
        out = list(ld)
        assert len(out) == 2
        assert out[1][1] == 0  # failed scan -> 0 points
        assert ld.io_errors == 1
