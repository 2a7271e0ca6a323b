"""Sequential demo: segment the bundled KITTI scans with adapted state.

Mirror of the reference demo (reference: python/examples/demo_sequential.py):
iterates the data directory in order with one engine instance so the A-GLE
thresholds and sensor height adapt across frames, printing per-frame counts
and timing. Open3D visualization is optional (not installed in this image).

Usage: ppk-demo-sequential [data_dir] [--visualize]
"""

import argparse
import os


import numpy as np

from patchworkpp_tpu.compat import pypatchworkpp
from patchworkpp_tpu.io import read_bin


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument(
        "data_dir", nargs="?",
        default=os.environ.get("PPK_DATA_DIR", "/root/reference/data"),
    )
    ap.add_argument("--visualize", action="store_true")
    args = ap.parse_args()

    params = pypatchworkpp.Parameters()
    params.verbose = False
    engine = pypatchworkpp.patchworkpp(params)

    names = sorted(f for f in os.listdir(args.data_dir) if f.endswith(".bin"))
    for name in names:
        cloud = read_bin(os.path.join(args.data_dir, name))
        engine.estimateGround(cloud)
        ground = engine.getGround()
        nonground = engine.getNonground()
        print(
            f"{name}: {len(cloud)} pts -> {len(ground)} ground / "
            f"{len(nonground)} nonground  "
            f"({engine.getTimeTaken() / 1000:.1f} ms, "
            f"sensor_height={engine.getHeight():.4f})"
        )
        if args.visualize:
            _visualize(ground, nonground)


def _visualize(ground: np.ndarray, nonground: np.ndarray) -> None:
    try:
        import open3d as o3d
    except ImportError:
        print("open3d not installed; skipping visualization")
        return
    g = o3d.geometry.PointCloud()
    g.points = o3d.utility.Vector3dVector(ground)
    g.paint_uniform_color([0.0, 1.0, 0.0])
    n = o3d.geometry.PointCloud()
    n.points = o3d.utility.Vector3dVector(nonground)
    n.paint_uniform_color([1.0, 0.0, 0.0])
    o3d.visualization.draw_geometries([g, n])


if __name__ == "__main__":
    main()
