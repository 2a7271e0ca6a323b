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
            _visualize(
                ground, nonground, engine.getCenters(), engine.getNormals()
            )


def _visualize(
    ground: np.ndarray,
    nonground: np.ndarray,
    centers: np.ndarray,
    normals: np.ndarray,
) -> None:
    """Reference demo's per-frame scene (python/examples/demo_sequential.py
    :36-85): ground green, nonground red, patch centers yellow with plane
    normals, coordinate frame, H/N/ESC key callbacks."""
    try:
        import open3d as o3d
    except ImportError:
        print("open3d not installed; skipping visualization")
        return
    print("Press ...")
    print("\t H  : help")
    print("\t N  : visualize the surface normals")
    print("\tESC : close the Open3D window")
    g = o3d.geometry.PointCloud()
    g.points = o3d.utility.Vector3dVector(ground)
    g.paint_uniform_color([0.0, 1.0, 0.0])
    n = o3d.geometry.PointCloud()
    n.points = o3d.utility.Vector3dVector(nonground)
    n.paint_uniform_color([1.0, 0.0, 0.0])
    c = o3d.geometry.PointCloud()
    c.points = o3d.utility.Vector3dVector(centers)
    c.normals = o3d.utility.Vector3dVector(normals)
    c.paint_uniform_color([1.0, 1.0, 0.0])
    mesh = o3d.geometry.TriangleMesh.create_coordinate_frame()

    vis = o3d.visualization.VisualizerWithKeyCallback()
    vis.create_window(width=600, height=400)

    def _toggle_normals(v):
        opt = v.get_render_option()
        opt.point_show_normal = not opt.point_show_normal
        return False

    vis.register_key_callback(
        ord("H"),
        lambda v: print("H: help | N: toggle surface normals | ESC: close")
        or False,
    )
    vis.register_key_callback(ord("N"), _toggle_normals)
    vis.register_key_callback(256, lambda v: v.destroy_window() or False)
    for geom in (mesh, g, n, c):
        vis.add_geometry(geom)
    vis.run()
    vis.destroy_window()


if __name__ == "__main__":
    main()
