"""Single-scan demo (reference: python/examples/demo_visualize.py mirror).

Segments one scan and either opens an Open3D window (if installed) or prints
a summary. Usage: ppk-demo-visualize [scan.bin]
"""

import os
import sys


from patchworkpp_tpu.compat import pypatchworkpp
from patchworkpp_tpu.io import read_bin


def main() -> None:
    scan = sys.argv[1] if len(sys.argv) > 1 else os.path.join(
        os.environ.get("PPK_DATA_DIR", "/root/reference/data"), "000000.bin"
    )
    cloud = read_bin(scan)

    params = pypatchworkpp.Parameters()
    engine = pypatchworkpp.patchworkpp(params)
    engine.estimateGround(cloud)

    print(f"scan: {scan}")
    print(f"points: {len(cloud)}")
    print(f"ground: {len(engine.getGroundIndices())}")
    print(f"nonground: {len(engine.getNongroundIndices())}")
    print(f"time: {engine.getTimeTaken() / 1000:.1f} ms")
    print(f"centers/normals of {len(engine.getCenters())} processed patches")

    try:
        import open3d as o3d
    except ImportError:
        return
    # Mirror the reference demo's scene and key bindings
    # (python/examples/demo_visualize.py:44-83): ground green, nonground
    # red, patch centers yellow carrying the plane normals, a coordinate
    # frame, and H (help) / N (toggle normals) / ESC (close) callbacks.
    print("Press ...")
    print("\t H  : help")
    print("\t N  : visualize the surface normals")
    print("\tESC : close the Open3D window")

    g = o3d.geometry.PointCloud()
    g.points = o3d.utility.Vector3dVector(engine.getGround())
    g.paint_uniform_color([0.0, 1.0, 0.0])
    n = o3d.geometry.PointCloud()
    n.points = o3d.utility.Vector3dVector(engine.getNonground())
    n.paint_uniform_color([1.0, 0.0, 0.0])
    centers = o3d.geometry.PointCloud()
    centers.points = o3d.utility.Vector3dVector(engine.getCenters())
    centers.normals = o3d.utility.Vector3dVector(engine.getNormals())
    centers.paint_uniform_color([1.0, 1.0, 0.0])
    mesh = o3d.geometry.TriangleMesh.create_coordinate_frame()

    vis = o3d.visualization.VisualizerWithKeyCallback()
    vis.create_window(width=600, height=400)

    def _toggle_normals(v):
        opt = v.get_render_option()
        opt.point_show_normal = not opt.point_show_normal
        return False

    def _close(v):
        v.destroy_window()
        return False

    def _help(v):
        print("H: help | N: toggle surface normals | ESC: close")
        return False

    vis.register_key_callback(ord("H"), _help)
    vis.register_key_callback(ord("N"), _toggle_normals)
    vis.register_key_callback(256, _close)  # GLFW_KEY_ESCAPE
    for geom in (mesh, g, n, centers):
        vis.add_geometry(geom)
    vis.run()
    vis.destroy_window()


if __name__ == "__main__":
    main()
