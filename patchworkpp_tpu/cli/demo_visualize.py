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
    g = o3d.geometry.PointCloud()
    g.points = o3d.utility.Vector3dVector(engine.getGround())
    g.paint_uniform_color([0.0, 1.0, 0.0])
    n = o3d.geometry.PointCloud()
    n.points = o3d.utility.Vector3dVector(engine.getNonground())
    n.paint_uniform_color([1.0, 0.0, 0.0])
    o3d.visualization.draw_geometries([g, n])


if __name__ == "__main__":
    main()
