"""Multi-stream demo: two LiDAR feeds multiplexed through one engine.

New capability over the reference (its ROS node serves exactly one topic per
process, ros/src/GroundSegmentationServer.cpp): N streams share one compiled
frame program, each with its own adaptive state, interleaved on one device
at full per-frame speed (see ROOFLINE.md "Multi-stream lowerings" for why
this beats batched lowerings on TPU).

Usage: ppk-demo-multi-stream [data_dir] [--streams N]
"""

import argparse
import os
import time

from patchworkpp_tpu.io import read_bin
from patchworkpp_tpu.serve import MultiStreamSegmenter


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument(
        "data_dir", nargs="?",
        default=os.environ.get("PPK_DATA_DIR", "/root/reference/data"),
    )
    ap.add_argument("--streams", type=int, default=2)
    args = ap.parse_args()

    names = sorted(f for f in os.listdir(args.data_dir) if f.endswith(".bin"))
    ms = MultiStreamSegmenter()

    # Stream s starts s scans into the sequence — distinct adaptive histories.
    for step, name in enumerate(names):
        for s in range(args.streams):
            feed = names[(step + s) % len(names)]
            cloud = read_bin(os.path.join(args.data_dir, feed))
            t0 = time.perf_counter()
            res = ms.segment(f"stream{s}", cloud)
            dt = 1e3 * (time.perf_counter() - t0)
            print(
                f"step {step} stream{s} ({feed}): {len(cloud)} pts -> "
                f"{int(res.ground_mask.sum())} ground  ({dt:.1f} ms, "
                f"sensor_height={ms.sensor_height(f'stream{s}'):.4f})"
            )


if __name__ == "__main__":
    main()
