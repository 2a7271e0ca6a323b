"""SemanticKITTI ground-segmentation evaluation harness.

The reference defers accuracy evaluation to the external
url-kaist/Ground-Segmentation-Benchmark repo (reference README.md:30); this
makes it first-class: streams a sequence through the engine with adapted
state and reports precision/recall/F1/accuracy against the semantic labels
(ground classes: road, parking, sidewalk, other-ground, lane-marking,
terrain), plus per-frame latency.

Usage:
  ppk-eval --root /data/semantickitti --seq 00
  ppk-eval --scan-dir /root/reference/data   # no labels: timing only
  ppk-eval --scan-dir /root/reference/data --golden golden/reference_ground_indices.npz
      # accuracy vs the compiled C++ reference's own labels (no dataset
      # needed; exact parity shows up as precision=recall=f1=1.0)
"""

import argparse
import json
import time


import numpy as np

from patchworkpp_tpu import Params
from patchworkpp_tpu.io import ScanDataset, evaluate_masks, ground_truth_mask
from patchworkpp_tpu.models import PatchworkPP


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--root", help="SemanticKITTI root (contains sequences/)")
    ap.add_argument("--seq", default="00")
    ap.add_argument("--scan-dir", help="flat dir of .bin scans (no labels)")
    ap.add_argument("--limit", type=int, default=0, help="max frames (0 = all)")
    ap.add_argument("--capacity", type=int, default=131072)
    ap.add_argument("--json", action="store_true", help="one JSON line output")
    ap.add_argument(
        "--batch", type=int, default=1,
        help="dispatch this many frames per device call "
             "(estimate_ground_sequence — bitwise-equal to per-frame; "
             "amortizes dispatch overhead for offline evaluation)",
    )
    ap.add_argument(
        "--golden",
        help="npz of reference ground indices (golden/README.md) to score "
             "against instead of SemanticKITTI labels; keys "
             "<variant>_<scanname>",
    )
    ap.add_argument(
        "--golden-variant", default="seq", choices=["seq", "fresh"],
        help="golden key prefix: 'seq' matches streaming with adapted state",
    )
    args = ap.parse_args()

    if args.root:
        ds = ScanDataset.semantickitti(args.root, args.seq)
    elif args.scan_dir:
        ds = ScanDataset(args.scan_dir)
    else:
        ap.error("need --root or --scan-dir")

    model = PatchworkPP(Params(), capacity=args.capacity)

    golden = np.load(args.golden) if args.golden else None

    def golden_mask(j: int, n: int):
        key = f"{args.golden_variant}_{ds.names[j]}"
        if key not in golden:
            return None
        m = np.zeros(n, bool)
        m[golden[key]] = True
        return m

    tp = fp = fn_ = tn = 0
    times = []
    n_frames = len(ds) if args.limit == 0 else min(args.limit, len(ds))
    i = 0
    while i < n_frames:
        if args.batch > 1 and i + args.batch <= n_frames:
            idxs = range(i, i + args.batch)
            results = model.estimate_ground_sequence(
                [ds.scan(j) for j in idxs]
            )
            times.append(results[0].time_taken_s / len(results))
        else:
            idxs = range(i, i + 1)
            res = model.estimate_ground(ds.scan(i))
            times.append(res.time_taken_s)
            results = [res]
        for j, res in zip(idxs, results):
            if golden is not None:
                gt = golden_mask(j, len(res.ground_mask))
            else:
                labels = ds.labels(j)
                gt = ground_truth_mask(labels) if labels is not None else None
            if gt is not None:
                r = evaluate_masks(res.ground_mask, gt)
                tp += r.tp
                fp += r.fp
                fn_ += r.fn
                tn += r.tn
        i += len(results)

    # Skip the first (compile) dispatch for latency stats. With --batch>1
    # each entry is a dispatch's wall time amortized per frame, so the
    # latency keys describe throughput, not single-frame tail latency.
    lat = np.asarray(times[1:] or times)
    out = {
        "frames": n_frames,
        "batch": args.batch,
        "mean_latency_ms": float(lat.mean() * 1e3),
        "p99_latency_ms": float(np.percentile(lat, 99) * 1e3),
        "scans_per_s": float(1.0 / lat.mean()),
        "sensor_height": model.sensor_height,
    }
    if tp + fp + fn_ + tn > 0:
        precision = tp / max(tp + fp, 1)
        recall = tp / max(tp + fn_, 1)
        out.update(
            precision=precision,
            recall=recall,
            f1=2 * precision * recall / max(precision + recall, 1e-12),
            accuracy=(tp + tn) / (tp + fp + fn_ + tn),
        )
    if args.json:
        print(json.dumps(out))
    else:
        for k, v in out.items():
            print(f"{k}: {v:.4f}" if isinstance(v, float) else f"{k}: {v}")


if __name__ == "__main__":
    main()
