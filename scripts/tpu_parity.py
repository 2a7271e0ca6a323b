#!/usr/bin/env python
"""On-hardware exact parity gate: the engine vs the C++ golden index sets.

Runs all 12 golden configurations (6 scans fresh-per-scan + 6 sequential,
full resolution) through the engine on the CURRENT default jax platform —
on the TPU this exercises the fused Pallas grid kernel exactly as the bench
does — and asserts per-point ground-index parity with
``golden/reference_ground_indices.npz`` (0 mismatches).

This is the hardware analog of ``tests/test_pipeline_golden.py`` (whose
conftest pins the CPU backend): Mosaic-compiled kernels and TPU reduction
orders are NOT covered by the CPU suite, so run this after any change to
pipeline semantics before quoting TPU numbers.

Usage:
  python scripts/tpu_parity.py             # default platform (TPU in-image)
  python scripts/tpu_parity.py --platform cpu
  python scripts/tpu_parity.py --unfused   # also gate the shardable XLA path
  python scripts/tpu_parity.py --tiled     # also gate the tiled XLA engine

Output: one PASS/FAIL line per configuration, nonzero exit on any mismatch.
D2H over a tunneled chip is slow: only the (P,) bool mask is fetched per
frame (~130 KB).
"""

import argparse
import os
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
DATA_DIR = os.environ.get("PPK_DATA_DIR", "/root/reference/data")
CAPACITY = 131072


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--platform", default=None,
                    help="jax platform override (e.g. cpu); default: in-image")
    ap.add_argument("--unfused", action="store_true",
                    help="also gate the unfused (point-shardable) XLA path")
    ap.add_argument("--tiled", action="store_true",
                    help="also gate the tiled XLA engine (the per-shard "
                         "program of the point-sharded multi-chip path)")
    ap.add_argument("--grid", action="store_true",
                    help="also gate the Mosaic grid kernel explicitly "
                         "(fused-auto is the tiled engine on TPU)")
    ap.add_argument("--skip-fused", action="store_true",
                    help="skip the fused-auto mode (e.g. to gate the XLA "
                         "paths without waiting for the Mosaic compile)")
    ap.add_argument("--chunks", type=int, default=0, metavar="K",
                    help="also gate the chunked engine (parallel/chunked.py,"
                         " the mesh-emulation path) at K chunks — the only "
                         "way its vmapped collectives run on REAL TPU "
                         "reduction orders rather than the CPU suite's")
    args = ap.parse_args()

    import jax
    if args.platform:
        jax.config.update("jax_platforms", args.platform)

    sys.path.insert(0, REPO)  # no-op under pip install -e; keeps bare runs working
    from patchworkpp_tpu.models import PatchworkPP

    golden = np.load(os.path.join(REPO, "golden", "reference_ground_indices.npz"))
    scans = [
        np.fromfile(f"{DATA_DIR}/{i:06d}.bin", np.float32).reshape(-1, 4)
        for i in range(6)
    ]
    print(f"platform: {jax.devices()[0].platform}", flush=True)

    modes = (
        ([] if args.skip_fused else [("fused-auto", None, 1)])
        + ([("unfused", False, 1)] if args.unfused else [])
        + ([("tiled", "tiled", 1)] if args.tiled else [])
        + ([("grid", "grid", 1)] if args.grid else [])
        + (
            [(f"chunked-{args.chunks}", None, args.chunks)]
            if args.chunks else []
        )
    )
    failures = 0
    for label, fused, chunks in modes:
        model = PatchworkPP(capacity=CAPACITY, fused=fused, chunks=chunks)
        t0 = time.perf_counter()
        for variant in ("fresh", "seq"):
            if variant == "fresh":
                pass  # reset per scan below
            else:
                model.reset()
            for i, cloud in enumerate(scans):
                if variant == "fresh":
                    model.reset()
                res = model.estimate_ground(cloud)
                got = np.sort(res.ground_indices)
                ref = np.sort(golden[f"{variant}_{i:06d}"])
                ok = got.shape == ref.shape and np.array_equal(got, ref)
                mism = (
                    0 if ok
                    else len(np.setxor1d(got, ref))
                )
                print(
                    f"[{label}] {variant}_{i:06d}: "
                    + ("PASS" if ok else f"FAIL ({mism} mismatched indices)"),
                    flush=True,
                )
                failures += 0 if ok else 1
        dt = time.perf_counter() - t0
        print(f"[{label}] 12 configurations in {dt:.1f}s "
              "(includes compile on first run)", flush=True)

    print("PARITY: " + ("OK" if failures == 0 else f"{failures} FAILURES"))
    return 0 if failures == 0 else 1


if __name__ == "__main__":
    sys.exit(main())
