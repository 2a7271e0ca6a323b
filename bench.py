"""Benchmark: sequential ground segmentation over the 6 bundled KITTI scans.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Baseline: the unmodified C++ reference compiled -O3 runs 29.8 scans/s on one
Xeon core over the same six scans (BASELINE.md). The measured configuration
here matches `demo_sequential`: one engine instance, adaptive state carried
across frames, per-frame host->device feed of the padded cloud and
device->host return of the boolean ground mask.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import numpy as np

BASELINE_SCANS_PER_S = 29.8
DATA_DIR = "/root/reference/data"
CAPACITY = 131072
WARMUP_EPOCHS = 2
TIMED_EPOCHS = 10


def main() -> None:
    import jax
    import jax.numpy as jnp

    from patchworkpp_tpu import Params, init_state
    from patchworkpp_tpu.pipeline import make_frame_fn

    scans = []
    for i in range(6):
        pts = np.fromfile(f"{DATA_DIR}/{i:06d}.bin", np.float32).reshape(-1, 4)
        padded = np.zeros((CAPACITY, 4), np.float32)
        padded[: len(pts)] = pts
        scans.append((padded, np.int32(len(pts))))

    params = Params()
    fn = jax.jit(make_frame_fn(params), donate_argnums=(0,))
    state = init_state(params)

    dev = jax.devices()[0]
    state = jax.device_put(state, dev)

    # Warmup (compile + cache)
    for _ in range(WARMUP_EPOCHS):
        for padded, n in scans:
            state, res = fn(state, jnp.asarray(padded), n)
    np.asarray(res.ground_mask)

    t0 = time.perf_counter()
    frames = 0
    last = None
    for _ in range(TIMED_EPOCHS):
        for padded, n in scans:
            state, res = fn(state, jnp.asarray(padded), n)
            last = np.asarray(res.ground_mask)  # D2H of the (P,) bool mask
            frames += 1
    dt = time.perf_counter() - t0

    scans_per_s = frames / dt
    print(
        json.dumps(
            {
                "metric": "kitti6_seq_scans_per_s_per_chip",
                "value": round(scans_per_s, 2),
                "unit": "scans/s",
                "vs_baseline": round(scans_per_s / BASELINE_SCANS_PER_S, 2),
            }
        )
    )


if __name__ == "__main__":
    main()
