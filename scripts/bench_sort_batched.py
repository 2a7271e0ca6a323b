#!/usr/bin/env python
"""On-chip lax.sort scaling: monolithic (P,) vs batched (K, P/K) rows.

Motivation (ROOFLINE.md "Dead ends" + dense-scan table): the sort is nearly
FLAT in row count up to ~262k rows, then leaves the flat region (524k-pt
frames cost 2.7x the 262k frames). lax.sort over a 2D operand sorts each
row independently in ONE call — if a (4, 131072) batched sort stays near the
131k flat floor, a single-device CHUNKED engine (point-sharding math with a
leading chunk axis instead of a mesh) wins the dense regime on one chip.

Same relay-safe pattern as bench_sort_variants.py: feed-forward perturbation,
fori_loop chaining, one scalar fetch per timed run.

Usage: python scripts/bench_sort_batched.py [--iters 30]
"""

import argparse
import json
import time

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=30)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    rng = np.random.default_rng(0)

    # (total_rows, num_chunks) — shapes mirror build_tiled's 4-op 2-key sort
    # at the product row counts (tiled rows = 1.5x point capacity): 196608 =
    # the 131k-capacity frame, 393216 = densify-2, 786432 = densify-4.
    shapes = [
        (196608, 1),
        (393216, 1),
        (393216, 2),
        (786432, 1),
        (786432, 2),
        (786432, 4),
    ]

    results = {}
    for total, k in shapes:
        n = total // k
        shape = (k, n) if k > 1 else (n,)
        pid = jnp.asarray(rng.integers(0, 512, total).reshape(shape), jnp.int32)
        zk = jnp.asarray(
            rng.integers(0, 2**31, total).astype(np.uint32).reshape(shape)
        )
        x = jnp.asarray(rng.normal(size=total).astype(np.float32).reshape(shape))
        y = jnp.asarray(rng.normal(size=total).astype(np.float32).reshape(shape))

        def step(s):
            out = jax.lax.sort(
                (pid, zk + s, x, y), dimension=-1, num_keys=2, is_stable=False
            )
            flat0 = out[1].reshape(-1)[0]
            return (flat0 & jnp.uint32(1)) + s + jnp.uint32(1)

        fn = jax.jit(
            lambda s: jax.lax.fori_loop(0, args.iters, lambda i, c: step(c), s)
        )
        s = fn(jnp.uint32(1))
        _ = int(s)
        t0 = time.perf_counter()
        s = fn(s)
        _ = int(s)
        per = (time.perf_counter() - t0) / args.iters * 1e6
        name = f"{total // 1024}k_rows_x{k}chunks"
        results[name] = round(per, 1)
        print(f"{name:24s} {per:9.1f} us/sort", flush=True)

    print(json.dumps({"iters": args.iters, "us_per_sort": results}))


if __name__ == "__main__":
    main()
