#!/usr/bin/env python
"""On-chip lax.sort scaling microbench: operand count x key count.

The tiled layout's builder (ops/tiled.py:build_tiled) is one 196k-row
4-operand 2-key lax.sort = stage_sort = ~50% of the frame (ROOFLINE.md).
Every algorithmic alternative eventually reduces to "apply a 196k-row
permutation", which on TPU is the sort network itself (composed gathers are
~1 ms; Pallas per-element DMAs worse), so the only levers are BYTES through
the network (operand count) and comparator width (key count). This bench
measures both scaling laws to size those levers before building anything.

Relay-safe timing (see .claude/skills/verify/SKILL.md): every iteration
feeds on the previous output (no result caching), one scalar fetch closes
each timed run.

Usage: python scripts/bench_sort_variants.py [--rows 196608] [--iters 50]
"""

import argparse
import json
import time

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--rows", type=int, default=196608)
    ap.add_argument("--iters", type=int, default=50)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    n = args.rows
    rng = np.random.default_rng(0)
    pid = jnp.asarray(rng.integers(0, 512, n), jnp.int32)
    zk = jnp.asarray(rng.integers(0, 2**31, n).astype(np.uint32))
    x = jnp.asarray(rng.normal(size=n).astype(np.float32))
    y = jnp.asarray(rng.normal(size=n).astype(np.float32))

    variants = {
        # name: (operand builder, num_keys)
        "2key_4op (current)": (lambda s: (pid, zk + s, x, y), 2),
        "2key_3op": (lambda s: (pid, zk + s, x), 2),
        "2key_2op (keys only)": (lambda s: (pid, zk + s), 2),
        "1key_4op": (lambda s: (zk + s, x, y, pid.astype(jnp.float32)), 1),
        "1key_2op": (lambda s: (zk + s, x), 1),
        "1key_1op": (lambda s: (zk + s,), 1),
        "2key_4op_stable": (lambda s: (pid, zk + s, x, y), 2),
    }

    results = {}
    for name, (build, nk) in variants.items():
        stable = name.endswith("_stable")

        def step(s):
            out = jax.lax.sort(build(s), num_keys=nk, is_stable=stable)
            # feed forward: derive the next perturbation from the output so
            # every iteration's inputs differ (relay cache can't hit) and
            # iterations serialize.
            k0 = out[0]
            probe = (
                k0[0].astype(jnp.uint32)
                if k0.dtype != jnp.uint32
                else k0[0]
            )
            return (probe & jnp.uint32(1)) + s + jnp.uint32(1)

        fn = jax.jit(lambda s: jax.lax.fori_loop(
            0, args.iters, lambda i, c: step(c), s
        ))
        # warmup/compile
        s = fn(jnp.uint32(1))
        _ = int(s)
        t0 = time.perf_counter()
        s = fn(s)
        _ = int(s)
        dt = time.perf_counter() - t0
        per = dt / args.iters * 1e6
        results[name] = per
        print(f"{name:24s} {per:9.1f} us/sort", flush=True)

    print(json.dumps({"rows": n, "iters": args.iters, "us_per_sort": results}))


if __name__ == "__main__":
    main()
