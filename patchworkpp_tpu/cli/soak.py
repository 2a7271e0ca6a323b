#!/usr/bin/env python
"""Long-horizon on-chip adaptivity soak (VERDICT r4 missing #3).

Runs thousands of state-chained frames through the production sequence
program (the bench's dispatch shape: `make_sequence_fn` epochs with the
adaptive state as carry, per-dispatch sub-um sensor-height nudge so no two
dispatches are relay-elidable) and ASSERTS the things an unbounded
deployment needs — the reference runs unbounded sequences with its buffers
FIFO-trimmed at 1000 (cpp/patchworkpp/src/patchworkpp.cpp:338-375); this
is the TPU engine's equivalent soak:

  - state finiteness every probe: sensor_height, elevation_thr,
    flatness_thr, buffer contents all finite;
  - boundedness: sensor_height within [1.0, 2.5] m of the rig, thresholds
    within sane envelopes (elevation_thr < 5 m, flatness_thr < 1);
  - FIFO invariants: buffer counts monotonically fill then pin at
    max storage (1000), never exceed it;
  - throughput stability: last-quarter group rate within 25% of the
    first-quarter rate (relay load swings are visible but a monotone
    slowdown = a leak in the dispatch chain).

Relay measurement rules per .claude/skills/verify/SKILL.md: async epoch
dispatches closed by ONE scalar fetch per group; the big state fetch (a few
hundred KB of buffers) happens once at the end, outside timing.

Usage: python scripts/soak.py [--frames 3000] [--json]
"""

from __future__ import annotations

import argparse
import dataclasses
import json
import os
import sys
import time

import numpy as np

import patchworkpp_tpu  # noqa: F401  (installed package; no path hack)

DATA_DIR = os.environ.get("PPK_DATA_DIR", "/root/reference/data")
CAPACITY = 131072
REPEAT = 4  # frames per dispatch = 6 * REPEAT (bench.py's amortization)


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--frames", type=int, default=3000)
    ap.add_argument("--groups", type=int, default=8,
                    help="probe points (scalar fetch + finiteness check)")
    ap.add_argument("--cpu", action="store_true",
                    help="force XLA:CPU (smoke mode; the sitecustomize pins "
                         "the TPU platform, env vars alone are too late)")
    args = ap.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from patchworkpp_tpu import Params, init_state
    from patchworkpp_tpu.io import read_bin
    from patchworkpp_tpu.pipeline import make_sequence_fn

    stack = np.zeros((6, CAPACITY, 4), np.float32)
    npts = np.zeros((6,), np.int32)
    for i in range(6):
        pts = read_bin(f"{DATA_DIR}/{i:06d}.bin")
        stack[i, : len(pts)] = pts
        npts[i] = len(pts)
    stack = jnp.asarray(np.tile(stack, (REPEAT, 1, 1)))
    npts_d = jnp.asarray(np.tile(npts, REPEAT))

    params = Params()
    seq = make_sequence_fn(params)

    def ep(st, stack, npts, eps):
        st = dataclasses.replace(
            st, sensor_height=st.sensor_height + eps
        )
        return seq(st, stack, npts)

    ep = jax.jit(ep)
    fpd = 6 * REPEAT
    epochs = max(1, args.frames // fpd)
    groups = min(args.groups, epochs)
    base, rem = divmod(epochs, groups)
    sizes = [base + (1 if g < rem else 0) for g in range(groups)]

    st = init_state(params)
    for i in range(2):  # warmup/compile
        st, _ = ep(st, stack, npts_d, jnp.float32(1e-6 * (i + 1)))
    float(st.sensor_height)

    failures = []
    rates = []
    heights = []
    prev_cnt = None
    ei = 0
    frames = 0
    for g in range(groups):
        t0 = time.perf_counter()
        for _ in range(sizes[g]):
            st, _ = ep(st, stack, npts_d, jnp.float32(1e-6 * (2 + ei)))
            ei += 1
        sh = float(st.sensor_height)  # the group's sync point (scalar D2H)
        rates.append(sizes[g] * fpd / (time.perf_counter() - t0))
        frames += sizes[g] * fpd
        heights.append(sh)
        if not np.isfinite(sh) or not (1.0 < sh < 2.5):
            failures.append(f"group {g}: sensor_height {sh}")
        # Small int32 count vectors: cheap enough to fetch per group.
        ec = np.asarray(st.elev_cnt)
        fc = np.asarray(st.flat_cnt)
        cap = params.max_elevation_storage
        if (ec < 0).any() or (ec > cap).any() or (fc < 0).any() or (
            fc > params.max_flatness_storage
        ).any():
            failures.append(f"group {g}: buffer counts out of range {ec} {fc}")
        if prev_cnt is not None and (ec < prev_cnt).any():
            failures.append(f"group {g}: buffer count shrank {prev_cnt}->{ec}")
        prev_cnt = ec

    # Full state audit once, outside timing (bulk D2H is slow on the relay).
    et = np.asarray(st.elevation_thr)
    ft = np.asarray(st.flatness_thr)
    eb = np.asarray(st.elev_buf)
    fb = np.asarray(st.flat_buf)
    for name, arr in (
        ("elevation_thr", et), ("flatness_thr", ft),
        ("elev_buf", eb), ("flat_buf", fb),
    ):
        if not np.isfinite(arr).all():
            failures.append(f"non-finite {name}")
    if (np.abs(et) > 5.0).any():
        failures.append(f"elevation_thr unbounded: {et}")
    if (np.abs(ft) > 1.0).any():
        failures.append(f"flatness_thr unbounded: {ft}")
    if int(np.asarray(st.elev_cnt)[0]) < min(
        params.max_elevation_storage, frames * 10
    ) and frames * 16 > 2 * params.max_elevation_storage:
        failures.append("ring-0 buffer never saturated — trim path unexercised")

    q = max(1, groups // 4)
    first = float(np.median(rates[:q]))
    last = float(np.median(rates[-q:]))
    if last < 0.75 * first:
        failures.append(
            f"throughput decayed {first:.1f} -> {last:.1f} scans/s"
        )

    print(json.dumps({
        "metric": "soak_frames",
        "frames": frames,
        "scans_per_s_groups": [round(r, 1) for r in rates],
        "first_quarter": round(first, 1),
        "last_quarter": round(last, 1),
        "sensor_height_first": round(heights[0], 4),
        "sensor_height_last": round(heights[-1], 4),
        "elev_cnt": np.asarray(st.elev_cnt).tolist(),
        "flat_cnt": np.asarray(st.flat_cnt).tolist(),
        "ok": not failures,
        "failures": failures,
    }))
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main())
