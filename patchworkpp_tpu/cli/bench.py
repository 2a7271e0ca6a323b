"""Benchmark: sequential ground segmentation over the 6 bundled KITTI scans.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Baseline: the unmodified C++ reference compiled -O3 runs 29.8 scans/s on one
Xeon core over the same six scans (BASELINE.md). The measured configuration
matches `demo_sequential` semantics: one engine (the tiled XLA engine,
ops/tiled_fit.py — make_frame_fn's auto default on every backend since
round 3), adaptive state carried across frames in order. Each 6-scan epoch runs as one `make_sequence_fn` dispatch (a
lax.scan with the state as carry — bitwise-equal to the per-frame loop,
asserted in tests/test_pipeline_golden.py::test_sequence_fn_matches_frame
_loop), so the tunnel's per-dispatch overhead (~0.3 ms) is amortized and
the number measures the engine, not the relay. (The 24-frame dispatch
depth is part of the metric's PROTOCOL — kept for cross-round
comparability; longer chains amortize the group-end sync further, e.g.
the 49k-frame soak's ~3000-frame groups read ~1925 scans/s steady-state
on the same program — SOAK_r05.json.) The state chain makes every
frame's execution depend on the previous one, and a distinct um-scale z
epsilon per dispatch guarantees no two dispatches ever see identical
(state, input) pairs (on the cyclic workload the adaptive state can reach
an exact float32 fixed point, which would otherwise make tail epochs
bitwise-identical and relay-cache elidable), so no execution can be elided
or served from a result cache, and one scalar fetch at the end is a sound
synchronization point. (In this sandbox the TPU is tunneled: bulk D2H runs
at ~2.5 MB/s and `block_until_ready` does not reliably block, so per-frame
fetches — even of the int32 ground count — would measure the tunnel's ~6 ms
round-trip, not the engine. On a directly-attached TPU the 128 KB mask is a
trivially overlapped PCIe transfer.)

The adaptive sensor height is fetched before and after the timed loop as
the synchronization points; elision-proofing is by construction (the
per-dispatch nudge), with the ring-0 buffer comparison as a secondary
indicator.
"""

import argparse
import dataclasses
import json
import os
import statistics
import sys
import time

import numpy as np

BASELINE_SCANS_PER_S = 29.8
DATA_DIR = os.environ.get("PPK_DATA_DIR", "/root/reference/data")
CAPACITY = 131072
# 3000 frames timed, split into GROUPS independently-timed groups: the JSON
# line reports the group MEDIAN with min/max, so a single relay-load spike
# (or a lucky quiet window) can no longer masquerade as the engine's number
# (round-2 VERDICT weak #1: a 16% builder-vs-driver spread went undetected
# because the bench printed one undispersed number).
TIMED_EPOCHS = 500
GROUPS = 5


def _nudge(st, eps):
    """State with sensor_height shifted by eps — the per-dispatch
    elision-proof (see main's note; eps must exceed the f32 ulp of ~1.76,
    i.e. 1.2e-7, or the add is an exact no-op). Rides the tiny state, NOT
    the (B, P, 4) stack: an elementwise op on that minor-dim-4 layout runs
    at 4/128 lane utilization (a measured ~45 us/frame)."""
    return dataclasses.replace(st, sensor_height=st.sensor_height + eps)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument(
        "--profile", action="store_true",
        help="also trace a short window and print the per-stage device-time "
             "split to stderr (stdout stays one JSON line for the driver)",
    )
    ap.add_argument(
        "--densify", type=int, default=1, metavar="K",
        help="overlay each scan with K-1 slightly shifted copies (128-beam-"
             "class density scaling; ROOFLINE.md's 262k-point row is K=2). "
             "Raises the capacity automatically. Default 1: the baseline-"
             "comparable 6-scan workload.",
    )
    ap.add_argument(
        "--capacity", type=int, default=None,
        help=f"padded point capacity (default {CAPACITY} * densify)",
    )
    ap.add_argument(
        "--epochs", type=int, default=TIMED_EPOCHS,
        help="timed 6-frame epochs (split across --groups)",
    )
    ap.add_argument(
        "--groups", type=int, default=GROUPS,
        help="independently timed groups; the JSON line reports the group "
             "MEDIAN scans/s plus min/max (dispersion makes relay-load "
             "noise visible instead of folding it into one number)",
    )
    ap.add_argument(
        "--fused", default="auto",
        choices=["auto", "grid", "grid_iota", "unfused", "tiled"],
        help="engine path: auto (default; resolves to the tiled XLA engine "
             "on every backend), 'tiled' explicitly (also what the point-"
             "sharded multi-chip program runs per shard), 'grid'/'grid_iota' "
             "(the experimental Mosaic kernel canary, ~110 s compile), or "
             "'unfused' (the sorted-layout XLA fallback)",
    )
    ap.add_argument(
        "--chunks", type=int, default=1, metavar="K",
        help="process each frame as K contiguous row chunks on this one "
             "chip (parallel/chunked.py: the point-sharded per-shard "
             "program over a vmapped chunk axis). Measured 2-5x SLOWER "
             "than the plain frame at every K (ROOFLINE.md 'Single-chip "
             "CHUNKING') — kept for parity measurement, not production. "
             "Default 1: the plain frame program.",
    )
    ap.add_argument(
        "--streams", type=int, default=1, metavar="S",
        help="measure S independent adaptive streams multiplexed on this "
             "one chip (the serve/multi_stream.py serving mode) and report "
             "AGGREGATE scans/s. Each stream gets a deterministically "
             "perturbed copy of the 6-scan cycle (distinct inputs/states, "
             "so the relay result cache cannot elide work). Default 1: the "
             "single-stream driver benchmark.",
    )
    ap.add_argument(
        "--dispatch", default="epoch", choices=["epoch", "frame"],
        help="epoch: each dispatch scans 6*repeat state-chained frames of "
             "one stream (streams interleave between dispatches — the "
             "recommended serving mode); frame: one dispatch per frame, "
             "round-robin across streams (the latency-critical mode; pays "
             "the relay's per-dispatch overhead on this tunneled pod)",
    )
    ap.add_argument(
        "--repeat", type=int, default=4,
        help="tile the 6-scan cycle this many times per scan-epoch (one "
             "dispatch covers 6*repeat state-chained frames; amortizes the "
             "tunneled relay's ~0.3 ms dispatch overhead that would not "
             "exist on directly attached hardware). Timed epochs scale "
             "down to keep ~600 measured frames.",
    )
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from patchworkpp_tpu import Params, init_state
    from patchworkpp_tpu.pipeline import make_sequence_fn

    from patchworkpp_tpu.io import read_bin

    capacity = args.capacity or CAPACITY * args.densify
    stack = np.zeros((6, capacity, 4), np.float32)
    npts = np.zeros((6,), np.int32)
    for i in range(6):
        pts = read_bin(f"{DATA_DIR}/{i:06d}.bin")
        if args.densify > 1:
            # Deterministic densification: extra beams a few cm off the
            # originals (keeps the CZM occupancy profile of a denser sensor).
            copies = [pts]
            for k in range(1, args.densify):
                q = pts.copy()
                q[:, 2] += 0.03 * k
                q[:, 0] += 0.02 * k
                copies.append(q)
            pts = np.concatenate(copies)
        if len(pts) > capacity:
            raise SystemExit(f"capacity {capacity} < {len(pts)} points")
        stack[i, : len(pts)] = pts
        npts[i] = len(pts)
    if args.streams < 1:
        raise SystemExit(f"--streams must be >= 1, got {args.streams}")
    if args.chunks < 1:
        raise SystemExit(f"--chunks must be >= 1, got {args.chunks}")
    if args.chunks > 1 and (args.streams > 1 or args.dispatch == "frame"):
        raise SystemExit("--chunks supports the single-stream epoch driver only")
    if args.chunks > 1 and capacity % args.chunks:
        raise SystemExit(
            f"capacity {capacity} not divisible by --chunks {args.chunks}"
        )
    if args.streams > 1 or args.dispatch == "frame":
        if args.profile:
            print(
                "note: --profile is only supported by the single-stream "
                "epoch driver; ignoring it for this mode",
                file=sys.stderr,
            )
        _run_streams(args, stack, npts)
        return

    if args.repeat > 1:
        stack = np.tile(stack, (args.repeat, 1, 1))
        npts = np.tile(npts, args.repeat)
    stack = jnp.asarray(stack)
    npts = jnp.asarray(npts)
    frames_per_epoch = 6 * args.repeat
    epochs = max(1, args.epochs // args.repeat)

    params = Params()
    fused = {"auto": None, "unfused": False}.get(args.fused, args.fused)
    if args.chunks > 1:
        from patchworkpp_tpu.parallel.chunked import make_chunked_sequence_fn

        seq = make_chunked_sequence_fn(
            params, args.chunks,
            fused="tiled" if fused is None else fused,
        )
    else:
        seq = make_sequence_fn(params, fused=fused)

    # Every dispatch gets a distinct sub-um sensor-height nudge (one scalar
    # op): on the cyclic 6-scan workload the adaptive state can reach an
    # exact float32 fixed point, after which epoch dispatches would repeat
    # bitwise-identical (state, input) pairs — which the tunnel relay's
    # result cache may elide (first observed as the chain-proof assertion
    # refusing a --repeat 12 run). Nudging the state (NOT the point stack:
    # an elementwise op on the (B, P, 4) layout runs at 4/128 lane
    # utilization and cost a measured ~45 us/frame) keeps every dispatch
    # unique at any run length; sensor_height is recomputed from data on
    # every frame with ring-0 samples, so the nudge only perturbs the first
    # frame's RNR gate, by at most ~0.1 mm.
    def ep(st, stack, npts, eps):
        return seq(_nudge(st, eps), stack, npts)

    ep = jax.jit(ep)

    def _eps(i: int):
        return jnp.float32(1e-6 * (i + 1))

    # Warmup: compile + two full epochs; scalar fetch forces completion.
    st = init_state(params)
    for i in range(2):
        st, _ = ep(st, stack, npts, _eps(i))
    sh_warm = float(st.sensor_height)
    buf_warm = np.asarray(st.elev_buf[0])  # 4 KB D2H, outside the timed loop

    # Timed groups: each group is a run of async epoch dispatches closed by
    # ONE scalar fetch (the only reliable sync on this relay). The fetch's
    # ~6 ms round trip is inside each group's wall — < 1.5% at the default
    # ~600-frame group size, and it biases the number DOWN (conservative).
    # Never run more groups than epochs: each group must time >= 1 epoch,
    # and inflating epochs past the requested count would silently exceed
    # the user's --epochs (the reported frames_total would contradict it).
    groups = min(max(1, args.groups), epochs)
    # Distribute epochs across groups WITHOUT dropping the remainder (the
    # first `epochs % groups` groups run one extra epoch).
    base, rem = divmod(epochs, groups)
    group_sizes = [base + (1 if g < rem else 0) for g in range(groups)]
    group_rates = []
    frames = 0
    ei = 0
    t_all0 = time.perf_counter()
    for g in range(groups):
        t0 = time.perf_counter()
        gframes = 0
        for _ in range(group_sizes[g]):
            st, _ = ep(st, stack, npts, _eps(2 + ei))
            ei += 1
            gframes += frames_per_epoch
        float(st.sensor_height)  # scalar D2H: the group's sync point
        group_rates.append(gframes / (time.perf_counter() - t0))
        frames += gframes
    dt = time.perf_counter() - t_all0
    # Elision is excluded BY CONSTRUCTION (every dispatch has a distinct
    # nudged state input, so the relay result cache can never hit); the
    # ring-0 buffer comparison is a secondary indicator only. On long runs
    # the adaptive chain can legitimately return to an exact cyclic fixed
    # point (content periodic with the 6-scan cycle), so equality is a
    # note, not a failure.
    if np.array_equal(np.asarray(st.elev_buf[0]), buf_warm):
        print(
            "note: adaptive state is at its cyclic fixed point (content "
            "periodic); dispatch inputs remained distinct via the nudge",
            file=sys.stderr,
        )
    del sh_warm  # the sync fetch above is its only job

    if args.profile:
        from patchworkpp_tpu.utils.roofline import (
            format_report, profile_frames,
        )

        def run():
            # One epoch from the final timed state; the scalar fetch blocks.
            s2, _ = ep(st, stack, npts, _eps(2 + ei))
            float(s2.sensor_height)

        stages, ops = profile_frames(run)
        print(
            format_report(
                stages, frames_per_epoch, header="per-stage device time:"
            ),
            file=sys.stderr,
        )
        for name, sec, cnt in ops[:10]:
            print(
                f"  {1e6 * sec / frames_per_epoch:9.1f} us/frame  {name[:70]}",
                file=sys.stderr,
            )

    scans_per_s = statistics.median(group_rates)
    dense = f"_x{args.densify}" if args.densify > 1 else ""
    path = f"_{args.fused}" if args.fused != "auto" else ""
    chunks = f"_c{args.chunks}" if args.chunks > 1 else ""
    print(
        json.dumps(
            {
                "metric": f"kitti6{dense}{path}{chunks}_seq_scans_per_s_per_chip",
                # MEDIAN over the independently timed groups — the
                # driver-reproducible number README/ROOFLINE quote.
                "value": round(scans_per_s, 2),
                "unit": "scans/s",
                # The 29.8 scans/s C++ baseline is the 1x workload; a
                # densified run is a different workload, so no ratio.
                "vs_baseline": (
                    round(scans_per_s / BASELINE_SCANS_PER_S, 2)
                    if args.densify == 1 else None
                ),
                # Dispersion across groups: relay-load noise made visible.
                "min": round(min(group_rates), 2),
                "max": round(max(group_rates), 2),
                "groups": len(group_rates),
                "frames_total": frames,
                "mean": round(frames / dt, 2),
                # Measurement protocol: frames chained per device dispatch
                # (round-1 captures used 6; runs are comparable only at the
                # same value — the delta is tunnel-relay amortization, not
                # engine speed).
                "frames_per_dispatch": frames_per_epoch,
            }
        )
    )


def _run_streams(args, stack6, npts6) -> None:
    """Aggregate throughput of S multiplexed adaptive streams on one chip.

    Measures the two serving modes wired into ``serve/multi_stream.py`` /
    ``parallel/sharded.py`` (ROOFLINE.md "Multi-stream lowerings"): streams
    interleave whole ``make_sequence_fn`` epochs (``--dispatch epoch``) or
    single-frame dispatches round-robin (``--dispatch frame``). The frame is
    never vmapped — a batched lowering collapses throughput (measured 6.5x
    per-frame degradation at unit batch). Each stream's scans carry a
    distinct deterministic mm-scale offset so no two dispatches see
    identical (state, input) pairs: the tunnel relay's result cache cannot
    elide work, and every stream's adaptation chain is independently real
    (asserted on its ring-0 elevation buffer).
    """
    import jax
    import jax.numpy as jnp

    from patchworkpp_tpu import Params, init_state
    from patchworkpp_tpu.pipeline import make_frame_fn, make_sequence_fn

    s = args.streams
    params = Params()
    fused = {"auto": None, "unfused": False}.get(args.fused, args.fused)

    # Stream 0 is the pristine workload; stream k rides k mm higher (real
    # rows only — padding must stay zero).
    per_stream = []
    for k in range(s):
        q = stack6.copy()
        for i in range(len(npts6)):
            q[i, : npts6[i], 2] += 0.001 * k
        per_stream.append(q)

    states = [init_state(params) for _ in range(s)]

    # Per-cycle sensor-height nudge: at an adaptive fixed point a stream's
    # cycle would repeat bitwise-identical (state, input) dispatches, which
    # the relay result cache may elide (module-level _nudge has the why).
    cycle_no = [0]

    def _eps():
        return jnp.float32(1e-6 * cycle_no[0])

    if args.dispatch == "frame":
        frame0 = make_frame_fn(params, fused=fused)

        def frame(st, x, n, eps):
            return frame0(_nudge(st, eps), x, n)

        fn = jax.jit(frame, donate_argnums=(0,))
        dev = [
            [jnp.asarray(per_stream[k][i]) for i in range(6)]
            for k in range(s)
        ]
        # Pre-staged device scalars: no slice dispatch inside the timed loop.
        nd = [jnp.int32(int(v)) for v in npts6]

        def cycle():
            cycle_no[0] += 1
            eps = _eps()
            for i in range(6):
                for k in range(s):
                    states[k], _ = fn(states[k], dev[k][i], nd[i], eps)

        frames_per_cycle = 6 * s
        frames_per_dispatch = 1
        cycles = max(1, args.epochs // s)
    else:
        seq = make_sequence_fn(params, fused=fused)

        def epoch(st, stack, npts, eps):
            return seq(_nudge(st, eps), stack, npts)

        ep = jax.jit(epoch)
        rep = max(1, args.repeat)
        dev = [
            jnp.asarray(np.tile(per_stream[k], (rep, 1, 1))) for k in range(s)
        ]
        npts_r = jnp.asarray(np.tile(npts6, rep))

        def cycle():
            cycle_no[0] += 1
            eps = _eps()
            for k in range(s):
                states[k], _ = ep(states[k], dev[k], npts_r, eps)

        frames_per_cycle = 6 * rep * s
        frames_per_dispatch = 6 * rep
        cycles = max(1, args.epochs // (rep * s))

    for _ in range(2):  # warmup: compile + steady state
        cycle()
    for k in range(s):
        float(states[k].sensor_height)
    warm = [np.asarray(st.elev_buf[0]) for st in states]

    frames = 0
    t0 = time.perf_counter()
    for _ in range(cycles):
        cycle()
        frames += frames_per_cycle
    for k in range(s):
        float(states[k].sensor_height)  # scalar sync per stream
    dt = time.perf_counter() - t0
    for k in range(s):
        if np.array_equal(np.asarray(states[k].elev_buf[0]), warm[k]):
            print(
                f"note: stream {k} reached its cyclic fixed point; dispatch "
                "inputs remained distinct via the nudge",
                file=sys.stderr,
            )

    agg = frames / dt
    dense = f"_x{args.densify}" if args.densify > 1 else ""
    path = f"_{args.fused}" if args.fused != "auto" else ""
    print(
        json.dumps(
            {
                "metric": (
                    f"kitti6{dense}{path}_streams{s}_{args.dispatch}"
                    "_agg_scans_per_s_per_chip"
                ),
                "value": round(agg, 2),
                "unit": "scans/s",
                # The 29.8 scans/s C++ baseline is the 1x workload only.
                "vs_baseline": (
                    round(agg / BASELINE_SCANS_PER_S, 2)
                    if args.densify == 1 else None
                ),
                "streams": s,
                "frames_per_dispatch": frames_per_dispatch,
            }
        )
    )


if __name__ == "__main__":
    main()
