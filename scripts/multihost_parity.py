#!/usr/bin/env python
"""Multi-process (DCN-path) exact-parity gate: jax.distributed over >= 2
OS processes, each owning a slice of the device mesh.

All other sharding gates in this repo (tests/test_sharded.py, the dryrun)
run a SINGLE process with 8 virtual CPU devices — they exercise the
collectives but not the multi-controller machinery (process-spanning mesh
construction, per-process data feeding via global jax.Arrays, cross-process
coordination). This script exercises exactly that, without a cluster:

  parent            spawns N workers of itself (subprocess, same host)
  worker i          JAX_PLATFORMS=cpu + xla_force_host_platform_device_count
                    = devices/N, then jax.distributed.initialize(
                    127.0.0.1:<port>, num_processes=N, process_id=i) ->
                    one global mesh spanning both processes.

Gated configurations (all zero-tolerance):
  point-sharded     the frame's points row-sharded over the global mesh
                    (per-shard engine: the tiled fit program; cross-shard
                    LPR merge + fixed-order moment reduction ride the
                    process boundary — the DCN analog of ICI collectives)
  sequential        the point-sharded chain with adapted state carried
                    across frames
  frame-parallel    one independent stream per device (B = global devices)

--quick (the CI/test mode) subsamples the scans and checks the
multi-process results against an in-run single-device run of the SAME
engine (multi-process == single-process, the invariant this script owns).
The default full mode runs the 12 full-resolution golden configurations
(6 fresh + 6 sequential) against golden/reference_ground_indices.npz —
the same bar as scripts/tpu_parity.py.

The reference has no counterpart (single-thread C++,
cpp/patchworkpp/src/patchworkpp.cpp:1-4); SURVEY.md §4c calls for
multi-host tests without a cluster, and BASELINE.json's north star demands
the N >= 2 host axis actually be exercised.

Usage:
  python scripts/multihost_parity.py              # 2 procs x 4 devs, full 12/12
  python scripts/multihost_parity.py --quick      # subsampled, CI-sized
  python scripts/multihost_parity.py --num-processes 4 --devices-per-process 2
"""

from __future__ import annotations

import argparse
import json
import os
import socket
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
DATA_DIR = os.environ.get("PPK_DATA_DIR", "/root/reference/data")
GOLDEN = os.path.join(REPO, "golden", "reference_ground_indices.npz")


def _parse(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--num-processes", type=int, default=2)
    ap.add_argument("--devices-per-process", type=int, default=4)
    ap.add_argument("--quick", action="store_true",
                    help="subsampled scans, engine-vs-single-device check "
                         "(CI mode; full mode gates 12/12 full-res golden)")
    ap.add_argument("--worker", action="store_true", help=argparse.SUPPRESS)
    ap.add_argument("--process-id", type=int, default=None,
                    help=argparse.SUPPRESS)
    ap.add_argument("--port", type=int, default=None, help=argparse.SUPPRESS)
    ap.add_argument("--expected", default=None, help=argparse.SUPPRESS)
    return ap.parse_args(argv)


# --------------------------------------------------------------------------
# parent: spawn N copies of this script as coordinated workers
# --------------------------------------------------------------------------

def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


# quick (CI) mode configuration — the ONE source of truth shared by the
# parent's expectation compute and the worker (sub-sampling stride, padded
# capacity, number of scans)
QUICK_SUB, QUICK_CAP, QUICK_NSCANS = 16, 8192, 2


def _quick_expected() -> dict:
    """Single-device expected label masks for the quick configs
    ({fresh,seq}_<scan> -> (QUICK_CAP,) bool). Runs on CPU: a sitecustomize
    may force JAX_PLATFORMS to the tunneled TPU, and env vars alone are
    overridden, so use the config update before any device query (same
    pattern as tests/conftest.py)."""
    import jax

    jax.config.update("jax_platforms", "cpu")
    import numpy as np

    sys.path.insert(0, REPO)
    from patchworkpp_tpu.models import PatchworkPP
    from patchworkpp_tpu.params import Params

    p = Params()
    out = {}
    m = PatchworkPP(p, capacity=QUICK_CAP)
    for i in range(QUICK_NSCANS):
        n = f"{i:06d}"
        scan = np.fromfile(
            os.path.join(DATA_DIR, f"{n}.bin"), np.float32
        ).reshape(-1, 4)[::QUICK_SUB].copy()
        fresh = np.zeros(QUICK_CAP, bool)
        fresh[: len(scan)] = np.asarray(
            PatchworkPP(p, capacity=QUICK_CAP).estimate_ground(scan).ground_mask
        )
        seq = np.zeros(QUICK_CAP, bool)
        seq[: len(scan)] = np.asarray(m.estimate_ground(scan).ground_mask)
        out[f"fresh_{n}"], out[f"seq_{n}"] = fresh, seq
    return out


def _compute_quick_expectations() -> str:
    """Compute the quick expectations ONCE in the parent and hand every
    worker an .npz path (each worker used to recompute the full compile +
    engine runs itself — pure duplicated CI wall-clock)."""
    import tempfile

    import numpy as np

    f = tempfile.NamedTemporaryFile(suffix=".npz", delete=False)
    np.savez(f, **_quick_expected())
    f.close()
    return f.name


def parent(args) -> int:
    import tempfile

    # Expectations FIRST (tens of seconds of compile), the coordinator port
    # LAST: _free_port() releases the socket, so every second between
    # picking it and the workers binding it widens the reuse race window.
    exp_path = _compute_quick_expectations() if args.quick else None
    port = _free_port()
    procs, outfiles = [], []
    rcs = []
    try:
        for i in range(args.num_processes):
            cmd = [
                sys.executable, os.path.abspath(__file__), "--worker",
                "--process-id", str(i), "--port", str(port),
                "--num-processes", str(args.num_processes),
                "--devices-per-process", str(args.devices_per_process),
            ] + (["--quick", "--expected", exp_path] if args.quick else [])
            # Worker 0 logs straight to the console; the others write to
            # temp FILES, not pipes — an unread pipe fills at ~64 KiB and
            # would block that worker mid-write (and therefore mid-
            # collective), deadlocking every other worker with it.
            f = None if i == 0 else tempfile.TemporaryFile(mode="w+")
            procs.append(subprocess.Popen(
                cmd, env=dict(os.environ),
                stdout=f,
                stderr=subprocess.STDOUT if f is not None else None,
                text=True,
            ))
            outfiles.append(f)
        for pr in procs:
            try:
                rcs.append(pr.wait(timeout=3600))
            except subprocess.TimeoutExpired:
                rcs.append(None)  # counts as failure below
    finally:
        # Never leave orphaned workers holding the coordinator port: kill
        # our own spawned PIDs (never by pattern) on timeout/exception.
        for pr in procs:
            if pr.poll() is None:
                pr.kill()
        for pr in procs:
            if pr.poll() is None:
                try:
                    pr.wait(timeout=30)
                except subprocess.TimeoutExpired:
                    pass
        for i, (pr, f) in enumerate(zip(procs, outfiles)):
            if f is not None:
                if pr.returncode != 0:
                    f.seek(0)
                    sys.stderr.write(
                        f"--- worker {i} output ---\n{f.read()}\n"
                    )
                f.close()
        if exp_path is not None:
            try:
                os.unlink(exp_path)
            except OSError:
                pass
    ok = len(rcs) == args.num_processes and all(rc == 0 for rc in rcs)
    print(json.dumps({
        "multihost_parity": "PASS" if ok else "FAIL",
        "num_processes": args.num_processes,
        "devices_per_process": args.devices_per_process,
        "mode": "quick" if args.quick else "full-golden",
        "worker_rcs": rcs,
    }))
    return 0 if ok else 1


# --------------------------------------------------------------------------
# worker: one jax.distributed process
# --------------------------------------------------------------------------

def worker(args) -> int:
    # Force the virtual CPU devices BEFORE any backend/device query (a
    # sitecustomize may have imported jax already; the config update wins
    # while no devices have been queried — same pattern as tests/conftest).
    # REPLACE any inherited device-count flag (e.g. the test conftest's 8):
    # each worker must own exactly devices_per_process local devices.
    import re

    flags = re.sub(
        r"--xla_force_host_platform_device_count=\d+", "",
        os.environ.get("XLA_FLAGS", ""),
    )
    os.environ["XLA_FLAGS"] = (
        flags
        + f" --xla_force_host_platform_device_count={args.devices_per_process}"
    ).strip()
    os.environ["JAX_PLATFORMS"] = "cpu"

    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.distributed.initialize(
        coordinator_address=f"127.0.0.1:{args.port}",
        num_processes=args.num_processes,
        process_id=args.process_id,
    )

    import numpy as np
    import jax.numpy as jnp
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    sys.path.insert(0, REPO)
    from patchworkpp_tpu.params import Params
    from patchworkpp_tpu.state import init_state
    from patchworkpp_tpu.parallel.sharded import (
        batch_init_state,
        make_batch_frame_fn,
        make_point_sharded_frame_fn,
    )

    pid = args.process_id
    ndev = args.num_processes * args.devices_per_process
    devs = jax.devices()
    assert len(devs) == ndev, (len(devs), ndev)
    assert len(jax.local_devices()) == args.devices_per_process
    mesh = Mesh(np.asarray(devs), ("point",))

    def log(msg):
        if pid == 0:
            print(msg, flush=True)

    log(f"[multihost] {args.num_processes} processes x "
        f"{args.devices_per_process} devices = {ndev}-device global mesh "
        f"({'quick' if args.quick else 'full golden'})")

    sub = QUICK_SUB if args.quick else 1
    cap = QUICK_CAP if args.quick else 131072
    names = [f"{i:06d}" for i in range(QUICK_NSCANS if args.quick else 6)]
    scans = {
        n: np.fromfile(
            os.path.join(DATA_DIR, f"{n}.bin"), np.float32
        ).reshape(-1, 4)[::sub].copy()
        for n in names
    }

    p = Params()
    shard = NamedSharding(mesh, P("point"))
    repl = NamedSharding(mesh, P())

    def to_global(x, sharding):
        x = np.asarray(x)
        return jax.make_array_from_callback(
            x.shape, sharding, lambda idx: x[idx]
        )

    def pad(c):
        out = np.zeros((cap, 4), np.float32)
        out[: len(c)] = c
        return out

    def g_state(st, sharding=repl):
        return jax.tree.map(lambda x: to_global(x, sharding), st)

    failures = 0

    def check(tag, got_mask_global, want_rows):
        """Compare this process's addressable rows of the global mask."""
        nonlocal failures
        mism = 0
        for sh in got_mask_global.addressable_shards:
            got = np.asarray(sh.data)
            want = want_rows[sh.index]
            mism += int((got != want).sum())
        status = "PASS" if mism == 0 else f"FAIL ({mism} mismatches)"
        print(f"[worker {pid}] {tag}: {status}", flush=True)
        failures += mism != 0

    # ---- expected labels ----
    if args.quick and args.expected:
        # single-device run of the SAME engine = the oracle for
        # multi-process execution (multi-process == single-process),
        # computed ONCE by the parent and shipped as an .npz path.
        exp = np.load(args.expected)
        exp_fresh = {n: exp[f"fresh_{n}"] for n in names}
        exp_seq = {n: exp[f"seq_{n}"] for n in names}
    elif args.quick:
        # standalone-worker fallback (debugging): compute via the same
        # shared helper the parent uses.
        exp = _quick_expected()
        exp_fresh = {n: exp[f"fresh_{n}"] for n in names}
        exp_seq = {n: exp[f"seq_{n}"] for n in names}
    else:
        gold = np.load(GOLDEN)
        exp_fresh, exp_seq = {}, {}
        for n in names:
            for tagd, d in (("fresh", exp_fresh), ("seq", exp_seq)):
                mask = np.zeros(cap, bool)
                mask[gold[f"{tagd}_{n}"]] = True
                d[n] = mask

    # ---- 1) point-sharded, fresh state per scan ----
    fn = make_point_sharded_frame_fn(p, mesh, axis="point")
    for n in names:
        _, res = fn(
            g_state(init_state(p)),
            to_global(pad(scans[n]), shard),
            to_global(np.int32(len(scans[n])), repl),
        )
        check(f"point-sharded fresh {n}", res.ground_mask, exp_fresh[n])

    # ---- 2) point-sharded sequential chain (adapted state across frames) --
    st = g_state(init_state(p))
    for n in names:
        st, res = fn(
            st,
            to_global(pad(scans[n]), shard),
            to_global(np.int32(len(scans[n])), repl),
        )
        check(f"point-sharded seq   {n}", res.ground_mask, exp_seq[n])

    # ---- 2b) shard x chunk composition over the process-spanning mesh ----
    # Each shard's rows further split over a vmapped chunk axis
    # (parallel/chunked.py make_sharded_chunked_frame_fn): chunking x
    # jax.distributed cross-checked — the composed MeshComm(("point",
    # "chunk")) collectives ride the process boundary.
    from patchworkpp_tpu.parallel import make_sharded_chunked_frame_fn

    cfn = make_sharded_chunked_frame_fn(p, mesh, 2, axis="point")
    for n in names[: 1 if args.quick else len(names)]:
        _, res = cfn(
            g_state(init_state(p)),
            to_global(pad(scans[n]), shard),
            to_global(np.int32(len(scans[n])), repl),
        )
        check(f"shard-x-chunk fresh {n}", res.ground_mask, exp_fresh[n])

    # ---- 3) frame-parallel: one stream per device across both processes --
    fmesh = Mesh(np.asarray(devs), ("frame",))
    bfn = make_batch_frame_fn(p, fmesh, axis="frame")
    fshard = NamedSharding(fmesh, P("frame"))
    bnames = [names[i % len(names)] for i in range(ndev)]
    stack = np.stack([pad(scans[n]) for n in bnames])
    nrow = np.asarray([len(scans[n]) for n in bnames], np.int32)
    sts = jax.tree.map(
        lambda x: to_global(x, fshard), batch_init_state(p, ndev)
    )
    _, bres = bfn(sts, to_global(stack, fshard), to_global(nrow, fshard))
    want = np.stack([exp_fresh[n] for n in bnames])
    check("frame-parallel batch", bres.ground_mask, want)

    jax.distributed.shutdown()
    return 1 if failures else 0


def main() -> int:
    args = _parse()
    if args.worker:
        return worker(args)
    return parent(args)


if __name__ == "__main__":
    sys.exit(main())
