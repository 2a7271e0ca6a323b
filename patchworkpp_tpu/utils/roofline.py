"""Device-side per-stage timing + roofline reporting from jax.profiler traces.

The reference instruments its frame with clock() segment timers printed under
``verbose`` (reference: cpp/patchworkpp/src/patchworkpp.cpp:179, :320-333 —
the czm/sort/pca/gle split). The TPU analog cannot use host timers (the frame
is one fused device program), so the split comes from the device trace: the
pipeline labels its stages with ``jax.named_scope`` (stage_rnr_czm,
stage_sort, stage_rvpf, stage_rgpf, stage_fused_fit, stage_gle_tail), and
this module aggregates the profiler's per-op durations by stage.

Also computes a per-op table (duration, bytes moved where derivable) for the
roofline artifact (ROOFLINE.md) that BASELINE.md §"Still to produce" asks for.
"""

from __future__ import annotations

import glob
import gzip
import json
import os
import re
import tempfile
from collections import defaultdict
from typing import Dict, List, Optional, Tuple

STAGE_RE = re.compile(r"(stage_[a-z_]+)")


def _load_trace_events(logdir: str) -> List[dict]:
    """Read all trace.json(.gz) files under a jax.profiler logdir."""
    paths = glob.glob(
        os.path.join(logdir, "**", "*.trace.json.gz"), recursive=True
    ) + glob.glob(os.path.join(logdir, "**", "trace.json.gz"), recursive=True)
    events: List[dict] = []
    for path in paths:
        with gzip.open(path, "rt") as f:
            data = json.load(f)
        events.extend(data.get("traceEvents", []))
    return events


def _device_pids(events: List[dict]) -> set:
    """Process ids of device (TPU/accelerator) tracks, XLA-op level only."""
    name_by_pid = {}
    for ev in events:
        if ev.get("ph") == "M" and ev.get("name") == "process_name":
            name_by_pid[ev["pid"]] = ev.get("args", {}).get("name", "")
    dev = {
        pid
        for pid, name in name_by_pid.items()
        if ("TPU" in name or "GPU" in name or "/device:" in name)
        and "Host" not in name
    }
    # CPU-only runs (tests): fall back to the XLA modules track if present.
    if not dev:
        dev = {
            pid
            for pid, name in name_by_pid.items()
            if "XLA Modules" in name or "XLA Ops" in name or "TensorFlow" in name
        }
    return dev


def _leaf_events(events: List[dict]) -> List[dict]:
    """Device complete-events (ph=X), minus enclosing containers.

    Chrome-trace nesting: on one (pid, tid) line, an event that contains
    another event's start is a container — the per-frame ``while`` loop,
    the module-level ``jit_*`` event — and counting it alongside its
    children double-counts every nested duration (the old report showed a
    bogus 'other' worth the whole program twice). Keep only events with no
    children (the actual executed ops)."""
    pids = _device_pids(events)
    # Module-level tracks duplicate their ops' total on a separate tid
    # (the "XLA Modules" line's jit_* event spans the whole executable),
    # so same-track nesting detection cannot see them — drop those tracks
    # by thread name.
    drop_tids = {
        (ev["pid"], ev.get("tid"))
        for ev in events
        if ev.get("ph") == "M" and ev.get("name") == "thread_name"
        and any(
            key in ev.get("args", {}).get("name", "")
            for key in ("Module", "Steps", "Framework")
        )
    }
    per_track: Dict[tuple, List[dict]] = defaultdict(list)
    leaves: List[dict] = []
    for ev in events:
        if ev.get("ph") != "X" or ev.get("pid") not in pids:
            continue
        if (ev["pid"], ev.get("tid")) in drop_tids:
            continue
        if ev.get("dur", 0) <= 0:
            continue
        if "ts" not in ev:  # no nesting info -> treat as a leaf op
            leaves.append(ev)
            continue
        per_track[(ev["pid"], ev.get("tid"))].append(ev)
    for evs in per_track.values():
        evs.sort(key=lambda e: (e["ts"], -e["dur"]))
        stack: List[list] = []  # [end_ts, event, saw_child]
        for ev in evs:
            ts = ev["ts"]
            while stack and stack[-1][0] <= ts:
                fin = stack.pop()
                if not fin[2]:
                    leaves.append(fin[1])
            if stack:
                stack[-1][2] = True
            stack.append([ts + ev["dur"], ev, False])
        for fin in stack:
            if not fin[2]:
                leaves.append(fin[1])
    return leaves


def stage_breakdown(events: List[dict]) -> Dict[str, float]:
    """Aggregate leaf device events into stage -> total seconds.

    An op belongs to a stage when its name or HLO metadata mentions a
    ``stage_*`` named scope; everything else lands in ``other``.
    """
    totals: Dict[str, float] = defaultdict(float)
    for ev in _leaf_events(events):
        dur = ev.get("dur", 0) * 1e-6  # trace durations are microseconds
        hay = ev.get("name", "") + " " + str(ev.get("args", {}))
        m = STAGE_RE.search(hay)
        totals[m.group(1) if m else "other"] += dur
    return dict(totals)


def op_table(events: List[dict], top: int = 20) -> List[Tuple[str, float, int]]:
    """Top leaf device ops by total time: (name, seconds, count)."""
    agg: Dict[str, List[float]] = defaultdict(lambda: [0.0, 0])
    for ev in _leaf_events(events):
        a = agg[ev.get("name", "?")]
        a[0] += ev.get("dur", 0) * 1e-6
        a[1] += 1
    rows = sorted(agg.items(), key=lambda kv: -kv[1][0])[:top]
    return [(name, v[0], int(v[1])) for name, v in rows]


def profile_frames(
    run_frames,
    logdir: Optional[str] = None,
) -> Tuple[Dict[str, float], List[Tuple[str, float, int]]]:
    """Trace ``run_frames()`` (which must BLOCK on its own results) and return
    (stage -> seconds, top-op table) aggregated over the traced region."""
    from patchworkpp_tpu.utils.profiling import profile_trace

    if logdir is None:
        logdir = tempfile.mkdtemp(prefix="ppk_trace_")
    with profile_trace(logdir):
        run_frames()
    events = _load_trace_events(logdir)
    return stage_breakdown(events), op_table(events)


def format_report(
    stages: Dict[str, float], frames: int, header: str = ""
) -> str:
    """Human-readable per-frame stage split (the verbose analog)."""
    total = sum(stages.values())
    lines = [header] if header else []
    order = sorted(stages.items(), key=lambda kv: -kv[1])
    for name, sec in order:
        ms = sec / max(frames, 1) * 1e3
        pct = 100.0 * sec / total if total else 0.0
        lines.append(f"  {name:<18} {ms:8.3f} ms/frame  ({pct:4.1f}%)")
    lines.append(
        f"  {'device total':<18} {total / max(frames, 1) * 1e3:8.3f} ms/frame"
    )
    return "\n".join(lines)
