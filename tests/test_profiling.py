"""Observability: per-stage breakdown + roofline aggregation (A1/A3).

The reference's analog is the verbose czm/sort/pca/gle clock() split
(reference patchworkpp.cpp:320-333) and getTimeTaken(); here the split comes
from jax.profiler traces grouped by the pipeline's stage_* named scopes.
"""

import numpy as np

from patchworkpp_tpu.models import PatchworkPP
from patchworkpp_tpu.utils.roofline import (
    format_report,
    op_table,
    stage_breakdown,
)


def test_stage_breakdown_synthetic():
    events = [
        {"ph": "M", "name": "process_name", "pid": 1,
         "args": {"name": "/device:TPU:0"}},
        # container events (the per-frame `while`, the module-level jit_*)
        # ENCLOSE the ops below on the same track: they must be excluded,
        # not double-counted into 'other'
        {"ph": "X", "pid": 1, "tid": 7, "ts": 0.0, "dur": 200.0,
         "name": "jit_frame(123)", "args": {}},
        {"ph": "X", "pid": 1, "tid": 7, "ts": 0.0, "dur": 180.0,
         "name": "while.9", "args": {}},
        {"ph": "X", "pid": 1, "tid": 7, "ts": 5.0, "dur": 100.0,
         "name": "fusion.1",
         "args": {"long_name": "jit(frame)/stage_sort/sort"}},
        {"ph": "X", "pid": 1, "tid": 7, "ts": 110.0, "dur": 50.0,
         "name": "fusion.2",
         "args": {"long_name": "jit(frame)/stage_rgpf/dot_general"}},
        {"ph": "X", "pid": 1, "tid": 7, "ts": 161.0, "dur": 25.0,
         "name": "copy.3", "args": {}},
    ]
    stages = stage_breakdown(events)
    assert abs(stages["stage_sort"] - 100e-6) < 1e-12
    assert abs(stages["stage_rgpf"] - 50e-6) < 1e-12
    assert abs(stages["other"] - 25e-6) < 1e-12  # containers excluded
    ops = op_table(events)
    assert ops[0][0] == "fusion.1"
    assert not any(n.startswith(("while", "jit_")) for n, _, _ in ops)
    rep = format_report(stages, frames=1)
    assert "stage_sort" in rep and "ms/frame" in rep


def test_profile_stages_runs(scans):
    """End-to-end trace capture must not crash. The CPU backend emits only
    host-python tracks (no XLA-op events), so the breakdown may be empty
    here; on TPU the same path yields the stage split (ROOFLINE.md is the
    hardware artifact produced from it)."""
    model = PatchworkPP(capacity=16384)
    stages, ops = model.profile_stages(scans["000000"][::16], frames=2)
    assert isinstance(stages, dict) and isinstance(ops, list)
    if stages:  # device-op track present (TPU/GPU)
        assert any(k.startswith("stage_") for k in stages)
