"""Smoke tests for the demo/eval entry points (reference demo parity, C16)."""

import os
import sys

import pytest

EXAMPLES = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "examples"
)
sys.path.insert(0, EXAMPLES)


def test_demo_visualize_runs(capsys, monkeypatch):
    monkeypatch.setattr(sys, "argv", ["demo_visualize.py"])
    import demo_visualize

    demo_visualize.main()
    out = capsys.readouterr().out
    assert "ground: 72665" in out  # golden count, scan 000000


def test_demo_sequential_runs(capsys, monkeypatch, tmp_path):
    # Symlink two scans into a temp dir to keep runtime short.
    for name in ["000000.bin", "000001.bin"]:
        os.symlink(f"/root/reference/data/{name}", tmp_path / name)
    monkeypatch.setattr(sys, "argv", ["demo_sequential.py", str(tmp_path)])
    import demo_sequential

    demo_sequential.main()
    out = capsys.readouterr().out
    assert "72665 ground" in out
    assert "71848 ground" in out  # sequential-adapted golden count for scan 1


def test_eval_harness_timing_only(capsys, monkeypatch, tmp_path):
    for name in ["000000.bin"]:
        os.symlink(f"/root/reference/data/{name}", tmp_path / name)
    monkeypatch.setattr(
        sys,
        "argv",
        ["eval_semantickitti.py", "--scan-dir", str(tmp_path), "--json"],
    )
    import eval_semantickitti

    eval_semantickitti.main()
    out = capsys.readouterr().out
    assert '"frames": 1' in out
