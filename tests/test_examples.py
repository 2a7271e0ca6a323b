"""Smoke tests for the demo/eval entry points (reference demo parity, C16).

The entry points live in :mod:`patchworkpp_tpu.cli` (installed as ``ppk-*``
console scripts); the files under ``examples/`` are thin shims over them.
"""

import os
import sys

import pytest

from conftest import REFERENCE_DATA as DATA

pytestmark = pytest.mark.skipif(
    not os.path.exists(os.path.join(DATA, "000000.bin")),
    reason="KITTI fixture scans absent (PPK_DATA_DIR)",
)


def test_demo_visualize_runs(capsys, monkeypatch):
    monkeypatch.setattr(sys, "argv", ["ppk-demo-visualize"])
    from patchworkpp_tpu.cli import demo_visualize

    demo_visualize.main()
    out = capsys.readouterr().out
    assert "ground: 72665" in out  # golden count, scan 000000


def test_demo_visualize_save_png(capsys, monkeypatch, tmp_path):
    # Headless "Demo Result" rendering (reference README's committed
    # pictures/ screenshot analog) — a real PNG must land at --save PATH.
    pytest.importorskip("matplotlib")
    png = str(tmp_path / "demo.png")
    monkeypatch.setattr(sys, "argv", ["ppk-demo-visualize", "--save", png])
    from patchworkpp_tpu.cli import demo_visualize

    demo_visualize.main()
    out = capsys.readouterr().out
    assert f"saved: {png}" in out
    with open(png, "rb") as f:
        assert f.read(8) == b"\x89PNG\r\n\x1a\n"


def test_demo_sequential_runs(capsys, monkeypatch, tmp_path):
    # Symlink two scans into a temp dir to keep runtime short.
    for name in ["000000.bin", "000001.bin"]:
        os.symlink(os.path.join(DATA, name), tmp_path / name)
    monkeypatch.setattr(sys, "argv", ["ppk-demo-sequential", str(tmp_path)])
    from patchworkpp_tpu.cli import demo_sequential

    demo_sequential.main()
    out = capsys.readouterr().out
    assert "72665 ground" in out
    assert "71848 ground" in out  # sequential-adapted golden count for scan 1


def test_demo_multi_stream_runs(capsys, monkeypatch, tmp_path):
    # Two scans x two streams; each stream keeps its own adaptive state.
    for name in ["000000.bin", "000001.bin"]:
        os.symlink(os.path.join(DATA, name), tmp_path / name)
    monkeypatch.setattr(
        sys, "argv", ["ppk-demo-multi-stream", str(tmp_path), "--streams", "2"]
    )
    from patchworkpp_tpu.cli import demo_multi_stream

    demo_multi_stream.main()
    out = capsys.readouterr().out
    # stream0 sees 000000 then 000001 — exactly the sequential-demo order, so
    # its counts must match the golden fresh + sequential-adapted numbers,
    # proving per-stream adaptive state survives interleaving with stream1
    # (which runs 000001 then 000000 through the same compiled engine).
    assert "72665 ground" in out
    assert "71848 ground" in out
    assert out.count("stream0") == 2 and out.count("stream1") == 2


def test_eval_harness_timing_only(capsys, monkeypatch, tmp_path):
    for name in ["000000.bin"]:
        os.symlink(os.path.join(DATA, name), tmp_path / name)
    monkeypatch.setattr(
        sys,
        "argv",
        ["ppk-eval", "--scan-dir", str(tmp_path), "--json"],
    )
    from patchworkpp_tpu.cli import eval_semantickitti

    eval_semantickitti.main()
    out = capsys.readouterr().out
    assert '"frames": 1' in out


def test_eval_harness_golden_mode(capsys, monkeypatch, tmp_path):
    """--golden scores against the C++ reference's own labels: exact parity
    must read back as precision = recall = f1 = 1.0 (full-res scan; the
    golden indices are full-resolution only)."""
    import json

    for name in ["000000.bin"]:
        os.symlink(os.path.join(DATA, name), tmp_path / name)
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    monkeypatch.setattr(
        sys,
        "argv",
        [
            "ppk-eval", "--scan-dir", str(tmp_path), "--json",
            "--golden", os.path.join(repo, "golden", "reference_ground_indices.npz"),
            "--golden-variant", "fresh",
        ],
    )
    from patchworkpp_tpu.cli import eval_semantickitti

    eval_semantickitti.main()
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out["precision"] == 1.0 and out["recall"] == 1.0 and out["f1"] == 1.0


def test_eval_harness_batched_dispatch(capsys, monkeypatch, tmp_path):
    for name in ["000000.bin", "000001.bin"]:
        os.symlink(os.path.join(DATA, name), tmp_path / name)
    monkeypatch.setattr(
        sys,
        "argv",
        ["ppk-eval", "--scan-dir", str(tmp_path), "--json", "--batch", "2"],
    )
    from patchworkpp_tpu.cli import eval_semantickitti

    eval_semantickitti.main()
    out = capsys.readouterr().out
    assert '"frames": 2' in out


def test_example_shims_import():
    """The examples/ files must stay importable shims over the cli package."""
    import importlib.util

    examples = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "examples"
    )
    for name in [
        "demo_visualize",
        "demo_sequential",
        "demo_multi_stream",
        "eval_semantickitti",
        "stream_bench",
    ]:
        spec = importlib.util.spec_from_file_location(
            f"example_{name}", os.path.join(examples, f"{name}.py")
        )
        mod = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(mod)
        assert callable(mod.main)
