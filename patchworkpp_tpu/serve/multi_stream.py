"""Multi-stream multiplexing on one device: host round-robin, one compile.

Measured on the v5e (ROOFLINE.md "Multi-stream lowerings"): batched
lowerings collapse throughput (a vmapped frame runs 6.5x slower per frame
even at batch 1; a lax.map stream loop pays ~5 ms/iteration), while
sequentially dispatching the plain single-frame program keeps the chip at
full per-frame speed. So N streams on ONE device are served by interleaving
their frames through a single jitted frame fn — one Mosaic compile, one
device copy of the program, N small per-stream adaptive states resident on
device. (To scale streams across DEVICES, use
``parallel.make_batch_frame_fn`` — one stream per device.)

The reference ROS node handles exactly one topic per process
(ros/src/GroundSegmentationServer.cpp); multi-stream is a capability add.
"""

from __future__ import annotations

from typing import Dict, Hashable, Optional

import numpy as np

from patchworkpp_tpu.params import Params
from patchworkpp_tpu.models import PatchworkPP, SegmentationResult
from patchworkpp_tpu.state import init_state


class MultiStreamSegmenter:
    """N independent adaptive streams through one shared engine.

    Each stream id owns its own :class:`AdaptiveState` (thresholds, FIFO
    buffers, self-calibrated sensor height), exactly as N reference engine
    instances would — but all streams share one compiled frame program.
    """

    def __init__(
        self,
        params: Optional[Params] = None,
        capacity: int = 131072,
        chunks: int = 1,
    ) -> None:
        """``chunks`` > 1 serves dense streams through the chunked engine
        (parallel/chunked.py; capacity must be a ``chunks`` multiple)."""
        self._model = PatchworkPP(params, capacity=capacity, chunks=chunks)
        self._states: Dict[Hashable, object] = {}

    @property
    def streams(self):
        return list(self._states)

    def segment(self, stream_id: Hashable, cloud: np.ndarray) -> SegmentationResult:
        """Segment one scan of ``stream_id``, advancing only its state."""
        m = self._model
        m.state = self._states.get(stream_id) or init_state(m.params)
        try:
            return m.estimate_ground(cloud)
        finally:
            self._states[stream_id] = m.state

    def sensor_height(self, stream_id: Hashable) -> float:
        st = self._states[stream_id]
        return float(st.sensor_height)

    def reset(self, stream_id: Hashable) -> None:
        self._states.pop(stream_id, None)

    # ------------------------------------------------------------ persistence

    def save_states(self, path: str) -> None:
        """Checkpoint every stream's adaptive state into one npz (keys are
        ``<field>:<stream_id>``); a restarted multiplexer resumes all
        chains exactly. Stream ids must be str()-able round-trippably."""
        out = {}
        for sid, st in self._states.items():
            for k, v in st.to_numpy().items():
                out[f"{k}:{sid}"] = v
        np.savez(path, **out)

    def load_states(self, path: str) -> None:
        """Restore a :meth:`save_states` checkpoint (string stream ids)."""
        from patchworkpp_tpu.state import AdaptiveState

        with np.load(path) as data:
            per_stream: Dict[str, Dict[str, np.ndarray]] = {}
            for key, v in data.items():
                k, sid = key.split(":", 1)
                per_stream.setdefault(sid, {})[k] = v
        for sid, d in per_stream.items():
            self._states[sid] = AdaptiveState.from_numpy(d)
