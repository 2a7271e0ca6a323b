"""Functional cross-frame adaptive state.

The reference keeps its adaptation state as mutated members — adapted
``elevation_thr``/``flatness_thr``/``sensor_height`` plus four per-ring FIFO
buffers of elevation/flatness samples capped at 1000 entries (reference:
cpp/patchworkpp/include/patchwork/patchworkpp.h:174-175, update logic
src/patchworkpp.cpp:338-375). Here that state is an explicit pytree threaded
through the jitted frame step: trivially checkpointable, vmap-able across
independent streams, and replicable across a device mesh.

Buffer layout: left-aligned dense arrays of static capacity ``BUF_CAP`` with a
per-ring count; entry 0 is the oldest (FIFO drops from the front exactly like
the reference's ``erase(begin, begin+exceed)``).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict

import jax
import jax.numpy as jnp
import numpy as np

from patchworkpp_tpu.params import Params

# Max new samples appended per ring per frame is the ring's sector count
# (<=32 with default geometry); buffers are trimmed to max_storage (1000)
# at the end of every frame, so 1000 + 64 never overflows.
BUF_CAP = 1064
NUM_ADAPT_RINGS = 4


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass
class AdaptiveState:
    """A-GLE / TGR adaptation state carried across frames."""

    sensor_height: jnp.ndarray  # () f32
    elevation_thr: jnp.ndarray  # (4,) f32
    flatness_thr: jnp.ndarray   # (4,) f32
    elev_buf: jnp.ndarray       # (4, BUF_CAP) f32, left-aligned, oldest first
    elev_cnt: jnp.ndarray       # (4,) i32
    flat_buf: jnp.ndarray       # (4, BUF_CAP) f32
    flat_cnt: jnp.ndarray       # (4,) i32

    def tree_flatten(self):
        children = (
            self.sensor_height,
            self.elevation_thr,
            self.flatness_thr,
            self.elev_buf,
            self.elev_cnt,
            self.flat_buf,
            self.flat_cnt,
        )
        return children, None

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children)

    # ------------------------------------------------------------ serialization

    def to_numpy(self) -> Dict[str, Any]:
        """Checkpoint view: a flat dict of NumPy arrays (np.savez/orbax-ready)."""
        return {
            "sensor_height": np.asarray(self.sensor_height),
            "elevation_thr": np.asarray(self.elevation_thr),
            "flatness_thr": np.asarray(self.flatness_thr),
            "elev_buf": np.asarray(self.elev_buf),
            "elev_cnt": np.asarray(self.elev_cnt),
            "flat_buf": np.asarray(self.flat_buf),
            "flat_cnt": np.asarray(self.flat_cnt),
        }

    @classmethod
    def from_numpy(cls, d: Dict[str, Any]) -> "AdaptiveState":
        # Re-zero buffer tails past each ring's count: the pipeline's batched
        # FIFO append (pipeline._write_at) ADDS new samples at the write
        # offset, relying on the zeros-beyond-count invariant that save()
        # always provides but a hand-edited checkpoint might not.
        def _clean(buf, cnt):
            buf = np.asarray(buf, np.float32).copy()
            cnt = np.asarray(cnt, np.int32)
            mask = np.arange(buf.shape[1])[None, :] < cnt[:, None]
            return np.where(mask, buf, 0.0)

        return cls(
            sensor_height=jnp.asarray(d["sensor_height"], jnp.float32),
            elevation_thr=jnp.asarray(d["elevation_thr"], jnp.float32),
            flatness_thr=jnp.asarray(d["flatness_thr"], jnp.float32),
            elev_buf=jnp.asarray(_clean(d["elev_buf"], d["elev_cnt"])),
            elev_cnt=jnp.asarray(d["elev_cnt"], jnp.int32),
            flat_buf=jnp.asarray(_clean(d["flat_buf"], d["flat_cnt"])),
            flat_cnt=jnp.asarray(d["flat_cnt"], jnp.int32),
        )

    def save(self, path: str) -> None:
        np.savez(path, **self.to_numpy())

    @classmethod
    def load(cls, path: str) -> "AdaptiveState":
        with np.load(path) as d:
            return cls.from_numpy(dict(d))


def init_state(params: Params) -> AdaptiveState:
    """Fresh state with the configured initial thresholds / sensor height."""
    return AdaptiveState(
        sensor_height=jnp.asarray(params.sensor_height, jnp.float32),
        elevation_thr=jnp.asarray(params.elevation_thr, jnp.float32),
        flatness_thr=jnp.asarray(params.flatness_thr, jnp.float32),
        elev_buf=jnp.zeros((NUM_ADAPT_RINGS, BUF_CAP), jnp.float32),
        elev_cnt=jnp.zeros(NUM_ADAPT_RINGS, jnp.int32),
        flat_buf=jnp.zeros((NUM_ADAPT_RINGS, BUF_CAP), jnp.float32),
        flat_cnt=jnp.zeros(NUM_ADAPT_RINGS, jnp.int32),
    )
