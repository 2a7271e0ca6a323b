"""patchworkpp_tpu — a TPU-native LiDAR ground-segmentation engine.

A from-scratch JAX/XLA/Pallas implementation with the full capability surface
of Patchwork++ (reference: url-kaist/patchwork-plusplus): RNR reflected-noise
removal, Concentric-Zone-Model binning, region-wise vertical/ground plane
fitting (R-VPF / R-GPF) via batched 3x3 eigendecomposition, A-GLE adaptive
ground-likelihood estimation with cross-frame threshold adaptation, and TGR
temporal ground revert — re-architected as fixed-shape batched tensor programs.

Public API:

- :class:`Params` / :class:`CZMGeometry` — configuration + static geometry.
- :func:`init_state` / :class:`AdaptiveState` — functional cross-frame state.
- :func:`segment` — jittable single-frame step ``(state, points) -> (state, result)``.
- :class:`models.PatchworkPP` — stateful convenience wrapper (flagship model).
- :mod:`compat.pypatchworkpp` — drop-in ``Parameters``/``patchworkpp`` facade
  matching the reference pybind11 module (python/patchworkpp/pybinding.cpp).
"""

from patchworkpp_tpu.params import Params, CZMGeometry
from patchworkpp_tpu.state import AdaptiveState, init_state

__version__ = "0.2.0"

__all__ = [
    "Params",
    "CZMGeometry",
    "AdaptiveState",
    "init_state",
    "__version__",
]
