"""Bit-faithful NumPy oracle of the reference Patchwork++ semantics.

Used only for testing: the JAX/Pallas engine is validated stage-by-stage
against this oracle, and the oracle itself is validated against golden
per-point index sets captured from the compiled C++ reference
(golden/reference_ground_indices.npz).
"""

from patchworkpp_tpu.oracle.numpy_oracle import NumpyPatchworkpp

__all__ = ["NumpyPatchworkpp"]
