"""Pallas TPU kernels for the pipeline's hot data-movement ops."""

from patchworkpp_tpu.ops.pallas.onehot_kernels import (
    lookup_kernel_call,
    reduce_kernel_call,
)

__all__ = ["lookup_kernel_call", "reduce_kernel_call"]
