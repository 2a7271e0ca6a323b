"""Pallas kernels: patch<->point movement as block-local one-hot MXU matmuls.

Motivation (measured on TPU v5e): XLA CSEs the shared ``pid == iota`` one-hot
across the pipeline's many dot_generals and materializes it to HBM
(131072x512), making every patch lookup/reduce an HBM-bound ~0.2-0.35 ms op.
These kernels build each (B, S) one-hot tile in VMEM on the fly — it never
exists in HBM — so the ops run at MXU speed (~tens of us).

- lookup: out[i, :] = table[pid[i], :]      (B,S) @ (S,C) per block
- reduce: out[s, :] = sum_i feats[i, :] where pid[i]==s   (S,B) @ (B,C),
  accumulated across the sequential TPU grid in a VMEM scratch.

Both are exact: one lane matches per row, so the lookup is a pure selection
and the reduce is an ordinary f32 accumulation.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

BLOCK = 2048


def _lookup_kernel(pid_ref, table_ref, out_ref):
    pid = pid_ref[:]  # (B,) int32
    s = table_ref.shape[0]
    onehot = (
        pid[:, None] == jax.lax.broadcasted_iota(jnp.int32, (pid.shape[0], s), 1)
    ).astype(jnp.float32)
    out_ref[:] = jnp.dot(
        onehot, table_ref[:],
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )


@functools.partial(jax.jit, static_argnames=("block",))
def lookup_kernel_call(table: jnp.ndarray, pid: jnp.ndarray, block: int = BLOCK):
    """(S, C) table, (P,) int32 pid -> (P, C) f32; P divisible by block."""
    p = pid.shape[0]
    s, c = table.shape
    grid = p // block
    return pl.pallas_call(
        _lookup_kernel,
        grid=(grid,),
        in_specs=[
            pl.BlockSpec((block,), lambda i: (i,), memory_space=pltpu.VMEM),
            pl.BlockSpec((s, c), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((block, c), lambda i: (i, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((p, c), jnp.float32),
    )(pid, table)


def _reduce_kernel(pid_ref, feats_ref, out_ref, acc_ref):
    i = pl.program_id(0)
    pid = pid_ref[:]
    s = out_ref.shape[0]
    onehot = (
        pid[:, None] == jax.lax.broadcasted_iota(jnp.int32, (pid.shape[0], s), 1)
    ).astype(jnp.float32)
    partial = jax.lax.dot_general(
        onehot,
        feats_ref[:],
        dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )

    @pl.when(i == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    acc_ref[:] += partial

    @pl.when(i == pl.num_programs(0) - 1)
    def _():
        out_ref[:] = acc_ref[:]


@functools.partial(jax.jit, static_argnames=("width", "block"))
def reduce_kernel_call(
    feats: jnp.ndarray, pid: jnp.ndarray, width: int = 512, block: int = BLOCK
):
    """(P, C) feats, (P,) int32 pid -> (width, C) f32 segment sums."""
    p, c = feats.shape
    grid = p // block
    return pl.pallas_call(
        _reduce_kernel,
        grid=(grid,),
        in_specs=[
            pl.BlockSpec((block,), lambda i: (i,), memory_space=pltpu.VMEM),
            pl.BlockSpec((block, c), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((width, c), lambda i: (0, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((width, c), jnp.float32),
        scratch_shapes=[pltpu.VMEM((width, c), jnp.float32)],
    )(pid, feats)
