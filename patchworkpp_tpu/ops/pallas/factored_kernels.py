"""Factored one-hot Pallas kernels: patch<->point movement at MXU speed.

A direct (P, 512) one-hot matmul pays 512 x 128 MACs per point (the channel
dimension pads to the 128-lane MXU tile) — ~10x more FLOPs than the data
needs. Factoring the patch id as ``pid = hi * 8 + lo`` splits the movement
into a (P, 64) one-hot matmul against an (64, 8C) re-tiled table plus an
8-way VPU select, cutting MXU work ~4-8x:

  lookup:  A = onehot_hi @ table.reshape(64, 8C);  out = A[., lo-slot]
  reduce:  ex = feats x onehot_lo -> (B, 8C);  acc += onehot_hi^T @ ex

Everything lives in VMEM per block; the one-hot factors are built on the fly
and never touch HBM. The lo-dimension is handled with 8 static column slices
(Mosaic has no in-kernel 3-D reshape). Selection is exact (one lane matches),
sums accumulate in f32; dots run at HIGHEST precision so f32 table values
survive bit-exactly (golden parity holds through these kernels).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

HI = 64
LO = 8
BLOCK = 2048

_PREC = jax.lax.Precision.HIGHEST


def _split3(x):
    """f32 -> three bf16 terms whose sum recovers x to ~2^-24 relative.

    A one-hot operand is *exactly* bf16 (values 0/1), so one bf16 pass per
    term gives full f32-dot fidelity (matching Precision.HIGHEST) at half
    the passes HIGHEST would use on a pair of f32 operands.
    """
    hi = x.astype(jnp.bfloat16)
    r1 = x - hi.astype(jnp.float32)
    mid = r1.astype(jnp.bfloat16)
    r2 = r1 - mid.astype(jnp.float32)
    lo = r2.astype(jnp.bfloat16)
    return hi, mid, lo


def _factors(pid):
    hi = jax.lax.shift_right_logical(pid, 3)
    lo = jnp.bitwise_and(pid, 7)
    return hi, lo


def _onehot(idx, width):
    return (
        idx[:, None]
        == jax.lax.broadcasted_iota(jnp.int32, (idx.shape[0], width), 1)
    ).astype(jnp.float32)


def _flookup_kernel(pid_ref, table_ref, out_ref):
    pid = pid_ref[:]
    c = out_ref.shape[1]
    hi, lo = _factors(pid)
    oh = _onehot(hi, HI).astype(jnp.bfloat16)
    t0, t1, t2 = _split3(table_ref[:])
    a = (
        jnp.dot(oh, t0, preferred_element_type=jnp.float32)
        + jnp.dot(oh, t1, preferred_element_type=jnp.float32)
        + jnp.dot(oh, t2, preferred_element_type=jnp.float32)
    )  # (B, LO*C): the LO candidate rows of each point's hi-group
    out = jnp.zeros((pid.shape[0], c), jnp.float32)
    for l in range(LO):
        sel = (lo == l).astype(jnp.float32)[:, None]
        out = out + a[:, l * c : (l + 1) * c] * sel
    out_ref[:] = out


@functools.partial(jax.jit, static_argnames=("block",))
def factored_lookup(table: jnp.ndarray, pid: jnp.ndarray, block: int = BLOCK):
    """result[i] = table[pid[i]]; table (512, C), pid (P,) -> (P, C) f32."""
    p = pid.shape[0]
    s, c = table.shape
    assert s == HI * LO, f"table must have {HI * LO} rows, got {s}"
    table2 = table.reshape(HI, LO * c)
    return pl.pallas_call(
        _flookup_kernel,
        grid=(p // block,),
        in_specs=[
            pl.BlockSpec((block,), lambda i: (i,), memory_space=pltpu.VMEM),
            pl.BlockSpec((HI, LO * c), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((block, c), lambda i: (i, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((p, c), jnp.float32),
    )(pid, table2)


def _freduce_kernel(pid_ref, feats_ref, out_ref, acc_ref):
    i = pl.program_id(0)
    pid = pid_ref[:]
    b, c = feats_ref.shape
    hi, lo = _factors(pid)
    feats = feats_ref[:]
    ex = jnp.concatenate(
        [feats * (lo == l).astype(jnp.float32)[:, None] for l in range(LO)],
        axis=1,
    )  # (B, LO*C)
    oh = _onehot(hi, HI).astype(jnp.bfloat16)
    e0, e1, e2 = _split3(ex)
    dn = (((0,), (0,)), ((), ()))
    partial = (
        jax.lax.dot_general(oh, e0, dn, preferred_element_type=jnp.float32)
        + jax.lax.dot_general(oh, e1, dn, preferred_element_type=jnp.float32)
        + jax.lax.dot_general(oh, e2, dn, preferred_element_type=jnp.float32)
    )  # (HI, LO*C)

    @pl.when(i == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    acc_ref[:] += partial

    @pl.when(i == pl.num_programs(0) - 1)
    def _():
        out_ref[:] = acc_ref[:]


@functools.partial(jax.jit, static_argnames=("block",))
def factored_reduce(feats: jnp.ndarray, pid: jnp.ndarray, block: int = BLOCK):
    """Segment sums: (P, C) feats by pid -> (512, C) f32."""
    p, c = feats.shape
    out2 = pl.pallas_call(
        _freduce_kernel,
        grid=(p // block,),
        in_specs=[
            pl.BlockSpec((block,), lambda i: (i,), memory_space=pltpu.VMEM),
            pl.BlockSpec((block, c), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (HI, LO * c), lambda i: (0, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((HI, LO * c), jnp.float32),
        scratch_shapes=[pltpu.VMEM((HI, LO * c), jnp.float32)],
    )(pid, feats)
    return out2.reshape(HI * LO, c)
