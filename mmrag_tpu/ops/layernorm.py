"""Fused residual-add + LayerNorm as a Pallas TPU kernel.

Op-profile on MiniLM (b=512, s=64) showed XLA's LayerNorm fusions costing
~1.05 ms each per step — ~7x over the HBM-bandwidth floor for a
(32768, 384) f32 tensor — adding up to >50% of encoder wall time. This
kernel computes ``LayerNorm(x + delta)`` in one VMEM pass per row tile:
read both streams once, f32 mean/var lane reductions in-register, write the
normalized result once. Numerics match the reference HF BERT/CLIP LN
exactly (f32 stats, eps inside rsqrt; ``/root/reference`` models via torch).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_TILE_ROWS = 1024


def use_fused_ln(rows: int) -> bool:
    """Whether encoders should route LayerNorms through the fused kernel.

    Independent of the attention override so the two kernels can be bisected
    separately: ``MMRAG_LN_IMPL=fused`` forces the kernel (interpret mode on
    CPU — how tests exercise it), ``MMRAG_LN_IMPL=xla`` forces plain jnp;
    default is the kernel on accelerators for batches worth a dispatch.
    """

    import os

    override = os.environ.get("MMRAG_LN_IMPL", "")
    if override == "fused":
        return True
    if override == "xla":
        return False
    return jax.default_backend() == "tpu" and rows >= 4096


def _add_ln_kernel(x_ref, d_ref, scale_ref, bias_ref, out_ref, *, eps: float):
    x = x_ref[:].astype(jnp.float32) + d_ref[:].astype(jnp.float32)
    mean = jnp.mean(x, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(x - mean), axis=-1, keepdims=True)
    y = (x - mean) * jax.lax.rsqrt(var + eps) * scale_ref[:] + bias_ref[:]
    out_ref[:] = y.astype(out_ref.dtype)


@functools.partial(jax.jit, static_argnames=("eps", "out_dtype", "interpret"))
def _fused_add_ln(x, delta, scale, bias, eps: float, out_dtype, interpret: bool):
    rows, h = x.shape
    tile = min(_TILE_ROWS, rows)
    grid = (rows // tile,)
    row_spec = pl.BlockSpec((tile, h), lambda i: (i, 0), memory_space=pltpu.VMEM)
    vec_spec = pl.BlockSpec((1, h), lambda i: (0, 0), memory_space=pltpu.VMEM)
    return pl.pallas_call(
        functools.partial(_add_ln_kernel, eps=eps),
        grid=grid,
        in_specs=[row_spec, row_spec, vec_spec, vec_spec],
        out_specs=row_spec,
        out_shape=jax.ShapeDtypeStruct((rows, h), out_dtype),
        cost_estimate=pl.CostEstimate(
            flops=10 * rows * h,
            bytes_accessed=(x.dtype.itemsize + delta.dtype.itemsize + 4) * rows * h,
            transcendentals=rows,
        ),
        interpret=interpret,
    )(x, delta, scale.reshape(1, h), bias.reshape(1, h))


def fused_add_layer_norm(
    x: jnp.ndarray,  # (rows, h)
    delta: jnp.ndarray,  # (rows, h) residual branch (or zeros)
    scale: jnp.ndarray,  # (h,)
    bias: jnp.ndarray,  # (h,)
    eps: float,
    out_dtype=jnp.float32,
) -> jnp.ndarray:
    """``LayerNorm(x + delta)`` with f32 statistics, one HBM round-trip.

    ``out_dtype`` lets the encoder keep a bf16 residual stream (halves the
    activation bandwidth the encoder is bound on) while statistics stay f32.
    Falls back to plain jnp on unaligned shapes; runs in interpret mode on
    CPU so tests exercise the kernel.
    """

    rows, h = x.shape
    tile = min(_TILE_ROWS, rows)
    if rows % tile or h % 128 or rows % 8:
        xf = x.astype(jnp.float32) + delta.astype(jnp.float32)
        mean = jnp.mean(xf, axis=-1, keepdims=True)
        var = jnp.mean(jnp.square(xf - mean), axis=-1, keepdims=True)
        y = (xf - mean) * jax.lax.rsqrt(var + eps) * scale + bias
        return y.astype(out_dtype)
    interpret = jax.default_backend() == "cpu"
    return _fused_add_ln(x, delta, scale, bias, eps, jnp.dtype(out_dtype), interpret)
