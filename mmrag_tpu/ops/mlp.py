"""Fused pre-LN MLP block (Pallas TPU): ``x + FC2(act(FC1(LN(x))))``.

Motivation (measured, CLIP ViT-B/32 h=768/inter=3072 on v5e): the composed
XLA form materializes the (rows, 3072) inner activation in HBM (write+read
~690 KB per image per layer) plus the LN round trip — ~20% of CLIP image
wall once attention runs in its own fused block. This kernel keeps LN, both
matmuls, the activation, and the residual add in VMEM per row tile: HBM
traffic per tile = read x + (resident) weights, write the updated stream.

(The BERT-family FFN measured perf-NEUTRAL under the same fusion at
h=384/inter=1536 in round 1 — XLA fuses the gelu into the matmul epilogue
and the inner tensor is 4x smaller — so this kernel is wired into the CLIP
towers only.)

Reference equivalent: torch MLP inside HF CLIP (`/root/reference/app/ml/
embeddings.py:73-105` library internals).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _mlp_kernel(x_ref, w1_ref, b1_ref, w2_ref, b2_ref, lns_ref, lnb_ref,
                out_ref, *, eps: float):
    x = x_ref[:]
    precision = (
        jax.lax.Precision.DEFAULT
        if x.dtype == jnp.bfloat16
        else jax.lax.Precision.HIGHEST
    )
    y = x.astype(jnp.float32)
    mean = jnp.mean(y, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(y - mean), axis=-1, keepdims=True)
    ln = ((y - mean) * jax.lax.rsqrt(var + eps) * lns_ref[:] + lnb_ref[:]).astype(x.dtype)
    inner = jax.lax.dot_general(
        ln, w1_ref[:],
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=precision,
    ) + b1_ref[:]
    # quick_gelu (HF CLIP): v * sigmoid(1.702 v), computed in f32
    inner = (inner * jax.nn.sigmoid(1.702 * inner)).astype(x.dtype)
    o = jax.lax.dot_general(
        inner, w2_ref[:],
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=precision,
    ) + b2_ref[:]
    out_ref[:] = (y + o).astype(out_ref.dtype)


def _rows_tile(hidden: int, inter: int, itemsize: int) -> int:
    # VMEM: weights ~ (hidden*inter*2)*itemsize resident (constant index_map)
    # + per-tile x/ln/inner/out. h=768/inter=3072 bf16: weights 9.4 MB; at
    # 256 rows the activations add ~5 MB — inside the 16 MB scoped budget
    # with margin. Halve for f32.
    tile = 256
    if itemsize > 2:
        tile //= 2
    return tile


@functools.partial(jax.jit, static_argnames=("eps", "interpret"))
def _fused_mlp(x, w1, b1, w2, b2, ln_scale, ln_bias, eps: float, interpret: bool):
    rows, h = x.shape
    inter = w1.shape[1]
    tile = min(_rows_tile(h, inter, x.dtype.itemsize), rows)
    grid = (rows // tile,)
    row_spec = pl.BlockSpec((tile, h), lambda i: (i, 0), memory_space=pltpu.VMEM)
    return pl.pallas_call(
        functools.partial(_mlp_kernel, eps=eps),
        grid=grid,
        in_specs=[
            row_spec,
            pl.BlockSpec((h, inter), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, inter), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((inter, h), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, h), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, h), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, h), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=row_spec,
        out_shape=jax.ShapeDtypeStruct((rows, h), x.dtype),
        cost_estimate=pl.CostEstimate(
            flops=4 * rows * h * inter,
            bytes_accessed=2 * rows * h * x.dtype.itemsize
            + 2 * h * inter * x.dtype.itemsize,
            transcendentals=rows * inter,
        ),
        interpret=interpret,
    )(x, w1, b1, w2, b2, ln_scale, ln_bias)


def _act_f32(inner: jnp.ndarray, act: str) -> jnp.ndarray:
    """f32 activation by name: ``quick_gelu`` (HF CLIP), ``gelu_tanh``
    (HF BERT default form — see models/bert.py gelu_approximate) or
    ``gelu_erf`` (the exact form, gelu_approximate=False)."""

    if act == "quick_gelu":
        return inner * jax.nn.sigmoid(1.702 * inner)
    if act == "gelu_tanh":
        return jax.nn.gelu(inner, approximate=True)
    if act == "gelu_erf":
        return jax.nn.gelu(inner, approximate=False)
    raise ValueError(f"unknown activation {act!r}")


def _mlp_kernel_q8(x_ref, w1_ref, s1_ref, b1_ref, w2_ref, s2_ref, b2_ref,
                   lns_ref, lnb_ref, out_ref, *, eps: float,
                   pre_ln: bool = True, act: str = "quick_gelu"):
    """W8A8 variant (:mod:`mmrag_tpu.ops.quant` scheme): both matmuls run
    int8 x int8 -> int32 on the MXU's double-rate path; LN, the activation,
    and the dequant epilogues stay f32 in VMEM.

    ``pre_ln=True`` (CLIP): writes ``x + FC2(act(FC1(LN(x))))``.
    ``pre_ln=False`` (BERT post-LN): writes ``LN(x + FC2(act(FC1(x))))`` —
    the incoming stream is the previous LN's output, so it is already the
    scale-bounded W8A8 insertion point."""

    from .quant import quantize_rows

    x = x_ref[:]
    y = x.astype(jnp.float32)

    def ln(t):
        mean = jnp.mean(t, axis=-1, keepdims=True)
        var = jnp.mean(jnp.square(t - mean), axis=-1, keepdims=True)
        return (t - mean) * jax.lax.rsqrt(var + eps) * lns_ref[:] + lnb_ref[:]

    aq, ascale = quantize_rows(ln(y) if pre_ln else y)
    acc1 = jax.lax.dot_general(
        aq, w1_ref[:],
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    )
    inner = acc1.astype(jnp.float32) * ascale * s1_ref[:] + b1_ref[:]
    inner = _act_f32(inner, act)
    iq, iscale = quantize_rows(inner)
    acc2 = jax.lax.dot_general(
        iq, w2_ref[:],
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    )
    o = acc2.astype(jnp.float32) * iscale * s2_ref[:] + b2_ref[:]
    out = y + o
    if not pre_ln:
        out = ln(out)
    out_ref[:] = out.astype(out_ref.dtype)


@functools.partial(jax.jit, static_argnames=("eps", "interpret", "pre_ln", "act"))
def _fused_mlp_q8(x, w1q, s1, b1, w2q, s2, b2, ln_scale, ln_bias,
                  eps: float, interpret: bool,
                  pre_ln: bool = True, act: str = "quick_gelu"):
    rows, h = x.shape
    inter = w1q.shape[1]
    # int8 weights are half the bf16 footprint (h=768/inter=3072: 4.7 MB
    # resident), so the bf16 row tile fits with extra margin for the f32
    # inner activation.
    tile = min(_rows_tile(h, inter, 1), rows)
    grid = (rows // tile,)
    row_spec = pl.BlockSpec((tile, h), lambda i: (i, 0), memory_space=pltpu.VMEM)
    inter_row = pl.BlockSpec((1, inter), lambda i: (0, 0), memory_space=pltpu.VMEM)
    h_row = pl.BlockSpec((1, h), lambda i: (0, 0), memory_space=pltpu.VMEM)
    return pl.pallas_call(
        functools.partial(_mlp_kernel_q8, eps=eps, pre_ln=pre_ln, act=act),
        grid=grid,
        in_specs=[
            row_spec,
            pl.BlockSpec((h, inter), lambda i: (0, 0), memory_space=pltpu.VMEM),
            inter_row, inter_row,
            pl.BlockSpec((inter, h), lambda i: (0, 0), memory_space=pltpu.VMEM),
            h_row, h_row,
            h_row, h_row,
        ],
        out_specs=row_spec,
        out_shape=jax.ShapeDtypeStruct((rows, h), x.dtype),
        cost_estimate=pl.CostEstimate(
            flops=4 * rows * h * inter,
            bytes_accessed=2 * rows * h * x.dtype.itemsize + 2 * h * inter,
            transcendentals=rows * inter,
        ),
        interpret=interpret,
    )(x, w1q, s1, b1, w2q, s2, b2, ln_scale, ln_bias)


def fused_mlp_block_q8(
    x: jnp.ndarray, qlayer: dict, eps: float,
    pre_ln: bool = True, act: str = "quick_gelu",
    k1: str = "fc1", k2: str = "fc2", ln_key: str = "ln2",
) -> jnp.ndarray:
    """W8A8 form of :func:`fused_mlp_block`: ``qlayer`` carries
    :func:`mmrag_tpu.ops.quant.quantize_encoder_layer` linears (int8 kernels +
    per-channel scales) and the original LN params. Opt-in via
    ``TPU_ENCODER_QUANT=int8`` — see ops/quant.py for the accuracy contract.

    Defaults are the CLIP block (pre-LN, quick_gelu, fc1/fc2/ln2); BERT
    towers pass ``pre_ln=False, act="gelu_tanh", k1="ffn_in", k2="ffn_out",
    ln_key="ffn_ln"`` (models/bert.py naming)."""

    rows, h = x.shape
    inter_dim = qlayer[k1]["q"].shape[1]
    tile = min(_rows_tile(h, inter_dim, 1), rows)
    pad = (-rows) % tile
    if pad:
        x = jnp.pad(x, ((0, pad), (0, 0)))
    two_d = lambda p: p.reshape(1, -1)
    out = _fused_mlp_q8(
        x,
        qlayer[k1]["q"], qlayer[k1]["scale"], qlayer[k1]["bias"],
        qlayer[k2]["q"], qlayer[k2]["scale"], qlayer[k2]["bias"],
        two_d(qlayer[ln_key]["scale"]), two_d(qlayer[ln_key]["bias"]),
        eps, jax.default_backend() == "cpu", pre_ln=pre_ln, act=act,
    )
    return out[:rows]


def _mlp_xla(x: jnp.ndarray, layer: dict, eps: float) -> jnp.ndarray:
    """Composed-XLA form with the kernel's exact numerics (f32 LN/act,
    f32-accumulated matmuls): the fallback when the resident weights don't
    fit the scoped-VMEM budget."""

    y = x.astype(jnp.float32)
    mean = jnp.mean(y, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(y - mean), axis=-1, keepdims=True)
    ln = (
        (y - mean) * jax.lax.rsqrt(var + eps) * layer["ln2"]["scale"]
        + layer["ln2"]["bias"]
    ).astype(x.dtype)
    precision = (
        jax.lax.Precision.DEFAULT if x.dtype == jnp.bfloat16
        else jax.lax.Precision.HIGHEST
    )
    inner = jnp.dot(
        ln, layer["fc1"]["kernel"].astype(x.dtype),
        preferred_element_type=jnp.float32, precision=precision,
    ) + layer["fc1"]["bias"]
    inner = (inner * jax.nn.sigmoid(1.702 * inner)).astype(x.dtype)
    o = jnp.dot(
        inner, layer["fc2"]["kernel"].astype(x.dtype),
        preferred_element_type=jnp.float32, precision=precision,
    ) + layer["fc2"]["bias"]
    return (y + o).astype(x.dtype)


# resident-weight budget: both FC matrices stay VMEM-resident for every row
# tile (constant index_map), so they must leave room for the per-tile
# activations inside the ~16 MB scoped-VMEM limit. bf16 h=768/inter=3072 is
# 9.4 MB (fits); f32 is 18.9 MB (cannot fit at ANY tile size — review
# finding: TPU_COMPUTE_DTYPE=float32 parity runs crashed the compile).
_WEIGHT_VMEM_BUDGET = 12 * 1024 * 1024


def fused_mlp_block(x: jnp.ndarray, layer: dict, eps: float) -> jnp.ndarray:
    """One dispatch for the CLIP pre-LN MLP block over a 2-D (rows, h)
    residual stream: ``x + FC2(quick_gelu(FC1(LN2(x))))``. Pads rows to a
    tile multiple internally; interpret mode off-TPU. Falls back to the
    composed XLA form (same numerics) when the weights exceed the
    resident-VMEM budget (e.g. float32 compute)."""

    rows, h = x.shape
    inter_dim = layer["fc1"]["kernel"].shape[1]
    if 2 * h * inter_dim * x.dtype.itemsize > _WEIGHT_VMEM_BUDGET:
        return _mlp_xla(x, layer, eps)
    tile = min(_rows_tile(h, layer["fc1"]["kernel"].shape[1], x.dtype.itemsize), rows)
    pad = (-rows) % tile
    if pad:
        x = jnp.pad(x, ((0, pad), (0, 0)))
    two_d = lambda p: p.reshape(1, -1)
    out = _fused_mlp(
        x,
        layer["fc1"]["kernel"].astype(x.dtype), two_d(layer["fc1"]["bias"]),
        layer["fc2"]["kernel"].astype(x.dtype), two_d(layer["fc2"]["bias"]),
        two_d(layer["ln2"]["scale"]), two_d(layer["ln2"]["bias"]),
        eps, jax.default_backend() == "cpu",
    )
    return out[:rows]
