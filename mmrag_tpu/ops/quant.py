"""W8A8 dynamic quantization for the encoder towers (opt-in, TPU MXU int8).

The v5e MXU runs int8 x int8 -> int32 at ~2x its bf16 FLOP rate (measured
338 TOPS vs 190 TFLOP/s on an 8192-class matmul through XLA). The encoder
towers are compute-bound at their bench shapes (CLIP ViT-B/32 measured 83%
of the bf16 matmul roofline), so the only way past the bf16 ceiling is to
feed the MXU narrower operands. This module provides the quantization
scheme shared by the int8 variants of the fused attention/MLP kernels
(:mod:`mmrag_tpu.ops.attention`, :mod:`mmrag_tpu.ops.mlp`):

* **Weights**: per-output-channel symmetric int8 (`w_q[i, o] =
  round(w[i, o] / s_o)`, `s_o = max_i |w[i, o]| / 127`), quantized once at
  model load and cached on device — same layout as the f32 kernel so the
  MXU contraction dimension is unchanged.
* **Activations**: per-row (per-token) dynamic symmetric int8, computed
  inside the kernel right after the f32 LayerNorm (whose output is
  scale-bounded, the standard W8A8 insertion point). A matmul then
  dequantizes with the rank-1 outer product `row_scale x col_scale` fused
  into its f32 epilogue.

Accuracy: an opt-in mode (``TPU_ENCODER_QUANT=int8``) — the default path
stays bf16/f32 and holds the <=1e-3 cosine parity budget
(tests/test_model_parity.py). The quantized tower's drift is measured in
tests (cosine >= 0.99 on seeded-init weights) and reported by
``bench.py --steps clip_int8`` as embedding cosine + retrieval-ordering
overlap vs the bf16 tower.

No reference equivalent: the reference serves f32/f16 torch encoders
(``/root/reference/app/ml/embeddings.py:19-43``); this is TPU headroom the
rebuild adds on top.
"""

from __future__ import annotations

from typing import Dict, Iterable

import jax
import jax.numpy as jnp

Params = Dict[str, object]

# quantized-linear pytree: {"q": int8 (in, out), "scale": f32 (1, out),
#                           "bias": f32 (1, out)}


def quantize_rows(a: jnp.ndarray):
    """Per-row symmetric int8: returns ``(q, scale)`` with
    ``a ~= q * scale``; ``scale`` is (rows, 1) f32. Safe for all-zero rows.

    Works both as a traced XLA op and inside a Pallas kernel body (plain
    jnp ops only).
    """

    a = a.astype(jnp.float32)
    scale = jnp.max(jnp.abs(a), axis=-1, keepdims=True) * (1.0 / 127.0)
    scale = jnp.maximum(scale, 1e-12)
    q = jnp.round(a / scale).astype(jnp.int8)
    return q, scale


def quantize_weight(kernel: jnp.ndarray) -> Params:
    """Per-output-channel symmetric int8 of a (in, out) dense kernel."""

    w = kernel.astype(jnp.float32)
    scale = jnp.max(jnp.abs(w), axis=0, keepdims=True) * (1.0 / 127.0)  # (1, out)
    scale = jnp.maximum(scale, 1e-12)
    q = jnp.round(w / scale).astype(jnp.int8)
    return {"q": q, "scale": scale}


def quantize_linear(p: Params) -> Params:
    """Quantize one dense layer {"kernel", "bias"?} -> {"q","scale","bias"}."""

    out = quantize_weight(p["kernel"])
    if "bias" in p:
        out["bias"] = p["bias"].astype(jnp.float32).reshape(1, -1)
    else:
        out["bias"] = jnp.zeros((1, out["q"].shape[1]), jnp.float32)
    return out


_ENCODER_LINEARS = ("q", "k", "v", "attn_out", "fc1", "fc2")


def quantize_encoder_layer(
    layer: Params, linears: Iterable[str] = _ENCODER_LINEARS
) -> Params:
    """Quantize every dense sublayer of one encoder block; LN params (and any
    other non-linear entries) are carried through unchanged so the q8 kernels
    read one self-contained layer pytree."""

    out = {}
    for key, val in layer.items():
        out[key] = quantize_linear(val) if key in linears else val
    return out


def quantize_encoder_layers(layers, linears: Iterable[str] = _ENCODER_LINEARS):
    """jit-compiled quantization of a whole tower's blocks (list of layers).

    Called once at model load by the runtime; the result is a device-resident
    pytree ~4x smaller than the f32 weights.
    """

    fn = jax.jit(
        lambda ls: [quantize_encoder_layer(l, tuple(linears)) for l in ls]
    )
    return fn(list(layers))


def q8_dense(aq: jnp.ndarray, row_scale: jnp.ndarray, qlin: Params) -> jnp.ndarray:
    """f32 output of a quantized dense: ``(aq @ q) * (row_scale * scale) +
    bias``. The int8 x int8 contraction takes the MXU's double-rate path;
    everything else is a fused f32 epilogue. Usable in XLA and in kernels."""

    acc = jax.lax.dot_general(
        aq, qlin["q"],
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    )
    return acc.astype(jnp.float32) * row_scale * qlin["scale"] + qlin["bias"]
