"""Pure-JAX BERT encoder family: MiniLM-L6 sentence embedder + cross-encoder.

TPU-native replacement for the reference's torch encoders:
  * ``sentence-transformers/all-MiniLM-L6-v2`` text embedding
    (``/root/reference/app/ml/embeddings.py:52-70``): BERT-6L/384 ->
    masked mean pooling -> L2 normalize, 384-d output.
  * ``cross-encoder/ms-marco-MiniLM-L-6-v2`` rerank scorer
    (``/root/reference/app/ml/retrieve.py:29-38,148``): same trunk + tanh
    pooler + 1-logit classifier head.

Everything is functional: params are nested dicts of ``jnp`` arrays produced
by :func:`init_bert_params` (seeded, offline-friendly) or converted from HF
torch checkpoints via :mod:`mmrag_tpu.models.convert`. Forward passes are
jit-compatible with static shapes; matmuls run in the configured compute
dtype (bf16 on TPU) with f32 LayerNorm/softmax for numerical parity.

HF BERT numerics: post-LN residual blocks, additive attention mask,
LayerNorm eps 1e-12 with f32 statistics. The DEFAULT gelu is the tanh
approximation (``BertConfig.gelu_approximate=True`` — 1.5x encoder
throughput on v5e at 3e-7 embedding cosine drift); set it False for
elementwise hidden-state parity with torch's erf form.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any, Dict

import jax
import jax.numpy as jnp
import numpy as np

Params = Dict[str, Any]


@dataclass(frozen=True)
class BertConfig:
    vocab_size: int = 30522
    hidden_size: int = 384
    num_layers: int = 6
    num_heads: int = 12
    intermediate_size: int = 1536
    max_position: int = 512
    type_vocab_size: int = 2
    layer_norm_eps: float = 1e-12
    pad_token_id: int = 0
    # tanh-approx gelu: 45.9k -> 70.4k embeds/s on v5e (erf spends ~4 ms/batch
    # in VPU transcendentals) at 3e-7 embedding cosine drift vs erf. Hidden
    # states differ elementwise up to ~1e-3 from torch's erf form; set False
    # for bit-level hidden-state comparisons.
    gelu_approximate: bool = True

    @property
    def head_dim(self) -> int:
        return self.hidden_size // self.num_heads


MINILM_L6 = BertConfig()


# ---------------------------------------------------------------------------
# Init
# ---------------------------------------------------------------------------


def _dense_init(key, fan_in: int, fan_out: int, stddev: float = 0.02) -> Params:
    return {
        "kernel": jax.random.normal(key, (fan_in, fan_out), jnp.float32) * stddev,
        "bias": jnp.zeros((fan_out,), jnp.float32),
    }


def _ln_init(dim: int) -> Params:
    return {"scale": jnp.ones((dim,), jnp.float32), "bias": jnp.zeros((dim,), jnp.float32)}


def init_bert_params(rng: jax.Array, cfg: BertConfig = MINILM_L6) -> Params:
    """Deterministic seeded init with HF-BERT's parameter tree shape."""

    keys = iter(jax.random.split(rng, 16 + cfg.num_layers * 8))
    h, inter = cfg.hidden_size, cfg.intermediate_size
    params: Params = {
        "embeddings": {
            "word": jax.random.normal(next(keys), (cfg.vocab_size, h), jnp.float32) * 0.02,
            "position": jax.random.normal(next(keys), (cfg.max_position, h), jnp.float32)
            * 0.02,
            "token_type": jax.random.normal(
                next(keys), (cfg.type_vocab_size, h), jnp.float32
            )
            * 0.02,
            "ln": _ln_init(h),
        },
        "layers": [],
    }
    for _ in range(cfg.num_layers):
        params["layers"].append(
            {
                "q": _dense_init(next(keys), h, h),
                "k": _dense_init(next(keys), h, h),
                "v": _dense_init(next(keys), h, h),
                "attn_out": _dense_init(next(keys), h, h),
                "attn_ln": _ln_init(h),
                "ffn_in": _dense_init(next(keys), h, inter),
                "ffn_out": _dense_init(next(keys), inter, h),
                "ffn_ln": _ln_init(h),
            }
        )
    return params


def init_cross_encoder_params(rng: jax.Array, cfg: BertConfig = MINILM_L6) -> Params:
    k1, k2, k3 = jax.random.split(rng, 3)
    return {
        "bert": init_bert_params(k1, cfg),
        "pooler": _dense_init(k2, cfg.hidden_size, cfg.hidden_size),
        "classifier": _dense_init(k3, cfg.hidden_size, 1),
    }


# ---------------------------------------------------------------------------
# Forward
# ---------------------------------------------------------------------------


def _precision(dtype):
    """bf16 -> DEFAULT (native one-pass MXU); f32 -> HIGHEST (stops XLA-CPU
    from silently downcasting, which would break <=1e-3 parity). HIGHEST with
    bf16 inputs would force multi-pass emulation — 3-6x slower on the MXU."""

    return (
        jax.lax.Precision.DEFAULT
        if jnp.dtype(dtype) == jnp.bfloat16
        else jax.lax.Precision.HIGHEST
    )


def _dense(p: Params, x: jnp.ndarray, dtype) -> jnp.ndarray:
    return (
        jnp.dot(
            x.astype(dtype),
            p["kernel"].astype(dtype),
            preferred_element_type=jnp.float32,
            precision=_precision(dtype),
        )
        + p["bias"]
    )


def _layer_norm(p: Params, x: jnp.ndarray, eps: float) -> jnp.ndarray:
    x = x.astype(jnp.float32)
    mean = jnp.mean(x, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(x - mean), axis=-1, keepdims=True)
    return (x - mean) * jax.lax.rsqrt(var + eps) * p["scale"] + p["bias"]


def _residual_ln(
    p: Params, x2: jnp.ndarray, delta: jnp.ndarray, eps: float, out_dtype,
    allow_fused: bool = True,
) -> jnp.ndarray:
    """LayerNorm(x2 + delta) in ``out_dtype`` — fused Pallas kernel on big
    on-chip batches (XLA's LN fusions measured ~7x over bandwidth, >50% of
    encoder time); plain jnp elsewhere. f32 statistics either way.
    ``allow_fused=False`` pins plain jnp (the kernel has no VJP — training
    paths that differentiate the encoder must stay off it)."""

    from ..ops.layernorm import use_fused_ln

    if allow_fused and use_fused_ln(x2.shape[0]):
        from ..ops.layernorm import fused_add_layer_norm

        return fused_add_layer_norm(
            x2, delta, p["scale"], p["bias"], eps, out_dtype=out_dtype
        )
    return _layer_norm(p, x2 + delta, eps).astype(out_dtype)


def _use_fused_attention(impl: str, b: int, s: int) -> bool:
    if impl == "auto":
        from ..ops.attention import use_fused

        return use_fused(b, s)
    return impl == "fused"


def _use_q8(impl: str, s: int) -> bool:
    """Whether a passed ``q8_layers`` engages the W8A8 kernels. Unlike the
    bf16 fused gate there is NO batch-size threshold: with quant enabled,
    every batch of the same tower must score through the same numerics —
    otherwise a rerank pair's logit would depend on how many requests
    happened to coalesce around it, and near-tie candidates could swap order
    across identical requests. The small-batch kernel dispatch overhead is
    part of the opt-in's cost."""

    if impl == "xla":
        return False
    if impl == "fused":
        return True
    from ..ops.attention import use_fused

    # batch omitted -> only the env override / backend / seq-range gates
    return use_fused(seq=max(s, 1))


def _self_attention(
    layer: Params,
    x2: jnp.ndarray,  # (b*s, h) 2-D residual stream
    attention_mask: jnp.ndarray,  # (b, s) {0,1}
    cfg: BertConfig,
    dtype,
    impl: str = "auto",
) -> jnp.ndarray:
    b, s = attention_mask.shape
    h = x2.shape[-1]
    nh, hd = cfg.num_heads, cfg.head_dim
    q = _dense(layer["q"], x2, dtype)
    k = _dense(layer["k"], x2, dtype)
    v = _dense(layer["v"], x2, dtype)
    if _use_fused_attention(impl, b, s):
        # 2-D operands keep row-major layouts end-to-end: the 3-D kernel's
        # layout constraint made XLA spend ~57% of MiniLM wall time
        # transposing activations around it (op-profile measured)
        from ..ops.attention import fused_encoder_attention2d

        ctx = fused_encoder_attention2d(
            q.astype(dtype), k.astype(dtype), v.astype(dtype), nh, s,
            attention_mask=attention_mask,
        )
        return _dense(layer["attn_out"], ctx, dtype)
    mask_bias = (1.0 - attention_mask.astype(jnp.float32))[:, None, None, :] * -1e9
    q, k, v = (t.reshape(b, s, nh, hd) for t in (q, k, v))
    scores = jnp.einsum("bqnd,bknd->bnqk", q.astype(dtype), k.astype(dtype),
                        preferred_element_type=jnp.float32, precision=_precision(dtype))
    scores = scores / np.sqrt(hd) + mask_bias
    probs = jax.nn.softmax(scores.astype(jnp.float32), axis=-1)
    ctx = jnp.einsum("bnqk,bknd->bqnd", probs.astype(dtype), v.astype(dtype),
                     preferred_element_type=jnp.float32, precision=_precision(dtype))
    return _dense(layer["attn_out"], ctx.reshape(b * s, h), dtype)


_BERT_LINEARS = ("q", "k", "v", "attn_out", "ffn_in", "ffn_out")


def quantize_bert(params: Params) -> Params:
    """Per-channel int8 quantization of the BERT encoder blocks (one jitted
    pass at model load; ~4x smaller than the f32 weights). Consumed by
    :func:`bert_encode` ``q8_layers=`` — the W8A8 fast path behind
    ``TPU_ENCODER_QUANT=int8`` (see ops/quant.py). Embeddings, pooling, and
    any classifier head stay full-precision (gather/GEMV-bound, not MXU-
    bound). Pass a cross-encoder tree's ``params["bert"]`` for the reranker.
    """

    from ..ops.quant import quantize_encoder_layers

    return {"layers": quantize_encoder_layers(params["layers"], _BERT_LINEARS)}


def bert_encode(
    params: Params,
    input_ids: jnp.ndarray,  # (b, s) int32
    attention_mask: jnp.ndarray,  # (b, s) {0,1}
    cfg: BertConfig = MINILM_L6,
    token_type_ids: jnp.ndarray | None = None,
    compute_dtype=jnp.float32,
    attention_impl: str = "auto",
    q8_layers: Params | None = None,
) -> jnp.ndarray:
    """Returns last hidden states (b, s, hidden) in f32.

    ``q8_layers`` (from :func:`quantize_bert`) routes the encoder blocks
    through the W8A8 int8-MXU kernels — honored only where the fused kernels
    engage (shared gate); embeddings and the embedding LN stay
    full-precision.
    """

    b, s = input_ids.shape
    emb = params["embeddings"]
    x = (
        emb["word"][input_ids]
        + emb["position"][jnp.arange(s)][None, :, :]
        + emb["token_type"][
            token_type_ids if token_type_ids is not None else jnp.zeros_like(input_ids)
        ]
    )
    x = _layer_norm(emb["ln"], x, cfg.layer_norm_eps)
    # 2-D residual stream: every matmul/LN sees a plain row-major (b*s, h)
    # operand, so XLA never re-lays activations out around the attention
    # kernel's operand constraint. The stream is carried in compute_dtype
    # (bf16 on TPU): the encoder is HBM-bandwidth-bound on activations, so
    # halving the stream halves the wall; LN statistics stay f32 and the
    # bf16 path holds the <=1e-3 cosine-drift budget (test_model_parity).
    stream = jnp.dtype(compute_dtype)
    x = x.reshape(b * s, cfg.hidden_size).astype(stream)
    if q8_layers is not None and _use_q8(attention_impl, s):
        # W8A8 tower: post-LN attention block + post-LN FFN block, each one
        # dispatch with every matmul on the MXU's int8 double-rate path.
        from ..ops.attention import fused_attention_block_q8
        from ..ops.mlp import fused_mlp_block_q8

        act = "gelu_tanh" if cfg.gelu_approximate else "gelu_erf"
        for qlayer in q8_layers["layers"]:
            x = fused_attention_block_q8(
                x, qlayer, cfg.num_heads, s, cfg.layer_norm_eps,
                attention_mask, pre_ln=False, ln_key="attn_ln",
            )
            x = fused_mlp_block_q8(
                x, qlayer, cfg.layer_norm_eps, pre_ln=False, act=act,
                k1="ffn_in", k2="ffn_out", ln_key="ffn_ln",
            )
        return x.reshape(b, s, cfg.hidden_size).astype(jnp.float32)
    for layer in params["layers"]:
        if _use_fused_attention(attention_impl, b, s):
            # whole-block kernel: qkv projections + MHA + output projection +
            # residual LN in one dispatch — q/k/v/ctx never touch HBM.
            # (An equivalent FFN block kernel measured perf-NEUTRAL — XLA
            # already fuses gelu+cast into the matmul epilogues — and was
            # removed.)
            from ..ops.attention import fused_attention_block

            x = fused_attention_block(
                x, layer, cfg.num_heads, s, cfg.layer_norm_eps, attention_mask
            )
        else:
            attn = _self_attention(layer, x, attention_mask, cfg, compute_dtype, impl=attention_impl)
            x = _residual_ln(layer["attn_ln"], x, attn.astype(stream), cfg.layer_norm_eps, stream,
                             allow_fused=attention_impl != "xla")
        inner = jax.nn.gelu(
            _dense(layer["ffn_in"], x, compute_dtype),
            approximate=cfg.gelu_approximate,
        )
        out = _dense(layer["ffn_out"], inner, compute_dtype)
        x = _residual_ln(layer["ffn_ln"], x, out.astype(stream), cfg.layer_norm_eps, stream,
                         allow_fused=attention_impl != "xla")
    return x.reshape(b, s, cfg.hidden_size).astype(jnp.float32)


def mean_pool(hidden: jnp.ndarray, attention_mask: jnp.ndarray) -> jnp.ndarray:
    """Masked mean pooling (sentence-transformers pooling layer)."""

    mask = attention_mask.astype(jnp.float32)[:, :, None]
    summed = jnp.sum(hidden * mask, axis=1)
    counts = jnp.clip(jnp.sum(mask, axis=1), 1e-9, None)
    return summed / counts


def l2_normalize(x: jnp.ndarray, eps: float = 1e-12) -> jnp.ndarray:
    from ..ops.topk import l2_normalize as _impl  # single shared definition

    return _impl(x, axis=-1, eps=eps)


def minilm_embed(
    params: Params,
    input_ids: jnp.ndarray,
    attention_mask: jnp.ndarray,
    cfg: BertConfig = MINILM_L6,
    compute_dtype=jnp.float32,
    attention_impl: str = "auto",
    q8_layers: Params | None = None,
) -> jnp.ndarray:
    """Sentence embeddings: encode -> masked mean pool -> L2 normalize.

    ``attention_impl="xla"`` pins the einsum path — required under
    ``jax.grad`` (the Pallas kernels have no VJP; training uses this).
    ``q8_layers`` opts the tower into the W8A8 kernels (quantize_bert).
    """

    hidden = bert_encode(
        params, input_ids, attention_mask, cfg, compute_dtype=compute_dtype,
        attention_impl=attention_impl, q8_layers=q8_layers,
    )
    return l2_normalize(mean_pool(hidden, attention_mask))


def cross_encoder_score(
    params: Params,
    input_ids: jnp.ndarray,
    attention_mask: jnp.ndarray,
    token_type_ids: jnp.ndarray,
    cfg: BertConfig = MINILM_L6,
    compute_dtype=jnp.float32,
    attention_impl: str = "auto",
    q8_layers: Params | None = None,
) -> jnp.ndarray:
    """(query, passage) pair relevance logits, shape (b,).

    BertForSequenceClassification head: CLS -> pooler dense -> tanh ->
    classifier dense(1). Raw logits (no sigmoid) — matches CrossEncoder
    ms-marco output that the reference z-normalizes downstream.
    ``q8_layers`` (quantize_bert of ``params["bert"]``) opts the trunk into
    the W8A8 kernels; pooler/classifier stay full-precision.
    """

    hidden = bert_encode(
        params["bert"], input_ids, attention_mask, cfg,
        token_type_ids=token_type_ids, compute_dtype=compute_dtype,
        attention_impl=attention_impl, q8_layers=q8_layers,
    )
    pooled = jnp.tanh(_dense(params["pooler"], hidden[:, 0], compute_dtype))
    return _dense(params["classifier"], pooled, compute_dtype)[:, 0]
