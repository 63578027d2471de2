"""W8A8 encoder quantization (ops/quant.py + the q8 fused kernels).

The q8 kernels run in interpret mode on CPU (same gate plumbing as the bf16
fused kernels), so these tests exercise the exact kernel bodies that compile
on TPU. Perf numbers live in BASELINE.md (23.9k vs 18.1k CLIP embeds/s).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mmrag_tpu.ops.quant import (
    q8_dense,
    quantize_encoder_layer,
    quantize_linear,
    quantize_rows,
    quantize_weight,
)


def test_quantize_weight_roundtrip(rng):
    w = jnp.asarray(rng.standard_normal((96, 64)) * 0.3, jnp.float32)
    q = quantize_weight(w)
    assert q["q"].dtype == jnp.int8 and q["scale"].shape == (1, 64)
    deq = np.asarray(q["q"], np.float32) * np.asarray(q["scale"])
    # per-channel symmetric: worst-case error is half a quantization bin
    bin_w = np.asarray(q["scale"])[0]
    assert np.all(np.abs(deq - np.asarray(w)) <= 0.5 * bin_w + 1e-7)


def test_quantize_rows_zero_safe():
    a = jnp.zeros((4, 32), jnp.float32)
    q, s = quantize_rows(a)
    assert np.all(np.asarray(q) == 0) and np.all(np.isfinite(np.asarray(s)))


def test_q8_dense_matches_numpy(rng):
    a = jnp.asarray(rng.standard_normal((8, 64)), jnp.float32)
    lin = quantize_linear(
        {"kernel": jnp.asarray(rng.standard_normal((64, 32)) * 0.1, jnp.float32),
         "bias": jnp.asarray(rng.standard_normal(32), jnp.float32)}
    )
    aq, ascale = quantize_rows(a)
    got = q8_dense(aq, ascale, lin)
    want = (
        np.asarray(aq, np.int32) @ np.asarray(lin["q"], np.int32)
    ).astype(np.float32) * np.asarray(ascale) * np.asarray(lin["scale"]) + np.asarray(
        lin["bias"]
    )
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-6)


def _q8_mlp_composed(x, qlayer, eps):
    """The q8 MLP math composed from jnp ops (the kernel's reference)."""

    y = x.astype(jnp.float32)
    mean = jnp.mean(y, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(y - mean), axis=-1, keepdims=True)
    ln = (y - mean) * jax.lax.rsqrt(var + eps) * qlayer["ln2"]["scale"] + qlayer["ln2"]["bias"]
    aq, ascale = quantize_rows(ln)
    inner = q8_dense(aq, ascale, qlayer["fc1"])
    inner = inner * jax.nn.sigmoid(1.702 * inner)
    iq, iscale = quantize_rows(inner)
    return (y + q8_dense(iq, iscale, qlayer["fc2"])).astype(x.dtype)


def _clip_style_layer(rng, h, inter):
    def lin(i, o, key):
        return {
            "kernel": jnp.asarray(rng.standard_normal((i, o)) * 0.08, jnp.float32),
            "bias": jnp.asarray(rng.standard_normal(o) * 0.01, jnp.float32),
        }

    return {
        "ln1": {"scale": jnp.ones(h), "bias": jnp.zeros(h)},
        "ln2": {"scale": jnp.ones(h), "bias": jnp.zeros(h)},
        "q": lin(h, h, 0), "k": lin(h, h, 1), "v": lin(h, h, 2),
        "attn_out": lin(h, h, 3),
        "fc1": lin(h, inter, 4), "fc2": lin(inter, h, 5),
    }


def test_fused_mlp_q8_matches_composed(rng):
    from mmrag_tpu.ops.mlp import fused_mlp_block_q8

    h, inter, rows = 64, 128, 48
    layer = _clip_style_layer(rng, h, inter)
    qlayer = quantize_encoder_layer(layer)
    x = jnp.asarray(rng.standard_normal((rows, h)), jnp.float32)
    got = fused_mlp_block_q8(x, qlayer, 1e-5)
    want = _q8_mlp_composed(x, qlayer, 1e-5)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-4)


@pytest.mark.parametrize("pre_ln", [True, False])
def test_fused_attention_block_q8_matches_composed(rng, pre_ln):
    from mmrag_tpu.ops.attention import fused_attention_block_q8

    h, nh, seq, b = 64, 4, 16, 3
    layer = _clip_style_layer(rng, h, h * 2)
    layer["attn_ln"] = layer["ln1"]
    qlayer = quantize_encoder_layer(layer)
    x = jnp.asarray(rng.standard_normal((b * seq, h)), jnp.float32)
    mask = np.ones((b, seq), np.int32)
    mask[:, seq - 4 :] = 0
    got = fused_attention_block_q8(
        x, qlayer, nh, seq, 1e-5, jnp.asarray(mask),
        pre_ln=pre_ln, ln_key="ln1",
    )

    # composed reference with the same quantized weights + textbook softmax
    def ln(y):
        y = y.astype(jnp.float32)
        mean = jnp.mean(y, axis=-1, keepdims=True)
        var = jnp.mean(jnp.square(y - mean), axis=-1, keepdims=True)
        return (y - mean) * jax.lax.rsqrt(var + 1e-5) * qlayer["ln1"]["scale"] + qlayer["ln1"]["bias"]

    a_in = ln(x) if pre_ln else x.astype(jnp.float32)
    aq, ascale = quantize_rows(a_in)
    q = q8_dense(aq, ascale, qlayer["q"])
    k = q8_dense(aq, ascale, qlayer["k"])
    v = q8_dense(aq, ascale, qlayer["v"])
    hd = h // nh
    qh = np.asarray(q).reshape(b, seq, nh, hd).transpose(0, 2, 1, 3)
    kh = np.asarray(k).reshape(b, seq, nh, hd).transpose(0, 2, 1, 3)
    vh = np.asarray(v).reshape(b, seq, nh, hd).transpose(0, 2, 1, 3)
    scores = qh @ kh.transpose(0, 1, 3, 2) / np.sqrt(hd)
    scores = scores + (1.0 - mask.astype(np.float32))[:, None, None, :] * -1e9
    scores -= scores.max(-1, keepdims=True)
    p = np.exp(scores)
    p /= p.sum(-1, keepdims=True)
    ctx = (p @ vh).transpose(0, 2, 1, 3).reshape(b * seq, h)
    cq, cscale = quantize_rows(jnp.asarray(ctx))
    o = q8_dense(cq, cscale, qlayer["attn_out"])
    y = np.asarray(x, np.float32) + np.asarray(o)
    want = y if pre_ln else np.asarray(ln(jnp.asarray(y)))
    np.testing.assert_allclose(np.asarray(got), want, atol=3e-4)


def _bert_style_layer(rng, h, inter):
    def lin(i, o):
        return {
            "kernel": jnp.asarray(rng.standard_normal((i, o)) * 0.08, jnp.float32),
            "bias": jnp.asarray(rng.standard_normal(o) * 0.01, jnp.float32),
        }

    return {
        "attn_ln": {"scale": jnp.ones(h), "bias": jnp.zeros(h)},
        "ffn_ln": {"scale": jnp.ones(h), "bias": jnp.zeros(h)},
        "q": lin(h, h), "k": lin(h, h), "v": lin(h, h),
        "attn_out": lin(h, h),
        "ffn_in": lin(h, inter), "ffn_out": lin(inter, h),
    }


def test_fused_mlp_q8_postln_gelu_matches_composed(rng):
    """BERT form: LN(x + FC2(gelu_tanh(FC1(x)))) with BERT layer naming."""

    from mmrag_tpu.ops.mlp import fused_mlp_block_q8

    h, inter, rows = 64, 128, 48
    layer = _bert_style_layer(rng, h, inter)
    qlayer = quantize_encoder_layer(
        layer, ("q", "k", "v", "attn_out", "ffn_in", "ffn_out")
    )
    x = jnp.asarray(rng.standard_normal((rows, h)), jnp.float32)
    got = fused_mlp_block_q8(
        x, qlayer, 1e-12, pre_ln=False, act="gelu_tanh",
        k1="ffn_in", k2="ffn_out", ln_key="ffn_ln",
    )

    y = x.astype(jnp.float32)
    aq, ascale = quantize_rows(y)
    inner = q8_dense(aq, ascale, qlayer["ffn_in"])
    inner = jax.nn.gelu(inner, approximate=True)
    iq, iscale = quantize_rows(inner)
    out = y + q8_dense(iq, iscale, qlayer["ffn_out"])
    mean = jnp.mean(out, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(out - mean), axis=-1, keepdims=True)
    want = (out - mean) * jax.lax.rsqrt(var + 1e-12) * qlayer["ffn_ln"][
        "scale"
    ] + qlayer["ffn_ln"]["bias"]
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-4)


def test_bert_q8_tower_cosine(rng, monkeypatch):
    """The full q8 MiniLM tower tracks the f32 tower (opt-in accuracy
    contract: embedding cosine >= 0.995 on seeded weights)."""

    monkeypatch.setenv("MMRAG_ATTN_IMPL", "fused")
    from mmrag_tpu.models import bert

    cfg = bert.BertConfig(
        hidden_size=64, num_layers=3, num_heads=4, intermediate_size=128
    )
    params = bert.init_bert_params(jax.random.PRNGKey(0), cfg)
    q8 = bert.quantize_bert(params)
    ids = jnp.asarray(rng.integers(5, 1000, (4, 16)), jnp.int32)
    mask = np.ones((4, 16), np.int32)
    mask[:, 12:] = 0
    mask = jnp.asarray(mask)
    ref = np.asarray(
        bert.minilm_embed(params, ids, mask, cfg, attention_impl="fused")
    )
    got = np.asarray(
        bert.minilm_embed(
            params, ids, mask, cfg, attention_impl="fused", q8_layers=q8
        )
    )
    cos = (ref * got).sum(-1)  # both L2-normalized
    assert np.all(cos >= 0.995), cos


def test_cross_encoder_q8_preserves_ordering(rng, monkeypatch):
    """The q8 cross-encoder trunk keeps rerank score ordering on seeded
    weights (the downstream contract: z-fused rank positions)."""

    monkeypatch.setenv("MMRAG_ATTN_IMPL", "fused")
    from mmrag_tpu.models import bert

    cfg = bert.BertConfig(
        hidden_size=64, num_layers=2, num_heads=4, intermediate_size=128
    )
    params = bert.init_cross_encoder_params(jax.random.PRNGKey(1), cfg)
    q8 = bert.quantize_bert(params["bert"])
    b, s = 8, 24
    ids = jnp.asarray(rng.integers(5, 1000, (b, s)), jnp.int32)
    mask = jnp.ones((b, s), jnp.int32)
    tt = jnp.asarray(rng.integers(0, 2, (b, s)), jnp.int32)
    ref = np.asarray(
        bert.cross_encoder_score(params, ids, mask, tt, cfg, attention_impl="fused")
    )
    got = np.asarray(
        bert.cross_encoder_score(
            params, ids, mask, tt, cfg, attention_impl="fused", q8_layers=q8
        )
    )
    assert list(np.argsort(-ref)) == list(np.argsort(-got))
    np.testing.assert_allclose(got, ref, atol=0.15)


def test_clip_q8_tower_cosine(rng, monkeypatch):
    """The full q8 vision tower tracks the f32 tower (opt-in accuracy
    contract: cosine >= 0.995 on seeded weights; measured 0.9998)."""

    monkeypatch.setenv("MMRAG_ATTN_IMPL", "fused")
    from mmrag_tpu.models import clip

    cfg = clip.CLIPConfig(
        vision=clip.CLIPVisionConfig(
            hidden_size=64, num_layers=3, num_heads=2, intermediate_size=128
        ),
        text=clip.CLIPTextConfig(hidden_size=32, num_layers=2, num_heads=2,
                                 intermediate_size=64),
        projection_dim=128,
    )
    params = clip.init_clip_params(jax.random.PRNGKey(0), cfg)
    q8 = clip.quantize_clip_vision(params)
    pixels = jnp.asarray(rng.standard_normal((2, 224, 224, 3)), jnp.float32)
    ref = np.asarray(clip.clip_image_features(params, pixels, cfg))
    got = np.asarray(clip.clip_image_features(params, pixels, cfg, q8_layers=q8))
    cos = (ref * got).sum(-1) / (
        np.linalg.norm(ref, axis=-1) * np.linalg.norm(got, axis=-1)
    )
    assert np.all(cos >= 0.995), cos


def test_runtime_encoder_quant_integration(tmp_path, rng, monkeypatch):
    """TPU_ENCODER_QUANT=int8 routes embed_images_batch through the q8
    kernels and stays close to the unquantized runtime."""

    monkeypatch.setenv("MMRAG_ATTN_IMPL", "fused")
    from mmrag_tpu.models import runtime as rt
    from mmrag_tpu.settings import load_settings
    from tests.test_runtime import TINY_BERT, TINY_CLIP

    imgs = [rng.integers(0, 255, (224, 224, 3)).astype(np.uint8)]
    rt.reset_runtime()
    base_cfg = load_settings({"WEIGHTS_DIR": str(tmp_path / "w")})
    ref = rt.EncoderRuntime(base_cfg, bert_cfg=TINY_BERT, clip_cfg=TINY_CLIP)
    want = ref.embed_images_batch(imgs)

    q_cfg = load_settings(
        {"WEIGHTS_DIR": str(tmp_path / "w"), "TPU_ENCODER_QUANT": "int8"}
    )
    enc = rt.EncoderRuntime(q_cfg, bert_cfg=TINY_BERT, clip_cfg=TINY_CLIP)
    assert enc.encoder_quant == "int8"
    got = enc.embed_images_batch(imgs)
    rt.reset_runtime()
    assert got.shape == want.shape
    np.testing.assert_allclose(np.linalg.norm(got, axis=1), 1.0, atol=1e-4)
    cos = (got * want).sum(-1)
    assert np.all(cos >= 0.99), cos


def test_runtime_text_quant_integration(tmp_path, rng, monkeypatch):
    """TPU_ENCODER_QUANT=int8 routes embed_text_batch and rerank_scores
    through the q8 BERT kernels and stays close to the unquantized runtime."""

    monkeypatch.setenv("MMRAG_ATTN_IMPL", "fused")
    from mmrag_tpu.models import runtime as rt
    from mmrag_tpu.settings import load_settings
    from tests.test_runtime import TINY_BERT, TINY_CLIP

    texts = ["alpha beta gamma", "delta epsilon", "zeta eta theta iota"]
    rt.reset_runtime()
    base_cfg = load_settings({"WEIGHTS_DIR": str(tmp_path / "w")})
    ref_rt = rt.EncoderRuntime(base_cfg, bert_cfg=TINY_BERT, clip_cfg=TINY_CLIP)
    want = ref_rt.embed_text_batch(texts)
    want_scores = ref_rt.rerank_scores("alpha beta", texts)

    q_cfg = load_settings(
        {"WEIGHTS_DIR": str(tmp_path / "w"), "TPU_ENCODER_QUANT": "int8"}
    )
    enc = rt.EncoderRuntime(q_cfg, bert_cfg=TINY_BERT, clip_cfg=TINY_CLIP)
    got = enc.embed_text_batch(texts)
    got_scores = enc.rerank_scores("alpha beta", texts)
    rt.reset_runtime()
    assert got.shape == want.shape
    np.testing.assert_allclose(np.linalg.norm(got, axis=1), 1.0, atol=1e-4)
    cos = (got * want).sum(-1)
    assert np.all(cos >= 0.99), cos
    # rerank ordering preserved under quantization on seeded weights
    assert list(np.argsort(-want_scores)) == list(np.argsort(-got_scores))
