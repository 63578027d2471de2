"""Fused Pallas attention vs XLA einsum path parity (interpret mode on CPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mmrag_tpu.models import bert, clip
from mmrag_tpu.ops.attention import fused_encoder_attention, use_fused


def _sdpa_reference(q, k, v, nh, mask=None, bias=None):
    b, s, h = q.shape
    hd = h // nh
    qh = q.reshape(b, s, nh, hd).transpose(0, 2, 1, 3).astype(np.float32)
    kh = k.reshape(b, s, nh, hd).transpose(0, 2, 1, 3).astype(np.float32)
    vh = v.reshape(b, s, nh, hd).transpose(0, 2, 1, 3).astype(np.float32)
    scores = qh @ kh.transpose(0, 1, 3, 2) / np.sqrt(hd)
    if bias is not None:
        scores = scores + np.asarray(bias, np.float32)[:, None]
    if mask is not None:
        scores = scores + (1.0 - np.asarray(mask, np.float32))[:, None, None, :] * -1e9
    scores -= scores.max(-1, keepdims=True)
    p = np.exp(scores)
    p /= p.sum(-1, keepdims=True)
    return (p @ vh).transpose(0, 2, 1, 3).reshape(b, s, h)


@pytest.mark.parametrize("b,s,h,nh", [(3, 64, 384, 12), (2, 77, 512, 8)])
def test_fused_matches_reference(rng, b, s, h, nh):
    q = jnp.asarray(rng.standard_normal((b, s, h)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((b, s, h)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((b, s, h)), jnp.float32)
    mask = np.ones((b, s), np.int32)
    mask[:, s // 2 :] = 0
    got = fused_encoder_attention(q, k, v, nh, attention_mask=jnp.asarray(mask))
    want = _sdpa_reference(np.asarray(q), np.asarray(k), np.asarray(v), nh, mask=mask)
    np.testing.assert_allclose(np.asarray(got), want, atol=2e-5)


def test_fused_causal_bias(rng):
    b, s, h, nh = 2, 16, 64, 4
    q = jnp.asarray(rng.standard_normal((b, s, h)), jnp.float32)
    causal = np.triu(np.full((s, s), -1e9, np.float32), k=1)
    got = fused_encoder_attention(
        q, q, q, nh, bias=jnp.broadcast_to(jnp.asarray(causal), (b, s, s))
    )
    want = _sdpa_reference(
        np.asarray(q), np.asarray(q), np.asarray(q), nh,
        bias=np.broadcast_to(causal, (b, s, s)),
    )
    np.testing.assert_allclose(np.asarray(got), want, atol=2e-5)


def test_batch_padding_roundtrip(rng):
    # b=5 is not a tile multiple; padded rows must not leak into outputs
    q = jnp.asarray(rng.standard_normal((5, 64, 128)), jnp.float32)
    got = fused_encoder_attention(q, q, q, 4)
    want = _sdpa_reference(np.asarray(q), np.asarray(q), np.asarray(q), 4)
    assert got.shape == (5, 64, 128)
    np.testing.assert_allclose(np.asarray(got), want, atol=2e-5)


def test_minilm_forward_fused_vs_xla(rng, monkeypatch):
    params = bert.init_bert_params(jax.random.PRNGKey(0))
    ids = jnp.asarray(rng.integers(5, 30000, (4, 64)), jnp.int32)
    mask = np.ones((4, 64), np.int32)
    mask[:, 40:] = 0
    mask = jnp.asarray(mask)
    monkeypatch.setenv("MMRAG_ATTN_IMPL", "xla")
    want = np.asarray(bert.minilm_embed(params, ids, mask))
    monkeypatch.setenv("MMRAG_ATTN_IMPL", "fused")
    got = np.asarray(bert.minilm_embed(params, ids, mask))
    np.testing.assert_allclose(got, want, atol=1e-4)


def test_clip_towers_fused_vs_xla(rng, monkeypatch):
    cfg = clip.CLIPConfig(
        vision=clip.CLIPVisionConfig(
            image_size=32, patch_size=16, hidden_size=64, num_layers=2,
            num_heads=4, intermediate_size=128,
        ),
        text=clip.CLIPTextConfig(
            vocab_size=512, hidden_size=64, num_layers=2, num_heads=4,
            intermediate_size=128, max_position=16,
        ),
        projection_dim=32,
    )
    params = clip.init_clip_params(jax.random.PRNGKey(1), cfg)
    pixels = jnp.asarray(rng.standard_normal((2, 32, 32, 3)), jnp.float32)
    ids = jnp.asarray(rng.integers(1, 500, (2, 16)), jnp.int32)
    tmask = jnp.ones((2, 16), jnp.int32)
    monkeypatch.setenv("MMRAG_ATTN_IMPL", "xla")
    img_x = np.asarray(clip.clip_image_features(params, pixels, cfg))
    txt_x = np.asarray(clip.clip_text_features(params, ids, tmask, cfg))
    monkeypatch.setenv("MMRAG_ATTN_IMPL", "fused")
    img_f = np.asarray(clip.clip_image_features(params, pixels, cfg))
    txt_f = np.asarray(clip.clip_text_features(params, ids, tmask, cfg))
    np.testing.assert_allclose(img_f, img_x, atol=1e-4)
    np.testing.assert_allclose(txt_f, txt_x, atol=1e-4)


def test_use_fused_override(monkeypatch):
    monkeypatch.setenv("MMRAG_ATTN_IMPL", "fused")
    assert use_fused()
    monkeypatch.setenv("MMRAG_ATTN_IMPL", "xla")
    assert not use_fused()


def test_fully_masked_rows_yield_zero_not_nan(rng):
    # Batch-padding samples have an all-zero attention mask; the one-pass
    # softmax (no max subtraction) must clamp the zero denominator to give
    # ctx = 0 rather than 0/0 = NaN (ops/attention.py::_softmax_ctx).
    b, s, h, nh = 3, 64, 128, 4
    q = jnp.asarray(rng.standard_normal((b, s, h)), jnp.float32)
    mask = np.ones((b, s), np.int32)
    mask[1] = 0  # sample 1 entirely padding
    got = np.asarray(fused_encoder_attention(q, q, q, nh, attention_mask=jnp.asarray(mask)))
    assert np.isfinite(got).all()
    np.testing.assert_array_equal(got[1], np.zeros((s, h), np.float32))
    want = _sdpa_reference(np.asarray(q), np.asarray(q), np.asarray(q), nh, mask=mask)
    np.testing.assert_allclose(got[0], want[0], atol=2e-5)
    np.testing.assert_allclose(got[2], want[2], atol=2e-5)


def test_large_logits_stay_finite(rng):
    # Logits above the _LOGIT_CAP=80 guard must not overflow exp/f32; rows
    # whose max exceeds the cap degrade to equal weighting of the over-cap
    # entries instead of producing inf/NaN.
    b, s, h, nh = 2, 16, 64, 4
    q = jnp.asarray(rng.standard_normal((b, s, h)) * 40.0, jnp.float32)
    got = np.asarray(fused_encoder_attention(q, q, q, nh))
    assert np.isfinite(got).all()
    # values are convex combinations of v rows, so bounded by max |v|
    assert np.abs(got).max() <= np.abs(np.asarray(q)).max() + 1e-3


def test_fused_mlp_block_matches_composed(rng):
    """ops/mlp.py pre-LN MLP kernel == composed LN2 -> fc1 -> quick_gelu ->
    fc2 -> residual (interpret mode on CPU)."""

    from mmrag_tpu.models.clip import _dense, _layer_norm, quick_gelu
    from mmrag_tpu.ops.mlp import fused_mlp_block

    h, inter, rows = 64, 128, 48
    layer = {
        "ln2": {"scale": jnp.asarray(rng.standard_normal(h), jnp.float32),
                "bias": jnp.asarray(rng.standard_normal(h), jnp.float32)},
        "fc1": {"kernel": jnp.asarray(rng.standard_normal((h, inter)) * 0.05, jnp.float32),
                "bias": jnp.asarray(rng.standard_normal(inter) * 0.05, jnp.float32)},
        "fc2": {"kernel": jnp.asarray(rng.standard_normal((inter, h)) * 0.05, jnp.float32),
                "bias": jnp.asarray(rng.standard_normal(h) * 0.05, jnp.float32)},
    }
    x = jnp.asarray(rng.standard_normal((rows, h)), jnp.float32)
    eps = 1e-5
    y = _layer_norm(layer["ln2"], x, eps)
    want = x.astype(jnp.float32) + _dense(
        layer["fc2"], quick_gelu(_dense(layer["fc1"], y, jnp.float32)), jnp.float32
    )
    got = fused_mlp_block(x, layer, eps)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-5)
