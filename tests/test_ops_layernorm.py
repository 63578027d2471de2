"""Fused add+LayerNorm kernel vs plain jnp (interpret mode on CPU)."""

import jax.numpy as jnp
import numpy as np
import pytest

from mmrag_tpu.ops.layernorm import fused_add_layer_norm


def _ref(x, d, scale, bias, eps):
    xf = x.astype(np.float32) + d.astype(np.float32)
    mean = xf.mean(-1, keepdims=True)
    var = ((xf - mean) ** 2).mean(-1, keepdims=True)
    return (xf - mean) / np.sqrt(var + eps) * scale + bias


@pytest.mark.parametrize("rows,h", [(64, 128), (2048, 384)])
def test_matches_reference(rng, rows, h):
    x = jnp.asarray(rng.standard_normal((rows, h)), jnp.float32)
    d = jnp.asarray(rng.standard_normal((rows, h)), jnp.float32)
    scale = jnp.asarray(rng.standard_normal(h), jnp.float32)
    bias = jnp.asarray(rng.standard_normal(h), jnp.float32)
    got = fused_add_layer_norm(x, d, scale, bias, 1e-12)
    want = _ref(np.asarray(x), np.asarray(d), np.asarray(scale), np.asarray(bias), 1e-12)
    np.testing.assert_allclose(np.asarray(got), want, atol=2e-5)


def test_bf16_inputs_f32_stats(rng):
    x = jnp.asarray(rng.standard_normal((512, 128)), jnp.bfloat16)
    d = jnp.zeros((512, 128), jnp.bfloat16)
    scale = jnp.ones(128, jnp.float32)
    bias = jnp.zeros(128, jnp.float32)
    got = fused_add_layer_norm(x, d, scale, bias, 1e-12)
    assert got.dtype == jnp.float32
    np.testing.assert_allclose(np.asarray(got).mean(-1), 0.0, atol=1e-3)


def test_unaligned_shapes_fall_back(rng):
    x = jnp.asarray(rng.standard_normal((7, 100)), jnp.float32)  # 100 % 128 != 0
    d = jnp.zeros_like(x)
    got = fused_add_layer_norm(x, d, jnp.ones(100), jnp.zeros(100), 1e-12)
    want = _ref(np.asarray(x), np.asarray(d), np.ones(100, np.float32),
                np.zeros(100, np.float32), 1e-12)
    np.testing.assert_allclose(np.asarray(got), want, atol=2e-5)


def test_minilm_forward_with_fused_ln(rng, monkeypatch):
    import jax

    from mmrag_tpu.models import bert

    params = bert.init_bert_params(jax.random.PRNGKey(0))
    ids = jnp.asarray(rng.integers(5, 30000, (4, 64)), jnp.int32)
    mask = jnp.ones((4, 64), jnp.int32)
    monkeypatch.setenv("MMRAG_ATTN_IMPL", "xla")
    monkeypatch.setenv("MMRAG_LN_IMPL", "xla")
    want = np.asarray(bert.minilm_embed(params, ids, mask))
    monkeypatch.setenv("MMRAG_ATTN_IMPL", "fused")
    monkeypatch.setenv("MMRAG_LN_IMPL", "fused")  # both kernels, independently gated
    got = np.asarray(bert.minilm_embed(params, ids, mask))
    np.testing.assert_allclose(got, want, atol=1e-4)
