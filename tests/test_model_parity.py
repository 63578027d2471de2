"""Numerical parity: our JAX encoders vs HF torch, same (random) weights.

This is the judge metric harness (BASELINE.md: <=1e-3 cosine drift). No
network: torch models are built from configs with random init, their state
dicts converted via mmrag_tpu.models.convert, and outputs compared in f32.
Real pretrained checkpoints go through the identical code path.
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

import jax.numpy as jnp

from mmrag_tpu.models import bert as jbert
from mmrag_tpu.models import clip as jclip
from mmrag_tpu.models import convert


def _cosine_drift(a: np.ndarray, b: np.ndarray) -> float:
    a = a.reshape(a.shape[0], -1).astype(np.float64)
    b = b.reshape(b.shape[0], -1).astype(np.float64)
    cos = np.sum(a * b, axis=1) / (
        np.linalg.norm(a, axis=1) * np.linalg.norm(b, axis=1) + 1e-12
    )
    return float(np.max(1.0 - cos))


def _state_dict(model):
    return {k: v.detach().numpy() for k, v in model.state_dict().items()}


@pytest.fixture(scope="module")
def bert_pair():
    torch.manual_seed(0)
    hf_cfg = transformers.BertConfig(
        vocab_size=30522, hidden_size=384, num_hidden_layers=6,
        num_attention_heads=12, intermediate_size=1536,
        hidden_dropout_prob=0.0, attention_probs_dropout_prob=0.0,
    )
    model = transformers.BertModel(hf_cfg).eval()
    params = convert.convert_bert(_state_dict(model), jbert.MINILM_L6)
    return model, params


def _token_batch(rng, b=3, s=24, vocab=30522):
    ids = rng.integers(5, vocab, (b, s)).astype(np.int32)
    mask = np.ones((b, s), np.int32)
    mask[1, 10:] = 0  # ragged padding exercises mask semantics
    mask[2, 5:] = 0
    ids[mask == 0] = 0
    return ids, mask


def test_bert_hidden_parity(bert_pair, rng):
    model, params = bert_pair
    ids, mask = _token_batch(rng)
    with torch.no_grad():
        want = model(
            input_ids=torch.tensor(ids.astype(np.int64)),
            attention_mask=torch.tensor(mask.astype(np.int64)),
        ).last_hidden_state.numpy()
    # erf gelu for the elementwise hidden-state comparison (torch uses erf;
    # the runtime default is the tanh approximation, whose *embedding-level*
    # drift is 3e-7 cosine — asserted in test_gelu_approx_embedding_drift)
    exact_cfg = jbert.BertConfig(gelu_approximate=False)
    got = np.asarray(jbert.bert_encode(params, jnp.asarray(ids), jnp.asarray(mask), exact_cfg))
    # Compare only unpadded positions (HF computes garbage at padded slots too,
    # but those are excluded by pooling).
    sel = mask.astype(bool)
    np.testing.assert_allclose(got[sel], want[sel], atol=2e-4)
    assert _cosine_drift(got[sel], want[sel]) < 1e-3


def test_gelu_approx_embedding_drift(bert_pair, rng):
    """The tanh-gelu fast path must stay deep inside the 1e-3 cosine budget
    at the embedding level (measured 3e-7 on-chip)."""

    _model, params = bert_pair
    ids, mask = _token_batch(rng)
    exact = np.asarray(jbert.minilm_embed(
        params, jnp.asarray(ids), jnp.asarray(mask),
        jbert.BertConfig(gelu_approximate=False)))
    approx = np.asarray(jbert.minilm_embed(
        params, jnp.asarray(ids), jnp.asarray(mask),
        jbert.BertConfig(gelu_approximate=True)))
    assert _cosine_drift(exact, approx) < 1e-5


def test_minilm_sentence_embedding_parity(bert_pair, rng):
    model, params = bert_pair
    ids, mask = _token_batch(rng)
    with torch.no_grad():
        hidden = model(
            input_ids=torch.tensor(ids.astype(np.int64)),
            attention_mask=torch.tensor(mask.astype(np.int64)),
        ).last_hidden_state
        m = torch.tensor(mask, dtype=torch.float32).unsqueeze(-1)
        pooled = (hidden * m).sum(1) / m.sum(1).clamp(min=1e-9)
        want = torch.nn.functional.normalize(pooled, dim=-1).numpy()
    got = np.asarray(jbert.minilm_embed(params, jnp.asarray(ids), jnp.asarray(mask)))
    assert got.shape == (3, 384)
    np.testing.assert_allclose(np.linalg.norm(got, axis=1), 1.0, atol=1e-5)
    assert _cosine_drift(got, want) < 1e-3
    np.testing.assert_allclose(got, want, atol=1e-4)


def test_cross_encoder_parity(rng):
    torch.manual_seed(1)
    hf_cfg = transformers.BertConfig(
        vocab_size=30522, hidden_size=384, num_hidden_layers=6,
        num_attention_heads=12, intermediate_size=1536, num_labels=1,
        hidden_dropout_prob=0.0, attention_probs_dropout_prob=0.0,
    )
    model = transformers.BertForSequenceClassification(hf_cfg).eval()
    params = convert.convert_cross_encoder(_state_dict(model), jbert.MINILM_L6)
    ids, mask = _token_batch(rng)
    tt = np.zeros_like(ids)
    tt[:, 12:] = 1  # segment B
    with torch.no_grad():
        want = model(
            input_ids=torch.tensor(ids.astype(np.int64)),
            attention_mask=torch.tensor(mask.astype(np.int64)),
            token_type_ids=torch.tensor(tt.astype(np.int64)),
        ).logits.numpy()[:, 0]
    got = np.asarray(
        jbert.cross_encoder_score(
            params, jnp.asarray(ids), jnp.asarray(mask), jnp.asarray(tt)
        )
    )
    np.testing.assert_allclose(got, want, atol=2e-4)


@pytest.fixture(scope="module")
def clip_pair():
    torch.manual_seed(2)
    hf_cfg = transformers.CLIPConfig()  # defaults = ViT-B/32 geometry
    model = transformers.CLIPModel(hf_cfg).eval()
    params = convert.convert_clip(_state_dict(model), jclip.CLIP_VIT_B32)
    return model, params


def test_clip_image_parity(clip_pair, rng):
    model, params = clip_pair
    pixels = rng.standard_normal((2, 224, 224, 3)).astype(np.float32)
    with torch.no_grad():
        want = model.get_image_features(
            pixel_values=torch.tensor(pixels.transpose(0, 3, 1, 2))
        ).numpy()
    got = np.asarray(jclip.clip_image_features(params, jnp.asarray(pixels)))
    assert got.shape == (2, 512)
    assert _cosine_drift(got, want) < 1e-3
    np.testing.assert_allclose(got, want, atol=2e-3)


def test_clip_text_parity(clip_pair, rng):
    model, params = clip_pair
    b, s = 3, 16
    ids = rng.integers(1, 49406, (b, s)).astype(np.int32)
    ids[:, 0] = 49406  # BOT
    eot_pos = [s - 1, 9, 12]
    mask = np.zeros((b, s), np.int32)
    for i, pos in enumerate(eot_pos):
        ids[i, pos] = 49407  # EOT (largest id -> argmax pooling)
        ids[i, pos + 1 :] = 0
        mask[i, : pos + 1] = 1
    with torch.no_grad():
        want = model.get_text_features(
            input_ids=torch.tensor(ids.astype(np.int64)),
            attention_mask=torch.tensor(mask.astype(np.int64)),
        ).numpy()
    got = np.asarray(
        jclip.clip_text_features(params, jnp.asarray(ids), jnp.asarray(mask))
    )
    assert got.shape == (b, 512)
    assert _cosine_drift(got, want) < 1e-3
    np.testing.assert_allclose(got, want, atol=2e-3)


def test_bf16_compute_within_judge_tolerance(bert_pair, rng):
    """bf16 matmuls (the TPU fast path) must stay within 1e-3 cosine drift."""

    model, params = bert_pair
    ids, mask = _token_batch(rng)
    f32 = np.asarray(jbert.minilm_embed(params, jnp.asarray(ids), jnp.asarray(mask)))
    b16 = np.asarray(
        jbert.minilm_embed(
            params, jnp.asarray(ids), jnp.asarray(mask), compute_dtype=jnp.bfloat16
        )
    )
    assert _cosine_drift(f32, b16) < 1e-3


def test_params_roundtrip(tmp_path, bert_pair):
    _, params = bert_pair
    convert.save_params(params, str(tmp_path), "minilm", meta={"model": "test"})
    assert convert.params_available(str(tmp_path), "minilm")
    loaded = convert.load_params(str(tmp_path), "minilm")
    assert len(loaded["layers"]) == 6
    np.testing.assert_array_equal(
        np.asarray(loaded["layers"][3]["q"]["kernel"]),
        np.asarray(params["layers"][3]["q"]["kernel"]),
    )
