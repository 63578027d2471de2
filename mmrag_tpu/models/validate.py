"""Real-checkpoint validation battery (VERDICT r2 item 5).

The conversion path is parity-tested against random-init HF models in CI
(tests/test_model_parity.py), but an operator importing ACTUAL pretrained
checkpoints (MiniLM, CLIP, ms-marco, whisper — the models the reference
loads at ``/root/reference/app/ml/embeddings.py:23-43`` and
``app/ingest/youtube.py:150-166``) needs a one-command proof that the
converted weights reproduce the torch reference on THEIR files. This module
is that battery; ``python -m mmrag_tpu.models.cli validate`` drives it.

Per family it (1) loads the torch checkpoint, (2) derives the architecture
FROM the checkpoint config (never a preset guessed from the name — a tiny
or resized checkpoint validates through the identical code), (3) converts,
(4) measures:

  * embedding/score parity vs the torch forward — gate: cosine drift
    <= 1e-3 (the judge metric, BASELINE.md), scores atol 2e-3;
  * W8A8 accuracy — quantized-tower embedding cosine vs the converted f32
    tower and rerank ORDER preservation at the reference's depth-8 — the
    numbers that decide whether ``TPU_ENCODER_QUANT=int8`` is safe on these
    weights (activation outliers in trained checkpoints are the known risk);
  * PQ refined recall@10 on embeddings of a built-in text corpus through
    the converted MiniLM — whether ``TPU_INDEX_DTYPE=pq`` holds >= 0.9 on
    this checkpoint's embedding geometry (the quality-gate threshold's
    real-data companion).

Everything runs on small fixed probe batches, CPU-friendly; zero egress —
the caller supplies checkpoint files.
"""

from __future__ import annotations

import itertools
from dataclasses import asdict
from typing import Dict, List, Optional

import numpy as np

from . import bert as jbert
from . import clip as jclip
from . import convert

COSINE_GATE = 1e-3  # max drift vs torch (BASELINE.md judge metric)
W8A8_COSINE_GATE = 0.99
PQ_RECALL_GATE = 0.9


def cosine_drift(a: np.ndarray, b: np.ndarray) -> float:
    a = a.reshape(a.shape[0], -1).astype(np.float64)
    b = b.reshape(b.shape[0], -1).astype(np.float64)
    cos = np.sum(a * b, axis=1) / (
        np.linalg.norm(a, axis=1) * np.linalg.norm(b, axis=1) + 1e-12
    )
    return float(np.max(1.0 - cos))


def _mean_cosine(a: np.ndarray, b: np.ndarray) -> float:
    a = a / (np.linalg.norm(a, axis=-1, keepdims=True) + 1e-12)
    b = b / (np.linalg.norm(b, axis=-1, keepdims=True) + 1e-12)
    return float(np.mean(np.sum(a * b, axis=-1)))


def _state_dict(model) -> Dict[str, np.ndarray]:
    return {k: v.detach().cpu().numpy() for k, v in model.state_dict().items()}


def bert_config_from_hf(hf) -> jbert.BertConfig:
    """Architecture from the checkpoint, not a name-guessed preset."""

    return jbert.BertConfig(
        vocab_size=hf.vocab_size,
        hidden_size=hf.hidden_size,
        num_layers=hf.num_hidden_layers,
        num_heads=hf.num_attention_heads,
        intermediate_size=hf.intermediate_size,
        max_position=hf.max_position_embeddings,
        type_vocab_size=hf.type_vocab_size,
        layer_norm_eps=hf.layer_norm_eps,
        pad_token_id=hf.pad_token_id or 0,
    )


def clip_config_from_hf(hf) -> jclip.CLIPConfig:
    v, t = hf.vision_config, hf.text_config
    return jclip.CLIPConfig(
        vision=jclip.CLIPVisionConfig(
            image_size=v.image_size, patch_size=v.patch_size,
            hidden_size=v.hidden_size, num_layers=v.num_hidden_layers,
            num_heads=v.num_attention_heads,
            intermediate_size=v.intermediate_size,
            layer_norm_eps=v.layer_norm_eps,
        ),
        text=jclip.CLIPTextConfig(
            vocab_size=t.vocab_size, hidden_size=t.hidden_size,
            num_layers=t.num_hidden_layers, num_heads=t.num_attention_heads,
            intermediate_size=t.intermediate_size,
            max_position=t.max_position_embeddings,
            layer_norm_eps=t.layer_norm_eps,
        ),
        projection_dim=hf.projection_dim,
    )


def _probe_tokens(rng, b: int, s: int, vocab: int):
    ids = rng.integers(5, vocab, (b, s)).astype(np.int32)
    mask = np.ones((b, s), np.int32)
    if b > 1:
        mask[1, s // 2:] = 0  # ragged padding exercises mask semantics
    ids[mask == 0] = 0
    return ids, mask


def _probe_texts(n: int) -> List[str]:
    subjects = ["the mitochondria", "photosynthesis", "newton's law",
                "the ocean current", "a neural network", "the roman empire"]
    verbs = ["explains", "produces", "describes", "transforms", "regulates"]
    objects = ["cellular energy", "light into sugar", "classical mechanics",
               "global climate", "pattern recognition", "ancient trade"]
    combos = itertools.cycle(itertools.product(subjects, verbs, objects))
    return [f"{s} {v} {o} in chapter {i % 97}"
            for i, (s, v, o) in enumerate(itertools.islice(combos, n))]


def validate_minilm(source: str, pq_corpus: int = 4096) -> Dict:
    """Convert + parity + W8A8 cosine + PQ refined recall on real embeddings.

    Returns a report dict with measured numbers, per-check ``*_ok`` flags,
    the converted params (for the CLI to persist), and the derived config.
    """

    import jax.numpy as jnp
    import torch
    import transformers

    model = transformers.BertModel.from_pretrained(source).eval()
    cfg = bert_config_from_hf(model.config)
    params = convert.convert_bert(_state_dict(model), cfg)

    rng = np.random.default_rng(0)
    ids, mask = _probe_tokens(rng, 4, 48, cfg.vocab_size)
    with torch.no_grad():
        hidden = model(
            input_ids=torch.tensor(ids.astype(np.int64)),
            attention_mask=torch.tensor(mask.astype(np.int64)),
        ).last_hidden_state
        m = torch.tensor(mask, dtype=torch.float32).unsqueeze(-1)
        pooled = (hidden * m).sum(1) / m.sum(1).clamp(min=1e-9)
        want = torch.nn.functional.normalize(pooled, dim=-1).numpy()
    got = np.asarray(jbert.minilm_embed(
        params, jnp.asarray(ids), jnp.asarray(mask), cfg))
    drift = cosine_drift(got, want)

    q8 = jbert.quantize_bert(params)
    got_q8 = np.asarray(jbert.minilm_embed(
        params, jnp.asarray(ids), jnp.asarray(mask), cfg,
        compute_dtype=jnp.bfloat16, q8_layers=q8))
    w8a8_cos = _mean_cosine(got_q8, got)

    # PQ refined recall on THIS checkpoint's embedding geometry: embed a
    # templated corpus, code at the production m=16 (clamped to divide small
    # validation checkpoints' hidden size), refine, compare vs exact.
    from ..ops import pq as pqops
    from ..ops.topk import l2_normalize

    texts = _probe_texts(pq_corpus)

    def embed_many(texts_batch):
        import zlib

        toks = [t.split() for t in texts_batch]
        # deterministic hash-tokenization (crc32 — Python's hash() is
        # randomized per process, which would make the gate verdict flip
        # between runs of the same checkpoint) keeps this self-contained
        # for checkpoints without tokenizer files; PQ recall only needs the
        # checkpoint's embedding GEOMETRY, which the encoder defines
        s = max(len(t) for t in toks) + 2
        ids = np.zeros((len(toks), s), np.int32)
        mask = np.zeros((len(toks), s), np.int32)
        for i, t in enumerate(toks):
            ids[i, 0] = 101 % cfg.vocab_size
            for j, w in enumerate(t):
                ids[i, j + 1] = (
                    zlib.crc32(w.encode()) % (cfg.vocab_size - 10)
                ) + 5
            ids[i, len(t) + 1] = 102 % cfg.vocab_size
            mask[i, : len(t) + 2] = 1
        return np.asarray(jbert.minilm_embed(
            params, jnp.asarray(ids), jnp.asarray(mask), cfg))

    embs = np.concatenate([
        embed_many(texts[i : i + 256]) for i in range(0, len(texts), 256)
    ])
    emb_j = jnp.asarray(embs, jnp.float32)
    m_pq = 16 if cfg.hidden_size % 16 == 0 else 8
    books = pqops.train_pq(emb_j, m=m_pq)
    codes = pqops.pq_encode(emb_j, books)
    q = l2_normalize(
        emb_j[:16] + 0.05 * jnp.asarray(
            rng.standard_normal((16, cfg.hidden_size)), jnp.float32)
    )
    n = embs.shape[0]
    exact = np.asarray(q, np.float32) @ embs.T
    thr = np.partition(exact, n - 10, axis=1)[:, n - 10] - 1e-3
    s, ix = pqops.pq_topk(q, books, codes, jnp.ones((n,), bool), 160)
    rs, _ = pqops.refine_exact(
        np.asarray(q, np.float32), embs, np.asarray(ix), np.asarray(s), 10)
    pq_recall = float(np.mean(rs >= thr[:, None]))

    return {
        "family": "minilm",
        "config": asdict(cfg),
        "cosine_drift_vs_torch": drift,
        "parity_ok": drift <= COSINE_GATE,
        "w8a8_cosine_vs_f32": w8a8_cos,
        "w8a8_ok": w8a8_cos >= W8A8_COSINE_GATE,
        "pq_refined_recall_at_10": pq_recall,
        "pq_m": m_pq,
        "pq_ok": pq_recall >= PQ_RECALL_GATE,
        "_params": params,
        "_cfg": cfg,
    }


def validate_reranker(source: str) -> Dict:
    """Convert + score parity + W8A8 rerank-order preservation at depth 8."""

    import jax.numpy as jnp
    import torch
    import transformers

    model = transformers.BertForSequenceClassification.from_pretrained(
        source).eval()
    cfg = bert_config_from_hf(model.config)
    params = convert.convert_cross_encoder(_state_dict(model), cfg)

    rng = np.random.default_rng(1)
    depth = 8  # the reference's rerank_topk (config.py:48)
    ids, mask = _probe_tokens(rng, depth, 64, cfg.vocab_size)
    tt = np.zeros_like(ids)
    tt[:, 20:] = 1
    tt[mask == 0] = 0
    with torch.no_grad():
        want = model(
            input_ids=torch.tensor(ids.astype(np.int64)),
            attention_mask=torch.tensor(mask.astype(np.int64)),
            token_type_ids=torch.tensor(tt.astype(np.int64)),
        ).logits.numpy()[:, 0]
    got = np.asarray(jbert.cross_encoder_score(
        params, jnp.asarray(ids), jnp.asarray(mask), jnp.asarray(tt), cfg))
    max_abs = float(np.max(np.abs(got - want)))
    order_ok = bool((np.argsort(-got) == np.argsort(-want)).all())

    q8 = jbert.quantize_bert(params["bert"])
    got_q8 = np.asarray(jbert.cross_encoder_score(
        params, jnp.asarray(ids), jnp.asarray(mask), jnp.asarray(tt), cfg,
        compute_dtype=jnp.bfloat16, q8_layers=q8))
    w8a8_order_ok = bool((np.argsort(-got_q8) == np.argsort(-got)).all())

    return {
        "family": "reranker",
        "config": asdict(cfg),
        "score_max_abs_err_vs_torch": max_abs,
        "parity_ok": max_abs <= 2e-3 and order_ok,
        "order_preserved_vs_torch": order_ok,
        "w8a8_order_preserved": w8a8_order_ok,
        "w8a8_ok": w8a8_order_ok,
        "_params": params,
        "_cfg": cfg,
    }


def validate_clip(source: str) -> Dict:
    """Convert + image/text embedding parity + W8A8 vision-tower cosine."""

    import jax.numpy as jnp
    import torch
    import transformers

    model = transformers.CLIPModel.from_pretrained(source).eval()
    cfg = clip_config_from_hf(model.config)
    params = convert.convert_clip(_state_dict(model), cfg)

    rng = np.random.default_rng(2)
    v = cfg.vision
    pixels = rng.standard_normal(
        (2, v.image_size, v.image_size, 3)).astype(np.float32)
    with torch.no_grad():
        want_im = model.get_image_features(
            pixel_values=torch.tensor(pixels.transpose(0, 3, 1, 2))
        ).numpy()
    got_im = np.asarray(jclip.clip_image_features(
        params, jnp.asarray(pixels), cfg))
    drift_im = cosine_drift(got_im, want_im)

    t = cfg.text
    b, s = 3, min(16, t.max_position)
    t_hf = model.config.text_config
    bot, eot = t_hf.bos_token_id, t_hf.eos_token_id
    if eot <= bot:
        # our EOT pooling mirrors the CLIP vocab layout (EOT is the largest
        # id — clip.py clip_text_features); a checkpoint with a different
        # layout cannot serve the text tower correctly
        raise ValueError(
            f"clip text pooling assumes eos_token_id ({eot}) > "
            f"bos_token_id ({bot}) — the CLIP vocab layout"
        )
    ids = rng.integers(1, bot, (b, s)).astype(np.int32)
    ids[:, 0] = bot
    mask = np.zeros((b, s), np.int32)
    for i, pos in enumerate([s - 1, max(2, s // 2), max(3, s - 3)]):
        ids[i, pos] = eot
        ids[i, pos + 1:] = 0
        mask[i, : pos + 1] = 1
    with torch.no_grad():
        want_tx = model.get_text_features(
            input_ids=torch.tensor(ids.astype(np.int64)),
            attention_mask=torch.tensor(mask.astype(np.int64)),
        ).numpy()
    got_tx = np.asarray(jclip.clip_text_features(
        params, jnp.asarray(ids), jnp.asarray(mask), cfg))
    drift_tx = cosine_drift(got_tx, want_tx)

    q8 = jclip.quantize_clip_vision(params)
    got_q8 = np.asarray(jclip.clip_image_features(
        params, jnp.asarray(pixels), cfg, compute_dtype=jnp.bfloat16,
        q8_layers=q8))
    w8a8_cos = _mean_cosine(got_q8, got_im)

    return {
        "family": "clip",
        "config": {
            "vision": asdict(cfg.vision), "text": asdict(cfg.text),
            "projection_dim": cfg.projection_dim,
        },
        "image_cosine_drift_vs_torch": drift_im,
        "text_cosine_drift_vs_torch": drift_tx,
        "parity_ok": drift_im <= COSINE_GATE and drift_tx <= COSINE_GATE,
        "w8a8_cosine_vs_f32": w8a8_cos,
        "w8a8_ok": w8a8_cos >= W8A8_COSINE_GATE,
        "_params": params,
        "_cfg": cfg,
    }


def validate_whisper(source: str) -> Dict:
    """Convert + encoder-state and decoder-logit parity (token agreement)."""

    import jax.numpy as jnp
    import torch
    import transformers

    from . import whisper as jwhisper

    model = transformers.WhisperForConditionalGeneration.from_pretrained(
        source).eval().model
    hf = model.config
    cfg = jwhisper.WhisperConfig(
        num_mel_bins=hf.num_mel_bins,
        d_model=hf.d_model,
        encoder_layers=hf.encoder_layers,
        encoder_heads=hf.encoder_attention_heads,
        decoder_layers=hf.decoder_layers,
        decoder_heads=hf.decoder_attention_heads,
        ffn_dim=hf.encoder_ffn_dim,
        vocab_size=hf.vocab_size,
        max_source_positions=hf.max_source_positions,
        max_target_positions=hf.max_target_positions,
    )
    params = convert.convert_whisper(_state_dict(model), cfg)

    rng = np.random.default_rng(3)
    mel = rng.standard_normal(
        (2, cfg.max_source_positions * 2, cfg.num_mel_bins)
    ).astype(np.float32)
    with torch.no_grad():
        enc_t = model.encoder(
            input_features=torch.tensor(mel.transpose(0, 2, 1))
        ).last_hidden_state
    enc_j = jwhisper.whisper_encode(params, jnp.asarray(mel), cfg)
    drift_enc = cosine_drift(np.asarray(enc_j), enc_t.numpy())

    ids = rng.integers(0, cfg.vocab_size, (2, 7)).astype(np.int32)
    with torch.no_grad():
        hidden = model.decoder(
            input_ids=torch.tensor(ids.astype(np.int64)),
            encoder_hidden_states=enc_t,
        ).last_hidden_state
        want_logits = (hidden @ model.decoder.embed_tokens.weight.T).numpy()
    got_logits = np.asarray(jwhisper.whisper_decode_logits(
        params, jnp.asarray(ids), enc_j, cfg))
    token_agree = float(
        np.mean(got_logits.argmax(-1) == want_logits.argmax(-1)))

    return {
        "family": "whisper",
        "config": asdict(cfg),
        "encoder_cosine_drift_vs_torch": drift_enc,
        "decoder_token_agreement": token_agree,
        "parity_ok": drift_enc <= COSINE_GATE and token_agree == 1.0,
        "_params": params,
        "_cfg": cfg,
    }


VALIDATORS = {
    "minilm": validate_minilm,
    "clip": validate_clip,
    "reranker": validate_reranker,
    "whisper": validate_whisper,
}


def public_report(report: Dict) -> Dict:
    """Strip the non-serializable params/cfg carriers for printing."""

    return {k: v for k, v in report.items() if not k.startswith("_")}


def report_passed(report: Dict) -> bool:
    return all(v for k, v in report.items() if k.endswith("_ok"))
