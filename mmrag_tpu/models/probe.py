"""Real-checkpoint discovery + conversion (VERDICT r3 item 4).

The reference's value rests on four real checkpoints loaded at
``/root/reference/app/ml/embeddings.py:23-43`` and
``/root/reference/app/ingest/youtube.py:154-166``; this build environment
has zero egress, so every parity number so far is measured on seeded init.
This module is the standing probe that upgrades everything automatically
the day real weights appear: ``find_real_checkpoints`` discovers
provisioned torch checkpoints (flat dir or HF hub cache layout), and
``convert_found_into`` converts them into a ``WEIGHTS_DIR`` with the
architecture derived FROM each checkpoint so the production
:class:`~mmrag_tpu.models.runtime.EncoderRuntime` loads them instead of
seeded init. ``bench.py`` records the probe's outcome every run, and
``__graft_entry__.dryrun_multichip`` converts whatever the probe finds.
"""

from __future__ import annotations

import logging
import os
from typing import Dict, Optional

logger = logging.getLogger(__name__)

REAL_WEIGHT_FAMILIES = {
    # family -> the reference's checkpoint id
    "minilm": "sentence-transformers/all-MiniLM-L6-v2",
    "clip": "openai/clip-vit-base-patch32",
    "reranker": "cross-encoder/ms-marco-MiniLM-L-6-v2",
    "whisper": "openai/whisper-base",
}

TOKENIZER_FILES = (
    "vocab.txt", "vocab.json", "merges.txt", "tokenizer.json",
    "tokenizer_config.json", "special_tokens_map.json",
    "preprocessor_config.json",
)


def copy_tokenizer_files(src_dir: str, out: str,
                         names=TOKENIZER_FILES) -> None:
    """Copy whatever tokenizer files the checkpoint ships into the
    converted-weights dir (shared by the convert CLI and the probe)."""

    import shutil

    for name in names:
        path = os.path.join(src_dir, name)
        if os.path.isfile(path):
            shutil.copy2(path, os.path.join(out, name))


def _has_weights(d: str) -> bool:
    if not os.path.isfile(os.path.join(d, "config.json")):
        return False
    return any(
        os.path.isfile(os.path.join(d, w))
        for w in ("pytorch_model.bin", "model.safetensors"))


def find_real_checkpoints() -> Dict[str, str]:
    """Probe for the four real reference checkpoints.

    Looks in ``TPU_REAL_WEIGHTS_DIR`` (a dir of per-model subdirs, named by
    HF id with ``/``, ``--``, or ``__`` separators, or the bare model name)
    and the HF hub cache (``$HF_HOME/hub`` or ``~/.cache/huggingface/hub``
    snapshot layout). Returns {family: loadable_torch_checkpoint_dir} for
    every family whose dir holds a config.json plus torch weights; empty
    when the environment has none provisioned.
    """

    found: Dict[str, str] = {}
    roots = []
    if os.environ.get("TPU_REAL_WEIGHTS_DIR"):
        roots.append(os.environ["TPU_REAL_WEIGHTS_DIR"])
    hf_home = os.environ.get(
        "HF_HOME", os.path.expanduser("~/.cache/huggingface"))
    hub = os.path.join(hf_home, "hub")
    for fam, model_id in REAL_WEIGHT_FAMILIES.items():
        candidates = []
        for root in roots:
            candidates += [
                os.path.join(root, model_id),
                os.path.join(root, model_id.replace("/", "--")),
                os.path.join(root, model_id.replace("/", "__")),
                os.path.join(root, model_id.split("/")[-1]),
            ]
        snap_root = os.path.join(
            hub, "models--" + model_id.replace("/", "--"), "snapshots")
        if os.path.isdir(snap_root):
            def safe_mtime(p: str) -> float:
                try:
                    return os.path.getmtime(p)
                except OSError:  # dangling entry in a partially-GC'd cache
                    return 0.0

            try:
                entries = os.listdir(snap_root)
            except OSError:
                entries = []
            candidates += sorted(
                (os.path.join(snap_root, s) for s in entries),
                key=safe_mtime, reverse=True)
        for cand in candidates:
            if os.path.isdir(cand) and _has_weights(cand):
                found[fam] = cand
                break
    return found


def _state_numpy(model) -> Dict[str, object]:
    """torch state dict -> numpy arrays (the conversion layer's input
    contract; one definition shared by every converter in this module)."""

    return {k: v.detach().cpu().numpy()
            for k, v in model.state_dict().items()}


def convert_whisper_checkpoint(src: str, weights_dir: str,
                               model_id: str = "openai/whisper-base"):
    """Convert a provisioned torch whisper checkpoint into the production
    ``WEIGHTS_DIR`` layout the ASR runtime loads
    (``<weights_dir>/<id with '/'->'__'>/model.npz`` + arch meta +
    vocab.json, the byte-level BPE detokenizer the aligner rung needs).
    The architecture is derived FROM the checkpoint — a preset guessed
    from the name would silently read a layer-prefix of a bigger model.
    Returns the derived :class:`WhisperConfig`. Shared by the
    ``convert-whisper`` CLI and :func:`convert_found_into` (the reference
    loads whisper on the ASR ladder rungs,
    ``app/ingest/youtube.py:150-166``)."""

    import dataclasses

    import transformers

    from . import convert, whisper as jwhisper
    from .runtime import _sanitize

    model = transformers.WhisperForConditionalGeneration.from_pretrained(src)
    hf = model.config
    if hf.decoder_ffn_dim != hf.encoder_ffn_dim:
        raise ValueError("asymmetric encoder/decoder ffn dims are unsupported")
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
    params = convert.convert_whisper(_state_numpy(model), cfg)
    out = os.path.join(weights_dir, _sanitize(model_id))
    os.makedirs(out, exist_ok=True)
    convert.save_params(
        params, out, "model",
        meta={"arch": "whisper", "config": dataclasses.asdict(cfg),
              "source": src})
    try:
        # vocab.json drives the ByteLevelBPEDecoder (word alignment)
        transformers.AutoTokenizer.from_pretrained(src).save_vocabulary(out)
    except Exception:  # raw checkpoint without tokenizer config
        copy_tokenizer_files(src, out)
    return cfg


def convert_found_into(weights_dir: str,
                       found: Dict[str, str],
                       families: Optional[tuple] = None) -> Dict[str, object]:
    """Convert provisioned checkpoints into ``weights_dir`` in the
    production layout (``<weights_dir>/<model_id with '/'->'__'>/model.npz``
    plus tokenizer files), deriving each architecture from its checkpoint.

    Returns {family: derived_config} for the converted families so callers
    (e.g. the multichip dryrun) can hand the real configs to
    :class:`EncoderRuntime` instead of seeded-init presets; the whisper
    family converts into the layout :mod:`mmrag_tpu.ingest.asr` loads.
    A family whose conversion fails is skipped (logged), never fatal —
    one bad checkpoint must not take down the probe's upgrade path.
    """

    import transformers

    from . import convert
    from . import validate as val
    from .runtime import _sanitize

    def out_dir(fam: str) -> str:
        return os.path.join(weights_dir, _sanitize(REAL_WEIGHT_FAMILIES[fam]))

    converted: Dict[str, object] = {}
    for fam in families or ("minilm", "clip", "reranker", "whisper"):
        src = found.get(fam)
        if not src:
            continue
        logger.info("converting real %s checkpoint from %s", fam, src)
        try:
            if fam == "whisper":
                converted[fam] = convert_whisper_checkpoint(
                    src, weights_dir, REAL_WEIGHT_FAMILIES[fam])
                continue
            if fam == "minilm":
                model = transformers.BertModel.from_pretrained(src).eval()
                cfg = val.bert_config_from_hf(model.config)
                params = convert.convert_bert(_state_numpy(model), cfg)
            elif fam == "reranker":
                model = (transformers.BertForSequenceClassification
                         .from_pretrained(src).eval())
                cfg = val.bert_config_from_hf(model.config)
                params = convert.convert_cross_encoder(
                    _state_numpy(model), cfg)
            else:  # clip
                model = transformers.CLIPModel.from_pretrained(src).eval()
                cfg = val.clip_config_from_hf(model.config)
                params = convert.convert_clip(_state_numpy(model), cfg)
            out = out_dir(fam)
            os.makedirs(out, exist_ok=True)
            convert.save_params(params, out, "model",
                                meta={"arch": fam, "source": src})
            copy_tokenizer_files(src, out)
        except Exception:
            # the skip-never-fatal invariant covers the WRITE side too
            # (disk full, unwritable weights_dir): one bad family must not
            # take down the probe's whole upgrade path
            logger.exception("conversion of %s checkpoint failed; skipping",
                             fam)
            continue
        converted[fam] = cfg
    return converted
