"""Weight conversion CLI: HF torch checkpoints -> mmrag_tpu .npz weight dirs.

Usage (requires the HF checkpoints locally — this environment is zero-egress,
so point at a pre-downloaded directory or hub cache):

    python -m mmrag_tpu.models.cli convert-minilm  <hf_dir_or_id> [--out DIR]
    python -m mmrag_tpu.models.cli convert-clip    <hf_dir_or_id> [--out DIR]
    python -m mmrag_tpu.models.cli convert-reranker <hf_dir_or_id> [--out DIR]
    python -m mmrag_tpu.models.cli convert-whisper <hf_dir_or_id> [--out DIR]

Writes ``WEIGHTS_DIR/<model-id>/model.npz`` plus tokenizer files
(``vocab.txt`` or ``vocab.json``+``merges.txt``) so
:class:`~mmrag_tpu.models.runtime.EncoderRuntime` picks them up and runs with
real weights at <=1e-3 cosine drift from the reference encoders (the
conversion path is validated against random-init HF models in
tests/test_model_parity.py; real checkpoints go through the identical code).
"""

from __future__ import annotations

import argparse
import os
import shutil
import sys

from ..settings import settings
from . import bert as jbert
from . import clip as jclip
from . import convert


from .runtime import _sanitize  # single shared definition


def _state_dict(model):
    return {k: v.detach().cpu().numpy() for k, v in model.state_dict().items()}


def _out_dir(args, model_id: str) -> str:
    base = args.out or settings.paths.weights_dir
    out = os.path.join(base, _sanitize(model_id))
    os.makedirs(out, exist_ok=True)
    return out


def _copy_tokenizer_files(src_dir: str, out: str, names) -> None:
    for name in names:
        path = os.path.join(src_dir, name)
        if os.path.exists(path):
            shutil.copy(path, os.path.join(out, name))


def convert_minilm(args) -> None:
    from transformers import AutoTokenizer, BertModel

    model = BertModel.from_pretrained(args.source)
    params = convert.convert_bert(_state_dict(model), jbert.MINILM_L6)
    out = _out_dir(args, args.model_id or "sentence-transformers/all-MiniLM-L6-v2")
    convert.save_params(params, out, "model", meta={"arch": "minilm-l6"})
    tok = AutoTokenizer.from_pretrained(args.source)
    tok.save_vocabulary(out)
    print(f"wrote {out}/model.npz")


def convert_reranker(args) -> None:
    from transformers import AutoTokenizer, BertForSequenceClassification

    model = BertForSequenceClassification.from_pretrained(args.source)
    params = convert.convert_cross_encoder(_state_dict(model), jbert.MINILM_L6)
    out = _out_dir(args, args.model_id or "cross-encoder/ms-marco-MiniLM-L-6-v2")
    convert.save_params(params, out, "model", meta={"arch": "bert-cross-encoder"})
    tok = AutoTokenizer.from_pretrained(args.source)
    tok.save_vocabulary(out)
    print(f"wrote {out}/model.npz")


def convert_clip(args) -> None:
    from transformers import CLIPModel, CLIPTokenizer

    model = CLIPModel.from_pretrained(args.source)
    params = convert.convert_clip(_state_dict(model), jclip.CLIP_VIT_B32)
    out = _out_dir(args, args.model_id or "openai/clip-vit-base-patch32")
    convert.save_params(params, out, "model", meta={"arch": "clip-vit-b32"})
    tok = CLIPTokenizer.from_pretrained(args.source)
    tok.save_vocabulary(out)
    print(f"wrote {out}/model.npz")


def convert_whisper(args) -> None:
    from transformers import AutoTokenizer, WhisperForConditionalGeneration

    from . import whisper as jwhisper

    model_id = args.model_id or "openai/whisper-base"
    model = WhisperForConditionalGeneration.from_pretrained(args.source)
    # derive the architecture from the checkpoint itself — a preset guessed
    # from the name would silently read a layer-prefix of a bigger model
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
    params = convert.convert_whisper(_state_dict(model), cfg)
    out = _out_dir(args, model_id)
    import dataclasses

    convert.save_params(
        params, out, "model",
        meta={"arch": "whisper", "config": dataclasses.asdict(cfg)},
    )
    tok = AutoTokenizer.from_pretrained(args.source)
    tok.save_vocabulary(out)  # vocab.json drives ByteLevelBPEDecoder
    print(f"wrote {out}/model.npz")


def main(argv=None) -> None:
    parser = argparse.ArgumentParser(prog="mmrag_tpu.models.cli")
    sub = parser.add_subparsers(dest="cmd", required=True)
    for name, fn in (
        ("convert-minilm", convert_minilm),
        ("convert-clip", convert_clip),
        ("convert-reranker", convert_reranker),
        ("convert-whisper", convert_whisper),
    ):
        p = sub.add_parser(name)
        p.add_argument("source", help="HF model id or local checkpoint dir")
        p.add_argument("--out", default=None, help="weights root (default WEIGHTS_DIR)")
        p.add_argument("--model-id", default=None, help="override target dir name")
        p.set_defaults(fn=fn)
    args = parser.parse_args(argv)
    try:
        args.fn(args)
    except ImportError as exc:
        print(f"missing dependency for conversion: {exc}", file=sys.stderr)
        raise SystemExit(2)


if __name__ == "__main__":
    main()
