"""HF torch state_dict -> mmrag_tpu param-tree conversion + persistence.

The parity backbone (SURVEY §7 step 2): the reference's encoders are torch
(``/root/reference/app/ml/embeddings.py:23-43``); this module maps their
checkpoints tensor-by-tensor into our functional JAX trees so outputs agree
to <=1e-3 cosine drift (verified in tests against randomly-initialized HF
models built offline from configs — no downloads needed).

Input is a ``{name: np.ndarray}`` dict (``{k: v.detach().numpy() for k, v in
model.state_dict().items()}``). torch ``nn.Linear`` stores ``(out, in)``;
our dense kernels are ``(in, out)``, hence the transposes.

Persistence is flat ``.npz`` (fast mmap-able load, no framework dependency);
full training checkpoints use orbax via :mod:`mmrag_tpu.utils.checkpoint`.
"""

from __future__ import annotations

import json
import os
from typing import Any, Dict, Mapping

import jax.numpy as jnp
import numpy as np

from .bert import BertConfig
from .clip import CLIPConfig
from .whisper import WhisperConfig

Params = Dict[str, Any]
StateDict = Mapping[str, np.ndarray]


def _linear(sd: StateDict, prefix: str, bias: bool = True) -> Params:
    p: Params = {"kernel": jnp.asarray(np.ascontiguousarray(sd[f"{prefix}.weight"].T))}
    if bias:
        p["bias"] = jnp.asarray(sd[f"{prefix}.bias"])
    return p


def _ln(sd: StateDict, prefix: str) -> Params:
    return {
        "scale": jnp.asarray(sd[f"{prefix}.weight"]),
        "bias": jnp.asarray(sd[f"{prefix}.bias"]),
    }


# ---------------------------------------------------------------------------
# BERT / MiniLM
# ---------------------------------------------------------------------------


def convert_bert(sd: StateDict, cfg: BertConfig, prefix: str = "") -> Params:
    """Convert an HF ``BertModel`` state dict (optionally under ``prefix``)."""

    def k(name: str) -> str:
        return f"{prefix}{name}"

    params: Params = {
        "embeddings": {
            "word": jnp.asarray(sd[k("embeddings.word_embeddings.weight")]),
            "position": jnp.asarray(sd[k("embeddings.position_embeddings.weight")]),
            "token_type": jnp.asarray(sd[k("embeddings.token_type_embeddings.weight")]),
            "ln": _ln(sd, k("embeddings.LayerNorm")),
        },
        "layers": [],
    }
    for i in range(cfg.num_layers):
        base = k(f"encoder.layer.{i}")
        params["layers"].append(
            {
                "q": _linear(sd, f"{base}.attention.self.query"),
                "k": _linear(sd, f"{base}.attention.self.key"),
                "v": _linear(sd, f"{base}.attention.self.value"),
                "attn_out": _linear(sd, f"{base}.attention.output.dense"),
                "attn_ln": _ln(sd, f"{base}.attention.output.LayerNorm"),
                "ffn_in": _linear(sd, f"{base}.intermediate.dense"),
                "ffn_out": _linear(sd, f"{base}.output.dense"),
                "ffn_ln": _ln(sd, f"{base}.output.LayerNorm"),
            }
        )
    return params


def convert_cross_encoder(sd: StateDict, cfg: BertConfig) -> Params:
    """Convert HF ``BertForSequenceClassification`` (num_labels=1)."""

    return {
        "bert": convert_bert(sd, cfg, prefix="bert."),
        "pooler": _linear(sd, "bert.pooler.dense"),
        "classifier": _linear(sd, "classifier"),
    }


# ---------------------------------------------------------------------------
# CLIP
# ---------------------------------------------------------------------------


def _clip_encoder_layers(sd: StateDict, prefix: str, num_layers: int) -> list:
    layers = []
    for i in range(num_layers):
        base = f"{prefix}.layers.{i}"
        layers.append(
            {
                "ln1": _ln(sd, f"{base}.layer_norm1"),
                "q": _linear(sd, f"{base}.self_attn.q_proj"),
                "k": _linear(sd, f"{base}.self_attn.k_proj"),
                "v": _linear(sd, f"{base}.self_attn.v_proj"),
                "attn_out": _linear(sd, f"{base}.self_attn.out_proj"),
                "ln2": _ln(sd, f"{base}.layer_norm2"),
                "fc1": _linear(sd, f"{base}.mlp.fc1"),
                "fc2": _linear(sd, f"{base}.mlp.fc2"),
            }
        )
    return layers


def convert_clip(sd: StateDict, cfg: CLIPConfig) -> Params:
    """Convert an HF ``CLIPModel`` state dict."""

    v = cfg.vision
    patch_w = sd["vision_model.embeddings.patch_embedding.weight"]  # (h, 3, p, p)
    patch_kernel = jnp.asarray(
        np.ascontiguousarray(patch_w.reshape(v.hidden_size, -1).T)
    )
    # HF spells it "pre_layrnorm" (sic).
    pre_ln_key = (
        "vision_model.pre_layrnorm"
        if "vision_model.pre_layrnorm.weight" in sd
        else "vision_model.pre_layernorm"
    )
    return {
        "vision": {
            "class_embedding": jnp.asarray(sd["vision_model.embeddings.class_embedding"]),
            "patch_kernel": patch_kernel,
            "position_embedding": jnp.asarray(
                sd["vision_model.embeddings.position_embedding.weight"]
            ),
            "pre_ln": _ln(sd, pre_ln_key),
            "layers": _clip_encoder_layers(sd, "vision_model.encoder", v.num_layers),
            "post_ln": _ln(sd, "vision_model.post_layernorm"),
        },
        "text": {
            "token_embedding": jnp.asarray(
                sd["text_model.embeddings.token_embedding.weight"]
            ),
            "position_embedding": jnp.asarray(
                sd["text_model.embeddings.position_embedding.weight"]
            ),
            "layers": _clip_encoder_layers(sd, "text_model.encoder", cfg.text.num_layers),
            "final_ln": _ln(sd, "text_model.final_layer_norm"),
        },
        "visual_projection": _linear(sd, "visual_projection", bias=False),
        "text_projection": _linear(sd, "text_projection", bias=False),
        "logit_scale": jnp.asarray(sd["logit_scale"]),
    }


# ---------------------------------------------------------------------------
# Whisper
# ---------------------------------------------------------------------------


def _conv1d_kernel(sd: StateDict, prefix: str) -> Params:
    """torch ``Conv1d.weight`` (out, in, k) -> our unfold matmul kernel
    (k*in, out), k-major to match :func:`mmrag_tpu.models.whisper._unfold3`."""

    w = sd[f"{prefix}.weight"]
    kernel = np.ascontiguousarray(w.transpose(2, 1, 0).reshape(-1, w.shape[0]))
    return {"kernel": jnp.asarray(kernel), "bias": jnp.asarray(sd[f"{prefix}.bias"])}


def _whisper_attn(sd: StateDict, base: str) -> Params:
    return {
        "q": _linear(sd, f"{base}.q_proj"),
        "k": _linear(sd, f"{base}.k_proj", bias=False),
        "v": _linear(sd, f"{base}.v_proj"),
        "out": _linear(sd, f"{base}.out_proj"),
    }


def convert_whisper(sd: StateDict, cfg: "WhisperConfig") -> Params:
    """Convert an HF ``WhisperModel`` / ``WhisperForConditionalGeneration``
    state dict (``proj_out`` is tied to the token embedding, so it is never
    read)."""

    if "model.encoder.conv1.weight" in sd:  # ForConditionalGeneration wrapper
        sd = {k[len("model."):]: v for k, v in sd.items() if k.startswith("model.")}

    enc_layers = []
    for i in range(cfg.encoder_layers):
        base = f"encoder.layers.{i}"
        enc_layers.append({
            "ln1": _ln(sd, f"{base}.self_attn_layer_norm"),
            "attn": _whisper_attn(sd, f"{base}.self_attn"),
            "ln2": _ln(sd, f"{base}.final_layer_norm"),
            "fc1": _linear(sd, f"{base}.fc1"),
            "fc2": _linear(sd, f"{base}.fc2"),
        })
    dec_layers = []
    for i in range(cfg.decoder_layers):
        base = f"decoder.layers.{i}"
        dec_layers.append({
            "ln1": _ln(sd, f"{base}.self_attn_layer_norm"),
            "self_attn": _whisper_attn(sd, f"{base}.self_attn"),
            "ln_cross": _ln(sd, f"{base}.encoder_attn_layer_norm"),
            "cross_attn": _whisper_attn(sd, f"{base}.encoder_attn"),
            "ln2": _ln(sd, f"{base}.final_layer_norm"),
            "fc1": _linear(sd, f"{base}.fc1"),
            "fc2": _linear(sd, f"{base}.fc2"),
        })
    return {
        "encoder": {
            "conv1": _conv1d_kernel(sd, "encoder.conv1"),
            "conv2": _conv1d_kernel(sd, "encoder.conv2"),
            "positions": jnp.asarray(sd["encoder.embed_positions.weight"]),
            "layers": enc_layers,
            "final_ln": _ln(sd, "encoder.layer_norm"),
        },
        "decoder": {
            "token_embedding": jnp.asarray(sd["decoder.embed_tokens.weight"]),
            "positions": jnp.asarray(sd["decoder.embed_positions.weight"]),
            "layers": dec_layers,
            "final_ln": _ln(sd, "decoder.layer_norm"),
        },
    }


# ---------------------------------------------------------------------------
# Persistence: flat .npz with /-joined paths
# ---------------------------------------------------------------------------


def flatten_params(params: Params, prefix: str = "") -> Dict[str, np.ndarray]:
    flat: Dict[str, np.ndarray] = {}
    if isinstance(params, dict):
        for key, val in params.items():
            flat.update(flatten_params(val, f"{prefix}{key}/"))
    elif isinstance(params, (list, tuple)):
        for i, val in enumerate(params):
            flat.update(flatten_params(val, f"{prefix}{i}/"))
    else:
        flat[prefix[:-1]] = np.asarray(params)
    return flat


def unflatten_params(flat: Mapping[str, np.ndarray]) -> Params:
    tree: Dict[str, Any] = {}
    for path, val in flat.items():
        node = tree
        parts = path.split("/")
        for part in parts[:-1]:
            node = node.setdefault(part, {})
        node[parts[-1]] = jnp.asarray(val)
    return _listify(tree)


def _listify(node: Any) -> Any:
    if not isinstance(node, dict):
        return node
    if node and all(k.isdigit() for k in node):
        return [_listify(node[str(i)]) for i in range(len(node))]
    return {k: _listify(v) for k, v in node.items()}


def save_params(params: Params, directory: str, name: str, meta: Dict | None = None) -> str:
    os.makedirs(directory, exist_ok=True)
    path = os.path.join(directory, f"{name}.npz")
    np.savez(path, **flatten_params(params))
    if meta is not None:
        with open(os.path.join(directory, f"{name}.json"), "w") as fh:
            json.dump(meta, fh, indent=2, sort_keys=True)
    return path


def load_params(directory: str, name: str) -> Params:
    with np.load(os.path.join(directory, f"{name}.npz")) as data:
        return unflatten_params({k: data[k] for k in data.files})


def params_available(directory: str, name: str) -> bool:
    return os.path.exists(os.path.join(directory, f"{name}.npz"))
