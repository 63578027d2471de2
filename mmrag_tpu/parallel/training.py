"""Sharded fine-tuning steps for every served model family (DP x TP).

The reference never trains (its ``CHECKPOINT_DIR`` is configured-but-unused,
SURVEY §5); a production multimodal retrieval stack needs domain fine-tuning
of its towers, so this framework ships TPU-first training steps for all
three: CLIP (symmetric InfoNCE), the MiniLM bi-encoder
(multiple-negatives ranking — the objective sentence-transformers used to
train it), and the cross-encoder reranker (pointwise sigmoid relevance).
Common structure:

  * batch sharded over ``data`` (images + token ids);
  * params laid out by :func:`mmrag_tpu.parallel.mesh.param_sharding_rules`
    (Megatron-style TP over ``model`` when the axis is >1, replicated
    otherwise) — XLA inserts the psums from the shardings;
  * symmetric InfoNCE loss with a global similarity matrix: local features
    are all-gathered implicitly by the replicated loss computation under
    ``jit`` + shardings (no hand-written collectives);
  * optax adamw, gradients reduced across ``data`` automatically.

One function pair: :func:`make_train_step` builds the jitted step;
:func:`train_state_init` builds params+opt state with the right placements.
"""

from __future__ import annotations

from typing import Any, Callable, Dict, Tuple

import jax
import jax.numpy as jnp
import optax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..models import bert as jbert
from ..models import clip as jclip
from .mesh import DATA_AXIS, shard_params


def clip_contrastive_loss(
    params: Dict[str, Any],
    images: jnp.ndarray,  # (b, s, s, 3) f32 normalized pixels
    input_ids: jnp.ndarray,  # (b, 77) int32
    attention_mask: jnp.ndarray,
    cfg: jclip.CLIPConfig,
    compute_dtype=jnp.float32,
) -> jnp.ndarray:
    from ..ops.topk import l2_normalize  # zero-safe (eps-guarded) variant

    # attention_impl="xla": the fused Pallas kernels have no VJP, and the
    # auto gate would pick them at production batch sizes on TPU — training
    # must stay on the differentiable einsum path.
    img = l2_normalize(jclip.clip_image_features(
        params, images, cfg, compute_dtype, attention_impl="xla"))
    txt = l2_normalize(jclip.clip_text_features(
        params, input_ids, attention_mask, cfg, compute_dtype,
        attention_impl="xla"))
    scale = jnp.exp(params["logit_scale"])
    logits = scale * img @ txt.T  # (b, b) global similarity
    labels = jnp.arange(logits.shape[0])
    loss_i = optax.softmax_cross_entropy_with_integer_labels(logits, labels)
    loss_t = optax.softmax_cross_entropy_with_integer_labels(logits.T, labels)
    return (loss_i.mean() + loss_t.mean()) / 2.0


def train_state_init(
    rng: jax.Array,
    mesh: Mesh,
    cfg: jclip.CLIPConfig = jclip.CLIP_VIT_B32,
    learning_rate: float = 1e-5,
) -> Tuple[Dict, optax.OptState, optax.GradientTransformation]:
    params = jclip.init_clip_params(rng, cfg)
    params = shard_params(params, mesh)
    tx = optax.adamw(learning_rate)
    opt_state = tx.init(params)
    return params, opt_state, tx


def make_train_step(
    mesh: Mesh,
    tx: optax.GradientTransformation,
    cfg: jclip.CLIPConfig = jclip.CLIP_VIT_B32,
    compute_dtype=jnp.float32,
) -> Callable:
    """Jitted (params, opt_state, batch) -> (params, opt_state, loss) with
    batch inputs sharded over ``data``."""

    batch_sharding = NamedSharding(mesh, P(DATA_AXIS))

    def step(params, opt_state, images, input_ids, attention_mask):
        loss, grads = jax.value_and_grad(clip_contrastive_loss)(
            params, images, input_ids, attention_mask, cfg, compute_dtype
        )
        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss

    return jax.jit(
        step,
        in_shardings=(None, None, batch_sharding, batch_sharding, batch_sharding),
        donate_argnums=(0, 1),
    )


# ---------------------------------------------------------------------------
# MiniLM bi-encoder: multiple-negatives ranking (InfoNCE over in-batch pairs)
# ---------------------------------------------------------------------------


def minilm_mnr_loss(
    params: Dict[str, Any],
    query_ids: jnp.ndarray,  # (b, s) int32
    query_mask: jnp.ndarray,
    pos_ids: jnp.ndarray,  # (b, s) positives; other rows = in-batch negatives
    pos_mask: jnp.ndarray,
    cfg: jbert.BertConfig = jbert.MINILM_L6,
    compute_dtype=jnp.float32,
    temperature: float = 0.05,
) -> jnp.ndarray:
    q = jbert.minilm_embed(params, query_ids, query_mask, cfg, compute_dtype,
                           attention_impl="xla")
    p = jbert.minilm_embed(params, pos_ids, pos_mask, cfg, compute_dtype,
                           attention_impl="xla")
    logits = (q @ p.T) / temperature  # (b, b) global similarity
    labels = jnp.arange(logits.shape[0])
    return optax.softmax_cross_entropy_with_integer_labels(logits, labels).mean()


def minilm_train_state_init(
    rng: jax.Array,
    mesh: Mesh,
    cfg: jbert.BertConfig = jbert.MINILM_L6,
    learning_rate: float = 2e-5,
) -> Tuple[Dict, optax.OptState, optax.GradientTransformation]:
    params = jbert.init_bert_params(rng, cfg)
    params = shard_params(params, mesh)
    tx = optax.adamw(learning_rate)
    return params, tx.init(params), tx


def make_minilm_train_step(
    mesh: Mesh,
    tx: optax.GradientTransformation,
    cfg: jbert.BertConfig = jbert.MINILM_L6,
    compute_dtype=jnp.float32,
) -> Callable:
    batch_sharding = NamedSharding(mesh, P(DATA_AXIS))

    def step(params, opt_state, q_ids, q_mask, p_ids, p_mask):
        loss, grads = jax.value_and_grad(minilm_mnr_loss)(
            params, q_ids, q_mask, p_ids, p_mask, cfg, compute_dtype
        )
        updates, opt_state = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss

    return jax.jit(
        step,
        in_shardings=(None, None) + (batch_sharding,) * 4,
        donate_argnums=(0, 1),
    )


# ---------------------------------------------------------------------------
# Cross-encoder reranker: pointwise sigmoid relevance (ms-marco style)
# ---------------------------------------------------------------------------


def cross_encoder_loss(
    params: Dict[str, Any],
    input_ids: jnp.ndarray,  # (b, s) packed (query, passage) pairs
    attention_mask: jnp.ndarray,
    token_type_ids: jnp.ndarray,
    labels: jnp.ndarray,  # (b,) float {0, 1} relevance
    cfg: jbert.BertConfig = jbert.MINILM_L6,
    compute_dtype=jnp.float32,
) -> jnp.ndarray:
    logits = jbert.cross_encoder_score(
        params, input_ids, attention_mask, token_type_ids, cfg, compute_dtype,
        attention_impl="xla",
    )
    return optax.sigmoid_binary_cross_entropy(logits, labels).mean()


def cross_encoder_train_state_init(
    rng: jax.Array,
    mesh: Mesh,
    cfg: jbert.BertConfig = jbert.MINILM_L6,
    learning_rate: float = 2e-5,
) -> Tuple[Dict, optax.OptState, optax.GradientTransformation]:
    params = jbert.init_cross_encoder_params(rng, cfg)
    params = shard_params(params, mesh)
    tx = optax.adamw(learning_rate)
    return params, tx.init(params), tx


def make_cross_encoder_train_step(
    mesh: Mesh,
    tx: optax.GradientTransformation,
    cfg: jbert.BertConfig = jbert.MINILM_L6,
    compute_dtype=jnp.float32,
) -> Callable:
    batch_sharding = NamedSharding(mesh, P(DATA_AXIS))

    def step(params, opt_state, ids, mask, tt, labels):
        loss, grads = jax.value_and_grad(cross_encoder_loss)(
            params, ids, mask, tt, labels, cfg, compute_dtype
        )
        updates, opt_state = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss

    return jax.jit(
        step,
        in_shardings=(None, None) + (batch_sharding,) * 4,
        donate_argnums=(0, 1),
    )
