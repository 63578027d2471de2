"""Sharded CLIP contrastive fine-tuning step (DP x TP over the mesh).

The reference never trains (its ``CHECKPOINT_DIR`` is configured-but-unused,
SURVEY §5); a production multimodal retrieval stack needs domain fine-tuning
of its towers, so this framework ships the training step TPU-first:

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
    img = jclip.clip_image_features(params, images, cfg, compute_dtype)
    txt = jclip.clip_text_features(params, input_ids, attention_mask, cfg, compute_dtype)
    img = img / jnp.linalg.norm(img, axis=-1, keepdims=True)
    txt = txt / jnp.linalg.norm(txt, axis=-1, keepdims=True)
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
