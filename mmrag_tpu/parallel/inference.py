"""Data-parallel encoder inference over a device mesh.

SURVEY §2c maps the reference's torch minibatch loops
(``/root/reference/app/ml/embeddings.py:53,74,82``) to "DP over batch via
pjit/shard_map across chips" — this module is that mapping for the *serving/
ingest* direction (training DP lives in :mod:`mmrag_tpu.parallel.training`).

Params are replicated, the batch dim is sharded over the ``data`` axis, and
XLA runs one encoder forward per chip with no collectives on the forward
path (embeddings come back row-sharded; the host gathers lazily on
``np.asarray``). Batch sizes must be padded to a multiple of the data-axis
size — the caller's bucketed batching (``EncoderRuntime``) already produces
power-of-two batches, so this holds by construction.
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from .mesh import DATA_AXIS


def shard_batch_fn(
    mesh: Mesh,
    fn: Callable[..., jnp.ndarray],
    n_batch_args: int = 1,
) -> Callable[..., jnp.ndarray]:
    """Wrap ``fn(params, *batches) -> (b, d)`` for DP execution on ``mesh``.

    The first argument (params pytree) is replicated; the next
    ``n_batch_args`` arguments are sharded on dim 0 over the data axis; the
    output is row-sharded the same way. ``fn`` must be jit-compatible.

    Implemented as ``shard_map`` (per-device full forward on the local batch
    shard) rather than jit-autosharding: encoder forwards carry Pallas
    kernels on TPU and Mosaic custom calls cannot be GSPMD-partitioned.
    """

    from .sharded_index import shard_map

    jitted = jax.jit(
        shard_map(
            fn,
            mesh=mesh,
            in_specs=(P(),) + (P(DATA_AXIS),) * n_batch_args,
            out_specs=P(DATA_AXIS),
            check_rep=False,
        )
    )

    def wrapper(params, *batches):
        n_data = mesh.shape[DATA_AXIS]
        for b in batches[:n_batch_args]:
            if b.shape[0] % n_data != 0:
                raise ValueError(
                    f"batch dim {b.shape[0]} not divisible by data axis {n_data}"
                )
        return jitted(params, *batches)

    return wrapper


def dp_minilm_embed(mesh: Mesh, cfg=None, compute_dtype=jnp.bfloat16):
    """Replicated-params, batch-sharded MiniLM sentence embedding."""

    from ..models import bert

    bcfg = cfg or bert.MINILM_L6

    def fn(params, ids, mask):
        return bert.minilm_embed(params, ids, mask, bcfg, compute_dtype=compute_dtype)

    return shard_batch_fn(mesh, fn, n_batch_args=2)


def dp_clip_image_embed(mesh: Mesh, cfg=None, compute_dtype=jnp.bfloat16):
    """Replicated-params, batch-sharded CLIP image embedding with fused
    on-device preprocess (uint8 HWC in, L2-normalized 512-d out)."""

    from ..models import bert, clip
    from ..ops.images import preprocess_batch

    ccfg = cfg or clip.CLIP_VIT_B32

    def fn(params, images_u8):
        pixels = preprocess_batch(images_u8)
        feats = clip.clip_image_features(params, pixels, ccfg, compute_dtype=compute_dtype)
        return bert.l2_normalize(feats)

    return shard_batch_fn(mesh, fn, n_batch_args=1)
