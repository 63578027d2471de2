"""Device mesh construction + sharding rules.

The reference has no parallelism beyond torch minibatching (SURVEY §2c); this
module supplies the TPU-native axes:

  * ``data`` — batch DP for encoder throughput and corpus-row sharding of the
    vector index (the only "tensor parallelism" this workload needs: each
    chip scores its HBM shard, then a k-merge collective rides ICI).
  * ``model`` — optional TP for the encoder towers (vocab/MLP sharding),
    used by the fine-tuning step and available for larger model variants.

Multi-host: call ``jax.distributed.initialize`` before :func:`build_mesh`;
the mesh spans all processes' devices and XLA keeps collectives on ICI
(SURVEY §5 "distributed communication backend").
"""

from __future__ import annotations

import threading
from typing import Optional, Tuple

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"
MODEL_AXIS = "model"


def initialize_multihost(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> bool:
    """Join a multi-host JAX cluster over DCN (SURVEY §2c: data plane rides
    ICI via XLA collectives; DCN carries only control + this rendezvous).

    Reads ``MMRAG_COORDINATOR`` / ``MMRAG_NUM_PROCESSES`` / ``MMRAG_PROCESS_ID``
    when args are omitted; no-ops (returns False) when no coordinator is
    configured — single-host dev and CI need no setup. Call once, before
    :func:`build_mesh`; afterwards ``jax.devices()`` spans every host and the
    mesh builder lays the data axis across them.
    """

    import os

    coordinator_address = coordinator_address or os.environ.get("MMRAG_COORDINATOR")
    if not coordinator_address:
        return False
    env_np = os.environ.get("MMRAG_NUM_PROCESSES")
    env_pid = os.environ.get("MMRAG_PROCESS_ID")
    if num_processes is None:
        num_processes = int(env_np) if env_np else None
    if process_id is None:
        process_id = int(env_pid) if env_pid else None
    # defaulting to (1, 0) would make every pod host register as process 0
    # of a single-process cluster — require both or neither (None lets the
    # TPU runtime auto-detect on supported platforms)
    if (num_processes is None) != (process_id is None):
        raise ValueError(
            "MMRAG_NUM_PROCESSES and MMRAG_PROCESS_ID must be set together "
            "(or both omitted for TPU auto-detection)"
        )
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
    )
    return True


def build_mesh(
    n_devices: Optional[int] = None,
    model_parallel: int = 1,
    devices=None,
) -> Mesh:
    """Mesh of shape (data, model) over the first ``n_devices`` devices."""

    devices = list(devices if devices is not None else jax.devices())
    if n_devices is not None:
        devices = devices[:n_devices]
    n = len(devices)
    if n % model_parallel != 0:
        raise ValueError(f"{n} devices not divisible by model_parallel={model_parallel}")
    grid = np.asarray(devices).reshape(n // model_parallel, model_parallel)
    return Mesh(grid, (DATA_AXIS, MODEL_AXIS))


_engine_meshes: dict = {}
_engine_mesh_lock = threading.Lock()


def engine_data_mesh(cfg=None) -> Optional[Mesh]:
    """The mesh the *production engine* runs on (or ``None`` single-device).

    Reads ``cfg.tpu.data_parallel`` (``TPU_DATA_PARALLEL``): ``auto`` uses
    every visible device when there is more than one, ``off`` forces the
    single-device paths, an integer uses the first N devices. The mesh is
    data-axis-only (model_parallel=1 — encoder params are replicated; TP is
    the training path's concern) and cached per device count so every
    :class:`~mmrag_tpu.index.store.VectorIndex` /
    :class:`~mmrag_tpu.models.runtime.EncoderRuntime` in the process shares
    one mesh object (and therefore one jit cache per sharding).
    """

    setting = "auto"
    if cfg is not None:
        setting = cfg.tpu.data_parallel
    if setting == "off":
        return None
    avail = len(jax.devices())
    n = avail if setting == "auto" else min(int(setting), avail)
    if n < 2:
        return None
    with _engine_mesh_lock:
        mesh = _engine_meshes.get(n)
        if mesh is None:
            mesh = build_mesh(n_devices=n, model_parallel=1)
            _engine_meshes[n] = mesh
        return mesh


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def row_sharded(mesh: Mesh) -> NamedSharding:
    """Shard dim 0 across the data axis (corpus rows / batch)."""

    return NamedSharding(mesh, P(DATA_AXIS))


def batch_sharded(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P(DATA_AXIS))


def param_sharding_rules(path: Tuple[str, ...], mesh: Mesh) -> NamedSharding:
    """Tensor-parallel layout for encoder params (used when TP > 1).

    Megatron-style pairing: up-projections (ffn_in/fc1, q/k/v) split the
    output dim over ``model``; down-projections (ffn_out/fc2, attn_out)
    split the input dim, so each pair needs a single psum at the block
    output (XLA inserts it from the shardings). Embedding tables split the
    vocab/row dim. Everything else is replicated.
    """

    names = set(path)
    if {"ffn_in", "fc1", "q", "k", "v"} & names and path[-1] == "kernel":
        return NamedSharding(mesh, P(None, MODEL_AXIS))
    if {"ffn_in", "fc1", "q", "k", "v"} & names and path[-1] == "bias":
        return NamedSharding(mesh, P(MODEL_AXIS))
    if {"ffn_out", "fc2", "attn_out"} & names and path[-1] == "kernel":
        return NamedSharding(mesh, P(MODEL_AXIS, None))
    if {"word", "token_embedding"} & names:
        return NamedSharding(mesh, P(MODEL_AXIS, None))
    return NamedSharding(mesh, P())


def shard_params(params, mesh: Mesh):
    """Apply :func:`param_sharding_rules` over a param pytree."""

    def place(path, leaf):
        names = tuple(
            p.key if hasattr(p, "key") else str(getattr(p, "idx", p)) for p in path
        )
        return jax.device_put(leaf, param_sharding_rules(names, mesh))

    return jax.tree_util.tree_map_with_path(place, params)
