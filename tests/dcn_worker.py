"""Worker process for the two-process DCN rendezvous test.

Spawned (twice) by tests/test_dcn_multiprocess.py with MMRAG_COORDINATOR /
MMRAG_NUM_PROCESSES / MMRAG_PROCESS_ID set. Joins the cluster through the
production :func:`mmrag_tpu.parallel.mesh.initialize_multihost` path, builds
the global mesh spanning both processes' devices, and runs:

  1. a corpus-sharded top-k through :func:`sharded_topk_fn` where each
     process contributes its own row shard — the all_gather merge crosses
     the process boundary (the DCN analogue of the reference's API↔worker
     split, ``app/celery_app.py:5``);
  2. a DP matmul over a batch sharded across both processes, checked
     against the host-side product — the encoder-DP communication pattern.

Prints ``DCN_OK`` on success; any assertion kills the process non-zero.
"""

import os
import sys

os.environ.setdefault("XLA_FLAGS", "--xla_force_host_platform_device_count=2")

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import jax.numpy as jnp  # noqa: E402
from jax.sharding import NamedSharding, PartitionSpec as P  # noqa: E402


def main() -> None:
    from mmrag_tpu.parallel.mesh import (
        DATA_AXIS,
        build_mesh,
        initialize_multihost,
    )
    from mmrag_tpu.parallel.sharded_index import sharded_topk_fn

    assert initialize_multihost(), "coordinator env not honored"
    assert jax.process_count() == 2, jax.process_count()
    n_global = len(jax.devices())
    n_local = len(jax.local_devices())
    assert n_global == 2 * n_local, (n_global, n_local)

    mesh = build_mesh(model_parallel=1)
    pid = jax.process_index()

    # deterministic GLOBAL corpus both processes can construct; each process
    # materializes only the rows its local devices own
    n, d, k = 8 * n_global, 16, 3
    rng = np.random.default_rng(0)
    corpus = rng.standard_normal((n, d)).astype(np.float32)
    corpus /= np.linalg.norm(corpus, axis=1, keepdims=True)
    rows_per_proc = n // 2
    local_rows = corpus[pid * rows_per_proc : (pid + 1) * rows_per_proc]

    shard = NamedSharding(mesh, P(DATA_AXIS))
    repl = NamedSharding(mesh, P())
    corpus_g = jax.make_array_from_process_local_data(shard, local_rows)
    mask_g = jax.make_array_from_process_local_data(
        repl, np.ones((n,), bool)
    )
    queries = corpus[5:7] + 0.01 * rng.standard_normal((2, d)).astype(
        np.float32
    )
    queries_g = jax.make_array_from_process_local_data(
        repl, queries.astype(np.float32)
    )

    fn = sharded_topk_fn(mesh, k)
    scores, idx = fn(queries_g, corpus_g, mask_g)
    idx_h = np.asarray(idx)
    want = np.argsort(-(queries @ corpus.T), axis=1)[:, 0]
    assert idx_h[0, 0] == want[0] and idx_h[1, 0] == want[1], (idx_h, want)

    # DP pattern: batch sharded across both processes' devices, replicated
    # "params" — each device computes its batch shard, result gathers exact
    b = 4 * n_global
    x = rng.standard_normal((b, d)).astype(np.float32)
    w = rng.standard_normal((d, 8)).astype(np.float32)
    x_g = jax.make_array_from_process_local_data(
        shard, x[pid * (b // 2) : (pid + 1) * (b // 2)]
    )
    w_g = jax.make_array_from_process_local_data(repl, w)

    @jax.jit
    def dp_forward(x, w):
        return jnp.dot(x, w)

    out = dp_forward(x_g, w_g)
    # each process checks ITS addressable output shards against the host
    # product (the full output spans both processes)
    want_full = x @ w
    for s in out.addressable_shards:
        lo = s.index[0].start or 0
        np.testing.assert_allclose(
            np.asarray(s.data), want_full[lo : lo + s.data.shape[0]],
            rtol=1e-5, atol=1e-5,
        )

    print("DCN_OK", flush=True)


if __name__ == "__main__":
    main()
