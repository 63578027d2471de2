"""Pallas fused top-k: parity with the dense XLA path (interpret mode on CPU).

The kernel's correctness argument (every top-k element's bucket ranks in the
top-k buckets by max) is exercised end-to-end here against the dense XLA
reference on adversarial layouts: random masks, winners concentrated in one
bucket, sub-k valid counts, and the small-N fallback.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from mmrag_tpu.ops.pallas_topk import BUCKET, TILE_N, fused_cosine_topk
from mmrag_tpu.ops.topk import cosine_topk, l2_normalize

N = 2 * TILE_N  # two grid steps


def _mk(rng, n, d, q=3):
    c = np.asarray(l2_normalize(jnp.asarray(rng.standard_normal((n, d)), jnp.float32)))
    qs = np.asarray(l2_normalize(jnp.asarray(rng.standard_normal((q, d)), jnp.float32)))
    return jnp.asarray(qs), jnp.asarray(c)


@pytest.mark.parametrize("d", [128, 384])
def test_parity_with_xla(rng, d):
    q, c = _mk(rng, N, d)
    mask = jnp.asarray(rng.random(N) > 0.3)
    ps, pi = fused_cosine_topk(q, c, mask, 10)
    xs, xi = cosine_topk(q, c, mask, 10)
    np.testing.assert_array_equal(np.asarray(pi), np.asarray(xi))
    np.testing.assert_allclose(np.asarray(ps), np.asarray(xs), atol=1e-5)


def test_winners_concentrated_in_one_bucket(rng):
    # All k best rows inside a single 128-row bucket — the case a naive
    # one-per-bucket partition scheme would get wrong.
    q, c = _mk(rng, N, 128, q=1)
    c = np.array(c, copy=True)
    bucket_start = 7 * BUCKET
    qv = np.asarray(q[0])
    noise = rng.standard_normal(128).astype(np.float32)
    noise -= noise @ qv * qv  # orthogonal to the query
    noise /= np.linalg.norm(noise)
    eps = np.linspace(0.01, 0.3, 16).reshape(-1, 1)  # increasing off-axis tilt
    c[bucket_start : bucket_start + 16] = (1 - eps**2) ** 0.5 * qv + eps * noise
    mask = jnp.ones(N, dtype=bool)
    ps, pi = fused_cosine_topk(q, jnp.asarray(c), mask, 8)
    assert set(np.asarray(pi[0]).tolist()) == set(range(bucket_start, bucket_start + 8))
    assert np.asarray(ps)[0].min() > 0.9


def test_fewer_valid_than_k_sinks_fillers(rng):
    q, c = _mk(rng, N, 128, q=1)
    mask = np.zeros(N, dtype=bool)
    mask[[5, 999, 3000]] = True
    ps, pi = fused_cosine_topk(q, c, jnp.asarray(mask), 6)
    s = np.asarray(ps)[0]
    assert (s[3:] <= -1e29).all()
    assert set(np.asarray(pi)[0, :3].tolist()) == {5, 999, 3000}


def test_small_corpus_falls_back(rng):
    q, c = _mk(rng, 256, 64, q=2)
    mask = jnp.ones(256, dtype=bool)
    ps, pi = fused_cosine_topk(q, c, mask, 5)
    xs, xi = cosine_topk(q, c, mask, 5)
    np.testing.assert_array_equal(np.asarray(pi), np.asarray(xi))


def test_bf16_corpus(rng):
    q, c = _mk(rng, N, 128)
    cb = c.astype(jnp.bfloat16)
    mask = jnp.ones(N, dtype=bool)
    ps, pi = fused_cosine_topk(q, cb, mask, 5)
    xs, xi = cosine_topk(q, cb, mask, 5)
    np.testing.assert_allclose(np.asarray(ps), np.asarray(xs), atol=2e-2)


def test_backend_arg_routes_to_pallas(rng):
    q, c = _mk(rng, N, 128)
    mask = jnp.ones(N, dtype=bool)
    ps, pi = cosine_topk(q, c, mask, 5, backend="pallas")
    xs, xi = cosine_topk(q, c, mask, 5, backend="xla")
    np.testing.assert_array_equal(np.asarray(pi), np.asarray(xi))


def test_per_query_masks_parity(rng):
    q, c = _mk(rng, N, 128, q=3)
    mask2d = jnp.asarray(rng.random((3, N)) > 0.4)
    ps, pi = fused_cosine_topk(q, c, mask2d, 8)
    xs, xi = cosine_topk(q, c, mask2d, 8)
    np.testing.assert_array_equal(np.asarray(pi), np.asarray(xi))
    np.testing.assert_allclose(np.asarray(ps), np.asarray(xs), atol=1e-5)
    # masked rows never surface per query
    for qi in range(3):
        dead = set(np.flatnonzero(~np.asarray(mask2d)[qi]).tolist())
        assert not (set(np.asarray(pi)[qi].tolist()) & dead)
