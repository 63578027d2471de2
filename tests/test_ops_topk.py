"""cosine_topk / merge_topk: exactness vs numpy, masking, padding, dtype."""

import jax.numpy as jnp
import numpy as np
import pytest

from mmrag_tpu.ops.topk import cosine_topk, l2_normalize, merge_topk


def _np_topk(q, c, mask, k):
    scores = q @ c.T
    scores[:, ~mask] = -np.inf
    idx = np.argsort(-scores, axis=1)[:, :k]
    return np.take_along_axis(scores, idx, axis=1), idx


@pytest.mark.parametrize("n,d,k", [(64, 16, 5), (257, 32, 10)])
def test_matches_numpy(rng, n, d, k):
    q = rng.standard_normal((3, d)).astype(np.float32)
    c = rng.standard_normal((n, d)).astype(np.float32)
    q = np.asarray(l2_normalize(q))
    c = np.asarray(l2_normalize(c))
    mask = rng.random(n) > 0.3
    got_s, got_i = cosine_topk(jnp.asarray(q), jnp.asarray(c), jnp.asarray(mask), k)
    want_s, want_i = _np_topk(q.copy(), c, mask, k)
    np.testing.assert_array_equal(np.asarray(got_i), want_i)
    np.testing.assert_allclose(np.asarray(got_s), want_s, atol=1e-5)


def test_masked_rows_never_surface(rng):
    c = rng.standard_normal((20, 8)).astype(np.float32)
    q = c[3:4]  # exact match would win without mask
    mask = np.ones(20, dtype=bool)
    mask[3] = False
    _, idx = cosine_topk(jnp.asarray(q), jnp.asarray(c), jnp.asarray(mask), 5)
    assert 3 not in np.asarray(idx)


def test_k_larger_than_corpus_pads(rng):
    c = l2_normalize(jnp.asarray(rng.standard_normal((4, 8)), dtype=jnp.float32))
    q = c[:1]
    s, i = cosine_topk(q, c, jnp.ones(4, dtype=bool), k=10)
    assert s.shape == (1, 10) and i.shape == (1, 10)
    assert np.asarray(s)[0, 4:].max() <= -1e29  # filler entries sink


def test_all_masked_gives_sunk_scores(rng):
    c = jnp.asarray(rng.standard_normal((8, 4)), dtype=jnp.float32)
    s, _ = cosine_topk(c[:1], c, jnp.zeros(8, dtype=bool), 3)
    assert np.asarray(s).max() <= -1e29


def test_bf16_corpus_accumulates_f32(rng):
    c = l2_normalize(jnp.asarray(rng.standard_normal((128, 64)), dtype=jnp.float32))
    cb = c.astype(jnp.bfloat16)
    q = c[:2]
    s32, i32 = cosine_topk(q, c, jnp.ones(128, dtype=bool), 4)
    s16, i16 = cosine_topk(q, cb, jnp.ones(128, dtype=bool), 4)
    assert s16.dtype == jnp.float32
    np.testing.assert_allclose(np.asarray(s16), np.asarray(s32), atol=2e-2)


def test_merge_topk_equals_global(rng):
    q = rng.standard_normal((2, 8)).astype(np.float32)
    c = rng.standard_normal((40, 8)).astype(np.float32)
    mask = np.ones(40, dtype=bool)
    sa, ia = cosine_topk(jnp.asarray(q), jnp.asarray(c[:20]), jnp.asarray(mask[:20]), 6)
    sb, ib = cosine_topk(jnp.asarray(q), jnp.asarray(c[20:]), jnp.asarray(mask[20:]), 6)
    ms, mi = merge_topk(sa, ia, sb, ib + 20, 6)
    gs, gi = cosine_topk(jnp.asarray(q), jnp.asarray(c), jnp.asarray(mask), 6)
    np.testing.assert_allclose(np.asarray(ms), np.asarray(gs), atol=1e-5)
    np.testing.assert_array_equal(np.asarray(mi), np.asarray(gi))


def test_shape_validation():
    with pytest.raises(ValueError):
        cosine_topk(jnp.zeros((2, 3)), jnp.zeros((4, 5)), jnp.ones(4, bool), 2)
    with pytest.raises(ValueError):
        cosine_topk(jnp.zeros((2, 3)), jnp.zeros((4, 3)), jnp.ones(4, bool), 2, backend="bogus")


def test_approx_backend_high_recall(rng):
    n, d, k = 4096, 64, 10
    c = l2_normalize(jnp.asarray(rng.standard_normal((n, d)), jnp.float32))
    q = l2_normalize(jnp.asarray(rng.standard_normal((4, d)), jnp.float32))
    mask = jnp.asarray(rng.random(n) > 0.2)
    s_a, i_a = cosine_topk(q, c, mask, k, backend="approx")
    s_x, i_x = cosine_topk(q, c, mask, k, backend="xla")
    # approx_max_k honors the mask and hits >=80% recall on random data
    # (CPU lowering is exact; TPU PartialReduce is recall_target-bounded)
    recall = np.mean([
        len(set(np.asarray(i_a)[i].tolist()) & set(np.asarray(i_x)[i].tolist())) / k
        for i in range(4)
    ])
    assert recall >= 0.8
    masked = set(np.flatnonzero(~np.asarray(mask)).tolist())
    assert not (set(np.asarray(i_a).ravel().tolist()) & masked)


def test_auto_routes_batched_queries_to_pallas(rng, monkeypatch):
    """auto = pallas for q>=8 on tile-aligned corpora >= the 128k-row floor
    (off-CPU); small corpora, single queries, and unaligned corpora stay on
    the dense XLA path (below the floor lax.top_k is already micro-seconds,
    and XLA avoids the sporadic Mosaic client-poisoning hazard)."""

    import mmrag_tpu.ops.topk as T
    from mmrag_tpu.ops import pallas_topk as PT

    calls = []

    def spy(queries, corpus, valid_mask, k):
        # don't run the real kernel: default_backend is patched to "tpu",
        # which would disable interpret mode on this CPU host
        calls.append("pallas")
        return T._cosine_topk_xla(queries, corpus, valid_mask, k)

    monkeypatch.setattr(PT, "fused_cosine_topk", spy)
    monkeypatch.setattr(T.jax, "default_backend", lambda: "tpu")
    n = 131072  # the auto floor (64 TILE_N tiles)
    c = l2_normalize(jnp.asarray(rng.standard_normal((n, 64)), jnp.float32))
    q = l2_normalize(jnp.asarray(rng.standard_normal((8, 64)), jnp.float32))
    mask = jnp.ones(n, dtype=bool)
    T.cosine_topk(q, c, mask, 5, backend="auto")
    assert calls == ["pallas"]
    # single query or unaligned corpus stays on the dense path
    T.cosine_topk(q[:1], c, mask, 5, backend="auto")
    T.cosine_topk(q, c[: n - 5], mask[: n - 5], 5, backend="auto")
    assert calls == ["pallas"]
    # a tile-aligned corpus below the floor stays on the dense path too
    small = 2 * PT.TILE_N
    T.cosine_topk(q, c[:small], mask[:small], 5, backend="auto")
    assert calls == ["pallas"]
