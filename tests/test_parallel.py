"""Mesh, sharded top-k (vs single-device exactness), TP param layout, and the
sharded CLIP training step — all on the 8-virtual-CPU-device mesh."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mmrag_tpu.models import clip as jclip
from mmrag_tpu.ops.topk import cosine_topk, l2_normalize
from mmrag_tpu.parallel.mesh import (
    DATA_AXIS,
    MODEL_AXIS,
    build_mesh,
    param_sharding_rules,
    shard_params,
)
from mmrag_tpu.parallel.sharded_index import sharded_topk
from mmrag_tpu.parallel.training import make_train_step, train_state_init

from tiny import TINY_CLIP


def test_eight_virtual_devices():
    assert len(jax.devices()) == 8


def test_build_mesh_shapes():
    mesh = build_mesh()
    assert mesh.shape == {DATA_AXIS: 8, MODEL_AXIS: 1}
    mesh2 = build_mesh(model_parallel=2)
    assert mesh2.shape == {DATA_AXIS: 4, MODEL_AXIS: 2}
    with pytest.raises(ValueError):
        build_mesh(n_devices=6, model_parallel=4)


def test_sharded_topk_matches_single_device(rng):
    mesh = build_mesh()
    n, d, k = 1024, 64, 7
    corpus = np.asarray(
        l2_normalize(jnp.asarray(rng.standard_normal((n, d)), jnp.float32))
    )
    queries = corpus[:3] + 0.01 * rng.standard_normal((3, d)).astype(np.float32)
    queries = np.asarray(l2_normalize(jnp.asarray(queries)))
    mask = rng.random(n) > 0.25

    want_s, want_i = cosine_topk(
        jnp.asarray(queries), jnp.asarray(corpus), jnp.asarray(mask), k
    )
    got_s, got_i = sharded_topk(
        jnp.asarray(queries), jnp.asarray(corpus), jnp.asarray(mask), k, mesh
    )
    np.testing.assert_allclose(np.asarray(got_s), np.asarray(want_s), atol=1e-5)
    np.testing.assert_array_equal(np.asarray(got_i), np.asarray(want_i))


def test_sharded_topk_rejects_ragged_rows(rng):
    mesh = build_mesh()
    with pytest.raises(ValueError):
        sharded_topk(
            jnp.zeros((1, 8)), jnp.zeros((1001, 8)), jnp.ones(1001, bool), 4, mesh
        )


def test_param_sharding_rules():
    mesh = build_mesh(model_parallel=2)
    up = param_sharding_rules(("layers", "0", "ffn_in", "kernel"), mesh)
    down = param_sharding_rules(("layers", "0", "ffn_out", "kernel"), mesh)
    emb = param_sharding_rules(("embeddings", "word"), mesh)
    ln = param_sharding_rules(("attn_ln", "scale"), mesh)
    assert up.spec == jax.sharding.PartitionSpec(None, MODEL_AXIS)
    assert down.spec == jax.sharding.PartitionSpec(MODEL_AXIS, None)
    assert emb.spec == jax.sharding.PartitionSpec(MODEL_AXIS, None)
    assert ln.spec == jax.sharding.PartitionSpec()


@pytest.fixture(scope="module")
def tiny_train_clip():
    # even tinier for the train step: small image + short text
    return jclip.CLIPConfig(
        vision=jclip.CLIPVisionConfig(
            image_size=32, patch_size=16, hidden_size=32, num_layers=2,
            num_heads=2, intermediate_size=64,
        ),
        text=jclip.CLIPTextConfig(
            vocab_size=512, hidden_size=32, num_layers=2, num_heads=2,
            intermediate_size=64, max_position=16,
        ),
        projection_dim=32,
    )


@pytest.mark.parametrize("model_parallel", [1, 2])
def test_sharded_train_step_runs_and_learns(tiny_train_clip, model_parallel, rng):
    cfg = tiny_train_clip
    mesh = build_mesh(model_parallel=model_parallel)
    params, opt_state, tx = train_state_init(
        jax.random.PRNGKey(0), mesh, cfg, learning_rate=1e-3
    )
    step = make_train_step(mesh, tx, cfg)
    b = 8
    images = jnp.asarray(rng.standard_normal((b, 32, 32, 3)), jnp.float32)
    ids = jnp.asarray(rng.integers(1, 500, (b, 16)), jnp.int32)
    mask = jnp.ones((b, 16), jnp.int32)

    losses = []
    for _ in range(15):
        params, opt_state, loss = step(params, opt_state, images, ids, mask)
        losses.append(float(loss))
    assert all(np.isfinite(losses))
    # same batch memorized -> loss drops (first adamw steps may overshoot)
    assert min(losses[-3:]) < losses[0]


def test_shard_params_places_on_mesh(tiny_train_clip):
    mesh = build_mesh(model_parallel=2)
    params = jclip.init_clip_params(jax.random.PRNGKey(0), tiny_train_clip)
    sharded = shard_params(params, mesh)
    fc1 = sharded["vision"]["layers"][0]["fc1"]["kernel"]
    assert fc1.sharding.spec == jax.sharding.PartitionSpec(None, MODEL_AXIS)


def test_dp_minilm_embed_matches_single_device(rng):
    import jax
    import jax.numpy as jnp

    from mmrag_tpu.models import bert
    from mmrag_tpu.parallel.inference import dp_minilm_embed
    from mmrag_tpu.parallel.mesh import build_mesh

    mesh = build_mesh(n_devices=8)
    params = bert.init_bert_params(jax.random.PRNGKey(0))
    ids = jnp.asarray(rng.integers(5, 30000, (16, 32)), jnp.int32)
    mask = jnp.ones((16, 32), jnp.int32)
    fn = dp_minilm_embed(mesh, compute_dtype=jnp.float32)
    got = np.asarray(fn(params, ids, mask))
    want = np.asarray(bert.minilm_embed(params, ids, mask))
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_dp_embed_rejects_ragged_batch(rng):
    import jax
    import jax.numpy as jnp

    from mmrag_tpu.models import bert
    from mmrag_tpu.parallel.inference import dp_minilm_embed
    from mmrag_tpu.parallel.mesh import build_mesh

    mesh = build_mesh(n_devices=8)
    params = bert.init_bert_params(jax.random.PRNGKey(0))
    fn = dp_minilm_embed(mesh)
    with pytest.raises(ValueError, match="not divisible"):
        fn(params, jnp.zeros((5, 8), jnp.int32), jnp.ones((5, 8), jnp.int32))


def test_dp_clip_image_embed_shards(rng):
    import jax
    import jax.numpy as jnp

    from mmrag_tpu.models import bert as jbert, clip as jclip
    from mmrag_tpu.parallel.inference import dp_clip_image_embed
    from mmrag_tpu.parallel.mesh import build_mesh

    cfg = jclip.CLIPConfig(
        vision=jclip.CLIPVisionConfig(
            image_size=32, patch_size=16, hidden_size=32, num_layers=2,
            num_heads=2, intermediate_size=64,
        ),
        text=jclip.CLIPTextConfig(
            vocab_size=512, hidden_size=32, num_layers=2, num_heads=2,
            intermediate_size=64, max_position=16,
        ),
        projection_dim=32,
    )
    mesh = build_mesh(n_devices=8)
    params = jclip.init_clip_params(jax.random.PRNGKey(1), cfg)
    pixels = jnp.asarray(rng.standard_normal((8, 32, 32, 3)), jnp.float32)
    from mmrag_tpu.parallel.inference import shard_batch_fn

    def fn(params, px):
        feats = jclip.clip_image_features(params, px, cfg)
        return jbert.l2_normalize(feats)

    dp_fn = shard_batch_fn(mesh, fn, n_batch_args=1)
    got = np.asarray(dp_fn(params, pixels))
    assert got.shape == (8, 32)
    np.testing.assert_allclose(np.linalg.norm(got, axis=1), 1.0, atol=1e-5)


def test_initialize_multihost_noop_without_coordinator(monkeypatch):
    from mmrag_tpu.parallel.mesh import initialize_multihost

    monkeypatch.delenv("MMRAG_COORDINATOR", raising=False)
    assert initialize_multihost() is False  # single-host: no-op


def test_sharded_topk_int8(rng):
    import jax.numpy as jnp

    from mmrag_tpu.ops.topk import l2_normalize, quantize_rows_int8
    from mmrag_tpu.parallel.mesh import build_mesh
    from mmrag_tpu.parallel.sharded_index import sharded_topk_int8

    mesh = build_mesh(n_devices=8)
    rows = 64 * 8
    corpus = l2_normalize(jnp.asarray(rng.standard_normal((rows, 64)), jnp.float32))
    cq, cs = quantize_rows_int8(corpus)
    queries = corpus[:3]
    mask = jnp.ones(rows, dtype=bool)
    scores, idx = sharded_topk_int8(queries, cq, cs, mask, k=5, mesh=mesh)
    assert scores.shape == (3, 5)
    # each query finds itself despite int8 quantization
    assert (np.asarray(idx)[:, 0] == np.arange(3)).all()
    assert float(np.asarray(scores)[:, 0].min()) > 0.97


@pytest.mark.parametrize("model_parallel", [1, 2])
def test_minilm_train_step_runs_and_learns(model_parallel, rng):
    from mmrag_tpu.models import bert as jbert
    from mmrag_tpu.parallel.training import (
        make_minilm_train_step, minilm_train_state_init,
    )

    cfg = jbert.BertConfig(
        vocab_size=512, hidden_size=32, num_layers=2, num_heads=4,
        intermediate_size=64, max_position=32,
    )
    mesh = build_mesh(model_parallel=model_parallel)
    params, opt_state, tx = minilm_train_state_init(
        jax.random.PRNGKey(0), mesh, cfg, learning_rate=1e-3)
    step = make_minilm_train_step(mesh, tx, cfg)
    b, s = 8, 12
    q_ids = jnp.asarray(rng.integers(1, 500, (b, s)), jnp.int32)
    p_ids = jnp.asarray(rng.integers(1, 500, (b, s)), jnp.int32)
    ones = jnp.ones((b, s), jnp.int32)
    losses = []
    for _ in range(15):
        params, opt_state, loss = step(params, opt_state, q_ids, ones, p_ids, ones)
        losses.append(float(loss))
    assert all(np.isfinite(losses))
    assert min(losses[-3:]) < losses[0]  # memorizes the fixed batch


def test_cross_encoder_train_step_runs_and_learns(rng):
    from mmrag_tpu.models import bert as jbert
    from mmrag_tpu.parallel.training import (
        cross_encoder_train_state_init, make_cross_encoder_train_step,
    )

    cfg = jbert.BertConfig(
        vocab_size=512, hidden_size=32, num_layers=2, num_heads=4,
        intermediate_size=64, max_position=32,
    )
    mesh = build_mesh()
    params, opt_state, tx = cross_encoder_train_state_init(
        jax.random.PRNGKey(1), mesh, cfg, learning_rate=1e-3)
    step = make_cross_encoder_train_step(mesh, tx, cfg)
    b, s = 8, 16
    ids = jnp.asarray(rng.integers(1, 500, (b, s)), jnp.int32)
    mask = jnp.ones((b, s), jnp.int32)
    tt = jnp.concatenate(
        [jnp.zeros((b, s // 2), jnp.int32), jnp.ones((b, s // 2), jnp.int32)], 1)
    labels = jnp.asarray(rng.integers(0, 2, (b,)), jnp.float32)
    losses = []
    for _ in range(15):
        params, opt_state, loss = step(params, opt_state, ids, mask, tt, labels)
        losses.append(float(loss))
    assert all(np.isfinite(losses))
    assert min(losses[-3:]) < losses[0]


def test_train_losses_differentiable_with_fused_kernels_forced(
    tiny_train_clip, rng, monkeypatch
):
    # On a real TPU the auto gates route production batch shapes into the
    # Pallas fused attention / LN kernels, which have NO VJP — training
    # pins attention_impl="xla" (and plain-jnp LN) so jax.grad works no
    # matter what the gates decide. Force-enable every kernel override and
    # prove all three losses still differentiate.
    from mmrag_tpu.models import bert as jbert
    from mmrag_tpu.parallel.training import (
        clip_contrastive_loss, cross_encoder_loss, minilm_mnr_loss,
    )

    monkeypatch.setenv("MMRAG_ATTN_IMPL", "fused")
    monkeypatch.setenv("MMRAG_LN_IMPL", "fused")

    ccfg = tiny_train_clip
    cparams = jclip.init_clip_params(jax.random.PRNGKey(0), ccfg)
    images = jnp.asarray(rng.standard_normal((2, 32, 32, 3)), jnp.float32)
    tids = jnp.asarray(rng.integers(1, 500, (2, 16)), jnp.int32)
    tmask = jnp.ones((2, 16), jnp.int32)
    g = jax.grad(clip_contrastive_loss)(cparams, images, tids, tmask, ccfg)
    assert np.isfinite(float(jnp.sum(g["logit_scale"])))

    bcfg = jbert.BertConfig(
        vocab_size=512, hidden_size=32, num_layers=1, num_heads=4,
        intermediate_size=64, max_position=32,
    )
    bparams = jbert.init_bert_params(jax.random.PRNGKey(1), bcfg)
    ids = jnp.asarray(rng.integers(1, 500, (2, 8)), jnp.int32)
    ones = jnp.ones((2, 8), jnp.int32)
    g = jax.grad(minilm_mnr_loss)(bparams, ids, ones, ids, ones, bcfg)
    assert np.isfinite(float(jnp.sum(g["embeddings"]["word"])))

    xparams = jbert.init_cross_encoder_params(jax.random.PRNGKey(2), bcfg)
    labels = jnp.asarray([0.0, 1.0], jnp.float32)
    g = jax.grad(cross_encoder_loss)(
        xparams, ids, ones, jnp.zeros_like(ids), labels, bcfg)
    assert np.isfinite(float(jnp.sum(g["classifier"]["kernel"])))
