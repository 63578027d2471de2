"""Z-score fusion: reference semantics (retrieve.py:158-195)."""

import numpy as np

from mmrag_tpu.ops.fusion import fuse_results, z_scores
from mmrag_tpu.storage import RetrievedHit


def _hit(cid, modality="text", score=0.5, rerank=None):
    return RetrievedHit(
        chunk_id=cid, document_id="d", user_id="u", modality=modality,
        score=score, rerank_score=rerank,
    )


def test_z_scores_basic():
    z = z_scores([1.0, 2.0, 3.0])
    np.testing.assert_allclose(z, [-1.2247449, 0.0, 1.2247449], atol=1e-6)
    assert np.all(z_scores([5.0]) == 0)
    assert np.all(z_scores([2.0, 2.0, 2.0]) == 0)
    assert z_scores([]).size == 0


def test_rerank_beats_raw_score():
    # t2 has lower cosine but much higher rerank -> must outrank t1.
    text = [
        _hit("t1", score=0.9, rerank=0.1),
        _hit("t2", score=0.5, rerank=5.0),
        _hit("t3", score=0.4, rerank=0.2),
    ]
    fused = fuse_results(text, [], final_n=3)
    assert fused[0].chunk_id == "t2"
    assert fused[0].combined_score is not None


def test_text_combined_is_mean_of_z():
    text = [_hit("t1", score=1.0, rerank=1.0), _hit("t2", score=2.0, rerank=3.0)]
    fused = fuse_results(text, [], final_n=2)
    by_id = {h.chunk_id: h for h in fused}
    # population-std z over scores [1,2] = [-1, +1]; z over rerank [1,3] same.
    assert by_id["t2"].combined_score > 0 > by_id["t1"].combined_score
    np.testing.assert_allclose(by_id["t2"].combined_score, 1.0, atol=1e-6)


def test_images_fused_by_cosine_z_and_truncation():
    text = [_hit(f"t{i}", score=0.1 * i) for i in range(4)]
    imgs = [_hit(f"i{i}", modality="image", score=0.2 * i) for i in range(4)]
    fused = fuse_results(text, imgs, final_n=4)
    assert len(fused) == 4
    # top entries are the per-list z winners
    ids = {h.chunk_id for h in fused}
    assert "t3" in ids and "i3" in ids


def test_unreranked_text_uses_cosine_only():
    text = [_hit("t1", score=0.9), _hit("t2", score=0.1)]
    fused = fuse_results(text, [], final_n=2)
    assert fused[0].chunk_id == "t1"
    assert fused[0].rerank_score is None
