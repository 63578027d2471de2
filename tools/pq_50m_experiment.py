"""One-off capacity experiment: residual ivf_pq at 50M x 384 on ONE chip.

BASELINE.md's claim that 16 B/row PQ codes move the single-chip capacity
ceiling "from ~10M toward ~50M rows" was extrapolated; this script measures
the actual 50M design point (the bench_pq_10m methodology, 5x the rows):
clustered synthetic corpus generated in 131k slabs, global kmeans
(C = default_n_clusters(50M) = 16384), residual codes, bucket layout,
probed-ADC latency at q=1/q=16, and TIE-AWARE refined recall@10 against the
host-side exact f32 scores (kept per slab during generation — the
production host-RAM-originals role; ~3.4 GB host RAM for 16 queries,
preallocated so the peak is not doubled by a final concatenate).

Run: python tools/pq_50m_experiment.py [--rows N]
Prints one JSON line. Not a bench.py step: ~10-20 min wall, beyond the
driver budget's scope; results recorded in BASELINE.md as builder-measured.
"""

import argparse
import json
import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np  # noqa: E402


def main() -> None:
    parser = argparse.ArgumentParser()
    parser.add_argument("--rows", type=int, default=50 * 1024 * 1024)
    args = parser.parse_args()

    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")

    from bench import _ivf_pq_probe_step_factory, _per_iter_seconds, _plog
    from mmrag_tpu.ops import ivf as ivf_ops
    from mmrag_tpu.ops import pq as pqops
    from mmrag_tpu.ops.topk import l2_normalize

    t_start = time.perf_counter()
    n, d, q_n, centers = args.rows, 384, 16, 4096
    slab_rows = 131_072
    key = jax.random.PRNGKey(0)
    cents_g = l2_normalize(jax.random.normal(key, (centers, d), jnp.float32))

    def make_slab(i):
        kk = jax.random.PRNGKey(300 + i)
        assign = jax.random.randint(kk, (slab_rows,), 0, centers)
        noise = 0.25 * jax.random.normal(kk, (slab_rows, d), jnp.float32)
        return l2_normalize(cents_g[assign] + noise)

    mk = jax.jit(make_slab)
    slab0 = mk(0)
    queries = l2_normalize(
        slab0[:q_n] + 0.05 * jax.random.normal(jax.random.PRNGKey(7), (q_n, d))
    ).astype(jnp.float32)

    n_cl = ivf_ops.default_n_clusters(n)
    _plog(f"pq_50m: kmeans C={n_cl} on slab0")
    kc, _ = ivf_ops.kmeans(slab0, n_cl, iters=4, train_sample=65536)
    a0 = ivf_ops._assign_with_structure(slab0[:65536], kc)[0]
    rbooks = pqops.train_pq(slab0[:65536] - jnp.take(kc, a0, axis=0), m=16)

    n_slabs = -(-n // slab_rows)
    k_true = 10

    @jax.jit
    def slab_scores(sl):
        return jnp.dot(queries, sl.T, preferred_element_type=jnp.float32)

    # preallocated host buffers, written slab-by-slab: a concatenate at the
    # end would briefly hold source blocks AND the result (2x the ~3.4 GB
    # exact matrix — review finding), and codes assembled host-side ship to
    # the device once instead of 400 live slices peaking ~2x slab HBM
    total_rows = n_slabs * slab_rows
    exact = np.empty((q_n, total_rows), np.float32)
    codes_h = np.empty((total_rows, 16), np.int8)
    assign_h = np.empty((total_rows,), np.int32)
    for i in range(n_slabs):
        sl = slab0 if i == 0 else mk(i)
        base = i * slab_rows
        exact[:, base : base + slab_rows] = np.asarray(slab_scores(sl))
        for lo in range(0, slab_rows, 65536):
            chunk = sl[lo : lo + 65536]
            a = ivf_ops._assign_with_structure(chunk, kc)[0]
            assign_h[base + lo : base + lo + 65536] = np.asarray(a)
            codes_h[base + lo : base + lo + 65536] = np.asarray(
                pqops.pq_encode(chunk - jnp.take(kc, a, axis=0), rbooks)
            )
        if i and i % 40 == 0:
            _plog(f"pq_50m: slab {i}/{n_slabs} "
                  f"(+{time.perf_counter() - t_start:.0f}s)")
    assign_h = assign_h[:n]
    codes = jnp.asarray(codes_h[:n])
    exact = exact[:, :n]
    del codes_h
    _plog(f"pq_50m: building layout (+{time.perf_counter() - t_start:.0f}s)")
    layout = ivf_ops.build_ivf(
        codes, centroids=kc, assign=assign_h, structure_override=1.0,
        pq_codebooks=rbooks, pq_residual=True,
    )
    nprobe = min(64, layout.n_clusters)
    cand = 16 * 10
    uids0 = jnp.zeros((q_n,), jnp.int32)
    dids0 = jnp.full((q_n,), -1, jnp.int32)

    _plog("pq_50m: tie-aware refined recall")
    _, pix = ivf_ops.ivf_search_pred(layout, queries, uids0, dids0, cand,
                                     nprobe)
    pix_np = np.asarray(pix)
    thr = np.partition(exact, n - k_true, axis=1)[:, n - k_true] - 1e-3
    cand_scores = np.take_along_axis(exact, np.clip(pix_np, 0, n - 1), axis=1)
    cand_scores[pix_np < 0] = -np.inf
    refined = -np.sort(-cand_scores, axis=1)[:, :k_true]
    recall = float(np.mean(refined >= thr[:, None]))
    del exact

    make_probe_step = _ivf_pq_probe_step_factory(cand, nprobe)

    common = (queries, rbooks, kc, layout.buckets, layout.bucket_ids,
              layout.users_b, layout.docs_b, layout.live_b, layout.spill,
              layout.spill_ids, layout.spill_users, layout.spill_docs,
              layout.spill_live, layout.spill_assign, uids0, dids0)
    _plog("pq_50m: timing probed ADC (q=16)")
    sec16 = _per_iter_seconds(make_probe_step, 32, 4, *common)
    _plog("pq_50m: timing probed ADC (q=1)")
    q1 = (queries[:1],) + common[1:-2] + (uids0[:1], dids0[:1])
    sec1 = _per_iter_seconds(make_probe_step, 32, 4, *q1)

    device_bytes = sum(
        int(np.prod(a.shape)) * a.dtype.itemsize
        for a in (layout.buckets, layout.bucket_ids, layout.users_b,
                  layout.docs_b, layout.live_b, layout.spill, codes)
    )
    print(json.dumps({
        "rows": n,
        "clusters": n_cl,
        "nprobe": nprobe,
        "ivf_pq_16q_p50_ms": round(sec16 * 1e3, 3),
        "ivf_pq_q1_p50_ms": round(sec1 * 1e3, 3),
        "refined_recall_at_10_worstcase_geometry": round(recall, 4),
        "device_state_gb": round(device_bytes / 2**30, 2),
        "build_wall_s": round(time.perf_counter() - t_start, 1),
    }), flush=True)


if __name__ == "__main__":
    main()
