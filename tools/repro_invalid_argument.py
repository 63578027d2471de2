"""Reproducer hunt for the opaque TPU `INVALID_ARGUMENT` backend error.

Observed in production/bench (BENCH_r01 tail; `index/store.py::
_search_with_fallback` docstring): after very large transient buffers have
lived on the chip — the 10M x 384 dense-scan bench is the usual trigger —
a subsequent Pallas top-k dispatch can fail at readback with
``INVALID_ARGUMENT: TPU backend error (InvalidArgument)`` and poison the
process's TPU client (even ``PRNGKey`` fails afterwards). The serving path
degrades to dense XLA (now counted in /metrics as
``index.backend_fallback.*``); this script tries to corner the trigger.

Protocol (each phase prints PASS/FAIL + timing):
  1. steady-state: pallas fused top-k over 1M x 384, N reps        (control)
  2. pressure: allocate/free a ~6 GB transient (10M x 384 f32  +
     scores), then immediately re-run the pallas top-k              (suspect)
  3. interleave: alternate big-transient matmuls and pallas top-k   (stress)

Run on the real chip:  python tools/repro_invalid_argument.py [--reps 5]
Exit code 0 = no reproduction; 2 = reproduced (stderr has the phase).
"""

from __future__ import annotations

import argparse
import sys
import time


def main() -> int:
    parser = argparse.ArgumentParser()
    parser.add_argument("--reps", type=int, default=5)
    parser.add_argument("--rows", type=int, default=1_000_000)
    parser.add_argument("--big-rows", type=int, default=10_000_000)
    args = parser.parse_args()

    import jax
    import jax.numpy as jnp

    from mmrag_tpu.ops.topk import cosine_topk, l2_normalize

    print(f"backend: {jax.default_backend()}", flush=True)
    key = jax.random.PRNGKey(0)
    corpus = l2_normalize(
        jax.random.normal(key, (args.rows, 384), jnp.bfloat16).astype(jnp.bfloat16)
    )
    queries = l2_normalize(jax.random.normal(key, (16, 384), jnp.float32))
    mask = jnp.ones((args.rows,), bool)

    def pallas_topk():
        s, i = cosine_topk(queries, corpus, mask, 50, "pallas")
        jax.block_until_ready((s, i))

    def phase(name, fn):
        t0 = time.perf_counter()
        try:
            fn()
            print(f"{name}: PASS ({time.perf_counter() - t0:.2f}s)", flush=True)
            return True
        except jax.errors.JaxRuntimeError as exc:
            print(f"{name}: FAIL {exc}", file=sys.stderr, flush=True)
            return False

    # 1. control
    for r in range(args.reps):
        if not phase(f"steady[{r}]", pallas_topk):
            return 2

    # 2. big transient then immediate pallas dispatch
    def pressure():
        big = jax.random.normal(key, (args.big_rows, 384), jnp.float32)
        s = jnp.dot(queries, big.T, preferred_element_type=jnp.float32)
        jax.block_until_ready(jax.lax.top_k(s, 50))
        del big, s  # free ~16 GB of transients
        pallas_topk()

    for r in range(args.reps):
        if not phase(f"pressure[{r}]", pressure):
            return 2

    # 3. interleave at finer grain
    def interleave():
        for _ in range(3):
            big = jax.random.normal(key, (args.big_rows // 2, 384), jnp.bfloat16)
            jax.block_until_ready(jnp.sum(big, axis=0))
            del big
            pallas_topk()

    for r in range(args.reps):
        if not phase(f"interleave[{r}]", interleave):
            return 2

    print("no reproduction — fallback counters remain the safety net", flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
