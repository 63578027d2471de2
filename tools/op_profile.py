"""Op-profile a jitted encoder step on the TPU: trace with ``jax.profiler``,
parse the xplane protobuf directly (the tensorboard profile plugin in this
image mismatches TF's pywrap API), and bucket device time by opcode and by
opcode+output-shape signature.

This is the measurement loop behind the KERNELS.md numbers: every fused-kernel
decision (what to fuse, what to revert) came from one of these breakdowns.

Usage: python tools/op_profile.py
    [minilm|minilm_q8|minilm512|minilm512_q8|clip|clip_text]
"""
import glob
import os
import re
import sys
from collections import defaultdict

import jax
import jax.numpy as jnp

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from mmrag_tpu.models import bert, clip  # noqa: E402
from mmrag_tpu.ops.images import preprocess_batch  # noqa: E402

STEPS = 20


def build(which):
    if which == "clip":
        params = clip.init_clip_params(jax.random.PRNGKey(1))
        images = jax.random.randint(jax.random.PRNGKey(0), (128, 224, 224, 3), 0, 255, jnp.uint8)

        @jax.jit
        def step(params, images):
            feats = clip.clip_image_features(params, preprocess_batch(images), compute_dtype=jnp.bfloat16)
            return bert.l2_normalize(feats)

        return step, (params, images)
    if which == "clip_text":
        params = clip.init_clip_params(jax.random.PRNGKey(1))
        ids = jax.random.randint(jax.random.PRNGKey(0), (256, 77), 5, 49000, jnp.int32)
        mask = jnp.ones((256, 77), jnp.int32)

        @jax.jit
        def step(params, ids, mask):
            return bert.l2_normalize(clip.clip_text_features(params, ids, mask, compute_dtype=jnp.bfloat16))

        return step, (params, ids, mask)
    # minilm at the headline shape (512x64) or the ingest chunk shape
    # (64x512, `bench.py::bench_minilm_seq512`); *_q8 = the W8A8 tower
    known = {"minilm", "minilm_q8", "minilm512", "minilm512_q8"}
    if which not in known:
        raise SystemExit(f"unknown profile target {which!r} (see module docstring)")
    b, s = (64, 512) if which.startswith("minilm512") else (512, 64)
    params = bert.init_bert_params(jax.random.PRNGKey(0))
    q8 = bert.quantize_bert(params) if which.endswith("_q8") else None
    ids = jax.random.randint(jax.random.PRNGKey(3), (b, s), 5, 30000, jnp.int32)
    mask = jnp.ones((b, s), jnp.int32)

    @jax.jit
    def step(params, q8, ids, mask):
        return bert.minilm_embed(params, ids, mask, compute_dtype=jnp.bfloat16,
                                 q8_layers=q8)

    return step, (params, q8, ids, mask)


def main():
    which = sys.argv[1] if len(sys.argv) > 1 else "minilm"
    step, args = build(which)
    step(*args).block_until_ready()

    outdir = "/tmp/op_profile_trace"
    os.system(f"rm -rf {outdir}")
    with jax.profiler.trace(outdir):
        for _ in range(STEPS):
            r = step(*args)
        r.block_until_ready()

    from tensorflow.tsl.profiler.protobuf import xplane_pb2

    space = xplane_pb2.XSpace()
    path = glob.glob(f"{outdir}/**/*.xplane.pb", recursive=True)[0]
    space.ParseFromString(open(path, "rb").read())

    for plane in space.planes:
        if "TPU" not in plane.name or "XLA" in plane.name:
            continue
        meta = plane.event_metadata
        for line in plane.lines:
            if line.name != "XLA Ops":
                continue
            by_op, by_full = defaultdict(float), defaultdict(float)
            total = 0.0
            for ev in line.events:
                name = meta[ev.metadata_id].name
                m = re.match(r"%([a-zA-Z_-]+)[\.\d]*", name)
                op = m.group(1) if m else name[:20]
                if "start" in op or "done" in op:  # async DMA, overlapped
                    continue
                dur = ev.duration_ps / 1e6
                by_op[op] += dur
                by_full[name] += dur
                total += dur
            print(f"== {plane.name}: {total/1e3/STEPS:.3f} ms/step")
            for name, us in sorted(by_op.items(), key=lambda kv: -kv[1])[:12]:
                print(f"{us/STEPS:10.1f} us/step  {100*us/total:5.1f}%  {name}")
            by_sig = defaultdict(lambda: [0.0, 0])
            for name, us in by_full.items():
                m = re.match(r"%([a-zA-Z_-]+)[\.\d]* = (\S+)", name)
                sig = f"{m.group(1)} -> {m.group(2)[:70]}" if m else name[:70]
                by_sig[sig][0] += us
                by_sig[sig][1] += 1
            print("-- by opcode+shape:")
            for sig, (us, n) in sorted(by_sig.items(), key=lambda kv: -kv[1][0])[:20]:
                print(f"{us/STEPS:10.1f} us/step  {100*us/total:5.1f}%  n={n/STEPS:4.1f}/step  {sig}")


if __name__ == "__main__":
    main()
