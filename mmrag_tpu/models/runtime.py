"""Encoder runtime: lazy params, bucketed static-shape batching, jitted calls.

The TPU-native successor of the reference's lazy model singletons
(``/root/reference/app/ml/embeddings.py:23-43``, ``app/ml/retrieve.py:29-38``).
Instead of torch minibatch loops, every public call pads its batch to a
configured bucket (``TPU_TEXT_BATCH_BUCKETS`` etc.) and its sequence length to
a bucket, so XLA compiles one executable per (batch, seq) bucket and reuses it
forever — no recompile storms, no dynamic shapes (SURVEY §7 hard part (e)).

Weights resolve in order: converted ``.npz`` under ``WEIGHTS_DIR/<model>/`` ->
deterministic seeded init (offline mode). Either way the same jitted code
runs, so offline tests exercise the production path.
"""

from __future__ import annotations

import functools
import logging
import threading
from typing import List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from ..settings import Settings, settings as _default_settings
from . import bert, clip, convert, tokenizer as tok

logger = logging.getLogger(__name__)

TEXT_EMBED_DIM = 384
CLIP_EMBED_DIM = 512


def _sanitize(model_id: str) -> str:
    return model_id.replace("/", "__")


# max padded tokens (batch x seq) per encoder dispatch — 512 rows at the
# 512-token splitter shape; see embed_text_batch for the measurements
_DISPATCH_TOKEN_CAP = 512 * 512


def _assemble_bert_inputs(buf, lengths, btok, seq: int):
    """``[CLS] body [SEP]`` ids + attention mask from a tokenize_matrix
    block, entirely in numpy (the list path costs ~30 us/row at seq 512)."""

    n = lengths.shape[0]
    body_len = np.minimum(lengths, seq - 2)
    width = min(buf.shape[1], seq - 2)
    cols = np.arange(width)
    ids = np.full((n, seq), btok.pad_id, dtype=np.int32)
    ids[:, 1 : width + 1] = np.where(
        cols[None, :] < body_len[:, None], buf[:, :width], btok.pad_id
    )
    ids[:, 0] = btok.cls_id
    ids[np.arange(n), body_len + 1] = btok.sep_id
    mask = (np.arange(seq)[None, :] < (body_len + 2)[:, None]).astype(np.int32)
    return ids, mask


def _bucket(value: int, buckets: Sequence[int]) -> int:
    for b in buckets:
        if value <= b:
            return b
    return buckets[-1]


def _capped_batch(buckets: Sequence[int], seq: int) -> int:
    """Largest batch bucket whose (rows x seq) padded-token dispatch stays
    under ``_DISPATCH_TOKEN_CAP`` — every bucketed text path chunks by this,
    so adding a big bucket to TPU_TEXT_BATCH_BUCKETS (e.g. 2048 for seq-64
    ingest) can't push long-seq dispatches past the measured VMEM/pipeline
    cliff (seq-512 x 1024 rows measured 10% slower than 512)."""

    return max(
        (b for b in buckets if b * seq <= _DISPATCH_TOKEN_CAP),
        default=buckets[0],
    )


def _pad_rows(arr: np.ndarray, rows: int) -> np.ndarray:
    if arr.shape[0] == rows:
        return arr
    pad = np.zeros((rows - arr.shape[0], *arr.shape[1:]), dtype=arr.dtype)
    return np.concatenate([arr, pad], axis=0)


_compile_cache_applied = False


def _apply_compile_cache(cfg: Settings) -> None:
    """Point XLA's persistent compile cache at ``TPU_COMPILE_CACHE_DIR`` (once
    per process, before the first jit): server restarts and the serving
    warmup reuse compiled executables instead of re-lowering every bucket —
    a cold warmup over a remote-compile tunnel otherwise takes minutes."""

    global _compile_cache_applied
    if _compile_cache_applied or not cfg.tpu.compile_cache_dir:
        return
    _compile_cache_applied = True
    if (jax.config.jax_platforms or "").startswith("cpu"):
        # CPU AOT cache entries bake in the compile host's machine features;
        # reloading them on a different host risks SIGILL (XLA cpu_aot_loader
        # warns and loads anyway). CPU compiles are fast — the cache exists
        # for the remote-TPU tunnel, so leave it off on explicit-CPU runs.
        return
    import os as _os

    path = _os.path.expanduser(cfg.tpu.compile_cache_dir)
    try:
        _os.makedirs(path, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", path)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    except Exception as exc:  # unwritable dir must never block serving
        logger.warning("compile cache disabled (%s): %s", path, exc)


class EncoderRuntime:
    """Holds MiniLM + CLIP + cross-encoder params and their jitted forwards."""

    def __init__(
        self,
        cfg: Optional[Settings] = None,
        bert_cfg: bert.BertConfig = bert.MINILM_L6,
        clip_cfg: clip.CLIPConfig = clip.CLIP_VIT_B32,
        mesh=None,
    ) -> None:
        self.cfg = cfg or _default_settings
        _apply_compile_cache(self.cfg)
        self.bert_cfg = bert_cfg
        self.clip_cfg = clip_cfg
        # Multi-chip engine mode (SURVEY §2c "torch minibatching" row): with
        # >1 device, every bucketed dispatch runs data-parallel — params
        # replicated, batch rows sharded over the `data` axis, no collectives
        # on the forward path. Controlled by TPU_DATA_PARALLEL.
        if mesh is None:
            from ..parallel.mesh import engine_data_mesh

            mesh = engine_data_mesh(self.cfg)
        self.mesh = mesh
        self._n_data = 1
        if mesh is not None:
            from ..parallel.mesh import DATA_AXIS

            self._n_data = mesh.shape[DATA_AXIS]
        self.text_dim = bert_cfg.hidden_size
        self.clip_dim = clip_cfg.projection_dim
        # RLock: _ensure_cross reuses _ensure_minilm's tokenizer under the lock
        self._lock = threading.RLock()
        self._minilm = None
        self._clip = None
        self._cross = None
        self._bert_tok = None
        self._clip_tok = None
        tpu = self.cfg.tpu
        # bf16 matmuls are the TPU fast path; on CPU backends bf16 is emulated
        # and slower, so fall back to f32 there unless explicitly forced.
        requested = jnp.bfloat16 if tpu.compute_dtype == "bfloat16" else jnp.float32
        if requested == jnp.bfloat16 and jax.default_backend() == "cpu":
            requested = jnp.float32
        self.compute_dtype = requested
        # opt-in W8A8 encoder blocks (TPU_ENCODER_QUANT=int8, ops/quant.py):
        # the CLIP vision tower and the BERT towers (MiniLM text embed +
        # cross-encoder trunk) route through int8-MXU kernels. Only honored
        # where the fused kernels engage (the q8 kernels share their gate).
        self.encoder_quant = tpu.encoder_quant
        self._clip_q8 = None
        self._minilm_q8 = None
        self._cross_q8 = None

    # -- lazy loading -------------------------------------------------------

    def _weights_dir(self, model_id: str) -> str:
        import os

        return os.path.join(self.cfg.paths.weights_dir, _sanitize(model_id))

    def _ensure_minilm(self):
        with self._lock:
            if self._minilm is None:
                wdir = self._weights_dir(self.cfg.models.text)
                if convert.params_available(wdir, "model"):
                    logger.info("loading MiniLM weights from %s", wdir)
                    self._minilm = convert.load_params(wdir, "model")
                else:
                    logger.warning(
                        "no converted weights for %s — using seeded init",
                        self.cfg.models.text,
                    )
                    self._minilm = bert.init_bert_params(jax.random.PRNGKey(0), self.bert_cfg)
                self._bert_tok = tok.load_bert_tokenizer(wdir)
        return self._minilm

    def _ensure_clip(self):
        with self._lock:
            if self._clip is None:
                wdir = self._weights_dir(self.cfg.models.clip)
                if convert.params_available(wdir, "model"):
                    logger.info("loading CLIP weights from %s", wdir)
                    self._clip = convert.load_params(wdir, "model")
                else:
                    logger.warning(
                        "no converted weights for %s — using seeded init",
                        self.cfg.models.clip,
                    )
                    self._clip = clip.init_clip_params(jax.random.PRNGKey(1), self.clip_cfg)
                self._clip_tok = tok.load_clip_tokenizer(wdir)
        return self._clip

    def _ensure_cross(self):
        with self._lock:
            if self._cross is None:
                wdir = self._weights_dir(self.cfg.models.reranker)
                if convert.params_available(wdir, "model"):
                    logger.info("loading cross-encoder weights from %s", wdir)
                    self._cross = convert.load_params(wdir, "model")
                else:
                    logger.warning(
                        "no converted weights for %s — using seeded init",
                        self.cfg.models.reranker,
                    )
                    self._cross = bert.init_cross_encoder_params(jax.random.PRNGKey(2), self.bert_cfg)
                if self._bert_tok is None:
                    self._ensure_minilm()
        return self._cross

    # -- jitted kernels (cached per shape by jax.jit) -----------------------

    def _jit(self, fn, n_batch_args: int):
        """jit with DP shardings in multi-chip mode: params replicated, the
        ``n_batch_args`` batch arrays (and the output) row-sharded over the
        data axis (:mod:`mmrag_tpu.parallel.inference` semantics, wired into
        the production runtime).

        The DP form is ``shard_map`` (each device runs the full forward on
        its batch shard), NOT ``jit(in_shardings=...)``: the encoder
        forwards contain Pallas kernels on TPU, and Mosaic custom calls
        cannot be auto-partitioned by GSPMD — jit-autosharding them raises
        ``NotImplementedError: Mosaic kernels cannot be automatically
        partitioned`` on any real multi-device host (review finding; CPU
        tests never see it because the fused gates are TPU-only)."""

        if self.mesh is None:
            return jax.jit(fn)
        from jax.sharding import PartitionSpec as P

        from ..parallel.mesh import DATA_AXIS
        from ..parallel.sharded_index import shard_map

        mapped = shard_map(
            fn,
            mesh=self.mesh,
            in_specs=(P(),) + (P(DATA_AXIS),) * n_batch_args,
            out_specs=P(DATA_AXIS),
            check_rep=False,
        )
        return jax.jit(mapped)

    def _round_batch(self, bsz: int) -> int:
        """Pad the bucket size up to a multiple of the data-axis size so the
        batch dim shards evenly (single-device: identity)."""

        if bsz % self._n_data:
            bsz += self._n_data - bsz % self._n_data
        return bsz

    def _ensure_minilm_q8(self):
        """Device-resident int8 MiniLM encoder blocks, quantized once."""

        with self._lock:
            if self._minilm_q8 is None:
                self._minilm_q8 = bert.quantize_bert(self._ensure_minilm())
        return self._minilm_q8

    def _ensure_cross_q8(self):
        """Device-resident int8 cross-encoder trunk, quantized once."""

        with self._lock:
            if self._cross_q8 is None:
                self._cross_q8 = bert.quantize_bert(self._ensure_cross()["bert"])
        return self._cross_q8

    @functools.cached_property
    def _minilm_fn(self):
        quant = self.encoder_quant == "int8"
        jitted = self._jit(
            lambda p, ids, mask: bert.minilm_embed(
                p[0], ids, mask, self.bert_cfg, compute_dtype=self.compute_dtype,
                q8_layers=p[1],
            ),
            n_batch_args=2,
        )

        def call(params, ids, mask):
            q8 = self._ensure_minilm_q8() if quant else None
            return jitted((params, q8), ids, mask)

        return call

    def _ensure_clip_q8(self):
        """Device-resident int8 vision-tower weights, quantized once."""

        with self._lock:
            if self._clip_q8 is None:
                self._clip_q8 = clip.quantize_clip_vision(self._ensure_clip())
        return self._clip_q8

    @functools.cached_property
    def _clip_image_fn(self):
        from ..ops.images import preprocess_batch

        quant = self.encoder_quant == "int8"

        def fn(p, images_u8):
            params, q8 = p
            pixels = preprocess_batch(images_u8)  # fused into the same XLA program
            feats = clip.clip_image_features(
                params, pixels, self.clip_cfg, compute_dtype=self.compute_dtype,
                q8_layers=q8,
            )
            return bert.l2_normalize(feats)

        jitted = self._jit(fn, n_batch_args=1)

        def call(params, images_u8):
            q8 = self._ensure_clip_q8() if quant else None
            return jitted((params, q8), images_u8)

        return call

    @functools.cached_property
    def _clip_text_fn(self):
        def fn(p, ids, mask):
            feats = clip.clip_text_features(p, ids, mask, self.clip_cfg, compute_dtype=self.compute_dtype)
            return bert.l2_normalize(feats)

        return self._jit(fn, n_batch_args=2)

    @functools.cached_property
    def _cross_fn(self):
        quant = self.encoder_quant == "int8"
        jitted = self._jit(
            lambda p, ids, mask, tt: bert.cross_encoder_score(
                p[0], ids, mask, tt, self.bert_cfg, compute_dtype=self.compute_dtype,
                q8_layers=p[1],
            ),
            n_batch_args=3,
        )

        def call(params, ids, mask, tt):
            q8 = self._ensure_cross_q8() if quant else None
            return jitted((params, q8), ids, mask, tt)

        return call

    # -- public API (reference embed_* signatures) --------------------------

    def embed_text_batch(self, texts: Sequence[str]) -> np.ndarray:
        """(n, 384) L2-normalized MiniLM sentence embeddings
        (reference ``embed_text_batch``, ``app/ml/embeddings.py:52-70``)."""

        if not texts:
            return np.zeros((0, self.text_dim), dtype=np.float32)
        params = self._ensure_minilm()
        tpu = self.cfg.tpu
        buckets = tpu.text_batch_buckets
        btok = self._bert_tok
        pending = []

        def dispatch(ids, mask, n):
            bsz = self._round_batch(_bucket(n, buckets))
            ids, mask = _pad_rows(ids, bsz), _pad_rows(mask, bsz)
            # padded rows are all-pad-token; mean_pool guards div-by-zero.
            # Don't force the readback here: with the dispatch left in
            # flight, the next chunk's WordPiece runs while the device
            # computes this one (serializing them measured ~1.8x slower on
            # multi-batch ingest)
            emb = self._minilm_fn(params, jnp.asarray(ids), jnp.asarray(mask))
            pending.append((emb, n))

        scan = buckets[-1]
        for start in range(0, len(texts), scan):
            chunk = list(texts[start : start + scan])
            if hasattr(btok, "tokenize_matrix"):
                # batched matrix tokenization + numpy [CLS] body [SEP]
                # assembly: no per-token Python lists on the ingest hot path
                buf, lengths = btok.tokenize_matrix(chunk)
                if tpu.text_embed_max_len:
                    # reference parity: SentenceTransformer caps MiniLM
                    # embeds at max_seq_length=256 — clamp BEFORE bucket
                    # selection so long chunks also ride the cheaper bucket
                    lengths = np.minimum(
                        lengths, tpu.text_embed_max_len - 2
                    )
                seq_all = _bucket(int(lengths.max(initial=0)) + 2, tpu.text_seq_buckets)
                # dispatch-size cap: big batches amortize the fixed dispatch
                # cost (seq-64 ingest measured 2x going 512->2048 rows), but
                # past ~256k padded tokens the step is long enough that
                # bigger only adds VMEM pressure and pipeline granularity
                # loss (seq-512 x 1024 rows measured 10% SLOWER than 512)
                rows = _capped_batch(buckets, seq_all)
                for g in range(0, len(chunk), rows):
                    glen = lengths[g : g + rows]
                    seq = _bucket(int(glen.max(initial=0)) + 2, tpu.text_seq_buckets)
                    ids, mask = _assemble_bert_inputs(
                        buf[g : g + rows], glen, btok, seq
                    )
                    dispatch(ids, mask, len(glen))
            else:  # HashTokenizer fallback keeps the list path
                tokenized = [btok.tokenize_ids(t) for t in chunk]
                if tpu.text_embed_max_len:
                    cap = tpu.text_embed_max_len - 2
                    tokenized = [t[:cap] for t in tokenized]
                longest = max((len(t) for t in tokenized), default=1) + 2
                seq_all = _bucket(longest, tpu.text_seq_buckets)
                rows = _capped_batch(buckets, seq_all)
                for g in range(0, len(chunk), rows):
                    sub = tokenized[g : g + rows]
                    seq = _bucket(
                        max((len(t) for t in sub), default=1) + 2,
                        tpu.text_seq_buckets,
                    )
                    seqs = [
                        [btok.cls_id, *t[: seq - 2], btok.sep_id] for t in sub
                    ]
                    ids, mask = tok._pad_batch(seqs, seq, btok.pad_id)
                    dispatch(ids, mask, len(sub))
        return np.concatenate(
            [np.asarray(emb[:n], dtype=np.float32) for emb, n in pending], axis=0
        )

    def embed_images_batch(self, images: Sequence[np.ndarray]) -> np.ndarray:
        """(n, 512) L2-normalized CLIP image embeddings from uint8 RGB arrays
        (reference ``embed_images_batch``, ``app/ml/embeddings.py:73-91``).

        Accepts mixed sizes; host does centered-square crop + canvas resize,
        device does fused preprocess + ViT forward.
        """

        if not images:
            return np.zeros((0, self.clip_dim), dtype=np.float32)
        out = [np.asarray(dev[:n], dtype=np.float32)
               for dev, n in self.embed_images_async(images)]
        return np.concatenate(out, axis=0)

    def embed_images_async(self, images: Sequence[np.ndarray]):
        """Yield ``(device_embeddings, n_valid)`` per bucket WITHOUT forcing a
        host readback — the streaming ingest pipeline
        (:mod:`mmrag_tpu.rag.stream`) overlaps the next host decode with the
        in-flight device forward; ``np.asarray(dev[:n])`` later synchronizes.
        """

        from ..ops.images import stack_square_crops

        params = self._ensure_clip()
        tpu = self.cfg.tpu
        max_batch = tpu.image_batch_buckets[-1]
        for start in range(0, len(images), max_batch):
            chunk = images[start : start + max_batch]
            n = len(chunk)
            batch = stack_square_crops(chunk, canvas=224)
            bsz = self._round_batch(_bucket(n, tpu.image_batch_buckets))
            batch = _pad_rows(batch, bsz)
            yield self._clip_image_fn(params, jnp.asarray(batch)), n

    def embed_image_files(self, paths: Sequence[str]) -> np.ndarray:
        """Decode image files on host and embed (reference passes paths)."""

        from PIL import Image

        images = []
        for path in paths:
            with Image.open(path) as img:
                images.append(np.asarray(img.convert("RGB")))
        return self.embed_images_batch(images)

    def embed_query_for_images(self, query: str) -> np.ndarray:
        """(512,) L2-normalized CLIP text embedding
        (reference ``embed_query_for_images``, ``app/ml/embeddings.py:94-105``)."""

        return self.embed_queries_for_images([query])[0]

    def embed_queries_for_images(self, queries: Sequence[str]) -> np.ndarray:
        """(n, 512) CLIP text embeddings in one bucketed dispatch — the batch
        form behind cross-request micro-batching
        (:class:`mmrag_tpu.serving.batcher.QueryEmbedBatcher`)."""

        if not queries:
            return np.zeros((0, self.clip_dim), dtype=np.float32)
        params = self._ensure_clip()
        buckets = self.cfg.tpu.text_batch_buckets
        out = []
        max_batch = _capped_batch(buckets, 77)  # CLIP text is fixed seq-77
        for start in range(0, len(queries), max_batch):
            chunk = list(queries[start : start + max_batch])
            ids, mask = self._clip_tok.encode(chunk, max_len=77)
            bsz = self._round_batch(_bucket(len(chunk), buckets))
            ids, mask = _pad_rows(ids, bsz), _pad_rows(mask, bsz)
            emb = self._clip_text_fn(params, jnp.asarray(ids), jnp.asarray(mask))
            out.append(np.asarray(emb[: len(chunk)], dtype=np.float32))
        return np.concatenate(out, axis=0)

    def embed_queries_device(self, queries: Sequence[str]):
        """Dual query embed (MiniLM + CLIP text towers) with NO host sync:
        returns ``((n, 384), (n, 512))`` device arrays with both dispatches
        in flight, so the serving hot path can chain the masked top-k search
        onto them and pay ONE readback for the whole embed→search phase
        instead of a tunnel round-trip per stage. Shapes/buckets are
        identical to :meth:`embed_text_batch` /
        :meth:`embed_queries_for_images`, so no extra executables compile."""

        n = len(queries)
        tpu = self.cfg.tpu
        max_batch = tpu.text_batch_buckets[-1]
        if n == 0 or n > max_batch:  # beyond one bucket: host path chunks
            return (
                jnp.asarray(self.embed_text_batch(queries)),
                jnp.asarray(self.embed_queries_for_images(queries)),
            )
        bparams = self._ensure_minilm()
        cparams = self._ensure_clip()
        bsz = self._round_batch(_bucket(n, tpu.text_batch_buckets))
        btok = self._bert_tok
        tokenized = [btok.tokenize_ids(t) for t in queries]
        if tpu.text_embed_max_len:
            tokenized = [t[: tpu.text_embed_max_len - 2] for t in tokenized]
        longest = max((len(t) for t in tokenized), default=1) + 2
        seq = _bucket(longest, tpu.text_seq_buckets)
        if bsz * seq > _DISPATCH_TOKEN_CAP:  # long queries at a wide bucket
            return (
                jnp.asarray(self.embed_text_batch(queries)),
                jnp.asarray(self.embed_queries_for_images(queries)),
            )
        seqs = [[btok.cls_id, *t[: seq - 2], btok.sep_id] for t in tokenized]
        ids, mask = tok._pad_batch(seqs, seq, btok.pad_id)
        ids, mask = _pad_rows(ids, bsz), _pad_rows(mask, bsz)
        temb = self._minilm_fn(bparams, jnp.asarray(ids), jnp.asarray(mask))
        cids, cmask = self._clip_tok.encode(list(queries), max_len=77)
        cids, cmask = _pad_rows(cids, bsz), _pad_rows(cmask, bsz)
        cemb = self._clip_text_fn(cparams, jnp.asarray(cids), jnp.asarray(cmask))
        return temb[:n].astype(jnp.float32), cemb[:n].astype(jnp.float32)

    def rerank_scores(self, query: str, passages: Sequence[str]) -> np.ndarray:
        """(n,) cross-encoder relevance logits for (query, passage) pairs
        (reference CrossEncoder.predict, ``app/ml/retrieve.py:148``)."""

        return self.rerank_pairs([query] * len(passages), passages)

    def _rerank_chunks(self, n_pairs: int) -> list:
        """The (start, length, padded_batch) decomposition a rerank call
        over ``n_pairs`` pairs dispatches — THE single definition of the
        chunking, shared by ``rerank_pairs`` (which executes it) and
        ``rerank_bucket_sizes`` (which predicts it for the serving warmup),
        so the two can never desynchronize."""

        tpu = self.cfg.tpu
        max_batch = _capped_batch(tpu.text_batch_buckets, tpu.rerank_seq_len)
        chunks = []
        for start in range(0, max(n_pairs, 1), max_batch):
            length = min(max_batch, n_pairs - start) if n_pairs else 1
            chunks.append((start, length, self._round_batch(
                _bucket(length, tpu.text_batch_buckets))))
        return chunks

    def rerank_bucket_sizes(self, n_pairs: int) -> tuple:
        """The padded batch sizes a ``rerank_pairs`` call over ``n_pairs``
        pairs would dispatch — lets the serving warmup sweep skip coalesce
        lengths whose cross-encoder executables are already compiled
        instead of re-running O(max^2 x rerank_topk) redundant pair
        inferences."""

        return tuple(bsz for _, _, bsz in self._rerank_chunks(n_pairs))

    def rerank_pairs(
        self, queries: Sequence[str], passages: Sequence[str]
    ) -> np.ndarray:
        """(n,) logits for arbitrary (query_i, passage_i) pairs in one
        bucketed dispatch — lets the retrieval batcher rerank every coalesced
        request's candidates together instead of one cross-encoder call per
        request."""

        if not passages:
            return np.zeros((0,), dtype=np.float32)
        if len(queries) != len(passages):
            raise ValueError(f"{len(queries)} queries for {len(passages)} passages")
        params = self._ensure_cross()
        seq = self.cfg.tpu.rerank_seq_len
        out = []
        for start, length, bsz in self._rerank_chunks(len(passages)):
            qs = list(queries[start : start + length])
            ps = list(passages[start : start + length])
            ids, mask, tt = self._bert_tok.encode_pairs(qs, ps, seq)
            ids, mask, tt = _pad_rows(ids, bsz), _pad_rows(mask, bsz), _pad_rows(tt, bsz)
            scores = self._cross_fn(
                params, jnp.asarray(ids), jnp.asarray(mask), jnp.asarray(tt)
            )
            # slice on HOST: a device-side scores[:n] is a per-exact-length
            # executable (the r4 warm-window lesson) compiled lazily inside
            # a request; the padded vector is tiny, read it all back
            out.append(np.asarray(scores, dtype=np.float32)[: len(ps)])
        return np.concatenate(out, axis=0)


_runtime: Optional[EncoderRuntime] = None
_runtime_lock = threading.Lock()


def get_runtime(cfg: Optional[Settings] = None) -> EncoderRuntime:
    """Process-wide lazy singleton (reference lazy-global pattern)."""

    global _runtime
    with _runtime_lock:
        if _runtime is None or (cfg is not None and _runtime.cfg is not cfg):
            _runtime = EncoderRuntime(cfg)
    return _runtime


def reset_runtime() -> None:
    """Test hook."""

    global _runtime
    with _runtime_lock:
        _runtime = None
