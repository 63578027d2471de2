"""Native host runtime: ctypes bindings over ``host_runtime.cpp``.

The reference gets its host-side native speed from third-party libs (LanceDB's
Rust storage engine, OpenCV, imagehash — SURVEY §2b). This package supplies
the equivalent first-party C++ for the loops that sit on *our* host paths:

  * ``f32_to_bf16`` / ``bf16_to_f32`` — slab dtype conversion for HBM-ready
    on-disk shards (lance columnar encode/decode analogue)
  * ``gather_rows`` — compaction rewrite (lance fragment rewrite analogue)
  * ``hamming_dedup`` — the reference's O(n²) Python phash loop
    (``/root/reference/app/ingest/frames.py:87-95``) with popcount
  * ``merge_topk`` — cross-shard top-k merge on host (LanceDB's Rust ANN
    result merge analogue); the on-device merge lives in
    :mod:`mmrag_tpu.parallel.sharded_index`
  * ``l2_normalize_rows`` — normalize-on-write
    (``app/storage/lancedb_store.py:63-69``)
  * ``wordpiece_create``/``NativeWordPiece`` — ASCII fast-path WordPiece,
    the HF Rust-tokenizers role (``app/ml/embeddings.py:52-105``); 4.5x the
    pure-Python tokenizer on ingest-shaped 512-token chunks

The library is compiled on demand with g++ (no pybind11 in this image; plain
C ABI + ctypes). Every function has a numpy fallback, so the framework is
fully functional without a compiler; set ``MMRAG_NATIVE=0`` to force the
fallbacks.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import Dict, List, Optional, Tuple

import numpy as np

_HERE = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_HERE, "host_runtime.cpp")
_SO = os.path.join(_HERE, "libmmrag_host.so")
_ABI_VERSION = 3

_lock = threading.Lock()
_lib: Optional[ctypes.CDLL] = None
_build_failed = False


def _compile() -> bool:
    # pid-unique temp: concurrent builds from multiple worker processes must
    # not replace the .so with a file another process's g++ is still writing
    tmp = f"{_SO}.{os.getpid()}.tmp"
    cmd = ["g++", "-O3", "-shared", "-fPIC", "-std=c++17", "-pthread", "-o", tmp, _SRC]
    try:
        subprocess.run(cmd, check=True, capture_output=True, timeout=120)
        os.replace(tmp, _SO)
        return True
    except (OSError, subprocess.SubprocessError):
        try:
            os.unlink(tmp)
        except OSError:
            pass
        return False


def _bind(lib: ctypes.CDLL) -> ctypes.CDLL:
    i64, i32, u8 = ctypes.c_int64, ctypes.c_int32, ctypes.c_uint8
    f32p = np.ctypeslib.ndpointer(np.float32, flags="C_CONTIGUOUS")
    u16p = np.ctypeslib.ndpointer(np.uint16, flags="C_CONTIGUOUS")
    u64p = np.ctypeslib.ndpointer(np.uint64, flags="C_CONTIGUOUS")
    i64p = np.ctypeslib.ndpointer(np.int64, flags="C_CONTIGUOUS")
    i32p = np.ctypeslib.ndpointer(np.int32, flags="C_CONTIGUOUS")
    u8p = np.ctypeslib.ndpointer(np.uint8, flags="C_CONTIGUOUS")
    lib.mmrag_abi_version.restype = i32
    lib.mmrag_f32_to_bf16.argtypes = [f32p, u16p, i64]
    lib.mmrag_bf16_to_f32.argtypes = [u16p, f32p, i64]
    lib.mmrag_gather_rows_f32.argtypes = [f32p, i64p, i64, i64, f32p]
    lib.mmrag_hamming_dedup.argtypes = [u64p, i64, i32, u8p]
    lib.mmrag_hamming_dedup.restype = i64
    lib.mmrag_hamming_matrix.argtypes = [u64p, i64, u64p, i64, i32p]
    lib.mmrag_merge_topk.argtypes = [f32p, i64p, i64, i64, i64, f32p, i64p]
    lib.mmrag_l2_normalize_rows.argtypes = [f32p, i64, i64]
    lib.mmrag_wp_create.argtypes = [ctypes.c_char_p, i64]
    lib.mmrag_wp_create.restype = ctypes.c_void_p
    lib.mmrag_wp_destroy.argtypes = [ctypes.c_void_p]
    lib.mmrag_wp_tokenize.argtypes = [
        ctypes.c_void_p, ctypes.c_char_p, i64, i32, i32p, i64
    ]
    lib.mmrag_wp_tokenize.restype = i64
    lib.mmrag_wp_tokenize_batch.argtypes = [
        ctypes.c_void_p, ctypes.c_char_p, i64p, i64, i32, i32p, i64, i64p
    ]
    return lib


def load() -> Optional[ctypes.CDLL]:
    """Load (building if needed) the native library, or None on any failure."""

    global _lib, _build_failed
    if os.environ.get("MMRAG_NATIVE", "1") == "0":
        return None
    with _lock:
        if _lib is not None:
            return _lib
        if _build_failed:
            return None
        needs_build = not os.path.exists(_SO) or (
            os.path.exists(_SRC)
            and os.path.getmtime(_SRC) > os.path.getmtime(_SO)
        )
        if needs_build and not _compile():
            _build_failed = True
            return None
        for attempt in range(2):
            try:
                # AttributeError covers a stale .so missing newly bound
                # symbols (the ABI check can't run until binding succeeds)
                lib = _bind(ctypes.CDLL(_SO))
                if lib.mmrag_abi_version() != _ABI_VERSION:
                    raise OSError("ABI version mismatch")
                _lib = lib
                return _lib
            except (OSError, AttributeError):
                # a stale-but-newer .so (fresh clone, partial copy) binds
                # badly even though the source compiles — rebuild once from
                # source before giving up on native for the process lifetime
                if attempt == 0 and os.path.exists(_SRC) and _compile():
                    continue
                _build_failed = True
                return None
        return None


def available() -> bool:
    return load() is not None


# ---- public API (native with numpy fallback) --------------------------------


def f32_to_bf16(x: np.ndarray) -> np.ndarray:
    """Round-to-nearest-even f32 -> bf16 (as uint16 bit pattern carrier)."""

    x = np.ascontiguousarray(x, dtype=np.float32)
    lib = load()
    out = np.empty(x.shape, dtype=np.uint16)
    if lib is not None:
        lib.mmrag_f32_to_bf16(x.reshape(-1), out.reshape(-1), x.size)
        return out
    import ml_dtypes

    return x.astype(ml_dtypes.bfloat16).view(np.uint16)


def bf16_to_f32(bits: np.ndarray) -> np.ndarray:
    bits = np.ascontiguousarray(bits, dtype=np.uint16)
    lib = load()
    if lib is not None:
        out = np.empty(bits.shape, dtype=np.float32)
        lib.mmrag_bf16_to_f32(bits.reshape(-1), out.reshape(-1), bits.size)
        return out
    import ml_dtypes

    return bits.view(ml_dtypes.bfloat16).astype(np.float32)


def gather_rows(src: np.ndarray, rows: np.ndarray) -> np.ndarray:
    """``src[rows]`` for 2-D f32 arrays (threaded memcpy when native)."""

    src = np.ascontiguousarray(src, dtype=np.float32)
    rows = np.ascontiguousarray(rows, dtype=np.int64)
    # the native path is unchecked pointer arithmetic — reject out-of-range
    # ids (including numpy's negative wrap, which no caller intends) before
    # they read arbitrary memory
    if rows.size and (rows.min() < 0 or rows.max() >= src.shape[0]):
        raise IndexError(
            f"gather_rows: ids outside [0, {src.shape[0]}) "
            f"(min {int(rows.min())}, max {int(rows.max())})"
        )
    lib = load()
    if lib is None or src.ndim != 2:
        return src[rows]
    out = np.empty((rows.size, src.shape[1]), dtype=np.float32)
    lib.mmrag_gather_rows_f32(src, rows, rows.size, src.shape[1], out)
    return out


def hamming_dedup(hashes: np.ndarray, max_dist: int) -> np.ndarray:
    """Greedy in-order dedup of 64-bit hashes; returns a bool keep-mask.

    Sequential semantics match the reference loop
    (``app/ingest/frames.py:87-95``): a hash is kept iff it differs by more
    than ``max_dist`` bits from every previously *kept* hash.
    """

    hashes = np.ascontiguousarray(hashes, dtype=np.uint64)
    n = hashes.size
    if n == 0:
        return np.zeros(0, dtype=bool)
    lib = load()
    if lib is not None:
        keep = np.empty(n, dtype=np.uint8)
        lib.mmrag_hamming_dedup(hashes, n, int(max_dist), keep)
        return keep.astype(bool)
    keep_mask = np.zeros(n, dtype=bool)
    kept: list = []
    for i in range(n):
        h = int(hashes[i])
        if all(bin(h ^ k).count("1") > max_dist for k in kept):
            keep_mask[i] = True
            kept.append(h)
    return keep_mask


def hamming_matrix(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    a = np.ascontiguousarray(a, dtype=np.uint64)
    b = np.ascontiguousarray(b, dtype=np.uint64)
    lib = load()
    if lib is not None:
        out = np.empty((a.size, b.size), dtype=np.int32)
        lib.mmrag_hamming_matrix(a, a.size, b, b.size, out)
        return out
    x = a[:, None] ^ b[None, :]
    return np.unpackbits(x.view(np.uint8).reshape(a.size, b.size, 8), axis=-1).sum(
        -1, dtype=np.int32
    )


def merge_topk(
    scores: np.ndarray, ids: np.ndarray, k: int
) -> Tuple[np.ndarray, np.ndarray]:
    """Merge per-shard top-k lists: (shards, q, k') -> global (q, k).

    Ties break toward the smaller id; filler slots (when fewer than ``k``
    real candidates exist) carry score -1e30 / id -1.
    """

    scores = np.ascontiguousarray(scores, dtype=np.float32)
    ids = np.ascontiguousarray(ids, dtype=np.int64)
    shards, q, kin = scores.shape
    lib = load()
    if lib is not None and kin == k:
        out_s = np.empty((q, k), dtype=np.float32)
        out_i = np.empty((q, k), dtype=np.int64)
        lib.mmrag_merge_topk(scores, ids, shards, q, k, out_s, out_i)
        return out_s, out_i
    flat_s = scores.transpose(1, 0, 2).reshape(q, shards * kin)
    flat_i = ids.transpose(1, 0, 2).reshape(q, shards * kin)
    # sort by (-score, id) for deterministic ties
    order = np.lexsort((flat_i, -flat_s), axis=-1)[:, :k]
    out_s = np.take_along_axis(flat_s, order, axis=-1)
    out_i = np.take_along_axis(flat_i, order, axis=-1)
    if order.shape[1] < k:
        pad = k - order.shape[1]
        out_s = np.pad(out_s, ((0, 0), (0, pad)), constant_values=-1e30)
        out_i = np.pad(out_i, ((0, 0), (0, pad)), constant_values=-1)
    return out_s, out_i


class NativeWordPiece:
    """ASCII fast-path WordPiece over the C++ kernel in ``host_runtime.cpp``.

    Plays the role sentence-transformers delegates to HF's Rust ``tokenizers``
    crate (reference ``app/ml/embeddings.py:52-105``): tokenization off the
    Python interpreter so ingest keeps pace with the device embed rate.
    ``tokenize`` returns None for input the kernel declines (non-ASCII bytes)
    — the caller must then use its pure-Python path, whose unicode handling
    the kernel deliberately does not replicate.
    """

    def __init__(self, lib: ctypes.CDLL, handle: int, unk_id: int) -> None:
        self._lib = lib
        self._handle = handle
        self._unk_id = unk_id
        # bound method survives interpreter-shutdown teardown ordering
        self._destroy = lib.mmrag_wp_destroy

    def __del__(self) -> None:  # pragma: no cover - lifecycle
        handle, self._handle = self._handle, None
        if handle:
            try:
                self._destroy(handle)
            except Exception:
                pass

    def tokenize(self, text: str) -> Optional[List[int]]:
        data = text.encode("utf-8")
        # every output token consumes >= 1 input char, so len+1 bounds it
        cap = len(data) + 8
        out = np.empty(cap, dtype=np.int32)
        n = self._lib.mmrag_wp_tokenize(
            self._handle, data, len(data), self._unk_id, out, cap
        )
        if n < 0:  # NON_ASCII / OVERFLOW -> caller's Python path
            return None
        return out[:n].tolist()

    def tokenize_batch(self, data: List[bytes], out: np.ndarray) -> np.ndarray:
        """Tokenize every text into the rows of a preallocated C-contiguous
        ``(n, cap)`` int32 matrix in ONE C call — the kernel threads across
        rows, and no per-token Python lists are materialized. Returns the
        ``(n,)`` int64 token counts; a negative entry is a kernel decline
        (non-ASCII / row too small) whose row the caller must redo in
        Python."""

        n = len(data)
        lengths = np.empty(n, dtype=np.int64)
        if n == 0:
            return lengths
        offsets = np.zeros(n + 1, dtype=np.int64)
        np.cumsum([len(d) for d in data], out=offsets[1:])
        self._lib.mmrag_wp_tokenize_batch(
            self._handle, b"".join(data), offsets, n, self._unk_id,
            out, out.shape[1], lengths,
        )
        return lengths


def wordpiece_create(vocab: Dict[str, int], unk_id: int) -> Optional[NativeWordPiece]:
    """Build a native WordPiece matcher, or None when unavailable.

    The kernel indexes pieces by vocab-file line number, so the dict must be
    a dense id space (0..n-1, the shape ``from_vocab_file`` produces); sparse
    or newline-containing vocabs fall back to pure Python.
    """

    lib = load()
    if lib is None:
        return None
    n = len(vocab)
    tokens_by_id: List[Optional[str]] = [None] * n
    for tok, tid in vocab.items():
        if not 0 <= tid < n or tokens_by_id[tid] is not None or "\n" in tok:
            return None
        tokens_by_id[tid] = tok
    blob = "\n".join(tokens_by_id).encode("utf-8")  # type: ignore[arg-type]
    handle = lib.mmrag_wp_create(blob, len(blob))
    if not handle:
        return None
    return NativeWordPiece(lib, handle, unk_id)


def l2_normalize_rows(x: np.ndarray) -> np.ndarray:
    """Zero-safe row normalization, in a fresh array (reference
    ``app/ml/embeddings.py:46-49``)."""

    x = np.ascontiguousarray(x, dtype=np.float32).copy()
    lib = load()
    if lib is not None and x.ndim == 2:
        lib.mmrag_l2_normalize_rows(x, x.shape[0], x.shape[1])
        return x
    norms = np.linalg.norm(x, axis=-1, keepdims=True)
    return np.where(norms > 1e-12, x / np.maximum(norms, 1e-12), x)
