"""Scene-aware video frame extraction with device-side dedup.

Role of the reference's ffmpeg scene extractor (``/root/reference/app/ingest/
frames.py:35-112``) and its richer legacy OpenCV sampler
(``app/data_extraction/youtube_extractor.py:91-154``): sample frames on a
uniform stride, add frames at scene changes, perceptual-hash-dedup, cap at
``max_frames``, persist under ``INGEST_CACHE_DIR/frames/{user}/{doc}``.

TPU-first differences:
  * decode is cv2 on host (ffmpeg subprocess is used when the binary exists
    and ``YT_FRAME_EXTRACTOR=ffmpeg``); everything after decode is batched on
    device — scene scoring is one jitted pass over the sampled stack, and
    dedup is the fused DCT-phash + Hamming kernel
    (:func:`mmrag_tpu.ops.phash.dedup_frames`) instead of the reference's
    O(n^2) Python loop;
  * video frames share one static shape, so the whole post-decode pipeline
    is a single compiled program per video resolution.

Scene score: mean absolute difference of downsampled grayscale between
consecutive sampled frames, normalized to [0, 1] — same role as ffmpeg's
``select=gt(scene,T)`` metric (``frames.py:58-80``).
"""

from __future__ import annotations

import logging
import os
import shutil
import subprocess
from dataclasses import dataclass
from typing import List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.phash import dedup_frames
from ..settings import Settings, settings as _default_settings

logger = logging.getLogger(__name__)


class FrameExtractionError(RuntimeError):
    pass


@dataclass(frozen=True)
class ExtractedFrame:
    path: str
    ts: float  # seconds into the video


@jax.jit
def _scene_scores(stack: jnp.ndarray) -> jnp.ndarray:
    """(n, h, w, 3) uint8 -> (n,) scene-change score vs previous frame.

    Downsample 4x via stride, grayscale, mean |diff| / 255. score[0] = 1.0
    (first frame is always a scene start).
    """

    gray = jnp.mean(stack[:, ::4, ::4, :].astype(jnp.float32), axis=-1)
    diff = jnp.abs(gray[1:] - gray[:-1]).mean(axis=(1, 2)) / 255.0
    return jnp.concatenate([jnp.ones((1,), jnp.float32), diff])


def _decode_sampled_frames(
    video_path: str, stride_sec: float, max_samples: int = 2000
) -> Tuple[np.ndarray, List[float]]:
    """cv2 decode: one frame per stride second. Returns (stack, timestamps)."""

    import cv2

    cap = cv2.VideoCapture(video_path)
    if not cap.isOpened():
        raise FrameExtractionError(f"cannot open video: {video_path}")
    fps = cap.get(cv2.CAP_PROP_FPS) or 25.0
    total = int(cap.get(cv2.CAP_PROP_FRAME_COUNT) or 0)
    step = max(int(round(fps * stride_sec)), 1)
    frames: List[np.ndarray] = []
    stamps: List[float] = []
    idx = 0
    while len(frames) < max_samples:
        ok = cap.grab()
        if not ok:
            break
        if idx % step == 0:
            ok, frame = cap.retrieve()
            if not ok:
                break
            frames.append(cv2.cvtColor(frame, cv2.COLOR_BGR2RGB))
            stamps.append(idx / fps)
        idx += 1
    cap.release()
    if not frames:
        raise FrameExtractionError(f"no frames decoded from {video_path} ({total} reported)")
    return np.stack(frames), stamps


def _ffmpeg_available() -> bool:
    return shutil.which("ffmpeg") is not None


def _decode_with_ffmpeg(
    video_path: str, stride_sec: float, out_dir: str, timeout_sec: int
) -> Tuple[np.ndarray, List[float]]:
    """ffmpeg fps-filter decode to a temp frame dir (used when the binary
    exists; same subprocess+timeout guard as the reference ``frames.py:77``)."""

    import cv2

    tmp = os.path.join(out_dir, "_ffmpeg_tmp")
    os.makedirs(tmp, exist_ok=True)
    cmd = [
        "ffmpeg", "-hide_banner", "-loglevel", "error", "-i", video_path,
        "-vf", f"fps=1/{stride_sec}", "-vsync", "vfr",
        os.path.join(tmp, "f_%05d.png"),
    ]
    try:
        subprocess.run(cmd, check=True, timeout=timeout_sec, capture_output=True)
    except (subprocess.SubprocessError, OSError) as exc:
        raise FrameExtractionError(f"ffmpeg failed: {exc}") from exc
    files = sorted(os.listdir(tmp))
    frames, stamps = [], []
    for i, name in enumerate(files):
        img = cv2.imread(os.path.join(tmp, name))
        if img is None:
            continue
        frames.append(cv2.cvtColor(img, cv2.COLOR_BGR2RGB))
        stamps.append(i * stride_sec)
        os.remove(os.path.join(tmp, name))
    os.rmdir(tmp)
    if not frames:
        raise FrameExtractionError("ffmpeg produced no frames")
    return np.stack(frames), stamps


def extract_scene_frames(
    user_id: str,
    document_id: str,
    video_path: str,
    cfg: Optional[Settings] = None,
    return_arrays: bool = False,
):
    """Extract, dedup, cap, and persist key frames.

    Returns ``List[ExtractedFrame]`` (or ``(frames, arrays)`` when
    ``return_arrays`` — the streaming path feeds arrays straight to CLIP
    without re-reading files).
    """

    cfg = cfg or _default_settings
    yt = cfg.youtube
    out_dir = os.path.join(cfg.paths.ingest_cache_dir, "frames", user_id, document_id)
    os.makedirs(out_dir, exist_ok=True)

    use_ffmpeg = yt.frame_extractor == "ffmpeg" or (
        yt.frame_extractor == "auto" and _ffmpeg_available()
    )
    if use_ffmpeg and _ffmpeg_available():
        stack, stamps = _decode_with_ffmpeg(
            video_path, yt.frame_stride_sec, out_dir, yt.timeout_sec
        )
    else:
        stack, stamps = _decode_sampled_frames(video_path, yt.frame_stride_sec)

    # scene gate: keep stride frames that start a scene OR are the periodic
    # baseline (every frame here IS the stride baseline, so the scene score
    # only prioritizes; the dedup + cap do the real pruning)
    scores = np.asarray(_scene_scores(jnp.asarray(stack)))
    order = np.argsort(-scores, kind="stable")  # scene starts first
    scene_first = np.concatenate(
        [order[scores[order] > yt.frame_scene_threshold],
         order[scores[order] <= yt.frame_scene_threshold]]
    )
    # restore temporal order within the budget after dedup below
    kept_rel, _ = dedup_frames(
        jnp.asarray(stack[scene_first]), yt.frame_dedup_delta, yt.max_frames
    )
    kept = np.sort(scene_first[kept_rel])

    import cv2

    frames: List[ExtractedFrame] = []
    arrays: List[np.ndarray] = []
    for rank, i in enumerate(kept):
        ts = stamps[i]
        path = os.path.join(out_dir, f"frame_{rank:04d}_{ts:.1f}.jpg")
        cv2.imwrite(path, cv2.cvtColor(stack[i], cv2.COLOR_RGB2BGR))
        frames.append(ExtractedFrame(path=path, ts=float(ts)))
        if return_arrays:
            arrays.append(stack[i])
    logger.info(
        "frames %s: %d sampled -> %d kept (delta=%d, cap=%d)",
        document_id, len(stamps), len(frames), yt.frame_dedup_delta, yt.max_frames,
    )
    if return_arrays:
        return frames, arrays
    return frames
