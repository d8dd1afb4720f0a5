"""Video decoding (counterpart of reference ``slowfast/datasets/decoder.py``).

The reference uses PyAV/torchvision (neither available here); decode goes
through OpenCV's FFmpeg bindings instead. Temporal sampling semantics are
kept: ``get_start_end_idx`` places the clip (random for train, uniform for
multi-view test) and ``temporal_sampling`` linspace-samples NUM_FRAMES.
"""

from __future__ import annotations

import numpy as np

from focus_tpu.utils import logging

logger = logging.get_logger(__name__)


def temporal_sampling(frames: np.ndarray, start_idx, end_idx, num_samples):
    """linspace index-select (reference decoder.py:11-28)."""
    index = np.linspace(start_idx, end_idx, num_samples)
    index = np.clip(index, 0, frames.shape[0] - 1).astype(np.int64)
    return frames[index]


def get_start_end_idx(video_size, clip_size, clip_idx, num_clips, rng=None,
                      use_offset=False):
    """(reference decoder.py:31-69, incl. the ``use_offset`` variant —
    cfg.DATA.USE_OFFSET_SAMPLING: center the single test clip / space
    num_clips inclusively across the full span)"""
    import math

    delta = max(video_size - clip_size, 0)
    if clip_idx == -1:
        rng = rng or np.random.RandomState()
        start_idx = rng.uniform(0, delta)
    elif use_offset:
        if num_clips == 1:
            start_idx = math.floor(delta / 2)
        else:
            start_idx = clip_idx * math.floor(delta / (num_clips - 1))
    else:
        start_idx = delta * clip_idx / num_clips
    end_idx = start_idx + clip_size - 1
    return start_idx, end_idx


def decode_video_cv2(path: str, max_frames: int = 100000):
    """Decode all frames of a video file to [T, H, W, C] uint8 RGB."""
    import cv2

    cap = cv2.VideoCapture(path)
    if not cap.isOpened():
        return None, 30.0
    fps = cap.get(cv2.CAP_PROP_FPS) or 30.0
    frames = []
    while len(frames) < max_frames:
        ok, frame = cap.read()
        if not ok:
            break
        frames.append(frame[:, :, ::-1])  # BGR -> RGB
    cap.release()
    if not frames:
        return None, fps
    return np.stack(frames), fps


def probe_video_cv2(path: str):
    """Container metadata without decoding: (frame_count, fps) or None.

    Mirrors the reference's use of ``container.streams.video[0].frames``
    and ``average_rate`` (reference decoder.py:259-265) to place the clip
    before any frame is decoded."""
    import cv2

    cap = cv2.VideoCapture(path)
    if not cap.isOpened():
        return None
    total = int(cap.get(cv2.CAP_PROP_FRAME_COUNT))
    fps = cap.get(cv2.CAP_PROP_FPS) or 30.0
    cap.release()
    if total <= 0 or fps <= 0:
        return None
    return total, fps


def decode_window_cv2(path: str, start: int, end: int):
    """Decode only frames [start, end] (inclusive) to uint8 RGB.

    The selective-seek counterpart of the reference's PTS seek
    (reference decoder.py:229-302): seek once to the window start
    (OpenCV seeks to the nearest keyframe and rolls forward, the same
    strategy PyAV uses), then read the window sequentially. Returns
    None if the seek lands wrong or the window comes back empty."""
    import cv2

    cap = cv2.VideoCapture(path)
    if not cap.isOpened():
        return None
    if start > 0:
        cap.set(cv2.CAP_PROP_POS_FRAMES, start)
        if int(cap.get(cv2.CAP_PROP_POS_FRAMES)) != start:
            cap.release()
            return None
    frames = []
    for _ in range(end - start + 1):
        ok, frame = cap.read()
        if not ok:
            break
        frames.append(frame[:, :, ::-1])  # BGR -> RGB
    cap.release()
    if not frames:
        return None
    return np.stack(frames)


def decode(
    path: str,
    sampling_rate: int,
    num_frames: int,
    clip_idx: int = -1,
    num_clips: int = 10,
    target_fps: int = 30,
    rng=None,
    selective: bool = True,
    use_offset: bool = False,
):
    """Decode + temporally sample a clip (reference decoder.py:305-390).

    When ``selective`` (default), only the clip window is decoded — the
    clip is placed from container metadata and the decoder seeks to it
    (reference ``pyav_decode`` decoder.py:229-302), so per-sample decode
    cost is independent of the video's length. Falls back to whole-file
    decode when metadata is unavailable or the seek fails.

    Returns [num_frames, H, W, C] uint8 or None on failure."""
    try:
        meta = probe_video_cv2(path) if selective else None
        if meta is not None:
            total, fps = meta
            clip_size = sampling_rate * num_frames / target_fps * fps
            start_idx, end_idx = get_start_end_idx(
                total, clip_size, clip_idx, num_clips, rng,
                use_offset=use_offset,
            )
            s = max(int(np.floor(start_idx)), 0)
            e = min(int(np.ceil(end_idx)), total - 1)
            frames = decode_window_cv2(path, s, e)
            if frames is not None:
                return temporal_sampling(
                    frames, start_idx - s, end_idx - s, num_frames
                )
        frames, fps = decode_video_cv2(path)
    except Exception as e:  # noqa: BLE001
        logger.warning(f"Failed to decode {path}: {e}")
        return None
    if frames is None:
        return None
    clip_size = sampling_rate * num_frames / target_fps * fps
    start_idx, end_idx = get_start_end_idx(
        frames.shape[0], clip_size, clip_idx, num_clips, rng,
        use_offset=use_offset,
    )
    return temporal_sampling(frames, start_idx, end_idx, num_frames)
