"""MP4 writing with graceful fallback (mediapy/ffmpeg are not in this image).

Tries OpenCV's built-in encoder first; if no video backend is available the
frames are written as numbered PNGs next to the requested path so renders are
never lost.
"""

from pathlib import Path
from typing import List

import numpy as np


def write_video(path, frames: List[np.ndarray], fps: int = 24) -> str:
    """frames: list of [H, W, 3] uint8 or [0,1] float. Returns actual output path."""
    path = Path(path)
    path.parent.mkdir(parents=True, exist_ok=True)
    frames_u8 = []
    for frame in frames:
        if frame.dtype != np.uint8:
            frame = (np.clip(frame, 0, 1) * 255).round().astype(np.uint8)
        frames_u8.append(frame)

    try:
        import cv2
        h, w = frames_u8[0].shape[:2]
        writer = cv2.VideoWriter(str(path), cv2.VideoWriter_fourcc(*"mp4v"),
                                 fps, (w, h))
        if writer.isOpened():
            for frame in frames_u8:
                writer.write(cv2.cvtColor(frame, cv2.COLOR_RGB2BGR))
            writer.release()
            if path.exists() and path.stat().st_size > 0:
                return str(path)
    except Exception:
        pass

    # fallback: PNG frame directory
    import imageio.v3 as iio
    frame_dir = path.with_suffix("")
    frame_dir.mkdir(parents=True, exist_ok=True)
    for i, frame in enumerate(frames_u8):
        iio.imwrite(frame_dir / f"frame_{i:05d}.png", frame)
    return str(frame_dir)
