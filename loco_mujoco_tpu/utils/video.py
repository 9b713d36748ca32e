"""Video helpers (reference `loco_mujoco/utils/video.py`)."""

from __future__ import annotations

import os
import subprocess


def video2gif(video_path: str, fps: int = 25, out_path: str | None = None):
    """mp4 -> gif via ffmpeg (reference video.py:4-14)."""
    if out_path is None:
        out_path = os.path.splitext(video_path)[0] + ".gif"
    cmd = (
        f'ffmpeg -y -i "{video_path}" -vf "fps={fps},scale=640:-1:'
        f'flags=lanczos" -loop 0 "{out_path}"'
    )
    subprocess.run(cmd, shell=True, check=True)
    return out_path
