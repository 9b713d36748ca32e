"""Video helpers (reference `loco_mujoco/utils/video.py`)."""

from __future__ import annotations

import os
import subprocess


def video2gif(video_path: str, fps: int = 25, out_path: str | None = None):
    """mp4 -> gif (reference video.py:4-14). Uses ffmpeg when present
    (the reference's exact pipeline), otherwise decodes with cv2 and
    encodes with PIL — same result without the external binary."""
    if out_path is None:
        out_path = os.path.splitext(video_path)[0] + ".gif"
    import shutil

    if shutil.which("ffmpeg"):
        cmd = (
            f'ffmpeg -y -i "{video_path}" -vf "fps={fps},scale=640:-1:'
            f'flags=lanczos" -loop 0 "{out_path}"'
        )
        subprocess.run(cmd, shell=True, check=True)
        return out_path

    import cv2
    from PIL import Image

    cap = cv2.VideoCapture(video_path)
    src_fps = cap.get(cv2.CAP_PROP_FPS) or fps
    stride = max(1, round(src_fps / fps))
    frames, i = [], 0
    while True:
        ok, frame = cap.read()
        if not ok:
            break
        if i % stride == 0:
            rgb = cv2.cvtColor(frame, cv2.COLOR_BGR2RGB)
            h, w = rgb.shape[:2]
            if w != 640:
                rgb = cv2.resize(rgb, (640, int(h * 640 / w)))
            frames.append(Image.fromarray(rgb))
        i += 1
    cap.release()
    if not frames:
        raise ValueError(f"no frames decoded from {video_path}")
    frames[0].save(
        out_path, save_all=True, append_images=frames[1:],
        duration=max(1, int(1000 / fps)), loop=0,
    )
    return out_path
