"""Host-side rendering and video recording.

The reference renders through mushroom-rl's viewer (interactive GLFW
window, camera modes "static" / "follow" / "top_static" — reference
base.py:75-76) and records via its VideoRecorder (base.py:331-337). A
batched TPU framework has no interactive per-env window; the TPU-native
equivalent is a HOST-side replay renderer: the env keeps its oracle-twin
MjModel, and any qpos stream (a rollout slice brought back from the chip,
or a kinematic replay) is rendered with mujoco.Renderer over EGL —
off-screen, no display needed.

`MujocoRenderer.render(qpos)` -> (H, W, 3) uint8; `VideoRecorder` collects
frames into an mp4 (cv2) or animated gif (PIL) depending on the output
suffix. `utils.video.video2gif` converts recordings like the reference's
ffmpeg helper (video.py:4-14).
"""

from __future__ import annotations

import os
from pathlib import Path

import numpy as np

# MuJoCo's EGL backend needs both switches before the first GL import;
# set defaults so headless rendering works out of the box
os.environ.setdefault("MUJOCO_GL", "egl")
os.environ.setdefault("PYOPENGL_PLATFORM", os.environ["MUJOCO_GL"])

CAMERA_MODES = ("static", "follow", "top_static")


class MujocoRenderer:
    """Off-screen renderer on the env's host MjModel (oracle twin).

    Camera modes mirror the reference viewer's `default_camera_mode`:
    "static" looks at the spawn point, "follow" tracks the root body,
    "top_static" looks straight down.
    """

    def __init__(self, mj_model, width: int = 640, height: int = 480,
                 default_camera_mode: str = "static"):
        import mujoco

        assert default_camera_mode in CAMERA_MODES, default_camera_mode
        self._mujoco = mujoco
        self.model = mj_model
        self.data = mujoco.MjData(mj_model)
        self.mode = default_camera_mode
        self._renderer = mujoco.Renderer(mj_model, height, width)
        self._cam = mujoco.MjvCamera()
        mujoco.mjv_defaultFreeCamera(mj_model, self._cam)
        self._cam.distance = 4.0
        if default_camera_mode == "top_static":
            self._cam.elevation = -90.0
        else:
            self._cam.elevation = -20.0

    def render(self, qpos, qvel=None, camera_mode: str | None = None):
        """Set the state, run FK, return an (H, W, 3) uint8 frame."""
        mujoco = self._mujoco
        self.data.qpos[:] = np.asarray(qpos)
        if qvel is not None:
            self.data.qvel[:] = np.asarray(qvel)
        mujoco.mj_forward(self.model, self.data)
        mode = camera_mode or self.mode
        if mode == "follow":
            # track the root subtree com in the horizontal plane
            com = self.data.subtree_com[min(1, self.model.nbody - 1)]
            self._cam.lookat[:] = [com[0], com[1], 1.0]
        self._renderer.update_scene(self.data, camera=self._cam)
        return self._renderer.render()

    def close(self):
        self._renderer.close()


class VideoRecorder:
    """Frame sink mirroring mushroom-rl's VideoRecorder call contract
    (reference base.py:331-337: constructed with a path+fps, called per
    frame, `stop()` finalizes). Writes .mp4 via cv2 or .gif via PIL."""

    def __init__(self, path="recording.mp4", fps: int = 100, tag=None):
        if tag is not None:  # reference recorder_params use `tag`/`video_name`
            path = Path(path).with_name(f"{tag}{Path(path).suffix}")
        self.path = Path(path)
        self.fps = int(fps)
        self._frames: list = []
        self._writer = None

    def __call__(self, frame):
        frame = np.asarray(frame, dtype=np.uint8)
        if self.path.suffix == ".mp4":
            if self._writer is None:
                import cv2

                self.path.parent.mkdir(parents=True, exist_ok=True)
                h, w = frame.shape[:2]
                self._writer = cv2.VideoWriter(
                    str(self.path),
                    cv2.VideoWriter_fourcc(*"mp4v"),
                    self.fps, (w, h),
                )
            import cv2

            self._writer.write(cv2.cvtColor(frame, cv2.COLOR_RGB2BGR))
        else:
            self._frames.append(frame)

    def stop(self):
        if self._writer is not None:
            self._writer.release()
            self._writer = None
        elif self._frames:
            from PIL import Image

            self.path.parent.mkdir(parents=True, exist_ok=True)
            imgs = [Image.fromarray(f) for f in self._frames]
            imgs[0].save(
                self.path, save_all=True, append_images=imgs[1:],
                duration=max(1, int(1000 / self.fps)), loop=0,
            )
            self._frames = []
        return self.path
