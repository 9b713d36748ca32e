"""Host-side rendering and video recording (reference viewer/VideoRecorder
capability, base.py:75-76, 331-337): EGL off-screen frames from env states,
recorded replays, mp4->gif conversion, Gymnasium render()."""

import numpy as np
import pytest

import jax

import loco_mujoco_tpu as lmt


@pytest.fixture(scope="module")
def env():
    return lmt.make("UnitreeA1.simple.real", debug=True)


def test_render_state_frame(env):
    state = jax.jit(env.reset)(jax.random.PRNGKey(0))
    frame = env.render_state(state)
    assert frame.shape == (480, 640, 3) and frame.dtype == np.uint8
    assert frame.std() > 1.0  # not a blank buffer


def test_play_trajectory_records_gif(env, tmp_path):
    out = tmp_path / "a1.gif"
    obs = env.play_trajectory(
        n_episodes=1, n_steps_per_episode=5,
        record=True, recorder_params=dict(path=out, fps=10),
    )
    assert obs.shape[0] == 5
    assert out.exists() and out.stat().st_size > 1000


def test_video_recorder_mp4_and_gif(tmp_path):
    from loco_mujoco_tpu.envs.rendering import VideoRecorder
    from loco_mujoco_tpu.utils.video import video2gif

    rec = VideoRecorder(path=tmp_path / "clip.mp4", fps=10)
    rng = np.random.default_rng(0)
    for _ in range(8):
        rec(rng.integers(0, 255, (64, 96, 3), dtype=np.uint8))
    path = rec.stop()
    assert path.exists() and path.stat().st_size > 500

    gif = video2gif(str(path), fps=5)
    import os

    assert os.path.exists(gif) and os.path.getsize(gif) > 500


def test_gym_wrapper_render(env):
    from loco_mujoco_tpu.envs.gymnasium_env import GymnasiumWrapper

    gym_env = GymnasiumWrapper(_prebuilt_env=env, render_mode="rgb_array")
    gym_env.reset(seed=0)
    frame = gym_env.render()
    assert frame.shape[-1] == 3 and frame.dtype == np.uint8


def test_camera_modes(env):
    state = jax.jit(env.reset)(jax.random.PRNGKey(1))
    qpos = np.asarray(state.data.qpos)
    r = env._get_renderer()
    for mode in ("static", "follow", "top_static"):
        frame = r.render(qpos, camera_mode=mode)
        assert frame.shape == (480, 640, 3)
