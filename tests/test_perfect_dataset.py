"""Perfect-dataset loading path (reference base.py:499-549 and
unitreeA1.py:354-418): no perfect .npz files ship in the checkout, so these
tests synthesize one with the right layout and check the full conversion →
TrajectoryData → jitted reset chain, including x/y re-integration from
velocities with per-trajectory resets and the A1's dir-arrow reconstruction.
"""

import os

import jax
import numpy as np
import pytest

import loco_mujoco_tpu as lmt
from loco_mujoco_tpu.datasets.trajectory import load_dataset_and_get_traj_files


@pytest.fixture
def a1_env():
    return lmt.make("UnitreeA1.simple.real", debug=True)


def _synth_perfect(tmp_path, obs_dim, T=60, n_act=8, dir_arrow=False, seed=0):
    rng = np.random.default_rng(seed)
    states = rng.normal(size=(T, obs_dim)) * 0.1
    if dir_arrow:
        ang = np.linspace(0, 2 * np.pi, T)
        states[:, -2] = np.cos(ang)
        states[:, -1] = np.sin(ang)
    last = np.zeros(T)
    last[T // 2 - 1] = 1
    last[-1] = 1
    path = os.path.join(str(tmp_path), "perfect_expert_dataset_det.npz")
    np.savez(
        path, states=states, last=last, actions=rng.normal(size=(T, n_act))
    )
    return path, states, last


def test_xy_reintegration(tmp_path):
    """Global x re-integrates from dq columns and resets at traj bounds."""
    keys = ["q_x", "q_y", "q_a", "dq_x", "dq_y", "dq_a"]
    T = 10
    states = np.zeros((T, 4))
    states[:, 1] = 1.0  # dq_x == 1 everywhere
    last = np.zeros(T)
    last[4] = 1
    last[-1] = 1
    path = os.path.join(str(tmp_path), "d.npz")
    np.savez(path, states=states, last=last)
    tf = load_dataset_and_get_traj_files(path, keys, freq=100)
    dt = 0.01
    expect = np.array([0, dt, 2 * dt, 3 * dt, 4 * dt, 0, dt, 2 * dt, 3 * dt, 4 * dt])
    np.testing.assert_allclose(tf["q_x"], expect, atol=1e-12)
    np.testing.assert_allclose(tf["split_points"], [0, 5, 10])
    assert "actions" not in tf or tf["actions"] is not None


def test_a1_perfect_chain(tmp_path, a1_env):
    from loco_mujoco_tpu.models.quadrupeds.unitree_a1 import _obs_spec

    keys = [k for k, *_ in _obs_spec()]
    obs_dim = (len(keys) - 3) + 2  # scalars minus globals, plus cos/sin
    path, states, last = _synth_perfect(tmp_path, obs_dim, dir_arrow=True)

    tf = a1_env.load_dataset_and_get_traj_files(path, freq=100)
    T = len(states)
    assert tf["dir_arrow"].shape == (T, 9)
    # rot mats orthonormal and consistent with the stored cos/sin
    m0 = tf["dir_arrow"][0].reshape(3, 3)
    np.testing.assert_allclose(m0 @ m0.T, np.eye(3), atol=1e-12)
    assert "goal_speed" in tf
    np.testing.assert_allclose(tf["split_points"], [0, T // 2, T])

    a1_env.load_trajectory(
        dict(traj_files=tf, traj_dt=0.01, control_dt=0.01), warn=False
    )
    assert a1_env.traj.n_traj == 2
    state = jax.jit(a1_env.reset)(jax.random.PRNGKey(0))
    assert state.obs.shape == (a1_env.obs_dim,)
    assert np.all(np.isfinite(np.asarray(state.obs)))


def test_humanoid_perfect_chain(tmp_path):
    env = lmt.make("HumanoidTorque.walk.real", debug=True)
    keys = [f"q_{j}" for j in env.joints] + [f"dq_{j}" for j in env.joints]
    path, _, _ = _synth_perfect(
        tmp_path, len(keys) - 2, n_act=env.action_dim, seed=1
    )
    tf = load_dataset_and_get_traj_files(path, keys, freq=100)
    env.load_trajectory(
        dict(traj_files=tf, traj_dt=0.01, control_dt=0.01), warn=False
    )
    assert env.traj.n_traj == 2
    state = jax.jit(env.reset)(jax.random.PRNGKey(1))
    assert np.all(np.isfinite(np.asarray(state.obs)))


def test_perfect_tasks_raise_cleanly():
    """Absent datasets surface as FileNotFoundError, not NotImplementedError."""
    for task in (
        "UnitreeA1.simple.perfect",
        "HumanoidTorque.walk.perfect",
        "HumanoidTorque4Ages.walk.all.perfect",
    ):
        with pytest.raises(FileNotFoundError):
            lmt.make(task)


def test_unequal_trajectories_and_info(tmp_path):
    """Padding + per-trajectory lengths + labels (preference machinery)."""
    from loco_mujoco_tpu.datasets.trajectory import TrajectoryData

    T1, T2 = 8, 5
    files = {
        "q_x": np.arange(T1 + T2, dtype=float),
        "q_y": np.zeros(T1 + T2),
        "q_a": np.ones(T1 + T2),
        "split_points": np.array([0, T1, T1 + T2]),
    }
    td = TrajectoryData(
        ["q_x", "q_y", "q_a"], [1, 1, 1], traj_files=files,
        traj_dt=0.01, control_dt=0.01, traj_info=["good", "bad"],
    )
    assert td.n_traj == 2 and td.traj_len == 8
    assert list(td.traj_lengths) == [8, 5]
    for seed in range(30):
        _, tn, st = td.sample_reset(jax.random.PRNGKey(seed))
        assert int(st) < td.traj_lengths[int(tn)]
    ds = td.create_dataset()
    assert len(ds["states"]) == (T1 - 1) + (T2 - 1)
    assert list(ds["info"]) == ["good"] * 7 + ["bad"] * 4
    assert ds["last"].sum() == 2


def test_preference_dataset_generate(tmp_path):
    """Directory of labelled perfect datasets -> concatenated trajectories
    with filename-derived labels (base_robot_humanoid.py:231-256)."""
    import pathlib

    import loco_mujoco_tpu.models.humanoids.robot_base as rb
    from loco_mujoco_tpu.models.humanoids.unitree_h1 import UnitreeH1

    env = lmt.make("UnitreeH1.walk.real", debug=True)
    keys = [f"q_{j}" for j in env.joints] + [f"dq_{j}" for j in env.joints]
    rng = np.random.default_rng(0)
    for name, T in (("expert_elite_0.npz", 30), ("expert_okay_0.npz", 20)):
        st = rng.normal(size=(T, len(keys) - 2)) * 0.05
        last = np.zeros(T)
        last[T // 2 - 1] = 1
        last[-1] = 1
        np.savez(os.path.join(str(tmp_path), name), states=st, last=last)

    old = rb.REF_ROOT
    rb.REF_ROOT = pathlib.Path(str(tmp_path))
    try:
        env2 = UnitreeH1.generate_robot("", task="walk", dataset_type="preference")
    finally:
        rb.REF_ROOT = old
    assert env2.traj.n_traj == 4
    assert env2.traj.traj_info == ["elite", "elite", "okay", "okay"]
    ds = env2.create_dataset()
    assert len(ds["states"]) == 14 + 14 + 9 + 9
    assert sorted(set(ds["info"])) == ["elite", "okay"]
