"""End-to-end env-layer parity: our batched A1 env vs an oracle twin that
reproduces the reference's step semantics (unnormalize action -> n_substeps
of mj_step -> obs spec vector minus x/y -> goal features), following the
golden-rollout harness pattern of reference tests/test_environments.py:67-94.

The A1's ground contacts are all primitive (exact narrowphase parity), so in
f64 the obs streams must agree to tight tolerances over tens of steps.
"""

import jax
import jax.numpy as jnp
import mujoco
import numpy as np

import loco_mujoco_tpu as lmt
from loco_mujoco_tpu.utils import math as um


def _oracle_obs(mj_model, mj_data, env, goal):
    """Reference obs assembly (unitreeA1.py:454-476) on oracle state."""
    oi = env.obs_index
    qpos = np.array([mj_data.qpos[i] for i in oi.qpos_idx])
    qvel = np.array([mj_data.qvel[i] for i in oi.qvel_idx])
    raw = np.concatenate([qpos, qvel])
    obs = raw[2:]
    angle = um.transform_angle_2pi(float(goal[0])) - np.pi / 2
    feats = np.array([np.cos(angle), np.sin(angle)])
    return np.concatenate([obs, feats, [goal[1]]])


def test_a1_env_rollout_matches_oracle(ref_data_dir):
    env = lmt.make(
        "UnitreeA1.simple.real", debug=True, dtype=jnp.float64,
        use_absorbing_states=False, auto_reset=False,
        solver_iterations=100, ls_iterations=50,
    )
    # widen the contact budgets to cover every oracle contact during falls
    env.model = env.model.replace(contact_k_plane=32, contact_k_other=8)
    # oracle twin on the same compiled model (incl. the dir-arrow surgery)
    from loco_mujoco_tpu.models.quadrupeds.unitree_a1 import _add_dir_arrow

    mj_model = _add_dir_arrow(
        f"{ref_data_dir}/quadrupeds/unitree_a1_torque.xml"
    )
    mj_data = mujoco.MjData(mj_model)

    state = jax.jit(env.reset)(jax.random.PRNGKey(3))
    step_fn = jax.jit(env.step)

    # copy our init state into the oracle
    mj_data.qpos[:] = np.asarray(state.data.qpos)
    mj_data.qvel[:] = np.asarray(state.data.qvel)
    mujoco.mj_forward(mj_model, mj_data)
    goal = np.asarray(state.goal)

    obs0 = _oracle_obs(mj_model, mj_data, env, goal)
    np.testing.assert_allclose(np.asarray(state.obs), obs0, atol=1e-10)

    rng = np.random.default_rng(0)
    for i in range(50):
        action = rng.normal(scale=0.1, size=env.action_dim)
        # oracle: unnormalize + n_substeps physics steps
        ctrl = action * np.asarray(env.norm_act_delta) + np.asarray(
            env.norm_act_mean
        )
        mj_data.ctrl[:] = ctrl
        for _ in range(env.n_substeps):
            mujoco.mj_step(mj_model, mj_data)

        state = step_fn(state, jnp.asarray(action))
        np.testing.assert_allclose(
            np.asarray(state.data.qpos), mj_data.qpos, atol=1e-6,
            err_msg=f"qpos diverged at control step {i}",
        )
        obs_oracle = _oracle_obs(mj_model, mj_data, env, goal)
        np.testing.assert_allclose(
            np.asarray(state.obs), obs_oracle, atol=1e-5,
            err_msg=f"obs diverged at control step {i}",
        )
