"""HumanoidTorque env vs an oracle twin (reference step semantics on the
same surgically-modified model): RK4 integrator, box feet (exact plane-box
narrowphase parity), pyramidal friction. Complements test_env_rollout.py's
A1 (Euler, elliptic) coverage — together the two default benchmark robots
are covered end-to-end.
"""

import jax
import jax.numpy as jnp
import mujoco
import numpy as np

import loco_mujoco_tpu as lmt


def _oracle_obs(mj_data, env):
    oi = env.obs_index
    qpos = np.array([mj_data.qpos[i] for i in oi.qpos_idx])
    qvel = np.array([mj_data.qvel[i] for i in oi.qvel_idx])
    return np.concatenate([qpos, qvel])[2:]


def test_humanoid_torque_rollout_matches_oracle():
    env = lmt.make(
        "HumanoidTorque.walk.real", debug=True, dtype=jnp.float64,
        use_absorbing_states=False, auto_reset=False,
        solver_iterations=100, ls_iterations=50,
    )
    env.model = env.model.replace(contact_k_plane=32, contact_k_other=8)

    from loco_mujoco_tpu.models.humanoids.humanoid import _surgery, REF_ROOT

    xml = REF_ROOT / "environments" / "data" / "humanoid" / "humanoid_torque.xml"
    mj_model, _, _ = _surgery(xml, True, True, 0.5)
    mj_data = mujoco.MjData(mj_model)

    state = jax.jit(env.reset)(jax.random.PRNGKey(11))
    step_fn = jax.jit(env.step)

    mj_data.qpos[:] = np.asarray(state.data.qpos)
    mj_data.qvel[:] = np.asarray(state.data.qvel)
    mujoco.mj_forward(mj_model, mj_data)

    np.testing.assert_allclose(
        np.asarray(state.obs), _oracle_obs(mj_data, env), atol=1e-10
    )

    rng = np.random.default_rng(7)
    for i in range(20):
        action = rng.normal(scale=0.1, size=env.action_dim)
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
        np.testing.assert_allclose(
            np.asarray(state.obs), _oracle_obs(mj_data, env), atol=1e-5,
            err_msg=f"obs diverged at control step {i}",
        )
