"""One-task acceptance rollout: our batched env vs a CPU MuJoCo oracle twin.

Generalizes the oracle-twin pattern of tests/test_env_rollout.py /
test_humanoid_rollout.py to EVERY registered task, following the reference's
own acceptance harness (reference tests/test_environments.py:67-94: fixed
seed, 0.1*randn actions, observation-stream agreement). Instead of the
reference's stored goldens (bit-tied to MuJoCo 2.3.7 and its global
np.random stream), the oracle is live CPU MuJoCo run on the SAME surgeried
model the env compiled (env._mj_models), with our PRNG driving both sides —
the seed-parity contract documented in PARITY.md.

Usage: python tools/acceptance_one.py <task> [steps] [seed]
Exit 0 on parity, 1 on divergence, 3 on skip (dataset/assets unavailable).
Runs on CPU in float64 (launch with PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu
to skip the TPU claim).
"""

import sys

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import mujoco
import numpy as np

jax.config.update("jax_enable_x64", True)
jax.config.update("jax_platforms", "cpu")

QPOS_ATOL = 1e-6
OBS_ATOL = 1e-5


def oracle_obs(env, mj_data, state):
    """Reference observation assembly on oracle state: spec vector minus
    global x/y, then the env family's extensions."""
    oi = env.obs_index
    qpos = np.array([mj_data.qpos[i] for i in oi.qpos_idx])
    qvel = np.array([mj_data.qvel[i] for i in oi.qvel_idx])
    obs = np.concatenate([qpos, qvel])[2:]

    if hasattr(env, "_rot_start"):  # UnitreeA1: goal features
        from loco_mujoco_tpu.utils import math as um

        goal = np.asarray(state.goal)
        angle = um.transform_angle_2pi(float(goal[0])) - np.pi / 2
        obs = np.concatenate(
            [obs, [np.cos(angle), np.sin(angle)], [goal[1]]]
        )

    if getattr(env, "use_foot_forces", False):
        # the GRF window mean is stateful; acceptance envs run without it
        raise NotImplementedError

    if hasattr(env, "_env_id_len"):  # 4-ages env-id bits (big-endian)
        idx = (
            int(state.env_id)
            if env._fixed_model_idx is None
            else env._fixed_model_idx
        )
        bits = [
            float((idx >> (env._env_id_len - 1 - k)) & 1)
            for k in range(env._env_id_len)
        ]
        obs = np.concatenate([obs, bits])
    elif getattr(env, "hold_weight", False):
        w = float(np.asarray(env.weight_masses)[int(state.env_id)])
        obs = np.concatenate([obs, [w]])
    return obs


def run(task: str, steps: int = 25, seed: int = 11) -> int:
    import loco_mujoco_tpu as lmt

    try:
        env = lmt.make(
            task, debug=True, dtype=jnp.float64,
            use_absorbing_states=False, auto_reset=False,
            solver_iterations=100, ls_iterations=50,
        )
    except FileNotFoundError as e:
        print(f"SKIP {task}: {e}")
        return 3

    # widen the static contact budgets so every oracle contact fits even
    # during falls (the bench configs use the tighter defaults)
    env.model = env.model.replace(contact_k_plane=32, contact_k_other=8)
    if env.variants is not None:
        env.variants = env.variants.replace(
            contact_k_plane=32, contact_k_other=8
        )

    # random flailing can push some robots into self-collision regimes the
    # engine does not narrowphase (see below) within a step or two of some
    # initial poses — retry from a few reset seeds to find a comparable
    # window before declaring failure
    rc = 1
    for attempt in range(4):
        rc = _run_once(env, task, steps, seed + 17 * attempt)
        if rc != 2:
            return rc
    print(f"FAIL {task}: no seed gave enough validated steps")
    return 1


def _gym_transparency(env, task, steps, seed, reset_fn, step_fn,
                      native_obs) -> int:
    """Reference harness also replays the rollout through the Gymnasium
    wrapper and requires the same stream (test_environments.py:83-94).
    Wrap the SAME env instance (and reuse its jitted fns) and compare."""
    from loco_mujoco_tpu.envs.gymnasium_env import GymnasiumWrapper

    gym_env = GymnasiumWrapper(_prebuilt_env=env)
    gym_env._reset_fn = reset_fn
    gym_env._step_fn = step_fn
    obs, _ = gym_env.reset(seed=seed)
    np.testing.assert_allclose(
        obs, native_obs[0], atol=0,
        err_msg=f"{task}: gym reset obs != native",
    )
    rng = np.random.default_rng(seed)
    for i in range(len(native_obs) - 1):
        action = rng.normal(scale=0.1, size=env.action_dim)
        obs, reward, terminated, truncated, info = gym_env.step(action)
        if truncated or not np.allclose(obs, native_obs[i + 1], atol=0):
            print(f"FAIL {task}: gym wrapper diverged at step {i}")
            return 1
    print(f"PASS-GYM {task}: wrapper transparent over {len(native_obs)-1} steps")
    return 0


def _run_once(env, task: str, steps: int, seed: int) -> int:
    reset_fn = jax.jit(env.reset)
    state = reset_fn(jax.random.PRNGKey(seed))
    step_fn = jax.jit(env.step)

    env_id = int(state.env_id)
    mj_model = env._mj_models[min(env_id, len(env._mj_models) - 1)]
    mj_data = mujoco.MjData(mj_model)
    mj_data.qpos[:] = np.asarray(state.data.qpos)
    mj_data.qvel[:] = np.asarray(state.data.qvel)
    mujoco.mj_forward(mj_model, mj_data)

    obs0 = oracle_obs(env, mj_data, state)
    np.testing.assert_allclose(
        np.asarray(state.obs), obs0, atol=1e-9,
        err_msg=f"{task}: reset obs mismatch",
    )

    # supported narrowphase type-pairs: the engine skips e.g. mesh-mesh /
    # cylinder-mesh self-collision (GJK parity is a known gap, PARITY.md).
    # The comparison is valid up to the first oracle contact on such a
    # pair; the task passes if enough clean steps were validated.
    from loco_mujoco_tpu.ops.collision import SLOTS

    gt = np.asarray(mj_model.geom_type)

    def oracle_has_unsupported_contact():
        for i in range(mj_data.ncon):
            c = mj_data.contact[i]
            t = (int(gt[c.geom1]), int(gt[c.geom2]))
            if t not in SLOTS and tuple(reversed(t)) not in SLOTS:
                return True
        return False

    min_clean = min(10, steps)
    rng = np.random.default_rng(seed)
    max_q = max_o = 0.0
    validated = steps
    native_obs = [np.asarray(state.obs)]
    for i in range(steps):
        action = rng.normal(scale=0.1, size=env.action_dim)
        ctrl = action * np.asarray(env.norm_act_delta) + np.asarray(
            env.norm_act_mean
        )
        mj_data.ctrl[:] = ctrl
        unsupported = False
        for _ in range(env.n_substeps):
            mujoco.mj_step(mj_model, mj_data)
            unsupported = unsupported or oracle_has_unsupported_contact()
        if unsupported:
            validated = i
            if validated < min_clean:
                print(
                    f"RETRY {task} seed {seed}: oracle hit an unsupported "
                    f"self-collision pair after only {i} steps"
                )
                return 2
            print(
                f"PASS {task}: {validated}/{steps} steps validated (oracle "
                f"entered unsupported self-collision regime), "
                f"max qpos err {max_q:.2e}, max obs err {max_o:.2e}"
            )
            return _gym_transparency(
                env, task, steps, seed, reset_fn, step_fn, native_obs
            )
        state = step_fn(state, jnp.asarray(action))
        native_obs.append(np.asarray(state.obs))

        qerr = float(np.max(np.abs(np.asarray(state.data.qpos) - mj_data.qpos)))
        oerr = float(
            np.max(np.abs(np.asarray(state.obs) - oracle_obs(env, mj_data, state)))
        )
        max_q, max_o = max(max_q, qerr), max(max_o, oerr)
        if qerr > QPOS_ATOL or oerr > OBS_ATOL:
            print(
                f"FAIL {task}: diverged at control step {i} "
                f"(qpos err {qerr:.2e}, obs err {oerr:.2e})"
            )
            return 1
        if env.model.na:
            aerr = float(
                np.max(np.abs(np.asarray(state.data.act) - mj_data.act))
            )
            if aerr > 1e-6:
                print(f"FAIL {task}: act diverged at step {i} ({aerr:.2e})")
                return 1

    print(
        f"PASS {task}: {steps} steps, env_id={env_id}, "
        f"max qpos err {max_q:.2e}, max obs err {max_o:.2e}"
    )
    return _gym_transparency(
        env, task, steps, seed, reset_fn, step_fn, native_obs
    )


if __name__ == "__main__":
    task = sys.argv[1]
    steps = int(sys.argv[2]) if len(sys.argv) > 2 else 25
    seed = int(sys.argv[3]) if len(sys.argv) > 3 else 11
    sys.exit(run(task, steps, seed))
