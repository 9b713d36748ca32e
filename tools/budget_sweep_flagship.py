"""Solver-budget drift sweep on the flagship (CPU, f64): qpos/qvel error
vs the MuJoCo oracle over 20 physics substeps (2 control steps) of
HumanoidTorque.run under random actions, from BOTH gait resets and
dropped (contact-heavy) poses, for several (iterations, ls_iterations)
budgets. Picks the default budget honestly: the smallest one whose drift
stays in the envelope of the long-standing 8/8 default."""

import os
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
os.environ.setdefault("JAX_PLATFORMS", "cpu")

import jax
import jax.numpy as jnp
import mujoco
import numpy as np

jax.config.update("jax_enable_x64", True)
jax.config.update("jax_platforms", "cpu")

import loco_mujoco_tpu as lmt


def sweep(si, li):
    env = lmt.make(
        "HumanoidTorque.run.real", debug=True, dtype=jnp.float64,
        solver_iterations=si, ls_iterations=li, auto_reset=False,
        use_absorbing_states=False,
    )
    from loco_mujoco_tpu.ops import forward as fwd

    mj_model = env._mj_models[0]
    mj_data = mujoco.MjData(mj_model)
    reset_fn = jax.jit(env.reset)
    step_fn = jax.jit(lambda d: fwd.step(env.model, d))

    rng = np.random.default_rng(5)
    rows = []
    for trial in range(8):
        state = reset_fn(jax.random.PRNGKey(trial))
        d = state.data
        if trial >= 4:  # contact-heavy: drop the torso
            d = d.replace(qpos=d.qpos.at[1].add(-0.35))
        ctrl = (
            rng.normal(scale=0.1, size=env.model.nu)
            * np.asarray(env.norm_act_delta)
            + np.asarray(env.norm_act_mean)
        )
        d = d.replace(ctrl=jnp.asarray(ctrl))
        mj_data.qpos[:] = np.asarray(d.qpos)
        mj_data.qvel[:] = np.asarray(d.qvel)
        mj_data.ctrl[:] = ctrl
        mujoco.mj_forward(mj_model, mj_data)
        for _ in range(20):
            mujoco.mj_step(mj_model, mj_data)
            d = step_fn(d)
        rows.append((
            np.abs(np.asarray(d.qpos) - mj_data.qpos).max(),
            np.abs(np.asarray(d.qvel) - mj_data.qvel).max(),
        ))
    q = np.array([r[0] for r in rows])
    v = np.array([r[1] for r in rows])
    print(
        f"iters={si:3d} ls={li:2d}: qpos drift max {q.max():.3e} "
        f"med {np.median(q):.3e} | qvel max {v.max():.3e}",
        flush=True,
    )


if __name__ == "__main__":
    for si, li in ((100, 50), (8, 8), (8, 4), (6, 4), (4, 4), (4, 8),
                   (3, 4), (2, 4)):
        sweep(si, li)
