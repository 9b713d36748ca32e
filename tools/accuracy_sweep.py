"""Solver-cap accuracy sweep (CPU, f64): qacc error vs the MuJoCo oracle on
mocap-reset A1 states under random actions, for several iteration budgets."""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")

import jax
import jax.numpy as jnp
import mujoco
import numpy as np

jax.config.update("jax_enable_x64", True)

import loco_mujoco_tpu as lmt
from loco_mujoco_tpu.models.quadrupeds.unitree_a1 import _add_dir_arrow
from loco_mujoco_tpu.ops import forward as fwd

REF = "/root/reference/loco_mujoco/environments/data/quadrupeds/unitree_a1_torque.xml"


def sweep(si, li):
    env = lmt.make(
        "UnitreeA1.simple.real", debug=True, dtype=jnp.float64,
        solver_iterations=si, ls_iterations=li, auto_reset=False,
        use_absorbing_states=False,
    )
    mj_model = _add_dir_arrow(REF)
    mj_data = mujoco.MjData(mj_model)

    reset_fn = jax.jit(env.reset)
    step_fn = jax.jit(lambda d: fwd.step(env.model, d))

    rng = np.random.default_rng(5)
    errs, herrs = [], []
    for trial in range(10):
        state = reset_fn(jax.random.PRNGKey(trial))
        d = state.data
        ctrl = rng.normal(scale=5.0, size=env.model.nu)
        d = d.replace(ctrl=jnp.asarray(ctrl))
        mj_data.qpos[:] = np.asarray(d.qpos)
        mj_data.qvel[:] = np.asarray(d.qvel)
        mj_data.ctrl[:] = ctrl
        # roll 20 physics substeps in both
        for k in range(20):
            mujoco.mj_step(mj_model, mj_data)
            d = step_fn(d)
        e = np.abs(np.asarray(d.qpos) - mj_data.qpos).max()
        ev = np.abs(np.asarray(d.qvel) - mj_data.qvel).max()
        errs.append(e)
        herrs.append(ev)
    print(
        f"caps {si:3d}/{li:3d}: qpos err 20-substep "
        f"med {np.median(errs):.2e} max {np.max(errs):.2e} | "
        f"qvel med {np.median(herrs):.2e} max {np.max(herrs):.2e}",
        flush=True,
    )


for si, li in [(100, 50), (8, 8), (4, 6), (4, 4), (2, 4)]:
    sweep(si, li)
