"""Isolate the H1 arm-cylinder/torso-mesh contact parity: drive the oracle
substep by substep from the acceptance initial state, and at every substep
sync OUR engine to the oracle state and compare qacc + contact sets."""
import sys

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import mujoco
import numpy as np

jax.config.update("jax_enable_x64", True)
jax.config.update("jax_platforms", "cpu")

import loco_mujoco_tpu as lmt
from loco_mujoco_tpu.ops import forward as fwd
from loco_mujoco_tpu.ops.collision import contact_groups

task = sys.argv[1] if len(sys.argv) > 1 else "UnitreeH1.walk.real"
env = lmt.make(task, debug=True, dtype=jnp.float64,
               use_absorbing_states=True, auto_reset=False,
               solver_iterations=100, ls_iterations=50)
env.model = env.model.replace(contact_k_plane=32, contact_k_other=8)
state = env.reset(jax.random.PRNGKey(11))
m = env.model
groups, total, _ = contact_groups(m)

mj_model = env._mj_models[0]
mj_data = mujoco.MjData(mj_model)
mj_data.qpos[:] = np.asarray(state.data.qpos)
mj_data.qvel[:] = np.asarray(state.data.qvel)
mujoco.mj_forward(mj_model, mj_data)
gt = np.asarray(mj_model.geom_type)

rng = np.random.default_rng(11)
action = rng.normal(scale=0.1, size=env.action_dim)
ctrl = action * np.asarray(env.norm_act_delta) + np.asarray(env.norm_act_mean)
mj_data.ctrl[:] = ctrl

fwd_fn = jax.jit(lambda d: fwd.forward(m, d))
base = state.data

for ss in range(10):
    # sync ours to the oracle state BEFORE this substep
    d = base.replace(
        qpos=jnp.asarray(mj_data.qpos), qvel=jnp.asarray(mj_data.qvel),
        ctrl=jnp.asarray(ctrl),
        act=jnp.asarray(mj_data.act) if m.na else base.act,
        qacc_warmstart=jnp.asarray(mj_data.qacc_warmstart),
    )
    d = fwd_fn(d)
    mujoco.mj_forward(mj_model, mj_data)
    qacc_err = float(np.max(np.abs(np.asarray(d.qacc) - mj_data.qacc)))
    ncon_o = mj_data.ncon
    con = d.contact
    dd = np.asarray(con.dist)
    inc = np.asarray(con.includemargin)
    act_slots = [
        (i, dd[i], int(np.asarray(con.geom1)[i]), int(np.asarray(con.geom2)[i]))
        for i in range(len(dd)) if dd[i] < inc[i]
    ]
    print(f"substep {ss}: qacc err {qacc_err:.3e}  oracle ncon {ncon_o} "
          f"ours active {len(act_slots)}")
    if qacc_err > 1e-8 or ncon_o != len(act_slots):
        for i in range(ncon_o):
            c = mj_data.contact[i]
            print(f"  oracle: g {c.geom1},{c.geom2} t {gt[c.geom1]},"
                  f"{gt[c.geom2]} dist {c.dist:+.8f} n {c.frame[:3]}")
        for i, di, g1, g2 in act_slots:
            p = np.asarray(con.pos)[i]
            n = np.asarray(con.frame)[i][0]
            print(f"  ours: slot {i} g {g1},{g2} dist {di:+.8f} n {n}")
    mujoco.mj_step(mj_model, mj_data)
