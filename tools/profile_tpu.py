"""Stage-level TPU timing for the A1 step: position / smooth-forward /
constraint solve / integrate, each jit(vmap)'d at batch N."""

import time

import jax
import jax.numpy as jnp

from loco_mujoco_tpu.core.io import load_model, make_data
from loco_mujoco_tpu.ops import forward as fwd

N = 1024
REPS = 20

model = load_model(
    "/root/reference/loco_mujoco/environments/data/quadrupeds/"
    "unitree_a1_torque.xml"
)
data0 = make_data(model)

key = jax.random.PRNGKey(0)
qpos = model.qpos0[None] + 0.02 * jax.random.normal(key, (N, model.nq))
qpos = qpos.at[:, 2].add(-0.01)
datas = jax.vmap(lambda q: data0.replace(qpos=q))(qpos)


def timeit(name, fn, *args):
    f = jax.jit(jax.vmap(fn, in_axes=(None,) + (0,) * (len(args))))
    t0 = time.time()
    out = f(model, *args)
    jax.tree_util.tree_leaves(out)[0].block_until_ready()
    compile_t = time.time() - t0
    t0 = time.time()
    for _ in range(REPS):
        out = f(model, *args)
    jax.tree_util.tree_leaves(out)[0].block_until_ready()
    run_t = (time.time() - t0) / REPS
    print(f"{name:24s} compile {compile_t:6.1f}s  run {run_t*1e3:8.2f} ms "
          f"({N/run_t:9.0f} calls/s)", flush=True)
    return out


def smooth(model, d):
    d = fwd.fwd_velocity(model, d)
    d = fwd.fwd_actuation(model, d)
    return fwd.fwd_acceleration(model, d)


datas_pos = timeit("fwd_position", fwd.fwd_position, datas)
datas_sm = timeit("velocity+act+accel", smooth, datas_pos)
timeit("fwd_constraint(Newton)", fwd.fwd_constraint, datas_sm)
timeit("forward (all)", fwd.forward, datas)
timeit("step (fwd+integrate)", fwd.step, datas)
