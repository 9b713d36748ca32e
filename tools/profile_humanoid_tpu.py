"""TPU profiling for the bench flagship (HumanoidTorque.run): batch scaling
of the full env.step plus stage-level attribution at the bench batch size.

Run with plain `python` (claims the TPU chip)."""

import time

import jax
import jax.numpy as jnp

import loco_mujoco_tpu as lmt
from loco_mujoco_tpu.utils.tpu import tpu_compiler_options

_COPTS = tpu_compiler_options()
from loco_mujoco_tpu.ops import forward as fwd

print("devices:", jax.devices(), flush=True)

env = lmt.make("HumanoidTorque.run.real", debug=True)
model = env.model
print(
    f"model: nq={model.nq} nv={model.nv} nu={model.nu} "
    f"nbody={model.nbody} opt.iterations={model.opt.iterations} "
    f"ls={model.opt.ls_iterations} integrator={model.opt.integrator}",
    flush=True,
)


def bench_step(n_envs, reps=20):
    reset_fn = jax.jit(jax.vmap(env.reset), compiler_options=_COPTS)
    step_fn = jax.jit(jax.vmap(env.step), compiler_options=_COPTS)
    states = reset_fn(jax.random.split(jax.random.PRNGKey(0), n_envs))
    actions = jnp.zeros((n_envs, env.action_dim))
    t0 = time.time()
    states = step_fn(states, actions)
    states.obs.block_until_ready()
    compile_t = time.time() - t0
    t0 = time.time()
    for _ in range(reps):
        states = step_fn(states, actions)
    states.obs.block_until_ready()
    dt = (time.time() - t0) / reps
    print(
        f"env.step @ {n_envs:6d}: {dt*1e3:8.2f} ms/step  "
        f"{n_envs/dt:12.0f} env-steps/s  (compile {compile_t:.0f}s)",
        flush=True,
    )
    return states


for n in (1024, 4096, 8192, 16384):
    states = bench_step(n)

# stage attribution at 4096 on the env's own model/data
N = 4096
reset_fn = jax.jit(jax.vmap(env.reset), compiler_options=_COPTS)
states = reset_fn(jax.random.split(jax.random.PRNGKey(0), N))
datas = states.data


def timeit(name, f, *args, reps=10):
    jf = jax.jit(f)
    out = jf(*args)
    jax.tree_util.tree_leaves(out)[0].block_until_ready()
    t0 = time.time()
    for _ in range(reps):
        out = jf(*args)
    jax.tree_util.tree_leaves(out)[0].block_until_ready()
    dt = (time.time() - t0) / reps
    print(f"{name:30s} {dt*1e3:8.2f} ms", flush=True)
    return out


def smooth(d):
    d = fwd.fwd_velocity(model, d)
    d = fwd.fwd_actuation(model, d)
    return fwd.fwd_acceleration(model, d)


d_pos = timeit("fwd_position x1", jax.vmap(lambda d: fwd.fwd_position(model, d)), datas)
d_sm = timeit("smooth(vel+act+acc) x1", jax.vmap(smooth), d_pos)
timeit("fwd_constraint x1", jax.vmap(lambda d: fwd.fwd_constraint(model, d)), d_sm)
timeit("forward x1", jax.vmap(lambda d: fwd.forward(model, d)), datas)
timeit("step(RK4) x1", jax.vmap(lambda d: fwd.step(model, d)), datas)
