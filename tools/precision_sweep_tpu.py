"""Sweep LMT matmul precision on TPU for the flagship + A1 stability.

One chip claim; patches forward._PHYS_PRECISION between fresh jits.
Run with plain `python` (claims the TPU chip). Streams progress."""

import time

import jax
import jax.numpy as jnp

import loco_mujoco_tpu as lmt
from loco_mujoco_tpu.ops import forward as fwd

print("devices:", jax.devices(), flush=True)


def probe(task, n_envs, prec, n_check=1, reps=5):
    fwd._PHYS_PRECISION = prec
    env = lmt.make(task, debug=True)
    reset_fn = jax.jit(jax.vmap(env.reset))
    step_fn = jax.jit(jax.vmap(env.step))
    states = reset_fn(jax.random.split(jax.random.PRNGKey(0), n_envs))
    actions = jnp.zeros((n_envs, env.action_dim))
    t0 = time.time()
    states = step_fn(states, actions)
    states.obs.block_until_ready()
    ct = time.time() - t0
    for _ in range(n_check - 1):
        states = step_fn(states, actions)
    finite = bool(jnp.isfinite(states.obs).all())
    t0 = time.time()
    for _ in range(reps):
        states = step_fn(states, actions)
    states.obs.block_until_ready()
    dt = (time.time() - t0) / reps
    print(
        f"{task} @ {n_envs} prec={prec}: {dt*1e3:8.1f} ms  "
        f"{n_envs/dt:10,.0f} env-steps/s  finite({n_check})={finite}  "
        f"(compile {ct:.0f}s)",
        flush=True,
    )


for prec in ("default", "high", "highest"):
    probe("UnitreeA1.simple.real", 4096, prec, n_check=25, reps=10)
for prec in ("default", "high", "highest"):
    probe("HumanoidTorque.run.real", 4096, prec, n_check=5, reps=5)
