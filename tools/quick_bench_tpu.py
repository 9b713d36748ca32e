"""Quick TPU probe: compile time + ms/step for the flagship at one batch.

Run with plain `python` (claims the TPU chip). Streams progress."""

import sys
import time

import jax
import jax.numpy as jnp

import loco_mujoco_tpu as lmt
from loco_mujoco_tpu.utils.tpu import tpu_compiler_options

_COPTS = tpu_compiler_options()

N = int(sys.argv[1]) if len(sys.argv) > 1 else 4096
TASK = sys.argv[2] if len(sys.argv) > 2 else "HumanoidTorque.run.real"

t0 = time.time()
print(f"devices: {jax.devices()}  ({time.time()-t0:.0f}s)", flush=True)

env = lmt.make(TASK, debug=True)
reset_fn = jax.jit(jax.vmap(env.reset), compiler_options=_COPTS)
step_fn = jax.jit(jax.vmap(env.step), compiler_options=_COPTS)

t0 = time.time()
states = reset_fn(jax.random.split(jax.random.PRNGKey(0), N))
states.obs.block_until_ready()
print(f"reset compile+run: {time.time()-t0:.1f}s", flush=True)

actions = jnp.zeros((N, env.action_dim))
t0 = time.time()
states = step_fn(states, actions)
states.obs.block_until_ready()
print(f"step compile+run: {time.time()-t0:.1f}s", flush=True)

for reps in (5, 20):
    t0 = time.time()
    for _ in range(reps):
        states = step_fn(states, actions)
    states.obs.block_until_ready()
    dt = (time.time() - t0) / reps
    print(
        f"step @ {N}: {dt*1e3:.1f} ms  {N/dt:,.0f} env-steps/s",
        flush=True,
    )
print("obs finite:", bool(jnp.isfinite(states.obs).all()), flush=True)
