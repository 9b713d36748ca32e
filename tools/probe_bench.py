"""Timing breakdown of the headline bench: compile vs run, per phase."""
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp

t0 = time.time()
import loco_mujoco_tpu as lmt

ENV = "HumanoidTorque.run.real"
N_ENVS = 4096

print(f"import: {time.time()-t0:.1f}s  backend={jax.default_backend()}", flush=True)

t = time.time()
env = lmt.make(ENV, debug=True)
print(f"make: {time.time()-t:.1f}s", flush=True)

reset_fn = jax.jit(jax.vmap(env.reset))
step_fn = jax.jit(jax.vmap(env.step))

key = jax.random.PRNGKey(0)
keys = jax.random.split(key, N_ENVS)

t = time.time()
lowered = reset_fn.lower(keys)
print(f"reset trace: {time.time()-t:.1f}s", flush=True)
t = time.time()
reset_c = lowered.compile()
print(f"reset compile: {time.time()-t:.1f}s", flush=True)
t = time.time()
states = reset_c(keys)
jax.block_until_ready(states)
print(f"reset run: {time.time()-t:.2f}s", flush=True)

actions = jnp.zeros((N_ENVS, env.action_dim))
t = time.time()
lowered = step_fn.lower(states, actions)
print(f"step trace: {time.time()-t:.1f}s", flush=True)
t = time.time()
step_c = lowered.compile()
print(f"step compile: {time.time()-t:.1f}s", flush=True)

t = time.time()
states = step_c(states, actions)
jax.block_until_ready(states)
print(f"step first run: {time.time()-t:.2f}s", flush=True)

for trial in range(3):
    t = time.time()
    for _ in range(20):
        states = step_c(states, actions)
    jax.block_until_ready(states)
    dt = time.time() - t
    print(
        f"20 steps: {dt:.2f}s -> {20*N_ENVS/dt:,.0f} env-steps/s",
        flush=True,
    )
