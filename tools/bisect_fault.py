"""Bisect the 4096-env TPU fault: vary batch and scan length via env vars.
N=batch, STEPS=scan length (0 = unscanned sequential python loop)."""
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp

import loco_mujoco_tpu as lmt

N = int(os.environ.get("N", 4096))
STEPS = int(os.environ.get("STEPS", 10))
TASK = os.environ.get("TASK", "HumanoidTorque.run.real")

env = lmt.make(TASK, debug=True)
states = jax.jit(jax.vmap(env.reset))(
    jax.random.split(jax.random.PRNGKey(0), N))
states.obs.block_until_ready()
print(f"reset ok N={N}", flush=True)
a = jnp.zeros((N, env.action_dim))

if STEPS == 0:
    step_fn = jax.jit(jax.vmap(env.step))
    t0 = time.time()
    states = step_fn(states, a)
    states.obs.block_until_ready()
    print(f"unscanned step ok, compile+run {time.time()-t0:.1f}s", flush=True)
    t0 = time.time()
    for _ in range(5):
        states = step_fn(states, a)
    states.obs.block_until_ready()
    dt = (time.time() - t0) / 5
    print(f"step {dt*1000:.1f} ms -> {N/dt:.0f} env-steps/s", flush=True)
else:
    step = jax.vmap(env.step)

    def rollout(s, a):
        return jax.lax.scan(lambda s, _: (step(s, a), ()), s, None,
                            length=STEPS)[0]

    rfn = jax.jit(rollout)
    t0 = time.time()
    states = rfn(states, a)
    states.obs.block_until_ready()
    print(f"scan({STEPS}) ok, compile+first {time.time()-t0:.1f}s", flush=True)
    t0 = time.time()
    states = rfn(states, a)
    states.obs.block_until_ready()
    dt = (time.time() - t0) / STEPS
    print(f"step {dt*1000:.1f} ms -> {N/dt:.0f} env-steps/s", flush=True)
