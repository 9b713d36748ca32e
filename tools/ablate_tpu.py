"""Ablation timing for the env step: solver caps x auto-reset."""

import time

import jax
import jax.numpy as jnp

import loco_mujoco_tpu as lmt


def bench(tag, **kw):
    env = lmt.make("UnitreeA1.simple.real", debug=True, **kw)
    N = 1024
    reset_fn = jax.jit(jax.vmap(env.reset))
    step_fn = jax.jit(jax.vmap(env.step))
    states = reset_fn(jax.random.split(jax.random.PRNGKey(0), N))
    actions = jnp.zeros((N, env.action_dim))
    states = step_fn(states, actions)
    states.obs.block_until_ready()
    t0 = time.time()
    for _ in range(30):
        states = step_fn(states, actions)
    states.obs.block_until_ready()
    dt = (time.time() - t0) / 30
    print(f"{tag:40s} {dt*1e3:8.1f} ms/step -> {1024/dt:9.0f} env-steps/s",
          flush=True)


bench("default (8/8, auto_reset)")
bench("no auto_reset", auto_reset=False)
bench("solver 2/4", solver_iterations=2, ls_iterations=4)
bench("solver 2/4, no reset", solver_iterations=2, ls_iterations=4,
      auto_reset=False)
bench("solver 1/1, no reset", solver_iterations=1, ls_iterations=1,
      auto_reset=False)
