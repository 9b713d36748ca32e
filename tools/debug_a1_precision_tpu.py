"""Confirm the A1 TPU NaN is default-matmul-precision (bf16 truncation):
re-run the 10-substep check with highest precision and compare."""

import jax

jax.config.update("jax_default_matmul_precision", "highest")

import jax.numpy as jnp

import loco_mujoco_tpu as lmt
from loco_mujoco_tpu.ops import forward as fwd

print("devices:", jax.devices(), flush=True)
env = lmt.make("UnitreeA1.simple.real", debug=True)
model = env.model

reset_fn = jax.jit(jax.vmap(env.reset))
states = reset_fn(jax.random.split(jax.random.PRNGKey(0), 256))

step1 = jax.jit(jax.vmap(lambda d: fwd.step(model, d)))

d = states.data
for k in range(10):
    d = step1(d)
    nb = int(jnp.sum(~jnp.isfinite(d.qpos).reshape(d.qpos.shape[0], -1).all(axis=1)))
    print(f"substep {k}: bad qpos envs = {nb}", flush=True)
print("done", flush=True)
