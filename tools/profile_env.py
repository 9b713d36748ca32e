"""Env-step internal attribution: raw step vs scan-of-10 vs full env.step,
all on the env's own model (dir-arrow surgery + solver caps)."""

import time

import jax
import jax.numpy as jnp

import loco_mujoco_tpu as lmt
from loco_mujoco_tpu.ops import forward as fwd

N = 1024
env = lmt.make("UnitreeA1.simple.real", debug=True, auto_reset=False)
model = env.model

reset_fn = jax.jit(jax.vmap(env.reset))
states = reset_fn(jax.random.split(jax.random.PRNGKey(0), N))
datas = states.data


def timeit(name, f, *args):
    jf = jax.jit(f)
    out = jf(*args)
    jax.tree_util.tree_leaves(out)[0].block_until_ready()
    t0 = time.time()
    for _ in range(10):
        out = jf(*args)
    jax.tree_util.tree_leaves(out)[0].block_until_ready()
    dt = (time.time() - t0) / 10
    print(f"{name:30s} {dt*1e3:8.2f} ms", flush=True)


timeit("1x fwd.step (env model)", jax.vmap(lambda d: fwd.step(model, d)), datas)


def scan10(d):
    def body(dd, _):
        return fwd.step(model, dd), None

    out, _ = jax.lax.scan(body, d, None, length=10)
    return out


timeit("scan 10x fwd.step", jax.vmap(scan10), datas)


def unroll10(d):
    for _ in range(10):
        d = fwd.step(model, d)
    return d


timeit("unrolled 10x fwd.step", jax.vmap(unroll10), datas)

actions = jnp.zeros((N, env.action_dim))
timeit("env.step (no reset)", jax.vmap(env.step), states, actions)
