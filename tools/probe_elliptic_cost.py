"""Decompose the A1 fused elliptic kernel's on-chip cost: time one
fwd_constraint eval at several (iterations, ls_iterations) budgets."""

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp

import loco_mujoco_tpu as lmt
from loco_mujoco_tpu.ops import forward as fwd
from loco_mujoco_tpu.utils.tpu import tpu_compiler_options

N = 4096
copts = tpu_compiler_options()

env = lmt.make("UnitreeA1.simple.real", debug=True)
states = jax.jit(jax.vmap(env.reset), compiler_options=copts)(
    jax.random.split(jax.random.PRNGKey(0), N)
)
m0 = env.model
datas = states.data


def eval_at(iters, ls):
    m = m0.replace(opt=m0.opt.replace(iterations=iters, ls_iterations=ls))

    def one(d):
        d = fwd.fwd_position(m, d)
        d = fwd.fwd_velocity(m, d)
        d = fwd.fwd_actuation(m, d)
        d = fwd.fwd_acceleration(m, d)
        return fwd.fwd_constraint(m, d)

    f = jax.jit(jax.vmap(one), compiler_options=copts)
    out = f(datas)
    jax.block_until_ready(out)
    t0 = time.time()
    for _ in range(10):
        out = f(datas)
    jax.block_until_ready(out)
    dt = (time.time() - t0) / 10
    print(f"iters={iters} ls={ls}: {dt*1e3:7.2f} ms/eval", flush=True)
    return dt


base = eval_at(8, 8)
eval_at(1, 8)
eval_at(8, 1)
eval_at(1, 1)
eval_at(0, 1) if True else None
