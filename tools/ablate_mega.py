"""Ablate the mega kernel on TPU: time the packed solver at different
Newton iteration budgets to split fixed costs (FK + collision + smooth +
CRB + asm + row build) from per-iteration costs (Hessian + Cholesky +
line search).

Usage: BENCH_TASK=HumanoidTorque.run.real python tools/ablate_mega.py
"""
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp

import loco_mujoco_tpu as lmt
from loco_mujoco_tpu.utils.tpu import tpu_compiler_options

_COPTS = tpu_compiler_options()

from loco_mujoco_tpu.ops import pallas_constraint as pc

N = int(os.environ.get("BENCH_N_ENVS", 4096))
task = os.environ.get("BENCH_TASK", "HumanoidTorque.run.real")
env = lmt.make(task, debug=True)
m = env.model

keys = jax.random.split(jax.random.PRNGKey(0), N)
states = jax.jit(jax.vmap(env.reset), compiler_options=_COPTS)(keys)
d = states.data
jax.block_until_ready(d.qpos)

plan = pc.get_plan(m, jax.tree_util.tree_map(lambda l: l[0], d.contact))
assert plan is not None and plan.mega, "task not mega-capable"
print(f"{task}: nrows={plan.nrows} ncon={plan.ncon} nv={plan.nv} "
      f"fast={len(plan.mega_fast) if plan.mega_fast else None}")

vec = jnp.concatenate([
    d.qpos, d.qvel, d.ctrl, d.qfrc_applied,
    d.xfrc_applied.reshape(N, -1), d.qacc_warmstart,
], axis=1).astype(jnp.float32)

for iters in (1, 2, 4, 8):
    solver = pc.get_mega_solver(
        plan, iters, m.opt.ls_iterations,
        scale=m.stat_meaninertia * max(1, m.nv),
        tolerance=max(m.opt.tolerance, 1e-6),
    )
    reps = 50

    @jax.jit
    def chained(v):
        # thread qacc back in as the warmstart so no dispatch can be
        # served from the tunnel's same-argument cache
        def body(_, v):
            out = jax.vmap(solver)(v)
            return jnp.concatenate([v[:, :-plan.nv], out[0]], axis=1)

        return jax.lax.fori_loop(0, reps, body, v)

    fn = jax.jit(chained, compiler_options=_COPTS)
    t = time.time()
    jax.block_until_ready(fn(vec))
    compile_s = time.time() - t
    t = time.time()
    jax.block_until_ready(fn(vec))
    ms = (time.time() - t) / reps * 1000
    print(f"iters={iters}: {ms:8.3f} ms/forward  (compile {compile_s:.0f}s)",
          flush=True)
