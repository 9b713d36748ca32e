"""Perf sweep for the flagship step: batch scaling, solver budget, and
(via LMT_MATMUL_PRECISION) matmul precision. One TPU process.

Usage: python tools/perf_sweep.py [task]
Env:   SWEEP_BATCHES="1024,4096,16384"  SOLVER="8:8,4:4"
"""
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp

import loco_mujoco_tpu as lmt

task = sys.argv[1] if len(sys.argv) > 1 else "HumanoidTorque.run.real"
batches = [int(x) for x in os.environ.get(
    "SWEEP_BATCHES", "1024,4096,16384").split(",")]
solver_cfgs = [tuple(map(int, s.split(":"))) for s in os.environ.get(
    "SOLVER", "8:8").split(",")]

print(f"task={task} precision={os.environ.get('LMT_MATMUL_PRECISION', 'highest')}",
      flush=True)

for it, ls in solver_cfgs:
    env = lmt.make(task, debug=True, solver_iterations=it, ls_iterations=ls)
    m = env.model
    print(f"solver {it}/{ls}  nq={m.nq} nv={m.nv} ngeom={m.ngeom} "
          f"npair={len(m.pair_geom1)}", flush=True)
    for n in batches:
        reset_fn = jax.jit(jax.vmap(env.reset))
        states = reset_fn(jax.random.split(jax.random.PRNGKey(0), n))
        states.obs.block_until_ready()
        step = jax.vmap(env.step)

        def rollout(states, actions, _step=step):
            def body(s, _):
                return _step(s, actions), ()
            return jax.lax.scan(body, states, None, length=10)[0]

        rfn = jax.jit(rollout)
        a = jnp.zeros((n, env.action_dim))
        t0 = time.time()
        states = rfn(states, a)
        states.obs.block_until_ready()
        c = time.time() - t0
        t0 = time.time()
        states = rfn(states, a)
        states.obs.block_until_ready()
        dt = (time.time() - t0) / 10
        print(f"  n={n:6d}  compile {c:6.1f}s  step {dt*1000:8.2f} ms  "
              f"{n/dt:12.0f} env-steps/s", flush=True)
