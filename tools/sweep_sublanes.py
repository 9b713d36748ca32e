"""Empirical sweep of the grouped env-block sublane count S per task.

One TPU process; sets LMT_ENV_SUBLANES between configs (read at plan time).
Usage: python tools/sweep_sublanes.py [task ...]
Env:   SWEEP_S="1,2,4,8"  BENCH_N_ENVS  BENCH_N_STEPS
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

N = int(os.environ.get("BENCH_N_ENVS", 4096))
REPS = int(os.environ.get("BENCH_N_STEPS", 20))
SVALS = [int(s) for s in os.environ.get("SWEEP_S", "1,2,4,8").split(",")]
TASKS = sys.argv[1:] or ["HumanoidTorque.run.real"]

print(f"devices: {jax.devices()}  N={N} REPS={REPS}", flush=True)

for task in TASKS:
    for s in SVALS:
        os.environ["LMT_ENV_SUBLANES"] = str(s)
        try:
            t0 = time.time()
            env = lmt.make(task, debug=True)
            reset_fn = jax.jit(jax.vmap(env.reset), compiler_options=_COPTS)
            step_fn = jax.jit(jax.vmap(env.step), compiler_options=_COPTS)
            states = reset_fn(jax.random.split(jax.random.PRNGKey(0), N))
            actions = jnp.zeros((N, env.action_dim))
            states = step_fn(states, actions)
            states.obs.block_until_ready()
            t_compile = time.time() - t0
            t0 = time.time()
            for _ in range(REPS):
                states = step_fn(states, actions)
            states.obs.block_until_ready()
            dt = (time.time() - t0) / REPS
            ok = bool(jnp.isfinite(states.obs).all())
            print(
                f"RESULT {task} S<={s}: {dt*1e3:8.1f} ms/step "
                f"{N/dt:10,.0f} env-steps/s (compile {t_compile:.0f}s,"
                f" finite={ok})",
                flush=True,
            )
        except Exception as e:
            print(f"RESULT {task} S<={s}: FAIL {type(e).__name__}: {e}",
                  flush=True)
