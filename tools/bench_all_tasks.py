"""Per-task TPU throughput sweep in ONE process (single TPU claim).

Writes BENCH_TASKS.json {task: env_steps_per_s} and compares against the
previous run's table: any task >10% below its prior number is reported
as a REGRESSION and the sweep exits 2 (the per-task perf regression
gate — round-4 lost 4-6% on H1/Talos silently).

Usage: python tools/bench_all_tasks.py [task ...]
Env:   BENCH_N_ENVS (default 4096), BENCH_N_STEPS (default 30)
"""
import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp

import loco_mujoco_tpu as lmt
from loco_mujoco_tpu.utils.tpu import tpu_compiler_options

N = int(os.environ.get("BENCH_N_ENVS", 4096))
REPS = int(os.environ.get("BENCH_N_STEPS", 30))
TASKS = sys.argv[1:] or [
    "HumanoidTorque.run.real",
    "UnitreeA1.simple.real",
    "UnitreeG1.walk.real",
    "HumanoidMuscle.walk.real",
    "Atlas.walk.real",
    "UnitreeH1.walk.real",
]

print(f"devices: {jax.devices()}  N={N} REPS={REPS}", flush=True)
copts = tpu_compiler_options()

_TBL = Path(__file__).resolve().parent.parent / "BENCH_TASKS.json"
prev = json.loads(_TBL.read_text()) if _TBL.exists() else {}
results = {}

for task in TASKS:
    try:
        t0 = time.time()
        env = lmt.make(task, debug=True)
        reset_fn = jax.jit(jax.vmap(env.reset), compiler_options=copts)
        step_fn = jax.jit(jax.vmap(env.step), compiler_options=copts)
        states = reset_fn(jax.random.split(jax.random.PRNGKey(0), N))
        states.obs.block_until_ready()
        t_reset = time.time() - t0

        actions = jnp.zeros((N, env.action_dim))
        t0 = time.time()
        states = step_fn(states, actions)
        states.obs.block_until_ready()
        t_compile = time.time() - t0

        # settle into the bench regime, then time with a VALUE sync (the
        # tunnel's block_until_ready can return before execution finishes)
        for _ in range(10):
            states = step_fn(states, actions)
        float(jnp.sum(states.obs))
        t0 = time.time()
        for _ in range(REPS):
            states = step_fn(states, actions)
        float(jnp.sum(states.obs))
        dt = (time.time() - t0) / REPS
        ok = bool(jnp.isfinite(states.obs).all())
        results[task] = round(N / dt)
        print(
            f"RESULT {task}: {dt*1e3:8.1f} ms/step  {N/dt:10,.0f} env-steps/s"
            f"  (reset {t_reset:.0f}s, step-compile {t_compile:.0f}s,"
            f" finite={ok})",
            flush=True,
        )
    except Exception as e:  # keep sweeping on per-task failure
        print(f"RESULT {task}: FAIL {type(e).__name__}: {e}", flush=True)

# ---- regression gate vs the previous table --------------------------------
rc = 0
for task, v in results.items():
    old = prev.get(task)
    if old and v < 0.9 * old:
        print(f"REGRESSION {task}: {v:,} vs previous {old:,} "
              f"({100 * (v / old - 1):+.1f}%)", flush=True)
        rc = 2
    elif old:
        print(f"ok {task}: {v:,} vs previous {old:,} "
              f"({100 * (v / old - 1):+.1f}%)", flush=True)
merged = dict(prev)
merged.update(results)
_TBL.write_text(json.dumps(merged, indent=1, sort_keys=True) + "\n")
sys.exit(rc)
