"""Device-time attribution for one env.step via jax.profiler.

Traces a few chained steps per task, parses the trace proto, and
aggregates device_duration by op name AND by source line — the ground
truth for where the step's milliseconds go (wall-clock stage timing can't
see inside one fused jit).

Usage: python tools/trace_device.py [task ...] [--envs N]
"""
import glob
import gzip
import json
import os
import shutil
import sys
import time
from collections import defaultdict
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp

import loco_mujoco_tpu as lmt
from loco_mujoco_tpu.utils.tpu import tpu_compiler_options

_COPTS = tpu_compiler_options()

args = [a for a in sys.argv[1:] if not a.startswith("--")]
N = int(os.environ.get("BENCH_N_ENVS", 4096))
TASKS = args or ["HumanoidTorque.run.real"]


def profile_task(task):
    trace_dir = f"/tmp/lmt_trace_{task.replace('.', '_')}"
    shutil.rmtree(trace_dir, ignore_errors=True)
    env = lmt.make(task, debug=True)
    reset_fn = jax.jit(jax.vmap(env.reset), compiler_options=_COPTS)
    step_fn = jax.jit(jax.vmap(env.step), compiler_options=_COPTS)
    states = reset_fn(jax.random.split(jax.random.PRNGKey(0), N))
    actions = jnp.zeros((N, env.action_dim))
    states = step_fn(states, actions)
    states.obs.block_until_ready()
    t0 = time.time()
    for _ in range(10):
        states = step_fn(states, actions)
    states.obs.block_until_ready()
    ms = (time.time() - t0) / 10 * 1e3
    print(f"\n==== {task}: {ms:.1f} ms/step ({N/ms*1000:,.0f} env-steps/s)",
          flush=True)

    os.makedirs(trace_dir, exist_ok=True)
    with jax.profiler.trace(trace_dir):
        for _ in range(3):
            states = step_fn(states, actions)
        states.obs.block_until_ready()

    paths = sorted(
        glob.glob(f"{trace_dir}/**/*.trace.json.gz", recursive=True),
        key=os.path.getmtime,
    )
    with gzip.open(paths[-1], "rt") as fh:
        trace = json.load(fh)

    # module events (jit_*) and the substep `while` wrap everything else;
    # `closed_call` regions are the pallas kernels
    by_name = defaultdict(float)
    by_src = defaultdict(float)
    total = 0.0
    for ev in trace.get("traceEvents", []):
        if ev.get("ph") != "X":
            continue
        a = ev.get("args") or {}
        d = a.get("device_duration_ps")
        if d is None:
            continue
        base = ev.get("name", "?").split(".")[0]
        if base.startswith("jit_") or base == "while":
            continue
        ms_ev = float(d) / 1e9
        by_name[base] += ms_ev
        by_src[str(a.get("source", "?"))] += ms_ev
        total += ms_ev

    print(f"non-container device total: {total/3:.1f} ms/step "
          f"(closed_call = pallas regions)")
    for name, t in sorted(by_name.items(), key=lambda kv: -kv[1])[:12]:
        print(f"  {name[:58]:58s} {t/3:8.2f} {t/total*100:5.1f}%")
    print("by source line:")
    for src, t in sorted(by_src.items(), key=lambda kv: -kv[1])[:18]:
        print(f"  {t/3:8.2f} ms  {src[-80:]}")


print("devices:", jax.devices(), flush=True)
for task in TASKS:
    try:
        profile_task(task)
    except Exception as e:
        print(f"==== {task}: FAIL {type(e).__name__}: {e}", flush=True)
