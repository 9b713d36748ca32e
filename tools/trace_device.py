"""Device-time attribution for one env.step via jax.profiler.

Traces a few chained steps, parses the trace proto, and aggregates
device_duration by op/kernel name — the ground truth for where the step's
milliseconds go (wall-clock stage timing can't see inside one fused jit).

Usage: python tools/trace_device.py [task] [n_envs]
"""
import glob
import gzip
import json
import os
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

TASK = sys.argv[1] if len(sys.argv) > 1 else "HumanoidTorque.run.real"
N = int(sys.argv[2]) if len(sys.argv) > 2 else 4096
TRACE_DIR = "/tmp/lmt_trace"

print("devices:", jax.devices(), flush=True)
env = lmt.make(TASK, debug=True)
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
print(f"step: {ms:.1f} ms ({N/ms*1000:,.0f} env-steps/s)", flush=True)

os.makedirs(TRACE_DIR, exist_ok=True)
with jax.profiler.trace(TRACE_DIR):
    for _ in range(3):
        states = step_fn(states, actions)
    states.obs.block_until_ready()

# aggregate device durations from the trace
paths = sorted(glob.glob(f"{TRACE_DIR}/**/*.trace.json.gz", recursive=True),
               key=os.path.getmtime)
assert paths, "no trace written"
with gzip.open(paths[-1], "rt") as fh:
    trace = json.load(fh)

by_name = defaultdict(float)
total = 0.0
for ev in trace.get("traceEvents", []):
    if ev.get("ph") != "X":
        continue
    args = ev.get("args") or {}
    dev_ps = args.get("device_duration_ps")
    if dev_ps is None:
        continue
    name = ev.get("name", "?")
    # strip fusion suffixes for readable grouping
    base = name.split(".")[0]
    ms_ev = float(dev_ps) / 1e9
    by_name[base] += ms_ev
    total += ms_ev

print(f"\ntotal device time over 3 steps: {total:.1f} ms "
      f"({total/3:.1f} ms/step)")
print(f"{'op':60s} {'ms/step':>9s} {'%':>6s}")
for name, t in sorted(by_name.items(), key=lambda kv: -kv[1])[:30]:
    print(f"{name[:60]:60s} {t/3:9.2f} {t/total*100:6.1f}")
