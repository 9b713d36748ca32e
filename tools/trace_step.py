"""On-chip device-time attribution for one env.step: jax.profiler trace
over chained steps, aggregated by op name from the trace events.

Usage: python tools/trace_step.py [task] [n_envs] [reps]
"""

import collections
import glob
import gzip
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp

import loco_mujoco_tpu as lmt

TASK = sys.argv[1] if len(sys.argv) > 1 else "HumanoidTorque.run.real"
N = int(sys.argv[2]) if len(sys.argv) > 2 else 4096
REPS = int(sys.argv[3]) if len(sys.argv) > 3 else 10

from loco_mujoco_tpu.utils.tpu import tpu_compiler_options

copts = tpu_compiler_options()
env = lmt.make(TASK, debug=True)
reset_fn = jax.jit(jax.vmap(env.reset), compiler_options=copts)
step_fn = jax.jit(jax.vmap(env.step), compiler_options=copts)

states = reset_fn(jax.random.split(jax.random.PRNGKey(0), N))
actions = 0.1 * jax.random.normal(jax.random.PRNGKey(1), (N, env.action_dim))

t0 = time.time()
states = step_fn(states, actions)
jax.block_until_ready(states)
print(f"step compile+first {time.time()-t0:.1f}s", flush=True)

# steady-state timing
t0 = time.time()
for _ in range(REPS):
    states = step_fn(states, actions)
jax.block_until_ready(states)
dt = (time.time() - t0) / REPS
print(f"steady: {dt*1e3:.1f} ms/step  {N/dt:,.0f} env-steps/s", flush=True)

tracedir = "/tmp/lmt_trace"
with jax.profiler.trace(tracedir):
    for _ in range(REPS):
        states = step_fn(states, actions)
    jax.block_until_ready(states)

# aggregate device durations by op name and source line
paths = sorted(glob.glob(tracedir + "/**/*.trace.json.gz", recursive=True))
events = json.load(gzip.open(paths[-1]))["traceEvents"]
agg = collections.Counter()
agg_src = collections.Counter()
total = 0.0
for e in events:
    if e.get("ph") != "X" or "dur" not in e:
        continue
    args = e.get("args") or {}
    if "device_duration_ps" not in args and "long_name" not in args:
        continue
    name = e.get("name", "?")
    base = name.split(".")[0]
    if base in ("jit_step", "while"):  # parent frames double-count children
        continue
    dur = float(args.get("device_duration_ps", e["dur"] * 1e6)) / 1e12
    agg[base] += dur
    src = args.get("source", "?")
    agg_src[(base, src)] += dur
    total += dur

print(f"\ntotal device time {total/REPS*1e3:.1f} ms/step over {REPS} steps")
for name, dur in agg.most_common(15):
    print(f"{dur/REPS*1e3:9.3f} ms  {100*dur/total:5.1f}%  {name}")
print("\nby (op, source):")
for (name, src), dur in agg_src.most_common(40):
    print(f"{dur/REPS*1e3:9.3f} ms  {name[:28]:28s}  {src}")
