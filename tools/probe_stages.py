"""Per-stage TPU timing of the forward pipeline at batch 4096.

Identifies which stage (kinematics/CRB/collision/constraint-solve/...)
dominates the step so optimization effort lands where the time is.
"""
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp

import loco_mujoco_tpu as lmt
from loco_mujoco_tpu.utils.tpu import tpu_compiler_options

_COPTS = tpu_compiler_options()
from loco_mujoco_tpu.ops import forward as fwd
from loco_mujoco_tpu.ops import (
    actuation,
    collision,
    constraint,
    inertia,
    kinematics,
    passive,
    solver,
    tendon,
    velocity,
)

import os

N = int(os.environ.get("BENCH_N_ENVS", 4096))
env = lmt.make(
    os.environ.get("BENCH_TASK", "HumanoidTorque.run.real"), debug=True
)
model = env.model
print(
    f"nq={model.nq} nv={model.nv} nbody={model.nbody} ngeom={model.ngeom} "
    f"npair={len(model.pair_geom1) if model.pair_geom1 is not None else 0}",
    flush=True,
)

keys = jax.random.split(jax.random.PRNGKey(0), N)
states = jax.jit(jax.vmap(env.reset), compiler_options=_COPTS)(keys)
data0 = states.data
jax.block_until_ready(data0.qpos)


def bench(name, fn, *args):
    jfn = jax.jit(jax.vmap(lambda *a: fn(model, *a)), compiler_options=_COPTS)
    t = time.time()
    out = jfn(*args)
    jax.block_until_ready(out)
    compile_s = time.time() - t
    t = time.time()
    reps = 5
    for _ in range(reps):
        out = jfn(*args)
    jax.block_until_ready(out)
    ms = (time.time() - t) / reps * 1000
    print(f"{name:24s} compile {compile_s:7.1f}s   run {ms:9.2f} ms", flush=True)
    return out


d = data0
d = bench("fwd_position", fwd.fwd_position, d)
d = bench("  kinematics", kinematics.kinematics, data0)
d2 = bench("  com_pos", kinematics.com_pos, d)
d2 = bench("  crb", inertia.crb, d2)
d2 = bench("  factor_m", inertia.factor_m, d2)
d2 = bench("  collision", collision.collision, d2)
d2 = bench("fwd_velocity", fwd.fwd_velocity, d2)
d2 = bench("fwd_actuation", fwd.fwd_actuation, d2)
d2 = bench("fwd_acceleration", fwd.fwd_acceleration, d2)
d3 = bench("fwd_constraint", fwd.fwd_constraint, d2)
d3 = bench("full forward", fwd.forward, data0)
d4 = bench("full step", fwd.step, data0)
