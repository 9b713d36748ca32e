"""Decompose env.step cost: physics scan vs obs/reward vs auto-reset."""
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp

import loco_mujoco_tpu as lmt
from loco_mujoco_tpu.ops import forward as fwd

N = 4096
env = lmt.make("HumanoidTorque.run.real", debug=True)
model = env.model

keys = jax.random.split(jax.random.PRNGKey(0), N)
states = jax.jit(jax.vmap(env.reset))(keys)
jax.block_until_ready(states.obs)
actions = jnp.zeros((N, env.action_dim))


def bench(name, fn, *args, reps=3):
    t = time.time()
    out = fn(*args)
    jax.block_until_ready(out)
    compile_s = time.time() - t
    t = time.time()
    for _ in range(reps):
        out = fn(*args)
    jax.block_until_ready(out)
    ms = (time.time() - t) / reps * 1000
    print(f"{name:28s} compile {compile_s:7.1f}s   run {ms:9.1f} ms", flush=True)
    return out


# 1. pure physics: scan 10 substeps of fwd.step
def phys10(d):
    def body(dd, _):
        return fwd.step(model, dd), None
    d, _ = jax.lax.scan(body, d, None, length=10)
    return d

bench("10x fwd.step (scan)", jax.jit(jax.vmap(phys10)), states.data)

# 2. env.step without auto-reset
env2 = lmt.make("HumanoidTorque.run.real", debug=True)
env2.auto_reset = False
bench("env.step no-autoreset", jax.jit(jax.vmap(env2.step)), states, actions)

# 3. full env.step
bench("env.step full", jax.jit(jax.vmap(env.step)), states, actions)

# 4. reset alone
bench("env.reset", jax.jit(jax.vmap(env.reset)), keys)
