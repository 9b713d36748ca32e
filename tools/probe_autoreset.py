"""Isolate the auto-reset 10x step slowdown.

Variants:
  A. step, no auto-reset                     (baseline)
  B. full step (scan + init_state + where)   (slow: ~10.9s @4096)
  C. scan + where-merge with a fresh state computed OUTSIDE the program
  D. scan + init_state in-graph, but output = stepped (fresh only feeds
     a scalar) — isolates "init_state co-compiled with scan" from the merge
  E. two-program design: step_no_ar dispatch, then a separate jitted
     "where(done, init, state)" dispatch
"""
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import os
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")

import jax
import jax.numpy as jnp

import loco_mujoco_tpu as lmt

N = 4096
env = lmt.make("HumanoidTorque.run.real", debug=True)
envA = lmt.make("HumanoidTorque.run.real", debug=True)
envA.auto_reset = False

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
    print(f"{name:34s} compile {compile_s:7.1f}s   run {ms:9.1f} ms", flush=True)
    return out


bench("A step no-autoreset", jax.jit(jax.vmap(envA.step)), states, actions)


def step_c(state, action, fresh):
    stepped = envA.step(state, action)
    fresh = fresh.replace(
        reward=stepped.reward, absorbing=stepped.absorbing,
        done=stepped.done, rng=stepped.rng,
    )
    return jax.tree_util.tree_map(
        lambda f, s: jnp.where(stepped.done, f, s), fresh, stepped
    )


bench("C scan + where(external fresh)", jax.jit(jax.vmap(step_c)),
      states, actions, states)


def step_d(state, action):
    stepped = envA.step(state, action)
    rng, k = jax.random.split(state.rng)
    fresh = env._init_state(k)
    # keep fresh alive via a scalar contribution only
    leak = jax.tree_util.tree_reduce(
        lambda a, x: a + jnp.sum(x.astype(jnp.float32)) * 1e-30,
        (fresh.data.qpos, fresh.obs), 0.0,
    )
    return stepped.replace(reward=stepped.reward + leak)


bench("D scan + init in-graph (no merge)", jax.jit(jax.vmap(step_d)),
      states, actions)

bench("B full step", jax.jit(jax.vmap(env.step)), states, actions)


# E: two dispatches
step_no_ar = jax.jit(jax.vmap(envA.step))
def _reset_where1(state, key):
    fresh = env._init_state(key)
    fresh = fresh.replace(
        reward=state.reward, absorbing=state.absorbing,
        done=state.done, rng=state.rng,
    )
    return jax.tree_util.tree_map(
        lambda f, s: jnp.where(state.done, f, s), fresh, state
    )


def reset_where(state, key):
    return jax.vmap(_reset_where1)(state, jax.random.split(key, N))


reset_where_j = jax.jit(reset_where)

def two_prog(states, actions, key):
    s = step_no_ar(states, actions)
    return reset_where_j(s, key)

k = jax.random.PRNGKey(1)
t = time.time()
out = two_prog(states, actions, k)
jax.block_until_ready(out)
print(f"{'E two-program step+resetwhere':34s} compile {time.time()-t:7.1f}s", flush=True)
t = time.time()
for _ in range(3):
    out = two_prog(states, actions, k)
jax.block_until_ready(out)
print(f"{'E two-program run':34s} {(time.time()-t)/3*1000:9.1f} ms", flush=True)
