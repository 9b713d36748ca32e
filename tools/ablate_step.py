"""Step-regime ablation: time the REAL env.step chain (random actions,
falls, auto-resets — the bench regime) under kernel-stage stubs, to
attribute in-step cost. The standalone forward ablation (ablate_kernel.py)
measures reset states only, which under-represents the full-branch and
collision costs that dominate once ~10%% of envs are falling.

Usage: BENCH_TASK=... python tools/ablate_step.py [variant ...]
Variants: full fastoff nocoll nosolve nocoll-nosolve
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
from loco_mujoco_tpu.ops import pallas_newton as pn
from loco_mujoco_tpu.ops import pallas_fk as pfk

N = int(os.environ.get("BENCH_N_ENVS", 4096))
task = os.environ.get("BENCH_TASK", "HumanoidTorque.run.real")
env = lmt.make(task, debug=True)

keys = jax.random.split(jax.random.PRNGKey(0), N)
states = jax.jit(jax.vmap(env.reset), compiler_options=_COPTS)(keys)
actions = 0.1 * jax.random.normal(
    jax.random.PRNGKey(1), (N, env.action_dim), dtype=jnp.float32
)

orig_solve_core = pn.solve_core
orig_collide = pfk.collide_env_block


def stub_solve_core(J, M, aref, D, R, floss_fl, act, asm, ws, nv,
                    iterations, ls_iterations, ne, nfl, **kw):
    return asm, aref * 0.0


def stub_collide(colp, fk, tbl_refs, zero, eshape):
    n = colp.ncon
    far = zero + 1e10
    gids = []
    for grp in colp.groups:
        for _ in range(grp["k"] * grp["slots"]):
            gids.append(zero + float(colp.plane_gid + 1))
    return [(zero, zero, zero)] * n, [far] * n, gids[:n]


orig_gather = pfk._gather_dot


def stub_manifold_gather(tbl, oh):
    """Kill only the big (3+4D, V) manifold/meta gathers; keep the (V, 3)
    height maps real."""
    if tbl.shape[1] == 3:
        return orig_gather(tbl, oh)
    return jnp.zeros((tbl.shape[0],) + oh.shape[1:], jnp.float32)


def fast_gather(tbl, oh):
    """All gathers at default (bf16) matmul precision — measures the cost
    of the 6-pass f32 'highest' emulation the kernel inherits."""
    import jax as _jax

    with _jax.default_matmul_precision("default"):
        return orig_gather(tbl, oh)


VARIANTS = {
    "full": {},
    "fastoff": {"env": {"LMT_FAST_BRANCH": "0"}},
    "nocoll": {"coll": True},
    "nosolve": {"solve": True},
    "nocoll-nosolve": {"coll": True, "solve": True},
    "scan": {"env": {"LMT_MEGASTEP": "0"}},
    "nomanifold": {"gather": stub_manifold_gather},
    "bf16gather": {"gather": fast_gather},
    "iters2": {"iters": 2},
    "ls2": {"ls": 2},
}

names = sys.argv[1:] or list(VARIANTS)
# settle into the bench steady state ONCE with the default path
step0 = jax.jit(jax.vmap(env.step), compiler_options=_COPTS)
st = states
for _ in range(30):
    st = step0(st, actions)
jax.block_until_ready(st.obs)
print(f"{task}: settled, done_frac/step = "
      f"{float(jnp.mean(st.done.astype(jnp.float32))):.3f}", flush=True)

for name in names:
    pat = VARIANTS[name]
    envvars = pat.get("env", {})
    saved = {k: os.environ.get(k) for k in envvars}
    os.environ.update(envvars)
    pn.solve_core = stub_solve_core if pat.get("solve") else orig_solve_core
    pfk.collide_env_block = (
        stub_collide if pat.get("coll") else orig_collide
    )
    pfk._gather_dot = pat.get("gather") or orig_gather
    if pat.get("iters"):
        env.model = env.model.replace(
            opt=env.model.opt.replace(iterations=pat["iters"])
        )
    elif pat.get("ls"):
        env.model = env.model.replace(
            opt=env.model.opt.replace(ls_iterations=pat["ls"])
        )
    else:
        env.model = env.model.replace(
            opt=env.model.opt.replace(iterations=8, ls_iterations=8)
        )
    pc._MEGA_CACHE.clear()
    pc._MEGASTEP_CACHE.clear()
    pc._FUSED_CACHE.clear()
    pc._PLAN_CACHE.clear()

    step = jax.jit(
        jax.vmap(lambda s, a: env.step(s, a)), compiler_options=_COPTS
    )
    t = time.time()
    s = step(st, actions)
    jax.block_until_ready(s.obs)
    compile_s = time.time() - t
    reps = 30
    t = time.time()
    for _ in range(reps):
        s = step(s, actions)
    jax.block_until_ready(s.obs)
    ms = (time.time() - t) / reps * 1000
    print(f"{name:16s}: {ms:8.2f} ms/step  ({N/ms*1000:9,.0f} steps/s) "
          f"(compile {compile_s:.0f}s)", flush=True)
    for k, v in saved.items():
        if v is None:
            os.environ.pop(k, None)
        else:
            os.environ[k] = v

pn.solve_core = orig_solve_core
pfk.collide_env_block = orig_collide
pfk._gather_dot = orig_gather
