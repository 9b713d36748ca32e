"""In-kernel stage ablation for the mega kernel (TPU).

Monkeypatches pipeline pieces (Newton solve, Cholesky, collision, smooth
preamble, FK) with stubs BEFORE tracing, and times the chained mega
solver for each cumulative variant. The deltas attribute the per-forward
fixed cost to stages — wall-clock and the XLA profiler cannot see inside
one Pallas program.

Usage: BENCH_TASK=HumanoidTorque.run.real python tools/ablate_kernel.py
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
m = env.model

keys = jax.random.split(jax.random.PRNGKey(0), N)
states = jax.jit(jax.vmap(env.reset), compiler_options=_COPTS)(keys)
d = states.data
jax.block_until_ready(d.qpos)

plan = pc.get_plan(m, jax.tree_util.tree_map(lambda l: l[0], d.contact))
assert plan is not None and plan.mega, "task not mega-capable"
print(
    f"{task}: nrows={plan.nrows} ncon={plan.ncon} nv={plan.nv} "
    f"ne={plan.ne} nfl={plan.nfl} nl={plan.nl} nbody={plan.nbody} "
    f"fast={len(plan.mega_fast) if plan.mega_fast else None}",
    flush=True,
)

vec = jnp.concatenate([
    d.qpos, d.qvel, d.act, d.ctrl, d.qfrc_applied,
    d.xfrc_applied.reshape(N, -1), d.qacc_warmstart,
], axis=1).astype(jnp.float32)

# --- originals ---
orig_solve_core = pn.solve_core
orig_chol = pn.chol_solve_spd
orig_collide = pfk.collide_env_block
orig_smooth = pc._smooth_preamble
orig_fk = pfk.fk_env_block


def stub_solve_core(J, M, aref, D, R, floss_fl, act, asm, ws, nv,
                    iterations, ls_iterations, ne, nfl, **kw):
    return asm, aref * 0.0


def stub_chol(M, rhs, nv, jitter=0.0):
    if isinstance(rhs, list):
        return jnp.stack(rhs)
    return rhs


def stub_collide(colp, fk, tbl_refs, zero, eshape):
    n = colp.ncon
    far = zero + 1e10
    pos = [(zero, zero, zero)] * n
    dist = [far] * n
    # first candidate geom id per slot
    gids = []
    for grp in colp.groups:
        for _ in range(grp["k"] * grp["slots"]):
            gids.append(zero + float(colp.plane_gid + 1))
    return pos, dist, gids[:n]


def stub_smooth(plan_, acc, qpos, qvel, zero):
    nv = plan_.nv
    tz = qvel[0] * 0.0
    cdof_tab = [[tz] * 6 for _ in range(nv)]
    com_l = [tz, tz, tz]
    ci_list = [jnp.stack([tz] * 10) for _ in range(plan_.nbody)]
    qfs_vec = jnp.stack([tz] * nv)
    ws_vec = acc.ws_vec()

    def arm_at(a):
        return plan_.sm_armature[a]

    return cdof_tab, com_l, ci_list, qfs_vec, ws_vec, arm_at


class _StubFk:
    pass


def stub_fk(fkp, qpos_row):
    out = pfk.FkResult()
    nb = fkp.nbody
    tz = qpos_row(0) * 0.0
    one = 1.0
    out.xpos = [(tz, tz, tz) for _ in range(nb)]
    out.xquat = [(one, 0.0, 0.0, 0.0) for _ in range(nb)]
    ident = ((one, 0.0, 0.0), (0.0, one, 0.0), (0.0, 0.0, one))
    out.xmat = [ident for _ in range(nb)]
    out.xipos = [(tz, tz, tz) for _ in range(nb)]
    out.ximat = [ident for _ in range(nb)]
    nj = max(fkp.njnt, 1)
    out.xanchor = [(tz, tz, tz) for _ in range(nj)]
    out.xaxis = [(1.0, 0.0, 0.0) for _ in range(nj)]
    return out


VARIANTS = [
    ("full", {}),
    ("-solve", {"solve": True}),
    ("-solve-chol", {"solve": True, "chol": True}),
    ("-solve-chol-coll", {"solve": True, "chol": True, "coll": True}),
    ("-solve-chol-coll-smooth",
     {"solve": True, "chol": True, "coll": True, "smooth": True}),
    ("-solve-chol-coll-smooth-fk",
     {"solve": True, "chol": True, "coll": True, "smooth": True,
      "fk": True}),
]

for name, pat in VARIANTS:
    pn.solve_core = stub_solve_core if pat.get("solve") else orig_solve_core
    pn.chol_solve_spd = stub_chol if pat.get("chol") else orig_chol
    pc.pn.chol_solve_spd = pn.chol_solve_spd
    pfk.collide_env_block = (
        stub_collide if pat.get("coll") else orig_collide
    )
    pc._smooth_preamble = stub_smooth if pat.get("smooth") else orig_smooth
    pfk.fk_env_block = stub_fk if pat.get("fk") else orig_fk

    pc._MEGA_CACHE.clear()
    solver = pc.get_mega_solver(
        plan, m.opt.iterations, m.opt.ls_iterations,
        scale=m.stat_meaninertia * max(1, m.nv),
        tolerance=max(m.opt.tolerance, 1e-6),
    )
    reps = 50

    @jax.jit
    def chained(v):
        def body(_, v):
            out = jax.vmap(solver)(v)
            return jnp.concatenate([v[:, :-plan.nv], out[0]], axis=1)

        return jax.lax.fori_loop(0, reps, body, v)

    fn = jax.jit(chained, compiler_options=_COPTS)
    t = time.time()
    try:
        jax.block_until_ready(fn(vec))
    except Exception as e:
        print(f"{name}: FAILED {type(e).__name__}: {str(e)[:200]}",
              flush=True)
        continue
    compile_s = time.time() - t
    t = time.time()
    jax.block_until_ready(fn(vec))
    ms = (time.time() - t) / reps * 1000
    print(f"{name:28s}: {ms:8.3f} ms/forward  (compile {compile_s:.0f}s)",
          flush=True)

pn.solve_core = orig_solve_core
pn.chol_solve_spd = orig_chol
pfk.collide_env_block = orig_collide
pc._smooth_preamble = orig_smooth
pfk.fk_env_block = orig_fk
