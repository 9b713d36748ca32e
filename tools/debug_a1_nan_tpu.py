"""Localize the non-finite A1 obs on TPU: substep-level then stage-level."""

import jax
import jax.numpy as jnp
import numpy as np

import loco_mujoco_tpu as lmt
from loco_mujoco_tpu.ops import forward as fwd

print("devices:", jax.devices(), flush=True)
env = lmt.make("UnitreeA1.simple.real", debug=True)
model = env.model

reset_fn = jax.jit(jax.vmap(env.reset))
states = reset_fn(jax.random.split(jax.random.PRNGKey(0), 256))
datas = states.data

step1 = jax.jit(jax.vmap(lambda d: fwd.step(model, d)))


def finite_report(tag, d):
    bad = {}
    for name in ("qpos", "qvel", "qacc", "qacc_smooth", "qfrc_constraint",
                 "qM", "efc_force_contact", "cvel", "cdof_dot", "qfrc_bias",
                 "geom_xpos"):
        x = getattr(d, name, None)
        if x is None or x.size == 0:
            continue
        nb = int(jnp.sum(~jnp.isfinite(x).reshape(x.shape[0], -1).all(axis=1)))
        if nb:
            bad[name] = nb
    print(tag, "bad:", bad, flush=True)
    return bad


d = datas
for k in range(10):
    d = step1(d)
    bad = finite_report(f"substep {k}", d)
    if bad:
        break

if bad:
    # rewind: re-run substeps up to k, then stage-by-stage
    d = datas
    for _ in range(k):
        d = step1(d)
    stages = [
        ("fwd_position", fwd.fwd_position),
        ("fwd_velocity", fwd.fwd_velocity),
        ("fwd_actuation", fwd.fwd_actuation),
        ("fwd_acceleration", fwd.fwd_acceleration),
        ("fwd_constraint", fwd.fwd_constraint),
    ]
    for name, f in stages:
        d = jax.jit(jax.vmap(lambda dd, f=f: f(model, dd)))(d)
        if finite_report(f"stage {name}", d):
            break
    # inspect one bad env's solver inputs
    x = d.qacc
    badenv = int(np.where(~np.isfinite(np.asarray(x)).all(axis=1))[0][0])
    print("bad env:", badenv, flush=True)
    for name in ("qacc_smooth", "qM", "qfrc_smooth", "qacc_warmstart"):
        v = np.asarray(getattr(d, name)[badenv])
        print(name, "finite", np.isfinite(v).all(), "absmax",
              np.abs(v).max() if np.isfinite(v).any() else "-", flush=True)
else:
    print("no NaN at substep granularity — checking full env.step", flush=True)
    step_fn = jax.jit(jax.vmap(env.step))
    s = step_fn(states, jnp.zeros((256, env.action_dim)))
    print("env.step obs finite:", bool(jnp.isfinite(s.obs).all()), flush=True)
    # env.step includes action scaling + obs assembly + auto-reset
    nb = np.where(~np.isfinite(np.asarray(s.obs)).all(axis=1))[0]
    print("bad envs:", nb[:10], len(nb), flush=True)
