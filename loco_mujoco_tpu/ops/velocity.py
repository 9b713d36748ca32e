"""Velocity stage: com-frame body velocities and bias (Coriolis + gravity)
forces via the recursive Newton-Euler algorithm.

Produces the same quantities as MuJoCo's mj_comVel / mj_rne(flg_acc=0)
(reference delegates these to the C library; see SURVEY.md L0). Tree
recursions run as lax.scan over the parent-ordered body array with a short
unrolled inner loop over each body's joints — unrolled whole-tree graphs
blow up XLA compile times superlinearly (see ops/kinematics.py).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..core.types import Data, Model
from . import math as m3


def com_vel(model: Model, data: Data) -> Data:
    """Body com-frame velocities cvel and dof Jacobian rates cdof_dot."""
    dtype = data.qpos.dtype
    nb, nv = model.nbody, model.nv
    maxj = int(model.body_jntnum.max()) if model.njnt else 0

    parent = jnp.asarray(model.body_parentid)
    dadr = jnp.asarray(model.body_dofadr)
    dnum = jnp.asarray(model.body_dofnum)

    cvel0 = jnp.zeros((nb, 6), dtype=dtype)
    cdof_dot0 = jnp.zeros((max(nv, 1), 6), dtype=dtype)

    def body_step(carry, b):
        cvel, cdof_dot = carry
        v = cvel[parent[b]]
        for i in range(maxj):
            d = dadr[b] + i
            valid = i < dnum[b]
            ds = jnp.clip(d, 0, nv - 1)
            # rate of the motion subspace column, computed with the velocity
            # accumulated so far (parent + preceding dofs of this body) —
            # matches mj_comVel's in-loop ordering for hinge/slide joints.
            cd = m3.motion_cross(v, data.cdof[ds])
            cdof_dot = cdof_dot.at[ds].set(
                jnp.where(valid, cd, cdof_dot[ds])
            )
            v = jnp.where(valid, v + data.cdof[ds] * data.qvel[ds], v)
        cvel = cvel.at[b].set(v)
        return (cvel, cdof_dot), None

    (cvel, cdof_dot), _ = jax.lax.scan(
        body_step, (cvel0, cdof_dot0), jnp.arange(1, nb)
    )
    if nv == 0:
        cdof_dot = jnp.zeros((0, 6), dtype=dtype)
    return data.replace(cvel=cvel, cdof_dot=cdof_dot)


def rne(model: Model, data: Data) -> Data:
    """Bias force qfrc_bias = C(qpos, qvel): RNE with zero acceleration."""
    dtype = data.qpos.dtype
    nb, nv = model.nbody, model.nv
    maxj = int(model.body_jntnum.max()) if model.njnt else 0

    parent = jnp.asarray(model.body_parentid)
    dadr = jnp.asarray(model.body_dofadr)
    dnum = jnp.asarray(model.body_dofnum)

    # forward pass: com-frame accelerations (gravity as base acceleration)
    gravity = jnp.concatenate(
        [jnp.zeros(3, dtype=dtype), -model.opt.gravity.astype(dtype)]
    )
    cacc0 = jnp.broadcast_to(gravity, (nb, 6))

    def fwd_step(cacc, b):
        a = cacc[parent[b]]
        for i in range(maxj):
            d = dadr[b] + i
            valid = i < dnum[b]
            ds = jnp.clip(d, 0, nv - 1)
            a = jnp.where(valid, a + data.cdof_dot[ds] * data.qvel[ds], a)
        return cacc.at[b].set(a), None

    cacc, _ = jax.lax.scan(fwd_step, cacc0, jnp.arange(1, nb))

    # body forces: f = I*a + v x* (I*v)
    iv = m3.inert_mul(data.cinert, data.cvel)
    cfrc = m3.inert_mul(data.cinert, cacc) + m3.force_cross(data.cvel, iv)

    # backward pass: accumulate child forces into parents (world excluded)
    def back_step(cf, b):
        pid = parent[b]
        add = jnp.where(pid > 0, cf[b], jnp.zeros(6, dtype=dtype))
        return cf.at[pid].add(add), None

    cfrc, _ = jax.lax.scan(
        back_step, cfrc, jnp.arange(nb - 1, 0, -1)
    )

    qfrc_bias = jnp.einsum(
        "vi,vi->v", data.cdof, cfrc[model.dof_bodyid]
    )
    return data.replace(qfrc_bias=qfrc_bias)
