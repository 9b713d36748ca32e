"""Velocity stage: com-frame body velocities and bias (Coriolis + gravity)
forces via the recursive Newton-Euler algorithm.

Produces the same quantities as MuJoCo's mj_comVel / mj_rne(flg_acc=0)
(reference delegates these to the C library; see SURVEY.md L0). Tree
recursions are unrolled at trace time (nbody <= ~46); each step is a handful
of 6-vector ops that batch over envs under vmap.
"""

from __future__ import annotations

import jax.numpy as jnp

from ..core.types import Data, Model
from . import math as m3


def com_vel(model: Model, data: Data) -> Data:
    """Body com-frame velocities cvel and dof Jacobian rates cdof_dot."""
    dtype = data.qpos.dtype
    zero6 = jnp.zeros(6, dtype=dtype)
    cvel = [zero6] * model.nbody
    cdof_dot = [zero6] * model.nv

    for b in range(1, model.nbody):
        pid = int(model.body_parentid[b])
        v = cvel[pid]
        dadr, dnum = int(model.body_dofadr[b]), int(model.body_dofnum[b])
        for d in range(dadr, dadr + dnum):
            # rate of the motion subspace column, computed with the velocity
            # accumulated so far (parent + preceding dofs of this body) —
            # matches mj_comVel's in-loop ordering for hinge/slide joints.
            cdof_dot[d] = m3.motion_cross(v, data.cdof[d])
            v = v + data.cdof[d] * data.qvel[d]
        cvel[b] = v

    return data.replace(
        cvel=jnp.stack(cvel),
        cdof_dot=(
            jnp.stack(cdof_dot)
            if model.nv
            else jnp.zeros((0, 6), dtype=dtype)
        ),
    )


def rne(model: Model, data: Data) -> Data:
    """Bias force qfrc_bias = C(qpos, qvel): RNE with zero acceleration."""
    dtype = data.qpos.dtype

    # forward pass: com-frame accelerations (gravity as base acceleration)
    gravity = jnp.concatenate(
        [jnp.zeros(3, dtype=dtype), -model.opt.gravity.astype(dtype)]
    )
    cacc = [gravity] * model.nbody
    for b in range(1, model.nbody):
        pid = int(model.body_parentid[b])
        a = cacc[pid]
        dadr, dnum = int(model.body_dofadr[b]), int(model.body_dofnum[b])
        for d in range(dadr, dadr + dnum):
            a = a + data.cdof_dot[d] * data.qvel[d]
        cacc[b] = a

    # body forces: f = I*a + v x* (I*v)
    cacc_arr = jnp.stack(cacc)
    iv = m3.inert_mul(data.cinert, data.cvel)
    cfrc = m3.inert_mul(data.cinert, cacc_arr) + m3.force_cross(data.cvel, iv)

    # backward pass: accumulate child forces into parents
    cfrc_body = [cfrc[b] for b in range(model.nbody)]
    for b in range(model.nbody - 1, 0, -1):
        pid = int(model.body_parentid[b])
        if pid > 0:
            cfrc_body[pid] = cfrc_body[pid] + cfrc_body[b]
    cfrc_arr = jnp.stack(cfrc_body)

    qfrc_bias = jnp.einsum(
        "vi,vi->v", data.cdof, cfrc_arr[model.dof_bodyid]
    )
    return data.replace(qfrc_bias=qfrc_bias)
