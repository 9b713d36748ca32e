"""Position-stage pipeline: forward kinematics and com-centered quantities.

Implements the same mathematical quantities MuJoCo's mj_kinematics/mj_comPos
produce (xpos/xquat/xanchor/xaxis, subtree_com, cinert, cdof) so every stage
can be validated field-by-field against the CPU oracle in tests. The body
loop is unrolled at trace time (nbody <= ~45 for all supported robots); under
vmap each per-body op becomes a batched VPU op over thousands of envs, which
is the axis XLA vectorizes.

Supported joints: HINGE and SLIDE only — every robot in the reference suite
replaces free joints with 6 explicit slide/hinge root joints (see reference
`myoskeleton.py:1380-1405` and the root joints in all robot XMLs), so nq==nv
and there is no quaternion state.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..core.types import Data, JointType, Model
from . import math as m3


def kinematics(model: Model, data: Data) -> Data:
    """Forward kinematics: body/geom/site frames and joint anchors/axes."""
    nq_dtype = data.qpos.dtype
    xpos = [jnp.zeros(3, dtype=nq_dtype)] * model.nbody
    xquat = [jnp.array([1.0, 0, 0, 0], dtype=nq_dtype)] * model.nbody
    xanchor = [None] * model.njnt
    xaxis = [None] * model.njnt

    for b in range(1, model.nbody):
        pid = int(model.body_parentid[b])
        pos = xpos[pid] + m3.quat_rotate(xquat[pid], model.body_pos[b])
        quat = m3.quat_mul(xquat[pid], model.body_quat[b])

        jadr, jnum = int(model.body_jntadr[b]), int(model.body_jntnum[b])
        for j in range(jadr, jadr + jnum):
            qadr = int(model.jnt_qposadr[j])
            jtype = int(model.jnt_type[j])
            anchor = pos + m3.quat_rotate(quat, model.jnt_pos[j])
            axis = m3.quat_rotate(quat, model.jnt_axis[j])
            xanchor[j] = anchor
            xaxis[j] = axis
            qdelta = data.qpos[qadr] - model.qpos0[qadr]
            if jtype == JointType.SLIDE:
                pos = pos + axis * qdelta
            elif jtype == JointType.HINGE:
                qloc = m3.axis_angle_to_quat(model.jnt_axis[j], qdelta)
                quat = m3.quat_mul(quat, qloc)
                pos = anchor - m3.quat_rotate(quat, model.jnt_pos[j])
            else:
                raise NotImplementedError(
                    f"joint type {jtype} not supported (hinge/slide only)"
                )
        xpos[b] = pos
        xquat[b] = quat

    xpos = jnp.stack(xpos)
    xquat = jnp.stack(xquat)
    xmat = m3.quat_to_mat(xquat)

    xipos = xpos + jax.vmap(m3.quat_rotate)(xquat, model.body_ipos)
    ximat = xmat @ m3.quat_to_mat(model.body_iquat)

    if model.njnt:
        xanchor = jnp.stack(xanchor)
        xaxis = jnp.stack(xaxis)
    else:
        xanchor = jnp.zeros((0, 3), dtype=nq_dtype)
        xaxis = jnp.zeros((0, 3), dtype=nq_dtype)

    gb = model.geom_bodyid
    geom_xpos = xpos[gb] + jnp.einsum(
        "bij,bj->bi", xmat[gb], model.geom_pos
    )
    geom_xmat = xmat[gb] @ m3.quat_to_mat(model.geom_quat)

    if model.nsite:
        sb = model.site_bodyid
        site_xpos = xpos[sb] + jnp.einsum("bij,bj->bi", xmat[sb], model.site_pos)
        site_xmat = xmat[sb] @ m3.quat_to_mat(model.site_quat)
    else:
        site_xpos = jnp.zeros((0, 3), dtype=nq_dtype)
        site_xmat = jnp.zeros((0, 3, 3), dtype=nq_dtype)

    return data.replace(
        xpos=xpos,
        xquat=xquat,
        xmat=xmat,
        xipos=xipos,
        ximat=ximat,
        xanchor=xanchor,
        xaxis=xaxis,
        geom_xpos=geom_xpos,
        geom_xmat=geom_xmat,
        site_xpos=site_xpos,
        site_xmat=site_xmat,
    )


def com_pos(model: Model, data: Data) -> Data:
    """Subtree com, com-centered packed inertias (cinert) and dof motion
    vectors (cdof), matching MuJoCo's mj_comPos conventions."""
    dtype = data.qpos.dtype

    # subtree com: bottom-up mass-weighted average
    mass = model.body_mass  # (nbody,)
    weighted = [mass[b] * data.xipos[b] for b in range(model.nbody)]
    submass = [mass[b] for b in range(model.nbody)]
    for b in range(model.nbody - 1, 0, -1):
        pid = int(model.body_parentid[b])
        weighted[pid] = weighted[pid] + weighted[b]
        submass[pid] = submass[pid] + submass[b]
    subtree_com = jnp.stack(
        [weighted[b] / jnp.maximum(submass[b], 1e-12) for b in range(model.nbody)]
    )

    # per-body com-frame center: subtree_com of the body's kinematic root
    root = model.body_rootid  # (nbody,)
    center = subtree_com[root]  # (nbody, 3)

    # cinert: inertia about `center`, world-aligned axes
    R = data.ximat  # (nbody, 3, 3) inertial frame axes
    Idiag = model.body_inertia  # (nbody, 3)
    I_world = jnp.einsum("bij,bj,bkj->bik", R, Idiag, R)
    c = data.xipos - center  # (nbody, 3)
    mm = mass[:, None]
    cc = jnp.einsum("bi,bj->bij", c, c)
    c2 = jnp.sum(c * c, axis=-1)[:, None, None]
    eye = jnp.eye(3, dtype=dtype)
    I_shift = I_world + mm[..., None] * (c2 * eye - cc)
    cinert = jnp.concatenate(
        [
            I_shift[:, 0, 0:1], I_shift[:, 1, 1:2], I_shift[:, 2, 2:3],
            I_shift[:, 0, 1:2], I_shift[:, 0, 2:3], I_shift[:, 1, 2:3],
            mm * c,
            mm,
        ],
        axis=-1,
    )

    # cdof per dof: motion subspace at the com-centered frame
    cdofs = []
    for j in range(model.njnt):
        jtype = int(model.jnt_type[j])
        b = int(model.jnt_bodyid[j])
        axis = data.xaxis[j]
        if jtype == JointType.SLIDE:
            cdofs.append(jnp.concatenate([jnp.zeros(3, dtype=dtype), axis]))
        elif jtype == JointType.HINGE:
            offset = center[b] - data.xanchor[j]
            cdofs.append(jnp.concatenate([axis, jnp.cross(axis, offset)]))
        else:
            raise NotImplementedError
    cdof = (
        jnp.stack(cdofs)
        if cdofs
        else jnp.zeros((0, 6), dtype=dtype)
    )

    return data.replace(subtree_com=subtree_com, cinert=cinert, cdof=cdof)
