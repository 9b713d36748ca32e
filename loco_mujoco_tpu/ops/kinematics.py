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
import numpy as np

from ..core.types import Data, JointType, Model
from . import math as m3


def kinematics(model: Model, data: Data) -> Data:
    """Forward kinematics: body/geom/site frames and joint anchors/axes.

    The body recursion runs as a lax.scan over topologically-ordered bodies
    (bodies are stored parent-before-child in MJCF models) with a short
    unrolled inner loop over each body's joints. An unrolled whole-tree
    graph triggers superlinear XLA compile times on the bigger humanoids
    (~4 minutes for nv=37 on CPU); the scan form compiles in seconds and
    runs at the same speed under vmap.
    """
    dtype = data.qpos.dtype
    nb, nj = model.nbody, model.njnt
    maxj = int(model.body_jntnum.max()) if nj else 0

    if not np.all(np.asarray(model.jnt_type) >= int(JointType.SLIDE)):
        raise NotImplementedError("hinge/slide joints only")

    parent = jnp.asarray(model.body_parentid)
    jadr = jnp.asarray(model.body_jntadr)
    jnum = jnp.asarray(model.body_jntnum)
    jtype = jnp.asarray(model.jnt_type)
    qadr = jnp.asarray(model.jnt_qposadr)

    xpos0 = jnp.zeros((nb, 3), dtype=dtype)
    xquat0 = jnp.tile(jnp.array([1.0, 0, 0, 0], dtype=dtype), (nb, 1))
    xanchor0 = jnp.zeros((max(nj, 1), 3), dtype=dtype)
    xaxis0 = jnp.zeros((max(nj, 1), 3), dtype=dtype)

    def body_step(carry, b):
        xpos, xquat, xanchor, xaxis = carry
        pid = parent[b]
        pos = xpos[pid] + m3.quat_rotate(xquat[pid], model.body_pos[b])
        quat = m3.quat_mul(xquat[pid], model.body_quat[b])

        for i in range(maxj):
            j = jadr[b] + i
            valid = i < jnum[b]
            js = jnp.clip(j, 0, nj - 1)
            jp = model.jnt_pos[js]
            ja = model.jnt_axis[js]
            anchor = pos + m3.quat_rotate(quat, jp)
            axis = m3.quat_rotate(quat, ja)
            xanchor = xanchor.at[js].set(
                jnp.where(valid, anchor, xanchor[js])
            )
            xaxis = xaxis.at[js].set(jnp.where(valid, axis, xaxis[js]))
            qd = data.qpos[qadr[js]] - model.qpos0[qadr[js]]
            is_slide = jtype[js] == int(JointType.SLIDE)
            pos_slide = pos + axis * qd
            qloc = m3.axis_angle_to_quat(ja, qd)
            quat_h = m3.quat_mul(quat, qloc)
            pos_h = anchor - m3.quat_rotate(quat_h, jp)
            pos_new = jnp.where(is_slide, pos_slide, pos_h)
            quat_new = jnp.where(is_slide, quat, quat_h)
            pos = jnp.where(valid, pos_new, pos)
            quat = jnp.where(valid, quat_new, quat)

        xpos = xpos.at[b].set(pos)
        xquat = xquat.at[b].set(quat)
        return (xpos, xquat, xanchor, xaxis), None

    (xpos, xquat, xanchor, xaxis), _ = jax.lax.scan(
        body_step, (xpos0, xquat0, xanchor0, xaxis0), jnp.arange(1, nb)
    )
    if nj == 0:
        xanchor = jnp.zeros((0, 3), dtype=dtype)
        xaxis = jnp.zeros((0, 3), dtype=dtype)
    xmat = m3.quat_to_mat(xquat)

    xipos = xpos + jax.vmap(m3.quat_rotate)(xquat, model.body_ipos)
    ximat = xmat @ m3.quat_to_mat(model.body_iquat)

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
        site_xpos = jnp.zeros((0, 3), dtype=dtype)
        site_xmat = jnp.zeros((0, 3, 3), dtype=dtype)

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

    # subtree com: bottom-up mass-weighted average (reverse scan over the
    # parent-ordered body array — see kinematics() for why not unrolled)
    mass = model.body_mass  # (nbody,)
    parent = jnp.asarray(model.body_parentid)
    weighted0 = mass[:, None] * data.xipos
    submass0 = mass

    def up_step(carry, b):
        weighted, submass = carry
        pid = parent[b]
        weighted = weighted.at[pid].add(weighted[b])
        submass = submass.at[pid].add(submass[b])
        return (weighted, submass), None

    (weighted, submass), _ = jax.lax.scan(
        up_step, (weighted0, submass0),
        jnp.arange(model.nbody - 1, 0, -1),
    )
    subtree_com = weighted / jnp.maximum(submass, 1e-12)[:, None]

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

    # cdof per dof: motion subspace at the com-centered frame (vectorized;
    # hinge/slide only, nq == nv)
    if model.njnt:
        jb = model.jnt_bodyid
        axis = data.xaxis  # (njnt, 3)
        offset = center[jb] - data.xanchor  # (njnt, 3)
        hinge = jnp.asarray(
            model.jnt_type == int(JointType.HINGE)
        )[:, None]
        ang = jnp.where(hinge, axis, 0.0)
        lin = jnp.where(hinge, jnp.cross(axis, offset), axis)
        cdof = jnp.concatenate([ang, lin], axis=-1)
    else:
        cdof = jnp.zeros((0, 6), dtype=dtype)

    return data.replace(subtree_com=subtree_com, cinert=cinert, cdof=cdof)
