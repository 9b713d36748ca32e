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

    if not np.all(np.asarray(model.jnt_type) >= int(JointType.SLIDE)):
        raise NotImplementedError("hinge/slide joints only")

    parent_np = np.asarray(model.body_parentid)
    jadr_np = np.asarray(model.body_jntadr)
    jnum_np = np.asarray(model.body_jntnum)
    jtype_np = np.asarray(model.jnt_type)
    qadr_np = np.asarray(model.jnt_qposadr)

    # level-parallel traversal: all bodies at the same tree depth advance
    # together with one vectorized update per level (a per-body lax.scan
    # costs ~nbody sequential kernel groups per call — the FK scan alone
    # was ~10% of the whole step's device time on TPU)
    depth = np.zeros(nb, dtype=int)
    for b in range(1, nb):
        depth[b] = depth[parent_np[b]] + 1
    levels = [
        np.where(depth == L)[0] for L in range(1, int(depth.max()) + 1)
    ] if nb > 1 else []

    xpos = jnp.zeros((nb, 3), dtype=dtype)
    xquat = jnp.tile(jnp.array([1.0, 0, 0, 0], dtype=dtype), (nb, 1))
    xanchor = jnp.zeros((max(nj, 1), 3), dtype=dtype)
    xaxis = jnp.zeros((max(nj, 1), 3), dtype=dtype)

    for bs in levels:
        pids = parent_np[bs]
        pos = xpos[pids] + m3.quat_rotate(xquat[pids], model.body_pos[bs])
        quat = m3.quat_mul(xquat[pids], model.body_quat[bs])

        maxj_l = int(jnum_np[bs].max()) if nj else 0
        for i in range(maxj_l):
            valid = jnum_np[bs] > i  # static per-level joint occupancy
            sel = np.where(valid)[0]  # level-local body rows with joint i
            js = np.clip(jadr_np[bs[sel]] + i, 0, nj - 1)
            jp = model.jnt_pos[js]
            ja = model.jnt_axis[js]
            pos_s, quat_s = pos[sel], quat[sel]
            anchor = pos_s + m3.quat_rotate(quat_s, jp)
            axis = m3.quat_rotate(quat_s, ja)
            xanchor = xanchor.at[js].set(anchor)
            xaxis = xaxis.at[js].set(axis)
            qd = (data.qpos[qadr_np[js]] - model.qpos0[qadr_np[js]])[:, None]
            is_slide = (jtype_np[js] == int(JointType.SLIDE))[:, None]
            pos_slide = pos_s + axis * qd
            qloc = m3.axis_angle_to_quat(ja, qd[:, 0])
            quat_h = m3.quat_mul(quat_s, qloc)
            pos_h = anchor - m3.quat_rotate(quat_h, jp)
            pos = pos.at[sel].set(jnp.where(is_slide, pos_slide, pos_h))
            quat = quat.at[sel].set(jnp.where(is_slide, quat_s, quat_h))

        xpos = xpos.at[bs].set(pos)
        xquat = xquat.at[bs].set(quat)

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

    # subtree com: bottom-up mass-weighted average, as one masked matmul
    # against the static subtree incidence matrix (a reverse scan costs
    # ~nbody sequential scatter kernels per call on TPU)
    from .support import body_subtree_mask

    mass = model.body_mass  # (nbody,)
    sub = jnp.asarray(body_subtree_mask(model), dtype=dtype)
    weighted = jnp.einsum("ab,bc->ac", sub, mass[:, None] * data.xipos)
    submass = sub @ mass
    subtree_com = weighted / jnp.maximum(submass, 1e-12)[:, None]

    # per-body com-frame center: subtree_com of the body's kinematic root
    root = model.body_rootid  # (nbody,)
    center = subtree_com[root]  # (nbody, 3)

    # cinert: inertia about `center`, world-aligned axes. Only the 6 packed
    # components are needed, so compute them directly as elementwise
    # broadcasts — the einsum form (R diag(I) R^T as "bij,bj,bkj->bik")
    # lowers to convolution fusions whose layout choices force (nbody, 3, 3)
    # copies of R per call (~57 ms/step of pure data formatting at 4096
    # envs on v5e).
    R = data.ximat  # (nbody, 3, 3) inertial frame axes
    Idiag = model.body_inertia  # (nbody, 3)
    c = data.xipos - center  # (nbody, 3)
    mm = mass[:, None]
    c2 = jnp.sum(c * c, axis=-1)

    def iw(i, k):
        # I_world[i,k] = sum_j R[i,j] Idiag[j] R[k,j]
        v = (
            R[:, i, 0] * Idiag[:, 0] * R[:, k, 0]
            + R[:, i, 1] * Idiag[:, 1] * R[:, k, 1]
            + R[:, i, 2] * Idiag[:, 2] * R[:, k, 2]
        )
        # parallel-axis shift: + m (|c|^2 δik - c_i c_k)
        shift = mass * ((c2 if i == k else 0.0) - c[:, i] * c[:, k])
        return (v + shift)[:, None]

    cinert = jnp.concatenate(
        [
            iw(0, 0), iw(1, 1), iw(2, 2), iw(0, 1), iw(0, 2), iw(1, 2),
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
