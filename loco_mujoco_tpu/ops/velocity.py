"""Velocity stage: com-frame body velocities and bias (Coriolis + gravity)
forces via the recursive Newton-Euler algorithm.

Produces the same quantities as MuJoCo's mj_comVel / mj_rne(flg_acc=0)
(reference delegates these to the C library; see SURVEY.md L0).

TPU form: the tree recursions are expressed as *masked matmuls* against
static ancestor/subtree incidence matrices instead of lax.scan chains. A
chain accumulation like cvel[b] = cvel[parent[b]] + cdof_d qvel_d unrolls
exactly to cvel[b] = sum over dofs on b's root chain — one (nbody, nv) mask
einsum — and the scan's ~nbody sequential scatter kernels collapse into one
fused op (the scans dominated the step's kernel count on TPU).
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from ..core.types import Data, Model
from . import math as m3
from .support import body_subtree_mask, dof_body_mask


def com_vel(model: Model, data: Data) -> Data:
    """Body com-frame velocities cvel and dof Jacobian rates cdof_dot."""
    dtype = data.qpos.dtype
    nb, nv = model.nbody, model.nv
    if nv == 0:
        return data.replace(
            cvel=jnp.zeros((nb, 6), dtype=dtype),
            cdof_dot=jnp.zeros((0, 6), dtype=dtype),
        )

    vd = data.cdof * data.qvel[:, None]  # (nv, 6) per-dof velocity
    mask_bd = jnp.asarray(dof_body_mask(model), dtype=dtype)  # (nbody, nv)
    cvel = jnp.einsum("bd,dc->bc", mask_bd, vd)

    # cdof_dot[d] = v_before(d) x cdof[d], where v_before is the velocity
    # accumulated from all *strict* ancestor dofs (parent bodies + preceding
    # dofs of the same body — exactly the strict ancestors in MuJoCo's dof
    # tree, matching mj_comVel's in-loop ordering for hinge/slide joints)
    anc = np.asarray(model.dof_ancestor_mask) & ~np.eye(nv, dtype=bool)
    v_before = jnp.einsum(
        "de,ec->dc", jnp.asarray(anc, dtype=dtype), vd
    )  # (nv, 6)
    cdof_dot = m3.motion_cross(v_before, data.cdof)
    return data.replace(cvel=cvel, cdof_dot=cdof_dot)


def rne(model: Model, data: Data) -> Data:
    """Bias force qfrc_bias = C(qpos, qvel): RNE with zero acceleration."""
    dtype = data.qpos.dtype
    nb = model.nbody

    # forward pass: com-frame accelerations (gravity as base acceleration)
    gravity = jnp.concatenate(
        [jnp.zeros(3, dtype=dtype), -model.opt.gravity.astype(dtype)]
    )
    mask_bd = jnp.asarray(dof_body_mask(model), dtype=dtype)  # (nbody, nv)
    ad = data.cdof_dot * data.qvel[:, None]  # (nv, 6)
    cacc = gravity[None, :] + jnp.einsum("bd,dc->bc", mask_bd, ad)

    # body forces: f = I*a + v x* (I*v)
    iv = m3.inert_mul(data.cinert, data.cvel)
    cfrc = m3.inert_mul(data.cinert, cacc) + m3.force_cross(data.cvel, iv)

    # backward pass: total force on each body = sum over its subtree
    sub = jnp.asarray(body_subtree_mask(model), dtype=dtype)
    cfrc_tot = jnp.einsum("ab,bc->ac", sub, cfrc)

    qfrc_bias = jnp.einsum(
        "vi,vi->v", data.cdof, cfrc_tot[model.dof_bodyid]
    )
    return data.replace(qfrc_bias=qfrc_bias)
