"""Support operations: body-point Jacobians and related helpers.

Equivalent of mj_jac / mj_jacBody for the hinge/slide-only robot suite. The
dof-chain sparsity is applied as a static mask derived from the ancestor
table, so a Jacobian is one batched cross product + mask — no traversal in
traced code.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from ..core.types import Data, Model

_CHAIN_CACHE: dict = {}


def _tree_key(model: Model):
    """Content-based cache key for the kinematic tree (id() is unsafe: numpy
    arrays from collected models can reuse addresses)."""
    return (
        model.body_parentid.tobytes(),
        model.body_dofadr.tobytes(),
        model.body_dofnum.tobytes(),
        model.nv,
    )


def body_chain_mask(model: Model, bodyid: int) -> np.ndarray:
    """(nv,) bool: dofs on the kinematic chain from `bodyid` to the root."""
    key = (_tree_key(model), int(bodyid))
    hit = _CHAIN_CACHE.get(key)
    if hit is not None:
        return hit
    mask = np.zeros(model.nv, dtype=bool)
    b = int(bodyid)
    while b > 0 and model.body_dofnum[b] == 0:
        b = int(model.body_parentid[b])
    if b > 0:
        d = int(model.body_dofadr[b]) + int(model.body_dofnum[b]) - 1
        mask = model.dof_ancestor_mask[d].copy()
    _CHAIN_CACHE[key] = mask
    return mask


def jac(model: Model, data: Data, point: jnp.ndarray, bodyid: int):
    """Translational and rotational Jacobians (3, nv) of a world-frame point
    attached to `bodyid` (static id). Matches mj_jac conventions."""
    mask = jnp.asarray(body_chain_mask(model, bodyid), dtype=data.qpos.dtype)
    offset = point - data.subtree_com[int(model.body_rootid[bodyid])]
    ang = data.cdof[:, :3]  # (nv, 3)
    lin = data.cdof[:, 3:]
    jacp = (jnp.cross(ang, offset[None, :]) + lin) * mask[:, None]
    jacr = ang * mask[:, None]
    return jacp.T, jacr.T  # (3, nv)


def jac_dif_pair(model: Model, data: Data, point: jnp.ndarray, b1: int, b2: int):
    """J(point@b2) - J(point@b1), both parts. Used by equality constraints."""
    jacp1, jacr1 = jac(model, data, point, b1)
    jacp2, jacr2 = jac(model, data, point, b2)
    return jacp2 - jacp1, jacr2 - jacr1


_BODY_MASK_CACHE: dict = {}
_SUBTREE_MASK_CACHE: dict = {}


def body_subtree_mask(model: Model) -> np.ndarray:
    """(nbody, nbody) bool: [a, b] = body b is in the subtree rooted at a
    (including a itself). Turns bottom-up tree accumulations (subtree com,
    RNE force back-propagation, CRB inertia stacking) into single masked
    matmuls instead of per-body scan scatter chains."""
    key = _tree_key(model)
    hit = _SUBTREE_MASK_CACHE.get(key)
    if hit is not None:
        return hit
    nb = model.nbody
    mask = np.zeros((nb, nb), dtype=bool)
    parent = np.asarray(model.body_parentid)
    for b in range(nb):
        a = b
        while True:
            mask[a, b] = True
            if a == 0:
                break
            a = int(parent[a])
    _SUBTREE_MASK_CACHE[key] = mask
    return mask


def dof_body_mask(model: Model) -> np.ndarray:
    """(nbody, nv) bool: dof d moves body b."""
    key = _tree_key(model)
    hit = _BODY_MASK_CACHE.get(key)
    if hit is not None:
        return hit
    mask = np.zeros((model.nbody, model.nv), dtype=bool)
    for b in range(1, model.nbody):
        mask[b] = body_chain_mask(model, b)
    _BODY_MASK_CACHE[key] = mask
    return mask


def contact_force_groups(
    model: Model,
    data: Data,
    gids1: np.ndarray,
    gids2: np.ndarray,
    elliptic: bool,
):
    """Summed contact-frame force (3,) over contacts between two geom sets —
    the mj_contactForce-based collision-group readout the reference uses for
    ground-reaction forces (reference base.py:667-679; group force sliced
    [:3]). Pyramidal facet forces are decoded to contact-frame forces the
    same way mj_contactForce does."""
    con = data.contact
    ncon = con.dist.shape[0]
    if ncon == 0:
        return jnp.zeros(3, dtype=data.qpos.dtype)
    in1 = jnp.isin(con.geom1, jnp.asarray(gids1))
    in2 = jnp.isin(con.geom2, jnp.asarray(gids2))
    in1r = jnp.isin(con.geom1, jnp.asarray(gids2))
    in2r = jnp.isin(con.geom2, jnp.asarray(gids1))
    match = ((in1 & in2) | (in1r & in2r)) & (con.dist < con.includemargin)

    f = data.efc_force_contact  # (ncon, maxrows)
    if elliptic:
        f3 = f[:, :3]
    else:
        # pyramidal decode: normal = sum of facets; tangent_i = mu_i *
        # (f[2i] - f[2i+1])
        dims = np.asarray(con.dim)
        maxpairs = 2
        normal = jnp.sum(f, axis=1)
        t1 = con.friction[:, 0] * (f[:, 0] - f[:, 1])
        t2 = con.friction[:, 1] * (f[:, 2] - f[:, 3])
        f3 = jnp.stack([normal, t1, t2], axis=1)
    return jnp.sum(jnp.where(match[:, None], f3, 0.0), axis=0)


def jac_dyn(model: Model, data: Data, point: jnp.ndarray, bodyid: jnp.ndarray):
    """Like `jac` but with a traced body id (used for contacts, whose geoms
    are selected at runtime by the top-K midphase). point: (..., 3),
    bodyid: (...,) int. Returns jacp, jacr of shape (..., 3, nv)."""
    dtype = data.qpos.dtype
    mask = jnp.asarray(dof_body_mask(model), dtype=dtype)[bodyid]  # (..., nv)
    roots = np.asarray(model.body_rootid)
    if roots[1:].size and np.all(roots[1:] == roots[1]):
        # single kinematic tree (every robot in the suite): the subtree-com
        # reference is a compile-time index — no per-contact gather. The
        # world body's rows are masked to zero anyway, so its offset value
        # is irrelevant.
        com = data.subtree_com[int(roots[1])]
    else:
        com = data.subtree_com[jnp.asarray(roots)[bodyid]]
    offset = point - com  # (..., 3)
    ang = data.cdof[:, :3]  # (nv, 3)
    lin = data.cdof[:, 3:]
    # build (..., 3, nv) directly (a trailing swapaxes lowers to a layout
    # copy of the full (..., nv, 3) tensor on TPU)
    ox, oy, oz = offset[..., 0:1], offset[..., 1:2], offset[..., 2:3]
    ax, ay, az = ang[:, 0], ang[:, 1], ang[:, 2]
    cx = ay * oz - az * oy  # (..., nv)
    cy = az * ox - ax * oz
    cz = ax * oy - ay * ox
    jacp = jnp.stack(
        [cx + lin[:, 0], cy + lin[:, 1], cz + lin[:, 2]], axis=-2
    ) * mask[..., None, :]  # (..., 3, nv)
    jacr = jnp.stack([ax, ay, az], axis=-2) * jnp.ones_like(
        offset[..., :1, None]
    ) * mask[..., None, :]
    return jacp, jacr
