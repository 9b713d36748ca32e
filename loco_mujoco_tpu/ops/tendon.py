"""Spatial tendons: length, moment-arm Jacobian and velocity.

The muscle humanoid's 92 muscles route through site-path spatial tendons
(reference `data/humanoid/humanoid_muscle.xml`; no wrapping geoms, sites
only — validated at model build time in core/io.py). Length is the sum of
segment lengths; the Jacobian row is assembled from per-site translation
Jacobians, matching MuJoCo's mj_tendon.

All segments across all tendons are processed as one flat batch of
(point-Jacobian, direction) products — a few dense (nseg, 3, nv) einsums
that vectorize cleanly over envs.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from ..core.types import Data, Model


def _site_jac_translation(model: Model, data: Data, site_ids: np.ndarray):
    """Translation Jacobians (len(site_ids), 3, nv) for the given sites.

    Same math as mj_jacSite's translational part: column d is
    cdof_ang x (p - subtree_com[rootid]) + cdof_lin for dofs on the chain
    from the site's body to the root, zero elsewhere.
    """
    nv = model.nv
    bodyids = model.site_bodyid[site_ids]
    p = data.site_xpos[site_ids]  # (ns, 3)

    # chain mask (ns, nv): dof d affects body b iff d is an ancestor dof of
    # the body's last dof; build statically from body_dofadr/dof ancestry.
    ns = len(site_ids)
    mask = np.zeros((ns, nv), dtype=bool)
    for i, b in enumerate(bodyids):
        b = int(b)
        # the body's dof chain: take any dof of the deepest joint-bearing
        # ancestor of b and include all its ancestors
        while b > 0 and model.body_dofnum[b] == 0:
            b = int(model.body_parentid[b])
        if b == 0:
            continue
        d = int(model.body_dofadr[b]) + int(model.body_dofnum[b]) - 1
        mask[i] = model.dof_ancestor_mask[d]

    offset = p[:, None, :] - data.subtree_com[model.body_rootid[bodyids]][:, None, :]
    # (ns, nv, 3): angular part of cdof crossed with site offset + linear part
    ang = jnp.broadcast_to(data.cdof[None, :, :3], (ns, nv, 3))
    lin = jnp.broadcast_to(data.cdof[None, :, 3:], (ns, nv, 3))
    jacp = jnp.cross(ang, offset) + lin
    jacp = jnp.where(jnp.asarray(mask)[:, :, None], jacp, 0.0)
    return jacp  # (ns, nv, 3)


def tendon(model: Model, data: Data) -> Data:
    """Tendon lengths and Jacobians (ten_length, ten_J)."""
    if model.ntendon == 0:
        return data

    dtype = data.qpos.dtype
    nv = model.nv

    # all sites referenced by any tendon path, deduplicated
    site_ids = np.unique(model.tendon_site[model.tendon_sitemask])
    site_slot = {int(s): i for i, s in enumerate(site_ids)}
    jacp = _site_jac_translation(model, data, site_ids)  # (ns, nv, 3)
    pos = data.site_xpos[site_ids]  # (ns, 3)

    # flat segment list: (tendon_id, slot0, slot1) for consecutive site pairs
    segs_t, segs_a, segs_b = [], [], []
    for t in range(model.ntendon):
        path = model.tendon_site[t][model.tendon_sitemask[t]]
        for k in range(len(path) - 1):
            segs_t.append(t)
            segs_a.append(site_slot[int(path[k])])
            segs_b.append(site_slot[int(path[k + 1])])
    segs_t = np.asarray(segs_t)
    segs_a = np.asarray(segs_a)
    segs_b = np.asarray(segs_b)

    d = pos[segs_b] - pos[segs_a]  # (nseg, 3)
    norm = jnp.linalg.norm(d, axis=-1, keepdims=True)
    vec = d / jnp.maximum(norm, 1e-12)

    seg_len = norm[:, 0]  # (nseg,)
    # segment Jacobian row: vec . (J_b - J_a)
    seg_jac = jnp.einsum(
        "si,svi->sv", vec, jacp[segs_b] - jacp[segs_a]
    )  # (nseg, nv)

    ten_length = (
        jnp.zeros(model.ntendon, dtype=dtype).at[segs_t].add(seg_len)
    )
    ten_j = (
        jnp.zeros((model.ntendon, nv), dtype=dtype).at[segs_t].add(seg_jac)
    )
    return data.replace(ten_length=ten_length, ten_J=ten_j)


def tendon_vel(model: Model, data: Data) -> Data:
    if model.ntendon == 0:
        return data
    return data.replace(ten_velocity=data.ten_J @ data.qvel)
