"""Spatial tendons: length, moment-arm Jacobian and velocity.

The muscle humanoid's 92 muscles route through site-path spatial tendons
(reference `data/humanoid/humanoid_muscle.xml`; no wrapping geoms, sites
only — validated at model build time in core/io.py). Length is the sum of
segment lengths; the Jacobian row is assembled from per-site translation
Jacobians, matching MuJoCo's mj_tendon.

TPU form: the per-site point Jacobian is never materialized. For a segment
with unit direction u between sites A and B,

    u . (J_B - J_A)[v] = mask_B[v] (cdof_ang[v] . (off_B x u)
                                    + cdof_lin[v] . u)  -  (same for A)

(scalar triple-product rotation), so the whole stage is two (nseg, 3) x
(3, nv) matmuls plus masked elementwise work — the naive (nsites, nv, 3)
cross-product tensors cost ~150 ms/step at 4096 envs on the muscle
humanoid.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from ..core.types import Data, Model

_TENDON_STATIC_CACHE: dict = {}


def _tendon_statics(model: Model):
    """(site_ids, segs_t, segs_a, segs_b, maskA, maskB) — static tables."""
    key = (
        model.tendon_site.tobytes(), model.tendon_sitemask.tobytes(),
        model.site_bodyid.tobytes(), model.body_parentid.tobytes(), model.nv,
    )
    hit = _TENDON_STATIC_CACHE.get(key)
    if hit is not None:
        return hit

    nv = model.nv
    site_ids = np.unique(model.tendon_site[model.tendon_sitemask])
    site_slot = {int(s): i for i, s in enumerate(site_ids)}

    # per-site dof chain mask
    ns = len(site_ids)
    mask = np.zeros((ns, nv), dtype=bool)
    bodyids = model.site_bodyid[site_ids]
    for i, b in enumerate(bodyids):
        b = int(b)
        while b > 0 and model.body_dofnum[b] == 0:
            b = int(model.body_parentid[b])
        if b == 0:
            continue
        d = int(model.body_dofadr[b]) + int(model.body_dofnum[b]) - 1
        mask[i] = model.dof_ancestor_mask[d]

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
    # selection matrices: dynamic gathers/scatters by static indices lower
    # to scalar-unit loops on TPU (the segs_t scatter-add alone cost ~90
    # ms/step); as 0/1 matmuls they ride the MXU
    nseg = len(segs_t)
    ns = len(site_ids)
    GA = np.zeros((nseg, ns))
    GB = np.zeros((nseg, ns))
    GA[np.arange(nseg), segs_a] = 1.0
    GB[np.arange(nseg), segs_b] = 1.0
    S = np.zeros((model.ntendon, nseg))
    S[segs_t, np.arange(nseg)] = 1.0
    out = (
        site_ids, GA, GB, S,
        mask[segs_a].astype(np.float64), mask[segs_b].astype(np.float64),
    )
    _TENDON_STATIC_CACHE[key] = out
    return out


def tendon(model: Model, data: Data) -> Data:
    """Tendon lengths and Jacobians (ten_length, ten_J)."""
    if model.ntendon == 0:
        return data

    dtype = data.qpos.dtype
    site_ids, GA, GB, S, maskA, maskB = _tendon_statics(model)
    GA = jnp.asarray(GA, dtype)
    GB = jnp.asarray(GB, dtype)
    S = jnp.asarray(S, dtype)

    pos = data.site_xpos[site_ids]  # (ns, 3) — static-index gather
    root_com = data.subtree_com[model.body_rootid[model.site_bodyid[site_ids]]]
    off = pos - root_com  # (ns, 3) site offset from the com reference

    posA = GA @ pos  # (nseg, 3)
    posB = GB @ pos
    d = posB - posA
    norm = jnp.linalg.norm(d, axis=-1, keepdims=True)
    vec = d / jnp.maximum(norm, 1e-12)
    seg_len = norm[:, 0]  # (nseg,)

    # u . (J_B - J_A) without the (ns, nv, 3) point-Jacobian tensor:
    # cdof_ang . (off x u) + cdof_lin . u per endpoint, chain-masked
    ang = data.cdof[:, :3]  # (nv, 3)
    lin = data.cdof[:, 3:]
    cA = jnp.cross(GA @ off, vec)  # (nseg, 3)
    cB = jnp.cross(GB @ off, vec)
    lin_term = vec @ lin.T  # (nseg, nv)
    mA = jnp.asarray(maskA, dtype)
    mB = jnp.asarray(maskB, dtype)
    seg_jac = mB * (cB @ ang.T + lin_term) - mA * (cA @ ang.T + lin_term)

    ten_length = S @ seg_len
    ten_j = S @ seg_jac
    return data.replace(ten_length=ten_length, ten_J=ten_j)


def tendon_vel(model: Model, data: Data) -> Data:
    if model.ntendon == 0:
        return data
    return data.replace(ten_velocity=data.ten_J @ data.qvel)
