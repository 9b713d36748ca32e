"""Inertia stage: composite-rigid-body mass matrix and its factorization.

Equivalent quantities to MuJoCo's mj_crb / mj_factorM, computed densely:
nv <= 37 for every robot except MyoSkeleton (157), so a dense (nv, nv)
matrix is small; under vmap the per-env matmuls batch onto the MXU, and the
batched Cholesky is XLA's native blocked kernel. The tree-sparsity of the
mass matrix is applied with a static ancestor mask instead of a traversal,
keeping the computation one masked matmul.
"""

from __future__ import annotations

import jax.numpy as jnp

from ..core.types import Data, Model
from . import linalg
from . import math as m3


def crb(model: Model, data: Data) -> Data:
    """Composite rigid body: dense joint-space mass matrix qM (+ armature)."""
    # accumulate cinert up the tree: one masked matmul against the static
    # subtree incidence matrix (the unrolled backward pass costs ~nbody
    # separate add kernels per call on TPU)
    from .support import body_subtree_mask

    sub = jnp.asarray(body_subtree_mask(model), dtype=data.cinert.dtype)
    crb_arr = jnp.einsum("ab,bt->at", sub, data.cinert)  # (nbody, 10)

    # buf_i = CRB(body of dof i) * cdof_i ;  M[i, j] = cdof_j . buf_i
    buf = m3.inert_mul(crb_arr[model.dof_bodyid], data.cdof)  # (nv, 6)
    m_full = buf @ data.cdof.T  # (nv, nv)

    mask = jnp.asarray(model.dof_ancestor_mask)
    lower = jnp.where(mask, m_full, 0.0)  # rows i, cols j<=i on the tree path
    qm = lower + lower.T - jnp.diag(jnp.diag(lower))
    qm = qm + jnp.diag(model.dof_armature)
    return data.replace(qM=qm)


def factor_m(model: Model, data: Data) -> Data:
    """Cholesky factorization of qM (dense; MuJoCo's qLD plays this role).
    Unrolled factorization — see ops/linalg.py for why not jnp.linalg."""
    return data.replace(qLD=linalg.cholesky(data.qM))


def solve_m(model: Model, data: Data, x: jnp.ndarray) -> jnp.ndarray:
    """Solve qM y = x using the cached Cholesky factor. x: (..., nv)."""
    return linalg.cho_solve(data.qLD, x)


def mul_m(model: Model, data: Data, x: jnp.ndarray) -> jnp.ndarray:
    """qM @ x. x: (..., nv)."""
    return (data.qM @ x[..., None])[..., 0]
