"""Small-matrix linear algebra, unrolled for TPU.

XLA lowers `jnp.linalg.cholesky` / `solve_triangular` on TPU to generic
loop-based kernels that serialize into dozens of kernel launches — ruinous
when a Newton solver factorizes an (nv, nv) matrix every iteration with
nv <= 37. These unrolled versions trace n static steps of fused vector ops
(row updates), which XLA compiles into a handful of kernels and batches
cleanly under vmap.

All functions take/return dense matrices with arbitrary leading batch dims.
"""

from __future__ import annotations

import jax.numpy as jnp


def cholesky(a: jnp.ndarray, jitter: float = 0.0) -> jnp.ndarray:
    """Lower-triangular Cholesky of an SPD matrix, unrolled over columns."""
    n = a.shape[-1]
    l = jnp.zeros_like(a)
    for j in range(n):
        d = a[..., j, j] - jnp.sum(jnp.square(l[..., j, :j]), axis=-1)
        dj = jnp.sqrt(jnp.maximum(d, 1e-30) + jitter)
        l = l.at[..., j, j].set(dj)
        if j + 1 < n:
            col = a[..., j + 1 :, j] - jnp.einsum(
                "...ik,...k->...i", l[..., j + 1 :, :j], l[..., j, :j]
            )
            l = l.at[..., j + 1 :, j].set(col / dj[..., None])
    return l


def solve_lower(l: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Solve L y = b (L lower triangular), unrolled forward substitution."""
    n = l.shape[-1]
    x = b
    for i in range(n):
        xi = x[..., i] - jnp.sum(l[..., i, :i] * x[..., :i], axis=-1)
        x = x.at[..., i].set(xi / l[..., i, i])
    return x


def solve_upper_t(l: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Solve L^T x = b, unrolled backward substitution."""
    n = l.shape[-1]
    x = b
    for i in range(n - 1, -1, -1):
        xi = x[..., i] - jnp.sum(l[..., i + 1 :, i] * x[..., i + 1 :], axis=-1)
        x = x.at[..., i].set(xi / l[..., i, i])
    return x


def cho_solve(l: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Solve (L L^T) x = b given the Cholesky factor."""
    return solve_upper_t(l, solve_lower(l, b))


def spd_solve(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Solve SPD system a x = b via unrolled Cholesky."""
    return cho_solve(cholesky(a), b)
