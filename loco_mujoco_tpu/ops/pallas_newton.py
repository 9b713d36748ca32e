"""Pallas TPU kernel: the entire Newton constraint solve, fused.

The XLA formulation of `solver.solve`'s fast path re-streams the constraint
Jacobian J (nefc x nv per env, ~13 KB for the humanoid) from HBM ~6 times per
Newton iteration (jar matvec, gradient, Hessian assembly, line search), and
materializes every intermediate between ops — at 8 iterations x 40 forwards
per control step this is the dominant cost of the whole environment step
(measured 18.3 ms of the 32.6 ms per-forward total at 4096 envs on v5e).

This kernel keeps J, M and all solver state resident in VMEM for a block of
envs (env axis in lanes) and runs the full solve — warmstart selection,
`iterations` Newton steps each with Hessian assembly, an unrolled Cholesky,
triangular solves and the `ls_iterations`-step safeguarded-secant line
search — in one program. Only (J, M, aref, D, R, floss, active, qacc_smooth,
qacc_warmstart) enter and (qacc, force) leave. `solve_core` holds the body
and is shared with the fused assembly+solve kernel
(`pallas_constraint.py`), which additionally builds J in VMEM so the row
matrix never exists in HBM at all.

Matches `solver.solve`'s fast path exactly for models with NO elliptic
contact rows (every pyramidal/equality/limit/friction-loss robot: the
humanoids, Atlas, Talos, H1, G1). All arithmetic is plain f32 VPU FMAs —
unlike the XLA path there are no matmuls to lose mantissa on the MXU, so no
precision scoping is needed. Elliptic models (A1) and the f64 oracle-parity
path keep the XLA implementation (`solver.py` remains the reference).

Opt out with LMT_PALLAS=0 (same switch as the collision kernel).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .pallas_collision import pallas_enabled  # noqa: F401  (re-exported)

_BE = 128  # env block (one lane tile; BE=256 measured ~6% slower —
# the (nrows, BE) Hessian passes dominate and prefer the smaller tile)

# tests set this to run the kernel in interpret mode on CPU (parity vs the
# XLA fast path without TPU hardware)
_INTERPRET = False


def _row_masks(is_eq: np.ndarray, is_fl: np.ndarray):
    is_uni = ~(is_eq | is_fl)
    to = lambda m: m.astype(np.float32)[:, None]  # (nefc, 1) broadcast
    return to(is_eq), to(is_fl), to(is_uni)


def chol_solve_spd(M, rhs, nv, jitter=0.0):
    """Solve M x = rhs for SPD M in env-last layout: M (nv, nv, BE) (or
    M[a] -> (nv, BE) rows), rhs (nv, BE). Unrolled Cholesky + substitution,
    all (BE,) vector ops."""
    l = [[None] * nv for _ in range(nv)]
    for j in range(nv):
        d = M[j][j] if isinstance(M, list) else M[j, j, :]
        if jitter:
            d = d + jitter
        for k in range(j):
            d = d - l[j][k] * l[j][k]
        dj = jnp.sqrt(jnp.maximum(d, 1e-30))
        inv = 1.0 / dj
        l[j][j] = dj
        for i in range(j + 1, nv):
            s = M[i][j] if isinstance(M, list) else M[i, j, :]
            for k in range(j):
                s = s - l[i][k] * l[j][k]
            l[i][j] = s * inv
    y = [None] * nv
    for i in range(nv):
        s = rhs[i]
        for k in range(i):
            s = s - l[i][k] * y[k]
        y[i] = s / l[i][i]
    x = [None] * nv
    for i in range(nv - 1, -1, -1):
        s = y[i]
        for k in range(i + 1, nv):
            s = s - l[k][i] * x[k]
        x[i] = s / l[i][i]
    return jnp.stack(x)


def solve_core(J, M, aref, D, R, floss, act, meq, mfl, muni, asm, ws,
               nv, iterations, ls_iterations):
    """The Newton solve on VMEM-resident values, env axis in lanes.

    J: indexable as J[k] -> (nrows, BE) (a (nv, nrows, BE) array or a list
    of per-dof row tiles); M (nv, nv, BE); row quantities (nrows, BE);
    masks (nrows, 1) or full (nrows, BE); asm/ws (nv, BE). Returns
    (qacc (nv, BE), force (nrows, BE)). Shared by the plain solve kernel
    and the fused assembly+solve kernel."""
    rfl = R * floss

    def matvec_J(x):  # (nv, BE) -> (nrows, BE)
        acc = J[0] * x[0][None]
        for k in range(1, nv):
            acc = acc + J[k] * x[k][None]
        return acc

    def matvec_M(x):  # (nv, BE) -> (nv, BE)
        # row a: sum_k M[a,k] x[k] — M[a] is a contiguous (nv, BE) tile
        return jnp.stack([jnp.sum(M[a] * x, axis=0) for a in range(nv)])

    def force_of(jar):
        """Active-masked row force (mirrors solver._quantities)."""
        ndj = -D * jar
        f = meq * ndj
        f = f + mfl * jnp.clip(ndj, -floss, floss)
        f = f + muni * jnp.where(jar < 0, ndj, 0.0)
        return f * act

    def weight_of(jar):
        w = meq * D
        w = w + mfl * jnp.where(jnp.abs(jar) <= rfl, D, 0.0)
        w = w + muni * jnp.where(jar < 0, D, 0.0)
        return w * act

    def cost_of(jar):  # (1, BE)
        q = 0.5 * D * jar * jar
        c = meq * q
        c = c + mfl * jnp.where(
            jnp.abs(jar) <= rfl, q,
            floss * jnp.abs(jar) - 0.5 * rfl * floss,
        )
        c = c + muni * jnp.where(jar < 0, q, 0.0)
        return jnp.sum(c * act, axis=0, keepdims=True)

    def total_cost(x):
        jar = matvec_J(x) - aref
        dx = x - asm
        gauss = 0.5 * jnp.sum(dx * matvec_M(dx), axis=0, keepdims=True)
        return cost_of(jar) + gauss

    # warmstart: better of qacc_smooth / qacc_warmstart
    c_ws = total_cost(ws)
    c_sm = total_cost(asm)
    x = jnp.where(c_ws < c_sm, ws, asm)

    def newton_iter(_, x):
        jar = matvec_J(x) - aref
        f = force_of(jar)
        w = weight_of(jar)

        mdx0 = matvec_M(x - asm)  # (nv, BE)

        # grad = M(x - asm) - J' f
        grad = [mdx0[a] - jnp.sum(J[a] * f, axis=0) for a in range(nv)]

        # H = M + J' diag(w) J — upper triangle, env in lanes
        h = [[None] * nv for _ in range(nv)]
        for a in range(nv):
            wja = w * J[a]
            for b in range(a, nv):
                s = jnp.sum(wja * J[b], axis=0)
                s = s + M[a, b, :]
                if b == a:
                    s = s + 1e-12  # jitter, as in the XLA path
                h[a][b] = s
                if b != a:
                    h[b][a] = s

        # Cholesky H = L L' (unrolled, env-vector ops)
        l = [[None] * nv for _ in range(nv)]
        for j in range(nv):
            d = h[j][j]
            for k in range(j):
                d = d - l[j][k] * l[j][k]
            dj = jnp.sqrt(jnp.maximum(d, 1e-30))
            inv = 1.0 / dj
            l[j][j] = dj
            for i in range(j + 1, nv):
                s = h[i][j]
                for k in range(j):
                    s = s - l[i][k] * l[j][k]
                l[i][j] = s * inv

        # dx = -H^-1 grad  (forward + back substitution)
        y = [None] * nv
        for i in range(nv):
            s = -grad[i]
            for k in range(i):
                s = s - l[i][k] * y[k]
            y[i] = s / l[i][i]
        dxs = [None] * nv
        for i in range(nv - 1, -1, -1):
            s = y[i]
            for k in range(i + 1, nv):
                s = s - l[k][i] * dxs[k]
            dxs[i] = s / l[i][i]
        dx = jnp.stack(dxs)  # (nv, BE)

        jv = matvec_J(dx)
        g0 = jnp.sum(dx * mdx0, axis=0, keepdims=True)  # (1, BE)
        h0 = jnp.sum(dx * matvec_M(dx), axis=0, keepdims=True)
        d0 = g0 - jnp.sum(f * jv, axis=0, keepdims=True)

        def phi_prime(a):  # a (1, BE)
            fa = force_of(jar + a * jv)
            return g0 + a * h0 - jnp.sum(fa * jv, axis=0, keepdims=True)

        def falsi(lo, dlo, hi, dhi):
            denom = dhi - dlo
            a = jnp.where(
                denom > 1e-15,
                lo - dlo * (hi - lo) / jnp.where(denom > 1e-15, denom, 1.0),
                0.5 * (lo + hi),
            )
            return jnp.clip(a, lo, hi)

        one = jnp.ones_like(g0)
        zero = jnp.zeros_like(g0)
        lo, dlo = zero, d0
        hi, dhi = zero, one
        has_hi = zero > one  # all-False (1, BE) bool
        a = one
        for _k in range(ls_iterations):
            d = phi_prime(a)
            neg = d < 0
            lo = jnp.where(neg, a, lo)
            dlo = jnp.where(neg, d, dlo)
            hi = jnp.where(neg, hi, a)
            dhi = jnp.where(neg, dhi, d)
            has_hi = has_hi | ~neg
            a = jnp.where(has_hi, falsi(lo, dlo, hi, dhi), a * 2.0)
        alpha = jnp.where(has_hi, falsi(lo, dlo, hi, dhi), lo)
        return x + alpha * dx

    x = jax.lax.fori_loop(0, iterations, newton_iter, x)
    return x, force_of(matvec_J(x) - aref)


def _make_kernel(nefc, nv, iterations, ls_iterations):
    def kernel(J_ref, M_ref, aref_ref, D_ref, R_ref, fl_ref, act_ref,
               masks_ref, asm_ref, ws_ref, x_ref, force_ref):
        # J is laid out (nv, nefc, BE): J[k] is a contiguous (nefc, BE) tile,
        # so every matvec / Hessian access is a full-tile VPU op (indexing
        # the sublane dim of an (nefc, nv, BE) layout would shuffle instead)
        x, force = solve_core(
            J_ref[...], M_ref[...], aref_ref[...], D_ref[...], R_ref[...],
            fl_ref[...], act_ref[...],
            masks_ref[0], masks_ref[1], masks_ref[2],
            asm_ref[...], ws_ref[...],
            nv, iterations, ls_iterations,
        )
        x_ref[...] = x
        force_ref[...] = force

    return kernel


@functools.partial(
    jax.jit,
    static_argnames=("iterations", "ls_iterations", "eq_b", "fl_b"),
)
def _solve_batched(J, M, aref, D, R, floss, active, asm, ws,
                   iterations, ls_iterations, eq_b, fl_b):
    """Batched solve. J (E, nefc, nv), M (E, nv, nv), rows (E, nefc),
    vectors (E, nv) -> qacc (E, nv), force (E, nefc)."""
    E, nefc, nv = J.shape
    Ep = ((E + _BE - 1) // _BE) * _BE

    def to_env_last(x):
        x = jnp.moveaxis(x, 0, -1)
        if Ep != E:
            pad = [(0, 0)] * (x.ndim - 1) + [(0, Ep - E)]
            x = jnp.pad(x, pad)
        return x

    # J -> (nv, nefc, E): leading-index access inside the kernel
    Jt = jnp.transpose(J.astype(jnp.float32), (2, 1, 0))
    if Ep != E:
        Jt = jnp.pad(Jt, ((0, 0), (0, 0), (0, Ep - E)))
    Mt = to_env_last(M.astype(jnp.float32))
    rows = [to_env_last(v.astype(jnp.float32))
            for v in (aref, D, R, floss, active)]
    vecs = [to_env_last(v.astype(jnp.float32)) for v in (asm, ws)]
    masks = jnp.asarray(
        np.stack(
            _row_masks(
                np.frombuffer(eq_b, dtype=bool),
                np.frombuffer(fl_b, dtype=bool),
            )
        )
    )  # (3, nefc, 1)

    kernel = _make_kernel(nefc, nv, iterations, ls_iterations)
    grid = (Ep // _BE,)
    row_spec = pl.BlockSpec((nefc, _BE), lambda e: (0, e),
                            memory_space=pltpu.VMEM)
    vec_spec = pl.BlockSpec((nv, _BE), lambda e: (0, e),
                            memory_space=pltpu.VMEM)
    x, force = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((nv, nefc, _BE), lambda e: (0, 0, e),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((nv, nv, _BE), lambda e: (0, 0, e),
                         memory_space=pltpu.VMEM),
            row_spec, row_spec, row_spec, row_spec, row_spec,
            pl.BlockSpec((3, nefc, 1), lambda e: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            vec_spec, vec_spec,
        ],
        out_specs=[vec_spec, row_spec],
        out_shape=[
            jax.ShapeDtypeStruct((nv, Ep), jnp.float32),
            jax.ShapeDtypeStruct((nefc, Ep), jnp.float32),
        ],
        interpret=_INTERPRET,
    )(Jt, Mt, *rows, masks, *vecs)
    return jnp.moveaxis(x[:, :E], -1, 0), jnp.moveaxis(force[:, :E], -1, 0)


_SOLVER_CACHE: dict = {}


def get_solver(efc, iterations: int, ls_iterations: int):
    """Factory: a custom-vmap solve fn bound to this model's static row
    classification. Call unbatched inside the per-env trace; under vmap the
    whole batch dispatches to one fused kernel."""
    eq_b = np.asarray(efc.is_bilateral, dtype=bool).tobytes()
    fl_b = np.asarray(efc.is_fl, dtype=bool).tobytes()
    nefc = len(efc.is_fl)
    key = (nefc, iterations, ls_iterations, eq_b, fl_b)
    hit = _SOLVER_CACHE.get(key)
    if hit is not None:
        return hit

    def solve_b(J, M, aref, D, R, floss, active, asm, ws):
        return _solve_batched(
            J, M, aref, D, R, floss, active, asm, ws,
            iterations=iterations, ls_iterations=ls_iterations,
            eq_b=eq_b, fl_b=fl_b,
        )

    @jax.custom_batching.custom_vmap
    def solve(J, M, aref, D, R, floss, active, asm, ws):
        x, f = solve_b(J[None], M[None], aref[None], D[None], R[None],
                       floss[None], active[None], asm[None], ws[None])
        return x[0], f[0]

    @solve.def_vmap
    def _solve_vmap(axis_size, in_batched, *args):
        # unbatched operands (e.g. model-constant floss) arrive without the
        # batch axis — broadcast them so the kernel sees one uniform batch
        args = [
            a if b else jnp.broadcast_to(a, (axis_size,) + a.shape)
            for a, b in zip(args, in_batched)
        ]
        return solve_b(*args), (True, True)

    _SOLVER_CACHE[key] = solve
    return solve
