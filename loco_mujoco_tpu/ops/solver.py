"""Newton constraint solver (primal, dense, fixed-shape).

Solves the same convex program as MuJoCo's Newton solver (solver=2 in every
robot XML of the suite):

    min_x 0.5 (x - a_smooth)' M (x - a_smooth) + sum_i s_i(J_i x - aref_i)

with per-row cost s_i:
  * equality rows       — quadratic everywhere
  * friction-loss rows  — Huber: quadratic inside |jar| <= R*floss, linear
                          tails (force saturates at ±floss)
  * limits / pyramidal  — one-sided quadratic (active when jar < 0)
  * elliptic contacts   — zone cost: separating (0), sticking (quadratic in
                          all dims), sliding (0.5*Dn*(N - mu*T)^2/(1+mu^2)
                          in cone-scaled coordinates)

TPU mapping: the per-iteration Hessian H = M + J' diag(w) J is one (nv,nefc)
x (nefc,nv) matmul (MXU), factorized with a dense Cholesky; the exact line
search is a scalar Newton iteration over precomputed per-row quadratics.
Everything is fixed-shape; early exit via lax.while_loop on the same
scaled-improvement test MuJoCo uses (tolerance * stat.meaninertia * nv).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
from ..core.types import Data, Model
from . import linalg
from .constraint import Efc

MINVAL = 1e-15


class _Quantities(NamedTuple):
    force: jax.Array  # (nefc,) constraint force
    hweight: jax.Array  # (nefc,) quadratic weights for the Hessian rows
    cost: jax.Array  # () total constraint cost


def _ell_tables(efc: Efc, dtype):
    """Static gather tables for elliptic contacts: (ncon_ell, maxdim) row
    indices + mask (row 0 = normal)."""
    ncon = len(efc.ell_start)
    if ncon == 0:
        return None
    maxdim = int(max(efc.ell_dim))
    import numpy as np

    idx = np.zeros((ncon, maxdim), dtype=np.int32)
    msk = np.zeros((ncon, maxdim), dtype=bool)
    for c in range(ncon):
        d = int(efc.ell_dim[c])
        idx[c, :d] = efc.ell_start[c] + np.arange(d)
        msk[c, :d] = True
    return jnp.asarray(idx), jnp.asarray(msk)


def _quantities(model: Model, efc: Efc, jar: jax.Array, dtype) -> _Quantities:
    """Per-row force, Hessian weight and total cost at the given jar."""
    D, R, fl = efc.D, efc.R, efc.floss
    active = efc.active

    is_eq = jnp.asarray(efc.is_bilateral)
    is_fl = jnp.asarray(efc.is_fl)
    is_ell = jnp.asarray(efc.type == 7)
    is_uni = ~(is_eq | is_fl | is_ell)

    # quadratic (equality) rows
    f_eq = -D * jar
    c_eq = 0.5 * D * jar * jar

    # friction loss (Huber)
    rf = R * fl
    f_fl = jnp.clip(-D * jar, -fl, fl)
    in_quad = jnp.abs(jar) <= rf
    c_fl = jnp.where(
        in_quad,
        0.5 * D * jar * jar,
        fl * jnp.abs(jar) - 0.5 * rf * fl,
    )
    w_fl = jnp.where(in_quad, D, 0.0)

    # one-sided quadratic rows
    uni_active = jar < 0
    f_uni = jnp.where(uni_active, -D * jar, 0.0)
    c_uni = jnp.where(uni_active, 0.5 * D * jar * jar, 0.0)
    w_uni = jnp.where(uni_active, D, 0.0)

    force = jnp.where(is_eq, f_eq, 0.0)
    force = jnp.where(is_fl, f_fl, force)
    force = jnp.where(is_uni, f_uni, force)
    hw = jnp.where(is_eq, D, 0.0)
    hw = jnp.where(is_fl, w_fl, hw)
    hw = jnp.where(is_uni, w_uni, hw)
    cost = jnp.where(is_eq, c_eq, 0.0)
    cost = jnp.where(is_fl, c_fl, cost)
    cost = jnp.where(is_uni, c_uni, cost)

    # elliptic contacts: per-contact cone zones
    tables = _ell_tables(efc, dtype)
    if tables is not None:
        idx, msk = tables
        mu = efc.con_mu  # (ncon,) = friction0 / sqrt(impratio)
        jar_c = jar[idx]  # (ncon, maxdim)
        d_c = D[idx]
        dn = d_c[:, 0]
        # cone-scaled coordinates: u_i = jar_i * sqrt(D_i / Dn) makes the
        # friction block isotropic with circular cone coefficient mu
        scale = jnp.sqrt(d_c / jnp.maximum(dn[:, None], MINVAL))
        u = jar_c * scale * msk
        n = u[:, 0]
        t = jnp.sqrt(jnp.sum(u[:, 1:] ** 2, axis=1))
        t_safe = jnp.maximum(t, MINVAL)

        top = n >= mu * t  # separating: no force
        bottom = mu * n + t <= 0  # sticking: full quadratic
        mid = ~(top | bottom)

        con_on = active[idx[:, 0]]
        top = top | ~con_on
        mid = mid & con_on
        bottom = bottom & con_on

        # bottom: quadratic in every dim
        f_bot = -d_c * jar_c * msk
        c_bot = 0.5 * jnp.sum(d_c * jar_c * jar_c * msk, axis=1)
        w_bot = d_c * msk

        # middle: cost = 0.5 * Dn * (n - mu t)^2 / (1 + mu^2)
        nmt = n - mu * t
        dm = dn / (1.0 + mu * mu)
        c_mid = 0.5 * dm * nmt * nmt
        # gradient wrt jar: f = -dm*nmt * d(n - mu t)/djar
        # d n/djar_0 = scale_0 (=1); d t/djar_i = u_i/t * scale_i
        gvec = jnp.concatenate(
            [
                jnp.ones_like(n)[:, None],
                -mu[:, None] * u[:, 1:] / t_safe[:, None],
            ],
            axis=1,
        ) * scale
        f_mid = (-dm * nmt)[:, None] * gvec * msk
        # Gauss-Newton weight for the cone row handled via rank-1 term below;
        # as a dense-row approximation use dm on a combined row. We fold the
        # rank-1 structure exactly by assigning weight dm to the normal row
        # and dm*mu^2*(u_i/t)^2-ish to friction rows; instead we return the
        # exact rank-1 vector for the Hessian assembly.
        force_ell = jnp.where(
            mid[:, None], f_mid, jnp.where(bottom[:, None], f_bot, 0.0)
        )
        cost_ell = jnp.where(mid, c_mid, jnp.where(bottom, c_bot, 0.0))
        w_ell = jnp.where(bottom[:, None], w_bot, 0.0)

        # scatter back into row space
        flat_idx = idx.reshape(-1)
        force = force.at[flat_idx].add(force_ell.reshape(-1))
        hw = hw.at[flat_idx].add(w_ell.reshape(-1))
        cost_rows = jnp.sum(cost_ell)
    else:
        cost_rows = jnp.zeros((), dtype=dtype)

    # rows gated by the runtime active flag (limits below margin etc.)
    force = jnp.where(active, force, 0.0)
    hw = jnp.where(active, hw, 0.0)
    cost = jnp.where(active, cost, 0.0)
    total_cost = jnp.sum(cost) + cost_rows
    return _Quantities(force=force, hweight=hw, cost=total_cost), tables


def _cone_hessian_terms(model, efc, jar, tables, dtype):
    """Exact middle-zone Hessian pieces for elliptic contacts.

    Middle-zone cost 0.5*dm*(N - mu*T)^2 in cone-scaled coordinates has
    Hessian  dm * g g'  +  dm*mu*(mu*T - N)/T * (P - w w')  where g is the
    gradient direction, P the scaled tangential metric and w = u_t/T. The
    second (curvature) term dominates at high impratio and is required for
    Newton to converge in a few steps.

    Returns (idx, gvec, w_gn, jt_scale, wdir, c2):
      gvec (ncon, maxdim) — rank-1 direction rows (scaled), weight w_gn
      jt_scale (ncon, maxdim) — per-row scale for tangential rows (0 for
        the normal row), wdir (ncon, maxdim) — u_t/T components,
      c2 (ncon,) — curvature coefficient (middle zone only)
    """
    idx, msk = tables
    D = efc.D
    mu = efc.con_mu
    jar_c = jar[idx]
    d_c = D[idx]
    dn = d_c[:, 0]
    scale = jnp.sqrt(d_c / jnp.maximum(dn[:, None], MINVAL))
    u = jar_c * scale * msk
    n = u[:, 0]
    t = jnp.sqrt(jnp.sum(u[:, 1:] ** 2, axis=1))
    t_safe = jnp.maximum(t, MINVAL)
    top = n >= mu * t
    bottom = mu * n + t <= 0
    mid = ~(top | bottom) & efc.active[idx[:, 0]]
    gvec = jnp.concatenate(
        [jnp.ones_like(n)[:, None], -mu[:, None] * u[:, 1:] / t_safe[:, None]],
        axis=1,
    ) * scale * msk
    dm = dn / (1.0 + mu * mu)
    w_gn = jnp.where(mid, dm, 0.0)

    jt_scale = scale.at[:, 0].set(0.0) * msk
    wdir = jnp.concatenate(
        [jnp.zeros_like(n)[:, None], u[:, 1:] / t_safe[:, None]], axis=1
    ) * msk
    c2 = jnp.where(mid, dm * mu * (mu * t - n) / t_safe, 0.0)
    return idx, gvec, w_gn, jt_scale, wdir, c2


def solve(model: Model, data: Data, efc: Efc | None) -> Data:
    dtype = data.qpos.dtype
    if efc is None or efc.J.shape[0] == 0:
        return data.replace(
            qacc=data.qacc_smooth,
            qfrc_constraint=jnp.zeros_like(data.qfrc_smooth),
        )

    nv = model.nv
    M = data.qM
    J = efc.J * efc.active[:, None].astype(dtype)
    aref = efc.aref

    scale = model.stat_meaninertia * max(1, nv)
    # dtype-aware floors: MuJoCo's defaults (tolerance 1e-8, exact line
    # search to 1e-12) are unreachable in f32 — without a floor every
    # while_loop runs to its cap and the step is ~50x slower on TPU.
    f32 = dtype == jnp.float32
    tol = max(model.opt.tolerance, 1e-6 if f32 else 0.0)
    ls_atol = 1e-5 if f32 else 1e-12
    ls_step_tol = 1e-4 if f32 else 1e-10

    def cost_at(x):
        jar = J @ x - aref
        q, _ = _quantities(model, efc, jar, dtype)
        gauss = 0.5 * (x - data.qacc_smooth) @ (M @ (x - data.qacc_smooth))
        return q.cost + gauss

    # warmstart: start from the better of qacc_smooth / qacc_warmstart
    c_ws = cost_at(data.qacc_warmstart)
    c_sm = cost_at(data.qacc_smooth)
    x0 = jnp.where(c_ws < c_sm, data.qacc_warmstart, data.qacc_smooth)

    has_ell = len(efc.ell_start) > 0
    # batched mode: small static iteration budget (set by the env layer) —
    # under vmap convergence checks buy nothing (the loop runs until every
    # env converges), so the fast path drops them and unrolls the line
    # search; the oracle-parity path (MuJoCo-default budgets, single env,
    # f64) keeps the convergent while_loop scheme.
    fast_path = model.opt.iterations <= 16 and model.opt.ls_iterations <= 8

    # TPU: the whole fast-path solve (Hessian assembly, Cholesky, line
    # search, all `iterations` rounds) runs as one fused Pallas kernel with
    # J/M resident in VMEM — the XLA graph below re-streams J from HBM ~6x
    # per iteration, which dominates the entire env step. Pyramidal-only
    # (elliptic cone terms keep the XLA path).
    if fast_path and not has_ell and dtype == jnp.float32:
        from . import pallas_newton

        if pallas_newton.pallas_enabled():
            solver_fn = pallas_newton.get_solver(
                efc, model.opt.iterations, model.opt.ls_iterations,
                scale=scale, tolerance=tol,
            )
            x, force = solver_fn(
                efc.J, M, aref, efc.D, efc.R, efc.floss,
                efc.active.astype(dtype),
                data.qacc_smooth, data.qacc_warmstart,
            )
            return _finish(data, efc, J, x, force)

    def newton_direction(x):
        jar = J @ x - aref
        q, tables = _quantities(model, efc, jar, dtype)
        mx = M @ (x - data.qacc_smooth)
        grad = mx - J.T @ q.force

        # Hessian: M + J' diag(w) J (+ cone terms)
        JW = J * q.hweight[:, None]
        H = M + J.T @ JW
        if has_ell:
            idx, gvec, w, jt_s, wdir, c2 = _cone_hessian_terms(
                model, efc, jar, tables, dtype
            )
            Jg = jnp.einsum("ck,ckv->cv", gvec, J[idx])  # (ncon, nv)
            H = H + jnp.einsum("c,cv,cw->vw", w, Jg, Jg)
            Jt = J[idx] * jt_s[:, :, None]  # (ncon, maxdim, nv)
            Jq = jnp.einsum("ck,ckv->cv", wdir, Jt)  # (ncon, nv)
            H = H + jnp.einsum("c,ckv,ckw->vw", c2, Jt, Jt)
            H = H - jnp.einsum("c,cv,cw->vw", c2, Jq, Jq)
        H = H + jnp.eye(nv, dtype=dtype) * 1e-12

        L = linalg.cholesky(H)
        dx = -linalg.cho_solve(L, grad)
        jv = J @ dx
        g0 = dx @ mx
        h0 = dx @ (M @ dx)
        # phi'(0) = grad . dx = g0 - f(jar) . jv (the force term matters!)
        d0 = g0 - jnp.dot(q.force, jv)
        return jar, grad, dx, jv, g0, h0, d0

    def phi_prime(jar, jv, g0, h0, a):
        """phi'(a) — one fused constraint-row pass (no curvature)."""
        qa, _ = _quantities(model, efc, jar + a * jv, dtype)
        return g0 + a * h0 - jnp.dot(qa.force, jv)

    def phi_derivs(jar, jv, g0, h0, a):
        jar_a = jar + a * jv
        qa, _ = _quantities(model, efc, jar_a, dtype)
        d1 = g0 + a * h0 - jnp.dot(qa.force, jv)
        d2 = h0 + jnp.dot(qa.hweight * jv, jv)
        if has_ell:
            idxa, gveca, wa, jt_sa, wdira, c2a = _cone_hessian_terms(
                model, efc, jar_a, _ell_tables(efc, dtype), dtype
            )
            jv_c = jv[idxa]
            gjv = jnp.einsum("ck,ck->c", gveca, jv_c)
            d2 = d2 + jnp.sum(wa * gjv * gjv)
            tjv = jv_c * jt_sa
            qjv = jnp.einsum("ck,ck->c", wdira, tjv)
            d2 = d2 + jnp.sum(c2a * (jnp.sum(tjv * tjv, axis=1) - qjv * qjv))
        return d1, d2

    def falsi(lo, dlo, hi, dhi):
        denom = dhi - dlo
        a = jnp.where(
            denom > MINVAL, lo - dlo * (hi - lo) / denom, 0.5 * (lo + hi)
        )
        return jnp.clip(a, lo, hi)

    if fast_path:
        # Newton's quadratic model says alpha = 1; refine with a few
        # unrolled safeguarded-secant steps on phi' (phi is convex, so any
        # point with phi' < 0 on [0, a] is a descent point). Per-env
        # termination matches the convergent path (and the Pallas
        # kernels): take only improving steps, freeze the env once scaled
        # improvement or gradient drops below tolerance.
        def iteration_fast(_, st):
            x, cost, done = st
            jar, grad, dx, jv, g0, h0, d0 = newton_direction(x)
            lo = jnp.zeros((), dtype=dtype)
            dlo = d0  # phi'(0) < 0 (descent direction)
            hi = jnp.zeros((), dtype=dtype)
            dhi = jnp.ones((), dtype=dtype)
            has_hi = jnp.asarray(False)
            a = jnp.ones((), dtype=dtype)
            for _k in range(model.opt.ls_iterations):
                d = phi_prime(jar, jv, g0, h0, a)
                neg = d < 0
                lo = jnp.where(neg, a, lo)
                dlo = jnp.where(neg, d, dlo)
                hi = jnp.where(neg, hi, a)
                dhi = jnp.where(neg, dhi, d)
                has_hi = has_hi | ~neg
                a = jnp.where(has_hi, falsi(lo, dlo, hi, dhi), a * 2.0)
            alpha = jnp.where(has_hi, falsi(lo, dlo, hi, dhi), lo)
            x_new = x + alpha * dx
            # incremental cost (jar + alpha jv, M dx reuse) in the same
            # arithmetic order as the Pallas kernel's termination test, so
            # the two paths flip `done` at the same iteration
            q_new, _ = _quantities(model, efc, jar + alpha * jv, dtype)
            dxs = x - data.qacc_smooth
            new_cost = q_new.cost + 0.5 * jnp.dot(
                x_new - data.qacc_smooth,
                M @ dxs + alpha * (M @ dx),
            )
            improvement = (cost - new_cost) / scale
            gradient = jnp.linalg.norm(grad) / scale
            newly = (improvement < tol) | (gradient < tol)
            upd = ~done & (new_cost < cost)
            return (
                jnp.where(upd, x_new, x),
                jnp.where(upd, new_cost, cost),
                done | newly,
            )

        x, _, _ = jax.lax.fori_loop(
            0, model.opt.iterations, iteration_fast,
            (x0, jnp.minimum(c_ws, c_sm), jnp.asarray(False)),
            unroll=True,
        )
    else:
        def cost_at_x(x):
            jar = J @ x - aref
            q, _ = _quantities(model, efc, jar, dtype)
            gauss = 0.5 * (x - data.qacc_smooth) @ (M @ (x - data.qacc_smooth))
            return q.cost + gauss

        def iteration(state):
            x, prev_cost, it, done = state
            jar, grad, dx, jv, g0, h0, d0 = newton_direction(x)

            d_lo = d0

            def grow_body(gs):
                hi, d_hi, k = gs
                hi2 = hi * 2.0
                d2_, _ = phi_derivs(jar, jv, g0, h0, hi2)
                return hi2, d2_, k + 1

            def grow_cond(gs):
                hi, d_hi, k = gs
                return (d_hi < 0) & (k < 16)

            d_hi0, _ = phi_derivs(jar, jv, g0, h0, jnp.ones((), dtype=dtype))
            hi, d_hi, _ = jax.lax.while_loop(
                grow_cond, grow_body,
                (jnp.ones((), dtype=dtype), d_hi0, jnp.zeros((), jnp.int32)),
            )

            def ls_body(ls_state):
                lo, dlo, hi_, dhi, k = ls_state
                a = falsi(lo, dlo, hi_, dhi)
                d, _ = phi_derivs(jar, jv, g0, h0, a)
                neg = d < 0
                return (
                    jnp.where(neg, a, lo),
                    jnp.where(neg, d, dlo),
                    jnp.where(neg, hi_, a),
                    jnp.where(neg, dhi, d),
                    k + 1,
                )

            def ls_cond(ls_state):
                lo, dlo, hi_, dhi, k = ls_state
                return (k < model.opt.ls_iterations) & ((hi_ - lo) > ls_atol)

            lo, dlo, hi, dhi, _ = jax.lax.while_loop(
                ls_cond, ls_body,
                (jnp.zeros((), dtype=dtype), d_lo, hi, d_hi,
                 jnp.zeros((), jnp.int32)),
            )
            alpha = falsi(lo, dlo, hi, dhi)
            alpha = jnp.where(dhi < 0, hi, alpha)

            x_new = x + alpha * dx
            new_cost = cost_at_x(x_new)
            improvement = (prev_cost - new_cost) / scale
            gradient = jnp.linalg.norm(grad) / scale
            done = (improvement < tol) | (gradient < tol)
            take = new_cost < prev_cost
            x_out = jnp.where(take, x_new, x)
            cost_out = jnp.where(take, new_cost, prev_cost)
            return x_out, cost_out, it + 1, done

        def cond(state):
            _, _, it, done = state
            return (it < model.opt.iterations) & ~done

        cost0 = jnp.minimum(c_ws, c_sm)
        x, _, _, _ = jax.lax.while_loop(
            cond, iteration,
            (x0, cost0, jnp.zeros((), jnp.int32), jnp.asarray(False)),
        )

    jar = J @ x - aref
    q, _ = _quantities(model, efc, jar, dtype)
    return _finish(data, efc, J, x, q.force)


def _finish(data: Data, efc: Efc, J, x, force) -> Data:
    """Write the solution back: qacc, qfrc_constraint = J'f, and the
    per-contact force rows used by the GRF observation."""
    qfrc = J.T @ force
    nc = len(efc.con_efcadr)
    maxd = int(data.efc_force_contact.shape[1]) if nc else 0
    efc_force_contact = data.efc_force_contact
    if nc and maxd:
        import numpy as np

        rowidx = np.zeros((nc, maxd), dtype=np.int32)
        rowmsk = np.zeros((nc, maxd), dtype=bool)
        for c in range(nc):
            adr, dim = int(efc.con_efcadr[c]), int(efc.con_dim[c])
            if adr < 0:
                continue
            nrow = dim if (efc.type[adr] in (5, 7)) else 2 * (dim - 1)
            nrow = min(nrow, maxd)
            rowidx[c, :nrow] = adr + np.arange(nrow)
            rowmsk[c, :nrow] = True
        efc_force_contact = jnp.where(
            jnp.asarray(rowmsk), force[jnp.asarray(rowidx)], 0.0
        )

    return data.replace(
        qacc=x,
        qfrc_constraint=qfrc,
        efc_force_contact=efc_force_contact,
    )
