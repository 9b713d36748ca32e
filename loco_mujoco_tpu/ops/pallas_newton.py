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
import os

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .constraint import MINVAL
from .pallas_collision import pallas_enabled  # noqa: F401  (re-exported)

_BE = 128  # env lane width (one lane tile)
_S_MAX = int(os.environ.get("LMT_ENV_SUBLANES", "8"))  # env sublane rows


def pick_sublanes(E, bytes_per_env=None):
    """Env sublane rows S for the grouped (S, 128) block layout.

    Per-env scalars in the solver kernels are (S, 128) tiles — S env rows
    in sublanes x 128 envs in lanes. At S=1 every scalar op uses 1 of the
    VPU's 8 sublanes (measured 2.46 ns/env-value for a dependent FMA
    chain); at S=8 the same chain costs 0.30 ns/env-value. S shrinks when
    the block's VMEM footprint would exceed the scoped budget, or when the
    batch is too small to fill a block.
    """
    s = max(1, min(_S_MAX, (E + 127) // 128))
    # keep S a power of two that divides 8: with grid > 1, block windows
    # start at sublane offset block_idx*S, and only power-of-two S keeps
    # every offset f32-tile-compatible (an odd S like 3 — e.g. E=384
    # shrunk by the VMEM check — would put windows at sublane 3, 6, ...,
    # which Mosaic may reject or slow-path; ADVICE r2 medium)
    s = 1 << (s.bit_length() - 1)
    if bytes_per_env is not None:
        budget = int(os.environ.get("LMT_SCOPED_VMEM_KIB", "81920")) * 1024
        # Mosaic's live-range peak runs well past the raw operand bytes:
        # G1's standalone solve (nv=19 x 288 rows) allocated 87 MB against
        # a 35 MB estimate at S=8 — a 2.5x multiplier, in line with the
        # 2.2-3.3x calibrations of the fused kernel's VMEM gate
        while s > 1 and s * 128 * bytes_per_env * 2.5 > budget:
            s //= 2
    return s

# tests set this to run the kernel in interpret mode on CPU (parity vs the
# XLA fast path without TPU hardware)
_INTERPRET = False


def vmem_params(plan=None):
    """Per-kernel scoped-VMEM request for the solver kernels.

    The grouped (S, 128) env blocks keep S x 128 envs of Newton state on
    the Mosaic stack — more than the 16 MiB default scoped limit. Passing
    the budget as kernel CompilerParams frees callers from threading
    jit-level compiler options (plain `jax.jit(env.step)` works).

    Mosaic SCHEDULES into whatever budget this grants (measured: G1's
    megastep tracks the value MB-for-MB, and the flagship lost ~7%
    steps/s when the default was raised), so the budget is PER-PLAN:
    only big-table ext plans (G1) get the 90 MiB their schedule floor
    needs; everything else keeps the calibrated 80 MiB."""
    big_ext = plan is not None and getattr(plan, "mega_ell", False) and (
        getattr(plan, "mega_tbl_bytes", 0) or 0
    ) > 12 * 1024 * 1024
    default = "92160" if big_ext else "81920"
    budget = int(os.environ.get("LMT_PALLAS_VMEM_KIB", default)) * 1024
    kw = {}
    if os.environ.get("LMT_SHAPE_INVARIANT") == "0":
        # Mosaic's shape-invariant-numerics mode rejects ADD-reductions
        # over sublane-offset slices ("input layout must have zero
        # offsets"), which G1's row-class boundaries produce in the fused
        # kernel. Disabling it permits those lowerings; numerics may
        # differ in padding-handling order (experimentally gated).
        kw["shape_invariant_numerics"] = False
    return pltpu.CompilerParams(vmem_limit_bytes=budget, **kw)


def chol_solve_spd(M, rhs, nv, jitter=0.0):
    """Solve M x = rhs for SPD M in env-last layout: M (nv, nv, E) (or
    M[a] -> (nv, E) rows), rhs (nv, E). Unrolled scalar Cholesky +
    substitution, all (E,) vector ops.

    Measured note (v5e, flagship nv=19): the column-vectorized variant
    below (chol_solve_spd_cols) runs FULL (nv, E) tile updates whose
    rectangular (not triangular) arithmetic plus the per-column sublane
    broadcasts cost more than the scalar form's 1/8-density row ops —
    75.1k -> 71.6k env-steps/s when used for the in-kernel Hessian solve.
    Keep the scalar form for nv <~ 24; revisit for larger-nv models."""
    if isinstance(M, list):
        l = [[None] * nv for _ in range(nv)]
        get = lambda i, j: M[i][j]
    else:
        l = [[None] * nv for _ in range(nv)]
        get = lambda i, j: M[i, j, :]
    for j in range(nv):
        d = get(j, j)
        if jitter:
            d = d + jitter
        for k in range(j):
            d = d - l[j][k] * l[j][k]
        dj = jnp.sqrt(jnp.maximum(d, 1e-30))
        inv = 1.0 / dj
        l[j][j] = dj
        for i in range(j + 1, nv):
            s = get(i, j)
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


def chol_solve_spd_cols(M, rhs, nv, jitter=0.0):
    """Column-vectorized left-looking Cholesky solve (kept for larger-nv
    experiments; see the measured note on chol_solve_spd).

    Garbage-row discipline: column k of L is valid only at rows > k (its
    diagonal lives in `diag`, rows < k hold junk from the unmasked tile
    ops). Every read below respects that — factor updates read cols[k][j]
    with j > k, the substitutions divide by `diag` and only read rows on
    the valid side of each update."""
    if isinstance(M, list):
        A = jnp.stack([
            r if not isinstance(r, list) else jnp.stack(r) for r in M
        ])
    else:
        A = M  # (nv, nv, E)
    cols, diag = [], []
    for j in range(nv):
        acc = A[:, j]  # (nv, E)
        for k in range(j):
            acc = acc - cols[k] * cols[k][j][None]
        d = acc[j] + jitter if jitter else acc[j]
        dj = jnp.sqrt(jnp.maximum(d, 1e-30))
        cols.append(acc * (1.0 / dj)[None])
        diag.append(dj)
    # forward substitution: L y = rhs (column updates, k ascending)
    acc = rhs if not isinstance(rhs, list) else jnp.stack(rhs)
    ys = [None] * nv
    for k in range(nv):
        yk = acc[k] / diag[k]
        ys[k] = yk
        if k + 1 < nv:
            acc = acc - cols[k] * yk[None]
    # backward substitution: L' x = y (row-of-L updates, k descending)
    Lm = jnp.stack(cols, axis=1)  # Lm[i, j] = L[i][j], valid for i > j
    acc = jnp.stack(ys)
    xs = [None] * nv
    for k in range(nv - 1, -1, -1):
        xk = acc[k] / diag[k]
        xs[k] = xk
        if k:
            acc = acc - Lm[k] * xk[None]
    return jnp.stack(xs)


def solve_core(J, M, aref, D, R, floss_fl, act, asm, ws,
               nv, iterations, ls_iterations, ne, nfl,
               ell_runs=(), ell_mu=None, scale=None, tolerance=None,
               pyr=None):
    """The Newton solve on VMEM-resident values, env axis in lanes.

    J: indexable as J[k] -> (nrows, BE) (a (nv, nrows, BE) array or a list
    of per-dof row tiles); M (nv, nv, BE); row quantities (nrows, BE);
    floss_fl (nfl, BE) (friction-loss rows only); asm/ws (nv, BE). Returns
    (qacc (nv, BE), force (nrows, BE)). Shared by the plain solve kernel
    and the fused assembly+solve kernel.

    Row classes are STATIC contiguous ranges (the assembly order is
    equality, friction loss, then unilateral limits/contacts): rows [0, ne)
    are bilateral, [ne, ne+nfl) are Huber friction-loss rows, and the rest
    are one-sided quadratic — except elliptic-cone contact rows, described
    by ell_runs. Every per-row force/weight/cost pass walks this static
    program and emits one ordered concat (no mask arrays, no scatter —
    the masked formulation cost ~1.4 MB of VMEM and 4x the row ops).

    ell_runs/ell_mu: elliptic-cone contacts (A1). ell_runs is a static
    tuple of (row_start, n_contacts, dim) runs of contiguous equal-dim
    elliptic contact rows; ell_mu is the (n_elliptic_contacts, BE) cone
    friction coefficient (friction0 / sqrt(impratio)) in run order. The
    cone zone cost/force/Hessian follows solver._quantities /
    _cone_hessian_terms exactly: separating (no force), sticking (full
    quadratic), sliding (rank-1 Gauss-Newton + tangential curvature).

    scale/tolerance: when given, apply MuJoCo's Newton termination per env
    (improvement or scaled gradient below tolerance — engine semantics as
    in solver.py's convergent path) with masked updates, and exit the
    Newton loop for the whole block once every env is done. Warm-started
    steady-state solves converge in 2-4 iterations, so this typically
    skips half the fixed `iterations` budget.

    pyr: pyramidal-contact axis form (fused assembly only). The 4
    condim-3 facet rows per slot are linear combinations of the 3 contact
    AXIS Jacobians, jn +/- mu1 j1 and jn +/- mu2 j2, so the hot passes run
    on 3*ncon axis rows instead of 4*ncon facet rows: the Hessian
    contribution of one slot collapses to jn_a u_b + j1_a v_b + j2_a w_b
    (u = c_nn jn + c_n1 j1 + c_n2 j2, v = c_n1 jn + c_11 j1,
    w = c_n2 jn + c_22 j2 from the facet weights), J'f uses the facet
    force combines, and J x builds facet rows from 3 axis dots. With pyr
    given, `J` carries ONLY rows [0, s0) (equality/friction-loss/limit);
    pyr = dict(jt=[t][dof] (ncon, BE) axis rows, mu1/mu2 (ncon, BE),
    s0=first contact row). Facet-row quantities (zones, cost, force)
    still walk the full static program on the assembled jar."""
    nrows = aref.shape[0]

    if pyr is not None:
        assert not ell_runs
        p_s0 = pyr["s0"]
        p_jt = pyr["jt"]  # [3][nv] -> (ncon, BE)
        p_mu1, p_mu2 = pyr["mu1"], pyr["mu2"]  # (ncon, BE) or scalar
        p_ncon = pyr["ncon"]
        # static liveness: dofs on NO candidate contact body's kinematic
        # chain have all-zero axis rows — skip their contact terms in the
        # Hessian/matvec/J'f passes entirely (arm/head dofs on the
        # humanoids: ~25% of nv)
        p_live = pyr.get("live") or [True] * nv
        if not any(p_live):
            p_live = [True] * nv

    # trailing env-block shape: (BE,) legacy lanes-only form or (S, 128)
    # sublane-packed groups — all row/scalar code below is shape-generic
    eshape = aref.shape[1:]

    # -- elliptic preamble: per-run cone-scaled coordinates ----------------
    ell = []
    if ell_runs:
        off = 0
        for (s, cnt, d) in ell_runs:
            Db = D[s:s + cnt * d].reshape(cnt, d, *eshape)
            dn = Db[:, 0]
            cone_scale = jnp.sqrt(Db / jnp.maximum(Db[:, :1], MINVAL))
            mu = ell_mu[off:off + cnt]  # (cnt, BE)
            act_n = act[s:s + cnt * d].reshape(cnt, d, *eshape)[:, 0]
            dm = dn / (1.0 + mu * mu)
            ell.append(dict(s=s, cnt=cnt, d=d, Db=Db, scale=cone_scale,
                            mu=mu, act=act_n, dm=dm))
            off += cnt

    # static row program: ordered (tag, start, end[, run]) segments
    prog = []
    if ne:
        prog.append(("eq", 0, ne, None))
    if nfl:
        prog.append(("fl", ne, ne + nfl, None))
    cur = ne + nfl
    for e in ell:
        s, n = e["s"], e["cnt"] * e["d"]
        if s > cur:
            prog.append(("uni", cur, s, None))
        prog.append(("ell", s, s + n, e))
        cur = s + n
    if cur < nrows:
        prog.append(("uni", cur, nrows, None))

    if nfl:
        rfl = R[ne:ne + nfl] * floss_fl

    def _ell_zone(e, jb, want):
        """Cone zone pieces for one run at jar rows jb (cnt*d, BE)."""
        cnt, d = e["cnt"], e["d"]
        jb = jb.reshape(cnt, d, *eshape)
        u = jb * e["scale"]
        n = u[:, 0]
        t = jnp.sqrt(jnp.sum(u[:, 1:] ** 2, axis=1))
        tsafe = jnp.maximum(t, MINVAL)
        mu = e["mu"]
        top = n >= mu * t
        bottom = (mu * n + t) <= 0.0
        midf = jnp.where(top | bottom, 0.0, e["act"])
        botf = jnp.where(bottom, e["act"], 0.0)
        nmt = n - mu * t
        out = {}
        if "f" in want or "h" in want:
            # gradient direction in row space (scaled)
            g = jnp.concatenate(
                [e["scale"][:, :1],
                 -(mu / tsafe)[:, None] * u[:, 1:] * e["scale"][:, 1:]],
                axis=1,
            )  # (cnt, d, BE)
        if "f" in want:
            f_mid = -(e["dm"] * nmt * midf)[:, None] * g
            f_bot = -(e["Db"] * jb) * botf[:, None]
            out["f"] = (f_mid + f_bot).reshape(cnt * d, *eshape)
        if "c" in want:
            c_mid = 0.5 * e["dm"] * nmt * nmt * midf
            c_bot = 0.5 * jnp.sum(e["Db"] * jb * jb, axis=1) * botf
            out["c"] = jnp.sum(c_mid + c_bot, axis=0, keepdims=True)
        if "h" in want:
            c2 = e["dm"] * mu * (mu * t - n) / tsafe * midf
            # sticking weight on all rows + sliding tangential curvature
            wblk = e["Db"] * botf[:, None]
            wtan = c2[:, None] * e["scale"][:, 1:] ** 2
            wblk = jnp.concatenate([wblk[:, :1], wblk[:, 1:] + wtan], axis=1)
            out["w"] = wblk.reshape(cnt * d, *eshape)
            out["hess"] = dict(e=e, u=u, tsafe=tsafe, g=g,
                               wg=e["dm"] * midf, wq=-c2)
        return out

    def row_quantities(jar, want):
        """Walk the static program once; return dict with any of
        f/w (nrows, BE), c (1, BE), hess (per-run rank-1 data)."""
        fp, wp, hess = [], [], []
        cost = None

        def addc(c):
            nonlocal cost
            cost = c if cost is None else cost + c

        for (tag, s, e2, run) in prog:
            jb = jar[s:e2]
            Db = D[s:s + (e2 - s)]
            if tag == "eq":
                if "f" in want:
                    fp.append(-Db * jb)
                if "w" in want:
                    wp.append(Db)
                if "c" in want:
                    addc(jnp.sum(0.5 * Db * jb * jb, axis=0, keepdims=True))
            elif tag == "fl":
                ndj = -Db * jb
                if "f" in want:
                    fp.append(jnp.clip(ndj, -floss_fl, floss_fl))
                if "w" in want:
                    wp.append(jnp.where(jnp.abs(jb) <= rfl, Db, 0.0))
                if "c" in want:
                    q = 0.5 * Db * jb * jb
                    c = jnp.where(
                        jnp.abs(jb) <= rfl, q,
                        floss_fl * jnp.abs(jb) - 0.5 * rfl * floss_fl,
                    )
                    addc(jnp.sum(c, axis=0, keepdims=True))
            elif tag == "uni":
                ab = act[s:e2]
                neg = jb < 0
                if "f" in want:
                    fp.append(jnp.where(neg, -Db * jb, 0.0) * ab)
                if "w" in want:
                    wp.append(jnp.where(neg, Db, 0.0) * ab)
                if "c" in want:
                    c = jnp.where(neg, 0.5 * Db * jb * jb, 0.0) * ab
                    addc(jnp.sum(c, axis=0, keepdims=True))
            else:  # elliptic run
                zw = set(want) & {"f", "c"}
                if "w" in want:
                    zw |= {"h"}
                z = _ell_zone(run, jb, zw)
                if "f" in want:
                    fp.append(z["f"])
                if "w" in want:
                    wp.append(z["w"])
                    hess.append(z["hess"])
                if "c" in want:
                    addc(z["c"])
        out = {}
        if "f" in want:
            out["f"] = jnp.concatenate(fp, axis=0)
        if "w" in want:
            out["w"] = jnp.concatenate(wp, axis=0)
            out["hess"] = hess
        if "c" in want:
            out["c"] = cost
        return out

    def _ell_virtual_rows(hess):
        """Rank-1 Hessian rows: per dof a (2*ncon_ell, BE) tile V[a] with
        weights Vw — H += sum_r Vw[r] V[a][r] V[b][r]."""
        Vw = jnp.concatenate(
            [jnp.concatenate([h["wg"], h["wq"]], axis=0) for h in hess],
            axis=0,
        )
        V = []
        for a in range(nv):
            rows = []
            for h in hess:
                e = h["e"]
                cnt, d = e["cnt"], e["d"]
                Jb = J[a][e["s"]:e["s"] + cnt * d].reshape(cnt, d, *eshape)
                jg = jnp.sum(h["g"] * Jb, axis=1)  # (cnt, BE)
                wdir = h["u"][:, 1:] / h["tsafe"][:, None]
                jq = jnp.sum(wdir * e["scale"][:, 1:] * Jb[:, 1:], axis=1)
                rows.append(jnp.concatenate([jg, jq], axis=0))
            V.append(jnp.concatenate(rows, axis=0))
        return V, Vw

    def force_dot(jar, vec):
        """sum(force(jar) * vec) over rows as (1, BE), without ever
        materializing the force array — the line search evaluates this
        ls_iterations times per Newton step, and the full-row version's
        temporaries dominated the kernel's scoped-VMEM peak."""
        tot = None
        for (tag, s, e2, run) in prog:
            jb = jar[s:e2]
            vb = vec[s:e2]
            Db = D[s:e2]
            if tag == "eq":
                t = jnp.sum(-Db * jb * vb, axis=0, keepdims=True)
            elif tag == "fl":
                t = jnp.sum(
                    jnp.clip(-Db * jb, -floss_fl, floss_fl) * vb,
                    axis=0, keepdims=True,
                )
            elif tag == "uni":
                ab = act[s:e2]
                t = jnp.sum(
                    jnp.where(jb < 0, -Db * jb, 0.0) * ab * vb,
                    axis=0, keepdims=True,
                )
            else:
                z = _ell_zone(run, jb, "f")
                t = jnp.sum(z["f"] * vb, axis=0, keepdims=True)
            tot = t if tot is None else tot + t
        return tot

    def matvec_J(x):  # (nv, BE) -> (nrows, BE)
        if pyr is not None:
            zn = z1 = z2 = None
            for k in range(nv):
                if not p_live[k]:
                    continue
                xk = x[k][None]
                if zn is None:
                    zn = p_jt[0][k] * xk
                    z1 = p_jt[1][k] * xk
                    z2 = p_jt[2][k] * xk
                else:
                    zn = zn + p_jt[0][k] * xk
                    z1 = z1 + p_jt[1][k] * xk
                    z2 = z2 + p_jt[2][k] * xk
            # BLOCKED facet layout (4 contiguous groups of ncon rows):
            # a pure concat — the per-contact interleaved layout needed a
            # sublane-stride shuffle per matvec that cost more than the
            # axis form saved (measured 50 -> 72 ms/step)
            fac = jnp.concatenate(
                [zn + p_mu1 * z1, zn - p_mu1 * z1,
                 zn + p_mu2 * z2, zn - p_mu2 * z2],
                axis=0,
            )
            if p_s0 == 0:
                return fac
            top = J[0] * x[0][None]
            for k in range(1, nv):
                top = top + J[k] * x[k][None]
            return jnp.concatenate([top, fac], axis=0)
        acc = J[0] * x[0][None]
        for k in range(1, nv):
            acc = acc + J[k] * x[k][None]
        return acc

    def jtf_dot(f):  # (nrows, BE) -> per-dof list of (BE,) rows: J' f
        if pyr is not None:
            n_c = p_ncon
            ff0 = f[p_s0:p_s0 + n_c]
            ff1 = f[p_s0 + n_c:p_s0 + 2 * n_c]
            ff2 = f[p_s0 + 2 * n_c:p_s0 + 3 * n_c]
            ff3 = f[p_s0 + 3 * n_c:p_s0 + 4 * n_c]
            fn = ff0 + ff1 + ff2 + ff3
            f1c = p_mu1 * (ff0 - ff1)
            f2c = p_mu2 * (ff2 - ff3)
            ftop = f[:p_s0] if p_s0 else None
            out = []
            zero_r = fn[0] * 0.0
            for a in range(nv):
                if p_live[a]:
                    s = jnp.sum(
                        p_jt[0][a] * fn + p_jt[1][a] * f1c
                        + p_jt[2][a] * f2c,
                        axis=0,
                    )
                else:
                    s = zero_r
                if p_s0:
                    s = s + jnp.sum(J[a] * ftop, axis=0)
                out.append(s)
            return out
        return [jnp.sum(J[a] * f, axis=0) for a in range(nv)]

    def matvec_M(x):  # (nv, BE) -> (nv, BE)
        # row a: sum_k M[a,k] x[k] — M[a] is a contiguous (nv, BE) tile
        return jnp.stack([jnp.sum(M[a] * x, axis=0) for a in range(nv)])

    def force_of(jar):
        return row_quantities(jar, "f")["f"]

    def total_cost(x):
        jar = matvec_J(x) - aref
        dx = x - asm
        gauss = 0.5 * jnp.sum(dx * matvec_M(dx), axis=0, keepdims=True)
        return row_quantities(jar, "c")["c"] + gauss

    # warmstart: better of qacc_smooth / qacc_warmstart
    c_ws = total_cost(ws)
    c_sm = total_cost(asm)
    x = jnp.where(c_ws < c_sm, ws, asm)

    def newton_iter_full(x):
        jar = matvec_J(x) - aref
        q = row_quantities(jar, "fw")
        f, w = q["f"], q["w"]
        V = Vw = None
        if ell:
            V, Vw = _ell_virtual_rows(q["hess"])

        mdx0 = matvec_M(x - asm)  # (nv, BE)

        # grad = M(x - asm) - J' f
        jtf = jtf_dot(f)
        grad = [mdx0[a] - jtf[a] for a in range(nv)]

        # H = M + J' diag(w) J (+ elliptic rank-1 rows) — upper triangle
        h = [[None] * nv for _ in range(nv)]
        if pyr is not None:
            # per-slot facet-weight combines -> 3 weighted axis rows per dof
            n_c = p_ncon
            wf0 = w[p_s0:p_s0 + n_c]
            wf1 = w[p_s0 + n_c:p_s0 + 2 * n_c]
            wf2 = w[p_s0 + 2 * n_c:p_s0 + 3 * n_c]
            wf3 = w[p_s0 + 3 * n_c:p_s0 + 4 * n_c]
            w12 = wf0 + wf1
            w34 = wf2 + wf3
            c_nn = w12 + w34
            c_n1 = p_mu1 * (wf0 - wf1)
            c_11 = p_mu1 * p_mu1 * w12
            c_n2 = p_mu2 * (wf2 - wf3)
            c_22 = p_mu2 * p_mu2 * w34
            wtop = w[:p_s0] if p_s0 else None
            U = [c_nn * p_jt[0][b] + c_n1 * p_jt[1][b] + c_n2 * p_jt[2][b]
                 if p_live[b] else None for b in range(nv)]
            Vx = [c_n1 * p_jt[0][b] + c_11 * p_jt[1][b]
                  if p_live[b] else None for b in range(nv)]
            Wx = [c_n2 * p_jt[0][b] + c_22 * p_jt[2][b]
                  if p_live[b] else None for b in range(nv)]
            for a in range(nv):
                wja = wtop * J[a] if p_s0 else None
                jn_a, j1_a, j2_a = p_jt[0][a], p_jt[1][a], p_jt[2][a]
                for b in range(a, nv):
                    if p_live[a] and p_live[b]:
                        s = jnp.sum(
                            jn_a * U[b] + j1_a * Vx[b] + j2_a * Wx[b],
                            axis=0,
                        )
                        if p_s0:
                            s = s + jnp.sum(wja * J[b], axis=0)
                    elif p_s0:
                        s = jnp.sum(wja * J[b], axis=0)
                    else:
                        s = 0.0
                    s = s + M[a, b, :]
                    if b == a:
                        s = s + 1e-12  # jitter, as in the XLA path
                    h[a][b] = s
                    if b != a:
                        h[b][a] = s
        else:
            for a in range(nv):
                wja = w * J[a]
                va = Vw * V[a] if ell else None
                for b in range(a, nv):
                    s = jnp.sum(wja * J[b], axis=0)
                    if ell:
                        s = s + jnp.sum(va * V[b], axis=0)
                    s = s + M[a, b, :]
                    if b == a:
                        s = s + 1e-12  # jitter, as in the XLA path
                    h[a][b] = s
                    if b != a:
                        h[b][a] = s

        # dx = -H^-1 grad (scalar-unrolled Cholesky; the column-vectorized
        # variant measured slower at nv=19 — see chol_solve_spd)
        dx = chol_solve_spd(h, [-g for g in grad], nv)  # (nv, BE)

        jv = matvec_J(dx)
        mdx = matvec_M(dx)
        g0 = jnp.sum(dx * mdx0, axis=0, keepdims=True)  # (1, BE)
        h0 = jnp.sum(dx * mdx, axis=0, keepdims=True)
        d0 = g0 - jnp.sum(f * jv, axis=0, keepdims=True)

        def phi_prime(a):  # a (1, BE)
            return g0 + a * h0 - force_dot(jar + a * jv, jv)

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

        # safeguarded secant on phi' as a lax loop (an unrolled python loop
        # keeps every iteration's row temporaries live on the Mosaic stack;
        # has_hi is carried as f32 0/1 — i1 vector carries fail to legalize)
        def ls_body(_, st):
            lo, dlo, hi, dhi, has_hi, a = st
            d = phi_prime(a)
            neg = d < 0
            lo = jnp.where(neg, a, lo)
            dlo = jnp.where(neg, d, dlo)
            hi = jnp.where(neg, hi, a)
            dhi = jnp.where(neg, dhi, d)
            has_hi = jnp.where(neg, has_hi, one)
            a = jnp.where(has_hi > 0, falsi(lo, dlo, hi, dhi), a * 2.0)
            return (lo, dlo, hi, dhi, has_hi, a)

        lo, dlo, hi, dhi, has_hi, _a = jax.lax.fori_loop(
            0, ls_iterations, ls_body,
            (zero, d0, zero, one, zero, one),
        )
        alpha = jnp.where(has_hi > 0, falsi(lo, dlo, hi, dhi), lo)
        x_new = x + alpha * dx

        # new cost for the termination test, reusing this iteration's
        # products: jar_new = jar + alpha jv, M(x_new - asm) = mdx0 + a mdx
        cost_new = row_quantities(jar + alpha * jv, "c")["c"] + 0.5 * jnp.sum(
            (x_new - asm) * (mdx0 + alpha * mdx), axis=0, keepdims=True
        )
        gradnorm = jnp.sqrt(
            sum(g * g for g in grad)
        )[None]  # (1, BE), gradient at iteration start (solver.py:420)
        return x_new, cost_new, gradnorm

    def newton_iter(_, x):
        x_new, _, _ = newton_iter_full(x)
        return x_new

    if scale is None or tolerance is None or iterations <= 1:
        x = jax.lax.fori_loop(0, iterations, newton_iter, x)
        return x, force_of(matvec_J(x) - aref)

    # MuJoCo Newton termination per env (solver.py:419-429): take only
    # improving steps; an env is done when scaled improvement or scaled
    # gradient drops below tolerance; once every env in the block is done
    # the remaining fori iterations skip the whole body. State lives in
    # VMEM scratch refs with `pl.when` predication — carrying the
    # (nv/1, BE) values through lax.while/lax.cond trips Mosaic's
    # "Sublane broadcast" layout coercion on the branch-merged carries.
    inv_scale = 1.0 / float(scale)
    tol_s = float(tolerance)
    cost0 = jnp.minimum(c_ws, c_sm)
    x_init = x

    def scoped(x_ref2, cost_ref, done_ref):
        x_ref2[...] = x_init
        cost_ref[...] = cost0
        done_ref[...] = jnp.zeros_like(cost0)  # f32 0/1

        def term_iter(_, carry):
            @pl.when(jnp.min(done_ref[...]) < 0.5)
            def _body():
                x_cur = x_ref2[...]
                cost = cost_ref[...]
                done = done_ref[...]
                x_new, cost_new, gradnorm = newton_iter_full(x_cur)
                improvement = (cost - cost_new) * inv_scale
                newly = (improvement < tol_s) | (
                    gradnorm * inv_scale < tol_s
                )
                upd = (done < 0.5) & (cost_new < cost)
                x_ref2[...] = jnp.where(upd, x_new, x_cur)
                cost_ref[...] = jnp.where(upd, cost_new, cost)
                done_ref[...] = jnp.maximum(
                    done, jnp.where(newly, 1.0, 0.0)
                )

            return carry

        jax.lax.fori_loop(0, iterations, term_iter, 0)
        return x_ref2[...]

    x = pl.run_scoped(
        scoped,
        pltpu.VMEM((nv, *eshape), jnp.float32),
        pltpu.VMEM((1, *eshape), jnp.float32),
        pltpu.VMEM((1, *eshape), jnp.float32),
    )
    return x, force_of(matvec_J(x) - aref)


def _make_kernel(nefc, nv, iterations, ls_iterations, ne, nfl,
                 scale=None, tolerance=None):
    def kernel(J_ref, M_ref, aref_ref, D_ref, R_ref, fl_ref, act_ref,
               asm_ref, ws_ref, x_ref, force_ref):
        # J is laid out (nv, nefc, S, 128): J[k] is a contiguous row tile,
        # so every matvec / Hessian access is a full-tile VPU op (indexing
        # the sublane dim of an (nefc, nv, ...) layout would shuffle
        # instead). Each ref block carries a unit group axis before the
        # (S, 128) env block (see _solve_batched) — drop it on read.
        def rd(ref):
            v = ref[...]
            return v.reshape(*v.shape[:-3], *v.shape[-2:])

        x, force = solve_core(
            rd(J_ref), rd(M_ref), rd(aref_ref), rd(D_ref), rd(R_ref),
            rd(fl_ref), rd(act_ref),
            rd(asm_ref), rd(ws_ref),
            nv, iterations, ls_iterations, ne, nfl,
            scale=scale, tolerance=tolerance,
        )
        x_ref[...] = x[:, None]
        force_ref[...] = force[:, None]

    return kernel


@functools.partial(
    jax.jit,
    static_argnames=("iterations", "ls_iterations", "ne", "nfl",
                     "scale", "tolerance"),
)
def _solve_batched(J, M, aref, D, R_, floss, active, asm, ws,
                   iterations, ls_iterations, ne, nfl,
                   scale=None, tolerance=None):
    """Batched solve. J (E, nefc, nv), M (E, nv, nv), rows (E, nefc),
    vectors (E, nv) -> qacc (E, nv), force (E, nefc).

    Grouped env layout: every kernel block carries S*128 envs as (S, 128)
    sublane x lane tiles (see pick_sublanes)."""
    from . import pallas_layout as play

    E, nefc, nv = J.shape
    # VMEM/env: J + M + L + ~8 row arrays + vectors, f32
    bpe = 4 * (nv * nefc + 2 * nv * nv + 8 * nefc + 6 * nv)
    S = pick_sublanes(E, bpe)
    R = (((E + 127) // 128 + S - 1) // S) * S
    G = R // S  # env-block groups; the GROUP axis is leading in every
    # kernel operand so any power-of-two S lowers: Mosaic requires the
    # last two block dims to be tile-divisible or whole, and a
    # (..., S, 128) block over a (..., R, 128) array violates that
    # whenever S < 8 and G > 1 — as (K, G, S, 128) the block is
    # (K, 1, S, 128) whose trailing dims equal the array's.

    def to_g(x, k):  # (E, k) -> (k, G, S, 128)
        g = play.to_grouped(x.astype(jnp.float32), r_pad=S)
        return g.reshape(k, G, S, 128)

    # J -> (nv, nefc, G, S, 128): leading-index access inside the kernel
    Jt = to_g(
        jnp.swapaxes(J, 1, 2).reshape(E, nv * nefc), nv * nefc
    ).reshape(nv, nefc, G, S, 128)
    Mt = to_g(M.reshape(E, nv * nv), nv * nv).reshape(nv, nv, G, S, 128)
    # friction-loss bounds: only the fl rows enter the kernel
    floss_fl = floss[:, ne:ne + nfl]
    rows = [to_g(v, nefc) for v in (aref, D, R_, active)]
    flt = (to_g(floss_fl, nfl) if nfl
           else jnp.zeros((1, G, S, 128), jnp.float32))
    vecs = [to_g(v, nv) for v in (asm, ws)]

    kernel = _make_kernel(nefc, nv, iterations, ls_iterations, ne, nfl,
                          scale=scale, tolerance=tolerance)
    grid = (G,)

    def spec(*dims):
        nd = len(dims)
        return pl.BlockSpec(
            (*dims, 1, S, 128),
            lambda e: (0,) * nd + (e, 0, 0),
            memory_space=pltpu.VMEM,
        )

    row_spec, fl_spec, vec_spec = (
        spec(nefc), spec(max(nfl, 1)), spec(nv)
    )
    x, force = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            spec(nv, nefc), spec(nv, nv),
            row_spec, row_spec, row_spec, fl_spec, row_spec,
            vec_spec, vec_spec,
        ],
        out_specs=[vec_spec, row_spec],
        out_shape=[
            jax.ShapeDtypeStruct((nv, G, S, 128), jnp.float32),
            jax.ShapeDtypeStruct((nefc, G, S, 128), jnp.float32),
        ],
        interpret=_INTERPRET,
        compiler_params=vmem_params(),
    )(Jt, Mt, rows[0], rows[1], rows[2], flt, rows[3], *vecs)
    x = x.reshape(nv, R, 128)
    force = force.reshape(nefc, R, 128)
    return play.from_grouped(x, E), play.from_grouped(force, E)


_SOLVER_CACHE: dict = {}


def row_class_counts(is_bilateral, is_fl):
    """(ne, nfl) for the static row program, or None if the row classes are
    not the contiguous (equality block, friction-loss block, rest) order the
    solver's static program relies on — make_constraint always emits classes
    contiguously today, but a reordering must degrade to the XLA path, not
    crash the step."""
    eq = np.asarray(is_bilateral, dtype=bool)
    fl = np.asarray(is_fl, dtype=bool)
    ne = int(eq.sum())
    nfl = int(fl.sum())
    if not (np.all(eq[:ne]) and not np.any(eq[ne:])):
        return None
    if not (np.all(fl[ne:ne + nfl]) and nfl == int(fl.sum())
            and not np.any(fl[:ne]) and not np.any(fl[ne + nfl:])):
        return None
    return ne, nfl


def get_solver(efc, iterations: int, ls_iterations: int,
               scale=None, tolerance=None):
    """Factory: a custom-vmap solve fn bound to this model's static row
    classification, or None when the row layout is unsupported (caller
    keeps the XLA path). Call unbatched inside the per-env trace; under
    vmap the whole batch dispatches to one fused kernel."""
    counts = row_class_counts(efc.is_bilateral, efc.is_fl)
    if counts is None:
        return None
    ne, nfl = counts
    nefc = len(efc.is_fl)
    scale = None if scale is None else float(scale)
    tolerance = None if tolerance is None else float(tolerance)
    key = (nefc, iterations, ls_iterations, ne, nfl, scale, tolerance)
    hit = _SOLVER_CACHE.get(key)
    if hit is not None:
        return hit

    def solve_b(J, M, aref, D, R, floss, active, asm, ws):
        return _solve_batched(
            J, M, aref, D, R, floss, active, asm, ws,
            iterations=iterations, ls_iterations=ls_iterations,
            ne=ne, nfl=nfl, scale=scale, tolerance=tolerance,
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
