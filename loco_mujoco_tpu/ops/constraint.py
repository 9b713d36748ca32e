"""Constraint assembly: equality, dof friction loss, joint limits, contacts.

Builds the fixed-shape constraint system (efc rows) that the Newton solver
consumes — the same mathematical rows MuJoCo's mj_makeConstraint produces
(validated row-by-row against the host oracle in tests/test_constraint.py),
but with a static layout: every potential row always exists and carries an
active flag, so the whole step stays shape-stable under jit/vmap.

Row order matches MuJoCo: equality, friction loss, limits, contacts.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ..core.struct import pytree_dataclass, static_field
from ..core.types import ConeType, Data, DisableBit, EqType, Model
from . import math as m3
from . import support

MINVAL = 1e-15
MINIMP = 0.0001
MAXIMP = 0.9999

# row type codes (match mjtConstraint for easy oracle diffing)
EQUALITY = 0
FRICTION_DOF = 1
LIMIT_JOINT = 3
CONTACT_FRICTIONLESS = 5
CONTACT_PYRAMIDAL = 6
CONTACT_ELLIPTIC = 7


@pytree_dataclass
class Efc:
    """Fixed-shape constraint rows."""

    J: jax.Array  # (nefc, nv)
    pos: jax.Array  # (nefc,) violation used for impedance
    aref: jax.Array  # (nefc,)
    R: jax.Array  # (nefc,) regularizer
    D: jax.Array  # (nefc,) 1/R
    floss: jax.Array  # (nefc,) friction-loss bound (friction rows only)
    active: jax.Array  # (nefc,) bool — row participates this step
    # elliptic-cone bookkeeping: per-contact friction coef (after impratio
    # scaling) and row→contact map; empty when the model is pyramidal
    con_mu: jax.Array  # (ncon_ell,)
    # static row classification:
    type: np.ndarray = static_field(default=None)  # (nefc,)
    # friction-loss rows mask (huber cost), bilateral mask (equality)
    is_fl: np.ndarray = static_field(default=None)
    is_bilateral: np.ndarray = static_field(default=None)
    # elliptic: for each elliptic contact, its first row index and dim
    ell_start: np.ndarray = static_field(default=None)  # (ncon_ell,)
    ell_dim: np.ndarray = static_field(default=None)  # (ncon_ell,)
    # map from contact slot -> first efc row (for force extraction); -1 if
    # the slot produced no rows
    con_efcadr: np.ndarray = static_field(default=None)
    con_dim: np.ndarray = static_field(default=None)


def impedance(solimp: jnp.ndarray, pos: jnp.ndarray) -> jnp.ndarray:
    """Constraint impedance d(pos) — MuJoCo's sigmoid in |pos|/width."""
    # dmin/dmax are clamped into [MINIMP, MAXIMP] BEFORE interpolation
    # (verified against the oracle: with solimp dmax=1 the effective dmax is
    # 0.9999 inside both the impedance and the k/b formulas)
    dmin, dmax, width, mid, power = (
        jnp.clip(solimp[..., 0], MINIMP, MAXIMP),
        jnp.clip(solimp[..., 1], MINIMP, MAXIMP),
        solimp[..., 2],
        jnp.clip(solimp[..., 3], MINIMP, MAXIMP),
        jnp.maximum(solimp[..., 4], 1.0),
    )
    x = jnp.clip(jnp.abs(pos) / jnp.maximum(width, MINVAL), 0.0, 1.0)
    lo = jnp.power(x, power) / jnp.power(mid, power - 1.0)
    hi = 1.0 - jnp.power(1.0 - x, power) / jnp.power(1.0 - mid, power - 1.0)
    y = jnp.where(x < mid, lo, hi)
    return jnp.clip(dmin + y * (dmax - dmin), MINIMP, MAXIMP)


def kbi(model: Model, solref, solimp, pos):
    """(k*imp, b, imp): stiffness/damping of the constraint oscillator."""
    imp = impedance(solimp, pos)
    dmax = jnp.clip(solimp[..., 1], MINIMP, MAXIMP)
    timeconst = solref[..., 0]
    dampratio = solref[..., 1]
    if not (model.opt.disableflags & DisableBit.REFSAFE):
        timeconst = jnp.maximum(timeconst, 2.0 * model.opt.timestep)
    k_std = 1.0 / jnp.maximum(
        dmax * dmax * timeconst * timeconst * dampratio * dampratio, MINVAL
    )
    b_std = 2.0 / jnp.maximum(dmax * timeconst, MINVAL)
    direct = (solref[..., 0] <= 0) | (solref[..., 1] <= 0)
    k = jnp.where(direct, -solref[..., 0] / jnp.maximum(dmax * dmax, MINVAL), k_std)
    b = jnp.where(direct, -solref[..., 1] / jnp.maximum(dmax, MINVAL), b_std)
    return k, b, imp


def _finalize_row(model, solref, solimp, pos, jrow, qvel, invweight):
    """aref / R / D for one row given its violation and Jacobian."""
    k, b, imp = kbi(model, solref, solimp, pos)
    vel = jrow @ qvel
    aref = -b * vel - k * imp * pos
    r = jnp.maximum((1.0 - imp) / jnp.maximum(imp, MINVAL) * invweight, MINVAL)
    return aref, r, imp


def make_constraint(model: Model, data: Data) -> Efc:
    dtype = data.qpos.dtype
    nv = model.nv
    qvel = data.qvel
    disabled = bool(model.opt.disableflags & DisableBit.CONSTRAINT)

    rows_J, rows_pos, rows_aref, rows_R, rows_fl, rows_active = [], [], [], [], [], []
    rows_type = []
    one = jnp.ones((), dtype=dtype)

    def add_row(jrow, pos, aref, r, typ, fl=None, active=None):
        rows_J.append(jrow)
        rows_pos.append(pos * one)
        rows_aref.append(aref * one)
        rows_R.append(r * one)
        rows_fl.append((fl if fl is not None else 0.0) * one)
        rows_active.append(
            jnp.asarray(True) if active is None else active
        )
        rows_type.append(typ)

    # ---- equality ---------------------------------------------------------
    # JOINT couplings are built as ONE vectorized block (they dominate: the
    # humanoids carry 8 each); CONNECT/WELD (rare) stay scalar. The
    # vectorized block is used only when the active equalities are all
    # JOINT-type so the oracle row order is preserved.
    eq_active_ids = [
        e for e in range(model.neq) if model.eq_active0[e]
    ] if not (model.opt.disableflags & DisableBit.EQUALITY) and not disabled else []
    all_joint_eq = all(
        int(model.eq_type[e]) == int(EqType.JOINT) for e in eq_active_ids
    )

    eq_blocks = []  # (J, pos, aref, R) vectorized blocks, order-preserving

    if eq_active_ids and all_joint_eq:
        ids = np.asarray(eq_active_ids)
        j1 = model.eq_obj1id[ids]
        j2r = model.eq_obj2id[ids]
        valid2 = (j2r >= 0) & (j2r < model.njnt) & (j2r != j1)
        q1 = model.jnt_qposadr[j1]
        v1 = model.jnt_dofadr[j1]
        j2s = np.where(valid2, j2r, j1)
        q2 = model.jnt_qposadr[j2s]
        v2 = model.jnt_dofadr[j2s]
        m2 = jnp.asarray(valid2, dtype=dtype)

        dat = model.eq_data[ids]  # (ne, 11)
        dif = m2 * (data.qpos[q2] - model.qpos0[q2])
        poly = (
            dat[:, 0]
            + dat[:, 1] * dif
            + dat[:, 2] * dif**2
            + dat[:, 3] * dif**3
            + dat[:, 4] * dif**4
        )
        dpoly = (
            dat[:, 1]
            + 2 * dat[:, 2] * dif
            + 3 * dat[:, 3] * dif**2
            + 4 * dat[:, 4] * dif**3
        )
        pos = data.qpos[q1] - model.qpos0[q1] - poly
        oh1 = np.zeros((len(ids), nv))
        oh2 = np.zeros((len(ids), nv))
        for i in range(len(ids)):
            oh1[i, v1[i]] = 1.0
            oh2[i, v2[i]] = 1.0
        jblk = jnp.asarray(oh1, dtype=dtype) + (
            -(dpoly * m2)[:, None] * jnp.asarray(oh2, dtype=dtype)
        )
        iw = model.dof_invweight0[v1] + m2 * model.dof_invweight0[v2]
        k, b, imp = kbi(model, model.eq_solref[ids], model.eq_solimp[ids], pos)
        vel = jblk @ qvel
        aref = -b * vel - k * imp * pos
        r = jnp.maximum((1.0 - imp) / jnp.maximum(imp, MINVAL) * iw, MINVAL)
        eq_blocks.append((jblk, pos, aref, r))
        rows_type.extend([EQUALITY] * len(ids))
    elif eq_active_ids:
        for e in eq_active_ids:
            etype = int(model.eq_type[e])
            solref, solimp = model.eq_solref[e], model.eq_solimp[e]
            if etype == int(EqType.JOINT):
                j1 = int(model.eq_obj1id[e])
                j2 = int(model.eq_obj2id[e])
                q1, v1 = int(model.jnt_qposadr[j1]), int(model.jnt_dofadr[j1])
                dat = model.eq_data[e]
                if j2 >= 0 and j2 < model.njnt and j2 != j1:
                    q2, v2 = int(model.jnt_qposadr[j2]), int(model.jnt_dofadr[j2])
                    dif = data.qpos[q2] - model.qpos0[q2]
                    poly = (
                        dat[0]
                        + dat[1] * dif
                        + dat[2] * dif**2
                        + dat[3] * dif**3
                        + dat[4] * dif**4
                    )
                    dpoly = (
                        dat[1]
                        + 2 * dat[2] * dif
                        + 3 * dat[3] * dif**2
                        + 4 * dat[4] * dif**3
                    )
                    pos = data.qpos[q1] - model.qpos0[q1] - poly
                    jrow = (
                        jnp.zeros(nv, dtype=dtype).at[v1].set(1.0).at[v2].add(-dpoly)
                    )
                    iw = model.dof_invweight0[v1] + model.dof_invweight0[v2]
                else:
                    pos = data.qpos[q1] - model.qpos0[q1] - dat[0]
                    jrow = jnp.zeros(nv, dtype=dtype).at[v1].set(1.0)
                    iw = model.dof_invweight0[v1]
                aref, r, _ = _finalize_row(
                    model, solref, solimp, pos, jrow, qvel, iw
                )
                add_row(jrow, pos, aref, r, EQUALITY)
                continue
            if etype == int(EqType.CONNECT):
                b1, b2 = int(model.eq_obj1id[e]), int(model.eq_obj2id[e])
                anchor1 = model.eq_data[e, 0:3]
                anchor2 = model.eq_data[e, 3:6]
                p1 = data.xpos[b1] + data.xmat[b1] @ anchor1
                p2 = data.xpos[b2] + data.xmat[b2] @ anchor2
                pos3 = p1 - p2
                jacp1, _ = support.jac(model, data, p1, b1)
                jacp2, _ = support.jac(model, data, p2, b2)
                jp = jacp1 - jacp2  # (3, nv)
                iw = (
                    model.body_invweight0[b1, 0] + model.body_invweight0[b2, 0]
                )
                for i in range(3):
                    aref, r, _ = _finalize_row(
                        model, solref, solimp, pos3[i], jp[i], qvel, iw
                    )
                    add_row(jp[i], pos3[i], aref, r, EQUALITY)
            elif etype == int(EqType.WELD):
                b1, b2 = int(model.eq_obj1id[e]), int(model.eq_obj2id[e])
                anchor = model.eq_data[e, 0:3]
                relpose_p = model.eq_data[e, 3:6]
                relpose_q = model.eq_data[e, 6:10]
                torquescale = model.eq_data[e, 10]
                # position part: anchor defined in body2, target in body1
                p2 = data.xpos[b2] + data.xmat[b2] @ anchor
                p1 = data.xpos[b1] + data.xmat[b1] @ (
                    m3.quat_rotate(relpose_q, anchor) + relpose_p
                )
                pos3 = p1 - p2
                jacp1, jacr1 = support.jac(model, data, p1, b1)
                jacp2, jacr2 = support.jac(model, data, p2, b2)
                jp = jacp1 - jacp2
                jr = (jacr1 - jacr2) * torquescale
                # orientation residual: 2 * vec( conj(q2 qrel) q1 ) * ts
                q1 = data.xquat[b1]
                q2ref = m3.quat_mul(data.xquat[b2], relpose_q)
                qdif = m3.quat_mul(m3.quat_inv(q2ref), q1)
                rot3 = 2.0 * qdif[1:4] * torquescale
                iw_t = (
                    model.body_invweight0[b1, 0] + model.body_invweight0[b2, 0]
                )
                iw_r = (
                    model.body_invweight0[b1, 1] + model.body_invweight0[b2, 1]
                )
                for i in range(3):
                    aref, r, _ = _finalize_row(
                        model, solref, solimp, pos3[i], jp[i], qvel, iw_t
                    )
                    add_row(jp[i], pos3[i], aref, r, EQUALITY)
                for i in range(3):
                    aref, r, _ = _finalize_row(
                        model, solref, solimp, rot3[i], jr[i], qvel, iw_r
                    )
                    add_row(jr[i], rot3[i], aref, r, EQUALITY)
            else:
                raise NotImplementedError(f"equality type {etype}")

    # ---- dof friction loss (one vectorized block) -------------------------
    fl_block = None
    if not (model.opt.disableflags & DisableBit.FRICTIONLOSS) and not disabled:
        fl_dofs = np.nonzero(model.dof_frictionloss0 > 0)[0]
        if len(fl_dofs):
            nfl = len(fl_dofs)
            oh = np.zeros((nfl, nv))
            oh[np.arange(nfl), fl_dofs] = 1.0
            jblk = jnp.asarray(oh, dtype=dtype)
            zero_pos = jnp.zeros(nfl, dtype=dtype)
            k, b, imp = kbi(
                model, model.dof_solref[fl_dofs], model.dof_solimp[fl_dofs],
                zero_pos,
            )
            aref = -b * qvel[fl_dofs]
            r = jnp.maximum(
                (1.0 - imp) / jnp.maximum(imp, MINVAL)
                * model.dof_invweight0[fl_dofs],
                MINVAL,
            )
            fl_block = (jblk, zero_pos, aref, r, model.dof_frictionloss[fl_dofs])
            rows_type.extend([FRICTION_DOF] * nfl)

    # ---- joint limits (one vectorized block) -------------------------------
    lim_block = None
    if not (model.opt.disableflags & DisableBit.LIMIT) and not disabled:
        lim_j = np.nonzero(model.jnt_limited)[0]
        if len(lim_j):
            nl = len(lim_j)
            q = model.jnt_qposadr[lim_j]
            v = model.jnt_dofadr[lim_j]
            lo = model.jnt_range[lim_j, 0]
            hi = model.jnt_range[lim_j, 1]
            margin = model.jnt_margin[lim_j]
            dist_lo = data.qpos[q] - lo
            dist_hi = hi - data.qpos[q]
            use_lo = dist_lo <= dist_hi
            dist = jnp.where(use_lo, dist_lo, dist_hi)
            sign = jnp.where(use_lo, 1.0, -1.0).astype(dtype)
            oh = np.zeros((nl, nv))
            oh[np.arange(nl), v] = 1.0
            jblk = jnp.asarray(oh, dtype=dtype) * sign[:, None]
            pos = dist - margin
            lim_active = dist < margin
            k, b, imp = kbi(
                model, model.jnt_solref[lim_j], model.jnt_solimp[lim_j], pos
            )
            vel = sign * qvel[v]
            aref = -b * vel - k * imp * pos
            r = jnp.maximum(
                (1.0 - imp) / jnp.maximum(imp, MINVAL)
                * model.dof_invweight0[v],
                MINVAL,
            )
            lim_block = (jblk, pos, aref, r, lim_active)
            rows_type.extend([LIMIT_JOINT] * nl)

    n_scalar = len(rows_type)

    # ---- contacts ----------------------------------------------------------
    con = data.contact
    ncon = con.dist.shape[0] if con is not None else 0
    elliptic = model.opt.cone == int(ConeType.ELLIPTIC)
    con_efcadr = np.full(ncon, -1, dtype=np.int32)
    con_dim = np.zeros(ncon, dtype=np.int32)
    ell_start, ell_dim = [], []
    con_mu = []

    # contact rows are built VECTORIZED over contiguous runs of equal condim
    # (the collision driver lays slots out group-contiguously), keeping the
    # traced graph small: one batched block per (condim, cone) combination.
    blk_J, blk_pos, blk_aref, blk_R, blk_active, blk_type = [], [], [], [], [], []

    if ncon and not (model.opt.disableflags & DisableBit.CONTACT) and not disabled:
        gb = jnp.asarray(model.geom_bodyid)
        biw = jnp.asarray(model.body_invweight0)

        # contiguous equal-dim runs
        runs = []
        start = 0
        for c in range(1, ncon + 1):
            if c == ncon or con.dim[c] != con.dim[start]:
                runs.append((start, c - start, int(con.dim[start])))
                start = c
        row_cursor = n_scalar
        for (s0, cnt, dim) in runs:
            sl = slice(s0, s0 + cnt)
            b1 = gb[con.geom1[sl]]
            b2 = gb[con.geom2[sl]]
            pos_c = con.dist[sl] - con.includemargin[sl]
            active = con.dist[sl] < con.includemargin[sl]
            jacp1, jacr1 = support.jac_dyn(model, data, con.pos[sl], b1)
            jacp2, jacr2 = support.jac_dyn(model, data, con.pos[sl], b2)
            jp = jacp2 - jacp1  # (cnt, 3, nv)
            jr = jacr2 - jacr1
            frame = con.frame[sl]  # (cnt, 3, 3)
            iw_t = biw[b1, 0] + biw[b2, 0]
            mu = con.friction[sl, 0]
            k, b_, imp = kbi(model, con.solref[sl], con.solimp[sl], pos_c)
            r_n = jnp.maximum(
                (1.0 - imp) / jnp.maximum(imp, MINVAL) * iw_t, MINVAL
            )

            # all contact-frame axis rows: translational for dims 0..2,
            # rotational for dims 3..5 (torsion uses frame row 0)
            jn = jnp.einsum("ci,civ->cv", frame[:, 0], jp)  # (cnt, nv)
            axis_rows = [jn]
            for t in range(1, dim):
                if t < 3:
                    axis_rows.append(jnp.einsum("ci,civ->cv", frame[:, t], jp))
                else:
                    axis_rows.append(
                        jnp.einsum("ci,civ->cv", frame[:, t - 3], jr)
                    )

            nrows_per = dim if (elliptic or dim == 1) else 2 * (dim - 1)
            for c in range(cnt):
                con_efcadr[s0 + c] = row_cursor + c * nrows_per
                con_dim[s0 + c] = dim

            if dim == 1:
                vel = jnp.einsum("cv,v->c", jn, qvel)
                aref = -b_ * vel - k * imp * pos_c
                blk_J.append(jn)
                blk_pos.append(pos_c)
                blk_aref.append(aref)
                blk_R.append(r_n)
                blk_active.append(active)
                blk_type.extend([CONTACT_FRICTIONLESS] * cnt)
            elif not elliptic:
                # pyramidal facets: J = Jn ± mu_i * Jt_i, all with
                # R = Rn * 2*mu0^2*(1+mu0^2) (verified vs oracle)
                r_f = jnp.maximum(
                    (1.0 - imp)
                    / jnp.maximum(imp, MINVAL)
                    * iw_t * 2.0 * mu * mu * (1.0 + mu * mu),
                    MINVAL,
                )
                rows = []
                for t in range(1, dim):
                    mu_i = con.friction[sl, t - 1]
                    for s in (1.0, -1.0):
                        rows.append(axis_rows[0] + s * mu_i[:, None] * axis_rows[t])
                jblk = jnp.stack(rows, axis=1)  # (cnt, 2(dim-1), nv)
                vel = jnp.einsum("crv,v->cr", jblk, qvel)
                aref = -b_[:, None] * vel - (k * imp * pos_c)[:, None]
                nr = 2 * (dim - 1)
                blk_J.append(jblk.reshape(cnt * nr, nv))
                blk_pos.append(jnp.repeat(pos_c, nr))
                blk_aref.append(aref.reshape(-1))
                blk_R.append(jnp.repeat(r_f, nr))
                blk_active.append(jnp.repeat(active, nr))
                blk_type.extend([CONTACT_PYRAMIDAL] * (cnt * nr))
            else:
                # elliptic: normal row + friction rows
                jblk = jnp.stack(axis_rows, axis=1)  # (cnt, dim, nv)
                vel = jnp.einsum("crv,v->cr", jblk, qvel)
                aref = -b_[:, None] * vel
                aref = aref.at[:, 0].add(-k * imp * pos_c)
                mus = con.friction[sl, : dim - 1]  # (cnt, dim-1)
                r_f = jnp.maximum(
                    r_n[:, None]
                    * (mu * mu)[:, None]
                    / (mus * mus)
                    / model.opt.impratio,
                    MINVAL,
                )
                rblk = jnp.concatenate([r_n[:, None], r_f], axis=1)
                for c in range(cnt):
                    ell_start.append(row_cursor + c * dim)
                    ell_dim.append(dim)
                con_mu.append(mu / jnp.sqrt(model.opt.impratio))
                blk_J.append(jblk.reshape(cnt * dim, nv))
                blk_pos.append(jnp.repeat(pos_c, dim))
                blk_aref.append(aref.reshape(-1))
                blk_R.append(rblk.reshape(-1))
                blk_active.append(jnp.repeat(active, dim))
                blk_type.extend([CONTACT_ELLIPTIC] * (cnt * dim))
            row_cursor += cnt * nrows_per

    nefc = len(rows_type) + len(blk_type)
    if nefc == 0:
        z = jnp.zeros((0,), dtype=dtype)
        return Efc(
            J=jnp.zeros((0, nv), dtype=dtype),
            pos=z, aref=z, R=z, D=z, floss=z,
            active=jnp.zeros((0,), dtype=bool),
            con_mu=z,
            type=np.zeros(0, dtype=np.int32),
            is_fl=np.zeros(0, dtype=bool),
            is_bilateral=np.zeros(0, dtype=bool),
            ell_start=np.zeros(0, dtype=np.int32),
            ell_dim=np.zeros(0, dtype=np.int32),
            con_efcadr=con_efcadr,
            con_dim=con_dim,
        )

    # stitch ordered row blocks: [scalar eq rows | eq block] fl lim contacts
    J_p, pos_p, aref_p, R_p, fl_p, act_p = [], [], [], [], [], []

    def push(jb, pb, ab, rb, flb=None, actb=None):
        n = jb.shape[0]
        J_p.append(jb)
        pos_p.append(pb)
        aref_p.append(ab)
        R_p.append(rb)
        fl_p.append(flb if flb is not None else jnp.zeros(n, dtype=dtype))
        act_p.append(
            actb if actb is not None else jnp.ones(n, dtype=bool)
        )

    if rows_J:
        push(
            jnp.stack(rows_J), jnp.stack(rows_pos), jnp.stack(rows_aref),
            jnp.stack(rows_R), jnp.stack(rows_fl), jnp.stack(rows_active),
        )
    for (jb, pb, ab, rb) in eq_blocks:
        push(jb, pb, ab, rb)
    if fl_block is not None:
        jb, pb, ab, rb, flv = fl_block
        push(jb, pb, ab, rb, flb=flv)
    if lim_block is not None:
        jb, pb, ab, rb, actb = lim_block
        push(jb, pb, ab, rb, actb=actb)
    for i in range(len(blk_J)):
        push(blk_J[i], blk_pos[i], blk_aref[i], blk_R[i], actb=blk_active[i])

    J = jnp.concatenate(J_p)
    pos = jnp.concatenate(pos_p)
    aref = jnp.concatenate(aref_p)
    R = jnp.concatenate(R_p)
    floss = jnp.concatenate(fl_p)
    active = jnp.concatenate(act_p)
    type_arr = np.asarray(rows_type + blk_type, dtype=np.int32)

    return Efc(
        J=J,
        pos=pos,
        aref=aref,
        R=R,
        D=1.0 / R,
        floss=floss,
        active=active,
        con_mu=(
            jnp.concatenate([jnp.atleast_1d(m) for m in con_mu])
            if con_mu
            else jnp.zeros(0, dtype=dtype)
        ),
        type=type_arr,
        is_fl=type_arr == FRICTION_DOF,
        is_bilateral=type_arr == EQUALITY,
        ell_start=np.asarray(ell_start, dtype=np.int32),
        ell_dim=np.asarray(ell_dim, dtype=np.int32),
        con_efcadr=con_efcadr,
        con_dim=con_dim,
    )
