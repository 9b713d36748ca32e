"""Pallas TPU kernel: fused constraint ASSEMBLY + Newton solve.

`pallas_newton.py` removed the solver's HBM traffic but still consumes a
J matrix materialized by `constraint.make_constraint` in env-major layout —
building it (Jacobian einsums, row concatenation) and transposing it to the
kernel's env-last layout costs more than the solve itself (measured 9.6 ms
assembly + 3.2 ms transpose vs ~1 ms solve per forward at 4096 envs on v5e;
minor-dim transposes run at ~3 GB/s on this chip).

This kernel builds the constraint rows INSIDE the program, so J never exists
in HBM in any layout. Inputs are the small upstream quantities only: qpos,
qvel, cdof, the root subtree com, M, and the per-slot contact fields from
the collision driver. Row construction follows `constraint.make_constraint`
exactly (same order: JOINT-equality block, dof friction loss, joint limits,
contact facets; same kbi/impedance math — `constraint.py:64-100`), then the
shared `pallas_newton.solve_core` runs the Newton solve on the VMEM-resident
rows. Outputs: qacc, qfrc_constraint, and the per-row forces for the GRF
readout.

Supported (gated by `build_plan`): pyramidal cone, every contact slot
condim 3, active equalities all JOINT-type, single kinematic tree, all
constraint-relevant model leaves concrete (domain randomization of those
leaves falls back to the XLA path). This covers the full humanoid/robot
suite; A1's elliptic cones keep the XLA path.

The XLA implementation remains the reference; parity is asserted in
tests/test_pallas_newton.py via interpret mode.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..core.types import ConeType, DisableBit, EqType, IntegratorType, Model
from . import pallas_layout as play
from . import pallas_newton as pn
from .constraint import MINVAL, MINIMP, MAXIMP
from .support import dof_body_mask

_BE = pn._BE


def _conc(x):
    """Concrete numpy value, or None if traced."""
    if isinstance(x, np.ndarray):
        return x
    if isinstance(x, (int, float)):
        return np.asarray(x)
    try:
        return np.asarray(x)
    except Exception:
        return None


class RowPlan:
    """Static row layout + host-side tables for the fused kernel."""

    def __init__(self, model: Model, con_dim, ncon):
        self.ok = False
        # convex GJK/EPA groups (slot-layout tail, staged-driver-only)
        # are censored from every Pallas plan BEFORE any dims checks:
        # the in-kernel collision stages do not produce them, so the
        # solve sizes to the classic prefix and their efc_force slots
        # read back as zero
        from .collision import classic_ncon

        cn = classic_ncon(model)
        if ncon > cn:
            ncon = cn
            con_dim = np.asarray(con_dim)[:cn]
        opt = model.opt
        self.elliptic = bool(ncon) and opt.cone == int(ConeType.ELLIPTIC)
        dims = [int(d) for d in np.asarray(con_dim)] if ncon else []
        if self.elliptic:
            # elliptic cones (A1): any MuJoCo condim; dim rows per slot
            if any(d not in (1, 3, 4, 6) for d in dims):
                return
        elif ncon and any(d != 3 for d in dims):
            return
        roots = np.asarray(model.body_rootid)
        if roots[1:].size and not np.all(roots[1:] == roots[1]):
            return
        disabled = bool(opt.disableflags & DisableBit.CONSTRAINT)
        if disabled:
            return  # rare config; keep the XLA path

        # all model leaves the assembly reads must be compile-time constants
        need = [
            model.qpos0, model.jnt_range, model.jnt_margin, model.jnt_solref,
            model.jnt_solimp, model.jnt_limited, model.jnt_qposadr,
            model.jnt_dofadr, model.dof_solref, model.dof_solimp,
            model.dof_frictionloss, model.dof_invweight0,
            model.body_invweight0, model.eq_type, model.eq_obj1id,
            model.eq_obj2id, model.eq_data, model.eq_solref, model.eq_solimp,
            model.eq_active0, opt.timestep, opt.impratio,
        ]
        vals = [_conc(x) for x in need]
        if any(v is None for v in vals):
            return
        (qpos0, jnt_range, jnt_margin, jnt_solref, jnt_solimp, jnt_limited,
         jnt_qposadr, jnt_dofadr, dof_solref, dof_solimp, dof_floss,
         dof_iw, body_iw, eq_type, eq_obj1, eq_obj2, eq_data, eq_solref,
         eq_solimp, eq_active0, timestep, impratio) = vals

        self.timestep = float(timestep)
        self.refsafe = not (opt.disableflags & DisableBit.REFSAFE)
        # python floats: np scalars would trigger f64 promotion in-kernel
        self.qpos0 = [float(x) for x in qpos0]

        # --- JOINT equalities (order-preserving block) ---
        eq_ids = (
            [e for e in range(model.neq) if eq_active0[e]]
            if not (opt.disableflags & DisableBit.EQUALITY)
            else []
        )
        if any(int(eq_type[e]) != int(EqType.JOINT) for e in eq_ids):
            return  # CONNECT/WELD: XLA path
        self.eq = []
        for e in eq_ids:
            j1 = int(eq_obj1[e])
            j2r = int(eq_obj2[e])
            valid2 = 0 <= j2r < model.njnt and j2r != j1
            j2 = j2r if valid2 else j1
            self.eq.append(dict(
                q1=int(jnt_qposadr[j1]), v1=int(jnt_dofadr[j1]),
                q2=int(jnt_qposadr[j2]), v2=int(jnt_dofadr[j2]),
                m2=1.0 if valid2 else 0.0,
                data=[float(x) for x in eq_data[e, :5]],
                solref=[float(x) for x in eq_solref[e]],
                solimp=[float(x) for x in eq_solimp[e]],
                iw=float(dof_iw[int(jnt_dofadr[j1])])
                + (float(dof_iw[int(jnt_dofadr[j2])]) if valid2 else 0.0),
            ))

        # --- dof friction loss ---
        self.fl = []
        if not (opt.disableflags & DisableBit.FRICTIONLOSS):
            fl0 = _conc(model.dof_frictionloss0)
            if fl0 is None:
                return
            for v in np.nonzero(fl0 > 0)[0]:
                self.fl.append(dict(
                    v=int(v),
                    solref=[float(x) for x in dof_solref[v]],
                    solimp=[float(x) for x in dof_solimp[v]],
                    floss=float(dof_floss[v]),
                    iw=float(dof_iw[v]),
                ))

        # --- joint limits ---
        self.lim = []
        if not (opt.disableflags & DisableBit.LIMIT):
            for j in np.nonzero(jnt_limited)[0]:
                v = int(jnt_dofadr[j])
                self.lim.append(dict(
                    q=int(jnt_qposadr[j]), v=v,
                    lo=float(jnt_range[j, 0]), hi=float(jnt_range[j, 1]),
                    margin=float(jnt_margin[j]),
                    solref=[float(x) for x in jnt_solref[j]],
                    solimp=[float(x) for x in jnt_solimp[j]],
                    iw=float(dof_iw[v]),
                ))

        self.ncon = int(ncon) if not (
            opt.disableflags & DisableBit.CONTACT
        ) else 0
        self.nv = model.nv
        self.nq = model.nq
        self.na = model.na
        self.ne = len(self.eq)
        self.nfl = len(self.fl)
        self.nl = len(self.lim)
        self.impratio = float(impratio)
        # rows per slot: dim-3 pyramid = 4 facets; elliptic = dim rows;
        # frictionless (dim 1) = 1 unilateral row
        self.con_dims = dims[: self.ncon]
        self.rows_per = [
            1 if d == 1 else (d if self.elliptic else 4)
            for d in self.con_dims
        ]
        self.ncrow = sum(self.rows_per)
        # pad the bilateral/friction-loss/limit block to a SUBLANE multiple
        # with inert rows (J = 0, act = 0): row-class boundaries at
        # non-multiple-of-8 row offsets make every contact-row slice a
        # sublane-offset tile, and Mosaic's shape-invariant-numerics mode
        # rejects float ADD-reductions over offset operands once the tiles
        # get big (G1, 64 contact slots: s0 % 8 == 3 -> hard compile
        # error). Inert rows contribute exactly zero everywhere (act
        # gates force/cost/Hessian; J rows are zero).
        self.npad = (8 - (self.ne + self.nfl + self.nl) % 8) % 8
        self.nrows = (
            self.ne + self.nfl + self.nl + self.npad + self.ncrow
        )
        if self.nrows == 0:
            return
        import os as _os0

        if (self.nrows > int(_os0.environ.get("LMT_MAX_PYR_ROWS", "400"))
                and not self.elliptic):
            # beyond ~280 rows the fused pyramidal kernel is impractical:
            # G1 (320 rows, nv=29) hits a Mosaic shape-invariant-numerics
            # lowering rejection (sublane-offset ADD-reduction) and, with
            # LMT_SHAPE_INVARIANT=0, >25 min Mosaic compiles. Such models
            # take the standalone Newton-solve kernel path instead
            # (pallas_newton._solve_batched; G1: 303.5 ms/step at 4096).
            return
        if self.elliptic and (self.nrows > 320 or model.nv > 24):
            # hard cap alongside the estimate below: models past the
            # validated envelope (A1: 306 rows, nv=18) keep the XLA path
            # instead of risking a tpu_compile_helper crash.
            return
        # elliptic: gate on a scoped-VMEM estimate — J tiles + row
        # quantities + Hessian/Cholesky + rank-1 tiles + double-buffered
        # inputs, f32 at BE=128 lanes. The raw term count underestimates
        # Mosaic's live-range peak by ~3.3x (A1 estimate 8.4 MB vs 27.4 MB
        # observed scoped allocation), hence the calibration factor. The
        # budget is the compiler's scoped limit, raised per-executable via
        # jax.jit(..., compiler_options=utils.tpu.tpu_compiler_options())
        # (bench and the shipped training/replay entry points all do;
        # LMT_SCOPED_VMEM_KIB mirrors the value for this gate). Interpret
        # mode (CPU kernel-parity tests) has no scoped VMEM at all.
        est = 4 * _BE * (
            self.nrows * (model.nv + 14)
            + 3 * model.nv * model.nv
            + (2 * self.ncon * model.nv if self.elliptic else 0)
            + self.ncon * 32
            + model.nbody * 20
            + 8 * model.nv
        )
        if self.elliptic:
            est = int(est * 3.3)
        else:
            # pyramidal/limits calibration (axis-form kernel): Mosaic's
            # live-range peak over the raw term count, measured on-chip at
            # S=8 on the humanoid/H1/Atlas family
            est = int(est * 2.2)
        self.est_bytes = est  # per 128-env lane block (S = 1)
        import os as _os

        limit_kib = int(_os.environ.get("LMT_SCOPED_VMEM_KIB", "81920"))
        if est > (limit_kib * 1024) * 0.95 and not pn._INTERPRET:
            return

        # dof chain table for in-kernel mask construction
        self.dofmask = dof_body_mask(model).astype(np.float64)  # (nbody, nv)
        self.nbody = model.nbody
        self.body_iw = [float(x) for x in body_iw[:, 0]]
        self.root = int(roots[1]) if model.nbody > 1 else 0

        # in-kernel CRB: bottom-up subtree order + static tree tables (the
        # XLA crb + the qM relayout cost more than building M from cinert
        # inside the kernel)
        parent = [int(b) for b in np.asarray(model.body_parentid)]
        self.body_parent = parent
        self.topo_rev = sorted(range(1, model.nbody), reverse=True)
        # children always have larger ids than parents in put_model's
        # ordering; verify, else fall back to an explicit topological sort
        ok_order = all(parent[b] < b for b in range(1, model.nbody))
        if not ok_order:
            order, seen = [], {0}
            pending = list(range(1, model.nbody))
            while pending:
                for b in list(pending):
                    if parent[b] in seen:
                        order.append(b)
                        seen.add(b)
                        pending.remove(b)
            self.topo_rev = list(reversed(order))
        self.dof_bodyid = [int(b) for b in np.asarray(model.dof_bodyid)]
        self.anc = np.asarray(model.dof_ancestor_mask, dtype=bool)

        # static Efc-compatible metadata (for GRF row extraction)
        base = self.ne + self.nfl + self.nl + self.npad
        adr = base
        efcadr = []
        for r in self.rows_per:
            efcadr.append(adr)
            adr += r
        self.con_efcadr = np.asarray(efcadr, dtype=np.int32)
        self.con_dim = np.asarray(self.con_dims, dtype=np.int32)

        # elliptic runs: contiguous equal-dim slots with dim >= 3, as
        # (row_start, n_contacts, dim) for the solver's cone-zone pass
        self.ell_runs = []
        if self.elliptic:
            i = 0
            while i < self.ncon:
                d = self.con_dims[i]
                j = i
                while j < self.ncon and self.con_dims[j] == d:
                    j += 1
                if d >= 3:
                    self.ell_runs.append((int(efcadr[i]), j - i, d))
                i = j
        self.ell_runs = tuple(self.ell_runs)

        # elliptic fast/full branch subset: plane-SPHERE groups (point
        # feet — the gait-bearing contacts) in full plus the top
        # LMT_FAST_RANKS_ELL depth-ranked pairs of plane top-k groups;
        # other groups (leg cylinders, trunk boxes, self-collision pairs)
        # only activate in falls, which take the full branch. A1: 12 of
        # 76 slots / 60 of 306 rows on the fast branch.
        self.ell_fast = None
        if self.elliptic and self.ncon:
            try:
                self._build_ell_fast(model)
            except Exception:
                self.ell_fast = None

        # --- in-kernel Euler implicit damping ----------------------------
        # Euler models (A1, H1, muscle humanoids) need qM only for the
        # integrator's (M + h diag(damping))^-1 (M qacc) solve; the kernel
        # already holds M in VMEM, so it emits that dv directly and the
        # XLA CRB + factorization chain drops out of the step entirely.
        # Traced damping (domain randomization) falls back to the XLA path
        # for the damping solve (qM kept upstream).
        self.euler_dv = False
        self.dof_damping = None
        if opt.integrator == int(IntegratorType.EULER) and not (
            opt.disableflags & DisableBit.EULERDAMP
        ):
            dd = _conc(model.dof_damping)
            if dd is not None:
                self.dof_damping = [float(x) for x in dd]
                self.euler_dv = True

        # --- in-kernel smooth stage --------------------------------------
        # XLA compiles the com/cinert/cdof/RNE stages of torque-motor
        # models with T(1,128) tilings (1 sublane per tile, 1/8 VPU rate;
        # measured ~100 ms/step of the H1 Euler step at 4096 envs). With
        # no tendons and no activation states the whole smooth stage is
        # static-table scalar math the kernel runs from FK outputs.
        self.smooth = False
        self.smooth_mu = False
        try:
            self._build_smooth(model, opt)
        except Exception:
            self.smooth = False

        # --- uniform contact statics -------------------------------------
        # Every shipped robot collides against ONE static world plane with
        # identical pair solref/solimp/margin across all candidate pairs.
        # When that holds, the per-slot contact frame, kbi parameters,
        # margin and the geom1 body are compile-time constants — the
        # dynamic per-slot data shrinks from 26 floats to pos(3)+dist(1)+
        # bodyid2(1) [+friction(2) when pair friction varies], which is
        # most of the kernel-input relayout traffic.
        self.uniform = False
        if self.ncon and not self.elliptic:
            try:
                self._check_uniform(model)
            except Exception:
                self.uniform = False

        # --- mega: FK + collision in kernel -------------------------------
        # One Pallas program runs the ENTIRE forward: FK -> plane-box +
        # plane-mesh collision -> smooth stage -> assembly -> Newton. The
        # only per-forward XLA work left is the integrator update. Gated on
        # the smooth+uniform envelope plus static FK/collision tables
        # (pallas_fk.FkPlan/ColPlan raise on anything unsupported).
        self.mega = False
        self.mp = None
        if (self.uniform and self.fric_uniform
                and not self.elliptic and self.ncon):
            try:
                from . import pallas_fk as pfk

                if not self.smooth:
                    # muscle variant: same smooth tables (tendon-muscle
                    # actuators handled by the MusclePlan block)
                    self._build_smooth(model, model.opt, allow_muscle=True)
                    if not self.smooth_mu:
                        raise ValueError("smooth tables unavailable")
                    self.mp = pfk.MusclePlan(model, _conc)
                self.fkp = pfk.FkPlan(model, _conc)
                self.colp = pfk.ColPlan(model, _conc)
                if self.colp.ncon != self.ncon:
                    raise ValueError("slot count mismatch")
                # the mega kernel keeps EVERY bucket table VMEM-resident
                # (the standalone select kernel pipelines pairs-per-program
                # instead); high-degree hulls (H1 feet: D=98, V=1020) can
                # exceed the budget — fall back to the staged path there
                tbl_bytes = sum(
                    int(np.prod(s[1][1])) * 4
                    for grp in self.colp.groups if grp["kind"] == "mesh"
                    for s in grp["subs"]
                )
                if tbl_bytes > 24 * 1024 * 1024:
                    raise ValueError("mesh tables exceed mega VMEM budget")
                self.mega_tbl_bytes = tbl_bytes
                self.mega = True
                # fast/full branch specialization: the solve runs over a
                # REDUCED static slot subset (all slots of k==P groups +
                # the top LMT_FAST_RANKS depth-ranked pairs of top-k
                # groups) whenever no env in the block has an
                # outside-subset slot active — excluded inactive rows
                # contribute exactly zero to cost/forces/Hessian, so the
                # solution is identical up to summation order. Walking
                # gaits keep only the deepest-ranked pairs in contact, so
                # the reduced branch is the steady-state path.
                import os as _os

                rmax = int(_os.environ.get("LMT_FAST_RANKS", "2"))
                fast = []
                off = 0
                for grp in self.colp.groups:
                    gk, slots = grp["k"], grp["slots"]
                    ranks = gk if gk == len(grp["pairs"]) else min(rmax, gk)
                    for r in range(ranks):
                        fast.extend(
                            off + r * slots + s for s in range(slots)
                        )
                    off += gk * slots
                self.mega_fast = (
                    sorted(fast) if 0 < len(fast) < self.ncon else None
                )
                if _os.environ.get("LMT_FAST_BRANCH", "1") == "0":
                    self.mega_fast = None
            except Exception:
                self.mega = False
                self.smooth_mu = False
                self.mp = None

        # --- mega-ell: FK + ALL-analytic-group collision in kernel -------
        # The elliptic (A1-class) variant: groups need not be plane-only
        # or statics-uniform across groups — per-GROUP uniform pair params
        # suffice (ColPlanExt validates). The kernel builds the generic
        # contact pack in VMEM and the untouched generic row build
        # consumes it, eliminating the staged XLA collision driver + the
        # (E, ncon, 29) pack relayout (~75 of A1's 219 ms/step at 4096).
        self.mega_ell = False
        if (not self.mega) and self.ncon and self.smooth:
            try:
                from . import pallas_fk as pfk

                self.fkp = pfk.FkPlan(model, _conc)
                self.colp = pfk.ColPlanExt(model, _conc)
                if self.colp.ncon != self.ncon:
                    raise ValueError("slot count mismatch")
                tbl_bytes = sum(
                    # (Pb, R, V) table + its (Pb, V, 3) transpose
                    int(np.prod(sub[1][1])) * 4
                    + int(sub[1][1][0] * sub[1][1][2] * 3) * 4
                    for grp in self.colp.groups
                    if grp["kind"][1] == "mesh"
                    for sub in grp["subs"]
                )
                if tbl_bytes > 48 * 1024 * 1024:
                    raise ValueError("mesh tables exceed mega VMEM budget")
                self.mega_tbl_bytes = tbl_bytes
                self.mega = True
                self.mega_ell = True  # "ext" outputs: force rows + gids
                self.mp = None
                self.mega_fast = None  # branch spec: ell_fast on cp rows
            except Exception:
                self.mega_ell = False
        self.ok = True

    def _build_ell_fast(self, model: Model):
        import os as _os

        from ..core.types import GeomType
        from .collision import contact_groups

        if _os.environ.get("LMT_ELL_FAST", "1") == "0":
            return
        from .collision import classic_ncon

        rmax = int(_os.environ.get("LMT_FAST_RANKS_ELL", "4"))
        groups, total, _ = contact_groups(model)
        if classic_ncon(model) != self.ncon:
            return
        fast = []
        for g in groups:
            if int(g.t1) != int(GeomType.PLANE):
                continue
            if int(g.t2) == int(GeomType.SPHERE):
                ranks = g.k
            elif g.k < len(g.pair_ids):
                ranks = min(rmax, g.k)
            else:
                continue
            for r in range(ranks):
                fast.extend(
                    g.offset + r * g.slots + s for s in range(g.slots)
                )
        fast = sorted(fast)
        if 0 < len(fast) < self.ncon:
            self.ell_fast = fast

    def _build_smooth(self, model: Model, opt, allow_muscle=False):
        """Static tables for the in-kernel smooth stage (com, cinert,
        cdof, RNE bias, joint springs/dampers, motor actuation, xfrc
        projection). Mirrors kinematics.com_pos + velocity.com_vel/rne +
        passive.passive + actuation.actuation for models with no tendons,
        no activation states, joint-transmission actuators and
        fixed/affine gain/bias — the full torque-robot family. Leaves it
        off (self.smooth False) on any unsupported feature or traced
        (domain-randomized) leaf.

        allow_muscle: the MEGA-only muscle variant — tendon-transmission
        MUSCLE actuators (and their activation states) are handled by a
        separate in-kernel tendon/muscle block (pallas_fk.MusclePlan), so
        they're skipped here rather than rejected; sets `smooth_mu`
        instead of `smooth` so the STAGED pipeline's smooth gates (which
        would skip the tendon stage) are untouched."""
        from ..core.types import BiasType, DynType, GainType, JointType, TrnType

        if not allow_muscle and (model.ntendon or model.na):
            return
        # (no fluid-force gate needed: the engine models none — all robot
        # XMLs have density = viscosity = 0; see ops/passive.py)
        need = [
            model.body_mass, model.body_inertia, model.jnt_type,
            model.jnt_qposadr, model.jnt_dofadr, model.jnt_stiffness,
            model.qpos_spring, model.dof_armature,
            opt.gravity, model.body_jntadr, model.body_jntnum,
            model.jnt_bodyid, model.dof_bodyid,
        ]
        vals = [_conc(x) for x in need]
        if any(v is None for v in vals):
            return
        (mass, inertia, jtype, jqadr, jdadr, jstiff, qspring,
         armature, gravity, bjadr, bjnum, jbody, dbody) = vals
        # traced damping (domain randomization of joint damping — the
        # reference DR config's main knob) rides as PER-ENV KERNEL
        # OPERAND rows appended to the packed vec instead of gating the
        # whole smooth specialization (and with it the mega path) off:
        # that gate cost the DR flagship a 3.7x slowdown (52k steps/s)
        damping = _conc(model.dof_damping)
        self.sm_dyn_damping = damping is None
        if self.sm_dyn_damping:
            damping = np.zeros(model.nv)

        nu = model.nu
        acts = []
        if nu:
            aneed = [
                model.actuator_trntype, model.actuator_trnid,
                model.actuator_gaintype, model.actuator_biastype,
                model.actuator_dyntype, model.actuator_gear,
                model.actuator_gainprm, model.actuator_biasprm,
                model.actuator_ctrlrange, model.actuator_ctrllimited,
                model.actuator_forcerange, model.actuator_forcelimited,
            ]
            avals = [_conc(x) for x in aneed]
            if any(v is None for v in avals):
                return
            (trn, trnid, gt, bt, dyn, gear, gp, bp, cr, cl, fr, fl2) = avals
            for u in range(nu):
                if allow_muscle and int(trn[u]) == int(TrnType.TENDON):
                    continue  # MusclePlan covers tendon-muscle actuators
                if int(trn[u]) not in (
                    int(TrnType.JOINT), int(TrnType.JOINTINPARENT)
                ):
                    return
                if int(gt[u]) not in (int(GainType.FIXED),
                                      int(GainType.AFFINE)):
                    return
                if int(bt[u]) not in (int(BiasType.NONE),
                                      int(BiasType.AFFINE)):
                    return
                if int(dyn[u]) != int(DynType.NONE):
                    return
                j = int(trnid[u, 0])
                acts.append(dict(
                    u=u,  # ACTUATOR index (ctrl slot) — differs from the
                    # sm_acts position when muscle actuators are skipped
                    q=int(jqadr[j]), v=int(jdadr[j]),
                    gear=float(gear[u, 0]),
                    gain=[float(x) for x in gp[u, :3]],
                    g_affine=int(gt[u]) == int(GainType.AFFINE),
                    bias=[float(x) for x in bp[u, :3]],
                    b_affine=int(bt[u]) == int(BiasType.AFFINE),
                    clo=float(cr[u, 0]) if cl[u] else None,
                    chi=float(cr[u, 1]) if cl[u] else None,
                    flo=float(fr[u, 0]) if fl2[u] else None,
                    fhi=float(fr[u, 1]) if fl2[u] else None,
                ))

        nb, nv, njnt = model.nbody, model.nv, model.njnt
        self.sm_mass = [float(m) for m in mass]
        self.sm_inertia = [[float(x) for x in inertia[b]] for b in range(nb)]
        self.sm_mtot = max(float(np.sum(mass[1:])), MINVAL)
        # per body, joints in order; each hinge/slide joint owns one dof
        self.sm_body_joints = [
            [
                dict(
                    j=j, d=int(jdadr[j]), q=int(jqadr[j]),
                    hinge=int(jtype[j]) == int(JointType.HINGE),
                )
                for j in range(int(bjadr[b]), int(bjadr[b]) + int(bjnum[b]))
            ]
            for b in range(nb)
        ]
        # forward traversal must see parents first
        order, seen = [], {0}
        pending = list(range(1, nb))
        while pending:
            for b in list(pending):
                if self.body_parent[b] in seen:
                    order.append(b)
                    seen.add(b)
                    pending.remove(b)
        self.sm_topo_fwd = order
        self.sm_jnt_spring = [
            dict(q=int(jqadr[j]), d=int(jdadr[j]), k=float(jstiff[j]),
                 ref=float(qspring[int(jqadr[j])]))
            for j in range(njnt) if float(jstiff[j]) != 0.0
        ]
        self.sm_damping = [float(x) for x in damping]
        self.sm_armature = [float(x) for x in armature]
        g = np.asarray(gravity, dtype=np.float64)
        if opt.disableflags & DisableBit.GRAVITY:
            g = np.zeros(3)
        self.sm_gravity = [float(x) for x in g]
        self.sm_acts = acts
        self.sm_njnt = njnt
        self.sm_nu = nu
        self.sm_passive_on = not (opt.disableflags & DisableBit.PASSIVE)
        self.sm_actuation_on = not (opt.disableflags & DisableBit.ACTUATION)
        self.sm_clampctrl = not (opt.disableflags & DisableBit.CLAMPCTRL)
        if allow_muscle:
            self.smooth_mu = True
        else:
            self.smooth = True

    def _check_uniform(self, model: Model):
        from .collision import contact_groups

        groups, _, _ = contact_groups(model)
        g1s = set()
        for g in groups:
            if g.convex:  # staged-driver tail groups: not in-kernel
                continue
            if int(g.t1) != 0:  # not plane-first
                return
            g1 = np.asarray(model.pair_geom1)[g.pair_ids]
            g1s.update(g1.tolist())
        if len(g1s) != 1:
            return
        gid = g1s.pop()
        if int(model.geom_bodyid[gid]) != 0:
            return  # plane must be on the static world body
        if self.body_iw[0] != 0.0:
            return  # world invweight folds out of iw_t only when zero
        sref = _conc(model.pair_solref)
        simp = _conc(model.pair_solimp)
        marg = _conc(model.pair_margin)
        gap = _conc(model.pair_gap)
        fric = _conc(model.pair_friction)
        gq = _conc(model.geom_quat)
        if any(v is None for v in (sref, simp, marg, gap, fric, gq)):
            return
        if not (
            np.all(sref == sref[0]) and np.all(simp == simp[0])
            and np.all(marg == marg[0]) and np.all(gap == gap[0])
        ):
            return
        self.c_solref = [float(x) for x in sref[0]]
        self.c_solimp = [float(x) for x in simp[0]]
        self.c_margin = float(marg[0] - gap[0])
        self.fric_uniform = bool(np.all(fric[:, :2] == fric[0, :2]))
        self.c_fric = [float(fric[0, 0]), float(fric[0, 1])]
        self.c_fric5 = [float(x) for x in fric[0]]
        # static world-frame plane normal -> static contact frame. Pure
        # numpy: this runs inside an active jit trace (the plan is built on
        # first forward), where launching eager jnp ops is not allowed.
        w, xq, yq, zq = (float(v) for v in gq[gid])
        qn = (w * w + xq * xq + yq * yq + zq * zq) ** 0.5
        w, xq, yq, zq = w / qn, xq / qn, yq / qn, zq / qn
        # third column of the rotation matrix = plane normal
        n = np.array([
            2 * (xq * zq + w * yq),
            2 * (yq * zq - w * xq),
            1 - 2 * (xq * xq + yq * yq),
        ])
        # mju_makeFrame convention (collision.make_frame)
        ref = (
            np.array([0.0, 1.0, 0.0])
            if abs(n[1]) < 0.5
            else np.array([0.0, 0.0, 1.0])
        )
        t1 = ref - n * float(np.dot(n, ref))
        t1 = t1 / np.linalg.norm(t1)
        t2 = np.cross(n, t1)
        f = np.stack([n, t1, t2])  # (3, 3) rows n, t1, t2
        self.c_frame = [[float(x) for x in row] for row in f]
        # candidate geom2 -> body map: slot geom ids are passed to the
        # kernel RAW and mapped to bodies by static one-hot compares there
        # (an XLA gather geom_bodyid[geom2] lowers to a scalar-unit loop
        # costing 13 ms/step at 4096 envs)
        g2s = sorted(
            set(
                int(g)
                for grp in groups
                for g in np.asarray(model.pair_geom2)[grp.pair_ids]
            )
        )
        self.body_geoms = {}  # body -> [geom ids]
        for g in g2s:
            b = int(model.geom_bodyid[g])
            self.body_geoms.setdefault(b, []).append(g)
        self.uniform = True

    def pick_s(self, E):
        """Env sublane rows S for the grouped (S, 128) block layout: the
        largest power of two <= 8 whose scoped-VMEM footprint fits the
        budget (per-env scalar chains — Cholesky, tree ops, line-search
        scalars — run S x denser on the VPU's 8 sublanes). Override with
        LMT_ENV_SUBLANES."""
        import os as _os

        s_max = int(_os.environ.get("LMT_ENV_SUBLANES", "8"))
        s = max(1, min(s_max, (E + 127) // 128))
        s = 1 << (s.bit_length() - 1)
        budget = int(
            _os.environ.get("LMT_SCOPED_VMEM_KIB", "81920")
        ) * 1024 * 0.95
        while s > 1 and self.est_bytes * s > budget:
            s //= 2
        return s

    def use_grouped(self, E):
        """Layout choice, measured on v5e at 4096 envs: the 2D lanes
        layout packs 8 ROWS per (8, 128) tile, so row-space ops (the bulk
        of the pyramidal kernel) run at full sublane density — grouped
        S=8 measured 99.1 ms/step vs 89.9 lanes on HumanoidTorque.run.
        The elliptic kernel is dominated by per-env scalar chains (nv-
        unrolled Cholesky, cone zones, rank-1 rows) and wins from env
        grouping instead: A1 392.5 lanes -> 323.5 grouped S=2. Override
        with LMT_FUSED_GROUPED=0/1."""
        import os as _os

        ov = _os.environ.get("LMT_FUSED_GROUPED")
        if ov is not None:
            return ov != "0" and self.pick_s(E) > 1
        return self.elliptic and self.pick_s(E) > 1

    @property
    def nfric(self):
        """Friction components packed per slot (5 covers condim-6 elliptic
        torsional+rolling rows; pyramidal dim-3 needs only the 2 sliding)."""
        return 5 if self.elliptic else 2

    @property
    def pack_w(self):
        """Width of the packed per-slot contact input."""
        if not self.ncon:
            return 1
        if self.uniform:
            return 5 + (0 if self.fric_uniform else 2)
        return 24 + self.nfric


_PLAN_CACHE: dict = {}


def get_plan(model: Model, contact):
    ncon = contact.dist.shape[0] if contact is not None else 0
    dims = tuple(int(d) for d in np.asarray(contact.dim)) if ncon else ()
    try:
        key = (
            model.body_parentid.tobytes(), model.nv,
            np.asarray(model.jnt_range).tobytes(),
            np.asarray(model.dof_frictionloss).tobytes()
            if _conc(model.dof_frictionloss) is not None else None,
            int(model.opt.cone), float(model.opt.timestep),
            float(model.opt.impratio),
            int(model.opt.disableflags), dims,
            # DR plans differ structurally (damping as operand rows)
            _conc(model.dof_damping) is None,
        )
    except Exception:
        return None
    if key not in _PLAN_CACHE:
        try:
            _PLAN_CACHE[key] = RowPlan(model, np.asarray(dims), ncon)
        except Exception:
            _PLAN_CACHE[key] = None
    plan = _PLAN_CACHE[key]
    return plan if (plan is not None and plan.ok) else None


# ---------------------------------------------------------------------------
# in-kernel scalar helpers (static solref/solimp)
# ---------------------------------------------------------------------------
def _impedance_static(si, pos):
    dmin = min(max(si[0], MINIMP), MAXIMP)
    dmax = min(max(si[1], MINIMP), MAXIMP)
    width, mid, power = si[2], min(max(si[3], MINIMP), MAXIMP), max(si[4], 1.0)
    x = jnp.clip(jnp.abs(pos) / max(width, MINVAL), 0.0, 1.0)
    lo = jnp.power(x, power) / (mid ** (power - 1.0))
    hi = 1.0 - jnp.power(1.0 - x, power) / ((1.0 - mid) ** (power - 1.0))
    y = jnp.where(x < mid, lo, hi)
    return jnp.clip(dmin + y * (dmax - dmin), MINIMP, MAXIMP)


def _kbi_static(plan, sr, si, pos):
    """k, b, imp with compile-time solref/solimp (pos traced)."""
    imp = _impedance_static(si, pos)
    dmax = min(max(si[1], MINIMP), MAXIMP)
    tc, dr = sr[0], sr[1]
    if plan.refsafe:
        tc = max(tc, 2.0 * plan.timestep)
    if sr[0] <= 0 or sr[1] <= 0:  # direct spec
        k = -sr[0] / max(dmax * dmax, MINVAL)
        b = -sr[1] / max(dmax, MINVAL)
        return k, b, imp
    k = 1.0 / max(dmax * dmax * tc * tc * dr * dr, MINVAL)
    b = 2.0 / max(dmax * tc, MINVAL)
    return k, b, imp


def _impedance_dyn(si, pos):
    """si (ncon, 5, E) traced, pos (ncon, E)."""
    dmin = jnp.clip(si[:, 0, :], MINIMP, MAXIMP)
    dmax = jnp.clip(si[:, 1, :], MINIMP, MAXIMP)
    width = jnp.maximum(si[:, 2, :], MINVAL)
    mid = jnp.clip(si[:, 3, :], MINIMP, MAXIMP)
    power = jnp.maximum(si[:, 4, :], 1.0)
    x = jnp.clip(jnp.abs(pos) / width, 0.0, 1.0)
    lo = jnp.power(x, power) / jnp.power(mid, power - 1.0)
    hi = 1.0 - jnp.power(1.0 - x, power) / jnp.power(1.0 - mid, power - 1.0)
    y = jnp.where(x < mid, lo, hi)
    return jnp.clip(dmin + y * (dmax - dmin), MINIMP, MAXIMP)


def _kbi_dyn(plan, sr, si, pos):
    """sr (ncon, 2, E), si (ncon, 5, E), pos (ncon, E) — all traced."""
    imp = _impedance_dyn(si, pos)
    dmax = jnp.clip(si[:, 1, :], MINIMP, MAXIMP)
    sr0 = sr[:, 0, :]
    sr1 = sr[:, 1, :]
    tc = sr0
    if plan.refsafe:
        tc = jnp.maximum(tc, 2.0 * plan.timestep)
    k_std = 1.0 / jnp.maximum(dmax * dmax * tc * tc * sr1 * sr1, MINVAL)
    b_std = 2.0 / jnp.maximum(dmax * tc, MINVAL)
    direct = (sr0 <= 0) | (sr1 <= 0)
    k = jnp.where(direct, -sr0 / jnp.maximum(dmax * dmax, MINVAL), k_std)
    b = jnp.where(direct, -sr1 / jnp.maximum(dmax, MINVAL), b_std)
    return k, b, imp


# ---------------------------------------------------------------------------
# in-kernel smooth stage (plan.smooth): com + cinert + cdof + RNE bias +
# passive + motor actuation + xfrc projection, all static-table scalar math
# on (BE,)/(S,128) env blocks. Mirrors kinematics.com_pos,
# velocity.com_vel/rne, passive.passive, actuation.actuation and
# forward._xfrc_projection exactly (those stay the XLA/CPU reference).
# ---------------------------------------------------------------------------
class _VpAcc:
    """FK-product accessors over the packed per-env vector (the smooth
    layout documented in _make_fused_kernel). The mega path provides the
    same interface from in-kernel FK results instead (_MegaAcc)."""

    def __init__(self, plan, vp):
        nq, nv, nb, njnt, nu = (
            plan.nq, plan.nv, plan.nbody, plan.sm_njnt, plan.sm_nu
        )
        self.vp = vp
        self.o_xip = nq + nv
        self.o_xim = self.o_xip + 3 * nb
        self.o_anc = self.o_xim + 9 * nb
        self.o_ax = self.o_anc + 3 * njnt
        self.o_ctrl = self.o_ax + 3 * njnt
        self.o_app = self.o_ctrl + nu
        self.o_xfrc = self.o_app + nv
        self.o_ws = self.o_xfrc + 6 * nb
        self.nv = nv

    def xip(self, b, k):
        return self.vp[self.o_xip + 3 * b + k]

    def xim(self, b, i, j):
        return self.vp[self.o_xim + 9 * b + 3 * i + j]

    def anch(self, j, k):
        return self.vp[self.o_anc + 3 * j + k]

    def jaxis(self, j, k):
        return self.vp[self.o_ax + 3 * j + k]

    def ctrl(self, u):
        return self.vp[self.o_ctrl + u]

    def app(self, d):
        return self.vp[self.o_app + d]

    def xfrc(self, b, i):
        return self.vp[self.o_xfrc + 6 * b + i]

    def ws_vec(self):
        return self.vp[self.o_ws:self.o_ws + self.nv]


class _MegaAcc:
    """Accessors for the mega path: FK products from in-kernel FK
    (pallas_fk.fk_env_block), the rest from the small packed vector
    [qpos qvel ctrl qfrc_applied xfrc ws]."""

    def __init__(self, plan, vp, fk, zero, ws_arr=None):
        from . import pallas_fk as pfk

        nq, nv, nb, nu = plan.nq, plan.nv, plan.nbody, plan.sm_nu
        self.vp = vp
        self.fk = fk
        self._mat = pfk.materialize
        self._zero = zero
        self.o_act = nq + nv
        self.o_ctrl = self.o_act + plan.na
        self.o_app = self.o_ctrl + nu
        self.o_xfrc = self.o_app + nv
        self.o_ws = self.o_xfrc + 6 * nb
        self.nv = nv
        self._ws_arr = ws_arr  # megastep loop: ws is a carried value

    def xip(self, b, k):
        return self._mat(self.fk.xipos[b][k], self._zero)

    def xim(self, b, i, j):
        return self._mat(self.fk.ximat[b][i][j], self._zero)

    def anch(self, j, k):
        return self._mat(self.fk.xanchor[j][k], self._zero)

    def jaxis(self, j, k):
        return self._mat(self.fk.xaxis[j][k], self._zero)

    def ctrl(self, u):
        return self.vp[self.o_ctrl + u]

    def app(self, d):
        return self.vp[self.o_app + d]

    def xfrc(self, b, i):
        return self.vp[self.o_xfrc + 6 * b + i]

    def ws_vec(self):
        if self._ws_arr is not None:
            return self._ws_arr
        return self.vp[self.o_ws:self.o_ws + self.nv]


def _smooth_preamble(plan: RowPlan, acc, qpos, qvel, zero, damp_rows=None):
    nv, nb, njnt, nu = (
        plan.nv, plan.nbody, plan.sm_njnt, plan.sm_nu
    )

    def xip(b, k):
        return acc.xip(b, k)

    def xim(b, i, j):
        return acc.xim(b, i, j)

    def anch(j, k):
        return acc.anch(j, k)

    def jaxis(j, k):
        return acc.jaxis(j, k)

    def cross(a, b):
        return (
            a[1] * b[2] - a[2] * b[1],
            a[2] * b[0] - a[0] * b[2],
            a[0] * b[1] - a[1] * b[0],
        )

    # --- root-subtree com (kinematics.com_pos; single tree: all real
    # bodies are in the root's subtree) ---
    inv_m = 1.0 / plan.sm_mtot
    com_l = []
    for k in range(3):
        s = zero
        for b in range(1, nb):
            m = plan.sm_mass[b]
            if m:
                s = s + m * xip(b, k)
        com_l.append(s * inv_m)

    # --- cinert: inertia about com, world axes (kinematics.iw) ---
    ci_list = []
    for b in range(nb):
        m = plan.sm_mass[b]
        Id = plan.sm_inertia[b]
        c = [xip(b, k) - com_l[k] for k in range(3)]
        c2 = c[0] * c[0] + c[1] * c[1] + c[2] * c[2]

        def iw(i, k, b=b, Id=Id, m=m, c=c, c2=c2):
            # Id entries are static floats; with the mega path xim entries
            # can be static too (e.g. the worldbody), so values may fold to
            # Python floats — materialize before stacking
            v = 0.0
            for a3 in range(3):
                if Id[a3]:
                    v = v + xim(b, i, a3) * Id[a3] * xim(b, k, a3)
            shift = m * ((c2 if i == k else 0.0) - c[i] * c[k])
            return v + shift

        def _m(x):
            return zero + x if isinstance(x, (int, float)) else x

        ci_list.append(jnp.stack([
            _m(iw(0, 0)), _m(iw(1, 1)), _m(iw(2, 2)),
            _m(iw(0, 1)), _m(iw(0, 2)), _m(iw(1, 2)),
            _m(m * c[0]), _m(m * c[1]), _m(m * c[2]), zero + m,
        ]))

    # --- cdof (kinematics.com_pos: hinge ang=axis, lin=axis x (com -
    # anchor); slide ang=0, lin=axis) ---
    dof_of = [None] * nv
    for b in range(nb):
        for jd in plan.sm_body_joints[b]:
            dof_of[jd["d"]] = jd
    cdof_tab = []
    for d in range(nv):
        jd = dof_of[d]
        j = jd["j"]
        ax = (jaxis(j, 0), jaxis(j, 1), jaxis(j, 2))
        if jd["hinge"]:
            off = tuple(com_l[k] - anch(j, k) for k in range(3))
            lin = cross(ax, off)
            cdof_tab.append([ax[0], ax[1], ax[2], lin[0], lin[1], lin[2]])
        else:
            cdof_tab.append([zero, zero, zero, ax[0], ax[1], ax[2]])

    # --- com_vel: cvel accumulation + cdof_dot = v_before x cdof
    # (velocity.com_vel: strict-ancestor velocity, in-body dof order) ---
    cvel = [None] * nb
    cvel[0] = [zero] * 6
    cdof_dot = [None] * nv
    for b in plan.sm_topo_fwd:
        v6 = list(cvel[plan.body_parent[b]])
        for jd in plan.sm_body_joints[b]:
            d = jd["d"]
            u = cdof_tab[d]
            ang = cross(v6[0:3], u[0:3])
            lin1 = cross(v6[0:3], u[3:6])
            lin2 = cross(v6[3:6], u[0:3])
            cdof_dot[d] = [
                ang[0], ang[1], ang[2],
                lin1[0] + lin2[0], lin1[1] + lin2[1], lin1[2] + lin2[2],
            ]
            qd = qvel[d]
            for i in range(6):
                v6[i] = v6[i] + u[i] * qd
        cvel[b] = v6

    # --- rne with zero acceleration (velocity.rne): bias force ---
    grav6 = [0.0, 0.0, 0.0] + [-g for g in plan.sm_gravity]
    cacc = [None] * nb
    cacc[0] = grav6
    for b in plan.sm_topo_fwd:
        a6 = list(cacc[plan.body_parent[b]])
        for jd in plan.sm_body_joints[b]:
            d = jd["d"]
            qd = qvel[d]
            for i in range(6):
                a6[i] = a6[i] + cdof_dot[d][i] * qd
        cacc[b] = a6

    def inert_mul(ci, v6):
        w = v6[0:3]
        vl = v6[3:6]
        iw0 = ci[0] * w[0] + ci[3] * w[1] + ci[4] * w[2]
        iw1 = ci[3] * w[0] + ci[1] * w[1] + ci[5] * w[2]
        iw2 = ci[4] * w[0] + ci[5] * w[1] + ci[2] * w[2]
        mc = (ci[6], ci[7], ci[8])
        m = ci[9]
        cxl = cross(mc, vl)
        cxw = cross(mc, w)
        return [
            iw0 + cxl[0], iw1 + cxl[1], iw2 + cxl[2],
            m * vl[0] - cxw[0], m * vl[1] - cxw[1], m * vl[2] - cxw[2],
        ]

    cfrc = []
    for b in range(nb):
        ia = inert_mul(ci_list[b], cacc[b])
        iv = inert_mul(ci_list[b], cvel[b])
        w = cvel[b][0:3]
        vl = cvel[b][3:6]
        ang1 = cross(w, iv[0:3])
        ang2 = cross(vl, iv[3:6])
        lin = cross(w, iv[3:6])
        cfrc.append([
            ia[0] + ang1[0] + ang2[0],
            ia[1] + ang1[1] + ang2[1],
            ia[2] + ang1[2] + ang2[2],
            ia[3] + lin[0], ia[4] + lin[1], ia[5] + lin[2],
        ])
    ctot = [list(f) for f in cfrc]
    for b in plan.topo_rev:  # subtree sums, children into parents
        p = plan.body_parent[b]
        for i in range(6):
            ctot[p][i] = ctot[p][i] + ctot[b][i]
    qbias = []
    for d in range(nv):
        f6 = ctot[plan.dof_bodyid[d]]
        s = cdof_tab[d][0] * f6[0]
        for i in range(1, 6):
            s = s + cdof_tab[d][i] * f6[i]
        qbias.append(s)

    # --- passive: joint springs + dof dampers (passive.passive) ---
    if plan.sm_passive_on:
        if damp_rows is not None:
            # domain-randomized damping: per-env operand rows (appended
            # to the packed vec) instead of static floats
            qpass = [-damp_rows[d] * qvel[d] for d in range(nv)]
        else:
            qpass = [-plan.sm_damping[d] * qvel[d] if plan.sm_damping[d]
                     else zero for d in range(nv)]
        for sp in plan.sm_jnt_spring:
            qpass[sp["d"]] = qpass[sp["d"]] - sp["k"] * (
                qpos[sp["q"]] - sp["ref"]
            )
    else:
        qpass = [zero] * nv

    # --- actuation: joint-transmission motors, fixed/affine gain/bias
    # (actuation.actuation with dyntype NONE) ---
    qact = [zero] * nv
    if plan.sm_actuation_on:
        for a in plan.sm_acts:
            c = acc.ctrl(a["u"])
            if plan.sm_clampctrl and a["clo"] is not None:
                c = jnp.clip(c, a["clo"], a["chi"])
            gain = a["gain"][0]
            bias = 0.0
            if a["g_affine"] or a["b_affine"]:
                ln = qpos[a["q"]] * a["gear"]
                vel = qvel[a["v"]] * a["gear"]
                if a["g_affine"]:
                    gain = gain + a["gain"][1] * ln + a["gain"][2] * vel
                if a["b_affine"]:
                    bias = a["bias"][0] + a["bias"][1] * ln \
                        + a["bias"][2] * vel
            f = gain * c + bias
            if a["flo"] is not None:
                f = jnp.clip(f, a["flo"], a["fhi"])
            qact[a["v"]] = qact[a["v"]] + a["gear"] * f

    # --- xfrc projection (forward._xfrc_projection) ---
    qx = [zero] * nv
    for b in range(1, nb):
        if not plan.dofmask[b].any():
            continue
        frc = (acc.xfrc(b, 0), acc.xfrc(b, 1), acc.xfrc(b, 2))
        trq = (acc.xfrc(b, 3), acc.xfrc(b, 4), acc.xfrc(b, 5))
        off = tuple(xip(b, k) - com_l[k] for k in range(3))
        oxf = cross(off, frc)
        te = (trq[0] + oxf[0], trq[1] + oxf[1], trq[2] + oxf[2])
        for d in range(nv):
            if not plan.dofmask[b, d]:
                continue
            u = cdof_tab[d]
            qx[d] = qx[d] + (
                u[0] * te[0] + u[1] * te[1] + u[2] * te[2]
                + u[3] * frc[0] + u[4] * frc[1] + u[5] * frc[2]
            )

    qfs_vec = jnp.stack([
        qpass[d] - qbias[d] + qact[d] + acc.app(d) + qx[d]
        for d in range(nv)
    ])
    ws_vec = acc.ws_vec()

    def arm_at(a):
        return plan.sm_armature[a]

    return cdof_tab, com_l, ci_list, qfs_vec, ws_vec, arm_at


# ---------------------------------------------------------------------------
# kernel builder
# ---------------------------------------------------------------------------
def _forward_env_block(plan: RowPlan, iterations, ls_iterations, scale,
                       tolerance, mega, maxd, vp, cp_read, tbl_refs,
                       mus_refs, qpos, qvel, act_get, ws_arr, W):
    """One full forward on an env block: FK + collision + smooth stage
    (mega) or packed staged inputs (vp), constraint assembly, and the
    Newton solve. Outputs are emitted through the static writer dict `W`
    (name -> callable); absent keys skip the corresponding computation
    entirely, so the same body serves the per-forward kernel (writes to
    pallas outputs) and the megastep loop kernel (writes qacc/euler_dv/
    act_dot to VMEM scratch and nothing else).

    Writer names: x (qacc), asm, qfrc, force (non-mega rows), cdist/cgid/
    cforce (mega contact meta + per-slot forces), euler_dv, act_dot.

    vp: the packed per-env vector (layouts documented in
    _make_fused_kernel). qpos/qvel/act_get/ws_arr are passed separately so
    the megastep loop can substitute carried values; per-forward callers
    pass the vp slices."""
    from . import pallas_fk as pfk

    nv, ncon = plan.nv, plan.ncon
    ne, nfl, nl = plan.ne, plan.nfl, plan.nl
    nq = plan.nq

    def _w(name, v):
        f = W.get(name)
        if f is not None:
            f(v)

    nb = plan.nbody
    zero_env = qpos[0] * 0.0
    ik_contacts = None

    if mega:
        fkres = pfk.fk_env_block(plan.fkp, lambda q: qpos[q])
        if ncon and getattr(plan, "mega_ell", False):
            # extended analytic collision -> generic contact pack, in VMEM
            pack, gid1_rows, gid2_rows = pfk.collide_env_block_ext(
                plan.colp, fkres, tbl_refs, zero_env, qpos.shape[1:]
            )

            def cp_read(pack=pack):
                return pack

            if "cdist" in W:
                _w("cdist", pack[:, 12])
                _w("cgid", jnp.stack(gid2_rows))
                _w("cgid1", jnp.stack(gid1_rows))
        elif ncon:
            ik_contacts = pfk.collide_env_block(
                plan.colp, fkres, tbl_refs, zero_env, qpos.shape[1:]
            )
        acc_m = _MegaAcc(plan, vp, fkres, zero_env, ws_arr=ws_arr)
        damp_rows = None
        if getattr(plan, "sm_dyn_damping", False):
            o_damp = (plan.nq + nv + plan.na + plan.sm_nu + nv
                      + 6 * plan.nbody + nv)
            damp_rows = [vp[o_damp + d] for d in range(nv)]
        (cdof_tab, com_l, ci_list, qfs_vec, ws_vec, arm_at) = (
            _smooth_preamble(plan, acc_m, qpos, qvel, zero_env,
                             damp_rows=damp_rows)
        )
        if plan.mp is not None:
            # tendon + muscle-FLV stage (MXU form); act_dot is an
            # integrator input, emitted alongside the solve outputs
            mp = plan.mp
            act_row = lambda i: act_get(mp.act_adr[i])
            ctrl_row = lambda i: vp[acc_m.o_ctrl + mp.mus[i]]
            qfrc_mus, mus_act_dot = pfk.muscle_env_block(
                mp, fkres, com_l, cdof_tab, qvel, act_row,
                ctrl_row, mus_refs, zero_env,
            )
            qfs_vec = qfs_vec + qfrc_mus
            if mp.act_adr == list(range(plan.na)):
                _w("act_dot", mus_act_dot)
            else:
                inv = [0] * plan.na
                for i, a_s in enumerate(mp.act_adr):
                    inv[a_s] = i
                _w("act_dot", jnp.stack(
                    [mus_act_dot[inv[a_s]] for a_s in range(plan.na)]
                ))

        def cdof(v, i):
            return cdof_tab[v][i]
    elif plan.smooth:
        damp_rows = None
        if getattr(plan, "sm_dyn_damping", False):
            o_damp = (plan.nq + nv + 12 * plan.nbody
                      + 6 * plan.sm_njnt + plan.sm_nu + nv
                      + 6 * plan.nbody + nv)
            damp_rows = [vp[o_damp + d] for d in range(nv)]
        (cdof_tab, com_l, ci_list, qfs_vec, ws_vec, arm_at) = (
            _smooth_preamble(plan, _VpAcc(plan, vp), qpos, qvel,
                             zero_env, damp_rows=damp_rows)
        )

        def cdof(v, i):
            return cdof_tab[v][i]
    else:
        o_cd = nq + nv
        o_com = o_cd + nv * 6
        o_ci = o_com + 3
        o_qfs = o_ci + nb * 10
        o_ws = o_qfs + nv
        o_arm = o_ws + nv
        com_l = [vp[o_com + i] for i in range(3)]
        ci_list = [vp[o_ci + 10 * b:o_ci + 10 * b + 10]
                   for b in range(nb)]
        qfs_vec = vp[o_qfs:o_qfs + nv]
        ws_vec = vp[o_ws:o_ws + nv]

        def cdof(v, i):  # (BE,)
            return vp[o_cd + v * 6 + i]

        def arm_at(a):
            return vp[o_arm + a]

    # --- composite rigid body: build M from cinert in VMEM (the XLA
    # crb einsums + the dense qM relayout cost ~20 ms/step) ---
    crb = list(ci_list)  # (10, BE) each
    for b in plan.topo_rev:  # children accumulate into parents
        p = plan.body_parent[b]
        crb[p] = crb[p] + crb[b]

    buf = []  # per dof: force vector (6 rows of (BE,))
    for v in range(nv):
        c = crb[plan.dof_bodyid[v]]
        w0, w1, w2 = cdof(v, 0), cdof(v, 1), cdof(v, 2)
        l0, l1, l2 = cdof(v, 3), cdof(v, 4), cdof(v, 5)
        iw0 = c[0] * w0 + c[3] * w1 + c[4] * w2
        iw1 = c[3] * w0 + c[1] * w1 + c[5] * w2
        iw2 = c[4] * w0 + c[5] * w1 + c[2] * w2
        mc0, mc1, mc2, m = c[6], c[7], c[8], c[9]
        buf.append([
            iw0 + (mc1 * l2 - mc2 * l1),
            iw1 + (mc2 * l0 - mc0 * l2),
            iw2 + (mc0 * l1 - mc1 * l0),
            m * l0 - (mc1 * w2 - mc2 * w1),
            m * l1 - (mc2 * w0 - mc0 * w2),
            m * l2 - (mc0 * w1 - mc1 * w0),
        ])

    zero_be = zero_env
    Mll = [[None] * nv for _ in range(nv)]
    for a in range(nv):
        for b2 in range(a + 1):
            if plan.anc[a, b2] or plan.anc[b2, a]:
                s = buf[a][0] * cdof(b2, 0)
                for i in range(1, 6):
                    s = s + buf[a][i] * cdof(b2, i)
            else:
                s = zero_be
            if a == b2:
                s = s + arm_at(a)
            Mll[a][b2] = s
            Mll[b2][a] = s
    M = jnp.stack([jnp.stack(r) for r in Mll])  # (nv, nv, BE)

    # the smooth acceleration M^-1 qfrc_smooth is solved HERE rather
    # than upstream: it keeps the unrolled Cholesky chain (the only
    # consumer of qLD on this path) out of the XLA graph entirely
    # (~28 ms/step of small-op kernels at 4096 envs)
    asm = pn.chol_solve_spd(M, qfs_vec, plan.nv)
    ws = ws_vec
    eshape = qpos.shape[1:]  # trailing env block: (BE,) or (S, 128)
    f32 = qpos.dtype

    def full(v):
        return jnp.full((1, *eshape), v, dtype=f32)

    zeros1 = jnp.zeros((1, *eshape), dtype=f32)
    ones1 = jnp.ones((1, *eshape), dtype=f32)

    # ------------------------------------------------------------------
    # per-group row pieces; every J list entry is (n_group_rows, E).
    # aref / R / act are finalized PER PART (one-hot rows read qvel
    # directly; contact rows reuse per-axis velocities), so no full-row
    # pos/k/b/imp/riw/mask arrays ever exist — the earlier masked
    # formulation held 8 extra (nrows, E) arrays and blew the 16 MB
    # scoped-VMEM budget on A1 (306 rows).
    # ------------------------------------------------------------------
    J_parts = [[] for _ in range(nv)]  # per dof
    aref_parts, R_parts, act_parts = [], [], []

    def finish_row(k, b, imp, pos, vel, iw):
        aref_parts.append(-b * vel - k * imp * pos)
        R_parts.append(jnp.maximum(
            (1.0 - imp) / jnp.maximum(imp, MINVAL) * iw, MINVAL
        ))

    # --- JOINT equalities ---
    for r in plan.eq:
        q1r = qpos[r["q1"]][None]  # (1, E)
        dif = (qpos[r["q2"]][None] - plan.qpos0[r["q2"]]) * r["m2"]
        d0, d1, d2, d3, d4 = r["data"]
        poly = d0 + d1 * dif + d2 * dif**2 + d3 * dif**3 + d4 * dif**4
        dpoly = d1 + 2 * d2 * dif + 3 * d3 * dif**2 + 4 * d4 * dif**3
        pos = q1r - plan.qpos0[r["q1"]] - poly
        for v in range(nv):
            piece = None
            if v == r["v1"]:
                piece = ones1
            if v == r["v2"] and r["m2"]:
                add = -dpoly
                piece = add if piece is None else piece + add
            J_parts[v].append(piece if piece is not None else zeros1)
        k, b, imp = _kbi_static(plan, r["solref"], r["solimp"], pos)
        vel = qvel[r["v1"]][None]
        if r["m2"]:
            vel = vel - dpoly * qvel[r["v2"]][None]
        finish_row(k, b, imp, pos, vel, r["iw"])
        act_parts.append(ones1)

    # --- dof friction loss ---
    for r in plan.fl:
        for v in range(nv):
            J_parts[v].append(ones1 if v == r["v"] else zeros1)
        k, b, imp = _kbi_static(plan, r["solref"], r["solimp"], zeros1)
        finish_row(k, b, imp, zeros1, qvel[r["v"]][None], r["iw"])
        act_parts.append(ones1)

    # --- joint limits ---
    for r in plan.lim:
        qv = qpos[r["q"]][None]
        dlo = qv - r["lo"]
        dhi = r["hi"] - qv
        use_lo = dlo <= dhi
        dist = jnp.where(use_lo, dlo, dhi)
        sign = jnp.where(use_lo, 1.0, -1.0).astype(f32)
        pos = dist - r["margin"]
        for v in range(nv):
            J_parts[v].append(sign if v == r["v"] else zeros1)
        k, b, imp = _kbi_static(plan, r["solref"], r["solimp"], pos)
        finish_row(k, b, imp, pos, sign * qvel[r["v"]][None], r["iw"])
        act_parts.append((dist < r["margin"]).astype(f32))

    # --- inert sublane-pad rows (see RowPlan.npad) ---
    for _pad in range(plan.npad):
        for v in range(nv):
            J_parts[v].append(zeros1)
        aref_parts.append(zeros1)
        R_parts.append(ones1)
        act_parts.append(zeros1)

    # ------------------------------------------------------------------
    # contacts + solve + writes. For mega models, the whole section is
    # a closure over a STATIC slot subset so it can be instantiated
    # twice under pl.when: a FULL branch (all slots) and a FAST branch
    # (plan.mega_fast — all k==P slots + the top depth-ranked pairs of
    # top-k groups), taken whenever no env in the block has an
    # outside-subset slot active. Excluded inactive rows contribute
    # exactly zero to cost/forces/Hessian, so the branches agree up to
    # f32 summation order.
    # ------------------------------------------------------------------
    ncon_full = ncon
    J_top, aref_top = J_parts, aref_parts
    R_top, act_top = R_parts, act_parts
    if mega and ncon and "cdist" in W and ik_contacts is not None:
        # collision meta (GRF readout) covers ALL slots — written
        # before the solve branches (the ell path wrote it from the pack)
        _w("cdist", jnp.stack(ik_contacts[1]))
        _w("cgid", jnp.stack(ik_contacts[2]))

    def _rows_solve_write(sub):
        ncon = ncon_full if sub is None else len(sub)
        J_parts = [list(p) for p in J_top]
        aref_parts = list(aref_top)
        R_parts = list(R_top)
        act_parts = list(act_top)
        mu_all = None
        if ncon:
            if plan.uniform:
                if ik_contacts is not None:
                    # mega: slot data straight from the in-kernel collision
                    # stage — never touches HBM in any layout
                    ik_pos, ik_dist, ik_gid = ik_contacts
                    if sub is not None:
                        ik_pos = [ik_pos[c] for c in sub]
                        ik_dist = [ik_dist[c] for c in sub]
                        ik_gid = [ik_gid[c] for c in sub]
                    from . import pallas_fk as pfk

                    cpos = jnp.stack([
                        jnp.stack([
                            pfk.materialize(p[i], zero_env)
                            for i in range(3)
                        ])
                        for p in ik_pos
                    ])  # (ncon, 3, E)
                    dist = jnp.stack(ik_dist)
                    gid2 = jnp.stack(ik_gid)
                    mu1 = plan.c_fric[0]
                    mu2 = plan.c_fric[1]
                else:
                    # uniform statics: [pos(3) dist geom2 (fric(2))] —
                    # frame, margin, kbi params and geom1's body are plan
                    # constants
                    cp = cp_read()
                    cpos = cp[:, 0:3, :]
                    dist = cp[:, 3, :]
                    gid2 = cp[:, 4, :]
                    if plan.fric_uniform:
                        mu1 = plan.c_fric[0]
                        mu2 = plan.c_fric[1]
                    else:
                        mu1 = cp[:, 5, :]
                        mu2 = cp[:, 6, :]
                frame_c = plan.c_frame  # 3x3 python floats, rows n/t1/t2
                # body one-hots from the raw geom id (geom -> body is a
                # static table; the plane's body 0 has an empty chain)
                oh = {}
                for bb, geoms in plan.body_geoms.items():
                    if not plan.dofmask[bb].any():
                        continue
                    o = (gid2 == float(geoms[0])).astype(f32)
                    for g in geoms[1:]:
                        o = o + (gid2 == float(g)).astype(f32)
                    oh[bb] = o
                iwt = None
                for bb, o in oh.items():
                    if plan.body_iw[bb]:
                        t = o * plan.body_iw[bb]
                        iwt = t if iwt is None else iwt + t
                if iwt is None:
                    iwt = jnp.zeros_like(dist)
            else:
                # generic pack: [pos(3) frame(9) dist margin fric(nf)
                #                solref(2) solimp(5) iw_t bid1 bid2]
                nf = plan.nfric
                cp = cp_read()
                if sub is not None:
                    cp = jnp.stack([cp[c] for c in sub])
                cpos = cp[:, 0:3, :]     # (ncon, 3, BE)
                frame = cp[:, 3:12, :]   # (ncon, 9, BE), row-major (t, i)
                dist = cp[:, 12, :]      # (ncon, BE)
                marg = cp[:, 13, :]
                fric = cp[:, 14:14 + nf, :]   # (ncon, nf, BE)
                srefc = cp[:, 14 + nf:16 + nf, :]  # (ncon, 2, BE)
                simpc = cp[:, 16 + nf:21 + nf, :]  # (ncon, 5, BE)
                iwt = cp[:, 21 + nf, :]       # (ncon, BE)
                bid1 = cp[:, 22 + nf, :]
                bid2 = cp[:, 23 + nf, :]
                mu1 = fric[:, 0, :]
                mu2 = fric[:, 1, :]

                # chain-mask difference via body one-hots (bodyids are
                # traced; the chain table is static so only bodies with
                # nonempty chains contribute)
                oh = {}
                for bb in range(plan.nbody):
                    if plan.dofmask[bb].any():
                        oh[bb] = (bid2 == float(bb)).astype(f32) - (
                            bid1 == float(bb)
                        ).astype(f32)

            offx = cpos[:, 0, :] - com_l[0][None]
            offy = cpos[:, 1, :] - com_l[1][None]
            offz = cpos[:, 2, :] - com_l[2][None]

            jt = [[None] * nv for _ in range(3)]  # [t][v] -> (ncon, E)
            maskd_of = [None] * nv  # chain-mask diff, reused by ang. rows
            for v in range(nv):
                maskd = None
                for bb, o in oh.items():
                    if plan.dofmask[bb, v]:
                        maskd = o if maskd is None else maskd + o
                maskd_of[v] = maskd
                if maskd is None:
                    for t in range(3):
                        jt[t][v] = jnp.zeros_like(dist)
                    continue
                ax = cdof(v, 0)[None]
                ay = cdof(v, 1)[None]
                az = cdof(v, 2)[None]
                jp0 = (ay * offz - az * offy + cdof(v, 3)[None]) * maskd
                jp1 = (az * offx - ax * offz + cdof(v, 4)[None]) * maskd
                jp2 = (ax * offy - ay * offx + cdof(v, 5)[None]) * maskd
                if plan.uniform:
                    for t in range(3):
                        jt[t][v] = (
                            frame_c[t][0] * jp0
                            + frame_c[t][1] * jp1
                            + frame_c[t][2] * jp2
                        )
                else:
                    for t in range(3):
                        jt[t][v] = (
                            frame[:, 3 * t + 0, :] * jp0
                            + frame[:, 3 * t + 1, :] * jp1
                            + frame[:, 3 * t + 2, :] * jp2
                        )

            if plan.uniform:
                pos_c = dist - plan.c_margin
                kc, bc, impc = _kbi_static(
                    plan, plan.c_solref, plan.c_solimp, pos_c
                )
                kc = kc if hasattr(kc, "shape") else jnp.full_like(pos_c, kc)
                bc = bc if hasattr(bc, "shape") else jnp.full_like(pos_c, bc)
                mu0 = mu1
                act_c = (dist < plan.c_margin).astype(f32)
            else:
                pos_c = dist - marg
                kc, bc, impc = _kbi_dyn(plan, srefc, simpc, pos_c)
                mu0 = fric[:, 0, :]
                act_c = (dist < marg).astype(f32)

            # static liveness: dofs on no candidate body's chain have
            # all-zero axis rows (maskd_of None) — skipped in every hot
            # pass here and in solve_core (pyr["live"])
            jt_live = [maskd_of[v] is not None for v in range(nv)]

            # big pyramidal models (G1: 64 slots): pin the contact-axis
            # rows and traced friction rows to ZERO-OFFSET layouts via a
            # VMEM scratch round-trip. They derive from single-row slices
            # of the packed cp (whose W axis lives in sublanes), so Mosaic
            # propagates sublane offsets into them, and its
            # shape-invariant-numerics mode then rejects the solver's ADD
            # reductions over the offset (ncon, E) tiles ("input layout
            # must have zero offsets"). The copy is a few thousand row
            # writes per forward; semantics are bit-identical.
            if ncon >= 64 and not plan.elliptic:
                n_mu = 0 if plan.uniform and plan.fric_uniform else 2

                def _pin_scoped(ref):
                    r = 0
                    for t in range(3):
                        for v in range(nv):
                            if jt_live[v]:
                                ref[r] = jt[t][v]
                            r += 1
                    if n_mu:
                        ref[3 * nv] = mu1
                        ref[3 * nv + 1] = mu2
                    out_jt = [[None] * nv for _ in range(3)]
                    r = 0
                    for t in range(3):
                        for v in range(nv):
                            out_jt[t][v] = (
                                ref[r] if jt_live[v] else jt[t][v]
                            )
                            r += 1
                    if n_mu:
                        return out_jt, ref[3 * nv], ref[3 * nv + 1]
                    return out_jt, mu1, mu2

                from jax.experimental.pallas import tpu as _pltpu

                jt, mu1, mu2 = pl.run_scoped(
                    _pin_scoped,
                    _pltpu.VMEM((3 * nv + 2, ncon, *eshape), f32),
                )

            # per-axis velocities (vel of any contact row is a combination)
            vel_ax = []
            for t in range(3):
                s = None
                for v in range(nv):
                    if not jt_live[v]:
                        continue
                    term = jt[t][v] * qvel[v][None]
                    s = term if s is None else s + term
                if s is None:
                    s = jnp.zeros_like(dist)
                vel_ax.append(s)  # (ncon, E)
            kimp = kc * impc * pos_c
            R_nc = jnp.maximum(
                (1.0 - impc) / jnp.maximum(impc, MINVAL) * iwt, MINVAL
            )

            if not plan.elliptic:
                # condim-3 pyramid: the 4 facet rows per slot are NOT
                # materialized into J — solve_core's axis form (pyr) runs
                # the hot passes on the 3 axis rows jt[t][v] directly
                # (25-30% fewer row ops in Hessian/matvec/grad)

                def rep4(x):  # (ncon, E) -> (4*ncon, E), BLOCKED layout
                    return jnp.concatenate([x, x, x, x], axis=0)

                # blocked facet layout: rows [all +mu1 | all -mu1 |
                # all +mu2 | all -mu2] — matches solve_core's pyr form;
                # fused_constraint remaps to per-contact order on output
                aref_parts.append(jnp.concatenate(
                    [-bc * (vel_ax[0] + mu1 * vel_ax[1]) - kimp,
                     -bc * (vel_ax[0] - mu1 * vel_ax[1]) - kimp,
                     -bc * (vel_ax[0] + mu2 * vel_ax[2]) - kimp,
                     -bc * (vel_ax[0] - mu2 * vel_ax[2]) - kimp],
                    axis=0,
                ))
                riw_f = 2.0 * mu0 * mu0 * (1.0 + mu0 * mu0)
                R_parts.append(rep4(jnp.maximum(R_nc * riw_f, MINVAL)))
                act_parts.append(rep4(act_c))
            else:
                # elliptic cones: per contiguous equal-dim run, dim rows per
                # slot (normal + tangentials [+ torsion/rolling]); friction
                # rows get aref = -b*vel and the impratio-scaled R
                # (constraint.py:444-452). Zone logic lives in solve_core.
                con_dims = (
                    plan.con_dims if sub is None
                    else [plan.con_dims[c] for c in sub]
                )
                mu_parts = []
                i = 0
                while i < ncon:
                    d = con_dims[i]
                    j = i
                    while j < ncon and con_dims[j] == d:
                        j += 1
                    cnt = j - i
                    sl = slice(i, j)
                    if d == 1:
                        # frictionless: one unilateral row
                        for v in range(nv):
                            J_parts[v].append(jt[0][v][sl])
                        aref_parts.append(-bc[sl] * vel_ax[0][sl] - kimp[sl])
                        R_parts.append(R_nc[sl])
                        act_parts.append(act_c[sl])
                        i = j
                        continue
                    # angular rows (torsion + rolling) only for this run's
                    # slots — a full (ncon, E) ja per dof/axis would cost
                    # another ~2 MB of VMEM on A1
                    ja_run = None
                    if d > 3:
                        ja_run = [[None] * nv for _ in range(3)]
                        for v in range(nv):
                            maskd = maskd_of[v]
                            if maskd is None:
                                z = jnp.zeros((cnt, *eshape), dtype=f32)
                                for t in range(3):
                                    ja_run[t][v] = z
                                continue
                            ms = maskd[sl]
                            jr0 = cdof(v, 0)[None] * ms
                            jr1 = cdof(v, 1)[None] * ms
                            jr2 = cdof(v, 2)[None] * ms
                            for t in range(3):
                                ja_run[t][v] = (
                                    frame[:, 3 * t + 0, :][sl] * jr0
                                    + frame[:, 3 * t + 1, :][sl] * jr1
                                    + frame[:, 3 * t + 2, :][sl] * jr2
                                )
                    for v in range(nv):
                        rows_v = [jt[t][v][sl] for t in range(min(d, 3))]
                        if d > 3:
                            rows_v += [ja_run[t][v] for t in range(d - 3)]
                        blk = jnp.stack(rows_v, axis=1)  # (cnt, d, E)
                        J_parts[v].append(blk.reshape(cnt * d, *eshape))

                    # aref rows: normal -b*vel - k*imp*pos; friction -b*vel
                    vel_rows = [vel_ax[t][sl] for t in range(min(d, 3))]
                    if d > 3:
                        for t in range(d - 3):
                            s = ja_run[t][0] * qvel[0][None]
                            for v in range(1, nv):
                                s = s + ja_run[t][v] * qvel[v][None]
                            vel_rows.append(s)
                    aref_rows = [-bc[sl] * vel_rows[0] - kimp[sl]]
                    for t in range(1, d):
                        aref_rows.append(-bc[sl] * vel_rows[t])
                    aref_parts.append(
                        jnp.stack(aref_rows, axis=1).reshape(cnt * d, *eshape)
                    )
                    m0 = mu0[sl]
                    R_rows = [R_nc[sl]]
                    for t in range(1, d):
                        mui = fric[:, t - 1, :][sl]
                        R_rows.append(jnp.maximum(
                            R_nc[sl] * m0 * m0
                            / (jnp.maximum(mui * mui, MINVAL)
                               * plan.impratio),
                            MINVAL,
                        ))
                    R_parts.append(
                        jnp.stack(R_rows, axis=1).reshape(cnt * d, *eshape)
                    )
                    act_parts.append(jnp.stack(
                        [act_c[sl]] * d, axis=1
                    ).reshape(cnt * d, *eshape))
                    mu_parts.append(m0 / (plan.impratio ** 0.5))
                    i = j
                mu_all = (
                    jnp.concatenate(mu_parts, axis=0) if mu_parts else None
                )

        # ------------------------------------------------------------------
        # stitch rows and solve
        # ------------------------------------------------------------------
        J = [
            jnp.concatenate(J_parts[v], axis=0) if J_parts[v] else None
            for v in range(nv)
        ]
        aref = jnp.concatenate(aref_parts, axis=0)
        R = jnp.concatenate(R_parts, axis=0)
        act = jnp.concatenate(act_parts, axis=0)
        D = 1.0 / R
        if plan.nfl:
            floss_fl = jnp.concatenate(
                [jnp.full((1, *eshape), r["floss"], dtype=f32) for r in plan.fl],
                axis=0,
            )
        else:
            floss_fl = jnp.zeros((1, *eshape), dtype=f32)

        s0 = plan.ne + plan.nfl + plan.nl + plan.npad
        if plan.elliptic and ncon:
            # run layout over the (possibly subset) slot list
            cd_l = (
                plan.con_dims if sub is None
                else [plan.con_dims[c] for c in sub]
            )
            ell_runs_l = []
            adr_ = s0
            i0_ = 0
            while i0_ < ncon:
                d_ = cd_l[i0_]
                j0_ = i0_
                while j0_ < ncon and cd_l[j0_] == d_:
                    j0_ += 1
                cnt_ = j0_ - i0_
                if d_ >= 3:
                    ell_runs_l.append((adr_, cnt_, d_))
                    adr_ += cnt_ * d_
                else:
                    adr_ += cnt_
                i0_ = j0_
            ell_runs_l = tuple(ell_runs_l)
        else:
            ell_runs_l = ()
        pyr = None
        if ncon and not plan.elliptic:
            pyr = dict(jt=jt, mu1=mu1, mu2=mu2, s0=s0, ncon=ncon,
                       live=jt_live)

        x, force = pn.solve_core(
            J, M, aref, D, R, floss_fl, act, asm, ws,
            nv, iterations, ls_iterations, plan.ne, plan.nfl,
            ell_runs=ell_runs_l,
            ell_mu=mu_all, scale=scale, tolerance=tolerance, pyr=pyr,
        )

        _w("x", x)
        if "force" in W:
            if sub is None:
                _w("force", force)
            else:
                # scatter the reduced rows back to the FULL row
                # layout (excluded inactive slots carry zero force)
                rows = [force[:s0]] if s0 else []
                ladr = s0
                in_sub = set(sub)
                for c_full in range(ncon_full):
                    r_ = plan.rows_per[c_full]
                    if c_full in in_sub:
                        rows.append(force[ladr:ladr + r_])
                        ladr += r_
                    else:
                        rows.append(
                            jnp.zeros((r_, *eshape), dtype=f32)
                        )
                _w("force", jnp.concatenate(rows, axis=0))
        elif "cforce" in W:
            # efc_force_contact per-slot forces over the FULL slot
            # layout, emitted from the VMEM-resident force rows
            # (blocked facet layout: facet f of subset slot i lives at
            # s0 + f*ncon + i; slots outside the subset carry zero
            # force by construction)
            pos_of = (
                {c: i for i, c in enumerate(sub)}
                if sub is not None else None
            )
            cf_rows = []
            for c_full in range(ncon_full):
                ci = c_full if pos_of is None else pos_of.get(c_full)
                for f in range(maxd):
                    if ci is not None and f < 4:
                        cf_rows.append(force[s0 + f * ncon + ci])
                    else:
                        cf_rows.append(zero_env)
            _w("cforce", jnp.stack(cf_rows))
        if pyr is not None and "qfrc" in W:
            ffc0 = force[s0:s0 + ncon]
            ffc1 = force[s0 + ncon:s0 + 2 * ncon]
            ffc2 = force[s0 + 2 * ncon:s0 + 3 * ncon]
            ffc3 = force[s0 + 3 * ncon:s0 + 4 * ncon]
            fn = ffc0 + ffc1 + ffc2 + ffc3
            f1c = mu1 * (ffc0 - ffc1)
            f2c = mu2 * (ffc2 - ffc3)
            ftop = force[:s0] if s0 else None
            qfrc = []
            live = pyr["live"]
            for v in range(nv):
                if live[v]:
                    s = jnp.sum(
                        jt[0][v] * fn + jt[1][v] * f1c + jt[2][v] * f2c,
                        axis=0,
                    )
                else:
                    s = zero_env
                if s0:
                    s = s + jnp.sum(J[v] * ftop, axis=0)
                qfrc.append(s)
            _w("qfrc", jnp.stack(qfrc))
        elif "qfrc" in W:
            _w("qfrc", jnp.stack(
                [jnp.sum(J[v] * force, axis=0) for v in range(nv)]
            ))


        if plan.euler_dv and "euler_dv" in W:
            # Euler implicit damping: dv = (M + h diag(damping))^-1 M x —
            # reuses the VMEM-resident M so the integrator needs no qM
            h = plan.timestep
            mq = jnp.stack([jnp.sum(M[a] * x, axis=0) for a in range(nv)])
            mh = [
                [
                    M[a, b] + h * plan.dof_damping[a]
                    if a == b else M[a, b]
                    for b in range(nv)
                ]
                for a in range(nv)
            ]
            _w("euler_dv", pn.chol_solve_spd(mh, mq, nv))
    if mega and ncon and plan.mega_fast is not None:
        outside = sorted(set(range(ncon)) - set(plan.mega_fast))
        act_out = jnp.stack([ik_contacts[1][c] for c in outside])
        cond = jnp.max(
            jnp.where(act_out < plan.c_margin, 1.0, 0.0)
        ) > 0.0

        @pl.when(cond)
        def _full_branch():
            _rows_solve_write(None)

        @pl.when(jnp.logical_not(cond))
        def _fast_branch():
            _rows_solve_write(plan.mega_fast)
    elif (ncon and plan.elliptic
          and getattr(plan, "ell_fast", None) is not None):
        # elliptic (A1): same fast/full specialization; the activity
        # condition reads the packed per-slot fields (generic pack
        # cols 12/13 = dist / includemargin)
        cp_cond = cp_read()
        outside = sorted(set(range(ncon)) - set(plan.ell_fast))
        act_out = jnp.stack([
            jnp.where(cp_cond[c, 12] < cp_cond[c, 13], 1.0, 0.0)
            for c in outside
        ])
        cond = jnp.max(act_out) > 0.0

        @pl.when(cond)
        def _full_branch_e():
            _rows_solve_write(None)

        @pl.when(jnp.logical_not(cond))
        def _fast_branch_e():
            _rows_solve_write(plan.ell_fast)
    else:
        _rows_solve_write(None)
    _w("asm", asm)


def _make_fused_kernel(plan: RowPlan, iterations, ls_iterations,
                       scale=None, tolerance=None, grouped=False,
                       mega=False, maxd=4):
    nq, nv = plan.nq, plan.nv

    def kernel(*refs):
        # vp: ONE packed per-env vector (see fused_constraint):
        #   non-smooth: [qpos qvel cdof(nv*6) com(3) cinert(nbody*10)
        #                qfrc_smooth(nv) ws(nv) armature(nv)]
        #   smooth:     [qpos qvel xipos(nbody*3) ximat(nbody*9)
        #                xanchor(njnt*3) xaxis(njnt*3) ctrl(nu)
        #                qfrc_applied(nv) xfrc(nbody*6) ws(nv)]
        #   mega:       [qpos qvel act(na) ctrl(nu) qfrc_applied(nv)
        #                xfrc(nbody*6) ws(nv)] — FK and collision run IN
        #                KERNEL
        # grouped layout: every ref block carries a unit group axis ahead
        # of the (S, 128) env block (the group axis is leading in the HBM
        # arrays so any power-of-two S lowers — see _fused_batched); drop
        # it on read. Lanes layout: blocks are already (K..., BE).
        if mega and getattr(plan, "mega_ell", False):
            # mesh-carrying ext plans (G1) pass their bucket tables as
            # pallas inputs exactly like the plain mega branch — the old
            # empty-tuple unpack mis-assigned tables to output refs and
            # IndexError'd in _mesh_group_slots (latent: the megastep
            # kernel was the only exercised mega_ell path until round 5)
            n_tbl = int(plan.colp.n_mesh_tables)
            vp_ref = refs[0]
            tbl_refs = refs[1:1 + n_tbl]
            mus_refs = ()
            (x_ref, qfrc_ref, asm_ref, cdist_ref, cgid_ref,
             cgid1_ref, force_ref, *extra_refs) = refs[1 + n_tbl:]
            cp_ref = cforce_ref = None
        elif mega:
            from . import pallas_fk as pfk

            n_tbl = plan.colp.n_mesh_tables
            n_mtbl = pfk.N_MUSCLE_TABLES if plan.mp is not None else 0
            vp_ref = refs[0]
            tbl_refs = refs[1:1 + n_tbl]
            mus_refs = refs[1 + n_tbl:1 + n_tbl + n_mtbl]
            (x_ref, qfrc_ref, asm_ref, cdist_ref, cgid_ref,
             cforce_ref, *extra_refs) = refs[1 + n_tbl + n_mtbl:]
            cp_ref = force_ref = None
        else:
            (vp_ref, cp_ref, x_ref, force_ref, qfrc_ref, asm_ref,
             *extra_refs) = refs
            tbl_refs = mus_refs = ()

        def rd(ref):
            v = ref[...]
            if grouped:
                return v.reshape(*v.shape[:-3], *v.shape[-2:])
            return v

        def wr(ref, v):
            ref[...] = v[:, None] if grouped else v

        vp = rd(vp_ref)
        qpos = vp[0:nq]                      # (nq, BE)
        qvel = vp[nq:nq + nv]                # (nv, BE)

        def mkw(ref):
            return lambda v: wr(ref, v)

        W = {"x": mkw(x_ref), "asm": mkw(asm_ref), "qfrc": mkw(qfrc_ref)}
        if mega:
            o_act = nq + nv
            o_ws = o_act + plan.na + plan.sm_nu + nv + 6 * plan.nbody

            def act_get(s):
                return vp[o_act + s]

            ws_arr = vp[o_ws:o_ws + nv]
            cp_read = None
            W["cdist"] = mkw(cdist_ref)
            W["cgid"] = mkw(cgid_ref)
            if getattr(plan, "mega_ell", False):
                W["cgid1"] = mkw(cgid1_ref)
                W["force"] = mkw(force_ref)
            else:
                W["cforce"] = mkw(cforce_ref)
            if plan.euler_dv:
                W["euler_dv"] = mkw(extra_refs[0])
            if plan.mp is not None:
                W["act_dot"] = mkw(
                    extra_refs[1 if plan.euler_dv else 0]
                )
        else:
            act_get = None
            ws_arr = None

            def cp_read():
                return rd(cp_ref)

            W["force"] = mkw(force_ref)
            if plan.euler_dv:
                W["euler_dv"] = mkw(extra_refs[0])

        _forward_env_block(
            plan, iterations, ls_iterations, scale, tolerance, mega, maxd,
            vp, cp_read, tbl_refs, mus_refs, qpos, qvel, act_get, ws_arr, W,
        )

    return kernel


def _fused_batched(plan: RowPlan, iterations, ls_iterations, scale,
                   tolerance, vec, cargs):
    """Batched entry: env-major inputs; the kernel consumes either the 2D
    lanes layout (env axis in lanes, rows packed 8-per-tile in sublanes —
    pyramidal models) or grouped (S, 128) env blocks (elliptic models; see
    RowPlan.use_grouped for the measured tradeoff). `vec` is the (E, nvec)
    packed per-env vector (fused_constraint concatenates all small inputs
    so the env-major -> kernel relayout is ONE well-shaped tiled
    transpose); cargs is the (E, ncon, pack_w) packed contact array (dummy
    when ncon == 0)."""
    E = vec.shape[0]
    f32 = jnp.float32
    grouped = plan.use_grouped(E)
    if grouped:
        S = plan.pick_s(E)
        R = (((E + 127) // 128 + S - 1) // S) * S
        G = R // S
    else:
        S = 1
        G = (E + _BE - 1) // _BE
        R = G
    Ep = R * 128

    def tl(x, k):
        if grouped:  # (E, k) env-major -> (k, G, S, 128) grouped
            g = play.to_grouped(x.astype(f32), r_pad=S)
            return g.reshape(k, G, S, 128)
        x = play.moveaxis0_last(x.astype(f32))  # (k, E) env-last
        if Ep != E:
            x = jnp.pad(x, [(0, 0)] * (x.ndim - 1) + [(0, Ep - E)])
        return x

    nv, ncon = plan.nv, plan.ncon
    nvec = vec.shape[1]

    if grouped:
        def spec(*dims):
            nd = len(dims)
            return pl.BlockSpec(
                (*dims, 1, S, 128),
                lambda e: (0,) * nd + (e, 0, 0),
                memory_space=pltpu.VMEM,
            )
    else:
        def spec(*dims):
            nd = len(dims)
            return pl.BlockSpec(
                (*dims, _BE),
                lambda e: (0,) * nd + (e,),
                memory_space=pltpu.VMEM,
            )

    ins = [tl(vec.astype(f32), nvec)]
    specs = [spec(nvec)]
    W = plan.pack_w
    if ncon:
        # cargs is packed (E, ncon, W) by fused_constraint
        cp_t = tl(cargs.reshape(E, ncon * W), ncon * W)
        ins.append(cp_t.reshape(ncon, W, *cp_t.shape[1:]))
        specs.append(spec(ncon, W))
    else:
        ins.append(jnp.zeros(
            (1, W, G, S, 128) if grouped else (1, W, Ep), f32
        ))
        specs.append(spec(1, W))

    kernel = _make_fused_kernel(plan, iterations, ls_iterations,
                                scale=scale, tolerance=tolerance,
                                grouped=grouped)
    row_spec = spec(plan.nrows)
    vec_spec = spec(nv)

    def osh(k):
        return jax.ShapeDtypeStruct(
            (k, G, S, 128) if grouped else (k, Ep), f32
        )

    out_specs = [vec_spec, row_spec, vec_spec, vec_spec]
    out_shape = [osh(nv), osh(plan.nrows), osh(nv), osh(nv)]
    if plan.euler_dv:
        out_specs.append(vec_spec)
        out_shape.append(osh(nv))
    outs = pl.pallas_call(
        kernel,
        grid=(G,),
        in_specs=specs,
        out_specs=out_specs,
        out_shape=out_shape,
        interpret=pn._INTERPRET,
        compiler_params=pn.vmem_params(plan),
    )(*ins)

    if grouped:
        def back(a):
            return play.from_grouped(a.reshape(a.shape[0], R, 128), E)
    else:
        def back(a):
            return play.moveaxis_last0(a)[:E]

    return tuple(back(o) for o in outs)


_FUSED_CACHE: dict = {}


def get_fused_solver(plan: RowPlan, iterations: int, ls_iterations: int,
                     scale=None, tolerance=None):
    scale = None if scale is None else float(scale)
    tolerance = None if tolerance is None else float(tolerance)
    key = (id(plan), iterations, ls_iterations, scale, tolerance)
    hit = _FUSED_CACHE.get(key)
    if hit is not None:
        return hit

    n_out = 5 if plan.euler_dv else 4

    def solve_b(vec, cargs):
        return _fused_batched(plan, iterations, ls_iterations, scale,
                              tolerance, vec, cargs)

    @jax.custom_batching.custom_vmap
    def solve(vec, cargs):
        out = solve_b(vec[None], cargs[None])
        return tuple(o[0] for o in out)

    @solve.def_vmap
    def _vmap(axis_size, in_batched, *args):
        args = [
            a if bt else jnp.broadcast_to(a, (axis_size,) + a.shape)
            for a, bt in zip(args, in_batched)
        ]
        return solve_b(*args), (True,) * n_out

    _FUSED_CACHE[key] = solve
    return solve


def maybe_plan(model: Model, data):
    """The static gate for the fused path, shared by every forward stage
    that specializes on it (skip factor_m / solve_m when the kernel will
    do the M-solve itself)."""
    import jax.numpy as _jnp

    if data.qpos.dtype != _jnp.float32:
        return None
    if model.opt.iterations > 16 or model.opt.ls_iterations > 8:
        return None
    if not pn.pallas_enabled():
        return None
    return get_plan(model, data.contact)


def fused_constraint(model: Model, data, plan: RowPlan):
    """Drop-in for make_constraint + solver.solve on supported models.
    Returns updated Data (qacc, qfrc_constraint, efc_force_contact)."""
    solver_fn = get_fused_solver(
        plan, model.opt.iterations, model.opt.ls_iterations,
        scale=model.stat_meaninertia * max(1, model.nv),
        tolerance=max(model.opt.tolerance, 1e-6),
    )
    con = data.contact
    dtype = data.qpos.dtype
    ncon = plan.ncon
    if ncon:
        # plan.ncon is the classic prefix — any convex tail slots in the
        # soup are not solved on this path (see RowPlan censoring)
        if plan.uniform:
            fields = [
                con.pos[:ncon], con.dist[:ncon, None],
                con.geom2[:ncon].astype(dtype)[..., None],
            ]
            if not plan.fric_uniform:
                fields.append(con.friction[:ncon, :2])
        else:
            gb = jnp.asarray(model.geom_bodyid)
            biw = jnp.asarray(model.body_invweight0, dtype=dtype)[:, 0]
            b1 = gb[con.geom1[:ncon]]
            b2 = gb[con.geom2[:ncon]]
            fields = [
                con.pos[:ncon], con.frame[:ncon].reshape(ncon, 9),
                con.dist[:ncon, None],
                con.includemargin[:ncon, None],
                con.friction[:ncon, :plan.nfric],
                con.solref[:ncon], con.solimp[:ncon],
                (biw[b1] + biw[b2])[..., None],
                b1.astype(dtype)[..., None], b2.astype(dtype)[..., None],
            ]
        con_pack = jnp.concatenate(
            [f.astype(dtype) for f in fields], axis=-1
        )  # (ncon, pack_w)
    else:
        con_pack = jnp.zeros((1, plan.pack_w), dtype)

    # ONE packed per-env vector (layouts documented in _make_fused_kernel)
    if plan.smooth:
        parts = [
            data.qpos, data.qvel,
            data.xipos.reshape(-1), data.ximat.reshape(-1),
            data.xanchor.reshape(-1), data.xaxis.reshape(-1),
            data.ctrl, data.qfrc_applied, data.xfrc_applied.reshape(-1),
            data.qacc_warmstart,
        ]
        if getattr(plan, "sm_dyn_damping", False):
            parts.append(jnp.asarray(model.dof_damping, dtype))
        vec = jnp.concatenate(parts).astype(dtype)
    else:
        com = data.subtree_com[plan.root]
        vec = jnp.concatenate([
            data.qpos, data.qvel, data.cdof.reshape(-1), com,
            data.cinert.reshape(-1), data.qfrc_smooth,
            data.qacc_warmstart,
            jnp.asarray(model.dof_armature, dtype),
        ]).astype(dtype)
    outs = solver_fn(vec, con_pack)
    x, force, qfrc, qacc_smooth = outs[:4]
    euler_dv = outs[4].astype(dtype) if plan.euler_dv else None

    efc_force_contact = data.efc_force_contact
    if plan.ncon and efc_force_contact.shape[-1]:
        maxd = efc_force_contact.shape[-1]
        rowidx = np.zeros((plan.ncon, maxd), dtype=np.int32)
        rowmsk = np.zeros((plan.ncon, maxd), dtype=bool)
        s0 = plan.ne + plan.nfl + plan.nl + plan.npad
        for c in range(plan.ncon):
            nrow = min(plan.rows_per[c], maxd)
            if plan.elliptic:
                rowidx[c, :nrow] = plan.con_efcadr[c] + np.arange(nrow)
            else:
                # blocked facet layout: facet f of slot c lives at
                # s0 + f*ncon + c (per-contact order restored here)
                rowidx[c, :nrow] = s0 + np.arange(nrow) * plan.ncon + c
            rowmsk[c, :nrow] = True
        efc_force_contact = _pad_slots(jnp.where(
            jnp.asarray(rowmsk), force[jnp.asarray(rowidx)], 0.0
        ), int(data.efc_force_contact.shape[0]))

    return data.replace(
        qacc=x.astype(dtype),
        qacc_smooth=qacc_smooth.astype(dtype),
        qfrc_constraint=qfrc.astype(dtype),
        efc_force_contact=efc_force_contact.astype(dtype),
        euler_dv=euler_dv,
    )


# ---------------------------------------------------------------------------
# mega path: FK + collision + smooth + solve in ONE kernel per forward
# ---------------------------------------------------------------------------
_MEGA_MAXD = 4  # condim-3 pyramid: 4 facet rows per slot


def _mega_sublanes(plan=None):
    """Env sublanes S for the mega kernel's grouped (S, 128) layout.
    Scalar chains (FK, smooth preamble, collision prep, Cholesky) run at
    1/8 VPU density on (1, 128) lanes rows; packing S env groups into
    sublanes runs them S x denser at the cost of per-sublane-slice MXU
    dots in the mesh/tendon stages. Measured on v5e at 4096 envs
    (env-steps/s, lanes vs S=8): HumanoidTorque 86.9k -> 188.4k,
    UnitreeH1 385.7k -> 622.8k, Talos -> 365.5k, Atlas 59.7k -> 63.6k;
    S=2 is a valley (63.0k flagship) — don't use it. Escape hatch:
    LMT_MEGA_SUBLANES=1 restores lanes if a future model's grouped
    program won't compile."""
    import os as _os

    s = int(_os.environ.get("LMT_MEGA_SUBLANES", "8"))
    s = s if s in (2, 4, 8) else 1
    if plan is not None:
        tbl = getattr(plan, "mega_tbl_bytes", 0) or 0
        if tbl > 8 * 1024 * 1024:
            # big resident mesh tables (G1: 31 MB of hull buckets): shrink
            # the env block until tables + the per-block live set fit the
            # scoped budget. (The est-based clamp is NOT applied to
            # table-free plans — the calibration overestimates the ext
            # path by ~8x and would wrongly demote A1 from S=8.)
            budget = int(_os.environ.get(
                "LMT_SCOPED_VMEM_KIB", "81920"
            )) * 1024 * 0.65  # tables + live set; Mosaic peak runs past
            # the estimate (G1 at S=2: 83.8M actual vs 71.5M estimated)
            while s > 1 and tbl + plan.est_bytes * s > budget:
                s //= 2
    return s


def _mega_batched(plan: RowPlan, iterations, ls_iterations, scale,
                  tolerance, vec):
    """Batched mega entry: `vec` is the (E, nvec) packed
    [qpos qvel act ctrl qfrc_applied xfrc ws] per-env vector; the mesh
    vertex/neighbor (and muscle incidence) tables ride along as
    whole-array VMEM inputs. Layout: 2D lanes blocks by default, grouped
    (S, 128) env blocks with LMT_MEGA_SUBLANES."""
    E = vec.shape[0]
    f32 = jnp.float32
    S = _mega_sublanes(plan)
    grouped = S > 1 and E > 128
    if grouped:
        R = (((E + 127) // 128 + S - 1) // S) * S
        G = R // S
        Ep = R * 128
    else:
        S = 1
        G = (E + _BE - 1) // _BE
        Ep = G * _BE

    def tl(x):
        if grouped:
            g = play.to_grouped(x.astype(f32), r_pad=S)
            return g.reshape(x.shape[1], G, S, 128)
        x = play.moveaxis0_last(x.astype(f32))
        if Ep != E:
            x = jnp.pad(x, [(0, 0)] * (x.ndim - 1) + [(0, Ep - E)])
        return x

    nvec = vec.shape[1]

    if grouped:
        def spec(*dims):
            nd = len(dims)
            return pl.BlockSpec(
                (*dims, 1, S, 128),
                lambda e: (0,) * nd + (e, 0, 0),
                memory_space=pltpu.VMEM,
            )
    else:
        def spec(*dims):
            nd = len(dims)
            return pl.BlockSpec(
                (*dims, _BE),
                lambda e: (0,) * nd + (e,),
                memory_space=pltpu.VMEM,
            )

    ins = [tl(vec)]
    specs = [spec(nvec)]
    for tbl in plan.colp.mesh_table_arrays():
        ins.append(tbl)
        specs.append(pl.BlockSpec(
            tbl.shape, lambda e: (0, 0, 0), memory_space=pltpu.VMEM
        ))
    if plan.mp is not None:
        for tbl in plan.mp.table_arrays():
            ins.append(tbl)
            specs.append(pl.BlockSpec(
                tbl.shape, lambda e: (0,) * tbl.ndim,
                memory_space=pltpu.VMEM,
            ))

    nv, ncon = plan.nv, plan.ncon
    kernel = _make_fused_kernel(
        plan, iterations, ls_iterations, scale=scale, tolerance=tolerance,
        grouped=grouped, mega=True, maxd=_MEGA_MAXD,
    )

    def osh(k):
        return jax.ShapeDtypeStruct(
            (k, G, S, 128) if grouped else (k, Ep), f32
        )

    if getattr(plan, "mega_ell", False):
        # x qfrc asm cdist cgid2 cgid1 force(nrows)
        ks = [nv, nv, nv, ncon, ncon, ncon, plan.nrows]
    else:
        ks = [nv, nv, nv, ncon, ncon, ncon * _MEGA_MAXD]
    if plan.euler_dv:
        ks.append(nv)
    if plan.mp is not None:
        ks.append(plan.na)
    outs = pl.pallas_call(
        kernel,
        grid=(G,),
        in_specs=specs,
        out_specs=[spec(k) for k in ks],
        out_shape=[osh(k) for k in ks],
        interpret=pn._INTERPRET,
        compiler_params=pn.vmem_params(plan),
    )(*ins)

    if grouped:
        def back(a):
            return play.from_grouped(
                a.reshape(a.shape[0], G * S, 128), E
            )
    else:
        def back(a):
            return play.moveaxis_last0(a)[:E]

    return tuple(back(o) for o in outs)


_MEGA_CACHE: dict = {}


def get_mega_solver(plan: RowPlan, iterations: int, ls_iterations: int,
                    scale=None, tolerance=None):
    scale = None if scale is None else float(scale)
    tolerance = None if tolerance is None else float(tolerance)
    key = (id(plan), iterations, ls_iterations, scale, tolerance,
           _mega_sublanes(plan))
    hit = _MEGA_CACHE.get(key)
    if hit is not None:
        return hit

    n_out = (7 if getattr(plan, "mega_ell", False) else 6) \
        + int(plan.euler_dv) + int(plan.mp is not None)

    def solve_b(vec):
        return _mega_batched(plan, iterations, ls_iterations, scale,
                             tolerance, vec)

    @jax.custom_batching.custom_vmap
    def solve(vec):
        out = solve_b(vec[None])
        return tuple(o[0] for o in out)

    @solve.def_vmap
    def _vmap(axis_size, in_batched, vec):
        if not in_batched[0]:
            vec = jnp.broadcast_to(vec, (axis_size,) + vec.shape)
        return solve_b(vec), (True,) * n_out

    _MEGA_CACHE[key] = solve
    return solve


def _pad_slots(x, full, fill=0.0):
    """Pad a (plan.ncon, ...)-shaped slot array back to the allocated
    soup size: convex tail slots (staged-driver-only) stay inactive on
    the Pallas paths. Keeps Data pytree shapes stable across paths."""
    n = x.shape[0]
    if full <= n:
        return x
    pad = jnp.full((full - n,) + x.shape[1:], fill, x.dtype)
    return jnp.concatenate([x, pad])


def mega_forward(model: Model, data, plan: RowPlan):
    """Drop-in for the whole forward pass (mj_forward) on mega-capable
    models: FK, collision, smooth stage, constraint assembly and the
    Newton solve all run inside one Pallas program. Position/velocity
    -stage Data fields (xpos/ximat/cdof/contact pos...) are left STALE —
    nothing in the step loop reads them on this path (the env layer reads
    qpos/qvel/GRF only; A1's site-based observation keeps the staged
    path). The contact meta the GRF readout needs (dist/geom ids/
    friction) IS emitted."""
    solver_fn = get_mega_solver(
        plan, model.opt.iterations, model.opt.ls_iterations,
        scale=model.stat_meaninertia * max(1, model.nv),
        tolerance=max(model.opt.tolerance, 1e-6),
    )
    dtype = data.qpos.dtype
    parts = [
        data.qpos, data.qvel, data.act, data.ctrl, data.qfrc_applied,
        data.xfrc_applied.reshape(-1), data.qacc_warmstart,
    ]
    if getattr(plan, "sm_dyn_damping", False):
        parts.append(jnp.asarray(model.dof_damping, dtype))
    vec = jnp.concatenate(parts).astype(dtype)
    outs = solver_fn(vec)
    if getattr(plan, "mega_ell", False):
        return _mega_ell_finish(model, data, plan, outs, dtype)
    x, qfrc, asm, cdist, cgid, cforce = outs[:6]
    nxt = 6
    euler_dv = None
    if plan.euler_dv:
        euler_dv = outs[nxt].astype(dtype)
        nxt += 1
    act_dot = outs[nxt].astype(dtype) if plan.mp is not None else None

    ncon = plan.ncon
    con = data.contact
    full = con.dist.shape[0]
    contact = con.replace(
        dist=_pad_slots(cdist.astype(dtype), full, 1e10),
        geom1=_pad_slots(
            jnp.full((ncon,), plan.colp.plane_gid, con.geom1.dtype), full
        ),
        geom2=_pad_slots(cgid.astype(con.geom2.dtype), full),
        includemargin=_pad_slots(
            jnp.full((ncon,), plan.c_margin, dtype), full
        ),
        friction=_pad_slots(
            jnp.broadcast_to(jnp.asarray(plan.c_fric5, dtype), (ncon, 5)),
            full,
        ),
    )
    maxd = int(data.efc_force_contact.shape[-1])
    efc = cforce.reshape(ncon, _MEGA_MAXD).astype(dtype)
    if maxd > _MEGA_MAXD:
        efc = jnp.concatenate(
            [efc, jnp.zeros((ncon, maxd - _MEGA_MAXD), dtype)], axis=-1
        )
    else:
        efc = efc[:, :maxd]
    efc = _pad_slots(efc, full)

    out = data.replace(
        qacc=x.astype(dtype),
        qacc_smooth=asm.astype(dtype),
        qfrc_constraint=qfrc.astype(dtype),
        efc_force_contact=efc,
        euler_dv=euler_dv,
        contact=contact,
    )
    if act_dot is not None:
        out = out.replace(act_dot=act_dot)
    return out


def _mega_ell_finish(model: Model, data, plan: RowPlan, outs, dtype):
    """mega_forward tail for the extended elliptic path: per-slot contact
    meta from the in-kernel pack (geom1 traced — self-collision pairs),
    per-slot static includemargin/friction from the group statics, and
    efc_force_contact extracted from the full force rows (same rowidx
    gather as fused_constraint)."""
    x, qfrc, asm, cdist, cgid2, cgid1, force = outs[:7]
    euler_dv = outs[7].astype(dtype) if plan.euler_dv else None

    ncon = plan.ncon
    incl = np.zeros(ncon)
    fric = np.zeros((ncon, 5))
    i = 0
    for g in plan.colp.groups:
        nsl = g["k"] * g["slots"]
        incl[i:i + nsl] = g["incl"]
        fric[i:i + nsl] = g["fric5"]
        i += nsl
    con = data.contact
    full = con.dist.shape[0]
    contact = con.replace(
        dist=_pad_slots(cdist.astype(dtype), full, 1e10),
        geom1=_pad_slots(cgid1.astype(con.geom1.dtype), full),
        geom2=_pad_slots(cgid2.astype(con.geom2.dtype), full),
        includemargin=_pad_slots(jnp.asarray(incl, dtype), full),
        friction=_pad_slots(jnp.asarray(fric, dtype), full),
    )

    efc_force_contact = data.efc_force_contact
    if efc_force_contact.shape[-1]:
        maxd = int(efc_force_contact.shape[-1])
        rowidx = np.zeros((ncon, maxd), dtype=np.int32)
        rowmsk = np.zeros((ncon, maxd), dtype=bool)
        s0 = plan.ne + plan.nfl + plan.nl + plan.npad
        for c in range(ncon):
            nrow = min(plan.rows_per[c], maxd)
            if plan.elliptic:
                rowidx[c, :nrow] = plan.con_efcadr[c] + np.arange(nrow)
            else:
                # blocked facet layout: facet f of slot c at s0 + f*ncon + c
                rowidx[c, :nrow] = s0 + np.arange(nrow) * ncon + c
            rowmsk[c, :nrow] = True
        efc_force_contact = _pad_slots(jnp.where(
            jnp.asarray(rowmsk), force[jnp.asarray(rowidx)], 0.0
        ).astype(dtype), full)

    return data.replace(
        qacc=x.astype(dtype),
        qacc_smooth=asm.astype(dtype),
        qfrc_constraint=qfrc.astype(dtype),
        efc_force_contact=efc_force_contact,
        euler_dv=euler_dv,
        contact=contact,
    )


# ---------------------------------------------------------------------------
# megastep: the ENTIRE control step (n_substeps physics steps, including the
# RK4 stage loop and the integrator combines) as ONE Pallas program
# ---------------------------------------------------------------------------
def _act_bounds_static(model: Model):
    """Static per-act-slot clamp bounds (forward._advance_act semantics),
    or None when the needed leaves are traced."""
    if model.na == 0:
        return None
    lim = _conc(model.actuator_actlimited)
    rng_ = _conc(model.actuator_actrange)
    aadr = _conc(model.actuator_actadr)
    if lim is None or rng_ is None or aadr is None:
        return None
    lo = np.full(model.na, -np.inf)
    hi = np.full(model.na, np.inf)
    for u in range(model.nu):
        adr = int(aadr[u])
        if adr >= 0 and lim[u]:
            lo[adr], hi[adr] = float(rng_[u, 0]), float(rng_[u, 1])
    return tuple((float(a), float(b)) for a, b in zip(lo, hi))


def _make_megastep_kernel(plan: RowPlan, iterations, ls_iterations, scale,
                          tolerance, grouped, n_steps, rk4, use_dv,
                          act_bounds, maxd=4):
    """Kernel: loop the fused mega forward over n_steps physics substeps
    with the integrator (Euler w/ in-kernel implicit-damping dv, or the
    RK4 tableau as a coefficient-selected stage loop) applied in-kernel.
    Carried state: qpos, qvel, act, qacc_warmstart. Emits only the final
    carried state — every derived Data field stays stale, per the mega
    path's documented contract (mega_forward docstring). Per-forward
    outputs (qacc / euler_dv / act_dot) round-trip through VMEM scratch
    because the fast/full solve branches write under pl.when and cannot
    return values."""
    nq, nv, na = plan.nq, plan.nv, plan.na
    dt = plan.timestep

    def kernel(*refs):
        from . import pallas_fk as pfk

        n_tbl = plan.colp.n_mesh_tables
        n_mtbl = pfk.N_MUSCLE_TABLES if plan.mp is not None else 0
        vp_ref = refs[0]
        tbl_refs = refs[1:1 + n_tbl]
        mus_refs = refs[1 + n_tbl:1 + n_tbl + n_mtbl]
        qpos_ref, qvel_ref, act_ref, ws_ref = refs[1 + n_tbl + n_mtbl:]

        def rd(ref):
            v = ref[...]
            if grouped:
                return v.reshape(*v.shape[:-3], *v.shape[-2:])
            return v

        def wr(ref, v):
            ref[...] = v[:, None] if grouped else v

        vp = rd(vp_ref)
        qpos0 = vp[0:nq]
        qvel0 = vp[nq:nq + nv]
        o_act = nq + nv
        o_ws = o_act + na + plan.sm_nu + nv + 6 * plan.nbody
        ws0 = vp[o_ws:o_ws + nv]
        eshape = qpos0.shape[1:]
        f32 = qpos0.dtype

        # act clamp as STATIC python scalars (jnp constants would be
        # closure captures, which pallas_call rejects). Uniform bounds —
        # the muscle case, actrange [0, 1] everywhere — collapse to one
        # whole-array clip.
        clamp_act = None
        if na and act_bounds is not None:
            uniq = set(act_bounds)
            if len(uniq) == 1:
                lo0, hi0 = act_bounds[0]
                if np.isfinite(lo0) or np.isfinite(hi0):
                    def clamp_act(a):
                        return jnp.clip(a, lo0, hi0)
            else:
                def clamp_act(a):
                    return jnp.stack([
                        jnp.clip(a[i], *act_bounds[i])
                        if (np.isfinite(act_bounds[i][0])
                            or np.isfinite(act_bounds[i][1]))
                        else a[i]
                        for i in range(na)
                    ])

        def scoped(x_s, dv_s, adot_s):
            def w_to(ref):
                def w(v):
                    ref[...] = v

                return w

            W = {"x": w_to(x_s)}
            if use_dv:
                W["euler_dv"] = w_to(dv_s)
            if plan.mp is not None:
                W["act_dot"] = w_to(adot_s)

            def fwd_once(qpos, qvel, act, ws):
                ag = (lambda s, act=act: act[s]) if na else None
                _forward_env_block(
                    plan, iterations, ls_iterations, scale, tolerance,
                    True, maxd, vp, None, tbl_refs, mus_refs,
                    qpos, qvel, ag, ws, W,
                )

            if rk4:
                # mj_RungeKutta's fixed tableau, stage-uniform body with
                # coefficient selection by stage index (one forward body in
                # the compiled program instead of four)
                def substep(_, c):
                    qpos, qvel, ws = c

                    def stage(i, sc):
                        # ws_run: stage 1 uses the carried warmstart; the
                        # stage-1 qacc then becomes the warmstart for
                        # stages 2-4 AND the next substep (mj_step copies
                        # qacc -> qacc_warmstart right after the first
                        # forward, before mj_RungeKutta's stage loop)
                        qs, vs, aq, av, ws_run = sc
                        fwd_once(qs, vs, None, ws_run)
                        qacc = x_s[...]
                        bi = jnp.where(
                            (i == 0) | (i == 3), 1.0 / 6.0, 1.0 / 3.0
                        ).astype(f32)
                        aq = aq + bi * vs
                        av = av + bi * qacc
                        ws_run = jnp.where(i == 0, qacc, ws_run)
                        ai = jnp.where(i == 2, 1.0, 0.5).astype(f32)
                        qs = qpos + (dt * ai) * vs
                        vs = qvel + (dt * ai) * qacc
                        return (qs, vs, aq, av, ws_run)

                    zer = jnp.zeros_like(qvel)
                    _qs, _vs, aq, av, ws1 = jax.lax.fori_loop(
                        0, 4, stage, (qpos, qvel, zer, zer, ws)
                    )
                    return (qpos + dt * aq, qvel + dt * av, ws1)

                qpos, qvel, ws = jax.lax.fori_loop(
                    0, n_steps, substep, (qpos0, qvel0, ws0)
                )
                act = None
            else:
                def substep(_, c):
                    qpos, qvel, act, ws = c
                    fwd_once(qpos, qvel, act, ws)
                    qacc = x_s[...]
                    dv = dv_s[...] if use_dv else qacc
                    qvel2 = qvel + dt * dv
                    qpos2 = qpos + dt * qvel2
                    if na:
                        act2 = act + dt * adot_s[...]
                        if clamp_act is not None:
                            act2 = clamp_act(act2)
                    else:
                        act2 = act
                    return (qpos2, qvel2, act2, qacc)

                init_act = (
                    vp[o_act:o_act + na] if na
                    else jnp.zeros_like(qpos0[:1])
                )
                qpos, qvel, act, ws = jax.lax.fori_loop(
                    0, n_steps, substep, (qpos0, qvel0, init_act, ws0)
                )
            wr(qpos_ref, qpos)
            wr(qvel_ref, qvel)
            wr(act_ref,
               act if (act is not None and na) else jnp.zeros_like(qpos0[:1]))
            wr(ws_ref, ws)

        pl.run_scoped(
            scoped,
            pltpu.VMEM((nv, *eshape), jnp.float32),
            pltpu.VMEM((nv if use_dv else 1, *eshape), jnp.float32),
            pltpu.VMEM((max(na, 1), *eshape), jnp.float32),
        )

    return kernel


def _megastep_batched(plan: RowPlan, iterations, ls_iterations, scale,
                      tolerance, n_steps, rk4, use_dv, act_bounds, vec):
    """Batched megastep entry; layout identical to _mega_batched."""
    E = vec.shape[0]
    f32 = jnp.float32
    S = _mega_sublanes(plan)
    grouped = S > 1 and E > 128
    if grouped:
        R = (((E + 127) // 128 + S - 1) // S) * S
        G = R // S
        Ep = R * 128
    else:
        S = 1
        G = (E + _BE - 1) // _BE
        Ep = G * _BE

    def tl(x):
        if grouped:
            g = play.to_grouped(x.astype(f32), r_pad=S)
            return g.reshape(x.shape[1], G, S, 128)
        x = play.moveaxis0_last(x.astype(f32))
        if Ep != E:
            x = jnp.pad(x, [(0, 0)] * (x.ndim - 1) + [(0, Ep - E)])
        return x

    nvec = vec.shape[1]

    if grouped:
        def spec(*dims):
            nd = len(dims)
            return pl.BlockSpec(
                (*dims, 1, S, 128),
                lambda e: (0,) * nd + (e, 0, 0),
                memory_space=pltpu.VMEM,
            )
    else:
        def spec(*dims):
            nd = len(dims)
            return pl.BlockSpec(
                (*dims, _BE),
                lambda e: (0,) * nd + (e,),
                memory_space=pltpu.VMEM,
            )

    ins = [tl(vec)]
    specs = [spec(nvec)]
    for tbl in plan.colp.mesh_table_arrays():
        ins.append(tbl)
        specs.append(pl.BlockSpec(
            tbl.shape, lambda e: (0, 0, 0), memory_space=pltpu.VMEM
        ))
    if plan.mp is not None:
        for tbl in plan.mp.table_arrays():
            ins.append(tbl)
            specs.append(pl.BlockSpec(
                tbl.shape, lambda e: (0,) * tbl.ndim,
                memory_space=pltpu.VMEM,
            ))

    nq, nv, na = plan.nq, plan.nv, plan.na
    kernel = _make_megastep_kernel(
        plan, iterations, ls_iterations, scale, tolerance, grouped,
        n_steps, rk4, use_dv, act_bounds, maxd=_MEGA_MAXD,
    )

    def osh(k):
        return jax.ShapeDtypeStruct(
            (k, G, S, 128) if grouped else (k, Ep), f32
        )

    ks = [nq, nv, max(na, 1), nv]
    outs = pl.pallas_call(
        kernel,
        grid=(G,),
        in_specs=specs,
        out_specs=[spec(k) for k in ks],
        out_shape=[osh(k) for k in ks],
        interpret=pn._INTERPRET,
        compiler_params=pn.vmem_params(plan),
    )(*ins)

    if grouped:
        def back(a):
            return play.from_grouped(
                a.reshape(a.shape[0], G * S, 128), E
            )
    else:
        def back(a):
            return play.moveaxis_last0(a)[:E]

    return tuple(back(o) for o in outs)


_MEGASTEP_CACHE: dict = {}


def get_megastep_solver(plan: RowPlan, iterations, ls_iterations,
                        scale, tolerance, n_steps, rk4, use_dv, act_bounds):
    scale = None if scale is None else float(scale)
    tolerance = None if tolerance is None else float(tolerance)
    key = (id(plan), iterations, ls_iterations, scale, tolerance,
           n_steps, rk4, use_dv, act_bounds, _mega_sublanes(plan))
    hit = _MEGASTEP_CACHE.get(key)
    if hit is not None:
        return hit

    def solve_b(vec):
        return _megastep_batched(plan, iterations, ls_iterations, scale,
                                 tolerance, n_steps, rk4, use_dv,
                                 act_bounds, vec)

    @jax.custom_batching.custom_vmap
    def solve(vec):
        out = solve_b(vec[None])
        return tuple(o[0] for o in out)

    @solve.def_vmap
    def _vmap(axis_size, in_batched, vec):
        if not in_batched[0]:
            vec = jnp.broadcast_to(vec, (axis_size,) + vec.shape)
        return solve_b(vec), (True,) * 4

    _MEGASTEP_CACHE[key] = solve
    return solve


def mega_step_n(model: Model, data, plan: RowPlan, n_steps: int):
    """Drop-in for n_steps sequential mj_steps on mega-capable models: the
    whole control step runs as ONE Pallas program (forward + integrator,
    looped in-kernel). Returns updated Data with qpos/qvel/act/qacc/
    qacc_warmstart/time current and every derived field stale (the same
    contract as mega_forward — nothing in the env step loop reads them).
    Returns None when the integrator/act configuration is unsupported."""
    from ..core.types import DisableBit as _DB
    from ..core.types import IntegratorType as _IT

    integ = int(model.opt.integrator)
    if integ == int(_IT.RK4):
        if model.na:
            return None
        rk4, use_dv = True, False
    elif integ == int(_IT.EULER):
        rk4 = False
        if model.opt.disableflags & _DB.EULERDAMP:
            use_dv = False
        elif plan.euler_dv:
            use_dv = True
        else:
            return None  # traced damping: keep the per-substep path
    else:
        return None
    act_bounds = _act_bounds_static(model) if model.na else None
    if model.na and act_bounds is None:
        return None

    solver_fn = get_megastep_solver(
        plan, model.opt.iterations, model.opt.ls_iterations,
        scale=model.stat_meaninertia * max(1, model.nv),
        tolerance=max(model.opt.tolerance, 1e-6),
        n_steps=int(n_steps), rk4=rk4, use_dv=use_dv,
        act_bounds=act_bounds,
    )
    dtype = data.qpos.dtype
    parts = [
        data.qpos, data.qvel, data.act, data.ctrl, data.qfrc_applied,
        data.xfrc_applied.reshape(-1), data.qacc_warmstart,
    ]
    if getattr(plan, "sm_dyn_damping", False):
        parts.append(jnp.asarray(model.dof_damping, dtype))
    vec = jnp.concatenate(parts).astype(dtype)
    qpos, qvel, act, ws = solver_fn(vec)
    return data.replace(
        qpos=qpos.astype(dtype),
        qvel=qvel.astype(dtype),
        act=act[:model.na].astype(dtype) if model.na else data.act,
        qacc=ws.astype(dtype),
        qacc_warmstart=ws.astype(dtype),
        time=data.time + n_steps * plan.timestep,
    )
