"""Forward dynamics driver and integrators.

Mirrors the stage structure of MuJoCo's mj_forward / mj_step (the C calls the
reference makes at `environments/base.py:180,362,445`) as a composition of
pure functions over the Data pytree: position stage -> velocity stage ->
actuation -> smooth acceleration -> constraint solve -> integrate. The whole
`step` is jittable and vmaps over envs.

Integrators: EULER (semi-implicit, with implicit joint damping like
mj_Euler's eulerdamp path) and RK4 (Atlas: `data/atlas/atlas.xml:65`).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from ..core.types import Data, DisableBit, IntegratorType, Model
from . import actuation as act_mod
from . import collision as coll_mod
from . import constraint as con_mod
from . import inertia, kinematics, passive, solver, tendon, velocity


import os

_PHYS_PRECISION = os.environ.get("LMT_MATMUL_PRECISION", "highest")


def _exact_f32(fn):
    """Trace the physics stage with full-f32 matmul precision.

    TPU matmuls/einsums truncate f32 inputs to bf16 by default; the mass
    matrix, constraint Hessian and tree-accumulation matmuls then lose
    enough mantissa that H = M + J'WJ can go indefinite and the Newton
    solver diverges (observed: A1 elliptic-cone contacts NaN within 5
    substeps on-chip). Scoped here rather than via the global flag so user
    networks keep fast default precision. Override with
    LMT_MATMUL_PRECISION={default,high,highest} (perf/accuracy knob).
    """

    @functools.wraps(fn)
    def wrapped(*a, **kw):
        if _PHYS_PRECISION == "default":
            return fn(*a, **kw)
        with jax.default_matmul_precision(_PHYS_PRECISION):
            return fn(*a, **kw)

    return wrapped


@_exact_f32
def fwd_position(model: Model, data: Data) -> Data:
    # static gate (depends only on the contact slot layout, which is
    # identical before/after collision): when the fused constraint kernel
    # runs, it builds M from cinert and does its own M-solves in VMEM — the
    # XLA-side CRB and factorization would be dead code. RK4 models never
    # read data.qM elsewhere; Euler models read it only for the implicit-
    # damping solve, which the kernel also emits (plan.euler_dv) unless
    # damping is traced (domain randomization).
    plan = _fused_plan(model, data)
    data = kinematics.kinematics(model, data)
    if plan is None or not plan.smooth:
        # plan.smooth: com/cinert/cdof are rebuilt inside the fused kernel
        # from the FK outputs — XLA compiles these stages with T(1,128)
        # tilings (1 sublane/tile) on Euler models, ~100 ms/step at 4096
        # envs on H1
        data = kinematics.com_pos(model, data)
    data = tendon.tendon(model, data)
    if plan is None or not (
        model.opt.integrator == int(IntegratorType.RK4)
        or getattr(plan, "euler_dv", False)
    ):
        data = inertia.crb(model, data)
    data = coll_mod.collision(model, data)
    if plan is None:
        data = inertia.factor_m(model, data)
    return data


@_exact_f32
def fwd_velocity(model: Model, data: Data) -> Data:
    plan = _fused_plan(model, data)
    if plan is not None and plan.smooth:
        return data  # com_vel/rne/passive run inside the fused kernel
    data = tendon.tendon_vel(model, data)
    data = velocity.com_vel(model, data)
    data = passive.passive(model, data)
    data = velocity.rne(model, data)
    return data


@_exact_f32
def fwd_actuation(model: Model, data: Data) -> Data:
    plan = _fused_plan(model, data)
    if plan is not None and plan.smooth:
        return data  # motor actuation runs inside the fused kernel
    return act_mod.actuation(model, data)


@_exact_f32
def fwd_acceleration(model: Model, data: Data) -> Data:
    plan = _fused_plan(model, data)
    if plan is not None and plan.smooth:
        return data  # qfrc_smooth assembled inside the fused kernel
    qfrc_smooth = (
        data.qfrc_passive
        - data.qfrc_bias
        + data.qfrc_actuator
        + data.qfrc_applied
    )
    # xfrc_applied is unused by the reference envs (no external pushes), but
    # supported for API parity: project body wrenches through cdof.
    qfrc_smooth = qfrc_smooth + _xfrc_projection(model, data)
    if plan is not None:
        # the fused constraint kernel computes qacc_smooth = M^-1 qfrc_smooth
        # in VMEM and writes it back to Data itself
        return data.replace(qfrc_smooth=qfrc_smooth)
    qacc_smooth = inertia.solve_m(model, data, qfrc_smooth)
    return data.replace(qfrc_smooth=qfrc_smooth, qacc_smooth=qacc_smooth)


def _xfrc_projection(model: Model, data: Data) -> jnp.ndarray:
    # mj_xfrcAccumulate: qfrc += J_body^T xfrc, with J at body com
    xfrc = data.xfrc_applied  # (nbody, 6) [force(3), torque(3)] MuJoCo order
    # world-frame jacobian via cdof: for dof d and body b on its subtree,
    # contribution = cdof_ang . (torque + (p_b - com_root) x force) + cdof_lin . force
    # cheap exact form: torque_eff = torque + (xipos - subtree_com_root) x force
    force = xfrc[:, :3]
    torque = xfrc[:, 3:]
    offset = data.xipos - data.subtree_com[model.body_rootid]
    t_eff = torque + jnp.cross(offset, force)
    # mask[d, b] = body b is in the subtree driven by dof d. The sum over
    # bodies distributes through the per-dof dot products, so fold the mask
    # into t_eff/force first — this avoids materializing a (nv, nbody)
    # intermediate per env (measured 10 ms/step of pure layout traffic for
    # an input that is all zeros in every shipped task).
    mask = jnp.asarray(_dof_body_mask(model), dtype=t_eff.dtype)
    tm = mask @ t_eff   # (nv, 3)
    fm = mask @ force   # (nv, 3)
    return jnp.sum(data.cdof[:, :3] * tm + data.cdof[:, 3:] * fm, axis=-1)


_DOF_BODY_MASK_CACHE: dict = {}


def _dof_body_mask(model: Model) -> np.ndarray:
    key = (
        model.nbody,
        model.nv,
        model.body_parentid.tobytes(),
        model.body_dofadr.tobytes(),
        model.body_dofnum.tobytes(),
    )
    hit = _DOF_BODY_MASK_CACHE.get(key)
    if hit is not None:
        return hit
    mask = np.zeros((model.nv, model.nbody))
    for b in range(1, model.nbody):
        bb = b
        while bb > 0:
            dadr, dnum = int(model.body_dofadr[bb]), int(model.body_dofnum[bb])
            for d in range(dadr, dadr + dnum):
                mask[d, b] = 1.0
            bb = int(model.body_parentid[bb])
    _DOF_BODY_MASK_CACHE[key] = mask
    return mask


def _fused_plan(model: Model, data: Data):
    from . import pallas_constraint as pc

    return pc.maybe_plan(model, data)


@_exact_f32
def fwd_constraint(model: Model, data: Data) -> Data:
    # TPU fast path: constraint assembly + Newton solve as ONE fused Pallas
    # kernel — J is built in VMEM and never exists in HBM (the XLA assembly
    # + the J transpose cost more than the entire solve kernel; see
    # ops/pallas_constraint.py). Pyramidal/limit/friction-loss/JOINT-equality
    # models only; everything else takes the reference XLA path below.
    plan = _fused_plan(model, data)
    if plan is not None:
        from . import pallas_constraint as pc

        return pc.fused_constraint(model, data, plan)
    efc = con_mod.make_constraint(model, data)
    return solver.solve(model, data, efc)


@_exact_f32
def forward(model: Model, data: Data) -> Data:
    # mega fast path: FK + collision + smooth + assembly + Newton as ONE
    # Pallas program per forward — the staged XLA pipeline below remains
    # the reference implementation (and the path every stage test runs).
    # Position/velocity-stage Data fields stay stale on this path; see
    # pallas_constraint.mega_forward.
    plan = _fused_plan(model, data)
    if (
        plan is not None
        and getattr(plan, "mega", False)
        and os.environ.get("LMT_MEGA", "1") != "0"
    ):
        from . import pallas_constraint as pc

        return pc.mega_forward(model, data, plan)
    data = fwd_position(model, data)
    data = fwd_velocity(model, data)
    data = fwd_actuation(model, data)
    data = fwd_acceleration(model, data)
    data = fwd_constraint(model, data)
    return data


def _advance_act(model: Model, data: Data, act_dot: jnp.ndarray, dt) -> jnp.ndarray:
    if model.na == 0:
        return data.act
    act = data.act + dt * act_dot
    # clamp to actrange where limited (muscle activations live in [0, 1])
    limited = model.actuator_actlimited.astype(bool)
    if np.any(limited):
        lo = np.where(limited, np.asarray(model.actuator_actrange)[:, 0], -np.inf)
        hi = np.where(limited, np.asarray(model.actuator_actrange)[:, 1], np.inf)
        # per-actuator ranges scattered to act slots (actnum == 1 everywhere
        # in the suite: muscle/filter activations are scalar)
        alo = np.full(model.na, -np.inf)
        ahi = np.full(model.na, np.inf)
        for u in range(model.nu):
            adr = int(model.actuator_actadr[u])
            if adr >= 0:
                alo[adr], ahi[adr] = lo[u], hi[u]
        act = jnp.clip(act, jnp.asarray(alo, act.dtype), jnp.asarray(ahi, act.dtype))
    return act


def _euler(model: Model, data: Data) -> Data:
    dt = model.opt.timestep
    act = _advance_act(model, data, data.act_dot, dt)

    if model.opt.disableflags & DisableBit.EULERDAMP:
        qvel = data.qvel + dt * data.qacc
    elif data.euler_dv is not None:
        # the fused constraint kernel already solved
        # (M + dt diag(damping))^-1 (M qacc) against its VMEM-resident M
        qvel = data.qvel + dt * data.euler_dv
    else:
        # implicit damping: qvel += dt * (M + dt*diag(damping))^-1 (M qacc).
        # With zero damping this reduces exactly to the explicit update, so
        # the branch MuJoCo takes on damping-free models needs no special
        # case (every robot in the suite has joint damping anyway).
        mh = data.qM + dt * jnp.diag(model.dof_damping)
        total_frc = inertia.mul_m(model, data, data.qacc)
        from . import linalg

        dv = linalg.spd_solve(mh, total_frc)
        qvel = data.qvel + dt * dv

    qpos = data.qpos + dt * qvel  # nq == nv: plain addition, no quaternions
    return data.replace(
        qpos=qpos, qvel=qvel, act=act, time=data.time + dt,
        qacc_warmstart=data.qacc,
    )


def _rk4(model: Model, data: Data) -> Data:
    """mj_RungeKutta with the fixed RK4 tableau."""
    dt = model.opt.timestep
    a = [0.5, 0.5, 1.0]
    b = jnp.array([1.0 / 6, 1.0 / 3, 1.0 / 3, 1.0 / 6], dtype=data.qpos.dtype)

    d0 = data
    qpos0, qvel0, act0 = d0.qpos, d0.qvel, d0.act
    derivs = [(d0.qvel, d0.qacc, d0.act_dot)]

    # mj_step copies qacc -> qacc_warmstart right after the FIRST forward,
    # so mj_RungeKutta's stage-2..4 forwards warm-start from the fresh
    # stage-1 acceleration (not the previous step's). Matching that is
    # both closer parity and faster convergence (the warm-started Newton
    # terminates earlier inside the stage solves).
    d = d0.replace(qacc_warmstart=d0.qacc)
    for i in range(3):
        dq = derivs[i]
        d = d.replace(
            qpos=qpos0 + dt * a[i] * dq[0],
            qvel=qvel0 + dt * a[i] * dq[1],
            act=act0 + dt * a[i] * dq[2] if model.na else act0,
        )
        d = forward(model, d)
        derivs.append((d.qvel, d.qacc, d.act_dot))

    dqpos = sum(b[i] * derivs[i][0] for i in range(4))
    dqvel = sum(b[i] * derivs[i][1] for i in range(4))
    qpos = qpos0 + dt * dqpos
    qvel = qvel0 + dt * dqvel
    if model.na:
        dact = sum(b[i] * derivs[i][2] for i in range(4))
        act = _advance_act(model, d0, dact, dt)
    else:
        act = act0
    # base the returned Data on the LAST stage's `d`: after mj_RungeKutta
    # the mjData derived fields (contacts, efc forces, qacc) are the
    # stage-4 forward's — the reference's per-substep GRF readout consumes
    # exactly those (base.py:623-631), and keeping stage-1's here made the
    # foot-force window lag the oracle by one substep.
    return d.replace(
        qpos=qpos, qvel=qvel, act=act, time=d0.time + dt,
        qacc_warmstart=d0.qacc,
    )


@_exact_f32
def step(model: Model, data: Data) -> Data:
    """One physics step: forward dynamics then integrate (mj_step)."""
    data = forward(model, data)
    if model.opt.integrator == int(IntegratorType.RK4):
        return _rk4(model, data)
    return _euler(model, data)


@_exact_f32
def step_n(model: Model, data: Data, n_steps: int) -> Data | None:
    """n_steps physics steps fused into ONE Pallas program (the megastep
    kernel: forward + RK4/Euler integration looped in-kernel), or None
    when the model is outside the megastep envelope — callers fall back
    to per-step `step` under lax.scan. The env layer only takes this path
    when nothing observes per-substep state (no foot-force window, no
    substep hook); derived Data fields stay stale per the mega contract."""
    if os.environ.get("LMT_MEGASTEP", "1") == "0":
        return None
    if os.environ.get("LMT_MEGA", "1") == "0":
        return None
    plan = _fused_plan(model, data)
    if plan is None or not getattr(plan, "mega", False):
        return None
    from . import pallas_constraint as pc

    return pc.mega_step_n(model, data, plan, n_steps)
