"""Actuation: transmission, activation dynamics, gain/bias force production.

Covers exactly the actuator inventory of the robot suite (SURVEY.md C4/C21/
C22): joint-transmission `motor`s (torque humanoid, Atlas, Talos, H1, G1,
A1-torque), joint `position` servos (A1-position: gaintype FIXED + biastype
AFFINE), `general` actuators (MyoSkeleton), and tendon-transmission `muscle`s
(92-muscle humanoid: dyntype/gaintype/biastype MUSCLE).

Mixed actuator types inside one model (muscle humanoid: 14 arm motors + 92
muscles) are handled branch-free: every formula is evaluated for all
actuators and combined with static masks — nu <= 106, so the redundant
lanes are free on the VPU.

Muscle model follows MuJoCo's mju_muscleGain / mju_muscleBias /
mju_muscleDynamics (piecewise quadratic FLV surfaces), validated numerically
against the host oracle in tests/test_smooth.py.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from ..core.types import (
    BiasType,
    Data,
    DisableBit,
    DynType,
    GainType,
    Model,
    TrnType,
)


def _muscle_lnorm(length, lengthrange, prm):
    """Normalized muscle length L in optimum-length units."""
    r0, r1 = prm[..., 0], prm[..., 1]
    l0 = (lengthrange[..., 1] - lengthrange[..., 0]) / jnp.maximum(r1 - r0, 1e-15)
    return r0 + (length - lengthrange[..., 0]) / jnp.maximum(l0, 1e-15), l0


def _bump(length, lmin, mid, lmax):
    """MuJoCo's skewed bump function (mju_muscleGain helper)."""
    left = 0.5 * (lmin + mid)
    right = 0.5 * (mid + lmax)

    out = jnp.zeros_like(length)
    # lmin..left: 0.5 x^2
    x = (length - lmin) / jnp.maximum(left - lmin, 1e-15)
    out = jnp.where((length > lmin) & (length <= left), 0.5 * x * x, out)
    # left..mid: 1 - 0.5 x^2
    x = (mid - length) / jnp.maximum(mid - left, 1e-15)
    out = jnp.where((length > left) & (length <= mid), 1.0 - 0.5 * x * x, out)
    # mid..right: 1 - 0.5 x^2
    x = (length - mid) / jnp.maximum(right - mid, 1e-15)
    out = jnp.where((length > mid) & (length <= right), 1.0 - 0.5 * x * x, out)
    # right..lmax: 0.5 x^2
    x = (lmax - length) / jnp.maximum(lmax - right, 1e-15)
    out = jnp.where((length > right) & (length < lmax), 0.5 * x * x, out)
    return out


def muscle_gain(length, vel, lengthrange, acc0, prm):
    """mju_muscleGain: -force * FL(L) * FV(V)."""
    lmin, lmax = prm[..., 4], prm[..., 5]
    vmax, fvmax = prm[..., 6], prm[..., 8]
    force = prm[..., 2]
    scale = prm[..., 3]
    force = jnp.where(force < 0, scale / jnp.maximum(acc0, 1e-15), force)

    ln, l0 = _muscle_lnorm(length, lengthrange, prm)
    v = vel / jnp.maximum(l0 * vmax, 1e-15)

    fl = _bump(ln, lmin, 1.0, lmax)

    y = fvmax - 1.0
    fv = jnp.where(
        v <= -1.0,
        0.0,
        jnp.where(
            v <= 0.0,
            (v + 1.0) * (v + 1.0),
            jnp.where(v <= y, fvmax - (y - v) * (y - v) / jnp.maximum(y, 1e-15), fvmax),
        ),
    )
    return -force * fl * fv


def muscle_bias(length, lengthrange, acc0, prm):
    """mju_muscleBias: passive force -force * FP(L)."""
    lmax = prm[..., 5]
    fpmax = prm[..., 7]
    force = prm[..., 2]
    scale = prm[..., 3]
    force = jnp.where(force < 0, scale / jnp.maximum(acc0, 1e-15), force)

    ln, _ = _muscle_lnorm(length, lengthrange, prm)
    b = 0.5 * (1.0 + lmax)
    x_mid = (ln - 1.0) / jnp.maximum(b - 1.0, 1e-15)
    x_hi = (ln - b) / jnp.maximum(b - 1.0, 1e-15)
    # piecewise: 0 below optimum, quadratic ramp to 0.5*fpmax at b, then
    # linear extrapolation with slope fpmax (continuous at b)
    fp = jnp.where(
        ln <= 1.0,
        0.0,
        jnp.where(
            ln <= b,
            0.5 * fpmax * x_mid * x_mid,
            fpmax * (0.5 + x_hi),
        ),
    )
    return -force * fp


def muscle_dynamics(ctrl, act, prm):
    """mju_muscleDynamics with tausmooth = 0 (the suite's setting)."""
    ctrl = jnp.clip(ctrl, 0.0, 1.0)
    act_c = jnp.clip(act, 0.0, 1.0)
    tau_act = prm[..., 0] * (0.5 + 1.5 * act_c)
    tau_deact = prm[..., 1] / (0.5 + 1.5 * act_c)
    tau = jnp.where(ctrl > act, tau_act, tau_deact)
    return (ctrl - act) / jnp.maximum(tau, 1e-15)


def _moment(model: Model, data: Data) -> jnp.ndarray:
    """Dense actuator moment matrix (nu, nv)."""
    nu, nv = model.nu, model.nv
    dtype = data.qpos.dtype
    gear0 = model.actuator_gear[:, 0]

    # joint transmission: static one-hot (nu, nv) scaled by gear
    joint_sel = np.zeros((nu, nv), dtype=np.float64)
    tendon_rows = np.zeros((nu, model.ntendon if model.ntendon else 1), dtype=np.float64)
    for u in range(nu):
        t = int(model.actuator_trntype[u])
        tid = int(model.actuator_trnid[u, 0])
        if t in (int(TrnType.JOINT), int(TrnType.JOINTINPARENT)):
            joint_sel[u, int(model.jnt_dofadr[tid])] = 1.0
        elif t == int(TrnType.TENDON):
            tendon_rows[u, tid] = 1.0
        else:
            raise NotImplementedError(f"actuator transmission {t}")

    moment = jnp.asarray(joint_sel, dtype=dtype) * gear0[:, None]
    if model.ntendon:
        moment = moment + (
            jnp.asarray(tendon_rows, dtype=dtype) @ data.ten_J
        ) * gear0[:, None]
    return moment


def actuation(model: Model, data: Data) -> Data:
    """Transmission lengths/velocities, act_dot, forces, qfrc_actuator."""
    dtype = data.qpos.dtype
    nu, nv = model.nu, model.nv
    if nu == 0:
        return data.replace(qfrc_actuator=jnp.zeros(nv, dtype=dtype))

    gear0 = model.actuator_gear[:, 0]
    trn = model.actuator_trntype
    is_joint = jnp.asarray(
        (trn == int(TrnType.JOINT)) | (trn == int(TrnType.JOINTINPARENT))
    )
    is_tendon = jnp.asarray(trn == int(TrnType.TENDON))

    # transmission length / velocity
    jnt_q = model.jnt_qposadr[np.clip(model.actuator_trnid[:, 0], 0, model.njnt - 1)]
    len_joint = data.qpos[jnt_q] * gear0
    if model.ntendon:
        tid = np.where(
            trn == int(TrnType.TENDON), model.actuator_trnid[:, 0], 0
        )
        len_tendon = data.ten_length[tid] * gear0
    else:
        len_tendon = jnp.zeros(nu, dtype=dtype)
    actuator_length = jnp.where(is_joint, len_joint, len_tendon)

    moment = _moment(model, data)
    actuator_velocity = moment @ data.qvel

    # ctrl clamping
    ctrl = data.ctrl
    if not (model.opt.disableflags & DisableBit.CLAMPCTRL):
        limited = jnp.asarray(model.actuator_ctrllimited.astype(bool))
        ctrl = jnp.where(
            limited,
            jnp.clip(ctrl, model.actuator_ctrlrange[:, 0], model.actuator_ctrlrange[:, 1]),
            ctrl,
        )

    # activation dynamics → act_dot; input to force law
    dyn = model.actuator_dyntype
    has_act = np.any(dyn != int(DynType.NONE))
    if has_act:
        # map act slots: actuators with actnum==1 read act[actadr]
        act_idx = np.where(
            model.actuator_actadr >= 0, model.actuator_actadr, 0
        )
        act_u = data.act[act_idx]
        dyn_muscle = jnp.asarray(dyn == int(DynType.MUSCLE))
        dyn_filter = jnp.asarray(
            (dyn == int(DynType.FILTER)) | (dyn == int(DynType.FILTEREXACT))
        )
        tau = jnp.maximum(model.actuator_dynprm[:, 0], 1e-15)
        ad_muscle = muscle_dynamics(ctrl, act_u, model.actuator_dynprm)
        ad_filter = (ctrl - act_u) / tau
        act_dot_u = jnp.where(
            dyn_muscle, ad_muscle, jnp.where(dyn_filter, ad_filter, 0.0)
        )
        # scatter per-actuator act_dot into the act vector
        scatter = np.zeros((model.na, nu))
        for u in range(nu):
            if model.actuator_actadr[u] >= 0:
                scatter[int(model.actuator_actadr[u]), u] = 1.0
        act_dot = jnp.asarray(scatter, dtype=dtype) @ act_dot_u
        force_input = jnp.where(
            jnp.asarray(dyn != int(DynType.NONE)), act_u, ctrl
        )
    else:
        act_dot = jnp.zeros(model.na, dtype=dtype)
        force_input = ctrl

    # gain
    gp = model.actuator_gainprm
    gain_fixed = gp[:, 0]
    gain_affine = gp[:, 0] + gp[:, 1] * actuator_length + gp[:, 2] * actuator_velocity
    gain_muscle = muscle_gain(
        actuator_length,
        actuator_velocity,
        model.actuator_lengthrange,
        model.actuator_acc0,
        gp,
    )
    gt = model.actuator_gaintype
    gain = jnp.where(
        jnp.asarray(gt == int(GainType.MUSCLE)),
        gain_muscle,
        jnp.where(jnp.asarray(gt == int(GainType.AFFINE)), gain_affine, gain_fixed),
    )

    # bias
    bp = model.actuator_biasprm
    bias_affine = bp[:, 0] + bp[:, 1] * actuator_length + bp[:, 2] * actuator_velocity
    bias_muscle = muscle_bias(
        actuator_length, model.actuator_lengthrange, model.actuator_acc0, bp
    )
    bt = model.actuator_biastype
    bias = jnp.where(
        jnp.asarray(bt == int(BiasType.MUSCLE)),
        bias_muscle,
        jnp.where(jnp.asarray(bt == int(BiasType.AFFINE)), bias_affine, 0.0),
    )

    force = gain * force_input + bias
    f_limited = jnp.asarray(model.actuator_forcelimited.astype(bool))
    force = jnp.where(
        f_limited,
        jnp.clip(force, model.actuator_forcerange[:, 0], model.actuator_forcerange[:, 1]),
        force,
    )

    if model.opt.disableflags & DisableBit.ACTUATION:
        force = jnp.zeros_like(force)
        act_dot = jnp.zeros_like(act_dot)

    qfrc_actuator = moment.T @ force
    return data.replace(
        actuator_length=actuator_length,
        actuator_velocity=actuator_velocity,
        actuator_force=force,
        act_dot=act_dot,
        qfrc_actuator=qfrc_actuator,
    )
