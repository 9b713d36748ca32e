"""Constraint assembly + Newton solver parity vs CPU MuJoCo (no contacts:
equality couplings, dof friction loss, joint limits)."""

import jax.numpy as jnp
import mujoco
import numpy as np
import pytest

from loco_mujoco_tpu.core.io import load_mj_model, make_data, put_model
from loco_mujoco_tpu.ops import constraint as con_mod
from loco_mujoco_tpu.ops import forward as fwd
import jax

_jit_forward = jax.jit(fwd.forward)
_jit_step = jax.jit(fwd.step)


def _posvel(model, data):
    data = fwd.fwd_position(model, data)
    return fwd.fwd_velocity(model, data)


_jit_posvel = jax.jit(_posvel)
_jit_makecon = jax.jit(con_mod.make_constraint)

XMLS = [
    "quadrupeds/unitree_a1_torque.xml",  # friction loss + limits, elliptic opts
    "humanoid/humanoid_torque.xml",  # joint equality couplings + limits
    "humanoid/humanoid_muscle.xml",  # equality + muscles
    "talos/talos.xml",  # friction loss + limits
    "unitree_g1/g1.xml",
    "unitree_h1/h1.xml",
    "atlas/atlas.xml",  # RK4
]

DSBL_CONTACT = mujoco.mjtDisableBit.mjDSBL_CONTACT


def _dense_efc_j(mj_model, mj_data):
    nefc, nv = mj_data.nefc, mj_model.nv
    if mj_data.efc_J.size == nefc * nv:
        return mj_data.efc_J[: nefc * nv].reshape(nefc, nv)
    out = np.zeros((nefc, nv))
    for r in range(nefc):
        nnz = int(mj_data.efc_J_rownnz[r])
        adr = int(mj_data.efc_J_rowadr[r])
        cols = mj_data.efc_J_colind[adr : adr + nnz]
        out[r, cols] = mj_data.efc_J[adr : adr + nnz]
    return out


@pytest.fixture(params=XMLS)
def pair(request, ref_data_dir):
    mj_model = load_mj_model(f"{ref_data_dir}/{request.param}")
    mj_model.opt.disableflags |= DSBL_CONTACT
    mj_model.opt.jacobian = mujoco.mjtJacobian.mjJAC_DENSE
    model = put_model(mj_model, dtype=jnp.float64)
    return mj_model, model


def _set_state(mj_model, mj_data, rng, scale):
    qpos = mj_model.qpos0 + rng.normal(scale=scale, size=mj_model.nq)
    qvel = rng.normal(scale=scale, size=mj_model.nv)
    ctrl = rng.normal(scale=0.3, size=mj_model.nu)
    act = rng.uniform(0.1, 0.9, size=mj_model.na)
    mj_data.qpos[:] = qpos
    mj_data.qvel[:] = qvel
    mj_data.ctrl[:] = ctrl
    mj_data.act[:] = act
    return qpos, qvel, ctrl, act


def test_efc_rows_match(pair):
    mj_model, model = pair
    mj_data = mujoco.MjData(mj_model)
    rng = np.random.default_rng(7)

    for trial in range(3):
        qpos, qvel, ctrl, act = _set_state(mj_model, mj_data, rng, 0.5)
        mujoco.mj_forward(mj_model, mj_data)

        data = make_data(model).replace(
            qpos=jnp.asarray(qpos), qvel=jnp.asarray(qvel),
            ctrl=jnp.asarray(ctrl), act=jnp.asarray(act),
        )
        data = _jit_posvel(model, data)
        efc = _jit_makecon(model, data)

        act_mask = np.asarray(efc.active)
        ours_J = np.asarray(efc.J)[act_mask]
        ours_aref = np.asarray(efc.aref)[act_mask]
        ours_R = np.asarray(efc.R)[act_mask]
        ours_type = efc.type[act_mask]

        nefc = mj_data.nefc
        assert nefc == len(ours_J), (
            f"row count mismatch: mj {nefc} vs ours {len(ours_J)} "
            f"(types mj={mj_data.efc_type[:nefc]}, ours={ours_type})"
        )
        mj_J = _dense_efc_j(mj_model, mj_data)
        np.testing.assert_array_equal(ours_type, mj_data.efc_type[:nefc])
        np.testing.assert_allclose(ours_J, mj_J, atol=1e-9)
        np.testing.assert_allclose(ours_R, mj_data.efc_R[:nefc], atol=1e-9, rtol=1e-9)
        np.testing.assert_allclose(
            ours_aref, mj_data.efc_aref[:nefc], atol=1e-7
        )


def test_qacc_matches(pair):
    mj_model, model = pair
    mj_data = mujoco.MjData(mj_model)
    rng = np.random.default_rng(8)

    for trial in range(3):
        qpos, qvel, ctrl, act = _set_state(mj_model, mj_data, rng, 0.4)
        mujoco.mj_forward(mj_model, mj_data)

        data = make_data(model).replace(
            qpos=jnp.asarray(qpos), qvel=jnp.asarray(qvel),
            ctrl=jnp.asarray(ctrl), act=jnp.asarray(act),
        )
        data = _jit_forward(model, data)
        np.testing.assert_allclose(
            data.qacc, mj_data.qacc, atol=1e-4, rtol=1e-6,
            err_msg=f"qacc mismatch trial {trial}",
        )
        np.testing.assert_allclose(
            data.qfrc_constraint, mj_data.qfrc_constraint, atol=1e-4, rtol=1e-6,
        )


def test_step_rollout_matches(pair):
    mj_model, model = pair
    mj_data = mujoco.MjData(mj_model)
    rng = np.random.default_rng(9)

    qpos, qvel, ctrl, act = _set_state(mj_model, mj_data, rng, 0.1)
    data = make_data(model).replace(
        qpos=jnp.asarray(qpos), qvel=jnp.asarray(qvel),
        ctrl=jnp.asarray(ctrl), act=jnp.asarray(act),
    )
    for i in range(20):
        mujoco.mj_step(mj_model, mj_data)
        data = _jit_step(model, data)
        np.testing.assert_allclose(
            data.qpos, mj_data.qpos, atol=1e-7,
            err_msg=f"qpos diverged at step {i}",
        )
        np.testing.assert_allclose(
            data.qvel, mj_data.qvel, atol=1e-5,
            err_msg=f"qvel diverged at step {i}",
        )
