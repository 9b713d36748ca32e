"""Smooth-dynamics parity vs CPU MuJoCo: mass matrix, bias forces, passive,
actuation, tendon geometry, and integrated steps with constraints disabled."""

import jax.numpy as jnp
import mujoco
import numpy as np
import pytest

from loco_mujoco_tpu.core.io import load_mj_model, make_data, put_model
from loco_mujoco_tpu.ops import forward as fwd
import jax

_jit_forward = jax.jit(fwd.forward)
_jit_step = jax.jit(fwd.step)

XMLS = [
    "quadrupeds/unitree_a1_torque.xml",
    "quadrupeds/unitree_a1_position.xml",
    "humanoid/humanoid_torque.xml",
    "humanoid/humanoid_muscle.xml",
    "atlas/atlas.xml",
    "talos/talos.xml",
    "unitree_g1/g1.xml",
    "unitree_h1/h1.xml",
]

DSBL = mujoco.mjtDisableBit.mjDSBL_CONSTRAINT


def _dense_m(mj_model, mj_data):
    out = np.zeros((mj_model.nv, mj_model.nv))
    mujoco.mj_fullM(mj_model, mj_data, out)
    return out


@pytest.fixture(params=XMLS)
def pair(request, ref_data_dir):
    mj_model = load_mj_model(f"{ref_data_dir}/{request.param}")
    mj_model.opt.disableflags |= DSBL
    model = put_model(mj_model, dtype=jnp.float64)
    return mj_model, model


def _random_state(mj_model, rng, scale=0.2):
    qpos = mj_model.qpos0 + rng.normal(scale=scale, size=mj_model.nq)
    qvel = rng.normal(scale=scale, size=mj_model.nv)
    ctrl = rng.normal(scale=0.3, size=mj_model.nu)
    act = rng.uniform(0.1, 0.9, size=mj_model.na)
    return qpos, qvel, ctrl, act


def test_smooth_forward_matches_mujoco(pair):
    mj_model, model = pair
    mj_data = mujoco.MjData(mj_model)
    rng = np.random.default_rng(1)

    for _ in range(3):
        qpos, qvel, ctrl, act = _random_state(mj_model, rng)
        mj_data.qpos[:] = qpos
        mj_data.qvel[:] = qvel
        mj_data.ctrl[:] = ctrl
        mj_data.act[:] = act
        mujoco.mj_forward(mj_model, mj_data)

        data = make_data(model).replace(
            qpos=jnp.asarray(qpos),
            qvel=jnp.asarray(qvel),
            ctrl=jnp.asarray(ctrl),
            act=jnp.asarray(act),
        )
        data = _jit_forward(model, data)

        np.testing.assert_allclose(data.qM, _dense_m(mj_model, mj_data), atol=1e-9)
        if mj_model.ntendon:
            np.testing.assert_allclose(
                data.ten_length, mj_data.ten_length, atol=1e-9
            )
            ten_j = np.zeros((mj_model.ntendon, mj_model.nv))
            for t in range(mj_model.ntendon):
                nnz = int(mj_model.ten_J_rownnz[t])
                adr = int(mj_model.ten_J_rowadr[t])
                cols = mj_model.ten_J_colind[adr : adr + nnz]
                ten_j[t, cols] = mj_data.ten_J[adr : adr + nnz]
            np.testing.assert_allclose(data.ten_J, ten_j, atol=1e-8)
            np.testing.assert_allclose(
                data.ten_velocity, mj_data.ten_velocity, atol=1e-8
            )
        np.testing.assert_allclose(data.cvel, mj_data.cvel, atol=1e-9)
        np.testing.assert_allclose(data.qfrc_bias, mj_data.qfrc_bias, atol=1e-8)
        np.testing.assert_allclose(
            data.qfrc_passive, mj_data.qfrc_passive, atol=1e-9
        )
        np.testing.assert_allclose(
            data.actuator_length, mj_data.actuator_length, atol=1e-9
        )
        np.testing.assert_allclose(
            data.actuator_velocity, mj_data.actuator_velocity, atol=1e-8
        )
        np.testing.assert_allclose(
            data.actuator_force, mj_data.actuator_force, atol=1e-7
        )
        np.testing.assert_allclose(data.act_dot, mj_data.act_dot, atol=1e-8)
        np.testing.assert_allclose(
            data.qfrc_actuator, mj_data.qfrc_actuator, atol=1e-7
        )
        np.testing.assert_allclose(
            data.qacc_smooth, mj_data.qacc_smooth, atol=1e-6
        )
        np.testing.assert_allclose(data.qacc, mj_data.qacc, atol=1e-6)


def test_smooth_step_matches_mujoco(pair):
    mj_model, model = pair
    mj_data = mujoco.MjData(mj_model)
    rng = np.random.default_rng(2)

    qpos, qvel, ctrl, act = _random_state(mj_model, rng, scale=0.05)
    mj_data.qpos[:] = qpos
    mj_data.qvel[:] = qvel
    mj_data.ctrl[:] = ctrl
    mj_data.act[:] = act

    data = make_data(model).replace(
        qpos=jnp.asarray(qpos),
        qvel=jnp.asarray(qvel),
        ctrl=jnp.asarray(ctrl),
        act=jnp.asarray(act),
    )

    for i in range(10):
        mujoco.mj_step(mj_model, mj_data)
        data = _jit_step(model, data)
        np.testing.assert_allclose(
            data.qpos, mj_data.qpos, atol=1e-8,
            err_msg=f"qpos diverged at step {i}",
        )
        np.testing.assert_allclose(
            data.qvel, mj_data.qvel, atol=1e-6,
            err_msg=f"qvel diverged at step {i}",
        )
        if mj_model.na:
            np.testing.assert_allclose(
                data.act, mj_data.act, atol=1e-8,
                err_msg=f"act diverged at step {i}",
            )
