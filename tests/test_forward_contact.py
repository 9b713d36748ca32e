"""Full forward dynamics parity WITH contacts.

Two layers:
 1. robots whose ground contacts are all primitive (A1: sphere/capsule/
    cylinder/box on plane + elliptic cone; Atlas: cylinder/box on plane,
    RK4) — strict end-to-end qacc parity, our narrowphase included;
 2. mesh-footed robots — oracle contacts injected into our Contact slots to
    validate constraint assembly + Newton solver independently of the
    plane-convex manifold-selection divergence (see tests/test_collision.py).
"""

import jax.numpy as jnp
import mujoco
import numpy as np
import pytest

from loco_mujoco_tpu.core.io import load_mj_model, make_data, put_model
from loco_mujoco_tpu.core.types import Contact
from loco_mujoco_tpu.ops import forward as fwd
import jax

_jit_forward = jax.jit(fwd.forward)
_jit_step = jax.jit(fwd.step)
_jit_pos = jax.jit(fwd.fwd_position)


def _rest(model, data):
    data = fwd.fwd_velocity(model, data)
    data = fwd.fwd_actuation(model, data)
    data = fwd.fwd_acceleration(model, data)
    return fwd.fwd_constraint(model, data)


_jit_rest = jax.jit(_rest)

PRIMITIVE_XMLS = [
    "quadrupeds/unitree_a1_torque.xml",
    "atlas/atlas.xml",
]
MESH_XMLS = [
    "unitree_h1/h1.xml",
    "talos/talos.xml",
    "humanoid/humanoid_torque.xml",
]


def _ground_state(mj_model, rng, drop, scale=0.03):
    qpos = mj_model.qpos0 + rng.normal(scale=scale, size=mj_model.nq)
    qpos[2] -= drop
    qvel = rng.normal(scale=0.2, size=mj_model.nv)
    ctrl = rng.normal(scale=0.3, size=mj_model.nu)
    return qpos, qvel, ctrl


@pytest.mark.parametrize("xml", PRIMITIVE_XMLS)
def test_qacc_with_contacts_primitive(ref_data_dir, xml):
    mj_model = load_mj_model(f"{ref_data_dir}/{xml}")
    mj_model.opt.jacobian = mujoco.mjtJacobian.mjJAC_DENSE
    model = put_model(mj_model, dtype=jnp.float64, contact_k_plane=32, contact_k_other=8)
    mj_data = mujoco.MjData(mj_model)
    rng = np.random.default_rng(21)

    tested = 0
    for trial in range(6):
        qpos, qvel, ctrl = _ground_state(mj_model, rng, drop=0.015)
        mj_data.qpos[:] = qpos
        mj_data.qvel[:] = qvel
        mj_data.ctrl[:] = ctrl
        mujoco.mj_forward(mj_model, mj_data)
        if mj_data.ncon == 0:
            continue
        tested += 1
        data = make_data(model).replace(
            qpos=jnp.asarray(qpos), qvel=jnp.asarray(qvel), ctrl=jnp.asarray(ctrl)
        )
        data = _jit_forward(model, data)
        np.testing.assert_allclose(
            data.qacc, mj_data.qacc, atol=1e-3, rtol=1e-4,
            err_msg=f"{xml} trial {trial} ncon={mj_data.ncon}",
        )
    assert tested >= 2


def _inject_oracle_contacts(model, mj_model, mj_data, data):
    ncon = mj_data.ncon
    dtype = data.qpos.dtype
    dist = np.array([mj_data.contact[i].dist for i in range(ncon)])
    pos = np.array([mj_data.contact[i].pos for i in range(ncon)])
    frame = np.array(
        [mj_data.contact[i].frame.reshape(3, 3) for i in range(ncon)]
    )
    im = np.array([mj_data.contact[i].includemargin for i in range(ncon)])
    fri = np.array([mj_data.contact[i].friction for i in range(ncon)])
    sref = np.array([mj_data.contact[i].solref for i in range(ncon)])
    simp = np.array([mj_data.contact[i].solimp for i in range(ncon)])
    g1 = np.array([mj_data.contact[i].geom1 for i in range(ncon)])
    g2 = np.array([mj_data.contact[i].geom2 for i in range(ncon)])
    dim = np.array([mj_data.contact[i].dim for i in range(ncon)], dtype=np.int32)
    contact = Contact(
        dist=jnp.asarray(dist, dtype=dtype),
        pos=jnp.asarray(pos, dtype=dtype),
        frame=jnp.asarray(frame, dtype=dtype),
        includemargin=jnp.asarray(im, dtype=dtype),
        friction=jnp.asarray(fri, dtype=dtype),
        solref=jnp.asarray(sref, dtype=dtype),
        solimp=jnp.asarray(simp, dtype=dtype),
        geom1=jnp.asarray(g1, dtype=jnp.int32),
        geom2=jnp.asarray(g2, dtype=jnp.int32),
        dim=dim,
    )
    return data.replace(
        contact=contact,
        efc_force_contact=jnp.zeros((ncon, 10), dtype=dtype),
    )


@pytest.mark.parametrize("xml", MESH_XMLS)
def test_qacc_with_oracle_contacts(ref_data_dir, xml):
    mj_model = load_mj_model(f"{ref_data_dir}/{xml}")
    mj_model.opt.jacobian = mujoco.mjtJacobian.mjJAC_DENSE
    model = put_model(mj_model, dtype=jnp.float64, contact_k_plane=32, contact_k_other=8)
    mj_data = mujoco.MjData(mj_model)
    rng = np.random.default_rng(22)

    tested = 0
    for trial in range(6):
        qpos, qvel, ctrl = _ground_state(mj_model, rng, drop=0.012)
        mj_data.qpos[:] = qpos
        mj_data.qvel[:] = qvel
        mj_data.ctrl[:] = ctrl
        mujoco.mj_forward(mj_model, mj_data)
        if mj_data.ncon == 0:
            continue
        tested += 1
        data = make_data(model).replace(
            qpos=jnp.asarray(qpos), qvel=jnp.asarray(qvel), ctrl=jnp.asarray(ctrl)
        )
        data = _jit_pos(model, data)
        data = _inject_oracle_contacts(model, mj_model, mj_data, data)
        data = _jit_rest(model, data)
        np.testing.assert_allclose(
            data.qacc, mj_data.qacc, atol=1e-3, rtol=1e-4,
            err_msg=f"{xml} trial {trial} ncon={mj_data.ncon}",
        )
    assert tested >= 2


def test_a1_step_rollout_on_ground(ref_data_dir):
    """20 steps of the A1 standing/settling on the ground, strict parity."""
    mj_model = load_mj_model(f"{ref_data_dir}/quadrupeds/unitree_a1_torque.xml")
    model = put_model(mj_model, dtype=jnp.float64, contact_k_plane=32, contact_k_other=8)
    mj_data = mujoco.MjData(mj_model)
    rng = np.random.default_rng(23)
    qpos = mj_model.qpos0.copy()
    qpos[2] -= 0.003
    qvel = rng.normal(scale=0.05, size=mj_model.nv)
    ctrl = rng.normal(scale=0.2, size=mj_model.nu)
    mj_data.qpos[:] = qpos
    mj_data.qvel[:] = qvel
    mj_data.ctrl[:] = ctrl
    data = make_data(model).replace(
        qpos=jnp.asarray(qpos), qvel=jnp.asarray(qvel), ctrl=jnp.asarray(ctrl)
    )
    for i in range(20):
        mujoco.mj_step(mj_model, mj_data)
        data = _jit_step(model, data)
        np.testing.assert_allclose(
            data.qpos, mj_data.qpos, atol=1e-6,
            err_msg=f"qpos diverged at step {i} (ncon mj={mj_data.ncon})",
        )
        np.testing.assert_allclose(
            data.qvel, mj_data.qvel, atol=1e-4,
            err_msg=f"qvel diverged at step {i}",
        )
