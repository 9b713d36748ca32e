"""Field-by-field parity of the position stage vs CPU MuJoCo."""

import jax.numpy as jnp
import mujoco
import numpy as np
import pytest

from loco_mujoco_tpu.core.io import load_mj_model, make_data, put_model
from loco_mujoco_tpu.ops.kinematics import com_pos, kinematics

XMLS = [
    "quadrupeds/unitree_a1_torque.xml",
    "humanoid/humanoid_torque.xml",
    "unitree_h1/h1.xml",
]


@pytest.mark.parametrize("xml", XMLS)
def test_position_stage_matches_mujoco(ref_data_dir, xml):
    mj_model = load_mj_model(f"{ref_data_dir}/{xml}")
    mj_data = mujoco.MjData(mj_model)

    model = put_model(mj_model, dtype=jnp.float64)
    data = make_data(model)

    rng = np.random.default_rng(0)
    for trial in range(3):
        qpos = mj_model.qpos0 + rng.normal(scale=0.3, size=mj_model.nq)
        mj_data.qpos[:] = qpos
        mujoco.mj_forward(mj_model, mj_data)

        data = data.replace(qpos=jnp.asarray(qpos))
        data = kinematics(model, data)
        data = com_pos(model, data)

        np.testing.assert_allclose(data.xpos, mj_data.xpos, atol=1e-10)
        # quaternions up to sign
        q_ours = np.asarray(data.xquat)
        q_mj = mj_data.xquat
        sign = np.sign(np.sum(q_ours * q_mj, axis=-1, keepdims=True))
        np.testing.assert_allclose(q_ours * sign, q_mj, atol=1e-9)
        np.testing.assert_allclose(
            data.xmat, mj_data.xmat.reshape(-1, 3, 3), atol=1e-9
        )
        np.testing.assert_allclose(data.xanchor, mj_data.xanchor, atol=1e-10)
        np.testing.assert_allclose(data.xaxis, mj_data.xaxis, atol=1e-10)
        np.testing.assert_allclose(data.xipos, mj_data.xipos, atol=1e-10)
        np.testing.assert_allclose(data.geom_xpos, mj_data.geom_xpos, atol=1e-9)
        np.testing.assert_allclose(
            data.geom_xmat, mj_data.geom_xmat.reshape(-1, 3, 3), atol=1e-9
        )
        if mj_model.nsite:
            np.testing.assert_allclose(
                data.site_xpos, mj_data.site_xpos, atol=1e-9
            )
        np.testing.assert_allclose(
            data.subtree_com, mj_data.subtree_com, atol=1e-9
        )
        np.testing.assert_allclose(data.cinert, mj_data.cinert, atol=1e-8)
        np.testing.assert_allclose(data.cdof, mj_data.cdof, atol=1e-9)
