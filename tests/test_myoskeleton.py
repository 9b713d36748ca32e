"""MyoSkeleton build pipeline, end-to-end on a synthetic skeleton fixture.

The real asset is license-gated (myolab/myo_model, fetched interactively),
so the XML pipeline (reference myoskeleton.py:1283-1518: frame handling,
free-joint -> 6 root joints, worldbody cleanup, floor, per-joint general
actuators with the force table) is exercised here on a small fixture that
has every structural feature the pipeline must handle: <frame> wrappers, a
free root joint, pre-existing floor/light/camera, table and non-table
joint names, and the 10 foot collider geoms.
"""

import jax
import jax.numpy as jnp
import mujoco
import numpy as np
import pytest

from loco_mujoco_tpu.models.humanoids.myoskeleton import (
    MyoSkeleton, build_myoskeleton_spec, _max_joint_forces,
)

FIXTURE = """
<mujoco model="myoskeleton_fixture">
  <option timestep="0.001"/>
  <worldbody>
    <light pos="0 0 3"/>
    <camera name="old_cam" pos="0 2 1"/>
    <geom name="old_floor" type="plane" size="5 5 .1"/>
    <frame pos="0 0 0.975">
      <body name="pelvis">
        <freejoint name="myoskeleton_root"/>
        <geom name="pelvis_g" type="sphere" size="0.12" mass="12"/>
        <body name="lumbar" pos="0 0 0.2">
          <joint name="L5_S1_Flex_Ext" axis="0 0 1" range="-1 1"/>
          <joint name="L5_S1_Lat_Bending" axis="1 0 0" range="-1 1"/>
          <joint name="L5_S1_axial_rotation" axis="0 1 0" range="-1 1"/>
          <geom name="torso_g" type="capsule" size="0.09 0.2" mass="20"/>
          <body name="head" pos="0 0 0.4">
            <joint name="skull_FE" axis="0 0 1" range="-0.6 0.6"/>
            <joint name="mystery_joint" axis="1 0 0" range="-0.5 0.5"/>
            <geom name="head_g" type="sphere" size="0.09" mass="4"/>
          </body>
        </body>
        {legs}
      </body>
    </frame>
  </worldbody>
</mujoco>
"""

LEG = """
        <body name="femur_{s}" pos="{x} 0 -0.2">
          <joint name="hip_flexion_{s}" axis="0 0 1" range="-2 2"/>
          <geom name="femur_{s}_g" type="capsule" size="0.06 0.18" mass="8"/>
          <body name="tibia_{s}" pos="0 0 -0.4">
            <joint name="knee_angle_{s}" axis="0 0 1" range="-2.1 0.02"/>
            <joint name="knee_angle_{s}_rotation2" axis="1 0 0"
                   range="-0.2 0.2"/>
            <geom name="tibia_{s}_g" type="capsule" size="0.045 0.17"
                  mass="4"/>
            <body name="foot_{s}" pos="0 0 -0.4">
              <joint name="ankle_angle_{s}" axis="0 0 1" range="-1 1"/>
              <geom name="foot1_{s}_coll" type="sphere" size="0.025"
                    pos="0.06 0 -0.02" mass="0.3"/>
              <geom name="foot2_{s}_coll" type="sphere" size="0.025"
                    pos="-0.04 0.02 -0.02" mass="0.3"/>
              <geom name="foot3_{s}_coll" type="sphere" size="0.025"
                    pos="-0.04 -0.02 -0.02" mass="0.3"/>
              <geom name="bofoot1_{s}_coll" type="sphere" size="0.02"
                    pos="0.1 0.01 -0.02" mass="0.1"/>
              <geom name="bofoot2_{s}_coll" type="sphere" size="0.02"
                    pos="0.1 -0.01 -0.02" mass="0.1"/>
            </body>
          </body>
        </body>
"""


@pytest.fixture(scope="module")
def fixture_xml(tmp_path_factory):
    legs = LEG.format(s="r", x="0.1") + LEG.format(s="l", x="-0.1")
    p = tmp_path_factory.mktemp("myo") / "myoskeleton.xml"
    p.write_text(FIXTURE.format(legs=legs))
    return p


def test_pipeline_structure(fixture_xml):
    spec = build_myoskeleton_spec(fixture_xml)
    m = spec.compile()

    # free joint gone, nq == nv, root joints first and in order
    assert all(
        m.jnt_type[j] != mujoco.mjtJoint.mjJNT_FREE for j in range(m.njnt)
    )
    assert m.nq == m.nv
    names = [
        mujoco.mj_id2name(m, mujoco.mjtObj.mjOBJ_JOINT, j)
        for j in range(6)
    ]
    assert names == ["pelvis_tx", "pelvis_tz", "pelvis_ty", "pelvis_tilt",
                     "pelvis_list", "pelvis_rotation"]

    # worldbody decorations replaced: old floor/camera gone, new floor in
    floor = mujoco.mj_name2id(m, mujoco.mjtObj.mjOBJ_GEOM, "floor")
    assert floor >= 0
    assert mujoco.mj_name2id(m, mujoco.mjtObj.mjOBJ_GEOM, "old_floor") < 0
    assert m.ncam == 0

    # actuators: one per non-pelvis joint, ctrlrange from the force table
    table = _max_joint_forces()
    act_names = [
        mujoco.mj_id2name(m, mujoco.mjtObj.mjOBJ_ACTUATOR, u)
        for u in range(m.nu)
    ]
    assert m.nu == m.njnt - 6
    assert not any("pelvis" in n for n in act_names)
    for u, n in enumerate(act_names):
        jname = n[len("act_"):]
        expect = float(table.get(jname, 50))
        np.testing.assert_allclose(m.actuator_ctrlrange[u],
                                   [-expect, expect])
    u = act_names.index("act_L5_S1_Flex_Ext")
    np.testing.assert_allclose(m.actuator_ctrlrange[u], [-200, 200])
    u = act_names.index("act_knee_angle_r_rotation2")
    np.testing.assert_allclose(m.actuator_ctrlrange[u], [-20, 20])
    u = act_names.index("act_mystery_joint")
    np.testing.assert_allclose(m.actuator_ctrlrange[u], [-50, 50])


def test_env_builds_and_steps(fixture_xml):
    env = MyoSkeleton(
        xml_path=fixture_xml, use_foot_forces=True,
        reward_params=dict(target_velocity=1.25),
    )
    njnt = env.model.njnt
    # obs: qpos + qvel minus global x/y, plus the GRF block
    assert env.grf_size == 30
    assert env.obs_dim == 2 * njnt - 2 + 30

    state = jax.jit(env.reset)(jax.random.PRNGKey(0))
    assert bool(jnp.all(jnp.isfinite(state.obs)))
    step = jax.jit(env.step)
    for _ in range(3):
        state = step(state, jnp.zeros(env.action_dim))
    assert bool(jnp.all(jnp.isfinite(state.obs)))

    # fall predicate: standing is fine, sunk pelvis trips the height bound
    ki = env._key_idx
    obs = np.array(state.obs)
    obs_low = obs.copy()
    obs_low[ki["q_pelvis_ty"]] = -0.6
    assert bool(env._has_fallen(jnp.asarray(obs_low)))


def test_generate_requires_assets():
    from loco_mujoco_tpu.utils.myomodel_init import myoskeleton_available

    if myoskeleton_available():
        pytest.skip("real asset present; covered by full generate")
    with pytest.raises(FileNotFoundError, match="license-gated"):
        MyoSkeleton.generate("walk", "real")
