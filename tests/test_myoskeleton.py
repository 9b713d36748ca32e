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


# ---------------------------------------------------------------------------
# at-scale fixture: the REAL model's joint/actuator counts (VERDICT r3 #10)
# ---------------------------------------------------------------------------
def _full_scale_xml(tmp_path):
    """A skeleton with exactly 151 named joints (the real MyoSkeleton's
    count — reference myoskeleton.py:23) + a free root that the pipeline
    replaces with 6 joints, giving nv = 157 and obs dim 312 (:44). Joint
    names follow the real asset wherever the force table
    (_max_joint_forces) knows them; the hand/toe filler joints use
    myo-style names absent from the table (defaulting to force 50,
    reference :1514)."""
    import itertools

    joints = []  # (name, parent_chain_key)
    for seg in ("L5_S1", "L4_L5", "L3_L4", "L2_L3", "L1_L2", "L1_T12"):
        joints.append([f"{seg}_{suf}" for suf in
                       ("Flex_Ext", "Lat_Bending", "axial_rotation")])
    for seg in ("c7_c6", "c6_c5", "c5_c4", "c4_c3", "c3_c2", "c2_c1",
                "c1_skull", "skull"):
        joints.append([f"{seg}_{suf}" for suf in ("FE", "LB", "AR")])
    arm_stems = (
        "sternoclavicular_r2", "sternoclavicular_r3", "unrotscap_r3",
        "unrotscap_r2", "acromioclavicular_r2", "acromioclavicular_r3",
        "acromioclavicular_r1", "unrothum_r1", "unrothum_r3", "unrothum_r2",
        "elv_angle", "shoulder_elv", "shoulder1_r2", "shoulder_rot",
        "elbow_flex",
    )
    arms = {"r": [f"{s}_r" for s in arm_stems]
            + ["pro_sup", "deviation", "flexion_r"],
            "l": [f"{s}_l" for s in arm_stems]
            + ["pro_sup_l", "deviation_l", "flexion_l"]}
    legs = {}
    for side in ("r", "l"):
        legs[side] = [
            f"{st}_{side}" for st in
            ("hip_flexion", "hip_adduction", "hip_rotation", "knee_angle")
        ] + [
            f"knee_angle_{side}_{st}" for st in
            ("rotation2", "rotation3", "beta_rotation1")
        ] + [f"{st}_{side}" for st in
             ("ankle_angle", "subtalar_angle", "mtp_angle")]

    flat = [j for grp in joints for j in grp]
    flat += arms["r"] + arms["l"] + legs["r"] + legs["l"]
    # hand/toe filler to the real count
    def filler_names():
        for side in ("r", "l"):
            for f in ("thumb_cmc", "thumb_mp", "index", "middle", "ring",
                      "little"):
                for seg in ("_mcp", "_pip", "_dip"):
                    yield f"{f}{seg}_{side}"
        i = 0
        while True:  # beyond the hand names: indexed auxiliary joints
            yield f"aux_{i:02d}"
            i += 1

    fingers = filler_names()
    seen = set(flat)
    while len(flat) < 151:
        n = next(fingers)
        if n not in seen:
            seen.add(n)
            flat.append(n)
    assert len(flat) == 151

    def chain(names, prefix, per_body=3):
        out, i = "", 0
        depth = 0
        for i in range(0, len(names), per_body):
            grp = names[i:i + per_body]
            out += f'<body name="{prefix}_{i}" pos="0 0 -0.05">'
            out += f'<geom name="{prefix}_{i}_g" type="capsule" ' \
                   f'size="0.03 0.05" mass="1.5"/>'
            for ax, j in zip(("1 0 0", "0 1 0", "0 0 1"), grp):
                out += f'<joint name="{j}" axis="{ax}" range="-1.2 1.2"/>'
            depth += 1
        return out + "</body>" * depth

    torso_joints = [j for grp in joints for j in grp]
    body = '<body name="pelvis"><freejoint name="root"/>' \
           '<geom name="pelvis_g" type="sphere" size="0.12" mass="12"/>'
    body += chain(torso_joints, "spine")
    body += chain(arms["r"], "arm_r") + chain(arms["l"], "arm_l")
    for side in ("r", "l"):
        leg = legs[side]
        body += f'<body name="femur_{side}" pos="0.1 0 -0.2">'
        body += f'<geom name="femur_{side}_g" type="capsule" ' \
                f'size="0.06 0.18" mass="8"/>'
        for ax, j in zip(("1 0 0", "0 1 0", "0 0 1"), leg[:3]):
            body += f'<joint name="{j}" axis="{ax}" range="-2 2"/>'
        body += f'<body name="tibia_{side}" pos="0 0 -0.4">'
        body += f'<geom name="tibia_{side}_g" type="capsule" ' \
                f'size="0.045 0.17" mass="4"/>'
        for ax, j in zip(("1 0 0", "0 1 0", "0 0 1", "1 0 0"), leg[3:7]):
            body += f'<joint name="{j}" axis="{ax}" range="-2.1 0.5"/>'
        body += f'<body name="foot_{side}" pos="0 0 -0.4">'
        for ax, j in zip(("1 0 0", "0 1 0", "0 0 1"), leg[7:]):
            body += f'<joint name="{j}" axis="{ax}" range="-1 1"/>'
        for gi, g in enumerate(
            (f"foot1_{side}_coll", f"foot2_{side}_coll",
             f"foot3_{side}_coll", f"bofoot1_{side}_coll",
             f"bofoot2_{side}_coll")
        ):
            body += f'<geom name="{g}" type="sphere" size="0.02" ' \
                    f'pos="{0.02 * gi} 0 -0.02" mass="0.2"/>'
        body += "</body></body></body>"
    rest = [j for j in flat if j not in set(torso_joints)
            - set()]  # noqa: simple filter below instead
    used = set(torso_joints) | set(arms["r"]) | set(arms["l"]) \
        | set(legs["r"]) | set(legs["l"])
    filler = [j for j in flat if j not in used]
    body += chain(filler, "hand")
    body += "</body>"

    xml = (
        '<mujoco model="myo_full"><option timestep="0.001"/>'
        '<worldbody><light pos="0 0 3"/>'
        '<geom name="old_floor" type="plane" size="5 5 .1"/>'
        f'<frame pos="0 0 0.975">{body}</frame>'
        "</worldbody></mujoco>"
    )
    p = tmp_path / "myoskeleton.xml"
    p.write_text(xml)
    return p


def test_full_scale_pipeline(tmp_path):
    """Spec derivation at the real model's scale: 151 joints -> nv 157,
    obs 312, 151 actuators, GRF 30."""
    xml = _full_scale_xml(tmp_path)
    env = MyoSkeleton(
        xml_path=xml, dtype=jnp.float64,
        reward_type="target_velocity",
        reward_params=dict(target_velocity=1.25),
    )
    m = env.model
    assert m.nv == 157 and m.nq == 157
    assert env.obs_index.size - 2 == 312
    assert env.obs_dim == 312
    assert m.nu == 151
    assert env.grf_size == 30

    # spec ordering: root joints first, force table applied
    names = [list(m.names["joint"])[i] for i in range(6)]
    assert names[:3] == ["pelvis_tx", "pelvis_tz", "pelvis_ty"]
    table = _max_joint_forces()
    cr = np.asarray(m.actuator_ctrlrange)
    jmap = m.names["joint"]
    amap = {i: n for n, i in m.names["actuator"].items()}
    for u in range(m.nu):
        jname = amap[u].replace("act_", "")
        want = table.get(jname, 50)
        assert cr[u, 1] == want, (jname, cr[u], want)

    # physics smoke at scale: reset + one position-stage forward
    state = jax.jit(env.reset)(jax.random.PRNGKey(0))
    assert np.isfinite(np.asarray(state.obs)).all()
    from loco_mujoco_tpu.ops import forward as fwd

    d = jax.jit(lambda dd: fwd.fwd_position(env.model, dd))(state.data)
    assert np.isfinite(np.asarray(d.xpos)).all()
