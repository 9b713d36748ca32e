"""MyoSkeleton environment — license-gated external musculoskeletal model.

Behavioral port of reference `humanoids/myoskeleton.py` (C21): a 151-joint
full-body skeleton (157 with the 6 root joints; obs dim 312 = 157 qpos +
157 qvel - global x/y) whose assets live in the external myolab/myo_model
repository (pinned commit, fetched by the `loco-mujoco-tpu-myomodel-init`
console script; see utils/myomodel_init.py).

XML pipeline (`build_myoskeleton_spec`, reference :1283-1518): the
reference needed an mj_saveLastXML round-trip + ElementTree surgery because
dm_control's mjcf cannot parse `<frame>` elements; MjSpec parses them
natively, so the pipeline here is pure spec editing with the same end
state:

 * drop the original worldbody decorations (cameras, lights, floor)
   (ref :1323-1330)
 * delete the `myoskeleton_root` free joint and re-add 6 slide/hinge root
   joints (tx, tz, ty, tilt, list, rotation, LocoMuJoCo ranges) on a
   re-oriented pelvis so nq == nv like every robot in the suite
   (ref _add_root_joints, :1380-1405)
 * add the LocoMuJoCo floor plane + headlight (ref :1352-1360)
 * one `general` actuator per non-pelvis joint with the reference's
   per-joint force-limit table (ctrlrange = +/-limit, ctrllimited;
   ref _add_actuators, :1406-1518)

GRF: 10 foot collider geoms vs floor -> dim 30 (ref :1066-1085, 1103-1113).
Fall predicate: pelvis height/tilt/list/rotation + L5_S1 lumbar limits
(ref _has_fallen, :1117-1146).

Without the external asset `generate` raises with fetch instructions; the
pipeline itself is exercised end-to-end by tests/test_myoskeleton.py on a
synthetic skeleton fixture.
"""

from __future__ import annotations

from pathlib import Path

import jax.numpy as jnp
import numpy as np

import mujoco

from ...core.io import put_model
from ...envs.observation import ObsIndex
from ...registry import register
from ...utils.checks import ValidTaskConf, check_validity_task_mode_dataset
from ...utils.myomodel_init import MYO_PATH, myoskeleton_available
from .robot_base import RobotHumanoid, joint_obs_spec

# root joints replacing the free joint (reference :1386-1403): name, type,
# axis, range — inserted in this order so qpos layout matches the suite
ROOT_JOINTS = [
    ("pelvis_tx", mujoco.mjtJoint.mjJNT_SLIDE, [1, 0, 0], [-500, 500]),
    ("pelvis_tz", mujoco.mjtJoint.mjJNT_SLIDE, [0, 0, 1], [-500, 500]),
    ("pelvis_ty", mujoco.mjtJoint.mjJNT_SLIDE, [0, 1, 0], [-100, 100]),
    ("pelvis_tilt", mujoco.mjtJoint.mjJNT_HINGE, [0, 0, 1],
     [-1.5708, 1.5708]),
    ("pelvis_list", mujoco.mjtJoint.mjJNT_HINGE, [1, 0, 0],
     [-1.5708, 1.5708]),
    ("pelvis_rotation", mujoco.mjtJoint.mjJNT_HINGE, [0, 1, 0],
     [-1.5708, 1.5708]),
]


def _max_joint_forces() -> dict:
    """The reference's exact per-joint actuator force table
    (myoskeleton.py:1411-1509), generated from its regular structure:
    lumbar segments 200, cervical 50, shoulder/arm complexes 80, leg
    primaries 200, knee coupling dofs 20. Joints absent from the table
    default to 50 (ref :1514)."""
    t = {}
    for seg in ("L5_S1", "L4_L5", "L3_L4", "L2_L3", "L1_L2", "L1_T12"):
        for suf in ("Flex_Ext", "Lat_Bending", "axial_rotation"):
            t[f"{seg}_{suf}"] = 200
    for seg in ("c7_c6", "c6_c5", "c5_c4", "c4_c3", "c3_c2", "c2_c1",
                "c1_skull", "skull"):
        for suf in ("FE", "LB", "AR"):
            t[f"{seg}_{suf}"] = 50
    arm_stems = (
        "sternoclavicular_r2", "sternoclavicular_r3", "unrotscap_r3",
        "unrotscap_r2", "acromioclavicular_r2", "acromioclavicular_r3",
        "acromioclavicular_r1", "unrothum_r1", "unrothum_r3", "unrothum_r2",
        "elv_angle", "shoulder_elv", "shoulder1_r2", "shoulder_rot",
        "elbow_flex",
    )
    for stem in arm_stems:
        t[f"{stem}_r"] = 80
        t[f"{stem}_l"] = 80
    # forearm/wrist: the right-side names carry no suffix in the asset
    for n in ("pro_sup", "deviation", "flexion_r",
              "pro_sup_l", "deviation_l", "flexion_l"):
        t[n] = 80
    for side in ("r", "l"):
        for stem in ("hip_flexion", "hip_adduction", "hip_rotation",
                     "knee_angle", "ankle_angle", "subtalar_angle",
                     "mtp_angle"):
            t[f"{stem}_{side}"] = 200
        for stem in ("knee_angle_%s_rotation2", "knee_angle_%s_rotation3",
                     "knee_angle_%s_beta_rotation1"):
            t[stem % side] = 20
    return t


# 10 foot collider geoms -> GRF dim 30 (reference collision groups,
# :1103-1113; right_foot1..5 then left_foot1..5)
FOOT_COLLIDERS = [
    ["foot1_r_coll"], ["foot2_r_coll"], ["foot3_r_coll"],
    ["bofoot1_r_coll"], ["bofoot2_r_coll"],
    ["foot1_l_coll"], ["foot2_l_coll"], ["foot3_l_coll"],
    ["bofoot1_l_coll"], ["bofoot2_l_coll"],
]


def build_myoskeleton_spec(xml_path) -> mujoco.MjSpec:
    """The full reference XML pipeline on an MjSpec (see module docstring).
    Parameterized by path so the synthetic-fixture test can exercise it
    without the license-gated asset."""
    spec = mujoco.MjSpec.from_file(str(xml_path))
    wb = spec.worldbody

    # drop original worldbody decorations (ref deletes every non-body
    # worldbody child, :1323-1330)
    for lst in (list(wb.lights), list(wb.cameras), list(wb.geoms),
                list(wb.sites)):
        for e in lst:
            spec.delete(e)

    # free root joint -> 6 explicit joints on a re-oriented pelvis
    pelvis = None
    for b in spec.bodies:
        for j in list(b.joints):
            if j.type == mujoco.mjtJoint.mjJNT_FREE:
                pelvis = b
                spec.delete(j)
    if pelvis is None:
        for b in spec.bodies:
            if b.name == "pelvis":
                pelvis = b
    if pelvis is None:
        raise ValueError("no free joint and no body named 'pelvis' found")
    pelvis.quat = [0.7071067811865475, 0.7071067811865475, 0.0, 0.0]
    for name, jtype, axis, rng in ROOT_JOINTS:
        pelvis.add_joint(
            name=name, type=jtype, axis=axis, range=rng,
            pos=[0.0, 0.0, 0.0],
        )

    # LocoMuJoCo floor + light (ref :1352-1360; materials are viewer-only)
    wb.add_geom(
        name="floor", type=mujoco.mjtGeom.mjGEOM_PLANE,
        size=[200, 200, 0.125], condim=3, group=2,
        rgba=[0.8, 0.9, 0.8, 1.0],
    )
    wb.add_light(
        pos=[0, 0, 1.3], dir=[0, 0, -1.3],
        type=mujoco.mjtLightType.mjLIGHT_DIRECTIONAL, castshadow=False,
    )

    # one general torque actuator per non-pelvis joint; ctrl IS the torque
    # (general gain defaults to 1), bounded by the per-joint table
    table = _max_joint_forces()
    for b in spec.bodies:
        for j in b.joints:
            if "pelvis" in j.name:
                continue
            fl = float(table.get(j.name, 50))
            spec.add_actuator(
                name=f"act_{j.name}",
                trntype=mujoco.mjtTrn.mjTRN_JOINT,
                target=j.name,
                ctrlrange=[-fl, fl],
                ctrllimited=True,
            )
    return spec


def _root_first_joints(model):
    """Joint names with the 6 root joints first (their qpos addresses are
    the lowest by construction), then the rest in qpos order."""
    jmap = model.names["joint"]
    order = sorted(jmap.items(), key=lambda kv: int(model.jnt_qposadr[kv[1]]))
    return [name for name, _ in order]


def _has_fallen_fn(ki):
    """Reference _has_fallen (:1117-1146): pelvis height/tilt/list/rotation
    plus L5_S1 lumbar flexion/bending/rotation limits."""
    p = [ki["q_pelvis_ty"], ki["q_pelvis_tilt"], ki["q_pelvis_list"],
         ki["q_pelvis_rotation"]]
    lk = ["q_L5_S1_Flex_Ext", "q_L5_S1_Lat_Bending", "q_L5_S1_axial_rotation"]
    lum = [ki[k] for k in lk if k in ki]

    def has_fallen(obs):
        c = (obs[p[0]] < -0.46) | (obs[p[0]] > 0.1)
        c |= (obs[p[1]] < -jnp.pi / 4.5) | (obs[p[1]] > jnp.pi / 12)
        c |= (obs[p[2]] < -jnp.pi / 12) | (obs[p[2]] > jnp.pi / 8)
        c |= (obs[p[3]] < -jnp.pi / 9) | (obs[p[3]] > jnp.pi / 9)
        if len(lum) == 3:
            c |= (obs[lum[0]] < -jnp.pi / 4) | (obs[lum[0]] > jnp.pi / 10)
            c |= (obs[lum[1]] < -jnp.pi / 10) | (obs[lum[1]] > jnp.pi / 10)
            c |= (obs[lum[2]] < -jnp.pi / 4.5) | (obs[lum[2]] > jnp.pi / 4.5)
        return c

    return has_fallen


@register
class MyoSkeleton(RobotHumanoid):
    valid_task_confs = ValidTaskConf(tasks=["walk", "run"],
                                     data_types=["real"])

    def __init__(self, xml_path=None, dtype=jnp.float32, **kwargs):
        if xml_path is None:
            xmls = sorted(MYO_PATH.glob("**/myoskeleton.xml"))
            if not xmls:
                raise FileNotFoundError(
                    "MyoSkeleton assets not found. Run loco_mujoco_tpu."
                    "utils.myomodel_init.fetch_myoskeleton() (the model is "
                    "license-gated and fetched from myolab/myo_model) or "
                    "set LOCO_MUJOCO_TPU_MYO_MODEL to an existing checkout."
                )
            xml_path = xmls[0]
        spec = build_myoskeleton_spec(xml_path)
        mj_model = spec.compile()
        model = put_model(mj_model, dtype=dtype)
        joints = _root_first_joints(model)
        obs_index = ObsIndex(model, joint_obs_spec(joints))
        gmap = model.names["geom"]
        foot_groups = [
            grp for grp in FOOT_COLLIDERS if all(g in gmap for g in grp)
        ]
        super().__init__(
            model,
            obs_index,
            joints,
            foot_groups=foot_groups,
            has_fallen_fn=_has_fallen_fn,
            grf_size=3 * max(len(foot_groups), 1),
            dtype=dtype,
            **kwargs,
        )
        self._mj_model = mj_model
        self._mj_models = [mj_model]

    @staticmethod
    def generate(task="walk", dataset_type="real", debug=False, **kwargs):
        """Reference generate (:1205-1266): walk/run x real; target
        velocities 1.25 / 2.5; 500 Hz mocap; the reference ships no mini
        datasets for the MyoSkeleton and raises likewise."""
        check_validity_task_mode_dataset(
            "MyoSkeleton", task, None, dataset_type,
            *MyoSkeleton.valid_task_confs.get_all(),
        )
        if not myoskeleton_available():
            raise FileNotFoundError(
                "MyoSkeleton assets missing — run fetch_myoskeleton() first "
                "(license-gated external model)."
            )
        name = ("myosuite_humanoid_walking.npz" if task == "walk"
                else "myosuite_humanoid_running.npz")
        path = f"datasets/humanoids/real/{name}"
        from .robot_base import REF_ROOT

        full = REF_ROOT / path
        if debug or not full.exists():
            raise NotImplementedError(
                "Mini datasets are currently not available for the "
                "MyoSkeleton."  # reference :1240
            )
        if "reward_type" not in kwargs:
            kwargs["reward_type"] = "target_velocity"
        if "reward_params" not in kwargs:
            kwargs["reward_params"] = dict(
                target_velocity=1.25 if task == "walk" else 2.5
            )
        env = MyoSkeleton(**kwargs)
        env.load_trajectory(
            dict(traj_path=full, traj_dt=1 / 500, control_dt=env.dt),
            warn=False,
        )
        return env
