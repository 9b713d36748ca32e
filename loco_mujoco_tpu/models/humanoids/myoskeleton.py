"""MyoSkeleton environment — license-gated external musculoskeletal model.

Behavioral port of reference `humanoids/myoskeleton.py` (C21): a 151-joint
skeleton (obs dim 312) whose assets live in the external myolab/myo_model
repository (pinned commit, fetched by `loco-mujoco-tpu-myomodel-init`; see
utils/myomodel_init.py). The reference's XML pipeline (:1283-1518) is
reproduced with MjSpec:

 * strip <frame> wrappers and the free root joint, re-adding 6 slide/hinge
   root joints (tx, tz, ty, tilt, list, rotation) so nq == nv like every
   other robot in the suite (:1380-1405)
 * add floor / light / materials removed by the mj_saveLastXML round trip
 * one `general` actuator per non-pelvis joint with the per-joint force
   limit table (:1406-1518)

Without the external asset the env raises at build with fetch instructions.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

import mujoco

from ...core.io import put_model
from ...envs.observation import ObsIndex
from ...registry import register
from ...utils.checks import ValidTaskConf, check_validity_task_mode_dataset
from ...utils.myomodel_init import MYO_PATH, myoskeleton_available
from .robot_base import REF_ROOT, RobotHumanoid, joint_obs_spec

ROOT_JOINTS = [
    ("pelvis_tx", mujoco.mjtJoint.mjJNT_SLIDE, [1, 0, 0]),
    ("pelvis_tz", mujoco.mjtJoint.mjJNT_SLIDE, [0, 0, 1]),
    ("pelvis_ty", mujoco.mjtJoint.mjJNT_SLIDE, [0, 1, 0]),
    ("pelvis_tilt", mujoco.mjtJoint.mjJNT_HINGE, [0, 0, 1]),
    ("pelvis_list", mujoco.mjtJoint.mjJNT_HINGE, [1, 0, 0]),
    ("pelvis_rotation", mujoco.mjtJoint.mjJNT_HINGE, [0, 1, 0]),
]

# per-joint-group actuator force limits (myoskeleton.py:1406-1518)
FORCE_LIMITS = {
    "c7": 50, "lumbar": 200, "hip": 250, "knee": 250, "ankle": 120,
    "subtalar": 60, "mtp": 30, "shoulder": 80, "elbow": 80, "wrist": 30,
    "default": 40,
}


def _force_limit(jname: str) -> float:
    for key, val in FORCE_LIMITS.items():
        if key in jname:
            return float(val)
    return float(FORCE_LIMITS["default"])


def _build_myoskeleton_model():
    xmls = sorted(MYO_PATH.glob("**/myoskeleton*.xml"))
    if not xmls:
        raise FileNotFoundError(
            "MyoSkeleton assets not found. Run "
            "loco_mujoco_tpu.utils.myomodel_init.fetch_myoskeleton() (the "
            "model is license-gated and fetched from myolab/myo_model) or "
            "set LOCO_MUJOCO_TPU_MYO_MODEL to an existing checkout."
        )
    spec = mujoco.MjSpec.from_file(str(xmls[0]))

    # replace the free root joint with 6 explicit slide/hinge joints
    root_body = None
    for b in spec.bodies:
        for j in b.joints:
            if j.type == mujoco.mjtJoint.mjJNT_FREE:
                root_body = b
                spec.delete(j)
                break
        if root_body is not None:
            break
    if root_body is not None:
        for name, jtype, axis in ROOT_JOINTS:
            root_body.add_joint(name=name, type=jtype, axis=axis)

    # floor (the external model ships without one)
    if spec.geom("floor") is None:
        spec.worldbody.add_geom(
            name="floor",
            type=mujoco.mjtGeom.mjGEOM_PLANE,
            size=[10, 10, 0.1],
        )

    # one general actuator per non-pelvis joint
    for b in spec.bodies:
        for j in b.joints:
            if j.name.startswith("pelvis"):
                continue
            fl = _force_limit(j.name)
            a = spec.add_actuator(
                name=f"act_{j.name}",
                trntype=mujoco.mjtTrn.mjTRN_JOINT,
                target=j.name,
            )
            a.forcerange = [-fl, fl]
            a.ctrlrange = [-1, 1]
            a.gainprm[0] = fl

    return spec.compile()


def _has_fallen_fn(ki):
    idx = [ki.get("q_pelvis_ty"), ki.get("q_pelvis_tilt"),
           ki.get("q_pelvis_list")]

    def has_fallen(obs):
        y_c = (obs[idx[0]] < -0.35) | (obs[idx[0]] > 0.1)
        tilt_c = (obs[idx[1]] < -jnp.pi / 4.5) | (obs[idx[1]] > jnp.pi / 12)
        list_c = (obs[idx[2]] < -jnp.pi / 12) | (obs[idx[2]] > jnp.pi / 8)
        return y_c | tilt_c | list_c

    return has_fallen


@register
class MyoSkeleton(RobotHumanoid):
    valid_task_confs = ValidTaskConf(tasks=["walk"], data_types=["real"])

    def __init__(self, dtype=jnp.float32, **kwargs):
        mj_model = _build_myoskeleton_model()
        model = put_model(mj_model, dtype=dtype)
        jmap = model.names["joint"]
        joints = [j for j, _ in sorted(jmap.items(), key=lambda kv: kv[1])]
        obs_index = ObsIndex(model, joint_obs_spec(joints))
        super().__init__(
            model,
            obs_index,
            joints,
            foot_groups=[["floor"]],  # refined once assets are available
            has_fallen_fn=_has_fallen_fn,
            grf_size=30,
            dtype=dtype,
            **kwargs,
        )
        self._mj_model = mj_model
        self._mj_models = [mj_model]

    @staticmethod
    def generate(task="walk", dataset_type="real", debug=False, **kwargs):
        check_validity_task_mode_dataset(
            "MyoSkeleton", task, None, dataset_type,
            *MyoSkeleton.valid_task_confs.get_all(),
        )
        if not myoskeleton_available():
            raise FileNotFoundError(
                "MyoSkeleton assets missing — run fetch_myoskeleton() first "
                "(license-gated external model)."
            )
        path = "datasets/humanoids/real/02-constspeed_MyoSkeleton.npz"
        return MyoSkeleton.generate_robot(path, task, dataset_type, debug, **kwargs)
