"""Unitree A1 quadruped environment — tasks simple/hard × real/perfect.

Behavioral port of reference `loco_mujoco/environments/quadrupeds/unitreeA1.py`
(C22 in SURVEY.md §2) to the batched functional API:

 * torque / position action modes select different XMLs (reference :196-218)
 * goal-conditioned observation: the goal-arrow rotation becomes (cos, sin)
   features + goal speed (reference :722-753); here computed directly from
   the goal state instead of via an overridden site matrix — numerically
   identical because the reference writes that matrix from the same angle
   every substep (:564-580)
 * random z-rotation augmentation at reset (:270-272, 283-285)
 * trajectory interpolation overrides: angle unwrap, rotmat<->angle,
   velocities recomputed by finite differences (:856-928)
 * fall detection from trunk list/tilt/height (:503-536)
"""

from __future__ import annotations

import os
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np

import mujoco

from ...core.io import load_mj_model, preprocess_xml, put_model
from ...datasets.trajectory import TrajectoryData
from ...envs.base import LocoEnv
from ...envs.observation import ObservationType, ObsIndex
from ...ops import support
from ...registry import register
from ...rewards import make_reward
from ...utils import math as um
from ...utils.checks import ValidTaskConf, check_validity_task_mode_dataset

from ...utils.assets import REF_ROOT  # asset root, env-var overridable

JOINTS = [
    "trunk_tx", "trunk_ty", "trunk_tz",
    "trunk_list", "trunk_tilt", "trunk_rotation",
    "FR_hip_joint", "FR_thigh_joint", "FR_calf_joint",
    "FL_hip_joint", "FL_thigh_joint", "FL_calf_joint",
    "RR_hip_joint", "RR_thigh_joint", "RR_calf_joint",
    "RL_hip_joint", "RL_thigh_joint", "RL_calf_joint",
]


def _obs_spec():
    spec = [(f"q_{j}", j, ObservationType.JOINT_POS) for j in JOINTS]
    spec += [(f"dq_{j}", j, ObservationType.JOINT_VEL) for j in JOINTS]
    spec += [("dir_arrow", "dir_arrow", ObservationType.SITE_ROT)]
    return spec


def _add_dir_arrow(xml_path: str) -> mujoco.MjModel:
    """XML surgery via MjSpec: goal-direction arrow body + sites on the
    trunk (reference `_add_dir_vector_to_xml_handle`, unitreeA1.py:755-776)."""
    patched = preprocess_xml(xml_path)
    spec = mujoco.MjSpec.from_file(patched)
    if patched != xml_path:
        os.unlink(patched)
    trunk = spec.body("trunk")
    arrow = trunk.add_body(name="dir_arrow", pos=[0, 0, 0.15])
    arrow.add_site(
        name="dir_arrow_ball",
        type=mujoco.mjtGeom.mjGEOM_SPHERE,
        size=[0.03, 0.03, 0.03],
        pos=[-0.1, 0, 0],
    )
    arrow.add_site(
        name="dir_arrow",
        type=mujoco.mjtGeom.mjGEOM_CYLINDER,
        size=[0.01, 0.1, 0.01],
    )
    return spec.compile()


@register
class UnitreeA1(LocoEnv):
    valid_task_confs = ValidTaskConf(
        tasks=["simple", "hard"], data_types=["real", "perfect"]
    )
    # the dir-arrow SITE_ROT block never reaches the user: it is replaced
    # by goal features in _modify_observation (stale-fields guard opt-in)
    _replaces_site_obs = True

    def __init__(
        self,
        action_mode: str = "torque",
        setup_random_rot: bool = False,
        default_target_velocity: float = 0.5,
        reward_type: str = "velocity_vector",
        reward_params: dict | None = None,
        traj_params: dict | None = None,
        random_start: bool = True,
        init_step_no=None,
        use_foot_forces: bool = False,
        dtype=jnp.float32,
        **kwargs,
    ):
        name = (
            "unitree_a1_torque.xml"
            if action_mode == "torque"
            else "unitree_a1_position.xml"
        )
        xml = str(REF_ROOT / "environments" / "data" / "quadrupeds" / name)
        mj_model = _add_dir_arrow(xml)
        model = put_model(mj_model, dtype=dtype)
        obs_index = ObsIndex(model, _obs_spec())

        self.action_mode = action_mode
        self.setup_random_rot = setup_random_rot
        self.default_target_velocity = default_target_velocity

        # observation layout after dropping x/y:
        # 16 qpos + 18 qvel = 34, then dir-arrow rotmat 9 -> replaced by
        # (cos, sin), then goal speed  => total 37
        self._rot_start = 34
        n_obs_nogrf = 37
        x_vel_idx = 16  # dq_trunk_tx after x/y drop
        y_vel_idx = 17

        reward_fn = make_reward(
            reward_type,
            reward_params,
            dict(x_vel_idx=x_vel_idx, y_vel_idx=y_vel_idx),
        )

        # fall detection (unitreeA1.py:503-536); obs indices after x/y drop:
        # q_trunk_tz = 0, q_trunk_list = 1, q_trunk_tilt = 2
        def has_fallen(obs):
            list_c = (obs[1] < -0.2793) | (obs[1] > 0.2793)
            tilt_c = (obs[2] < -0.192) | (obs[2] > 0.192)
            height_c = obs[0] < -0.24
            return list_c | tilt_c | height_c

        traj_data = None
        if traj_params is not None:
            traj_data = self._load_traj(model, obs_index, traj_params, dtype)

        super().__init__(
            model,
            obs_index,
            reward_fn=reward_fn,
            traj_data=traj_data,
            random_start=random_start,
            init_step_no=init_step_no,
            use_foot_forces=use_foot_forces,
            grf_size=12,
            has_fallen=has_fallen,
            dtype=dtype,
            **kwargs,
        )

        self._mj_model = mj_model
        self._mj_models = [mj_model]

        # collision groups for ground-reaction forces (unitreeA1.py:223-228)
        gmap = model.names["geom"]
        self._floor_ids = np.asarray([gmap["floor"]])
        self._foot_ids = {
            f: np.asarray([gmap[f"{f}_foot"]]) for f in ("FL", "FR", "RL", "RR")
        }

    # ------------------------------------------------------------------
    def _extra_obs_dim(self) -> int:
        # rotmat(9) -> cos/sin(2), plus goal speed(1): net -9+2+1 = -6
        return -6

    def _modify_observation(self, obs, state):
        """Replace the dir-arrow rotmat block with (cos, sin) of the goal
        angle and append goal speed (unitreeA1.py:722-753)."""
        angle = um.transform_angle_2pi(state.goal[0]) - jnp.pi / 2
        feats = jnp.stack([jnp.cos(angle), jnp.sin(angle)]).astype(self.dtype)
        return jnp.concatenate(
            [obs[: self._rot_start], feats, state.goal[1:2].astype(self.dtype)]
        )

    def _setup_sample(self, sample, rng):
        """Optional random z rotation; goal from the sample's dir-arrow
        rotmat + goal_speed (unitreeA1.py:245-294)."""
        # sample layout: 18 qpos, 18 qvel, dir_arrow rotmat 9, goal_speed 1
        if self.setup_random_rot:
            angle = jax.random.uniform(rng, (), minval=0.0, maxval=2 * jnp.pi)
            sample = um.rotate_obs(sample, angle, 5, 18, 19)
        rot = self.traj.get_from_sample(sample, "dir_arrow")
        goal_angle = um.mat2angle_xy_jax(rot)
        goal_speed = self.traj.get_from_sample(sample, "goal_speed")[0]
        goal = jnp.stack([goal_angle, goal_speed]).astype(self.dtype)
        return sample, goal

    def _grf(self, data):
        ell = True  # A1 uses elliptic cones
        parts = [
            support.contact_force_groups(
                self.model, data, self._floor_ids, self._foot_ids[f], ell
            )
            for f in ("FL", "FR", "RL", "RR")
        ]
        return jnp.concatenate(parts).astype(self.dtype)

    # ------------------------------------------------------------------
    def _load_traj(self, model, obs_index, traj_params, dtype):
        keys = [k for k, *_ in _obs_spec()]
        key_dims = [1] * 36 + [9]
        jnt_ranges = np.asarray(model.jnt_range)
        jmap = model.names["joint"]
        low = np.array([jnt_ranges[jmap[j], 0] for j in JOINTS[2:]])
        high = np.array([jnt_ranges[jmap[j], 1] for j in JOINTS[2:]])

        map_params = dict(rot_mat_idx=36, trunk_orientation_idx=[3, 4, 5])
        remap_params = dict(
            angle_idx=36,
            trunk_orientation_idx=[3, 4, 5],
            position_indices=list(range(18)),
            velocity_indices=list(range(18, 36)),
            ctrl_dt=float(traj_params.get("control_dt", 0.01)),
        )
        return TrajectoryData(
            keys,
            key_dims,
            low=low,
            high=high,
            joint_pos_idx=list(range(18)),
            interpolate_map=_interpolate_map,
            interpolate_remap=_interpolate_remap,
            interpolate_map_params=map_params,
            interpolate_remap_params=remap_params,
            dtype=dtype,
            **traj_params,
        )

    def _dataset_ignore_keys(self):
        # unitreeA1.py:337 — global x/y dropped from IL datasets
        return ["q_trunk_tx", "q_trunk_ty"]

    def get_kinematic_obs_mask(self):
        # unitreeA1.py:345-351 — the whole obs (scalars + goal features)
        return np.arange(self._rot_start + 3)

    def _dataset_state_callback(self):
        # transform each dataset state to the obs layout: 9-dim dir-arrow
        # rotmat -> (cos, sin) features + goal speed (unitreeA1.py:722-753)
        rot_start = self._rot_start

        def cb(state):
            obs = state[:rot_start]
            mat = state[rot_start:rot_start + 9].reshape(3, 3)
            angle = um.transform_angle_2pi(um.mat2angle_xy(mat)) - np.pi / 2
            feats = [np.cos(angle), np.sin(angle)]
            return np.concatenate([obs, feats, state[rot_start + 9:]])

        return cb, None

    def load_trajectory(self, traj_params, warn=True):
        """Load/replace trajectories post-construction (base.py:145-168)."""
        if not warn:
            traj_params = dict(traj_params, warn=False)
        self.traj = self._load_traj(
            self.model, self.obs_index, traj_params, self.dtype
        )

    def load_dataset_and_get_traj_files(self, dataset_path, freq=None):
        """Perfect-dataset conversion with the A1's dir-arrow handling
        (unitreeA1.py:354-418): the dataset stores the goal as cos/sin
        columns; rebuild the 9-dim rotation matrix and a constant
        goal_speed from the mean trunk speed."""
        dataset = np.load(str(dataset_path), allow_pickle=True)
        states = np.atleast_2d(dataset["states"])
        last = dataset["last"] if "last" in dataset else None
        keys = [k for k, *_ in _obs_spec()]
        num = len(states)
        out = {}
        for i, key in enumerate(keys):
            if i < 2:
                if freq is None:
                    data = np.zeros(num)
                else:
                    dt = 1.0 / float(freq)
                    vel_idx = keys.index("d" + key) - 2
                    data = [0.0]
                    for j, v in enumerate(states[:-1, vel_idx], 1):
                        if last is not None and last[j - 1] == 1:
                            data.append(0.0)
                        else:
                            data.append(data[-1] + dt * v)
                    data = np.asarray(data)
            elif key == "dir_arrow":
                sin_cos = states[:, i - 2:i]
                angle = np.arctan2(sin_cos[:, 1], sin_cos[:, 0])
                data = np.stack(
                    [um.angle2mat_xy(a).reshape(9) for a in angle]
                )
                vels = np.stack(
                    [
                        states[:, keys.index("dq_trunk_tx") - 2],
                        states[:, keys.index("dq_trunk_ty") - 2],
                    ],
                    axis=1,
                )
                speed = np.linalg.norm(vels, axis=1)
                out["goal_speed"] = np.mean(speed) * np.ones_like(speed)
            else:
                data = states[:, i - 2]
            out[key] = data
        if last is not None and num > 2:
            out["split_points"] = np.concatenate(
                [[0], np.squeeze(np.argwhere(last == 1) + 1)]
            )
        return out

    # ------------------------------------------------------------------
    @staticmethod
    def generate(task="simple", dataset_type="real", debug=False, **kwargs):
        """Task factory (unitreeA1.py:622-713)."""
        check_validity_task_mode_dataset(
            "UnitreeA1", task, None, dataset_type,
            *UnitreeA1.valid_task_confs.get_all(),
        )
        if task == "simple":
            path = (
                "datasets/quadrupeds/real/walk_straight.npz"
                if dataset_type == "real"
                else "datasets/quadrupeds/perfect/unitreea1_simple/perfect_expert_dataset_det.npz"
            )
        else:
            path = (
                "datasets/quadrupeds/real/walk_8_dir.npz"
                if dataset_type == "real"
                else "datasets/quadrupeds/perfect/unitreea1_hard/perfect_expert_dataset_det.npz"
            )
        full = REF_ROOT / path
        if debug or not full.exists():
            parts = path.split("/")
            parts.insert(3, "mini_datasets")
            full = REF_ROOT / "/".join(parts)
            if (
                task == "hard" and dataset_type == "real"
                and not full.exists()
            ):
                # the reference asset pack ships a mini dataset for the
                # simple task only; synthesize the 8-direction variant
                # from it (utils.dataset.synthesize_walk_8_dir)
                from ...utils.dataset import synthesize_walk_8_dir

                src = (
                    REF_ROOT / "datasets/quadrupeds/real/mini_datasets/"
                    "walk_straight.npz"
                )
                cache = Path(
                    os.environ.get(
                        "LMT_SYNTH_DATASET_DIR",
                        os.path.expanduser("~/.cache/lmt_datasets"),
                    )
                )
                full = synthesize_walk_8_dir(
                    src, cache / "walk_8_dir_mini.npz"
                )

        if dataset_type == "perfect":
            # perfect data was recorded at the control rate with the
            # default config (unitreeA1.py:697-707)
            if "use_foot_forces" in kwargs:
                assert kwargs["use_foot_forces"] is False
            if "action_mode" in kwargs:
                assert kwargs["action_mode"] == "torque"
            if "default_target_velocity" in kwargs:
                assert kwargs["default_target_velocity"] == 0.5
            env = UnitreeA1(**kwargs)
            if not full.exists():
                raise FileNotFoundError(
                    f"perfect dataset not found at {full}; download the "
                    "datasets first (loco-mujoco-download-perfect)"
                )
            traj_files = env.load_dataset_and_get_traj_files(full, freq=100)
            env.load_trajectory(
                dict(traj_files=traj_files, traj_dt=0.01, control_dt=0.01),
                warn=False,
            )
            return env
        traj_params = dict(
            traj_path=str(full),
            traj_dt=1.0 / 500,
            control_dt=0.01,
        )
        return UnitreeA1(traj_params=traj_params, **kwargs)


def _interpolate_map(traj, rot_mat_idx, trunk_orientation_idx):
    """unitreeA1.py:856-887 — unwrap trunk angles, rotmat -> angle."""
    out = []
    for i, tr in enumerate(traj):
        if i in trunk_orientation_idx:
            out.append(np.unwrap(np.asarray(tr)))
        elif i == rot_mat_idx:
            mats = np.asarray(tr)
            out.append(np.arctan2(-mats[:, 1], mats[:, 0]))
        else:
            out.append(np.asarray(tr))
    return np.array(out)


def _interpolate_remap(
    traj, angle_idx, trunk_orientation_idx, position_indices,
    velocity_indices, ctrl_dt,
):
    """unitreeA1.py:889-928 — wrap angles, finite-difference velocities,
    angle -> rotmat."""
    out = []
    for i in range(len(traj)):
        if i in trunk_orientation_idx:
            out.append(um.transform_angle_2pi(np.asarray(traj[i])))
        elif i in velocity_indices:
            jp = np.asarray(traj[position_indices[velocity_indices.index(i)]])
            out.append(
                np.concatenate([[0.0], (jp[1:] - jp[:-1]) / ctrl_dt])
            )
        elif i == angle_idx:
            angles = np.asarray(traj[i])
            mats = np.stack(
                [um.angle2mat_xy(a).reshape(9) for a in angles]
            )
            out.append(mats)
        else:
            out.append(np.asarray(traj[i]))
    return out
