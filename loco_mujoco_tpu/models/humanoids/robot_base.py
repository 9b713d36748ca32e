"""Shared machinery for the rigid-robot humanoids (Atlas, Talos, Unitree
H1/G1) — behavioral port of reference `humanoids/base_robot_humanoid.py` (C7)
plus the per-robot XML-surgery pattern each subclass repeats (joint/motor/
equality removal, arm reorientation, carried-weight boxes).

Weight carrying (the reference's MultiMuJoCo use case, SURVEY.md §2 item 2):
instead of K compiled models cycled per episode, the K weight variants share
one model STRUCTURE and differ only in numeric leaves; a variant id sampled
at reset gathers the right leaves. That keeps one compiled step for all
variants — data, not control flow.
"""

from __future__ import annotations

from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np

import mujoco

from ...core.io import put_model
from ...datasets.trajectory import TrajectoryData
from ...envs.base import LocoEnv
from ...envs.observation import ObservationType, ObsIndex
from ...ops import support
from ...rewards import make_reward

from ...utils.assets import REF_ROOT  # asset root, env-var overridable


def joint_obs_spec(joints):
    spec = [(f"q_{j}", j, ObservationType.JOINT_POS) for j in joints]
    spec += [(f"dq_{j}", j, ObservationType.JOINT_VEL) for j in joints]
    return spec


def apply_surgery(
    xml_path,
    joints_rm=(),
    motors_rm=(),
    eq_rm=(),
    body_quats=(),
    weight=None,
):
    """Generic MjSpec surgery: remove joints/motors/equalities, reorient
    bodies, optionally attach a carried-weight box.

    weight: None or (parent_body, mass, size, pos, rgba).
    """
    spec = mujoco.MjSpec.from_file(str(xml_path))
    for name in joints_rm:
        j = spec.joint(name)
        if j is not None:
            spec.delete(j)
    for name in motors_rm:
        a = spec.actuator(name)
        if a is not None:
            spec.delete(a)
    eq_rm = set(eq_rm)
    for e in list(spec.equalities):
        if e.name in eq_rm:
            spec.delete(e)
    for bname, quat in body_quats:
        b = spec.body(bname)
        if b is not None:
            b.quat = quat
    if weight is not None:
        parent, mass, size, pos, rgba = weight
        wb = spec.body(parent).add_body(name="weight")
        wb.add_geom(
            name="weight_geom",
            type=mujoco.mjtGeom.mjGEOM_BOX,
            size=list(size),
            pos=list(pos),
            rgba=list(rgba),
            mass=float(mass),
        )
    return spec.compile()


def weight_color(ind, n):
    """Box color interpolation (base_robot_humanoid.py:126-143)."""
    red = np.array([1.0, 0.0, 0.0, 1.0])
    blue = np.array([0.2, 0.0, 1.0, 1.0])
    t = ind / max(n - 1, 1)
    return blue + (red - blue) * t


class RobotHumanoid(LocoEnv):
    """Rigid-robot humanoid base: GRF from two-foot collision groups,
    target-velocity reward, weight-mass observation extension."""

    VALID_WEIGHTS = [0.1, 1.0, 5.0, 10.0]

    def __init__(
        self,
        model,
        obs_index,
        joints,
        foot_groups,  # dict name -> list of geom names
        has_fallen_fn,
        reward_type="target_velocity",
        reward_params=None,
        traj_params=None,
        traj_opts=None,
        hold_weight=False,
        weight_mass=None,
        weight_masses=None,
        grf_size=6,
        dtype=jnp.float32,
        **kwargs,
    ):
        keys = [f"q_{j}" for j in joints] + [f"dq_{j}" for j in joints]
        self._key_idx = {k: i - 2 for i, k in enumerate(keys)}
        self.joints = joints
        self.hold_weight = hold_weight
        self.weight_mass = weight_mass
        if weight_masses is not None:
            self.weight_masses = jnp.asarray(weight_masses, dtype=dtype)
        elif weight_mass is not None:
            self.weight_masses = jnp.asarray([weight_mass], dtype=dtype)
        else:
            self.weight_masses = jnp.zeros(1, dtype=dtype)

        x_vel_idx = self._key_idx["dq_pelvis_tx"]
        reward_fn = make_reward(
            reward_type, reward_params, dict(x_vel_idx=x_vel_idx)
        )

        self._traj_opts = traj_opts or {}
        self._traj_model = model
        traj_data = None
        if traj_params is not None:
            traj_data = self._make_traj(model, joints, keys, traj_params, dtype)

        super().__init__(
            model,
            obs_index,
            reward_fn=reward_fn,
            traj_data=traj_data,
            grf_size=grf_size,
            has_fallen=has_fallen_fn(self._key_idx),
            dtype=dtype,
            **kwargs,
        )

        gmap = model.names["geom"]
        self._floor_ids = np.asarray([gmap["floor"]])
        self._grf_groups = [
            np.asarray([gmap[g] for g in geoms]) for geoms in foot_groups
        ]
        self._elliptic_cone = False

    def _make_traj(self, model, joints, keys, traj_params, dtype):
        jr = np.asarray(model.jnt_range)
        jmap = model.names["joint"]
        low = np.array([jr[jmap[j], 0] for j in joints[2:]])
        high = np.array([jr[jmap[j], 1] for j in joints[2:]])
        return TrajectoryData(
            keys,
            [1] * len(keys),
            low=low,
            high=high,
            joint_pos_idx=list(range(len(joints))),
            dtype=dtype,
            **{**self._traj_opts, **traj_params},
        )

    def load_trajectory(self, traj_params, warn=True):
        """Load (or replace) trajectories after construction — reference
        LocoEnv.load_trajectory (base.py:145-168)."""
        keys = [f"q_{j}" for j in self.joints] + [f"dq_{j}" for j in self.joints]
        if not warn:
            traj_params = dict(traj_params, warn=False)
        self.traj = self._make_traj(
            self._traj_model, self.joints, keys, traj_params, self.dtype
        )

    def _extra_obs_dim(self):
        return 1 if self.hold_weight else 0

    def _append_obs(self, obs, state):
        if self.hold_weight:
            # carried-weight mass appended after the GRF block
            # (base_robot_humanoid.py:106-124); multi-variant envs read the
            # mass of the active variant
            w = self.weight_masses[state.env_id].astype(self.dtype)
            obs = jnp.concatenate([obs, w[None]])
        return obs

    # ---- POMDP observation masking (base_robot_humanoid.py:39-91) --------
    _hidable_obs = ("positions", "velocities", "foot_forces", "weight")

    def get_mask(self, obs_to_hide):
        """Boolean keep-mask over the observation for POMDP experiments:
        True = keep, False = hide. Hidable groups: "positions",
        "velocities", "foot_forces" (only with use_foot_forces), "weight"
        (only with hold_weight)."""
        if isinstance(obs_to_hide, str):
            obs_to_hide = (obs_to_hide,)
        bad = [x for x in obs_to_hide if x not in self._hidable_obs]
        if bad:
            raise ValueError(
                f"Cannot hide {bad}; valid observations to hide are "
                f"{self._hidable_obs}."
            )
        pos_dim = len(self.joints) - 2  # global x/y dropped from the obs
        vel_dim = len(self.joints)
        mask = [
            np.full(pos_dim, "positions" not in obs_to_hide, dtype=bool),
            np.full(vel_dim, "velocities" not in obs_to_hide, dtype=bool),
        ]
        if self.use_foot_forces:
            mask.append(
                np.full(self.grf_size, "foot_forces" not in obs_to_hide,
                        dtype=bool)
            )
        elif "foot_forces" in obs_to_hide:
            raise ValueError(
                "Creating a mask to hide foot forces without activating "
                "the latter is not allowed."
            )
        if self.hold_weight:
            mask.append(
                np.full(1, "weight" not in obs_to_hide, dtype=bool)
            )
        elif "weight" in obs_to_hide:
            raise ValueError(
                "Creating a mask to hide the carried weight without "
                "activating the latter is not allowed."
            )
        return np.concatenate(mask).ravel()

    def _grf(self, data):
        parts = [
            support.contact_force_groups(
                self.model, data, self._floor_ids, g, self._elliptic_cone
            )
            for g in self._grf_groups
        ]
        return jnp.concatenate(parts).astype(self.dtype)

    def _dataset_ignore_keys(self):
        # base_robot_humanoid.py:18-37 — global x/y dropped from IL datasets
        return ["q_pelvis_tx", "q_pelvis_tz"]

    @classmethod
    def generate_robot(
        cls, path, task="walk", dataset_type="real", debug=False,
        clip_trajectory_to_joint_ranges=False, **kwargs,
    ):
        """BaseRobotHumanoid.generate flow (base_robot_humanoid.py:145-260)."""
        if "reward_type" not in kwargs:
            kwargs["reward_type"] = "target_velocity"
        if "reward_params" not in kwargs:
            kwargs["reward_params"] = dict(
                target_velocity=2.5 if task == "run" else 1.25
            )
        if task == "carry":
            kwargs["hold_weight"] = True
        full = REF_ROOT / path
        if debug or not full.exists():
            parts = path.split("/")
            parts.insert(3, "mini_datasets")
            full = REF_ROOT / "/".join(parts)

        if dataset_type == "perfect":
            # action-bearing expert dataset at control rate; global x/y are
            # re-integrated from velocities (base_robot_humanoid.py:224-235)
            from ...datasets.trajectory import load_dataset_and_get_traj_files

            env = cls(**kwargs)
            if not full.exists():
                raise FileNotFoundError(
                    f"perfect dataset not found at {full}; download the "
                    "datasets first (loco-mujoco-download-perfect)"
                )
            keys = [f"q_{j}" for j in env.joints] + [
                f"dq_{j}" for j in env.joints
            ]
            traj_files = load_dataset_and_get_traj_files(full, keys, freq=100)
            env.load_trajectory(
                dict(
                    traj_files=traj_files, traj_dt=0.01, control_dt=0.01,
                    clip_trajectory_to_joint_ranges=clip_trajectory_to_joint_ranges,
                ),
                warn=False,
            )
            return env

        if dataset_type == "preference":
            # directory of labelled expert datasets, concatenated with
            # offset split points and a per-trajectory label drawn from the
            # filename (base_robot_humanoid.py:231-256)
            from ...datasets.trajectory import load_dataset_and_get_traj_files
            import os

            env = cls(**kwargs)
            if not full.is_dir():
                raise FileNotFoundError(
                    f"preference dataset dir not found at {full}; download "
                    "the datasets first"
                )
            keys = [f"q_{j}" for j in env.joints] + [
                f"dq_{j}" for j in env.joints
            ]
            infos = []
            all_tf = None
            for i, fname in enumerate(sorted(next(os.walk(full))[2])):
                tf = load_dataset_and_get_traj_files(
                    full / fname, keys, freq=100
                )
                if all_tf is None:
                    all_tf = tf
                else:
                    for k in tf:
                        if k == "split_points":
                            all_tf[k] = np.concatenate(
                                [all_tf[k], tf[k][1:] + all_tf[k][-1]]
                            )
                        else:
                            all_tf[k] = np.concatenate([all_tf[k], tf[k]])
                label = fname.split(".")[0].split("_")[-2]
                infos += [label] * (len(tf["split_points"]) - 1)
            env.load_trajectory(
                dict(
                    traj_files=all_tf, traj_dt=0.01, control_dt=0.01,
                    traj_info=infos,
                    clip_trajectory_to_joint_ranges=clip_trajectory_to_joint_ranges,
                ),
                warn=False,
            )
            return env

        traj_params = dict(
            traj_path=str(full),
            traj_dt=1.0 / 500,
            control_dt=0.01,
            clip_trajectory_to_joint_ranges=clip_trajectory_to_joint_ranges,
            warn=False,
        )
        return cls(traj_params=traj_params, **kwargs)
