"""4-Ages humanoids (HumanoidTorque4Ages / HumanoidMuscle4Ages).

Behavioral port of reference `humanoids/base_humanoid_4_ages.py` (C5): four
body scalings [0.4, 0.6, 0.8, 1.0] resembling toddler/child/teen/adult. The
body scaling law (base_humanoid_4_ages.py:304-359): mesh scale x s (head
kept), body pos x s, mass x s^3, diagonal inertia x s^5, motor gear x s^2
(torque) / muscle force x s^2 + lengthrange x s (muscle), site pos x s.

TPU-native multi-model design: the 4 scaled models share one structure and
become stacked numeric leaves selected per env by env_id at reset (see
envs/base.py model variants); the scaling is applied to the MjSpec before
compile (_scale_spec) — the same pipeline the reference reaches through
per-scaling XML surgery, keeping all compile-derived constants consistent.

Observation: binary env-id bits appended (:256-277); reward:
multi_target_velocity with per-scaling target (:279-302); resets sample
trajectories from the variant's share of the POMDP dataset (:132-136).
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

import mujoco

from ...core.io import put_model
from ...envs.observation import ObsIndex
from ...registry import register
from ...utils.checks import ValidTaskConf, check_validity_task_mode_dataset
from .humanoid import ALL_JOINTS, BaseHumanoid, REF_ROOT, _obs_spec, _surgery

DEFAULT_SCALINGS = [0.4, 0.6, 0.8, 1.0]
HEAD_MESHES = {"hat_skull", "hat_jaw", "hat_ribs_cap"}


def _scale_spec(spec: mujoco.MjSpec, s: float, use_muscles: bool):
    """Apply the 4-ages body-scaling law to the MjSpec BEFORE compile
    (reference scale_body, base_humanoid_4_ages.py:304-359): mesh scale
    x s (head meshes kept adult-size, head geoms repositioned), body pos
    x s, mass x s^3, fullinertia x s^5, muscle force x s^2 + lengthrange
    x s + site pos x s (muscle model), motor gear x s^2 (torque model).

    Scaling the spec — not the compiled model — keeps every
    compile-derived quantity consistent (qhull hulls, geom_rbound,
    geom_aabb, the per-body BVH MuJoCo 3.x midphase culls with,
    invweight0): patching mesh_vert on a compiled model leaves a stale
    BVH that culls real contacts (observed: the 0.4-scaling child's
    skull penetrating the floor was dropped by mj_collision while
    mj_geomDistance reported -5.5mm). Hull topology is identical across
    scalings (mesh_graph is scale-invariant, verified for all 4), so
    variant leaf stacking needs no coordination."""
    for mesh in spec.meshes:
        if mesh.name not in HEAD_MESHES:
            mesh.scale = np.asarray(mesh.scale) * s
    for g in spec.geoms:
        if g.name in HEAD_MESHES:  # reposition head (ref :326-328)
            g.pos = [0.0, -0.5 * (1 - s), 0.0]
    for b in spec.bodies:
        if b.name == "world":
            continue
        b.pos = np.asarray(b.pos) * s
        b.mass = b.mass * s**3
        fi = np.asarray(b.fullinertia)
        assert np.all(fi[3:] == 0.0), (
            "off-diagonal inertia nonzero; 4-ages s^5 diagonal scaling "
            "invalid (reference scale_body assert)"
        )
        b.fullinertia = fi * s**5
    if use_muscles:
        for site in spec.sites:
            site.pos = np.asarray(site.pos) * s
        for a in spec.actuators:
            if "mot" in a.name:
                continue  # arm torque motors keep their gear
            gp = np.asarray(a.gainprm).copy()
            bp = np.asarray(a.biasprm).copy()
            if gp[2] > 0:  # muscle peak force (gainprm/biasprm slot 2)
                gp[2] *= s**2
            if bp[2] > 0:
                bp[2] *= s**2
            a.gainprm = gp
            a.biasprm = bp
            a.lengthrange = np.asarray(a.lengthrange) * s
    else:
        for a in spec.actuators:
            a.gear = np.asarray(a.gear) * s**2


class BaseHumanoid4Ages(BaseHumanoid):
    def __init__(
        self,
        scaling=None,
        scaling_trajectory_map=None,
        use_muscles: bool = False,
        use_box_feet: bool = True,
        disable_arms: bool = True,
        alpha_box_feet: float = 0.5,
        reward_type: str = "multi_target_velocity",
        reward_params: dict | None = None,
        dtype=jnp.float32,
        **kwargs,
    ):
        scalings = (
            DEFAULT_SCALINGS if scaling is None
            else ([scaling] if np.isscalar(scaling) else list(scaling))
        )
        self.scalings = scalings
        self._n_all_models = len(DEFAULT_SCALINGS)
        self._env_id_len = int(np.ceil(np.log2(self._n_all_models)))
        if len(scalings) == 1:
            self._fixed_model_idx = DEFAULT_SCALINGS.index(scalings[0])
        else:
            self._fixed_model_idx = None
        self._scaling_trajectory_map = scaling_trajectory_map

        name = "humanoid_muscle.xml" if use_muscles else "humanoid_torque.xml"
        xml = REF_ROOT / "environments" / "data" / "humanoid" / name

        models = []
        mj_models = []
        joints_rm = None
        for s in scalings:
            mj_model, j_rm, _ = _surgery(
                xml, use_box_feet, disable_arms, alpha_box_feet,
                scaling=s,
                spec_edit=lambda sp, _s=s: _scale_spec(sp, _s, use_muscles),
            )
            mj_models.append(mj_model)
            # hull topology is shared across scalings automatically:
            # MuJoCo's mesh graph is scale-invariant, so put_model's
            # static hull tables agree across variants and the numeric
            # leaves stack
            models.append(put_model(mj_model, dtype=dtype))
            joints_rm = j_rm

        model = models[0]
        variants = models if len(models) > 1 else None

        if reward_type == "multi_target_velocity":
            tv = (reward_params or {}).get("target_velocity", 1.25)
            reward_type = "multi_target_velocity"
            reward_params = dict(
                target_velocities=[tv * s for s in DEFAULT_SCALINGS],
                env_id_len=self._env_id_len,
            )

        # BaseHumanoid builds obs spec/fall predicate/GRF from the base model
        super().__init__(
            use_muscles=use_muscles,
            use_box_feet=use_box_feet,
            disable_arms=disable_arms,
            alpha_box_feet=alpha_box_feet,
            reward_type=reward_type,
            reward_params=reward_params,
            dtype=dtype,
            _prebuilt=(model, variants, joints_rm, mj_models),
            **kwargs,
        )

    # ---- multi-model hooks ------------------------------------------------
    def _extra_obs_dim(self):
        return self._env_id_len

    def _append_obs(self, obs, state):
        # binary env-id bits, big-endian (reference _get_env_id_map),
        # appended after the GRF block (base_humanoid_4_ages.py:256-277)
        idx = (
            state.env_id
            if self._fixed_model_idx is None
            else jnp.asarray(self._fixed_model_idx, jnp.int32)
        )
        bits = [
            ((idx >> (self._env_id_len - 1 - k)) & 1).astype(self.dtype)
            for k in range(self._env_id_len)
        ]
        return jnp.concatenate([obs, jnp.stack(bits)])

    # ---- POMDP observation masking (base_humanoid_4_ages.py:187-241) -----
    _hidable_obs = ("positions", "velocities", "foot_forces", "env_type")

    def get_mask(self, obs_to_hide):
        """Boolean keep-mask over the observation: True = keep. Hidable
        groups: "positions", "velocities", "foot_forces" (only with
        use_foot_forces), "env_type" (the binary env-id bits, only with
        more than one scaling active)."""
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
        if self.n_variants > 1:
            mask.append(
                np.full(self._env_id_len, "env_type" not in obs_to_hide,
                        dtype=bool)
            )
        elif "env_type" in obs_to_hide:
            raise ValueError(
                "Creating a mask to hide the env type without having more "
                "than one env is not allowed."
            )
        else:
            # the bits are still part of the obs for a fixed scaling
            # (constant id); they stay visible
            mask.append(np.ones(self._env_id_len, dtype=bool))
        return np.concatenate(mask).ravel()

    def _reward_info(self, state):
        info = super()._reward_info(state)
        if self._fixed_model_idx is not None:
            info["env_id"] = jnp.asarray(self._fixed_model_idx, jnp.int32)
        return info

    def _traj_range(self, env_id):
        if self.traj is None or self.n_variants == 1:
            return 0, None
        per = self.traj.n_traj // self.n_variants
        return env_id * per, (env_id + 1) * per

    # ---- factory ----------------------------------------------------------
    @classmethod
    def _generate_4ages(cls, path, task, mode, dataset_type, debug, use_muscles,
                        **kwargs):
        suffix = {"all": "_all.npz", "1": "_1.npz", "2": "_2.npz",
                  "3": "_3.npz", "4": "_4.npz"}[mode]
        scaling = {"all": None, "1": 0.4, "2": 0.6, "3": 0.8, "4": 1.0}[mode]
        local = path + suffix
        full = REF_ROOT / local
        if dataset_type == "real" and (debug or not full.exists()):
            parts = local.split("/")
            parts.insert(3, "mini_datasets")
            full = REF_ROOT / "/".join(parts)
        if "reward_params" not in kwargs:
            kwargs["reward_params"] = dict(
                target_velocity=1.25 if task == "walk" else 2.5
            )
        if dataset_type == "perfect":
            # base_humanoid_4_ages.py:449-457 — datasets at control rate
            from ...datasets.trajectory import load_dataset_and_get_traj_files

            env = cls(scaling=scaling, use_muscles=use_muscles, **kwargs)
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
                dict(traj_files=traj_files, traj_dt=0.01, control_dt=0.01),
                warn=False,
            )
            return env
        traj_params = dict(
            traj_path=str(full), traj_dt=1.0 / 500, control_dt=0.01
        )
        return cls(
            scaling=scaling, use_muscles=use_muscles, traj_params=traj_params,
            **kwargs,
        )


@register
class HumanoidTorque4Ages(BaseHumanoid4Ages):
    valid_task_confs = ValidTaskConf(
        tasks=["walk", "run"],
        modes=["all", "1", "2", "3", "4"],
        data_types=["real", "perfect"],
    )

    @staticmethod
    def generate(task="walk", mode="all", dataset_type="real", debug=False,
                 **kwargs):
        check_validity_task_mode_dataset(
            "HumanoidTorque4Ages", task, mode, dataset_type,
            *HumanoidTorque4Ages.valid_task_confs.get_all(),
        )
        if dataset_type == "perfect":
            # humanoids.py:878-890
            path = (
                "datasets/humanoids/perfect/humanoid4ages_torque_walk/"
                "HumanoidTorque4Ages_walk_stochastic_dataset"
                if task == "walk"
                else "datasets/humanoids/perfect/humanoid4ages_torque_run/"
                "HumanoidTorque4Ages_run_stochastic_dataset"
            )
        else:
            path = (
                "datasets/humanoids/real/02-constspeed_reduced_humanoid_POMDP"
                if task == "walk"
                else "datasets/humanoids/real/05-run_reduced_humanoid_POMDP"
            )
        return HumanoidTorque4Ages._generate_4ages(
            path, task, mode, dataset_type, debug, use_muscles=False, **kwargs
        )


@register
class HumanoidMuscle4Ages(BaseHumanoid4Ages):
    valid_task_confs = ValidTaskConf(
        tasks=["walk", "run"],
        modes=["all", "1", "2", "3", "4"],
        data_types=["real", "perfect"],
        non_combinable=[("run", None, "perfect")],
    )

    @staticmethod
    def generate(task="walk", mode="all", dataset_type="real", debug=False,
                 **kwargs):
        check_validity_task_mode_dataset(
            "HumanoidMuscle4Ages", task, mode, dataset_type,
            *HumanoidMuscle4Ages.valid_task_confs.get_all(),
        )
        path = (
            "datasets/humanoids/real/02-constspeed_reduced_humanoid_POMDP"
            if task == "walk"
            else "datasets/humanoids/real/05-run_reduced_humanoid_POMDP"
        )
        return HumanoidMuscle4Ages._generate_4ages(
            path, task, mode, dataset_type, debug, use_muscles=True, **kwargs
        )
