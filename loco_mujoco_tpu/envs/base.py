"""LocoEnv — the batched, functional environment layer.

Redesign of the reference's LocoEnv (`loco_mujoco/environments/base.py`, 1k
LoC of object-oriented hooks around mushroom-rl's step loop) as pure
functions over an `EnvState` pytree: `reset: key -> EnvState` and
`step: (EnvState, action) -> EnvState`, both jittable and vmappable over
thousands of envs, shardable over a device mesh (SURVEY.md §7 design
stance).

Correspondence with the reference semantics:
 * action normalization to [-1, 1]           base.py:122-126, 606-621
 * N substeps of physics per control step    base.py:109-111
 * per-substep hook (goal arrow, GRF stats)  base.py:623-631
 * obs = spec vector minus global x/y,       base.py:567-604
   + optional GRF running mean / 1000
 * trajectory-based reset with recentred x/y base.py:205-241
 * absorbing = fall predicate                base.py:243-255
 * auto-reset: the batched replacement for exception-style episode ends —
   when done, the state is re-initialized in-step via a masked select.
"""

from __future__ import annotations

from typing import Any, Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..core.struct import pytree_dataclass, static_field
from ..core.types import Data, Model
from ..core.io import make_data
from ..ops import forward as fwd
from ..ops import support
from .observation import ObsIndex


@pytree_dataclass
class EnvState:
    """Per-env dynamic state. Batched by vmap over the leading axis."""

    data: Data
    obs: jax.Array
    reward: jax.Array  # ()
    absorbing: jax.Array  # () bool
    done: jax.Array  # () bool — absorbing or horizon reached
    rng: jax.Array  # PRNG key
    step_no: jax.Array  # () int32 — steps since episode start
    traj_no: jax.Array  # () int32 — trajectory used at init
    subtraj_step: jax.Array  # () int32
    goal: jax.Array  # (2,) [angle, speed] (zeros when unused)
    grf_window: jax.Array  # (window, grf_dim) ground-reaction-force history
    env_id: jax.Array  # () int32 — model variant id (multi-model envs)
    dr: Any  # dict of domain-randomized parameter draws ({} when unused)


class LocoEnv:
    """Host-built environment: compiles model + specs, exposes pure fns.

    Subclasses implement `_obs_spec`, `_action_spec`, `_has_fallen`, and
    optionally goal / obs-modification hooks. Instances are cheap frozen
    configuration; all per-step work happens inside `step` (traced).
    """

    def __init__(
        self,
        model: Model,
        obs_index: ObsIndex,
        *,
        gamma: float = 0.99,
        horizon: int = 1000,
        n_substeps: int = 10,
        reward_fn: Callable = None,
        traj_data=None,
        random_start: bool = True,
        init_step_no: Optional[int] = None,
        use_absorbing_states: bool = True,
        use_foot_forces: bool = False,
        grf_size: int = 6,
        grf_window: int = 10,
        has_fallen: Callable = None,
        solver_iterations: int = 8,
        ls_iterations: int = 8,
        auto_reset: bool = True,
        model_variants=None,
        random_env_reset: bool = True,
        domain_randomization_config: Optional[str] = None,
        dtype=jnp.float32,
    ):
        self.auto_reset = auto_reset
        self.random_env_reset = random_env_reset
        # host-side compiled MjModel(s) behind this env, retained by the
        # concrete env builders so verification harnesses can drive CPU
        # MuJoCo as an oracle twin on the exact surgeried model
        # (tools/acceptance_one.py); _mj_models is the per-variant list
        self._mj_model = None
        self._mj_models = None
        # batched-envs solver budget: under vmap the Newton/line-search
        # while_loops run until EVERY env in the batch converges, so the
        # iteration caps bound the per-step cost directly. Warm-started
        # Newton converges in a handful of iterations; 8/8 matches MJX's
        # recommended practice for batched RL workloads (vs MuJoCo's
        # single-env defaults of 100/50).
        model = model.replace(
            opt=model.opt.replace(
                iterations=min(model.opt.iterations, solver_iterations),
                ls_iterations=min(model.opt.ls_iterations, ls_iterations),
            )
        )
        self.model = model

        # model VARIANTS (weight-carry POMDP, 4-ages scalings): K models with
        # identical structure whose numeric leaves are stacked; an env_id
        # sampled at reset gathers one variant's leaves — the TPU-native
        # replacement for the reference's MultiMuJoCo model cycling
        # (SURVEY.md section 2, parallelism inventory item 2).
        if model_variants:
            base = model
            norm = []
            for v in model_variants:
                v = v.replace(
                    opt=v.opt.replace(
                        iterations=base.opt.iterations,
                        ls_iterations=base.opt.ls_iterations,
                    ),
                    stat_meaninertia=base.stat_meaninertia,
                )
                norm.append(v)
            self.variants = jax.tree_util.tree_map(
                lambda *ls: jnp.stack(ls), *norm
            )
            self.n_variants = len(norm)
        else:
            self.variants = None
            self.n_variants = 1

        # domain randomization: batched parameter resampling at reset
        # (replaces the reference's per-episode XML recompilation pool)
        if domain_randomization_config is not None:
            from ..utils.domain_randomization import DomainRandomizationHandler

            self.domain_rand = DomainRandomizationHandler(
                model, domain_randomization_config
            )
        else:
            self.domain_rand = None
        # stale-derived-fields guard: the fused step paths carry only the
        # integrated state between substeps, so Data's derived fields
        # (site_xmat & co.) hold start-of-step values when the observation
        # is built. An obs spec reading them would silently observe stale
        # data — envs with SITE_ROT entries must replace the block in
        # _modify_observation (A1: dir-arrow -> goal features) and declare
        # it via _replaces_site_obs.
        if len(obs_index.site_idx) and not getattr(
            self, "_replaces_site_obs", False
        ):
            raise ValueError(
                "observation spec reads site_xmat (SITE_ROT), which is "
                "stale on the fused step paths; override "
                "_modify_observation to replace the block and set "
                "_replaces_site_obs = True (see UnitreeA1)."
            )
        self.obs_index = obs_index
        self.gamma = gamma
        self.horizon = horizon
        self.n_substeps = n_substeps
        self.reward_fn = reward_fn or (lambda s, a, ns, i: jnp.zeros(()))
        self.traj = traj_data
        self.random_start = random_start
        self.init_step_no = init_step_no
        self.use_absorbing_states = use_absorbing_states
        self.use_foot_forces = use_foot_forces
        self.grf_size = grf_size
        self.grf_window = grf_window
        self._has_fallen = has_fallen or (lambda obs: jnp.asarray(False))
        self.dtype = dtype

        # action renormalization from ctrlrange (base.py:122-126)
        ctrl = np.asarray(model.actuator_ctrlrange)
        low, high = ctrl[:, 0], ctrl[:, 1]
        self.norm_act_mean = jnp.asarray((high + low) / 2.0, dtype=dtype)
        self.norm_act_delta = jnp.asarray((high - low) / 2.0, dtype=dtype)
        self.action_dim = model.nu

        # observation layout: spec minus global x/y (+ goal / GRF extensions)
        self.obs_dim = self._obs_dim()

    # ------------------------------------------------------------------
    # layout
    # ------------------------------------------------------------------
    def _obs_dim(self) -> int:
        d = self.obs_index.size - 2
        d += self._extra_obs_dim()
        if self.use_foot_forces:
            d += self.grf_size
        return d

    def _extra_obs_dim(self) -> int:
        return 0

    # ------------------------------------------------------------------
    # hooks (overridden by robots)
    # ------------------------------------------------------------------
    def _modify_observation(self, obs, state):
        """Post-process the raw (x/y-dropped) spec observation; default
        no-op. A1 swaps the goal-arrow rotmat for (cos, sin) features."""
        return obs

    def _append_obs(self, obs, state):
        """Extend the observation AFTER the GRF block, matching the
        reference's layering: `_create_observation` subclasses append their
        extras (carried-weight mass — base_robot_humanoid.py:106-124;
        4-ages env-id bits — base_humanoid_4_ages.py:256-277) on top of the
        base obs that already carries the foot forces."""
        return obs

    def _substep_hook(self, data: Data, state: EnvState) -> Data:
        """Called after every physics substep (goal-arrow pose etc.)."""
        return data

    def _reward_info(self, state: EnvState) -> dict:
        return {
            "goal_angle": state.goal[0],
            "goal_vel": state.goal[1],
            "env_id": state.env_id,
        }

    def _setup_sample(self, sample, rng):
        """Reset-time sample post-processing (A1: random z rotation) and
        goal extraction. Returns (sample, goal(2,))."""
        return sample, jnp.zeros(2, dtype=self.dtype)

    def _traj_range(self, env_id):
        """Valid trajectory range for a model variant (the 4-ages envs
        restrict sampling to the variant's share of the dataset)."""
        return 0, None

    # ------------------------------------------------------------------
    # observation assembly
    # ------------------------------------------------------------------
    def _build_obs(self, data: Data, state: EnvState) -> jax.Array:
        raw = self.obs_index.build_obs(data).astype(self.dtype)
        obs = raw[2:]
        obs = self._modify_observation(obs, state)
        if self.use_foot_forces:
            grf_mean = jnp.mean(state.grf_window, axis=0) / 1000.0
            obs = jnp.concatenate([obs, grf_mean.astype(self.dtype)])
        return self._append_obs(obs, state)

    def _grf(self, data: Data) -> jax.Array:
        """Ground-reaction forces; robots override with their collision
        groups. Default: zeros."""
        return jnp.zeros(self.grf_size, dtype=self.dtype)

    # ------------------------------------------------------------------
    # reset / step
    # ------------------------------------------------------------------
    def _fresh_data(self, model=None) -> Data:
        return make_data(model if model is not None else self.model,
                         dtype=self.dtype)

    def _model_at(self, env_id):
        if self.variants is None:
            return self.model
        return jax.tree_util.tree_map(lambda l: l[env_id], self.variants)

    def _apply_dr(self, model, dr):
        if self.domain_rand is None or not dr:
            return model
        return self.domain_rand.apply(model, dr)

    def _init_state(self, rng, full_forward: bool = True) -> EnvState:
        """Build an episode-start state (the `setup` path, base.py:205-241).

        `full_forward=False` builds the cheap variant used by in-step
        auto-reset: derived Data fields (FK products, mass matrix, contacts,
        constraint forces) are left at their reset zeros because the next
        step's `fwd.forward` recomputes every one of them before use, and no
        observation reads them at episode start (JOINT_POS/JOINT_VEL come
        from the injected sample; the only SITE_ROT entry in the suite — the
        A1 goal arrow — is replaced by goal features in
        `_modify_observation`). Skipping the forward also keeps the step
        graph free of a second solver while_loop, which XLA compiles to a
        13x-slower program when its outputs feed the auto-reset select
        (measured: 817ms -> 10.9s per 4096-env step on TPU v5e).
        """
        rng, k_traj, k_setup, k_env, k_dr = jax.random.split(rng, 5)
        if self.variants is not None and self.random_env_reset:
            env_id = jax.random.randint(k_env, (), 0, self.n_variants)
        else:
            env_id = jnp.zeros((), jnp.int32)
        dr = (
            self.domain_rand.sample(k_dr, dtype=self.dtype)
            if self.domain_rand is not None
            else {}
        )
        if full_forward:
            model = self._apply_dr(self._model_at(env_id), dr)
        else:
            # model only provides shapes to make_data on this path (the
            # forward is skipped), so the per-env variant gather is elided
            model = self.model
        # make_data is host-side numpy (shapes are variant-invariant); the
        # variant-gathered model's leaves are traced under jit, so build
        # from the static base model and inject the variant's qpos0
        data = self._fresh_data(self.model)
        if model is not self.model:
            data = data.replace(
                qpos=jnp.asarray(model.qpos0, dtype=self.dtype)
            )

        goal = jnp.zeros(2, dtype=self.dtype)
        traj_no = jnp.zeros((), dtype=jnp.int32)
        subtraj_step = jnp.zeros((), dtype=jnp.int32)
        if self.traj is not None:
            if self.random_start:
                lo, hi = self._traj_range(env_id)
                sample, traj_no, subtraj_step = self.traj.sample_reset(
                    k_traj, traj_lo=lo, traj_hi=hi
                )
            elif self.init_step_no is not None:
                tl = self.traj.traj_len
                sub = int(self.init_step_no % tl)
                tn = int(self.init_step_no / tl)
                sample, traj_no, subtraj_step = self.traj.sample_at(
                    jnp.asarray(tn), jnp.asarray(sub)
                )
            else:
                k_t, _ = jax.random.split(k_traj)
                tn = jax.random.randint(k_t, (), 0, self.traj.n_traj)
                sample, traj_no, subtraj_step = self.traj.sample_at(
                    tn, jnp.zeros((), jnp.int32)
                )
            sample, goal = self._setup_sample(sample, k_setup)
            data = self.obs_index.sample_to_state(self.model, data, sample)

        if full_forward:
            data = fwd.forward(model, data)

        state = EnvState(
            data=data,
            obs=jnp.zeros(self.obs_dim, dtype=self.dtype),
            reward=jnp.zeros((), dtype=self.dtype),
            absorbing=jnp.asarray(False),
            done=jnp.asarray(False),
            rng=rng,
            step_no=jnp.zeros((), jnp.int32),
            traj_no=traj_no,
            subtraj_step=subtraj_step,
            goal=goal,
            grf_window=jnp.zeros(
                (self.grf_window, self.grf_size), dtype=self.dtype
            ),
            env_id=env_id,
            dr=dr,
        )
        obs = self._build_obs(data, state)
        return state.replace(obs=obs)

    def reset(self, rng) -> EnvState:
        """Episode initialization. vmap over a batch of keys for many envs."""
        return self._init_state(rng)

    def step(self, state: EnvState, action) -> EnvState:
        """One control step (n_substeps physics steps), auto-resetting."""
        model = self._apply_dr(self._model_at(state.env_id), state.dr)

        # unnormalize action (base.py:606-621)
        a = action.astype(self.dtype) * self.norm_act_delta + self.norm_act_mean
        data = state.data.replace(ctrl=a)

        # megastep fast path: when nothing observes per-substep state (no
        # GRF window, no substep hook), the whole control step — all
        # n_substeps forwards AND the integrator — runs as ONE Pallas
        # program (ops/forward.step_n). Falls through to the lax.scan of
        # per-substep fwd.step on models outside the megastep envelope.
        d_mega = None
        if (
            not self.use_foot_forces
            and type(self)._substep_hook is LocoEnv._substep_hook
        ):
            d_mega = fwd.step_n(model, data, self.n_substeps)
        if d_mega is not None:
            data = d_mega
            st = state
            obs = self._build_obs(data, st)
            return self._finish_step(state, st, data, obs, action)

        # substeps via lax.scan: one traced substep body instead of an
        # n_substeps-times unrolled graph (10x smaller trace / compile).
        # The carry holds ONLY the integrated state (qpos/qvel/act/qacc/
        # warmstart/time) — threading the full Data pytree through the scan
        # copies every derived field (FK products, contacts, forces) in and
        # out of the loop buffers each substep (~6 ms/step of copy/slice
        # kernels at 4096 envs) even though fwd.step recomputes all of them
        # before use.
        def substep(carry, _):
            qpos, qvel, act, qacc, ws, t, win = carry
            d = data.replace(
                qpos=qpos, qvel=qvel, act=act, qacc=qacc,
                qacc_warmstart=ws, time=t,
            )
            d = fwd.step(model, d)
            d = self._substep_hook(d, state)
            if self.use_foot_forces:
                grf = self._grf(d)
                win = jnp.concatenate([win[1:], grf[None]], axis=0)
            return (
                d.qpos, d.qvel, d.act, d.qacc, d.qacc_warmstart, d.time, win
            ), None

        d0 = data
        (qpos, qvel, act, qacc, ws, t, grf_window), _ = jax.lax.scan(
            substep,
            (d0.qpos, d0.qvel, d0.act, d0.qacc, d0.qacc_warmstart, d0.time,
             state.grf_window),
            None, length=self.n_substeps,
        )
        # end-of-step Data: integrated fields are current; derived fields
        # are start-of-step values, recomputed by the next step's forward
        # before anything reads them (same contract as auto-reset's
        # full_forward=False path). The only derived field an observation
        # reads (A1's dir-arrow site_xmat) is replaced by goal features in
        # _modify_observation.
        data = data.replace(
            qpos=qpos, qvel=qvel, act=act, qacc=qacc, qacc_warmstart=ws,
            time=t,
        )
        st = state.replace(grf_window=grf_window)

        obs = self._build_obs(data, st)
        return self._finish_step(state, st, data, obs, action)

    def _finish_step(self, state: EnvState, st: EnvState, data: Data,
                     obs, action) -> EnvState:
        """Shared step tail: reward, absorbing/done, auto-reset merge."""
        info = self._reward_info(st)
        reward = self.reward_fn(state.obs, action, obs, info).astype(self.dtype)
        absorbing = (
            self._has_fallen(obs)
            if self.use_absorbing_states
            else jnp.asarray(False)
        )
        step_no = state.step_no + 1
        done = absorbing | (step_no >= self.horizon)

        stepped = st.replace(
            data=data,
            obs=obs,
            reward=reward,
            absorbing=absorbing,
            done=done,
            step_no=step_no,
        )

        if not self.auto_reset:
            return stepped

        # auto-reset: where done, swap in a fresh episode (keeps shapes
        # static; reward/done of the finishing step are preserved). Only the
        # *carried* fields are merged — qpos/qvel/act/ctrl/time/warmstart and
        # the env bookkeeping; every derived Data field (FK, inertia,
        # contacts, forces) is recomputed from scratch by the next step's
        # forward before anything reads it, so selecting it here would be
        # pure memory traffic (and triggers the XLA select-over-solver-loop
        # pathology documented in _init_state).
        rng, k = jax.random.split(state.rng)
        fresh = self._init_state(k, full_forward=False)

        def sel(f, s):
            return jnp.where(done, f, s)

        fd, sd = fresh.data, data
        merged_data = sd.replace(
            qpos=sel(fd.qpos, sd.qpos),
            qvel=sel(fd.qvel, sd.qvel),
            act=sel(fd.act, sd.act),
            ctrl=sel(fd.ctrl, sd.ctrl),
            qacc=sel(fd.qacc, sd.qacc),
            qacc_warmstart=sel(fd.qacc_warmstart, sd.qacc_warmstart),
            qfrc_applied=sel(fd.qfrc_applied, sd.qfrc_applied),
            xfrc_applied=sel(fd.xfrc_applied, sd.xfrc_applied),
            time=sel(fd.time, sd.time),
        )
        return stepped.replace(
            data=merged_data,
            obs=sel(fresh.obs, obs),
            rng=rng,
            step_no=sel(fresh.step_no, stepped.step_no),
            traj_no=sel(fresh.traj_no, stepped.traj_no),
            subtraj_step=sel(fresh.subtraj_step, stepped.subtraj_step),
            goal=sel(fresh.goal, stepped.goal),
            grf_window=sel(fresh.grf_window, stepped.grf_window),
            env_id=sel(fresh.env_id, stepped.env_id),
            dr=jax.tree_util.tree_map(sel, fresh.dr, stepped.dr),
        )

    # convenience: vmapped entry points
    def reset_batch(self, rng, n_envs: int):
        keys = jax.random.split(rng, n_envs)
        return jax.vmap(self.reset)(keys)

    def _sort_key_batch(self, states) -> jax.Array:
        """Per-env scalar whose ascending order clusters envs by physics
        regime. obs[0] is the ROOT HEIGHT for every robot in the suite
        (the observation drops the two horizontal root coordinates;
        the next spec entry is the vertical one — humanoids' pelvis_ty,
        A1's trunk_tz), so sorting ascending groups fallen/falling envs
        together."""
        return states.obs[:, 0]

    def step_batch(self, states, actions, sort_for_locality=False):
        """Batched step. With `sort_for_locality`, envs are permuted by
        root height before the vmapped step and un-permuted after —
        caller-invisible (each env's result is identical up to the f32
        summation-order noise of kernel branch selection). The intent is
        to cluster contact-heavy envs into few (S, 128) kernel blocks so
        the rest take the fast solve branch / closed collision gates.
        Measured on the flagship bench regime (4096 envs, ~10% resets/
        step) it does NOT pay: 26.2 ms sorted vs 23.3 unsorted — the
        near-ground population is too large a fraction for 4 blocks, and
        the full-EnvState permute costs more than the branch savings.
        Kept as an opt-in for workloads with rarer falls (trained
        policies); default off. Under multi-chip dp sharding the argsort
        would gather globally — keep it off there."""
        if not sort_for_locality:
            return jax.vmap(self.step)(states, actions)
        perm = jnp.argsort(self._sort_key_batch(states))
        inv = jnp.argsort(perm)
        sts = jax.tree_util.tree_map(lambda l: l[perm], states)
        out = jax.vmap(self.step)(sts, actions[perm])
        return jax.tree_util.tree_map(lambda l: l[inv], out)

    # ------------------------------------------------------------------
    # dataset / replay API (reference base.py:257-312, 314-476)
    # ------------------------------------------------------------------
    def get_kinematic_obs_mask(self):
        """Indices of the kinematic part of the observation (spec entries
        minus global x/y — base.py:257-263)."""
        return np.arange(self.obs_index.size - 2)

    def get_obs_idx(self, key):
        """Observation indices for a spec key, shifted by the dropped x/y
        (base.py:265-275)."""
        return [i - 2 for i in self.obs_index.obs_idx_map[key]]

    def _dataset_ignore_keys(self):
        return []

    def _dataset_state_callback(self):
        """Optional (callback, params) applied per dataset state so IL
        datasets match the env's observation layout (unitreeA1.py:320-343
        runs its _modify_observation_callback here)."""
        return None, None

    def create_dataset(self, ignore_keys=None):
        """Imitation dataset from the loaded trajectories; every state is
        validated against the fall predicate (base.py:278-312)."""
        if self.traj is None:
            raise ValueError(
                "No trajectory was passed to the environment. "
                "To create a dataset pass a trajectory first."
            )
        if ignore_keys is None:
            ignore_keys = self._dataset_ignore_keys()
        cb, cb_params = self._dataset_state_callback()
        dataset = self.traj.create_dataset(
            ignore_keys=ignore_keys, state_callback=cb,
            state_callback_params=cb_params,
        )
        fallen = np.asarray(
            jax.vmap(self._has_fallen)(jnp.asarray(dataset["states"]))
        )
        if fallen.any():
            raise ValueError(
                "Some of the states in the created dataset are terminal "
                f"states. This should not happen. ({int(fallen.sum())} of "
                f"{len(fallen)} states violate the fall predicate.)"
            )
        return dataset

    # ------------------------------------------------------------------
    # rendering (reference base.py:75-76, 331-337: viewer camera modes +
    # VideoRecorder; here a host-side replay renderer on the oracle twin)
    # ------------------------------------------------------------------
    def _get_renderer(self, **params):
        if getattr(self, "_renderer", None) is None:
            if self._mj_model is None:
                raise RuntimeError(
                    "rendering needs the host MjModel; this env was built "
                    "without one"
                )
            from .rendering import MujocoRenderer

            self._renderer = MujocoRenderer(self._mj_model, **params)
        return self._renderer

    def render_state(self, state_or_qpos, **params):
        """Render one env's state (or raw qpos vector) to an (H, W, 3)
        uint8 frame on the host renderer."""
        qpos = getattr(
            getattr(state_or_qpos, "data", state_or_qpos), "qpos",
            state_or_qpos,
        )
        return self._get_renderer(**params).render(np.asarray(qpos))

    def play_trajectory(self, n_episodes=1, n_steps_per_episode=None,
                       from_velocity=False, callback=None, rng=None,
                       render=False, record=False, recorder_params=None):
        """Kinematic replay (base.py:314-476): inject each trajectory sample
        into the state, run the position stage, and emit the observation
        stream. `from_velocity=True` integrates qpos from the dataset's
        velocities instead of using its positions (base.py:388-476).
        `render`/`record` mirror the reference's flags: frames go through
        the host renderer; `record=True` additionally writes them via
        VideoRecorder (recorder_params: path/fps/tag — base.py:331-337).
        Returns the (n_steps, obs_dim) observation array."""
        assert self.traj is not None
        rng = rng if rng is not None else jax.random.PRNGKey(0)
        steps = n_steps_per_episode or self.traj.traj_len

        recorder = None
        if record:
            from .rendering import VideoRecorder

            recorder = VideoRecorder(**(recorder_params or {}))
            render = True

        @jax.jit
        def build_obs(sample, prev_qpos):
            data = self._fresh_data()
            data = self.obs_index.sample_to_state(self.model, data, sample)
            if from_velocity:
                dt = self.model.opt.timestep * self.n_substeps
                qpos = prev_qpos + dt * data.qvel
                data = data.replace(qpos=qpos)
            data = fwd.fwd_position(self.model, data)
            st = self._blank_state(data)
            return self._build_obs(data, st), data.qpos

        all_obs = []
        for ep in range(n_episodes):
            rng, k = jax.random.split(rng)
            tn = jax.random.randint(k, (), 0, self.traj.n_traj)
            prev_qpos = None
            for t in range(steps):
                sample, _, _ = self.traj.sample_at(tn, jnp.asarray(t % self.traj.traj_len))
                if prev_qpos is None:
                    d0 = self.obs_index.sample_to_state(
                        self.model, self._fresh_data(), sample
                    )
                    prev_qpos = d0.qpos
                obs, prev_qpos = build_obs(sample, prev_qpos)
                all_obs.append(np.asarray(obs))
                if render:
                    frame = self.render_state(prev_qpos)
                    if recorder is not None:
                        recorder(frame)
                if callback is not None:
                    callback(np.asarray(obs))
        if recorder is not None:
            recorder.stop()
        return np.asarray(all_obs)

    def _blank_state(self, data):
        return EnvState(
            data=data,
            obs=jnp.zeros(self.obs_dim, dtype=self.dtype),
            reward=jnp.zeros((), dtype=self.dtype),
            absorbing=jnp.asarray(False),
            done=jnp.asarray(False),
            rng=jax.random.PRNGKey(0),
            step_no=jnp.zeros((), jnp.int32),
            traj_no=jnp.zeros((), jnp.int32),
            subtraj_step=jnp.zeros((), jnp.int32),
            goal=jnp.zeros(2, dtype=self.dtype),
            grf_window=jnp.zeros(
                (self.grf_window, self.grf_size), dtype=self.dtype
            ),
            env_id=jnp.zeros((), jnp.int32),
            dr={},
        )
