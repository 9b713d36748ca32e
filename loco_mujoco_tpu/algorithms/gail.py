"""TPU-native GAIL: a complete, fully-jitted imitation-learning trainer on
the batched envs — the framework's analogue of the reference's
examples/imitation_learning stack (mushroom-rl Core + imitation_lib
GAIL_TRPO, experiment.py:33-60 / utils.py:79-151).

Redesign notes (TPU-first, not a port):
- the reference alternates a CPU env loop with torch updates; here rollout
  collection AND both updates (PPO policy/critic, discriminator) live in one
  jitted `train_iteration` driven by `lax.scan`, so the whole training loop
  is a handful of XLA programs with no host round-trips,
- the expert dataset is a device-resident array (env.create_dataset()),
- the discriminator consumes the kinematic observation subset
  (env.get_kinematic_obs_mask(), reference utils.py:79-81) — both expert
  states and policy observations share that layout by construction,
- PPO replaces TRPO: clipped-ratio updates are minibatch-friendly and map
  onto the MXU as large batched matmuls, where TRPO's Fisher-vector products
  serialize poorly.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
import optax
from flax import linen as nn


class MLP(nn.Module):
    hidden: tuple
    out: int

    @nn.compact
    def __call__(self, x):
        for h in self.hidden:
            x = nn.tanh(nn.Dense(h)(x))
        return nn.Dense(self.out)(x)


class TrainState(NamedTuple):
    pi_params: dict
    vf_params: dict
    disc_params: dict
    log_std: jnp.ndarray
    pi_opt: optax.OptState
    vf_opt: optax.OptState
    disc_opt: optax.OptState


class GAILConfig(NamedTuple):
    n_envs: int = 256
    rollout_len: int = 32
    hidden: tuple = (256, 256)
    lr: float = 3e-4
    disc_lr: float = 3e-4
    gamma: float = 0.99
    lam: float = 0.95
    clip_eps: float = 0.2
    ppo_epochs: int = 4
    minibatches: int = 8
    disc_epochs: int = 1
    disc_batch: int = 2048
    ent_coef: float = 1e-3
    max_grad_norm: float = 0.5


class GAIL:
    """GAIL(PPO) on a batched LocoEnv. `disc_idx` selects the observation
    subset fed to the discriminator (defaults to the kinematic mask)."""

    def __init__(self, env, expert_states, cfg: GAILConfig = GAILConfig(),
                 disc_idx=None):
        self.env = env
        self.cfg = cfg
        obs_dim, act_dim = env.obs_dim, env.action_dim
        if disc_idx is None:
            disc_idx = np.asarray(env.get_kinematic_obs_mask())
        disc_idx = np.asarray(disc_idx)
        assert expert_states.shape[-1] >= disc_idx.max() + 1
        self.disc_idx = jnp.asarray(disc_idx)
        self.expert = jnp.asarray(expert_states[:, disc_idx])

        self.pi = MLP(cfg.hidden, act_dim)
        self.vf = MLP(cfg.hidden, 1)
        self.disc = MLP(cfg.hidden, 1)

        k = jax.random.PRNGKey(0)
        k1, k2, k3 = jax.random.split(k, 3)
        dummy_obs = jnp.zeros((1, obs_dim))
        dummy_disc = jnp.zeros((1, len(disc_idx)))
        self.pi_tx = optax.chain(
            optax.clip_by_global_norm(cfg.max_grad_norm), optax.adam(cfg.lr)
        )
        self.vf_tx = optax.chain(
            optax.clip_by_global_norm(cfg.max_grad_norm), optax.adam(cfg.lr)
        )
        self.disc_tx = optax.adam(cfg.disc_lr)
        pi_p = self.pi.init(k1, dummy_obs)
        vf_p = self.vf.init(k2, dummy_obs)
        disc_p = self.disc.init(k3, dummy_disc)
        log_std = jnp.zeros(act_dim)
        self.state = TrainState(
            pi_p, vf_p, disc_p, log_std,
            self.pi_tx.init((pi_p, log_std)), self.vf_tx.init(vf_p),
            self.disc_tx.init(disc_p),
        )

    # ---- discriminator hooks (overridden by VAIL) -------------------------
    def _disc_logits(self, disc_params, x, key=None):
        """Deterministic logits — used for the GAIL reward signal."""
        return self.disc.apply(disc_params, x)[..., 0]

    def _disc_loss(self, disc_params, pol_b, exp_b, key):
        lp = self._disc_logits(disc_params, pol_b, key)
        le = self._disc_logits(disc_params, exp_b, key)
        # expert -> label 1, policy -> label 0 (BCE with logits)
        return (
            jnp.mean(jax.nn.softplus(lp)) + jnp.mean(jax.nn.softplus(-le))
        )

    def _disc_post_epoch(self, disc_params, aux):
        """Hook after each discriminator epoch (VAIL: dual ascent on beta)."""
        return disc_params

    # ---- policy ----------------------------------------------------------
    def _logp(self, pi_params, log_std, obs, act):
        mean = self.pi.apply(pi_params, obs)
        std = jnp.exp(log_std)
        return -0.5 * jnp.sum(
            ((act - mean) / std) ** 2 + 2 * log_std + jnp.log(2 * jnp.pi),
            axis=-1,
        )

    # ---- one training iteration (fully jitted) ---------------------------
    @functools.partial(jax.jit, static_argnums=0)
    def train_iteration(self, ts: TrainState, env_states, rng):
        cfg = self.cfg
        step = jax.vmap(self.env.step)

        def rollout_body(carry, _):
            states, key = carry
            key, k = jax.random.split(key)
            mean = self.pi.apply(ts.pi_params, states.obs)
            act = mean + jnp.exp(ts.log_std) * jax.random.normal(
                k, mean.shape
            )
            act = jnp.clip(act, -1.0, 1.0)
            logp = self._logp(ts.pi_params, ts.log_std, states.obs, act)
            nxt = step(states, act)
            out = (states.obs, act, logp, nxt.done, nxt.absorbing)
            return (nxt, key), out

        rng, k_roll = jax.random.split(rng)
        (env_states, _), (obs, act, logp, done, absorbing) = jax.lax.scan(
            rollout_body, (env_states, k_roll), None, length=cfg.rollout_len
        )
        # (T, B, ...) -> flatten later; GAIL reward from the discriminator:
        # r = softplus(D) = -log(1 - sigmoid(D))  (non-saturating)
        d_obs = obs[..., self.disc_idx]
        logits = self._disc_logits(ts.disc_params, d_obs)
        rew = jax.nn.softplus(logits)

        # GAE over the scanned axis
        val = self.vf.apply(ts.vf_params, obs)[..., 0]
        last_val = self.vf.apply(ts.vf_params, env_states.obs)[..., 0]
        not_done = 1.0 - done.astype(jnp.float32)

        def gae_body(carry, inp):
            adv_next, v_next = carry
            r_t, v_t, nd_t = inp
            delta = r_t + cfg.gamma * v_next * nd_t - v_t
            adv = delta + cfg.gamma * cfg.lam * nd_t * adv_next
            return (adv, v_t), adv

        (_, _), adv = jax.lax.scan(
            gae_body, (jnp.zeros_like(last_val), last_val),
            (rew, val, not_done), reverse=True,
        )
        ret = adv + val

        # flatten (T, B) -> (N,)
        N = cfg.rollout_len * cfg.n_envs
        fobs = obs.reshape(N, -1)
        fact = act.reshape(N, -1)
        flogp = logp.reshape(N)
        fadv = adv.reshape(N)
        fret = ret.reshape(N)
        fadv = (fadv - fadv.mean()) / (fadv.std() + 1e-8)

        # ---- PPO updates -------------------------------------------------
        def ppo_loss(params, mb):
            pi_params, log_std = params
            o, a, lp_old, ad, rt = mb
            lp = self._logp(pi_params, log_std, o, a)
            ratio = jnp.exp(lp - lp_old)
            clipped = jnp.clip(ratio, 1 - cfg.clip_eps, 1 + cfg.clip_eps)
            pg = -jnp.minimum(ratio * ad, clipped * ad).mean()
            ent = jnp.sum(log_std + 0.5 * jnp.log(2 * jnp.pi * jnp.e))
            return pg - cfg.ent_coef * ent

        def vf_loss(params, mb):
            o, _, _, _, rt = mb
            v = self.vf.apply(params, o)[..., 0]
            return jnp.mean((v - rt) ** 2)

        mb_size = N // cfg.minibatches

        def ppo_epoch(carry, k_ep):
            pi_params, log_std, pi_opt, vf_params, vf_opt = carry
            perm = jax.random.permutation(k_ep, N)

            def mb_body(carry, idx):
                pi_params, log_std, pi_opt, vf_params, vf_opt = carry
                sel = jax.lax.dynamic_slice_in_dim(perm, idx * mb_size,
                                                   mb_size)
                mb = (fobs[sel], fact[sel], flogp[sel], fadv[sel], fret[sel])
                g = jax.grad(ppo_loss)((pi_params, log_std), mb)
                upd, pi_opt = self.pi_tx.update(g, pi_opt,
                                                (pi_params, log_std))
                pi_params, log_std = optax.apply_updates(
                    (pi_params, log_std), upd
                )
                gv = jax.grad(vf_loss)(vf_params, mb)
                updv, vf_opt = self.vf_tx.update(gv, vf_opt, vf_params)
                vf_params = optax.apply_updates(vf_params, updv)
                return (pi_params, log_std, pi_opt, vf_params, vf_opt), None

            carry, _ = jax.lax.scan(
                mb_body, carry, jnp.arange(cfg.minibatches)
            )
            return carry, None

        rng, k_pe = jax.random.split(rng)
        (pi_params, log_std, pi_opt, vf_params, vf_opt), _ = jax.lax.scan(
            ppo_epoch,
            (ts.pi_params, ts.log_std, ts.pi_opt, ts.vf_params, ts.vf_opt),
            jax.random.split(k_pe, cfg.ppo_epochs),
        )

        # ---- discriminator update ---------------------------------------
        fd_obs = d_obs.reshape(N, -1)

        def disc_epoch(carry, k_ep):
            disc_params, disc_opt = carry
            kp, ke, kz = jax.random.split(k_ep, 3)
            pol_b = fd_obs[
                jax.random.randint(kp, (cfg.disc_batch,), 0, N)
            ]
            exp_b = self.expert[
                jax.random.randint(ke, (cfg.disc_batch,), 0,
                                   len(self.expert))
            ]
            loss, g = jax.value_and_grad(self._disc_loss)(
                disc_params, pol_b, exp_b, kz
            )
            upd, disc_opt = self.disc_tx.update(g, disc_opt, disc_params)
            disc_params = optax.apply_updates(disc_params, upd)
            disc_params = self._disc_post_epoch(
                disc_params, (pol_b, exp_b, kz)
            )
            return (disc_params, disc_opt), loss

        rng, k_de = jax.random.split(rng)
        (disc_params, disc_opt), dloss = jax.lax.scan(
            disc_epoch, (ts.disc_params, ts.disc_opt),
            jax.random.split(k_de, cfg.disc_epochs),
        )

        new_ts = TrainState(pi_params, vf_params, disc_params, log_std,
                            pi_opt, vf_opt, disc_opt)
        metrics = dict(
            gail_reward=rew.mean(),
            disc_loss=dloss.mean(),
            value_loss=jnp.mean((val - ret) ** 2),
            done_frac=done.mean(),
            ep_logp=flogp.mean(),
        )
        return new_ts, env_states, rng, metrics

    # ---- outer loop ------------------------------------------------------
    def train(self, n_iterations, seed=0, log_every=10, callback=None,
              start_iteration=0):
        rng = jax.random.fold_in(jax.random.PRNGKey(seed), start_iteration)
        rng, k0 = jax.random.split(rng)
        env_states = self.env.reset_batch(k0, self.cfg.n_envs)
        history = []
        for it in range(start_iteration, n_iterations):
            self.state, env_states, rng, m = self.train_iteration(
                self.state, env_states, rng
            )
            if it % log_every == 0 or it == n_iterations - 1:
                m = {k: float(v) for k, v in m.items()}
                history.append(dict(iteration=it, **m))
                if callback:
                    callback(it, m)
        return history

    def act(self, obs):
        """Deterministic (mean) action for evaluation."""
        return self.pi.apply(self.state.pi_params, obs)

    # ---- deterministic evaluation (reference experiment.py:50-57) ---------
    @functools.partial(jax.jit, static_argnums=(0, 2, 3))
    def _eval_rollout(self, ts: TrainState, n_envs: int, n_steps: int, rng):
        """Jitted eval: mean-action rollout accumulating per-episode
        R (undiscounted return), J (discounted, mdp gamma) and L (length)
        over every episode that COMPLETES within n_steps — the analogue of
        mushroom-rl's compute_J/compute_episodes_length over
        core.evaluate(n_episodes) dataset."""
        gamma = jnp.asarray(self.env.gamma, jnp.float32)
        step = jax.vmap(self.env.step)
        states = self.env.reset_batch(rng, n_envs)
        z = jnp.zeros(n_envs, jnp.float32)
        acc0 = (jnp.zeros(()), jnp.zeros(()), jnp.zeros(()), jnp.zeros(()))

        def body(carry, _):
            states, ep_r, ep_j, ep_l, acc = carry
            act = jnp.clip(self.pi.apply(ts.pi_params, states.obs), -1, 1)
            nxt = step(states, act)
            r = nxt.reward.astype(jnp.float32)
            ep_r = ep_r + r
            ep_j = ep_j + jnp.power(gamma, ep_l) * r
            ep_l = ep_l + 1.0
            d = nxt.done
            df = d.astype(jnp.float32)
            acc_r, acc_j, acc_l, n = acc
            acc = (
                acc_r + jnp.sum(df * ep_r),
                acc_j + jnp.sum(df * ep_j),
                acc_l + jnp.sum(df * ep_l),
                n + jnp.sum(df),
            )
            keep = 1.0 - df
            return (nxt, ep_r * keep, ep_j * keep, ep_l * keep, acc), None

        (_, _, _, _, acc), _ = jax.lax.scan(
            body, (states, z, z, z, acc0), None, length=n_steps
        )
        acc_r, acc_j, acc_l, n = acc
        n = jnp.maximum(n, 1.0)
        return acc_r / n, acc_j / n, acc_l / n, acc[3]

    def evaluate(self, n_envs: int = 32, n_steps: int | None = None,
                 seed: int = 424):
        """Deterministic-policy metrics: dict(R, J, L, n_episodes)."""
        if n_steps is None:
            n_steps = int(self.env.horizon)
        R, J, L, n = self._eval_rollout(
            self.state, n_envs, n_steps, jax.random.PRNGKey(seed)
        )
        return dict(R=float(R), J=float(J), L=float(L),
                    n_episodes=int(n))
