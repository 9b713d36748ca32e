"""TPU-native VAIL: GAIL with a Variational Discriminator Bottleneck.

Analogue of the reference's VAIL_TRPO agent builder
(`examples/imitation_learning/utils.py:117-196`): the discriminator is an
encoder q(z|x) -> N(mu, sigma) feeding a linear decoder, trained under an
information constraint I(x; z) <= Ic enforced by dual ascent on beta
(Peng et al. 2019, VDB). Hyperparameters mirror the reference confs.yaml
surface: `info_constraint` (Ic), `lr_beta`, `z_dim`.

Same PPO policy/critic stack as GAIL (see gail.py for the TRPO->PPO
redesign rationale); only the discriminator differs:

  loss = BCE(decoder(z_sampled)) + beta * mean(KL(q(z|x) || N(0, I)))
  beta <- max(0, beta + lr_beta * (mean KL - Ic))    (after each epoch)

The GAIL reward uses the deterministic mean encoding (no sampling noise in
the reward signal), matching imitation_lib's VDB `discrim_forward` in eval
mode.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import optax
from flax import linen as nn

from .gail import GAIL, GAILConfig, MLP


class VAILConfig(NamedTuple):
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
    # VDB (reference confs.yaml keys)
    info_constraint: float = 0.1
    lr_beta: float = 1e-5
    z_dim: int = 128


class VDBEncoder(nn.Module):
    hidden: tuple
    z_dim: int

    @nn.compact
    def __call__(self, x):
        for h in self.hidden:
            x = nn.relu(nn.Dense(h)(x))
        mu = nn.Dense(self.z_dim)(x)
        logvar = nn.Dense(self.z_dim)(x)
        return mu, logvar


class VDBDisc(nn.Module):
    """Encoder + linear decoder. deterministic=True uses z = mu."""

    hidden: tuple
    z_dim: int

    @nn.compact
    def __call__(self, x, key=None):
        mu, logvar = VDBEncoder(self.hidden, self.z_dim)(x)
        if key is None:
            z = mu
        else:
            z = mu + jnp.exp(0.5 * logvar) * jax.random.normal(
                key, mu.shape
            )
        logit = nn.Dense(1)(z)
        return logit, mu, logvar


def _kl_std_normal(mu, logvar):
    """KL(N(mu, diag(exp(logvar))) || N(0, I)) per sample."""
    return 0.5 * jnp.sum(
        mu * mu + jnp.exp(logvar) - logvar - 1.0, axis=-1
    )


class VAIL(GAIL):
    def __init__(self, env, expert_states, cfg: VAILConfig = VAILConfig(),
                 disc_idx=None):
        gail_cfg = GAILConfig(
            **{k: getattr(cfg, k) for k in GAILConfig._fields}
        )
        super().__init__(env, expert_states, gail_cfg, disc_idx=disc_idx)
        self.vdb_cfg = cfg

        # replace the plain-MLP discriminator with the VDB
        self.disc = VDBDisc(cfg.hidden, cfg.z_dim)
        k = jax.random.PRNGKey(1)
        dummy = jnp.zeros((1, len(self.disc_idx)))
        net_p = self.disc.init(k, dummy)
        disc_p = {"net": net_p, "beta": jnp.zeros(())}
        # optimizer only touches the network; beta moves by dual ascent
        self.disc_tx = optax.multi_transform(
            {"net": optax.adam(cfg.disc_lr), "beta": optax.set_to_zero()},
            {"net": "net", "beta": "beta"},
        )
        self.state = self.state._replace(
            disc_params=disc_p, disc_opt=self.disc_tx.init(disc_p)
        )

    # ---- discriminator hooks ---------------------------------------------
    def _disc_logits(self, disc_params, x, key=None):
        # reward path: deterministic mean encoding (key=None)
        logit, _, _ = self.disc.apply(disc_params["net"], x, key)
        return logit[..., 0]

    def _disc_loss(self, disc_params, pol_b, exp_b, key):
        kp, ke = jax.random.split(key)
        lp, mu_p, lv_p = self.disc.apply(disc_params["net"], pol_b, kp)
        le, mu_e, lv_e = self.disc.apply(disc_params["net"], exp_b, ke)
        bce = (
            jnp.mean(jax.nn.softplus(lp[..., 0]))
            + jnp.mean(jax.nn.softplus(-le[..., 0]))
        )
        kl = 0.5 * (
            jnp.mean(_kl_std_normal(mu_p, lv_p))
            + jnp.mean(_kl_std_normal(mu_e, lv_e))
        )
        beta = jax.lax.stop_gradient(disc_params["beta"])
        return bce + beta * kl

    def _disc_post_epoch(self, disc_params, aux):
        pol_b, exp_b, key = aux
        _, mu_p, lv_p = self.disc.apply(disc_params["net"], pol_b)
        _, mu_e, lv_e = self.disc.apply(disc_params["net"], exp_b)
        kl = 0.5 * (
            jnp.mean(_kl_std_normal(mu_p, lv_p))
            + jnp.mean(_kl_std_normal(mu_e, lv_e))
        )
        cfg = self.vdb_cfg
        beta = jnp.maximum(
            0.0, disc_params["beta"] + cfg.lr_beta * (kl - cfg.info_constraint)
        )
        return {"net": disc_params["net"], "beta": beta}
