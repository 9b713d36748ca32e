"""The GAIL imitation stack (examples/imitation_learning) trains end-to-end
on the batched A1 env: jitted rollout+PPO+discriminator iteration produces
finite metrics and updates parameters. Mirrors the role of the reference's
examples-based smoke coverage."""

import sys
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np


import loco_mujoco_tpu as lmt


def test_gail_trains_on_a1():
    from loco_mujoco_tpu.algorithms import GAIL, GAILConfig

    # tests enable x64, so keep the env in f64 to match the f64 networks
    env = lmt.make("UnitreeA1.simple.real", debug=True, dtype=jnp.float64)
    expert = env.create_dataset()["states"]
    cfg = GAILConfig(n_envs=8, rollout_len=4, hidden=(32, 32),
                     minibatches=2, disc_batch=64)
    agent = GAIL(env, expert, cfg)

    p0 = jax.tree_util.tree_leaves(agent.state.pi_params)[0].copy()
    history = agent.train(2, seed=0, log_every=1)
    assert len(history) == 2
    for rec in history:
        for k, v in rec.items():
            assert np.isfinite(v), (k, v)
    p1 = jax.tree_util.tree_leaves(agent.state.pi_params)[0]
    assert not np.allclose(p0, p1), "policy parameters did not update"

    # deterministic eval action has the right shape and is finite
    state = env.reset_batch(jax.random.PRNGKey(0), 4)
    act = agent.act(state.obs)
    assert act.shape == (4, env.action_dim)
    assert bool(jnp.all(jnp.isfinite(act)))

    # deterministic evaluation metrics R / J / L (reference
    # experiment.py:50-57): episodes complete within the window (fall or
    # horizon) and J is the gamma-discounted counterpart of R
    ev = agent.evaluate(n_envs=4, n_steps=60, seed=3)
    assert ev["n_episodes"] >= 1
    for k in ("R", "J", "L"):
        assert np.isfinite(ev[k]), (k, ev)
    assert 1.0 <= ev["L"] <= 60.0
    assert abs(ev["J"]) <= abs(ev["R"]) + 1e-6 or ev["R"] == 0.0
