"""Distributed training over a virtual 8-device mesh: the full GAIL
iteration (rollout + PPO + discriminator) compiles and executes with env
data parallelism and Megatron-style tensor parallelism of the learner.
Replaces nothing in the reference (it has no distributed runtime,
SURVEY.md §2 parallelism inventory); this is the TPU-native scaling path.
"""

import jax
import jax.numpy as jnp
import numpy as np

import loco_mujoco_tpu as lmt
from loco_mujoco_tpu.algorithms import GAIL, GAILConfig
from loco_mujoco_tpu.parallel import (
    DistributedTrainer,
    make_mesh,
    param_tp_sharding,
)


def _tiny_agent(n_envs):
    env = lmt.make("UnitreeA1.simple.real", debug=True, dtype=jnp.float64)
    expert = env.create_dataset()["states"]
    cfg = GAILConfig(n_envs=n_envs, rollout_len=2, hidden=(16, 16),
                     minibatches=1, ppo_epochs=1, disc_epochs=1,
                     disc_batch=16)
    return GAIL(env, expert, cfg)


def test_dp_tp_train_step():
    # conftest pins the default device to CPU with 8 virtual devices;
    # make_mesh follows that pin even when a TPU plugin is present.
    mesh = make_mesh(n_env_shards=4, n_model_shards=2)
    assert mesh.size == 8
    agent = _tiny_agent(n_envs=8)
    trainer = DistributedTrainer(agent, mesh, tensor_parallel=True)

    p0 = jax.tree_util.tree_leaves(agent.state.pi_params)[0].copy()
    history = trainer.train(2, seed=0, log_every=1)
    assert len(history) == 2
    for rec in history:
        for k, v in rec.items():
            assert np.isfinite(v), (k, v)
    p1 = jax.tree_util.tree_leaves(agent.state.pi_params)[0]
    assert not np.allclose(np.asarray(p0), np.asarray(p1))

    # the hidden kernels are genuinely partitioned over "mp"
    specs = jax.tree_util.tree_leaves_with_path(
        param_tp_sharding(agent.state.pi_params, mesh)
    )
    sharded = [s for _, s in specs if s.spec != jax.sharding.PartitionSpec()]
    assert sharded, "tensor-parallel sharding degenerated to replication"

    # env states kept their dp sharding across iterations
    st = trainer.init_env_states(seed=1)
    assert "env" in str(st.obs.sharding.spec)


def test_dp_matches_single_device():
    """Pure-dp distributed training is numerically identical to the
    unsharded jit of the same agent (GSPMD partitioning must not change
    the math: same seeds, same updates)."""
    mesh = make_mesh(n_env_shards=8, n_model_shards=1)
    agent_a = _tiny_agent(n_envs=8)
    agent_b = _tiny_agent(n_envs=8)

    trainer = DistributedTrainer(agent_a, mesh)
    hist_a = trainer.train(1, seed=0, log_every=1)

    env_states = agent_b.env.reset_batch(
        jax.random.PRNGKey(0), agent_b.cfg.n_envs
    )
    # mirror DistributedTrainer.train's rng derivation
    ts, _, _, m = agent_b.train_iteration(
        agent_b.state, env_states, jax.random.PRNGKey(1)
    )
    for k, v in m.items():
        np.testing.assert_allclose(
            hist_a[0][k], float(v), rtol=1e-6, err_msg=k
        )
    la = jax.tree_util.tree_leaves(agent_a.state.pi_params)[0]
    lb = jax.tree_util.tree_leaves(ts.pi_params)[0]
    np.testing.assert_allclose(np.asarray(la), np.asarray(lb), atol=1e-9)
