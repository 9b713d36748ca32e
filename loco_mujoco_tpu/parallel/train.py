"""Distributed training: the full GAIL/VAIL iteration jitted over a mesh.

The reference trains one CPU env serially (SURVEY.md §3.4); its only
"scale-out" is multi-seed Slurm fan-out. Here the ENTIRE training step —
physics rollout (lax.scan over batched env.step), GAE, PPO policy/critic
updates, discriminator update — is one XLA program partitioned by GSPMD:

* env-state pytrees and rollout tensors are sharded over the mesh "env"
  axis (dp): physics runs collective-free;
* learner parameters are either replicated (pure dp — the per-minibatch
  gradients meet sharded data and GSPMD inserts the all-reduce) or
  tensor-parallel over an optional "mp" axis (Megatron column/row layout,
  see parallel.mesh.param_tp_sharding);
* the cross-device traffic is exactly: gradient all-reduce (dp) +
  activation reduce per Dense pair (tp), riding ICI.

Use: trainer = DistributedTrainer(GAIL(env, expert, cfg), mesh);
     trainer.train(n_iterations).
"""

from __future__ import annotations

import jax

from .mesh import env_sharding, make_mesh, param_tp_sharding, replicated


class DistributedTrainer:
    """Wraps a GAIL/VAIL agent; runs its `train_iteration` sharded.

    `agent.cfg.n_envs` must divide by the mesh "env" extent. With
    `tensor_parallel=True` the mesh must carry an "mp" axis and the MLP
    hidden sizes must divide by its extent.
    """

    def __init__(self, agent, mesh=None, tensor_parallel=False):
        self.agent = agent
        self.mesh = mesh if mesh is not None else make_mesh()
        n_env_shards = self.mesh.shape["env"]
        if agent.cfg.n_envs % n_env_shards:
            raise ValueError(
                f"n_envs={agent.cfg.n_envs} not divisible by the mesh "
                f"env extent {n_env_shards}"
            )
        if tensor_parallel and "mp" not in self.mesh.axis_names:
            raise ValueError('tensor_parallel=True needs an "mp" mesh axis')

        self._env_shard = env_sharding(self.mesh)
        if tensor_parallel:
            self._ts_shard = param_tp_sharding(agent.state, self.mesh)
        else:
            self._ts_shard = jax.tree.map(
                lambda _: replicated(self.mesh), agent.state
            )
        rng_shard = replicated(self.mesh)

        # jit-of-jit: agent.train_iteration is itself jitted; the outer jit
        # inlines it and pins the shardings, making this one partitioned
        # XLA program per iteration.
        self._step = jax.jit(
            lambda ts, st, rng: agent.train_iteration(ts, st, rng),
            in_shardings=(self._ts_shard, self._env_shard, rng_shard),
            out_shardings=(
                self._ts_shard, self._env_shard, rng_shard, None
            ),
        )

    def _put(self, value, sharding):
        # multi-host safe: each process materializes only its addressable
        # shards from the host-replicated value (every process computes
        # the same deterministic value); plain device_put single-process
        if jax.process_count() > 1:
            from .distributed import host_to_global

            return host_to_global(value, sharding)
        return jax.device_put(value, sharding)

    def init_env_states(self, seed=0):
        key = jax.random.PRNGKey(seed)
        keys = jax.random.split(key, self.agent.cfg.n_envs)
        reset_fn = jax.jit(
            jax.vmap(self.agent.env.reset), out_shardings=self._env_shard
        )
        return reset_fn(self._put(keys, self._env_shard))

    def train(self, n_iterations, seed=0, log_every=10, callback=None):
        agent = self.agent
        agent.state = jax.tree.map(
            lambda v, s: self._put(v, s), agent.state, self._ts_shard
        )
        env_states = self.init_env_states(seed)
        rng = self._put(
            jax.random.PRNGKey(seed + 1), replicated(self.mesh)
        )
        history = []
        for it in range(n_iterations):
            agent.state, env_states, rng, m = self._step(
                agent.state, env_states, rng
            )
            if it % log_every == 0 or it == n_iterations - 1:
                m = {k: float(v) for k, v in m.items()}
                history.append(dict(iteration=it, **m))
                if callback:
                    callback(it, m)
        return history
