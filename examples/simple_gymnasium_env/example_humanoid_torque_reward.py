"""Custom-reward example (mirrors reference
examples/simple_gymnasium_env/example_humanoid_torque_reward.py): the
reward callback must be JAX-traceable (it runs inside the jitted step)."""

import gymnasium
import jax.numpy as jnp

import loco_mujoco_tpu  # noqa: F401


def my_reward(state, action, next_state):
    # forward velocity minus an action penalty
    return next_state[17] - 0.01 * jnp.sum(jnp.square(action))


def main():
    env = gymnasium.make(
        "LocoMujoco", env_name="HumanoidTorque.walk.real", debug=True,
        reward_type="custom", reward_params=dict(reward_callback=my_reward),
    )
    obs, _ = env.reset(seed=0)
    for _ in range(10):
        obs, reward, *_ = env.step(env.action_space.sample())
    print("custom reward example ok, last reward:", reward)


if __name__ == "__main__":
    main()
