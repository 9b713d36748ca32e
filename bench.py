"""Headline benchmark: batched env throughput on the available accelerator.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
Baseline target (BASELINE.md): >= 1M env-steps/s aggregate at 4096 envs/host.
Current flagship: UnitreeA1.simple.real (torque mode, elliptic contacts,
full Newton solver) — switches to HumanoidTorque.run once that env lands.
"""

import json
import time

import jax
import jax.numpy as jnp




def main():
    import loco_mujoco_tpu as lmt

    n_envs = 4096
    n_steps = 200

    env = lmt.make("HumanoidTorque.run.real", debug=True)
    reset_fn = jax.jit(jax.vmap(env.reset))
    step_fn = jax.jit(jax.vmap(env.step))

    key = jax.random.PRNGKey(0)
    states = reset_fn(jax.random.split(key, n_envs))
    actions = jnp.zeros((n_envs, env.action_dim))

    # warmup / compile
    states = step_fn(states, actions)
    states.obs.block_until_ready()

    t0 = time.time()
    for _ in range(n_steps):
        states = step_fn(states, actions)
    states.obs.block_until_ready()
    dt = time.time() - t0

    steps_per_s = n_steps * n_envs / dt
    print(
        json.dumps(
            {
                "metric": "env_steps_per_s",
                "value": round(steps_per_s),
                "unit": "steps/s",
                "vs_baseline": round(steps_per_s / 1_000_000, 4),
            }
        )
    )


if __name__ == "__main__":
    main()
