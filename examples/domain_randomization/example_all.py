"""Domain randomization across the env families (mirrors reference
examples/domain_randomization/example_{atlas,talos,humanoid_torque,
humanoid_muscle,humanoid_torque_4_ages,unitree_a1}.py).

TPU-native: the YAML's randomized physics parameters become fresh draws
inside every env's jitted reset — here a batch of 512 envs per task, each
with its own independently perturbed model, stepped in lockstep.
"""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[2]))

import jax
import jax.numpy as jnp

import loco_mujoco_tpu as lmt
from loco_mujoco_tpu.utils.assets import data_root as _dr
DATA_ROOT = _dr()

DATA = str(DATA_ROOT) + "/environments/data"
TASKS = {
    "UnitreeA1.simple.real":
        f"{DATA}/quadrupeds/domain_randomization_unitree_a1.yaml",
    "HumanoidTorque.walk.real":
        f"{DATA}/humanoid/domain_randomization_humanoid.yaml",
    "HumanoidMuscle.walk.real":
        f"{DATA}/humanoid/domain_randomization_humanoid.yaml",
    "HumanoidTorque4Ages.walk.all.real":
        f"{DATA}/humanoid/domain_randomization_humanoid.yaml",
    "Atlas.walk.real": f"{DATA}/atlas/domain_randomization_atlas.yaml",
    "Talos.walk.real": f"{DATA}/talos/domain_randomization_talos.yaml",
}

N = 128


def main():
    for task, conf in TASKS.items():
        env = lmt.make(task, debug=True, domain_randomization_config=conf)
        keys = jax.random.split(jax.random.PRNGKey(0), N)
        states = jax.jit(jax.vmap(env.reset))(keys)
        n_draws = sum(
            v.shape[-1] if v.ndim > 1 else 1 for v in states.dr.values()
        ) if states.dr else 0
        step = jax.jit(jax.vmap(env.step))
        for _ in range(3):
            states = step(states, jnp.zeros((N, env.action_dim)))
        print(
            f"{task}: {N} envs x {n_draws} randomized params, "
            f"3 steps ok, obs finite={bool(jnp.all(jnp.isfinite(states.obs)))}"
        )


if __name__ == "__main__":
    main()
