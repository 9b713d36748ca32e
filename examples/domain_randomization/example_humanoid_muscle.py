"""Domain randomization example for HumanoidMuscle.walk.real (mirrors reference
examples/domain_randomization/example_humanoid_muscle.py): per-episode physics
perturbations are sampled as batched model leaves inside the jitted reset —
no XML recompilation or worker pool."""

import jax

import loco_mujoco_tpu as lmt
from loco_mujoco_tpu.utils.assets import data_root as _dr
DATA_ROOT = _dr()

CONF = (str(DATA_ROOT) + "/environments/data/humanoid/"
        "domain_randomization_humanoid.yaml")


def main():
    env = lmt.make("HumanoidMuscle.walk.real", debug=True,
                   domain_randomization_config=CONF)
    s0 = jax.jit(env.reset)(jax.random.PRNGKey(0))
    s1 = jax.jit(env.reset)(jax.random.PRNGKey(1))
    for k in s0.dr:
        print(k, "episode0 vs episode1 differ:",
              bool((s0.dr[k] != s1.dr[k]).any()))


if __name__ == "__main__":
    main()
