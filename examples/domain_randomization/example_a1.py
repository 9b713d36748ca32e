"""Domain randomization example (mirrors reference
examples/domain_randomization): per-episode physics perturbations sampled
inside the jitted reset."""

import jax

import loco_mujoco_tpu as lmt
from loco_mujoco_tpu.utils.assets import data_root as _dr
DATA_ROOT = _dr()

CONF = (str(DATA_ROOT) + "/environments/data/quadrupeds/"
        "domain_randomization_unitree_a1.yaml")


def main():
    env = lmt.make("UnitreeA1.simple.real", debug=True,
                   domain_randomization_config=CONF)
    s0 = jax.jit(env.reset)(jax.random.PRNGKey(0))
    s1 = jax.jit(env.reset)(jax.random.PRNGKey(1))
    print("randomized params:", {k: (v0, v1) for (k, v0), (_, v1)
          in zip(s0.dr.items(), s1.dr.items())})


if __name__ == "__main__":
    main()
