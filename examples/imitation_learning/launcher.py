"""Multi-seed experiment launcher — analogue of the reference
examples/imitation_learning/launcher.py (experiment_launcher local/Slurm
fan-out, launcher.py:12-42). TPU-native twist: seeds run sequentially in ONE
process so the jitted training step compiles once and is reused across
seeds (recompilation per process would dominate short runs); fan out over
hosts/chips instead with jax.distributed when available.
"""

from __future__ import annotations

import argparse

from experiment import experiment

ENVS = [
    "UnitreeA1.simple.real",
    "HumanoidTorque.walk.real",
    "UnitreeH1.walk.real",
]

if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--envs", nargs="*", default=ENVS)
    ap.add_argument("--n_seeds", type=int, default=3)
    ap.add_argument("--n_iterations", type=int, default=200)
    ap.add_argument("--debug", action="store_true")
    a = ap.parse_args()
    for env_name in a.envs:
        for seed in range(a.n_seeds):
            print(f"=== {env_name} seed {seed} ===")
            experiment(env_name, a.n_iterations, seed, a.debug)
