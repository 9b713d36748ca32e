"""GAIL imitation-learning experiment — analogue of the reference
examples/imitation_learning/experiment.py (train/eval loop with logging and
best-agent checkpoints), redesigned for the batched TPU envs: one process
drives thousands of envs, metrics stream from jitted iterations, and
checkpoints are pickled pytrees.

Usage:
    python experiment.py --env UnitreeA1.simple.real --n_iterations 200
"""

from __future__ import annotations

import argparse
import json
import pickle
from pathlib import Path

import yaml

import loco_mujoco_tpu as lmt
from loco_mujoco_tpu.algorithms import GAIL, GAILConfig
from loco_mujoco_tpu.algorithms import VAIL, VAILConfig


def load_conf(env_name):
    """Resolve per-env hyperparameters; `algorithm: VAIL` in a conf block
    selects the VDB discriminator (reference confs.yaml schema)."""
    confs = yaml.safe_load(
        (Path(__file__).parent / "confs.yaml").read_text()
    )
    conf = dict(confs["default"])
    conf.update(confs.get(env_name) or {})
    conf["hidden"] = tuple(conf["hidden"])
    algo = conf.pop("algorithm", "GAIL").upper()
    if algo == "VAIL":
        return VAILConfig(**conf), VAIL
    return GAILConfig(**conf), GAIL


def experiment(env_name="UnitreeA1.simple.real", n_iterations=200, seed=0,
               debug=False, results_dir="./logs", **cfg_overrides):
    env = lmt.make(env_name, debug=debug)
    expert = env.create_dataset()["states"]
    cfg, agent_cls = load_conf(env_name)
    if cfg_overrides:
        cfg = cfg._replace(**cfg_overrides)
    agent = agent_cls(env, expert, cfg)

    out = Path(results_dir) / env_name / f"seed_{seed}"
    out.mkdir(parents=True, exist_ok=True)
    best = {"reward": float("-inf")}

    def log_cb(it, m):
        print(json.dumps(dict(iteration=it, **m)))
        if m["gail_reward"] > best["reward"]:
            best["reward"] = m["gail_reward"]
            with open(out / "best_agent.pkl", "wb") as f:
                pickle.dump(agent.state, f)

    history = agent.train(n_iterations, seed=seed, callback=log_cb)
    with open(out / "history.json", "w") as f:
        json.dump(history, f, indent=1)
    return history


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--env", default="UnitreeA1.simple.real")
    ap.add_argument("--n_iterations", type=int, default=200)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--debug", action="store_true",
                    help="use the bundled mini datasets")
    ap.add_argument("--results_dir", default="./logs")
    ap.add_argument("--quick", action="store_true",
                    help="tiny sizes for a smoke run")
    a = ap.parse_args()
    overrides = (
        dict(n_envs=16, rollout_len=8, minibatches=2, disc_batch=256,
             hidden=(64, 64))
        if a.quick
        else {}
    )
    experiment(a.env, a.n_iterations, a.seed, a.debug, a.results_dir,
               **overrides)
