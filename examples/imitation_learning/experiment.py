"""GAIL imitation-learning experiment — analogue of the reference
examples/imitation_learning/experiment.py (train/eval loop with logging and
best-agent checkpoints), redesigned for the batched TPU envs: one process
drives thousands of envs, metrics stream from jitted iterations, and
checkpoints are pickled pytrees.

Deterministic evaluation (reference experiment.py:50-57): every
`eval_every` iterations a jitted mean-action rollout computes R
(undiscounted return), J (discounted) and L (episode length); the best
agent is selected on eval R — NOT on the discriminator reward, which is
adversarial and non-stationary. `--resume` continues from the last
checkpoint (policy/critic/discriminator params AND optimizer states).

Usage:
    python experiment.py --env UnitreeA1.simple.real --n_iterations 200
    python experiment.py --env ... --resume   # continue from last.pkl
"""

from __future__ import annotations

import argparse
import json
import pickle
import sys
from pathlib import Path

import yaml

sys.path.insert(0, str(Path(__file__).resolve().parents[2]))

import loco_mujoco_tpu as lmt  # noqa: E402
from loco_mujoco_tpu.algorithms import GAIL, GAILConfig  # noqa: E402
from loco_mujoco_tpu.algorithms import VAIL, VAILConfig  # noqa: E402


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
               debug=False, results_dir="./logs", resume=False,
               eval_every=50, eval_envs=32, **cfg_overrides):
    env = lmt.make(env_name, debug=debug)
    expert = env.create_dataset()["states"]
    cfg, agent_cls = load_conf(env_name)
    if cfg_overrides:
        cfg = cfg._replace(**cfg_overrides)
    agent = agent_cls(env, expert, cfg)

    out = Path(results_dir) / env_name / f"seed_{seed}"
    out.mkdir(parents=True, exist_ok=True)

    start_it = 0
    best_R = float("-inf")
    if resume and (out / "last.pkl").exists():
        with open(out / "last.pkl", "rb") as f:
            ckpt = pickle.load(f)
        agent.state = ckpt["state"]
        start_it = ckpt["iteration"] + 1
        best_R = ckpt.get("best_R", best_R)
        print(f"resumed from iteration {ckpt['iteration']}")

    history = []

    def save(path, it, extra=None):
        with open(path, "wb") as f:
            pickle.dump(
                dict(state=agent.state, iteration=it, best_R=best_R,
                     **(extra or {})), f,
            )

    def log_cb(it, m):
        nonlocal best_R
        if it % eval_every == 0 or it == n_iterations - 1:
            ev = agent.evaluate(n_envs=eval_envs, seed=seed + 991)
            m = dict(m, **{f"eval_{k}": v for k, v in ev.items()})
            if ev["R"] > best_R:
                best_R = ev["R"]
                save(out / "best_agent.pkl", it, {"eval": ev})
        print(json.dumps(dict(iteration=it, **m)))
        history.append(dict(iteration=it, **m))
        save(out / "last.pkl", it)

    agent.train(
        n_iterations, seed=seed, callback=log_cb, start_iteration=start_it
    )
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
    ap.add_argument("--resume", action="store_true",
                    help="continue from <results>/last.pkl")
    ap.add_argument("--eval_every", type=int, default=50)
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
               resume=a.resume, eval_every=a.eval_every, **overrides)
