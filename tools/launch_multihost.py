"""Multi-host training launcher.

Run the SAME command on every host of the slice/cluster; JAX's
single-controller model does the rest (the mesh spans all processes'
devices, GSPMD partitions one program).

TPU pod slice (runtime autodetects coordinator + ranks)::

    python tools/launch_multihost.py --env_id HumanoidTorque.run.real \
        --n_envs 8192 --iterations 100

Manual cluster (one process per host)::

    LMT_COORDINATOR=host0:8476 LMT_NUM_PROCS=4 LMT_PROC_ID=$RANK \
        python tools/launch_multihost.py --env_id ... --n_envs ...

Scaling scheme (parallel/mesh.py): env-axis data parallelism for the
physics (collective-free), gradient all-reduce + optional Megatron tp
("--tp 2") for the learner, all riding ICI within a slice and DCN across
slices. Throughput and per-iteration wall clock are printed per host 0;
use them for the scaling-efficiency measurement (BASELINE.md row 2:
efficiency(N hosts) = throughput(N) / (N * throughput(1))).

Dry-run locally with a virtual device mesh (no cluster needed)::

    XLA_FLAGS=--xla_force_host_platform_device_count=8 JAX_PLATFORMS=cpu \
        python tools/launch_multihost.py --dryrun
"""

import argparse
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--env_id", default="HumanoidTorque.run.real")
    ap.add_argument("--n_envs", type=int, default=4096)
    ap.add_argument("--iterations", type=int, default=100)
    ap.add_argument("--rollout_len", type=int, default=32)
    ap.add_argument("--tp", type=int, default=1,
                    help="tensor-parallel degree for the learner MLPs")
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--algo", choices=("GAIL", "VAIL"), default="GAIL")
    ap.add_argument("--dryrun", action="store_true",
                    help="tiny shapes, 1 iteration (wiring check)")
    args = ap.parse_args()

    import jax

    if args.dryrun and "cpu" in os.environ.get("JAX_PLATFORMS", ""):
        # the axon TPU plugin ignores the JAX_PLATFORMS env var; the
        # config knob still wins (same workaround as tests/conftest.py)
        jax.config.update("jax_platforms", "cpu")

    from loco_mujoco_tpu.parallel import initialize_distributed

    multi = initialize_distributed()

    import loco_mujoco_tpu as lmt
    from loco_mujoco_tpu.algorithms import GAIL, VAIL, GAILConfig
    from loco_mujoco_tpu.parallel import DistributedTrainer, make_mesh

    n_dev = len(jax.devices())
    pid = jax.process_index()
    if pid == 0:
        print(
            f"processes={jax.process_count()} global_devices={n_dev} "
            f"local={len(jax.local_devices())} multi={multi}",
            flush=True,
        )

    if args.dryrun:
        args.n_envs = 2 * n_dev
        args.rollout_len = 2
        args.iterations = 1

    mesh = make_mesh(
        n_env_shards=n_dev // args.tp, n_model_shards=args.tp
    )
    env = lmt.make(args.env_id, debug=args.dryrun)
    cfg = GAILConfig(
        n_envs=args.n_envs,
        rollout_len=args.rollout_len,
        **(
            dict(hidden=(16, 16), minibatches=1, ppo_epochs=1,
                 disc_epochs=1, disc_batch=16)
            if args.dryrun else {}
        ),
    )
    expert = env.create_dataset()["states"]
    algo = GAIL if args.algo == "GAIL" else VAIL
    agent = algo(env, expert, cfg)
    trainer = DistributedTrainer(agent, mesh, tensor_parallel=args.tp > 1)

    t0 = time.time()
    steps_per_iter = args.n_envs * args.rollout_len

    def log(it, m):
        if pid == 0:
            dt = time.time() - t0
            done = (it + 1) * steps_per_iter
            print(
                f"iter {it}: {m}  "
                f"[{done / dt:,.0f} env-steps/s aggregate]",
                flush=True,
            )

    trainer.train(args.iterations, seed=args.seed, log_every=1,
                  callback=log)
    if pid == 0:
        total = args.iterations * steps_per_iter
        print(
            f"done: {total} env-steps in {time.time() - t0:.1f}s "
            f"({total / (time.time() - t0):,.0f} steps/s aggregate)",
            flush=True,
        )


if __name__ == "__main__":
    main()
