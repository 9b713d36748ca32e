"""DR-enabled mega-kernel parity vs the staged XLA path (on-chip).

VERDICT r4 #4 asks that domain-randomized stepping stay oracle-faithful.
The staged XLA pipeline is the engine's reference implementation (every
stage is oracle-tested on CPU f64); this tool steps the SAME randomized
envs through the mega kernel (damping as per-env operand rows) and the
staged path and bounds the divergence at f32 roundoff.

Measured 2026-08-21: max obs diff 5.6e-5, relative 6.5e-7 over 3 steps at
128 envs (PASS threshold rel < 5e-4, the kernel's f32 parity envelope).

Usage: python tools/verify_dr_parity.py  (claims the TPU)
"""
import os
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
import numpy as np

import loco_mujoco_tpu as lmt
from loco_mujoco_tpu.utils.tpu import tpu_compiler_options

DR = os.environ.get(
    "BENCH_DR",
    "/root/reference/loco_mujoco/environments/data/humanoid/"
    "domain_randomization_humanoid.yaml",
)


def main():
    env = lmt.make(
        "HumanoidTorque.run.real", debug=True,
        domain_randomization_config=DR,
    )
    N = 128
    copts = tpu_compiler_options()
    keys = jax.random.split(jax.random.PRNGKey(3), N)
    st = jax.jit(jax.vmap(env.reset), compiler_options=copts)(keys)
    a = 0.1 * jax.random.normal(
        jax.random.PRNGKey(4), (N, env.action_dim), dtype=jnp.float32
    )
    step = jax.jit(jax.vmap(env.step), compiler_options=copts)
    st1 = st
    for _ in range(3):
        st1 = step(st1, a)
    obs_mega = np.asarray(st1.obs)

    os.environ["LMT_MEGA"] = "0"
    step2 = jax.jit(jax.vmap(env.step), compiler_options=copts)
    st2 = st
    for _ in range(3):
        st2 = step2(st2, a)
    obs_stg = np.asarray(st2.obs)
    d = float(np.max(np.abs(obs_mega - obs_stg)))
    rel = d / (float(np.max(np.abs(obs_stg))) + 1e-9)
    print(f"DR mega vs staged: max obs diff {d:.3e} rel {rel:.3e}")
    assert rel < 5e-4, (d, rel)
    print("PASS")


if __name__ == "__main__":
    main()
