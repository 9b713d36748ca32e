"""GRF numerical parity: ops/support.contact_force_groups vs CPU MuJoCo's
mj_contactForce, summed per collision group, on oracle-matched states
(VERDICT r3 item 7).

The reference reads ground-reaction forces per (floor, foot-geom) group
through mushroom-rl's `_get_collision_force` and slices the linear part
(`/root/reference/loco_mujoco/environments/base.py:667-679`). mushroom-rl
returns the FIRST matching contact's force; we sum all matching contacts
(a box foot makes up to 4 floor contacts — the sum is the physical total
load and is batch-order independent; the first-contact readout depends on
MuJoCo's internal contact ordering, which a fixed-slot engine cannot and
should not reproduce). This test validates the decode itself (pyramidal
facet recombination and elliptic rows) against mj_contactForce sums.
"""

import jax
import jax.numpy as jnp
import mujoco
import numpy as np
import pytest

import loco_mujoco_tpu as lmt
from loco_mujoco_tpu.ops import forward as fwd
from loco_mujoco_tpu.ops import support


def _oracle_group_force(mj_model, mj_data, gids1, gids2):
    """Sum of mj_contactForce contact-frame forces [:3] over contacts
    between two geom-id sets."""
    out = np.zeros(3)
    buf = np.zeros(6)
    s1, s2 = set(int(g) for g in gids1), set(int(g) for g in gids2)
    for i in range(mj_data.ncon):
        c = mj_data.contact[i]
        g1, g2 = int(c.geom1), int(c.geom2)
        if (g1 in s1 and g2 in s2) or (g1 in s2 and g2 in s1):
            mujoco.mj_contactForce(mj_model, mj_data, i, buf)
            out += buf[:3]
    return out


def _settle_oracle(env, seed, n_ctrl_steps):
    """Roll the oracle twin forward with small random actions from one of
    our reset states; returns (mj_model, mj_data) in a contact-rich
    state."""
    state = jax.jit(env.reset)(jax.random.PRNGKey(seed))
    mj_model = env._mj_models[0]
    mj_data = mujoco.MjData(mj_model)
    mj_data.qpos[:] = np.asarray(state.data.qpos)
    mj_data.qvel[:] = np.asarray(state.data.qvel)
    rng = np.random.default_rng(seed)
    for _ in range(n_ctrl_steps):
        a = rng.normal(scale=0.1, size=env.action_dim)
        mj_data.ctrl[:] = (
            a * np.asarray(env.norm_act_delta) + np.asarray(env.norm_act_mean)
        )
        for _ in range(env.n_substeps):
            mujoco.mj_step(mj_model, mj_data)
    mujoco.mj_forward(mj_model, mj_data)
    return state, mj_model, mj_data


def _our_forward_from_oracle(env, state, mj_data):
    d = state.data.replace(
        qpos=jnp.asarray(mj_data.qpos, jnp.float64),
        qvel=jnp.asarray(mj_data.qvel, jnp.float64),
        ctrl=jnp.asarray(mj_data.ctrl, jnp.float64),
        qacc_warmstart=jnp.asarray(mj_data.qacc_warmstart, jnp.float64),
    )
    if env.model.na:
        d = d.replace(act=jnp.asarray(mj_data.act, jnp.float64))
    return jax.jit(lambda d: fwd.forward(env.model, d))(d)


def test_grf_pyramidal_matches_oracle():
    """HumanoidTorque box feet (pyramidal condim 3): per-foot group sums
    must match mj_contactForce's pyramid decode."""
    env = lmt.make(
        "HumanoidTorque.walk.real", debug=True, dtype=jnp.float64,
        use_absorbing_states=False, auto_reset=False,
        solver_iterations=100, ls_iterations=50,
    )
    state, mj_model, mj_data = _settle_oracle(env, seed=3, n_ctrl_steps=3)
    assert mj_data.ncon > 0, "fixture produced no contacts"
    d = _our_forward_from_oracle(env, state, mj_data)

    checked = 0
    for g in env._grf_groups:
        ours = np.asarray(
            support.contact_force_groups(
                env.model, d, env._floor_ids, g, elliptic=False
            )
        )
        oracle = _oracle_group_force(mj_model, mj_data, env._floor_ids, g)
        scale = max(np.abs(oracle).max(), 1.0)
        np.testing.assert_allclose(
            ours, oracle, atol=1e-5 * scale,
            err_msg=f"group {g} force mismatch",
        )
        if np.abs(oracle).max() > 1.0:
            checked += 1
    assert checked, "no group carried load — fixture too weak"


def test_grf_elliptic_matches_oracle():
    """UnitreeA1 (elliptic cones, condim 6 feet): elliptic rows ARE the
    contact-frame force — group sums must match mj_contactForce."""
    env = lmt.make(
        "UnitreeA1.simple.real", debug=True, dtype=jnp.float64,
        use_absorbing_states=False, auto_reset=False,
        solver_iterations=100, ls_iterations=50,
    )
    state, mj_model, mj_data = _settle_oracle(env, seed=5, n_ctrl_steps=3)
    assert mj_data.ncon > 0
    d = _our_forward_from_oracle(env, state, mj_data)

    floor = env._floor_ids
    checked = 0
    for foot in ("FR", "FL", "RR", "RL"):
        g = env._foot_ids[foot]
        ours = np.asarray(
            support.contact_force_groups(
                env.model, d, floor, g, elliptic=True
            )
        )
        oracle = _oracle_group_force(mj_model, mj_data, floor, g)
        scale = max(np.abs(oracle).max(), 1.0)
        np.testing.assert_allclose(
            ours, oracle, atol=1e-5 * scale,
            err_msg=f"foot {foot} force mismatch",
        )
        if np.abs(oracle).max() > 1.0:
            checked += 1
    assert checked, "no foot carried load — fixture too weak"
