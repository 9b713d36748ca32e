"""Parity of the mega kernel (FK + collision + smooth + solve in ONE
Pallas program — ops/pallas_constraint.mega_forward) vs the staged XLA
reference path, in interpret mode on CPU.

The mega path replaces the ENTIRE forward pass, so parity is asserted on
the full `fwd.forward` outputs (qacc, qfrc_constraint, efc forces, the
contact meta the GRF readout consumes) and on a full `fwd.step`
(RK4: 4 chained forwards per step).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import loco_mujoco_tpu as lmt
from loco_mujoco_tpu.ops import forward as fwd
from loco_mujoco_tpu.ops import pallas_newton as pn
from loco_mujoco_tpu.ops import pallas_constraint as pc

# interpret-mode mega-kernel parity compiles the full fused program on
# the CPU backend (minutes per test): nightly/full-suite only.
# tools/run_tests.sh runs `-m "not slow_interpret"` by default; FULL=1
# includes these.
pytestmark = pytest.mark.slow_interpret


@pytest.fixture(autouse=True)
def _f32_mode():
    with jax.enable_x64(False):
        yield


@pytest.fixture(scope="module")
def humanoid_states():
    with jax.enable_x64(False):
        env = lmt.make(
            "HumanoidTorque.run.real", debug=True, dtype=jnp.float32
        )
        st = jax.jit(jax.vmap(env.reset))(
            jax.random.split(jax.random.PRNGKey(0), 4)
        )
        a = 0.1 * jax.random.normal(
            jax.random.PRNGKey(1), (4, env.action_dim)
        )
        step = jax.jit(jax.vmap(env.step))
        for _ in range(3):
            st = step(st, a.astype(jnp.float32))
    return env, st


def _fwd_all(m, d):
    out = fwd.forward(m, d)
    return (
        out.qacc, out.qfrc_constraint, out.efc_force_contact,
        out.contact.dist, out.contact.geom2.astype(jnp.float32),
    )


def test_mega_plan_builds(humanoid_states):
    env, st = humanoid_states
    d0 = jax.tree_util.tree_map(lambda l: l[0], st.data)
    plan = pc.get_plan(env.model, d0.contact)
    assert plan is not None and plan.smooth and plan.uniform
    assert plan.mega, "mega plan should build for HumanoidTorque"
    assert plan.colp.ncon == plan.ncon
    kinds = [(g["kind"], g["k"], len(g["pairs"])) for g in plan.colp.groups]
    assert kinds == [("box", 2, 2), ("mesh", 8, 75)]


def test_mega_forward_matches_xla(humanoid_states, monkeypatch):
    env, st = humanoid_states
    m = env.model
    datas = st.data

    monkeypatch.setattr(pn, "_INTERPRET", True)
    monkeypatch.setattr(pn, "pallas_enabled", lambda: False)
    ref = jax.jit(jax.vmap(lambda d: _fwd_all(m, d)))(datas)

    monkeypatch.setattr(pn, "pallas_enabled", lambda: True)
    mega = jax.jit(jax.vmap(lambda d: _fwd_all(m, d)))(datas)

    scale = float(jnp.max(jnp.abs(ref[0]))) + 1e-9
    names = ("qacc", "qfrc", "efc_fc", "con_dist", "con_geom2")
    for r, g, what in zip(ref, mega, names):
        if what == "con_geom2":
            # geom binding must match exactly wherever the slot is active
            # (an active slot has dist < margin; inactive slots may bind
            # to different far pairs between the two top-K orderings)
            active = np.asarray(ref[3]) < 0.0
            assert np.array_equal(
                np.asarray(r)[active], np.asarray(g)[active]
            )
            continue
        if what == "con_dist":
            # compare active slots tightly; inactive slot keys may differ
            # (kernel fallback emits the conservative bound, both > margin)
            active = np.asarray(r) < 0.0
            err = float(np.max(np.abs(
                np.asarray(r)[active] - np.asarray(g)[active]
            ))) if active.any() else 0.0
            assert err < 1e-5, (what, err)
            continue
        err = float(jnp.max(jnp.abs(r - g)))
        assert err / scale < 5e-4, (what, err, scale)


def test_mega_full_branch_matches_xla(humanoid_states, monkeypatch):
    """Deep-dropped states put limb MESH hulls in floor contact, so slots
    OUTSIDE the fast subset activate and the kernel's FULL solve branch
    runs (walking states only ever exercise the fast branch)."""
    env, st = humanoid_states
    m = env.model
    qpos = st.data.qpos.at[:, 2].add(-0.45)
    datas = st.data.replace(qpos=qpos)

    d0 = jax.tree_util.tree_map(lambda l: l[0], datas)
    plan = pc.get_plan(m, d0.contact)
    assert plan is not None and plan.mega and plan.mega_fast is not None

    monkeypatch.setattr(pn, "_INTERPRET", True)
    monkeypatch.setattr(pn, "pallas_enabled", lambda: False)
    ref = jax.jit(jax.vmap(lambda d: _fwd_all(m, d)))(datas)
    # the dropped pose must actually activate outside-subset slots
    marg = float(np.asarray(d0.contact.includemargin)[0])
    act = np.asarray(ref[3]) < marg
    outside = sorted(set(range(plan.ncon)) - set(plan.mega_fast))
    assert act[:, outside].any(), "fixture no longer hits the full branch"

    monkeypatch.setattr(pn, "pallas_enabled", lambda: True)
    mega = jax.jit(jax.vmap(lambda d: _fwd_all(m, d)))(datas)

    scale = float(jnp.max(jnp.abs(ref[0]))) + 1e-9
    for r, g, what in zip(ref[:3], mega[:3], ("qacc", "qfrc", "efc_fc")):
        err = float(jnp.max(jnp.abs(r - g)))
        assert err / scale < 5e-4, (what, err, scale)


@pytest.mark.parametrize("task", [
    "UnitreeH1.walk.real",     # Euler; plane-cyl (k==P) + mesh group
    "Atlas.walk.real",         # RK4; top-k plane-cyl + top-k plane-box
])
def test_mega_forward_matches_xla_other_robots(task, monkeypatch):
    env = lmt.make(task, debug=True, dtype=jnp.float32)
    st = jax.jit(jax.vmap(env.reset))(
        jax.random.split(jax.random.PRNGKey(0), 4)
    )
    a = 0.1 * jax.random.normal(
        jax.random.PRNGKey(1), (4, env.action_dim), dtype=jnp.float32
    )
    step = jax.jit(jax.vmap(env.step))
    for _ in range(3):
        st = step(st, a)
    m = env.model
    datas = st.data

    d0 = jax.tree_util.tree_map(lambda l: l[0], datas)
    plan = pc.get_plan(m, d0.contact)
    assert plan is not None and plan.mega, task

    monkeypatch.setattr(pn, "_INTERPRET", True)
    monkeypatch.setattr(pn, "pallas_enabled", lambda: False)
    ref = jax.jit(jax.vmap(lambda d: _fwd_all(m, d)))(datas)
    monkeypatch.setattr(pn, "pallas_enabled", lambda: True)
    mega = jax.jit(jax.vmap(lambda d: _fwd_all(m, d)))(datas)

    scale = float(jnp.max(jnp.abs(ref[0]))) + 1e-9
    for r, g, what in zip(ref, mega, ("qacc", "qfrc", "efc_fc")):
        err = float(jnp.max(jnp.abs(r - g)))
        assert err / scale < 5e-4, (task, what, err, scale)
    # active contact slots bind to the same geoms at the same depths
    active = np.asarray(ref[3]) < 0.0
    assert np.array_equal(np.asarray(ref[4])[active],
                          np.asarray(mega[4])[active])
    if active.any():
        derr = float(np.max(np.abs(
            np.asarray(ref[3])[active] - np.asarray(mega[3])[active]
        )))
        assert derr < 1e-4, (task, derr)


def test_mega_muscle_forward_matches_xla(monkeypatch):
    """92-muscle humanoid: in-kernel tendon + FLV muscle stage
    (pallas_fk.MusclePlan). Compares the full forward plus act_dot (the
    activation-dynamics integrator input) and one Euler step."""
    env = lmt.make("HumanoidMuscle.walk.real", debug=True,
                   dtype=jnp.float32)
    st = jax.jit(jax.vmap(env.reset))(
        jax.random.split(jax.random.PRNGKey(0), 4)
    )
    a = 0.3 * jax.random.uniform(
        jax.random.PRNGKey(1), (4, env.action_dim), dtype=jnp.float32
    )
    step = jax.jit(jax.vmap(env.step))
    for _ in range(3):
        st = step(st, a)
    m = env.model
    datas = st.data

    d0 = jax.tree_util.tree_map(lambda l: l[0], datas)
    plan = pc.get_plan(m, d0.contact)
    assert plan is not None and plan.mega and plan.mp is not None

    def fwd_all(d):
        out = fwd.forward(m, d)
        return out.qacc, out.qfrc_constraint, out.act_dot

    def one_step(d):
        d = fwd.step(m, d)
        return d.qpos, d.qvel, d.act

    monkeypatch.setattr(pn, "_INTERPRET", True)
    monkeypatch.setattr(pn, "pallas_enabled", lambda: False)
    ref = jax.jit(jax.vmap(fwd_all))(datas)
    refs = jax.jit(jax.vmap(one_step))(datas)
    monkeypatch.setattr(pn, "pallas_enabled", lambda: True)
    mega = jax.jit(jax.vmap(fwd_all))(datas)
    megas = jax.jit(jax.vmap(one_step))(datas)

    for r, g, what in zip(ref, mega, ("qacc", "qfrc", "act_dot")):
        scale = float(jnp.max(jnp.abs(r))) + 1e-9
        err = float(jnp.max(jnp.abs(r - g)))
        assert err / scale < 5e-4, (what, err, scale)
    for r, g, what in zip(refs, megas, ("qpos", "qvel", "act")):
        scale = float(jnp.max(jnp.abs(r))) + 1e-9
        err = float(jnp.max(jnp.abs(r - g)))
        assert err / scale < 5e-4, (what, err, scale)


@pytest.mark.skipif(
    __import__("os").environ.get("LMT_SLOW_PARITY", "0") != "1",
    reason="4 chained interpret-mode mega kernels take ~10 min to compile "
    "on CPU; forward parity above covers the kernel, the integrator is "
    "plain XLA. Set LMT_SLOW_PARITY=1 to run.",
)
def test_mega_step_matches_xla(humanoid_states, monkeypatch):
    """Full RK4 step (4 chained forwards) through the mega kernel."""
    env, st = humanoid_states
    m = env.model
    datas = st.data

    def one_step(d):
        d = fwd.step(m, d)
        return d.qpos, d.qvel

    monkeypatch.setattr(pn, "_INTERPRET", True)
    monkeypatch.setattr(pn, "pallas_enabled", lambda: False)
    ref = jax.jit(jax.vmap(one_step))(datas)

    monkeypatch.setattr(pn, "pallas_enabled", lambda: True)
    mega = jax.jit(jax.vmap(one_step))(datas)

    for r, g, what in zip(ref, mega, ("qpos", "qvel")):
        scale = float(jnp.max(jnp.abs(r))) + 1e-9
        err = float(jnp.max(jnp.abs(r - g)))
        assert err / scale < 5e-4, (what, err, scale)


def test_megastep_rk4_matches_staged(humanoid_states, monkeypatch):
    """The megastep kernel (n substeps + RK4 combine looped IN-KERNEL,
    ops/pallas_constraint.mega_step_n) vs n sequential staged XLA steps."""
    env, st = humanoid_states
    m = env.model
    datas = st.data
    n = 3

    def n_steps_ref(d):
        for _ in range(n):
            d = fwd.step(m, d)
        return d.qpos, d.qvel, d.qacc_warmstart

    monkeypatch.setattr(pn, "_INTERPRET", True)
    monkeypatch.setattr(pn, "pallas_enabled", lambda: False)
    ref = jax.jit(jax.vmap(n_steps_ref))(datas)

    monkeypatch.setattr(pn, "pallas_enabled", lambda: True)
    d0 = jax.tree_util.tree_map(lambda l: l[0], datas)
    plan = pc.get_plan(m, d0.contact)
    assert plan is not None and plan.mega

    def n_steps_mega(d):
        out = pc.mega_step_n(m, d, plan, n)
        assert out is not None
        return out.qpos, out.qvel, out.qacc_warmstart

    mega = jax.jit(jax.vmap(n_steps_mega))(datas)

    for r, g, what in zip(ref, mega, ("qpos", "qvel", "ws")):
        scale = float(jnp.max(jnp.abs(r))) + 1e-9
        err = float(jnp.max(jnp.abs(r - g)))
        assert err / scale < 5e-4, (what, err, scale)


def test_megastep_euler_muscle_matches_staged(monkeypatch):
    """Euler + 92-muscle activation dynamics through the megastep loop
    (act integration + actrange clamp in-kernel)."""
    env = lmt.make("HumanoidMuscle.walk.real", debug=True,
                   dtype=jnp.float32)
    st = jax.jit(jax.vmap(env.reset))(
        jax.random.split(jax.random.PRNGKey(0), 4)
    )
    a = 0.3 * jax.random.uniform(
        jax.random.PRNGKey(1), (4, env.action_dim), dtype=jnp.float32
    )
    step = jax.jit(jax.vmap(env.step))
    for _ in range(2):
        st = step(st, a)
    m = env.model
    datas = st.data
    n = 2

    def n_steps_ref(d):
        for _ in range(n):
            d = fwd.step(m, d)
        return d.qpos, d.qvel, d.act

    monkeypatch.setattr(pn, "_INTERPRET", True)
    monkeypatch.setattr(pn, "pallas_enabled", lambda: False)
    ref = jax.jit(jax.vmap(n_steps_ref))(datas)

    monkeypatch.setattr(pn, "pallas_enabled", lambda: True)
    d0 = jax.tree_util.tree_map(lambda l: l[0], datas)
    plan = pc.get_plan(m, d0.contact)
    assert plan is not None and plan.mega and plan.mp is not None

    def n_steps_mega(d):
        out = pc.mega_step_n(m, d, plan, n)
        assert out is not None
        return out.qpos, out.qvel, out.act

    mega = jax.jit(jax.vmap(n_steps_mega))(datas)

    for r, g, what in zip(ref, mega, ("qpos", "qvel", "act")):
        scale = float(jnp.max(jnp.abs(r))) + 1e-9
        err = float(jnp.max(jnp.abs(r - g)))
        assert err / scale < 5e-4, (what, err, scale)


def test_mega_ell_a1_forward_matches_fused(monkeypatch):
    """A1's extended elliptic mega (in-kernel analytic collision over ALL
    group types emitting the generic contact pack,
    pallas_fk.ColPlanExt / collide_env_block_ext) vs the staged-collision
    fused elliptic path."""
    import os

    env = lmt.make("UnitreeA1.simple.real", debug=True, dtype=jnp.float32)
    st = jax.jit(jax.vmap(env.reset))(
        jax.random.split(jax.random.PRNGKey(0), 4)
    )
    m = env.model
    d0 = jax.tree_util.tree_map(lambda l: l[0], st.data)
    plan = pc.get_plan(m, d0.contact)
    assert plan is not None and plan.mega and plan.mega_ell

    monkeypatch.setattr(pn, "_INTERPRET", True)
    monkeypatch.setattr(pn, "pallas_enabled", lambda: True)

    def fwd_all(d):
        out = fwd.forward(m, d)
        return (out.qacc, out.qfrc_constraint, out.efc_force_contact,
                out.contact.dist, out.contact.geom2.astype(jnp.float32))

    monkeypatch.setenv("LMT_MEGA", "0")
    pc._PLAN_CACHE.clear(); pc._FUSED_CACHE.clear(); pc._MEGA_CACHE.clear()
    ref = jax.jit(jax.vmap(fwd_all))(st.data)
    monkeypatch.setenv("LMT_MEGA", "1")
    pc._PLAN_CACHE.clear(); pc._FUSED_CACHE.clear(); pc._MEGA_CACHE.clear()
    mega = jax.jit(jax.vmap(lambda d: fwd_all(d)))(st.data)

    scale = float(jnp.max(jnp.abs(ref[0]))) + 1e-9
    for r, g, what in zip(ref[:3], mega[:3], ("qacc", "qfrc", "efc")):
        err = float(jnp.max(jnp.abs(r - g)))
        assert err / scale < 5e-4, (what, err, scale)
    # active slots bind to the same geoms at matching depths
    active = np.asarray(ref[3]) < 0.0
    assert np.array_equal(np.asarray(ref[4])[active],
                          np.asarray(mega[4])[active])


def test_megastep_ell_a1_matches_staged(monkeypatch):
    """A1 megastep (Euler + in-kernel collision, n substeps in ONE
    program) vs sequential staged steps."""
    import os

    env = lmt.make("UnitreeA1.simple.real", debug=True, dtype=jnp.float32)
    st = jax.jit(jax.vmap(env.reset))(
        jax.random.split(jax.random.PRNGKey(0), 2)
    )
    m = env.model
    n = 2

    def nsteps(d):
        for _ in range(n):
            d = fwd.step(m, d)
        return d.qpos, d.qvel, d.qacc_warmstart

    monkeypatch.setattr(pn, "_INTERPRET", True)
    monkeypatch.setattr(pn, "pallas_enabled", lambda: False)
    monkeypatch.setenv("LMT_MEGA", "0")
    monkeypatch.setenv("LMT_MEGASTEP", "0")
    pc._PLAN_CACHE.clear(); pc._FUSED_CACHE.clear()
    pc._MEGA_CACHE.clear(); pc._MEGASTEP_CACHE.clear()
    ref = jax.jit(jax.vmap(nsteps))(st.data)

    monkeypatch.setattr(pn, "pallas_enabled", lambda: True)
    monkeypatch.setenv("LMT_MEGA", "1")
    monkeypatch.setenv("LMT_MEGASTEP", "1")
    pc._PLAN_CACHE.clear(); pc._FUSED_CACHE.clear()
    pc._MEGA_CACHE.clear(); pc._MEGASTEP_CACHE.clear()
    d0 = jax.tree_util.tree_map(lambda l: l[0], st.data)
    plan = pc.get_plan(m, d0.contact)
    assert plan is not None and plan.mega_ell

    def nsteps_mega(d):
        out = pc.mega_step_n(m, d, plan, n)
        assert out is not None
        return out.qpos, out.qvel, out.qacc_warmstart

    mega = jax.jit(jax.vmap(nsteps_mega))(st.data)
    for r, g, what in zip(ref, mega, ("qpos", "qvel", "ws")):
        scale = float(jnp.max(jnp.abs(r))) + 1e-9
        err = float(jnp.max(jnp.abs(r - g)))
        assert err / scale < 5e-4, (what, err, scale)
