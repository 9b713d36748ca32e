"""Parity of the Pallas Newton-solver kernels vs the XLA reference path.

Runs the kernels in interpret mode on CPU (no TPU needed): the same
batched HumanoidTorque states are pushed through `fwd_constraint` three
ways — XLA reference, the plain solve kernel (J assembled by XLA), and the
fused assembly+solve kernel — and the results must agree to f32 tolerance.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import loco_mujoco_tpu as lmt
from loco_mujoco_tpu.ops import forward as fwd
from loco_mujoco_tpu.ops import solver
from loco_mujoco_tpu.ops import constraint as con
from loco_mujoco_tpu.ops import pallas_newton as pn
from loco_mujoco_tpu.ops import pallas_constraint as pc


@pytest.fixture(autouse=True)
def _f32_mode():
    # the kernels are f32/TPU-only; the suite-wide x64 default promotes f32
    # state through np-scalar constants and breaks the fixture rollout
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


def _fc(m, d):
    d2 = fwd.fwd_acceleration(
        m, fwd.fwd_actuation(m, fwd.fwd_velocity(m, fwd.fwd_position(m, d)))
    )
    out = fwd.fwd_constraint(m, d2)
    return out.qacc, out.qfrc_constraint, out.efc_force_contact


def test_pallas_newton_kernels_match_xla(humanoid_states, monkeypatch):
    env, st = humanoid_states
    m = env.model
    datas = st.data

    monkeypatch.setattr(pn, "_INTERPRET", True)

    # reference: XLA path
    monkeypatch.setattr(pn, "pallas_enabled", lambda: False)
    ref = jax.jit(jax.vmap(lambda d: _fc(m, d)))(datas)

    # fused assembly+solve kernel
    monkeypatch.setattr(pn, "pallas_enabled", lambda: True)
    d0 = jax.tree_util.tree_map(lambda l: l[0], datas)
    plan = pc.get_plan(m, d0.contact)
    assert plan is not None and plan.nrows > 0
    fused = jax.jit(jax.vmap(lambda d: _fc(m, d)))(datas)

    # plain solve kernel (J assembled by XLA): force the fused gate off
    monkeypatch.setattr(pc, "get_plan", lambda *_: None)
    plain = jax.jit(jax.vmap(lambda d: _fc(m, d)))(datas)

    scale = float(jnp.max(jnp.abs(ref[0]))) + 1e-9
    for got, name in ((fused, "fused"), (plain, "plain")):
        for r, g, what in zip(ref, got, ("qacc", "qfrc", "efc_fc")):
            err = float(jnp.max(jnp.abs(r - g)))
            assert err / scale < 5e-4, (name, what, err, scale)


def test_fused_plan_row_layout_matches_make_constraint(humanoid_states):
    env, st = humanoid_states
    m = env.model
    d0 = jax.tree_util.tree_map(lambda l: l[0], st.data)
    d0 = fwd.fwd_acceleration(
        m, fwd.fwd_actuation(m, fwd.fwd_velocity(m, fwd.fwd_position(m, d0)))
    )
    efc = con.make_constraint(m, d0)
    plan = pc.get_plan(m, d0.contact)
    assert plan is not None
    # the fused layout inserts plan.npad inert sublane-pad rows after the
    # eq/fl/limit block (see RowPlan.npad); the XLA layout has none
    assert plan.nrows == efc.J.shape[0] + plan.npad
    np.testing.assert_array_equal(
        plan.con_efcadr, efc.con_efcadr + plan.npad
    )
    np.testing.assert_array_equal(plan.con_dim, efc.con_dim)
    # row-class masks line up
    assert plan.ne == int(np.sum(efc.is_bilateral))
    assert plan.nfl == int(np.sum(efc.is_fl))


def test_fused_elliptic_matches_xla(monkeypatch):
    """A1: elliptic cones (impratio=100, mixed condim 3/6, self-collision
    pairs) through the fused assembly+solve kernel vs the XLA reference."""
    env = lmt.make("UnitreeA1.simple.real", debug=True, dtype=jnp.float32)
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
    assert plan is not None and plan.elliptic and plan.ell_runs
    # row layout matches the XLA assembly
    d1 = fwd.fwd_acceleration(
        m, fwd.fwd_actuation(m, fwd.fwd_velocity(m, fwd.fwd_position(m, d0)))
    )
    efc = con.make_constraint(m, d1)
    assert plan.nrows == efc.J.shape[0] + plan.npad
    np.testing.assert_array_equal(
        plan.con_efcadr, efc.con_efcadr + plan.npad
    )
    np.testing.assert_array_equal(plan.con_dim, efc.con_dim)

    monkeypatch.setattr(pn, "_INTERPRET", True)
    monkeypatch.setattr(pn, "pallas_enabled", lambda: False)
    ref = jax.jit(jax.vmap(lambda d: _fc(m, d)))(datas)
    monkeypatch.setattr(pn, "pallas_enabled", lambda: True)
    fused = jax.jit(jax.vmap(lambda d: _fc(m, d)))(datas)

    scale = float(jnp.max(jnp.abs(ref[0]))) + 1e-9
    for r, g, what in zip(ref, fused, ("qacc", "qfrc", "efc_fc")):
        err = float(jnp.max(jnp.abs(r - g)))
        # with tolerance-based Newton termination the two paths may stop
        # one iteration apart (their J assemblies round differently), so
        # force SPLITS among redundant contact rows agree only to solver
        # tolerance; qacc — the physical output — stays tight
        atol = 5e-4 if what == "qacc" else 2e-3
        assert err / scale < atol, (what, err, scale)


def test_pick_sublanes_power_of_two():
    """Sublane block S must be a power of two dividing 8 — with grid > 1,
    block windows start at sublane offset block*S, and odd S (e.g. E=384
    -> ceil(E/128)=3) would place windows off the f32 tile grid (ADVICE r2
    medium)."""
    for E in (1, 64, 128, 256, 384, 640, 896, 1024, 4096, 5000):
        s = pn.pick_sublanes(E)
        assert s in (1, 2, 4, 8), (E, s)
    # VMEM-budget shrink keeps the invariant: huge per-env footprint
    for E in (4096, 384):
        for bpe in (10_000, 60_000, 300_000, 10_000_000):
            s = pn.pick_sublanes(E, bpe)
            assert s in (1, 2, 4, 8), (E, bpe, s)
    # monotone: more bytes/env never increases S
    assert pn.pick_sublanes(4096, 300_000) <= pn.pick_sublanes(4096, 10_000)


def test_plain_solver_shrunk_sublane_batch(humanoid_states, monkeypatch):
    """The standalone solve kernel at E=384 (S=2, grid=3/2) and with a
    forced budget shrink — functional parity in interpret mode for the
    grouped layouts the power-of-two fix produces."""
    env, st4 = humanoid_states
    m = env.model
    E = 384
    with jax.enable_x64(False):
        st = jax.jit(jax.vmap(env.reset))(
            jax.random.split(jax.random.PRNGKey(7), E)
        )
    datas = st.data

    monkeypatch.setattr(pn, "_INTERPRET", True)
    monkeypatch.setattr(pn, "pallas_enabled", lambda: False)
    ref = jax.jit(jax.vmap(lambda d: _fc(m, d)))(datas)

    monkeypatch.setattr(pn, "pallas_enabled", lambda: True)
    # plain solve kernel only (fused gate off) — exercises _solve_batched's
    # pick_sublanes path with grid > 1
    monkeypatch.setattr(pc, "get_plan", lambda *_: None)
    assert pn.pick_sublanes(E) == 2
    plain = jax.jit(jax.vmap(lambda d: _fc(m, d)))(datas)

    scale = float(jnp.max(jnp.abs(ref[0]))) + 1e-9
    for r, g, what in zip(ref, plain, ("qacc", "qfrc", "efc_fc")):
        err = float(jnp.max(jnp.abs(r - g)))
        assert err / scale < 5e-4, (what, err, scale)


def test_fused_euler_damping_step_matches_xla(monkeypatch):
    """Full fwd.step parity for an Euler model (A1): the fused kernel now
    emits the implicit-damping dv = (M + h diag(damping))^-1 M qacc, so
    the integrator must land on the XLA path's qpos/qvel without qM."""
    env = lmt.make("UnitreeA1.simple.real", debug=True, dtype=jnp.float32)
    st = jax.jit(jax.vmap(env.reset))(
        jax.random.split(jax.random.PRNGKey(3), 4)
    )
    m = env.model
    datas = st.data

    def one_step(d):
        d = fwd.step(m, d)
        return d.qpos, d.qvel

    monkeypatch.setattr(pn, "_INTERPRET", True)
    monkeypatch.setattr(pn, "pallas_enabled", lambda: False)
    ref = jax.jit(jax.vmap(one_step))(datas)

    monkeypatch.setattr(pn, "pallas_enabled", lambda: True)
    d0 = jax.tree_util.tree_map(lambda l: l[0], datas)
    plan = pc.get_plan(m, d0.contact)
    assert plan is not None and plan.euler_dv
    fused = jax.jit(jax.vmap(one_step))(datas)

    for r, g, what in zip(ref, fused, ("qpos", "qvel")):
        scale = float(jnp.max(jnp.abs(r))) + 1e-9
        err = float(jnp.max(jnp.abs(r - g)))
        assert err / scale < 5e-4, (what, err, scale)
