"""POMDP observation-mask API (get_mask) and obs-extension layout.

Reference behavior: base_robot_humanoid.py:39-91 (positions / velocities /
foot_forces / weight) and base_humanoid_4_ages.py:187-241 (env_type bits).
The observation layering is (pos, vel, [grf], extras) — extras (carried
weight, env-id bits) come AFTER the foot forces, matching the reference's
_create_observation call chain.
"""

import jax
import numpy as np
import pytest

import loco_mujoco_tpu as lmt


def _reset_obs(env):
    s = jax.jit(jax.vmap(env.reset))(jax.random.split(jax.random.PRNGKey(0), 2))
    return env, np.asarray(s.obs[0])


def test_carry_mask_layout():
    env = lmt.make("UnitreeH1.carry.real", debug=True, use_foot_forces=True)
    env, obs = _reset_obs(env)
    nj = len(env.joints)
    assert env.obs_dim == (nj - 2) + nj + env.grf_size + 1
    assert obs.shape == (env.obs_dim,)

    full = env.get_mask(())
    assert full.shape == (env.obs_dim,) and full.all()

    m = env.get_mask(("velocities",))
    assert m.shape == (env.obs_dim,)
    assert m[: nj - 2].all()                       # positions kept
    assert not m[nj - 2 : nj - 2 + nj].any()       # velocities hidden
    assert m[nj - 2 + nj :].all()                  # grf + weight kept

    m = env.get_mask(("foot_forces", "weight"))
    assert m[: nj - 2 + nj].all()
    assert not m[nj - 2 + nj :].any()

    # weight is the LAST obs entry and equals one of the valid masses
    assert obs[-1] in np.asarray(env.weight_masses)

    # string form accepted, like the reference
    assert (env.get_mask("velocities") == env.get_mask(("velocities",))).all()

    with pytest.raises(ValueError):
        env.get_mask(("env_type",))


def test_carry_mask_requires_enabled_groups():
    env = lmt.make("UnitreeH1.walk.real", debug=True)  # no weight, no grf
    with pytest.raises(ValueError):
        env.get_mask(("foot_forces",))
    with pytest.raises(ValueError):
        env.get_mask(("weight",))
    m = env.get_mask(("positions",))
    nj = len(env.joints)
    assert m.shape == (env.obs_dim,)
    assert not m[: nj - 2].any() and m[nj - 2 :].all()


def test_4ages_mask_layout():
    env = lmt.make("HumanoidTorque4Ages.walk.all.real", debug=True)
    env, obs = _reset_obs(env)
    nj = len(env.joints)
    assert env.obs_dim == (nj - 2) + nj + env._env_id_len
    m = env.get_mask(("env_type",))
    assert m.shape == (env.obs_dim,)
    assert m[: -env._env_id_len].all()
    assert not m[-env._env_id_len :].any()
    # env-id bits are the trailing entries and are binary
    bits = obs[-env._env_id_len :]
    assert set(np.unique(bits)).issubset({0.0, 1.0})
    with pytest.raises(ValueError):
        env.get_mask(("weight",))


def test_4ages_fixed_scaling_mask_covers_bits():
    env = lmt.make("HumanoidTorque4Ages.walk.2.real", debug=True)
    m = env.get_mask(("velocities",))
    assert m.shape == (env.obs_dim,)
    assert m[-env._env_id_len :].all()  # constant-id bits stay visible
    with pytest.raises(ValueError):
        env.get_mask(("env_type",))


def test_site_rot_obs_requires_replacement_declaration():
    """Stale-derived-fields guard: an obs spec reading site_xmat must be
    paired with a _modify_observation replacement (the fused step paths
    leave derived Data fields stale between control steps)."""
    from loco_mujoco_tpu.envs.base import LocoEnv
    from loco_mujoco_tpu.envs.observation import ObsIndex, ObservationType

    a1 = lmt.make("UnitreeA1.simple.real", debug=True)
    assert a1._replaces_site_obs  # the opt-in the guard checks

    class BadEnv(LocoEnv):
        pass

    spec = [("dir_arrow", "dir_arrow", ObservationType.SITE_ROT)]
    obs_index = ObsIndex(a1.model, spec)
    with pytest.raises(ValueError, match="SITE_ROT"):
        BadEnv(model=a1.model, obs_index=obs_index)
