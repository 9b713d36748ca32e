"""Interpret-mode parity of the fused plane-mesh select+topk kernels vs the
XLA narrowphase path (collision._plane_mesh_group's two implementations).

The fused path adds a conservative distance gate (skip the height map when
the hull-radius bound keeps every env beyond margin, and the manifold walk
when the exact support depth does): active slots must agree exactly with
the XLA path, inactive slots only need dist >= margin.
"""

import jax
import jax.numpy as jnp
import mujoco
import numpy as np
import pytest

from loco_mujoco_tpu.core.io import load_model, make_data, preprocess_xml
from loco_mujoco_tpu.ops import collision
from loco_mujoco_tpu.ops import pallas_collision as pc

REF_DATA = "/root/reference/loco_mujoco/environments/data"


def _poses(model, n, seed, drop):
    rng = np.random.default_rng(seed)
    qpos = np.asarray(model.qpos0)[None] + rng.normal(
        scale=0.05, size=(n, model.nq)
    )
    qpos[:, 2] -= drop
    return jnp.asarray(qpos, jnp.float32)


@pytest.mark.parametrize("drop", [0.012, -0.3, 0.45])
# drop=0.45: deep drop puts limb MESH hulls in floor contact so the
# manifold's neighbor slots (contacts 1-2) activate — regression for the
# f32 cancellation bug that zeroed every neighbor depth (d1 + t1*(hc - d1)
# with d1 = 1e10)
def test_fused_select_topk_matches_xla(monkeypatch, drop):
    model = load_model(
        f"{REF_DATA}/humanoid/humanoid_torque.xml", dtype=jnp.float32
    )
    data0 = make_data(model)
    qpos = _poses(model, 8, 3, drop)

    def run(d):
        return jax.vmap(lambda q: collision.collision(
            model, d.replace(qpos=q)
        ).contact)(qpos)

    ref = jax.jit(run)(data0)  # XLA path (pallas disabled on CPU)

    monkeypatch.setattr(pc, "_INTERPRET", True)
    monkeypatch.setattr(pc, "pallas_enabled", lambda: True)
    collision._PALLAS_SELECT_CACHE.clear()
    collision._PALLAS_TOPK_CACHE.clear()
    got = jax.jit(run)(data0)

    margin = 0.0  # suite pairs have zero margin
    ref_d = np.asarray(ref.dist)
    got_d = np.asarray(got.dist)
    active_ref = ref_d < margin
    active_got = got_d < margin
    np.testing.assert_array_equal(active_ref, active_got)
    for e in range(ref_d.shape[0]):
        act = active_ref[e]
        if not act.any():
            continue
        np.testing.assert_allclose(
            got_d[e][act], ref_d[e][act], atol=1e-6,
            err_msg=f"env {e} active dists",
        )
        np.testing.assert_allclose(
            np.asarray(got.pos)[e][act], np.asarray(ref.pos)[e][act],
            atol=1e-5, err_msg=f"env {e} active pos",
        )
        np.testing.assert_allclose(
            np.asarray(got.frame)[e][act], np.asarray(ref.frame)[e][act],
            atol=1e-6,
        )
        np.testing.assert_array_equal(
            np.asarray(got.geom2)[e][act], np.asarray(ref.geom2)[e][act]
        )
    # inactive slots must stay inactive (dist >= margin), values finite
    assert np.all(got_d[~active_got] >= margin)
    assert np.all(np.isfinite(np.asarray(got.pos)))
