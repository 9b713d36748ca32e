"""Isolate failing cylinder-mesh configs for ops/gjk.py debugging."""
import jax
import jax.numpy as jnp
import mujoco
import numpy as np

jax.config.update("jax_enable_x64", True)
jax.config.update("jax_platforms", "cpu")

import sys
sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/tests")
from test_gjk import _model, _geom_args, _rand_quat
from loco_mujoco_tpu.ops import gjk

t1, t2 = sys.argv[1] if len(sys.argv) > 1 else "cylinder", \
    sys.argv[2] if len(sys.argv) > 2 else "mesh"
m = _model(t1, t2)
d = mujoco.MjData(m)
rng = np.random.default_rng(0)
fn = jax.jit(gjk.convex_contact, static_argnums=(3, 9))
bad = []
for i in range(60):
    d.qpos[:3] = 0.0
    d.qpos[3:7] = _rand_quat(rng)
    d.qpos[7:10] = rng.uniform(-0.08, 0.08, 3)
    d.qpos[10:14] = _rand_quat(rng)
    qpos = d.qpos.copy()
    mujoco.mj_forward(m, d)
    if d.ncon == 0:
        continue
    c = d.contact[0]
    g1, g2 = int(c.geom1), int(c.geom2)
    a1 = _geom_args(m, g1)
    a2 = _geom_args(m, g2)
    args = (
        jnp.asarray(a1[0]), jnp.asarray(a1[1]), a1[2], a1[3],
        jnp.asarray(d.geom_xpos[g1]),
        jnp.asarray(d.geom_xmat[g1].reshape(3, 3)),
        jnp.asarray(a2[0]), jnp.asarray(a2[1]), a2[2], a2[3],
        jnp.asarray(d.geom_xpos[g2]),
        jnp.asarray(d.geom_xmat[g2].reshape(3, 3)),
    )
    dist, pos, normal = fn(*args)
    err = abs(float(c.dist) - float(dist))
    if err > 1e-3:
        bad.append((i, err, float(c.dist), float(dist),
                    np.array(c.frame[:3]), np.asarray(normal), qpos))

print(f"{len(bad)} bad configs")
for i, err, od, ud, on, un, qpos in bad:
    print(f"cfg {i}: oracle {od:+.5f} ours {ud:+.5f} err {err:.4f} "
          f"ndot {np.dot(on, un):+.3f}")
    print("  qpos:", np.array2string(qpos, precision=6, separator=","))
