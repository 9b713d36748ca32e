"""Probe one failing cylinder-mesh config with enlarged EPA budgets."""
import jax
import numpy as np

jax.config.update("jax_enable_x64", True)
jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp
import mujoco
import sys
sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/tests")
from test_gjk import _model, _geom_args
from loco_mujoco_tpu.ops import gjk

QPOS = np.array([0., 0., 0., -0.185955, 0.192114, -0.804031, 0.531082,
                 0.052153, 0.005146, 0.050119, -0.996846, 0.068873,
                 -0.006724, -0.038858])

m = _model("cylinder", "mesh")
d = mujoco.MjData(m)
d.qpos[:] = QPOS
mujoco.mj_forward(m, d)
c = d.contact[0]
print("oracle dist", c.dist, "normal", c.frame[:3], "geoms", c.geom1, c.geom2)

for iters, faces in [(48, 128), (96, 256), (200, 512)]:
    gjk.GJK_ITERS = 48
    gjk.EPA_ITERS = iters
    gjk.EPA_VERTS = 5 + iters
    gjk.EPA_FACES = faces
    g1, g2 = int(c.geom1), int(c.geom2)
    a1 = _geom_args(m, g1)
    a2 = _geom_args(m, g2)
    dist, pos, normal = gjk.convex_contact(
        jnp.asarray(a1[0]), jnp.asarray(a1[1]), a1[2], a1[3],
        jnp.asarray(d.geom_xpos[g1]),
        jnp.asarray(d.geom_xmat[g1].reshape(3, 3)),
        jnp.asarray(a2[0]), jnp.asarray(a2[1]), a2[2], a2[3],
        jnp.asarray(d.geom_xpos[g2]),
        jnp.asarray(d.geom_xmat[g2].reshape(3, 3)),
    )
    print(f"iters={iters} faces={faces}: dist {float(dist):+.5f} "
          f"normal {np.asarray(normal)} ndot "
          f"{float(np.dot(np.asarray(normal), c.frame[:3])):+.3f}")
