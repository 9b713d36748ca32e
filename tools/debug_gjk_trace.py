"""NumPy transliteration of ops/gjk.py EPA with per-iteration tracing."""
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
print("oracle dist", c.dist, "normal", c.frame[:3])
g1, g2 = int(c.geom1), int(c.geom2)
a1 = _geom_args(m, g1)
a2 = _geom_args(m, g2)

sa = gjk.make_world_support(jnp.asarray(a1[0]), jnp.asarray(a1[1]), a1[3],
                            jnp.asarray(d.geom_xpos[g1]),
                            jnp.asarray(d.geom_xmat[g1].reshape(3, 3)))
sb = gjk.make_world_support(jnp.asarray(a2[0]), jnp.asarray(a2[1]), a2[3],
                            jnp.asarray(d.geom_xpos[g2]),
                            jnp.asarray(d.geom_xmat[g2].reshape(3, 3)))
d0 = jnp.asarray(d.geom_xpos[g2] - d.geom_xpos[g1])
g = gjk.gjk(sa, sb, d0=d0)
print("gjk: dist", float(g["dist"]), "overlap", bool(g["overlap"]),
      "k", int(g["k"]))
print("W:", np.asarray(g["W"]))


def sup(dd):
    a = np.asarray(sa(jnp.asarray(dd)))
    b = np.asarray(sb(jnp.asarray(-dd)))
    return a - b, a, b


# ---- numpy EPA mirror --------------------------------------------------
EPA_ITERS = 48
EPA_VERTS = 5 + EPA_ITERS
EPA_FACES = 128
V = np.zeros((EPA_VERTS, 3))
V[:4] = np.asarray(g["W"])
k = int(g["k"])
axes = np.eye(3)
for i in range(4):
    if i >= k:
        dd = axes[min(i - k, 2)]
        w, a, b = sup(dd)
        if np.min(np.sum((V[:4] - w) ** 2, 1)
                  + np.where(np.arange(4) >= i, 1e10, 0)) < 1e-18:
            w, a, b = sup(-dd)
        V[i] = w
vol = np.dot(V[3] - V[0], np.cross(V[1] - V[0], V[2] - V[0]))
if vol < 0:
    V[[1, 2]] = V[[2, 1]]
print("seed tetra:", V[:4], "vol", vol)
# is origin inside seed?
F = np.zeros((EPA_FACES, 3), int)
F[:4] = [[0, 1, 2], [0, 3, 1], [0, 2, 3], [1, 3, 2]]
alive = np.zeros(EPA_FACES, bool)
alive[:4] = True
nvert, nface = 4, 4


def face_geom(tri):
    a, b, c2 = V[tri[0]], V[tri[1]], V[tri[2]]
    n = np.cross(b - a, c2 - a)
    nn2 = n @ n
    nn = np.sqrt(max(nn2, 1e-12))
    n = n / nn
    dd = n @ a
    ee = ((b - a) @ (b - a)) * ((c2 - a) @ (c2 - a))
    ok = nn2 > 1e-12 * max(ee, 1e-12)
    return (-n if dd < 0 else n), abs(dd), ok, dd


for it in range(EPA_ITERS):
    N = np.zeros((EPA_FACES, 3))
    D = np.full(EPA_FACES, 1e10)
    RAWD = np.zeros(EPA_FACES)
    for fi in range(EPA_FACES):
        if alive[fi]:
            n, dd, ok, rawd = face_geom(F[fi])
            N[fi] = n
            RAWD[fi] = rawd
            if ok:
                D[fi] = dd
    fi = int(np.argmin(D))
    n = N[fi]
    w, a, b = sup(n)
    improve = n @ w - D[fi]
    print(f"it {it}: minface {fi} d={D[fi]:.6f} rawd={RAWD[fi]:+.2e} "
          f"improve={improve:.2e} nvert={nvert} nface={int(alive.sum())}")
    if improve < 1e-9 or nvert >= EPA_VERTS or nface > EPA_FACES - 6:
        print("STOP")
        break
    vis = alive & (N @ w > D + 1e-12)
    vis[fi] = True
    E = np.concatenate([F[:, [0, 1]], F[:, [1, 2]], F[:, [2, 0]]], 0)
    evis = np.concatenate([vis, vis, vis], 0)
    code = E[:, 0] * EPA_VERTS + E[:, 1]
    rcode = E[:, 1] * EPA_VERTS + E[:, 0]
    has_rev = np.array([np.any((code == rc) & evis) for rc in rcode])
    horizon = evis & ~has_rev
    vi = nvert
    V[vi] = w
    alive = alive & ~vis
    nh = 0
    for i in np.where(horizon)[0]:
        slot = int(np.argmin(alive))
        F[slot] = [E[i, 0], E[i, 1], vi]
        alive[slot] = True
        nh += 1
        nface += 1
    nvert += 1
    # check dup vertex
    dmin = np.min(np.sum((V[:vi] - w) ** 2, 1))
    print(f"   added v{vi} w={w} dupdist={np.sqrt(dmin):.2e} horizon={nh}")

# final readout
D = np.full(EPA_FACES, 1e10)
N = np.zeros((EPA_FACES, 3))
for fi in range(EPA_FACES):
    if alive[fi]:
        n, dd, ok, _ = face_geom(F[fi])
        N[fi] = n
        if ok:
            D[fi] = dd
fi = int(np.argmin(D))
print("final: face", fi, "depth", D[fi], "normal", N[fi],
      "ndot", N[fi] @ c.frame[:3])
