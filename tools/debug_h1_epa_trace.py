"""NumPy EPA trace on the saved H1 arm-cylinder/torso-mesh config."""
import jax
import numpy as np

jax.config.update("jax_enable_x64", True)
jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp
import sys
sys.path.insert(0, "/root/repo")
from loco_mujoco_tpu.ops import gjk

z = np.load("/tmp/h1_cfg.npz")
r, hh = float(z["r"]), float(z["hh"])
mverts = z["mverts"]
p4, R4, p8, R8 = z["p4"], z["R4"], z["p8"], z["R8"]
n_o, d_o = z["n_o"], float(z["d_o"])
print("oracle", d_o, n_o)

cyl = np.zeros((1, 3))
cyl[0, 0], cyl[0, 1] = r, hh
SEGS = 8192
sa = gjk.make_world_support(jnp.asarray(cyl), jnp.ones(1, bool),
                            gjk.KIND_CYLINDER, jnp.asarray(p4),
                            jnp.asarray(R4), cyl_segs=SEGS)
sb = gjk.make_world_support(jnp.asarray(mverts), jnp.ones(len(mverts), bool),
                            gjk.KIND_VERTS, jnp.asarray(p8), jnp.asarray(R8))
g = gjk.gjk(sa, sb, d0=jnp.asarray(p8 - p4), dtype=jnp.float64, iters=32)
print("gjk overlap", bool(g["overlap"]), "k", int(g["k"]), "dist",
      float(g["dist"]))
print("W", np.asarray(g["W"]))


def sup(dd):
    a = np.asarray(sa(jnp.asarray(dd)))
    b = np.asarray(sb(jnp.asarray(-dd)))
    return a - b, a, b


EPA_ITERS = 32
EPA_VERTS = 5 + EPA_ITERS
EPA_FACES = 96
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
print("seed vol", vol)
# check origin inside seed tetra
F = np.zeros((EPA_FACES, 3), int)
F[:4] = [[0, 1, 2], [0, 3, 1], [0, 2, 3], [1, 3, 2]]
alive = np.zeros(EPA_FACES, bool)
alive[:4] = True
nvert, nface = 4, 4


def face_geom(tri):
    a, b, c2 = V[tri[0]], V[tri[1]], V[tri[2]]
    e1, e2 = b - a, c2 - a
    n = np.cross(e1, e2)
    nn2 = n @ n
    nn = np.sqrt(max(nn2, 5e-324))
    n = n / nn
    dd = n @ a
    ee = (e1 @ e1) * (e2 @ e2)
    ok = nn2 > 1e-8 * max(ee, 1e-12)
    return (-n if dd < 0 else n), abs(dd), ok, dd


for it in range(EPA_ITERS):
    N = np.zeros((EPA_FACES, 3))
    D = np.full(EPA_FACES, 1e10)
    for fi in range(EPA_FACES):
        if alive[fi]:
            n, dd, ok, rawd = face_geom(F[fi])
            N[fi] = n
            if ok:
                D[fi] = dd
    fi = int(np.argmin(D))
    n = N[fi]
    w, a, b = sup(n)
    improve = n @ w - D[fi]
    tol = max(1e-9, 1e-6 * D[fi])
    print(f"it {it}: minface d={D[fi]:.7f} n={n} improve={improve:.2e}")
    if improve < tol or nvert >= EPA_VERTS or nface > EPA_FACES - 6:
        print("STOP", "tol" if improve < tol else "budget")
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
    for i in np.where(horizon)[0]:
        slot = int(np.argmin(alive))
        F[slot] = [E[i, 0], E[i, 1], vi]
        alive[slot] = True
        nface += 1
    nvert += 1
