"""Convex-convex narrowphase: GJK distance + EPA penetration, jittable.

The reference gets arbitrary convex collision (mesh-mesh, cylinder-mesh,
box-mesh, ...) from MuJoCo's convex collider (`mj_step` at reference
`loco_mujoco/environments/base.py:180`; MuJoCo's native GJK/EPA pipeline —
the `mjc_Convex` family). These pairs only activate in falls/flailing
(self-collision of limb hulls), so they sit OFF the hot gait path; this
module supplies the capability for the staged collision driver with
fixed-shape, masked control flow so it stays jit/vmap-compatible.

Algorithm (the standard formulation MuJoCo's nativeccd also follows):

* GJK over the Minkowski difference with support tracking on both shapes;
  the distance subalgorithm is the signed-volumes method over the 1/2/3/4
  simplex cases, returning barycentric weights so witness points on A and
  B fall out directly.
* Shapes with a radius margin (sphere = point + r, capsule = segment + r)
  run GJK on the CORE shape: the cores essentially never interpenetrate,
  so the witness distance minus radii is the exact signed contact depth —
  no EPA needed on those pairs.
* When the cores do overlap (mesh-mesh, box-mesh, cylinder-mesh), EPA
  expands the terminal GJK simplex into a polytope of static capacity
  (EPA_VERTS/EPA_FACES, masked liveness) and returns the closest-face
  normal/depth plus witnesses via the face barycentrics.

Outputs follow the MuJoCo contact convention: `dist` signed (< 0 =
penetrating), `normal` points from geom1 toward geom2 (frame x-axis),
`pos` is the midpoint between the two surface witness points.

Accuracy is convergence-bound (GJK_ITERS/EPA_ITERS, tolerance ~1e-8 in
f64): tests/test_gjk.py measures pos/normal/depth against MuJoCo's own
colliders via `mj_collision` on randomized deep-contact fixtures.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

GJK_ITERS = 48
EPA_ITERS = 48
EPA_VERTS = 5 + EPA_ITERS
EPA_FACES = 128
# engine budgets (ops/collision._convex_narrow, f64 parity path only —
# the f32 Pallas path censors convex slots). EPA cost scales ~
# iters * faces^2 (horizon edge parity); (32, 32, 96) measures
# IDENTICAL normal/depth quality to the full (48, 48, 128) budgets on
# the H1 arm-cylinder/torso-mesh regression frames (nangle max 1.2e-4,
# depth err 1.4e-9 vs the ccd-converged oracle) at 2.3x less cost.
# Smaller face budgets (64) leave rare catastrophic outliers: EPA stops
# on the face cap before the smooth-surface polytope localizes the
# normal.
ENGINE_GJK_ITERS = 32
ENGINE_EPA_ITERS = 32
ENGINE_EPA_FACES = 96
_EPS = 1e-12
_BIG = 1e10


def _tols(dtype):
    """Dtype-scaled convergence tolerances.

    The f64 values are the proven-stable constants; in lower precision
    they sit below representable resolution, so each is floored by a
    multiple of the dtype eps (f32 production runs would otherwise
    never trigger the overlap/EPA branches).
    """
    eps = float(jnp.finfo(dtype).eps)
    return dict(
        overlap=max(1e-16, (100 * eps) ** 2),  # |v|^2: origin reached
        prog=max(1e-10, 30 * eps),             # GJK relative progress
        epa_rel=max(1e-6, 200 * eps),          # EPA relative improvement
        epa_abs=max(1e-9, 10 * eps),           # EPA absolute improvement
    )


# ---------------------------------------------------------------------------
# support maps (local frame); a geom is (verts, vertmask, radius, kind)
# ---------------------------------------------------------------------------
# kind 0: vertex cloud (mesh hull, box corners, capsule segment, sphere
#         center) — support = masked argmax over verts
# kind 1: cylinder (verts[0] = (radius, half_height, 0)) — rim support
#         snapped to CYL_SEGS discrete angles, i.e. the support map of
#         the inscribed CYL_SEGS-gon prism. A smooth analytic rim makes
#         EPA non-convergent: every polytope expansion yields a fresh
#         near-duplicate rim vertex whose sliver faces corrupt the depth
#         readout (MuJoCo's convex pipeline likewise polygonalizes).
#         Depth error vs the smooth cylinder is r*(1-cos(pi/CYL_SEGS))
#         ~ 5e-4*r, far inside solver-impact tolerance.
KIND_VERTS = 0
KIND_CYLINDER = 1
CYL_SEGS = 96
# engine snap: effectively smooth (depth bias r*(1-cos(pi/segs)) ~ 7e-8*r,
# below oracle-parity resolution). Shallow in-engine penetrations terminate
# EPA after 1-3 expansions via the relative stop, so the sliver risk that
# motivates the coarse test-fixture snap never materializes there.
ENGINE_CYL_SEGS = 8192


def support_local(d, verts, vertmask, kind, cyl_segs=CYL_SEGS):
    """Support point of the core shape for direction d (local frame).

    cyl_segs=None gives the ANALYTIC smooth cylinder rim (safe only
    outside EPA's polytope machinery — used by the post-EPA normal
    refinement, which merely evaluates supports)."""
    if kind == KIND_CYLINDER:
        r, h = verts[0, 0], verts[0, 1]
        dxy = d[:2]
        n = jnp.sqrt(jnp.sum(dxy * dxy))
        if cyl_segs is None:
            rim = dxy / jnp.maximum(n, _EPS) * r
        else:
            step = 2.0 * np.pi / cyl_segs
            theta = jnp.round(jnp.arctan2(d[1], d[0]) / step) * step
            rim = r * jnp.stack([jnp.cos(theta), jnp.sin(theta)])
        xy = jnp.where(n > _EPS, rim, 0.0)
        z = jnp.where(d[2] >= 0, h, -h)
        return jnp.concatenate([xy, z[None]])
    dots = verts @ d
    dots = jnp.where(vertmask, dots, -_BIG)
    i = jnp.argmax(dots)
    return verts[i]


def make_world_support(verts, vertmask, kind, pos, mat, cyl_segs=CYL_SEGS):
    """World-frame support map s(d) for one geom."""

    def s(d):
        dl = mat.T @ d
        return pos + mat @ support_local(
            dl, verts, vertmask, kind, cyl_segs=cyl_segs
        )

    return s


# ---------------------------------------------------------------------------
# signed-volumes distance subalgorithm
# ---------------------------------------------------------------------------
def _closest_simplex(W, k):
    """Closest point of conv(W[:k]) to the origin.

    W: (4, 3) simplex vertices (Minkowski difference points), k in {1..4}
    static. Returns (lam (4,), new_k, keep (4,) bool): barycentric weights
    over the RETAINED vertices (zeros elsewhere), the retained count, and
    which slots survive. Degenerate cases fall back to the best vertex.
    """
    if k == 1:
        lam = jnp.array([1.0, 0.0, 0.0, 0.0], W.dtype)
        return lam, 1, jnp.array([True, False, False, False])

    if k == 2:
        a, b = W[0], W[1]
        ab = b - a
        t = -jnp.dot(a, ab) / jnp.maximum(jnp.dot(ab, ab), _EPS)
        t = jnp.clip(t, 0.0, 1.0)
        lam = jnp.array([0.0, 0.0, 0.0, 0.0], W.dtype)
        lam = lam.at[0].set(1 - t).at[1].set(t)
        keep = jnp.array([True, True, False, False]) & (
            jnp.array([1 - t, t, 0.0, 0.0]) > 0
        )
        # always keep at least vertex of max weight
        keep = keep.at[jnp.argmax(lam)].set(True)
        return lam, 2, keep

    if k == 3:
        a, b, c = W[0], W[1], W[2]
        n = jnp.cross(b - a, c - a)
        nn = jnp.dot(n, n)
        # foot of the origin on the plane; barycentric via signed sub-areas
        p = n * (jnp.dot(a, n) / jnp.maximum(nn, _EPS))
        # areas
        u = jnp.dot(jnp.cross(b - p, c - p), n)
        v = jnp.dot(jnp.cross(c - p, a - p), n)
        w = jnp.dot(jnp.cross(a - p, b - p), n)
        s = u + v + w
        inside = (u >= 0) & (v >= 0) & (w >= 0) & (nn > _EPS)
        lam_face = jnp.array([u, v, w, 0.0], W.dtype) / jnp.maximum(
            jnp.abs(s), _EPS
        )

        # otherwise: best of the three edges
        def edge(i, j):
            ai, aj = W[i], W[j]
            e = aj - ai
            t = jnp.clip(
                -jnp.dot(ai, e) / jnp.maximum(jnp.dot(e, e), _EPS), 0.0, 1.0
            )
            pt = ai + t * e
            lam = jnp.zeros(4, W.dtype).at[i].set(1 - t).at[j].set(t)
            return jnp.dot(pt, pt), lam

        d01, l01 = edge(0, 1)
        d02, l02 = edge(0, 2)
        d12, l12 = edge(1, 2)
        dists = jnp.stack([d01, d02, d12])
        lams = jnp.stack([l01, l02, l12])
        lam_edge = lams[jnp.argmin(dists)]
        lam = jnp.where(inside, lam_face, lam_edge)
        keep = lam > 0
        keep = keep.at[jnp.argmax(lam)].set(True)
        return lam, 3, keep

    # k == 4: origin inside? check against the 4 faces
    a, b, c, d = W[0], W[1], W[2], W[3]

    def face_lam(i, j, l2, m):
        """Closest-on-face lambda for face (i, j, l2) opposite vertex m."""
        Wf = jnp.stack([W[i], W[j], W[l2], jnp.zeros(3, W.dtype)])
        lam_f, _, _ = _closest_simplex(Wf, 3)
        lam = jnp.zeros(4, W.dtype)
        lam = lam.at[i].set(lam_f[0]).at[j].set(lam_f[1]).at[l2].set(lam_f[2])
        return lam

    # signed volume test: origin vs each face
    def signed(i, j, l2, m):
        n = jnp.cross(W[j] - W[i], W[l2] - W[i])
        return jnp.dot(n, -W[i]) * jnp.dot(n, W[m] - W[i])

    s0 = signed(1, 2, 3, 0)
    s1 = signed(0, 2, 3, 1)
    s2 = signed(0, 1, 3, 2)
    s3 = signed(0, 1, 2, 3)
    inside = (s0 >= 0) & (s1 >= 0) & (s2 >= 0) & (s3 >= 0)

    faces = [(1, 2, 3, 0), (0, 2, 3, 1), (0, 1, 3, 2), (0, 1, 2, 3)]
    lams = jnp.stack([face_lam(*f) for f in faces])  # (4, 4)
    pts = lams @ W  # (4, 3)
    dists = jnp.sum(pts * pts, axis=1)
    lam_out = lams[jnp.argmin(dists)]
    # inside: barycentrics of the ORIGIN (so v = lam @ W = 0 and the
    # caller's overlap test fires); singular tetra falls back to the
    # face solution. Solved in closed form by Cramer's rule on the 4x4
    # system [W.T; 1] lam = [0; 1] — the cofactor of each lam_i against
    # the rhs (0,0,0,1) is the signed volume of the opposite face's
    # tetra with the origin, so lam_i = vol_i / vol_total. Pure
    # arithmetic: jit/TPU-safe in any dtype (jnp.linalg.det/solve lower
    # to LuDecomposition, which the TPU backend rejects for f64).
    def vol3(p, q, r):
        return jnp.dot(p, jnp.cross(q, r))

    # Replacing column i of [[a b c d],[1 1 1 1]] with the rhs and
    # expanding along that column gives cofactor c_i (scalar triple
    # products of the other three vertices, alternating sign); the
    # denominator is their sum.
    c0 = -vol3(b, c, d)
    c1 = vol3(a, c, d)
    c2 = -vol3(a, b, d)
    c3 = vol3(a, b, c)
    detM = c0 + c1 + c2 + c3
    lam_in = jnp.stack([c0, c1, c2, c3]) / jnp.where(
        jnp.abs(detM) > _EPS, detM, 1.0
    )
    ok_in = (jnp.abs(detM) > _EPS) & jnp.all(jnp.isfinite(lam_in))
    lam = jnp.where(inside & ok_in, lam_in, lam_out)
    keep = lam > 0
    keep = keep.at[jnp.argmax(lam)].set(True)
    return lam, 4, keep


def _compact(W, A, B, lam, keep):
    """Move kept simplex slots to the front (stable), zero-weight tail."""
    order = jnp.argsort(jnp.where(keep, 0, 1), stable=True)
    return W[order], A[order], B[order], lam[order], jnp.sum(keep)


# ---------------------------------------------------------------------------
# GJK
# ---------------------------------------------------------------------------
def gjk(support_a, support_b, d0=None, dtype=jnp.float64, iters=GJK_ITERS):
    """GJK on the Minkowski difference A - B.

    Returns dict with: dist (core distance, 0 when overlapping), pa, pb
    (witness points), W/A/B/k (terminal simplex for EPA), overlap (bool).
    """
    d0 = jnp.array([1.0, 0.0, 0.0], dtype) if d0 is None else d0
    tol = _tols(dtype)

    def sup(d):
        a = support_a(d)
        b = support_b(-d)
        return a - b, a, b

    w0, a0, b0 = sup(d0)
    W = jnp.zeros((4, 3), dtype).at[0].set(w0)
    A = jnp.zeros((4, 3), dtype).at[0].set(a0)
    B = jnp.zeros((4, 3), dtype).at[0].set(b0)
    lam = jnp.array([1.0, 0, 0, 0], dtype)
    k = jnp.array(1, jnp.int32)
    v = w0
    done = jnp.array(False)
    overlap = jnp.array(False)

    def body(_, st):
        W, A, B, lam, k, v, done, overlap = st

        def step(W, A, B, lam, k, v, done, overlap):
            d = -v
            w_new, a_new, b_new = sup(d)
            # no progress: support does not get past v -> converged
            prog = jnp.dot(v, v) - jnp.dot(w_new, v)
            stop = prog <= tol["prog"] * jnp.maximum(jnp.dot(v, v), 1.0)
            kidx = jnp.clip(k, 0, 3)
            W2 = W.at[kidx].set(w_new)
            A2 = A.at[kidx].set(a_new)
            B2 = B.at[kidx].set(b_new)
            k2 = jnp.minimum(k + 1, 4)

            # distance subalgorithm at the static max size; the tail
            # slots of smaller simplices hold stale-but-harmless points
            # because _compact keeps live slots in front
            lam4, _, keep4 = _closest_simplex(W2, 4)
            lam3, _, keep3 = _closest_simplex(W2, 3)
            lam2, _, keep2 = _closest_simplex(W2, 2)
            lam_n = jnp.where(
                k2 == 4, lam4, jnp.where(k2 == 3, lam3, lam2)
            )
            keep_n = jnp.where(
                k2 == 4, keep4, jnp.where(k2 == 3, keep3, keep2)
            )
            Wc, Ac, Bc, lamc, kc = _compact(W2, A2, B2, lam_n, keep_n)
            v_new = lamc @ Wc
            ov = jnp.dot(v_new, v_new) < tol["overlap"]
            return (
                Wc, Ac, Bc, lamc, kc.astype(jnp.int32), v_new,
                stop | ov, overlap | ov,
            )

        new = step(W, A, B, lam, k, v, done, overlap)
        return jax.tree_util.tree_map(
            lambda n, o: jnp.where(done, o, n), new,
            (W, A, B, lam, k, v, done, overlap),
        )

    W, A, B, lam, k, v, done, overlap = jax.lax.fori_loop(
        0, iters, body, (W, A, B, lam, k, v, done, overlap)
    )
    pa = lam @ A
    pb = lam @ B
    dist = jnp.sqrt(jnp.maximum(jnp.dot(v, v), 0.0))
    return dict(
        dist=dist, pa=pa, pb=pb, W=W, A=A, B=B, k=k,
        overlap=overlap | (dist < 1e-9),
    )


# ---------------------------------------------------------------------------
# EPA
# ---------------------------------------------------------------------------
def _face_geom(V, tri):
    """Normal (outward-ish, origin-side corrected) + distance of face."""
    a, b, c = V[tri[0]], V[tri[1]], V[tri[2]]
    e1 = b - a
    e2 = c - a
    n = jnp.cross(e1, e2)
    nn2 = jnp.dot(n, n)
    # normalize HONESTLY (clamp only at true zero): the old
    # max(nn2, 1e-12) clamp left thin faces with sub-unit normals,
    # which SCALES DOWN their plane distance d = n.a — the final
    # argmin then preferred them, and improve = n.w - d was
    # self-consistently ~0 at the fake minimum (observed as a 2x depth
    # underestimate with a 0.127-norm normal on the H1 arm contact)
    nn = jnp.sqrt(jnp.maximum(nn2, jnp.finfo(a.dtype).tiny))
    n = n / nn
    d = jnp.dot(n, a)
    # orient away from origin (polytope contains origin)
    flip = d < 0
    # degeneracy is RELATIVE: |e1 x e2| vs |e1||e2| (sin of the edge
    # angle). Smooth supports (cylinder rims) emit near-collinear
    # vertex triples whose sliver faces have unreliable normals and
    # near-zero d — an absolute floor lets them survive and the final
    # argmin then reads a bogus near-zero depth off one of them.
    # Threshold sin > 1e-4: a sliver at sin ~ 1e-6 was observed winning
    # the final argmin with a 0.127-norm "normal" on the H1
    # arm-cylinder contact; faces this thin never carry the true
    # closest feature of a converged polytope.
    ee = jnp.dot(e1, e1) * jnp.dot(e2, e2)
    ok = nn2 > 1e-8 * jnp.maximum(ee, _EPS)
    return jnp.where(flip, -n, n), jnp.abs(d), ok


def epa(support_a, support_b, g, dtype=jnp.float64, iters=EPA_ITERS,
        faces=EPA_FACES):
    """EPA from a terminal GJK state g (overlap case).

    Returns (depth, normal a->b, pa, pb). Fixed-capacity polytope with
    masked face liveness; horizon rebuilt by edge parity (an edge shared
    by exactly one visible face is on the horizon).
    """

    tol = _tols(dtype)
    nverts = 5 + iters

    def sup(d):
        a = support_a(d)
        b = support_b(-d)
        return a - b, a, b

    # --- seed tetrahedron: expand the GJK simplex if degenerate ---------
    V = jnp.zeros((nverts, 3), dtype)
    VA = jnp.zeros((nverts, 3), dtype)
    VB = jnp.zeros((nverts, 3), dtype)
    V = V.at[:4].set(g["W"])
    VA = VA.at[:4].set(g["A"])
    VB = VB.at[:4].set(g["B"])
    k = g["k"]

    # fill missing verts along fixed axes (masked: only used when k < 4)
    axes = jnp.eye(3, dtype=dtype)

    def fill(i, st):
        V, VA, VB = st
        need = i >= k
        d = axes[jnp.clip(i - k, 0, 2)]
        w, a, b = sup(d)
        # nudge duplicates with the opposite direction
        dup = jnp.min(
            jnp.sum((V[:4] - w) ** 2, axis=1)
            + jnp.where(jnp.arange(4) >= i, _BIG, 0.0)
        ) < 1e-18
        w2, a2, b2 = sup(-d)
        w = jnp.where(dup, w2, w)
        a = jnp.where(dup, a2, a)
        b = jnp.where(dup, b2, b)
        V = V.at[i].set(jnp.where(need, w, V[i]))
        VA = VA.at[i].set(jnp.where(need, a, VA[i]))
        VB = VB.at[i].set(jnp.where(need, b, VB[i]))
        return V, VA, VB

    V, VA, VB = jax.lax.fori_loop(0, 4, fill, (V, VA, VB))
    nvert = jnp.array(4, jnp.int32)

    # ensure positive volume ordering (swap 1,2 if needed)
    vol = jnp.dot(
        V[3] - V[0], jnp.cross(V[1] - V[0], V[2] - V[0])
    )
    swap = vol < 0
    V = jnp.where(swap, V.at[1].set(V[2]).at[2].set(V[1]), V)
    VA = jnp.where(swap, VA.at[1].set(VA[2]).at[2].set(VA[1]), VA)
    VB = jnp.where(swap, VB.at[1].set(VB[2]).at[2].set(VB[1]), VB)

    F = jnp.zeros((faces, 3), jnp.int32)
    F = F.at[:4].set(
        jnp.array([[0, 1, 2], [0, 3, 1], [0, 2, 3], [1, 3, 2]], jnp.int32)
    )
    alive = jnp.zeros(faces, bool).at[:4].set(True)
    nface = jnp.array(4, jnp.int32)

    def face_vals(V, F, alive):
        n, d, ok = jax.vmap(lambda tri: _face_geom(V, tri))(F)
        d = jnp.where(alive & ok, d, _BIG)
        return n, d

    def body(_, st):
        V, VA, VB, F, alive, nvert, nface, done = st

        def step(V, VA, VB, F, alive, nvert, nface, done):
            N, D = face_vals(V, F, alive)
            fi = jnp.argmin(D)
            n = N[fi]
            w, a, b = sup(n)
            improve = jnp.dot(n, w) - D[fi]
            # the improvement bound must be RELATIVE to the current
            # depth: smooth supports (cylinder rims) keep yielding
            # ~1e-9-improvement vertices that are near-duplicates of
            # existing polytope vertices, and expanding with them
            # spawns sliver faces whose tiny bogus distance the final
            # argmin then reads as the depth. improve upper-bounds the
            # remaining depth error, so rel 1e-6 is far inside the
            # oracle-parity tolerance.
            stop = (
                improve < jnp.maximum(tol["epa_abs"], tol["epa_rel"] * D[fi])
            ) | (nvert >= nverts) | (nface > faces - 2 * 3)

            # visible faces from w (strictly): n_f . w > d_f
            vis = alive & (jnp.sum(N * w[None], axis=1) > D + 1e-12)
            vis = vis.at[fi].set(alive[fi] & vis[fi] | alive[fi])
            # horizon edges: edges of visible faces shared by 0 visible
            # neighbors. Count directed edges of visible faces; an edge
            # (u, v) is on the horizon iff its reverse (v, u) is NOT a
            # visible-face edge.
            e0 = jnp.stack([F[:, 0], F[:, 1]], 1)
            e1 = jnp.stack([F[:, 1], F[:, 2]], 1)
            e2 = jnp.stack([F[:, 2], F[:, 0]], 1)
            E = jnp.concatenate([e0, e1, e2], 0)  # (3M, 2)
            evis = jnp.concatenate([vis, vis, vis], 0)
            code = E[:, 0] * nverts + E[:, 1]
            rcode = E[:, 1] * nverts + E[:, 0]
            # is the reversed edge present among visible edges?
            has_rev = jnp.any(
                (code[None, :] == rcode[:, None]) & evis[None, :], axis=1
            )
            horizon = evis & ~has_rev  # (3M,)

            # add vertex
            vi = jnp.clip(nvert, 0, nverts - 1)
            V2 = V.at[vi].set(w)
            VA2 = VA.at[vi].set(a)
            VB2 = VB.at[vi].set(b)

            # kill visible faces; append one new face per horizon edge.
            # Vectorized rank-matching replaces the old sequential
            # first-dead-slot scan (identical placement: the r-th horizon
            # edge lands in the r-th dead slot, same capacity guard).
            alive2 = alive & ~vis
            erank = jnp.cumsum(horizon.astype(jnp.int32)) * horizon
            use = horizon & (nface + erank - 1 < faces)
            dead = ~alive2
            drank = jnp.cumsum(dead.astype(jnp.int32)) * dead
            # (3M, M) one-hot: edge i -> slot j when ranks match
            M = use[:, None] & dead[None, :] & (
                erank[:, None] == drank[None, :]
            )
            placed = jnp.any(M, axis=1)  # (3M,) edge got a slot
            taken = jnp.any(M, axis=0)  # (M,) slot filled
            tri_new = jnp.stack(
                [E[:, 0], E[:, 1], jnp.full((3 * faces,), 0, jnp.int32)],
                axis=1,
            ).at[:, 2].set(vi)  # (3M, 3)
            Fnew = M.astype(jnp.int32).T @ tri_new  # (M, 3) one-hot pick
            F2 = jnp.where(taken[:, None], Fnew, F)
            alive2 = alive2 | taken
            nface2 = nface + jnp.sum(
                (placed & use).astype(jnp.int32)
            ).astype(jnp.int32)
            # on the convergence iteration, keep the polytope UNCHANGED:
            # the new vertex is coplanar with the min face, and expanding
            # with it spawns sliver faces with d ~ 0 that the final
            # readout would pick as a bogus zero depth
            out = (V2, VA2, VB2, F2, alive2, nvert + 1, nface2, stop)
            old = (V, VA, VB, F, alive, nvert, nface, stop)
            return jax.tree_util.tree_map(
                lambda n_, o_: jnp.where(stop, o_, n_), out, old
            )

        new = step(V, VA, VB, F, alive, nvert, nface, done)
        return jax.tree_util.tree_map(
            lambda n_, o_: jnp.where(done, o_, n_), new,
            (V, VA, VB, F, alive, nvert, nface, done),
        )

    V, VA, VB, F, alive, nvert, nface, _ = jax.lax.fori_loop(
        0, iters, body,
        (V, VA, VB, F, alive, nvert, nface, jnp.array(False)),
    )

    N, D = face_vals(V, F, alive)
    fi = jnp.argmin(D)
    n = N[fi]
    depth = D[fi]
    # witnesses: project origin on the face -> barycentrics
    tri = F[fi]
    Wf = jnp.stack([V[tri[0]], V[tri[1]], V[tri[2]], jnp.zeros(3, dtype)])
    lam, _, _ = _closest_simplex(Wf, 3)
    pa = lam[0] * VA[tri[0]] + lam[1] * VA[tri[1]] + lam[2] * VA[tri[2]]
    pb = lam[0] * VB[tri[0]] + lam[1] * VB[tri[1]] + lam[2] * VB[tri[2]]
    # every-face-degenerate fallback (flat/point Minkowski difference,
    # e.g. coincident sphere centers): D is all _BIG, which would read
    # out as depth 1e10 and inject a catastrophic contact force. Fall
    # back to a bounded zero-depth contact at the GJK witness instead.
    bad = depth > 0.5 * _BIG
    depth = jnp.where(bad, 0.0, depth)
    n = jnp.where(bad, jnp.array([0.0, 0.0, 1.0], dtype), n)
    pa = jnp.where(bad, g["pa"], pa)
    pb = jnp.where(bad, g["pb"], pb)
    return depth, n, pa, pb


# ---------------------------------------------------------------------------
# post-EPA normal refinement
# ---------------------------------------------------------------------------
_REFINE_STEPS = (1e-2, 3e-3, 1e-3, 3e-4, 1e-4, 3e-5, 1e-5)


def _refine_normal(sup, n0, d0, dtype, rounds=8):
    """Polish the penetration direction on SMOOTH feature contacts.

    h(n) = n . (supA(n) - supB(-n)) upper-bounds the penetration depth
    for every unit n, with equality at the true minimal-translation
    direction; its spherical gradient is the TANGENTIAL component of
    the support difference w(n) (envelope theorem). EPA's argmin-face
    normal carries an O(sqrt(epa_rel)) angular error because h is
    second-order flat around the optimum — visible as ~1e-3 rad normal
    noise on cylinder-lateral contacts while the depth itself is
    1e-7-converged, and as a ~2e-7/step qpos drift against the
    ccd-converged oracle.

    Monotone greedy descent: each round evaluates h along -grad at a
    geometric step ladder and jumps to the best direction seen. A
    damped fixed point on normalize(w) does NOT work here: w's
    tangential part is feature-offset-sized (not depth-sized), so the
    iterates overshoot and best-tracking freezes at n0 (measured).

    best_h starts at +inf, not EPA's depth: EPA converges FROM BELOW,
    so a budget-capped EPA depth is an under-estimate no true upper
    bound can beat — seeding it froze the refinement at unconverged
    answers. On polyhedral contacts (supports jump, h piecewise
    linear) the descent simply returns (about) EPA's answer."""
    del d0
    # n0 can arrive non-unit (an EPA face whose normal barely passed the
    # degeneracy clamp); a non-unit start corrupts every h comparison
    n0 = n0 / jnp.sqrt(jnp.maximum(jnp.dot(n0, n0), _EPS))

    def h_of(n):
        w, _, _ = sup(n)
        return jnp.dot(n, w), w

    h0, w0 = h_of(n0)

    def body(_, st):
        n, w, best_n, best_h = st
        g = w - jnp.dot(n, w) * n
        g = g / jnp.sqrt(jnp.maximum(jnp.dot(g, g), _EPS))
        for s in _REFINE_STEPS:
            c = n - s * g
            c = c / jnp.sqrt(jnp.maximum(jnp.dot(c, c), _EPS))
            hc, wc = h_of(c)
            better = hc < best_h
            best_n = jnp.where(better, c, best_n)
            best_h = jnp.where(better, hc, best_h)
        hn, wn = h_of(best_n)
        return best_n, wn, best_n, best_h

    _, _, best_n, best_h = jax.lax.fori_loop(
        0, rounds, body, (n0, w0, n0, h0)
    )

    # crease-following polish: near the optimum h(n) is a sharp
    # V-crease — the support vertex on the polyhedral side switches
    # across it (measured wall gradients ~0.1 while the minimum lies
    # ALONG the crease at ~1e-5 slope). Discrete direction sampling
    # (compass search) cannot track it: at 12-direction granularity the
    # wall contamination sin(15deg)*0.1*r dwarfs the crease descent.
    # Instead, recover the crease direction from the support geometry:
    # the crease is the level set of f(n) = n . dv (dv = the difference
    # between the two switching support points), so its tangent is
    # cross(n, dv). Line-search along +-that direction; monotone via
    # best-tracking. Probes on BOTH shapes cover whichever side is
    # polyhedral; when no switch is found (smooth-smooth or already at
    # a point optimum) the candidates simply do not improve.
    probe = 1e-3
    ladder = (3e-4, 1e-4, 3e-5, 1e-5, 3e-6, 1e-6)

    def crease_round(_, st):
        n, best_n, best_h = st
        ax = jnp.where(
            jnp.abs(n[1]) < 0.5,
            jnp.array([0.0, 1.0, 0.0], dtype),
            jnp.array([0.0, 0.0, 1.0], dtype),
        )
        t1 = ax - n * jnp.dot(n, ax)
        t1 = t1 / jnp.sqrt(jnp.maximum(jnp.dot(t1, t1), _EPS))
        t2 = jnp.cross(n, t1)
        _, pa0, pb0 = sup(n)
        diffs = []
        for t in (t1, -t1, t2, -t2):
            c = n + probe * t
            c = c / jnp.sqrt(jnp.maximum(jnp.dot(c, c), _EPS))
            _, pat, pbt = sup(c)
            diffs.append(pat - pa0)
            diffs.append(pbt - pb0)
        D8 = jnp.stack(diffs)  # (8, 3)
        norms = jnp.sum(D8 * D8, axis=1)
        dv = D8[jnp.argmax(norms)]
        tc = jnp.cross(n, dv)
        tcn = jnp.sqrt(jnp.maximum(jnp.dot(tc, tc), _EPS))
        tc = tc / tcn
        for s_ in ladder:
            for sgn in (1.0, -1.0):
                c = n + sgn * s_ * tc
                c = c / jnp.sqrt(jnp.maximum(jnp.dot(c, c), _EPS))
                hc, _ = h_of(c)
                better = hc < best_h
                best_n = jnp.where(better, c, best_n)
                best_h = jnp.where(better, hc, best_h)
        return best_n, best_n, best_h

    _, best_n, best_h = jax.lax.fori_loop(
        0, 6, crease_round, (best_n, best_n, best_h)
    )
    return best_n, best_h


# ---------------------------------------------------------------------------
# public entry
# ---------------------------------------------------------------------------
def convex_contact(
    verts1, mask1, r1, kind1, pos1, mat1,
    verts2, mask2, r2, kind2, pos2, mat2,
    gjk_iters=GJK_ITERS, epa_iters=EPA_ITERS, epa_faces=EPA_FACES,
    cyl_segs=CYL_SEGS,
):
    """Single contact between two convex geoms (MuJoCo conventions).

    verts*: (V, 3) local core vertices (see support_local for kinds);
    r*: radius margin (sphere/capsule cores). Returns (dist, pos, normal):
    dist signed (< 0 penetrating, includes radii), normal from geom1
    toward geom2, pos the surface midpoint.
    """
    dtype = verts1.dtype
    sa = make_world_support(verts1, mask1, kind1, pos1, mat1,
                            cyl_segs=cyl_segs)
    sb = make_world_support(verts2, mask2, kind2, pos2, mat2,
                            cyl_segs=cyl_segs)
    d0 = pos2 - pos1
    d0 = jnp.where(
        jnp.sum(d0 * d0) > _EPS, d0, jnp.array([1.0, 0, 0], dtype)
    )
    g = gjk(sa, sb, d0=d0, dtype=dtype, iters=gjk_iters)

    def separated():
        v = g["pb"] - g["pa"]
        nv = jnp.sqrt(jnp.maximum(jnp.sum(v * v), _EPS))
        n = v / nv
        dist = nv - r1 - r2
        pa_s = g["pa"] + n * r1
        pb_s = g["pb"] - n * r2
        return dist, 0.5 * (pa_s + pb_s), n

    def penetrating():
        depth, n, pa, pb = epa(
            sa, sb, g, dtype=dtype, iters=epa_iters, faces=epa_faces
        )

        # the refinement evaluates supports only (no polytope), so it
        # can use the ANALYTIC smooth cylinder — the snapped rim would
        # quantize h(n) at the facet resolution (pi/cyl_segs rad) and
        # floor the refined normal there
        sa_s = make_world_support(verts1, mask1, kind1, pos1, mat1,
                                  cyl_segs=None)
        sb_s = make_world_support(verts2, mask2, kind2, pos2, mat2,
                                  cyl_segs=None)

        def supm(d):
            a = sa_s(d)
            b = sb_s(-d)
            return a - b, a, b

        n, depth = _refine_normal(supm, n, depth, dtype)
        dist = -depth - r1 - r2
        pa_s = pa + n * r1
        pb_s = pb - n * r2
        return dist, 0.5 * (pa_s + pb_s), n

    dist_s, pos_s, n_s = separated()
    dist_p, pos_p, n_p = penetrating()
    ov = g["overlap"]
    return (
        jnp.where(ov, dist_p, dist_s),
        jnp.where(ov, pos_p, pos_s),
        jnp.where(ov, n_p, n_s),
    )
