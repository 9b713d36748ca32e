"""Convex narrowphase (ops/gjk.py) vs the MuJoCo oracle.

The reference relies on MuJoCo's convex collider for every mesh/cylinder
self-collision pair (reference `environments/base.py:180` via mj_step);
these are exactly the pair types the acceptance harness counts as
"unsupported-pair truncations". This test measures our GJK/EPA contact
(dist, pos, normal) directly against `mj_collision` output on randomized
two-geom fixtures covering the pair census from the humanoid/H1/G1 falls:
MESH-MESH, CYLINDER-MESH, BOX-MESH, SPHERE-MESH, CAPSULE-MESH,
CYLINDER-CYLINDER.
"""

import jax
import jax.numpy as jnp
import mujoco
import numpy as np
import pytest

jax.config.update("jax_enable_x64", True)

from loco_mujoco_tpu.ops import gjk

# a convex octahedron-ish hull (scaled, non-symmetric to avoid flat-flat
# ambiguity in randomized poses)
_HULL = np.array(
    [
        [0.09, 0.0, 0.0], [-0.07, 0.0, 0.0],
        [0.0, 0.11, 0.0], [0.0, -0.05, 0.0],
        [0.0, 0.0, 0.08], [0.0, 0.0, -0.06],
        [0.05, 0.05, 0.04], [-0.04, -0.03, -0.05],
    ]
)


def _mesh_xml():
    v = " ".join(f"{x:.6f}" for x in _HULL.ravel())
    return f'<mesh name="hull" vertex="{v}"/>'


_GEOMS = {
    "mesh": '<geom type="mesh" mesh="hull"/>',
    "box": '<geom type="box" size="0.06 0.08 0.05"/>',
    "sphere": '<geom type="sphere" size="0.07"/>',
    "capsule": '<geom type="capsule" size="0.04 0.08"/>',
    "cylinder": '<geom type="cylinder" size="0.05 0.07"/>',
}


def _model(t1, t2):
    xml = f"""
    <mujoco>
      <asset>{_mesh_xml()}</asset>
      <worldbody>
        <body name="b1"><freejoint/>{_GEOMS[t1]}</body>
        <body name="b2"><freejoint/>{_GEOMS[t2]}</body>
      </worldbody>
    </mujoco>"""
    return mujoco.MjModel.from_xml_string(xml)


def _geom_args(m, gid, dtype=np.float64):
    """(verts, mask, radius, kind) for gjk.convex_contact from MjModel."""
    t = m.geom_type[gid]
    size = m.geom_size[gid]
    if t == mujoco.mjtGeom.mjGEOM_MESH:
        mid = m.geom_dataid[gid]
        adr, num = m.mesh_vertadr[mid], m.mesh_vertnum[mid]
        verts = np.asarray(m.mesh_vert[adr:adr + num], dtype)
        return verts, np.ones(len(verts), bool), 0.0, gjk.KIND_VERTS
    if t == mujoco.mjtGeom.mjGEOM_BOX:
        sx, sy, sz = size
        corners = np.array(
            [[x, y, z] for x in (-sx, sx) for y in (-sy, sy)
             for z in (-sz, sz)], dtype
        )
        return corners, np.ones(8, bool), 0.0, gjk.KIND_VERTS
    if t == mujoco.mjtGeom.mjGEOM_SPHERE:
        return (np.zeros((1, 3), dtype), np.ones(1, bool), float(size[0]),
                gjk.KIND_VERTS)
    if t == mujoco.mjtGeom.mjGEOM_CAPSULE:
        seg = np.array([[0, 0, -size[1]], [0, 0, size[1]]], dtype)
        return seg, np.ones(2, bool), float(size[0]), gjk.KIND_VERTS
    if t == mujoco.mjtGeom.mjGEOM_CYLINDER:
        v = np.zeros((1, 3), dtype)
        v[0, 0], v[0, 1] = size[0], size[1]
        return v, np.ones(1, bool), 0.0, gjk.KIND_CYLINDER
    raise NotImplementedError(t)


def _rand_quat(rng):
    q = rng.normal(size=4)
    return q / np.linalg.norm(q)


def _collect(t1, t2, n_cfg=60, seed=0):
    """Run oracle + ours over random near/penetrating poses."""
    m = _model(t1, t2)
    d = mujoco.MjData(m)
    rng = np.random.default_rng(seed)
    rows = []
    fn = jax.jit(gjk.convex_contact, static_argnums=(3, 9))
    for _ in range(n_cfg):
        d.qpos[:3] = 0.0
        d.qpos[3:7] = _rand_quat(rng)
        d.qpos[7:10] = rng.uniform(-0.08, 0.08, 3)
        d.qpos[10:14] = _rand_quat(rng)
        mujoco.mj_forward(m, d)
        if d.ncon == 0:
            continue
        c = d.contact[0]
        g1, g2 = int(c.geom1), int(c.geom2)
        a1 = _geom_args(m, g1)
        a2 = _geom_args(m, g2)
        dist, pos, normal = fn(
            jnp.asarray(a1[0]), jnp.asarray(a1[1]), a1[2], a1[3],
            jnp.asarray(d.geom_xpos[g1]),
            jnp.asarray(d.geom_xmat[g1].reshape(3, 3)),
            jnp.asarray(a2[0]), jnp.asarray(a2[1]), a2[2], a2[3],
            jnp.asarray(d.geom_xpos[g2]),
            jnp.asarray(d.geom_xmat[g2].reshape(3, 3)),
        )
        rows.append(
            (
                float(c.dist), float(dist),
                # np.array COPIES: c.pos / c.frame are views into MjData's
                # contact buffer, overwritten by the next mj_forward
                np.array(c.pos), np.asarray(pos),
                np.array(c.frame[:3]), np.asarray(normal),
            )
        )
    assert len(rows) >= 10, f"{t1}-{t2}: too few contact configs"
    return rows


PAIRS = [
    ("mesh", "mesh"),
    ("cylinder", "mesh"),
    ("box", "mesh"),
    ("sphere", "mesh"),
    ("capsule", "mesh"),
    ("cylinder", "cylinder"),
]


@pytest.mark.parametrize("t1,t2", PAIRS)
def test_convex_contact_vs_oracle(t1, t2):
    rows = _collect(t1, t2)
    derr = np.array([abs(o - u) for o, u, *_ in rows])
    ndot = np.array(
        [float(np.dot(on, un)) for _, _, _, _, on, un in rows]
    )
    perr = np.array(
        [np.linalg.norm(op - up) for _, _, op, up, _, _ in rows]
    )
    # depth: convergence-bound agreement on at least 90% of configs;
    # the tail covers nearly-parallel face-face poses where the closest
    # feature is ambiguous at oracle tolerance
    assert np.quantile(derr, 0.9) < 5e-4, (
        f"{t1}-{t2} depth q90 {np.quantile(derr, 0.9):.2e} "
        f"max {derr.max():.2e}"
    )
    assert np.median(derr) < 5e-5, f"{t1}-{t2} depth med {np.median(derr):.2e}"
    assert np.quantile(ndot, 0.1) > 0.99, (
        f"{t1}-{t2} normal q10 {np.quantile(ndot, 0.1):.4f}"
    )
    assert np.median(perr) < 5e-3, f"{t1}-{t2} pos med {np.median(perr):.2e}"


@pytest.mark.parametrize("t1,t2", [("mesh", "mesh"), ("cylinder", "mesh")])
def test_convex_contact_f32(t1, t2):
    """Production-dtype leg: tolerances are dtype-scaled (ops/gjk._tols),
    so the overlap/EPA branches must still trigger in f32."""
    m = _model(t1, t2)
    d = mujoco.MjData(m)
    rng = np.random.default_rng(7)
    fn = jax.jit(gjk.convex_contact, static_argnums=(3, 9))
    derr, ndot = [], []
    for _ in range(40):
        d.qpos[:3] = 0.0
        d.qpos[3:7] = _rand_quat(rng)
        d.qpos[7:10] = rng.uniform(-0.08, 0.08, 3)
        d.qpos[10:14] = _rand_quat(rng)
        mujoco.mj_forward(m, d)
        if d.ncon == 0:
            continue
        c = d.contact[0]
        g1, g2 = int(c.geom1), int(c.geom2)
        a1 = _geom_args(m, g1, np.float32)
        a2 = _geom_args(m, g2, np.float32)
        f32 = np.float32
        dist, pos, normal = fn(
            jnp.asarray(a1[0]), jnp.asarray(a1[1]), a1[2], a1[3],
            jnp.asarray(d.geom_xpos[g1], f32),
            jnp.asarray(d.geom_xmat[g1].reshape(3, 3), f32),
            jnp.asarray(a2[0]), jnp.asarray(a2[1]), a2[2], a2[3],
            jnp.asarray(d.geom_xpos[g2], f32),
            jnp.asarray(d.geom_xmat[g2].reshape(3, 3), f32),
        )
        assert np.asarray(dist).dtype == np.float32
        derr.append(abs(float(c.dist) - float(dist)))
        ndot.append(float(np.dot(c.frame[:3], np.asarray(normal))))
    assert len(derr) >= 10
    derr = np.array(derr)
    # f32 bar: penetrating pairs must still resolve (no stalled-GJK
    # zero depths) at f32-resolution accuracy
    assert np.quantile(derr, 0.9) < 5e-3, (
        f"f32 {t1}-{t2} q90 {np.quantile(derr, 0.9):.2e}"
    )
    assert np.median(derr) < 5e-4
    assert np.quantile(np.array(ndot), 0.1) > 0.95


def test_separated_distance_exact():
    """Non-touching mesh-mesh: GJK witness distance vs mj_geomDistance."""
    m = _model("mesh", "mesh")
    d = mujoco.MjData(m)
    rng = np.random.default_rng(3)
    checked = 0
    fn = jax.jit(gjk.convex_contact, static_argnums=(3, 9))
    for _ in range(40):
        d.qpos[:3] = 0.0
        d.qpos[3:7] = _rand_quat(rng)
        d.qpos[7:10] = rng.uniform(0.15, 0.4, 3)
        d.qpos[10:14] = _rand_quat(rng)
        mujoco.mj_forward(m, d)
        fromto = np.zeros(6)
        od = mujoco.mj_geomDistance(m, d, 0, 1, 10.0, fromto)
        if od > 5.0:
            continue
        a1 = _geom_args(m, 0)
        a2 = _geom_args(m, 1)
        dist, _, _ = fn(
            jnp.asarray(a1[0]), jnp.asarray(a1[1]), a1[2], a1[3],
            jnp.asarray(d.geom_xpos[0]),
            jnp.asarray(d.geom_xmat[0].reshape(3, 3)),
            jnp.asarray(a2[0]), jnp.asarray(a2[1]), a2[2], a2[3],
            jnp.asarray(d.geom_xpos[1]),
            jnp.asarray(d.geom_xmat[1].reshape(3, 3)),
        )
        assert abs(float(dist) - od) < 1e-6, (od, float(dist))
        checked += 1
    assert checked >= 10
