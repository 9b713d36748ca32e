"""Host-side model compilation: MJCF XML -> `Model` pytree.

We use the installed `mujoco` package purely as a *host-side MJCF compiler*
(XML parsing, default-class resolution, inertia bookkeeping, muscle
length-range computation) — the same role the reference delegates to it for
its entire physics (reference `requirements.txt:4`). All device compute is
our own JAX pipeline in `loco_mujoco_tpu.ops`.

Also contains the static broadphase: the candidate contact-pair table is
enumerated once at build time (geoms with compatible contype/conaffinity,
excluding same-weld and parent-child pairs), replacing MuJoCo's dynamic
broadphase with a fixed-shape masked narrowphase that XLA can fuse and batch.
"""

from __future__ import annotations

import os
import tempfile
import xml.etree.ElementTree as ET

import jax
import jax.numpy as jnp
import mujoco
import numpy as np

from .types import Contact, Data, GeomType, Model, Option

# number of contact slots generated per (geom-type, geom-type) narrowphase
_PLANE = int(GeomType.PLANE)
_SPHERE = int(GeomType.SPHERE)
_CAPSULE = int(GeomType.CAPSULE)
_CYLINDER = int(GeomType.CYLINDER)
_BOX = int(GeomType.BOX)
_MESH = int(GeomType.MESH)

CONTACT_SLOTS = {
    (_PLANE, _SPHERE): 1,
    (_PLANE, _CAPSULE): 2,
    (_PLANE, _CYLINDER): 4,
    (_PLANE, _BOX): 4,
    (_PLANE, _MESH): 4,
    (_SPHERE, _SPHERE): 1,
    (_SPHERE, _CAPSULE): 1,
    (_SPHERE, _CYLINDER): 1,
    (_SPHERE, _BOX): 1,
    (_CAPSULE, _CAPSULE): 2,
    (_CAPSULE, _BOX): 2,
    (_CAPSULE, _CYLINDER): 1,
    (_BOX, _BOX): 8,
    (_CYLINDER, _CYLINDER): 1,
    (_CYLINDER, _BOX): 1,
    # mesh pairs beyond plane-mesh are approximated by bounding spheres for
    # now (rare: only matters for deep self-collision of visual hulls)
    (_SPHERE, _MESH): 1,
    (_CAPSULE, _MESH): 1,
    (_CYLINDER, _MESH): 1,
    (_BOX, _MESH): 1,
    (_MESH, _MESH): 1,
}


def preprocess_xml(xml_path: str) -> str:
    """Drop assets whose files are missing on disk (visual-only meshes in the
    reference's A1 model) together with geoms referencing them. Returns a path
    to a patched XML (tempfile) or the original path if nothing changed.

    Safe because every robot body carries an explicit <inertial> element, so
    removing a visual geom does not change mass properties.
    """
    tree = ET.parse(xml_path)
    root = tree.getroot()
    base = os.path.dirname(os.path.abspath(xml_path))
    compiler = root.find("compiler")
    meshdir = compiler.get("meshdir", "") if compiler is not None else ""
    texdir = compiler.get("texturedir", meshdir) if compiler is not None else meshdir

    missing_meshes = set()
    changed = False
    for asset in root.findall(".//asset"):
        for mesh in list(asset.findall("mesh")):
            f = mesh.get("file")
            if f and not os.path.exists(os.path.join(base, meshdir, f)):
                name = mesh.get("name") or os.path.splitext(os.path.basename(f))[0]
                missing_meshes.add(name)
                asset.remove(mesh)
                changed = True
        for tex in list(asset.findall("texture")):
            f = tex.get("file")
            if f and not os.path.exists(os.path.join(base, texdir, f)):
                asset.remove(tex)
                changed = True

    if missing_meshes:
        for parent in root.iter():
            for geom in list(parent.findall("geom")):
                if geom.get("mesh") in missing_meshes:
                    parent.remove(geom)

    if not changed:
        return xml_path
    fd, out = tempfile.mkstemp(suffix=".xml", prefix="lmt_", dir=base)
    with os.fdopen(fd, "w") as fh:
        fh.write(ET.tostring(root, encoding="unicode"))
    return out


def load_mj_model(xml_path: str) -> mujoco.MjModel:
    patched = preprocess_xml(xml_path)
    try:
        return mujoco.MjModel.from_xml_path(patched)
    finally:
        if patched != xml_path:
            os.unlink(patched)


def _candidate_pairs(m: mujoco.MjModel):
    """Static broadphase: all geom pairs that MuJoCo could ever collide.

    Mirrors the filtering in MuJoCo's collision driver: exclude same-weld
    pairs, parent-child welds (unless parent is world), and bitmask-
    incompatible pairs. <pair>/<exclude> elements are honored via the
    compiled model's pair/exclude tables.
    """
    pairs = []
    excluded = set()
    for i in range(m.nexclude):
        sig = int(m.exclude_signature[i])
        b1, b2 = sig >> 16, sig & 0xFFFF
        excluded.add((min(b1, b2), max(b1, b2)))

    for g1 in range(m.ngeom):
        for g2 in range(g1 + 1, m.ngeom):
            b1, b2 = int(m.geom_bodyid[g1]), int(m.geom_bodyid[g2])
            w1, w2 = int(m.body_weldid[b1]), int(m.body_weldid[b2])
            if w1 == w2:
                continue
            if (min(b1, b2), max(b1, b2)) in excluded:
                continue
            # parent filter (mjOption.disableflags filterparent on by default)
            wp1 = int(m.body_weldid[m.body_parentid[w1]])
            wp2 = int(m.body_weldid[m.body_parentid[w2]])
            if (w1 == wp2 or w2 == wp1) and w1 != 0 and w2 != 0:
                continue
            ct1, ca1 = int(m.geom_contype[g1]), int(m.geom_conaffinity[g1])
            ct2, ca2 = int(m.geom_contype[g2]), int(m.geom_conaffinity[g2])
            if not ((ct1 & ca2) or (ct2 & ca1)):
                continue
            t1, t2 = int(m.geom_type[g1]), int(m.geom_type[g2])
            # order pair so the smaller type code comes first (plane first)
            if t1 <= t2:
                pairs.append((g1, g2))
            else:
                pairs.append((g2, g1))

    # explicit <pair> elements (add even if filtered above)
    for i in range(m.npair):
        g1, g2 = int(m.pair_geom1[i]), int(m.pair_geom2[i])
        if int(m.geom_type[g1]) > int(m.geom_type[g2]):
            g1, g2 = g2, g1
        if (g1, g2) not in pairs:
            pairs.append((g1, g2))
    return pairs


def _mix_pair_params(m: mujoco.MjModel, g1: int, g2: int):
    """Contact parameter combination, MuJoCo rules (priority/solmix/max)."""
    p1, p2 = int(m.geom_priority[g1]), int(m.geom_priority[g2])
    # margins/gaps ADD across the pair (verified vs oracle includemargin:
    # two geoms with margin 0.001 give a contact includemargin of 0.002)
    margin = float(m.geom_margin[g1]) + float(m.geom_margin[g2])
    gap = float(m.geom_gap[g1]) + float(m.geom_gap[g2])
    if p1 != p2:
        g = g1 if p1 > p2 else g2
        condim = int(m.geom_condim[g])
        fri = m.geom_friction[g].copy()
        solref = m.geom_solref[g].copy()
        solimp = m.geom_solimp[g].copy()
    else:
        condim = max(int(m.geom_condim[g1]), int(m.geom_condim[g2]))
        fri = np.maximum(m.geom_friction[g1], m.geom_friction[g2])
        s1, s2 = float(m.geom_solmix[g1]), float(m.geom_solmix[g2])
        if s1 >= mujoco.mjMINVAL and s2 >= mujoco.mjMINVAL:
            mix = s1 / (s1 + s2)
        elif s1 < mujoco.mjMINVAL and s2 < mujoco.mjMINVAL:
            mix = 0.5
        else:
            mix = 1.0 if s1 >= mujoco.mjMINVAL else 0.0
        if m.geom_solref[g1][0] > 0 and m.geom_solref[g2][0] > 0:
            solref = mix * m.geom_solref[g1] + (1 - mix) * m.geom_solref[g2]
        else:
            solref = np.minimum(m.geom_solref[g1], m.geom_solref[g2])
        solimp = mix * m.geom_solimp[g1] + (1 - mix) * m.geom_solimp[g2]
    friction = np.array([fri[0], fri[0], fri[1], fri[2], fri[2]])
    return condim, friction, solref, solimp, margin, gap


def put_model(m: mujoco.MjModel, dtype=jnp.float32, contact_k_plane=8,
              contact_k_other=4, hull_indices=None) -> Model:
    """Extract a compiled MjModel into our JAX Model pytree.

    hull_indices: DEPRECATED, ignored. Hull topology now always comes from
    MuJoCo's own compiled mesh graph, which is identical across model
    variants built from the same XML (mj_setConst does not recompute it),
    so variant leaf stacking needs no external coordination.
    """

    def jarr(x):
        # numpy here, ONE device_put of the finished pytree below: eager
        # per-field jnp.asarray casts each trigger a tiny XLA compile, which
        # on a tunneled TPU backend costs seconds apiece (~170s per model)
        return np.asarray(np.asarray(x), dtype=np.dtype(dtype))

    # --- contact pair table -------------------------------------------------
    pairs = _candidate_pairs(m)
    npair = len(pairs)
    pair_geom1 = np.zeros(npair, dtype=np.int32)
    pair_geom2 = np.zeros(npair, dtype=np.int32)
    pair_condim = np.zeros(npair, dtype=np.int32)
    pair_friction = np.zeros((npair, 5))
    pair_solref = np.zeros((npair, 2))
    pair_solimp = np.zeros((npair, 5))
    pair_margin = np.zeros(npair)
    pair_gap = np.zeros(npair)
    for i, (g1, g2) in enumerate(pairs):
        condim, fri, sr, si, mg, gp = _mix_pair_params(m, g1, g2)
        pair_geom1[i], pair_geom2[i] = g1, g2
        pair_condim[i] = condim
        pair_friction[i] = fri
        pair_solref[i] = sr
        pair_solimp[i] = si
        pair_margin[i] = mg
        pair_gap[i] = gp

    # --- convex hulls for mesh geoms ---------------------------------------
    # Vertex sets, ordering and adjacency come from MuJoCo's OWN compiled
    # hull graph (mjModel.mesh_graph: numvert, numface, vert_edgeadr,
    # vert_globalid, edge_localid) so the collision driver can reproduce
    # mjc_PlaneConvex's contact selection exactly: support vertex, then its
    # graph neighbors in stored edge order (libmujoco 3.10,
    # mjc_PlaneConvex/addplanemesh). Meshes without a graph or with < 10
    # vertices use MuJoCo's brute path (mjc_initCCDObj gate): all vertices
    # in storage order. hull_indices (deprecated) is ignored — variants
    # compiled from the same XML share the same graph by construction.
    del hull_indices
    mesh_geoms = [g for g in range(m.ngeom) if m.geom_type[g] == _MESH]
    geom_meshid = np.full(m.ngeom, -1, dtype=np.int32)
    hulls, hull_nbrs, hull_brute = [], [], []
    for g in mesh_geoms:
        mid = int(m.geom_dataid[g])
        adr, num = int(m.mesh_vertadr[mid]), int(m.mesh_vertnum[mid])
        verts = np.asarray(m.mesh_vert[adr : adr + num])
        gadr = int(m.mesh_graphadr[mid]) if m.mesh_graph.size else -1
        if gadr >= 0 and num >= 10:
            graph = np.asarray(m.mesh_graph[gadr:])
            nv_h = int(graph[0])
            edgeadr = graph[2 : 2 + nv_h]
            globid = graph[2 + nv_h : 2 + 2 * nv_h]
            edges = graph[2 + 2 * nv_h :]
            nbrs = []
            for i in range(nv_h):
                j = int(edgeadr[i])
                lst = []
                while edges[j] >= 0:
                    lst.append(int(edges[j]))
                    j += 1
                nbrs.append(np.asarray(lst, dtype=np.int32))
            verts = verts[globid]
            brute = False
        else:
            nbrs = None
            brute = True
        geom_meshid[g] = len(hulls)
        hulls.append(verts)
        hull_nbrs.append(nbrs)
        hull_brute.append(brute)
    if hulls:
        maxvert = max(v.shape[0] for v in hulls)
        mesh_vert = np.zeros((len(hulls), maxvert, 3))
        mesh_vertmask = np.zeros((len(hulls), maxvert), dtype=bool)
        # ragged per-mesh adjacency (a dense (ngeom, maxvert, maxdeg) table
        # would be ~100 MB for G1's 5k-vert hulls of degree 98)
        nbr_tables = []
        mesh_brute = np.asarray(hull_brute, dtype=bool)
        for i, v in enumerate(hulls):
            mesh_vert[i, : v.shape[0]] = v
            mesh_vertmask[i, : v.shape[0]] = True
            if hull_nbrs[i] is None:
                nbr_tables.append(None)
            else:
                deg = max(1, max(len(l) for l in hull_nbrs[i]))
                t = np.full((v.shape[0], deg), -1, dtype=np.int32)
                for vi, lst in enumerate(hull_nbrs[i]):
                    t[vi, : len(lst)] = lst
                nbr_tables.append(t)
        mesh_nbr = tuple(nbr_tables)
    else:
        mesh_vert = np.zeros((0, 1, 3))
        mesh_vertmask = np.zeros((0, 1), dtype=bool)
        mesh_nbr = ()
        mesh_brute = np.zeros((0,), dtype=bool)

    # --- tendon site paths ---------------------------------------------------
    if m.ntendon:
        WRAP_SITE = int(mujoco.mjtWrap.mjWRAP_SITE)
        paths, masks = [], []
        maxlen = 0
        for t in range(m.ntendon):
            adr, num = int(m.tendon_adr[t]), int(m.tendon_num[t])
            wtypes = m.wrap_type[adr : adr + num]
            if not all(int(w) == WRAP_SITE for w in wtypes):
                raise NotImplementedError(
                    "only site-path spatial tendons are supported "
                    f"(tendon {t} uses wrap types {wtypes})"
                )
            ids = [int(x) for x in m.wrap_objid[adr : adr + num]]
            paths.append(ids)
            maxlen = max(maxlen, len(ids))
        tendon_site = np.zeros((m.ntendon, maxlen), dtype=np.int32)
        tendon_sitemask = np.zeros((m.ntendon, maxlen), dtype=bool)
        for t, ids in enumerate(paths):
            tendon_site[t, : len(ids)] = ids
            tendon_sitemask[t, : len(ids)] = True
    else:
        tendon_site = np.zeros((0, 2), dtype=np.int32)
        tendon_sitemask = np.zeros((0, 2), dtype=bool)

    # --- name maps -----------------------------------------------------------
    def name_map(n, adr_arr):
        out = {}
        for i in range(n):
            adr = int(adr_arr[i])
            end = m.names.find(b"\x00", adr)
            nm = m.names[adr:end].decode()
            if nm:
                out[nm] = i
        return out

    names = {
        "body": name_map(m.nbody, m.name_bodyadr),
        "joint": name_map(m.njnt, m.name_jntadr),
        "geom": name_map(m.ngeom, m.name_geomadr),
        "site": name_map(m.nsite, m.name_siteadr),
        "actuator": name_map(m.nu, m.name_actuatoradr),
        "tendon": name_map(m.ntendon, m.name_tendonadr),
    }

    opt = Option(
        timestep=jarr(m.opt.timestep),
        gravity=jarr(m.opt.gravity),
        impratio=jarr(m.opt.impratio),
        integrator=int(m.opt.integrator),
        cone=int(m.opt.cone),
        iterations=int(m.opt.iterations),
        ls_iterations=int(m.opt.ls_iterations),
        disableflags=int(m.opt.disableflags),
        tolerance=float(m.opt.tolerance),
        ls_tolerance=float(m.opt.ls_tolerance),
    )

    # dof ancestor mask for the dense CRB mass matrix
    dof_parentid = np.asarray(m.dof_parentid)
    ancestor_mask = np.zeros((m.nv, m.nv), dtype=bool)
    for i in range(m.nv):
        j = i
        while j >= 0:
            ancestor_mask[i, j] = True
            j = int(dof_parentid[j])

    model = Model(
        opt=opt,
        qpos0=jarr(m.qpos0),
        qpos_spring=jarr(m.qpos_spring),
        body_pos=jarr(m.body_pos),
        body_quat=jarr(m.body_quat),
        body_ipos=jarr(m.body_ipos),
        body_iquat=jarr(m.body_iquat),
        body_mass=jarr(m.body_mass),
        body_inertia=jarr(m.body_inertia),
        jnt_axis=jarr(m.jnt_axis),
        jnt_pos=jarr(m.jnt_pos),
        jnt_range=jarr(m.jnt_range),
        jnt_stiffness=jarr(m.jnt_stiffness),
        jnt_solref=jarr(m.jnt_solref),
        jnt_solimp=jarr(m.jnt_solimp),
        jnt_margin=jarr(m.jnt_margin),
        dof_damping=jarr(m.dof_damping),
        dof_armature=jarr(m.dof_armature),
        dof_frictionloss=jarr(m.dof_frictionloss),
        dof_solref=jarr(m.dof_solref),
        dof_solimp=jarr(m.dof_solimp),
        geom_pos=jarr(m.geom_pos),
        geom_quat=jarr(m.geom_quat),
        geom_size=jarr(m.geom_size),
        geom_rbound=jarr(m.geom_rbound),
        geom_friction=jarr(m.geom_friction),
        geom_margin=jarr(m.geom_margin),
        geom_gap=jarr(m.geom_gap),
        geom_solref=jarr(m.geom_solref),
        geom_solimp=jarr(m.geom_solimp),
        geom_solmix=jarr(m.geom_solmix),
        site_pos=jarr(m.site_pos),
        site_quat=jarr(m.site_quat),
        actuator_gear=jarr(m.actuator_gear),
        actuator_ctrlrange=jarr(m.actuator_ctrlrange),
        actuator_forcerange=jarr(m.actuator_forcerange),
        actuator_actrange=jarr(m.actuator_actrange),
        actuator_gainprm=jarr(m.actuator_gainprm),
        actuator_biasprm=jarr(m.actuator_biasprm),
        actuator_dynprm=jarr(m.actuator_dynprm),
        actuator_length0=jarr(m.actuator_length0),
        actuator_lengthrange=jarr(m.actuator_lengthrange),
        actuator_acc0=jarr(m.actuator_acc0),
        eq_data=jarr(m.eq_data),
        eq_solref=jarr(m.eq_solref),
        eq_solimp=jarr(m.eq_solimp),
        mesh_vert=jarr(mesh_vert),
        mesh_vertmask=np.asarray(mesh_vertmask),
        mesh_nbr=mesh_nbr,
        mesh_brute=np.asarray(mesh_brute),
        body_invweight0=jarr(m.body_invweight0),
        dof_invweight0=jarr(m.dof_invweight0),
        tendon_invweight0=jarr(m.tendon_invweight0),
        pair_friction=jarr(pair_friction),
        pair_solref=jarr(pair_solref),
        pair_solimp=jarr(pair_solimp),
        pair_margin=jarr(pair_margin),
        pair_gap=jarr(pair_gap),
        nq=int(m.nq),
        nv=int(m.nv),
        nu=int(m.nu),
        na=int(m.na),
        nbody=int(m.nbody),
        njnt=int(m.njnt),
        ngeom=int(m.ngeom),
        nsite=int(m.nsite),
        ntendon=int(m.ntendon),
        neq=int(m.neq),
        body_parentid=np.asarray(m.body_parentid),
        dof_parentid=dof_parentid,
        dof_ancestor_mask=ancestor_mask,
        dof_frictionloss0=np.asarray(m.dof_frictionloss),
        stat_meaninertia=float(m.stat.meaninertia),
        contact_k_plane=int(contact_k_plane),
        contact_k_other=int(contact_k_other),
        tendon_range=np.asarray(m.tendon_range),
        tendon_limited=np.asarray(m.tendon_limited),
        tendon_stiffness=np.asarray(m.tendon_stiffness),
        tendon_damping=np.asarray(m.tendon_damping),
        tendon_lengthspring=jarr(m.tendon_lengthspring),
        tendon_solref_lim=np.asarray(m.tendon_solref_lim),
        tendon_solimp_lim=np.asarray(m.tendon_solimp_lim),
        tendon_margin=np.asarray(m.tendon_margin),
        body_rootid=np.asarray(m.body_rootid),
        body_weldid=np.asarray(m.body_weldid),
        body_jntadr=np.asarray(m.body_jntadr),
        body_jntnum=np.asarray(m.body_jntnum),
        body_dofadr=np.asarray(m.body_dofadr),
        body_dofnum=np.asarray(m.body_dofnum),
        jnt_type=np.asarray(m.jnt_type),
        jnt_bodyid=np.asarray(m.jnt_bodyid),
        jnt_qposadr=np.asarray(m.jnt_qposadr),
        jnt_dofadr=np.asarray(m.jnt_dofadr),
        jnt_limited=np.asarray(m.jnt_limited),
        jnt_actfrclimited=np.asarray(m.jnt_actfrclimited),
        dof_bodyid=np.asarray(m.dof_bodyid),
        dof_jntid=np.asarray(m.dof_jntid),
        geom_type=np.asarray(m.geom_type),
        geom_bodyid=np.asarray(m.geom_bodyid),
        geom_condim=np.asarray(m.geom_condim),
        geom_priority=np.asarray(m.geom_priority),
        geom_meshid=geom_meshid,
        site_bodyid=np.asarray(m.site_bodyid),
        actuator_trntype=np.asarray(m.actuator_trntype),
        actuator_trnid=np.asarray(m.actuator_trnid),
        actuator_dyntype=np.asarray(m.actuator_dyntype),
        actuator_gaintype=np.asarray(m.actuator_gaintype),
        actuator_biastype=np.asarray(m.actuator_biastype),
        actuator_actadr=np.asarray(m.actuator_actadr),
        actuator_actnum=np.asarray(m.actuator_actnum),
        actuator_ctrllimited=np.asarray(m.actuator_ctrllimited),
        actuator_forcelimited=np.asarray(m.actuator_forcelimited),
        actuator_actlimited=np.asarray(m.actuator_actlimited),
        tendon_site=tendon_site,
        tendon_sitemask=tendon_sitemask,
        eq_type=np.asarray(m.eq_type),
        eq_obj1id=np.asarray(m.eq_obj1id),
        eq_obj2id=np.asarray(m.eq_obj2id),
        eq_active0=np.asarray(m.eq_active0),
        pair_geom1=pair_geom1,
        pair_geom2=pair_geom2,
        pair_condim=pair_condim,
        names=names,
    )
    # single batched transfer of all dynamic leaves (see jarr above)
    return jax.device_put(model)


def load_model(xml_path: str, dtype=jnp.float32, **kw) -> Model:
    return put_model(load_mj_model(xml_path), dtype=dtype, **kw)


def ncon_max(model: Model) -> int:
    """Total static contact slots (group-budgeted; see ops/collision.py)."""
    from ..ops.collision import ncon_max as _n

    return _n(model)


def make_data(model: Model, dtype=None) -> Data:
    """Fresh Data at qpos0 (equivalent of mj_resetData, before forward)."""
    dtype = dtype or model.qpos0.dtype
    nq, nv, nu, na = model.nq, model.nv, model.nu, model.na
    nbody, njnt, ngeom = model.nbody, model.njnt, model.ngeom
    nsite, ntendon = model.nsite, model.ntendon
    nc = ncon_max(model)

    # numpy construction + ONE device_put at the end: eager jnp constructors
    # each compile a tiny XLA program, which is seconds apiece on a tunneled
    # TPU backend (same rationale as put_model)
    npdt = np.dtype(dtype)

    def z(*shape):
        return np.zeros(shape, dtype=npdt)

    eye = np.broadcast_to(np.eye(3, dtype=npdt), (nbody, 3, 3)).copy()
    quat0 = np.tile(np.array([1.0, 0, 0, 0], dtype=npdt), (nbody, 1))

    contact = Contact(
        dist=np.full((nc,), 1e10, dtype=npdt),
        pos=z(nc, 3),
        frame=np.broadcast_to(np.eye(3, dtype=npdt), (nc, 3, 3)).copy(),
        includemargin=z(nc),
        friction=np.tile(np.array([1, 1, 0.005, 1e-4, 1e-4], dtype=npdt), (nc, 1)),
        solref=np.tile(np.array([0.02, 1.0], dtype=npdt), (nc, 1)),
        solimp=np.tile(np.array([0.9, 0.95, 0.001, 0.5, 2.0], dtype=npdt), (nc, 1)),
        geom1=np.zeros(nc, dtype=np.int32),
        geom2=np.zeros(nc, dtype=np.int32),
        dim=np.ones(nc, dtype=np.int32),
    )

    data = Data(
        qpos=np.asarray(model.qpos0, dtype=npdt),
        qvel=z(nv),
        act=z(na),
        ctrl=z(nu),
        qacc=z(nv),
        qacc_warmstart=z(nv),
        time=np.zeros((), dtype=npdt),
        xpos=z(nbody, 3),
        xquat=quat0,
        xmat=eye,
        xipos=z(nbody, 3),
        ximat=eye,
        xanchor=z(njnt, 3),
        xaxis=z(njnt, 3),
        geom_xpos=z(ngeom, 3),
        geom_xmat=np.broadcast_to(np.eye(3, dtype=npdt), (ngeom, 3, 3)).copy(),
        site_xpos=z(nsite, 3),
        site_xmat=np.broadcast_to(np.eye(3, dtype=npdt), (max(nsite, 0), 3, 3)).copy(),
        subtree_com=z(nbody, 3),
        cinert=z(nbody, 10),
        cdof=z(nv, 6),
        qM=z(nv, nv),
        qLD=z(nv, nv),
        ten_length=z(ntendon),
        ten_J=z(ntendon, nv),
        contact=contact,
        cvel=z(nbody, 6),
        cdof_dot=z(nv, 6),
        qfrc_bias=z(nv),
        ten_velocity=z(ntendon),
        actuator_length=z(nu),
        actuator_velocity=z(nu),
        actuator_force=z(nu),
        act_dot=z(na),
        qfrc_actuator=z(nv),
        qfrc_passive=z(nv),
        qfrc_applied=z(nv),
        xfrc_applied=z(nbody, 6),
        qfrc_smooth=z(nv),
        qacc_smooth=z(nv),
        qfrc_constraint=z(nv),
        efc_force_contact=z(nc, 10),  # up to 2*(condim-1) pyramidal rows
    )
    # single batched transfer of all dynamic leaves (see note above)
    return jax.device_put(data)
