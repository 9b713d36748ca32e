"""Core pytree types for the TPU-native physics engine.

The engine is a from-scratch JAX reimplementation of the generalized-coordinate
rigid-body pipeline that the reference framework (robfiras/loco-mujoco)
delegates to the external MuJoCo C library (reference `environments/base.py:180,362,445`
calls mj_step/mj_forward/mj_resetData). Feature scope is exactly what the 8
robot models in the reference use: hinge/slide joints (nq == nv, no
quaternions in state), motor/position/general/muscle actuators, spatial
site-path tendons, joint equality constraints, joint limits, dof friction
loss, and contacts between primitive geoms / convex meshes and the floor
plane, solved with MuJoCo-convention soft constraints (Newton).

`Model` holds per-robot constants: *numeric* leaves are JAX arrays (traced, so
they can be batched/domain-randomized under vmap); *structural* fields are
numpy arrays carried as static aux data (hashable, jit-cache friendly).
`Data` is the per-env dynamic state — a pure pytree that `step` maps to a new
`Data`, vmappable over thousands of envs and shardable over a device mesh.
"""

from __future__ import annotations

import enum
from typing import Any, Optional

import jax
import numpy as np

from .struct import pytree_dataclass, static_field


class JointType(enum.IntEnum):
    FREE = 0  # unused by the supported robots, kept for table parity
    BALL = 1  # unused
    SLIDE = 2
    HINGE = 3


class GeomType(enum.IntEnum):
    PLANE = 0
    HFIELD = 1
    SPHERE = 2
    CAPSULE = 3
    ELLIPSOID = 4
    CYLINDER = 5
    BOX = 6
    MESH = 7


class TrnType(enum.IntEnum):
    JOINT = 0
    JOINTINPARENT = 1
    SLIDERCRANK = 2
    TENDON = 3
    SITE = 4


class DynType(enum.IntEnum):
    NONE = 0
    INTEGRATOR = 1
    FILTER = 2
    FILTEREXACT = 3
    MUSCLE = 4


class GainType(enum.IntEnum):
    FIXED = 0
    AFFINE = 1
    MUSCLE = 2


class BiasType(enum.IntEnum):
    NONE = 0
    AFFINE = 1
    MUSCLE = 2


class IntegratorType(enum.IntEnum):
    EULER = 0
    RK4 = 1
    IMPLICIT = 2
    IMPLICITFAST = 3


class ConeType(enum.IntEnum):
    PYRAMIDAL = 0
    ELLIPTIC = 1


class EqType(enum.IntEnum):
    CONNECT = 0
    WELD = 1
    JOINT = 2
    TENDON = 3


class DisableBit(enum.IntFlag):
    CONSTRAINT = 1 << 0
    EQUALITY = 1 << 1
    FRICTIONLOSS = 1 << 2
    LIMIT = 1 << 3
    CONTACT = 1 << 4
    PASSIVE = 1 << 5
    GRAVITY = 1 << 6
    CLAMPCTRL = 1 << 7
    ACTUATION = 1 << 10
    REFSAFE = 1 << 11
    EULERDAMP = 1 << 14


@pytree_dataclass
class Option:
    """Physics options (mirrors the subset of mjOption the robots use)."""

    timestep: jax.Array
    gravity: jax.Array  # (3,)
    impratio: jax.Array
    # static:
    integrator: int = static_field(default=int(IntegratorType.EULER))
    cone: int = static_field(default=int(ConeType.PYRAMIDAL))
    iterations: int = static_field(default=100)
    ls_iterations: int = static_field(default=50)
    disableflags: int = static_field(default=0)
    tolerance: float = static_field(default=1e-8)
    ls_tolerance: float = static_field(default=0.01)


@pytree_dataclass
class Model:
    """Static robot description + numeric parameters (the traced leaves)."""

    opt: Option

    # --- numeric leaves (jnp arrays; may gain a leading batch axis for
    # domain randomization / multi-model envs) -----------------------------
    qpos0: jax.Array  # (nq,) reference pose
    qpos_spring: jax.Array  # (nq,)
    body_pos: jax.Array  # (nbody, 3)
    body_quat: jax.Array  # (nbody, 4) (w,x,y,z)
    body_ipos: jax.Array  # (nbody, 3)
    body_iquat: jax.Array  # (nbody, 4)
    body_mass: jax.Array  # (nbody,)
    body_inertia: jax.Array  # (nbody, 3) diagonal in inertial frame
    jnt_axis: jax.Array  # (njnt, 3)
    jnt_pos: jax.Array  # (njnt, 3)
    jnt_range: jax.Array  # (njnt, 2)
    jnt_stiffness: jax.Array  # (njnt,)
    jnt_solref: jax.Array  # (njnt, 2) for limits
    jnt_solimp: jax.Array  # (njnt, 5)
    jnt_margin: jax.Array  # (njnt,)
    dof_damping: jax.Array  # (nv,)
    dof_armature: jax.Array  # (nv,)
    dof_frictionloss: jax.Array  # (nv,)
    dof_solref: jax.Array  # (nv, 2) for friction loss
    dof_solimp: jax.Array  # (nv, 5)
    geom_pos: jax.Array  # (ngeom, 3)
    geom_quat: jax.Array  # (ngeom, 4)
    geom_size: jax.Array  # (ngeom, 3)
    geom_rbound: jax.Array  # (ngeom,) bounding-sphere radius (mjModel)
    geom_friction: jax.Array  # (ngeom, 3)
    geom_margin: jax.Array  # (ngeom,)
    geom_gap: jax.Array  # (ngeom,)
    geom_solref: jax.Array  # (ngeom, 2)
    geom_solimp: jax.Array  # (ngeom, 5)
    geom_solmix: jax.Array  # (ngeom,)
    site_pos: jax.Array  # (nsite, 3)
    site_quat: jax.Array  # (nsite, 4)
    actuator_gear: jax.Array  # (nu, 6) — col 0 used for joint transmission
    actuator_ctrlrange: jax.Array  # (nu, 2)
    actuator_forcerange: jax.Array  # (nu, 2)
    actuator_actrange: jax.Array  # (nu, 2)
    actuator_gainprm: jax.Array  # (nu, 10)
    actuator_biasprm: jax.Array  # (nu, 10)
    actuator_dynprm: jax.Array  # (nu, 10)
    actuator_length0: jax.Array  # (nu,)
    actuator_lengthrange: jax.Array  # (nu, 2)
    actuator_acc0: jax.Array  # (nu,)
    eq_data: jax.Array  # (neq, 11)
    eq_solref: jax.Array  # (neq, 2)
    eq_solimp: jax.Array  # (neq, 5)
    # convex hull vertices for mesh geoms, padded: (nmeshgeom, maxvert, 3),
    # plus validity mask (nmeshgeom, maxvert)
    mesh_vert: jax.Array
    # validity mask is static (hull topology never varies across model
    # variants) so the collision driver can bucket pairs by vertex count
    mesh_vertmask: np.ndarray = static_field()
    # hull adjacency from MuJoCo's own qhull graph (mesh_graph
    # vert_edgeadr/edge_localid): a tuple of per-mesh-geom (nvert_i, deg_i)
    # int32 arrays of local vertex ids in stored edge order, -1 padded
    # (None for brute meshes). mjc_PlaneConvex emits its extra contacts
    # from the support vertex's neighbor list in exactly this order, so
    # the tables are part of the oracle-parity contract.
    mesh_nbr: tuple = static_field()
    # per-mesh flag: no graph / tiny mesh (< 10 verts) — MuJoCo then scans
    # ALL vertices in storage order instead of the support's neighbors
    mesh_brute: np.ndarray = static_field()
    # precomputed inverse-weights from the host-side compiler (mjModel
    # *_invweight0) — numeric leaves so model VARIANTS (weight carrying,
    # 4-ages scalings, domain randomization) can batch them:
    body_invweight0: jax.Array  # (nbody, 2)
    dof_invweight0: jax.Array  # (nv,)
    tendon_invweight0: jax.Array  # (ntendon,)
    # precomputed candidate contact pair parameters (see collision.py):
    pair_friction: jax.Array  # (npair, 5)
    pair_solref: jax.Array  # (npair, 2)
    pair_solimp: jax.Array  # (npair, 5)
    pair_margin: jax.Array  # (npair,)
    pair_gap: jax.Array  # (npair,)

    # --- static structural fields (numpy, hashable aux) --------------------
    nq: int = static_field(default=0)
    nv: int = static_field(default=0)
    nu: int = static_field(default=0)
    na: int = static_field(default=0)
    nbody: int = static_field(default=0)
    njnt: int = static_field(default=0)
    ngeom: int = static_field(default=0)
    nsite: int = static_field(default=0)
    ntendon: int = static_field(default=0)
    neq: int = static_field(default=0)
    body_parentid: np.ndarray = static_field(default=None)
    # dof tree ancestry: dof_parentid chain and the derived (nv, nv) bool mask
    # ancestor_mask[i, j] = (j == i) or (j is an ancestor dof of i); used to
    # sparsify the dense CRB mass matrix without a tree traversal at runtime.
    dof_parentid: np.ndarray = static_field(default=None)
    dof_ancestor_mask: np.ndarray = static_field(default=None)
    # host-time copy of dof_frictionloss, fixing the static set of friction
    # rows (the traced leaf can still be randomized in magnitude):
    dof_frictionloss0: np.ndarray = static_field(default=None)  # (nv,)
    # mjModel.stat.meaninertia — the solver's convergence scale
    stat_meaninertia: float = static_field(default=1.0)
    # top-K contact-pair budgets per collision group (ops/collision.py);
    # correctness requires K >= simultaneously near-touching pairs per group
    contact_k_plane: int = static_field(default=8)
    contact_k_other: int = static_field(default=4)
    # tendon limits/passive params
    tendon_range: np.ndarray = static_field(default=None)  # (ntendon, 2)
    tendon_limited: np.ndarray = static_field(default=None)  # (ntendon,)
    tendon_stiffness: np.ndarray = static_field(default=None)
    tendon_damping: np.ndarray = static_field(default=None)
    # spring deadband — a numeric LEAF: compile derives it from qpos0
    # geometry, so it differs across 4-ages scaling variants
    tendon_lengthspring: jax.Array = None  # (ntendon, 2)
    tendon_solref_lim: np.ndarray = static_field(default=None)  # (ntendon, 2)
    tendon_solimp_lim: np.ndarray = static_field(default=None)  # (ntendon, 5)
    tendon_margin: np.ndarray = static_field(default=None)  # (ntendon,)
    body_rootid: np.ndarray = static_field(default=None)
    body_weldid: np.ndarray = static_field(default=None)
    body_jntadr: np.ndarray = static_field(default=None)
    body_jntnum: np.ndarray = static_field(default=None)
    body_dofadr: np.ndarray = static_field(default=None)
    body_dofnum: np.ndarray = static_field(default=None)
    jnt_type: np.ndarray = static_field(default=None)
    jnt_bodyid: np.ndarray = static_field(default=None)
    jnt_qposadr: np.ndarray = static_field(default=None)
    jnt_dofadr: np.ndarray = static_field(default=None)
    jnt_limited: np.ndarray = static_field(default=None)
    jnt_actfrclimited: np.ndarray = static_field(default=None)
    dof_bodyid: np.ndarray = static_field(default=None)
    dof_jntid: np.ndarray = static_field(default=None)
    geom_type: np.ndarray = static_field(default=None)
    geom_bodyid: np.ndarray = static_field(default=None)
    geom_condim: np.ndarray = static_field(default=None)
    geom_priority: np.ndarray = static_field(default=None)
    geom_meshid: np.ndarray = static_field(default=None)  # index into mesh_vert, -1 if none
    site_bodyid: np.ndarray = static_field(default=None)
    actuator_trntype: np.ndarray = static_field(default=None)
    actuator_trnid: np.ndarray = static_field(default=None)  # (nu, 2)
    actuator_dyntype: np.ndarray = static_field(default=None)
    actuator_gaintype: np.ndarray = static_field(default=None)
    actuator_biastype: np.ndarray = static_field(default=None)
    actuator_actadr: np.ndarray = static_field(default=None)
    actuator_actnum: np.ndarray = static_field(default=None)
    actuator_ctrllimited: np.ndarray = static_field(default=None)
    actuator_forcelimited: np.ndarray = static_field(default=None)
    actuator_actlimited: np.ndarray = static_field(default=None)
    # tendon site paths, padded to max path length:
    tendon_site: np.ndarray = static_field(default=None)  # (ntendon, maxpath)
    tendon_sitemask: np.ndarray = static_field(default=None)  # (ntendon, maxpath)
    eq_type: np.ndarray = static_field(default=None)
    eq_obj1id: np.ndarray = static_field(default=None)
    eq_obj2id: np.ndarray = static_field(default=None)
    eq_active0: np.ndarray = static_field(default=None)
    # candidate contact pairs (static broadphase):
    pair_geom1: np.ndarray = static_field(default=None)
    pair_geom2: np.ndarray = static_field(default=None)
    pair_condim: np.ndarray = static_field(default=None)
    # name tables for spec compilation (not used in traced code):
    names: Any = static_field(default=None)  # dict of name -> id maps


@pytree_dataclass
class Contact:
    """All candidate contact points, fixed shape (ncon_max,...).

    geom ids are traced: the runtime midphase selects which candidate pairs
    occupy each slot (ops/collision.py), so slot->geom binding is dynamic.
    condim per slot stays static (groups are keyed by condim)."""

    dist: jax.Array  # (ncon,)
    pos: jax.Array  # (ncon, 3)
    frame: jax.Array  # (ncon, 3, 3) rows: normal, tangent1, tangent2
    includemargin: jax.Array  # (ncon,)
    friction: jax.Array  # (ncon, 5)
    solref: jax.Array  # (ncon, 2)
    solimp: jax.Array  # (ncon, 5)
    geom1: jax.Array  # (ncon,) int
    geom2: jax.Array  # (ncon,) int
    dim: np.ndarray = static_field(default=None)  # condim per slot


@pytree_dataclass
class Data:
    """Dynamic per-env state. One pytree in, one pytree out, vmap over envs."""

    # inputs / integrated state
    qpos: jax.Array  # (nq,)
    qvel: jax.Array  # (nv,)
    act: jax.Array  # (na,)
    ctrl: jax.Array  # (nu,)
    qacc: jax.Array  # (nv,)
    qacc_warmstart: jax.Array  # (nv,)
    time: jax.Array  # ()

    # position-stage products
    xpos: jax.Array  # (nbody, 3)
    xquat: jax.Array  # (nbody, 4)
    xmat: jax.Array  # (nbody, 3, 3)
    xipos: jax.Array  # (nbody, 3)
    ximat: jax.Array  # (nbody, 3, 3)
    xanchor: jax.Array  # (njnt, 3)
    xaxis: jax.Array  # (njnt, 3)
    geom_xpos: jax.Array  # (ngeom, 3)
    geom_xmat: jax.Array  # (ngeom, 3, 3)
    site_xpos: jax.Array  # (nsite, 3)
    site_xmat: jax.Array  # (nsite, 3, 3)
    subtree_com: jax.Array  # (nbody, 3)
    cinert: jax.Array  # (nbody, 10) packed spatial inertia at com frame
    cdof: jax.Array  # (nv, 6)
    qM: jax.Array  # (nv, nv) dense mass matrix
    qLD: jax.Array  # (nv, nv) cholesky factor of qM
    ten_length: jax.Array  # (ntendon,)
    ten_J: jax.Array  # (ntendon, nv)
    contact: Contact

    # velocity-stage products
    cvel: jax.Array  # (nbody, 6)
    cdof_dot: jax.Array  # (nv, 6)
    qfrc_bias: jax.Array  # (nv,)
    ten_velocity: jax.Array  # (ntendon,)

    # actuation
    actuator_length: jax.Array  # (nu,)
    actuator_velocity: jax.Array  # (nu,)
    actuator_force: jax.Array  # (nu,)
    act_dot: jax.Array  # (na,)
    qfrc_actuator: jax.Array  # (nv,)

    # forces / solution
    qfrc_passive: jax.Array  # (nv,)
    qfrc_applied: jax.Array  # (nv,)
    xfrc_applied: jax.Array  # (nbody, 6)
    qfrc_smooth: jax.Array  # (nv,)
    qacc_smooth: jax.Array  # (nv,)
    qfrc_constraint: jax.Array  # (nv,)
    efc_force_contact: jax.Array  # (ncon, max_condim) per-contact forces in contact frame
    # implicit-damping velocity update (M + h diag(damping))^-1 M qacc,
    # emitted by the fused constraint kernel for Euler models so the
    # integrator needs neither qM nor an XLA dense solve (None elsewhere)
    euler_dv: jax.Array = None
