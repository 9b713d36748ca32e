"""Passive forces: joint springs/dampers and tendon springs/dampers.

Equivalent of MuJoCo's mj_passive for the features the robot suite uses
(no fluid forces: all models have density = viscosity = 0; no gravcomp;
no flexes). Everything is a vectorized elementwise expression.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from ..core.types import Data, DisableBit, JointType, Model


def passive(model: Model, data: Data) -> Data:
    dtype = data.qpos.dtype
    nv = model.nv
    qfrc = jnp.zeros(nv, dtype=dtype)

    if model.opt.disableflags & DisableBit.PASSIVE:
        return data.replace(qfrc_passive=qfrc)

    # joint springs: hinge/slide only (nq == nv, qposadr == dofadr ordering)
    if model.njnt:
        qadr = model.jnt_qposadr
        dadr = model.jnt_dofadr
        stiff = model.jnt_stiffness  # (njnt,)
        spring = -stiff * (data.qpos[qadr] - model.qpos_spring[qadr])
        qfrc = qfrc.at[dadr].add(spring)

    # dof dampers
    qfrc = qfrc - model.dof_damping * data.qvel

    # tendon springs (deadband form, mjModel.tendon_lengthspring) + dampers
    if model.ntendon:
        ls = jnp.asarray(model.tendon_lengthspring, dtype=dtype)
        stiff_t = jnp.asarray(model.tendon_stiffness, dtype=dtype)
        damp_t = jnp.asarray(model.tendon_damping, dtype=dtype)
        if np.any(model.tendon_stiffness != 0) or np.any(model.tendon_damping != 0):
            below = jnp.minimum(data.ten_length - ls[:, 0], 0.0)
            above = jnp.maximum(data.ten_length - ls[:, 1], 0.0)
            frc = -stiff_t * (below + above) - damp_t * data.ten_velocity
            qfrc = qfrc + data.ten_J.T @ frc

    return data.replace(qfrc_passive=qfrc)
