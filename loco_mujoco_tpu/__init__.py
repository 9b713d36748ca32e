"""loco_mujoco_tpu — a TPU-native, batched reimplementation of the
LocoMuJoCo imitation-learning benchmark (reference: robfiras/loco-mujoco).

Public surface mirrors the reference package root (`loco_mujoco/__init__.py`):
`LocoEnv`-family envs via `make("Env.task[.mode].dtype")` and
`get_all_task_names()`, plus the batched-native API on each env:
`reset(key) -> EnvState`, `step(state, action) -> EnvState`.
"""

import os as _os

# headless rendering: mujoco latches its GL backend when the `mujoco`
# package is first imported, so the defaults must be set before any
# submodule pulls it in (envs/rendering.py documents the EGL path)
_os.environ.setdefault("MUJOCO_GL", "egl")
_os.environ.setdefault("PYOPENGL_PLATFORM", _os.environ["MUJOCO_GL"])

from .utils.tpu import enable_compilation_cache as _enable_cache

_enable_cache()

from .registry import get_all_task_names, make, register, registered_envs
from .envs import EnvState, LocoEnv

# environment registrations (import side effects)
from .models.quadrupeds import unitree_a1 as _a1  # noqa: F401
from .models.humanoids import humanoid as _humanoid  # noqa: F401
from .models.humanoids import unitree_h1 as _h1  # noqa: F401
from .models.humanoids import unitree_g1 as _g1  # noqa: F401
from .models.humanoids import talos as _talos  # noqa: F401
from .models.humanoids import atlas as _atlas  # noqa: F401
from .models.humanoids import humanoid_4_ages as _h4a  # noqa: F401
from .models.humanoids import myoskeleton as _myo  # noqa: F401
from .envs import gymnasium_env as _gym  # noqa: F401

__version__ = "0.1.0"

__all__ = [
    "make",
    "register",
    "registered_envs",
    "get_all_task_names",
    "EnvState",
    "LocoEnv",
]
