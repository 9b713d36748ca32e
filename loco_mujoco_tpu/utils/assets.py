"""Asset-tree resolution.

The robot XMLs + meshes (the reference packages them via setup.py:6-31
package-data globs) are consumed read-only from an external asset tree.
The root is resolved once per process:

1. ``LOCO_MUJOCO_TPU_DATA`` env var, if set — must point at a directory
   with the reference's ``loco_mujoco/`` package layout below it (i.e. the
   dir containing ``environments/data/...`` and ``datasets/...``).
2. Fallback: ``/root/reference/loco_mujoco`` (the layout this repo is
   developed against).

``data_root()`` raises with an actionable message when neither exists, so
a misconfigured install fails at env-build time rather than with a bare
FileNotFoundError deep in the XML loader.
"""

from __future__ import annotations

import os
from pathlib import Path

_DEFAULT_ROOT = "/root/reference/loco_mujoco"
_ENV_VAR = "LOCO_MUJOCO_TPU_DATA"


def data_root() -> Path:
    """Root of the asset tree (reference `loco_mujoco/` package layout)."""
    override = os.environ.get(_ENV_VAR)
    if override:
        root = Path(override)
        if not root.is_dir():
            raise FileNotFoundError(
                f"{_ENV_VAR}={override!r} is not a directory. Point it at "
                "a copy of the reference loco_mujoco package tree (the "
                "directory containing environments/data and datasets)."
            )
        return root
    root = Path(_DEFAULT_ROOT)
    if not root.is_dir():
        raise FileNotFoundError(
            f"No asset tree found at {_DEFAULT_ROOT} and {_ENV_VAR} is "
            "unset. Download/copy the loco_mujoco asset tree and set "
            f"{_ENV_VAR} to its path."
        )
    return root


class _LazyRoot:
    """Path-like handle on the asset root, resolved at USE time (not at
    module import), so ``LOCO_MUJOCO_TPU_DATA`` set after import — or only
    for some calls — is honored. Supports the ``REF_ROOT / subpath``
    idiom the model builders use."""

    def __truediv__(self, other) -> Path:
        return data_root() / other

    def __str__(self) -> str:
        return str(data_root())

    def __fspath__(self) -> str:
        return str(data_root())


#: Shared asset-root handle for the model builders.
REF_ROOT = _LazyRoot()


def dataset_root() -> Path:
    """Root of the trajectory datasets (real/perfect npz trees).

    ``LOCO_MUJOCO_TPU_DATASETS`` overrides independently (e.g. datasets
    downloaded to a scratch volume while XMLs ship with the package)."""
    override = os.environ.get("LOCO_MUJOCO_TPU_DATASETS")
    if override:
        return Path(override)
    return data_root() / "datasets"
