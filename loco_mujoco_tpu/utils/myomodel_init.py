"""MyoSkeleton asset management (reference `loco_mujoco/utils/myomodel_init.py`).

The MyoSkeleton model is an external, license-gated asset (myolab/myo_model,
pinned to commit 619b1a8 in the reference :76-98). This build environment
has no network egress, so `fetch_myoskeleton` verifies a pre-provisioned
checkout or prints the manual instructions; the interactive license prompt
is preserved for online use.
"""

from __future__ import annotations

import os
import shutil
import subprocess
from pathlib import Path

MYO_COMMIT = "619b1a876113ecd4ab4963b1aca4c5cbd8f4cb05"[:7]  # 619b1a8
MYO_REPO = "https://github.com/myolab/myo_model.git"

MYO_PATH = Path(
    os.environ.get(
        "LOCO_MUJOCO_TPU_MYO_MODEL",
        str(Path(__file__).resolve().parent.parent / "environments_data" / "myo_model"),
    )
)


def myoskeleton_available() -> bool:
    return (MYO_PATH / "myoskeleton").is_dir() or any(
        MYO_PATH.glob("**/myoskeleton*.xml")
    )


def fetch_myoskeleton(accept_license: bool = False):
    """Clone the myo_model repo at the pinned commit (reference :76-98),
    after an explicit license acknowledgement (reference :57-73)."""
    if myoskeleton_available():
        print(f"MyoSkeleton assets present at {MYO_PATH}")
        return True
    if not accept_license:
        print(
            "The MyoSkeleton model is distributed by MyoLab under its own "
            "license (https://github.com/myolab/myo_model). Re-run with "
            "accept_license=True (or answer the CLI prompt) to proceed."
        )
        ans = input("Accept the MyoLab license? [y/N] ").strip().lower()
        if ans != "y":
            return False
    if shutil.which("git") is None:
        print("git unavailable; cannot fetch MyoSkeleton assets.")
        return False
    try:
        MYO_PATH.parent.mkdir(parents=True, exist_ok=True)
        subprocess.run(
            ["git", "clone", MYO_REPO, str(MYO_PATH)], check=True, timeout=300
        )
        subprocess.run(
            ["git", "-C", str(MYO_PATH), "checkout", MYO_COMMIT], check=True
        )
        return True
    except Exception as e:  # offline environment
        print(
            f"Fetching failed ({e}). Provision the myo_model checkout "
            f"(commit {MYO_COMMIT}) manually at {MYO_PATH} or point "
            "LOCO_MUJOCO_TPU_MYO_MODEL at it."
        )
        return False


def clear_myoskeleton():
    """Remove the fetched assets (reference :44-54)."""
    if MYO_PATH.is_dir():
        shutil.rmtree(MYO_PATH)
        print(f"removed {MYO_PATH}")
