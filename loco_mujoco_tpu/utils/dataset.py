"""Dataset acquisition and mocap retargeting utilities.

Behavioral port of reference `loco_mujoco/utils/dataset.py` (C11). The
download helpers mirror the reference's Zenodo layout; in offline
environments they verify presence and print the manual instructions instead
of fetching (this build environment has no egress). `adapt_mocap` is the
per-joint linear retargeting used by the conversion scripts
(datasets/data_generation/conversion/*).
"""

from __future__ import annotations

import os
from pathlib import Path

import numpy as np
import scipy.io as sio

# Zenodo records used by the reference (dataset.py:34,47,68,81)
ZENODO_URLS = {
    "humanoid_real": "https://zenodo.org/records/10102870",
    "humanoid_perfect": "https://zenodo.org/records/10093870",
    "quadruped_real": "https://zenodo.org/records/10102870",
    "quadruped_perfect": "https://zenodo.org/records/10093870",
}

DATASET_ROOT = Path(
    os.environ.get(
        "LOCO_MUJOCO_TPU_DATASETS", "/root/reference/loco_mujoco/datasets"
    )
)


def _try_download(kind: str, dest: Path) -> bool:
    """Attempt the reference's wget-based download; returns False offline."""
    import shutil
    import subprocess

    url = ZENODO_URLS[kind]
    if shutil.which("wget") is None:
        return False
    try:
        subprocess.run(
            ["wget", "-q", "--timeout=10", "--tries=1", url, "-O", os.devnull],
            check=True, timeout=30,
        )
        return True
    except Exception:
        return False


def download_real_datasets():
    """CLI entry `loco-mujoco-download-real` (pyproject.toml:38-41)."""
    present = (DATASET_ROOT / "humanoids" / "real").is_dir()
    if present:
        print(f"real datasets present at {DATASET_ROOT}")
        return
    if not _try_download("humanoid_real", DATASET_ROOT):
        print(
            "No network access. Download the real datasets manually from\n"
            f"  {ZENODO_URLS['humanoid_real']}\n"
            f"and unpack them under {DATASET_ROOT} (or set "
            "LOCO_MUJOCO_TPU_DATASETS)."
        )


def download_perfect_datasets():
    """CLI entry `loco-mujoco-download-perfect`."""
    present = (DATASET_ROOT / "humanoids" / "perfect").is_dir()
    if present:
        print(f"perfect datasets present at {DATASET_ROOT}")
        return
    if not _try_download("humanoid_perfect", DATASET_ROOT):
        print(
            "No network access. Download the perfect datasets manually from\n"
            f"  {ZENODO_URLS['humanoid_perfect']}\n"
            f"and unpack them under {DATASET_ROOT}."
        )


def download_all_datasets():
    """CLI entry `loco-mujoco-download` (dataset.py:12-88)."""
    download_real_datasets()
    download_perfect_datasets()


def adapt_mocap(path, joint_conf, unavailable_keys, rename_map=None,
                discard_first=None, discard_last=None):
    """Linear retargeting of a .mat mocap recording to a robot's joint set
    (reference dataset.py:114-203): per-joint multiplier/offset on angles,
    multiplier on velocities, renaming, zero/constant fill for joints the
    mocap lacks, head/tail trimming."""
    euler_keys = list(joint_conf.keys())
    multipliers = [joint_conf[k][0] for k in euler_keys]
    offsets = [joint_conf[k][1] for k in euler_keys]

    data = sio.loadmat(path)
    joint_pos = data["angJoi"]
    joint_vel = data["angDJoi"]
    try:
        joint_names = data["rowNameIK"]
    except KeyError:
        joint_names = data["rowName"]
    joint_names = np.array([name[0] for name in np.squeeze(joint_names)])

    n_datapoint = len(joint_pos[0])
    joint_pos = dict(zip(joint_names, joint_pos))
    joint_vel = dict(zip(joint_names, joint_vel))

    joint_pos = np.array([joint_pos[k] for k in euler_keys])
    joint_vel = np.array([joint_vel[k] for k in euler_keys])

    mult = np.asarray(multipliers)[:, None]
    offs = np.asarray(offsets)[:, None]
    joint_pos = joint_pos * mult + offs
    joint_vel = joint_vel * mult

    trajec = np.concatenate((joint_pos, joint_vel))

    if rename_map is not None:
        for k, v in rename_map.items():
            i = euler_keys.index(k)
            euler_keys[i] = v

    keys = ["q_" + k for k in euler_keys] + ["dq_" + k for k in euler_keys]

    if "goal" in data.keys():
        keys.append("goal")
        trajec = np.concatenate((trajec, data["goal"]))

    dataset = dict(zip(keys, trajec))

    if isinstance(unavailable_keys, list):
        for ukey in unavailable_keys:
            dataset["q_" + ukey] = np.zeros(n_datapoint)
            dataset["dq_" + ukey] = np.zeros(n_datapoint)
    elif isinstance(unavailable_keys, dict):
        for ukey, val in unavailable_keys.items():
            dataset["q_" + ukey] = np.ones(n_datapoint) * val
            dataset["dq_" + ukey] = np.zeros(n_datapoint)
    else:
        raise TypeError

    for j_name, val in dataset.items():
        val_temp = val[discard_first:]
        val_temp = val_temp[0:-discard_last] if discard_last else val_temp
        dataset[j_name] = val_temp

    return dataset
