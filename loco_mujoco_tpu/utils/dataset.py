"""Dataset acquisition and mocap retargeting utilities.

Behavioral port of reference `loco_mujoco/utils/dataset.py` (C11). The
download helpers mirror the reference's Zenodo layout; in offline
environments they verify presence and print the manual instructions instead
of fetching (this build environment has no egress). `adapt_mocap` is the
per-joint linear retargeting used by the conversion scripts
(examples/dataset_generation/*), reformulated as a vectorized dict
pipeline over the .mat channel table.
"""

from __future__ import annotations

import os
from pathlib import Path

import numpy as np
import scipy.io as sio

# Zenodo record used by the reference (dataset.py:34,47,68,81,104)
ZENODO_URLS = {
    "humanoid_real": (
        "https://zenodo.org/records/13737593/files/"
        "humanoid_datasets_v0.4.1.zip?download=1"
    ),
    "quadruped_real": (
        "https://zenodo.org/records/13737593/files/"
        "quadruped_datasets_v0.4.1.zip?download=1"
    ),
    "humanoid_perfect": (
        "https://zenodo.org/records/13737593/files/"
        "humanoid_datasets_perfect_v0.4.1.zip?download=1"
    ),
    "quadruped_perfect": (
        "https://zenodo.org/records/13737593/files/"
        "quadruped_datasets_perfect_v0.4.1.zip?download=1"
    ),
    "raw_mocap": (
        "https://zenodo.org/records/10625721/files/"
        "raw_motion_capture_v0.1.zip?download=1"
    ),
}

from .assets import dataset_root as _dataset_root


class _LazyDatasetRoot:
    """Resolved at use time via utils.assets (env-var overridable)."""

    def __truediv__(self, other):
        return _dataset_root() / other

    def __str__(self):
        return str(_dataset_root())

    def __fspath__(self):
        return str(_dataset_root())


DATASET_ROOT = _LazyDatasetRoot()


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
            f"  {ZENODO_URLS['quadruped_real']}\n"
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
            f"  {ZENODO_URLS['quadruped_perfect']}\n"
            f"and unpack them under {DATASET_ROOT}."
        )


def download_raw_mocap_datasets():
    """Raw (un-retargeted) mocap recordings (reference dataset.py:91-111)."""
    present = (DATASET_ROOT / "data_generation" / "00_raw_mocap_data").is_dir()
    if present:
        print(f"raw mocap data present at {DATASET_ROOT}")
        return
    if not _try_download("raw_mocap", DATASET_ROOT):
        print(
            "No network access. Download the raw mocap data manually from\n"
            f"  {ZENODO_URLS['raw_mocap']}\n"
            f"and unpack it under {DATASET_ROOT}/data_generation."
        )


def download_all_datasets():
    """CLI entry `loco-mujoco-download` (dataset.py:12-88)."""
    download_real_datasets()
    download_perfect_datasets()


def _mat_channels(path):
    """Load a mocap .mat as {channel_name: (pos_row, vel_row)} plus extras.

    The capture format is fixed externally (OpenSim IK output): angle
    matrix `angJoi`, velocity matrix `angDJoi`, row labels `rowNameIK`
    (or `rowName`), optional `goal` channel.
    """
    data = sio.loadmat(path)
    names_raw = data.get("rowNameIK", data.get("rowName"))
    if names_raw is None:
        raise KeyError(f"{path}: no rowNameIK/rowName channel table")
    names = [str(cell[0]) for cell in np.squeeze(names_raw)]
    pos = np.asarray(data["angJoi"], dtype=np.float64)
    vel = np.asarray(data["angDJoi"], dtype=np.float64)
    channels = {n: (pos[i], vel[i]) for i, n in enumerate(names)}
    return channels, data.get("goal"), pos.shape[1]


def adapt_mocap(path, joint_conf, unavailable_keys, rename_map=None,
                discard_first=None, discard_last=None):
    """Retarget a .mat mocap recording to a robot's joint set.

    Same behavior as reference dataset.py:114-203: each configured mocap
    channel maps to robot keys ``q_<name>``/``dq_<name>`` through a linear
    transform (``pos*mult + off``, ``vel*mult``), names are optionally
    rewritten via `rename_map`, joints absent from the capture are filled
    with a constant (dict form) or zero (list form), and `discard_first` /
    `discard_last` trim the capture's lead-in/out frames.
    """
    channels, goal, n_frames = _mat_channels(path)
    rename = rename_map or {}

    out = {}
    for src, (mult, off) in joint_conf.items():
        pos, vel = channels[src]
        name = rename.get(src, src)
        out[f"q_{name}"] = pos * mult + off
        out[f"dq_{name}"] = vel * mult

    if goal is not None:
        out["goal"] = np.asarray(goal, dtype=np.float64)[0]

    if isinstance(unavailable_keys, dict):
        fills = dict(unavailable_keys)
    elif isinstance(unavailable_keys, (list, tuple)):
        fills = {k: 0.0 for k in unavailable_keys}
    else:
        raise TypeError(
            "unavailable_keys must be a list of names or a {name: value} dict"
        )
    for name, value in fills.items():
        out[f"q_{name}"] = np.full(n_frames, float(value))
        out[f"dq_{name}"] = np.zeros(n_frames)

    lo = discard_first or 0
    hi = -discard_last if discard_last else None
    return {k: v[lo:hi] for k, v in out.items()}


def synthesize_walk_8_dir(src: Path, dst: Path) -> Path:
    """Synthesize the A1 'hard' (8-direction) debug dataset from the
    straight-walk mini dataset when `walk_8_dir.npz` is absent.

    The reference ships mini datasets for the simple task only
    (`datasets/quadrupeds/real/mini_datasets/` holds just
    walk_straight.npz), so `UnitreeA1.hard.*` cannot build in debug mode
    from assets alone. The hard task's dataset is the same gait walked in
    8 compass directions (reference unitreeA1.py:628-629); this helper
    constructs exactly that by rotating the straight walk about z in 45°
    increments — the same world-frame transform the env's own reset-time
    rotation augmentation applies (unitreeA1.py:270-291): trunk x/y
    positions and velocities rotate, yaw and the dir-arrow rotation matrix
    compose with Rz(theta), joint-local channels are unchanged.

    Deterministic; writes `dst` once and returns it.
    """
    if dst.exists():
        return dst
    d = dict(np.load(src, allow_pickle=True))
    n = len(np.asarray(d["q_trunk_tx"]))
    split = np.asarray(d.pop("split_points", np.array([0, n])))
    out: dict = {k: [] for k in d}
    new_split = [0]
    for k8 in range(8):
        th = k8 * np.pi / 4.0
        c, s = np.cos(th), np.sin(th)
        rz = np.array([[c, -s, 0.0], [s, c, 0.0], [0.0, 0.0, 1.0]])
        for key, val in d.items():
            val = np.asarray(val)
            if key in ("q_trunk_tx", "dq_trunk_tx"):
                pre = "dq" if key.startswith("dq") else "q"
                y = np.asarray(d[f"{pre}_trunk_ty"])
                out[key].append(c * val - s * y)
            elif key in ("q_trunk_ty", "dq_trunk_ty"):
                pre = "dq" if key.startswith("dq") else "q"
                x = np.asarray(d[f"{pre}_trunk_tx"])
                out[key].append(s * x + c * val)
            elif key == "q_trunk_rotation":
                out[key].append(val + th)
            elif key == "dir_arrow":
                m = val.reshape(-1, 3, 3)
                out[key].append((rz[None] @ m).reshape(-1, 9))
            else:
                out[key].append(val)
        new_split.extend((split[1:] + k8 * n).tolist())
    arrs = {k: np.concatenate(v) for k, v in out.items()}
    arrs["split_points"] = np.asarray(new_split, dtype=np.int64)
    dst.parent.mkdir(parents=True, exist_ok=True)
    np.savez(dst, **arrs)
    return dst
