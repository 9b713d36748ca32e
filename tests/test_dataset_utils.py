"""Unit tests for the mocap retargeting pipeline (utils/dataset.py).

Locks the `adapt_mocap` contract the conversion scripts rely on
(reference behavior: loco_mujoco/utils/dataset.py:114-203): linear
per-joint transforms, renames, constant/zero fill for missing joints,
and head/tail trimming.
"""

import numpy as np
import pytest
import scipy.io as sio

from loco_mujoco_tpu.utils import adapt_mocap


@pytest.fixture()
def mat_path(tmp_path):
    rng = np.random.default_rng(0)
    n = 50
    names = np.array(
        [["hip_flexion_r"], ["knee_angle_r"], ["ankle_angle_r"]],
        dtype=object,
    )
    pos = rng.normal(size=(3, n))
    vel = rng.normal(size=(3, n))
    goal = rng.normal(size=(1, n))
    p = tmp_path / "capture.mat"
    sio.savemat(
        p,
        {"angJoi": pos, "angDJoi": vel, "rowNameIK": names, "goal": goal},
    )
    return p, pos, vel, goal


def test_adapt_mocap_transform_rename_fill_trim(mat_path):
    p, pos, vel, goal = mat_path
    out = adapt_mocap(
        p,
        joint_conf={
            "hip_flexion_r": (2.0, 0.5),
            "knee_angle_r": (-1.0, 0.0),
        },
        unavailable_keys={"lumbar_extension": 0.25},
        rename_map={"knee_angle_r": "knee_r"},
        discard_first=5,
        discard_last=3,
    )
    n_keep = 50 - 5 - 3
    # linear transform on positions, multiplier-only on velocities
    np.testing.assert_allclose(
        out["q_hip_flexion_r"], (pos[0] * 2.0 + 0.5)[5:-3]
    )
    np.testing.assert_allclose(out["dq_hip_flexion_r"], (vel[0] * 2.0)[5:-3])
    # rename applies to both q_ and dq_ keys
    assert "q_knee_r" in out and "q_knee_angle_r" not in out
    np.testing.assert_allclose(out["q_knee_r"], (-pos[1])[5:-3])
    # constant fill for unavailable joints; zero velocity
    np.testing.assert_allclose(out["q_lumbar_extension"], np.full(n_keep, 0.25))
    np.testing.assert_allclose(out["dq_lumbar_extension"], np.zeros(n_keep))
    # goal channel carried through with the same trim
    np.testing.assert_allclose(out["goal"], goal[0, 5:-3])
    assert all(v.shape == (n_keep,) for v in out.values())


def test_adapt_mocap_list_fill_and_no_trim(mat_path):
    p, pos, vel, _ = mat_path
    out = adapt_mocap(
        p,
        joint_conf={"ankle_angle_r": (1.0, 0.0)},
        unavailable_keys=["pelvis_tx"],
    )
    np.testing.assert_allclose(out["q_ankle_angle_r"], pos[2])
    np.testing.assert_allclose(out["q_pelvis_tx"], np.zeros(50))
    with pytest.raises(TypeError):
        adapt_mocap(p, joint_conf={}, unavailable_keys="pelvis_tx")


def test_zenodo_urls_match_reference_records():
    """The download CLIs must point at the records the reference uses
    (reference dataset.py:34,47,68,81)."""
    from loco_mujoco_tpu.utils.dataset import ZENODO_URLS

    for kind in ("humanoid_real", "quadruped_real",
                 "humanoid_perfect", "quadruped_perfect"):
        assert "zenodo.org/records/13737593" in ZENODO_URLS[kind], kind
    assert "zenodo.org/records/10625721" in ZENODO_URLS["raw_mocap"]


def test_synthesize_walk_8_dir(tmp_path):
    """The synthetic A1 'hard' debug dataset: 8 rotated copies of the
    straight walk with world-frame channels rotated and joint-local
    channels untouched (the transform the env's reset rotation
    augmentation applies, reference unitreeA1.py:270-291)."""
    from loco_mujoco_tpu.utils.dataset import synthesize_walk_8_dir

    rng = np.random.default_rng(0)
    n = 40
    src = {
        "q_trunk_tx": rng.normal(size=n),
        "q_trunk_ty": rng.normal(size=n),
        "q_trunk_rotation": rng.normal(size=n),
        "dq_trunk_tx": rng.normal(size=n),
        "dq_trunk_ty": rng.normal(size=n),
        "q_FR_hip_joint": rng.normal(size=n),
        "dir_arrow": np.tile(np.eye(3).reshape(9), (n, 1)),
        "goal_speed": np.full(n, 0.5),
        "split_points": np.array([0, 20, 40]),
    }
    sp = tmp_path / "src.npz"
    np.savez(sp, **src)
    dst = synthesize_walk_8_dir(sp, tmp_path / "out.npz")
    d = np.load(dst)
    # 8 copies, split points per copy
    assert len(d["q_trunk_tx"]) == 8 * n
    np.testing.assert_array_equal(
        d["split_points"][:5], [0, 20, 40, 60, 80]
    )
    # copy k=2 (90 deg): x' = -y, y' = x; yaw' = yaw + pi/2
    s = slice(2 * n, 3 * n)
    np.testing.assert_allclose(
        d["q_trunk_tx"][s], -src["q_trunk_ty"], atol=1e-12
    )
    np.testing.assert_allclose(
        d["q_trunk_ty"][s], src["q_trunk_tx"], atol=1e-12
    )
    np.testing.assert_allclose(
        d["q_trunk_rotation"][s], src["q_trunk_rotation"] + np.pi / 2
    )
    # joint-local channel unchanged; dir arrow rotated by Rz(pi/2)
    np.testing.assert_allclose(d["q_FR_hip_joint"][s], src["q_FR_hip_joint"])
    m = d["dir_arrow"][2 * n].reshape(3, 3)
    np.testing.assert_allclose(
        m, np.array([[0, -1, 0], [1, 0, 0], [0, 0, 1.0]]), atol=1e-12
    )
    # velocities rotate like positions
    np.testing.assert_allclose(
        d["dq_trunk_tx"][s], -src["dq_trunk_ty"], atol=1e-12
    )
    # idempotent: second call returns the cached file
    assert synthesize_walk_8_dir(sp, dst) == dst
