"""Trajectory engine — dataset loading, resampling, and device-resident
sampling (redesign of reference `loco_mujoco/utils/trajectory.py`).

Host side (numpy/scipy, runs once at env build): load the .npz keyed by
observation names (+ optional split_points / goal* keys), split into
equal-length trajectories, cubically resample traj_dt -> control_dt through
the env's map/remap hooks (trajectory.py:184-234), and pack everything into
ONE flat (n_traj, T, sample_dim) array whose column layout matches the env's
observation spec (plus trailing goal keys).

Device side: the flat array lives on device; a reset sample is a single
gather `flat[traj_no, step]` with the global x/y columns zeroed (the
reference recentres x/y at reset — trajectory.py:268-269). Everything is
jit/vmap friendly: thousands of envs sample resets in one fused gather.
"""

from __future__ import annotations

import warnings
from typing import Callable, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from scipy import interpolate

from ..native import cubic_resample_uniform as _native_cubic


def _cubic_axis1(x, traj, x_new):
    """Cubic (not-a-knot) resample along axis 1, matching
    scipy.interpolate.interp1d(kind="cubic"). Uses the native C++ loader
    kernel (loco_mujoco_tpu/native) when available — the host-side hot
    spot of env construction (reference utils/trajectory.py:184-234) —
    with scipy as fallback and parity oracle (tests/test_native.py)."""
    try:
        arr = np.asarray(traj, dtype=np.float64)
    except (ValueError, TypeError):
        arr = None
    if arr is not None and arr.ndim >= 2 and arr.shape[1] == len(x):
        got = _native_cubic(np.moveaxis(arr, 1, -1), x_new)
        if got is not None:
            return np.moveaxis(got, -1, 1)
    return interpolate.interp1d(x, traj, kind="cubic", axis=1)(x_new)


def load_dataset_and_get_traj_files(dataset_path, keys, freq=None):
    """Convert a perfect/preference dataset (states/actions/absorbing/last
    arrays) into per-key trajectory files — port of reference
    base.py:499-549. The first two keys are the global x/y positions, which
    perfect datasets omit; when `freq` is given they are re-integrated from
    the matching velocity columns, else zero-filled.

    Returns a dict usable as TrajectoryData(traj_files=...).
    """
    dataset = np.load(str(dataset_path), allow_pickle=True)
    states = np.atleast_2d(dataset["states"])
    last = dataset["last"] if "last" in dataset else None

    num = len(states)
    out = {}
    for i, key in enumerate(keys):
        if i < 2:
            if freq is None:
                data = np.zeros(num)
            else:
                dt = 1.0 / float(freq)
                vel_idx = keys.index("d" + key) - 2
                data = [0.0]
                for j, v in enumerate(states[:-1, vel_idx], 1):
                    if last is not None and last[j - 1] == 1:
                        data.append(0.0)
                    else:
                        data.append(data[-1] + dt * v)
                data = np.asarray(data)
        else:
            data = states[:, i - 2]
        out[key] = data

    if last is not None and num > 2:
        out["split_points"] = np.concatenate(
            [[0], np.squeeze(np.argwhere(last == 1) + 1)]
        )
    if "actions" in dataset:
        out["actions"] = np.asarray(dataset["actions"])
    return out


class TrajectoryData:
    def __init__(
        self,
        keys: Sequence[str],
        key_dims: Sequence[int],
        traj_path: str | None = None,
        traj_files: dict | None = None,
        traj_dt: float = 0.002,
        control_dt: float = 0.01,
        ignore_keys: Sequence[str] | None = None,
        low: np.ndarray | None = None,
        high: np.ndarray | None = None,
        joint_pos_idx: Sequence[int] | None = None,
        interpolate_map: Callable | None = None,
        interpolate_remap: Callable | None = None,
        interpolate_map_params: dict | None = None,
        interpolate_remap_params: dict | None = None,
        clip_trajectory_to_joint_ranges: bool = False,
        traj_info: Sequence | None = None,
        warn: bool = True,
        dtype=jnp.float32,
    ):
        assert (traj_path is None) != (traj_files is None)
        if traj_path is not None:
            files = dict(np.load(traj_path, allow_pickle=True).items())
        else:
            files = dict(traj_files)

        keys = list(keys)
        key_dims = list(key_dims)

        # joint-range check / clip (trajectory.py:275-301)
        if (warn or clip_trajectory_to_joint_ranges) and low is not None:
            j_idx = list(joint_pos_idx)[2:]
            highs = dict(zip(keys[2:], high))
            lows = dict(zip(keys[2:], low))
            for i, (k, d) in enumerate(files.items()):
                if i in j_idx and k in keys:
                    if warn:
                        msg = (
                            "Clipping the trajectory into range!"
                            if clip_trajectory_to_joint_ranges
                            else ""
                        )
                        if np.max(d) > highs[k]:
                            warnings.warn(
                                f"Trajectory violates joint range in {k}. "
                                f"Max {np.max(d)} > {highs[k]}. {msg}",
                                RuntimeWarning,
                            )
                        elif np.min(d) < lows[k]:
                            warnings.warn(
                                f"Trajectory violates joint range in {k}. "
                                f"Min {np.min(d)} < {lows[k]}. {msg}",
                                RuntimeWarning,
                            )
                    if clip_trajectory_to_joint_ranges:
                        files[k] = np.clip(files[k], lows[k], highs[k])

        # goal keys are appended automatically (trajectory.py:64-66)
        for k in files:
            if k.startswith("goal") and k not in keys:
                keys.append(k)
                v = np.asarray(files[k])
                key_dims.append(1 if v.ndim == 1 else int(np.prod(v.shape[1:])))
        if ignore_keys:
            for ik in ignore_keys:
                i = keys.index(ik)
                keys.pop(i)
                key_dims.pop(i)

        self.keys = keys
        self.key_dims = key_dims

        n_samples = len(np.asarray(files[keys[0]]))
        if "split_points" in files:
            split_points = np.asarray(files["split_points"]).astype(int)
        else:
            split_points = np.array([0, n_samples])

        # per-key arrays split into (n_traj, len, dim); unequal-length
        # trajectories (preference-dataset concatenation,
        # base_robot_humanoid.py:231-256) are padded with their last sample
        # to the max length and the true lengths kept for sampling
        lens = np.diff(split_points)
        max_len = int(lens.max())
        self.traj_lengths = lens.astype(int)
        per_key = []
        for k, dim in zip(keys, key_dims):
            v = np.asarray(files[k], dtype=np.float64)
            v = v.reshape(n_samples, -1)
            parts = np.split(v, split_points[1:-1])
            if len(set(lens)) > 1:
                parts = [
                    np.concatenate(
                        [p, np.repeat(p[-1:], max_len - len(p), axis=0)]
                    )
                    if len(p) < max_len
                    else p
                    for p in parts
                ]
            per_key.append(np.stack(parts))  # (n_traj, len, dim)

        self.traj_dt = traj_dt
        self.control_dt = control_dt

        if traj_dt != control_dt:
            per_key = self._interpolate(
                per_key,
                interpolate_map,
                interpolate_remap,
                interpolate_map_params,
                interpolate_remap_params,
            )

        self.n_traj = per_key[0].shape[0]
        self.traj_len = per_key[0].shape[1]
        if traj_info is not None:
            assert len(traj_info) == self.n_traj, (
                "need one trajectory info/label per trajectory"
            )
        self.traj_info = list(traj_info) if traj_info is not None else None
        # interpolation rescales lengths with the dt ratio
        self.traj_lengths = np.minimum(
            np.round(self.traj_lengths * (traj_dt / control_dt)).astype(int),
            self.traj_len,
        )
        self._lens_j = jnp.asarray(self.traj_lengths)
        self._equal_lens = bool(np.all(self.traj_lengths == self.traj_len))
        flat = np.concatenate(per_key, axis=-1)  # (n_traj, T, sample_dim)
        self.sample_dim = flat.shape[-1]
        self.flat_np = flat
        self.flat = jnp.asarray(flat, dtype=dtype)

        offs = np.cumsum([0] + key_dims)
        self.key_slices = {
            k: slice(int(offs[i]), int(offs[i + 1])) for i, k in enumerate(keys)
        }

    # ---- host-side interpolation (reference trajectory.py:184-234) --------
    def _interpolate(self, per_key, map_f, remap_f, map_p, remap_p):
        n_traj = per_key[0].shape[0]
        tlen = per_key[0].shape[1]
        factor = self.traj_dt / self.control_dt
        x = np.arange(tlen)
        x_new = np.linspace(0, tlen - 1, round(tlen * factor), endpoint=True)

        out = [[] for _ in per_key]
        for t in range(n_traj):
            # reference passes a list of per-key 1-D (or (T, dim)) arrays
            traj = [
                per_key[i][t, :, 0] if per_key[i].shape[-1] == 1
                else per_key[i][t]
                for i in range(len(per_key))
            ]
            if map_f is not None:
                traj = map_f(traj, **(map_p or {}))
            else:
                traj = np.asarray(traj)
            new = _cubic_axis1(x, traj, x_new)
            if remap_f is not None:
                new = remap_f(new, **(remap_p or {}))
            for i in range(len(per_key)):
                arr = np.asarray(new[i])
                out[i].append(arr.reshape(arr.shape[0], -1))
        return [np.stack(o) for o in out]

    # ---- device-side sampling --------------------------------------------
    def sample_reset(self, rng, xy_cols=(0, 1), traj_lo=0, traj_hi=None):
        """Random (traj, step) reset sample with x/y recentred to zero.
        traj_lo/traj_hi (possibly traced) restrict the trajectory range —
        used by multi-model envs whose dataset is ordered per variant
        (reference scaling_trajectory_map, base_humanoid_4_ages.py:132-136).
        Returns (sample (sample_dim,), traj_no, step)."""
        k1, k2 = jax.random.split(rng)
        if traj_hi is None:
            traj_hi = self.n_traj
        traj_no = traj_lo + jax.random.randint(
            k1, (), 0, jnp.asarray(traj_hi) - traj_lo
        )
        hi = (
            self.traj_len
            if self._equal_lens
            else self._lens_j[traj_no]
        )
        step = jax.random.randint(k2, (), 0, hi)
        sample = self.flat[traj_no, step]
        for c in xy_cols:
            sample = sample.at[c].set(0.0)
        return sample, traj_no, step

    def sample_at(self, traj_no, step, xy_cols=(0, 1)):
        sample = self.flat[traj_no, step]
        for c in xy_cols:
            sample = sample.at[c].set(0.0)
        return sample, traj_no, step

    def get_from_sample(self, sample, key):
        return sample[self.key_slices[key]]

    # ---- imitation dataset (reference trajectory.py:104-151) --------------
    def create_dataset(self, ignore_keys=None, state_callback=None,
                       state_callback_params=None, traj_info=None):
        """states/next_states/absorbing/last arrays for IL algorithms."""
        keep = np.ones(self.sample_dim, dtype=bool)
        if ignore_keys:
            for k in ignore_keys:
                keep[self.key_slices[k]] = False
        states_per_traj = self.flat_np[:, :, keep]  # (n_traj, T, d)

        if state_callback is not None:
            out = []
            for tr in states_per_traj.reshape(-1, states_per_traj.shape[-1]):
                out.append(state_callback(tr, **(state_callback_params or {})))
            states_per_traj = np.asarray(out).reshape(
                self.n_traj, self.traj_len, -1
            )

        # respect true per-trajectory lengths (padding excluded)
        new_states = np.concatenate(
            [states_per_traj[t, : self.traj_lengths[t] - 1]
             for t in range(self.n_traj)]
        )
        new_next = np.concatenate(
            [states_per_traj[t, 1: self.traj_lengths[t]]
             for t in range(self.n_traj)]
        )
        absorbing = np.zeros(len(new_states))
        last = np.concatenate(
            [
                np.concatenate([np.zeros(self.traj_lengths[t] - 2), [1.0]])
                for t in range(self.n_traj)
            ]
        )
        out = dict(
            states=new_states, next_states=new_next, absorbing=absorbing,
            last=last,
        )
        if traj_info is None:
            traj_info = self.traj_info
        if traj_info is not None:
            info = np.concatenate(
                [[l] * (self.traj_lengths[t] - 1)
                 for t, l in enumerate(traj_info)]
            )
            out["info"] = info
        return out
