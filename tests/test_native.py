"""Native C++ data-loader kernel vs the scipy oracle.

The cubic resampler (loco_mujoco_tpu/native/src/resample.cpp) must equal
scipy.interpolate.interp1d(kind="cubic") — the exact semantics of the
reference's trajectory engine (reference utils/trajectory.py:184-234) —
to machine precision, including multi-dim keys and endpoint queries."""

import numpy as np
import pytest
from scipy import interpolate

from loco_mujoco_tpu import native
from loco_mujoco_tpu.datasets.trajectory import _cubic_axis1


@pytest.mark.skipif(not native.available(), reason="no C++ toolchain")
@pytest.mark.parametrize("T", [4, 5, 33, 1000])
def test_cubic_matches_scipy(T):
    rng = np.random.default_rng(T)
    y = rng.standard_normal((11, T))
    xn = np.linspace(0.0, T - 1, round(T * 2.37), endpoint=True)
    ref = interpolate.interp1d(np.arange(T), y, kind="cubic", axis=1)(xn)
    got = native.cubic_resample_uniform(y, xn)
    assert got is not None
    np.testing.assert_allclose(got, ref, atol=1e-12, rtol=0)


@pytest.mark.skipif(not native.available(), reason="no C++ toolchain")
def test_cubic_axis1_multidim():
    """(K, T, d) keys — SITE_ROT rotmats etc. — take the native path and
    agree with scipy along axis 1."""
    rng = np.random.default_rng(7)
    arr = rng.standard_normal((3, 50, 9))
    x = np.arange(50)
    xn = np.linspace(0.0, 49.0, 250, endpoint=True)
    ref = interpolate.interp1d(x, arr, kind="cubic", axis=1)(xn)
    got = _cubic_axis1(x, arr, xn)
    np.testing.assert_allclose(got, ref, atol=1e-12, rtol=0)


def test_cubic_axis1_list_input():
    """List-of-rows input (the reference passes per-key lists) resolves
    through the same path and matches scipy."""
    rng = np.random.default_rng(3)
    rows = [rng.standard_normal(40) for _ in range(5)]
    x = np.arange(40)
    xn = np.linspace(0.0, 39.0, 97, endpoint=True)
    ref = interpolate.interp1d(x, np.asarray(rows), kind="cubic", axis=1)(xn)
    got = _cubic_axis1(x, rows, xn)
    np.testing.assert_allclose(got, ref, atol=1e-12, rtol=0)
