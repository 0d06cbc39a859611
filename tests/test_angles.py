"""Degree-trig helpers vs MATLAB builtin semantics (SURVEY.md: angles are in
degrees throughout the reference)."""
import jax.numpy as jnp
import numpy as np

from ekf_slam_tpu.ops import angles


def test_cosd_sind():
    a = jnp.array([0.0, 30.0, 90.0, 180.0, 270.0, 360.0, -45.0])
    np.testing.assert_allclose(angles.cosd(a), np.cos(np.deg2rad(a)),
                               atol=1e-12)
    np.testing.assert_allclose(angles.sind(a), np.sin(np.deg2rad(a)),
                               atol=1e-12)


def test_wrap_to_360_matlab_semantics():
    # MATLAB wrapTo360: [0,360]; positive multiples of 360 -> 360.
    x = jnp.array([0.0, 360.0, 720.0, -360.0, -0.5, 359.5, 361.0, -720.0])
    w = angles.wrap_to_360(x)
    np.testing.assert_allclose(
        w, [0.0, 360.0, 360.0, 0.0, 359.5, 359.5, 1.0, 0.0], atol=1e-12)


def test_wrap_to_180():
    x = jnp.array([0.0, 180.0, -180.0, 190.0, -190.0, 540.0])
    w = angles.wrap_to_180(x)
    np.testing.assert_allclose(w, [0.0, -180.0, -180.0, -170.0, 170.0, -180.0],
                               atol=1e-12)


def test_angdiff_matches_matlab_usage():
    # SLAM.m:106: delta = rad2deg(angdiff(deg2rad(old), deg2rad(new)))
    assert float(angles.angdiff_deg(350.0, 10.0)) == 20.0
    assert float(angles.angdiff_deg(10.0, 350.0)) == -20.0


def test_atand_two_quadrant():
    # RANSAC.m:160 quirk: atand(y/x) is two-quadrant.
    v = angles.atand(jnp.array([1.0, -1.0]))
    np.testing.assert_allclose(v, [45.0, -45.0], atol=1e-12)


def test_atan2d_four_quadrant():
    assert float(angles.atan2d(1.0, -1.0)) == 135.0
