"""Degree-valued trigonometry.

The reference does ALL its angle math in degrees (cosd/sind/atan2d/wrapTo360
throughout, e.g. EKF_SLAM.m:42-65, Correspondence.m:36-56, RANSAC.m:103).
These helpers reproduce the MATLAB builtins' semantics so the filter state can
carry theta in degrees for bit-parity, with a single conversion point.
"""
from __future__ import annotations

import jax.numpy as jnp

_DEG2RAD = jnp.pi / 180.0


def cosd(x):
    """MATLAB cosd: cosine of an angle in degrees."""
    return jnp.cos(x * _DEG2RAD)


def sind(x):
    """MATLAB sind: sine of an angle in degrees."""
    return jnp.sin(x * _DEG2RAD)


def tand(x):
    return jnp.tan(x * _DEG2RAD)


def atand(x):
    """MATLAB atand: two-quadrant arctangent in degrees, range (-90, 90).

    The reference uses atand(y/x) for its RANSAC bearing window
    (RANSAC.m:160-166) — deliberately two-quadrant, a documented quirk.
    """
    return jnp.arctan(x) / _DEG2RAD


def atan2d(y, x):
    """MATLAB atan2d: four-quadrant arctangent in degrees, range (-180, 180]."""
    return jnp.arctan2(y, x) / _DEG2RAD


def wrap_to_360(x):
    """MATLAB wrapTo360: wrap to [0, 360].

    Positive multiples of 360 map to 360 (not 0); everything else is
    mod-360 into [0, 360).  Used after every theta update (EKF_SLAM.m:50)
    and on predicted bearings (EKF_SLAM_UC.m:131).
    """
    w = jnp.mod(x, 360.0)
    return jnp.where((w == 0.0) & (x > 0.0), 360.0, w)


def wrap_to_180(x):
    """Wrap to [-180, 180) — the 'correct math' innovation wrap the reference
    omits (EKF_SLAM_UC.m:145 subtracts bearings without re-wrapping)."""
    return jnp.mod(x + 180.0, 360.0) - 180.0


def angdiff_deg(a, b):
    """MATLAB angdiff(a, b) lifted to degrees: (b - a) wrapped to [-180, 180).

    Matches the control-vector construction ``rad2deg(angdiff(deg2rad(old),
    deg2rad(new)))`` at SLAM.m:106.
    """
    return wrap_to_180(b - a)
