"""Quaternion helpers for odometry ingestion.

The reference converts ROS odometry quaternions to yaw via
``quat2eul([w x y z])`` (SLAM.m:88-90) and ships an (unused) quaternion
inverse (quatInv.m:1-3).  Provided here so quaternion-valued odometry
sources can feed the session's [x, y, theta_deg] seam.
"""
from __future__ import annotations

import jax.numpy as jnp


def quat_inv(q: jnp.ndarray) -> jnp.ndarray:
    """Quaternion inverse q* / |q|^2 for [w, x, y, z] (quatInv.m:2)."""
    conj = q * jnp.array([1.0, -1.0, -1.0, -1.0], q.dtype)
    return conj / jnp.sum(q * q, axis=-1, keepdims=True)


def quat_to_yaw_deg(q: jnp.ndarray) -> jnp.ndarray:
    """Yaw (Z rotation) in degrees from [w, x, y, z] — the first Euler angle
    of MATLAB quat2eul's default ZYX convention (SLAM.m:89-90)."""
    w, x, y, z = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    yaw = jnp.arctan2(2.0 * (w * z + x * y), 1.0 - 2.0 * (y * y + z * z))
    return jnp.rad2deg(yaw)


def odom_pose_from_quat(position_xy: jnp.ndarray, q: jnp.ndarray
                        ) -> jnp.ndarray:
    """[x, y, wrapTo360(yaw_deg)] as the reference builds odomPose
    (SLAM.m:84-93)."""
    yaw = jnp.mod(quat_to_yaw_deg(q), 360.0)
    return jnp.concatenate([position_xy[..., :2], yaw[..., None]], axis=-1)
