"""ekf_slam_tpu — a TPU-native EKF-SLAM engine.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of
SamShue/EKF_SLAM (2-D feature-based EKF-SLAM: RANSAC wall/landmark
extraction, ML data association, dense joint-covariance EKF), built for
fixed-shape jit compilation, batched association, and covariance tiles
sharded over TPU meshes.
"""

from . import config
from .config import EKFParams, MeshConfig, RansacParams, SimConfig
from .state import FilterState, init_state

__version__ = "0.1.0"

__all__ = [
    "config", "EKFParams", "RansacParams", "SimConfig", "MeshConfig",
    "FilterState", "init_state",
]
