"""Data-parallel multi-session execution: many robots / worlds at once.

The reference runs exactly one robot (SLAM.m); here a fleet of independent
SLAM sessions runs as ONE vmapped device program, with the batch dimension
sharded over the mesh's ``data`` axis — the data-parallel complement to the
``map``-axis covariance sharding (parallel/sharded.py).  Use cases: swarm
mapping, Monte-Carlo evaluation of tuning constants, and batched replay of
recorded logs.

Everything vmaps because the single-session step is a pure function of
fixed-shape pytrees — no code changes, just jax.vmap + shardings.
"""
from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..config import EKFParams, RansacParams
from ..session import SessionCarry, SlamSession, StepOutput


@dataclasses.dataclass
class FleetSlamSession:
    """N independent sessions advanced in lockstep (vmapped single-session
    tick), batch dim sharded over the mesh's data axis when provided."""

    n_sessions: int
    algorithm: str = "EKF_SLAM_UC"
    ekf_params: Optional[EKFParams] = None
    ransac_params: Optional[RansacParams] = None
    mesh: Optional[Mesh] = None
    seed: int = 0

    def __post_init__(self):
        self._inner = SlamSession(
            algorithm=self.algorithm, ekf_params=self.ekf_params,
            ransac_params=self.ransac_params, seed=self.seed)
        self.ekf_params = self._inner.ekf_params
        self.ransac_params = self._inner.ransac_params
        step = self._inner._make_step()
        vstep = jax.vmap(step, in_axes=(0, 0, 0, None))

        def shard_carry(carry):
            if self.mesh is None:
                return carry
            sh = NamedSharding(self.mesh, P("data"))
            return jax.tree_util.tree_map(
                lambda a: jax.lax.with_sharding_constraint(
                    a, NamedSharding(
                        self.mesh,
                        P("data", *([None] * (a.ndim - 1))))), carry)

        def vstep_sharded(carry, odom, ranges, beam_angles):
            carry, out = vstep(carry, odom, ranges, beam_angles)
            return shard_carry(carry), out

        self._step = jax.jit(vstep_sharded)

        def scan_all(carry, odom_all, ranges_all, beam_angles):
            def body(c, inp):
                o, r = inp
                return vstep_sharded(c, o, r, beam_angles)
            return jax.lax.scan(body, carry, (odom_all, ranges_all))

        self._run = jax.jit(scan_all)

    def init_carry(self, first_odoms=None) -> SessionCarry:
        def one(i):
            c = self._inner.init_carry()
            return c._replace(key=jax.random.PRNGKey(self.seed + i))
        carries = [one(i) for i in range(self.n_sessions)]
        carry = jax.tree_util.tree_map(
            lambda *xs: jnp.stack(xs), *carries)
        if first_odoms is not None:
            carry = carry._replace(
                old_odom=jnp.asarray(first_odoms, self.ekf_params.dtype))
        if self.mesh is not None:
            carry = jax.device_put(carry, NamedSharding(self.mesh, P()))
        return carry

    def step(self, carry, odom_poses, ranges, beam_angles
             ) -> Tuple[SessionCarry, StepOutput]:
        """One tick for all sessions: odom [N,3], ranges [N,B]."""
        return self._step(carry, jnp.asarray(odom_poses),
                          jnp.asarray(ranges), jnp.asarray(beam_angles))

    def run(self, odom_poses, ranges, beam_angles, carry=None
            ) -> Tuple[SessionCarry, StepOutput]:
        """Full sequences for all sessions: odom [T,N,3], ranges [T,N,B]."""
        if carry is None:
            carry = self.init_carry(first_odoms=odom_poses[0])
        return self._run(carry, jnp.asarray(odom_poses),
                         jnp.asarray(ranges), jnp.asarray(beam_angles))
