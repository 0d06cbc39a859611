"""Keyframe pose graph: SE(2) Gauss-Newton optimization under jit.

No reference analog — the reference's only global consistency is the single
dense EKF (SURVEY.md §5).  At map scale the engine partitions the world into
landmark blocks (parallel/sharded.py); this layer ties the blocks together:
keyframe poses + relative-pose constraints (odometry chains and loop
closures), optimized by fixed-iteration Gauss-Newton (BASELINE.json
config 5: "keyframe pose-graph layer for loop closure consistency").

Everything is fixed-capacity and masked: node/edge tables are static shapes,
invalid entries contribute zero information, so the optimizer compiles once.
Angles are degrees at the API (consistent with the filter), radians inside.
"""
from __future__ import annotations

from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp
from jax import lax

from ..ops.angles import wrap_to_180

_D2R = jnp.pi / 180.0


class PoseGraph(NamedTuple):
    nodes: jnp.ndarray       # f[Nk,3] keyframe poses (x, y, theta_deg)
    node_valid: jnp.ndarray  # bool[Nk]
    edge_ij: jnp.ndarray     # i32[Ne,2] (from, to) node ids
    edge_z: jnp.ndarray      # f[Ne,3] relative pose measurement (deg)
    edge_info: jnp.ndarray   # f[Ne,3] diagonal information (x, y, theta)
    edge_valid: jnp.ndarray  # bool[Ne]
    n_nodes: jnp.ndarray     # i32
    n_edges: jnp.ndarray     # i32


def init_graph(max_nodes: int = 256, max_edges: int = 1024,
               dtype=jnp.float32) -> PoseGraph:
    return PoseGraph(
        nodes=jnp.zeros((max_nodes, 3), dtype),
        node_valid=jnp.zeros((max_nodes,), bool),
        edge_ij=jnp.zeros((max_edges, 2), jnp.int32),
        edge_z=jnp.zeros((max_edges, 3), dtype),
        edge_info=jnp.zeros((max_edges, 3), dtype),
        edge_valid=jnp.zeros((max_edges,), bool),
        n_nodes=jnp.zeros((), jnp.int32),
        n_edges=jnp.zeros((), jnp.int32),
    )


def add_node(g: PoseGraph, pose: jnp.ndarray) -> Tuple[PoseGraph, jnp.ndarray]:
    """Masked append of a keyframe; returns (graph, node_id)."""
    i = g.n_nodes
    ok = i < g.nodes.shape[0]

    def do(g):
        return g._replace(
            nodes=g.nodes.at[i].set(pose.astype(g.nodes.dtype)),
            node_valid=g.node_valid.at[i].set(True),
            n_nodes=g.n_nodes + 1)

    return lax.cond(ok, do, lambda g: g, g), i


def add_edge(g: PoseGraph, i, j, z_rel: jnp.ndarray,
             info: jnp.ndarray) -> PoseGraph:
    """Masked append of a relative-pose constraint i → j."""
    e = g.n_edges
    ok = e < g.edge_ij.shape[0]

    def do(g):
        return g._replace(
            edge_ij=g.edge_ij.at[e].set(
                jnp.stack([jnp.asarray(i, jnp.int32),
                           jnp.asarray(j, jnp.int32)])),
            edge_z=g.edge_z.at[e].set(z_rel.astype(g.edge_z.dtype)),
            edge_info=g.edge_info.at[e].set(info.astype(g.edge_info.dtype)),
            edge_valid=g.edge_valid.at[e].set(True),
            n_edges=g.n_edges + 1)

    return lax.cond(ok, do, lambda g: g, g)


def relative_pose(pa: jnp.ndarray, pb: jnp.ndarray) -> jnp.ndarray:
    """t2v(inv(T_a)·T_b) with degree angles — the measurement an odometry
    or loop-closure edge carries."""
    th = pa[2] * _D2R
    c, s = jnp.cos(th), jnp.sin(th)
    d = pb[:2] - pa[:2]
    return jnp.stack([c * d[0] + s * d[1],
                      -s * d[0] + c * d[1],
                      wrap_to_180(pb[2] - pa[2])])


def _residual_and_jac(xi, xj, z):
    """SE(2) edge residual + Jacobians wrt (xi, xj).

    Residual r = [R_iᵀ(t_j − t_i) − t_z ; wrap(θ_j − θ_i − θ_z)], angles in
    radians internally, degree-valued angle components scaled to radians so
    the information matrix acts on commensurate units."""
    thi = xi[2] * _D2R
    c, s = jnp.cos(thi), jnp.sin(thi)
    dx, dy = xj[0] - xi[0], xj[1] - xi[1]
    rt = jnp.stack([c * dx + s * dy - z[0], -s * dx + c * dy - z[1]])
    rth = wrap_to_180(xj[2] - xi[2] - z[2]) * _D2R
    r = jnp.concatenate([rt, rth[None]])

    # d rt / d theta_i (theta in radians)
    drt_dthi = jnp.stack([-s * dx + c * dy, -c * dx - s * dy])
    A = jnp.array([[0.0, 0.0, 0.0], [0.0, 0.0, 0.0], [0.0, 0.0, -1.0]],
                  xi.dtype)
    A = A.at[0, 0].set(-c).at[0, 1].set(-s).at[0, 2].set(drt_dthi[0])
    A = A.at[1, 0].set(s).at[1, 1].set(-c).at[1, 2].set(drt_dthi[1])
    Bm = jnp.zeros((3, 3), xi.dtype)
    Bm = Bm.at[0, 0].set(c).at[0, 1].set(s)
    Bm = Bm.at[1, 0].set(-s).at[1, 1].set(c)
    Bm = Bm.at[2, 2].set(1.0)
    return r, A, Bm


def optimize(g: PoseGraph, iters: int = 10, damping: float = 1e-6
             ) -> PoseGraph:
    """Fixed-iteration Gauss-Newton over all valid nodes/edges.

    Dense normal equations (3Nk × 3Nk) — keyframe graphs are small relative
    to the landmark map, so a dense factorization per iteration is cheap and
    mesh-friendly.  Node 0 is anchored by a strong prior (gauge freedom)."""
    Nk = g.nodes.shape[0]
    dt = g.nodes.dtype

    def gn_iter(nodes, _):
        def per_edge(e):
            i, j = g.edge_ij[e, 0], g.edge_ij[e, 1]
            xi, xj = nodes[i], nodes[j]
            r, A, Bm = _residual_and_jac(xi, xj, g.edge_z[e])
            w = jnp.where(g.edge_valid[e], 1.0, 0.0).astype(dt)
            info = g.edge_info[e] * w
            Om = jnp.diag(info)
            return i, j, r, A, Bm, Om

        idx = jnp.arange(g.edge_ij.shape[0])
        ii, jj, rr, AA, BB, OO = jax.vmap(per_edge)(idx)

        # assemble H, b by scatter-add of 3x3 blocks
        H = jnp.zeros((3 * Nk, 3 * Nk), dt)
        b = jnp.zeros((3 * Nk,), dt)
        AtO = jnp.einsum("eqi,eqp->eip", AA, OO)      # [E,3,3] = Aᵀ·Ω
        BtO = jnp.einsum("eqi,eqp->eip", BB, OO)

        def rows(base):
            return base[:, None] * 3 + jnp.arange(3)[None, :]   # [E,3]

        ri, rj = rows(ii), rows(jj)

        def scat(H, rb, cb, blk):
            return H.at[rb[:, :, None], cb[:, None, :]].add(blk)

        H = scat(H, ri, ri, jnp.einsum("eip,epj->eij", AtO, AA))
        H = scat(H, ri, rj, jnp.einsum("eip,epj->eij", AtO, BB))
        H = scat(H, rj, ri, jnp.einsum("eip,epj->eij", BtO, AA))
        H = scat(H, rj, rj, jnp.einsum("eip,epj->eij", BtO, BB))
        b = b.at[ri].add(jnp.einsum("eip,ep->ei", AtO, rr))
        b = b.at[rj].add(jnp.einsum("eip,ep->ei", BtO, rr))

        # anchor node 0 + damping; freeze invalid nodes with a unit prior
        free = g.node_valid
        diag_prior = jnp.where(free, damping, 1.0).repeat(3)
        H = H + jnp.diag(diag_prior.astype(dt))
        H = H.at[jnp.arange(3), jnp.arange(3)].add(1e6)

        delta = -jnp.linalg.solve(H, b).reshape(Nk, 3)
        delta = delta.at[:, 2].multiply(1.0 / _D2R)   # back to degrees
        nodes = nodes + delta * free[:, None].astype(dt)
        nodes = nodes.at[:, 2].set(wrap_to_180(nodes[:, 2]))
        return nodes, jnp.sum(rr * rr)

    nodes, costs = lax.scan(gn_iter, g.nodes, None, length=iters)
    return g._replace(nodes=nodes)


def optimize_np(g: PoseGraph, iters: int = 20, damping: float = 1e-6
                ) -> PoseGraph:
    """Host-side float64 Gauss-Newton — same math as ``optimize``.

    Why it exists: the normal equations carry a 1e6 gauge prior on node
    0 next to the 1e-6 damping on free nodes — condition ~1e12, fine in
    f64 but GARBAGE in an f32 solve (measured: the 16x16 submap
    campaign's graph NaN'd on chip, where x64 is disabled and the jit
    path silently runs f32).  Keyframe graphs are tiny (tens of nodes),
    so a numpy double solve per iteration costs microseconds and is
    robust regardless of the backend's x64 setting."""
    import numpy as np

    nodes = np.asarray(g.nodes, np.float64).copy()
    valid = np.asarray(g.node_valid)
    eij = np.asarray(g.edge_ij)
    ez = np.asarray(g.edge_z, np.float64)
    einfo = np.asarray(g.edge_info, np.float64)
    evalid = np.asarray(g.edge_valid)
    Nk = nodes.shape[0]
    d2r = np.pi / 180.0

    for _ in range(iters):
        H = np.zeros((3 * Nk, 3 * Nk))
        b = np.zeros(3 * Nk)
        for e in range(len(eij)):
            if not evalid[e]:
                continue
            i, j = int(eij[e, 0]), int(eij[e, 1])
            xi, xj, z = nodes[i], nodes[j], ez[e]
            thi = xi[2] * d2r
            c, s = np.cos(thi), np.sin(thi)
            dx, dy = xj[0] - xi[0], xj[1] - xi[1]
            r = np.array([
                c * dx + s * dy - z[0],
                -s * dx + c * dy - z[1],
                (((xj[2] - xi[2] - z[2]) + 180.0) % 360.0 - 180.0) * d2r,
            ])
            A = np.array([[-c, -s, -s * dx + c * dy],
                          [s, -c, -c * dx - s * dy],
                          [0.0, 0.0, -1.0]])
            B = np.array([[c, s, 0.0], [-s, c, 0.0], [0.0, 0.0, 1.0]])
            Om = np.diag(einfo[e])
            ri = slice(3 * i, 3 * i + 3)
            rj = slice(3 * j, 3 * j + 3)
            AtO, BtO = A.T @ Om, B.T @ Om
            H[ri, ri] += AtO @ A
            H[ri, rj] += AtO @ B
            H[rj, ri] += BtO @ A
            H[rj, rj] += BtO @ B
            b[3 * i:3 * i + 3] += AtO @ r
            b[3 * j:3 * j + 3] += BtO @ r
        diag = np.where(valid, damping, 1.0).repeat(3)
        H += np.diag(diag)
        H[0, 0] += 1e6
        H[1, 1] += 1e6
        H[2, 2] += 1e6
        delta = -np.linalg.solve(H, b).reshape(Nk, 3)
        delta[:, 2] /= d2r
        nodes = nodes + delta * valid[:, None]
        nodes[:, 2] = (nodes[:, 2] + 180.0) % 360.0 - 180.0
    return g._replace(nodes=jnp.asarray(nodes, g.nodes.dtype))


def graph_error(g: PoseGraph) -> jnp.ndarray:
    """Sum of squared (information-weighted) edge residuals."""
    def per_edge(e):
        i, j = g.edge_ij[e, 0], g.edge_ij[e, 1]
        r, _, _ = _residual_and_jac(g.nodes[i], g.nodes[j], g.edge_z[e])
        w = jnp.where(g.edge_valid[e], 1.0, 0.0)
        return w * jnp.sum(r * r * g.edge_info[e])
    return jnp.sum(jax.vmap(per_edge)(jnp.arange(g.edge_ij.shape[0])))
