"""Keyframe pose-graph optimizer: convergence + loop-closure drift removal."""
import jax
import jax.numpy as jnp
import numpy as np

from ekf_slam_tpu.parallel import posegraph as pg


def build_square_graph(drift=0.0, noise=0.0, seed=0, dtype=jnp.float64):
    """Drive a square loop: true poses at the corners, odometry edges with
    optional drift, and a loop-closure edge back to the start."""
    rng = np.random.default_rng(seed)
    true = [np.array([0.0, 0.0, 0.0])]
    steps = []
    for leg in range(4):
        for _ in range(5):
            steps.append(np.array([0.4, 0.0, 0.0]))
        steps.append(np.array([0.0, 0.0, 90.0]))
    p = true[0]
    for s in steps:
        th = np.deg2rad(p[2])
        R = np.array([[np.cos(th), -np.sin(th)], [np.sin(th), np.cos(th)]])
        p = np.concatenate([p[:2] + R @ s[:2], [np.mod(p[2] + s[2], 360)]])
        true.append(p)
    true = np.array(true)

    g = pg.init_graph(64, 128, dtype)
    # initial guesses integrate DRIFTED odometry
    est = true[0].copy()
    g, _ = pg.add_node(g, jnp.asarray(est, dtype))
    prev = 0
    for t, s in enumerate(steps):
        sz = s.copy()
        sz[:2] += rng.normal(0, noise, 2) + drift
        sz[2] += drift * 40.0     # angular drift dominates position error
        th = np.deg2rad(est[2])
        R = np.array([[np.cos(th), -np.sin(th)], [np.sin(th), np.cos(th)]])
        est = np.concatenate([est[:2] + R @ sz[:2],
                              [np.mod(est[2] + sz[2], 360)]])
        g, nid = pg.add_node(g, jnp.asarray(est, dtype))
        g = pg.add_edge(g, prev, nid, jnp.asarray(sz, dtype),
                        jnp.asarray([10.0, 10.0, 10.0], dtype))
        prev = nid
    return g, true


def test_consistent_graph_stays_put():
    g, true = build_square_graph(drift=0.0, noise=0.0)
    g2 = pg.optimize(g, iters=5)
    n = int(g.n_nodes)
    np.testing.assert_allclose(np.asarray(g2.nodes[:n, :2]),
                               np.asarray(g.nodes[:n, :2]), atol=1e-6)


def test_loop_closure_removes_drift():
    g, true = build_square_graph(drift=0.01, noise=0.001)
    n = int(g.n_nodes)
    # drifted odometry: final node should be off the true loop end
    err_before = np.linalg.norm(np.asarray(g.nodes[n - 1, :2])
                                - true[n - 1, :2])
    assert err_before > 0.05

    # loop closure: node n-1 observes node 0 at the TRUE relative pose
    z_loop = pg.relative_pose(jnp.asarray(true[n - 1]),
                              jnp.asarray(true[0]))
    g = pg.add_edge(g, n - 1, 0, z_loop,
                    jnp.asarray([100.0, 100.0, 100.0], jnp.float64))
    g2 = pg.optimize(g, iters=15)
    # the loop closure must snap the revisit node back onto the start...
    err_final_before = np.linalg.norm(np.asarray(g.nodes[n - 1, :2])
                                      - true[n - 1, :2])
    err_final_after = np.linalg.norm(np.asarray(g2.nodes[n - 1, :2])
                                     - true[n - 1, :2])
    assert err_final_after < 0.1 * err_final_before
    # ...and improve the trajectory overall (interior nodes stay partially
    # pulled by the biased odometry edges — that is correct GN behavior)
    d_before = np.linalg.norm(np.asarray(g.nodes[:n, :2]) - true[:n, :2],
                              axis=1).mean()
    d_after = np.linalg.norm(np.asarray(g2.nodes[:n, :2]) - true[:n, :2],
                             axis=1).mean()
    assert d_after < 0.7 * d_before, (d_before, d_after)


def test_relative_pose_roundtrip():
    pa = jnp.asarray([1.0, 2.0, 30.0], jnp.float64)
    pb = jnp.asarray([2.5, 1.0, 95.0], jnp.float64)
    z = pg.relative_pose(pa, pb)
    # compose pa ⊕ z must give pb
    th = np.deg2rad(30.0)
    R = np.array([[np.cos(th), -np.sin(th)], [np.sin(th), np.cos(th)]])
    t = np.asarray(pa[:2]) + R @ np.asarray(z[:2])
    np.testing.assert_allclose(t, [2.5, 1.0], atol=1e-9)
    np.testing.assert_allclose(
        np.mod(30.0 + float(z[2]), 360.0), 95.0, atol=1e-9)


def test_optimize_is_jittable():
    g, _ = build_square_graph()
    f = jax.jit(lambda g: pg.optimize(g, iters=3))
    g2 = f(g)
    assert np.all(np.isfinite(np.asarray(g2.nodes)))


def test_capacity_masking():
    g = pg.init_graph(max_nodes=2, max_edges=1, dtype=jnp.float64)
    g, i0 = pg.add_node(g, jnp.asarray([0.0, 0.0, 0.0], jnp.float64))
    g, i1 = pg.add_node(g, jnp.asarray([1.0, 0.0, 0.0], jnp.float64))
    g, i2 = pg.add_node(g, jnp.asarray([2.0, 0.0, 0.0], jnp.float64))  # drop
    assert int(g.n_nodes) == 2
    g = pg.add_edge(g, 0, 1, jnp.asarray([1.0, 0, 0], jnp.float64),
                    jnp.ones(3, jnp.float64))
    g = pg.add_edge(g, 1, 0, jnp.asarray([-1.0, 0, 0], jnp.float64),
                    jnp.ones(3, jnp.float64))  # dropped
    assert int(g.n_edges) == 1
