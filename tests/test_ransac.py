"""RANSAC extractor: geometry kernels vs closed form, table semantics vs the
NumPy oracle, wall search statistically on a synthetic room."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ekf_slam_tpu.config import RansacParams
from ekf_slam_tpu.ops import ransac
from ekf_slam_tpu.ops.scan import Scan, scan_from_ranges, scan_to_world
from ekf_slam_tpu.oracle.np_ransac import NpLandmarkTable

PAR = RansacParams(table_capacity=16, dtype=jnp.float64)


# -- geometry ---------------------------------------------------------------

def test_fit_line_matches_polyfit(rng):
    pts = rng.uniform(-3, 3, (50, 2))
    pts[:, 1] = 0.7 * pts[:, 0] - 1.2 + rng.normal(0, 0.05, 50)
    w = np.ones(50)
    m, b, ok = ransac.fit_line(jnp.asarray(pts), jnp.asarray(w))
    ref = np.polyfit(pts[:, 0], pts[:, 1], 1)
    assert bool(ok)
    np.testing.assert_allclose([float(m), float(b)], ref, rtol=1e-9)


def test_fit_line_masked(rng):
    pts = np.zeros((10, 2))
    pts[:5, 0] = np.arange(5)
    pts[:5, 1] = 2.0 * np.arange(5) + 3.0
    pts[5:] = rng.uniform(-9, 9, (5, 2))  # masked-out garbage
    w = np.array([1.0] * 5 + [0.0] * 5)
    m, b, ok = ransac.fit_line(jnp.asarray(pts), jnp.asarray(w))
    assert bool(ok)
    np.testing.assert_allclose([float(m), float(b)], [2.0, 3.0], atol=1e-9)


def test_point_line_dist():
    pts = jnp.array([[0.0, 1.0], [1.0, 0.0], [2.0, 2.0]])
    d = ransac.point_line_dist(pts, 0.0, 0.0)  # line y = 0
    np.testing.assert_allclose(d, [1.0, 0.0, 2.0], atol=1e-12)


def test_perpendicular_foot():
    # line y = -x + 2: foot from origin is (1, 1)
    f = ransac.perpendicular_foot(-1.0, 2.0)
    np.testing.assert_allclose(np.asarray(f), [1.0, 1.0], atol=1e-12)
    # general check: foot lies on line, and is orthogonal to direction
    m, b = 0.37, -1.4
    f = np.asarray(ransac.perpendicular_foot(m, b))
    assert abs(m * f[0] + b - f[1]) < 1e-12
    assert abs(np.dot(f, [1, m])) < 1e-12


# -- wall search on a synthetic room ---------------------------------------

def make_room_scan(pose, n_beams=720, max_range=12.0):
    """Ray-cast a 8x6 rectangular room from `pose` (numpy, test-local)."""
    walls = [((-4, -3), (4, -3)), ((4, -3), (4, 3)),
             ((4, 3), (-4, 3)), ((-4, 3), (-4, -3))]
    angles = np.linspace(0, 360, n_beams, endpoint=False)
    ranges = np.full(n_beams, np.nan)
    for i, a in enumerate(angles):
        wa = np.deg2rad(a + pose[2])
        d = np.array([np.cos(wa), np.sin(wa)])
        best = np.inf
        for (p1, p2) in walls:
            p1, p2 = np.array(p1, float), np.array(p2, float)
            e = p2 - p1
            M = np.array([[d[0], -e[0]], [d[1], -e[1]]])
            if abs(np.linalg.det(M)) < 1e-12:
                continue
            t, s = np.linalg.solve(M, p1 - np.array(pose[:2]))
            if t > 0 and 0 <= s <= 1:
                best = min(best, t)
        if best < max_range:
            ranges[i] = best
    return angles, ranges


def test_find_walls_recovers_room_walls():
    pose = np.array([0.5, -0.5, 10.0])
    angles, ranges_np = make_room_scan(pose)
    scan = scan_from_ranges(jnp.asarray(ranges_np), jnp.asarray(angles))
    pts = scan_to_world(scan, jnp.asarray(pose))
    # ref_compat=False: the reference's two-quadrant atand window
    # (RANSAC.m:160) folds opposite directions together — fine for its
    # forward-facing 57 deg Kinect, wrong for a 360 deg scan.
    par = RansacParams(line_consensus=60, bearing_window_deg=15.0,
                       wall_search_timeout=4, ref_compat=False,
                       dtype=jnp.float64)
    lines, ok, remaining, _ = ransac.find_walls(pts, scan.valid,
                                             jax.random.PRNGKey(0), par)
    lines, ok = np.asarray(lines), np.asarray(ok)
    assert ok.sum() >= 2  # at least two walls found
    for (m, b), good in zip(lines, ok):
        if not good:
            continue
        # each found line must coincide with one of the walls
        # y=-3, y=3 (m~0,b~±3) or x=±4 (|m| huge)
        matches_h = abs(m) < 0.05 and (abs(b - 3) < 0.15 or abs(b + 3) < 0.15)
        matches_v = abs(m) > 10
        assert matches_h or matches_v, (m, b)


def test_find_walls_insufficient_points():
    pts = jnp.zeros((100, 2))
    valid = jnp.zeros((100,), bool)
    par = RansacParams(line_consensus=60, dtype=jnp.float64)
    _, ok, _, _ = ransac.find_walls(pts, valid, jax.random.PRNGKey(1), par)
    assert not np.any(np.asarray(ok))


# -- candidate-table semantics vs oracle ------------------------------------

def run_both(cand_seq, pose=(0.0, 0.0, 0.0), par=PAR, writeback=None):
    """Drive the jitted table and the list oracle with identical candidates."""
    table = ransac.init_table(par)
    oracle = NpLandmarkTable(par.promote_count, par.assoc_dist, par.freshness)
    pose_j = jnp.asarray(pose, jnp.float64)
    outs = []
    for cands in cand_seq:
        cands = np.asarray(cands, float).reshape(-1, 2)
        n = cands.shape[0]
        cj = jnp.zeros((max(n, 1), 2), jnp.float64)
        okj = jnp.zeros((max(n, 1),), bool)
        if n:
            cj = jnp.asarray(cands)
            okj = jnp.ones((n,), bool)
        obs, table = ransac.update_table(table, cj, okj, pose_j, par,
                                         max_obs=8)
        ref_obs, _ = oracle.update(list(cands), np.asarray(pose))
        outs.append((obs, ref_obs))
    return outs, table, oracle


def check_table_matches(table, oracle):
    used = np.asarray(table.used)
    ours = sorted(
        [(tuple(np.round(np.asarray(table.loc)[i], 9)),
          int(np.asarray(table.observe)[i]), int(np.asarray(table.index)[i]),
          int(np.asarray(table.fresh)[i]))
         for i in range(len(used)) if used[i]])
    ref = sorted([(tuple(np.round(e["loc"], 9)), e["observe"], e["index"],
                   e["fresh"]) for e in oracle.entries])
    assert ours == ref


def test_table_empty_seed_quirk():
    # empty table + two candidates: only the first is seeded (RANSAC.m:236)
    outs, table, oracle = run_both([[[1.0, 1.0], [5.0, 5.0]]])
    assert int(np.asarray(table.used).sum()) == 1
    check_table_matches(table, oracle)


def test_table_promotion_and_observation():
    # same candidate 12 times: promoted after promote_count+1 sightings,
    # then emits observation rows
    seq = [[[2.0, 1.0]]] * 13
    outs, table, oracle = run_both(seq)
    check_table_matches(table, oracle)
    idx = np.asarray(table.index)
    assert idx.max() == 1
    # rows appear only after promotion
    for i, (obs, ref_obs) in enumerate(outs):
        got = np.asarray(obs.valid).sum()
        assert got == len(ref_obs)
        if len(ref_obs):
            np.testing.assert_allclose(
                np.stack([np.asarray(obs.rng)[:1], np.asarray(obs.bearing)[:1],
                          np.asarray(obs.index)[:1].astype(float)], -1),
                ref_obs, atol=1e-9)


def test_table_freshness_decay():
    # candidate seen once, then a far-away candidate keeps ticks coming:
    # the stale entry decays and is dropped after `freshness` ticks
    par = RansacParams(table_capacity=16, freshness=5, dtype=jnp.float64)
    seq = [[[1.0, 1.0]]] + [[[9.0, 9.0]]] * 6
    outs, table, oracle = run_both(seq, par=par)
    check_table_matches(table, oracle)
    # the (1,1) entry must be gone; (9,9) may persist
    locs = np.asarray(table.loc)[np.asarray(table.used)]
    assert not np.any(np.all(np.isclose(locs, [1.0, 1.0]), axis=-1))


def test_table_multi_candidates_and_dedupe(rng):
    # several separated candidates, repeat sightings, mixed ticks
    a, b, c = [0.0, 2.0], [3.0, 0.0], [-2.0, -2.0]
    seq = ([[a]] + [[a, b]] * 6 + [[a, b, c]] * 8 + [[b, a]] * 4)
    outs, table, oracle = run_both(seq)
    check_table_matches(table, oracle)
    for obs, ref_obs in outs:
        n = int(np.asarray(obs.valid).sum())
        assert n == len(ref_obs)
        if n:
            got = np.stack([np.asarray(obs.rng)[:n],
                            np.asarray(obs.bearing)[:n],
                            np.asarray(obs.index)[:n].astype(float)], -1)
            np.testing.assert_allclose(got, ref_obs, atol=1e-9)


def test_table_nonzero_pose_rows():
    pose = (1.0, -2.0, 35.0)
    seq = [[[2.0, 1.0]]] * 12
    outs, table, oracle = run_both(seq, pose=pose)
    check_table_matches(table, oracle)
    obs, ref_obs = outs[-1]
    assert np.asarray(obs.valid).sum() == len(ref_obs) == 1
    np.testing.assert_allclose(float(obs.rng[0]), ref_obs[0][0], atol=1e-9)
    np.testing.assert_allclose(float(obs.bearing[0]), ref_obs[0][1],
                               atol=1e-9)


def test_writeback_last_only_quirk():
    par = PAR
    table = ransac.init_table(par)
    # two promoted entries with indices 1,2
    table = table._replace(
        loc=table.loc.at[0].set(jnp.array([1.0, 1.0]))
                     .at[1].set(jnp.array([2.0, 2.0])),
        index=table.index.at[0].set(1).at[1].set(2),
        used=table.used.at[0].set(True).at[1].set(True),
    )
    x = jnp.array([0.0, 0.0, 0.0, 10.0, 10.0, 20.0, 20.0])
    n_active = jnp.asarray(2, jnp.int32)
    t_ref = ransac.writeback(table, x, n_active, par)
    # last_only: entry with index 2 updated, index 1 untouched
    np.testing.assert_allclose(np.asarray(t_ref.loc[0]), [1.0, 1.0])
    np.testing.assert_allclose(np.asarray(t_ref.loc[1]), [20.0, 20.0])
    par_all = RansacParams(table_capacity=16, writeback_last_only=False,
                           dtype=jnp.float64)
    t_all = ransac.writeback(table, x, n_active, par_all)
    np.testing.assert_allclose(np.asarray(t_all.loc[0]), [10.0, 10.0])
    np.testing.assert_allclose(np.asarray(t_all.loc[1]), [20.0, 20.0])


def test_extract_end_to_end_smoke():
    """Full extraction tick on the synthetic room: walls → feet → table."""
    pose = np.array([0.0, 0.0, 0.0])
    angles, ranges_np = make_room_scan(pose)
    scan = scan_from_ranges(jnp.asarray(ranges_np), jnp.asarray(angles))
    par = RansacParams(line_consensus=60, bearing_window_deg=15.0,
                       wall_search_timeout=4, table_capacity=16,
                       promote_count=3, ref_compat=False,
                       dtype=jnp.float64)
    table = ransac.init_table(par)
    x = jnp.zeros((7,), jnp.float64)
    n_active = jnp.asarray(0, jnp.int32)
    ex = jax.jit(lambda t, k: ransac.extract(
        t, scan, x, n_active, k, par, max_obs=8))
    for i in range(10):
        obs, table = ex(table, jax.random.PRNGKey(i))
    assert int(np.asarray(table.used).sum()) >= 1
    # feet of room walls lie on axes: (0,±3) or (±4,0)
    locs = np.asarray(table.loc)[np.asarray(table.used)]
    for loc in locs:
        assert (abs(loc[0]) < 0.3 and (abs(abs(loc[1]) - 3) < 0.3)) or \
               (abs(loc[1]) < 0.3 and (abs(abs(loc[0]) - 4) < 0.3)), loc


def test_find_walls_batched_recovers_room_walls():
    """Batched-hypothesis search (fused scoring) finds at least as many
    walls as the sequential reference-style search."""
    pose = np.array([0.5, -0.5, 10.0])
    angles, ranges_np = make_room_scan(pose)
    scan = scan_from_ranges(jnp.asarray(ranges_np), jnp.asarray(angles))
    pts = scan_to_world(scan, jnp.asarray(pose))
    par = RansacParams(line_consensus=60, bearing_window_deg=15.0,
                       wall_search_timeout=4, ref_compat=False,
                       dtype=jnp.float64)
    lines, ok, _, _ = ransac.find_walls_batched(pts, scan.valid,
                                             jax.random.PRNGKey(0), par,
                                             n_hypotheses=64)
    lines, ok = np.asarray(lines), np.asarray(ok)
    # exactly-vertical walls (x=±4, zero-noise points) are unfittable by
    # y=mx+b — the reference's polyfit has the same degeneracy — so both
    # HORIZONTAL walls must be found
    assert ok.sum() >= 2
    bs = []
    for (m, b), good in zip(lines, ok):
        if not good:
            continue
        assert abs(m) < 0.05 and (abs(b - 3) < 0.15 or abs(b + 3) < 0.15), \
            (m, b)
        bs.append(round(float(b)))
    assert set(bs) == {-3, 3}


def test_find_walls_batched_nonoverlapping():
    """Greedy selection must not return the same wall twice."""
    pose = np.array([0.0, 0.0, 0.0])
    angles, ranges_np = make_room_scan(pose)
    scan = scan_from_ranges(jnp.asarray(ranges_np), jnp.asarray(angles))
    pts = scan_to_world(scan, jnp.asarray(pose))
    par = RansacParams(line_consensus=60, bearing_window_deg=15.0,
                       wall_search_timeout=4, ref_compat=False,
                       dtype=jnp.float64)
    lines, ok, _, _ = ransac.find_walls_batched(pts, scan.valid,
                                             jax.random.PRNGKey(3), par,
                                             n_hypotheses=64)
    feet = [np.asarray(ransac.perpendicular_foot(m, b))
            for (m, b), good in zip(np.asarray(lines), np.asarray(ok))
            if good]
    for i in range(len(feet)):
        for j in range(i + 1, len(feet)):
            assert np.linalg.norm(feet[i] - feet[j]) > 0.5, (feet[i], feet[j])


def test_obs_batch_truncates_at_max_obs():
    """More reobserved landmarks than max_obs: compaction keeps the first
    rows in stamp order and stays shape-stable."""
    par = RansacParams(table_capacity=16, promote_count=0,
                       dtype=jnp.float64)
    table = ransac.init_table(par)
    cands = [[2.0, 0.0], [0.0, 2.0], [-2.0, 0.0], [0.0, -2.0]]
    pose = jnp.zeros(3, jnp.float64)
    # seed + promote all four candidates over a few ticks
    for _ in range(4):
        obs, table = ransac.update_table(
            table, jnp.asarray(cands, jnp.float64), jnp.ones(4, bool),
            pose, par, max_obs=8)
    # now all four are indexed; with max_obs=2 only two rows come out
    obs, table = ransac.update_table(
        table, jnp.asarray(cands, jnp.float64), jnp.ones(4, bool),
        pose, par, max_obs=2)
    assert obs.rng.shape == (2,)
    assert int(np.asarray(obs.valid).sum()) == 2
    assert np.all(np.asarray(obs.index)[np.asarray(obs.valid)] > 0)
