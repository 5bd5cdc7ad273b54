"""MAPF solver tests: validity, determinism, native/Python parity."""

import numpy as np
import pytest

from lsc_dr_planner_tpu.mapf import ecbs, native, pibt
from lsc_dr_planner_tpu.mapf.grid import bfs_distances, astar_path, build_coarse_grid


def _validate(paths, occ, goals):
    """No vertex/swap conflicts; everyone ends at the goal; moves legal."""
    n = len(paths)
    L = max(len(p) for p in paths)

    def at(i, t):
        p = paths[i]
        return p[t] if t < len(p) else p[-1]

    for i in range(n):
        assert at(i, L - 1) == tuple(goals[i])
        for t in range(1, len(paths[i])):
            a, b = paths[i][t - 1], paths[i][t]
            assert abs(a[0] - b[0]) + abs(a[1] - b[1]) <= 1
            assert not occ[b[0], b[1]]
    # note: paths[*][0] may be the mission-start config (PIBT convention);
    # conflict-check from t>=2 of the step sequence
    for t in range(2, L):
        seen = {}
        for i in range(n):
            v = at(i, t)
            assert v not in seen, f"vertex conflict t={t}"
            seen[v] = i
        for i in range(n):
            for j in range(i + 1, n):
                if at(i, t) == at(j, t - 1) and at(j, t) == at(i, t - 1):
                    raise AssertionError(f"swap conflict t={t}")


def _random_instance(seed, X=12, Y=12, n=6, density=0.15):
    rng = np.random.default_rng(seed)
    occ = rng.random((X, Y)) < density
    free = np.argwhere(~occ)
    rng.shuffle(free)
    # choose mutually reachable cells
    base = tuple(free[0])
    d0 = bfs_distances(occ, base)
    reach = [tuple(c) for c in free if np.isfinite(d0[tuple(c)])]
    if len(reach) < 2 * n:
        return None
    starts = reach[:n]
    goals = reach[n:2 * n]
    return occ, starts, goals


def test_pibt_valid_and_deterministic():
    for seed in range(5):
        inst = _random_instance(seed)
        if inst is None:
            continue
        occ, starts, goals = inst
        p1 = pibt.solve_pibt(occ, starts, starts, goals, seed=0)
        p2 = pibt.solve_pibt(occ, starts, starts, goals, seed=0)
        assert p1 is not None
        assert p1 == p2
        _validate(p1, occ, goals)


@pytest.mark.skipif(not native.available(), reason="no native backend")
def test_native_pibt_matches_python():
    for seed in range(5):
        inst = _random_instance(seed)
        if inst is None:
            continue
        occ, starts, goals = inst
        p_py = pibt.solve_pibt(occ, starts, starts, goals, seed=3)
        p_cc = native.solve_pibt(occ, starts, starts, goals, seed=3)
        assert p_py == p_cc


def test_pibt_head_on_open_field():
    """Two agents exchanging places on an open grid (PIBT handles this;
    note plain PIBT — like the reference's — is incomplete for pure
    corridor swaps, mapf-IR pibt.cpp)."""
    occ = np.zeros((5, 5), dtype=bool)
    starts = [(0, 2), (4, 2)]
    goals = [(4, 2), (0, 2)]
    paths = pibt.solve_pibt(occ, starts, starts, goals, seed=0)
    assert paths is not None
    _validate(paths, occ, goals)


def test_ecbs_valid():
    for seed in range(3):
        inst = _random_instance(seed, n=4)
        if inst is None:
            continue
        occ, starts, goals = inst
        paths = ecbs.solve_ecbs(occ, starts, starts, goals)
        assert paths is not None
        n = len(paths)
        L = max(len(p) for p in paths)

        def at(i, t):
            p = paths[i]
            return p[t] if t < len(p) else p[-1]

        for t in range(1, L):
            seen = set()
            for i in range(n):
                v = at(i, t)
                assert v not in seen
                seen.add(v)
        for i in range(n):
            assert at(i, L - 1) == tuple(goals[i])


def test_ecbs_w_bound_vs_bruteforce_optimal():
    """ECBS's certificate: soc ≤ w · LB, with LB ≤ optimal SOC.
    Cross-check against a brute-force joint-state BFS optimum on small
    2-agent instances (reference ecbs.cpp:5 — w = 2.0)."""
    from itertools import product

    def brute_optimal_soc(occ, starts, goals):
        # joint BFS over (v1, v2) minimizing sum of per-agent move costs
        import heapq as hq

        X, Y = occ.shape

        def nbrs(v):
            out = [v]
            for dx, dy in [(-1, 0), (1, 0), (0, -1), (0, 1)]:
                u = (v[0] + dx, v[1] + dy)
                if 0 <= u[0] < X and 0 <= u[1] < Y and not occ[u]:
                    out.append(u)
            return out

        start = (tuple(starts[0]), tuple(starts[1]))
        goal = (tuple(goals[0]), tuple(goals[1]))
        # Dijkstra over joint states; cost = #agents not yet parked-at-goal
        # per step (equals SOC for paths that park at the end)
        dist = {start: 0}
        pq = [(0, start)]
        while pq:
            d, st = hq.heappop(pq)
            if st == goal:
                return d
            if d > dist.get(st, np.inf):
                continue
            for u1, u2 in product(nbrs(st[0]), nbrs(st[1])):
                if u1 == u2:
                    continue
                if u1 == st[1] and u2 == st[0]:
                    continue  # swap
                # waiting at goal is free; any move or off-goal wait costs 1
                c = int(u1 != goal[0] or st[0] != goal[0]) + int(
                    u2 != goal[1] or st[1] != goal[1]
                )
                nd = d + c
                nxt = (u1, u2)
                if nd < dist.get(nxt, np.inf):
                    dist[nxt] = nd
                    hq.heappush(pq, (nd, nxt))
        return None

    for seed in range(6):
        rng = np.random.default_rng(100 + seed)
        occ = rng.random((6, 6)) < 0.2
        free = [tuple(c) for c in np.argwhere(~occ)]
        rng.shuffle(free)
        if len(free) < 4:
            continue
        starts, goals = [free[0], free[1]], [free[2], free[3]]
        d0 = bfs_distances(occ, goals[0])
        d1 = bfs_distances(occ, goals[1])
        if not (np.isfinite(d0[starts[0]]) and np.isfinite(d1[starts[1]])):
            continue
        res = ecbs.solve_ecbs(occ, starts, starts, goals, return_lb=True)
        paths, lb = res
        if paths is None:
            continue
        soc = sum(ecbs._path_cost(p) for p in paths)
        opt = brute_optimal_soc(occ, starts, goals)
        assert opt is not None
        assert lb <= opt, f"LB {lb} exceeds optimal {opt}"
        assert soc <= ecbs.SUB_OPTIMALITY * opt + 1e-9


def test_ecbs_vs_pibt_dense_corridor():
    """Dense two-lane corridor where the solvers' orderings differ: both
    must be valid; ECBS must respect its w-bound (certified by its own
    LB); timing recorded as a smoke check."""
    import time

    # two-row corridor, two opposing streams of 3 agents each
    occ = np.ones((8, 4), dtype=bool)
    occ[:, 1:3] = False
    starts = [(0, 1), (1, 1), (2, 1), (7, 2), (6, 2), (5, 2)]
    goals = [(7, 1), (6, 1), (5, 1), (0, 2), (1, 2), (2, 2)]

    t0 = time.perf_counter()
    p_pibt = pibt.solve_pibt(occ, starts, starts, goals, seed=0)
    t_pibt = time.perf_counter() - t0
    t0 = time.perf_counter()
    res = ecbs.solve_ecbs(occ, starts, starts, goals, return_lb=True)
    t_ecbs = time.perf_counter() - t0
    p_ecbs, lb = res

    assert p_pibt is not None and p_ecbs is not None
    _validate(p_pibt, occ, goals)
    _validate(p_ecbs, occ, goals)
    soc_ecbs = sum(ecbs._path_cost(p) for p in p_ecbs)
    assert soc_ecbs <= ecbs.SUB_OPTIMALITY * lb + 1e-9
    # ECBS should not be wildly slower than PIBT on this instance
    assert t_ecbs < max(50 * t_pibt, 5.0)


def test_pibt_unreachable_returns_none():
    occ = np.zeros((4, 4), dtype=bool)
    occ[2, :] = True  # wall splits the grid
    assert pibt.solve_pibt(occ, [(0, 0)], [(0, 0)], [(3, 3)], seed=0) is None


def test_astar_and_bfs():
    occ = np.zeros((6, 6), dtype=bool)
    occ[3, 1:] = True
    d = bfs_distances(occ, (5, 5))
    assert np.isfinite(d[0, 0])
    path = astar_path(occ, (0, 0), (5, 5))
    assert path is not None
    assert len(path) - 1 == d[0, 0]


def test_coarse_grid_geometry():
    cg = build_coarse_grid([-5, -5, 0], [5, 5, 2.5], 0.5, 2, 0.6)
    assert cg.dims[0] == 21 and cg.dims[1] == 21 and cg.dims[2] == 1
    node = cg.point_to_node([0.0, -1.0, 0.6])
    np.testing.assert_array_equal(node[:2], [10, 8])
    p = cg.node_to_point(np.array([10, 8, 0]))
    np.testing.assert_allclose(p, [0.0, -1.0, 0.6])


@pytest.mark.skipif(not native.available(), reason="no native backend")
def test_native_ecbs_matches_python():
    """native/ecbs.cpp produces bit-identical solutions to mapf/ecbs.py
    (strict insertion-counter total orders at both search levels)."""
    for seed in range(8):
        rng = np.random.default_rng(seed)
        occ = rng.random((10, 10)) < 0.15
        free = [tuple(c) for c in np.argwhere(~occ)]
        rng.shuffle(free)
        n = 4
        if len(free) < 2 * n:
            continue
        cur, gl = free[:n], free[n : 2 * n]
        if any(
            not np.isfinite(bfs_distances(occ, gl[i])[cur[i]])
            for i in range(n)
        ):
            continue
        p_py, lb_py = ecbs.solve_ecbs(occ, cur, cur, gl, return_lb=True)
        p_cc, lb_cc = native.solve_ecbs(occ, cur, cur, gl, return_lb=True)
        assert p_py == p_cc
        assert lb_py == lb_cc


def test_native_bfs_cache_respects_occupancy_changes():
    """The BFS distance-table cache keys on exact occupancy bytes, so a
    cell-unblocked variant of the grid must not reuse stale tables (and
    native results must keep matching the Python solver)."""
    import numpy as np

    from lsc_dr_planner_tpu.mapf import native, pibt as pypibt

    if not native.available():
        return  # Python-only environment: nothing to cache

    occ = np.zeros((9, 9), bool)
    occ[4, :] = True
    occ[4, 4] = False  # one gap
    cur = [(0, 1), (0, 7)]
    goal = [(8, 7), (8, 1)]
    a1 = native.solve_pibt(occ, cur, cur, goal, seed=0)
    b1 = pypibt.solve_pibt(occ, cur, cur, goal, seed=0)
    assert a1 == b1

    occ2 = occ.copy()
    occ2[4, 1] = False  # open a second gap -> different distances
    a2 = native.solve_pibt(occ2, cur, cur, goal, seed=0)
    b2 = pypibt.solve_pibt(occ2, cur, cur, goal, seed=0)
    assert a2 == b2
    assert a1 != a2  # the extra gap shortens agent 0's route

    # original grid again: cache hit must reproduce the first answer
    a3 = native.solve_pibt(occ, cur, cur, goal, seed=0)
    assert a3 == a1
