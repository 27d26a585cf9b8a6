"""shortest_paths / hop_distance vs a pure-python Dijkstra oracle —
weighted + unit + directed + multi-source (graph-Voronoi tie rules),
convergence behavior, validation."""

import heapq

import pytest

from tilegrab_spark.operators.graph import hop_distance, shortest_paths


def _dijkstra(edges, sources, directed=False):
    """(node -> (dist, source)); ties to the smallest source id."""
    adj = {}
    for s, d, w in edges:
        adj.setdefault(s, []).append((d, w))
        if not directed:
            adj.setdefault(d, []).append((s, w))
    best = {}
    pq = [(0.0, src, src) for src in sorted(sources)]
    heapq.heapify(pq)
    while pq:
        dist, src, node = heapq.heappop(pq)
        if node in best and (best[node][0], best[node][1]) <= (dist, src):
            continue
        if node not in best or (dist, src) < best[node]:
            best[node] = (dist, src)
            for nxt, w in adj.get(node, []):
                cand = (dist + w, src)
                if nxt not in best or cand < best[nxt]:
                    heapq.heappush(pq, (dist + w, src, nxt))
    return best


def _lcg_graph(seed, n_nodes, n_edges):
    s, out = seed, []
    for _ in range(n_edges):
        s = (s * 1103515245 + 12345) % (1 << 31)
        a = s % n_nodes
        s = (s * 1103515245 + 12345) % (1 << 31)
        b = s % n_nodes
        s = (s * 1103515245 + 12345) % (1 << 31)
        w = 1.0 + (s % 100) / 10.0
        if a != b:
            out.append((a, b, w))
    return out


def _check(spark, edges, sources, directed=False, weighted=True):
    E = spark.createDataFrame(edges, "src long, dst long, w double")
    S = spark.createDataFrame([(s,) for s in sources], "node long")
    got = {
        r.node: (r.dist, r.source)
        for r in shortest_paths(
            E, S, weight_col="w" if weighted else None, directed=directed
        ).collect()
    }
    eo = [(a, b, w if weighted else 1.0) for a, b, w in edges]
    want = _dijkstra(eo, sources, directed=directed)
    assert set(got) == set(want)
    for n in want:
        assert got[n][0] == pytest.approx(want[n][0], abs=1e-9), n
        assert got[n][1] == want[n][1], n


def test_weighted_single_source(spark):
    _check(spark, _lcg_graph(7, 40, 120), [0])


def test_multi_source_voronoi_and_ties(spark):
    # diamond with equal-cost paths from both sources to node 2:
    # tie must resolve to the SMALLER source id
    edges = [(0, 2, 5.0), (1, 2, 5.0), (2, 3, 1.0), (4, 5, 1.0)]
    _check(spark, edges, [0, 1])
    _check(spark, _lcg_graph(23, 60, 200), [3, 17, 41])


def test_directed(spark):
    edges = [(0, 1, 1.0), (1, 2, 1.0), (3, 2, 1.0)]
    E = spark.createDataFrame(edges, "src long, dst long, w double")
    S = spark.createDataFrame([(0,)], "node long")
    got = {r.node: r.dist for r in shortest_paths(E, S, weight_col="w", directed=True).collect()}
    assert got == {0: 0.0, 1: 1.0, 2: 2.0}  # 3 unreachable
    _check(spark, _lcg_graph(99, 40, 160), [0, 5], directed=True)


def test_hop_distance_bfs(spark):
    _check(spark, _lcg_graph(5, 50, 130), [2], weighted=False)
    # chain: hop counts exact
    edges = [(i, i + 1, 1.0) for i in range(10)]
    E = spark.createDataFrame(edges, "src long, dst long, w double")
    S = spark.createDataFrame([(0,)], "node long")
    got = {r.node: r.dist for r in hop_distance(E, S).collect()}
    assert got == {i: float(i) for i in range(11)}


def test_shorter_path_through_more_hops(spark):
    # direct heavy edge vs cheap 3-hop detour: relaxation must improve
    # an ALREADY-settled node in a later round
    edges = [(0, 9, 10.0), (0, 1, 1.0), (1, 2, 1.0), (2, 9, 1.0)]
    E = spark.createDataFrame(edges, "src long, dst long, w double")
    S = spark.createDataFrame([(0,)], "node long")
    got = {r.node: r.dist for r in shortest_paths(E, S, weight_col="w").collect()}
    assert got[9] == pytest.approx(3.0)


def test_nonconvergence_and_validation(spark):
    edges = [(i, i + 1, 1.0) for i in range(8)]
    E = spark.createDataFrame(edges, "src long, dst long, w double")
    S = spark.createDataFrame([(0,)], "node long")
    with pytest.raises(RuntimeError):
        shortest_paths(E, S, weight_col="w", max_iter=3)
    partial = shortest_paths(E, S, weight_col="w", max_iter=3, on_nonconverged="return")
    got = {r.node: r.dist for r in partial.collect()}
    assert got[3] == 3.0 and max(got) < 8  # near frontier exact, far nodes absent
    with pytest.raises(ValueError):
        neg = spark.createDataFrame([(0, 1, -1.0)], "src long, dst long, w double")
        shortest_paths(neg, S, weight_col="w")
    with pytest.raises(ValueError):
        shortest_paths(E, S, max_iter=0)
    with pytest.raises(ValueError):
        shortest_paths(E, S, on_nonconverged="nope")


# ---------------------------------------------------------------- pagerank

def _pagerank_ref(edges, n, damping=0.85, n_iter=20):
    """Dense numpy power iteration with dangling redistribution —
    independent of the operator's relational formulation. ``edges`` are
    (src, dst, w) over nodes 0..n-1."""
    import numpy as np

    M = np.zeros((n, n))
    for s, d, w in edges:
        M[d, s] += w
    out = M.sum(axis=0)
    r = np.full(n, 1.0 / n)
    for _ in range(n_iter):
        dangling = r[out == 0.0].sum()
        contrib = np.zeros(n)
        nz = out > 0
        contrib = M[:, nz] @ (r[nz] / out[nz])
        r = (1 - damping) / n + damping * (contrib + dangling / n)
    return r


_PR_EDGES = [
    (0, 1, 1.0), (0, 2, 1.0), (1, 2, 1.0), (2, 0, 1.0),
    (3, 2, 1.0), (4, 3, 1.0), (4, 0, 1.0),  # 5 is dangling via (2->5)
    (2, 5, 1.0),
]


def test_pagerank_matches_numpy_power_iteration(spark):
    from tilegrab_spark.operators.graph import pagerank

    df = spark.createDataFrame(
        [(s, d) for s, d, _ in _PR_EDGES], "src long, dst long"
    )
    got = {r["node"]: r["rank"] for r in pagerank(df, n_iter=20).collect()}
    want = _pagerank_ref(_PR_EDGES, 6)
    assert len(got) == 6
    assert sum(got.values()) == pytest.approx(1.0, abs=1e-9)
    for i in range(6):
        assert got[i] == pytest.approx(want[i], abs=1e-12)


def test_pagerank_weighted_and_parallel_edges(spark):
    from tilegrab_spark.operators.graph import pagerank

    # weight 2 on (0->1) == the same edge listed twice
    wdf = spark.createDataFrame(
        [(0, 1, 2.0), (0, 2, 1.0), (1, 0, 1.0), (2, 1, 1.0)],
        "src long, dst long, w double",
    )
    pdf = spark.createDataFrame(
        [(0, 1), (0, 1), (0, 2), (1, 0), (2, 1)], "src long, dst long"
    )
    a = {r["node"]: r["rank"] for r in pagerank(wdf, weight_col="w", n_iter=15).collect()}
    b = {r["node"]: r["rank"] for r in pagerank(pdf, n_iter=15).collect()}
    for k in a:
        assert a[k] == pytest.approx(b[k], abs=1e-12)
    want = _pagerank_ref([(0, 1, 2.0), (0, 2, 1.0), (1, 0, 1.0), (2, 1, 1.0)], 3, n_iter=15)
    for i in range(3):
        assert a[i] == pytest.approx(want[i], abs=1e-12)


def test_pagerank_tol_early_stop_and_validation(spark):
    from tilegrab_spark.operators.graph import pagerank

    df = spark.createDataFrame([(s, d) for s, d, _ in _PR_EDGES], "src long, dst long")
    full = {r["node"]: r["rank"] for r in pagerank(df, n_iter=60).collect()}
    early = {r["node"]: r["rank"] for r in pagerank(df, n_iter=60, tol=1e-10).collect()}
    for k in full:
        assert early[k] == pytest.approx(full[k], abs=1e-8)
    with pytest.raises(ValueError, match="damping"):
        pagerank(df, damping=1.0)
    with pytest.raises(ValueError, match="n_iter"):
        pagerank(df, n_iter=0)
    with pytest.raises(ValueError, match="tol"):
        pagerank(df, tol=0.0)
    neg = spark.createDataFrame([(0, 1, -1.0)], "src long, dst long, w double")
    with pytest.raises(ValueError, match="positive"):
        pagerank(neg, weight_col="w")


# ------------------------------------------------------- triangles / k-core

def _tri_ref(edges):
    """Per-node triangle counts by brute force over adjacency sets."""
    adj = {}
    for a, b in edges:
        if a == b:
            continue
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    out = {n: 0 for n in adj}
    nodes = sorted(adj)
    for i, a in enumerate(nodes):
        for b in [x for x in nodes[i + 1:] if x in adj[a]]:
            for c in [x for x in nodes if x > b and x in adj[a] and x in adj[b]]:
                out[a] += 1
                out[b] += 1
                out[c] += 1
    return out


def _kcore_ref(edges, k):
    adj = {}
    for a, b in edges:
        if a == b:
            continue
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    changed = True
    while changed:
        changed = False
        for n in list(adj):
            if len(adj[n]) < k:
                for m in adj[n]:
                    adj[m].discard(n)
                del adj[n]
                changed = True
    return {n: len(s) for n, s in adj.items()}


def test_triangle_count_matches_bruteforce(spark):
    from tilegrab_spark.operators.dedup import release_signature_caches
    from tilegrab_spark.operators.graph import triangle_count

    raw = _lcg_graph(99, 40, 220)
    pairs = [(a, b) for a, b, _ in raw]
    # directed duplicates + self-loops must normalize away
    noisy = pairs + [(b, a) for a, b in pairs[:50]] + [(7, 7), (3, 3)]
    df = spark.createDataFrame(noisy, "src long, dst long")
    got = {r["node"]: r["triangles"] for r in triangle_count(df).collect()}
    release_signature_caches()
    want = _tri_ref(pairs)
    assert got == want
    assert sum(got.values()) % 3 == 0


def test_triangle_count_known_graph(spark):
    from tilegrab_spark.operators.dedup import release_signature_caches
    from tilegrab_spark.operators.graph import triangle_count

    # K4 plus a pendant: every K4 node is in C(3,2)=3 triangles
    k4 = [(0, 1), (0, 2), (0, 3), (1, 2), (1, 3), (2, 3), (3, 4)]
    got = {
        r["node"]: r["triangles"]
        for r in triangle_count(spark.createDataFrame(k4, "src long, dst long")).collect()
    }
    release_signature_caches()
    assert got == {0: 3, 1: 3, 2: 3, 3: 3, 4: 0}


def test_k_core_matches_peeling_reference(spark):
    from tilegrab_spark.operators.graph import k_core

    raw = _lcg_graph(7, 36, 150)
    pairs = [(a, b) for a, b, _ in raw]
    df = spark.createDataFrame(pairs, "src long, dst long")
    for k in (2, 3, 4):
        got = {r["node"]: r["core_degree"] for r in k_core(df, k).collect()}
        assert got == _kcore_ref(pairs, k), f"k={k}"


def test_k_core_path_peels_away_and_validation(spark):
    from tilegrab_spark.operators.graph import k_core

    path = [(i, i + 1) for i in range(10)]
    df = spark.createDataFrame(path, "src long, dst long")
    assert k_core(df, 2).count() == 0  # a path has no 2-core
    cyc = path + [(10, 0)]
    got = {r["node"]: r["core_degree"] for r in k_core(spark.createDataFrame(cyc, "src long, dst long"), 2).collect()}
    assert got == {i: 2 for i in range(11)}  # the cycle IS the 2-core
    with pytest.raises(ValueError, match="k must"):
        k_core(df, 0)
    with pytest.raises(RuntimeError, match="fixpoint"):
        k_core(df, 2, max_iter=1)


def test_pagerank_null_weight_raises(spark):
    from tilegrab_spark.operators.graph import pagerank

    df = spark.createDataFrame(
        [(0, 1, 1.0), (1, 2, None)], "src long, dst long, w double"
    )
    with pytest.raises(ValueError, match="NULL"):
        pagerank(df, weight_col="w")


def _hits_ref(edges, n, n_iter=20):
    import numpy as np

    A = np.zeros((n, n))
    for s, d in edges:
        A[s, d] += 1
    h = np.ones(n)
    a = np.ones(n)
    for _ in range(n_iter):
        a = A.T @ h
        na = np.linalg.norm(a)
        a = a / na if na > 0 else a
        h = A @ a
        nh = np.linalg.norm(h)
        h = h / nh if nh > 0 else h
    return h, a


def test_hits_matches_numpy(spark):
    from tilegrab_spark.operators.graph import hits

    edges = [(0, 2), (1, 2), (3, 2), (2, 4), (0, 4), (4, 0), (0, 2)]  # dup edge
    df = spark.createDataFrame(edges, "src long, dst long")
    got = {r["node"]: (r["hub"], r["authority"]) for r in hits(df, n_iter=20).collect()}
    h, a = _hits_ref(edges, 5)
    assert len(got) == 5
    for i in range(5):
        assert got[i][0] == pytest.approx(h[i], abs=1e-12)
        assert got[i][1] == pytest.approx(a[i], abs=1e-12)
    with pytest.raises(ValueError, match="n_iter"):
        hits(df, n_iter=0)


# ------------------------------------------- personalized pagerank / RWR

def _ppr_ref(edges, n, p, damping=0.85, n_iter=20):
    """Dense numpy RWR: teleport AND dangling mass go to the seed
    distribution p; independent of the relational formulation."""
    import numpy as np

    M = np.zeros((n, n))
    for s, d, w in edges:
        M[d, s] += w
    out = M.sum(axis=0)
    r = p.copy()
    for _ in range(n_iter):
        dangling = r[out == 0.0].sum()
        nz = out > 0
        contrib = M[:, nz] @ (r[nz] / out[nz])
        r = (1 - damping) * p + damping * (contrib + dangling * p)
    return r


def test_ppr_matches_numpy_rwr(spark):
    import numpy as np

    from tilegrab_spark.operators.graph import personalized_pagerank

    df = spark.createDataFrame(
        [(s, d) for s, d, _ in _PR_EDGES], "src long, dst long"
    )
    got = {
        r["node"]: r["rank"]
        for r in personalized_pagerank(df, [0, 4], n_iter=20).collect()
    }
    p = np.zeros(6); p[0] = p[4] = 0.5
    want = _ppr_ref(_PR_EDGES, 6, p)
    assert len(got) == 6
    assert sum(got.values()) == pytest.approx(1.0, abs=1e-9)
    for i in range(6):
        assert got[i] == pytest.approx(want[i], abs=1e-12)


def test_ppr_weighted_seeds_and_seed_df(spark):
    import numpy as np

    from tilegrab_spark.operators.graph import personalized_pagerank

    df = spark.createDataFrame(
        [(s, d) for s, d, _ in _PR_EDGES], "src long, dst long"
    )
    seeds = spark.createDataFrame([(0, 3.0), (2, 1.0)], "node long, w double")
    got = {
        r["node"]: r["rank"]
        for r in personalized_pagerank(
            df, seeds, seed_weight_col="w", n_iter=15
        ).collect()
    }
    p = np.zeros(6); p[0] = 0.75; p[2] = 0.25
    want = _ppr_ref(_PR_EDGES, 6, p, n_iter=15)
    for i in range(6):
        assert got[i] == pytest.approx(want[i], abs=1e-12)


def test_ppr_unreachable_component_gets_zero(spark):
    from tilegrab_spark.operators.graph import personalized_pagerank

    # two components; seeds only in {0,1} — the {10,11} cluster (a spam
    # island in trust-propagation terms) must earn exactly nothing
    df = spark.createDataFrame(
        [(0, 1), (1, 0), (10, 11), (11, 10)], "src long, dst long"
    )
    got = {
        r["node"]: r["rank"]
        for r in personalized_pagerank(df, [0], n_iter=10).collect()
    }
    assert got[10] == 0.0 and got[11] == 0.0
    assert sum(got.values()) == pytest.approx(1.0, abs=1e-12)


def test_ppr_validation(spark):
    from tilegrab_spark.operators.graph import personalized_pagerank

    df = spark.createDataFrame([(0, 1)], "src long, dst long")
    with pytest.raises(ValueError, match="no seeds"):
        personalized_pagerank(df, [99], n_iter=5)
    with pytest.raises(ValueError, match="damping"):
        personalized_pagerank(df, [0], damping=1.0)
    bad = spark.createDataFrame([(0, -1.0), (1, 2.0)], "node long, w double")
    with pytest.raises(ValueError, match="seed weights must be positive"):
        personalized_pagerank(df, bad, seed_weight_col="w")
    nullw = spark.createDataFrame([(0, None)], "node long, w double")
    with pytest.raises(ValueError, match="NULL"):
        personalized_pagerank(df, nullw, seed_weight_col="w")
