"""Distributed shortest paths over an edge table — frontier-pruned
multi-source Bellman-Ford (the Pregel SSSP shape), driver loop +
distributed rounds, same iteration discipline as
``components.connected_components``.

Geo relevance: road-network distance ("minutes to the nearest depot")
is the graph twin of ``distancejoin`` — as-the-crow-flies pairing
finds candidates, network distance ranks them. With every source
carrying its own id the result is the **graph Voronoi** (nearest-source
labeling), the standard facility-assignment primitive. The reference
(a tile downloader) has no analogue; this extends the analytics suite
alongside ``connected_components``.

Plan shape at 100 TB:

- each round relaxes ONLY the frontier (nodes improved last round):
  one join frontier⋈edges keyed by src (frontier is usually a small
  fraction of nodes — AQE broadcasts it when it is), one map-side
  pre-combined ``min(struct(dist, source))`` per candidate node, one
  node-keyed merge into the running distance table. Exchange sizes
  track the frontier's out-edges, never |E| per round.
- rounds = weighted diameter in hops (BFS layers); the loop
  ``localCheckpoint``s the distance table each round so plan lineage
  stays flat (the iterative-algorithm trap, see components.py).
- ties are deterministic: ``min`` over ``struct(dist, source)`` is
  lexicographic, so equal distances resolve to the smallest source id.

Negative weights are rejected up front (one bounded aggregate):
frontier pruning — like Dijkstra — assumes monotone relaxation.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

__all__ = ["shortest_paths", "hop_distance", "pagerank", "personalized_pagerank", "hits", "triangle_count", "k_core"]


def _relax_round(frontier: DataFrame, e: DataFrame, dist: DataFrame) -> DataFrame:
    """One relaxation round (lazy): candidate improvements from the
    frontier's out-edges, map-side pre-combined to one candidate per
    node, filtered to strict improvements over ``dist``."""
    cand = (
        frontier.join(e, frontier.node == e._s)
        .select(
            F.col("_d").alias("node"),
            (F.col("dist") + F.col("_w")).alias("dist"),
            "source",
        )
        # map-side pre-combine: one candidate per node leaves the round
        .groupBy("node")
        .agg(F.min(F.struct("dist", "source")).alias("_c"))
        .select("node", F.col("_c.dist").alias("dist"), F.col("_c.source").alias("source"))
    )
    return (
        cand.join(dist.select("node", F.col("dist").alias("_old")), "node", "left")
        .filter(F.col("_old").isNull() | (F.col("dist") < F.col("_old")))
        .select("node", "dist", "source")
    )


def shortest_paths(
    edges: DataFrame,
    sources: DataFrame,
    *,
    src_col: str = "src",
    dst_col: str = "dst",
    weight_col: str | None = None,
    node_col: str = "node",
    directed: bool = False,
    max_iter: int = 50,
    on_nonconverged: str = "raise",
) -> DataFrame:
    """(node, dist, source) for every node reachable from ``sources``:
    ``dist`` = cheapest path cost, ``source`` = the source node it is
    cheapest from (graph Voronoi). ``sources`` needs a ``node_col``
    column; ``weight_col=None`` counts hops (BFS). Unreachable nodes
    are absent. ``on_nonconverged``: 'raise' (default) or 'return'
    (partial distances after ``max_iter`` rounds — correct lower
    frontier, possibly missing far nodes)."""
    if max_iter < 1:
        raise ValueError(f"max_iter must be >= 1, got {max_iter}")
    if on_nonconverged not in ("raise", "return"):
        raise ValueError(f"on_nonconverged must be 'raise' or 'return', got {on_nonconverged!r}")
    w = F.col(weight_col).cast("double") if weight_col else F.lit(1.0)
    e = edges.select(F.col(src_col).alias("_s"), F.col(dst_col).alias("_d"), w.alias("_w"))
    if not directed:
        e = e.unionByName(e.select(F.col("_d").alias("_s"), F.col("_s").alias("_d"), "_w"))
    if weight_col is not None:
        wmin = e.agg(F.min("_w")).first()[0]  # bounded scalar, one pass
        if wmin is not None and wmin < 0:
            raise ValueError(f"negative edge weight {wmin}: frontier relaxation requires w >= 0")
    e = e.persist()

    dist = (
        sources.select(F.col(node_col).alias("node"))
        .distinct()
        .select("node", F.lit(0.0).alias("dist"), F.col("node").alias("source"))
        .localCheckpoint()
    )
    frontier = dist
    converged = False
    for _ in range(max_iter):
        improved = _relax_round(frontier, e, dist).localCheckpoint()
        if improved.isEmpty():
            converged = True
            break
        new_dist = (
            dist.unionByName(improved)
            .groupBy("node")
            .agg(F.min(F.struct("dist", "source")).alias("_b"))
            .select("node", F.col("_b.dist").alias("dist"), F.col("_b.source").alias("source"))
            .localCheckpoint()
        )
        dist = new_dist
        frontier = improved
    e.unpersist()
    if not converged and on_nonconverged == "raise":
        raise RuntimeError(
            f"shortest_paths did not converge in {max_iter} rounds; "
            "raise max_iter or pass on_nonconverged='return'"
        )
    return dist


def pagerank(
    edges: DataFrame,
    *,
    src_col: str = "src",
    dst_col: str = "dst",
    weight_col: str | None = None,
    damping: float = 0.85,
    n_iter: int = 20,
    tol: float | None = None,
) -> DataFrame:
    """Power-iteration PageRank over an edge table → ``(node, rank)``,
    ranks summing to 1. The centrality pass a link/citation/road graph
    needs once connected_components has split it — which junctions,
    documents, or image hubs carry the mass.

    Semantics: standard damped PageRank with dangling-mass
    redistribution — each round
    ``r' = (1-d)/N + d·(Σ_in r/outshare + dangling/N)`` where
    ``outshare`` is the out-degree (or the out-weight share when
    ``weight_col`` is given; non-positive weights are rejected).
    Parallel edges accumulate, matching the textbook matrix. ``tol``
    (L∞ on the rank vector) stops early; otherwise exactly ``n_iter``
    rounds run.

    Plan shape at 100 TB (same iteration discipline as
    ``shortest_paths``/``connected_components``):

    - the ``links`` table (edge, 1/outshare) is derived ONCE — one
      map-side-combinable groupBy for out-degrees joined back edge-keyed
      — and persisted across rounds; per round the only edge-sized work
      is one hash join ranks⋈links on ``src`` plus a map-side partial
      ``sum`` per destination. Every other frame is node-sized.
    - dangling mass stays INSIDE the round's plan: a one-row aggregate
      over the dangling ranks broadcast-cross-joined into the rank
      update, so a round is ONE job (join + partial-sum + update), not
      a driver-synced scalar collect plus a job.
    - each round ``localCheckpoint``s the node-sized rank table so
      lineage stays flat (the iterative-algorithm trap, components.py).

    Determinism: topology and arithmetic are deterministic; float
    summation order inside the shuffle can differ between runs, so ranks
    are reproducible to ULP-accumulation (~1e-15 relative), not
    byte-identical — fine for ranking, documented for hashers.
    """
    if not 0.0 < damping < 1.0:
        raise ValueError(f"damping must be in (0, 1), got {damping}")
    if n_iter < 1:
        raise ValueError(f"n_iter must be >= 1, got {n_iter}")
    if tol is not None and tol <= 0:
        raise ValueError(f"tol must be positive, got {tol}")
    e, nodes = _pr_edge_and_node_frames(edges, src_col, dst_col, weight_col)
    n = nodes.count()
    if n == 0:
        return nodes.select("node", F.lit(0.0).alias("rank"))
    links, has_out = _pr_links_tables(e)

    d = float(damping)
    base = (1.0 - d) / n
    ranks = nodes.select("node", F.lit(1.0 / n).alias("rank")).localCheckpoint()

    def update(contrib, dangling):
        # uniform teleport: r' = (1-d)/N + d*(contrib + dangling/N)
        return (
            nodes.join(contrib, "node", "left")
            .crossJoin(F.broadcast(dangling))
            .select(
                "node",
                (
                    F.lit(base)
                    + F.lit(d)
                    * (F.coalesce(F.col("_c"), F.lit(0.0)) + F.col("_dang") / n)
                ).alias("rank"),
            )
        )

    ranks = _pr_rounds(ranks, links, has_out, update, n_iter, tol)
    links.unpersist()
    return ranks


def _pr_edge_and_node_frames(edges, src_col, dst_col, weight_col):
    """Validated (_s, _d, _w) edge frame + checkpointed node frame —
    shared by pagerank and personalized_pagerank."""
    w = F.col(weight_col).cast("double") if weight_col else F.lit(1.0)
    e = edges.select(F.col(src_col).alias("_s"), F.col(dst_col).alias("_d"), w.alias("_w"))
    if weight_col is not None:
        # nulls (incl. cast failures) would silently leak rank mass:
        # the edge's share drops out of the sum while its source still
        # counts as non-dangling — ranks stop summing to 1
        wmin, n_null = e.agg(
            F.min("_w"), F.sum(F.col("_w").isNull().cast("long"))
        ).first()
        if n_null:
            raise ValueError(
                f"{n_null} edge weight(s) are NULL or fail the double cast"
            )
        if wmin is not None and wmin <= 0:
            raise ValueError(f"edge weights must be positive, got {wmin}")
    nodes = (
        e.select(F.col("_s").alias("node"))
        .unionByName(e.select(F.col("_d").alias("node")))
        .distinct()
        .localCheckpoint()
    )
    return e, nodes


def _pr_links_tables(e):
    """(links persisted+materialized, has_out checkpointed) — links
    built ONCE and reused every round; has_out derives from the
    PERSISTED links table (node-sized, materialized once — deriving it
    from the unpersisted out-degree frame would re-aggregate the full
    edge table inside every round's dangling left_anti)."""
    out = e.groupBy("_s").agg(F.sum("_w").alias("_out"))
    links = (
        e.join(out, "_s")
        .select("_s", "_d", (F.col("_w") / F.col("_out")).alias("_share"))
        .persist()
    )
    links.count()
    has_out = (
        links.select(F.col("_s").alias("node")).distinct().localCheckpoint()
    )
    return links, has_out


def _pr_rounds(ranks, links, has_out, update, n_iter, tol):
    """The shared power-iteration loop: per round ONE edge-sized join
    (ranks⋈links) + map-side partial sum, the dangling scalar kept
    in-plan (update() receives it as a broadcastable one-row frame),
    localCheckpoint per round, optional L∞ early stop. The teleport
    term is the ONLY thing that differs between the uniform and
    personalized variants — it lives in update()."""
    for _ in range(n_iter):
        dangling = ranks.join(has_out, "node", "left_anti").agg(
            F.coalesce(F.sum("rank"), F.lit(0.0)).alias("_dang")
        )
        contrib = (
            ranks.join(links, ranks.node == links._s)
            .select(F.col("_d").alias("node"), (F.col("rank") * F.col("_share")).alias("_c"))
            .groupBy("node")
            .agg(F.sum("_c").alias("_c"))
        )
        new_ranks = update(contrib, dangling).localCheckpoint()
        if tol is not None:
            delta = (
                new_ranks.join(
                    ranks.select("node", F.col("rank").alias("_old")), "node", "left"
                )
                .agg(F.max(F.abs(F.col("rank") - F.coalesce(F.col("_old"), F.lit(0.0)))))
                .first()[0]
            )
            ranks = new_ranks
            if delta is not None and delta < tol:
                break
        else:
            ranks = new_ranks
    return ranks


def personalized_pagerank(
    edges: DataFrame,
    seeds,
    *,
    src_col: str = "src",
    dst_col: str = "dst",
    weight_col: str | None = None,
    seed_col: str = "node",
    seed_weight_col: str | None = None,
    damping: float = 0.85,
    n_iter: int = 20,
    tol: float | None = None,
) -> DataFrame:
    """Personalized PageRank / random-walk-with-restart → ``(node,
    rank)``, ranks summing to 1. The seed-trust-propagation primitive
    of web-corpus curation (propagate quality from a trusted domain
    seed set through the link graph) and of graph-based similarity
    expansion (RWR proximity to a query node set).

    Semantics: the teleport distribution is the (weight-normalized)
    ``seeds`` set instead of uniform — each round ``r' = (1-d)·p +
    d·(Σ_in r/outshare + dangling·p)``; dangling mass restarts AT THE
    SEEDS (the standard RWR convention), so nodes unreachable from the
    seed set converge to rank 0, exactly the trust-propagation
    behaviour (a disconnected spam cluster earns nothing). ``seeds`` is
    a DataFrame with ``seed_col`` (optional ``seed_weight_col``,
    positive) or a plain python list; seeds are intersected with the
    graph's nodes (raises if none remain).

    Plan shape: identical to :func:`pagerank` (links built once +
    persisted, one edge-sized join per round, in-plan dangling scalar,
    node-sized teleport frame joined per round, localCheckpoint) —
    only the teleport vector differs.
    """
    if not 0.0 < damping < 1.0:
        raise ValueError(f"damping must be in (0, 1), got {damping}")
    if n_iter < 1:
        raise ValueError(f"n_iter must be >= 1, got {n_iter}")
    if tol is not None and tol <= 0:
        raise ValueError(f"tol must be positive, got {tol}")
    e, nodes = _pr_edge_and_node_frames(edges, src_col, dst_col, weight_col)
    spark = edges.sparkSession
    if isinstance(seeds, DataFrame):
        sw = (
            F.col(seed_weight_col).cast("double")
            if seed_weight_col
            else F.lit(1.0)
        )
        seed_df = seeds.select(F.col(seed_col).alias("node"), sw.alias("_sw"))
    else:
        seed_df = spark.createDataFrame(
            [(s,) for s in seeds], nodes.select("node").schema
        ).withColumn("_sw", F.lit(1.0))
    if seed_weight_col is not None:
        # NULL weights would silently drop teleport mass (ranks stop
        # summing to 1) and negative ones propagate negative ranks —
        # same fail-loudly contract as the edge-weight check above
        swmin, sw_null = seed_df.agg(
            F.min("_sw"), F.sum(F.col("_sw").isNull().cast("long"))
        ).first()
        if sw_null:
            raise ValueError(
                f"{sw_null} seed weight(s) are NULL or fail the double cast"
            )
        if swmin is not None and swmin <= 0:
            raise ValueError(f"seed weights must be positive, got {swmin}")
    seed_df = (
        seed_df.groupBy("node").agg(F.sum("_sw").alias("_sw"))
        .join(nodes, "node", "left_semi")
    )
    tot = seed_df.agg(F.sum("_sw")).first()[0]
    if tot is None or tot <= 0:
        raise ValueError(
            "no seeds intersect the graph's nodes (or weights are non-positive)"
        )
    # node-sized teleport vector, normalized, materialized once
    p = seed_df.select(
        "node", (F.col("_sw") / F.lit(float(tot))).alias("_p")
    ).localCheckpoint()

    links, has_out = _pr_links_tables(e)
    d = float(damping)
    ranks = p.select("node", F.col("_p").alias("rank")).localCheckpoint()

    def update(contrib, dangling):
        # seed teleport: r' = p*((1-d) + d*dangling) + d*contrib —
        # dangling mass restarts AT THE SEEDS (RWR), not uniformly
        return (
            nodes.join(contrib, "node", "left")
            .join(p, "node", "left")
            .crossJoin(F.broadcast(dangling))
            .select(
                "node",
                (
                    F.coalesce(F.col("_p"), F.lit(0.0))
                    * (F.lit(1.0 - d) + F.lit(d) * F.col("_dang"))
                    + F.lit(d) * F.coalesce(F.col("_c"), F.lit(0.0))
                ).alias("rank"),
            )
        )

    ranks = _pr_rounds(ranks, links, has_out, update, n_iter, tol)
    links.unpersist()
    return ranks


def hits(
    edges: DataFrame,
    *,
    src_col: str = "src",
    dst_col: str = "dst",
    n_iter: int = 20,
) -> DataFrame:
    """Kleinberg HITS over a directed edge table → ``(node, hub,
    authority)``, each vector L2-normalized (the standard convention).
    The citation/link-analysis complement of :func:`pagerank`: hubs
    point at good authorities, authorities are pointed at by good hubs.

    Per round (same iteration discipline as pagerank): authority =
    in-neighbor hub sum, hub = out-neighbor authority sum — each ONE
    edge-sized hash join + map-side partial sum; the L2 norms stay
    in-plan as broadcast one-row aggregates (no driver collect);
    ``localCheckpoint`` per round. Parallel edges accumulate.
    Deterministic up to float-sum ordering (the pagerank caveat)."""
    if n_iter < 1:
        raise ValueError(f"n_iter must be >= 1, got {n_iter}")
    e = edges.select(F.col(src_col).alias("_s"), F.col(dst_col).alias("_d")).persist()
    e.count()
    nodes = (
        e.select(F.col("_s").alias("node"))
        .unionByName(e.select(F.col("_d").alias("node")))
        .distinct()
        .localCheckpoint()
    )
    scores = nodes.select(
        "node", F.lit(1.0).alias("hub"), F.lit(1.0).alias("authority")
    ).localCheckpoint()
    for _ in range(n_iter):
        auth = (
            scores.join(e, scores.node == e._s)
            .groupBy(F.col("_d").alias("node"))
            .agg(F.sum("hub").alias("_a"))
        )
        a_norm = auth.agg(F.sqrt(F.sum(F.col("_a") * F.col("_a"))).alias("_an"))
        with_a = (
            nodes.join(auth, "node", "left")
            .crossJoin(F.broadcast(a_norm))
            .select(
                "node",
                (
                    F.coalesce(F.col("_a"), F.lit(0.0))
                    / F.when(F.col("_an") > 0, F.col("_an")).otherwise(F.lit(1.0))
                ).alias("authority"),
            )
        )
        hub = (
            with_a.join(e, with_a.node == e._d)
            .groupBy(F.col("_s").alias("node"))
            .agg(F.sum("authority").alias("_h"))
        )
        h_norm = hub.agg(F.sqrt(F.sum(F.col("_h") * F.col("_h"))).alias("_hn"))
        scores = (
            nodes.join(with_a, "node")
            .join(hub, "node", "left")
            .crossJoin(F.broadcast(h_norm))
            .select(
                "node",
                (
                    F.coalesce(F.col("_h"), F.lit(0.0))
                    / F.when(F.col("_hn") > 0, F.col("_hn")).otherwise(F.lit(1.0))
                ).alias("hub"),
                "authority",
            )
            .localCheckpoint()
        )
    e.unpersist()
    return scores


def triangle_count(
    edges: DataFrame,
    *,
    src_col: str = "src",
    dst_col: str = "dst",
) -> DataFrame:
    """Per-node triangle counts over an UNDIRECTED simple graph →
    ``(node, triangles)`` (nodes with zero triangles included). Input
    direction and duplicate/parallel edges are normalized away;
    self-loops are dropped.

    The classic degree-ordered formulation that keeps the join volume
    at O(Σ d_v²) bounded by the HIGH-degree side being the probe:

    1. canonicalize each edge to (lo, hi) by (degree, id) order — every
       triangle {a, b, c} then has exactly ONE wedge whose center is
       its lowest-ordered vertex, so no triangle is counted twice and
       hub-centered wedges (the d² explosion) collapse onto low-degree
       centers (each wedge center contributes C(d⁺, 2) with d⁺ its
       HIGHER-ordered neighbors only — ≤ O(√|E|) for any graph);
    2. wedges = the oriented edge list self-joined on its lo endpoint;
    3. a wedge (b, c) closes iff (b, c) is itself an oriented edge —
       one equi-join against the edge list;
    4. closed wedges credit all three corners: one union + groupBy.

    Every join is a hash equi-join on node keys; no cartesian, no
    Python. The oriented edge list is persisted across its three uses
    (tracked — ``release_signature_caches()`` drops it)."""
    e = edges.select(F.col(src_col).alias("_a"), F.col(dst_col).alias("_b"))
    und = (
        e.filter(F.col("_a") != F.col("_b"))
        .select(
            F.least("_a", "_b").alias("_u"), F.greatest("_a", "_b").alias("_v")
        )
        .distinct()
    )
    deg = (
        und.select(F.col("_u").alias("node"))
        .unionByName(und.select(F.col("_v").alias("node")))
        .groupBy("node")
        .agg(F.count(F.lit(1)).alias("_deg"))
    )
    # orient each undirected edge from the (degree, id)-smaller vertex
    # to the larger — the total order that bounds wedge fan-out
    du = deg.select(F.col("node").alias("_u"), F.col("_deg").alias("_du"))
    dv = deg.select(F.col("node").alias("_v"), F.col("_deg").alias("_dv"))
    from tilegrab_spark.operators.dedup import _persist_signatures

    oriented = _persist_signatures(
        und.join(du, "_u")
        .join(dv, "_v")
        .select(
            F.when(
                (F.col("_du") < F.col("_dv"))
                | ((F.col("_du") == F.col("_dv")) & (F.col("_u") < F.col("_v"))),
                F.struct(F.col("_u").alias("lo"), F.col("_v").alias("hi")),
            )
            .otherwise(F.struct(F.col("_v").alias("lo"), F.col("_u").alias("hi")))
            .alias("_e")
        )
        .select(F.col("_e.lo").alias("lo"), F.col("_e.hi").alias("hi"))
    )
    w1 = oriented.select(F.col("lo").alias("_c"), F.col("hi").alias("_x"))
    w2 = oriented.select(F.col("lo").alias("_c"), F.col("hi").alias("_y"))
    wedges = w1.join(w2, "_c").filter(F.col("_x") < F.col("_y"))
    # a wedge closes iff its outer pair is an oriented edge in EITHER
    # orientation of (x, y) — orientation is by degree order, so probe
    # both
    probe = oriented.select(F.col("lo").alias("_x"), F.col("hi").alias("_y")).unionByName(
        oriented.select(F.col("hi").alias("_x"), F.col("lo").alias("_y"))
    )
    tri = wedges.join(probe, ["_x", "_y"], "left_semi")
    corners = (
        tri.select(F.col("_c").alias("node"))
        .unionByName(tri.select(F.col("_x").alias("node")))
        .unionByName(tri.select(F.col("_y").alias("node")))
        .groupBy("node")
        .agg(F.count(F.lit(1)).alias("triangles"))
    )
    return (
        deg.select("node")
        .join(corners, "node", "left")
        .select("node", F.coalesce(F.col("triangles"), F.lit(0)).alias("triangles"))
    )


def k_core(
    edges: DataFrame,
    k: int,
    *,
    src_col: str = "src",
    dst_col: str = "dst",
    max_iter: int = 100,
) -> DataFrame:
    """Nodes of the k-core — the maximal subgraph where every node has
    degree ≥ k (undirected, simple; self-loops dropped) → ``(node,
    core_degree)`` with the node's degree WITHIN the core. The standard
    peeling fixpoint, distributed:

    each round drops nodes whose current degree < k and recomputes
    degrees on the induced subgraph (two left-semi joins + one
    map-side-combinable count — edge-sized, shrinking every round);
    ``localCheckpoint`` per round keeps lineage flat. Rounds needed =
    peeling depth (worst case O(n) on path-like graphs — the loop
    RAISES if ``max_iter`` rounds don't reach the fixpoint rather than
    silently returning a superset); the result is the unique k-core
    regardless of peel order, so no tie-breaking is needed."""
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    if max_iter < 1:
        raise ValueError(f"max_iter must be >= 1, got {max_iter}")
    e = edges.select(F.col(src_col).alias("_a"), F.col(dst_col).alias("_b"))
    und = (
        e.filter(F.col("_a") != F.col("_b"))
        .select(F.least("_a", "_b").alias("_u"), F.greatest("_a", "_b").alias("_v"))
        .distinct()
        .localCheckpoint()
    )
    n_edges = und.count()
    converged = False
    for _ in range(max_iter):
        deg = (
            und.select(F.col("_u").alias("node"))
            .unionByName(und.select(F.col("_v").alias("node")))
            .groupBy("node")
            .agg(F.count(F.lit(1)).alias("_deg"))
        )
        keep = deg.filter(F.col("_deg") >= k).select("node").localCheckpoint()
        nxt = (
            und.join(keep.select(F.col("node").alias("_u")), "_u", "left_semi")
            .join(keep.select(F.col("node").alias("_v")), "_v", "left_semi")
            .localCheckpoint()
        )
        n_next = nxt.count()
        und = nxt
        if n_next == n_edges:
            converged = True
            break
        n_edges = n_next
    if not converged:
        raise RuntimeError(
            f"k_core did not reach the peeling fixpoint in {max_iter} rounds; "
            "raise max_iter"
        )
    final_deg = (
        und.select(F.col("_u").alias("node"))
        .unionByName(und.select(F.col("_v").alias("node")))
        .groupBy("node")
        .agg(F.count(F.lit(1)).alias("core_degree"))
    )
    return final_deg.filter(F.col("core_degree") >= k)


def hop_distance(
    edges: DataFrame,
    sources: DataFrame,
    *,
    src_col: str = "src",
    dst_col: str = "dst",
    node_col: str = "node",
    directed: bool = False,
    max_iter: int = 50,
) -> DataFrame:
    """BFS layers: (node, dist, source) with ``dist`` = hop count from
    the nearest source (unit weights)."""
    return shortest_paths(
        edges,
        sources,
        src_col=src_col,
        dst_col=dst_col,
        weight_col=None,
        node_col=node_col,
        directed=directed,
        max_iter=max_iter,
    )
