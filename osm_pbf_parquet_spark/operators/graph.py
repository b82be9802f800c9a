"""Distributed graph analytics over DataFrame edge lists.

The reference engine resolves OSM relation/way references (a graph
traversal specialized to one schema); this module generalizes to the
link-analysis operators a training-data pipeline runs over citation /
co-occurrence / interaction graphs at corpus scale — PageRank for
source-quality weighting being the canonical one (cf. the quality
signals used by public web-corpus curations).

Design for 100 TB: edges and ranks are both corpus-sized, so every
iteration is ONE co-partitioned shuffle join on the node key plus one
map-side-combinable aggregation — the same plan a Pregel superstep
lowers to. Nothing is collected to the driver; the node spine, degree
table, and rank table stay distributed. Arithmetic is integer-scaled
(see ``pagerank_power``) so results are bit-reproducible and exactly
replayable by a SQL oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

PR_SCALE = 10**12  # rank mass carried as BIGINT(1e12): exact, orderless
PR_DAMP_NUM, PR_DAMP_DEN = 85, 100  # damping 0.85 as an exact rational


def pagerank_power(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    iterations: int = 3,
    k: int = 20,
    cache=None,
) -> DataFrame:
    """PageRank by power iteration, integer-exact.

    Every rank is a BIGINT scaled by ``PR_SCALE`` and the damping factor
    is the exact rational 85/100 applied with integer division, so the
    entire computation is order-independent integer arithmetic: the sum
    of contributions per target commutes exactly, a SQL oracle replays
    it bit-for-bit, and re-runs / task retries can never flip ranks by
    a float ulp. (Float PageRank diverges across engines in the 1e-15s,
    which a value-hash gate cannot tolerate; the quantization error here
    is ≤ 1e-12 of total mass per edge — far below any ranking use.)

    Per iteration: ranks ⋈ out-degree-annotated edges on the source key
    (co-partitioned shuffle), contributions aggregated per target
    (map-side combinable), teleport base added against the node spine
    via a LEFT join. ``iterations`` supersteps unroll into one Catalyst
    plan — no driver round-trips, no collect; the edge/degree/spine
    frames are persisted so supersteps reuse rather than re-derive them.
    The unrolled lineage grows linearly with ``iterations`` — fine at
    the handful power iteration needs; for dozens of supersteps insert
    a ``localCheckpoint`` every ~10 to keep the plan bounded. Dangling
    nodes (no out-edges) keep receiving the teleport base but their
    mass is not redistributed — the common simplified formulation;
    document if the sink-mass variant is needed.

    Returns the top-``k`` nodes by final scaled rank:
    (node, rank_scaled). Ties break on node id.
    """
    from ..functions.caching import owned_set, tie_release

    ps, owned = owned_set(cache)
    # ONE persisted corpus frame carries the distinct edges, the pinned
    # src-partitioning, AND the out-degree (r12 round 2): the previous
    # shape persisted e, materialized it, aggregated outdeg, joined it
    # back, repartitioned and materialized AGAIN — two serial
    # materialization jobs, a broadcast build, and an extra projection
    # pass over O(E). The degree now rides a count window OVER the same
    # hashpartitioning(src) the repartition just established (guide
    # §2.4: a window partitioned like the exchange shares it — the
    # mad_outliers/duplicate_spans lesson), so the build is
    # distinct-exchange → src-exchange → window, one cache, one count.
    # The src partitioning still makes every superstep exchange only the
    # O(V) ranks frame (the r12 SHJ pin below), in every join-strategy
    # config. Materialized eagerly BEFORE the node-count broadcast is
    # built: that broadcast-exchange job runs on its own driver thread
    # and raced the main job on the unpopulated cache — both re-derived
    # the full join+distinct edge extraction (twin corpus stages at the
    # 10× tier; the minhash sigs.count() precedent).
    edeg = ps.persist(
        edges.select(
            F.col(src).cast("long").alias("src"),
            F.col(dst).cast("long").alias("dst"),
        )
        .distinct()
        .repartition("src")
        .withColumn(
            "deg",
            F.count(F.lit(1)).over(Window.partitionBy("src")).cast("long"),
        )
    )
    edeg.count()
    # the node spine has two consumers — the n-count broadcast and the
    # teleport base — which otherwise EACH re-run the union+distinct
    # over the edge cache (the remaining twin stages after the eager
    # materialization fix)
    nodes = ps.persist(
        edeg.select(F.col("src").alias("node"))
        .union(edeg.select(F.col("dst").alias("node")))
        .distinct()
    )
    n_frame = nodes.agg(F.count("*").alias("n"))
    base = ps.persist(nodes.crossJoin(F.broadcast(n_frame)))
    ranks = base.select(
        "node", "n", F.expr(f"{PR_SCALE} div n").alias("rank"),
    )
    for _ in range(iterations):
        # r12: force shuffled-hash with the RANKS side as build. Left to
        # itself the planner broadcasts edeg — the O(E) side (32.2 MiB /
        # 586k rows at the 10× tier, rebuilt per superstep); backwards at
        # any scale. edeg's cache carries hashpartitioning(src)
        # from the build repartition, so under SHJ only the O(V) ranks frame is
        # exchanged per superstep and the build side is |V|/P rows per
        # partition (guide §3.1); SMJ would re-sort the cached edge
        # blocks every superstep. Measured 4.63 → 3.26 s at the 10× tier.
        contribs = (
            ranks.hint("shuffle_hash").join(edeg, ranks.node == edeg.src)
            .select(
                F.col("dst").alias("node"),
                F.expr(
                    f"(rank * {PR_DAMP_NUM}) div ({PR_DAMP_DEN} * deg)"
                ).alias("c"),
            )
            .groupBy("node")
            .agg(F.sum("c").alias("inflow"))
        )
        ranks = (
            base.join(contribs, "node", "left")
            .select(
                "node", "n",
                (
                    F.expr(f"({PR_SCALE} * {PR_DAMP_DEN - PR_DAMP_NUM})"
                           f" div ({PR_DAMP_DEN} * n)")
                    + F.coalesce("inflow", F.lit(0))
                ).alias("rank"),
            )
        )
    return tie_release(
        ranks.select("node", F.col("rank").cast("long").alias("rank_scaled"))
        .orderBy(F.desc("rank_scaled"), "node")
        .limit(k),
        ps, owned,
    )


def bfs_hops(
    edges: DataFrame,
    sources: DataFrame,
    max_hops: int = 3,
    src: str = "src",
    dst: str = "dst",
    cache=None,
    assume_distinct: bool = False,
) -> DataFrame:
    """Multi-source bounded-depth BFS: minimum hop count from any source
    to every reachable node within ``max_hops``.

    The iterative-traversal analog of the reference's relation-member
    resolution (``osm-pbf-parquet`` resolves one level of way→node refs;
    this generalizes to K levels over an arbitrary edge list). Returns
    (node BIGINT, hops INT) — first visit wins, which IS the minimum
    because levels expand in hop order.

    Scale: each level is one keyed equi-join (frontier ⋈ edges on the
    source key) + a distinct + a LEFT ANTI against the visited set —
    all co-partitioned shuffles on the node key; nothing is collected.
    The frontier and visited set are persisted per level so level K+1
    scans materialized blocks, not the re-derived lineage (which would
    grow quadratically in depth). One driver-side ``isEmpty`` per level
    exits early once the frontier drains — a boolean job, no rows move
    to the driver. For depths beyond ~15 insert a ``localCheckpoint``
    to keep the unioned visited-set plan bounded.

    ``sources``' first column is the seed node id; ``edges`` is directed
    (pass both directions for an undirected traversal).
    """
    from ..functions.caching import owned_set, tie_release

    ps, owned = owned_set(cache)
    # r12: callers whose edge list is distinct BY CONSTRUCTION (e.g.
    # shortest_hops symmetrizes an already-distinct'd directed pair set
    # whose two direction images are disjoint) skip the defensive
    # dedup — one full exchange + two-sided agg over the edge table
    # (11.6 MB / 1.17M rows at the 10× tier) for rows that are already
    # unique. BFS itself is set-semantic either way; the flag only
    # elides provably-no-op work (guide §2.4: a distinct on data that
    # is already unique is an accidental shuffle).
    e = edges.select(
        F.col(src).cast("long").alias("src"),
        F.col(dst).cast("long").alias("dst"),
    )
    if not assume_distinct:
        e = e.distinct()
    e = ps.persist(e)
    level0 = ps.persist(
        sources.select(F.col(sources.columns[0]).cast("long").alias("node"))
        .distinct()
        .withColumn("hops", F.lit(0).cast("int"))
    )
    # visited stays a LAZY union over the persisted per-level frames —
    # persisting the cumulative union itself would re-cache level h's
    # rows (K−h+1) times; the anti-join scans the same materialized
    # blocks through the union at identical cost
    visited = level0
    frontier = level0.select("node")
    for h in range(1, max_hops + 1):
        nxt = ps.persist(
            frontier.join(e, frontier["node"] == e["src"])
            .select(F.col("dst").alias("node"))
            .distinct()
            .join(visited.select("node"), "node", "left_anti")
            .withColumn("hops", F.lit(h).cast("int"))
        )
        if nxt.isEmpty():
            break
        visited = visited.unionByName(nxt)
        frontier = nxt.select("node")
    return tie_release(visited, ps, owned)


def _undirected(edges: DataFrame, src: str, dst: str) -> DataFrame:
    """Canonical undirected edge set: drop self-loops, order each edge
    (u < v), dedupe — THE single definition of what an undirected edge
    is for this module's operators."""
    return (
        edges.filter(F.col(src) != F.col(dst))
        .select(
            F.least(F.col(src), F.col(dst)).cast("long").alias("u"),
            F.greatest(F.col(src), F.col(dst)).cast("long").alias("v"),
        )
        .distinct()
    )


def triangle_count(
    edges: DataFrame, src: str = "src", dst: str = "dst", cache=None
) -> DataFrame:
    """Exact triangle count of an undirected graph, degree-oriented.

    Classic two-path + closing-edge plan: orient every undirected edge
    from its lower-(degree, id) endpoint to the higher one, join the
    oriented list with itself to enumerate wedges a→b→c, then LEFT SEMI
    against the oriented list on (a, c). The total (degree, id) order
    makes each triangle appear exactly once AND bounds the wedge count
    by sum(min-degree²) — the standard fix for power-law skew, where
    orienting by id alone lets one hub node generate O(deg²) wedges.

    Returns one row: (n_nodes, n_edges, n_triangles) all BIGINT. The
    three scalars come from three bounded aggregations broadcast-joined
    together — no driver collect.
    """
    from ..functions.caching import owned_set, tie_release

    ps, owned = owned_set(cache)
    und = ps.persist(_undirected(edges, src, dst))
    deg = (
        und.select(F.col("u").alias("node"))
        .unionAll(und.select(F.col("v").alias("node")))
        .groupBy("node")
        .agg(F.count("*").alias("deg"))
    )
    du = deg.select(F.col("node").alias("u"), F.col("deg").alias("du"))
    dv = deg.select(F.col("node").alias("v"), F.col("deg").alias("dv"))
    oriented = ps.persist(
        und.join(du, "u")
        .join(dv, "v")
        .select(
            F.when(
                (F.col("du") < F.col("dv"))
                | ((F.col("du") == F.col("dv")) & (F.col("u") < F.col("v"))),
                F.struct(F.col("u").alias("a"), F.col("v").alias("b")),
            )
            .otherwise(F.struct(F.col("v").alias("a"), F.col("u").alias("b")))
            .alias("e")
        )
        .select("e.a", "e.b")
    )
    lhs = oriented.select(F.col("a"), F.col("b").alias("mid"))
    rhs = oriented.select(F.col("a").alias("mid"), F.col("b").alias("c"))
    wedges = lhs.join(rhs, "mid").select("a", "c")
    tri = (
        wedges.join(
            oriented.select(F.col("a"), F.col("b").alias("c")), ["a", "c"],
            "left_semi",
        )
        .agg(F.count("*").cast("long").alias("n_triangles"))
    )
    n_nodes = deg.agg(F.count("*").cast("long").alias("n_nodes"))
    n_edges = und.agg(F.count("*").cast("long").alias("n_edges"))
    out = (
        n_nodes.crossJoin(F.broadcast(n_edges))
        .crossJoin(F.broadcast(tri))
        .select("n_nodes", "n_edges", "n_triangles")
    )
    return tie_release(out, ps, owned)


def kcore_peel(
    edges: DataFrame,
    k: int,
    rounds: int = 4,
    src: str = "src",
    dst: str = "dst",
    cache=None,
) -> DataFrame:
    """Bounded k-core peeling: ``rounds`` synchronous rounds of removing
    nodes with degree < ``k`` (degree recomputed over survivors each
    round). Like ``pagerank_power``'s fixed supersteps, the round bound
    makes the operator a deterministic, SQL-replayable plan — run more
    rounds (or loop until a round removes nothing, one ``count()`` per
    round) for the full fixpoint; each round only shrinks the node set,
    so partial peeling is a sound over-approximation of the true core.

    Scale per round: two LEFT SEMI joins filter the edge list to
    surviving endpoints (keyed, co-partitioned) + one combinable degree
    aggregation; the survivor set is persisted so the next round scans
    a materialization. Nothing is collected.

    Returns the surviving (node, deg) after the final round. ``deg`` is
    each survivor's degree within the PREVIOUS round's alive set (the
    subgraph its final filter was evaluated against); once peeling has
    converged — a round that removes nothing — that equals the degree
    within the surviving subgraph itself, ≥ k for every row. On a
    non-converged bounded peel, treat deg as an upper bound.
    """
    from ..functions.caching import owned_set, tie_release

    if rounds < 1 or k < 1:
        raise ValueError(f"kcore_peel needs rounds >= 1 and k >= 1; "
                         f"got rounds={rounds}, k={k}")
    ps, owned = owned_set(cache)
    und = _undirected(edges, src, dst)
    e = ps.persist(
        und.unionAll(und.select(F.col("v").alias("u"), F.col("u").alias("v")))
    )
    alive = None  # None = all nodes alive (first pass degrees over e itself)
    deg = None
    for _ in range(rounds):  # one degree pass + filter per peel round
        ee = e
        if alive is not None:
            au = alive.select(F.col("node").alias("u"))
            av = alive.select(F.col("node").alias("v"))
            ee = e.join(au, "u", "left_semi").join(av, "v", "left_semi")
        deg = ee.groupBy(F.col("u").alias("node")).agg(
            F.count("*").cast("long").alias("deg")
        )
        alive = ps.persist(deg.where(F.col("deg") >= k).select("node"))
    survivors = deg.where(F.col("deg") >= k)
    return tie_release(survivors, ps, owned)


def label_propagation(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    rounds: int = 3,
    cache=None,
) -> DataFrame:
    """Synchronous label-propagation community detection (Raghavan,
    Albert & Kumara 2007), made fully deterministic: labels start as the
    node's own id; each round every node adopts the label that is most
    frequent among its neighbors, ties broken to the SMALLEST label —
    picked with one map-side-combinable ``max(struct(cnt, -label))``
    agg, no window, no RNG (the published algorithm breaks ties
    randomly; a gate needs a replayable comparator).

    ``edges`` must already contain both directions of each undirected
    edge and carry one row per distinct edge (duplicate rows would
    weight neighbor votes). Fixed ``rounds`` supersteps — synchronous
    LPA can oscillate on bipartite structure, so a fixpoint loop may
    not terminate; a bounded unroll is both deterministic and
    SQL-replayable (the kcore_peel contract). Per round: one keyed join
    of the label frame onto the edge list + two combinable aggs; the
    label frame persists per round so lineage stays linear.

    Returns (node, community) for every node with at least one edge."""
    from ..functions.caching import owned_set, tie_release

    ps, owned = owned_set(cache)
    e = ps.persist(
        edges.select(F.col(src).alias("e_src"), F.col(dst).alias("e_dst"))
    )
    # eager materialization: at gate scale the per-round pick/label
    # attaches broadcast-build on their own threads and race the cold
    # cache, re-deriving the caller's edge extraction (see
    # louvain_move_rounds)
    e.count()
    labels = ps.persist(
        e.select(F.col("e_src").alias("node"))
        .distinct()
        .withColumn("lbl", F.col("node"))
    )
    for _ in range(rounds):
        msgs = e.join(labels, e.e_dst == labels.node).select(
            F.col("e_src").alias("node"), "lbl"
        )
        counts = msgs.groupBy("node", "lbl").agg(F.count("*").alias("cnt"))
        pick = counts.groupBy("node").agg(
            F.max(F.struct(F.col("cnt"), (-F.col("lbl")).alias("nl"))).alias("m")
        ).select("node", (-F.col("m.nl")).alias("new_lbl"))
        labels = ps.persist(
            labels.join(pick, "node", "left")
            .select("node",
                    F.coalesce("new_lbl", "lbl").cast("long").alias("lbl"))
        )
    return tie_release(
        labels.select("node", F.col("lbl").alias("community")), ps, owned
    )


def community_modularity(
    edges: DataFrame,
    communities: DataFrame,
    src: str = "src",
    dst: str = "dst",
    node: str = "node",
    community: str = "community",
) -> DataFrame:
    """Newman modularity per community (Newman & Girvan 2004) — the
    quality readout for a community assignment (e.g.
    ``label_propagation``'s output): for community c with m_c internal
    edges and degree sum d_c over a graph of m undirected edges,

        Q_c = m_c/m − (d_c / 2m)²

    computed from exact integer sufficient statistics. ``edges`` carries
    both directions of each DISTINCT undirected edge (the
    label_propagation contract), so directed counts D = 2m, W_c = 2·m_c
    and S_c = d_c are plain BIGINT counts; the contribution is the
    single float composition (W_c·D − S_c²) / D² on decimal(38,0)
    intermediates (the group_regression overflow discipline: d_c² wraps
    int64 once a community's degree sum passes ~3·10⁹).

    Plan: one 1-row total-count broadcast, two keyed joins of the label
    frame onto the edge list (endpoint-keyed, the exchanges LPA already
    paid), two combinable aggs — community-bounded output. Returns
    (community, n_nodes, internal_edges, degree_sum, q_contrib);
    Σ q_contrib is the partition's modularity Q."""
    e = edges.select(F.col(src).alias("e_src"), F.col(dst).alias("e_dst"))
    cl = communities.select(F.col(node).alias("n"),
                            F.col(community).alias("c"))
    tot = e.agg(F.count(F.lit(1)).cast("decimal(38,0)").alias("d_total"))
    within = (
        e.join(cl.withColumnRenamed("n", "e_src")
                 .withColumnRenamed("c", "c_src"), "e_src")
        .join(cl.withColumnRenamed("n", "e_dst")
                .withColumnRenamed("c", "c_dst"), "e_dst")
        .filter(F.col("c_src") == F.col("c_dst"))
        .groupBy(F.col("c_src").alias("community"))
        .agg(F.count(F.lit(1)).alias("w_directed"))
    )
    degsum = (
        e.groupBy(F.col("e_src").alias("n"))
        .agg(F.count(F.lit(1)).alias("deg"))
        .join(cl, "n")
        .groupBy(F.col("c").alias("community"))
        .agg(F.sum("deg").cast("decimal(38,0)").alias("s_c"),
             F.count(F.lit(1)).cast("long").alias("n_nodes"))
    )
    j = (
        degsum.join(within, "community", "left")
        .withColumn("w_d", F.coalesce("w_directed", F.lit(0))
                    .cast("decimal(38,0)"))
        .crossJoin(F.broadcast(tot))
    )
    return j.select(
        "community",
        "n_nodes",
        (F.col("w_d") / 2).cast("long").alias("internal_edges"),
        F.col("s_c").cast("long").alias("degree_sum"),
        F.round(
            ((F.col("w_d") * F.col("d_total")
              - F.col("s_c") * F.col("s_c")).cast("double"))
            / (F.col("d_total") * F.col("d_total")).cast("double"),
            9,
        ).alias("q_contrib"),
    )


def louvain_move_rounds(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    rounds: int = 2,
    cache=None,
) -> DataFrame:
    """Louvain phase-one local moves (Blondel, Guillaume, Lambiotte &
    Lefebvre, J. Stat. Mech. 2008 §2), parallelized synchronously (the
    PLM scheme of Staudt & Meyerhenke, IEEE TPDS 2016): starting from
    singleton communities, every node simultaneously evaluates the
    modularity gain of joining each neighbor's community and moves to
    the best strictly-positive one. Unlike ``label_propagation`` (which
    chases the most FREQUENT neighbor label), moves optimize Newman
    modularity directly — the objective ``community_modularity`` reads
    out.

    For node i currently in community a, candidate c, graph of m
    undirected edges (D = 2m directed rows, the symmetric-distinct edge
    contract of label_propagation):

        ΔQ(i: a→c) ∝ D·(k_ic − k_ia\\i) − k_i·(Σ_c − (Σ_a − k_i))

    where k_ic counts i's neighbors in c, Σ_c the community's degree
    sum. The proportionality constant 1/(2m²) > 0 is dropped — gains
    compare EXACTLY in decimal(38,0) integer arithmetic (D·k_ic wraps
    int64 once D·deg passes ~9e18, real at fleet scale), so the argmax
    is replayable: max(struct(gain, −c)), move iff gain > 0, ties to
    the smallest community id. No RNG, no float.

    Synchronous moves can oscillate — two singletons that each see the
    other's community as strictly better swap forever. The published
    parallel-Louvain remedy is applied (Lu, Halappanavar &
    Kalyanaraman, Parallel Computing 46, 2015, §4.1 "minimum label"
    heuristic): the argmax move is VETOED when both the mover's own
    community and the target community are singletons and the target's
    label is larger — exactly the configuration that produces swaps;
    the smaller-labeled side still moves, so mass coalesces instead of
    ping-ponging. Rounds stay a bounded unroll (non-singleton
    oscillations remain possible in theory), each one deterministic
    and gate-pinned.

    Per round: TWO endpoint-keyed joins of bounded frames onto the edge
    list / assignment (the exchanges LPA pays), four map-side-combinable
    aggs (k_ic, Σ_c, k_ia, argmax), one broadcast 1-row total. The
    assignment persists per round; lineage stays linear in rounds.

    Returns (node, community) for every node with at least one edge.
    """
    from ..functions.caching import owned_set, tie_release

    ps, owned = owned_set(cache)
    e = ps.persist(
        edges.select(F.col(src).alias("e_src"), F.col(dst).alias("e_dst"))
    )
    # materialize BEFORE any broadcast consumer is built: the d_tot
    # 1-row broadcast (and, at gate scale, AQE-broadcast deg/comdeg
    # builds) runs on its own driver thread and races the main job on
    # the unpopulated cache — each racer re-derives the caller's full
    # edge-extraction subtree (the minhash sigs.count() precedent)
    e.count()
    deg = ps.persist(
        e.groupBy(F.col("e_src").alias("node"))
        .agg(F.count("*").cast("long").alias("k"))
    )
    d_tot = e.agg(F.count("*").cast("decimal(38,0)").alias("d_total"))
    asg = ps.persist(deg.select("node", F.col("node").alias("com")))
    for _ in range(rounds):
        comdeg = (
            asg.join(deg, "node")
            .groupBy("com")
            .agg(F.sum("k").cast("decimal(38,0)").alias("s_c"),
                 F.count("*").cast("long").alias("n_c"))
        )
        k_ic = (
            e.join(asg.withColumnRenamed("node", "e_dst"), "e_dst")
            .groupBy(F.col("e_src").alias("node"), F.col("com"))
            .agg(F.count("*").cast("long").alias("cnt"))
        )
        cur = asg.select("node", F.col("com").alias("a"))
        cand = k_ic.join(cur, "node")
        k_ia = cand.groupBy("node").agg(
            F.sum(F.when(F.col("com") == F.col("a"), F.col("cnt"))
                  .otherwise(F.lit(0))).cast("long").alias("k_ia")
        )
        gains = (
            cand.filter(F.col("com") != F.col("a"))
            .join(k_ia, "node")
            .join(deg, "node")
            .join(comdeg.withColumnRenamed("com", "_cc")
                  .withColumnRenamed("s_c", "s_cand")
                  .withColumnRenamed("n_c", "n_cand"),
                  F.col("com") == F.col("_cc"))
            .join(comdeg.withColumnRenamed("com", "_ca")
                  .withColumnRenamed("s_c", "s_own")
                  .withColumnRenamed("n_c", "n_own"),
                  F.col("a") == F.col("_ca"))
            .crossJoin(F.broadcast(d_tot))
            .select(
                "node", "a", "com", "n_cand", "n_own",
                (
                    F.col("d_total")
                    * (F.col("cnt") - F.col("k_ia")).cast("decimal(38,0)")
                    - F.col("k").cast("decimal(38,0)")
                    * (F.col("s_cand") - F.col("s_own") + F.col("k"))
                ).alias("gain"),
            )
        )
        # argmax on (gain, smallest com); n_cand/n_own ride as payload —
        # (gain, -com) is unique per (node, com), so they never decide
        # the comparison
        pick = (
            gains.groupBy("node")
            .agg(F.max(F.struct(
                F.col("gain"),
                (-F.col("com")).alias("nc"),
                F.col("n_cand"),
                F.col("n_own"),
            )).alias("m"))
            .select(
                "node",
                F.col("m.gain").alias("best_gain"),
                (-F.col("m.nc")).cast("long").alias("best_com"),
                F.col("m.n_cand").alias("n_cand"),
                F.col("m.n_own").alias("n_own"),
            )
        )
        asg = ps.persist(
            cur.join(pick, "node", "left")
            .select(
                "node",
                F.when(
                    (F.col("best_gain") > 0)
                    & ~(
                        (F.col("n_own") == 1) & (F.col("n_cand") == 1)
                        & (F.col("best_com") > F.col("a"))
                    ),
                    F.col("best_com"),
                ).otherwise(F.col("a")).cast("long").alias("com"),
            )
        )
    return tie_release(
        asg.select("node", F.col("com").alias("community")), ps, owned
    )


def louvain_coarsen(
    edges: DataFrame,
    communities: DataFrame,
    src: str = "src",
    dst: str = "dst",
    node: str = "node",
    community: str = "community",
) -> DataFrame:
    """Louvain phase-2 graph contraction (Blondel et al. 2008 §2: "a
    new network whose nodes are the communities"): every community
    becomes a supernode; edge weights between two supernodes sum the
    directed edge count between their members, and intra-community
    edges become self-loop weight. Feeding the result back through
    weighted move rounds is the multi-level Louvain loop; the
    contraction itself is the operator a 100 TB graph needs most —
    after one level the graph is community-count-sized, and every
    subsequent level runs on frames orders of magnitude smaller.

    Exactness: weights are plain BIGINT counts of directed edge rows
    (the symmetric-distinct contract upstream), so contraction is ONE
    pair of endpoint-keyed joins (the exchanges every round here pays
    already) + one combinable (c_src, c_dst) agg. Total directed
    weight is conserved: Σ weight = |edges| — the invariant the unit
    test pins.

    Returns (c_src, c_dst, weight); self-loops carry c_src = c_dst
    with weight = 2·(internal undirected edges) exactly as the
    modularity bookkeeping expects.
    """
    e = edges.select(F.col(src).alias("e_src"), F.col(dst).alias("e_dst"))
    cl = communities.select(F.col(node).alias("n"),
                            F.col(community).alias("c"))
    return (
        e.join(cl.withColumnRenamed("n", "e_src")
                 .withColumnRenamed("c", "c_src"), "e_src")
        .join(cl.withColumnRenamed("n", "e_dst")
                .withColumnRenamed("c", "c_dst"), "e_dst")
        .groupBy("c_src", "c_dst")
        .agg(F.count(F.lit(1)).cast("long").alias("weight"))
    )
