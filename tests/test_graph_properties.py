"""Property tests for the graph suite: the distributed plans
(degree-oriented wedges, level-synchronous frontiers, synchronous
peeling, integer power iteration) must agree EXACTLY with trivially
correct sequential references on arbitrary small graphs — multi-edges,
self-loops, disconnected components, stars, cliques — the shapes where
orientation and round-synchronization logic break first."""

from __future__ import annotations

import pytest

from collections import defaultdict

from hypothesis import given, settings, strategies as st

from osm_pbf_parquet_spark.operators.graph import (
    PR_DAMP_DEN,
    PR_DAMP_NUM,
    PR_SCALE,
    bfs_hops,
    kcore_peel,
    pagerank_power,
    triangle_count,
)

edge_lists = st.lists(
    st.tuples(st.integers(1, 8), st.integers(1, 8)),
    min_size=1,
    max_size=20,
)


def _undirected(edges):
    return {
        (min(a, b), max(a, b)) for a, b in edges if a != b
    }


@settings(max_examples=8, deadline=None)
@given(edge_lists)
def test_triangle_count_matches_brute_force(spark, edges):
    df = spark.createDataFrame(edges, "src long, dst long")
    r = triangle_count(df).collect()[0]
    und = _undirected(edges)
    nodes = {n for e in und for n in e}
    tris = 0
    ns = sorted(nodes)
    for i, a in enumerate(ns):
        for b in ns[i + 1 :]:
            if (a, b) not in und:
                continue
            for c in ns:
                if c > b and (a, c) in und and (b, c) in und:
                    tris += 1
    assert r["n_nodes"] == len(nodes)
    assert r["n_edges"] == len(und)
    assert r["n_triangles"] == tris, sorted(und)


@settings(max_examples=8, deadline=None)
@given(edge_lists, st.integers(1, 8))
def test_bfs_hops_matches_sequential_bfs(spark, edges, seed):
    df = spark.createDataFrame(edges, "src long, dst long")
    sources = spark.createDataFrame([(seed,)], "node long")
    got = {
        r["node"]: r["hops"]
        for r in bfs_hops(df, sources, max_hops=3).collect()
    }
    adj = defaultdict(set)
    for a, b in edges:  # DIRECTED, as the operator documents
        adj[a].add(b)
    want = {seed: 0}
    frontier = [seed]
    for h in range(1, 4):
        nxt = sorted(
            {d for n in frontier for d in adj[n] if d not in want}
        )
        for d in nxt:
            want[d] = h
        frontier = nxt
        if not frontier:
            break
    assert got == want, edges


@settings(max_examples=8, deadline=None)
@given(edge_lists, st.integers(1, 3))
def test_kcore_peel_matches_synchronous_reference(spark, edges, k):
    rounds = 3
    df = spark.createDataFrame(edges, "src long, dst long")
    got = {
        r["node"]: r["deg"] for r in kcore_peel(df, k, rounds).collect()
    }
    und = _undirected(edges)
    alive = None  # None = every node
    deg: dict[int, int] = {}
    for _ in range(rounds):
        deg = defaultdict(int)
        for a, b in und:
            if alive is None or (a in alive and b in alive):
                deg[a] += 1
                deg[b] += 1
        alive = {n for n, d in deg.items() if d >= k}
    want = {n: d for n, d in deg.items() if d >= k}
    assert got == want, (sorted(und), k)


@settings(max_examples=6, deadline=None)
@given(edge_lists)
def test_pagerank_matches_integer_power_iteration(spark, edges):
    iters = 3
    df = spark.createDataFrame(edges, "src long, dst long")
    got = {
        r["node"]: r["rank_scaled"]
        for r in pagerank_power(df, iterations=iters, k=20).collect()
    }
    e = {(a, b) for a, b in edges}  # the operator dedupes edges
    nodes = sorted({n for t in e for n in t})
    n = len(nodes)
    outdeg = defaultdict(int)
    for a, _ in e:
        outdeg[a] += 1
    rank = {v: PR_SCALE // n for v in nodes}
    for _ in range(iters):
        inflow = defaultdict(int)
        for a, b in e:
            inflow[b] += (rank[a] * PR_DAMP_NUM) // (PR_DAMP_DEN * outdeg[a])
        rank = {
            v: (PR_SCALE * (PR_DAMP_DEN - PR_DAMP_NUM)) // (PR_DAMP_DEN * n)
            + inflow[v]
            for v in nodes
        }
    # k=20 > max node count here, so the operator returns every node
    assert got == rank, sorted(e)


# --- label propagation vs sequential synchronous reference -------------------


def _ref_lpa(pairs, rounds):
    """Sequential synchronous LPA: per round every node adopts the most
    frequent neighbor label, ties to the smallest label; isolated-in-
    round nodes keep theirs. `pairs` are DISTINCT directed edges
    (both directions present for undirected graphs)."""
    nbrs = defaultdict(set)
    for u, v in pairs:
        nbrs[u].add(v)
    labels = {n: n for n in nbrs}
    for _ in range(rounds):
        nxt = {}
        for n in labels:
            votes = defaultdict(int)
            for m in nbrs[n]:
                if m in labels:
                    votes[labels[m]] += 1
            if votes:
                best = min(votes.items(), key=lambda kv: (-kv[1], kv[0]))
                nxt[n] = best[0]
            else:
                nxt[n] = labels[n]
        labels = nxt
    return labels


@settings(max_examples=10, deadline=None)
@given(edge_lists, st.integers(1, 3))
def test_label_propagation_matches_sequential(spark, edges, rounds):
    from osm_pbf_parquet_spark.operators.graph import label_propagation

    # symmetrize + dedupe, drop self-loops (a self-vote is degenerate
    # and the operator contract is a distinct undirected edge list)
    pairs = {(u, v) for u, v in edges if u != v}
    pairs |= {(v, u) for u, v in pairs}
    if not pairs:
        return
    df = spark.createDataFrame(sorted(pairs), "src long, dst long")
    got = {
        r["node"]: r["community"]
        for r in label_propagation(df, rounds=rounds).collect()
    }
    assert got == _ref_lpa(pairs, rounds)


def test_community_modularity_known_values(spark):
    """Hand-checked graph: two triangles joined by one bridge, perfect
    partition — each community contributes 3/7 − (7/14)² = 0.178571429;
    and the trivial single-community partition scores exactly 0."""
    from osm_pbf_parquet_spark.operators.graph import community_modularity

    und = [(1, 2), (2, 3), (1, 3), (4, 5), (5, 6), (4, 6), (3, 4)]
    pairs = und + [(b, a) for a, b in und]
    edges = spark.createDataFrame(pairs, "src long, dst long")
    comm = spark.createDataFrame(
        [(n, 1 if n <= 3 else 4) for n in range(1, 7)],
        "node long, community long",
    )
    rows = {r["community"]: r for r in
            community_modularity(edges, comm).collect()}
    for c in (1, 4):
        assert rows[c]["n_nodes"] == 3
        assert rows[c]["internal_edges"] == 3
        assert rows[c]["degree_sum"] == 7
        assert rows[c]["q_contrib"] == 0.178571429
    trivial = spark.createDataFrame(
        [(n, 0) for n in range(1, 7)], "node long, community long"
    )
    [row] = community_modularity(edges, trivial).collect()
    assert row["internal_edges"] == 7 and row["q_contrib"] == 0.0


def _ref_louvain(pairs, rounds):
    """Sequential synchronous Louvain local-move reference: exact
    integer gains D·(k_ic − k_ia) − k_i·(Σ_c − Σ_a + k_i), move iff
    strictly positive, ties to smallest community id, with the Lu et
    al. 2015 minimum-label swap veto (singleton → larger-labeled
    singleton blocked AFTER the argmax)."""
    deg = defaultdict(int)
    for u, _v in pairs:
        deg[u] += 1
    d_total = len(pairs)
    asg = {n: n for n in deg}
    for _ in range(rounds):
        s = defaultdict(int)
        size = defaultdict(int)
        for n, c in asg.items():
            s[c] += deg[n]
            size[c] += 1
        kic = defaultdict(int)
        for u, v in pairs:
            kic[(u, asg[v])] += 1
        nxt = {}
        for n, a in asg.items():
            k_ia = kic.get((n, a), 0)
            best = None
            for (u, c), cnt in kic.items():
                if u != n or c == a:
                    continue
                gain = (d_total * (cnt - k_ia)
                        - deg[n] * (s[c] - s[a] + deg[n]))
                key = (gain, -c)
                if best is None or key > best[0]:
                    best = (key, c)
            if (best and best[0][0] > 0
                    and not (size[a] == 1 and size[best[1]] == 1
                             and best[1] > a)):
                nxt[n] = best[1]
            else:
                nxt[n] = a
        asg = nxt
    return asg


@settings(max_examples=10, deadline=None)
@given(edge_lists, st.integers(1, 3))
@pytest.mark.slow  # r13 driver tier: operator keeps oracle-parity coverage; full tier runs this each round
def test_louvain_moves_match_sequential(spark, edges, rounds):
    from osm_pbf_parquet_spark.operators.graph import louvain_move_rounds

    pairs = {(u, v) for u, v in edges if u != v}
    pairs |= {(v, u) for u, v in pairs}
    if not pairs:
        return
    df = spark.createDataFrame(sorted(pairs), "src long, dst long")
    got = {
        r["node"]: r["community"]
        for r in louvain_move_rounds(df, rounds=rounds).collect()
    }
    assert got == _ref_louvain(pairs, rounds)


def test_louvain_moves_two_triangles_bridge(spark):
    """Two triangles + bridge, rounds=2, hand-traced WITH the
    minimum-label swap veto: round 1 collapses {1,2,3} onto label 1
    (node 1's best target {2} is vetoed — singleton to larger-labeled
    singleton — while 2 and 3 flow downhill to 1) and 6 joins 5;
    round 2 pulls 4 into {5,6}. The PERFECT two-triangle partition,
    which pure synchronous moves never reach (they oscillate); the
    modularity readout certifies the known optimum 2·(3/7 − 1/4)."""
    from osm_pbf_parquet_spark.operators.graph import (
        community_modularity,
        louvain_move_rounds,
    )

    und = [(1, 2), (2, 3), (1, 3), (4, 5), (5, 6), (4, 6), (3, 4)]
    pairs = und + [(b, a) for a, b in und]
    edges = spark.createDataFrame(pairs, "src long, dst long")
    comm = louvain_move_rounds(edges, rounds=2)
    got = {r["node"]: r["community"] for r in comm.collect()}
    assert got == {1: 1, 2: 1, 3: 1, 4: 5, 5: 5, 6: 5}
    assert got == _ref_louvain(set(pairs), 2)
    q_moved = sum(
        r["q_contrib"]
        for r in community_modularity(edges, comm).collect()
    )
    singles = spark.createDataFrame(
        [(n, n) for n in range(1, 7)], "node long, community long"
    )
    q_single = sum(
        r["q_contrib"]
        for r in community_modularity(edges, singles).collect()
    )
    # 2·(3/7 − (7/14)²) vs −Σ(k_i/14)²
    assert q_moved > q_single
    assert abs(q_moved - 2 * 0.178571429) < 1e-8
    assert abs(q_single - (-0.173469385)) < 1e-8


def test_louvain_coarsen_two_triangles(spark):
    """Contraction of the perfect two-triangle partition: two
    supernodes, self-loop weight 6 (= 2·3 internal undirected edges)
    each, bridge weight 1 per direction; total directed weight is
    conserved (Σ = |e| = 14)."""
    from osm_pbf_parquet_spark.operators.graph import (
        louvain_coarsen,
        louvain_move_rounds,
    )

    und = [(1, 2), (2, 3), (1, 3), (4, 5), (5, 6), (4, 6), (3, 4)]
    pairs = und + [(b, a) for a, b in und]
    edges = spark.createDataFrame(pairs, "src long, dst long")
    comm = louvain_move_rounds(edges, rounds=2)
    got = {(r["c_src"], r["c_dst"]): r["weight"]
           for r in louvain_coarsen(edges, comm).collect()}
    assert got == {(1, 1): 6, (5, 5): 6, (1, 5): 1, (5, 1): 1}
    assert sum(got.values()) == len(pairs)
