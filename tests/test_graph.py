"""Graph-layer operator tests on the deterministic edges fixture."""

from pyspark.sql import functions as F

from automem_spark.operators.graph import (
    connected_components,
    expand_relations,
    graph_stats,
    preference_ranking,
    related_memories_bfs,
    relations_fetch,
    resolve_supersession,
    sync_drift,
)
from automem_spark.operators.similarity import cosine_threshold_self_join
from automem_spark.sources.graph_fixture import edges_view
from automem_spark.sources.tables import load_table, memories_view


def test_edges_fixture_shape(spark, sf_dir):
    edges = edges_view(spark, sf_dir)
    types = {r.rel_type for r in edges.select("rel_type").distinct().collect()}
    assert {"RELATES_TO", "SIMILAR_TO", "PRECEDED_BY", "PREFERS_OVER",
            "EXEMPLIFIES", "CONTRADICTS", "DISCOVERED", "EXPLAINS",
            "INVALIDATED_BY", "EVOLVED_INTO"} <= types
    # hub node 5 has >5 outgoing
    hub = edges.filter(F.col("src") == 5).count()
    assert hub >= 8


def test_relations_fetch_caps_and_order(spark, sf_dir):
    edges = edges_view(spark, sf_dir)
    mem = memories_view(spark, sf_dir)
    got = relations_fetch(edges, mem, 5)
    per_src = got.groupBy("src").count().agg(F.max("count")).collect()[0][0]
    assert per_src <= 5
    # hub node trimmed to exactly 5
    assert got.filter(F.col("src") == 5).count() == 5
    # legacy EXPLAINS canonicalized
    assert got.filter(F.col("rel_type") == "EXPLAINS").count() == 0


def test_supersession_chains(spark, sf_dir):
    edges = edges_view(spark, sf_dir)
    got = {r.start: (r.head, r.hops) for r in resolve_supersession(edges).collect()}
    # chain 10->11->...->16 capped at 5 hops => head 15
    assert got[10] == (15, 5)
    # mid-chain entry walks to the true head 16 (6 hops away from 10, 4 from 12)
    assert got[12] == (16, 4)
    # short chains
    assert got[30] == (31, 1)
    assert got[20] == (22, 2)
    # EVOLVED_INTO chain 50->53
    assert got[50] == (53, 3)
    # 2-cycle stops at the other node
    assert got[40] == (41, 1)
    assert got[41] == (40, 1)


def test_supersession_paths_identical(spark, sf_dir):
    """The r13 dispatch (single-task pointer walk below
    SUPERSESSION_LOCAL_MAX_WALKS, checkpointed join loop above) must be
    output-identical on both the raw walk and the state-gated walk that
    current_state_filter drives."""
    from automem_spark.operators.graph import SUPERSESSION_TYPES

    edges = edges_view(spark, sf_dir)
    mem = memories_view(spark, sf_dir)
    state = mem.select(
        "id",
        F.when(F.col("id") % 3 == 0, F.lit("superseded")).alias("state_reason"),
    )
    for ns in (None, state):
        local = resolve_supersession(edges, node_state=ns, local_max_walks=10**9)
        loop = resolve_supersession(edges, node_state=ns, local_max_walks=0)
        got_local = {(r.start, r.head, r.hops) for r in local.collect()}
        got_loop = {(r.start, r.head, r.hops) for r in loop.collect()}
        assert got_local == got_loop
        assert got_local  # non-degenerate fixture


def test_bfs_depths(spark, sf_dir):
    edges = edges_view(spark, sf_dir)
    mem = memories_view(spark, sf_dir)
    got = related_memories_bfs([0, 5, 10], edges, mem, max_depth=3)
    rows = got.collect()
    assert rows and all(1 <= r.depth <= 3 for r in rows)
    ids = {r.id for r in rows}
    assert 1 in ids  # 0 -RELATES_TO-> 1 at depth 1
    assert not {0, 5, 10} & ids


def test_connected_components_vs_bruteforce(spark, sf_dir):
    emb = load_table(spark, sf_dir, "embeddings").filter(F.col("vec_id") < 100)
    pairs = cosine_threshold_self_join(emb, 0.25, item_id="vec_id")
    labels = connected_components(pairs, emb.select(F.col("vec_id").alias("id")))
    got = {r.id: r.component for r in labels.collect()}
    # brute-force union-find on the driver
    parent = {i: i for i in got}
    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x
    for r in pairs.collect():
        a, b = find(r.src), find(r.dst)
        if a != b:
            parent[max(a, b)] = min(a, b)
    expected = {i: find(i) for i in got}
    assert got == expected


def test_connected_components_paths_identical(spark, sf_dir):
    """The r13 dispatch (single-task union-find below CC_LOCAL_MAX_EDGES,
    distributed pointer-jumping loop above) must be output-identical —
    force each side of the gate over the same graph and compare exactly.
    Includes singletons: vec_id < 150 leaves nodes with no pair above the
    cosine threshold, exercising the broadcast fill-in join on the local
    path and the density-gated singleton split on the loop path."""
    emb = load_table(spark, sf_dir, "embeddings").filter(F.col("vec_id") < 150)
    pairs = cosine_threshold_self_join(emb, 0.25, item_id="vec_id")
    nodes = emb.select(F.col("vec_id").alias("id"))
    local = connected_components(pairs, nodes, local_max_edges=10**9)
    loop = connected_components(pairs, nodes, local_max_edges=0)
    got_local = {(r.id, r.component) for r in local.collect()}
    got_loop = {(r.id, r.component) for r in loop.collect()}
    assert got_local == got_loop
    assert len(got_local) == 150


def test_stats_drift_preferences(spark, sf_dir):
    edges = edges_view(spark, sf_dir)
    mem = memories_view(spark, sf_dir)
    stats = {r.rel_type: r.n for r in graph_stats(edges).collect()}
    assert "EXPLAINS" not in stats and stats.get("DISCOVERED", 0) > 0
    prefs = preference_ranking(edges).collect()
    assert len(prefs) == 10
    assert [r.strength for r in prefs] == sorted((r.strength for r in prefs), reverse=True)
    drift = sync_drift(edges, mem)
    # every drifting edge targets an archived memory (dst % 37 == 0)
    assert all(r.dst % 37 == 0 for r in drift.collect())


def test_expand_relations_caps(spark, sf_dir):
    edges = edges_view(spark, sf_dir)
    mem = memories_view(spark, sf_dir)
    seeds = (
        mem.filter(~F.col("archived") & (F.col("type") != "MetaPattern"))
        .orderBy(F.desc("importance"), F.asc("id"))
        .limit(10)
        .select("id", F.col("importance").alias("final_score"))
    )
    got = expand_relations(seeds, edges, mem)
    rows = got.collect()
    assert len(rows) <= 25
    per_seed = got.groupBy("seed_id").count().agg(F.max("count")).collect()
    if per_seed and per_seed[0][0] is not None:
        assert per_seed[0][0] <= 5


def test_graph_snapshot_induced_subgraph(spark, sf_dir):
    """S9: every returned edge has both endpoints in the selected node set;
    node selection respects filters and limit."""
    from pyspark.sql import functions as F

    from automem_spark.operators.graph import graph_snapshot
    from automem_spark.sources.graph_fixture import edges_view
    from automem_spark.sources.tables import memories_view

    mem = memories_view(spark, sf_dir)
    edges = edges_view(spark, sf_dir)
    nodes, sedges = graph_snapshot(
        mem, edges, limit=50, min_importance=0.3, types=("Decision", "Pattern")
    )
    nrows = nodes.collect()
    assert len(nrows) <= 50
    assert all(r["importance"] >= 0.3 and r["type"] in ("Decision", "Pattern") for r in nrows)
    ids = {r["id"] for r in nrows}
    for e in sedges.collect():
        assert e["source"] in ids and e["target"] in ids
        assert e["strength"] is not None  # missing strength -> 0.5 default
    # visual property formulas
    r0 = nrows[0]
    assert abs(r0["radius"] - (0.5 + r0["importance"] * 1.5)) < 1e-12
    assert abs(r0["opacity"] - (0.4 + r0["confidence"] * 0.6)) < 1e-12


def test_graph_neighbors_dedup_and_sentinels(spark, sf_dir):
    """J7: semantic rows never repeat graph-seen ids or the center; each
    channel uses its sentinel for the other channel's column."""
    from automem_spark.operators.graph import graph_neighbors
    from automem_spark.sources.graph_fixture import edges_view
    from automem_spark.sources.tables import load_table, memories_view

    mem = memories_view(spark, sf_dir)
    edges = edges_view(spark, sf_dir)
    emb = load_table(spark, sf_dir, "embeddings")
    rows = graph_neighbors(5, edges, mem, emb, depth=2, semantic_limit=5).collect()
    graph_ids = {r["id"] for r in rows if r["source"] == "graph"}
    sem_ids = {r["id"] for r in rows if r["source"] == "semantic"}
    assert 5 not in graph_ids and 5 not in sem_ids
    assert not (graph_ids & sem_ids)
    assert graph_ids, "hub node must have graph neighbors"
    for r in rows:
        if r["source"] == "graph":
            assert r["depth"] in (1, 2) and r["sim"] == -1.0
        else:
            assert r["depth"] == -1 and -1.0 <= r["sim"] <= 1.0


def test_supersession_advance_sql_matches_columns(spark):
    # the SQL-text hop (r12 build-tax fix) must be row-identical to the
    # Column twin on every advance shape: step, cycle-hit, dead-end,
    # NULL-nxt, and an id whose string form could collide without the
    # |-delimiters (1 vs 11)
    from automem_spark.operators.graph import (
        SUPERSESSION_ADVANCE_SQL,
        supersession_advance_columns,
    )

    rows = [
        (1, 2, 1, "|1|2|", 3),        # plain step
        (4, 5, 1, "|4|5|", 4),        # cycle back to start
        (6, 7, 1, "|6|7|", None),     # dead end
        (8, 8, 0, "|8|", 8),          # self-loop on first hop
        (11, 1, 1, "|11|1|", 11),     # substring-collision guard: '|11|'
    ]
    stepped = spark.createDataFrame(
        rows, "start bigint, head bigint, hops int, path string, nxt bigint"
    )
    a = sorted(map(tuple, stepped.selectExpr(*SUPERSESSION_ADVANCE_SQL).collect()))
    b = sorted(map(tuple, supersession_advance_columns(stepped).collect()))
    assert a == b
    # and the hop semantics themselves: 11 must advance (|11| does not
    # contain the |11|-delimited... it does! nxt=11 IS on the path) — the
    # cycle guard must stop it
    byid = {r[0]: r for r in a}
    assert byid[1][4] is False and byid[1][1] == 3      # stepped to 3
    assert byid[4][4] is True                            # cycle detected
    assert byid[6][4] is True                            # dead end
    assert byid[11][4] is True                           # |11| already visited


def test_bfs_early_exit_output_identical(spark, monkeypatch):
    # a graph exhausted at depth 1: the observe-exit (r12) must stop the
    # loop after the first empty frontier and return exactly what the
    # fixed-round loop returns
    import os

    edges = spark.createDataFrame(
        [(1, 2, "RELATES_TO"), (2, 3, "RELATES_TO")],
        "src bigint, dst bigint, rel_type string",
    )
    mem = spark.createDataFrame(
        [(i, 0.5, "2026-01-01 00:00:00") for i in (1, 2, 3)],
        "id bigint, importance double, timestamp string",
    ).withColumn("timestamp", F.col("timestamp").cast("timestamp"))
    fast = related_memories_bfs([1], edges, mem, max_depth=5).collect()
    monkeypatch.setenv("AUTOMEM_SPARK_DISABLE_CHECKPOINT", "1")
    slow = related_memories_bfs([1], edges, mem, max_depth=5).collect()
    assert sorted(map(tuple, fast)) == sorted(map(tuple, slow))
    assert {(r.id, r.depth) for r in fast} == {(2, 1), (3, 2)}
