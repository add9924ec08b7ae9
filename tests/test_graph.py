"""connected_components + near_duplicate_clusters.

Expected components come from a 20-line Python union-find — an independent
oracle, not a re-run of the Spark algorithm.
"""

import random

from pyspark.sql import functions as F

from spark_validate.functions.graph import connected_components
from spark_validate.text import near_duplicate_clusters


def _union_find(edges):
    parent = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    # fully resolve: component = min id (union-by-min keeps roots minimal)
    return {x: find(x) for x in parent}


def _cc(spark, edges, **kw):
    df = spark.createDataFrame(edges, "id_a long, id_b long")
    stats = {}
    got = {
        (r["id"], r["comp"])
        for r in connected_components(df, stats=stats, **kw).collect()
    }
    return got, stats


def test_two_triangles_and_bridge(spark):
    edges = [(1, 2), (2, 3), (3, 1), (10, 11), (11, 12), (12, 10), (3, 10)]
    got, _ = _cc(spark, edges)
    assert got == {(n, 1) for n in [1, 2, 3, 10, 11, 12]}


def test_path_graph_converges_logarithmically(spark):
    # Worst case for plain label propagation: a 64-node chain needs 63
    # neighbour-propagation rounds; pointer jumping must cut that to O(log n).
    n = 64
    edges = [(i, i + 1) for i in range(n - 1)]
    got, stats = _cc(spark, edges, small_graph_edges=0)  # force distributed
    assert got == {(i, 0) for i in range(n)}
    assert stats["mode"] == "distributed"
    assert stats["rounds"] <= 10, f"path-64 took {stats['rounds']} rounds (expected O(log n))"
    # the driver union-find path must agree exactly
    got2, stats2 = _cc(spark, edges)
    assert stats2["mode"] == "driver" and got2 == got


def test_random_graph_matches_union_find(spark):
    rng = random.Random(7)
    nodes = list(range(200))
    edges = [(rng.choice(nodes), rng.choice(nodes)) for _ in range(150)]
    edges = [(a, b) for a, b in edges if a != b]
    expect = _union_find(edges)
    got, _ = _cc(spark, edges)  # driver path (small graph)
    assert got == set(expect.items())
    got_dist, _ = _cc(spark, edges, small_graph_edges=0)  # distributed path
    assert got_dist == set(expect.items())


def test_duplicate_and_reversed_edges_tolerated(spark):
    edges = [(5, 4), (4, 5), (5, 4), (8, 9)]
    got, _ = _cc(spark, edges)
    assert got == {(4, 4), (5, 4), (8, 8), (9, 8)}


def test_string_ids(spark):
    df = spark.createDataFrame([("b", "a"), ("b", "c"), ("x", "y")], "id_a string, id_b string")
    got = {(r["id"], r["comp"]) for r in connected_components(df).collect()}
    assert got == {("a", "a"), ("b", "a"), ("c", "a"), ("x", "x"), ("y", "x")}


def test_near_duplicate_clusters_end_to_end(spark):
    # Three exact-ish families + unique docs. Family texts share >0.8
    # shingle Jaccard inside, ~0 across.
    base = [
        "the quick brown fox jumps over the lazy dog again and again every single day",
        "spark dataframes shuffle on wide dependencies unless the planner broadcasts one side",
        "completely unrelated third document about cooking pasta with garlic and olive oil",
    ]
    rows = []
    did = 0
    for fam, text in enumerate(base):
        for _ in range(3):  # 3 near-identical members per family
            rows.append((did, text + (" tail" if did % 2 else "")))
            did += 1
    for i in range(4):  # singletons
        rows.append((did, f"unique document number {i} with entirely distinct words token{i} alpha{i} beta{i} gamma{i} delta{i} epsilon{i} zeta{i}"))
        did += 1
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = near_duplicate_clusters(df, threshold=0.5).collect()
    by_id = {r["doc_id"]: r for r in out}
    assert len(by_id) == len(rows)
    # family members cluster to the family min id
    for fam in range(3):
        ids = [fam * 3, fam * 3 + 1, fam * 3 + 2]
        for i in ids:
            assert by_id[i]["cluster_id"] == ids[0]
            assert by_id[i]["cluster_size"] == 3
            assert by_id[i]["keep"] == (i == ids[0])
    # singletons keep themselves
    for i in range(9, 13):
        assert by_id[i]["cluster_id"] == i and by_id[i]["cluster_size"] == 1 and by_id[i]["keep"]


def test_clusters_plan_has_no_python_or_cartesian(spark, documents):
    plan = near_duplicate_clusters(documents.limit(50))._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BatchEvalPython" not in plan


def test_phash_clusters_planted_twins(spark):
    from spark_validate.image.phash import phash_clusters

    rows = [(i, (i * 0x9E3779B97F4A7C15) & ((1 << 60) - 1)) for i in range(40)]
    rows += [(100 + i, rows[i][1] ^ 0b111) for i in range(5)]  # 3-bit twins of 0..4
    df = spark.createDataFrame(rows, "image_id long, phash long")
    out = {r["image_id"]: r for r in phash_clusters(df, max_hamming=4, bits=60).collect()}
    assert len(out) == 45
    for i in range(5):
        assert out[i]["cluster_id"] == i and out[i]["keep"]
        assert out[100 + i]["cluster_id"] == i and not out[100 + i]["keep"]
        assert out[i]["cluster_size"] == 2 == out[100 + i]["cluster_size"]
    for i in range(5, 40):
        assert out[i]["cluster_size"] == 1 and out[i]["keep"]


def test_empty_pair_graph(spark):
    empty = spark.createDataFrame([], "id_a long, id_b long")
    assert connected_components(empty).count() == 0
    # clusters over a corpus with no near-dups: all singletons, all kept
    docs = spark.createDataFrame(
        [(i, f"unique{i} alpha{i} beta{i} gamma{i} delta{i} eps{i} zeta{i}") for i in range(6)],
        "doc_id long, text string",
    )
    out = near_duplicate_clusters(docs).collect()
    assert all(r["cluster_size"] == 1 and r["keep"] for r in out)


def test_star_hub_graph(spark):
    # 20k-spoke hub: the skew shape a boilerplate doc produces. Messages are
    # rows, not one aggregation buffer; must converge in O(1) rounds.
    hub_edges = [(0, i) for i in range(1, 20_001)]
    df = spark.createDataFrame(hub_edges, "id_a long, id_b long")
    stats = {}
    out = connected_components(df, stats=stats, small_graph_edges=0)  # force distributed
    assert out.filter(F.col("comp") != 0).count() == 0
    assert out.count() == 20_001
    assert stats["mode"] == "distributed"
    assert stats["rounds"] <= 3


def test_exact_boilerplate_cluster_survives_bucket_cap(spark):
    # 300 identical copies > max_bucket=200: pre-collapse makes them ONE node,
    # so the cap cannot silently singleton them (the review-flagged hazard)
    rows = [(i, "the exact same boilerplate line of text repeated everywhere") for i in range(300)]
    rows += [(1000 + i, f"distinct{i} filler{i} words{i} here{i} now{i} ok{i} end{i}") for i in range(5)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r["doc_id"]: r for r in near_duplicate_clusters(df, max_bucket=200).collect()}
    for i in range(300):
        assert out[i]["cluster_id"] == 0 and out[i]["cluster_size"] == 300
        assert out[i]["keep"] == (i == 0)
    for i in range(1000, 1005):
        assert out[i]["cluster_size"] == 1 and out[i]["keep"]


def test_null_text_stays_singleton(spark):
    rows = [(0, "alpha beta gamma delta epsilon zeta eta"), (1, None), (2, None)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r["doc_id"]: r for r in near_duplicate_clusters(df).collect()}
    assert len(out) == 3
    for i in (1, 2):
        assert out[i]["cluster_id"] == i and out[i]["cluster_size"] == 1 and out[i]["keep"]
