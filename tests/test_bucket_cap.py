"""Bucket-size cap on every banded LSH self-join.

The 100 TB failure mode: a boilerplate-heavy corpus puts 1e5+ docs in
ONE (band, bkey) bucket and the candidate self-join emits
O(|bucket|^2) pairs — AQE can split the skewed input partition but not
shrink a quadratic output. These tests plant exactly that corpus (a
block of identical-signature docs far above the cap) and assert the
capped operators emit a BOUNDED pair set that still contains the
legitimate near-dup pairs from the rest of the corpus, that the drop
is observable via ``overcap_buckets``, and that ``dedup_exact``
(the documented pre-collapse companion) removes the planted mass
entirely.
"""

import pytest
from pyspark.sql import functions as F

from weaver_spark.operators.dedup import (
    dedup_exact,
    dedup_minhash_lsh,
    dedup_phash_hamming,
    dedup_simhash,
    overcap_buckets,
)

N_BOILER = 2000  # identical docs, one LSH bucket of this size
CAP = 50


@pytest.fixture(scope="module")
def boiler_docs(spark):
    """2000 byte-identical boilerplate docs + 2 legitimate near-dup
    docs + 2 unrelated docs. Uncapped, the boilerplate block alone
    emits ~2M minhash candidate pairs."""
    boiler = spark.range(N_BOILER).select(
        (F.col("id") + 10000).cast("int").alias("doc_id"),
        F.lit(
            "terms of service all rights reserved cookie policy contact us"
        ).alias("text"),
    )
    extra = spark.createDataFrame(
        [
            (1, "the quick brown fox jumps over the lazy dog near the river today"),
            (2, "the quick brown fox jumps over the lazy dog near the river tomorrow"),
            (3, "completely different text about spark shuffle partitions and joins"),
            (4, "another unrelated document discussing bloom filters and politeness"),
        ],
        "doc_id int, text string",
    )
    return boiler.unionByName(extra)


def test_minhash_cap_bounds_pairs(boiler_docs):
    pairs = dedup_minhash_lsh(
        boiler_docs, "doc_id", "text", num_hashes=16, bands=8, max_bucket=CAP
    )
    got = {(r["id_a"], r["id_b"]) for r in pairs.collect()}
    # the legitimate near-dup pair survives the cap
    assert (1, 2) in got
    # the planted 2000-doc bucket (would be ~2e6 pairs) is dropped whole
    assert len(got) < 100
    assert not any(a >= 10000 and b >= 10000 for a, b in got)


def test_minhash_uncapped_would_blow_up(boiler_docs):
    """Witness that the cap is doing real work: uncapped pair count on
    a 100-doc slice of the boilerplate block is already quadratic."""
    slice_ = boiler_docs.where(
        (F.col("doc_id") < 10100) | (F.col("doc_id") < 100)
    )
    n = dedup_minhash_lsh(
        slice_, "doc_id", "text", num_hashes=16, bands=8, max_bucket=None
    ).count()
    assert n >= 100 * 99 // 2  # the identical block alone is C(100,2)


def test_simhash_cap_bounds_pairs(boiler_docs):
    _, pairs = dedup_simhash(
        boiler_docs, "doc_id", "text", bits=32, max_hamming=3, max_bucket=CAP
    )
    got = {(r["id_a"], r["id_b"]) for r in pairs.collect()}
    assert len(got) < 100
    assert not any(a >= 10000 and b >= 10000 for a, b in got)


def test_phash_cap_bounds_pairs(spark):
    # 2000 images sharing ONE phash + 2 genuine near-dups 3 bits apart
    flat = spark.range(N_BOILER).select(
        (F.col("id") + 10000).cast("int").alias("doc_id"),
        F.lit(0x1234567890AB).cast("long").alias("phash"),
    )
    twins = spark.createDataFrame(
        [(1, 0x0F0F0F0F0F0F0F0F), (2, 0x0F0F0F0F0F0F0F0F ^ 0b1011)],
        "doc_id int, phash long",
    )
    allp = flat.unionByName(twins)
    got = {
        (r["id_a"], r["id_b"])
        for r in dedup_phash_hamming(
            allp, "doc_id", "phash", max_hamming=6, max_bucket=CAP
        ).collect()
    }
    assert got == {(1, 2)}


def test_overcap_buckets_reports_drop(boiler_docs):
    """The diagnostic surface bench logs: the planted block shows up as
    over-cap buckets with its true size."""
    from weaver_spark.functions.text import ngrams_col

    sh = boiler_docs.select(
        "doc_id", F.explode(ngrams_col(F.col("text"), 3)).alias("sh")
    ).distinct()
    aggs = [
        F.min(F.xxhash64(F.col("sh"), F.lit(1000003 * i))).alias(f"mh{i}")
        for i in range(16)
    ]
    sigs = sh.groupBy("doc_id").agg(*aggs)
    band_cols = [
        F.struct(
            F.lit(b).alias("band"),
            F.xxhash64(*[F.col(f"mh{b * 2 + r}") for r in range(2)]).alias("bkey"),
        )
        for b in range(8)
    ]
    buckets = sigs.select(
        "doc_id", F.explode(F.array(*band_cols)).alias("bb")
    ).select("doc_id", F.col("bb.band").alias("band"), F.col("bb.bkey").alias("bkey"))
    over = overcap_buckets(buckets, CAP).collect()
    assert len(over) == 8  # the identical block over-caps in every band
    assert all(r["bucket_size"] == N_BOILER for r in over)


def test_exact_precollapse_removes_boilerplate(boiler_docs):
    """The documented companion: dedup_exact first, so the boilerplate
    mass never reaches the LSH stage at all."""
    collapsed = dedup_exact(boiler_docs, "doc_id", "text")
    assert collapsed.count() == 5  # 2000 identical -> 1 survivor (+4)
    pairs = dedup_minhash_lsh(
        collapsed, "doc_id", "text", num_hashes=16, bands=8, max_bucket=CAP
    )
    got = {(r["id_a"], r["id_b"]) for r in pairs.collect()}
    assert (1, 2) in got
