"""Bucketed base compaction (catalog.compact(buckets=B) — the Iceberg
bucket(B, key) layout analogue): state equality with the plain rewrite,
tombstone folding, and the scale property that a RE-compaction rewrites
ONLY delta-touched buckets — untouched bucket dirs are re-referenced
verbatim (path identity is the witness that cost scales with the write
set, not table size)."""

import os

from pyspark.sql import functions as F

from weaver_spark.catalog import Catalog
from weaver_spark.engine import CrawlEngine
from weaver_spark.sim import simulate_crawl
from weaver_spark.webgen import make_web

SCHEMA = "k string, v long, update_seq long"


def _table(spark, tmp_path, name):
    from pyspark.sql.types import (
        LongType,
        StringType,
        StructField,
        StructType,
    )

    schema = StructType(
        [
            StructField("k", StringType(), False),
            StructField("v", LongType(), False),
            StructField("update_seq", LongType(), False),
        ]
    )
    return Catalog(str(tmp_path / name)).table("t", schema, key="k")


def _state(t, spark):
    return sorted((r["k"], r["v"]) for r in t.latest_state(spark).collect())


def test_bucketed_compaction_preserves_state(spark, tmp_path):
    t = _table(spark, tmp_path, "wh")
    t.append(spark.createDataFrame([(f"k{i}", i, 1) for i in range(200)], SCHEMA))
    t.append(spark.createDataFrame([(f"k{i}", i + 1000, 2) for i in range(0, 200, 7)], SCHEMA))
    t.delete_keys(spark.createDataFrame([(f"k{i}", 0, 0) for i in range(0, 200, 50)], SCHEMA))
    expect = _state(t, spark)
    cid = t.compact(spark, buckets=8)
    assert t.commits() == [cid]
    assert _state(t, spark) == expect
    # read() over the bucketed layout is the same row set
    assert t.read(spark).count() == len(expect)
    meta = t._read_manifest(cid)["meta"]
    assert meta["buckets"] == 8 and meta["bucket_dirs"]


def test_recompaction_rewrites_only_touched_buckets(spark, tmp_path):
    t = _table(spark, tmp_path, "wh")
    t.append(spark.createDataFrame([(f"k{i}", i, 1) for i in range(400)], SCHEMA))
    c1 = t.compact(spark, buckets=16)
    dirs1 = dict(t._read_manifest(c1)["meta"]["bucket_dirs"])
    assert len(dirs1) > 8  # enough keys to populate most buckets

    # a small write set: update 3 keys, delete 1
    t.append(spark.createDataFrame([(f"k{i}", i + 9000, 2) for i in (5, 6, 7)], SCHEMA))
    t.delete_keys(spark.createDataFrame([("k9", 0, 0)], SCHEMA))
    expect = _state(t, spark)

    c2 = t.compact(spark, buckets=16)
    dirs2 = dict(t._read_manifest(c2)["meta"]["bucket_dirs"])
    touched = {
        r["b"]
        for r in spark.createDataFrame([("k5",), ("k6",), ("k7",), ("k9",)], "k string")
        .select(F.pmod(F.xxhash64("k"), F.lit(16)).alias("b"))
        .collect()
    }
    for b, d in dirs1.items():
        if int(b) in touched:
            assert dirs2.get(b) != d, f"touched bucket {b} not rewritten"
        else:
            assert dirs2[b] == d, f"untouched bucket {b} was rewritten"
    # untouched dirs survive vacuum; state is exact
    for b, d in dirs2.items():
        assert os.path.isdir(d)
    assert _state(t, spark) == expect
    # idempotent: compacting with no new deltas is a true no-op — no new
    # commit, no bucket rewritten (an O(table) rewrite here would be the
    # exact maintenance job the bucketed layout exists to avoid)
    c3 = t.compact(spark, buckets=16)
    assert c3 == c2
    assert dict(t._read_manifest(c3)["meta"]["bucket_dirs"]) == dirs2
    assert _state(t, spark) == expect


def test_engine_crawl_with_bucketed_compaction(spark, tmp_path):
    """Engine integration: periodic bucketed compaction mid-crawl keeps
    crawl-order parity with the simulator and the carry rebind."""
    web = make_web(seed=9, n_hosts=4, n_seed_roots=2, depth=2)
    eng = CrawlEngine(
        spark,
        str(tmp_path / "wh"),
        mode="reproduction",
        compact_every=2,
        compact_buckets=8,
    )
    eng.set_web(web)
    eng.seed_urls(web.seeds)
    eng.run(max_rounds=20)
    sim = simulate_crawl(web)
    got = [r["url"] for r in eng.crawl_order().collect()]
    assert got == sim.crawl_order
    seen = {r["image_id"] for r in eng.gather().select("image_id").collect()}
    assert seen == sim.seen_set


def test_recompaction_vacuum_prunes_dead_marker_files(spark, tmp_path):
    """A bucketed base dir written via partitionBy carries plain files
    (_SUCCESS) alongside its bucket= subdirs. After a re-compaction the
    old base dir is only PARTIALLY live (untouched buckets re-referenced
    in place), so vacuum's pruning loop walks its children — and must
    os.remove the dead plain files, not shutil.rmtree them (rmtree on a
    file fails and ignore_errors used to swallow it, accumulating dead
    markers in every reused base dir)."""
    t = _table(spark, tmp_path, "wh")
    t.append(spark.createDataFrame([(f"k{i}", i, 1) for i in range(400)], SCHEMA))
    c1 = t.compact(spark, buckets=16)
    base_dir = os.path.dirname(next(iter(
        t._read_manifest(c1)["meta"]["bucket_dirs"].values()
    )))
    # compact()'s own vacuum already prunes the marker (the base dir is
    # partially-live from birth: only bucket= subdirs are referenced)
    assert not os.path.exists(os.path.join(base_dir, "_SUCCESS"))
    # plant a dead plain file to pin the re-compaction prune walk too
    with open(os.path.join(base_dir, "_SUCCESS"), "w"):
        pass

    t.append(spark.createDataFrame([("k5", 9005, 2)], SCHEMA))
    expect = _state(t, spark)
    t.compact(spark, buckets=16)  # partially-live old base -> prune walk

    leftovers = [
        f for f in os.listdir(base_dir) if not f.startswith("bucket=")
    ]
    assert leftovers == [], f"dead marker files survived vacuum: {leftovers}"
    assert _state(t, spark) == expect
