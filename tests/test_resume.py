"""Checkpoint/resume invariants (SURVEY.md §5 invariant d; north rule):
rollback to a committed round + re-run reproduces byte-identical state;
lease reclaim restores expired leases; compaction preserves state."""

from pyspark.sql import functions as F

from weaver_spark.catalog import Catalog
from weaver_spark.engine import CrawlEngine
from weaver_spark.schemas import FRONTIER_SCHEMA
from weaver_spark.webgen import make_web


def _snapshot(eng):
    frontier = sorted(
        (r["enqueue_seq"], r["url"], r["status"], r["round"])
        for r in eng.frontier.latest_state(eng.spark).collect()
    )
    images = sorted(
        (r["image_id"], r["phash"], r["caption"], bytes(r["bytes"]))
        for r in eng.images.read(eng.spark).collect()
    )
    return frontier, images


def test_rollback_and_rerun_identical(spark, tmp_path_factory):
    web = make_web(seed=42, n_hosts=4, n_seed_roots=2, depth=2)
    wh = str(tmp_path_factory.mktemp("wh_resume"))
    eng = CrawlEngine(spark, wh, mode="reproduction")
    eng.set_web(web)
    eng.seed_urls(web.seeds)
    stats = eng.run(max_rounds=20)
    assert len(stats) >= 3
    final = _snapshot(eng)

    # crash after round 0: roll every table back to its end-of-round-0
    # commit, then re-run to exhaustion
    eng.rollback_to_round(0)
    mid = eng.frontier.latest_state(spark)
    assert mid.where(F.col("status") == "pending").count() > 0
    eng.run(max_rounds=20)
    assert _snapshot(eng) == final


def test_compaction_preserves_state(spark, tmp_path_factory):
    web = make_web(seed=7, n_hosts=3, n_seed_roots=2, depth=1)
    wh = str(tmp_path_factory.mktemp("wh_compact"))
    eng = CrawlEngine(spark, wh, mode="reproduction")
    eng.set_web(web)
    eng.seed_urls(web.seeds)
    eng.run(max_rounds=10)
    before = _snapshot(eng)
    n_commits = len(eng.frontier.commits())
    assert n_commits > 1
    eng.frontier.compact(spark)
    assert len(eng.frontier.commits()) == 1
    assert _snapshot(eng) == before


def test_lease_reclaim(spark, tmp_path_factory):
    """T1 lease machinery (reference src/queue/main.go:47-87): a leased
    row older than the timeout is reclaimed to pending."""
    wh = str(tmp_path_factory.mktemp("wh_lease"))
    cat = Catalog(wh)
    t = cat.table("frontier", FRONTIER_SCHEMA, key="enqueue_seq")
    rows = [
        ("http://h0.test/a", 1, "h0.test", "leaf", 0, 0, "leased", 0, None, 0, 0, 1),
        ("http://h0.test/b", 2, "h0.test", "leaf", 0, 0, "pending", 1, None, 0, 0, 1),
    ]
    df = spark.createDataFrame(rows, FRONTIER_SCHEMA).withColumn(
        "lease_ts",
        F.when(
            F.col("status") == "leased",
            F.current_timestamp() - F.expr("INTERVAL 120 SECONDS"),
        ),
    )
    t.append(df)
    eng = CrawlEngine(spark, wh, mode="reproduction", lease_timeout_s=30)
    n = eng.reclaim_expired_leases()
    assert n == 1
    state = t.latest_state(spark)
    assert state.where(F.col("status") == "pending").count() == 2
    assert state.where(F.col("status") == "leased").count() == 0
    # fresh leases are NOT reclaimed
    assert eng.reclaim_expired_leases() == 0


def test_time_travel_read(spark, tmp_path_factory):
    from pyspark.sql.types import LongType, StructField, StructType

    wh = str(tmp_path_factory.mktemp("wh_tt"))
    schema = StructType([StructField("x", LongType(), False)])
    t = Catalog(wh).table("m", schema)
    c1 = t.append(spark.createDataFrame([(1,), (2,)], schema))
    c2 = t.append(spark.createDataFrame([(3,)], schema))
    assert t.read(spark).count() == 3
    assert t.read(spark, as_of=c1).count() == 2
    t.rollback(c1)
    assert t.read(spark).count() == 2
    assert t.last_commit() == c1
    # append after rollback gets a fresh commit id past the rolled-back one
    c3 = t.append(spark.createDataFrame([(9,)], schema))
    assert c3 == c2  # id reuse is fine: the old manifest is gone
    assert sorted(r["x"] for r in t.read(spark).collect()) == [1, 2, 9]
    t.vacuum()
    assert sorted(r["x"] for r in t.read(spark).collect()) == [1, 2, 9]
