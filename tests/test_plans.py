"""Physical-plan audits: the properties that make these queries hold at
100x data are asserted, not assumed — filter pushdown into the parquet
scan, column pruning (never read what you don't project), broadcast of
dimension/config sides, and shuffle-free map-side enforcement. A
regression here (e.g. a refactor that blocks pushdown behind a UDF)
passes value checks but changes the plan class; this file catches it."""

import pytest
from pyspark.sql import functions as F

from weaver_spark.queries import REGISTRY

SF = "/root/testdata/sf0.001"


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def _filescan_lines(plan: str) -> list[str]:
    return [ln for ln in plan.splitlines() if "FileScan parquet" in ln]


def test_q3_pushdown_pruning_broadcast(spark):
    fn, _ = REGISTRY["q3_shipping_priority"]
    plan = _plan(fn(spark, SF))
    scans = _filescan_lines(plan)
    cust = next(s for s in scans if "c_custkey" in s)
    # the segment predicate reached the customer scan, not a Filter above
    assert "BUILDING" in cust
    li = next(s for s in scans if "l_orderkey" in s)
    # lineitem has 16 columns; the scan must read only the 3 projected
    assert "l_extendedprice" in li and "l_discount" in li
    assert "l_shipmode" not in li and "l_comment" not in li
    # both joins broadcast (orders/customer dims), no sort-merge fallback
    assert plan.count("BroadcastHashJoin") >= 2


def test_token_count_column_pruning(spark):
    fn, _ = REGISTRY["token_count"]
    plan = _plan(fn(spark, SF))
    (scan,) = _filescan_lines(plan)
    assert "text" in scan
    # untouched wide columns never leave the reader
    assert "url" not in scan and "lang" not in scan


def test_point_lookup_broadcasts_probe_sides(spark):
    fn, _ = REGISTRY["frontier_point_lookup"]
    plan = _plan(fn(spark, SF))
    # keyed lookup: semi join with the probe keys and anti join with the
    # tombstones, both broadcast — the big table never shuffles
    assert "LeftSemi" in plan and "LeftAnti" in plan
    assert plan.count("BroadcastExchange") >= 2
    assert "hashpartitioning" not in plan  # zero shuffles end to end


def test_robots_enforcement_is_map_side(spark):
    """apply_robots must filter the pending set with a broadcast join —
    any Exchange on the frontier side becomes an O(frontier) shuffle
    per round at 10^10 rows."""
    from weaver_spark.operators.robots import apply_robots
    from weaver_spark.schemas import ROBOTS_SCHEMA

    pending = spark.range(0, 1000).select(
        F.format_string("http://h%d.test/item/%d", F.col("id") % 4, F.col("id")).alias(
            "url"
        ),
        F.format_string("h%d.test", F.col("id") % 4).alias("host"),
    )
    robots = spark.createDataFrame(
        [("h1.test", ["/item/"], 0, None, None), ("h0.test", [], 2000, None, None)],
        ROBOTS_SCHEMA,
    )
    allowed, blocked = apply_robots(pending, robots)
    for df in (allowed, blocked):
        plan = _plan(df)
        assert "BroadcastHashJoin" in plan
        assert "hashpartitioning" not in plan  # frontier never shuffles


@pytest.mark.parametrize("name", ["gather_merge", "dedup_exact"])
def test_documents_images_scans_never_read_payload_bytes(spark, name):
    """Aggregation queries over payload tables must prune the binary
    column — reading bytes for a count/group-by is the single easiest
    way to turn a metadata query into a 100 TB scan."""
    fn, _ = REGISTRY[name]
    plan = _plan(fn(spark, SF))
    for scan in _filescan_lines(plan):
        assert "bytes#" not in scan and ",bytes" not in scan
