"""Keyed DELETE (S10) + base/delta incremental state resolution: the
scale-safe latest_state contract (base never windowed, tombstones honored
through compaction, rollback restores)."""

import pytest
from pyspark.sql import functions as F
from pyspark.sql.types import LongType, StringType, StructField, StructType

from weaver_spark.catalog import DeltaTable

SCHEMA = StructType(
    [
        StructField("k", LongType(), False),
        StructField("v", StringType(), False),
        StructField("update_seq", LongType(), False),
    ]
)


@pytest.fixture()
def table(tmp_path):
    return DeltaTable(str(tmp_path / "t"), SCHEMA, key="k")


def _rows(spark, pairs, ucid):
    return spark.createDataFrame(
        [(k, v, ucid) for k, v in pairs], SCHEMA
    )


def _state(table, spark):
    return {
        (r["k"], r["v"]) for r in table.latest_state(spark).collect()
    }


def test_delete_key_lifecycle(spark, table):
    table.append(_rows(spark, [(1, "a"), (2, "b"), (3, "c")], 1))
    pre_delete = table.last_commit()
    table.delete_keys(spark.createDataFrame([(2,)], "k long"))
    assert _state(table, spark) == {(1, "a"), (3, "c")}
    # the append-only log view still shows full history
    assert table.read(spark).count() == 3

    # deletion survives compaction
    table.compact(spark)
    assert _state(table, spark) == {(1, "a"), (3, "c")}

    # re-insert after delete wins (newer update_seq)
    table.append(_rows(spark, [(2, "b2")], table.last_commit() + 1))
    assert _state(table, spark) == {(1, "a"), (3, "c"), (2, "b2")}
    _ = pre_delete


def test_rollback_restores_deleted_key(spark, table):
    table.append(_rows(spark, [(1, "a"), (2, "b")], 1))
    pre = table.last_commit()
    table.delete_keys(spark.createDataFrame([(1,)], "k long"))
    assert _state(table, spark) == {(2, "b")}
    table.rollback(pre)
    assert _state(table, spark) == {(1, "a"), (2, "b")}


def test_base_delta_equals_full_window(spark, table):
    """Incremental base/delta resolution must equal the naive full-log
    window: interleave appends, updates, deletes around a compaction."""
    table.append(_rows(spark, [(i, f"v{i}") for i in range(100)], 1))
    table.append(_rows(spark, [(i, f"u{i}") for i in range(0, 100, 3)], 2))
    table.delete_keys(spark.createDataFrame([(i,) for i in range(0, 100, 10)], "k long"))
    expected = _state(table, spark)
    table.compact(spark)  # base boundary
    assert _state(table, spark) == expected
    # post-compaction deltas: update some, delete some, insert new
    c = table.last_commit()
    table.append(_rows(spark, [(i, f"w{i}") for i in range(50, 60)], c + 1))
    table.delete_keys(spark.createDataFrame([(1,), (2,)], "k long"))
    table.append(_rows(spark, [(1000, "new")], table.last_commit() + 1))
    got = _state(table, spark)
    # naive recompute from the log (read() + per-key max update_seq,
    # minus keys whose newest record is a tombstone)
    naive = {}
    for r in table.read(spark).collect():
        if naive.get(r["k"], (None, -1))[1] < r["update_seq"]:
            naive[r["k"]] = (r["v"], r["update_seq"])
    # apply tombstones from the second delete (keys 1, 2)
    for k in (1, 2):
        naive.pop(k, None)
    assert got == {(k, v) for k, (v, _) in naive.items()}


def test_engine_compact_every_same_crawl(spark, tmp_path_factory):
    """Per-round frontier compaction (the scale path) must not change
    crawl semantics: identical order + stored set vs the simulator."""
    from weaver_spark.engine import CrawlEngine
    from weaver_spark.sim import simulate_crawl
    from weaver_spark.webgen import make_web

    web = make_web(seed=42, n_hosts=4, n_seed_roots=2, depth=1)
    wh = str(tmp_path_factory.mktemp("wh_compact"))
    eng = CrawlEngine(spark, wh, mode="reproduction", compact_every=1)
    eng.set_web(web)
    eng.seed_urls(web.seeds)
    eng.run(max_rounds=10)
    sim = simulate_crawl(web)
    assert [r["url"] for r in eng.crawl_order().collect()] == sim.crawl_order
    got = {r["image_id"] for r in eng.gather().select("image_id").collect()}
    assert got == sim.seen_set
    # the frontier log really was folded: one compaction base + few deltas
    metas = [
        eng.frontier._read_manifest(c).get("meta", {})
        for c in eng.frontier.commits()
    ]
    assert any(m.get("compaction") for m in metas)


def test_base_never_shuffles(spark, table):
    """After compaction, the base side of latest_state resolves via a
    broadcast anti-join: no Exchange (shuffle) ever touches base rows —
    the O(frontier)-window scale bug fixed this round."""
    table.append(_rows(spark, [(i, f"v{i}") for i in range(5000)], 1))
    table.compact(spark)
    table.append(_rows(spark, [(i, f"u{i}") for i in range(10)], table.last_commit() + 1))
    df = table.latest_state(spark)
    df.collect()
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan and "LeftAnti" in plan, plan


def test_delta_table_satisfies_backend_protocol(tmp_path):
    """The backend seam (catalog.TableBackend): DeltaTable must expose
    every method the engine programs against, so the Iceberg swap on a
    real cluster is one new class behind Catalog.table — engine code
    never touches a backend-private API (enforced here by source grep)."""
    from pyspark.sql.types import LongType, StructField, StructType

    from weaver_spark.catalog import DeltaTable, TableBackend

    t = DeltaTable(
        str(tmp_path / "t"),
        StructType([StructField("k", LongType(), False)]),
        key="k",
    )
    assert isinstance(t, TableBackend)

    import inspect

    import weaver_spark.engine as engine_mod

    src = inspect.getsource(engine_mod)
    import re

    privates = set(
        re.findall(r"self\.(?:frontier|images|metrics|lineage|robots_table|purges)\.(_\w+)", src)
    )
    assert not privates, f"engine uses backend-private APIs: {privates}"
