"""Depth-decay priority source (priority_mode="depth"): >= 3 live
priority levels flow through the (priority DESC, enqueue_seq) budget
window, the Spark engine stays in lockstep with the simulator under the
same rule, and the ordering genuinely differs from the binary root/leaf
source — i.e. the scheduler actually exercises the richer signal."""

from weaver_spark.engine import CrawlEngine
from weaver_spark.sim import simulate_crawl
from weaver_spark.webgen import make_web


def test_depth_priority_parity_and_reordering(spark, tmp_path):
    web = make_web(seed=13, n_hosts=3, n_seed_roots=2, depth=3)
    eng = CrawlEngine(
        spark,
        str(tmp_path / "wh"),
        mode="scale",
        host_budget=2,
        priority_mode="depth",
    )
    eng.set_web(web)
    eng.seed_urls(web.seeds)
    eng.run(max_rounds=120)
    got = [r["url"] for r in eng.crawl_order().collect()]

    sim = simulate_crawl(web, host_budget=2, priority_mode="depth")
    assert got == sim.crawl_order  # one rule, two engines

    # the depth column is real and the decay yields >= 3 live levels
    state = eng.frontier.latest_state(spark)
    prios = sorted(r["priority"] for r in state.select("priority").distinct().collect())
    assert len(prios) >= 3
    depths = sorted(r["depth"] for r in state.select("depth").distinct().collect())
    assert depths[0] == 0 and depths[-1] >= 2

    # same fetched multiset as the binary-priority schedule, different
    # order: the richer signal changes scheduling, not coverage
    kind = simulate_crawl(web, host_budget=2, priority_mode="kind")
    assert sorted(got) == sorted(kind.crawl_order)
    assert got != kind.crawl_order


def test_legacy_warehouse_without_depth_column(spark, tmp_path):
    """Migration shim: a frontier written BEFORE the depth column existed
    reads depth as null — the engine must backfill 0 instead of poisoning
    depth arithmetic / depth-mode priority / the non-null schema."""
    from pyspark.sql.types import StructType

    from weaver_spark.catalog import Catalog
    from weaver_spark.schemas import FRONTIER_SCHEMA

    # a legacy warehouse predates BOTH migration-shimmed columns
    legacy = StructType(
        [f for f in FRONTIER_SCHEMA.fields if f.name not in ("depth", "attempt")]
    )
    wh = str(tmp_path / "wh")
    t = Catalog(wh).table("frontier", legacy, key="enqueue_seq")
    rows = [
        ("http://h0.test/a", 11, "h0.test", "leaf", 0, "pending", 0, None, 0, 1),
        ("http://h0.test/b", 12, "h0.test", "leaf", 0, "pending", 1, None, 0, 1),
    ]
    t.append(spark.createDataFrame(rows, legacy))

    web = make_web(seed=3, n_hosts=2, n_seed_roots=1, depth=1)
    eng = CrawlEngine(spark, wh, mode="scale", priority_mode="depth", host_budget=4)
    eng.set_web(web)
    eng.run(max_rounds=5)  # resumes the legacy frontier without crashing
    state = {r["url"]: r for r in eng.frontier.latest_state(spark).collect()}
    for u in ("http://h0.test/a", "http://h0.test/b"):
        assert state[u]["status"] in ("done", "failed")
        assert state[u]["depth"] == 0  # backfilled, not null


def test_depth_tracks_link_distance(spark, tmp_path):
    web = make_web(seed=3, n_hosts=2, n_seed_roots=1, depth=2)
    eng = CrawlEngine(spark, str(tmp_path / "wh"), mode="reproduction")
    eng.set_web(web)
    eng.seed_urls(web.seeds)
    eng.run(max_rounds=20)
    rows = eng.frontier.latest_state(spark).collect()
    by_url = {}
    for r in rows:  # a URL enqueued twice keeps per-event depth; min = BFS dist
        by_url.setdefault(r["url"], []).append(r["depth"])
    for s in web.seeds:
        assert min(by_url[s]) == 0
    assert max(d for ds in by_url.values() for d in ds) >= 2
