"""Robots + crawl-delay politeness: engine vs simulator parity, disallow
semantics, priority-ordered budget selection (north-rule scheduler)."""

import pytest
from pyspark.sql import functions as F

from weaver_spark.engine import CrawlEngine
from weaver_spark.operators.robots import sim_robots_config
from weaver_spark.schemas import STATUS_BLOCKED
from weaver_spark.sim import simulate_crawl
from weaver_spark.webgen import make_robots, make_web


@pytest.fixture(scope="module")
def web():
    return make_web(seed=42, n_hosts=4, n_seed_roots=3, depth=2)


@pytest.fixture(scope="module")
def robots_rows():
    # h1/h3 disallow /item/, mega-host h0 gets crawl_delay 2500ms -> cap 1
    return make_robots(n_hosts=4, disallow_hosts=(1, 3), slow_host=0)


def _run_engine(spark, wh, web, robots_rows, host_budget):
    eng = CrawlEngine(spark, wh, mode="scale", host_budget=host_budget)
    eng.set_web(web)
    eng.set_robots(robots_rows)
    eng.seed_urls(web.seeds)
    eng.run(max_rounds=80)
    return eng


def test_robots_parity_with_simulator(spark, web, robots_rows, tmp_path_factory):
    """Scale mode with robots on: crawl order, blocked set and stored
    payloads all match the wave simulator under the same config."""
    wh = str(tmp_path_factory.mktemp("wh_robots"))
    eng = _run_engine(spark, wh, web, robots_rows, host_budget=2)
    sim = simulate_crawl(
        web, host_budget=2, robots=sim_robots_config(robots_rows)
    )

    got_order = [r["url"] for r in eng.crawl_order().collect()]
    assert got_order == sim.crawl_order

    state = eng.frontier.latest_state(spark)
    got_blocked = {
        r["url"] for r in state.where(F.col("status") == STATUS_BLOCKED).collect()
    }
    assert got_blocked == sim.blocked
    assert got_blocked  # fixture must actually exercise the disallow path

    got_stored = {r["image_id"] for r in eng.gather().select("image_id").collect()}
    assert got_stored == sim.seen_set


@pytest.fixture(scope="module")
def eng_nobudget(spark, web, robots_rows, tmp_path_factory):
    """One engine run with robots but no global budget, shared by the
    disallow and crawl-delay assertions."""
    wh = str(tmp_path_factory.mktemp("wh_robots_nb"))
    return _run_engine(spark, wh, web, robots_rows, host_budget=None)


def test_disallowed_urls_never_fetched(eng_nobudget, robots_rows):
    """No fetched URL's path may match a disallow prefix for its host."""
    eng = eng_nobudget
    fetched = eng.crawl_order().collect()
    assert fetched
    cfg = sim_robots_config(robots_rows)
    for r in fetched:
        host = r["url"].split("://", 1)[1].split("/", 1)[0]
        path = "/" + r["url"].split("://", 1)[1].split("/", 1)[1]
        assert not any(
            path.startswith(p) for p in cfg.get(host, {"disallow": []})["disallow"]
        ), r["url"]


def test_crawl_delay_caps_per_round_fetches(eng_nobudget):
    """The slow host (crawl_delay 2500ms -> cap 1/round) never exceeds
    one fetch per round, even with no global host budget."""
    per_round = (
        eng_nobudget.crawl_order()
        .where(F.col("url").startswith("http://h0.test/"))
        .groupBy("round")
        .agg(F.count("*").alias("n"))
        .collect()
    )
    assert per_round  # h0 is the zipf mega-host: it must appear
    assert all(r["n"] <= 1 for r in per_round)


def test_priority_roots_first_under_budget(spark, web, tmp_path_factory):
    """With a tight budget and no robots, root pages (priority 1) are
    selected before leaves with higher enqueue_seq — parity with sim's
    (-priority, seq) selection order."""
    wh = str(tmp_path_factory.mktemp("wh_prio"))
    eng = CrawlEngine(spark, wh, mode="scale", host_budget=1)
    eng.set_web(web)
    eng.seed_urls(web.seeds)
    eng.run(max_rounds=120)
    sim = simulate_crawl(web, host_budget=1)
    got = [r["url"] for r in eng.crawl_order().collect()]
    assert got == sim.crawl_order
    # the priority rule must be non-trivial on this web: some round must
    # fetch a root whose seq is higher than a deferred leaf's
    state = eng.frontier.latest_state(spark)
    prios = {r["priority"] for r in state.select("priority").distinct().collect()}
    assert prios == {0, 1}


def test_allow_precedence_rule():
    """Longest-match precedence, ties to Allow — the one shared rule
    (sim_is_disallowed) both engines consume."""
    from weaver_spark.operators.robots import sim_is_disallowed

    cfg = {"disallow": ["/item/"], "allow": ["/item/pub/"], "delay_cap": None}
    assert sim_is_disallowed("/item/7", cfg)
    assert not sim_is_disallowed("/item/pub/7", cfg)
    assert not sim_is_disallowed("/other", cfg)
    # equal-length conflict: Allow wins (Google semantics)
    tie = {"disallow": ["/a/"], "allow": ["/a/"], "delay_cap": None}
    assert not sim_is_disallowed("/a/x", tie)
    # no config / no rules
    assert not sim_is_disallowed("/item/7", None)
    assert not sim_is_disallowed("/item/7", {"disallow": [], "allow": []})


def test_apply_robots_allow_overrides(spark):
    """apply_robots: Allow re-opens the longer-matching subtree of a
    disallowed prefix, JVM-side; a robots table without the
    allow_prefixes column (pre-upgrade cache) behaves as before."""
    from weaver_spark.operators.robots import apply_robots
    from weaver_spark.schemas import ROBOTS_SCHEMA

    pending = spark.createDataFrame(
        [
            ("http://h1.test/item/7", "h1.test"),
            ("http://h1.test/item/pub/7", "h1.test"),
            ("http://h1.test/top", "h1.test"),
            ("http://h2.test/item/7", "h2.test"),
        ],
        "url string, host string",
    )
    robots = spark.createDataFrame(
        [
            ("h1.test", ["/item/"], 0, ["/item/pub/"], None),
            ("h2.test", ["/item/"], 0, None, None),
        ],
        ROBOTS_SCHEMA,
    )
    allowed, blocked = apply_robots(pending, robots)
    assert {r["url"] for r in blocked.collect()} == {
        "http://h1.test/item/7",
        "http://h2.test/item/7",
    }
    assert {r["url"] for r in allowed.collect()} == {
        "http://h1.test/item/pub/7",
        "http://h1.test/top",
    }

    # pre-upgrade 3-column table: same blocked set as before the feature
    legacy = spark.createDataFrame(
        [("h1.test", ["/item/"], 0)],
        "host string, disallow_prefixes array<string>, crawl_delay_ms int",
    )
    _, blocked2 = apply_robots(pending.where(F.col("host") == "h1.test"), legacy)
    assert {r["url"] for r in blocked2.collect()} == {
        "http://h1.test/item/7",
        "http://h1.test/item/pub/7",
    }


def test_allow_parity_with_simulator(spark, web, tmp_path_factory):
    """E2E: an Allow rule re-opening part of a disallowed subtree yields
    identical crawl order / blocked set / stored payloads in engine and
    simulator, and the rule is non-trivial on the fixture (some h1
    leaves fetched, some blocked)."""
    rows = make_robots(
        n_hosts=4, disallow_hosts=(1, 3), slow_host=0, allow_spec={1: ["/item/1"]}
    )
    wh = str(tmp_path_factory.mktemp("wh_robots_allow"))
    eng = _run_engine(spark, wh, web, rows, host_budget=2)
    sim = simulate_crawl(web, host_budget=2, robots=sim_robots_config(rows))

    got_order = [r["url"] for r in eng.crawl_order().collect()]
    assert got_order == sim.crawl_order
    state = eng.frontier.latest_state(spark)
    got_blocked = {
        r["url"] for r in state.where(F.col("status") == STATUS_BLOCKED).collect()
    }
    assert got_blocked == sim.blocked
    h1_fetched = [u for u in got_order if u.startswith("http://h1.test/item/")]
    h1_blocked = [u for u in got_blocked if u.startswith("http://h1.test/item/")]
    assert h1_fetched and h1_blocked  # Allow actually split the subtree
    got_stored = {r["image_id"] for r in eng.gather().select("image_id").collect()}
    assert got_stored == sim.seen_set
