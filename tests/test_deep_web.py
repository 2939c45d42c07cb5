"""Deep-web generator parity: make_deep_web_df (JVM id-range generation,
the bench's 4-level web) must be byte-identical to make_deep_web (the
driver-side SyntheticWeb mirror), and an engine crawl over the DF web
must match the simulator run on the mirror — including depth-decay
priority scheduling under a host budget, which the 2-level bench web
can never exercise (it drains in 2 rounds)."""

import tempfile

import pytest

from weaver_spark.engine import CrawlEngine
from weaver_spark.sim import simulate_crawl
from weaver_spark.webgen import make_deep_web, make_deep_web_df

PARAMS = dict(
    n_seed_roots=2, child_roots=2, depth=4, leaves_per_root=3, n_hosts=4
)


def test_df_matches_python_mirror(spark):
    seeds, df = make_deep_web_df(spark, **PARAMS)
    web = make_deep_web(**PARAMS)
    assert seeds == web.seeds
    got = {
        r["url"]: (r["kind"], list(r["links"] or []), r["image_id"])
        for r in df.collect()
    }
    want = {
        url: (p["kind"], p.get("links") or [], p.get("image_id"))
        for url, p in web.pages.items()
    }
    assert got == want
    # sanity: 4 root levels + leaves, roots 2+4+8+16
    assert sum(1 for k, _l, _i in got.values() if k == "root") == 30


@pytest.fixture(scope="module")
def deep_crawled(spark):
    seeds, df = make_deep_web_df(spark, **PARAMS)
    eng = CrawlEngine(
        spark,
        tempfile.mkdtemp(prefix="weaver_deep_"),
        mode="scale",
        host_budget=3,
        priority_mode="depth",
    )
    eng.set_web_df(df)
    eng.seed_urls(seeds)
    stats = eng.run(max_rounds=60)
    sim = simulate_crawl(
        make_deep_web(**PARAMS), host_budget=3, priority_mode="depth"
    )
    return eng, sim, stats


def test_deep_crawl_matches_sim(deep_crawled):
    eng, sim, stats = deep_crawled
    got = [r["url"] for r in eng.crawl_order().collect()]
    assert got == sim.crawl_order
    assert len(stats) == len(sim.rounds)


def test_max_depth_guard_matches_sim(spark):
    """max_depth=D: links that would enqueue deeper than D are dropped
    (their parent is still fetched) — the open-web frontier bound. The
    4-level web is the fixture where the guard actually bites: waves
    stop at 3 instead of 5."""
    seeds, df = make_deep_web_df(spark, **PARAMS)
    eng = CrawlEngine(
        spark,
        tempfile.mkdtemp(prefix="weaver_depthcap_"),
        mode="reproduction",
        max_depth=2,
    )
    eng.set_web_df(df)
    eng.seed_urls(seeds)
    stats = eng.run(max_rounds=20)
    sim = simulate_crawl(make_deep_web(**PARAMS), max_depth=2)
    got = [r["url"] for r in eng.crawl_order().collect()]
    assert got == sim.crawl_order
    assert len(stats) == len(sim.rounds) == 3  # d0, d1, d2 — no wave 4
    state = eng.frontier.latest_state(eng.spark)
    assert state.agg({"depth": "max"}).collect()[0][0] == 2


def test_deep_crawl_exercises_depth_priority(deep_crawled):
    """The point of the deep web: >= 3 distinct live depth levels
    coexist in the frontier, so the depth-decay priority source actually
    orders a wave (the 2-level web never has more than 2)."""
    eng, _sim, stats = deep_crawled
    state = eng.frontier.latest_state(eng.spark)
    depths = {r["depth"] for r in state.select("depth").distinct().collect()}
    assert len(depths) >= 4  # 0..3 root levels + leaf levels
    assert len(stats) >= 4  # multi-hop discovery: 4+ waves
