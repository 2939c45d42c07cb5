"""The crawl-semantics gate: the Spark engine in reproduction mode must
match the pure-Python reference simulator (SURVEY.md §0.1 semantics) on
crawl order, enqueue log, URL-seen set (= stored keys) and stored rows,
and the per-row payload invariant (PSNR / byte-exact captions)."""

import numpy as np
import pytest

from weaver_spark.codec import decode_image, psnr
from weaver_spark.engine import CrawlEngine
from weaver_spark.sim import simulate_crawl
from weaver_spark.webgen import gen_pixels, make_web


@pytest.fixture(scope="module")
def web():
    return make_web(seed=42, n_hosts=6, n_seed_roots=3, depth=2)


@pytest.fixture(scope="module")
def crawled(spark, web, tmp_path_factory):
    wh = str(tmp_path_factory.mktemp("wh_repro"))
    eng = CrawlEngine(spark, wh, mode="reproduction")
    eng.set_web(web)
    eng.seed_urls(web.seeds)
    stats = eng.run(max_rounds=20)
    sim = simulate_crawl(web)
    return eng, sim, stats


def test_round_count_matches_waves(crawled):
    eng, sim, stats = crawled
    assert len(stats) == len(sim.rounds)


def test_crawl_order_identical(crawled):
    eng, sim, _ = crawled
    got = [r["url"] for r in eng.crawl_order().collect()]
    assert got == sim.crawl_order


def test_enqueue_log_identical(crawled):
    eng, sim, _ = crawled
    got = [r["url"] for r in eng.enqueue_log().collect()]
    assert got == sim.enqueue_log


def test_seen_set_identical(crawled):
    eng, sim, _ = crawled
    got = {r["image_id"] for r in eng.gather().select("image_id").collect()}
    assert got == sim.seen_set


def test_stored_rows_match_reference(crawled):
    """Per-row invariant: identical metadata + captions byte-exact +
    decoded pixels PSNR>=40dB vs the reference-run originals."""
    eng, sim, _ = crawled
    rows = {r["image_id"]: r for r in eng.gather().collect()}
    assert set(rows) == set(sim.stored)
    for iid, ref in sim.stored.items():
        got = rows[iid]
        assert got["caption"] == ref["caption"]
        assert (got["w"], got["h"], got["fmt"], got["phash"]) == (
            ref["w"],
            ref["h"],
            ref["fmt"],
            ref["phash"],
        )
        assert bytes(got["bytes"]) == ref["bytes"]  # deterministic codec
        original = gen_pixels(iid)
        decoded = decode_image(bytes(got["bytes"]))
        if ref["fmt"] == "png":
            assert (decoded == original).all()
        else:
            assert psnr(original, decoded) >= 40.0


def test_double_enqueued_urls_fetched_twice(crawled):
    """Reference has no frontier dedup (src/queue/main.go:31-45): a URL
    linked twice is crawled twice. The generator guarantees dup links."""
    eng, sim, _ = crawled
    assert len(sim.crawl_order) > len(set(sim.crawl_order))
    got = [r["url"] for r in eng.crawl_order().collect()]
    assert len(got) > len(set(got))


def test_partition_count_invariance(spark, web, tmp_path_factory):
    """Ring-intact analogue (SURVEY.md §5 invariant b): results must not
    depend on parallelism."""
    wh = str(tmp_path_factory.mktemp("wh_repro_p1"))
    old = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "1")
    try:
        eng = CrawlEngine(spark, wh, mode="reproduction")
        eng.set_web(web)
        eng.seed_urls(web.seeds)
        eng.run(max_rounds=20)
        sim = simulate_crawl(web)
        got = [r["url"] for r in eng.crawl_order().collect()]
        assert got == sim.crawl_order
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", old)
