"""End-to-end crawl through the REAL HTTP path: engine + mapInPandas
fetch over a local http.server, no synthetic page table. Exercises the
production deployment shape (scripts/crawl_job.py --http): seed typing,
relative-href resolution against the parent URL, URL-keyed payload
dedup, payload decode/phash from real response bytes, multi-round
frontier growth and drain."""

import socket
import tempfile
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

import numpy as np
import pytest
from pyspark.sql import functions as F

from weaver_spark.codec import encode_image, phash64
from weaver_spark.engine import CrawlEngine

PIXELS = {i: np.full((8, 8, 3), 40 * i + 7, dtype=np.uint8) for i in range(1, 5)}
PNGS = {i: encode_image(px, "png") for i, px in PIXELS.items()}


ROBOTS_TXT = (
    b"# generic bot rules\n"
    b"User-agent: megabot\n"
    b"Disallow: /\n"
    b"\n"
    b"User-agent: *\n"
    b"Disallow: /img/\n"
    b"Crawl-delay: 0\n"
)


class _Handler(BaseHTTPRequestHandler):
    def log_message(self, *a):
        pass

    def do_GET(self):
        if self.path == "/robots.txt":
            self.send_response(200)
            self.send_header("Content-Length", str(len(ROBOTS_TXT)))
            self.end_headers()
            self.wfile.write(ROBOTS_TXT)
            return
        if self.path == "/cat/0":
            # relative hrefs; /img/2 linked twice (first-wins dedup);
            # /cat/1 is a second root one hop deeper
            body = (
                b'<a href="/img/1">a</a> <a href="/img/2">b</a> '
                b'<a href="/img/2">b2</a> <a href="/cat/1">more</a>'
            )
        elif self.path == "/cat/1":
            body = b'<a href="/img/3">c</a> <a href="/img/4">d</a> <a href="/gone">x</a>'
        # 3-level category tree for the URL-classifier test: only the
        # classifier can descend it (every /shop/ page would otherwise be
        # typed leaf and never have its links extracted)
        elif self.path == "/shop/0":
            body = b'<a href="/shop/1">s1</a> <a href="/img/1">i1</a>'
        elif self.path == "/shop/1":
            body = b'<a href="/shop/2">s2</a> <a href="/img/2">i2</a>'
        elif self.path == "/shop/2":
            body = b'<a href="/img/3">i3</a> <a href="/img/4">i4</a>'
        elif self.path.startswith("/img/"):
            body = PNGS[int(self.path.rsplit("/", 1)[1])]
        else:
            self.send_error(404)
            return
        self.send_response(200)
        self.send_header("Content-Length", str(len(body)))
        self.end_headers()
        self.wfile.write(body)


@pytest.fixture(scope="module")
def server():
    srv = ThreadingHTTPServer(("127.0.0.1", 0), _Handler)
    threading.Thread(target=srv.serve_forever, daemon=True).start()
    yield f"http://127.0.0.1:{srv.server_port}"
    srv.shutdown()


def test_http_crawl_end_to_end(spark, server):
    eng = CrawlEngine(spark, tempfile.mkdtemp(prefix="weaver_http_"))
    eng.set_http_fetcher(max_concurrency=4, backoff_base_s=0.01, timeout_s=5.0)
    # crawl_job.py seed shape: typed root seed; crawling /cat/1 as a leaf
    # would store the HTML as a payload, so type must flow through
    eng.seed_urls([f"{server}/cat/0"], url_types=["root"])
    stats = eng.run(max_rounds=10)

    base = server
    rows = eng.images.read(spark).collect()
    images = {r["image_id"]: r for r in rows}

    # discovered links are fetched as leaves: img/1, img/2 (payloads) and
    # cat/1 (its HTML stored as a raw leaf payload — the reference stores
    # whatever the product handler returns). One row per unique URL:
    # the duplicate /img/2 link was enqueued twice (no frontier dedup —
    # reference semantics) but stored once (URL-keyed payload dedup).
    assert sorted(images) == [f"{base}/cat/1", f"{base}/img/1", f"{base}/img/2"]
    assert len(rows) == len(images)

    # decoded payloads round-trip: w/h/fmt/phash computed from real bytes
    r1 = images[f"{base}/img/1"]
    assert (r1["w"], r1["h"], r1["fmt"]) == (8, 8, "png")
    assert r1["phash"] == phash64(PIXELS[1])
    assert bytes(r1["bytes"]) == PNGS[1]
    assert images[f"{base}/cat/1"]["fmt"] == "raw"  # undecodable leaf body

    # relative hrefs resolved against the parent into absolute urls
    state = eng.frontier.latest_state(spark)
    urls = {r["url"] for r in state.collect()}
    assert f"{base}/img/1" in urls and f"{base}/cat/1" in urls
    # cat/1 was fetched as a LEAF — no link extraction, so its hrefs
    # (img/3, img/4) were never enqueued: typed dispatch is honored
    assert f"{base}/img/3" not in urls and f"{base}/img/4" not in urls

    # drained: no pending rows; 5 fetches (root + 4 link rows incl. dup)
    pending = state.where(F.col("status") == "pending").count()
    assert pending == 0
    assert sum(s["batch"] for s in stats) == 5


def test_robots_txt_parser():
    from weaver_spark.operators.robots import parse_robots_txt

    prefixes, delay, allow = parse_robots_txt(ROBOTS_TXT.decode())
    assert prefixes == ["/img/"] and delay == 0  # megabot group ignored
    assert allow == []

    # grouped agents, fractional delay, comments, junk lines
    txt = (
        "User-agent: a\nUser-agent: *\nDisallow: /private/  # secret\n"
        "Crawl-delay: 1.5\nnonsense line\nDisallow:\n"
        "\nUser-agent: b\nDisallow: /b-only/\n"
    )
    prefixes, delay, allow = parse_robots_txt(txt)
    assert prefixes == ["/private/"] and delay == 1500

    # Allow lines collected for the wildcard group only
    txt2 = (
        "User-agent: *\nDisallow: /private/\nAllow: /private/pub/\n"
        "User-agent: b\nAllow: /b-only/\n"
    )
    prefixes, delay, allow = parse_robots_txt(txt2)
    assert prefixes == ["/private/"] and allow == ["/private/pub/"]


def test_http_crawl_live_robots_enforced(spark, server):
    """Scale mode + live robots cache: /robots.txt is fetched once per
    host, its Disallow: /img/ blocks the image leaves (terminal status,
    never fetched), while the allowed leaf is still crawled."""
    eng = CrawlEngine(spark, tempfile.mkdtemp(prefix="weaver_robots_"), mode="scale")
    eng.set_http_fetcher(max_concurrency=4, backoff_base_s=0.01, timeout_s=5.0)
    eng.enable_auto_robots(timeout_s=5.0)
    eng.seed_urls([f"{server}/cat/0"], url_types=["root"])
    eng.run(max_rounds=10)

    base = server
    state = {r["url"]: r["status"] for r in eng.frontier.latest_state(spark).collect()}
    assert state[f"{base}/img/1"] == "blocked"
    assert state[f"{base}/img/2"] == "blocked"
    assert state[f"{base}/cat/1"] == "done"  # not under /img/ — crawled
    images = {r["image_id"] for r in eng.images.read(spark).collect()}
    assert images == {f"{base}/cat/1"}  # no blocked URL ever stored
    # the cache: one robots row for the one host, carrying the parse
    rows = eng.robots_df.collect()
    assert len(rows) == 1 and list(rows[0]["disallow_prefixes"]) == ["/img/"]


def test_url_classifier_compounds_discovery(spark, server, tmp_path):
    """With classifier rules, DISCOVERED category pages are typed root and
    their links extracted — the crawl descends a 3-level site from one
    seed (without rules it stalls at depth 1, test_http_crawl_end_to_end).
    Rules compile to a JVM CASE/rlike over the links pass: first match
    wins, no match falls through to leaf."""
    eng = CrawlEngine(spark, str(tmp_path / "wh"))
    eng.set_http_fetcher(max_concurrency=4, backoff_base_s=0.01, timeout_s=5.0)
    eng.set_url_classifier([(r"/shop/\d+$", "root")])
    eng.seed_urls([f"{server}/shop/0"], url_types=["root"])
    eng.run(max_rounds=10)

    base = server
    images = {r["image_id"]: r for r in eng.images.read(spark).collect()}
    # payload leaves from ALL THREE levels stored; category pages typed
    # root yield links, never payloads
    assert sorted(images) == [f"{base}/img/{i}" for i in (1, 2, 3, 4)]
    assert images[f"{base}/img/4"]["phash"] == phash64(PIXELS[4])

    state = {r["url"]: r for r in eng.frontier.latest_state(spark).collect()}
    # discovered (not seeded) categories were classified root, fetched,
    # and their depth>=2 links enqueued
    assert state[f"{base}/shop/1"]["url_type"] == "root"
    assert state[f"{base}/shop/2"]["url_type"] == "root"
    assert state[f"{base}/shop/2"]["status"] == "done"
    assert state[f"{base}/img/3"]["status"] == "done"  # depth-3 leaf


def test_robots_cache_persists_across_restart(spark, server, tmp_path):
    """The robots cache is a durable table: a restarted engine reloads it
    and never re-fetches a cached host's robots.txt (witnessed by opener
    call count across two engines on one warehouse)."""
    import urllib.request

    calls: list[str] = []

    def opener(url, timeout):
        calls.append(url)
        return urllib.request.urlopen(url, timeout=timeout)

    wh = str(tmp_path / "wh")
    for expected_calls in (1, 1):  # first run fetches; restart must not
        eng = CrawlEngine(spark, wh, mode="scale")
        eng.set_http_fetcher(max_concurrency=4, backoff_base_s=0.01, timeout_s=5.0)
        eng.enable_auto_robots(opener=opener, timeout_s=5.0)
        eng.seed_urls([f"{server}/cat/0"], url_types=["root"])
        eng.run(max_rounds=10)
        assert len(calls) == expected_calls
    rows = eng.robots_df.collect()
    assert len(rows) == 1 and list(rows[0]["disallow_prefixes"]) == ["/img/"]


def test_distributed_robots_cache_fill(spark, server, tmp_path):
    """enable_auto_robots(distributed=True): the cache fill runs as a
    mapInPandas job (zero per-host driver traffic — the 10^7-host shape)
    with identical enforcement semantics to the driver thread pool."""
    eng = CrawlEngine(spark, str(tmp_path / "wh"), mode="scale")
    eng.set_http_fetcher(max_concurrency=4, backoff_base_s=0.01, timeout_s=5.0)
    eng.enable_auto_robots(distributed=True, timeout_s=5.0)
    eng.seed_urls([f"{server}/cat/0"], url_types=["root"])
    eng.run(max_rounds=10)
    base = server
    state = {r["url"]: r["status"] for r in eng.frontier.latest_state(spark).collect()}
    assert state[f"{base}/img/1"] == "blocked"
    assert state[f"{base}/cat/1"] == "done"
    rows = eng.robots_table.read(spark).collect()
    assert len(rows) == 1 and list(rows[0]["disallow_prefixes"]) == ["/img/"]


def test_distributed_robots_scheme_kwarg(spark, server, tmp_path):
    """enable_auto_robots(distributed=True, scheme=...) must not crash:
    'scheme' only applies to the driver-side fetch (bare hosts need an
    authority), so the distributed cache fill filters kwargs to
    fetch_robots_df's signature instead of forwarding blindly (which
    raised TypeError on the first round's fill)."""
    eng = CrawlEngine(spark, str(tmp_path / "wh"), mode="scale")
    eng.set_http_fetcher(max_concurrency=4, backoff_base_s=0.01, timeout_s=5.0)
    eng.enable_auto_robots(distributed=True, scheme="http", timeout_s=5.0)
    eng.seed_urls([f"{server}/cat/0"], url_types=["root"])
    eng.run(max_rounds=10)
    state = {r["url"]: r["status"] for r in eng.frontier.latest_state(spark).collect()}
    assert state[f"{server}/img/1"] == "blocked"
    assert state[f"{server}/cat/1"] == "done"


def test_refresh_robots_idempotent(spark, server, tmp_path):
    """The public refresh_robots guards against re-fetch/duplicate rows
    itself (not just via run_round's anti-join): a duplicated host row
    would double every pending row for that host through the enforcement
    join."""
    import urllib.request

    calls: list[str] = []

    def opener(url, timeout):
        calls.append(url)
        return urllib.request.urlopen(url, timeout=timeout)

    eng = CrawlEngine(spark, str(tmp_path / "wh"), mode="scale")
    eng.enable_auto_robots(opener=opener, timeout_s=5.0)
    assert eng.refresh_robots([("127.0.0.1", server)]) == 1
    assert eng.refresh_robots([("127.0.0.1", server)]) == 0  # cached: no-op
    assert len(calls) == 1
    assert eng.robots_table.read(spark).count() == 1
    assert eng.robots_df.count() == 1


def test_manual_robots_survive_auto_refresh(spark, server, tmp_path):
    """set_robots() rules installed before enable_auto_robots must not be
    discarded by the first auto-refresh (the live robots.txt has no /cat/
    rule, so a dropped manual overlay would let the seed through)."""
    eng = CrawlEngine(spark, str(tmp_path / "wh"), mode="scale")
    eng.set_http_fetcher(max_concurrency=4, backoff_base_s=0.01, timeout_s=5.0)
    eng.set_robots([("127.0.0.1", ["/cat/"], 0)])
    eng.enable_auto_robots(timeout_s=5.0)
    eng.seed_urls([f"{server}/cat/0"], url_types=["root"])
    eng.run(max_rounds=5)
    state = {r["url"]: r["status"] for r in eng.frontier.latest_state(spark).collect()}
    assert state[f"{server}/cat/0"] == "blocked"  # manual rule enforced
    assert eng.images.read(spark).count() == 0


def test_http_crawl_404_marks_failed(spark, server):
    eng = CrawlEngine(spark, tempfile.mkdtemp(prefix="weaver_http_"))
    eng.set_http_fetcher(max_concurrency=2, backoff_base_s=0.01, timeout_s=5.0)
    eng.seed_urls([f"{server}/nope"], url_types=["leaf"])
    eng.run(max_rounds=3)
    state = eng.frontier.latest_state(spark)
    rows = state.collect()
    assert len(rows) == 1 and rows[0]["status"] == "failed"
    assert eng.images.read(spark).count() == 0


def test_in_round_crawl_delay_pacing(spark, tmp_path):
    """North-rule politeness promise, engine-level: a host with a robots
    crawl-delay receives its in-round requests SPACED >= delay apart in
    wall time, not just capped per round. The engine routes the delayed
    host's rows into one fetch task (constant salt) and the HTTP fetcher
    paces inside it — server-side arrival timestamps are the witness."""
    import time as _time

    arrivals: list[float] = []
    lock = threading.Lock()

    class _TimedHandler(_Handler):
        def do_GET(self):
            with lock:
                arrivals.append(_time.monotonic())
            super().do_GET()

    srv = ThreadingHTTPServer(("127.0.0.1", 0), _TimedHandler)
    threading.Thread(target=srv.serve_forever, daemon=True).start()
    base = f"http://127.0.0.1:{srv.server_port}"
    host = "127.0.0.1"  # the frontier's politeness key is the bare host
    delay_ms = 300
    try:
        eng = CrawlEngine(spark, str(tmp_path / "wh"), mode="scale")
        eng.set_http_fetcher(max_concurrency=8, backoff_base_s=0.01, timeout_s=5.0)
        eng.set_url_classifier([(r"/cat/\d+$", "root")])
        eng.set_robots([(host, [], delay_ms)])
        eng.seed_urls([f"{base}/cat/0"], url_types=["root"])
        eng.run(max_rounds=10)
    finally:
        srv.shutdown()

    state = {r["url"]: r["status"] for r in eng.frontier.latest_state(spark).collect()}
    assert state[f"{base}/img/1"] == "done"
    assert state[f"{base}/img/3"] == "done"  # crawl completed through cat/1
    # cap = 1000ms // 300ms = 3 fetches/round; each round's arrivals must
    # be spaced >= ~delay apart (between-round gaps are larger still)
    gaps = [b - a for a, b in zip(arrivals, arrivals[1:])]
    assert len(arrivals) >= 6
    assert all(g >= delay_ms / 1000 * 0.9 for g in gaps), gaps
