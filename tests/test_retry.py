"""retry_failed=N: opt-in bounded re-enqueue of transient fetch failures.

Default (0) keeps the reference's at-most-once ack — a failed visit is
never re-queued (``/root/reference/src/scrapper/queueService.go:91-94``
acks on pop). With N>0 a transient failure re-enters the frontier as a
NEW enqueue event (fresh seq, attempt+1), interleaved with the round's
discovered links exactly where the simulator's put loop emits it; the
failed attempt's row stays terminally 'failed' so history keeps every
attempt. Gated two ways: full-crawl parity vs the simulator on a web
with dead links, and an HTTP e2e against a local server whose flaky
path 503s once then recovers.
"""

import tempfile
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

import numpy as np
import pytest

from weaver_spark.codec import encode_image
from weaver_spark.engine import CrawlEngine
from weaver_spark.sim import simulate_crawl
from weaver_spark.webgen import make_web

N_RETRY = 2


@pytest.fixture(scope="module")
def dead_web():
    """Small web + dead links: a dead SEED (fails before any links
    exist) and a dead link on a root (retry interleaves with that
    round's real links)."""
    web = make_web(seed=7, n_hosts=3, n_seed_roots=2, depth=1)
    first_root = web.seeds[0]
    web.pages[first_root]["links"].append("http://h0.test/missing/mid")
    web.seeds.append("http://h1.test/missing/seed")
    return web


@pytest.fixture(scope="module")
def retried(spark, dead_web):
    eng = CrawlEngine(
        spark,
        tempfile.mkdtemp(prefix="weaver_retry_"),
        mode="reproduction",
        retry_failed=N_RETRY,
        retry_min_status=400,  # synthetic missing page = 404
    )
    eng.set_web(dead_web)
    eng.seed_urls(dead_web.seeds)
    stats = eng.run(max_rounds=30)
    sim = simulate_crawl(dead_web, retry_failed=N_RETRY)
    return eng, sim, stats


def test_retry_crawl_order_matches_sim(retried):
    eng, sim, _ = retried
    got = [r["url"] for r in eng.crawl_order().collect()]
    assert got == sim.crawl_order
    # the dead urls really were attempted 1 + N_RETRY times each
    assert got.count("http://h0.test/missing/mid") == 1 + N_RETRY
    assert got.count("http://h1.test/missing/seed") == 1 + N_RETRY


def test_retry_enqueue_log_matches_sim(retried):
    eng, sim, _ = retried
    got = [r["url"] for r in eng.enqueue_log().collect()]
    assert got == sim.enqueue_log


def test_retry_statuses_and_attempts(retried):
    eng, sim, stats = retried
    state = {
        r["enqueue_seq"]: r for r in eng.frontier.latest_state(eng.spark).collect()
    }
    # final status per enqueue event matches the sim exactly
    assert {s: r["status"] for s, r in state.items()} == {
        seq: st for seq, _u, st in sim.statuses
    }
    # every attempt is a visible row: ordinals 0..N, all terminally failed
    dead = sorted(
        (r["attempt"], r["status"])
        for r in state.values()
        if r["url"] == "http://h0.test/missing/mid"
    )
    assert dead == [(i, "failed") for i in range(1 + N_RETRY)]
    assert sum(s["retried"] for s in stats) == 2 * N_RETRY


def test_retry_under_budget_matches_sim(spark, dead_web):
    """Scale mode: the retry re-enqueue composes with the per-host
    politeness budget — retried rows re-enter the scheduler window like
    any enqueue and defer like any row when the host is over budget."""
    eng = CrawlEngine(
        spark,
        tempfile.mkdtemp(prefix="weaver_retry_budget_"),
        mode="scale",
        host_budget=2,
        retry_failed=1,
        retry_min_status=400,
    )
    eng.set_web(dead_web)
    eng.seed_urls(dead_web.seeds)
    eng.run(max_rounds=40)
    sim = simulate_crawl(dead_web, host_budget=2, retry_failed=1)
    got = [r["url"] for r in eng.crawl_order().collect()]
    assert got == sim.crawl_order


def test_retry_clears_lease(spark, dead_web):
    """track_leases + retry: the failed attempt's terminal row has no
    live lease, and the retry row is a fresh pending enqueue."""
    eng = CrawlEngine(
        spark,
        tempfile.mkdtemp(prefix="weaver_retry_lease_"),
        mode="reproduction",
        track_leases=True,
        retry_failed=1,
        retry_min_status=400,
    )
    eng.set_web(dead_web)
    eng.seed_urls(dead_web.seeds)
    eng.run(max_rounds=40)
    rows = [
        r
        for r in eng.frontier.latest_state(eng.spark).collect()
        if r["url"] == "http://h1.test/missing/seed"
    ]
    assert sorted((r["attempt"], r["status"]) for r in rows) == [
        (0, "failed"),
        (1, "failed"),
    ]
    assert all(r["lease_ts"] is None for r in rows)


def test_retry_default_stays_reference_faithful(spark, dead_web):
    eng = CrawlEngine(
        spark, tempfile.mkdtemp(prefix="weaver_noretry_"), mode="reproduction"
    )
    eng.set_web(dead_web)
    eng.seed_urls(dead_web.seeds)
    eng.run(max_rounds=30)
    got = [r["url"] for r in eng.crawl_order().collect()]
    assert got == simulate_crawl(dead_web).crawl_order
    assert got.count("http://h1.test/missing/seed") == 1  # terminal


# ---- HTTP e2e: transient 503 recovers under retry_failed ----------------

PNG = encode_image(np.full((8, 8, 3), 55, dtype="uint8"), "png")


class _FlakyHandler(BaseHTTPRequestHandler):
    hits: dict = {}
    lock = threading.Lock()

    def log_message(self, *a):
        pass

    def do_GET(self):
        with self.lock:
            n = self.hits[self.path] = self.hits.get(self.path, 0) + 1
        if self.path == "/flaky" and n == 1:
            self.send_error(503)  # transient: succeeds on the next attempt
            return
        if self.path == "/dead":
            self.send_error(503)  # permanent: exhausts the retry budget
            return
        if self.path == "/big":
            body = b"x" * 5000  # oversize vs the test's 1 KiB body cap
            self.send_response(200)
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)
            return
        body = PNG
        self.send_response(200)
        self.send_header("Content-Length", str(len(body)))
        self.end_headers()
        self.wfile.write(body)


@pytest.fixture()
def flaky_server():
    _FlakyHandler.hits = {}
    srv = ThreadingHTTPServer(("127.0.0.1", 0), _FlakyHandler)
    threading.Thread(target=srv.serve_forever, daemon=True).start()
    yield f"http://127.0.0.1:{srv.server_port}"
    srv.shutdown()


def test_http_transient_503_recovers(spark, flaky_server):
    eng = CrawlEngine(
        spark,
        tempfile.mkdtemp(prefix="weaver_http_retry_"),
        retry_failed=N_RETRY,
    )
    eng.set_http_fetcher(max_concurrency=2, backoff_base_s=0.01, timeout_s=5.0)
    eng.seed_urls(
        [f"{flaky_server}/flaky", f"{flaky_server}/ok", f"{flaky_server}/dead"]
    )
    eng.run(max_rounds=10)
    rows = eng.frontier.latest_state(spark).collect()
    # /flaky: first attempt failed (visible), retry succeeded
    flaky = [
        (r["attempt"], r["status"])
        for r in rows
        if r["url"] == f"{flaky_server}/flaky"
    ]
    assert sorted(flaky) == [(0, "failed"), (1, "done")]
    stored = {r["image_id"] for r in eng.images.read(spark).collect()}
    assert f"{flaky_server}/flaky" in stored and f"{flaky_server}/ok" in stored
    # /dead exhausted its budget: 1 + N_RETRY attempts, all failed, gone
    dead = [
        (r["attempt"], r["status"])
        for r in rows
        if r["url"] == f"{flaky_server}/dead"
    ]
    assert sorted(dead) == [(i, "failed") for i in range(1 + N_RETRY)]
    assert _FlakyHandler.hits["/dead"] == 1 + N_RETRY
    assert f"{flaky_server}/dead" not in stored


def test_deterministic_rejections_never_retried(spark, flaky_server):
    """597/598 are deterministic LOCAL rejections (wrong media type,
    oversize body): the answer cannot change on retry and 598 would
    re-stream up to the cap per attempt — excluded from the transient
    set even though they sit above the 5xx threshold."""
    eng = CrawlEngine(
        spark,
        tempfile.mkdtemp(prefix="weaver_http_598_"),
        retry_failed=N_RETRY,  # default retry_min_status=500
    )
    eng.set_http_fetcher(
        max_concurrency=2,
        backoff_base_s=0.01,
        timeout_s=5.0,
        max_body_bytes=1024,
    )
    eng.seed_urls([f"{flaky_server}/big"])
    eng.run(max_rounds=5)
    rows = eng.frontier.latest_state(spark).collect()
    assert [(r["attempt"], r["status"]) for r in rows] == [(0, "failed")]
    assert _FlakyHandler.hits["/big"] == 1  # exactly one fetch, no retry


def test_below_threshold_not_retried(spark, flaky_server):
    """A failure below retry_min_status is an answer, not a transient:
    never re-enqueued even with a retry budget."""
    eng = CrawlEngine(
        spark,
        tempfile.mkdtemp(prefix="weaver_http_min_"),
        retry_failed=N_RETRY,
        retry_min_status=600,  # nothing qualifies as transient
    )
    eng.set_http_fetcher(max_concurrency=2, backoff_base_s=0.01, timeout_s=5.0)
    eng.seed_urls([f"{flaky_server}/dead"])
    eng.run(max_rounds=5)
    rows = eng.frontier.latest_state(spark).collect()
    assert [(r["attempt"], r["status"]) for r in rows] == [(0, "failed")]
    assert _FlakyHandler.hits["/dead"] == 1
