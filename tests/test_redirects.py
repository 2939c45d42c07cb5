"""Redirect-aware HTTP fetch (VERDICT r4 #4): urllib follows 3xx
silently, so the engine must (a) key payloads on the canonical
POST-redirect URL — two request URLs 301-ing to one target store ONE
payload row, within a round and across rounds — and (b) resolve
relative hrefs against the final base, not the pre-redirect request
URL. Driven end-to-end against a local redirecting http.server."""

import tempfile
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

import numpy as np
import pytest
from pyspark.sql import functions as F

from weaver_spark.codec import encode_image, phash64
from weaver_spark.engine import CrawlEngine

PX1 = np.full((8, 8, 3), 55, dtype=np.uint8)
PX2 = np.full((8, 8, 3), 155, dtype=np.uint8)
PNG1 = encode_image(PX1, "png")
PNG2 = encode_image(PX2, "png")


class _Handler(BaseHTTPRequestHandler):
    def log_message(self, *a):
        pass

    def _redirect(self, target: str):
        self.send_response(301)
        self.send_header("Location", target)
        self.send_header("Content-Length", "0")
        self.end_headers()

    def _body(self, body: bytes):
        self.send_response(200)
        self.send_header("Content-Length", str(len(body)))
        self.end_headers()
        self.wfile.write(body)

    def do_GET(self):
        if self.path in ("/moved/a", "/moved/b", "/moved/c"):
            self._redirect("/img/1")
        elif self.path == "/movedcat":
            self._redirect("/realcat/idx")
        elif self.path == "/img/1":
            self._body(PNG1)
        elif self.path == "/realcat/idx":
            self._body(b'<a href="leaf1">x</a>')
        elif self.path == "/realcat/leaf1":
            self._body(PNG2)
        else:
            self.send_response(404)
            self.send_header("Content-Length", "0")
            self.end_headers()


@pytest.fixture(scope="module")
def server():
    srv = ThreadingHTTPServer(("127.0.0.1", 0), _Handler)
    threading.Thread(target=srv.serve_forever, daemon=True).start()
    yield f"http://127.0.0.1:{srv.server_port}"
    srv.shutdown()


@pytest.fixture(scope="module")
def eng(spark, server):
    e = CrawlEngine(
        spark, tempfile.mkdtemp(prefix="weaver_redir_"), mode="reproduction"
    )
    e.set_http_fetcher(max_concurrency=4, backoff_base_s=0.01, timeout_s=5.0)
    e.seed_urls(
        [f"{server}/moved/a", f"{server}/moved/b", f"{server}/movedcat"],
        url_types=["leaf", "leaf", "root"],
    )
    e.run(max_rounds=10)
    return e


def test_one_payload_row_for_coredirecting_urls(spark, eng, server):
    rows = {r["image_id"]: r for r in eng.gather().collect()}
    # /moved/a and /moved/b both 301 to /img/1: ONE stored row, keyed by
    # the canonical FINAL url — plus the leaf discovered via the
    # redirected root
    assert sorted(rows) == [f"{server}/img/1", f"{server}/realcat/leaf1"]
    assert bytes(rows[f"{server}/img/1"]["bytes"]) == PNG1
    assert rows[f"{server}/img/1"]["phash"] == phash64(PX1)
    assert rows[f"{server}/realcat/leaf1"]["phash"] == phash64(PX2)


def test_links_resolve_against_final_base(spark, eng, server):
    state = eng.frontier.latest_state(spark)
    urls = {r["url"] for r in state.collect()}
    # href="leaf1" on the page served from /realcat/idx resolves against
    # the POST-redirect base, not the /movedcat request URL
    assert f"{server}/realcat/leaf1" in urls
    assert f"{server}/leaf1" not in urls
    # every request row was fetched and resolved (no pendings left)
    assert state.where(F.col("status") == "pending").count() == 0


def test_cross_round_redirect_dedup(spark, eng, server):
    """A LATER seed redirecting to an already-stored target fetches but
    stores nothing — the post-fetch reconcile checks FINAL keys against
    the seen set (the pre-fetch request-URL filter cannot see through a
    redirect)."""
    before = eng.gather().count()
    img_commits_before = eng.images.last_commit()
    eng.seed_urls([f"{server}/moved/c"], url_types=["leaf"])
    eng.run(max_rounds=5)
    assert eng.gather().count() == before
    # not even an empty images commit happened for the dedup round
    assert eng.images.last_commit() == img_commits_before
    state = eng.frontier.latest_state(spark)
    done = {
        r["url"]
        for r in state.where(F.col("status") == "done").collect()
    }
    assert f"{server}/moved/c" in done  # fetched + acked, just not stored


def test_final_url_recorded_in_stage_schema(spark, eng, server):
    """The adopted payload files physically carry final_url (the stage
    schema column the verdict asked for)."""
    from pyspark.sql.types import StringType, StructField, StructType

    from weaver_spark.schemas import IMAGES_SCHEMA

    ext = StructType(
        IMAGES_SCHEMA.fields + [StructField("final_url", StringType(), True)]
    )
    rows = {
        r["image_id"]: r["final_url"]
        for r in eng.images.read(spark, schema=ext).collect()
    }
    assert rows[f"{server}/img/1"] == f"{server}/img/1"
    assert rows[f"{server}/realcat/leaf1"] == f"{server}/realcat/leaf1"
