"""Offline test of the production HTTP fetcher against a local
http.server: concurrency (>=2 in flight), retry-on-connection-error,
4xx-is-an-answer-not-a-retry, link parsing + payload decode. Runs the
mapInPandas callable directly on pandas batches — no Spark needed."""

import threading
import time
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

import numpy as np
import pandas as pd
import pytest

from weaver_spark.codec import encode_image
from weaver_spark.operators.fetch import make_http_fetch_fn

PNG = encode_image(np.full((8, 8, 3), 77, dtype=np.uint8), "png")


class _State:
    lock = threading.Lock()
    in_flight = 0
    max_in_flight = 0
    flaky_hits = 0


class _Handler(BaseHTTPRequestHandler):
    def log_message(self, *a):  # quiet
        pass

    def do_GET(self):
        with _State.lock:
            _State.in_flight += 1
            _State.max_in_flight = max(_State.max_in_flight, _State.in_flight)
        try:
            time.sleep(0.05)  # force request overlap
            if self.path == "/root":
                body = b'<a href="/img/1">x</a> <a href="/img/2">y</a> <a href="/img/3">z</a>'
                self.send_response(200)
                self.send_header("Content-Length", str(len(body)))
                self.end_headers()
                self.wfile.write(body)
            elif self.path.startswith("/img/"):
                self.send_response(200)
                self.send_header("Content-Length", str(len(PNG)))
                self.end_headers()
                self.wfile.write(PNG)
            elif self.path == "/flaky":
                with _State.lock:
                    _State.flaky_hits += 1
                    first = _State.flaky_hits == 1
                if first:  # drop the connection: a retryable socket error
                    self.connection.close()
                    return
                self.send_response(200)
                self.send_header("Content-Length", str(len(PNG)))
                self.end_headers()
                self.wfile.write(PNG)
            else:
                self.send_error(404)
        finally:
            with _State.lock:
                _State.in_flight -= 1


@pytest.fixture(scope="module")
def server():
    srv = ThreadingHTTPServer(("127.0.0.1", 0), _Handler)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    yield f"http://127.0.0.1:{srv.server_port}"
    srv.shutdown()


def _batch(base, specs):
    return pd.DataFrame(
        {
            "url": [base + p for p, _ in specs],
            "enqueue_seq": np.arange(len(specs), dtype="int64"),
            "host": ["127.0.0.1"] * len(specs),
            "url_type": [t for _, t in specs],
            "depth": np.zeros(len(specs), dtype="int32"),
        }
    )


def test_http_fetch_concurrent_parse_retry(server):
    fetch_fn = make_http_fetch_fn(
        k_cap=2, max_concurrency=8, backoff_base_s=0.01, timeout_s=5.0
    )
    specs = (
        [("/root", "root")]
        + [(f"/img/{i}", "leaf") for i in range(6)]
        + [("/flaky", "leaf"), ("/missing", "leaf")]
    )
    [res] = list(fetch_fn(iter([_batch(server, specs)])))

    by_url = {r["url"].rsplit(":", 1)[1].split("/", 1)[1]: r for _, r in res.iterrows()}
    root = by_url["root"]
    assert root["status_code"] == 200
    assert list(root["links"]) == ["/img/1", "/img/2"]  # k_cap=2, DOM order

    img = by_url["img/1"]
    assert img["status_code"] == 200 and img["fmt"] == "png"
    assert img["w"] == 8 and img["h"] == 8 and img["bytes_len"] == len(PNG)

    flaky = by_url["flaky"]
    assert flaky["status_code"] == 200  # recovered via backoff retry
    assert _State.flaky_hits == 2

    missing = by_url["missing"]
    assert missing["status_code"] == 404  # 4xx answered once, no retry

    assert _State.max_in_flight >= 2  # the pool really fetches in parallel
