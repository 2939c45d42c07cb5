"""Hostile-web bounds + in-round politeness pacing of the HTTP fetcher
(operators/fetch.make_http_fetch_fn), driven at the pandas-batch level —
fetch_fn is a plain generator over pd.DataFrames, so every bound is
testable without a SparkSession. The engine-level routing half (delayed
hosts co-located into one task) is covered in test_engine_http.py."""

import threading
import time

import pandas as pd
import pytest

from weaver_spark.operators.fetch import (
    STATUS_BODY_TOO_LARGE,
    STATUS_CONNECT_FAILED,
    STATUS_UNSUPPORTED_MEDIA,
    make_http_fetch_fn,
)


class _Resp:
    """Minimal urlopen-response stand-in: context manager with status,
    headers (dict with .get), and chunked read."""

    def __init__(self, body: bytes, status=200, headers=None, lie_length=None):
        self._body = body
        self._pos = 0
        self.status = status
        self.headers = dict(headers or {})
        if "Content-Length" not in self.headers:
            self.headers["Content-Length"] = str(
                len(body) if lie_length is None else lie_length
            )

    def read(self, n=None):
        if n is None:
            n = len(self._body)
        out = self._body[self._pos : self._pos + n]
        self._pos += len(out)
        return out

    def __enter__(self):
        return self

    def __exit__(self, *a):
        return False


def _run(fetch_fn, pdf: pd.DataFrame) -> pd.DataFrame:
    return pd.concat(list(fetch_fn(iter([pdf]))), ignore_index=True)


def _pdf(urls, hosts=None, url_types=None, delays=None):
    n = len(urls)
    d = {
        "url": urls,
        "enqueue_seq": list(range(n)),
        "host": hosts or ["h"] * n,
        "url_type": url_types or ["leaf"] * n,
        "depth": [1] * n,
        "_store": [True] * n,
    }
    if delays is not None:
        d["_delay_ms"] = delays
    return pd.DataFrame(d)


def test_body_cap_rejects_oversize_without_buffering():
    reads = []

    class _Counting(_Resp):
        def read(self, n=None):
            out = super().read(n)
            reads.append(len(out))
            return out

    def opener(url, timeout):
        return _Counting(b"x" * (4 << 20), headers={"Content-Length": ""})

    fn = make_http_fetch_fn(None, opener=opener, max_body_bytes=1 << 20)
    res = _run(fn, _pdf(["http://h/a"]))
    assert res["status_code"].tolist() == [STATUS_BODY_TOO_LARGE]
    assert res["bytes"].tolist() == [None]
    # abandoned at the first over-cap chunk, not after buffering 4 MB
    assert sum(reads) <= 2 << 20


def test_body_cap_content_length_fast_reject():
    def opener(url, timeout):
        r = _Resp(b"", headers={"Content-Length": str(10 << 20)})
        r.read = None  # reading would raise — the header must reject first
        return r

    fn = make_http_fetch_fn(None, opener=opener, max_body_bytes=1 << 20)
    res = _run(fn, _pdf(["http://h/a"]))
    assert res["status_code"].tolist() == [STATUS_BODY_TOO_LARGE]


def test_body_cap_dishonest_content_length_still_bounded():
    def opener(url, timeout):
        # header claims 10 bytes; body is 3 MB
        return _Resp(b"y" * (3 << 20), lie_length=10)

    fn = make_http_fetch_fn(None, opener=opener, max_body_bytes=1 << 20)
    res = _run(fn, _pdf(["http://h/a"]))
    assert res["status_code"].tolist() == [STATUS_BODY_TOO_LARGE]


def test_content_type_gate():
    def opener(url, timeout):
        ct = "video/mp4" if url.endswith("/v") else "image/png"
        return _Resp(b"ok", headers={"Content-Type": ct})

    fn = make_http_fetch_fn(
        None, opener=opener, allowed_content_types=("text/", "image/")
    )
    res = _run(fn, _pdf(["http://h/v", "http://h/i"]))
    by_url = dict(zip(res["url"], res["status_code"]))
    assert by_url["http://h/v"] == STATUS_UNSUPPORTED_MEDIA
    assert by_url["http://h/i"] == 200
    # no gate configured -> everything passes (default behavior unchanged)
    fn2 = make_http_fetch_fn(None, opener=opener)
    res2 = _run(fn2, _pdf(["http://h/v"]))
    assert res2["status_code"].tolist() == [200]


def test_connect_failure_status():
    def opener(url, timeout):
        raise OSError("refused")

    fn = make_http_fetch_fn(
        None, opener=opener, max_retries=2, backoff_base_s=0.001
    )
    res = _run(fn, _pdf(["http://h/a"]))
    assert res["status_code"].tolist() == [STATUS_CONNECT_FAILED]


def test_in_batch_pacing_spaces_delayed_host():
    """Rows with _delay_ms > 0 are fetched sequentially per host with
    >= delay between one response and the next request; undelayed rows
    keep pool concurrency and finish without waiting on the paced host."""
    stamps: dict[str, list[float]] = {"slow": [], "fast": []}
    lock = threading.Lock()

    def opener(url, timeout):
        host = url.split("/")[2]
        with lock:
            stamps[host].append(time.monotonic())
        return _Resp(b"ok")

    fn = make_http_fetch_fn(None, opener=opener)
    delay_ms = 120
    urls = [f"http://slow/{i}" for i in range(3)] + [
        f"http://fast/{i}" for i in range(3)
    ]
    pdf = _pdf(
        urls,
        hosts=["slow"] * 3 + ["fast"] * 3,
        delays=[delay_ms] * 3 + [0] * 3,
    )
    t0 = time.monotonic()
    res = _run(fn, pdf)
    assert (res["status_code"] == 200).all()
    gaps = [b - a for a, b in zip(stamps["slow"], stamps["slow"][1:])]
    assert len(gaps) == 2
    assert all(g >= delay_ms / 1000 * 0.95 for g in gaps), gaps
    # the fast host never waited on the slow host's clock
    assert max(stamps["fast"]) - t0 < delay_ms / 1000


def test_pacing_state_spans_batches():
    """The per-host clock persists across Arrow batches within one
    partition: the first row of batch 2 still spaces against the last
    response of batch 1."""
    stamps: list[float] = []

    def opener(url, timeout):
        stamps.append(time.monotonic())
        return _Resp(b"ok")

    fn = make_http_fetch_fn(None, opener=opener)
    delay_ms = 100
    b1 = _pdf(["http://s/1"], hosts=["s"], delays=[delay_ms])
    b2 = _pdf(["http://s/2"], hosts=["s"], delays=[delay_ms])
    res = pd.concat(list(fn(iter([b1, b2]))), ignore_index=True)
    assert (res["status_code"] == 200).all()
    assert stamps[1] - stamps[0] >= delay_ms / 1000 * 0.95
