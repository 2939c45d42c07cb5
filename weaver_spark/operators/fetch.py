"""Fetch + parse + decode as one Arrow-batched ``mapInPandas`` stage.

Reference path being re-expressed (SURVEY.md S5/F4/F5/U1): colly GET with
retry/backoff (``/root/reference/src/scrapper/amazonRootHandler.go:14-26``),
URLType dispatch switch (``src/scrapper/queueService.go:169-197``), CSS
selector field extraction (``neweggProductHandler.go:21-48``), link
extraction with DOM-order caps (``amazonRootHandler.go:33-43``).

Spark-first shape: the scheduler hands this stage a DataFrame of leased
URLs already joined with their page content source; ``mapInPandas``
processes Arrow batches entirely on executors — fetching, dispatching by
url_type, extracting links, decoding image payloads (real PNG/lossy codec
in ``codec.py``), computing phash — and emits one typed result row per
URL. No ``collect()``, no per-row Python UDFs, no driver involvement.

Two fetchers:

- ``synthetic_fetch_fn``: resolves against the closed synthetic web
  (FIXTURES.md §3). Page content (links/image_id/caption/fmt) arrives as
  joined columns; pixels are generated deterministically from image_id on
  the executor and round-tripped through the codec — the decode work is
  real, only the network is simulated.
- ``http_fetch_fn``: a real urllib-based batch fetcher with the
  reference's 5x exponential backoff. Not exercised by tests (the sandbox
  has no network) but shows the production shape: same signature, same
  output schema, swap one function.
"""

from __future__ import annotations

import time
from collections.abc import Iterator

import numpy as np
import pandas as pd

from ..codec import decode_image, phash64
from ..functions.urls import canonicalize_series
from ..schemas import URL_TYPE_ROOT

_FETCH_INPUT_COLS = [
    "url",
    "enqueue_seq",
    "host",
    "url_type",
    "depth",
    "page_kind",
    "page_links",
    "page_image_id",
    "page_fmt",
    "page_caption",
]


def make_synthetic_fetch_fn(k_cap: int | None, seed: int = 42):
    """Build the mapInPandas callable for the synthetic web."""

    def fetch_fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        # heavy imports resolve once per python worker, not per batch
        from ..webgen import gen_payload

        for pdf in batches:
            n = len(pdf)
            out = {
                "url": pdf["url"],
                "enqueue_seq": pdf["enqueue_seq"],
                "host": pdf["host"],
                "url_type": pdf["url_type"],
                "depth": pdf["depth"],
                "status_code": np.where(pdf["page_kind"].notna(), 200, 404).astype(
                    "int32"
                ),
                "links": [None] * n,
                "image_id": [None] * n,
                "bytes": [None] * n,
                "w": [None] * n,
                "h": [None] * n,
                "fmt": [None] * n,
                "caption": [None] * n,
                "phash": [None] * n,
                "bytes_len": np.zeros(n, dtype="int64"),
                "fetch_ms": np.zeros(n, dtype="int64"),
                "final_url": [None] * n,  # the synthetic web never redirects
                "sink": ["m"] * n,
            }
            kinds = pdf["page_kind"].to_numpy(dtype=object)
            links_col = pdf["page_links"].to_numpy(dtype=object)
            image_ids = pdf["page_image_id"].to_numpy(dtype=object)
            captions = pdf["page_caption"].to_numpy(dtype=object)
            # pre-fetch dedup verdict (engine winner anti-join): only
            # winner rows materialize payload bytes — losers are still
            # fetched (status/metrics) but skip generation entirely
            if "_store" in pdf.columns:
                stores = pdf["_store"].eq(True).to_numpy(dtype=bool)
            else:
                stores = np.ones(n, dtype=bool)
            for i in range(n):
                t0 = time.perf_counter()
                kind = kinds[i]
                if kind == "root":
                    links = list(links_col[i]) if links_col[i] is not None else []
                    if k_cap is not None:
                        links = links[:k_cap]
                    out["links"][i] = links
                elif kind == "leaf":
                    iid = image_ids[i]
                    out["image_id"][i] = iid
                    out["caption"][i] = captions[i]
                    if stores[i]:
                        payload, w, h, fmt, ph = gen_payload(iid, seed)
                        out["bytes"][i] = payload
                        out["w"][i] = w
                        out["h"][i] = h
                        out["fmt"][i] = fmt
                        out["phash"][i] = ph
                        out["bytes_len"][i] = len(payload)
                        out["sink"][i] = "p"
                # kind None (404) / "dummy": nothing extracted
                out["fetch_ms"][i] = int((time.perf_counter() - t0) * 1000)
            res = pd.DataFrame(out)
            res["w"] = res["w"].astype("Int32")
            res["h"] = res["h"].astype("Int32")
            # pd.array, NOT astype("Int64"): astype routes object->float64
            # when NULLs are present and rounds int64s above 2^53 — phash
            # values are full-range 64-bit.
            res["phash"] = pd.array(out["phash"], dtype="Int64")
            yield res

    return fetch_fn


# synthetic status codes for locally-rejected responses (>=400 so the
# metrics/failure accounting treats them as failed fetches; none retry —
# retrying an oversize body or a wrong media type returns the same answer)
STATUS_UNSUPPORTED_MEDIA = 597  # Content-Type outside allowed_content_types
STATUS_BODY_TOO_LARGE = 598  # body exceeded max_body_bytes (never buffered)
STATUS_CONNECT_FAILED = 599  # all retries exhausted on socket errors

_READ_CHUNK = 1 << 20  # 1 MiB: bounds slow-loris wall time to cap/chunk*timeout


def make_http_fetch_fn(
    k_cap: int | None,
    link_selector_re: str = r'href="([^"]+)"',
    timeout_s: float = 10.0,
    max_retries: int = 5,
    max_concurrency: int = 16,
    backoff_base_s: float = 1.0,
    opener=None,
    max_body_bytes: int = 64 * 1024 * 1024,
    allowed_content_types: tuple | None = None,
):
    """Production-shaped HTTP fetcher (reference retryVisit semantics:
    5 attempts, 2^i s backoff — ``amazonRootHandler.go:14-26``).

    Network I/O is the one place thread concurrency inside mapInPandas is
    exactly right: each Arrow batch is fetched through a bounded
    ThreadPoolExecutor (``max_concurrency`` sockets per python worker —
    total cluster fan-out = workers x concurrency, which is what the
    per-host politeness scheduler upstream budgets for). HTTP 4xx/5xx are
    responses, not failures (no retry); connection errors retry with the
    reference's 2^i backoff. Parsing: links via a regex dispatch table
    (the CSS-selector analogue, U1 registry), payload pages through the
    image codec. ``opener(url, timeout) -> response`` is injectable so
    tests run against a local http.server without monkeypatching.

    Hostile-web bounds (a 10^10-URL crawl WILL hit all of these):

    - ``max_body_bytes``: bodies are read in 1 MiB chunks and abandoned
      the moment the cap is crossed (status 598) — a multi-GB response
      can never buffer into a python worker, and a slow-loris stream is
      bounded at cap/chunk socket timeouts. Content-Length, when the
      server sends an honest one, rejects before the first byte.
    - ``allowed_content_types``: prefix allowlist (e.g. ``("text/",
      "image/")``) checked against Content-Type BEFORE the body is read
      (status 597). None = no gate.

    In-round politeness pacing: rows arriving with a positive
    ``_delay_ms`` column (robots crawl-delay, carried by apply_robots;
    the engine routes each delayed host into a single task) are fetched
    SEQUENTIALLY per host with >= delay_ms between one response and the
    next request — the per-round cap bounds volume, this bounds rate.
    Undelayed rows keep full pool concurrency.
    """
    import re
    import urllib.error
    import urllib.request
    from concurrent.futures import ThreadPoolExecutor

    link_re = re.compile(link_selector_re)
    _open = opener or (
        lambda url, timeout: urllib.request.urlopen(url, timeout=timeout)
    )

    def fetch_one(url: str) -> tuple[int, bytes, int, str]:
        """(status, body, ms, final_url) — final_url is the POST-redirect
        URL (urllib follows 3xx silently; ``r.geturl()`` exposes where
        the response actually came from). Payload keys and link
        resolution must use it: two request URLs 301-ing to one target
        are ONE payload, and relative hrefs resolve against the final
        base, not the pre-redirect one."""
        t0 = time.perf_counter()

        def ms() -> int:
            return int((time.perf_counter() - t0) * 1000)

        for attempt in range(max_retries):
            try:
                with _open(url, timeout_s) as r:
                    final = url
                    geturl = getattr(r, "geturl", None)
                    if callable(geturl):
                        final = geturl() or url
                    headers = getattr(r, "headers", None)
                    if allowed_content_types is not None:
                        ctype = (
                            (headers.get("Content-Type") or "").lower()
                            if headers is not None
                            else ""
                        )
                        if not any(
                            ctype.startswith(p) for p in allowed_content_types
                        ):
                            return STATUS_UNSUPPORTED_MEDIA, b"", ms(), final
                    clen = (
                        headers.get("Content-Length")
                        if headers is not None
                        else None
                    )
                    if clen is not None:
                        try:
                            if int(clen) > max_body_bytes:
                                return STATUS_BODY_TOO_LARGE, b"", ms(), final
                        except ValueError:
                            pass  # dishonest header: the chunk loop decides
                    chunks: list[bytes] = []
                    total = 0
                    while True:
                        c = r.read(_READ_CHUNK)
                        if not c:
                            break
                        total += len(c)
                        if total > max_body_bytes:
                            return STATUS_BODY_TOO_LARGE, b"", ms(), final
                        chunks.append(c)
                    return r.status, b"".join(chunks), ms(), final
            except urllib.error.HTTPError as e:
                # a status line IS an answer — 404 is not a flaky socket
                return e.code, b"", ms(), url
            except Exception:
                if attempt == max_retries - 1:
                    break
                time.sleep(min(backoff_base_s * (2.0**attempt), 30.0))
        return STATUS_CONNECT_FAILED, b"", ms(), url

    def fetch_fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        # per-partition pacing state: last response-completion time per
        # delayed host. The engine's (host, 0)-salted routing puts ALL of
        # a delayed host's rows in this partition, so this dict is the
        # host's single authoritative clock for the round.
        last_done: dict[str, float] = {}

        def paced_fetch(host: str, idxs: list, delay_s: float, urls: list):
            out = []
            for i in idxs:
                wait = last_done.get(host, float("-inf")) + delay_s - time.monotonic()
                if wait > 0:
                    time.sleep(wait)
                r = fetch_one(urls[i])
                last_done[host] = time.monotonic()
                out.append((i, r))
            return out

        with ThreadPoolExecutor(max_workers=max_concurrency) as pool:
            for pdf in batches:
                n = len(pdf)
                urls = pdf["url"].tolist()
                url_types = pdf["url_type"].tolist()
                if "_delay_ms" in pdf.columns:
                    delays = (
                        pd.to_numeric(pdf["_delay_ms"], errors="coerce")
                        .fillna(0)
                        .to_numpy()
                    )
                else:
                    delays = None
                if delays is None or not (delays > 0).any():
                    fetched = list(pool.map(fetch_one, urls))
                else:
                    hosts = pdf["host"].tolist()
                    per_host: dict[str, list] = {}
                    plain: list[int] = []
                    for i in range(n):
                        if delays[i] > 0:
                            per_host.setdefault(hosts[i], []).append(i)
                        else:
                            plain.append(i)
                    futs = [
                        pool.submit(lambda i=i: (i, fetch_one(urls[i])))
                        for i in plain
                    ]
                    pfuts = [
                        pool.submit(
                            paced_fetch,
                            h,
                            idxs,
                            float(delays[idxs[0]]) / 1000.0,
                            urls,
                        )
                        for h, idxs in per_host.items()
                    ]
                    fetched = [None] * n
                    for f in futs:
                        i, r = f.result()
                        fetched[i] = r
                    for f in pfuts:
                        for i, r in f.result():
                            fetched[i] = r
                # canonical post-redirect URLs, vectorized once per batch
                # (same canonicalizer as enqueue time, so a final URL and
                # its enqueued spelling can never disagree)
                finals = list(
                    canonicalize_series(pd.Series([f for _, _, _, f in fetched]))
                )
                out = {
                    "url": pdf["url"],
                    "enqueue_seq": pdf["enqueue_seq"],
                    "host": pdf["host"],
                    "url_type": pdf["url_type"],
                    "depth": pdf["depth"],
                    "status_code": np.array(
                        [s for s, _, _, _ in fetched], dtype="int32"
                    ),
                    "links": [None] * n,
                    "image_id": [None] * n,
                    "bytes": [None] * n,
                    "w": [None] * n,
                    "h": [None] * n,
                    "fmt": [None] * n,
                    "caption": [None] * n,
                    "phash": [None] * n,
                    "bytes_len": np.zeros(n, dtype="int64"),
                    "fetch_ms": np.array(
                        [ms for _, _, ms, _ in fetched], dtype="int64"
                    ),
                    "final_url": finals,
                    "sink": ["m"] * n,
                }
                if "_store" in pdf.columns:
                    stores = pdf["_store"].eq(True).to_numpy(dtype=bool)
                else:
                    stores = np.ones(n, dtype=bool)
                for i, (status, body, _ms, _f) in enumerate(fetched):
                    if status != 200:
                        continue
                    if url_types[i] == URL_TYPE_ROOT:
                        links = link_re.findall(body.decode("utf-8", "replace"))
                        if k_cap is not None:
                            links = links[:k_cap]
                        out["links"][i] = links
                    else:
                        # payload key = the canonical FINAL url: request
                        # spellings that 301 to one target share one key
                        out["image_id"][i] = finals[i]
                        if not stores[i]:
                            continue  # dedup loser: fetched, not stored
                        out["bytes"][i] = body
                        out["bytes_len"][i] = len(body)
                        out["sink"][i] = "p"
                        try:
                            px = decode_image(body)
                            h_, w_ = px.shape[:2]
                            out["w"][i] = w_
                            out["h"][i] = h_
                            out["fmt"][i] = "png"
                            out["phash"][i] = phash64(px)
                        except Exception:
                            out["fmt"][i] = "raw"
                res = pd.DataFrame(out)
                res["w"] = res["w"].astype("Int32")
                res["h"] = res["h"].astype("Int32")
                res["phash"] = pd.array(out["phash"], dtype="Int64")
                yield res

    return fetch_fn
