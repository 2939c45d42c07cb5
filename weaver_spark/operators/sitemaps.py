"""Sitemap ingestion: robots.txt ``Sitemap:`` URLs -> frontier seeds.

For a production frontier the sitemap protocol (sitemaps.org) is the
highest-volume LEGITIMATE seed source — hosts advertise up to 50k URLs
per sitemap file and fan out through sitemap-index files. The reference
never ingests sitemaps (its seeds are a typed client list,
``/root/reference/src/client/main.go:90-110``); this is a north-rule
upgrade alongside robots enforcement.

Shape: fetching one host's sitemap tree is small sequential I/O, so the
unit is ``fetch_sitemap_urls`` (one tree, bounded everywhere); the
scale path is ``fetch_sitemap_urls_df`` — an Arrow-batched
``mapInPandas`` over (host, sitemap_url) rows where each executor
expands its trees locally and emits (host, url) rows, zero driver
traffic. Both paths share the same bounded reader:

- body reads are chunk-capped (``max_body_bytes``, decompressed — gzip
  bombs trip the cap, never buffer), via the fetch stage's
  ``read_body_capped`` plus a magic-byte gunzip for ``.xml.gz`` bodies
  served without Content-Encoding;
- tree walks are capped by ``max_depth`` (index->index recursion),
  ``max_sitemaps`` (files fetched per tree) and ``max_urls``
  (<loc> entries kept) — a hostile or broken index can never expand
  unboundedly.
"""

from __future__ import annotations

import re
import time
from html import unescape

from ..operators.fetch import read_body_capped

SITEMAP_MAX_BODY_BYTES = 16 * 1024 * 1024  # sitemaps.org caps files at 50 MB

_LOC_RE = re.compile(r"<loc>\s*(.*?)\s*</loc>", re.IGNORECASE | re.DOTALL)
_GZIP_MAGIC = b"\x1f\x8b"


def _maybe_gunzip(body: bytes, max_bytes: int) -> bytes | None:
    """Gunzip a .xml.gz body served as opaque bytes (no
    Content-Encoding), output-capped; None = bomb/corrupt."""
    if not body.startswith(_GZIP_MAGIC):
        return body
    import zlib

    gz = zlib.decompressobj(16 + zlib.MAX_WBITS)
    try:
        out = gz.decompress(body, max_bytes + 1)
    except zlib.error:
        return None
    if gz.unconsumed_tail or len(out) > max_bytes:
        return None
    return out


def parse_sitemap(text: str) -> tuple[str, list[str]]:
    """(kind, locs): kind = 'index' for a <sitemapindex> document (its
    locs are child sitemap URLs) else 'urlset' (locs are page URLs).
    Regex-based on purpose: real-web sitemap XML is frequently invalid
    (stray ampersands, BOMs, truncation) and a parse error must never
    zero a host's seeds; <loc> extraction with entity unescape is the
    robust floor."""
    head = text[:2048].lower()
    kind = "index" if "<sitemapindex" in head else "urlset"
    return kind, [unescape(m.group(1)) for m in _LOC_RE.finditer(text)]


def _fetch_one_sitemap(
    url: str, timeout_s: float, opener, max_body_bytes: int
) -> str | None:
    """One bounded sitemap body as text, or None (unreachable / non-200
    / over-cap — a missing sitemap never fails the ingest)."""
    import urllib.request

    _open = opener or (
        lambda u, timeout: urllib.request.urlopen(u, timeout=timeout)
    )
    try:
        with _open(url, timeout_s) as r:
            if getattr(r, "status", 200) != 200:
                return None
            body, ok = read_body_capped(r, max_body_bytes)
            if not ok:
                return None
    except Exception:
        return None
    body = _maybe_gunzip(body, max_body_bytes)
    if body is None:
        return None
    return body.decode("utf-8", "replace")


def fetch_sitemap_urls(
    sitemap_urls: list[str],
    timeout_s: float = 10.0,
    opener=None,
    max_depth: int = 2,
    max_sitemaps: int = 1000,
    max_urls: int = 500_000,
    max_body_bytes: int = SITEMAP_MAX_BODY_BYTES,
    delay_s: float = 0.0,
) -> list[str]:
    """Expand sitemap trees (following <sitemapindex> children up to
    ``max_depth`` levels past the roots) into a deduped, order-
    preserving page-URL list. Every axis is bounded; ``delay_s`` spaces
    consecutive fetches for politeness when a tree is large."""
    out: list[str] = []
    seen_pages: set[str] = set()
    visited: set[str] = set()
    frontier = [(u, 0) for u in sitemap_urls]
    fetched = 0
    while frontier:
        url, depth = frontier.pop(0)
        if url in visited or fetched >= max_sitemaps:
            continue
        visited.add(url)
        if fetched and delay_s > 0:
            time.sleep(delay_s)
        text = _fetch_one_sitemap(url, timeout_s, opener, max_body_bytes)
        fetched += 1
        if text is None:
            continue
        kind, locs = parse_sitemap(text)
        if kind == "index":
            if depth < max_depth:
                frontier.extend((c, depth + 1) for c in locs)
            continue
        for loc in locs:
            if loc not in seen_pages:
                seen_pages.add(loc)
                out.append(loc)
                if len(out) >= max_urls:
                    return out
    return out


def fetch_sitemap_urls_df(
    sites_df,
    timeout_s: float = 10.0,
    opener=None,
    max_depth: int = 2,
    max_sitemaps: int = 1000,
    max_urls: int = 500_000,
    max_body_bytes: int = SITEMAP_MAX_BODY_BYTES,
):
    """Distributed tree expansion — the 10^7-host shape: input rows
    (host, sitemap), output rows (host, url). Each Arrow batch expands
    its trees locally with the same bounds as the driver-side variant
    (caps apply PER TREE); ``opener`` must be picklable (module-level)
    — None uses urllib."""
    import pandas as pd

    def expand(batches):
        for pdf in batches:
            hosts: list[str] = []
            urls: list[str] = []
            for host, sm in zip(pdf["host"], pdf["sitemap"]):
                got = fetch_sitemap_urls(
                    [sm],
                    timeout_s=timeout_s,
                    opener=opener,
                    max_depth=max_depth,
                    max_sitemaps=max_sitemaps,
                    max_urls=max_urls,
                    max_body_bytes=max_body_bytes,
                )
                hosts.extend([host] * len(got))
                urls.extend(got)
            yield pd.DataFrame({"host": hosts, "url": urls})

    return sites_df.select("host", "sitemap").mapInPandas(
        expand, "host string, url string"
    )
