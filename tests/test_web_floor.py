"""Real-web HTML/transport floor (VERDICT r5 #3/#4): permissive href
forms, <base href>, charset sniffing, Content-Encoding: gzip with a
zip-bomb-safe decompressed-byte cap, and sitemap XML parsing. Batch- and
function-level (no SparkSession)."""

import gzip

import pandas as pd

from weaver_spark.operators.fetch import (
    STATUS_BODY_TOO_LARGE,
    decode_html_body,
    extract_links,
    make_http_fetch_fn,
    read_body_capped,
)
from weaver_spark.operators.sitemaps import (
    _maybe_gunzip,
    fetch_sitemap_urls,
    parse_sitemap,
)


class _Resp:
    def __init__(self, body: bytes, status=200, headers=None):
        self._body = body
        self._pos = 0
        self.status = status
        self.headers = dict(headers or {})
        self.headers.setdefault("Content-Length", str(len(body)))

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


def _run(fetch_fn, pdf):
    return pd.concat(list(fetch_fn(iter([pdf]))), ignore_index=True)


def _pdf(urls, url_types=None):
    n = len(urls)
    return pd.DataFrame(
        {
            "url": urls,
            "enqueue_seq": list(range(n)),
            "host": ["h"] * n,
            "url_type": url_types or ["root"] * n,
            "depth": [0] * n,
            "_store": [True] * n,
        }
    )


# ---- href extraction floor -------------------------------------------------


def test_extract_links_attribute_forms():
    html = (
        '<a href="/dq">d</a> '
        "<a href='/sq'>s</a> "
        "<a href=/uq>u</a> "
        '<a href="#frag">skip</a> '
        '<a href="javascript:void(0)">skip</a> '
        '<a href="mailto:x@y.z">skip</a>'
    )
    assert extract_links(html, "http://h.test/p", None) == ["/dq", "/sq", "/uq"]


def test_extract_links_base_href():
    # <base href> resolves against the page URL, then every href
    # resolves against that base (HTML spec); absolute hrefs unchanged
    html = (
        '<head><base href="/deep/sub/"></head>'
        '<a href="x.png">r</a> <a href="/abs">a</a> '
        '<a href="http://other.test/z">o</a>'
    )
    assert extract_links(html, "http://h.test/page", None) == [
        "http://h.test/deep/sub/x.png",
        "http://h.test/abs",
        "http://other.test/z",
    ]


def test_extract_links_k_cap():
    html = "".join(f'<a href="/l{i}">x</a>' for i in range(10))
    assert extract_links(html, None, 3) == ["/l0", "/l1", "/l2"]


def test_custom_selector_regex_still_wins():
    """A registered site handler's selector regex (U1 registry) keeps
    legacy semantics: findall group 1, no base resolution."""

    def opener(url, timeout):
        return _Resp(b'<a href="/a">x</a> <a href=\'/b\'>y</a>')

    fn = make_http_fetch_fn(None, opener=opener, link_selector_re=r'href="([^"]+)"')
    out = _run(fn, _pdf(["http://h.test/p"]))
    assert list(out["links"][0]) == ["/a"]  # single-quoted NOT matched


# ---- charset -----------------------------------------------------------------


def test_charset_from_content_type_header():
    body = "<a href='/é'>café</a>".encode("iso-8859-1")
    text = decode_html_body(body, "text/html; charset=ISO-8859-1")
    assert "café" in text and "/é" in text


def test_charset_from_meta_sniff():
    body = b'<head><meta charset="iso-8859-1"></head>' + "caf\xe9".encode(
        "iso-8859-1"
    )
    assert "café" in decode_html_body(body, "text/html")


def test_charset_garbage_label_falls_back():
    assert decode_html_body(b"abc", "text/html; charset=not-a-charset") == "abc"


# ---- gzip transport ---------------------------------------------------------


def test_gzip_body_is_decompressed():
    plain = b'<a href="/x">x</a>' * 100
    gz = gzip.compress(plain)

    def opener(url, timeout, headers):
        assert headers.get("Accept-Encoding") == "gzip"
        return _Resp(gz, headers={"Content-Encoding": "gzip"})

    fn = make_http_fetch_fn(None, opener=opener)
    out = _run(fn, _pdf(["http://h.test/p"]))
    assert out["status_code"][0] == 200
    assert len(out["links"][0]) == 100


def test_gzip_bomb_trips_cap_on_decompressed_bytes():
    # ~100 KB compressed -> 100 MB decompressed: the DECOMPRESSED count
    # must trip the 1 MiB cap; buffering anywhere near 100 MB is a bug
    bomb = gzip.compress(b"\0" * (100 << 20))
    assert len(bomb) < (1 << 20)

    def opener(url, timeout, headers):
        return _Resp(bomb, headers={"Content-Encoding": "gzip"})

    fn = make_http_fetch_fn(None, opener=opener, max_body_bytes=1 << 20)
    out = _run(fn, _pdf(["http://h.test/p"], url_types=["leaf"]))
    assert out["status_code"][0] == STATUS_BODY_TOO_LARGE
    assert out["bytes"][0] is None


def test_gzip_corrupt_stream_rejected():
    def opener(url, timeout, headers):
        return _Resp(b"not gzip at all", headers={"Content-Encoding": "gzip"})

    fn = make_http_fetch_fn(None, opener=opener)
    out = _run(fn, _pdf(["http://h.test/p"]))
    assert out["status_code"][0] == STATUS_BODY_TOO_LARGE


def test_read_body_capped_plain_unchanged():
    body, ok = read_body_capped(_Resp(b"hello"), 1 << 20)
    assert ok and body == b"hello"


# ---- sitemap parsing ---------------------------------------------------------

SM_INDEX = b"""<?xml version="1.0" encoding="UTF-8"?>
<sitemapindex xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">
  <sitemap><loc>http://h.test/sm-a.xml</loc></sitemap>
  <sitemap><loc>http://h.test/sm-b.xml.gz</loc></sitemap>
</sitemapindex>"""

SM_A = b"""<urlset><url><loc>http://h.test/p1</loc></url>
<url><loc> http://h.test/p2?a=1&amp;b=2 </loc></url></urlset>"""

SM_B = b"<urlset><url><loc>http://h.test/p3</loc></url></urlset>"


def test_parse_sitemap_kinds_and_entities():
    kind, locs = parse_sitemap(SM_INDEX.decode())
    assert kind == "index" and len(locs) == 2
    kind, locs = parse_sitemap(SM_A.decode())
    assert kind == "urlset"
    assert locs == ["http://h.test/p1", "http://h.test/p2?a=1&b=2"]


def test_maybe_gunzip_magic_and_bomb():
    assert _maybe_gunzip(gzip.compress(SM_B), 1 << 20) == SM_B
    assert _maybe_gunzip(SM_B, 1 << 20) == SM_B  # not gzipped: passthrough
    assert _maybe_gunzip(gzip.compress(b"\0" * (8 << 20)), 1 << 20) is None


def test_fetch_sitemap_urls_expands_index_with_gz_child():
    pages = {
        "http://h.test/sm-top.xml": SM_INDEX,
        "http://h.test/sm-a.xml": SM_A,
        "http://h.test/sm-b.xml.gz": gzip.compress(SM_B),
    }

    def opener(url, timeout):
        return _Resp(pages[url])

    got = fetch_sitemap_urls(["http://h.test/sm-top.xml"], opener=opener)
    assert got == [
        "http://h.test/p1",
        "http://h.test/p2?a=1&b=2",
        "http://h.test/p3",
    ]


def test_fetch_sitemap_bounds():
    # self-referencing index: max_depth/max_sitemaps stop the walk
    loop = b"<sitemapindex><sitemap><loc>http://h.test/loop.xml</loc></sitemap></sitemapindex>"

    def opener(url, timeout):
        return _Resp(loop)

    assert fetch_sitemap_urls(["http://h.test/loop.xml"], opener=opener) == []

    # max_urls truncates deterministically
    many = ("<urlset>" + "".join(
        f"<url><loc>http://h.test/p{i}</loc></url>" for i in range(100)
    ) + "</urlset>").encode()

    def opener2(url, timeout):
        return _Resp(many)

    got = fetch_sitemap_urls(
        ["http://h.test/sm.xml"], opener=opener2, max_urls=7
    )
    assert got == [f"http://h.test/p{i}" for i in range(7)]
