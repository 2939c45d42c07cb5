"""RFC 9309 robots group matching + bounded robots-body reads
(VERDICT r4 #3): most-specific User-agent group selection for a
configurable product token, wildcard fallback, same-token group
merging, and the 500 KiB chunk-capped body read that mirrors the
payload fetcher's hostile-web discipline (no SparkSession needed —
parsing and fetching are plain Python)."""

from weaver_spark.operators.robots import (
    ROBOTS_MAX_BODY_BYTES,
    _fetch_one_robots,
    parse_robots_txt,
)

TXT = (
    "User-agent: megabot\n"
    "Disallow: /mega/\n"
    "Crawl-delay: 2\n"
    "\n"
    "User-agent: mega\n"
    "Disallow: /m/\n"
    "\n"
    "User-agent: *\n"
    "Disallow: /all/\n"
    "Allow: /all/pub/\n"
    "Crawl-delay: 1\n"
)


def test_default_agent_keeps_wildcard_behavior():
    dis, delay, alw = parse_robots_txt(TXT)
    assert dis == ["/all/"] and alw == ["/all/pub/"] and delay == 1000


def test_most_specific_group_wins():
    # product token "megabot-images/1.0" -> longest matching prefix is
    # "megabot" (7) over "mega" (4); wildcard rules are REPLACED
    dis, delay, alw = parse_robots_txt(TXT, agent="megabot-images")
    assert dis == ["/mega/"] and delay == 2000 and alw == []


def test_prefix_needs_word_boundary():
    # 'mega' must NOT capture 'megacrawler' (alphanumeric continuation):
    # the product falls through to the wildcard group. A one-letter
    # token can never capture every bot sharing its initial.
    dis, delay, alw = parse_robots_txt(TXT, agent="megacrawler")
    assert dis == ["/all/"] and delay == 1000
    txt = "User-agent: b\nDisallow: /b/\n\nUser-agent: *\nDisallow: /w/\n"
    assert parse_robots_txt(txt, agent="bingbot")[0] == ["/w/"]


def test_shorter_specific_token_matches_at_boundary():
    # 'mega' DOES govern 'mega-images/1.0' (separator boundary) when no
    # longer token matches
    dis, delay, alw = parse_robots_txt(TXT, agent="mega-images")
    assert dis == ["/m/"] and delay == 0


def test_unmatched_agent_falls_back_to_wildcard():
    dis, delay, alw = parse_robots_txt(TXT, agent="otherbot")
    assert dis == ["/all/"] and alw == ["/all/pub/"] and delay == 1000


def test_matching_is_case_insensitive():
    dis, _, _ = parse_robots_txt(TXT, agent="MegaBot")
    assert dis == ["/mega/"]


def test_same_token_groups_merge():
    txt = (
        "User-agent: bot\nDisallow: /a/\n\n"
        "User-agent: bot\nDisallow: /b/\nAllow: /b/pub/\n"
    )
    dis, _, alw = parse_robots_txt(txt, agent="bot")
    assert dis == ["/a/", "/b/"] and alw == ["/b/pub/"]


def test_grouped_agents_specific_and_wildcard_together():
    # one UA run naming both * and a specific token: the group serves
    # both audiences; a matching product token selects it exclusively
    txt = (
        "User-agent: bot\nUser-agent: *\nDisallow: /shared/\n\n"
        "User-agent: other\nDisallow: /other/\n"
    )
    assert parse_robots_txt(txt, agent="bot")[0] == ["/shared/"]
    assert parse_robots_txt(txt)[0] == ["/shared/"]
    assert parse_robots_txt(txt, agent="other")[0] == ["/other/"]


def test_rules_before_any_group_are_ignored():
    txt = "Disallow: /stray/\nUser-agent: *\nDisallow: /real/\n"
    assert parse_robots_txt(txt)[0] == ["/real/"]


class _Resp:
    def __init__(self, body: bytes, status=200):
        self._body = body
        self._pos = 0
        self.status = status
        self.reads: list[int] = []

    def read(self, n=None):
        if n is None:
            n = len(self._body)
        out = self._body[self._pos : self._pos + n]
        self._pos += len(out)
        self.reads.append(len(out))
        return out

    def __enter__(self):
        return self

    def __exit__(self, *a):
        return False


def test_robots_body_read_is_capped():
    """A multi-MB robots.txt never buffers past the RFC 9309 500 KiB
    cap, and rules inside the cap still parse."""
    head = b"User-agent: *\nDisallow: /blocked/\n"
    body = head + b"# padding line of some length 0123456789\n" * 200_000  # ~8 MB
    resp = _Resp(body)
    host, dis, delay, alw, _sm = _fetch_one_robots(
        "h.test", "http://h.test", 5.0, lambda url, t: resp
    )
    assert dis == ["/blocked/"]
    assert sum(resp.reads) <= ROBOTS_MAX_BODY_BYTES + (64 * 1024)


def test_truncation_drops_partial_last_line():
    """A rule line split by the cap must NOT mint a shorter (broader)
    Disallow prefix than the site wrote."""
    filler = b"# x\n" * ((ROBOTS_MAX_BODY_BYTES - 20) // 4)
    body = b"User-agent: *\n" + filler + b"Disallow: /private-stuff-very-long/\n"
    resp = _Resp(body)
    _, dis, _, _, _ = _fetch_one_robots(
        "h.test", "http://h.test", 5.0, lambda url, t: resp
    )
    # the split line is dropped entirely, not parsed as a prefix of itself
    assert all(p == "/private-stuff-very-long/" for p in dis)


def test_body_exactly_at_cap_is_not_truncated():
    """A robots.txt of exactly the cap size is COMPLETE: its final line
    must parse (the old >= check dropped it — ADVICE r5)."""
    rule = b"Disallow: /exact-cap-rule/\n"
    pad = ROBOTS_MAX_BODY_BYTES - len(b"User-agent: *\n") - len(rule)
    body = b"User-agent: *\n" + b"#" * (pad - 1) + b"\n" + rule
    assert len(body) == ROBOTS_MAX_BODY_BYTES
    resp = _Resp(body)
    _, dis, _, _, _ = _fetch_one_robots(
        "h.test", "http://h.test", 5.0, lambda url, t: resp
    )
    assert dis == ["/exact-cap-rule/"]


def test_fetch_one_passes_agent_through():
    body = TXT.encode()
    resp = _Resp(body)
    _, dis, delay, _, _ = _fetch_one_robots(
        "h.test", "http://h.test", 5.0, lambda url, t: resp, agent="megabot"
    )
    assert dis == ["/mega/"] and delay == 2000


def test_non_200_and_error_mean_no_restrictions():
    assert _fetch_one_robots(
        "h.test", "http://h.test", 5.0, lambda url, t: _Resp(b"", status=404)
    ) == ("h.test", [], 0, [], [])

    def boom(url, t):
        raise OSError("refused")

    assert _fetch_one_robots("h.test", "http://h.test", 5.0, boom) == (
        "h.test",
        [],
        0,
        [],
        [],
    )


def test_sitemap_lines_are_global_and_deduped():
    from weaver_spark.operators.robots import parse_robots_sitemaps

    txt = (
        "Sitemap: https://h.test/sm-top.xml\n"
        "User-agent: megabot\nDisallow: /m/\n"
        "Sitemap: https://h.test/sm-a.xml.gz\n"
        "User-agent: *\nDisallow: /x/\n"
        "sitemap: https://h.test/sm-top.xml\n"  # dup, case-insensitive key
    )
    assert parse_robots_sitemaps(txt) == [
        "https://h.test/sm-top.xml",
        "https://h.test/sm-a.xml.gz",
    ]
    # and the fetch path carries them through regardless of agent group
    resp = _Resp(txt.encode())
    _, _, _, _, sm = _fetch_one_robots(
        "h.test", "http://h.test", 5.0, lambda url, t: resp, agent="megabot"
    )
    assert sm == ["https://h.test/sm-top.xml", "https://h.test/sm-a.xml.gz"]
