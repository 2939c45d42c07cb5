"""Pure-Python reference simulator — the crawl-semantics oracle.

Implements exactly the behavioral semantics extracted from the reference
in SURVEY.md §0.1:

- single logical frontier, strict FIFO by enqueue order
  (``/root/reference/src/queue/main.go:31-61``: Put appends to an order
  slice, Pop returns the first visible message),
- NO URL-seen set in the frontier — a URL enqueued twice is fetched twice
  (``src/queue/main.go:31-45`` does no dedup),
- ack-on-pop / at-most-once (``src/scrapper/queueService.go:91-94``),
- dispatch by URL type: root pages yield ≤k_cap links re-enqueued in DOM
  order (``amazonRootHandler.go:33-43`` caps 3, ``neweggRootHandler.go:19-24``
  caps 6 — here the cap is a parameter applied identically in the Spark
  engine), leaf pages yield one payload, dummy yields nothing
  (``src/scrapper/queueService.go:169-197``),
- storage dedup by payload key only: first write wins, later writes are
  "Already Replicated" no-ops (``src/storage/main.go:146-151``).

The loop is structured wave-by-wave (a wave = everything currently in the
queue). With no politeness budget this is provably identical to the
reference's one-at-a-time FIFO pop: children always enqueue behind every
queued item, so pop order is wave-major, and within a wave it is enqueue
order. Waves exist so the politeness upgrade (absent in the reference,
demanded by the north rule) has one shared definition with the Spark
round engine: per host, at most `host_budget` fetches per wave, lowest
enqueue_seq first; over-budget URLs keep their seq and defer to the next
wave.

~150 LoC, no Spark.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from .functions.urls import canonicalize_url
from .operators.robots import sim_is_disallowed
from .webgen import SyntheticWeb, gen_payload


@dataclass
class SimResult:
    crawl_order: list[str] = field(default_factory=list)  # canonical urls, pop order
    enqueue_log: list[str] = field(default_factory=list)  # canonical urls, put order
    seen_set: set[str] = field(default_factory=set)  # stored payload keys
    stored: dict[str, dict] = field(default_factory=dict)  # image_id -> row
    statuses: list[tuple[int, str, str]] = field(default_factory=list)
    # (enqueue_seq, url, final status)
    rounds: list[list[str]] = field(default_factory=list)  # urls per wave
    blocked: set[str] = field(default_factory=set)  # robots-disallowed urls


def simulate_crawl(
    web: SyntheticWeb,
    k_cap: int | None = None,
    host_budget: int | None = None,
    robots: dict | None = None,
    max_rounds: int = 10_000,
    priority_mode: str = "kind",
    retry_failed: int = 0,
    max_depth: int | None = None,
) -> SimResult:
    """Run the reference-semantics crawl to frontier exhaustion.

    ``robots`` (operators/robots.sim_robots_config shape: host ->
    {"disallow": [path prefixes], "allow": [path prefixes],
    "delay_cap": int|None}) mirrors the engine's broadcast robots
    enforcement: disallowed URLs (longest-match vs Allow, ties to Allow)
    leave the frontier un-fetched; delay_cap bounds per-host fetches per
    wave and
    composes with host_budget via min. Budget selection follows the
    engine's scheduler order (priority DESC, enqueue_seq) where a URL's
    priority is 1 for root pages, else 0; fetch/enqueue order within a
    wave stays enqueue_seq (the engine enqueues children by parent seq).

    ``retry_failed=N`` mirrors the engine flag: a failed fetch (missing
    page — the sim's one transient failure) is re-enqueued as a NEW
    event with attempt+1, at the failure's position in the put loop
    (exactly where a root's links would land), until N retries are
    spent. The failed attempt's status row stays 'failed'.

    ``max_depth=D`` mirrors the engine's depth guard: links that would
    enqueue at depth > D are never put (their parent is still fetched).
    """
    res = SimResult()
    next_seq = 0
    # (enqueue_seq, canonical url, depth, attempt)
    wave: list[tuple[int, str, int, int]] = []

    def put(url: str, into: list, depth: int, attempt: int = 0) -> None:
        nonlocal next_seq
        cu = canonicalize_url(url)
        into.append((next_seq, cu, depth, attempt))
        res.enqueue_log.append(cu)
        next_seq += 1

    def prio(url: str, depth: int) -> int:
        # one derivation rule, two engines: mirrors engine._priority_expr
        if priority_mode == "depth":
            return max(0, 4 - depth)
        page = web.pages.get(url)
        return 1 if page is not None and page["kind"] == "root" else 0

    for s in web.seeds:
        put(s, wave, 0)

    rounds = 0
    while wave and rounds < max_rounds:
        rounds += 1
        wave.sort(key=lambda t: t[0])  # FIFO within the wave
        if robots:
            kept = []
            for seq, url, depth, att in wave:
                host = url.split("://", 1)[1].split("/", 1)[0]
                # parse_url(url,'PATH') parity: path only, no query string
                path = "/" + (url.split("://", 1)[1].split("/", 1) + [""])[1]
                path = path.split("?", 1)[0]
                cfg = robots.get(host)
                if sim_is_disallowed(path, cfg):
                    res.blocked.add(url)
                    res.statuses.append((seq, url, "blocked"))
                else:
                    kept.append((seq, url, depth, att))
            wave = kept
        spend: dict[str, int] = {}
        process: list[tuple[int, str, int, int]] = []
        defer: list[tuple[int, str, int, int]] = []
        # selection in scheduler order: (priority DESC, enqueue_seq)
        for seq, url, depth, att in sorted(
            wave, key=lambda t: (-prio(t[1], t[2]), t[0])
        ):
            host = url.split("://", 1)[1].split("/", 1)[0]
            cap = host_budget
            if robots and host in robots and robots[host]["delay_cap"] is not None:
                dcap = robots[host]["delay_cap"]
                cap = dcap if cap is None else min(cap, dcap)
            if cap is not None and spend.get(host, 0) >= cap:
                defer.append((seq, url, depth, att))  # keeps its enqueue_seq
            else:
                spend[host] = spend.get(host, 0) + 1
                process.append((seq, url, depth, att))
        process.sort(key=lambda t: t[0])  # fetch/enqueue in FIFO seq order
        defer.sort(key=lambda t: t[0])
        next_wave: list[tuple[int, str, int, int]] = []
        round_urls: list[str] = []
        for seq, url, depth, att in process:  # Pop + immediate Ack (at-most-once)
            res.crawl_order.append(url)
            round_urls.append(url)
            page = web.pages.get(url)
            if page is None:
                res.statuses.append((seq, url, "failed"))
                if att < retry_failed:  # bounded re-enqueue, attempt+1
                    put(url, next_wave, depth, att + 1)
                continue
            kind = page["kind"]
            if kind == "root":
                links = page["links"]
                if k_cap is not None:
                    links = links[:k_cap]
                if max_depth is not None and depth >= max_depth:
                    links = []  # depth guard: children would exceed cap
                for link in links:  # DOM order preserved
                    put(link, next_wave, depth + 1)
            elif kind == "leaf":
                image_id = page["image_id"]
                if image_id not in res.seen_set:  # storage dedup, first wins
                    payload, w, h, fmt, ph = gen_payload(image_id, web.seed)
                    res.seen_set.add(image_id)
                    res.stored[image_id] = {
                        "image_id": image_id,
                        "bytes": payload,
                        "w": w,
                        "h": h,
                        "fmt": fmt,
                        "caption": page["caption"],
                        "phash": ph,
                    }
            res.statuses.append((seq, url, "done"))
        res.rounds.append(round_urls)
        wave = defer + next_wave
    return res


def gather(res: SimResult) -> list[dict]:
    """Reference `gather`: merge all stored products, first-wins by key
    (``/root/reference/src/client/main.go:176-192``)."""
    return sorted(res.stored.values(), key=lambda r: r["image_id"])
