#!/usr/bin/env python
"""spark-submit entry point for the crawl engine (north-rule deployment
shape: ``spark-submit --py-files weaver_spark.zip scripts/crawl_job.py``).

Package and submit:

    cd /root/repo && zip -qr /tmp/weaver_spark.zip weaver_spark
    spark-submit --master <cluster> \
        --py-files /tmp/weaver_spark.zip \
        --conf spark.sql.adaptive.enabled=true \
        --conf spark.sql.execution.arrow.pyspark.enabled=true \
        scripts/crawl_job.py \
        --warehouse /shared/warehouse --seeds seeds.txt --mode scale \
        --host-budget 64 --http

The same script runs unchanged at any executor count — the N-vs-4N
scaling protocol (BENCH/BASELINE.md) is exactly this job at two cluster
sizes. Seeds file: one URL per line, optionally ``<url>\t<type>`` where
type is ``root`` or ``leaf`` (reference client types its seeds,
/root/reference/src/client/main.go:96-107).

Without ``--http`` the job runs the deterministic synthetic web
(demo/bench mode — the same path bench.py times); with ``--http`` the
fetch stage does real network I/O via bounded thread pools inside
mapInPandas and the engine needs no page table.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

# under spark-submit the package arrives via --py-files; for a direct
# `python scripts/crawl_job.py` run, fall back to the repo checkout
try:  # pragma: no cover - import plumbing
    import weaver_spark  # noqa: F401
except ModuleNotFoundError:  # pragma: no cover
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def parse_args(argv: list[str]) -> argparse.Namespace:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--warehouse", required=True, help="table root (shared fs)")
    p.add_argument("--seeds", help="seeds file: url[\\t<root|leaf>] per line")
    p.add_argument("--mode", choices=["reproduction", "scale"], default="scale")
    p.add_argument("--http", action="store_true", help="real HTTP fetcher")
    p.add_argument("--robots", action="store_true",
                   help="live robots.txt cache + enforcement (scale mode)")
    p.add_argument("--robots-agent", default=None, metavar="TOKEN",
                   help="crawler product token for RFC 9309 group"
                        " matching (most-specific User-agent group wins;"
                        " default: wildcard groups only)")
    p.add_argument("--host-budget", type=int, default=None)
    p.add_argument("--seen-filter", choices=["exact", "bloom", "cuckoo"],
                   default="exact", help="payload-key dedup prefilter")
    p.add_argument("--classify", action="append", default=[],
                   metavar="REGEX=TYPE",
                   help="URL classifier rule for discovered links in --http"
                        " mode (repeatable, first match wins; TYPE is root"
                        " or leaf). Without rules discovery stops at leaf"
                        " depth 1.")
    p.add_argument("--k-cap", type=int, default=None, help="links per page cap")
    p.add_argument("--max-rounds", type=int, default=100)
    p.add_argument("--max-concurrency", type=int, default=16,
                   help="HTTP sockets per python worker")
    p.add_argument("--track-leases", action="store_true")
    p.add_argument("--max-depth", type=int, default=None,
                   help="drop links that would enqueue deeper than this"
                        " (open-web frontier bound); default unbounded")
    p.add_argument("--retry-failed", type=int, default=0,
                   help="bounded re-enqueue of transient failures (5xx/"
                        "597-599): N extra attempts per URL; 0 = terminal"
                        " failed (reference at-most-once semantics)")
    p.add_argument("--compact-every", type=int, default=8)
    p.add_argument("--compact-buckets", type=int, default=None,
                   help="bucketed base layout: re-compactions rewrite only"
                        " delta-touched buckets")
    p.add_argument("--demo-roots", type=int, default=50,
                   help="synthetic web size when --http is not set")
    p.add_argument("--demo-leaves", type=int, default=400)
    args = p.parse_args(argv)
    if args.http and not args.seeds:
        p.error("--http requires --seeds")
    rules = []
    for spec in args.classify:
        pat, sep, t = spec.rpartition("=")
        if not sep or not pat or t not in ("root", "leaf"):
            # empty regex would rlike-match EVERY url (silently typing the
            # whole frontier root); reject it like a bad type
            p.error(f"--classify expects REGEX=root|leaf, got {spec!r}")
        rules.append((pat, t))
    args.classify_rules = rules
    return args


def main(argv: list[str] | None = None) -> None:
    args = parse_args(argv if argv is not None else sys.argv[1:])
    from pyspark.sql import SparkSession

    from weaver_spark.engine import CrawlEngine

    spark = SparkSession.builder.appName("weaver_crawl").getOrCreate()
    eng = CrawlEngine(
        spark,
        args.warehouse,
        mode=args.mode,
        k_cap=args.k_cap,
        host_budget=args.host_budget,
        seen_filter=args.seen_filter,
        track_leases=args.track_leases,
        retry_failed=args.retry_failed,
        max_depth=args.max_depth,
        compact_every=args.compact_every,
        compact_buckets=args.compact_buckets,
    )
    if args.http:
        eng.set_http_fetcher(max_concurrency=args.max_concurrency)
        if args.classify_rules:
            eng.set_url_classifier(args.classify_rules)
        if args.robots:
            kw = {"max_concurrency": args.max_concurrency}
            if args.robots_agent:
                kw["agent"] = args.robots_agent
            eng.enable_auto_robots(**kw)
        seeds, types = [], []
        with open(args.seeds) as f:
            for line in f:
                line = line.strip()
                if not line or line.startswith("#"):
                    continue
                parts = line.split("\t")
                seeds.append(parts[0])
                types.append(parts[1] if len(parts) > 1 else "root")
        eng.seed_urls(seeds, url_types=types)
    else:
        from weaver_spark.webgen import make_web_df

        seeds, web_df = make_web_df(
            spark, n_roots=args.demo_roots, leaves_per_root=args.demo_leaves
        )
        eng.set_web_df(web_df)
        eng.seed_urls(seeds)

    stats = eng.run(max_rounds=args.max_rounds)
    print(json.dumps({
        "rounds": len(stats),
        "urls": sum(s["batch"] for s in stats),
        "payload_rows": sum(s["payload_rows"] for s in stats),
        "failed": sum(s["failed"] for s in stats),
    }))


if __name__ == "__main__":
    main()
