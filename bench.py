#!/usr/bin/env python
"""Benchmark driver: headline queries at $SPARK_GRAFT_SF_DIR on
local[$SPARK_GRAFT_CPUS]; prints ONE JSON line.

Modes:
  python bench.py                 # the driver's per-round bench
  python bench.py --crawl-only    # crawl throughput only (used by --scaling)
  python bench.py --scaling       # run crawl at local[8] and local[32] in
                                  # subprocesses, report scaling efficiency
                                  # and write BENCH/BASELINE.md

The headline metric mirrors BASELINE.json: URLs fetched+deduped/sec on a
synthetic frontier with image+caption payload decode in the fetch UDF.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import tempfile
import time

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))

# queries with near-linear cost at sf0.1 (the pairwise dedup verifiers
# minhash_lsh_pairs / ngram_jaccard_pairs are correctness-gated at sf0.01
# by the driver; their candidate-pair output is quadratic in near-dup
# density on this corpus, so they are excluded from the timing suite).
BENCH_QUERIES = [
    "q1_pricing_summary",
    "q3_shipping_priority",
    "gather_merge",
    "storage_dedup_antijoin",
    "frontier_fifo_batch",
    "topk_links_per_page",
    "politeness_budget_rank",
    "host_priority_schedule",
    "dedup_exact",
    "doc_fingerprint",
    "token_count",
    "quality_score",
    "minhash_signatures",
    "simhash16",
    "embedding_cosine_topk",
    "events_hourly_rollup",
    "sessionize",
]


def _spark():
    from weaver_spark.session import get_spark

    spark = get_spark(
        app_name="weaver_bench",
        master=f"local[{CPUS}]",
        shuffle_partitions=CPUS,
    )
    spark.sparkContext.setLogLevel("ERROR")
    return spark


def bench_queries(spark) -> dict[str, float]:
    from weaver_spark.queries import REGISTRY

    times: dict[str, float] = {}
    for name in BENCH_QUERIES:
        fn, _sql = REGISTRY[name]
        # warm the scan cache once, then time one execution to completion
        t0 = time.perf_counter()
        df = fn(spark, SF_DIR)
        n = df.count()
        times[name] = round(time.perf_counter() - t0, 3)
        _ = n
    return times


def bench_crawl(spark) -> dict:
    """Crawl throughput: seed -> rounds to exhaustion on a distributed
    synthetic web (JVM-generated; payload pixels synthesized in the fetch
    UDF on executors). Warehouse lives on tmpfs when available so the
    measurement captures engine throughput, not shared-disk bandwidth."""
    import shutil

    from weaver_spark.engine import CrawlEngine
    from weaver_spark.webgen import make_web, make_web_df

    n_roots = int(os.environ.get("WEAVER_BENCH_ROOTS", "50"))
    lpr = int(os.environ.get("WEAVER_BENCH_LEAVES_PER_ROOT", "400"))
    seeds, web_df = make_web_df(spark, n_roots=n_roots, leaves_per_root=lpr)
    base = "/dev/shm" if os.path.isdir("/dev/shm") else None
    wh = tempfile.mkdtemp(prefix="weaver_bench_", dir=base)
    eng = CrawlEngine(spark, wh, mode="reproduction")
    eng.set_web_df(web_df)

    # warm-up: a small driver-side web crawled to exhaustion warms python
    # workers, codegen and the whole leaf decode path before timing
    warm_web = make_web(seed=7, n_hosts=4, n_seed_roots=2, depth=1)
    warm = CrawlEngine(
        spark, tempfile.mkdtemp(prefix="weaver_warm_", dir=base), mode="reproduction"
    )
    warm.set_web(warm_web)
    warm.seed_urls(warm_web.seeds)
    warm.run(max_rounds=3)

    t0 = time.perf_counter()
    eng.seed_urls(seeds)
    stats = eng.run(max_rounds=50)
    wall = time.perf_counter() - t0
    fetched = sum(s["batch"] for s in stats)
    payloads = sum(s["payload_rows"] for s in stats)
    shutil.rmtree(wh, ignore_errors=True)
    return {
        "urls": fetched,
        "payload_rows": payloads,
        "rounds": len(stats),
        "seconds": round(wall, 3),
        "urls_per_sec": round(fetched / wall, 2),
        "cpus": CPUS,
        "web": {"roots": n_roots, "leaves_per_root": lpr},
    }


def run_single(crawl_only: bool) -> dict:
    spark = _spark()
    out: dict = {"sf": SF_DIR, "cpus": CPUS}
    crawl = bench_crawl(spark)
    out["crawl"] = crawl
    qtimes: dict[str, float] = {}
    if not crawl_only:
        qtimes = bench_queries(spark)
    out["queries"] = qtimes
    total = round(sum(qtimes.values()) + crawl["seconds"], 3)
    out.update(
        {
            "metric": "urls_fetched_deduped_per_sec",
            "value": crawl["urls_per_sec"],
            "unit": "urls/sec",
            "suite_seconds": total,
        }
    )
    return out


def run_scaling() -> dict:
    """Same job at N and 4N cores (the sandbox stand-in for two cluster
    sizes); efficiency = rate(4N) / (4 * rate(N))."""
    results = {}
    for cpus in (8, 32):
        env = dict(
            os.environ,
            SPARK_GRAFT_CPUS=str(cpus),
            SPARK_GRAFT_SF_DIR=SF_DIR,
            # scaling runs need compute to dominate fixed round overhead:
            # a 200k-leaf web gives ~300 core-seconds of decode work
            WEAVER_BENCH_ROOTS=os.environ.get("WEAVER_BENCH_ROOTS", "400"),
            WEAVER_BENCH_LEAVES_PER_ROOT=os.environ.get(
                "WEAVER_BENCH_LEAVES_PER_ROOT", "500"
            ),
        )
        p = subprocess.run(
            [sys.executable, os.path.abspath(__file__), "--crawl-only"],
            capture_output=True,
            text=True,
            env=env,
            cwd=os.path.dirname(os.path.abspath(__file__)),
        )
        line = p.stdout.strip().splitlines()[-1]
        results[cpus] = json.loads(line)
    r8 = results[8]["crawl"]["urls_per_sec"]
    r32 = results[32]["crawl"]["urls_per_sec"]
    eff = round(r32 / (4 * r8), 3)
    out = {
        "metric": "scaling_efficiency_8_to_32",
        "value": eff,
        "unit": "ratio",
        "rate_local8": r8,
        "rate_local32": r32,
        "crawl_local8": results[8]["crawl"],
        "crawl_local32": results[32]["crawl"],
        "sf": SF_DIR,
        "queries": {},
    }
    _write_scaling_report(out)
    return out


def _write_scaling_report(out: dict) -> None:
    """BENCH/BASELINE.md: the north-rule scaling artifact (BASELINE.md
    'Bench protocol' — sandbox stand-in for N vs 4N executors)."""
    os.makedirs("BENCH", exist_ok=True)
    c8, c32 = out["crawl_local8"], out["crawl_local32"]
    eff = out["value"]
    verdict = "MEETS" if eff >= 0.8 else "BELOW"
    md = f"""# BENCH/BASELINE — scaling efficiency (north rule)

Protocol: the same crawl job (seed -> rounds to frontier exhaustion on a
{c8["web"]["roots"]}x{c8["web"]["leaves_per_root"]} synthetic web, image
payload decode in the fetch UDF, delta-log commits) run in two fresh
subprocesses at `local[8]` and `local[32]` — the sandbox stand-in for N
and 4N executors (BASELINE.md bench protocol; no real cluster here).

| parallelism | URLs | rounds | seconds | URLs/sec |
|---|---|---|---|---|
| local[8]  (N)  | {c8["urls"]} | {c8["rounds"]} | {c8["seconds"]} | {c8["urls_per_sec"]} |
| local[32] (4N) | {c32["urls"]} | {c32["rounds"]} | {c32["seconds"]} | {c32["urls_per_sec"]} |

**Scaling efficiency = rate(32) / (4 x rate(8)) = {eff}** — {verdict}
the north-rule target (>= 0.8).
"""
    with open(os.path.join("BENCH", "BASELINE.md"), "w") as f:
        f.write(md)


def main() -> None:
    if "--scaling" in sys.argv:
        out = run_scaling()
    else:
        out = run_single(crawl_only="--crawl-only" in sys.argv)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
