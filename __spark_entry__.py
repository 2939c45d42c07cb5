"""Driver contract for the spark-graft builder (PySpark target).

``entry`` runs the flagship crawl-scheduler query on sf0.001;
``queries``/``oracle_sql`` expose every SQL-expressible operator from
SURVEY.md §2 plus the training-data-pipeline suite (dedup family,
similarity search, text analysis) for the DuckDB side-by-side check.
``crawl_e2e_gather`` runs the genuinely non-SQL path (iterative crawl
rounds through the engine); its oracle is the pure-Python reference
simulator — ``oracle_sql`` renders the simulator's expected gather rows
as a deterministic VALUES literal, so the driver's hash check covers the
full engine end-to-end, not just a row count.
"""

from __future__ import annotations

import os
import sys
import tempfile
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from weaver_spark.queries import REGISTRY, host_priority_schedule  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001: the north-rule
    politeness/priority scheduler window over a synthesized frontier."""
    return host_priority_schedule(spark, "/root/testdata/sf0.001")


def _crawl_e2e_gather(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Non-SQL-expressible: run the actual crawl engine (iterative
    rounds, mapInPandas fetch/decode, delta-log commits) on the seed-42
    synthetic web and return the gathered payload table (minus raw bytes;
    phash/w/h/fmt/caption are the deterministic content witness)."""
    from pyspark.sql import functions as F

    from weaver_spark.engine import CrawlEngine
    from weaver_spark.webgen import make_web

    web = make_web(seed=42, n_hosts=4, n_seed_roots=2, depth=1)
    eng = CrawlEngine(spark, tempfile.mkdtemp(prefix="weaver_e2e_"), mode="reproduction")
    eng.set_web(web)
    eng.seed_urls(web.seeds)
    eng.run(max_rounds=10)
    return eng.gather().select(
        "image_id", "w", "h", "fmt", "caption", "phash"
    ).orderBy("image_id").withColumn("phash", F.col("phash").cast("long"))


def _crawl_e2e_oracle_sql() -> str:
    """The e2e oracle: run the reference-semantics simulator (sim.py) on
    the same seed-42 web and render its expected gather output as a
    VALUES literal DuckDB can evaluate — a real value-hash gate for the
    iterative engine path."""
    from weaver_spark.sim import gather, simulate_crawl
    from weaver_spark.webgen import make_web

    web = make_web(seed=42, n_hosts=4, n_seed_roots=2, depth=1)
    rows = gather(simulate_crawl(web))

    def lit(r: dict) -> str:
        cap = r["caption"].replace("'", "''")
        return (
            f"('{r['image_id']}', {r['w']}, {r['h']}, '{r['fmt']}', "
            f"'{cap}', CAST({r['phash']} AS BIGINT))"
        )

    values = ",\n  ".join(lit(r) for r in rows)
    return (
        "SELECT * FROM (VALUES\n  "
        + values
        + ") AS t(image_id, w, h, fmt, caption, phash) ORDER BY image_id"
    )


_DEEP_PARAMS = dict(
    n_seed_roots=2, child_roots=2, depth=4, leaves_per_root=3, n_hosts=4
)
_DEAD_SEED = "http://h0.test/missing/x"  # not in the web: fails, retries once


def _crawl_e2e_depth_retry(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Second engine e2e, pinning the open-web controls: a 4-level deep
    web crawled with max_depth=2 (links past the cap never enqueue) and
    retry_failed=1 (a dead seed fails, re-enqueues once as a new seq,
    fails terminally). Output is the full per-enqueue-event status log —
    seq assignment, retry re-enqueues and depth-guard suppression are
    all value-hashed against the simulator."""
    from weaver_spark.engine import CrawlEngine
    from weaver_spark.webgen import make_deep_web_df

    seeds, web_df = make_deep_web_df(spark, **_DEEP_PARAMS)
    eng = CrawlEngine(
        spark,
        tempfile.mkdtemp(prefix="weaver_e2e_dr_"),
        mode="reproduction",
        max_depth=2,
        retry_failed=1,
        retry_min_status=400,  # the synthetic missing page is a 404
    )
    eng.set_web_df(web_df)
    eng.seed_urls(seeds + [_DEAD_SEED])
    eng.run(max_rounds=12)
    return (
        eng.frontier.latest_state(spark)
        .select("enqueue_seq", "url", "status")
        .orderBy("enqueue_seq")
    )


def _crawl_e2e_depth_retry_oracle_sql() -> str:
    """Simulator run with the same flags on the driver-side mirror web,
    rendered as a VALUES literal (same pattern as the gather e2e)."""
    from weaver_spark.sim import simulate_crawl
    from weaver_spark.webgen import make_deep_web

    web = make_deep_web(**_DEEP_PARAMS)
    web.seeds.append(_DEAD_SEED)
    res = simulate_crawl(web, retry_failed=1, max_depth=2)
    rows = sorted(res.statuses)
    values = ",\n  ".join(
        f"(CAST({seq} AS BIGINT), '{url}', '{status}')"
        for seq, url, status in rows
    )
    return (
        "SELECT * FROM (VALUES\n  "
        + values
        + ") AS t(enqueue_seq, url, status) ORDER BY enqueue_seq"
    )


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    out: dict[str, Callable[[SparkSession, str], DataFrame]] = {
        name: fn for name, (fn, _sql) in REGISTRY.items()
    }
    out["crawl_e2e_gather"] = _crawl_e2e_gather
    out["crawl_e2e_depth_retry"] = _crawl_e2e_depth_retry
    return out


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent SQL per query."""
    out = {name: sql for name, (_fn, sql) in REGISTRY.items() if sql is not None}
    out["crawl_e2e_gather"] = _crawl_e2e_oracle_sql()
    out["crawl_e2e_depth_retry"] = _crawl_e2e_depth_retry_oracle_sql()
    return out
