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


def _freshness_pixels():
    """Deterministic image payloads for the sitemap/recrawl e2e: v1 for
    images 1..4, a v2 generation for image 2 (served after the bump)."""
    import numpy as np

    v1 = {i: np.full((8, 8, 3), 30 * i + 5, dtype=np.uint8) for i in range(1, 5)}
    v2 = {2: np.full((8, 8, 3), 250, dtype=np.uint8)}
    return v1, v2


def _crawl_e2e_sitemap_recrawl(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Third engine e2e, pinning the production seed + freshness path
    against a REAL local HTTP server: robots.txt advertises a 2-level
    sitemap index (one child gzipped); the engine fills its robots
    cache, seeds its frontier from the sitemaps (classifier-typed),
    crawls (one root page exercises single-quote/unquoted hrefs and
    <base href>), revalidates everything via If-None-Match (all 304 —
    no duplicate payload rows), then one image's content is bumped and
    recrawl + refresh_stale replaces exactly that payload through the
    purge path. Output: the final visible payload table (authority
    stripped — the ephemeral port must not enter the hash) with each
    row's ETag, so the per-key GENERATION is value-hashed: img/2 must
    carry v2, everything else v1."""
    import gzip
    import threading
    from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

    from pyspark.sql import functions as F

    from weaver_spark.codec import encode_image
    from weaver_spark.engine import CrawlEngine

    v1, v2 = _freshness_pixels()
    png_v1 = {i: encode_image(px, "png") for i, px in v1.items()}
    png_v2 = {i: encode_image(px, "png") for i, px in v2.items()}
    bumped: set[int] = set()

    class _H(BaseHTTPRequestHandler):
        def log_message(self, *a):
            pass

        def _send(self, body, ctype="text/html", etag=None, ):
            self.send_response(200)
            if etag:
                self.send_header("ETag", etag)
            self.send_header("Content-Type", ctype)
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def do_GET(self):
            base = f"http://{self.headers.get('Host')}".encode()
            if self.path == "/robots.txt":
                self._send(
                    b"User-agent: *\nDisallow: /private/\nSitemap: "
                    + base + b"/sm-index.xml\n",
                    ctype="text/plain",
                )
            elif self.path == "/sm-index.xml":
                self._send(
                    b"<sitemapindex><sitemap><loc>" + base + b"/sm-1.xml</loc>"
                    b"</sitemap><sitemap><loc>" + base + b"/sm-2.xml.gz</loc>"
                    b"</sitemap></sitemapindex>"
                )
            elif self.path == "/sm-1.xml":
                self._send(
                    b"<urlset><url><loc>" + base + b"/img/1</loc></url>"
                    b"<url><loc>" + base + b"/img/2</loc></url></urlset>"
                )
            elif self.path == "/sm-2.xml.gz":
                self._send(
                    gzip.compress(
                        b"<urlset><url><loc>" + base + b"/img/3</loc></url>"
                        b"<url><loc>" + base + b"/cat/9</loc></url></urlset>"
                    )
                )
            elif self.path == "/cat/9":
                self._send(
                    b"<head><base href='/img/'></head><a href=4>f</a> "
                    b"<a href='/private/x'>blocked</a>"
                )
            elif self.path.startswith("/img/"):
                i = int(self.path.rsplit("/", 1)[1])
                ver = 2 if i in bumped else 1
                etag = f'"img{i}-v{ver}"'
                if self.headers.get("If-None-Match") == etag:
                    self.send_response(304)
                    self.end_headers()
                    return
                self._send(
                    (png_v2 if ver == 2 else png_v1)[i],
                    ctype="image/png",
                    etag=etag,
                )
            else:
                self.send_error(404)

    srv = ThreadingHTTPServer(("127.0.0.1", 0), _H)
    threading.Thread(target=srv.serve_forever, daemon=True).start()
    try:
        server = f"http://127.0.0.1:{srv.server_port}"
        eng = CrawlEngine(
            spark, tempfile.mkdtemp(prefix="weaver_e2e_sm_"), mode="scale"
        )
        eng.set_http_fetcher(max_concurrency=4, backoff_base_s=0.01, timeout_s=5.0)
        eng.set_url_classifier([(r"/cat(/|$)", "root")])
        eng.enable_auto_robots(timeout_s=5.0)
        eng.refresh_robots([("127.0.0.1", server)])
        eng.ingest_sitemaps()
        eng.run(max_rounds=10)
        eng.recrawl()  # all fresh: four 304s, zero new payload rows
        eng.run(max_rounds=5)
        bumped.add(2)
        eng.recrawl()
        eng.run(max_rounds=5)
        eng.refresh_stale()  # purge + re-fetch img/2's new generation
        eng.run(max_rounds=5)
        # alive payload rows WITH their stored validators (etag lives in
        # the adopted stage files beyond IMAGES_SCHEMA — schema-on-read,
        # same mechanism the recrawl path uses)
        from pyspark.sql.types import (
            IntegerType,
            LongType,
            StringType,
            StructField,
            StructType,
        )

        sch = StructType(
            [
                StructField("image_id", StringType(), False),
                StructField("enqueue_seq", LongType(), True),
                StructField("w", IntegerType(), True),
                StructField("h", IntegerType(), True),
                StructField("fmt", StringType(), True),
                StructField("phash", LongType(), True),
                StructField("etag", StringType(), True),
            ]
        )
        alive = eng._alive_after_purge(eng.images.read(spark, schema=sch))
        return alive.select(
            F.regexp_replace("image_id", r"^http://[^/]+", "").alias("path"),
            "w",
            "h",
            "fmt",
            "phash",
            "etag",
        ).orderBy("path")
    finally:
        srv.shutdown()


def _crawl_e2e_sitemap_recrawl_oracle_sql() -> str:
    """Expected final payload table, rendered as a VALUES literal: the
    four sitemap-reachable images at 8x8 png with the codec's phash of
    the DETERMINISTIC pixels — img/2 at its v2 generation (etag + phash
    prove the refresh replaced exactly that payload), the rest at v1."""
    from weaver_spark.codec import phash64

    v1, v2 = _freshness_pixels()
    rows = []
    for i in range(1, 5):
        ver = 2 if i == 2 else 1
        px = v2[i] if ver == 2 else v1[i]
        rows.append(
            f"('/img/{i}', 8, 8, 'png', CAST({phash64(px)} AS BIGINT), "
            f"'\"img{i}-v{ver}\"')"
        )
    return (
        "SELECT * FROM (VALUES\n  "
        + ",\n  ".join(rows)
        + ") AS t(path, w, h, fmt, phash, etag) ORDER BY path"
    )


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    out: dict[str, Callable[[SparkSession, str], DataFrame]] = {
        name: fn for name, (fn, _sql) in REGISTRY.items()
    }
    out["crawl_e2e_gather"] = _crawl_e2e_gather
    out["crawl_e2e_depth_retry"] = _crawl_e2e_depth_retry
    out["crawl_e2e_sitemap_recrawl"] = _crawl_e2e_sitemap_recrawl
    return out


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent SQL per query."""
    out = {name: sql for name, (_fn, sql) in REGISTRY.items() if sql is not None}
    out["crawl_e2e_gather"] = _crawl_e2e_oracle_sql()
    out["crawl_e2e_depth_retry"] = _crawl_e2e_depth_retry_oracle_sql()
    out["crawl_e2e_sitemap_recrawl"] = _crawl_e2e_sitemap_recrawl_oracle_sql()
    return out
