"""Explicit StructType schemas for every engine table.

The reference fixes its schemas at compile time in Go structs
(``/root/reference/src/common/Product.go:3-26``,
``src/common/message.go:5-10``); we fix them here and never infer.

Tables (SURVEY.md §1):

- ``frontier``  — the URL queue. One row per *enqueue event* (the same URL
  enqueued twice is two rows — the reference queue has no dedup,
  ``src/queue/main.go:31-45``). Status transitions are appended as delta
  rows keyed by ``enqueue_seq``; the current state is the latest update
  per key (merge-on-read; see catalog.py).
- ``images``    — fetched payloads, shape mandated by BASELINE.json
  ``input_hint``: (image_id, bytes, w, h, fmt, caption, phash).
- ``web_pages`` — the synthetic closed web graph the fetch UDF resolves
  against in tests (FIXTURES.md §3). In production the fetch UDF does HTTP
  and this table does not exist.
- ``robots``    — per-host robots/politeness config (FIXTURES.md §4).
- ``metrics``   — per (round, partition, host) fetch metrics (north rule).
- ``lineage``   — round -> commit/snapshot mapping for resume.
"""

from __future__ import annotations

from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

# URL types: the reference enum AmazonProduct/NeweggProduct/NeweggRoot/
# AmazonRoot/Dummy (src/common/Product.go:18-26) reduces to the two page
# classes that matter for dataflow: root pages (yield links) and leaf
# pages (yield one payload). "dummy" kept for parity with the reference's
# discarded Amazon seeds (src/client/main.go:102).
URL_TYPE_ROOT = "root"
URL_TYPE_LEAF = "leaf"
URL_TYPE_DUMMY = "dummy"

STATUS_PENDING = "pending"
STATUS_LEASED = "leased"
STATUS_DONE = "done"
STATUS_FAILED = "failed"
STATUS_BLOCKED = "blocked"  # robots disallow — never fetched

FRONTIER_SCHEMA = StructType(
    [
        StructField("url", StringType(), False),
        StructField("url_hash", LongType(), False),  # xxhash64(canonical url)
        StructField("host", StringType(), False),
        StructField("url_type", StringType(), False),
        # link distance from the seed set (seeds = 0): the depth-decay
        # priority source and a free crawl-frontier diagnostic
        StructField("depth", IntegerType(), False),
        StructField("priority", IntegerType(), False),
        StructField("status", StringType(), False),
        StructField("enqueue_seq", LongType(), False),  # deterministic FIFO order
        StructField("lease_ts", TimestampType(), True),
        StructField("round", IntegerType(), False),  # round that wrote this row
        # fetch-attempt ordinal for this URL (retry_failed): a retried
        # transient failure re-enters the frontier as a NEW enqueue event
        # carrying attempt+1 — every attempt stays visible in history.
        # Nullable: rows persisted before this column existed read null = 0.
        StructField("attempt", IntegerType(), True),
        # delta-log bookkeeping: a status update re-appends the row with a
        # higher update_seq; current state = max(update_seq) per enqueue_seq.
        StructField("update_seq", LongType(), False),
    ]
)

# Authoritative payload shape from BASELINE.json input_hint.
IMAGES_SCHEMA = StructType(
    [
        StructField("image_id", StringType(), False),
        StructField("bytes", BinaryType(), False),
        StructField("w", IntegerType(), False),
        StructField("h", IntegerType(), False),
        StructField("fmt", StringType(), False),
        StructField("caption", StringType(), False),
        StructField("phash", LongType(), False),
    ]
)

WEB_PAGES_SCHEMA = StructType(
    [
        StructField("url", StringType(), False),
        StructField("kind", StringType(), False),  # root | leaf
        StructField("links", ArrayType(StringType()), True),  # root pages
        StructField("image_id", StringType(), True),  # leaf pages
        StructField("payload", BinaryType(), True),  # encoded image bytes
        StructField("fmt", StringType(), True),
        StructField("caption", StringType(), True),
    ]
)

ROBOTS_SCHEMA = StructType(
    [
        StructField("host", StringType(), False),
        StructField("disallow_prefixes", ArrayType(StringType()), False),
        StructField("crawl_delay_ms", IntegerType(), False),
        # Allow: prefixes (longest-match wins over Disallow — the
        # de-facto Google semantics). Nullable: rows persisted before
        # this column existed read as null = no allow overrides.
        StructField("allow_prefixes", ArrayType(StringType()), True),
        # Sitemap: URLs advertised by the host's robots.txt (global
        # records, not group-scoped). Nullable: pre-upgrade cache rows
        # read null = none advertised. Consumed by engine.ingest_sitemaps.
        StructField("sitemaps", ArrayType(StringType()), True),
    ]
)

METRICS_SCHEMA = StructType(
    [
        StructField("round", IntegerType(), False),
        StructField("partition_id", IntegerType(), False),
        StructField("host", StringType(), False),
        StructField("fetched", LongType(), False),
        StructField("deduped", LongType(), False),
        StructField("failed", LongType(), False),
        StructField("bytes", LongType(), False),
        StructField("fetch_ms_sum", LongType(), False),
    ]
)

# Keyed purge (GDPR shape; reference DHT Del,
# src/node/chord_interface.go:68-91): merge-on-read tombstones over the
# append-only images log. ``purge_seq`` is the frontier's max enqueue_seq
# at purge time — any LATER store of the same key rides a new enqueue
# event with a strictly larger seq, so `stored.enqueue_seq > purge_seq`
# revives re-fetched keys while the purged row stays excluded.
PURGES_SCHEMA = StructType(
    [
        StructField("image_id", StringType(), False),
        StructField("purge_seq", LongType(), False),
        StructField("purged_at", TimestampType(), False),
    ]
)

LINEAGE_SCHEMA = StructType(
    [
        StructField("round", IntegerType(), False),
        StructField("table", StringType(), False),
        StructField("commit_id", LongType(), False),
        StructField("committed_at", TimestampType(), False),
    ]
)

# Output of the fetch/parse mapInPandas stage, before splitting into
# links -> frontier and payloads -> images. The stage is WRITTEN
# partitioned by `sink` (STAGE_SCHEMA below): rows that materialized
# payload bytes land in sink=p, everything else in sink=m — so the
# images commit can adopt the sink=p files verbatim (catalog.adopt)
# instead of rewriting the payload bytes.
FETCH_RESULT_SCHEMA = StructType(
    [
        StructField("url", StringType(), False),
        StructField("enqueue_seq", LongType(), False),
        StructField("host", StringType(), False),
        StructField("url_type", StringType(), False),
        StructField("depth", IntegerType(), False),  # pass-through: links
        # inherit parent depth + 1 without a parent join (zero shuffle)
        StructField("status_code", IntegerType(), False),
        StructField("links", ArrayType(StringType()), True),
        StructField("image_id", StringType(), True),
        StructField("bytes", BinaryType(), True),
        StructField("w", IntegerType(), True),
        StructField("h", IntegerType(), True),
        StructField("fmt", StringType(), True),
        StructField("caption", StringType(), True),
        StructField("phash", LongType(), True),
        StructField("bytes_len", LongType(), False),  # so metrics never scan bytes
        StructField("fetch_ms", LongType(), False),
        # post-redirect canonical URL (HTTP mode; urllib follows 3xx):
        # payloads key on it and discovered hrefs resolve against it.
        # Nullable: null = no redirect / synthetic mode; stage files
        # written before this column existed read as null.
        StructField("final_url", StringType(), True),
        # freshness validators captured from the response (HTTP mode):
        # the recrawl path joins them back onto re-enqueued URLs as
        # If-None-Match / If-Modified-Since. Nullable: server may send
        # neither; synthetic mode and pre-upgrade stage files read null.
        StructField("etag", StringType(), True),
        StructField("last_modified", StringType(), True),
    ]
)

SINK_PAYLOAD = "p"
SINK_META = "m"

STAGE_SCHEMA = StructType(
    FETCH_RESULT_SCHEMA.fields + [StructField("sink", StringType(), False)]
)
