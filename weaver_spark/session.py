"""SparkSession factory tuned for the crawl engine.

Defaults target the sandbox (single JVM, ``local[N]``) but every knob is
chosen for how it behaves on a real multi-executor cluster at 100 TB:

- AQE on: runtime coalescing of post-shuffle partitions and skew-join
  splitting — the mega-host skew in per-host scheduling (FIXTURES.md §2)
  is first handled by explicit salting, AQE is the backstop.
- Arrow on: every Python-side stage in this engine is a pandas/Arrow UDF
  (``mapInPandas`` fetch/decode); row-at-a-time Python is banned.
- shuffle.partitions ~ cores locally; on a cluster this is set per job to
  ~2-3x total executor cores (or left to AQE's coalescing with a high
  initial value).
- session timezone pinned UTC so results compare bit-for-bit against the
  DuckDB oracle (UTC-naive timestamps).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "weaver_spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or reuse) a SparkSession.

    ``master`` defaults to ``local[$SPARK_GRAFT_CPUS]`` (env, default 32).
    ``shuffle_partitions`` defaults to the local core count — at cluster
    scale callers pass an explicit value sized to the stage's data volume.
    """
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    master = master or f"local[{cpus}]"
    if shuffle_partitions is None:
        shuffle_partitions = cpus

    builder = (
        SparkSession.builder.appName(app_name)
        .master(master)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        # Arrow batch size bounds peak memory of the decode UDF: at 100 TB
        # each batch holds ~10k binary image payloads => a few hundred MB.
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "4096")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    return builder.getOrCreate()
