"""Training-data curation operators: LAION-style image+caption
filtering, aspect-ratio bucketing, and webdataset-style shard planning
and packing — the post-crawl, pre-training stage of a 100 TB
image+caption pipeline.

These sit downstream of the crawl engine's gather table (image_id,
bytes, w, h, fmt, caption, phash) and upstream of training: filter out
junk pairs, bucket by aspect ratio for resolution-bucketed batching,
and pack the survivors into contiguous ~budget-byte shards (the
webdataset tar layout training loaders stream).

Scale notes:

- ``curate_image_captions`` and ``aspect_bucket_col`` are pure JVM
  column expressions (whole-stage codegen, no Python, no shuffle) — a
  map-only pass at any scale.
- ``aspect_bucket_col`` picks argmin |w/h - bw/bh| with INTEGER-ONLY
  arithmetic: comparing |w*bh_i - h*bw_i| / bh_i across buckets via a
  common-denominator scale (LCM of the bucket heights), so the
  assignment is bit-identical across engines — no float comparisons
  whose last-ulp differences could flip a near-tie.
- ``plan_shards`` is the textbook distributed prefix sum: range
  partition on the id (order-preserving, pinned — see the function
  docstring), per-partition byte subtotals (one tiny agg; the driver
  sees O(|partitions|) scalars, never rows), exclusive partition
  offsets as a map literal, then a within-partition cumulative sum.
  No global single-partition window over the data. The result is
  invariant to where the range boundaries fall: for a unique id
  ordering, partition offset + within-partition prefix is the same
  global exclusive prefix under ANY order-preserving partitioning.
- ``pack_shards`` materializes each shard as a deterministic tar via
  ``applyInPandas`` over ``shard_id`` — per-group memory is bounded by
  the shard budget (+ one straddling row), and tar metadata is pinned
  (mtime=0, uid/gid=0, ustar) so shard bytes are reproducible.

Reference parity: the reference stores scraped products row-at-a-time
through its DHT replica set (/root/reference/src/scrapper/main.go,
database node Put path) and has no training-export stage; this module
is part of the beyond-reference training-data suite (SURVEY.md §2.8
additions), like the dedup/ANN families.
"""

from __future__ import annotations

import math
from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from ..functions.text import token_count_col

# the usual resolution-bucket set for image-generation training
ASPECT_BUCKETS: tuple[tuple[int, int], ...] = (
    (1, 1),
    (4, 3),
    (3, 4),
    (16, 9),
    (9, 16),
)


def digit_ratio_col(text: Column) -> Column:
    """digits / non-whitespace chars (caption spam signal)."""
    nonspace = F.greatest(
        F.length(F.regexp_replace(text, r"\s", "")), F.lit(1)
    )
    digits = F.length(F.regexp_replace(text, r"[^0-9]", ""))
    return digits.cast("double") / nonspace


def curate_image_captions(
    df: DataFrame,
    *,
    w: str = "w",
    h: str = "h",
    caption: str = "caption",
    min_dim: int = 64,
    max_aspect: float = 3.0,
    min_tokens: int = 2,
    max_tokens: int = 512,
    max_digit_ratio: float = 0.5,
) -> DataFrame:
    """LAION-style image+caption curation filter, all JVM expressions.

    Keeps rows where both dimensions clear ``min_dim``, the aspect
    ratio max(w,h)/min(w,h) is at most ``max_aspect``, the caption's
    alnum token count lies in [min_tokens, max_tokens], and the
    caption's digit ratio is at most ``max_digit_ratio``. Adds the
    computed ``aspect`` / ``n_tokens`` / ``digit_ratio`` columns so
    downstream stages (and audits) see why a row survived.
    """
    wc, hc = F.col(w).cast("double"), F.col(h).cast("double")
    aspect = F.greatest(wc, hc) / F.least(wc, hc)
    out = (
        df.withColumn("aspect", aspect)
        .withColumn("n_tokens", token_count_col(F.col(caption)))
        .withColumn("digit_ratio", digit_ratio_col(F.col(caption)))
    )
    keep = (
        (F.col(w) >= min_dim)
        & (F.col(h) >= min_dim)
        & (F.col("aspect") <= max_aspect)
        & (F.col("n_tokens") >= min_tokens)
        & (F.col("n_tokens") <= max_tokens)
        & (F.col("digit_ratio") <= max_digit_ratio)
    )
    return out.where(keep)


def aspect_bucket_col(
    w: Column,
    h: Column,
    buckets: Sequence[tuple[int, int]] = ASPECT_BUCKETS,
) -> Column:
    """Nearest aspect bucket as a ``"WxH"`` label, integer-exact.

    argmin_i |w/h - bw_i/bh_i| with ties going to the earlier bucket in
    ``buckets``. |w/h - bw/bh| = |w*bh - h*bw| / (h*bh); h > 0 cancels
    across buckets, so ordering by |w*bh_i - h*bw_i| / bh_i suffices,
    and scaling by LCM(bh_i)/bh_i makes every key an exact integer —
    the argmin is then a plain array_sort over (key, ord) structs.
    """
    lcm = math.lcm(*(bh for _, bh in buckets))
    entries = [
        F.struct(
            (
                F.abs(w * F.lit(bh) - h * F.lit(bw)) * F.lit(lcm // bh)
            ).cast("long").alias("key"),
            F.lit(i).alias("ord"),
            F.lit(f"{bw}x{bh}").alias("bucket"),
        )
        for i, (bw, bh) in enumerate(buckets)
    ]
    return F.array_sort(F.array(*entries))[0]["bucket"]


def plan_shards(
    df: DataFrame,
    id_col: str,
    bytes_col: str,
    shard_budget: int,
    num_partitions: int | None = None,
) -> DataFrame:
    """Deterministic webdataset-style shard assignment.

    Rows ordered by the (unique) ``id_col`` form one conceptual byte
    stream; each row's ``byte_offset`` is the exclusive prefix sum of
    ``bytes_col`` and its shard is ``floor(byte_offset / budget)`` —
    contiguous shards of ~budget bytes (a shard can exceed the budget
    by at most one straddling row). Distributed prefix sum, see module
    docstring; the assignment is invariant to partition count.

    Same execution discipline as ranking.dense_seq (which this
    mirrors): ``repartitionByRange`` samples boundaries with a
    per-plan-execution seed, so the partitioned intermediate is
    PERSISTED before the per-partition subtotals are collected — the
    pin guarantees the offsets job and the output rows see one
    boundary assignment. The collect moves O(num_partitions) scalars,
    never rows. The pinned intermediate stays cached until the session
    drops it (shard planning is a terminal export pass; callers doing
    repeated plans can ``.unpersist()`` the input side themselves).
    """
    if num_partitions is None:
        num_partitions = int(
            df.sparkSession.conf.get("spark.sql.shuffle.partitions")
        )
    part = (
        df.repartitionByRange(num_partitions, F.col(id_col))
        .withColumn("_pid", F.spark_partition_id())
        .persist()
    )
    subtotals = {
        r["_pid"]: r["_pb"]
        for r in part.groupBy("_pid")
        .agg(F.sum(bytes_col).alias("_pb"))
        .collect()
    }
    offsets, acc = {}, 0
    for pid in sorted(subtotals):
        offsets[pid] = acc
        acc += subtotals[pid]
    if offsets:
        mapping = F.create_map(
            *[F.lit(x) for pid_off in offsets.items() for x in pid_off]
        )
        offset_expr = F.coalesce(mapping[F.col("_pid")], F.lit(0))
    else:
        offset_expr = F.lit(0)
    wrow = (
        Window.partitionBy("_pid")
        .orderBy(id_col)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    return (
        part.withColumn(
            "byte_offset",
            (
                offset_expr + F.coalesce(F.sum(bytes_col).over(wrow), F.lit(0))
            ).cast("long"),
        )
        .withColumn(
            "shard_id",
            F.floor(F.col("byte_offset") / F.lit(shard_budget)),
        )
        .drop("_pid")
    )


def shard_manifest(
    planned: DataFrame, id_col: str, bytes_col: str
) -> DataFrame:
    """Per-shard rollup of a ``plan_shards`` output — the manifest a
    training loader (or a resumable packing job) indexes by."""
    return planned.groupBy("shard_id").agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.sum(bytes_col).cast("long").alias("shard_bytes"),
        F.min(id_col).alias("first_id"),
        F.max(id_col).alias("last_id"),
    )


def pack_shards(
    planned: DataFrame,
    id_col: str,
    members: Sequence[tuple[str, str]],
    caption_encoding: str = "utf-8",
) -> DataFrame:
    """Materialize each shard as a deterministic in-memory tar
    (webdataset layout: one ``{id}.{ext}`` member per (column, ext) in
    ``members``, rows in id order). Returns (shard_id, n_rows,
    tar_bytes, tar_sha256); callers persist ``tar_bytes`` however their
    storage wants (the engine's TableBackend, object-store puts, ...).

    Tar metadata is pinned (ustar, mtime=0, uid/gid=0, mode 0644) so
    identical inputs produce identical shard bytes — re-runs and
    replicas verify by hash alone. Per-group memory is bounded by the
    shard budget plus one row.
    """
    import hashlib
    import io
    import tarfile

    import pandas as pd

    member_cols = [c for c, _ in members]
    out_schema = (
        "shard_id long, n_rows long, tar_bytes binary, tar_sha256 string"
    )

    def _pack(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(id_col, kind="mergesort")
        buf = io.BytesIO()
        with tarfile.open(
            fileobj=buf, mode="w", format=tarfile.USTAR_FORMAT
        ) as tar:
            for row in pdf.itertuples(index=False):
                rowd = row._asdict()
                for col, ext in members:
                    raw = rowd[col]
                    if raw is None:
                        continue
                    data = (
                        raw.encode(caption_encoding)
                        if isinstance(raw, str)
                        else bytes(raw)
                    )
                    info = tarfile.TarInfo(name=f"{rowd[id_col]}.{ext}")
                    info.size = len(data)
                    info.mtime = 0
                    info.uid = info.gid = 0
                    info.uname = info.gname = ""
                    info.mode = 0o644
                    tar.addfile(info, io.BytesIO(data))
        blob = buf.getvalue()
        return pd.DataFrame(
            {
                "shard_id": [int(pdf["shard_id"].iloc[0])],
                "n_rows": [len(pdf)],
                "tar_bytes": [blob],
                "tar_sha256": [hashlib.sha256(blob).hexdigest()],
            }
        )

    cols = ["shard_id", id_col, *member_cols]
    return (
        planned.select(*cols)
        .groupBy("shard_id")
        .applyInPandas(_pack, schema=out_schema)
    )
