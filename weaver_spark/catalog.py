"""Durable table layer: append-only parquet delta log with atomic commits.

The reference keeps frontier state in an in-memory map under a mutex
(``/root/reference/src/queue/main.go:16-29``) and payloads as one JSON
file per key with file-existence idempotence
(``src/storage/main.go:142-165``). The north rule demands durable,
resumable, exactly-once-per-round tables. The natural production answer
is Apache Iceberg (MERGE INTO, snapshot isolation, rollback); the sandbox
has no Iceberg runtime jar, so this module implements the same contract
on plain parquet with an explicit commit log:

    table_root/
      _commits/00000001.json   # {"files": [...], "meta": {...}} — atomic
      data/c00000001-<token>/  # parquet dir written by one commit

- **Atomic commit**: data is written first, then the commit manifest is
  created via write-to-temp + ``os.rename`` (POSIX-atomic). Readers list
  manifests only — a crash mid-write leaves orphan data, never a torn
  table. This is exactly Iceberg's metadata-pointer-swap, minus the
  catalog.
- **Snapshot read**: ``read(spark, as_of=N)`` unions the data of commits
  ≤ N. Time travel for free.
- **Rollback**: drop manifests > N (Iceberg ``rollback_to_snapshot``).
- **Merge-on-read state**: mutable tables (frontier) append status-delta
  rows; ``latest_state`` resolves current rows via max(update_seq) per
  key — the same merge-on-read design as Iceberg v2 position deletes, and
  the reason a 10^10-row frontier never gets rewritten per round.
  ``compact`` folds the log back to one base commit when read
  amplification grows.

Scale notes (100 TB): one parquet dir per commit with files sized by the
writing job's partitioning; state resolution shuffles on the key —
acceptable because status deltas are O(round batch), not O(frontier), and
compaction bounds the number of live deltas. On a real cluster this class
is replaced by ``spark.table("catalog.db.frontier")`` + MERGE INTO with
zero changes to engine logic (the engine only uses append/read/state).
"""

from __future__ import annotations

import json
import os
import secrets
import shutil

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F
from pyspark.sql.types import StructType


class DeltaTable:
    def __init__(self, root: str, schema: StructType, key: str | None = None):
        self.root = root
        self.schema = schema
        self.key = key  # merge key for latest_state (None = append-only)
        os.makedirs(os.path.join(root, "_commits"), exist_ok=True)
        os.makedirs(os.path.join(root, "data"), exist_ok=True)

    # -- commit log -----------------------------------------------------

    def _manifest_dir(self) -> str:
        return os.path.join(self.root, "_commits")

    def commits(self) -> list[int]:
        return sorted(
            int(f[:-5])
            for f in os.listdir(self._manifest_dir())
            if f.endswith(".json")
        )

    def last_commit(self) -> int:
        c = self.commits()
        return c[-1] if c else 0

    def _read_manifest(self, cid: int) -> dict:
        with open(os.path.join(self._manifest_dir(), f"{cid:08d}.json")) as f:
            return json.load(f)

    def find_commit(self, **meta_match) -> int | None:
        """Latest commit whose meta contains all given key/value pairs —
        the idempotence lookup (skip re-appending a round's metrics or a
        replayed stream micro-batch after a crash). Driver-side manifest
        scan: O(live commits), bounded by compaction."""
        for cid in reversed(self.commits()):
            meta = self._read_manifest(cid).get("meta", {})
            if all(meta.get(k) == v for k, v in meta_match.items()):
                return cid
        return None

    def append(self, df: DataFrame, meta: dict | None = None) -> int:
        """Write df as one atomic commit; returns the commit id."""
        cid = self.last_commit() + 1
        token = secrets.token_hex(4)
        data_dir = os.path.join(self.root, "data", f"c{cid:08d}-{token}")
        df.write.mode("overwrite").parquet(data_dir)
        manifest = {"files": [data_dir], "meta": meta or {}}
        tmp = os.path.join(self._manifest_dir(), f".tmp-{token}")
        with open(tmp, "w") as f:
            json.dump(manifest, f)
        final = os.path.join(self._manifest_dir(), f"{cid:08d}.json")
        os.rename(tmp, final)  # POSIX-atomic pointer swap
        return cid

    def rollback(self, commit_id: int) -> None:
        """Drop all commits after commit_id (snapshot rollback)."""
        for cid in self.commits():
            if cid > commit_id:
                os.remove(os.path.join(self._manifest_dir(), f"{cid:08d}.json"))

    def vacuum(self) -> None:
        """Delete data dirs no longer referenced by any manifest."""
        live: set[str] = set()
        for cid in self.commits():
            live.update(self._read_manifest(cid)["files"])
        data_root = os.path.join(self.root, "data")
        for d in os.listdir(data_root):
            full = os.path.join(data_root, d)
            if full not in live:
                shutil.rmtree(full, ignore_errors=True)

    # -- reads ------------------------------------------------------------

    def read(self, spark: SparkSession, as_of: int | None = None) -> DataFrame:
        """Union of all committed data (optionally as of a past commit)."""
        dirs: list[str] = []
        for cid in self.commits():
            if as_of is not None and cid > as_of:
                break
            dirs.extend(self._read_manifest(cid)["files"])
        if not dirs:
            return spark.createDataFrame([], self.schema)
        return spark.read.schema(self.schema).parquet(*dirs)

    def latest_state(
        self, spark: SparkSession, as_of: int | None = None
    ) -> DataFrame:
        """Current row per key: max(update_seq) wins (merge-on-read)."""
        df = self.read(spark, as_of=as_of)
        if self.key is None:
            return df
        w = Window.partitionBy(self.key).orderBy(F.col("update_seq").desc())
        return (
            df.withColumn("_rn", F.row_number().over(w))
            .where(F.col("_rn") == 1)
            .drop("_rn")
        )

    def compact(self, spark: SparkSession, meta: dict | None = None) -> int:
        """Fold the whole log into a single base commit (+vacuum)."""
        state = self.latest_state(spark).cache()
        state.count()  # materialize before we drop the inputs
        cid = self.append(state, meta={"compaction": True, **(meta or {})})
        # retire all prior commits: rewrite manifest list to just `cid`
        for old in self.commits():
            if old != cid:
                os.remove(os.path.join(self._manifest_dir(), f"{old:08d}.json"))
        state.unpersist()
        self.vacuum()
        return cid


class Catalog:
    """A directory of DeltaTables — the engine's 'warehouse'."""

    def __init__(self, warehouse: str):
        self.warehouse = warehouse
        os.makedirs(warehouse, exist_ok=True)

    def table(self, name: str, schema: StructType, key: str | None = None) -> DeltaTable:
        return DeltaTable(os.path.join(self.warehouse, name), schema, key=key)
