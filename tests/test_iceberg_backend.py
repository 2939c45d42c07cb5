"""IcebergTable backend (VERDICT r5 #8): the sandbox has no Iceberg
runtime jar, so these tests pin the exact DDL / procedure calls and
metadata reads each protocol method EMITS against a recording stub —
the conformance suite (test_backend_contract.py) gates the behavioral
contract and collects-and-skips its iceberg parametrization until a
jar-bearing environment runs it. No SparkSession needed here."""

import json

import pytest

from weaver_spark.catalog import TableBackend
from weaver_spark.iceberg_backend import IcebergTable
from weaver_spark.schemas import PURGES_SCHEMA

SNAPSHOT_ROWS = [
    {
        "sequence_number": 1,
        "snapshot_id": 777001,
        "summary": {"weaver.op": '"seed"', "weaver.n": "4"},
    },
    {
        "sequence_number": 2,
        "snapshot_id": 777002,
        "summary": {"weaver.op": '"merge"', "weaver.round": "0"},
    },
]


class _FakeDF:
    def __init__(self, rows=None):
        self._rows = rows or []

    def collect(self):
        return self._rows


class _FakeSpark:
    def __init__(self):
        self.queries: list[str] = []

    def sql(self, q):
        self.queries.append(q)
        if ".snapshots" in q:
            return _FakeDF(SNAPSHOT_ROWS)
        return _FakeDF()


class _FakeKeysDF:
    def __init__(self):
        self.view = None

    def createOrReplaceTempView(self, name):
        self.view = name


@pytest.fixture
def t():
    spark = _FakeSpark()
    tbl = IcebergTable(spark, "wh.crawl.purges", PURGES_SCHEMA, key="image_id")
    return spark, tbl


def test_satisfies_protocol(t):
    _, tbl = t
    assert isinstance(tbl, TableBackend)


def test_create_table_ddl(t):
    spark, _ = t
    ddl = spark.queries[0]
    assert ddl.startswith("CREATE TABLE IF NOT EXISTS wh.crawl.purges")
    assert "USING iceberg" in ddl
    assert "`image_id` string" in ddl and "`purge_seq` bigint" in ddl
    # v2 + merge-on-read deletes: delete_keys must be a tombstone write,
    # never a copy-on-write rewrite of payload data files
    assert "'format-version'='2'" in ddl
    assert "'write.delete.mode'='merge-on-read'" in ddl


def test_commit_ids_are_sequence_numbers(t):
    _, tbl = t
    assert tbl.commits() == [1, 2]
    assert tbl.last_commit() == 2
    assert tbl.commit_meta(1) == {"op": "seed", "n": 4}
    assert tbl.find_commit(op="merge") == 2
    assert tbl.find_commit(op="seed", n=4) == 1
    assert tbl.find_commit(op="nope") is None


def test_adopt_emits_add_files(t):
    spark, tbl = t
    cid = tbl.adopt("/stage/r00001/sink=p")
    assert cid == 2
    call = spark.queries[-2]  # last is the snapshots lookup
    assert call.startswith("CALL wh.system.add_files(")
    assert "table => 'wh.crawl.purges'" in call
    assert "source_table => '`parquet`.`/stage/r00001/sink=p`'" in call


def test_rollback_maps_seq_to_snapshot_id(t):
    spark, tbl = t
    tbl.rollback(1)
    assert spark.queries[-1] == (
        "CALL wh.system.rollback_to_snapshot('wh.crawl.purges', 777001)"
    )
    with pytest.raises(KeyError):
        tbl.rollback(99)


def test_delete_keys_emits_merge_on_read_delete(t):
    spark, tbl = t
    keys = _FakeKeysDF()
    tbl.delete_keys(keys)
    assert keys.view == "_weaver_delete_keys"
    merge = spark.queries[-2]
    assert merge.startswith("MERGE INTO wh.crawl.purges t USING _weaver_delete_keys d")
    assert "ON t.`image_id` = d.`image_id`" in merge
    assert merge.endswith("WHEN MATCHED THEN DELETE")


def test_vacuum_and_compact_procedures(t):
    spark, tbl = t
    tbl.vacuum()
    assert "CALL wh.system.remove_orphan_files(table => 'wh.crawl.purges')" in (
        spark.queries[-1]
    )
    tbl.compact(spark)
    assert any("system.rewrite_data_files" in q for q in spark.queries)
    assert any("system.expire_snapshots" in q for q in spark.queries)


def test_commit_files_uses_time_travel_over_files_meta(t):
    spark, tbl = t
    tbl.commit_files(2)
    assert (
        "SELECT file_path FROM wh.crawl.purges.files VERSION AS OF 777002"
        in spark.queries
    )


def test_replace_commit_files_is_explicitly_unsupported(t):
    _, tbl = t
    with pytest.raises(NotImplementedError):
        tbl.replace_commit_files(1, [])


def test_meta_round_trips_json(t):
    """Engine meta values survive the snapshot-property string channel."""
    spark, tbl = t

    class _W:
        def __init__(self):
            self.opts = {}

        def option(self, k, v):
            self.opts[k] = v
            return self

        def append(self):
            pass

    class _DF:
        def __init__(self):
            self.w = _W()

        def writeTo(self, ident):
            assert ident == "wh.crawl.purges"
            return self.w

    df = _DF()
    tbl.append(df, meta={"op": "merge", "round": 3})
    assert df.w.opts["snapshot-property.weaver.op"] == json.dumps("merge")
    assert df.w.opts["snapshot-property.weaver.round"] == "3"
