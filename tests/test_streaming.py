"""Structured Streaming: continuous enqueue into the frontier table and
watermarked event-time window metrics (SURVEY.md T-category upgrades)."""

import json
import os

from pyspark.sql import functions as F

from weaver_spark.engine import CrawlEngine
from weaver_spark.streaming.frontier_stream import host_window_counts, stream_enqueue


def _drop(drop_dir: str, name: str, rows: list[dict]) -> None:
    os.makedirs(drop_dir, exist_ok=True)
    with open(os.path.join(drop_dir, name), "w") as f:
        for r in rows:
            f.write(json.dumps(r) + "\n")


def test_stream_enqueue_appends_frontier(spark, tmp_path):
    wh = str(tmp_path / "wh")
    drop = str(tmp_path / "drop")
    ckpt = str(tmp_path / "ckpt")
    eng = CrawlEngine(spark, wh, mode="reproduction")
    _drop(
        drop,
        "a.jsonl",
        [
            {"url": "HTTP://H1.TEST:80/item/1?utm_source=x", "url_type": "leaf", "priority": 1, "ts": "2024-01-01T00:00:01Z"},
            {"url": "http://h2.test/cat/0", "url_type": "root", "priority": 0, "ts": "2024-01-01T00:00:00Z"},
        ],
    )
    q = stream_enqueue(eng, drop, ckpt, available_now=True)
    q.awaitTermination(120)
    state = eng.frontier.latest_state(spark).orderBy("enqueue_seq").collect()
    assert [r["url"] for r in state] == [
        "http://h2.test/cat/0",  # earlier ts -> lower seq
        "http://h1.test/item/1",  # canonicalized
    ]
    assert [r["enqueue_seq"] for r in state] == [0, 1]
    assert all(r["status"] == "pending" for r in state)

    # second drop continues the sequence — exactly-once per micro-batch
    _drop(drop, "b.jsonl", [
        {"url": "http://h3.test/item/9", "url_type": "leaf", "priority": 0, "ts": "2024-01-01T00:01:00Z"},
    ])
    q2 = stream_enqueue(eng, drop, ckpt, available_now=True)
    q2.awaitTermination(120)
    state = eng.frontier.latest_state(spark).orderBy("enqueue_seq").collect()
    assert len(state) == 3
    assert state[2]["url"] == "http://h3.test/item/9"
    assert state[2]["enqueue_seq"] == 2


def test_host_window_counts_watermark(spark, tmp_path):
    drop = str(tmp_path / "drop2")
    ckpt = str(tmp_path / "ckpt2")
    rows = [
        {"url": f"http://h{i % 2}.test/item/{i}", "url_type": "leaf", "priority": 0,
         "ts": f"2024-01-01T00:00:{i:02d}Z"}
        for i in range(20)
    ]
    _drop(drop, "w.jsonl", rows)
    agg = host_window_counts(spark, drop, window="10 seconds", watermark="1 minute")
    q = (
        agg.writeStream.format("memory")
        .queryName("host_counts")
        .outputMode("complete")
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = spark.sql("SELECT * FROM host_counts").collect()
    # 20 events over 20s -> two 10s windows x 2 hosts
    assert len(got) == 4
    assert sum(r["n"] for r in got) == 20
    assert {r["host"] for r in got} == {"h0.test", "h1.test"}
