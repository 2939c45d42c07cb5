"""Arg-surface test for the spark-submit entry point (no Spark session
needed — the launch contract is part of the public API)."""

import importlib.util
import os

spec = importlib.util.spec_from_file_location(
    "crawl_job",
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                 "scripts", "crawl_job.py"),
)
crawl_job = importlib.util.module_from_spec(spec)
spec.loader.exec_module(crawl_job)


def test_defaults():
    a = crawl_job.parse_args(["--warehouse", "/tmp/wh"])
    assert a.mode == "scale" and not a.http and not a.robots
    assert a.seen_filter == "exact" and a.compact_every == 8
    assert a.max_rounds == 100 and a.max_concurrency == 16


def test_http_requires_seeds():
    import pytest

    with pytest.raises(SystemExit):  # argparse usage error, not TypeError
        crawl_job.parse_args(["--warehouse", "/tmp/wh", "--http"])


def test_classify_rule_validation():
    import pytest

    a = crawl_job.parse_args(
        ["--warehouse", "/w", "--classify", r"/cat/\d+=root",
         "--classify", "/item/=leaf"]
    )
    assert a.classify_rules == [(r"/cat/\d+", "root"), ("/item/", "leaf")]
    for bad in ("=root", "/x/", "/x/=dummy", "/x/=page"):
        with pytest.raises(SystemExit):  # empty regex / bad type rejected
            crawl_job.parse_args(["--warehouse", "/w", "--classify", bad])


def test_full_production_shape():
    a = crawl_job.parse_args([
        "--warehouse", "hdfs:///wh", "--seeds", "seeds.txt", "--http",
        "--robots", "--seen-filter", "cuckoo", "--host-budget", "64",
        "--k-cap", "6", "--track-leases",
    ])
    assert a.http and a.robots and a.seen_filter == "cuckoo"
    assert a.host_budget == 64 and a.k_cap == 6 and a.track_leases
