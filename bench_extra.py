#!/usr/bin/env python
"""Round-7 optimization measurement harness (bench.py stays frozen).

Times every registry query at $SPARK_GRAFT_SF_DIR with BOTH estimators:

- ``count``  — the frozen bench's methodology (fn(spark, sf).count()),
  the number the driver's PERF comparison actually grades;
- ``noop``   — guide §1.4 full-materialization via the noop sink, which
  computes every column (count() lets Catalyst prune), so plan-level
  wins/regressions can't hide behind count-pruning.

Also dumps .explain("formatted") per query to plans/r07/<q>_<tag>.txt.

Usage:
  python bench_extra.py [--tag before] [--reps 3] [--queries a,b,c]
                        [--no-noop] [--no-plans]
Prints one JSON line: {"sf":..., "count": {q: [s,...]}, "noop": {...}}.
"""

from __future__ import annotations

import argparse
import io
import json
import os
import time
from contextlib import redirect_stdout

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf1.0")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
HERE = os.path.dirname(os.path.abspath(__file__))


def _spark():
    from weaver_spark.session import get_spark

    spark = get_spark(
        app_name="weaver_bench_extra",
        master=f"local[{CPUS}]",
        shuffle_partitions=CPUS,
    )
    spark.sparkContext.setLogLevel("ERROR")
    return spark


def capture_plan(df) -> str:
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--tag", default="before")
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--queries", default="")
    ap.add_argument("--no-noop", action="store_true")
    ap.add_argument("--no-plans", action="store_true")
    args = ap.parse_args()

    from weaver_spark.queries import REGISTRY

    names = (
        [q for q in args.queries.split(",") if q]
        if args.queries
        else list(REGISTRY)
    )
    spark = _spark()
    plans_dir = os.path.join(HERE, "plans", "r07")
    os.makedirs(plans_dir, exist_ok=True)

    out: dict = {"sf": SF_DIR, "cpus": CPUS, "count": {}, "noop": {}}
    for name in names:
        fn, _sql = REGISTRY[name]
        if not args.no_plans:
            with open(os.path.join(plans_dir, f"{name}_{args.tag}.txt"), "w") as f:
                f.write(capture_plan(fn(spark, SF_DIR)))
        cts, nps = [], []
        for _ in range(args.reps):
            spark.sparkContext.setJobDescription(f"{name}: count ({args.tag})")
            t0 = time.perf_counter()
            fn(spark, SF_DIR).count()
            cts.append(round(time.perf_counter() - t0, 3))
            if not args.no_noop:
                spark.sparkContext.setJobDescription(f"{name}: noop ({args.tag})")
                t0 = time.perf_counter()
                fn(spark, SF_DIR).write.format("noop").mode("overwrite").save()
                nps.append(round(time.perf_counter() - t0, 3))
        spark.sparkContext.setJobDescription(None)
        out["count"][name] = cts
        if nps:
            out["noop"][name] = nps
        print(f"# {name}: count={cts} noop={nps}", flush=True)
        spark.catalog.clearCache()  # queries that persist() must not leak
    print(json.dumps(out))


if __name__ == "__main__":
    main()
