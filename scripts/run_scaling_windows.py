"""Round-6 scaling-window driver — executes BENCH/PROTOCOL_r6.md exactly.

One `bench.py --scaling` invocation = one window (pinned legs, repeats
alternating between legs, pre+post ALU probes, per-window admission
flag computed inside bench.run_scaling from the pre-declared rule
min(pre, post) ALU per-core ratio >= 0.95). This driver adds ONLY the
pre-declared loop/stop logic — it never looks at a window's crawl ratio
before deciding to keep it:

  * every window is saved raw to BENCH/scaling_r6_window{K}.json,
    admitted or not;
  * run back-to-back until >= 3 windows are ADMITTED, capped at
    MAX_WINDOWS=6 total;
  * print the aggregate (median of admitted, median of all) at the end.

Usage: python scripts/run_scaling_windows.py
(an interrupted run resumes automatically: existing
BENCH/scaling_r6_window{K}.json files are reloaded and numbering
continues at the next free index)."""

from __future__ import annotations

import json
import os
import statistics
import subprocess
import sys

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
BENCH_DIR = os.path.join(HERE, "BENCH")
TARGET_ADMITTED = 3
MAX_WINDOWS = 6


def _existing() -> list[dict]:
    out = []
    k = 1
    while True:
        p = os.path.join(BENCH_DIR, f"scaling_r6_window{k}.json")
        if not os.path.exists(p):
            return out
        with open(p) as f:
            out.append(json.load(f))
        k += 1


def _run_window(k: int) -> dict:
    p = subprocess.run(
        [sys.executable, os.path.join(HERE, "bench.py"), "--scaling"],
        capture_output=True,
        text=True,
        cwd=HERE,
    )
    # surface a crashed/empty bench run with its stderr instead of an
    # opaque IndexError/JSONDecodeError aborting a multi-hour battery
    if p.returncode != 0 or not p.stdout.strip():
        raise RuntimeError(
            f"window {k}: bench.py --scaling failed "
            f"(rc={p.returncode}); stderr tail:\n"
            + "\n".join(p.stderr.strip().splitlines()[-15:])
        )
    line = p.stdout.strip().splitlines()[-1]
    try:
        out = json.loads(line)
    except json.JSONDecodeError as e:
        raise RuntimeError(
            f"window {k}: bench.py --scaling printed a non-JSON last "
            f"line ({line[:200]!r}); stderr tail:\n"
            + "\n".join(p.stderr.strip().splitlines()[-15:])
        ) from e
    with open(os.path.join(BENCH_DIR, f"scaling_r6_window{k}.json"), "w") as f:
        json.dump(out, f, indent=1)
    return out


def main() -> None:
    windows = _existing()
    print(f"resuming with {len(windows)} existing windows", flush=True)
    while len(windows) < MAX_WINDOWS:
        admitted = [w for w in windows if w.get("window_admitted")]
        if len(admitted) >= TARGET_ADMITTED:
            break
        k = len(windows) + 1
        print(f"window {k}: running...", flush=True)
        w = _run_window(k)
        windows.append(w)
        print(
            f"window {k}: eff={w['value']} admitted={w.get('window_admitted')} "
            f"alu_pre={(w.get('alu_probe') or {}).get('per_core_ratio')} "
            f"alu_post={(w.get('alu_probe_post') or {}).get('per_core_ratio')}",
            flush=True,
        )
    admitted = [w for w in windows if w.get("window_admitted")]
    summary = {
        "windows": [w["value"] for w in windows],
        "admitted": [w["value"] for w in admitted],
        "median_all": round(statistics.median(w["value"] for w in windows), 3)
        if windows
        else None,
        "median_admitted": round(
            statistics.median(w["value"] for w in admitted), 3
        )
        if admitted
        else None,
        "n_windows": len(windows),
        "n_admitted": len(admitted),
    }
    print(json.dumps(summary), flush=True)


if __name__ == "__main__":
    main()
