#!/usr/bin/env python
"""Attribution probe for the N-vs-4N scaling gap (BENCH/BASELINE.md).

Runs P identical pinned worker processes (one per core, cores 0..P-1) and
measures per-process rates for three kernels:

  alu    — pure-register integer loop (no memory traffic beyond L1)
  dram   — streaming numpy float32 passes over a 64 MB buffer (LLC-busting)
  payload— the actual fetch-stage per-URL work (gen_pixels+encode+phash)

If `alu` per-core rate holds flat from 8 -> 32 procs while `payload` drops,
the gap is the shared memory system (or zlib page traffic), not hypervisor
overcommit; if `alu` itself drops, the guest does not actually get 32
cores' worth of cycles and no code change can reach 0.8 on this box.
Steal time is read from /proc/stat around each burst.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

DUR = float(os.environ.get("PROBE_SECONDS", "6"))


def _steal_jiffies() -> int:
    with open("/proc/stat") as f:
        parts = f.readline().split()
    # cpu user nice system idle iowait irq softirq steal ...
    return int(parts[8]) if len(parts) > 8 else 0


def kernel_alu(dur: float) -> float:
    t0 = time.perf_counter()
    n = 0
    x = 1
    while time.perf_counter() - t0 < dur:
        for _ in range(100_000):
            x = (x * 1103515245 + 12345) & 0x7FFFFFFF
        n += 100_000
    return n / (time.perf_counter() - t0)


def kernel_dram(dur: float) -> float:
    import numpy as np

    buf = np.ones(16 * 1024 * 1024, dtype=np.float32)  # 64 MB
    t0 = time.perf_counter()
    n = 0
    while time.perf_counter() - t0 < dur:
        buf *= np.float32(1.0000001)
        n += 1
    return n * buf.nbytes * 2 / (time.perf_counter() - t0)  # bytes/s r+w


def kernel_payload(dur: float) -> float:
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    from weaver_spark.webgen import gen_payload

    t0 = time.perf_counter()
    n = 0
    while time.perf_counter() - t0 < dur:
        gen_payload(f"img_{n % 100000:08d}", 42)
        n += 1
    return n / (time.perf_counter() - t0)


def worker(kind: str) -> None:
    fn = {"alu": kernel_alu, "dram": kernel_dram, "payload": kernel_payload}[kind]
    print(json.dumps({"rate": fn(DUR)}))


def burst(kind: str, procs: int) -> dict:
    s0 = _steal_jiffies()
    t0 = time.perf_counter()
    ps = []
    for i in range(procs):
        cmd = ["taskset", "-c", str(i), sys.executable, os.path.abspath(__file__), "--worker", kind]
        ps.append(subprocess.Popen(cmd, stdout=subprocess.PIPE, text=True))
    rates = []
    for p in ps:
        out, _ = p.communicate()
        rates.append(json.loads(out.strip().splitlines()[-1])["rate"])
    wall = time.perf_counter() - t0
    steal = _steal_jiffies() - s0
    return {
        "procs": procs,
        "mean_rate": sum(rates) / len(rates),
        "min_rate": min(rates),
        "max_rate": max(rates),
        "steal_jiffies": steal,
        "steal_cores": round(steal / 100.0 / wall, 2),
    }


def main() -> None:
    if "--worker" in sys.argv:
        worker(sys.argv[sys.argv.index("--worker") + 1])
        return
    procs = [int(x) for x in os.environ.get("PROBE_PROCS", "8,32").split(",")]
    kinds = os.environ.get("PROBE_KINDS", "alu,dram,payload").split(",")
    out = {}
    for kind in kinds:
        lo = burst(kind, procs[0])
        hi = burst(kind, procs[1])
        out[kind] = {
            f"p{procs[0]}": lo,
            f"p{procs[1]}": hi,
            "per_core_ratio": round(hi["mean_rate"] / lo["mean_rate"], 3),
        }
        print(kind, json.dumps(out[kind]), file=sys.stderr)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
