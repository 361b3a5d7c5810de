"""Two-executor emulation for the 8->32 scaling question (VERDICT r3
item 1, option b).

Round 3's claim: the 8->32 single-box scaling median sits below 0.8
because widths past ~8-16 saturate the box's DRAM bus — a machine-shared
resource no scheduling can route around — while a real 4x scale-out adds
4 private buses. This script tests the claim by *construction*: run the
IDENTICAL scoring workload (scripts/scaling_bench.child — same input,
same kernels, same pinning model) as

- ``single32``: one JVM, local[32], pinned to cores 0-31;
- ``dual16``:   two INDEPENDENT JVMs, each local[16], pinned to the
  disjoint core sets 0-15 and 16-31, started simultaneously, each
  scoring the full candidate set.

Interpretation is a clean fork:

- dual16 aggregate throughput ~= single32 throughput  =>  the width-32
  shortfall is NOT JVM-internal (GC, Python-worker contention, scheduler,
  lock convoys) — two separate JVMs with nothing shared but the machine
  hit the same ceiling, so the saturated resource is machine-level
  (DRAM bus; scripts/membw.py measures it directly).
- dual16 aggregate >> single32  =>  the shortfall would have been
  JVM/Spark-internal and fixable in-process.

Also runs ``single16`` (one JVM local[16] on cores 0-15, the other 16
cores IDLE) as the private-bus reference point: dual16's per-JVM
throughput vs single16's shows exactly how much one 16-wide executor
loses when a co-resident executor competes for the bus — on a real
cluster (one executor per host) that loss is zero, which is why the
2->8 pair below DRAM saturation is the pair that models scale-out.

Usage: python scripts/dual_jvm16.py   # one JSON line
       SCALING_ROUNDS=5 DUAL_REPEATS=2 ...
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
CHILD = os.path.join(REPO, "scripts", "scaling_bench.py")


def start_child(cpus: int, cores: str) -> subprocess.Popen:
    return subprocess.Popen(
        [
            "taskset", "-c", cores,
            sys.executable, CHILD, "--child", str(cpus),
        ],
        stdout=subprocess.PIPE,
        stderr=subprocess.DEVNULL,
        text=True,
        cwd=REPO,
    )


def collect(p: subprocess.Popen) -> dict:
    out, _ = p.communicate(timeout=1800)
    return json.loads(out.strip().splitlines()[-1])


def run_single(cpus: int, cores: str) -> dict:
    t0 = time.time()
    r = collect(start_child(cpus, cores))
    r["wall"] = round(time.time() - t0, 1)
    return r


def run_dual16() -> dict:
    pa = start_child(16, "0-15")
    pb = start_child(16, "16-31")
    ra, rb = collect(pa), collect(pb)
    return {
        "jvm_a": ra,
        "jvm_b": rb,
        # each JVM scores the full candidate set once per round; the two
        # run concurrently, so machine throughput is the sum of rates
        "agg_pairs_per_sec": round(
            ra["pairs_per_sec"] + rb["pairs_per_sec"], 1
        ),
    }


def main() -> None:
    repeats = int(os.environ.get("DUAL_REPEATS", "2"))
    os.environ.setdefault("SCALING_ROUNDS", "5")
    singles32, singles16, duals = [], [], []
    for i in range(repeats):
        # interleave configs so each comparison shares a noise window
        s32 = run_single(32, "0-31")
        d16 = run_dual16()
        s16 = run_single(16, "0-15")
        print(
            f"# round {i}: single32 {s32['pairs_per_sec']}/s, dual16 "
            f"{d16['agg_pairs_per_sec']}/s (a {d16['jvm_a']['pairs_per_sec']}"
            f" b {d16['jvm_b']['pairs_per_sec']}), single16 "
            f"{s16['pairs_per_sec']}/s",
            file=sys.stderr, flush=True,
        )
        singles32.append(s32)
        singles16.append(s16)
        duals.append(d16)
    best32 = max(singles32, key=lambda r: r["pairs_per_sec"])
    best16 = max(singles16, key=lambda r: r["pairs_per_sec"])
    bestd = max(duals, key=lambda r: r["agg_pairs_per_sec"])
    thr32 = best32["pairs_per_sec"]
    thr16 = best16["pairs_per_sec"]
    thrd = bestd["agg_pairs_per_sec"]
    report = {
        "n_pairs": best32["n_pairs"],
        "single32_pairs_per_sec": thr32,
        "single16_pairs_per_sec": thr16,
        "dual16_agg_pairs_per_sec": thrd,
        "dual16_per_jvm": [
            bestd["jvm_a"]["pairs_per_sec"], bestd["jvm_b"]["pairs_per_sec"]
        ],
        # ~1.0 => the 32-wide shortfall is machine-shared, not JVM-internal
        "dual16_vs_single32": round(thrd / thr32, 3),
        # how much a 16-wide JVM loses to a co-resident competitor; 0 on a
        # one-executor-per-host cluster
        "coresidency_loss_pct": round(100 * (1 - (thrd / 2) / thr16), 1),
        # what 2x 16-wide PRIVATE-bus hosts would deliver (each runs like
        # the uncontended single16): the multi-node extrapolation
        "private_bus_2x16_extrapolation": round(2 * thr16, 1),
        "rounds": {
            "single32": [r["pairs_per_sec"] for r in singles32],
            "single16": [r["pairs_per_sec"] for r in singles16],
            "dual16_agg": [r["agg_pairs_per_sec"] for r in duals],
        },
    }
    print(json.dumps(report))


if __name__ == "__main__":
    main()
