"""DRAM-bandwidth ceiling measurement (VERDICT r3 item 1, option a).

Round 3 argued by decomposition that the 8->32 scaling median sits below
0.8 because the single box's memory bus saturates between width 8 and
width 32 — this script MEASURES that resource directly instead of
inferring it from subtraction.

Protocol: for each width w in (1, 2, 4, 8, 16, 32) spawn w worker
processes, pin worker i to core i (sched_setaffinity — same pinning model
as scripts/scaling_bench.py's taskset children), synchronize on a
barrier, and run a STREAM-style add kernel (``a[:] = b + c`` over float64
arrays far larger than the last-level cache) for a fixed wall interval.
Per-element traffic is ~32 B (read b, read c, write a, plus the
write-allocate read of a). Reported per width:

- ``agg_gbps``: total bytes moved by all workers / the common window —
  the machine's aggregate DRAM bandwidth at that concurrency;
- ``per_core_gbps``: agg / w — what one core actually gets.

The bus-ceiling claim is confirmed iff agg_gbps plateaus while w grows
8->32: per-core bandwidth then collapses ~4x, and no scheduling of a
memory-traffic-bound kernel (Arrow deserialize + string compare is one)
can scale 4x on one box. On a real 4-node cluster each node brings its
own bus — which is why the 2->8 pair (both widths under the ceiling) is
the pair that models executor scale-out (BENCH.md).

Usage: python scripts/membw.py            # full sweep, one JSON line
       MEMBW_SECONDS=2 MEMBW_MB=256 ...   # knobs
"""

from __future__ import annotations

import json
import multiprocessing as mp
import os
import time

import numpy as np

BYTES_PER_ELEM = 32  # rb + rc + wa + write-allocate(a), float64 add kernel


def _worker(core: int, n: int, seconds: float, barrier, out_q) -> None:
    try:
        os.sched_setaffinity(0, {core})
    except OSError:
        pass
    a = np.zeros(n, dtype=np.float64)
    b = np.ones(n, dtype=np.float64)
    c = np.full(n, 2.0, dtype=np.float64)
    np.add(b, c, out=a)  # touch pages before the timed window
    barrier.wait()
    t0 = time.perf_counter()
    reps = 0
    while True:
        np.add(b, c, out=a)
        reps += 1
        if time.perf_counter() - t0 >= seconds:
            break
    elapsed = time.perf_counter() - t0
    out_q.put((core, reps, elapsed))


def measure(width: int, mb_per_array: int, seconds: float) -> dict:
    n = mb_per_array * 1024 * 1024 // 8
    barrier = mp.Barrier(width)
    q: mp.Queue = mp.Queue()
    procs = [
        mp.Process(target=_worker, args=(i, n, seconds, barrier, q))
        for i in range(width)
    ]
    for p in procs:
        p.start()
    rows = [q.get(timeout=120) for _ in procs]
    for p in procs:
        p.join(timeout=60)
    total_bytes = sum(r[1] for r in rows) * n * BYTES_PER_ELEM
    window = max(r[2] for r in rows)
    agg = total_bytes / window / 1e9
    return {
        "width": width,
        "agg_gbps": round(agg, 2),
        "per_core_gbps": round(agg / width, 2),
        "reps": sorted(r[1] for r in rows),
    }


def main() -> None:
    seconds = float(os.environ.get("MEMBW_SECONDS", "2.0"))
    mb = int(os.environ.get("MEMBW_MB", "256"))
    rounds = int(os.environ.get("MEMBW_ROUNDS", "5"))
    widths = [
        int(w)
        for w in os.environ.get("MEMBW_WIDTHS", "1,2,4,8,16,32").split(",")
    ]
    # interleave widths across rounds (w1 w2 ... wN, repeat): the sandbox
    # VM has bursty steal, and a per-width MAX over co-windowed rounds is
    # the cleanest observation of the machine's capability at that width
    # (same estimator rationale as scripts/scaling_bench.py)
    best: dict[int, dict] = {}
    for r in range(rounds):
        for w in widths:
            m = measure(w, mb, seconds)
            print(f"# round {r} width {w}: {m}", flush=True)
            if w not in best or m["agg_gbps"] > best[w]["agg_gbps"]:
                best[w] = m
    sweep = [best[w] for w in widths]
    by_w = {r["width"]: r["agg_gbps"] for r in sweep}
    report = {"kernel": "numpy float64 add (STREAM-style)",
              "array_mb": mb, "window_s": seconds, "sweep": sweep}
    if 8 in by_w and 32 in by_w:
        # the headline number: how much MORE aggregate bandwidth width 32
        # gets over width 8. 4.0 = perfectly private buses; ~1.0 = one
        # shared saturated bus.
        report["bw_gain_8_to_32"] = round(by_w[32] / by_w[8], 3)
    if 2 in by_w and 8 in by_w:
        report["bw_gain_2_to_8"] = round(by_w[8] / by_w[2], 3)
    print(json.dumps(report))


if __name__ == "__main__":
    mp.set_start_method("spawn")
    main()
