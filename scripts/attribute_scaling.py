"""Attribute the strong-scaling A-leg residual (join+tile 0.77 vs B 0.84,
BENCH.md round 2) to hardware bandwidth vs engine overhead — VERDICT r2 #10.

Method: measure two Spark-free kernels at the SAME two configurations the
scaling bench uses, with every core busy in both legs:

* **mem** — a streaming triad (c = 2a + b over out-of-LLC arrays): pure
  memory bandwidth, the resource the JVM join+tile leg is bound by (hash
  probe + wide scan, no Python).
* **cache** — the identical arithmetic over L2-resident arrays: pure core
  compute, no bandwidth pressure.

Per-core rate is measured (a) with all 32 cores running the kernel
("32-busy"), and (b) on 8 pinned cores while the other 24 run the same
kernel as antagonists ("loaded-8") — exactly the load-equalized strong-
scaling geometry of scripts/bench_scaling.py.  The ratio
``rate_32busy / rate_loaded8`` is the hardware's own per-core scaling
ceiling for that resource class, with NO Spark, NO JVM, NO shuffle:

* if mem ≈ the A-leg's 0.77 while cache ≈ 1.0, the A-leg residual is the
  box's bandwidth ceiling, not engine scheduling;
* if mem ≈ 1.0 too, the residual would be engine-side (fix needed).

Appends the verdict paragraph to BENCH.md and writes
scaling_attrib.json.  Runtime ~4 min.
"""

from __future__ import annotations

import json
import multiprocessing as mp
import os
import statistics
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
MEM_MB = 256  # per array — far beyond LLC: streaming
CACHE_KB = 256  # per array — L2-resident
N_CORES = os.cpu_count() or 32


def _arrays(bytes_per: int):
    n = bytes_per // 8
    rng = np.random.default_rng(1)
    return rng.random(n), rng.random(n), np.empty(n)


def _kernel_once(a, b, c):
    np.multiply(a, 2.0, out=c)
    np.add(c, b, out=c)


def worker(core: int, bytes_per: int, seconds: float, q: "mp.Queue") -> None:
    os.sched_setaffinity(0, {core})
    a, b, c = _arrays(bytes_per)
    _kernel_once(a, b, c)  # warm/fault pages
    t0 = time.time()
    iters = 0
    while time.time() - t0 < seconds:
        _kernel_once(a, b, c)
        iters += 1
    dt = time.time() - t0
    # bytes moved per kernel: 2 passes × (read a/c + read b + write c)
    q.put((core, iters * 5 * len(a) * 8 / dt / 1e9))


def antagonist(core: int, bytes_per: int) -> None:
    os.sched_setaffinity(0, {core})
    a, b, c = _arrays(bytes_per)
    while True:
        _kernel_once(a, b, c)


def measure(measured: list[int], ants: list[int], bytes_per: int,
            seconds: float) -> float:
    q: "mp.Queue" = mp.Queue()
    ant_procs = [
        mp.Process(target=antagonist, args=(c, bytes_per), daemon=True)
        for c in ants
    ]
    for p in ant_procs:
        p.start()
    time.sleep(2.0)  # antagonists reach steady state
    ws = [
        mp.Process(target=worker, args=(c, bytes_per, seconds, q))
        for c in measured
    ]
    for w in ws:
        w.start()
    rates = [q.get()[1] for _ in measured]
    for w in ws:
        w.join()
    for p in ant_procs:
        p.terminate()
    for p in ant_procs:
        p.join()
    return statistics.median(rates)


def main() -> None:
    seconds = float(sys.argv[1]) if len(sys.argv) > 1 else 6.0
    rounds = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    all_cores = list(range(N_CORES))
    small = all_cores[:8]
    rest = all_cores[8:]
    out: dict[str, list[float]] = {
        "mem_32busy": [], "mem_loaded8": [],
        "cache_32busy": [], "cache_loaded8": [],
    }
    for _ in range(rounds):  # interleave legs: same weather for both
        out["mem_32busy"].append(
            measure(all_cores, [], MEM_MB * 1024 * 1024, seconds)
        )
        out["mem_loaded8"].append(
            measure(small, rest, MEM_MB * 1024 * 1024, seconds)
        )
        out["cache_32busy"].append(
            measure(all_cores, [], CACHE_KB * 1024, seconds)
        )
        out["cache_loaded8"].append(
            measure(small, rest, CACHE_KB * 1024, seconds)
        )
    med = {k: statistics.median(v) for k, v in out.items()}
    mem_ceiling = med["mem_32busy"] / med["mem_loaded8"]
    cache_ceiling = med["cache_32busy"] / med["cache_loaded8"]
    res = {
        "per_core_GBps": {k: round(v, 2) for k, v in med.items()},
        "mem_scaling_ceiling": round(mem_ceiling, 3),
        "cache_scaling_ceiling": round(cache_ceiling, 3),
        "rounds": rounds,
        "seconds_per_leg": seconds,
        "method": (
            "spark-free numpy triad; per-core rate all-32-busy vs "
            "loaded-8 (24 same-kernel antagonists); medians of "
            f"{rounds} interleaved rounds"
        ),
    }
    with open(os.path.join(REPO, "scaling_attrib.json"), "w") as f:
        json.dump(res, f, indent=1)
    stamp = time.strftime("%Y-%m-%d %H:%M")
    if mem_ceiling < 0.9 <= cache_ceiling:
        reading = (
            f"the box's memory subsystem delivers only ~{mem_ceiling:.0%} "
            "of the loaded-8 per-core bandwidth when all 32 cores stream "
            "while compute holds — a hardware bandwidth ceiling; the "
            "A-leg residual is attributable to the VM, not the engine."
        )
    else:
        reading = (
            "per-core throughput HOLDS from loaded-8 to 32-busy for both "
            f"resource classes (mem {mem_ceiling:.2f}, cache "
            f"{cache_ceiling:.2f}) — no hardware ceiling at this working-"
            "set size; the A-leg residual must come from antagonist-"
            "profile mismatch or JVM thread-scaling costs (see "
            "scripts/attribute_scaling2.py)."
        )
    para = f"""
### Strong-scaling A-leg attribution ({stamp})

Spark-free control experiment (`scripts/attribute_scaling.py`): the same
load-equalized 8-vs-32 geometry as the scaling bench, applied to a pure
numpy streaming triad (the memory-bandwidth resource class of the JVM
join+tile leg) and to an L2-resident variant of the identical arithmetic
(pure compute).  Per-core rates, medians of {rounds} interleaved rounds:

| kernel | 32-busy (GB/s/core) | loaded-8 (GB/s/core) | ratio |
|---|---|---|---|
| streaming triad (memory-bound) | {med['mem_32busy']:.2f} | {med['mem_loaded8']:.2f} | **{mem_ceiling:.3f}** |
| L2-resident (compute-bound) | {med['cache_32busy']:.2f} | {med['cache_loaded8']:.2f} | **{cache_ceiling:.3f}** |

Reading: {reading}
"""
    with open(os.path.join(REPO, "BENCH.md"), "a") as f:
        f.write(para)
    print(json.dumps(res))


if __name__ == "__main__":
    main()
