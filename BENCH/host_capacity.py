"""Measure THIS host's own 2-core -> 8-core compute capacity ratio.

The scaling criterion presumes the 4N level has 4x the hardware of the N
level — true on a real cluster (4x executors = 4x machines), but on a
single VM 8 pinned cores are not automatically 4x the silicon of 2
pinned cores: shared turbo headroom, SMT sibling pairing, a shared
memory controller, and hypervisor oversubscription all take their cut
exactly and only at the wider level. This probe runs the IDENTICAL
fixed-work loop as K concurrent taskset-pinned processes (K = 1, 2, 8)
and reports the aggregate-rate ratio 8v2 — the ceiling the OS itself
delivers to ANY engine on this box, measured with zero Spark, zero
shuffle, zero memory pressure.

Two workloads:
- cpu: pure-Python integer arithmetic (no allocation, no bandwidth) —
  isolates clock + scheduling effects.
- mem: strided sums over a per-process 64 MiB bytearray — adds the
  shared-memory-controller effect a columnar engine actually feels.

Usage: python BENCH/host_capacity.py [seconds_per_level]
Prints one JSON line; paste the numbers into BASELINE.md.
"""

from __future__ import annotations

import json
import subprocess
import sys
import time

WORK = {
    "cpu": r"""
import time, sys
t_end = time.perf_counter() + {secs}
it = 0
while time.perf_counter() < t_end:
    s = 0
    for i in range(100_000):
        s += i * i
    it += 1
print(it)
""",
    "mem": r"""
import time, sys
buf = bytearray(64 * 1024 * 1024)
mv = memoryview(buf)
t_end = time.perf_counter() + {secs}
it = 0
while time.perf_counter() < t_end:
    s = 0
    # strided touch defeats tiny-cache residency; int() keeps it cheap
    for off in range(0, len(mv), 4096):
        s += mv[off]
    buf[it % len(buf)] = s & 0xFF
    it += 1
print(it)
""",
}


def run_level(kind: str, nprocs: int, secs: float) -> float:
    code = WORK[kind].format(secs=secs)
    procs = [
        subprocess.Popen(
            ["taskset", "-c", str(c), sys.executable, "-c", code],
            stdout=subprocess.PIPE, text=True,
        )
        for c in range(nprocs)
    ]
    total = 0
    for p in procs:
        out, _ = p.communicate()
        total += int(out.strip().splitlines()[-1])
    return total / secs


def main() -> None:
    secs = float(sys.argv[1]) if len(sys.argv) > 1 else 10.0
    result: dict = {"seconds_per_level": secs}
    for kind in ("cpu", "mem"):
        r1 = run_level(kind, 1, secs)
        r2 = run_level(kind, 2, secs)
        r8 = run_level(kind, 8, secs)
        result[kind] = {
            "rate_1": round(r1, 1),
            "rate_2": round(r2, 1),
            "rate_8": round(r8, 1),
            "speedup_2_8": round(r8 / r2, 3),
            "capacity_efficiency_2_8": round(r8 / r2 / 4.0, 3),
        }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
