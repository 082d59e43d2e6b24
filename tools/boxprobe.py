"""One-number VM health probe: contiguous numpy mul-add throughput.

This box is time-shared and its numpy throughput collapses 15-60x for
multi-hour stretches with NO visible load (hypervisor steal — see
BASELINE.md "box-state warning").  Run this BEFORE recording any bench
number; re-run benches when the probe is healthy.

Usage: python tools/boxprobe.py
Prints {"elem_ops_per_sec": N, "healthy": bool} — healthy means the
10-rep contiguous 8.4M-element a*a+a loop finishes in under ~1.5 s
(>110M element-ops/s), the regime BASELINE.md's round-2 controls
were measured in (~700M/s).
"""

import json
import time

import numpy as np


def main() -> None:
    a = np.random.default_rng(0).uniform(size=8_400_000)
    t0 = time.time()
    for _ in range(10):
        _ = a * a + a
    dt = time.time() - t0
    rate = 10 * 2 * len(a) / dt
    print(json.dumps({
        "loop_sec": round(dt, 2),
        "elem_ops_per_sec": int(rate),
        "healthy": bool(dt < 1.5),
    }))


if __name__ == "__main__":
    main()
