"""Speedup-curve probe: one instrumented build pass per core count on a
fixed corpus, to locate the (N, 4N) pair where measured efficiency reflects
the dataflow rather than this single box's shared memory bus.

Context (2026-08-20): the shared-bus aggregate-bandwidth ceiling (probe8 ~
1.1 s best vs single-thread probe ~0.44 s => 8 streaming threads get only
~1.6x one core's bandwidth) taxes high core counts progressively harder as
the working set grows, so scaling the corpus (Gustafson) made the 2v8 ratio
WORSE at 2M docs (pairs 0.786/0.665) than at 600k. A real 4N-executor
cluster multiplies bandwidth 4x along with cores; this probe finds the
core-count range on THIS box where per-core bandwidth is still comparable
across levels, which is the honest emulation regime.

Usage: python scripts/speedup_curve.py [n_docs] [cores ...]
"""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from scaling_run import run_level  # noqa: E402


def main() -> None:
    n_docs = int(sys.argv[1]) if len(sys.argv) > 1 else 600000
    cores = [int(c) for c in sys.argv[2:]] or [1, 2, 4, 8]
    results = []
    for c in cores:
        r = run_level(c, n_docs)
        results.append(r)
    base = results[0]
    print(json.dumps({
        "n_docs": n_docs,
        "curve": [{"cores": r["cores"] if "cores" in r else c,
                   "wall_s": round(r["wall_s"], 1),
                   "speedup_vs_first": round(base["wall_s"] / r["wall_s"], 3),
                   "steal_frac": r["steal_frac"], "probe_s": r["probe_s"],
                   "probe_mt_s": r["probe_mt_s"]}
                  for c, r in zip(cores, results)],
    }, indent=1))


if __name__ == "__main__":
    main()
