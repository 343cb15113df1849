"""Two-parallelism scaling evidence for the north rule's N -> 4N criterion.

No real cluster exists in this sandbox, so (per driver instructions) we run the
SAME index-build job on the SAME deterministic input at local[N] and local[4N]
in separate JVMs and report throughput at both plus scaling efficiency
  eff = (T_N / T_4N) / 4
into BENCH.md (and a summary line the round report can cite).

The job is the full write path over a generated corpus large enough that fixed
Spark startup/commit overhead does not dominate (SPARK_SCALING_DOCS docs,
default 40000).
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

CHILD = r"""
import json, os, shutil, sys, time
sys.path.insert(0, {repo!r})
from lucene_7_x_9_x_spark.corpus import generate_corpus
from lucene_7_x_9_x_spark.index.builder import build_index
from lucene_7_x_9_x_spark.session import get_spark

cores = int(sys.argv[1]); n_docs = int(sys.argv[2])
spark = get_spark("scaling", cores=cores, shuffle_partitions=cores)
spark.sparkContext.setLogLevel("ERROR")
corpus = generate_corpus(spark, n_docs, num_partitions=max(cores * 4, 8))
# materialize the corpus once so generation cost is excluded from the measure
src = f"/tmp/lucene_scaling_corpus_{{n_docs}}"
if not os.path.exists(os.path.join(src, "_SUCCESS")):
    shutil.rmtree(src, ignore_errors=True)
    corpus.select("url", "text").write.parquet(src)
docs = spark.read.parquet(src)
idx = f"/tmp/lucene_scaling_idx_{{cores}}_{{os.getpid()}}"
shutil.rmtree(idx, ignore_errors=True)
t0 = time.time()
build_index(spark, docs, key_col="url", text_col="text", index_dir=idx,
            docs_per_segment=4096, term_shards=max(cores, 8))
wall = time.time() - t0
shutil.rmtree(idx, ignore_errors=True)
print("SCALING_RESULT " + json.dumps({{"cores": cores, "wall_s": wall,
                                      "docs_per_sec": n_docs / wall}}))
"""


def run_level(cores: int, n_docs: int) -> dict:
    script = CHILD.format(repo=REPO)
    out = subprocess.run(
        [sys.executable, "-c", script, str(cores), str(n_docs)],
        capture_output=True, text=True, timeout=3600)
    for line in out.stdout.splitlines():
        if line.startswith("SCALING_RESULT "):
            return json.loads(line[len("SCALING_RESULT "):])
    raise RuntimeError(f"no result from cores={cores}:\n{out.stdout[-2000:]}\n"
                       f"{out.stderr[-2000:]}")


def main() -> None:
    n = int(os.environ.get("SPARK_SCALING_N", "8"))
    n_docs = int(os.environ.get("SPARK_SCALING_DOCS", "40000"))
    lo = run_level(n, n_docs)
    hi = run_level(4 * n, n_docs)
    eff = (lo["wall_s"] / hi["wall_s"]) / 4.0
    result = {
        "job": "index build (tokenize -> salted term shuffle -> block encode "
               "-> segment commit)",
        "n_docs": n_docs,
        "low": lo, "high": hi,
        "speedup": round(lo["wall_s"] / hi["wall_s"], 3),
        "efficiency": round(eff, 3),
        "criterion": ">= 0.8 from N to 4N (north rule)",
        "ts": time.strftime("%Y-%m-%d %H:%M:%S"),
    }
    print(json.dumps(result, indent=2))
    with open(os.path.join(REPO, "scaling_result.json"), "w") as f:
        json.dump(result, f, indent=2)


if __name__ == "__main__":
    main()
