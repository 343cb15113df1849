"""Cluster job entrypoint: build (or resume) an inverted index over a corpus
table, launched via spark-submit.

Usage (cluster):

    cd /path/to/repo
    zip -r /tmp/lucene_spark.zip lucene_7_x_9_x_spark
    spark-submit --master <cluster-master> \
        --py-files /tmp/lucene_spark.zip \
        scripts/submit_build.py \
        --input /warehouse/webpages --format parquet \
        --key-col url --text-col text \
        --index-dir s3a://bucket/indexes/web \
        --docs-per-segment 1000000 --term-shards 4096 \
        --salt-bucket-docs 65536 --codec pfor --resume

Usage (local smoke, what this sandbox can run):

    spark-submit --master 'local[8]' --py-files /tmp/lucene_spark.zip \
        scripts/submit_build.py --input /root/testdata/sf0.001/documents.parquet \
        --key-col doc_id --text-col text --int-keys --index-dir /tmp/subidx

Unlike tests/bench (which use session.get_spark), this entrypoint takes the
session from spark-submit's conf — master, executor sizing, shuffle
partitions, and memory belong to the launch command on a real cluster.
It prints one JSON line of build metrics on completion; per-wave metrics and
per-partition lineage are persisted under <index-dir>/lineage/ by the build
itself (north-rule checkpoint/lineage surface — resume with --resume after
any crash and completed waves are skipped).
"""

import argparse
import json
import sys
import time


def main() -> None:
    p = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    p.add_argument("--input", required=True,
                   help="corpus path or table (parquet dir, or any --format)")
    p.add_argument("--format", default="parquet",
                   help="Spark reader format: parquet (default), iceberg, orc ...")
    p.add_argument("--key-col", default="url")
    p.add_argument("--text-col", default="text")
    p.add_argument("--index-dir", required=True)
    p.add_argument("--docs-per-segment", type=int, default=4096)
    p.add_argument("--segments-per-wave", type=int, default=8)
    p.add_argument("--term-shards", type=int, default=32)
    p.add_argument("--salt-bucket-docs", type=int, default=0,
                   help="docid-range salt for stopword skew (0 = off)")
    p.add_argument("--codec", default="for-vbyte",
                   help="postings codec name (for-vbyte | pfor | vbyte | registered)")
    p.add_argument("--no-positions", action="store_true",
                   help="skip position streams (no phrase/span queries)")
    p.add_argument("--int-keys", action="store_true",
                   help="key column is integral (docid order == key order)")
    p.add_argument("--stemming", action="store_true",
                   help="EnglishAnalyzer analog instead of StandardAnalyzer")
    p.add_argument("--resume", action="store_true",
                   help="resume into an existing index dir (completed waves skip)")
    args = p.parse_args()

    # Imports run on the executors from --py-files; no repo checkout needed there.
    from pyspark.sql import SparkSession
    from lucene_7_x_9_x_spark.analysis.tokenizer import ENGLISH, STANDARD
    from lucene_7_x_9_x_spark.index.builder import build_index
    from lucene_7_x_9_x_spark.index.checkindex import check_index

    spark = SparkSession.builder.appName(
        f"index-build:{args.index_dir}").getOrCreate()
    t0 = time.time()
    df = spark.read.format(args.format).load(args.input)
    cat = build_index(
        spark, df, args.key_col, args.text_col, args.index_dir,
        analyzer=ENGLISH if args.stemming else STANDARD,
        docs_per_segment=args.docs_per_segment,
        segments_per_wave=args.segments_per_wave,
        term_shards=args.term_shards,
        salt_bucket_docs=args.salt_bucket_docs or None,
        store_positions=not args.no_positions,
        int_keys=args.int_keys,
        codec=args.codec,
        resume=args.resume,
    )
    wall = time.time() - t0
    problems = check_index(spark, args.index_dir)
    segs = cat.live_segments()
    n_docs = sum(s["doc_count"] for s in segs)
    print(json.dumps({
        "index_dir": args.index_dir,
        "segments": len(segs),
        "docs": n_docs,
        "wall_s": round(wall, 2),
        "docs_per_sec": round(n_docs / wall, 1) if wall else None,
        "codec": args.codec,
        "check_index": problems or "ok",
    }))
    if problems:
        sys.exit(1)


if __name__ == "__main__":
    main()
