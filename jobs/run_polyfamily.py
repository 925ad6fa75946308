"""spark-submit entry for the polyfamily pipeline: one-pass multi-probe
screen → argmax probe assignment → per-probe MOI extraction → the
reference's JSON summary (/root/reference/bloomine/run.py:64-130,
distributed; ONE corpus scan for all probes vs the reference's
scan-per-probe loop).

    spark-submit --py-files bloomine_spark.zip jobs/run_polyfamily.py \
        --input /path/to/sequences_parquet \
        --targets '{"probeA": [[1,2,3],[7,8,9]], "probeB": [[4,5],[7,8,9]]}' \
        --output /path/out [--min-kmer 11]

Writes <output>/assignments/ parquet (doc_id, target_id, total_score) and
<output>/polyfamily.json ({probe: [[variant, count], ...]}).
"""

from __future__ import annotations

import argparse
import json
import os


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--input", required=True)
    ap.add_argument("--targets", required=True,
                    help='JSON {probe_id: [head_tokens, tail_tokens]}')
    ap.add_argument("--k", type=int, default=7)
    ap.add_argument("--min-kmer", type=int, default=11)
    ap.add_argument("--output", required=True)
    args = ap.parse_args()

    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    from bloomine_spark.operators.cascade import extract_targets, variant_counts
    from bloomine_spark.operators.multiscreen import polyfamily_onepass
    from bloomine_spark.operators.report import polyfamily_summary_json
    from bloomine_spark.params import ScreenParams

    spark = SparkSession.builder.appName("bloomine-polyfamily").getOrCreate()
    targets = {
        tid: (list(map(int, pair[0])), list(map(int, pair[1])))
        for tid, pair in json.loads(args.targets).items()
    }
    params = ScreenParams(k=args.k)

    df = spark.read.parquet(args.input)
    # polyfamily_onepass already argmax-bins docs to probes (W1)
    assigned = polyfamily_onepass(df, targets, params).cache()
    assigned.write.mode("overwrite").parquet(f"{args.output}/assignments")

    # per-probe MOI: extract inter-flank variants of each probe's docs
    per_probe_variants = {}
    for tid, (head, tail) in sorted(targets.items()):
        docs = df.join(
            assigned.filter(F.col("target_id") == tid).select("doc_id"),
            "doc_id",
            "left_semi",
        )
        ex = extract_targets(docs, head, tail, min_kmer=args.min_kmer)
        per_probe_variants[tid] = variant_counts(ex)

    blob = polyfamily_summary_json(per_probe_variants)
    out_path = os.path.join(args.output, "polyfamily.json")
    with open(out_path, "w") as fh:
        fh.write(blob)
    print(f"wrote {out_path}")
    spark.stop()


if __name__ == "__main__":
    main()
