"""spark-submit entry for the multi-sample × multi-probe run grid — the
reference RunManager surface (/root/reference/bloomine/run.py:26-61), which
loops samples × probes and re-reads each sample's FASTQ once per probe.

Spark-first inversion: samples live in ONE table (the ``source`` column is
the sample id, SURVEY S6 mapping) and every sample × probe × flank is
screened in a SINGLE corpus scan (``screen_multi_scores``); everything
downstream operates on the tiny score log. Per-sample artifacts match the
reference's per-run directory layout:

    <output>/<run-id>/multi_scores/      long score log (stage, resumable)
    <output>/<run-id>/assignments/       argmax probe per read,
                                         partitioned by source
    <output>/<run-id>/hits/              assigned reads hydrated with tokens
    <output>/samples/<sample>/<sample>.flank_scores.log
        probe_set-prefixed merged TSV (run.py:139-177 byte format)
    <output>/samples/<sample>/<sample>.polyfamily.json
        {probe: [[variant, count], ...]} (run.py:101-125)

Usage:
    spark-submit --py-files bloomine_spark.zip jobs/run_grid.py \
      --input /path/seqs_parquet \
      --targets '{"probeA": [[...],[...]], "probeB": [[...],[...]]}' \
      --output /path/out --run-id grid0 [--samples s0,s1] [--min-kmer 11]

Stages are resumable (_SUCCESS + _PARAMS.json manifests): a rerun of a died
grid skips completed stages; driver-side sinks re-render from the
materialized parquet (cheap).
"""

from __future__ import annotations

import argparse
import json
import os

SEP = "\t"  # composite target-id separator (matches operators.multiscreen)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--input", required=True)
    ap.add_argument("--targets", required=True,
                    help='JSON {probe_id: [head_tokens, tail_tokens]}')
    ap.add_argument("--samples", default=None,
                    help="comma-joined source ids (default: all distinct)")
    ap.add_argument("--k", type=int, default=7)
    ap.add_argument("--min-kmer", type=int, default=11)
    ap.add_argument("--output", required=True)
    ap.add_argument("--run-id", default="grid0")
    ap.add_argument("--force", action="store_true")
    args = ap.parse_args()

    from pyspark.sql import SparkSession, Window
    from pyspark.sql import functions as F

    from bloomine_spark.operators.cascade import extract_targets, variant_counts
    from bloomine_spark.operators.multiscreen import screen_multi_scores
    from bloomine_spark.operators.report import polyfamily_summary_json
    from bloomine_spark.operators.screen import prepare_target
    from bloomine_spark.params import ScreenParams
    from bloomine_spark.sources.stages import StageRunner

    spark = SparkSession.builder.appName("bloomine-grid").getOrCreate()
    targets = {
        tid: (list(map(int, pair[0])), list(map(int, pair[1])))
        for tid, pair in json.loads(args.targets).items()
    }
    params = ScreenParams(k=args.k)
    run_dir = f"{args.output}/{args.run_id}"
    runner = StageRunner(spark, run_dir, force=args.force)
    manifest = {
        "targets": {t: [list(h), list(tl)] for t, (h, tl) in targets.items()},
        "k": args.k, "min_kmer": args.min_kmer,
    }

    df = spark.read.parquet(args.input)
    if args.samples:
        df = df.filter(F.col("source").isin(args.samples.split(",")))

    # ---- stage 1: ONE scan screens every sample x probe x flank ----------
    flat_targets = {}
    for tid, (f1, f2) in sorted(targets.items()):
        flat_targets[tid + SEP + "1"] = f1
        flat_targets[tid + SEP + "2"] = f2
    scores = runner.stage(
        "multi_scores",
        lambda: screen_multi_scores(df, flat_targets, params),
        manifest=dict(manifest, stage="multi_scores"),
    )

    # per-(probe, flank) SP thresholds, built driver-side like the screens do
    thr = {
        tid: (
            float(prepare_target(f1, params).mst),
            float(prepare_target(f2, params).mst),
        )
        for tid, (f1, f2) in targets.items()
    }
    parts = F.split(F.col("target_id"), SEP)
    per = scores.select(
        "source", "doc_id",
        parts.getItem(0).alias("probe_id"),
        parts.getItem(1).alias("flank"),
        "rc", "score",
    )
    # the RunManager merged-log pivot: per (sample, read, probe) the best
    # fwd/RC score of each flank (run.py:139-177 / BloomineRunner.py:236-264)
    best = per.groupBy("source", "doc_id", "probe_id").agg(
        F.max(F.when((F.col("flank") == "1") & ~F.col("rc"), F.col("score"))).alias("f1_score"),
        F.max(F.when((F.col("flank") == "1") & F.col("rc"), F.col("score"))).alias("f1_rc_score"),
        F.max(F.when((F.col("flank") == "2") & ~F.col("rc"), F.col("score"))).alias("f2_score"),
        F.max(F.when((F.col("flank") == "2") & F.col("rc"), F.col("score"))).alias("f2_rc_score"),
    )
    thr_df = spark.createDataFrame(
        [(t, v1, v2) for t, (v1, v2) in sorted(thr.items())],
        "probe_id string, thr1 double, thr2 double",
    )
    f1_best = F.greatest(F.col("f1_score"), F.col("f1_rc_score"))
    f2_best = F.greatest(F.col("f2_score"), F.col("f2_rc_score"))
    combined = best.join(F.broadcast(thr_df), "probe_id").select(
        "source", "doc_id", "probe_id",
        "f1_score", "f1_rc_score", "f2_score", "f2_rc_score",
        F.greatest(F.col("thr1"), F.col("thr2")).alias("threshold"),
        F.when(
            f1_best.isNotNull() & f2_best.isNotNull()
            & (f1_best >= F.col("thr1")) & (f2_best >= F.col("thr2")),
            F.lit(1),
        ).otherwise(F.lit(0)).alias("pass"),
    )

    # ---- stage 2: polyfamily argmax per (sample, read), ties -> min probe -
    def _build_assignments():
        total = (f1_best + f2_best).cast("long")
        w = Window.partitionBy("source", "doc_id").orderBy(
            F.desc("total_score"), F.asc("target_id")
        )
        return (
            combined.filter(F.col("pass") == 1)
            .select(
                "source", "doc_id",
                F.col("probe_id").alias("target_id"),
                total.alias("total_score"),
            )
            .withColumn("rn", F.row_number().over(w))
            .filter(F.col("rn") == 1)
            .drop("rn")
        )

    assigned = runner.stage(
        "assignments", _build_assignments,
        manifest=dict(manifest, stage="assignments"),
    )

    # ---- stage 3: hydrate assigned reads with tokens (ONE join) ----------
    hits = runner.stage(
        "hits",
        lambda: df.join(assigned.select("doc_id", "target_id"), "doc_id"),
        manifest=dict(manifest, stage="hits"),
    )

    # ---- per-sample driver-side sinks (tiny, post-aggregation) -----------
    samples = sorted(
        r["source"] for r in combined.select("source").distinct().collect()
    )
    print(f"stages ran: {runner.ran}  skipped (resume): {runner.skipped}")
    for sample in samples:
        sdir = os.path.join(args.output, "samples", sample)
        os.makedirs(sdir, exist_ok=True)

        # flank_scores.log — probe_set-prefixed merged TSV (run.py:139-177)
        log_path = os.path.join(sdir, f"{sample}.flank_scores.log")
        header = ["probe_set", "read_id", "flank_1_score", "flank_1_RC_score",
                  "flank_2_score", "flank_2_RC_score", "threshold", "pass"]

        def cell(v):
            return "" if v is None else str(int(v))

        with open(log_path, "w") as fh:
            fh.write("\t".join(header) + "\n")
            rows = (
                combined.filter(F.col("source") == sample)
                .orderBy("probe_id", "doc_id")
                .toLocalIterator()
            )
            for r in rows:
                fh.write("\t".join([
                    str(r["probe_id"]), str(r["doc_id"]),
                    cell(r["f1_score"]), cell(r["f1_rc_score"]),
                    cell(r["f2_score"]), cell(r["f2_rc_score"]),
                    str(float(r["threshold"])), str(int(r["pass"])),
                ]) + "\n")

        # polyfamily.json — per-probe variant counts of this sample's reads
        per_probe = {}
        sample_hits = hits.filter(F.col("source") == sample)
        for tid, (head, tail) in sorted(targets.items()):
            probe_docs = sample_hits.filter(F.col("target_id") == tid)
            ex = extract_targets(probe_docs, head, tail,
                                 min_kmer=args.min_kmer)
            per_probe[tid] = variant_counts(ex)
        blob = polyfamily_summary_json(per_probe)
        if json.loads(blob):
            with open(os.path.join(sdir, f"{sample}.polyfamily.json"), "w") as fh:
                fh.write(blob)
        print(f"sample {sample}: wrote {log_path}")

    spark.stop()


if __name__ == "__main__":
    main()
