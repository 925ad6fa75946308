"""Scaling evidence for the round-6 curation/retrieval family
(duplicated-span audit, DSIR weights, bigram LM, BM25): the same job on
the same input at two parallelism levels (N vs 4N cores — the sandbox
stand-in for N vs 4N executors, north-rule protocol), methodology of
BENCH/scaling.py / tokenizer_scale.py (paired back-to-back subprocesses
per job, pinned leaf splits, pinned GC threads, best-of-reps). Separate
record — fingerprinted kernel campaigns untouched.

Input: the tokenizer_scale generated documents fixture (40 hash-picked
words from a 50k-type vocab per doc, pure codegen, 64 pinned splits).

Jobs:
 * jvm_control_explode_count — same pure-codegen control as the other
   campaigns; bounds what this shared-DRAM box can evidence per window.
 * dup_span — dup_span_coverage_per_source k=8: the window explode is
   ~33 md5'd 8-gram digests per doc, then the narrow digest-count
   shuffle + join-back + per-doc island window (the family's heaviest).
 * dsir_weights — dsir_log_weights + per-source mean (the distributed
   part; exact top-frac selection is the documented test-only path, the
   scale path is the percentile_approx threshold).
 * bigram_nll — full bigram_logprob_per_source (bigram agg + derived
   context agg + LM join + two narrowing aggs).
 * bm25 — bm25_topk_per_source on three vocab terms (term-filtered
   explode + broadcast df/N/avgdl + per-source rank window).

Writes BENCH/CURATION_SCALE.md + BENCH/curation_scale.json and prints
one JSON line.

Usage: python BENCH/curation_scale.py [n_docs] [base_cores]
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

JOBS = [
    "jvm_control_explode_count",
    "dup_span",
    "dsir_weights",
    "bigram_nll",
    "bm25",
]
CONTROLS = {"jvm_control_explode_count"}

WORKER = r"""
import json, sys, time
sys.path.insert(0, {repo!r})
from pyspark.sql import functions as F
from bloomine_spark.session import get_spark

cores = int(sys.argv[1])
n_docs = int(sys.argv[2])
job = sys.argv[3]
reps = int(sys.argv[4])
spark = get_spark(master=f"local[{{cores}}]", shuffle_partitions=64,
                  app_name=f"curscale-{{cores}}-{{job}}",
                  extra_conf={{
                      "spark.sql.files.maxPartitionBytes": "512m",
                      "spark.sql.files.minPartitionNum": "64",
                      "spark.driver.extraJavaOptions":
                          f"-XX:ParallelGCThreads={{cores}} -XX:ConcGCThreads={{max(1, cores // 4)}}",
                  }})
spark.sparkContext.setLogLevel("ERROR")
import os
path = {repo!r} + f"/.data/tokdocs_{{n_docs}}.parquet"
if not os.path.isdir(path):
    (spark.range(0, n_docs, numPartitions=64)
        .select(
            F.concat(F.lit("s"), (F.col("id") % 10).cast("string"))
             .alias("source"),
            F.col("id").alias("doc_id"),
            F.expr("concat_ws(' ', transform(sequence(1, 40),"
                   " j -> concat('w', pmod(xxhash64(id, j), 50000))))")
             .alias("text"),
        )
        .write.mode("overwrite").parquet(path))
docs = spark.read.parquet(path)
n_tokens = n_docs * 40

from bloomine_spark.operators.dedup import dup_span_coverage_per_source
from bloomine_spark.operators.dsir import dsir_log_weights
from bloomine_spark.operators.retrieval import bm25_topk_per_source
from bloomine_spark.operators.textops import bigram_logprob_per_source

FNS = {{
    "jvm_control_explode_count":
        lambda: docs.select(F.explode(F.split("text", " ")).alias("t"))
                .filter(F.col("t") != "").agg(F.count("*")).head(),
    "dup_span": lambda: dup_span_coverage_per_source(docs, k=8).collect(),
    "dsir_weights": lambda: (
        dsir_log_weights(docs, F.col("source") == "s0", n_buckets=4096)
        .groupBy("source").agg(F.avg("log_iw")).collect()),
    "bigram_nll": lambda: bigram_logprob_per_source(docs).collect(),
    "bm25": lambda: bm25_topk_per_source(
        docs, ["w1", "w2", "w3"], k=5).collect(),
}}

docs.select(F.count("*")).head()  # warmup: page cache + codegen hot

fn = FNS[job]
best = float("inf")
for _ in range(reps):
    t0 = time.time(); fn(); best = min(best, time.time() - t0)
print("RESULT " + json.dumps({{"cores": cores, "tokens": n_tokens,
                               "job": job, "best": round(best, 3)}}))
spark.stop()
"""


def run(cores: int, n_docs: int, job: str, reps: int) -> dict:
    script = WORKER.format(repo=REPO)
    out = subprocess.run(
        [sys.executable, "-c", script, str(cores), str(n_docs), job,
         str(reps)],
        capture_output=True, text=True, timeout=3600,
    )
    for line in out.stdout.splitlines():
        if line.startswith("RESULT "):
            return json.loads(line[len("RESULT "):])
    raise RuntimeError(
        f"worker failed:\n{out.stdout[-2000:]}\n{out.stderr[-4000:]}"
    )


def main():
    n_docs = int(sys.argv[1]) if len(sys.argv) > 1 else 1_500_000
    base = int(sys.argv[2]) if len(sys.argv) > 2 else 4
    hi = base * 4
    t_base: dict[str, float] = {}
    t_hi: dict[str, float] = {}
    tokens = 0
    for job in JOBS:
        # paired back-to-back so the box's throttle drift hits both sides
        r_hi = run(hi, n_docs, job, 3)
        r_lo = run(base, n_docs, job, 3)
        t_hi[job], t_base[job] = r_hi["best"], r_lo["best"]
        tokens = r_hi["tokens"]
        print(f"{job}: {base}c {t_base[job]}s  {hi}c {t_hi[job]}s  "
              f"eff {t_base[job] / (4 * t_hi[job]):.3f}", flush=True)

    eff = {j: round(t_base[j] / (4 * t_hi[j]), 3) for j in JOBS}
    engine_min = min(v for j, v in eff.items() if j not in CONTROLS)
    rec = {
        "n_docs": n_docs, "tokens": tokens, "base_cores": base,
        "times_base": t_base, "times_4x": t_hi, "efficiency": eff,
        "control_efficiency": eff["jvm_control_explode_count"],
        "min_engine_efficiency": engine_min,
        "tokens_per_sec_4x": {
            j: int(tokens / t_hi[j]) for j in JOBS if j not in CONTROLS},
    }
    with open(os.path.join(REPO, "BENCH", "curation_scale.json"),
              "w") as f:
        json.dump(rec, f, indent=1)

    rows = "\n".join(
        f"| {j} | {t_base[j]} | {t_hi[j]} | {eff[j]}"
        f"{' (control)' if j in CONTROLS else ''} |"
        for j in JOBS
    )
    md = f"""# Curation/retrieval family scaling (N vs 4N cores)

Input: {n_docs:,} generated docs x 40 words from a 50k-type vocab
({tokens:,} tokens; pure-codegen fixture, .data parquet, 64 pinned
leaf splits). Paired back-to-back subprocess runs per job, best of 3,
local[{base}] vs local[{hi}]. Same box caveats as BENCH/BASELINE.md:
the JVM-codegen control bounds what this shared-DRAM VM can evidence
in the same window; engine jobs at or above the control add no scaling
penalty of their own.

| job | {base}c secs | {hi}c secs | efficiency |
|---|---|---|---|
{rows}

dup_span is the family's heaviest (≈33 md5'd 8-gram digests per doc
before the narrow digest-count shuffle); dsir_weights is measured on
its distributed stage (exact top-frac selection is the documented
test-only path — the scale path thresholds via percentile_approx);
bm25's explode is term-filtered before any aggregate, so its corpus
work is the scan itself.
"""
    with open(os.path.join(REPO, "BENCH", "CURATION_SCALE.md"),
              "w") as f:
        f.write(md)
    print(json.dumps({"metric": "curation-family min engine efficiency",
                      "value": engine_min, "unit": "ratio",
                      "detail": eff}))


if __name__ == "__main__":
    main()
