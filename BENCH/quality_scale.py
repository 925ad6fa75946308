"""Scaling evidence for the round-6 quality/forensics tail (Gopher
repetition pack, RefinedWeb line corrections, Dirichlet query
likelihood, Heaps' law fit): the same job on the same input at two
parallelism levels (N vs 4N cores — the sandbox stand-in for N vs 4N
executors, north-rule protocol), methodology of BENCH/named_scale.py
(paired back-to-back subprocesses per job, pinned leaf splits, pinned
GC threads, best-of-reps). Separate record — fingerprinted kernel
campaigns untouched.

Inputs: the shared generated documents fixture (40 hash-picked words
from a 50k-type vocab per doc, pure codegen, 64 pinned splits).
RefinedWeb gets planted boilerplate (1/7 of docs gain an uppercase +
counter line) so the line regexes do real work; the QL query terms are
in-vocab so the matched relation is non-trivial.

Writes BENCH/QUALITY_SCALE.md + BENCH/quality_scale.json and prints one
JSON line.

Usage: python BENCH/quality_scale.py [n_docs] [base_cores]
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

JOBS = [
    "jvm_control_explode_count",
    "gopher_repetition",
    "refinedweb_lines",
    "ql_dirichlet",
    "heaps_fit",
    "ngram_novelty",
    "nb_fit_classify",
    "gpt3_decontaminate",
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
                  app_name=f"qualityscale-{{cores}}-{{job}}",
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

from bloomine_spark.operators.classify import nb_classify, nb_train
from bloomine_spark.operators.dedup import gpt3_window_decontaminate
from bloomine_spark.operators.retrieval import ql_dirichlet_topk_per_source
from bloomine_spark.operators.textops import (
    gopher_repetition, heaps_fit_per_source, ngram_novelty_per_source,
    refinedweb_line_correct)

# GPT-3 decontamination eval set: one exact 13-gram from every 23rd doc
# (the driver query's derivation)
_eval = docs.filter(F.col("doc_id") % 23 == 0).select(
    "doc_id",
    F.array_join(F.slice(F.split("text", " "), 4, 13), " ").alias("text"),
)

# plant boilerplate on 1/7 of docs so the RefinedWeb regexes do real
# line-level string work (mirrors the driver query's planting)
_planted = docs.withColumn(
    "text",
    F.when(F.col("doc_id") % 7 == 0,
           F.concat(F.col("text"),
                    F.lit("\nBUY NOW LIMITED TIME OFFER\n1234 likes")))
     .otherwise(F.col("text")),
)

FNS = {{
    "jvm_control_explode_count":
        lambda: docs.select(F.explode(F.split("text", " ")).alias("t"))
                .filter(F.col("t") != "").agg(F.count("*")).head(),
    "gopher_repetition": lambda: gopher_repetition(docs)
        .agg(F.sum(F.col("keep").cast("long")), F.sum("n_chars")).head(),
    "refinedweb_lines": lambda: refinedweb_line_correct(_planted)
        .agg(F.sum("n_lines_removed"),
             F.sum(F.col("keep").cast("long"))).head(),
    "ql_dirichlet": lambda: ql_dirichlet_topk_per_source(
        docs, ["w1", "w17", "w4242"], k=5).collect(),
    "heaps_fit": lambda: heaps_fit_per_source(docs).collect(),
    "ngram_novelty": lambda: ngram_novelty_per_source(docs, max_n=8)
        .collect(),
    "nb_fit_classify": lambda: nb_classify(
        docs,
        nb_train(docs.select(F.col("source").alias("label"), "text"),
                 n_buckets=256),
        n_buckets=256,
    ).agg(F.count("*")).head(),
    "gpt3_decontaminate": lambda: gpt3_window_decontaminate(
        docs, _eval, n=13, window=60, min_piece_chars=40)
        .agg(F.count("*"), F.sum("n_chars")).head(),
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
    n_docs = int(sys.argv[1]) if len(sys.argv) > 1 else 500_000
    base = int(sys.argv[2]) if len(sys.argv) > 2 else 4
    hi = base * 4
    t_base: dict[str, float] = {}
    t_hi: dict[str, float] = {}
    # scan-bound light jobs get 8x the docs so fixed job overhead does
    # not swamp the scaling signal (named_scale.py lesson); the window-
    # heavy repetition pack and the groupBy-heavy fits run at n_docs
    sizes = {j: n_docs for j in JOBS}
    for j in ("jvm_control_explode_count", "refinedweb_lines"):
        sizes[j] = n_docs * 8
    # the repetition pack does ~360 gram digests per doc (9 gram sizes
    # x 40 words) — real work by design; n_docs/8 still gives ~60s of
    # signal at base cores. Novelty (8 gram sizes) and the NB classifier
    # (~280 hashed char-bigram features per doc, fit + classify) carry
    # comparable per-doc work; GPT-3 decon is lighter (13-grams only +
    # Bloom probe) and runs at n_docs/2
    sizes["gopher_repetition"] = max(n_docs // 8, 10_000)
    sizes["ngram_novelty"] = max(n_docs // 8, 10_000)
    sizes["nb_fit_classify"] = max(n_docs // 8, 10_000)
    sizes["gpt3_decontaminate"] = max(n_docs // 2, 10_000)
    for job in JOBS:
        # paired back-to-back so the box's throttle drift hits both sides
        r_hi = run(hi, sizes[job], job, 3)
        r_lo = run(base, sizes[job], job, 3)
        t_hi[job], t_base[job] = r_hi["best"], r_lo["best"]
        print(f"{job}: {base}c {t_base[job]}s  {hi}c {t_hi[job]}s  "
              f"eff {t_base[job] / (4 * t_hi[job]):.3f}", flush=True)

    eff = {j: round(t_base[j] / (4 * t_hi[j]), 3) for j in JOBS}
    engine_min = min(v for j, v in eff.items() if j not in CONTROLS)
    rec = {
        "n_docs": n_docs, "job_sizes": sizes,
        # per-job tokens, not a single scalar: jobs run at different
        # doc counts (8x / /8 / /2), so one "tokens" field would be
        # whichever job ran last and silently mis-normalize throughput
        "job_tokens": {j: sizes[j] * 40 for j in JOBS},
        "base_cores": base,
        "times_base": t_base, "times_4x": t_hi, "efficiency": eff,
        "control_efficiency": eff["jvm_control_explode_count"],
        "min_engine_efficiency": engine_min,
    }
    with open(os.path.join(REPO, "BENCH", "quality_scale.json"), "w") as f:
        json.dump(rec, f, indent=1)

    rows = "\n".join(
        f"| {j} | {sizes[j]:,} | {t_base[j]} | {t_hi[j]} | {eff[j]}"
        f"{' (control)' if j in CONTROLS else ''} |"
        for j in JOBS
    )
    md = f"""# Quality/forensics family scaling (N vs 4N cores)

Input: generated docs x 40 words from a 50k-type vocab (pure-codegen
fixture, .data parquet, 64 pinned leaf splits); per-job doc counts in
the table below (scan-bound light jobs run at 8x so fixed overhead
doesn't swamp the signal; the gram-digest-heavy packs at 1/8 — ~300+
digest/feature rows per doc is real work by design). Paired
back-to-back runs per job, best of 3, local[{base}] vs local[{hi}]. Same box caveats as BENCH/BASELINE.md:
the JVM-codegen control bounds what this shared-DRAM VM can evidence in
the same window; engine jobs at or above the control add no scaling
penalty of their own.

| job | docs | {base}c secs | {hi}c secs | efficiency |
|---|---|---|---|---|
{rows}

gopher_repetition is the heaviest shape here: one doc_id-keyed word
window (9 leads) + per-(doc,n) island windows + four digest-relation
aggregates — all shuffles carry (md5, length) pairs, never text.
refinedweb_lines is a zero-shuffle codegen map (scan-bound by
construction). ql_dirichlet is the term-filtered explode + broadcast
scalars. heaps_fit is two vocab-collapsing aggregates + one per-source
window over |docs| rows. ngram_novelty shares the gopher window pass
(7 leads, all gram sizes at once) plus ONE corpus-wide digest-keyed
first-occurrence aggregate. nb_fit_classify is the full train+classify
round trip (two fit aggregates, broadcast-model join). gpt3_decontaminate
is the 13-gram digest window + Bloom-prefiltered semi-join + piece cut.
"""
    with open(os.path.join(REPO, "BENCH", "QUALITY_SCALE.md"), "w") as f:
        f.write(md)
    print(json.dumps({"metric": "quality family min engine efficiency",
                      "value": engine_min, "unit": "ratio",
                      "detail": eff}))


if __name__ == "__main__":
    main()
