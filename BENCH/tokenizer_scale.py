"""Scaling evidence for the tokenizer/quality family (vocab coverage,
BPE round, unigram NLL): the same job on the same input at two
parallelism levels (N vs 4N cores, the sandbox stand-in for N vs 4N
executors — north-rule protocol), using the methodology of
BENCH/scaling.py (paired back-to-back subprocesses per job, pinned leaf
splits, pinned GC threads, best-of-reps). Separate record — the
fingerprinted kernel campaigns are never touched.

Input: a generated documents table (pure codegen: 40 hash-picked words
from a 50k-type vocabulary per doc, no Python, .data parquet, 64 pinned
leaf splits). All four jobs share the corpus-collapse shape — explode +
token aggregate — which is precisely the stage that dominates these
operators at 100 TB; everything after it runs on vocab/word-type
relations orders of magnitude smaller.

Jobs:
 * jvm_control_explode_count — pure-codegen control: the same explode
   with a global count only (no groupBy relation), embarrassingly
   parallel; bounds what this shared-DRAM box can evidence.
 * vocab_coverage — the full operator (count agg + distributed
   TakeOrderedAndProject + 10k-row window + broadcast total).
 * unigram_nll — the full unigram_logprob_per_source (adds the
   token→freq join and the per-doc/per-source aggregates — the
   heaviest shuffle of the family).
 * bpe_round — word-type collapse + ONE pair-count round + top-1 (the
   repeated unit of learn_bpe; a full 10-merge learn is 10 sequential
   instances of the same shape over an ever-smaller relation).

Writes BENCH/TOKENIZER_SCALE.md + BENCH/tokenizer_scale.json and prints
one JSON line.

Usage: python BENCH/tokenizer_scale.py [n_docs] [base_cores]
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

JOBS = [
    "jvm_control_explode_count",
    "vocab_coverage",
    "unigram_nll",
    "bpe_round",
    "wordpiece_fertility",
    "unigram_viterbi_stats",
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
                  app_name=f"tokscale-{{cores}}-{{job}}",
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
    # 40 hash-picked words from a 50k-type vocab per doc, pure codegen
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

from bloomine_spark.operators.bpe import (
    _char_symbols, _pair_counts, unigram_segment_stats_per_source,
    word_freq_table, wordpiece_fertility_per_source)
from bloomine_spark.operators.textops import unigram_logprob_per_source, vocab_coverage

def _bpe_round():
    words = _char_symbols(word_freq_table(docs))
    return (_pair_counts(words)
            .orderBy(F.desc("pair_count"), F.asc("lhs"), F.asc("rhs"))
            .limit(1).collect())

FNS = {{
    "jvm_control_explode_count":
        lambda: docs.select(F.explode(F.split("text", " ")).alias("t"))
                .filter(F.col("t") != "").agg(F.count("*")).head(),
    "vocab_coverage": lambda: vocab_coverage(docs).collect(),
    "unigram_nll": lambda: unigram_logprob_per_source(docs).collect(),
    "bpe_round": _bpe_round,
    # segmentation inference: corpus collapses to the ~50k word TYPES,
    # the round loops run on that bounded relation; the corpus-scale
    # parts are the freq/per-source aggregates
    "wordpiece_fertility": lambda: wordpiece_fertility_per_source(
        docs, max_len=4, min_count=2).collect(),
    "unigram_viterbi_stats": lambda: unigram_segment_stats_per_source(
        docs, max_len=4, min_count=2).collect(),
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
    n_docs = int(sys.argv[1]) if len(sys.argv) > 1 else 3_000_000
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
    with open(os.path.join(REPO, "BENCH", "tokenizer_scale.json"),
              "w") as f:
        json.dump(rec, f, indent=1)

    rows = "\n".join(
        f"| {j} | {t_base[j]} | {t_hi[j]} | {eff[j]}"
        f"{' (control)' if j in CONTROLS else ''} |"
        for j in JOBS
    )
    md = f"""# Tokenizer/quality family scaling (N vs 4N cores)

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

The engine jobs share the corpus-collapse shape (explode + token
aggregate) that dominates at 100 TB; vocab_coverage adds the bounded
TakeOrderedAndProject + 10k-row window, unigram_nll the token->freq
join, bpe_round the word-type pair aggregate — all on relations orders
of magnitude smaller than the corpus. The two segmentation-inference
jobs (WordPiece greedy, unigram Viterbi) add their round loops over the
bounded word-TYPE relation plus one occurrence-weighted per-source
aggregate back at corpus scale.
"""
    with open(os.path.join(REPO, "BENCH", "TOKENIZER_SCALE.md"),
              "w") as f:
        f.write(md)
    print(json.dumps({"metric": "tokenizer-family min engine efficiency",
                      "value": engine_min, "unit": "ratio",
                      "detail": eff}))


if __name__ == "__main__":
    main()
