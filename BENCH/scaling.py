"""Scaling-efficiency evidence: the SAME job on the SAME input at two
parallelism levels (local[8] vs local[32] — the sandbox stand-in for N vs
4N executors, per the driver note), fixed partition count (64) so
parallelism is the only variable.

Each configuration runs in a fresh subprocess (fresh JVM). Jobs timed after
a warmup pass. Writes BENCH/BASELINE.md and prints one JSON line.

Usage: python BENCH/scaling.py [n_rows]
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

WORKER = r"""
import json, sys, time
sys.path.insert(0, {repo!r})
from pyspark.sql import functions as F
from bloomine_spark.session import get_spark
from bloomine_spark.datagen import DEFAULT_TARGET

cores = int(sys.argv[1])
n_rows = int(sys.argv[2])
spark = get_spark(master=f"local[{{cores}}]", shuffle_partitions=64,
                  app_name=f"scaling-{{cores}}")
spark.sparkContext.setLogLevel("ERROR")
path = {repo!r} + f"/.data/seq_{{n_rows}}.parquet"
import os
if not os.path.isdir(path):
    from bloomine_spark.datagen import generate_sequences
    generate_sequences(spark, n_rows, partitions=64).write.mode("overwrite").parquet(path)
seqs = spark.read.parquet(path)
total_tokens = seqs.agg(F.sum("n_tok")).head()[0]

from bloomine_spark.sketch.core import sketch_agg_global
from bloomine_spark.sketch.hll import HyperLogLog
from bloomine_spark.sketch.cms import CountMinSketch
from bloomine_spark.operators.screen import screen_hits

# warmup (spins up python workers, JIT, arrow path)
sketch_agg_global(seqs.limit(4000), "tokens", lambda: HyperLogLog.empty(8))

res = {{}}
def bench(name, fn, reps=2):
    best = float("inf")
    for _ in range(reps):
        t0 = time.time(); fn(); best = min(best, time.time() - t0)
    res[name] = round(best, 3)

bench("hll_update_merge", lambda: sketch_agg_global(seqs, "tokens", lambda: HyperLogLog.empty(12)))
bench("cms_update_merge", lambda: sketch_agg_global(seqs, "tokens", lambda: CountMinSketch.empty(1e-3, 1e-2)))
bench("screen_scored", lambda: screen_hits(seqs, DEFAULT_TARGET).count())
print("RESULT " + json.dumps({{"cores": cores, "tokens": int(total_tokens), "times": res}}))
spark.stop()
"""


def run(cores: int, n_rows: int) -> dict:
    script = WORKER.format(repo=REPO)
    out = subprocess.run(
        [sys.executable, "-c", script, str(cores), str(n_rows)],
        capture_output=True, text=True, timeout=3600,
    )
    for line in out.stdout.splitlines():
        if line.startswith("RESULT "):
            return json.loads(line[len("RESULT "):])
    raise RuntimeError(f"worker failed:\n{out.stdout[-2000:]}\n{out.stderr[-4000:]}")


def main():
    n_rows = int(sys.argv[1]) if len(sys.argv) > 1 else 480_000
    r8 = run(8, n_rows)
    r32 = run(32, n_rows)
    tokens = r32["tokens"]

    lines = [
        "# BENCH/BASELINE — measured numbers (this repo)",
        "",
        "Scaling evidence per BASELINE.json north_rule: same job, same input",
        f"(synthetic sequences table, {n_rows:,} rows, {tokens:,} tokens,",
        "64 partitions fixed), local[8] vs local[32] (N vs 4N cores in this",
        "sandbox, per the driver note). Efficiency = T8/(4·T32).",
        "",
        "| job | local[8] sec | local[32] sec | tokens/sec @8 | tokens/sec @32 | speedup | efficiency |",
        "|---|---|---|---|---|---|---|",
    ]
    effs = {}
    for job in r8["times"]:
        t8, t32 = r8["times"][job], r32["times"][job]
        sp = t8 / t32
        eff = sp / 4.0
        effs[job] = round(eff, 3)
        lines.append(
            f"| {job} | {t8:.2f} | {t32:.2f} | {tokens/t8:,.0f} | "
            f"{tokens/t32:,.0f} | {sp:.2f}x | {eff:.2f} |"
        )
    gate = min(effs.values())
    lines += [
        "",
        f"Minimum scaling efficiency across jobs: **{gate:.2f}** "
        f"(north-rule gate: ≥ 0.8 → {'PASS' if gate >= 0.8 else 'FAIL'}).",
        "",
        "Reference wall-clock: the reference publishes no benchmark numbers",
        "(BASELINE.md); these are the measured values for the north-rule gates.",
    ]
    md = "\n".join(lines) + "\n"
    with open(os.path.join(REPO, "BENCH", "BASELINE.md"), "w") as f:
        f.write(md)
    print(json.dumps({"n_rows": n_rows, "tokens": tokens,
                      "t8": r8["times"], "t32": r32["times"],
                      "efficiency": effs, "min_efficiency": gate}))


if __name__ == "__main__":
    main()
