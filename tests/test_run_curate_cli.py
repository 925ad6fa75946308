"""End-to-end curation pipeline CLI (jobs/run_curate.py) driven as a real
subprocess: scrub → score → filter → dedup → curated parquet, resumable."""

import os
import subprocess
import sys

import pandas as pd

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

GOOD = ("the quick brown fox jumps over a lazy dog and then the fox "
        "runs far away of the meadow and keeps going past the old barn "
        "until the night comes and a quiet wind settles of the hills")


def _write_docs(spark, tmp_path):
    rows = [
        # two good docs (distinct), one carrying PII
        {"doc_id": 1, "text": GOOD, "lang": "en", "source": "s0"},
        {"doc_id": 2, "text": GOOD.replace("fox", "hare")
         + " write to me at someone@example.org now",
         "lang": "en", "source": "s0"},
        # exact duplicate of doc 1 -> dropped (canonical = min id)
        {"doc_id": 3, "text": GOOD, "lang": "en", "source": "s1"},
        # too short
        {"doc_id": 4, "text": "tiny doc", "lang": "en", "source": "s1"},
        # highly repetitive -> top2_frac near 1
        {"doc_id": 5, "text": "spam ham " * 40, "lang": "en", "source": "s1"},
        # near-duplicate of doc 1 (tail appended, shingle Jaccard ~0.9):
        # survives exact dedup, dropped only under --near-dup
        {"doc_id": 6, "text": GOOD + " and nothing else happens there",
         "lang": "en", "source": "s1"},
    ]
    pdf = pd.DataFrame(rows)
    pdf["n_chars"] = pdf["text"].str.len()
    path = str(tmp_path / "docs")
    spark.createDataFrame(pdf).write.parquet(path)
    return path


def test_run_curate_cli(spark, tmp_path):
    inp = _write_docs(spark, tmp_path)
    out = str(tmp_path / "cur")
    argv = [
        sys.executable, os.path.join(REPO, "jobs", "run_curate.py"),
        "--input", inp, "--output", out, "--run-id", "c0",
        "--quality-min", "0.2", "--top2-max", "0.4", "--min-tokens", "5",
    ]
    env = dict(os.environ, PYTHONPATH=REPO)
    r = subprocess.run(argv, capture_output=True, text=True, env=env,
                       timeout=600)
    assert r.returncode == 0, r.stderr[-3000:]
    assert "stages ran: ['scrubbed', 'scored', 'filtered', 'deduped']" in r.stdout

    cur = spark.read.parquet(f"{out}/c0/curated").toPandas()
    ids = set(cur["doc_id"])
    assert 1 in ids and 2 in ids          # good docs survive
    assert 3 not in ids                   # exact dup dropped (canonical=1)
    assert 4 not in ids                   # too short
    assert 5 not in ids                   # repetitive
    # PII scrubbed in the surviving text, count recorded
    d2 = cur[cur["doc_id"] == 2].iloc[0]
    assert "<EMAIL>" in d2["text"] and "@" not in d2["text"]
    assert d2["n_email"] == 1

    assert 6 in ids                       # near-dup NOT dropped by default

    # rerun: all stages skipped
    r2 = subprocess.run(argv, capture_output=True, text=True, env=env,
                        timeout=600)
    assert r2.returncode == 0, r2.stderr[-3000:]
    assert "stages ran: []" in r2.stdout

    # --near-dup: MinHash-LSH drops the near-duplicate (canonical = min id)
    argv_nd = argv[:]
    argv_nd[argv_nd.index("c0")] = "c1"
    argv_nd.append("--near-dup")
    r3 = subprocess.run(argv_nd, capture_output=True, text=True, env=env,
                        timeout=600)
    assert r3.returncode == 0, r3.stderr[-3000:]
    nd = spark.read.parquet(f"{out}/c1/curated").toPandas()
    nd_ids = set(nd["doc_id"])
    assert 1 in nd_ids and 6 not in nd_ids

    # --eval-set: decontamination drops docs sharing an 8-gram with the
    # eval corpus. The eval doc embeds GOOD's opening 10 words, so docs 1
    # and 6 (which contain them verbatim) are dropped; doc 2 differs
    # inside every opening 8-gram (fox->hare) and survives.
    ev_path = str(tmp_path / "evalset")
    spark.createDataFrame(
        pd.DataFrame([{"doc_id": 900,
                       "text": " ".join(GOOD.split()[:10])}])
    ).write.parquet(ev_path)
    argv_ev = argv[:]
    argv_ev[argv_ev.index("c0")] = "c2"
    argv_ev += ["--eval-set", ev_path]
    r4 = subprocess.run(argv_ev, capture_output=True, text=True, env=env,
                        timeout=600)
    assert r4.returncode == 0, r4.stderr[-3000:]
    assert "'decontam'" in r4.stdout  # stage actually ran
    dc = spark.read.parquet(f"{out}/c2/curated").toPandas()
    assert set(dc["doc_id"]) == {2}


def test_run_curate_cli_batches(spark, tmp_path):
    """--split/--mixture-alpha/--pack tail: curated docs gain the
    deterministic split column and a batches/ chunk manifest is written
    with full non-final chunks per (source, shard) stream."""
    inp = _write_docs(spark, tmp_path)
    out = str(tmp_path / "cur")
    argv = [
        sys.executable, os.path.join(REPO, "jobs", "run_curate.py"),
        "--input", inp, "--output", out, "--run-id", "cb",
        "--quality-min", "0.2", "--top2-max", "0.4", "--min-tokens", "5",
        "--split", "--pack", "16", "--pack-shards", "2",
        "--mixture-alpha", "0.5",
    ]
    env = dict(os.environ, PYTHONPATH=REPO)
    r = subprocess.run(argv, capture_output=True, text=True, env=env,
                       timeout=600)
    assert r.returncode == 0, r.stderr[-3000:]
    assert "'batches'" in r.stdout and "batches s0:" in r.stdout

    cur = spark.read.parquet(f"{out}/cb/curated").toPandas()
    # md5-bucket split of the surviving ids (1, 2, 6) is all-train
    assert set(cur["split"]) == {"train"}

    ch = spark.read.parquet(f"{out}/cb/batches").toPandas()
    assert len(ch) > 0
    assert (ch["n_tokens"] <= 16).all() and (ch["n_tokens"] >= 1).all()
    # every non-final chunk of each (source, shard) stream is exactly full
    for (_, _), g in ch.groupby(["source", "shard"]):
        last = g["chunk_id"].max()
        assert (g.loc[g["chunk_id"] < last, "n_tokens"] == 16).all()
        assert sorted(g["chunk_id"]) == list(range(last + 1))

    # resume: the batches stage (and all earlier ones) skip on rerun
    r2 = subprocess.run(argv, capture_output=True, text=True, env=env,
                        timeout=600)
    assert r2.returncode == 0, r2.stderr[-3000:]
    assert "stages ran: []" in r2.stdout


def test_run_curate_cli_gopher(spark, tmp_path):
    """--gopher applies the rule pack in the filter stage: the 2-word doc
    dies on the word-count rule even with --min-tokens 1, good docs
    survive (they carry real stopwords and sane word lengths)."""
    inp = _write_docs(spark, tmp_path)
    out = str(tmp_path / "cur")
    argv = [
        sys.executable, os.path.join(REPO, "jobs", "run_curate.py"),
        "--input", inp, "--output", out, "--run-id", "cg",
        "--quality-min", "0.2", "--top2-max", "0.4", "--min-tokens", "1",
        "--gopher", "--gopher-min-words", "20",
    ]
    env = dict(os.environ, PYTHONPATH=REPO)
    r = subprocess.run(argv, capture_output=True, text=True, env=env,
                       timeout=600)
    assert r.returncode == 0, r.stderr[-3000:]
    cur = spark.read.parquet(f"{out}/cg/curated").toPandas()
    assert 4 not in set(cur["doc_id"])          # gopher word-count kill
    assert {1, 2} <= set(cur["doc_id"])         # good docs survive


def test_run_curate_cli_all_stages(spark, tmp_path):
    """Every stage flag at once: scrub → score → filter(+gopher) →
    dedup(+near-dup groups) → split → curated → mixture+pack batches.
    Catches flag interactions (e.g. gopher column handling feeding the
    near-dup stage, split column surviving into packing)."""
    inp = _write_docs(spark, tmp_path)
    out = str(tmp_path / "cur")
    argv = [
        sys.executable, os.path.join(REPO, "jobs", "run_curate.py"),
        "--input", inp, "--output", out, "--run-id", "ca",
        "--quality-min", "0.2", "--top2-max", "0.4", "--min-tokens", "1",
        "--gopher", "--gopher-min-words", "20",
        "--near-dup", "--near-dup-keep", "min-id",
        "--split", "--pack", "16", "--pack-shards", "2",
        "--mixture-alpha", "0.5",
    ]
    env = dict(os.environ, PYTHONPATH=REPO)
    r = subprocess.run(argv, capture_output=True, text=True, env=env,
                       timeout=600)
    assert r.returncode == 0, r.stderr[-3000:]

    cur = spark.read.parquet(f"{out}/ca/curated").toPandas()
    ids = set(cur["doc_id"])
    assert 4 not in ids            # gopher word-count kill
    assert 3 not in ids            # exact dup of 1
    assert 6 not in ids            # near-dup of 1, min-id survivor rule
    assert 2 not in ids            # fox->hare swap is itself a near-dup
    assert 1 in ids
    assert set(cur["split"]) <= {"train", "val", "test"}

    ch = spark.read.parquet(f"{out}/ca/batches").toPandas()
    assert len(ch) > 0 and (ch["n_tokens"] <= 16).all()

    # resume with identical args: every stage skips
    r2 = subprocess.run(argv, capture_output=True, text=True, env=env,
                        timeout=600)
    assert r2.returncode == 0 and "stages ran: []" in r2.stdout


def test_run_curate_cli_trim_dup_spans(spark, tmp_path):
    """--trim-dup-spans K surgically removes cross-corpus duplicated
    K-token spans after dedup: the canonical (min doc_id) copy of the
    shared text survives intact, the near-duplicate keeps only its novel
    tail, and the n_removed audit column rides into the curated output."""
    inp = _write_docs(spark, tmp_path)
    out = str(tmp_path / "cur")
    argv = [
        sys.executable, os.path.join(REPO, "jobs", "run_curate.py"),
        "--input", inp, "--output", out, "--run-id", "ct",
        "--quality-min", "0.2", "--top2-max", "0.4", "--min-tokens", "5",
        "--trim-dup-spans", "8",
    ]
    env = dict(os.environ, PYTHONPATH=REPO)
    r = subprocess.run(argv, capture_output=True, text=True, env=env,
                       timeout=600)
    assert r.returncode == 0, r.stderr[-3000:]
    assert "'trimmed'" in r.stdout
    cur = spark.read.parquet(f"{out}/ct/curated").toPandas()
    byid = {int(i): t for i, t in zip(cur["doc_id"], cur["text"])}
    # canonical copy of GOOD (doc 1) is untouched
    assert byid[1] == GOOD
    # the near-dup (doc 6) lost the shared prefix, kept its novel tail
    assert "quick brown fox" not in byid[6]
    assert "nothing else happens there" in byid[6]
    nrem = {int(i): n for i, n in zip(cur["doc_id"], cur["n_removed"])}
    assert nrem[1] == 0 and nrem[6] > 0


def test_run_curate_cli_c4(spark, tmp_path):
    """--c4 cleans pages between scrub and scoring: javascript lines are
    dropped but the page survives and is rebuilt without them; pages
    with <3 sentences or a lorem-ipsum line die before scoring."""
    l1 = "the quick brown fox jumps over the lazy dog today."
    l2 = "a quiet wind settles over the old barn at night."
    l3 = "the meadow stays green until the first snow arrives."
    rows = [
        {"doc_id": 1, "text": "\n".join([l1, l2, l3]),
         "lang": "en", "source": "s0"},
        {"doc_id": 2, "text": "\n".join(
            [l1, "please enable javascript to read the story now.",
             l2.replace("barn", "mill"), l3.replace("snow", "rain")]),
         "lang": "en", "source": "s0"},
        {"doc_id": 3, "text": "\n".join([l1, l2]),          # 2 sentences
         "lang": "en", "source": "s1"},
        {"doc_id": 4, "text": "\n".join(
            [l1, l2, l3,
             "lorem ipsum dolor sit amet consectetur adipiscing elit."])
            .replace("fox", "owl"),
         "lang": "en", "source": "s1"},
    ]
    pdf = pd.DataFrame(rows)
    pdf["n_chars"] = pdf["text"].str.len()
    inp = str(tmp_path / "docs_c4")
    spark.createDataFrame(pdf).write.parquet(inp)
    out = str(tmp_path / "cur")
    argv = [
        sys.executable, os.path.join(REPO, "jobs", "run_curate.py"),
        "--input", inp, "--output", out, "--run-id", "cc",
        "--quality-min", "0.2", "--top2-max", "0.5", "--min-tokens", "5",
        "--c4",
    ]
    env = dict(os.environ, PYTHONPATH=REPO)
    r = subprocess.run(argv, capture_output=True, text=True, env=env,
                       timeout=600)
    assert r.returncode == 0, r.stderr[-3000:]
    assert "stages ran: ['scrubbed', 'c4', 'scored', 'filtered'," \
        in r.stdout
    cur = spark.read.parquet(f"{out}/cc/curated").toPandas()
    ids = set(cur["doc_id"])
    assert ids == {1, 2}                       # 3: sentences, 4: lorem
    t2 = cur.set_index("doc_id").loc[2, "text"]
    assert "javascript" not in t2              # line dropped...
    assert "mill" in t2 and t2.count("\n") == 2  # ...page rebuilt from 3


def test_run_curate_cli_refinedweb_and_repetition(spark, tmp_path):
    """--refinedweb cuts boilerplate lines right after the scrub (pages
    rebuilt, mostly-boilerplate docs die before scoring);
    --gopher-repetition gates the filter stage on the full Table A1
    pack, catching repeated-line docs the top2 filter can't see."""
    long_line = ("the meadow stays calm and green while the river keeps "
                 "moving slowly past the village and the hills beyond")
    rep_line = "the rain falls gently tonight"
    rows = [
        # one boilerplate line inside a good page -> line cut, doc stays
        # (second content line shares no 5-gram with the first, so the
        # repetition pack leaves the doc alone)
        {"doc_id": 1, "text": "\n".join(
            [long_line, "BUY NOW LIMITED TIME OFFER",
             "a small forest bird sings early before anyone in town "
             "wakes up to hear that bright song"]),
         "lang": "en", "source": "s0"},
        # mostly boilerplate -> dropped at the refinedweb stage
        {"doc_id": 2, "text": "SHOUTING HEADLINE ONE\n99 views\nok",
         "lang": "en", "source": "s0"},
        # repeated line x3: top2_frac is tiny (3/34) but dup_line_frac
        # is 0.5 -> only the repetition pack kills it
        {"doc_id": 3, "text": "\n".join(
            [long_line.replace("meadow", "garden"),
             rep_line, rep_line, rep_line]),
         "lang": "en", "source": "s1"},
        # clean control
        {"doc_id": 4, "text": long_line.replace("meadow", "valley"),
         "lang": "en", "source": "s1"},
    ]
    pdf = pd.DataFrame(rows)
    pdf["n_chars"] = pdf["text"].str.len()
    inp = str(tmp_path / "docs_rw")
    spark.createDataFrame(pdf).write.parquet(inp)
    out = str(tmp_path / "cur")
    argv = [
        sys.executable, os.path.join(REPO, "jobs", "run_curate.py"),
        "--input", inp, "--output", out, "--run-id", "rw",
        "--quality-min", "0.2", "--top2-max", "0.5", "--min-tokens", "5",
        "--refinedweb", "--gopher-repetition",
    ]
    env = dict(os.environ, PYTHONPATH=REPO)
    r = subprocess.run(argv, capture_output=True, text=True, env=env,
                       timeout=600)
    assert r.returncode == 0, r.stderr[-3000:]
    assert "stages ran: ['scrubbed', 'refinedweb', 'scored', 'filtered'," \
        in r.stdout
    cur = spark.read.parquet(f"{out}/rw/curated").toPandas()
    ids = set(cur["doc_id"])
    assert ids == {1, 4}            # 2: excess removal, 3: dup lines
    t1 = cur.set_index("doc_id").loc[1, "text"]
    assert "BUY NOW" not in t1      # boilerplate line cut...
    assert "forest" in t1 and t1.count("\n") == 1  # ...page rebuilt


def test_run_curate_cli_normalize_and_sample(spark, tmp_path):
    """--sample keeps the md5-threshold subset of doc_ids before any
    stage runs; --normalize folds case/digits after the scrub so every
    downstream score sees the cleaned text."""
    import hashlib
    body = ("the quick brown fox jumps over a lazy dog and then KEEPS "
            "Going past 3 old barns until the night comes and a quiet "
            "wind settles over the hills")
    # letter-keyed variation: digit variation would COLLAPSE under the
    # normalizer's digit->0 fold and exact dedup would then (correctly)
    # keep only one doc per collapsed group
    rows = [
        {"doc_id": i,
         "text": body.replace("fox", "fox" + "abcdefghijklmnopqrst"[i]),
         "lang": "en", "source": "s0"}
        for i in range(20)
    ]
    pdf = pd.DataFrame(rows)
    pdf["n_chars"] = pdf["text"].str.len()
    inp = str(tmp_path / "docs_ns")
    spark.createDataFrame(pdf).write.parquet(inp)
    out = str(tmp_path / "cur")
    argv = [
        sys.executable, os.path.join(REPO, "jobs", "run_curate.py"),
        "--input", inp, "--output", out, "--run-id", "ns",
        "--quality-min", "0.2", "--top2-max", "0.5", "--min-tokens", "5",
        "--normalize", "--sample", "0.5", "--sample-salt", "t0",
    ]
    env = dict(os.environ, PYTHONPATH=REPO)
    r = subprocess.run(argv, capture_output=True, text=True, env=env,
                       timeout=600)
    assert r.returncode == 0, r.stderr[-3000:]
    assert "stages ran: ['scrubbed', 'normalized', 'scored'," in r.stdout
    cur = spark.read.parquet(f"{out}/ns/curated").toPandas()
    expected = {
        i for i in range(20)
        if int(hashlib.md5(f"t0:{i}".encode()).hexdigest()[:8], 16)
        < int(0.5 * (1 << 32))
    }
    assert set(cur["doc_id"]) == expected
    t = cur.set_index("doc_id").iloc[0]["text"]
    assert "KEEPS" not in t and "keeps" in t      # case folded
    assert " 0 old barns " in t                   # digit folded


def test_run_curate_cli_normalize_with_refinedweb_order(spark, tmp_path):
    """--normalize combined with --refinedweb: the line pack MUST see raw
    case and newlines (normalization lowercases and folds \\n), so the
    stage order is refinedweb -> normalized; the boilerplate line still
    dies and the surviving text is normalized."""
    body = ("the quick brown fox jumps over a lazy dog while the River "
            "keeps moving past 3 old barns and the hills beyond")
    rows = [
        {"doc_id": 1, "text": body + "\nBUY NOW LIMITED TIME OFFER",
         "lang": "en", "source": "s0"},
        {"doc_id": 2, "text": "SHOUT ONE\n99 views\nok",
         "lang": "en", "source": "s0"},
    ]
    pdf = pd.DataFrame(rows)
    pdf["n_chars"] = pdf["text"].str.len()
    inp = str(tmp_path / "docs_nr")
    spark.createDataFrame(pdf).write.parquet(inp)
    out = str(tmp_path / "cur")
    argv = [
        sys.executable, os.path.join(REPO, "jobs", "run_curate.py"),
        "--input", inp, "--output", out, "--run-id", "nr",
        "--quality-min", "0.2", "--top2-max", "0.5", "--min-tokens", "5",
        "--normalize", "--refinedweb",
    ]
    env = dict(os.environ, PYTHONPATH=REPO)
    r = subprocess.run(argv, capture_output=True, text=True, env=env,
                       timeout=600)
    assert r.returncode == 0, r.stderr[-3000:]
    assert ("stages ran: ['scrubbed', 'refinedweb', 'normalized', "
            "'scored',") in r.stdout
    cur = spark.read.parquet(f"{out}/nr/curated").toPandas()
    assert set(cur["doc_id"]) == {1}       # 2 dies on excess removal
    t = cur.iloc[0]["text"]
    assert "buy now" not in t and "BUY NOW" not in t  # line pack fired
    assert "river" in t and " 0 old barns " in t      # then normalized


def test_run_curate_cli_soft_dedup(spark, tmp_path):
    """--soft-dedup keeps the near-duplicate but attaches a mass-
    conserving sampling weight inversely proportional to group size."""
    inp = _write_docs(spark, tmp_path)
    out = str(tmp_path / "cur_soft")
    argv = [
        sys.executable, os.path.join(REPO, "jobs", "run_curate.py"),
        "--input", inp, "--output", out, "--run-id", "sd0",
        "--quality-min", "0.2", "--top2-max", "0.4", "--min-tokens", "5",
        "--soft-dedup",
    ]
    env = dict(os.environ, PYTHONPATH=REPO)
    r = subprocess.run(argv, capture_output=True, text=True, env=env,
                       timeout=600)
    assert r.returncode == 0, r.stderr[-3000:]

    cur = spark.read.parquet(f"{out}/sd0/curated").toPandas()
    ids = set(cur["doc_id"])
    # near-dup doc 6 is KEPT (soft dedup never drops)...
    assert {1, 2, 6} <= ids
    by_id = cur.set_index("doc_id")
    # ...but docs 1 and 6 share a near-dup group of 2 -> down-weighted;
    # doc 2 (fox->hare swap IS a near-dup of 1 under LSH at this length)
    # may or may not join the group — assert the invariants instead:
    # group members share commonness>1, singletons have weight N/G.
    n = len(cur)
    assert abs(cur["weight"].sum() - n) < 1e-9     # mass conserved
    assert int(by_id.loc[6, "commonness"]) >= 2
    assert by_id.loc[6, "weight"] < by_id.loc[6, "commonness"] * 1.0
    assert (cur["commonness"] >= 1).all()

    # mutual exclusion with --near-dup is an argparse error
    r2 = subprocess.run(argv + ["--near-dup"], capture_output=True,
                        text=True, env=env, timeout=600)
    assert r2.returncode != 0
    assert "mutually exclusive" in r2.stderr


def test_run_curate_cli_from_jsonl(spark, tmp_path):
    """JSONL corpus (gzipped, no doc_id/source fields) -> curated
    parquet: ids derive as xxhash64(text, source), source from the file
    stem, and byte-identical texts within a source collapse (documented
    jsonl-ingest consequence, same outcome exact dedup produces)."""
    import gzip
    import json
    import os
    import subprocess
    import sys

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    good = ("the quick brown fox jumps over a lazy dog and then the fox "
            "runs far away of the meadow and keeps going past the old "
            "barn until the night comes and a quiet wind settles")
    lines = [
        {"text": good},
        {"text": good.replace("fox", "hare")},
        {"text": good},            # exact duplicate -> one id, one row
        {"text": "too short"},     # min-tokens filter drops it
    ]
    (tmp_path / "shard-a.jsonl.gz").write_bytes(
        gzip.compress("\n".join(json.dumps(x) for x in lines).encode())
    )
    out = str(tmp_path / "cur")
    argv = [
        sys.executable, os.path.join(repo, "jobs", "run_curate.py"),
        "--input", str(tmp_path / "*.jsonl.gz"), "--input-format", "jsonl",
        "--output", out, "--run-id", "j0",
        "--quality-min", "0.2", "--top2-max", "0.4", "--min-tokens", "5",
    ]
    env = dict(os.environ, PYTHONPATH=repo)
    r = subprocess.run(argv, capture_output=True, text=True, env=env,
                       timeout=600)
    assert r.returncode == 0, r.stderr[-3000:]
    cur = spark.read.parquet(f"{out}/j0/curated").toPandas()
    assert sorted(cur["source"]) == ["shard-a", "shard-a"]
    texts = set(cur["text"])
    assert texts == {good, good.replace("fox", "hare")}
    assert cur["doc_id"].nunique() == 2

def test_run_curate_cli_boilerplate_frac(spark, tmp_path):
    # s0: all three docs share a footer line (df 3/3 > 0.5 -> removed
    # everywhere); the SAME line appears on 1 of 3 s1 docs (kept there —
    # the rule is per-source). Distinct bodies so exact dedup is a no-op.
    rows = []
    for i, word in enumerate(["fox", "hare", "wolf"]):
        rows.append({
            "doc_id": 10 + i, "source": "s0", "lang": "en",
            "text": GOOD.replace("fox", word) + "\ncopyright footer line",
        })
    rows.append({
        "doc_id": 20, "source": "s1", "lang": "en",
        "text": GOOD.replace("fox", "lynx") + "\ncopyright footer line",
    })
    for i, word in enumerate(["otter", "stoat"]):
        rows.append({
            "doc_id": 21 + i, "source": "s1", "lang": "en",
            "text": GOOD.replace("fox", word),
        })
    pdf = pd.DataFrame(rows)
    pdf["n_chars"] = pdf["text"].str.len()
    inp = str(tmp_path / "docs_bp")
    spark.createDataFrame(pdf).write.parquet(inp)
    out = str(tmp_path / "cur_bp")
    argv = [
        sys.executable, os.path.join(REPO, "jobs", "run_curate.py"),
        "--input", inp, "--output", out, "--run-id", "bp0",
        "--quality-min", "0.2", "--top2-max", "0.4", "--min-tokens", "5",
        "--boilerplate-frac", "0.5",
    ]
    env = dict(os.environ, PYTHONPATH=REPO)
    r = subprocess.run(argv, capture_output=True, text=True, env=env,
                       timeout=600)
    assert r.returncode == 0, r.stderr[-3000:]
    assert "'boilerplate_cut'" in r.stdout
    cur = spark.read.parquet(f"{out}/bp0/curated").toPandas()
    assert set(cur["doc_id"]) == {10, 11, 12, 20, 21, 22}
    by_id = {r["doc_id"]: r["text"] for _, r in cur.iterrows()}
    for d in (10, 11, 12):
        assert "copyright footer line" not in by_id[d]
    assert "copyright footer line" in by_id[20]  # per-source scoping

def test_run_curate_cli_orc_roundtrip(spark, tmp_path):
    # ORC in -> curate -> ORC out: format coverage for the other native
    # columnar lakehouse format; content must match the parquet run
    rows = [
        {"doc_id": 1, "text": GOOD, "lang": "en", "source": "s0"},
        {"doc_id": 2, "text": GOOD.replace("fox", "hare"),
         "lang": "en", "source": "s0"},
        {"doc_id": 3, "text": GOOD, "lang": "en", "source": "s1"},  # dup
    ]
    pdf = pd.DataFrame(rows)
    pdf["n_chars"] = pdf["text"].str.len()
    inp = str(tmp_path / "docs_orc")
    spark.createDataFrame(pdf).write.orc(inp)
    out = str(tmp_path / "cur_orc")
    argv = [
        sys.executable, os.path.join(REPO, "jobs", "run_curate.py"),
        "--input", inp, "--output", out, "--run-id", "o0",
        "--quality-min", "0.2", "--top2-max", "0.4", "--min-tokens", "5",
        "--input-format", "orc", "--output-format", "orc",
    ]
    env = dict(os.environ, PYTHONPATH=REPO)
    r = subprocess.run(argv, capture_output=True, text=True, env=env,
                       timeout=600)
    assert r.returncode == 0, r.stderr[-3000:]
    cur = spark.read.orc(f"{out}/o0/curated").toPandas()
    assert set(cur["doc_id"]) == {1, 2}   # dup 3 dropped, both goods kept
    assert set(cur["source"]) == {"s0"}   # partition column survives
