"""Distributed BPE (byte-pair-encoding) merge learning — tokenizer
training over the corpus, the step a training-data pipeline runs between
vocabulary sizing (``textops.vocab_coverage``) and token packing.

Algorithm (Sennrich et al. 2016, ACL — public): start from character
symbols per word type, then repeatedly (1) count adjacent symbol pairs
across the corpus weighted by word frequency, (2) merge the most
frequent pair everywhere, greedily left-to-right within each word.
This module defines the deterministic contract precisely so a SQL
oracle can replay it bit-for-bit:

* pair counts are over every adjacent position (overlaps included:
  ``aaa`` contributes 2 to ``(a,a)``), weighted by word-type frequency;
* the winning pair breaks count ties by ``(lhs ASC, rhs ASC)`` binary
  string order;
* applying a merge is greedy left-to-right non-overlapping — within a
  run of k consecutive occurrences (only possible when lhs == rhs),
  positions 1, 3, 5… of the run merge.

Plan shape at 100 TB: the corpus collapses ONCE to the word-type
frequency relation (a single token-count aggregate with map-side
partials — the same shape as ``vocab_coverage``); every merge round
then touches only word TYPES, not occurrences. Per round: one bounded
pair-count aggregate, a driver-side top-1 via a distributed
TakeOrderedAndProject (``orderBy().limit(1)``, one row moves), and a
map-side ``aggregate()`` fold guarded by ``array_contains`` so words
without the pair are untouched. ``localCheckpoint`` per round caps the
plan lineage exactly as the connected-components loop does. The known
next-level optimization (incremental pair-count deltas for only the
words containing the last merge) is documented, not implemented — the
full recount keeps every round a stateless one-pass aggregate, which is
what makes the run resumable from the checkpointed word table.

Greedy-fold correctness note: the fold merges when the accumulator's
last element equals ``lhs`` and the next element equals ``rhs``. A
just-merged token can never re-trigger the same round's rule, because
the merged symbol ``lhs || rhs`` is strictly longer than ``lhs`` (rhs
is never empty), so string equality with ``lhs`` is impossible — the
fold is exactly greedy left-to-right without needing a "just merged"
flag.

Reference parity: the reference (ArthurVM/BlooMine) has no tokenizer
trainer; this extends the tokens-payload pipeline per the round brief.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = [
    "word_freq_table",
    "learn_bpe",
    "apply_merges",
    "bpe_merge_table",
    "bpe_source_stats",
    "bpe_transfer_stats",
    "wordpiece_vocab",
    "wordpiece_segment",
    "wordpiece_fertility_per_source",
    "unigram_piece_vocab",
    "unigram_viterbi_segment",
    "unigram_segment_stats_per_source",
]


def word_freq_table(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """(word, freq) over whitespace words — the corpus-scale collapse.
    Everything downstream runs on word types."""
    return (
        docs.select(F.explode(F.split(F.col(text_col), " ")).alias("word"))
        .filter(F.col("word") != "")
        .groupBy("word")
        .agg(F.count("*").cast("long").alias("freq"))
    )


def _char_symbols(words: DataFrame) -> DataFrame:
    # split at every INTER-character position only: (?!^) rejects the
    # string start and (?=.) rejects the end, so no empty elements
    # (Spark's split keeps trailing empties, unlike Java's default)
    return words.select(
        "word", "freq", F.split(F.col("word"), r"(?!^)(?=.)").alias("syms")
    )


def _pair_counts(words: DataFrame) -> DataFrame:
    pairs = words.select(
        "freq",
        F.explode(
            F.expr(
                "zip_with(slice(syms, 1, size(syms)-1),"
                "         slice(syms, 2, size(syms)-1),"
                "         (x, y) -> struct(x AS lhs, y AS rhs))"
            )
        ).alias("p"),
    )
    return pairs.groupBy("p.lhs", "p.rhs").agg(
        F.sum("freq").cast("long").alias("pair_count")
    )


def _apply_merge(words: DataFrame, lhs: str, rhs: str) -> DataFrame:
    la, lb, lm = F.lit(lhs), F.lit(rhs), F.lit(lhs + rhs)

    def fold(acc, x):
        return F.when(
            (F.size(acc) > 0)
            & (F.element_at(acc, -1) == la)
            & (x == lb),
            F.concat(F.slice(acc, F.lit(1), F.size(acc) - 1), F.array(lm)),
        ).otherwise(F.concat(acc, F.array(x)))

    merged = F.aggregate(
        F.col("syms"), F.array().cast("array<string>"), fold
    )
    return words.withColumn(
        "syms",
        F.when(
            F.array_contains("syms", lhs) & F.array_contains("syms", rhs),
            merged,
        ).otherwise(F.col("syms")),
    )


def apply_merges(
    words: DataFrame,
    merges: list[tuple[str, str]],
    checkpoint_every: int = 4,
) -> DataFrame:
    """Apply an already-learned merge list, in order, to a word table
    with (word, freq, syms) — the ENCODE path: no pair counting, just
    the greedy fold per merge, localCheckpoint every few rounds to cap
    plan lineage. For production-sized merge lists (32k+) the right
    encoder is a broadcast-trie Pandas kernel over word TYPES; this
    relational path is exact and oracle-replayable at moderate counts."""
    for i, (lhs, rhs) in enumerate(merges):
        words = _apply_merge(words, lhs, rhs)
        if (i + 1) % checkpoint_every == 0:
            words = words.localCheckpoint()
    return words


def learn_bpe(
    docs: DataFrame, n_merges: int, text_col: str = "text"
) -> tuple[list[dict], DataFrame]:
    """Run `n_merges` BPE rounds. Returns (merge list, final word table
    with columns (word, freq, syms)). Stops early if the corpus runs
    out of adjacent pairs."""
    words = _char_symbols(word_freq_table(docs, text_col)).localCheckpoint()
    merges: list[dict] = []
    for rank in range(1, n_merges + 1):
        top = (
            _pair_counts(words)
            .orderBy(F.desc("pair_count"), F.asc("lhs"), F.asc("rhs"))
            .limit(1)
            .collect()
        )
        if not top:
            break
        row = top[0]
        merges.append(
            {
                "merge_rank": rank,
                "lhs": row["lhs"],
                "rhs": row["rhs"],
                "pair_count": row["pair_count"],
            }
        )
        words = _apply_merge(words, row["lhs"], row["rhs"]).localCheckpoint()
    return merges, words


def bpe_merge_table(
    docs: DataFrame, n_merges: int, text_col: str = "text"
) -> DataFrame:
    """The learned merge table: (merge_rank, lhs, rhs, pair_count),
    ordered by rank — what a tokenizer ships as its merges file."""
    spark = docs.sparkSession
    merges, _ = learn_bpe(docs, n_merges, text_col)
    schema = (
        "merge_rank long, lhs string, rhs string, pair_count long"
    )
    return spark.createDataFrame(merges, schema=schema)


def bpe_transfer_stats(
    docs: DataFrame,
    n_merges: int,
    text_col: str = "text",
    source_col: str = "source",
    train_pred=None,
) -> DataFrame:
    """Train-and-transfer: learn merges on the `train_pred` subset, then
    encode the FULL corpus with them — the production shape (a tokenizer
    is trained once, then applied to everything, including words it never
    saw; unseen words still encode because characters remain symbols).
    Per source: n_words, n_subwords, n_oov_words (word occurrences whose
    TYPE is absent from the training vocabulary), fertility.

    Plan: learning sees only the training word-type relation; encoding
    applies the ≤n_merges folds to the full word-type relation (map-side
    per fold) and joins sizes back to the exploded corpus."""
    train = docs.filter(train_pred) if train_pred is not None else docs
    merges, _ = learn_bpe(train, n_merges, text_col)
    all_words = _char_symbols(word_freq_table(docs, text_col))
    encoded = apply_merges(
        all_words, [(m["lhs"], m["rhs"]) for m in merges]
    )
    seen = (
        word_freq_table(train, text_col)
        .select("word", F.lit(1).alias("_seen"))
    )
    sizes = (
        encoded.select("word", F.size("syms").cast("long").alias("n_sub"))
        .join(seen, "word", "left")
    )
    dw = (
        docs.select(
            F.col(source_col).alias("source"),
            F.explode(F.split(F.col(text_col), " ")).alias("word"),
        )
        .filter(F.col("word") != "")
    )
    return (
        dw.join(sizes, "word")
        .groupBy("source")
        .agg(
            F.count("*").cast("long").alias("n_words"),
            F.sum("n_sub").cast("long").alias("n_subwords"),
            F.sum(F.when(F.col("_seen").isNull(), 1).otherwise(0))
            .cast("long").alias("n_oov_words"),
        )
        .select(
            "source",
            "n_words",
            "n_subwords",
            "n_oov_words",
            (
                F.col("n_subwords").cast("double")
                / F.col("n_words").cast("double")
            ).alias("fertility"),
        )
    )


def bpe_source_stats(
    docs: DataFrame,
    n_merges: int,
    text_col: str = "text",
    source_col: str = "source",
) -> DataFrame:
    """Apply the learned tokenizer back to the corpus: per source,
    (n_words, n_subwords, fertility = subwords per word) — the standard
    tokenizer-quality readout. The word→subword-count map is the final
    word-type table from learning (word types, not occurrences), joined
    back to the exploded corpus; at scale this is a plain shuffle join
    on the word key (AQE broadcasts it while the vocab is small)."""
    _, words = learn_bpe(docs, n_merges, text_col)
    sizes = words.select("word", F.size("syms").cast("long").alias("n_sub"))
    dw = (
        docs.select(
            F.col(source_col).alias("source"),
            F.explode(F.split(F.col(text_col), " ")).alias("word"),
        )
        .filter(F.col("word") != "")
    )
    return (
        dw.join(sizes, "word")
        .groupBy("source")
        .agg(
            F.count("*").cast("long").alias("n_words"),
            F.sum("n_sub").cast("long").alias("n_subwords"),
        )
        .select(
            "source",
            "n_words",
            "n_subwords",
            (
                F.col("n_subwords").cast("double")
                / F.col("n_words").cast("double")
            ).alias("fertility"),
        )
    )


# ---------------------------------------------------------------------------
# WordPiece: greedy longest-match-first segmentation (Wu et al. 2016 —
# the BERT tokenizer's inference rule). INTEGER-deterministic end to end:
# the only comparison is "longest vocab piece at this position", so there
# is no float tie-break anywhere and a SQL oracle replays it exactly.
# ---------------------------------------------------------------------------


def wordpiece_vocab(
    docs: DataFrame,
    max_len: int = 4,
    min_count: int = 2,
    text_col: str = "text",
) -> DataFrame:
    """(piece, count) — every substring of length 1..``max_len`` of every
    word, counted across the corpus weighted by word-type frequency
    (overlaps included), kept when ``count >= min_count``; ALL single
    characters are force-kept so segmentation can never fail. The corpus
    collapses once to word types; the piece enumeration is a per-type
    expression (no shuffle carries text wider than a piece)."""
    if max_len < 1:
        raise ValueError("max_len must be >= 1")
    words = word_freq_table(docs, text_col)
    cands = F.flatten(
        F.transform(
            F.sequence(F.lit(1), F.length("word")),
            lambda i: F.transform(
                F.sequence(
                    F.lit(1),
                    F.least(F.lit(max_len), F.length("word") - i + 1),
                ),
                lambda l: F.col("word").substr(i, l),
            ),
        )
    )
    counts = (
        words.select(F.explode(cands).alias("piece"), "freq")
        .groupBy("piece")
        .agg(F.sum("freq").cast("long").alias("count"))
    )
    return counts.filter(
        (F.col("count") >= min_count) | (F.length("piece") == 1)
    )


def wordpiece_segment(
    words: DataFrame,
    vocab: DataFrame,
    max_len: int = 4,
    checkpoint_every: int = 4,
    max_word_chars: int = 64,
) -> DataFrame:
    """Greedy longest-match segmentation of a (word, …) TYPE relation
    against ``vocab`` (a (piece, …) relation): at each position take the
    LONGEST vocab piece (length capped at ``max_len``); a position with
    no match consumes one character as-is (cannot happen for a
    ``wordpiece_vocab``-built vocab, which force-keeps single chars).

    Returns (word, n_pieces, pieces) with ``pieces`` '|'-joined.

    Loop shape (the BPE-round convention): one round per consumed piece —
    each round is a bounded candidate explode (``max_len`` lengths), one
    broadcast join against the vocab, one integer max per word;
    ``localCheckpoint`` every few rounds caps lineage. Rounds are bounded
    by the longest word, read once as a scalar (the same bound-only
    driver read ``learn_bpe`` uses for its round count).

    ``max_word_chars`` bounds the loop against degenerate tokens: one
    10k-char base64 blob in a web corpus would otherwise mean 10k
    sequential rounds. Longer words are EXCLUDED (no output row) — at
    corpus scale they are noise a curation pass kills anyway; raise the
    cap if they matter."""
    if max_len < 1:
        raise ValueError("max_len must be >= 1")
    # One Arrow kernel over the word-TYPE relation with the vocab piece
    # set broadcast (r7, same shape and rationale as
    # unigram_viterbi_segment): the former one-round-per-consumed-piece
    # relational loop paid fixed driver/stage overhead per round at any
    # corpus size, plus an isEmpty() action per round. Greedy
    # longest-match is a pure integer/string function of (word, vocab),
    # so the kernel is trivially result-identical: longest vocab piece at
    # each position, a no-match position consumes one char as-is, words
    # longer than ``max_word_chars`` are excluded, and a zero-length word
    # passes through as (0, ""). ``checkpoint_every`` retained for API
    # compatibility (no loop remains).
    import pandas as pd

    pieces_set = frozenset(
        r["piece"] for r in vocab.select("piece").distinct().collect()
    )
    bc = words.sparkSession.sparkContext.broadcast(pieces_set)
    ml = int(max_len)
    mwc = int(max_word_chars)

    def seg_iter(pdfs):
        vs = bc.value
        for pdf in pdfs:
            out = {"word": [], "n_pieces": [], "pieces": []}
            for w in pdf["word"]:
                n = len(w)
                p = 0
                np_ = 0
                parts = []
                while p < n:
                    # longest vocab piece wins; lengths 2..min(ml, rest)
                    # checked descending, and length 1 is the fallthrough
                    # either way (a no-match position consumes one char
                    # as-is, the relational coalesce-to-1 contract)
                    bl = 1
                    for l in range(min(ml, n - p), 1, -1):
                        if w[p:p + l] in vs:
                            bl = l
                            break
                    parts.append(w[p:p + bl])
                    p += bl
                    np_ += 1
                out["word"].append(w)
                out["n_pieces"].append(np_)
                out["pieces"].append("|".join(parts))
            if out["word"]:
                yield pd.DataFrame(out)

    return (
        words.filter(F.length("word") <= mwc)
        .select("word")
        .mapInPandas(
            seg_iter, "word string, n_pieces bigint, pieces string"
        )
    )


def wordpiece_fertility_per_source(
    docs: DataFrame,
    max_len: int = 4,
    min_count: int = 2,
    text_col: str = "text",
    source_col: str = "source",
) -> DataFrame:
    """Corpus-trained WordPiece fertility per source: vocab from the
    whole corpus, word TYPES segmented once, occurrence-weighted
    piece counts per source. Returns (source, n_words, n_pieces,
    fertility) with fertility = pieces per word occurrence, round 6."""
    vocab = wordpiece_vocab(docs, max_len=max_len, min_count=min_count,
                            text_col=text_col)
    types = word_freq_table(docs, text_col).select("word")
    seg = wordpiece_segment(types, vocab, max_len=max_len)
    per_src = (
        docs.select(
            F.col(source_col).alias("source"),
            F.explode(F.split(F.col(text_col), " ")).alias("word"),
        )
        .filter(F.col("word") != "")
        .groupBy("source", "word")
        .agg(F.count("*").cast("long").alias("c"))
    )
    return (
        per_src.join(seg, "word")
        .groupBy("source")
        .agg(
            F.sum("c").cast("long").alias("n_words"),
            F.sum(F.col("c") * F.col("n_pieces")).cast("long")
            .alias("n_pieces"),
        )
        .select(
            "source", "n_words", "n_pieces",
            F.round(F.col("n_pieces") / F.col("n_words"), 6)
            .alias("fertility"),
        )
    )


# ---------------------------------------------------------------------------
# Unigram-LM Viterbi segmentation (Kudo 2018 — the SentencePiece
# inference rule): segment each word into the vocab pieces maximizing
# the sum of piece log-probabilities. The probabilistic counterpart of
# WordPiece's greedy rule, sharing its round-loop shape: one bounded
# candidate window per char position, a broadcast vocab join, one
# per-word argmax. Determinism contract (the dsir/bm25 convention):
# path comparison is (round(score,6) DESC, n_pieces ASC, pieces DESC) —
# identical ln arguments on both engines keep rounded scores aligned,
# and a full tie means an identical path.
# ---------------------------------------------------------------------------


def unigram_piece_vocab(
    docs: DataFrame,
    max_len: int = 4,
    min_count: int = 2,
    text_col: str = "text",
) -> DataFrame:
    """(piece, count, logp) — the WordPiece substring vocab with a
    unigram LM over it: ``logp = ln(count) − ln(Σ kept counts)``.
    Single chars are force-kept (wordpiece_vocab), so every word has at
    least one segmentation."""
    vocab = wordpiece_vocab(docs, max_len=max_len, min_count=min_count,
                            text_col=text_col)
    total = vocab.agg(F.sum("count").cast("long").alias("tot"))
    return vocab.crossJoin(F.broadcast(total)).select(
        "piece", "count",
        (F.log(F.col("count").cast("double")) - F.log(F.col("tot")))
        .alias("logp"),
    )


def unigram_viterbi_segment(
    words: DataFrame,
    vocab: DataFrame,
    max_len: int = 4,
    checkpoint_every: int = 4,
    max_word_chars: int = 64,
) -> DataFrame:
    """Viterbi DP over char positions of each word TYPE: ``dp[i]`` is the
    best-scoring segmentation of the first ``i`` chars; position ``i``
    extends every ``dp[j]`` (``i − max_len ≤ j < i``) whose closing piece
    ``word[j+1..i]`` is in ``vocab``. Positions unreachable under the
    vocab simply have no dp row; a ``unigram_piece_vocab`` vocab keeps
    all single chars so the final position is always reached.

    Returns (word, score, n_pieces, pieces) with ``pieces`` '|'-joined
    and score the unrounded path sum (round at the consumer).

    Execution: the DP is strictly per-word-local, so it runs as ONE
    Arrow-batched kernel over the word-TYPE relation with the vocab
    broadcast as a plain dict (bounded by |charset|^max_len substring
    types — the same boundedness the old broadcast join relied on). The
    former one-round-per-char-position relational loop paid a fixed
    ~0.4 s of driver/stage overhead per position at ANY corpus size
    (longest word ⇒ ~12+ sequential rounds over a types-sized relation);
    the kernel pays one Python stage over types only — the corpus never
    crosses the Python boundary (guide §4.2: collapse to types, then do
    per-type work next to the data).

    Result-identical to the relational loop by construction: scores
    accumulate left-to-right in the same order (bit-identical doubles),
    and the per-position argmax mirrors the engine comparator
    lexicographically — (round(score,6) DESC, n_pieces ASC, pieces
    DESC); a full tie is an identical path. round() reproduces Spark's
    HALF_UP over the shortest-decimal representation (Java
    BigDecimal.valueOf semantics) via Decimal(repr(x)); Python/UTF-8
    string order equals Spark's binary string order. Equality is
    fuzz-pinned in tests/test_unigram_viterbi.py. ``checkpoint_every``
    is retained for API compatibility (no loop remains to checkpoint)."""
    if max_len < 1:
        raise ValueError("max_len must be >= 1")
    import pandas as pd

    vmap = {
        r["piece"]: r["logp"]
        for r in vocab.select("piece", "logp").collect()
    }
    bc = words.sparkSession.sparkContext.broadcast(vmap)
    ml = int(max_len)
    mwc = int(max_word_chars)

    def seg_iter(pdfs):
        from decimal import ROUND_HALF_UP, Decimal

        q6 = Decimal("0.000001")
        vm = bc.value

        def r6(x: float) -> float:
            return float(Decimal(repr(x)).quantize(q6, rounding=ROUND_HALF_UP))

        for pdf in pdfs:
            out = {"word": [], "score": [], "n_pieces": [], "pieces": []}
            for w in pdf["word"]:
                n = len(w)
                if n == 0:
                    continue
                # dp[i] = (r6(score), -n_pieces, pieces, score, n_pieces)
                dp: dict[int, tuple] = {0: (0.0, 0, "", 0.0, 0)}
                for i in range(1, n + 1):
                    best = None
                    for j in range(i - ml if i > ml else 0, i):
                        st = dp.get(j)
                        if st is None:
                            continue
                        lp = vm.get(w[j:i])
                        if lp is None:
                            continue
                        sc = st[3] + lp
                        np_ = st[4] + 1
                        pieces = st[2] + ("" if st[4] == 0 else "|") + w[j:i]
                        cand = (r6(sc), -np_, pieces, sc, np_)
                        if best is None or cand[:3] > best[:3]:
                            best = cand
                    if best is not None:
                        dp[i] = best
                fin = dp.get(n)
                if fin is None:
                    continue
                out["word"].append(w)
                out["score"].append(fin[3])
                out["n_pieces"].append(fin[4])
                out["pieces"].append(fin[2])
            if out["word"]:
                yield pd.DataFrame(out)

    return words.filter(F.length("word") <= mwc).select("word").mapInPandas(
        seg_iter, "word string, score double, n_pieces bigint, pieces string"
    )


def unigram_segment_stats_per_source(
    docs: DataFrame,
    max_len: int = 4,
    min_count: int = 2,
    text_col: str = "text",
    source_col: str = "source",
) -> DataFrame:
    """Corpus-trained unigram-Viterbi segmentation stats per source:
    (source, n_words, n_pieces, fertility, avg_logp) — fertility =
    pieces per word occurrence, avg_logp = occurrence-weighted mean
    best-path score, both round 6."""
    vocab = unigram_piece_vocab(docs, max_len=max_len,
                                min_count=min_count, text_col=text_col)
    types = word_freq_table(docs, text_col).select("word")
    seg = unigram_viterbi_segment(types, vocab, max_len=max_len)
    per_src = (
        docs.select(
            F.col(source_col).alias("source"),
            F.explode(F.split(F.col(text_col), " ")).alias("word"),
        )
        .filter(F.col("word") != "")
        .groupBy("source", "word")
        .agg(F.count("*").cast("long").alias("c"))
    )
    return (
        per_src.join(seg, "word")
        .groupBy("source")
        .agg(
            F.sum("c").cast("long").alias("n_words"),
            F.sum(F.col("c") * F.col("n_pieces")).cast("long")
            .alias("n_pieces"),
            F.sum(F.col("c") * F.col("score")).alias("_s"),
        )
        .select(
            "source", "n_words", "n_pieces",
            F.round(F.col("n_pieces") / F.col("n_words"), 6)
            .alias("fertility"),
            F.round(F.col("_s") / F.col("n_words"), 6).alias("avg_logp"),
        )
    )
