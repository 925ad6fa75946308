"""Pure-Python conformance oracle for the two-phase screen.

A line-by-line faithful re-expression of the reference's decision semantics
over token tuples — used ONLY in tests, to pin the vectorized Spark kernels
to the reference's hit/miss decisions and scores. Quirks are preserved
deliberately (SURVEY.md §7 "port semantics, not intent"):

 * FPscreen: ``threshold<=0 → True``; ``len-k+1<=0 → False``; count DISTINCT
   k-grams that hit, early exit at threshold
   (/root/reference/src/FQread.hpp:66-90).
 * RC retry only when forward FP fails, never when forward FP passes but SP
   fails (/root/reference/src/BlooMineUtils.cpp:337-365). The token-domain
   canonical transform is array reversal (optionally composed with a
   vocabulary complement map, the analog of
   /root/reference/src/utilities.hpp:131-159).
 * kmerAlign: paint covered intervals; all-uncovered → score 0
   (/root/reference/src/FQread.hpp:252-259); strip leading/trailing
   uncovered (/root/reference/src/FQread.hpp:524-553); split at gap runs
   >= ceil((hit*k-go)/ge) (/root/reference/src/FQread.hpp:320-366); maximum
   over ALL contiguous concatenations, where an internal (within-fragment)
   gap of g costs ``go + ge*(g-1)`` but a bridging gap between concatenated
   fragments costs ``go + (ge*g - 1)`` — the X9 quirk: the ``-1`` binds to
   the product in ``score-=_ge*subaln_vec[i].gap-1``
   (/root/reference/src/FQread.hpp:447-451).
 * SP pass iff max score >= MST (/root/reference/src/FQread.hpp:190-197).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Callable, Sequence

from bloomine_spark.params import ScreenParams


def kgram_set(tokens: Sequence[int], k: int) -> set[tuple[int, ...]]:
    return {tuple(tokens[i : i + k]) for i in range(len(tokens) - k + 1)}


def fp_screen(
    read: Sequence[int],
    k: int,
    threshold: int,
    member: Callable[[tuple[int, ...]], bool],
) -> bool:
    """First-pass screen: distinct k-gram membership count vs threshold."""
    if threshold <= 0:
        return True
    limit = len(read) - k + 1
    if limit <= 0:
        return False
    hit_count = 0
    seen: set[tuple[int, ...]] = set()
    for i in range(limit):
        kg = tuple(read[i : i + k])
        if kg in seen:
            continue
        seen.add(kg)
        if member(kg):
            hit_count += 1
            if hit_count >= threshold:
                return True
    return False


@dataclass
class Fragment:
    covered: list[bool]  # mask of the fragment (ends are covered)
    gap_after: int       # gap run length following this fragment
    score: int
    start: int
    end: int


def _score_fragment(mask: Sequence[bool], p: ScreenParams) -> int:
    """Affine scan: +hit per covered, -go first gap char, -ge later ones
    (/root/reference/src/FQread.hpp:472-489)."""
    score = 0.0
    gap = 0
    for covered in mask:
        if covered:
            score += p.hit
            gap = 0
        elif gap == 0:
            score -= p.gap_open
            gap += 1
        else:
            score -= p.gap_extend
            gap += 1
    return int(score)


def kmer_align_score(
    read: Sequence[int],
    target_kset: set[tuple[int, ...]],
    k: int,
    p: ScreenParams,
) -> int:
    """Max-scoring subalignment score of the target k-gram set vs the read."""
    n = len(read)
    covered = [False] * n
    for i in range(n - k + 1):
        if tuple(read[i : i + k]) in target_kset:
            for j in range(i, i + k):
                covered[j] = True
    if not any(covered):
        return 0

    # strip leading/trailing uncovered
    first = covered.index(True)
    last = n - 1 - covered[::-1].index(True)
    stripped = covered[first : last + 1]

    # split at gap runs >= gap_threshold
    gap_threshold = p.gap_threshold()
    fragments: list[Fragment] = []
    c0 = 0
    gap_count = 0
    for i, cov in enumerate(stripped):
        gap_count = gap_count + 1 if not cov else 0
        nxt = stripped[i + 1] if i + 1 < len(stripped) else True  # '\0' != '-'
        if not cov and gap_count >= gap_threshold and nxt:
            frag = stripped[c0 : i + 1 - gap_count]
            fragments.append(
                Fragment(frag, gap_count, _score_fragment(frag, p),
                         first + c0, first + c0 + len(frag))
            )
            c0 = i + 1
            gap_count = 0
    frag = stripped[c0:]
    fragments.append(
        Fragment(frag, 0, _score_fragment(frag, p),
                 first + c0, first + c0 + len(frag))
    )

    # max over all contiguous concatenations (O(s^2), s small)
    best = fragments[0].score
    for i in range(len(fragments)):
        for j in range(i, len(fragments)):
            if i == j:
                score = fragments[i].score
            else:
                score = 0.0
                for t in range(i, j + 1):
                    score += fragments[t].score
                    if t < j:
                        score -= p.gap_open
                        score -= p.gap_extend * fragments[t].gap_after - 1  # X9 quirk
                score = int(score)
            if score > best:
                best = score
    return int(best)


@dataclass
class OracleScreenResult:
    fp_pass: bool
    rc: bool          # decision came from the transformed (reversed) read
    score: int | None  # None when FP failed on both orientations (no log row)
    sp_pass: bool
    hit: bool


def screen_read(
    read: Sequence[int],
    target_tokens: Sequence[int],
    p: ScreenParams,
    member: Callable[[tuple[int, ...]], bool] | None = None,
    transform: Callable[[Sequence[int]], Sequence[int]] | None = None,
) -> OracleScreenResult:
    """Full per-read reference pipeline: FP → (RC retry) → SP.

    ``member`` defaults to exact target-kset membership (valid whenever the
    Bloom filter produces no false positives on the fixture — asserted by
    tests); pass ``bloom.contains`` style callables to emulate FP effects.
    """
    target_kset = kgram_set(target_tokens, p.k)
    threshold = p.fp_threshold(len(target_kset))
    mst = p.mst(len(target_kset))
    if member is None:
        member = target_kset.__contains__
    if transform is None:
        transform = lambda r: list(r)[::-1]  # noqa: E731

    if fp_screen(read, p.k, threshold, member):
        score = kmer_align_score(read, target_kset, p.k, p)
        sp = score >= mst
        return OracleScreenResult(True, False, score, sp, sp)

    rc_read = transform(read)
    if fp_screen(rc_read, p.k, threshold, member):
        score = kmer_align_score(rc_read, target_kset, p.k, p)
        sp = score >= mst
        return OracleScreenResult(True, True, score, sp, sp)

    return OracleScreenResult(False, False, None, False, False)
