"""Pigeonhole-banding equivalence proof for SimHash candidates.

The banded join (operators/dedup.py simhash_near_dup_pairs) claims:
hamming(a, b) <= max_hamming ⇒ a and b share at least one identical
band, so the equi-join on (band_idx, band_bits) loses NO qualifying
pair. This test checks the full output — not a fixture sample — against
a Python brute-force over adversarially constructed fingerprints
(clusters of k-bit flips straddling the threshold, including flips
packed into a single band and spread across all bands).
"""

from __future__ import annotations

import random

from log2sql_spark.operators.dedup import simhash_near_dup_pairs

BITS, MAX_HAMMING = 60, 4


def _flip(fp: int, positions: list[int]) -> int:
    for p in positions:
        fp ^= 1 << p
    return fp


def test_banded_pairs_equal_bruteforce(spark):
    rng = random.Random(7)
    fps: list[int] = []
    for _ in range(8):
        base = rng.getrandbits(BITS)
        fps.append(base)
        # variants at hamming 1..6: below, at, and above the threshold
        for k in range(1, 7):
            fps.append(_flip(base, rng.sample(range(BITS), k)))
        # all flips inside ONE band (worst case for banding claims)
        fps.append(_flip(base, [0, 1, 2, 3]))
        # flips spread across four different bands (one per band)
        fps.append(_flip(base, [0, 12, 24, 36]))

    rows = [(i, fp) for i, fp in enumerate(fps)]
    expected = {
        (a, b)
        for a, (_, fa) in enumerate(rows)
        for b, (_, fb) in enumerate(rows)
        if a < b and bin(fa ^ fb).count("1") <= MAX_HAMMING
    }
    df = spark.createDataFrame(rows, "id long, simhash long")
    got = {
        (r.id_a, r.id_b): r.hamming
        for r in simhash_near_dup_pairs(df, bits=BITS, max_hamming=MAX_HAMMING).collect()
    }
    assert set(got) == expected  # no lost pairs (pigeonhole), no extras
    for (a, b), h in got.items():
        assert h == bin(fps[a] ^ fps[b]).count("1")


# ---------------------------------------------------------------------------
# ppjoin_pairs (operators/dedup.py): prefix filtering is LOSSLESS
# ---------------------------------------------------------------------------

def _brute_jaccard_pairs(corpus, num, den):
    """Reference: exact all-pairs word-set Jaccard >= num/den via
    cross-multiplied integers (no floats, boundary-exact)."""
    sets = {i: set(t.split()) for i, t in corpus}
    ids = sorted(sets)
    out = {}
    for i, a in enumerate(ids):
        for b in ids[i + 1:]:
            inter = len(sets[a] & sets[b])
            union = len(sets[a]) + len(sets[b]) - inter
            if union and den * inter >= num * union:
                out[(a, b)] = (
                    len(sets[a]), len(sets[b]), inter,
                    inter * 10000 // union,
                )
    return out


def test_ppjoin_lossless_vs_brute_force(spark):
    """The prefix filter + length filter must lose NOTHING: on random
    small-vocab corpora (dense with near-boundary pairs, including
    Jaccard == threshold exactly), ppjoin's verified output equals the
    brute-force all-pairs result — every pair, every count, every
    basis-point score. Runs at n=1 (word sets) so the reference is
    trivially checkable, and at two thresholds to exercise different
    prefix lengths."""
    import random

    from log2sql_spark.operators.dedup import ppjoin_pairs

    rng = random.Random(1234)
    vocab = [f"w{i}" for i in range(30)]
    for trial, threshold in [(0, (7, 10)), (1, (1, 2)), (2, (9, 10))]:
        corpus = []
        for i in range(40):
            k = rng.randint(1, 12)
            words = rng.sample(vocab, k)
            corpus.append((trial * 1000 + i, " ".join(words)))
        # engineered exact-boundary pair: |A|=|B|=5, inter=... J=1/2
        # needs inter/(10-inter)=1/2 -> inter=10/3 no; use J exactly
        # threshold for (7,10): sets of 17 with inter 14: 14/20=0.7
        a_words = vocab[:17]
        b_words = vocab[:14] + [f"x{j}" for j in range(3)]
        corpus.append((trial * 1000 + 900, " ".join(a_words)))
        corpus.append((trial * 1000 + 901, " ".join(b_words)))
        expect = _brute_jaccard_pairs(corpus, *threshold)
        df = spark.createDataFrame(corpus, "doc_id long, text string")
        got = {
            (r.id_a, r.id_b): (r.n_a, r.n_b, r.n_inter, r.jacc_bp)
            for r in ppjoin_pairs(df, threshold=threshold, n=1).collect()
        }
        assert got == expect, f"trial {trial} thr {threshold}"
        if threshold == (7, 10):
            # the engineered boundary pair (J = 0.7 exactly) is present
            assert (trial * 1000 + 900, trial * 1000 + 901) in got
