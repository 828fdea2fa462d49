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
