"""Eval-metric queries (quality_classifier_auc / quality_cohens_kappa):
cross-checked against brute-force pure-Python references and pinned on
degenerate inputs the sf corpora may never hit (single-class sources,
all-agree annotators)."""

from __future__ import annotations

import pytest

from log2sql_spark import registry


def _brute_auc(pairs):
    """AUC by definition: P(score_pos > score_neg) + 0.5*P(tie)."""
    pos = [s for label, s in pairs if label == 1]
    neg = [s for label, s in pairs if label == 0]
    if not pos or not neg:
        return None
    wins = ties = 0
    for p in pos:
        for n in neg:
            if p > n:
                wins += 1
            elif p == n:
                ties += 1
    return (wins + 0.5 * ties) / (len(pos) * len(neg))


def test_auc_matches_bruteforce_per_source(spark, sf_dir):
    out = {
        r.source: r
        for r in registry.all_queries()["quality_classifier_auc"](
            spark, sf_dir
        ).collect()
    }
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").collect()
    by_source: dict[str, list] = {}
    for d in docs:
        toks = set((d.text or "").strip().split())
        by_source.setdefault(d.source, []).append(
            (1 if "spark" in (d.text or "") else 0, len(toks))
        )
    assert set(out) == set(by_source)
    for src, pairs in by_source.items():
        ref = _brute_auc(pairs)
        got = out[src].auc
        if ref is None:
            assert got is None
        else:
            assert got == pytest.approx(round(ref, 6), abs=1e-9), src


def test_kappa_matches_definition_per_source(spark, sf_dir):
    out = {
        r.source: r
        for r in registry.all_queries()["quality_cohens_kappa"](
            spark, sf_dir
        ).collect()
    }
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").collect()
    by_source: dict[str, list] = {}
    for d in docs:
        a = 1 if "spark" in (d.text or "") else 0
        b = 1 if d.n_chars >= 250 else 0
        by_source.setdefault(d.source, []).append((a, b))
    for src, ab in by_source.items():
        n = len(ab)
        po = sum(1 for a, b in ab if a == b) / n
        pa = sum(a for a, _ in ab) / n
        pb = sum(b for _, b in ab) / n
        pe = pa * pb + (1 - pa) * (1 - pb)
        got = out[src].kappa
        if pe == 1.0:
            assert got is None
        else:
            ref = (po - pe) / (1 - pe)
            assert got == pytest.approx(round(ref, 6), abs=1e-9), src


def _write_docs(spark, tmp_path, rows):
    path = str(tmp_path / "edge")
    spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    ).write.mode("overwrite").parquet(f"{path}/documents.parquet")
    return path


def test_auc_degenerate_single_class_is_null(spark, tmp_path):
    sf = _write_docs(
        spark,
        tmp_path,
        [
            # src_all_pos: every doc positive -> AUC undefined (NULL)
            (1, "spark spark tools", "en", "src_all_pos", 100),
            (2, "spark engine", "en", "src_all_pos", 300),
            # src_mixed: perfect separation -> AUC 1.0
            (3, "spark a b c d", "en", "src_mixed", 100),
            (4, "x y", "en", "src_mixed", 100),
            # src_tied: one pos one neg with IDENTICAL score -> 0.5
            (5, "spark b", "en", "src_tied", 100),
            (6, "c d", "en", "src_tied", 100),
        ],
    )
    rows = {
        r.source: r
        for r in registry.all_queries()["quality_classifier_auc"](spark, sf).collect()
    }
    assert rows["src_all_pos"].auc is None
    assert rows["src_all_pos"].n_neg == 0
    assert rows["src_mixed"].auc == 1.0
    assert rows["src_tied"].auc == 0.5


def test_kappa_degenerate_chance_only_is_null(spark, tmp_path):
    sf = _write_docs(
        spark,
        tmp_path,
        [
            # both annotators constant-positive: pe == 1 -> NULL
            (1, "spark", "en", "src_const", 900),
            (2, "spark etc", "en", "src_const", 901),
            # perfect agreement on a mixed source -> kappa 1.0
            (3, "spark", "en", "src_agree", 900),
            (4, "plain", "en", "src_agree", 10),
            # perfect DISagreement on a balanced source -> kappa -1.0
            (5, "spark", "en", "src_flip", 10),
            (6, "plain", "en", "src_flip", 900),
        ],
    )
    rows = {
        r.source: r
        for r in registry.all_queries()["quality_cohens_kappa"](spark, sf).collect()
    }
    assert rows["src_const"].kappa is None
    assert rows["src_agree"].kappa == 1.0
    assert rows["src_flip"].kappa == -1.0


def test_gains_decile_assignment_matches_ntile_on_awkward_n(spark, tmp_path):
    """The distributed closed-form decile (base rank + per-group
    row_number + ntile bucket arithmetic) must equal DuckDB's ntile(10)
    on an N that exercises the oversized-bucket branch (N % 10 != 0)
    and a tie group SPANNING a decile boundary."""
    import duckdb

    rows = []
    # 23 docs: deciles 1-3 get 3 rows, 4-10 get 2 (ntile semantics).
    # Give 7 docs the SAME score so the tie group crosses boundaries.
    for i in range(23):
        s_words = ["w%d" % j for j in range(5 if 8 <= i < 15 else 5 + i)]
        text = ("spark " if i % 3 == 0 else "") + " ".join(s_words)
        rows.append((i, text, "en", "src", len(text)))
    sf = _write_docs(spark, tmp_path, rows)

    got = {
        r.decile: (r.n, r.pos, r.cum_pos)
        for r in registry.all_queries()["quality_classifier_gains_deciles"](
            spark, sf
        ).collect()
    }
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{sf}/documents.parquet/*.parquet')"
    )
    ref = {
        r[0]: (r[1], r[2], r[3])
        for r in con.execute(
            registry.all_oracles()["quality_classifier_gains_deciles"]
        ).fetchall()
    }
    con.close()
    assert got == ref
    assert sum(n for n, _, _ in got.values()) == 23
    assert [got[d][0] for d in sorted(got)][:4] == [3, 3, 3, 2]
