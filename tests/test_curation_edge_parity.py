"""Adversarial cross-engine parity for the curation wave: the oracle
gate only ever sees the generator's text distribution; these tests run
the same Spark-vs-DuckDB comparison over edge-case documents (empty,
whitespace-only, unicode, single token, boundary token counts) where
tokenizer/regex/slice semantics could legally diverge between engines.
"""

from __future__ import annotations

import math

import duckdb
import pandas as pd
import pytest

from log2sql_spark.registry import all_oracles, all_queries

EDGE_DOCS = [
    (0, ""),  # empty
    (1, "   "),  # whitespace only
    (2, "one"),  # single token
    (3, "\ttabs\tand\nnewlines  mixed\r\n here"),  # exotic whitespace
    (4, " ".join(f"tok{i}" for i in range(32))),  # exactly one chunk
    (5, " ".join(f"tok{i}" for i in range(33))),  # boundary: 2 chunks
    (6, " ".join(f"tok{i}" for i in range(57))),  # stride boundary +1
    (7, "héllo wörld ünïcode ¡tokens! 中文 分词 テスト トークン"),
    (8, "a" * 500),  # one giant token
    (9, "dup dup dup dup dup"),  # heavy repetition
    (455, "eval set text with some unique grams inside it"),  # eval region
    (456, "第二 эвал 文本 with mixed scripts"),  # unicode eval doc
]


@pytest.fixture(scope="module")
def edge_sf_dir(spark, tmp_path_factory) -> str:
    d = tmp_path_factory.mktemp("edge_sf")
    pdf = pd.DataFrame(
        {
            "doc_id": [i for i, _ in EDGE_DOCS],
            "text": [t for _, t in EDGE_DOCS],
            "lang": ["en"] * len(EDGE_DOCS),
            "source": ["src0"] * len(EDGE_DOCS),
            "n_chars": [len(t) for _, t in EDGE_DOCS],
        }
    )
    spark.createDataFrame(pdf).coalesce(1).write.parquet(str(d / "documents.parquet"))
    return str(d)


def _compare(spark, edge_sf_dir, name):
    sdf = all_queries()[name](spark, edge_sf_dir).toPandas()
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM '{edge_sf_dir}/documents.parquet/*.parquet'"
    )
    ddf = con.execute(all_oracles()[name]).fetchdf()
    assert list(sdf.columns) == list(ddf.columns), name
    assert len(sdf) == len(ddf), f"{name}: {len(sdf)} vs {len(ddf)} rows"
    s = sdf.sort_values(list(sdf.columns)).reset_index(drop=True)
    d = ddf.sort_values(list(ddf.columns)).reset_index(drop=True)
    for col in s.columns:
        for i, (a, b) in enumerate(zip(s[col], d[col])):
            if isinstance(a, float) and isinstance(b, float):
                if math.isnan(a) and math.isnan(b):
                    continue
                assert a == pytest.approx(b, abs=1e-9), (name, col, i, a, b)
            else:
                assert str(a) == str(b), (name, col, i, a, b)


@pytest.mark.parametrize(
    "name",
    [
        "llm_chunk_sliding_window",
        "llm_decontaminate_bloom",
        "llm_dedup_url_canonical",
        "llm_mix_temperature_resample",
        # round 6: Gopher/C4 rules and phrase adjacency over the same
        # adversarial docs (empty/whitespace/unicode/giant-token)
        "llm_gopher_quality",
        "llm_c4_line_filter",
        "search_phrase_adjacent",
        # round 6 wave 6: NB classifier (single-label corpus, ''-token
        # vocab), token entropy (empty doc => H=0 over ['']), weighted
        # sampling (n_chars=0 clamps), CDC chunking (sub-4-token docs)
        "llm_nb_source_classifier",
        "llm_token_entropy",
        "llm_weighted_sample_topk",
        "llm_dedup_cdc_chunks",
        # round 6 wave 8: code detector (empty doc 0>=0 guard,
        # whitespace-only indent guard, \r\n line splits)
        "llm_code_detect",
        # round 6 wave 8: containment dedup (empty/whitespace docs have
        # no grams so never reach the pair join; 15-word prefix slice
        # of short docs; dup-heavy doc collapses to one distinct gram)
        "llm_dedup_containment",
    ],
)
def test_edge_doc_parity(spark, edge_sf_dir, name):
    _compare(spark, edge_sf_dir, name)


@pytest.fixture(scope="module")
def edge_emb_dir(spark, tmp_path_factory) -> str:
    """Embeddings with adversarial vectors: all-zero (cosine is 0/0),
    denormal-scale, and negative components."""
    d = tmp_path_factory.mktemp("edge_emb")
    rows = []
    for i in range(40):
        if i == 7:
            v = [0.0] * 8
        elif i == 9:
            v = [1e-30] * 8
        else:
            v = [float(((i * 31 + j * 7) % 13) - 6) for j in range(8)]
        rows.append((i, v, i % 3))
    pdf = pd.DataFrame(
        {
            "vec_id": [r[0] for r in rows],
            "embedding": [r[1] for r in rows],
            "label": [r[2] for r in rows],
        }
    )
    spark.createDataFrame(pdf).coalesce(1).write.parquet(
        str(d / "embeddings.parquet")
    )
    return str(d)


@pytest.mark.parametrize("name", ["llm_semdedup", "llm_dedup_embedding_cosine"])
def test_zero_vector_parity(spark, edge_emb_dir, name):
    """A zero-norm embedding must neither crash (ANSI DIVIDE_BY_ZERO —
    the pre-fix behavior of operators/similarity.py::cosine) nor
    diverge from the oracle: Spark's try_divide NULL fails the same
    threshold comparison DuckDB's 0/0 = NaN fails."""
    sdf = all_queries()[name](spark, edge_emb_dir).toPandas()
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW embeddings AS SELECT * FROM '{edge_emb_dir}/embeddings.parquet/*.parquet'"
    )
    ddf = con.execute(all_oracles()[name]).fetchdf()
    assert len(sdf) == len(ddf)
    key = list(sdf.columns)[0]
    assert sorted(sdf[key]) == sorted(ddf[key])


@pytest.fixture(scope="module")
def edge_events_dir(spark, tmp_path_factory) -> str:
    """Events with adversarial rows: NaN value, malformed JSON props,
    NULL props/event_type/value."""
    import datetime

    d = tmp_path_factory.mktemp("edge_events")
    base = datetime.datetime(2024, 3, 1)
    rows = []
    for i in range(50):
        props = '{"k": %d}' % i
        val: float | None = float(i)
        et: str | None = "purchase" if i % 3 == 0 else "view"
        if i == 5:
            val = float("nan")
        if i == 6:
            props = "{not json"
        if i == 7:
            props = None
        if i == 8:
            et = None
        if i == 9:
            val = None
        rows.append((i, base + datetime.timedelta(hours=i), i % 10, et, val, props))
    pdf = pd.DataFrame(
        rows, columns=["event_id", "ts", "user_id", "event_type", "value", "props"]
    )
    spark.createDataFrame(pdf).coalesce(1).write.parquet(str(d / "events.parquet"))
    return str(d)


@pytest.mark.parametrize(
    "name",
    [
        "json_variant_funcs",
        "ts_rollup_reaggregate",
        "ts_ewma_smooth",
        # round 6 analytics: NaN/NULL value, NULL event_type rows must
        # flow through OHLC/mode/path/RFM/AB/decompose identically
        "ts_ohlc_resample",
        "agg_mode_deterministic",
        "events_user_path_transitions",
        "events_rfm_segmentation",
        "events_ab_conversion",
        "ts_seasonal_decompose",
        # round 6 wave 6: attribution with ZERO click events (every
        # purchase lands in the organic bucket via the all-NULL as-of
        # path) and a series too short for any 7-day-lag pair (both
        # engines must agree on the empty/degenerate result)
        "events_attribution_last_touch",
        "ts_forecast_snaive_eval",
    ],
)
def test_edge_events_parity(spark, edge_events_dir, name):
    """Malformed JSON must not FAILFAST the scan (the pre-fix behavior
    of json_variant_funcs), and NaN/NULL values must flow through the
    rollup arithmetic identically in both engines."""
    sdf = all_queries()[name](spark, edge_events_dir).toPandas()
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW events AS SELECT * FROM '{edge_events_dir}/events.parquet/*.parquet'"
    )
    ddf = con.execute(all_oracles()[name]).fetchdf()
    assert len(sdf) == len(ddf)
    key = list(sdf.columns)[0]
    assert sorted(sdf[key].astype(str)) == sorted(ddf[key].astype(str))


@pytest.mark.parametrize("name", ["llm_text_stats", "udtf_word_positions"])
def test_edge_doc_parity_text_ops(spark, edge_sf_dir, name):
    """Empty/whitespace-only documents: text stats must yield NULL
    ratios (not an ANSI divide-by-zero abort), and the word-position
    UDTF's Python split() contract — no tokens for empty text — must
    match the oracle's filtered regexp split."""
    sdf = all_queries()[name](spark, edge_sf_dir).toPandas()
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM '{edge_sf_dir}/documents.parquet/*.parquet'"
    )
    ddf = con.execute(all_oracles()[name]).fetchdf()
    assert len(sdf) == len(ddf)


@pytest.fixture(scope="module")
def edge_tpch_dir(spark, tmp_path_factory) -> str:
    """TPC-H-shaped tables with NULL foreign keys, NaN money, NULL
    dates and empty strings — the inputs the generator never emits."""
    import datetime

    d = tmp_path_factory.mktemp("edge_tpch")
    base = datetime.datetime(1995, 3, 1)
    n = 60
    orders = pd.DataFrame(
        {
            "o_orderkey": range(n),
            "o_custkey": [i % 10 if i != 5 else None for i in range(n)],
            "o_orderstatus": ["O" if i % 2 else "F" for i in range(n)],
            "o_totalprice": [
                float(i * 11.13) if i != 7 else float("nan") for i in range(n)
            ],
            "o_orderdate": [
                base + datetime.timedelta(days=i % 400) for i in range(n)
            ],
            "o_orderpriority": ["1-URGENT" if i % 3 else "" for i in range(n)],
        }
    )
    orders.loc[9, "o_orderdate"] = None
    lineitem = pd.DataFrame(
        {
            "l_orderkey": [i % n for i in range(n * 3)],
            "l_partkey": [i % 20 for i in range(n * 3)],
            "l_suppkey": [i % 5 for i in range(n * 3)],
            "l_linenumber": [i % 3 + 1 for i in range(n * 3)],
            "l_quantity": [float(i % 50) for i in range(n * 3)],
            "l_extendedprice": [
                float(i * 7.77) if i != 11 else float("nan") for i in range(n * 3)
            ],
            "l_discount": [0.05 if i % 2 else 0.0 for i in range(n * 3)],
            "l_tax": [0.02] * (n * 3),
            "l_returnflag": ["N" if i % 2 else "R" for i in range(n * 3)],
            "l_linestatus": ["O"] * (n * 3),
            "l_shipdate": [
                base + datetime.timedelta(days=i % 200) for i in range(n * 3)
            ],
        }
    )
    customer = pd.DataFrame(
        {
            "c_custkey": range(10),
            "c_name": [f"Cust {i}" if i != 3 else "" for i in range(10)],
            "c_nationkey": [i % 5 for i in range(10)],
            "c_acctbal": [
                float(i * 100) if i != 4 else float("nan") for i in range(10)
            ],
            "c_mktsegment": ["BUILDING" if i % 2 else "MACHINERY" for i in range(10)],
        }
    )
    for name, pdf in (
        ("orders", orders),
        ("lineitem", lineitem),
        ("customer", customer),
    ):
        spark.createDataFrame(pdf).coalesce(1).write.parquet(
            str(d / f"{name}.parquet")
        )
    return str(d)


@pytest.mark.parametrize(
    "name",
    ["q1_pricing_summary", "q3_shipping_priority", "agg_percentiles",
     "window_value_funcs", "sql_parameterized"],
)
def test_edge_tpch_parity(spark, edge_tpch_dir, name):
    """NULL keys drop from equi-joins, NaN money flows through the
    integer-cents arithmetic, and NULL dates group — identically in
    both engines (the full 39-query sweep over this fixture passed;
    these five pin the representative shapes)."""
    sdf = all_queries()[name](spark, edge_tpch_dir).toPandas()
    con = duckdb.connect()
    for t in ("orders", "lineitem", "customer"):
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{edge_tpch_dir}/{t}.parquet/*.parquet'"
        )
    ddf = con.execute(all_oracles()[name]).fetchdf()
    assert len(sdf) == len(ddf)
