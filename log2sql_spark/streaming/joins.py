"""Stream-stream joins: watermarked, event-time-bounded joins between
two live streams — the attribution workload (click within N minutes of
its impression) that neither a stream-static join nor a batch twin can
express online.

Why the time bound is not optional at scale: a stream-stream join must
buffer BOTH sides in state until a match can be ruled out. The
watermark plus the event-time range condition give Spark a provable
upper bound on how long either side can matter, so state for expired
rows is evicted every micro-batch — without the bound, state grows
with the stream and a 100 TB/day pipeline OOMs by lunch. This is the
same state-eviction contract the windowed aggregations rely on
(`streaming/windows.py`), applied to a binary operator.

Reference relation: the offline analog is `join_range` /
`join_interval_self` in the registry; this module is their online
form, exercised end-to-end in tests/test_stream_join.py with two file
streams joined across micro-batch boundaries (maxFilesPerTrigger=1
forces the match to happen THROUGH buffered state, not within one
batch).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def attribution_interval_join(
    impressions: DataFrame,
    clicks: DataFrame,
    watermark: str = "10 minutes",
    within: str = "10 minutes",
    how: str = "inner",
) -> DataFrame:
    """Join each click to the impression it follows within ``within``.

    ``impressions`` needs (ad_id, imp_ts, ...); ``clicks`` needs
    (c_ad_id, clk_ts, ...). Both sides get event-time watermarks; the
    join condition carries the event-time band, which is what lets the
    state store evict an impression once the watermark passes
    imp_ts + within (no click can ever match it again) and a click as
    soon as its batch ends (it only matches older impressions).

    ``how='left_outer'`` additionally emits unmatched impressions with
    NULL click columns — but only once the watermark PROVES no match
    can arrive, so outer results trail the watermark by design (Spark's
    documented outer stream-stream semantics). ``how='full_outer'``
    symmetrically also emits orphan clicks (a click with no qualifying
    impression — bot traffic, attribution-window misses) with NULL
    impression columns, under the same watermark-gated emission; both
    sides' state stays evictable because the band bounds each side's
    relevance window.
    """
    if how not in ("inner", "left_outer", "full_outer"):
        raise ValueError(f"how must be inner|left_outer|full_outer, got {how!r}")
    imp = impressions.withWatermark("imp_ts", watermark)
    clk = clicks.withWatermark("clk_ts", watermark)
    cond = F.expr(
        "ad_id = c_ad_id AND clk_ts >= imp_ts "
        f"AND clk_ts <= imp_ts + interval {within}"
    )
    return imp.join(clk, cond, how)
