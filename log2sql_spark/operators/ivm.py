"""Incremental view maintenance (IVM): keep an aggregate materialized
view current by applying CDC deltas, never recomputing from base.

The capability a CDC feed exists to enable: at 100 TB the base table
cannot be re-aggregated per batch, but a sum/count MV is a group-wise
abelian monoid, so each change contributes a signed delta —

* insert  -> +after
* delete  -> -before
* update  -> -before +after

— and folding those into the old MV gives exactly the MV of the new
state (the classic delta rule for distributive aggregates). The apply
is one map-side-combined aggregate over the (small) change batch plus
one group-key join against the MV: cost scales with the BATCH, not the
base table. Non-distributive aggregates (min/max, distinct) need
retained auxiliary state and are out of scope here — use the snapshot
store + recompute for those.

Change-batch contract: ``op`` plus the after-image columns unprefixed
and the before-image columns prefixed ``before_`` (insert: after only,
delete: before only, update: both — NULL where an image is absent).
``sum_cols`` maps output aggregate name -> SOURCE COLUMN NAME, so the
same measure reads from either image.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def aggregate_mv(
    base: DataFrame, group_cols: list[str], sum_cols: dict[str, str]
) -> DataFrame:
    """Materialize the view: count(*) as n plus the given sums."""
    return base.groupBy(*group_cols).agg(
        F.count(F.lit(1)).alias("n"),
        *[F.sum(F.col(src)).alias(name) for name, src in sum_cols.items()],
    )


def delta_aggregate(
    changes: DataFrame,
    group_cols: list[str],
    sum_cols: dict[str, str],
    op_col: str = "op",
) -> DataFrame:
    """Signed per-group deltas from a CDC batch: one contribution row
    per row image, partial-aggregated — the output is |affected groups|
    rows however large the batch."""
    sign = F.when(F.col("_img") == "after", F.lit(1)).otherwise(F.lit(-1))

    after = (
        changes.filter(F.col(op_col).isin("insert", "update"))
        .select(
            *group_cols,
            *[F.col(src).alias(name) for name, src in sum_cols.items()],
        )
        .withColumn("_img", F.lit("after"))
    )
    before = (
        changes.filter(F.col(op_col).isin("delete", "update"))
        .select(
            *[F.col(f"before_{g}").alias(g) for g in group_cols],
            *[F.col(f"before_{src}").alias(name) for name, src in sum_cols.items()],
        )
        .withColumn("_img", F.lit("before"))
    )
    return (
        after.unionByName(before)
        .groupBy(*group_cols)
        .agg(
            F.sum(sign).alias("d_n"),
            *[F.sum(sign * F.col(name)).alias(f"d_{name}") for name in sum_cols],
        )
    )


def apply_delta(mv: DataFrame, delta: DataFrame, group_cols: list[str]) -> DataFrame:
    """Fold deltas into the view; groups whose count reaches 0 drop out
    (their sums are exactly 0 too, by the monoid argument)."""
    sum_names = [c for c in mv.columns if c not in group_cols]
    joined = mv.join(delta, group_cols, "full_outer")
    out = joined.select(
        *group_cols,
        *[
            (
                F.coalesce(F.col(n), F.lit(0)) + F.coalesce(F.col(f"d_{n}"), F.lit(0))
            ).alias(n)
            for n in sum_names
        ],
    )
    return out.filter(F.col("n") > 0)


def join_delta(
    a_old: DataFrame,
    da: DataFrame,
    b_old: DataFrame,
    db: DataFrame,
    on: list[str] | str,
) -> DataFrame:
    """Signed delta of ``a JOIN b`` when BOTH sides change.

    ``da``/``db`` are signed row deltas (column ``_sign``: +1 inserted,
    -1 deleted; an update contributes -before and +after). The bilinear
    delta rule over Z-relations (Griffin & Libkin, SIGMOD 1995; same
    algebra DBSP/Materialize incrementalize with):

        Δ(A ⋈ B) = ΔA ⋈ B_old  ∪  A_old ⋈ ΔB  ∪  ΔA ⋈ ΔB

    with sign PRODUCTS on the cross term — the term that makes a row
    changed on both sides (e.g. an order re-priced while its customer
    moved nation) count exactly once. Cost: two batch-vs-base joins
    (each prunable/broadcastable by the batch's keys) plus one
    batch-vs-batch join — never base-vs-base. Downstream, fold through
    the usual signed aggregate and the MV is exactly the MV of the new
    state."""
    keys = [on] if isinstance(on, str) else list(on)
    t1 = da.join(b_old, keys)
    t2 = a_old.join(db, keys)
    t3 = (
        da.withColumnRenamed("_sign", "_sign_a")
        .join(db.withColumnRenamed("_sign", "_sign_b"), keys)
        .withColumn("_sign", F.col("_sign_a") * F.col("_sign_b"))
        .drop("_sign_a", "_sign_b")
    )
    return t1.unionByName(t2).unionByName(t3)


def signed_aggregate(
    delta_rows: DataFrame, group_cols: list[str], sum_cols: dict[str, str]
) -> DataFrame:
    """Fold signed rows into per-group d_n / d_<name> deltas (the shape
    ``apply_delta`` consumes), map-side combined."""
    s = F.col("_sign")
    return delta_rows.groupBy(*group_cols).agg(
        F.sum(s).alias("d_n"),
        *[
            F.sum(s * F.col(src)).alias(f"d_{name}")
            for name, src in sum_cols.items()
        ],
    )


def minmax_mv(base: DataFrame, group_cols: list[str], val_col: str) -> DataFrame:
    """Materialize the MIN/MAX view: (groups, n, min_v, max_v)."""
    return base.groupBy(*group_cols).agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.min(val_col).alias("min_v"),
        F.max(val_col).alias("max_v"),
    )


def minmax_apply(
    mv: DataFrame,
    changes: DataFrame,
    base_new: DataFrame,
    group_cols: list[str],
    val_col: str,
    op_col: str = "op",
) -> DataFrame:
    """Maintain a per-group MIN/MAX MV under a CDC batch — the textbook
    NON-distributive case (``apply_delta``'s docstring scopes it out):
    a deleted maximum cannot be subtracted back out, because the MV
    holds no runner-up.

    The standard dirty-group refinement keeps the cost batch-shaped
    anyway: inserts only ever IMPROVE an extremum (min/max are monotone
    under insert, so ``least``/``greatest`` against the batch minimum /
    maximum folds them in exactly, like ``apply_delta`` folds sums), and
    a delete can only break an extremum it actually TOUCHES. So a group
    is *dirty* iff some deleted/update-before value equals-or-exceeds
    the group's current extremum (``<= min_v`` or ``>= max_v``); only
    dirty groups are recomputed, via a semi-join-pruned aggregate of the
    post-change base — at 100 TB that read is manifest/cluster-pruned by
    the dirty keys, and a batch whose deletes all land strictly inside
    (min, max) recomputes NOTHING. Groups the batch never touches pass
    through by anti-join, cost zero. An update contributes its before
    image to the delete side and its after image to the insert side
    (group-moving updates therefore dirty the old group and improve the
    new one). Emits ``recomputed`` so the path split is observable —
    and oracle-checkable.

    Change-batch contract matches ``delta_aggregate``: ``op`` plus
    after-image columns unprefixed, before-image columns ``before_``.
    """
    ins = changes.filter(F.col(op_col).isin("insert", "update")).select(
        *group_cols, F.col(val_col).alias("_v")
    )
    dels = changes.filter(F.col(op_col).isin("delete", "update")).select(
        *[F.col(f"before_{g}").alias(g) for g in group_cols],
        F.col(f"before_{val_col}").alias("_v"),
    )
    ins_agg = ins.groupBy(*group_cols).agg(
        F.count(F.lit(1)).cast("long").alias("i_n"),
        F.min("_v").alias("i_min"),
        F.max("_v").alias("i_max"),
    )
    del_agg = dels.groupBy(*group_cols).agg(
        F.count(F.lit(1)).cast("long").alias("x_n"),
        F.min("_v").alias("x_min"),
        F.max("_v").alias("x_max"),
    )
    touched = (
        mv.join(ins_agg, group_cols, "full_outer")
        .join(del_agg, group_cols, "full_outer")
        .withColumn(
            "new_n",
            F.coalesce("n", F.lit(0))
            + F.coalesce("i_n", F.lit(0))
            - F.coalesce("x_n", F.lit(0)),
        )
        .withColumn(
            "dirty",
            (F.col("x_min") <= F.col("min_v")) | (F.col("x_max") >= F.col("max_v")),
        )
        .filter(
            F.col("i_n").isNotNull() | F.col("x_n").isNotNull()
        )
    )
    clean = touched.filter(
        ~F.coalesce("dirty", F.lit(False)) & (F.col("new_n") > 0)
    ).select(
        *group_cols,
        F.col("new_n").alias("n"),
        F.least(F.col("min_v"), F.col("i_min")).alias("min_v"),
        F.greatest(F.col("max_v"), F.col("i_max")).alias("max_v"),
        F.lit(False).alias("recomputed"),
    )
    dirty_keys = touched.filter(F.coalesce("dirty", F.lit(False))).select(*group_cols)
    recomputed = (
        base_new.join(dirty_keys, group_cols, "left_semi")
        .groupBy(*group_cols)
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.min(val_col).alias("min_v"),
            F.max(val_col).alias("max_v"),
        )
        .withColumn("recomputed", F.lit(True))
    )
    untouched = mv.join(
        touched.select(*group_cols), group_cols, "left_anti"
    ).withColumn("recomputed", F.lit(False))
    return clean.unionByName(recomputed).unionByName(untouched)


def distinct_mv(
    base: DataFrame, group_cols: list[str], val_col: str
) -> tuple[DataFrame, DataFrame]:
    """Materialize a COUNT(DISTINCT val) view plus its support relation.

    DISTINCT is the other textbook non-distributive aggregate (with
    ``minmax_apply``'s MIN/MAX): a deleted value only lowers the count
    if it was the LAST occurrence, which the view alone cannot know.
    The classic fix is auxiliary state — the support relation
    ``(group, value, m)`` of per-value multiplicities, itself a plain
    sum-IVM (insert +1, delete −1) — so the view's delta per touched
    (group, value) is ``[m+d > 0] − [m > 0]``. At 100 TB the support
    lives in a snapshot store clustered on (group, value): each batch
    touches |batch| support rows via a pruned merge, never the table.
    """
    support = base.groupBy(*group_cols, val_col).agg(
        F.count(F.lit(1)).cast("long").alias("m")
    )
    view = support.groupBy(*group_cols).agg(
        F.count(F.lit(1)).cast("long").alias("n_distinct")
    )
    return view, support


def distinct_apply(
    view: DataFrame,
    support: DataFrame,
    changes: DataFrame,
    group_cols: list[str],
    val_col: str,
    op_col: str = "op",
) -> DataFrame:
    """Fold a CDC batch into a COUNT(DISTINCT) view using the support
    relation (see ``distinct_mv``). Change-batch contract matches
    ``delta_aggregate``: after images unprefixed, before images
    ``before_``-prefixed. Cost: one aggregate of the batch, one join
    against support ON THE TOUCHED KEYS ONLY, one |groups| join into
    the view — batch-shaped throughout."""
    ins = changes.filter(F.col(op_col).isin("insert", "update")).select(
        *group_cols, F.col(val_col).alias("_v"), F.lit(1).alias("_d")
    )
    dels = changes.filter(F.col(op_col).isin("delete", "update")).select(
        *[F.col(f"before_{g}").alias(g) for g in group_cols],
        F.col(f"before_{val_col}").alias("_v"),
        F.lit(-1).alias("_d"),
    )
    touched = (
        ins.unionByName(dels)
        .groupBy(*group_cols, "_v")
        .agg(F.sum("_d").cast("long").alias("d"))
        .filter(F.col("d") != 0)
    )
    sup = support.select(
        *group_cols, F.col(val_col).alias("_v"), F.col("m")
    )
    g_delta = (
        touched.join(sup, [*group_cols, "_v"], "left")
        .select(
            *group_cols,
            (
                ((F.coalesce(F.col("m"), F.lit(0)) + F.col("d")) > 0).cast("int")
                - (F.coalesce(F.col("m"), F.lit(0)) > 0).cast("int")
            ).alias("dd"),
        )
        .groupBy(*group_cols)
        .agg(F.sum("dd").cast("long").alias("d_distinct"))
    )
    return (
        view.join(g_delta, group_cols, "full_outer")
        .select(
            *group_cols,
            (
                F.coalesce(F.col("n_distinct"), F.lit(0))
                + F.coalesce(F.col("d_distinct"), F.lit(0))
            ).alias("n_distinct"),
        )
        .filter(F.col("n_distinct") > 0)
    )
