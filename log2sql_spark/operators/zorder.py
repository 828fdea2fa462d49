"""Z-order (Morton-curve) multi-dimensional clustering.

Single-column range clustering (``compact_parquet(sort_by=[k])``,
``SnapshotStore(cluster_by=k)``) makes file-level min/max stats
selective on ONE key; a predicate on any other column still scans
every file. Z-ordering interleaves the bits of several rank-normalized
dimensions into one sort key, so files end up compact in EVERY
clustered dimension at once — the same data-layout trick Delta's
``OPTIMIZE ZORDER BY`` uses for multi-dimensional file skipping.

Everything is JVM expressions: the per-dimension min/max comes from one
aggregate (two scalar rows collected), normalization and the bit
interleave are a single SQL ``aggregate`` lambda over a 16-step
sequence, and the layout itself is ``repartitionByRange`` on the
z-value + a within-partition sort. At 100 TB this is one extra shuffle
during the (already shuffle-bound) compaction rewrite — read-side cost
is zero and every query with a predicate on any z-dimension skips
files via ordinary parquet row-group stats.

Reference analog: none (the reference has no storage layer); this is
table-maintenance extension surface alongside sources/compaction.py.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_Z_BITS = 16  # per-dimension resolution; D dims -> 16*D-bit z-values


def zorder_key(df: DataFrame, cols: list[str], bits: int = _Z_BITS) -> Column:
    """Morton z-value over ``cols``, each min/max-normalized to
    ``bits`` bits. One aggregate computes the global bounds (the only
    driver round-trip, 2×|cols| scalars); the interleave is a pure SQL
    lambda, so the key evaluates inside whole-stage codegen."""
    if not cols or len(cols) > 4:
        raise ValueError("zorder_key takes 1-4 columns")
    # Keep the highest interleaved bit position (bits*D - 1) below the
    # bigint sign bit: at 4 dims x 16 bits the top bit would land on
    # bit 63 and signed ordering would swap the two halves of the
    # Morton curve (pruning stays correct — per-file stats — but
    # clustering quality silently degrades). 63 // D bits per dim keeps
    # z-values non-negative at every supported arity.
    bits = min(bits, 63 // len(cols))
    bounds = df.agg(
        *[F.min(c).cast("double").alias(f"min_{c}") for c in cols],
        *[F.max(c).cast("double").alias(f"max_{c}") for c in cols],
    ).collect()[0]
    top = (1 << bits) - 1
    norms = []
    for c in cols:
        lo, hi = bounds[f"min_{c}"], bounds[f"max_{c}"]
        if lo is None or hi is None or hi <= lo:
            norms.append("0L")
            continue
        # clamp() then scale: NULLs sort first via coalesce to 0.
        norms.append(
            f"cast(coalesce((cast(`{c}` as double) - {lo!r}) / {hi - lo!r}, 0)"
            f" * {top} as bigint)"
        )
    d = len(cols)
    parts = " | ".join(
        f"shiftleft(shiftright({n}, i) & 1L, i * {d} + {j})"
        for j, n in enumerate(norms)
    )
    return F.expr(
        f"aggregate(sequence(0, {bits - 1}), 0L, (acc, i) -> acc | ({parts}))"
    )


def zorder_parquet(
    spark, path: str, cols: list[str], target_file_mb: int = 128, bits: int = _Z_BITS
) -> int:
    """Rewrite ``path`` z-ordered by ``cols`` (multi-dim twin of
    ``compact_parquet(sort_by=...)``). Returns the new file count."""
    import os
    import shutil

    from log2sql_spark.sources.compaction import dir_bytes

    df = spark.read.parquet(path)
    n_files = max(1, -(-dir_bytes(path) // (target_file_mb * 1024 * 1024)))
    z = zorder_key(df, cols, bits=bits)
    out = (
        df.withColumn("_z", z)
        .repartitionByRange(n_files, "_z")
        .sortWithinPartitions("_z")
        .drop("_z")
    )
    tmp = path.rstrip("/") + ".zorder.tmp"
    out.write.mode("overwrite").parquet(tmp)
    # Swap via rename-aside so a crash never leaves the canonical path
    # empty: old data survives at .zorder.old until the new layout is
    # in place. (Still a two-rename window for concurrent readers —
    # single-writer offline maintenance, like vacuum; the snapshot
    # store's manifest protocol is the concurrent-safe path.)
    old = path.rstrip("/") + ".zorder.old"
    shutil.rmtree(old, ignore_errors=True)
    os.rename(path, old)
    os.rename(tmp, path)
    shutil.rmtree(old, ignore_errors=True)
    return len(
        [f for f in os.listdir(path) if f.endswith(".parquet") and not f.startswith(".")]
    )


def hilbert_key(df: DataFrame, cols: list[str], bits: int = _Z_BITS) -> Column:
    """Hilbert-curve value over exactly TWO min/max-normalized
    dimensions — the locality-preserving alternative to the Morton
    z-value above (Databricks' liquid clustering moved from Z-order to
    Hilbert for the same reason): the Hilbert curve never takes the
    long diagonal jumps Morton takes between quadrant boundaries, so
    consecutive key ranges are compact SQUARES instead of L-shaped
    runs, and a 2-D box predicate overlaps fewer files at equal file
    count (tests/test_hilbert.py measures the win on a uniform grid).

    Same execution shape as :func:`zorder_key`: one bounds aggregate
    (the only driver round-trip), then a pure SQL ``aggregate`` lambda
    over bit positions high->low carrying a (d, x, y) struct through
    the classic rotate-and-accumulate transform — evaluates inside
    whole-stage codegen, no Python in the hot path."""
    if len(cols) != 2:
        raise ValueError("hilbert_key takes exactly 2 columns")
    bits = min(bits, 31)  # d fits in 2*bits bits; keep well under 63
    bounds = df.agg(
        *[F.min(c).cast("double").alias(f"min_{c}") for c in cols],
        *[F.max(c).cast("double").alias(f"max_{c}") for c in cols],
    ).collect()[0]
    top = (1 << bits) - 1
    norms = []
    for c in cols:
        lo, hi = bounds[f"min_{c}"], bounds[f"max_{c}"]
        if lo is None or hi is None or hi <= lo:
            norms.append("0L")
            continue
        norms.append(
            f"cast(coalesce((cast(`{c}` as double) - {lo!r}) / {hi - lo!r}, 0)"
            f" * {top} as bigint)"
        )
    # classic (x, y) -> d transform, bit by bit from the top:
    #   rx = bit i of x;  ry = bit i of y
    #   d += s^2 * ((3*rx) XOR ry)          with s = 2^i
    #   rotate the lower quadrant: if ry=0 { if rx=1 reflect; swap x,y }
    step = (
        "(st, i) -> "
        "named_struct("
        "  'd', st.d + shiftleft(1L, 2*i) * "
        "       cast((3 * ((shiftright(st.x, i) & 1L))) ^ (shiftright(st.y, i) & 1L) as bigint),"
        "  'x', case when (shiftright(st.y, i) & 1L) = 0 then"
        "         case when (shiftright(st.x, i) & 1L) = 1"
        "              then shiftleft(1L, i) - 1 - (st.y % shiftleft(1L, i))"
        "              else st.y % shiftleft(1L, i) end"
        "       else st.x % shiftleft(1L, i) end,"
        "  'y', case when (shiftright(st.y, i) & 1L) = 0 then"
        "         case when (shiftright(st.x, i) & 1L) = 1"
        "              then shiftleft(1L, i) - 1 - (st.x % shiftleft(1L, i))"
        "              else st.x % shiftleft(1L, i) end"
        "       else st.y % shiftleft(1L, i) end"
        ")"
    )
    return F.expr(
        f"aggregate(sequence({bits - 1}, 0, -1), "
        f"named_struct('d', 0L, 'x', {norms[0]}, 'y', {norms[1]}), "
        f"{step}).d"
    )


def hilbert_parquet(
    spark, path: str, cols: list[str], target_file_mb: int = 128, bits: int = _Z_BITS
) -> int:
    """Rewrite ``path`` Hilbert-clustered on two columns (drop-in twin
    of :func:`zorder_parquet` with the better box locality)."""
    import os
    import shutil

    from log2sql_spark.sources.compaction import dir_bytes

    df = spark.read.parquet(path)
    n_files = max(1, -(-dir_bytes(path) // (target_file_mb * 1024 * 1024)))
    h = hilbert_key(df, cols, bits=bits)
    out = (
        df.withColumn("_h", h)
        .repartitionByRange(n_files, "_h")
        .sortWithinPartitions("_h")
        .drop("_h")
    )
    tmp = path.rstrip("/") + ".hilbert.tmp"
    out.write.mode("overwrite").parquet(tmp)
    old = path.rstrip("/") + ".hilbert.old"
    shutil.rmtree(old, ignore_errors=True)
    os.rename(path, old)
    os.rename(tmp, path)
    shutil.rmtree(old, ignore_errors=True)
    return len(
        [f for f in os.listdir(path) if f.endswith(".parquet") and not f.startswith(".")]
    )
