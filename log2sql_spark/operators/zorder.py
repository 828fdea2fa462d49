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


def _norm_exprs(df: DataFrame, cols: list[str], bits: int) -> list[str]:
    """Per-dimension min/max rank normalization to ``bits`` bits, as
    SQL expression strings. ONE aggregate computes the global bounds
    (the only driver round-trip, 2x|cols| scalars); NULLs coalesce to
    0 so they sort first. Shared by the Morton and Hilbert keys — the
    curves differ only in how the normalized integers combine."""
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
    return norms


def hilbert_index_py(coords: list[int], bits: int) -> int:
    """Pure-Python N-dim Hilbert index (Skilling, "Programming the
    Hilbert curve", AIP 2004): AxesToTranspose then bit interleave.
    The executable specification the SQL expression in
    :func:`hilbert_key_nd` is property-tested against — and the proof
    it IS a Hilbert curve lives in tests/test_hilbert.py (bijective
    over the full grid, consecutive indices differ in exactly one
    coordinate by exactly 1)."""
    X = list(coords)
    n = len(X)
    Q = 1 << (bits - 1)
    while Q > 1:  # inverse undo
        P = Q - 1
        for i in range(n):
            if X[i] & Q:
                X[0] ^= P
            else:
                t = (X[0] ^ X[i]) & P
                X[0] ^= t
                X[i] ^= t
        Q >>= 1
    for i in range(1, n):  # Gray encode
        X[i] ^= X[i - 1]
    t = 0
    Q = 1 << (bits - 1)
    while Q > 1:
        if X[n - 1] & Q:
            t ^= Q - 1
        Q >>= 1
    for i in range(n):
        X[i] ^= t
    h = 0
    for b in range(bits - 1, -1, -1):  # transpose -> index
        for i in range(n):
            h = (h << 1) | ((X[i] >> b) & 1)
    return h


def hilbert_key_nd(df: DataFrame, cols: list[str], bits: int = _Z_BITS) -> Column:
    """Hilbert-curve value over 2-4 min/max-normalized dimensions —
    the N-dim generalization of :func:`hilbert_key` (which keeps the
    classic 2-D xy2d transform its committed query fingerprints pin).
    Skilling's transform, entirely as SQL higher-order functions so
    the key evaluates JVM-side with no Python in the hot path:

    * inverse-undo — ONE ``aggregate`` over the flattened (bit, dim)
      step sequence carrying the coordinate array; each step is a
      conditional reflect/swap ``transform`` of the n-array (n*(bits-1)
      steps, n <= 4, bits <= 31 -> bounded work per row);
    * Gray encode + the final correction both fold out of a SECOND
      single-pass ``aggregate`` (prefix-xor array + its total);
    * the transpose interleave is an ``aggregate`` over ``zip_with``
      of (value, dim-index) structs — every stage references its
      input ONCE, keeping the generated expression tree linear in
      n*bits rather than exponential.

    Like the Morton key this is write-path-only cost: one extra
    column during the (already shuffle-bound) clustered write;
    read-side pruning comes from per-file min/max stats per dimension,
    which never depend on the curve. The Hilbert curve's no-diagonal-
    jump property just makes each file's per-dimension spans tighter
    at equal file count (measured vs Z-order in tests/test_hilbert.py
    at 2-D and 3-D)."""
    n = len(cols)
    if n < 2 or n > 4:
        raise ValueError("hilbert_key_nd takes 2-4 columns")
    # n*bits interleaved bits must stay under the bigint sign bit
    bits = max(2, min(bits, 62 // n, 31))
    norms = _norm_exprs(df, cols, bits)
    st0 = f"array({', '.join(norms)})"
    total = (bits - 1) * n
    xi = f"element_at(st, (s % {n}) + 1)"
    x0 = "element_at(st, 1)"
    q = f"shiftleft(1L, {bits - 1} - (s div {n}))"
    p = f"({q} - 1)"
    undo = (
        f"aggregate(sequence(0, {total - 1}), {st0}, (st, s) -> "
        f"transform(st, (v, j) -> CASE WHEN ({xi} & {q}) != 0 "
        f"THEN (CASE WHEN j = 0 THEN v ^ {p} ELSE v END) "
        f"ELSE (CASE WHEN j = 0 OR j = (s % {n}) "
        f"THEN v ^ (({x0} ^ {xi}) & {p}) ELSE v END) END))"
    )
    # one pass over the undone array: o = running prefix-xor (the Gray
    # encode), p = its total (== the Gray-encoded LAST element, which
    # drives the final correction t). The FINISH lambda applies t to
    # every element — t's inputs arrive as the bound accumulator
    # variable, so the undo aggregate is evaluated exactly once per row
    # (inlining it into a downstream lambda would re-run it per bit).
    t_of_p = (
        f"aggregate(sequence({bits - 1}, 1, -1), 0L, (acc2, qb) -> "
        f"CASE WHEN (acc.p & shiftleft(1L, qb)) != 0 "
        f"THEN acc2 ^ (shiftleft(1L, qb) - 1) ELSE acc2 END)"
    )
    final_arr = (
        f"aggregate({undo}, named_struct('p', 0L, 'o', array_repeat(0L, 0)), "
        f"(acc, x) -> named_struct('p', acc.p ^ x, "
        f"'o', array_append(acc.o, acc.p ^ x)), "
        f"acc -> transform(acc.o, v -> v ^ {t_of_p}))"
    )
    interleave = (
        f"aggregate(zip_with({final_arr}, sequence(0, {n - 1}), "
        f"(x, i) -> named_struct('x', x, 'i', i)), 0L, "
        f"(acc3, e) -> acc3 | aggregate(sequence(0, {bits - 1}), 0L, "
        f"(a2, b) -> a2 | shiftleft(shiftright(e.x, b) & 1L, "
        f"b * {n} + ({n - 1} - e.i))))"
    )
    return F.expr(interleave)


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
    norms = _norm_exprs(df, cols, bits)
    d = len(cols)
    parts = " | ".join(
        f"shiftleft(shiftright({n}, i) & 1L, i * {d} + {j})"
        for j, n in enumerate(norms)
    )
    return F.expr(
        f"aggregate(sequence(0, {bits - 1}), 0L, (acc, i) -> acc | ({parts}))"
    )


def _swap_in(path: str, tmp: str, suffix: str) -> None:
    """Two-rename directory swap with automatic recovery. POSIX cannot
    atomically exchange two directories, so there is an instant where
    ``path`` is absent; this helper (a) rolls back in-process if the
    second rename throws, and (b) repairs a CRASH between the renames
    on the next invocation (``_recover_swap``), so the dataset is never
    lost — at worst unreadable until the next maintenance run. The
    mid-swap window for CONCURRENT readers remains: these rewrites are
    single-writer offline maintenance, like vacuum; the snapshot
    store's manifest protocol is the concurrent-safe path."""
    import os
    import shutil

    old = path.rstrip("/") + suffix + ".old"
    shutil.rmtree(old, ignore_errors=True)
    os.rename(path, old)
    try:
        os.rename(tmp, path)
    except BaseException:
        os.rename(old, path)  # roll back: the dataset stays readable
        shutil.rmtree(tmp, ignore_errors=True)  # reclaim the orphaned rewrite
        raise
    shutil.rmtree(old, ignore_errors=True)


def _recover_swap(path: str, suffix: str) -> None:
    """If a prior run died between the two swap renames, ``path`` is
    missing and the pre-rewrite data sits at ``<path><suffix>.old`` —
    restore it before proceeding. A leftover ``<path><suffix>.tmp``
    from the aborted rewrite is reclaimed too (the rewrite will be
    redone from scratch)."""
    import os
    import shutil

    old = path.rstrip("/") + suffix + ".old"
    if not os.path.exists(path) and os.path.isdir(old):
        os.rename(old, path)
        shutil.rmtree(path.rstrip("/") + suffix + ".tmp", ignore_errors=True)


def zorder_parquet(
    spark, path: str, cols: list[str], target_file_mb: int = 128, bits: int = _Z_BITS
) -> int:
    """Rewrite ``path`` z-ordered by ``cols`` (multi-dim twin of
    ``compact_parquet(sort_by=...)``). Returns the new file count."""
    import os

    from log2sql_spark.sources.compaction import dir_bytes

    _recover_swap(path, ".zorder")
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
    _swap_in(path, tmp, ".zorder")
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
    norms = _norm_exprs(df, cols, bits)
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

    from log2sql_spark.sources.compaction import dir_bytes

    _recover_swap(path, ".hilbert")
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
    _swap_in(path, tmp, ".hilbert")
    return len(
        [f for f in os.listdir(path) if f.endswith(".parquet") and not f.startswith(".")]
    )
