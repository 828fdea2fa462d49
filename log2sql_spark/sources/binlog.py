"""Binlog text scan → CDC change-event envelope DataFrame.

Re-expresses the reference's offline pipeline (``mysqlbinlog
--base64-output=decode-rows -vv`` text → per-row change events;
reference: ``log2sql.py:66-108`` event segmentation, ``log2sql.py:17-58``
header/value parsing) as a Spark source operator. This is a clean-room
implementation working from the *behavior* of the reference and the
public mysqlbinlog ``-v/-vv`` output format:

* ``# at N`` header gives the event start position;
* ``#yymmdd hh:mm:ss server id .. end_log_pos M [CRC32 0x..] <type>``
  gives the event timestamp and stop position;
* row images follow as ``###``-prefixed pseudo-SQL:
  ``### INSERT INTO `db`.`tbl``` + ``### SET`` + ``###   @1=v`` lines,
  ``### UPDATE`` + ``### WHERE`` (before image) + ``### SET`` (after
  image), ``### DELETE FROM`` + ``### WHERE``;
* with ``-vv`` each value line carries a trailing ``/* type meta */``
  comment;
* DDL statements appear as plain SQL terminated by ``/*!*/;`` after a
  ``use `db`...`` preamble.

Scale design: one binlog *file* is inherently sequential (the parser is
a state machine over ordered lines), but files are independent — so the
unit of parallelism is the file. Lines are read with the distributed
text source, grouped per file (sorted by the per-file line index), and
parsed by an Arrow-batched ``applyInPandas``. A directory of N dump
files parses N-wide in parallel; no driver-side loop ever sees the data.

Divergences from the reference (deliberate, documented in SURVEY.md §7):

* values are split on the *first* ``=`` only, so ``=`` inside a value
  survives (reference truncates: ``log2sql.py:48``);
* the DDL path is reachable (reference's is dead code: ``--only-dml``
  defaults True at ``main.py:73-74``);
* UPDATE before/after images are delimited by the WHERE/SET section
  markers, not first/second column occurrence (``log2sql.py:50-54``),
  which also handles columns absent from one image (minimal row images).
"""

from __future__ import annotations

import re
from collections.abc import Iterator  # noqa: F401  (used in type comments)
from datetime import datetime

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

# Envelope schema: the engine-wide CDC row shape (Debezium-style).
# `before`/`after` are ordinal-keyed raw-token maps ("1" -> "'abc'")
# until resolve_columns() joins the catalog to name them.
ENVELOPE_SCHEMA = T.StructType(
    [
        T.StructField("file", T.StringType(), False),
        T.StructField("event_seq", T.LongType(), False),
        T.StructField("op", T.StringType(), False),
        T.StructField("db", T.StringType(), True),
        T.StructField("table", T.StringType(), True),
        T.StructField("start_pos", T.LongType(), True),
        T.StructField("stop_pos", T.LongType(), True),
        T.StructField("event_ts", T.TimestampType(), True),
        T.StructField("before", T.MapType(T.StringType(), T.StringType()), True),
        T.StructField("after", T.MapType(T.StringType(), T.StringType()), True),
        T.StructField("statement", T.StringType(), True),
        # GTID of the owning transaction (SET @@SESSION.GTID_NEXT
        # preamble; NULL for anonymous/GTID-less dumps) and the 0-based
        # per-file transaction ordinal (BEGIN..COMMIT grouping; NULL for
        # events outside any transaction). GTIDs make re-delivered dumps
        # exactly-once dedupable (operators/cdc_filters.dedup_by_gtid);
        # txn_seq makes the apply transaction-atomic.
        T.StructField("gtid", T.StringType(), True),
        T.StructField("txn_seq", T.LongType(), True),
    ]
)

# Chunk-local sentinels: a chunk that starts mid-file cannot know the
# GTID/transaction state left open by earlier chunks, so its pre-first-
# marker events carry these and the split assembly resolves them from
# the carried chunk state (same mechanism as the DDL `use` carry).
GTID_INHERIT = "\x00inherit"
TXN_INHERIT = -1

_AT_RE = re.compile(r"^# at (\d+)")
_HDR_RE = re.compile(
    r"^#(\d{6}\s+\d{1,2}:\d{2}:\d{2})\s+server id\s+\d+\s+end_log_pos\s+(\d+)"
)
_DML_RE = re.compile(
    r"^(INSERT INTO|UPDATE|DELETE FROM)\s+`?([^`.\s]+)`?\.`?([^`.\s]+)`?",
    re.IGNORECASE,
)
_VALUE_RE = re.compile(r"^@(\d+)=(.*)$", re.DOTALL)
# Match only the FINAL trailing comment — the body may contain neither
# '/*' nor '*/', so the leftmost regex match necessarily starts at the
# LAST comment opener. A plain greedy-left '\s/\*.*\*/' stripped from
# the first ' /*' inside a quoted value to the annotation's '*/'.
_TYPE_COMMENT_RE = re.compile(r"\s/\*(?:(?!\*/)(?!/\*).)*\*/\s*$", re.DOTALL)
_DDL_HEAD_RE = re.compile(r"^\s*(create|rename|alter|drop|truncate)\b", re.IGNORECASE)
# GTID preamble: SET @@SESSION.GTID_NEXT= 'uuid:seq' /*!*/;  ('AUTOMATIC'
# between transactions on servers without assigned GTIDs)
_GTID_RE = re.compile(r"SET\s+@@SESSION\.GTID_NEXT\s*=\s*'([^']*)'", re.IGNORECASE)

_OP_BY_VERB = {"insert into": "insert", "update": "update", "delete from": "delete"}


def _strip_type_comment(raw: str) -> str:
    """Drop the trailing ``/* TYPE meta=.. */`` annotation that -vv adds.

    The annotation always trails the value; only a value whose text
    itself contains ``*/`` can still confuse the match — values merely
    containing ``" /*"`` survive because the pattern rejects ``*/``
    inside the comment body.
    """
    # Fast paths (guide §1.2 per-task work — this runs once per
    # row-image value, the hottest call after the timestamp parse):
    # no comment opener at all, or the overwhelmingly common clean
    # shape "<value> /*comment*/" — a space-preceded final comment with
    # no nested openers/closers, where slicing equals the regex sub
    # (the opener is provably the regex's leftmost viable start: any
    # earlier start would contain it in the tempered body and fail).
    # Anything else falls back to the tempered regex.
    if "/*" not in raw:
        return raw.strip()
    end = raw.rstrip()
    i = end.rfind(" /*")
    if (
        i > 0
        and end.endswith("*/")
        and len(end) - 2 >= i + 3  # closer must not overlap the opener
        # window [-1): a token may straddle the body/closer boundary
        # (e.g. "/*" at len-3 using the closer's "*"); the regex's
        # per-char lookaheads reject those too
        and "*/" not in end[i + 3 : -1]
        and "/*" not in end[i + 3 : -1]
    ):
        return end[:i].strip()
    return _TYPE_COMMENT_RE.sub("", raw).strip()


def _parse_header_ts(s: str) -> datetime | None:
    """``yymmdd h:mm:ss`` → datetime, replicating
    ``datetime.strptime(s, "%y%m%d %H:%M:%S")`` (including its 69-pivot
    two-digit-year rule and ValueError → None on out-of-range fields)
    without strptime's ~20 us/call locale machinery — one call per
    binlog event, the single hottest line of the parse profile."""
    try:
        date_part, time_part = s.split()
        yy = int(date_part[:2])
        hh, mm, ss = time_part.split(":")
        return datetime(
            yy + (2000 if yy <= 68 else 1900),
            int(date_part[2:4]),
            int(date_part[4:6]),
            int(hh),
            int(mm),
            int(ss),
        )
    except ValueError:
        return None


def parse_binlog_lines(lines: list[str], file: str = "") -> list[dict]:
    """State machine: raw dump lines → envelope dicts (one per row image).

    Pure function over one file's ordered lines; the Spark operators
    below distribute it per file. Kept separate so unit tests can hit
    edge cases without a SparkSession.
    """
    events, _ = parse_binlog_lines_with_state(lines, file)
    # file start = nothing to inherit: resolve chunk sentinels to NULL
    for ev in events:
        if ev["gtid"] == GTID_INHERIT:
            ev["gtid"] = None
        if ev["txn_seq"] == TXN_INHERIT:
            ev["txn_seq"] = None
    return events


def parse_binlog_lines_with_state(
    lines: list[str], file: str = ""
) -> tuple[list[dict], dict]:
    """Like :func:`parse_binlog_lines` but also returns the parser state
    that outlives an event-group boundary, which the chunked reader must
    carry between chunks (a chunk that starts mid-file has not seen
    earlier ``use``/GTID/BEGIN statements):

    * ``use`` — last ``use`` database seen (or None);
    * ``gtid_end`` — GTID state at end of chunk: None when the chunk saw
      no GTID activity (carry through), ``""`` when the last activity
      closed the transaction (COMMIT), else the open GTID;
    * ``txn_end`` — None (no BEGIN/COMMIT seen), ``"open"``, ``"closed"``;
    * ``n_txns`` — BEGINs seen (prefix-sums into global txn ordinals).

    Events emitted before the chunk's first GTID/txn marker carry the
    :data:`GTID_INHERIT` / :data:`TXN_INHERIT` sentinels for the
    assembly (or :func:`parse_binlog_lines`) to resolve."""
    events: list[dict] = []
    start_pos: int | None = None
    stop_pos: int | None = None
    event_ts: datetime | None = None
    cur: dict | None = None  # row-image event being accumulated
    image: str | None = None  # which map @N= lines fill: 'before' | 'after'
    ddl: list[str] | None = None
    use_db: str | None = None
    gtid: str | None = None
    gtid_known = False  # saw any GTID_NEXT/COMMIT: gtid is authoritative
    txn_known = False  # saw any BEGIN/COMMIT: txn state is authoritative
    txn_open = False
    n_txns = 0

    def flush() -> None:
        nonlocal cur, image
        if cur is not None:
            events.append(cur)
        cur, image = None, None

    def _gtid_of_event():
        return gtid if gtid_known else GTID_INHERIT

    def _txn_of_event():
        if not txn_known:
            return TXN_INHERIT
        return n_txns - 1 if txn_open else None

    for raw in lines:
        line = raw.rstrip("\r\n")
        if not line.startswith("###"):
            # --- header / statement zone ---
            # Both header regexes require a leading '#': skip them for
            # statement lines (BEGIN/COMMIT/GTID/DDL) outright.
            if line.startswith("#"):
                m = _AT_RE.match(line)
                if m:
                    flush()
                    start_pos = int(m.group(1))
                    continue
                m = _HDR_RE.match(line)
                if m:
                    stop_pos = int(m.group(2))
                    event_ts = _parse_header_ts(m.group(1))
                    continue
            stripped = line.strip()
            if ddl is None:
                if stripped.lower().startswith("use "):
                    use_db = stripped.split("/*")[0].strip().rstrip(";")
                    use_db = re.sub(r"^use\s+", "", use_db, flags=re.IGNORECASE).strip("`")
                gm = _GTID_RE.search(stripped)
                if gm:
                    g = gm.group(1)
                    gtid = None if g.upper() == "AUTOMATIC" else g
                    gtid_known = True
                    continue
                if stripped == "BEGIN":
                    flush()
                    n_txns += 1
                    txn_open, txn_known = True, True
                    continue
                if stripped.startswith("COMMIT"):
                    flush()
                    # GTID_NEXT scopes one transaction: COMMIT closes both
                    txn_open, txn_known = False, True
                    gtid, gtid_known = None, True
                    continue
                if _DDL_HEAD_RE.match(stripped):
                    flush()
                    ddl = [stripped]
            elif stripped and not stripped.startswith("--"):
                ddl.append(stripped)
            if ddl is not None and stripped.endswith("/*!*/;"):
                stmt = "\n".join(ddl)
                stmt = stmt.replace("/*!*/;", ";")
                events.append(
                    {
                        "op": "ddl",
                        "db": use_db,
                        "table": None,
                        "start_pos": start_pos,
                        "stop_pos": stop_pos,
                        "event_ts": event_ts,
                        "before": None,
                        "after": None,
                        "statement": stmt,
                        "gtid": _gtid_of_event(),
                        "txn_seq": _txn_of_event(),
                    }
                )
                ddl = None
            continue

        # --- row-image zone: '### ...' pseudo-SQL ---
        body = line[3:].strip()
        # Value lines ('@N=...') are the most frequent ### shape (one
        # per column per row image); dispatch them before the DML regex
        # so they never pay it. A value line cannot match _DML_RE (it
        # anchors on INSERT/UPDATE/DELETE) and a non-@ line cannot match
        # _VALUE_RE, so the reorder changes no outcome; the original
        # `if cur is None: continue` guard is folded into the branch.
        if body.startswith("@"):
            if cur is not None and image is not None:
                m = _VALUE_RE.match(body)
                if m:
                    # Split on the FIRST '=' only (regex anchors the
                    # ordinal), so '=' inside values survives — unlike
                    # log2sql.py:48.
                    cur[image][m.group(1)] = _strip_type_comment(m.group(2))
            continue
        m = _DML_RE.match(body)
        if m:
            flush()
            op = _OP_BY_VERB[m.group(1).lower()]
            cur = {
                "op": op,
                "db": m.group(2),
                "table": m.group(3),
                "start_pos": start_pos,
                "stop_pos": stop_pos,
                "event_ts": event_ts,
                "before": {} if op in ("update", "delete") else None,
                "after": {} if op in ("update", "insert") else None,
                "statement": None,
                "gtid": _gtid_of_event(),
                "txn_seq": _txn_of_event(),
            }
            # INSERT's SET fills `after`; UPDATE starts in WHERE (`before`);
            # DELETE's WHERE fills `before`.
            image = "after" if op == "insert" else "before"
            continue
        if cur is None:
            continue
        upper = body.upper()
        if upper == "WHERE":
            image = "before"
            continue
        if upper == "SET":
            image = "after"
            continue

    flush()
    out = []
    for seq, ev in enumerate(events):
        ev["file"] = file
        ev["event_seq"] = seq
        out.append(ev)
    if not gtid_known:
        gtid_end = None
    else:
        gtid_end = gtid if gtid is not None else ""
    state = {
        "use": use_db,
        "gtid_end": gtid_end,
        "txn_end": None if not txn_known else ("open" if txn_open else "closed"),
        "n_txns": n_txns,
    }
    return out, state


def _parse_whole_files(batches) -> "Iterator[pd.DataFrame]":
    """mapInPandas worker over (file, whole-file value) rows."""
    cols = [f.name for f in ENVELOPE_SCHEMA.fields]
    for pdf in batches:
        out = []
        for file, content in zip(pdf["file"], pdf["value"]):
            # split('\n'), NOT splitlines(): splitlines() also breaks on
            # \x1c-\x1e/\x85/ , which can occur INSIDE quoted values
            # (found by the hypothesis round-trip test); the line-based
            # text source splits only on \n, so match that.
            out.extend(parse_binlog_lines(content.split("\n"), file=file))
        yield pd.DataFrame(out, columns=cols) if out else pd.DataFrame(columns=cols)


def read_binlog(spark: SparkSession, path: str | list[str]) -> DataFrame:
    """Batch source: binlog dump file(s)/glob → envelope DataFrame.

    Reads each dump with ``wholetext`` (one row per file, order trivially
    preserved) and parses via ``mapInPandas`` — NO shuffle: the plan is
    scan → Arrow-batched parse, one task per file. Parallelism = number
    of files (replacing the reference's single-threaded global loop at
    log2sql.py:75 with a per-file loop that scales out). A single dump
    file is bounded by binlog rotation size (≤1 GB), so whole-file
    strings are safe per task."""
    lines = spark.read.text(path, wholetext=True).select(
        F.input_file_name().alias("file"), "value"
    )
    return lines.mapInPandas(_parse_whole_files, schema=ENVELOPE_SCHEMA)


def read_binlog_batch_files(spark: SparkSession, batch_df: DataFrame) -> DataFrame:
    """foreachBatch front-end: envelope rows for a streaming micro-batch.

    The streaming text source is used only for file DISCOVERY and
    checkpoint bookkeeping; the batch's files are re-read with the
    wholetext batch path (``read_binlog``), where a file is one row and
    line order is trivially preserved. This replaces the round-1 shape
    (``monotonically_increasing_id`` sort inside the micro-batch), whose
    correctness depended on partition enumeration matching file offset
    order — fragile once a large file splits across partitions.

    The driver-side ``collect()`` is the distinct FILE NAME list of one
    micro-batch (bounded by ``maxFilesPerTrigger``), never row data.
    """
    files = sorted(r["file"] for r in batch_df.select("file").distinct().collect())
    if not files:
        return spark.createDataFrame([], ENVELOPE_SCHEMA)
    return read_binlog(spark, files)


# --- intra-file parallel parse (giant single dumps) ------------------------

_CHUNK_SCHEMA = T.StructType(
    list(ENVELOPE_SCHEMA.fields) + [T.StructField("chunk_id", T.IntegerType(), False)]
)
_CHUNK_META_OP = "_chunk_meta"


def _iter_chunk_lines(fh, start: int, end: int):
    """Yield the decoded lines of one ``# at``-aligned chunk.

    Split contract (Hadoop TextInputFormat, lifted to event granularity):
    a chunk OWNS every event whose ``# at`` boundary line starts at a
    byte offset in ``[start, end)``; it reads past ``end`` to finish a
    straddling event and discards its own leading partial event (owned
    by the previous chunk). Concatenating all chunks' lines therefore
    reproduces the file's line sequence exactly, aligned on event-group
    boundaries.
    """
    fh.seek(max(start - 1, 0))
    if start > 0:
        # Hadoop convention: discard the leading partial line — unless
        # `start` lands exactly on a line start (previous byte is \n),
        # in which case that line is ours (the previous chunk stopped
        # strictly before it).
        if fh.read(1) != b"\n":
            fh.readline()
        while True:  # skip forward to the first owned boundary
            pos = fh.tell()
            if pos >= end:
                return  # no boundary starts in this range: nothing owned
            line = fh.readline()
            if not line:
                return
            if line.startswith(b"# at "):
                yield line.decode("utf-8", "replace")
                break
    while True:
        pos = fh.tell()
        line = fh.readline()
        if not line:
            return
        if pos >= end and line.startswith(b"# at "):
            return  # next chunk's first owned event
        yield line.decode("utf-8", "replace")


def _parse_chunks(batches) -> "Iterator[pd.DataFrame]":
    """mapInPandas worker over (file, chunk_id, start, end) range rows.

    Every chunk — even an empty one — emits one ``_chunk_meta`` row
    (event_seq = its event count, statement = last ``use`` db), which
    the assembly stage prefix-sums into exact global sequence offsets
    and the DDL ``use`` carry-over."""
    cols = [f.name for f in _CHUNK_SCHEMA.fields]
    for pdf in batches:
        out = []
        for file, chunk_id, start, end in zip(
            pdf["file"], pdf["chunk_id"], pdf["start"], pdf["end"]
        ):
            local = file[7:] if file.startswith("file://") else file
            with open(local, "rb") as fh:
                lines = list(_iter_chunk_lines(fh, int(start), int(end)))
            events, state = parse_binlog_lines_with_state(lines, file=file)
            for ev in events:
                ev["chunk_id"] = int(chunk_id)
            out.extend(events)
            import json as _json

            out.append(
                {
                    "file": file,
                    "event_seq": len(events),
                    "op": _CHUNK_META_OP,
                    "db": None,
                    "table": None,
                    "start_pos": None,
                    "stop_pos": None,
                    "event_ts": None,
                    "before": None,
                    "after": None,
                    # chunk-end parser state (use/gtid/txn carry) as JSON
                    "statement": _json.dumps(state),
                    "gtid": None,
                    "txn_seq": None,
                    "chunk_id": int(chunk_id),
                }
            )
        yield pd.DataFrame(out, columns=cols) if out else pd.DataFrame(columns=cols)


def read_binlog_split(
    spark: SparkSession, path: str | list[str], chunk_bytes: int = 64 << 20
) -> DataFrame:
    """Intra-file parallel batch source: one giant binlog dump parses
    ``ceil(size / chunk_bytes)``-wide instead of serializing on one core
    (the whole-file path's limit — and the reference's, ``main.py:104``).

    Chunks are planned driver-side from file SIZES only (no data reads),
    parsed in parallel aligned on ``# at`` event boundaries (see
    :func:`_iter_chunk_lines`), then stitched exactly: per-chunk event
    counts prefix-sum into the same global ``event_seq`` the whole-file
    parse assigns, and the last ``use`` database of earlier chunks
    resolves pre-``use`` DDL events of later ones. The stitch state is
    one tiny meta row per chunk — a broadcast join, never a shuffle of
    event data; the parsed chunks are cached so meta and event branches
    share one parse pass.

    Executors open the file directly (shared/local filesystem or any
    fsspec-mountable store); output is byte-for-byte identical to
    :func:`read_binlog` (asserted in ``tests/test_binlog_split.py``).
    """
    import glob as _glob
    import os

    from pyspark.sql import Window as W
    from pyspark.storagelevel import StorageLevel

    paths = [path] if isinstance(path, str) else list(path)
    files: list[str] = []
    for p in paths:
        p = p[7:] if p.startswith("file://") else p
        if os.path.isdir(p):
            files.extend(sorted(_glob.glob(os.path.join(p, "*"))))
        else:
            files.extend(sorted(_glob.glob(p)) or [p])

    ranges = []
    for f in files:
        size = os.path.getsize(f)
        cid = 0
        for off in range(0, max(size, 1), chunk_bytes):
            ranges.append((f, cid, off, min(off + chunk_bytes, size)))
            cid += 1
    rdf = spark.createDataFrame(
        ranges, "file string, chunk_id int, start long, end long"
    ).repartition(len(ranges))

    parsed = rdf.mapInPandas(_parse_chunks, schema=_CHUNK_SCHEMA).persist(
        StorageLevel.MEMORY_AND_DISK
    )
    prior = (
        W.partitionBy("file").orderBy("chunk_id").rowsBetween(W.unboundedPreceding, -1)
    )
    offsets = (
        parsed.filter(F.col("op") == _CHUNK_META_OP)
        .select(
            "file",
            "chunk_id",
            F.col("event_seq").alias("n_events"),
            F.get_json_object("statement", "$.use").alias("last_use"),
            F.get_json_object("statement", "$.gtid_end").alias("gtid_end"),
            F.get_json_object("statement", "$.txn_end").alias("txn_end"),
            F.get_json_object("statement", "$.n_txns").cast("long").alias("n_txns"),
        )
        .withColumn("seq_offset", F.coalesce(F.sum("n_events").over(prior), F.lit(0)))
        .withColumn("carry_use", F.last("last_use", ignorenulls=True).over(prior))
        # GTID/txn state left open by earlier chunks: last chunk WITH
        # activity wins ('' / 'closed' mean explicitly cleared)
        .withColumn("carry_gtid", F.last("gtid_end", ignorenulls=True).over(prior))
        .withColumn("carry_txn", F.last("txn_end", ignorenulls=True).over(prior))
        .withColumn("txn_offset", F.coalesce(F.sum("n_txns").over(prior), F.lit(0)))
        .select(
            "file", "chunk_id", "seq_offset", "carry_use",
            "carry_gtid", "carry_txn", "txn_offset",
        )
    )
    return (
        parsed.filter(F.col("op") != _CHUNK_META_OP)
        .join(F.broadcast(offsets), ["file", "chunk_id"])
        .withColumn("event_seq", (F.col("event_seq") + F.col("seq_offset")).cast("long"))
        .withColumn(
            "db",
            F.when(
                (F.col("op") == "ddl") & F.col("db").isNull(), F.col("carry_use")
            ).otherwise(F.col("db")),
        )
        .withColumn(
            "gtid",
            F.when(
                F.col("gtid") == F.lit(GTID_INHERIT),
                F.nullif(F.col("carry_gtid"), F.lit("")),
            ).otherwise(F.col("gtid")),
        )
        .withColumn(
            "txn_seq",
            F.when(
                F.col("txn_seq") == F.lit(TXN_INHERIT),
                # inheriting events belong to the LAST txn opened by
                # earlier chunks, iff that txn is still open
                F.when(
                    F.col("carry_txn") == F.lit("open"),
                    F.col("txn_offset") - F.lit(1),
                ),
            )
            .otherwise(F.col("txn_seq") + F.col("txn_offset"))
            .cast("long"),
        )
        .select(*[f.name for f in ENVELOPE_SCHEMA.fields])
    )
