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
    ]
)

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

_OP_BY_VERB = {"insert into": "insert", "update": "update", "delete from": "delete"}


def _strip_type_comment(raw: str) -> str:
    """Drop the trailing ``/* TYPE meta=.. */`` annotation that -vv adds.

    The annotation always trails the value; only a value whose text
    itself contains ``*/`` can still confuse the match — values merely
    containing ``" /*"`` survive because the pattern rejects ``*/``
    inside the comment body.
    """
    return _TYPE_COMMENT_RE.sub("", raw).strip()


def parse_binlog_lines(lines: list[str], file: str = "") -> list[dict]:
    """State machine: raw dump lines → envelope dicts (one per row image).

    Pure function over one file's ordered lines; the Spark operators
    below distribute it per file. Kept separate so unit tests can hit
    edge cases without a SparkSession.
    """
    events: list[dict] = []
    start_pos: int | None = None
    stop_pos: int | None = None
    event_ts: datetime | None = None
    cur: dict | None = None  # row-image event being accumulated
    image: str | None = None  # which map @N= lines fill: 'before' | 'after'
    ddl: list[str] | None = None
    use_db: str | None = None

    def flush() -> None:
        nonlocal cur, image
        if cur is not None:
            events.append(cur)
        cur, image = None, None

    for raw in lines:
        line = raw.rstrip("\r\n")
        if not line.startswith("###"):
            # --- header / statement zone ---
            m = _AT_RE.match(line)
            if m:
                flush()
                start_pos = int(m.group(1))
                continue
            m = _HDR_RE.match(line)
            if m:
                stop_pos = int(m.group(2))
                try:
                    event_ts = datetime.strptime(m.group(1), "%y%m%d %H:%M:%S")
                except ValueError:
                    event_ts = None
                continue
            stripped = line.strip()
            if ddl is None:
                if stripped.lower().startswith("use "):
                    use_db = stripped.split("/*")[0].strip().rstrip(";")
                    use_db = re.sub(r"^use\s+", "", use_db, flags=re.IGNORECASE).strip("`")
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
                    }
                )
                ddl = None
            continue

        # --- row-image zone: '### ...' pseudo-SQL ---
        body = line[3:].strip()
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
        m = _VALUE_RE.match(body)
        if m and image is not None:
            # Split on the FIRST '=' only (regex anchors the ordinal), so
            # '=' inside values survives — unlike log2sql.py:48.
            cur[image][m.group(1)] = _strip_type_comment(m.group(2))

    flush()
    out = []
    for seq, ev in enumerate(events):
        ev["file"] = file
        ev["event_seq"] = seq
        out.append(ev)
    return out


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
