"""Log-file source, batch + streaming (S10/S11/S12, T9 — SURVEY.md §2.1).

The reference tails ``logs/RSBSAetl.log`` over SSE (``index.js:278-312``)
and serves the last 100 parsed lines over HTTP (``index.js:208-253``),
parsing ``[ts] message`` with the regex ``^\\[(.*?)\\]``. Here: batch =
``spark.read.text``; streaming = ``spark.readStream.text`` with the same
parse — the sink (console/memory/foreachBatch) is the SSE analog.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

TS_RE = r"^\[(.*?)\]"


def parse_log_lines(lines: DataFrame, value_col: str = "value") -> DataFrame:
    """T9: blank-line filter (P8) + timestamp/message split; lines with no
    [ts] prefix fall back to NULL ts and the whole line as message
    (index.js:230-234 uses 'now' — NULL keeps the op deterministic; the
    caller may coalesce to current_timestamp for exact parity)."""
    v = F.col(value_col)
    ts = F.regexp_extract(v, TS_RE, 1)
    return (
        lines.filter(F.length(F.trim(v)) > 0)
        .select(
            F.when(ts != "", ts).otherwise(F.lit(None)).alias("ts_str"),
            F.trim(F.regexp_replace(v, TS_RE, "")).alias("message"),
        )
    )


def read_log_batch(spark: SparkSession, path: str) -> DataFrame:
    return parse_log_lines(spark.read.text(path))


def tail_last(parsed: DataFrame, n: int = 100) -> DataFrame:
    """A7/O3: last-n lines, newest first (index.js:237)."""
    return parsed.orderBy(F.col("ts_str").desc_nulls_last()).limit(n)


def read_log_stream(spark: SparkSession, path_dir: str) -> DataFrame:
    """S11: live tail as a text file stream (append-only directory)."""
    return parse_log_lines(spark.readStream.text(path_dir))


def truncate_log(spark: SparkSession, path: str) -> None:
    """S12: log truncate — overwrite with an empty text frame."""
    spark.createDataFrame([], "value string").write.mode("overwrite").text(path)
