"""Typed source readers (SURVEY.md §2 B.1).

The reference's only source is a line-oriented task file on S3 —
``"<operation>\\t<pdfURL>"`` per line (Manager.java:269-284,
Workers.java:230-239). Here every ingest path lands in a DataFrame with
an explicit schema; the line format becomes a two-column parse that
Catalyst fuses into the scan.

All readers accept a path glob and scale by splitting files across
partitions (``spark.sql.files.maxPartitionBytes``); none of them
collect anything to the driver.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

# Schema of the reference's task line after parsing (ref A3).
TASK_SCHEMA = T.StructType(
    [
        T.StructField("operation", T.StringType()),
        T.StructField("url", T.StringType()),
    ]
)


def read_task_lines(spark: SparkSession, path: str) -> DataFrame:
    """Read a reference-format task file: one ``operation\\turl`` line per
    record (Workers.java:230-239). Malformed lines (no tab) surface with
    a null url rather than being dropped — in-band error discipline."""
    lines = spark.read.text(path)
    parts = F.split(F.col("value"), "\t", 2)
    return lines.select(
        parts.getItem(0).alias("operation"),
        F.when(F.size(parts) > 1, parts.getItem(1)).alias("url"),
    )


def read_csv(
    spark: SparkSession, path: str, schema: T.StructType | str | None = None
) -> DataFrame:
    """CSV with explicit schema (schema inference is a full extra pass —
    never at 100 TB). PERMISSIVE mode keeps malformed rows as data."""
    reader = spark.read.option("header", "true").option("mode", "PERMISSIVE")
    if schema is not None:
        reader = reader.schema(schema)
    else:
        reader = reader.option("inferSchema", "true")  # test-scale only
    return reader.csv(path)


def read_json(
    spark: SparkSession, path: str, schema: T.StructType | str | None = None
) -> DataFrame:
    """JSON-lines with explicit schema; corrupt records land in
    ``_corrupt_record`` (in-band error channel, ref A7)."""
    reader = spark.read.option("mode", "PERMISSIVE").option(
        "columnNameOfCorruptRecord", "_corrupt_record"
    )
    if schema is not None:
        reader = reader.schema(schema)
    return reader.json(path)


def read_binary(spark: SparkSession, path: str, glob: str | None = None) -> DataFrame:
    """Binary-file source → (path, modificationTime, length, content)
    with ``content: binary`` — the multimodal payload column (ref A6's
    PDF bytes, SURVEY.md §1.2). Column pruning matters here: plans that
    don't touch ``content`` never read the bytes."""
    reader = spark.read.format("binaryFile")
    if glob:
        reader = reader.option("pathGlobFilter", glob)
    return reader.load(path)


def read_orc(
    spark: SparkSession, path: str, schema: T.StructType | str | None = None
) -> DataFrame:
    """ORC source — the other mainstream columnar format (Hive-lineage
    warehouses hand data over as ORC as often as parquet). Spark's
    native vectorized ORC reader gives the same scan contract as
    parquet: predicate pushdown into stripe/row-group indexes, column
    pruning, split-by-stripe parallelism. An explicit schema skips the
    footer-sampling pass."""
    reader = spark.read
    if schema is not None:
        reader = reader.schema(schema)
    return reader.orc(path)


def write_orc(df: DataFrame, path: str, *, compression: str = "zstd") -> None:
    """ORC sink, zstd by default (matches the parquet sink's codec
    choice: best scan-speed/size trade for cold data)."""
    df.write.mode("overwrite").option("compression", compression).orc(path)


FETCHED_SCHEMA = (
    "url string, content binary, byte_len bigint, status string, error string"
)


def fetch_url_bytes(
    df: DataFrame,
    url_col: str = "url",
    *,
    timeout_sec: float = 10.0,
    max_bytes: int = 64 << 20,
) -> DataFrame:
    """Fetch each row's payload from its URL column — the reference's
    per-record HTTP pull (Workers.java:127-129), as a distributed map.

    Arrow-batched ``mapInPandas``: every executor fetches its own
    partition's URLs (the driver never sees a payload), failures are
    in-band status='error' rows (ref A7 — a dead link is data, not a
    task failure), and payloads above ``max_bytes`` are rejected rather
    than buffered (bounded executor memory; at 100 TB one unbounded
    response would OOM a slot). Supports any scheme ``urllib`` handles
    (http/https/file — tests use file:// to stay hermetic)."""

    def batches(it):
        from urllib.request import urlopen

        for pdf in it:
            out = {k: [] for k in ("url", "content", "byte_len", "status", "error")}
            for url in pdf["url"]:
                out["url"].append(url)
                try:
                    if url is None:
                        raise ValueError("null url")
                    with urlopen(url, timeout=timeout_sec) as resp:
                        raw = resp.read(max_bytes + 1)
                    if len(raw) > max_bytes:
                        raise ValueError(f"payload exceeds max_bytes={max_bytes}")
                    out["content"].append(raw)
                    out["byte_len"].append(len(raw))
                    out["status"].append("ok")
                    out["error"].append(None)
                except Exception as ex:  # noqa: BLE001 — error channel is data
                    out["content"].append(None)
                    out["byte_len"].append(None)
                    out["status"].append("error")
                    out["error"].append(f"{type(ex).__name__}: {ex}")
            import pandas as pd

            yield pd.DataFrame(out)

    return df.select(F.col(url_col).alias("url")).mapInPandas(
        batches, schema=FETCHED_SCHEMA
    )


def write_report(df: DataFrame, path: str, *, title: str = "results") -> None:
    """Report sink (ref A12, LocalApp.java:302-343): the *data* write
    stays distributed (parquet); only the already-tiny summary is
    rendered to one HTML file. Never call on an unaggregated frame."""
    df.write.mode("overwrite").parquet(path + ".parquet")
    rows = df.limit(10_000).collect()  # guarded: summaries only
    cells = "\n".join(
        "<tr>" + "".join(f"<td>{v}</td>" for v in row) + "</tr>" for row in rows
    )
    header = "<tr>" + "".join(f"<th>{c}</th>" for c in df.columns) + "</tr>"
    html = (
        f"<html><head><title>{title}</title></head><body>"
        f"<h1>{title}</h1><table>{header}{cells}</table></body></html>"
    )
    with open(path + ".html", "w", encoding="utf-8") as f:
        f.write(html)
