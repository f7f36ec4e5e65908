"""File-format sources -> chunks (S1-S5/S7 of SURVEY.md §2.1).

The reference ingests uploaded documents per extension
(services/crud/chunks.py:531-559 dispatch; csv/json object chunks :324-369,
pdf/txt unstructured chunks :430-470; S3 fetch services/crud/document.py:
243-267). Here every format lands on the SAME two chunk shapes the engine
already processes:

  * string chunks  (content, start, end)        <- txt / html / binary text
  * object chunks  (content_obj: map<str,str>)  <- csv / json rows

Storage fetch is the table format's job (binaryFile/parquet readers), not a
status machine. PDF decode prefers pypdf when installed and otherwise uses
the bundled minimal extractor (``pdfmini`` — FlateDecode + literal-string
text operators; honest limits documented there).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.chunking import pages_to_chunks, rows_to_object_chunks


def read_csv_chunks(spark: SparkSession, path: str,
                    url_col: str | None = None) -> DataFrame:
    """S3: CSV rows -> object chunks (one map<string,string> per row; cells
    stringified = the reference's validate_and_convert sanitation)."""
    df = spark.read.option("header", True).csv(path)
    if url_col is None:
        df = df.withColumn(
            "_src", F.concat(F.lit(path + "#row-"),
                             F.monotonically_increasing_id().cast("string")))
        url_col = "_src"
    return rows_to_object_chunks(df, url_col=url_col)


def read_json_chunks(spark: SparkSession, path: str,
                     url_col: str | None = None) -> DataFrame:
    """S4: JSON lines -> object chunks."""
    df = spark.read.json(path)
    # flatten scalars only (reference keeps flat dicts; nested objects are
    # stringified by the cast inside rows_to_object_chunks)
    if url_col is None:
        df = df.withColumn(
            "_src", F.concat(F.lit(path + "#row-"),
                             F.monotonically_increasing_id().cast("string")))
        url_col = "_src"
    return rows_to_object_chunks(df, url_col=url_col)


def read_text_chunks(spark: SparkSession, path: str,
                     max_chars: int = 1024) -> DataFrame:
    """S2: text files -> string chunks via the shared splitter. wholetext
    keeps one row per file so chunk offsets are file-absolute, matching the
    reference's per-document split (crud/chunks.py:444-446)."""
    raw = spark.read.option("wholetext", True).text(path).select(
        F.input_file_name().alias("url"),
        F.lit(None).cast("timestamp").alias("warc_ts"),
        F.lit(None).cast("binary").alias("html"),
        F.col("value").alias("text"),
        F.lit("en").alias("lang"),
    )
    return pages_to_chunks(raw, max_chars=max_chars)


def read_html_chunks(spark: SparkSession, path: str,
                     max_chars: int = 1024) -> DataFrame:
    """S1-analog: raw HTML files via binaryFile scan -> byte-identical
    html_to_text -> string chunks. Same fused mapInPandas stage as the pages
    pipeline."""
    raw = spark.read.format("binaryFile").load(path).select(
        F.col("path").alias("url"),
        F.col("modificationTime").alias("warc_ts"),
        F.col("content").alias("html"),
        F.lit(None).cast("string").alias("text"),
        F.lit("en").alias("lang"),
    )
    return pages_to_chunks(raw, max_chars=max_chars)


def pdf_pages_status(spark: SparkSession, path: str) -> DataFrame:
    """PDF decode with PER-FILE failure capture: (file, url, text, error) —
    one row per decoded page (error NULL), or ONE row per failed file
    (url/text NULL, error = reason). A corrupt upload must surface as a
    'failed' document-status row (crud/document.py:336-360), never kill the
    whole ingest task.

    binaryFile scan -> Arrow-batched mapInPandas decode. Decoder preference:
    pypdf when importable (full codec); else the bundled minimal pure-Python
    extractor (pdfmini — FlateDecode + literal-string text operators; see
    its module docstring for the honest limits)."""
    from collections.abc import Iterator

    import pandas as pd

    raw = spark.read.format("binaryFile").load(path)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        try:
            import io

            from pypdf import PdfReader

            def pages_of(data: bytes) -> list[str]:
                return [p.extract_text() or ""
                        for p in PdfReader(io.BytesIO(data)).pages]
        except ImportError:
            from knowledge_graph_studio_spark.pdfmini import (
                pdf_extract_pages as pages_of,
            )
        for pdf in batches:
            rows = []
            for p, content in zip(pdf["path"], pdf["content"]):
                try:
                    pages = pages_of(bytes(content))
                    if not pages:
                        raise ValueError("no extractable pages")
                    rows.extend((p, f"{p}#page={i + 1}", txt, None)
                                for i, txt in enumerate(pages))
                except Exception as exc:  # noqa: BLE001 — per-doc isolation
                    rows.append((p, None, None,
                                 f"{type(exc).__name__}: {exc}"))
            yield pd.DataFrame(
                rows, columns=["file", "url", "text", "error"])

    return raw.select("path", "content").mapInPandas(
        run, "file string, url string, text string, error string")


def read_pdf_chunks(spark: SparkSession, path: str,
                    max_chars: int = 1024) -> DataFrame:
    """S1/S6: PDF -> per-page text -> string chunks (crud/chunks.py:439-443:
    PdfReader page.extract_text() per page, then the shared splitter).
    Undecodable files are skipped here; use ingest_pdf_directory for the
    status-observable variant (per-document failed rows)."""
    pages_df = pdf_pages_status(spark, path).filter(F.col("error").isNull())
    shaped = pages_df.select(
        "url",
        F.lit(None).cast("timestamp").alias("warc_ts"),
        F.lit(None).cast("binary").alias("html"),
        "text",
        F.lit("en").alias("lang"),
    )
    return pages_to_chunks(shaped, max_chars=max_chars)


def ingest_pdf_directory(spark: SparkSession, path: str, workdir: str,
                         max_chars: int = 1024) -> dict:
    """Status-observable PDF ingest (VERDICT r2 #6): every file moves
    uploaded -> processing -> processed|failed through a DocumentLedger
    (io.catalog), mirroring the reference's document status machine
    (services/crud/document.py:270-360) so a partially failed upload batch
    is observable per document. Returns {"chunks", "status"} — chunks only
    from decodable files, status = the ledger's current() view.

    Batch shape at scale: 4 ledger writes per ingest run regardless of file
    count; the decode runs ONCE (non-eager checkpoint shared by the
    per-file status aggregation and the chunk output)."""
    from ..io.catalog import DocumentLedger

    ledger = DocumentLedger(spark, workdir)
    files = spark.read.format("binaryFile").load(path) \
        .select(F.col("path").alias("url"))
    ledger.record(files, "uploaded")
    ledger.record(files, "processing")

    decoded = pdf_pages_status(spark, path).localCheckpoint(eager=False)
    per_file = decoded.groupBy("file").agg(F.max("error").alias("error"))
    ledger.record(
        per_file.filter(F.col("error").isNull())
        .select(F.col("file").alias("url")), "processed")
    ledger.record(
        per_file.filter(F.col("error").isNotNull())
        .select(F.col("file").alias("url"), "error"),
        "failed", error_col="error")

    ok = decoded.filter(F.col("error").isNull()).select(
        "url",
        F.lit(None).cast("timestamp").alias("warc_ts"),
        F.lit(None).cast("binary").alias("html"),
        "text",
        F.lit("en").alias("lang"),
    )
    return {"chunks": pages_to_chunks(ok, max_chars=max_chars),
            "status": ledger.current()}
