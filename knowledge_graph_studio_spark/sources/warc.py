"""WARC source: read Common-Crawl-style Web ARChive files into the pages
table shape (url, warc_ts, html, text, lang).

Real crawls arrive as WARC (ISO 28500) segment files, thousands per
snapshot — Common Crawl ships ~90k gzipped WARCs per monthly crawl. The
Spark-first shape: ``binaryFile`` scan (one task per segment file, the
crawl's own natural partition unit) -> Arrow-batched ``mapInPandas``
parsing records with plain byte-framing (WARC headers are
``Content-Length``-framed; no library needed) -> the exact PAGES_SCHEMA
the rest of the engine consumes, with text extracted by the same
``textcore.html_to_text`` used everywhere (the byte-identical-per-url
invariant holds from WARC input too, law-tested).

Gzip: Common Crawl WARCs are multi-member gzip (one member per record);
``gzip.decompress`` handles concatenated members, so ``.warc.gz`` files
need no special casing. Files stream through one executor each — at 100 TB
the parallelism is the segment-file count (~90k tasks), not bytes per
file, matching how every public WARC processor (e.g. CCNet's) partitions.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession

from .pages import PAGES_SCHEMA

_GZIP_MAGIC = b"\x1f\x8b"


def parse_warc_bytes(data: bytes) -> Iterator[dict]:
    """Yield one dict per WARC record: warc headers (lowercased keys) +
    ``payload`` bytes. Pure byte framing: header block to the first CRLFCRLF,
    ``Content-Length`` bytes of payload, then the record separator."""
    if data[:2] == _GZIP_MAGIC:
        import gzip

        data = gzip.decompress(data)
    pos, n = 0, len(data)
    while pos < n:
        # skip inter-record CRLFs
        while data[pos:pos + 2] == b"\r\n":
            pos += 2
        if pos >= n:
            return
        head_end = data.find(b"\r\n\r\n", pos)
        if head_end < 0:
            return
        head = data[pos:head_end].decode("utf-8", errors="replace")
        lines = head.split("\r\n")
        if not lines[0].startswith("WARC/"):
            raise ValueError(
                f"not a WARC record at offset {pos}: {lines[0][:40]!r}")
        rec: dict = {"warc_version": lines[0]}
        for line in lines[1:]:
            k, _, v = line.partition(":")
            rec[k.strip().lower()] = v.strip()
        clen = int(rec.get("content-length", 0))
        rec["payload"] = data[head_end + 4:head_end + 4 + clen]
        pos = head_end + 4 + clen
        yield rec


def _http_body(payload: bytes) -> tuple[int | None, bytes]:
    """Split an HTTP response payload into (status, body)."""
    sep = payload.find(b"\r\n\r\n")
    if sep < 0 or not payload[:5].startswith(b"HTTP/"):
        return None, payload
    try:
        status = int(payload[:sep].split(b"\r\n")[0].split()[1])
    except (IndexError, ValueError):
        status = None
    return status, payload[sep + 4:]


def read_warc_pages(
    spark: SparkSession,
    path: str,
    record_types: tuple[str, ...] = ("response",),
    min_status: int = 200,
    max_status: int = 299,
) -> DataFrame:
    """Read a directory of ``.warc`` / ``.warc.gz`` files into the pages
    table: (url, warc_ts, html, text, lang). Only records of
    ``record_types`` with an HTTP status in [min_status, max_status] (or no
    HTTP framing) are kept; ``text`` is ``textcore.html_to_text`` over the
    body — the same extractor as every other source, so per-url text is
    byte-identical however the page arrived. ``lang`` is left null for the
    downstream language-ID operator."""
    files = (spark.read.format("binaryFile")
             .option("pathGlobFilter", "*.warc*")
             .load(path)
             .select("path", "content"))

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from ..textcore import html_to_text

        for pdf in batches:
            rows = []
            for blob in pdf["content"]:
                for rec in parse_warc_bytes(bytes(blob)):
                    if rec.get("warc-type") not in record_types:
                        continue
                    status, body = _http_body(rec["payload"])
                    if status is not None and not (
                            min_status <= status <= max_status):
                        continue
                    url = rec.get("warc-target-uri")
                    if not url:
                        continue
                    ts = pd.to_datetime(rec.get("warc-date"), utc=True,
                                        errors="coerce")
                    rows.append((
                        url,
                        None if ts is pd.NaT else ts.tz_localize(None),
                        body,
                        html_to_text(body),
                        None,
                    ))
            yield pd.DataFrame(
                rows, columns=["url", "warc_ts", "html", "text", "lang"])

    return files.mapInPandas(run, schema=PAGES_SCHEMA)
