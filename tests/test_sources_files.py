"""File-format sources (S1-S5/S7): csv/json object chunks, text/html chunks."""

import pytest

from knowledge_graph_studio_spark.sources.files import (
    read_csv_chunks, read_html_chunks, read_json_chunks, read_pdf_chunks,
    read_text_chunks,
)
from knowledge_graph_studio_spark.textcore import html_to_text


def test_csv_object_chunks(spark, tmp_path):
    p = tmp_path / "t.csv"
    p.write_text("name,age,city\nAda,36,London\nAlan,41,\n")
    rows = {r["content_obj"]["name"]: r
            for r in read_csv_chunks(spark, str(p)).collect()}
    assert rows["Ada"]["data_type"] == "object"
    assert rows["Ada"]["content_obj"] == {"name": "Ada", "age": "36",
                                          "city": "London"}
    assert rows["Alan"]["content_obj"].get("city") is None
    assert rows["Ada"]["chunk_id"]


def test_json_object_chunks(spark, tmp_path):
    p = tmp_path / "t.json"
    p.write_text('{"k": "v1", "n": 1}\n{"k": "v2", "n": 2}\n')
    rows = sorted(r["content_obj"]["k"]
                  for r in read_json_chunks(spark, str(p)).collect())
    assert rows == ["v1", "v2"]


def test_text_chunks_offsets(spark, tmp_path):
    p = tmp_path / "doc.txt"
    body = ("alpha beta. " * 200).strip()  # > 1024 chars -> multiple chunks
    p.write_text(body)
    chunks = sorted(read_text_chunks(spark, str(p)).collect(),
                    key=lambda r: r["start"])
    assert len(chunks) > 1
    rebuilt = "".join(c["content"] for c in chunks)
    assert rebuilt == body
    assert all(body[c["start"]:c["end"]] == c["content"] for c in chunks)


def test_html_chunks_byte_identical(spark, tmp_path):
    p = tmp_path / "page.html"
    html = "<html><head><style>x</style></head><body><h1>Title</h1>" \
           "<p>Hello &amp; welcome</p></body></html>"
    p.write_text(html)
    chunks = read_html_chunks(spark, str(p)).collect()
    assert len(chunks) == 1
    assert chunks[0]["content"] == html_to_text(html)
    assert "Hello & welcome" in chunks[0]["content"]


def _minimal_pdf(pages: list[str], compress: bool = True) -> bytes:
    """Hand-rolled minimal PDF (spec-shaped: catalog, page tree, one
    FlateDecode content stream per page) — deterministic test fixture."""
    import zlib

    objs: list[bytes] = []
    n_pages = len(pages)
    kids = " ".join(f"{3 + 2 * i} 0 R" for i in range(n_pages))
    objs.append(b"<< /Type /Catalog /Pages 2 0 R >>")
    objs.append(f"<< /Type /Pages /Kids [{kids}] /Count {n_pages} >>"
                .encode())
    for i, text in enumerate(pages):
        page_no, cont_no = 3 + 2 * i, 4 + 2 * i
        objs.append(
            f"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] "
            f"/Contents {cont_no} 0 R >>".encode())
        lines = text.split("\n")
        ops = b"BT /F1 12 Tf 72 720 Td "
        for j, ln in enumerate(lines):
            esc = ln.replace("\\", r"\\").replace("(", r"\(").replace(")", r"\)")
            ops += (b"T* " if j else b"") + b"(" + esc.encode("latin-1") + b") Tj "
        ops += b"ET"
        body = zlib.compress(ops) if compress else ops
        filt = b"/Filter /FlateDecode " if compress else b""
        objs.append(b"<< " + filt + f"/Length {len(body)} >>".encode()
                    + b"\nstream\n" + body + b"endstream")
    out = bytearray(b"%PDF-1.4\n")
    offsets = []
    for i, o in enumerate(objs):
        offsets.append(len(out))
        out += f"{i + 1} 0 obj\n".encode() + o + b"\nendobj\n"
    xref_at = len(out)
    out += f"xref\n0 {len(objs) + 1}\n0000000000 65535 f \n".encode()
    for off in offsets:
        out += f"{off:010d} 00000 n \n".encode()
    out += (f"trailer\n<< /Size {len(objs) + 1} /Root 1 0 R >>\n"
            f"startxref\n{xref_at}\n%%EOF\n").encode()
    return bytes(out)


def test_pdfmini_extracts_pages_and_escapes():
    from knowledge_graph_studio_spark.pdfmini import pdf_extract_pages

    pdf = _minimal_pdf(["Hello (PDF) world\nSecond line", "Page two"])
    pages = pdf_extract_pages(pdf)
    assert pages == ["Hello (PDF) world\nSecond line", "Page two"]
    # uncompressed streams decode too
    pages_u = pdf_extract_pages(_minimal_pdf(["plain"], compress=False))
    assert pages_u == ["plain"]


def test_pdf_chunks_end_to_end(spark, tmp_path):
    p = tmp_path / "doc.pdf"
    p.write_bytes(_minimal_pdf(["alpha beta gamma", "delta epsilon"]))
    rows = read_pdf_chunks(spark, str(p)).orderBy("url").collect()
    assert [r["url"].split("#")[-1] for r in rows] == ["page=1", "page=2"]
    assert rows[0]["content"] == "alpha beta gamma"
    assert rows[1]["content"] == "delta epsilon"
    assert all(r["chunk_id"].endswith(":0") for r in rows)  # offset-keyed


def test_ingest_pdf_directory_status_machine(spark, tmp_path):
    """Document status machine (crud/document.py:270-360 semantics): good
    files end processed with chunks, a corrupt file ends failed with the
    decode error recorded, and the event history shows the full
    uploaded -> processing -> terminal transition chain."""
    from knowledge_graph_studio_spark.io.catalog import DocumentLedger
    from knowledge_graph_studio_spark.sources.files import ingest_pdf_directory

    src = tmp_path / "uploads"
    src.mkdir()
    (src / "good1.pdf").write_bytes(_minimal_pdf(["alpha beta"]))
    (src / "good2.pdf").write_bytes(_minimal_pdf(["gamma", "delta"]))
    (src / "broken.pdf").write_bytes(b"%PDF-1.4 truncated garbage")

    wd = str(tmp_path / "wd")
    out = ingest_pdf_directory(spark, str(src), wd)

    cur = {r["url"].rsplit("/", 1)[-1]: r for r in out["status"].collect()}
    assert cur["good1.pdf"]["status"] == "processed"
    assert cur["good2.pdf"]["status"] == "processed"
    assert cur["broken.pdf"]["status"] == "failed"
    assert cur["broken.pdf"]["error"]  # decode reason recorded
    assert cur["good1.pdf"]["error"] is None

    # chunks only from decodable files
    chunk_urls = {r["url"].rsplit("/", 1)[-1].split("#")[0]
                  for r in out["chunks"].collect()}
    assert chunk_urls == {"good1.pdf", "good2.pdf"}

    # full transition history per document (event-sourced ledger)
    ledger = DocumentLedger(spark, wd)
    hist = [r["status"] for r in ledger.events()
            .filter("url like '%broken.pdf'")
            .orderBy("batch").collect()]
    assert hist == ["uploaded", "processing", "failed"]
    # a later ledger handle continues the batch sequence
    assert ledger._seq == 4


# --- WARC source -----------------------------------------------------------


def _warc_record(rtype, url=None, date="2026-01-02T03:04:05Z",
                 payload=b""):
    head = [b"WARC/1.0", b"WARC-Type: " + rtype.encode()]
    if url:
        head.append(b"WARC-Target-URI: " + url.encode())
    head.append(b"WARC-Date: " + date.encode())
    head.append(b"Content-Length: " + str(len(payload)).encode())
    return b"\r\n".join(head) + b"\r\n\r\n" + payload + b"\r\n\r\n"


def _http(body, status=b"200 OK"):
    return (b"HTTP/1.1 " + status + b"\r\nContent-Type: text/html\r\n\r\n"
            + body)


def _warc_bytes():
    html1 = b"<html><body><p>Alpha founded Beta.</p></body></html>"
    html2 = b"<html><body><h1>Title</h1><p>Gamma runs Delta.</p></body></html>"
    return (
        _warc_record("warcinfo", payload=b"software: test")
        + _warc_record("request", url="http://ex.com/a",
                       payload=b"GET /a HTTP/1.1\r\n\r\n")
        + _warc_record("response", url="http://ex.com/a",
                       payload=_http(html1))
        + _warc_record("response", url="http://ex.com/gone",
                       payload=_http(b"nope", status=b"404 Not Found"))
        + _warc_record("response", url="http://ex.com/b",
                       date="2026-02-03T04:05:06Z", payload=_http(html2))
    ), html1, html2


def test_read_warc_pages_plain_and_gzip(spark, tmp_path):
    import gzip

    from knowledge_graph_studio_spark.sources.warc import read_warc_pages
    from knowledge_graph_studio_spark.textcore import html_to_text

    raw, html1, html2 = _warc_bytes()
    (tmp_path / "seg-00000.warc").write_bytes(raw)
    # gzip variant (gzip.decompress also accepts Common Crawl's
    # multi-member per-record layout)
    (tmp_path / "seg-00001.warc.gz").write_bytes(gzip.compress(raw))

    pages = read_warc_pages(spark, str(tmp_path)).collect()
    # 2 kept responses per file (404 + warcinfo + request dropped)
    assert len(pages) == 4
    by_url = {}
    for r in pages:
        by_url.setdefault(r["url"], []).append(r)
    assert set(by_url) == {"http://ex.com/a", "http://ex.com/b"}
    for r in by_url["http://ex.com/a"]:
        assert bytes(r["html"]) == html1
        assert r["text"] == html_to_text(html1)  # byte-identical per url
        assert r["warc_ts"].year == 2026 and r["warc_ts"].month == 1
    for r in by_url["http://ex.com/b"]:
        assert bytes(r["html"]) == html2
        assert r["warc_ts"].month == 2
    # plain and gzip parse identically
    a, b = by_url["http://ex.com/a"]
    assert (a["text"], bytes(a["html"])) == (b["text"], bytes(b["html"]))


def test_warc_pages_feed_the_kg_pipeline(spark, tmp_path):
    from knowledge_graph_studio_spark.pipeline import triples_from_pages
    from knowledge_graph_studio_spark.sources.warc import read_warc_pages

    raw, _, _ = _warc_bytes()
    (tmp_path / "seg.warc").write_bytes(raw)
    pages = read_warc_pages(spark, str(tmp_path))
    # the WARC source is schema-compatible with the extraction stage
    triples = triples_from_pages(spark, pages)
    assert triples.columns  # plan resolves; runs end-to-end
    triples.count()


def test_parse_warc_rejects_garbage():
    import pytest

    from knowledge_graph_studio_spark.sources.warc import parse_warc_bytes

    with pytest.raises(ValueError, match="not a WARC record"):
        list(parse_warc_bytes(b"GIBBERISH\r\n\r\npayload"))
