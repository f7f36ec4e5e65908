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


def test_pdf_reader_is_explicit_stub(spark):
    with pytest.raises(NotImplementedError):
        read_pdf_chunks(spark, "/nonexistent.pdf")
