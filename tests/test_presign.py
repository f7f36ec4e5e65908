"""S12 presigned upload/download (routers/documents.py:367-462 contract):
sanitization, exists-refusal, signature/expiry/length enforcement."""

import pytest

from knowledge_graph_studio_spark.io.presign import (
    LocalObjectStore, PresignError, sanitize_filename,
)


def test_sanitize_filename_reference_regex():
    assert sanitize_filename("my file (1).pdf") == "my_file__1_.pdf"
    assert sanitize_filename("ok-name_2.txt") == "ok-name_2.txt"


def test_presigned_post_roundtrip_and_conditions(tmp_path):
    store = LocalObjectStore(str(tmp_path), secret="k1")
    grant = store.generate_presigned_post(
        "user1", "report v2.pdf", document_id="doc123",
        workspace_id="ws9", now=1000.0, expires_in=900, max_bytes=100)
    assert grant.key == "user1/report_v2.pdf"
    assert grant.fields == {"x-amz-meta-document-id": "doc123",
                            "x-amz-meta-origin-workspace-id": "ws9"}

    key = store.presigned_put(grant.url, b"x" * 50, now=1500.0)
    assert key == grant.key and store.exists(key)

    # existing document: new grant refused (reference 404 path)
    with pytest.raises(PresignError, match="already exists"):
        store.generate_presigned_post("user1", "report v2.pdf",
                                      "doc124", "ws9", now=1000.0)

    # download roundtrip
    dl = store.generate_presigned_download(grant.key, now=2000.0)
    assert store.presigned_get(dl.url, now=2100.0) == b"x" * 50
    with pytest.raises(PresignError, match="not found"):
        store.generate_presigned_download("user1/nope.pdf", now=2000.0)


def test_presigned_enforcement(tmp_path):
    store = LocalObjectStore(str(tmp_path), secret="k1")
    g = store.generate_presigned_post("u", "a.txt", "d1", "w1",
                                      now=1000.0, expires_in=60, max_bytes=10)
    # expiry
    with pytest.raises(PresignError, match="expired"):
        store.presigned_put(g.url, b"hi", now=1061.0)
    # content-length-range
    with pytest.raises(PresignError, match="content-length-range"):
        store.presigned_put(g.url, b"x" * 11, now=1030.0)
    # tampered key -> signature mismatch
    tampered = g.url.replace("a.txt", "b.txt")
    with pytest.raises(PresignError, match="signature"):
        store.presigned_put(tampered, b"hi", now=1030.0)
    # tampered expiry -> signature mismatch
    tampered2 = g.url.replace("expires=1060", "expires=9999999999")
    with pytest.raises(PresignError, match="signature"):
        store.presigned_put(tampered2, b"hi", now=1030.0)
    # wrong secret server-side
    other = LocalObjectStore(str(tmp_path), secret="k2")
    with pytest.raises(PresignError, match="signature"):
        other.presigned_put(g.url, b"hi", now=1030.0)
    # duplicate upload: first-writer-wins
    store.presigned_put(g.url, b"hi", now=1030.0)
    with pytest.raises(PresignError, match="already exists"):
        store.presigned_put(g.url, b"hi2", now=1040.0)


def test_key_cannot_escape_root(tmp_path):
    store = LocalObjectStore(str(tmp_path / "root"), secret="k")
    with pytest.raises(PresignError):
        store.exists("../outside.txt")
