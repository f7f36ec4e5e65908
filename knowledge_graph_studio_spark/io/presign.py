"""S12 — presigned upload/download for direct file exchange.

Reference parity (routers/documents.py:367-462): `generate_presigned` issues
a presigned POST for uploading (filename sanitized to `[a-zA-Z0-9_.-]`, key =
"<user>/<filename>", 404 "Document already exists." when the key is taken,
metadata fields x-amz-meta-document-id / x-amz-meta-origin-workspace-id bound
as conditions, a content-length-range condition, and an expiry); `download`
issues a presigned GET for an existing document.

Here the object store is a local/posix root (the sandbox has no S3; in a
real deployment this module is replaced by the SDK call, the CONTRACT is
what's kept) and the signature is the standard presign shape: HMAC-SHA256
over (method, key, expiry, bound metadata) with a server-held secret —
the same query-string-authenticated design as AWS SigV4 presigning (public
spec), so tokens are tamper-evident and self-expiring without server-side
session state.
"""

from __future__ import annotations

import hashlib
import hmac
import os
import re
import time
from dataclasses import dataclass
from urllib.parse import parse_qs, quote, unquote, urlparse

DEFAULT_EXPIRES = 900  # seconds; reference: settings.aws.s3.presigned_post_expiration
DEFAULT_MAX_BYTES = 50 << 20  # reference: presigned_post_max_bytes


class PresignError(Exception):
    pass


def sanitize_filename(filename: str) -> str:
    """routers/documents.py:379: re.sub(r"[^a-zA-Z0-9_.-]", "_", filename)."""
    return re.sub(r"[^a-zA-Z0-9_.-]", "_", filename)


def _sig(secret: bytes, method: str, key: str, expires_at: int,
         meta: dict[str, str], max_bytes: int) -> str:
    bound = "&".join(f"{k}={meta[k]}" for k in sorted(meta))
    msg = f"{method}\n{key}\n{expires_at}\n{bound}\n{max_bytes}".encode()
    return hmac.new(secret, msg, hashlib.sha256).hexdigest()


@dataclass
class PresignedUrl:
    url: str
    method: str
    key: str
    expires_at: int
    fields: dict[str, str]  # the reference's response Fields (metadata echo)


class LocalObjectStore:
    """Posix-rooted object store with presigned PUT/GET.

    The store root plays the bucket; ``secret`` is the signing key the
    server holds (per-deployment). All verbs below are driver-side utility
    calls (document exchange is human/API scale by contract — bulk data
    moves through the table format, SURVEY.md §2.1)."""

    def __init__(self, root: str, secret: bytes | str = b"local-secret"):
        self.root = root
        self.secret = secret.encode() if isinstance(secret, str) else secret
        os.makedirs(root, exist_ok=True)

    def _path(self, key: str) -> str:
        p = os.path.normpath(os.path.join(self.root, key))
        if not p.startswith(os.path.abspath(self.root) + os.sep) \
                and p != os.path.abspath(self.root):
            p2 = os.path.abspath(p)
            if not p2.startswith(os.path.abspath(self.root) + os.sep):
                raise PresignError(f"key escapes store root: {key}")
        return p

    def exists(self, key: str) -> bool:
        return os.path.exists(self._path(key))

    # -- issuance ---------------------------------------------------------- #

    def generate_presigned_post(
        self, user_id: str, filename: str, document_id: str,
        workspace_id: str, expires_in: int = DEFAULT_EXPIRES,
        max_bytes: int = DEFAULT_MAX_BYTES, now: float | None = None,
    ) -> PresignedUrl:
        """Upload grant (routers/documents.py:367-429): sanitized key under
        the user prefix, refused when the document already exists, metadata
        bound into the signature exactly like the reference's POST
        conditions."""
        key = f"{user_id}/{sanitize_filename(filename)}"
        if self.exists(key):
            raise PresignError("Document already exists.")  # :392-396
        meta = {"x-amz-meta-document-id": document_id,
                "x-amz-meta-origin-workspace-id": workspace_id}
        expires_at = int((now if now is not None else time.time()) + expires_in)
        sig = _sig(self.secret, "PUT", key, expires_at, meta, max_bytes)
        qs = "&".join(
            [f"expires={expires_at}", f"max_bytes={max_bytes}"]
            + [f"{quote(k)}={quote(v)}" for k, v in sorted(meta.items())]
            + [f"signature={sig}"])
        return PresignedUrl(url=f"local://{quote(key)}?{qs}", method="PUT",
                            key=key, expires_at=expires_at, fields=meta)

    def generate_presigned_download(
        self, key: str, expires_in: int = DEFAULT_EXPIRES,
        now: float | None = None,
    ) -> PresignedUrl:
        """Download grant for an EXISTING document (routers/documents.py:
        430-462 — valid_document_id gates on existence)."""
        if not self.exists(key):
            raise PresignError("Document not found.")
        expires_at = int((now if now is not None else time.time()) + expires_in)
        sig = _sig(self.secret, "GET", key, expires_at, {}, 0)
        return PresignedUrl(
            url=f"local://{quote(key)}?expires={expires_at}&max_bytes=0"
                f"&signature={sig}",
            method="GET", key=key, expires_at=expires_at, fields={})

    # -- redemption -------------------------------------------------------- #

    def _validate(self, url: str, method: str,
                  now: float | None = None) -> tuple[str, int]:
        parsed = urlparse(url)
        key = unquote((parsed.netloc + parsed.path))
        q = {k: v[0] for k, v in parse_qs(parsed.query).items()}
        expires_at = int(q.get("expires", "0"))
        max_bytes = int(q.get("max_bytes", "0"))
        meta = {k: v for k, v in q.items()
                if k.startswith("x-amz-meta-")}
        want = _sig(self.secret, method, key, expires_at, meta, max_bytes)
        if not hmac.compare_digest(want, q.get("signature", "")):
            raise PresignError("signature mismatch")
        if (now if now is not None else time.time()) > expires_at:
            raise PresignError("url expired")
        return key, max_bytes

    def presigned_put(self, url: str, data: bytes,
                      now: float | None = None) -> str:
        """Redeem an upload grant. Enforces the content-length-range
        condition (routers/documents.py:416-420) and first-writer-wins
        (atomic rename; a raced duplicate upload loses cleanly)."""
        key, max_bytes = self._validate(url, "PUT", now)
        if len(data) > max_bytes:
            raise PresignError(
                f"content-length-range exceeded: {len(data)} > {max_bytes}")
        path = self._path(key)
        os.makedirs(os.path.dirname(path), exist_ok=True)
        tmp = f"{path}.tmp.{os.getpid()}"
        with open(tmp, "wb") as fh:
            fh.write(data)
        if os.path.exists(path):
            os.remove(tmp)
            raise PresignError("Document already exists.")
        os.replace(tmp, path)
        return key

    def presigned_get(self, url: str, now: float | None = None) -> bytes:
        key, _ = self._validate(url, "GET", now)
        try:
            with open(self._path(key), "rb") as fh:
                return fh.read()
        except FileNotFoundError:
            raise PresignError("Document not found.") from None
