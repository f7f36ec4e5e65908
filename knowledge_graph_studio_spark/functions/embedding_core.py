"""Pure deterministic text embedder — NO pyspark imports.

Stand-in for the reference's OpenAI embedding calls (V1 chunks at 1536 dims,
utilities/common.py:20-49; V2 triples at 1024 dims, services/crud/triple.py:
265-300). The reference's contract we preserve: a text -> fixed-dim float
vector map, batched, with cosine similarity meaningful between related texts.

Implementation: signed feature hashing (the "hashing trick") over lowercase
alphanumeric word tokens weighted by term frequency, L2-normalized. Properties:
  * deterministic across processes/platforms (blake2b, no PYTHONHASHSEED
    dependence) — required for the driver's value-hash checks and for
    idempotent partition retries;
  * bag-of-words overlap => cosine similarity, so near-duplicate texts score
    near 1.0 and disjoint texts ~0.0 — the behavior the Q8/Q9 top-k operators
    and the embedding-near-dup dedup path need;
  * vectorizable: token -> (bucket, sign) is cached per process, the
    accumulation is numpy — fits the Arrow-batched pandas-UDF hot path.
"""

from __future__ import annotations

import re
from functools import lru_cache
from hashlib import blake2b

import numpy as np

CHUNK_DIM = 1536   # reference chunk embeddings (utilities/common.py:43)
TRIPLE_DIM = 1024  # reference triple embeddings (services/crud/triple.py:294)

_TOKEN_RE = re.compile(r"[a-z0-9]+")


@lru_cache(maxsize=1 << 20)
def _token_slot(token: str) -> tuple[int, int]:
    """token -> (64-bit hash, sign). Bucket is hash % dim at call time so one
    cache serves every dim."""
    h = int.from_bytes(blake2b(token.encode("utf-8"), digest_size=8).digest(),
                       "big")
    return h, 1 if (h >> 63) & 1 else -1


def embed_text(text: str | None, dim: int) -> np.ndarray:
    """One text -> L2-normalized float32 vector of length ``dim``."""
    vec = np.zeros(dim, dtype=np.float64)
    if text:
        for tok in _TOKEN_RE.findall(text.lower()):
            h, sign = _token_slot(tok)
            vec[h % dim] += sign
    norm = float(np.linalg.norm(vec))
    if norm > 0.0:
        vec /= norm
    return vec.astype(np.float32)


def embed_texts(texts: list[str | None], dim: int) -> list[np.ndarray]:
    """Batch embed (the reference batches <=2048 texts per call,
    utilities/common.py:28-33 — our batch is the Arrow record batch)."""
    return [embed_text(t, dim) for t in texts]


def cosine(a: np.ndarray, b: np.ndarray) -> float:
    na, nb = float(np.linalg.norm(a)), float(np.linalg.norm(b))
    if na == 0.0 or nb == 0.0:
        return 0.0
    return float(np.dot(a, b) / (na * nb))
