"""Multimodal columns: image/audio/video as opaque ``binary`` + typed metadata.

A 100 TB training-data pipeline carries media alongside text. The Spark-side
plumbing here is real and tested — schemas, Arrow batch shapes, partitioning,
UDF signatures. The default codec REALLY decodes the uncompressed container
formats (PPM/PGM, 24-bit BMP, PCM WAV — ``mediamini``) and falls back to a
deterministic fake for compressed codecs the sandbox has no libraries for
(BUILD NOTE: register Pillow/torchaudio decoders via ``set_decoder`` in
production, the operator code does not change).

Design rules encoded here:
  * media bytes stay OPAQUE to Spark (binary column) — never explode pixels
    into rows; features come out as fixed-width array<float>.
  * metadata is a typed struct column (width/height/duration/codec), so
    filters on it are Column predicates that push down to the scan — you can
    drop oversized images WITHOUT decoding them.
  * decode/feature steps are Arrow-batched ``mapInPandas`` (one Python
    round-trip per 2048-row batch, never per row).
"""

from __future__ import annotations

from collections.abc import Callable, Iterator
from hashlib import blake2b

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_META = T.StructType(
    [
        T.StructField("media_type", T.StringType(), True),   # image|audio|video
        T.StructField("codec", T.StringType(), True),
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("duration_ms", T.IntegerType(), True),
        T.StructField("n_bytes", T.IntegerType(), True),
    ]
)

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.StringType(), False),
        T.StructField("url", T.StringType(), True),
        T.StructField("payload", T.BinaryType(), True),
        T.StructField("meta", MEDIA_META, True),
    ]
)


def _fake_decode(payload: bytes, meta: dict) -> np.ndarray:
    """Deterministic stand-in for a real codec: expands bytes into a pseudo
    pixel/sample array seeded by a stable digest of the payload. Replace via
    set_decoder() in production (e.g. PIL.Image.open -> np.asarray)."""
    h = blake2b(payload or b"", digest_size=8).digest()
    rng = np.random.default_rng(int.from_bytes(h, "big"))
    n = max(int(meta.get("width") or 8) * int(meta.get("height") or 8), 8)
    return rng.random(min(n, 4096), dtype=np.float64)


def _default_decode(payload: bytes, meta: dict) -> np.ndarray:
    """REAL decode for uncompressed containers (PPM/PGM/BMP/WAV, sniffed by
    magic bytes — mediamini); deterministic fake for everything else."""
    from ..mediamini import decode

    arr = decode(payload or b"")
    return arr if arr is not None else _fake_decode(payload, meta)


_DECODER: Callable[[bytes, dict], np.ndarray] = _default_decode


def set_decoder(fn: Callable[[bytes, dict], np.ndarray]) -> None:
    """Install a real codec (production hook; the fake is sandbox-only)."""
    global _DECODER
    _DECODER = fn


def filter_by_meta(media: DataFrame, max_bytes: int | None = None,
                   media_type: str | None = None) -> DataFrame:
    """Pre-decode pruning on the typed metadata struct — pure predicates that
    reach the parquet scan; no payload is ever read for dropped rows."""
    out = media
    if media_type:
        out = out.filter(F.col("meta.media_type") == media_type)
    if max_bytes is not None:
        out = out.filter(F.col("meta.n_bytes") <= max_bytes)
    return out


def extract_features(media: DataFrame, dim: int = 64) -> DataFrame:
    """binary payload -> fixed-width feature vector (mean-pooled windows over
    the decoded array). Arrow-batched; output array<float> of length dim."""
    out_schema = T.StructType(
        [
            T.StructField("media_id", T.StringType(), False),
            T.StructField("features", T.ArrayType(T.FloatType()), True),
        ]
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid, payload, meta in zip(
                pdf["media_id"], pdf["payload"], pdf["meta"]
            ):
                meta = dict(meta) if meta is not None else {}
                arr = _DECODER(payload, meta)
                # mean-pool into exactly `dim` buckets
                pads = (-len(arr)) % dim
                pooled = np.pad(arr, (0, pads)).reshape(dim, -1).mean(axis=1)
                rows.append((mid, pooled.astype(np.float32).tolist()))
            yield pd.DataFrame(rows, columns=["media_id", "features"])

    return media.select("media_id", "payload", "meta").mapInPandas(
        run, schema=out_schema)


def sample_frames(media: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Video frame sampling: one row per sampled timestamp. The frame decode
    itself is the codec's job (stubbed); the EXPLODED row layout — (media_id,
    frame_ts_ms, frame_features) — is the real contract, built with a native
    sequence+explode so row fan-out happens JVM-side, not in Python."""
    with_ts = (
        filter_by_meta(media, media_type="video")
        .withColumn(
            "frame_ts_ms",
            F.explode(
                F.sequence(
                    F.lit(0),
                    F.greatest(F.col("meta.duration_ms") - 1, F.lit(0)),
                    F.lit(every_ms),
                )
            ),
        )
    )
    feat = extract_features(with_ts.select(
        F.concat_ws("@", "media_id", "frame_ts_ms").alias("media_id"),
        "payload", "meta"))
    return feat.select(
        F.split("media_id", "@")[0].alias("media_id"),
        F.split("media_id", "@")[1].cast("int").alias("frame_ts_ms"),
        F.col("features").alias("frame_features"),
    )


def resize_stub(media: DataFrame, width: int, height: int) -> DataFrame:
    """Resize contract: payload passes through (codec stub), meta dims update
    JVM-side. In production the payload transform happens in the same
    mapInPandas slot as extract_features."""
    return media.withColumn(
        "meta",
        F.struct(
            F.col("meta.media_type").alias("media_type"),
            F.col("meta.codec").alias("codec"),
            F.lit(width).alias("width"),
            F.lit(height).alias("height"),
            F.col("meta.duration_ms").alias("duration_ms"),
            F.col("meta.n_bytes").alias("n_bytes"),
        ),
    )


def synthetic_media(spark, n: int, seed: int = 42) -> DataFrame:
    """Deterministic media fixture (images + videos with binary payloads)."""
    rows = []
    for i in range(n):
        h = blake2b(f"{seed}:{i}".encode(), digest_size=16).digest()
        is_video = i % 3 == 0
        rows.append(
            (
                f"m{i:05d}", f"https://media.example/{i}", bytes(h * 4),
                {
                    "media_type": "video" if is_video else "image",
                    "codec": "fake", "width": 8 + (i % 5) * 8,
                    "height": 8 + (i % 3) * 8,
                    "duration_ms": 3000 + (i % 4) * 1000 if is_video else None,
                    "n_bytes": len(h) * 4,
                },
            )
        )
    return spark.createDataFrame(rows, MEDIA_SCHEMA)


def phash_signatures(media: DataFrame, grid: int = 8) -> DataFrame:
    """Perceptual aHash per image: decode -> grayscale -> ``grid x grid``
    block means -> 1 bit per cell (above/below the image mean) -> a 64-bit
    signature (media_id, phash long). Near-identical images (recompression,
    small edits, resizes) land within a few bits of each other; Arrow
    -batched like every media op, signatures are 8 bytes — the image
    analog of the text SimHash family and the input to
    :func:`phash_neardup_pairs`."""
    assert grid * grid <= 64, "signature must fit a 64-bit long"
    out_schema = T.StructType([
        T.StructField("media_id", T.StringType(), False),
        T.StructField("phash", T.LongType(), True),
    ])

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, sigs = [], []
            for mid, payload, meta in zip(
                    pdf["media_id"], pdf["payload"], pdf["meta"]):
                meta = dict(meta) if meta is not None else {}
                arr = _DECODER(payload, meta)
                w = int(meta.get("width") or 0)
                h = int(meta.get("height") or 0)
                sig = None
                if w > 0 and h > 0 and arr.size >= w * h:
                    c = arr.size // (w * h)
                    gray = arr[: w * h * c].reshape(h, w, c).mean(axis=2)
                    cells = np.empty((grid, grid))
                    for i in range(grid):
                        r0, r1 = (i * h) // grid, max(((i + 1) * h) // grid,
                                                      (i * h) // grid + 1)
                        for j in range(grid):
                            c0 = (j * w) // grid
                            c1 = max(((j + 1) * w) // grid, c0 + 1)
                            cells[i, j] = gray[r0:r1, c0:c1].mean()
                    bits = (cells > cells.mean()).flatten()
                    val = 0
                    for b in bits:
                        val = (val << 1) | int(b)
                    sig = int(np.uint64(val).astype(np.int64))
                ids.append(mid)
                sigs.append(sig)
            yield pd.DataFrame({"media_id": ids, "phash": sigs})

    return (filter_by_meta(media, media_type="image")
            .select("media_id", "payload", "meta")
            .mapInPandas(run, schema=out_schema))


def phash_neardup_pairs(
    media: DataFrame, max_hamming: int = 3,
    band_bits: int = 16, max_bucket: int = 1000, grid: int = 8,
) -> DataFrame:
    """(ma, mb, hamming) image pairs within ``max_hamming`` signature bits
    — banded blocking + exact verification, the same pigeonhole
    construction as ``dedup.simhash_neardup_pairs``: 64/band_bits bands
    guarantee EXACT recall for hamming <= n_bands - 1 (default 4x16 ->
    max_hamming <= 3). Only 8-byte signatures shuffle; buckets above
    ``max_bucket`` (flat-color boilerplate images) are dropped, the hot
    -bucket guard of the text families."""
    from .dedup import banded_hamming_pairs

    sigs = phash_signatures(media, grid=grid).filter(
        F.col("phash").isNotNull())
    return banded_hamming_pairs(
        sigs, id_col="media_id", sig_col="phash",
        max_hamming=max_hamming, band_bits=band_bits,
        max_bucket=max_bucket) \
        .withColumnsRenamed({"a": "ma", "b": "mb"})


def audio_fingerprints(media: DataFrame, grid: int = 8) -> DataFrame:
    """Spectral audio fingerprint per clip: decode -> ``grid`` time blocks
    x ``grid`` FFT magnitude bands -> energy matrix -> 1 bit per cell
    (above/below the clip mean) -> 64-bit signature (media_id, afp long).
    Amplitude-scale invariant (the threshold is the clip's own mean) and
    robust to small edits — the audio member of the perceptual-hash family
    (Haitsma-Kalker-style band energies, aHash thresholding)."""
    assert grid * grid <= 64, "signature must fit a 64-bit long"
    out_schema = T.StructType([
        T.StructField("media_id", T.StringType(), False),
        T.StructField("afp", T.LongType(), True),
    ])

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, sigs = [], []
            for mid, payload, meta in zip(
                    pdf["media_id"], pdf["payload"], pdf["meta"]):
                meta = dict(meta) if meta is not None else {}
                arr = _DECODER(payload, meta)
                sig = None
                if arr.size >= 2 * grid * grid:
                    n = (arr.size // grid) * grid
                    blocks = arr[:n].reshape(grid, -1)
                    mag = np.abs(np.fft.rfft(blocks, axis=1))[:, 1:]
                    e = np.empty((grid, grid))
                    w = mag.shape[1]
                    for j in range(grid):
                        c0 = (j * w) // grid
                        c1 = max(((j + 1) * w) // grid, c0 + 1)
                        e[:, j] = (mag[:, c0:c1] ** 2).mean(axis=1)
                    bits = (e > e.mean()).flatten()
                    val = 0
                    for b in bits:
                        val = (val << 1) | int(b)
                    sig = int(np.uint64(val).astype(np.int64))
                ids.append(mid)
                sigs.append(sig)
            yield pd.DataFrame({"media_id": ids, "afp": sigs})

    return (filter_by_meta(media, media_type="audio")
            .select("media_id", "payload", "meta")
            .mapInPandas(run, schema=out_schema))


def audio_neardup_pairs(
    media: DataFrame, max_hamming: int = 3,
    band_bits: int = 16, max_bucket: int = 1000, grid: int = 8,
) -> DataFrame:
    """(ma, mb, hamming) audio pairs within ``max_hamming`` fingerprint
    bits — same exact-by-pigeonhole banding engine as the image and text
    families (dedup.banded_hamming_pairs)."""
    from .dedup import banded_hamming_pairs

    sigs = audio_fingerprints(media, grid=grid).filter(
        F.col("afp").isNotNull())
    return banded_hamming_pairs(
        sigs, id_col="media_id", sig_col="afp",
        max_hamming=max_hamming, band_bits=band_bits,
        max_bucket=max_bucket) \
        .withColumnsRenamed({"a": "ma", "b": "mb"})
