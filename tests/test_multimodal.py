"""Multimodal plumbing: schema, pruning pushdown, Arrow batch contract."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from knowledge_graph_studio_spark.operators.multimodal import (
    extract_features, filter_by_meta, resize_stub, sample_frames, set_decoder,
    synthetic_media, _default_decode,
)


@pytest.fixture(scope="module")
def media(spark):
    return synthetic_media(spark, 30, seed=7).persist()


def test_meta_filter_prunes_without_decode(media):
    vids = filter_by_meta(media, media_type="video")
    assert vids.count() == 10
    small = filter_by_meta(media, max_bytes=32)
    assert small.count() == 0  # payloads are 64 bytes


def test_extract_features_shape_and_determinism(media):
    f1 = {r["media_id"]: r["features"]
          for r in extract_features(media, dim=16).collect()}
    f2 = {r["media_id"]: r["features"]
          for r in extract_features(media, dim=16).collect()}
    assert set(f1) == {f"m{i:05d}" for i in range(30)}
    assert all(len(v) == 16 for v in f1.values())
    for k in f1:
        assert np.allclose(f1[k], f2[k])


def test_sample_frames_fanout_is_jvm_side(media):
    frames = sample_frames(media, every_ms=1000)
    rows = frames.collect()
    # every video contributes ceil(duration/1000) frames
    vids = {r["media_id"]: r["meta"]["duration_ms"]
            for r in filter_by_meta(media, media_type="video").collect()}
    expected = sum((d - 1) // 1000 + 1 for d in vids.values())
    assert len(rows) == expected
    assert all(len(r["frame_features"]) == 64 for r in rows)
    per_vid = {r["media_id"] for r in rows}
    assert per_vid == set(vids)


def test_resize_updates_meta_only(media):
    out = resize_stub(media, 320, 240).limit(1).collect()[0]
    assert out["meta"]["width"] == 320 and out["meta"]["height"] == 240
    assert out["payload"] is not None


def test_decoder_hook_swappable(spark):
    m = synthetic_media(spark, 3, seed=1)
    try:
        set_decoder(lambda payload, meta: np.ones(8))
        feats = extract_features(m, dim=8).collect()
        assert all(np.allclose(r["features"], 1.0) for r in feats)
    finally:
        set_decoder(_default_decode)


def _ppm(w, h, px):
    """P6 bytes for a list of (r,g,b) rows."""
    body = bytes(v for row in px for rgb in row for v in rgb)
    return f"P6\n# test\n{w} {h}\n255\n".encode() + body


def _bmp24(w, h, px):
    """Uncompressed 24-bit BMP (bottom-up) for px[row][col] = (r,g,b)."""
    import struct
    stride = (w * 3 + 3) & ~3
    body = b""
    for r in range(h - 1, -1, -1):
        row = b"".join(bytes((b, g, rr)) for rr, g, b in px[r])
        body += row + b"\x00" * (stride - w * 3)
    header = (b"BM" + struct.pack("<IHHI", 54 + len(body), 0, 0, 54)
              + struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0,
                            len(body), 2835, 2835, 0, 0))
    return header + body


def _wav16(samples):
    import struct
    data = b"".join(struct.pack("<h", s) for s in samples)
    fmt = struct.pack("<HHIIHH", 1, 1, 8000, 16000, 2, 16)
    return (b"RIFF" + struct.pack("<I", 36 + len(data)) + b"WAVE"
            + b"fmt " + struct.pack("<I", 16) + fmt
            + b"data" + struct.pack("<I", len(data)) + data)


def test_mediamini_real_decoders():
    from knowledge_graph_studio_spark.mediamini import decode, sniff

    px = [[(255, 0, 0), (0, 255, 0)], [(0, 0, 255), (255, 255, 255)]]
    ppm = _ppm(2, 2, px)
    assert sniff(ppm) == "ppm"
    got = decode(ppm)
    exp = np.array([v for row in px for rgb in row for v in rgb]) / 255.0
    assert np.allclose(got, exp)

    bmp = _bmp24(2, 2, px)
    assert sniff(bmp) == "bmp"
    assert np.allclose(decode(bmp), exp)  # same pixels, RGB order, top-down

    wav = _wav16([0, 16384, -16384, 32767])
    assert sniff(wav) == "wav"
    got_w = decode(wav)
    assert np.allclose(got_w, [0.0, 0.5, -0.5, 32767 / 32768.0])

    assert decode(b"\x89PNG\r\n") is None  # unsupported -> caller fallback


def test_extract_features_real_codec_end_to_end(spark):
    """A real PPM payload flows through the Arrow-batched feature extractor;
    features equal the numpy mean-pool of the true pixel values."""
    px = [[(10 * r + c, 0, 255) for c in range(4)] for r in range(4)]
    payload = _ppm(4, 4, px)
    rows = [("img0", "u", payload,
             {"media_type": "image", "codec": "ppm", "width": 4, "height": 4,
              "duration_ms": None, "n_bytes": len(payload)})]
    from knowledge_graph_studio_spark.operators.multimodal import MEDIA_SCHEMA
    media = spark.createDataFrame(rows, MEDIA_SCHEMA)
    feats = extract_features(media, dim=8).collect()[0]["features"]
    arr = np.array([v for row in px for rgb in row for v in rgb]) / 255.0
    pads = (-len(arr)) % 8
    exp = np.pad(arr, (0, pads)).reshape(8, -1).mean(axis=1)
    assert np.allclose(feats, exp, atol=1e-6)


# --- perceptual-hash image near-dup ----------------------------------------


def _img_row(mid, px, w, h):
    payload = _ppm(w, h, px)
    return (mid, "u", payload,
            {"media_type": "image", "codec": "ppm", "width": w, "height": h,
             "duration_ms": None, "n_bytes": len(payload)})


def _checker(w, h, phase=0, blotch=None):
    px = [[((255, 255, 255) if (r + c + phase) % 2 else (0, 0, 0))
           for c in range(w)] for r in range(h)]
    if blotch:
        r, c = blotch
        px[r][c] = (128, 128, 128)
    return px


def _py_ahash(px, w, h, grid=8):
    gray = np.array([[sum(px[r][c]) / 3 / 255 for c in range(w)]
                     for r in range(h)])
    cells = np.empty((grid, grid))
    for i in range(grid):
        r0, r1 = (i * h) // grid, max(((i + 1) * h) // grid,
                                      (i * h) // grid + 1)
        for j in range(grid):
            c0 = (j * w) // grid
            c1 = max(((j + 1) * w) // grid, c0 + 1)
            cells[i, j] = gray[r0:r1, c0:c1].mean()
    val = 0
    for b in (cells > cells.mean()).flatten():
        val = (val << 1) | int(b)
    return int(np.uint64(val).astype(np.int64))


def test_phash_signature_matches_reference_and_is_robust(spark):
    from knowledge_graph_studio_spark.operators.multimodal import (
        MEDIA_SCHEMA, phash_signatures,
    )

    w = h = 16
    rng = np.random.RandomState(3)
    base = [[tuple(rng.randint(0, 256, 3)) for _ in range(w)]
            for _ in range(h)]
    tweaked = [row[:] for row in base]
    tweaked[0][0] = (0, 0, 0)  # one-pixel edit
    rows = [_img_row("a", base, w, h), _img_row("a2", tweaked, w, h),
            _img_row("b", _checker(w, h), w, h)]
    media = spark.createDataFrame(rows, MEDIA_SCHEMA)
    sigs = {r["media_id"]: r["phash"]
            for r in phash_signatures(media).collect()}
    assert sigs["a"] == _py_ahash(base, w, h)
    ham_edit = bin(sigs["a"] ^ sigs["a2"]).count("1")
    ham_diff = bin(sigs["a"] ^ sigs["b"]).count("1")
    assert ham_edit <= 2 < ham_diff  # edit-robust, discriminative


def test_phash_neardup_pairs_banding_equals_bruteforce(spark):
    from knowledge_graph_studio_spark.operators.multimodal import (
        MEDIA_SCHEMA, phash_neardup_pairs, phash_signatures,
    )

    w = h = 16
    rng = np.random.RandomState(11)
    rows = []
    for fam in range(6):
        base = [[tuple(rng.randint(0, 256, 3)) for _ in range(w)]
                for _ in range(h)]
        rows.append(_img_row(f"f{fam}_0", base, w, h))
        near = [r[:] for r in base]
        near[fam][fam] = (255, 255, 255)
        rows.append(_img_row(f"f{fam}_1", near, w, h))
    media = spark.createDataFrame(rows, MEDIA_SCHEMA)
    got = {(r["ma"], r["mb"], r["hamming"])
           for r in phash_neardup_pairs(media, max_hamming=3).collect()}
    sigs = {r["media_id"]: r["phash"]
            for r in phash_signatures(media).collect()}
    want = set()
    ids = sorted(sigs)
    for i, a in enumerate(ids):
        for b in ids[i + 1:]:
            hm = bin((sigs[a] ^ sigs[b]) & (2**64 - 1)).count("1")
            if hm <= 3:
                want.add((a, b, hm))
    assert got == want  # pigeonhole: banding is EXACT for hamming <= 3
    # every planted near-pair is found
    assert all(any(p[0] == f"f{i}_0" and p[1] == f"f{i}_1" for p in got)
               for i in range(6))


def test_audio_fingerprint_neardup(spark):
    from knowledge_graph_studio_spark.operators.multimodal import (
        MEDIA_SCHEMA, audio_fingerprints, audio_neardup_pairs,
    )

    def _wav_row(mid, samples):
        payload = _wav16([int(s * 32767) for s in np.clip(samples, -1, 1)])
        return (mid, "u", payload,
                {"media_type": "audio", "codec": "wav", "width": None,
                 "height": None, "duration_ms": len(samples),
                 "n_bytes": len(payload)})

    n = 2048
    t = np.arange(n)
    tone = (0.5 * np.sin(2 * np.pi * 5 * t / n)
            + 0.3 * np.sin(2 * np.pi * 50 * t / n))
    # near-dup: same content, half the amplitude + tiny noise
    rng = np.random.RandomState(5)
    scaled = 0.5 * tone + 0.001 * rng.randn(n)
    other = 0.5 * np.sin(2 * np.pi * 200 * t / n) \
        + 0.4 * np.sin(2 * np.pi * 17 * t / n)
    media = spark.createDataFrame(
        [_wav_row("x", tone), _wav_row("x2", scaled), _wav_row("y", other)],
        MEDIA_SCHEMA)
    sigs = {r["media_id"]: r["afp"]
            for r in audio_fingerprints(media).collect()}
    assert len(sigs) == 3 and all(v is not None for v in sigs.values())
    ham = lambda a, b: bin((sigs[a] ^ sigs[b]) & (2**64 - 1)).count("1")
    assert ham("x", "x2") <= 3 < ham("x", "y")  # scale-invariant, selective
    pairs = {(r["ma"], r["mb"]) for r in
             audio_neardup_pairs(media, max_hamming=3).collect()}
    assert ("x", "x2") in pairs
    assert not any("y" in p for p in pairs)
