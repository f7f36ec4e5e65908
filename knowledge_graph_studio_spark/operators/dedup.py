"""Deduplication operators for web-scale training-data pipelines.

Four families, each a standard technique re-expressed Spark-native:
  * exact            hash-groupBy (driver_contract.q_dedup_exact)
  * n-gram Jaccard   inverted-index shingle join (driver_contract.q_dedup_ngram_jaccard)
  * MinHash + LSH    shingle -> k minhashes -> banded bucket join (here)
  * SimHash          64-bit sign-of-weighted-bit-sums signature (here)

Everything is native Column API — xxhash64 for all hashing (JVM-side,
deterministic across runs/executors), no Python in the hot path.

Scale notes:
  * MinHash signatures are k=64 per-group MIN aggregates over the shingle
    inverted index — one shuffle on doc_id, map-side partial min.
  * LSH banding emits (band_id, band_hash) keys; candidate pairs come from
    within-bucket pair expansion with a bucket-size cap (giant buckets =
    boilerplate/template text at web scale; capping them is standard practice
    and the cap is explicit + logged, not silent).
  * Near-dup verification joins candidates back to exact Jaccard — candidates
    only, never all-pairs.
"""

from __future__ import annotations

import logging

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

_LOG = logging.getLogger(__name__)


def token_shingles(df: DataFrame, id_col: str = "doc_id", text_col: str = "text",
                   k: int = 3) -> DataFrame:
    """distinct k-token shingles per doc (native sequence/transform).
    Tokens are materialized as a column first — lambda bodies get no
    common-subexpression elimination, so referencing split() inside the
    transform would re-split the text ~k*|tokens| times per row (see
    textstats.shingles)."""
    src = df.select(F.col(id_col).alias("doc_id"),
                    F.split(F.col(text_col), " ").alias("_toks"))
    toks = F.col("_toks")
    # guard: sequence(1, 0) is DESCENDING [1, 0] in Spark, so a doc with
    # fewer than k tokens must short-circuit to an empty index list (the
    # old greatest(..., 0) floor produced [1, 0] and an out-of-bounds
    # element_at under ANSI for every sub-k-token document)
    idx = F.when(
        F.size(toks) >= k, F.sequence(F.lit(1), F.size(toks) - (k - 1))
    ).otherwise(F.array().cast("array<int>"))
    sh = F.transform(
        idx, lambda i: F.concat_ws("_", *[F.element_at(toks, i + j) for j in range(k)])
    )
    return src.select("doc_id", F.explode(F.array_distinct(sh)).alias("shingle"))


def cap_shingle_df(sh: DataFrame, max_df: int, log: bool = True) -> DataFrame:
    """Hot-shingle guard: drop shingles whose document frequency exceeds
    ``max_df``. A shingle shared by f docs creates ~f^2/2 candidate pairs in
    any inverted-index join — one boilerplate/template shingle at web scale
    is a quadratic skew bomb. Dropping ultra-common shingles barely moves
    Jaccard for genuine near-dups (a boilerplate shingle inflates
    intersection and union together) and is standard stop-shingle practice.

    Not silent: with log=True the hot set itself is collected in ONE pass
    over the frequency aggregation (it is driver-sized by construction —
    at most total_occurrences/max_df entries, the same set a broadcast
    build ships to every executor anyway), its stats logged, and the
    filter applied as a broadcast LEFT ANTI against the collected literal.
    r6: the previous shape ran the groupBy TWICE — once eagerly for the
    stats collect, once lazily as the anti-join's broadcast build (guide
    §2.4: remove duplicated passes). With log=False nothing is collected
    and the single lazy aggregation feeds the broadcast directly (the
    collapse paths call it this way over un-checkpointed rep shingles,
    where an eager probe would force a second shingle generation)."""
    dfreq = sh.groupBy("shingle").agg(F.count("*").alias("df"))
    hot = dfreq.filter(F.col("df") > max_df)
    if log:
        rows = hot.collect()  # ONE pass: stats + the broadcast set
        if rows:
            _LOG.warning(
                "cap_shingle_df: dropping %d shingles with df > %d (worst df %d)",
                len(rows), max_df, max(r["df"] for r in rows))
        else:
            _LOG.info("cap_shingle_df: cap %d did not bind", max_df)
        spark = sh.sparkSession
        dt = sh.schema["shingle"].dataType
        from ..functions.literals import LITERAL_DF_MAX_ROWS
        if len(rows) > LITERAL_DF_MAX_ROWS:
            # plan-size guard: a very hot corpus can exceed what a Catalyst
            # literal should carry — fall back to the lazy broadcast build
            # (second aggregation pass, but bounded plan)
            return sh.join(F.broadcast(hot.select("shingle")),
                           "shingle", "left_anti")
        if rows:
            # one JVM-literal relation, every element cast to the shingle
            # column's exact type (a 64-bit hash that happens to fit an int
            # would otherwise type-drift the literal)
            vals = F.array(*[F.lit(r["shingle"]).cast(dt) for r in rows])
            hot_lit = (spark.range(0, 1, 1, 1)
                       .select(F.explode(vals).alias("shingle")))
        else:  # typed empty literal (hash family may be long or string)
            hot_lit = spark.createDataFrame(
                [], T.StructType([T.StructField("shingle", dt)]))
        return sh.join(F.broadcast(hot_lit), "shingle", "left_anti")
    return sh.join(F.broadcast(hot.select("shingle")), "shingle", "left_anti")


def duplicate_rate(df: DataFrame, content_col: str, cells: int = 4,
                   min_sample: int = 1000) -> float:
    """Cheap verbatim-duplicate-rate probe (VERDICT r3 #3): hash the content
    column once and measure 1 - distinct/count over a CONTENT-CLOSED sample
    — the cell ``hash % cells == 0``. Sampling by content hash keeps every
    member of a duplicate group together, so the cell's duplicate rate is an
    unbiased estimate of the corpus rate (a row-wise Bernoulli sample would
    split groups across the boundary and underestimate ~1/cells-fold).
    Falls back to the full table when the cell is too small to read.

    r6: ONE probe job in the common case, with a 2-exchange plan — the
    previous count_distinct formulation planned an Expand + 3 exchanges
    (measured 1.5 s of pure stage latency on a 2,000-row probe). Cell
    membership is a function of the hash, so grouping by
    (in_cell, hash-or-sentinel) shuffles ONLY the cell's distinct hashes
    (non-cell rows fold to one sentinel row per map task — the same
    shuffle profile as the old cell-only pass), and one tiny second
    aggregation over the grouped frame yields cell count, cell distinct
    and the full count together. Only when the cell IS too small does a
    second (tiny-table by definition) job compute the full distinct. The
    returned estimate is numerically identical to the two-pass version in
    both branches."""
    s = df.select(F.xxhash64(content_col).alias("_h"))
    in_cell = F.pmod("_h", F.lit(cells)) == 0
    g = s.groupBy(
        in_cell.alias("_f"),
        F.when(in_cell, F.col("_h")).otherwise(F.lit(0)).alias("_k"),
    ).agg(F.count("*").alias("c"))
    row = g.agg(
        F.sum(F.when(F.col("_f"), F.col("c"))).alias("n"),
        F.count(F.when(F.col("_f"), 1)).alias("d"),
        F.sum("c").alias("n_all"),
    ).collect()[0]
    n, d = row["n"] or 0, row["d"]
    if n < min_sample:
        n = row["n_all"] or 0
        d = s.agg(F.count_distinct("_h").alias("d")).collect()[0]["d"]
    if not n:
        return 0.0
    return 1.0 - d / n


# Duplicate rate at or above which the verbatim collapse pays for itself:
# below it the collapse is a constant ~0.3-0.9s/query overhead for nothing
# (the r3 bench regressions on the duplicate-free SF corpora); above it,
# k verbatim copies inflate bucket pair expansion k^2-fold (BENCH_sf16:
# 2.6-4.7x wall degradation at 16x tiling). The probe costs one slim hash
# pass over ~1/4 of the data — far below either side of that trade.
AUTO_COLLAPSE_MIN_DUP_RATE = 0.02


def resolve_collapse(df: DataFrame, collapse_exact, content_col: str,
                     threshold: float = AUTO_COLLAPSE_MIN_DUP_RATE) -> bool:
    """Resolve a ``collapse_exact`` knob that may be True/False/"auto".
    "auto" probes the sampled duplicate rate and collapses only when it can
    bind (>= threshold)."""
    if collapse_exact == "auto":
        return duplicate_rate(df, content_col) >= threshold
    return bool(collapse_exact)


def _collapse_verbatim(df: DataFrame, id_col: str, text_col: str):
    """Collapse byte-identical texts to one representative (min id) before
    bucket-based candidate generation. Returns (reps, mem):
    reps — one row per distinct text: (id_col=rep id, text_col, _n members);
    mem — (rep, member id) mapping for pair re-expansion.

    Rationale (BENCH_sf16): crawls repeat documents verbatim; k copies land
    in identical LSH buckets, multiplying within-bucket pair expansion by
    k^2 and pushing buckets over the max_bucket drop guard — collapsing
    first shrinks buckets back to distinct-content size AND makes duplicate
    recall exact instead of bucket-dependent."""
    # slim checksum frame computed once (48 bytes/row) and shared by the rep
    # election and the membership join; rep texts fetched back by id join —
    # never materialize or re-hash the text column twice
    ck = df.select(F.col(id_col).alias("_mid"),
                   F.md5(F.col(text_col)).alias("_ck")) \
           .localCheckpoint(eager=False)
    grp = ck.groupBy("_ck").agg(
        F.min("_mid").alias("_rep"), F.count("*").alias("_n"))
    reps = grp.join(
        df.select(F.col(id_col).alias("_rep"), F.col(text_col)), "_rep") \
        .select(F.col("_rep").alias(id_col), text_col, "_n")
    mem = ck.join(grp.select("_ck", "_rep"), "_ck").select("_rep", "_mid")
    return reps, mem


def _expand_verified_pairs(rep_out: DataFrame, mem: DataFrame,
                           reps: DataFrame, rep_sz: DataFrame,
                           id_col: str) -> DataFrame:
    """Shared expansion for the VERIFIED (da, db, common, union_size) shape
    (minhash_neardup_pairs / ngram_jaccard_pairs with collapse_exact):
    cross-content rows carry the representative pair's counts (identical
    content per member); intra-duplicate rows emit Jaccard exactly 1 using
    the rep's capped shingle count from ``rep_sz`` (doc_id, _nsh), skipping
    shingle-less content (which the uncollapsed join can never emit)."""
    cross = (
        rep_out
        .join(mem.select(F.col("_rep").alias("da"),
                         F.col("_mid").alias("_ia")), "da")
        .join(mem.select(F.col("_rep").alias("db"),
                         F.col("_mid").alias("_ib")), "db")
        .select(F.least("_ia", "_ib").alias("da"),
                F.greatest("_ia", "_ib").alias("db"),
                "common", "union_size"))
    dup_mem = (
        mem.join(reps.filter(F.col("_n") >= 2)
                 .select(F.col(id_col).alias("_rep")), "_rep")
        .join(rep_sz.filter(F.col("_nsh") >= 1)
              .select(F.col("doc_id").alias("_rep"), "_nsh"), "_rep"))
    x, y = dup_mem.alias("x"), dup_mem.alias("y")
    intra = (
        x.join(y, (F.col("x._rep") == F.col("y._rep"))
               & (F.col("x._mid") < F.col("y._mid")))
        .select(F.col("x._mid").alias("da"), F.col("y._mid").alias("db"),
                F.col("x._nsh").alias("common"),
                F.col("x._nsh").alias("union_size")))
    return cross.unionByName(intra)


def _expand_rep_pairs(rep_pairs: DataFrame, mem: DataFrame,
                      dup_reps: DataFrame, a_col: str, b_col: str) -> DataFrame:
    """(rep_a, rep_b) pairs -> member-level pairs: cross-content pairs via
    two membership joins, intra-content pairs (identical text => always
    near-dup) for representatives in ``dup_reps`` (callers pass only groups
    whose content actually participates, e.g. has >= 1 shingle, mirroring
    what the uncollapsed path could have emitted)."""
    cross = (
        rep_pairs
        .join(mem.select(F.col("_rep").alias(a_col),
                         F.col("_mid").alias("_ia")), a_col)
        .join(mem.select(F.col("_rep").alias(b_col),
                         F.col("_mid").alias("_ib")), b_col)
        .select(F.least("_ia", "_ib").alias(a_col),
                F.greatest("_ia", "_ib").alias(b_col))
    )
    dup_mem = mem.join(dup_reps.select("_rep"), "_rep")
    x, y = dup_mem.alias("x"), dup_mem.alias("y")
    intra = (
        x.join(y, (F.col("x._rep") == F.col("y._rep"))
               & (F.col("x._mid") < F.col("y._mid")))
        .select(F.col("x._mid").alias(a_col), F.col("y._mid").alias(b_col))
    )
    return cross.unionByName(intra)


MINHASH_P = (1 << 31) - 1


def minhash_params(num_hashes: int = 64) -> list[tuple[int, int]]:
    """The deterministic universal-hash family (a_i, b_i) over the Mersenne
    prime MINHASH_P — module-level so the DuckDB oracle can embed the same
    constants (driver_contract)."""
    p = MINHASH_P
    params = []
    s = 0x9E3779B9
    for _ in range(num_hashes):
        s = (s * 1103515245 + 12345) % (1 << 31)
        a = s % (p - 1) + 1
        s = (s * 1103515245 + 12345) % (1 << 31)
        b = s % p
        params.append((a, b))
    return params


def minhash_signatures(shingles: DataFrame, num_hashes: int = 64,
                       hash_fn: str = "xxhash64",
                       pre_hashed: bool = False) -> DataFrame:
    """(doc_id, sig: array<bigint>[num_hashes]) — universal-hash minhash
    family over the Mersenne prime p = 2^31 - 1:
    sig[i] = min over shingles of (a_i * h + b_i) mod p, h = hash mod p.

    The base hash is computed ONCE per shingle row; the k variants are three
    integer ops each (JVM codegen, products < 2^62 so ANSI-safe), not k string
    hashes. One groupBy with k parallel MIN aggregates — map-side combinable.
    ``hash_fn``: "xxhash64" (production default) or "md5_60" (bit-identical
    in DuckDB — the oracle-checkable family, see _token_hash).
    ``pre_hashed=True`` takes a frame whose ``shingle`` column already holds
    ``_token_hash(shingle, hash_fn)`` values (the verified-pair path shares
    one checkpointed hashed shingle index between banding and verification —
    ``pmod`` of the stored hash is bit-identical to hashing here)."""
    p = MINHASH_P
    params = minhash_params(num_hashes)
    base = shingles.select(
        "doc_id", F.pmod(F.col("shingle") if pre_hashed
                         else _token_hash(F.col("shingle"), hash_fn),
                         F.lit(p)).alias("_h"))
    aggs = [
        F.min(F.pmod(F.col("_h") * F.lit(a) + F.lit(b), F.lit(p))).alias(f"_m{i}")
        for i, (a, b) in enumerate(params)
    ]
    sig = base.groupBy("doc_id").agg(*aggs)
    return sig.select(
        "doc_id",
        F.array(*[F.col(f"_m{i}") for i in range(num_hashes)]).alias("sig"),
    )


def lsh_bands(signatures: DataFrame, bands: int = 16, rows: int = 4,
              band_key: str = "xxhash64") -> DataFrame:
    """Band the signature: (doc_id, band_id, band_hash). bands*rows must equal
    the signature length. ``band_key``: "xxhash64" compresses the band to a
    long (cheapest shuffle key, production default); "concat" keeps the raw
    joined string — equality semantics are identical and the string form is
    reproducible in SQL (the oracle family)."""
    def _key(b):
        joined = F.concat_ws(
            "_",
            F.transform(F.slice(F.col("sig"), b * rows + 1, rows),
                        lambda x: x.cast("string")))
        return (F.xxhash64(joined) if band_key == "xxhash64"
                else joined).alias("band_hash")

    out = signatures.select(
        "doc_id",
        F.explode(
            F.array(*[F.struct(F.lit(b).alias("band_id"), _key(b))
                      for b in range(bands)])
        ).alias("bb"),
    )
    return out.select("doc_id", "bb.band_id", "bb.band_hash")


def minhash_lsh_candidates(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_hashes: int = 64,
    bands: int = 16,
    rows: int = 4,
    shingle_k: int = 3,
    max_bucket: int = 200,
    collapse_exact: bool = False,
    hash_fn: str = "xxhash64",
    band_key: str = "xxhash64",
) -> DataFrame:
    """Near-duplicate candidate pairs (da < db) via MinHash LSH.

    Buckets larger than ``max_bucket`` are dropped (web-scale template-text
    guard; at SF nothing approaches the cap). ``collapse_exact`` dedups
    byte-identical texts first and re-expands pairs afterward (see
    _collapse_verbatim) — the production default for crawl corpora; pass
    "auto" to probe the duplicate rate first and collapse only when it can
    bind (resolve_collapse — VERDICT r3 #3: the collapse is pure overhead
    on duplicate-free corpora).
    ``hash_fn``/``band_key``: "md5_60"/"concat" switch both hash stages to
    the SQL-reproducible family (oracle pairing); bucketing semantics are
    unchanged."""
    assert bands * rows == num_hashes
    collapse_exact = resolve_collapse(df, collapse_exact, text_col)
    if collapse_exact:
        reps, mem = _collapse_verbatim(df, id_col, text_col)
        rep_pairs = minhash_lsh_candidates(
            reps, id_col, text_col, num_hashes, bands, rows, shingle_k,
            max_bucket, collapse_exact=False,
            hash_fn=hash_fn, band_key=band_key)
        # intra pairs only for content the banding could see at all
        # (>= 1 shingle, i.e. >= shingle_k tokens)
        shingled = (token_shingles(reps.filter(F.col("_n") >= 2),
                                   id_col, text_col, k=shingle_k)
                    .select(F.col("doc_id").alias("_rep")).distinct())
        return _expand_rep_pairs(rep_pairs, mem, shingled, "da", "db") \
            .distinct()
    sh = token_shingles(df, id_col, text_col, k=shingle_k)
    sig = minhash_signatures(sh, num_hashes=num_hashes, hash_fn=hash_fn)
    return _lsh_bucket_pairs(sig, bands, rows, max_bucket, band_key)


def _lsh_bucket_pairs(sig: DataFrame, bands: int, rows: int,
                      max_bucket: int, band_key: str) -> DataFrame:
    """Signatures -> banded buckets -> distinct within-bucket (da < db)
    pairs, with oversized buckets dropped (the shared tail of
    minhash_lsh_candidates and the verified-pair fast path)."""
    banded = lsh_bands(sig, bands=bands, rows=rows, band_key=band_key)
    buckets = (
        banded.groupBy("band_id", "band_hash")
        .agg(F.array_sort(F.collect_set("doc_id")).alias("members"))
        .filter((F.size("members") >= 2) & (F.size("members") <= max_bucket))
    )
    pairs = buckets.select(
        F.explode(
            F.flatten(
                F.transform(
                    F.col("members"),
                    lambda a, i: F.transform(
                        F.slice(F.col("members"), i + 2,
                                F.greatest(F.size("members") - i - 1, F.lit(0))),
                        lambda b: F.struct(a.alias("da"), b.alias("db")),
                    ),
                )
            )
        ).alias("p")
    )
    return pairs.select("p.da", "p.db").distinct()


def minhash_neardup_pairs(
    df: DataFrame, jaccard_threshold: float = 0.5,
    max_shingle_df: int = 1000, collapse_exact: bool = False, **kw
) -> DataFrame:
    """LSH candidates verified by exact shingle Jaccard (candidates-only join,
    the scale-correct version of the all-pairs oracle). The verification join
    goes back through the raw shingle index, so it gets the same hot-shingle
    document-frequency cap as the exact path (cap_shingle_df — logged, not
    silent); sizes are computed over the capped shingle universe so Jaccard
    stays consistent.

    ``collapse_exact`` collapses byte-identical texts BEFORE both banding and
    verification: representatives are verified once and the verdict is
    expanded to members afterward (k verbatim copies would otherwise inflate
    the verification join k^2-fold). Intra-duplicate pairs are emitted with
    Jaccard exactly 1 (common == union == the rep's capped shingle count,
    skipped when that is 0 — a shingle-less doc can never verify in the
    uncollapsed path either). Note the shingle df cap then counts document
    frequency over DISTINCT content, not copies — the more meaningful
    reading on a duplicated corpus (a template shared by k mirror copies is
    not k times hotter). "auto" probes the duplicate rate first
    (resolve_collapse)."""
    collapse_exact = resolve_collapse(
        df, collapse_exact, kw.get("text_col", "text"))
    if collapse_exact:
        id_col = kw.get("id_col", "doc_id")
        text_col = kw.get("text_col", "text")
        reps, mem = _collapse_verbatim(df, id_col, text_col)
        # the verified core hands back the capped hashed shingle index it
        # verified against, so the intra-duplicate size table shares it
        # instead of re-shingling the representatives (r6)
        rep_out, rep_sh = _minhash_verified_pairs(
            reps, jaccard_threshold, max_shingle_df, **kw)
        rep_sz = rep_sh.groupBy("doc_id").agg(F.count("*").alias("_nsh"))
        return _expand_verified_pairs(rep_out, mem, reps, rep_sz, id_col)
    out, _ = _minhash_verified_pairs(df, jaccard_threshold,
                                     max_shingle_df, **kw)
    return out


def _minhash_verified_pairs(
    df: DataFrame, jaccard_threshold: float, max_shingle_df: int | None,
    **kw,
) -> tuple[DataFrame, DataFrame]:
    """Uncollapsed core of minhash_neardup_pairs; returns ``(verified_pairs,
    capped_sh)`` where capped_sh is the (doc_id, xxhash64-shingle) index the
    verification ran over (collapse callers derive per-rep sizes from it).

    r6 (guide §2.4, remove duplicated passes): with the default xxhash64
    family the banding signatures are derived from the SAME checkpointed
    hashed shingle index as the verification join — ``pmod(stored_hash, p)``
    is bit-identical to hashing inside minhash_signatures — so the corpus
    is tokenized+shingled ONCE per query instead of twice. The md5_60
    oracle family keeps the separate candidate pass (its banding hash is
    not the verification key's xxhash64)."""
    id_col = kw.get("id_col", "doc_id")
    text_col = kw.get("text_col", "text")
    shingle_k = kw.get("shingle_k", 3)
    hash_fn = kw.get("hash_fn", "xxhash64")
    # 64-bit hash key first (cheaper join compare, collision odds ~m^2/2^65),
    # then localCheckpoint ONCE pre-cap: compute-once without a CacheManager
    # leak (see driver_contract.q_dedup_ngram_jaccard).
    sh = (
        token_shingles(df, id_col, text_col, k=shingle_k)
        .select("doc_id", F.xxhash64("shingle").alias("shingle"))
        .localCheckpoint(eager=False)
    )
    if hash_fn == "xxhash64":
        num_hashes = kw.get("num_hashes", 64)
        bands = kw.get("bands", 16)
        rows = kw.get("rows", 4)
        assert bands * rows == num_hashes
        sig = minhash_signatures(sh, num_hashes=num_hashes,
                                 hash_fn=hash_fn, pre_hashed=True)
        cands = _lsh_bucket_pairs(sig, bands, rows,
                                  kw.get("max_bucket", 200),
                                  kw.get("band_key", "xxhash64"))
    else:
        cands = minhash_lsh_candidates(df, **kw)
    if max_shingle_df is not None:
        sh = cap_shingle_df(sh, max_shingle_df)
    sz = sh.groupBy("doc_id").agg(F.count("*").alias("n"))
    a = sh.select(F.col("doc_id").alias("da"), "shingle")
    b = sh.select(F.col("doc_id").alias("db"), "shingle")
    common = (
        cands.join(a, "da").join(b, ["db", "shingle"])
        .groupBy("da", "db").agg(F.count("*").alias("common"))
    )
    out = (
        common.join(sz.select(F.col("doc_id").alias("da"), F.col("n").alias("na")), "da")
        .join(sz.select(F.col("doc_id").alias("db"), F.col("n").alias("nb")), "db")
        .withColumn("union_size", F.col("na") + F.col("nb") - F.col("common"))
        .filter(F.col("common") >= F.lit(jaccard_threshold) * F.col("union_size"))
    )
    return out.select("da", "db", "common", "union_size"), sh


def simhash_neardup_pairs(
    df: DataFrame, max_hamming: int = 3,
    id_col: str = "doc_id", text_col: str = "text",
    band_bits: int = 15, bits: int = 60, hash_fn: str = "xxhash64",
    max_bucket: int = 1000, collapse_exact: bool = False,
) -> DataFrame:
    """(da, db, hamming) pairs whose simhash signatures differ in at most
    ``max_hamming`` bits — banded blocking + exact verification.

    Recall guarantee by pigeonhole: with n_bands = bits/band_bits bands, two
    signatures within hamming n_bands-1 leave at least one band untouched,
    so they collide in >= 1 bucket — the default 4x15 over 60 bits makes
    max_hamming <= 3 EXACT, not approximate. Buckets above ``max_bucket``
    are dropped (the simhash analog of the hot-shingle guard). Verification
    is one bit_count(xor) per candidate — no token data moves, only 8-byte
    signatures.

    ``collapse_exact``: identical texts have identical signatures, so k
    verbatim copies multiply every bucket they touch by k — collapse to
    representatives first and expand after, intra-duplicate pairs at
    hamming 0 (same construction as the other dedup families); "auto"
    probes the duplicate rate first (resolve_collapse)."""
    assert max_hamming <= bits // band_bits - 1, \
        "banding only guarantees recall for hamming <= n_bands - 1"
    collapse_exact = resolve_collapse(df, collapse_exact, text_col)
    if collapse_exact:
        reps, mem = _collapse_verbatim(df, id_col, text_col)
        rep_out = simhash_neardup_pairs(
            reps, max_hamming, id_col, text_col, band_bits, bits, hash_fn,
            max_bucket, collapse_exact=False)
        cross = (
            rep_out
            .join(mem.select(F.col("_rep").alias("da"),
                             F.col("_mid").alias("_ia")), "da")
            .join(mem.select(F.col("_rep").alias("db"),
                             F.col("_mid").alias("_ib")), "db")
            .select(F.least("_ia", "_ib").alias("da"),
                    F.greatest("_ia", "_ib").alias("db"), "hamming"))
        # null-text groups have no signature (explode of split(null) is
        # empty), so the uncollapsed path can never pair them — exclude
        # them from intra expansion too
        dup_mem = mem.join(
            reps.filter((F.col("_n") >= 2) & F.col(text_col).isNotNull())
            .select(F.col(id_col).alias("_rep")), "_rep")
        x, y = dup_mem.alias("x"), dup_mem.alias("y")
        intra = (
            x.join(y, (F.col("x._rep") == F.col("y._rep"))
                   & (F.col("x._mid") < F.col("y._mid")))
            .select(F.col("x._mid").alias("da"), F.col("y._mid").alias("db"),
                    F.lit(0).cast("int").alias("hamming")))
        return cross.unionByName(intra)
    b = simhash_buckets(df, id_col, text_col, band_bits=band_bits,
                        bits=bits, hash_fn=hash_fn)
    sized = (b.groupBy("band_id", "band_key")
             .agg(F.count("*").alias("_n"))
             .filter((F.col("_n") >= 2) & (F.col("_n") <= max_bucket))
             .select("band_id", "band_key"))
    m = b.join(sized, ["band_id", "band_key"])
    x = m.select("band_id", "band_key", F.col("doc_id").alias("da"),
                 F.col("simhash").alias("_sa"))
    y = m.select("band_id", "band_key", F.col("doc_id").alias("db"),
                 F.col("simhash").alias("_sb"))
    cands = (x.join(y, ["band_id", "band_key"])
             .filter(F.col("da") < F.col("db"))
             .select("da", "db",
                     F.bit_count(F.col("_sa").bitwiseXOR(F.col("_sb")))
                     .alias("hamming"))
             .filter(F.col("hamming") <= max_hamming))
    return cands.distinct()


def ngram_jaccard_pairs(
    df: DataFrame,
    jaccard_threshold: float = 0.5,
    max_shingle_df: int | None = 1000,
    id_col: str = "doc_id",
    text_col: str = "text",
    shingle_k: int = 3,
    collapse_exact: bool = False,
) -> DataFrame:
    """EXACT n-gram-shingle Jaccard near-dup pairs (da < db, with common /
    union_size counts) via an inverted-index self-join on the 64-bit shingle
    hash — never O(n^2) docs — behind the hot-shingle document-frequency cap
    (cap_shingle_df; see driver_contract.q_dedup_ngram_jaccard for the full
    plan commentary: hash-before-cap, one pre-cap localCheckpoint, the cap's
    broadcast LEFT ANTI stays above it for the plan gate).

    ``collapse_exact`` collapses byte-identical texts first and expands the
    verified pairs back (same construction as minhash_neardup_pairs): k
    verbatim copies otherwise multiply the posting-list self-join k^2-fold.
    EXACT pairs stay exact — identical content has Jaccard 1 by definition;
    the df cap then counts document frequency over distinct content rather
    than copies (the more meaningful reading on a duplicated corpus);
    "auto" probes the duplicate rate first (resolve_collapse)."""
    collapse_exact = resolve_collapse(df, collapse_exact, text_col)
    if collapse_exact:
        reps, mem = _collapse_verbatim(df, id_col, text_col)
        # share the verified core's capped shingle index with the
        # intra-duplicate size table instead of re-shingling the reps (r6)
        rep_out, rep_sh = _ngram_verified_pairs(
            reps, jaccard_threshold, max_shingle_df, id_col, text_col,
            shingle_k)
        rep_sz = rep_sh.groupBy("doc_id").agg(F.count("*").alias("_nsh"))
        return _expand_verified_pairs(rep_out, mem, reps, rep_sz, id_col)
    out, _ = _ngram_verified_pairs(df, jaccard_threshold, max_shingle_df,
                                   id_col, text_col, shingle_k)
    return out


def _ngram_verified_pairs(
    df: DataFrame, jaccard_threshold: float, max_shingle_df: int | None,
    id_col: str, text_col: str, shingle_k: int,
) -> tuple[DataFrame, DataFrame]:
    """Uncollapsed core of ngram_jaccard_pairs; returns ``(pairs,
    capped_sh)`` so collapse callers derive per-rep sizes from the same
    capped hashed shingle index the join ran over."""
    sh = (token_shingles(df, id_col, text_col, k=shingle_k)
          .select("doc_id", F.xxhash64("shingle").alias("shingle"))
          .localCheckpoint(eager=False))
    if max_shingle_df is not None:
        sh = cap_shingle_df(sh, max_shingle_df)
    sz = sh.groupBy("doc_id").agg(F.count("*").alias("n"))
    a, b = sh.alias("a"), sh.alias("b")
    common = (
        a.join(b, (F.col("a.shingle") == F.col("b.shingle"))
               & (F.col("a.doc_id") < F.col("b.doc_id")))
        .groupBy(F.col("a.doc_id").alias("da"), F.col("b.doc_id").alias("db"))
        .agg(F.count("*").alias("common"))
    )
    sa = sz.select(F.col("doc_id").alias("da"), F.col("n").alias("na"))
    sb = sz.select(F.col("doc_id").alias("db"), F.col("n").alias("nb"))
    out = (
        common.join(sa, "da").join(sb, "db")
        .filter(F.col("common") >= F.lit(jaccard_threshold)
                * (F.col("na") + F.col("nb") - F.col("common")))
        .select("da", "db", "common",
                (F.col("na") + F.col("nb") - F.col("common"))
                .alias("union_size"))
    )
    return out, sh


def _token_hash(col, hash_fn: str):
    """Token-hash families for simhash. "xxhash64" is the production choice
    (fastest, JVM-native). "md5_60" takes the top 60 bits of standard MD5 —
    bit-identical between Spark (conv(substr(md5, 1, 15), 16, 10)) and
    DuckDB (CAST('0x'||substr(md5, 1, 15) AS BIGINT)), which is what lets
    the contract's simhash entry be value-checked against a SQL oracle."""
    if hash_fn == "xxhash64":
        return F.xxhash64(col)
    if hash_fn == "md5_60":
        return F.conv(F.substring(F.md5(col), 1, 15), 16, 10).cast("long")
    raise ValueError(f"unknown hash_fn {hash_fn!r}")


def simhash_signatures(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text",
    bits: int = 63, hash_fn: str = "xxhash64",
) -> DataFrame:
    """SimHash over whitespace tokens: bit j of the signature is set iff
    sum over tokens of sign((hash(token) >> j) & 1) is positive.
    Default 63 bits of xxhash64 to stay in a signed bigint; pass
    bits=60, hash_fn="md5_60" for the SQL-oracle-reproducible family.

    Shape: explode tokens -> hash once -> ONE groupBy with per-bit
    literal-shift SUM aggregates (map-side combinable — the scale-correct
    form; a nested array fold would re-walk the token array bits-times per
    row and can't partial-aggregate)."""
    tok = df.select(
        F.col(id_col).alias("doc_id"),
        F.explode(F.split(F.col(text_col), " ")).alias("_t"),
    ).select("doc_id", _token_hash(F.col("_t"), hash_fn).alias("h"))
    sums = tok.groupBy("doc_id").agg(
        *[
            F.sum(
                F.when(F.shiftright(F.col("h"), j).bitwiseAND(F.lit(1)) == 1,
                       F.lit(1)).otherwise(F.lit(-1))
            ).alias(f"_b{j}")
            for j in range(bits)
        ]
    )
    sim = None
    for j in range(bits):
        term = F.when(F.col(f"_b{j}") > 0, F.lit(1 << j).cast("bigint")) \
            .otherwise(F.lit(0).cast("bigint"))
        sim = term if sim is None else sim + term
    return sums.select("doc_id", sim.alias("simhash"))


def simhash_buckets(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text",
    band_bits: int = 16, bits: int = 63, hash_fn: str = "xxhash64",
) -> DataFrame:
    """(doc_id, simhash, band_id, band_key): docs sharing any band of the
    simhash are near-dup candidates (hamming-distance blocking)."""
    sig = simhash_signatures(df, id_col, text_col, bits=bits, hash_fn=hash_fn)
    n_bands = bits // band_bits + (1 if bits % band_bits else 0)
    bandcol = F.explode(
        F.array(
            *[
                F.struct(
                    F.lit(b).alias("band_id"),
                    F.shiftright(F.col("simhash"), b * band_bits)
                    .bitwiseAND(F.lit((1 << band_bits) - 1)).alias("band_key"),
                )
                for b in range(n_bands)
            ]
        )
    )
    return sig.select("doc_id", "simhash", bandcol.alias("bb")).select(
        "doc_id", "simhash", "bb.band_id", "bb.band_key"
    )


def neardup_clusters(
    df: DataFrame,
    pairs: DataFrame | None = None,
    id_col: str = "doc_id",
    method: str = "minhash",
    **kw,
) -> DataFrame:
    """Fuzzy-duplicate CLUSTER RESOLUTION: verified near-dup pairs ->
    connected components -> ``(member, component)`` with component = the
    cluster's min ``id_col``. This is the keep-one-per-group step public
    curation pipelines run after pair generation (the RefinedWeb/FineWeb
    "fuzzy dedup" stage): transitive closure groups A,B,C whenever A~B and
    B~C even if A and C never pair directly, so one representative survives
    per template family instead of one per pairwise match.

    ``pairs`` may be any (da, db, ...) verified-pair frame (ngram Jaccard,
    minhash-verified, simhash); when None it is generated by ``method``
    ("minhash" — the 100 TB default, bucketed + capped, never all-pairs;
    "ngram" — exact, for corpora that fit the inverted-index join; "simhash")
    with ``**kw`` passed through to the generator (jaccard_threshold,
    text_col, collapse_exact, ...).

    Scale shape: CC is linking.connected_components — iterative DataFrame
    min-label joins, O(cluster diameter) rounds with lineage truncated per
    round. Near-dup clusters are template families (stars/cliques), so the
    loop converges in ~2-3 rounds; the join key is the member id, never the
    component id, so a million-copy template does not concentrate on one
    task. Docs with no near-dup pair appear in NO row (singletons are
    implicit), keeping the label table proportional to the DUPLICATED subset
    of the corpus, not the corpus.

    r6: below DRIVER_CC_MAX_PAIRS verified pairs the closure runs as
    driver-side union-find instead (the same bounded limit(N+1).collect()
    probe + fallback design as linking.canonical_mapping): the iterative
    loop costs ~4 driver-synchronized rounds (join + agg + signature probe
    each), which dominates wall clock whenever the pair table is small —
    and a SMALL pair table is the common case, because pairs are
    proportional to the duplicated subset, not the corpus. Labels are
    identical by construction (both sides label each component by its min
    member; parity law-tested in tests/test_linking.py)."""
    from .linking import (
        DRIVER_CC_MAX_PAIRS, connected_components, connected_components_driver,
    )

    if pairs is None:
        gen = {
            "minhash": minhash_neardup_pairs,
            "ngram": ngram_jaccard_pairs,
            "simhash": simhash_neardup_pairs,
        }[method]
        pairs = gen(df, id_col=id_col, **kw)
    p = pairs.select("da", "db").localCheckpoint(eager=False)
    head = p.limit(DRIVER_CC_MAX_PAIRS + 1).collect()
    if len(head) <= DRIVER_CC_MAX_PAIRS:
        comp = connected_components_driver(
            [(r["da"], r["db"]) for r in head])
        spark = pairs.sparkSession
        dt = p.schema["da"].dataType
        if not comp:
            return spark.createDataFrame(
                [], T.StructType([T.StructField("member", dt),
                                  T.StructField("component", dt)]))
        from ..functions.literals import literal_df

        lab = literal_df(spark, sorted(comp.items()),
                         ["member", "component"])
        return lab.select(F.col("member").cast(dt),
                          F.col("component").cast(dt))
    return connected_components(p, src="da", dst="db")


def neardup_dedup(
    df: DataFrame,
    pairs: DataFrame | None = None,
    id_col: str = "doc_id",
    mode: str = "drop",
    method: str = "minhash",
    clusters: DataFrame | None = None,
    **kw,
) -> DataFrame:
    """Corpus after fuzzy dedup: keep the min-``id_col`` member of every
    near-dup cluster (see neardup_clusters), pass singletons through.

    ``mode="drop"`` (default) returns ``df`` minus the non-representative
    members — ONE left-anti join on the id against the (small,
    duplicates-only) cluster table. ``mode="tag"`` returns ``df`` with
    ``component`` (own id for singletons) and ``is_neardup_copy`` columns
    instead of dropping, for audit/funnel runs. ``clusters`` short-circuits
    recomputation when the caller already resolved them."""
    cc = clusters if clusters is not None else neardup_clusters(
        df, pairs=pairs, id_col=id_col, method=method, **kw)
    if mode == "tag":
        lab = cc.select(F.col("member").alias(id_col), "component")
        return (
            df.join(lab, id_col, "left")
            .withColumn("component", F.coalesce("component", F.col(id_col)))
            .withColumn("is_neardup_copy",
                        F.col("component") != F.col(id_col))
        )
    dups = (cc.filter(F.col("member") != F.col("component"))
            .select(F.col("member").alias(id_col)))
    return df.join(dups, id_col, "left_anti")


# ---------------------------------------------------------------------------
# Incremental crawl dedup: "have we already got this document?" against a
# historical corpus, as a Bloom-style k-probe membership test. The crawl
# cadence case: yesterday's 100 TB is indexed once; today's delta is checked
# against it without ever joining content.


def _bloom_probe_array(content_col: str, m_bits: int, k: int,
                       hash_fn: str) -> F.Column:
    """Array of k probe positions in [0, m_bits) for a document's content.
    Probes hash a fixed-width digest of the content (not the content k
    times), so probe cost is one full-text hash + k cheap hashes."""
    if hash_fn == "xxhash64":
        digest = F.xxhash64(F.col(content_col))
        probes = [F.pmod(F.xxhash64(digest, F.lit(i)), F.lit(m_bits))
                  for i in range(k)]
    elif hash_fn == "md5_60":
        digest = F.md5(F.col(content_col))
        probes = [
            F.pmod(
                F.conv(F.substring(
                    F.md5(F.concat(digest, F.lit(f"#{i}"))), 1, 15), 16, 10)
                .cast("long"),
                F.lit(m_bits))
            for i in range(k)]
    else:
        raise ValueError(f"unknown hash_fn: {hash_fn}")
    return F.array(*probes)


def bloom_index_positions(
    history: DataFrame,
    content_col: str = "text",
    m_bits: int = 1 << 27,
    k: int = 5,
    hash_fn: str = "xxhash64",
) -> DataFrame:
    """The distinct set-bit positions of the history corpus's Bloom filter —
    at most min(k*|history|, m_bits) longs. Persist THIS (one narrow
    column, partitioned by pos) as the incremental-dedup index; rebuilding
    it per run re-reads the whole history, which is the thing the index
    exists to avoid."""
    return (history
            .select(F.explode(
                _bloom_probe_array(content_col, m_bits, k, hash_fn))
                .alias("pos"))
            .distinct())


def seen_before(
    new_docs: DataFrame,
    history_positions: DataFrame,
    content_col: str = "text",
    id_col: str = "doc_id",
    m_bits: int = 1 << 27,
    k: int = 5,
    hash_fn: str = "xxhash64",
    via: str = "join",
    max_driver_positions: int = 50_000_000,
    broadcast_index: bool = False,
) -> DataFrame:
    """Flag documents whose content was (probably) already in the history
    corpus: ``seen = 1`` iff ALL k probe positions are set in the history
    Bloom index. Exact-duplicate recall is 1.0 by construction (identical
    content -> identical probes); false-positive rate is the standard
    ``(1 - e^(-k*n/m))^k`` — deterministic given the hash family, so runs
    are reproducible and the contract oracle reproduces the md5_60 family
    bit-for-bit.

    Returns (id, n_probes, n_hits, seen). Two physical strategies, same
    answer (equality is law-tested):

      * ``via="join"``   explode the new docs' probes and LEFT-join the
        positions table on ``pos`` — never collects, works at any m_bits;
        AQE broadcasts the build side when the index is small.
      * ``via="bitset"`` collect the positions ONCE into an m_bits/8-byte
        numpy bitset (guarded by ``max_driver_positions``), broadcast it,
        and test probes in an Arrow-batched mapInPandas — no shuffle on the
        new-docs side at all, the right shape when the delta is huge and
        the index fits an executor (2^30 bits = 128 MB covers ~150M docs
        at k=5 with fpp<1%).
    """
    probed = new_docs.select(
        F.col(id_col),
        _bloom_probe_array(content_col, m_bits, k, hash_fn).alias("_probes"))

    if via == "join":
        ex = probed.select(
            id_col, F.explode(F.array_distinct("_probes")).alias("pos"))
        hit = history_positions.select("pos").withColumn("_hit", F.lit(1))
        if broadcast_index:
            # caller-asserted small index (parquet-backed indexes carry
            # stats and AQE converts on its own; in-memory/estimate-less
            # sources need the hint)
            hit = F.broadcast(hit)
        agg = (ex.join(hit, "pos", "left")
               .groupBy(id_col)
               .agg(F.count("*").cast("int").alias("n_probes"),
                    F.sum(F.coalesce(F.col("_hit"), F.lit(0)))
                    .cast("int").alias("n_hits")))
        return agg.withColumn(
            "seen",
            (F.col("n_hits") == F.col("n_probes")).cast("int"))

    if via == "bitset":
        import numpy as np

        rows = (history_positions.select("pos")
                .limit(max_driver_positions + 1).collect())
        if len(rows) > max_driver_positions:
            raise ValueError(
                "history Bloom index exceeds max_driver_positions; "
                "use via='join' or raise the cap")
        arr = np.zeros(m_bits, dtype=bool)
        if rows:
            arr[np.array([r["pos"] for r in rows], dtype=np.int64)] = True
        packed = np.packbits(arr)
        bc = new_docs.sparkSession.sparkContext.broadcast(packed)

        out_schema = f"{id_col} long, n_probes int, n_hits int, seen int"

        def _check(batches):
            bits = np.unpackbits(np.frombuffer(bc.value, dtype=np.uint8))
            import pandas as pd
            for pdf in batches:
                ids, n_probes, n_hits = [], [], []
                for i, probes in zip(pdf[id_col], pdf["_probes"]):
                    ps = np.unique(np.asarray(probes, dtype=np.int64))
                    ids.append(i)
                    n_probes.append(len(ps))
                    n_hits.append(int(bits[ps].sum()))
                yield pd.DataFrame({
                    id_col: ids, "n_probes": n_probes, "n_hits": n_hits,
                    "seen": [int(a == b) for a, b in zip(n_hits, n_probes)]})

        return probed.mapInPandas(_check, out_schema)

    raise ValueError(f"unknown via: {via}")


def banded_hamming_pairs(
    sigs: DataFrame,
    id_col: str = "doc_id",
    sig_col: str = "sig",
    max_hamming: int = 3,
    band_bits: int = 16,
    bits: int = 64,
    max_bucket: int = 1000,
) -> DataFrame:
    """Generic banded-hamming pairing over fixed-width integer signatures:
    (a, b, hamming) pairs within ``max_hamming`` bits, EXACT for
    ``max_hamming <= bits/band_bits - 1`` by pigeonhole (two signatures
    that close leave at least one band untouched and collide there).
    The blocking/verify engine shared by the text SimHash and the
    image/audio perceptual-hash families — only (id, 8-byte signature)
    tuples ever shuffle, and buckets above ``max_bucket`` are dropped
    (the hot-bucket guard)."""
    n_bands = bits // band_bits
    assert max_hamming <= n_bands - 1, \
        "banding only guarantees recall for hamming <= n_bands - 1"
    banded = sigs.select(
        F.col(id_col).alias("_id"), F.col(sig_col).alias("_sig"),
        F.explode(F.array(*[
            F.struct(
                F.lit(b).alias("band_id"),
                F.shiftrightunsigned(F.col(sig_col), b * band_bits)
                .bitwiseAND(F.lit((1 << band_bits) - 1)).alias("band_key"))
            for b in range(n_bands)])).alias("b")
    ).select("_id", "_sig", "b.band_id", "b.band_key")
    sized = (banded.groupBy("band_id", "band_key")
             .agg(F.count("*").alias("_n"))
             .filter((F.col("_n") >= 2) & (F.col("_n") <= max_bucket))
             .select("band_id", "band_key"))
    m = banded.join(sized, ["band_id", "band_key"])
    x = m.select("band_id", "band_key", F.col("_id").alias("a"),
                 F.col("_sig").alias("_sa"))
    y = m.select("band_id", "band_key", F.col("_id").alias("b"),
                 F.col("_sig").alias("_sb"))
    return (x.join(y, ["band_id", "band_key"])
            .filter(F.col("a") < F.col("b"))
            .select("a", "b",
                    F.bit_count(F.col("_sa").bitwiseXOR(F.col("_sb")))
                    .alias("hamming"))
            .filter(F.col("hamming") <= max_hamming)
            .distinct())


def clustering_metrics(
    assign: DataFrame,
    pred_col: str = "pred",
    truth_col: str = "truth",
    id_col: str = "id",
) -> DataFrame:
    """Pairwise clustering evaluation -> ONE row (tp, fp, fn,
    precision_x1e6, recall_x1e6, f1_x1e6): how well a predicted duplicate
    clustering (fuzzy dedup, entity resolution) recovers a ground-truth
    one, in the standard pairwise-counting formulation. ``assign`` has one
    row per item with its predicted and true cluster labels (singletons
    included, labeled by themselves).

    Pair counts come from C(n,2) over group SIZES — three aggregations
    (pred, truth, pred x truth), never a materialized pair table, so a
    10^12-item evaluation costs three shuffles of at most |items| rows.
    All arithmetic is int64 (C(n,2) = n*(n-1) div 2; ratios in the 1e6
    fixed point with div), so the result is exact, partition-invariant and
    oracle-pairable. Bound (ADVICE r5): int64 pair counts are exact while
    every SINGLE group stays under ~4.29e9 items (n*(n-1) < 2^63) and the
    summed pair count under ~9.2e18; a larger group silently wraps under
    non-ANSI arithmetic while the DuckDB oracle widens to HUGEINT. Row
    COUNTS up to 10^12 are fine — it is a >=4-billion-member duplicate
    GROUP that would overflow, far past any real clustering's group sizes
    (cap upstream generators, e.g. max_bucket, if evaluating adversarial
    labelings). ``id_col`` enforces one row per item
    (dropDuplicates) so accidental duplicate assignment rows cannot
    double-count pairs. Zero-denominator conventions: a metric with an
    empty denominator reports 1e6 (vacuously perfect), matching the usual
    ER convention for 'no pairs predicted / none to find'."""
    assign = assign.dropDuplicates([id_col])
    # lazy checkpoint: three independent aggregations read `assign`, whose
    # upstream may be expensive (e.g. a connected-components closure) —
    # without the cut it is derived three times
    assign = assign.localCheckpoint(eager=False)

    def _pairs(cols: list[str]):
        return (
            assign.groupBy(*cols).agg(F.count("*").alias("n"))
            .agg(F.coalesce(F.sum(F.expr("n * (n - 1) div 2")),
                            F.lit(0)).cast("long").alias("p"))
        )

    tp_df = _pairs([pred_col, truth_col]).withColumnRenamed("p", "tp")
    pp_df = _pairs([pred_col]).withColumnRenamed("p", "pp")
    tt_df = _pairs([truth_col]).withColumnRenamed("p", "tt")
    one = tp_df.crossJoin(pp_df).crossJoin(tt_df)
    fp = F.col("pp") - F.col("tp")
    fn = F.col("tt") - F.col("tp")
    def _ratio(num: str, den: str):
        return F.when(F.col(den) > 0, F.expr(f"(1000000 * {num}) div {den}")) \
                .otherwise(F.lit(1_000_000)).cast("long")
    return one.select(
        "tp", fp.cast("long").alias("fp"), fn.cast("long").alias("fn"),
        _ratio("tp", "pp").alias("precision_x1e6"),
        _ratio("tp", "tt").alias("recall_x1e6"),
        F.when((F.col("pp") + F.col("tt")) > 0,
               F.expr("(1000000 * 2 * tp) div (pp + tt)"))
        .otherwise(F.lit(1_000_000)).cast("long").alias("f1_x1e6"),
    )
