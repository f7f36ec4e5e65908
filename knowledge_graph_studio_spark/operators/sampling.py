"""Deterministic corpus mixing: hash-gated stratified sampling with
up-sampling — the last step of a training-data pipeline, where cleaned and
deduplicated shards are blended to target domain/language/quality weights.

The gate is pure arithmetic on a content-independent hash of the document
id, so it is exact, reproducible across runs/cluster sizes/row order, and
shuffle-free: `sample_mix` is a single codegen'd projection + filter (plus
a row-explode only for strata whose rate exceeds 1). Nothing about the
plan changes at 100 TB — there is no state, no aggregation, no join; the
realized proportions converge to the targets by the law of large numbers
per stratum (tested), and EXACT reproducibility means a mixture spec is an
auditable artifact of a training run, unlike rand()-based sampling.

Rates are interpreted as expected copies per input row:
  rate = 0      -> stratum dropped
  0 < rate <= 1 -> Bernoulli-by-hash downsample (keep iff
                   hash(id) mod DENOM < rate*DENOM)
  rate > 1      -> floor(rate) guaranteed copies + one more for the
                   hash-gated fraction (epoch-style up-sampling; the
                   output `copy` column 0..k-1 disambiguates duplicates
                   for downstream shuffling/sharding)

hash_fn="xxhash64" is the production default (one 64-bit hash, JVM-side);
"md5_60" uses the top 60 bits of md5(cast(id as string)) — bit-identical
in DuckDB via cast('0x' || substr(md5(...), 1, 15) as bigint), which is how
the contract oracle reproduces the gate exactly (same trick as the
MinHash/SimHash oracles, driver_contract._minhash_oracle_sql).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# parts-per-million rate resolution: rates are snapped to integers so the
# gate compares integers (no float threshold can sit on a hash value)
MIX_DENOM = 1_000_000


def _gate_hash(id_col: str, hash_fn: str) -> F.Column:
    if hash_fn == "xxhash64":
        return F.pmod(F.xxhash64(F.col(id_col)), F.lit(MIX_DENOM))
    if hash_fn == "md5_60":
        return F.pmod(
            F.conv(F.substring(F.md5(F.col(id_col).cast("string")), 1, 15),
                   16, 10).cast("long"),
            F.lit(MIX_DENOM),
        )
    raise ValueError(f"unknown hash_fn: {hash_fn}")


def sample_mix(
    df: DataFrame,
    rates: dict[str, float],
    stratum_col: str,
    id_col: str = "doc_id",
    default_rate: float = 0.0,
    hash_fn: str = "xxhash64",
) -> DataFrame:
    """Mix ``df`` to the per-stratum ``rates`` (expected copies per row).

    Returns the input columns plus ``copy`` (0..k-1 per surviving row).
    Strata absent from ``rates`` get ``default_rate``. Deterministic in
    (id, stratum, rates) only — see module docstring for the gate."""
    ppm = {k: int(round(r * MIX_DENOM)) for k, r in rates.items()}
    for k, v in ppm.items():
        if v < 0:
            raise ValueError(f"negative rate for stratum {k!r}")
    default_ppm = int(round(default_rate * MIX_DENOM))

    rate_col = F.lit(default_ppm)
    for k, v in sorted(ppm.items()):
        rate_col = F.when(F.col(stratum_col) == k, F.lit(v)).otherwise(rate_col)

    h = _gate_hash(id_col, hash_fn)
    copies = (
        F.floor(rate_col / MIX_DENOM).cast("int")
        + F.when(h < rate_col % MIX_DENOM, F.lit(1)).otherwise(F.lit(0))
    )
    with_copies = df.withColumn("_copies", copies).filter(F.col("_copies") > 0)
    # NB: the filter above also guards the Spark descending-sequence trap —
    # F.sequence(0, -1) yields [0, -1], not [] (see textstats.shingles)
    return (
        with_copies
        .withColumn("copy", F.explode(F.sequence(F.lit(0),
                                                 F.col("_copies") - 1)))
        .drop("_copies")
    )


def mixture_report(
    df: DataFrame, mixed: DataFrame, stratum_col: str,
) -> DataFrame:
    """Realized vs input row counts per stratum (x1000 realized rate) — the
    audit table a mixture run logs beside its output."""
    inp = df.groupBy(stratum_col).agg(F.count("*").alias("n_in"))
    out = mixed.groupBy(stratum_col).agg(F.count("*").alias("n_out"))
    return (
        inp.join(out, stratum_col, "left")
        .select(
            stratum_col, "n_in",
            F.coalesce("n_out", F.lit(0)).alias("n_out"),
            F.floor(F.coalesce("n_out", F.lit(0)) * 1000 / F.col("n_in"))
            .cast("bigint").alias("realized_rate_x1000"),
        )
    )


# ---------------------------------------------------------------------------
# Sequence packing (concat-and-chunk): assign every document its exact token
# span inside the fixed-length training sequences a dataloader will cut.


def pack_sequences(
    df: DataFrame,
    seq_len: int,
    tokens_col: str = "n_tokens",
    key_col: str = "doc_id",
    shard_col: str | None = None,
    max_shards: int = 100_000,
) -> DataFrame:
    """Concat-and-chunk sequence packing: documents are laid out in the
    global order ``(shard, key)`` and split every ``seq_len`` tokens into
    training sequences; each doc gets the integer span it occupies.

    Output adds to the input columns:
      ``cum_before``  exact tokens preceding the doc in the global order
      ``seq_id``      training sequence holding the doc's first token
      ``seq_offset``  offset of that first token inside seq_id
      ``seq_end_id``  sequence holding the doc's last token
      ``n_seqs_spanned``  how many sequences the doc touches (0 for empty)

    Scale design — the global prefix sum is the only coupling between
    documents, and a single unpartitioned window would serialize 100 TB
    through one task. It is decomposed exactly:

      1. per-shard token totals (one map-side-combined groupBy producing
         ``n_shards`` rows, collected — bounded by ``max_shards``, enforced);
      2. exclusive shard prefixes computed on the driver and broadcast back
         as a join on ``shard``;
      3. a window cumsum PARTITIONED BY shard, ordered by ``key``.

    ``shard_col`` must be monotone along the intended global order (crawl
    segment, date bucket, ``floor(doc_id / k)`` — anything whose sort order
    equals the order of its minimum keys); the operator orders output spans
    by (shard asc, key asc). With ``shard_col=None`` everything is one shard
    — correct, but the small-data path only (single-task window).

    Every step is integer arithmetic, so the layout is bit-reproducible
    across cluster sizes and row order — a packing spec is an auditable
    artifact of a training run, and the DuckDB contract oracle reproduces
    it with one global window (proving the decomposition exact).
    """
    from pyspark.sql import Window

    if seq_len <= 0:
        raise ValueError("seq_len must be positive")
    shard = F.col(shard_col) if shard_col else F.lit(0)
    d = df.withColumn("_shard", shard.cast("bigint"))

    totals = (d.groupBy("_shard")
              .agg(F.sum(tokens_col).cast("bigint").alias("_tot"))
              .orderBy("_shard").limit(max_shards + 1).collect())
    if len(totals) > max_shards:
        raise ValueError(
            f"more than max_shards={max_shards} shards; coarsen shard_col")
    prefix, acc = [], 0
    for r in totals:
        prefix.append((r["_shard"], acc))
        acc += r["_tot"] or 0
    spark = df.sparkSession
    prefix_df = F.broadcast(
        spark.createDataFrame(prefix, "_shard bigint, _prefix bigint"))

    w = (Window.partitionBy("_shard").orderBy(key_col)
         .rowsBetween(Window.unboundedPreceding, -1))
    tok = F.col(tokens_col).cast("bigint")
    cum = (F.col("_prefix")
           + F.coalesce(F.sum(tokens_col).over(w), F.lit(0))).cast("bigint")
    out = (
        d.join(prefix_df, "_shard")
        .withColumn("cum_before", cum)
        .withColumn("seq_id", F.floor(F.col("cum_before") / seq_len))
        .withColumn("seq_offset", F.pmod(F.col("cum_before"), F.lit(seq_len)))
        .withColumn(
            "seq_end_id",
            F.when(tok > 0,
                   F.floor((F.col("cum_before") + tok - 1) / seq_len))
            .otherwise(F.col("seq_id")))
        .withColumn(
            "n_seqs_spanned",
            F.when(tok > 0, F.col("seq_end_id") - F.col("seq_id") + 1)
            .otherwise(F.lit(0)).cast("bigint"))
        .drop("_shard", "_prefix")
    )
    return out


def packing_report(
    packed: DataFrame, seq_len: int, tokens_col: str = "n_tokens",
) -> DataFrame:
    """One-row audit for a packing run: corpus totals, sequence count, tail
    padding, and how many docs straddle a sequence boundary (the attention
    -mask / doc-separator cost of concat-and-chunk)."""
    return packed.agg(
        F.count("*").alias("n_docs"),
        F.sum(F.col(tokens_col).cast("bigint")).alias("total_tokens"),
        (F.floor(
            (F.coalesce(F.max(F.col("cum_before")
                              + F.col(tokens_col).cast("bigint")), F.lit(0))
             + seq_len - 1) / seq_len)).cast("bigint").alias("n_seqs"),
        F.sum(F.when(F.col("n_seqs_spanned") > 1, 1).otherwise(0))
        .cast("bigint").alias("docs_crossing"),
    ).withColumn(
        "tail_pad_tokens",
        (F.col("n_seqs") * seq_len - F.col("total_tokens")).cast("bigint"))
