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
