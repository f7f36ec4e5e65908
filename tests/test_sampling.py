"""Corpus-mixing laws: exact reproducibility, hash-gate proportion
convergence, up-sampling copy semantics, and the shuffle-free plan."""

from pyspark.sql import functions as F

from knowledge_graph_studio_spark.operators.sampling import (
    MIX_DENOM, mixture_report, sample_mix,
)


def _corpus(spark, n=6000):
    return spark.range(n).select(
        F.col("id").alias("doc_id"),
        F.when(F.col("id") % 3 == 0, "en")
        .when(F.col("id") % 3 == 1, "de")
        .otherwise("zh").alias("lang"),
    )


def test_sample_mix_is_deterministic(spark):
    d = _corpus(spark, 2000)
    rates = {"en": 0.4, "de": 1.3, "zh": 0.0}
    a = sorted(map(tuple, sample_mix(d, rates, "lang").collect()))
    b = sorted(map(tuple, sample_mix(
        d.repartition(13), rates, "lang").collect()))
    assert a == b  # row order / partitioning never changes the sample


def test_sample_mix_proportions_converge(spark):
    d = _corpus(spark, 6000)  # 2000 per stratum
    rates = {"en": 0.5, "de": 1.5, "zh": 0.0}
    rep = {r["lang"]: r for r in
           mixture_report(d, sample_mix(d, rates, "lang"), "lang").collect()}
    assert abs(rep["en"]["realized_rate_x1000"] - 500) < 50
    assert abs(rep["de"]["realized_rate_x1000"] - 1500) < 50
    assert rep["zh"]["n_out"] == 0


def test_sample_mix_upsample_copy_semantics(spark):
    d = _corpus(spark, 300).filter("lang = 'en'")
    out = sample_mix(d, {"en": 2.25}, "lang").collect()
    by_doc = {}
    for r in out:
        by_doc.setdefault(r["doc_id"], []).append(r["copy"])
    # every kept doc has copies 0..k-1 with k in {2, 3}
    for doc, copies in by_doc.items():
        assert sorted(copies) == list(range(len(copies)))
        assert len(copies) in (2, 3)
    total = sum(len(c) for c in by_doc.values())
    assert abs(total / d.count() - 2.25) < 0.2


def test_sample_mix_default_rate_and_unknown_stratum(spark):
    d = _corpus(spark, 300)
    out = sample_mix(d, {"en": 1.0}, "lang", default_rate=0.0)
    assert set(r["lang"] for r in out.collect()) == {"en"}
    out2 = sample_mix(d, {}, "lang", default_rate=1.0)
    assert out2.count() == 300


def test_sample_mix_md5_gate_matches_module_constant(spark):
    # the md5_60 gate must equal the documented arithmetic (oracle parity)
    d = _corpus(spark, 500)
    got = sample_mix(d, {"en": 0.5}, "lang", hash_fn="md5_60")
    import hashlib

    kept = {r["doc_id"] for r in got.collect()}
    for i in range(0, 500, 3):  # en stratum
        h = int(hashlib.md5(str(i).encode()).hexdigest()[:15], 16) % MIX_DENOM
        assert (i in kept) == (h < MIX_DENOM // 2)


def test_sample_mix_plan_is_shuffle_free(spark):
    d = _corpus(spark, 300)
    plan = (sample_mix(d, {"en": 1.5, "de": 0.5}, "lang")
            ._jdf.queryExecution().executedPlan().toString())
    assert "Exchange" not in plan


# --- sequence packing ------------------------------------------------------

from knowledge_graph_studio_spark.operators.sampling import (  # noqa: E402
    pack_sequences, packing_report,
)


def _tok_corpus(spark, n=500):
    # deterministic token counts incl. zero-token and boundary-straddling docs
    return spark.range(n).select(
        F.col("id").alias("doc_id"),
        F.when(F.col("id") % 17 == 0, 0)
        .otherwise((F.col("id") * 37 % 190) + 1).alias("n_tokens"),
        F.floor(F.col("id") / 50).alias("shard"),
    )


def _py_pack(rows, seq_len):
    # pure-python oracle: global concat order, exact spans
    out, cum = {}, 0
    for doc_id, n in sorted(rows):
        seq_id, off = cum // seq_len, cum % seq_len
        end = (cum + n - 1) // seq_len if n > 0 else seq_id
        out[doc_id] = (cum, seq_id, off, end, end - seq_id + 1 if n else 0)
        cum += n
    return out


def test_pack_sequences_matches_python_oracle(spark):
    d = _tok_corpus(spark, 500)
    rows = [(r["doc_id"], r["n_tokens"]) for r in d.collect()]
    want = _py_pack(rows, 128)
    got = pack_sequences(d, 128, shard_col="shard").collect()
    assert len(got) == 500
    for r in got:
        assert (r["cum_before"], r["seq_id"], r["seq_offset"],
                r["seq_end_id"], r["n_seqs_spanned"]) == want[r["doc_id"]], r


def test_pack_sequences_sharded_equals_single_shard(spark):
    # the two-phase prefix-sum decomposition == the one-window global law
    d = _tok_corpus(spark, 400)
    a = {r["doc_id"]: r["cum_before"]
         for r in pack_sequences(d, 64, shard_col="shard").collect()}
    b = {r["doc_id"]: r["cum_before"]
         for r in pack_sequences(d.drop("shard"), 64).collect()}
    assert a == b


def test_pack_sequences_deterministic_under_repartition(spark):
    d = _tok_corpus(spark, 300)
    a = sorted(map(tuple, pack_sequences(d, 100, shard_col="shard").collect()))
    b = sorted(map(tuple, pack_sequences(
        d.repartition(7), 100, shard_col="shard").collect()))
    assert a == b


def test_packing_report(spark):
    d = _tok_corpus(spark, 200)
    packed = pack_sequences(d, 128, shard_col="shard")
    rep = packing_report(packed, 128).collect()[0]
    total = sum(r["n_tokens"] for r in d.collect())
    assert rep["n_docs"] == 200
    assert rep["total_tokens"] == total
    assert rep["n_seqs"] == (total + 127) // 128
    assert rep["tail_pad_tokens"] == rep["n_seqs"] * 128 - total
    crossing = sum(1 for r in packed.collect() if r["n_seqs_spanned"] > 1)
    assert rep["docs_crossing"] == crossing
    # empty docs exist in the fixture and span zero sequences
    assert any(r["n_seqs_spanned"] == 0 for r in packed.collect())


def test_pack_sequences_shard_cap(spark):
    d = _tok_corpus(spark, 100)
    import pytest
    with pytest.raises(ValueError, match="max_shards"):
        pack_sequences(d, 64, shard_col="doc_id", max_shards=10)
