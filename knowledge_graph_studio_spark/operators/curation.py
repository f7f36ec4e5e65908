"""End-to-end corpus curation: the composed training-data pipeline the
individual operators exist for, in the order public pipelines run them
(C4/CCNet-style cleaning -> Gopher filtering -> dedup -> decontamination ->
PII redaction -> mixture):

  0. domain_filter vs a blocklist (UT1/C4 stage-0 URL filter) — when
     blocked_domains is given
  1. canonicalize_urls + keep one doc per canonical URL (min id, or the
     NEWEST capture when ts_col names a warc_ts-style snapshot column)
  2. strip_boilerplate (line-frequency cleaning)
  3. span_dedup (C4 repeated-span removal)
  3b. exact_substring_dedup (ExactSubstr keep-first k-token windows)
                                           — when substr_dedup_k is given
  4. exact dedup (md5 groups, keep min id) — before the Gopher filters:
     output-equivalent (per-doc rules give identical verdicts to identical
     texts) and the n-gram filter stages then see only distinct texts
  5. gopher_filter (quality rules)         — drop failing docs
  6. gopher_repetition (repetition rules)  — drop failing docs
  7. fuzzy dedup (near-dup pairs -> connected components -> keep min id
     per cluster; dedup.neardup_dedup)     — when fuzzy_dedup=True
  8. CCNet LM bucketing (lm_unigram_score with a pre-fitted model; drop
     the 'tail' bucket)                    — when lm_model is given
  9. decontaminate vs a heldout eval set   — drop contaminated docs
 10. redact_pii (rewrite text)
 11. DSIR data selection (fit_dsir/dsir_select vs a target corpus)
                                           — when dsir_target+dsir_top_n given
 12. sample_mix (deterministic mixture)    — when rates are given
 13. pack_sequences (concat-and-chunk layout into fixed-length training
     sequences, hash-shuffled order)       — when pack_seq_len is given

Every stage is one of the oracle-paired operators from cleaning/, textstats/,
sampling/ (this module adds NO new semantics — it is the composition, so its
correctness evidence is the per-stage contract entries plus the composition
laws in tests/test_curation.py). The plan stays Spark-shaped end to end:
stage outputs are DataFrames, nothing collects, and the only driver actions
are the optional funnel counts.

At 100 TB you run this as one job per stage group with materialization
between groups (the funnel IS the audit log). In-process the same boundary
exists as a non-eager localCheckpoint per stage (see the sealing-policy
comment in curate_corpus): each stage embeds its input's plan on both sides
of an id-join, so an unsealed lazy composition would duplicate the upstream
DAG exponentially across the ~10 stages.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from .cleaning import (
    canonicalize_urls, decontaminate, span_dedup, strip_boilerplate,
)
from .sampling import sample_mix
from .textstats import gopher_filter, gopher_repetition


def curate_corpus(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    url_col: str | None = None,
    eval_df: DataFrame | None = None,
    decontaminate_n: int = 13,
    mix_rates: dict[str, float] | None = None,
    stratum_col: str | None = None,
    boilerplate_max_df_frac: float = 0.05,
    gopher: bool = True,
    fuzzy_dedup: bool = False,
    fuzzy_kwargs: dict | None = None,
    lm_model: tuple[DataFrame, int] | None = None,
    lm_drop_bucket: str = "tail",
    lm_thresholds: tuple[int, int] | None = None,
    blocked_domains: DataFrame | None = None,
    ts_col: str | None = None,
    gopher_kwargs: dict | None = None,
    repetition_kwargs: dict | None = None,
    substr_dedup_k: int | None = None,
    dsir_target: DataFrame | None = None,
    dsir_top_n: int | None = None,
    dsir_kwargs: dict | None = None,
    pack_seq_len: int | None = None,
    pack_shards: int = 128,
    seal_every: int | str = 1,
    clean_text_stages: bool = True,
    exact_dedup: bool = True,
    pii: bool = True,
) -> dict[str, DataFrame]:
    """Run the full curation pipeline; returns ``{"docs": final_df,
    "stages": {name: df}}`` with every intermediate stage inspectable.

    The final df carries (id_col, text_col [, stratum_col, copy]) with text
    fully cleaned and redacted. Use :func:`curation_funnel` on ``stages``
    for the per-stage attrition report."""
    from ..session import ensure_width

    # widen a narrow input ONCE up front: a small corpus scans as 1-2
    # partitions and every fan-out stage (n-gram explode, shingles) would
    # run its map work near-serial regardless of core count (measured:
    # gopher_repetition 8.0 s 1-wide vs 1.7 s 8-wide on sf0.1). No-op when
    # the input already meets cluster width — always true at scale.
    stages: dict[str, DataFrame] = {"input": ensure_width(docs)}
    cur = stages["input"]

    # Sealing policy. Lineage must be truncated periodically: every stage
    # embeds its input's plan at least twice (clean side + passthrough
    # side of the id-join), so a fully lazy ~10-stage composition grows
    # ONE flat DAG exponentially (measured: 168 s for the sf0.1 funnel vs
    # ~20 s sealed). Each localCheckpoint is a driver-synchronized AQE
    # execution (stage materialization runs eagerly at the call site even
    # with eager=False).
    #
    #   seal_every=k (int, default 1): seal every k-th stage boundary.
    #   seal_every="heavy": seal only the INPUT of each multi-pass stage
    #     (boilerplate, span/substr dedup, gopher repetition, fuzzy dedup,
    #     LM bucketing, DSIR, packing), letting single-pass stages ride
    #     unsealed.
    #
    # r6 measured the policies head-to-head on the sf0.1 bench funnel
    # (alternating in one session, 3 rounds): seal_every=1 min 13.2 s,
    # "heavy" min 18.1 s, seal_every=2 min 20.4 s — the funnel is
    # stage-cost-bound, not boundary-bound, and the unsealed chains'
    # duplicated post-exchange work costs more than the boundary syncs
    # save, so per-stage sealing stays the default. Output is identical
    # under every policy (sealing never changes semantics; law-tested).
    import os as _os
    import time as _time

    _state = {"since": 0, "dirty": True, "t": _time.time()}
    _timing = bool(_os.environ.get("CURATION_STAGE_TIMING"))

    def _ck(df: DataFrame, name: str) -> DataFrame:
        if not _timing:
            return df.localCheckpoint(eager=False)
        t0 = _time.time()
        out = df.localCheckpoint(eager=False)
        print(f"[curation] seal {name}: {_time.time() - t0:.2f}s "
              f"(+{t0 - _state['t']:.2f}s since last)", flush=True)
        _state["t"] = _time.time()
        return out

    def _seal(df: DataFrame, name: str = "") -> DataFrame:
        # stage-boundary hook
        if seal_every == "heavy":
            _state["dirty"] = True
            return df
        _state["since"] += 1
        if _state["since"] >= seal_every:
            _state["since"] = 0
            return _ck(df, name)
        return df

    def _sealed_input(df: DataFrame) -> DataFrame:
        # "heavy" mode: materialize the input of a multi-pass stage once
        if seal_every == "heavy" and _state["dirty"]:
            _state["dirty"] = False
            return _ck(df, "input-of-heavy")
        return df

    if url_col is not None:
        if blocked_domains is not None:
            # stage 0 of public pipelines (C4 badlist, RefinedWeb/UT1):
            # suffix-matched blocklist on the RAW url, before any text work
            from .cleaning import domain_filter
            cur = _seal(domain_filter(cur, blocked_domains, url_col=url_col,
                                      id_col=id_col), "domain_filter")
            stages["domain_filter"] = cur
        c = canonicalize_urls(cur, url_col)
        if ts_col is not None:
            # crawl-snapshot semantics (url, warc_ts): keep the NEWEST
            # capture of each resource, tie-broken to min id
            w = Window.partitionBy("canonical_url").orderBy(
                F.col(ts_col).desc(), F.col(id_col))
            cur = _seal(c.withColumn("_rk", F.row_number().over(w))
                        .filter("_rk = 1").drop("_rk", "canonical_url"), "url_dedup")
        else:
            w_first = F.min(F.col(id_col)).over(
                Window.partitionBy("canonical_url"))
            cur = _seal(c.withColumn("_keep", w_first == F.col(id_col))
                        .filter("_keep").drop("_keep", "canonical_url"), "url_dedup")
        stages["url_dedup"] = cur

    extra = [c for c in cur.columns if c not in (id_col, text_col)]

    def _rewrite(clean: DataFrame, src: DataFrame) -> DataFrame:
        # swap in clean_text, preserving any extra columns from src
        return (src.drop(text_col)
                .join(clean.select(id_col,
                                   F.col("clean_text").alias(text_col)),
                      id_col))

    if clean_text_stages:
        # rewriting cleaners are NOT idempotent on their own output (line
        # frequencies shift after a strip), so a staged runner that
        # materialized the cleaned text must disable them on resume
        # (run_curation_job does exactly that)
        cur = _sealed_input(cur)
        cur = _seal(_rewrite(strip_boilerplate(
            cur, id_col=id_col, text_col=text_col,
            max_df_frac=boilerplate_max_df_frac), cur), "boilerplate")
        stages["boilerplate"] = cur
        cur = _sealed_input(cur)
        cur = _seal(_rewrite(span_dedup(cur, id_col=id_col,
                                        text_col=text_col), cur), "span_dedup")
        stages["span_dedup"] = cur

    if substr_dedup_k is not None:
        # ExactSubstr (Lee et al.): keep-first repeated k-token substring
        # removal — runs after the line/span cleaners so window keys see
        # boilerplate-free text
        from .cleaning import exact_substring_dedup
        cur = _sealed_input(cur)
        cur = _seal(_rewrite(exact_substring_dedup(
            cur, k=substr_dedup_k, id_col=id_col, text_col=text_col), cur), "substr_dedup")
        stages["substr_dedup"] = cur

    if exact_dedup:
        # BEFORE the Gopher filters, deliberately: both rule sets are pure
        # per-doc functions of the (cleaned) text, so every member of an
        # identical-text group gets the same verdict and the kept min-id
        # representative is the same doc in either order — the final set is
        # provably identical (law-tested in tests/test_curation.py). The
        # cheap hash groupBy first means the n-gram-explode filter stages
        # see only DISTINCT texts: on a crawl-shaped x64 corpus (98.4%
        # verbatim duplicates) gopher_repetition measured 181.9 s of a
        # 231.6 s funnel when it ran pre-dedup — dedup-first removes that
        # work by the duplicate factor.
        keepers = (cur.groupBy(F.md5(text_col).alias("_h"))
                   .agg(F.min(id_col).alias(id_col)).select(id_col))
        cur = _seal(cur.join(keepers, id_col, "left_semi"), "exact_dedup")
        stages["exact_dedup"] = cur

    if gopher:
        # thresholds are corpus-tunable in every public pipeline; the
        # defaults are the paper's web-text settings
        gq = gopher_filter(cur, text_col=text_col, id_cols=(id_col,),
                           **(gopher_kwargs or {}))
        cur = _seal(cur.join(gq.filter("passes = 1").select(id_col),
                             id_col, "left_semi"), "gopher_quality")
        stages["gopher_quality"] = cur
        cur = _sealed_input(cur)
        gr = gopher_repetition(cur, text_col=text_col, id_cols=(id_col,),
                               **(repetition_kwargs or {}))
        cur = _seal(cur.join(gr.filter("passes = 1").select(id_col),
                             id_col, "left_semi"), "gopher_repetition")
        stages["gopher_repetition"] = cur

    if fuzzy_dedup:
        from .dedup import neardup_dedup
        # after the exact pass only NEAR (non-identical) duplicates remain,
        # so the generator's collapse probe will skip its collapse here
        cur = _sealed_input(cur)
        cur = _seal(neardup_dedup(cur, id_col=id_col, text_col=text_col,
                                  **(fuzzy_kwargs or {})), "fuzzy_dedup")
        stages["fuzzy_dedup"] = cur

    if lm_model is not None:
        # CCNet LM bucketing after dedup: score with the PRE-FITTED model
        # (fit once on a reference corpus via fit_lm_unigram — 2-tuple — or
        # fit_lm_bigram for contextual stupid-backoff costs — 3-tuple),
        # fit cutoffs on this corpus unless given, keep everything outside
        # the dropped bucket (default: drop 'tail', the lowest tercile)
        from .textstats import (lm_bigram_score, lm_bucket_thresholds,
                                lm_unigram_score)
        cur = _sealed_input(cur)
        if len(lm_model) == 3:
            scored0 = lm_bigram_score(cur, lm_model, text_col=text_col,
                                      id_col=id_col)
        else:
            scored0 = lm_unigram_score(cur, text_col=text_col,
                                       id_col=id_col, model=lm_model)
        head, tail = lm_thresholds or lm_bucket_thresholds(scored0)
        scored = scored0.withColumn(
            "lm_bucket",
            F.when(F.col("ce_x1e6") <= head, F.lit("head"))
            .when(F.col("ce_x1e6") <= tail, F.lit("middle"))
            .otherwise(F.lit("tail")))
        cur = _seal(cur.join(
            scored.filter(F.col("lm_bucket") != lm_drop_bucket)
            .select(id_col), id_col, "left_semi"), "lm_filtered")
        stages["lm_filtered"] = cur

    if eval_df is not None:
        cur = _seal(decontaminate(cur, eval_df, n=decontaminate_n,
                                  text_col=text_col, id_col=id_col,
                                  mode="drop"), "decontaminated")
        stages["decontaminated"] = cur

    if pii:
        # r6: redaction is a pure codegen regexp projection (cleaning.
        # redacted_text_col) — rewrite the text IN PLACE instead of the old
        # drop-join-on-id round trip (one join + exchange fewer; the column
        # order replicates the old join output: id first, extras, text last)
        from .cleaning import redacted_text_col
        cur = _seal(cur.select(
            id_col,
            *[c for c in cur.columns if c not in (id_col, text_col)],
            redacted_text_col(text_col).alias(text_col)), "pii_redacted")
        stages["pii_redacted"] = cur

    if dsir_target is not None and dsir_top_n is not None:
        # DSIR data selection (Xie et al. 2023): fit hashed-ngram
        # importance weights against the target corpus with the CLEANED
        # docs as the raw distribution, keep the top-n. Runs before the
        # mixture so up-sampling copies don't distort the raw fit.
        from .sampling import dsir_scores, dsir_select, fit_dsir
        cur = _sealed_input(cur)
        kw = dict(text_col=text_col, id_col=id_col, **(dsir_kwargs or {}))
        weights, w0 = fit_dsir(dsir_target, cur, **kw)
        picked = dsir_select(
            dsir_scores(cur, weights, w0, **kw), dsir_top_n, id_col=id_col)
        cur = _seal(cur.join(picked.select(id_col), id_col, "left_semi"), "dsir_selected")
        stages["dsir_selected"] = cur

    if mix_rates is not None:
        if stratum_col is None or stratum_col not in cur.columns:
            raise ValueError("mix_rates needs a stratum_col present in docs")
        cur = _seal(sample_mix(cur, mix_rates, stratum_col, id_col=id_col), "mixed")
        stages["mixed"] = cur

    if pack_seq_len is not None:
        # final stage: lay the curated corpus out as fixed-length training
        # sequences. The packing key is xxhash64(id, copy) — unique even
        # after up-sampling, and the hash order shuffles the corpus so
        # neighboring training sequences are decorrelated; sharding by the
        # key's high bits is monotone by construction, so the two-phase
        # prefix sum reproduces one global order at any cluster size.
        from .sampling import pack_sequences
        cur = _sealed_input(cur)
        copy = F.col("copy") if "copy" in cur.columns else F.lit(0)
        # arithmetic right-shift = exact monotone floor-division by 2^s,
        # so shard order equals key order (pack_shards rounds up to a
        # power of two)
        shift = 64 - max(1, (pack_shards - 1).bit_length())
        d = (cur.withColumn("_pk", F.xxhash64(F.col(id_col), copy))
             .withColumn("n_tokens",
                         F.size(F.split(F.col(text_col), " ")).cast("bigint"))
             .withColumn("_shard", F.shiftright(F.col("_pk"), shift)))
        # (id, copy) tiebreak: 64-bit _pk collisions are expected at
        # web-scale doc counts and would otherwise leave intra-shard order
        # nondeterministic, breaking the bit-reproducible layout (ADVICE r5)
        tiebreak = (id_col, "copy") if "copy" in cur.columns else (id_col,)
        cur = pack_sequences(d, pack_seq_len, shard_col="_shard",
                             key_col="_pk",
                             tiebreak_cols=tiebreak).drop("_shard")
        stages["packed"] = cur

    _ = extra  # extra columns ride along via the joins above
    return {"docs": cur, "stages": stages}


def curation_funnel(stages: dict[str, DataFrame]) -> list[tuple[str, int]]:
    """Per-stage row counts in pipeline order — the attrition audit a
    curation run logs. One count job per stage (driver actions by design:
    this is the report, not the pipeline)."""
    return [(name, df.count()) for name, df in stages.items()]


def run_curation_job(
    spark,
    docs: DataFrame,
    workdir: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    fail_after_group: int | None = None,
    **kwargs,
) -> dict:
    """Resumable curation: the module docstring's "one job per stage group
    with materialization between groups" made real. Three groups, each
    written to parquet and committed to the RunManifest; a killed job
    restarts from the last committed group, reading its table instead of
    recomputing (the same contract as pipeline.build_graph_resumable):

      group 0  "cleaned"   domain blocklist, url dedup, boilerplate,
                           span dedup, ExactSubstr
      group 1  "filtered"  exact dedup, Gopher quality+repetition, fuzzy
                           dedup, LM bucketing, decontamination, PII
                           redaction
      group 2  "selected"  DSIR selection, mixture, sequence packing

    ``kwargs`` is the ``curate_corpus`` surface; each group receives only
    its own stages' parameters, with the text-rewriting cleaners disabled
    after group 0 (they are not idempotent on their own output — see
    ``clean_text_stages``). Staged output equals the single-shot
    ``curate_corpus`` output exactly (law-tested): every stage is
    deterministic, so materialization points cannot change the result.
    ``fail_after_group`` injects a crash for kill/restart tests."""
    import time as _time

    from ..io.catalog import RunManifest

    manifest = RunManifest(workdir, run_id="curate0")
    done = manifest.committed("curation_group")
    g = lambda *names: {k: kwargs[k] for k in names if k in kwargs}  # noqa: E731

    # every kwarg must belong to exactly one group's forward list — an
    # unknown name (typo, or a toggle this runner does not thread) would
    # otherwise be SILENTLY dropped and the staged run would diverge from
    # the caller's intended curate_corpus configuration (ADVICE r5)
    _forwarded = {
        "url_col", "blocked_domains", "ts_col", "boilerplate_max_df_frac",
        "substr_dedup_k", "seal_every", "gopher", "gopher_kwargs",
        "repetition_kwargs", "fuzzy_dedup", "fuzzy_kwargs", "lm_model",
        "lm_thresholds", "lm_drop_bucket", "eval_df", "decontaminate_n",
        "exact_dedup", "pii", "dsir_target", "dsir_top_n", "dsir_kwargs",
        "mix_rates", "stratum_col", "pack_seq_len", "pack_shards",
    }
    unknown = set(kwargs) - _forwarded
    if unknown:
        raise ValueError(
            f"run_curation_job: unknown kwargs {sorted(unknown)}; "
            f"forwardable: {sorted(_forwarded)}")

    group_kwargs = [
        dict(gopher=False, exact_dedup=False, pii=False,
             **g("url_col", "blocked_domains", "ts_col",
                 "boilerplate_max_df_frac", "substr_dedup_k",
                 "seal_every")),
        dict(clean_text_stages=False,
             **g("gopher", "gopher_kwargs", "repetition_kwargs",
                 "fuzzy_dedup", "fuzzy_kwargs", "lm_model",
                 "lm_thresholds", "lm_drop_bucket", "eval_df",
                 "decontaminate_n", "exact_dedup", "pii", "seal_every")),
        dict(clean_text_stages=False, gopher=False, exact_dedup=False,
             pii=False,
             **g("dsir_target", "dsir_top_n", "dsir_kwargs", "mix_rates",
                 "stratum_col", "pack_seq_len", "pack_shards",
                 "seal_every")),
    ]
    cur, counts = docs, {}
    for gid, gkw in enumerate(group_kwargs):
        path = f"{workdir}/group={gid}"
        if gid in done:
            cur = spark.read.parquet(path)
            counts[gid] = cur.count()
            continue
        t0 = _time.time()
        cur = curate_corpus(cur, id_col=id_col, text_col=text_col,
                            **gkw)["docs"]
        cur.write.mode("overwrite").parquet(path)
        cur = spark.read.parquet(path)
        counts[gid] = cur.count()
        manifest.commit("curation_group", gid, t0, rows=counts[gid])
        if fail_after_group is not None and gid >= fail_after_group:
            raise RuntimeError(f"injected failure after group {gid}")
    return {"docs": cur, "group_rows": counts, "workdir": workdir}
