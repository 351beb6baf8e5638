"""The composed corpus-curation pipeline (VERDICT r3 #2): the end-to-end
user journey over a documents table, as one resumable job.

    quality/Gopher filter → exact dedup → MinHash-LSH candidates →
    exact-Jaccard confirm → connected-component clustering →
    keep-one-per-cluster → benchmark decontamination → hash split

Every stage exists (and is individually oracled) in ``mre.textops``; this
module wires them into the single pipeline a 100 TB curation run actually
executes, with the same stage-lineage/resume story ``run_extract`` has.

Scale design (10^12 docs):
* Stage checkpoints are NARROW — each stage materializes only the
  surviving ``doc_id`` set (8 bytes/row), never a corpus copy; the text
  is re-read from the source with a semi-join per stage, which parquet/
  Iceberg column pruning keeps cheap. Five id-lists beat five corpus
  rewrites by ~3 orders of magnitude of sink I/O.
* Each stage is linear or candidate-shaped: Gopher rules are pure column
  expressions; exact dedup is one digest shuffle; near-dup is the
  LSH-proposes / exact-Jaccard-confirms path (O(candidates), never a
  corpus self-join — ``max_bucket`` guards viral buckets); clustering
  shuffles (doc_id, label) digests only; decontamination broadcasts the
  eval shingles so the corpus never shuffles; the split is a stateless
  hash projection.
* Resume: a stage is skipped iff its lineage row (run_id, stage) exists
  AND its output is readable — write-then-commit order, so a crash
  mid-stage re-runs exactly that stage (overwrite sinks are idempotent).
"""

from __future__ import annotations

import time
from typing import Optional

from pyspark import StorageLevel
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .io import read_table, write_append, write_overwrite
from .textops import (benchmark_contamination, dup_clusters, fingerprint,
                      gopher_quality, gopher_repetition, hash_split,
                      jaccard_on_candidates, minhash_bands,
                      minhash_near_dups, minhash_signatures, pii_scrub)

CURATE_STAGES = ("quality", "exact_dedup", "near_dup", "decontaminate",
                 "split")


# --------------------------------------------------------------------------
# per-stage id computations (each returns a narrow doc_id frame)


def quality_keep_ids(docs: DataFrame, strict: bool = False,
                     pii_max: int | None = None,
                     ngram_battery: bool = False) -> DataFrame:
    """Stage 1 — docs passing all Gopher quality rules. Linear, pure
    column expressions (mre.textops.gopher_quality), no shuffle.
    ``strict`` additionally requires the repetition + format battery:
    top-bigram occupancy ≤ the Gopher cut (``gopher_repetition``), the
    duplicate-line/paragraph fraction rules (``gopher_dup_sections``,
    round 7) — count-carrying doc_id-keyed shuffles; docs without
    newline structure pass the section rules trivially — and the
    bullet/ellipsis line-format rules (``gopher_line_rules``, round 7
    — zero-shuffle column expressions). ``ngram_battery`` (round 7,
    opt-in on top of ``strict`` because it is the one expensive member:
    a 9-way n-gram explode) additionally requires the FULL Table A1
    n-gram repetition battery (``gopher_ngram_battery``: top 2/3/4-gram
    and duplicate 5..10-gram character fractions under the published
    cuts). ``pii_max`` (VERDICT r4 #4) additionally drops docs with
    more than that many PII matches (emails + phones + IPv4 literals,
    mre.textops.pii_scrub) — another pure projection, no shuffle."""
    keep = gopher_quality(docs).filter(F.col("keep") == 1).select("doc_id")
    if strict:
        from .textops import gopher_dup_sections, gopher_line_rules
        rep = (gopher_repetition(docs)
               .filter(F.col("pass_repetition") == 1).select("doc_id"))
        keep = keep.join(rep, "doc_id", "left_semi")
        sec = (gopher_dup_sections(docs)
               .filter(F.col("pass_dup_sections") == 1).select("doc_id"))
        keep = keep.join(sec, "doc_id", "left_semi")
        fmt = (gopher_line_rules(docs)
               .filter(F.col("pass_line_rules") == 1).select("doc_id"))
        keep = keep.join(fmt, "doc_id", "left_semi")
    if ngram_battery:
        from .textops import gopher_ngram_battery
        # one row per (doc, n) — the verdict repeats, so pick one n
        # rather than paying a distinct shuffle
        bat = (gopher_ngram_battery(docs)
               .filter((F.col("n") == 2)
                       & (F.col("pass_ngram_battery") == 1))
               .select("doc_id"))
        keep = keep.join(bat, "doc_id", "left_semi")
    if pii_max is not None:
        ok = (pii_scrub(docs).filter(F.col("n_pii") <= pii_max)
              .select("doc_id"))
        keep = keep.join(ok, "doc_id", "left_semi")
    return keep


def exact_keeper_ids(docs: DataFrame) -> DataFrame:
    """Stage 2 — exact-dedup keepers: min doc_id per content fingerprint.
    One digest-keyed shuffle with map-side partial aggregation."""
    return (fingerprint(docs).groupBy("fingerprint")
            .agg(F.min("doc_id").alias("doc_id"))
            .select("doc_id"))


def near_dup_loser_ids(docs: DataFrame, *, shingle_n: int = 3,
                       minhash_threshold: float = 0.2,
                       jaccard_threshold: float = 0.5,
                       max_bucket: int | None = None) -> DataFrame:
    """Stage 3 — near-dup docs to DROP: MinHash-LSH proposes candidate
    pairs, exact n-gram Jaccard confirms each (O(|candidates|), see
    jaccard_on_candidates), connected components group confirmed pairs,
    and every doc that is not its cluster's min doc_id is a loser.

    Pairwise purity (load-bearing for the driver oracle): MinHash
    signatures, band hashes, and est_jaccard are all per-doc/per-pair
    functions, so with ``max_bucket=None`` the candidate pairs over a
    FILTERED corpus equal the full-corpus candidate pairs restricted to
    surviving endpoints — which is how the composition oracle replays
    this stage from the full-corpus golden."""
    cands = minhash_near_dups(docs, n=shingle_n,
                              threshold=minhash_threshold,
                              max_bucket=max_bucket).select("doc_a", "doc_b")
    pairs = (jaccard_on_candidates(cands, docs, n=shingle_n)
             .filter(F.col("jaccard") >= jaccard_threshold)
             .select("doc_a", "doc_b"))
    clusters = dup_clusters(pairs)
    return (clusters.filter(F.col("doc_id") != F.col("cluster_id"))
            .select("doc_id"))


def contaminated_ids(docs: DataFrame, evals: DataFrame, *, n: int = 5,
                     min_shared: int = 1) -> DataFrame:
    """Stage 4 — docs sharing ≥ min_shared word n-grams with any eval
    benchmark text. Eval shingles are broadcast; the corpus never
    shuffles (mre.textops.benchmark_contamination)."""
    return (benchmark_contamination(docs, evals, n=n)
            .filter(F.col("n_shared") >= min_shared)
            .select("doc_id").distinct())


def lm_keep_ids(docs: DataFrame, max_nll_micro: int,
                vocab_top: int = 4096) -> DataFrame:
    """LM perplexity-filter stage (round 7, CCNet-family — Wenzek et
    al. 2020, self-trained: no external model files exist here): learn
    a unigram LM over ``docs`` (``textops.lm_learn`` — one map-side-
    combinable token-count shuffle, bounded vocab), score every doc
    (``lm_score`` — a map-literal fold, pure projection, zero shuffle)
    and keep doc_ids whose mean negative log-likelihood in MICRO-NATS
    is ≤ ``max_nll_micro`` (perplexity = exp(nll/1e6), same ordering —
    e.g. 7_000_000 ≈ perplexity 1096). Zero-token docs have no
    evidence and are dropped (their score is NULL, which the ≤ filter
    rejects). Training on the post-dedup survivors is deliberate:
    duplicated boilerplate would otherwise dominate the unigram
    counts, the failure CCNet orders dedup-before-LM to avoid."""
    from .textops import lm_learn, lm_score, lm_vocab_rows
    vocab, total = lm_learn(docs, vocab_top=vocab_top)
    return (lm_score(docs, lm_vocab_rows(vocab), total)
            .filter(F.col("nll_micro_mean") <= int(max_nll_micro))
            .select("doc_id"))


def media_loser_ids(media: DataFrame, mode: str = "exact", *,
                    size_bucket_bytes: int | None = None) -> DataFrame:
    """Media-payload dedup stage (VERDICT r6 #2) — the doc_ids to DROP
    from a (doc_id, payload) media table: every doc that is not its
    group's min doc_id, grouped by sha1 payload digest
    (``mode='exact'``) or by no-decode container band (``mode='band'``
    — fmt + sniffed dimensions, optionally a byte-size bucket; the
    aggressive analogue for re-encoded copies, see
    ``mre.multimodal.media_band_dedup``). Same keep-min semantics as
    text exact dedup. Emitting LOSERS (anti-join shape) means docs
    with no media row pass the stage untouched — a mixed corpus is the
    normal case. One digest/band-keyed window shuffle; payload bytes
    never shuffle in exact mode."""
    from .multimodal import media_band_dedup, media_exact_dedup
    m = media.select(F.col("doc_id").alias("media_id"), "payload")
    if mode == "exact":
        d = media_exact_dedup(m)
    elif mode == "band":
        d = media_band_dedup(m, size_bucket_bytes=size_bucket_bytes)
    else:
        raise ValueError(f"media dedup mode must be 'exact'|'band', "
                         f"got {mode!r}")
    return (d.filter(F.col("media_id") != F.col("keeper_id"))
            .select(F.col("media_id").alias("doc_id")))


def semantic_loser_ids(embeddings: DataFrame, *, k: int = 64,
                       iters: int = 3,
                       threshold: float = 0.95) -> DataFrame:
    """Semantic (embedding-level) dedup stage — SemDeDup over a
    (doc_id, embedding) side table: the doc_ids to DROP because their
    embedding has an in-threshold lower-id neighbour in its k-means
    cell (``textops.semdedup_losers``; greedy keep-by-lowest-id, the
    shared dedup keep rule modulo cluster-min). Anti-join shape like
    ``media_loser_ids``: docs without an embedding row pass untouched.
    k bounds the within-cell quadratic — size it so corpus/k vectors
    fit a matmul tile at the target scale."""
    from .textops import semdedup_losers
    emb = embeddings.select(F.col("doc_id").alias("vec_id"),
                            "embedding")
    return (semdedup_losers(emb, k=k, iters=iters, threshold=threshold)
            .select(F.col("vec_id").alias("doc_id")))


# --------------------------------------------------------------------------
# the composed pipeline as one DataFrame (driver-checkable, no sink)


def curate_df(docs: DataFrame, evals: Optional[DataFrame] = None, *,
              shingle_n: int = 3, minhash_threshold: float = 0.2,
              jaccard_threshold: float = 0.5, contamination_n: int = 5,
              contamination_min_shared: int = 1,
              train_frac: float = 0.9, strict_quality: bool = False,
              pii_max: int | None = None,
              ngram_battery: bool = False,
              max_bucket: int | None = None,
              media: Optional[DataFrame] = None,
              media_dedup: str = "exact",
              lm_max_nll: int | None = None,
              lm_vocab_top: int = 4096,
              dsir_top_frac: float | None = None,
              dsir_target_lang: str = "en",
              embeddings: Optional[DataFrame] = None,
              semdedup_k: int = 64, semdedup_iters: int = 3,
              semdedup_threshold: float = 0.95) -> DataFrame:
    """The full curation chain as a single DataFrame: surviving docs with
    their train/test ``split`` assignment (text column dropped).

    ``evals`` is a small (eval_id, text) frame; None skips
    decontamination. The post-dedup survivor frame feeds three downstream
    scans (near-dup, decontamination, split) — persisted so the quality +
    dedup semi-joins run once; ``run_curate`` materializes stage id-lists
    to parquet instead, which is the 10^12-doc shape.

    ``media`` (round 7, VERDICT r6 #2): an optional (doc_id, payload)
    table of the docs' media attachments; when given, a media-payload
    dedup stage runs right after text exact dedup — docs whose payload
    duplicates a kept doc's (``media_dedup='exact'``: byte-identical
    sha1; ``'band'``: same no-decode container band) are dropped, docs
    without a media row pass through.

    ``lm_max_nll`` (round 7): opt-in CCNet-family perplexity filter
    after exact/media dedup — a unigram LM is learned from the dedup
    survivors and docs scoring above ``lm_max_nll`` micro-nats mean
    NLL (see ``lm_keep_ids``) are dropped before the expensive
    near-dup stage.

    Cache ownership (ADVICE r4): the persisted survivor frame (and the
    intermediates the textops helpers persist) are registered in
    ``mre.textops._LIVE_CACHES``; call ``mre.textops.release_caches()``
    after materializing the result — unpersist is only a hint, so a
    released plan stays correct and merely recomputes if re-run."""
    from .textops import _register_cache
    kept = docs.join(
        quality_keep_ids(docs, strict=strict_quality, pii_max=pii_max,
                         ngram_battery=ngram_battery),
        "doc_id", "left_semi")
    kept = kept.join(exact_keeper_ids(kept), "doc_id", "left_semi")
    if media is not None:
        # media restricted to LIVE docs first, so a dead doc can never
        # claim keeper-min over a surviving copy
        live_media = media.join(kept.select("doc_id"), "doc_id",
                                "left_semi")
        kept = kept.join(media_loser_ids(live_media, mode=media_dedup),
                         "doc_id", "left_anti")
    if embeddings is not None:
        # semantic (SemDeDup) dedup — same live-docs-first rule
        live_emb = embeddings.join(kept.select("doc_id"), "doc_id",
                                   "left_semi")
        kept = kept.join(
            semantic_loser_ids(live_emb, k=semdedup_k,
                               iters=semdedup_iters,
                               threshold=semdedup_threshold),
            "doc_id", "left_anti")
    kept = _register_cache(kept.persist(StorageLevel.MEMORY_AND_DISK))
    if lm_max_nll is not None:
        kept = kept.join(
            lm_keep_ids(kept, lm_max_nll, vocab_top=lm_vocab_top),
            "doc_id", "left_semi")
    losers = near_dup_loser_ids(kept, shingle_n=shingle_n,
                                minhash_threshold=minhash_threshold,
                                jaccard_threshold=jaccard_threshold,
                                max_bucket=max_bucket)
    kept = kept.join(losers, "doc_id", "left_anti")
    if evals is not None:
        kept = kept.join(
            contaminated_ids(kept, evals, n=contamination_n,
                             min_shared=contamination_min_shared),
            "doc_id", "left_anti")
    if dsir_top_frac is not None:
        # DSIR importance selection toward the target-language subset
        # (round 7; see run_curate's dsir_select stage for the shape)
        from .textops import dsir_topk
        k = int(kept.count() * float(dsir_top_frac))
        kept = (dsir_topk(kept, F.col("lang") == dsir_target_lang, k)
                .drop("dsir_n_feats", "dsir_weight_micro"))
    return hash_split(kept, "text", train_frac).drop("text")


# --------------------------------------------------------------------------
# the resumable job (stage lineage, same story as run_extract)


def _params_hash(**params) -> str:
    """Stable digest of the parameter set a run was launched with —
    stored per lineage row so resume can detect a re-run of the same
    run_id with DIFFERENT parameters (ADVICE r4: silently reusing stage
    outputs computed under old parameters mislabels the final table)."""
    import hashlib
    canon = repr(sorted(params.items()))
    return hashlib.md5(canon.encode("utf-8")).hexdigest()[:16]


def completed_stages(spark: SparkSession, lineage_dst: str,
                     run_id: str, params_hash: str | None = None) -> set:
    """Stages already committed for this run_id (≤10 names — the collect
    is a constant, never corpus-shaped). With ``params_hash`` given, a
    stage only counts as done if its LATEST lineage row (max attempt —
    the row describing what is actually on disk, since stage outputs are
    overwrites) committed it under the SAME parameter digest: matching
    any historical row would wrongly reuse stale outputs when a run_id's
    parameters are flipped back to an earlier set (A → B → A). Rows from
    a pre-params_hash lineage table are conservatively treated as
    parameter-mismatched (recompute — the overwrite sinks make that
    correct, merely not free)."""
    import os
    if "://" not in lineage_dst and not lineage_dst.startswith("iceberg:"):
        if not os.path.exists(lineage_dst):
            return set()
    try:
        lin = read_table(spark, lineage_dst)
    except Exception:
        return set()
    lin = lin.filter(F.col("run_id") == run_id)
    if params_hash is not None:
        if "params_hash" not in lin.columns:
            return set()
        from pyspark.sql import Window
        w = Window.partitionBy("stage").orderBy(
            F.desc("attempt"), F.desc("completed_at"))
        lin = (lin.withColumn("_rn", F.row_number().over(w))
               .filter((F.col("_rn") == 1)
                       & (F.col("params_hash") == params_hash)))
    return {r["stage"] for r in lin.select("stage").distinct().collect()}


def run_curate(spark: SparkSession, src, dst: str, lineage_dst: str,
               run_id: str, evals_src: Optional[str] = None, *,
               shingle_n: int = 3, minhash_threshold: float = 0.2,
               jaccard_threshold: float = 0.5, contamination_n: int = 5,
               contamination_min_shared: int = 1, train_frac: float = 0.9,
               strict_quality: bool = False, pii_max: int | None = None,
               ngram_battery: bool = False,
               max_bucket: int | None = None, resume: bool = True,
               rewrite: str | None = None,
               rewrite_max_df: int = 1,
               media_src: Optional[str] = None,
               media_dedup: str = "exact",
               bpe_merges: int = 0,
               bpe_vocab_top: int = 5000,
               line_clean: bool = False,
               lm_max_nll: int | None = None,
               lm_vocab_top: int = 4096,
               url_gate: bool = False,
               token_budget: int | None = None,
               budget_weights_bp: dict[str, int] | None = None,
               budget_temperature_bp: int | None = None,
               nb_gate: bool = False,
               nb_vocab_top: int = 4096,
               dsir_top_frac: float | None = None,
               dsir_target_lang: str = "en",
               embeddings_src: Optional[str] = None,
               semdedup_k: int = 64, semdedup_iters: int = 3,
               semdedup_threshold: float = 0.95,
               robots_src: Optional[str] = None,
               robots_agent: str = "mrebot",
               input_tag: Optional[str] = None) -> None:
    """Run the curation pipeline end-to-end with stage checkpoints.

    ``src`` is a documents table (doc_id, text, …) — a path/URI, or a
    DataFrame (VERDICT r5 #1: ``run_corpus`` passes the lazily-adapted
    extraction output directly, so no corpus copy is ever materialized;
    each stage's semi-join re-applies the projection at read, which
    column pruning keeps free). ``evals_src`` an
    optional (eval_id, text) table. Stage id-lists land under
    ``{dst}/{stage}``, the final per-doc split table under
    ``{dst}/split``; one lineage row per completed stage is appended to
    ``lineage_dst`` (run_id, stage, n_in, n_out, wall_ms, completed_at).
    Re-running with the same run_id AND the same parameters skips
    committed stages (the lineage row records a parameter digest — a
    changed parameter set recomputes rather than silently reusing
    stale stage outputs); a crash mid-stage re-runs only that stage
    (write-then-commit, overwrite sinks). A recomputed stage appends a
    new lineage row with a bumped ``attempt`` counter, so duplicate
    (run_id, stage) rows are ordered and rollups can pick the latest
    (ADVICE r4).

    ``rewrite`` (round 6, opt-in) inserts a boilerplate-REWRITE stage
    between quality and exact dedup: ``'passages'`` strips '. '-spans
    (``remove_dup_passages``) and ``'windows'`` strips 8-token runs
    (``remove_dup_windows``) whose digest recurs in more than
    ``rewrite_max_df`` distinct docs. Running the rewrite BEFORE dedup
    is the point: two docs that differ only in shared boilerplate
    become exact duplicates and collapse in the next stage. Unlike the
    id-list stages this one materializes ``{dst}/rewrite`` =
    (doc_id, text) — a rewrite IS new corpus data (one corpus-text
    write, same class as the extract sink; SURVEY §7.4 rule 24 governs
    checkpoints, not data products) — and every downstream stage reads
    its text from there. Default None leaves the pipeline exactly as
    before.

    ``media_src`` (round 7, VERDICT r6 #2): optional (doc_id, payload)
    table of media attachments — inserts a ``media_dedup`` stage after
    text exact dedup (exact sha1 payload dedup, or no-decode banding
    with ``media_dedup='band'``; docs without media pass through). Like
    every other stage it materializes a narrow id-list and is resumed
    through the lineage.

    ``bpe_merges`` > 0 (round 7, VERDICT r6 #4) appends a token-
    accounting tail after the split: ``{dst}/bpe_merges`` = the BPE
    merge table learned FROM THE SURVIVING CORPUS (mre.bpe.bpe_learn —
    one word-count aggregation + the driver loop over a bounded
    top-``bpe_vocab_top`` vocab), and ``{dst}/tokens`` = per-doc
    (n_words, n_bpe_tokens) under those merges — the numbers a training
    run budgets against, measured with the tokenizer the corpus itself
    induces. Both resume through the lineage like every other stage;
    the default (0) leaves the pipeline byte-identical.

    ``line_clean`` (round 7) prepends the C4 line-level scrub
    (``textops.c4_line_clean`` — the public C4 recipe: terminal-punct /
    min-words / javascript line rules, lorem-ipsum / curly-brace page
    drops) as stage 0: pages failing the page rules are dropped and
    every survivor's text is rewritten to its kept lines, so all later
    stages (quality, dedup, decontamination, split, BPE) see the
    cleaned text. Off by default — the input docs must carry
    newline-structured text for the rules to be meaningful.

    ``lm_max_nll`` (round 7) inserts a CCNet-family unigram-LM
    perplexity filter (``lm_keep_ids``) as an ``lm_filter`` stage
    between exact/media dedup and near-dup: the LM is learned from the
    dedup survivors (one token-count shuffle + a bounded
    ``lm_vocab_top``-row vocab), scoring is a zero-shuffle map-literal
    fold, and docs whose mean NLL exceeds the threshold (micro-nats;
    perplexity = exp(nll/1e6)) are dropped before the most expensive
    stage. Resumes through the lineage like every other stage.

    ``url_gate`` (round 7) prepends the RefinedWeb-family URL filter
    (``textops.url_filter``: blocklist score, digit-heavy hosts, length
    cut — zero-shuffle projections) as the very first stage; requires a
    ``url`` column (the extraction output has one) and raises if the
    corpus lacks it. ``token_budget`` (round 7) inserts a
    ``budget_sample`` mixture-assembly stage after decontamination:
    the fully-curated survivors fill each source's token budget
    (``budget_weights_bp`` = mixture shares in basis points; absent
    sources get the flat cap) in deterministic content-hash order, and
    only the sampled docs reach the split.
    ``budget_temperature_bp`` (round 7) derives those shares from the
    survivors themselves instead: temperature-scaled
    share_s ∝ n_s^(alpha/10000) (``textops.mixture_weights_bp``, the
    UniMax device), computed INSIDE the stage from the decontaminated
    survivor counts (bounded per-source collect) — mutually exclusive
    with an explicit ``budget_weights_bp``.

    ``nb_gate`` (round 7) inserts an ``nb_filter`` stage right after
    quality — the CCNet bootstrap: a multinomial Naive Bayes
    classifier (``textops.nb_train``, bounded ``nb_vocab_top`` vocab)
    is trained on the heuristic gate's own pass/fail verdicts and
    quality survivors the classifier rejects are dropped; if either
    verdict class is empty the stage is a recorded no-op.

    ``dsir_top_frac`` (round 7) inserts a ``dsir_select`` stage after
    decontamination (before the token-budget mixture): DSIR importance
    selection (Xie et al. 2023) keeps the top fraction of survivors by
    hashed-ngram importance weight toward the ``dsir_target_lang``
    subset of the survivors themselves (the in-corpus stand-in for an
    external target corpus). Learn = one feature-count shuffle to a
    bounded 256-bucket log-ratio table; score = a zero-shuffle map-
    literal fold; select = the sort-free histogram top-k
    (``textops.dsir_topk``). Resumes through the lineage like every
    other stage.

    ``embeddings_src`` (round 7): an optional (doc_id, embedding)
    side table — inserts a ``semantic_dedup`` stage (SemDeDup,
    ``semantic_loser_ids``) right after media dedup: embeddings are
    restricted to LIVE docs first (a dead doc can never claim
    keeper-min over a surviving copy — the media-dedup rule), docs
    whose embedding has an in-threshold lower-id neighbour in its
    k-means cell are dropped, docs without an embedding row pass
    through.

    ``robots_src`` (round 7): an optional (host, robots_txt) table —
    inserts a ``robots_filter`` stage right after the URL gate: docs
    whose url the host's robots.txt disallows for ``robots_agent``
    (REAL stdlib parser, RFC group selection —
    ``mre.linkgraph.robots_allowed``) are dropped; hosts with no
    robots row allow everything. Requires a ``url`` column like
    ``url_gate``.

    ``input_tag`` folds an upstream-input marker into the parameter
    digest: a caller that pre-filters the corpus (e.g. run_corpus's
    host-rank gate) tags the input so a changed pre-filter recomputes
    stages instead of silently resuming against different data."""
    from .textops import cache_mark, release_caches
    if rewrite not in (None, "passages", "windows"):
        raise ValueError(f"rewrite must be None|'passages'|'windows', "
                         f"got {rewrite!r}")
    _mark = cache_mark()
    docs = src if isinstance(src, DataFrame) else read_table(spark, src)
    evals = read_table(spark, evals_src) if evals_src else None
    media = read_table(spark, media_src) if media_src else None
    emb = (read_table(spark, embeddings_src)
           if embeddings_src else None)
    ph = _params_hash(
        evals_src=evals_src, shingle_n=shingle_n,
        minhash_threshold=minhash_threshold,
        jaccard_threshold=jaccard_threshold,
        contamination_n=contamination_n,
        contamination_min_shared=contamination_min_shared,
        train_frac=train_frac, strict_quality=strict_quality,
        pii_max=pii_max, ngram_battery=ngram_battery,
        max_bucket=max_bucket,
        rewrite=rewrite, rewrite_max_df=rewrite_max_df,
        media_src=media_src, media_dedup=media_dedup,
        bpe_merges=bpe_merges, bpe_vocab_top=bpe_vocab_top,
        line_clean=line_clean,
        lm_max_nll=lm_max_nll, lm_vocab_top=lm_vocab_top,
        url_gate=url_gate, token_budget=token_budget,
        budget_weights_bp=(tuple(sorted(budget_weights_bp.items()))
                           if budget_weights_bp else None),
        budget_temperature_bp=budget_temperature_bp,
        nb_gate=nb_gate, nb_vocab_top=nb_vocab_top,
        dsir_top_frac=dsir_top_frac,
        dsir_target_lang=dsir_target_lang if dsir_top_frac else None,
        embeddings_src=embeddings_src,
        semdedup=((semdedup_k, semdedup_iters, semdedup_threshold)
                  if embeddings_src else None),
        robots_src=robots_src,
        robots_agent=robots_agent if robots_src else None,
        input_tag=input_tag)
    done = completed_stages(spark, lineage_dst, run_id, ph) if resume \
        else set()

    def _attempt(name: str) -> int:
        """1 + number of lineage rows already present for (run_id,
        stage) — tiny table, constant-shaped read."""
        try:
            lin = read_table(spark, lineage_dst)
        except Exception:
            return 1
        return 1 + lin.filter((F.col("run_id") == run_id)
                              & (F.col("stage") == name)).count()

    def _stage(name: str, build, n_in_df: DataFrame) -> DataFrame:
        """Skip-or-run one stage; returns its (re)readable output."""
        path = f"{dst}/{name}"
        if name in done:
            try:
                return read_table(spark, path)
            except Exception:
                pass  # committed but output missing → recompute
        t0 = time.monotonic()
        n_in = n_in_df.count()
        build().write.mode("overwrite").parquet(path)
        out = read_table(spark, path)
        n_out = out.count()
        wall_ms = int((time.monotonic() - t0) * 1000)
        row = spark.createDataFrame(
            [(run_id, name, n_in, n_out, wall_ms, ph, _attempt(name))],
            "run_id string, stage string, n_in long, n_out long, "
            "wall_ms long, params_hash string, attempt long")
        write_append(row.withColumn("completed_at", F.current_timestamp()),
                     lineage_dst)
        return out

    if url_gate:
        # stage 0 — the RefinedWeb-family URL gate, BEFORE any content
        # work (zero-shuffle projection; cheapest possible first cut)
        if "url" not in docs.columns:
            raise ValueError(
                "url_gate=True needs a 'url' column on the corpus "
                "(extraction output has one; plain documents tables "
                "may not)")
        from .textops import url_filter as _url_filter
        _pre_url = docs
        sU = _stage("url_filter",
                    lambda: _url_filter(_pre_url)
                    .filter(F.col("keep_url") == 1).select("doc_id"),
                    _pre_url)
        docs = docs.join(sU, "doc_id", "left_semi")
    if robots_src is not None:
        # crawl-policy compliance — drop robots-disallowed docs before
        # any content work (the other stage-0 family member)
        if "url" not in docs.columns:
            raise ValueError(
                "robots_src needs a 'url' column on the corpus")
        from .linkgraph import robots_allowed
        robots = read_table(spark, robots_src)
        _pre_rb = docs
        sR0 = _stage(
            "robots_filter",
            lambda: _pre_rb.select("doc_id", "url")
            .join(robots_allowed(_pre_rb.select("url"), robots,
                                 agent=robots_agent)
                  .filter(F.col("allowed") == 1).select("url"),
                  "url", "left_semi").select("doc_id"),
            _pre_rb)
        docs = docs.join(sR0, "doc_id", "left_semi")
    if line_clean:
        from .textops import c4_line_clean
        _raw = docs
        sL = _stage("line_clean",
                    lambda: c4_line_clean(_raw)
                    .filter(F.col("keep") == 1)
                    .select("doc_id", "text"),
                    _raw)
        # downstream stages see the page-filtered, line-rewritten text
        # with the original metadata columns riding along
        docs = _raw.drop("text").join(sL, "doc_id")
    s1 = _stage("quality",
                lambda: quality_keep_ids(docs, strict=strict_quality,
                                         pii_max=pii_max,
                                         ngram_battery=ngram_battery),
                docs)
    if nb_gate:
        # CCNet-style bootstrap: train a Naive Bayes classifier on the
        # heuristic gate's own verdicts (pass=1 / fail=0) and keep only
        # quality survivors the classifier ALSO accepts — boundary docs
        # that merely squeak past the rules but read like the rejected
        # class are dropped. Degenerate corpora (either class empty)
        # skip the stage as a no-op rather than failing the run.
        from .textops import nb_score, nb_train
        _s1_pre_nb = s1

        def _nb_keep():
            labeled = docs.join(
                _s1_pre_nb.withColumn("label", F.lit(1)),
                "doc_id", "left").withColumn(
                "label", F.coalesce("label", F.lit(0)))
            try:
                model, meta = nb_train(labeled, "label",
                                       vocab_top=nb_vocab_top)
            except ValueError:
                return _s1_pre_nb
            ok = (nb_score(docs, model, meta)
                  .filter(F.col("nb_pred") == 1).select("doc_id"))
            return _s1_pre_nb.join(ok, "doc_id", "left_semi")

        s1 = _stage("nb_filter", _nb_keep, _s1_pre_nb)
    d2 = docs.join(s1, "doc_id", "left_semi")
    base = docs
    if rewrite is not None:
        from .textops import remove_dup_passages, remove_dup_windows
        _rw = (remove_dup_passages if rewrite == "passages"
               else remove_dup_windows)
        sR = _stage("rewrite",
                    lambda: _rw(d2, max_df=rewrite_max_df)
                    .select("doc_id", "text"),
                    s1)
        # downstream stages consume the REWRITTEN text with the
        # original metadata columns riding along
        base = docs.drop("text").join(sR, "doc_id")
        d2 = base
    s2 = _stage("exact_dedup", lambda: exact_keeper_ids(d2), s1)
    if media is not None:
        _s2_text = s2   # pin: the lambda must see the TEXT-dedup ids
        s2 = _stage(
            "media_dedup",
            lambda: _s2_text.join(
                media_loser_ids(
                    media.join(_s2_text, "doc_id", "left_semi"),
                    mode=media_dedup),
                "doc_id", "left_anti"),
            _s2_text)
    if emb is not None:
        _s2_text2 = s2   # pin: the lambda must see the pre-semantic ids
        s2 = _stage(
            "semantic_dedup",
            lambda: _s2_text2.join(
                semantic_loser_ids(
                    emb.join(_s2_text2, "doc_id", "left_semi"),
                    k=semdedup_k, iters=semdedup_iters,
                    threshold=semdedup_threshold),
                "doc_id", "left_anti"),
            _s2_text2)
    if lm_max_nll is not None:
        _s2_pre_lm = s2   # pin: the lambda must see the pre-LM ids
        s2 = _stage(
            "lm_filter",
            lambda: _s2_pre_lm.join(
                lm_keep_ids(base.join(_s2_pre_lm, "doc_id", "left_semi"),
                            lm_max_nll, vocab_top=lm_vocab_top),
                "doc_id", "left_semi"),
            _s2_pre_lm)
    d3 = base.join(s2, "doc_id", "left_semi")
    s3 = _stage(
        "near_dup",
        lambda: s2.join(
            near_dup_loser_ids(d3, shingle_n=shingle_n,
                               minhash_threshold=minhash_threshold,
                               jaccard_threshold=jaccard_threshold,
                               max_bucket=max_bucket),
            "doc_id", "left_anti"),
        s2)
    d4 = base.join(s3, "doc_id", "left_semi")
    if evals is not None:
        s4 = _stage(
            "decontaminate",
            lambda: s3.join(
                contaminated_ids(d4, evals, n=contamination_n,
                                 min_shared=contamination_min_shared),
                "doc_id", "left_anti"),
            s3)
    else:
        s4 = _stage("decontaminate", lambda: s3, s3)
    if dsir_top_frac is not None:
        # DSIR selection — keep the top fraction of fully-deduped,
        # decontaminated survivors by importance weight toward the
        # target-language subset, before mixture assembly sees them
        from .textops import dsir_topk
        _s4_pre_d = s4

        def _dsir():
            surv = base.join(_s4_pre_d, "doc_id", "left_semi")
            k = int(surv.count() * float(dsir_top_frac))
            return dsir_topk(surv,
                             F.col("lang") == dsir_target_lang,
                             k).select("doc_id")

        s4 = _stage("dsir_select", _dsir, _s4_pre_d)
    if token_budget is not None:
        # mixture assembly — fill the per-source token budget from the
        # fully-curated survivors, before the split freezes the corpus
        from .textops import budget_sample, mixture_weights_bp
        if budget_weights_bp and budget_temperature_bp is not None:
            raise ValueError("budget_weights_bp and "
                             "budget_temperature_bp are mutually "
                             "exclusive")
        _s4_pre_b = s4

        def _budget():
            surv = base.join(_s4_pre_b, "doc_id", "left_semi")
            wbp = budget_weights_bp
            if budget_temperature_bp is not None:
                # bounded per-source collect, computed inside the
                # stage so a resumed run never pays it
                wbp = {r["source"]: int(r["weight_bp"])
                       for r in mixture_weights_bp(
                           surv, alpha_bp=budget_temperature_bp)
                       .collect()}
            return budget_sample(surv, token_budget,
                                 weights_bp=wbp).select("doc_id")

        s4 = _stage("budget_sample", _budget, _s4_pre_b)
    d5 = base.join(s4, "doc_id", "left_semi")
    _stage("split",
           lambda: hash_split(d5, "text", train_frac).drop("text"),
           s4)
    if bpe_merges > 0:
        from .bpe import bpe_learn, bpe_merges_df, bpe_tokenize
        sM = _stage(
            "bpe_merges",
            lambda: bpe_merges_df(
                spark, bpe_learn(d5, num_merges=bpe_merges,
                                 vocab_top=bpe_vocab_top)),
            s4)
        # ≤ bpe_merges rows by construction — bounded, never
        # corpus-shaped; ordered so application replays rank order
        merges = [(r["left"], r["right"], r["cnt"])
                  for r in sM.orderBy("rank").collect()]
        _stage("tokens", lambda: bpe_tokenize(d5, merges), sM)
    # every stage is materialized to parquet above — the intermediates
    # the textops helpers persisted DURING THIS JOB are dead weight from
    # here on; scoped to the entry mark so checkpoints owned by other
    # live plans in the session are untouched
    release_caches(since=_mark)


def read_curated(spark: SparkSession, dst: str) -> DataFrame:
    """The final curated table (surviving docs + split assignment)."""
    return read_table(spark, f"{dst}/split")


def curation_funnel(spark: SparkSession, dst: str,
                    docs: DataFrame,
                    group_col: str = "source") -> DataFrame:
    """Per-source attribution of the curation funnel — WHICH domains
    lose documents at WHICH stage ("why did my corpus shrink?"). For
    every stage id-list materialized under ``{dst}/{stage}`` (whatever
    subset of stages the run enabled, discovered from the directory),
    counts the surviving docs per ``group_col``: one narrow semi-join
    + count per stage, each against an id-list that is already on
    disk — nothing recomputes. Columns: stage, <group_col>, n_docs.
    Read it pivoted (stage × source) for the report."""
    out = None
    hadoop = spark._jvm.org.apache.hadoop
    fs = hadoop.fs.FileSystem.get(spark._jsc.hadoopConfiguration())
    path = hadoop.fs.Path(dst)
    if not fs.exists(path):
        raise FileNotFoundError(dst)
    stages = sorted(
        f.getPath().getName() for f in fs.listStatus(path)
        if f.isDirectory())
    base = docs.select("doc_id", group_col)
    for stage in stages:
        try:
            ids = read_table(spark, f"{dst}/{stage}").select("doc_id")
        except Exception:
            continue  # non-id-list artifacts (bpe_merges, tokens, …)
        cnt = (base.join(ids, "doc_id", "left_semi")
               .groupBy(group_col)
               .agg(F.count("*").alias("n_docs"))
               .select(F.lit(stage).alias("stage"), group_col,
                       "n_docs"))
        out = cnt if out is None else out.unionByName(cnt)
    if out is None:
        raise ValueError(f"no stage outputs under {dst}")
    return out


def read_curate_lineage(spark: SparkSession, lineage_dst: str) -> DataFrame:
    """Curation lineage resolved to ONE row per (run_id, stage): the
    latest attempt (ADVICE r4 — recomputed stages append rather than
    rewrite, so raw reads double-count n_in/n_out; every rollup should
    consume this view, not the raw table). Pre-params_hash tables lack
    ``attempt`` — deduped on latest completed_at instead (recompute-
    appended duplicates predate the counter but not the timestamp)."""
    from pyspark.sql import Window
    lin = read_table(spark, lineage_dst)
    if "attempt" not in lin.columns:
        w = Window.partitionBy("run_id", "stage").orderBy(
            F.desc("completed_at"))
        return (lin.withColumn("_rn", F.row_number().over(w))
                .filter(F.col("_rn") == 1).drop("_rn"))
    w = Window.partitionBy("run_id", "stage").orderBy(
        F.desc("attempt"), F.desc("completed_at"))
    return (lin.withColumn("_rn", F.row_number().over(w))
            .filter(F.col("_rn") == 1).drop("_rn"))


# --------------------------------------------------------------------------
# extract → curate glue (VERDICT r4 #5): the full crawl-to-corpus journey


def extracted_to_documents(results: DataFrame,
                           wide_id: bool = False) -> DataFrame:
    """Adapter from ``run_extract``'s url-keyed EXTRACT_SCHEMA output to
    the doc_id-keyed ``documents`` shape every curation op consumes.

    * ``doc_id = xxhash64(url)`` — deterministic and engine-stable, so
      re-runs and both pipeline halves agree on identity. 64-bit ids
      expect ~n²/2^65 collisions (≈3·10⁴ at 10^12 docs — two urls
      sharing a doc_id would merge in per-doc stats). ``wide_id=True``
      (VERDICT r5 #5) widens identity to 128 bits by adding a second
      independent column ``doc_id_hi = xxhash64(url, 42)`` that rides
      through every stage (the curation ops still key their shuffles on
      the 64-bit half — collisions there only cost a merged stat row,
      while the PAIR uniquely identifies the url at 10^12+ docs for
      join-back / audit). Sandbox corpora are ≥15 orders of magnitude
      below the 64-bit birthday bound, so the default stays narrow.
    * ``text`` = extracted main content (docs the extractor failed on
      carry '' and are dropped by the quality stage, not lost silently —
      they stay visible in the extraction lineage's n_failed).
    * ``lang`` = marker-heuristic language-ID over the extracted text
      (``lang_pred_expr`` — the prediction as a column expression, fused
      into the same projection; a join back to ``lang_id`` would shuffle
      the corpus text AND multiply rows on a doc_id collision);
      ``source`` = the url's host (the domain-rollup key).
    * headline / pubdate / authors ride along so the CURATED table is a
      complete training corpus, not ids that need a join back to the
      extraction sink.
    ONE projection over the scan — zero shuffle, single read."""
    from .textops import lang_pred_expr
    text = F.coalesce(F.col("extracted_text"), F.lit(""))
    id_cols = [F.xxhash64("url").alias("doc_id")]
    out_cols = ["doc_id"]
    if wide_id:
        id_cols.append(F.xxhash64("url", F.lit(42)).alias("doc_id_hi"))
        out_cols.append("doc_id_hi")
    return (results
            .select(*id_cols,
                    "url", text.alias("text"),
                    "headline", "pubdate", "authors",
                    F.regexp_extract("url", r"^[a-z]+://([^/]+)", 1)
                    .alias("source"))
            .select(*out_cols, "url", "text",
                    lang_pred_expr().alias("lang"), "source",
                    F.length("text").alias("n_chars"),
                    "headline", "pubdate", "authors"))


def _index_meta(spark: SparkSession, index_dst: str):
    """Build parameters of an index, as a dict with keys ``k``, ``n``,
    ``bands`` (None for an index predating the pre-banded layout) and
    ``parts`` (None predating the hash-bucketed layout); None for a
    pre-meta index. ADVICE r6 #3: a genuinely ABSENT meta table selects
    the legacy path (probed through the Hadoop FS API), but a meta table
    that exists and fails to READ propagates — the old broad except made
    a transient read failure silently skip the bands append on a
    pre-banded index, leaving ``{index}/bands`` stale. ``iceberg:`` URIs
    keep the lenient probe (a catalog read failure is indistinguishable
    from table-absent there; iceberg commits are atomic, so a half-
    written meta cannot exist)."""
    from .io import ICEBERG_PREFIX, _hadoop_fs
    meta_path = f"{index_dst}/meta"
    cached = _META_CACHE.get(index_dst)
    if cached is not None:
        return cached
    if meta_path.startswith(ICEBERG_PREFIX):
        try:
            r = read_table(spark, meta_path).first()
        except Exception:
            return None
    else:
        fs, p = _hadoop_fs(spark, meta_path)
        if not fs.exists(p):
            return None
        r = read_table(spark, meta_path).first()   # errors propagate
    f = r.__fields__
    meta = {"k": r["k"], "n": r["n"],
            "bands": r["bands"] if "bands" in f else None,
            "parts": r["parts"] if "parts" in f else None}
    _META_CACHE[index_dst] = meta
    return meta


# Build parameters are immutable for the life of an index path (written
# once by build_dedup_index; appends/compaction/deletion never change
# them), so the one-row meta read — a full Spark job per ingest call,
# and every ingest epoch pays it at least twice — is memoized per path
# within the process. build_dedup_index drops the entry before
# rewriting (a rebuilt index at the same path gets fresh parameters);
# an ABSENT meta (None) is never cached so an index built later in the
# process is picked up.
_META_CACHE: dict[str, dict] = {}


def _bucket_expr(table: str, parts: int):
    """The hash-bucket (partition) column of one index table — the ONE
    definition both the writers and the pruning readers use, so the
    directory a row lands in and the directory a probe looks in can
    never disagree. band_hash is already a hash (uniform), doc_id is
    xxhash64(url) (uniform); fingerprints hash the digest string."""
    if table == "bands":
        return F.pmod(F.col("band_hash").cast("long"), F.lit(parts))
    if table == "signatures":
        return F.pmod(F.col("doc_id"), F.lit(parts))
    if table == "fingerprints":
        return F.pmod(F.xxhash64(F.col("fingerprint")), F.lit(parts))
    raise ValueError(f"no bucket expression for index table {table!r}")


def _read_index(spark: SparkSession, index_dst: str, table: str,
                parts: int | None = None,
                touch_keys: Optional[DataFrame] = None) -> DataFrame:
    """Read one index table, hiding the physical ``pb`` bucket column.

    With ``parts`` set and ``touch_keys`` given (a batch-shaped frame
    carrying the table's key column), the read is STATICALLY PRUNED to
    the hash buckets the batch touches (VERDICT r6 #1: the pre-banded
    layout made the index side scan-only, but scan-only was still
    O(index) I/O per batch — ~450 B/doc × 10^12 docs, per ingest,
    forever). The touched-bucket list is a ``distinct().collect()`` of
    ≤ ``parts`` ints — bounded by the layout constant, never
    batch- or corpus-shaped — and feeds an ``isin`` filter on the
    partition column, which Catalyst turns into file-listing-level
    partition pruning (PartitionFilters on the scan): untouched bucket
    directories are never opened. Rows outside touched buckets cannot
    equi-join a batch key by construction (same ``_bucket_expr`` both
    sides), so pruning is semantics-preserving for every probe/semi/anti
    use below."""
    df = read_table(spark, f"{index_dst}/{table}")
    if "pb" not in df.columns:
        return df
    if parts and touch_keys is not None:
        touched = [r["pb"] for r in touch_keys.select(
            _bucket_expr(table, parts).alias("pb")).distinct().collect()]
        df = df.filter(F.col("pb").isin(touched))
    return df.drop("pb")


def build_dedup_index(spark: SparkSession, docs: DataFrame, dst: str, *,
                      k: int = 32, n: int = 3, bands: int = 8,
                      parts: int | None = 32) -> None:
    """Materialize the NARROW dedup index of an existing corpus so later
    crawl batches can be deduplicated against it WITHOUT ever re-reading
    corpus text (the incremental-ingestion story a daily 100 TB crawl
    needs — re-running full-corpus dedup per batch is O(corpus) a day,
    the index path is O(batch)):

        {dst}/meta          (k, n, bands, parts)     build parameters
        {dst}/fingerprints  (doc_id, fingerprint)    md5 digest, exact
        {dst}/signatures    (doc_id, sig)            MinHash k longs
        {dst}/bands         (doc_id, band_idx, band_hash)  PRE-BANDED

    ~450 B/doc total — roughly two orders of magnitude below corpus
    text at a ~10 KB/doc average. The bands table is the VERDICT r5 #2
    fix: LSH band rows are derived ONCE at build/update time and stored,
    so each ingest batch scans narrow pre-banded rows instead of
    band-exploding the full signature index (an 8× Generate over the
    whole index, per batch, forever).

    ``parts`` (VERDICT r6 #1) lays every table out HASH-BUCKETED on its
    probe key — ``pb = pmod(key_hash, parts)`` partition directories
    (bands on band_hash, signatures on doc_id, fingerprints on the
    digest) — so each ingest batch reads only the buckets its keys
    touch instead of the full index: per-batch I/O drops from O(index)
    to O(index · touched/parts). Size ``parts`` so a typical batch
    touches a small fraction — the sandbox default 32 keeps test
    layouts readable; a 10^12-doc deployment wants 2^14–2^16 (a 10^4-doc
    batch probing 8·10^4 band keys then touches ~70%/~11%/~1.2% of a
    2^10/2^16/2^20-bucket index — prune factor rises with parts, at the
    cost of more directories for the store to list). ``parts=None``
    keeps the flat legacy layout. The meta row lets ``dedup_increment``
    fail LOUDLY on a parameter mismatch (signatures of different k
    would silently undercount the estimated Jaccard; bands of different
    width would hash-disagree). All writers go through the
    iceberg:-aware dispatch."""
    _META_CACHE.pop(dst, None)   # rebuilding may change parameters
    write_overwrite(
        spark.createDataFrame([(k, n, bands, parts)],
                              "k int, n int, bands int, parts int"),
        f"{dst}/meta")

    def _write(df: DataFrame, table: str) -> None:
        if parts is None:
            write_overwrite(df, f"{dst}/{table}")
        else:
            # cluster by bucket before the partitioned write (same
            # round-8 device as update_dedup_index's _append): without
            # it every task emits a file per pb value (tasks × parts
            # tiny files per table); after the narrow shuffle each
            # bucket is one task → one file per bucket, which also
            # makes every later bucket-pruned ingest scan open one
            # file per touched bucket instead of ~tasks
            dfp = df.withColumn("pb", _bucket_expr(table, parts))
            n = max(1, min(int(parts),
                           spark.sparkContext.defaultParallelism))
            write_overwrite(dfp.repartition(n, F.col("pb")),
                            f"{dst}/{table}", partition_col="pb")

    _write(minhash_signatures(docs, k, n), "signatures")
    # derive bands from the WRITTEN signatures — one narrow read, not a
    # second corpus scan + signature recompute
    sigs = _read_index(spark, dst, "signatures")
    _write(minhash_bands(sigs, bands), "bands")
    _write(fingerprint(docs), "fingerprints")


def update_dedup_index(spark: SparkSession, docs: DataFrame,
                       index_dst: str, *, k: int = 32,
                       n: int = 3, sigs: DataFrame | None = None,
                       assume_fresh: bool = False) -> None:
    """Idempotently add ``docs`` to the index. Docs whose fingerprint is
    already present are skipped entirely; for the rest, bands and
    signatures are appended FIRST and fingerprints LAST, so a crash
    anywhere in between leaves a state a retry repairs (fingerprint
    absent → the doc is re-selected; its duplicate band/signature rows
    are harmless — candidate generation is distinct()-deduped).
    Fingerprint-present therefore implies band- and signature-present.
    The bands append maintains the pre-banded layout (indexes predating
    it — no bands table recorded in meta — skip that half and keep
    their explode-at-read behavior); the hash-bucketed layout is
    likewise maintained (appends land in the matching ``pb``
    directories).

    Raises on a (k, n) mismatch with the index's recorded build
    parameters, like ``dedup_increment`` (ADVICE r6 #3: a mismatched
    caller used to silently append incompatible signatures). The
    already-present probe is index-preserving — the (bucket-pruned)
    fingerprint index is scanned and probed against the BROADCAST batch
    digests, then the batch anti-joins the broadcast hit set — so the
    index is never shuffled here either.

    Round-8 fast-path knobs (both default OFF — semantics unchanged):

    * ``sigs``: a precomputed (doc_id, sig) frame covering ⊇ the fresh
      docs (e.g. the signature frame ``dedup_increment`` already
      materialized for the same batch) — the k-hash signature scan is
      replaced by a batch-shaped semi-join against it.
    * ``assume_fresh=True``: skip the already-present probe entirely
      and treat every ``docs`` row as fresh. ONLY safe when the caller
      guarantees the index has not been touched for this batch — the
      streaming ``ingest_epoch`` fresh path provides exactly that (its
      marker protocol routes every retry-after-partial-append through
      the 'written' path, which calls this WITHOUT assume_fresh, so the
      fingerprint guard still protects the crash window). ``docs`` must
      be materialized (checkpointed) by the caller in this mode."""
    meta = _index_meta(spark, index_dst)
    if meta is not None and (meta["k"], meta["n"]) != (k, n):
        raise ValueError(
            f"dedup index at {index_dst} was built with "
            f"(k, n)=({meta['k']}, {meta['n']}); got (k={k}, n={n}) — "
            f"appended signatures would silently disagree")
    bands = meta["bands"] if meta is not None else None
    parts = meta["parts"] if meta is not None else None
    from pyspark import StorageLevel
    from .textops import _release_local_checkpoint
    fp_docs = None
    if assume_fresh:
        fresh = docs
    else:
        # fp_docs feeds three consumers (touched-bucket collect,
        # broadcast probe set, anti-join) — persist so the batch digest
        # projection runs once (batch-shaped); unpersisted at the end
        fp_docs = fingerprint(docs).persist(StorageLevel.MEMORY_AND_DISK)
        fps_idx = _read_index(spark, index_dst, "fingerprints", parts,
                              fp_docs)
        already = (fps_idx.select("fingerprint")
                   .join(F.broadcast(fp_docs.select("fingerprint")
                                     .distinct()),
                         "fingerprint", "left_semi"))
        fresh_ids = (fp_docs
                     .join(F.broadcast(already), "fingerprint",
                           "left_anti")
                     .select("doc_id"))
        fresh = docs.join(fresh_ids, "doc_id", "left_semi") \
            .localCheckpoint(eager=True)  # several appends read it; and
        # never re-evaluate against the index mid-mutation

    def _append(df: DataFrame, table: str) -> None:
        if parts is None:
            write_append(df, f"{index_dst}/{table}")
        else:
            # cluster by bucket before the partitioned write: without
            # this every writing task emits a file per pb value it
            # holds (~tasks × touched-buckets tiny files + as many
            # commit renames PER append — measured ~1 s of the ~1.5 s
            # per-table append cost at batch scale, round 8); after the
            # (narrow, batch-shaped) shuffle each touched bucket lands
            # in exactly one task → files == touched buckets, and the
            # index accumulates far fewer small files between
            # compactions (guide §6)
            dfp = df.withColumn("pb", _bucket_expr(table, parts))
            n = max(1, min(int(parts),
                           spark.sparkContext.defaultParallelism))
            write_append(dfp.repartition(n, F.col("pb")),
                         f"{index_dst}/{table}", partition_col="pb")

    if sigs is not None:
        fresh_sigs = (sigs.join(fresh.select("doc_id"), "doc_id",
                                "left_semi")
                      .localCheckpoint(eager=True))
    else:
        fresh_sigs = minhash_signatures(fresh, k, n) \
            .localCheckpoint(eager=True)
    if bands is not None:
        _append(minhash_bands(fresh_sigs, bands), "bands")
    _append(fresh_sigs, "signatures")
    _append(fingerprint(fresh), "fingerprints")
    if fp_docs is not None:
        fp_docs.unpersist()
    _release_local_checkpoint(fresh_sigs)
    if fresh is not docs:
        _release_local_checkpoint(fresh)


def dedup_increment(spark: SparkSession, new_docs: DataFrame,
                    index_dst: str, *, k: int = 32, n: int = 3,
                    bands: int = 8, threshold: float = 0.5,
                    max_bucket: int | None = None,
                    update_index: bool = True) -> DataFrame:
    """Ingestion-time dedup of a NEW batch against an existing corpus via
    its ``build_dedup_index`` tables — corpus text is never touched:

    1. within-batch exact dedup (keep min doc_id per fingerprint);
    2. drop batch docs whose fingerprint already exists in the index
       (anti-join on the digest — one narrow shuffle);
    3. near-dup vs the CORPUS: the batch's LSH bands (explicitly
       broadcast — batch-shaped) equi-join the index's PRE-BANDED
       ``{index}/bands`` table (VERDICT r5 #2: stored at build/update
       time, so NO per-batch Generate/explode over the full signature
       index; legacy indexes without a bands table fall back to
       deriving bands at read), candidates verified by signature
       agreement (``EST_JACCARD_SQL``, the same expression the
       within-corpus verifier uses; est ≥ threshold ⇒ drop the batch
       doc) — no text, no quadratic self-join, no index-side shuffle
       (both index scans feed broadcast joins). Index rows carrying the
       batch doc's OWN id are excluded, so a retry after a crashed
       index update converges instead of self-matching;
    4. within-batch near-dup: candidates from the already-computed
       batch signatures, verified by the same estimator, grouped by
       ``dup_clusters`` and resolved keep-cluster-min — the SAME keep
       semantics as the full-corpus ``run_curate`` path (ADVICE r5 #4:
       the direct-edge rule disagreed with cluster-min on chains, so
       the fast and slow cadences could diverge on identical input;
       the batch-sized pair set makes the component pass cheap).

    Returns the surviving new docs (all columns). ``update_index=True``
    checkpoints the survivors (batch-shaped) and appends their
    digest/signature/band rows via ``update_dedup_index`` so the NEXT
    batch sees this one; the intermediates this call persisted are then
    released (scoped — other live plans' caches are untouched). With
    ``update_index=False`` the caller owns both the write-ordering (see
    scripts/run_ingest.py: commit the accepted table FIRST, then update
    the index) and the cache release. ``max_bucket`` guards viral bands
    with the same bucket-size-≤-cap semantics as ``minhash_candidates``,
    computed over only the buckets the batch touches (a semi-join of the
    bands table against the broadcast batch band keys — never a
    full-index groupBy per batch). Raises on a k/n/bands mismatch with
    the index's recorded build parameters. Eventual-exactness caveat:
    step 3 is the estimator path (signatures only); run the
    LSH+exact-confirm ``run_curate`` pipeline over the full corpus at a
    slower cadence if exact-Jaccard confirmation is required."""
    from pyspark import StorageLevel
    from .textops import (EST_JACCARD_SQL, _CkptHandle, _register_cache,
                          cache_mark, minhash_candidates,
                          minhash_signatures, release_caches)

    meta = _index_meta(spark, index_dst)
    if meta is not None and (meta["k"], meta["n"]) != (k, n):
        raise ValueError(
            f"dedup index at {index_dst} was built with "
            f"(k, n)=({meta['k']}, {meta['n']}); got (k={k}, n={n}) — "
            f"signatures would silently disagree")
    pre_banded = meta is not None and meta["bands"] is not None
    if pre_banded and meta["bands"] != bands:
        raise ValueError(
            f"dedup index at {index_dst} was pre-banded with "
            f"bands={meta['bands']}; got bands={bands} — stored band "
            f"hashes would silently disagree")
    parts = meta["parts"] if meta is not None else None
    mark = cache_mark()

    # 1+2: exact, within batch then vs index. The deduped batch feeds
    # four downstream plan branches (signatures ×2, near-dup, final
    # survivors) — persisted so the fingerprint shuffle and the source
    # scan run once (module convention). The vs-index half is the
    # index-preserving probe shape (bucket-pruned scan → broadcast-probe
    # against the batch digests → batch anti-joins the broadcast hit
    # set): the fingerprint index is never shuffled, and with the
    # bucketed layout only touched ``pb`` directories are even opened.
    fp_new = fingerprint(new_docs)
    # keep feeds three consumers (touched-bucket collect, broadcast
    # probe set, final anti-join) — persist so the batch fingerprint
    # shuffle runs once (batch-shaped)
    keep = _register_cache(
        fp_new.groupBy("fingerprint")
        .agg(F.min("doc_id").alias("doc_id"))
        .persist(StorageLevel.MEMORY_AND_DISK))
    fps_idx = _read_index(spark, index_dst, "fingerprints", parts, keep)
    fp_hits = (fps_idx.select("fingerprint")
               .join(F.broadcast(keep.select("fingerprint")),
                     "fingerprint", "left_semi"))
    keep = (keep.join(F.broadcast(fp_hits), "fingerprint", "left_anti")
            .select("doc_id"))
    batch = _register_cache(
        new_docs.join(keep, "doc_id", "left_semi")
        .persist(StorageLevel.MEMORY_AND_DISK))

    # 3: near-dup vs corpus — batch bands broadcast against the stored
    # pre-banded index (scan-only on the index side, pruned to the
    # band-hash buckets the batch touches)
    sig_new = _register_cache(minhash_signatures(batch, k, n)
                              .persist(StorageLevel.MEMORY_AND_DISK))
    nb = minhash_bands(sig_new, bands)
    if pre_banded:
        ib = _read_index(spark, index_dst, "bands", parts, nb)
    else:   # legacy layout: derive at read (one-off; rebuild to fix)
        ib = minhash_bands(_read_index(spark, index_dst, "signatures"),
                           bands)
    if max_bucket is not None:
        # size ONLY the buckets the batch touches: bucket contents are
        # identical to the full-index grouping, untouched buckets can't
        # produce candidates — so the guard semantics are unchanged
        # while the index side stays a scan + broadcast semi-join
        keys = nb.select("band_idx", "band_hash").distinct()
        touched = _register_cache(
            ib.join(F.broadcast(keys), ["band_idx", "band_hash"],
                    "left_semi")
            .persist(StorageLevel.MEMORY_AND_DISK))
        sizes = (touched.groupBy("band_idx", "band_hash")
                 .agg(F.count("*").alias("_bsz"))
                 .filter(F.col("_bsz") <= max_bucket).drop("_bsz"))
        ib = touched.join(F.broadcast(sizes), ["band_idx", "band_hash"])
    # candidate pairs feed two consumers — the verifier join AND the
    # touched-bucket derivation for the pruned signature fetch. NOT
    # persisted: caching would splice an InMemoryRelation over the
    # bands scan and hide the scan-only plan shape the layout
    # guarantees; the join is recomputed once instead, and both
    # executions are bucket-pruned broadcast probes (batch-shaped)
    cands = (ib.alias("i").join(
        F.broadcast(nb.alias("n")),
        (F.col("n.band_idx") == F.col("i.band_idx"))
        & (F.col("n.band_hash") == F.col("i.band_hash"))
        & (F.col("n.doc_id") != F.col("i.doc_id")))
        .select(F.col("n.doc_id").alias("new_id"),
                F.col("i.doc_id").alias("corpus_id"))
        .distinct())
    ca = cands.join(sig_new.select(F.col("doc_id").alias("new_id"),
                                   F.col("sig").alias("sig_a")),
                    "new_id")
    # the verifier's sig_b fetch prunes to the doc_id buckets the
    # candidates live in (candidate-shaped key set)
    sigs_idx = _read_index(spark, index_dst, "signatures", parts,
                           cands.select(F.col("corpus_id")
                                        .alias("doc_id")))
    hits = (sigs_idx.select(F.col("doc_id").alias("corpus_id"),
                            F.col("sig").alias("sig_b"))
            .join(F.broadcast(ca), "corpus_id")
            .withColumn("est", F.expr(EST_JACCARD_SQL))
            .filter(F.col("est") >= threshold)
            .select(F.col("new_id").alias("doc_id")).distinct())
    deduped = batch.join(hits, "doc_id", "left_anti")

    # 4: within-batch near-dup — candidates from the ALREADY-computed
    # batch signatures (no recompute), cluster-min keep semantics
    sig_surv = _register_cache(
        sig_new.join(hits, "doc_id", "left_anti")
        .persist(StorageLevel.MEMORY_AND_DISK))
    bpairs = minhash_candidates(sig_surv, bands, max_bucket=max_bucket)
    confirmed = (bpairs
                 .join(sig_surv.select(F.col("doc_id").alias("doc_a"),
                                       F.col("sig").alias("sig_a")),
                       "doc_a")
                 .join(sig_surv.select(F.col("doc_id").alias("doc_b"),
                                       F.col("sig").alias("sig_b")),
                       "doc_b")
                 .withColumn("est", F.expr(EST_JACCARD_SQL))
                 .filter(F.col("est") >= threshold)
                 .select("doc_a", "doc_b"))
    clusters = dup_clusters(confirmed)
    losers = (clusters.filter(F.col("doc_id") != F.col("cluster_id"))
              .select("doc_id"))
    survivors = deduped.join(losers, "doc_id", "left_anti")

    if update_index:
        # materialize BEFORE mutating the index the plan reads from
        # (the survivor plan anti-joins those tables); batch-shaped
        survivors = survivors.localCheckpoint(eager=True)
        # reuse the signature frame this call already materialized —
        # update_dedup_index semi-joins it instead of re-running the
        # k-hash signature scan over the survivors (round 8)
        update_dedup_index(spark, survivors, index_dst, k=k, n=n,
                           sigs=sig_surv)
        # the checkpoint truncated the lineage — this call's persisted
        # intermediates are dead; the checkpoint itself goes to the
        # registry for the caller to release after consuming the result
        release_caches(since=mark)
        _register_cache(_CkptHandle(survivors))
    else:
        # expose the already-materialized survivor signatures so a
        # caller that owns the index update (scripts/run_ingest.py, the
        # streaming ingest_epoch) can hand them to update_dedup_index
        # instead of recomputing; the attribute dies with this plan
        # object — checkpoint/copy it before the caller's release point
        survivors._mre_sig_surv = sig_surv
    return survivors


def compact_dedup_index(spark: SparkSession, index_dst: str,
                        target_partitions: int | None = None) -> None:
    """Index maintenance: every ``dedup_increment`` batch APPENDS a few
    files to the fingerprint/signature/band tables, so after thousands
    of batches the index is a small-file swarm that destroys scan and
    planning time. Rewrites each table into ``target_partitions`` files
    (default: the session's ``spark.sql.shuffle.partitions``); the
    bands table is additionally clustered on ``band_hash`` (repartition
    + sort-within-partitions) so parquet row-group min/max stats line up
    with the ingest join key. Hash-bucketed layouts (``pb`` directories,
    VERDICT r6 #1) are preserved: each bucket's file swarm collapses to
    one file per bucket (repartition on ``pb`` → one task per bucket),
    key-sorted within, so ingest-time partition pruning survives
    compaction.

    Crash safety (ADVICE r5 #3): the rewrite goes to a SIBLING temp
    directory and is promoted by rename (``mre.io.swap_dirs``) on every
    filesystem where directory rename IS atomic — local, file://,
    hdfs://, viewfs:// (ADVICE r6 #2: hdfs: paths were wrongly routed to
    the fallback) — never overwrite-in-place from a lineage-free
    snapshot of the same path, where losing an executor mid-rewrite
    after the delete would destroy the only copy of the index
    (rebuilding it is the O(corpus) scan the index exists to avoid).
    Reading from ``path`` while writing to ``path.tmp`` also needs NO
    checkpoint at all. Object stores (s3a://, gs://) emulate rename and
    keep the checkpoint-overwrite fallback; on Iceberg this maps to the
    atomic rewrite_data_files. Content-preserving.

    CONCURRENCY (ADVICE r6 #4): the swap has a between-renames window
    where the table path does not exist — do NOT run compaction
    concurrently with ingest jobs reading the same index (schedule it in
    the ingest idle window). A crash inside the window is self-healing:
    the next compaction (or ``mre.io.recover_swapped_dir``) restores the
    table from its ``.old`` sibling."""
    from .io import atomic_rename_fs, recover_swapped_dir, swap_dirs
    n = target_partitions or int(
        spark.conf.get("spark.sql.shuffle.partitions"))
    tables = ["fingerprints", "signatures"]
    meta = _index_meta(spark, index_dst)
    if meta is not None and meta["bands"] is not None:
        tables.append("bands")
    for table in tables:
        path = f"{index_dst}/{table}"
        if atomic_rename_fs(path):
            recover_swapped_dir(spark, path)   # heal a prior crash
        df = read_table(spark, path)
        partitioned = "pb" in df.columns
        if partitioned:
            df = df.repartition(n, "pb")
        elif table == "bands":
            df = df.repartition(n, "band_hash")
        else:
            df = df.repartition(n)
        if table == "bands":
            df = df.sortWithinPartitions("band_idx", "band_hash")
        pcol = "pb" if partitioned else None
        if not atomic_rename_fs(path):
            # table formats / object stores: overwrite is either atomic
            # (iceberg) or rename is not (s3) — write through the
            # dispatch and let the catalog/committer own atomicity
            snap = df.localCheckpoint(eager=True)
            write_overwrite(snap, path, partition_col=pcol)
            from .textops import _release_local_checkpoint
            _release_local_checkpoint(snap)
            continue
        if pcol is None:
            df.write.mode("overwrite").parquet(f"{path}.tmp")
        else:
            df.write.mode("overwrite").partitionBy(pcol) \
                .parquet(f"{path}.tmp")
        swap_dirs(spark, f"{path}.tmp", path)


def remove_from_dedup_index(spark: SparkSession, doc_ids,
                            index_dst: str) -> None:
    """Index lifecycle — DELETIONS (VERDICT r6 #8): retract docs from
    the dedup index (takedowns, re-crawls, curation reversals). Without
    this, dead index rows keep suppressing matching NEW docs forever —
    a corpus that legally removed a document could never re-admit a
    fresh crawl of equivalent content. After removal, re-ingesting the
    same (or near-same) content is admitted again.

    ``doc_ids``: a DataFrame with a ``doc_id`` column, or an iterable of
    ids. Idempotent — a crash mid-way re-runs safely (each table's
    delete is an anti-join rewrite; re-applying is a no-op). Tables are
    processed bands → signatures → fingerprints: the bands delete
    derives the victims' band rows from their still-present signature
    rows, so it must run while those rows exist; a retry after any
    partial state still finds what it needs.

    Scale shape: on the hash-bucketed layout only the buckets that
    actually CONTAIN victim rows are rewritten (signature buckets from
    the victims' doc_ids, band buckets from their derived band hashes —
    both computed without scanning the index; the fingerprint pass
    scans the digest table once to discover the victims' digests, but
    still rewrites only touched buckets). Buckets left EMPTY by the
    delete are dropped at the filesystem (a dynamic overwrite with zero
    rows would leave them stale). Flat legacy layouts fall back to a
    full anti-join rewrite promoted by swap. On Iceberg this maps to a
    plain ``DELETE WHERE`` (position/equality deletes). Like
    compaction, do not run concurrently with ingest against the same
    index. Same-session callers that ran dedup ops over this index
    earlier should ``mre.textops.release_caches()`` first — Spark's
    plan-matching cache would otherwise serve pre-removal index rows to
    later probes (the ingest CLI already releases per command)."""
    from .io import (_hadoop_fs, atomic_rename_fs, swap_dirs,
                     write_overwrite_partitions)
    from .textops import _release_local_checkpoint
    meta = _index_meta(spark, index_dst)
    parts = meta["parts"] if meta is not None else None
    bands_n = meta["bands"] if meta is not None else None
    if isinstance(doc_ids, DataFrame):
        ids = doc_ids.select("doc_id").distinct()
    else:
        ids = spark.createDataFrame([(int(i),) for i in doc_ids],
                                    "doc_id long")
    # pin the victim set — the loop below mutates the tables its own
    # derivations would otherwise lazily re-read
    ids = ids.localCheckpoint(eager=True)

    def _full_rewrite(table: str, keep: DataFrame) -> None:
        path = f"{index_dst}/{table}"
        if not atomic_rename_fs(path):
            snap = keep.localCheckpoint(eager=True)
            write_overwrite(snap, path)
            _release_local_checkpoint(snap)
            return
        keep.write.mode("overwrite").parquet(f"{path}.tmp")
        swap_dirs(spark, f"{path}.tmp", path)

    def _bucket_rewrite(table: str, victim_keys: DataFrame) -> None:
        """Rewrite only the pb buckets holding victim rows: dynamic
        partition overwrite for buckets with survivors, fs-delete for
        buckets emptied entirely."""
        path = f"{index_dst}/{table}"
        touched = [r["pb"] for r in victim_keys.select(
            _bucket_expr(table, parts).alias("pb")).distinct().collect()]
        if not touched:
            return
        df = read_table(spark, path).filter(F.col("pb").isin(touched))
        keep = df.join(F.broadcast(ids), "doc_id", "left_anti") \
            .localCheckpoint(eager=True)   # plan reads the path it rewrites
        kept_pbs = {r["pb"] for r in
                    keep.select("pb").distinct().collect()}
        write_overwrite_partitions(keep, path, "pb")
        for pb in set(touched) - kept_pbs:
            fs, p = _hadoop_fs(spark, f"{path}/pb={pb}")
            fs.delete(p, True)
        _release_local_checkpoint(keep)

    if parts is None:
        # flat layout: full anti-join rewrite per table
        if bands_n is not None:
            _full_rewrite("bands",
                          read_table(spark, f"{index_dst}/bands")
                          .join(F.broadcast(ids), "doc_id", "left_anti"))
        for t in ("signatures", "fingerprints"):
            _full_rewrite(t, read_table(spark, f"{index_dst}/{t}")
                          .join(F.broadcast(ids), "doc_id", "left_anti"))
        return

    # bucketed layout — victims' rows located without scanning:
    # their signature rows (pruned by doc_id bucket) yield the exact
    # band rows, hence the exact band buckets
    victim_sigs = (_read_index(spark, index_dst, "signatures", parts, ids)
                   .join(F.broadcast(ids), "doc_id", "left_semi")
                   .localCheckpoint(eager=True))
    if bands_n is not None:
        _bucket_rewrite("bands", minhash_bands(victim_sigs, bands_n))
    _bucket_rewrite("signatures", ids)
    # fingerprints are keyed by digest, not doc_id: one discovery scan
    # finds the victims' digest rows, then only their buckets rewrite
    victim_fps = (read_table(spark, f"{index_dst}/fingerprints")
                  .join(F.broadcast(ids), "doc_id", "left_semi")
                  .drop("pb").localCheckpoint(eager=True))
    _bucket_rewrite("fingerprints", victim_fps)
    _release_local_checkpoint(victim_fps)
    _release_local_checkpoint(victim_sigs)


def run_corpus(spark: SparkSession, src: str, workdir: str, run_id: str, *,
               evals_src: Optional[str] = None,
               buckets: Optional[int] = None, dedup: str = "window",
               resume: bool = True, materialize_documents: bool = False,
               wide_id: bool = False,
               host_rank_top_frac: float | None = None,
               host_rank_iters: int = 4, **curate_knobs) -> None:
    """The end-to-end corpus job: crawl pages → extraction → curation,
    one command, with lineage for BOTH halves under one root.

        {workdir}/extracted        url-keyed extraction output (P7 sink)
        {workdir}/curated/...      curation stage id-lists + split table
        {workdir}/lineage/extract  per-bucket extraction lineage
        {workdir}/lineage/curate   per-stage curation lineage
        {workdir}/documents        ONLY with materialize_documents=True

    The adapter between the halves is ZERO-COPY by default (VERDICT r5
    #1): ``extracted_to_documents`` is a pure projection, so the lazily-
    adapted DataFrame goes straight into ``run_curate`` — each curation
    stage's semi-join re-reads the extraction sink with the projection
    applied at scan time (column pruning makes it free), and NO second
    full-corpus copy is ever written. ``materialize_documents=True``
    opts back into a physical ``{workdir}/documents`` table for
    downstream consumers — and even then the rewrite is skipped on
    resume when the extract lineage shows no new work since the last
    adapter write (a sidecar ``documents_meta`` row records the extract
    lineage row count + row total the copy was derived from), so a
    no-op resume never re-writes the corpus.

    Resume spans the boundary: the extraction half resumes per salt
    bucket (run_extract's broadcast anti-join), the curation half per
    stage (run_curate's lineage). ``wide_id`` threads the 128-bit
    doc-identity knob through the adapter (see extracted_to_documents).
    ``curate_knobs`` pass through to run_curate (thresholds, pii_max,
    strict_quality, max_bucket, ...).

    ``host_rank_top_frac`` (round 7): the link-based host-quality
    prior — anchors are extracted from the RAW crawl pages (the only
    place the HTML still exists) through the extraction parser,
    PageRank runs ``host_rank_iters`` integer rounds over the weighted
    host graph (mre/linkgraph.py), and only docs whose host ranks in
    the top fraction (by rank_micro desc, host asc — the exact
    ``topk_by_weight`` device) enter curation. The pre-filter is
    folded into the curation parameter digest via ``input_tag`` so a
    changed fraction recomputes stages instead of silently resuming
    against different data."""
    from .pipeline import read_results, run_extract
    run_extract(spark, src, f"{workdir}/extracted",
                f"{workdir}/lineage/extract", run_id=run_id,
                buckets=buckets, resume=resume, dedup=dedup)
    docs = extracted_to_documents(
        read_results(spark, f"{workdir}/extracted"), wide_id=wide_id)
    if materialize_documents:
        ex_lin = read_table(spark, f"{workdir}/lineage/extract")
        sig = ex_lin.agg(
            F.count("*").alias("n_lineage_rows"),
            F.coalesce(F.sum("n_rows"), F.lit(0)).alias("n_rows")).first()
        cur = (int(sig["n_lineage_rows"]), int(sig["n_rows"]))
        prev = None
        try:
            m = read_table(spark, f"{workdir}/documents_meta").first()
            prev = (int(m["n_lineage_rows"]), int(m["n_rows"]))
        except Exception:
            pass
        if prev != cur:
            docs.write.mode("overwrite").parquet(f"{workdir}/documents")
            write_overwrite(
                spark.createDataFrame(
                    [cur], "n_lineage_rows long, n_rows long"),
                f"{workdir}/documents_meta")
        # the copy was paid for — curate from it (narrower scans than
        # re-projecting the url-keyed extraction sink per stage)
        docs = read_table(spark, f"{workdir}/documents")
    tag = curate_knobs.pop("input_tag", None)
    if host_rank_top_frac is not None:
        from .linkgraph import extract_links, host_edges, pagerank_hosts
        from .textops import topk_by_weight
        pages = read_table(spark, src).select("url", "html")
        pr = pagerank_hosts(
            host_edges(extract_links(pages)), iters=host_rank_iters)
        n_hosts = pr.count()
        allow = topk_by_weight(
            pr, int(n_hosts * float(host_rank_top_frac)),
            weight_col="rank_micro", id_col="host").select(
            F.col("host").alias("source"))
        docs = docs.join(F.broadcast(allow), "source", "left_semi")
        tag = f"{tag or ''}|hostrank:{host_rank_top_frac}" \
              f":{host_rank_iters}"
    run_curate(spark, docs, f"{workdir}/curated",
               f"{workdir}/lineage/curate", run_id=run_id,
               evals_src=evals_src, resume=resume, input_tag=tag,
               **curate_knobs)


__all__ = ["curate_df", "run_curate", "read_curated", "curation_funnel",
           "completed_stages",
           "quality_keep_ids", "exact_keeper_ids", "near_dup_loser_ids",
           "contaminated_ids", "media_loser_ids", "semantic_loser_ids",
           "CURATE_STAGES",
           "read_curate_lineage",
           "extracted_to_documents", "run_corpus",
           "build_dedup_index", "update_dedup_index", "dedup_increment",
           "compact_dedup_index", "remove_from_dedup_index"]
