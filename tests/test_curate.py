"""Tests for the composed curation pipeline (mre.curate): per-stage
semantics on a corpus with planted quality failures / exact dups /
near-dups / contamination, and the stage-lineage resume protocol."""

import pytest
from pyspark.sql import functions as F

from mre.curate import (CURATE_STAGES, curate_df, read_curated, run_curate)

_BASE = ("the quick brown fox jumps over the lazy dog and that was "
         "fine to have with all of the other animals in the yard ")


def _variant(i: int) -> str:
    """A quality-passing text whose token stream is ~1/3 doc-specific, so
    distinct variants share almost no word 3-grams (not near-dups)."""
    words = (_BASE * 3).split()
    return " ".join(w if k % 3 else f"{w}{i}" for k, w in enumerate(words))


EVAL_TEXT = "zebra quagga xylophone quince zygote flurble"


def _docs_rows():
    rows = [(i, _variant(i) + f" unique tail number {i} ends here",
             "en", "srcA", 0) for i in range(20)]
    # exact dup pair: identical text → keeper 100, loser 101
    dup = _variant(100) + " duplicated content block"
    rows += [(100, dup, "en", "srcB", 0), (101, dup, "en", "srcB", 0)]
    # near-dup pair: one mid-token differs → high 3-gram jaccard
    near = _variant(110) + " shared tail marker alpha beta gamma delta"
    rows += [(110, near, "en", "srcB", 0),
             (111, near.replace("alpha", "omega"), "en", "srcB", 0)]
    # quality failure: far below the 50-word Gopher floor
    rows += [(120, "too short", "en", "srcC", 0)]
    # contaminated: quality-passing text carrying an eval 5-gram
    rows += [(130, _variant(130) + " " + EVAL_TEXT + " end of doc here",
              "en", "srcC", 0)]
    return rows


@pytest.fixture(scope="module")
def docs(spark):
    return spark.createDataFrame(
        _docs_rows(),
        "doc_id long, text string, lang string, source string, "
        "n_chars long")


@pytest.fixture(scope="module")
def evals(spark):
    return spark.createDataFrame([(0, EVAL_TEXT)],
                                 "eval_id long, text string")


def test_curate_df_stage_semantics(docs, evals):
    out = curate_df(docs, evals).collect()
    ids = {r["doc_id"] for r in out}
    # quality failure removed
    assert 120 not in ids
    # exact-dup loser removed, keeper (min doc_id) kept
    assert 100 in ids and 101 not in ids
    # near-dup loser removed, cluster-min kept
    assert 110 in ids and 111 not in ids
    # contaminated doc removed (shares a 5-gram with the eval set)
    assert 130 not in ids
    # the 20 distinct variants all survive
    assert set(range(20)) <= ids
    assert ids == set(range(20)) | {100, 110}
    # every survivor got a deterministic split; text column dropped
    assert all(r["split"] in ("train", "test") for r in out)
    cols = {c for c in curate_df(docs, evals).columns}
    assert "text" not in cols and "split" in cols


def test_curate_df_strict_quality_applies_repetition(spark, docs, evals):
    """strict_quality additionally drops docs failing the repetition
    rule: a keyword-stuffed (but otherwise Gopher-passing) doc survives
    the default pipeline and is removed by the strict one."""
    stuffed = ("the spam and offer " * 30
               + "of a deal to have with that be real here now")
    docs2 = docs.unionByName(spark.createDataFrame(
        [(200, stuffed, "en", "srcC", 0)], docs.schema))
    loose = {r["doc_id"] for r in curate_df(docs2, evals).collect()}
    strict = {r["doc_id"] for r in
              curate_df(docs2, evals, strict_quality=True).collect()}
    assert 200 in loose
    assert 200 not in strict
    assert strict <= loose


def test_curate_df_no_evals_skips_decontamination(docs):
    ids = {r["doc_id"] for r in curate_df(docs, None).collect()}
    assert 130 in ids  # nothing to decontaminate against
    assert ids == set(range(20)) | {100, 110, 130}


def test_curate_output_is_leakage_free(spark, docs, evals):
    """The guarantee the pipeline exists to provide: after keep-one-per-
    cluster, NO confirmed near-dup pair (exact jaccard ≥ threshold) has
    both members surviving — so none can cross the train/test split
    (split_leakage over survivors is empty by construction)."""
    from mre.textops import (jaccard_on_candidates, minhash_near_dups,
                             split_leakage)

    out = curate_df(docs, evals)
    survivors = out.select("doc_id")
    cands = minhash_near_dups(docs, threshold=0.2).select("doc_a", "doc_b")
    confirmed = (jaccard_on_candidates(cands, docs)
                 .filter(F.col("jaccard") >= 0.5)
                 .select("doc_a", "doc_b"))
    both_alive = (confirmed
                  .join(survivors.withColumnRenamed("doc_id", "doc_a"),
                        "doc_a", "left_semi")
                  .join(survivors.withColumnRenamed("doc_id", "doc_b"),
                        "doc_b", "left_semi"))
    assert both_alive.count() == 0
    leaks = split_leakage(both_alive,
                          out.select("doc_id", "split"))
    assert leaks.count() == 0


def test_run_curate_resume_is_idempotent(spark, docs, evals, tmp_path):
    src = str(tmp_path / "docs")
    ev = str(tmp_path / "evals")
    dst = str(tmp_path / "curated")
    lin = str(tmp_path / "lineage")
    docs.write.parquet(src)
    evals.write.parquet(ev)

    run_curate(spark, src, dst, lin, run_id="c1", evals_src=ev)
    final1 = read_curated(spark, dst).orderBy("doc_id").toPandas()
    linpdf = spark.read.parquet(lin).toPandas()
    assert set(linpdf["stage"]) == set(CURATE_STAGES)
    assert len(linpdf) == len(CURATE_STAGES)
    assert (linpdf["run_id"] == "c1").all()
    # stage attrition recorded: n_out <= n_in everywhere, and the final
    # output row count equals the split stage's n_out
    assert (linpdf["n_out"] <= linpdf["n_in"]).all()
    split_row = linpdf[linpdf["stage"] == "split"].iloc[0]
    assert split_row["n_out"] == len(final1)
    assert set(final1["doc_id"]) == set(range(20)) | {100, 110}

    # same run_id again: every stage committed → nothing recomputed,
    # outputs unchanged, NO new lineage rows
    run_curate(spark, src, dst, lin, run_id="c1", evals_src=ev)
    final2 = read_curated(spark, dst).orderBy("doc_id").toPandas()
    assert spark.read.parquet(lin).count() == len(CURATE_STAGES)
    assert final2["doc_id"].tolist() == final1["doc_id"].tolist()
    assert final2["split"].tolist() == final1["split"].tolist()

    # partial-progress resume: keep only the first two stages' lineage →
    # exactly the later three recompute, final output identical
    keep = spark.read.parquet(lin).filter(
        F.col("stage").isin("quality", "exact_dedup"))
    lin2 = str(tmp_path / "lineage2")
    keep.write.parquet(lin2)
    run_curate(spark, src, dst, lin2, run_id="c1", evals_src=ev)
    lin2pdf = spark.read.parquet(lin2).toPandas()
    assert len(lin2pdf) == len(CURATE_STAGES)  # 2 kept + 3 recomputed
    assert sorted(lin2pdf["stage"]) == sorted(CURATE_STAGES)
    final3 = read_curated(spark, dst).orderBy("doc_id").toPandas()
    assert final3["doc_id"].tolist() == final1["doc_id"].tolist()
    assert final3["split"].tolist() == final1["split"].tolist()


def test_run_curate_crash_mid_stage_recovers(spark, docs, evals, tmp_path):
    """Write-then-commit, both failure halves: (a) stage output written
    but lineage row missing (crash between write and commit) → the stage
    recomputes and commits, output unchanged; (b) lineage row present
    but output deleted (sink lost) → resume re-runs the stage instead of
    failing on the missing table."""
    import shutil

    src = str(tmp_path / "docs")
    ev = str(tmp_path / "evals")
    dst = str(tmp_path / "curated")
    lin = str(tmp_path / "lineage")
    docs.write.parquet(src)
    evals.write.parquet(ev)
    run_curate(spark, src, dst, lin, run_id="c1", evals_src=ev)
    final1 = read_curated(spark, dst).orderBy("doc_id").toPandas()

    # (a) crash between write and commit of stage 'near_dup': its output
    # exists (from the completed run) but its lineage row is gone
    keep = spark.read.parquet(lin).filter(F.col("stage") != "near_dup")
    lin2 = str(tmp_path / "lineage_a")
    keep.write.parquet(lin2)
    run_curate(spark, src, dst, lin2, run_id="c1", evals_src=ev)
    pdf = spark.read.parquet(lin2).toPandas()
    assert sorted(pdf["stage"]) == sorted(CURATE_STAGES)
    final2 = read_curated(spark, dst).orderBy("doc_id").toPandas()
    assert final2["doc_id"].tolist() == final1["doc_id"].tolist()

    # (b) lineage says 'split' is done but its output is gone
    shutil.rmtree(f"{dst}/split")
    run_curate(spark, src, dst, lin2, run_id="c1", evals_src=ev)
    final3 = read_curated(spark, dst).orderBy("doc_id").toPandas()
    assert final3["doc_id"].tolist() == final1["doc_id"].tolist()
    assert final3["split"].tolist() == final1["split"].tolist()


def test_run_curate_fresh_run_id_recomputes(spark, docs, evals, tmp_path):
    src = str(tmp_path / "docs")
    ev = str(tmp_path / "evals")
    docs.write.parquet(src)
    evals.write.parquet(ev)
    dst = str(tmp_path / "curated")
    lin = str(tmp_path / "lineage")
    run_curate(spark, src, dst, lin, run_id="a", evals_src=ev)
    run_curate(spark, src, dst, lin, run_id="b", evals_src=ev)
    pdf = spark.read.parquet(lin).toPandas()
    # both runs fully committed (outputs are idempotent overwrites)
    assert len(pdf) == 2 * len(CURATE_STAGES)
    assert set(pdf["run_id"]) == {"a", "b"}
