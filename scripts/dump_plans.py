#!/usr/bin/env python
"""Regenerate PLANS.md: formatted physical plans for the flagship pipeline
and representative queries, with the plan properties the design relies on
(pushdown, broadcast, single exchange) stated next to each."""

from __future__ import annotations

import io
import os
import sys
from contextlib import redirect_stdout

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def fmt_plan(df) -> str:
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def main() -> None:
    from mre.io import get_spark
    import __spark_entry__ as em

    spark = get_spark(app="mre-plans", master="local[4]",
                      shuffle_partitions=8)
    sf = "/root/testdata/sf0.001"
    sections = []

    flagship = em.q_extract(spark, sf)
    sections.append((
        "extract_flagship (dedup → salt → mapInPandas)",
        "Expected: ONE Exchange (salt repartition), window reuses it; "
        "UDF stage is MapInPandas (Arrow), not BatchEvalPython.",
        fmt_plan(flagship)))

    sections.append((
        "filter_project (pushdown)",
        "Expected: PushedFilters on the parquet scan; ReadSchema pruned "
        "to the 5 referenced columns.",
        fmt_plan(em.q_filter_project(spark, sf))))

    sections.append((
        "join_nations (broadcast dims)",
        "Expected: BroadcastHashJoin for both dimension joins, no "
        "sort-merge.",
        fmt_plan(em.q_join_nations(spark, sf))))

    sections.append((
        "agg_pricing (partial+final agg)",
        "Expected: HashAggregate (partial) → Exchange → HashAggregate "
        "(final); WholeStageCodegen spans the scan+partial agg.",
        fmt_plan(em.q_agg_pricing(spark, sf))))

    sections.append((
        "minhash_near_dups (LSH banding equi-join)",
        "Expected: signature computation is pure project (no shuffle); "
        "candidate join is an equi-join on (band_idx, band_hash); the "
        "signature frame is persisted — exactly ONE parquet scan of "
        "documents, every other branch reads InMemoryTableScan.",
        fmt_plan(em.queries()["minhash_near_dups"](spark, sf))))

    sections.append((
        "ivf_ann (inverted-file ANN, fixed coarse quantizer)",
        "Expected: cell assignment is a pure projection over the scan; "
        "probe list is broadcast; candidate restriction is an equi-join "
        "on cell (no corpus-wide cross join).",
        fmt_plan(em.queries()["ivf_ann"](spark, sf))))

    sections.append((
        "lsh_jaccard_verify (candidate-restricted exact Jaccard)",
        "Expected: NO corpus-wide inverted-index self-join — the shingle "
        "SETS are a pure projection pruned by a (broadcast) left-semi "
        "join on candidate doc ids; the per-pair intersection is "
        "array_intersect inside a Project, not a join.",
        fmt_plan(em.queries()["lsh_jaccard_verify"](spark, sf))))

    sections.append((
        "contamination (benchmark decontamination)",
        "Expected: eval n-gram side is a BroadcastHashJoin build — the "
        "corpus-side explode never shuffles; final groupBy is "
        "partial+final over only the matching rows.",
        fmt_plan(em.queries()["contamination"](spark, sf))))

    from mre.textops import pii_scrub, remove_dup_passages
    docs = spark.read.parquet(f"{sf}/documents.parquet")
    sections.append((
        "pii_scrub (PII counts + redaction)",
        "Expected: a single Project over the scan — ZERO Exchange, no "
        "UDF; regex count/replace all inside WholeStageCodegen.",
        fmt_plan(pii_scrub(docs))))

    sections.append((
        "remove_dup_passages (passage-removal dedup)",
        "Expected: the exploded span frame is persisted (second branch "
        "reads InMemoryTableScan — ONE parquet scan total); df count is "
        "HashAggregate partial → Exchange on md5(part) digest → final; "
        "the dup-marker join back carries a constant on the (small) "
        "dup-digest side; the rebuild is ONE doc_id-keyed Exchange "
        "(ObjectHashAggregate for collect_list) — the corpus text moves "
        "exactly once.",
        fmt_plan(remove_dup_passages(docs))))

    sections.append((
        "remove_dup_windows (substring-level dedup rewrite)",
        "Expected: the exploded window frame is persisted (ONE parquet "
        "scan feeds both the df count and the flagged-starts rebuild); "
        "df count is partial+final HashAggregate on the md5(window) "
        "digest; the flagged-digest semi-join builds on the small dup "
        "side; the rebuild groupBy collects only each doc's OWN flagged "
        "starts, and the kept-token reconstruction is a Project.",
        fmt_plan(em.queries()["sentence_dedup"](spark, sf)
                 .filter("op = 'desub'"))))

    import tempfile
    from mre.curate import build_dedup_index, dedup_increment
    from pyspark.sql import functions as F
    idx = tempfile.mkdtemp(prefix="mre_plans_idx_")
    build_dedup_index(spark, docs.filter(F.col("doc_id") % 2 == 0), idx)
    sections.append((
        "dedup_increment (incremental ingest vs hash-bucketed "
        "pre-banded index)",
        "Expected (round-7 layout): every index scan carries a "
        "PartitionFilters: [pb IN (...)] clause derived from the "
        "batch's own keys via the shared _bucket_expr — untouched "
        "bucket directories are pruned at listing time, so per-batch "
        "index I/O is O(touched buckets), not O(index). Still NO "
        "Generate/explode over the signature index and NO Exchange "
        "hashpartitioning(band_...) anywhere (batch bands broadcast "
        "into the candidate join); the signature index is scanned "
        "exactly ONCE (the verifier's sig_b fetch, a BroadcastHashJoin "
        "against the batch-shaped candidate set). The fingerprint "
        "anti-join is a digest equi-join — AQE broadcasts whichever "
        "side is small (the index at sandbox scale, the batch at "
        "corpus scale).",
        fmt_plan(dedup_increment(
            spark, docs.filter(F.col("doc_id") % 2 == 1), idx,
            threshold=0.5, update_index=False))))

    with open(os.path.join(REPO, "PLANS.md"), "w") as f:
        f.write("# PLANS — physical plans the design depends on\n\n"
                "Generated by `python scripts/dump_plans.py` "
                "(sf0.001, local[4]).\n")
        for title, expect, plan in sections:
            f.write(f"\n## {title}\n\n{expect}\n\n```\n{plan}```\n")
    print("wrote PLANS.md")
    spark.stop()


if __name__ == "__main__":
    main()
