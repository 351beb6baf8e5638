#!/usr/bin/env python
"""Dump `.explain("formatted")` for the round-8 optimization targets into
plans/r08/<name>_<tag>.txt (tag = before/after). Registered queries come
from __spark_entry__.queries(); EXTRA_BENCH entries are rebuilt here in
the same shape bench.py uses (bench.py itself is frozen).

Usage: python scripts/dump_r08_plans.py <before|after> [name ...]
"""
from __future__ import annotations

import io
import os
import sys
from contextlib import redirect_stdout

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")


def fmt_plan(df) -> str:
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def main() -> None:
    tag = sys.argv[1]
    only = set(sys.argv[2:])
    from mre.io import get_spark
    import bench
    import __spark_entry__ as em

    spark = get_spark(app="mre-r08-plans", master="local[8]",
                      shuffle_partitions=8)
    qs = em.queries()
    targets = [
        "winnow_dup_pairs", "dup_clusters", "dedup_increment",
        "dsir_select", "ivf_ann", "curation_pipeline", "token_stats",
        "quality_score", "sentence_dedup", "jaccard_pairs",
        "extract_flagship", "link_pagerank", "minhash_near_dups",
        "lsh_jaccard_verify", "simhash_near_dups", "cosine_dup_pairs",
        "pack_sequences", "exact_dedup",
    ]
    os.makedirs(os.path.join(REPO, "plans", "r08"), exist_ok=True)
    for name in targets:
        if only and name not in only:
            continue
        fn = qs.get(name) or bench.EXTRA_BENCH.get(name)
        try:
            df = fn(spark, SF)
            plan = fmt_plan(df)
        except Exception as exc:  # plan-time failure must be visible
            plan = f"ERROR building plan: {exc!r}\n"
        p = os.path.join(REPO, "plans", "r08", f"{name}_{tag}.txt")
        with open(p, "w") as f:
            f.write(f"# {name} — {tag} (sf={SF})\n\n{plan}")
        print("wrote", p)
        from mre.textops import release_caches
        spark.catalog.clearCache()
        release_caches()
    spark.stop()


if __name__ == "__main__":
    main()
