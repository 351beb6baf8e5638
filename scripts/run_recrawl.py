#!/usr/bin/env python3
"""Re-crawl planning CLI: diff two CDX capture indexes and emit a
politeness-scheduled fetch plan.

    spark-submit --py-files dist/mre.zip scripts/run_recrawl.py \
        --old cdx:/idx/old/*.cdxj.gz --new cdx:/idx/new/*.cdxj.gz \
        --robots robots_table --dst plan_dir

Writes {dst}/delta (per-urlkey added/gone/changed/unchanged) and
{dst}/plan (url, host, rank, start_ms — the fetcher's input: each
host's queue in url order, start times stepped by the host's
Crawl-delay) and prints one JSON summary line.
"""

import argparse
import json


def main() -> None:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--old", required=True,
                    help="previous capture index (cdx: path/glob)")
    ap.add_argument("--new", required=True,
                    help="current capture index (cdx: path/glob)")
    ap.add_argument("--sitemaps", default=None,
                    help="optional sitemap: path/glob — announced urls "
                         "the capture index has never seen join the "
                         "fetch plan (discovery)")
    ap.add_argument("--robots", default=None,
                    help="optional (host, robots_txt) table; without "
                         "it every url is allowed with zero delay")
    ap.add_argument("--agent", default="mrebot")
    ap.add_argument("--dst", required=True)
    ap.add_argument("--statuses", default="added,changed",
                    help="comma-joined delta statuses to schedule")
    args = ap.parse_args()

    from pyspark.sql import functions as F

    from mre.io import get_spark, read_table
    from mre.linkgraph import fetch_plan
    from mre.sources.cdx import capture_delta

    spark = get_spark(app="mre-recrawl")
    try:
        delta = capture_delta(read_table(spark, args.old),
                              read_table(spark, args.new))
        delta.write.mode("overwrite").parquet(f"{args.dst}/delta")
        delta = spark.read.parquet(f"{args.dst}/delta")
        statuses = [s.strip() for s in args.statuses.split(",") if s]
        urls = (delta.filter(F.col("status").isin(statuses))
                .select(F.lower("url").alias("url")))
        n_disc = 0
        if args.sitemaps:
            from mre.sources.cdx import read_cdx
            from mre.sources.sitemap import undiscovered_urls
            disc = undiscovered_urls(
                read_table(spark, args.sitemaps),
                read_cdx(spark, args.new[len("cdx:"):]
                         if args.new.startswith("cdx:") else args.new)
            ).select(F.lower("url").alias("url"))
            disc.write.mode("overwrite").parquet(
                f"{args.dst}/discovered")
            disc = spark.read.parquet(f"{args.dst}/discovered")
            n_disc = disc.count()
            urls = urls.unionByName(disc).distinct()
        if args.robots:
            robots = read_table(spark, args.robots)
        else:
            robots = spark.createDataFrame(
                [], "host string, robots_txt string")
        plan = fetch_plan(urls, robots, agent=args.agent)
        plan.write.mode("overwrite").parquet(f"{args.dst}/plan")
        by_status = {r["status"]: r["n"] for r in
                     delta.groupBy("status").agg(
                         F.count("*").alias("n")).collect()}
        n_plan = spark.read.parquet(f"{args.dst}/plan").count()
        print(json.dumps({"delta": by_status, "planned": n_plan,
                          "discovered": n_disc,
                          "statuses": statuses}))
    finally:
        spark.stop()


if __name__ == "__main__":
    main()
