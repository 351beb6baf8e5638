"""Sitemap source — the third discovery input of a crawl pipeline
(alongside the CDX capture index and robots.txt): XML urlsets listing
``<url><loc>`` entries with optional lastmod/changefreq/priority, and
``<sitemapindex>`` files listing child sitemaps. Public format
(sitemaps.org protocol).

``read_sitemaps`` parses both kinds with the stdlib XML parser
(namespace-agnostic tag matching, malformed files skipped — a bad
shard must not kill the scan) into one frame:

    kind      'url' (a urlset entry) | 'sitemap' (an index entry)
    loc       the entry's location
    lastmod   raw string as published (sortable ISO-8601 in practice)

Discovery composition: ``loc``s of kind='url' anti-joined against the
capture index's urlkeys (``surt_key``) are the never-crawled
candidates a fetch plan schedules alongside ``capture_delta``'s
added/changed rows.

Scale shape: binaryFile whole-file parallelism (sites ship thousands
of 50k-url shards), parse in mapInPandas — one scan, no shuffle.
"""

from __future__ import annotations

import gzip
import io as _io
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession

SITEMAP_SCHEMA = ("kind string, loc string, lastmod string, "
                  "changefreq string, priority string")


def _local(tag: str) -> str:
    """Tag name with any XML namespace stripped."""
    return tag.rsplit("}", 1)[-1].lower()


def sitemap_entries(payload: bytes) -> list[dict]:
    """All entries of one (possibly gzipped) sitemap document; [] for
    malformed XML."""
    import xml.etree.ElementTree as ET
    if payload[:2] == b"\x1f\x8b":
        payload = gzip.GzipFile(fileobj=_io.BytesIO(payload)).read()
    try:
        root = ET.fromstring(payload)
    except ET.ParseError:
        return []
    rtag = _local(root.tag)
    kind = {"urlset": "url", "sitemapindex": "sitemap"}.get(rtag)
    if kind is None:
        return []
    out = []
    for node in root:
        if _local(node.tag) not in ("url", "sitemap"):
            continue
        row = {"kind": kind, "loc": None, "lastmod": None,
               "changefreq": None, "priority": None}
        for child in node:
            name = _local(child.tag)
            if name in row and name != "kind":
                row[name] = (child.text or "").strip() or None
        if row["loc"]:
            out.append(row)
    return out


def write_sitemap(locs: list[tuple], path: str,
                  index: bool = False) -> str:
    """Fixture writer: ``locs`` = (loc, lastmod|None) pairs → a
    sitemaps.org urlset (or sitemapindex) file; .gz paths gzip."""
    import os
    os.makedirs(os.path.dirname(path), exist_ok=True)
    root, entry = (("sitemapindex", "sitemap") if index
                   else ("urlset", "url"))
    lines = ['<?xml version="1.0" encoding="UTF-8"?>',
             f'<{root} xmlns="http://www.sitemaps.org/schemas/'
             f'sitemap/0.9">']
    for loc, lastmod in locs:
        lines.append(f"<{entry}><loc>{loc}</loc>"
                     + (f"<lastmod>{lastmod}</lastmod>" if lastmod
                        else "")
                     + f"</{entry}>")
    lines.append(f"</{root}>")
    data = "\n".join(lines).encode()
    if path.endswith(".gz"):
        with gzip.open(path, "wb") as f:
            f.write(data)
    else:
        with open(path, "wb") as f:
            f.write(data)
    return path


def feed_entries(payload: bytes) -> list[dict]:
    """Article links from one RSS 2.0 or Atom feed document — the
    news-pipeline discovery input (a news extractor's sources publish
    feeds before sitemaps). RSS: rss>channel>item {link, pubDate};
    Atom: feed>entry {link[@href] with rel absent/'alternate',
    updated/published}. Same row shape as ``sitemap_entries``
    (kind='url', loc, lastmod) so the SURT discovery anti-join
    consumes either. [] for malformed XML."""
    import xml.etree.ElementTree as ET
    if payload[:2] == b"\x1f\x8b":
        payload = gzip.GzipFile(fileobj=_io.BytesIO(payload)).read()
    try:
        root = ET.fromstring(payload)
    except ET.ParseError:
        return []
    rtag = _local(root.tag)
    out = []

    def _row(loc, lastmod):
        if loc:
            out.append({"kind": "url", "loc": loc.strip(),
                        "lastmod": (lastmod or "").strip() or None,
                        "changefreq": None, "priority": None})

    if rtag == "rss":
        for channel in root:
            if _local(channel.tag) != "channel":
                continue
            for item in channel:
                if _local(item.tag) != "item":
                    continue
                link, date = None, None
                for c in item:
                    n = _local(c.tag)
                    if n == "link":
                        link = c.text
                    elif n == "pubdate":
                        date = c.text
                _row(link, date)
    elif rtag == "feed":
        for entry in root:
            if _local(entry.tag) != "entry":
                continue
            link, date = None, None
            for c in entry:
                n = _local(c.tag)
                if n == "link":
                    rel = (c.get("rel") or "alternate").lower()
                    if rel == "alternate" and link is None:
                        link = c.get("href")
                elif n in ("updated", "published") and date is None:
                    date = c.text
            _row(link, date)
    return out


def read_feeds(spark: SparkSession, path_glob: str) -> DataFrame:
    """RSS/Atom feed files → the SITEMAP_SCHEMA frame (kind='url')."""
    files = (spark.read.format("binaryFile").load(path_glob)
             .select("content"))
    cols = [c.split()[0] for c in SITEMAP_SCHEMA.split(", ")]

    def split(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            for content in pdf["content"]:
                rows = feed_entries(bytes(content))
                if rows:
                    yield pd.DataFrame(rows, columns=cols)

    return files.mapInPandas(split, SITEMAP_SCHEMA)


def read_sitemaps(spark: SparkSession, path_glob: str) -> DataFrame:
    """Sitemap / sitemap-index files → SITEMAP_SCHEMA frame."""
    files = (spark.read.format("binaryFile").load(path_glob)
             .select("content"))
    cols = [c.split()[0] for c in SITEMAP_SCHEMA.split(", ")]

    def split(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            for content in pdf["content"]:
                rows = sitemap_entries(bytes(content))
                if rows:
                    yield pd.DataFrame(rows, columns=cols)

    return files.mapInPandas(split, SITEMAP_SCHEMA)


def undiscovered_urls(sitemaps: DataFrame, cdx: DataFrame) -> DataFrame:
    """Sitemap-announced urls the capture index has never seen — the
    discovery half of a fetch plan (capture_delta provides the
    freshness half). Anti-join on the SURT key so url-form noise
    (case, www) cannot hide a known capture. One broadcast-eligible
    projection per side + one anti-join on the key."""
    from pyspark.sql import functions as F

    from .cdx import surt_key
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("string")
    def _skey(u: pd.Series) -> pd.Series:
        return u.map(lambda x: surt_key(x) if x else None)

    su = (sitemaps.filter(F.col("kind") == "url")
          .select(F.col("loc").alias("url"))
          .withColumn("urlkey", _skey(F.col("url"))))
    known = cdx.select("urlkey").distinct()
    return su.join(known, "urlkey", "left_anti")


__all__ = ["sitemap_entries", "write_sitemap", "read_sitemaps",
           "feed_entries", "read_feeds",
           "undiscovered_urls", "SITEMAP_SCHEMA"]
