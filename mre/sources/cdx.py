"""CDX(J) capture-index source — Common Crawl's third distribution
format (after WARC and WET): one line per capture,

    <SURT urlkey> <14-digit timestamp> <JSON fields>

with fields like url/digest/mime/status/length. A crawl pipeline uses
the index for membership, freshness and re-crawl planning WITHOUT
touching payload bytes; this module provides the read path plus the
re-crawl DELTA analysis (added / gone / changed / unchanged per
urlkey between two snapshots).

Public-spec references: the CDXJ line layout and SURT key form are
documented by the Common Crawl index and pywb projects (public
formats); the SURT subset implemented here is the standard
"reverse the host labels, drop the leading www, lowercase, ')' before
the path" canonicalization.

Scale shape: read = binaryFile whole-file parallelism over the index
shards (Common Crawl ships ~300 cdx-*.gz per snapshot), line split in
mapInPandas — one scan, no shuffle. ``capture_delta`` reduces each
side to its latest capture per urlkey (one max_by aggregation — the
digest comparison needs only 2 rows per key) and full-outer joins the
two bounded per-key frames on urlkey.
"""

from __future__ import annotations

import gzip
import io as _io
import json
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

CDX_SCHEMA = ("urlkey string, ts string, url string, digest string, "
              "mime string, status int, length long")


def surt_key(url: str) -> str:
    """SURT canonical key: scheme dropped, host labels reversed and
    comma-joined, one leading 'www' label dropped, everything
    lowercased, ')' joins host to path (query kept, fragment dropped).
    ``https://www.Example-3.com/Articles/7?q=1#top`` →
    ``com,example-3)/articles/7?q=1``.

    TOTAL on arbitrary strings (fuzz-pinned): a url the stdlib
    splitter rejects (e.g. an unbalanced IPv6 bracket) keys as its
    lowercased raw form behind an empty host — one garbage line in an
    index shard or sitemap must never kill a scan."""
    from urllib.parse import urlsplit
    try:
        p = urlsplit(url.strip())
    except ValueError:
        return ")" + url.strip().lower()
    host = (p.netloc or "").lower()
    if "@" in host:
        host = host.rsplit("@", 1)[1]
    if host.startswith("www.") and host.count(".") >= 2:
        host = host[4:]
    labels = [x for x in host.split(".") if x]
    key = ",".join(reversed(labels)) + ")"
    path = (p.path or "/").lower()
    q = ("?" + p.query.lower()) if p.query else ""
    return key + path + q


def format_cdxj_line(url: str, ts: str, digest: str,
                     mime: str = "text/html", status: int = 200,
                     length: int = 0) -> str:
    """One CDXJ record line (urlkey derived with ``surt_key``)."""
    fields = {"url": url, "digest": digest, "mime": mime,
              "status": str(int(status)), "length": str(int(length))}
    return f"{surt_key(url)} {ts} {json.dumps(fields, sort_keys=True)}"


def parse_cdxj_line(line: str) -> dict | None:
    """Parse one CDXJ line; None for blank/malformed lines (an index
    shard with a truncated tail must not kill the scan)."""
    line = line.strip()
    if not line:
        return None
    try:
        urlkey, ts, rest = line.split(" ", 2)
        j = json.loads(rest)
        return {"urlkey": urlkey, "ts": ts, "url": j.get("url"),
                "digest": j.get("digest"),
                "mime": j.get("mime"),
                "status": int(j["status"]) if "status" in j else None,
                "length": int(j["length"]) if "length" in j else None}
    except Exception:
        return None


def write_cdxj_gz(lines: list[str], path: str) -> str:
    """Write a .cdxj.gz shard (fixture writer — no external data)."""
    import os
    os.makedirs(os.path.dirname(path), exist_ok=True)
    with gzip.open(path, "wt", encoding="utf-8") as f:
        for ln in lines:
            f.write(ln + "\n")
    return path


def captures_from_cdx_bytes(payload: bytes) -> list[dict]:
    """All parseable capture rows from one (possibly gzipped) shard."""
    if payload[:2] == b"\x1f\x8b":
        payload = gzip.GzipFile(fileobj=_io.BytesIO(payload)).read()
    out = []
    for line in payload.decode("utf-8", "replace").splitlines():
        r = parse_cdxj_line(line)
        if r is not None:
            out.append(r)
    return out


def read_cdx(spark: SparkSession, path_glob: str) -> DataFrame:
    """CDX(J)(.gz) shards → capture DataFrame (CDX_SCHEMA). File-level
    parallelism; line parsing runs distributed in mapInPandas."""
    files = (spark.read.format("binaryFile").load(path_glob)
             .select("content"))
    cols = [c.split()[0] for c in CDX_SCHEMA.split(", ")]

    def split(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            for content in pdf["content"]:
                rows = captures_from_cdx_bytes(bytes(content))
                if rows:
                    yield pd.DataFrame(rows, columns=cols)

    return files.mapInPandas(split, CDX_SCHEMA)


def latest_captures(cdx: DataFrame) -> DataFrame:
    """One row per urlkey: the capture with the max (ts, digest) —
    digest breaks exact-ts ties deterministically. One max_by
    aggregation (map-side combinable), no window, no sort. The
    winning capture's original url rides along (the fetchable form of
    the SURT key)."""
    return (cdx.groupBy("urlkey")
            .agg(F.max_by(F.struct("ts", "digest", "url"),
                          F.struct("ts", "digest")).alias("_m"),
                 F.count("*").alias("n_captures"))
            .select("urlkey", F.col("_m.ts").alias("ts"),
                    F.col("_m.digest").alias("digest"),
                    F.col("_m.url").alias("url"), "n_captures"))


def capture_delta(old_cdx: DataFrame, new_cdx: DataFrame) -> DataFrame:
    """Re-crawl delta between two capture indexes, per urlkey:
    status 'added' (new only), 'gone' (old only), 'changed' (latest
    digests differ), 'unchanged'. Columns: urlkey, status, old_ts,
    new_ts, n_captures (rows across both sides). Each side reduces to
    its latest capture first, so the join is one-row-per-key on both
    sides — a plain full-outer equi-join at any scale."""
    o = latest_captures(old_cdx).select(
        "urlkey", F.col("ts").alias("old_ts"),
        F.col("digest").alias("old_digest"),
        F.col("url").alias("_ou"),
        F.col("n_captures").alias("_no"))
    n = latest_captures(new_cdx).select(
        "urlkey", F.col("ts").alias("new_ts"),
        F.col("digest").alias("new_digest"),
        F.col("url").alias("_nu"),
        F.col("n_captures").alias("_nn"))
    j = o.join(n, "urlkey", "full_outer")
    status = (F.when(F.col("old_digest").isNull(), "added")
              .when(F.col("new_digest").isNull(), "gone")
              .when(F.col("old_digest") != F.col("new_digest"),
                    "changed")
              .otherwise("unchanged"))
    return j.select(
        "urlkey", status.alias("status"), "old_ts", "new_ts",
        F.coalesce("_nu", "_ou").alias("url"),
        (F.coalesce("_no", F.lit(0)) + F.coalesce("_nn", F.lit(0)))
        .cast("long").alias("n_captures"))


__all__ = [
    "surt_key", "format_cdxj_line", "parse_cdxj_line", "write_cdxj_gz",
    "captures_from_cdx_bytes", "read_cdx", "latest_captures",
    "capture_delta", "CDX_SCHEMA",
]
