"""E7b/E12b — schema.org JSON-LD article metadata (modern news pages'
primary metadata channel; complements the reference's meta/hAtom cues so a
user of the reference can run today's pages through this engine).

Finds ``<script type="application/ld+json">`` leaf nodes (preserved by the
parser), tolerantly loads the JSON, walks @graph/arrays for Article-family
@type values, and surfaces headline / datePublished / authors.
"""

from __future__ import annotations

import datetime as _dt
import json
from typing import Iterator, Optional

from .fuzzydate import parse_iso_datetime
from .htmlparse import Node

_ARTICLE_TYPES = {
    "article", "newsarticle", "blogposting", "reportagenewsarticle",
    "analysisnewsarticle", "opinionnewsarticle", "liveblogposting",
    "scholarlyarticle", "techarticle",
}


def _iter_objects(value) -> Iterator[dict]:
    if isinstance(value, dict):
        yield value
        for k in ("@graph", "mainEntity", "itemListElement"):
            if k in value:
                yield from _iter_objects(value[k])
    elif isinstance(value, list):
        for v in value:
            yield from _iter_objects(v)


def _is_article(obj: dict) -> bool:
    t = obj.get("@type")
    types = t if isinstance(t, list) else [t]
    return any(isinstance(x, str) and x.lower() in _ARTICLE_TYPES
               for x in types)


def _author_names(value) -> list[str]:
    if value is None:
        return []
    if isinstance(value, str):
        return [value.strip()] if value.strip() else []
    if isinstance(value, dict):
        name = value.get("name")
        return _author_names(name)
    if isinstance(value, list):
        out: list[str] = []
        for v in value:
            for n in _author_names(v):
                if n not in out:
                    out.append(n)
        return out
    return []


class ArticleMeta:
    __slots__ = ("headline", "date_published", "authors")

    def __init__(self, headline: Optional[str],
                 date_published: Optional[_dt.datetime],
                 authors: list[str]):
        self.headline = headline
        self.date_published = date_published
        self.authors = authors


def extract_jsonld(doc: Node) -> list[ArticleMeta]:
    """Article-typed JSON-LD blocks, document order; junk JSON skipped."""
    out: list[ArticleMeta] = []
    for node in doc.iter("script"):
        if "ld+json" not in (node.get("type") or "").lower():
            continue
        raw = node.text_content().strip()
        if not raw:
            continue
        try:
            data = json.loads(raw)
        except ValueError:
            continue
        for obj in _iter_objects(data):
            if not _is_article(obj):
                continue
            headline = obj.get("headline")
            if not isinstance(headline, str) or not headline.strip():
                headline = None
            else:
                headline = " ".join(headline.split())
            dt = None
            dp = obj.get("datePublished")
            if isinstance(dp, str):
                dt = parse_iso_datetime(dp)
            out.append(ArticleMeta(headline, dt,
                                   _author_names(obj.get("author"))))
    return out


__all__ = ["extract_jsonld", "ArticleMeta"]
