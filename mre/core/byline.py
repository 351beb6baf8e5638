"""E12/E13 — byline extraction + author-name cleaning (SURVEY.md §2A).

Candidate sources in the reference's style [PUB:byline]: rel="author" links,
hAtom/vcard classes (author|byline|vcard, .fn), author meta tags
(author / DC.creator / byl / sailthru.author), and visible "By <Names>" text.
Cleaning (E13) splits on ','/'and'/'&', strips "By "/"Posted by", rejects
emails, dates, job-title suffixes, and implausible tokens.

Returned author order = document order of the winning cue (SURVEY.md §1.2).
"""

from __future__ import annotations

import re
from typing import Optional

from .fuzzydate import parse_date
from .htmlparse import Node, memo_search
from .textutil import collapse_ws

_AUTHOR_CLASS_RX = re.compile(r"\bbyline\b|\bauthor\b|\bvcard\b|\bby-?line\b",
                              re.I)
_AU_MEMO: dict = {}
_NEG_MEMO: dict = {}

_NEG_AUTHOR_CLASS_RX = re.compile(
    r"comment|related|promo|footer|nav|sidebar|widget", re.I)
_FN_CLASS_RX = re.compile(r"\bfn\b", re.I)

_META_AUTHOR_KEYS = ("author", "dc.creator", "dcterms.creator", "byl",
                     "sailthru.author", "article:author", "parsely-author",
                     "twitter:creator")

_BY_RX = re.compile(r"^\s*[Bb][Yy][\s:]+")
_POSTED_BY_RX = re.compile(r"^\s*[Pp]osted\s+[Bb]y[\s:]+")
_EMAIL_RX = re.compile(r"\S+@\S+")
_SPLIT_RX = re.compile(r"\s*(?:,|\band\b|&|\bwith\b|/|\|)\s*", re.I)

# tokens that disqualify a fragment from being a person name
_STOP_FRAGMENT_RX = re.compile(
    r"\b(correspondent|editor|reporter|staff|writer|news|press|agency|"
    r"associated|reuters|desk|bureau|team|admin|guest|updated?|published|"
    r"posted|min read|share|follow|gmt|bst|est|pst)\b", re.I)

# visible-text byline: "By Ada Lovelace and Alan Turing"
_VISIBLE_BY_RX = re.compile(
    r"^[Bb][Yy]\s+([A-Z][\w''.\-]+(?:\s+[A-Z][\w''.\-]+){0,3}"
    r"(?:\s*(?:,|and|&)\s*[A-Z][\w''.\-]+(?:\s+[A-Z][\w''.\-]+){0,3})*)\s*$")

_NAME_TOKEN_RX = re.compile(r"^[A-ZÀ-ÖØ-Þ][\w''.\-]*$")


def _plausible_name(s: str) -> bool:
    """E13 plausibility: 1–4 tokens, capitalized, no digits/stopwords."""
    s = s.strip(" .,-–—")
    if not s or _EMAIL_RX.search(s) or _STOP_FRAGMENT_RX.search(s):
        return False
    if any(ch.isdigit() for ch in s):
        return False
    if parse_date(s) is not None and parse_date(s).month is not None:
        return False  # it's a date, not a name
    toks = s.split()
    if not 1 <= len(toks) <= 4:
        return False
    return all(_NAME_TOKEN_RX.match(t) for t in toks)


def clean_authors(raw: str) -> list[str]:
    """E13: raw byline string → list of plausible author names, in order."""
    s = collapse_ws(raw)
    s = _POSTED_BY_RX.sub("", s)
    s = _BY_RX.sub("", s)
    # chop anything after a strong delimiter that starts non-name content
    # ("Jane Doe, Science Correspondent | Updated 3 May 2024")
    out: list[str] = []
    for frag in _SPLIT_RX.split(s):
        frag = frag.strip(" .,-–—")
        if not frag:
            continue
        if _plausible_name(frag):
            if frag not in out:
                out.append(frag)
        elif out:
            break  # trailing junk after names ends the byline
    return out


def byline_candidates(doc: Node) -> list[tuple[str, float, int]]:
    """E12: (raw byline text, weight, doc order) candidates."""
    out: list[tuple[str, float, int]] = []
    order = 0

    for node in doc.iter():
        # rel="author" links — strongest element cue
        if node.tag == "a" and "author" in (node.get("rel") or "").lower():
            txt = collapse_ws(node.text_content())
            if txt:
                out.append((txt, 6.0, order))
                order += 1
            continue
        # schema.org microdata: itemprop="author" (Person), name nested
        if node.attrib and (node.get("itemprop") or "").lower() == "author":
            names = [collapse_ws(f.text_content()) for f in node.iter()
                     if f is not node
                     and (f.get("itemprop") or "").lower() == "name"]
            names = [t for t in names if t]
            if names:
                out.append((" and ".join(names), 5.5, order))
            else:
                txt = collapse_ws(node.get("content")
                                  or node.text_content())
                if txt and len(txt) < 200:
                    out.append((txt, 5.0, order))
            order += 1
            continue
        cid = node.class_id
        if memo_search(_AUTHOR_CLASS_RX, _AU_MEMO, cid) \
                and not memo_search(_NEG_AUTHOR_CLASS_RX, _NEG_MEMO, cid):
            # prefer an .fn descendant (hAtom) over the whole element text
            fn_texts = [collapse_ws(f.text_content())
                        for f in node.iter()
                        if f is not node and _FN_CLASS_RX.search(
                            " ".join(f.classes))]
            fn_texts = [t for t in fn_texts if t]
            if fn_texts:
                out.append((" and ".join(fn_texts), 5.0, order))
            else:
                txt = collapse_ws(node.text_content())
                if txt and len(txt) < 200:
                    out.append((txt, 4.0, order))
            order += 1

    # meta tags
    for meta in doc.iter("meta"):
        key = (meta.get("property") or meta.get("name") or "").lower()
        if key in _META_AUTHOR_KEYS:
            v = collapse_ws(meta.get("content") or "")
            if v and not v.startswith("@") and not v.startswith("http"):
                out.append((v, 5.5, order))
                order += 1

    # visible "By X and Y" paragraphs/spans near the top of the document
    seen = 0
    for node in doc.iter("p", "span", "div"):
        txt = collapse_ws(node.text_content())
        if not txt or len(txt) > 120:
            continue
        m = _VISIBLE_BY_RX.match(txt)
        if m:
            out.append((m.group(1), 4.5, order))
            order += 1
        seen += 1
        if seen > 80:  # bylines live near the top; cap the scan
            break
    return out


def extract_authors(doc: Node, jsonld=None) -> list[str]:
    """E12→E13 composed: best-cue author list (document order within cue).
    JSON-LD authors (E12b) outrank element/meta cues."""
    cands = byline_candidates(doc)
    for meta in (jsonld or []):
        if meta.authors:
            cands.append((" and ".join(meta.authors), 7.0, -1))
    best: Optional[list[str]] = None
    best_key = (float("-inf"), 0)
    for raw, weight, order in cands:
        names = clean_authors(raw)
        if not names:
            continue
        key = (weight, -order)
        if key > best_key:
            best_key = key
            best = names
    return best or []


__all__ = ["byline_candidates", "clean_authors", "extract_authors"]
