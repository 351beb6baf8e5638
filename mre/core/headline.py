"""E4/E5 — headline candidate generation + scoring (SURVEY.md §2A).

Additive heuristic scoring in the reference's style [PUB:headline]:
tag rank (h1 best), class/id ± regex weights, fuzzy similarity to <title>,
slug-vs-URL-path similarity, word-count sanity window, early-document bonus.
Max score wins; ties break by document order (first candidate wins — the
reference iterates in document order and uses strict >).
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field
from difflib import SequenceMatcher
from typing import Optional
from urllib.parse import urlparse

from .htmlparse import Node, memo_search
from .textutil import collapse_ws, slugify

_POS_CLASS_RX = re.compile(
    r"headline|entry-title|post-title|article-title|story.?head|"
    r"\bhead\b|\btitle\b|\bstory\b|heading", re.I)
_NEG_CLASS_RX = re.compile(
    r"nav|menu|footer|comment|sidebar|side-bar|promo|related|widget|"
    r"share|social|breadcrumb|caption|byline|meta|tagline|subtitle|"
    r"sub-title|standfirst", re.I)

_POS_MEMO: dict = {}
_NEG_MEMO: dict = {}

_TAG_SCORE = {"h1": 3.0, "h2": 2.0, "h3": 1.5, "h4": 1.0, "div": 0.0,
              "p": 0.0, "span": 0.0, "td": 0.0, "title": 0.0}
_CANDIDATE_TAGS = ("h1", "h2", "h3", "h4", "div", "p", "span", "td")

# strip trailing " – Site Name" / " | Site" decorations from <title>
_TITLE_SPLIT_RX = re.compile(r"\s*[\|–—»:-]\s+")


@dataclass
class Candidate:
    node: Optional[Node]
    value: str
    score: float = 0.0
    order: int = 0
    base: float = 0.0  # node-less cue strength (og:title 2.5, JSON-LD 3.0)
    notes: list = field(default_factory=list)


def _title_text(doc: Node) -> str:
    t = doc.find("title")
    return collapse_ws(t.text_content()) if t is not None else ""


def title_variants(title: str) -> list[str]:
    """<title> plus its site-decoration-stripped prefixes/suffixes."""
    out = [title]
    parts = _TITLE_SPLIT_RX.split(title)
    if len(parts) > 1:
        out.append(parts[0].strip())
        out.append(parts[-1].strip())
    return [p for p in out if p]


def meta_title(doc: Node) -> Optional[str]:
    """og:title / twitter:title content, if present (E4 meta cues)."""
    for meta in doc.iter("meta"):
        key = (meta.get("property") or meta.get("name") or "").lower()
        if key in ("og:title", "twitter:title"):
            v = collapse_ws(meta.get("content") or "")
            if v:
                return v
    return None


def headline_candidates(doc: Node,
                        jsonld=None) -> list[Candidate]:
    """E4: h1..h4, headline-classed elements, og/twitter meta titles,
    JSON-LD article headlines (E7b)."""
    cands: list[Candidate] = []
    order = 0
    for node in doc.iter(*_CANDIDATE_TAGS):
        # cheap cue checks FIRST — text_content() walks the whole subtree,
        # so it only runs for the few nodes that pass (same candidate list
        # and order either way: empty-text nodes are dropped in both)
        is_heading = node.tag in ("h1", "h2", "h3", "h4")
        classed = memo_search(_POS_CLASS_RX, _POS_MEMO, node.class_id)
        # schema.org microdata: itemprop="headline" is an explicit label
        itemprop = bool(node.attrib) and \
            (node.get("itemprop") or "").lower() == "headline"
        if not (is_heading or classed or itemprop):
            continue
        txt = collapse_ws(node.text_content())
        if not txt:
            continue
        cands.append(Candidate(node, txt, 0.0, order,
                               base=2.0 if itemprop else 0.0))
        order += 1
    mt = meta_title(doc)
    if mt:
        cands.append(Candidate(None, mt, 0.0, order, base=2.5))
        order += 1
    for meta in (jsonld or []):
        if meta.headline:
            cands.append(Candidate(None, meta.headline, 0.0, order,
                                   base=3.0))
            order += 1
    return cands


def _similarity(a: str, b: str) -> float:
    if not a or not b:
        return 0.0
    return SequenceMatcher(None, a.lower(), b.lower()).ratio()


def _max_similarity(a: str, variants) -> float:
    """max(_similarity(a, v) for v in variants) with upper-bound pruning:
    ratio() ≤ quick_ratio() ≤ real_quick_ratio(), so a variant whose bound
    can't beat the current max skips the expensive matching-block pass.
    Pure pruning — the returned value is IDENTICAL to the naive max
    (seq1/seq2 order kept as in _similarity; ratio is order-sensitive)."""
    if not a:
        return 0.0
    sm = SequenceMatcher(None)
    sm.set_seq1(a.lower())
    best = 0.0
    for v in variants:
        if not v:
            continue
        sm.set_seq2(v.lower())
        if sm.real_quick_ratio() <= best or sm.quick_ratio() <= best:
            continue
        r = sm.ratio()
        if r > best:
            best = r
    return best


def score_headline(doc: Node, url: str,
                   jsonld=None) -> tuple[Optional[str], Optional[Node]]:
    """E5: additive scoring; returns (headline, winning element)."""
    cands = headline_candidates(doc, jsonld)
    title = _title_text(doc)
    variants = title_variants(title)
    if not cands:
        if variants:  # cleaned <title> fallback [PUB:headline]
            return (variants[1] if len(variants) > 1 else variants[0]), None
        return None, None
    path_slug = slugify(urlparse(url).path)

    best: Optional[Candidate] = None
    for c in cands:
        score = c.base  # node-less cue strength / itemprop bonus
        if c.node is not None:
            score += _TAG_SCORE.get(c.node.tag, 0.0)
            cid = c.node.class_id
            if memo_search(_POS_CLASS_RX, _POS_MEMO, cid):
                score += 2.0
            if memo_search(_NEG_CLASS_RX, _NEG_MEMO, cid):
                score -= 3.0
            for anc in c.node.ancestors():
                if memo_search(_NEG_CLASS_RX, _NEG_MEMO, anc.class_id):
                    score -= 2.0
                    break
        # (node-less cues — og:title 2.5 / JSON-LD 3.0 — carry their
        # strength entirely in c.base, already added above)

        sim = _max_similarity(c.value, variants)
        score += 3.0 * sim

        if path_slug:
            slug_sim = _similarity(slugify(c.value), path_slug)
            score += 2.0 * slug_sim

        n_words = len(c.value.split())
        if 2 <= n_words <= 20:
            score += 1.0
        elif n_words > 30 or n_words < 1:
            score -= 2.0

        if c.order < 3:
            score += 0.5  # early-in-document bonus

        c.score = score
        if best is None or c.score > best.score:  # strict > : doc-order ties
            best = c

    if best is None or best.score <= 0:
        # last resort: the cleaned <title> itself [PUB:headline fallback]
        if variants:
            return variants[1] if len(variants) > 1 else variants[0], None
        return None, None
    return best.value, best.node


__all__ = ["headline_candidates", "score_headline", "Candidate",
           "meta_title", "title_variants"]
