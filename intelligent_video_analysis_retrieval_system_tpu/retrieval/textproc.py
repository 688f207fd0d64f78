"""Dependency-free query text analysis (the reference's spaCy analog).

The reference runs spaCy ``en_core_web_sm`` in two places: CLIP query
understanding (tokens / noun chunks / entities, ``core.py:1751-1794``)
and translated-query feature extraction for the translation service
(``api.py:2261-2416``). spaCy is a heavyweight host dependency with no
TPU relevance, so this module reimplements the *used* subset — content
words, noun-phrase-ish chunks, capitalized-entity guesses, visual-term
highlighting — with plain regexes and wordlists. Deterministic, no model
download, safe in sealed environments.
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field
from typing import Any

__all__ = ["TextAnalysis", "analyze_text", "content_words", "expand_variants"]

_TOKEN_RE = re.compile(r"[A-Za-z][A-Za-z'\-]*|\d+")

# Small English stopword list — function words that carry no visual
# signal for CLIP prompts (reference drops these via spaCy POS tags).
_STOPWORDS = frozenset("""
a an the and or but nor so yet of in on at to from by with without for as
is are was were be been being am do does did doing have has had having
this that these those there here it its it's i you he she we they them
his her their our your my me him us who whom which what when where why
how not no if then than too very can could will would shall should may
might must about into over under again further once more most other some
such only own same s t don now d ll m o re ve y ain aren couldn didn
doesn hadn hasn haven isn ma mightn mustn needn shan shouldn wasn weren
won wouldn up down out off all any both each few show me find get want
looking look search photo image picture frame video clip scene shot
""".split())

# Visual vocabulary the reference's prompt template emphasises
# (colors / spatial terms / actions; ``core.py:582-625`` sections).
_COLORS = frozenset(
    "red orange yellow green blue purple pink brown black white gray grey "
    "golden silver dark bright colorful".split()
)
_ACTIONS_SUFFIX = ("ing",)


@dataclass(slots=True)
class TextAnalysis:
    """Structured view of a query (reference spaCy doc analog)."""

    text: str
    tokens: list[str] = field(default_factory=list)
    content_words: list[str] = field(default_factory=list)
    noun_phrases: list[str] = field(default_factory=list)
    entities: list[str] = field(default_factory=list)
    colors: list[str] = field(default_factory=list)
    actions: list[str] = field(default_factory=list)

    def to_dict(self) -> dict[str, Any]:
        return {
            "text": self.text,
            "tokens": self.tokens,
            "content_words": self.content_words,
            "noun_phrases": self.noun_phrases,
            "entities": self.entities,
            "colors": self.colors,
            "actions": self.actions,
        }


def _dedup(seq: list[str]) -> list[str]:
    seen: set[str] = set()
    out: list[str] = []
    for s in seq:
        if s not in seen:
            seen.add(s)
            out.append(s)
    return out


def analyze_text(text: str) -> TextAnalysis:
    """Tokenize + extract visual features from a (translated) query."""
    raw_tokens = _TOKEN_RE.findall(text)
    tokens = [t for t in raw_tokens]
    lower = [t.lower() for t in tokens]
    content = [t for t in lower if t not in _STOPWORDS and len(t) > 1]

    # noun-phrase-ish chunks: maximal runs of adjacent content words in the
    # original order (spaCy noun_chunks approximation for short queries)
    phrases: list[str] = []
    run: list[str] = []
    for t in lower:
        if t not in _STOPWORDS and len(t) > 1:
            run.append(t)
        else:
            if len(run) >= 2:
                phrases.append(" ".join(run))
            run = []
    if len(run) >= 2:
        phrases.append(" ".join(run))

    # entity guesses: capitalized sequences not at sentence start
    # (reference relied on spaCy NER; this heuristic covers names/places
    # in the query style the system sees)
    entities: list[str] = []
    ent_run: list[str] = []
    for i, t in enumerate(tokens):
        if t[:1].isupper() and i > 0 and t.lower() not in _STOPWORDS:
            ent_run.append(t)
        else:
            if ent_run:
                entities.append(" ".join(ent_run))
            ent_run = []
    if ent_run:
        entities.append(" ".join(ent_run))

    colors = [t for t in content if t in _COLORS]
    actions = [
        t for t in content
        if t.endswith(_ACTIONS_SUFFIX) and len(t) > 5 and t not in _COLORS
    ]
    return TextAnalysis(
        text=text,
        tokens=tokens,
        content_words=_dedup(content),
        noun_phrases=_dedup(phrases),
        entities=_dedup(entities),
        colors=_dedup(colors),
        actions=_dedup(actions),
    )


def content_words(text: str) -> list[str]:
    """Stopword-stripped lowercase keywords (translator/keyword helper)."""
    return analyze_text(text).content_words


def expand_variants(text: str, max_variants: int = 3) -> list[str]:
    """Cheap query expansion without an LLM (``core.py:2901-2913`` shim
    upgrade): the original, the content-word reduction, and the longest
    noun phrase — deduplicated, original first."""
    a = analyze_text(text)
    variants = [text.strip()]
    if a.content_words:
        variants.append(" ".join(a.content_words))
    if a.noun_phrases:
        variants.append(max(a.noun_phrases, key=len))
    return _dedup([v for v in variants if v])[:max_variants]
