"""Contextual Query Language (SRU CQL) — the reference's second query
language, parsing to the same TextPattern IR plus a metadata filter
(reference: contextql.jj + ContextualQueryLanguageParser.java:40-183;
CompleteQuery = TextPattern + filter Query, CompleteQuery.java).

Semantics mirrored:
- `searchClause := [index relation] term`; only the `=`/`contains` relation
  is supported (ContextualQueryLanguageParser.java:46-59 throws on any/all/
  exact/comparators — same here).
- index resolution (ContextualQueryLanguageParser.contains, :89-108):
  an annotation name (word/lemma/pos), `contents` (= contents.word) or
  `contents.X` searches the contents field; anything else filters document
  metadata (here: the docs columns url/lang/warc_ts).
- values may carry `*`/`?` wildcards (TextPatternWildcard); multi-word
  values become a phrase (sequence of wildcard terms).
- clauses combine with and/or/not (CompleteQuery.and/or/not); `prox` is
  unsupported in the reference and here.
"""

from __future__ import annotations

import re
from dataclasses import dataclass

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .bcql import (
    TP,
    TPAnd,
    TPAndNot,
    TPOr,
    TPRegex,
    TPSequence,
    compile_pattern,
)
from .query import Index

ANNOTATIONS = ("word", "lemma", "pos")
METADATA_COLS = ("url", "lang", "warc_ts")


# --------------------------------------------------------- metadata filter --
@dataclass(frozen=True)
class FTerm:
    field: str
    value: str  # may carry * / ? wildcards, matched against the WHOLE value


@dataclass(frozen=True)
class FBool:
    op: str  # and | or | not
    left: "FTerm | FBool"
    right: "FTerm | FBool"


@dataclass
class CompleteQuery:
    """TextPattern (contents side) + metadata filter, either may be None
    (reference CompleteQuery.java)."""

    pattern: TP | None = None
    filter: "FTerm | FBool | None" = None


def _combine(a: CompleteQuery, op: str, b: CompleteQuery) -> CompleteQuery:
    """CompleteQuery.and/or/not (CompleteQuery.java:42-94): AND combines
    pattern and filter sides independently; OR requires both clauses to be
    the same kind (the reference throws otherwise); NOT negates."""
    out = CompleteQuery()
    if op == "and":
        if a.pattern and b.pattern:
            out.pattern = TPAnd([a.pattern, b.pattern])
        else:
            out.pattern = a.pattern or b.pattern
        if a.filter and b.filter:
            out.filter = FBool("and", a.filter, b.filter)
        else:
            out.filter = a.filter or b.filter
        return out
    if op == "or":
        if (a.pattern is None) != (b.pattern is None) or (
            (a.filter is None) != (b.filter is None)
        ):
            raise ValueError(
                "cannot OR a contents query with a metadata filter "
                "(reference CompleteQuery.or throws the same)"
            )
        if a.pattern and b.pattern:
            out.pattern = TPOr([a.pattern, b.pattern])
        if a.filter and b.filter:
            out.filter = FBool("or", a.filter, b.filter)
        return out
    if op == "not":
        if b.pattern is not None and a.pattern is not None:
            out.pattern = TPAndNot(a.pattern, b.pattern)
        elif a.pattern is not None:
            out.pattern = a.pattern
        elif b.pattern is not None:
            raise ValueError("NOT contents-clause needs a contents left side")
        if b.filter is not None:
            neg = FBool("not", b.filter, b.filter)
            out.filter = FBool("and", a.filter, neg) if a.filter else neg
        else:
            out.filter = a.filter
        return out
    raise ValueError(f"unsupported boolean: {op!r} (prox is not supported)")


def _wildcard_to_regex(value: str, token_level: bool = True) -> str:
    """TextPatternWildcard pattern: * = any run, ? = one char, rest literal.
    token_level confines wildcards within one token (contents terms);
    metadata values may contain spaces, so their wildcards match anything."""
    any_run, any_one = ("[^ ]*", "[^ ]") if token_level else (".*", ".")
    out = []
    for ch in value:
        if ch == "*":
            out.append(any_run)
        elif ch == "?":
            out.append(any_one)
        else:
            out.append(re.escape(ch))
    return "".join(out)


def _contents_clause(annot: str, value: str) -> TP:
    parts = value.strip().split()
    if not parts:
        raise ValueError("empty search term")
    tps: list[TP] = [
        TPRegex(_wildcard_to_regex(p), sensitive=False, annot=annot) for p in parts
    ]
    return tps[0] if len(tps) == 1 else TPSequence(tps)


def _search_clause(index: str | None, relation: str | None, term: str) -> CompleteQuery:
    if relation not in (None, "="):
        raise ValueError(
            f"only the '=' (contains) relation is supported, got {relation!r}"
        )
    field = index or "contents.word"
    if field in ANNOTATIONS:
        return CompleteQuery(pattern=_contents_clause(field, term))
    if field == "contents":
        return CompleteQuery(pattern=_contents_clause("word", term))
    if field.startswith("contents."):
        return CompleteQuery(pattern=_contents_clause(field[len("contents."):], term))
    if field not in METADATA_COLS:
        raise ValueError(
            f"unknown index {field!r} (annotations: {ANNOTATIONS}, "
            f"metadata: {METADATA_COLS})"
        )
    return CompleteQuery(filter=FTerm(field, term))


# -------------------------------------------------------------------- lexer --
_LEX = re.compile(
    r"""\s*(?:(?P<lparen>\()|(?P<rparen>\))"""
    r"""|(?P<cmp>>=|<=|<>|=|<|>)"""
    r"""|(?P<string>"(?:[^"\\]|\\.)*")"""
    r"""|(?P<ident>[^\s()<>="]+))"""
)


def _lex(q: str) -> list[tuple[str, str]]:
    out, i = [], 0
    while i < len(q):
        m = _LEX.match(q, i)
        if not m or m.end() == i:
            if q[i:].strip() == "":
                break
            raise ValueError(f"ContextQL lex error at {i}: {q[i:i+20]!r}")
        i = m.end()
        kind = m.lastgroup
        v = m.group(kind)
        if kind == "string":
            v = v[1:-1].replace('\\"', '"').replace("\\\\", "\\")
            kind = "term"
        elif kind == "ident":
            kind = "term"
        out.append((kind, v))
    out.append(("eof", ""))
    return out


_BOOLEANS = ("and", "or", "not", "prox")


class _Parser:
    def __init__(self, toks):
        self.toks = toks
        self.i = 0

    def peek(self):
        return self.toks[self.i]

    def next(self):
        t = self.toks[self.i]
        self.i += 1
        return t

    # scopedClause := searchClause [ boolean scopedClause ]
    def scoped(self) -> CompleteQuery:
        a = self.search_clause()
        k, v = self.peek()
        if k == "term" and v.lower() in _BOOLEANS:
            self.next()
            return _combine(a, v.lower(), self.scoped())
        return a

    # searchClause := '(' scopedClause ')' | [index relation] term
    def search_clause(self) -> CompleteQuery:
        k, v = self.peek()
        if k == "lparen":
            self.next()
            q = self.scoped()
            if self.next()[0] != "rparen":
                raise ValueError("ContextQL: expected ')'")
            return q
        if k != "term":
            raise ValueError(f"ContextQL: unexpected {v!r}")
        self.next()
        if self.peek()[0] == "cmp":
            rel = self.next()[1]
            k2, v2 = self.next()
            if k2 != "term":
                raise ValueError(f"ContextQL: expected search term, got {v2!r}")
            return _search_clause(v, rel, v2)
        return _search_clause(None, None, v)


def parse(q: str) -> CompleteQuery:
    p = _Parser(_lex(q))
    out = p.scoped()
    if p.peek()[0] != "eof":
        raise ValueError(f"ContextQL: trailing input at {p.peek()[1]!r}")
    return out


# ----------------------------------------------------------------- compiler --
def _filter_col(f) -> "F.Column":
    if isinstance(f, FTerm):
        pat = f"^(?:{_wildcard_to_regex(f.value, token_level=False)})$"
        return F.col(f.field).cast("string").rlike(pat)
    if isinstance(f, FBool):
        if f.op == "and":
            return _filter_col(f.left) & _filter_col(f.right)
        if f.op == "or":
            return _filter_col(f.left) | _filter_col(f.right)
        return ~_filter_col(f.left)
    raise TypeError(repr(f))


def find(ix: Index, query: str) -> DataFrame:
    """Parse + run a ContextQL query: hits of the contents pattern,
    restricted to documents matching the metadata filter (semi join on the
    docs table); a filter-only query returns matching doc_ids."""
    cq = parse(query)
    if cq.pattern is None and cq.filter is None:
        raise ValueError("empty query")
    if cq.pattern is None:
        return ix.docs.filter(_filter_col(cq.filter)).select("doc_id")
    hits = compile_pattern(ix, cq.pattern)
    if cq.filter is not None:
        docs = ix.docs.filter(_filter_col(cq.filter)).select("doc_id")
        hits = hits.join(docs, "doc_id", "left_semi")
    return hits
