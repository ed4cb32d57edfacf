"""Pure-Python (numpy) oracle: tokenize -> postings -> span queries -> BM25.

This is the PINNED reference implementation every Spark result is asserted
against (SURVEY.md §5.4): hits must match as (doc_id, start, end) sets and
top-k must be rank-identical (docIDs + scores, tiebreak doc_id asc).

BM25 is Lucene 8's formula (the reference delegates document scoring to a
default IndexSearcher => BM25Similarity k1=1.2 b=0.75,
engine/.../search/BlackLabIndexAbstract.java:521):

    idf      = ln(1 + (N - df + 0.5) / (df + 0.5))
    tf_norm  = tf / (tf + k1 * (1 - b + b * dl / avgdl))
    score    = sum_t idf_t * tf_norm_t * (k1 + 1)

with the SmallFloat doc-length byte-quantization made explicit: quantize=True
replicates Lucene's lossy 1-byte norm ranking, quantize=False is exact-float.
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field

import numpy as np

from ..tokenize import extract_text_one, fold_token, tokenize_one

K1 = 1.2
B = 0.75


# --------------------------------------------------------------- SmallFloat --
def _long_to_int4(i: int) -> int:
    if i < 0:
        raise ValueError("negative")
    num_bits = i.bit_length()
    if num_bits < 4:
        return i
    shift = num_bits - 4
    encoded = (i >> shift) & 0x07
    return encoded | ((shift + 1) << 3)


def _int4_to_long(i: int) -> int:
    bits = i & 0x07
    shift = (i >> 3) - 1
    return bits if shift == -1 else (bits | 0x08) << shift


_MAX_INT4 = _long_to_int4(2**31 - 1)
_NUM_FREE_VALUES = 255 - _MAX_INT4


def int_to_byte4(i: int) -> int:
    """Lossy int->byte (Lucene SmallFloat.intToByte4 semantics)."""
    if i < _NUM_FREE_VALUES:
        return i
    return _long_to_int4(i - _NUM_FREE_VALUES) + _NUM_FREE_VALUES


def byte4_to_int(b: int) -> int:
    if b < _NUM_FREE_VALUES:
        return b
    return _int4_to_long(b - _NUM_FREE_VALUES) + _NUM_FREE_VALUES


def small_float_norm(doc_len: int) -> int:
    """Quantized doc length as Lucene's byte norm would decode it."""
    return byte4_to_int(int_to_byte4(int(doc_len)))


# ------------------------------------------------------------------- index --
@dataclass
class OracleIndex:
    doc_ids: list[int] = field(default_factory=list)
    urls: list[str] = field(default_factory=list)
    langs: list[str] = field(default_factory=list)
    tokens: list[list[str]] = field(default_factory=list)        # surface
    tokens_fold: list[list[str]] = field(default_factory=list)   # folded
    texts: list[str] = field(default_factory=list)               # extracted

    @classmethod
    def build(cls, pages_pdf) -> "OracleIndex":
        """pages rows -> index; doc_id = dense rank over url (deterministic)."""
        rows = pages_pdf.sort_values("url").reset_index(drop=True)
        ix = cls()
        for doc_id, r in rows.iterrows():
            text = extract_text_one(r["html"], r["text"])
            toks = tokenize_one(text)
            ix.doc_ids.append(int(doc_id))
            ix.urls.append(r["url"])
            ix.langs.append(r["lang"])
            ix.texts.append(text)
            ix.tokens.append(toks)
            ix.tokens_fold.append([fold_token(t) for t in toks])
        return ix

    # ------------------------------------------------------------- helpers --
    @property
    def n_docs(self) -> int:
        return len(self.doc_ids)

    @property
    def avgdl(self) -> float:
        lens = [len(t) for t in self.tokens]
        return float(sum(lens)) / max(1, len(lens))

    def _layer(self, fold: bool) -> list[list[str]]:
        return self.tokens_fold if fold else self.tokens

    # ---------------------------------------------------------- span queries --
    def term_hits(self, term: str, fold: bool = True) -> list[tuple[int, int, int]]:
        q = fold_token(term) if fold else term
        out = []
        for d, toks in zip(self.doc_ids, self._layer(fold)):
            out.extend((d, p, p + 1) for p, t in enumerate(toks) if t == q)
        return out

    def regex_hits(self, pattern: str, fold: bool = True) -> list[tuple[int, int, int]]:
        rx = re.compile(pattern)
        out = []
        for d, toks in zip(self.doc_ids, self._layer(fold)):
            out.extend((d, p, p + 1) for p, t in enumerate(toks) if rx.fullmatch(t))
        return out

    def or_hits(self, *terms: str, fold: bool = True):
        out = set()
        for t in terms:
            out.update(self.term_hits(t, fold))
        return sorted(out)

    def docs_with(self, term: str, fold: bool = True) -> set[int]:
        q = fold_token(term) if fold else term
        return {d for d, toks in zip(self.doc_ids, self._layer(fold)) if q in toks}

    def and_docs(self, *terms: str, fold: bool = True) -> list[int]:
        sets = [self.docs_with(t, fold) for t in terms]
        return sorted(set.intersection(*sets)) if sets else []

    def and_not_docs(self, yes: str, no: str, fold: bool = True) -> list[int]:
        return sorted(self.docs_with(yes, fold) - self.docs_with(no, fold))

    def phrase_hits(self, *terms: str, fold: bool = True):
        qs = [fold_token(t) if fold else t for t in terms]
        k = len(qs)
        out = []
        for d, toks in zip(self.doc_ids, self._layer(fold)):
            for p in range(len(toks) - k + 1):
                if toks[p : p + k] == qs:
                    out.append((d, p, p + k))
        return out

    def near_hits(self, a: str, b: str, min_gap=0, max_gap=3, ordered=True, fold=True):
        """Hits spanning a..b with gap tokens between (reference:
        SpansSequenceWithGap semantics, SpansSequenceWithGap.java:13-57)."""
        qa = fold_token(a) if fold else a
        qb = fold_token(b) if fold else b
        out = []
        for d, toks in zip(self.doc_ids, self._layer(fold)):
            pa = [p for p, t in enumerate(toks) if t == qa]
            pb = [p for p, t in enumerate(toks) if t == qb]
            for i in pa:
                for j in pb:
                    gap = j - (i + 1)
                    if min_gap <= gap <= max_gap:
                        out.append((d, i, j + 1))
                    if not ordered:
                        gap2 = i - (j + 1)
                        if min_gap <= gap2 <= max_gap:
                            out.append((d, j, i + 1))
        return sorted(set(out))

    def count_hits(self, term: str, fold: bool = True) -> int:
        return len(self.term_hits(term, fold))

    def next_token_freq(self, term: str, fold: bool = True) -> dict[str, int]:
        """Collocation: frequency of the token following each hit."""
        freq: dict[str, int] = {}
        layer = self._layer(fold)
        for d, s, e in self.term_hits(term, fold):
            idx = self.doc_ids.index(d)
            toks = layer[idx]
            if e < len(toks):
                freq[toks[e]] = freq.get(toks[e], 0) + 1
        return freq

    def term_freqs(self, fold: bool = True) -> dict[str, int]:
        freq: dict[str, int] = {}
        for toks in self._layer(fold):
            for t in toks:
                freq[t] = freq.get(t, 0) + 1
        return freq

    # ------------------------------------------------------------------ BM25 --
    def bm25_scores(self, terms: list[str], fold=True, quantize=True,
                    where_lang: str | None = None) -> dict[int, float]:
        layer = self._layer(fold)
        qs = sorted({fold_token(t) if fold else t for t in terms})
        n = self.n_docs
        avgdl = self.avgdl
        lens = [len(t) for t in layer]
        scores: dict[int, float] = {}
        for q in qs:  # fixed term order => fixed float association order
            df = sum(1 for toks in layer if q in toks)
            if df == 0:
                continue
            idf = np.log(1.0 + (n - df + 0.5) / (df + 0.5))
            for idx, (d, toks) in enumerate(zip(self.doc_ids, layer)):
                if where_lang is not None and self.langs[idx] != where_lang:
                    continue
                tf = toks.count(q)
                if tf == 0:
                    continue
                dl = small_float_norm(lens[idx]) if quantize else lens[idx]
                tf_norm = tf / (tf + K1 * (1 - B + B * dl / avgdl))
                scores[d] = scores.get(d, 0.0) + float(idf * tf_norm * (K1 + 1))
        return scores

    def topk(self, terms: list[str], k=10, fold=True, quantize=True,
             where_lang: str | None = None) -> list[tuple[int, int, float]]:
        """[(rank, doc_id, score)] — score desc, doc_id asc tiebreak."""
        scores = self.bm25_scores(terms, fold, quantize, where_lang)
        ranked = sorted(scores.items(), key=lambda kv: (-kv[1], kv[0]))[:k]
        return [(r + 1, d, s) for r, (d, s) in enumerate(ranked)]
