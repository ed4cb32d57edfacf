"""Span algebra: the reference's physical span operators (SURVEY.md §2.3) as
DataFrame combinators over hits frames `(doc_id long, start int, end int)`.

Every combinator is a declarative plan fragment — Catalyst handles pushdown /
join strategy; all joins are doc_id-equi (+ positional conditions), so at
cluster scale they co-partition on doc_id and AQE handles skew. None of these
collect to the driver.

Reference parity notes (behavior, not code):
- sequence      -> SpanQuerySequence/SpansSequenceWithGap
                   (engine/.../search/lucene/SpanQuerySequence.java:33-49,
                    SpansSequenceWithGap.java:13-57): generates ALL matches.
- repetition    -> SpanQueryRepetition (SpanQueryRepetition.java:17-25):
                   emits every consecutive self-match of each length.
- expand        -> SpanQueryExpansion (SpanQueryExpansion.java:20-36): one hit
                   per padding amount in [min,max], clamped to [0, doc_len].
- any_token     -> SpanQueryAnyToken/SpansNGrams (SpanQueryAnyToken.java:22-25):
                   all n-grams, generated from doc lengths, never from postings.
- not_spans     -> SpanQueryNot/SpansNot (SpanQueryNot.java:20-25): all single
                   tokens not inside any clause hit.
- position_filter -> SpanQueryPositionFilter (SpanQueryPositionFilter.java:160-181
                   op enum; WITHIN/CONTAINING/STARTS_AT/ENDS_AT/MATCHES + invert).
- edge          -> SpanQueryEdge (SpanQueryEdge.java:15-23).
- filter_by_length -> SpanQueryFilterByHitLength (SpanQueryFilterByHitLength.java:16-21).
- and_spans / or_spans / and_not -> SpansAnd / BLSpanOrQuery / SpanQueryAndNot.
- capture       -> SpanQueryCaptureGroup (SpanQueryCaptureGroup.java:16-19):
                   extra (name_start, name_end) columns carried through joins.
- unique        -> SpansUnique (SpansUnique.java:8-11).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

HITS_COLS = ("doc_id", "start", "end")


def _caps(df: DataFrame) -> list[str]:
    """Capture-group columns riding along with the core hit columns."""
    return [c for c in df.columns if c not in HITS_COLS]


def sequence(a: DataFrame, b: DataFrame, gap_min: int = 0, gap_max: int | None = 0) -> DataFrame:
    """Concatenation a ++ b (optionally with [gap_min, gap_max] any-tokens
    between; gap_max=None = unbounded gap, e.g. `"a" []* "b"`). Emits ALL
    matches (the reference diverges from Lucene SpanNear here on purpose —
    SpanQuerySequence.java:33-49 javadoc)."""
    aa, bb = a.alias("a"), b.alias("b")
    if gap_min == 0 and gap_max == 0:
        cond = (F.col("a.doc_id") == F.col("b.doc_id")) & (
            F.col("b.start") == F.col("a.end")
        )
    elif gap_max is None:
        cond = (F.col("a.doc_id") == F.col("b.doc_id")) & (
            F.col("b.start") >= F.col("a.end") + gap_min
        )
    else:
        cond = (
            (F.col("a.doc_id") == F.col("b.doc_id"))
            & (F.col("b.start") >= F.col("a.end") + gap_min)
            & (F.col("b.start") <= F.col("a.end") + gap_max)
        )
    # Duplicate capture names (`A:"x" A:"y"`): the reference keeps ONE
    # match-info slot per name and the later capture overwrites
    # (HitQueryContext.registerMatchInfo, HitQueryContext.java:88-100) —
    # so for names on both sides, b (the later clause) wins; emitting both
    # would produce ambiguous duplicate columns.
    caps_b = _caps(b)
    cap_cols = [
        F.col(f"a.{c}").alias(c) for c in _caps(a) if c not in set(caps_b)
    ] + [F.col(f"b.{c}").alias(c) for c in caps_b]
    return aa.join(bb, cond).select(
        F.col("a.doc_id").alias("doc_id"),
        F.col("a.start").alias("start"),
        F.col("b.end").alias("end"),
        *cap_cols,
    )


def repetition(h: DataFrame, mn: int, mx: int | None, dedupe: bool = True) -> DataFrame:
    """h{mn,mx}: every run of mn..mx consecutive self-matches (all lengths;
    mx=None means unbounded, reference SpanQueryRepetition.java:17-25 has no
    cap). Bounded: iterated positional self-joins. Unbounded: prefix-doubling
    fixpoint — round k materializes all chains of up to 2^k base hits, so a
    maximal run of L clause matches costs O(log L) Spark jobs, not O(L).
    Each chain of m hits is produced exactly once (its exact-2^(k-1)-hit
    prefix + remainder decomposition is unique), so doubling adds no
    duplicate work over the linear walk.

    Capture groups INSIDE the clause become per-iteration LIST columns
    (`{name}_spans`: array<struct<start,end>>, one element per iteration in
    chain order), matching the reference's repetition match-info lists
    (SpansRepetition.java:8-21). With captures present, a span that
    decomposes into different chains is different match info, so dedupe
    keys include the lists.

    For capture-free single-token clauses prefer repetition_token_runs
    (no joins, no driver loop)."""
    assert 1 <= mn and (mx is None or mn <= mx)
    caps = _caps(h)
    names = sorted(
        c[: -len("_start")]
        for c in caps
        if c.endswith("_start") and f"{c[: -len('_start')]}_end" in caps
    )
    span_cols = [f"{n}_spans" for n in names]
    if names:
        base = h.select(
            *HITS_COLS,
            *[
                F.array(
                    F.struct(
                        F.col(f"{n}_start").cast("int").alias("start"),
                        F.col(f"{n}_end").cast("int").alias("end"),
                    )
                ).alias(f"{n}_spans")
                for n in names
            ],
        )
    else:
        base = h.select(*HITS_COLS)

    def chain(a: DataFrame, b: DataFrame) -> DataFrame:
        if not names and "_cnt" not in a.columns:
            return sequence(a, b)
        aa, bb = a.alias("a"), b.alias("b")
        cond = (F.col("a.doc_id") == F.col("b.doc_id")) & (
            F.col("b.start") == F.col("a.end")
        )
        cnt = (
            [(F.col("a._cnt") + F.col("b._cnt")).alias("_cnt")]
            if "_cnt" in a.columns
            else []
        )
        return aa.join(bb, cond).select(
            F.col("a.doc_id").alias("doc_id"),
            F.col("a.start").alias("start"),
            F.col("b.end").alias("end"),
            *cnt,
            *[F.concat(F.col(f"a.{c}"), F.col(f"b.{c}")).alias(c) for c in span_cols],
        )

    dd_keys = list(HITS_COLS) + span_cols
    if mx is not None:
        reps = [base]
        for _ in range(mx - 1):
            reps.append(chain(reps[-1], base))
        out = reps[mn - 1]
        for r in reps[mn:mx]:
            out = out.unionByName(r)
        # dedupe=False when the caller PROVES hits unique (fixed-length
        # unique clause: the start determines the chain) — the
        # SpanGuarantees move, skipping a real shuffle
        return out.dropDuplicates(dd_keys) if dedupe else out
    # Unbounded: prefix-doubling. `exact` holds chains of exactly 2^k base
    # hits, `parts` together hold every chain of <= 2^k hits (with its hit
    # count in _cnt). New chains of (2^k, 2^{k+1}] hits = exact ++ (any
    # shorter-or-equal chain) — a unique decomposition, so each chain
    # materializes once. O(log max_run) isEmpty jobs.
    base = base.withColumn("_cnt", F.lit(1)).persist()
    exact = base
    parts = [base]
    k = 1
    while True:
        allc = parts[0]
        for p in parts[1:]:
            allc = allc.unionByName(p)
        new = chain(exact, allc).persist()
        if new.isEmpty():
            new.unpersist()
            break
        parts.append(new)
        exact = chain(exact, exact).persist()
        k *= 2
        if k > 1 << 40:  # runaway guard (longest possible run << doc length)
            raise RuntimeError("repetition fixpoint did not converge")
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    out = out.filter(F.col("_cnt") >= mn).drop("_cnt")
    return out.dropDuplicates(dd_keys)


def repetition_token_runs(
    h: DataFrame, mn: int, mx: int | None, step: int = 1
) -> DataFrame:
    """h{mn,mx} for FIXED-LENGTH (length=step) capture-free clauses,
    unbounded-safe and join-free: gaps-and-islands — group chainable hits
    per doc into maximal runs, then emit every sub-chain with hit count in
    [mn, mx] (ALL-matches semantics, SpanQueryRepetition.java:17-25) by
    exploding (count, offset). One window + generate — no self-joins, no
    driver loop, no length cap.

    For step > 1 (multi-token fixed-length clauses, e.g. a 2-token phrase),
    two hits chain iff their starts differ by exactly `step`, so a chain
    stays inside one start-residue class mod step: the window partitions by
    (doc_id, start % step) and the island key is start - step*row_number —
    overlapping hits in OTHER residue classes can't break a run. Requires
    hits unique per (doc_id, start) (the caller proves g.unique)."""
    from pyspark.sql import Window

    assert 1 <= mn and (mx is None or mn <= mx) and step >= 1
    res = (F.pmod(F.col("start"), F.lit(step))).alias("_res")
    w = Window.partitionBy("doc_id", "_res").orderBy("start")
    runs = (
        h.select("doc_id", "start", res)
        .withColumn("_isl", F.col("start") - F.lit(step) * F.row_number().over(w))
        .groupBy("doc_id", "_res", "_isl")
        .agg(F.min("start").alias("rs"), F.count(F.lit(1)).alias("_n"))
        .filter(F.col("_n") >= mn)
    )
    max_l = F.col("_n") if mx is None else F.least(F.col("_n"), F.lit(mx))
    lens = runs.select(
        "doc_id", "rs", "_n", F.explode(F.sequence(F.lit(mn), max_l)).alias("l")
    )
    offs = lens.select(
        "doc_id", "l", "rs",
        F.explode(F.sequence(F.lit(0), F.col("_n") - F.col("l"))).alias("o"),
    )
    return offs.select(
        "doc_id",
        (F.col("rs") + F.col("o") * step).cast("int").alias("start"),
        (F.col("rs") + (F.col("o") + F.col("l")) * step).cast("int").alias("end"),
    )


def any_token(doc_lens: DataFrame, mn: int, mx: int | None) -> DataFrame:
    """[]{mn,mx}: all n-grams of lengths mn..mx, generated from doc lengths
    (doc_lens: doc_id, doc_len) — never materialized against postings.
    mx=None ([]* / []+): lengths up to each doc's length."""
    assert 0 <= mn and (mx is None or mn <= mx)
    lo = max(mn, 1)
    # guard doc_len < lo BEFORE sequence(): a descending sequence would emit
    # spurious lengths (sequence steps -1 when stop < start)
    doc_lens = doc_lens.filter(F.col("doc_len") >= lo)
    hi = F.col("doc_len") if mx is None else F.least(F.lit(mx), F.col("doc_len"))
    n = F.explode(F.sequence(F.lit(lo), hi)).alias("n")
    with_n = doc_lens.select("doc_id", "doc_len", n).filter(F.col("n") <= F.col("doc_len"))
    start = F.explode(F.sequence(F.lit(0), F.col("doc_len") - F.col("n"))).alias("start")
    return with_n.select("doc_id", start, "n").select(
        "doc_id", F.col("start").cast("int"), (F.col("start") + F.col("n")).cast("int").alias("end")
    )


def expand(h: DataFrame, doc_lens: DataFrame, direction: str, mn: int, mx: int | None) -> DataFrame:
    """Pad hits left/right by mn..mx any-tokens; one output hit per padding
    amount that stays inside [0, doc_len]. mx=None pads to the doc bounds."""
    assert direction in ("left", "right")
    caps = _caps(h)
    j = h.join(doc_lens, "doc_id")
    if mx is None:
        hi = F.col("start") if direction == "left" else F.col("doc_len") - F.col("end")
        j = j.filter(hi >= mn)
    else:
        hi = F.lit(mx)
    n = F.explode(F.sequence(F.lit(mn), hi)).alias("n")
    j = j.select("doc_id", "start", "end", "doc_len", *caps, n)
    if direction == "left":
        out = j.select(
            "doc_id", (F.col("start") - F.col("n")).cast("int").alias("start"),
            "end", *caps,
        ).filter(F.col("start") >= 0)
    else:
        out = j.select(
            "doc_id", "start", (F.col("end") + F.col("n")).cast("int").alias("end"),
            "doc_len", *caps,
        ).filter(F.col("end") <= F.col("doc_len")).drop("doc_len")
    return out


def not_spans(doc_lens: DataFrame, h: DataFrame) -> DataFrame:
    """All single-token positions not inside any hit of h."""
    pos = doc_lens.select(
        "doc_id", F.explode(F.sequence(F.lit(0), F.col("doc_len") - 1)).alias("p")
    ).filter(F.col("doc_len") > 0)
    hh = h.alias("h")
    cond = (
        (F.col("p.doc_id") == F.col("h.doc_id"))
        & (F.col("p.p") >= F.col("h.start"))
        & (F.col("p.p") < F.col("h.end"))
    )
    return (
        pos.alias("p")
        .join(hh, cond, "left_anti")
        .select("doc_id", F.col("p").cast("int").alias("start"),
                (F.col("p") + 1).cast("int").alias("end"))
    )


# position-filter ops (reference enum SpanQueryPositionFilter.java:160-181)
_OPS = {
    "within": lambda p, f: (p.start >= f.start) & (p.end <= f.end),
    "containing": lambda p, f: (p.start <= f.start) & (p.end >= f.end),
    "starts_at": lambda p, f: p.start == f.start,
    "ends_at": lambda p, f: p.end == f.end,
    "matches": lambda p, f: (p.start == f.start) & (p.end == f.end),
    "containing_at_start": lambda p, f: (p.start <= f.start) & (f.start < p.end),
    "containing_at_end": lambda p, f: (p.start < f.end) & (f.end <= p.end),
}


class _Cols:
    def __init__(self, prefix: str):
        self.start = F.col(f"{prefix}.start")
        self.end = F.col(f"{prefix}.end")


def position_filter(
    producer: DataFrame, filt: DataFrame, op: str, invert: bool = False
) -> DataFrame:
    """Keep producer hits standing in `op` relation to >=1 filter hit
    (or to none, when invert). Semi/anti join — producer hits never duplicate."""
    cond_fn = _OPS[op]
    p, f = _Cols("p"), _Cols("f")
    cond = (F.col("p.doc_id") == F.col("f.doc_id")) & cond_fn(p, f)
    how = "left_anti" if invert else "left_semi"
    return producer.alias("p").join(filt.alias("f"), cond, how)


def within(producer: DataFrame, filt: DataFrame, invert: bool = False) -> DataFrame:
    return position_filter(producer, filt, "within", invert)


def containing(producer: DataFrame, filt: DataFrame, invert: bool = False) -> DataFrame:
    return position_filter(producer, filt, "containing", invert)


def filter_ngrams(
    doc_lens: DataFrame, hits: DataFrame, mn: int, mx: int, op: str = "within"
) -> DataFrame:
    """All n-grams of length mn..mx standing in `op` relation to a hit
    (reference: SpanQueryFilterNGrams, SpanQueryFilterNGrams.java:15-18) —
    composed as any-token generation + position filter."""
    return position_filter(any_token(doc_lens, mn, mx), hits, op)


def edge(h: DataFrame, trailing: bool = False) -> DataFrame:
    """Zero-length leading/trailing edge of each hit."""
    c = F.col("end") if trailing else F.col("start")
    return h.select("doc_id", c.alias("start"), c.alias("end")).dropDuplicates()


def filter_by_length(h: DataFrame, mn: int, mx: int) -> DataFrame:
    return h.filter((F.col("end") - F.col("start")).between(mn, mx))


def and_spans(
    a: DataFrame, b: DataFrame,
    a_unique: bool = False, b_unique: bool = False,
) -> DataFrame:
    """Hits equal in (doc,start,end) in both clauses (SpansAnd). Capture
    columns from BOTH sides ride through (the reference merges match info).

    a_unique/b_unique: caller-proven span-set uniqueness (the SpanGuarantees
    flags, SpanGuarantees.java:22-67). A semi join FROM a provably-unique
    side produces the same distinct set as Intersect without Intersect's
    dedupe aggregate — one less shuffle stage."""
    caps_a, caps_b = _caps(a), _caps(b)
    if not caps_a and not caps_b:
        if a_unique:
            return a.select(*HITS_COLS).join(
                b.select(*HITS_COLS), list(HITS_COLS), "left_semi"
            )
        if b_unique:
            return b.select(*HITS_COLS).join(
                a.select(*HITS_COLS), list(HITS_COLS), "left_semi"
            )
        return a.select(*HITS_COLS).intersect(b.select(*HITS_COLS))
    a2 = a.dropDuplicates([*HITS_COLS, *caps_a])
    b2 = b.dropDuplicates([*HITS_COLS, *caps_b]).select(
        *HITS_COLS, *[c for c in caps_b if c not in caps_a]
    )
    return a2.join(b2, list(HITS_COLS))


def or_spans(a: DataFrame, b: DataFrame) -> DataFrame:
    """Union of clause hits. Capture columns survive (NULL-filled on the
    branch that lacks them — e.g. the EmptyClauseAlts no-optional branch);
    dedupe keys include captures so distinct match infos both survive."""
    caps_a, caps_b = _caps(a), _caps(b)
    if not caps_a and not caps_b:
        return (
            a.select(*HITS_COLS).unionByName(b.select(*HITS_COLS))
            .dropDuplicates(list(HITS_COLS))
        )
    out = a.select(*HITS_COLS, *caps_a).unionByName(
        b.select(*HITS_COLS, *caps_b), allowMissingColumns=True
    )
    return out.dropDuplicates(out.columns)


def and_not(a: DataFrame, b: DataFrame, dedupe: bool = True) -> DataFrame:
    """a minus hits equal to any b hit (SpanQueryAndNot simple form).

    dedupe=False when the caller proves a's span set unique (SpanGuarantees):
    exceptAll preserves multiplicity, so unique input means unique output and
    the dropDuplicates shuffle is skipped."""
    out = a.select(*HITS_COLS).exceptAll(b.select(*HITS_COLS))
    return out.dropDuplicates(list(HITS_COLS)) if dedupe else out


def capture(h: DataFrame, name: str) -> DataFrame:
    """Record the current span under `name` (extra columns ride along)."""
    return h.withColumn(f"{name}_start", F.col("start")).withColumn(
        f"{name}_end", F.col("end")
    )


def verify_adjacent(
    anchor: DataFrame,
    tokens_df: DataFrame,
    pattern: str,
    direction: str = "right",
    tokens_col: str = "tokens_fold",
) -> DataFrame:
    """Forward-index sequence matching (the reference's signature
    optimization: ClauseCombinerNfa -> SpanQueryFiSeq, SURVEY.md §4.3):
    instead of materializing the expensive clause's hits (regex/high-df) and
    joining, verify the neighbor token of each ANCHOR hit by indexing into
    the doc's token array — the "forward index" is a colocated column, so
    this is a broadcast-free array lookup, no shuffle of the expensive side.

    direction='right': anchor ++ pattern-token; 'left': pattern-token ++ anchor.
    Returns extended spans."""
    anchored = f"^(?:{pattern})$"
    j = anchor.join(tokens_df.select("doc_id", tokens_col), "doc_id")
    if direction == "right":
        tok = F.try_element_at(F.col(tokens_col), F.col("end") + 1)
        out = j.filter(tok.isNotNull() & tok.rlike(anchored)).select(
            "doc_id", "start", (F.col("end") + 1).alias("end"),
            *[c for c in anchor.columns if c not in HITS_COLS],
        )
    else:
        tok = F.try_element_at(F.col(tokens_col), F.col("start"))  # 1-based: pos start-1
        out = j.filter(
            (F.col("start") >= 1) & tok.isNotNull() & tok.rlike(anchored)
        ).select(
            "doc_id", (F.col("start") - 1).alias("start"), "end",
            *[c for c in anchor.columns if c not in HITS_COLS],
        )
    return out


def constrained(h: DataFrame, tokens_df: DataFrame, expr_fn) -> DataFrame:
    """Global constraint `::` (SpanQueryConstrained.java:18-25): join the doc's
    token array (the colocated forward index) and apply a Column predicate
    built by expr_fn(tokens_col, df) referencing captured positions."""
    j = h.join(tokens_df, "doc_id")
    return j.filter(expr_fn(F.col("tokens"), j)).drop("tokens")


def unique(h: DataFrame) -> DataFrame:
    return h.dropDuplicates(list(HITS_COLS))
