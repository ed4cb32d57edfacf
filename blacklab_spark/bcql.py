"""BCQL (Corpus Query Language) subset: parser + logical patterns + compiler.

Mirrors the reference's three-layer query lifecycle (SURVEY.md §3.1):
CQL string -> TextPattern AST -> executable plan. Grammar shapes follow
query-parser/src/main/javacc/.../cql.jj; the IR mirrors
engine/.../search/textpattern/TextPattern.java's node set; compilation targets
our DataFrame span algebra instead of BLSpanQuery.

Supported subset (v1):
  "literal"  "reg.*ex"  "x"%c              bare terms (anchored-regex rule,
                                           CorpusQueryLanguageParser.java:88-98)
  [word="x" & word!="y"]  []  []{n,m}      token constraints / any-token
  A B        sequences (phrase fast path through posting intersection)
  A | B      union;  A & B  intersect
  A* A+ A? A{n,m}                          repetition
  N:A                                      capture groups
  <s/>       sentence spans;  X within Y;  X containing Y
  (...)      grouping

Rewrites applied (doc/technical/query rewriting.md:30-64 analogs):
  SimplestMatcher  regex -> term when the pattern is literal
  Flatten          nested sequences flatten
  TrivialRep       A{1,1} -> A
  CCAnyExpansion   []{m,n} A -> EXPAND(A, left, m, n)  (and mirrored right)
  phrase fast path SEQ(term...) -> posting-list intersection kernel
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field

from pyspark.sql import DataFrame

from . import spans as S
from .query import Index

# ----------------------------------------------------------------- patterns --


@dataclass
class TP:
    """TextPattern base (reference TextPattern.java:124)."""


ANNOTS = ("word", "lemma", "pos")


@dataclass
class TPTerm(TP):
    term: str
    sensitive: bool = False
    annot: str = "word"
    # partial-sensitivity variant: "" (use `sensitive`), "ci" (lowercase
    # only) or "di" (accent strip only) — MatchSensitivity.java:12-17
    sens: str = ""


@dataclass
class TPRegex(TP):
    pattern: str
    sensitive: bool = False
    annot: str = "word"
    sens: str = ""


@dataclass
class TPAnyToken(TP):
    mn: int = 1
    mx: int = 1


@dataclass
class TPNotTerm(TP):
    """Single-token negation [word!="x"] (SpanQueryNot analog)."""

    inner: TP


@dataclass
class TPSequence(TP):
    parts: list[TP] = field(default_factory=list)


@dataclass
class TPOr(TP):
    clauses: list[TP] = field(default_factory=list)


@dataclass
class TPAnd(TP):
    clauses: list[TP] = field(default_factory=list)


@dataclass
class TPRepetition(TP):
    clause: TP
    mn: int
    mx: int | None  # None = unbounded (reference SpanQueryRepetition has no cap)


@dataclass
class TPCapture(TP):
    name: str
    clause: TP


@dataclass
class TPTags(TP):
    """Inline-tag query (reference TextPatternTags, cql.jj:348-391): `<s/>`
    (full span), `<s>` (zero-length leading edge), `</s>` (trailing edge),
    with optional attribute filters `<p class="intro"/>`."""

    name: str
    attrs: tuple = ()  # ((key, value), ...) exact-match filters
    adjust: str = "full"  # full | leading | trailing

    def __post_init__(self):
        # the grammar cannot express attrs on a closing tag (</p>), so the
        # node must not represent it either — to_cql would silently drop
        # the filter otherwise
        if self.adjust == "trailing" and self.attrs:
            raise ValueError("closing-edge tags cannot carry attribute filters")


@dataclass
class TPDefaultValue(TP):
    """The `_` placeholder (reference SpanQueryDefaultValue / <DEFAULT_VALUE>
    cql.jj:98): an unconstrained relation side; an error anywhere else."""


@dataclass
class TPRelation(TP):
    """Relation query `SRC -type-> TGT` (reference relationQuery,
    cql.jj:277-341 -> SpanQueryRelations): match relations whose rtype
    matches `rtype` (regex allowed), whose source span equals a SRC hit and
    target span equals a TGT hit (`_` = unconstrained). Returned span per
    `mode` ('full' default; rspan() adjusts — SpanQueryRelationSpanAdjust)."""

    source: TP
    rtype: str
    target: TP
    mode: str = "full"


@dataclass
class TPAlignment(TP):
    """Parallel-corpus alignment operator `a ==>nl b` / `a =type=>nl b`
    (reference: RelationOperatorInfo.java:25-70, alignment relations between
    parallel fields; SpanQueryCaptureRelationsBetweenSpans): keep `a` hits
    (main field) linked by an alignment relation to a `b` hit in parallel
    field `field`. `_` as target = any aligned span."""

    source: TP
    field: str
    target: TP
    rtype: str | None = None
    # capture label (`src A:==>nl tgt`, reference childRelation captureLabel,
    # cql.jj:303-315): adds A_start/A_end = enclosing span of the matched
    # relations' targets, in the parallel field's token space
    capture: str | None = None
    # `==>nl?`: keep source hits even without a matching alignment
    # (reference optionalMatch, RelationOperatorInfo.java:50-53)
    optional: bool = False


@dataclass
class TPFieldOverride(TP):
    """`@field=nl <pattern>`: evaluate the whole pattern against a PARALLEL
    document version; hits are in that field's token space (reference:
    SpansOverrideField switches the annotated field mid-query). v1 supports
    the forward-index-matchable subset (terms/regexes/sequences)."""

    field: str
    clause: TP


@dataclass
class TPRelMatch(TP):
    """Multiple child relations of one parent: `a -x-> b ; -y-> c`
    (reference: cql.jj:289-290 child list -> TextPatternRelationMatch ->
    SpansAndMultiUniqueRelations over [parent, child source spans],
    TextPatternRelationMatch.java:91-122). Result span = the shared parent/
    source span; each child clause must be satisfied by a DISTINCT relation
    (SpansAndMultiUniqueRelations.java:308-319)."""

    parent: TP  # TPDefaultValue = any source
    children: tuple  # ((rtype, target TP), ...)
    # span each child clause contributes to the coinciding-span AND:
    # 'source' for `;` child lists (CorpusQueryLanguageParser.java:145-153),
    # 'full' when built by rmatch() over whole relation queries, which AND
    # the clauses' own (full) spans (XFRelations.java:137-142)
    child_mode: str = "source"


@dataclass
class TPAndNot(TP):
    """Span-level AND-NOT (reference TextPatternAndNot -> SpanQueryAndNot):
    `include` hits minus hits identical to any `exclude` hit. Produced by
    rewrites and ContextQL's NOT, not by BCQL surface syntax; prints as the
    engine function `_andnot(a, b)`."""

    include: TP
    exclude: TP


@dataclass
class TPRelCapture(TP):
    """rcapture(query[, name[, rtype]]) (reference XFRelations.rcapture,
    XFRelations.java:147-163): hits of `clause` with all relations inside
    the span captured as a LIST column `name` (optionally filtered by
    rtype regex)."""

    clause: TP
    name: str = "captured_rels"
    rtype: str | None = None
    # rcapture2(query, toCapture, captureAs, rtype): relations inside the
    # named capture group's span (XFRelations.rcaptureWithinCapture)
    within_capture: str | None = None


@dataclass
class TPFiSeq(TP):
    """Forced forward-index sequence direction (reference debug functions
    _FI1/_FI2, extensions/XFDebug.java:43-45, exercised by hits.js:55-56):
    _FI1(a, b) anchors on a's hits and verifies b against the forward index
    to the right; _FI2(a, b) anchors on b and verifies a to the left —
    the two-sided harness that pins the FiSeq optimization."""

    left: TP
    right: TP
    direction: str  # 'fwd' (_FI1) | 'bwd' (_FI2)


@dataclass
class TPPosFilter(TP):
    producer: TP
    filt: TP
    op: str  # within | containing
    invert: bool = False


@dataclass
class TPConstrained(TP):
    """Global constraint `A:[] "x" B:[] :: A.word = B.word`
    (reference: constrainedQuery cql.jj:155-167 -> SpanQueryConstrained)."""

    clause: TP
    constraint: "CExpr"


@dataclass
class CExpr:
    """MatchFilter node: comparison or boolean combination."""

    op: str  # '=' '!=' '&' '|'
    left: "CExpr | CRef | str"
    right: "CExpr | CRef | str"


@dataclass
class CRef:
    """Capture dereference `A.word` / `A.lemma` / `A.pos` or function
    `start(A)` / `end(A)`."""

    name: str
    kind: str = "word"  # word | lemma | pos | start | end


# --------------------------------------------- query extension functions --
@dataclass(frozen=True)
class QueryFunction:
    """A registered query extension function (reference: the QueryExtensions
    registry, QueryExtensions.java:150-179, with built-ins from XFDebug and
    XFRelations). arg_types per slot: 'Q' = subquery, 'S' = quoted string;
    `defaults` right-aligns onto trailing optional slots; `build` maps the
    parsed argument list to a TextPattern node."""

    name: str
    arg_types: tuple
    build: object  # Callable[[list], TP]
    defaults: tuple = ()


QUERY_FUNCTIONS: dict[str, QueryFunction] = {}


def register_function(name, arg_types, build, defaults=()):
    """Add a query function usable as `name(arg, ...)` in BCQL (reference:
    QueryExtensions.register, QueryExtensions.java:164-179)."""
    QUERY_FUNCTIONS[name] = QueryFunction(name, tuple(arg_types), build, tuple(defaults))


def _build_fiseq(direction):
    return lambda a: TPFiSeq(a[0], a[1], direction)


def _build_rel(a):
    # rel(type[, mode]) (reference XFRelations.rel, XFRelations.java:26-30)
    return TPRelation(TPDefaultValue(), a[0], TPDefaultValue(), a[1])


def _build_rspan(a):
    # rspan(relquery, mode) (reference XFRelations.rspan)
    if not isinstance(a[0], TPRelation):
        raise ValueError("rspan(): first argument must be a relation query")
    q = a[0]
    return TPRelation(q.source, q.rtype, q.target, a[1])


# built-ins (reference: QueryExtensions static block, QueryExtensions.java:146-148)
register_function("_FI1", "QQ", _build_fiseq("fwd"))  # XFDebug.java:43
register_function("_FI2", "QQ", _build_fiseq("bwd"))  # XFDebug.java:44
register_function("_ident", "Q", lambda a: a[0])      # XFDebug.java:42
register_function("rel", "SS", _build_rel, defaults=("full",))
register_function("rspan", "QS", _build_rspan)
register_function(
    "rcapture", "QSS",
    lambda a: TPRelCapture(a[0], a[1], a[2]),
    defaults=("captured_rels", None),
)
register_function(
    "rcapture2", "QSSS",
    lambda a: TPRelCapture(a[0], a[2], a[3], a[1]),
    defaults=("captured_rels", None),
)
register_function("_andnot", "QQ", lambda a: TPAndNot(a[0], a[1]))
# rmatch: AND over relation clauses (XFRelations.rmatch ->
# TextPatternRelationMatch.createRelMatchQuery). When every clause is a
# relation query sharing an unconstrained source (`_ -x-> t`), this is the
# `;` child-list shape and compiles to the unique-relations AND
# (SpansAndMultiUniqueRelations); mixed clause shapes fall back to a plain
# coinciding-span AND (divergence: uniqueness unenforced there, documented).
def _build_rmatch(a):
    if len(a) == 1:
        return a[0]
    if all(
        isinstance(c, TPRelation) and isinstance(c.source, TPDefaultValue)
        for c in a
    ) and len({c.mode for c in a}) == 1:
        return TPRelMatch(
            TPDefaultValue(), tuple((c.rtype, c.target) for c in a),
            child_mode=a[0].mode,
        )
    return TPAnd(list(a))


register_function("rmatch", ("Q", "Q*"), _build_rmatch)


# -------------------------------------------------------------------- lexer --
_TOKEN_SPEC = [
    ("QUOTED", r'"(?:[^"\\]|\\.)*"'),
    ("SETTINGS", r"@[A-Za-z0-9_]+=[A-Za-z0-9_]+(?:,[A-Za-z0-9_]+=[A-Za-z0-9_]+)*"),
    ("FLAGS", r"%[cdisCDIS]+"),
    ("NUMBER", r"\d+"),
    ("NAME", r"[A-Za-z_][A-Za-z0-9_]*"),
    # full reference tag forms (cql.jj:354): <name attr="v" .../>, <name>,
    # </name>. Must precede OP so `<`/`>` comparison operators still lex:
    # a comparison's right side never looks like `name…>` immediately.
    ("TAG", r"""<\s*/?\s*[A-Za-z_][A-Za-z0-9_]*"""
            r"""(?:\s+[A-Za-z_][-A-Za-z0-9_:]*\s*=\s*(?:"[^"]*"|'[^']*'))*"""
            r"""\s*/?\s*>"""),
    # alignment operator `==>field` / `=type=>field` (parallel corpora,
    # RelationOperatorInfo.java:30-33) — before OP so `=` still lexes alone
    ("ALIGNOP", r"=[-A-Za-z0-9_.|*?]*=>[A-Za-z0-9_]*\??"),
    ("RELOP", r"-[:A-Za-z0-9_.|*?]*->"),
    ("OP", r"::|!=|<=|>=|=|\{|\}|\[|\]|\(|\)|\||&|!|\*|\+|\?|:|,|\.|<|>|;"),
    ("WS", r"\s+"),
]
_LEX = re.compile("|".join(f"(?P<{n}>{p})" for n, p in _TOKEN_SPEC))


def _lex(q: str) -> list[tuple[str, str]]:
    out, i = [], 0
    while i < len(q):
        m = _LEX.match(q, i)
        if not m:
            raise ValueError(f"BCQL lex error at {i}: {q[i:i+20]!r}")
        if m.lastgroup == "WS":
            i = m.end()
            continue
        out.append((m.lastgroup, m.group()))
        i = m.end()
    out.append(("EOF", ""))
    return out


_LITERAL_RE = re.compile(r"^[\wÀ-ɏ]*$", re.UNICODE)


def _flags_to_sens(flags: str | None) -> str:
    """%-flag chars -> MatchSensitivity code (MatchSensitivity.get,
    MatchSensitivity.java:19-24): `c`/`d` turn case-/diacritics-sensitivity
    ON, `C`/`D` force it OFF, legacy `s`/`i` set both. Default: insensitive.
    (caseSensitive, diacriticsSensitive) -> s / i / ci / di."""
    cs = ds = False
    for ch in flags or "":
        if ch == "c":
            cs = True
        elif ch == "C":
            cs = False
        elif ch == "d":
            ds = True
        elif ch == "D":
            ds = False
        elif ch in "sS":
            cs = ds = True
        elif ch in "iI":
            cs = ds = False
    return {(True, True): "s", (False, False): "i",
            (False, True): "ci", (True, False): "di"}[(cs, ds)]


def _quoted_to_tp(raw: str, flags: str | None) -> TP:
    """Bare string -> anchored regex -> simplified (SimplestMatcher;
    reference CorpusQueryLanguageParser.java:88-98 + TextPatternRegex.
    rewriteForQuery TextPatternRegex.java:73-98)."""
    s = raw[1:-1].replace('\\"', '"').replace("\\\\", "\\")
    code = _flags_to_sens(flags)
    sensitive = code == "s"
    sens = code if code in ("ci", "di") else ""
    if _LITERAL_RE.match(s):
        return TPTerm(s, sensitive, sens=sens)
    return TPRegex(s, sensitive, sens=sens)


# ------------------------------------------------------------------- parser --
class _Parser:
    def __init__(self, toks: list[tuple[str, str]]):
        self.toks = toks
        self.i = 0
        self.settings: dict[str, str] = {}

    def peek(self) -> tuple[str, str]:
        return self.toks[self.i]

    def next(self) -> tuple[str, str]:
        t = self.toks[self.i]
        self.i += 1
        return t

    def expect(self, val: str) -> None:
        k, v = self.next()
        if v != val:
            raise ValueError(f"BCQL parse error: expected {val!r}, got {v!r}")

    def _function_call(self, fn: "QueryFunction") -> TP:
        """`name(` already consumed up to the name; parse the argument list
        per fn.arg_types ('Q' = subquery, 'S' = quoted string; a trailing
        '*' marks the last slot variadic — reference ArgType.ELLIPSIS),
        applying right-aligned defaults for omitted trailing args."""
        self.expect("(")
        variadic = fn.arg_types and fn.arg_types[-1].endswith("*")
        fixed = fn.arg_types[:-1] if variadic else fn.arg_types
        n_req = len(fixed) - len(fn.defaults)
        args: list = []
        for idx, at in enumerate(fixed):
            if idx > 0:
                if self.peek()[1] == ",":
                    self.next()
                elif idx >= n_req:
                    break
                else:
                    self.expect(",")
            elif self.peek()[1] == ")" and n_req == 0:
                break
            args.append(self.query() if at == "Q" else _quoted_val(self.atom()))
        while len(args) < len(fixed):
            args.append(fn.defaults[len(args) - n_req])
        if variadic:
            at = fn.arg_types[-1][0]
            if not args and self.peek()[1] != ")":
                # purely-variadic signature: first arg has no preceding comma
                args.append(self.query() if at == "Q" else _quoted_val(self.atom()))
            while self.peek()[1] == ",":
                self.next()
                args.append(self.query() if at == "Q" else _quoted_val(self.atom()))
        self.expect(")")
        return fn.build(args)

    # query := SETTINGS? seqOr (('within'|'containing') seqOr)* ('::' constraint)?
    def query(self) -> TP:
        # settings prefix "@a=b,c=d" (reference settingsQuery, cql.jj:129-152
        # -> TextPatternSettings); understood keys: defann = default
        # annotation for BARE terms/regexes (explicit [word=...] unaffected),
        # field = parallel-field override, rc / relationclass = default
        # relation class for bare relation types (TextPatternSettings.java:
        # 33-40; explicit `cls::type` wins, RelationUtil.fullTypeRegex).
        # Allowed ONLY at the very start of
        # the input (the reference's settingsQuery wraps the whole query);
        # a nested prefix would leak into the shared settings and silently
        # rescope the entire query.
        while self.peek()[0] == "SETTINGS":
            if any(self.toks[j][0] != "SETTINGS" for j in range(self.i)):
                raise ValueError(
                    "settings prefix (@k=v) is only allowed at the start of "
                    "the query"
                )
            for kv in self.next()[1][1:].split(","):
                k, v = kv.split("=")
                self.settings[k] = v
            da = self.settings.get("defann")
            if da is not None and da not in ANNOTS:
                raise ValueError(f"@defann={da!r}: unknown annotation (supported: {ANNOTS})")
        left = self.rel_query()
        while self.peek()[1] in ("within", "containing"):
            op = self.next()[1]
            right = self.rel_query()
            left = TPPosFilter(left, right, op)
        if self.peek()[1] == "::":
            self.next()
            left = TPConstrained(left, self.constraint())
        return left

    def _rel_type(self, rtype: str) -> str:
        """Prefix the default relation class onto a bare relation type
        (reference: settings key relationclass/rc applied through
        QueryExecutionContext.withDefaultRelationClass; an explicit
        `cls::type` spelling wins — RelationUtil.fullTypeRegex)."""
        rc = self.settings.get("rc") or self.settings.get("relationclass")
        if rc and rtype and "::" not in rtype:
            return f"{rc}::{rtype}"
        return rtype

    # relQuery := seqOr ((RELOP|ALIGNOP) relQuery)?  — relation/alignment
    # operators bind LOOSER than sequence/boolean, tighter than
    # within/containing (reference: relationQuery sits between
    # containingWithinQuery and booleanQuery, cql.jj:246-301), so
    # `"de" "hond" ==>en "the" "dog"` aligns the two-token sequences.
    def rel_query(self) -> TP:
        node = self.seq_or()
        # optional capture label between source and operator
        # (childRelation := [captureLabel ':'] relationType target)
        label = None
        if (
            self.peek()[0] == "NAME"
            and self.toks[self.i + 1][1] == ":"
            and self.toks[self.i + 2][0] in ("RELOP", "ALIGNOP")
        ):
            label = self.next()[1]
            self.next()  # ':'
        k, op = self.peek()
        if k == "RELOP":
            self.next()
            rtype = self._rel_type(op[1:-2])  # strip '-' and '->'
            rel: TP = TPRelation(node, rtype, self.rel_query())
            # child-relation list: `a -x-> b ; -y-> c` (cql.jj:289-290)
            if self.peek()[1] == ";":
                children = [(rtype, rel.target)]
                while self.peek()[1] == ";":
                    self.next()
                    k2, op2 = self.next()
                    if k2 != "RELOP":
                        raise ValueError(
                            f"expected a relation operator after ';', got {op2!r}"
                        )
                    children.append((self._rel_type(op2[1:-2]), self.rel_query()))
                rel = TPRelMatch(node, tuple(children))
            return TPCapture(label, rel) if label else rel
        if k == "ALIGNOP":
            self.next()
            optional = op.endswith("?")
            if optional:
                op = op[:-1]
            body, field = op[1:].split("=>")  # '=TYPE=>FIELD' / '==>FIELD'
            if not field:
                raise ValueError(f"alignment operator needs a target field: {op!r}")
            return TPAlignment(
                node, field, self.rel_query(), body or None, label, optional
            )
        if label is not None:
            raise ValueError("capture label must precede a relation operator")
        return node

    # constraint := cand ('|' cand)* ; cand := catom ('&' catom)*
    def constraint(self) -> CExpr:
        parts = [self.cand()]
        while self.peek()[1] == "|":
            self.next()
            parts.append(self.cand())
        out = parts[0]
        for p in parts[1:]:
            out = CExpr("|", out, p)
        return out

    def cand(self) -> CExpr:
        parts = [self.catom()]
        while self.peek()[1] == "&":
            self.next()
            parts.append(self.catom())
        out = parts[0]
        for p in parts[1:]:
            out = CExpr("&", out, p)
        return out

    def catom(self) -> CExpr:
        if self.peek()[1] == "(":
            self.next()
            e = self.constraint()
            self.expect(")")
            return e
        left = self.cval()
        op = self.next()[1]
        if op not in ("=", "!=", "<", "<=", ">", ">="):
            raise ValueError(f"BCQL constraint: bad comparator {op!r}")
        right = self.cval()
        return CExpr(op, left, right)

    def cval(self):
        k, v = self.next()
        if k == "QUOTED":
            return v[1:-1]
        if k == "NUMBER":
            return int(v)
        if k == "NAME" and v in ("start", "end") and self.peek()[1] == "(":
            self.next()
            nk, name = self.next()
            self.expect(")")
            return CRef(name, v)
        if k == "NAME":
            kind = "word"
            if self.peek()[1] == ".":
                self.next()
                _, annot = self.next()
                if annot not in ANNOTS:
                    raise ValueError(f"BCQL constraint: unknown annotation {annot!r}")
                kind = annot
            return CRef(v, kind)
        raise ValueError(f"BCQL constraint: unexpected {v!r}")

    # seqOr := seqAnd ('|' seqAnd)*
    def seq_or(self) -> TP:
        parts = [self.seq_and()]
        while self.peek()[1] == "|":
            self.next()
            parts.append(self.seq_and())
        return parts[0] if len(parts) == 1 else TPOr(parts)

    def seq_and(self) -> TP:
        parts = [self.sequence()]
        while self.peek()[1] == "&":
            self.next()
            parts.append(self.sequence())
        return parts[0] if len(parts) == 1 else TPAnd(parts)

    # sequence := seqpart+
    def sequence(self) -> TP:
        parts = [self.seqpart()]
        while True:
            k, v = self.peek()
            if k in ("QUOTED", "TAG") or v in ("[", "(", "!") or (
                k == "NAME" and v not in ("within", "containing")
                and self.toks[self.i + 1][1] == ":"
                # `A:` before a relation/alignment op is a relation capture
                # label for rel_query, not a sequence part
                and self.toks[self.i + 2][0] not in ("RELOP", "ALIGNOP")
            ):
                parts.append(self.seqpart())
            else:
                break
        flat: list[TP] = []  # Flatten (SpanQuerySequence.flattenSequence)
        for p in parts:
            if isinstance(p, TPSequence):
                flat.extend(p.parts)
            else:
                flat.append(p)
        return flat[0] if len(flat) == 1 else TPSequence(flat)

    # seqpart := [NAME ':'] atom repetition?
    def seqpart(self) -> TP:
        k, v = self.peek()
        if k == "NAME" and self.toks[self.i + 1][1] == ":":
            name = self.next()[1]
            self.next()  # ':'
            inner = self.seqpart()
            return TPCapture(name, inner)
        return self.maybe_repeat(self.atom())

    def maybe_repeat(self, node: TP) -> TP:
        k, v = self.peek()
        if v == "*":
            self.next()
            return TPRepetition(node, 0, None)
        if v == "+":
            self.next()
            return TPRepetition(node, 1, None)
        if v == "?":
            self.next()
            return TPRepetition(node, 0, 1)
        if v == "{":
            self.next()
            mn = int(self.next()[1])
            mx: int | None = mn
            if self.peek()[1] == ",":
                self.next()
                if self.peek()[0] == "NUMBER":
                    mx = int(self.next()[1])
                else:
                    mx = None  # {n,} — unbounded
            self.expect("}")
            if mn == 1 and mx == 1:  # TrivialRep
                return node
            return TPRepetition(node, mn, mx)
        return node

    def atom(self) -> TP:
        k, v = self.peek()
        if k == "NAME" and v == "_":
            self.next()
            return TPDefaultValue()
        if k == "NAME" and v in QUERY_FUNCTIONS and self.toks[self.i + 1][1] == "(":
            return self._function_call(QUERY_FUNCTIONS[self.next()[1]])
        if k == "QUOTED":
            self.next()
            flags = None
            if self.peek()[0] == "FLAGS":
                flags = self.next()[1]
            node = _quoted_to_tp(v, flags)
            da = self.settings.get("defann", "word")
            if da != "word" and isinstance(node, (TPTerm, TPRegex)):
                node.annot = da
            return node
        if k == "TAG":
            self.next()
            closing = re.match(r"<\s*/", v) is not None
            selfclose = re.search(r"/\s*>$", v) is not None
            if closing and selfclose:
                raise ValueError(f"malformed tag: {v!r}")
            name = re.match(r"<\s*/?\s*([A-Za-z_][A-Za-z0-9_]*)", v).group(1)
            attrs = tuple(sorted(
                (ak, av[1:-1])
                for ak, av in re.findall(
                    r"""([A-Za-z_][-A-Za-z0-9_:]*)\s*=\s*("[^"]*"|'[^']*')""", v
                )
            ))
            if closing and attrs:
                raise ValueError(f"closing tag cannot carry attributes: {v!r}")
            # reference adjust mapping (cql.jj:359-365): self-closing = the
            # full span; open tag = leading edge; close tag = trailing edge
            adjust = "full" if selfclose else ("trailing" if closing else "leading")
            return TPTags(name, attrs, adjust)
        if v == "(":
            self.next()
            node = self.query()
            self.expect(")")
            return node
        if v == "!":
            self.next()
            return TPNotTerm(self.atom())
        if v == "[":
            self.next()
            if self.peek()[1] == "]":
                self.next()
                return TPAnyToken(1, 1)
            node = self.pred_or()
            self.expect("]")
            return node
        raise ValueError(f"BCQL parse error at {v!r}")

    # token-level predicates inside [...]
    def pred_or(self) -> TP:
        parts = [self.pred_and()]
        while self.peek()[1] == "|":
            self.next()
            parts.append(self.pred_and())
        return parts[0] if len(parts) == 1 else TPOr(parts)

    def pred_and(self) -> TP:
        parts = [self.pred()]
        while self.peek()[1] == "&":
            self.next()
            parts.append(self.pred())
        return parts[0] if len(parts) == 1 else TPAnd(parts)

    def pred(self) -> TP:
        neg = False
        if self.peek()[1] == "!":
            self.next()
            neg = True
        k, annot = self.next()
        if k != "NAME":
            raise ValueError(f"BCQL: expected annotation name, got {annot!r}")
        if annot not in ANNOTS:
            raise ValueError(
                f"BCQL: unknown annotation {annot!r} (supported: {ANNOTS})"
            )
        op = self.next()[1]
        if op not in ("=", "!="):
            raise ValueError(f"BCQL: expected = or !=, got {op!r}")
        qk, qv = self.next()
        if qk != "QUOTED":
            raise ValueError("BCQL: expected quoted value")
        flags = None
        if self.peek()[0] == "FLAGS":
            flags = self.next()[1]
        node = _quoted_to_tp(qv, flags)
        if annot != "word":
            node.annot = annot
        if (op == "!=") != neg:
            node = TPNotTerm(node)
        return node


def _quoted_val(tp: TP) -> str:
    if isinstance(tp, TPTerm):
        return tp.term
    if isinstance(tp, TPRegex):
        return tp.pattern
    raise ValueError(f"expected a quoted string argument, got {tp!r}")


def parse(q: str) -> TP:
    p = _Parser(_lex(q))
    node = p.query()
    if p.peek()[0] != "EOF":
        raise ValueError(f"BCQL: trailing input at {p.peek()[1]!r}")
    fld = p.settings.get("field")
    if fld:
        node = TPFieldOverride(fld, node)
    return node


# ----------------------------------------------------------------- compiler --
def compile_pattern(ix: Index, tp: TP) -> DataFrame:
    """TextPattern -> hits DataFrame (the reference's translate() +
    rewrite() collapsed; Catalyst handles the relational part)."""
    if isinstance(tp, TPTerm):
        return ix.term_hits(
            tp.term, fold=not tp.sensitive, annot=tp.annot, sens=tp.sens or None
        )
    if isinstance(tp, TPRegex):
        return ix.regex_hits(
            tp.pattern, fold=not tp.sensitive, annot=tp.annot, sens=tp.sens or None
        )
    if isinstance(tp, TPAnyToken):
        return S.any_token(ix.doc_lens(), tp.mn, tp.mx)
    if isinstance(tp, TPNotTerm):
        return S.not_spans(ix.doc_lens(), compile_pattern(ix, tp.inner))
    if isinstance(tp, TPTags):
        return ix.tag_hits(tp.name, attrs=dict(tp.attrs), adjust=tp.adjust)
    if isinstance(tp, TPOr):
        # term-disjunction fast path: '"a" | "b"' fetches ONE postings union
        # (BLSpanOrQuery's term list) instead of per-clause frames + dedupe
        # shuffles — provably duplicate-free (distinct terms, distinct
        # positions; SpanGuarantees uniqueness argument)
        if all(
            isinstance(c, TPTerm)
            and c.sensitive == tp.clauses[0].sensitive
            and c.sens == tp.clauses[0].sens
            and c.annot == tp.clauses[0].annot
            for c in tp.clauses
        ):
            return ix.or_hits(
                [c.term for c in tp.clauses],
                fold=not tp.clauses[0].sensitive,
                annot=tp.clauses[0].annot,
                sens=tp.clauses[0].sens or None,
            )
        out = compile_pattern(ix, tp.clauses[0])
        for c in tp.clauses[1:]:
            out = S.or_spans(out, compile_pattern(ix, c))
        return out
    if isinstance(tp, TPAnd):
        # SpanGuarantees-driven physical choice: a provably-unique side
        # turns Intersect into a semi join (no dedupe aggregate)
        out = compile_pattern(ix, tp.clauses[0])
        u = guarantees(tp.clauses[0]).unique
        for c in tp.clauses[1:]:
            gc = guarantees(c).unique
            out = S.and_spans(
                out, compile_pattern(ix, c), a_unique=u, b_unique=gc
            )
            u = u or gc  # the intersection inherits either side's uniqueness
        return out
    if isinstance(tp, TPRepetition):
        if isinstance(tp.clause, TPAnyToken) and tp.clause.mn == tp.clause.mx == 1:
            return S.any_token(ix.doc_lens(), max(tp.mn, 1), tp.mx)
        inner = compile_pattern(ix, tp.clause)
        g = guarantees(tp.clause)
        if (
            g.fixed_len is not None
            and g.fixed_len >= 1
            and g.unique
            and not S._caps(inner)
        ):
            # fixed-length unique CAPTURE-FREE clause (single token OR a
            # fixed phrase): gaps-and-islands kernel with step=fixed_len —
            # unbounded-safe, no self-joins (SpanQueryRepetition ALL-matches
            # semantics). Clauses carrying captures take the general path,
            # which records per-iteration capture lists.
            return S.repetition_token_runs(
                inner, max(tp.mn, 1), tp.mx, step=g.fixed_len
            )
        # fixed-length unique clauses chain uniquely (start determines the
        # chain), so the bounded path can skip its dedupe shuffle
        dedupe = not (g.fixed_len is not None and g.unique)
        return S.repetition(inner, max(tp.mn, 1), tp.mx, dedupe=dedupe)
    if isinstance(tp, TPCapture):
        return S.capture(compile_pattern(ix, tp.clause), tp.name)
    if isinstance(tp, TPPosFilter):
        return S.position_filter(
            compile_pattern(ix, tp.producer),
            compile_pattern(ix, tp.filt),
            tp.op,
            tp.invert,
        )
    if isinstance(tp, TPDefaultValue):
        raise ValueError("`_` (default value) is only valid as a relation side")
    if isinstance(tp, TPRelation):
        return _compile_relation(ix, tp)
    if isinstance(tp, TPAlignment):
        return _compile_alignment(ix, tp)
    if isinstance(tp, TPAndNot):
        return S.and_not(
            compile_pattern(ix, tp.include), compile_pattern(ix, tp.exclude),
            dedupe=not guarantees(tp.include).unique,
        )
    if isinstance(tp, TPRelMatch):
        return _compile_relmatch(ix, tp)
    if isinstance(tp, TPFieldOverride):
        return _compile_parallel(ix, tp.field, tp.clause)
    if isinstance(tp, TPRelCapture):
        return ix.capture_relations(
            compile_pattern(ix, tp.clause), tp.name, rtype=tp.rtype,
            within_capture=tp.within_capture,
        )
    if isinstance(tp, TPFiSeq):
        return _compile_fiseq(ix, tp)
    if isinstance(tp, TPSequence):
        return _compile_sequence(ix, tp.parts)
    if isinstance(tp, TPConstrained):
        cols = sorted(_constraint_layers(tp.constraint)) or ["tokens_fold"]
        hits = compile_pattern(ix, tp.clause)
        j = hits.join(ix.docs.select("doc_id", *cols), "doc_id")
        return j.filter(_constraint_col(tp.constraint)).drop(*cols)
    raise TypeError(f"unknown pattern node {tp!r}")


_LAYER_COL = {"word": "tokens_fold", "lemma": "tokens_lemma", "pos": "tokens_pos"}


def _constraint_layers(e) -> set[str]:
    """Forward-index layer columns a MatchFilter tree dereferences."""
    out: set[str] = set()
    for side in (e.left, e.right):
        if isinstance(side, CExpr):
            out |= _constraint_layers(side)
        elif isinstance(side, CRef) and side.kind in _LAYER_COL:
            out.add(_LAYER_COL[side.kind])
    return out


def _constraint_col(e):
    """MatchFilter tree -> Spark Column (reference: MatchFilter*.java —
    capture annotation deref = token-array indexing over that layer's
    forward index)."""
    from pyspark.sql import functions as F

    def val(v):
        if isinstance(v, CRef):
            if v.kind == "start":
                return F.col(f"{v.name}_start")
            if v.kind == "end":
                return F.col(f"{v.name}_end")
            return F.element_at(_LAYER_COL[v.kind], F.col(f"{v.name}_start") + 1)
        return F.lit(v)

    if e.op == "&":
        return _constraint_col(e.left) & _constraint_col(e.right)
    if e.op == "|":
        return _constraint_col(e.left) | _constraint_col(e.right)
    l, r = val(e.left), val(e.right)
    return {
        "=": l == r, "!=": l != r, "<": l < r, "<=": l <= r,
        ">": l > r, ">=": l >= r,
    }[e.op]


def _fi_pattern(tp: TP) -> tuple[str, str]:
    """(anchored-regex source, tokens column) for forward-index verification
    of a single-token pattern."""
    import re as _re

    from .tokenize import fold_token

    if isinstance(tp, (TPTerm, TPRegex)) and tp.sens:
        raise ValueError(
            "forward-index verification does not support ci/di sensitivity "
            "variants (v1); use the postings path"
        )
    if isinstance(tp, TPTerm):
        val = tp.term if tp.sensitive else fold_token(tp.term)
        pat = _re.escape(val)
    elif isinstance(tp, TPRegex):
        pat = tp.pattern
    else:
        raise ValueError(f"_FI1/_FI2 arguments must be terms or regexes, got {tp!r}")
    if tp.annot == "lemma":
        col = "tokens_lemma"
    elif tp.annot == "pos":
        col = "tokens_pos"
    else:
        col = "tokens" if tp.sensitive else "tokens_fold"
    return pat, col


def _compile_relation(ix: Index, tp: TPRelation) -> DataFrame:
    from pyspark.sql import functions as F

    hits = ix.rel_hits(rtype=tp.rtype or None, mode=tp.mode)
    if not isinstance(tp.source, TPDefaultValue):
        sh = compile_pattern(ix, tp.source).select(
            "doc_id",
            F.col("start").alias("source_start"),
            F.col("end").alias("source_end"),
        )
        hits = hits.join(sh, ["doc_id", "source_start", "source_end"], "left_semi")
    if not isinstance(tp.target, TPDefaultValue):
        th = compile_pattern(ix, tp.target).select(
            "doc_id",
            F.col("start").alias("target_start"),
            F.col("end").alias("target_end"),
        )
        hits = hits.join(th, ["doc_id", "target_start", "target_end"], "left_semi")
    return hits


def _compile_parallel(ix: Index, field: str, tp: TP) -> DataFrame:
    """Compile a pattern against a parallel field's token stream (v1:
    single-token terms/regexes and sequences of them — forward-index scan,
    candidates are restricted by the alignment join)."""
    if isinstance(tp, TPTerm):
        if tp.annot != "word" or tp.sens:
            raise ValueError(
                "parallel-field patterns support only `word` with s/i "
                "sensitivity (v1)"
            )
        return ix.parallel_term_hits(field, term=tp.term, fold=not tp.sensitive)
    if isinstance(tp, TPRegex):
        if tp.annot != "word" or tp.sens:
            raise ValueError(
                "parallel-field patterns support only `word` with s/i "
                "sensitivity (v1)"
            )
        return ix.parallel_term_hits(field, regex=tp.pattern, fold=not tp.sensitive)
    if isinstance(tp, TPSequence):
        out = None
        for p in tp.parts:
            h = _compile_parallel(ix, field, p)
            out = h if out is None else S.sequence(out, h, 0, 0)
        return out
    raise ValueError(
        f"alignment target must be a term/regex/sequence or `_` (v1), got {tp!r}"
    )


def _compile_alignment(ix: Index, tp: TPAlignment) -> DataFrame:
    src = compile_pattern(ix, tp.source)
    tgt = (
        None
        if isinstance(tp.target, TPDefaultValue)
        else _compile_parallel(ix, tp.field, tp.target)
    )
    return ix.alignment_hits(
        src, tp.field, tgt, tp.rtype, capture=tp.capture, optional=tp.optional
    )


def _compile_relmatch(ix: Index, tp: TPRelMatch) -> DataFrame:
    """Unique-relations AND over [parent, child relation source spans]
    (TextPatternRelationMatch.createRelMatchQuery ->
    SpansAndMultiUniqueRelations.java:308-319): each child contributes the
    SOURCE spans of relations of its type whose target matches; all children
    must coincide on one span AND be satisfied by pairwise-DISTINCT
    relations (identity = rtype + both endpoint spans, the reference's
    RelationInfo equality). Expressed as a k-way equi-join on the span keys
    with pairwise rel_id inequality — the join enumerates exactly the
    reference's per-position match combinations; a span survives iff at
    least one all-distinct combination exists. Fan-out is bounded by
    per-span relation multiplicity (small for dependency trees)."""
    from pyspark.sql import functions as F

    joined: DataFrame | None = None
    for i, (rtype, target) in enumerate(tp.children):
        h = ix.rel_hits(rtype=rtype or None, mode=tp.child_mode, with_identity=True)
        if not isinstance(target, TPDefaultValue):
            th = compile_pattern(ix, target).select(
                "doc_id",
                F.col("start").alias("target_start"),
                F.col("end").alias("target_end"),
            )
            h = h.join(th, ["doc_id", "target_start", "target_end"], "left_semi")
        # keep only the span keys + this clause's relation identity: two
        # children would collide on source_*/target_* capture names
        h = h.select("doc_id", "start", "end", F.col("rel_id").alias(f"_rel{i}"))
        joined = h if joined is None else joined.join(
            h, ["doc_id", "start", "end"], "inner"
        )
    k = len(tp.children)
    for i in range(k):
        for j in range(i + 1, k):
            joined = joined.filter(F.col(f"_rel{i}") != F.col(f"_rel{j}"))
    spans = joined.select("doc_id", "start", "end").dropDuplicates(
        ["doc_id", "start", "end"]
    )
    if not isinstance(tp.parent, TPDefaultValue):
        # parent is an ordinary (relation-free) clause: plain coinciding-span
        # AND, its capture columns ride through
        spans = S.and_spans(compile_pattern(ix, tp.parent), spans)
    return spans


def _compile_fiseq(ix: Index, tp: TPFiSeq) -> DataFrame:
    if tp.direction == "fwd":
        anchor = compile_pattern(ix, tp.left)
        pat, col = _fi_pattern(tp.right)
        return S.verify_adjacent(anchor, ix.docs, pat, "right", col)
    anchor = compile_pattern(ix, tp.right)
    pat, col = _fi_pattern(tp.left)
    return S.verify_adjacent(anchor, ix.docs, pat, "left", col)


@dataclass(frozen=True)
class Guarantees:
    """Static span properties of a pattern (the reference's SpanGuarantees
    framework, SpanGuarantees.java:22-67 — hitsAllSameLength,
    hitsHaveUniqueStart/End...). Used by the compiler to SKIP provably
    unnecessary dedupe shuffles and to route single-token repetitions to the
    join-free runs kernel. Conservative: unknown -> (None, False)."""

    fixed_len: int | None  # every hit exactly this long, or None
    unique: bool           # no two hits share (doc, start, end)


def guarantees(tp: TP) -> Guarantees:
    if isinstance(tp, (TPTerm, TPRegex, TPNotTerm)):
        # one token per position; term/regex/complement hits can't repeat
        return Guarantees(1, True)
    if isinstance(tp, TPAnyToken):
        return Guarantees(tp.mn if tp.mn == tp.mx else None, True)
    if isinstance(tp, TPAnd):
        gs = [guarantees(c) for c in tp.clauses]
        fl = gs[0].fixed_len if all(g.fixed_len == gs[0].fixed_len for g in gs) else None
        return Guarantees(fl, any(g.unique for g in gs))
    if isinstance(tp, TPOr):
        gs = [guarantees(c) for c in tp.clauses]
        fl = gs[0].fixed_len if all(g.fixed_len == gs[0].fixed_len for g in gs) else None
        # distinct same-layer terms can't share a position -> unique union
        uniq = all(
            isinstance(c, TPTerm) and c.annot == tp.clauses[0].annot
            and c.sensitive == tp.clauses[0].sensitive
            for c in tp.clauses
        ) and len({c.term for c in tp.clauses if isinstance(c, TPTerm)}) == len(tp.clauses)
        return Guarantees(fl, uniq)
    if isinstance(tp, TPSequence):
        gs = [guarantees(p) for p in tp.parts]
        if all(g.fixed_len is not None for g in gs):
            # fixed-length parts: the start determines the whole chain, so
            # uniqueness of every part implies uniqueness of the sequence
            return Guarantees(sum(g.fixed_len for g in gs), all(g.unique for g in gs))
        # exactly ONE variable-length part among unique parts: its position
        # AND length are pinned by the fixed remainder and the overall span,
        # so (doc, start, end) still determines the whole chain (the
        # hitsHaveUniqueStartEnd reasoning, SpanGuarantees.java:22-67)
        if (
            sum(1 for g in gs if g.fixed_len is None) == 1
            and all(g.unique for g in gs)
            and not any(_matches_empty(par) for par in tp.parts)
        ):
            return Guarantees(None, True)
        return Guarantees(None, False)
    if isinstance(tp, TPCapture):
        return guarantees(tp.clause)
    if isinstance(tp, TPRepetition):
        g = guarantees(tp.clause)
        if tp.mn == tp.mx and g.fixed_len is not None:
            return Guarantees(tp.mn * g.fixed_len, g.unique)
        # variable count over a fixed-length unique clause: (start, end)
        # determines the repetition count and every link position, so the
        # span set stays unique (mn >= 1: zero-length spans excluded)
        if tp.mn >= 1 and g.fixed_len is not None and g.unique:
            return Guarantees(None, True)
        return Guarantees(None, False)
    if isinstance(tp, (TPPosFilter, TPConstrained, TPRelCapture)):
        # filters / 1:1 annotators: the producer's hit set (or a subset of
        # it) keeps its guarantees
        src = tp.producer if isinstance(tp, TPPosFilter) else tp.clause
        return guarantees(src)
    if isinstance(tp, TPAlignment):
        # semi-join against alignment relations: subset of the source hits
        return guarantees(tp.source)
    if isinstance(tp, TPRelMatch):
        # the relmatch compiler dedupes its span set; a non-default parent
        # may carry captures that re-expand spans
        return Guarantees(None, isinstance(tp.parent, TPDefaultValue))
    if isinstance(tp, TPFieldOverride):
        return guarantees(tp.clause)
    return Guarantees(None, False)


def _is_pure_term(p: TP) -> bool:
    return (
        isinstance(p, TPTerm) and not p.sensitive and not p.sens
        and p.annot == "word"
    )


def _matches_empty(tp: TP) -> bool:
    """Can this pattern match the empty sequence? (reference:
    BLSpanQuery.matchesEmptySequence, BLSpanQuery.java:180-193)."""
    if isinstance(tp, TPRepetition):
        return tp.mn == 0 or _matches_empty(tp.clause)
    if isinstance(tp, TPCapture):
        return _matches_empty(tp.clause)
    if isinstance(tp, TPSequence):
        return all(_matches_empty(p) for p in tp.parts)
    if isinstance(tp, TPOr):
        return any(_matches_empty(c) for c in tp.clauses)
    if isinstance(tp, TPAnyToken):
        return tp.mn == 0
    return False


def _no_empty(tp: TP) -> TP:
    """The noEmpty() alternative: same pattern constrained to >= 1 token
    (reference: BLSpanQuery.noEmpty used by makeAlternatives,
    SpanQuerySequence.java:534)."""
    if isinstance(tp, TPRepetition):
        if tp.mn == 0:
            return TPRepetition(_no_empty(tp.clause) if _matches_empty(tp.clause) else tp.clause, 1, tp.mx)
        return TPRepetition(_no_empty(tp.clause), tp.mn, tp.mx) if _matches_empty(tp.clause) else tp
    if isinstance(tp, TPCapture):
        return TPCapture(tp.name, _no_empty(tp.clause))
    if isinstance(tp, TPAnyToken) and tp.mn == 0:
        return TPAnyToken(1, tp.mx)
    return tp


def _compile_sequence(ix: Index, parts: list[TP]) -> DataFrame:
    # EmptyClauseAlts (reference SpanQuerySequence.rewrite:415-452): a
    # clause that can match empty (A?, A{0,n}, N:(A?), nested) splits the
    # sequence into with/without alternatives — positional joins can't
    # express empties. Any-token clauses are excluded: they become gap
    # arithmetic below (CCAnyExpansion), which handles mn=0 natively.
    for i, p in enumerate(parts):
        is_gap = isinstance(p, TPAnyToken) or (
            isinstance(p, TPRepetition) and isinstance(p.clause, TPAnyToken)
        )
        if not is_gap and _matches_empty(p):
            without = parts[:i] + parts[i + 1 :]
            with_ = parts[:i] + [_no_empty(p)] + parts[i + 1 :]
            if not without:
                return _compile_sequence(ix, with_)
            return S.or_spans(
                _compile_sequence(ix, without), _compile_sequence(ix, with_)
            )
    # phrase fast path: all plain folded terms -> posting intersection kernel
    if all(_is_pure_term(p) for p in parts):
        return ix.phrase_hits([p.term for p in parts], fold=True)
    # CCNFA / FiSeq (SURVEY.md §4.3, ClauseCombinerNfa.java:29-66): a leading
    # regex next to a term clause is verified against the forward index
    # (token arrays) anchored at the term's hits, when the term is the
    # cheaper side — never join a huge expanded-term hit set.
    if (
        len(parts) >= 2
        and isinstance(parts[0], TPRegex)
        and not parts[0].sens
        and parts[0].annot == "word"
        and _is_pure_term(parts[1])
    ):
        nv, tdf = ix.regex_stats(parts[0].pattern, not parts[0].sensitive)
        if tdf > ix.term_df(parts[1].term):
            rest = _compile_sequence(ix, parts[1:])
            col = "tokens" if parts[0].sensitive else "tokens_fold"
            return S.verify_adjacent(rest, ix.docs, parts[0].pattern, "left", col)
    # CCAnyExpansion: absorb []{m,n} neighbors into expansions
    out: DataFrame | None = None
    pending_gap: tuple[int, int] | None = None
    doc_lens = ix.doc_lens()
    prev_part: TP | None = None
    for p in parts:
        if isinstance(p, TPAnyToken):
            gap = (p.mn, p.mx)
        elif isinstance(p, TPRepetition) and isinstance(p.clause, TPAnyToken):
            gmx = None if (p.mx is None or p.clause.mx is None) else p.mx * p.clause.mx
            gap = (p.mn * p.clause.mn, gmx)
        else:
            gap = None
        if gap is not None:
            # consecutive any-token parts accumulate: '"a" [] [] "b"' is a
            # {2,2} gap, not {1,1} (bounds add; None = unbounded absorbs)
            if pending_gap is not None:
                gmx = (
                    None if (pending_gap[1] is None or gap[1] is None)
                    else pending_gap[1] + gap[1]
                )
                pending_gap = (pending_gap[0] + gap[0], gmx)
            else:
                pending_gap = gap
            continue
        # FiSeq right-extension: regex directly after a term-anchored prefix
        if (
            out is not None
            and pending_gap is None
            and isinstance(p, TPRegex)
            and not p.sens
            and p.annot == "word"
            and _is_pure_term(prev_part)
        ):
            nv, tdf = ix.regex_stats(p.pattern, not p.sensitive)
            if tdf > ix.term_df(prev_part.term):
                col = "tokens" if p.sensitive else "tokens_fold"
                out = S.verify_adjacent(out, ix.docs, p.pattern, "right", col)
                prev_part = p
                continue
        h = compile_pattern(ix, p)
        if out is None:
            if pending_gap is not None:
                h = S.expand(h, doc_lens, "left", pending_gap[0], pending_gap[1])
                pending_gap = None
            out = h
        else:
            if pending_gap is not None:
                out = S.sequence(out, h, gap_min=pending_gap[0], gap_max=pending_gap[1])
                pending_gap = None
            else:
                out = S.sequence(out, h)
        prev_part = p
    if out is None:
        # sequence of only any-tokens: total n-gram range
        mn = sum(p.mn if isinstance(p, TPAnyToken) else p.mn * p.clause.mn for p in parts)
        mxs = [p.mx if isinstance(p, TPAnyToken) else
               (None if (p.mx is None or p.clause.mx is None) else p.mx * p.clause.mx)
               for p in parts]
        mx = None if any(m is None for m in mxs) else sum(mxs)
        return S.any_token(doc_lens, mn, mx)
    if pending_gap is not None:  # trailing []: expand right
        out = S.expand(out, doc_lens, "right", pending_gap[0], pending_gap[1])
    return out


def find(ix: Index, query: str) -> DataFrame:
    """Parse and execute a BCQL query -> hits (doc_id, start, end [,captures])."""
    return compile_pattern(ix, parse(query))


def find_ranked(ix: Index, query: str, k: int = 10) -> DataFrame:
    """Ranked retrieval over ANY BCQL pattern: the pattern's hits score as
    one BM25 unit (Index.topk_spans) -> (rank, doc_id, url, score). The
    HTTP analog is docs?patt=...&sort=bm25."""
    return ix.topk_spans(find(ix, query), k)


# ------------------------------------------------------------ serialization --
# mirrors TextPatternSerializerJson.java / TextPatternSerializerCql.java:
# patterns round-trip through plain dicts (JSON-able) and back to CQL text.

_NODE_TYPES = {
    "term": TPTerm, "regex": TPRegex, "anytoken": TPAnyToken, "not": TPNotTerm,
    "sequence": TPSequence, "or": TPOr, "and": TPAnd, "repeat": TPRepetition,
    "capture": TPCapture, "tags": TPTags, "posfilter": TPPosFilter,
}


def to_dict(tp: TP) -> dict:
    if isinstance(tp, TPTerm):
        return {
            "type": "term", "term": tp.term, "sensitive": tp.sensitive,
            "annot": tp.annot, **({"sens": tp.sens} if tp.sens else {}),
        }
    if isinstance(tp, TPRegex):
        return {
            "type": "regex", "pattern": tp.pattern, "sensitive": tp.sensitive,
            "annot": tp.annot, **({"sens": tp.sens} if tp.sens else {}),
        }
    if isinstance(tp, TPAnyToken):
        return {"type": "anytoken", "min": tp.mn, "max": tp.mx}
    if isinstance(tp, TPNotTerm):
        return {"type": "not", "clause": to_dict(tp.inner)}
    if isinstance(tp, TPSequence):
        return {"type": "sequence", "clauses": [to_dict(p) for p in tp.parts]}
    if isinstance(tp, TPOr):
        return {"type": "or", "clauses": [to_dict(p) for p in tp.clauses]}
    if isinstance(tp, TPAnd):
        return {"type": "and", "clauses": [to_dict(p) for p in tp.clauses]}
    if isinstance(tp, TPRepetition):
        return {"type": "repeat", "clause": to_dict(tp.clause), "min": tp.mn, "max": tp.mx}
    if isinstance(tp, TPCapture):
        return {"type": "capture", "name": tp.name, "clause": to_dict(tp.clause)}
    if isinstance(tp, TPTags):
        d = {"type": "tags", "name": tp.name}
        if tp.attrs:
            d["attrs"] = {k: v for k, v in tp.attrs}
        if tp.adjust != "full":
            d["adjust"] = tp.adjust
        return d
    if isinstance(tp, TPPosFilter):
        return {
            "type": "posfilter", "op": tp.op, "invert": tp.invert,
            "producer": to_dict(tp.producer), "filter": to_dict(tp.filt),
        }
    if isinstance(tp, TPFiSeq):
        return {
            "type": "fiseq", "direction": tp.direction,
            "left": to_dict(tp.left), "right": to_dict(tp.right),
        }
    if isinstance(tp, TPDefaultValue):
        return {"type": "default"}
    if isinstance(tp, TPRelation):
        return {
            "type": "relation", "rtype": tp.rtype, "mode": tp.mode,
            "source": to_dict(tp.source), "target": to_dict(tp.target),
        }
    if isinstance(tp, TPAlignment):
        d = {
            "type": "alignment", "field": tp.field,
            "source": to_dict(tp.source), "target": to_dict(tp.target),
        }
        if tp.rtype:
            d["rtype"] = tp.rtype
        if tp.capture:
            d["capture"] = tp.capture
        if tp.optional:
            d["optional"] = True
        return d
    if isinstance(tp, TPConstrained):
        return {
            "type": "constrained", "clause": to_dict(tp.clause),
            "constraint": _cexpr_dict(tp.constraint),
        }
    if isinstance(tp, TPAndNot):
        return {
            "type": "andnot",
            "include": to_dict(tp.include), "exclude": to_dict(tp.exclude),
        }
    if isinstance(tp, TPRelMatch):
        return {
            "type": "relmatch", "parent": to_dict(tp.parent),
            "children": [
                {"rtype": rt, "target": to_dict(t)} for rt, t in tp.children
            ],
            **({"child_mode": tp.child_mode} if tp.child_mode != "source" else {}),
        }
    if isinstance(tp, TPFieldOverride):
        return {"type": "fieldoverride", "field": tp.field, "clause": to_dict(tp.clause)}
    if isinstance(tp, TPRelCapture):
        d = {"type": "relcapture", "clause": to_dict(tp.clause), "name": tp.name}
        if tp.rtype:
            d["rtype"] = tp.rtype
        if tp.within_capture:
            d["within_capture"] = tp.within_capture
        return d
    raise TypeError(repr(tp))


def _cexpr_dict(c) -> dict:
    if isinstance(c, CRef):
        return {"type": "ref", "name": c.name, "kind": c.kind}
    if isinstance(c, CExpr):
        return {
            "type": "expr", "op": c.op,
            "left": _cexpr_dict(c.left), "right": _cexpr_dict(c.right),
        }
    return {"type": "lit", "value": c}  # str or int literal


def _cexpr_from_dict(d):
    if d["type"] == "ref":
        return CRef(d["name"], d.get("kind", "word"))
    if d["type"] == "expr":
        return CExpr(d["op"], _cexpr_from_dict(d["left"]), _cexpr_from_dict(d["right"]))
    return d["value"]


def from_dict(d: dict) -> TP:
    t = d["type"]
    if t == "term":
        return TPTerm(
            d["term"], d.get("sensitive", False), d.get("annot", "word"),
            sens=d.get("sens", ""),
        )
    if t == "regex":
        return TPRegex(
            d["pattern"], d.get("sensitive", False), d.get("annot", "word"),
            sens=d.get("sens", ""),
        )
    if t == "anytoken":
        return TPAnyToken(d["min"], d["max"])
    if t == "not":
        return TPNotTerm(from_dict(d["clause"]))
    if t == "sequence":
        return TPSequence([from_dict(c) for c in d["clauses"]])
    if t == "or":
        return TPOr([from_dict(c) for c in d["clauses"]])
    if t == "and":
        return TPAnd([from_dict(c) for c in d["clauses"]])
    if t == "repeat":
        return TPRepetition(from_dict(d["clause"]), d["min"], d["max"])
    if t == "capture":
        return TPCapture(d["name"], from_dict(d["clause"]))
    if t == "tags":
        return TPTags(
            d["name"],
            tuple(sorted(d.get("attrs", {}).items())),
            d.get("adjust", "full"),
        )
    if t == "posfilter":
        return TPPosFilter(
            from_dict(d["producer"]), from_dict(d["filter"]), d["op"], d.get("invert", False)
        )
    if t == "fiseq":
        return TPFiSeq(from_dict(d["left"]), from_dict(d["right"]), d["direction"])
    if t == "default":
        return TPDefaultValue()
    if t == "relation":
        return TPRelation(
            from_dict(d["source"]), d["rtype"], from_dict(d["target"]), d.get("mode", "full")
        )
    if t == "alignment":
        return TPAlignment(
            from_dict(d["source"]), d["field"], from_dict(d["target"]),
            d.get("rtype"), d.get("capture"), d.get("optional", False),
        )
    if t == "constrained":
        return TPConstrained(from_dict(d["clause"]), _cexpr_from_dict(d["constraint"]))
    if t == "andnot":
        return TPAndNot(from_dict(d["include"]), from_dict(d["exclude"]))
    if t == "relmatch":
        return TPRelMatch(
            from_dict(d["parent"]),
            tuple((c["rtype"], from_dict(c["target"])) for c in d["children"]),
            child_mode=d.get("child_mode", "source"),
        )
    if t == "fieldoverride":
        return TPFieldOverride(d["field"], from_dict(d["clause"]))
    if t == "relcapture":
        return TPRelCapture(
            from_dict(d["clause"]), d.get("name", "captured_rels"),
            d.get("rtype"), d.get("within_capture"),
        )
    raise ValueError(t)


def _q(s: str) -> str:
    return '"' + s.replace("\\", "\\\\").replace('"', '\\"') + '"'


def _sens_flags(tp) -> str:
    """Serialize the sensitivity variant back to %-flags (lossless through
    _flags_to_sens): s -> %cd, di -> %c, ci -> %d, i -> none."""
    if tp.sensitive:
        return "%cd"
    return {"di": "%c", "ci": "%d"}.get(tp.sens, "")


def to_cql(tp: TP) -> str:
    """Pattern -> CQL text (round-trips through parse; mirrors
    TextPatternSerializerCql.java)."""
    if isinstance(tp, TPTerm):
        fl = _sens_flags(tp)
        if tp.annot != "word":
            return f"[{tp.annot}={_q(tp.term)}{fl}]"
        return _q(tp.term) + fl
    if isinstance(tp, TPRegex):
        fl = _sens_flags(tp)
        if tp.annot != "word":
            return f"[{tp.annot}={_q(tp.pattern)}{fl}]"
        return _q(tp.pattern) + fl
    if isinstance(tp, TPAnyToken):
        if tp.mn == tp.mx == 1:
            return "[]"
        if tp.mx is None:  # unbounded: parse normalizes to []{n,} form
            return f"[]{{{tp.mn},}}"
        return f"[]{{{tp.mn},{tp.mx}}}"
    if isinstance(tp, TPNotTerm):
        inner = tp.inner
        if isinstance(inner, (TPTerm, TPRegex)):
            v = inner.term if isinstance(inner, TPTerm) else inner.pattern
            return f"[word!={_q(v)}]"
        return f"!{to_cql(inner)}"
    if isinstance(tp, TPSequence):
        return " ".join(_wrap(p) for p in tp.parts)
    if isinstance(tp, TPOr):
        return " | ".join(_wrap(p) for p in tp.clauses)
    if isinstance(tp, TPAnd):
        return " & ".join(_wrap(p) for p in tp.clauses)
    if isinstance(tp, TPRepetition):
        c = _wrap(tp.clause, quantified=True)
        if tp.mx is None:
            if tp.mn == 0:
                return f"{c}*"
            if tp.mn == 1:
                return f"{c}+"
            return f"{c}{{{tp.mn},}}"
        return f"{c}{{{tp.mn},{tp.mx}}}"
    if isinstance(tp, TPCapture):
        return f"{tp.name}:{_wrap(tp.clause)}"
    if isinstance(tp, TPTags):
        a = "".join(f' {k}="{v}"' for k, v in tp.attrs)
        if tp.adjust == "leading":
            return f"<{tp.name}{a}>"
        if tp.adjust == "trailing":
            return f"</{tp.name}>"
        return f"<{tp.name}{a}/>"
    if isinstance(tp, TPPosFilter):
        return f"{_wrap(tp.producer)} {tp.op} {_wrap(tp.filt)}"
    if isinstance(tp, TPFiSeq):
        fn = "_FI1" if tp.direction == "fwd" else "_FI2"
        return f"{fn}({to_cql(tp.left)}, {to_cql(tp.right)})"
    if isinstance(tp, TPDefaultValue):
        return "_"
    if isinstance(tp, TPRelation):
        base = f"{_wrap(tp.source)} -{tp.rtype}-> {_wrap(tp.target)}"
        if tp.mode != "full":
            return f'rspan({base}, "{tp.mode}")'
        return base
    if isinstance(tp, TPAlignment):
        lbl = f"{tp.capture}:" if tp.capture else ""
        opt = "?" if tp.optional else ""
        return (
            f"{_wrap(tp.source)} {lbl}={tp.rtype or ''}=>{tp.field}{opt}"
            f" {_wrap(tp.target)}"
        )
    if isinstance(tp, TPConstrained):
        return f"{to_cql(tp.clause)} :: {_cexpr_str(tp.constraint)}"
    if isinstance(tp, TPAndNot):
        return f"_andnot({to_cql(tp.include)}, {to_cql(tp.exclude)})"
    if isinstance(tp, TPRelMatch):
        if tp.child_mode != "source":
            # rmatch()-built: clauses contribute their own (full) spans;
            # re-parsing `rmatch(_ -x-> t, ...)` reconstructs child_mode
            args = ", ".join(f"_ -{rt}-> {_wrap(t)}" for rt, t in tp.children)
            return f"rmatch({args})"
        kids = " ; ".join(f"-{rt}-> {_wrap(t)}" for rt, t in tp.children)
        return f"{_wrap(tp.parent)} {kids}"
    if isinstance(tp, TPFieldOverride):
        return f"@field={tp.field} {to_cql(tp.clause)}"
    if isinstance(tp, TPRelCapture):
        if tp.within_capture:
            args = [to_cql(tp.clause), f'"{tp.within_capture}"', f'"{tp.name}"']
            if tp.rtype:
                args.append(f'"{tp.rtype}"')
            return f"rcapture2({', '.join(args)})"
        args = [to_cql(tp.clause), f'"{tp.name}"']
        if tp.rtype:
            args.append(f'"{tp.rtype}"')
        return f"rcapture({', '.join(args)})"
    raise TypeError(repr(tp))


def _cexpr_str(c) -> str:
    if isinstance(c, CRef):
        if c.kind in ("start", "end"):
            return f"{c.kind}({c.name})"
        return f"{c.name}.{c.kind}"
    if isinstance(c, CExpr):
        l, r = _cexpr_str(c.left), _cexpr_str(c.right)
        if c.op in ("&", "|"):
            return f"({l} {c.op} {r})"
        return f"{l} {c.op} {r}"
    if isinstance(c, str):
        return f'"{c}"'
    return str(c)  # int literal


def _wrap(tp: TP, quantified: bool = False) -> str:
    """Parenthesize where the grammar demands it. `quantified=True` when a
    repetition quantifier follows: a clause that already ENDS in a
    quantifier (a repetition, or []{n,m}) must be parenthesized or the
    serialization `[]{1,2}*` fails to re-parse (no stacked quantifiers in
    the grammar, cql.jj repetitionAmount)."""
    s = to_cql(tp)
    if isinstance(tp, (TPSequence, TPOr, TPAnd, TPPosFilter, TPRelation, TPAlignment)):
        return f"({s})"
    if quantified and not (
        isinstance(tp, (TPTerm, TPRegex, TPTags, TPNotTerm))
        or (isinstance(tp, TPAnyToken) and tp.mn == tp.mx == 1)
    ):
        return f"({s})"
    return s
