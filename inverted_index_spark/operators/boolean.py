"""Composable boolean query algebra over the index — the Lucene
BooleanQuery surface, assembled from the engine's verified primitives:

    Term("spark")                       R6/R10 point lookup
    Prefix("sp")                        FST range-seek analog
    Fuzzy("tble")                       edit-distance-1 neighborhood
    Phrase(["table", "hash"])           positional adjacency
    And(q1, q2, Not(q3))                intersection with MUST_NOT
    Or(q1, q2)                          union

``evaluate`` compiles a tree to ONE DataFrame plan of semi/anti joins
and union-distincts over doc_id streams — no driver-side set math, no
collect; Catalyst sees the whole composition and reuses the shared
multi-segment scan across leaves. Every leaf is its own term-pruned
read, so the plan's input size is the touched postings, not the index.

Not() is only meaningful inside And (Lucene MUST_NOT): a top-level or
Or-nested negation would mean "every doc in the corpus except…", which
an index cannot answer without a corpus scan — evaluate raises.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from inverted_index_spark.operators import query as _q
from inverted_index_spark.sources.store import SegmentStore


@dataclass(frozen=True)
class Term:
    term: str


@dataclass(frozen=True)
class Prefix:
    prefix: str


@dataclass(frozen=True)
class Fuzzy:
    term: str
    max_edits: int = 1


@dataclass(frozen=True)
class Wildcard:
    """Lucene WildcardQuery: ``?`` = one character, ``*`` = any run
    (``te?t``, ``sp*k``). A PURE trailing-``*`` word parses as Prefix
    instead (the FST range-seek analog is cheaper than the dictionary
    regex scan this compiles to). Constant-score like Prefix/Fuzzy."""

    pattern: str


@dataclass(frozen=True)
class Phrase:
    tokens: tuple
    slop: int = 0

    def __init__(self, tokens, slop: int = 0):
        object.__setattr__(self, "tokens", tuple(tokens))
        object.__setattr__(self, "slop", int(slop))


@dataclass(frozen=True)
class And:
    clauses: tuple = field(default_factory=tuple)

    def __init__(self, *clauses):
        object.__setattr__(self, "clauses", tuple(clauses))


@dataclass(frozen=True)
class Or:
    """Union of clauses. ``minimum_should_match`` (Lucene msm) demands
    a doc satisfy at least m of the clauses instead of any one —
    ``Or(a, b, c, minimum_should_match=2)``. m=1 is the plain union
    and keeps the union-distinct plan; m>1 compiles to a tagged union
    + one groupBy(doc_id) HAVING count(distinct clause) >= m."""

    clauses: tuple = field(default_factory=tuple)
    minimum_should_match: int = 1

    def __init__(self, *clauses, minimum_should_match: int = 1):
        object.__setattr__(self, "clauses", tuple(clauses))
        object.__setattr__(
            self, "minimum_should_match", int(minimum_should_match)
        )


@dataclass(frozen=True)
class Not:
    clause: object


@dataclass(frozen=True)
class Boost:
    """Query-time boost (Lucene ``term^2``, ``"a b"^0.5``): transparent
    for MATCHING (the wrapped clause filters unchanged) but multiplies
    the wrapped subtree's BM25 contributions when ranking. Nested
    boosts multiply."""

    clause: object
    weight: float = 1.0


@dataclass(frozen=True)
class Field:
    """Fielded clause (Lucene ``field:term``): evaluate the wrapped
    subtree against the FIELD's index instead of the default one.
    Fields are separate (small) stores built over the metadata column —
    ``lang:en`` reads the lang index's postings, it never scans
    documents. Requires ``field_stores`` at evaluate() time.

    ``raw`` keeps the original colon word (``error:timeout``) so that
    when NO fields are registered at all, evaluate can fall back to the
    pre-fielded plain-text reading instead of erroring; it never
    participates in node equality."""

    name: str
    clause: object
    raw: str | None = field(default=None, compare=False)


def _lex(s: str) -> list:
    """Query string → tokens: '(' ')' '-' ('"', text) ('w', word).

    A '-' is the MUST_NOT marker only at the start of a clause (after
    whitespace/'('); inside a word (foo-bar) it stays part of the word
    and the pinned tokenizer splits it later."""
    out: list = []
    i, n = 0, len(s)
    while i < n:
        c = s[i]
        if c.isspace():
            i += 1
        elif c in "()":
            out.append(c)
            i += 1
        elif c == '"':
            j = s.find('"', i + 1)
            if j < 0:
                raise ValueError(f"unterminated phrase quote in query: {s!r}")
            text = s[i + 1 : j]
            i = j + 1
            slop = 0
            if i < n and s[i] == "~":  # Lucene proximity: "a b"~2
                k = i + 1
                while k < n and s[k].isdigit():
                    k += 1
                slop = int(s[i + 1 : k]) if k > i + 1 else 0
                i = k
            boost = None
            if i < n and s[i] == "^":  # Lucene boost: "a b"^2, "a b"~1^0.5
                k = i + 1
                while k < n and (s[k].isdigit() or s[k] == "."):
                    k += 1
                if k > i + 1:
                    boost = float(s[i + 1 : k])
                    i = k
            out.append(('"', text, slop, boost))
        elif c == "-" and i + 1 < n and not s[i + 1].isspace() and s[i + 1] != ")":
            out.append("-")
            i += 1
        else:
            j = i
            while j < n and not s[j].isspace() and s[j] not in '()"':
                j += 1
            out.append(("w", s[i:j]))
            i = j
    return out


def _has_inner_wildcard(w: str) -> bool:
    """True when a '*'/'?' appears anywhere but as the single trailing
    '*' (which is the cheaper Prefix form)."""
    body = w[:-1] if w.endswith("*") else w
    return "*" in body or "?" in body


def _word_node(w: str):
    """One bare word → leaf node, normalized through the PINNED
    tokenizer (tokenize_text) so query-side tokens can actually match
    index-side terms: `Don't` → and(don, t), `FOO-BAR` → and(foo, bar),
    >64-char tokens dropped — exactly what the build did to the text.
    Returns None when the word normalizes to nothing (punctuation-only)."""
    import re

    from inverted_index_spark.functions.tokenizer import tokenize_text

    stem, suffix, digits = w, None, None
    if w.endswith("*") and len(w) > 1 and not _has_inner_wildcard(w):
        stem, suffix = w[:-1], "*"
    elif _has_inner_wildcard(w):
        # (any other wildcard word — a lone trailing '*' with len>1 is
        # always the Prefix branch above, so this covers everything
        # with a '?' or a non-trailing '*')
        # Lucene WildcardQuery: NOT analyzed (a '?'/'*' would be
        # stripped by the tokenizer) — lowercase only, and validate
        # the literal chars against the pinned term alphabet
        pat = w.lower()
        lit = re.sub(r"[*?]", "", pat)
        if lit and not re.fullmatch(r"[\w]+", lit, re.UNICODE):
            raise ValueError(
                f"wildcard pattern {pat!r} mixes non-term characters; "
                "only letters/digits/_ plus '*'/'?' are allowed"
            )
        return Wildcard(pat)
    else:
        m = re.match(r"^(.+)~([0-9]+)?$", w)
        if m:
            stem, suffix, digits = m.group(1), "~", m.group(2)
    if suffix:
        toks = tokenize_text(stem)
        if len(toks) != 1:
            raise ValueError(
                f"{'prefix' if suffix == '*' else 'fuzzy'} stem {stem!r} must "
                f"normalize to exactly one token (got {toks})"
            )
        if suffix == "*":
            return Prefix(toks[0])
        return Fuzzy(toks[0], int(digits) if digits else 1)
    toks = tokenize_text(w)
    if not toks:
        return None
    if len(toks) == 1:
        return Term(toks[0])
    return And(*[Term(t) for t in toks])


def parse_query(s: str):
    """Lucene-classic query-string syntax → query tree:

        spark merge          AND of clauses (google-style default)
        a OR b               union (uppercase OR, like Lucene)
        a AND b              explicit AND (same as adjacency)
        (a OR b) -c          grouping with parentheses
        -window, NOT window  MUST_NOT (Not inside the enclosing And)
        "table hash"         exact phrase
        "table hash"~2       sloppy phrase (each word may lag <= 2 slots)
        riv*                 prefix
        tble~  tble~2        fuzzy (edit distance 1 / 2)

    Precedence: OR < AND < NOT (so `a OR b c` is `Or(a, And(b, c))`).
    Every word/phrase is normalized through the PINNED tokenizer
    (tokenize_text), so `Don't` matches the indexed terms `don t`;
    words that normalize to nothing are dropped. Same-type nests
    flatten (`a (b c)` → `And(a, b, c)`), which also lets a negation
    group fold into its enclosing And. An empty or all-negative query
    raises (unanswerable from an index).
    """
    toks = _lex(s)
    pos = [0]

    def peek():
        return toks[pos[0]] if pos[0] < len(toks) else None

    def take():
        t = toks[pos[0]]
        pos[0] += 1
        return t

    def is_word(t, w):
        return isinstance(t, tuple) and t[0] == "w" and t[1] == w

    def parse_or():
        nodes = [parse_and()]
        while is_word(peek(), "OR"):
            take()
            t = peek()
            if t is None or t == ")" or is_word(t, "OR"):
                raise ValueError(f"dangling OR in query: {s!r}")
            nodes.append(parse_and())
        nodes = [n for n in nodes if n is not None]
        if not nodes:
            return None
        flat = []
        for n in nodes:
            flat.extend(n.clauses if isinstance(n, Or) else [n])
        return flat[0] if len(flat) == 1 else Or(*flat)

    def parse_and():
        nodes = []
        while True:
            t = peek()
            if t is None or t == ")" or is_word(t, "OR"):
                break
            if is_word(t, "AND"):
                take()
                nxt = peek()
                if (
                    not nodes
                    or nxt is None
                    or nxt == ")"
                    or is_word(nxt, "OR")
                    or is_word(nxt, "AND")
                ):
                    # mirror the dangling-OR strictness: 'a AND',
                    # 'AND a', 'a AND AND b' are malformed
                    raise ValueError(f"dangling AND in query: {s!r}")
                continue
            nodes.append(parse_unary())
        nodes = [n for n in nodes if n is not None]
        if not nodes:
            return None
        flat = []
        for n in nodes:
            flat.extend(n.clauses if isinstance(n, And) else [n])
        return flat[0] if len(flat) == 1 else And(*flat)

    def parse_unary():
        t = peek()
        if t == "-" or is_word(t, "NOT"):
            take()
            node = parse_primary()
            return None if node is None else Not(node)
        return parse_primary()

    def parse_primary():
        from inverted_index_spark.functions.tokenizer import tokenize_text

        t = peek()
        if t is None or t == ")":
            raise ValueError(f"expected a term or group in query: {s!r}")
        take()
        if t == "(":
            node = parse_or()
            if peek() != ")":
                raise ValueError(f"unbalanced parentheses in query: {s!r}")
            take()
            if node is None:
                raise ValueError(f"empty group in query: {s!r}")
            return node
        if t == "-":
            raise ValueError(f"expected a term after '-' in query: {s!r}")
        if t[0] == '"':
            _, text, slop, boost = t
            ptoks = tokenize_text(text)
            if not ptoks:
                return None
            # slop on a single-token "phrase" is meaningless — it's a term
            node = Term(ptoks[0]) if len(ptoks) == 1 else Phrase(ptoks, slop)
            return Boost(node, boost) if boost is not None else node
        word = orig = t[1]
        import re

        boost = None
        mb = re.match(r"^(.+)\^(\d+(?:\.\d+)?)$", word)
        if mb:
            word, boost = mb.group(1), float(mb.group(2))

        def _maybe_boost(node):
            if node is None or boost is None:
                return node
            return Boost(node, boost)

        m = re.match(r"^([A-Za-z_][A-Za-z0-9_]*):(.*)$", word)
        if m:
            fname, rest = m.group(1), m.group(2)
            if rest:
                node = _word_node(rest)
                # raw keeps the ORIGINAL word (boost suffix included) so
                # the no-fields-registered fallback reproduces the
                # pre-boost-grammar tokenization of the whole word
                return (
                    None
                    if node is None
                    else _maybe_boost(Field(fname, node, raw=orig))
                )
            if peek() is not None and not isinstance(peek(), str) and peek()[0] == '"':
                node = parse_primary()  # field:"quoted phrase"
            else:
                raise ValueError(f"field {fname!r} has no value in query: {s!r}")
            return None if node is None else _maybe_boost(Field(fname, node))
        return _maybe_boost(_word_node(word))

    node = parse_or()
    if peek() is not None:
        raise ValueError(f"unbalanced parentheses in query: {s!r}")
    if node is None:
        raise ValueError("empty query")
    if isinstance(node, Not) or (
        isinstance(node, And) and all(isinstance(c, Not) for c in node.clauses)
    ):
        raise ValueError("all-negative query is unanswerable from an index")
    return node


def evaluate(
    spark: SparkSession,
    store: SegmentStore,
    q,
    min_doc: int | None = None,
    max_doc: int | None = None,
    searcher=None,
    field_stores: dict[str, SegmentStore] | None = None,
) -> DataFrame:
    """Evaluate a query tree → sorted unique (doc_id) DataFrame.

    With ``searcher`` (an open operators.search.Searcher), Term and
    Phrase leaves read its warm postings/positions caches instead of
    fresh store scans — the open-once query-many path
    (Searcher.search wraps this). ``field_stores`` maps field names to
    their per-field indexes for Field clauses (``lang:en``)."""
    return _matches(
        spark, store, q, min_doc, max_doc, searcher, field_stores
    ).orderBy("doc_id")


def _matches(
    spark, store, q, lo=None, hi=None, searcher=None, field_stores=None
) -> DataFrame:
    """Unsorted distinct match set — what compositions (ranking,
    faceting) consume; the user-facing evaluate() adds the sort, so
    downstream joins/aggregations never pay for an ordering they
    immediately destroy."""
    return _eval(spark, store, q, lo, hi, searcher, field_stores).distinct()


def _eval(spark, store, q, lo, hi, searcher=None, field_stores=None) -> DataFrame:
    if isinstance(q, Field):
        if not field_stores or q.name not in field_stores:
            if not field_stores and q.raw is not None:
                # No fields registered at all — this is a plain-text
                # search, so a colon word ('error:timeout', 'http://x')
                # keeps its pre-fielded-grammar reading: tokenize the
                # whole raw word and evaluate that.
                try:
                    node = _word_node(q.raw)
                except ValueError:
                    node = None
                if node is not None:
                    return _eval(spark, store, node, lo, hi, searcher, field_stores)
            clause = q.raw or f"{q.name}:…"
            known = sorted(field_stores or [])
            raise ValueError(
                f"unknown field {q.name!r} in clause {clause!r} "
                f"(field_stores has {known}); build one per field with "
                "build_field_indexes and pass it via field_stores"
            )
        # the subtree runs against the FIELD's index; with an open
        # Searcher, ride its warm per-field sub-searcher (round-5)
        # instead of a fresh store scan per query
        sub = (
            searcher.field_searcher(q.name, field_stores[q.name])
            if searcher is not None
            else None
        )
        return _eval(spark, field_stores[q.name], q.clause, lo, hi, sub, field_stores)
    if isinstance(q, Term):
        if searcher is not None:
            return searcher.read_values([q.term], lo, hi)
        return _q.read_values(spark, store, [q.term], lo, hi)
    if isinstance(q, Prefix):
        return _q.read_values_prefix(spark, store, q.prefix, lo, hi)
    if isinstance(q, Fuzzy):
        return _q.fuzzy_values(spark, store, q.term, q.max_edits, lo, hi)
    if isinstance(q, Wildcard):
        import re as _re

        # '?' → any one term char, '*' → any run; everything else
        # matched literally (the pattern alphabet was validated at
        # parse time). Rides the two-phase regex rewrite: dictionary
        # scan resolves terms, IN-pushed posting read fetches.
        rx = "".join(
            ".*" if ch == "*" else "." if ch == "?" else _re.escape(ch)
            for ch in q.pattern
        )
        return _q.read_values_regex(spark, store, rx, lo, hi)
    if isinstance(q, Phrase):
        if searcher is not None:
            return searcher.phrase(list(q.tokens), lo, hi, slop=q.slop).select(
                "doc_id"
            )
        from inverted_index_spark.operators.positions import phrase_match

        return phrase_match(
            spark, store, list(q.tokens), lo, hi, slop=q.slop
        ).select("doc_id")
    if isinstance(q, Boost):
        # boosts rank, they never filter
        return _eval(spark, store, q.clause, lo, hi, searcher, field_stores)
    if isinstance(q, Or):
        if not q.clauses:
            return spark.createDataFrame([], "doc_id long")
        if any(isinstance(c, Not) for c in q.clauses):
            raise ValueError("Not() inside Or is unanswerable from an index")
        msm = getattr(q, "minimum_should_match", 1)
        if msm > 1:
            if msm > len(q.clauses):
                return spark.createDataFrame([], "doc_id long")
            # tagged union → one groupBy(doc_id): the shuffle carries
            # (doc_id, clause#) pairs of the TOUCHED postings only;
            # countDistinct because a clause's stream may repeat a doc
            # (multi-segment overlap) — never double-count a clause.
            tagged = [
                _eval(spark, store, c, lo, hi, searcher, field_stores)
                .select("doc_id", F.lit(i).alias("_clause"))
                for i, c in enumerate(q.clauses)
            ]
            out = tagged[0]
            for t in tagged[1:]:
                out = out.unionByName(t)
            return (
                out.groupBy("doc_id")
                .agg(F.countDistinct("_clause").alias("_n"))
                .where(F.col("_n") >= int(msm))
                .select("doc_id")
            )
        out = _eval(spark, store, q.clauses[0], lo, hi, searcher, field_stores)
        for c in q.clauses[1:]:
            out = out.unionByName(_eval(spark, store, c, lo, hi, searcher, field_stores))
        return out
    if isinstance(q, And):
        pos = [c for c in q.clauses if not isinstance(c, Not)]
        neg = [c.clause for c in q.clauses if isinstance(c, Not)]
        if not pos:
            raise ValueError("And() needs at least one positive clause")
        out = _eval(spark, store, pos[0], lo, hi, searcher, field_stores)
        for c in pos[1:]:
            out = out.join(
                _eval(spark, store, c, lo, hi, searcher, field_stores),
                "doc_id", "leftsemi",
            )
        for c in neg:
            out = out.join(
                _eval(spark, store, c, lo, hi, searcher, field_stores),
                "doc_id", "left_anti",
            )
        return out
    if isinstance(q, Not):
        raise ValueError("top-level Not() is unanswerable from an index")
    raise TypeError(f"not a query node: {q!r}")


def _scoring_terms(q) -> list[str]:
    """Positive scoring terms of a tree: Term leaves and Phrase tokens
    outside any Not. Prefix/Fuzzy leaves filter but contribute no
    scoring terms — Lucene's constant-score rewrite for multi-term
    queries, which keeps idf well-defined (an expanded wildcard's
    hundreds of rare terms would otherwise dominate the score)."""
    if isinstance(q, Term):
        return [q.term]
    if isinstance(q, Phrase):
        return list(q.tokens)
    if isinstance(q, Boost):
        return _scoring_terms(q.clause)
    if isinstance(q, Or):
        return [t for c in q.clauses for t in _scoring_terms(c)]
    if isinstance(q, And):
        return [
            t
            for c in q.clauses
            if not isinstance(c, Not)
            for t in _scoring_terms(c)
        ]
    return []  # Prefix, Fuzzy, Not


def _scoring_weights(q, mult: float = 1.0) -> dict[str, float]:
    """Per-term boost weights of a tree (Boost nodes multiply down the
    subtree; nested boosts compose). A term reachable through several
    clauses takes the MAX weight — the engine scores each distinct
    term once (``_scoring_terms`` dedupes), so summing occurrence
    boosts would change unboosted duplicate-term queries."""
    if isinstance(q, Term):
        return {q.term: mult}
    if isinstance(q, Phrase):
        return {t: mult for t in q.tokens}
    if isinstance(q, Boost):
        return _scoring_weights(q.clause, mult * float(q.weight))
    if isinstance(q, Field):
        return {}  # fielded terms score against the field index, not text
    out: dict[str, float] = {}
    if isinstance(q, (Or, And)):
        for c in q.clauses:
            if isinstance(c, Not):
                continue
            for t, w in _scoring_weights(c, mult).items():
                out[t] = max(out.get(t, 0.0), w)
    return out


def ranked_matches(
    spark: SparkSession,
    store: SegmentStore,
    q,
    min_doc: int | None = None,
    max_doc: int | None = None,
    field_stores: dict[str, SegmentStore] | None = None,
    deterministic: bool = False,
) -> DataFrame:
    """The UNLIMITED BM25-ranked match stream (doc_id, score) —
    the tree FILTERS, BM25 over its positive scoring terms RANKS;
    matches with no scoring term (e.g. reached only through a Prefix
    clause) score 0.0 and are never dropped. ranked_topk, top_hits,
    collapse_topk, boosting_topk, sampler_agg and search_after all cut
    this one stream differently — sharing it keeps their rankings
    bit-identical by construction. ``deterministic`` requests the
    sorted-fold score summation (search_after needs bit-stable floats
    for its cursor comparison; the plain shuffle-order sum drifts
    ~1e-11 run-to-run)."""
    from inverted_index_spark.operators.bm25 import bm25_scores

    if isinstance(q, str):
        q = parse_query(q)
    matches = _matches(
        spark, store, q, min_doc, max_doc, field_stores=field_stores
    ).select("doc_id")
    terms = sorted(set(_scoring_terms(q)))
    if not terms:
        return matches.select("doc_id", F.lit(0.0).alias("score"))
    weights = _scoring_weights(q)
    boosts = {t: w for t, w in weights.items() if w != 1.0} or None
    scores = bm25_scores(
        spark, store, terms, min_doc, max_doc,
        deterministic=deterministic, boosts=boosts,
    )
    return matches.join(scores, "doc_id", "left").select(
        "doc_id", F.coalesce("score", F.lit(0.0)).alias("score")
    )


def ranked_topk(
    spark: SparkSession,
    store: SegmentStore,
    q,
    k: int = 10,
    min_doc: int | None = None,
    max_doc: int | None = None,
    field_stores: dict[str, SegmentStore] | None = None,
) -> DataFrame:
    """BM25-ranked boolean search — the full search-engine surface in
    one call (Lucene BooleanQuery + similarity). Accepts a tree or a
    query string (parse_query grammar). Ties break (score DESC,
    doc_id ASC) like every other top-k in the engine; compiles to the
    match-set plan + one score stream + TakeOrdered."""
    return (
        ranked_matches(
            spark, store, q, min_doc, max_doc, field_stores=field_stores
        )
        .orderBy(F.desc("score"), F.asc("doc_id"))
        .limit(k)
    )


def search_after(
    spark: SparkSession,
    store: SegmentStore,
    q,
    k: int = 10,
    after: tuple[float, int] | None = None,
    min_doc: int | None = None,
    max_doc: int | None = None,
    field_stores: dict[str, SegmentStore] | None = None,
) -> DataFrame:
    """Keyset pagination over the ranked stream (Lucene/ES
    searchAfter): page N+1 = the top k results strictly after the
    ``(score, doc_id)`` cursor in the global (score DESC, doc_id ASC)
    order. ``after=None`` is page 1 (same ROWS as ranked_topk — but
    serve page 1 from THIS function when paginating: ranked_topk's
    plain shuffle-order sums can differ from the deterministic fold
    below at ~1e-11, and a cursor from the wrong stream misclassifies
    boundary docs under exact float comparison). Stateless and
    deep-page-safe at scale: every page is the same one-pass plan with
    a cursor predicate + TakeOrdered(k) — no offset scan grows with
    page depth, no scroll context is held anywhere. Cursors must come
    from a previous page of the same engine: the score stream uses
    bm25_scores(deterministic=True) — sorted-fold summation — so the
    float compared against the cursor is bit-identical across runs
    (the plain shuffle-order sum drifts ~1e-11 run-to-run, which
    breaks exact cursor equality)."""
    ranked = ranked_matches(
        spark, store, q, min_doc, max_doc, field_stores=field_stores,
        deterministic=True,
    )
    if after is not None:
        s, d = float(after[0]), int(after[1])
        ranked = ranked.where(
            (F.col("score") < s) | ((F.col("score") == s) & (F.col("doc_id") > d))
        )
    return ranked.orderBy(F.desc("score"), F.asc("doc_id")).limit(k)


def facet_stats(
    spark: SparkSession,
    store: SegmentStore,
    q,
    docs: DataFrame,
    col: str,
    stat_col: str,
    min_doc: int | None = None,
    max_doc: int | None = None,
    field_stores: dict[str, SegmentStore] | None = None,
) -> DataFrame:
    """Numeric stats facet (ES stats aggregation): per facet-column
    value over the match set — doc count, min/max/sum/avg of a numeric
    metadata column. Same shuffle shape as facet_counts: one semi-join
    of the narrow (doc_id, facet, stat) projection against the match
    set, one groupBy on facet keys."""
    if isinstance(q, str):
        q = parse_query(q)
    matches = _matches(
        spark, store, q, min_doc, max_doc, field_stores=field_stores
    ).select("doc_id")
    narrow = docs.select(
        F.col("doc_id").cast("long").alias("doc_id"),
        F.col(col),
        F.col(stat_col).cast("double").alias("_stat"),
    )
    return (
        narrow.join(matches, "doc_id", "leftsemi")
        .groupBy(col)
        .agg(
            F.count("*").alias("n_docs"),
            F.min("_stat").alias("min_v"),
            F.max("_stat").alias("max_v"),
            F.sum("_stat").alias("sum_v"),
            F.avg("_stat").alias("avg_v"),
        )
        .orderBy(col)
    )


def collapse_topk(
    spark: SparkSession,
    store: SegmentStore,
    q,
    docs: DataFrame,
    field: str,
    k: int = 10,
    per_field: int = 1,
    min_doc: int | None = None,
    max_doc: int | None = None,
    field_stores: dict[str, SegmentStore] | None = None,
) -> DataFrame:
    """ES field collapsing: the BM25-ranked stream reduced to the best
    ``per_field`` hits per value of a metadata column (dedup results
    by domain/source/author), then global top-k. One window over the
    (field, score) pairs — the shuffle carries (doc_id, field, score)
    for MATCHES only, never documents; the window partitions by field
    key so skewed fields are the only skew surface (same profile as
    facet_counts)."""
    from pyspark.sql import Window

    ranked = ranked_matches(
        spark, store, q, min_doc, max_doc, field_stores=field_stores
    )
    narrow = docs.select(
        F.col("doc_id").cast("long").alias("doc_id"), F.col(field)
    )
    w = Window.partitionBy(field).orderBy(F.desc("score"), F.asc("doc_id"))
    return (
        ranked.join(narrow, "doc_id")
        .withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") <= per_field)
        .select("doc_id", field, "score")
        .orderBy(F.desc("score"), F.asc("doc_id"))
        .limit(k)
    )


def facet_percentiles(
    spark: SparkSession,
    store: SegmentStore,
    q,
    docs: DataFrame,
    col: str,
    stat_col: str,
    percentiles: tuple[float, ...] = (0.5, 0.9, 0.99),
    min_doc: int | None = None,
    max_doc: int | None = None,
    field_stores: dict[str, SegmentStore] | None = None,
) -> DataFrame:
    """Percentiles facet (ES percentiles aggregation): exact
    linear-interpolated percentiles of a numeric column per facet
    value over the match set. Same shuffle shape as facet_counts.
    Uses Spark's exact `percentile` (NOT percentile_approx): at a
    facet-key group size where exact sort-based percentiles hurt,
    swap in percentile_approx(col, p, accuracy) — the plan shape is
    identical, the result is then approximate."""
    if isinstance(q, str):
        q = parse_query(q)
    matches = _matches(
        spark, store, q, min_doc, max_doc, field_stores=field_stores
    ).select("doc_id")
    narrow = docs.select(
        F.col("doc_id").cast("long").alias("doc_id"),
        F.col(col),
        F.col(stat_col).cast("double").alias("_stat"),
    )
    pct = F.percentile("_stat", F.lit(list(percentiles)))
    agg = (
        narrow.join(matches, "doc_id", "leftsemi")
        .groupBy(col)
        .agg(F.count("*").alias("n_docs"), pct.alias("_p"))
    )
    def _pname(p: float) -> str:
        # p50, p99, p99_9 — fractional percents keep their digits
        # ('.'→'_') so 0.99 and 0.999 never collide into one name
        s = f"{p * 100:.6f}".rstrip("0").rstrip(".")
        return "p" + s.replace(".", "_")

    names = [_pname(p) for p in percentiles]
    if len(set(names)) != len(names):
        raise ValueError(f"duplicate percentiles requested: {percentiles}")
    cols = [F.col(col), F.col("n_docs")] + [
        F.col("_p")[i].alias(n) for i, n in enumerate(names)
    ]
    return agg.select(*cols).orderBy(col)


def delete_by_query(
    spark: SparkSession,
    store: SegmentStore,
    q,
    field_stores: dict[str, SegmentStore] | None = None,
) -> str | None:
    """Tombstone every document matching a boolean query — Lucene's
    IndexWriter.deleteDocuments(Query), an extension over the
    insert-only reference. Accepts a tree or a query string
    (parse_query grammar, including phrases/prefix/fuzzy/fielded
    clauses). The match set is evaluated against the CURRENT snapshot
    and committed as one delete batch (store.delete_docs), so results
    and BM25 stats exclude the matches immediately; compaction
    physically purges them. Returns the delete-batch id, or None when
    nothing matched. The match set never lands on the driver — it
    flows as a DataFrame into the batch write."""
    if isinstance(q, str):
        q = parse_query(q)
    ids = _matches(spark, store, q, None, None, None, field_stores).select(
        "doc_id"
    )
    return store.delete_docs(spark, ids)


def facet_counts(
    spark: SparkSession,
    store: SegmentStore,
    q,
    docs: DataFrame,
    col: str,
    min_doc: int | None = None,
    max_doc: int | None = None,
    field_stores: dict[str, SegmentStore] | None = None,
) -> DataFrame:
    """Search-result faceting: matching-doc counts per value of a
    metadata column (the classic facet panel next to search results).
    Accepts a tree or a query string. One semi-join of the narrow
    (doc_id, col) metadata projection against the match set, then one
    groupBy on the facet column — the shuffle carries facet keys, not
    documents."""
    if isinstance(q, str):
        q = parse_query(q)
    matches = _matches(
        spark, store, q, min_doc, max_doc, field_stores=field_stores
    ).select("doc_id")
    narrow = docs.select(
        F.col("doc_id").cast("long").alias("doc_id"), F.col(col)
    )
    return (
        narrow.join(matches, "doc_id", "leftsemi")
        .groupBy(col)
        .agg(F.count("*").alias("n_docs"))
        .orderBy(col)
    )


def boosting_topk(
    spark: SparkSession,
    store: SegmentStore,
    positive,
    negative,
    negative_boost: float = 0.5,
    k: int = 10,
    min_doc: int | None = None,
    max_doc: int | None = None,
    field_stores: dict[str, SegmentStore] | None = None,
) -> DataFrame:
    """ES ``boosting`` query: rank by the positive query's BM25 score,
    DEMOTING (not excluding) docs that also match the negative query —
    their score is multiplied by ``negative_boost`` (ES requires it in
    [0, 1); 0 sinks them to the bottom without the hard exclusion a
    ``NOT`` clause would apply). Docs matching only the negative query
    are not returned, per ES. Both arguments accept a tree or a
    parse_query string.

    Plan shape: the positive match set + score stream (same as
    ranked_topk) plus ONE left join against the negative match set —
    matches only on both sides, AQE broadcasts the smaller; then
    TakeOrdered.
    """
    if not 0.0 <= float(negative_boost) < 1.0:
        raise ValueError("negative_boost must be in [0, 1)")
    if isinstance(negative, str):
        negative = parse_query(negative)
    ranked = ranked_matches(
        spark, store, positive, min_doc, max_doc, field_stores=field_stores
    )
    neg = _matches(
        spark, store, negative, min_doc, max_doc, field_stores=field_stores
    ).select("doc_id", F.lit(True).alias("_neg"))
    return (
        ranked.join(neg, "doc_id", "left")
        .select(
            "doc_id",
            F.when(
                F.col("_neg").isNotNull(),
                F.col("score") * F.lit(float(negative_boost)),
            )
            .otherwise(F.col("score"))
            .alias("score"),
        )
        .orderBy(F.desc("score"), F.asc("doc_id"))
        .limit(k)
    )


def facet_histogram(
    spark: SparkSession,
    store: SegmentStore,
    q,
    docs: DataFrame,
    stat_col: str,
    interval: float,
    min_doc: int | None = None,
    max_doc: int | None = None,
    field_stores: dict[str, SegmentStore] | None = None,
) -> DataFrame:
    """ES ``histogram`` aggregation: fixed-interval numeric buckets of
    a metadata column over the match set (``bucket = floor(v /
    interval) * interval``, ES's key rule; empty buckets are absent —
    ES ``min_doc_count: 1``). Same shuffle shape as facet_counts: one
    semi-join of the narrow (doc_id, stat) projection against the
    match set, one groupBy on the bucket key — the exchange carries
    bucket keys, never documents."""
    if float(interval) <= 0:
        raise ValueError("interval must be > 0")
    if isinstance(q, str):
        q = parse_query(q)
    matches = _matches(
        spark, store, q, min_doc, max_doc, field_stores=field_stores
    ).select("doc_id")
    narrow = docs.select(
        F.col("doc_id").cast("long").alias("doc_id"),
        F.col(stat_col).cast("double").alias("_stat"),
    )
    bucket = (
        F.floor(F.col("_stat") / F.lit(float(interval)))
        * F.lit(float(interval))
    ).alias("bucket")
    return (
        narrow.join(matches, "doc_id", "leftsemi")
        .select(bucket)
        .groupBy("bucket")
        .agg(F.count("*").alias("n_docs"))
        .orderBy("bucket")
    )


def facet_ranges(
    spark: SparkSession,
    store: SegmentStore,
    q,
    docs: DataFrame,
    stat_col: str,
    ranges: list[tuple[str, float | None, float | None]],
    min_doc: int | None = None,
    max_doc: int | None = None,
    field_stores: dict[str, SegmentStore] | None = None,
) -> DataFrame:
    """ES ``range`` aggregation: named [from, to) buckets of a numeric
    metadata column over the match set, each with doc count and the
    min/max/avg sub-stats ES users attach.  Ranges may overlap (a doc
    lands in EVERY range containing it, the ES contract), so the
    projection explodes one row per matching range — the explode factor
    is len(ranges), a constant, and the exchange carries range names,
    never documents.  Empty ranges are emitted with n_docs=0 (ES
    returns every requested range)."""
    if isinstance(q, str):
        q = parse_query(q)
    matches = _matches(
        spark, store, q, min_doc, max_doc, field_stores=field_stores
    ).select("doc_id")
    narrow = docs.select(
        F.col("doc_id").cast("long").alias("doc_id"),
        F.col(stat_col).cast("double").alias("_stat"),
    ).join(matches, "doc_id", "leftsemi")
    names = F.array(
        *[
            F.when(
                (F.lit(lo is None) | (F.col("_stat") >= F.lit(lo if lo is not None else 0.0)))
                & (F.lit(hi is None) | (F.col("_stat") < F.lit(hi if hi is not None else 0.0))),
                F.lit(name),
            )
            for name, lo, hi in ranges
        ]
    )
    hit = narrow.select(
        F.explode(F.filter(names, lambda x: x.isNotNull())).alias("range_name"),
        "_stat",
    )
    counted = hit.groupBy("range_name").agg(
        F.count("*").alias("n_docs"),
        F.min("_stat").alias("min_v"),
        F.max("_stat").alias("max_v"),
        F.avg("_stat").alias("avg_v"),
    )
    order = {name: i for i, (name, _, _) in enumerate(ranges)}
    all_ranges = spark.createDataFrame(
        [(name, order[name]) for name, _, _ in ranges],
        "range_name string, _ord int",
    )
    return (
        all_ranges.join(F.broadcast(counted), "range_name", "left")
        .select(
            "range_name",
            F.coalesce("n_docs", F.lit(0)).alias("n_docs"),
            "min_v",
            "max_v",
            "avg_v",
            "_ord",
        )
        .orderBy("_ord")
        .drop("_ord")
    )


def filters_agg(
    spark: SparkSession,
    store: SegmentStore,
    q,
    docs: DataFrame,
    filters: dict[str, str],
    min_doc: int | None = None,
    max_doc: int | None = None,
    field_stores: dict[str, SegmentStore] | None = None,
) -> DataFrame:
    """ES ``filters`` aggregation: one named bucket per metadata
    predicate over the match set.  Each predicate is a Spark SQL
    boolean expression over the docs columns; a doc can land in any
    number of buckets.  ONE pass over the semi-joined projection —
    each filter becomes a conditional count inside the same aggregate,
    so bucket count never multiplies the scan."""
    if isinstance(q, str):
        q = parse_query(q)
    matches = _matches(
        spark, store, q, min_doc, max_doc, field_stores=field_stores
    ).select("doc_id")
    matched = docs.withColumn(
        "doc_id", F.col("doc_id").cast("long")
    ).join(matches, "doc_id", "leftsemi")
    aggs = [
        F.sum(F.when(F.expr(pred), 1).otherwise(0)).alias(name)
        for name, pred in filters.items()
    ]
    wide = matched.agg(*aggs)
    # unpivot to (bucket, n_docs) rows, preserving the request order
    pairs = F.array(
        *[
            F.struct(F.lit(name).alias("bucket"), F.col(name).alias("n_docs"))
            for name in filters
        ]
    )
    return wide.select(F.explode(pairs).alias("p")).select("p.bucket", "p.n_docs")


def facet_extended_stats(
    spark: SparkSession,
    store: SegmentStore,
    q,
    docs: DataFrame,
    stat_col: str,
    min_doc: int | None = None,
    max_doc: int | None = None,
    field_stores: dict[str, SegmentStore] | None = None,
) -> DataFrame:
    """ES ``extended_stats``: count/min/max/sum/avg plus
    sum_of_squares, population variance and population std deviation
    of a numeric column over the match set (ES reports population
    moments).  Single aggregate over the semi-joined projection."""
    if isinstance(q, str):
        q = parse_query(q)
    matches = _matches(
        spark, store, q, min_doc, max_doc, field_stores=field_stores
    ).select("doc_id")
    narrow = docs.select(
        F.col("doc_id").cast("long").alias("doc_id"),
        F.col(stat_col).cast("double").alias("_stat"),
    ).join(matches, "doc_id", "leftsemi")
    return narrow.agg(
        F.count("*").alias("n_docs"),
        F.min("_stat").alias("min_v"),
        F.max("_stat").alias("max_v"),
        F.sum("_stat").alias("sum_v"),
        F.avg("_stat").alias("avg_v"),
        F.sum(F.col("_stat") * F.col("_stat")).alias("sum_sq"),
        F.var_pop("_stat").alias("variance"),
        F.stddev_pop("_stat").alias("std_dev"),
    )


def facet_string_stats(
    spark: SparkSession,
    store: SegmentStore,
    q,
    docs: DataFrame,
    str_col: str,
    min_doc: int | None = None,
    max_doc: int | None = None,
    field_stores: dict[str, SegmentStore] | None = None,
) -> DataFrame:
    """ES ``string_stats``: count, min/max/avg length and the Shannon
    entropy of the CHARACTER distribution of a keyword column over the
    match set (the ES contract: entropy is over characters, base 2).
    Two narrow aggregates — length moments in one pass, the character
    histogram via explode(split) in a second; both exchanges carry
    characters/lengths, never documents."""
    if isinstance(q, str):
        q = parse_query(q)
    matches = _matches(
        spark, store, q, min_doc, max_doc, field_stores=field_stores
    ).select("doc_id")
    narrow = docs.select(
        F.col("doc_id").cast("long").alias("doc_id"),
        F.col(str_col).cast("string").alias("_s"),
    ).join(matches, "doc_id", "leftsemi")
    lens = narrow.agg(
        F.count("*").alias("n_docs"),
        F.min(F.length("_s")).alias("min_len"),
        F.max(F.length("_s")).alias("max_len"),
        F.avg(F.length("_s")).alias("avg_len"),
    )
    chars = (
        narrow.select(F.explode(F.split("_s", "")).alias("c"))
        .where(F.col("c") != "")
        .groupBy("c")
        .agg(F.count("*").cast("double").alias("n"))
    )
    tot = chars.agg(F.sum("n").alias("tot"))
    ent = (
        chars.crossJoin(F.broadcast(tot))
        .select((F.col("n") / F.col("tot")).alias("p"))
        .agg((-F.sum(F.col("p") * F.log2("p"))).alias("entropy"))
    )
    return lens.crossJoin(ent)
