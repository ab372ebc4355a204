"""Structured boolean queries (Q11, SURVEY §2.5 / §3.3).

Grammar — indentation-aligned operator prefixes, from the reference parser
(/root/reference/searchapi3/src/Query/QueryParser.hs:21-89):

    /\\ search          AND-conjunction: children are op tokens aligned at
    /\\ \\/ .cs          the same column with the same op
       \\/ .ts
       \\/ .js
    /\\ feature
    -- excluded         SUB = set difference
    ~ regex.*           leaf regex clause

Evaluation (StructuredProcessor.hs:57-71): a Conjunction left-folds its
children's unscored doc-id sets with union (\\/), intersection (/\\) or
difference (--). Leaves are unscored conjunctive text queries or regex
union queries.

Spark mapping: each leaf is an unscored_ids() DataFrame of bare doc_ids
(one isin-pruned postings scan per leaf); the fold is set algebra over
8-byte doc-id rows — OR = union+distinct, AND = left-semi join, SUB =
left-anti join. urls are resolved once, after the whole tree collapses.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from search_suite_spark.operators.build import InvertedIndex
from search_suite_spark.operators.query import parse_query_terms, unscored_ids


@dataclass
class Clause:
    pass


@dataclass
class ClauseText(Clause):
    text: str


@dataclass
class ClauseRegex(Clause):
    pattern: str


@dataclass
class Conjunction(Clause):
    op: str  # 'and' | 'or' | 'sub'
    children: list[Clause]


_OPS = {"/\\": "and", "\\/": "or", "--": "sub"}


def _lex(query: str) -> list[tuple[str, int | None, str | None]]:
    """Flatten the indented query into (kind, col, payload) tokens.

    kind ∈ {op, regex, text}; op payload is 'and'/'or'/'sub', col is the
    column of the op token; regex/text payload is the rest of the line.
    """
    tokens: list[tuple[str, int | None, str | None]] = []
    for line in query.splitlines():
        i = 0
        n = len(line)
        while True:
            while i < n and line[i].isspace():
                i += 1
            two = line[i : i + 2]
            if two in _OPS:
                tokens.append(("op", i, _OPS[two]))
                i += 2
                continue
            break
        rest = line[i:].strip()
        if not rest:
            continue
        if rest.startswith("~"):
            tokens.append(("regex", None, rest[1:].strip()))
        else:
            tokens.append(("text", None, rest))
    return tokens


class _Parser:
    def __init__(self, tokens):
        self.tokens = tokens
        self.pos = 0

    def peek(self):
        return self.tokens[self.pos] if self.pos < len(self.tokens) else None

    def clause(self) -> Clause:
        tok = self.peek()
        if tok is None:
            raise ValueError("unexpected end of structured query")
        kind, col, payload = tok
        if kind == "op":
            self.pos += 1
            children = [self.clause()]
            while True:
                nxt = self.peek()
                if nxt is None or nxt[0] != "op" or nxt[1] != col:
                    break
                if nxt[2] != payload:
                    raise ValueError(
                        f"operator mismatch at column {col}: {nxt[2]} vs {payload}"
                    )
                self.pos += 1
                children.append(self.clause())
            return Conjunction(payload, children)
        self.pos += 1
        if kind == "regex":
            return ClauseRegex(payload)
        return ClauseText(payload)


def parse_structured_query(query: str) -> Clause:
    p = _Parser(_lex(query))
    clause = p.clause()
    if p.peek() is not None:
        raise ValueError("parse failure (leftover input)")
    return clause


def _text_leaf_terms(clause: Clause) -> set[str]:
    """All normalized terms across every ClauseText leaf of the tree."""
    from search_suite_spark.operators.query import parse_query_terms

    if isinstance(clause, ClauseText):
        return set(parse_query_terms(clause.text))
    if isinstance(clause, Conjunction):
        out: set[str] = set()
        for c in clause.children:
            out |= _text_leaf_terms(c)
        return out
    return set()


def _regex_leaf_patterns(clause: Clause) -> set[str]:
    """All regex patterns across every ClauseRegex leaf of the tree."""
    if isinstance(clause, ClauseRegex):
        return {clause.pattern}
    if isinstance(clause, Conjunction):
        out: set[str] = set()
        for c in clause.children:
            out |= _regex_leaf_patterns(c)
        return out
    return set()


def _batched_regex_terms(
    index: InvertedIndex,
    patterns: list[str],
    owned: list[DataFrame] | None = None,
) -> dict[str, DataFrame]:
    """ONE dictionary scan covering every ClauseRegex pattern in a tree:
    each pattern becomes a literal rlike flag column (compiled once by
    codegen — a column-typed pattern would recompile per row), rows
    matching any pattern are kept, and each leaf reads its own flag.
    The reference spawns one process per leaf
    (Query/StructuredProcessor.hs:113-118); without batching, a tree
    with R regex leaves embeds R independent dictionary scans in the
    final plan. Matched terms stay distributed (never collected — a
    broad pattern over a web-scale dictionary matches millions).

    ``owned``: when given, the shared matched frame is persisted and
    appended there — the CALLER owns its lifetime (structured_query
    materializes the id set eagerly, then unpersists, so the cache
    lives exactly one evaluation; the previous module-global cache
    raced between interleaved queries on one session). When None, no
    persist happens: each leaf re-derives from the same (unpersisted)
    plan — correct, one scan per leaf, the pre-batching cost."""
    flags = [
        F.col("term").rlike(p).alias(f"_m{i}") for i, p in enumerate(patterns)
    ]
    keep = F.col("_m0")
    for i in range(1, len(patterns)):
        keep = keep | F.col(f"_m{i}")
    matched = index.terms.select("term", *flags).filter(keep)
    if owned is not None:
        matched = matched.persist()
        owned.append(matched)
    return {
        p: matched.filter(F.col(f"_m{i}")).select("term")
        for i, p in enumerate(patterns)
    }


def evaluate_structured(
    index: InvertedIndex,
    clause: Clause,
    _present: set[str] | None = None,
    _regex: dict[str, DataFrame] | None = None,
    _owned: list[DataFrame] | None = None,
) -> DataFrame:
    """Clause tree → DataFrame of distinct doc_ids in the result set.

    StructuredProcessor.hs:57-71's left-fold, over doc-id-only frames:
    every leaf's ids are already distinct, so AND is a left-semi join and
    SUB a left-anti join (cheaper than intersect/subtract, which re-dedupe
    both sides); OR unions then dedupes once.

    The fast-abort dictionary probe (query.rs:34-40) is batched: ONE
    isin-pruned dictionary job covers every ClauseText leaf's terms — a
    deep clause tree otherwise serializes one driver-blocking count()
    job of pure submit latency per leaf. Regex leaves batch the same
    way: one flag-column dictionary scan covers every pattern
    (_batched_regex_terms).
    """
    if _present is None:
        all_terms = sorted(_text_leaf_terms(clause))
        _present = (
            {
                r["term"]
                for r in index.terms.filter(F.col("term").isin(all_terms))
                .select("term")
                .collect()
            }
            if all_terms
            else set()
        )
    if _regex is None:
        patterns = sorted(_regex_leaf_patterns(clause))
        # a single regex leaf is already one scan — batch only trees
        # that would otherwise embed several independent scans
        _regex = (
            _batched_regex_terms(index, patterns, owned=_owned)
            if len(patterns) > 1
            else {}
        )
    if isinstance(clause, ClauseText):
        return unscored_ids(index, clause.text, present_terms=_present)
    if isinstance(clause, ClauseRegex):
        if clause.pattern in _regex:
            return (
                index.live_postings()
                .join(_regex[clause.pattern], "term", "left_semi")
                .select("doc_id")
                .distinct()
            )
        return unscored_ids(index, clause.pattern, mode="regex")
    assert isinstance(clause, Conjunction)
    if clause.op == "and" and all(
        isinstance(c, ClauseText) for c in clause.children
    ):
        # AND of text leaves ≡ one conjunctive query over the union of
        # their terms — ONE isin-pruned scan instead of a semi-join per
        # child (a doc matches every child iff every term matches).
        # A child whose text normalizes to ZERO terms (e.g. "!!!") is an
        # empty doc set, so the whole AND is empty — the merged query
        # would silently drop that child's constraint instead.
        if any(not parse_query_terms(c.text) for c in clause.children):
            return index.postings.sparkSession.createDataFrame(
                [], "doc_id long"
            )
        merged = " ".join(c.text for c in clause.children)
        return unscored_ids(index, merged, present_terms=_present)
    if clause.op == "or":
        # single-term text children fold into ONE disjunctive scan
        # (isin over their union — the k-way posting union of Q9);
        # multi-term / regex / nested children evaluate individually
        singles: list[str] = []
        rest: list[Clause] = []
        for c in clause.children:
            terms = (
                set(parse_query_terms(c.text))
                if isinstance(c, ClauseText)
                else None
            )
            if terms is not None and len(terms) == 1:
                singles.append(next(iter(terms)))
            else:
                rest.append(c)
        parts: list[DataFrame] = []
        found = sorted(t for t in set(singles) if t in _present)
        if found:
            parts.append(
                index.live_postings()
                .filter(F.col("term").isin(found))
                .select("doc_id")
            )
        parts.extend(
            evaluate_structured(index, c, _present, _regex) for c in rest
        )
        if not parts:
            return index.postings.sparkSession.createDataFrame(
                [], "doc_id long"
            )
        acc = parts[0]
        for p in parts[1:]:
            acc = acc.unionByName(p)
        return acc.distinct()
    acc = evaluate_structured(index, clause.children[0], _present, _regex)
    how = "left_semi" if clause.op == "and" else "left_anti"
    for c in clause.children[1:]:
        acc = acc.join(
            evaluate_structured(index, c, _present, _regex), "doc_id", how
        )
    return acc


def structured_query(index: InvertedIndex, query: str) -> DataFrame:
    """Structured boolean query → (doc_id, url); urls resolved once at
    the very end, after the id-set algebra collapses.

    Cache lifetime: a multi-regex tree persists ONE shared dictionary
    scan for the duration of this call only — the id set is
    materialized eagerly (result-set-sized, the same bound as the
    reference's in-memory UnscoredResults set) while the scan is hot,
    and the scan is unpersisted (in a finally: a failed job can't leak
    it) before returning, so interleaved queries on one session never
    touch each other's caches. Trees with ≤1 regex leaf stay fully
    lazy. Materialization uses the durable ``checkpoint`` when the
    context has a checkpoint dir (cluster deployments: blocks survive
    executor loss); otherwise ``localCheckpoint``, whose blocks are
    NOT recomputable — acceptable on a single-node/local session,
    where losing an executor means losing the session anyway."""
    owned: list[DataFrame] = []
    try:
        ids = evaluate_structured(
            index, parse_structured_query(query), _owned=owned
        )
        if owned:
            sc = index.docs.sparkSession.sparkContext
            if sc.getCheckpointDir() is not None:
                ids = ids.checkpoint(eager=True)
            else:
                ids = ids.localCheckpoint(eager=True)
    finally:
        for df in owned:
            df.unpersist()
    return ids.join(index.docs.select("doc_id", "url"), "doc_id")
