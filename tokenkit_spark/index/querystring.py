"""ES ``query_string`` mini-DSL: parse ``+must -must_not "exact phrase"
bare_should`` strings and evaluate them over the compressed index.

Grammar (the ES simple-syntax subset):

* whitespace-separated atoms; ``"..."`` quotes an exact phrase
* a leading ``+`` marks the atom MUST, ``-`` marks it MUST_NOT,
  no prefix marks it SHOULD
* filter-context match semantics (ES bool query): a doc matches iff it
  satisfies every MUST, violates no MUST_NOT, and — when there is no
  MUST — satisfies at least one SHOULD.  (With MUSTs present, SHOULDs
  only affect scoring in ES; in filter context they are optional, which
  is what this returns.)

Scale shape: the query strings are interactive user input (collected to
the driver for parsing — bounded by construction), but ALL term leaves
of ALL queries batch into ONE ``matching_docs`` pass and all phrase
leaves into ONE ``phrase_search`` pass, so the segment store is scanned
twice regardless of query count; composition is pure relational algebra
(left_semi / left_anti / union) on distributed doc-id sets.
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..config import AnalyzerConfig
from .query import matching_docs, phrase_search

_ATOM = re.compile(r'([+-]?)(?:"([^"]*)"|(\S+))')


@dataclass
class ParsedQuery:
    """Clause lists; each clause is ("term"|"phrase", text)."""

    must: list = field(default_factory=list)
    must_not: list = field(default_factory=list)
    should: list = field(default_factory=list)


def parse_query_string(q: str) -> ParsedQuery:
    """Parse an ES query_string into MUST / MUST_NOT / SHOULD clauses."""
    out = ParsedQuery()
    for prefix, phrase, term in _ATOM.findall(q or ""):
        if phrase is not None and phrase != "":
            clause = ("phrase", phrase)
        elif term:
            if term in ("+", "-"):
                continue
            clause = ("term", term)
        else:
            continue
        if prefix == "+":
            out.must.append(clause)
        elif prefix == "-":
            out.must_not.append(clause)
        else:
            out.should.append(clause)
    return out


def query_string_search(
    spark: SparkSession,
    index: dict,
    queries: DataFrame,
    config: AnalyzerConfig | None = None,
) -> DataFrame:
    """Evaluate query strings (query_id, qtext) over the index; returns
    the (query_id, doc_id) filter-context match set."""
    cfg = config or AnalyzerConfig()
    parsed = [
        (r["query_id"], parse_query_string(r["qtext"]))
        for r in queries.select("query_id", "qtext").collect()
    ]

    # batch every leaf into one pass per leaf kind
    term_leaves: dict[str, int] = {}
    phrase_leaves: dict[str, int] = {}
    for _, p in parsed:
        for kind, text in p.must + p.must_not + p.should:
            target = term_leaves if kind == "term" else phrase_leaves
            target.setdefault(text, len(target))

    # no .cache(): the per-leaf filters below are identical subplans over
    # one base, so Spark's exchange reuse already shares the segment scan
    # within an action — caching here would leak storage blocks into the
    # session on every call of this (interactive, repeated) API
    term_matches = None
    if term_leaves:
        qdf = spark.createDataFrame(
            [(i, t) for t, i in term_leaves.items()], "query_id long, text string"
        )
        term_matches = matching_docs(spark, index, qdf, cfg)
    phrase_matches = None
    if phrase_leaves:
        pdf = spark.createDataFrame(
            [(i, t) for t, i in phrase_leaves.items()], "query_id long, text string"
        )
        phrase_matches = phrase_search(spark, index, pdf, cfg)

    def leaf_set(kind: str, text: str) -> DataFrame:
        if kind == "term":
            return term_matches.filter(
                F.col("query_id") == term_leaves[text]
            ).select("doc_id")
        return phrase_matches.filter(
            F.col("query_id") == phrase_leaves[text]
        ).select("doc_id")

    universe = index["doc_stats"].select("doc_id")
    results = []
    for qid, p in parsed:
        if p.must:
            acc = leaf_set(*p.must[0])
            for clause in p.must[1:]:
                acc = acc.join(leaf_set(*clause), "doc_id", "left_semi")
        elif p.should:
            acc = leaf_set(*p.should[0])
            for clause in p.should[1:]:
                acc = acc.unionByName(leaf_set(*clause))
            acc = acc.distinct()
        elif p.must_not:
            # pure-negation query: complement against the corpus
            acc = universe
        else:
            # no parseable clause at all (empty string / bare +/-):
            # matches NOTHING — the universe fallback is only for
            # must_not-only queries
            continue
        for clause in p.must_not:
            acc = acc.join(leaf_set(*clause), "doc_id", "left_anti")
        results.append(acc.select(F.lit(qid).cast("long").alias("query_id"), "doc_id"))

    if not results:
        return spark.createDataFrame([], "query_id long, doc_id long")
    out = results[0]
    for r in results[1:]:
        out = out.unionByName(r)
    return out
