"""Index build + BM25 query engine tests: segment path must be
rank-identical (doc ids AND scores) to the brute-force DataFrame path,
and the build must be resumable from the per-shard manifest."""

import math
import shutil

import pytest
from pyspark.sql import functions as F

from tokenkit_spark import AnalyzerConfig
from tokenkit_spark.index import codec
from tokenkit_spark.index.build import build_index, load_index, postings_df
from tokenkit_spark.index.query import bm25_brute, bm25_segments
from tokenkit_spark.sources.pages import (
    extract_text_udf,
    pages_to_docs,
    synth_pages,
)

CFG = AnalyzerConfig(strategy="whitespace", lowercase=True)

QUERIES = [
    (0, "data search engine"),
    (1, "BRCA1"),
    (2, "the of and"),          # head terms (skew)
    (3, "spark index shard merge"),
    (4, "zzz-neverfound"),      # zero hits
    (5, "support@example.com"),
    (6, "crawl"),
]


@pytest.fixture(scope="module")
def pages(spark):
    return synth_pages(spark, n_docs=600, seed=42).cache()


@pytest.fixture(scope="module")
def docs(pages):
    return pages_to_docs(pages).cache()


@pytest.fixture(scope="module")
def queries_df(spark):
    return spark.createDataFrame(QUERIES, "query_id long, text string")


@pytest.fixture(scope="module")
def index(spark, docs, tmp_path_factory):
    path = str(tmp_path_factory.mktemp("idx") / "index")
    metrics = build_index(spark, docs, path, CFG, n_shards=8, n_buckets=16)
    assert metrics["n_docs"] == 600
    return load_index(spark, path)


def test_extraction_invariant(pages):
    # byte-identical extracted text per url (input_hint invariant)
    bad = pages.withColumn("ext", extract_text_udf()(F.col("html"))).filter(
        F.col("ext") != F.col("text")
    )
    assert bad.count() == 0


def test_catalog_table_adapter_roundtrip(spark, pages):
    """The writeTo/read.table seam (production Iceberg path) runs for
    real against the session catalog: write the pages table through the
    catalog, read it back by table name, verify parity (ADVICE r01: the
    branch must not remain untested dead code)."""
    from tokenkit_spark.sources.pages import read_pages, write_pages

    table = "tokenkit_pages_adapter_test"
    spark.sql(f"DROP TABLE IF EXISTS {table}")
    try:
        write_pages(pages, table, use_iceberg=True, table_format="parquet")
        back = read_pages(spark, table, use_iceberg=True)
        assert back.count() == pages.count()
        assert dict(back.dtypes) == dict(pages.dtypes)
        a = {r.url for r in pages.select("url").collect()}
        b = {r.url for r in back.select("url").collect()}
        assert a == b
        # extraction invariant survives the catalog round-trip
        bad = back.withColumn("ext", extract_text_udf()(F.col("html"))).filter(
            F.col("ext") != F.col("text")
        )
        assert bad.count() == 0
    finally:
        spark.sql(f"DROP TABLE IF EXISTS {table}")


def test_doc_ids_unique(docs):
    n = docs.count()
    assert docs.select("doc_id").distinct().count() == n


def test_segments_roundtrip_vs_postings(spark, docs, index):
    """Compressed segments must decode back to exactly the brute postings."""
    brute = {
        (r.term, r.doc_id): r.tf
        for r in postings_df(docs, CFG).collect()
    }
    seen = {}
    for row in index["segments"].collect():
        doc_ids, tfs, dls = codec.decode_posting_list(row)
        assert list(doc_ids) == sorted(doc_ids), "postings sorted by doc_id"
        for d, t in zip(doc_ids.tolist(), tfs.tolist()):
            seen[(row.term, d)] = t
    assert seen == brute


def test_term_stats_consistent(index):
    ts = {r.term: (r.df, r.cf) for r in index["term_stats"].collect()}
    agg = {}
    for row in index["segments"].collect():
        df0, cf0 = agg.get(row.term, (0, 0))
        agg[row.term] = (df0 + row.n_postings, cf0 + row.cf_shard)
    assert ts == agg


def test_rank_identical_segments_vs_brute(spark, docs, queries_df, index):
    k = 10
    brute = bm25_brute(docs, queries_df, CFG, k=k).collect()
    segd = bm25_segments(spark, index, queries_df, CFG, k=k).collect()
    b = {(r.query_id, r.rank): (r.doc_id, r.score) for r in brute}
    s = {(r.query_id, r.rank): (r.doc_id, r.score) for r in segd}
    assert set(b) == set(s)
    for key in b:
        assert b[key][0] == s[key][0], f"doc mismatch at {key}: {b[key]} vs {s[key]}"
        assert math.isclose(b[key][1], s[key][1], rel_tol=1e-9), key


def test_zero_hit_query(spark, queries_df, index):
    out = bm25_segments(spark, index, queries_df, CFG, k=10)
    assert out.filter(F.col("query_id") == 4).count() == 0


def test_resume_skips_done_shards(spark, docs, tmp_path_factory):
    path = str(tmp_path_factory.mktemp("idx2") / "index")
    m1 = build_index(spark, docs, path, CFG, n_shards=4, n_buckets=8)
    assert m1["built_shards"] == 4
    m2 = build_index(spark, docs, path, CFG, n_shards=4, n_buckets=8)
    assert m2["built_shards"] == 0 and m2["skipped_shards"] == 4


def test_resume_rebuilds_missing_shard(spark, docs, queries_df, tmp_path_factory):
    full = str(tmp_path_factory.mktemp("idx3") / "full")
    part = str(tmp_path_factory.mktemp("idx3") / "part")
    build_index(spark, docs, full, CFG, n_shards=4, n_buckets=8)

    build_index(spark, docs, part, CFG, n_shards=4, n_buckets=8)
    # simulate a lost shard: drop shard=2 segments + manifest entry
    mf = spark.read.parquet(f"{part}/manifest").filter(F.col("shard") != 2)
    mf.write.mode("overwrite").parquet(f"{part}/manifest_tmp")
    shutil.rmtree(f"{part}/manifest")
    shutil.move(f"{part}/manifest_tmp", f"{part}/manifest")
    shutil.rmtree(f"{part}/segments/shard=2")
    shutil.rmtree(f"{part}/doc_stats/shard=2")

    m = build_index(spark, docs, part, CFG, n_shards=4, n_buckets=8)
    assert m["skipped_shards"] == 3 and m["built_shards"] == 1

    # identical final index: same manifest checksums per shard
    c_full = {r.shard: (r.n_terms, r.n_postings, r.checksum)
              for r in spark.read.parquet(f"{full}/manifest").collect()}
    c_part = {r.shard: (r.n_terms, r.n_postings, r.checksum)
              for r in spark.read.parquet(f"{part}/manifest").collect()}
    assert c_full == c_part

    # and identical query results
    i_full = load_index(spark, full)
    i_part = load_index(spark, part)
    r_full = bm25_segments(spark, i_full, queries_df, CFG, k=10).collect()
    r_part = bm25_segments(spark, i_part, queries_df, CFG, k=10).collect()
    assert sorted(map(tuple, r_full)) == sorted(map(tuple, r_part))


def test_rebuild_over_dirty_path_equals_fresh(spark, docs, tmp_path_factory):
    """resume=False into a non-empty index path must NOT append-duplicate
    doc_stats/segments (VERDICT r01 item 5): the path is cleaned first and
    the result equals a fresh build."""
    root = tmp_path_factory.mktemp("dirty")
    path = str(root / "index")
    build_index(spark, docs, path, CFG, n_shards=4, n_buckets=8)
    m = build_index(spark, docs, path, CFG, n_shards=4, n_buckets=8, resume=False)
    assert m["n_docs"] == 600
    idx = load_index(spark, path)
    assert idx["doc_stats"].count() == 600  # not doubled
    fresh = str(root / "fresh")
    build_index(spark, docs, fresh, CFG, n_shards=4, n_buckets=8)
    c_a = {r.shard: (r.n_terms, r.n_postings, r.checksum)
           for r in spark.read.parquet(f"{path}/manifest").collect()}
    c_b = {r.shard: (r.n_terms, r.n_postings, r.checksum)
           for r in spark.read.parquet(f"{fresh}/manifest").collect()}
    assert c_a == c_b


def test_merge_rejects_position_parity_mismatch(spark, docs, tmp_path_factory):
    """Merging a positional index with a non-positional one must fail
    fast (ADVICE r01): a silent mix crashes phrase_search much later."""
    from tokenkit_spark.index.merge import merge_indexes

    root = tmp_path_factory.mktemp("parity")
    half = F.col("doc_id") % 2 == 0
    build_index(spark, docs.filter(half), str(root / "pos"), CFG,
                n_shards=4, n_buckets=4, store_positions=True)
    build_index(spark, docs.filter(~half), str(root / "nopos"), CFG,
                n_shards=4, n_buckets=4, store_positions=False)
    with pytest.raises(ValueError, match="position parity"):
        merge_indexes(spark, str(root / "pos"), str(root / "nopos"), str(root / "bad"))


def test_phrase_search_rejects_positionless_index(spark, docs, tmp_path_factory):
    from tokenkit_spark.index.query import phrase_search

    path = str(tmp_path_factory.mktemp("nopos") / "index")
    build_index(spark, docs, path, CFG, n_shards=2, n_buckets=2,
                store_positions=False)
    idx = load_index(spark, path)
    ph = spark.createDataFrame([(0, "data search")], "query_id long, text string")
    with pytest.raises(ValueError, match="positional index"):
        phrase_search(spark, idx, ph, CFG)


def test_delete_rejects_inplace_overwrite(spark, docs, tmp_path_factory):
    from tokenkit_spark.index.delete import delete_docs

    root = tmp_path_factory.mktemp("inplace")
    path = str(root / "index")
    build_index(spark, docs, path, CFG, n_shards=4, n_buckets=4)
    with pytest.raises(ValueError, match="out_path"):
        delete_docs(spark, path, [1, 2, 3], path)
    with pytest.raises(ValueError, match="out_path"):
        delete_docs(spark, path, [1, 2, 3], path + "/")


def test_blockmax_equals_exhaustive_spark(spark, index, queries_df):
    """A/B: the Block-Max WAND kernel (forced for every group via
    direct_max_blocks=0), the short-list direct path, and the exhaustive
    kernel must all be rank- AND score-identical through Spark."""
    a = bm25_segments(spark, index, queries_df, CFG, k=10, use_blockmax=True,
                      direct_max_blocks=0)
    b = bm25_segments(spark, index, queries_df, CFG, k=10, use_blockmax=False)
    c = bm25_segments(spark, index, queries_df, CFG, k=10, use_blockmax=True)
    norm = lambda df: sorted(
        (r.query_id, r.rank, r.doc_id, round(r.score, 9)) for r in df.collect()
    )
    ra, rb, rc = norm(a), norm(b), norm(c)
    assert ra == rb == rc


def test_conjunctive_matches_brute(spark, docs, queries_df, index):
    """AND semantics: the segment-path conjunctive results must equal a
    brute DataFrame computation (docs holding ALL analyzed query terms,
    same BM25 scores, pinned tie order)."""
    from tokenkit_spark.index.query import (
        _doc_globals,
        _idf,
        _topk_window,
        analyze_queries,
        bm25_segments_conjunctive,
    )
    from tokenkit_spark.index.build import doc_stats_df, postings_df

    got = bm25_segments_conjunctive(spark, index, queries_df, CFG, k=10).collect()

    postings = postings_df(docs, CFG).select("term", "doc_id", "tf")
    dstats = doc_stats_df(docs, CFG)
    n_docs, avgdl = _doc_globals(dstats)
    term_stats = postings.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    q_terms = analyze_queries(queries_df, CFG)
    q_counts = q_terms.groupBy("query_id").agg(
        F.countDistinct("term").alias("nq")
    )
    K1, B = 1.2, 0.75
    scored = (
        q_terms.join(postings, "term")
        .join(term_stats, "term")
        .join(dstats, "doc_id")
        .withColumn("idf", _idf(F.col("df"), n_docs))
        .withColumn(
            "norm",
            (F.col("tf") * (K1 + 1.0))
            / (F.col("tf") + K1 * (1.0 - B + B * F.col("dl") / F.lit(avgdl))),
        )
        .groupBy("query_id", "doc_id")
        .agg(
            F.sum(F.col("idf") * F.col("norm")).alias("score"),
            F.countDistinct("term").alias("nt"),
        )
        .join(q_counts, "query_id")
        .filter(F.col("nt") == F.col("nq"))
        .select("query_id", "doc_id", "score")
    )
    want = _topk_window(scored, 10).collect()
    norm = lambda rows: sorted(
        (r.query_id, r.rank, r.doc_id, round(r.score, 9)) for r in rows
    )
    assert norm(got) == norm(want)
    # strict AND: the zero-hit query matches nothing; multi-term AND is a
    # subset of the disjunctive result set
    assert not any(r.query_id == 4 for r in got)
    dis = {(r.query_id, r.doc_id)
           for r in bm25_segments(spark, index, queries_df, CFG, k=1000).collect()}
    assert all((r.query_id, r.doc_id) in dis for r in got)


def test_msm_boundaries_and_middle(spark, docs, queries_df, index):
    """minimum_should_match: m=1 equals the disjunctive segment path,
    m=len(terms) equals the conjunctive path, and a middle m equals a
    brute DataFrame computation (docs matching >= m distinct terms)."""
    from tokenkit_spark.index.query import (
        _doc_globals,
        _idf,
        _topk_window,
        analyze_queries,
        bm25_segments_conjunctive,
        bm25_segments_msm,
    )
    from tokenkit_spark.index.build import doc_stats_df

    norm = lambda rows: sorted(
        (r.query_id, r.rank, r.doc_id, round(r.score, 9)) for r in rows
    )

    # m=1 == disjunctive
    got1 = bm25_segments_msm(spark, index, queries_df, CFG, k=10, min_match=1)
    dis = bm25_segments(spark, index, queries_df, CFG, k=10)
    assert norm(got1.collect()) == norm(dis.collect())

    # m = per-query term count == conjunctive, for the 4-term query
    q4 = queries_df.filter(F.col("query_id") == 3)  # "spark index shard merge"
    got4 = bm25_segments_msm(spark, index, q4, CFG, k=10, min_match=4)
    conj = bm25_segments_conjunctive(spark, index, q4, CFG, k=10)
    assert norm(got4.collect()) == norm(conj.collect())

    # middle m=2 vs brute
    got2 = bm25_segments_msm(spark, index, queries_df, CFG, k=10, min_match=2)
    postings = postings_df(docs, CFG).select("term", "doc_id", "tf")
    dstats = doc_stats_df(docs, CFG)
    n_docs, avgdl = _doc_globals(dstats)
    term_stats = postings.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    q_terms = analyze_queries(queries_df, CFG)
    K1, B = 1.2, 0.75
    scored = (
        q_terms.join(postings, "term")
        .join(term_stats, "term")
        .join(dstats, "doc_id")
        .withColumn("idf", _idf(F.col("df"), n_docs))
        .withColumn(
            "norm",
            (F.col("tf") * (K1 + 1.0))
            / (F.col("tf") + K1 * (1.0 - B + B * F.col("dl") / F.lit(avgdl))),
        )
        .groupBy("query_id", "doc_id")
        .agg(
            F.sum(F.col("idf") * F.col("norm")).alias("score"),
            F.countDistinct("term").alias("nt"),
        )
        .filter(F.col("nt") >= 2)
        .select("query_id", "doc_id", "score")
    )
    want2 = _topk_window(scored, 10).collect()
    assert norm(got2.collect()) == norm(want2)

    with pytest.raises(ValueError, match="min_match"):
        bm25_segments_msm(spark, index, queries_df, CFG, min_match=0)


def test_proximity_matches_brute_and_phrase(spark, docs, index):
    """proximity_search: slop=0 containment equals phrase_search; spans
    at slop>0 equal an independent pure-Python sliding-subsequence check
    over the raw tokenized texts."""
    from tokenkit_spark.index.query import phrase_search, proximity_search

    PROX = [
        (0, "data search"),
        (1, "search engine"),
        (2, "the of"),
        (3, "crawl index shard"),      # 3-term
        (4, "zzz-neverfound data"),    # one term missing entirely
    ]
    pdf = spark.createDataFrame(PROX, "query_id long, text string")

    # slop=0 == exact phrase containment
    got0 = {(r.query_id, r.doc_id)
            for r in proximity_search(spark, index, pdf, CFG, slop=0).collect()}
    ph = {(r.query_id, r.doc_id)
          for r in phrase_search(spark, index, pdf, CFG).collect()}
    assert got0 == ph

    # slop=2 vs brute: for every doc and phrase, min ordered span by an
    # independent window-scan formulation (not the greedy chain)
    texts = {r.doc_id: r.text.lower().split() for r in docs.collect()}

    def brute_min_span(tokens, phrase):
        best = None
        n = len(phrase)
        for i, t in enumerate(tokens):
            if t != phrase[0]:
                continue
            j, need = i, 1
            while need < n:
                j += 1
                while j < len(tokens) and tokens[j] != phrase[need]:
                    j += 1
                if j >= len(tokens):
                    need = -1
                    break
                need += 1
            if need == n:
                span = j - i
                best = span if best is None else min(best, span)
        return best

    want = {}
    for qid, ptext in PROX:
        phrase = ptext.lower().split()
        for d, tokens in texts.items():
            s = brute_min_span(tokens, phrase)
            if s is not None and s <= (len(phrase) - 1) + 2:
                want[(qid, d)] = s
    got2 = {(r.query_id, r.doc_id): r.span
            for r in proximity_search(spark, index, pdf, CFG, slop=2).collect()}
    assert got2 == want
    assert not any(q == 4 for q, _ in got2)

    with pytest.raises(ValueError, match="slop"):
        proximity_search(spark, index, pdf, CFG, slop=-1)


def test_snippets_match_brute(spark, docs, queries_df, index):
    """Highlighted snippets equal a pure-Python recompute of the
    deterministic rule (window centered on the first matched term,
    matches wrapped in <em>), for the top-10 of every query."""
    from tokenkit_spark.index.query import snippets

    W = 8
    results = bm25_segments(spark, index, queries_df, CFG, k=10)
    got = {(r.query_id, r.doc_id): (r.rank, r.snippet)
           for r in snippets(spark, docs, results, queries_df, CFG, window=W).collect()}

    texts = {r.doc_id: r.text.lower().split() for r in docs.collect()}
    qterms = {q: set(t.lower().split()) for q, t in QUERIES}
    want = {}
    for r in results.collect():
        toks = texts[r.doc_id]
        terms = qterms[r.query_id]
        p0 = min(i for i, x in enumerate(toks) if x in terms)
        s = max(0, p0 - (W - 1) // 2)
        snip = " ".join(
            f"<em>{x}</em>" if x in terms else x for x in toks[s : s + W]
        )
        want[(r.query_id, r.doc_id)] = (r.rank, snip)
    assert got == want
    assert all("<em>" in snip for _rank, snip in got.values())

    with pytest.raises(ValueError, match="window"):
        snippets(spark, docs, results, queries_df, CFG, window=0)


def test_batch_path_equals_interactive(spark, index, queries_df):
    """bm25_segments_batch (relational term join, no driver term collect)
    must be rank- and score-identical to the interactive pushdown path."""
    from tokenkit_spark.index.query import bm25_segments_batch

    a = bm25_segments(spark, index, queries_df, CFG, k=10).collect()
    b = bm25_segments_batch(spark, index, queries_df, CFG, k=10).collect()
    norm = lambda rows: sorted((r.query_id, r.rank, r.doc_id, round(r.score, 9)) for r in rows)
    assert norm(a) == norm(b)


def test_phrase_search_matches_python_bruteforce(spark, docs, index):
    from tokenkit_spark.index.query import phrase_search

    phrases = [(0, "data search"), (1, "the of"), (2, "zz missing phrase")]
    pdf = spark.createDataFrame(phrases, "query_id long, text string")
    got = {
        (r.query_id, r.doc_id): r.n_occurrences
        for r in phrase_search(spark, index, pdf, CFG).collect()
    }
    # brute force: sliding window over whitespace-lowercased token streams
    want = {}
    for row in docs.select("doc_id", "text").collect():
        toks = row.text.lower().split()
        for qid, ptext in phrases:
            p = ptext.lower().split()
            n = sum(
                1
                for i in range(len(toks) - len(p) + 1)
                if toks[i : i + len(p)] == p
            )
            if n:
                want[(qid, row.doc_id)] = n
    assert got == want
    assert any(q == 0 for q, _ in got), "expected at least one 'data search' hit"
    assert not any(q == 2 for q, _ in got)


def test_merge_indexes_equals_full_build(spark, docs, queries_df, tmp_path_factory):
    """base(0..half) + delta(half..) merged == one full build: identical
    BM25 results, term stats, and phrase hits."""
    from tokenkit_spark.index.merge import merge_indexes
    from tokenkit_spark.index.query import phrase_search

    root = tmp_path_factory.mktemp("merge")
    half = F.col("doc_id") % 2 == 0  # split by parity: both shards populated
    build_index(spark, docs.filter(half), str(root / "base"), CFG, n_shards=4, n_buckets=4)
    build_index(spark, docs.filter(~half), str(root / "delta"), CFG, n_shards=4, n_buckets=4)
    build_index(spark, docs, str(root / "full"), CFG, n_shards=4, n_buckets=4)

    stats = merge_indexes(spark, str(root / "base"), str(root / "delta"), str(root / "merged"))
    merged = load_index(spark, str(root / "merged"))
    full = load_index(spark, str(root / "full"))
    assert stats["n_docs"] == full["stats"]["n_docs"]
    assert abs(stats["avgdl"] - full["stats"]["avgdl"]) < 1e-9

    a = bm25_segments(spark, merged, queries_df, CFG, k=10).collect()
    b = bm25_segments(spark, full, queries_df, CFG, k=10).collect()
    norm = lambda rows: sorted((r.query_id, r.rank, r.doc_id, round(r.score, 9)) for r in rows)
    assert norm(a) == norm(b)

    ts_a = {(r.term, r.df, r.cf) for r in merged["term_stats"].collect()}
    ts_b = {(r.term, r.df, r.cf) for r in full["term_stats"].collect()}
    assert ts_a == ts_b

    ph = spark.createDataFrame([(0, "data search"), (1, "the of")], "query_id long, text string")
    pa = sorted(map(tuple, phrase_search(spark, merged, ph, CFG).collect()))
    pb = sorted(map(tuple, phrase_search(spark, full, ph, CFG).collect()))
    assert pa == pb

    # mismatched layout must be rejected
    build_index(spark, docs.filter(half), str(root / "other"), CFG, n_shards=8, n_buckets=4)
    with pytest.raises(ValueError, match="layout mismatch"):
        merge_indexes(spark, str(root / "other"), str(root / "delta"), str(root / "bad"))

    # overlapping doc sets must be rejected (silent double-count otherwise)
    with pytest.raises(ValueError, match="disjoint"):
        merge_indexes(spark, str(root / "base"), str(root / "base"), str(root / "bad2"))


def test_delete_docs_equals_rebuild(spark, docs, queries_df, tmp_path_factory):
    """delete(full, odds) == fresh build on evens; then merging a delta of
    the odds back restores the full index exactly."""
    from tokenkit_spark.index.delete import delete_docs
    from tokenkit_spark.index.merge import merge_indexes
    from tokenkit_spark.index.query import phrase_search

    root = tmp_path_factory.mktemp("delete")
    odd = F.col("doc_id") % 2 == 1
    build_index(spark, docs, str(root / "full"), CFG, n_shards=4, n_buckets=4)
    build_index(spark, docs.filter(~odd), str(root / "evens"), CFG, n_shards=4, n_buckets=4)

    odd_ids = docs.filter(odd).select("doc_id")
    stats = delete_docs(spark, str(root / "full"), odd_ids, str(root / "deleted"))
    want = load_index(spark, str(root / "evens"))
    assert stats["n_deleted"] == docs.filter(odd).count()
    assert stats["n_docs"] == want["stats"]["n_docs"]
    assert abs(stats["avgdl"] - want["stats"]["avgdl"]) < 1e-9

    got = load_index(spark, str(root / "deleted"))
    norm = lambda rows: sorted((r.query_id, r.rank, r.doc_id, round(r.score, 9)) for r in rows)
    a = bm25_segments(spark, got, queries_df, CFG, k=10).collect()
    b = bm25_segments(spark, want, queries_df, CFG, k=10).collect()
    assert norm(a) == norm(b)
    assert {tuple(r) for r in got["term_stats"].collect()} == {
        tuple(r) for r in want["term_stats"].collect()
    }
    ph = spark.createDataFrame([(0, "data search"), (1, "the of")], "query_id long, text string")
    pa = sorted(map(tuple, phrase_search(spark, got, ph, CFG).collect()))
    pb = sorted(map(tuple, phrase_search(spark, want, ph, CFG).collect()))
    assert pa == pb

    # delete + merge round-trips to the original full index
    build_index(spark, docs.filter(odd), str(root / "odds"), CFG, n_shards=4, n_buckets=4)
    merge_indexes(spark, str(root / "deleted"), str(root / "odds"), str(root / "restored"))
    restored = load_index(spark, str(root / "restored"))
    full = load_index(spark, str(root / "full"))
    ra = bm25_segments(spark, restored, queries_df, CFG, k=10).collect()
    rb = bm25_segments(spark, full, queries_df, CFG, k=10).collect()
    assert norm(ra) == norm(rb)

    # deleting everything is an error
    with pytest.raises(ValueError, match="every document"):
        delete_docs(spark, str(root / "full"), docs.select("doc_id"), str(root / "none"))


def test_incremental_update_equals_rebuild(spark, docs, queries_df, tmp_path_factory):
    """Snapshot A -> B with adds, removes, AND text changes: the
    incremental pipeline (diff -> delete -> delta build -> merge) equals
    a fresh build on snapshot B."""
    from tokenkit_spark.index.incremental import diff_snapshots, incremental_update

    root = tmp_path_factory.mktemp("incr")
    slot = F.pmod(F.col("doc_id"), F.lit(10))  # doc_ids are hash-valued
    old = docs.filter(slot < 8)                # A: slots 0..7
    changed = (slot >= 4) & (slot < 6)         # slots 4,5 rewritten in B
    new = (
        docs.filter(slot >= 2)                 # B: drop slots 0,1; add 8,9
        .withColumn(
            "text",
            F.when(changed, F.concat(F.lit("rewritten page "), F.col("text"))).otherwise(
                F.col("text")
            ),
        )
    )
    n_added = docs.filter(slot >= 8).count()
    n_removed = docs.filter(slot < 2).count()
    n_changed = docs.filter(changed).count()
    assert n_added and n_removed and n_changed

    d = diff_snapshots(old, new)
    assert d["added"].count() == n_added
    assert d["removed"].count() == n_removed
    assert d["changed"].count() == n_changed

    build_index(spark, old, str(root / "base"), CFG, n_shards=4, n_buckets=4)
    stats = incremental_update(
        spark, str(root / "base"), old, new, str(root / "updated"), CFG
    )
    assert stats["n_added_or_changed"] == n_added + n_changed
    assert stats["n_removed_or_changed"] == n_removed + n_changed

    build_index(spark, new, str(root / "fresh"), CFG, n_shards=4, n_buckets=4)
    got = load_index(spark, str(root / "updated"))
    want = load_index(spark, str(root / "fresh"))
    assert abs(stats["avgdl"] - want["stats"]["avgdl"]) < 1e-9
    norm = lambda rows: sorted((r.query_id, r.rank, r.doc_id, round(r.score, 9)) for r in rows)
    a = bm25_segments(spark, got, queries_df, CFG, k=10).collect()
    b = bm25_segments(spark, want, queries_df, CFG, k=10).collect()
    assert norm(a) == norm(b)
    assert {tuple(r) for r in got["term_stats"].collect()} == {
        tuple(r) for r in want["term_stats"].collect()
    }


def test_facet_counts_match_brute(spark, docs, queries_df, index):
    """facet_counts over the full disjunctive match set equals a brute
    relational recompute (tokenize -> distinct (query, doc) matches ->
    join lang -> count), including that it is NOT top-k truncated."""
    from tokenkit_spark.index.query import facet_counts, matching_docs

    got = sorted(
        (r.query_id, r.lang, r.n_docs)
        for r in facet_counts(
            spark, index, queries_df, docs.select("doc_id", "lang"), "lang", CFG
        ).collect()
    )

    toks = docs.select(
        "doc_id", F.explode(F.split(F.lower("text"), r"\s+")).alias("term")
    ).filter(F.col("term") != "")
    qt = queries_df.select(
        "query_id", F.explode(F.split(F.lower("text"), r"\s+")).alias("term")
    ).distinct()
    want = sorted(
        (r.query_id, r.lang, r.n_docs)
        for r in toks.join(qt, "term")
        .select("query_id", "doc_id")
        .distinct()
        .join(docs.select("doc_id", "lang"), "doc_id")
        .groupBy("query_id", "lang")
        .agg(F.count(F.lit(1)).alias("n_docs"))
        .collect()
    )
    assert got == want
    assert got  # non-degenerate

    # the match set itself must exceed top-k for head-term queries
    m = matching_docs(spark, index, queries_df, CFG)
    n_head = m.filter(F.col("query_id") == 2).count()
    assert n_head > 10


def test_histogram_facet_matches_brute(spark, docs, queries_df, index):
    from tokenkit_spark.index.query import histogram_facet

    meta = docs.withColumn("n_chars", F.length("text")).select("doc_id", "n_chars")
    got = sorted(
        (r.query_id, r.bucket, r.n_docs)
        for r in histogram_facet(
            spark, index, queries_df, meta, "n_chars", 50.0, CFG
        ).collect()
    )
    toks = docs.select(
        "doc_id", F.explode(F.split(F.lower("text"), r"\s+")).alias("term")
    ).filter(F.col("term") != "")
    qt = queries_df.select(
        "query_id", F.explode(F.split(F.lower("text"), r"\s+")).alias("term")
    ).distinct()
    want = sorted(
        (r.query_id, r.bucket, r.n_docs)
        for r in toks.join(qt, "term").select("query_id", "doc_id").distinct()
        .join(meta, "doc_id")
        .groupBy("query_id", (F.floor(F.col("n_chars") / 50.0) * 50.0).alias("bucket"))
        .agg(F.count(F.lit(1)).alias("n_docs"))
        .collect()
    )
    assert got == want and got

    with pytest.raises(ValueError, match="bucket_width"):
        histogram_facet(spark, index, queries_df, meta, "n_chars", 0, CFG)


def test_filtered_matches_brute(spark, docs, queries_df, index):
    """Filtered search (ES filter context): only eligible docs may rank,
    scores are IDENTICAL to the unfiltered scores (filters don't score —
    df/avgdl/N stay corpus-global). Expected = full brute scoring
    restricted to the eligible set, re-ranked."""
    from pyspark.sql import functions as F

    from tokenkit_spark.index.query import bm25_brute, bm25_segments_filtered

    n_docs = docs.count()
    full = bm25_brute(docs, queries_df, CFG, k=n_docs).collect()
    for frac_mod, label in [(3, "sparse"), (1, "all")]:
        eligible = docs.filter(F.pmod(F.xxhash64("doc_id"), 7) < frac_mod).select("doc_id")
        el = {r.doc_id for r in eligible.collect()}
        by_q = {}
        for r in full:
            if r.doc_id in el:
                by_q.setdefault(r.query_id, []).append((round(-r.score, 9), r.doc_id))
        want = set()
        for q, rows in by_q.items():
            for rank, (negs, d) in enumerate(sorted(rows)[:10], start=1):
                want.add((q, rank, d, -negs))
        got = bm25_segments_filtered(spark, index, queries_df, eligible, CFG, k=10)
        got_set = {(r.query_id, r.rank, r.doc_id, round(r.score, 9)) for r in got.collect()}
        assert got_set == want, label


def test_filtered_empty_filter_returns_nothing(spark, queries_df, index):
    from tokenkit_spark.index.query import bm25_segments_filtered

    empty = spark.createDataFrame([], "doc_id long")
    got = bm25_segments_filtered(spark, index, queries_df, empty, CFG, k=10)
    assert got.count() == 0


@pytest.fixture(scope="module")
def docs_meta(docs):
    from pyspark.sql import functions as F

    # deterministic metadata: length + a coarse "site" group with ties
    return docs.select(
        "doc_id",
        F.length("text").alias("n_chars"),
        F.pmod(F.xxhash64("doc_id"), 13).alias("site"),
    ).cache()


def _brute_matches(docs, queries_df):
    """(query_id, doc_id) disjunctive match set via plain DataFrame ops."""
    from pyspark.sql import functions as F

    from tokenkit_spark.functions.udfs import tokenize_col
    from tokenkit_spark.index.query import analyze_queries

    toks = docs.select(
        "doc_id", F.explode(F.array_distinct(tokenize_col("text", CFG))).alias("term")
    )
    return analyze_queries(queries_df, CFG).join(toks, "term").select(
        "query_id", "doc_id"
    ).distinct()


def test_search_sorted_and_after_match_brute(spark, docs, queries_df, index, docs_meta):
    """Sort-by-field search: page 1 and the search_after page 2 must
    equal the brute match set sorted by the field (doc_id tiebreak) —
    and the cursor page must be EXACTLY rows k+1..2k of the full order."""
    from tokenkit_spark.index.query import search_sorted

    meta = {r.doc_id: r.n_chars for r in docs_meta.collect()}
    brute = _brute_matches(docs, queries_df).collect()
    by_q = {}
    for r in brute:
        by_q.setdefault(r.query_id, []).append((-meta[r.doc_id], r.doc_id))
    full = {q: sorted(rows) for q, rows in by_q.items()}

    k = 10
    got1 = search_sorted(spark, index, queries_df, docs_meta, "n_chars", False, k, config=CFG)
    want1 = {
        (q, i + 1, d, -neg)
        for q, rows in full.items()
        for i, (neg, d) in enumerate(rows[:k])
    }
    assert {(r.query_id, r.rank, r.doc_id, r.sort_val) for r in got1.collect()} == want1

    cursored = {q for q, rows in full.items() if len(rows) >= k}
    cursor = spark.createDataFrame(
        [(q, -full[q][k - 1][0], full[q][k - 1][1]) for q in cursored],
        "query_id long, after_val int, after_doc_id long",
    )
    got2 = search_sorted(spark, index, queries_df, docs_meta, "n_chars", False, k, cursor, config=CFG)
    # a query WITHOUT a cursor row gets page 1 (the ES no-search_after case)
    want2 = {
        (q, i + 1, d, -neg)
        for q, rows in full.items()
        for i, (neg, d) in enumerate(rows[k : 2 * k] if q in cursored else rows[:k])
    }
    assert {(r.query_id, r.rank, r.doc_id, r.sort_val) for r in got2.collect()} == want2


def test_collapse_search_matches_brute(spark, docs, queries_df, index, docs_meta):
    """Field collapsing: per query top-k groups, champion = best
    (rounded score desc, doc_id asc) within the group."""
    from tokenkit_spark.index.query import bm25_brute, collapse_search

    site = {r.doc_id: r.site for r in docs_meta.collect()}
    full = bm25_brute(docs, queries_df, CFG, k=docs.count(), round_digits=6).collect()
    champs = {}
    for r in full:
        key = (r.query_id, site[r.doc_id])
        cur = champs.get(key)
        cand = (-r.score, r.doc_id)
        if cur is None or cand < cur:
            champs[key] = cand
    by_q = {}
    for (q, s), (negs, d) in champs.items():
        by_q.setdefault(q, []).append((negs, d, s))
    want = {
        (q, i + 1, s, d, -negs)
        for q, rows in by_q.items()
        for i, (negs, d, s) in enumerate(sorted(rows)[:5])
    }
    got = collapse_search(spark, index, queries_df, docs_meta, "site", CFG, k=5, round_digits=6)
    got_set = {
        (r.query_id, r.rank, r.group_val, r.doc_id, round(r.score, 6)) for r in got.collect()
    }
    assert got_set == want


def test_function_score_matches_brute(spark, docs, queries_df, index, docs_meta):
    """field_value_factor: score * log1p(factor*field) re-ranks the FULL
    match set (a boosted doc outside the score-only top-k must be able
    to enter)."""
    import math

    from tokenkit_spark.index.query import bm25_brute, function_score

    meta = {r.doc_id: r.n_chars for r in docs_meta.collect()}
    full = bm25_brute(docs, queries_df, CFG, k=docs.count()).collect()
    by_q = {}
    for r in full:
        boosted = r.score * math.log1p(0.5 * meta[r.doc_id])
        by_q.setdefault(r.query_id, []).append((-round(boosted, 6), r.doc_id))
    want = {
        (q, i + 1, d, -neg)
        for q, rows in by_q.items()
        for i, (neg, d) in enumerate(sorted(rows)[:10])
    }
    got = function_score(
        spark, index, queries_df, docs_meta, "n_chars",
        factor=0.5, modifier="log1p", boost_mode="multiply",
        config=CFG, k=10, round_digits=6,
    )
    got_set = {(r.query_id, r.rank, r.doc_id, round(r.score, 6)) for r in got.collect()}
    assert got_set == want

    with pytest.raises(ValueError, match="modifier"):
        function_score(spark, index, queries_df, docs_meta, "n_chars", modifier="bogus")


def test_bm25_explain_components_sum_to_score(spark):
    """Explanation invariants: per-term contributions sum to the doc
    score, and the (query, rank, doc, score) frame equals bm25_brute."""
    from tokenkit_spark.index.query import bm25_brute, bm25_explain
    from tokenkit_spark.sources.pages import synth_pages, pages_to_docs

    docs = pages_to_docs(synth_pages(spark, n_docs=150, seed=11)).select(
        "doc_id", "text"
    )
    queries = spark.createDataFrame(
        [(0, "the data web"), (1, "search index"), (2, "missingterm")],
        "query_id long, text string",
    )
    exp = bm25_explain(docs, queries, k=5).collect()
    assert exp
    by_doc = {}
    for r in exp:
        by_doc.setdefault((r.query_id, r.rank, r.doc_id, r.score), 0.0)
        by_doc[(r.query_id, r.rank, r.doc_id, r.score)] += r.term_score
    for (qid, rank, doc, score), total in by_doc.items():
        assert abs(total - score) < 1e-3, (qid, doc, total, score)
    brute = {
        (r.query_id, r.rank, r.doc_id, r.score)
        for r in bm25_brute(docs, queries, k=5, round_digits=4).collect()
    }
    assert set(by_doc) == brute


def test_rescore_phrase_promotes_phrase_matches(spark):
    """A doc containing the exact phrase outranks a higher-BM25 doc
    that only has the terms scattered, once the rescore window applies
    the phrase bonus."""
    from tokenkit_spark.index.query import rescore_phrase

    docs = spark.createDataFrame(
        [
            (0, "sort merge sort merge sort merge join somewhere"),  # scattered-ish, high tf
            (1, "a sort merge join here"),                            # exact phrase once
            (2, "join the sort and the merge"),                       # scattered
            (3, "unrelated words only"),
        ],
        "doc_id long, text string",
    )
    queries = spark.createDataFrame(
        [(0, "sort merge join")], "query_id long, text string"
    )
    out = {r.rank: r for r in rescore_phrase(docs, queries, k=4, window=4).collect()}
    # doc 0 also contains the phrase "sort merge join"? tokens:
    # [sort, merge, sort, merge, sort, merge, join, somewhere] — windows
    # ...(sort, merge, join) at position 5 -> phrase_tf 1; doc 1 has 1 too.
    by_doc = {r.doc_id: r for r in out.values()}
    assert by_doc[1].phrase_tf == 1 and by_doc[0].phrase_tf == 1
    assert 3 not in by_doc  # no matching term -> never retrieved
    assert by_doc[2].phrase_tf == 0
    # phrase docs outrank the scattered doc 2 despite doc 2 matching all terms
    assert out[1].doc_id in (0, 1) and out[2].doc_id in (0, 1)
    assert by_doc[2].final == by_doc[2].bm25  # no bonus


def test_decay_score_matches_brute(spark, docs, queries_df, index, docs_meta):
    """Gauss decay: score * exp(-dist^2 / 2sigma^2) with the ES decay
    contract (origin/scale/decay); verified against a driver-side
    recomputation over the exhaustive brute-force match set."""
    import math

    from tokenkit_spark.index.query import bm25_brute, decay_score

    origin, scale, decay = 300.0, 150.0, 0.5
    sigma_sq = -(scale * scale) / (2.0 * math.log(decay))
    meta = {r.doc_id: r.n_chars for r in docs_meta.collect()}
    full = bm25_brute(docs, queries_df, CFG, k=docs.count()).collect()
    by_q = {}
    for r in full:
        dist = max(0.0, abs(meta[r.doc_id] - origin))
        boosted = r.score * math.exp(-(dist * dist) / (2.0 * sigma_sq))
        by_q.setdefault(r.query_id, []).append((-round(boosted, 6), r.doc_id))
    want = {
        (q, i + 1, d, -neg)
        for q, rows in by_q.items()
        for i, (neg, d) in enumerate(sorted(rows)[:10])
    }
    got = decay_score(
        spark, index, queries_df, docs_meta, "n_chars",
        origin=origin, scale=scale, decay=decay, fn="gauss",
        config=CFG, k=10, round_digits=6,
    )
    got_set = {(r.query_id, r.rank, r.doc_id, round(r.score, 6)) for r in got.collect()}
    assert got_set == want


def test_decay_score_linear_and_validation(spark, docs, queries_df, index, docs_meta):
    """linear decay clips to zero beyond s = scale/(1-decay); bad args raise."""
    from tokenkit_spark.index.query import decay_score

    got = decay_score(
        spark, index, queries_df, docs_meta, "n_chars",
        origin=0.0, scale=10.0, decay=0.5, fn="linear",
        config=CFG, k=10, round_digits=6,
    )
    # s = 20: every doc with n_chars >= 20 decays to exactly 0
    meta = {r.doc_id: r.n_chars for r in docs_meta.collect()}
    for r in got.collect():
        if meta[r.doc_id] >= 20:
            assert r.score == 0.0
    with pytest.raises(ValueError, match="decay function"):
        decay_score(spark, index, queries_df, docs_meta, "n_chars",
                    origin=0, scale=10, fn="bogus")
    with pytest.raises(ValueError, match="scale"):
        decay_score(spark, index, queries_df, docs_meta, "n_chars",
                    origin=0, scale=-1)


def test_top_hits_facet_matches_brute(spark, docs, queries_df, index, docs_meta):
    """terms+top_hits agg: per (query, site) top-2 matches by n_chars
    desc, doc_id asc — equals a driver-side recomputation over the
    brute match set."""
    from tokenkit_spark.index.query import top_hits_facet

    meta = {r.doc_id: (r.site, r.n_chars) for r in docs_meta.collect()}
    matches = _brute_matches(docs, queries_df).collect()
    buckets = {}
    for r in matches:
        site, n_chars = meta[r.doc_id]
        buckets.setdefault((r.query_id, site), []).append((-n_chars, r.doc_id))
    want = {
        (q, s, i + 1, d, -negn)
        for (q, s), rows in buckets.items()
        for i, (negn, d) in enumerate(sorted(rows)[:2])
    }
    got = top_hits_facet(
        spark, index, queries_df, docs_meta, "site", "n_chars", k=2, config=CFG
    )
    got_set = {
        (r.query_id, r.site, r.hit_rank, r.doc_id, r.n_chars) for r in got.collect()
    }
    assert got_set == want


def test_complete_terms_prefix_and_ranking(spark, index):
    """Completion suggester: startswith candidates, df-desc/term-asc
    rank, no-match prefixes yield no rows — cross-checked against the
    collected dictionary."""
    from tokenkit_spark.index.query import complete_terms

    dictionary = [(r.term, r.df) for r in index["term_stats"].select("term", "df").collect()]
    prefixes = spark.createDataFrame(
        [(0, "s"), (1, "zzzqq")], "query_id long, prefix string"
    )
    got = complete_terms(spark, index, prefixes, n=3).collect()
    want = sorted(
        [(t, d) for t, d in dictionary if t.startswith("s")],
        key=lambda td: (-td[1], td[0]),
    )[:3]
    got0 = [(r.term, r.df) for r in sorted(got, key=lambda r: r.rank) if r.query_id == 0]
    assert got0 == want
    assert all(r.query_id != 1 for r in got)


def test_index_stats_match_raw_text(spark, docs, index):
    """The compressed store's global aggregates equal a raw-text
    recomputation — lost postings or doubled segments would diverge."""
    from pyspark.sql import functions as F

    from tokenkit_spark.index.build import index_stats, shard_manifest_stats
    from tokenkit_spark.functions.udfs import tokenize_col

    toks = docs.select("doc_id", F.explode(tokenize_col("text", CFG)).alias("term"))
    want_postings = toks.select("term", "doc_id").distinct().count()
    want_tokens = toks.count()
    want_terms = toks.select("term").distinct().count()
    got = index_stats(spark, index).collect()[0]
    assert got.n_terms == want_terms
    assert got.n_postings == want_postings
    assert got.total_tokens == want_tokens
    assert got.n_docs == 600
    sm = shard_manifest_stats(spark, index).collect()
    assert len(sm) == 8 and all(r.status == "done" for r in sm)
    assert sum(r.n_postings for r in sm) == want_postings


def test_rank_feature_matches_brute(spark, docs, queries_df, index, docs_meta):
    """ES rank_feature (saturation): BM25 + boost * x/(x+pivot) re-ranks
    the FULL match set; a short-text doc with a huge feature value must
    be able to enter the top-k from outside the score-only cut."""
    from tokenkit_spark.index.query import bm25_brute, rank_feature_search

    meta = {r.doc_id: r.n_chars for r in docs_meta.collect()}
    full = bm25_brute(docs, queries_df, CFG, k=docs.count()).collect()
    by_q = {}
    for r in full:
        feat = meta[r.doc_id] / (meta[r.doc_id] + 100.0)
        by_q.setdefault(r.query_id, []).append(
            (-round(r.score + 2.0 * feat, 6), r.doc_id)
        )
    want = {
        (q, i + 1, d, -neg)
        for q, rows in by_q.items()
        for i, (neg, d) in enumerate(sorted(rows)[:10])
    }
    got = rank_feature_search(
        spark, index, queries_df, docs_meta, "n_chars",
        fn="saturation", pivot=100.0, boost=2.0,
        config=CFG, k=10, round_digits=6,
    )
    got_set = {(r.query_id, r.rank, r.doc_id, round(r.score, 6)) for r in got.collect()}
    assert got_set == want

    with pytest.raises(ValueError, match="unknown function"):
        rank_feature_search(
            spark, index, queries_df, docs_meta, "n_chars", fn="bogus"
        )


def test_rank_feature_log_and_sigmoid_formulas(spark, docs, queries_df, index, docs_meta):
    """The log and sigmoid variants apply the documented ES formulas."""
    import math

    from tokenkit_spark.index.query import bm25_brute, rank_feature_search

    meta = {r.doc_id: r.n_chars for r in docs_meta.collect()}
    base = {
        (r.query_id, r.doc_id): r.score
        for r in bm25_brute(docs, queries_df, CFG, k=docs.count()).collect()
    }
    got_log = rank_feature_search(
        spark, index, queries_df, docs_meta, "n_chars",
        fn="log", scaling_factor=0.1, config=CFG, k=5, round_digits=6,
    ).collect()
    for r in got_log:
        want = base[(r.query_id, r.doc_id)] + math.log(1 + 0.1 * meta[r.doc_id])
        assert abs(r.score - round(want, 6)) < 1e-9
    got_sig = rank_feature_search(
        spark, index, queries_df, docs_meta, "n_chars",
        fn="sigmoid", pivot=200.0, exponent=2.0, config=CFG, k=5, round_digits=6,
    ).collect()
    for r in got_sig:
        xe = meta[r.doc_id] ** 2.0
        want = base[(r.query_id, r.doc_id)] + xe / (xe + 200.0**2.0)
        assert abs(r.score - round(want, 6)) < 1e-9


def test_pinned_search_contract(spark, docs, queries_df, index):
    """ES pinned query: pinned ids rank 1..p in the SUPPLIED order for
    every query (matching or not, score NULL), organic follows with
    pinned docs removed, ranks contiguous 1..k."""
    from tokenkit_spark.index.query import bm25_brute, pinned_search

    pins = [17, 3, 99]
    got = pinned_search(
        spark, index, queries_df, pins, config=CFG, k=10, round_digits=6
    ).collect()
    organic = bm25_brute(docs, queries_df, CFG, k=docs.count(), round_digits=6).collect()
    by_q = {}
    for r in organic:
        if r.doc_id not in pins:
            by_q.setdefault(r.query_id, []).append((-r.score, r.doc_id))
    for q in {r.query_id for r in got}:
        rows = sorted(
            [r for r in got if r.query_id == q], key=lambda r: r.rank
        )
        # ranks contiguous from 1
        assert [r.rank for r in rows] == list(range(1, len(rows) + 1))
        # pinned section: supplied order, NULL scores
        assert [r.doc_id for r in rows[:3]] == pins
        assert all(r.score is None for r in rows[:3])
        # organic section: brute order minus pinned
        want = [d for _, d in sorted(by_q.get(q, []))[:7]]
        assert [r.doc_id for r in rows[3:]] == want
        assert all(r.score is not None for r in rows[3:])


def test_significant_text_filter_duplicate_text(spark, queries_df):
    """filter_duplicate_text: a text duplicated 50x contributes ONCE to
    foreground and background stats — without the filter its terms
    dominate the JLH ranking, with it they score as one doc."""
    from tokenkit_spark.index.query import significant_terms, significant_text

    base = [(i, f"data search engine page{i} crawl") for i in range(20)]
    dups = [(100 + i, "data boilerplatemirror spamterm") for i in range(50)]
    docs = spark.createDataFrame(base + dups, "doc_id long, text string")
    q = spark.createDataFrame([(0, "data")], "query_id long, text string")

    unfiltered = significant_text(docs, q, CFG, n=5, filter_duplicate_text=False)
    filt = significant_text(docs, q, CFG, n=5, filter_duplicate_text=True)
    un = {r.term: r for r in unfiltered.collect()}
    fi = {r.term: r for r in filt.collect()}
    # duplicated, the mirror terms flood the match set
    assert un["boilerplatemirror"].fg_df == 50
    # filtered, the whole mirror family collapses to one surviving doc
    assert fi["boilerplatemirror"].fg_df == 1
    assert fi["boilerplatemirror"].fg_size == 21  # 20 distinct + 1 survivor

    # with no duplicates, filter on/off is a no-op equal to significant_terms
    docs_uniq = spark.createDataFrame(base, "doc_id long, text string")
    a = significant_text(docs_uniq, q, CFG, n=5, filter_duplicate_text=True).collect()
    b = significant_terms(docs_uniq, q, CFG, n=5).collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))


def test_significant_terms_heuristics_hand_computed(spark):
    """chi_square / mutual_information / gnd on a tiny corpus with a
    hand-computed 2x2 contingency (background_is_superset adjustment)."""
    import math

    from tokenkit_spark.index.query import significant_terms

    # 10 docs; "apple" in docs 0-3; query 'apple' matches docs 0-3.
    # "pie" in docs 0-2 and 8 (bg_df=4, fg_df=3).
    rows = []
    for i in range(10):
        words = [f"filler{i}"]
        if i <= 3:
            words.append("apple")
        if i <= 2 or i == 8:
            words.append("pie")
        rows.append((i, " ".join(words)))
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    q = spark.createDataFrame([(0, "apple")], "query_id long, text string")

    # cells for term "pie": n11=3, n10=1, n01=1, n00=5, N=10
    n11, n10, n01, n00, N = 3.0, 1.0, 1.0, 5.0, 10.0
    chi = {r.term: r.score for r in significant_terms(
        docs, q, CFG, n=20, heuristic="chi_square").collect()}
    want_chi = N * (n11 * n00 - n10 * n01) ** 2 / (
        (n11 + n01) * (n11 + n10) * (n01 + n00) * (n10 + n00)
    )
    assert chi["pie"] == round(want_chi, 6)

    mi = {r.term: r.score for r in significant_terms(
        docs, q, CFG, n=20, heuristic="mutual_information").collect()}
    def cell(nxy, nx_, n_y):
        return 0.0 if nxy == 0 else (nxy / N) * math.log2(N * nxy / (nx_ * n_y))
    want_mi = (
        cell(n11, n11 + n10, n11 + n01) + cell(n10, n11 + n10, n10 + n00)
        + cell(n01, n01 + n00, n11 + n01) + cell(n00, n01 + n00, n10 + n00)
    )
    assert mi["pie"] == round(want_mi, 6)

    gnd = significant_terms(docs, q, CFG, n=20, heuristic="gnd").collect()
    by_term = {r.term: r for r in gnd}
    fx, fy, fxy = n11 + n10, n11 + n01, n11
    want_gnd = (max(math.log(fx), math.log(fy)) - math.log(fxy)) / (
        math.log(N) - min(math.log(fx), math.log(fy))
    )
    assert by_term["pie"].score == round(want_gnd, 6)
    # gnd ranks ASCENDING: "apple" itself has distance 0 and ranks first
    assert min(gnd, key=lambda r: r.rank).term == "apple"
    assert by_term["apple"].score == 0.0

    with pytest.raises(ValueError, match="unknown heuristic"):
        significant_terms(docs, q, CFG, heuristic="bogus")


def test_distance_feature_matches_brute(spark, docs, queries_df, index, docs_meta):
    """ES distance_feature: BM25 + boost*pivot/(pivot+|x-origin|) over
    the FULL match set (numeric kind drives the formula check; the date
    kind is the same arithmetic after cast-to-seconds)."""
    from tokenkit_spark.index.query import bm25_brute, distance_feature_search

    meta = {r.doc_id: r.n_chars for r in docs_meta.collect()}
    full = bm25_brute(docs, queries_df, CFG, k=docs.count()).collect()
    by_q = {}
    for r in full:
        feat = 3.0 * 50.0 / (50.0 + abs(meta[r.doc_id] - 800.0))
        by_q.setdefault(r.query_id, []).append(
            (-round(r.score + feat, 6), r.doc_id)
        )
    want = {
        (q, i + 1, d, -neg)
        for q, rows in by_q.items()
        for i, (neg, d) in enumerate(sorted(rows)[:10])
    }
    got = distance_feature_search(
        spark, index, queries_df, docs_meta, "n_chars",
        origin=800.0, pivot=50.0, boost=3.0, kind="numeric",
        config=CFG, k=10, round_digits=6,
    )
    got_set = {(r.query_id, r.rank, r.doc_id, round(r.score, 6)) for r in got.collect()}
    assert got_set == want

    with pytest.raises(ValueError, match="unknown kind"):
        distance_feature_search(
            spark, index, queries_df, docs_meta, "n_chars",
            origin=0, pivot=1.0, kind="bogus",
        )
