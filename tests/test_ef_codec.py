"""Elias-Fano live segment codec (doc_codec="ef"): build/query parity
with the varint codec, per-row hybrid (short lists stay varint), block
decode, merge back to varint, and size win on dense lists."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from tokenkit_spark import AnalyzerConfig
from tokenkit_spark.index import codec
from tokenkit_spark.index.build import build_index, load_index
from tokenkit_spark.index.query import bm25_segments

CFG = AnalyzerConfig(strategy="whitespace", lowercase=True)


def _corpus(spark, n=600):
    # head term on every doc (multi-block list), mid + unique tails
    rows = [
        (
            i,
            "common "
            + ("mid " if i % 3 == 0 else "")
            + f"tail{i} filler{i % 7}",
        )
        for i in range(n)
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def _queries(spark):
    return spark.createDataFrame(
        [(0, "common mid"), (1, "common tail7"), (2, "mid filler3")],
        "query_id long, text string",
    )


@pytest.fixture(scope="module")
def indexes(spark, tmp_path_factory):
    base = tmp_path_factory.mktemp("efidx")
    docs = _corpus(spark)
    build_index(spark, docs, str(base / "v"), CFG, n_shards=2,
                n_buckets=4, resume=False)
    build_index(spark, docs, str(base / "e"), CFG, n_shards=2,
                n_buckets=4, resume=False, doc_codec="ef")
    return load_index(spark, str(base / "v")), load_index(
        spark, str(base / "e")
    )


def test_ef_build_marks_long_lists_only(indexes):
    _, ef_index = indexes
    rows = ef_index["segments"].select("codec", "n_postings").collect()
    assert {r.codec for r in rows} == {"varint", "ef"}
    for r in rows:
        if r.n_postings >= codec.EF_MIN_POSTINGS:
            assert r.codec == "ef"
        else:
            assert r.codec == "varint"


def test_ef_query_parity(spark, indexes):
    v_index, ef_index = indexes
    qdf = _queries(spark)
    a = sorted(
        (r.query_id, r.rank, r.doc_id, r.score)
        for r in bm25_segments(spark, v_index, qdf, CFG, k=10).collect()
    )
    b = sorted(
        (r.query_id, r.rank, r.doc_id, r.score)
        for r in bm25_segments(spark, ef_index, qdf, CFG, k=10).collect()
    )
    assert a == b and len(a) > 0


def test_ef_decode_roundtrip_and_blocks(indexes):
    _, ef_index = indexes
    row = (
        ef_index["segments"]
        .filter(F.col("codec") == "ef")
        .orderBy(F.col("n_postings").desc())
        .limit(1)
        .collect()[0]
    )
    ids, tfs, dls = codec.decode_posting_list(row)
    assert ids.size == row.n_postings
    assert np.all(np.diff(ids) > 0)
    # per-block decode agrees with the full decode
    for b in range(len(row.block_last)):
        got, gtf, gdl = codec.decode_block(
            bytes(row.doc_ids_blob), bytes(row.tfs_blob),
            bytes(row.dls_blob), int(row.n_postings),
            list(row.block_doc_off), list(row.block_tf_off),
            list(row.block_dl_off), list(row.block_last), b,
            codec="ef",
        )
        lo = b * codec.BLOCK_SIZE
        hi = min(lo + codec.BLOCK_SIZE, int(row.n_postings))
        assert np.array_equal(got, ids[lo:hi])


def test_ef_smaller_doc_blobs_on_dense_lists(indexes):
    v_index, ef_index = indexes
    v = {
        r.term: len(r.doc_ids_blob)
        for r in v_index["segments"]
        .filter(F.col("n_postings") >= codec.EF_MIN_POSTINGS)
        .select("term", "doc_ids_blob").collect()
    }
    e = {
        r.term: len(r.doc_ids_blob)
        for r in ef_index["segments"]
        .filter(F.col("codec") == "ef")
        .select("term", "doc_ids_blob").collect()
    }
    assert e and set(e) <= set(v)
    total_v = sum(v[t] for t in e)
    total_e = sum(e.values())
    assert total_e < total_v  # dense doc-id lists shrink under EF


def test_ef_merge_mixed_codecs(spark, tmp_path):
    """Merging two EF-built indexes decodes the EF rows correctly and
    re-encodes varint; the merged index answers rank-identically to a
    single build over the union corpus."""
    from tokenkit_spark.index.merge import merge_indexes

    a = _corpus(spark, 300)
    b = _corpus(spark, 600).filter(F.col("doc_id") >= 300)
    u = a.unionByName(b)
    pa, pb, pm, pu = (str(tmp_path / x) for x in "abmu")
    for docs, path in ((a, pa), (b, pb)):
        build_index(spark, docs, path, CFG, n_shards=2, n_buckets=4,
                    resume=False, doc_codec="ef")
    build_index(spark, u, pu, CFG, n_shards=2, n_buckets=4,
                resume=False)
    merge_indexes(spark, pa, pb, pm)
    qdf = _queries(spark)
    merged = load_index(spark, pm)
    ref = load_index(spark, pu)
    got = sorted(
        (r.query_id, r.rank, r.doc_id, round(r.score, 9))
        for r in bm25_segments(spark, merged, qdf, CFG, k=10).collect()
    )
    want = sorted(
        (r.query_id, r.rank, r.doc_id, round(r.score, 9))
        for r in bm25_segments(spark, ref, qdf, CFG, k=10).collect()
    )
    assert got == want and len(got) > 0
