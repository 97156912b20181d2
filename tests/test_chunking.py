"""Chunking tests: window boundaries, overlap reconstruction, edges."""

import pytest
from pyspark.sql import Row

from tokenkit_spark.ops import chunking


def _chunks(spark, text, chunk_size, overlap):
    df = spark.createDataFrame([Row(doc_id=0, text=text)])
    rows = chunking.chunk_documents(df, chunk_size, overlap).collect()
    return sorted(rows, key=lambda r: r.chunk_id)


def test_exact_multiple(spark):
    text = " ".join(f"t{i}" for i in range(8))
    rows = _chunks(spark, text, chunk_size=4, overlap=0)
    assert [(r.start_tok, r.n_tokens) for r in rows] == [(0, 4), (4, 4)]
    assert rows[0].chunk_text == "t0 t1 t2 t3"
    assert rows[1].chunk_text == "t4 t5 t6 t7"


def test_overlap_windows(spark):
    text = " ".join(f"t{i}" for i in range(10))
    rows = _chunks(spark, text, chunk_size=4, overlap=2)  # stride 2
    # last start is 6: chunk [6,10) reaches the end, so a start at 8
    # (a strict subset of it) must not exist
    assert [r.start_tok for r in rows] == [0, 2, 4, 6]
    assert rows[-1].n_tokens == 4
    # every token is covered by >= 1 chunk, in order
    covered = set()
    for r in rows:
        covered.update(range(r.start_tok, r.start_tok + r.n_tokens))
    assert covered == set(range(10))


def test_short_and_empty_docs(spark):
    rows = _chunks(spark, "one two", chunk_size=128, overlap=32)
    assert len(rows) == 1 and rows[0].n_tokens == 2
    assert _chunks(spark, "   ", chunk_size=4, overlap=0) == []


def test_validation(spark):
    df = spark.createDataFrame([Row(doc_id=0, text="a b")])
    with pytest.raises(ValueError):
        chunking.chunk_documents(df, chunk_size=0)
    with pytest.raises(ValueError):
        chunking.chunk_documents(df, chunk_size=4, overlap=4)


def test_no_subset_tail_chunk(spark):
    # n=100 < chunk_size: exactly ONE chunk (old code emitted a second
    # chunk of tokens 96..99, a strict subset of chunk 0)
    rows = _chunks(spark, " ".join(f"t{i}" for i in range(100)), 128, 32)
    assert len(rows) == 1 and rows[0].n_tokens == 100
    # n=200 > chunk_size: chunk 0 covers 0..128, chunk 96 covers 96..200;
    # a third start at 192 would add nothing and must not exist
    rows = _chunks(spark, " ".join(f"t{i}" for i in range(200)), 128, 32)
    assert [r.start_tok for r in rows] == [0, 96]
    assert rows[-1].start_tok + rows[-1].n_tokens == 200
