"""Session-L batch 35: embedding QA, stemming collisions, lastmod
trust."""

import math

import pytest
from pyspark.sql import functions as F


def test_embedding_quality_audit(spark):
    from tokenkit_spark.ops.similarity import embedding_quality_audit

    emb = spark.createDataFrame(
        [
            (0, [3.0, 4.0]),          # norm 5
            (1, [0.0, 0.0]),          # zero vector
            (2, [1.0, 0.0]),          # norm 1
            (3, [float("nan"), 1.0]),
        ],
        "vec_id long, embedding array<double>",
    )
    r = embedding_quality_audit(emb).collect()[0]
    assert r.n_vecs == 4
    assert r.n_dim_values == 1 and r.min_dims == 2
    assert r.n_near_zero == 1
    assert r.n_nan == 1


def test_stemming_collisions(spark):
    from tokenkit_spark.index.termdict import stemming_collision_audit

    docs = spark.createDataFrame(
        [(0, "cat cats pony ponies glass glasses run")],
        "doc_id long, text string",
    )
    r = stemming_collision_audit(docs).collect()[0]
    # vocab: cat cats pony ponies glass glasses run (7 terms)
    # stems: cat<-{cat,cats}, poni<-{ponies}, pony<-{pony},
    # glass<-{glass}, glasse<-{glasses->'glasse'? no: 'glasses'
    # ends 'sses' -> 'glass'}; so glass<-{glass, glasses}; run
    assert r.n_terms == 7
    assert r.n_stems == 5  # cat, pony, poni, glass, run
    assert r.n_collision_stems == 2  # cat, glass
    assert r.max_variants == 2
    # compression 1 - n_stems/n_terms = 1 - 5/7 is derivable


def test_lastmod_trust(spark):
    from tokenkit_spark.ops.recrawl import lastmod_trust_audit

    rows = [("sticky", "2026-01-01")] * 10
    rows += [("varied", f"2026-01-{d:02d}") for d in range(1, 11)]
    rows += [("single", "2026-02-01")]
    e = spark.createDataFrame(rows, "host string, lastmod string")
    out = {r.host: r for r in lastmod_trust_audit(e).collect()}
    s = out["sticky"]
    assert s.all_same and s.suspicious
    assert s.modal_count == s.n_entries == 10
    v = out["varied"]
    assert not v.all_same and not v.suspicious
    assert v.modal_count == 1 and v.n_entries == 10
    # a single entry is not "all same" evidence
    assert not out["single"].all_same and not out["single"].suspicious
