"""Session-L batch 30: pass@k, majority vote, URL extension mix."""

import math

import pytest
from pyspark.sql import functions as F


def test_pass_at_k_matches_combinatorial(spark):
    from tokenkit_spark.ops.passk import pass_at_k

    # task A: 20 samples 5 correct; task B: 20 samples 0 correct;
    # task C: 10 samples 10 correct (certain at every k)
    tasks = spark.createDataFrame(
        [(20, 5), (20, 0), (10, 10)], "n long, c long"
    )
    out = {r.k: r for r in pass_at_k(tasks).collect()}

    def exact(n, c, k):
        if n - c < k:
            return 1.0
        return 1.0 - math.comb(n - c, k) / math.comb(n, k)

    for k in (1, 5, 10):
        want = (exact(20, 5, k) + exact(20, 0, k) + exact(10, 10, k)) / 3
        got = out[k].sum_pass_e12 / out[k].n_tasks / 1e12
        assert got == pytest.approx(want, abs=1e-6)
    assert out[1].n_certain == 1
    assert out[10].n_certain == 1
    # pass@k is monotone in k
    assert (out[10].sum_pass_e12 > out[5].sum_pass_e12
            > out[1].sum_pass_e12)


def test_majority_vote_sharpens_above_half(spark):
    from tokenkit_spark.ops.passk import majority_vote_accuracy

    # p=0.7 improves with voting; p=0.3 degrades; p=0.5 stays
    tasks = spark.createDataFrame(
        [(10, 7), (10, 3), (10, 5)], "n long, c long"
    )
    out = {r.k: r for r in majority_vote_accuracy(tasks).collect()}
    assert out[1].mean_maj == pytest.approx(0.5, abs=1e-6)
    # maj@5 for p=.7: sum_{j=3..5} C(5,j).7^j.3^(5-j)
    maj5 = lambda p: sum(
        math.comb(5, j) * p**j * (1 - p) ** (5 - j) for j in (3, 4, 5)
    )
    want = (maj5(0.7) + maj5(0.3) + maj5(0.5)) / 3
    assert out[5].mean_maj == pytest.approx(want, abs=1e-6)
    assert out[1].gain_vs_1 == pytest.approx(0.0, abs=1e-6)


def test_url_extension_mix_classes(spark):
    from tokenkit_spark.ops.domains import url_extension_mix

    urls = spark.createDataFrame(
        [
            ("h", "/index.html"),
            ("h", "/about"),            # extensionless -> page
            ("h", "/report.pdf"),
            ("h", "/logo.PNG"),         # case-insensitive
            ("h", "/app.js"),
            ("h", "/feed.xml"),
            ("h", "/archive.tar.gz"),   # gz -> other
            ("h", "/v1.2"),             # numeric ext -> other
        ],
        "host string, path string",
    )
    r = url_extension_mix(urls).collect()[0]
    assert r.n_urls == 8
    assert r.n_page == 2 and r.n_doc == 1 and r.n_image == 1
    assert r.n_asset == 1 and r.n_data == 1 and r.n_other == 2
    # page share n_page/n_urls = 2/8
    assert r.n_page * 4 == r.n_urls
