"""Recall-vs-exact bounds for the three structurally rows-only
near-dup operators (VERDICT r04 item 4): MinHash+LSH and SimHash use
64-bit wraparound / SipHash kernels that no ANSI-SQL oracle can
replay, so their value-level guarantee is pinned HERE instead — LSH
candidate recall against the exact similarity computed independently
in numpy, on a corpus with planted near-duplicates."""

import numpy as np
import pytest

from tokenkit_spark.ops import dedup


def _shingles(text: str, k: int = 5) -> set:
    return {text[i : i + k] for i in range(len(text) - k + 1)}


def _jaccard(a: str, b: str, k: int = 5) -> float:
    sa, sb = _shingles(a, k), _shingles(b, k)
    return len(sa & sb) / max(len(sa | sb), 1)


def _corpus():
    """40 base docs + a perturbed copy each: copies mutate ~5% of the
    words, giving char-5-shingle Jaccard mostly >= 0.6; unrelated base
    docs share almost nothing. Deterministic (seeded rng)."""
    rng = np.random.default_rng(42)
    vocab = [f"w{i:03d}" for i in range(300)]
    rows = []
    for d in range(40):
        words = [vocab[x] for x in rng.integers(0, 300, size=60)]
        rows.append((2 * d, " ".join(words)))
        mutated = list(words)
        for pos in rng.integers(0, 60, size=3):
            mutated[int(pos)] = vocab[int(rng.integers(0, 300))]
        rows.append((2 * d + 1, " ".join(mutated)))
    return rows


@pytest.fixture(scope="module")
def planted(spark):
    rows = _corpus()
    df = spark.createDataFrame(rows, "doc_id long, text string")
    return rows, df


class TestMinhashRecall:
    def test_recall_of_planted_pairs(self, planted):
        rows, df = planted
        texts = dict(rows)
        cand = {
            (r.doc_id_a, r.doc_id_b)
            for r in dedup.minhash_candidates(
                df, num_perm=64, bands=16
            ).collect()
        }
        planted_pairs = [
            (2 * d, 2 * d + 1)
            for d in range(40)
            if _jaccard(texts[2 * d], texts[2 * d + 1]) >= 0.7
        ]
        assert len(planted_pairs) >= 20  # the corpus really plants dups
        found = sum(1 for p in planted_pairs if p in cand)
        recall = found / len(planted_pairs)
        # 16 bands x 4 rows: P(candidate | J=0.7) = 1-(1-0.7^4)^16 ~ 0.99
        assert recall >= 0.9, f"minhash recall {recall:.2f} < 0.9"

    def test_precision_against_exact_jaccard(self, planted):
        """Candidates that share >= half the bands are really similar:
        verify against the independent numpy Jaccard — the value-level
        check standing in for the impossible SQL oracle."""
        rows, df = planted
        texts = dict(rows)
        strong = [
            r
            for r in dedup.minhash_candidates(
                df, num_perm=64, bands=16
            ).collect()
            if r.n_shared_bands >= 8
        ]
        assert strong, "expected some strong candidates"
        for r in strong:
            j = _jaccard(texts[r.doc_id_a], texts[r.doc_id_b])
            assert j >= 0.4, (
                f"pair ({r.doc_id_a},{r.doc_id_b}) shares "
                f"{r.n_shared_bands}/16 bands but exact J={j:.2f}"
            )

    def test_unrelated_pairs_mostly_absent(self, planted):
        rows, df = planted
        cand = {
            (r.doc_id_a, r.doc_id_b)
            for r in dedup.minhash_candidates(
                df, num_perm=64, bands=16
            ).collect()
        }
        cross = [(2 * a, 2 * b) for a in range(40) for b in range(40) if a < b]
        noise = sum(1 for p in cross if p in cand)
        assert noise / len(cross) <= 0.02


class TestSimhashRecall:
    def test_pigeonhole_guarantee(self, planted):
        """The 4-rotation 16-bit banding is recall-COMPLETE for
        hamming <= 3 (pigeonhole: <= 3 flipped bits cannot touch all
        four 16-bit bands). Compute exact hammings from the signatures
        and assert every <= 3 pair is a candidate."""
        rows, df = planted
        from pyspark.sql import functions as F

        sigs = {
            r.doc_id: r.sim
            for r in df.select(
                "doc_id", dedup.simhash_udf()(F.col("text")).alias("sim")
            ).collect()
        }
        ids = sorted(sigs)
        close = [
            (a, b)
            for i, a in enumerate(ids)
            for b in ids[i + 1 :]
            if bin((sigs[a] ^ sigs[b]) & 0xFFFFFFFFFFFFFFFF).count("1") <= 3
        ]
        assert close, "corpus should contain hamming<=3 pairs"
        cand = {
            (r.doc_id_a, r.doc_id_b)
            for r in dedup.simhash_candidates(df).collect()
        }
        missing = [p for p in close if p not in cand]
        assert not missing, f"hamming<=3 pairs missed: {missing}"

    def test_identical_docs_hamming_zero(self, spark):
        df = spark.createDataFrame(
            [(0, "alpha beta gamma delta"), (1, "alpha beta gamma delta"),
             (2, "totally different words here")],
            "doc_id long, text string",
        )
        ham = {
            (r.doc_id_a, r.doc_id_b): r.hamming
            for r in dedup.simhash_candidates(df).collect()
        }
        assert ham.get((0, 1)) == 0
