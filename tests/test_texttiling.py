"""TextTiling (ops/texttiling.py) vs a plain-Python reference of the
Hearst block-comparison algorithm on tiny deterministic inputs."""

import math


def _ref(texts, w, k, look):
    out = {}
    for doc_id, text in texts:
        toks = [t for t in text.lower().split() if t]
        n_seq = (len(toks) + w - 1) // w if toks else 0
        if n_seq < 2:
            continue
        seqs = [toks[i * w:(i + 1) * w] for i in range(n_seq)]
        sims = {}
        for g in range(1, n_seq):
            left, right = {}, {}
            for s in seqs[max(0, g - k):g]:
                for t in s:
                    left[t] = left.get(t, 0) + 1
            for s in seqs[g:min(n_seq, g + k)]:
                for t in s:
                    right[t] = right.get(t, 0) + 1
            dot = sum(c * right.get(t, 0) for t, c in left.items())
            nl = math.sqrt(sum(c * c for c in left.values()))
            nr = math.sqrt(sum(c * c for c in right.values()))
            sims[g] = dot / (nl * nr) if dot else 0.0
        depths = {}
        gs = sorted(sims)
        for i, g in enumerate(gs):
            lwin = [sims[x] for x in gs[max(0, i - look):i]]
            rwin = [sims[x] for x in gs[i + 1:i + 1 + look]]
            dl = max(max(lwin, default=sims[g]) - sims[g], 0.0)
            dr = max(max(rwin, default=sims[g]) - sims[g], 0.0)
            depths[g] = dl + dr
        vals = list(depths.values())
        mean = sum(vals) / len(vals)
        std = math.sqrt(sum((v - mean) ** 2 for v in vals) / len(vals))
        cut = mean - std / 2.0
        for g in gs:
            out[(doc_id, g)] = (
                round(sims[g], 6), round(depths[g], 6), depths[g] > cut
            )
    return out


def _run(spark, texts, w, k, look):
    from tokenkit_spark.ops.texttiling import texttiling

    docs = spark.createDataFrame(texts, "doc_id long, text string")
    rows = texttiling(docs, w=w, k=k, lookaround=look).collect()
    return {
        (r.doc_id, r.gap): (r.sim, r.depth, r.is_boundary) for r in rows
    }


TOPIC_A = "spark shuffle partition executor stage task " * 4
TOPIC_B = "recipe flour butter sugar oven bake " * 4
TOPIC_C = "planet orbit gravity star telescope moon " * 4


def test_texttiling_matches_reference(spark):
    texts = [
        (0, TOPIC_A + TOPIC_B + TOPIC_C),
        (1, TOPIC_A + TOPIC_A + TOPIC_B),
        (2, "short doc below one window"),
        (3, ""),
    ]
    got = _run(spark, texts, w=6, k=2, look=3)
    ref = _ref(texts, w=6, k=2, look=3)
    assert got == ref
    # docs 2 and 3 have < 2 sequences -> no gap rows
    assert not any(d in (2, 3) for d, _ in got)


def test_texttiling_boundary_at_topic_shift(spark):
    # one clean topic shift at gap 4 (24 tokens of A, then 24 of B, w=6)
    got = _run(spark, [(0, TOPIC_A + TOPIC_B)], w=6, k=2, look=3)
    assert set(g for _, g in got) == {1, 2, 3, 4, 5, 6, 7}
    # interior same-topic gaps are perfect-similarity, the shift is 0
    assert got[(0, 4)][0] == 0.0
    assert got[(0, 4)][2] is True
    assert got[(0, 2)][0] == 1.0 and got[(0, 2)][2] is False


def test_texttiling_edge_sequences_emit_no_phantom_gaps(spark):
    # regression: F.sequence descends when start > stop — the first/last
    # pseudo-sentence must not emit gap 0 or gap n_seq memberships
    got = _run(spark, [(0, "a b c d e f g h")], w=2, k=2, look=3)
    assert set(g for _, g in got) == {1, 2, 3}
