"""Host-capability probe: does THIS machine scale N -> 4N workers on
the index build's actual kernels, outside Spark entirely?

Separates "the Spark plan doesn't scale" from "the host's per-core
capacity drops with occupancy" (turbo/frequency scaling, shared memory
bandwidth, hypervisor caps). Three workloads via multiprocessing — no
JVM, no shuffle, no Arrow:

* encode  — codec.encode_runs over Zipf-gapped posting runs (the
            segment writer's kernel: numpy varint/delta/block math)
* score   — wand.score_query_shard over a synthetic shard (the query
            kernel: varint decode + float vector math)
* intloop — pure-Python integer loop (no memory traffic: isolates
            frequency/hypervisor effects from bandwidth)

Usage: python tools/core_scaling_probe.py [n_small] [n_big]
Prints one JSON line with per-size aggregate throughput + efficiency.
"""

from __future__ import annotations

import json
import multiprocessing as mp
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REPS = {"encode": 60, "score": 40, "intloop": 12}


def _mk_encode_batch():
    import numpy as np

    rng = np.random.default_rng(7)
    n = 200_000
    gaps = rng.zipf(1.3, size=n).astype(np.uint64)
    ids = np.cumsum(gaps).view(np.int64)
    tfs = rng.zipf(1.5, size=n).clip(1, 900).astype(np.int64)
    dls = rng.integers(40, 400, size=n, dtype=np.int64)
    starts = np.arange(0, n, 500, dtype=np.int64)
    ends = np.append(starts[1:], n)
    return starts, ends, ids, tfs, dls


def _w_encode(_):
    from tokenkit_spark.index import codec

    starts, ends, ids, tfs, dls = _mk_encode_batch()
    t0 = time.monotonic()
    for _ in range(REPS["encode"]):
        codec.encode_runs(starts, ends, ids, tfs, dls)
    return REPS["encode"] / (time.monotonic() - t0)


def _w_score(_):
    import numpy as np

    from tokenkit_spark.index import codec, wand

    rng = np.random.default_rng(11)
    terms = []
    for df, idf in ((120_000, 1.2), (30_000, 2.4), (2_000, 5.1)):
        ids = np.cumsum(rng.zipf(1.4, size=df).astype(np.uint64)).view(np.int64)
        tfs = rng.zipf(1.5, size=df).clip(1, 500).astype(np.int64)
        dls = rng.integers(40, 400, size=df, dtype=np.int64)
        enc = codec.encode_posting_list(ids, tfs, dls)
        enc["idf"] = idf
        terms.append(enc)
    t0 = time.monotonic()
    for _ in range(REPS["score"]):
        wand.score_query_shard(terms, 120.0, 10)
    return REPS["score"] / (time.monotonic() - t0)


def _w_intloop(_):
    t0 = time.monotonic()
    for _ in range(REPS["intloop"]):
        acc = 0
        for i in range(2_000_000):
            acc += i * 3 + 1
    return REPS["intloop"] / (time.monotonic() - t0)


def measure(fn, workers: int) -> float:
    with mp.Pool(workers) as pool:
        rates = pool.map(fn, range(workers))
    return sum(rates)  # aggregate units/s across workers


def main() -> None:
    small = int(sys.argv[1]) if len(sys.argv) > 1 else 2
    big = int(sys.argv[2]) if len(sys.argv) > 2 else 8
    out = {"n_small": small, "n_big": big, "workloads": {}}
    for name, fn in (("encode", _w_encode), ("score", _w_score),
                     ("intloop", _w_intloop)):
        s = measure(fn, small)
        b = measure(fn, big)
        out["workloads"][name] = {
            "small_agg": round(s, 2),
            "big_agg": round(b, 2),
            "efficiency": round((b / s) / (big / small), 3),
        }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
