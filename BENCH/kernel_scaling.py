#!/usr/bin/env python
"""Kernel-only scaling microbench for the OPH signature stage.

Runs the batched OPH kernel in N parallel OS processes (no Spark — isolates
the numpy kernel from shuffle/scheduler effects), measuring aggregate
docs/sec at each process count.  Used to validate that the chunked
cache-resident formulation (signatures.py oph_signatures_batch) scales
where the round-2 whole-batch formulation saturated the memory bus.

Usage: python BENCH/kernel_scaling.py [procs_csv] [n_docs_per_proc]
"""

from __future__ import annotations

import multiprocessing as mp
import os
import random
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _make_texts(n: int, seed: int) -> list[str]:
    rng = random.Random(seed)
    words = ["".join(rng.choice("abcdefghijklmnopqrstuvwxyz")
                     for _ in range(rng.randint(3, 9))) for _ in range(5000)]
    out = []
    for i in range(n):
        target = 200 + (i * 797) % 1800  # 200..2000 chars like bench_gen
        parts: list[str] = []
        ln = 0
        while ln < target:
            w = words[(i * 31 + ln * 7) % len(words)]
            parts.append(w)
            ln += len(w) + 1
        out.append(" ".join(parts))
    return out


def _worker(variant: str, n_docs: int, seed: int, out_q) -> None:
    import numpy as np

    from humid_spark.functions import signatures as S

    texts = _make_texts(n_docs, seed)
    # warm numpy + page-fault the text
    S.oph_signatures_batch(texts[:50], 5, 128)
    t0 = time.perf_counter()
    if variant == "chunked":
        S.oph_signatures_batch(texts, 5, 128)
    elif variant == "wholebatch":
        # round-2 formulation, reconstructed for comparison
        hashes, doc_of, n = S.concat_poly_hashes(texts, 5)
        sig = np.full((n, 128), np.iinfo(np.int64).max, dtype=np.int64)
        if hashes.size:
            mixed = S._mix64(hashes)
            buckets = (mixed % np.uint64(128)).astype(np.int64)
            vals = (mixed >> np.uint64(33)).astype(np.int64)
            np.minimum.at(sig.reshape(-1), doc_of * 128 + buckets, vals)
    else:
        raise ValueError(variant)
    out_q.put(time.perf_counter() - t0)


def run(variant: str, procs: int, n_docs: int) -> float:
    q = mp.Queue()
    ps = [mp.Process(target=_worker, args=(variant, n_docs, i, q))
          for i in range(procs)]
    t0 = time.perf_counter()
    for p in ps:
        p.start()
    times = [q.get() for _ in ps]
    for p in ps:
        p.join()
    wall = time.perf_counter() - t0
    total_docs = procs * n_docs
    return total_docs / max(max(times), 1e-9), wall


def main() -> None:
    procs_list = [int(x) for x in (sys.argv[1] if len(sys.argv) > 1
                                   else "2,8").split(",")]
    n_docs = int(sys.argv[2]) if len(sys.argv) > 2 else 60000
    repeats = int(os.environ.get("KREPEATS", "3"))
    for variant in ("wholebatch", "chunked"):
        rates = {}
        for p in procs_list:
            best = 0.0
            for _ in range(repeats):
                r, _w = run(variant, p, n_docs)
                best = max(best, r)
            rates[p] = best
            print(f"{variant:11s} procs={p:2d}  {best:>10.0f} docs/sec")
        if len(procs_list) == 2:
            lo, hi = procs_list
            eff = (rates[hi] / rates[lo]) / (hi / lo)
            print(f"{variant:11s} efficiency {lo}->{hi}: {eff:.3f}")


if __name__ == "__main__":
    main()
