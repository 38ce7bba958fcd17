"""Worst-case resident-BPE throughput (SCALING.md §bpe, VERDICT r10 #6).

Generates a seeded uniform-random synthetic vocabulary — the
pathological case for the resident merge loop: a small alphabet makes
every frequent pair occur in a large fraction of the words, so each
merge rewrites many words, and the flat count distribution keeps the
pair table huge so selection cost is maximally exposed. Real Zipfian
corpora are orders faster (frequent merges concentrate in few words).

Usage: python tools/bpe_worstcase_bench.py [n_words] [merge counts...]
Defaults: 200_000 words, merges at 256, 2048, 8192.

No Spark involved — this measures the driver-resident loop in
operators/vocab.py::_bpe_resident_merges directly.
"""

from __future__ import annotations

import random
import sys
import time

REPO = __file__.rsplit("/", 2)[0]
sys.path.insert(0, REPO)

from smart_fraud_detection_data_pipeline_spark.operators.vocab import (  # noqa: E402
    _bpe_resident_merges,
)


def make_vocab(n_words: int, seed: int = 11) -> list[tuple[str, int]]:
    rng = random.Random(seed)
    alphabet = "abcdef"
    seen: set[str] = set()
    out: list[tuple[str, int]] = []
    while len(out) < n_words:
        w = "".join(rng.choice(alphabet) for _ in range(rng.randint(8, 16)))
        if w in seen:
            continue
        seen.add(w)
        out.append((w, rng.randint(1, 10)))
    return out


def main() -> None:
    n_words = int(sys.argv[1]) if len(sys.argv) > 1 else 200_000
    merge_counts = [int(a) for a in sys.argv[2:]] or [256, 2048, 8192]
    vocab = make_vocab(n_words)
    for m in merge_counts:
        t0 = time.time()
        merges = _bpe_resident_merges(list(vocab), m)
        dt = time.time() - t0
        print(
            f"n_words={n_words} merges={len(merges)} "
            f"wall={dt:.2f}s rate={len(merges) / dt:.1f}/s "
            f"first={merges[0]!r} last={merges[-1]!r}"
        )


if __name__ == "__main__":
    main()
