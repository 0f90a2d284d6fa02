"""Deterministic 60x-scale documents corpus for the round-5 curation-op
evidence run (BASELINE.md "curation ops at 60x bench scale").

300k word-soup docs (~45M words), 5% planted verbatim duplicates, same
schema as /root/testdata/sf*/documents.parquet.  Pure numpy, seed-fixed.

Usage:  python jobs/gen_bigdocs.py [/tmp/bigdocs]
"""

from __future__ import annotations

import os
import sys
import time

import numpy as np
import pyarrow as pa
import pyarrow.parquet as papq

N = 300_000
SEED = 7


def main(out_dir: str = "/tmp/bigdocs") -> None:
    t0 = time.time()
    rng = np.random.default_rng(SEED)
    vocab = np.array([f"w{i}" for i in range(5000)], dtype=object)
    lens = rng.integers(80, 220, size=N)
    total = int(lens.sum())
    words = vocab[rng.integers(0, len(vocab), size=total)]
    offs = np.concatenate(([0], np.cumsum(lens)))
    texts = np.empty(N, dtype=object)
    for s in range(0, N, 20000):
        e = min(s + 20000, N)
        texts[s:e] = [
            " ".join(words[offs[i]: offs[i + 1]]) for i in range(s, e)
        ]
    # planted verbatim duplicates: 5% of the back half copy the front half
    dup_src = rng.integers(0, N // 2, size=N // 20)
    for j, src in enumerate(dup_src):
        texts[N // 2 + j] = texts[src]
    n_chars = np.array([len(t) for t in texts], dtype=np.int64)
    os.makedirs(out_dir, exist_ok=True)
    tab = pa.table(
        {
            "doc_id": pa.array(np.arange(N), type=pa.int64()),
            "text": pa.array(texts),
            "lang": pa.array(np.full(N, "en", dtype=object)),
            "source": pa.array(
                np.array([f"s{i % 10}" for i in range(N)], dtype=object)
            ),
            "n_chars": pa.array(n_chars),
        }
    )
    papq.write_table(tab, os.path.join(out_dir, "documents.parquet"))
    print(
        f"generated {N} docs, {total} words -> {out_dir} "
        f"({time.time() - t0:.1f}s)"
    )


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else "/tmp/bigdocs")
