"""Train the PQ codebook once (per-subspace Lloyd's k-means over the
sf0.01 embeddings) and pin the centroid literals into
ticdc_spark/functions/pq_codebook.py — the train_ivf.py pattern: identical
literals feed the Spark plan AND the external DuckDB oracle, and a
codebook trained at one sf encodes any sf (a quantizer's correctness does
not depend on the serving data).

Usage: python scripts/train_pq.py [sf_dir] [m] [ksub] [iters]
"""

from __future__ import annotations

import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from ticdc_spark.functions.simsearch import train_pq_kmeans
from ticdc_spark.session import get_spark


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    m = int(sys.argv[2]) if len(sys.argv) > 2 else 8
    ksub = int(sys.argv[3]) if len(sys.argv) > 3 else 16
    iters = int(sys.argv[4]) if len(sys.argv) > 4 else 3
    spark = get_spark("pq-train", shuffle_partitions=16)
    embs = spark.read.parquet(os.path.join(sf_dir, "embeddings.parquet"))
    t0 = time.time()
    cb = train_pq_kmeans(embs, m=m, ksub=ksub, iters=iters)
    out = os.path.join(REPO, "ticdc_spark", "functions", "pq_codebook.py")
    with open(out, "w") as f:
        f.write(
            '"""PQ codebook trained by scripts/train_pq.py — per-subspace '
            f"k-means (m={m}, ksub={ksub}, iters={iters}) over {sf_dir} "
            "embeddings. Literals are shared verbatim with the DuckDB "
            'oracle (the ivf_codebook pattern)."""\n\n'
        )
        f.write(f"TRAINED_AT_SF = {os.path.basename(sf_dir)!r}\n")
        f.write(f"M = {m}\nKSUB = {ksub}\nITERS = {iters}\n")
        f.write("PQ_CODEBOOK = [\n")
        for row in cb:
            f.write("    [\n")
            for c in row:
                f.write("        " + repr(c) + ",\n")
            f.write("    ],\n")
        f.write("]\n")
    print(f"wrote {out}: m={m} ksub={ksub} iters={iters} ({time.time() - t0:.1f}s)")


if __name__ == "__main__":
    main()
