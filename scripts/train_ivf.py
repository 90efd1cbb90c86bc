"""Train the IVF codebook once (Lloyd's k-means over the sf0.01 embeddings)
and pin the centroid literals into ticdc_spark/functions/ivf_codebook.py —
the rp_planes pattern: identical literals feed the Spark plan AND the
external DuckDB oracle, and a codebook trained at one sf quantizes any sf
(a coarse quantizer's correctness does not depend on the serving data).

Usage: python scripts/train_ivf.py [sf_dir] [k] [iters]
"""

from __future__ import annotations

import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from ticdc_spark.functions.simsearch import kmeans_distortion, train_ivf_kmeans
from ticdc_spark.session import get_spark


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    k = int(sys.argv[2]) if len(sys.argv) > 2 else 8
    iters = int(sys.argv[3]) if len(sys.argv) > 3 else 3
    spark = get_spark("ivf-train", shuffle_partitions=16)
    embs = spark.read.parquet(os.path.join(sf_dir, "embeddings.parquet"))
    t0 = time.time()
    cents = train_ivf_kmeans(embs, k=k, iters=iters)
    dist = kmeans_distortion(embs, cents)
    out = os.path.join(REPO, "ticdc_spark", "functions", "ivf_codebook.py")
    with open(out, "w") as f:
        f.write(
            '"""IVF codebook trained by scripts/train_ivf.py — k-means '
            f"(k={k}, iters={iters}) over {sf_dir} embeddings; "
            f"distortion={dist:.6f}. Literals are shared verbatim with the "
            'DuckDB oracle (the rp_planes pattern)."""\n\n'
        )
        f.write(f"TRAINED_AT_SF = {os.path.basename(sf_dir)!r}\n")
        f.write(f"K = {k}\nITERS = {iters}\n")
        f.write("CENTROIDS = [\n")
        for c in cents:
            f.write("    " + repr(c) + ",\n")
        f.write("]\n")
    print(f"wrote {out}: k={k} iters={iters} distortion={dist:.6f} "
          f"({time.time() - t0:.1f}s)")


if __name__ == "__main__":
    main()
