"""Regenerate ticdc_spark.functions.bpe.TRAINED_MERGES (run from repo root):
train the BPE merge table on the sf0.001 documents corpus and print the
literal to paste."""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from ticdc_spark.functions.bpe import bpe_train
from ticdc_spark.session import get_spark

spark = get_spark("train-bpe")
docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
merges = bpe_train(docs, n_merges=30)
print("TRAINED_MERGES = [")
for a, b in merges:
    print(f"    ({a!r}, {b!r}),")
print("]")
