"""In-engine classifier loop — train → score → filter, all distributed
and integer-exact (no model artifact leaves the engine):

  1. a two-register synthetic corpus (formal vs slang vocabulary) —
     linearly separable, which is the batch perceptron's convergence
     regime (Novikoff's theorem; on non-separable weak labels the
     full-batch update oscillates — use more expressive labels or the
     LSH/ngram quality stack for those corpora)
  2. `perceptron_train`: batch-perceptron rounds over hashed features
  3. `classifier_scores`: score EVERY document with the trained table
  4. verdicts + confusion matrix vs the true register — the
     pipeline-health numbers a DCLM/FineWeb-Edu-style model-based
     filter stage monitors

Run locally:      python examples/quality_classifier.py
Run on a cluster: ./examples/submit.sh examples/quality_classifier.py
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from pregel_rs_spark.operators.text import classifier_scores, perceptron_train
from pregel_rs_spark.sources.io import get_spark

FORMAL = ["therefore", "moreover", "analysis", "method", "results"]
SLANG = ["lol", "omg", "gonna", "wanna", "dunno"]


def main() -> None:
    spark = get_spark("example-quality-classifier")
    spark.sparkContext.setLogLevel("ERROR")

    # 1. deterministic separable corpus: doc i cycles through its
    # register's vocabulary; positives are the "formal" register
    rows = []
    for i in range(400):
        vocab = FORMAL if i % 2 == 0 else SLANG
        words = [vocab[(i + j) % len(vocab)] for j in range(1 + i % 7)]
        rows.append((i, " ".join(words), 1 if i % 2 == 0 else -1))
    docs = spark.createDataFrame(
        [(d, t) for d, t, _ in rows], "doc_id long, text string"
    )
    labels = spark.createDataFrame(
        [(d, y) for d, _, y in rows], "doc_id long, y int"
    )

    # 2. train — separable, so a few rounds reach a mistake-free state
    # (weights then stop changing; rounds=4 and rounds=8 agree)
    w = perceptron_train(docs, labels, n_buckets=1024, rounds=4)
    bias = {r.bucket: r.w for r in w.filter("bucket = -1").collect()}.get(-1, 0)
    weights = w.filter("bucket != -1").withColumnRenamed("w", "w_scaled")
    print(f"trained: {weights.count()} active buckets, bias={bias}")

    # 3. score + 4. audit
    scored = classifier_scores(
        docs, weights, n_buckets=1024, bias_scaled=bias, threshold_scaled=1
    )
    joined = scored.join(labels, "doc_id")
    confusion = (
        joined.groupBy(
            F.col("keep").cast("int").alias("pred"),
            (F.col("y") == 1).cast("int").alias("label"),
        )
        .count()
        .orderBy("pred", "label")
    )
    print("confusion matrix (pred vs label):")
    correct = 0
    for r in confusion.collect():
        print(f"  pred={r.pred} label={r.label}: {r['count']}")
        if r.pred == r.label:
            correct += r["count"]
    print(f"accuracy {correct} / 400")
    spark.stop()


if __name__ == "__main__":
    main()
