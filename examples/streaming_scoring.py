"""Streaming sentiment scoring end-to-end (terminates on its own).

Trains the pipeline on an inline corpus, then scores a file stream
with Structured Streaming (availableNow trigger → drains and stops),
writing labeled output to a parquet sink with checkpointing — the
declarative replacement for the reference's foreachRDD socket loop
(Prediction_Pipe_Line.py:41-111).

    python examples/streaming_scoring.py
"""

from __future__ import annotations

import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from sentiment_analysis_of_reviews_with_spark_ml_and_spark_streaming_spark.ml.pipeline import (
    train_and_evaluate,
)
from sentiment_analysis_of_reviews_with_spark_ml_and_spark_streaming_spark.session import (
    get_spark,
)
from sentiment_analysis_of_reviews_with_spark_ml_and_spark_streaming_spark.streaming.scoring import (
    score_stream,
)


def main() -> None:
    spark = get_spark(app_name="streaming_scoring_demo")
    pos = [("great amazing wonderful food", 1.0)] * 40
    neg = [("terrible awful rude service", 0.0)] * 40
    model, f1 = train_and_evaluate(
        spark.createDataFrame(pos + neg, "text string, label double"), "svm"
    )
    print(f"model trained (f1={f1:.3f})")

    work = tempfile.mkdtemp()
    src = os.path.join(work, "incoming")
    os.makedirs(src)
    with open(os.path.join(src, "batch0.txt"), "w") as f:
        f.write(
            "The food was great!!! amazing stuff\n"
            "awful experience... terrible and rude\n"
            "wonderful place, great food\n"
        )
    lines = spark.readStream.format("text").schema("value string").load(src)
    scored = score_stream(lines, model)
    sink = os.path.join(work, "scored")
    query = (
        scored.writeStream.format("parquet")
        .option("path", sink)
        .option("checkpointLocation", os.path.join(work, "ckpt"))
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    query.awaitTermination(120)
    print("--- scored stream output")
    spark.read.parquet(sink).show(truncate=False)
    spark.stop()


if __name__ == "__main__":
    main()
