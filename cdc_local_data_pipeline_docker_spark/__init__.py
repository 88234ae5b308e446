"""PySpark-native analytics engine with the query and data-processing
capabilities of the reference CDC pipeline
(lokeshpatil84/cdc-local-data-pipeline-docker, surveyed in SURVEY.md).

The reference is a Docker-composed Postgres→Debezium→Kafka→PySpark→Parquet
CDC pipeline; its only dataflow code is two PySpark batch jobs
(glue-jobs/kafka_to_s3_batch.py, glue-jobs/kafka_to_s3_enhanced.py). This
package re-expresses that surface Spark-first — one lazy plan per query,
Catalyst-optimized, Structured-Streaming checkpoints instead of hand-rolled
offset files — and extends it with the relational / streaming / LLM-data
operator surface declared in SURVEY.md §2.C.

Layout:
    session     SparkSession factory (AQE, UTC, Arrow; S3A-style config block)
    catalog     fixed StructType schemas + testdata table loading
    cdc/        Debezium-shaped parse, ingest jobs, latest-state semantics
    sources/    batch/streaming source builders (parquet, JSONL-as-kafka, kafka)
    operators/  relational query surface (filter/join/agg/window/setops/sort)
    functions/  scalar function pack (string/date/math/array/json)
    streaming/  watermark+window jobs, stateful dedup, foreachBatch upsert
    llmops/     dedup (exact/minhash/simhash/jaccard), ANN similarity,
                text analysis, multimodal binary-column plumbing
    plans/      explain/plan inspection helpers (pushdown & broadcast asserts)
"""

__version__ = "0.1.0"
