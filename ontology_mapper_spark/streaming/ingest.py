"""Structured Streaming ingest of new pages (SURVEY.md §2.2 streaming row —
a capability extension beyond the batch-only reference).

Design: the mapping kernel needs a per-corpus aggregate (source IDF), so the
streaming entry is ``foreachBatch`` — each micro-batch runs the identical
batch pipeline (cache-coherent with batch semantics, exactly-once via the
checkpointLocation + idempotent append), which is the standard Spark pattern
for joins/aggregates that need batch-only operations. A pure streaming
aggregation (mention rate with watermarked event-time windows) demonstrates
the native stateful path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ontology_mapper_spark.config import MappingConfig
from ontology_mapper_spark.pipeline import construct_kg
from ontology_mapper_spark.sources.pages import PAGES_SCHEMA


def read_pages_stream(spark: SparkSession, input_dir: str,
                      max_files_per_trigger: int | None = None) -> DataFrame:
    reader = spark.readStream.schema(PAGES_SCHEMA)
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    return reader.parquet(input_dir)


def stream_pages_to_triples(
    spark: SparkSession,
    input_dir: str,
    out_dir: str,
    checkpoint_dir: str,
    onto_terms: DataFrame,
    cfg: MappingConfig | None = None,
    available_now: bool = True,
):
    """Incremental KG construction: new page files -> mappedTo triples,
    exactly-once via streaming checkpoint + append sink.

    The ontology TF-IDF index is built ONCE here and reused by every
    micro-batch (build_pipeline_index) — rebuilding the dimension index
    per trigger would add a driver collect + vectorization to every batch
    for a value that only changes when the ontology snapshot does."""
    from ontology_mapper_spark.config import Mapper
    from ontology_mapper_spark.pipeline import build_pipeline_index

    stream = read_pages_stream(spark, input_dir)
    # only the TF-IDF broadcast plan consumes the prebuilt index; building
    # it for API mappers / the inverted-index plan would be dead driver
    # work at stream start (r3 review)
    effective = cfg or MappingConfig()
    tfidf_index = (
        build_pipeline_index(onto_terms, cfg)
        if effective.mapper == Mapper.TFIDF and not effective.use_inverted_index
        else None
    )

    def process_batch(batch_df: DataFrame, epoch_id: int) -> None:
        if batch_df.isEmpty():
            return
        triples = construct_kg(batch_df, onto_terms, cfg, tfidf_index=tfidf_index)
        (
            triples.withColumn("epoch", F.lit(epoch_id))
            .write.mode("append")
            .parquet(out_dir)
        )

    writer = (
        stream.writeStream.foreachBatch(process_batch)
        .option("checkpointLocation", checkpoint_dir)
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def first_seen_urls(pages_stream: DataFrame) -> DataFrame:
    """Custom stateful streaming operator (``applyInPandasWithState``):
    emit each url exactly once — the first capture seen across ALL
    micro-batches — with a running recrawl count kept in state. This is the
    streaming twin of ``construct_kg(dedup_pages=True)``: Common-Crawl
    snapshots recrawl urls, and mention ids are url#ordinal, so a url must
    enter the KG pipeline only once per corpus.

    State per url: (emitted flag, captures seen). Keyed state is
    checkpoint-backed — a restarted query keeps deduplicating across runs.
    Output mode 'append' (each url's row is final once emitted) with no
    timeout; state size is O(|distinct urls|), the same cardinality any
    streaming dedup must hold.
    """
    import pandas as pd
    from pyspark.sql import types as T
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    out_schema = T.StructType(
        [
            T.StructField("url", T.StringType()),
            T.StructField("warc_ts", T.TimestampType()),
            T.StructField("lang", T.StringType()),
        ]
    )
    state_schema = T.StructType(
        [
            T.StructField("emitted", T.LongType()),
            T.StructField("captures", T.LongType()),
        ]
    )

    def dedup(key, pdfs, state: GroupState):
        emitted, captures = state.get if state.exists else (0, 0)
        first = None
        for pdf in pdfs:
            captures += len(pdf)
            if not emitted and len(pdf):
                # a url group can span multiple Arrow chunks in one batch
                # and a LATER chunk may hold an earlier capture — keep the
                # min-warc_ts row across all chunks (r2 ADVICE)
                head = pdf.sort_values("warc_ts").iloc[[0]]
                if first is None or (
                    head["warc_ts"].iloc[0] < first["warc_ts"].iloc[0]
                ):
                    first = head
        state.update((1 if (emitted or first is not None) else 0, captures))
        if not emitted and first is not None:
            yield first[["url", "warc_ts", "lang"]]
        else:
            yield pd.DataFrame(columns=["url", "warc_ts", "lang"])

    return (
        pages_stream.select("url", "warc_ts", "lang")
        .groupBy("url")
        .applyInPandasWithState(
            dedup, out_schema, state_schema, "append",
            GroupStateTimeout.NoTimeout,
        )
    )


def mention_rate(pages_stream: DataFrame, window: str = "10 minutes",
                 watermark: str = "1 hour") -> DataFrame:
    """Watermarked event-time aggregation: mentions/pages per window per
    lang; late pages beyond the watermark are dropped (state bounded)."""
    return (
        pages_stream.withWatermark("warc_ts", watermark)
        .groupBy(F.window("warc_ts", window).alias("w"), "lang")
        .agg(
            F.count(F.lit(1)).alias("n_pages"),
            F.sum(F.size(F.split("text", "\n")) - 1).alias("n_mentions"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            "lang",
            "n_pages",
            "n_mentions",
        )
    )
