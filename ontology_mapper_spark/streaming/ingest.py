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


def stream_incremental_kg(
    spark: SparkSession,
    input_dir: str,
    triples_dir: str,
    touched_dir: str,
    digest_dir: str,
    checkpoint_dir: str,
    onto_terms: DataFrame,
    cfg: MappingConfig | None = None,
    tfidf_source_idf: tuple[dict, int] | None = None,
    available_now: bool = True,
):
    """Continuous-crawl KG maintenance: every micro-batch is treated as a
    re-crawl DELTA against the digest state accumulated so far —
    unchanged captures never reach the mapping kernel (the ``(url,
    digest)`` join drops them), changed/new urls are re-mapped and
    appended tagged with the epoch, and the digest snapshot advances via
    ``merge_digests``. This is ``pipeline.incremental_kg_delta`` lifted
    into ``foreachBatch``: the streaming twin of the batch incremental
    cycle, where `stream_pages_to_triples` is the twin of a full build.

    Model contract (enforced for the TF-IDF mapper): triples appended by
    DIFFERENT epochs coexist in one KG, so they must score on ONE model —
    pass a frozen ``tfidf_source_idf`` (``operators.tfidf.source_idf_map``
    over a reference corpus, persistable via ``save_idf_model``). A
    per-batch self-fit would score each epoch on a different model and
    the accumulated relation would be incoherent (the same reason
    ``pipeline.incremental_kg`` enforces it).

    State layout (all plain parquet — an Iceberg deployment swaps the
    latest-wins reader for MERGE commits):

    - ``triples_dir``: append-only ``(subj, pred, obj, score, epoch)``.
    - ``touched_dir``: append-only ``(url, epoch)`` — every url the epoch
      re-mapped OR retired-by-change (the CDC ``drop`` relation), the
      supersession log the reader resolves against.
    - ``digest_dir/epoch=N``: the digest snapshot AFTER epoch N —
      written with per-epoch overwrite, so a checkpoint-replayed batch
      rewrites its own directory idempotently instead of corrupting the
      prior state (never read-and-overwrite one live dir).

    Read the current KG back with :func:`stream_current_triples`;
    equality with a batch rebuild over the latest corpus is pinned by
    test."""
    from pyspark.sql import Window

    from ontology_mapper_spark.config import Mapper
    from ontology_mapper_spark.pipeline import (
        build_pipeline_index,
        incremental_kg_delta,
        merge_digests,
    )

    effective = cfg or MappingConfig()
    if effective.mapper == Mapper.TFIDF and tfidf_source_idf is None:
        raise ValueError(
            "stream_incremental_kg with the TF-IDF mapper requires a "
            "frozen tfidf_source_idf: epochs append into ONE relation, so "
            "every epoch must score on the same model (fit "
            "operators.tfidf.source_idf_map over a reference corpus; "
            "persist with save_idf_model)"
        )
    tfidf_index = (
        build_pipeline_index(onto_terms, cfg)
        if effective.mapper == Mapper.TFIDF
        and not effective.use_inverted_index
        else None
    )
    empty_digests = spark.createDataFrame([], "url string, digest string")

    def _latest_state() -> DataFrame:
        # Hadoop FileSystem API, not os.listdir: the digest snapshot lives
        # wherever the cluster's state does (hdfs://, s3a://, file:) —
        # same discipline as checkpoints.CheckpointedRun._list_bucket_ids
        jvm = spark._jvm
        hpath = jvm.org.apache.hadoop.fs.Path(digest_dir)
        fs = hpath.getFileSystem(spark._jsc.hadoopConfiguration())
        if not fs.exists(hpath):
            return empty_digests
        epochs = []
        for status in fs.listStatus(hpath):
            name = status.getPath().getName()
            if status.isDirectory() and name.startswith("epoch="):
                try:
                    epochs.append(int(name.split("=", 1)[1]))
                except ValueError:
                    pass
        if not epochs:
            return empty_digests
        return spark.read.parquet(
            digest_dir.rstrip("/") + f"/epoch={max(epochs)}"
        ).select("url", "digest")

    def process_batch(batch_df: DataFrame, epoch_id: int) -> None:
        if batch_df.isEmpty():
            return
        # newest capture per url WITHIN the batch (a snapshot drop can
        # carry several captures of one url; mention ids are url#ordinal)
        w = Window.partitionBy("url").orderBy(F.desc("warc_ts"))
        batch = (
            batch_df.withColumn("_rn", F.row_number().over(w))
            .filter(F.col("_rn") == 1)
            .drop("_rn")
        )
        prev = _latest_state()
        fresh, drop = incremental_kg_delta(
            batch, prev, onto_terms, cfg,
            tfidf_source_idf=tfidf_source_idf, tfidf_index=tfidf_index,
        )
        (
            fresh.withColumn("epoch", F.lit(int(epoch_id)))
            .write.mode("append").parquet(triples_dir)
        )
        (
            drop.select("url").withColumn("epoch", F.lit(int(epoch_id)))
            .write.mode("append").parquet(touched_dir)
        )
        (
            merge_digests(prev, batch)
            .write.mode("overwrite")
            .parquet(digest_dir.rstrip("/") + f"/epoch={int(epoch_id)}")
        )

    writer = (
        read_pages_stream(spark, input_dir)
        .writeStream.foreachBatch(process_batch)
        .option("checkpointLocation", checkpoint_dir)
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def stream_current_triples(
    spark: SparkSession, triples_dir: str, touched_dir: str
) -> DataFrame:
    """Resolve the append-only ``stream_incremental_kg`` log to the
    CURRENT KG: a triple is live iff its epoch is the LAST epoch that
    touched its url (later epochs that re-mapped the url supersede it —
    including with zero fresh triples, which is why supersession reads
    the touched log, not the triples). Mention ids are ``url#ordinal``
    (``sources/pages.py``), so the url is everything before the LAST
    ``#``. One aggregate over the skinny touched log + one join — the
    file-sink spelling of Iceberg MERGE-on-subj."""
    triples = spark.read.parquet(triples_dir)
    last_touch = (
        spark.read.parquet(touched_dir)
        .groupBy("url")
        .agg(F.max("epoch").alias("_last_epoch"))
    )
    url = F.expr("substring(subj, 1, length(subj) - locate('#', reverse(subj)))")
    return (
        triples.withColumn("url", url)
        .join(last_touch, "url")
        .filter(F.col("epoch") == F.col("_last_epoch"))
        .select("subj", "pred", "obj", "score")
    )


def compact_stream_log(
    spark: SparkSession, triples_dir: str, touched_dir: str
) -> tuple[int, int]:
    """Rewrite the :func:`stream_incremental_kg` logs to their resolved
    state: only LIVE triples survive (latest-wins, exactly what
    :func:`stream_current_triples` reads), all tagged with one compacted
    epoch, and the touched log collapses to one row per url at that
    epoch. Lakehouse maintenance, not semantics — the resolved relation
    is identical before and after (pinned by test); what changes is read
    cost, which otherwise grows with every epoch (superseded rows are
    scanned and filtered on every resolution; Iceberg deployments get
    this from MERGE + snapshot expiry, a parquet-log deployment runs
    this periodically).

    The compacted epoch is ``max(existing epoch)`` — an in-flight stream
    restarted from its checkpoint continues at a LATER batch id, so new
    epochs keep superseding compacted rows correctly. Returns
    ``(live_triples, distinct_urls)``.

    Write discipline: both relations are fully materialized to temp
    sibling directories BEFORE the originals are replaced (a direct
    overwrite would read and delete the same files), then swapped in
    via Hadoop FileSystem delete+rename — any scheme (hdfs://, s3a://,
    file:), like the rest of the state machinery. Run it between stream
    runs, not concurrently with one."""
    touched = spark.read.parquet(touched_dir)
    epoch = touched.agg(F.max("epoch")).collect()[0][0]
    live = stream_current_triples(spark, triples_dir, touched_dir)
    urls = touched.select("url").distinct()

    tmp_t = triples_dir.rstrip("/") + "._compact"
    tmp_u = touched_dir.rstrip("/") + "._compact"
    live.withColumn("epoch", F.lit(int(epoch))).write.mode(
        "overwrite"
    ).parquet(tmp_t)
    urls.withColumn("epoch", F.lit(int(epoch))).write.mode(
        "overwrite"
    ).parquet(tmp_u)
    n_live = spark.read.parquet(tmp_t).count()
    n_urls = spark.read.parquet(tmp_u).count()
    jvm = spark._jvm
    for final, tmp in ((triples_dir, tmp_t), (touched_dir, tmp_u)):
        fpath = jvm.org.apache.hadoop.fs.Path(final)
        tpath = jvm.org.apache.hadoop.fs.Path(tmp)
        fs = fpath.getFileSystem(spark._jsc.hadoopConfiguration())
        fs.delete(fpath, True)
        if not fs.rename(tpath, fpath):
            raise IOError(
                f"compact_stream_log: rename {tmp} -> {final} failed; "
                "compacted data is intact under the temp path"
            )
    return n_live, n_urls
