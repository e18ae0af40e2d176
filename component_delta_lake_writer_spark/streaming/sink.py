"""Streaming writes into the managed table layer.

The reference's batch loop (W8: arrow-batch → write_deltalake per
batch) is, in streaming terms, a micro-batch sink. Spark-first that is
``foreachBatch``: each micro-batch lands as ONE atomic append commit
to a ManagedTable — the same first-batch-mode / rest-append policy the
reference applies (src/component.py:90-111), with real transactional
boundaries per batch instead of per 25k rows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

from component_delta_lake_writer_spark.sinks import ManagedTable


def write_stream_to_table(
    stream_df: DataFrame,
    table: ManagedTable,
    mode: str = "append",
    checkpoint_dir: str | None = None,
    max_records_per_file: int | None = None,
    primary_key: list[str] | None = None,
):
    """Start a streaming query that commits each micro-batch to the
    table. First batch uses ``mode`` (error/overwrite honored), later
    batches always append — the reference's loop semantics.

    ``mode="upsert"`` (requires ``primary_key``) turns this into a
    CDC-style streaming merge sink: every micro-batch MERGEs into the
    table by PK (matched rows replaced, new rows inserted), each batch
    one atomic commit — the streaming spelling of W12.

    Exactly-once per micro-batch: the committed batch_id is recorded in
    the commit properties, so a replay after a crash between table
    commit and checkpoint advance is detected and skipped. "First
    batch" is derived from table existence, not process-local state, so
    a restarted first batch keeps its configured mode.
    """
    _BATCH_KEY = "last_stream_batch_id"

    def commit_batch(batch_df: DataFrame, batch_id: int) -> None:
        prev = table.latest_commit()
        if prev is not None:
            last = prev.properties.get(_BATCH_KEY)
            if last is not None and batch_id <= int(last):
                return  # checkpoint replay of an already-committed batch
        props = dict(prev.properties) if prev is not None else {}
        props[_BATCH_KEY] = batch_id
        if mode == "upsert":
            table.upsert(
                batch_df, primary_key or [],
                max_records_per_file=max_records_per_file,
                properties=props,
            )
            return
        # first batch = no stream-committed batch recorded yet (table
        # may pre-exist from outside the stream; mode still applies)
        first = prev is None or _BATCH_KEY not in prev.properties
        batch_mode = mode if first else "append"
        table.write(
            batch_df, mode=batch_mode,
            max_records_per_file=max_records_per_file,
            properties=props,
        )

    writer = stream_df.writeStream.foreachBatch(commit_batch).trigger(
        availableNow=True
    )
    if checkpoint_dir:
        writer = writer.option("checkpointLocation", checkpoint_dir)
    return writer.start()


def write_stream_dedup_corpus(
    doc_stream: DataFrame,
    table: ManagedTable,
    checkpoint_dir: str | None = None,
    text_col: str = "text",
    id_col: str = "doc_id",
):
    """Continuous corpus ingestion with exact dedup — the production
    shape of a training-data feed: each micro-batch of documents is
    fingerprinted, resolved in-batch (min doc_id per fingerprint), and
    conditionally MERGEd into the corpus state table with

        WHEN MATCHED AND s.doc_id < t.doc_id THEN UPDATE
        WHEN NOT MATCHED THEN INSERT

    so the table always holds the globally-minimal doc id per
    fingerprint REGARDLESS of how the feed was batched — the streaming
    result is bit-identical to a batch ``GROUP BY fingerprint,
    MIN(doc_id)`` over everything ever ingested (that invariance is
    what makes the pipeline replayable/oracle-checkable).

    Same exactly-once guard as write_stream_to_table: the committed
    batch_id rides in commit properties; checkpoint replays of an
    already-committed batch are skipped.
    """
    from pyspark.sql import functions as F

    from component_delta_lake_writer_spark.operators.text import fingerprint

    _BATCH_KEY = "last_stream_batch_id"

    def commit_batch(batch_df: DataFrame, batch_id: int) -> None:
        prev = table.latest_commit()
        if prev is not None:
            last = prev.properties.get(_BATCH_KEY)
            if last is not None and batch_id <= int(last):
                return
        props = dict(prev.properties) if prev is not None else {}
        props[_BATCH_KEY] = batch_id
        resolved = (
            batch_df.select(
                fingerprint(F.col(text_col)).alias("fingerprint"),
                F.col(id_col),
            )
            .groupBy("fingerprint")
            .agg(F.min(id_col).alias(id_col))
        )
        if prev is None:
            table.write(
                resolved, mode="overwrite",
                primary_key=["fingerprint"], properties=props,
            )
        else:
            table.upsert(
                resolved, ["fingerprint"], properties=props,
                update_condition=lambda t, s: s[id_col] < t[id_col],
            )

    writer = doc_stream.writeStream.foreachBatch(commit_batch).trigger(
        availableNow=True
    )
    if checkpoint_dir:
        writer = writer.option("checkpointLocation", checkpoint_dir)
    return writer.start()


def write_stream_with_mv(
    stream_df: DataFrame,
    table: ManagedTable,
    mv,
    checkpoint_dir: str | None = None,
    on_refresh=None,
):
    """Micro-batch sink that keeps a materialized aggregate current
    with every commit: each batch lands as one atomic append, then the
    IncrementalAggregate refreshes from the table's change feed — per
    batch O(batch rows) commit + O(touched groups) maintenance, the
    streaming-ETL-plus-serving-rollup shape. Append-only commits need
    no CDF pre-images, so the refresh stays incremental from batch 2
    on (batch 1 is the initial full materialization by definition).

    Same exactly-once guard as write_stream_to_table; ``on_refresh``
    (if given) receives each refresh's mode string — lets callers
    assert the incremental path actually ran."""
    _BATCH_KEY = "last_stream_batch_id"

    def commit_batch(batch_df: DataFrame, batch_id: int) -> None:
        prev = table.latest_commit()
        if prev is not None:
            last = prev.properties.get(_BATCH_KEY)
            if last is not None and batch_id <= int(last):
                return
        props = dict(prev.properties) if prev is not None else {}
        props[_BATCH_KEY] = batch_id
        table.write(batch_df, mode="append", properties=props)
        mode = mv.refresh()
        if on_refresh is not None:
            on_refresh(mode)

    writer = stream_df.writeStream.foreachBatch(commit_batch).trigger(
        availableNow=True
    )
    if checkpoint_dir:
        writer = writer.option("checkpointLocation", checkpoint_dir)
    return writer.start()
