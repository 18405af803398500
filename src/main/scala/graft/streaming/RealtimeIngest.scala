package graft.streaming

import graft.store.SegmentStore
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

/** Realtime ingestion — the Spark-native replacement for Druid realtime
  * nodes / the Kafka Indexing Service (reference `arch/druid-arch.md:29-32`,
  * `data-ingest/kis.md`, `TOC.md:17-20`):
  *
  *   - a Structured Streaming query consumes the stream (Kafka source in
  *     production; any streaming DataFrame here),
  *   - `withWatermark` bounds late data (Druid `windowPeriod` /
  *     `lateMessageRejectionPeriod`),
  *   - each micro-batch commits files into the current segment chunk via
  *     `foreachBatch` → SegmentStore.appendBatch — data is queryable as
  *     soon as the batch commits (Druid's "queryable before handoff"),
  *   - checkpointing makes the Kafka→segment path exactly-once,
  *   - periodic compaction (TaskService `append`) is the handoff.
  */
object RealtimeIngest {

  /** Start ingesting `stream` (must carry `__time`) into `datasource`.
    * `watermark` e.g. "10 minutes" drops events later than the period —
    * pass None to accept everything. */
  def start(stream: DataFrame, store: SegmentStore, datasource: String,
      watermark: Option[String], checkpointDir: String,
      trigger: Trigger = Trigger.ProcessingTime("10 seconds")): StreamingQuery = {
    val withWm = watermark match {
      case Some(w) => stream.withWatermark("__time", w)
      case None    => stream
    }
    withWm.writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpointDir)
      .trigger(trigger)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        if (!batch.isEmpty) store.appendBatch(batch, datasource)
      }
      .start()
  }

  /** Windowed streaming aggregation with watermark-based late-data
    * handling: tumbling buckets of `granularity` (e.g. "1 hour"), rows
    * later than `watermark` past the max seen `__time` are dropped —
    * Druid's windowPeriod rejection semantics. Results are upserted into a
    * rolled-up datasource per completed window. */
  def windowedRollup(stream: DataFrame, store: SegmentStore, datasource: String,
      granularity: String, watermark: String, dims: Seq[String],
      aggExprs: Seq[org.apache.spark.sql.Column], checkpointDir: String)
      : StreamingQuery = {
    val agged = stream
      .withWatermark("__time", watermark)
      .groupBy((window(col("__time"), granularity) +: dims.map(col)): _*)
      .agg(aggExprs.head, aggExprs.tail: _*)
      .withColumn("__time", col("window.start"))
      .drop("window")
    agged.writeStream
      .outputMode("append") // watermark-closed windows only
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        if (!batch.isEmpty) store.appendBatch(batch, datasource)
      }
      .start()
  }
}
