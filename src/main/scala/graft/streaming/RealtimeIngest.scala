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

  /** Parse a "10 minutes"-style duration into millis. */
  private[streaming] def durationMs(s: String): Long = {
    val parts = s.trim.toLowerCase.split("\\s+")
    require(parts.length == 2, s"duration '$s' must be '<n> <unit>'")
    val n = parts(0).toLong
    parts(1).stripSuffix("s") match {
      case "millisecond" => n
      case "second"      => n * 1000L
      case "minute"      => n * 60000L
      case "hour"        => n * 3600000L
      case "day"         => n * 86400000L
      case u => throw new IllegalArgumentException(s"unknown duration unit '$u'")
    }
  }

  /** Start ingesting `stream` (must carry `__time`) into `datasource`.
    * `watermark` e.g. "10 minutes" drops events later than the period
    * behind the max event time seen — pass None to accept everything.
    *
    * Late rejection is enforced EXPLICITLY in the batch sink:
    * `withWatermark` alone only filters rows inside stateful operators, and
    * this path has none — without the explicit filter every late event
    * would silently land in a segment. The high-watermark is process-local
    * (re-seeded from the first batch after a restart), matching the
    * reference's realtime-node window semantics (`data-ingest/kis.md`).
    *
    * Replay safety: each batch carries its batchId into the segment
    * manifest; a micro-batch retried after a crash between the parquet
    * append and the checkpoint commit is SKIPPED instead of double-writing
    * its rows — this is what makes the documented exactly-once hold. */
  def start(stream: DataFrame, store: SegmentStore, datasource: String,
      watermark: Option[String], checkpointDir: String,
      trigger: Trigger = Trigger.ProcessingTime("10 seconds")): StreamingQuery = {
    val lateMs = watermark.map(durationMs)
    // process-local high-watermark of event time, advanced per batch
    val maxSeenMs = new java.util.concurrent.atomic.AtomicLong(Long.MinValue)
    stream.writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpointDir)
      .trigger(trigger)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        if (!batch.isEmpty) {
          val accepted = lateMs match {
            case Some(ms) =>
              val horizon = maxSeenMs.get() match {
                case Long.MinValue => Long.MinValue
                case seen          => seen - ms
              }
              val kept =
                if (horizon == Long.MinValue) batch
                else batch.where(col("__time") >=
                  new java.sql.Timestamp(horizon))
              val batchMax = batch.agg(max(col("__time"))).head().getTimestamp(0)
              if (batchMax != null)
                maxSeenMs.getAndUpdate(m => math.max(m, batchMax.getTime))
              kept
            case None => batch
          }
          store.appendBatch(accepted, datasource, Some(batchId))
        }
      }
      .start()
  }

  /** Exactly-once streaming ingest with CROSS-BATCH content dedup — the
    * streaming face of `Dedup.exact`: rows whose `dedupKeys` (e.g. a
    * content fingerprint) were already accepted within the watermark
    * window are dropped before they ever reach a segment. Built on
    * `dropDuplicatesWithinWatermark`, so the dedup state is
    * checkpoint-backed (replay-consistent across restarts — the same
    * guarantee chain as `start`'s batchId replay guard) and BOUNDED: state
    * for a key is dropped once the event-time watermark passes it, which
    * is what keeps state size ∝ keys-per-window instead of keys-ever-seen
    * on an unbounded stream. The documented trade: a duplicate arriving
    * later than `watermark` past its first occurrence re-enters — batch
    * compaction's exact dedup is the backstop for that tail, exactly how
    * a streaming+batch pipeline splits the work at scale. */
  def startDeduped(stream: DataFrame, store: SegmentStore, datasource: String,
      dedupKeys: Seq[String], watermark: String, checkpointDir: String,
      trigger: Trigger = Trigger.ProcessingTime("10 seconds")): StreamingQuery = {
    require(dedupKeys.nonEmpty, "startDeduped needs at least one dedup key")
    stream
      .withWatermark("__time", watermark)
      .dropDuplicatesWithinWatermark(dedupKeys)
      .writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpointDir)
      .trigger(trigger)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        // batchId makes a post-crash replay a no-op (see start())
        if (!batch.isEmpty) store.appendBatch(batch, datasource, Some(batchId))
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
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        // batchId makes a post-crash replay a no-op (see start())
        if (!batch.isEmpty) store.appendBatch(batch, datasource, Some(batchId))
      }
      .start()
  }
}
