package graft.ingest

import graft.store.SegmentStore
import org.apache.spark.sql.SparkSession

import java.time.{Instant, LocalDate, ZoneOffset}

/** Segment maintenance policies — the Coordinator-rule analogue (reference
  * `arch/druid-arch.md:21-23`: Historicals load/drop segments under
  * Coordinator rules) plus the realtime handoff:
  *
  *  - compaction: streaming micro-batches leave many small files per chunk;
  *    chunks older than the hot window are rewritten to few files
  *    (the `append` task run as a policy),
  *  - retention: chunks older than the retention window are killed.
  */
object Compactor {

  private def chunkDate(chunk: String): LocalDate = LocalDate.parse(chunk)

  /** Compact every chunk strictly older than `olderThan` down to
    * `targetFiles`. Returns the compacted chunk ids. */
  def compactOlderThan(spark: SparkSession, store: SegmentStore, ds: String,
      olderThan: Instant, targetFiles: Int = 1): Seq[String] = {
    val cutoff = olderThan.atZone(ZoneOffset.UTC).toLocalDate
    val targets = store.readManifest(ds).segments
      .filter(s => chunkDate(s.chunk).isBefore(cutoff))
      .map(_.chunk).distinct.sorted
    targets.foreach(c => store.compactChunk(spark, ds, c, targetFiles))
    targets
  }

  /** Drop (kill) every chunk strictly older than `retainAfter`. Returns the
    * killed chunk ids. */
  def enforceRetention(store: SegmentStore, ds: String, retainAfter: Instant)
      : Seq[String] = {
    val cutoff = retainAfter.atZone(ZoneOffset.UTC).toLocalDate
    val targets = store.readManifest(ds).segments
      .filter(s => chunkDate(s.chunk).isBefore(cutoff))
      .map(_.chunk).distinct.sorted
    targets.foreach(c => store.killChunk(ds, c))
    targets
  }
}
