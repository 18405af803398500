package graft.sources

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path
import org.apache.parquet.hadoop.ParquetFileReader
import org.apache.parquet.hadoop.util.HadoopInputFile

/** Driver-side parquet-footer row counting — metadata reads, no Spark job.
  * Shared by IVF sample sizing (`Similarity.parquetFooterRowCount`) and
  * SegmentStore's post-write manifest row counts, so footer-handling policy
  * (error handling, future encrypted-footer support) lives in one place. */
object ParquetFooters {

  /** Record count of one parquet file from its footer. */
  def recordCount(file: Path, conf: Configuration): Long = {
    val r = ParquetFileReader.open(HadoopInputFile.fromPath(file, conf))
    try r.getRecordCount finally r.close()
  }

  /** Sum of record counts across parquet files. */
  def totalRecords(files: Iterable[String], conf: Configuration): Long =
    files.iterator.map(f => recordCount(new Path(f), conf)).sum
}
