package graft.ext

import org.apache.spark.sql.{DataFrame, Dataset, Row, SparkSession}
import org.apache.spark.sql.catalyst.encoders.RowEncoder
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column support (driver mandate): image/audio/video travel as
  * opaque `binary` columns with typed metadata; decode / feature-extract /
  * resize / frame-sample run per-partition in batches.
  *
  * The Spark-side plumbing — schema, partition-parallel batch shape,
  * deterministic output — is real and tested. Two codecs sit behind it:
  * the default `"stub"` (a deterministic closed-form fake the DuckDB oracle
  * can recompute — dimensions + a pixel-hash "feature" from the raw bytes)
  * and `"imageio"` (real PNG/JPEG/GIF/BMP decode via the JDK's
  * `javax.imageio`, with a luminance-grid feature). Audio/video codecs
  * aren't in the JDK; wiring e.g. JavaCV onto the executor classpath slots
  * into the same `decode(codec = ...)` seam without touching any plumbing.
  */
object Multimodal {

  /** Schema of a decoded media asset. */
  val mediaMetaSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("format", StringType, nullable = true),
    StructField("width", IntegerType, nullable = true),
    StructField("height", IntegerType, nullable = true),
    StructField("n_frames", IntegerType, nullable = true),
    StructField("feature", ArrayType(FloatType), nullable = true)))

  /** STUB decode: deterministic fake metadata + feature vector from raw
    * bytes. Replace with a real codec for production.
    *
    * The fake has a CLOSED-FORM spec so an independent engine (the DuckDB
    * oracle) can recompute it: h = Java `Arrays.hashCode(bytes)` (seed-1
    * 31-fold, int32 wrap); all divisions run on the nonnegative
    * `h & 0x7fffffff` so / and % have one well-defined semantics everywhere;
    * feature(i) is the same 31-fold with seed 7+i, scaled to [-1, 1). */
  private def decodeStub(id: Long, bytes: Array[Byte], featureDim: Int)
      : Row = {
    if (bytes == null || bytes.isEmpty) {
      Row(id, null, null, null, null, null)
    } else {
      def fold31(seed: Int): Int = {
        var x = seed; var j = 0
        while (j < bytes.length) { x = 31 * x + bytes(j); j += 1 }
        x
      }
      val h = fold31(1) // == java.util.Arrays.hashCode(bytes)
      val hu = h & 0x7fffffffL
      val fmt = (h & 3) match {
        case 0 => "png"; case 1 => "jpeg"; case 2 => "webp"; case _ => "gif"
      }
      val w = (64L + hu % 1024L).toInt
      val ht = (64L + (hu / 7L) % 1024L).toInt
      val frames = (1L + (hu / 13L) % 32L).toInt
      val feat = Array.tabulate(featureDim) { i =>
        (fold31(7 + i).toDouble / Int.MaxValue).toFloat
      }
      Row(id, fmt, w, ht, frames, feat.toSeq)
    }
  }

  /** REAL decode via `javax.imageio` (JDK-builtin: PNG/JPEG/GIF/BMP/WBMP).
    * format = the reader's canonical name, width/height from the decoded
    * raster, n_frames = `reader.getNumImages` (multi-frame GIFs > 1), and
    * feature = mean luminance of a √dim × √dim grid of equal pixel blocks,
    * scaled to [-1, 1) — deterministic and closed-form FROM THE PIXELS, so a
    * spec can recompute it from the same image independently.
    * Undecodable / non-image bytes yield a null-metadata row (id kept), the
    * same contract as the stub's empty-bytes case — one corrupt asset must
    * not fail a 100-TB scan. */
  private def decodeImageIO(id: Long, bytes: Array[Byte], featureDim: Int)
      : Row = {
    if (bytes == null || bytes.isEmpty) return Row(id, null, null, null, null, null)
    val iis = javax.imageio.ImageIO.createImageInputStream(
      new java.io.ByteArrayInputStream(bytes))
    try {
      val readers = javax.imageio.ImageIO.getImageReaders(iis)
      if (!readers.hasNext) return Row(id, null, null, null, null, null)
      val reader = readers.next()
      try {
        reader.setInput(iis, /*seekForwardOnly=*/ false, /*ignoreMetadata=*/ true)
        val fmt = reader.getFormatName.toLowerCase(java.util.Locale.ROOT)
        val img = reader.read(0)
        val (w, h) = (img.getWidth, img.getHeight)
        // allowSearch: GIF readers may need a full scan to count frames —
        // fine at this batch boundary; -1 (unknown) maps to 1
        val frames = math.max(reader.getNumImages(true), 1)
        val grid = math.max(math.sqrt(featureDim.toDouble).toInt, 1)
        val feat = new Array[Float](featureDim)
        var i = 0
        while (i < featureDim) {
          val (gx, gy) = (i % grid, (i / grid) % grid)
          val (x0, x1) = (gx * w / grid, math.max((gx + 1) * w / grid, gx * w / grid + 1))
          val (y0, y1) = (gy * h / grid, math.max((gy + 1) * h / grid, gy * h / grid + 1))
          var sum = 0.0; var n = 0
          var y = y0
          while (y < y1 && y < h) {
            var x = x0
            while (x < x1 && x < w) {
              val rgb = img.getRGB(x, y)
              // ITU-R BT.601 integer luma over the sRGB bytes
              sum += (299 * ((rgb >> 16) & 0xff) + 587 * ((rgb >> 8) & 0xff) +
                114 * (rgb & 0xff)) / 1000.0
              n += 1; x += 1
            }
            y += 1
          }
          feat(i) = if (n == 0) 0f else (sum / n / 128.0 - 1.0).toFloat
          i += 1
        }
        Row(id, fmt, w, h, frames, feat.toSeq)
      } finally reader.dispose()
    } catch {
      case scala.util.control.NonFatal(_) => Row(id, null, null, null, null, null)
    } finally iis.close()
  }

  /** Decode a binary media column into typed metadata + feature vectors.
    * Runs per-partition (executor-parallel); the per-partition iterator is
    * the batch boundary a real codec reuses its decoder state across.
    *
    * `codec` selects the implementation: `"stub"` (default — the closed-form
    * deterministic fake the DuckDB oracle can recompute, q27) or
    * `"imageio"` (real JDK PNG/JPEG/GIF/BMP decode, `decodeImageIO`).
    */
  def decode(df: DataFrame, idCol: String, binCol: String, featureDim: Int = 16,
             codec: String = "stub"): DataFrame = {
    val decodeOne: (Long, Array[Byte], Int) => Row = codec match {
      case "stub"    => decodeStub
      case "imageio" => decodeImageIO
      case other => throw new IllegalArgumentException(
        s"unknown codec '$other' (expected stub|imageio)")
    }
    val input = df.select(col(idCol).cast(LongType), col(binCol))
    val enc = RowEncoder.encoderFor(mediaMetaSchema)
    input.mapPartitions { it =>
      // batch-scoped decoder state would be initialized here (real codec).
      // null/uncastable ids keep their row (id -1) rather than NPE-ing the
      // task — Row.getLong on a null slot throws
      it.map(r => decodeOne(if (r.isNullAt(0)) -1L else r.getLong(0),
        r.getAs[Array[Byte]](1), featureDim))
    }(enc)
  }

  /** "Resize": recompute the stub feature at a different resolution —
    * demonstrates a transform stage over decoded assets that preserves the
    * partitioning of its input (no shuffle). */
  def resizeFeatures(decoded: DataFrame, newDim: Int): DataFrame =
    decoded.withColumn("feature",
      when(col("feature").isNull, lit(null))
        // repeat enough copies to COVER newDim before slicing — a single
        // concat(f, f) silently returned ragged arrays for newDim > 2×dim
        .otherwise(slice(
          flatten(array_repeat(col("feature"),
            (lit(newDim) / greatest(size(col("feature")), lit(1))).cast("int") + 1)),
          1, newDim)))

  /** Frame sampling for video-like assets: pick every `stride`-th frame
    * index up to n_frames. Pure expression — no shuffle, codegen'd. */
  def sampleFrames(decoded: DataFrame, stride: Int): DataFrame =
    decoded.withColumn("sampled_frames",
      when(col("n_frames").isNull, lit(null))
        // a 0-frame asset (corrupt/still from a real codec) yields an empty
        // array — sequence(0, -1) would throw on the executor
        .when(col("n_frames") <= 0, array().cast("array<int>"))
        .otherwise(sequence(lit(0), col("n_frames") - 1, lit(stride))))

  /** Build a synthetic media table from any source table (used by tests and
    * the verify harness — the fixtures ship no binary columns). */
  def syntheticMedia(spark: SparkSession, n: Int): DataFrame = {
    import spark.implicits._
    (0 until n).map { i =>
      (i.toLong, Array.tabulate[Byte](32 + i % 64)(j => ((i * 31 + j * 7) % 251).toByte))
    }.toDF("media_id", "content")
  }
}
