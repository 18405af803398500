package graft.functions

import org.apache.spark.sql.{Column, GraftBridge}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.HyperLogLogPlusPlusHelper
import org.apache.spark.sql.types._

/** HLL++ sketch WORDS as a mergeable value — the partial form of the
  * engine's raw-column `hyperUnique`/`cardinality` compile (which is
  * Spark's built-in `approx_count_distinct` at rsd 0.023; reference
  * hyperUnique complex metric `TOC.md:47`, and Druid's per-segment
  * partial-aggregate scatter-gather `arch/druid-arch.md:38-40`).
  *
  * The fragment cache needs day-level SKETCH partials (finalized estimates
  * don't merge — they double-count across days), and those partials must
  * finalize to the SAME estimate the whole-query plan produces. Both are
  * guaranteed by construction here: this aggregate drives the same
  * `HyperLogLogPlusPlusHelper` (same rsd, same xxhash64 seed, same register
  * layout) that backs `approx_count_distinct`, and HLL++ register update /
  * merge is an elementwise max — associative and commutative — so per-day
  * register words merged in any grouping equal the whole-bucket words
  * bit-for-bit, and `query` finalizes both to the same Long.
  */
object Hllpp {
  /** The engine's hyperUnique precision (`Compilers.aggCol`): rsd 0.023 →
    * the same p as `approx_count_distinct(c, 0.023)`. */
  val Rsd = 0.023

  // deterministic pure function of Rsd; Serializable, shared per-JVM
  val helper = new HyperLogLogPlusPlusHelper(Rsd)
  val numWords: Int = helper.numWords

  def newBuffer(): SpecificInternalRow =
    new SpecificInternalRow(Seq.fill(numWords)(LongType))

  def toBytes(buf: InternalRow): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(numWords * 8)
    var i = 0
    while (i < numWords) { bb.putLong(buf.getLong(i)); i += 1 }
    bb.array()
  }

  def fromBytes(bytes: Array[Byte]): SpecificInternalRow = {
    require(bytes.length == numWords * 8,
      s"not an HLL++ sketch: expected ${numWords * 8} bytes, got ${bytes.length}")
    val buf = newBuffer()
    val bb = java.nio.ByteBuffer.wrap(bytes)
    var i = 0
    while (i < numWords) { buf.setLong(i, bb.getLong()); i += 1 }
    buf
  }

  /** Driver-side merge for the serve-time partial merge. */
  def mergeInto(acc: SpecificInternalRow, bytes: Array[Byte]): Unit =
    helper.merge(acc, fromBytes(bytes), 0, 0)

  /** Finalize to the `approx_count_distinct` estimate. */
  def estimate(acc: InternalRow): Long = helper.query(acc, 0)
}

/** Aggregate raw values into HLL++ register words (binary). Identical
  * update/merge path to `approx_count_distinct(child, Hllpp.Rsd)` — only
  * the finalization differs: this emits the mergeable words instead of the
  * estimate. */
case class HllppSketchAgg(child: Expression,
    mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[SpecificInternalRow]
    with org.apache.spark.sql.catalyst.trees.UnaryLike[Expression] {

  override def dataType: DataType = BinaryType
  override def nullable: Boolean = false

  override def createAggregationBuffer(): SpecificInternalRow = Hllpp.newBuffer()

  override def update(buffer: SpecificInternalRow, input: InternalRow)
      : SpecificInternalRow = {
    val v = child.eval(input)
    if (v != null) Hllpp.helper.update(buffer, 0, v, child.dataType)
    buffer
  }

  override def merge(buffer: SpecificInternalRow, other: SpecificInternalRow)
      : SpecificInternalRow = {
    Hllpp.helper.merge(buffer, other, 0, 0)
    buffer
  }

  override def eval(buffer: SpecificInternalRow): Any = Hllpp.toBytes(buffer)

  override def serialize(buffer: SpecificInternalRow): Array[Byte] =
    Hllpp.toBytes(buffer)
  override def deserialize(bytes: Array[Byte]): SpecificInternalRow =
    Hllpp.fromBytes(bytes)

  override def withNewMutableAggBufferOffset(offset: Int): HllppSketchAgg =
    copy(mutableAggBufferOffset = offset)
  override def withNewInputAggBufferOffset(offset: Int): HllppSketchAgg =
    copy(inputAggBufferOffset = offset)
  override protected def withNewChildInternal(c: Expression): HllppSketchAgg =
    copy(child = c)

  override def prettyName: String = "hllpp_sketch_words"
}

/** Scalar: finalize HLL++ words to the `approx_count_distinct` estimate. */
case class HllppEstimate(child: Expression)
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = LongType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"hllpp_estimate requires binary sketch input, got ${t.simpleString}")
  }

  override def nullSafeEval(v: Any): Any =
    Hllpp.estimate(Hllpp.fromBytes(v.asInstanceOf[Array[Byte]]))

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

object HllppFunctions {
  /** Aggregate raw values into mergeable HLL++ words (binary). */
  def hllpp_sketch_words(c: Column): Column =
    GraftBridge.column(HllppSketchAgg(GraftBridge.expression(c))
      .toAggregateExpression())

  /** Finalize words → the `approx_count_distinct`-identical estimate. */
  def hllpp_estimate(c: Column): Column =
    GraftBridge.column(HllppEstimate(GraftBridge.expression(c)))
}
