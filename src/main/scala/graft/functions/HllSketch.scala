package graft.functions

import org.apache.spark.sql.{Column, GraftBridge}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Mergeable HyperLogLog sketches — Druid's `hyperUnique` complex metric
  * (reference `TOC.md:47`; SURVEY §2.3, §7.2): sketches are BUILT at ingest
  * into rollup segments (BinaryType column), MERGED at query time across
  * rolled-up rows, and FINALIZED to an approximate distinct count.
  *
  * Plain HLL (Flajolet et al.), p=11 → 2048 registers, ~1.6 KB per sketch,
  * relative error ≈ 1.04/√2048 ≈ 2.3%. The sketch layout is a bare
  * register array, so merge = elementwise max — associative and
  * commutative, which is what makes rollup re-aggregation correct.
  */
object Hll {
  val P = 11
  val M: Int = 1 << P // 2048 registers
  private val Alpha = 0.7213 / (1 + 1.079 / M)

  def emptySketch: Array[Byte] = new Array[Byte](M)

  /** 64-bit hash of a Catalyst value (type-dispatched). */
  def hash64(v: Any): Long = v match {
    case null => 0L
    case l: Long   => org.apache.spark.sql.catalyst.expressions.XXH64.hashLong(l, 42L)
    case i: Int    => org.apache.spark.sql.catalyst.expressions.XXH64.hashLong(i.toLong, 42L)
    case s: UTF8String =>
      org.apache.spark.sql.catalyst.expressions.XXH64.hashUnsafeBytes(
        s.getBaseObject, s.getBaseOffset, s.numBytes(), 42L)
    case d: Double => org.apache.spark.sql.catalyst.expressions.XXH64.hashLong(
      java.lang.Double.doubleToLongBits(d), 42L)
    case f: Float  => org.apache.spark.sql.catalyst.expressions.XXH64.hashLong(
      java.lang.Float.floatToIntBits(f).toLong, 42L)
    case b: Array[Byte] =>
      org.apache.spark.sql.catalyst.expressions.XXH64.hashUnsafeBytes(
        b, org.apache.spark.unsafe.Platform.BYTE_ARRAY_OFFSET, b.length, 42L)
    case other =>
      val bytes = other.toString.getBytes("UTF-8")
      org.apache.spark.sql.catalyst.expressions.XXH64.hashUnsafeBytes(
        bytes, org.apache.spark.unsafe.Platform.BYTE_ARRAY_OFFSET, bytes.length, 42L)
  }

  def add(registers: Array[Byte], v: Any): Unit = {
    if (v == null) return
    val h = hash64(v)
    val idx = (h >>> (64 - P)).toInt
    val w = h << P
    val rank = (if (w == 0) 64 - P else java.lang.Long.numberOfLeadingZeros(w)) + 1
    if (rank > (registers(idx) & 0xFF)) registers(idx) = rank.toByte
  }

  def merge(a: Array[Byte], b: Array[Byte]): Unit = {
    // a truncated/foreign binary is a corrupt sketch, not an index crash
    require(b.length == M,
      s"not an HLL sketch: expected $M register bytes, got ${b.length}")
    var i = 0
    while (i < M) {
      if ((b(i) & 0xFF) > (a(i) & 0xFF)) a(i) = b(i)
      i += 1
    }
  }

  def estimate(registers: Array[Byte]): Long = {
    var sum = 0.0
    var zeros = 0
    var i = 0
    while (i < M) {
      val r = registers(i) & 0xFF
      sum += 1.0 / (1L << r)
      if (r == 0) zeros += 1
      i += 1
    }
    val raw = Alpha * M.toDouble * M.toDouble / sum
    val est =
      if (raw <= 2.5 * M && zeros > 0) M * math.log(M.toDouble / zeros) // small-range
      else raw
    math.round(est)
  }
}

/** Aggregate: build an HLL sketch (binary) from raw values, or merge
  * pre-built sketches when the input column is already BinaryType sketches
  * (`mergeSketches = true`). */
case class HllSketchAgg(child: Expression, mergeSketches: Boolean,
    mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[Array[Byte]]
    with org.apache.spark.sql.catalyst.trees.UnaryLike[Expression] {

  override def dataType: DataType = BinaryType
  override def nullable: Boolean = false

  override def checkInputDataTypes(): TypeCheckResult =
    if (!mergeSketches) TypeCheckResult.TypeCheckSuccess // build hashes any type
    else child.dataType match {
      case BinaryType => TypeCheckResult.TypeCheckSuccess
      case t => TypeCheckResult.TypeCheckFailure(
        s"hll_sketch_merge requires binary sketch input, got ${t.simpleString} " +
          "(use hll_sketch_build to aggregate raw values)")
    }

  override def createAggregationBuffer(): Array[Byte] = Hll.emptySketch

  override def update(buffer: Array[Byte], input: InternalRow): Array[Byte] = {
    val v = child.eval(input)
    if (v != null) {
      if (mergeSketches) Hll.merge(buffer, v.asInstanceOf[Array[Byte]])
      else Hll.add(buffer, v)
    }
    buffer
  }

  override def merge(buffer: Array[Byte], other: Array[Byte]): Array[Byte] = {
    Hll.merge(buffer, other); buffer
  }

  override def eval(buffer: Array[Byte]): Any = buffer

  override def serialize(buffer: Array[Byte]): Array[Byte] = buffer
  override def deserialize(bytes: Array[Byte]): Array[Byte] = bytes

  override def withNewMutableAggBufferOffset(offset: Int): HllSketchAgg =
    copy(mutableAggBufferOffset = offset)
  override def withNewInputAggBufferOffset(offset: Int): HllSketchAgg =
    copy(inputAggBufferOffset = offset)
  override protected def withNewChildInternal(c: Expression): HllSketchAgg =
    copy(child = c)

  override def prettyName: String =
    if (mergeSketches) "hll_sketch_merge" else "hll_sketch_build"
}

/** Scalar: finalize a sketch to its approximate distinct count. */
case class HllSketchEstimate(child: Expression)
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = LongType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"hll_sketch_estimate requires binary sketch input, got ${t.simpleString}")
  }

  override def nullSafeEval(v: Any): Any = {
    val sk = v.asInstanceOf[Array[Byte]]
    require(sk.length == Hll.M,
      s"not an HLL sketch: expected ${Hll.M} register bytes, got ${sk.length}")
    Hll.estimate(sk)
  }

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

object HllFunctions {
  /** Aggregate raw values into a mergeable sketch (ingest-time, rollup). */
  def hll_sketch_build(c: Column): Column =
    GraftBridge.column(HllSketchAgg(GraftBridge.expression(c), mergeSketches = false)
      .toAggregateExpression())

  /** Aggregate pre-built sketches into one (query-time over rollup). */
  def hll_sketch_merge(c: Column): Column =
    GraftBridge.column(HllSketchAgg(GraftBridge.expression(c), mergeSketches = true)
      .toAggregateExpression())

  /** Finalize: sketch → approximate distinct count. */
  def hll_sketch_estimate(c: Column): Column =
    GraftBridge.column(HllSketchEstimate(GraftBridge.expression(c)))
}
