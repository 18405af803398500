package graft.functions

import org.apache.spark.sql.{Column, GraftBridge}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, CodegenFallback, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Native Catalyst expressions for the vector-similarity hot path.
  *
  * The `functions._` route (zip_with + aggregate) works but higher-order
  * functions don't participate in whole-stage codegen — per-pair lambda
  * interpretation dominates ANN re-rank cost. These expressions generate a
  * tight primitive loop instead (~100× per-row improvement on 64-dim
  * vectors), the preference order SURVEY §4 prescribes: built-ins where
  * possible, a custom `Expression` with `doGenCode` where the built-ins
  * can't express the shape efficiently.
  */
abstract class BinaryVectorExpression extends BinaryExpression with Serializable {

  private def okType(t: DataType): Boolean = t match {
    case ArrayType(FloatType, _) | ArrayType(DoubleType, _) => true
    case _ => false
  }

  override def checkInputDataTypes(): TypeCheckResult =
    if (okType(left.dataType) && okType(right.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<float>/array<double> inputs, " +
        s"got ${left.dataType.simpleString}, ${right.dataType.simpleString}")

  override def dataType: DataType = DoubleType

  protected def elemAccessor(t: DataType): String =
    t.asInstanceOf[ArrayType].elementType match {
      case FloatType => "getFloat"
      case _         => "getDouble"
    }

  protected def elemAt(a: ArrayData, t: DataType, i: Int): Double =
    t.asInstanceOf[ArrayType].elementType match {
      case FloatType => a.getFloat(i).toDouble
      case _         => a.getDouble(i)
    }
}

/** Dot product of two numeric arrays (min-length semantics). */
case class VectorDot(left: Expression, right: Expression)
    extends BinaryVectorExpression {

  override def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]; val b = r.asInstanceOf[ArrayData]
    val n = math.min(a.numElements(), b.numElements())
    var dot = 0.0; var i = 0
    while (i < n) {
      if (!a.isNullAt(i) && !b.isNullAt(i))
        dot += elemAt(a, left.dataType, i) * elemAt(b, right.dataType, i)
      i += 1
    }
    dot
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val (ga, gb) = (elemAccessor(left.dataType), elemAccessor(right.dataType))
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i"); val n = ctx.freshName("n")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double ${ev.value}_acc = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  if (!$a.isNullAt($i) && !$b.isNullAt($i)) {
         |    ${ev.value}_acc += (double) $a.$ga($i) * (double) $b.$gb($i);
         |  }
         |}
         |${ev.value} = ${ev.value}_acc;
       """.stripMargin
    })
  }

  override protected def withNewChildrenInternal(l: Expression, r: Expression)
      : Expression = copy(left = l, right = r)
}

/** Cosine similarity of two numeric arrays; 0.0 when either norm is 0. */
case class CosineSimilarity(left: Expression, right: Expression)
    extends BinaryVectorExpression {

  override def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]; val b = r.asInstanceOf[ArrayData]
    val n = math.min(a.numElements(), b.numElements())
    var dot = 0.0; var na = 0.0; var nb = 0.0; var i = 0
    while (i < n) {
      if (!a.isNullAt(i) && !b.isNullAt(i)) {
        val x = elemAt(a, left.dataType, i); val y = elemAt(b, right.dataType, i)
        dot += x * y; na += x * x; nb += y * y
      }
      i += 1
    }
    if (na == 0.0 || nb == 0.0) 0.0
    else dot / (math.sqrt(na) * math.sqrt(nb))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val (ga, gb) = (elemAccessor(left.dataType), elemAccessor(right.dataType))
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i"); val n = ctx.freshName("n")
      val dot = ctx.freshName("dot"); val na = ctx.freshName("na")
      val nb = ctx.freshName("nb"); val x = ctx.freshName("x"); val y = ctx.freshName("y")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $dot = 0.0; double $na = 0.0; double $nb = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  if (!$a.isNullAt($i) && !$b.isNullAt($i)) {
         |    double $x = (double) $a.$ga($i); double $y = (double) $b.$gb($i);
         |    $dot += $x * $y; $na += $x * $x; $nb += $y * $y;
         |  }
         |}
         |${ev.value} = ($na == 0.0 || $nb == 0.0)
         |  ? 0.0 : $dot / (java.lang.Math.sqrt($na) * java.lang.Math.sqrt($nb));
       """.stripMargin
    })
  }

  override protected def withNewChildrenInternal(l: Expression, r: Expression)
      : Expression = copy(left = l, right = r)
}

/** LSH sign-bit signature: vec ⋅ each row of a constant plane matrix → bit
  * array. One expression evaluating the whole matrix in a primitive loop
  * (the matrix is baked into the generated code as a 2-D double array). */
case class HyperplaneSignBits(child: Expression, planes: Array[Array[Double]])
    extends UnaryExpression with Serializable {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) | ArrayType(DoubleType, _) =>
      TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<float>/array<double> input, got ${t.simpleString}")
  }

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)

  private def isFloat = child.dataType.asInstanceOf[ArrayType].elementType == FloatType

  override def nullSafeEval(v: Any): Any = {
    val a = v.asInstanceOf[ArrayData]
    val dim = a.numElements()
    val bits = new Array[Int](planes.length)
    var p = 0
    while (p < planes.length) {
      val plane = planes(p)
      var dot = 0.0; var i = 0
      val n = math.min(dim, plane.length)
      while (i < n) {
        val x = if (isFloat) a.getFloat(i).toDouble else a.getDouble(i)
        dot += x * plane(i); i += 1
      }
      bits(p) = if (dot >= 0.0) 1 else 0
      p += 1
    }
    ArrayData.toArrayData(bits)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val acc = if (isFloat) "getFloat" else "getDouble"
    val planesRef = ctx.addReferenceObj("planes", planes, "double[][]")
    nullSafeCodeGen(ctx, ev, a => {
      val p = ctx.freshName("p"); val i = ctx.freshName("i")
      val dot = ctx.freshName("dot"); val bits = ctx.freshName("bits")
      val n = ctx.freshName("n")
      s"""
         |int[] $bits = new int[$planesRef.length];
         |for (int $p = 0; $p < $planesRef.length; $p++) {
         |  double $dot = 0.0;
         |  int $n = java.lang.Math.min($a.numElements(), $planesRef[$p].length);
         |  for (int $i = 0; $i < $n; $i++) {
         |    $dot += (double) $a.$acc($i) * $planesRef[$p][$i];
         |  }
         |  $bits[$p] = ($dot >= 0.0) ? 1 : 0;
         |}
         |${ev.value} = org.apache.spark.sql.catalyst.util.ArrayData.toArrayData($bits);
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** Pack a 0/1 int-array (e.g. `HyperplaneSignBits` output) into
  * `ceil(n/64)` longs — bit i lands in word i/64 at position i%64. Lets
  * signatures longer than 64 bits travel the candidate shuffle as two
  * longs (16 bytes) instead of an int array, and makes the agreement
  * prefilter a pair of XOR+popcounts. */
case class PackBits(child: Expression)
    extends UnaryExpression with Serializable {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(IntegerType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<int> input, got ${t.simpleString}")
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def nullSafeEval(v: Any): Any = {
    val a = v.asInstanceOf[ArrayData]
    val n = a.numElements()
    val words = new Array[Long]((n + 63) / 64)
    var i = 0
    while (i < n) {
      if (!a.isNullAt(i) && a.getInt(i) != 0) words(i / 64) |= 1L << (i & 63)
      i += 1
    }
    ArrayData.toArrayData(words)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val i = ctx.freshName("i"); val n = ctx.freshName("n")
      val words = ctx.freshName("words")
      s"""
         |int $n = $a.numElements();
         |long[] $words = new long[($n + 63) / 64];
         |for (int $i = 0; $i < $n; $i++) {
         |  if (!$a.isNullAt($i) && $a.getInt($i) != 0) {
         |    $words[$i / 64] |= 1L << ($i & 63);
         |  }
         |}
         |${ev.value} = org.apache.spark.sql.catalyst.util.ArrayData.toArrayData($words);
       """.stripMargin
    })

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** Extend a hyperplane sign-bit signature WITHOUT re-hashing its prefix:
  * the first `nOld` bits are unpacked from an already-computed packed
  * signature (`PackBits` layout — bit i in word i/64 at position i%64) and
  * the remaining `deltaPlanes.length` bits are computed fresh from the
  * vector. Because [[graft.ext.Similarity]] derives plane matrices
  * row-major from one seeded LCG, `planes(seed, n1, dim)` is a strict
  * PREFIX of `planes(seed, n2, dim)` for n1 < n2 — so
  * `extend(vec, pack(sig(n1)), n1, planes(n2).drop(n1)) == sig(n2)`
  * bit-for-bit (ExtSpec-pinned). This is the self-resize retry's hash
  * pass: the probe geometry's dot products are never recomputed, only the
  * delta planes are evaluated, roughly halving the flood-regime re-hash
  * cost that dominated the 4th-decade cosine near-dup completion. */
case class ExtendSignBits(left: Expression, right: Expression,
    nOld: Int, deltaPlanes: Array[Array[Double]])
    extends BinaryExpression with Serializable {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(FloatType, _) | ArrayType(DoubleType, _),
            ArrayType(LongType, _)) => TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires (array<float|double>, array<long>), got " +
          s"${l.simpleString} and ${r.simpleString}")
    }

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)

  private def isFloat = left.dataType.asInstanceOf[ArrayType].elementType == FloatType

  override def nullSafeEval(v: Any, packed: Any): Any = {
    val a = v.asInstanceOf[ArrayData]
    val w = packed.asInstanceOf[ArrayData]
    val dim = a.numElements()
    val bits = new Array[Int](nOld + deltaPlanes.length)
    var i = 0
    while (i < nOld) {
      bits(i) = ((w.getLong(i / 64) >>> (i & 63)) & 1L).toInt
      i += 1
    }
    var p = 0
    while (p < deltaPlanes.length) {
      val plane = deltaPlanes(p)
      var dot = 0.0; var j = 0
      val n = math.min(dim, plane.length)
      while (j < n) {
        val x = if (isFloat) a.getFloat(j).toDouble else a.getDouble(j)
        dot += x * plane(j); j += 1
      }
      bits(nOld + p) = if (dot >= 0.0) 1 else 0
      p += 1
    }
    ArrayData.toArrayData(bits)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val acc = if (isFloat) "getFloat" else "getDouble"
    val planesRef = ctx.addReferenceObj("deltaPlanes", deltaPlanes, "double[][]")
    nullSafeCodeGen(ctx, ev, (a, w) => {
      val p = ctx.freshName("p"); val i = ctx.freshName("i")
      val j = ctx.freshName("j"); val dot = ctx.freshName("dot")
      val bits = ctx.freshName("bits"); val n = ctx.freshName("n")
      s"""
         |int[] $bits = new int[$nOld + $planesRef.length];
         |for (int $i = 0; $i < $nOld; $i++) {
         |  $bits[$i] = (int) (($w.getLong($i / 64) >>> ($i & 63)) & 1L);
         |}
         |for (int $p = 0; $p < $planesRef.length; $p++) {
         |  double $dot = 0.0;
         |  int $n = java.lang.Math.min($a.numElements(), $planesRef[$p].length);
         |  for (int $j = 0; $j < $n; $j++) {
         |    $dot += (double) $a.$acc($j) * $planesRef[$p][$j];
         |  }
         |  $bits[$nOld + $p] = ($dot >= 0.0) ? 1 : 0;
         |}
         |${ev.value} = org.apache.spark.sql.catalyst.util.ArrayData.toArrayData($bits);
       """.stripMargin
    })
  }

  override protected def withNewChildrenInternal(l: Expression, r: Expression)
      : Expression = copy(left = l, right = r)
}

/** Hamming distance between two packed bit signatures (`array<long>`,
  * compared over the common prefix): sum of per-word XOR popcounts. */
case class LongArrayHamming(left: Expression, right: Expression)
    extends BinaryExpression with Serializable {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(LongType, _), ArrayType(LongType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires two array<long> inputs, got " +
          s"${l.simpleString} and ${r.simpleString}")
    }

  override def dataType: DataType = IntegerType

  override def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]; val b = r.asInstanceOf[ArrayData]
    val n = math.min(a.numElements(), b.numElements())
    var h = 0; var i = 0
    while (i < n) {
      h += java.lang.Long.bitCount(a.getLong(i) ^ b.getLong(i))
      i += 1
    }
    h
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i"); val n = ctx.freshName("n")
      val h = ctx.freshName("h")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |int $h = 0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $h += java.lang.Long.bitCount($a.getLong($i) ^ $b.getLong($i));
         |}
         |${ev.value} = $h;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(l: Expression, r: Expression)
      : Expression = copy(left = l, right = r)
}

/** Top-`probe` nearest centroids of a vector against a baked-in centroid
  * matrix (by dot product against L2-normalized centroids ≈ cosine order).
  * Returns the centroid indices, most-similar first — the IVF assignment /
  * probe primitive. */
case class NearestCentroids(child: Expression, centroids: Array[Array[Double]],
    probe: Int) extends UnaryExpression with CodegenFallback with Serializable {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) | ArrayType(DoubleType, _) =>
      TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<float>/array<double> input, got ${t.simpleString}")
  }

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)

  private def isFloat = child.dataType.asInstanceOf[ArrayType].elementType == FloatType

  // normalize once so dot order == cosine order (the canonical rule lives
  // in the companion, shared with driver-side Lloyd)
  @transient private lazy val normed: Array[Array[Double]] =
    NearestCentroids.normalize(centroids)

  override def nullSafeEval(v: Any): Any = {
    val a = v.asInstanceOf[ArrayData]
    val dim = a.numElements()
    // copy the vector to a primitive array ONCE: ArrayData element access
    // is a virtual dispatch, and the centroid loop reads each element k
    // times (k = thousands at the k∝n regimes)
    val x = new Array[Double](dim)
    var i = 0
    while (i < dim) {
      x(i) = if (isFloat) a.getFloat(i).toDouble else a.getDouble(i); i += 1
    }
    val k = normed.length
    val p = math.min(probe, k)
    // p == 0 (probe <= 0 or an empty centroid matrix): the selection loop
    // below would index topScore(-1); the sort-based path returned [] here
    if (p <= 0)
      return org.apache.spark.sql.catalyst.util.ArrayData.toArrayData(
        Array.empty[Int])
    // bounded top-p selection, scores descending, ties → LOWER centroid
    // index (the stable-sort rule shared with bestCentroid): the previous
    // `zipWithIndex.sortBy` boxed and TimSorted all k scores PER ROW —
    // the r17 sf100 find (8,000 centroids × 5M rows turned q74's
    // assignment stage into a 30-minute single-straggler grind)
    val topIdx = new Array[Int](p)
    val topScore = new Array[Double](p)
    var filled = 0
    var ci = 0
    while (ci < k) {
      val c = normed(ci)
      var dot = 0.0; var j = 0
      val n = math.min(dim, c.length)
      while (j < n) { dot += x(j) * c(j); j += 1 }
      if (filled < p || dot > topScore(filled - 1)) {
        // insertion point: move up only past STRICTLY smaller scores, so
        // an equal score keeps the earlier (lower) centroid index first
        var pos = if (filled < p) filled else p - 1
        while (pos > 0 && dot > topScore(pos - 1)) pos -= 1
        var m = math.min(filled, p - 1)
        while (m > pos) {
          topScore(m) = topScore(m - 1); topIdx(m) = topIdx(m - 1); m -= 1
        }
        topScore(pos) = dot; topIdx(pos) = ci
        if (filled < p) filled += 1
      }
      ci += 1
    }
    org.apache.spark.sql.catalyst.util.ArrayData.toArrayData(
      if (filled == p) topIdx else topIdx.take(filled))
  }

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** The CANONICAL centroid-assignment semantics, shared by the expression
  * above and `Similarity.buildIvfCentroids`' driver-side Lloyd arm:
  * centroids L2-normalized, raw-vector dot against each, highest dot
  * wins, LOWEST index on ties (the expression's stable sort and
  * [[bestCentroid]]'s strict `>` agree). Keeping one definition here —
  * with ExtSpec pinning the expression against [[bestCentroid]] — stops
  * the two arms from drifting apart, which would make centroid builds
  * depend on whether the sample crossed the in-memory threshold. */
object NearestCentroids {
  def normalize(centroids: Array[Array[Double]]): Array[Array[Double]] =
    centroids.map { c =>
      val n = math.sqrt(c.map(x => x * x).sum)
      if (n == 0) c else c.map(_ / n)
    }

  /** Index of the best centroid for `v` against PRE-NORMALIZED centroids. */
  def bestCentroid(v: Array[Double], normed: Array[Array[Double]]): Int = {
    var best = 0; var bestDot = Double.NegativeInfinity
    var ci = 0
    while (ci < normed.length) {
      val c = normed(ci)
      var dot = 0.0; var i = 0
      val m = math.min(v.length, c.length)
      while (i < m) { dot += v(i) * c(i); i += 1 }
      if (dot > bestDot) { bestDot = dot; best = ci }
      ci += 1
    }
    best
  }
}

/** Nearest-centroid assignment WITH the cosine to the assigned centroid:
  * `struct(cluster int, cosine double)`. One pass over the baked-in
  * centroid matrix per row — the scalar companion of [[NearestCentroids]]
  * for operators that rank by prototypicality (`Similarity.clusterSample`).
  *
  * Replaces an O(k) literal CASE chain over the centroid table (fine at
  * k=8, blows codegen's method-size limits at the k∝n regimes the
  * SemDeDup family documents — VERDICT r11 #2): the generated code here is
  * one fixed-size loop whatever k is, so whole-stage codegen stays live at
  * thousands of centroids.
  *
  * Semantics pinned to the incumbents so results are bit-identical:
  * assignment is [[NearestCentroids]]' (dot against L2-NORMALIZED
  * centroids, highest wins, lowest index on ties — stable under the
  * strict `>`), and the returned cosine replays [[CosineSimilarity]]
  * against the RAW winning centroid in its exact accumulation order
  * (`dot/√(Σx²)·√(Σy²)`, 0.0 when either norm is 0) — NOT the normalized
  * dot divided by the row norm, which differs in final ulps and would
  * flip rounded scores at decimal boundaries. */
case class CentroidBestCosine(child: Expression, centroids: Array[Array[Double]])
    extends UnaryExpression with Serializable {

  require(centroids.nonEmpty, "need at least one centroid")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) | ArrayType(DoubleType, _) =>
      TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<float>/array<double> input, got ${t.simpleString}")
  }

  override def dataType: DataType = StructType(Seq(
    StructField("cluster", IntegerType, nullable = false),
    StructField("cosine", DoubleType, nullable = false)))

  private def isFloat = child.dataType.asInstanceOf[ArrayType].elementType == FloatType

  @transient private lazy val normed: Array[Array[Double]] =
    NearestCentroids.normalize(centroids)

  override def nullSafeEval(v: Any): Any = {
    val a = v.asInstanceOf[ArrayData]
    val dim = a.numElements()
    var best = 0; var bestDot = Double.NegativeInfinity
    var ci = 0
    while (ci < normed.length) {
      val c = normed(ci)
      var dot = 0.0; var i = 0
      val n = math.min(dim, c.length)
      while (i < n) {
        val x = if (isFloat) a.getFloat(i).toDouble else a.getDouble(i)
        dot += x * c(i); i += 1
      }
      if (dot > bestDot) { bestDot = dot; best = ci }
      ci += 1
    }
    // CosineSimilarity's accumulation, verbatim, against the raw winner
    val w = centroids(best)
    val n = math.min(dim, w.length)
    var dot = 0.0; var na = 0.0; var nb = 0.0; var i = 0
    while (i < n) {
      if (!a.isNullAt(i)) {
        val x = if (isFloat) a.getFloat(i).toDouble else a.getDouble(i)
        val y = w(i)
        dot += x * y; na += x * x; nb += y * y
      }
      i += 1
    }
    val cos = if (na == 0.0 || nb == 0.0) 0.0
      else dot / (math.sqrt(na) * math.sqrt(nb))
    InternalRow(best, cos)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val acc = if (isFloat) "getFloat" else "getDouble"
    val normedRef = ctx.addReferenceObj("normed", normed, "double[][]")
    val rawRef = ctx.addReferenceObj("centroids", centroids, "double[][]")
    nullSafeCodeGen(ctx, ev, a => {
      val ci = ctx.freshName("ci"); val i = ctx.freshName("i")
      val dim = ctx.freshName("dim"); val n = ctx.freshName("n")
      val dot = ctx.freshName("dot"); val best = ctx.freshName("best")
      val bestDot = ctx.freshName("bestDot"); val w = ctx.freshName("w")
      val na = ctx.freshName("na"); val nb = ctx.freshName("nb")
      val x = ctx.freshName("x"); val y = ctx.freshName("y")
      val cos = ctx.freshName("cos")
      s"""
         |int $dim = $a.numElements();
         |int $best = 0; double $bestDot = Double.NEGATIVE_INFINITY;
         |for (int $ci = 0; $ci < $normedRef.length; $ci++) {
         |  double $dot = 0.0;
         |  int $n = java.lang.Math.min($dim, $normedRef[$ci].length);
         |  for (int $i = 0; $i < $n; $i++) {
         |    $dot += (double) $a.$acc($i) * $normedRef[$ci][$i];
         |  }
         |  if ($dot > $bestDot) { $bestDot = $dot; $best = $ci; }
         |}
         |double[] $w = $rawRef[$best];
         |int $n = java.lang.Math.min($dim, $w.length);
         |double $dot = 0.0; double $na = 0.0; double $nb = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  if (!$a.isNullAt($i)) {
         |    double $x = (double) $a.$acc($i); double $y = $w[$i];
         |    $dot += $x * $y; $na += $x * $x; $nb += $y * $y;
         |  }
         |}
         |double $cos = ($na == 0.0 || $nb == 0.0)
         |  ? 0.0 : $dot / (java.lang.Math.sqrt($na) * java.lang.Math.sqrt($nb));
         |${ev.value} = new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
         |  new Object[] { $best, $cos });
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** Symmetric int8 quantization of an embedding vector:
  * `struct(scale double, q array<tinyint>)` with
  * `scale = max|v| / 127` and `q[i] = clamp(floor(v[i]/scale + 0.5), -127, 127)`.
  * `floor(x + 0.5)`, NOT round-half-even: the rule is one every engine
  * (and the DuckDB oracle) reproduces exactly in plain arithmetic, which
  * makes a quantized corpus re-derivable. An all-zero vector quantizes to
  * scale 0 with all-zero codes. 4 bytes/dim → 1 byte/dim: the storage
  * step an IVF-style index takes before shipping vectors to a shuffle. */
case class QuantizeInt8(child: Expression)
    extends UnaryExpression with CodegenFallback with Serializable {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) | ArrayType(DoubleType, _) =>
      TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<float>/array<double> input, got ${t.simpleString}")
  }

  override def dataType: DataType = StructType(Seq(
    StructField("scale", DoubleType, nullable = false),
    StructField("q", ArrayType(ByteType, containsNull = false), nullable = false)))

  private def isFloat = child.dataType.asInstanceOf[ArrayType].elementType == FloatType

  override def nullSafeEval(v: Any): Any = {
    val a = v.asInstanceOf[ArrayData]
    val n = a.numElements()
    var maxAbs = 0.0; var i = 0
    while (i < n) {
      // REJECT null elements instead of coercing them to code 0: the output
      // array declares containsNull=false, so a silent null→0 would turn
      // missing data into a real value with no way to recover the null-ness
      // downstream (ADVICE r9). Filter or impute upstream.
      if (a.isNullAt(i))
        throw new IllegalArgumentException(
          s"quantize_int8: null element at index $i — int8 codes cannot " +
            "represent missing dimensions; filter or impute null elements " +
            "before quantizing")
      val x = math.abs(if (isFloat) a.getFloat(i).toDouble else a.getDouble(i))
      if (x > maxAbs) maxAbs = x
      i += 1
    }
    val scale = maxAbs / 127.0
    val q = new Array[Byte](n)
    if (scale > 0.0) {
      i = 0
      while (i < n) {
        val x = if (isFloat) a.getFloat(i).toDouble else a.getDouble(i)
        val c = math.floor(x / scale + 0.5)
        q(i) = math.max(-127.0, math.min(127.0, c)).toByte
        i += 1
      }
    }
    InternalRow(scale, ArrayData.toArrayData(q))
  }

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** Inverse of [[QuantizeInt8]]: `q[i] * scale` as `array<double>`. */
case class DequantizeInt8(child: Expression)
    extends UnaryExpression with CodegenFallback with Serializable {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StructType(Array(
      StructField("scale", DoubleType, _, _),
      StructField("q", ArrayType(ByteType, _), _, _))) =>
      TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires struct<scale double, q array<tinyint>> input, " +
        s"got ${t.simpleString}")
  }

  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)

  override def nullSafeEval(v: Any): Any = {
    val row = v.asInstanceOf[InternalRow]
    val scale = row.getDouble(0)
    val q = row.getArray(1)
    val n = q.numElements()
    val out = new Array[Double](n)
    var i = 0
    while (i < n) { out(i) = q.getByte(i) * scale; i += 1 }
    ArrayData.toArrayData(out)
  }

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** max_i |a[i] - b[i]| over the common prefix — the reconstruction-error
  * probe for quantization sweeps (codegen'd: runs inside the scan stage). */
case class VectorMaxAbsDiff(left: Expression, right: Expression)
    extends BinaryVectorExpression {

  override def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]; val b = r.asInstanceOf[ArrayData]
    val n = math.min(a.numElements(), b.numElements())
    var m = 0.0; var i = 0
    while (i < n) {
      if (!a.isNullAt(i) && !b.isNullAt(i)) {
        val d = math.abs(elemAt(a, left.dataType, i) - elemAt(b, right.dataType, i))
        if (d > m) m = d
      }
      i += 1
    }
    m
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val (ga, gb) = (elemAccessor(left.dataType), elemAccessor(right.dataType))
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i"); val n = ctx.freshName("n")
      val d = ctx.freshName("d")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double ${ev.value}_m = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  if (!$a.isNullAt($i) && !$b.isNullAt($i)) {
         |    double $d = java.lang.Math.abs(
         |      (double) $a.$ga($i) - (double) $b.$gb($i));
         |    if ($d > ${ev.value}_m) ${ev.value}_m = $d;
         |  }
         |}
         |${ev.value} = ${ev.value}_m;
       """.stripMargin
    })
  }

  override protected def withNewChildrenInternal(l: Expression, r: Expression)
      : Expression = copy(left = l, right = r)
}

/** Column-API entry points for the native vector expressions. */
object VectorFunctions {
  def vector_dot(a: Column, b: Column): Column =
    GraftBridge.column(VectorDot(GraftBridge.expression(a), GraftBridge.expression(b)))

  def cosine_similarity(a: Column, b: Column): Column =
    GraftBridge.column(CosineSimilarity(GraftBridge.expression(a), GraftBridge.expression(b)))

  def hyperplane_bits(v: Column, planes: Array[Array[Double]]): Column =
    GraftBridge.column(HyperplaneSignBits(GraftBridge.expression(v), planes))

  def pack_bits(bits: Column): Column =
    GraftBridge.column(PackBits(GraftBridge.expression(bits)))

  def extend_hyperplane_bits(v: Column, packed: Column, nOld: Int,
      deltaPlanes: Array[Array[Double]]): Column =
    GraftBridge.column(ExtendSignBits(GraftBridge.expression(v),
      GraftBridge.expression(packed), nOld, deltaPlanes))

  def long_array_hamming(a: Column, b: Column): Column =
    GraftBridge.column(LongArrayHamming(
      GraftBridge.expression(a), GraftBridge.expression(b)))

  def nearest_centroids(v: Column, centroids: Array[Array[Double]], probe: Int): Column =
    GraftBridge.column(NearestCentroids(GraftBridge.expression(v), centroids, probe))

  def centroid_best_cosine(v: Column, centroids: Array[Array[Double]]): Column =
    GraftBridge.column(CentroidBestCosine(GraftBridge.expression(v), centroids))

  def quantize_int8(v: Column): Column =
    GraftBridge.column(QuantizeInt8(GraftBridge.expression(v)))

  def dequantize_int8(q: Column): Column =
    GraftBridge.column(DequantizeInt8(GraftBridge.expression(q)))

  def vector_max_abs_diff(a: Column, b: Column): Column =
    GraftBridge.column(VectorMaxAbsDiff(
      GraftBridge.expression(a), GraftBridge.expression(b)))
}
