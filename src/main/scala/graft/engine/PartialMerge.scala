package graft.engine

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
import graft.expr.Compilers
import graft.model._
import graft.plan.QueryPlanner

import java.time.Instant

/** Serve-time merge of per-chunk DAY-granularity partial aggregates into a
  * non-nesting-granularity timeseries result — the Spark-engine equivalent
  * of Druid's broker merging per-segment partial aggregates in its
  * scatter-gather (reference `arch/druid-arch.md:38-40`,
  * `query/query-internal-procedure.md:7,43-47`). The fragments are the
  * day sub-query results [[SegmentResultCache.decomposePartial]] shapes
  * (skipEmptyBuckets, no post-aggs, ascending); this object re-buckets
  * their rows under the ORIGINAL granularity, merges aggregator values by
  * each aggregator's algebra, zero-fills against a driver-replicated spine,
  * evaluates post-aggregators over the merged values, and renders the
  * Druid timeseries JSON shape — byte-compatible with the whole-query
  * plan's encoding (pinned by EngineSpec's randomized equivalence sweep).
  *
  * Every rule here mirrors a specific planner/encoder behavior:
  *  - bucket timestamp = `Compilers.truncInstant` (the spine's own
  *    truncation; granularity `all` stamps the first interval start);
  *  - spine = `QueryPlanner.spineBuckets` ∩ segment coverage (the
  *    segment-gap skip, reference `query/query-timeseries.md:93`);
  *  - zero-fill values per `QueryPlanner.zeroFillCol` (sums/counts → typed
  *    zero, min/max → null) when skipEmptyBuckets is off; granularity
  *    `all` instead reproduces a global aggregate over zero rows
  *    (count → 0, long sum → 0, double/float sum and min/max → null);
  *  - post-aggregator arithmetic reproduces `Compilers.postAggCol`'s null
  *    and divide-by-zero semantics in doubles.
  *
  * Floating-point caveat (Druid's broker merge shares it): double/float
  * sums re-associate — a merged sum can differ from the single-plan sum in
  * the last ulp on adversarial value sets. Counts, longs, min and max are
  * exact.
  *
  * Memory profile: the merge holds the merged result on the driver —
  * bounded by the BUFFERED result size, i.e. exactly the bound of the
  * buffered `executeJson` path this serves (which builds the full result
  * string either way). The streaming path never computes fragments cold;
  * it serves the partial merge only when every fragment is already
  * cached, and falls back to the streaming whole-query plan otherwise.
  */
object PartialMerge {

  private val mapper = new ObjectMapper()
  private val isoFmt = java.time.format.DateTimeFormatter.ISO_INSTANT

  // -- per-aggregator merge algebra -----------------------------------------

  /** What an aggregator's finalized day value merges as: the inner shape of
    * [[SegmentResultCache.mergeableAgg]]'s accepted set. */
  private sealed trait Acc {
    def add(n: JsonNode): Unit
    /** Merged value; `fill` = apply the zero-fill coalesce (the spine
      * path's `zeroFillCol` rule) to empty sums. */
    def value(fill: Boolean): Any
  }

  /** `rollup = false`: count compiles to `count(...)` — NEVER null, so
    * the identity is 0 on every path. `rollup = true`: count compiles to
    * `sum(when(p, storedCount))` (the rollup rewrite), which is NULL over
    * zero contributing rows — the merge must reproduce null when every
    * day value was null and no zero-fill coalesce applies (skipEmpty /
    * granularity `all`), exactly like a double sum. */
  private final class CountAcc(rollup: Boolean) extends Acc {
    private var seen = false
    private var s = 0L
    def add(n: JsonNode): Unit =
      if (n != null && !n.isNull) { seen = true; s += n.asLong() }
    def value(fill: Boolean): Any =
      if (!rollup || seen || fill) java.lang.Long.valueOf(s) else null
  }

  /** Long sums are non-null by construction (`aggCol` coalesces to 0L), so
    * the identity is 0 on both the fill and the empty-`all` path. */
  private final class LongSumAcc extends Acc {
    private var s = 0L
    def add(n: JsonNode): Unit = if (n != null && !n.isNull) s += n.asLong()
    def value(fill: Boolean): Any = java.lang.Long.valueOf(s)
  }

  private final class DoubleSumAcc(asFloat: Boolean) extends Acc {
    private var seen = false
    private var s = 0.0
    def add(n: JsonNode): Unit =
      if (n != null && !n.isNull) { seen = true; s += n.asDouble() }
    def value(fill: Boolean): Any =
      if (seen || fill) {
        if (asFloat) java.lang.Float.valueOf(s.toFloat)
        else java.lang.Double.valueOf(s)
      } else null
  }

  /** min/max with Spark's total ordering (NaN greatest) via
    * `Double.compare`/`Float.compare`; zero-fill leaves them null
    * (`zeroFillCol` does not coalesce min/max). */
  private final class MinMaxAcc(typ: String, isMin: Boolean) extends Acc {
    private var present = false
    private var l = 0L; private var d = 0.0; private var f = 0.0f
    private def better(c: Int): Boolean = if (isMin) c < 0 else c > 0
    def add(n: JsonNode): Unit = if (n != null && !n.isNull) {
      typ match {
        case "long" =>
          val v = n.asLong()
          if (!present || better(java.lang.Long.compare(v, l))) l = v
        case "float" =>
          val v = n.floatValue()
          if (!present || better(java.lang.Float.compare(v, f))) f = v
        case _ =>
          val v = n.asDouble()
          if (!present || better(java.lang.Double.compare(v, d))) d = v
      }
      present = true
    }
    def value(fill: Boolean): Any =
      if (!present) null
      else typ match {
        case "long"  => java.lang.Long.valueOf(l)
        case "float" => java.lang.Float.valueOf(f)
        case _       => java.lang.Double.valueOf(d)
      }
  }

  /** first/last merge POSITIONALLY: `add` calls arrive in bucket-time
    * order — a fragment covers exactly ONE UTC day, so each merged bucket
    * receives at most one day value per fragment, and callers iterate
    * fragments chunk-ascending. "Value at the bucket's max non-null
    * timestamp" = the last day with any non-null value contributes its
    * own (already correct) day-last — i.e. the last non-null day value;
    * dually for first. A day with rows but only null inputs yields a null
    * day value and is skipped, exactly as `max_by(in, when(in.isNotNull,
    * ts))` skips null inputs over the whole bucket. */
  private final class FirstLastAcc(typ: String, isFirst: Boolean) extends Acc {
    private var v: Any = null
    private def typed(n: JsonNode): Any = typ match {
      case "long"  => java.lang.Long.valueOf(n.asLong())
      case "float" => java.lang.Float.valueOf(n.floatValue())
      case _       => java.lang.Double.valueOf(n.asDouble())
    }
    def add(n: JsonNode): Unit = if (n != null && !n.isNull) {
      if (isFirst) { if (v == null) v = typed(n) } else v = typed(n)
    }
    def value(fill: Boolean): Any = v // zeroFillCol leaves first/last null
  }

  private def newAcc(a: Aggregator, rollup: Boolean): Acc = a match {
    case Aggregator.Count(_)          => new CountAcc(rollup)
    case Aggregator.Sum(_, _, "long") => new LongSumAcc
    case Aggregator.Sum(_, _, t)      => new DoubleSumAcc(asFloat = t == "float")
    case Aggregator.Min(_, _, t)      => new MinMaxAcc(t, isMin = true)
    case Aggregator.Max(_, _, t)      => new MinMaxAcc(t, isMin = false)
    case Aggregator.First(_, _, t)    => new FirstLastAcc(t, isFirst = true)
    case Aggregator.Last(_, _, t)     => new FirstLastAcc(t, isFirst = false)
    case Aggregator.Filtered(_, inner) => newAcc(inner, rollup)
    case other => throw new IllegalArgumentException(
      s"not partial-mergeable: ${other.getClass.getSimpleName}")
  }

  // -- post-aggregator evaluation over merged values ------------------------

  private def toDouble(v: Any): java.lang.Double = v match {
    case null                   => null
    case l: java.lang.Long      => java.lang.Double.valueOf(l.doubleValue)
    case d: java.lang.Double    => d
    case f: java.lang.Float     => java.lang.Double.valueOf(f.doubleValue)
    case other => throw new IllegalStateException(s"non-numeric merge value: $other")
  }

  /** Mirrors `Compilers.postAggCol` over plain values: arithmetic in
    * doubles with Spark null propagation, `/` → 0 when the divisor is 0 OR
    * null, `quotient` = IEEE division with Druid's 0-divisor casing. */
  private def evalPost(pa: PostAggregator, row: collection.Map[String, Any]): Any =
    pa match {
      case PostAggregator.Arithmetic(_, fn, fields) =>
        val vs = fields.map(f => toDouble(evalPost(f, row)))
        def red(op: (Double, Double) => Double) =
          vs.reduce[java.lang.Double]((a, b) =>
            if (a == null || b == null) null
            else java.lang.Double.valueOf(op(a.doubleValue, b.doubleValue)))
        fn match {
          case "+" => red(_ + _)
          case "-" => red(_ - _)
          case "*" => red(_ * _)
          case "/" =>
            vs.reduce[java.lang.Double] { (a, b) =>
              if (b == null || b.doubleValue == 0.0) java.lang.Double.valueOf(0.0)
              else if (a == null) null
              else java.lang.Double.valueOf(a.doubleValue / b.doubleValue)
            }
          case "quotient" =>
            vs.reduce[java.lang.Double] { (a, b) =>
              if (b != null && b.doubleValue == 0.0) {
                val av = if (a == null) Double.NaN else a.doubleValue
                java.lang.Double.valueOf(
                  if (av > 0.0) Double.PositiveInfinity
                  else if (av < 0.0) Double.NegativeInfinity
                  else Double.NaN)
              } else if (a == null || b == null) null
              else java.lang.Double.valueOf(a.doubleValue / b.doubleValue)
            }
          case other =>
            throw new IllegalArgumentException(s"unknown arithmetic fn '$other'")
        }
      case PostAggregator.FieldAccess(_, f)           => row.getOrElse(f, null)
      case PostAggregator.FinalizingFieldAccess(_, f) => row.getOrElse(f, null)
      case PostAggregator.Constant(_, v) => java.lang.Double.valueOf(v)
      case PostAggregator.GreatestLeast(_, fn, typ, fields) =>
        // Spark greatest/least ignore nulls; all-null → null
        if (typ == "long") {
          // exact longs: a Long operand must NOT round-trip through
          // Double (lossy past 2^53) — only genuinely fractional inputs
          // truncate, mirroring cast(LongType)
          val vs = fields.map(f => evalPost(f, row)).collect {
            case l: java.lang.Long   => l.longValue
            case d: java.lang.Double => d.doubleValue.toLong
            case f: java.lang.Float  => f.floatValue.toLong
          }
          if (vs.isEmpty) null
          else java.lang.Long.valueOf(if (fn == "greatest") vs.max else vs.min)
        } else {
          val vs = fields.map(f => toDouble(evalPost(f, row)))
            .collect { case d if d != null => d.doubleValue }
          if (vs.isEmpty) null
          else java.lang.Double.valueOf(
            if (fn == "greatest") vs.max else vs.min)
        }
      case other => throw new IllegalArgumentException(
        s"not driver-evaluable: ${other.getClass.getSimpleName}")
    }

  // -- merge + render --------------------------------------------------------

  private implicit val instantOrd: Ordering[Instant] =
    Ordering.fromLessThan(_ isBefore _)

  /** Merge day-partial GROUPBY fragments into the final result bytes:
    * group day rows by (original-granularity bucket, dimension values),
    * merge aggregators by their algebra, evaluate post-aggs, render the
    * groupBy event shape. GroupBy has NO zero-fill spine and NO defined
    * output order (the whole-query plan returns partition-arbitrary rows;
    * the engine's fragment law for groupBy is SET equality of event
    * objects), so the merge needs no coverage replica — rows emit in
    * deterministic (bucket, dims) order. Dimension values are copied
    * VERBATIM as parsed JSON nodes, so typed dims (LONG/FLOAT output
    * types, nulls from explode_outer) round-trip exactly. */
  def mergeGroupBy(q: Query.GroupBy, fragments: Seq[String],
      rollup: Boolean): String = {
    val g = q.granularity
    val dims = q.dimensions.map(_.outputName)
    // key → (bucket, dim nodes, accumulators); LinkedHashMap keeps the
    // first-seen order only as a tiebreaker — final order is sorted
    final case class Group(bucket: Option[Instant], dimVals: Seq[JsonNode],
      accs: Array[Acc])
    val merged = scala.collection.mutable.LinkedHashMap.empty[String, Group]
    fragments.filter(_.nonEmpty).foreach { frag =>
      val rows = mapper.readTree("[" + frag + "]")
      (0 until rows.size()).foreach { i =>
        val row = rows.get(i)
        val bucket = g match {
          case Granularity.All => None
          case _ => Some(Compilers.truncInstant(g,
            Instant.parse(row.get("timestamp").asText())))
        }
        val ev = row.get("event")
        val dimVals = dims.map(d => ev.get(d): JsonNode)
        val key = bucket.map(_.toString).getOrElse("") + " " +
          dimVals.map(n => if (n == null) "" else n.toString)
            .mkString(" ")
        val grp = merged.getOrElseUpdate(key,
          Group(bucket, dimVals, q.aggregations.map(newAcc(_, rollup)).toArray))
        var j = 0
        q.aggregations.foreach { a => grp.accs(j).add(ev.get(a.name)); j += 1 }
      }
    }
    val ordered = merged.values.toSeq.sortBy(grp =>
      (grp.bucket.map(_.toEpochMilli).getOrElse(0L),
        grp.dimVals.map(n => if (n == null) "" else n.toString)
          .mkString(" ")))
    val out = new java.io.StringWriter()
    val gen = mapper.getFactory.createGenerator(out)
    gen.setCodec(mapper)
    gen.writeStartArray()
    ordered.foreach { grp =>
      gen.writeStartObject()
      gen.writeStringField("version", "v1")
      grp.bucket.foreach(b => gen.writeStringField("timestamp", isoFmt.format(b)))
      gen.writeFieldName("event")
      gen.writeStartObject()
      val row = scala.collection.mutable.LinkedHashMap.empty[String, Any]
      dims.zip(grp.dimVals).foreach { case (d, n) =>
        gen.writeFieldName(d)
        if (n == null || n.isNull) gen.writeNull() else gen.writeTree(n)
      }
      var j = 0
      q.aggregations.foreach { a =>
        row.put(a.name, grp.accs(j).value(false)); j += 1
      }
      q.postAggregations.foreach(pa => row.put(pa.name, evalPost(pa, row)))
      row.foreach { case (k, v) =>
        gen.writeFieldName(k)
        v match {
          case null                => gen.writeNull()
          case l: java.lang.Long   => gen.writeNumber(l.longValue)
          case d: java.lang.Double => gen.writeNumber(d.doubleValue)
          case f: java.lang.Float  => gen.writeNumber(f.floatValue)
          case other               => gen.writeString(String.valueOf(other))
        }
      }
      gen.writeEndObject()
      gen.writeEndObject()
    }
    gen.writeEndArray()
    gen.close()
    out.toString
  }

  /** Merge day-partial `fragments` into the final result bytes for the
    * ORIGINAL query `q`. `coverage` is the datasource's segment-timeline
    * coverage (the zero-fill gap-skip input, `Catalog.chunkCoverage`). */
  def merge(q: Query.Timeseries, fragments: Seq[String],
      coverage: Option[Seq[Interval]], rollup: Boolean): String = {
    val g = q.granularity
    val skipEmpty = q.context.get("skipEmptyBuckets").exists(_.toBoolean)
    val allBucket: Instant =
      q.intervals.headOption.map(_.start).getOrElse(Instant.EPOCH)

    val merged = scala.collection.mutable.HashMap.empty[Instant, Array[Acc]]
    fragments.filter(_.nonEmpty).foreach { frag =>
      val rows = mapper.readTree("[" + frag + "]")
      (0 until rows.size()).foreach { i =>
        val row = rows.get(i)
        val ts = Instant.parse(row.get("timestamp").asText())
        val bucket = g match {
          case Granularity.All => allBucket
          case _               => Compilers.truncInstant(g, ts)
        }
        val accs = merged.getOrElseUpdate(bucket,
          q.aggregations.map(newAcc(_, rollup)).toArray)
        val res = row.get("result")
        var j = 0
        q.aggregations.foreach { a =>
          accs(j).add(res.get(a.name)); j += 1
        }
      }
    }

    // bucket set + fill semantics per the planner's three paths:
    //  - all:        exactly one row, no zero-fill coalesce (a global
    //                aggregate over zero rows yields null double sums)
    //  - skipEmpty:  merged buckets only, raw values
    //  - otherwise:  spine ∩ coverage, zero-fill coalesce everywhere
    val (buckets, fill) = g match {
      case Granularity.All => (Seq(allBucket), false)
      case _ if skipEmpty  => (merged.keys.toSeq.sorted, false)
      case _ =>
        val spine = QueryPlanner.spineBuckets(q.intervals, g)
        val covered = coverage match {
          case Some(ivs) => spine.filter(b => ivs.exists(iv =>
            b.isBefore(iv.end) && Compilers.nextBucket(g, b).isAfter(iv.start)))
          case None => spine
        }
        (((covered ++ merged.keys).distinct).sorted, true)
    }
    val ordered = if (q.descending) buckets.reverse else buckets
    val emptyAccs: Array[Acc] = q.aggregations.map(newAcc(_, rollup)).toArray

    val out = new java.io.StringWriter()
    val gen = mapper.getFactory.createGenerator(out)
    gen.writeStartArray()
    ordered.foreach { bucket =>
      val accs = merged.getOrElse(bucket, emptyAccs)
      val row = scala.collection.mutable.LinkedHashMap.empty[String, Any]
      var j = 0
      q.aggregations.foreach { a =>
        row.put(a.name, accs(j).value(fill)); j += 1
      }
      q.postAggregations.foreach(pa => row.put(pa.name, evalPost(pa, row)))
      gen.writeStartObject()
      gen.writeStringField("timestamp", isoFmt.format(bucket))
      gen.writeFieldName("result")
      gen.writeStartObject()
      row.foreach { case (k, v) =>
        gen.writeFieldName(k)
        v match {
          case null                => gen.writeNull()
          case l: java.lang.Long   => gen.writeNumber(l.longValue)
          case d: java.lang.Double => gen.writeNumber(d.doubleValue)
          case f: java.lang.Float  => gen.writeNumber(f.floatValue)
          case other               => gen.writeString(String.valueOf(other))
        }
      }
      gen.writeEndObject()
      gen.writeEndObject()
    }
    gen.writeEndArray()
    gen.close()
    out.toString
  }
}
