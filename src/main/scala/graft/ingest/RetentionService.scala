package graft.ingest

import graft.store.SegmentStore

import java.time.{Instant, Period, ZoneOffset}
import java.time.format.DateTimeParseException

/** The Coordinator's RULES loop — the half of Druid's Coordinator this
  * engine was missing (reference `arch/druid-arch.md:21-23`: the
  * Coordinator loads and DROPS segments per configured rules;
  * `TOC.md:10-12`). The engine already had the manual segment tasks
  * (kill/move/archive/restore with interval locks and a status
  * lifecycle); this service adds the conf-driven policy that EMITS them
  * on a schedule, so retention is an operator setting instead of a cron
  * of hand-written task JSON.
  *
  * Rules (per datasource, `spark.graft.retention.rules`):
  * {{{
  *   spark.graft.retention.rules   = "ev:dropBefore=P90D|archiveBefore=P30D;logs:dropBefore=P30D"
  *   spark.graft.retention.archiveRoot = /cold/storage   // required by archiveBefore
  *   spark.graft.retention.dryRun  = true                // plan, don't submit
  * }}}
  * Each cycle walks the datasource's manifest timeline: a chunk whose UTC
  * day ends on/before `now − dropBefore` plans a KILL; otherwise one
  * ending on/before `now − archiveBefore` plans an ARCHIVE (skipped when
  * its segments already live under the archive root — archiving is
  * idempotent across cycles). Tasks run through the EXISTING
  * [[TaskService]] — same status lifecycle, duplicate-id rejection, and
  * chunk interval locks as operator-submitted tasks — under deterministic
  * ids (`retention-<type>-<ds>-<chunk>`), so a crashed cycle re-plans the
  * same work and "Task already exists" marks it skipped, never doubled.
  * A present-but-malformed rule set fails construction loudly: a typo'd
  * retention policy must never silently retain nothing (or everything).
  *
  * At 100 TB this loop is what keeps the hot tier bounded: ~36k daily
  * chunks per datasource-year drain to cold storage and then to deletion
  * without an operator in the loop, and every action is observable at the
  * metrics endpoint (cycle/kill/archive/skip/failure counters + the task
  * statuses themselves).
  */
class RetentionService(spark: org.apache.spark.sql.SparkSession,
    store: SegmentStore, tasks: TaskService) {

  import RetentionService._

  val rules: Seq[Rule] = parseRules(
    spark.conf.getOption("spark.graft.retention.rules").getOrElse(""))
  private val archiveRoot: Option[String] =
    spark.conf.getOption("spark.graft.retention.archiveRoot")
  private val confDryRun: Boolean =
    spark.conf.getOption("spark.graft.retention.dryRun").exists(_.toBoolean)
  if (rules.exists(_.archiveBefore.isDefined) && archiveRoot.isEmpty)
    throw new IllegalArgumentException(
      "spark.graft.retention.rules uses archiveBefore but " +
        "spark.graft.retention.archiveRoot is not set")

  private val cycles = new java.util.concurrent.atomic.AtomicLong()
  private val kills = new java.util.concurrent.atomic.AtomicLong()
  private val archives = new java.util.concurrent.atomic.AtomicLong()
  private val skippedExisting = new java.util.concurrent.atomic.AtomicLong()
  private val failures = new java.util.concurrent.atomic.AtomicLong()

  /** Cumulative counters for the metrics endpoint. `retentionRetryQueue`
    * is the live size of the retry map (bounded only by chunk count —
    * observable beats silent). */
  def stats: Map[String, Long] = Map(
    "retentionCycles" -> cycles.get(), "retentionKills" -> kills.get(),
    "retentionArchives" -> archives.get(),
    "retentionSkipped" -> skippedExisting.get(),
    "retentionFailures" -> failures.get(),
    "retentionRetryQueue" -> retryCounts.size().toLong)

  /** One planned action. The base task id is deterministic — including
    * the chunk's segment VERSION, so a chunk re-created after a
    * successful kill (fresh ingest for an old day) plans under a fresh id
    * instead of being forever shadowed by the old SUCCESS status — and
    * idempotent through TaskService's duplicate-id rejection. */
  final case class Action(taskType: String, dataSource: String, chunk: String,
      version: Int) {
    def taskId: String = s"retention-$taskType-$dataSource-$chunk-v$version"
  }
  final case class Report(planned: Seq[Action], submitted: Seq[String],
    skipped: Seq[String], failed: Seq[String], dryRun: Boolean)

  // FAILED attempts per base id: a transiently failing task (interval
  // locked by a concurrent compaction, a cold-storage hiccup) must be
  // RETRIED next cycle, but TaskService keeps terminal statuses forever —
  // so the retry submits under `<base>-retry<n>` instead of being
  // permanently mistaken for an idempotent skip (r15 review finding)
  private val retryCounts =
    new java.util.concurrent.ConcurrentHashMap[String, java.lang.Integer]()

  /** Plan the rule-mandated actions against the CURRENT manifests — pure
    * (no submission): the dry-run surface and the evaluate() input. One
    * action per chunk (the store keeps one SegmentInfo per chunk; this
    * groups defensively anyway). */
  def plan(now: Instant): Seq[Action] = rules.flatMap { rule =>
    // one broken/missing datasource manifest must not abort the sweep for
    // every OTHER rule — isolate per rule, count, continue
    try {
      val dropCut = rule.dropBefore.map(cutoff(now, _))
      val archiveCut = rule.archiveBefore.map(cutoff(now, _))
      val segs = store.readManifest(rule.dataSource).segments
      segs.groupBy(_.chunk).toSeq.sortBy(_._1).flatMap { case (chunk, infos) =>
        val end = chunkEnd(chunk)
        val version = infos.map(_.version).max
        if (dropCut.exists(c => !end.isAfter(c)))
          Some(Action("kill", rule.dataSource, chunk, version))
        else if (archiveCut.exists(c => !end.isAfter(c)) &&
            !archiveRoot.exists(r => infos.forall(i => isUnder(i.path, r))))
          Some(Action("archive", rule.dataSource, chunk, version))
        else None
      }
    } catch {
      case scala.util.control.NonFatal(_) =>
        failures.incrementAndGet(); Seq.empty
    }
  }

  // proper path-prefix: '/cold/storage' must NOT claim '/cold/storage-old'
  private def isUnder(path: String, root: String): Boolean = {
    val r = root.stripSuffix("/")
    path == r || path.startsWith(r + "/")
  }

  /** Run one cycle: plan, then submit each action through [[TaskService]]
    * (unless dry-run). Failures count and continue — one locked or broken
    * chunk must not stall the rest of the sweep — and schedule a retry id
    * for the next cycle. */
  def evaluate(now: Instant = Instant.now(),
      dryRun: Boolean = confDryRun): Report = {
    cycles.incrementAndGet()
    val planned = plan(now)
    if (dryRun) return Report(planned, Seq.empty, Seq.empty, Seq.empty, dryRun = true)
    val submitted = Seq.newBuilder[String]
    val skipped = Seq.newBuilder[String]
    val failed = Seq.newBuilder[String]
    val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
    planned.foreach { a =>
      val base = a.taskId
      val attempt: Int = retryCounts.getOrDefault(base, 0)
      val id = if (attempt == 0) base else s"$base-retry$attempt"
      // task JSON via Jackson: a datasource/root with a quote or
      // backslash must not produce unparseable task bodies
      val o = mapper.createObjectNode()
      o.put("type", a.taskType); o.put("id", id)
      o.put("dataSource", a.dataSource); o.put("chunk", a.chunk)
      if (a.taskType == "archive") o.put("archiveRoot", archiveRoot.get)
      try {
        tasks.submit(mapper.writeValueAsString(o)): Unit
        (if (a.taskType == "kill") kills else archives).incrementAndGet()
        submitted += id
      } catch {
        case e: IllegalStateException if String.valueOf(e.getMessage)
            .contains("already exists") =>
          // a FAILED holder retries under a fresh id next cycle; a
          // RUNNING/SUCCESS holder is a genuine idempotent skip
          if (tasks.status(id).exists(_.state == "FAILED"))
            retryCounts.put(base, attempt + 1): Unit
          skippedExisting.incrementAndGet(); skipped += id
        case scala.util.control.NonFatal(_) =>
          // submit rethrows after recording FAILED: retry next cycle
          retryCounts.put(base, attempt + 1): Unit
          failures.incrementAndGet(); failed += id
      }
    }
    Report(planned, submitted.result(), skipped.result(), failed.result(),
      dryRun = false)
  }

  // -- schedule ---------------------------------------------------------------

  private var timer: Option[java.util.concurrent.ScheduledExecutorService] = None

  /** Start the periodic rules loop (Druid's Coordinator period). */
  def start(periodMs: Long): Unit = synchronized {
    require(timer.isEmpty, "retention loop already started")
    val t = java.util.concurrent.Executors.newSingleThreadScheduledExecutor(
      r => { val th = new Thread(r, "graft-retention"); th.setDaemon(true); th })
    t.scheduleWithFixedDelay(() => {
      try evaluate(): Unit
      catch { case scala.util.control.NonFatal(_) => failures.incrementAndGet() }
    }, periodMs, periodMs, java.util.concurrent.TimeUnit.MILLISECONDS)
    timer = Some(t)
  }

  def stop(): Unit = synchronized { timer.foreach(_.shutdownNow()); timer = None }
}

object RetentionService {

  /** One datasource's retention policy; periods are ISO day-based
    * (`P30D`, `P13W`, `P6M`, `P1Y`), applied calendar-aware in UTC. */
  final case class Rule(dataSource: String, dropBefore: Option[Period],
    archiveBefore: Option[Period])

  /** `"ds:dropBefore=P90D|archiveBefore=P30D;ds2:dropBefore=P30D"` →
    * rules. Malformed input throws (never fall open/closed silently). */
  def parseRules(raw: String): Seq[Rule] =
    raw.split(';').iterator.map(_.trim).filter(_.nonEmpty).map { entry =>
      val i = entry.indexOf(':')
      if (i <= 0 || i == entry.length - 1)
        throw new IllegalArgumentException(
          s"spark.graft.retention.rules: expected 'ds:key=P..|key=P..', got '$entry'")
      val ds = entry.substring(0, i).trim
      var drop: Option[Period] = None
      var archive: Option[Period] = None
      entry.substring(i + 1).split('|')
        .map(_.trim).filter(_.nonEmpty).foreach { kv =>
          kv.split('=') match {
            case Array(k, v) =>
              val p = try Period.parse(v.trim)
                catch { case e: DateTimeParseException =>
                  throw new IllegalArgumentException(
                    s"spark.graft.retention.rules: bad period '${v.trim}'", e) }
              if (p.isZero || p.isNegative) throw new IllegalArgumentException(
                s"spark.graft.retention.rules: period '${v.trim}' must be positive")
              k.trim match {
                case "dropBefore"    => drop = Some(p)
                case "archiveBefore" => archive = Some(p)
                case other => throw new IllegalArgumentException(
                  s"spark.graft.retention.rules: unknown key '$other'")
              }
            case _ => throw new IllegalArgumentException(
              s"spark.graft.retention.rules: expected 'key=period', got '$kv'")
          }
        }
      if (drop.isEmpty && archive.isEmpty)
        throw new IllegalArgumentException(
          s"spark.graft.retention.rules: rule for '$ds' has no actions")
      // archive must act on a LONGER retention horizon than drop, or the
      // archive never fires (everything old enough is killed first). The
      // cutoffs are CALENDAR-aware, so compare materialized cutoff instants
      // — and because month subtraction depends on the reference date
      // ('P1M' vs 'P30D' flips ordering after a 28-day February; 'P12M' ==
      // 'P1Y' exactly), require the archive cutoff to be strictly later on
      // EVERY day of a leap+non-leap year pair, which covers all month-
      // length interactions the real `cutoff(now, p)` can see.
      for (d <- drop; a <- archive)
        if (!validationDates.forall(n => cutoff(n, a).isAfter(cutoff(n, d))))
          throw new IllegalArgumentException(
            s"spark.graft.retention.rules: '$ds' archiveBefore must be " +
              "shorter than dropBefore for every calendar date")
      Rule(ds, drop, archive)
    }.toSeq

  // every midnight of 2023 (non-leap) + 2024 (leap): Period arithmetic is
  // date-granular, so sweeping days covers all reference times
  private lazy val validationDates: IndexedSeq[Instant] = {
    val start = java.time.LocalDate.of(2023, 1, 1)
    (0 until 731).map(i =>
      start.plusDays(i.toLong).atStartOfDay(ZoneOffset.UTC).toInstant)
  }

  private def cutoff(now: Instant, p: Period): Instant =
    now.atZone(ZoneOffset.UTC).minus(p).toInstant

  private def chunkEnd(chunk: String): Instant =
    java.time.LocalDate.parse(chunk).plusDays(1)
      .atStartOfDay(ZoneOffset.UTC).toInstant
}
