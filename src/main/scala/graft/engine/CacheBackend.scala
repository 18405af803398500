package graft.engine

/** Pluggable storage tier for the engine's result cache — whole-query
  * results, SQL results, and per-(segment, query) fragments all live in
  * ONE keyspace behind this seam (keys are domain-separated by
  * construction: native etags, `sql`-prefixed SQL etags, `seg:` fragment
  * keys). The reference's cache tier is pluggable the same way (local
  * heap / memcached — the `TOC.md:53` cache monitoring family): with
  * several broker JVMs over 100 TB, a per-process heap cache warms N
  * copies of every fragment, so a shared tier must be a drop-in, not a
  * rewrite.
  *
  * Contract:
  *  - `get`/`put` are thread-safe; `get` of an absent key is None.
  *  - values are opaque encoded result strings; the ENGINE decides what is
  *    cacheable (it never offers an entry it could not serve verbatim).
  *  - a backend may refuse or evict anything (best-effort storage): the
  *    engine treats every miss as "recompute", so a lossy backend costs
  *    time, never correctness.
  *  - `stats` reports storage-tier observability (entries/bytes/evictions
  *    — an unobservable cache cannot be sized); the engine's own hit/miss
  *    counters stay engine-side so they mean the same thing across
  *    backends.
  */
trait CacheBackend {
  /** Short identifier surfaced at `GET /druid/v2/metrics`. */
  def name: String
  def get(key: String): Option[String]
  def put(key: String, value: String): Unit
  /** Storage stats: `entries`, `bytes`, `evictions` (missing keys read
    * as 0 — a remote tier may not know all three). */
  def stats: Map[String, Long]
}

object CacheBackend {

  /** The default tier: in-heap, byte-budgeted, access-ordered LRU — the
    * engine's original cache, now behind the seam (byte-identical
    * behavior, pinned by EngineSpec). Evicts by accumulated BYTES, not
    * entry count: entries are whole buffered result strings, so a count
    * bound would let a handful of large results pressure driver memory.
    * An entry larger than the whole budget is never stored (storing it
    * would evict everything else for a single entry). */
  final class HeapLru(maxBytes: Long) extends CacheBackend {
    private var bytes = 0L // guarded by map's monitor
    private var evictions = 0L
    private val map = new java.util.LinkedHashMap[String, String](128, 0.75f, true)
    private def entryBytes(k: String, v: String): Long = 2L * (k.length + v.length)

    override def name: String = "heap"

    override def get(key: String): Option[String] =
      // get mutates an access-order LinkedHashMap — needs the monitor
      map.synchronized(Option(map.get(key)))

    override def put(key: String, value: String): Unit = map.synchronized {
      val sz = entryBytes(key, value)
      if (sz > maxBytes) return // larger than the whole budget
      Option(map.put(key, value))
        .foreach(old => bytes -= entryBytes(key, old))
      bytes += sz
      val it = map.entrySet().iterator()
      while (bytes > maxBytes && it.hasNext) {
        val e = it.next() // eldest-accessed first (access-order map)
        if (e.getKey != key) {
          bytes -= entryBytes(e.getKey, e.getValue)
          it.remove()
          evictions += 1
        }
      }
    }

    override def stats: Map[String, Long] = map.synchronized {
      Map("entries" -> map.size().toLong, "bytes" -> bytes,
        "evictions" -> evictions)
    }
  }

  /** Out-of-heap SHARED tier: one file per entry under a common directory
    * — the concrete cross-process backend the seam promised (the
    * reference ships local AND distributed cache tiers the same way,
    * `TOC.md:53`). Any number of broker JVMs pointing at the same
    * directory (local disk, NFS, a fuse-mounted bucket) share every
    * fragment and whole-query result: one broker computes a cold chunk,
    * every other broker's identical dashboard serves it with zero Spark
    * jobs (rehearsed cross-JVM by LocalClusterRehearsal).
    *
    * Mechanics:
    *  - entry file = `sha256(key).cache`; writes land in a pid-unique tmp
    *    and ATOMIC_MOVE into place, so readers never observe a torn value
    *    and concurrent writers are last-write-wins (both wrote the same
    *    verbatim result — the engine's contract);
    *  - `get` touches mtime (best-effort), so eviction approximates LRU;
    *  - `put` evicts oldest-mtime entries past `maxBytes` (the byte budget
    *    is per-directory, shared by design) and never stores an entry
    *    larger than the whole budget;
    *  - every IO failure degrades to a miss/no-op: a shared tier outage
    *    costs recompute time, never correctness (the trait's contract).
    */
  final class FileStore(dir: java.nio.file.Path, maxBytes: Long)
      extends CacheBackend {
    import java.nio.file.{Files, Path, StandardCopyOption}
    Files.createDirectories(dir)
    private val evictions = new java.util.concurrent.atomic.AtomicLong()
    private val nonce = new java.util.concurrent.atomic.AtomicLong()
    // a dead shared tier must be OBSERVABLE: put swallows IO failures by
    // contract (lossy-never-wrong), so without a counter a permanently
    // failing mount reads as a healthy-but-cold cache (r14 advice)
    private val putFailures = new java.util.concurrent.atomic.AtomicLong()
    // running byte estimate so a put does NOT list the directory every
    // time (on the NFS/fuse mounts this class targets, a per-put metadata
    // sweep of every entry would dominate). This process's own puts move
    // the estimate; OTHER brokers' writes are picked up by the periodic
    // rescan below — an under-estimate only delays eviction by at most
    // RescanEvery puts, never corrupts anything (lossy-is-allowed).
    private val approxBytes = new java.util.concurrent.atomic.AtomicLong()
    private val approxEntries = new java.util.concurrent.atomic.AtomicLong()
    private val putsSinceScan = new java.util.concurrent.atomic.AtomicLong()
    private val RescanEvery = 256L
    // a broker killed between write and move orphans a .tmp file that no
    // eviction pass would otherwise see — sweep stale ones (old enough
    // that no live put can still be mid-move) at construction and on
    // every rescan
    private val TmpStaleMs = 3600000L
    rescan()

    override def name: String = "file"

    private def fileOf(key: String): Path = {
      val md = java.security.MessageDigest.getInstance("SHA-256")
      val h = md.digest(key.getBytes(java.nio.charset.StandardCharsets.UTF_8))
        .map(b => f"$b%02x").mkString
      dir.resolve(h + ".cache")
    }

    private def listAll(): Seq[Path] =
      try {
        val s = Files.list(dir)
        try {
          import scala.jdk.CollectionConverters._
          s.iterator().asScala.toVector
        } finally s.close()
      } catch { case _: java.io.IOException => Vector.empty }

    private def entries(): Seq[Path] =
      listAll().filter(_.getFileName.toString.endsWith(".cache"))

    /** Full directory pass: sweep stale tmps, evict oldest-touched entries
      * past the shared budget (optionally sparing the just-written file),
      * and re-true the byte estimate. */
    private def rescan(spare: Option[Path] = None): Unit = {
      val now = System.currentTimeMillis()
      listAll().foreach { p =>
        val n = p.getFileName.toString
        if (n.startsWith(".tmp-") &&
            (try Files.getLastModifiedTime(p).toMillis < now - TmpStaleMs
            catch { case _: java.io.IOException => false }))
          try Files.deleteIfExists(p): Unit
          catch { case _: java.io.IOException => }
      }
      val all = entries().map(p =>
        (p, try Files.size(p) catch { case _: java.io.IOException => 0L },
          try Files.getLastModifiedTime(p).toMillis
          catch { case _: java.io.IOException => 0L }))
      var total = all.map(_._2).sum
      var count = all.size.toLong
      if (total > maxBytes)
        all.sortBy(_._3).iterator
          .takeWhile(_ => total > maxBytes)
          .filterNot(p => spare.contains(p._1))
          .foreach { case (p, sz, _) =>
            try {
              if (Files.deleteIfExists(p)) {
                total -= sz; count -= 1; evictions.incrementAndGet()
              }
            } catch { case _: java.io.IOException => }
          }
      approxBytes.set(total)
      approxEntries.set(count)
      putsSinceScan.set(0L)
    }

    override def get(key: String): Option[String] =
      try {
        val f = fileOf(key)
        val bytes = Files.readAllBytes(f)
        try Files.setLastModifiedTime(f,
          java.nio.file.attribute.FileTime.fromMillis(System.currentTimeMillis()))
        catch { case _: java.io.IOException => } // touch is best-effort
        Some(new String(bytes, java.nio.charset.StandardCharsets.UTF_8))
      } catch { case _: java.io.IOException => None } // absent/racing-evicted

    override def put(key: String, value: String): Unit = {
      val bytes = value.getBytes(java.nio.charset.StandardCharsets.UTF_8)
      if (bytes.length > maxBytes) return
      try {
        val tmp = dir.resolve(
          s".tmp-${ProcessHandle.current().pid()}-${nonce.incrementAndGet()}")
        Files.write(tmp, bytes)
        val target = fileOf(key)
        val overwrote = Files.exists(target) // estimate only — races are fine
        try Files.move(tmp, target, StandardCopyOption.ATOMIC_MOVE,
          StandardCopyOption.REPLACE_EXISTING)
        catch {
          // exactly the NFS/fuse mounts this class targets may not support
          // ATOMIC_MOVE — retry plain (a same-filesystem rename is atomic
          // in practice on POSIX; worst case a reader observes a torn
          // value, which every consumer degrades to a miss: a failed
          // readAllBytes returns None here, and truncated-but-readable
          // bytes are caught at merge time — Engine counts them under
          // segmentCacheMergeErrors and falls back to the whole plan)
          case _: java.nio.file.AtomicMoveNotSupportedException =>
            Files.move(tmp, target, StandardCopyOption.REPLACE_EXISTING)
        }
        if (!overwrote) approxEntries.incrementAndGet()
        if (approxBytes.addAndGet(bytes.length.toLong) > maxBytes ||
            putsSinceScan.incrementAndGet() >= RescanEvery)
          rescan(spare = Some(target))
      } catch {
        // lossy is allowed, wrong is not — but count it (a dead tier must
        // not read as a healthy-but-cold one)
        case _: java.io.IOException => putFailures.incrementAndGet()
      }
    }

    /** Served from the RUNNING estimates (re-trued by every rescan), NOT a
      * directory sweep: `stats` sits behind the metrics endpoint, and on an
      * NFS tier with many entries a per-poll list+size of every file is a
      * metadata storm a tight scraper turns continuous (r14 verdict #5).
      * `entries`/`bytes` therefore track THIS process's view — other
      * brokers' writes appear at the next rescan. */
    override def stats: Map[String, Long] =
      Map("entries" -> approxEntries.get(), "bytes" -> approxBytes.get(),
        "evictions" -> evictions.get(), "putFailures" -> putFailures.get())

    /** Test/operations hook: force the full directory pass now. */
    private[graft] def rescanNow(): Unit = rescan()
  }

  /** Conf-driven backend so a shared tier deploys without code:
    * `spark.graft.resultCache.backend` = `heap` (default), `file` (the
    * [[FileStore]] shared tier; requires `spark.graft.resultCache.dir`),
    * or the fully qualified class name of a [[CacheBackend]] with a no-arg
    * constructor (the adapter owns its client/endpoint configuration —
    * this engine adds no network dependencies). A present-but-unloadable
    * value fails Engine construction loudly: a typo'd cache tier must not
    * silently fall back to an unshared heap. */
  def fromConf(spark: org.apache.spark.sql.SparkSession,
      maxBytes: Long): CacheBackend =
    spark.conf.getOption("spark.graft.resultCache.backend") match {
      case None | Some("heap") => new HeapLru(maxBytes)
      case Some("file") =>
        val dir = spark.conf.getOption("spark.graft.resultCache.dir")
          .getOrElse(throw new IllegalArgumentException(
            "spark.graft.resultCache.backend=file requires " +
              "spark.graft.resultCache.dir"))
        new FileStore(java.nio.file.Paths.get(dir), maxBytes)
      case Some(cls) =>
        Class.forName(cls).getDeclaredConstructor()
          .newInstance().asInstanceOf[CacheBackend]
    }
}
