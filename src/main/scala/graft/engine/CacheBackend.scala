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

  /** Conf-driven backend so a shared tier deploys without code:
    * `spark.graft.resultCache.backend` = `heap` (default) or the fully
    * qualified class name of a [[CacheBackend]] with a no-arg constructor
    * (the adapter owns its client/endpoint configuration — this engine
    * adds no network dependencies). A present-but-unloadable value fails
    * Engine construction loudly: a typo'd cache tier must not silently
    * fall back to an unshared heap. */
  def fromConf(spark: org.apache.spark.sql.SparkSession,
      maxBytes: Long): CacheBackend =
    spark.conf.getOption("spark.graft.resultCache.backend") match {
      case None | Some("heap") => new HeapLru(maxBytes)
      case Some(cls) =>
        Class.forName(cls).getDeclaredConstructor()
          .newInstance().asInstanceOf[CacheBackend]
    }
}
