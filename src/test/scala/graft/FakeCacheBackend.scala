package graft

/** Test double for the pluggable cache tier: unbounded map storage with
  * call counters — stands in for a shared external KV. Top-level with a
  * no-arg constructor so the conf-driven reflective load path can
  * instantiate it too. */
class FakeCacheBackend extends graft.engine.CacheBackend {
  val entries = new java.util.concurrent.ConcurrentHashMap[String, String]()
  val gets = new java.util.concurrent.atomic.AtomicLong
  val puts = new java.util.concurrent.atomic.AtomicLong
  /** Per-key put counts — the single-flight law's observable. */
  val putsByKey =
    new java.util.concurrent.ConcurrentHashMap[String,
      java.util.concurrent.atomic.AtomicLong]()

  override def name: String = "fake"
  override def get(key: String): Option[String] = {
    gets.incrementAndGet()
    Option(entries.get(key))
  }
  override def put(key: String, value: String): Unit = {
    puts.incrementAndGet()
    putsByKey.computeIfAbsent(key,
      _ => new java.util.concurrent.atomic.AtomicLong).incrementAndGet()
    entries.put(key, value): Unit
  }
  override def stats: Map[String, Long] = {
    import scala.jdk.CollectionConverters._
    Map("entries" -> entries.size.toLong,
      "bytes" -> entries.asScala.iterator
        .map { case (k, v) => 2L * (k.length + v.length) }.sum)
  }
}
