package graft.api

import org.apache.spark.sql.DataFrame
import org.apache.spark.storage.StorageLevel

/** Keyed result cache with a TTL — the reference caches every reader
  * query in a dogpile/Redis region for 2 h, keyed by the rendered
  * statement + parameters (web/routes/api/rest/utils/caching.py:23-66,
  * region config web/db/session.py:24-38). Spark-native equivalent:
  * the first read of a key `persist()`s the result (block manager,
  * memory-then-disk); identical reads inside the TTL return the same
  * cached DataFrame, so their plans scan the in-memory relation
  * instead of re-reading and re-aggregating the source. Reader
  * results are ≤500 rows (the API clamp), so entries are tiny;
  * expiry unpersists the old entry lazily on next access.
  *
  * `clock` is injectable (epoch seconds) so TTL expiry is
  * deterministic in tests — the same reasoning as the readers'
  * parameterized `asOf` (SURVEY F8).
  */
class QueryCache(ttlSeconds: Long = QueryCache.defaultTtlSeconds,
                 clock: () => Long = () => System.currentTimeMillis() / 1000L) {

  private case class Entry(df: DataFrame, at: Long)
  private val entries = scala.collection.mutable.HashMap.empty[String, Entry]

  /** The cached DataFrame for `key` if fresh, else `compute` persisted
    * and remembered. Thread-safe; the stale entry (if any) is
    * unpersisted without blocking.
    */
  def getOrCompute(key: String)(compute: => DataFrame): DataFrame = synchronized {
    val now = clock()
    entries.get(key) match {
      case Some(e) if now - e.at < ttlSeconds => e.df
      case stale =>
        stale.foreach(_.df.unpersist(blocking = false))
        val df = compute.persist(StorageLevel.MEMORY_AND_DISK)
        entries.update(key, Entry(df, now))
        df
    }
  }

  def size: Int = synchronized(entries.size)

  /** Drop everything (e.g. after a rollup refresh made results stale —
    * the reference instead lets the 2 h TTL absorb refresh lag).
    */
  def invalidateAll(): Unit = synchronized {
    entries.values.foreach(_.df.unpersist(blocking = false))
    entries.clear()
  }
}

object QueryCache {
  /** web/db/session.py:31 — dogpile region expiration_time. */
  val defaultTtlSeconds: Long = 7200L
}
