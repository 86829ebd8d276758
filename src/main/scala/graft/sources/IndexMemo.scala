package graft.sources

/** Shared build-once machinery for the dir-derived persisted indexes
  * (AnnIndex / PostingsIndex ensureFor): first call for a key builds,
  * later calls return the table name for free; a changed corpus
  * listing signature rebuilds in place. The key — and therefore the
  * TABLE NAME, which hashes the key — carries every parameter that
  * shapes the physical index (banding, bucket count, the caller's
  * corpus tag) so a caller asking for a different layout can never be
  * handed a memo hit built at another one: it resolves to a different
  * table and builds it (the silent never-collide hazard the append-side
  * banding require() closes, closed on the ensure path by
  * construction). */
private[sources] object IndexMemo {

  private val ensured =
    new java.util.concurrent.ConcurrentHashMap[String, (String, String)]()

  /** `key` = every layout-shaping parameter + the corpus dir;
    * `listingSig` = the dir's current file-listing signature;
    * `tablePrefix` = human-readable table-name stem. `build` receives
    * the derived table name and runs at most once per (key, signature). */
  def ensure(key: String, listingSig: String, tablePrefix: String)(
      build: String => Unit): String =
    ensured.compute(key, (_, prev) =>
      if (prev != null && prev._1 == listingSig) prev
      else {
        val table = tablePrefix + "_" + java.security.MessageDigest
          .getInstance("MD5").digest(key.getBytes("UTF-8"))
          .map("%02x".format(_)).mkString.take(8)
        build(table)
        (listingSig, table)
      })._2
}
