package org.apache.spark.sql

/** Test-only accessor for `private[sql]` cache-manager internals — lets the
  * graft cache-hygiene audit count live cache entries without reflection.
  */
object GraftCacheProbe {
  def numCachedEntries(s: classic.SparkSession): Int =
    s.sharedState.cacheManager.numCachedEntries
}
