package graft

import org.scalatest.funsuite.AnyFunSuite

/** Cache lifecycle audit: the session `CacheManager` is a shared, unbounded
  * resource — a query builder that persists a frame and never releases it
  * taxes every later query in a long-lived driver. The rule enforced here:
  * after ANY registered query executes, the cache holds exactly the
  * fragments memoized through [[Caches]] (the deliberate, enumerable,
  * releasable long-lived caches) and nothing else.
  */
class CacheAuditSpec extends AnyFunSuite {
  import TestSpark._

  private def session = spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
  private def cm = session.sharedState.cacheManager

  private def classicDf(df: org.apache.spark.sql.DataFrame) =
    df.asInstanceOf[org.apache.spark.sql.classic.Dataset[_]]

  test("every registered query leaves only memoized fragments cached") {
    Caches.clear(spark)
    spark.catalog.clearCache()
    val offenders = SparkEntry.queries.toSeq.sortBy(_._1).flatMap {
      case (name, fn) =>
        fn(spark, sf).collect()
        val frags = Caches.fragments(spark)
        // distinct CachedData entries accounted for by live fragments (two
        // fragment names could in principle canonicalize to one plan)
        val accounted = frags
          .flatMap { case (_, f) => cm.lookupCachedData(classicDf(f)) }
          .map(System.identityHashCode).toSet.size
        if (org.apache.spark.sql.GraftCacheProbe.numCachedEntries(session) == accounted) None
        else Some(s"$name: ${org.apache.spark.sql.GraftCacheProbe.numCachedEntries(session)} cached entries but only " +
          s"$accounted accounted for by fragments " +
          s"[${frags.map(_._1).mkString(", ")}]")
    }
    assert(offenders.isEmpty,
      "queries left unregistered cache entries:\n" + offenders.mkString("\n"))
  }

  test("fragment registry is thread-safe: concurrent builders share entries") {
    Caches.clear(spark)
    spark.catalog.clearCache()
    import scala.concurrent.{Await, ExecutionContext, Future}
    import scala.concurrent.duration._
    implicit val ec: ExecutionContext = ExecutionContext.global
    // all four queries race to memoize the SAME underlying fragments
    // (band signatures, candidates, verify sets) on one session — a
    // long-lived driver serving parallel requests does exactly this
    val names = Seq("pipe_dedup_minhash", "pipe_dedup_jaccard",
      "pipe_dedup_containment", "pipe_dedup_survivor")
    val serialCounts = names.map(n =>
      n -> SparkEntry.queries(n)(spark, sf).count()).toMap
    val serialFrags = Caches.fragments(spark).map(_._1).sorted
    Caches.clear(spark)
    spark.catalog.clearCache()
    val futures = (0 until 8).map { i =>
      val n = names(i % names.length)
      Future(n -> SparkEntry.queries(n)(spark, sf).count())
    }
    val racedCounts = Await.result(Future.sequence(futures), 5.minutes)
    racedCounts.foreach { case (n, c) =>
      assert(c == serialCounts(n), s"$n: raced count $c != serial ${serialCounts(n)}")
    }
    val frags = Caches.fragments(spark).map(_._1).sorted
    assert(frags == serialFrags,
      s"racing builders changed the fragment set: $frags vs $serialFrags")
    // and the CacheManager still holds exactly the registered fragments
    val accounted = Caches.fragments(spark)
      .flatMap { case (_, f) => cm.lookupCachedData(classicDf(f)) }
      .map(System.identityHashCode).toSet.size
    assert(org.apache.spark.sql.GraftCacheProbe.numCachedEntries(session) == accounted,
      "concurrent builds left unregistered cache entries")
  }

  test("clear releases every fragment and empties the cache") {
    // touch a fragment-heavy query so something is definitely cached
    SparkEntry.queries("pipe_dedup_jaccard")(spark, sf).collect()
    assert(Caches.fragments(spark).nonEmpty)
    assert(!cm.isEmpty)
    Caches.clear(spark)
    assert(Caches.fragments(spark).isEmpty)
    assert(cm.isEmpty,
      "CacheManager still holds entries after Caches.clear — a builder is " +
        "persisting outside the fragment registry")
  }

  test("LRU dir cap evicts and unpersists the stalest dir's fragments") {
    Caches.clear(spark)
    spark.catalog.clearCache()
    spark.conf.set(Caches.MaxDirsKey, "2")
    try {
      // distinct row counts per dir so no two probe plans canonicalize to
      // the same CacheManager entry
      def reg(dir: String) = Caches.fragment(spark, dir, "probe") {
        spark.range(10 + dir.last.toLong).toDF("n")
      }
      val a = reg("/lru/dirA"); val b = reg("/lru/dirB")
      assert(Caches.fragments(spark).map(_._1).sorted ==
        Seq("/lru/dirA#probe", "/lru/dirB#probe"))
      val c = reg("/lru/dirC") // over cap: dirA is LRU, must be evicted
      assert(Caches.fragments(spark).map(_._1).sorted ==
        Seq("/lru/dirB#probe", "/lru/dirC#probe"),
        "cap 2 with 3 dirs must keep only the 2 most recently used")
      assert(classicDf(a).storageLevel ==
        org.apache.spark.storage.StorageLevel.NONE,
        "evicted dir's fragment must be unpersisted")
      // the cache manager holds exactly the surviving allowlist
      b.collect(); c.collect()
      val accounted = Caches.fragments(spark)
        .flatMap { case (_, f) => cm.lookupCachedData(classicDf(f)) }
        .map(System.identityHashCode).toSet.size
      assert(org.apache.spark.sql.GraftCacheProbe.numCachedEntries(session) == accounted)
      // touching dirB refreshes its recency: next eviction takes dirC
      reg("/lru/dirB"); reg("/lru/dirD")
      assert(Caches.fragments(spark).map(_._1).sorted ==
        Seq("/lru/dirB#probe", "/lru/dirD#probe"))
      // explicit dir retirement releases without waiting for the cap
      Caches.clearDir(spark, "/lru/dirB")
      assert(Caches.fragments(spark).map(_._1) == Seq("/lru/dirD#probe"))
    } finally {
      spark.conf.unset(Caches.MaxDirsKey)
      Caches.clear(spark)
      spark.catalog.clearCache()
    }
  }

  test("bypass builds register nothing and memoization is referentially stable") {
    Caches.clear(spark)
    spark.catalog.clearCache()
    Caches.bypassed {
      SparkEntry.queries("pipe_dedup_minhash")(spark, sf)
    }
    assert(Caches.fragments(spark).isEmpty && cm.isEmpty,
      "bypassed build memoized or cached a fragment")
    val a = SparkEntry.queries("pipe_dedup_minhash")(spark, sf)
    val n = Caches.fragments(spark).size
    val b = SparkEntry.queries("pipe_dedup_minhash")(spark, sf)
    assert(Caches.fragments(spark).size == n,
      "rebuilding the same query grew the fragment registry")
    a.collect(); b.collect()
    assert(org.apache.spark.sql.GraftCacheProbe.numCachedEntries(session) == Caches.fragments(spark)
      .flatMap { case (_, f) => cm.lookupCachedData(classicDf(f)) }
      .map(System.identityHashCode).toSet.size)
  }
}
