package graft.tools

/** Print every registered query name (one per line, `name<TAB>oracle|weak`)
  * without executing anything — the registry manifest tools/sf1_delta.py
  * diffs against CORRECTNESS_sf1.json to find queries the sf1 oracle
  * rehearsal hasn't covered yet.
  */
object ListQueries {
  def main(args: Array[String]): Unit = {
    val oracles = graft.SparkEntry.oracleSql.keySet
    graft.SparkEntry.queries.keys.toSeq.sorted.foreach { n =>
      println(s"$n\t${if (oracles(n)) "oracle" else "weak"}")
    }
  }
}
