package graft.queries

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType
import org.apache.spark.sql.{Column, DataFrame, SparkSession}

import graft.Tables.t

/** Core relational operator coverage (SURVEY.md §2.2–§2.7): scans with
  * pushdown, equi/semi/anti/broadcast joins, hash aggregation, cube, windows,
  * sorts/limits/offsets/top-k, set ops, scalar functions.
  *
  * Numeric parity rules (DuckDB oracle hash-compares values):
  *   - money sums: cast operands to DECIMAL before arithmetic → exact,
  *     order-independent sums in both engines;
  *   - ratios/averages: decimal sum → double → round(_, 4);
  *   - every query ends in a total ORDER BY.
  */
object Relational {

  private def dec2(c: Column): Column = c.cast(DecimalType(18, 2))

  val all: Seq[GQuery] = Seq(

    // ---- A1/A3-style hash aggregation with decimal sums (TPC-H Q1 shape) --
    q("q01_pricing_summary",
      """SELECT l_returnflag, l_linestatus,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS sum_disc_price,
        |  ROUND(CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*), 4) AS avg_qty,
        |  COUNT(*) AS count_order
        |FROM lineitem
        |WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
        |GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag, l_linestatus""".stripMargin) { (s, dir) =>
      t(s, dir, "lineitem")
        .filter(col("l_shipdate") <= lit("1998-09-02 00:00:00").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
          sum(dec2(col("l_quantity"))).cast("double").as("sum_qty"),
          sum(dec2(col("l_extendedprice"))).cast("double").as("sum_base_price"),
          sum(dec2(col("l_extendedprice")) * (lit(1) - dec2(col("l_discount"))))
            .cast("double").as("sum_disc_price"),
          round(sum(dec2(col("l_quantity"))).cast("double") / count(lit(1)), 4)
            .as("avg_qty"),
          count(lit(1)).as("count_order"))
        .orderBy("l_returnflag", "l_linestatus")
    },

    // ---- P2/P3: selective filter + narrow projection (pushdown showcase) --
    q("q02_filter_project",
      """SELECT l_orderkey, l_linenumber,
        |  l_extendedprice AS price
        |FROM lineitem
        |WHERE l_shipdate >= TIMESTAMP '1995-01-01 00:00:00'
        |  AND l_shipdate < TIMESTAMP '1995-02-01 00:00:00'
        |  AND l_discount >= 0.09 AND l_quantity > 45
        |ORDER BY l_orderkey, l_linenumber""".stripMargin) { (s, dir) =>
      t(s, dir, "lineitem")
        .filter(col("l_shipdate") >= lit("1995-01-01 00:00:00").cast("timestamp")
          && col("l_shipdate") < lit("1995-02-01 00:00:00").cast("timestamp")
          && col("l_discount") >= 0.09 && col("l_quantity") > 45)
        .select(col("l_orderkey"), col("l_linenumber"),
          col("l_extendedprice").as("price"))
        .orderBy("l_orderkey", "l_linenumber")
    },

    // ---- J-series: 3-way join + agg + top-k (TPC-H Q3 shape) -------------
    q("q03_shipping_priority",
      """SELECT l_orderkey,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue,
        |  o_orderpriority
        |FROM customer JOIN orders ON c_custkey = o_custkey
        |  JOIN lineitem ON l_orderkey = o_orderkey
        |WHERE c_mktsegment = 'BUILDING'
        |  AND o_orderdate < TIMESTAMP '1995-03-15 00:00:00'
        |  AND l_shipdate > TIMESTAMP '1995-03-15 00:00:00'
        |GROUP BY l_orderkey, o_orderpriority
        |ORDER BY revenue DESC, l_orderkey LIMIT 10""".stripMargin) { (s, dir) =>
      val cust = t(s, dir, "customer").filter(col("c_mktsegment") === "BUILDING")
      val ord = t(s, dir, "orders")
        .filter(col("o_orderdate") < lit("1995-03-15 00:00:00").cast("timestamp"))
      val li = t(s, dir, "lineitem")
        .filter(col("l_shipdate") > lit("1995-03-15 00:00:00").cast("timestamp"))
      li.join(ord, col("l_orderkey") === col("o_orderkey"))
        .join(broadcast(cust), col("o_custkey") === col("c_custkey"))
        .groupBy("l_orderkey", "o_orderpriority")
        .agg(sum(dec2(col("l_extendedprice")) * (lit(1) - dec2(col("l_discount"))))
          .cast("double").as("revenue"))
        .select("l_orderkey", "revenue", "o_orderpriority")
        .orderBy(desc("revenue"), col("l_orderkey"))
        .limit(10)
    },

    // ---- J-series: star join over broadcast dims (TPC-H Q5 shape) --------
    q("q04_revenue_by_nation",
      """SELECT n_name,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue
        |FROM lineitem
        |  JOIN orders ON l_orderkey = o_orderkey
        |  JOIN supplier ON l_suppkey = s_suppkey
        |  JOIN nation ON s_nationkey = n_nationkey
        |  JOIN region ON n_regionkey = r_regionkey
        |GROUP BY n_name
        |ORDER BY revenue DESC, n_name""".stripMargin) { (s, dir) =>
      val li = t(s, dir, "lineitem")
      val ord = t(s, dir, "orders").select("o_orderkey")
      val sup = t(s, dir, "supplier").select("s_suppkey", "s_nationkey")
      val nat = t(s, dir, "nation")
      val reg = t(s, dir, "region")
      li.join(ord, col("l_orderkey") === col("o_orderkey"))
        .join(broadcast(sup), col("l_suppkey") === col("s_suppkey"))
        .join(broadcast(nat), col("s_nationkey") === col("n_nationkey"))
        .join(broadcast(reg), col("n_regionkey") === col("r_regionkey"))
        .groupBy("n_name")
        .agg(sum(dec2(col("l_extendedprice")) * (lit(1) - dec2(col("l_discount"))))
          .cast("double").as("revenue"))
        .orderBy(desc("revenue"), col("n_name"))
    },

    // ---- J1/J2: left-semi join (EXISTS) -----------------------------------
    q("q05_semi_join",
      """SELECT o_orderkey, o_totalprice AS total
        |FROM orders
        |WHERE o_orderkey IN (SELECT l_orderkey FROM lineitem WHERE l_quantity >= 49)
        |ORDER BY o_orderkey""".stripMargin) { (s, dir) =>
      val big = t(s, dir, "lineitem").filter(col("l_quantity") >= 49)
        .select("l_orderkey")
      t(s, dir, "orders")
        .join(big, col("o_orderkey") === col("l_orderkey"), "left_semi")
        .select(col("o_orderkey"), col("o_totalprice").as("total"))
        .orderBy("o_orderkey")
    },

    // ---- J5/J6: left-anti join (NOT EXISTS) -------------------------------
    q("q06_anti_join",
      """SELECT c_custkey, c_name FROM customer
        |WHERE NOT EXISTS (SELECT 1 FROM orders
        |                  WHERE o_custkey = c_custkey AND o_orderpriority = '1-URGENT')
        |ORDER BY c_custkey""".stripMargin) { (s, dir) =>
      t(s, dir, "customer")
        .join(t(s, dir, "orders").filter(col("o_orderpriority") === "1-URGENT")
          .select("o_custkey"),
          col("c_custkey") === col("o_custkey"), "left_anti")
        .select("c_custkey", "c_name")
        .orderBy("c_custkey")
    },

    // ---- U1/U2/J3: union + dedup-by-key ------------------------------------
    q("q07_union_dedup",
      """SELECT o_orderkey, o_orderstatus FROM orders WHERE o_orderpriority = '1-URGENT'
        |UNION
        |SELECT o_orderkey, o_orderstatus FROM orders WHERE o_orderstatus = 'F' AND o_totalprice > 300000
        |ORDER BY o_orderkey""".stripMargin) { (s, dir) =>
      val o = t(s, dir, "orders")
      val a = o.filter(col("o_orderpriority") === "1-URGENT")
        .select("o_orderkey", "o_orderstatus")
      val b = o.filter(col("o_orderstatus") === "F" && col("o_totalprice") > 300000)
        .select("o_orderkey", "o_orderstatus")
      a.union(b).dropDuplicates("o_orderkey", "o_orderstatus").orderBy("o_orderkey")
    },

    // ---- U4: set difference -------------------------------------------------
    q("q08_except",
      """SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'
        |EXCEPT
        |SELECT o_custkey FROM orders WHERE o_orderstatus = 'O'
        |ORDER BY o_custkey""".stripMargin) { (s, dir) =>
      val o = t(s, dir, "orders")
      o.filter(col("o_orderstatus") === "F").select("o_custkey")
        .except(o.filter(col("o_orderstatus") === "O").select("o_custkey"))
        .orderBy("o_custkey")
    },

    // ---- A1 preview breakdowns as one pass: CUBE ---------------------------
    q("q09_cube",
      """SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n,
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total
        |FROM orders GROUP BY CUBE (o_orderstatus, o_orderpriority)
        |ORDER BY o_orderstatus NULLS FIRST, o_orderpriority NULLS FIRST""".stripMargin) { (s, dir) =>
      t(s, dir, "orders")
        .cube("o_orderstatus", "o_orderpriority")
        .agg(count(lit(1)).as("n"), sum(dec2(col("o_totalprice"))).cast("double").as("total"))
        .orderBy(col("o_orderstatus").asc_nulls_first,
          col("o_orderpriority").asc_nulls_first)
    },

    // ---- O5-analog: bounded history via ranking window ---------------------
    q("q10_window_topn",
      """SELECT o_custkey, o_orderkey, rn FROM (
        |  SELECT o_custkey, o_orderkey,
        |    ROW_NUMBER() OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey) AS rn
        |  FROM orders) WHERE rn <= 3
        |ORDER BY o_custkey, rn""".stripMargin) { (s, dir) =>
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy("o_custkey")
        .orderBy(desc("o_totalprice"), col("o_orderkey"))
      t(s, dir, "orders")
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") <= 3)
        .select("o_custkey", "o_orderkey", "rn")
        .orderBy("o_custkey", "rn")
    },

    // ---- S3/O7: deterministic pagination ------------------------------------
    q("q11_offset_limit",
      """SELECT o_orderkey, o_orderpriority FROM orders
        |ORDER BY o_orderkey LIMIT 50 OFFSET 100""".stripMargin) { (s, dir) =>
      t(s, dir, "orders").select("o_orderkey", "o_orderpriority")
        .orderBy("o_orderkey").offset(100).limit(50)
    },

    // ---- S3/O7: keyset (cursor) pagination — the scale-safe page fetch.
    // OFFSET n scans and discards n rows, so deep paging is O(page·depth);
    // a keyset cursor turns page N+1 into a pushed-down range predicate on
    // the sort key — (updated, key) strictly after the last row served —
    // and every page costs one pruned scan + TakeOrderedAndProject,
    // independent of depth. The tuple comparison spells out as the
    // (a > t) OR (a = t AND b > k) disjunction both engines plan the
    // same way; the (updated, key) order is total, so pages are
    // deterministic and gap/dup-free under concurrent appends of later
    // timestamps.
    q("q15_keyset_page",
      graft.Oracle.withIssues(
        """SELECT key, project_key,
          |  strftime(updated, '%Y-%m-%d %H:%M:%S') AS updated_s
          |FROM issues
          |WHERE updated > TIMESTAMP '1997-06-01 00:00:00'
          |   OR (updated = TIMESTAMP '1997-06-01 00:00:00' AND key > 'P1-100')
          |ORDER BY updated, key LIMIT 10""".stripMargin)) { (s, dir) =>
      val t0 = lit("1997-06-01 00:00:00").cast("timestamp")
      graft.Tables.issues(s, dir)
        .filter(col("updated") > t0 ||
          (col("updated") === t0 && col("key") > "P1-100"))
        .orderBy(col("updated"), col("key")).limit(10)
        .select(col("key"), col("project_key"),
          date_format(col("updated"), "yyyy-MM-dd HH:mm:ss").as("updated_s"))
    },

    // ---- F1-F5/F11: scalar function pack over the derived issues table -----
    q("q12_scalar_funcs",
      graft.Oracle.withIssues(
        """SELECT key,
          |  regexp_extract(key, '^(.*)-[0-9]+$', 1) AS proj,
          |  sha256(summary) AS checksum,
          |  length(summary) AS n_chars,
          |  upper(status_name) AS status_uc,
          |  len(string_split(summary, ' ')) AS n_tokens,
          |  strftime(updated, '%Y-%m-%d') AS updated_day
          |FROM issues WHERE issuetype = 'Story'
          |ORDER BY key LIMIT 500""".stripMargin)) { (s, dir) =>
      graft.Tables.issues(s, dir)
        .filter(col("issuetype") === "Story")
        .select(col("key"),
          regexp_extract(col("key"), "^(.*)-[0-9]+$", 1).as("proj"),
          sha2(col("summary"), 256).as("checksum"),
          length(col("summary")).as("n_chars"),
          upper(col("status_name")).as("status_uc"),
          size(split(col("summary"), " ")).as("n_tokens"),
          date_format(col("updated"), "yyyy-MM-dd").as("updated_day"))
        .orderBy("key").limit(500)
    },

    // ---- events: JSON extraction + agg --------------------------------------
    q("q13_events_json",
      """SELECT event_type, COUNT(*) AS n,
        |  CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value,
        |  MAX(CAST(json_extract_string(props, '$.k') AS INT)) AS max_k
        |FROM events GROUP BY event_type
        |ORDER BY event_type""".stripMargin) { (s, dir) =>
      graft.Tables.events(s, dir)
        .groupBy("event_type")
        .agg(count(lit(1)).as("n"),
          sum(dec2(col("value"))).cast("double").as("total_value"),
          max(get_json_object(col("props"), "$.k").cast("int")).as("max_k"))
        .orderBy("event_type")
    },

    // ---- A2/A3-style: collect_set + sort, rendered as string ---------------
    q("q14_collect_set",
      """SELECT o_custkey,
        |  array_to_string(list_sort(list(DISTINCT o_orderstatus)), ',') AS statuses,
        |  COUNT(*) AS n_orders
        |FROM orders GROUP BY o_custkey
        |ORDER BY o_custkey LIMIT 1000""".stripMargin) { (s, dir) =>
      t(s, dir, "orders")
        .groupBy("o_custkey")
        .agg(array_join(sort_array(collect_set(col("o_orderstatus"))), ",")
          .as("statuses"),
          count(lit(1)).as("n_orders"))
        .orderBy("o_custkey").limit(1000)
    }
  )
}
