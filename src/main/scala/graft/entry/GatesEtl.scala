package graft
package entry

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.functions.{Ffiec, Text, Vectors}
import graft.operators.{CombineParts, Dedup, Graph, KeyChecks, Knn, LongPivot, Pq, Sampling, TextAnalytics}
import graft.sources.{Scan, XbrlZip}
import graft.streaming.Sessions

import graft.entry.EntryHelpers._

/** Gate registry, reference ETL operators + scan/union/metadata surface — split verbatim out of
  * SparkEntry.scala (round 10, r9 verdict ask #8; zero behavior
  * change, every entry byte-identical to the monolith at split
  * time). SparkEntry concatenates the family maps back into the
  * driver contract.
  */
private[graft] object GatesEtl {

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(

"q07_combine_parts" -> ((s, dir) => {
      val customer = t(s, dir, "customer")
      val part1 = customer.select(
        col("c_custkey"),
        when(col("c_custkey") % 3 === 0, lit(null).cast("string"))
          .otherwise(col("c_name")).as("c_name"),
        col("c_nationkey"))
      val part2 = customer.select(col("c_custkey"), col("c_name"), col("c_acctbal"))
      CombineParts.combine(Seq(part1, part2), key = "c_custkey")
        .orderBy("c_custkey")
    }),

"q08_unpivot_long" -> ((s, dir) => {
      LongPivot.long(
        t(s, dir, "lineitem")
          .select("l_orderkey", "l_linenumber", "l_quantity",
            "l_extendedprice", "l_discount", "l_tax"),
        idCols = Seq("l_orderkey", "l_linenumber"),
        dtype = DoubleType)
        .orderBy("l_orderkey", "l_linenumber", "item", "value")
    }),

"q09_pivot_wide" -> ((s, dir) => {
      val priorities = Seq("1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW")
      val long = t(s, dir, "orders")
        .select(col("o_custkey"), col("o_orderpriority"),
          col("o_totalprice").cast(DecimalType(28, 4)).as("price"))
      val wide = LongPivot.wide(long, idCols = Seq("o_custkey"),
        namesFrom = "o_orderpriority", valuesFrom = "price",
        items = priorities, valuesFn = "sum")
      wide.select(
        col("o_custkey"),
        col("`1-URGENT`").cast("double").as("p_urgent"),
        col("`2-HIGH`").cast("double").as("p_high"),
        col("`3-MEDIUM`").cast("double").as("p_medium"),
        col("`4-NOT SPECIFIED`").cast("double").as("p_notspec"),
        col("`5-LOW`").cast("double").as("p_low"))
        .orderBy("o_custkey")
    }),

"q10_parse_dates" -> ((s, dir) => {
      val raw = t(s, dir, "orders").select(
        col("o_orderkey"),
        when(col("o_orderkey") % 97 === 0, lit("0"))
          .when(col("o_orderkey") % 89 === 0, lit("99991399"))
          .when(col("o_orderkey") % 83 === 0, lit("00000000"))
          .otherwise(date_format(col("o_orderdate"), "yyyyMMdd")).as("date_str"))
      raw.select(col("o_orderkey"), col("date_str"),
          Ffiec.parseFfiecDate(col("date_str")).as("parsed_date"))
        .orderBy("o_orderkey")
    }),

"q11_id_zero_null" -> ((s, dir) => {
      val raw = t(s, dir, "customer").select(
        col("c_custkey"),
        when(col("c_custkey") % 10 === 0, lit("0"))
          .when(col("c_custkey") % 7 === 0, lit(" "))
          .otherwise(col("c_custkey").cast("string")).as("id_raw"))
      raw.select(col("c_custkey"), Ffiec.idZeroNull(col("id_raw")).as("id_clean"))
        .orderBy("c_custkey")
    }),

"q12_pct_to_prop" -> ((s, dir) => {
      val raw = t(s, dir, "lineitem").select(
        col("l_orderkey"), col("l_linenumber"),
        concat(round(col("l_discount") * 100, 0).cast("int"), lit("%")).as("pct_str"))
      raw.select(col("l_orderkey"), col("l_linenumber"),
          round(Ffiec.pctToProp(col("pct_str")), 4).as("prop"))
        .orderBy("l_orderkey", "l_linenumber", "prop")
    }),

"q13_check_pk" -> ((s, dir) => {
      KeyChecks.pkViolations(t(s, dir, "orders"), Seq("o_custkey"))
        .orderBy("o_custkey")
    }),

"q14_null_counts" -> ((s, dir) => {
      val withNulls = t(s, dir, "customer").select(
        col("c_custkey"),
        when(col("c_custkey") % 5 === 0, lit(null).cast("string"))
          .otherwise(col("c_name")).as("c_name"),
        when(col("c_custkey") % 11 === 0, lit(null).cast("double"))
          .otherwise(col("c_acctbal")).as("c_acctbal"))
      KeyChecks.nullCounts(withNulls, Seq("c_name", "c_acctbal"))
        .withColumnRenamed("column", "col_name")
        .orderBy("col_name")
    }),

"q26_union_by_name" -> ((s, dir) => {
      val orders = t(s, dir, "orders")
      val a = orders.where(col("o_orderkey") % 2 === 0)
        .select("o_orderkey", "o_totalprice")
      val b = orders.where(col("o_orderkey") % 2 === 1)
        .select("o_orderkey", "o_orderstatus")
      Scan.unionFramesByName(Seq(a, b)).orderBy("o_orderkey")
    }),

"q27_item_schedules" -> ((s, dir) => {
      import s.implicits._
      val li = LongPivot.colsOfType(t(s, dir, "lineitem"), DoubleType,
        Seq("l_orderkey", "l_linenumber"))
      val or = LongPivot.colsOfType(t(s, dir, "orders"), DoubleType,
        Seq("o_orderkey"))
      val scheduleItems =
        (li.map(("lineitem", _)) ++ or.map(("orders", _)))
          .toDF("schedule", "item")
      // schedules is serialized to a comma-joined string so the driver's
      // comparator (which sorts/hashes cell values) sees a scalar column.
      LongPivot.itemSchedules(scheduleItems)
        .select(col("item"), concat_ws(",", col("schedules")).as("schedules"))
        .orderBy("item")
    }),

"q28_xbrl_extract" -> ((s, dir) => {
      import s.implicits._
      val xml = t(s, dir, "orders").select(
        col("o_orderkey"),
        concat(
          lit("""<xbrl xmlns:cc="http://www.ffiec.gov/xbrl"><cc:RCFD2170 contextRef="rc_"""),
          col("o_orderkey"), lit("""_1998-12-31" unitRef="USD" decimals="0">"""),
          col("o_custkey"), lit("</cc:RCFD2170></xbrl>")).as("xml"))
        .as[(Long, String)]
      xml.flatMap { case (_, doc) => XbrlZip.parseXbrl(doc) }
        .toDF()
        .select(col("IDRSSD").as("idrssd"), col("date").as("report_date"),
          col("schedule"), col("item"), col("unitRef").as("unit_ref"),
          col("decimals"), col("value"), col("n_attrs"))
        .orderBy("idrssd")
    }),

"q29_tz_convert" -> ((s, dir) => {
      val ev = events(s, dir).select(
        col("event_id"),
        date_format(col("ts"), "yyyy-MM-dd'T'HH:mm:ss").as("ts_str"))
      ev.select(col("event_id"),
          unix_timestamp(to_utc_timestamp(
            to_timestamp(col("ts_str"), "yyyy-MM-dd'T'HH:mm:ss"), "-05:00")).as("utc_epoch"))
        .orderBy("event_id")
    }))

  val oracles: Map[String, String] = Map(

"q07_combine_parts" ->
      """SELECT c_custkey,
        |  COALESCE(CASE WHEN c_custkey % 3 = 0 THEN NULL ELSE c_name END, c_name) AS c_name,
        |  c_nationkey, c_acctbal
        |FROM customer
        |ORDER BY c_custkey""".stripMargin,

"q08_unpivot_long" ->
      """SELECT DISTINCT l_orderkey, l_linenumber, item, value FROM (
        |  UNPIVOT (SELECT l_orderkey, l_linenumber, l_quantity, l_extendedprice,
        |                  l_discount, l_tax FROM lineitem)
        |  ON COLUMNS(* EXCLUDE (l_orderkey, l_linenumber))
        |  INTO NAME item VALUE value) u
        |WHERE value IS NOT NULL
        |ORDER BY l_orderkey, l_linenumber, item, value""".stripMargin,

"q09_pivot_wide" ->
      """SELECT o_custkey,
        |  CAST(SUM(CASE WHEN o_orderpriority = '1-URGENT' THEN CAST(o_totalprice AS DECIMAL(28,4)) END) AS DOUBLE) AS p_urgent,
        |  CAST(SUM(CASE WHEN o_orderpriority = '2-HIGH' THEN CAST(o_totalprice AS DECIMAL(28,4)) END) AS DOUBLE) AS p_high,
        |  CAST(SUM(CASE WHEN o_orderpriority = '3-MEDIUM' THEN CAST(o_totalprice AS DECIMAL(28,4)) END) AS DOUBLE) AS p_medium,
        |  CAST(SUM(CASE WHEN o_orderpriority = '4-NOT SPECIFIED' THEN CAST(o_totalprice AS DECIMAL(28,4)) END) AS DOUBLE) AS p_notspec,
        |  CAST(SUM(CASE WHEN o_orderpriority = '5-LOW' THEN CAST(o_totalprice AS DECIMAL(28,4)) END) AS DOUBLE) AS p_low
        |FROM orders
        |GROUP BY o_custkey
        |ORDER BY o_custkey""".stripMargin,

"q10_parse_dates" ->
      """SELECT o_orderkey, date_str,
        |  CASE WHEN trim(date_str) IN ('', '0', '00000000') THEN NULL
        |       ELSE CAST(try_strptime(trim(date_str), '%Y%m%d') AS DATE) END AS parsed_date
        |FROM (SELECT o_orderkey,
        |        CASE WHEN o_orderkey % 97 = 0 THEN '0'
        |             WHEN o_orderkey % 89 = 0 THEN '99991399'
        |             WHEN o_orderkey % 83 = 0 THEN '00000000'
        |             ELSE strftime(o_orderdate, '%Y%m%d') END AS date_str
        |      FROM orders) x
        |ORDER BY o_orderkey""".stripMargin,

"q11_id_zero_null" ->
      """SELECT c_custkey,
        |  CASE WHEN trim(id_raw) IN ('', '0') THEN NULL ELSE trim(id_raw) END AS id_clean
        |FROM (SELECT c_custkey,
        |        CASE WHEN c_custkey % 10 = 0 THEN '0'
        |             WHEN c_custkey % 7 = 0 THEN ' '
        |             ELSE CAST(c_custkey AS VARCHAR) END AS id_raw
        |      FROM customer) x
        |ORDER BY c_custkey""".stripMargin,

"q12_pct_to_prop" ->
      """SELECT l_orderkey, l_linenumber,
        |  ROUND(CAST(regexp_replace(pct_str, '[%,]', '', 'g') AS DOUBLE) / 100.0, 4) AS prop
        |FROM (SELECT l_orderkey, l_linenumber,
        |        CAST(CAST(ROUND(l_discount * 100, 0) AS INTEGER) AS VARCHAR) || '%' AS pct_str
        |      FROM lineitem) x
        |ORDER BY l_orderkey, l_linenumber, prop""".stripMargin,

"q13_check_pk" ->
      """SELECT o_custkey, COUNT(*) AS n
        |FROM orders GROUP BY o_custkey HAVING COUNT(*) > 1
        |ORDER BY o_custkey""".stripMargin,

"q14_null_counts" ->
      """WITH src AS (
        |  SELECT CASE WHEN c_custkey % 5 = 0 THEN NULL ELSE c_name END AS c_name,
        |         CASE WHEN c_custkey % 11 = 0 THEN NULL ELSE c_acctbal END AS c_acctbal
        |  FROM customer),
        |long AS (
        |  SELECT 'c_name' AS col_name,
        |         CAST(COUNT(*) FILTER (c_name IS NULL) AS BIGINT) AS n_na FROM src
        |  UNION ALL
        |  SELECT 'c_acctbal',
        |         CAST(COUNT(*) FILTER (c_acctbal IS NULL) AS BIGINT) FROM src)
        |SELECT col_name, n_na FROM long WHERE n_na > 0 ORDER BY col_name""".stripMargin,

"q26_union_by_name" ->
      """SELECT o_orderkey, o_totalprice, CAST(NULL AS VARCHAR) AS o_orderstatus
        |FROM orders WHERE o_orderkey % 2 = 0
        |UNION ALL
        |SELECT o_orderkey, CAST(NULL AS DOUBLE), o_orderstatus
        |FROM orders WHERE o_orderkey % 2 = 1
        |ORDER BY o_orderkey""".stripMargin,

"q27_item_schedules" ->
      """SELECT item, array_to_string(list_sort(list(DISTINCT schedule)), ',') AS schedules FROM (
        |  SELECT 'lineitem' AS schedule, item FROM (
        |    UNPIVOT (SELECT l_orderkey, l_quantity, l_extendedprice, l_discount, l_tax
        |             FROM lineitem LIMIT 1)
        |    ON COLUMNS(* EXCLUDE (l_orderkey)) INTO NAME item VALUE value)
        |  UNION ALL
        |  SELECT 'orders', item FROM (
        |    UNPIVOT (SELECT o_orderkey, o_totalprice FROM orders LIMIT 1)
        |    ON COLUMNS(* EXCLUDE (o_orderkey)) INTO NAME item VALUE value))
        |GROUP BY item ORDER BY item""".stripMargin,

"q28_xbrl_extract" ->
      """SELECT CAST(o_orderkey AS INTEGER) AS idrssd,
        |  '1998-12-31' AS report_date, 'rc' AS schedule, 'RCFD2170' AS item,
        |  'USD' AS unit_ref, '0' AS decimals,
        |  CAST(o_custkey AS VARCHAR) AS value, 3 AS n_attrs
        |FROM orders ORDER BY idrssd""".stripMargin,

"q29_tz_convert" ->
      """SELECT event_id,
        |  CAST(floor(epoch(CAST(strftime(ts, '%Y-%m-%dT%H:%M:%S') AS TIMESTAMP))) AS BIGINT)
        |    + 5 * 3600 AS utc_epoch
        |FROM events ORDER BY event_id""".stripMargin)
}
