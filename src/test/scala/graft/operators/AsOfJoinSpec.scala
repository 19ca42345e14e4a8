package graft.operators

import java.sql.{Date, Timestamp}

import graft.SparkSpec
import org.apache.spark.sql.functions._

class AsOfJoinSpec extends SparkSpec {

  test("asOf picks the latest right row at or before the left time") {
    val s = spark
    import s.implicits._
    val trades = Seq(
      (1L, "AAPL", Timestamp.valueOf("2024-01-01 10:00:05")),
      (2L, "AAPL", Timestamp.valueOf("2024-01-01 10:00:00")),
      (3L, "MSFT", Timestamp.valueOf("2024-01-01 09:00:00"))
    ).toDF("trade_id", "sym", "t")
    val quotes = Seq(
      ("AAPL", Timestamp.valueOf("2024-01-01 09:59:59"), 1L, 100.0),
      ("AAPL", Timestamp.valueOf("2024-01-01 10:00:03"), 2L, 101.0),
      ("AAPL", Timestamp.valueOf("2024-01-01 10:00:07"), 3L, 102.0),
      ("MSFT", Timestamp.valueOf("2024-01-01 10:00:00"), 4L, 50.0)
    ).toDF("qsym", "qt", "qid", "px")
    val out = AsOfJoin.asOf(trades, "sym", "t", "trade_id",
      quotes, "qsym", "qt", "qid")
      .orderBy("trade_id").collect()
    assert(out(0).getAs[Double]("px") == 101.0) // 10:00:05 → quote@10:00:03
    assert(out(1).getAs[Double]("px") == 100.0) // 10:00:00 → quote@09:59:59
    assert(out(2).isNullAt(out(2).fieldIndex("px"))) // MSFT: no prior quote
  }

  test("asOf binds the dedup window to the RIGHT side when both sides share 'ts'") {
    // regression for the advisor finding: an unqualified col(rightTime)
    // in the window spec was ambiguous (or bound left) when both sides
    // carry the same column name — the common as-of case
    val s = spark
    import s.implicits._
    val events = Seq(
      (1L, 100L, Timestamp.valueOf("2024-01-01 10:00:10"))
    ).toDF("event_id", "key", "ts")
    val snapshots = Seq(
      (100L, Timestamp.valueOf("2024-01-01 10:00:01"), 10L, "older"),
      (100L, Timestamp.valueOf("2024-01-01 10:00:05"), 11L, "newest"),
      (100L, Timestamp.valueOf("2024-01-01 10:00:55"), 12L, "future")
    ).toDF("skey", "ts", "sid", "tag")
    val out = AsOfJoin.asOf(events, "key", "ts", "event_id",
      snapshots, "skey", "ts", "sid").collect()
    assert(out.length == 1)
    assert(out(0).getAs[String]("tag") == "newest")
  }

  test("rangeJoin matches effective-dated metadata, open-ended NULL end") {
    val s = spark
    import s.implicits._
    val facts = Seq(
      (1L, "RCFD0010", Date.valueOf("2020-06-30")),
      (2L, "RCFD0010", Date.valueOf("2024-03-31")),
      (3L, "RCFD9999", Date.valueOf("2024-03-31"))
    ).toDF("fact_id", "item", "date")
    val defs = Seq(
      ("RCFD0010", Date.valueOf("2001-01-01"), Some(Date.valueOf("2021-01-01")), "old defn"),
      ("RCFD0010", Date.valueOf("2021-01-01"), None, "new defn")
    ).toDF("ditem", "start_date", "end_date", "description")
    val out = AsOfJoin.rangeJoin(facts, "item", "date",
      defs, "ditem", "start_date", "end_date")
      .orderBy("fact_id").collect()
    assert(out(0).getAs[String]("description") == "old defn")
    assert(out(1).getAs[String]("description") == "new defn")
    assert(out(2).isNullAt(out(2).fieldIndex("description")))
  }
}

class ExtensionsSpec extends SparkSpec {
  test("SQL functions registered on a live session run the native kernels") {
    graft.GraftExtensions.register(spark)
    val r = spark.sql(
      """SELECT cosine_sim(array(1.0D, 0.0D), array(1.0D, 0.0D)) AS c,
        |       word_shingles('a b c d', 3) AS sh,
        |       minhash_sig(word_shingles('a b c d', 3), 8) AS sig,
        |       simhash64(array('a', 'b')) AS sh64,
        |       md5_minhash_sig(word_shingles('a b c d', 3), 4) AS msig,
        |       md5_simhash(array('a', 'b')) AS msh
        |""".stripMargin).collect()(0)
    assert(r.getDouble(0) == 1.0)
    assert(r.getSeq[String](1) == Seq("a b c", "b c d"))
    assert(r.getSeq[Long](2).size == 8)
    assert(r.getSeq[Long](4).size == 4 && r.getSeq[Long](4).forall(_ >= 0L))
    assert(r.getString(5).length == 16)
  }

}
