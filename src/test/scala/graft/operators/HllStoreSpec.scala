package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class HllStoreSpec extends SparkSpec {

  test("sharded estimates equal the single-pass sketch; compaction preserves them") {
    val s = spark
    import s.implicits._
    val rows = (1L to 3000L).map(i => (i, s"k${i % 3}", s"val${i % 1100}"))
      .toDF("id", "key", "v")
    val tmp = java.nio.file.Files.createTempDirectory("hll_spec").toString

    // three independently-written shards, each carrying every key so
    // register rows genuinely collide across shards
    HllStore.write(rows.where(col("id") <= 1000), "key", "v", tmp, p = 8)
    HllStore.append(rows.where(col("id") > 1000 && col("id") <= 2000), "key", "v", tmp)
    HllStore.append(rows.where(col("id") > 2000), "key", "v", tmp)

    def estMap(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getString(0), (r.getLong(1), r.getLong(2)))).toMap
    val sharded = estMap(HllStore.estimate(s, tmp))
    val single = estMap(TextAnalytics.hllEstimate(
      TextAnalytics.hllRegisters(rows, "key", "v", 8), 8))
    assert(sharded == single, s"sharded=$sharded single=$single")

    // backlog rows exceed the merged register count before compaction
    val before = s.read.parquet(s"$tmp/registers").count()
    val compacted = HllStore.compactStore(s, tmp)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(compacted("registers") < before,
      s"compaction must shrink the backlog: $before -> $compacted")
    // estimates unchanged after the rewrite
    assert(estMap(HllStore.estimate(s, tmp)) == single)

    // duplicate re-ingestion is harmless (max-merge idempotence)
    HllStore.append(rows.where(col("id") <= 1000), "key", "v", tmp)
    assert(estMap(HllStore.estimate(s, tmp)) == single)
  }
}

class CmsStoreSpec extends SparkSpec {

  test("shard-summed estimates equal the single-pass sketch, never undercount") {
    val s = spark
    import s.implicits._
    val docs = (1L to 600L).map(i => (i, s"tok${i % 50} common tok${i % 7}"))
      .toDF("id", "text")
    val tmp = java.nio.file.Files.createTempDirectory("cms_spec").toString
    CmsStore.write(docs.where(col("id") <= 200), "text", tmp, d = 4, width = 256)
    CmsStore.append(docs.where(col("id") > 200 && col("id") <= 400), "text", tmp)
    CmsStore.append(docs.where(col("id") > 400), "text", tmp)
    val terms = Seq("common", "tok1", "tok49", "nope_absent")
    def ests(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val sharded = ests(CmsStore.estimate(s, tmp, terms))
    val single = ests(TextAnalytics.cmsEstimate(
      TextAnalytics.countMinSketch(docs, "text", 4, 256), terms, 4, 256))
    assert(sharded == single, s"sharded=$sharded single=$single")
    // one-sided: estimates never undercount the true frequencies
    assert(sharded("common") >= 600L)
    assert(sharded("tok1") >= 12L)   // 600/50
    // compaction shrinks the backlog, estimates unchanged
    val before = s.read.parquet(s"$tmp/cells").count()
    val after = CmsStore.compactStore(s, tmp)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(after("cells") < before)
    assert(ests(CmsStore.estimate(s, tmp, terms)) == single)
  }
}
