package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class CcStoreSpec extends SparkSpec {
  import spark.implicits._

  private def comps(path: String): Map[Long, Long] =
    CcStore.components(spark, path).as[(Long, Long)].collect.toMap

  test("write → append → components equals batch CC over the union") {
    val tmp = java.nio.file.Files.createTempDirectory("ccs1").toString
    val b1 = Seq((1L, 2L), (3L, 4L), (10L, 11L)).toDF("id_a", "id_b")
    val b2 = Seq((2L, 3L), (20L, 21L)).toDF("id_a", "id_b")
    CcStore.write(b1, tmp)
    assert(comps(tmp) == Map(1L -> 1L, 2L -> 1L, 3L -> 3L, 4L -> 3L,
      10L -> 10L, 11L -> 10L))
    CcStore.append(b2, tmp) // merges {1,2} with {3,4}; adds {20,21}
    val got = comps(tmp)
    val want = Dedup.canonicalizeCc(b1.unionByName(b2))
      .as[(Long, Long)].collect.toMap
    assert(got == want)
    assert(got(4L) == 1L && got(20L) == 20L)
  }

  test("compactStore folds pending, preserves components, clears backlog") {
    val tmp = java.nio.file.Files.createTempDirectory("ccs2").toString
    CcStore.write(Seq((1L, 2L)).toDF("id_a", "id_b"), tmp)
    CcStore.append(Seq((2L, 3L)).toDF("id_a", "id_b"), tmp)
    val before = comps(tmp)
    val manifest = CcStore.compactStore(spark, tmp)
      .as[(String, Long)].collect.toMap
    assert(comps(tmp) == before && before == Map(1L -> 1L, 2L -> 1L, 3L -> 1L))
    assert(manifest("pending") == 0L && manifest("forest") == 3L)
    // post-compact appends still merge through the folded forest
    CcStore.append(Seq((3L, 0L)).toDF("id_a", "id_b"), tmp)
    assert(comps(tmp) == Map(0L -> 0L, 1L -> 0L, 2L -> 0L, 3L -> 0L))
  }

  test("deep-chain append: fold never replays edge history") {
    val tmp = java.nio.file.Files.createTempDirectory("ccs3").toString
    // two interleaved chains of depth 50, merged by one late bridge
    val even = (2L to 100L by 2).map(k => (k, k - 2)).toDF("id_a", "id_b")
    val odd = (3L to 99L by 2).map(k => (k, k - 2)).toDF("id_a", "id_b")
    CcStore.write(even, tmp)
    CcStore.append(odd, tmp)
    CcStore.compactStore(spark, tmp)
    CcStore.append(Seq((0L, 1L)).toDF("id_a", "id_b"), tmp)
    val got = comps(tmp)
    assert(got.size == 101 && got.values.forall(_ == 0L))
  }

  test("ingestStream: batches accumulate, duplicates harmless, in-stream compaction") {
    implicit val sqlCtx = spark.sqlContext
    val tmp = java.nio.file.Files.createTempDirectory("ccs4").toString
    CcStore.write(Seq.empty[(Long, Long)].toDF("id_a", "id_b"), tmp)
    val input = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[(Long, Long)]
    val q = CcStore.ingestStream(input.toDF().toDF("id_a", "id_b"), tmp,
      java.nio.file.Files.createTempDirectory("ccs4ck").toString,
      compactEvery = 2)
    try {
      input.addData((1L, 2L), (3L, 4L)); q.processAllAvailable()
      assert(comps(tmp) == Map(1L -> 1L, 2L -> 1L, 3L -> 3L, 4L -> 3L))
      // duplicate edge + a merge; batch 1 leaves pending un-compacted
      input.addData((1L, 2L), (2L, 3L)); q.processAllAvailable()
      assert(comps(tmp) == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L))
      // batch 2 triggers compaction: pending folded, components stable
      input.addData((10L, 11L)); q.processAllAvailable()
      assert(comps(tmp) == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L,
        10L -> 10L, 11L -> 10L))
      assert(!new java.io.File(s"$tmp/pending").exists())
    } finally q.stop()
  }
}
