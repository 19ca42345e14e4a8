package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class EmbeddingStoreSpec extends SparkSpec {

  private def tmpDir(prefix: String): String =
    java.nio.file.Files.createTempDirectory(prefix).toString

  test("ingest drops semantic dups vs history and within batch, extends the store") {
    val s = spark
    import s.implicits._
    val store = Seq(
      (1L, Array(1.0f, 0f, 0f, 0f)),
      (2L, Array(0f, 1.0f, 0f, 0f)),
      (3L, Array(0f, 0f, 1.0f, 0f))
    ).toDF("vec_id", "embedding")
    val batch = Seq(
      (11L, Array(0.999f, 0.02f, 0f, 0f)),  // semantic dup of store 1
      (12L, Array(0f, 0f, 0f, 1.0f)),       // novel
      (13L, Array(0f, 0f, 0.02f, 0.999f)),  // dup of 12 WITHIN the batch
      (14L, Array(0.7f, 0.7f, 0f, 0f))      // novel (cos 0.7 to both 1,2)
    ).toDF("vec_id", "embedding")
    val path = tmpDir("emb_store")
    // c=2 cells, nprobe=2 → every cell probed: full recall in-spec
    EmbeddingStore.write(store, "vec_id", "embedding", path, c = 2)
    val survivors = EmbeddingStore.ingest(batch, "vec_id", "embedding",
      path, tau = 0.95, nprobe = 2)
    val ids = survivors.select("vec_id").collect().map(_.getLong(0)).toSet
    assert(ids == Set(12L, 14L), s"survivors=$ids")
    survivors.unpersist(false)
    // survivors' vectors are history now: a copy of 12 gets flagged
    val again = EmbeddingStore.probe(spark, path,
      Seq((21L, Array(0.01f, 0f, 0f, 0.999f))).toDF("vec_id", "embedding"),
      "vec_id", "embedding", tau = 0.95, nprobe = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(again == Set((21L, 12L)), s"hits=$again")
  }

  test("ingestStream semantic-dedups landed shards against all earlier ones") {
    import org.apache.spark.sql.types._
    val s = spark
    import s.implicits._
    val path = tmpDir("emb_stream_store")
    EmbeddingStore.write(
      Seq((1L, Array(1.0f, 0f, 0f, 0f))).toDF("vec_id", "embedding"),
      "vec_id", "embedding", path, c = 1)
    val land = tmpDir("emb_land")
    val out = tmpDir("emb_out")
    val ckpt = tmpDir("emb_ckpt")
    // land shard 1 as parquet: 31 novel
    Seq((31L, Array(0f, 1.0f, 0f, 0f))).toDF("vec_id", "embedding")
      .write.mode("append").parquet(land)
    val schema = StructType(Seq(StructField("vec_id", LongType),
      StructField("embedding", ArrayType(FloatType))))
    val q = EmbeddingStore.ingestStream(
      spark.readStream.schema(schema).parquet(land),
      "vec_id", "embedding", path, out, ckpt, tau = 0.95, nprobe = 1)
    try {
      q.processAllAvailable()
      assert(spark.read.parquet(out).select("vec_id")
        .collect().map(_.getLong(0)).toSet == Set(31L))
      // shard 2: 41 dups shard-1's 31 (cross-batch), 42 novel
      Seq((41L, Array(0f, 0.999f, 0.02f, 0f)),
          (42L, Array(0f, 0f, 1.0f, 0f)))
        .toDF("vec_id", "embedding")
        .write.mode("append").parquet(land)
      q.processAllAvailable()
      assert(spark.read.parquet(out).select("vec_id")
        .collect().map(_.getLong(0)).toSet == Set(31L, 42L))
    } finally q.stop()
  }
}
