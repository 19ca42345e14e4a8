package graft

import org.apache.spark.sql.functions._

/** Randomized invariants (seeded, deterministic) — the contracts each
  * operator must hold for ANY data, not just the crafted specs.
  */
class PropertySpec extends SparkSpec {

  private val words = Vector(
    "alpha", "beta", "gamma", "delta", "epsilon", "zeta", "eta", "theta")

  test("saltedAgg equals direct aggregation across random distributions") {
    val s = spark
    import s.implicits._
    for (seed <- 1 to 5) {
      val rnd = new scala.util.Random(seed)
      val rows = (1 to 200).map { _ =>
        (Seq("a", "b", "hot")(rnd.nextInt(3)), rnd.nextDouble() * 2000 - 1000)
      }
      val df = rows.toDF("k", "v")
      val salted = operators.Sampling.saltedAgg(df, "k", "v")
        .orderBy("k").collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2)))
      val direct = df.groupBy("k")
        .agg(count(lit(1)).as("n"),
          sum(col("v").cast(org.apache.spark.sql.types.DecimalType(28, 4)))
            .cast("double").as("s"))
        .orderBy("k").collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2)))
      assert(salted.toSeq == direct.toSeq, s"seed=$seed")
    }
  }

  test("TopKAggregator equals global sort-take for random score sets") {
    val s = spark
    import s.implicits._
    for (seed <- 1 to 5) {
      val rnd = new scala.util.Random(100 + seed)
      val rows = (1 to 120).map { _ =>
        (rnd.nextInt(3).toLong, rnd.nextInt(500).toLong + 1, rnd.nextInt(1000) / 1000.0)
      }.distinctBy(t => (t._1, t._2))
      val df = rows.toDF("query_id", "neighbor_id", "sim")
      val got = operators.Knn.topKPerQuery(df, 5)
        .collect()
        .map(r => (r.getAs[Long]("query_id"), r.getAs[Int]("rank"),
          r.getAs[Long]("neighbor_id")))
        .sortBy(t => (t._1, t._2)).toSeq
      val want = rows.groupBy(_._1).toSeq.flatMap { case (q, rs) =>
        rs.map(t => (t._3, t._2)).sortBy(t => (-t._1, t._2)).take(5).zipWithIndex
          .map { case ((_, id), i) => (q, i + 1, id) }
      }.sortBy(t => (t._1, t._2))
      assert(got == want, s"seed=$seed")
    }
  }

  test("minhash signature overlap estimates true shingle jaccard") {
    val s = spark
    import s.implicits._
    for (seed <- 1 to 5) {
      val rnd = new scala.util.Random(200 + seed)
      def doc() = Seq.fill(5 + rnd.nextInt(35))(words(rnd.nextInt(words.size)))
        .mkString(" ")
      val df = Seq((1L, doc()), (2L, doc())).toDF("id", "text")
      val sh = df.select(col("id"),
        array_distinct(plans.native.wordShingles(col("text"), 2)).as("sh"))
      val shingles = sh.collect().map(r => r.getLong(0) -> r.getSeq[String](1).toSet).toMap
      val trueJ = shingles(1L).intersect(shingles(2L)).size.toDouble /
        shingles(1L).union(shingles(2L)).size
      val sigs = sh.select(col("id"), plans.native.minhashSig(col("sh"), 256).as("sig"))
        .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
      val est = sigs(1L).zip(sigs(2L)).count { case (x, y) => x == y } / 256.0
      assert(math.abs(est - trueJ) < 0.2, s"seed=$seed est=$est true=$trueJ")
    }
  }

  test("simhash64 codegen kernel equals the HOF reference formulation") {
    val s = spark
    import s.implicits._
    val rnd = new scala.util.Random(11L)
    val docs = (1 to 200).map { i =>
      (i.toLong, Seq.fill(1 + rnd.nextInt(30))(words(rnd.nextInt(words.size))))
    }.toDF("id", "toks")
    val both = docs.select(
      graft.functions.Hashes.simhash64(col("toks")).as("kernel"),
      graft.functions.Hashes.simhash64Hof(col("toks")).as("hof"))
    assert(both.where(col("kernel") =!= col("hof")).count() == 0)
    // empty token array: all votes lose → 0 in both formulations
    val empty = Seq((1L, Seq.empty[String])).toDF("id", "toks").select(
      graft.functions.Hashes.simhash64(col("toks")).as("k"),
      graft.functions.Hashes.simhash64Hof(col("toks")).as("h")).collect()(0)
    assert(empty.getLong(0) == 0L && empty.getLong(1) == 0L)
  }

  test("NearestCells bounded-heap kernel equals the struct-sort " +
    "formulation for random vectors and every nprobe (round 11)") {
    val s = spark
    import s.implicits._
    for (seed <- 1 to 3) {
      val rnd = new scala.util.Random(300 + seed)
      val dim = 8
      val c = 13
      val cellIds = Array.tabulate(c)(i => (i * 37 + seed).toLong)
      // include DUPLICATE centroids so sim ties exercise the cell DESC
      // tie-break on both paths
      val base = Array.fill(c)(Array.fill(dim)(rnd.nextGaussian()))
      base(5) = base(2).clone()
      base(9) = base(2).clone()
      val vecs = (0L until 60L)
        .map(i => (i, Array.fill(dim)(rnd.nextGaussian().toFloat)))
        .toDF("id", "vec")
      for (np <- Seq(1, 2, 4, 13, 20)) {
        val kernel = vecs.select(col("id"),
            graft.plans.native.nearestCells(col("vec"), cellIds, base, np)
              .as("cs"))
          .collect().map(r => r.getLong(0) -> r.getSeq[Long](1).toSeq).toMap
        val scs = cellIds.zip(base).map { case (cell, cent) =>
          struct(functions.Vectors.cosine(col("vec"),
            typedLit(cent.toSeq)).as("sim"), lit(cell).as("cell"))
        }
        val ref = vecs.select(col("id"),
            slice(reverse(array_sort(array(scs.toSeq: _*))), 1, np).as("sc"))
          .collect().map(r => r.getLong(0) ->
            r.getSeq[org.apache.spark.sql.Row](1).map(_.getLong(1)).toSeq)
          .toMap
        assert(kernel == ref, s"seed=$seed nprobe=$np")
      }
    }
  }

  test("md5-portable minhash tracks the same overlap structure as the kernel path") {
    val s = spark
    import s.implicits._
    val rnd = new scala.util.Random(13L)
    val docs = (1 to 60).map { i =>
      val base = Seq.fill(12)(words(rnd.nextInt(words.size))).mkString(" ")
      (i.toLong, if (i % 3 == 0) base else base + " " + words(rnd.nextInt(words.size)))
    }.toDF("doc_id", "text")
    // both modes run the same banding algorithm; exact-dup docs (same
    // shingle set) must pair under BOTH hash families
    def pairs(portable: Boolean) =
      graft.operators.Dedup.minhashLshPairs(docs, "doc_id", "text",
        tau = 0.99, portableHash = portable)
        .select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val exactDups = pairs(portable = true)
    assert(exactDups == pairs(portable = false))
  }

  test("weightedMixture: exact at 0/1, near target in between, stable under growth") {
    val s = spark
    import s.implicits._
    val docs = (1L to 3000L).map(i => (i, s"src${i % 3}")).toDF("doc_id", "source")
    val kept = graft.operators.Sampling.weightedMixture(docs, "doc_id", "source",
      Map("src0" -> 0.0, "src1" -> 1.0, "src2" -> 0.5))
    val bySrc = kept.groupBy("source").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(!bySrc.contains("src0"))           // weight 0 drops everything
    assert(bySrc("src1") == 1000L)            // weight 1 keeps everything
    assert(bySrc("src2") > 350 && bySrc("src2") < 650) // ≈ half
    // growth stability: the kept-set over a prefix equals the prefix of
    // the kept-set (a doc's fate never changes as the corpus grows)
    val prefixKept = graft.operators.Sampling.weightedMixture(
      docs.where(col("doc_id") <= 1500), "doc_id", "source",
      Map("src0" -> 0.0, "src1" -> 1.0, "src2" -> 0.5))
      .collect().map(_.getLong(0)).toSet
    assert(prefixKept == kept.where(col("doc_id") <= 1500)
      .collect().map(_.getLong(0)).toSet)
  }

  test("zip repair ladder: row count survives random garbage cells") {
    import java.io.{File, FileOutputStream}
    import java.util.zip.{ZipEntry, ZipOutputStream}
    val cellPool = Vector("x", "", "CONF", "12.5", "has space", "0")
    for (seed <- 1 to 5) {
      val rnd = new scala.util.Random(300 + seed)
      val rowCells = (1 to 20).map(_ => Seq.fill(3)(cellPool(rnd.nextInt(cellPool.size))))
      val content = "IDRSSD\tA\tB\t\nID\ta\tb\t\n" +
        rowCells.zipWithIndex.map { case (cells, i) =>
          s"$i\t${cells.mkString("\t")}"
        }.mkString("\t\n") + "\t\n"
      val f = File.createTempFile("prop", ".zip")
      f.deleteOnExit()
      val zos = new ZipOutputStream(new FileOutputStream(f))
      zos.putNextEntry(new ZipEntry("m.txt"))
      zos.write(content.getBytes("UTF-8"))
      zos.closeEntry(); zos.close()
      val header = sources.ZipTsv.memberHeader(spark, f.getAbsolutePath, "m.txt")
      val spec = schema.FfiecSchema.colSpec(header)
      val n = sources.ZipTsv.readMember(spark, f.getAbsolutePath, "m.txt", spec).count()
      assert(n == rowCells.length, s"seed=$seed")
    }
  }
}
