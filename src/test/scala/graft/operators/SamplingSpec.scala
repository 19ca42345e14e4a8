package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class SamplingSpec extends SparkSpec {

  test("robustScale emits exact median/MAD micro-units") {
    val s = spark
    import s.implicits._
    val df = Seq((1L, 1L), (2L, 2L), (3L, 3L), (4L, 10L)).toDF("id", "v")
    // median 2.5 → 2_500_000 micro; |v·1e6−med| = {1.5e6, .5e6, .5e6, 7.5e6},
    // MAD = (.5e6+1.5e6)/2 = 1_000_000 micro
    val got = Sampling.robustScale(df, "id", "v")
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(got == Map(1L -> -1500000L, 2L -> -500000L,
      3L -> 500000L, 4L -> 7500000L), got.toString)
    // constant column: MAD 0 → guard divisor 1, all rows scale to 0
    val const = Seq((1L, 7L), (2L, 7L), (3L, 7L)).toDF("id", "v")
    assert(Sampling.robustScale(const, "id", "v")
      .collect().forall(_.getLong(2) == 0L))
  }

  test("sampleWeighted: exactly k, deterministic, weight-dominant, positive-mass only") {
    val s = spark
    import s.implicits._
    val rows = (1L to 200L).map(i => (i, if (i == 42L) 1e12 else 1.0)) ++
      Seq((201L, 0.0), (202L, -5.0))
    val df = rows.toDF("id", "w")
    val a = Sampling.sampleWeighted(df, "id", "w", k = 20, seed = 3L)
      .collect().map(_.getLong(0)).toSeq
    // exactly k, rerun identical (no RNG), overwhelming weight always in
    assert(a.length == 20)
    val b = Sampling.sampleWeighted(df, "id", "w", k = 20, seed = 3L)
      .collect().map(_.getLong(0)).toSeq
    assert(a == b, "seeded draw must be reproducible")
    assert(a.contains(42L), "a weight 1e12 item must always be drawn")
    // zero/negative weights never drawn even with k > candidates
    val all = Sampling.sampleWeighted(df, "id", "w", k = 500, seed = 3L)
      .collect().map(_.getLong(0)).toSet
    assert(!all.contains(201L) && !all.contains(202L))
    assert(all.size == 200)
    // different seeds give different draws (not a fixed head)
    val c = Sampling.sampleWeighted(df, "id", "w", k = 20, seed = 4L)
      .collect().map(_.getLong(0)).toSeq
    assert(a != c, "distinct seeds should permute the draw")
  }

  test("sampleWeightedPerKey: k per key, same priority math as the global draw") {
    val s = spark
    import s.implicits._
    val df = ((1L to 50L).map(i => (i, "a", 1.0)) ++
      (51L to 60L).map(i => (i, "b", 1.0)) ++
      Seq((99L, "b", 1e12))).toDF("id", "src", "w")
    val got = Sampling.sampleWeightedPerKey(df, "src", "id", "w", k = 5, seed = 9L)
      .collect().map(r => (r.getString(1), r.getLong(0))).groupBy(_._1)
    assert(got("a").length == 5 && got("b").length == 5)
    assert(got("b").map(_._2).contains(99L), "heavy item wins inside its key")
    // per-key cut agrees with the global priority order restricted to the key
    val globalB = Sampling.sampleWeighted(
      df.where(col("src") === "b"), "id", "w", k = 5, seed = 9L)
      .collect().map(_.getLong(0)).toSet
    assert(got("b").map(_._2).toSet == globalB,
      "per-key draw must equal the global draw restricted to that key")
  }

  test("samplePerKey draws exactly k deterministic rows per key") {
    val s = spark
    import s.implicits._
    val df = (1L to 200L).map(i => (s"k${i % 4}", i)).toDF("grp", "id")
    val got = Sampling.samplePerKey(df, "grp", "id", k = 5)
      .collect().map(r => (r.getString(0), r.getLong(1)))
    assert(got.groupBy(_._1).forall(_._2.length == 5))
    assert(got.map(_._1).toSet == Set("k0", "k1", "k2", "k3"))
    // deterministic across runs
    val again = Sampling.samplePerKey(df, "grp", "id", k = 5)
      .collect().map(r => (r.getString(0), r.getLong(1)))
    assert(got.toSet == again.toSet)
    // membership matches the window formulation on the same hash
    import org.apache.spark.sql.expressions.Window
    val want = df.withColumn("h",
        org.apache.spark.sql.functions.xxhash64(col("id")).cast("double"))
      .withColumn("rn", org.apache.spark.sql.functions.row_number().over(
        Window.partitionBy("grp").orderBy(col("h").asc, col("id").asc)))
      .where(col("rn") <= 5).select("grp", "id")
      .collect().map(r => (r.getString(0), r.getLong(1))).toSet
    assert(got.toSet == want)
    // keys with fewer than k rows keep all their rows
    val small = Seq(("a", 1L), ("a", 2L), ("b", 3L)).toDF("grp", "id")
    assert(Sampling.samplePerKey(small, "grp", "id", k = 5).count() == 3)
  }

  test("stratifiedHead caps each stratum deterministically") {
    val s = spark
    import s.implicits._
    val df = (1 to 20).map(i => (i.toLong, if (i % 2 == 0) "a" else "b"))
      .toDF("id", "src")
    val out = Sampling.stratifiedHead(df, "src", "id", 3)
    assert(out.count() == 6)
    val aIds = out.where(col("src") === "a").orderBy("id")
      .collect().map(_.getLong(0)).toSeq
    assert(aIds == Seq(2, 4, 6))
  }

  test("saltedAgg equals the direct aggregation") {
    val s = spark
    import s.implicits._
    val rnd = new scala.util.Random(7)
    // hot key: 90% of rows share one key
    val df = (1 to 1000).map { i =>
      (if (i <= 900) "hot" else s"k${i % 7}", rnd.nextDouble() * 100)
    }.toDF("k", "v")
    val salted = Sampling.saltedAgg(df, "k", "v").orderBy("k").collect()
    val direct = df.groupBy("k")
      .agg(count(lit(1)).as("n"),
        sum(col("v").cast(org.apache.spark.sql.types.DecimalType(28, 4)))
          .cast("double").as("sum_value"))
      .orderBy("k").collect()
    assert(salted.length == direct.length)
    salted.zip(direct).foreach { case (a, b) =>
      assert(a.getString(0) == b.getString(0))
      assert(a.getLong(1) == b.getLong(1))
      assert(a.getDouble(2) == b.getDouble(2)) // decimal path → exact
    }
  }

  test("hot-key soak: row-identity salt balances a 90%-hot key; AQE splits the skewed join") {
    val s = spark
    import s.implicits._
    // 200k-row events-like table, 90% of rows on one key
    val df = spark.range(200000).select(
      when(col("id") % 10 =!= 0, lit(1L)).otherwise(col("id")).as("k"),
      (col("id") % 100).cast("double").as("v"))
    // per-salt partial row counts for the hot key must be balanced —
    // the salt source is row identity, so a constant key (or constant
    // values) cannot collapse onto one reducer
    val salted = df.withColumn("__salt",
      pmod(monotonically_increasing_id(), lit(16L)))
    val counts = salted.where(col("k") === 1L)
      .groupBy("__salt").count().collect().map(_.getLong(1))
    assert(counts.length == 16, s"hot key landed on ${counts.length}/16 salts")
    assert(counts.max < 2 * counts.min,
      s"unbalanced salt partials: min=${counts.min} max=${counts.max}")
    // and the exactness contract holds on the skewed table
    val agg = Sampling.saltedAgg(df, "k", "v").where(col("k") === 1L).collect()(0)
    assert(agg.getLong(1) == 180000L)

    // AQE skew-join: the same hot key as a join side gets split at
    // runtime (GraftSession enables adaptive + skewJoin; thresholds
    // lowered here to engage at test scale)
    val resets = Seq(
      "spark.sql.adaptive.enabled" -> spark.conf.getOption("spark.sql.adaptive.enabled"),
      "spark.sql.adaptive.skewJoin.enabled" -> spark.conf.getOption("spark.sql.adaptive.skewJoin.enabled"),
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> spark.conf.getOption("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes"),
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> spark.conf.getOption("spark.sql.adaptive.advisoryPartitionSizeInBytes"),
      "spark.sql.adaptive.coalescePartitions.enabled" -> spark.conf.getOption("spark.sql.adaptive.coalescePartitions.enabled"),
      "spark.sql.autoBroadcastJoinThreshold" -> spark.conf.getOption("spark.sql.autoBroadcastJoinThreshold"))
    try {
      spark.conf.set("spark.sql.adaptive.enabled", "true")
      spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
      spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "262144")
      spark.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "262144")
      spark.conf.set("spark.sql.adaptive.coalescePartitions.enabled", "false")
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val fact = df.withColumn("payload", concat_ws("", Seq.fill(8)(col("v").cast("string")): _*))
      val dim = (0L until 20000L by 10).map(i => (if (i % 10 != 0) i else i, s"d$i"))
        .toDF("k", "name").union(Seq((1L, "hot")).toDF("k", "name"))
      val joined = fact.join(dim, "k")
      // execute THIS dataset's query execution (count() would build a
      // separate one and leave this plan unfinalized)
      assert(joined.collect().length == 182000)
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("skew"), s"AQE skew handling did not engage:\n$plan")
    } finally resets.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  test("packChunks two-phase prefix sum matches the single-window form") {
    val s = spark
    import s.implicits._
    val rnd = new scala.util.Random(11)
    // sparse, shuffled ids; a few zero-token docs
    val rows = rnd.shuffle((1 to 3000).map(i =>
      (i.toLong * 7 + (i % 13), if (i % 41 == 0) 0L else rnd.nextInt(900).toLong + 1)))
    val df = rows.toDF("doc_id", "n_tokens")
    val got = Sampling.packChunks(df, "doc_id", "n_tokens", seqLen = 256, parts = 7)
      .orderBy("id").collect()
    val expect = rows.sortBy(_._1).foldLeft((0L, Vector.empty[(Long, Long, Long)])) {
      case ((off, acc), (id, n)) => (off + n, acc :+ ((id, n, off)))
    }._2
    assert(got.length == expect.length)
    got.zip(expect).foreach { case (r, (id, n, off)) =>
      assert(r.getLong(0) == id && r.getLong(1) == n && r.getLong(2) == off,
        s"row mismatch: got $r want ($id,$n,$off)")
      if (n > 0) {
        assert(r.getLong(3) == off / 256)
        assert(r.getLong(4) == (off + n - 1) / 256)
      } else assert(r.isNullAt(3) && r.isNullAt(4))
    }
    // the corpus-side running sum must be partitioned — the only
    // unpartitioned window allowed is the one over the per-bucket
    // AGGREGATE (metadata-scale: one row per bucket)
    import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
    import org.apache.spark.sql.execution.aggregate.BaseAggregateExec
    import org.apache.spark.sql.execution.window.WindowExec
    val plan = Sampling.packChunks(df, "doc_id", "n_tokens", 256, parts = 7)
      .queryExecution.executedPlan
    val all = plan.collect { case w: WindowExec => w } ++
      plan.collect { case a: AdaptiveSparkPlanExec => a }.flatMap(
        _.inputPlan.collect { case w: WindowExec => w })
    assert(all.nonEmpty, "expected window nodes in the packChunks plan")
    val badGlobal = all.filter(_.partitionSpec.isEmpty).filter(w =>
      w.child.collectFirst { case ag: BaseAggregateExec => ag }.isEmpty)
    assert(badGlobal.isEmpty,
      s"unpartitioned window over a non-aggregated frame:\n$plan")
    // empty input degrades to an empty frame with the full schema
    val empty = Sampling.packChunks(df.where(lit(false)), "doc_id", "n_tokens", 256)
    assert(empty.columns.toSeq ==
      Seq("id", "n_tokens", "offset", "start_chunk", "end_chunk"))
    assert(empty.count() == 0)
  }

  test("packSlices tiles every chunk to exactly seqLen and covers every doc") {
    val s = spark
    import s.implicits._
    val rnd = new scala.util.Random(23)
    val rows = (1 to 800).map(i =>
      (i.toLong, if (i % 37 == 0) 0L else rnd.nextInt(700).toLong + 1))
    val df = rows.toDF("doc_id", "n_tokens")
    val slices = Sampling.packSlices(df, "doc_id", "n_tokens", seqLen = 256, parts = 5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    val total = rows.map(_._2).sum
    val lastChunk = (total - 1) / 256
    // every chunk except the ragged last holds exactly seqLen tokens
    slices.groupBy(_._1).foreach { case (chunk, ss) =>
      val n = ss.map(_._4).sum
      if (chunk < lastChunk) assert(n == 256, s"chunk $chunk holds $n tokens")
      else assert(n == total - lastChunk * 256)
    }
    // every non-empty doc is fully covered by contiguous slices
    val byDoc = slices.groupBy(_._2)
    rows.filter(_._2 > 0).foreach { case (id, n) =>
      val ss = byDoc(id).sortBy(_._1)
      assert(ss.map(_._4).sum == n, s"doc $id covered ${ss.map(_._4).sum}/$n")
      assert(ss.head._3 == 0L)
      ss.sliding(2).foreach {
        case Array(a, b) => assert(a._3 + a._4 == b._3, s"gap in doc $id slices")
        case _ =>
      }
    }
    assert(!byDoc.contains(37L * 1)) // zero-token docs emit no slices
  }

  test("packSequences emits exact seqLen token rows reconstructing the stream") {
    val s = spark
    import s.implicits._
    val rnd = new scala.util.Random(31)
    val words = Array("aa", "bb", "cc", "dd", "ee")
    val rows = (1 to 120).map { i =>
      (i.toLong,
        (0 until (if (i % 29 == 0) 0 else rnd.nextInt(40) + 1))
          .map(_ => words(rnd.nextInt(5)) + i).mkString(" "))
    }
    val out = Sampling.packSequences(rows.toDF("doc_id", "text"),
      "doc_id", "text", seqLen = 64, parts = 4)
      .orderBy("chunk_id").collect()
      .map(r => r.getLong(0) -> r.getSeq[String](1))
    val stream = rows.sortBy(_._1).flatMap(_._2.split("\\s+").filter(_.nonEmpty))
    val expect = stream.grouped(64).toSeq
    assert(out.length == expect.length)
    out.zip(expect).zipWithIndex.foreach { case (((cid, toks), want), i) =>
      assert(cid == i.toLong, s"chunk ids must be dense: $cid at $i")
      assert(toks == want, s"chunk $i tokens diverge")
    }
  }

  test("quantilesApprox tracks exact quantiles within the rank-error bound") {
    val df = spark.read.parquet("/root/testdata/sf0.01/lineitem.parquet")
      .select(col("l_extendedprice").as("v"))
    val qs = Seq(0.1, 0.25, 0.5, 0.75, 0.9, 0.99)
    val exact = Sampling.quantiles(df, "v", qs)
      .collect()(0).getSeq[Double](0)
    val accuracy = 1000
    val approx = Sampling.quantilesApprox(df, "v", qs, accuracy)
      .collect()(0).getSeq[Double](0)
    // rank error ≤ n/accuracy → value bound = exact quantile at q ± eps
    val n = df.count()
    val eps = n.toDouble / accuracy / n // as quantile fraction: 1/accuracy
    val lohi = Sampling.quantiles(df, "v",
      qs.flatMap(q => Seq(math.max(0, q - 2 * eps), math.min(1, q + 2 * eps))))
      .collect()(0).getSeq[Double](0)
    qs.indices.foreach { i =>
      val (lo, hi) = (lohi(2 * i), lohi(2 * i + 1))
      assert(approx(i) >= lo && approx(i) <= hi,
        s"q=${qs(i)}: approx ${approx(i)} outside rank-window [$lo, $hi] (exact ${exact(i)})")
    }
  }

  test("shuffleWrite streams a seeded permutation in file-name order") {
    val s = spark
    import s.implicits._
    val docs = (1L to 400L).toDF("id")
    val path = java.nio.file.Files.createTempDirectory("graft_shuf").toString
    Sampling.shuffleWrite(docs, "id", seed = 7L, numFiles = 4, path = path)
    val back = spark.read.parquet(path)
      .withColumn("f", input_file_name())
      .withColumn("k", Sampling.shuffleKey(col("id"), 7L))
      .collect().map(r => (r.getString(1), r.getString(2), r.getLong(0)))
    // nothing lost or duplicated
    assert(back.map(_._3).sorted.toSeq == (1L to 400L))
    // reading files in name order yields the global hash order: keys
    // within a file are sorted, and files partition disjoint key ranges
    val byFile = back.groupBy(_._1).toSeq.sortBy(_._1).map(_._2.map(_._2))
    byFile.foreach(ks => assert(ks.toSeq == ks.sorted.toSeq, "file not sorted"))
    byFile.sliding(2).foreach {
      case Seq(a, b) => assert(a.max <= b.min, "file ranges overlap")
      case _ =>
    }
    assert(byFile.size == 4)
    // a different seed is a different permutation
    val k1 = docs.select(Sampling.shuffleKey(col("id"), 1L)).collect().map(_.getString(0))
    val k2 = docs.select(Sampling.shuffleKey(col("id"), 2L)).collect().map(_.getString(0))
    assert(k1.zip(k2).exists { case (a, b) => a != b })
  }

  test("splitLeakageFree keeps near-dup components on one side") {
    val s = spark
    import s.implicits._
    val docs = (1L to 1000L).toDF("doc_id")
    // components: {1,2,3} and {10,500}; everything else singleton
    val labels = Seq((1L, 1L), (2L, 1L), (3L, 1L), (10L, 10L), (500L, 10L))
      .toDF("id", "rep")
    val out = Sampling.splitLeakageFree(docs, "doc_id", labels,
      Seq(("train", 80), ("val", 10), ("test", 10)))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(out(1L) == out(2L) && out(2L) == out(3L), "component 1 split apart")
    assert(out(10L) == out(500L), "component 10 split apart")
    assert(out.values.toSet.subsetOf(Set("train", "val", "test")))
    // rough mass check: the 80/10/10 hash ranges hold within noise
    val train = out.values.count(_ == "train")
    assert(train > 700 && train < 900, s"train=$train")
  }

  test("upsampleMixture: integer weights repeat exactly, fractions by rate") {
    val s = spark
    import s.implicits._
    val docs = (1L to 1000L).map(i =>
      (i, if (i <= 200) "triple" else if (i <= 400) "drop"
          else if (i <= 700) "frac" else "keep")).toDF("doc_id", "source")
    val out = Sampling.upsampleMixture(docs, "doc_id", "source",
      Map("triple" -> 3.0, "drop" -> 0.0, "frac" -> 1.5))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    val bySrc = out.groupBy(_._2).view.mapValues(_.length).toMap
    assert(bySrc("triple") == 600, bySrc.toString)   // 200 docs × 3 copies
    assert(!bySrc.contains("drop"))
    assert(bySrc("keep") == 300)                     // default weight 1.0
    val frac = bySrc("frac")
    assert(frac > 380 && frac < 520, s"1.5× of 300 docs gave $frac")
    // copies are 0-based and dense per doc
    val copies = out.filter(_._2 == "triple").groupBy(_._1).values
    assert(copies.forall(_.map(_._3).sorted.toSeq == Seq(0L, 1L, 2L)))
    // w <= 1 degenerates to weightedMixture's keep set
    val up = Sampling.upsampleMixture(docs, "doc_id", "source",
      Map("triple" -> 0.4), defaultWeight = 0.0)
      .collect().map(_.getLong(0)).toSet
    val wm = Sampling.weightedMixture(docs, "doc_id", "source",
      Map("triple" -> 0.4), defaultWeight = 0.0)
      .collect().map(_.getLong(0)).toSet
    assert(up == wm)
  }

  test("sampleTokenBudget: exclusive-cumsum cut, bucketing-invariant") {
    val s = spark
    import s.implicits._
    val docs = (1L to 300L).map(i =>
      (i, if (i % 2 == 0) "a" else "b", 10L)).toDF("doc_id", "source", "n_tok")
    val out = Sampling.sampleTokenBudget(docs, "doc_id", "source", "n_tok",
      Map("a" -> 105L, "b" -> 0L), defaultBudget = Long.MaxValue)
      .collect().map(r => (r.getAs[Long]("doc_id"), r.getAs[String]("source")))
    // budget 105, 10-token docs: exclusive cumsum < 105 keeps 11 docs
    // (the 11th starts at 100 < 105 — the one-doc overshoot rule)
    assert(out.count(_._2 == "a") == 11, out.count(_._2 == "a").toString)
    assert(!out.exists(_._2 == "b"))
    // the kept set is the hash-order prefix: same result at any bucketing
    def run(b: Int) = Sampling.sampleTokenBudget(docs, "doc_id", "source",
      "n_tok", Map("a" -> 105L), defaultBudget = 37L, buckets = b)
      .collect().map(_.getAs[Long]("doc_id")).toSet
    assert(run(1) == run(7) && run(7) == run(64))
    // budget bigger than the source keeps everything
    val all = Sampling.sampleTokenBudget(docs, "doc_id", "source", "n_tok",
      Map.empty, defaultBudget = Long.MaxValue).count()
    assert(all == 300L)
  }

  test("sampleTokenBudgetBest: budget buys the best-score prefix, bucketing-invariant") {
    val s = spark
    import s.implicits._
    // scores descend with id, so the best-prefix is ids 1..11 for "a"
    val docs = (1L to 300L).map(i =>
      (i, if (i % 2 == 0) "b" else "a", 10L, 1000.0 - i)).toDF("doc_id", "source", "n_tok", "score")
    val out = Sampling.sampleTokenBudgetBest(docs, "doc_id", "source",
      "n_tok", "score", Map("a" -> 105L, "b" -> 0L),
      defaultBudget = Long.MaxValue)
      .collect().map(r => (r.getAs[Long]("doc_id"), r.getAs[String]("source")))
    val aKept = out.filter(_._2 == "a").map(_._1).toSet
    // 11 best "a" docs = the 11 smallest odd ids (highest scores)
    assert(aKept == (1L to 21L by 2).toSet, aKept.toString)
    assert(!out.exists(_._2 == "b"))
    // the cut is the SCORE-ORDER prefix at any bucketing (GK boundary
    // placement must not leak into the result)
    def run(b: Int) = Sampling.sampleTokenBudgetBest(docs, "doc_id", "source",
      "n_tok", "score", Map("a" -> 105L), defaultBudget = 37L, buckets = b)
      .collect().map(_.getAs[Long]("doc_id")).toSet
    assert(run(1) == run(7) && run(7) == run(64))
    // single-window ground truth: same kept set
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("source").orderBy(col("score").desc, col("doc_id").asc)
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)
    val truth = docs
      .withColumn("cum", coalesce(sum("n_tok").over(w), lit(0L)))
      .where(col("cum") < when(col("source") === "a", 105L).otherwise(37L))
      .collect().map(_.getAs[Long]("doc_id")).toSet
    val got = Sampling.sampleTokenBudgetBest(docs, "doc_id", "source",
      "n_tok", "score", Map("a" -> 105L), defaultBudget = 37L)
      .collect().map(_.getAs[Long]("doc_id")).toSet
    assert(got == truth)
    // ties on score: id ASC breaks them — and NULL scores sort last
    val tied = (1L to 10L).map(i =>
      (i, "t", 10L, if (i <= 2) null.asInstanceOf[java.lang.Double]
                    else java.lang.Double.valueOf(5.0)))
      .toDF("doc_id", "source", "n_tok", "score")
    val keptTied = Sampling.sampleTokenBudgetBest(tied, "doc_id", "source",
      "n_tok", "score", Map("t" -> 45L))
      .collect().map(_.getAs[Long]("doc_id")).toSet
    // 45 tokens buy 5 docs: the four scored (3..6 by id) before any null
    assert(keptTied == Set(3L, 4L, 5L, 6L, 7L), keptTied.toString)
  }

  test("topKPerKey equals the window formulation, score desc id asc") {
    val s = spark
    import s.implicits._
    val rows = (1L to 200L).map(i => (i, s"k${i % 7}", (i * 37 % 50).toDouble))
      .toDF("id", "key", "score")
    val got = Sampling.topKPerKey(rows, "key", "id", "score", k = 3)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2), r.getLong(3)))
      .toSet
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("key").orderBy(col("score").desc, col("id").asc)
    val want = rows.withColumn("rank", row_number().over(w).cast("long"))
      .where(col("rank") <= 3)
      .collect().map(r => (r.getString(1), r.getLong(0), r.getDouble(2), r.getLong(3)))
      .toSet
    assert(got == want)
  }

  test("curriculumStages bands by value quantiles, monotone in score") {
    val s = spark
    import s.implicits._
    val rows = (1L to 100L).map(i => (i, i.toDouble)).toDF("id", "score")
    val got = Sampling.curriculumStages(rows, "score", stages = 4, exact = true)
      .collect().map(r => r.getLong(0) -> r.getInt(2)).toMap
    // quartile boundaries of 1..100 (linear interp): 25.75, 50.5, 75.25
    assert(got(1L) == 0 && got(25L) == 0)
    assert(got(26L) == 1 && got(50L) == 1)
    assert(got(51L) == 2 && got(75L) == 2)
    assert(got(76L) == 3 && got(100L) == 3)
    // approx mode: same banding up to boundary-rank tolerance; monotone
    val approx = Sampling.curriculumStages(rows, "score", stages = 4)
      .collect().map(r => r.getLong(0) -> r.getInt(2)).toMap
    assert((1L to 99L).forall(i => approx(i) <= approx(i + 1)))
    assert(approx.values.toSet == Set(0, 1, 2, 3))
  }

  test("writeClustered produces range-clustered files with bounded rows") {
    val s = spark
    import s.implicits._
    val tmp = java.nio.file.Files.createTempDirectory("clustered").toFile
    val df = (1 to 10000).map(i => (i.toLong, s"row$i")).toDF("id", "payload")
    Sampling.writeClustered(df, s"$tmp/t.parquet", "id",
      numFiles = 4, maxRecordsPerFile = 3000)
    val back = spark.read.parquet(s"$tmp/t.parquet")
    assert(back.count() == 10000)
    // range clustering: each file's id span must not overlap others'
    val spans = back.groupBy(input_file_name().as("f"))
      .agg(min("id").as("lo"), max("id").as("hi"))
      .collect().map(r => (r.getLong(1), r.getLong(2))).sortBy(_._1)
    spans.sliding(2).foreach {
      case Array((_, hi1), (lo2, _)) => assert(hi1 < lo2)
      case _ =>
    }
  }

  test("temperatureWeights: alpha endpoints, small-source upweighting, budget spend") {
    val s = spark
    import s.implicits._
    // 3 sources: 800 / 150 / 50 docs
    val docs = ((1L to 800L).map(i => (i, "web")) ++
      (801L to 950L).map(i => (i, "books")) ++
      (951L to 1000L).map(i => (i, "code"))).toDF("doc_id", "source")
    def weights(alpha: Double) =
      Sampling.temperatureWeights(docs, "source", budgetDocs = 300L, alpha = alpha)
        .collect().map(r => r.getString(0) ->
          (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    // alpha=0: uniform weights regardless of size
    val w0 = weights(0.0)
    assert(w0.values.map(_._2).toSet.size == 1, w0.toString)
    // alpha=1: proportional (web weight = 800/1000)
    val w1 = weights(1.0)
    assert(w1("web")._2 == 800000L, w1.toString)
    // alpha=0.5 sits between: small source gets MORE than proportional,
    // big source LESS; ordering of weights still follows size
    val wh = weights(0.5)
    assert(wh("code")._2 > w1("code")._2 && wh("web")._2 < w1("web")._2)
    assert(wh("web")._2 > wh("books")._2 && wh("books")._2 > wh("code")._2)
    // rates: never above 1e6; expected spend sum(n*rate) recovers the
    // budget within rounding when nothing capped
    assert(wh.values.forall(_._3 <= 1000000L))
    val spend = wh.values.map { case (n, _, r) => n * r / 1000000.0 }.sum
    assert(math.abs(spend - 300.0) < 1.0, spend.toString)
    // a budget big enough to exhaust a small source: its rate caps at
    // 1e6 and the capped mass is the (documented) undershoot
    val capped = Sampling.temperatureWeights(docs, "source", budgetDocs = 900L)
      .collect().map(r => r.getString(0) -> r.getLong(3)).toMap
    assert(capped("code") == 1000000L, capped.toString)
    // plumbing into weightedMixture: rate_micro drives a deterministic draw
    val rates = wh.map { case (src, (_, _, r)) => src -> r / 1000000.0 }
    val kept = Sampling.weightedMixture(docs, "doc_id", "source", rates).count()
    assert(kept > 200 && kept < 400, kept.toString)
  }

  test("rankNormalize: bucketing-invariant exact ranks, ties by id, nulls first") {
    val s = spark
    import s.implicits._
    val rnd = new scala.util.Random(11)
    // heavy ties: scores drawn from just 7 values, plus some nulls
    val rows = (1L to 300L).map { i =>
      (i, if (i % 29 == 0) None else Some((rnd.nextInt(7) * 10).toDouble))
    }
    val df = rows.toDF("id", "score")
    def run(b: Int) = Sampling.rankNormalize(df, "id", "score", buckets = b)
      .collect().map(r => (r.getLong(0), r.getDouble(1), r.getLong(2), r.getLong(3)))
      .sortBy(_._1).toList
    val one = run(1)   // single bucket == plain global window
    assert(run(7) == one && run(64) == one, "bucketing must not change ranks")
    // ranks are a permutation of 1..n
    assert(one.map(_._3).sorted == (1L to 300L).toList)
    // nulls (as -inf) take the lowest ranks, ordered by id
    val nullIds = rows.filter(_._2.isEmpty).map(_._1)
    val nullRanks = one.filter(r => nullIds.contains(r._1)).sortBy(_._1).map(_._3)
    assert(nullRanks == (1L to nullIds.length).toList, nullRanks.toString)
    // ties ordered by id within equal scores
    val byScore = one.filterNot(r => nullIds.contains(r._1)).groupBy(_._2)
    byScore.values.foreach { grp =>
      assert(grp.sortBy(_._1).map(_._3) == grp.map(_._3).sorted,
        "tie ranks must follow id order")
    }
    // pct_micro endpoints: rank 1 -> 0, rank n -> exactly 1e6
    assert(one.find(_._3 == 1L).get._4 == 0L)
    assert(one.find(_._3 == 300L).get._4 == 1000000L)
  }

  test("rankNormalize splits a 90%-tie hot value across sub-buckets, ranks exact") {
    val s = spark
    import s.implicits._
    // 900 of 1000 rows share one score: percentile boundaries cannot
    // split them; the composite (score, id) second level must
    val df = (1L to 1000L).map { i =>
      (i, if (i <= 900) 5.0 else i.toDouble / 100.0 + 100.0)
    }.toDF("id", "score")
    val got = Sampling.rankNormalize(df, "id", "score", buckets = 8)
      .collect().map(r => (r.getLong(0), r.getLong(2))).sortBy(_._1)
    // exact ranks: the tie block ordered by id, then the tail by score
    got.take(900).zipWithIndex.foreach { case ((id, rank), i) =>
      assert(id == i + 1L && rank == i + 1L, s"id=$id rank=$rank")
    }
    assert(got.drop(900).map(_._2).toList == (901L to 1000L).toList)
    // and the plan really partitions the data window by the sub-bucket
    val plan = Sampling.rankNormalize(df, "id", "score", buckets = 8)
      .queryExecution.executedPlan.toString
    assert(plan.contains("__sb"), plan)
  }

  test("blendRanks: weighted percentile mean, single-signal identity") {
    val s = spark
    import s.implicits._
    val df = (1L to 100L).map(i => (i, (i * 7 % 100).toDouble, (100 - i).toDouble))
      .toDF("id", "sa", "sb")
    val got = Sampling.blendRanks(df, "id", Seq("sa" -> 0.75, "sb" -> 0.25), 8)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    // blend is exactly the floored weighted mean of the two pcts
    got.foreach { case (_, pa, pb, bl) =>
      assert(bl == math.floor((pa * 0.75 + pb * 0.25) / 1.0).toLong)
    }
    // sb is a strictly decreasing function of id: its pct must invert id order
    val pbById = got.sortBy(_._1).map(_._3)
    assert(pbById.zip(pbById.tail).forall { case (x, y) => x > y })
    // single signal: blend == its own pct
    val solo = Sampling.blendRanks(df, "id", Seq("sa" -> 2.0), 8)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    solo.foreach { case (_, pct, bl) => assert(bl == pct) }
  }

  test("splitStratified: exact per-stratum counts, bucket-invariant, disjoint") {
    val s = spark
    import s.implicits._
    val df = ((1L to 1000L).map(i => (i, "web")) ++
      (1001L to 1137L).map(i => (i, "books")) ++
      (1138L to 1144L).map(i => (i, "code"))).toDF("id", "src")
    val fr = Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1)
    def run(b: Int) = Sampling.splitStratified(df, "id", "src", fr, buckets = b)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2)))
    val got = run(0)
    // exhaustive and disjoint
    assert(got.length == 1144 && got.map(_._1).distinct.length == 1144)
    // EXACT floor counts per stratum
    val counts = got.groupBy(x => (x._2, x._3)).view.mapValues(_.length).toMap
    def cuts(n: Long) = {
      val c1 = math.floor(0.8 * n).toLong
      val c2 = math.floor((0.8 + 0.1) * n).toLong
      (c1, c2 - c1, n - c2)
    }
    for ((srcName, n) <- Seq(("web", 1000L), ("books", 137L), ("code", 7L))) {
      val (tr, va, te) = cuts(n)
      assert(counts.getOrElse((srcName, "train"), 0) == tr, s"$srcName train")
      assert(counts.getOrElse((srcName, "val"), 0) == va, s"$srcName val")
      assert(counts.getOrElse((srcName, "test"), 0) == te, s"$srcName test")
    }
    // bucket count never changes the assignment (uniform-hash ranges)
    assert(run(1).sortBy(_._1).toList == got.sortBy(_._1).toList)
    assert(run(64).sortBy(_._1).toList == got.sortBy(_._1).toList)
    // deterministic across invocations
    assert(run(0).sortBy(_._1).toList == got.sortBy(_._1).toList)
  }

  test("rrfFuse: exact descending ranks, integer rrf terms, null scores worst") {
    import spark.implicits._
    val df = Seq(
      (1L, Some(30.0), Some(5.0)),
      (2L, Some(20.0), Some(9.0)),
      (3L, Some(30.0), Some(1.0)),  // ties 1 on s1 -> id breaks: 1 then 3
      (4L, None, Some(7.0)))        // null s1 ranks last on s1
      .toDF("id", "s1", "s2")
    val got = Sampling.rrfFuse(df, "id", Seq("s1", "s2"), k = 10)
      .as[(Long, Long, Long, Long)].collect.map(r => r._1 -> r).toMap
    // s1 desc, id asc: 1(30),3(30),2(20),4(null) -> ranks 1,2,3,4
    // s2 desc: 2(9),4(7),1(5),3(1) -> ranks 1,2,3,4
    assert(got(1L) == (1L, 1L, 3L, 1000000L / 11 + 1000000L / 13))
    assert(got(3L) == (3L, 2L, 4L, 1000000L / 12 + 1000000L / 14))
    assert(got(2L) == (2L, 3L, 1L, 1000000L / 13 + 1000000L / 11))
    assert(got(4L) == (4L, 4L, 2L, 1000000L / 14 + 1000000L / 12))
  }

  test("quantileNormalizeByKey maps each key onto the pooled order statistics") {
    import spark.implicits._
    // key a: 10,20,30,40 (n_k=4); key b: 100,200 (n_k=2); N=6
    // global sorted: 10,20,30,40,100,200
    // a ranks 1..4 -> targets ceil(r*6/4) = 2,3,5,6 -> 20,30,100,200
    // b ranks 1..2 -> targets ceil(r*6/2) = 3,6 -> 30,200
    val df = Seq(("a", 1L, 10L), ("a", 2L, 20L), ("a", 3L, 30L), ("a", 4L, 40L),
      ("b", 5L, 100L), ("b", 6L, 200L)).toDF("k", "id", "v")
    val got = Sampling.quantileNormalizeByKey(df, "k", "v", "id")
      .select("id", "x_norm").as[(Long, Long)].collect.toMap
    assert(got == Map(1L -> 20L, 2L -> 30L, 3L -> 100L, 4L -> 200L,
      5L -> 30L, 6L -> 200L))
  }

  test("quantileNormalizeByKey: a single key normalizes to itself; ties stay deterministic") {
    import spark.implicits._
    val df = Seq(("k", 1L, 5L), ("k", 2L, 5L), ("k", 3L, 9L)).toDF("k", "id", "v")
    val got = Sampling.quantileNormalizeByKey(df, "k", "v", "id")
      .select("id", "x_norm").as[(Long, Long)].collect.toMap
    // r*N/n_k = r: identity mapping onto its own sorted values
    assert(got == Map(1L -> 5L, 2L -> 5L, 3L -> 9L))
  }

  test("neymanAllocation: largest-remainder apportionment sums to the " +
    "budget, zero-variance strata get zero weight") {
    val s2 = spark
    import s2.implicits._
    // A: {0,0,10,10} σ→6, w=24; B: {5,5,5} σ=0, w=0; C: {0,20} σ→14,
    // w=28. W=52, budget 10: base A=4 (rem 32), C=5 (rem 20), B=0 →
    // 1 leftover goes to A (largest remainder).
    val df = Seq(("A", 0L), ("A", 0L), ("A", 10L), ("A", 10L),
      ("B", 5L), ("B", 5L), ("B", 5L), ("C", 0L), ("C", 20L))
      .toDF("st", "v")
    val got = Sampling.neymanAllocation(df, "st", "v", budget = 10L)
      .as[(String, Long, Long, Long)].collect
      .map(r => r._1 -> r).toMap
    assert(got("A") == (("A", 4L, 6L, 5L)), got("A"))
    assert(got("B") == (("B", 3L, 0L, 0L)), got("B"))
    assert(got("C") == (("C", 2L, 14L, 5L)), got("C"))
    assert(got.values.map(_._4).sum == 10L)
  }

  test("unimaxAllocation: hand-computed waterfill — caps are a sorted " +
    "prefix, residual splits equally, crumbs deterministic") {
    val s2 = spark
    import s2.implicits._
    val df = Seq(("a", 10L), ("b", 100L), ("c", 50L)).toDF("g", "n")
    def alloc(budget: Long) =
      Sampling.unimaxAllocation(df, "g", "n", budget, maxEpochs = 2L)
        .as[(String, Long, Long, Boolean, Long)].collect
        .map(r => r._1 -> ((r._4, r._5))).toMap
    // caps 20/200/100; B=150: a capped at 20, c and b split 130
    assert(alloc(150L) == Map("a" -> ((true, 20L)),
      "c" -> ((false, 65L)), "b" -> ((false, 65L))))
    // budget above total capacity: everyone capped
    assert(alloc(1000L) == Map("a" -> ((true, 20L)),
      "c" -> ((true, 100L)), "b" -> ((true, 200L))))
    // odd residual: the crumb goes to the smaller-capacity uncapped
    assert(alloc(151L) == Map("a" -> ((true, 20L)),
      "c" -> ((false, 66L)), "b" -> ((false, 65L))))
  }

  test("doremiStep: hand-computed multiplicative update, smoothing, " +
    "and ppm normalization") {
    val s2 = spark
    import s2.implicits._
    // η = 1: domain a keeps exp(0) = 1, domain b gets exp(ln 2) ≈ 2
    val d = Seq(("a", 500000L, 0L), ("b", 500000L, 693147L))
      .toDF("domain", "weight_ppm", "loss_micro")
    val flat = Sampling.doremiStep(d, "domain", "weight_ppm",
      "loss_micro", etaMicro = 1000000L, smoothPpm = 0L)
      .as[(String, Long, Long, Long)].collect
      .map(r => r._1 -> ((r._3, r._4))).toMap
    // raw: a = 500000, b = round(500000·e^0.693147) = 1000000
    // alpha: a = (5e11 div 1.5e6) = 333333; b = 666666
    assert(flat == Map("a" -> ((500000L, 333333L)),
      "b" -> ((1000000L, 666666L))), flat)
    val smooth = Sampling.doremiStep(d, "domain", "weight_ppm",
      "loss_micro", etaMicro = 1000000L, smoothPpm = 200000L)
      .as[(String, Long, Long, Long)].collect
      .map(r => r._1 -> r._4).toMap
    // a: (800000·333333) div 1e6 + 200000 div 2 = 266666 + 100000
    assert(smooth == Map("a" -> 366666L, "b" -> 633332L), smooth)
  }

  test("quantileNormalize: rank-for-rank map onto the reference, " +
    "reference maps to itself, empty reference raises") {
    val s = spark
    import s.implicits._
    val df = Seq(
      (1L, "x", 5L), (2L, "x", 1L), (3L, "x", 9L), (4L, "x", 3L),
      (10L, "r", 10L), (11L, "r", 20L)).toDF("id", "g", "v")
    val got = Sampling.quantileNormalize(df, "id", "g", "v", "r")
      .as[(Long, String, Long, Long)].collect()
      .map(r => r._1 -> r._4).toMap
    // group x ranks (by v, id): 2→1, 4→2, 1→3, 3→4 of n=4 onto n_ref=2:
    // pos = ceil(rk·2/4) → ranks 1,2 → ref pos 1 (10); ranks 3,4 → 20
    assert(got == Map(2L -> 10L, 4L -> 10L, 1L -> 20L, 3L -> 20L,
      10L -> 10L, 11L -> 20L), got)
    // the reference group is the identity map
    val e = intercept[IllegalArgumentException] {
      Sampling.quantileNormalize(df, "id", "g", "v", "missing")
    }
    assert(e.getMessage.contains("reference group"), e.getMessage)
  }
}
