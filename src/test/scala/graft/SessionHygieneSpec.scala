package graft

import org.apache.spark.sql.functions._

/** Round-5 regression guard for the session-lifetime block leak
  * (round-4 verdict #4): iterative/lifecycle operators must not leave
  * persisted or localCheckpoint blocks behind once their results are
  * consumed and the query-boundary release runs. A long-lived 100 TB
  * session IS this profile — residue here is monotonic slowdown there.
  */
class SessionHygieneSpec extends SparkSpec {

  private def persistedCount(): Int =
    spark.sparkContext.getPersistentRDDs.size

  private def releaseAll(): Unit = graft.plans.Blocks.releaseAll(spark)

  test("iterative operators leave no blocks after a query-boundary release") {
    import spark.implicits._
    releaseAll()
    val base = persistedCount()

    // canonicalizeCc: deep chain forces several rounds of checkpoints
    val pairs = (1L until 400L).map(i => (i, i + 1)).toDF("id_a", "id_b")
    val reps = graft.operators.Dedup.canonicalizeCc(pairs)
    assert(reps.agg(countDistinct("rep")).as[Long].head() === 1L)

    // pagerank (fixed rounds — eager per-round checkpoints)
    val edges = (0L until 300L).map(i => (i, (i * 7) % 97)).toDF("src", "dst")
    val pr = graft.operators.Graph.pagerankInt(edges, "src", "dst", iters = 4)
    assert(pr.count() > 0)

    // BPE training (checkpointEvery mid-loop cuts)
    val docs = (0L until 50L).map(i => (i, s"aa bb aa cc dd ee ff aa bb $i"))
      .toDF("doc_id", "text")
    val merges = graft.operators.Bpe.train(docs, "text", numMerges = 12,
      checkpointEvery = 4)
    assert(merges.nonEmpty)

    // corpus dedup lifecycle (persist + cc + eager label checkpoint)
    val corpus = (0L until 60L)
      .map(i => (i, if (i % 3 == 0) "the quick brown fox jumps over the lazy dog again and again"
                    else s"unique text number $i with some extra words to shingle"))
      .toDF("doc_id", "text")
    assert(graft.operators.Dedup.dedupCorpus(corpus, "doc_id", "text").count() > 0)

    releaseAll()
    assert(persistedCount() <= base,
      s"blocks leaked: ${spark.sparkContext.getPersistentRDDs.keys.toSeq.sorted}")
  }

  test("mid-operator residue is bounded: canonicalizeCc retains only the live round") {
    import spark.implicits._
    releaseAll()
    // a chain of length 2^k converges in ~k+1 rounds; without the
    // per-round free this leaves one checkpointed RDD PER ROUND
    val pairs = (1L until 256L).map(i => (i, i + 1)).toDF("id_a", "id_b")
    val reps = graft.operators.Dedup.canonicalizeCc(pairs)
    assert(reps.count() === 256L)
    // after the result is consumed, only the final round's checkpoint
    // (backing the returned frame) may remain
    assert(persistedCount() <= 1,
      s"expected <=1 retained block set, got ${persistedCount()}")
    releaseAll()
    assert(persistedCount() === 0)
  }
}
