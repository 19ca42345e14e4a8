package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.Text

/** Distributed byte-pair-encoding tokenizer training — the vocab-
  * building half of a training-data pipeline (Sennrich et al. 2016,
  * "Neural Machine Translation of Rare Words with Subword Units").
  *
  * Scale shape: the corpus is touched EXACTLY ONCE (the word-frequency
  * aggregate — one keys-only shuffle, map-side combined); every merge
  * round after that operates on the VOCAB-scale word table (~10⁵-10⁶
  * rows regardless of corpus size), so `numMerges` rounds cost
  * numMerges × (one tiny aggregate + one narrow map) — the same
  * driver-looped posture as Lloyd refinement (Knn.kmeansCentroids) and
  * canonicalizeCc.
  *
  * Representation: a word's symbol sequence is a SINGLE STRING of
  * US(0x1f)-PREFIXED symbols ("␟c␟a␟t"), and applying merge (a,b) is
  * `replace(symstr, "␟a␟b", "␟ab")` — plain codegen'd string ops, and
  * exactly BPE's greedy leftmost non-overlapping semantics: the match
  * consumes b's leading separator, so an overlapping second occurrence
  * ("␟a␟a␟a" with merge (a,a)) cannot re-use a consumed symbol, while
  * a disjoint one ("␟a␟a␟a␟a") still matches on resume. The prefix
  * separator also makes token boundaries unambiguous (a pattern can
  * only match a symbol START, and the trailing ␟/end-of-string pins
  * the symbol END), so no false sub-symbol matches. The same replay
  * runs verbatim in any SQL engine — the q85 oracle unrolls it.
  * Assumption: input words never contain US(0x1f) (a C0 control char;
  * scraped corpora should have stripped those in cleaning).
  */
object Bpe {

  private val SEP = "\u001f"

  /** (word, freq) over whitespace-normalized lowercase tokens — the one
    * corpus-scale pass. */
  def wordCounts(df: DataFrame, textCol: String): DataFrame =
    df.select(explode(Text.tokens(Text.normalizeText(col(textCol)))).as("word"))
      .groupBy("word").agg(count(lit(1)).as("freq"))

  /** Initial symbol string: the word's characters, each SEP-prefixed. */
  private def initialSymstr(word: Column): Column =
    concat(lit(SEP),
      array_join(transform(sequence(lit(1), length(word)),
        j => word.substr(j, lit(1))), SEP))

  /** Adjacent symbol pairs of a symstr, as (a, b) structs. */
  private def adjacentPairs(symstr: Column): Column = {
    val t = split(substr(symstr, lit(2), length(symstr)), SEP)
    when(size(t) >= 2,
      transform(sequence(lit(1), size(t) - 1),
        i => struct(element_at(t, i).as("a"), element_at(t, i + 1).as("b"))))
      .otherwise(array().cast("array<struct<a:string,b:string>>"))
  }

  /** Learn `numMerges` merges. Returns (step, left, right, merged,
    * freq) in merge order; stops early when no pair reaches `minFreq`.
    * Ties break deterministically on (freq DESC, left ASC, right ASC).
    * `checkpointEvery` rounds the symbol table's lineage is cut
    * (lazy localCheckpoint — same rationale as canonicalizeCc). */
  def train(df: DataFrame, textCol: String, numMerges: Int,
            minFreq: Long = 2L,
            checkpointEvery: Int = 8): Seq[(Int, String, String, String, Long)] = {
    val lvl = org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK
    val base = wordCounts(df, textCol)
      .select(initialSymstr(col("word")).as("symstr"), col("freq"))
      .persist(lvl)
    base.count()
    var words = base
    val out = scala.collection.mutable.ArrayBuffer.empty[(Int, String, String, String, Long)]
    var step = 1
    var done = false
    while (!done && step <= numMerges) {
      val best = words
        .select(col("freq"), explode(adjacentPairs(col("symstr"))).as("p"))
        .groupBy(col("p.a").as("a"), col("p.b").as("b"))
        .agg(sum("freq").as("f"))
        .orderBy(desc("f"), asc("a"), asc("b"))
        .limit(1).collect()
      if (best.isEmpty || best(0).getLong(2) < minFreq) done = true
      else {
        val (a, b, f) = (best(0).getString(0), best(0).getString(1), best(0).getLong(2))
        out += ((step, a, b, a + b, f))
        val next = words.select(
          replace(col("symstr"), lit(SEP + a + SEP + b), lit(SEP + a + b)).as("symstr"),
          col("freq"))
        words =
          if (step % checkpointEvery == 0) { val c = next.localCheckpoint(false); c }
          else next
        step += 1
      }
    }
    base.unpersist(false)
    out.toSeq
  }

  /** Persist learned merges (train-once / tokenize-many — the
    * codebooks-beside-the-index posture for the tokenizer artifact).
    * Step order IS the merge priority order. */
  def writeMerges(spark: org.apache.spark.sql.SparkSession,
                  merges: Seq[(Int, String, String, String, Long)],
                  path: String): Unit = {
    import spark.implicits._
    merges.toDF("step", "lhs", "rhs", "merged", "freq")
      .write.mode("overwrite").parquet(path)
  }

  /** Reload merges in priority order for [[encodeColumn]]. */
  def loadMerges(spark: org.apache.spark.sql.SparkSession,
                 path: String): Seq[(String, String)] =
    spark.read.parquet(path).orderBy("step")
      .select("lhs", "rhs").collect()
      .map(r => (r.getString(0), r.getString(1))).toSeq

  /** Tokenize a text column with learned merges: per word, start from
    * characters and apply each merge in priority order (statically
    * unrolled replaces — fine for the spec-scale merge lists used
    * inline; ship a vocab-trie kernel for production 30k-merge
    * tokenizers). Output: array of subword tokens. */
  def encodeColumn(textCol: Column, merges: Seq[(String, String)]): Column = {
    val perWord = (w: Column) => {
      val merged = merges.foldLeft(initialSymstr(w)) { case (c, (a, b)) =>
        replace(c, lit(SEP + a + SEP + b), lit(SEP + a + b))
      }
      split(substr(merged, lit(2), length(merged)), SEP)
    }
    flatten(transform(Text.tokens(Text.normalizeText(textCol)), perWord))
  }
}
