package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class BpeSpec extends SparkSpec {

  test("train learns hand-checkable merges with greedy-leftmost rewrites") {
    val s = spark
    import s.implicits._
    // word counts: aaab×2, ab×1.
    // r1 pairs: (a,a)=4 (two per 'aaab'), (a,b)=3       → merge (a,a)
    //   'aaab' rewrites GREEDY LEFTMOST to [aa, a, b] — not [a, aa, b]
    // r2 pairs: (aa,a)=2, (a,b)=3                        → merge (a,b)
    // r3 pairs: (aa,ab)=2                                → merge (aa,ab)
    // r4: no pair reaches minFreq=2                      → stop early
    val docs = Seq((1L, "aaab aaab ab")).toDF("doc_id", "text")
    val merges = Bpe.train(docs, "text", numMerges = 5, minFreq = 2L)
    assert(merges == Seq(
      (1, "a", "a", "aa", 4L),
      (2, "a", "b", "ab", 3L),
      (3, "aa", "ab", "aaab", 2L)))
  }

  test("encodeColumn applies merges in priority order per word") {
    val s = spark
    import s.implicits._
    val merges = Seq(("a", "a"), ("a", "b"), ("aa", "ab"))
    val out = Seq((1L, "aaab ab aa aaa b"), (2L, "aab"))
      .toDF("doc_id", "text")
      .select(col("doc_id"), Bpe.encodeColumn(col("text"), merges).as("toks"))
      .orderBy("doc_id").collect().map(_.getSeq[String](1))
    // 'aaa' → greedy [aa, a]; 'aab' → [aa, b] (the (a,b) merge can't
    // claim the middle 'a' — it was consumed by (a,a))
    assert(out(0) == Seq("aaab", "ab", "aa", "aa", "a", "b"))
    assert(out(1) == Seq("aa", "b"))
  }

  test("merges persist and reload in priority order") {
    val s = spark
    import s.implicits._
    val docs = Seq((1L, "aaab aaab ab")).toDF("doc_id", "text")
    val merges = Bpe.train(docs, "text", numMerges = 5, minFreq = 2L)
    val path = java.nio.file.Files.createTempDirectory("bpe_merges").toString
    Bpe.writeMerges(spark, merges, path)
    val back = Bpe.loadMerges(spark, path)
    assert(back == merges.map(m => (m._2, m._3)))
    // reloaded merges tokenize identically
    val a = docs.select(Bpe.encodeColumn(col("text"),
      merges.map(m => (m._2, m._3))).as("t")).collect()(0).getSeq[String](0)
    val b = docs.select(Bpe.encodeColumn(col("text"), back).as("t"))
      .collect()(0).getSeq[String](0)
    assert(a == b)
  }

  test("encodeColumnFast == encodeColumn on trained merges, word by word") {
    val s = spark
    import s.implicits._
    // a corpus rich enough to learn overlapping/cascading merges, plus
    // encode-time words the trainer never saw (novel words exercise the
    // partial-merge path) and greedy-overlap traps (aaa, aab)
    val train = Seq(
      (1L, "the cat sat on the mat the cat ran"),
      (2L, "that hat is the cats hat not thE CAT'S"),
      (3L, "aaab aaab ab aab aaa banana bandana")).toDF("doc_id", "text")
    val merges = Bpe.train(train, "text", numMerges = 12, minFreq = 1L)
      .map(m => (m._2, m._3))
    assert(merges.nonEmpty)
    val docs = train.union(Seq(
      (4L, "unseen catastrophe thematic aaaa aaaaa abab"),
      (5L, "  MiXeD   Case\tand\nwhitespace  "),
      (6L, "")).toDF("doc_id", "text"))
    val rows = docs.select(col("doc_id"),
        Bpe.encodeColumn(col("text"), merges).as("slow"),
        Bpe.encodeColumnFast(col("text"), merges).as("fast"))
      .collect()
    rows.foreach { r =>
      assert(r.getSeq[String](1) == r.getSeq[String](2),
        s"doc ${r.getLong(0)}: slow=${r.getSeq[String](1)} fast=${r.getSeq[String](2)}")
    }
    // and the kernel carries vocab sizes the unrolled form cannot:
    // 2k synthetic merges through one expression, still correct on a
    // word hitting none of them
    val big = (1 to 2000).map(i => (s"x$i", s"y$i"))
    val untouched = Seq((9L, "plain")).toDF("doc_id", "text")
      .select(Bpe.encodeColumnFast(col("text"), big).as("t"))
      .collect()(0).getSeq[String](0)
    assert(untouched == Seq("p", "l", "a", "i", "n"))
  }

  test("byte-level mode: GPT-2 remap table is a 256-symbol bijection, " +
    "multibyte chars decompose, train/encode/kernel agree (round 10)") {
    val s = spark
    import s.implicits._
    // the fixed bytes_to_unicode table: total on 0..255, injective,
    // printable identity ranges, canonical shifted anchors
    val tab = graft.plans.BpeKernel.byteToUnicode
    assert(tab.size == 256 && tab.values.toSet.size == 256)
    assert(tab(97) == "a" && tab(126) == "~" && tab(255) == "ÿ")
    assert(tab(32) == "Ġ" && tab(0) == "Ā" && tab(10) == "Ċ"
      && tab(173) == "Ń") // Ġ, Ā, Ċ, Ń — the GPT-2 anchors
    // 'é' is 2 UTF-8 bytes (C3 A9) → 2 symbols Ã© before any merge
    val plain = Seq((1L, "é")).toDF("doc_id", "text")
      .select(Bpe.encodeColumn(col("text"), Seq.empty, byteLevel = true))
      .collect()(0).getSeq[String](0)
    assert(plain == Seq(tab(0xc3), tab(0xa9)), plain.toString)
    // byte-level training rejoins the bytes of frequent multibyte
    // chars; ASCII merges behave exactly like the char-level trainer
    val docs = Seq(
      (1L, "café café café naïve naïve"),
      (2L, "the cat sat on the mat日本 the 日本 café 日本")).toDF("doc_id", "text")
    val merges = Bpe.train(docs, "text", numMerges = 10, minFreq = 2L,
      byteLevel = true).map(m => (m._2, m._3))
    assert(merges.nonEmpty)
    // parity: the unrolled Column form == the rank-map kernel, byte
    // mode, including unseen multibyte words and empty text
    val probe = docs.union(Seq(
      (3L, "unseen émigré 中文 mixed日本text"),
      (4L, "")).toDF("doc_id", "text"))
    val rows = probe.select(col("doc_id"),
        Bpe.encodeColumn(col("text"), merges, byteLevel = true).as("slow"),
        Bpe.encodeColumnFast(col("text"), merges, byteLevel = true).as("fast"))
      .collect()
    rows.foreach { r =>
      assert(r.getSeq[String](1) == r.getSeq[String](2),
        s"doc ${r.getLong(0)}: slow=${r.getSeq[String](1)} " +
          s"fast=${r.getSeq[String](2)}")
    }
    // no OOV path: every token's chars come from the 256-symbol
    // alphabet or merges of it, and inverse-remapping the
    // concatenated tokens rebuilds each word's exact UTF-8 bytes
    val inv = tab.map { case (b, c) => c.codePointAt(0) -> b }
    val words = Seq("café", "日本", "naïve", "the")
    val toks = words.map(w => (w, Seq((1L, w)).toDF("doc_id", "text")
      .select(Bpe.encodeColumnFast(col("text"), merges, byteLevel = true))
      .collect()(0).getSeq[String](0)))
    toks.foreach { case (w, ts) =>
      val bytes = ts.mkString.codePoints().toArray
        .map(cp => inv(cp).toByte)
      assert(new String(bytes, java.nio.charset.StandardCharsets.UTF_8) == w,
        s"$w did not round-trip from $ts")
    }
  }

  test("encodeHashedIds: one bounded id per subword, deterministic") {
    val s = spark
    import s.implicits._
    val docs = Seq((1L, "the cat sat"), (2L, "")).toDF("doc_id", "text")
    val merges = Seq(("t", "h"), ("th", "e"))
    val got = docs.select(col("doc_id"),
        Bpe.encodeColumnFast(col("text"), merges).as("toks"),
        Bpe.encodeHashedIds(col("text"), merges, 4096).as("ids"))
      .orderBy("doc_id").collect()
    val (toks, ids) = (got(0).getSeq[String](1), got(0).getSeq[Int](2))
    assert(ids.length == toks.length)
    assert(ids.forall(i => i >= 0 && i < 4096))
    // same subword → same id, wherever it appears
    val byTok = toks.zip(ids).groupBy(_._1).view.mapValues(_.map(_._2).toSet)
    assert(byTok.values.forall(_.size == 1), byTok.toMap.toString)
    assert(got(1).getSeq[Int](2).isEmpty) // empty text → empty ids
  }

  test("encode round-trips: concatenated subwords rebuild each word") {
    val s = spark
    import s.implicits._
    val docs = Seq((1L, "the quick brown fox jumps over the lazy dog the end"))
      .toDF("doc_id", "text")
    val merges = Bpe.train(docs, "text", numMerges = 6, minFreq = 1L)
      .map(m => (m._2, m._3))
    val rebuilt = docs.select(
      concat_ws(" ", transform(
        Bpe.encodeColumn(col("text"), merges), x => x)).as("flat"),
      concat_ws(" ", transform(
        Bpe.encodeColumn(col("text"), Nil), x => x)).as("chars"))
      .collect()(0)
    // with no merges every word is its characters; with merges the
    // concatenation (ignoring boundaries) is identical
    assert(rebuilt.getString(0).replace(" ", "") ==
      rebuilt.getString(1).replace(" ", ""))
  }

  test("vocabTable: contiguous ids, base chars sorted, append-only growth") {
    val s = spark
    import s.implicits._
    val docs = Seq((1L, "the cat sat on the mat the cat sat the cat"))
      .toDF("doc_id", "text")
    val m4 = Bpe.train(docs, "text", numMerges = 4, minFreq = 1L).map(m => (m._2, m._3))
    val v4 = Bpe.vocabTable(docs, "text", m4).orderBy("id")
      .collect().map(r => (r.getString(0), r.getLong(1)))
    // ids are exactly 0..n-1
    assert(v4.map(_._2).toSeq == (0L until v4.length).toSeq, v4.mkString(","))
    // base chars are the corpus characters, sorted
    val chars = "the cat sat on the mat".split("").filter(_ != " ").distinct.sorted
    assert(v4.take(chars.length).map(_._1).toSeq == chars.toSeq, v4.mkString(","))
    // merge outputs follow in rank order
    assert(v4.drop(chars.length).map(_._1).toSeq ==
      m4.map { case (a, b) => a + b }.distinct, v4.mkString(","))
    // retraining with MORE merges extends the tail without renumbering
    val m6 = Bpe.train(docs, "text", numMerges = 6, minFreq = 1L).map(m => (m._2, m._3))
    assert(m6.take(4) == m4, "greedy trainer must be prefix-stable")
    val v6 = Bpe.vocabTable(docs, "text", m6).orderBy("id")
      .collect().map(r => (r.getString(0), r.getLong(1)))
    assert(v6.take(v4.length).toSeq == v4.toSeq,
      "existing ids must survive vocab growth")
  }

  test("encodeIds maps through the vocab table; unseen chars hit oovId") {
    val s = spark
    import s.implicits._
    val docs = Seq((1L, "the cat sat on the mat the cat sat the cat"))
      .toDF("doc_id", "text")
    val merges = Bpe.train(docs, "text", numMerges = 4, minFreq = 1L)
      .map(m => (m._2, m._3))
    val vocabDf = Bpe.vocabTable(docs, "text", merges)
    val dir = java.nio.file.Files.createTempDirectory("bpe_vocab").toString
    Bpe.writeVocab(vocabDf, dir)
    val vocab = Bpe.loadVocab(spark, dir)
    // training corpus: no OOV anywhere, ids < vocab size
    val ids = docs.select(Bpe.encodeIds(col("text"), merges, vocab).as("ids"))
      .collect()(0).getSeq[Long](0)
    assert(ids.nonEmpty && ids.forall(i => i >= 0 && i < vocab.size), ids.mkString(","))
    // id sequence decodes back to the token sequence
    val toks = docs.select(Bpe.encodeColumnFast(col("text"), merges).as("t"))
      .collect()(0).getSeq[String](0)
    val inv = vocab.map(_.swap)
    assert(ids.map(inv) == toks, "ids must be the tokens' table rows")
    // a char the corpus never saw → oovId
    val oov = Seq((1L, "zebra! q")).toDF("doc_id", "text")
      .select(Bpe.encodeIds(col("text"), merges, vocab, oovId = -7L).as("ids"))
      .collect()(0).getSeq[Long](0)
    assert(oov.contains(-7L), oov.mkString(","))
  }

  test("byte-level vocabTable/encodeIds: remapped-byte base universe, " +
    "multibyte decomposition, NO OOV even off-corpus (round 11)") {
    val s = spark
    import s.implicits._
    // café: 'é' is two UTF-8 bytes → byte mode decomposes it; char
    // mode would keep it one symbol
    val docs = Seq((1L, "the cat café the cat the café"))
      .toDF("doc_id", "text")
    val merges = Bpe.train(docs, "text", numMerges = 4, minFreq = 1L,
      byteLevel = true).map(m => (m._2, m._3))
    val v = Bpe.vocabTable(docs, "text", merges, byteLevel = true)
      .orderBy("id").collect().map(r => (r.getString(0), r.getLong(1)))
    // contiguous ids
    assert(v.map(_._2).toSeq == (0L until v.length).toSeq, v.mkString(","))
    // base universe = the distinct GPT-2-remapped bytes of the corpus
    // words (é = 0xC3 0xA9 → Ã(0xC3) + the 0xA9 remap 0xA9+162=U+010B)
    val bytes = "thecatcafé".getBytes("UTF-8").map(_ & 0xff).distinct
    val remapped = bytes.map(b =>
      graft.plans.BpeKernel.byteToUnicode(b)).distinct.sorted
    assert(v.takeWhile(x => !merges.map(m => m._1 + m._2).contains(x._1))
      .map(_._1).toSeq == remapped.toSeq, v.mkString(","))
    // encodeIds through the byte vocab: training corpus has no OOV,
    // and NEITHER does unseen ASCII text (bytes are always in range
    // once the byte appears somewhere in the corpus — here check a
    // permutation of seen bytes)
    val vocab = v.map { case (t, i) => t -> i }.toMap
    val ids = docs.select(Bpe.encodeIds(col("text"), merges, vocab,
        byteLevel = true).as("ids"))
      .collect()(0).getSeq[Long](0)
    assert(ids.nonEmpty && ids.forall(i => i >= 0 && i < vocab.size),
      ids.mkString(","))
    // ids decode back to the byteLevel kernel's token stream
    val toks = docs.select(Bpe.encodeColumnFast(col("text"), merges,
        byteLevel = true).as("t"))
      .collect()(0).getSeq[String](0)
    val inv = vocab.map(_.swap)
    assert(ids.map(inv) == toks, "ids must be the tokens' table rows")
    val shuffled = Seq((1L, "techa fact")).toDF("doc_id", "text")
      .select(Bpe.encodeIds(col("text"), merges, vocab, oovId = -7L,
        byteLevel = true).as("ids"))
      .collect()(0).getSeq[Long](0)
    assert(!shuffled.contains(-7L), shuffled.mkString(","))
  }
}
