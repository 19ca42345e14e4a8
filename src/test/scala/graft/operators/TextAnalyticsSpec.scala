package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class TextAnalyticsSpec extends SparkSpec {

  test("count-min sketch never undercounts, is exact without collisions, and merges") {
    val s = spark
    import s.implicits._
    import org.apache.spark.sql.functions.col
    val docs = Seq(
      (1L, "apple apple banana cherry"),
      (2L, "apple banana banana date"),
      (3L, "apple cherry")
    ).toDF("doc_id", "text")
    val exact = Map("apple" -> 4L, "banana" -> 3L, "cherry" -> 2L, "date" -> 1L)
    val terms = exact.keys.toSeq :+ "absent"
    // wide sketch → no collisions on 4 distinct tokens → exact counts
    val wide = TextAnalytics.countMinSketch(docs, "text", d = 4, width = 4096)
    val estWide = TextAnalytics.cmsEstimate(wide, terms, d = 4, width = 4096)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(exact.forall { case (t, c) => estWide(t) == c }, estWide)
    assert(estWide("absent") == 0L)
    // tiny sketch → collisions allowed, but NEVER an undercount
    val tiny = TextAnalytics.countMinSketch(docs, "text", d = 2, width = 2)
    val estTiny = TextAnalytics.cmsEstimate(tiny, terms, d = 2, width = 2)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(exact.forall { case (t, c) => estTiny(t) >= c }, estTiny)
    // linearity: shard sketches merged cell-wise == whole-corpus sketch
    val sh1 = TextAnalytics.countMinSketch(docs.where(col("doc_id") < 3), "text", 4, 4096)
    val sh2 = TextAnalytics.countMinSketch(docs.where(col("doc_id") === 3), "text", 4, 4096)
    val merged = sh1.union(sh2).groupBy("row", "col")
      .agg(org.apache.spark.sql.functions.sum("c").as("c"))
    val estMerged = TextAnalytics.cmsEstimate(merged, terms, d = 4, width = 4096)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(estMerged == estWide)
  }

  test("canonicalUrl collapses crawl variants onto one page key") {
    val s = spark
    import s.implicits._
    import org.apache.spark.sql.functions.col
    val urls = Seq(
      "https://www.Site3.Example.com/Page/7/?utm_source=x&ref=y",
      "http://site3.example.com/page/7/",
      "HTTPS://SITE3.EXAMPLE.COM:443/PAGE/7",
      "site3.example.com:80/page/7#frag",
      "site3.example.com/page/7")
    val canon = urls.toDF("url")
      .select(TextAnalytics.canonicalUrl(col("url")).as("c"))
      .collect().map(_.getString(0)).toSet
    assert(canon == Set("site3.example.com/page/7"), canon)
    // distinct pages stay distinct
    val other = Seq("https://site3.example.com/page/8",
      "https://site4.example.com/page/7")
      .toDF("url").select(TextAnalytics.canonicalUrl(col("url")).as("c"))
      .collect().map(_.getString(0)).toSet
    assert(other.size == 2 && !other.contains("site3.example.com/page/7"))
    val groups = TextAnalytics.dedupByUrl(
      urls.zipWithIndex.map { case (u, i) => (i.toLong, u) }.toDF("id", "url"),
      "id", "url").collect()
    assert(groups.length == 1 && groups(0).getLong(2) == 5L)
  }

  test("ngramNovelty: first-occurrence ownership by min doc_id, exact " +
    "hand case, no pair join in the plan (round 10)") {
    val s = spark
    import s.implicits._
    val docs = Seq(
      (1L, "a b c d"),      // shingles {a b c, b c d} — both novel
      (2L, "a b c x"),      // {a b c (seen), b c x (novel)} → 1/2
      (3L, "a b c d"),      // exact restatement → 0/2
      (4L, "zz")            // <3 tokens → whole-text shingle, novel
    ).toDF("doc_id", "text")
    val got = TextAnalytics.ngramNovelty(docs, "doc_id", "text", n = 3)
      .orderBy("doc_id")
      .as[(Long, Long, Long, Long)].collect.toSeq
    assert(got == Seq(
      (1L, 2L, 2L, 1000000L),
      (2L, 2L, 1L, 500000L),
      (3L, 2L, 0L, 0L),
      (4L, 1L, 1L, 1000000L)), got.toString)
    // scale shape: aggregates only — the doc-keyed close may broadcast,
    // but no shingle-scale SortMergeJoin/CartesianProduct anywhere
    val plan = TextAnalytics.ngramNovelty(docs, "doc_id", "text", n = 3)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"), plan)
  }

  test("ngramOverlapLarge equals the literal-needle ngramOverlap") {
    val s = spark
    import s.implicits._
    val docs = Seq(
      (1L, "the quick brown fox jumps over the lazy dog"),
      (2L, "the quick brown cat sleeps all day long"),
      (3L, "completely unrelated text with no benchmark overlap at all"),
      (4L, "short")
    ).toDF("doc_id", "text")
    // benchmark shingles: bigrams of a needle sentence
    val needleText = "the quick brown fox jumps"
    val needleShingles = needleText.split(" ").sliding(2).map(_.mkString(" ")).toSeq
    val literal = TextAnalytics.ngramOverlap(docs, "doc_id", "text",
      needleShingles, n = 2)
      .orderBy("doc_id").collect().map(r => (r.getLong(0), r.getDouble(1)))
    val joined = TextAnalytics.ngramOverlapLarge(docs, "doc_id", "text",
      needleShingles.toDF("shingle"), n = 2)
      .orderBy("doc_id").collect().map(r => (r.getLong(0), r.getDouble(1)))
    assert(literal.toSeq == joined.toSeq)
    // sanity: doc 1 overlaps heavily, doc 3 not at all
    val byId = literal.toMap
    assert(byId(1L) > 0.4 && byId(3L) == 0.0)
    // the needle set broadcasts — the corpus side must not shuffle for
    // the probe (only the per-doc aggregate exchanges)
    val plan = TextAnalytics.ngramOverlapLarge(docs, "doc_id", "text",
      needleShingles.toDF("shingle"), n = 2)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), s"needle probe not broadcast:\n$plan")
    assert(!plan.contains("SortMergeJoin"))
  }

  test("ngramOverlapBloom upper-bounds the exact overlap with no join in the plan") {
    val s = spark
    import s.implicits._
    val docs = Seq(
      (1L, "the quick brown fox jumps over the lazy dog"),
      (2L, "the quick brown cat sleeps all day long"),
      (3L, "completely unrelated text with no benchmark overlap at all"),
      (4L, "")
    ).toDF("doc_id", "text")
    val needleShingles = "the quick brown fox jumps".split(" ")
      .sliding(2).map(_.mkString(" ")).toSeq.toDF("shingle")
    val exact = TextAnalytics.ngramOverlapLarge(docs, "doc_id", "text",
      needleShingles, n = 2)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val bloom = TextAnalytics.ngramOverlapBloom(docs, "doc_id", "text",
      needleShingles, n = 2, fpp = 1e-4)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(bloom.keySet == exact.keySet)
    exact.foreach { case (id, ov) =>
      assert(bloom(id) >= ov, s"bloom must never under-count: doc $id $bloom vs $exact")
    }
    assert(bloom(1L) > 0.4 && bloom(3L) == 0.0 && bloom(4L) == 0.0)
    // fixed-RAM probe: no join, no exchange — a pure projection pass
    val plan = TextAnalytics.ngramOverlapBloom(docs, "doc_id", "text",
      needleShingles, n = 2, fpp = 1e-4)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Join") && !plan.contains("Exchange"),
      s"bloom probe must not join or shuffle:\n$plan")
  }

  test("portable Bloom: no false negatives, shard merge == joint build, scan-shaped probe") {
    val s = spark
    import s.implicits._
    val mBits = 1024
    val k = 5
    val in = (1 to 40).map(i => s"needle_$i")
    val inDf = in.toDF("v")
    val words = TextAnalytics.bloomWords(
      TextAnalytics.bloomBuild(inDf, "v", mBits, k), mBits)
    // 1. every inserted value probes true (no false negatives, ever)
    val probeIn = inDf.select(col("v"),
      TextAnalytics.bloomMightContain(col("v"), words, mBits, k).as("hit"))
      .collect()
    assert(probeIn.forall(_.getBoolean(1)), "inserted value probed false")
    // 2. a disjoint probe set mostly misses (fill ~0.18 → fp ~0.02%),
    //    and a deliberately tiny filter (64 bits) forces false
    //    positives — the upper-bound direction, never the reverse
    val out = (1 to 500).map(i => s"other_$i").toDF("v")
    val misses = out.select(TextAnalytics.bloomMightContain(col("v"), words, mBits, k))
      .collect().count(_.getBoolean(0))
    assert(misses <= 5, s"fp rate insane for 1024-bit/40-item filter: $misses/500")
    val tiny = TextAnalytics.bloomWords(TextAnalytics.bloomBuild(inDf, "v", 64, k), 64)
    val tinyHits = out.select(TextAnalytics.bloomMightContain(col("v"), tiny, 64, k))
      .collect().count(_.getBoolean(0))
    assert(tinyHits > 400, s"64-bit filter holding 40 items must saturate: $tinyHits")
    // 3. shard merge: build(a ∪ b) == merge(build(a), build(b)) cell-for-cell
    val (a, b) = (in.take(25).toDF("v"), in.drop(25).toDF("v"))
    val merged = TextAnalytics.bloomMerge(
      TextAnalytics.bloomBuild(a, "v", mBits, k),
      TextAnalytics.bloomBuild(b, "v", mBits, k))
    assert(TextAnalytics.bloomWords(merged, mBits).toSeq == words.toSeq,
      "cell-wise OR merge must equal the joint build")
    // 4. the probe is a pure projection: no join, no exchange
    val plan = out.select(TextAnalytics.bloomMightContain(col("v"), words, mBits, k))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Join") && !plan.contains("Exchange"),
      s"bloom probe must not join or shuffle:\n$plan")
  }

  test("tfidfKeywords: topical terms beat stopwords, rank bounded and tie-ordered") {
    val s = spark
    import s.implicits._
    // "the" appears in every doc (df=4, idf floor); each doc has one
    // topical term repeated twice (df=1, idf high)
    val docs = Seq(
      (1L, "the the spark spark cluster"),
      (2L, "the the quantum quantum flux"),
      (3L, "the the minhash minhash band"),
      (4L, "the the alpha beta beta")
    ).toDF("doc_id", "text")
    val out = TextAnalytics.tfidfKeywords(docs, "doc_id", "text", 2)
      .orderBy("doc_id", "rank").collect()
    // <= k rows per doc, ranks consecutive from 1
    val byDoc = out.groupBy(_.getLong(0))
    assert(byDoc.values.forall(_.length == 2))
    assert(byDoc.values.forall(_.map(_.getLong(1)).sorted.sameElements(Seq(1L, 2L))))
    // rank-1 term per doc is the topical (tf=2, df=1) term, never "the"
    val top1 = out.filter(_.getLong(1) == 1L).map(r => r.getLong(0) -> r.getString(2)).toMap
    assert(top1 == Map(1L -> "spark", 2L -> "quantum", 3L -> "minhash", 4L -> "beta"))
    // doc 4 tie: alpha (tf=1,df=1) vs "the" (tf=2, df=4): score decides;
    // and among equal scores the term-asc tie-break is deterministic
    val d4 = out.filter(_.getLong(0) == 4L).map(_.getString(2))
    assert(d4.head == "beta")
    // df column: "the" would carry df=4 — check via a k wide enough
    val wide = TextAnalytics.tfidfKeywords(docs, "doc_id", "text", 10)
      .where(col("term") === "the").select("df").distinct().collect()
    assert(wide.map(_.getLong(0)).toSeq == Seq(4L))
  }

  test("pmiCollocations: bound pairs beat chance pairs, minCount guards hapax, strict bigrams") {
    val s = spark
    import s.implicits._
    // "hong kong" always co-occurs (PMI high); "the" pairs with
    // everything (chance-level PMI); "rare gem" appears once (hapax)
    val base = (1 to 20).map(i =>
      (i.toLong, s"the hong kong office filed the report number$i"))
    val docs = (base :+ (99L, "rare gem")).toDF("doc_id", "text")
    val out = TextAnalytics.pmiCollocations(docs, "text", minCount = 2, k = 5)
      .collect()
    val byBg = out.map(r => r.getString(0) -> r.getLong(4)).toMap
    assert(byBg.contains("hong kong"), s"missing the bound pair: $byBg")
    // hapax pair is excluded by minCount even though its PMI is max
    assert(!byBg.contains("rare gem"), "minCount must drop hapax pairs")
    // the bound pair outranks any "the"-headed chance pair that made the cut
    val theScores = out.filter(_.getString(0).startsWith("the ")).map(_.getLong(4))
    assert(theScores.forall(_ < byBg("hong kong")),
      s"chance pairs must score below the bound pair: $byBg")
    // counts are exact: "hong kong" 20 occurrences, both unigrams 20
    val hk = out.filter(_.getString(0) == "hong kong").head
    assert((hk.getLong(1), hk.getLong(2), hk.getLong(3)) == ((20L, 20L, 20L)))
    // single-token docs contribute no bigrams (strict, no fallback)
    val single = Seq((1L, "solo")).toDF("doc_id", "text")
    assert(TextAnalytics.pmiCollocations(single, "text", 1, 5).count() == 0)
  }

  test("clusterKeywords: c-TF-IDF — cluster-distinctive terms win, tf pools across docs") {
    val s = spark
    import s.implicits._
    // two clusters; "common" is in every doc of both (df = both clusters);
    // each cluster has a signature term spread across its docs
    val docs = Seq(
      (10L, "common kernel kernel"), (10L, "common kernel gpu"),
      (20L, "common sonnet verse"), (20L, "common verse verse")
    ).toDF("cell", "text")
    val out = TextAnalytics.clusterKeywords(docs, "cell", "text", 2)
      .orderBy("cell", "rank").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getLong(3), r.getLong(4)))
    // rank-1 per cluster is the signature term with POOLED tf across docs
    assert(out.filter(t => t._1 == 10L && t._2 == 1L).head._3 == "kernel")
    assert(out.filter(t => t._1 == 10L && t._2 == 1L).head._4 == 3L) // 3 over 2 docs
    assert(out.filter(t => t._1 == 20L && t._2 == 1L).head._3 == "verse")
    // "common" carries df = 2 (clusters, not docs)
    val common = TextAnalytics.clusterKeywords(docs, "cell", "text", 10)
      .where(col("term") === "common").select("df").distinct().collect()
    assert(common.map(_.getLong(0)).toSeq == Seq(2L))
    // and never outranks the signature terms
    assert(out.filter(_._2 == 1L).forall(_._3 != "common"))
  }

  test("tokenEntropy: diverse text scores high, repeated text low, empty zero") {
    val s = spark
    import s.implicits._
    val docs = Seq(
      (1L, "one two three four five six seven eight"), // 8 distinct: ln(8)
      (2L, "spam spam spam spam spam spam spam spam"), // 1 type: 0
      (3L, "")
    ).toDF("doc_id", "text")
    val out = TextAnalytics.tokenEntropy(docs, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(out(1L)._1 == 8 && math.abs(out(1L)._2 - math.round(1e6 * math.log(8)) * 1) <= 8,
      s"uniform-8 entropy should be ~ln(8) nats: $out")
    assert(out(2L) == ((8L, 0L)), s"single-type doc must score 0: $out")
    assert(out(3L) == ((0L, 0L)))
  }

  test("bm25Scores ranks term-dense docs higher, zero for no-match docs") {
    val s = spark
    import s.implicits._
    val docs = Seq(
      (1L, "spark spark spark streaming engine"),
      (2L, "spark appears once in this much longer document about other things entirely"),
      (3L, "nothing relevant here at all"),
      (4L, "")
    ).toDF("doc_id", "text")
    val out = TextAnalytics.bm25Scores(docs, "doc_id", "text", Seq("spark"))
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(out.keySet == Set(1L, 2L, 3L, 4L))
    assert(out(1L)._2 > out(2L)._2, s"tf-dense doc must outrank: $out")
    assert(out(2L)._2 > 0)
    assert(out(3L)._2 == 0 && out(4L)._2 == 0)
    assert(out(1L)._1 == 5 && out(4L)._1 == 0) // token counts ride along
  }

  test("lmScores: in-model text scores higher per bigram than garbled text") {
    val s = spark
    import s.implicits._
    val corpus = Seq(
      (1L, "the cat sat on the mat"),       // fluent under the model
      (2L, "the cat sat on the mat again"), // mostly fluent
      (3L, "mat the on sat cat zzz"),       // scrambled + OOV context
      (4L, "hello"),                        // <2 tokens: no bigrams
      (5L, "")
    ).toDF("doc_id", "text")
    val out = TextAnalytics.lmScores(corpus, corpus, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(out.keySet == Set(1L, 2L, 3L, 4L, 5L))
    assert(out(4L) == ((0L, 0L)) && out(5L) == ((0L, 0L)),
      s"sub-bigram docs must emit (0,0): $out")
    assert(out(1L)._1 == 5 && out(3L)._1 == 5)
    val perBg = out.collect { case (id, (n, lp)) if n > 0 => id -> lp.toDouble / n }
    assert(perBg(1L) > perBg(3L),
      s"fluent text must out-score scrambled text per bigram: $perBg")
    // all log-probs are negative (P < 1 always under add-one smoothing)
    out.values.filter(_._1 > 0).foreach { case (_, lp) => assert(lp < 0) }
    // the vocabulary-scale context table broadcasts; the bigram-count
    // join is the co-keyed shuffle join (corpus-sized at 100 TB)
    val plan = TextAnalytics.lmScores(corpus, corpus, "doc_id", "text")
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), s"context join not broadcast:\n$plan")
  }

  test("dsirScores ranks target-like docs above off-target docs") {
    val s = spark
    import s.implicits._
    val corpus = Seq(
      (1L, "alpha beta gamma delta alpha beta"),   // target-like
      (2L, "alpha beta gamma epsilon"),            // target-like
      (3L, "zzz yyy xxx www vvv uuu"),             // off-target
      (4L, "qqq rrr sss ttt"),                     // off-target
      (5L, "")                                     // zero grams
    ).toDF("doc_id", "text")
    val target = Seq(
      (100L, "alpha beta gamma delta"),
      (101L, "beta gamma delta alpha")
    ).toDF("doc_id", "text")
    val out = TextAnalytics.dsirScores(corpus, target, "doc_id", "text",
      buckets = 512)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(out.keySet == Set(1L, 2L, 3L, 4L, 5L))
    assert(out(5L) == ((0L, 0L)), s"zero-gram doc must score 0: $out")
    val perGram = out.collect { case (id, (n, sc)) if n > 0 => id -> sc.toDouble / n }
    assert(perGram(1L) > perGram(3L) && perGram(1L) > perGram(4L),
      s"target-like doc must outscore off-target: $perGram")
    assert(perGram(2L) > perGram(3L), s"partial match must outscore off-target: $perGram")
    // portable and production hash modes agree on the RANKING
    val port = TextAnalytics.dsirScores(corpus, target, "doc_id", "text",
      buckets = 512, portableHash = true)
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(port(1L) > port(3L) && port(2L) > port(4L))
  }

  test("c4Clean applies the line and page rules exactly") {
    val s = spark
    import s.implicits._
    val goodLine = "This sentence has plenty of words and ends properly."
    val doc = Seq(
      goodLine,                                     // kept
      "No terminal punctuation here",               // dropped: ending
      "Too short.",                                 // dropped: < 3 words
      "Please enable javascript to continue here.", // dropped: javascript
      "  A padded line with five words.  ",         // kept (trimmed)
      "He said \"stop right there\"",               // kept: closing quote IS terminal
      "a trailing comma is not terminal,",          // dropped
      "Is this a kept question line?"               // kept
    ).mkString("\n")
    val out = TextAnalytics.c4Clean(
      Seq((1L, doc)).toDF("doc_id", "text"), "doc_id", "text",
      minLineWords = 3, minKeptLines = 2).collect()(0)
    assert(out.getAs[Int]("n_lines") == 8)
    assert(out.getAs[Int]("n_kept") == 4, out.toString)
    assert(out.getAs[String]("clean_text") ==
      Seq(goodLine, "A padded line with five words.",
        "He said \"stop right there\"",
        "Is this a kept question line?").mkString("\n"))
    assert(out.getAs[Boolean]("keep_doc"))
    // page rules: lorem ipsum / brace kill the doc even with kept lines
    val pages = Seq(
      (1L, goodLine + "\nMore Lorem Ipsum filler text here."),
      (2L, goodLine + "\nfunction f() { return 1; }"),
      (3L, goodLine)
    ).toDF("doc_id", "text")
    val keeps = TextAnalytics.c4Clean(pages, "doc_id", "text",
      minKeptLines = 1).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Boolean]("keep_doc")).toMap
    assert(keeps == Map(1L -> false, 2L -> false, 3L -> true), keeps.toString)
    // below the kept-lines floor → dropped
    val thin = TextAnalytics.c4Clean(
      Seq((9L, goodLine)).toDF("doc_id", "text"), "doc_id", "text",
      minKeptLines = 5).collect()(0)
    assert(!thin.getAs[Boolean]("keep_doc"))
  }

  test("stripHtml drops blocks and tags, unescapes entities, collapses space") {
    val s = spark
    import s.implicits._
    val html =
      """<html><head><title>T</title><style type="text/css">p { color: red }</style>
        |</head><body onload="f()"><h1>Heading</h1>
        |<p>Tom &amp; Jerry say &quot;hi&quot; &lt;loudly&gt;.</p>
        |<script>if (a < b && b > c) { alert("x"); }</script>
        |<p>Second   paragraph.</p></body></html>""".stripMargin
    val got = Seq((1L, html)).toDF("doc_id", "text")
      .select(TextAnalytics.stripHtml(col("text")).as("t"))
      .collect()(0).getString(0)
    assert(got == """T Heading Tom & Jerry say "hi" <loudly>. Second paragraph.""", got)
    // amp unescapes LAST: &amp;lt; is the literal text "&lt;", not "<"
    val doubled = Seq((1L, "<p>&amp;lt;</p>")).toDF("doc_id", "text")
      .select(TextAnalytics.stripHtml(col("text")).as("t"))
      .collect()(0).getString(0)
    assert(doubled == "&lt;", doubled)
  }

  test("gopherFilter: each rule fires on its own violating doc") {
    val s = spark
    import s.implicits._
    // base doc passes EVERYTHING: 60 words incl. 'the' and 'of',
    // mean word length ~5, no symbols/bullets/ellipses/dup lines
    val good = (1 to 58).map(i => s"word$i").mkString(" ") + " the of"
    val docs = Seq(
      1L -> good,
      2L -> "the of short doc.",                              // < 50 words
      3L -> ((1 to 58).map(_ => "aa").mkString(" ") + " the of"),  // mean len < 3
      4L -> good.replace("word1 ", "word1 #### ### # "),      // 8 '#' on 63 words > 0.1
      // 29 of 30 lines bullet-led (distinct, alphabetic) — ONLY the
      // bullet rule fires (alpha 147/176 = 0.835, dup lines 0)
      5L -> ((1 to 29).map(i => s"- bullet line variant$i\n").mkString + good),
      6L -> good.replaceAll("the of$", "111 222"),            // required hits 0
      7L -> ((1 to 50).map(i => "99" + i).mkString(" ") + " the of 11 22 33 44 55 66 77 88") // alpha frac < 0.8
    ).toDF("doc_id", "text")
    val got = TextAnalytics.gopherFilter(docs, "doc_id", "text")
      .collect().map(r => r.getAs[Long]("doc_id") -> r.getAs[Boolean]("keep_doc")).toMap
    assert(got == Map(1L -> true, 2L -> false, 3L -> false, 4L -> false,
      5L -> false, 6L -> false, 7L -> false), got.toString)
    // metric values are exact micro-units
    val m = TextAnalytics.gopherFilter(
      Seq(10L -> "aa bbbb\naa bbbb\ndd cc...").toDF("doc_id", "text"),
      "doc_id", "text").collect()(0)
    assert(m.getAs[Long]("n_words") == 6)
    assert(m.getAs[Long]("mean_len_micro") == (2L+4+2+4+2+5) * 1000000L / 6)
    assert(m.getAs[Long]("dup_line_micro") == 1000000L / 3)
    assert(m.getAs[Long]("ellipsis_micro") == 1000000L / 3)
    assert(m.getAs[Long]("symbol_micro") == 1000000L / 6)
  }

  test("chunkDocs: overlapping windows cover every token, stop at doc end") {
    val s = spark
    import s.implicits._
    val toks = (1 to 25).map(i => s"t$i")
    val docs = Seq(
      (1L, toks.mkString(" ")),   // 25 tokens: chunks at 0, 8 → wait: see asserts
      (2L, "a b c"),              // fits one window
      (3L, ""),                   // zero tokens → no rows
      (4L, "  \n  ")              // whitespace only → no rows
    ).toDF("doc_id", "text")
    val got = TextAnalytics.chunkDocs(docs, "doc_id", "text",
      chunkTokens = 10, stride = 8)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
      .sortBy(x => (x._1, x._2))
    // doc 1: n=25 → n_chunks = 1 + ceil(15/8) = 3 → offsets 0, 8, 16
    assert(got.map(x => (x._1, x._2)).toList ==
      List((1L, 0L), (1L, 1L), (1L, 2L), (2L, 0L)), got.mkString(", "))
    assert(got(0)._4 == toks.take(10).mkString(" "))
    assert(got(1)._4 == toks.slice(8, 18).mkString(" "))
    assert(got(2)._4 == toks.slice(16, 25).mkString(" ") && got(2)._3 == 9L)
    assert(got(3)._4 == "a b c" && got(3)._3 == 3L)
    // coverage: chunk 0 + the post-overlap tail of each later chunk
    // reconstructs the doc exactly
    val rebuilt = got.filter(_._1 == 1L).sortBy(_._2).zipWithIndex.flatMap {
      case ((_, _, _, txt), 0) => txt.split(" ").toSeq
      case ((_, _, _, txt), _) => txt.split(" ").toSeq.drop(10 - 8)
    }
    assert(rebuilt.toList == toks.toList)
  }

  test("fixMojibake repairs the cp1252 round-trip; clean text untouched") {
    val s = spark
    import s.implicits._
    def corrupt(t: String) = new String(t.getBytes("UTF-8"), "windows-1252")
    val originals = Seq(
      "it’s a naïve café — “quoted”…",
      "«München» kostet 5€ · 30°",
      "plain ascii stays plain ascii")
    val rows = originals.zipWithIndex
      .map { case (t, i) => (i.toLong, corrupt(t)) }
      .toDF("doc_id", "text")
      .select(col("doc_id"),
        TextAnalytics.fixMojibake(col("text")).as("fixed"),
        TextAnalytics.mojibakeCount(col("text")).as("n_bad"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toList
    assert(rows.map(_._2) == originals, rows.toString)
    assert(rows(2)._3 == 0L)            // clean doc: nothing counted
    assert(rows(0)._3 == 7L, rows.toString)  // ’ ï é — “ ” …
    // û is NOT in the table (coûte corrupts to "coÃ»te" and stays) —
    // the count/repair only touch table entries, never guess
    val partial = Seq((1L, corrupt("coûte"))).toDF("doc_id", "text")
      .select(TextAnalytics.fixMojibake(col("text")).as("f")).collect()(0).getString(0)
    assert(partial == corrupt("coûte"))
  }

  test("HLL registers merge by max; estimate within the rel-error bound") {
    val s = spark
    import s.implicits._
    val p = 10
    val m = 1 << p
    // 5000 distinct values under one key
    val vals = (1 to 5000).map(i => ("k", s"value$i")).toDF("key", "v")
    val est = TextAnalytics.hllEstimate(
      TextAnalytics.hllRegisters(vals, "key", "v", p), p)
      .collect()(0).getAs[Long]("est_floor")
    // 3 sigma of 1.04/sqrt(m) ≈ 9.75%
    assert(math.abs(est - 5000.0) / 5000.0 < 0.1, est.toString)
    // duplicates don't move the estimate (sketch sees sets)
    val dup = vals.union(vals).union(vals)
    val estDup = TextAnalytics.hllEstimate(
      TextAnalytics.hllRegisters(dup, "key", "v", p), p)
      .collect()(0).getAs[Long]("est_floor")
    assert(estDup == est)
    // shard-merge linearity: registers(A ∪ B) == cellwise-max of
    // registers(A), registers(B)
    val a = vals.where(col("v").substr(6, 10).cast("long") % 2 === 0)
    val b = vals.where(col("v").substr(6, 10).cast("long") % 2 === 1)
    val whole = TextAnalytics.hllRegisters(vals, "key", "v", p)
      .collect().map(r => (r.getLong(1), r.getInt(2))).toMap
    val merged = TextAnalytics.hllRegisters(a, "key", "v", p)
      .union(TextAnalytics.hllRegisters(b, "key", "v", p))
      .groupBy("key", "bucket").agg(max("r").as("r"))
      .collect().map(r => (r.getLong(1), r.getInt(2))).toMap
    assert(merged == whole)
  }

  test("blockwordRatio counts blocklisted token exposure") {
    val s = spark
    import s.implicits._
    val rows = Seq(
      (1L, "clean friendly text here"),
      (2L, "badword one badword two"),
      (3L, "")
    ).toDF("doc_id", "text")
      .select(col("doc_id"),
        TextAnalytics.blockwordRatio(col("text"), Seq("badword", "worse")).as("r"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(rows(1L) == 0.0 && rows(2L) == 0.5 && rows(3L) == 0.0, rows.toString)
  }

  test("readability: counts and Flesch formula on known prose") {
    val s = spark
    import s.implicits._
    val docs = Seq(
      (1L, "The cat sat. The dog ran!"),  // 6 words, 2 sentences
      (2L, "no terminal punctuation here"), // sentences floored at 1
      (3L, "")                              // wordless → NULL score
    ).toDF("doc_id", "text")
    val out = TextAnalytics.readability(docs, "doc_id", "text")
      .collect().map(r => r.getAs[Long]("doc_id") -> r).toMap
    val r1 = out(1L)
    assert(r1.getAs[Long]("n_words") === 6L)
    assert(r1.getAs[Long]("n_sentences") === 2L)
    // vowel groups: e,a,a,e,o,a → 6
    assert(r1.getAs[Long]("n_syllables") === 6L)
    val expect1 = math.round(1e6 * (206.835 - 1.015 * (6.0 / 2.0) - 84.6 * (6.0 / 6.0)))
    assert(r1.getAs[Long]("flesch_micro") === expect1)
    assert(out(2L).getAs[Long]("n_sentences") === 1L)
    assert(out(3L).isNullAt(out(3L).fieldIndex("flesch_micro")))
  }

  test("knBigramTable matches hand-computed Kneser-Ney (d = 0.5)") {
    import spark.implicits._
    // corpus bigrams: "a b" x3, "a c" x1, "b a" x2  (doc: a b a b a c / b a b a)
    val df = Seq("a b a b a c", "b a b a").toDF("text")
    val got = TextAnalytics.knBigramTable(df, "text", minCount = 1)
      .as[(String, String, Long, Long, Long, Long, Long)].collect
      .map(r => (r._1, r._2) -> r).toMap
    // counts: (a,b)=3 [2 in doc1? a b,a b -> plus none in doc2]... recompute:
    // doc1 pairs: ab, ba, ab, ba, ac -> ab:2 ba:2 ac:1
    // doc2 pairs: ba, ab, ba -> ba:2 ab:1
    // totals: ab=3, ba=4, ac=1; c1(a)=4, c1(b)=4; n1p(a)=2, n1p(b)=1
    // ncont(a)=1, ncont(b)=1, ncont(c)=1; D=3
    def p(c12: Long, c1: Long, n1p: Long, ncont: Long, d: Long): Long =
      math.round(1e6 * ((c12 - 0.5) / c1 + (n1p / (2.0 * c1)) * (ncont.toDouble / d)))
    assert(got(("a", "b"))._7 == p(3, 4, 2, 1, 3))
    assert(got(("a", "c"))._7 == p(1, 4, 2, 1, 3))
    assert(got(("b", "a"))._7 == p(4, 4, 1, 1, 3))
    assert(got.size == 3)
    // KN sanity: total prob mass out of "a" sums to ~1 over continuations
    // (only approximately here since vocab > observed continuations)
  }

  test("knBigramTable: single-token docs contribute nothing; minCount prunes") {
    import spark.implicits._
    // "x y x y" pairs: xy, yx, xy -> xy:2, yx:1; minCount=2 keeps xy only
    val df = Seq("solo", "x y x y").toDF("text")
    val got = TextAnalytics.knBigramTable(df, "text", minCount = 2)
      .as[(String, String, Long, Long, Long, Long, Long)].collect
    assert(got.map(r => (r._1, r._2)).toSet == Set(("x", "y")))
    // margins still computed over the FULL table: c1(x)=2, n1p(x)=1, D=2
    assert(got.head == (("x", "y", 2L, 2L, 1L, 1L,
      math.round(1e6 * ((2 - 0.5) / 2.0 + (1 / (2.0 * 2.0)) * (1.0 / 2.0))))))
  }

  test("tokenizerFertility: hand case, zero-word guard, null keys drop") {
    import spark.implicits._
    // "don't stop." → 2 whitespace words; pieces: don ' t stop . = 5
    val df = Seq(
      (Some("en"), "don't stop."),
      (Some("en"), "plain words here"),   // 3 words, 3 pieces
      (Some("xx"), "..."),                // 1 word, 3 pieces (dots split)
      (None, "dropped entirely")
    ).toDF("lang", "text")
    val got = TextAnalytics.tokenizerFertility(df, "lang", "text")
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3),
          Option(r.get(4)).map(_.asInstanceOf[Long]))).toMap
    assert(got.keySet == Set("en", "xx"))
    val (nd, w, p, f) = got("en")
    assert(nd == 2 && w == 5 && p == 8)
    assert(f.contains(math.round(8.0 / 5.0 * 1e6)))
    assert(got("xx") == ((1L, 1L, 3L, Some(3000000L))))
  }

  test("zipfFit matches a hand-replayed log-log OLS over known ranks") {
    import spark.implicits._
    // exact Zipf frequencies n = 24/r: a:24, b:12, c:8, d:6 →
    // ranks 1..4 by (n desc, term asc)
    val docs = Seq(("a " * 24).trim, ("b " * 12).trim,
      ("c " * 8).trim, ("d " * 6).trim).toDF("text")
    val out = TextAnalytics.zipfFit(docs, "text", maxRank = 10)
      .as[(Long, Option[Long], Option[Long])].collect.toSeq
    assert(out.size == 1)
    val (k, slope, icept) = out.head
    assert(k == 4)
    // replay the micro-quantized OLS exactly
    val pts = Seq((1, 24L), (2, 12L), (3, 8L), (4, 6L)).map { case (r, n) =>
      (math.round(math.log(r.toDouble) * 1e6),
        math.round(math.log(n.toDouble) * 1e6))
    }
    val kk = pts.size.toDouble
    val sx = pts.map(_._1).sum.toDouble
    val sy = pts.map(_._2).sum.toDouble
    val sxy = pts.map(p => BigInt(p._1) * BigInt(p._2)).sum.toDouble
    val sxx = pts.map(p => BigInt(p._1) * BigInt(p._1)).sum.toDouble
    val det = kk * sxx - sx * sx
    val s = (kk * sxy - sx * sy) / det
    assert(slope.contains(math.round(s * 1e6)), s"got $slope")
    assert(icept.contains(math.round((sy - s * sx) / kk / 1e6 * 1e6)))
    // the exact power law n = 8 / r^1 has log-log slope −1: micro
    // slope must sit within quantization error of −1.0
    assert(math.abs(slope.get + 1000000L) < 2000L, s"slope $slope")
  }

  test("zipfFit: maxRank bounds the head; degenerate one-term corpus " +
    "yields NULL fit") {
    import spark.implicits._
    val docs = Seq("z z z", "z z").toDF("text")
    val one = TextAnalytics.zipfFit(docs, "text", maxRank = 5)
      .as[(Long, Option[Long], Option[Long])].collect.head
    // single rank: k < 2 → NULL slope/intercept (det would also be 0)
    assert(one == ((1L, None, None)))
    val many = Seq("a a a b b c d e f g").toDF("text")
    val capped = TextAnalytics.zipfFit(many, "text", maxRank = 3)
      .as[(Long, Option[Long], Option[Long])].collect.head
    assert(capped._1 == 3L) // head truncated at maxRank
  }

  test("simpsonDiversity: hand-computed concentration, degenerate " +
    "single-token group") {
    val s = spark
    import s.implicits._
    // "a a b": D = 2·1/(3·2) = 1/3; single token → NULL micros
    val df = Seq(("g1", "a a b"), ("g2", "solo")).toDF("src", "text")
    val got = TextAnalytics.simpsonDiversity(df, "src", "text")
      .as[(String, Long, Long, Option[Long], Option[Long])].collect
      .map(r => r._1 -> r).toMap
    assert(got("g1") == (("g1", 3L, 2L, Some(333333L), Some(666667L))),
      got("g1"))
    assert(got("g2")._4.isEmpty && got("g2")._5.isEmpty, got("g2"))
  }

  test("multiNeedleScan: classic he/she/his/hers automaton case, " +
    "overlapping counts, shared-prefix needles") {
    val s = spark
    import s.implicits._
    val docs = Seq((1L, "ushers"), (2L, "his history"), (3L, "aaa"),
      (4L, "none here")).toDF("id", "text")
    val got = TextAnalytics.multiNeedleScan(docs, "id", "text",
      Seq("he", "she", "his", "hers", "aa"))
      .as[(Long, String, Long)].collect
      .map(r => (r._1, r._2) -> r._3).toMap
    // "ushers": she@1, he@2, hers@2
    assert(got((1L, "she")) == 1L && got((1L, "he")) == 1L &&
      got((1L, "hers")) == 1L, got)
    // "his history": his twice (word + prefix of history)
    assert(got((2L, "his")) == 2L, got)
    // OVERLAPPING semantics: "aa" hits "aaa" twice
    assert(got((3L, "aa")) == 2L, got)
    // "none here" contains he (in "here")
    assert(got((4L, "he")) == 1L)
    assert(!got.contains((4L, "she")))
  }

  test("heavyHitters: equals the exact top-n; tiny k still surfaces " +
    "the dominant token (MG guarantee)") {
    val s = spark
    import s.implicits._
    // skewed stream: a×60, b×25, c×10, d..h ×1
    val text = (Seq.fill(60)("a") ++ Seq.fill(25)("b") ++
      Seq.fill(10)("c") ++ Seq("d", "e", "f", "g", "h")).mkString(" ")
    val df = Seq(text).toDF("text")
    val got = TextAnalytics.heavyHitters(df, "text", k = 64, topN = 3)
      .as[(String, Long)].collect.toSeq
    assert(got == Seq(("a", 60L), ("b", 25L), ("c", 10L)), got)
    // k=2: frequency(a)=60 > N/(k+1)=100/3 → a must survive
    val tiny = TextAnalytics.heavyHitters(df, "text", k = 2, topN = 1)
      .as[(String, Long)].collect.toSeq
    assert(tiny == Seq(("a", 60L)), tiny)
  }

  test("vocabOverlap: exact pairwise Jaccard; zero-overlap pairs are " +
    "absent") {
    val s = spark
    import s.implicits._
    val df = Seq(("g1", "a b c"), ("g2", "b c d"), ("g3", "a"))
      .toDF("src", "text")
    val got = TextAnalytics.vocabOverlap(df, "src", "text")
      .as[(String, String, Long, Long, Long, Long)].collect
      .map(r => (r._1, r._2) -> r).toMap
    assert(got(("g1", "g2")) == (("g1", "g2", 3L, 3L, 2L, 500000L)))
    assert(got(("g1", "g3")) == (("g1", "g3", 3L, 1L, 1L, 333333L)))
    assert(!got.contains(("g2", "g3")), "disjoint vocabularies must " +
      "emit no pair row")
  }

  test("rakeKeywords: hand-computed degree/frequency scores, stopword " +
    "and punctuation phrase breaks") {
    val s = spark
    import s.implicits._
    // "deep learning, of deep models": phrases "deep learning" and
    // "deep models" (comma and 'of' both break). deep: freq 2,
    // deg 4 → 2e6; learning/models: freq 1, deg 2 → 2e6.
    // Both phrases score 4e6; tie broken by phrase asc.
    val df = Seq("deep learning, of deep models").toDF("text")
    val got = TextAnalytics.rakeKeywords(df, "text", Seq("of"), topN = 5)
      .as[(String, Long, Long)].collect.toSeq
    assert(got == Seq(("deep learning", 1L, 4000000L),
      ("deep models", 1L, 4000000L)), got)
    // repeated phrase aggregates occurrences; adjacent stopwords break
    val rep = Seq("deep learning of the deep learning").toDF("text")
    val got2 = TextAnalytics.rakeKeywords(rep, "text",
      Seq("of", "the"), topN = 5)
      .as[(String, Long, Long)].collect.toSeq
    assert(got2 == Seq(("deep learning", 2L, 4000000L)), got2)
    // phrases longer than maxWords are dropped entirely
    val long = Seq("one two three four five").toDF("text")
    val got3 = TextAnalytics.rakeKeywords(long, "text", Seq("zzz"),
      topN = 5, maxWords = 4)
      .collect()
    assert(got3.isEmpty, got3.toSeq)
  }

  test("llrCollocations: hand-computed G², frequent evidence outranks " +
    "the rare pair PMI overrates") {
    val s = spark
    import s.implicits._
    // bigrams: "a b"×10 (strong, frequent), "a x"×3 (dilution), and a
    // CHANCE-compatible rare pair "c d"×1 whose margins also appear
    // in "c y"×3 / "z d"×3 → N = 20. PMI would rank "c d" on its
    // 1-in-1 co-occurrence; G² sees the margins and demotes it.
    val docs = (Seq.fill(10)("a b") ++ Seq.fill(3)("a x") ++ Seq("c d") ++
      Seq.fill(3)("c y") ++ Seq.fill(3)("z d"))
      .toDF("text")
    val got = TextAnalytics.llrCollocations(docs, "text",
      minCount = 1, k = 8)
      .as[(String, Long, Long, Long, Long)].collect.toSeq
    def xlx(x: Double) = if (x > 0) x * math.log(x) else 0.0
    def g2(k11: Long, r1: Long, c1: Long, n: Long): Long = {
      val k12 = r1 - k11; val k21 = c1 - k11; val k22 = n - r1 - c1 + k11
      math.round(2.0 * ((((xlx(k11) + xlx(k12)) + xlx(k21)) + xlx(k22))
        - (xlx(r1) + xlx(n - r1)) - (xlx(c1) + xlx(n - c1))
        + xlx(n)) * 1e6)
    }
    val ab = got.find(_._1 == "a b").get
    val cd = got.find(_._1 == "c d").get
    assert(ab == (("a b", 10L, 13L, 10L, g2(10, 13, 10, 20))), ab)
    assert(cd == (("c d", 1L, 4L, 4L, g2(1, 4, 4, 20))), cd)
    // the frequent collocation carries more evidence than the hapax
    assert(ab._5 > cd._5, s"G² must weigh evidence: $ab vs $cd")
    assert(got.head._1 == "a b")
  }

  test("winnowFingerprints: no gap longer than w, fingerprints are real " +
    "gram hashes, shared substrings share a fingerprint") {
    val s = spark
    import s.implicits._
    val shared = "the quick brown fox jumps over the lazy dog again"
    val docs = Seq(
      (1L, s"AAAA $shared BBBB padding text here to extend one"),
      (2L, s"zz $shared yy completely different tail content xx"),
      (3L, "zzzzz qqqqq wwwww eeeee rrrrr ttttt uuuuu iiiii ooooo"))
      .toDF("doc_id", "text")
    val k = 5; val w = 4
    val fps = TextAnalytics.winnowFingerprints(docs, "doc_id", "text", k, w)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val byDoc = fps.groupBy(_._1)
    // winnowing guarantee #1: consecutive selected positions are at
    // most w apart (no fingerprint-free gap longer than a window)
    byDoc.values.foreach { rows =>
      val ps = rows.map(_._2).sorted
      ps.sliding(2).foreach { case Array(a, b) =>
        assert(b - a <= w, s"gap $a -> $b exceeds w=$w")
      case _ => }
    }
    // guarantee #2: docs 1 and 2 share the long substring → at least
    // one shared fingerprint; doc 3 shares nothing with either
    val f1 = byDoc(1L).map(_._3).toSet
    val f2 = byDoc(2L).map(_._3).toSet
    val f3 = byDoc(3L).map(_._3).toSet
    assert((f1 & f2).nonEmpty, "shared substring produced no shared fp")
    assert((f1 & f3).isEmpty && (f2 & f3).isEmpty,
      "unrelated doc collided")
    // each fp is the hash of the k-gram at its position (recompute)
    val norm = docs.select(col("doc_id"),
      trim(regexp_replace(lower(col("text")), "\\s+", " "))
        .as("t")).as[(Long, String)].collect().toMap
    val probe = fps.take(20).map { case (id, pos, _) =>
      (id, pos, norm(id).substring(pos.toInt - 1, pos.toInt - 1 + k))
    }.toSeq.toDF("doc_id", "pos", "gram")
      .withColumn("h", xxhash64(col("gram")))
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(3)).toMap
    fps.take(20).foreach { case (id, pos, fp) =>
      assert(probe((id, pos)) == fp, s"fp mismatch at ($id, $pos)")
    }
    // portable-hash mode selects by the SAME winnowing rule (positions
    // may differ — different hash — but the invariants hold)
    val port = TextAnalytics.winnowFingerprints(docs, "doc_id", "text",
      k, w, portableHash = true).collect()
    assert(port.nonEmpty)
    // texts shorter than k + w − 1 yield no fingerprints, not an error
    val short = Seq((9L, "tiny")).toDF("doc_id", "text")
    assert(TextAnalytics.winnowFingerprints(short, "doc_id", "text",
      k, w).collect().isEmpty)
  }

  test("hybridRetrieve: lexical-only docs and embedding-only ids both " +
    "surface, a doc strong in BOTH towers outranks single-tower hits " +
    "(round 12)") {
    val s = spark
    import s.implicits._
    // doc 1: lexical match only (no embedding); doc 2: both towers
    // (text match + near-identical vector); doc 3: semantic only
    // (vector close, text unrelated); doc 4: noise
    val docs = Seq(
      (1L, "quantum flux capacitor theory and experiments"),
      (2L, "quantum flux review of recent results"),
      (3L, "unrelated cooking recipes and kitchen notes"),
      (4L, "gardening tips for dry climates")
    ).toDF("doc_id", "text")
    def v(xs: Double*): Array[Float] = xs.map(_.toFloat).toArray
    val embs = Seq(
      (2L, v(1.0, 0.02, 0)),
      (3L, v(1.0, 0.05, 0)),
      (4L, v(0, 0, 1.0))
    ).toDF("vec_id", "embedding")
    val queries = Seq(
      (100L, Seq("quantum", "flux"), v(1.0, 0.0, 0.0))
    ).toDF("qid", "terms", "qvec")
    val out = TextAnalytics.hybridRetrieve(docs, "doc_id", "text",
        embs, "vec_id", "embedding", queries, "qid", "terms", "qvec",
        n = 3, k = 4)
      .orderBy("rank").collect()
      .map(r => (r.getLong(1), r.getLong(2), r.getInt(3)))
    val byId = out.map(t => t._1 -> t._2).toMap
    // doc 2 hits both towers → its rrf has two terms, strictly above
    // every single-tower doc
    assert(out.head._1 == 2L, s"both-tower doc not rank 1: ${out.toSeq}")
    assert(byId.contains(1L), "lexical-only doc missing")
    assert(byId.contains(3L), "semantic-only doc missing")
    assert(byId(2L) > byId(1L) && byId(2L) > byId(3L))
    // rrf terms are the exact integer-division values
    // doc 2: lex rank 1 or 2 + sem rank 1 → 1000000/(60+r) sums
    val legal = (1 to 3).map(r => 1000000L / (60 + r)).toSet
    out.foreach { case (_, m, _) =>
      val parts = for (a <- legal + 0L; b <- legal + 0L) yield a + b
      assert(parts.contains(m), s"rrf_micro $m is not a legal term sum")
    }
  }
}
