package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.functions.{Ffiec, Text, Vectors}
import graft.operators.{CombineParts, Dedup, Graph, KeyChecks, Knn, LongPivot, Pq, Sampling, TextAnalytics}
import graft.sources.{Scan, XbrlZip}
import graft.streaming.Sessions

/** Driver contract — see /root/repo/SURVEY.md §2 for the operator ↔
  * query mapping. Every query orders by a unique key and aliases every
  * computed column identically to its DuckDB oracle; double aggregates
  * go through DECIMAL so cross-engine hashes are bit-stable.
  */
object SparkEntry {

  private def t(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  /** events.parquet's `ts` physical type has changed across testdata
    * generations (TIMESTAMP(NANOS) read as long vs timestamp[us] read as
    * timestamp). Never assume: read the stored schema and adapt. Nanos
    * arrive as LongType only under `nanosAsLong`, so set that conf first,
    * then integral-divide to micros when (and only when) the column is a
    * long (a double roundtrip would lose precision at 1.7e18 ns). */
  private def events(spark: SparkSession, dir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val raw = spark.read.parquet(s"$dir/events.parquet")
    raw.schema("ts").dataType match {
      case LongType => raw.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      // timestamp[us] with isAdjustedToUTC=false reads as TIMESTAMP_NTZ;
      // the gate session pins spark.sql.session.timeZone=UTC, so casting
      // to TIMESTAMP(LTZ) preserves the stored micros exactly and keeps
      // downstream unix_micros/casts working.
      case TimestampNTZType => raw.withColumn("ts", col("ts").cast(TimestampType))
      case _                => raw
    }
  }

  /** Exact cross-engine sum of a double column: quantize each value to
    * DECIMAL(28,4) (deterministic per stored double), sum exactly, cast
    * back to double. Immune to partial-aggregation order. */
  private def decSum(c: Column): Column =
    sum(c.cast(DecimalType(28, 4))).cast("double")

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    queries("q03_join_agg")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // --- core relational ---------------------------------------------------
    "q01_pricing_summary" -> ((s, dir) => {
      t(s, dir, "lineitem")
        .where(col("l_shipdate") <= lit("2001-09-02").cast("timestamp"))
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(
          decSum(col("l_quantity")).as("sum_qty"),
          decSum(col("l_extendedprice")).as("sum_base_price"),
          decSum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))).as("sum_disc_price"),
          count(lit(1)).as("count_order"))
        .withColumn("avg_qty", round(col("sum_qty") / col("count_order"), 6))
        .orderBy("l_returnflag", "l_linestatus")
    }),

    "q02_filter_project" -> ((s, dir) => {
      t(s, dir, "lineitem")
        .where(col("l_shipdate") >= lit("1996-01-01").cast("timestamp") &&
          col("l_shipdate") < lit("1998-01-01").cast("timestamp") &&
          col("l_discount") >= 0.05 && col("l_discount") <= 0.07 &&
          col("l_quantity") < 24)
        .select("l_orderkey", "l_linenumber", "l_extendedprice", "l_discount")
        // (l_orderkey, l_linenumber) is not unique in the synthetic data;
        // order by the full row so the output order is well-defined.
        .orderBy("l_orderkey", "l_linenumber", "l_extendedprice", "l_discount")
    }),

    "q03_join_agg" -> ((s, dir) => {
      val customer = t(s, dir, "customer")
      val orders = t(s, dir, "orders")
      val nation = t(s, dir, "nation")
      val region = t(s, dir, "region")
      orders
        .join(customer, orders("o_custkey") === customer("c_custkey"))
        .join(broadcast(nation), customer("c_nationkey") === nation("n_nationkey"))
        .join(broadcast(region), nation("n_regionkey") === region("r_regionkey"))
        .groupBy(col("r_name"), col("n_name"))
        .agg(decSum(col("o_totalprice")).as("revenue"),
          count(lit(1)).as("n_orders"))
        .orderBy("r_name", "n_name")
    }),

    "q04_sort_limit" -> ((s, dir) => {
      t(s, dir, "orders")
        .select("o_orderkey", "o_custkey", "o_totalprice")
        .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
        .limit(20)
    }),

    "q05_window" -> ((s, dir) => {
      val w = Window.partitionBy("o_custkey")
        .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
      t(s, dir, "orders")
        .withColumn("rnk", row_number().over(w))
        .where(col("rnk") <= 3)
        .select("o_custkey", "o_orderkey", "o_totalprice", "rnk")
        .orderBy("o_custkey", "rnk")
    }),

    "q06_exists_semi" -> ((s, dir) => {
      val bigOrders = t(s, dir, "orders").where(col("o_totalprice") > 200000)
      t(s, dir, "customer")
        .join(bigOrders, col("c_custkey") === col("o_custkey"), "left_semi")
        .select("c_custkey", "c_name", "c_mktsegment")
        .orderBy("c_custkey")
    }),

    // --- reference ETL operators ------------------------------------------
    "q07_combine_parts" -> ((s, dir) => {
      val customer = t(s, dir, "customer")
      val part1 = customer.select(
        col("c_custkey"),
        when(col("c_custkey") % 3 === 0, lit(null).cast("string"))
          .otherwise(col("c_name")).as("c_name"),
        col("c_nationkey"))
      val part2 = customer.select(col("c_custkey"), col("c_name"), col("c_acctbal"))
      CombineParts.combine(Seq(part1, part2), key = "c_custkey")
        .orderBy("c_custkey")
    }),

    "q08_unpivot_long" -> ((s, dir) => {
      LongPivot.long(
        t(s, dir, "lineitem")
          .select("l_orderkey", "l_linenumber", "l_quantity",
            "l_extendedprice", "l_discount", "l_tax"),
        idCols = Seq("l_orderkey", "l_linenumber"),
        dtype = DoubleType)
        .orderBy("l_orderkey", "l_linenumber", "item", "value")
    }),

    "q09_pivot_wide" -> ((s, dir) => {
      val priorities = Seq("1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW")
      val long = t(s, dir, "orders")
        .select(col("o_custkey"), col("o_orderpriority"),
          col("o_totalprice").cast(DecimalType(28, 4)).as("price"))
      val wide = LongPivot.wide(long, idCols = Seq("o_custkey"),
        namesFrom = "o_orderpriority", valuesFrom = "price",
        items = priorities, valuesFn = "sum")
      wide.select(
        col("o_custkey"),
        col("`1-URGENT`").cast("double").as("p_urgent"),
        col("`2-HIGH`").cast("double").as("p_high"),
        col("`3-MEDIUM`").cast("double").as("p_medium"),
        col("`4-NOT SPECIFIED`").cast("double").as("p_notspec"),
        col("`5-LOW`").cast("double").as("p_low"))
        .orderBy("o_custkey")
    }),

    "q10_parse_dates" -> ((s, dir) => {
      val raw = t(s, dir, "orders").select(
        col("o_orderkey"),
        when(col("o_orderkey") % 97 === 0, lit("0"))
          .when(col("o_orderkey") % 89 === 0, lit("99991399"))
          .when(col("o_orderkey") % 83 === 0, lit("00000000"))
          .otherwise(date_format(col("o_orderdate"), "yyyyMMdd")).as("date_str"))
      raw.select(col("o_orderkey"), col("date_str"),
          Ffiec.parseFfiecDate(col("date_str")).as("parsed_date"))
        .orderBy("o_orderkey")
    }),

    "q11_id_zero_null" -> ((s, dir) => {
      val raw = t(s, dir, "customer").select(
        col("c_custkey"),
        when(col("c_custkey") % 10 === 0, lit("0"))
          .when(col("c_custkey") % 7 === 0, lit(" "))
          .otherwise(col("c_custkey").cast("string")).as("id_raw"))
      raw.select(col("c_custkey"), Ffiec.idZeroNull(col("id_raw")).as("id_clean"))
        .orderBy("c_custkey")
    }),

    "q12_pct_to_prop" -> ((s, dir) => {
      val raw = t(s, dir, "lineitem").select(
        col("l_orderkey"), col("l_linenumber"),
        concat(round(col("l_discount") * 100, 0).cast("int"), lit("%")).as("pct_str"))
      raw.select(col("l_orderkey"), col("l_linenumber"),
          round(Ffiec.pctToProp(col("pct_str")), 4).as("prop"))
        .orderBy("l_orderkey", "l_linenumber", "prop")
    }),

    "q13_check_pk" -> ((s, dir) => {
      KeyChecks.pkViolations(t(s, dir, "orders"), Seq("o_custkey"))
        .orderBy("o_custkey")
    }),

    "q14_null_counts" -> ((s, dir) => {
      val withNulls = t(s, dir, "customer").select(
        col("c_custkey"),
        when(col("c_custkey") % 5 === 0, lit(null).cast("string"))
          .otherwise(col("c_name")).as("c_name"),
        when(col("c_custkey") % 11 === 0, lit(null).cast("double"))
          .otherwise(col("c_acctbal")).as("c_acctbal"))
      KeyChecks.nullCounts(withNulls, Seq("c_name", "c_acctbal"))
        .withColumnRenamed("column", "col_name")
        .orderBy("col_name")
    }),

    // --- dedup -------------------------------------------------------------
    "q15_dedup_exact" -> ((s, dir) => {
      Dedup.exact(t(s, dir, "documents"), "doc_id", "text").orderBy("fp")
    }),

    // maxDf hot-shingle cap ACTIVE in the gate (the oracle applies the
    // same QUALIFY) — viral shingles are dropped from the inverted
    // index before the candidate join in both engines.
    "q16_ngram_jaccard" -> ((s, dir) => {
      Dedup.ngramJaccardPairs(t(s, dir, "documents"), "doc_id", "text",
        n = 3, tau = 0.5, maxDf = 1000)
        .orderBy("id_a", "id_b")
    }),

    // Gate queries run the md5-portable hash mode so signature, banding
    // and pair verification are exactly replayed by the DuckDB oracle;
    // production default stays the xxhash64 codegen kernels (ScalaTest
    // asserts both modes implement the same algorithm).
    "q17_minhash_dedup" -> ((s, dir) => {
      Dedup.minhashLshPairs(t(s, dir, "documents"), "doc_id", "text",
        shingleN = 3, bands = 16, rowsPerBand = 4, tau = 0.35,
        portableHash = true)
        .orderBy("id_a", "id_b")
    }),

    "q18_simhash" -> ((s, dir) => {
      Dedup.simhashFingerprints(t(s, dir, "documents"), "doc_id", "text",
        portableHash = true)
        .orderBy("id")
    }),

    // Duplicated-passage signal (substring-dedup metric): fraction of
    // each doc's 3-token windows (with multiplicity) occurring >= 2
    // times corpus-wide.
    "q57_duplicated_windows" -> ((s, dir) => {
      Dedup.duplicatedWindowFraction(t(s, dir, "documents"), "doc_id", "text",
        n = 3, minDf = 2)
        .orderBy("doc_id")
    }),

    // Span-level duplicated-passage removal (Lee et al. cut): 3-token
    // windows occurring >= 2 times corpus-wide are removed from every
    // doc except the globally-first occurrence (keepOne).
    "q59_remove_dup_spans" -> ((s, dir) => {
      Dedup.removeDuplicatedSpans(t(s, dir, "documents"), "doc_id", "text",
        n = 3, minDf = 2, keepOne = true)
        .orderBy("doc_id")
    }),

    // Connected components on a deliberately DEEP graph: chain edges
    // (k, k-3) make three components of depth n/3 — far beyond any
    // fixed-round label propagation, trivial for the convergence-
    // checked star algorithm. The oracle is the closed-form ground
    // truth (components are residue classes mod 3, rep = class min).
    "q60_connected_components" -> ((s, dir) => {
      val pairs = t(s, dir, "customer").where(col("c_custkey") > 3)
        .select(col("c_custkey").as("id_a"), (col("c_custkey") - 3).as("id_b"))
      Dedup.canonicalizeCc(pairs).orderBy("id")
    }),

    // Graph-clustered SemDeDup: the q19 exact pair set collapsed to
    // connected components by the star algorithm; the oracle computes
    // the SAME components via a recursive-CTE transitive closure — a
    // genuine cross-algorithm check (epsilon-GRAPH components, the
    // transitive alternative to q61's one-shot marking).
    "q66_semdedup_graph" -> ((s, dir) => {
      val pairs = Dedup.embeddingPairs(t(s, dir, "embeddings"),
        "vec_id", "embedding", tau = 0.45, planes = 0)
      Dedup.canonicalizeCc(pairs.select("id_a", "id_b")).orderBy("id")
    }),

    // Cross-corpus decontamination: training docs (doc_id%10!=0) that
    // MinHash-band with any eval doc (doc_id%10==0) at est_jaccard >=
    // tau — md5-portable mode, replayed key-for-key by the oracle.
    "q58_decontam_pairs" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      val evalDocs = docs.where(col("doc_id") % 10 === 0)
      val train = docs.where(col("doc_id") % 10 =!= 0)
      Dedup.minhashLshPairsAcross(train, "doc_id", "text",
        evalDocs, "doc_id", "text",
        shingleN = 3, bands = 16, rowsPerBand = 4, tau = 0.35,
        portableHash = true)
        .orderBy("id_l", "id_r")
    }),

    // The persisted-fingerprint incremental-dedup lifecycle under the
    // gate: build the store from one corpus slice, APPEND a second
    // slice, then probe a batch against the combined history — the
    // on-disk build-once/probe-many analog of q58's in-memory
    // cross-corpus pairs (same banding semantics, so the oracle is the
    // same replay with an even/odd split).
    "q82_minhash_store" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      val tmp = java.nio.file.Files.createTempDirectory("graft_mh_store").toString
      graft.operators.MinhashStore.write(
        docs.where(col("doc_id") % 4 === 0), "doc_id", "text", tmp,
        shingleN = 3, bands = 16, rowsPerBand = 4, portableHash = true)
      graft.operators.MinhashStore.append(
        docs.where(col("doc_id") % 4 === 2), "doc_id", "text", tmp)
      graft.operators.MinhashStore.probe(s, tmp,
        docs.where(col("doc_id") % 2 === 1), "doc_id", "text",
        tau = 0.35, maxBucket = 1000)
        .orderBy("id_new", "id_store")
    }),

    // The store MAINTENANCE lifecycle under the gate: build + append as
    // q82, then DELETE a slice (tombstones) and COMPACT (rewrite minus
    // tombstones, bucket_counts recounted in one shard) before probing.
    // The oracle is q82's replay with the deleted ids filtered out of
    // the banded universe — pairs AND hot-bucket accounting must both
    // behave as if the deleted docs were never ingested.
    "q97_store_compacted" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      val tmp = java.nio.file.Files.createTempDirectory("graft_mh_cmp").toString
      graft.operators.MinhashStore.write(
        docs.where(col("doc_id") % 4 === 0), "doc_id", "text", tmp,
        shingleN = 3, bands = 16, rowsPerBand = 4, portableHash = true)
      graft.operators.MinhashStore.append(
        docs.where(col("doc_id") % 4 === 2), "doc_id", "text", tmp)
      graft.operators.MinhashStore.delete(
        docs.where(col("doc_id") % 8 === 0).select("doc_id"), "doc_id", tmp)
      graft.operators.MinhashStore.compactStore(s, tmp)
      graft.operators.MinhashStore.probe(s, tmp,
        docs.where(col("doc_id") % 2 === 1), "doc_id", "text",
        tau = 0.35, maxBucket = 1000)
        .orderBy("id_new", "id_store")
    }),

    // The EMBEDDING-store maintenance lifecycle under the gate — q97's
    // posture at the semantic layer: build the IVF-backed store from
    // the even embeddings, DELETE a slice (tombstones filter the cells
    // scan BEFORE top-k ranking — post-ranking masking would let the
    // deleted doc eat the k=1 slot and hide a live near-dup), COMPACT
    // (cells rewritten minus tombstones, pruning layout preserved),
    // then probe the odd embeddings against the surviving history.
    "q113_store_semantic" -> ((s, dir) => {
      val emb = t(s, dir, "embeddings")
      val tmp = java.nio.file.Files.createTempDirectory("graft_emb_life").toString
      graft.operators.EmbeddingStore.write(
        emb.where(col("vec_id") % 2 === 0), "vec_id", "embedding", tmp,
        c = 16, portableHash = true)
      graft.operators.EmbeddingStore.delete(
        emb.where(col("vec_id") % 4 === 0).select("vec_id"), "vec_id", tmp)
      graft.operators.EmbeddingStore.compactStore(s, tmp)
      graft.operators.EmbeddingStore.probe(s, tmp,
        emb.where(col("vec_id") % 2 === 1), "vec_id", "embedding",
        tau = 0.3, nprobe = 4)
        .orderBy("id_new")
    }),

    // Centroid-drift metric under the gate: centroids frozen on the
    // even half, the odd half APPENDED against them, drift reported in
    // exact integer micro-units (per-row round at 1e-6, integer DIV
    // means) — the number a rebuild scheduler compares across runs, so
    // it must be bit-stable across engines.
    "q114_centroid_drift" -> ((s, dir) => {
      val emb = t(s, dir, "embeddings")
      val tmp = java.nio.file.Files.createTempDirectory("graft_emb_drift").toString
      graft.operators.EmbeddingStore.write(
        emb.where(col("vec_id") % 2 === 0), "vec_id", "embedding", tmp,
        c = 16, portableHash = true)
      graft.operators.EmbeddingStore.append(
        emb.where(col("vec_id") % 2 === 1), "vec_id", "embedding", tmp)
      graft.operators.EmbeddingStore.drift(s, tmp)
    }),

    // WARC ingest round-trip under the gate: corpus → WARC shards
    // (Content-Length-framed response records, metadata as headers) →
    // record walk back (plus a planted garbage shard that must vanish)
    // → per-(lang, source) fidelity digest vs the original parquet —
    // the q83 JSONL posture for the web-crawl wire format.
    "q105_warc_roundtrip" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      val tmp = java.nio.file.Files.createTempDirectory("graft_warc").toString
      def warcCols(df: org.apache.spark.sql.DataFrame) = df.select(
        concat(lit("http://graft.test/doc/"), col("doc_id")).as("uri"),
        col("text").cast("binary").as("payload"),
        map(lit("X-Lang"), col("lang"),
            lit("X-Source"), col("source")).as("hdrs"))
      // evens travel as plain .warc; odds through GZIPPED shards (the
      // Common Crawl .warc.gz form — each shard one gzip stream here;
      // the concatenated-member case is spec'd in SourcesSpec). The
      // digest only matches the parquet oracle if BOTH paths decode.
      graft.sources.Warc.write(
        warcCols(docs.where(col("doc_id") % 2 === 0)),
        tmp, "uri", "payload", Some("hdrs"))
      val gzTmp = java.nio.file.Files.createTempDirectory("graft_warc_gz").toString
      graft.sources.Warc.write(
        warcCols(docs.where(col("doc_id") % 2 === 1)),
        gzTmp, "uri", "payload", Some("hdrs"))
      new java.io.File(gzTmp).listFiles().filter(_.getName.endsWith(".warc"))
        .foreach { f =>
          val out = new java.io.FileOutputStream(s"$tmp/gz-${f.getName}.gz")
          val gz = new java.util.zip.GZIPOutputStream(out)
          gz.write(java.nio.file.Files.readAllBytes(f.toPath))
          gz.close()
        }
      java.nio.file.Files.writeString(
        java.nio.file.Paths.get(s"$tmp/zz-corrupt.warc"),
        "garbage, not a warc record\r\n\r\n")
      graft.sources.Warc.read(s, tmp).toDF()
        .where(col("record_type") === "response")
        .select(col("headers")("X-Lang").as("lang"),
          col("headers")("X-Source").as("source"),
          col("payload").cast("string").as("text"))
        .groupBy("lang", "source")
        .agg(count(lit(1)).as("n_docs"),
          sum(length(col("text"))).cast("long").as("sum_chars"),
          min(md5(col("text").cast("binary"))).as("min_md5"))
        .orderBy("lang", "source")
    }),

    // JSONL ingest round-trip under the gate: corpus → JSONL shards →
    // tolerant read (a deliberately malformed shard is planted — its
    // lines must vanish, not fail the job or skew the aggregate) →
    // per-(lang, source) fidelity digest. The md5-of-text MIN proves
    // the text column survived JSON escaping byte-for-byte; the oracle
    // reads the original parquet, so any round-trip corruption breaks
    // the value compare.
    "q83_jsonl_roundtrip" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      val tmp = java.nio.file.Files.createTempDirectory("graft_jsonl").toString
      graft.sources.Jsonl.write(docs, tmp)
      java.nio.file.Files.writeString(
        java.nio.file.Paths.get(s"$tmp/zz-corrupt.json"),
        "{not json at all\n\"also broken\n{\"doc_id\": }\n")
      graft.sources.Jsonl.readClean(s, tmp, docs.schema)
        .groupBy("lang", "source")
        .agg(count(lit(1)).as("n_docs"),
          sum("n_chars").as("sum_chars"),
          min(md5(col("text").cast("binary"))).as("min_md5"))
        .orderBy("lang", "source")
    }),

    // Scalar quantization end-to-end: per-dim min/max train (an exact,
    // order-insensitive aggregate — the oracle RECOMPUTES it in SQL,
    // no driver literals), uint8 encode, asymmetric dequantized-dot
    // search. Every float step is an ordered fold, replayed
    // step-for-step by the oracle.
    "q84_sq8_adc" -> ((s, dir) => {
      val emb = t(s, dir, "embeddings")
      val (mins, maxs) = Pq.sq8Train(emb, "embedding", 64)
      val enc = Pq.sq8Encode(emb, "vec_id", "embedding", mins, maxs)
      Pq.searchSq8(enc, emb.where(col("vec_id") % 100 === 0),
        "vec_id", "embedding", mins, maxs, k = 5)
        .orderBy("query_id", "rank")
    }),

    // Binary quantization end-to-end (round 9 — the 32× endpoint of
    // the float→SQ8→PQ/RQ→BQ family): per-dim midpoint thresholds
    // from the exact min/max aggregate (oracle recomputes in SQL),
    // sign-bit packing into 63-bit-portable words, symmetric Hamming
    // top-k. Distances are pure INTEGER popcounts — no float fold at
    // all, the only quantizer whose search replays bit-exactly by
    // construction.
    "q300_bq_hamming" -> ((s, dir) => {
      val emb = t(s, dir, "embeddings")
      val (mins, maxs) = Pq.sq8Train(emb, "embedding", 64)
      val th = Pq.bqThresholds(mins, maxs)
      val enc = Pq.bqEncode(emb, "vec_id", "embedding", th)
      Pq.searchBq(enc, emb.where(col("vec_id") % 100 === 0),
        "vec_id", "embedding", th, k = 5)
        .orderBy("query_id", "rank")
    }),

    // Winnowing fingerprints (round 9 — Schleimer et al., SIGMOD
    // 2003): per-window rightmost-min gram hashes, the local
    // fingerprinting guarantee (any shared ≥ w+k−1 substring shares a
    // fingerprint). One in-row projection, zero shuffle; md5-portable
    // hash mode so the oracle replays every pick.
    "q301_winnowing" -> ((s, dir) => {
      operators.TextAnalytics.winnowFingerprints(
        t(s, dir, "documents").where(col("doc_id") % 5 === 0),
        "doc_id", "text", k = 8, w = 8, portableHash = true)
        .orderBy("id", "pos")
    }),

    // Exact ROC AUC per stratum from score CELLS (Mann–Whitney
    // identity, ties half-credit): label = order finished, score =
    // total price in kilodollar buckets (the cell-join pre-bucket
    // contract, enforced).
    "q302_roc_auc" -> ((s, dir) => {
      operators.Stats.rocAuc(
        t(s, dir, "orders").select(col("o_orderpriority").as("pri"),
          (col("o_orderstatus") === "F").as("y"),
          round(col("o_totalprice") / 1000).cast("long").as("s1k")),
        "pri", "y", "s1k")
        .orderBy("stratum")
    }),

    // Cohen's κ: labeled lang vs the q23 marker-word prediction — the
    // chance-corrected one-number summary of q227's confusion matrix.
    "q303_cohens_kappa" -> ((s, dir) => {
      operators.Stats.cohensKappa(
        t(s, dir, "documents").select(col("lang"),
          Text.langId(col("text")).as("pred")),
        "lang", "pred")
    }),

    // Log-rank test between q228's two parity cohorts over the same
    // censored view→purchase durations — "do the two cohorts' KM
    // curves differ?", closed from the identical subjects frame.
    "q304_log_rank" -> ((s, dir) => {
      val ev = events(s, dir)
      val a = ev.where(col("event_type") === "view")
        .groupBy(col("user_id").as("u"))
        .agg(min(unix_micros(col("ts"))).as("ta"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val conv = ev.where(col("event_type") === "purchase")
        .select(col("user_id").as("u"), unix_micros(col("ts")).as("tb"))
        .join(a, Seq("u")).where(col("tb") > col("ta"))
        .groupBy("u", "ta").agg(min("tb").as("tb"))
        .select(col("u"), expr("(tb - ta) div 1000000L").as("t"),
          lit(true).as("e"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val last = ev.groupBy(col("user_id").as("u"))
        .agg(max(unix_micros(col("ts"))).as("tmax"))
      val cens = a.join(last, Seq("u"))
        .join(conv.select(col("u"), lit(1).as("__c")), Seq("u"), "left_anti")
        .select(col("u"), expr("(tmax - ta) div 1000000L").as("t"),
          lit(false).as("e"))
      val subjects = conv.unionByName(cens)
        .withColumn("cohort", concat(lit("c"), pmod(col("u"), lit(2L))))
      operators.Stats.logRank(subjects, "cohort", "c0", "c1", "t", "e")
    }),

    // Quantile normalization: every priority's price distribution
    // mapped rank-for-rank onto the 1-URGENT reference (Bolstad et
    // al. 2003) — all-integer ranks + ceiling division, engine-exact.
    "q305_quantile_norm" -> ((s, dir) => {
      operators.Sampling.quantileNormalize(
        t(s, dir, "orders").where(col("o_orderkey") % 7 === 0)
          .select(col("o_orderkey").as("oid"),
            col("o_orderpriority").as("pri"),
            round(col("o_totalprice") * 100).cast("long").as("cents")),
        "oid", "pri", "cents", "1-URGENT")
        .orderBy("id")
    }),

    // Mantel–Haenszel pooled odds ratio: urgent-priority exposure vs
    // order-finished outcome, stratified by order year — the
    // Simpson's-paradox guard before trusting the marginal OR.
    "q306_mantel_haenszel" -> ((s, dir) => {
      operators.Stats.mantelHaenszel(
        t(s, dir, "orders").select(year(col("o_orderdate")).as("yr"),
          col("o_orderpriority").isin("1-URGENT", "2-HIGH").as("x"),
          (col("o_orderstatus") === "F").as("y")),
        "yr", "x", "y")
    }),

    // Fleiss' κ over three deterministic raters per document (labeled
    // lang, the q23 prediction, the q23 prediction on the first 120
    // chars) — fixed r = 3 enforced; the multi-rater agreement score
    // annotation pipelines gate on.
    "q307_fleiss_kappa" -> ((s, dir) => {
      val d0 = t(s, dir, "documents")
      val raters = d0.select(col("doc_id"), col("lang").as("cat"))
        .unionByName(d0.select(col("doc_id"),
          Text.langId(col("text")).as("cat")))
        .unionByName(d0.select(col("doc_id"),
          Text.langId(substring(col("text"), 1, 120)).as("cat")))
      operators.Stats.fleissKappa(raters, "doc_id", "cat")
    }),

    // Newman modularity of a fixed mod-7 partition over the q283 link
    // graph — exact integer numerator Q·4m² = Σ(4m·e_c − d_c²), one
    // double close. The quality score a community assignment is
    // graded with before anyone trusts it.
    "q308_modularity" -> ((s, dir) => {
      val docs = t(s, dir, "documents").select(col("doc_id"))
      val edges = docs.select(col("doc_id").as("src"),
          pmod(col("doc_id"), lit(97)).as("dst"))
        .union(docs.select(col("doc_id").as("src"),
          pmod(col("doc_id"), lit(31)).as("dst")))
      val nodes = edges.select(col("src").as("node"))
        .union(edges.select(col("dst").as("node"))).distinct()
        .select(col("node"), pmod(col("node"), lit(7)).as("label"))
      operators.Graph.modularity(edges, "src", "dst", nodes,
        "node", "label")
    }),

    // Degree assortativity (Newman 2002) of the same graph — Pearson
    // over symmetrized edge-endpoint degrees, exact DECIMAL moments.
    "q309_assortativity" -> ((s, dir) => {
      val docs = t(s, dir, "documents").select(col("doc_id"))
      val edges = docs.select(col("doc_id").as("src"),
          pmod(col("doc_id"), lit(97)).as("dst"))
        .union(docs.select(col("doc_id").as("src"),
          pmod(col("doc_id"), lit(31)).as("dst")))
      operators.Graph.assortativity(edges, "src", "dst")
    }),

    // Friedman test: order volume per (year block, priority
    // treatment) — doubled in-row block ranks, exact integer moments,
    // the repeated-measures companion of q273's Kruskal–Wallis.
    "q310_friedman" -> ((s, dir) => {
      val cells = t(s, dir, "orders")
        .groupBy(year(col("o_orderdate")).as("yr"),
          col("o_orderpriority").as("pri"))
        .agg(count(lit(1)).cast("long").as("v"))
      operators.Stats.friedman(cells, "yr", "pri", "v")
    }),

    // Von Neumann randomness ratio of each event type's daily counts
    // — the "is a trend fit even warranted?" screen before q158.
    "q311_von_neumann" -> ((s, dir) => {
      operators.TimeSeries.vonNeumannRatio(events(s, dir),
        "event_type", "ts").orderBy("key")
    }),

    // Dunning G² collocations — the significance-weighted companion
    // of q142's PMI (PMI over-ranks rare pairs; G² weighs evidence).
    "q312_llr_collocations" -> ((s, dir) => {
      operators.TextAnalytics.llrCollocations(
        t(s, dir, "documents"), "text", minCount = 5, k = 40)
    }),

    // Jaro–Winkler record-linkage scorer as a codegen'd Catalyst
    // expression with DuckDB-parity semantics (probed: window
    // ⌊max/2⌋−1, boost only when j > 0.7, either-empty → 0) — the
    // oracle replays it with the engine's own jaro_winkler_similarity.
    "q313_jaro_winkler" -> ((s, dir) => {
      val dirty = concat(substring(col("c_name"), 1, 10),
        reverse(substring(col("c_name"), 11, 4)),
        substring(col("c_name"), 15, 100))
      t(s, dir, "customer").select(col("c_custkey"),
          round(graft.plans.native.jaroWinkler(col("c_name"), dirty), 6)
            .as("jw"))
        .orderBy("c_custkey")
    }),

    // First-order partial correlation per return flag: price ~ qty
    // controlling for discount — the continuous confounder screen
    // beside q306's categorical Mantel–Haenszel.
    "q314_partial_corr" -> ((s, dir) => {
      operators.Stats.partialCorrByKey(
        t(s, dir, "lineitem").select(col("l_returnflag").as("rf"),
          col("l_quantity").cast("long").as("qty"),
          round(col("l_extendedprice")).cast("long").as("price"),
          round(col("l_discount") * 10000).cast("long").as("disc_bp")),
        "rf", "qty", "price", "disc_bp")
        .orderBy("key")
    }),

    // Wald–Wolfowitz runs test per event type: do high and low days
    // cluster? — the sign-based randomness screen beside q311's
    // magnitude-based von Neumann ratio.
    "q315_runs_test" -> ((s, dir) => {
      operators.TimeSeries.runsTest(events(s, dir), "event_type", "ts")
        .orderBy("key")
    }),

    // Cronbach's α across three deterministic per-document "items"
    // (char count, token count, uppercase count) — the reliability
    // score beside q307's Fleiss κ.
    "q316_cronbach_alpha" -> ((s, dir) => {
      val d0 = t(s, dir, "documents")
      val items = d0.select(col("doc_id"), lit("chars").as("item"),
          length(col("text")).cast("long").as("v"))
        .unionByName(d0.select(col("doc_id"), lit("toks").as("item"),
          Text.tokenCount(col("text")).cast("long").as("v")))
        .unionByName(d0.select(col("doc_id"), lit("upper").as("item"),
          length(regexp_replace(col("text"), "[^A-Z]", ""))
            .cast("long").as("v")))
      operators.Stats.cronbachAlpha(items, "doc_id", "item", "v")
    }),

    // Global clustering coefficient (transitivity) of the q163
    // co-purchase projection — 3·triangles/wedges, integers
    // end-to-end.
    "q317_clustering_coeff" -> ((s, dir) => {
      val lp = t(s, dir, "lineitem")
        .where(col("l_partkey") % 10 === 0)
        .select(col("l_orderkey").as("o"), col("l_partkey").as("p")).distinct()
      val e = lp.join(lp.select(col("o"), col("p").as("p2")), Seq("o"))
        .where(col("p") < col("p2"))
        .select(col("p").as("src"), col("p2").as("dst"))
      operators.Graph.clusteringCoeff(e, "src", "dst")
    }),

    // Sorted-neighborhood blocking composed with the q313 JW scorer:
    // window pairs filtered at τ = 0.95 — the classic merge-purge
    // candidate path with the name-linkage verifier.
    "q318_jw_linkage" -> ((s, dir) => {
      operators.Dedup.sortedNeighborhoodPairs(
        t(s, dir, "customer"), "c_custkey", col("c_name"), w = 5)
        .withColumn("jw", round(graft.plans.native.jaroWinkler(
          col("key_a"), col("key_b")), 6))
        .where(col("jw") >= 0.95)
        .select(col("id_a"), col("id_b"), col("jw"))
        .orderBy("id_a", "id_b")
    }),

    // Murphy decomposition of the binned Brier score — calibration
    // (REL), discrimination (RES), base rate (UNC) in one row; the
    // quantitative summary over q193's reliability bins.
    "q319_brier_decomposition" -> ((s, dir) => {
      operators.Stats.brierDecomposition(
        t(s, dir, "orders").select(
          least(lit(999L), floor(col("o_totalprice") / 300).cast("long"))
            .as("score_milli"),
          (col("o_orderstatus") === "F").as("y")),
        "score_milli", "y", bins = 10, loMilli = 0L, hiMilli = 1000L)
    }),

    // Theil's U — the normalized, asymmetric association readout
    // over q199's MI cells: what fraction of the true lang's
    // uncertainty does the q23 prediction remove?
    "q320_theil_u" -> ((s, dir) => {
      operators.KeyChecks.theilU(
        t(s, dir, "documents").select(col("lang"),
          Text.langId(col("text")).as("pred")),
        "lang", "pred")
    }),

    // Krippendorff's α with VARIABLE rater counts (rater 3 missing
    // on every 4th doc) — the agreement stat Cohen/Fleiss can't do.
    "q321_krippendorff" -> ((s, dir) => {
      val d0 = t(s, dir, "documents")
      val raters = d0.select(col("doc_id"), col("lang").as("cat"))
        .unionByName(d0.select(col("doc_id"),
          Text.langId(col("text")).as("cat")))
        .unionByName(d0.where(col("doc_id") % 4 =!= 0)
          .select(col("doc_id"),
            Text.langId(substring(col("text"), 1, 120)).as("cat")))
      operators.Stats.krippendorffAlpha(raters, "doc_id", "cat")
    }),

    // Lin's concordance correlation per market segment: account
    // balances vs a deterministically shifted copy — Pearson r
    // penalized by the location/scale shift it deliberately carries.
    "q322_lin_ccc" -> ((s, dir) => {
      operators.Stats.linCcc(
        t(s, dir, "customer").select(col("c_mktsegment").as("seg"),
          round(col("c_acctbal") * 100).cast("long").as("x"),
          (round(col("c_acctbal") * 100).cast("long")
            + pmod(col("c_custkey"), lit(200)) - lit(100)).as("y")),
        "seg", "x", "y")
        .orderBy("key")
    }),

    // Hellinger distance between finished and open orders' price
    // distributions per priority — the bounded symmetric drift
    // measure beside q170's KS and q247's JS.
    "q323_hellinger" -> ((s, dir) => {
      operators.Stats.hellingerByStratum(
        t(s, dir, "orders").select(col("o_orderpriority").as("pri"),
          col("o_orderstatus").as("st"),
          floor(col("o_totalprice") / 1000).cast("long").as("v1k")),
        "pri", "st", "F", "O", "v1k")
        .orderBy("stratum")
    }),

    // Population stability index on the same cells — the industry
    // drift score with the documented add-one smoothing convention.
    "q324_psi" -> ((s, dir) => {
      operators.Stats.psiByStratum(
        t(s, dir, "orders").select(col("o_orderpriority").as("pri"),
          col("o_orderstatus").as("st"),
          floor(col("o_totalprice") / 1000).cast("long").as("v1k")),
        "pri", "st", "F", "O", "v1k")
        .orderBy("stratum")
    }),

    // Graph beam search (NSW single-layer, Malkov & Yashunin 2018):
    // the q65 kNN graph navigated from the deterministic min-id
    // entry, 2 hops × beam 4 → top 3 — the ANN family's graph-walk
    // member; every hop unrolled as an oracle CTE.
    "q325_graph_search" -> ((s, dir) => {
      val emb = t(s, dir, "embeddings")
      val g = Knn.knnGraph(emb, "vec_id", "embedding", k = 3, c = 16,
        nprobe = 2, portableHash = true)
      Knn.searchGraph(g, emb, "vec_id", "embedding",
        emb.where(col("vec_id") % 100 === 0), "vec_id", "embedding",
        beam = 4, hops = 2, k = 3)
        .orderBy("query_id", "rank")
    }),

    // The persisted kNN-graph lifecycle (round 10 — the last index
    // family to gain a build-once/probe-many store): graph over the
    // base 90%, written bucketed; the held-out 10% NSW-inserted (each
    // new node beam-searches the pre-append graph for its k out-
    // neighbors, reverse links added, touched sources re-trimmed to
    // k); then a multi-seed beam search over the appended store. The
    // oracle replays build, insert beam, re-trim, entry maintenance,
    // and search beam as one CTE chain.
    "q326_graph_index" -> ((s, dir) => {
      val emb = t(s, dir, "embeddings")
      val tmp = java.nio.file.Files
        .createTempDirectory("graft_graphidx_gate").toString
      Knn.writeGraphIndex(emb.where(col("vec_id") % 10 =!= 7),
        "vec_id", "embedding", tmp, k = 3, c = 16, nprobe = 2,
        buckets = 8, portableHash = true)
      Knn.appendGraphIndex(emb.where(col("vec_id") % 10 === 7),
        "vec_id", "embedding", tmp, beam = 4, hops = 2)
      Knn.searchGraphIndex(s, tmp, emb.where(col("vec_id") % 100 === 0),
        "vec_id", "embedding", beam = 4, hops = 2, k = 3)
        .orderBy("query_id", "rank")
    }),

    // BPE tokenizer training under the gate: 8 merge rounds over the
    // corpus word-frequency table. The oracle unrolls the SAME
    // argmax + string-replace rounds as CTEs — an iterative trainer
    // replayed exactly, round for round (the driver loop is the Spark
    // side's only non-SQL element).
    "q85_bpe_train" -> ((s, dir) => {
      import s.implicits._
      graft.operators.Bpe.train(t(s, dir, "documents"), "text", numMerges = 8)
        .toDF("step", "lhs", "rhs", "merged", "freq")
        .orderBy("step")
    }),

    // BYTE-LEVEL BPE training (round 10 — the GPT-2 form production
    // tokenizers ship): words start from UTF-8 bytes remapped through
    // the fixed bytes_to_unicode bijection, so multibyte characters
    // decompose and no input is ever OOV. Same 8 merge rounds; the
    // oracle re-derives the byte alphabet with hex()+strpos parsing
    // and the CASE remap, then replays the identical rounds.
    "q327_bpe_bytes" -> ((s, dir) => {
      import s.implicits._
      graft.operators.Bpe.train(t(s, dir, "documents"), "text",
          numMerges = 8, byteLevel = true)
        .toDF("step", "lhs", "rhs", "merged", "freq")
        .orderBy("step")
    }),

    // Train-then-tokenize end-to-end: the corpus tokenized with its
    // OWN learned merges; per-doc subword vs word counts. The oracle
    // joins the unrolled trainer's final vocabulary back to each doc.
    "q92_bpe_tokens" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      val merges = graft.operators.Bpe.train(docs, "text", numMerges = 8)
        .map(m => (m._2, m._3))
      docs.where(col("doc_id") < 100)
        .select(col("doc_id"),
          size(graft.operators.Bpe.encodeColumn(col("text"), merges))
            .cast("long").as("n_bpe_tokens"),
          Text.tokenCount(col("text")).cast("long").as("n_words"))
        .orderBy("doc_id")
    }),

    // The PRODUCTION tokenizer path under the gate: the same
    // train-then-tokenize as q92 but through the rank-map kernel
    // (Bpe.encodeColumnFast / BpeTokens) instead of the per-merge
    // unrolled replaces — the form that carries a 30k-merge vocabulary.
    // Same oracle family, different doc slice; a kernel/unrolled
    // divergence on any word breaks the value compare.
    "q98_bpe_kernel" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      val merges = graft.operators.Bpe.train(docs, "text", numMerges = 8)
        .map(m => (m._2, m._3))
      docs.where(col("doc_id") % 7 === 3)
        .select(col("doc_id"),
          size(graft.operators.Bpe.encodeColumnFast(col("text"), merges))
            .cast("long").as("n_bpe_tokens"),
          Text.tokenCount(col("text")).cast("long").as("n_words"))
        .orderBy("doc_id")
    }),

    // Paragraph dedup + reassembly. The corpus has no multi-paragraph
    // docs, so the gate synthesizes them: every doc gets a second
    // paragraph — its decade-anchor's text — so each anchor paragraph
    // recurs 11× and only the globally-first copy (the anchor doc's
    // OWN first paragraph) survives.
    "q86_dedup_paragraphs" -> ((s, dir) => {
      val docs = t(s, dir, "documents").select(col("doc_id"), col("text"))
      val anchors = docs.select(col("doc_id").as("aid"), col("text").as("atext"))
      val pdocs = docs
        .withColumn("aid", col("doc_id") - pmod(col("doc_id"), lit(10)))
        .join(anchors, Seq("aid"))
        .select(col("doc_id").as("pid"),
          concat(col("text"), lit("\n\n"), col("atext")).as("text"))
      Dedup.dedupParagraphs(pdocs, "pid", "text").orderBy("pid")
    }),

    // Canonical-URL dedup: four synthesized crawl variants of each
    // logical page (tracking params / http + trailing slash / HTTPS
    // shouting + :443 + fragment / bare) must collapse per page key.
    "q87_url_dedup" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      val host = concat(lit("site"), pmod(col("doc_id"), lit(20)), lit(".example.com"))
      val path = concat(lit("/page/"), pmod(col("doc_id"), lit(50)))
      val url = when(pmod(col("doc_id"), lit(4)) === 0,
          concat(lit("https://www."), host, path, lit("/?utm_source=x&ref=y")))
        .when(pmod(col("doc_id"), lit(4)) === 1,
          concat(lit("http://"), host, path, lit("/")))
        .when(pmod(col("doc_id"), lit(4)) === 2,
          upper(concat(lit("https://"), host, lit(":443"), path)))
        .otherwise(concat(host, path, lit("#frag")))
      TextAnalytics.dedupByUrl(
        docs.select(col("doc_id"), url.as("url")), "doc_id", "url")
        .orderBy("url_canon")
    }),

    // Compaction binning: exclusive-cumsum-div-target over (size DESC,
    // id) — the documents table stands in as the file manifest (one
    // row per file, metadata-scale; Layout.compact drives the same
    // rule against real directories in ScalaTest).
    "q88_compaction_plan" -> ((s, dir) => {
      operators.Layout.packBySize(
        t(s, dir, "documents").select(col("doc_id"), col("n_chars")),
        "doc_id", "n_chars", targetBytes = 4000L)
        .orderBy("doc_id")
    }),

    // The IVF+SQ8 lifecycle under the gate: bottom-k centroids, exact
    // min/max ranges, cell-partitioned uint8 codes on disk, then the
    // pruned codes-only ADC probe + shortlist + exact re-rank — q75's
    // scaffold with the closed-form SQ8 "codebook".
    "q90_ivfsq8_persisted" -> ((s, dir) => {
      val emb = t(s, dir, "embeddings")
      val tmp = java.nio.file.Files.createTempDirectory("graft_ivfsq8_gate").toString
      Pq.writeIvfSq8Index(emb, "vec_id", "embedding", tmp,
        c = 16, dim = 64, portableHash = true)
      Pq.searchIvfSq8(s, tmp, emb.where(col("vec_id") % 100 === 0),
        "vec_id", "embedding", k = 5, nprobe = 4, shortlist = 50)
        .select("query_id", "neighbor_id", "sim", "rank")
        .orderBy("query_id", "rank")
    }),

    // ANALYZE-style one-pass column profile (nulls synthesized as in
    // q14 so n_null is non-trivial); min/max rendered as strings over
    // engine-portable column types.
    "q89_analyze_table" -> ((s, dir) => {
      val src = t(s, dir, "customer").select(
        col("c_custkey"),
        when(col("c_custkey") % 5 === 0, lit(null)).otherwise(col("c_name")).as("c_name"),
        col("c_mktsegment"), col("c_nationkey"))
      KeyChecks.analyze(src,
        Seq("c_custkey", "c_name", "c_mktsegment", "c_nationkey"))
        .orderBy("col_name")
    }),

    "q19_embedding_dedup" -> ((s, dir) => {
      Dedup.embeddingPairs(t(s, dir, "embeddings"), "vec_id", "embedding",
        tau = 0.45, planes = 0)
        .orderBy("id_a", "id_b")
    }),

    // The scale path: hyperplane-LSH buckets first, cosine verify inside
    // buckets only — the shape that survives 100 TB (q19 is the recall
    // baseline). Two OR-amplified tables; the oracle replays the same
    // 2×8 seeded hyperplanes.
    "q45_embedding_lsh" -> ((s, dir) => {
      Dedup.embeddingPairs(t(s, dir, "embeddings"), "vec_id", "embedding",
        tau = 0.45, planes = 8, dim = 64, seed = 7L, tables = 2)
        .orderBy("id_a", "id_b")
    }),

    // SemDeDup: IVF-cluster the embedding space, pair ONLY within a
    // cluster, mark dup iff a smaller-id cluster-mate has cosine >=
    // tau. Portable centroid hash so the oracle replays the pick,
    // the NearestCell assignment, the maxCell QUALIFY and the
    // epsilon-ball marking key-for-key.
    "q61_semantic_dedup" -> ((s, dir) => {
      Dedup.semanticDedup(t(s, dir, "embeddings"), "vec_id", "embedding",
        tau = 0.45, c = 16, maxCell = 1000, portableHash = true)
        .orderBy("id")
    }),

    // --- similarity search -------------------------------------------------
    "q20_knn_bruteforce" -> ((s, dir) => {
      val emb = t(s, dir, "embeddings")
      val queries = emb.where(col("vec_id") % 100 === 0)
      Knn.bruteForce(emb, "vec_id", "embedding", queries, "vec_id", "embedding", k = 5)
        .select("query_id", "neighbor_id", "sim", "rank")
        .orderBy("query_id", "rank")
    }),

    // Oracle-replayable IVF: portable centroid hash, no Lloyd rounds —
    // centroid pick, cell assignment, probing and top-k all verified
    // value-exact in DuckDB. The k-means-refined path is q46.
    "q21_knn_ivf" -> ((s, dir) => {
      val emb = t(s, dir, "embeddings")
      val queries = emb.where(col("vec_id") % 100 === 0)
      Knn.ivf(emb, "vec_id", "embedding", queries, "vec_id", "embedding",
        k = 5, c = 16, nprobe = 4, refineIters = 0, portableHash = true)
        .select("query_id", "neighbor_id", "sim", "rank")
        .orderBy("query_id", "rank")
    }),

    // Corpus-wide kNN graph: every embedding is a query; per-row cell
    // probe (in-row struct sort over the collected centroids), cell
    // join co-keyed — never a corpus broadcast.
    "q65_knn_graph" -> ((s, dir) => {
      Knn.knnGraph(t(s, dir, "embeddings"), "vec_id", "embedding",
        k = 3, c = 16, nprobe = 2, portableHash = true)
        .select("query_id", "neighbor_id", "sim", "rank")
        .orderBy("query_id", "rank")
    }),

    // The SQL surface under the gate: the injected functions answer a
    // pure-SQL query (registration path + kernel semantics together).
    "q73_sql_surface" -> ((s, dir) => {
      GraftExtensions.register(s)
      t(s, dir, "embeddings").createOrReplaceTempView("g_emb")
      t(s, dir, "documents").createOrReplaceTempView("g_docs")
      s.sql("""
        SELECT d.doc_id,
               size(word_shingles(d.text, 3)) AS n_shingles,
               ROUND(cosine_sim(e.embedding, e.embedding), 6) AS self_sim
        FROM g_docs d JOIN g_emb e ON d.doc_id = e.vec_id
        ORDER BY d.doc_id""")
    }),

    // The persisted-index lifecycle under the gate: build the
    // cell-partitioned IVF index on disk, then answer through the
    // directory-pruned probe path — results must equal the in-memory
    // IVF (q21's oracle verbatim).
    "q72_ivf_persisted" -> ((s, dir) => {
      val emb = t(s, dir, "embeddings")
      val tmp = java.nio.file.Files.createTempDirectory("graft_ivf_gate").toString
      Knn.writeIvfIndex(emb, "vec_id", "embedding", tmp, c = 16, portableHash = true)
      Knn.searchIvf(s, tmp, emb.where(col("vec_id") % 100 === 0),
        "vec_id", "embedding", k = 5, nprobe = 4)
        .select("query_id", "neighbor_id", "sim", "rank")
        .orderBy("query_id", "rank")
    }),

    // The WHOLE on-disk IVF+PQ lifecycle under the gate: data-sampled
    // codebooks (bottom-k md5 — deterministic and SQL-replayable),
    // portable centroid pick, cell-partitioned build, then the
    // codes-only ADC probe + shortlist + exact re-rank.
    "q75_ivfpq_persisted" -> ((s, dir) => {
      val emb = t(s, dir, "embeddings")
      val tmp = java.nio.file.Files.createTempDirectory("graft_ivfpq_gate").toString
      Pq.writeIvfPqIndex(emb, "vec_id", "embedding", tmp,
        c = 16, m = 8, k = 16, dim = 64, portableHash = true)
      Pq.searchIvfPq(s, tmp, emb.where(col("vec_id") % 100 === 0),
        "vec_id", "embedding", k = 5, nprobe = 4, shortlist = 50)
        .select("query_id", "neighbor_id", "sim", "rank")
        .orderBy("query_id", "rank")
    }),

    // The on-disk IVF+RQ twin of q75: level-1 books from the bottom-32
    // md5 rows' first half, level-2 books the HOLDOUT half's residuals
    // vs their level-1 argmin — all closed-form from data, replayed in
    // SQL; probe through interleaved two-level ADC + re-rank.
    "q76_ivfrq_persisted" -> ((s, dir) => {
      val emb = t(s, dir, "embeddings")
      val tmp = java.nio.file.Files.createTempDirectory("graft_ivfrq_gate").toString
      Pq.writeIvfRqIndex(emb, "vec_id", "embedding", tmp,
        c = 16, m = 8, k = 16, dim = 64, portableHash = true)
      Pq.searchIvfRq(s, tmp, emb.where(col("vec_id") % 100 === 0),
        "vec_id", "embedding", k = 5, nprobe = 4, shortlist = 50)
        .select("query_id", "neighbor_id", "sim", "rank")
        .orderBy("query_id", "rank")
    }),

    // K-means-refined IVF, oracle mode: one Lloyd round with the
    // ordered-fold per-cell mean (bit-identical to DuckDB's
    // list_reduce over id-sorted members). The production parallel
    // aggregator path stays spec-covered in KnnSpec.
    "q46_knn_ivf_refined" -> ((s, dir) => {
      val emb = t(s, dir, "embeddings")
      val queries = emb.where(col("vec_id") % 100 === 0)
      Knn.ivf(emb, "vec_id", "embedding", queries, "vec_id", "embedding",
        k = 5, c = 16, nprobe = 4, refineIters = 1,
        portableHash = true, dim = 64)
        .select("query_id", "neighbor_id", "sim", "rank")
        .orderBy("query_id", "rank")
    }),

    // PQ gate query: seeded gaussian codebooks inlined as literals in
    // BOTH engines (the q45 hyperplane trick — encode/ADC/re-rank
    // correctness doesn't depend on codebook quality, and the
    // data-sampled production training stays spec-covered in PqSpec).
    // Exercises Pq.encode (argmin-L2 codes) + Pq.search (ADC table
    // lookup, bounded-TopK shortlist, exact cosine re-rank).
    "q51_pq_adc" -> ((s, dir) => {
      val emb = t(s, dir, "embeddings")
      val books = pqBooks(m = 8, k = 16, subDim = 8, seed = 13L)
      val queries = emb.where(col("vec_id") % 100 === 0)
      val encoded = Pq.encode(emb, "vec_id", "embedding", books)
      Pq.search(encoded, queries, "vec_id", "embedding", books,
        k = 5, shortlist = 50)
        .select("query_id", "neighbor_id", "sim", "rank")
        .orderBy("query_id", "rank")
    }),

    // Residual-quantization gate query (round-4 twin of q51): seeded
    // two-level codebooks inlined as literals in BOTH engines; exercises
    // Pq.encodeResidual (interleaved level-1 argmin + residual argmin
    // codes) and Pq.searchResidual (interleaved dot tables through the
    // same AdcScore kernel, bounded-TopK shortlist, exact re-rank). The
    // data-trained residual path stays spec-covered in PqSpec.
    "q53_rq_adc" -> ((s, dir) => {
      val emb = t(s, dir, "embeddings")
      val b1 = pqBooks(m = 8, k = 16, subDim = 8, seed = 13L)
      val b2 = pqBooks(m = 8, k = 16, subDim = 8, seed = 29L)
      val queries = emb.where(col("vec_id") % 100 === 0)
      val encoded = Pq.encodeResidual(emb, "vec_id", "embedding", b1, b2)
      Pq.searchResidual(encoded, queries, "vec_id", "embedding", b1, b2,
        k = 5, shortlist = 50)
        .select("query_id", "neighbor_id", "sim", "rank")
        .orderBy("query_id", "rank")
    }),

    // One ordered-fold Lloyd round over the md5-sampled codebooks —
    // the DuckDB-replayable twin of trainCodebooksKmeans (whose
    // parallel VectorAvgAggregator cannot be fp-replayed; it stays
    // spec-covered by the distortion-decrease spec). Output is the
    // refined codebook components themselves, flat (s, code, d, mu).
    "q55_pq_kmeans_ordered" -> ((s, dir) => {
      val emb = t(s, dir, "embeddings")
      val books = Pq.trainCodebooks(emb, "vec_id", "embedding",
        m = 8, k = 16, dim = 64)
      Pq.refineCodebooksOrdered(emb, "vec_id", "embedding", books)
        .orderBy("s", "code", "d")
    }),

    // Effective-dated range join (AsOfJoin.rangeJoin): orders matched
    // to the epoch interval [start, end) containing their date; NULL
    // end = open-ended, customers %3==0 carry no intervals (left-join
    // null path). The dimension side is broadcast-scale by design.
    "q52_range_join" -> ((s, dir) => {
      import s.implicits._
      val orders = t(s, dir, "orders")
        .withColumn("o_date", to_date(col("o_orderdate")))
      val epochs = t(s, dir, "customer")
        .where(col("c_custkey") % 3 =!= 0)
        .select(col("c_custkey"))
        .crossJoin(Seq(("1995-01-01", "1998-01-01", "early"),
            ("1998-01-01", null, "late"))
          .toDF("s", "e", "epoch")
          .select(to_date(col("s")).as("start_date"),
            to_date(col("e")).as("end_date"), col("epoch")))
      operators.AsOfJoin.rangeJoin(orders, "o_custkey", "o_date",
        epochs, "c_custkey", "start_date", "end_date")
        .select("o_orderkey", "o_custkey", "o_date", "epoch")
        .orderBy("o_orderkey")
    }),

    // Items.definitionsAt end-to-end: effective-dated item metadata
    // (item_details-shaped dimension, non-overlapping epochs per item,
    // one item with no definitions → left-join null path) resolved for
    // each fact date through the broadcast range join. The dimension is
    // a literal here because the reference ships it as package data the
    // sandbox cannot carry (SURVEY known gap #1); the operator under
    // test is the full definitionsAt path.
    "q56_item_definitions" -> ((s, dir) => {
      import s.implicits._
      val facts = t(s, dir, "orders").select(
        col("o_orderkey"),
        concat(lit("RCON"), (pmod(col("o_orderkey"), lit(4)) + 2170).cast("string"))
          .as("item"),
        to_date(col("o_orderdate")).as("fact_date"))
      val details = Seq(
        ("RCON2170", "1992-01-01", "1996-01-01", "FFIEC 031", "RCON", "total assets (v1)"),
        ("RCON2170", "1996-01-01", null, "FFIEC 041", "RCON", "total assets (v2)"),
        ("RCON2171", "1994-06-30", "1997-06-30", "FFIEC 031", "RCON", "cash (v1)"),
        ("RCON2171", "1997-06-30", null, "FFIEC 041", "RCON", "cash (v2)"),
        ("RCON2172", "1995-03-31", null, "FFIEC 041", "RCON", "securities"))
        .toDF("item", "s", "e", "reporting_form", "itemtype", "description")
        .select(col("item"), to_date(col("s")).as("start_date"),
          to_date(col("e")).as("end_date"), col("reporting_form"),
          col("itemtype"), col("description"))
      meta.Items.definitionsAt(facts, "item", "fact_date", details)
        // both sides carry `item` (facts key + dimension key); keep the
        // fact side — it is non-null on the unmatched left-join path
        .select(col("o_orderkey"), facts("item").as("item"), col("fact_date"),
          col("reporting_form"), col("itemtype"), col("description"))
        .orderBy("o_orderkey")
    }),

    // SCD2 history builder: collapse the per-(customer, date) order
    // status series into effective-dated versions — the operator that
    // BUILDS tables like q56's item_details dimension from raw
    // periodic observations. Snapshot attr is MAX(status) per day
    // (deterministic); the oracle replays lag-change/running-version/
    // lead-close with the same null-safe change test.
    "q80_scd2_history" -> ((s, dir) => {
      val snap = t(s, dir, "orders")
        .groupBy(col("o_custkey"), col("o_orderdate"))
        .agg(max(col("o_orderstatus")).as("status"))
      operators.AsOfJoin.scd2(snap, Seq("o_custkey"), "o_orderdate", Seq("status"))
        .orderBy("o_custkey", "valid_from")
    }),

    // Z-order (Morton) clustering key: the multi-dimensional layout
    // column zorderWrite ranges/sorts on so parquet min/max stats
    // prune scans filtering on ANY of the interleaved columns. Pure
    // bit arithmetic, exact in any engine.
    "q81_zorder_key" -> ((s, dir) => {
      t(s, dir, "orders").select(col("o_orderkey"),
        operators.Layout.zValue(
          Seq(col("o_custkey"), col("o_orderkey")), bits = 16).as("z"))
        .orderBy("o_orderkey")
    }),

    // --- text analysis -----------------------------------------------------
    "q22_token_count" -> ((s, dir) => {
      t(s, dir, "documents").select(
        col("doc_id"),
        Text.tokenCount(col("text")).as("n_tokens"),
        length(col("text")).as("n_chars_m"))
        .orderBy("doc_id")
    }),

    "q23_lang_id" -> ((s, dir) => {
      t(s, dir, "documents").select(
        col("doc_id"), Text.langId(col("text")).as("lang_pred"))
        .orderBy("doc_id")
    }),

    "q24_quality_score" -> ((s, dir) => {
      t(s, dir, "documents").select(
        col("doc_id"), Text.qualityScore(col("text")).as("quality"))
        .orderBy("doc_id")
    }),

    "q25_fingerprint" -> ((s, dir) => {
      t(s, dir, "documents").select(
        col("doc_id"), Text.fingerprint(col("text")).as("fp"))
        .orderBy("doc_id")
    }),

    // --- scan / union / metadata -------------------------------------------
    "q26_union_by_name" -> ((s, dir) => {
      val orders = t(s, dir, "orders")
      val a = orders.where(col("o_orderkey") % 2 === 0)
        .select("o_orderkey", "o_totalprice")
      val b = orders.where(col("o_orderkey") % 2 === 1)
        .select("o_orderkey", "o_orderstatus")
      Scan.unionFramesByName(Seq(a, b)).orderBy("o_orderkey")
    }),

    "q27_item_schedules" -> ((s, dir) => {
      import s.implicits._
      val li = LongPivot.colsOfType(t(s, dir, "lineitem"), DoubleType,
        Seq("l_orderkey", "l_linenumber"))
      val or = LongPivot.colsOfType(t(s, dir, "orders"), DoubleType,
        Seq("o_orderkey"))
      val scheduleItems =
        (li.map(("lineitem", _)) ++ or.map(("orders", _)))
          .toDF("schedule", "item")
      // schedules is serialized to a comma-joined string so the driver's
      // comparator (which sorts/hashes cell values) sees a scalar column.
      LongPivot.itemSchedules(scheduleItems)
        .select(col("item"), concat_ws(",", col("schedules")).as("schedules"))
        .orderBy("item")
    }),

    "q28_xbrl_extract" -> ((s, dir) => {
      import s.implicits._
      val xml = t(s, dir, "orders").select(
        col("o_orderkey"),
        concat(
          lit("""<xbrl xmlns:cc="http://www.ffiec.gov/xbrl"><cc:RCFD2170 contextRef="rc_"""),
          col("o_orderkey"), lit("""_1998-12-31" unitRef="USD" decimals="0">"""),
          col("o_custkey"), lit("</cc:RCFD2170></xbrl>")).as("xml"))
        .as[(Long, String)]
      xml.flatMap { case (_, doc) => XbrlZip.parseXbrl(doc) }
        .toDF()
        .select(col("IDRSSD").as("idrssd"), col("date").as("report_date"),
          col("schedule"), col("item"), col("unitRef").as("unit_ref"),
          col("decimals"), col("value"), col("n_attrs"))
        .orderBy("idrssd")
    }),

    "q29_tz_convert" -> ((s, dir) => {
      val ev = events(s, dir).select(
        col("event_id"),
        date_format(col("ts"), "yyyy-MM-dd'T'HH:mm:ss").as("ts_str"))
      ev.select(col("event_id"),
          unix_timestamp(to_utc_timestamp(
            to_timestamp(col("ts_str"), "yyyy-MM-dd'T'HH:mm:ss"), "-05:00")).as("utc_epoch"))
        .orderBy("event_id")
    }),

    // --- events / streaming twins ------------------------------------------
    "q30_event_windows" -> ((s, dir) => {
      events(s, dir)
        .groupBy(date_trunc("hour", col("ts")).as("w"), col("event_type"))
        .agg(count(lit(1)).as("n_events"), decSum(col("value")).as("sum_value"))
        .select(unix_timestamp(col("w")).as("window_epoch"),
          col("event_type"), col("n_events"), col("sum_value"))
        .orderBy("window_epoch", "event_type")
    }),

    "q31_sessionize" -> ((s, dir) => {
      Sessions.sessionizeBatch(events(s, dir), gapSeconds = 1800)
        .select(col("user_id"), col("session_seq"),
          col("session_start").cast("long").as("start_epoch"),
          col("session_end").cast("long").as("end_epoch"),
          col("n_events"), col("sum_value"))
        .orderBy("user_id", "session_seq")
    }),

    // --- corpus analytics --------------------------------------------------
    "q32_redact_pii" -> ((s, dir) => {
      val synth = t(s, dir, "documents").select(
        col("doc_id"),
        concat(substring(col("text"), 1, 20),
          lit(" contact user"), col("doc_id"),
          lit("@mail.example.com or call 555-"),
          lpad(pmod(col("doc_id"), lit(10000)).cast("string"), 4, "0")).as("raw"))
      synth.select(col("doc_id"),
          TextAnalytics.redactPii(col("raw")).as("redacted"))
        .orderBy("doc_id")
    }),

    "q33_top_terms" -> ((s, dir) => {
      TextAnalytics.topTerms(t(s, dir, "documents"), "text", 20)
    }),

    "q34_bigram_counts" -> ((s, dir) => {
      TextAnalytics.bigramCounts(t(s, dir, "documents"), "text", minCount = 5)
        .orderBy("bigram")
    }),

    "q35_contamination" -> ((s, dir) => {
      TextAnalytics.contamination(t(s, dir, "documents"), "doc_id", "text",
        Seq("key agg", "batch window", "spark", "customer query"))
        .orderBy("doc_id", "needle")
    }),

    "q47_repetition" -> ((s, dir) => {
      t(s, dir, "documents").select(col("doc_id"),
        round(TextAnalytics.repetitionRatio(col("text")), 6).as("rep_ratio"))
        .orderBy("doc_id")
    }),

    "q48_domain_stats" -> ((s, dir) => {
      val synth = t(s, dir, "documents").select(col("doc_id"),
        concat(col("text"),
          lit(" see https://site"), pmod(col("doc_id"), lit(20)),
          lit(".example.com/p/"), col("doc_id"),
          lit(" and http://mirror"), pmod(col("doc_id"), lit(7)),
          lit(".example.org/x")).as("raw"))
      TextAnalytics.domainStats(synth, "doc_id", "raw").orderBy("domain")
    }),

    "q49_ngram_contamination" -> ((s, dir) => {
      TextAnalytics.ngramOverlap(t(s, dir, "documents"), "doc_id", "text",
        Seq("key agg", "batch window", "customer query", "slow scan", "fast merge"),
        n = 2)
        .orderBy("doc_id")
    }),

    // The million-shingle decontamination path: the needle set is a
    // DATAFRAME (here: every distinct bigram of the doc_id%50==0
    // "benchmark" subset), broadcast once; the corpus makes ONE pass
    // (scan → broadcast semi-probe → per-doc aggregate). Same output
    // contract as q49's literal-needle form.
    "q54_ngram_overlap_large" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      val needles = docs.where(col("doc_id") % 50 === 0)
        .select(explode(
          array_distinct(graft.plans.native.wordShingles(col("text"), 2)))
          .as("shingle"))
      TextAnalytics.ngramOverlapLarge(docs, "doc_id", "text", needles, n = 2)
        .orderBy("doc_id")
    }),

    "q50_weighted_mixture" -> ((s, dir) => {
      operators.Sampling.weightedMixture(
        t(s, dir, "documents").select("doc_id", "source"), "doc_id", "source",
        weights = Map("src0" -> 0.0, "src1" -> 0.25, "src2" -> 0.5),
        defaultWeight = 0.75)
        .orderBy("doc_id")
    }),

    "q37_stratified_sample" -> ((s, dir) => {
      operators.Sampling.stratifiedHead(
        t(s, dir, "documents").select("doc_id", "source"), "source", "doc_id", n = 5)
        .orderBy("source", "doc_id")
    }),

    "q38_salted_agg" -> ((s, dir) => {
      operators.Sampling.saltedAgg(events(s, dir), "event_type", "value", salts = 16)
        .orderBy("event_type")
    }),

    "q39_quantiles" -> ((s, dir) => {
      operators.Sampling.quantiles(
        t(s, dir, "documents").select(col("n_chars").cast("double").as("n_chars")),
        "n_chars", Seq(0.25, 0.5, 0.75, 0.95))
    }),

    "q40_dataset_split" -> ((s, dir) => {
      operators.Sampling.splitById(
        t(s, dir, "documents").select("doc_id", "source"), "doc_id",
        Seq("train" -> 80, "val" -> 10, "test" -> 10))
        .orderBy("doc_id")
    }),

    // Concat-and-chunk packing offsets: distributed two-phase prefix
    // sum (value-range buckets + tiny offset window) — never the
    // single-task global window the oracle is allowed to use.
    "q62_pack_chunks" -> ((s, dir) => {
      val d = t(s, dir, "documents").select(col("doc_id"),
        Text.tokenCount(col("text")).cast("long").as("n_tokens"))
      // Empty docs carry NULL chunk bounds; the driver's hasher coerces
      // nullable int64 to float64, so pin every column to non-null long
      // (-1 sentinel, mirrored in the oracle) for a dtype-stable hash.
      operators.Sampling.packChunks(d, "doc_id", "n_tokens", seqLen = 512)
        .select(col("id").cast("long").as("id"),
          col("n_tokens").cast("long").as("n_tokens"),
          col("offset").cast("long").as("offset"),
          coalesce(col("start_chunk").cast("long"), lit(-1L)).as("start_chunk"),
          coalesce(col("end_chunk").cast("long"), lit(-1L)).as("end_chunk"))
        .orderBy("id")
    }),

    // DSIR importance scores: eval-split docs (doc_id%10=0) are the
    // target distribution; every doc scores its hashed unigram+bigram
    // log-ratio mass in integer micro-nats (decimal-exact across
    // engines; the float weight is score_micro/1e6).
    "q63_dsir_scores" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      operators.TextAnalytics.dsirScores(docs,
        docs.where(col("doc_id") % 10 === 0), "doc_id", "text",
        buckets = 4096, portableHash = true)
        .orderBy("doc_id")
    }),

    // Packed-slice plan: q62's offsets exploded into one row per
    // (chunk, doc) token slice — the table a packed-sequence writer
    // consumes. Pure integer arithmetic, exact in any engine.
    "q67_pack_slices" -> ((s, dir) => {
      val d = t(s, dir, "documents").select(col("doc_id"),
        Text.tokenCount(col("text")).cast("long").as("n_tokens"))
      operators.Sampling.packSlices(d, "doc_id", "n_tokens", seqLen = 512)
        .orderBy("chunk_id", "id")
    }),

    // The skew-proof as-of through the SAME DuckDB ASOF ground truth
    // as q36 — gate-level proof the (key, epoch) two-phase merge is
    // observationally identical to the linear form.
    "q70_asof_bucketed" -> ((s, dir) => {
      val w = Window.partitionBy("o_custkey", "o_orderdate").orderBy("o_orderkey")
      val orders1 = t(s, dir, "orders")
        .withColumn("__rn", row_number().over(w)).where(col("__rn") === 1).drop("__rn")
        .select("o_custkey", "o_orderdate", "o_orderkey", "o_totalprice")
      val ev = events(s, dir).select("event_id", "user_id", "ts")
      operators.AsOfJoin.asOfBucketed(ev, "user_id", "ts", "event_id",
        orders1, "o_custkey", "o_orderdate", "o_orderkey", epochs = 8)
        .select(col("event_id"), col("user_id"), col("o_orderkey"),
          col("o_orderdate").cast("timestamp_ltz").cast("long").as("order_epoch"),
          col("o_totalprice"))
        .orderBy("event_id")
    }),

    // Flagship one-call curation end-to-end: minhash pairs → star
    // components → keep-one-representative, all replayed by the
    // oracle (q17's sketch chain + q66's recursive closure).
    "q71_dedup_corpus" -> ((s, dir) => {
      Dedup.dedupCorpus(t(s, dir, "documents"), "doc_id", "text",
        tau = 0.35, portableHash = true)
        .select("doc_id", "source").orderBy("doc_id")
    }),

    // Window-free latest-per-key: one-row-per-key-per-partition
    // partial aggregation, never a full-row window shuffle.
    "q77_keep_latest" -> ((s, dir) => {
      val o = t(s, dir, "orders")
        .select("o_custkey", "o_orderdate", "o_orderkey", "o_totalprice")
      operators.Sampling.keepLatest(o, "o_custkey", "o_orderdate", "o_orderkey")
        .select(col("o_custkey"), col("o_orderkey"), col("o_totalprice"))
        .orderBy("o_custkey")
    }),

    // Deterministic exact-size sample: bottom-100 md5 id hashes
    // (TakeOrdered — no sort shuffle), reproducible in any engine.
    "q78_sample_exact" -> ((s, dir) => {
      operators.Sampling.sampleExact(
        t(s, dir, "documents").select("doc_id", "source"),
        "doc_id", n = 100, portableHash = true)
        .orderBy("doc_id")
    }),

    // Cross-corpus embedding pairs (semantic decontamination / bitext
    // join): even ids vs odd ids through the shared hyperplane-LSH
    // bucketing, cosine-verified — q45's machinery split across two
    // tables.
    "q96_embedding_across" -> ((s, dir) => {
      val emb = t(s, dir, "embeddings")
      Dedup.embeddingPairsAcross(
        emb.where(col("vec_id") % 2 === 0), "vec_id", "embedding",
        emb.where(col("vec_id") % 2 === 1), "vec_id", "embedding",
        tau = 0.45, planes = 8, dim = 64, seed = 7L, tables = 2)
        .orderBy("id_l", "id_r")
    }),

    // JL random projection 64→8: each output dim an ordered-fold dot
    // with a seeded gaussian row, scaled 1/sqrt(8); quantized to exact
    // integer micros and comma-joined so the driver's comparator (which
    // lexsorts cell values — lists are unhashable there) sees a scalar
    // string column. The raw array form stays under ScalaTest.
    "q95_random_projection" -> ((s, dir) => {
      t(s, dir, "embeddings").where(col("vec_id") % 5 === 0)
        .select(col("vec_id"),
          concat_ws(",", transform(
            Vectors.randomProjection(col("embedding"), dim = 64, outDim = 8),
            x => round(round(x, 6) * 1e6).cast("long").cast("string")))
            .as("proj_micro"))
        .orderBy("vec_id")
    }),

    // Integer-arithmetic PageRank over a synthesized link graph (every
    // doc links its two mod-hubs): 3 iterative-join rounds in exact
    // micro-unit longs, replayed round-for-round by the oracle.
    "q94_pagerank" -> ((s, dir) => {
      val docs = t(s, dir, "documents").select(col("doc_id"))
      val edges = docs.select(col("doc_id").as("src"),
          pmod(col("doc_id"), lit(97)).as("dst"))
        .union(docs.select(col("doc_id").as("src"),
          pmod(col("doc_id"), lit(31)).as("dst")))
        .where(col("src") =!= col("dst"))
      operators.Graph.pagerankInt(edges, "src", "dst", iters = 3)
        .orderBy("node")
    }),

    // PageRank with DANGLING-MASS redistribution: the same mod-hub
    // graph (whose low hubs are genuine sinks — a hub below 31 has both
    // self-loops dropped, so it absorbs rank), 3 rounds, each round
    // adding floor(sinkMass/N) to every node inside the damped term.
    // The oracle unrolls the same rounds with the dangling CTE — exact
    // integer replay of an iterative algorithm WITH a global term.
    "q99_pagerank_dangling" -> ((s, dir) => {
      val docs = t(s, dir, "documents").select(col("doc_id"))
      val edges = docs.select(col("doc_id").as("src"),
          pmod(col("doc_id"), lit(97)).as("dst"))
        .union(docs.select(col("doc_id").as("src"),
          pmod(col("doc_id"), lit(31)).as("dst")))
        .where(col("src") =!= col("dst"))
      operators.Graph.pagerankInt(edges, "src", "dst", iters = 3,
        dangling = true)
        .orderBy("node")
    }),

    // Linear quality-classifier inference in exact integer micro-units:
    // four count features, caller-supplied weights, logit threshold —
    // the fastText-style filtering pass with a decision boundary that
    // replays bit-for-bit (no sigmoid, no floats anywhere).
    "q100_quality_classifier" -> ((s, dir) => {
      TextAnalytics.linearQualityScore(t(s, dir, "documents"),
        "doc_id", "text",
        wTokens = 40000L, wChars = -100L, wPunct = -50000L,
        wStopwords = 100000L, biasMicro = -3000000L)
        .orderBy("doc_id")
    }),

    // Quality-aware dedup: same minhash pairs + star components as q71,
    // but each cluster keeps its best member by (n_chars DESC, id ASC)
    // instead of the min id — production survivor selection. The oracle
    // extends q71's recursive closure with the same QUALIFY pick.
    "q101_dedup_keep_best" -> ((s, dir) => {
      Dedup.dedupCorpusKeepBest(t(s, dir, "documents"), "doc_id", "text",
        scoreCol = "n_chars", tau = 0.35, portableHash = true)
        .select("doc_id", "n_chars", "source").orderBy("doc_id")
    }),

    // Hashed token IDS end-to-end: train BPE on the corpus, tokenize a
    // slice through the rank-map kernel, map every subword to
    // pmod(md5hash, 4096) — the (array<int>) form models consume. The
    // oracle rebuilds each doc's ordered id sequence from the unrolled
    // vocabulary (per-word subword lists flattened in word order).
    "q102_bpe_hashed_ids" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      val merges = graft.operators.Bpe.train(docs, "text", numMerges = 8)
        .map(m => (m._2, m._3))
      // comma-joined for the driver's comparator (q27 precedent); the
      // array form is exercised under ScalaTest.
      docs.where(col("doc_id") % 9 === 4)
        .select(col("doc_id"),
          concat_ws(",", transform(
            graft.operators.Bpe.encodeHashedIds(col("text"), merges, 4096),
            x => x.cast("string"))).as("token_ids"))
        .orderBy("doc_id")
    }),

    // Deterministic training-order shuffle: the seeded md5 permutation
    // key, replayed exactly — the order a reader streams shuffled
    // shards in is an engine-independent function of (seed, id).
    "q103_shuffle_order" -> ((s, dir) => {
      t(s, dir, "documents").where(col("doc_id") % 5 === 2)
        .select(col("doc_id"),
          operators.Sampling.shuffleKey(col("doc_id"), seed = 7L).as("skey"))
        .orderBy("skey", "doc_id")
    }),

    // LSH tuning harness under the gate: three bandings measured
    // against exact-Jaccard ground truth — candidate/truth/hit counts
    // and precision/recall per config, every number replayed (the
    // S-curve, measured rather than assumed).
    "q112_lsh_grid" -> ((s, dir) => {
      Dedup.lshGridEval(t(s, dir, "documents"), "doc_id", "text",
        tau = 0.35, configs = Seq((16, 4), (4, 16), (32, 2)),
        portableHash = true)
        .orderBy("bands", "rows_per_band")
    }),

    // Grid → measure → PICK closed under the gate: the cheapest
    // banding whose measured recall meets 0.9 (min candidate volume);
    // the oracle re-ranks its own q112 replay the same way.
    "q118_lsh_pick" -> ((s, dir) => {
      Dedup.pickLshConfig(t(s, dir, "documents"), "doc_id", "text",
        tau = 0.35, configs = Seq((16, 4), (4, 16), (32, 2)),
        targetRecall = 0.9, portableHash = true)
    }),

    // Vocab TABLE artifact: stable contiguous ids — base chars in
    // UTF8-lexical order, then merge outputs by rank (first surface
    // form wins) — the embedding-matrix-row contract q102's hashing
    // trick can't give. The oracle rebuilds the identical table from
    // the unrolled trainer CTEs.
    "q115_bpe_vocab" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      val merges = graft.operators.Bpe.train(docs, "text", numMerges = 8)
        .map(m => (m._2, m._3))
      graft.operators.Bpe.vocabTable(docs, "text", merges)
        .orderBy("id")
    }),

    // Contiguous-id tokenization end-to-end: a doc slice encoded
    // through the vocab TABLE (ids = embedding rows); OOV is
    // impossible by construction (the slice ⊆ the training corpus),
    // so any -1 in the output is a real bug the value compare catches.
    "q116_bpe_vocab_ids" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      val merges = graft.operators.Bpe.train(docs, "text", numMerges = 8)
        .map(m => (m._2, m._3))
      val vocab = graft.operators.Bpe.vocabTable(docs, "text", merges)
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      // comma-joined for the driver's comparator (q27 precedent); the
      // array form is exercised under ScalaTest.
      docs.where(col("doc_id") % 9 === 5)
        .select(col("doc_id"),
          concat_ws(",", transform(
            graft.operators.Bpe.encodeIds(col("text"), merges, vocab),
            x => x.cast("string"))).as("token_ids"))
        .orderBy("doc_id")
    }),

    // Quality-ordered token budgets: each source's budget buys its
    // BEST tokens (score DESC, id) — score-range buckets from one
    // GK-quantile aggregate feed q107's two-phase prefix sum; the
    // oracle is the per-source single-window form that would
    // serialize each source at scale.
    "q117_token_budget_best" -> ((s, dir) => {
      val d = t(s, dir, "documents").select(col("doc_id"), col("source"),
        Text.tokenCount(col("text")).cast("long").as("n_tokens"),
        Text.qualityScore(col("text")).as("score"))
      operators.Sampling.sampleTokenBudgetBest(d, "doc_id", "source",
        "n_tokens", "score", Map("src0" -> 500L, "src1" -> 0L),
        defaultBudget = 700L)
        .orderBy("doc_id")
    }),

    // Asymmetric shingle CONTAINMENT (Broder's second resemblance
    // measure): |A∩B|/|A| — the truncated-mirror signal Jaccard
    // structurally misses; same inverted-index + df-cap plan as q16.
    "q119_containment" -> ((s, dir) => {
      Dedup.containmentPairs(t(s, dir, "documents"), "doc_id", "text",
        n = 3, tau = 0.5)
        .orderBy("id_a", "id_b")
    }),

    // C4's line/page heuristics value-exact: every predicate is a
    // plain string test (no regex), replayed verbatim in SQL.
    "q120_c4_clean" -> ((s, dir) => {
      operators.TextAnalytics.c4Clean(t(s, dir, "documents"), "doc_id", "text")
        .orderBy("doc_id")
    }),

    // HTML boilerplate strip: docs wrapped in a synthetic page
    // (style + script blocks, attributes, entities) must come back as
    // text — both engines run the IDENTICAL RE2-safe regex chain, so
    // the digest matches only if every stage agrees byte-for-byte.
    "q121_strip_html" -> ((s, dir) => {
      val html = concat(
        lit("<html><head><style>body{color:red}</style></head><body><p class=\"t\">"),
        col("text"),
        lit("</p><script>var x = 1 &amp;&amp; 2;</script> &lt;done&gt;</body></html>"))
      t(s, dir, "documents")
        .select(col("doc_id"),
          operators.TextAnalytics.stripHtml(html).as("clean"))
        .select(col("doc_id"),
          length(col("clean")).cast("long").as("n_clean"),
          md5(col("clean").cast("binary")).as("h_clean"))
        .orderBy("doc_id")
    }),

    // Gopher's rule set in exact integer micro-units: every metric is
    // integer arithmetic over plain string tests, replayed verbatim.
    "q122_gopher_rules" -> ((s, dir) => {
      operators.TextAnalytics.gopherFilter(t(s, dir, "documents"), "doc_id", "text")
        .orderBy("doc_id")
    }),

    // Sliding-window chunker: 32-token windows, stride 24 → 1-4
    // chunks per 10-99-word doc; windows stop at the doc end.
    "q123_chunk_docs" -> ((s, dir) => {
      operators.TextAnalytics.chunkDocs(t(s, dir, "documents"), "doc_id", "text",
        chunkTokens = 32, stride = 24)
        .orderBy("doc_id", "chunk_idx")
    }),

    // Mojibake repair: docs with doc_id%3=0 get a suffix exercising
    // EVERY entry of the cp1252 repair table; both engines run a
    // replace chain generated from the same table.
    "q124_fix_mojibake" -> ((s, dir) => {
      val bad = operators.TextAnalytics.mojibakeTable.map(_._1).mkString(" ")
      val in = when(col("doc_id") % 3 === 0, concat(col("text"), lit(" " + bad)))
        .otherwise(col("text"))
      t(s, dir, "documents")
        .select(col("doc_id"), in.as("txt"))
        .select(col("doc_id"),
          operators.TextAnalytics.mojibakeCount(col("txt")).as("n_bad"),
          operators.TextAnalytics.fixMojibake(col("txt")).as("clean"))
        .select(col("doc_id"), col("n_bad"),
          length(col("clean")).cast("long").as("len_clean"),
          md5(col("clean").cast("binary")).as("h_clean"))
        .orderBy("doc_id")
    }),

    // Temperature-scaled mixture weights (n^0.5 smoothing): sqrt is
    // IEEE-exact in both engines, the normalizing sum is an ordered
    // fold, and micro outputs go through floor — value-exact doubles.
    "q125_temperature_mix" -> ((s, dir) => {
      operators.Sampling.temperatureWeights(t(s, dir, "documents"), "source",
        budgetDocs = 300L)
        .orderBy("source")
    }),

    // Prototype pruning: drop the 30% most-central members of every
    // semantic cell (q61's cells); ranks replay exactly because the
    // sort key is round(cosine, 6) with id tiebreak in both engines.
    "q126_prototype_prune" -> ((s, dir) => {
      Dedup.prototypePrune(t(s, dir, "embeddings"), "vec_id", "embedding",
        c = 16, dropPermille = 300, portableHash = true)
        .orderBy("id")
    }),

    // HLL vocabulary sketch: per-source register table + estimate,
    // replayed register-for-register (md5 60-bit hash, bin()-length
    // ranks, ordered power-of-two harmonic fold); exact distinct
    // rides along so the ~1.04/sqrt(m) accuracy is visible in-row.
    "q127_hll_distinct" -> ((s, dir) => {
      val toks = t(s, dir, "documents")
        .select(col("source"), explode(Text.tokens(lower(col("text")))).as("tok"))
      val est = operators.TextAnalytics.hllEstimate(
        operators.TextAnalytics.hllRegisters(toks, "source", "tok", p = 10), p = 10)
      val exact = toks.groupBy(col("source").as("key"))
        .agg(count_distinct(col("tok")).as("n_exact"))
      est.join(exact, Seq("key"))
        .select(col("key").as("source"), col("n_regs"), col("est_floor"),
          col("n_exact"))
        .orderBy("source")
    }),

    // Scalable exact percentile rank: two-phase bucketed form must
    // equal the single-window ground truth rank-for-rank (heavy ties
    // from integer token counts exercise the id tiebreak).
    "q128_rank_normalize" -> ((s, dir) => {
      val scored = t(s, dir, "documents").select(col("doc_id"),
        Text.tokenCount(col("text")).cast("double").as("score"))
      operators.Sampling.rankNormalize(scored, "doc_id", "score", buckets = 16)
        .orderBy("doc_id")
    }),

    // Rank-blend ensemble: two incomparable signals normalized to
    // exact percentiles, weighted 0.75/0.25 (FP-exact weights).
    "q129_blend_ranks" -> ((s, dir) => {
      val scored = t(s, dir, "documents").select(col("doc_id"),
        Text.tokenCount(col("text")).cast("double").as("n_tok"),
        length(col("text")).cast("double").as("n_chars"))
      operators.Sampling.blendRanks(scored, "doc_id",
        Seq("n_tok" -> 0.75, "n_chars" -> 0.25), buckets = 16)
        .orderBy("doc_id")
    }),

    // Snapshot drift: today's simulated shard (rows dropped, names
    // nulled, a segment renamed) vs yesterday's — per-column deltas.
    "q130_stats_drift" -> ((s, dir) => {
      val cols = Seq("c_custkey", "c_name", "c_mktsegment", "c_nationkey")
      val a = t(s, dir, "customer").select(cols.map(col): _*)
      val b = t(s, dir, "customer").where(col("c_custkey") % 11 =!= 0)
        .select(col("c_custkey"),
          when(col("c_custkey") % 7 === 0, lit(null))
            .otherwise(col("c_name")).as("c_name"),
          when(col("c_mktsegment") === "BUILDING", lit("ZBUILDING"))
            .otherwise(col("c_mktsegment")).as("c_mktsegment"),
          col("c_nationkey"))
      operators.KeyChecks.statsDrift(a, b, cols).orderBy("col_name")
    }),

    // HLL store lifecycle: two shards written independently, then
    // compacted — the merged estimate must equal the single-pass
    // sketch over the whole corpus (the oracle recomputes exactly
    // that; merge associativity is what's being gated).
    "q131_hll_store" -> ((s, dir) => {
      val toks = t(s, dir, "documents")
        .select(col("doc_id"), col("source"),
          explode(Text.tokens(lower(col("text")))).as("tok"))
      val tmp = java.nio.file.Files.createTempDirectory("graft_hll").toString
      operators.HllStore.write(
        toks.where(col("doc_id") % 2 === 0), "source", "tok", tmp, p = 10)
      operators.HllStore.append(
        toks.where(col("doc_id") % 2 === 1), "source", "tok", tmp)
      operators.HllStore.compactStore(s, tmp)
      operators.HllStore.estimate(s, tmp)
        .select(col("key").as("source"), col("n_regs"), col("est_floor"))
        .orderBy("source")
    }),

    // CMS store lifecycle: two shards + compaction must equal the
    // single-pass sketch — counter linearity (cell-wise ADD) is the
    // thing gated; oracle is the q93 replay.
    "q132_cms_store" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      val tmp = java.nio.file.Files.createTempDirectory("graft_cms").toString
      operators.CmsStore.write(
        docs.where(col("doc_id") % 2 === 0), "text", tmp, d = 4, width = 512)
      operators.CmsStore.append(docs.where(col("doc_id") % 2 === 1), "text", tmp)
      operators.CmsStore.compactStore(s, tmp)
      operators.CmsStore.estimate(s, tmp,
        Seq("key", "agg", "table", "value", "spark", "window",
          "zzz_absent_term"))
        .orderBy("term")
    }),

    // Exact stratified split: per-source 80/10/10 with EXACT floor
    // boundaries (splitById's hash-Bernoulli sizes wobble ±sqrt n).
    "q133_split_stratified" -> ((s, dir) => {
      operators.Sampling.splitStratified(t(s, dir, "documents"), "doc_id",
        "source", Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1))
        .orderBy("doc_id")
    }),

    // Key-skew report: top-10 heaviest l_suppkey values with integer
    // micro shares — the measure-before-you-salt signal.
    "q134_key_skew" -> ((s, dir) => {
      operators.KeyChecks.keySkew(t(s, dir, "lineitem"), "l_suppkey", topK = 10)
        .orderBy("rank")
    }),

    // Robust median/MAD scaling in exact micro-units: med and MAD of
    // n_chars land on .0/.5 (integers in micro space), so the per-row
    // robust_micro is an exact integer DIV both engines replay.
    "q135_robust_scale" -> ((s, dir) => {
      operators.Sampling.robustScale(t(s, dir, "documents"), "doc_id", "n_chars")
        .orderBy("doc_id")
    }),

    // Span-level decontamination excision: trigram needles from the
    // doc_id%50==0 "benchmark" subset cut matching spans out of the
    // rest of the corpus; docs survive minus the leaked passages.
    "q136_excise_passages" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      Dedup.excisePassages(
        docs.where(col("doc_id") % 50 =!= 0), "doc_id", "text",
        docs.where(col("doc_id") % 50 === 0), "text", n = 3)
        .orderBy("doc_id")
    }),

    // Embedding-space contrast report: per-label ordered-fold
    // centroids (the q46 fp-determinism trick), then pairwise centroid
    // cosine over the 10-label metadata frame.
    "q137_label_contrast" -> ((s, dir) => {
      operators.Knn.centroidContrast(
        operators.Knn.groupCentroids(t(s, dir, "embeddings"),
          "vec_id", "embedding", "label", dim = 64, ordered = true))
        .orderBy("grp_a", "grp_b")
    }),

    // Portable Bloom decontamination: eval-slice bigrams fold into the
    // register-exact md5/double-hashing Bloom, train docs probe it in
    // one scan-shaped pass; the exact semi-join count rides along so
    // the gate also checks the no-false-negative direction (n_bloom >=
    // n_exact row by row). The filter is DELIBERATELY undersized
    // (2^12 bits vs the needle set's ~860·5 positions) so false
    // positives exist at sf0.01 (46 of them) — the gate then fails if
    // the probe is anything but this exact bit math (an exact join
    // would under-count n_bloom). Production sizing guidance lives in
    // the bloomBuild scaladoc.
    "q138_bloom_decontam" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      val mBits = 1 << 12
      val k = 5
      val needles = docs.where(col("doc_id") % 10 === 0)
        .select(explode(
          array_distinct(graft.plans.native.wordShingles(col("text"), 2)))
          .as("shingle"))
      val words = operators.TextAnalytics.bloomWords(
        operators.TextAnalytics.bloomBuild(needles, "shingle", mBits, k), mBits)
      val probes = docs.where(col("doc_id") % 10 =!= 0)
        .select(col("doc_id"),
          array_distinct(graft.plans.native.wordShingles(col("text"), 2)).as("sh"))
      val flagged = probes.select(col("doc_id"),
        size(col("sh")).cast("long").as("n_sh"),
        size(filter(col("sh"), sh => operators.TextAnalytics
          .bloomMightContain(sh, words, mBits, k))).cast("long").as("n_bloom"))
      val exact = probes.select(col("doc_id"), explode(col("sh")).as("shingle"))
        .join(broadcast(needles.distinct()), Seq("shingle"), "left_semi")
        .groupBy("doc_id").agg(count(lit(1)).as("n_exact"))
      flagged.join(exact, Seq("doc_id"), "left")
        .select(col("doc_id"), col("n_sh"), col("n_bloom"),
          coalesce(col("n_exact"), lit(0L)).as("n_exact"))
        .orderBy("doc_id")
    }),

    // TF-IDF keyword extraction: top-3 terms per doc by tf·idf with
    // integer micro-unit scores; the oracle replays the whole chain
    // (tf, df, the fixed-order ln, the window pick) from the raw text.
    "q139_tfidf_keywords" -> ((s, dir) => {
      operators.TextAnalytics.tfidfKeywords(
        t(s, dir, "documents"), "doc_id", "text", 3)
        .orderBy("doc_id", "rank")
    }),

    // Inverted-index lifecycle: build the bucket-partitioned postings
    // index, then the top-20 BM25 search must reproduce — through the
    // persisted denormalized (tf, dl, df) postings and the pruned
    // bucket read — exactly what DuckDB computes from the raw text.
    "q140_inverted_index" -> ((s, dir) => {
      val tmp = java.nio.file.Files.createTempDirectory("graft_inv").toString
      operators.InvertedIndex.write(
        t(s, dir, "documents"), "doc_id", "text", tmp, buckets = 16)
      operators.InvertedIndex.searchBm25(s, tmp,
        terms = Seq("spark", "join", "vector", "stream"), k = 20)
    }),

    // Record linkage on the customer table: prefix blocking, then
    // in-block Levenshtein <= 1 — integer metric, exact cross-engine.
    "q141_record_linkage" -> ((s, dir) => {
      operators.Dedup.linkRecords(t(s, dir, "customer"), "c_custkey",
        "c_name", substring(col("c_name"), 1, 16), maxDist = 1)
        .orderBy("id_a", "id_b")
    }),

    // PMI collocation mining: top-50 above-chance token pairs in
    // micro-nats; the oracle replays counts, the fixed-order ln, and
    // the deterministic (pmi desc, bigram asc) cut.
    "q142_pmi_collocations" -> ((s, dir) => {
      operators.TextAnalytics.pmiCollocations(
        t(s, dir, "documents"), "text", minCount = 5, k = 50)
    }),

    // Fellegi-Sunter linkage: customer vs a dirtied copy of itself
    // (segments nulled on %10, balances shifted on %7); every record
    // must find its twin as match/possible, neighbors score negative.
    "q144_linkage_score" -> ((s, dir) => {
      val cust = t(s, dir, "customer")
      val dirty = cust
        .withColumn("c_mktsegment", when(col("c_custkey") % 10 === 0,
          lit(null).cast("string")).otherwise(col("c_mktsegment")))
        .withColumn("c_acctbal", when(col("c_custkey") % 7 === 0,
          col("c_acctbal") + lit(1.0)).otherwise(col("c_acctbal")))
      operators.Dedup.linkScoreFs(cust, dirty, "c_custkey", "c_custkey",
        substring(col("c_name"), 1, 17), substring(col("c_name"), 1, 17),
        fields = fsFields, upperMicro = 12000000L, lowerMicro = 0L)
        .orderBy("id_a", "id_b")
    }),

    // Per-priority revenue trend: OLS slope over (day index, cents)
    // from exact integer moments.
    "q158_trend" -> ((s, dir) => {
      val sp = t(s, dir, "orders")
        .where(col("o_orderkey") % 50 === 0)
        .groupBy(col("o_orderpriority").as("grp"),
          to_date(col("o_orderdate")).as("d"))
        .agg(sum(round(col("o_totalprice") * 100).cast("long")).as("cents"))
      val d0 = sp.agg(min("d")).head().getDate(0)
      operators.TimeSeries.trendPerKey(
        sp.withColumn("x", datediff(col("d"), lit(d0))),
        "grp", "x", "cents")
        .orderBy("grp")
    }),

    // Rendezvous routing of customers onto 5 shards, md5 gate mode;
    // every per-key argmax must replay.
    "q157_rendezvous" -> ((s, dir) => {
      operators.Joins.rendezvousAssign(
        t(s, dir, "customer").select("c_custkey"),
        "c_custkey", Seq("s1", "s2", "s3", "s4", "s5"), portableHash = true)
        .orderBy("c_custkey")
    }),

    // Per-source weighted draw: 10 docs per source by n_chars mass.
    "q156_weighted_per_key" -> ((s, dir) => {
      operators.Sampling.sampleWeightedPerKey(
        t(s, dir, "documents").select("doc_id", "source", "n_chars"),
        "source", "doc_id", "n_chars", k = 10, seed = 7L)
        .select("source", "draw_rank", "doc_id", "n_chars", "priority_micro")
        .orderBy("source", "draw_rank")
    }),

    // Weighted sample: 100 docs drawn by n_chars mass, seeded-hash
    // deterministic; the oracle replays hash, uniform, and priority.
    "q155_weighted_sample" -> ((s, dir) => {
      operators.Sampling.sampleWeighted(
        t(s, dir, "documents").select("doc_id", "n_chars"),
        "doc_id", "n_chars", k = 100, seed = 7L)
        .orderBy("priority_micro", "doc_id")
    }),

    // Trailing z-score anomalies on the zero-filled grid: spikes
    // against a 14-day self-excluding baseline, |z| >= 3.
    "q154_rolling_anomaly" -> ((s, dir) => {
      val daily = t(s, dir, "orders")
        .where(col("o_orderkey") % 50 === 0)
        .groupBy(col("o_orderpriority").as("grp"),
          to_date(col("o_orderdate")).as("d"))
        .agg(sum(round(col("o_totalprice") * 100).cast("long")).as("cents"))
      val filled = operators.TimeSeries.gapFill(daily, "grp", "d", "cents",
        forward = false)
      operators.TimeSeries.anomalies(filled, "grp", "d", "cents",
        days = 14, zThresholdMicro = 3000000L, minPoints = 5)
        .orderBy("grp", "d")
    }),

    // 7-day trailing revenue over the zero-filled daily grid — the
    // rolling window rides the regular grid gapFill guarantees.
    "q152_rolling_window" -> ((s, dir) => {
      val daily = t(s, dir, "orders")
        .where(col("o_orderkey") % 50 === 0)
        .groupBy(col("o_orderpriority").as("grp"),
          to_date(col("o_orderdate")).as("d"))
        .agg(sum(round(col("o_totalprice") * 100).cast("long")).as("cents"))
      val filled = operators.TimeSeries.gapFill(daily, "grp", "d", "cents",
        forward = false)
      operators.TimeSeries.rollingSum(filled, "grp", "d", "cents", days = 7)
        .orderBy("grp", "d")
    }),

    // Ordered funnel over a 3-day slice: view -> click -> purchase,
    // each step strictly after the previous step's first touch.
    "q153_funnel" -> ((s, dir) => {
      operators.TimeSeries.funnel(
        events(s, dir).where(col("ts") < lit("2024-01-04").cast("timestamp")),
        "user_id", "ts", "event_type", Seq("view", "click", "purchase"))
        .orderBy("step")
    }),

    // Cohort retention triangle over the event stream: weekly
    // first-touch cohorts x activity-week offsets, distinct users.
    // The event_id >= user_id*300 filter staggers first touches so
    // the triangle has real off-diagonal mass at gate scale.
    "q151_cohort_retention" -> ((s, dir) => {
      operators.TimeSeries.cohortRetention(
        events(s, dir).where(col("event_id") >= col("user_id") * 300),
        "user_id", "ts")
        .select(unix_timestamp(col("cohort_week")).as("cohort_epoch"),
          col("offset_weeks"), col("n_users"))
        .orderBy("cohort_epoch", "offset_weeks")
    }),

    // Bloom-filtered semi-join: the runtime-filter technique made
    // explicit — result must equal the plain semi-join exactly.
    "q150_bloom_semijoin" -> ((s, dir) => {
      operators.Joins.bloomSemiJoin(
        t(s, dir, "lineitem"), "l_suppkey",
        t(s, dir, "supplier").where(col("s_suppkey") % 97 === 0), "s_suppkey")
        .select(col("l_orderkey"), col("l_linenumber").cast("long").as("l_linenumber"),
          col("l_suppkey"), col("l_quantity").cast("long").as("qty"),
          round(col("l_extendedprice") * 100).cast("long").as("cents"))
        .orderBy("l_orderkey", "l_linenumber", "l_suppkey", "qty", "cents")
    }),

    // Gap-fill: sparse daily revenue (2% of orders) per priority is
    // completed to the full day grid with forward-carried levels;
    // pre-first-observation days must stay NULL.
    "q149_gap_fill" -> ((s, dir) => {
      val daily = t(s, dir, "orders")
        .where(col("o_orderkey") % 50 === 0)
        .groupBy(col("o_orderpriority").as("grp"),
          to_date(col("o_orderdate")).as("d"))
        .agg(sum(round(col("o_totalprice") * 100).cast("long")).as("cents"))
      operators.TimeSeries.gapFill(daily, "grp", "d", "cents", forward = true)
        .orderBy("grp", "d")
    }),

    // Week-over-week deltas on the zero-filled daily order-count grid;
    // rows without a comparable prior period (first 7 grid days, or a
    // zero base) are filtered so every output column is a non-null
    // long (driver-comparator dtype contract).
    "q174_period_delta" -> ((s, dir) => {
      val daily = t(s, dir, "orders")
        .groupBy(col("o_orderpriority").as("grp"),
          to_date(col("o_orderdate")).as("d"))
        .agg(count(lit(1)).as("n"))
      val grid = operators.TimeSeries.gapFill(daily, "grp", "d", "n",
        forward = false)
      operators.TimeSeries.periodDelta(grid, "grp", "d", "n", lagDays = 7)
        .where(col("prev_value").isNotNull && col("prev_value") =!= 0L)
        .orderBy("grp", "d")
    }),

    // Cluster auto-labeling (c-TF-IDF): embeddings assign to cells via
    // the q21 kernel machinery, then each cluster's top-5 distinctive
    // terms; the oracle replays assignment AND labeling end-to-end.
    "q148_cluster_keywords" -> ((s, dir) => {
      val emb = t(s, dir, "embeddings")
      val docs = t(s, dir, "documents")
      val cents = Knn.sampleCentroids(emb, "vec_id", "embedding", 16,
        portableHash = true)
      val assigned = Knn.assignCells(emb, "vec_id", "embedding", cents)
        .select(col("id").as("doc_id"), col("cell"))
      operators.TextAnalytics.clusterKeywords(
        docs.join(assigned, Seq("doc_id")), "cell", "text", 5)
        .orderBy("cell", "rank")
    }),

    // Trigram-index substring search: build the bucket-partitioned
    // trigram postings, then the index-mediated lookup must equal
    // DuckDB's direct contains() scan doc-for-doc.
    "q147_trigram_search" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      val tmp = java.nio.file.Files.createTempDirectory("graft_trgm").toString
      operators.InvertedIndex.writeTrigram(docs, "doc_id", "text", tmp,
        buckets = 16)
      operators.InvertedIndex.searchSubstring(s, tmp, docs, "doc_id", "text",
        needle = "stream batch")
        .select(col("doc_id"), col("n_chars"))
        .orderBy("doc_id")
    }),

    // Equal-width histogram of order totals: 2-dp money scales at 100,
    // bin assignment is then pure integer arithmetic in both engines.
    "q145_histogram" -> ((s, dir) => {
      operators.KeyChecks.histogram(t(s, dir, "orders"), "o_totalprice",
        bins = 32, scale = 100L)
        .orderBy("bin")
    }),

    // FK orphans: orders pointing at a customer subset with a
    // residue class removed — every orphan group must surface.
    "q146_fk_orphans" -> ((s, dir) => {
      operators.KeyChecks.fkOrphans(
        t(s, dir, "orders"), "o_custkey",
        t(s, dir, "customer").where(col("c_custkey") % 9 =!= 4), "c_custkey")
        .orderBy("o_custkey")
    }),

    // Row-level snapshot diff: two snapshots derived from documents
    // (residue-class drops on each side + a planted text mutation);
    // the diff must classify every id added/removed/changed exactly.
    "q143_snapshot_diff" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      val old = docs.where(col("doc_id") % 11 =!= 3)
      val neu = docs.where(col("doc_id") % 13 =!= 5)
        .withColumn("text", when(col("doc_id") % 7 === 0,
          concat(col("text"), lit(" v2"))).otherwise(col("text")))
      operators.KeyChecks.snapshotDiff(old, neu, "doc_id",
        Seq("text", "source"))
        .orderBy("id")
    }),

    // One-call decontamination: q58's cross-corpus pairs as a REMOVAL —
    // train docs near-dup'ing any eval doc are anti-joined out; the
    // oracle replays the pairs then NOT-INs the leaked ids.
    "q110_decontaminate" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      Dedup.decontaminate(
        docs.where(col("doc_id") % 10 =!= 0), "doc_id", "text",
        docs.where(col("doc_id") % 10 === 0), "doc_id", "text",
        tau = 0.35, portableHash = true)
        .select("doc_id", "source").orderBy("doc_id")
    }),

    // Unicode NFC under the gate: a decomposed combining-sequence
    // marker (chr-built in BOTH engines) is appended to every doc and
    // normalized — length and digest match only if Spark's JDK NFC and
    // DuckDB's nfc_normalize agree glyph-for-glyph.
    "q111_nfc_normalize" -> ((s, dir) => {
      val marker = " e\u0301a\u030Ao\u0302" // decomposed é å ô (NFC → éåô)
      val norm = Text.normalizeNfc(concat(col("text"), lit(marker)))
      t(s, dir, "documents")
        .select(col("doc_id"),
          length(norm).cast("long").as("n_nfc"),
          md5(norm.cast("binary")).as("h_nfc"))
        .orderBy("doc_id")
    }),

    // Upsampling mixture: weights past 1.0 repeat docs (floor copies +
    // hash-chosen fractional extras) — the "2.5 epochs of src2" half
    // of pretraining mixtures a keep/drop filter can't express.
    "q106_upsample_mixture" -> ((s, dir) => {
      operators.Sampling.upsampleMixture(
        t(s, dir, "documents").select("doc_id", "source"),
        "doc_id", "source",
        Map("src0" -> 0.0, "src1" -> 0.5, "src2" -> 2.5, "src3" -> 3.0))
        .orderBy("doc_id", "copy")
    }),

    // Exact per-source token budgets: deterministic hash-order cut via
    // the two-phase prefix sum; the oracle is the single-window QUALIFY
    // form (which would serialize each source at scale).
    "q107_token_budget" -> ((s, dir) => {
      val d = t(s, dir, "documents").select(col("doc_id"), col("source"),
        Text.tokenCount(col("text")).cast("long").as("n_tokens"))
      operators.Sampling.sampleTokenBudget(d, "doc_id", "source",
        "n_tokens", Map("src0" -> 500L, "src1" -> 0L),
        defaultBudget = 1500L)
        .orderBy("doc_id")
    }),

    // Best-k-per-key curation cut ("5 longest docs per source") via
    // bounded map-side heaps — the oracle's QUALIFY window shuffles the
    // whole corpus; the aggregator ships ≤k rows per key per partition.
    "q108_top_per_key" -> ((s, dir) => {
      operators.Sampling.topKPerKey(
        t(s, dir, "documents").select("source", "doc_id", "n_chars"),
        "source", "doc_id", "n_chars", k = 5)
        .orderBy("source", "rank")
    }),

    // Curriculum staging: 4 difficulty bands by exact quartile
    // boundaries of n_chars, assignment a scan-side CASE over inlined
    // boundary literals (percentile ≡ quantile_cont — the q39 bridge).
    "q109_curriculum" -> ((s, dir) => {
      operators.Sampling.curriculumStages(
        t(s, dir, "documents").select("doc_id", "n_chars"),
        "n_chars", stages = 4, exact = true)
        .orderBy("doc_id")
    }),

    // Leakage-free split: near-dup docs (q71's components) land on the
    // same side because the split hashes the component REP, not the
    // doc — the eval-contamination guard a per-doc split lacks.
    "q104_split_leakage_free" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      val pairs = Dedup.minhashLshPairs(docs, "doc_id", "text",
        shingleN = 3, bands = 16, rowsPerBand = 4, tau = 0.35,
        portableHash = true)
      val labels = Dedup.canonicalizeCc(pairs)
      operators.Sampling.splitLeakageFree(docs.select("doc_id", "source"),
        "doc_id", labels,
        Seq(("train", 80), ("val", 10), ("test", 10)))
        .orderBy("doc_id")
    }),

    // Count-min sketch: fixed-RAM token-frequency estimation — build
    // the d×width sketch over the corpus, then point-estimate a fixed
    // probe list (including an absent term → 0 or pure collision
    // noise). Cell-for-cell md5 replay in the oracle.
    "q93_cms_estimate" -> ((s, dir) => {
      val sketch = TextAnalytics.countMinSketch(
        t(s, dir, "documents"), "text", d = 4, width = 512)
      TextAnalytics.cmsEstimate(sketch,
        Seq("key", "agg", "table", "value", "spark", "window",
          "zzz_absent_term"), d = 4, width = 512)
        .orderBy("term")
    }),

    // Per-key exact-size sampling: bottom-3 id-hashes per source via
    // map-side bounded heaps (the corpus never shuffles; the oracle's
    // QUALIFY-window formulation would).
    "q91_sample_per_key" -> ((s, dir) => {
      operators.Sampling.samplePerKey(
        t(s, dir, "documents").select("source", "doc_id"),
        "source", "doc_id", k = 3, portableHash = true)
        .orderBy("source", "doc_id")
    }),

    // Dataset-card mixture manifest: per-source docs/tokens/share.
    "q69_mixture_manifest" -> ((s, dir) => {
      val d = t(s, dir, "documents").select(col("source"),
        Text.tokenCount(col("text")).cast("long").as("n_tokens"))
      operators.Sampling.mixtureManifest(d, "source", "n_tokens")
        .orderBy("source")
    }),

    // End of the packing path: actual (chunk_id, tokens) training
    // sequences — every row exactly 512 tokens except the last. Tokens
    // are unit-separator-joined (words may contain commas) so the
    // driver's comparator sees a scalar string; array form in ScalaTest.
    "q68_pack_sequences" -> ((s, dir) => {
      operators.Sampling.packSequences(t(s, dir, "documents"),
        "doc_id", "text", seqLen = 512)
        .select(col("chunk_id"), concat_ws("\u001f", col("tokens")).as("tokens"))
        .orderBy("chunk_id")
    }),

    // Token-type entropy in micro-nats: distributional repetition
    // signal (complements q47's adjacency signal).
    "q74_token_entropy" -> ((s, dir) => {
      operators.TextAnalytics.tokenEntropy(t(s, dir, "documents"),
        "doc_id", "text")
        .orderBy("doc_id")
    }),

    // Bigram-LM log-probability (CCNet-style perplexity filter) in
    // micro-nats: the corpus self-scored under its own add-one-
    // smoothed bigram model; the oracle refits the identical model
    // in SQL and mirrors ln((c2 + 1.0) / (c1 + V)) exactly.
    "q79_lm_score" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      operators.TextAnalytics.lmScores(docs, docs, "doc_id", "text")
        .orderBy("doc_id")
    }),

    // BM25 topical relevance in integer micro-units (same decimal-
    // exact replay trick as q63): per-(doc,term) score rounded to
    // 1e-6 then summed exactly; the SQL mirrors the float expression
    // parenthesis-for-parenthesis.
    "q64_bm25" -> ((s, dir) => {
      operators.TextAnalytics.bm25Scores(t(s, dir, "documents"),
        "doc_id", "text", terms = Seq("spark", "join", "vector", "stream"))
        .orderBy("doc_id")
    }),

    "q41_window_suite" -> ((s, dir) => {
      val w = Window.partitionBy("o_custkey")
        .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
      t(s, dir, "orders")
        .select(col("o_custkey"), col("o_orderkey"), col("o_totalprice"),
          dense_rank().over(w).as("drnk"),
          ntile(4).over(w).as("quartile"),
          lag(col("o_orderkey"), 1).over(w).as("prev_key"),
          lead(col("o_orderkey"), 1).over(w).as("next_key"),
          round(cume_dist().over(w), 6).as("cd"))
        .orderBy("o_custkey", "drnk", "o_orderkey")
    }),

    "q42_rollup" -> ((s, dir) => {
      val customer = t(s, dir, "customer")
      val nation = t(s, dir, "nation")
      val region = t(s, dir, "region")
      customer
        .join(broadcast(nation), customer("c_nationkey") === nation("n_nationkey"))
        .join(broadcast(region), nation("n_regionkey") === region("r_regionkey"))
        .rollup(col("r_name"), col("n_name"))
        .agg(count(lit(1)).as("n_cust"),
          decSum(col("c_acctbal")).as("sum_bal"))
        .orderBy(asc_nulls_first("r_name"), asc_nulls_first("n_name"))
    }),

    "q43_distinct_agg" -> ((s, dir) => {
      val li = t(s, dir, "lineitem")
      li.groupBy(col("l_returnflag"))
        .agg(countDistinct(col("l_suppkey")).as("n_supp"),
          countDistinct(col("l_partkey")).as("n_part"),
          count(lit(1)).as("n_rows"))
        .orderBy("l_returnflag")
    }),

    "q44_crossmodal_filter" -> ((s, dir) => {
      // curation join across modalities: text quality gates which
      // embeddings survive, then per-label survivor stats
      val docs = t(s, dir, "documents")
        .select(col("doc_id"), Text.qualityScore(col("text")).as("q"))
      val emb = t(s, dir, "embeddings")
      emb.join(docs, emb("vec_id") === docs("doc_id"))
        .where(col("q") >= 0.5)
        .groupBy("label")
        .agg(count(lit(1)).as("n_docs"),
          // q has 6dp — decimal sum makes the mean order-independent
          round(sum(col("q").cast(DecimalType(28, 8))).cast("double")
            / count(lit(1)), 6).as("avg_quality"))
        .orderBy("label")
    }),

    // CDC last-writer-wins merge: orders as a change log over the
    // customer base — status F rows delete the key, others upsert
    // (bal := totalprice, seg := priority); o_orderkey breaks same-day
    // ties so the merge is total-ordered and replayable.
    "q159_cdc_apply" -> ((s, dir) => {
      val base = t(s, dir, "customer")
        .select(col("c_custkey").as("k"), col("c_acctbal").as("bal"),
          col("c_mktsegment").as("seg"))
      val log = t(s, dir, "orders")
        .select(col("o_custkey").as("k"), col("o_orderdate").as("ts"),
          when(col("o_orderstatus") === "F", lit("D")).otherwise(lit("U")).as("op"),
          col("o_totalprice").as("bal"), col("o_orderpriority").as("seg"),
          col("o_orderkey").as("seq"))
      operators.Scd.applyChangeLog(base, log, "k", "ts", "op",
        Seq("bal", "seg"), tieCols = Seq("seq"))
        .orderBy("k")
    }),

    // Per-source token-concentration audit: Gini over each source's
    // per-document token counts (exact rank moments → fixed-order
    // float → micros). The mixture-report statistic: a source whose
    // tokens sit in a handful of giant documents upsamples those
    // documents under doc-level sampling.
    "q160_gini" -> ((s, dir) => {
      val d = t(s, dir, "documents").select(col("source"), col("doc_id"),
        Text.tokenCount(col("text")).cast("long").as("n_tokens"))
      operators.Stats.giniByKey(d, "source", "n_tokens", "doc_id")
        .orderBy("key")
    }),

    // User-journey transition matrix: P(next event type | event type)
    // over per-user time-ordered streams; (user_id, ts) is unique so
    // the ordering is total without a tie-break.
    "q161_markov" -> ((s, dir) => {
      operators.Sequences.markovTransitions(events(s, dir), "user_id", "ts",
        "event_type")
        .orderBy("from_state", "to_state")
    }),

    // First/last-touch revenue attribution: purchases credit the
    // first and last non-purchase event in the strictly-preceding
    // 7-day window; no touch in window → NULL channel.
    "q162_attribution" -> ((s, dir) => {
      operators.Sequences.touchAttribution(events(s, dir), "user_id", "ts",
        "event_type", "value", "purchase", lookbackDays = 7)
        .orderBy("touch", "channel")
    }),

    // Exact per-node triangle counts on the co-purchase graph (parts
    // sharing an order, thinned to the %10 partkey stratum so the
    // graph stays bench-scale); degree-ordered node-iterator inside.
    "q163_triangles" -> ((s, dir) => {
      val lp = t(s, dir, "lineitem")
        .where(col("l_partkey") % 10 === 0)
        .select(col("l_orderkey").as("o"), col("l_partkey").as("p")).distinct()
      val e = lp.join(lp.select(col("o"), col("p").as("p2")), Seq("o"))
        .where(col("p") < col("p2"))
        .select(col("p").as("src"), col("p2").as("dst"))
      operators.Graph.triangleCounts(e, "src", "dst")
        .orderBy("node")
    }),

    // Same-customer overlapping order intervals ([orderdate,
    // orderdate + 1..30 days]) via the binned overlap join; the
    // oracle is the naive quadratic self-join — bins must only prune.
    "q164_interval_overlap" -> ((s, dir) => {
      val iv = t(s, dir, "orders")
        .select(col("o_custkey").as("k"), col("o_orderkey").as("id"),
          to_date(col("o_orderdate")).as("start_d"),
          date_add(to_date(col("o_orderdate")),
            (col("o_orderkey") % 30 + 1).cast("int")).as("end_d"))
      operators.AsOfJoin.overlapJoin(iv, "k", "id", "start_d", "end_d",
        binDays = 30)
        .select(col("k_a").as("k"), col("id_a"), col("id_b"))
        .orderBy("k", "id_a", "id_b")
    }),

    // A/B readout: Welch z per event type, users split by parity;
    // moments exact, z replayed in fixed float order.
    "q165_welch" -> ((s, dir) => {
      val ev = events(s, dir)
        .withColumn("g", when(col("user_id") % 2 === 0, "a").otherwise("b"))
        .withColumn("v_milli", round(col("value") * 1000).cast("long"))
      operators.Stats.welchZ(ev, "event_type", "g", "a", "b", "v_milli")
        .orderBy("stratum")
    }),

    // Pareto frontier per brand: parts no brand-mate beats on both
    // (price, size); window-only sort-scan skyline vs the oracle's
    // NOT EXISTS ground truth.
    "q166_skyline" -> ((s, dir) => {
      val p = t(s, dir, "part")
        .withColumn("price_cents", round(col("p_retailprice") * 100).cast("long"))
      operators.Stats.skyline2d(p, "price_cents", "p_size", Seq("p_brand"))
        .select("p_brand", "p_partkey", "price_cents", "p_size")
        .orderBy("p_brand", "p_partkey")
    }),

    // Per-user integer EWMA (α=1/2) of event values in milli-units —
    // the fold replays exactly via DuckDB's list_reduce.
    "q167_ewma" -> ((s, dir) => {
      val ev = events(s, dir)
        .withColumn("v_milli", round(col("value") * 1000).cast("long"))
      operators.TimeSeries.ewmaHalfPerKey(ev, "user_id", "ts", "v_milli")
        .orderBy("user_id")
    }),

    // Market-basket rules over order baskets: pairs with support >= 3,
    // confidence/lift in micros from exact counts.
    "q168_assoc_rules" -> ((s, dir) => {
      val li = t(s, dir, "lineitem")
        .select(col("l_orderkey").as("b"), col("l_partkey").as("i"))
      operators.Assoc.pairRules(li, "b", "i", minSupport = 3)
        .orderBy("item_a", "item_b")
    }),

    // Benford first-digit screen over order totals in cents, per
    // priority stratum — expected proportions are driver-computed
    // constants shared verbatim with the oracle; deviation is an
    // integer subtraction (no cross-engine float path).
    "q169_benford" -> ((s, dir) => {
      val o = t(s, dir, "orders").select(col("o_orderpriority"),
        round(col("o_totalprice") * 100).cast("long").as("cents"))
      operators.Stats.benfordDeviation(o, "o_orderpriority", "cents")
        .orderBy("key", "digit")
    }),

    // Two-sample KS drift per priority stratum: open vs finished
    // orders on the cents distribution — the argmax runs in exact
    // integer cross-products, one float division at the end.
    "q170_ks_drift" -> ((s, dir) => {
      val o = t(s, dir, "orders").select(col("o_orderpriority"),
        col("o_orderstatus"),
        round(col("o_totalprice") * 100).cast("long").as("cents"))
      operators.Stats.ksByStratum(o, "o_orderpriority", "o_orderstatus",
        "O", "F", "cents")
        .orderBy("stratum")
    }),

    // Top user-journey trigrams: (user_id, ts) is unique so the lead
    // ordering is total; top-25 cut tie-broken on the path itself.
    "q171_top_paths" -> ((s, dir) => {
      operators.Sequences.topPaths3(events(s, dir), "user_id", "ts",
        "event_type", topN = 25)
        .orderBy(col("n").desc, col("p1"), col("p2"), col("p3"))
    }),

    // Histogram-store lifecycle: write half the orders' cents into
    // per-priority fixed bins, append the other half as a second
    // shard, compact, then read exact lower-edge quantiles — the
    // distribution member of the HLL/CMS mergeable-store family. The
    // oracle replays binning + the ceil-rank rule over ALL orders
    // (shard merge is cell-wise addition, so they must agree).
    "q173_hist_store" -> ((s, dir) => {
      val o = t(s, dir, "orders").select(col("o_orderpriority").as("p"),
        round(col("o_totalprice") * 100).cast("long").as("cents"),
        col("o_orderkey"))
      val tmp = java.nio.file.Files.createTempDirectory("graft_hist").toString
      operators.HistStore.write(o.where(col("o_orderkey") % 2 === 0),
        "p", "cents", tmp, lo = 0L, width = 500000L, bins = 64)
      operators.HistStore.append(o.where(col("o_orderkey") % 2 === 1),
        "p", "cents", tmp)
      operators.HistStore.compactStore(s, tmp)
      operators.HistStore.quantiles(s, tmp,
        Seq(250000L, 500000L, 900000L, 990000L))
        .orderBy("key", "q_micro")
    }),

    // Flesch reading ease per doc slice — scan-only projection; the
    // regex heuristics are RE2-safe so DuckDB counts identically.
    // Wordless docs are filtered (their score is NULL by contract, and
    // the driver's hasher coerces nullable int64 → float64).
    "q172_readability" -> ((s, dir) => {
      operators.TextAnalytics.readability(
        t(s, dir, "documents").where(col("doc_id") % 7 === 2),
        "doc_id", "text")
        .where(col("n_words") > 0)
        .orderBy("doc_id")
    }),

    // MDRM dictionary build under the gate (ref: data-raw/ffiec_dict.R):
    // a deterministic MDRM-shaped export — banner line the reader must
    // skip, Fed column headers needing snake-casing, quoted embedded
    // commas, M/d/yyyy h:mm:ss a dates with the 12/31/9999 open-ended
    // sentinel — is synthesized from `part` into a real zip, then
    // readMdrm → itemsFromMdrm ⋈ itemDetailsFromMdrm rebuild the
    // metadata tables. The oracle recomputes every snake-case/sentinel/
    // case-restoration/typing rule in SQL from the same table. The
    // driver-side collect is the operator's contract: MDRM is
    // metadata-scale (the Fed's full dictionary is tens of MB).
    "q175_mdrm_dict" -> ((s, dir) => {
      val rows = t(s, dir, "part")
        .select(col("p_partkey").cast("long").as("k"), col("p_name"))
        .orderBy("k").collect()
      val tmpDir = java.nio.file.Files.createTempDirectory("graft_mdrm")
      val zipPath = s"$tmpDir/MDRM.zip"
      val zout = new java.util.zip.ZipOutputStream(
        new java.io.FileOutputStream(zipPath))
      zout.putNextEntry(new java.util.zip.ZipEntry("MDRM_CSV.csv"))
      val sb = new StringBuilder
      sb.append("PUBLIC MDRM export - banner line the reader must skip\n")
      sb.append("\"Mnemonic\",\"Item Code\",\"Start Date\",\"End Date\"," +
        "\"Item Name\",\"Confidentiality\",\"ItemType\",\"Reporting Form\"," +
        "\"Description\",\"SeriesGlossary\"\n")
      rows.foreach { r =>
        val k = r.getLong(0); val nm = r.getString(1)
        val code = f"$k%05d"
        val start = s"${k % 12 + 1}/${k % 28 + 1}/${2000 + k % 20} 12:00:00 AM"
        val end = if (k % 2 == 0) "12/31/9999 11:59:59 PM"
                  else "6/30/2010 12:00:00 AM"
        val conf = if (k % 2 == 0) "Y" else "N"
        val itype = if (k % 3 == 0) "F" else "D"
        sb.append(s""""RCON","$code","$start","$end","u.s. $nm ffiec tier 1",""" +
          s""""$conf","$itype","FFIEC 031","Loans, net of $nm","g"""" + "\n")
      }
      zout.write(sb.toString.getBytes("UTF-8"))
      zout.closeEntry(); zout.close()
      val mdrm = graft.meta.Items.readMdrm(s, zipPath)
      val typed = t(s, dir, "part").select(
        concat(lit("RCON"),
          lpad(col("p_partkey").cast("string"), 5, "0")).as("item"),
        element_at(array(lit("integer"), lit("string"), lit("date")),
          (col("p_partkey").cast("long") % 3 + 1).cast("int")).as("data_type"))
      val items = graft.meta.Items.itemsFromMdrm(mdrm, typed)
      val details = graft.meta.Items.itemDetailsFromMdrm(mdrm, typed)
      items.join(details, Seq("item"))
        .select(col("item"), col("mnemonic"), col("item_code"),
          col("item_name"), col("data_type"), col("reporting_form"),
          col("confidentiality"), col("description"), col("itemtype"),
          col("start_date"),
          when(col("end_date").isNull, lit(1L)).otherwise(lit(0L)).as("end_open"),
          coalesce(col("end_date"),
            lit(java.sql.Date.valueOf("1900-01-01"))).as("end_date_f"))
        .orderBy("item")
    }),

    // Exact Jaccard set-similarity self-join with lossless PPJoin
    // prefix filtering; the %3 stratum keeps the ORACLE's naive
    // token-inverted self-join bench-scale (the Spark side would take
    // the full corpus).
    "q176_set_sim_join" -> ((s, dir) => {
      operators.Dedup.setSimilarityJoin(
        t(s, dir, "documents").where(col("doc_id") % 3 === 0),
        "doc_id", "text", tau = 0.7)
        .orderBy("id_a", "id_b")
    }),

    // Functional-dependency audit: orders whose lines carry more than
    // one return flag violate l_orderkey → l_returnflag.
    "q177_fd_violations" -> ((s, dir) => {
      operators.KeyChecks.fdViolations(t(s, dir, "lineitem"),
        Seq("l_orderkey"), "l_returnflag")
        .orderBy("l_orderkey")
    }),

    // Sorted-neighborhood linkage candidates over a (segment, banded
    // balance) blocking key; exact zipWithIndex total order inside.
    "q178_sorted_neighborhood" -> ((s, dir) => {
      val key = concat(col("c_mktsegment"),
        lpad((floor(col("c_acctbal")) + 1000).cast("long").cast("string"),
          5, "0"))
      operators.Dedup.sortedNeighborhoodPairs(t(s, dir, "customer"),
        "c_custkey", key, w = 3)
        .orderBy("pos_a", "pos_b")
    }),

    // Reciprocal-rank fusion of two length signals (chars, tokens):
    // exact descending two-phase ranks, integer-division rrf terms.
    "q179_rrf_fuse" -> ((s, dir) => {
      val d = t(s, dir, "documents").select(col("doc_id"),
        col("n_chars").cast("long").as("n_chars"),
        Text.tokenCount(col("text")).cast("long").as("n_tok"))
      operators.Sampling.rrfFuse(d, "doc_id", Seq("n_chars", "n_tok"), k = 60)
        .orderBy("doc_id")
    }),

    // Interpolated Kneser-Ney bigram table (d = 1/2) over the corpus;
    // continuation-count backoff, fixed-order float replay.
    "q180_kn_bigram" -> ((s, dir) => {
      operators.TextAnalytics.knBigramTable(t(s, dir, "documents"), "text",
        minCount = 5)
        .orderBy("w1", "w2")
    }),

    // Per-source winsorization of document lengths to the exact
    // [p5, p95] band; thresholds from distinct-value cumulative
    // counts (no per-row hot-key window).
    "q181_winsorize" -> ((s, dir) => {
      operators.Stats.winsorizePerKey(t(s, dir, "documents"), "source",
        "n_chars", "doc_id", pLoMicro = 50000L, pHiMicro = 950000L)
        .orderBy("key", "id")
    }),

    // Chi-square contingency cells source × lang: exact integral-
    // division micros (DECIMAL div BIGINT), margins broadcast back.
    "q182_chi2_cells" -> ((s, dir) => {
      operators.KeyChecks.chiSquareCells(t(s, dir, "documents"),
        "source", "lang")
        .orderBy("a", "b")
    }),

    // Exact integer Gram matrix of the embedding corpus (micro-
    // quantized, DECIMAL-summed): the one-pass second-moment reduce
    // PCA/whitening starts from.
    "q183_gram_matrix" -> ((s, dir) => {
      operators.Pca.gramMicro(t(s, dir, "embeddings"), "embedding")
        .select(col("i").cast("long").as("i"), col("j").cast("long").as("j"),
          col("g").cast("long").as("g"))
        .orderBy("i", "j")
    }),

    // Add-one-smoothed categorical KL between the even/odd doc_id
    // halves over source — the mixture-drift screen, per-value terms.
    "q184_categorical_kl" -> ((s, dir) => {
      val d = t(s, dir, "documents")
      operators.KeyChecks.categoricalKl(
        d.where(col("doc_id") % 2 === 0), d.where(col("doc_id") % 2 === 1),
        "source")
        .orderBy("v")
    }),

    // Cross-source quantile normalization of document lengths onto
    // the pooled distribution; exact ranks both sides.
    "q185_quantile_normalize" -> ((s, dir) => {
      operators.Sampling.quantileNormalizeByKey(t(s, dir, "documents"),
        "source", "n_chars", "doc_id")
        .orderBy("key", "id")
    }),

    // FastSS deletion-neighborhood edit-distance join (k = 1) over
    // customer names; exhaustive-oracle-verified lossless.
    "q186_editdist_pairs" -> ((s, dir) => {
      operators.Dedup.editDistancePairs(
        t(s, dir, "customer").where(col("c_nationkey") < 5),
        "c_custkey", "c_name", k = 1)
        .orderBy("id_a", "id_b")
    }),

    // Survivorship per nation cluster: max balance, min name,
    // most-frequent segment (tie → smallest) — the golden record.
    "q187_golden_record" -> ((s, dir) => {
      operators.Dedup.goldenRecord(t(s, dir, "customer"), "c_nationkey",
        maxCols = Seq("c_acctbal"), minCols = Seq("c_name"),
        modeCols = Seq("c_mktsegment"))
        .orderBy("cluster")
    }),

    // Nonparametric src0-vs-src1 length comparison per language:
    // exact half-unit rank sums over distinct-value counts.
    "q188_mann_whitney" -> ((s, dir) => {
      operators.Stats.mannWhitneyU(t(s, dir, "documents"), "lang",
        "source", "src0", "src1", "n_chars")
        .orderBy("stratum")
    }),

    // 1-D nearest matching src0 → src1 on length per language; two
    // linear as-of merges, ties break low.
    "q189_nn_match" -> ((s, dir) => {
      val d = t(s, dir, "documents")
      operators.Stats.nearestMatch1d(
        d.where(col("source") === "src0"), d.where(col("source") === "src1"),
        "lang", "n_chars", "doc_id")
        .orderBy("stratum", "id")
    }),

    // Lag-1 autocorrelation of daily event volume per type — exact
    // integer moments over the (d, d+1) arithmetic pair join.
    "q190_autocorr" -> ((s, dir) => {
      operators.TimeSeries.lagCorrDaily(events(s, dir), "event_type", "ts",
        lag = 1)
        .orderBy("key")
    }),

    // The incremental-components lifecycle under the gate: write a
    // mod-6 chain forest, append the mod-3 chain (merges 6 → 3
    // classes), compact (pending folded, one-shard forest), then
    // append a single (1,2) bridge — components must read it through
    // the fresh pending without recomputing history. Closed form:
    // rep = 0 for ids ≡ 0 (mod 3), else 1.
    "q191_cc_store" -> ((s, dir) => {
      import s.implicits._
      val tmp = java.nio.file.Files.createTempDirectory("graft_cc_store").toString
      // id cap: chain depth (and so star-rounds) stays fixed across
      // sf — the gate exercises the lifecycle, not an O(log diam) soak
      val k = t(s, dir, "customer").select(col("c_custkey").cast("long").as("k"))
        .where(col("k") < 2000)
      operators.CcStore.write(
        k.where(col("k") > 6)
          .select(col("k").as("id_a"), (col("k") - 6).as("id_b")), tmp)
      operators.CcStore.append(
        k.where(col("k") > 3)
          .select(col("k").as("id_a"), (col("k") - 3).as("id_b")), tmp)
      operators.CcStore.compactStore(s, tmp)
      operators.CcStore.append(Seq((1L, 2L)).toDF("id_a", "id_b"), tmp)
      operators.CcStore.components(s, tmp).orderBy("id")
    }),

    // Bayardo-style lossless cosine all-pairs over distinct token
    // sets; pair membership decided in pure integers (inter²·10¹² vs
    // τ²micro·sa·sb), graded against the exhaustive shared-token join.
    "q192_cosine_pairs" -> ((s, dir) => {
      operators.Dedup.cosineSetJoin(
        t(s, dir, "documents").where(col("doc_id") % 3 === 1),
        "doc_id", "text", tau = 0.6)
        .orderBy("id_a", "id_b")
    }),

    // Two-feature OLS per event type: value ~ hour + weekday from
    // exact DECIMAL moments, Cramer solve in one fixed float order.
    "q196_ols2" -> ((s, dir) => {
      operators.Stats.ols2PerKey(
        events(s, dir).select(col("event_type"),
          hour(col("ts")).cast("long").as("x1"),
          dayofweek(col("ts")).cast("long").as("x2"),
          round(col("value") * 1000).cast("long").as("y")),
        "event_type", "x1", "x2", "y")
        .orderBy("key")
    }),

    // One-way ANOVA F of doc length across sources per language —
    // group moments exact, ratio quantized to q6 before the exact
    // stratum fold so the sum is order-independent.
    "q197_anova" -> ((s, dir) => {
      operators.Stats.anovaF(t(s, dir, "documents"), "lang", "source",
        "n_chars")
        .orderBy("stratum")
    }),

    // Cumulative gains table of event value vs purchase outcome:
    // two-phase exact desc ranks, integer slice cuts and lift micros.
    "q198_lift" -> ((s, dir) => {
      operators.Stats.liftTable(
        events(s, dir).select(
          round(col("value") * 1000).cast("long").as("x"),
          (col("event_type") === "purchase").as("y")),
        "x", "y", bins = 10)
        .orderBy("slice")
    }),

    // Per-cell mutual information source × lang — the dependence
    // screen beside q182's chi-square deviations.
    "q199_mutual_info" -> ((s, dir) => {
      operators.KeyChecks.mutualInformationCells(t(s, dir, "documents"),
        "source", "lang")
        .orderBy("a", "b")
    }),

    // k-core peel on clique-plus-chain: every chain tail cascades
    // away at k = 3, the 8-clique survives intact (degree 7 each).
    "q194_kcore" -> ((s, dir) => {
      val ids = t(s, dir, "customer")
        .select(col("c_custkey").cast("long").as("k"))
      val chain = ids.where(col("k").between(1, 99))
        .select(col("k").as("u"), (col("k") - 1).as("v"))
      val cl = ids.where(col("k") < 8)
      val clique = cl.select(col("k").as("u"))
        .crossJoin(cl.select(col("k").as("v")))
        .where(col("u") < col("v"))
      operators.Graph.kcore(chain.unionByName(clique), "u", "v", k = 3)
        .orderBy("id")
    }),

    // Multi-source BFS over mod-300 chains: dist = id div 300, bounded
    // depth across sf via the id cap.
    "q195_bfs" -> ((s, dir) => {
      val ids = t(s, dir, "customer")
        .select(col("c_custkey").cast("long").as("k"))
        .where(col("k") < 3000)
      val edges = ids.where(col("k") >= 300)
        .select(col("k").as("u"), (col("k") - 300).as("v"))
      operators.Graph.bfsDistances(edges, "u", "v",
        ids.where(col("k") < 300), "k")
        .orderBy("id")
    }),

    // Reliability table of event value (milli-scaled) vs purchase
    // outcome: exact integer bin edges, counts, micro rates; the bin
    // spine keeps empty bins visible.
    "q193_calibration" -> ((s, dir) => {
      operators.Stats.calibrationBins(
        events(s, dir).select(
          round(col("value") * 1000).cast("long").as("v_milli"),
          (col("event_type") === "purchase").as("y")),
        "v_milli", "y", bins = 10, loMilli = 0L, hiMilli = 100000L)
        // comparator dtype contract: empty-bin NULL rate → -1 sentinel
        .withColumn("rate_micro", coalesce(col("rate_micro"), lit(-1L)))
        .orderBy("bin")
    }),

    // Release-risk audit over (nation, segment) quasi-identifiers with
    // account cents as the sensitive attribute — class sizes,
    // sensitive diversity, both risk flags.
    "q200_kanonymity" -> ((s, dir) => {
      operators.KeyChecks.kAnonymity(
        t(s, dir, "customer").select(
          col("c_nationkey").cast("long").as("nat"),
          col("c_mktsegment").as("seg"),
          round(col("c_acctbal") * 100).cast("long").as("cents")),
        Seq("nat", "seg"), "cents", k = 50, l = 20)
        .orderBy("nat", "seg")
    }),

    // Peak concurrent synthetic sessions per event type: start = ts,
    // duration = value-derived seconds (non-negative by data contract,
    // so % is identical on both engines).
    "q201_max_concurrent" -> ((s, dir) => {
      val iv = events(s, dir).select(col("event_type"), col("ts"),
        timestamp_micros(unix_micros(col("ts"))
          + (pmod(round(col("value") * 1000).cast("long"), lit(3600L))
            + 60L) * 1000000L).as("te"))
      operators.TimeSeries.maxConcurrent(iv, "event_type", "ts", "te")
        .orderBy("key")
    }),

    // Where did each event type's daily level shift? Integer CUSUM
    // peak over the daily-count series.
    "q202_cusum" -> ((s, dir) => {
      operators.TimeSeries.cusumChangepoint(events(s, dir), "event_type", "ts")
        .orderBy("key")
    }),

    // Robust daily trend per event type: lower median of all pairwise
    // slopes — outlier days can't drag it.
    "q203_theilsen" -> ((s, dir) => {
      operators.Stats.theilSenDaily(events(s, dir), "event_type", "ts")
        .orderBy("key")
    }),

    // Monotone association per source between the stored char count
    // and the tokenizer's token count — doubled-average-rank Spearman.
    "q204_spearman" -> ((s, dir) => {
      operators.Stats.spearmanByKey(
        t(s, dir, "documents").select(col("source"),
          col("n_chars"),
          size(graft.functions.Text.tokens(col("text"))).cast("long")
            .as("n_tok")),
        "source", "n_chars", "n_tok")
        .orderBy("key")
    }),

    // PAVA recalibration of q193's reliability bins: pooled monotone
    // rates via the minimax closed form over exact prefix sums.
    "q205_isotonic" -> ((s, dir) => {
      operators.Stats.isotonicFit(
        events(s, dir).select(
          round(col("value") * 1000).cast("long").as("v_milli"),
          (col("event_type") === "purchase").as("y")),
        "v_milli", "y", bins = 10, loMilli = 0L, hiMilli = 100000L)
        .orderBy("bin")
    }),

    // Deterministic bounded-noise count release per source — the DP
    // release plumbing with a seeded-hash noise surrogate.
    "q206_dp_counts" -> ((s, dir) => {
      operators.Stats.dpNoisyCounts(t(s, dir, "documents"), "source",
        bound = 50, seed = 11L)
        .orderBy("key")
    }),

    // Top 50 stems: the suffix-stripping rule chain collapses
    // plural/participle surface forms before counting.
    "q207_stem_terms" -> ((s, dir) => {
      operators.TextAnalytics.stemmedTopTerms(t(s, dir, "documents"),
        "text", 50)
    }),

    // Which event types precede which (anywhere in a user's stream,
    // not just adjacently)? Span-collapsed precedence support.
    "q208_precedence" -> ((s, dir) => {
      operators.Sequences.precedencePairs(events(s, dir), "user_id",
        "event_type", "ts", minSupport = 5L)
        .orderBy("t1", "t2")
    }),

    // 32-bit-word bitmap index over order status — membership words +
    // popcounts per (value, word).
    "q209_bitmap_index" -> ((s, dir) => {
      operators.InvertedIndex.bitmapIndex(t(s, dir, "orders"),
        "o_orderkey", "o_orderstatus")
        .orderBy("value", "word_idx")
    }),

    // Trailing 7-row OLS slope on the zero-filled daily order-count
    // grid — the local trend feature, windows over exact moments.
    "q210_rolling_slope" -> ((s, dir) => {
      val daily = t(s, dir, "orders")
        .groupBy(col("o_orderpriority").as("grp"),
          to_date(col("o_orderdate")).as("d"))
        .agg(count(lit(1)).as("n"))
      val grid = operators.TimeSeries.gapFill(daily, "grp", "d", "n",
        forward = false)
      operators.TimeSeries.rollingSlope(grid, "grp", "d", "n", days = 7)
        .where(col("slope_micro").isNotNull)
        .orderBy("grp", "d")
    }),

    // Full cube over (returnflag, linestatus) with the grouping-id
    // bitmask — all four aggregation levels in one pass.
    "q211_cube" -> ((s, dir) => {
      t(s, dir, "lineitem")
        .cube(col("l_returnflag"), col("l_linestatus"))
        .agg(grouping_id().cast("long").as("gid"), count(lit(1)).as("n"),
          decSum(col("l_quantity")).as("sum_qty"))
        .orderBy(asc_nulls_first("l_returnflag"),
          asc_nulls_first("l_linestatus"), asc("gid"))
    }),

    // Mann–Kendall S and tau-a per event type — the test statistic
    // beside q203's Theil–Sen estimate.
    "q212_mann_kendall" -> ((s, dir) => {
      operators.Stats.mannKendallDaily(events(s, dir), "event_type", "ts")
        .orderBy("key")
    }),

    // Day-of-week seasonal indexes per event type; dow is pure
    // (epoch_day + 4) mod 7 arithmetic.
    "q213_seasonal" -> ((s, dir) => {
      operators.TimeSeries.seasonalProfile(events(s, dir), "event_type", "ts")
        .orderBy("key", "dow")
    }),

    // Poisson bootstrap of the mean event value per type: 16
    // replicates, integer-threshold draws, exact weighted moments.
    "q214_bootstrap" -> ((s, dir) => {
      operators.Stats.bootstrapMeans(
        events(s, dir).select(col("event_type"), col("event_id"),
          round(col("value") * 1000).cast("long").as("v_milli")),
        "event_type", "event_id", "v_milli", reps = 16, seed = 5L)
        .orderBy("key", "b")
    }),

    // Exact distinct users per event type through the bitmap lane —
    // the shuffle carries words, not raw ids.
    "q215_bitmap_distinct" -> ((s, dir) => {
      operators.InvertedIndex.bitmapDistinct(events(s, dir),
        "event_type", "user_id")
        .orderBy("key")
    }),

    // Word-aligned AND/OR/Jaccard between order-status bitmaps — set
    // algebra on the index, no row rescans.
    "q216_bitmap_algebra" -> ((s, dir) => {
      operators.InvertedIndex.bitmapAlgebra(
        operators.InvertedIndex.bitmapIndex(t(s, dir, "orders"),
          "o_orderkey", "o_orderstatus"))
        .orderBy("value_a", "value_b")
    }),

    // Trailing 7-day distinct actives per event type via the
    // range-delta reformulation — graded against brute-force
    // windowed COUNT(DISTINCT).
    "q217_sliding_distinct" -> ((s, dir) => {
      operators.TimeSeries.slidingDistinct(events(s, dir), "event_type",
        "user_id", "ts", days = 7)
        .orderBy("key", "d")
    }),

    // Robust typical daily volume per event type — lower median of
    // doubled Walsh sums, halved exactly into micros.
    "q218_hodges_lehmann" -> ((s, dir) => {
      operators.Stats.hodgesLehmannDaily(events(s, dir), "event_type", "ts")
        .orderBy("key")
    }),

    // Degree histogram + CCDF + discrete power-law MLE over the
    // customer↔order bipartite edges. The two key columns share one
    // numeric id namespace, so the order side is NEGATED before the
    // symmetrizing union — otherwise a custkey equal to an orderkey
    // would merge two unrelated nodes' degrees (orderkeys are >= 1,
    // so negation is a disjoint namespace).
    "q219_degree_dist" -> ((s, dir) => {
      val e = t(s, dir, "orders").select(
        col("o_custkey").cast("long").as("src"),
        (-col("o_orderkey").cast("long")).as("dst"))
      operators.Graph.degreeDistribution(e, "src", "dst", dMin = 1L)
        .orderBy("degree")
    }),

    // Exact p50/p90 of per-user inter-event gaps (seconds) per event
    // type — distinct-count rank selection, no approximation.
    "q220_interarrival" -> ((s, dir) => {
      val w = Window.partitionBy("event_type", "user_id").orderBy("t")
      val gaps = events(s, dir)
        .select(col("event_type"), col("user_id"),
          unix_micros(col("ts")).as("t"))
        .withColumn("gap_s",
          expr("(t - lag(t) over (partition by event_type, user_id order by t)) div 1000000L"))
        .where(col("gap_s").isNotNull)
      operators.Stats.quantilesPerKey(gaps, "event_type", "gap_s",
        Seq(500000L, 900000L))
        .orderBy("key", "p_micro")
    }),

    // Token-mass concentration per source: Herfindahl beside q160's
    // Gini.
    "q221_hhi" -> ((s, dir) => {
      operators.Stats.hhiByKey(t(s, dir, "documents"), "source", "n_chars")
        .orderBy("key")
    }),

    // Planner-style equi-join cardinality estimate between the en and
    // non-en token streams from their CMS cells alone.
    "q222_cms_joinsize" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      val a = TextAnalytics.countMinSketch(
        docs.where(col("lang") === "en"), "text", d = 4, width = 512)
      val b = TextAnalytics.countMinSketch(
        docs.where(col("lang") =!= "en"), "text", d = 4, width = 512)
      TextAnalytics.cmsJoinSize(a, b, d = 4)
        .select(col("row").cast("long").as("row"), col("dot"),
          col("join_size_est"))
        .orderBy("row")
    }),

    // Robust outlier audit: median/MAD in pure integers, |x−m| > 3·MAD.
    "q223_mad" -> ((s, dir) => {
      operators.Stats.madOutliersPerKey(
        events(s, dir).select(col("event_type"),
          round(col("value") * 1000).cast("long").as("v_milli")),
        "event_type", "v_milli", k = 3L)
        .orderBy("key")
    }),

    // Planner selectivity from the histogram store: integer
    // uniform-within-bin interpolation over a mid-bin range.
    "q224_selectivity" -> ((s, dir) => {
      val o = t(s, dir, "orders").select(col("o_orderpriority").as("p"),
        round(col("o_totalprice") * 100).cast("long").as("cents"),
        col("o_orderkey"))
      val tmp = java.nio.file.Files.createTempDirectory("graft_sel").toString
      operators.HistStore.write(o.where(col("o_orderkey") % 2 === 0),
        "p", "cents", tmp, lo = 0L, width = 500000L, bins = 64)
      operators.HistStore.append(o.where(col("o_orderkey") % 2 === 1),
        "p", "cents", tmp)
      operators.HistStore.estimateRange(s, tmp,
        loQ = 2300000L, hiQ = 15250000L)
        .orderBy("key")
    }),

    // One-scan expectation suite over orders: every rule a
    // conditional sum in a single aggregate.
    "q225_rule_audit" -> ((s, dir) => {
      operators.KeyChecks.ruleAudit(t(s, dir, "orders"), Seq(
        "orderkey_positive" -> (col("o_orderkey") > 0),
        "price_in_range" -> col("o_totalprice").between(0.0, 1000000.0),
        "status_known" -> col("o_orderstatus").isin("O", "F", "P"),
        "priority_nonnull" -> col("o_orderpriority").isNotNull,
        "date_modern" -> (col("o_orderdate").cast("date")
          >= lit("1990-01-01").cast("date"))))
    }),

    // Time-to-convert percentiles: view → purchase latency per user,
    // exact p50/p90 via the distinct-count rank selection.
    "q226_time_to_convert" -> ((s, dir) => {
      val lat = operators.Sequences.timeToConvert(events(s, dir),
        "user_id", "ts", "event_type", "view", "purchase")
        .withColumn("pair", lit("view_to_purchase"))
      operators.Stats.quantilesPerKey(lat, "pair", "latency_s",
        Seq(500000L, 900000L))
        .orderBy("p_micro")
    }),

    // Language-ID eval loop: stored label × heuristic prediction
    // confusion cells.
    "q227_langid_confusion" -> ((s, dir) => {
      t(s, dir, "documents")
        .groupBy(col("lang"), Text.langId(col("text")).as("lang_pred"))
        .agg(count(lit(1)).as("n"))
        .orderBy("lang", "lang_pred")
    }),

    // Kaplan–Meier view→purchase survival, censored at each
    // non-converter's last event; cohorts by user parity.
    "q228_kaplan_meier" -> ((s, dir) => {
      val ev = events(s, dir)
      // a feeds conv + cens, conv feeds union + anti-join — persist
      // both so neither subtree replans (Blocks.releaseAll frees
      // them at the query boundary)
      val a = ev.where(col("event_type") === "view")
        .groupBy(col("user_id").as("u"))
        .agg(min(unix_micros(col("ts"))).as("ta"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val conv = ev.where(col("event_type") === "purchase")
        .select(col("user_id").as("u"), unix_micros(col("ts")).as("tb"))
        .join(a, Seq("u")).where(col("tb") > col("ta"))
        .groupBy("u", "ta").agg(min("tb").as("tb"))
        .select(col("u"), expr("(tb - ta) div 1000000L").as("t"),
          lit(true).as("e"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val last = ev.groupBy(col("user_id").as("u"))
        .agg(max(unix_micros(col("ts"))).as("tmax"))
      val cens = a.join(last, Seq("u"))
        .join(conv.select(col("u"), lit(1).as("__c")), Seq("u"), "left_anti")
        .select(col("u"), expr("(tmax - ta) div 1000000L").as("t"),
          lit(false).as("e"))
      val subjects = conv.unionByName(cens)
        .withColumn("cohort", concat(lit("c"), pmod(col("u"), lit(2L))))
      operators.Stats.kaplanMeier(subjects, "cohort", "t", "e")
        .orderBy("key", "t")
    }),

    // When did each event type's level shift, and what were the
    // slopes on either side?
    "q229_segmented_trend" -> ((s, dir) => {
      operators.TimeSeries.segmentedTrend(events(s, dir), "event_type", "ts")
        // comparator dtype contract: a one-day segment's NULL slope →
        // sentinel long
        .withColumn("slope_before_micro",
          coalesce(col("slope_before_micro"), lit(Long.MinValue)))
        .withColumn("slope_after_micro",
          coalesce(col("slope_after_micro"), lit(Long.MinValue)))
        .orderBy("key")
    }),

    // Drain-lite template inventory over the corpus: length-grouped,
    // constant-vs-wildcard per position, first 16 positions analyzed.
    "q230_log_templates" -> ((s, dir) => {
      operators.TextAnalytics.mineTemplates(t(s, dir, "documents"),
        "doc_id", "text", maxTokens = 16)
        .orderBy("n_tokens")
    }),

    // Paired within-user views-vs-clicks shift per cohort — Wilcoxon
    // signed rank over doubled average ranks.
    "q231_wilcoxon" -> ((s, dir) => {
      val paired = events(s, dir)
        .groupBy(col("user_id").as("u"))
        .agg(sum(when(col("event_type") === "view", 1L).otherwise(0L))
          .as("x"),
          sum(when(col("event_type") === "click", 1L).otherwise(0L))
            .as("y"))
        .select(concat(lit("c"), pmod(col("u"), lit(2L))).as("cohort"),
          (col("x") - col("y")).as("diff"))
      operators.Stats.wilcoxonSignedRank(paired, "cohort", "diff")
        .orderBy("key")
    }),

    // Did viewers convert to purchasers? McNemar on the paired
    // (viewed, purchased) booleans per cohort.
    "q232_mcnemar" -> ((s, dir) => {
      val paired = events(s, dir)
        .groupBy(col("user_id").as("u"))
        .agg(max(col("event_type") === "view").as("a"),
          max(col("event_type") === "purchase").as("b"))
        .select(concat(lit("c"), pmod(col("u"), lit(2L))).as("cohort"),
          col("a"), col("b"))
      operators.Stats.mcnemar(paired, "cohort", "a", "b")
        .orderBy("key")
    }),

    // Effect size for the source × lang dependence: V beside q182's
    // χ² deviations and q199's MI.
    "q233_cramers_v" -> ((s, dir) => {
      operators.Stats.cramersV(t(s, dir, "documents"), "source", "lang")
    }),

    // Effect size beside q165's significance: Cohen's d on the same
    // parity split.
    "q234_effect_size" -> ((s, dir) => {
      val ev = events(s, dir)
        .withColumn("g", when(col("user_id") % 2 === 0, "a").otherwise("b"))
        .withColumn("v_milli", round(col("value") * 1000).cast("long"))
      operators.Stats.cohensD(ev, "event_type", "g", "a", "b", "v_milli")
        .orderBy("stratum")
    }),

    // Conversion-rate A/B per event type: purchase-flag proportions
    // on the parity split, pooled-p̂ z.
    "q235_proportions" -> ((s, dir) => {
      val ev = events(s, dir)
        .withColumn("g", when(col("user_id") % 2 === 0, "a").otherwise("b"))
        .withColumn("y", col("value") > 100.0)
      operators.Stats.proportionsZ(ev, "event_type", "g", "a", "b", "y")
        .orderBy("stratum")
    }),

    // TPC-H Q5 shape (local supplier volume): six-table snowflake,
    // both dims broadcast, revenue in exact integer micro-cents
    // (cents × (10000 − discount_bp)) so no float product ever sums.
    "q236_tpch_q5" -> ((s, dir) => {
      val rev = (round(col("l_extendedprice") * 100).cast("long")
        * (lit(10000L) - round(col("l_discount") * 10000).cast("long")))
      t(s, dir, "customer")
        .join(t(s, dir, "orders"), col("c_custkey") === col("o_custkey"))
        .where(col("o_orderdate") >= lit("1996-01-01").cast("timestamp_ntz")
          && col("o_orderdate") < lit("1997-01-01").cast("timestamp_ntz"))
        .join(t(s, dir, "lineitem"), col("o_orderkey") === col("l_orderkey"))
        .join(t(s, dir, "supplier"), col("l_suppkey") === col("s_suppkey")
          && col("c_nationkey") === col("s_nationkey"))
        .join(broadcast(t(s, dir, "nation")),
          col("s_nationkey") === col("n_nationkey"))
        .join(broadcast(t(s, dir, "region")),
          col("n_regionkey") === col("r_regionkey"))
        .where(col("r_name") === "ASIA")
        .groupBy(col("n_name"))
        .agg(sum(rev.cast(DecimalType(38, 0))).cast("long")
          .as("revenue_e6"))
        .orderBy(col("revenue_e6").desc, col("n_name"))
    }),

    // TPC-H Q10 shape (returned-item reporting): top 20 customers by
    // lost revenue on returned lines in a quarter.
    "q237_tpch_q10" -> ((s, dir) => {
      val rev = (round(col("l_extendedprice") * 100).cast("long")
        * (lit(10000L) - round(col("l_discount") * 10000).cast("long")))
      t(s, dir, "customer")
        .join(t(s, dir, "orders"), col("c_custkey") === col("o_custkey"))
        .where(col("o_orderdate") >= lit("1996-01-01").cast("timestamp_ntz")
          && col("o_orderdate") < lit("1996-04-01").cast("timestamp_ntz"))
        .join(t(s, dir, "lineitem"), col("o_orderkey") === col("l_orderkey"))
        .where(col("l_returnflag") === "R")
        .join(broadcast(t(s, dir, "nation")),
          col("c_nationkey") === col("n_nationkey"))
        .groupBy(col("c_custkey"), col("c_name"), col("n_name"))
        .agg(sum(rev.cast(DecimalType(38, 0))).cast("long")
          .as("revenue_e6"))
        .orderBy(col("revenue_e6").desc, col("c_custkey"))
        .limit(20)
    }),

    // TPC-H Q17 SHAPE: correlated scalar subquery (per-part average
    // quantity threshold) written AS SQL so Catalyst's decorrelation
    // (RewriteCorrelatedScalarSubquery) is the machinery under test —
    // the physical plan must be an aggregate-then-join, never a
    // per-row subquery (PlanSpec asserts). Arithmetic: quantities are
    // integral doubles, so SUM/AVG/0.2* replay bit-identically in
    // DuckDB; revenue sums exact integer cents.
    "q241_tpch_q17" -> ((s, dir) => {
      t(s, dir, "lineitem").createOrReplaceTempView("g_lineitem")
      t(s, dir, "part").createOrReplaceTempView("g_part")
      s.sql("""
        SELECT CAST(SUM(CAST(ROUND(l_extendedprice * 100) AS BIGINT)) AS BIGINT)
                 AS sum_cents,
               CAST(COUNT(*) AS BIGINT) AS n_rows
        FROM g_lineitem JOIN g_part ON p_partkey = l_partkey
        WHERE p_brand = 'Brand#12' AND p_size < 15
          AND l_quantity < (SELECT 0.2 * AVG(l2.l_quantity)
                            FROM g_lineitem l2
                            WHERE l2.l_partkey = p_partkey)""")
    }),

    // TPC-H Q18 SHAPE: group-filter-join-back — the IN subquery over
    // a HAVING aggregate plans as a semi-join on the aggregated key,
    // then the big three-way join re-aggregates. Quantities integral
    // -> exact long sums.
    "q242_tpch_q18" -> ((s, dir) => {
      t(s, dir, "lineitem").createOrReplaceTempView("g_lineitem")
      t(s, dir, "orders").createOrReplaceTempView("g_orders")
      t(s, dir, "customer").createOrReplaceTempView("g_customer")
      s.sql("""
        SELECT c_name, CAST(c_custkey AS BIGINT) AS c_custkey,
               CAST(o_orderkey AS BIGINT) AS o_orderkey,
               CAST(ROUND(o_totalprice * 100) AS BIGINT) AS total_cents,
               CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty
        FROM g_customer, g_orders, g_lineitem
        WHERE o_orderkey IN (SELECT l_orderkey
                             FROM g_lineitem
                             GROUP BY l_orderkey
                             HAVING SUM(CAST(l_quantity AS BIGINT)) > 180)
          AND c_custkey = o_custkey AND o_orderkey = l_orderkey
        GROUP BY c_name, c_custkey, o_orderkey, o_totalprice
        ORDER BY total_cents DESC, o_orderkey
        LIMIT 100""")
    }),

    // TPC-H Q21 SHAPE: the double-correlated EXISTS / NOT EXISTS over
    // lineitem self-references — authored as SQL so Catalyst's
    // decorrelation (RewritePredicateSubquery: EXISTS → LeftSemi,
    // NOT EXISTS → LeftAnti, both with the <> residual) is the
    // machinery under test; PlanSpec asserts no per-row subquery and
    // no BNLJ survive. The synthetic lineitem has no
    // receipt/commit dates, so "late" is a fixed ship-date cutoff —
    // the correlation structure (same order, OTHER supplier, none of
    // the others late) is Q21's exactly.
    "q248_tpch_q21" -> ((s, dir) => {
      t(s, dir, "lineitem").createOrReplaceTempView("g_lineitem")
      t(s, dir, "orders").createOrReplaceTempView("g_orders")
      t(s, dir, "supplier").createOrReplaceTempView("g_supplier")
      s.sql("""
        SELECT s_name, CAST(COUNT(*) AS BIGINT) AS numwait
        FROM g_supplier, g_lineitem l1, g_orders
        WHERE s_suppkey = l1.l_suppkey
          AND o_orderkey = l1.l_orderkey
          AND o_orderstatus = 'F'
          AND l1.l_shipdate > TIMESTAMP '1997-01-01'
          AND EXISTS (SELECT 1 FROM g_lineitem l2
                      WHERE l2.l_orderkey = l1.l_orderkey
                        AND l2.l_suppkey <> l1.l_suppkey)
          AND NOT EXISTS (SELECT 1 FROM g_lineitem l3
                          WHERE l3.l_orderkey = l1.l_orderkey
                            AND l3.l_suppkey <> l1.l_suppkey
                            AND l3.l_shipdate > TIMESTAMP '1997-01-01')
        GROUP BY s_name
        ORDER BY numwait DESC, s_name
        LIMIT 100""")
    }),

    // TPC-H Q20 SHAPE: an IN-subquery that itself nests an IN plus a
    // CORRELATED scalar aggregate — multi-level decorrelation (the
    // synthetic schema has no partsupp, so the per-(part) half-average
    // threshold correlates on lineitem directly; the nesting depth is
    // Q20's). AVG over integral-valued doubles replays bit-identically
    // (exact partial sums), the q241 precedent.
    // TPC-H Q20, FULL FIDELITY (round 9 — derived partsupp): the
    // nested IN chain partsupp→part plus a TWO-KEY correlated scalar
    // SUM over lineitem (excess-inventory suppliers in one nation).
    // Spark must decorrelate the (l_partkey, l_suppkey) correlate to
    // a grouped aggregate re-joined on BOTH keys. Integer quantities;
    // a pair with no 1995 shipments yields NULL → excluded (both
    // engines agree on NULL comparison semantics here).
    "q251_tpch_q20" -> ((s, dir) => {
      t(s, dir, "lineitem").createOrReplaceTempView("g_lineitem")
      t(s, dir, "part").createOrReplaceTempView("g_part")
      t(s, dir, "supplier").createOrReplaceTempView("g_supplier")
      t(s, dir, "nation").createOrReplaceTempView("g_nation")
      val nSup = t(s, dir, "supplier").count()
      s.sql(partsuppSparkSql(nSup)).createOrReplaceTempView("g_partsupp")
      s.sql("""
        SELECT s.s_name
        FROM g_supplier s JOIN g_nation n ON s.s_nationkey = n.n_nationkey
        WHERE n.n_name = 'NATION_3'
          AND s.s_suppkey IN (
            SELECT ps.ps_suppkey FROM g_partsupp ps
            WHERE ps.ps_partkey IN (SELECT p_partkey FROM g_part
                                    WHERE p_name LIKE 'red%')
              AND 2 * ps.ps_availqty >
                (SELECT CAST(SUM(CAST(l.l_quantity AS BIGINT)) AS BIGINT)
                 FROM g_lineitem l
                 WHERE l.l_partkey = ps.ps_partkey
                   AND l.l_suppkey = ps.ps_suppkey
                   AND l.l_shipdate >= TIMESTAMP '1995-01-01'
                   AND l.l_shipdate < TIMESTAMP '1996-01-01'))
        ORDER BY s_name""")
    }),

    // Margin-criterion neighbor mining (Artetxe & Schwenk 2019) over
    // the approximate kNN graph: hubness-corrected cosine. Exact
    // integer-micro neighborhood sums; one fixed-order float close.
    "q252_margin_pairs" -> ((s, dir) => {
      Knn.marginPairs(t(s, dir, "embeddings"), "vec_id", "embedding",
        k = 3, c = 16, nprobe = 2, portableHash = true)
        .orderBy("query_id", "rank")
    }),

    // Tokenizer fertility per language — pieces-per-word with the
    // RE2-portable piece regex; the per-language token-budget signal.
    "q253_fertility" -> ((s, dir) => {
      operators.TextAnalytics.tokenizerFertility(
        t(s, dir, "documents"), "lang", "text")
        .orderBy("key")
    }),

    // Per-domain boilerplate removal (CCNet/RefinedWeb step): two
    // injected chrome lines per synthetic domain must vanish from
    // every doc of that domain, organic lines survive.
    "q254_domain_boilerplate" -> ((s, dir) => {
      val dom = pmod(col("doc_id"), lit(12)).cast("string")
      val synth = t(s, dir, "documents").select(col("doc_id"),
        dom.as("dom"),
        concat(lit("NAV home about contact dom="), dom, lit("\n"),
          col("text"), lit("\nCopyright dom="), dom).as("raw"))
      Dedup.removeDomainBoilerplate(synth, "doc_id", "dom", "raw",
        minShare = 0.6, minDocs = 3)
        .orderBy("doc_id")
    }),

    // One-pass pairwise-complete Pearson correlation matrix over the
    // integer-quantized lineitem measures.
    "q255_corr_matrix" -> ((s, dir) => {
      operators.Stats.corrMatrix(
        t(s, dir, "lineitem").select(
          col("l_quantity").cast("long").as("qty"),
          round(col("l_extendedprice") * 100).cast("long").as("price_c"),
          round(col("l_discount") * 10000).cast("long").as("disc_bp"),
          round(col("l_tax") * 10000).cast("long").as("tax_bp")),
        Seq("qty", "price_c", "disc_bp", "tax_bp"))
        .orderBy("col_a", "col_b")
    }),

    // TPC-H Q2, FULL FIDELITY (round 9 — derived partsupp closes the
    // r8 schema gap): min-cost EUROPE supplier per qualifying part,
    // the correlated scalar MIN through a FOUR-TABLE join
    // (partsupp⋈supplier⋈nation⋈region) — the decorrelation must
    // aggregate over the whole snowflake and re-join on the outer
    // part key. Cost kept in integer cents (ps_supplycost_c).
    "q256_tpch_q2" -> ((s, dir) => {
      t(s, dir, "part").createOrReplaceTempView("g_part")
      t(s, dir, "supplier").createOrReplaceTempView("g_supplier")
      t(s, dir, "nation").createOrReplaceTempView("g_nation")
      t(s, dir, "region").createOrReplaceTempView("g_region")
      val nSup = t(s, dir, "supplier").count()
      s.sql(partsuppSparkSql(nSup)).createOrReplaceTempView("g_partsupp")
      s.sql("""
        SELECT CAST(round(s.s_acctbal * 100) AS BIGINT) AS acctbal_cents,
          s.s_name, n.n_name, p.p_partkey, ps.ps_supplycost_c
        FROM g_part p, g_supplier s, g_partsupp ps, g_nation n, g_region r
        WHERE p.p_partkey = ps.ps_partkey AND s.s_suppkey = ps.ps_suppkey
          AND p.p_size IN (5, 15, 25, 45) AND p.p_type LIKE '%MALL'
          AND s.s_nationkey = n.n_nationkey
          AND n.n_regionkey = r.r_regionkey AND r.r_name = 'EUROPE'
          AND ps.ps_supplycost_c = (
            SELECT MIN(ps2.ps_supplycost_c)
            FROM g_partsupp ps2, g_supplier s2, g_nation n2, g_region r2
            WHERE ps2.ps_partkey = p.p_partkey
              AND s2.s_suppkey = ps2.ps_suppkey
              AND s2.s_nationkey = n2.n_nationkey
              AND n2.n_regionkey = r2.r_regionkey AND r2.r_name = 'EUROPE')
        ORDER BY acctbal_cents DESC, n_name, s_name, p_partkey
        LIMIT 100""")
    }),

    // Greedy k-center coreset (farthest-first): 5 diversity-maximal
    // representatives of the embedding table, every pick replayed.
    "q262_kcenter_coreset" -> ((s, dir) => {
      Knn.kCenterCoreset(t(s, dir, "embeddings"), "vec_id", "embedding",
        k = 5).orderBy("rank")
    }),

    // Hard-negative band (DPR recipe): ranks 2..5 of the approximate
    // kNN graph per anchor — rank 1 reserved as presumed-positive.
    "q261_hard_negatives" -> ((s, dir) => {
      Knn.hardNegatives(t(s, dir, "embeddings"), "vec_id", "embedding",
        kLo = 2, kHi = 5, c = 16, nprobe = 2, portableHash = true)
        .orderBy("query_id", "rank")
    }),

    // Entropy l-diversity: the homogeneity-attack refinement beside
    // q200's distinct-count check — per (priority, year) group the
    // exact sensitive-status entropy in order-independent micros.
    "q260_entropy_ldiv" -> ((s, dir) => {
      operators.KeyChecks.entropyLDiversity(
        t(s, dir, "orders").select(col("o_orderpriority").as("pri"),
          year(col("o_orderdate")).cast("long").as("yr"),
          col("o_orderstatus").as("status")),
        Seq("pri", "yr"), "status", l = 2)
        .orderBy("pri", "yr")
    }),

    // TPC-H Q11, FULL FIDELITY (round 9 — derived partsupp): one
    // nation's inventory value per part, filtered by an UNCORRELATED
    // scalar fraction of the SAME three-way join in HAVING — pure
    // integer value (supplycost_c × availqty), integer DIV threshold.
    "q257_tpch_q11" -> ((s, dir) => {
      t(s, dir, "part").createOrReplaceTempView("g_part")
      t(s, dir, "supplier").createOrReplaceTempView("g_supplier")
      t(s, dir, "nation").createOrReplaceTempView("g_nation")
      val nSup = t(s, dir, "supplier").count()
      s.sql(partsuppSparkSql(nSup)).createOrReplaceTempView("g_partsupp")
      s.sql("""
        SELECT ps_partkey,
          CAST(SUM(ps_supplycost_c * ps_availqty) AS BIGINT) AS value_c
        FROM g_partsupp, g_supplier, g_nation
        WHERE ps_suppkey = s_suppkey AND s_nationkey = n_nationkey
          AND n_name = 'NATION_7'
        GROUP BY ps_partkey
        HAVING SUM(ps_supplycost_c * ps_availqty)
          > (SELECT SUM(ps_supplycost_c * ps_availqty) DIV 3000
             FROM g_partsupp, g_supplier, g_nation
             WHERE ps_suppkey = s_suppkey AND s_nationkey = n_nationkey
               AND n_name = 'NATION_7')
        ORDER BY value_c DESC, ps_partkey""")
    }),

    // TPC-H Q15 SHAPE: the top-revenue supplier — an aggregate CTE
    // referenced twice (row side + MAX scalar), exact micro-cents.
    "q258_tpch_q15" -> ((s, dir) => {
      t(s, dir, "lineitem").createOrReplaceTempView("g_lineitem")
      t(s, dir, "supplier").createOrReplaceTempView("g_supplier")
      s.sql("""
        WITH rev AS (
          SELECT l_suppkey,
            CAST(SUM(CAST(round(l_extendedprice * 100) AS BIGINT)
              * (10000 - CAST(round(l_discount * 10000) AS BIGINT)))
              AS BIGINT) AS total_e6
          FROM g_lineitem
          WHERE l_shipdate >= TIMESTAMP '1996-01-01'
            AND l_shipdate < TIMESTAMP '1996-04-01'
          GROUP BY l_suppkey)
        SELECT s_suppkey, s_name, total_e6
        FROM g_supplier JOIN rev ON s_suppkey = l_suppkey
        WHERE total_e6 = (SELECT MAX(total_e6) FROM rev)
        ORDER BY s_suppkey""")
    }),

    // TPC-H Q22 SHAPE: anti-join (customers with NO orders) gated by
    // an uncorrelated scalar AVG threshold — balances quantized to
    // integer cents INSIDE the subquery so the average replays
    // bit-identically.
    "q259_tpch_q22" -> ((s, dir) => {
      t(s, dir, "customer").createOrReplaceTempView("g_customer")
      t(s, dir, "orders").createOrReplaceTempView("g_orders")
      s.sql("""
        SELECT c_nationkey, CAST(COUNT(*) AS BIGINT) AS numcust,
          CAST(SUM(CAST(round(c_acctbal * 100) AS BIGINT)) AS BIGINT)
            AS totacctbal_c
        FROM g_customer c
        WHERE c_nationkey IN (1, 3, 5, 7)
          AND CAST(round(c_acctbal * 100) AS BIGINT)
            > (SELECT AVG(CAST(round(c2.c_acctbal * 100) AS BIGINT))
               FROM g_customer c2
               WHERE CAST(round(c2.c_acctbal * 100) AS BIGINT) > 0
                 AND c2.c_nationkey IN (1, 3, 5, 7))
          AND NOT EXISTS (SELECT 1 FROM g_orders o
                          WHERE o.o_custkey = c.c_custkey
                            AND o.o_orderpriority = '1-URGENT')
        GROUP BY c_nationkey
        ORDER BY c_nationkey""")
    }),

    // TPC-H Q7 SHAPE: volume shipping between two nations — the same
    // dimension table joined TWICE under different roles (nation n1
    // supplier-side, n2 customer-side) with the symmetric pair
    // disjunction applied across both aliases. Exact e6 revenue.
    "q263_tpch_q7" -> ((s, dir) => {
      t(s, dir, "lineitem").createOrReplaceTempView("g_lineitem")
      t(s, dir, "orders").createOrReplaceTempView("g_orders")
      t(s, dir, "customer").createOrReplaceTempView("g_customer")
      t(s, dir, "supplier").createOrReplaceTempView("g_supplier")
      t(s, dir, "nation").createOrReplaceTempView("g_nation")
      s.sql("""
        SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
          CAST(year(l.l_shipdate) AS BIGINT) AS l_year,
          CAST(SUM(CAST(round(l.l_extendedprice * 100) AS BIGINT)
            * (10000 - CAST(round(l.l_discount * 10000) AS BIGINT)))
            AS BIGINT) AS revenue_e6
        FROM g_supplier s, g_lineitem l, g_orders o, g_customer c,
             g_nation n1, g_nation n2
        WHERE s.s_suppkey = l.l_suppkey AND o.o_orderkey = l.l_orderkey
          AND c.c_custkey = o.o_custkey
          AND s.s_nationkey = n1.n_nationkey
          AND c.c_nationkey = n2.n_nationkey
          AND ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
            OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
          AND l.l_shipdate >= TIMESTAMP '1996-01-01'
          AND l.l_shipdate < TIMESTAMP '1998-01-01'
        GROUP BY 1, 2, 3
        ORDER BY supp_nation, cust_nation, l_year""")
    }),

    // TPC-H Q8 SHAPE: national market share — a conditional aggregate
    // (CASE on the supplier's nation) over a 6-table snowflake where
    // one branch of the nation dimension filters (customer region) and
    // the other only labels. Numerator and denominator kept as exact
    // e6 integers instead of the reference's float ratio.
    "q264_tpch_q8" -> ((s, dir) => {
      t(s, dir, "lineitem").createOrReplaceTempView("g_lineitem")
      t(s, dir, "orders").createOrReplaceTempView("g_orders")
      t(s, dir, "customer").createOrReplaceTempView("g_customer")
      t(s, dir, "supplier").createOrReplaceTempView("g_supplier")
      t(s, dir, "nation").createOrReplaceTempView("g_nation")
      t(s, dir, "part").createOrReplaceTempView("g_part")
      s.sql("""
        SELECT CAST(year(o.o_orderdate) AS BIGINT) AS o_year,
          CAST(SUM(CASE WHEN n2.n_name = 'NATION_3'
            THEN CAST(round(l.l_extendedprice * 100) AS BIGINT)
              * (10000 - CAST(round(l.l_discount * 10000) AS BIGINT))
            ELSE 0 END) AS BIGINT) AS nation_vol_e6,
          CAST(SUM(CAST(round(l.l_extendedprice * 100) AS BIGINT)
            * (10000 - CAST(round(l.l_discount * 10000) AS BIGINT)))
            AS BIGINT) AS total_vol_e6
        FROM g_part p, g_supplier s, g_lineitem l, g_orders o,
             g_customer c, g_nation n1, g_nation n2
        WHERE p.p_partkey = l.l_partkey AND s.s_suppkey = l.l_suppkey
          AND l.l_orderkey = o.o_orderkey AND o.o_custkey = c.c_custkey
          AND c.c_nationkey = n1.n_nationkey AND n1.n_regionkey = 0
          AND s.s_nationkey = n2.n_nationkey
          AND p.p_type = 'PROMO'
        GROUP BY 1
        ORDER BY o_year""")
    }),

    // TPC-H Q9 SHAPE: product-type profit — LIKE-filtered part join
    // with a two-term measure (revenue minus cost; p_retailprice
    // stands in for the absent ps_supplycost), grouped by the
    // SUPPLIER's nation and order year. Exact e6 profit.
    "q265_tpch_q9" -> ((s, dir) => {
      t(s, dir, "lineitem").createOrReplaceTempView("g_lineitem")
      t(s, dir, "orders").createOrReplaceTempView("g_orders")
      t(s, dir, "supplier").createOrReplaceTempView("g_supplier")
      t(s, dir, "nation").createOrReplaceTempView("g_nation")
      t(s, dir, "part").createOrReplaceTempView("g_part")
      s.sql("""
        SELECT n.n_name AS nation,
          CAST(year(o.o_orderdate) AS BIGINT) AS o_year,
          CAST(SUM(CAST(round(l.l_extendedprice * 100) AS BIGINT)
              * (10000 - CAST(round(l.l_discount * 10000) AS BIGINT))
            - CAST(round(p.p_retailprice * 100) AS BIGINT) * 10000
              * CAST(l.l_quantity AS BIGINT)) AS BIGINT) AS profit_e6
        FROM g_part p, g_supplier s, g_lineitem l, g_orders o, g_nation n
        WHERE s.s_suppkey = l.l_suppkey AND p.p_partkey = l.l_partkey
          AND o.o_orderkey = l.l_orderkey
          AND s.s_nationkey = n.n_nationkey
          AND p.p_name LIKE '%red%'
        GROUP BY 1, 2
        ORDER BY nation, o_year DESC""")
    }),

    // TPC-H Q12 SHAPE: two-way conditional counts after a fact-fact
    // join (l_returnflag stands in for the absent l_shipmode) — the
    // CASE-IN bucketing aggregate.
    "q266_tpch_q12" -> ((s, dir) => {
      t(s, dir, "lineitem").createOrReplaceTempView("g_lineitem")
      t(s, dir, "orders").createOrReplaceTempView("g_orders")
      s.sql("""
        SELECT l.l_returnflag AS shipmode,
          CAST(SUM(CASE WHEN o.o_orderpriority IN ('1-URGENT', '2-HIGH')
            THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
          CAST(SUM(CASE WHEN o.o_orderpriority IN ('1-URGENT', '2-HIGH')
            THEN 0 ELSE 1 END) AS BIGINT) AS low_line_count
        FROM g_orders o JOIN g_lineitem l ON o.o_orderkey = l.l_orderkey
        WHERE l.l_shipdate >= TIMESTAMP '1997-01-01'
          AND l.l_shipdate < TIMESTAMP '1998-01-01'
        GROUP BY 1
        ORDER BY shipmode""")
    }),

    // TPC-H Q13 SHAPE: customer order-count distribution — a LEFT
    // OUTER join with an extra non-key join predicate (the priority
    // exclusion must stay IN the join condition, not become a filter),
    // then a histogram over the per-customer counts.
    "q267_tpch_q13" -> ((s, dir) => {
      t(s, dir, "orders").createOrReplaceTempView("g_orders")
      t(s, dir, "customer").createOrReplaceTempView("g_customer")
      s.sql("""
        SELECT c_count, CAST(COUNT(*) AS BIGINT) AS custdist FROM (
          SELECT c.c_custkey,
            CAST(COUNT(o.o_orderkey) AS BIGINT) AS c_count
          FROM g_customer c LEFT OUTER JOIN g_orders o
            ON c.c_custkey = o.o_custkey
            AND o.o_orderpriority <> '4-NOT SPECIFIED'
          GROUP BY c.c_custkey) t
        GROUP BY c_count
        ORDER BY custdist DESC, c_count DESC""")
    }),

    // TPC-H Q14 SHAPE: promo revenue share — conditional numerator
    // over a dimension attribute with a tight date slice; exact e6
    // numerator/denominator instead of the float percentage.
    "q268_tpch_q14" -> ((s, dir) => {
      t(s, dir, "lineitem").createOrReplaceTempView("g_lineitem")
      t(s, dir, "part").createOrReplaceTempView("g_part")
      s.sql("""
        SELECT
          CAST(SUM(CASE WHEN p.p_type = 'PROMO'
            THEN CAST(round(l.l_extendedprice * 100) AS BIGINT)
              * (10000 - CAST(round(l.l_discount * 10000) AS BIGINT))
            ELSE 0 END) AS BIGINT) AS promo_e6,
          CAST(SUM(CAST(round(l.l_extendedprice * 100) AS BIGINT)
            * (10000 - CAST(round(l.l_discount * 10000) AS BIGINT)))
            AS BIGINT) AS total_e6
        FROM g_lineitem l JOIN g_part p ON l.l_partkey = p.p_partkey
        WHERE l.l_shipdate >= TIMESTAMP '1997-03-01'
          AND l.l_shipdate < TIMESTAMP '1997-04-01'""")
    }),

    // TPC-H Q16, FULL FIDELITY (round 9 — derived partsupp):
    // COUNT(DISTINCT ps_suppkey) per attribute triple with a NOT-IN
    // exclusion subquery (null-aware anti join on partsupp's
    // supplier key).
    "q269_tpch_q16" -> ((s, dir) => {
      t(s, dir, "part").createOrReplaceTempView("g_part")
      t(s, dir, "supplier").createOrReplaceTempView("g_supplier")
      val nSup = t(s, dir, "supplier").count()
      s.sql(partsuppSparkSql(nSup)).createOrReplaceTempView("g_partsupp")
      s.sql("""
        SELECT p.p_brand, p.p_type, p.p_size,
          CAST(COUNT(DISTINCT ps.ps_suppkey) AS BIGINT) AS supplier_cnt
        FROM g_part p JOIN g_partsupp ps ON p.p_partkey = ps.ps_partkey
        WHERE p.p_brand <> 'Brand#4' AND p.p_type NOT LIKE 'MED%'
          AND p.p_size IN (1, 9, 14, 19, 23, 36, 45, 49)
          AND ps.ps_suppkey NOT IN (SELECT s_suppkey FROM g_supplier
                                    WHERE s_name LIKE '%000000014%')
        GROUP BY 1, 2, 3
        ORDER BY supplier_cnt DESC, p_brand, p_type, p_size""")
    }),

    // TPC-H Q19 SHAPE: a DISJUNCTION of cross-table conjunctions
    // (brand × size × quantity brackets) — the predicate must ride the
    // equi-join as a post-join condition without degrading the join
    // itself to a nested loop.
    "q270_tpch_q19" -> ((s, dir) => {
      t(s, dir, "lineitem").createOrReplaceTempView("g_lineitem")
      t(s, dir, "part").createOrReplaceTempView("g_part")
      s.sql("""
        SELECT
          CAST(SUM(CAST(round(l.l_extendedprice * 100) AS BIGINT)
            * (10000 - CAST(round(l.l_discount * 10000) AS BIGINT)))
            AS BIGINT) AS revenue_e6,
          CAST(COUNT(*) AS BIGINT) AS n_lines
        FROM g_lineitem l JOIN g_part p ON p.p_partkey = l.l_partkey
        WHERE (p.p_brand = 'Brand#12' AND p.p_size BETWEEN 1 AND 5
            AND l.l_quantity BETWEEN 1 AND 11)
           OR (p.p_brand = 'Brand#23' AND p.p_size BETWEEN 1 AND 10
            AND l.l_quantity BETWEEN 10 AND 20)
           OR (p.p_brand = 'Brand#4' AND p.p_size BETWEEN 1 AND 15
            AND l.l_quantity BETWEEN 20 AND 30)""")
    }),

    // HITS hubs/authorities in exact path-count form over the
    // customer→supplier engagement graph; supplier ids negated into
    // their own namespace (the q219 id-collapse lesson).
    "q271_hits" -> ((s, dir) => {
      val e = t(s, dir, "orders").join(t(s, dir, "lineitem"),
          col("o_orderkey") === col("l_orderkey"))
        .select(col("o_custkey").as("src"),
          (-col("l_suppkey") - 1).as("dst"))
        .distinct() // classical 0/1 adjacency, not purchase-weighted
      Graph.hitsCounts(e, "src", "dst", rounds = 2).orderBy("node")
    }),

    // Adamic–Adar link prediction: supplier pairs sharing customers,
    // promiscuous customers df-capped away, per-neighbor log terms
    // micro-quantized pre-sum.
    "q272_adamic_adar" -> ((s, dir) => {
      val e = t(s, dir, "orders").join(t(s, dir, "lineitem"),
          col("o_orderkey") === col("l_orderkey"))
        .select(col("l_suppkey").as("s"), col("o_custkey").as("c"))
      Graph.adamicAdar(e, "s", "c", maxDeg = 40, minCommon = 2)
        .orderBy("a", "b")
    }),

    // Kruskal–Wallis rank test per line status across return-flag
    // groups — integer double-ranks, micro-quantized ratio terms.
    "q273_kruskal_wallis" -> ((s, dir) => {
      operators.Stats.kruskalWallis(t(s, dir, "lineitem"),
        "l_linestatus", "l_returnflag", "l_quantity")
        .orderBy("stratum")
    }),

    // Unary inclusion-dependency profile across the star schema: the
    // four real FKs hold; the two reversed/cross probes measure how
    // far containment fails.
    "q274_inclusion_deps" -> ((s, dir) => {
      operators.KeyChecks.inclusionDeps(Seq(
        ("cust_nation_in_nation", t(s, dir, "customer"), "c_nationkey",
          t(s, dir, "nation"), "n_nationkey"),
        ("li_part_in_part", t(s, dir, "lineitem"), "l_partkey",
          t(s, dir, "part"), "p_partkey"),
        ("li_supp_in_supplier", t(s, dir, "lineitem"), "l_suppkey",
          t(s, dir, "supplier"), "s_suppkey"),
        ("ord_cust_in_customer", t(s, dir, "orders"), "o_custkey",
          t(s, dir, "customer"), "c_custkey"),
        ("part_in_li_part", t(s, dir, "part"), "p_partkey",
          t(s, dir, "lineitem"), "l_partkey"),
        ("supp_nation_in_cust_nation", t(s, dir, "supplier"),
          "s_nationkey", t(s, dir, "customer"), "c_nationkey")))
        .orderBy("pair")
    }),

    // One DoReMi reweighting step over the document domains: initial
    // weights ∝ doc counts, excess loss = relative mean-length
    // deviation, η=2, 10% uniform smoothing.
    "q275_doremi_step" -> ((s, dir) => {
      val g = t(s, dir, "documents").groupBy(col("source").as("domain"))
        .agg(count(lit(1)).as("n"), sum("n_chars").as("sc"))
      val tot = g.agg(sum("n").as("tn"), sum("sc").as("tsc"))
      val avgAll = col("tsc").cast("double") / col("tn").cast("double")
      val d = g.crossJoin(broadcast(tot))
        .select(col("domain"),
          expr("n * 1000000L div tn").as("weight_ppm"),
          round((col("sc").cast("double") / col("n").cast("double") -
            avgAll) / avgAll * 1e6).cast("long").as("loss_micro"))
      Sampling.doremiStep(d, "domain", "weight_ppm", "loss_micro",
        etaMicro = 2000000L, smoothPpm = 100000L)
        .orderBy("domain")
    }),

    // Matryoshka truncation audit: recall@5 of the 8-dim prefix
    // retrieval against the full 64-dim exact top-5.
    "q276_matryoshka" -> ((s, dir) => {
      val emb = t(s, dir, "embeddings")
      val queries = emb.where(col("vec_id") % 50 === 0)
      Knn.matryoshkaRecall(emb, "vec_id", "embedding",
        queries, "vec_id", "embedding", k = 5, prefixDims = 8)
        .orderBy("query_id")
    }),

    // Cliff's delta: stochastic dominance of R-flag over A-flag
    // quantities per line status, from value cells.
    "q299_cliffs_delta" -> ((s, dir) => {
      operators.Stats.cliffsDelta(t(s, dir, "lineitem"),
        "l_linestatus", "l_returnflag", "R", "A", "l_quantity")
        .orderBy("stratum")
    }),

    // Kendall τ-b between quantity and discount basis points, from
    // the 50×11 contingency cells — never row pairs.
    "q298_kendall_tau" -> ((s, dir) => {
      operators.Stats.kendallTauB(
        t(s, dir, "lineitem").select(
          col("l_quantity").cast("long").as("qty"),
          round(col("l_discount") * 100).cast("long").as("disc_pct")),
        "qty", "disc_pct")
    }),

    // g3 approximate-FD error: how far is l_partkey → l_linestatus
    // from holding (min fraction of rows to remove)?
    "q297_fd_error" -> ((s, dir) => {
      operators.KeyChecks.fdError(t(s, dir, "lineitem"),
        Seq("l_partkey"), "l_linestatus")
    }),

    // Ljung–Box portmanteau over each event type's daily series:
    // pooled lag-1..4 autocorrelation, white-noise screen.
    "q296_ljung_box" -> ((s, dir) => {
      operators.TimeSeries.ljungBox(events(s, dir), "event_type", "ts",
        maxLag = 4)
        .orderBy("key")
    }),

    // Salted skew join: lineitem ⋈ supplier on a salt-composited key,
    // row-identical to the plain join the oracle runs.
    "q295_salted_join" -> ((s, dir) => {
      val j = operators.Joins.saltedJoin(
        t(s, dir, "lineitem").select(col("l_suppkey").as("s_suppkey"),
          round(col("l_extendedprice") * 100).cast("long").as("cents")),
        t(s, dir, "supplier").select(col("s_suppkey"), col("s_name")),
        "s_suppkey", salts = 8)
      j.groupBy("s_name").agg(count(lit(1)).as("n"),
        sum("cents").as("cents_total"))
        .orderBy("s_name")
    }),

    // Split-conformal threshold per priority: the k-th smallest cent
    // total with k = ceil((n+1)·0.9), selected from value cells.
    "q292_conformal" -> ((s, dir) => {
      operators.Stats.conformalThreshold(
        t(s, dir, "orders").select(col("o_orderpriority").as("pri"),
          round(col("o_totalprice") * 100).cast("long").as("cents")),
        "pri", "cents", alphaPpm = 100000L)
        .orderBy("group")
    }),

    // Gini–Simpson token diversity per source — the concentration
    // readout beside the entropy family.
    "q293_simpson" -> ((s, dir) => {
      operators.TextAnalytics.simpsonDiversity(t(s, dir, "documents"),
        "source", "text")
        .orderBy("group")
    }),

    // Nelson–Aalen cumulative hazard over the q228 survival frame —
    // the additive sibling of Kaplan–Meier on identical cells.
    "q294_nelson_aalen" -> ((s, dir) => {
      val ev = events(s, dir)
      val a = ev.where(col("event_type") === "view")
        .groupBy(col("user_id").as("u"))
        .agg(min(unix_micros(col("ts"))).as("ta"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val conv = ev.where(col("event_type") === "purchase")
        .select(col("user_id").as("u"), unix_micros(col("ts")).as("tb"))
        .join(a, Seq("u")).where(col("tb") > col("ta"))
        .groupBy("u", "ta").agg(min("tb").as("tb"))
        .select(col("u"), expr("(tb - ta) div 1000000L").as("t"),
          lit(true).as("e"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val last = ev.groupBy(col("user_id").as("u"))
        .agg(max(unix_micros(col("ts"))).as("tmax"))
      val cens = a.join(last, Seq("u"))
        .join(conv.select(col("u"), lit(1).as("__c")), Seq("u"), "left_anti")
        .select(col("u"), expr("(tmax - ta) div 1000000L").as("t"),
          lit(false).as("e"))
      val subjects = conv.unionByName(cens)
        .withColumn("cohort", concat(lit("c"), pmod(col("u"), lit(2L))))
      operators.Stats.nelsonAalen(subjects, "cohort", "t", "e")
        .orderBy("key", "t")
    }),

    // One-pass multi-needle scan (Aho–Corasick): per-doc occurrence
    // counts of five border-free needles — equals the replace-based
    // non-overlapping oracle exactly because the needles are
    // border-free.
    "q290_multi_needle" -> ((s, dir) => {
      TextAnalytics.multiNeedleScan(t(s, dir, "documents"), "doc_id",
        "text", Seq("spark", "batch window", "key agg",
          "customer query", "slow key"))
        .orderBy("doc_id", "needle")
    }),

    // Misra–Gries candidates + exact verify pass: bounded-memory
    // heavy hitters whose final top-15 equals the unconstrained
    // exact top-15.
    "q291_heavy_hitters" -> ((s, dir) => {
      TextAnalytics.heavyHitters(t(s, dir, "documents"), "text",
        k = 256, topN = 15)
    }),

    // Holt level+trend smoothing (α=β=1/2) per user in exact integer
    // millis — floor-halving via arithmetic shift on both engines.
    "q288_holt" -> ((s, dir) => {
      operators.TimeSeries.holtHalfPerKey(
        events(s, dir).select(col("user_id"), col("ts"),
          round(col("value") * 1000).cast("long").as("milli")),
        "user_id", "ts", "milli")
        .orderBy("user_id")
    }),

    // UniMax waterfill of a fixed character budget across sources at
    // maxEpochs=2 — exact integer closed form, crumbs deterministic.
    "q289_unimax" -> ((s, dir) => {
      operators.Sampling.unimaxAllocation(t(s, dir, "documents"),
        "source", "n_chars", budget = 600000L, maxEpochs = 2L)
        .select(col("group").as("grp"), col("n_units"), col("capacity"),
          col("capped"), col("alloc"))
        .orderBy("grp")
    }),

    // Benjamini–Hochberg step-up over portable-hash pseudo p-values:
    // the reject set is decided in pure integer arithmetic.
    "q284_bh_fdr" -> ((s, dir) => {
      val tests = t(s, dir, "nation").select(col("n_name").as("test"),
        pmod(graft.functions.Hashes.md5Hash64(col("n_name")),
          lit(1000000L)).as("p_micro"))
      operators.Stats.bhFdr(tests, "test", "p_micro",
        alphaMicro = 200000L)
        .orderBy("rank")
    }),

    // Pairwise source-vocabulary overlap: exact intersection/union
    // sizes and integer Jaccard for all 190 source pairs.
    "q285_vocab_overlap" -> ((s, dir) => {
      operators.TextAnalytics.vocabOverlap(t(s, dir, "documents"),
        "source", "text")
        .orderBy("g_a", "g_b")
    }),

    // Neyman budget allocation across order priorities by exact
    // integer largest-remainder apportionment of B·N_h·σ_h.
    "q286_neyman" -> ((s, dir) => {
      operators.Sampling.neymanAllocation(
        t(s, dir, "orders").select(col("o_orderpriority").as("pri"),
          round(col("o_totalprice") * 100).cast("long").as("cents")),
        "pri", "cents", budget = 1000L)
        .orderBy("stratum")
    }),

    // Cochran–Armitage dose-ordered trend: does the F-status rate
    // drift with the numeric priority level?
    "q287_cochran_armitage" -> ((s, dir) => {
      operators.Stats.cochranArmitage(
        t(s, dir, "orders").select(
          substring(col("o_orderpriority"), 1, 1).cast("long")
            .as("dose"),
          (col("o_orderstatus") === "F").as("success")),
        "dose", "success")
    }),

    // Deterministic synchronous label propagation on the symmetrized
    // mod-hub graph: 3 rounds, mode-of-neighbors with the fixed
    // (count desc, label asc) tie-break.
    "q283_label_prop" -> ((s, dir) => {
      val docs = t(s, dir, "documents").select(col("doc_id"))
      val edges = docs.select(col("doc_id").as("src"),
          pmod(col("doc_id"), lit(97)).as("dst"))
        .union(docs.select(col("doc_id").as("src"),
          pmod(col("doc_id"), lit(31)).as("dst")))
      operators.Graph.labelPropagation(edges, "src", "dst", rounds = 3)
        .orderBy("node")
    }),

    // RAKE keyphrases over the corpus: stopword/punct-delimited
    // candidate phrases, degree/frequency word scores, top 25.
    "q282_rake" -> ((s, dir) => {
      operators.TextAnalytics.rakeKeywords(t(s, dir, "documents"), "text",
        Seq("the", "a", "an", "of", "and", "or", "to", "in", "on", "for",
          "with", "is", "are", "was", "be", "as", "at", "by", "it",
          "this", "that", "from"), topN = 25, maxWords = 4)
    }),

    // Gap-constrained episode pairs (WINEPI length-2): which event
    // types follow which within 24h of the same user's stream, every
    // in-window occurrence pair counted.
    "q280_episode_pairs" -> ((s, dir) => {
      operators.Sequences.episodePairs(events(s, dir), "user_id", "ts",
        "event_type", gapSeconds = 86400L, minSupport = 10L)
        .orderBy("a", "b")
    }),

    // Positional phrase index: exact two-word phrase occurrences via
    // position intersection — must equal the token-scan ground truth.
    "q281_phrase_search" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      val tmp = java.nio.file.Files.createTempDirectory("graft_pos").toString
      operators.InvertedIndex.writePositional(docs, "doc_id", "text", tmp,
        buckets = 16)
      operators.InvertedIndex.searchPhrase(s, tmp, "table hash")
        .orderBy("doc_id")
    }),

    // t-closeness EMD audit per (priority, year) cell over bucketed
    // order totals — the privacy triad's third leg beside q200/q260.
    "q278_tcloseness" -> ((s, dir) => {
      operators.KeyChecks.tCloseness(
        t(s, dir, "orders").select(col("o_orderpriority").as("pri"),
          year(col("o_orderdate")).cast("long").as("yr"),
          floor(col("o_totalprice") / 20000.0).cast("long").as("bucket")),
        Seq("pri", "yr"), "bucket", tMicro = 150000L)
        .orderBy("pri", "yr")
    }),

    // Personalized PageRank on the q94 mod-hub graph, teleport mass
    // concentrated on the doc_id%50 seed set, 3 exact integer rounds.
    "q279_ppr" -> ((s, dir) => {
      val docs = t(s, dir, "documents").select(col("doc_id"))
      val edges = docs.select(col("doc_id").as("src"),
          pmod(col("doc_id"), lit(97)).as("dst"))
        .union(docs.select(col("doc_id").as("src"),
          pmod(col("doc_id"), lit(31)).as("dst")))
        .where(col("src") =!= col("dst"))
      val seeds = docs.where(pmod(col("doc_id"), lit(50)) === 0)
        .select(col("doc_id").as("node"))
      operators.Graph.personalizedPagerankInt(edges, "src", "dst",
        seeds, "node", iters = 3)
        .orderBy("node")
    }),

    // Jarque–Bera normality per return flag from exact integer power
    // sums; the one float close is IEEE-deterministic (+,−,×,÷,√).
    "q277_jarque_bera" -> ((s, dir) => {
      operators.Stats.jarqueBera(
        t(s, dir, "lineitem").select(col("l_returnflag").as("flag"),
          col("l_quantity").cast("long").as("qty")),
        "flag", "qty")
        .orderBy("key")
    }),

    // The CDR fetch-step twin (reference data-raw/get_xbrl_zips.py):
    // quarterly period ends in range with the exact bulk-zip names the
    // pipeline's listZips pattern expects — pure date arithmetic, no
    // network, no table scan.
    "q243_fetch_plan" -> ((s, dir) => {
      graft.pipeline.FfiecPipeline.fetchPlan(s, "2001-01-01", "2005-12-31",
        kind = "xbrl")
    }),

    // Which order columns could serve as keys? One multi-distinct
    // aggregate over the column list.
    "q238_candidate_keys" -> ((s, dir) => {
      operators.KeyChecks.candidateKeys(t(s, dir, "orders"),
        Seq("o_orderkey", "o_custkey", "o_orderstatus", "o_orderdate"))
    }),

    // Exact equi-depth bucket boundaries per priority from the
    // rank-selected quantiles — the histogram layout planners want
    // when value skew breaks fixed-width bins.
    "q239_equidepth" -> ((s, dir) => {
      operators.Stats.quantilesPerKey(
        t(s, dir, "orders").select(col("o_orderpriority").as("p"),
          round(col("o_totalprice") * 100).cast("long").as("cents")),
        "p", "cents", Seq(250000L, 500000L, 750000L, 1000000L))
        .orderBy("key", "p_micro")
    }),

    // Composite candidate-key discovery over the arity-2 lattice:
    // o_orderkey is the only single key, so its three pairs are
    // lattice-IMPLIED (-1 sentinels, never scanned); of the scanned
    // pairs, (custkey,totalprice) and (orderdate,totalprice) surface
    // as MINIMAL composite keys.
    "q240_composite_keys" -> ((s, dir) => {
      operators.KeyChecks.compositeKeys(t(s, dir, "orders"),
        Seq("o_custkey", "o_orderdate", "o_orderkey", "o_totalprice"),
        maxArity = 2)
        .orderBy("arity", "columns")
    }),

    // Arity-3 lattice SCAN path: no single or pair among these four
    // lineitem columns is a key, so level 3 actually scans — and
    // (l_orderkey, l_partkey, l_suppkey) surfaces as the only
    // minimal TRIPLE key ((l_orderkey, l_linenumber) is famously
    // non-unique in this synthetic data).
    "q249_composite_arity3" -> ((s, dir) => {
      operators.KeyChecks.compositeKeys(t(s, dir, "lineitem"),
        Seq("l_linenumber", "l_orderkey", "l_partkey", "l_suppkey"),
        maxArity = 3)
        .orderBy("arity", "columns")
    }),

    // Arity-3 lattice PRUNE path: o_orderkey (single) and the two
    // pair keys imply every one of the four triples — level 3 emits
    // only -1 sentinels and never scans (the compounding claim the
    // arity-2 gate q240 could not exercise).
    "q250_composite_pruned" -> ((s, dir) => {
      operators.KeyChecks.compositeKeys(t(s, dir, "orders"),
        Seq("o_custkey", "o_orderdate", "o_orderkey", "o_totalprice"),
        maxArity = 3)
        .orderBy("arity", "columns")
    }),

    // Zipf rank-frequency fit over the corpus's top-200 tokens — the
    // "is this natural language?" diagnostic: k-bounded top terms,
    // micro-quantized log-log OLS closed in one fixed-order float
    // expression (q219 discipline).
    "q244_zipf_fit" -> ((s, dir) => {
      operators.TextAnalytics.zipfFit(t(s, dir, "documents"), "text",
        maxRank = 200)
    }),

    // Brown-Forsythe spread homogeneity of doc length across sources:
    // exact type-1 medians per group, |x - median| deviations, then
    // the one-way ANOVA F over the deviations.
    "q245_brown_forsythe" -> ((s, dir) => {
      operators.Stats.brownForsythe(
        t(s, dir, "documents").where(col("source").isNotNull),
        "source", "n_chars")
    }),

    // Gumbel method-of-moments fit over calendar-month block maxima
    // of event value milli-units — the extreme-value screen.
    "q246_gumbel" -> ((s, dir) => {
      operators.Stats.gumbelBlockMaxima(
        events(s, dir).select(col("ts"),
          round(col("value") * 1000).cast("long").as("v")),
        "ts", "v")
    }),

    // Jensen-Shannon divergence between the source mixes of the
    // English and non-English corpus halves, per-value terms.
    "q247_js_divergence" -> ((s, dir) => {
      val d = t(s, dir, "documents").where(col("source").isNotNull)
      operators.KeyChecks.jsDivergenceCells(
        d.where(col("lang") === "en"),
        d.where(col("lang") =!= "en"), "source")
        .orderBy("v")
    }),

    "q36_asof_join" -> ((s, dir) => {
      // dedupe orders to one per (custkey, orderdate) so the as-of pick
      // is unique, then point-in-time join events → latest prior order
      val w = Window.partitionBy("o_custkey", "o_orderdate").orderBy("o_orderkey")
      val orders1 = t(s, dir, "orders")
        .withColumn("__rn", row_number().over(w)).where(col("__rn") === 1).drop("__rn")
        .select("o_custkey", "o_orderdate", "o_orderkey", "o_totalprice")
      val ev = events(s, dir).select("event_id", "user_id", "ts")
      operators.AsOfJoin.asOf(ev, "user_id", "ts", "event_id",
        orders1, "o_custkey", "o_orderdate", "o_orderkey")
        .select(col("event_id"), col("user_id"), col("o_orderkey"),
          // o_orderdate is TIMESTAMP_NTZ; epoch via LTZ (session is UTC)
          col("o_orderdate").cast("timestamp_ltz").cast("long").as("order_epoch"),
          col("o_totalprice"))
        .orderBy("event_id")
    })
  )

  // --- DuckDB oracles -------------------------------------------------------

  private val normText =
    """trim(regexp_replace(lower(text), '\s+', ' ', 'g'))"""

  /** q144's FS field spec — shared between the gate query and the
    * oracle so both engines inline the identical micro weights. */
  private val fsFields = Seq(
    ("c_name", "c_name", 0.95, 0.0001),
    ("c_mktsegment", "c_mktsegment", 0.9, 0.2), // 5 segments: u is high
    ("c_acctbal", "c_acctbal", 0.9, 0.0001))

  private val toksLower =
    """list_filter(string_split_regex(trim(lower(text)), '\s+'), x -> x <> '')"""

  /** The q23 marker-word language prediction as a CTE chain over a
    * source CTE/table exposing (doc_id, text) — shared by the
    * q303/q307 agreement oracles (q23/q227 keep their inline copies).
    * Emits three CTE definitions named `${p}t`, `${p}h`, `${p}p`;
    * `${p}p` holds (doc_id, cat). */
  private def langPredCtes(src: String, p: String): String =
    s"""${p}t AS (SELECT doc_id, $toksLower AS toks FROM $src),
       |${p}h AS (SELECT doc_id,
       |  len(list_filter(toks, x -> list_contains(['der','die','und','ist','nicht','das','ein','zu'], x))) AS de,
       |  len(list_filter(toks, x -> list_contains(['the','and','is','of','to','in','that','it'], x))) AS en,
       |  len(list_filter(toks, x -> list_contains(['el','la','de','que','los','una','es','por'], x))) AS es,
       |  len(list_filter(toks, x -> list_contains(['le','la','les','des','est','une','dans','pas'], x))) AS fr
       |  FROM ${p}t),
       |${p}p AS (SELECT doc_id,
       |  CASE WHEN greatest(de, en, es, fr) = 0 THEN 'und'
       |       WHEN de >= en AND de >= es AND de >= fr THEN 'de'
       |       WHEN en >= es AND en >= fr THEN 'en'
       |       WHEN es >= fr THEN 'es'
       |       ELSE 'fr' END AS cat
       |  FROM ${p}h)""".stripMargin

  /** The q65 kNN-GRAPH edge derivation (bottom-16 md5 centroids,
    * nprobe-2 probe, 6-dp cosine, rank ≤ 3) as a CTE chain ending in
    * `ranked` — shared by the q65 gate and the q325 beam-search
    * oracle, which navigates these exact edges. */
  private lazy val knnGraphCtes: String =
    s"""hashed AS (
       |  SELECT vec_id, embedding,
       |    ${md5Hash64Sql("CAST(vec_id AS VARCHAR)")} AS h
       |  FROM embeddings),
       |cents AS (
       |  SELECT h AS cell, CAST(embedding AS DOUBLE[]) AS cvec
       |  FROM hashed ORDER BY h LIMIT 16),
       |assign AS (
       |  SELECT hd.vec_id AS id, hd.embedding AS vec, c.cell,
       |    row_number() OVER (PARTITION BY hd.vec_id
       |      ORDER BY list_cosine_similarity(CAST(hd.embedding AS DOUBLE[]), c.cvec) DESC,
       |               c.cell DESC) AS rn
       |  FROM hashed hd CROSS JOIN cents c),
       |cells AS (SELECT id, vec, cell FROM assign WHERE rn = 1),
       |qa AS (
       |  SELECT query_id, qvec, cell FROM (
       |    SELECT q.vec_id AS query_id, q.embedding AS qvec, c.cell,
       |      row_number() OVER (PARTITION BY q.vec_id
       |        ORDER BY list_cosine_similarity(CAST(q.embedding AS DOUBLE[]), c.cvec) DESC,
       |                 c.cell DESC) AS rk
       |    FROM embeddings q CROSS JOIN cents c) x
       |  WHERE rk <= 2),
       |scored AS (
       |  SELECT qa.query_id, cl.id AS neighbor_id,
       |    ROUND(${cosSql("cl.vec", "qa.qvec")}, 6) AS sim
       |  FROM cells cl JOIN qa ON cl.cell = qa.cell
       |  WHERE cl.id <> qa.query_id),
       |ranked AS (
       |  SELECT query_id, neighbor_id, sim,
       |    row_number() OVER (PARTITION BY query_id
       |                       ORDER BY sim DESC, neighbor_id ASC) AS rank
       |  FROM scored)""".stripMargin

  /** Beam-walk CTE generator for the graph-index oracles: multi-seed
    * start (score every per-cell entry, keep the top `beam`), then
    * `hops` expand/score/trim rounds — the SQL twin of
    * Knn.beamSearchIndexed. `qCte`(qid, qvec DOUBLE[]),
    * `vCte`(node, nvec DOUBLE[]), `eCte`(src, dst), `entCte`(node).
    * Emits CTEs `${pfx}s0`, `${pfx}b0` .. `${pfx}b$hops`; the final
    * beam is `${pfx}b$hops`(qid, node, sim). */
  private def graphBeamCtes(pfx: String, qCte: String, vCte: String,
                            eCte: String, entCte: String,
                            beam: Int, hops: Int): String = {
    val sb = new StringBuilder
    sb.append(
      s"""${pfx}s0 AS (
         |  SELECT q.qid, en.node,
         |    ROUND(list_cosine_similarity(v.nvec, q.qvec), 6) AS sim
         |  FROM $qCte q CROSS JOIN $entCte en
         |  JOIN $vCte v ON v.node = en.node),
         |${pfx}b0 AS (
         |  SELECT qid, node, sim FROM (
         |    SELECT *, row_number() OVER (PARTITION BY qid
         |      ORDER BY sim DESC, node ASC) AS rn FROM ${pfx}s0)
         |  WHERE rn <= $beam)""".stripMargin)
    for (h <- 1 to hops) {
      val p = s"${pfx}b${h - 1}"
      sb.append(",\n").append(
        s"""${pfx}c$h AS (
           |  SELECT qid, node FROM $p
           |  UNION SELECT $p.qid, e.dst AS node
           |        FROM $p JOIN $eCte e ON e.src = $p.node),
           |${pfx}s$h AS (
           |  SELECT c.qid, c.node,
           |    ROUND(list_cosine_similarity(v.nvec, q.qvec), 6) AS sim
           |  FROM ${pfx}c$h c JOIN $vCte v ON v.node = c.node
           |       JOIN $qCte q ON q.qid = c.qid),
           |${pfx}b$h AS (
           |  SELECT qid, node, sim FROM (
           |    SELECT *, row_number() OVER (PARTITION BY qid
           |      ORDER BY sim DESC, node ASC) AS rn FROM ${pfx}s$h)
           |  WHERE rn <= $beam)""".stripMargin)
    }
    sb.toString
  }

  private val shinglesSql =
    s"""WITH toks AS (
       |  SELECT doc_id,
       |         list_filter(string_split_regex($normText, ' '), x -> x <> '') AS tk
       |  FROM documents
       |), sh AS (
       |  SELECT doc_id,
       |         list_distinct(CASE WHEN len(tk) < 3 THEN [array_to_string(tk, ' ')]
       |           ELSE list_transform(range(1, len(tk) - 1),
       |                               i -> tk[i] || ' ' || tk[i+1] || ' ' || tk[i+2])
       |           END) AS sh
       |  FROM toks
       |), ex AS (
       |  SELECT doc_id, len(sh) AS n_sh, unnest(sh) AS shingle FROM sh
       |)""".stripMargin

  private def cosSql(a: String, b: String): String =
    s"list_cosine_similarity(CAST($a AS DOUBLE[]), CAST($b AS DOUBLE[]))"

  /** Deterministic derived PARTSUPP — the dbgen partsupp generator
    * (4 suppliers per part, stride S/4 + partkey/S, 0-based keys)
    * re-expressed as pure non-negative integer SQL so BOTH engines
    * derive the IDENTICAL table (the test schema ships no partsupp
    * parquet; this closes the Q2/Q11/Q16/Q20 fidelity gap without
    * touching the read-only testdata). availqty / supplycost_c are
    * affine mixes mod primes — integers end-to-end, so no decimal
    * drift can enter the oracle compare. Spark side: `n` (the
    * supplier count) is inlined as a LITERAL and the 4-way fan-out is
    * `explode(array(...))` — a Generate over the part scan, ZERO
    * joins, so the TPC-H PlanSpec no-BNLJ asserts keep their teeth
    * (a VALUES cross join would plan as a 1×4 BroadcastNestedLoop). */
  private def partsuppSparkSql(n: Long): String =
    s"""SELECT ps_partkey, ps_suppkey,
       |  (ps_partkey * 7 + i * 13) % 9999 + 1 AS ps_availqty,
       |  (ps_partkey * 31 + ps_suppkey * 17) % 99901 + 100
       |    AS ps_supplycost_c
       |FROM (SELECT ps_partkey, i,
       |        (ps_partkey + i * (${n / 4}L + ps_partkey DIV ${n}L))
       |          % ${n}L AS ps_suppkey
       |      FROM (SELECT p_partkey AS ps_partkey,
       |              explode(array(0L, 1L, 2L, 3L)) AS i
       |            FROM g_part))""".stripMargin

  /** The DuckDB twin of [[partsuppSparkSql]]: same math with `n`
    * computed in-query (oracle strings are static — no data access),
    * `//` for the truncating division Spark spells `DIV` (both
    * truncate; operands non-negative, so they agree exactly). */
  private val partsuppDuckSql: String =
    """SELECT p_partkey AS ps_partkey,
      |  (p_partkey + i.i * ((ns.n // 4) + (p_partkey // ns.n))) % ns.n
      |    AS ps_suppkey,
      |  (p_partkey * 7 + i.i * 13) % 9999 + 1 AS ps_availqty,
      |  (p_partkey * 31
      |    + ((p_partkey + i.i * ((ns.n // 4) + (p_partkey // ns.n)))
      |       % ns.n) * 17) % 99901 + 100 AS ps_supplycost_c
      |FROM part
      |CROSS JOIN (VALUES (0), (1), (2), (3)) AS i(i)
      |CROSS JOIN (SELECT COUNT(*) AS n FROM supplier) ns""".stripMargin

  /** md5-hex first-15-chars → 60-bit int, the DuckDB twin of
    * Hashes.md5Hash64. The lambda variable is deliberately obscure
    * (`__hx`): DuckDB lambda parameters shadow same-named OUTER
    * column references inside `x`, which silently de-correlates any
    * caller passing e.g. a row index named `i` (the q222 join-size
    * oracle hit exactly that — its sketch rows all hashed alike). */
  private def md5Hash64Sql(x: String): String =
    s"""list_reduce(list_transform(range(1,16), __hx ->
       |      CAST(strpos('0123456789abcdef', substr(md5($x), __hx, 1)) - 1 AS BIGINT)),
       |    (a, b) -> a * 16 + b)""".stripMargin

  /** The exact hyperplanes Dedup.embeddingPairs(seed=7) draws, inlined
    * as SQL literals so the oracle replays the same buckets — one row
    * per (table, plane). Doubles are rendered with Double.toString
    * (shortest round-trip form), which DuckDB parses back to the
    * identical double. */
  private def hyperplanesSql(planes: Int, dim: Int, seed: Long,
                             tables: Int = 1): String = {
    val rnd = new scala.util.Random(seed)
    val all = Seq.fill(tables)(Seq.fill(planes)(Seq.fill(dim)(rnd.nextGaussian())))
    (for ((hps, t) <- all.zipWithIndex; (hp, i) <- hps.zipWithIndex)
      yield s"($t, $i, [${hp.map(_.toString).mkString(", ")}])")
      .mkString(",\n      ")
  }

  /** The per-slot XOR salts Md5MinHashSig uses, as DuckDB VALUES rows
    * (regenerated from the same splitmix64 stream). */
  private def xorSaltsSql(k: Int, seed: Long): String =
    graft.plans.Md5Kernel.salts(k, seed).zipWithIndex
      .map { case (s, j) => s"($j, $s)" }.mkString(", ")

  /** Shared CTE chain for the BPE oracles: `rounds` merge rounds
    * unrolled — per round, the weighted adjacent-pair argmax (ties
    * (f DESC, a, b)) and the greedy-leftmost rewrite as the SAME
    * wrapped-symbol string replace the Spark trainer runs (Bpe.train:
    * chr(31)=SEP before, chr(30)=END after each symbol — both
    * boundaries pinned, so the pattern can never false-match a
    * symbol's prefix mid-symbol); `word` rides along so the
    * token-count oracle can join the final vocabulary back to docs. */
  /** Byte j (1-based) of a DuckDB string's UTF-8 encoding, parsed from
    * the hex dump (the md5Hash64Sql strpos discipline — no blob
    * indexing needed). */
  private def byteAtSql(word: String, j: String): String =
    s"""(16 * (strpos('0123456789ABCDEF',
       |         substr(hex(encode($word)), 2 * $j - 1, 1)) - 1)
       |   + strpos('0123456789ABCDEF',
       |         substr(hex(encode($word)), 2 * $j, 1)) - 1)""".stripMargin

  /** GPT-2 bytes_to_unicode as a CASE over a byte expression — the
    * DuckDB twin of BpeKernel.byteToUnicode: identity for the
    * printable/latin ranges, 256+n in byte order for the shifted rest
    * (0–32 → +256, 127–160 → +162, 173 → 323). */
  private def byteRemapSql(b: String): String =
    s"""chr(CAST(CASE WHEN ($b BETWEEN 33 AND 126) OR ($b BETWEEN 161 AND 172)
       |            OR ($b >= 174) THEN $b
       |         WHEN $b <= 32 THEN 256 + $b
       |         WHEN $b <= 160 THEN $b + 162
       |         ELSE 323 END AS INTEGER))""".stripMargin

  private def bpeRoundsCte(rounds: Int, byteLevel: Boolean = false): String = {
    val roundCtes = (1 to rounds).map { r =>
      s"""p$r AS (
         |  SELECT u.a AS a, u.b AS b, CAST(SUM(freq) AS BIGINT) AS f FROM (
         |    SELECT unnest(list_transform(range(1, len(t)),
         |             i -> struct_pack(a := t[i], b := t[i+1]))) AS u, freq
         |    FROM (SELECT string_split(substr(symstr, 2, len(symstr) - 2),
         |                              chr(30)||chr(31)) AS t, freq
         |          FROM w${r - 1}) x) y
         |  GROUP BY u.a, u.b),
         |b$r AS (SELECT a, b, f FROM p$r ORDER BY f DESC, a ASC, b ASC LIMIT 1),
         |w$r AS (SELECT word,
         |          replace(symstr, chr(31)||a||chr(30)||chr(31)||b||chr(30),
         |                  chr(31)||a||b||chr(30)) AS symstr,
         |          freq
         |        FROM w${r - 1} CROSS JOIN b$r)""".stripMargin
    }.mkString(",\n")
    val sym =
      if (byteLevel) byteRemapSql(byteAtSql("word", "j"))
      else "word[j]"
    val n = if (byteLevel) "octet_length(encode(word))" else "len(word)"
    s"""WITH w0 AS (
       |  SELECT word,
       |         array_to_string(
       |           list_transform(range(1, $n+1),
       |                          j -> chr(31) || $sym || chr(30)), '') AS symstr,
       |         CAST(f AS BIGINT) AS freq
       |  FROM (SELECT tok AS word, COUNT(*) AS f
       |        FROM (SELECT unnest($toksLower) AS tok FROM documents) z
       |        GROUP BY tok) wc),
       |$roundCtes""".stripMargin
  }

  /** The q85 oracle: the merge list itself. */
  /** Vocab CTEs shared by q115/q116 (expects bpeRoundsCte's w0/b1..b8
    * in scope): base chars with lexical contiguous ids, then
    * first-occurrence merge outputs appended in rank order. */
  private lazy val bpeVocabCtes: String =
    s"""chars AS (
       |  SELECT DISTINCT t AS token FROM (
       |    SELECT unnest(list_transform(range(1, len(word)+1),
       |                                 j -> word[j])) AS t
       |    FROM w0) x
       |  WHERE t <> ''),
       |base AS (
       |  SELECT token,
       |    CAST(row_number() OVER (ORDER BY token) - 1 AS BIGINT) AS id
       |  FROM chars),
       |msteps AS (
       |  ${(1 to 8).map(r => s"SELECT $r AS step, a || b AS token FROM b$r").mkString("\n  UNION ALL ")}),
       |mfirst AS (SELECT token, MIN(step) AS st FROM msteps GROUP BY token),
       |mids AS (
       |  SELECT token,
       |    (SELECT COUNT(*) FROM base)
       |      + CAST(row_number() OVER (ORDER BY st) - 1 AS BIGINT) AS id
       |  FROM mfirst)""".stripMargin

  private def bpeOracleSql(rounds: Int, byteLevel: Boolean = false): String = {
    val steps = (1 to rounds).map(r =>
      s"SELECT $r AS step, a AS lhs, b AS rhs, a || b AS merged, f AS freq FROM b$r")
      .mkString("\n  UNION ALL ")
    s"""${bpeRoundsCte(rounds, byteLevel)}
       |SELECT step, lhs, rhs, merged, freq FROM (
       |  $steps) m
       |ORDER BY step""".stripMargin
  }

  /** The q92 oracle: per-doc subword counts under the learned merges —
    * the final round's per-word symbol counts joined back to each
    * doc's word instances. */
  private def bpeTokensOracleSql(rounds: Int,
                                 docFilter: String = "doc_id < 100"): String =
    s"""${bpeRoundsCte(rounds)},
       |vocab AS (
       |  SELECT word,
       |         CAST(len(string_split(substr(symstr, 2, len(symstr) - 2),
       |                               chr(30)||chr(31))) AS BIGINT) AS ntok
       |  FROM w$rounds),
       |docw AS (
       |  SELECT doc_id, unnest($toksLower) AS word
       |  FROM documents WHERE $docFilter)
       |SELECT dw.doc_id,
       |  CAST(SUM(v.ntok) AS BIGINT) AS n_bpe_tokens,
       |  COUNT(*) AS n_words
       |FROM docw dw JOIN vocab v USING (word)
       |GROUP BY dw.doc_id ORDER BY dw.doc_id""".stripMargin

  /** Ordered sequential dot product — same fold as Vectors.dot
    * (aggregate over zip_with), so the sign test is bit-identical. */
  private def seqDotSql(vec: String, plane: String, dim: Int): String =
    s"list_reduce(list_transform(range(1, ${dim + 1}), j -> CAST($vec[j] AS DOUBLE) * $plane[j]), (a, b) -> a + b)"

  /** Seeded gaussian PQ codebooks [m][k][subDim], shared by the q51
    * gate query and its oracle (inlined via pqBooksSql). */
  private def pqBooks(m: Int, k: Int, subDim: Int,
                      seed: Long): Array[Array[Array[Double]]] = {
    val rnd = new scala.util.Random(seed)
    Array.fill(m)(Array.fill(k)(Array.fill(subDim)(rnd.nextGaussian())))
  }

  /** The same codebooks as DuckDB VALUES rows (s, c, cw). */
  private def pqBooksSql(m: Int, k: Int, subDim: Int, seed: Long): String = {
    val books = pqBooks(m, k, subDim, seed)
    (for (s <- 0 until m; c <- 0 until k)
      yield s"($s, $c, [${books(s)(c).map(_.toString).mkString(", ")}])")
      .mkString(",\n      ")
  }

  /** For each key in queries, equivalent SQL runnable by DuckDB on the
    * same parquet tables. Non-SQL-expressible ops are omitted (driver
    * records a rows-only check). */
  def oracleSql: Map[String, String] = Map(
    "q01_pricing_summary" ->
      """SELECT l_returnflag, l_linestatus,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(28,4))) AS DOUBLE) AS sum_qty,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(28,4))) AS DOUBLE) AS sum_base_price,
        |  CAST(SUM(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(28,4))) AS DOUBLE) AS sum_disc_price,
        |  COUNT(*) AS count_order,
        |  ROUND(CAST(SUM(CAST(l_quantity AS DECIMAL(28,4))) AS DOUBLE) / COUNT(*), 6) AS avg_qty
        |FROM lineitem
        |WHERE l_shipdate <= TIMESTAMP '2001-09-02'
        |GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag, l_linestatus""".stripMargin,

    "q02_filter_project" ->
      """SELECT l_orderkey, l_linenumber, l_extendedprice, l_discount
        |FROM lineitem
        |WHERE l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1998-01-01'
        |  AND l_discount >= 0.05 AND l_discount <= 0.07 AND l_quantity < 24
        |ORDER BY l_orderkey, l_linenumber, l_extendedprice, l_discount""".stripMargin,

    "q03_join_agg" ->
      """SELECT r_name, n_name,
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(28,4))) AS DOUBLE) AS revenue,
        |  COUNT(*) AS n_orders
        |FROM orders
        |JOIN customer ON o_custkey = c_custkey
        |JOIN nation ON c_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |GROUP BY r_name, n_name
        |ORDER BY r_name, n_name""".stripMargin,

    "q04_sort_limit" ->
      """SELECT o_orderkey, o_custkey, o_totalprice
        |FROM orders
        |ORDER BY o_totalprice DESC, o_orderkey ASC
        |LIMIT 20""".stripMargin,

    "q05_window" ->
      """SELECT o_custkey, o_orderkey, o_totalprice, rnk FROM (
        |  SELECT o_custkey, o_orderkey, o_totalprice,
        |    ROW_NUMBER() OVER (PARTITION BY o_custkey
        |                       ORDER BY o_totalprice DESC, o_orderkey ASC) AS rnk
        |  FROM orders) x
        |WHERE rnk <= 3
        |ORDER BY o_custkey, rnk""".stripMargin,

    "q06_exists_semi" ->
      """SELECT c_custkey, c_name, c_mktsegment
        |FROM customer
        |WHERE EXISTS (SELECT 1 FROM orders
        |              WHERE o_custkey = c_custkey AND o_totalprice > 200000)
        |ORDER BY c_custkey""".stripMargin,

    "q07_combine_parts" ->
      """SELECT c_custkey,
        |  COALESCE(CASE WHEN c_custkey % 3 = 0 THEN NULL ELSE c_name END, c_name) AS c_name,
        |  c_nationkey, c_acctbal
        |FROM customer
        |ORDER BY c_custkey""".stripMargin,

    "q08_unpivot_long" ->
      """SELECT DISTINCT l_orderkey, l_linenumber, item, value FROM (
        |  UNPIVOT (SELECT l_orderkey, l_linenumber, l_quantity, l_extendedprice,
        |                  l_discount, l_tax FROM lineitem)
        |  ON COLUMNS(* EXCLUDE (l_orderkey, l_linenumber))
        |  INTO NAME item VALUE value) u
        |WHERE value IS NOT NULL
        |ORDER BY l_orderkey, l_linenumber, item, value""".stripMargin,

    "q09_pivot_wide" ->
      """SELECT o_custkey,
        |  CAST(SUM(CASE WHEN o_orderpriority = '1-URGENT' THEN CAST(o_totalprice AS DECIMAL(28,4)) END) AS DOUBLE) AS p_urgent,
        |  CAST(SUM(CASE WHEN o_orderpriority = '2-HIGH' THEN CAST(o_totalprice AS DECIMAL(28,4)) END) AS DOUBLE) AS p_high,
        |  CAST(SUM(CASE WHEN o_orderpriority = '3-MEDIUM' THEN CAST(o_totalprice AS DECIMAL(28,4)) END) AS DOUBLE) AS p_medium,
        |  CAST(SUM(CASE WHEN o_orderpriority = '4-NOT SPECIFIED' THEN CAST(o_totalprice AS DECIMAL(28,4)) END) AS DOUBLE) AS p_notspec,
        |  CAST(SUM(CASE WHEN o_orderpriority = '5-LOW' THEN CAST(o_totalprice AS DECIMAL(28,4)) END) AS DOUBLE) AS p_low
        |FROM orders
        |GROUP BY o_custkey
        |ORDER BY o_custkey""".stripMargin,

    "q10_parse_dates" ->
      """SELECT o_orderkey, date_str,
        |  CASE WHEN trim(date_str) IN ('', '0', '00000000') THEN NULL
        |       ELSE CAST(try_strptime(trim(date_str), '%Y%m%d') AS DATE) END AS parsed_date
        |FROM (SELECT o_orderkey,
        |        CASE WHEN o_orderkey % 97 = 0 THEN '0'
        |             WHEN o_orderkey % 89 = 0 THEN '99991399'
        |             WHEN o_orderkey % 83 = 0 THEN '00000000'
        |             ELSE strftime(o_orderdate, '%Y%m%d') END AS date_str
        |      FROM orders) x
        |ORDER BY o_orderkey""".stripMargin,

    "q11_id_zero_null" ->
      """SELECT c_custkey,
        |  CASE WHEN trim(id_raw) IN ('', '0') THEN NULL ELSE trim(id_raw) END AS id_clean
        |FROM (SELECT c_custkey,
        |        CASE WHEN c_custkey % 10 = 0 THEN '0'
        |             WHEN c_custkey % 7 = 0 THEN ' '
        |             ELSE CAST(c_custkey AS VARCHAR) END AS id_raw
        |      FROM customer) x
        |ORDER BY c_custkey""".stripMargin,

    "q12_pct_to_prop" ->
      """SELECT l_orderkey, l_linenumber,
        |  ROUND(CAST(regexp_replace(pct_str, '[%,]', '', 'g') AS DOUBLE) / 100.0, 4) AS prop
        |FROM (SELECT l_orderkey, l_linenumber,
        |        CAST(CAST(ROUND(l_discount * 100, 0) AS INTEGER) AS VARCHAR) || '%' AS pct_str
        |      FROM lineitem) x
        |ORDER BY l_orderkey, l_linenumber, prop""".stripMargin,

    "q13_check_pk" ->
      """SELECT o_custkey, COUNT(*) AS n
        |FROM orders GROUP BY o_custkey HAVING COUNT(*) > 1
        |ORDER BY o_custkey""".stripMargin,

    "q14_null_counts" ->
      """WITH src AS (
        |  SELECT CASE WHEN c_custkey % 5 = 0 THEN NULL ELSE c_name END AS c_name,
        |         CASE WHEN c_custkey % 11 = 0 THEN NULL ELSE c_acctbal END AS c_acctbal
        |  FROM customer),
        |long AS (
        |  SELECT 'c_name' AS col_name,
        |         CAST(COUNT(*) FILTER (c_name IS NULL) AS BIGINT) AS n_na FROM src
        |  UNION ALL
        |  SELECT 'c_acctbal',
        |         CAST(COUNT(*) FILTER (c_acctbal IS NULL) AS BIGINT) FROM src)
        |SELECT col_name, n_na FROM long WHERE n_na > 0 ORDER BY col_name""".stripMargin,

    "q15_dedup_exact" ->
      s"""SELECT md5($normText) AS fp, MIN(doc_id) AS doc_id, COUNT(*) AS n_dupes
         |FROM documents GROUP BY 1 ORDER BY fp""".stripMargin,

    "q16_ngram_jaccard" ->
      s"""$shinglesSql,
         |capped AS (
         |  SELECT * FROM ex QUALIFY COUNT(*) OVER (PARTITION BY shingle) <= 1000)
         |SELECT id_a, id_b, ROUND(jaccard, 6) AS jaccard FROM (
         |  SELECT a.doc_id AS id_a, b.doc_id AS id_b,
         |         COUNT(*) * 1.0 / (a.n_sh + b.n_sh - COUNT(*)) AS jaccard
         |  FROM capped a JOIN capped b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
         |  GROUP BY a.doc_id, b.doc_id, a.n_sh, b.n_sh) p
         |WHERE jaccard >= 0.5
         |ORDER BY id_a, id_b""".stripMargin,

    "q17_minhash_dedup" ->
      s"""$shinglesSql,
         |hs AS (SELECT doc_id, ${md5Hash64Sql("shingle")} AS h FROM ex),
         |slot AS (
         |  SELECT doc_id, j, MIN(xor(h, salt)) AS m
         |  FROM hs CROSS JOIN (VALUES ${xorSaltsSql(64, 42L)}) s(j, salt)
         |  GROUP BY doc_id, j),
         |sig AS (SELECT doc_id, list(m ORDER BY j) AS sig FROM slot GROUP BY doc_id),
         |banded AS (
         |  SELECT doc_id, b, md5(array_to_string(sig[b*4+1 : b*4+4], ',')) AS bucket, sig
         |  FROM sig CROSS JOIN (SELECT unnest(range(16)) AS b) bb
         |  QUALIFY COUNT(*) OVER (PARTITION BY b, bucket) <= 1000),
         |pairs AS (
         |  SELECT a.doc_id AS id_a, b.doc_id AS id_b,
         |         any_value(a.sig) AS sig_a, any_value(b.sig) AS sig_b
         |  FROM banded a JOIN banded b
         |    ON a.b = b.b AND a.bucket = b.bucket AND a.doc_id < b.doc_id
         |  GROUP BY a.doc_id, b.doc_id)
         |SELECT id_a, id_b, est_jaccard FROM (
         |  SELECT id_a, id_b,
         |    ROUND(len(list_filter(range(1,65), i -> sig_a[i] = sig_b[i])) / 64.0, 6) AS est_jaccard
         |  FROM pairs) p
         |WHERE est_jaccard >= 0.35
         |ORDER BY id_a, id_b""".stripMargin,

    "q57_duplicated_windows" ->
      s"""WITH toks AS (
         |  SELECT doc_id, list_filter(string_split_regex($normText, ' '), x -> x <> '') AS tk
         |  FROM documents),
         |wins AS (
         |  SELECT doc_id, unnest(CASE WHEN len(tk) < 3 THEN [array_to_string(tk, ' ')]
         |    ELSE list_transform(range(1, len(tk) - 1),
         |                        i -> tk[i] || ' ' || tk[i+1] || ' ' || tk[i+2]) END) AS w
         |  FROM toks),
         |g AS (SELECT w, COUNT(*) AS c FROM wins GROUP BY w),
         |per AS (
         |  SELECT x.doc_id, COUNT(*) AS tot,
         |         SUM(CASE WHEN g.c >= 2 THEN 1 ELSE 0 END) AS dup
         |  FROM wins x JOIN g USING (w) GROUP BY x.doc_id)
         |SELECT doc_id, ROUND(dup * 1.0 / tot, 6) AS dup_frac
         |FROM per ORDER BY doc_id""".stripMargin,

    // Span removal replay: windows with positions, per-window count +
    // first-occurrence exemption (row_number over (doc_id, pos)), and
    // the token rewrite as a list_filter with DuckDB's 1-BASED lambda
    // index (Spark's filter index is 0-based — hence i - 1).
    "q59_remove_dup_spans" ->
      """WITH toks AS (
        |  SELECT doc_id,
        |    list_filter(string_split_regex(COALESCE(text, ''), '\s+'), x -> x <> '') AS tk
        |  FROM documents),
        |wins AS (
        |  SELECT doc_id, u.pos, u.w FROM (
        |    SELECT doc_id, unnest(list_transform(range(1, greatest(len(tk) - 1, 1)), i ->
        |      struct_pack(pos := i - 1, w := tk[i] || ' ' || tk[i+1] || ' ' || tk[i+2]))) AS u
        |    FROM toks) x),
        |occ AS (
        |  SELECT doc_id, pos,
        |    row_number() OVER (PARTITION BY w ORDER BY doc_id, pos) AS rn,
        |    COUNT(*) OVER (PARTITION BY w) AS c
        |  FROM wins),
        |spans AS (
        |  SELECT doc_id, list(pos ORDER BY pos) AS starts
        |  FROM occ WHERE c >= 2 AND rn > 1 GROUP BY doc_id),
        |joined AS (
        |  SELECT t.doc_id, t.tk, s.starts FROM toks t
        |  LEFT JOIN spans s ON t.doc_id = s.doc_id),
        |kept AS (
        |  SELECT doc_id, tk,
        |    CASE WHEN starts IS NULL THEN tk
        |         ELSE list_filter(tk, (x, i) ->
        |           NOT len(list_filter(starts, ss -> i - 1 >= ss AND i - 1 <= ss + 2)) > 0)
        |    END AS kp
        |  FROM joined)
        |SELECT doc_id,
        |  COALESCE(array_to_string(kp, ' '), '') AS clean_text,
        |  CAST(len(tk) AS INT) AS n_tokens,
        |  CAST(len(tk) - len(kp) AS INT) AS n_removed
        |FROM kept ORDER BY doc_id""".stripMargin,

    // Components via WITH RECURSIVE transitive closure — a different
    // algorithm than the Spark side's large-star/small-star, agreeing
    // on the fixpoint. Closure stays small: epsilon-graph components
    // at this tau are a handful of docs each.
    "q66_semdedup_graph" ->
      s"""WITH RECURSIVE p AS (
         |  SELECT a.vec_id AS id_a, b.vec_id AS id_b
         |  FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
         |  WHERE ${cosSql("a.embedding", "b.embedding")} >= 0.45),
         |e AS (SELECT id_a AS u, id_b AS v FROM p
         |      UNION SELECT id_b, id_a FROM p),
         |r(u, v) AS (
         |  SELECT u, v FROM e
         |  UNION
         |  SELECT r.u, e.v FROM r JOIN e ON r.v = e.u),
         |m AS (SELECT u AS id, LEAST(u, MIN(v)) AS rep FROM r GROUP BY u)
         |SELECT id, rep FROM m ORDER BY id""".stripMargin,

    // Ground-truth oracle, not a replay: with chain edges (k, k-3) the
    // components are exactly the residue classes mod 3, so the
    // expected rep is the class minimum — a closed form the window MIN
    // computes directly.
    "q60_connected_components" ->
      """WITH ids AS (
        |  SELECT c_custkey AS id FROM customer WHERE c_custkey > 3
        |  UNION
        |  SELECT c_custkey - 3 FROM customer WHERE c_custkey > 3)
        |SELECT id, MIN(id) OVER (PARTITION BY id % 3) AS rep
        |FROM ids ORDER BY id""".stripMargin,

    // Cross-corpus decontamination: same signature/banding replay as
    // q17, with the pair join split train-side × eval-side. The
    // hot-bucket QUALIFY runs over ALL banded rows (each doc bands on
    // exactly one side, so the union equals the full corpus banding —
    // key-for-key the operator's union cap).
    "q58_decontam_pairs" ->
      s"""$shinglesSql,
         |hs AS (SELECT doc_id, ${md5Hash64Sql("shingle")} AS h FROM ex),
         |slot AS (
         |  SELECT doc_id, j, MIN(xor(h, salt)) AS m
         |  FROM hs CROSS JOIN (VALUES ${xorSaltsSql(64, 42L)}) s(j, salt)
         |  GROUP BY doc_id, j),
         |sig AS (SELECT doc_id, list(m ORDER BY j) AS sig FROM slot GROUP BY doc_id),
         |banded AS (
         |  SELECT doc_id, b, md5(array_to_string(sig[b*4+1 : b*4+4], ',')) AS bucket, sig
         |  FROM sig CROSS JOIN (SELECT unnest(range(16)) AS b) bb
         |  QUALIFY COUNT(*) OVER (PARTITION BY b, bucket) <= 1000),
         |pairs AS (
         |  SELECT a.doc_id AS id_l, b.doc_id AS id_r,
         |         any_value(a.sig) AS sig_l, any_value(b.sig) AS sig_r
         |  FROM banded a JOIN banded b
         |    ON a.b = b.b AND a.bucket = b.bucket
         |  WHERE a.doc_id % 10 <> 0 AND b.doc_id % 10 = 0
         |  GROUP BY a.doc_id, b.doc_id)
         |SELECT id_l, id_r, est_jaccard FROM (
         |  SELECT id_l, id_r,
         |    ROUND(len(list_filter(range(1,65), i -> sig_l[i] = sig_r[i])) / 64.0, 6) AS est_jaccard
         |  FROM pairs) p
         |WHERE est_jaccard >= 0.35
         |ORDER BY id_l, id_r""".stripMargin,

    // Store-probe replay: identical banding to q58, batch = odd ids
    // (left), store = even ids (right). The operator's hot-bucket cap
    // sums prebuilt store counts + batch counts, which equals the full
    // corpus banding count — key-for-key this QUALIFY.
    "q82_minhash_store" ->
      s"""$shinglesSql,
         |hs AS (SELECT doc_id, ${md5Hash64Sql("shingle")} AS h FROM ex),
         |slot AS (
         |  SELECT doc_id, j, MIN(xor(h, salt)) AS m
         |  FROM hs CROSS JOIN (VALUES ${xorSaltsSql(64, 42L)}) s(j, salt)
         |  GROUP BY doc_id, j),
         |sig AS (SELECT doc_id, list(m ORDER BY j) AS sig FROM slot GROUP BY doc_id),
         |banded AS (
         |  SELECT doc_id, b, md5(array_to_string(sig[b*4+1 : b*4+4], ',')) AS bucket, sig
         |  FROM sig CROSS JOIN (SELECT unnest(range(16)) AS b) bb
         |  QUALIFY COUNT(*) OVER (PARTITION BY b, bucket) <= 1000),
         |pairs AS (
         |  SELECT a.doc_id AS id_new, b.doc_id AS id_store,
         |         any_value(a.sig) AS sig_new, any_value(b.sig) AS sig_store
         |  FROM banded a JOIN banded b
         |    ON a.b = b.b AND a.bucket = b.bucket
         |  WHERE a.doc_id % 2 = 1 AND b.doc_id % 2 = 0
         |  GROUP BY a.doc_id, b.doc_id)
         |SELECT id_new, id_store, est_jaccard FROM (
         |  SELECT id_new, id_store,
         |    ROUND(len(list_filter(range(1,65), i -> sig_new[i] = sig_store[i])) / 64.0, 6) AS est_jaccard
         |  FROM pairs) p
         |WHERE est_jaccard >= 0.35
         |ORDER BY id_new, id_store""".stripMargin,

    // q82's replay over the post-delete universe: doc_id % 8 = 0 rows
    // vanish from the banded CTE BEFORE the hot-bucket QUALIFY — after
    // compactStore the recounted bucket_counts must make the Spark
    // probe's cap accounting identical to a store that never held them.
    "q97_store_compacted" ->
      s"""$shinglesSql,
         |hs AS (SELECT doc_id, ${md5Hash64Sql("shingle")} AS h FROM ex),
         |slot AS (
         |  SELECT doc_id, j, MIN(xor(h, salt)) AS m
         |  FROM hs CROSS JOIN (VALUES ${xorSaltsSql(64, 42L)}) s(j, salt)
         |  GROUP BY doc_id, j),
         |sig AS (SELECT doc_id, list(m ORDER BY j) AS sig FROM slot GROUP BY doc_id),
         |banded AS (
         |  SELECT doc_id, b, md5(array_to_string(sig[b*4+1 : b*4+4], ',')) AS bucket, sig
         |  FROM sig CROSS JOIN (SELECT unnest(range(16)) AS b) bb
         |  WHERE doc_id % 8 <> 0
         |  QUALIFY COUNT(*) OVER (PARTITION BY b, bucket) <= 1000),
         |pairs AS (
         |  SELECT a.doc_id AS id_new, b.doc_id AS id_store,
         |         any_value(a.sig) AS sig_new, any_value(b.sig) AS sig_store
         |  FROM banded a JOIN banded b
         |    ON a.b = b.b AND a.bucket = b.bucket
         |  WHERE a.doc_id % 2 = 1 AND b.doc_id % 2 = 0
         |  GROUP BY a.doc_id, b.doc_id)
         |SELECT id_new, id_store, est_jaccard FROM (
         |  SELECT id_new, id_store,
         |    ROUND(len(list_filter(range(1,65), i -> sig_new[i] = sig_store[i])) / 64.0, 6) AS est_jaccard
         |  FROM pairs) p
         |WHERE est_jaccard >= 0.35
         |ORDER BY id_new, id_store""".stripMargin,

    // Same fidelity-digest posture as q83, WARC framing instead of
    // JSON escaping; sum_chars recomputed from text on both sides.
    "q105_warc_roundtrip" ->
      """SELECT lang, source, COUNT(*) AS n_docs,
        |  CAST(SUM(length(text)) AS BIGINT) AS sum_chars,
        |  MIN(md5(text)) AS min_md5
        |FROM documents GROUP BY lang, source ORDER BY lang, source""".stripMargin,

    // The oracle reads the ORIGINAL parquet — the Spark side must
    // round-trip through JSONL (plus planted garbage lines) and land on
    // identical values, digest included.
    "q83_jsonl_roundtrip" ->
      """SELECT lang, source, COUNT(*) AS n_docs,
        |  CAST(SUM(n_chars) AS BIGINT) AS sum_chars,
        |  MIN(md5(text)) AS min_md5
        |FROM documents GROUP BY lang, source ORDER BY lang, source""".stripMargin,

    // SQ8 replay: min/max recomputed per dimension, then the same
    // round-encode and the same ordered dequantized-dot fold. ROUND(x)
    // is half-away-from-zero in both engines (all operands >= 0 here),
    // and CAST after ROUND is exact, so codes match bit-for-bit.
    "q84_sq8_adc" ->
      """WITH rng AS (
        |  SELECT d, MIN(CAST(embedding[d] AS DOUBLE)) AS mn,
        |         MAX(CAST(embedding[d] AS DOUBLE)) AS mx
        |  FROM embeddings CROSS JOIN (SELECT unnest(range(1, 65)) AS d) dd
        |  GROUP BY d),
        |scd AS (SELECT d, mn,
        |         CASE WHEN mx = mn THEN 0.0 ELSE (mx - mn) / 255.0 END AS sc
        |       FROM rng),
        |mnl AS (SELECT list(mn ORDER BY d) AS mn, list(sc ORDER BY d) AS sc FROM scd),
        |codes AS (
        |  SELECT vec_id, list_transform(range(1, 65), d ->
        |    CASE WHEN sc[d] = 0 THEN 0
        |         ELSE CAST(ROUND((CAST(embedding[d] AS DOUBLE) - mn[d]) / sc[d]) AS INT)
        |    END) AS codes
        |  FROM embeddings CROSS JOIN mnl),
        |q AS (SELECT vec_id AS query_id, embedding AS qvec
        |      FROM embeddings WHERE vec_id % 100 = 0),
        |scored AS (
        |  SELECT q.query_id, c.vec_id AS neighbor_id,
        |    ROUND(list_reduce(list_transform(range(1, 65), d ->
        |      CAST(q.qvec[d] AS DOUBLE) * (mn[d] + codes[d] * sc[d])),
        |      (a, b) -> a + b), 6) AS sim
        |  FROM codes c CROSS JOIN q CROSS JOIN mnl
        |  WHERE c.vec_id <> q.query_id),
        |ranked AS (
        |  SELECT query_id, neighbor_id, sim,
        |         ROW_NUMBER() OVER (PARTITION BY query_id
        |                            ORDER BY sim DESC, neighbor_id ASC) AS rank
        |  FROM scored)
        |SELECT query_id, neighbor_id, sim, rank FROM ranked WHERE rank <= 5
        |ORDER BY query_id, rank""".stripMargin,

    "q300_bq_hamming" ->
      """WITH rng AS (
        |  SELECT d, MIN(CAST(embedding[d] AS DOUBLE)) AS mn,
        |         MAX(CAST(embedding[d] AS DOUBLE)) AS mx
        |  FROM embeddings CROSS JOIN (SELECT unnest(range(1, 65)) AS d) dd
        |  GROUP BY d),
        |thl AS (SELECT list((mn + mx) / 2.0 ORDER BY d) AS th FROM rng),
        |bits AS (
        |  SELECT vec_id,
        |    list_reduce(list_transform(range(1, 64), d ->
        |      CASE WHEN CAST(embedding[d] AS DOUBLE) > th[d]
        |           THEN (CAST(1 AS BIGINT) << ((d - 1) % 63)) ELSE 0 END),
        |      (a, b) -> a | b) AS w0,
        |    CASE WHEN CAST(embedding[64] AS DOUBLE) > th[64]
        |         THEN CAST(1 AS BIGINT) ELSE 0 END AS w1
        |  FROM embeddings CROSS JOIN thl),
        |q AS (SELECT vec_id AS query_id, w0 AS q0, w1 AS q1
        |      FROM bits WHERE vec_id % 100 = 0),
        |scored AS (
        |  SELECT q.query_id, b.vec_id AS neighbor_id,
        |    CAST(64 - bit_count(xor(b.w0, q.q0))
        |            - bit_count(xor(b.w1, q.q1)) AS DOUBLE) AS sim
        |  FROM bits b CROSS JOIN q
        |  WHERE b.vec_id <> q.query_id),
        |ranked AS (
        |  SELECT query_id, neighbor_id, sim,
        |         ROW_NUMBER() OVER (PARTITION BY query_id
        |                            ORDER BY sim DESC, neighbor_id ASC) AS rank
        |  FROM scored)
        |SELECT query_id, neighbor_id, sim, rank FROM ranked WHERE rank <= 5
        |ORDER BY query_id, rank""".stripMargin,

    "q301_winnowing" ->
      s"""WITH norm AS (
         |  SELECT doc_id AS id,
         |    trim(regexp_replace(lower(text), '\\s+', ' ', 'g')) AS t
         |  FROM documents WHERE doc_id % 5 = 0),
         |g AS (SELECT id, t, length(t) - 7 AS n FROM norm),
         |hs AS (SELECT id, n, list_transform(range(1, n + 1), __d ->
         |    ${md5Hash64Sql("substr(t, __d, 8)")}) AS hl FROM g),
         |wm AS (SELECT id, hl, list_transform(range(1, n - 6), __s2 ->
         |    list_min(hl[__s2 : __s2 + 7])) AS wl FROM hs),
         |picks AS (SELECT id, hl,
         |    list_distinct(list_transform(range(1, len(wl) + 1), __s ->
         |      list_max(list_transform(range(__s, __s + 8), __p ->
         |        CASE WHEN hl[__p] = wl[__s]
         |             THEN CAST(__p AS BIGINT)
         |             ELSE CAST(-1 AS BIGINT) END)))) AS pl
         |  FROM wm),
         |r AS (SELECT id, hl, unnest(pl) AS pos FROM picks)
         |SELECT id, pos, hl[pos] AS fp FROM r
         |ORDER BY id, pos""".stripMargin,

    "q302_roc_auc" ->
      """WITH cells AS (
        |  SELECT o_orderpriority AS stratum, (o_orderstatus = 'F') AS y,
        |    CAST(round(o_totalprice / 1000) AS BIGINT) AS s1k,
        |    CAST(COUNT(*) AS BIGINT) AS c
        |  FROM orders GROUP BY 1, 2, 3),
        |p AS (SELECT stratum, s1k AS sp, c AS cp FROM cells WHERE y),
        |n AS (SELECT stratum, s1k AS sn, c AS cn FROM cells WHERE NOT y),
        |pairs AS (SELECT p.stratum,
        |    SUM(CASE WHEN sp > sn THEN cp * cn ELSE 0 END) AS gt,
        |    SUM(CASE WHEN sp = sn THEN cp * cn ELSE 0 END) AS eq,
        |    SUM(cp * cn) AS nn
        |  FROM p JOIN n ON p.stratum = n.stratum GROUP BY 1),
        |sizes AS (SELECT stratum,
        |    CAST(SUM(CASE WHEN y THEN c ELSE 0 END) AS BIGINT) AS n_pos,
        |    CAST(SUM(CASE WHEN NOT y THEN c ELSE 0 END) AS BIGINT) AS n_neg
        |  FROM cells GROUP BY 1)
        |SELECT sizes.stratum, n_pos, n_neg,
        |  CASE WHEN n_pos >= 1 AND n_neg >= 1 THEN
        |    CAST(round((2.0 * CAST(gt AS DOUBLE) + CAST(eq AS DOUBLE))
        |      / (2.0 * CAST(nn AS DOUBLE)) * 1e6) AS BIGINT) END AS auc_micro
        |FROM sizes LEFT JOIN pairs ON sizes.stratum = pairs.stratum
        |ORDER BY 1""".stripMargin,

    "q303_cohens_kappa" ->
      s"""WITH src AS (SELECT doc_id, lang, text FROM documents),
         |${langPredCtes("src", "l")},
         |pairs AS (SELECT s.lang AS a, l.cat AS b
         |          FROM src s JOIN lp l ON s.doc_id = l.doc_id),
         |cells AS (SELECT a, b, CAST(COUNT(*) AS BIGINT) AS c
         |          FROM pairs GROUP BY 1, 2),
         |ra AS (SELECT a, SUM(c) AS rc FROM cells GROUP BY 1),
         |cb AS (SELECT b, SUM(c) AS cc FROM cells GROUP BY 1),
         |pe AS (SELECT CAST(COALESCE(SUM(rc * cc), 0) AS DOUBLE) AS pe_num
         |       FROM ra JOIN cb ON ra.a = cb.b),
         |tot AS (SELECT CAST(SUM(c) AS BIGINT) AS n,
         |    CAST(COALESCE(SUM(CASE WHEN a = b THEN c END), 0) AS BIGINT)
         |      AS agree
         |  FROM cells)
         |SELECT n, agree,
         |  CASE WHEN CAST(n AS DOUBLE) * CAST(n AS DOUBLE) - pe_num > 0 THEN
         |    CAST(round((CAST(n AS DOUBLE) * CAST(agree AS DOUBLE) - pe_num)
         |      / (CAST(n AS DOUBLE) * CAST(n AS DOUBLE) - pe_num) * 1e6)
         |      AS BIGINT) END AS kappa_micro
         |FROM tot CROSS JOIN pe""".stripMargin,

    "q304_log_rank" ->
      """WITH a AS (SELECT user_id AS u, MIN(epoch_us(ts)) AS ta
        |           FROM events WHERE event_type = 'view' GROUP BY 1),
        |conv AS (SELECT a.u, (MIN(tb) - ta) // 1000000 AS t, true AS e
        |         FROM a JOIN (SELECT user_id AS u, epoch_us(ts) AS tb
        |                      FROM events WHERE event_type = 'purchase') b
        |           ON a.u = b.u AND b.tb > a.ta
        |         GROUP BY a.u, ta),
        |lastev AS (SELECT user_id AS u, MAX(epoch_us(ts)) AS tmax
        |           FROM events GROUP BY 1),
        |cens AS (SELECT a.u, (tmax - ta) // 1000000 AS t, false AS e
        |         FROM a JOIN lastev ON a.u = lastev.u
        |         WHERE a.u NOT IN (SELECT u FROM conv)),
        |subj AS (SELECT CASE WHEN u % 2 = 0 THEN 1 ELSE 0 END AS g1, t,
        |           CAST(e AS BIGINT) AS e
        |         FROM (SELECT * FROM conv UNION ALL SELECT * FROM cens)),
        |cells AS (SELECT t,
        |    CAST(SUM(g1) AS BIGINT) AS c1,
        |    CAST(SUM(1 - g1) AS BIGINT) AS c2,
        |    CAST(SUM(g1 * e) AS BIGINT) AS d1,
        |    CAST(SUM((1 - g1) * e) AS BIGINT) AS d2
        |  FROM subj GROUP BY 1),
        |ar AS (SELECT t, d1, d2,
        |    CAST(SUM(c1) OVER (ORDER BY t DESC) AS BIGINT) AS n1,
        |    CAST(SUM(c2) OVER (ORDER BY t DESC) AS BIGINT) AS n2
        |  FROM cells),
        |terms AS (SELECT d1,
        |    CAST(round(
        |      (CAST(d1 AS DOUBLE) + CAST(d2 AS DOUBLE))
        |        * CAST(n1 AS DOUBLE)
        |        / (CAST(n1 AS DOUBLE) + CAST(n2 AS DOUBLE)) * 1e6)
        |      AS BIGINT) AS e1m,
        |    CAST(round(
        |      CASE WHEN CAST(n1 AS DOUBLE) + CAST(n2 AS DOUBLE) > 1 THEN
        |        (CAST(d1 AS DOUBLE) + CAST(d2 AS DOUBLE))
        |          * (CAST(n1 AS DOUBLE)
        |             / (CAST(n1 AS DOUBLE) + CAST(n2 AS DOUBLE)))
        |          * (1.0 - CAST(n1 AS DOUBLE)
        |             / (CAST(n1 AS DOUBLE) + CAST(n2 AS DOUBLE)))
        |          * ((CAST(n1 AS DOUBLE) + CAST(n2 AS DOUBLE))
        |             - (CAST(d1 AS DOUBLE) + CAST(d2 AS DOUBLE)))
        |          / ((CAST(n1 AS DOUBLE) + CAST(n2 AS DOUBLE)) - 1.0)
        |      ELSE 0.0 END * 1e6) AS BIGINT) AS vm
        |  FROM ar WHERE d1 + d2 > 0),
        |totals AS (SELECT CAST(SUM(g1) AS BIGINT) AS n_a,
        |    CAST(SUM(1 - g1) AS BIGINT) AS n_b FROM subj),
        |agg AS (SELECT CAST(COALESCE(SUM(d1), 0) AS BIGINT) AS o1,
        |    CAST(COALESCE(SUM(e1m), 0) AS BIGINT) AS e1_micro,
        |    CAST(COALESCE(SUM(vm), 0) AS BIGINT) AS v_micro FROM terms)
        |SELECT n_a, n_b, o1, e1_micro, v_micro,
        |  CASE WHEN v_micro > 0 THEN
        |    CAST(round((CAST(o1 AS DOUBLE) - CAST(e1_micro AS DOUBLE) / 1e6)
        |      / sqrt(CAST(v_micro AS DOUBLE) / 1e6) * 1e6) AS BIGINT)
        |  END AS z_micro
        |FROM totals CROSS JOIN agg""".stripMargin,

    "q305_quantile_norm" ->
      """WITH rows_ AS (
        |  SELECT o_orderkey AS id, o_orderpriority AS g,
        |    CAST(round(o_totalprice * 100) AS BIGINT) AS v
        |  FROM orders WHERE o_orderkey % 7 = 0),
        |ranked AS (SELECT id, g, v,
        |    CAST(ROW_NUMBER() OVER (PARTITION BY g ORDER BY v, id)
        |      AS BIGINT) AS rk
        |  FROM rows_),
        |sizes AS (SELECT g, CAST(COUNT(*) AS BIGINT) AS ng
        |          FROM ranked GROUP BY 1),
        |ref AS (SELECT rk AS pos, v AS v_ref FROM ranked
        |        WHERE g = '1-URGENT'),
        |nref AS (SELECT CAST(COUNT(*) AS BIGINT) AS nr FROM ref)
        |SELECT r.id, r.g AS grp, r.v, ref.v_ref AS v_norm
        |FROM ranked r JOIN sizes s ON r.g = s.g CROSS JOIN nref
        |JOIN ref ON ref.pos = (r.rk * nr + s.ng - 1) // s.ng
        |ORDER BY id""".stripMargin,

    "q306_mantel_haenszel" ->
      """WITH rows_ AS (
        |  SELECT year(o_orderdate) AS st,
        |    o_orderpriority IN ('1-URGENT', '2-HIGH') AS x,
        |    (o_orderstatus = 'F') AS y
        |  FROM orders),
        |cells AS (SELECT st,
        |    CAST(SUM(CASE WHEN x AND y THEN 1 ELSE 0 END) AS BIGINT) AS a,
        |    CAST(SUM(CASE WHEN x AND NOT y THEN 1 ELSE 0 END) AS BIGINT) AS b,
        |    CAST(SUM(CASE WHEN NOT x AND y THEN 1 ELSE 0 END) AS BIGINT) AS c,
        |    CAST(SUM(CASE WHEN NOT x AND NOT y THEN 1 ELSE 0 END) AS BIGINT) AS d
        |  FROM rows_ GROUP BY 1),
        |terms AS (SELECT
        |    CAST(round(CAST(a AS DOUBLE) * CAST(d AS DOUBLE)
        |      / (CAST(a AS DOUBLE) + CAST(b AS DOUBLE) + CAST(c AS DOUBLE)
        |         + CAST(d AS DOUBLE)) * 1e6) AS BIGINT) AS rm,
        |    CAST(round(CAST(b AS DOUBLE) * CAST(c AS DOUBLE)
        |      / (CAST(a AS DOUBLE) + CAST(b AS DOUBLE) + CAST(c AS DOUBLE)
        |         + CAST(d AS DOUBLE)) * 1e6) AS BIGINT) AS sm
        |  FROM cells)
        |SELECT CAST(COUNT(*) AS BIGINT) AS n_strata,
        |  CAST(COALESCE(SUM(rm), 0) AS BIGINT) AS r_micro,
        |  CAST(COALESCE(SUM(sm), 0) AS BIGINT) AS s_micro,
        |  CASE WHEN COALESCE(SUM(sm), 0) > 0 THEN
        |    CAST(round(CAST(SUM(rm) AS DOUBLE) / CAST(SUM(sm) AS DOUBLE)
        |      * 1e6) AS BIGINT) END AS or_micro
        |FROM terms""".stripMargin,

    "q307_fleiss_kappa" ->
      s"""WITH src AS (SELECT doc_id, lang, text FROM documents),
         |${langPredCtes("src", "f")},
         |trunc3 AS (SELECT doc_id, substr(text, 1, 120) AS text FROM src),
         |${langPredCtes("trunc3", "g")},
         |allr AS (
         |  SELECT doc_id, lang AS cat FROM src
         |  UNION ALL SELECT doc_id, cat FROM fp
         |  UNION ALL SELECT doc_id, cat FROM gp),
         |cells AS (SELECT doc_id AS item, cat, CAST(COUNT(*) AS BIGINT) AS c
         |          FROM allr GROUP BY 1, 2),
         |peri AS (SELECT item, CAST(SUM(c) AS BIGINT) AS r,
         |           SUM(c * c) AS t2i FROM cells GROUP BY 1),
         |chk AS (SELECT MIN(r) AS rmin, MAX(r) AS rmax,
         |          CAST(COUNT(*) AS BIGINT) AS ni,
         |          CAST(COALESCE(SUM(t2i), 0) AS DOUBLE) AS t2 FROM peri),
         |pc AS (SELECT CAST(COALESCE(SUM(ck * ck), 0) AS DOUBLE) AS s2
         |       FROM (SELECT SUM(c) AS ck FROM cells GROUP BY cat))
         |SELECT ni AS n_items, CAST(rmax AS BIGINT) AS n_raters,
         |  CASE WHEN rmax >= 2 AND
         |    CAST(ni AS DOUBLE) * CAST(rmax AS DOUBLE) * CAST(ni AS DOUBLE)
         |      * CAST(rmax AS DOUBLE) - s2 > 0 THEN
         |    CAST(round((CAST(ni AS DOUBLE) * CAST(rmax AS DOUBLE)
         |        * (t2 - CAST(ni AS DOUBLE) * CAST(rmax AS DOUBLE))
         |      - (CAST(rmax AS DOUBLE) - 1.0) * s2)
         |      / ((CAST(rmax AS DOUBLE) - 1.0)
         |        * (CAST(ni AS DOUBLE) * CAST(rmax AS DOUBLE)
         |           * CAST(ni AS DOUBLE) * CAST(rmax AS DOUBLE) - s2))
         |      * 1e6) AS BIGINT) END AS kappa_micro
         |FROM chk CROSS JOIN pc""".stripMargin,

    "q308_modularity" ->
      """WITH docs AS (SELECT doc_id FROM documents),
        |e0 AS (SELECT doc_id AS src, doc_id % 97 AS dst FROM docs
        |       UNION ALL SELECT doc_id, doc_id % 31 FROM docs),
        |und AS (SELECT DISTINCT least(src, dst) AS u,
        |          greatest(src, dst) AS v
        |        FROM e0 WHERE src <> dst),
        |mm AS (SELECT CAST(COUNT(*) AS BIGINT) AS m FROM und),
        |deg AS (SELECT c, CAST(COUNT(*) AS BIGINT) AS d FROM (
        |          SELECT u % 7 AS c FROM und
        |          UNION ALL SELECT v % 7 FROM und) GROUP BY 1),
        |intra AS (SELECT u % 7 AS c, CAST(COUNT(*) AS BIGINT) AS e
        |          FROM und WHERE u % 7 = v % 7 GROUP BY 1),
        |terms AS (SELECT 4 * mm.m * COALESCE(i.e, 0) - d.d * d.d AS t
        |          FROM deg d LEFT JOIN intra i ON d.c = i.c CROSS JOIN mm)
        |SELECT mm.m AS m, CAST(COUNT(*) AS BIGINT) AS n_communities,
        |  CASE WHEN mm.m > 0 THEN
        |    CAST(round(CAST(SUM(t) AS DOUBLE)
        |      / (4.0 * CAST(mm.m AS DOUBLE) * CAST(mm.m AS DOUBLE))
        |      * 1e6) AS BIGINT) END AS q_micro
        |FROM terms CROSS JOIN mm GROUP BY mm.m""".stripMargin,

    "q309_assortativity" ->
      """WITH docs AS (SELECT doc_id FROM documents),
        |e0 AS (SELECT doc_id AS src, doc_id % 97 AS dst FROM docs
        |       UNION ALL SELECT doc_id, doc_id % 31 FROM docs),
        |und AS (SELECT DISTINCT least(src, dst) AS u,
        |          greatest(src, dst) AS v
        |        FROM e0 WHERE src <> dst),
        |deg AS (SELECT node, CAST(COUNT(*) AS BIGINT) AS d FROM (
        |          SELECT u AS node FROM und
        |          UNION ALL SELECT v FROM und) GROUP BY 1),
        |sym AS (SELECT u, v FROM und UNION ALL SELECT v, u FROM und),
        |wd AS (SELECT dx.d AS dx, dy.d AS dy
        |       FROM sym JOIN deg dx ON sym.u = dx.node
        |                JOIN deg dy ON sym.v = dy.node),
        |agg AS (SELECT CAST(COUNT(*) AS BIGINT) AS n2,
        |          CAST(SUM(dx) AS DOUBLE) AS sx,
        |          CAST(SUM(dx * dx) AS DOUBLE) AS sxx,
        |          CAST(SUM(dx * dy) AS DOUBLE) AS sxy
        |        FROM wd)
        |SELECT CAST(n2 / 2 AS BIGINT) AS m,
        |  CASE WHEN CAST(n2 AS DOUBLE) * sxx - sx * sx > 0 THEN
        |    CAST(round((CAST(n2 AS DOUBLE) * sxy - sx * sx)
        |      / (CAST(n2 AS DOUBLE) * sxx - sx * sx) * 1e6) AS BIGINT)
        |  END AS r_micro
        |FROM agg""".stripMargin,

    "q310_friedman" ->
      """WITH cell AS (SELECT year(o_orderdate) AS b, o_orderpriority AS tr,
        |    CAST(COUNT(*) AS BIGINT) AS v
        |  FROM orders GROUP BY 1, 2),
        |r2 AS (SELECT b, tr,
        |    CAST(2 * (SELECT COUNT(*) FROM cell c2
        |              WHERE c2.b = c1.b AND c2.v < c1.v)
        |      + (SELECT COUNT(*) FROM cell c3
        |         WHERE c3.b = c1.b AND c3.v = c1.v) + 1 AS BIGINT) AS r2
        |  FROM cell c1),
        |dims AS (SELECT CAST(COUNT(DISTINCT b) AS BIGINT) AS nb,
        |           CAST(COUNT(DISTINCT tr) AS BIGINT) AS k FROM cell),
        |perT AS (SELECT tr, CAST(SUM(r2) AS BIGINT) AS rj
        |         FROM r2 GROUP BY 1),
        |num AS (SELECT CAST(SUM((rj - nb * (k + 1)) * (rj - nb * (k + 1)))
        |          AS DOUBLE) AS num
        |        FROM perT CROSS JOIN dims),
        |s2 AS (SELECT CAST(SUM(r2 * r2) AS DOUBLE) AS s2 FROM r2)
        |SELECT nb AS n_blocks, k,
        |  CASE WHEN s2 - CAST(nb AS DOUBLE) * CAST(k AS DOUBLE)
        |      * CAST(k + 1 AS DOUBLE) * CAST(k + 1 AS DOUBLE) > 0 THEN
        |    CAST(round(CAST(k - 1 AS DOUBLE) * num
        |      / (s2 - CAST(nb AS DOUBLE) * CAST(k AS DOUBLE)
        |        * CAST(k + 1 AS DOUBLE) * CAST(k + 1 AS DOUBLE))
        |      * 1e6) AS BIGINT) END AS q_micro
        |FROM dims CROSS JOIN num CROSS JOIN s2""".stripMargin,

    "q311_von_neumann" ->
      """WITH daily AS (
        |  SELECT event_type AS key, CAST(ts AS DATE) AS d,
        |    CAST(COUNT(*) AS BIGINT) AS v
        |  FROM events GROUP BY 1, 2),
        |diffs AS (SELECT a.key, CAST(COUNT(*) AS BIGINT) AS n_pairs,
        |    CAST(SUM((b.v - a.v) * (b.v - a.v)) AS BIGINT) AS sd2
        |  FROM daily a JOIN daily b
        |    ON a.key = b.key AND b.d = a.d + 1
        |  GROUP BY 1),
        |moms AS (SELECT key, CAST(COUNT(*) AS BIGINT) AS n,
        |    CAST(SUM(v) AS BIGINT) AS sx,
        |    CAST(SUM(v * v) AS BIGINT) AS sxx
        |  FROM daily GROUP BY 1)
        |SELECT m.key, m.n, COALESCE(d.n_pairs, 0) AS n_pairs,
        |  CASE WHEN m.n >= 2 AND CAST(m.n AS DOUBLE) * CAST(m.sxx AS DOUBLE)
        |      - CAST(m.sx AS DOUBLE) * CAST(m.sx AS DOUBLE) > 0 THEN
        |    CAST(round(CAST(m.n AS DOUBLE)
        |        * COALESCE(CAST(d.sd2 AS DOUBLE), 0.0)
        |      / (CAST(m.n AS DOUBLE) * CAST(m.sxx AS DOUBLE)
        |        - CAST(m.sx AS DOUBLE) * CAST(m.sx AS DOUBLE)) * 1e6)
        |      AS BIGINT) END AS vn_micro
        |FROM moms m LEFT JOIN diffs d ON m.key = d.key
        |ORDER BY m.key""".stripMargin,

    "q312_llr_collocations" ->
      s"""WITH tk AS (
         |  SELECT doc_id,
         |    list_filter(string_split_regex($normText, ' '), x -> x <> '') AS tk
         |  FROM documents),
         |bgl AS (
         |  SELECT CASE WHEN len(tk) < 2 THEN CAST([] AS VARCHAR[])
         |    ELSE list_transform(range(1, len(tk)), i -> tk[i] || ' ' || tk[i+1])
         |    END AS bg
         |  FROM tk),
         |big AS (SELECT bg, CAST(COUNT(*) AS BIGINT) AS c_ab
         |        FROM (SELECT unnest(bg) AS bg FROM bgl) GROUP BY bg),
         |firsts AS (SELECT split_part(bg, ' ', 1) AS t,
         |             CAST(SUM(c_ab) AS BIGINT) AS c_a_first
         |           FROM big GROUP BY 1),
         |seconds AS (SELECT split_part(bg, ' ', 2) AS t,
         |              CAST(SUM(c_ab) AS BIGINT) AS c_b_second
         |            FROM big GROUP BY 1),
         |nb AS (SELECT CAST(SUM(c_ab) AS BIGINT) AS n FROM big),
         |jj AS (SELECT bg, c_ab, c_a_first, c_b_second, nb.n,
         |         c_a_first - c_ab AS k12, c_b_second - c_ab AS k21,
         |         nb.n - c_a_first - c_b_second + c_ab AS k22
         |       FROM big
         |       JOIN firsts ON split_part(bg, ' ', 1) = firsts.t
         |       JOIN seconds ON split_part(bg, ' ', 2) = seconds.t
         |       CROSS JOIN nb
         |       WHERE c_ab >= 5)
         |SELECT bg AS bigram, c_ab, c_a_first, c_b_second,
         |  CAST(round(2.0 * ((((
         |      CASE WHEN c_ab > 0 THEN CAST(c_ab AS DOUBLE) * ln(CAST(c_ab AS DOUBLE)) ELSE 0.0 END
         |    + CASE WHEN k12 > 0 THEN CAST(k12 AS DOUBLE) * ln(CAST(k12 AS DOUBLE)) ELSE 0.0 END)
         |    + CASE WHEN k21 > 0 THEN CAST(k21 AS DOUBLE) * ln(CAST(k21 AS DOUBLE)) ELSE 0.0 END)
         |    + CASE WHEN k22 > 0 THEN CAST(k22 AS DOUBLE) * ln(CAST(k22 AS DOUBLE)) ELSE 0.0 END)
         |    - (CASE WHEN c_a_first > 0 THEN CAST(c_a_first AS DOUBLE) * ln(CAST(c_a_first AS DOUBLE)) ELSE 0.0 END
         |       + CASE WHEN n - c_a_first > 0 THEN CAST(n - c_a_first AS DOUBLE) * ln(CAST(n - c_a_first AS DOUBLE)) ELSE 0.0 END)
         |    - (CASE WHEN c_b_second > 0 THEN CAST(c_b_second AS DOUBLE) * ln(CAST(c_b_second AS DOUBLE)) ELSE 0.0 END
         |       + CASE WHEN n - c_b_second > 0 THEN CAST(n - c_b_second AS DOUBLE) * ln(CAST(n - c_b_second AS DOUBLE)) ELSE 0.0 END)
         |    + CASE WHEN n > 0 THEN CAST(n AS DOUBLE) * ln(CAST(n AS DOUBLE)) ELSE 0.0 END)
         |    * 1e6) AS BIGINT) AS g2_micro
         |FROM jj
         |ORDER BY g2_micro DESC, bigram ASC
         |LIMIT 40""".stripMargin,

    "q313_jaro_winkler" ->
      """SELECT c_custkey,
        |  round(jaro_winkler_similarity(c_name,
        |    substr(c_name, 1, 10) || reverse(substr(c_name, 11, 4))
        |      || substr(c_name, 15, 100)), 6) AS jw
        |FROM customer ORDER BY c_custkey""".stripMargin,

    "q314_partial_corr" ->
      """WITH r AS (
        |  SELECT l_returnflag AS key,
        |    CAST(l_quantity AS BIGINT) AS x,
        |    CAST(round(l_extendedprice) AS BIGINT) AS y,
        |    CAST(round(l_discount * 10000) AS BIGINT) AS z
        |  FROM lineitem),
        |g AS (SELECT key, CAST(COUNT(*) AS BIGINT) AS n,
        |    CAST(SUM(x) AS DOUBLE) AS sx, CAST(SUM(y) AS DOUBLE) AS sy,
        |    CAST(SUM(z) AS DOUBLE) AS sz,
        |    CAST(SUM(x * x) AS DOUBLE) AS sxx,
        |    CAST(SUM(y * y) AS DOUBLE) AS syy,
        |    CAST(SUM(z * z) AS DOUBLE) AS szz,
        |    CAST(SUM(x * y) AS DOUBLE) AS sxy,
        |    CAST(SUM(x * z) AS DOUBLE) AS sxz,
        |    CAST(SUM(y * z) AS DOUBLE) AS syz
        |  FROM r GROUP BY 1),
        |c AS (SELECT key, n,
        |    (n * sxy - sx * sy) / sqrt((n * sxx - sx * sx) * (n * syy - sy * sy)) AS rxy,
        |    (n * sxz - sx * sz) / sqrt((n * sxx - sx * sx) * (n * szz - sz * sz)) AS rxz,
        |    (n * syz - sy * sz) / sqrt((n * syy - sy * sy) * (n * szz - sz * sz)) AS ryz,
        |    n * sxx - sx * sx AS vx, n * syy - sy * sy AS vy,
        |    n * szz - sz * sz AS vz
        |  FROM g)
        |SELECT key, n,
        |  CASE WHEN n >= 3 AND vx > 0 AND vy > 0 AND vz > 0 THEN
        |    CAST(round(rxy * 1e6) AS BIGINT) END AS r_xy_micro,
        |  CASE WHEN n >= 3 AND vx > 0 AND vy > 0 AND vz > 0
        |      AND sqrt((1.0 - rxz * rxz) * (1.0 - ryz * ryz)) > 0 THEN
        |    CAST(round((rxy - rxz * ryz)
        |      / sqrt((1.0 - rxz * rxz) * (1.0 - ryz * ryz)) * 1e6) AS BIGINT)
        |  END AS r_xy_z_micro
        |FROM c ORDER BY key""".stripMargin,

    "q315_runs_test" ->
      """WITH daily AS (
        |  SELECT event_type AS key, CAST(ts AS DATE) AS d,
        |    CAST(COUNT(*) AS BIGINT) AS v
        |  FROM events GROUP BY 1, 2),
        |st AS (SELECT key, CAST(COUNT(*) AS BIGINT) AS nd,
        |         CAST(SUM(v) AS BIGINT) AS sv
        |       FROM daily GROUP BY 1),
        |signed AS (SELECT daily.key, d, (v * nd > sv) AS hi
        |           FROM daily JOIN st ON daily.key = st.key
        |           WHERE v * nd <> sv),
        |chg AS (SELECT key, hi,
        |    CASE WHEN lag(hi) OVER (PARTITION BY key ORDER BY d) IS NULL
        |           OR lag(hi) OVER (PARTITION BY key ORDER BY d) <> hi
        |         THEN 1 ELSE 0 END AS c
        |  FROM signed),
        |agg AS (SELECT key, CAST(COUNT(*) AS BIGINT) AS n,
        |    CAST(SUM(CASE WHEN hi THEN 1 ELSE 0 END) AS BIGINT) AS n_above,
        |    CAST(SUM(CASE WHEN hi THEN 0 ELSE 1 END) AS BIGINT) AS n_below,
        |    CAST(SUM(c) AS BIGINT) AS runs
        |  FROM chg GROUP BY 1)
        |SELECT key, n, n_above, n_below, runs,
        |  CASE WHEN n_above >= 1 AND n_below >= 1 AND n >= 2
        |      AND (2.0 * n_above * n_below)
        |        * (2.0 * n_above * n_below - CAST(n AS DOUBLE))
        |        / (CAST(n AS DOUBLE) * CAST(n AS DOUBLE)
        |           * (CAST(n AS DOUBLE) - 1.0)) > 0 THEN
        |    CAST(round((CAST(runs AS DOUBLE)
        |        - ((2.0 * n_above * n_below) / CAST(n AS DOUBLE) + 1.0))
        |      / sqrt((2.0 * n_above * n_below)
        |        * (2.0 * n_above * n_below - CAST(n AS DOUBLE))
        |        / (CAST(n AS DOUBLE) * CAST(n AS DOUBLE)
        |           * (CAST(n AS DOUBLE) - 1.0))) * 1e6) AS BIGINT)
        |  END AS z_micro
        |FROM agg ORDER BY key""".stripMargin,

    "q316_cronbach_alpha" ->
      """WITH items AS (
        |  SELECT doc_id, 'chars' AS item, CAST(length(text) AS BIGINT) AS v
        |  FROM documents
        |  UNION ALL
        |  SELECT doc_id, 'toks',
        |    CAST(len(list_filter(string_split_regex(trim(text), '\s+'),
        |      x -> x <> '')) AS BIGINT)
        |  FROM documents
        |  UNION ALL
        |  SELECT doc_id, 'upper',
        |    CAST(length(regexp_replace(text, '[^A-Z]', '', 'g')) AS BIGINT)
        |  FROM documents),
        |dims AS (SELECT CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS ns,
        |           CAST(COUNT(DISTINCT item) AS BIGINT) AS k FROM items),
        |si AS (SELECT CAST(SUM(t) AS DOUBLE) AS si FROM (
        |  SELECT ns * SUM(v * v) - SUM(v) * SUM(v) AS t
        |  FROM items CROSS JOIN dims GROUP BY item, ns)),
        |vt AS (SELECT CAST(ns * SUM(t * t) - SUM(t) * SUM(t) AS DOUBLE) AS vt
        |  FROM (SELECT doc_id, CAST(SUM(v) AS BIGINT) AS t
        |        FROM items GROUP BY 1) CROSS JOIN dims
        |  GROUP BY ns)
        |SELECT ns AS n_subjects, k,
        |  CASE WHEN vt > 0 THEN
        |    CAST(round(CAST(k AS DOUBLE) / CAST(k - 1 AS DOUBLE)
        |      * (1.0 - si / vt) * 1e6) AS BIGINT) END AS alpha_micro
        |FROM dims CROSS JOIN si CROSS JOIN vt""".stripMargin,

    "q317_clustering_coeff" ->
      """WITH lp AS (
        |  SELECT DISTINCT l_orderkey AS o, l_partkey AS p
        |  FROM lineitem WHERE l_partkey % 10 = 0),
        |e AS (
        |  SELECT DISTINCT LEAST(a.p, b.p) AS u, GREATEST(a.p, b.p) AS v
        |  FROM lp a JOIN lp b ON a.o = b.o AND a.p < b.p),
        |deg AS (SELECT node, CAST(COUNT(*) AS BIGINT) AS d FROM (
        |          SELECT u AS node FROM e UNION ALL SELECT v FROM e)
        |        GROUP BY 1),
        |wed AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_nodes,
        |          CAST(SUM(d * (d - 1) // 2) AS BIGINT) AS w FROM deg),
        |tri AS (SELECT CAST(COUNT(*) AS BIGINT) AS t
        |        FROM e e1 JOIN e e2 ON e2.u = e1.v
        |        JOIN e e3 ON e3.u = e1.u AND e3.v = e2.v)
        |SELECT n_nodes, w AS n_wedges, t AS n_triangles,
        |  CASE WHEN w > 0 THEN
        |    CAST(round(CAST(3 * t AS DOUBLE) / CAST(w AS DOUBLE) * 1e6)
        |      AS BIGINT) END AS c_micro
        |FROM wed CROSS JOIN tri""".stripMargin,

    "q318_jw_linkage" ->
      """WITH pos AS (SELECT c_custkey AS id, c_name AS k,
        |    CAST(ROW_NUMBER() OVER (ORDER BY c_name, c_custkey) AS BIGINT)
        |      AS p
        |  FROM customer)
        |SELECT a.id AS id_a, b.id AS id_b,
        |  round(jaro_winkler_similarity(a.k, b.k), 6) AS jw
        |FROM pos a JOIN pos b ON b.p > a.p AND b.p <= a.p + 5
        |WHERE round(jaro_winkler_similarity(a.k, b.k), 6) >= 0.95
        |ORDER BY id_a, id_b""".stripMargin,

    "q319_brier_decomposition" ->
      """WITH r AS (
        |  SELECT LEAST(999, CAST(FLOOR(o_totalprice / 300) AS BIGINT)) AS s,
        |    (o_orderstatus = 'F') AS y
        |  FROM orders),
        |cells AS (SELECT LEAST(GREATEST((s - 0) * 10 // 1000, 0), 9) AS bin,
        |    CAST(COUNT(*) AS BIGINT) AS nk, CAST(SUM(s) AS BIGINT) AS sp,
        |    CAST(SUM(CASE WHEN y THEN 1 ELSE 0 END) AS BIGINT) AS so
        |  FROM r GROUP BY 1),
        |tot AS (SELECT CAST(SUM(nk) AS BIGINT) AS n,
        |    CAST(SUM(so) AS DOUBLE) / CAST(SUM(nk) AS DOUBLE) AS obar
        |  FROM cells),
        |terms AS (SELECT
        |    CAST(round((CAST(sp AS DOUBLE) / CAST(nk AS DOUBLE) / 1000.0
        |        - CAST(so AS DOUBLE) / CAST(nk AS DOUBLE))
        |      * (CAST(sp AS DOUBLE) / CAST(nk AS DOUBLE) / 1000.0
        |        - CAST(so AS DOUBLE) / CAST(nk AS DOUBLE))
        |      * CAST(nk AS DOUBLE) / CAST(n AS DOUBLE) * 1e6) AS BIGINT)
        |      AS relt,
        |    CAST(round((CAST(so AS DOUBLE) / CAST(nk AS DOUBLE) - obar)
        |      * (CAST(so AS DOUBLE) / CAST(nk AS DOUBLE) - obar)
        |      * CAST(nk AS DOUBLE) / CAST(n AS DOUBLE) * 1e6) AS BIGINT)
        |      AS rest
        |  FROM cells CROSS JOIN tot)
        |SELECT n,
        |  CAST(SUM(relt) AS BIGINT) AS rel_micro,
        |  CAST(SUM(rest) AS BIGINT) AS res_micro,
        |  CAST(round(obar * (1.0 - obar) * 1e6) AS BIGINT) AS unc_micro,
        |  CAST(SUM(relt) - SUM(rest)
        |    + round(obar * (1.0 - obar) * 1e6) AS BIGINT) AS brier_micro
        |FROM terms CROSS JOIN tot GROUP BY n, obar""".stripMargin,

    "q320_theil_u" ->
      s"""WITH src AS (SELECT doc_id, lang, text FROM documents),
         |${langPredCtes("src", "u")},
         |pairs AS (SELECT s.lang AS a, u.cat AS b
         |          FROM src s JOIN up u ON s.doc_id = u.doc_id),
         |cells AS (SELECT a, b, CAST(COUNT(*) AS BIGINT) AS c_ab
         |          FROM pairs GROUP BY 1, 2),
         |ma AS (SELECT a, CAST(SUM(c_ab) AS BIGINT) AS c_a
         |       FROM cells GROUP BY 1),
         |mb AS (SELECT b, CAST(SUM(c_ab) AS BIGINT) AS c_b
         |       FROM cells GROUP BY 1),
         |nn AS (SELECT CAST(SUM(c_ab) AS BIGINT) AS n FROM cells),
         |mi AS (SELECT CAST(SUM(CAST(round(
         |      (CAST(c_ab AS DOUBLE) / CAST(n AS DOUBLE))
         |      * ln(CAST(c_ab AS DOUBLE) * CAST(n AS DOUBLE)
         |        / (CAST(c_a AS DOUBLE) * CAST(c_b AS DOUBLE))) * 1e6)
         |      AS BIGINT)) AS BIGINT) AS mi_micro
         |  FROM cells JOIN ma USING (a) JOIN mb USING (b) CROSS JOIN nn),
         |ha AS (SELECT CAST(SUM(CAST(round(
         |      (CAST(c_a AS DOUBLE) / CAST(n AS DOUBLE))
         |      * ln(CAST(n AS DOUBLE) / CAST(c_a AS DOUBLE)) * 1e6)
         |      AS BIGINT)) AS BIGINT) AS h_a_micro
         |  FROM ma CROSS JOIN nn)
         |SELECT nn.n, mi_micro, h_a_micro,
         |  CASE WHEN h_a_micro > 0 THEN
         |    CAST(round(CAST(mi_micro AS DOUBLE)
         |      / CAST(h_a_micro AS DOUBLE) * 1e6) AS BIGINT)
         |  END AS u_micro
         |FROM mi CROSS JOIN ha CROSS JOIN nn""".stripMargin,

    "q321_krippendorff" ->
      s"""WITH src AS (SELECT doc_id, lang, text FROM documents),
         |${langPredCtes("src", "f")},
         |trunc3 AS (SELECT doc_id, substr(text, 1, 120) AS text FROM src
         |           WHERE doc_id % 4 <> 0),
         |${langPredCtes("trunc3", "g")},
         |allr AS (
         |  SELECT doc_id, lang AS cat FROM src
         |  UNION ALL SELECT doc_id, cat FROM fp
         |  UNION ALL SELECT doc_id, cat FROM gp),
         |cells AS (SELECT doc_id AS item, cat, CAST(COUNT(*) AS BIGINT) AS c
         |          FROM allr GROUP BY 1, 2),
         |peri AS (SELECT item, CAST(SUM(c) AS BIGINT) AS ri
         |         FROM cells GROUP BY 1 HAVING SUM(c) >= 2),
         |pair AS (SELECT cells.item, cat, c, ri
         |         FROM cells JOIN peri ON cells.item = peri.item),
         |dosum AS (SELECT CAST(SUM(CAST(round(
         |      CAST(c AS DOUBLE) * (CAST(ri AS DOUBLE) - CAST(c AS DOUBLE))
         |      / (CAST(ri AS DOUBLE) - 1.0) * 1e6) AS BIGINT)) AS BIGINT)
         |      AS do_micro,
         |    CAST(SUM(c) AS BIGINT) AS n,
         |    CAST(COUNT(DISTINCT item) AS BIGINT) AS n_items
         |  FROM pair),
         |de AS (SELECT CAST(SUM(nc * (n - nc)) AS DOUBLE) AS se
         |  FROM (SELECT cat, CAST(SUM(c) AS BIGINT) AS nc
         |        FROM pair GROUP BY 1) CROSS JOIN dosum)
         |SELECT n AS n_values, n_items,
         |  CASE WHEN se > 0 THEN
         |    CAST(round((1.0 -
         |      (CAST(do_micro AS DOUBLE) / 1e6 / CAST(n AS DOUBLE))
         |        / (se / (CAST(n AS DOUBLE) * (CAST(n AS DOUBLE) - 1.0))))
         |      * 1e6) AS BIGINT) END AS alpha_micro
         |FROM dosum CROSS JOIN de""".stripMargin,

    "q322_lin_ccc" ->
      """WITH r AS (
        |  SELECT c_mktsegment AS key,
        |    CAST(round(c_acctbal * 100) AS BIGINT) AS x,
        |    CAST(round(c_acctbal * 100) AS BIGINT)
        |      + c_custkey % 200 - 100 AS y
        |  FROM customer),
        |g AS (SELECT key, CAST(COUNT(*) AS BIGINT) AS n,
        |    CAST(SUM(x) AS DOUBLE) AS sx, CAST(SUM(y) AS DOUBLE) AS sy,
        |    CAST(SUM(x * x) AS DOUBLE) AS sxx,
        |    CAST(SUM(y * y) AS DOUBLE) AS syy,
        |    CAST(SUM(x * y) AS DOUBLE) AS sxy
        |  FROM r GROUP BY 1)
        |SELECT key, n,
        |  CASE WHEN (CAST(n AS DOUBLE) * sxx - sx * sx)
        |      + (CAST(n AS DOUBLE) * syy - sy * sy)
        |      + (sx - sy) * (sx - sy) > 0 THEN
        |    CAST(round(2.0 * (CAST(n AS DOUBLE) * sxy - sx * sy)
        |      / ((CAST(n AS DOUBLE) * sxx - sx * sx)
        |        + (CAST(n AS DOUBLE) * syy - sy * sy)
        |        + (sx - sy) * (sx - sy)) * 1e6) AS BIGINT)
        |  END AS ccc_micro
        |FROM g ORDER BY key""".stripMargin,

    "q323_hellinger" ->
      """WITH r AS (
        |  SELECT o_orderpriority AS stratum, o_orderstatus AS st,
        |    CAST(FLOOR(o_totalprice / 1000) AS BIGINT) AS v
        |  FROM orders WHERE o_orderstatus IN ('F', 'O')),
        |cells AS (SELECT stratum, v,
        |    CAST(SUM(CASE WHEN st = 'F' THEN 1 ELSE 0 END) AS BIGINT) AS a,
        |    CAST(SUM(CASE WHEN st = 'O' THEN 1 ELSE 0 END) AS BIGINT) AS b
        |  FROM r GROUP BY 1, 2),
        |sizes AS (SELECT stratum, CAST(SUM(a) AS BIGINT) AS n_a,
        |            CAST(SUM(b) AS BIGINT) AS n_b
        |          FROM cells GROUP BY 1),
        |bc AS (SELECT cells.stratum, n_a, n_b,
        |    CAST(SUM(CAST(round(sqrt(
        |      CAST(a AS DOUBLE) * CAST(b AS DOUBLE)
        |      / (CAST(n_a AS DOUBLE) * CAST(n_b AS DOUBLE))) * 1e6)
        |      AS BIGINT)) AS BIGINT) AS bc_micro
        |  FROM cells JOIN sizes ON cells.stratum = sizes.stratum
        |  GROUP BY 1, 2, 3)
        |SELECT stratum, n_a, n_b, bc_micro,
        |  CAST(round(sqrt(GREATEST(0.0,
        |    1.0 - CAST(bc_micro AS DOUBLE) / 1e6)) * 1e6) AS BIGINT)
        |    AS h_micro
        |FROM bc ORDER BY stratum""".stripMargin,

    "q324_psi" ->
      """WITH r AS (
        |  SELECT o_orderpriority AS stratum, o_orderstatus AS st,
        |    CAST(FLOOR(o_totalprice / 1000) AS BIGINT) AS v
        |  FROM orders WHERE o_orderstatus IN ('F', 'O')),
        |cells AS (SELECT stratum, v,
        |    CAST(SUM(CASE WHEN st = 'F' THEN 1 ELSE 0 END) AS BIGINT) AS a,
        |    CAST(SUM(CASE WHEN st = 'O' THEN 1 ELSE 0 END) AS BIGINT) AS b
        |  FROM r GROUP BY 1, 2),
        |sizes AS (SELECT stratum, CAST(SUM(a) AS BIGINT) AS n_a,
        |            CAST(SUM(b) AS BIGINT) AS n_b,
        |            CAST(COUNT(*) AS BIGINT) AS n_cells
        |          FROM cells GROUP BY 1)
        |SELECT cells.stratum, n_a, n_b, n_cells,
        |  CAST(SUM(CAST(round(
        |    ((CAST(a AS DOUBLE) + 1.0) / (CAST(n_a AS DOUBLE) + CAST(n_cells AS DOUBLE))
        |      - (CAST(b AS DOUBLE) + 1.0) / (CAST(n_b AS DOUBLE) + CAST(n_cells AS DOUBLE)))
        |    * ln(((CAST(a AS DOUBLE) + 1.0) / (CAST(n_a AS DOUBLE) + CAST(n_cells AS DOUBLE)))
        |      / ((CAST(b AS DOUBLE) + 1.0) / (CAST(n_b AS DOUBLE) + CAST(n_cells AS DOUBLE))))
        |    * 1e6) AS BIGINT)) AS BIGINT) AS psi_micro
        |FROM cells JOIN sizes ON cells.stratum = sizes.stratum
        |GROUP BY 1, 2, 3, 4 ORDER BY 1""".stripMargin,

    "q85_bpe_train" -> bpeOracleSql(8),

    "q327_bpe_bytes" -> bpeOracleSql(8, byteLevel = true),

    "q92_bpe_tokens" -> bpeTokensOracleSql(8),

    "q98_bpe_kernel" -> bpeTokensOracleSql(8, docFilter = "doc_id % 7 = 3"),

    // Paragraph-dedup replay: same synthesized two-paragraph docs,
    // first-occurrence via row_number over (pid, pos), rewrite as the
    // 1-based list_filter twin of Spark's 0-based filter-by-index.
    "q86_dedup_paragraphs" ->
      """WITH pdocs AS (
        |  SELECT d.doc_id AS pid,
        |         d.text || chr(10) || chr(10) || a.text AS text
        |  FROM documents d
        |  JOIN documents a ON a.doc_id = d.doc_id - (d.doc_id % 10)),
        |sp AS (SELECT pid, string_split(text, chr(10) || chr(10)) AS ps FROM pdocs),
        |paras AS (
        |  SELECT pid, u.pos, u.para FROM (
        |    SELECT pid, unnest(list_transform(range(1, len(ps) + 1),
        |      i -> struct_pack(pos := i - 1, para := ps[i]))) AS u
        |    FROM sp) x),
        |occ AS (
        |  SELECT pid, pos,
        |         row_number() OVER (PARTITION BY md5(para) ORDER BY pid, pos) AS rn
        |  FROM paras),
        |drops AS (
        |  SELECT pid, list(pos ORDER BY pos) AS dr
        |  FROM occ WHERE rn > 1 GROUP BY pid)
        |SELECT sp.pid,
        |  COALESCE(array_to_string(CASE WHEN dr IS NULL THEN ps
        |    ELSE list_filter(ps, (x, i) -> NOT list_contains(dr, i - 1)) END,
        |    chr(10) || chr(10)), '') AS clean_text,
        |  CAST(len(ps) AS INT) AS n_paras,
        |  CAST(CASE WHEN dr IS NULL THEN 0 ELSE len(dr) END AS INT) AS n_removed
        |FROM sp LEFT JOIN drops USING (pid)
        |ORDER BY pid""".stripMargin,

    // Canonical-URL replay: same synthesized variants, same ordered
    // replace chain (DuckDB regexp_replace is first-match-only, which
    // is exactly what these anchored patterns need).
    "q87_url_dedup" ->
      """WITH raw AS (
        |  SELECT doc_id,
        |    CASE doc_id % 4
        |      WHEN 0 THEN 'https://www.site' || (doc_id % 20) || '.example.com/page/' || (doc_id % 50) || '/?utm_source=x&ref=y'
        |      WHEN 1 THEN 'http://site' || (doc_id % 20) || '.example.com/page/' || (doc_id % 50) || '/'
        |      WHEN 2 THEN upper('https://site' || (doc_id % 20) || '.example.com:443/page/' || (doc_id % 50))
        |      ELSE 'site' || (doc_id % 20) || '.example.com/page/' || (doc_id % 50) || '#frag'
        |    END AS url
        |  FROM documents),
        |canon AS (
        |  SELECT doc_id,
        |    regexp_replace(
        |      regexp_replace(
        |        replace(replace(
        |          regexp_replace(
        |            regexp_replace(
        |              regexp_replace(
        |                regexp_replace(trim(lower(url)), '#.*$', ''),
        |                '\?.*$', ''),
        |              '^https?://', ''),
        |            '^www\.', ''),
        |          ':80/', '/'), ':443/', '/'),
        |        ':(80|443)$', ''),
        |      '/+$', '') AS url_canon
        |  FROM raw)
        |SELECT url_canon, MIN(doc_id) AS doc_id, COUNT(*) AS n_dupes
        |FROM canon GROUP BY url_canon ORDER BY url_canon""".stripMargin,

    "q88_compaction_plan" ->
      """SELECT doc_id, n_chars,
        |  CAST(COALESCE(SUM(n_chars) OVER (ORDER BY n_chars DESC, doc_id ASC
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) // 4000 AS BIGINT) AS bin
        |FROM documents ORDER BY doc_id""".stripMargin,

    "q89_analyze_table" ->
      """WITH src AS (
        |  SELECT c_custkey,
        |         CASE WHEN c_custkey % 5 = 0 THEN NULL ELSE c_name END AS c_name,
        |         c_mktsegment, c_nationkey
        |  FROM customer),
        |long AS (
        |  SELECT 'c_custkey' AS col_name, COUNT(*) AS n_rows,
        |    CAST(COUNT(*) FILTER (c_custkey IS NULL) AS BIGINT) AS n_null,
        |    CAST(COUNT(DISTINCT c_custkey) AS BIGINT) AS n_distinct,
        |    CAST(MIN(c_custkey) AS VARCHAR) AS min_val,
        |    CAST(MAX(c_custkey) AS VARCHAR) AS max_val FROM src
        |  UNION ALL
        |  SELECT 'c_name', COUNT(*),
        |    CAST(COUNT(*) FILTER (c_name IS NULL) AS BIGINT),
        |    CAST(COUNT(DISTINCT c_name) AS BIGINT),
        |    CAST(MIN(c_name) AS VARCHAR), CAST(MAX(c_name) AS VARCHAR) FROM src
        |  UNION ALL
        |  SELECT 'c_mktsegment', COUNT(*),
        |    CAST(COUNT(*) FILTER (c_mktsegment IS NULL) AS BIGINT),
        |    CAST(COUNT(DISTINCT c_mktsegment) AS BIGINT),
        |    CAST(MIN(c_mktsegment) AS VARCHAR), CAST(MAX(c_mktsegment) AS VARCHAR) FROM src
        |  UNION ALL
        |  SELECT 'c_nationkey', COUNT(*),
        |    CAST(COUNT(*) FILTER (c_nationkey IS NULL) AS BIGINT),
        |    CAST(COUNT(DISTINCT c_nationkey) AS BIGINT),
        |    CAST(MIN(c_nationkey) AS VARCHAR), CAST(MAX(c_nationkey) AS VARCHAR) FROM src)
        |SELECT col_name, n_rows, n_null, n_distinct, min_val, max_val
        |FROM long ORDER BY col_name""".stripMargin,

    "q18_simhash" ->
      s"""WITH toks AS (
         |  SELECT doc_id,
         |         unnest(list_filter(string_split_regex($normText, ' '), x -> x <> '')) AS tok
         |  FROM documents),
         |h AS (SELECT doc_id, md5(tok) AS hx FROM toks),
         |votes AS (
         |  SELECT doc_id, b,
         |    SUM(CASE WHEN CAST(floor((strpos('0123456789abcdef', substr(hx, CAST(b // 4 AS INT) + 1, 1)) - 1)
         |                        / power(2, 3 - b % 4)) AS INT) % 2 = 1
         |             THEN 1 ELSE -1 END) AS v
         |  FROM h CROSS JOIN (SELECT unnest(range(64)) AS b) bb
         |  GROUP BY doc_id, b),
         |nibbles AS (
         |  SELECT doc_id, CAST(b // 4 AS INT) AS ci,
         |    CAST(SUM(CASE WHEN v > 0 THEN power(2, 3 - b % 4) ELSE 0 END) AS INT) AS nib
         |  FROM votes GROUP BY doc_id, CAST(b // 4 AS INT)),
         |fp AS (
         |  SELECT doc_id, string_agg(substr('0123456789abcdef', nib + 1, 1), '' ORDER BY ci) AS simhash
         |  FROM nibbles GROUP BY doc_id)
         |SELECT d.doc_id AS id, COALESCE(fp.simhash, '0000000000000000') AS simhash
         |FROM documents d LEFT JOIN fp ON d.doc_id = fp.doc_id
         |ORDER BY id""".stripMargin,

    "q19_embedding_dedup" ->
      s"""SELECT a.vec_id AS id_a, b.vec_id AS id_b,
         |  ROUND(${cosSql("a.embedding", "b.embedding")}, 6) AS cosine
         |FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
         |WHERE ${cosSql("a.embedding", "b.embedding")} >= 0.45
         |ORDER BY id_a, id_b""".stripMargin,

    "q45_embedding_lsh" ->
      s"""WITH planes(t, i, plane) AS (VALUES
         |      ${hyperplanesSql(planes = 8, dim = 64, seed = 7L, tables = 2)}),
         |bucketed AS (
         |  SELECT e.vec_id, p.t,
         |    SUM(CASE WHEN ${seqDotSql("e.embedding", "p.plane", 64)} >= 0
         |        THEN CAST(power(2, p.i) AS BIGINT) ELSE 0 END) AS bucket
         |  FROM embeddings e CROSS JOIN planes p
         |  GROUP BY e.vec_id, p.t),
         |cand AS (
         |  SELECT DISTINCT a.vec_id AS id_a, b.vec_id AS id_b
         |  FROM bucketed a
         |  JOIN bucketed b ON a.t = b.t AND a.bucket = b.bucket
         |                 AND a.vec_id < b.vec_id)
         |SELECT c.id_a, c.id_b,
         |  ROUND(${cosSql("ea.embedding", "eb.embedding")}, 6) AS cosine
         |FROM cand c
         |JOIN embeddings ea ON ea.vec_id = c.id_a
         |JOIN embeddings eb ON eb.vec_id = c.id_b
         |WHERE ${cosSql("ea.embedding", "eb.embedding")} >= 0.45
         |ORDER BY id_a, id_b""".stripMargin,

    // Replays the full SemDeDup chain: bottom-k centroid pick (same
    // md5 hash), NearestCell assignment (sim DESC, cell DESC
    // tie-break — the kernel's rule), hot-cell QUALIFY aligned with
    // the Spark maxCell anti-join, then the within-cluster
    // smaller-id epsilon-ball marking.
    "q61_semantic_dedup" ->
      s"""WITH hashed AS (
         |  SELECT vec_id, embedding,
         |    ${md5Hash64Sql("CAST(vec_id AS VARCHAR)")} AS h
         |  FROM embeddings),
         |cents AS (
         |  SELECT h AS cell, CAST(embedding AS DOUBLE[]) AS cvec
         |  FROM hashed ORDER BY h LIMIT 16),
         |assign AS (
         |  SELECT hd.vec_id AS id, hd.embedding AS vec, c.cell,
         |    row_number() OVER (PARTITION BY hd.vec_id
         |      ORDER BY list_cosine_similarity(CAST(hd.embedding AS DOUBLE[]), c.cvec) DESC,
         |               c.cell DESC) AS rn
         |  FROM hashed hd CROSS JOIN cents c),
         |cells AS (SELECT id, vec, cell FROM assign WHERE rn = 1),
         |capped AS (
         |  SELECT * FROM cells
         |  QUALIFY COUNT(*) OVER (PARTITION BY cell) <= 1000),
         |dup AS (
         |  SELECT DISTINCT a.id
         |  FROM capped a JOIN capped b ON a.cell = b.cell AND b.id < a.id
         |  WHERE ${cosSql("a.vec", "b.vec")} >= 0.45)
         |SELECT c.id, c.cell, (d.id IS NOT NULL) AS is_dup
         |FROM cells c LEFT JOIN dup d ON c.id = d.id
         |ORDER BY c.id""".stripMargin,

    // q21's replay with queries = the whole corpus, nprobe 2, k 3 —
    // the graph edges every vector contributes to its probed cells.
    "q65_knn_graph" ->
      s"""WITH $knnGraphCtes
         |SELECT query_id, neighbor_id, sim, rank FROM ranked WHERE rank <= 3
         |ORDER BY query_id, rank""".stripMargin,

    "q325_graph_search" ->
      s"""WITH $knnGraphCtes,
         |gedges AS (SELECT query_id AS src, neighbor_id AS dst
         |           FROM ranked WHERE rank <= 3),
         |gq AS (SELECT vec_id AS qid, CAST(embedding AS DOUBLE[]) AS qvec
         |       FROM embeddings WHERE vec_id % 100 = 0),
         |gv AS (SELECT vec_id AS node, CAST(embedding AS DOUBLE[]) AS nvec
         |       FROM embeddings),
         |ent AS (SELECT MIN(vec_id) AS n0 FROM embeddings),
         |b0 AS (SELECT qid, gv.node,
         |         ROUND(list_cosine_similarity(gv.nvec, gq.qvec), 6) AS sim
         |       FROM gq CROSS JOIN ent JOIN gv ON gv.node = ent.n0),
         |c1 AS (SELECT qid, node FROM b0
         |       UNION SELECT b0.qid, e.dst AS node
         |             FROM b0 JOIN gedges e ON e.src = b0.node),
         |s1 AS (SELECT c1.qid, c1.node,
         |         ROUND(list_cosine_similarity(gv.nvec, gq.qvec), 6) AS sim
         |       FROM c1 JOIN gv ON gv.node = c1.node
         |            JOIN gq ON gq.qid = c1.qid),
         |b1 AS (SELECT qid, node, sim FROM (
         |         SELECT *, row_number() OVER (PARTITION BY qid
         |           ORDER BY sim DESC, node ASC) AS rn FROM s1)
         |       WHERE rn <= 4),
         |c2 AS (SELECT qid, node FROM b1
         |       UNION SELECT b1.qid, e.dst AS node
         |             FROM b1 JOIN gedges e ON e.src = b1.node),
         |s2 AS (SELECT c2.qid, c2.node,
         |         ROUND(list_cosine_similarity(gv.nvec, gq.qvec), 6) AS sim
         |       FROM c2 JOIN gv ON gv.node = c2.node
         |            JOIN gq ON gq.qid = c2.qid),
         |b2 AS (SELECT qid, node, sim FROM (
         |         SELECT *, row_number() OVER (PARTITION BY qid
         |           ORDER BY sim DESC, node ASC) AS rn FROM s2)
         |       WHERE rn <= 4),
         |fin AS (SELECT qid AS query_id, node AS neighbor_id, sim,
         |          row_number() OVER (PARTITION BY qid
         |            ORDER BY sim DESC, node ASC) AS rank
         |        FROM b2 WHERE node <> qid)
         |SELECT query_id, neighbor_id, sim, rank FROM fin WHERE rank <= 3
         |ORDER BY query_id, rank""".stripMargin,

    // The persisted-graph lifecycle replayed end-to-end: base build
    // (q65's machinery over the 90% subset), NSW insert of the held-
    // out 10% (append beam over the base graph, reverse links, per-
    // source re-trim to k), entry-table maintenance, and the final
    // multi-seed search over the post-append graph.
    "q326_graph_index" ->
      s"""WITH bhashed AS (
         |  SELECT vec_id, embedding,
         |    ${md5Hash64Sql("CAST(vec_id AS VARCHAR)")} AS h
         |  FROM embeddings WHERE vec_id % 10 <> 7),
         |bcents AS (
         |  SELECT h AS cell, CAST(embedding AS DOUBLE[]) AS cvec
         |  FROM bhashed ORDER BY h LIMIT 16),
         |bassign AS (
         |  SELECT hd.vec_id AS id, hd.embedding AS vec, c.cell,
         |    row_number() OVER (PARTITION BY hd.vec_id
         |      ORDER BY list_cosine_similarity(CAST(hd.embedding AS DOUBLE[]), c.cvec) DESC,
         |               c.cell DESC) AS rn
         |  FROM bhashed hd CROSS JOIN bcents c),
         |bcells AS (SELECT id, vec, cell FROM bassign WHERE rn = 1),
         |bqa AS (
         |  SELECT query_id, qvec, cell FROM (
         |    SELECT hd.vec_id AS query_id, hd.embedding AS qvec, c.cell,
         |      row_number() OVER (PARTITION BY hd.vec_id
         |        ORDER BY list_cosine_similarity(CAST(hd.embedding AS DOUBLE[]), c.cvec) DESC,
         |                 c.cell DESC) AS rk
         |    FROM bhashed hd CROSS JOIN bcents c) x
         |  WHERE rk <= 2),
         |bscored AS (
         |  SELECT bqa.query_id, cl.id AS neighbor_id,
         |    ROUND(${cosSql("cl.vec", "bqa.qvec")}, 6) AS sim
         |  FROM bcells cl JOIN bqa ON cl.cell = bqa.cell
         |  WHERE cl.id <> bqa.query_id),
         |e0 AS (
         |  SELECT query_id AS src, neighbor_id AS dst, sim FROM (
         |    SELECT *, row_number() OVER (PARTITION BY query_id
         |      ORDER BY sim DESC, neighbor_id ASC) AS rank FROM bscored)
         |  WHERE rank <= 3),
         |gv AS (SELECT id AS node, CAST(vec AS DOUBLE[]) AS nvec FROM bcells),
         |ent0 AS (SELECT cell, MIN(id) AS node FROM bcells GROUP BY cell),
         |nq AS (SELECT vec_id AS qid, CAST(embedding AS DOUBLE[]) AS qvec
         |       FROM embeddings WHERE vec_id % 10 = 7),
         |${graphBeamCtes("a", "nq", "gv", "e0", "ent0", beam = 4, hops = 2)},
         |aout AS (
         |  SELECT qid AS src, node AS dst, sim FROM (
         |    SELECT *, row_number() OVER (PARTITION BY qid
         |      ORDER BY sim DESC, node ASC) AS rn FROM ab2)
         |  WHERE rn <= 3),
         |arev AS (SELECT dst AS src, src AS dst, sim FROM aout),
         |e1 AS (
         |  SELECT src, dst, sim FROM (
         |    SELECT *, row_number() OVER (PARTITION BY src
         |      ORDER BY sim DESC, dst ASC) AS rn
         |    FROM (SELECT * FROM e0 UNION ALL SELECT * FROM aout
         |          UNION ALL SELECT * FROM arev))
         |  WHERE rn <= 3),
         |bat AS (
         |  SELECT qid AS id, cell FROM (
         |    SELECT nq.qid, c.cell,
         |      row_number() OVER (PARTITION BY nq.qid
         |        ORDER BY list_cosine_similarity(nq.qvec, c.cvec) DESC,
         |                 c.cell DESC) AS rn
         |    FROM nq CROSS JOIN bcents c) x
         |  WHERE rn = 1),
         |ent1 AS (
         |  SELECT cell, MIN(id) AS node FROM (
         |    SELECT cell, id FROM bcells
         |    UNION ALL SELECT cell, id FROM bat) GROUP BY cell),
         |av AS (SELECT vec_id AS node, CAST(embedding AS DOUBLE[]) AS nvec
         |       FROM embeddings),
         |sq AS (SELECT vec_id AS qid, CAST(embedding AS DOUBLE[]) AS qvec
         |       FROM embeddings WHERE vec_id % 100 = 0),
         |${graphBeamCtes("z", "sq", "av", "e1", "ent1", beam = 4, hops = 2)},
         |fin AS (SELECT qid AS query_id, node AS neighbor_id, sim,
         |          row_number() OVER (PARTITION BY qid
         |            ORDER BY sim DESC, node ASC) AS rank
         |        FROM zb2 WHERE node <> qid)
         |SELECT query_id, neighbor_id, sim, rank FROM fin WHERE rank <= 3
         |ORDER BY query_id, rank""".stripMargin,

    // Shingle count with multiplicity (kernel semantics: < n tokens →
    // one whole-text shingle); self-cosine is 1 for any nonzero vec.
    "q73_sql_surface" ->
      s"""WITH tk AS (
         |  SELECT doc_id,
         |    list_filter(string_split_regex($normText, ' '), x -> x <> '') AS tk
         |  FROM documents)
         |SELECT t.doc_id,
         |  CAST(CASE WHEN len(t.tk) < 3 THEN 1 ELSE len(t.tk) - 2 END AS INTEGER) AS n_shingles,
         |  ROUND(${cosSql("e.embedding", "e.embedding")}, 6) AS self_sim
         |FROM tk t JOIN embeddings e ON t.doc_id = e.vec_id
         |ORDER BY t.doc_id""".stripMargin,

    // q21's probe machinery + data-sampled codebooks (the SAME bottom-16
    // md5 rows as the centroids) + q51's encode/ADC/shortlist/re-rank,
    // scoped to the probed cells.
    "q75_ivfpq_persisted" ->
      s"""WITH hashed AS (
         |  SELECT vec_id, embedding,
         |    ${md5Hash64Sql("CAST(vec_id AS VARCHAR)")} AS h
         |  FROM embeddings),
         |cents AS (
         |  SELECT h AS cell, CAST(embedding AS DOUBLE[]) AS cvec
         |  FROM hashed ORDER BY h LIMIT 16),
         |assign AS (
         |  SELECT hd.vec_id AS id, hd.embedding AS vec, c.cell,
         |    row_number() OVER (PARTITION BY hd.vec_id
         |      ORDER BY list_cosine_similarity(CAST(hd.embedding AS DOUBLE[]), c.cvec) DESC,
         |               c.cell DESC) AS rn
         |  FROM hashed hd CROSS JOIN cents c),
         |cells AS (SELECT id, vec, cell FROM assign WHERE rn = 1),
         |qa AS (
         |  SELECT query_id, qvec, cell FROM (
         |    SELECT q.vec_id AS query_id, q.embedding AS qvec, c.cell,
         |      row_number() OVER (PARTITION BY q.vec_id
         |        ORDER BY list_cosine_similarity(CAST(q.embedding AS DOUBLE[]), c.cvec) DESC,
         |                 c.cell DESC) AS rk
         |    FROM embeddings q CROSS JOIN cents c WHERE q.vec_id % 100 = 0) x
         |  WHERE rk <= 4),
         |cwrows AS (
         |  SELECT row_number() OVER (ORDER BY h) - 1 AS code,
         |         CAST(embedding AS DOUBLE[]) AS v
         |  FROM (SELECT h, embedding FROM hashed ORDER BY h LIMIT 16) y),
         |books AS (
         |  SELECT ss.s, cwrows.code AS c, cwrows.v[ss.s*8+1 : ss.s*8+8] AS cw
         |  FROM cwrows CROSS JOIN (SELECT unnest(range(8)) AS s) ss),
         |dist AS (
         |  SELECT e.vec_id, b.s, b.c,
         |    list_reduce(list_transform(range(1, 9), j ->
         |      (CAST(e.embedding[b.s * 8 + j] AS DOUBLE) - b.cw[j])
         |        * (CAST(e.embedding[b.s * 8 + j] AS DOUBLE) - b.cw[j])),
         |      (a, x) -> a + x) AS d
         |  FROM embeddings e CROSS JOIN books b),
         |enc AS (
         |  SELECT vec_id, list(c ORDER BY s) AS codes FROM (
         |    SELECT vec_id, s, c,
         |      row_number() OVER (PARTITION BY vec_id, s
         |                         ORDER BY d ASC, c ASC) AS rn
         |    FROM dist) x
         |  WHERE rn = 1 GROUP BY vec_id),
         |qd AS (
         |  SELECT q.vec_id AS query_id, b.s, b.c,
         |    list_reduce(list_transform(range(1, 9), j ->
         |      CAST(q.embedding[b.s * 8 + j] AS DOUBLE) * b.cw[j]),
         |      (a, x) -> a + x) AS dp
         |  FROM embeddings q CROSS JOIN books b WHERE q.vec_id % 100 = 0),
         |qtab AS (
         |  SELECT query_id, list(dots ORDER BY s) AS tabs FROM (
         |    SELECT query_id, s, list(dp ORDER BY c) AS dots
         |    FROM qd GROUP BY query_id, s) x
         |  GROUP BY query_id),
         |scored AS (
         |  SELECT qa.query_id, cl.id AS neighbor_id,
         |    list_reduce(list_transform(range(1, 9), s ->
         |      qt.tabs[s][en.codes[s] + 1]), (a, b) -> a + b) AS adc
         |  FROM cells cl
         |  JOIN qa ON cl.cell = qa.cell
         |  JOIN enc en ON en.vec_id = cl.id
         |  JOIN qtab qt ON qt.query_id = qa.query_id
         |  WHERE cl.id <> qa.query_id),
         |short AS (
         |  SELECT query_id, neighbor_id FROM (
         |    SELECT query_id, neighbor_id,
         |      row_number() OVER (PARTITION BY query_id
         |                         ORDER BY adc DESC, neighbor_id ASC) AS rn
         |    FROM scored) x WHERE rn <= 50),
         |exact AS (
         |  SELECT sh.query_id, sh.neighbor_id,
         |    ROUND(${cosSql("e.embedding", "q.embedding")}, 6) AS sim
         |  FROM short sh
         |  JOIN embeddings e ON e.vec_id = sh.neighbor_id
         |  JOIN embeddings q ON q.vec_id = sh.query_id),
         |ranked AS (
         |  SELECT query_id, neighbor_id, sim,
         |    row_number() OVER (PARTITION BY query_id
         |                       ORDER BY sim DESC, neighbor_id ASC) AS rank
         |  FROM exact)
         |SELECT query_id, neighbor_id, sim, rank FROM ranked WHERE rank <= 5
         |ORDER BY query_id, rank""".stripMargin,

    // q75's probe scaffolding with the SQ8 closed-form codebook: ranges
    // recomputed per dimension (q84), codes per doc, ADC = the
    // dequantized-dot fold restricted to probed cells, then shortlist
    // + exact cosine re-rank.
    "q90_ivfsq8_persisted" ->
      s"""WITH hashed AS (
         |  SELECT vec_id, embedding,
         |    ${md5Hash64Sql("CAST(vec_id AS VARCHAR)")} AS h
         |  FROM embeddings),
         |cents AS (
         |  SELECT h AS cell, CAST(embedding AS DOUBLE[]) AS cvec
         |  FROM hashed ORDER BY h LIMIT 16),
         |assign AS (
         |  SELECT hd.vec_id AS id, hd.embedding AS vec, c.cell,
         |    row_number() OVER (PARTITION BY hd.vec_id
         |      ORDER BY list_cosine_similarity(CAST(hd.embedding AS DOUBLE[]), c.cvec) DESC,
         |               c.cell DESC) AS rn
         |  FROM hashed hd CROSS JOIN cents c),
         |cells AS (SELECT id, vec, cell FROM assign WHERE rn = 1),
         |qa AS (
         |  SELECT query_id, qvec, cell FROM (
         |    SELECT q.vec_id AS query_id, q.embedding AS qvec, c.cell,
         |      row_number() OVER (PARTITION BY q.vec_id
         |        ORDER BY list_cosine_similarity(CAST(q.embedding AS DOUBLE[]), c.cvec) DESC,
         |                 c.cell DESC) AS rk
         |    FROM embeddings q CROSS JOIN cents c WHERE q.vec_id % 100 = 0) x
         |  WHERE rk <= 4),
         |rng AS (
         |  SELECT d, MIN(CAST(embedding[d] AS DOUBLE)) AS mn,
         |         MAX(CAST(embedding[d] AS DOUBLE)) AS mx
         |  FROM embeddings CROSS JOIN (SELECT unnest(range(1, 65)) AS d) dd
         |  GROUP BY d),
         |scd AS (SELECT d, mn,
         |         CASE WHEN mx = mn THEN 0.0 ELSE (mx - mn) / 255.0 END AS sc
         |       FROM rng),
         |mnl AS (SELECT list(mn ORDER BY d) AS mn, list(sc ORDER BY d) AS sc FROM scd),
         |codes AS (
         |  SELECT vec_id, list_transform(range(1, 65), d ->
         |    CASE WHEN sc[d] = 0 THEN 0
         |         ELSE CAST(ROUND((CAST(embedding[d] AS DOUBLE) - mn[d]) / sc[d]) AS INT)
         |    END) AS codes
         |  FROM embeddings CROSS JOIN mnl),
         |scored AS (
         |  SELECT qa.query_id, cl.id AS neighbor_id,
         |    list_reduce(list_transform(range(1, 65), d ->
         |      CAST(qa.qvec[d] AS DOUBLE) * (mn[d] + en.codes[d] * sc[d])),
         |      (a, b) -> a + b) AS adc
         |  FROM cells cl
         |  JOIN qa ON cl.cell = qa.cell
         |  JOIN codes en ON en.vec_id = cl.id
         |  CROSS JOIN mnl
         |  WHERE cl.id <> qa.query_id),
         |short AS (
         |  SELECT query_id, neighbor_id FROM (
         |    SELECT query_id, neighbor_id,
         |      row_number() OVER (PARTITION BY query_id
         |                         ORDER BY adc DESC, neighbor_id ASC) AS rn
         |    FROM scored) x WHERE rn <= 50),
         |exact AS (
         |  SELECT sh.query_id, sh.neighbor_id,
         |    ROUND(${cosSql("e.embedding", "q.embedding")}, 6) AS sim
         |  FROM short sh
         |  JOIN embeddings e ON e.vec_id = sh.neighbor_id
         |  JOIN embeddings q ON q.vec_id = sh.query_id),
         |ranked AS (
         |  SELECT query_id, neighbor_id, sim,
         |    row_number() OVER (PARTITION BY query_id
         |                       ORDER BY sim DESC, neighbor_id ASC) AS rank
         |  FROM exact)
         |SELECT query_id, neighbor_id, sim, rank FROM ranked WHERE rank <= 5
         |ORDER BY query_id, rank""".stripMargin,

    // q75's probe scaffolding with DATA-DERIVED two-level books: b1 =
    // subvectors of the bottom-32 md5 rows' first 16, b2 = residuals
    // of the holdout 16 vs their level-1 argmin codeword; then q53's
    // interleaved encode/ADC replay scoped to the probed cells.
    "q76_ivfrq_persisted" ->
      s"""WITH hashed AS (
         |  SELECT vec_id, embedding,
         |    ${md5Hash64Sql("CAST(vec_id AS VARCHAR)")} AS h
         |  FROM embeddings),
         |cents AS (
         |  SELECT h AS cell, CAST(embedding AS DOUBLE[]) AS cvec
         |  FROM hashed ORDER BY h LIMIT 16),
         |assign AS (
         |  SELECT hd.vec_id AS id, hd.embedding AS vec, c.cell,
         |    row_number() OVER (PARTITION BY hd.vec_id
         |      ORDER BY list_cosine_similarity(CAST(hd.embedding AS DOUBLE[]), c.cvec) DESC,
         |               c.cell DESC) AS rn
         |  FROM hashed hd CROSS JOIN cents c),
         |cells AS (SELECT id, vec, cell FROM assign WHERE rn = 1),
         |qa AS (
         |  SELECT query_id, qvec, cell FROM (
         |    SELECT q.vec_id AS query_id, q.embedding AS qvec, c.cell,
         |      row_number() OVER (PARTITION BY q.vec_id
         |        ORDER BY list_cosine_similarity(CAST(q.embedding AS DOUBLE[]), c.cvec) DESC,
         |                 c.cell DESC) AS rk
         |    FROM embeddings q CROSS JOIN cents c WHERE q.vec_id % 100 = 0) x
         |  WHERE rk <= 4),
         |cw32 AS (
         |  SELECT row_number() OVER (ORDER BY h) - 1 AS code,
         |         CAST(embedding AS DOUBLE[]) AS v
         |  FROM (SELECT h, embedding FROM hashed ORDER BY h LIMIT 32) y),
         |b1 AS (
         |  SELECT ss.s, cw32.code AS c, cw32.v[ss.s*8+1 : ss.s*8+8] AS cw
         |  FROM cw32 CROSS JOIN (SELECT unnest(range(8)) AS s) ss
         |  WHERE cw32.code < 16),
         |hsub AS (
         |  SELECT ss.s, cw32.code - 16 AS j2, cw32.v[ss.s*8+1 : ss.s*8+8] AS sub
         |  FROM cw32 CROSS JOIN (SELECT unnest(range(8)) AS s) ss
         |  WHERE cw32.code >= 16),
         |hd2 AS (
         |  SELECT h.s, h.j2, b.c, h.sub, b.cw,
         |    list_reduce(list_transform(range(1, 9), j ->
         |      (h.sub[j] - b.cw[j]) * (h.sub[j] - b.cw[j])), (a, x) -> a + x) AS d
         |  FROM hsub h JOIN b1 b ON b.s = h.s),
         |b2 AS (
         |  SELECT s, j2 AS c,
         |    list_transform(range(1, 9), j -> sub[j] - cw[j]) AS cw FROM (
         |    SELECT s, j2, sub, cw,
         |      row_number() OVER (PARTITION BY s, j2 ORDER BY d ASC, c ASC) AS rn
         |    FROM hd2) x WHERE rn = 1),
         |dist1 AS (
         |  SELECT e.vec_id, b.s, b.c,
         |    list_reduce(list_transform(range(1, 9), j ->
         |      (CAST(e.embedding[b.s * 8 + j] AS DOUBLE) - b.cw[j])
         |        * (CAST(e.embedding[b.s * 8 + j] AS DOUBLE) - b.cw[j])),
         |      (a, x) -> a + x) AS d
         |  FROM embeddings e CROSS JOIN b1 b),
         |c1 AS (
         |  SELECT vec_id, s, c AS c1 FROM (
         |    SELECT vec_id, s, c,
         |      row_number() OVER (PARTITION BY vec_id, s
         |                         ORDER BY d ASC, c ASC) AS rn
         |    FROM dist1) x WHERE rn = 1),
         |dist2 AS (
         |  SELECT c1.vec_id, c1.s, b.c,
         |    list_reduce(list_transform(range(1, 9), j ->
         |      ((CAST(e.embedding[c1.s * 8 + j] AS DOUBLE) - w1.cw[j]) - b.cw[j])
         |        * ((CAST(e.embedding[c1.s * 8 + j] AS DOUBLE) - w1.cw[j]) - b.cw[j])),
         |      (a, x) -> a + x) AS d
         |  FROM c1
         |  JOIN embeddings e ON e.vec_id = c1.vec_id
         |  JOIN b1 w1 ON w1.s = c1.s AND w1.c = c1.c1
         |  JOIN b2 b ON b.s = c1.s),
         |c2 AS (
         |  SELECT vec_id, s, c AS c2 FROM (
         |    SELECT vec_id, s, c,
         |      row_number() OVER (PARTITION BY vec_id, s
         |                         ORDER BY d ASC, c ASC) AS rn
         |    FROM dist2) x WHERE rn = 1),
         |enc AS (
         |  SELECT vec_id, list(code ORDER BY pos) AS codes FROM (
         |    SELECT vec_id, s * 2 AS pos, c1 AS code FROM c1
         |    UNION ALL
         |    SELECT vec_id, s * 2 + 1 AS pos, c2 AS code FROM c2) u
         |  GROUP BY vec_id),
         |qd1 AS (
         |  SELECT q.vec_id AS query_id, b.s, b.c,
         |    list_reduce(list_transform(range(1, 9), j ->
         |      CAST(q.embedding[b.s * 8 + j] AS DOUBLE) * b.cw[j]),
         |      (a, x) -> a + x) AS dp
         |  FROM embeddings q CROSS JOIN b1 b WHERE q.vec_id % 100 = 0),
         |qd2 AS (
         |  SELECT q.vec_id AS query_id, b.s, b.c,
         |    list_reduce(list_transform(range(1, 9), j ->
         |      CAST(q.embedding[b.s * 8 + j] AS DOUBLE) * b.cw[j]),
         |      (a, x) -> a + x) AS dp
         |  FROM embeddings q CROSS JOIN b2 b WHERE q.vec_id % 100 = 0),
         |qtab AS (
         |  SELECT query_id, list(dots ORDER BY pos) AS tabs FROM (
         |    SELECT query_id, s * 2 AS pos, list(dp ORDER BY c) AS dots
         |    FROM qd1 GROUP BY query_id, s
         |    UNION ALL
         |    SELECT query_id, s * 2 + 1 AS pos, list(dp ORDER BY c) AS dots
         |    FROM qd2 GROUP BY query_id, s) u
         |  GROUP BY query_id),
         |scored AS (
         |  SELECT qa.query_id, cl.id AS neighbor_id,
         |    list_reduce(list_transform(range(1, 17), i ->
         |      qt.tabs[i][en.codes[i] + 1]), (a, b) -> a + b) AS adc
         |  FROM cells cl
         |  JOIN qa ON cl.cell = qa.cell
         |  JOIN enc en ON en.vec_id = cl.id
         |  JOIN qtab qt ON qt.query_id = qa.query_id
         |  WHERE cl.id <> qa.query_id),
         |short AS (
         |  SELECT query_id, neighbor_id FROM (
         |    SELECT query_id, neighbor_id,
         |      row_number() OVER (PARTITION BY query_id
         |                         ORDER BY adc DESC, neighbor_id ASC) AS rn
         |    FROM scored) x WHERE rn <= 50),
         |exact AS (
         |  SELECT sh.query_id, sh.neighbor_id,
         |    ROUND(${cosSql("e.embedding", "q.embedding")}, 6) AS sim
         |  FROM short sh
         |  JOIN embeddings e ON e.vec_id = sh.neighbor_id
         |  JOIN embeddings q ON q.vec_id = sh.query_id),
         |ranked AS (
         |  SELECT query_id, neighbor_id, sim,
         |    row_number() OVER (PARTITION BY query_id
         |                       ORDER BY sim DESC, neighbor_id ASC) AS rank
         |  FROM exact)
         |SELECT query_id, neighbor_id, sim, rank FROM ranked WHERE rank <= 5
         |ORDER BY query_id, rank""".stripMargin,

    "q21_knn_ivf" -> ivfOracleSql,

    // Persisted-index twin: identical semantics, answered through the
    // on-disk cell-partitioned index + pruned probe.
    "q72_ivf_persisted" -> ivfOracleSql,

    // The embedding-store lifecycle replay: q72's IVF machinery with
    // centroids picked from the EVEN half (the write-time universe,
    // INCLUDING later-deleted rows — deletion does not retrain) and
    // the cells universe filtered to the compaction survivors
    // (id % 4 <> 0): pairs must behave as if the deleted docs were
    // never ingested, while the centroid pick must remember they were.
    "q113_store_semantic" ->
      s"""WITH hashed AS (
         |  SELECT vec_id, embedding,
         |    ${md5Hash64Sql("CAST(vec_id AS VARCHAR)")} AS h
         |  FROM embeddings WHERE vec_id % 2 = 0),
         |cents AS (
         |  SELECT h AS cell, CAST(embedding AS DOUBLE[]) AS cvec
         |  FROM hashed ORDER BY h LIMIT 16),
         |assign AS (
         |  SELECT hd.vec_id AS id, hd.embedding AS vec, c.cell,
         |    row_number() OVER (PARTITION BY hd.vec_id
         |      ORDER BY list_cosine_similarity(CAST(hd.embedding AS DOUBLE[]), c.cvec) DESC,
         |               c.cell DESC) AS rn
         |  FROM hashed hd CROSS JOIN cents c),
         |cells AS (SELECT id, vec, cell FROM assign WHERE rn = 1 AND id % 4 <> 0),
         |qa AS (
         |  SELECT query_id, qvec, cell FROM (
         |    SELECT q.vec_id AS query_id, q.embedding AS qvec, c.cell,
         |      row_number() OVER (PARTITION BY q.vec_id
         |        ORDER BY list_cosine_similarity(CAST(q.embedding AS DOUBLE[]), c.cvec) DESC,
         |                 c.cell DESC) AS rk
         |    FROM embeddings q CROSS JOIN cents c WHERE q.vec_id % 2 = 1) x
         |  WHERE rk <= 4),
         |scored AS (
         |  SELECT qa.query_id, cl.id AS neighbor_id,
         |    ROUND(${cosSql("cl.vec", "qa.qvec")}, 6) AS sim
         |  FROM cells cl JOIN qa ON cl.cell = qa.cell
         |  WHERE cl.id <> qa.query_id),
         |ranked AS (
         |  SELECT query_id, neighbor_id, sim,
         |    row_number() OVER (PARTITION BY query_id
         |                       ORDER BY sim DESC, neighbor_id ASC) AS rank
         |  FROM scored)
         |SELECT query_id AS id_new, neighbor_id AS id_store, sim
         |FROM ranked WHERE rank = 1 AND sim >= 0.3
         |ORDER BY id_new""".stripMargin,

    // Drift replay: the same frozen even-half centroid pick and
    // nearest-cell assignment over ALL vectors (evens at write, odds
    // at append), per-row angular distance rounded to micro-units,
    // then integer-DIV means — SUM/COUNT stay in exact integer
    // arithmetic so the metric is bit-stable across engines.
    "q114_centroid_drift" ->
      s"""WITH hashed AS (
         |  SELECT vec_id, embedding,
         |    ${md5Hash64Sql("CAST(vec_id AS VARCHAR)")} AS h
         |  FROM embeddings WHERE vec_id % 2 = 0),
         |cents AS (
         |  SELECT h AS cell, CAST(embedding AS DOUBLE[]) AS cvec
         |  FROM hashed ORDER BY h LIMIT 16),
         |assign AS (
         |  SELECT e.vec_id AS id, e.embedding AS vec, c.cell, c.cvec,
         |    row_number() OVER (PARTITION BY e.vec_id
         |      ORDER BY list_cosine_similarity(CAST(e.embedding AS DOUBLE[]), c.cvec) DESC,
         |               c.cell DESC) AS rn
         |  FROM embeddings e CROSS JOIN cents c),
         |d AS (
         |  SELECT cell,
         |    CAST(round(1e6 * (1.0 - ${cosSql("vec", "cvec")})) AS BIGINT) AS d
         |  FROM assign WHERE rn = 1),
         |pc AS (SELECT cell, COUNT(*) AS n, SUM(d) AS s FROM d GROUP BY cell)
         |SELECT CAST(SUM(n) AS BIGINT) AS n_vectors,
         |  CAST(SUM(s) AS BIGINT) // CAST(SUM(n) AS BIGINT) AS mean_drift_micro,
         |  MAX(CAST(s AS BIGINT) // CAST(n AS BIGINT)) AS max_cell_drift_micro
         |FROM pc""".stripMargin,

    "q20_knn_bruteforce" ->
      s"""WITH q AS (SELECT vec_id AS query_id, embedding AS qvec
         |           FROM embeddings WHERE vec_id % 100 = 0),
         |scored AS (
         |  SELECT q.query_id, e.vec_id AS neighbor_id,
         |         ROUND(${cosSql("e.embedding", "q.qvec")}, 6) AS sim
         |  FROM embeddings e CROSS JOIN q WHERE e.vec_id <> q.query_id),
         |ranked AS (
         |  SELECT query_id, neighbor_id, sim,
         |         ROW_NUMBER() OVER (PARTITION BY query_id
         |                            ORDER BY sim DESC, neighbor_id ASC) AS rank
         |  FROM scored)
         |SELECT query_id, neighbor_id, sim, rank FROM ranked WHERE rank <= 5
         |ORDER BY query_id, rank""".stripMargin,

    "q46_knn_ivf_refined" ->
      s"""WITH hashed AS (
         |  SELECT vec_id, embedding,
         |    ${md5Hash64Sql("CAST(vec_id AS VARCHAR)")} AS h
         |  FROM embeddings),
         |cents0 AS (
         |  SELECT h AS cell, CAST(embedding AS DOUBLE[]) AS cvec
         |  FROM hashed ORDER BY h LIMIT 16),
         |asn0 AS (
         |  SELECT hd.vec_id AS id, hd.embedding AS vec, c.cell,
         |    row_number() OVER (PARTITION BY hd.vec_id
         |      ORDER BY list_cosine_similarity(CAST(hd.embedding AS DOUBLE[]), c.cvec) DESC,
         |               c.cell DESC) AS rn
         |  FROM hashed hd CROSS JOIN cents0 c),
         |members AS (SELECT id, vec, cell FROM asn0 WHERE rn = 1),
         |cm AS (
         |  SELECT cell, d,
         |    list_reduce(list(CAST(vec[d] AS DOUBLE) ORDER BY id), (a, b) -> a + b)
         |      / COUNT(*) AS mu
         |  FROM members CROSS JOIN (SELECT unnest(range(1, 65)) AS d) dd
         |  GROUP BY cell, d),
         |cents AS (SELECT cell, list(mu ORDER BY d) AS cvec FROM cm GROUP BY cell),
         |assign AS (
         |  SELECT hd.vec_id AS id, hd.embedding AS vec, c.cell,
         |    row_number() OVER (PARTITION BY hd.vec_id
         |      ORDER BY list_cosine_similarity(CAST(hd.embedding AS DOUBLE[]), c.cvec) DESC,
         |               c.cell DESC) AS rn
         |  FROM hashed hd CROSS JOIN cents c),
         |cells AS (SELECT id, vec, cell FROM assign WHERE rn = 1),
         |qa AS (
         |  SELECT query_id, qvec, cell FROM (
         |    SELECT q.vec_id AS query_id, q.embedding AS qvec, c.cell,
         |      row_number() OVER (PARTITION BY q.vec_id
         |        ORDER BY list_cosine_similarity(CAST(q.embedding AS DOUBLE[]), c.cvec) DESC,
         |                 c.cell DESC) AS rk
         |    FROM embeddings q CROSS JOIN cents c WHERE q.vec_id % 100 = 0) x
         |  WHERE rk <= 4),
         |scored AS (
         |  SELECT qa.query_id, cl.id AS neighbor_id,
         |    ROUND(${cosSql("cl.vec", "qa.qvec")}, 6) AS sim
         |  FROM cells cl JOIN qa ON cl.cell = qa.cell
         |  WHERE cl.id <> qa.query_id),
         |ranked AS (
         |  SELECT query_id, neighbor_id, sim,
         |    row_number() OVER (PARTITION BY query_id
         |                       ORDER BY sim DESC, neighbor_id ASC) AS rank
         |  FROM scored)
         |SELECT query_id, neighbor_id, sim, rank FROM ranked WHERE rank <= 5
         |ORDER BY query_id, rank""".stripMargin,

    // PQ ADC replay: same 8×16×8 seeded codebooks as VALUES literals;
    // every float step (argmin-L2 encode, per-query dot tables, ADC
    // fold, cosine re-rank) is an ordered left fold in both engines.
    "q51_pq_adc" ->
      s"""WITH books(s, c, cw) AS (VALUES
         |      ${pqBooksSql(m = 8, k = 16, subDim = 8, seed = 13L)}),
         |dist AS (
         |  SELECT e.vec_id, b.s, b.c,
         |    list_reduce(list_transform(range(1, 9), j ->
         |      (CAST(e.embedding[b.s * 8 + j] AS DOUBLE) - b.cw[j])
         |        * (CAST(e.embedding[b.s * 8 + j] AS DOUBLE) - b.cw[j])),
         |      (a, x) -> a + x) AS d
         |  FROM embeddings e CROSS JOIN books b),
         |enc AS (
         |  SELECT vec_id, list(c ORDER BY s) AS codes FROM (
         |    SELECT vec_id, s, c,
         |      row_number() OVER (PARTITION BY vec_id, s
         |                         ORDER BY d ASC, c ASC) AS rn
         |    FROM dist) x
         |  WHERE rn = 1 GROUP BY vec_id),
         |qd AS (
         |  SELECT q.vec_id AS query_id, b.s, b.c,
         |    list_reduce(list_transform(range(1, 9), j ->
         |      CAST(q.embedding[b.s * 8 + j] AS DOUBLE) * b.cw[j]),
         |      (a, x) -> a + x) AS dp
         |  FROM embeddings q CROSS JOIN books b WHERE q.vec_id % 100 = 0),
         |qtab AS (
         |  SELECT query_id, list(dots ORDER BY s) AS tabs FROM (
         |    SELECT query_id, s, list(dp ORDER BY c) AS dots
         |    FROM qd GROUP BY query_id, s) x
         |  GROUP BY query_id),
         |scored AS (
         |  SELECT qt.query_id, e.vec_id AS neighbor_id,
         |    list_reduce(list_transform(range(1, 9), s ->
         |      qt.tabs[s][e.codes[s] + 1]), (a, b) -> a + b) AS adc
         |  FROM enc e CROSS JOIN qtab qt
         |  WHERE e.vec_id <> qt.query_id),
         |short AS (
         |  SELECT query_id, neighbor_id FROM (
         |    SELECT query_id, neighbor_id,
         |      row_number() OVER (PARTITION BY query_id
         |                         ORDER BY adc DESC, neighbor_id ASC) AS rn
         |    FROM scored) x WHERE rn <= 50),
         |exact AS (
         |  SELECT sh.query_id, sh.neighbor_id,
         |    ROUND(${cosSql("e.embedding", "q.embedding")}, 6) AS sim
         |  FROM short sh
         |  JOIN embeddings e ON e.vec_id = sh.neighbor_id
         |  JOIN embeddings q ON q.vec_id = sh.query_id),
         |ranked AS (
         |  SELECT query_id, neighbor_id, sim,
         |    row_number() OVER (PARTITION BY query_id
         |                       ORDER BY sim DESC, neighbor_id ASC) AS rank
         |  FROM exact)
         |SELECT query_id, neighbor_id, sim, rank FROM ranked WHERE rank <= 5
         |ORDER BY query_id, rank""".stripMargin,

    // Residual-quantization replay: two seeded codebook levels as VALUES
    // literals; level-1 argmin encode, then argmin over the level-2 books
    // for the RESIDUAL sub − cw1; interleaved codes [c1_0,c2_0,...] scored
    // against interleaved dot tables — every float step an ordered fold.
    "q53_rq_adc" ->
      s"""WITH b1(s, c, cw) AS (VALUES
         |      ${pqBooksSql(m = 8, k = 16, subDim = 8, seed = 13L)}),
         |b2(s, c, cw) AS (VALUES
         |      ${pqBooksSql(m = 8, k = 16, subDim = 8, seed = 29L)}),
         |dist1 AS (
         |  SELECT e.vec_id, b.s, b.c,
         |    list_reduce(list_transform(range(1, 9), j ->
         |      (CAST(e.embedding[b.s * 8 + j] AS DOUBLE) - b.cw[j])
         |        * (CAST(e.embedding[b.s * 8 + j] AS DOUBLE) - b.cw[j])),
         |      (a, x) -> a + x) AS d
         |  FROM embeddings e CROSS JOIN b1 b),
         |c1 AS (
         |  SELECT vec_id, s, c AS c1 FROM (
         |    SELECT vec_id, s, c,
         |      row_number() OVER (PARTITION BY vec_id, s
         |                         ORDER BY d ASC, c ASC) AS rn
         |    FROM dist1) x WHERE rn = 1),
         |dist2 AS (
         |  SELECT c1.vec_id, c1.s, b.c,
         |    list_reduce(list_transform(range(1, 9), j ->
         |      ((CAST(e.embedding[c1.s * 8 + j] AS DOUBLE) - w1.cw[j]) - b.cw[j])
         |        * ((CAST(e.embedding[c1.s * 8 + j] AS DOUBLE) - w1.cw[j]) - b.cw[j])),
         |      (a, x) -> a + x) AS d
         |  FROM c1
         |  JOIN embeddings e ON e.vec_id = c1.vec_id
         |  JOIN b1 w1 ON w1.s = c1.s AND w1.c = c1.c1
         |  JOIN b2 b ON b.s = c1.s),
         |c2 AS (
         |  SELECT vec_id, s, c AS c2 FROM (
         |    SELECT vec_id, s, c,
         |      row_number() OVER (PARTITION BY vec_id, s
         |                         ORDER BY d ASC, c ASC) AS rn
         |    FROM dist2) x WHERE rn = 1),
         |enc AS (
         |  SELECT vec_id, list(code ORDER BY pos) AS codes FROM (
         |    SELECT vec_id, s * 2 AS pos, c1 AS code FROM c1
         |    UNION ALL
         |    SELECT vec_id, s * 2 + 1 AS pos, c2 AS code FROM c2) u
         |  GROUP BY vec_id),
         |qd1 AS (
         |  SELECT q.vec_id AS query_id, b.s, b.c,
         |    list_reduce(list_transform(range(1, 9), j ->
         |      CAST(q.embedding[b.s * 8 + j] AS DOUBLE) * b.cw[j]),
         |      (a, x) -> a + x) AS dp
         |  FROM embeddings q CROSS JOIN b1 b WHERE q.vec_id % 100 = 0),
         |qd2 AS (
         |  SELECT q.vec_id AS query_id, b.s, b.c,
         |    list_reduce(list_transform(range(1, 9), j ->
         |      CAST(q.embedding[b.s * 8 + j] AS DOUBLE) * b.cw[j]),
         |      (a, x) -> a + x) AS dp
         |  FROM embeddings q CROSS JOIN b2 b WHERE q.vec_id % 100 = 0),
         |qtab AS (
         |  SELECT query_id, list(dots ORDER BY pos) AS tabs FROM (
         |    SELECT query_id, s * 2 AS pos, list(dp ORDER BY c) AS dots
         |    FROM qd1 GROUP BY query_id, s
         |    UNION ALL
         |    SELECT query_id, s * 2 + 1 AS pos, list(dp ORDER BY c) AS dots
         |    FROM qd2 GROUP BY query_id, s) u
         |  GROUP BY query_id),
         |scored AS (
         |  SELECT qt.query_id, e.vec_id AS neighbor_id,
         |    list_reduce(list_transform(range(1, 17), i ->
         |      qt.tabs[i][e.codes[i] + 1]), (a, b) -> a + b) AS adc
         |  FROM enc e CROSS JOIN qtab qt
         |  WHERE e.vec_id <> qt.query_id),
         |short AS (
         |  SELECT query_id, neighbor_id FROM (
         |    SELECT query_id, neighbor_id,
         |      row_number() OVER (PARTITION BY query_id
         |                         ORDER BY adc DESC, neighbor_id ASC) AS rn
         |    FROM scored) x WHERE rn <= 50),
         |exact AS (
         |  SELECT sh.query_id, sh.neighbor_id,
         |    ROUND(${cosSql("e.embedding", "q.embedding")}, 6) AS sim
         |  FROM short sh
         |  JOIN embeddings e ON e.vec_id = sh.neighbor_id
         |  JOIN embeddings q ON q.vec_id = sh.query_id),
         |ranked AS (
         |  SELECT query_id, neighbor_id, sim,
         |    row_number() OVER (PARTITION BY query_id
         |                       ORDER BY sim DESC, neighbor_id ASC) AS rank
         |  FROM exact)
         |SELECT query_id, neighbor_id, sim, rank FROM ranked WHERE rank <= 5
         |ORDER BY query_id, rank""".stripMargin,

    // One ordered-fold Lloyd round over the md5-bottom-16 sampled
    // codebooks (the q46 trick applied to PQ): sample → slice → argmin
    // encode → per-(s,code,d) ordered mean; no-member codewords keep
    // their sampled value.
    "q55_pq_kmeans_ordered" ->
      s"""WITH hashed AS (
         |  SELECT vec_id, embedding,
         |    ${md5Hash64Sql("CAST(vec_id AS VARCHAR)")} AS h
         |  FROM embeddings),
         |samp AS (
         |  SELECT embedding, row_number() OVER (ORDER BY h) - 1 AS code
         |  FROM (SELECT * FROM hashed ORDER BY h LIMIT 16) x),
         |books0 AS (
         |  SELECT ss.s, samp.code,
         |    list_transform(range(1, 9), j ->
         |      CAST(samp.embedding[ss.s * 8 + j] AS DOUBLE)) AS cw
         |  FROM samp CROSS JOIN (SELECT unnest(range(8)) AS s) ss),
         |dist AS (
         |  SELECT e.vec_id, b.s, b.code AS c,
         |    list_reduce(list_transform(range(1, 9), j ->
         |      (CAST(e.embedding[b.s * 8 + j] AS DOUBLE) - b.cw[j])
         |        * (CAST(e.embedding[b.s * 8 + j] AS DOUBLE) - b.cw[j])),
         |      (a, x) -> a + x) AS d
         |  FROM embeddings e CROSS JOIN books0 b),
         |enc AS (
         |  SELECT vec_id, s, c FROM (
         |    SELECT vec_id, s, c,
         |      row_number() OVER (PARTITION BY vec_id, s
         |                         ORDER BY d ASC, c ASC) AS rn
         |    FROM dist) x WHERE rn = 1),
         |members AS (
         |  SELECT en.s, en.c AS code, dd.d, hd.vec_id,
         |    CAST(hd.embedding[en.s * 8 + dd.d] AS DOUBLE) AS x
         |  FROM enc en JOIN hashed hd ON hd.vec_id = en.vec_id
         |  CROSS JOIN (SELECT unnest(range(1, 9)) AS d) dd),
         |mu AS (
         |  SELECT s, code, d,
         |    list_reduce(list(x ORDER BY vec_id), (a, b) -> a + b)
         |      / COUNT(*) AS mu
         |  FROM members GROUP BY s, code, d)
         |SELECT CAST(b.s AS INT) AS s, CAST(b.code AS INT) AS code,
         |  CAST(dd.d AS INT) AS d,
         |  ROUND(COALESCE(mu.mu, b.cw[dd.d]), 6) AS mu
         |FROM books0 b
         |CROSS JOIN (SELECT unnest(range(1, 9)) AS d) dd
         |LEFT JOIN mu ON mu.s = b.s AND mu.code = b.code AND mu.d = dd.d
         |ORDER BY s, code, d""".stripMargin,

    "q52_range_join" ->
      """WITH epochs AS (
        |  SELECT c_custkey, v.s AS start_date, v.e AS end_date, v.epoch
        |  FROM customer CROSS JOIN (VALUES
        |    (DATE '1995-01-01', DATE '1998-01-01', 'early'),
        |    (DATE '1998-01-01', NULL, 'late')) v(s, e, epoch)
        |  WHERE c_custkey % 3 <> 0)
        |SELECT o.o_orderkey, o.o_custkey,
        |       CAST(o.o_orderdate AS DATE) AS o_date, e.epoch
        |FROM orders o LEFT JOIN epochs e
        |  ON o.o_custkey = e.c_custkey
        | AND e.start_date <= CAST(o.o_orderdate AS DATE)
        | AND (e.end_date IS NULL OR CAST(o.o_orderdate AS DATE) < e.end_date)
        |ORDER BY o_orderkey""".stripMargin,

    "q56_item_definitions" ->
      """WITH details(item, start_date, end_date, reporting_form, itemtype, description) AS (VALUES
        |  ('RCON2170', DATE '1992-01-01', DATE '1996-01-01', 'FFIEC 031', 'RCON', 'total assets (v1)'),
        |  ('RCON2170', DATE '1996-01-01', NULL, 'FFIEC 041', 'RCON', 'total assets (v2)'),
        |  ('RCON2171', DATE '1994-06-30', DATE '1997-06-30', 'FFIEC 031', 'RCON', 'cash (v1)'),
        |  ('RCON2171', DATE '1997-06-30', NULL, 'FFIEC 041', 'RCON', 'cash (v2)'),
        |  ('RCON2172', DATE '1995-03-31', NULL, 'FFIEC 041', 'RCON', 'securities')),
        |facts AS (
        |  SELECT o_orderkey,
        |    'RCON' || CAST(o_orderkey % 4 + 2170 AS VARCHAR) AS item,
        |    CAST(o_orderdate AS DATE) AS fact_date
        |  FROM orders)
        |SELECT f.o_orderkey, f.item, f.fact_date,
        |  d.reporting_form, d.itemtype, d.description
        |FROM facts f LEFT JOIN details d
        |  ON f.item = d.item
        | AND d.start_date <= f.fact_date
        | AND (d.end_date IS NULL OR f.fact_date < d.end_date)
        |ORDER BY o_orderkey""".stripMargin,

    "q22_token_count" ->
      """SELECT doc_id,
        |  CAST(len(list_filter(string_split_regex(trim(text), '\s+'), x -> x <> '')) AS INTEGER) AS n_tokens,
        |  CAST(length(text) AS INTEGER) AS n_chars_m
        |FROM documents ORDER BY doc_id""".stripMargin,

    "q23_lang_id" ->
      s"""WITH t AS (SELECT doc_id, $toksLower AS toks FROM documents),
         |h AS (SELECT doc_id,
         |  len(list_filter(toks, x -> list_contains(['der','die','und','ist','nicht','das','ein','zu'], x))) AS de,
         |  len(list_filter(toks, x -> list_contains(['the','and','is','of','to','in','that','it'], x))) AS en,
         |  len(list_filter(toks, x -> list_contains(['el','la','de','que','los','una','es','por'], x))) AS es,
         |  len(list_filter(toks, x -> list_contains(['le','la','les','des','est','une','dans','pas'], x))) AS fr
         |  FROM t)
         |SELECT doc_id,
         |  CASE WHEN greatest(de, en, es, fr) = 0 THEN 'und'
         |       WHEN de >= en AND de >= es AND de >= fr THEN 'de'
         |       WHEN en >= es AND en >= fr THEN 'en'
         |       WHEN es >= fr THEN 'es'
         |       ELSE 'fr' END AS lang_pred
         |FROM h ORDER BY doc_id""".stripMargin,

    "q24_quality_score" ->
      s"""WITH t AS (
         |  SELECT doc_id, text,
         |    len(list_filter(string_split_regex(trim(text), '\\s+'), x -> x <> '')) AS n_tok,
         |    CASE WHEN length(text) = 0 THEN 0.0
         |         ELSE (length(text) - length(regexp_replace(text, '[[:punct:]]', '', 'g'))) * 1.0 / length(text)
         |    END AS punct_ratio,
         |    CASE WHEN len($toksLower) = 0 THEN 0.0
         |         ELSE len(list_filter($toksLower,
         |                x -> list_contains(['the','a','an','and','or','of','to','in','is','it','that','for','on','with','as','was','at','by'], x))) * 1.0
         |              / len($toksLower)
         |    END AS stop_ratio
         |  FROM documents)
         |SELECT doc_id,
         |  ROUND(least(n_tok / 50.0, 1.0) * 0.4
         |        + greatest(0.0, 1.0 - punct_ratio * 4.0) * 0.3
         |        + least(stop_ratio * 3.0, 1.0) * 0.3, 6) AS quality
         |FROM t ORDER BY doc_id""".stripMargin,

    "q25_fingerprint" ->
      s"""SELECT doc_id, md5($normText) AS fp FROM documents ORDER BY doc_id""".stripMargin,

    "q26_union_by_name" ->
      """SELECT o_orderkey, o_totalprice, CAST(NULL AS VARCHAR) AS o_orderstatus
        |FROM orders WHERE o_orderkey % 2 = 0
        |UNION ALL
        |SELECT o_orderkey, CAST(NULL AS DOUBLE), o_orderstatus
        |FROM orders WHERE o_orderkey % 2 = 1
        |ORDER BY o_orderkey""".stripMargin,

    "q27_item_schedules" ->
      """SELECT item, array_to_string(list_sort(list(DISTINCT schedule)), ',') AS schedules FROM (
        |  SELECT 'lineitem' AS schedule, item FROM (
        |    UNPIVOT (SELECT l_orderkey, l_quantity, l_extendedprice, l_discount, l_tax
        |             FROM lineitem LIMIT 1)
        |    ON COLUMNS(* EXCLUDE (l_orderkey)) INTO NAME item VALUE value)
        |  UNION ALL
        |  SELECT 'orders', item FROM (
        |    UNPIVOT (SELECT o_orderkey, o_totalprice FROM orders LIMIT 1)
        |    ON COLUMNS(* EXCLUDE (o_orderkey)) INTO NAME item VALUE value))
        |GROUP BY item ORDER BY item""".stripMargin,

    "q28_xbrl_extract" ->
      """SELECT CAST(o_orderkey AS INTEGER) AS idrssd,
        |  '1998-12-31' AS report_date, 'rc' AS schedule, 'RCFD2170' AS item,
        |  'USD' AS unit_ref, '0' AS decimals,
        |  CAST(o_custkey AS VARCHAR) AS value, 3 AS n_attrs
        |FROM orders ORDER BY idrssd""".stripMargin,

    "q29_tz_convert" ->
      """SELECT event_id,
        |  CAST(floor(epoch(CAST(strftime(ts, '%Y-%m-%dT%H:%M:%S') AS TIMESTAMP))) AS BIGINT)
        |    + 5 * 3600 AS utc_epoch
        |FROM events ORDER BY event_id""".stripMargin,

    "q30_event_windows" ->
      """SELECT CAST(floor(epoch(date_trunc('hour', ts))) AS BIGINT) AS window_epoch,
        |  event_type, COUNT(*) AS n_events,
        |  CAST(SUM(CAST(value AS DECIMAL(28,4))) AS DOUBLE) AS sum_value
        |FROM events
        |GROUP BY 1, 2 ORDER BY window_epoch, event_type""".stripMargin,

    "q31_sessionize" ->
      """WITH x AS (
        |  SELECT user_id, ts, value, event_id,
        |    CASE WHEN lag(ts) OVER w IS NULL
        |              OR floor(epoch(ts)) - floor(epoch(lag(ts) OVER w)) > 1800
        |         THEN 1 ELSE 0 END AS new_s
        |  FROM events
        |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
        |y AS (
        |  SELECT user_id, ts, value,
        |    CAST(SUM(new_s) OVER (PARTITION BY user_id ORDER BY ts, event_id
        |                          ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_seq
        |  FROM x)
        |SELECT user_id, session_seq,
        |  CAST(floor(epoch(MIN(ts))) AS BIGINT) AS start_epoch,
        |  CAST(floor(epoch(MAX(ts))) AS BIGINT) AS end_epoch,
        |  COUNT(*) AS n_events,
        |  CAST(SUM(CAST(value AS DECIMAL(28,4))) AS DOUBLE) AS sum_value
        |FROM y GROUP BY user_id, session_seq
        |ORDER BY user_id, session_seq""".stripMargin,

    "q32_redact_pii" ->
      """SELECT doc_id,
        |  regexp_replace(
        |    regexp_replace(raw, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
        |    '\b\d{3}[-. ]\d{4}\b', '<PHONE>', 'g') AS redacted
        |FROM (SELECT doc_id,
        |        substring(text, 1, 20) || ' contact user' || doc_id ||
        |        '@mail.example.com or call 555-' ||
        |        lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0') AS raw
        |      FROM documents) x
        |ORDER BY doc_id""".stripMargin,

    "q33_top_terms" ->
      """SELECT term, COUNT(*) AS n FROM (
        |  SELECT unnest(list_filter(string_split_regex(trim(lower(text)), '\s+'),
        |                            x -> x <> '')) AS term
        |  FROM documents) t
        |GROUP BY term
        |ORDER BY n DESC, term ASC
        |LIMIT 20""".stripMargin,

    "q34_bigram_counts" ->
      s"""WITH toks AS (
         |  SELECT doc_id,
         |         list_filter(string_split_regex($normText, ' '), x -> x <> '') AS tk
         |  FROM documents),
         |bg AS (
         |  SELECT unnest(CASE WHEN len(tk) < 2 THEN [array_to_string(tk, ' ')]
         |    ELSE list_transform(range(1, len(tk)), i -> tk[i] || ' ' || tk[i+1])
         |    END) AS bigram
         |  FROM toks)
         |SELECT bigram, COUNT(*) AS n FROM bg
         |GROUP BY bigram HAVING COUNT(*) >= 5
         |ORDER BY bigram""".stripMargin,

    "q35_contamination" ->
      """SELECT doc_id, needle
        |FROM documents
        |CROSS JOIN (SELECT unnest(['key agg', 'batch window', 'spark', 'customer query']) AS needle) n
        |WHERE contains(lower(text), needle)
        |ORDER BY doc_id, needle""".stripMargin,

    "q47_repetition" ->
      s"""SELECT doc_id,
         |  CASE WHEN len($toksLower) = 0 THEN 0.0
         |       ELSE ROUND(1.0 - len(list_distinct($toksLower)) * 1.0 / len($toksLower), 6)
         |  END AS rep_ratio
         |FROM documents ORDER BY doc_id""".stripMargin,

    "q48_domain_stats" ->
      """WITH raw AS (
        |  SELECT doc_id,
        |    text || ' see https://site' || (doc_id % 20) || '.example.com/p/' || doc_id
        |         || ' and http://mirror' || (doc_id % 7) || '.example.org/x' AS raw
        |  FROM documents),
        |d AS (
        |  SELECT doc_id,
        |    unnest(list_distinct(regexp_extract_all(lower(raw), 'https?://([a-z0-9.-]+)', 1))) AS domain
        |  FROM raw)
        |SELECT domain, COUNT(*) AS n_docs FROM d GROUP BY domain ORDER BY domain""".stripMargin,

    "q49_ngram_contamination" ->
      s"""WITH toks AS (
         |  SELECT doc_id, list_filter(string_split_regex($normText, ' '), x -> x <> '') AS tk
         |  FROM documents),
         |bg AS (
         |  SELECT doc_id,
         |    list_distinct(CASE WHEN len(tk) < 2 THEN [array_to_string(tk, ' ')]
         |      ELSE list_transform(range(1, len(tk)), i -> tk[i] || ' ' || tk[i+1]) END) AS bg
         |  FROM toks)
         |SELECT doc_id,
         |  CASE WHEN len(bg) = 0 THEN 0.0
         |       ELSE ROUND(len(list_intersect(bg,
         |         ['key agg', 'batch window', 'customer query', 'slow scan', 'fast merge'])) * 1.0
         |         / len(bg), 6) END AS overlap
         |FROM bg ORDER BY doc_id""".stripMargin,

    // ngramOverlapLarge: the needle set is a table (distinct bigrams of
    // the doc_id%50==0 subset), joined — the plain-SQL shape of the
    // broadcast-probe plan.
    "q54_ngram_overlap_large" ->
      s"""WITH toks AS (
         |  SELECT doc_id, list_filter(string_split_regex($normText, ' '), x -> x <> '') AS tk
         |  FROM documents),
         |bg AS (
         |  SELECT doc_id,
         |    list_distinct(CASE WHEN len(tk) < 2 THEN [array_to_string(tk, ' ')]
         |      ELSE list_transform(range(1, len(tk)), i -> tk[i] || ' ' || tk[i+1]) END) AS bg
         |  FROM toks),
         |needles AS (
         |  SELECT DISTINCT unnest(bg) AS shingle FROM bg WHERE doc_id % 50 = 0),
         |ex AS (SELECT doc_id, len(bg) AS n_sh, unnest(bg) AS shingle FROM bg),
         |hits AS (
         |  SELECT e.doc_id, any_value(e.n_sh) AS n_sh, COUNT(n.shingle) AS n_hit
         |  FROM ex e LEFT JOIN needles n ON e.shingle = n.shingle
         |  GROUP BY e.doc_id)
         |SELECT doc_id,
         |  CASE WHEN n_sh = 0 THEN 0.0
         |       ELSE ROUND(n_hit * 1.0 / n_sh, 6) END AS overlap
         |FROM hits ORDER BY doc_id""".stripMargin,

    "q50_weighted_mixture" ->
      s"""SELECT doc_id, source FROM (
         |  SELECT doc_id, source,
         |    ${md5Hash64Sql("CAST(doc_id AS VARCHAR)")} % 10000 AS bucket,
         |    CASE source WHEN 'src0' THEN 0.0 WHEN 'src1' THEN 0.25
         |                WHEN 'src2' THEN 0.5 ELSE 0.75 END AS w
         |  FROM documents) x
         |WHERE CAST(bucket AS DOUBLE) < w * 10000.0
         |ORDER BY doc_id""".stripMargin,

    "q112_lsh_grid" -> lshGridOracleSql,

    // The pick re-ranks the same measured grid: recall gate, then min
    // candidate volume (ties: bands, rows_per_band).
    "q118_lsh_pick" ->
      s"""SELECT * FROM (
         |$lshGridOracleSql
         |) g WHERE recall >= 0.9
         |ORDER BY n_candidates, bands, rows_per_band LIMIT 1""".stripMargin,

    "q110_decontaminate" ->
      s"""$shinglesSql,
         |hs AS (SELECT doc_id, ${md5Hash64Sql("shingle")} AS h FROM ex),
         |slot AS (
         |  SELECT doc_id, j, MIN(xor(h, salt)) AS m
         |  FROM hs CROSS JOIN (VALUES ${xorSaltsSql(64, 42L)}) s(j, salt)
         |  GROUP BY doc_id, j),
         |sig AS (SELECT doc_id, list(m ORDER BY j) AS sig FROM slot GROUP BY doc_id),
         |banded AS (
         |  SELECT doc_id, b, md5(array_to_string(sig[b*4+1 : b*4+4], ',')) AS bucket, sig
         |  FROM sig CROSS JOIN (SELECT unnest(range(16)) AS b) bb
         |  QUALIFY COUNT(*) OVER (PARTITION BY b, bucket) <= 1000),
         |pairs AS (
         |  SELECT a.doc_id AS id_l, b.doc_id AS id_r,
         |         any_value(a.sig) AS sig_l, any_value(b.sig) AS sig_r
         |  FROM banded a JOIN banded b
         |    ON a.b = b.b AND a.bucket = b.bucket
         |  WHERE a.doc_id % 10 <> 0 AND b.doc_id % 10 = 0
         |  GROUP BY a.doc_id, b.doc_id),
         |leaks AS (
         |  SELECT DISTINCT id_l FROM pairs
         |  WHERE len(list_filter(range(1,65), i -> sig_l[i] = sig_r[i])) / 64.0 >= 0.35)
         |SELECT d.doc_id, d.source FROM documents d
         |WHERE d.doc_id % 10 <> 0 AND d.doc_id NOT IN (SELECT id_l FROM leaks)
         |ORDER BY d.doc_id""".stripMargin,

    // chr(769/778/770) are the combining acute/ring/circumflex — the
    // same decomposed marker the Spark side appends as \\u escapes.
    "q111_nfc_normalize" ->
      """WITH n AS (
        |  SELECT doc_id,
        |    nfc_normalize(text || ' e' || chr(769) || 'a' || chr(778) || 'o' || chr(770)) AS t
        |  FROM documents)
        |SELECT doc_id, CAST(length(t) AS BIGINT) AS n_nfc, md5(t) AS h_nfc
        |FROM n ORDER BY doc_id""".stripMargin,

    "q106_upsample_mixture" ->
      s"""SELECT * FROM (
         |  SELECT doc_id, source, unnest(range(n)) AS copy FROM (
         |    SELECT doc_id, source,
         |      CAST(FLOOR(w) AS BIGINT) +
         |      CASE WHEN CAST(h AS DOUBLE) < (w - FLOOR(w)) * 10000.0
         |           THEN 1 ELSE 0 END AS n
         |    FROM (
         |      SELECT doc_id, source,
         |        CASE source WHEN 'src0' THEN 0.0 WHEN 'src1' THEN 0.5
         |                    WHEN 'src2' THEN 2.5 WHEN 'src3' THEN 3.0
         |                    ELSE 1.0 END AS w,
         |        ${md5Hash64Sql("CAST(doc_id AS VARCHAR)")} % 10000 AS h
         |      FROM documents) x) y
         |  WHERE n > 0) z
         |ORDER BY doc_id, copy""".stripMargin,

    "q107_token_budget" ->
      s"""SELECT source, doc_id, n_tokens FROM (
         |  SELECT source, doc_id, n_tokens,
         |    COALESCE(SUM(n_tokens) OVER (PARTITION BY source ORDER BY h, doc_id
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cum,
         |    CASE source WHEN 'src0' THEN 500 WHEN 'src1' THEN 0
         |         ELSE 1500 END AS budget
         |  FROM (
         |    SELECT doc_id, source,
         |      CAST(len(list_filter(string_split_regex(trim(text), '\\s+'), x -> x <> '')) AS BIGINT) AS n_tokens,
         |      ${md5Hash64Sql("CAST(doc_id AS VARCHAR)")} % 1000000 AS h
         |    FROM documents) x) y
         |WHERE cum < budget
         |ORDER BY doc_id""".stripMargin,

    // (n_chars DESC, doc_id ASC) is a total order per source, so the
    // bounded-heap pick equals this window exactly.
    "q108_top_per_key" ->
      """SELECT source, doc_id, CAST(n_chars AS DOUBLE) AS n_chars, rank FROM (
        |  SELECT source, doc_id, n_chars,
        |    CAST(row_number() OVER (PARTITION BY source
        |      ORDER BY n_chars DESC, doc_id ASC) AS BIGINT) AS rank
        |  FROM documents) x
        |WHERE rank <= 5 ORDER BY source, rank""".stripMargin,

    "q109_curriculum" ->
      """WITH b AS (
        |  SELECT quantile_cont(CAST(n_chars AS DOUBLE), [0.25, 0.5, 0.75]) AS bs
        |  FROM documents)
        |SELECT doc_id, n_chars,
        |  CAST(CASE WHEN n_chars >= bs[1] THEN 1 ELSE 0 END
        |     + CASE WHEN n_chars >= bs[2] THEN 1 ELSE 0 END
        |     + CASE WHEN n_chars >= bs[3] THEN 1 ELSE 0 END AS INT) AS stage
        |FROM documents CROSS JOIN b
        |ORDER BY doc_id""".stripMargin,

    "q37_stratified_sample" ->
      """SELECT doc_id, source FROM (
        |  SELECT doc_id, source,
        |    row_number() OVER (PARTITION BY source ORDER BY doc_id) AS rn
        |  FROM documents) x
        |WHERE rn <= 5
        |ORDER BY source, doc_id""".stripMargin,

    "q38_salted_agg" ->
      """SELECT event_type, COUNT(*) AS n,
        |  CAST(SUM(CAST(value AS DECIMAL(28,4))) AS DOUBLE) AS sum_value
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin,

    "q39_quantiles" ->
      """SELECT quantile_cont(CAST(n_chars AS DOUBLE), [0.25, 0.5, 0.75, 0.95]) AS quantiles
        |FROM documents""".stripMargin,

    "q40_dataset_split" ->
      """SELECT doc_id, source,
        |  CASE WHEN doc_id % 100 < 80 THEN 'train'
        |       WHEN doc_id % 100 < 90 THEN 'val'
        |       ELSE 'test' END AS split
        |FROM documents ORDER BY doc_id""".stripMargin,

    // Replays the full DSIR chain: normalized unigram+bigram grams,
    // md5 bucket hash, add-one-smoothed target/corpus multinomials,
    // per-bucket log-ratio rounded to micro-nats (the rounding is
    // what makes the per-doc BIGINT sum engine-exact), per-doc sum.
    "q63_dsir_scores" ->
      s"""WITH tk AS (
         |  SELECT doc_id,
         |    list_filter(string_split_regex($normText, ' '), x -> x <> '') AS tk
         |  FROM documents),
         |gr AS (
         |  SELECT doc_id, list_filter(list_concat(
         |      tk,
         |      CASE WHEN len(tk) < 2 THEN [array_to_string(tk, ' ')]
         |           ELSE list_transform(range(1, len(tk)), i -> tk[i] || ' ' || tk[i+1]) END),
         |    x -> x IS NOT NULL AND x <> '') AS gr
         |  FROM tk),
         |ex AS (SELECT doc_id, unnest(gr) AS g FROM gr),
         |bx AS (SELECT doc_id, (${md5Hash64Sql("g")}) % 4096 AS b FROM ex),
         |cq AS (SELECT b, COUNT(*) AS c FROM bx GROUP BY b),
         |cp AS (SELECT b, COUNT(*) AS c FROM bx WHERE doc_id % 10 = 0 GROUP BY b),
         |tot AS (SELECT (SELECT COUNT(*) FROM bx WHERE doc_id % 10 = 0) AS np,
         |               (SELECT COUNT(*) FROM bx) AS nq),
         |lam AS (
         |  SELECT q.b,
         |    CAST(round(1e6 * ln(((COALESCE(p.c, 0) + 1.0) * (t.nq + 4096.0)) /
         |                        ((q.c + 1.0) * (t.np + 4096.0)))) AS BIGINT) AS lam
         |  FROM cq q LEFT JOIN cp p ON q.b = p.b CROSS JOIN tot t),
         |sc AS (
         |  SELECT bx.doc_id, CAST(SUM(l.lam) AS BIGINT) AS score
         |  FROM bx JOIN lam l ON bx.b = l.b GROUP BY bx.doc_id)
         |SELECT g2.doc_id, CAST(len(g2.gr) AS BIGINT) AS n_grams,
         |  COALESCE(sc.score, 0) AS score_micro
         |FROM gr g2 LEFT JOIN sc ON g2.doc_id = sc.doc_id
         |ORDER BY g2.doc_id""".stripMargin,

    // q62's single-window ground truth exploded per straddled chunk;
    // slice bounds are GREATEST/LEAST integer clamps (no NULLs in
    // play, so Spark's null-skipping least() is equivalent).
    "q67_pack_slices" ->
      s"""WITH t AS (
         |  SELECT doc_id AS id,
         |    CAST(len(list_filter(string_split_regex(trim(text), '\\s+'), x -> x <> '')) AS BIGINT) AS n_tokens
         |  FROM documents),
         |c AS (
         |  SELECT id, n_tokens,
         |    CAST(COALESCE(SUM(n_tokens) OVER (ORDER BY id
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS "offset"
         |  FROM t),
         |s AS (
         |  SELECT id, n_tokens, "offset",
         |    unnest(range("offset" // 512, ("offset" + n_tokens - 1) // 512 + 1)) AS chunk_id
         |  FROM c WHERE n_tokens > 0)
         |SELECT chunk_id, id,
         |  GREATEST("offset", chunk_id * 512) - "offset" AS doc_from,
         |  LEAST("offset" + n_tokens, (chunk_id + 1) * 512)
         |    - GREATEST("offset", chunk_id * 512) AS slice_len
         |FROM s ORDER BY chunk_id, id""".stripMargin,

    // q17's sketch/banding chain at tau 0.35 feeding q66's recursive
    // transitive closure; survivors = docs that are their component's
    // min (or never paired).
    "q71_dedup_corpus" ->
      s"""${shinglesSql.replaceFirst("WITH ", "WITH RECURSIVE ")},
         |hs AS (SELECT doc_id, ${md5Hash64Sql("shingle")} AS h FROM ex),
         |slot AS (
         |  SELECT doc_id, j, MIN(xor(h, salt)) AS m
         |  FROM hs CROSS JOIN (VALUES ${xorSaltsSql(64, 42L)}) s(j, salt)
         |  GROUP BY doc_id, j),
         |sig AS (SELECT doc_id, list(m ORDER BY j) AS sig FROM slot GROUP BY doc_id),
         |banded AS (
         |  SELECT doc_id, b, md5(array_to_string(sig[b*4+1 : b*4+4], ',')) AS bucket, sig
         |  FROM sig CROSS JOIN (SELECT unnest(range(16)) AS b) bb
         |  QUALIFY COUNT(*) OVER (PARTITION BY b, bucket) <= 1000),
         |prs AS (
         |  SELECT a.doc_id AS id_a, b.doc_id AS id_b,
         |         any_value(a.sig) AS sig_a, any_value(b.sig) AS sig_b
         |  FROM banded a JOIN banded b
         |    ON a.b = b.b AND a.bucket = b.bucket AND a.doc_id < b.doc_id
         |  GROUP BY a.doc_id, b.doc_id),
         |p2 AS (
         |  SELECT id_a, id_b FROM prs
         |  WHERE len(list_filter(range(1,65), i -> sig_a[i] = sig_b[i])) / 64.0 >= 0.35),
         |eg AS (SELECT id_a AS u, id_b AS v FROM p2
         |       UNION SELECT id_b, id_a FROM p2),
         |r(u, v) AS (
         |  SELECT u, v FROM eg
         |  UNION
         |  SELECT r.u, eg.v FROM r JOIN eg ON r.v = eg.u),
         |m2 AS (SELECT u AS id, LEAST(u, MIN(v)) AS rep FROM r GROUP BY u)
         |SELECT d.doc_id, d.source
         |FROM documents d LEFT JOIN m2 ON d.doc_id = m2.id
         |WHERE m2.rep IS NULL OR m2.rep = d.doc_id
         |ORDER BY d.doc_id""".stripMargin,

    // (o_orderdate, o_orderkey) is unique per customer row, so the
    // lexicographic struct max equals this QUALIFY pick exactly.
    "q77_keep_latest" ->
      """SELECT o_custkey, o_orderkey, o_totalprice FROM orders
        |QUALIFY row_number() OVER (PARTITION BY o_custkey
        |  ORDER BY o_orderdate DESC, o_orderkey DESC) = 1
        |ORDER BY o_custkey""".stripMargin,

    "q78_sample_exact" ->
      s"""SELECT doc_id, source FROM (
         |  SELECT doc_id, source,
         |    ${md5Hash64Sql("CAST(doc_id AS VARCHAR)")} AS h
         |  FROM documents ORDER BY h LIMIT 100) x
         |ORDER BY doc_id""".stripMargin,

    // q45's bucketing replay with the pair join split even×odd and no
    // ordering constraint (ids come from different corpora).
    "q96_embedding_across" ->
      s"""WITH planes(t, i, plane) AS (VALUES
         |      ${hyperplanesSql(planes = 8, dim = 64, seed = 7L, tables = 2)}),
         |bucketed AS (
         |  SELECT e.vec_id, p.t,
         |    SUM(CASE WHEN ${seqDotSql("e.embedding", "p.plane", 64)} >= 0
         |        THEN CAST(power(2, p.i) AS BIGINT) ELSE 0 END) AS bucket
         |  FROM embeddings e CROSS JOIN planes p
         |  GROUP BY e.vec_id, p.t),
         |cand AS (
         |  SELECT DISTINCT a.vec_id AS id_l, b.vec_id AS id_r
         |  FROM bucketed a
         |  JOIN bucketed b ON a.t = b.t AND a.bucket = b.bucket
         |  WHERE a.vec_id % 2 = 0 AND b.vec_id % 2 = 1)
         |SELECT c.id_l, c.id_r,
         |  ROUND(${cosSql("ea.embedding", "eb.embedding")}, 6) AS cosine
         |FROM cand c
         |JOIN embeddings ea ON ea.vec_id = c.id_l
         |JOIN embeddings eb ON eb.vec_id = c.id_r
         |WHERE ${cosSql("ea.embedding", "eb.embedding")} >= 0.45
         |ORDER BY id_l, id_r""".stripMargin,

    "q95_random_projection" -> {
      val rows = graft.functions.Vectors.projectionMatrix(64, 8, 7L)
      val vals = rows.zipWithIndex.map { case (r, j) =>
        s"($j, [${r.map(_.toString).mkString(", ")}])"
      }.mkString(",\n      ")
      val scale = (1.0 / math.sqrt(8.0)).toString
      s"""WITH proj(j, g) AS (VALUES
         |      $vals)
         |SELECT vec_id,
         |  array_to_string(
         |    list(CAST(ROUND(ROUND(dp * $scale, 6) * 1000000) AS BIGINT)
         |         ORDER BY j), ',') AS proj_micro FROM (
         |  SELECT e.vec_id, p.j,
         |    ${seqDotSql("e.embedding", "p.g", 64)} AS dp
         |  FROM embeddings e CROSS JOIN proj p
         |  WHERE e.vec_id % 5 = 0) x
         |GROUP BY vec_id ORDER BY vec_id""".stripMargin
    },

    "q94_pagerank" -> {
      def round(i: Int): String =
        s"""c$i AS (SELECT e2.dst, SUM(r.rank_micro // o.n) AS s
           |       FROM e2 JOIN r${i - 1} r ON r.node = e2.src
           |       JOIN outdeg o ON o.src = e2.src GROUP BY e2.dst),
           |r$i AS (SELECT nodes.node,
           |         CAST(150000 + (COALESCE(c$i.s, 0) * 85) // 100 AS BIGINT) AS rank_micro
           |       FROM nodes LEFT JOIN c$i ON c$i.dst = nodes.node)""".stripMargin
      s"""WITH e AS (
         |  SELECT doc_id AS src, doc_id % 97 AS dst FROM documents
         |  UNION ALL SELECT doc_id, doc_id % 31 FROM documents),
         |e2 AS (SELECT src, dst FROM e WHERE src <> dst),
         |nodes AS (SELECT src AS node FROM e2 UNION SELECT dst FROM e2),
         |outdeg AS (SELECT src, COUNT(*) AS n FROM e2 GROUP BY src),
         |r0 AS (SELECT node, CAST(1000000 AS BIGINT) AS rank_micro FROM nodes),
         |${round(1)},
         |${round(2)},
         |${round(3)}
         |SELECT node, rank_micro FROM r3 ORDER BY node""".stripMargin
    },

    "q99_pagerank_dangling" -> {
      def round(i: Int): String =
        s"""d$i AS (SELECT COALESCE(SUM(rank_micro), 0) AS ds FROM r${i - 1}
           |       WHERE node NOT IN (SELECT src FROM outdeg)),
           |c$i AS (SELECT e2.dst, SUM(r.rank_micro // o.n) AS s
           |       FROM e2 JOIN r${i - 1} r ON r.node = e2.src
           |       JOIN outdeg o ON o.src = e2.src GROUP BY e2.dst),
           |r$i AS (SELECT nodes.node,
           |         CAST(150000 +
           |              ((COALESCE(c$i.s, 0) + d$i.ds // nn.n) * 85) // 100
           |           AS BIGINT) AS rank_micro
           |       FROM nodes LEFT JOIN c$i ON c$i.dst = nodes.node
           |       CROSS JOIN d$i CROSS JOIN nn)""".stripMargin
      s"""WITH e AS (
         |  SELECT doc_id AS src, doc_id % 97 AS dst FROM documents
         |  UNION ALL SELECT doc_id, doc_id % 31 FROM documents),
         |e2 AS (SELECT src, dst FROM e WHERE src <> dst),
         |nodes AS (SELECT src AS node FROM e2 UNION SELECT dst FROM e2),
         |nn AS (SELECT COUNT(*) AS n FROM nodes),
         |outdeg AS (SELECT src, COUNT(*) AS n FROM e2 GROUP BY src),
         |r0 AS (SELECT node, CAST(1000000 AS BIGINT) AS rank_micro FROM nodes),
         |${round(1)},
         |${round(2)},
         |${round(3)}
         |SELECT node, rank_micro FROM r3 ORDER BY node""".stripMargin
    },

    // Per-doc ordered id sequence rebuilt from the unrolled vocab: each
    // word's subword list (final-round symstr split) hashed per token,
    // flattened in word order; empty docs keep an empty INT[].
    "q102_bpe_hashed_ids" ->
      s"""${bpeRoundsCte(8)},
         |vt AS (SELECT word,
         |         string_split(substr(symstr, 2, len(symstr) - 2),
         |                      chr(30)||chr(31)) AS toks
         |       FROM w8),
         |docw AS (
         |  SELECT doc_id, u.i AS wi, u.w AS word FROM (
         |    SELECT doc_id, unnest(list_transform(range(1, len(ws)+1),
         |             i -> struct_pack(i := i, w := ws[i]))) AS u
         |    FROM (SELECT doc_id, $toksLower AS ws FROM documents
         |          WHERE doc_id % 9 = 4) z) x),
         |wid AS (
         |  SELECT dw.doc_id, dw.wi,
         |         list_transform(vt.toks,
         |           t -> CAST(${md5Hash64Sql("t")} % 4096 AS INT)) AS ids
         |  FROM docw dw JOIN vt ON vt.word = dw.word),
         |agg AS (
         |  SELECT doc_id, flatten(list(ids ORDER BY wi)) AS token_ids
         |  FROM wid GROUP BY doc_id)
         |SELECT d.doc_id,
         |  array_to_string(COALESCE(agg.token_ids, CAST([] AS INT[])), ',')
         |    AS token_ids
         |FROM (SELECT doc_id FROM documents WHERE doc_id % 9 = 4) d
         |LEFT JOIN agg USING (doc_id)
         |ORDER BY d.doc_id""".stripMargin,

    // Rebuilds the contiguous-id vocab from the unrolled trainer:
    // distinct corpus characters in lexical order first, then the 8
    // merge outputs in rank order (a repeated surface form keeps its
    // min step — first occurrence wins, as in the Scala builder).
    "q115_bpe_vocab" ->
      s"""${bpeRoundsCte(8)},
         |$bpeVocabCtes
         |SELECT token, id
         |FROM (SELECT * FROM base UNION ALL SELECT * FROM mids) v
         |ORDER BY id""".stripMargin,

    // q102's ordered per-doc reconstruction, but ids resolved through
    // the rebuilt vocab TABLE instead of the hashing trick.
    "q116_bpe_vocab_ids" ->
      s"""${bpeRoundsCte(8)},
         |$bpeVocabCtes,
         |voc AS (SELECT * FROM base UNION ALL SELECT * FROM mids),
         |vt AS (SELECT word,
         |         string_split(substr(symstr, 2, len(symstr) - 2),
         |                      chr(30)||chr(31)) AS toks
         |       FROM w8),
         |vt2 AS (
         |  SELECT word, u.j AS j, u.t AS tok FROM (
         |    SELECT word, unnest(list_transform(range(1, len(toks)+1),
         |             i -> struct_pack(j := i, t := toks[i]))) AS u
         |    FROM vt) x),
         |docw AS (
         |  SELECT doc_id, u.i AS wi, u.w AS word FROM (
         |    SELECT doc_id, unnest(list_transform(range(1, len(ws)+1),
         |             i -> struct_pack(i := i, w := ws[i]))) AS u
         |    FROM (SELECT doc_id, $toksLower AS ws FROM documents
         |          WHERE doc_id % 9 = 5) z) x),
         |wid AS (
         |  SELECT dw.doc_id, dw.wi, v2.j, v.id AS tid
         |  FROM docw dw JOIN vt2 v2 ON v2.word = dw.word
         |  JOIN voc v ON v.token = v2.tok),
         |agg1 AS (SELECT doc_id, wi, list(tid ORDER BY j) AS ids
         |         FROM wid GROUP BY doc_id, wi),
         |agg AS (SELECT doc_id, flatten(list(ids ORDER BY wi)) AS token_ids
         |        FROM agg1 GROUP BY doc_id)
         |SELECT d.doc_id,
         |  array_to_string(COALESCE(agg.token_ids, CAST([] AS BIGINT[])), ',')
         |    AS token_ids
         |FROM (SELECT doc_id FROM documents WHERE doc_id % 9 = 5) d
         |LEFT JOIN agg USING (doc_id)
         |ORDER BY d.doc_id""".stripMargin,

    // Ground truth is the per-source single quality-ordered window —
    // the Spark side must reproduce it from the score-range-bucketed
    // two-phase form value-for-value.
    "q117_token_budget_best" ->
      s"""WITH f AS (
         |  SELECT doc_id, source,
         |    CAST(len(list_filter(string_split_regex(trim(text), '\\s+'), x -> x <> '')) AS BIGINT) AS n_tokens,
         |    ROUND(least(len(list_filter(string_split_regex(trim(text), '\\s+'), x -> x <> '')) / 50.0, 1.0) * 0.4
         |      + greatest(0.0, 1.0 - (CASE WHEN length(text) = 0 THEN 0.0
         |          ELSE (length(text) - length(regexp_replace(text, '[[:punct:]]', '', 'g'))) * 1.0 / length(text) END) * 4.0) * 0.3
         |      + least((CASE WHEN len($toksLower) = 0 THEN 0.0
         |          ELSE len(list_filter($toksLower,
         |                 x -> list_contains(['the','a','an','and','or','of','to','in','is','it','that','for','on','with','as','was','at','by'], x))) * 1.0
         |               / len($toksLower) END) * 3.0, 1.0) * 0.3, 6) AS score
         |  FROM documents),
         |c AS (
         |  SELECT doc_id, source, n_tokens, score,
         |    COALESCE(SUM(n_tokens) OVER (PARTITION BY source
         |      ORDER BY score DESC, doc_id
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cum,
         |    CASE source WHEN 'src0' THEN 500 WHEN 'src1' THEN 0
         |         ELSE 700 END AS budget
         |  FROM f)
         |SELECT doc_id, source, n_tokens, score FROM c
         |WHERE cum < budget
         |ORDER BY doc_id""".stripMargin,

    // Containment filters on the UNROUNDED ratio (as the Spark where
    // does) and emits the rounded value.
    "q119_containment" ->
      s"""$shinglesSql,
         |capped AS (
         |  SELECT * FROM ex QUALIFY COUNT(*) OVER (PARTITION BY shingle) <= 1000),
         |p AS (
         |  SELECT a.doc_id AS id_a, b.doc_id AS id_b,
         |         COUNT(*) * 1.0 / a.n_sh AS c_raw
         |  FROM capped a JOIN capped b
         |    ON a.shingle = b.shingle AND a.doc_id <> b.doc_id
         |  GROUP BY a.doc_id, b.doc_id, a.n_sh)
         |SELECT id_a, id_b, ROUND(c_raw, 6) AS containment
         |FROM p WHERE c_raw >= 0.5
         |ORDER BY id_a, id_b""".stripMargin,

    // Line predicates replayed verbatim; array_to_string([]) is NULL
    // in DuckDB where Spark's array_join is '' — COALESCE (q86/q59).
    "q120_c4_clean" ->
      """WITH l AS (
        |  SELECT doc_id, COALESCE(text, '') AS text,
        |         string_split(COALESCE(text, ''), chr(10)) AS lines
        |  FROM documents),
        |k AS (
        |  SELECT doc_id, text, lines,
        |    list_transform(
        |      list_filter(lines, x ->
        |        right(trim(x), 1) IN ('.', '!', '?', '"')
        |        AND len(list_filter(string_split_regex(trim(x), '\s+'),
        |                            w -> w <> '')) >= 3
        |        AND NOT contains(lower(trim(x)), 'javascript')),
        |      x -> trim(x)) AS kept
        |  FROM l)
        |SELECT doc_id,
        |  COALESCE(array_to_string(kept, chr(10)), '') AS clean_text,
        |  CAST(len(lines) AS INT) AS n_lines,
        |  CAST(len(kept) AS INT) AS n_kept,
        |  (len(kept) >= 5 AND NOT contains(lower(text), 'lorem ipsum')
        |    AND NOT contains(text, '{')) AS keep_doc
        |FROM k ORDER BY doc_id""".stripMargin,

    // The identical RE2-safe chain: block-drop, tag-drop, the five
    // entities (amp LAST), whitespace collapse.
    "q121_strip_html" ->
      """SELECT doc_id,
        |  CAST(length(clean) AS BIGINT) AS n_clean,
        |  md5(clean) AS h_clean
        |FROM (
        |  SELECT doc_id,
        |    trim(regexp_replace(
        |      replace(replace(replace(replace(replace(replace(
        |        regexp_replace(
        |          regexp_replace(
        |            '<html><head><style>body{color:red}</style></head><body><p class="t">'
        |              || text ||
        |              '</p><script>var x = 1 &amp;&amp; 2;</script> &lt;done&gt;</body></html>',
        |            '(?is)<(script|style)[^>]*>.*?</(script|style)>', ' ', 'g'),
        |          '(?s)<[^>]*>', ' ', 'g'),
        |        '&lt;', '<'), '&gt;', '>'), '&quot;', '"'),
        |        '&#39;', chr(39)), '&nbsp;', ' '), '&amp;', '&'),
        |      '\s+', ' ', 'g')) AS clean
        |  FROM documents) x
        |ORDER BY doc_id""".stripMargin,

    // String-cast keys so ordering ties and output types align.
    "q134_key_skew" ->
      """WITH c AS (
        |  SELECT CAST(l_suppkey AS VARCHAR) AS key, COUNT(*) AS n_rows
        |  FROM lineitem GROUP BY 1),
        |t AS (SELECT CAST(SUM(n_rows) AS BIGINT) AS total FROM c),
        |r AS (
        |  SELECT key, CAST(n_rows AS BIGINT) AS n_rows,
        |    row_number() OVER (ORDER BY n_rows DESC, key ASC) AS rank
        |  FROM c)
        |SELECT key, n_rows,
        |  CAST((n_rows * 1000000) // total AS BIGINT) AS share_micro,
        |  CAST(rank AS BIGINT) AS rank
        |FROM r, t WHERE rank <= 10
        |ORDER BY rank""".stripMargin,

    // Per-label ordered-fold centroids (the q46 cm-CTE replay) +
    // pairwise list_cosine_similarity over the label frame.
    "q137_label_contrast" ->
      """WITH cm AS (
        |  SELECT label AS grp, d,
        |    list_reduce(list(CAST(embedding[d] AS DOUBLE) ORDER BY vec_id), (a, b) -> a + b)
        |      / COUNT(*) AS mu,
        |    COUNT(*) AS n
        |  FROM embeddings CROSS JOIN (SELECT unnest(range(1, 65)) AS d) dd
        |  GROUP BY label, d),
        |cents AS (
        |  SELECT grp, CAST(MIN(n) AS BIGINT) AS n, list(mu ORDER BY d) AS cvec
        |  FROM cm GROUP BY grp)
        |SELECT a.grp AS grp_a, b.grp AS grp_b, a.n AS n_a, b.n AS n_b,
        |  ROUND(list_cosine_similarity(a.cvec, b.cvec), 6) AS cos
        |FROM cents a JOIN cents b ON a.grp < b.grp
        |ORDER BY grp_a, grp_b""".stripMargin,

    // Replays the Bloom bit math position-for-position: h1/odd-stride
    // double hashing from the shared 60-bit md5 hash, membership =
    // all 5 probe positions present in the needle position set.
    "q138_bloom_decontam" ->
      s"""WITH toks AS (
         |  SELECT doc_id, $toksLower AS tk FROM documents),
         |bg AS (
         |  SELECT doc_id,
         |    list_distinct(CASE WHEN len(tk) < 2 THEN [array_to_string(tk, ' ')]
         |      ELSE list_transform(range(1, len(tk)), i -> tk[i] || ' ' || tk[i+1]) END) AS bg
         |  FROM toks),
         |needles AS (
         |  SELECT DISTINCT unnest(bg) AS shingle FROM bg WHERE doc_id % 10 = 0),
         |nh AS (SELECT ${md5Hash64Sql("shingle")} AS h FROM needles),
         |npos AS (
         |  SELECT DISTINCT ((h % 1073741824) +
         |    i * ((h // 1073741824) - (h // 1073741824) % 2 + 1)) % 4096 AS p
         |  FROM nh CROSS JOIN (SELECT unnest(range(0, 5)) AS i) ii),
         |ex AS (SELECT doc_id, len(bg) AS n_sh, unnest(bg) AS shingle
         |       FROM bg WHERE doc_id % 10 <> 0),
         |ph AS (SELECT doc_id, shingle, ${md5Hash64Sql("shingle")} AS h FROM ex),
         |pp AS (
         |  SELECT doc_id, shingle,
         |    ((h % 1073741824) +
         |     i * ((h // 1073741824) - (h // 1073741824) % 2 + 1)) % 4096 AS p
         |  FROM ph CROSS JOIN (SELECT unnest(range(0, 5)) AS i) ii),
         |shing AS (
         |  SELECT doc_id, shingle, COUNT(np.p) AS nset
         |  FROM pp LEFT JOIN npos np ON pp.p = np.p
         |  GROUP BY doc_id, shingle),
         |bh AS (SELECT doc_id, CAST(COUNT(*) FILTER (WHERE nset = 5) AS BIGINT) AS n_bloom
         |       FROM shing GROUP BY doc_id),
         |exact AS (
         |  SELECT e.doc_id, CAST(COUNT(n.shingle) AS BIGINT) AS n_exact
         |  FROM ex e LEFT JOIN needles n ON e.shingle = n.shingle
         |  GROUP BY e.doc_id),
         |base AS (SELECT doc_id, CAST(any_value(n_sh) AS BIGINT) AS n_sh
         |         FROM ex GROUP BY doc_id)
         |SELECT b.doc_id, b.n_sh, COALESCE(bh.n_bloom, 0) AS n_bloom, exact.n_exact
         |FROM base b JOIN exact USING (doc_id) LEFT JOIN bh USING (doc_id)
         |ORDER BY doc_id""".stripMargin,

    // tf and df are integer counts; idf replays with the same
    // fixed-order ln then micro-rounds, so score_micro = tf · idf_micro
    // is pure integer arithmetic in both engines.
    "q139_tfidf_keywords" ->
      s"""WITH toks AS (
         |  SELECT doc_id, $toksLower AS tk FROM documents),
         |n AS (SELECT COUNT(DISTINCT doc_id) AS n FROM documents),
         |tfg AS (
         |  SELECT doc_id, term, COUNT(*) AS tf
         |  FROM (SELECT doc_id, unnest(tk) AS term FROM toks) t
         |  GROUP BY doc_id, term),
         |dfg AS (SELECT term, COUNT(*) AS df FROM tfg GROUP BY term),
         |sc AS (
         |  SELECT doc_id, term, tf, df,
         |    tf * (CAST(round(1e6 * ln((n.n + 1.0) / (df + 1.0))) AS BIGINT)
         |          + 1000000) AS score_micro
         |  FROM tfg JOIN dfg USING (term) CROSS JOIN n)
         |SELECT doc_id, rank, term, CAST(tf AS BIGINT) AS tf,
         |       CAST(df AS BIGINT) AS df, score_micro
         |FROM (
         |  SELECT doc_id, term, tf, df, score_micro,
         |    row_number() OVER (PARTITION BY doc_id
         |                       ORDER BY score_micro DESC, term ASC) AS rank
         |  FROM sc QUALIFY rank <= 3) q
         |ORDER BY doc_id, rank""".stripMargin,

    // The q64 BM25 replay (identical operation order) cut to the
    // top-20 by (score desc, doc asc) — what the index-mediated
    // search must reproduce through its persisted postings.
    "q140_inverted_index" ->
      s"""WITH tk AS (
         |  SELECT doc_id,
         |    list_filter(string_split_regex($normText, ' '), x -> x <> '') AS tk
         |  FROM documents),
         |st AS (SELECT doc_id, CAST(len(tk) AS BIGINT) AS dl FROM tk),
         |tot AS (SELECT COUNT(*) AS n, CAST(SUM(dl) AS DOUBLE) / COUNT(*) AS avgdl
         |        FROM st),
         |ex AS (SELECT doc_id, unnest(tk) AS term FROM tk),
         |tf AS (
         |  SELECT doc_id, term, COUNT(*) AS tf FROM ex
         |  WHERE term IN ('spark', 'join', 'vector', 'stream')
         |  GROUP BY doc_id, term),
         |dfreq AS (SELECT term, COUNT(*) AS df FROM tf GROUP BY term),
         |sc AS (
         |  SELECT tf.doc_id,
         |    CAST(round(1e6 * (ln(1.0 + (t.n - d.df + 0.5) / (d.df + 0.5)) *
         |      ((tf.tf * (1.2 + 1.0)) /
         |       (tf.tf + 1.2 * ((1.0 - 0.75) + 0.75 * (s.dl / t.avgdl))))))
         |      AS BIGINT) AS m
         |  FROM tf JOIN dfreq d ON tf.term = d.term
         |  JOIN st s ON tf.doc_id = s.doc_id CROSS JOIN tot t),
         |agg AS (SELECT doc_id, CAST(SUM(m) AS BIGINT) AS score_micro
         |        FROM sc GROUP BY doc_id)
         |SELECT row_number() OVER (ORDER BY score_micro DESC, doc_id ASC) AS rank,
         |       doc_id, score_micro
         |FROM agg
         |ORDER BY score_micro DESC, doc_id ASC
         |LIMIT 20""".stripMargin,

    // Same blocking key, same hot-block cap, same integer edit
    // distance — DuckDB's levenshtein is the identical metric.
    "q141_record_linkage" ->
      """WITH r AS (
        |  SELECT c_custkey AS id, c_name AS v, substr(c_name, 1, 16) AS block
        |  FROM customer),
        |cap AS (
        |  SELECT * FROM r QUALIFY COUNT(*) OVER (PARTITION BY block) <= 10000)
        |SELECT a.id AS id_a, b.id AS id_b, a.block AS block,
        |       CAST(levenshtein(a.v, b.v) AS BIGINT) AS dist
        |FROM cap a JOIN cap b ON a.block = b.block AND a.id < b.id
        |WHERE levenshtein(a.v, b.v) <= 1
        |ORDER BY id_a, id_b""".stripMargin,

    // Strict adjacent bigrams (q79's CTE), grand totals over the
    // UNFILTERED counts, then ln((c_ab/N_bi) / ((c_a/N_uni) *
    // (c_b/N_uni))) operand-for-operand.
    "q142_pmi_collocations" ->
      s"""WITH tk AS (
         |  SELECT doc_id,
         |    list_filter(string_split_regex($normText, ' '), x -> x <> '') AS tk
         |  FROM documents),
         |bgl AS (
         |  SELECT CASE WHEN len(tk) < 2 THEN CAST([] AS VARCHAR[])
         |    ELSE list_transform(range(1, len(tk)), i -> tk[i] || ' ' || tk[i+1])
         |    END AS bg
         |  FROM tk),
         |uni AS (SELECT t, COUNT(*) AS c
         |        FROM (SELECT unnest(tk) AS t FROM tk) GROUP BY t),
         |big AS (SELECT bg, COUNT(*) AS c_ab
         |        FROM (SELECT unnest(bg) AS bg FROM bgl) GROUP BY bg),
         |nu AS (SELECT CAST(SUM(c) AS DOUBLE) AS n FROM uni),
         |nb AS (SELECT CAST(SUM(c_ab) AS DOUBLE) AS n FROM big)
         |SELECT bg AS bigram, CAST(c_ab AS BIGINT) AS c_ab,
         |  CAST(a.c AS BIGINT) AS c_a, CAST(b.c AS BIGINT) AS c_b,
         |  CAST(round(1e6 * ln((c_ab / nb.n) /
         |    ((a.c / nu.n) * (b.c / nu.n)))) AS BIGINT) AS pmi_micro
         |FROM big
         |JOIN uni a ON split_part(bg, ' ', 1) = a.t
         |JOIN uni b ON split_part(bg, ' ', 2) = b.t
         |CROSS JOIN nu CROSS JOIN nb
         |WHERE c_ab >= 5
         |ORDER BY pmi_micro DESC, bigram ASC
         |LIMIT 50""".stripMargin,

    // Exact integer moments, then the identical fixed-order slope /
    // intercept floats, rounded once to micro.
    "q158_trend" ->
      """WITH sp AS (
        |  SELECT o_orderpriority AS grp, CAST(o_orderdate AS DATE) AS d,
        |    CAST(SUM(CAST(round(o_totalprice * 100.0) AS BIGINT)) AS BIGINT) AS cents
        |  FROM orders WHERE o_orderkey % 50 = 0
        |  GROUP BY 1, 2),
        |d0 AS (SELECT MIN(d) AS d0 FROM sp),
        |xy AS (SELECT grp, date_diff('day', d0, d) AS x, cents AS y
        |       FROM sp CROSS JOIN d0),
        |m AS (
        |  SELECT grp, COUNT(*) AS n,
        |    CAST(SUM(x) AS BIGINT) AS sx, CAST(SUM(y) AS BIGINT) AS sy,
        |    CAST(SUM(x * x) AS BIGINT) AS sxx, CAST(SUM(x * y) AS BIGINT) AS sxy
        |  FROM xy GROUP BY grp)
        |SELECT grp, n,
        |  CAST(round(1e6 * ((CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
        |        - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
        |       / (CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
        |          - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)))) AS BIGINT)
        |    AS slope_micro,
        |  CAST(round(1e6 * ((CAST(sy AS DOUBLE) / CAST(n AS DOUBLE))
        |       - ((CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
        |           - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
        |          / (CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
        |             - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)))
        |         * (CAST(sx AS DOUBLE) / CAST(n AS DOUBLE)))) AS BIGINT)
        |    AS intercept_micro
        |FROM m
        |WHERE n >= 2 AND (CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
        |      - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)) > 0
        |ORDER BY grp""".stripMargin,

    // argmax by (score desc, shard desc) mirrors greatest's struct
    // ordering tie-break.
    "q157_rendezvous" ->
      s"""WITH scored AS (
         |  SELECT c_custkey, sh.shard,
         |    ${md5Hash64Sql("sh.shard || ':' || CAST(c_custkey AS VARCHAR)")} AS s
         |  FROM customer
         |  CROSS JOIN (SELECT unnest(['s1','s2','s3','s4','s5']) AS shard) sh)
         |SELECT c_custkey, shard FROM (
         |  SELECT c_custkey, shard,
         |    row_number() OVER (PARTITION BY c_custkey
         |                       ORDER BY s DESC, shard DESC) AS rn
         |  FROM scored QUALIFY rn = 1) q
         |ORDER BY c_custkey""".stripMargin,

    // The q155 priority math cut per key with QUALIFY row_number.
    "q156_weighted_per_key" ->
      s"""WITH h AS (
         |  SELECT doc_id, source, n_chars,
         |    ${md5Hash64Sql("'7:' || CAST(doc_id AS VARCHAR)")} AS h
         |  FROM documents WHERE n_chars > 0),
         |pr AS (
         |  SELECT doc_id, source, n_chars,
         |    CAST(round(1e6 * (-ln((CAST(h % 1000000007 AS DOUBLE) + 1.0)
         |                          / 1000000008.0)
         |                      / CAST(n_chars AS DOUBLE))) AS BIGINT)
         |      AS priority_micro
         |  FROM h)
         |SELECT source, rank AS draw_rank, doc_id, n_chars, priority_micro
         |FROM (
         |  SELECT *, row_number() OVER (PARTITION BY source
         |    ORDER BY priority_micro ASC, doc_id ASC) AS rank
         |  FROM pr QUALIFY rank <= 10) q
         |ORDER BY source, draw_rank""".stripMargin,

    // u = (h mod p + 1)/(p + 1) of the shared md5 hash, then
    // -ln(u)/w in fixed order; cut by (rounded priority, id).
    "q155_weighted_sample" ->
      s"""WITH h AS (
         |  SELECT doc_id, n_chars,
         |    ${md5Hash64Sql("'7:' || CAST(doc_id AS VARCHAR)")} AS h
         |  FROM documents WHERE n_chars > 0),
         |pr AS (
         |  SELECT doc_id, n_chars,
         |    CAST(round(1e6 * (-ln((CAST(h % 1000000007 AS DOUBLE) + 1.0)
         |                          / 1000000008.0)
         |                      / CAST(n_chars AS DOUBLE))) AS BIGINT)
         |      AS priority_micro
         |  FROM h)
         |SELECT doc_id, n_chars, priority_micro FROM pr
         |ORDER BY priority_micro, doc_id
         |LIMIT 100""".stripMargin,

    // Integer window moments (sum v, sum v^2), fixed-order float z,
    // IEEE sqrt — bit-identical before the micro rounding.
    "q154_rolling_anomaly" ->
      """WITH sp AS (
        |  SELECT o_orderpriority AS grp, CAST(o_orderdate AS DATE) AS d,
        |    CAST(SUM(CAST(round(o_totalprice * 100.0) AS BIGINT)) AS BIGINT) AS cents
        |  FROM orders WHERE o_orderkey % 50 = 0
        |  GROUP BY 1, 2),
        |bounds AS (SELECT MIN(d) AS mn, MAX(d) AS mx FROM sp),
        |days AS (
        |  SELECT CAST(unnest(generate_series(CAST(mn AS TIMESTAMP),
        |    CAST(mx AS TIMESTAMP), INTERVAL 1 DAY)) AS DATE) AS d
        |  FROM bounds),
        |grid AS (SELECT grp, d FROM (SELECT DISTINCT grp FROM sp) CROSS JOIN days),
        |f AS (SELECT g.grp, g.d, COALESCE(sp.cents, 0) AS cents
        |      FROM grid g LEFT JOIN sp ON g.grp = sp.grp AND g.d = sp.d),
        |st AS (SELECT grp, d, cents,
        |  CAST(SUM(cents) OVER w AS BIGINT) AS s1,
        |  CAST(SUM(cents * cents) OVER w AS BIGINT) AS s2,
        |  COUNT(cents) OVER w AS n
        |  FROM f WINDOW w AS (PARTITION BY grp ORDER BY d
        |                      ROWS BETWEEN 14 PRECEDING AND 1 PRECEDING)),
        |z AS (SELECT grp, d, cents,
        |  CAST(round(1e6 * ((cents - CAST(s1 AS DOUBLE) / n) /
        |    sqrt(CAST(s2 AS DOUBLE) / n -
        |         (CAST(s1 AS DOUBLE) / n) * (CAST(s1 AS DOUBLE) / n))))
        |    AS BIGINT) AS z_micro
        |  FROM st
        |  WHERE n >= 5 AND (CAST(s2 AS DOUBLE) / n -
        |        (CAST(s1 AS DOUBLE) / n) * (CAST(s1 AS DOUBLE) / n)) > 0)
        |SELECT grp, d, cents, z_micro FROM z
        |WHERE abs(z_micro) >= 3000000
        |ORDER BY grp, d""".stripMargin,

    // The q149 grid with zero fill, then SUM OVER 6 PRECEDING.
    "q152_rolling_window" ->
      """WITH sp AS (
        |  SELECT o_orderpriority AS grp, CAST(o_orderdate AS DATE) AS d,
        |    CAST(SUM(CAST(round(o_totalprice * 100.0) AS BIGINT)) AS BIGINT) AS cents
        |  FROM orders WHERE o_orderkey % 50 = 0
        |  GROUP BY 1, 2),
        |bounds AS (SELECT MIN(d) AS mn, MAX(d) AS mx FROM sp),
        |days AS (
        |  SELECT CAST(unnest(generate_series(CAST(mn AS TIMESTAMP),
        |    CAST(mx AS TIMESTAMP), INTERVAL 1 DAY)) AS DATE) AS d
        |  FROM bounds),
        |grid AS (SELECT grp, d FROM (SELECT DISTINCT grp FROM sp) CROSS JOIN days),
        |f AS (SELECT g.grp, g.d, COALESCE(sp.cents, 0) AS cents
        |      FROM grid g LEFT JOIN sp ON g.grp = sp.grp AND g.d = sp.d)
        |SELECT grp, d, cents,
        |  CAST(SUM(cents) OVER (PARTITION BY grp ORDER BY d
        |    ROWS BETWEEN 6 PRECEDING AND CURRENT ROW) AS BIGINT) AS rolling_cents
        |FROM f
        |ORDER BY grp, d""".stripMargin,

    // Each step's threshold chains off the previous: first qualifying
    // event strictly after the prior step's first touch.
    "q153_funnel" ->
      """WITH ev AS (SELECT * FROM events WHERE ts < TIMESTAMP '2024-01-04'),
        |s1 AS (SELECT user_id, MIN(ts) AS t1 FROM ev
        |       WHERE event_type = 'view' GROUP BY 1),
        |s2 AS (SELECT e.user_id, MIN(e.ts) AS t2 FROM ev e JOIN s1 USING (user_id)
        |       WHERE e.event_type = 'click' AND e.ts > s1.t1 GROUP BY 1),
        |s3 AS (SELECT e.user_id, MIN(e.ts) AS t3 FROM ev e JOIN s2 USING (user_id)
        |       WHERE e.event_type = 'purchase' AND e.ts > s2.t2 GROUP BY 1)
        |SELECT * FROM (
        |  SELECT CAST(1 AS BIGINT) AS step, 'view' AS step_name,
        |         CAST((SELECT COUNT(*) FROM s1) AS BIGINT) AS n_users
        |  UNION ALL
        |  SELECT 2, 'click', (SELECT COUNT(*) FROM s2)
        |  UNION ALL
        |  SELECT 3, 'purchase', (SELECT COUNT(*) FROM s3))
        |ORDER BY step""".stripMargin,

    // Monday-start week truncation and integer day-diff div 7 on
    // both engines; distinct users per (cohort, offset).
    "q151_cohort_retention" ->
      """WITH e AS (
        |  SELECT user_id, date_trunc('week', ts) AS wk FROM events
        |  WHERE event_id >= user_id * 300),
        |c AS (SELECT user_id, MIN(wk) AS c0 FROM e GROUP BY user_id)
        |SELECT CAST(floor(epoch(c0)) AS BIGINT) AS cohort_epoch,
        |  CAST(date_diff('day', CAST(c0 AS DATE), CAST(wk AS DATE)) // 7
        |       AS BIGINT) AS offset_weeks,
        |  CAST(COUNT(DISTINCT e.user_id) AS BIGINT) AS n_users
        |FROM e JOIN c USING (user_id)
        |GROUP BY 1, 2
        |ORDER BY 1, 2""".stripMargin,

    // The Bloom is an optimization, not a semantic: ground truth is
    // the plain IN-subquery semi-join.
    "q150_bloom_semijoin" ->
      """SELECT l_orderkey, CAST(l_linenumber AS BIGINT) AS l_linenumber,
        |       l_suppkey, CAST(l_quantity AS BIGINT) AS qty,
        |       CAST(round(l_extendedprice * 100.0) AS BIGINT) AS cents
        |FROM lineitem
        |WHERE l_suppkey IN (SELECT s_suppkey FROM supplier
        |                    WHERE s_suppkey % 97 = 0)
        |ORDER BY l_orderkey, l_linenumber, l_suppkey, qty, cents""".stripMargin,

    // Same grid (generate_series over the sparse set's bounds), same
    // IGNORE NULLS running last — cents are exact integers.
    "q149_gap_fill" ->
      """WITH sp AS (
        |  SELECT o_orderpriority AS grp, CAST(o_orderdate AS DATE) AS d,
        |    CAST(SUM(CAST(round(o_totalprice * 100.0) AS BIGINT)) AS BIGINT) AS cents
        |  FROM orders WHERE o_orderkey % 50 = 0
        |  GROUP BY 1, 2),
        |bounds AS (SELECT MIN(d) AS mn, MAX(d) AS mx FROM sp),
        |days AS (
        |  SELECT CAST(unnest(generate_series(CAST(mn AS TIMESTAMP),
        |    CAST(mx AS TIMESTAMP), INTERVAL 1 DAY)) AS DATE) AS d
        |  FROM bounds),
        |grid AS (SELECT grp, d FROM (SELECT DISTINCT grp FROM sp) CROSS JOIN days),
        |j AS (SELECT g.grp, g.d, sp.cents FROM grid g
        |      LEFT JOIN sp ON g.grp = sp.grp AND g.d = sp.d)
        |SELECT grp, d,
        |  last_value(cents IGNORE NULLS) OVER (PARTITION BY grp ORDER BY d
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cents
        |FROM j
        |ORDER BY grp, d""".stripMargin,

    "q174_period_delta" ->
      """WITH sp AS (
        |  SELECT o_orderpriority AS grp, CAST(o_orderdate AS DATE) AS d,
        |    CAST(COUNT(*) AS BIGINT) AS n
        |  FROM orders GROUP BY 1, 2),
        |bounds AS (SELECT MIN(d) AS mn, MAX(d) AS mx FROM sp),
        |days AS (
        |  SELECT CAST(unnest(generate_series(CAST(mn AS TIMESTAMP),
        |    CAST(mx AS TIMESTAMP), INTERVAL 1 DAY)) AS DATE) AS d
        |  FROM bounds),
        |grid AS (SELECT grp, d FROM (SELECT DISTINCT grp FROM sp) CROSS JOIN days),
        |g AS (SELECT g.grp, g.d, COALESCE(sp.n, 0) AS n FROM grid g
        |      LEFT JOIN sp ON g.grp = sp.grp AND g.d = sp.d),
        |l AS (SELECT grp, d, n,
        |        LAG(n, 7) OVER (PARTITION BY grp ORDER BY d) AS prev_value
        |      FROM g)
        |SELECT grp, d, n, CAST(prev_value AS BIGINT) AS prev_value,
        |  CAST(n - prev_value AS BIGINT) AS delta,
        |  CAST(round(1e6 * CAST(n - prev_value AS DOUBLE)
        |    / CAST(prev_value AS DOUBLE)) AS BIGINT) AS pct_micro
        |FROM l WHERE prev_value IS NOT NULL AND prev_value <> 0
        |ORDER BY grp, d""".stripMargin,

    // The q21 assignment CTEs feeding the q139 labeling CTEs keyed by
    // cell — assignment and c-TF-IDF replayed end-to-end.
    "q148_cluster_keywords" ->
      s"""WITH hashed AS (
         |  SELECT vec_id, embedding,
         |    ${md5Hash64Sql("CAST(vec_id AS VARCHAR)")} AS h
         |  FROM embeddings),
         |cents AS (
         |  SELECT h AS cell, CAST(embedding AS DOUBLE[]) AS cvec
         |  FROM hashed ORDER BY h LIMIT 16),
         |assign AS (
         |  SELECT hd.vec_id AS doc_id, c.cell,
         |    row_number() OVER (PARTITION BY hd.vec_id
         |      ORDER BY list_cosine_similarity(CAST(hd.embedding AS DOUBLE[]), c.cvec) DESC,
         |               c.cell DESC) AS rn
         |  FROM hashed hd CROSS JOIN cents c),
         |cl AS (SELECT doc_id, cell FROM assign WHERE rn = 1),
         |toks AS (SELECT doc_id, $toksLower AS tk FROM documents),
         |lab AS (SELECT cl.cell, t.tk FROM toks t JOIN cl ON t.doc_id = cl.doc_id),
         |n AS (SELECT COUNT(DISTINCT cell) AS n FROM lab),
         |tfg AS (
         |  SELECT cell, term, COUNT(*) AS tf
         |  FROM (SELECT cell, unnest(tk) AS term FROM lab) x
         |  GROUP BY cell, term),
         |dfg AS (SELECT term, COUNT(*) AS df FROM tfg GROUP BY term),
         |sc AS (
         |  SELECT cell, term, tf, df,
         |    tf * (CAST(round(1e6 * ln((n.n + 1.0) / (df + 1.0))) AS BIGINT)
         |          + 1000000) AS score_micro
         |  FROM tfg JOIN dfg USING (term) CROSS JOIN n)
         |SELECT cell, rank, term, CAST(tf AS BIGINT) AS tf,
         |       CAST(df AS BIGINT) AS df, score_micro
         |FROM (
         |  SELECT cell, term, tf, df, score_micro,
         |    row_number() OVER (PARTITION BY cell
         |                       ORDER BY score_micro DESC, term ASC) AS rank
         |  FROM sc QUALIFY rank <= 5) q
         |ORDER BY cell, rank""".stripMargin,

    // The ground truth the index must reproduce: the direct scan.
    "q147_trigram_search" ->
      """SELECT doc_id, n_chars FROM documents
        |WHERE contains(text, 'stream batch')
        |ORDER BY doc_id""".stripMargin,

    // Scaled-integer bin arithmetic: both engines compute
    // ((v - min) * bins) div (range + 1) on nonnegative longs.
    "q145_histogram" ->
      """WITH v AS (
        |  SELECT CAST(round(o_totalprice * 100.0) AS BIGINT) AS v
        |  FROM orders WHERE o_totalprice IS NOT NULL),
        |mm AS (SELECT MIN(v) AS mn, MAX(v) AS mx FROM v)
        |SELECT ((v - mn) * 32) // (mx - mn + 1) AS bin,
        |       COUNT(*) AS n_rows
        |FROM v CROSS JOIN mm
        |GROUP BY 1
        |ORDER BY bin""".stripMargin,

    "q146_fk_orphans" ->
      """SELECT o_custkey, COUNT(*) AS n_rows
        |FROM orders
        |WHERE o_custkey IS NOT NULL
        |  AND o_custkey NOT IN (SELECT c_custkey FROM customer
        |                        WHERE c_custkey % 9 <> 4 AND c_custkey IS NOT NULL)
        |GROUP BY o_custkey
        |ORDER BY o_custkey""".stripMargin,

    // Weights are Scala-computed integer literals in BOTH plans; the
    // score is then pure integer CASE arithmetic on field equality.
    "q144_linkage_score" -> {
      val ws = fsFields.map { case (_, _, m, u) =>
        operators.Dedup.fsWeightsMicro(m, u) }
      def fieldCase(ca: String, cb: String, w: (Long, Long)) =
        s"""(CASE WHEN a.$ca IS NULL OR b.$cb IS NULL THEN 0
           |      WHEN a.$ca = b.$cb THEN ${w._1} ELSE ${w._2} END)""".stripMargin
      val scoreSql = fsFields.zip(ws).map { case ((ca, cb, _, _), w) =>
        fieldCase(ca, cb, w) }.mkString(" +\n")
      s"""WITH a AS (
         |  SELECT c_custkey, c_name, c_mktsegment, c_acctbal,
         |         substr(c_name, 1, 17) AS blk
         |  FROM customer),
         |b AS (
         |  SELECT c_custkey, c_name,
         |    CASE WHEN c_custkey % 10 = 0 THEN NULL
         |         ELSE c_mktsegment END AS c_mktsegment,
         |    CASE WHEN c_custkey % 7 = 0 THEN c_acctbal + 1.0
         |         ELSE c_acctbal END AS c_acctbal,
         |    substr(c_name, 1, 17) AS blk
         |  FROM customer),
         |cnt AS (SELECT blk, COUNT(*) AS c FROM
         |        (SELECT blk FROM a UNION ALL SELECT blk FROM b) GROUP BY blk),
         |ok AS (SELECT blk FROM cnt WHERE c <= 10000),
         |p AS (
         |  SELECT a.c_custkey AS id_a, b.c_custkey AS id_b,
         |    CAST($scoreSql AS BIGINT) AS score_micro
         |  FROM a JOIN ok USING (blk) JOIN b ON a.blk = b.blk)
         |SELECT id_a, id_b, score_micro,
         |  CASE WHEN score_micro >= 12000000 THEN 'match'
         |       WHEN score_micro > 0 THEN 'possible'
         |       ELSE 'non_match' END AS decision
         |FROM p
         |WHERE score_micro > 0
         |ORDER BY id_a, id_b""".stripMargin
    },

    // The digests never cross engines — DuckDB re-derives the status
    // from its own md5 over the same derived snapshots.
    "q143_snapshot_diff" ->
      """WITH o AS (
        |  SELECT doc_id AS id, md5(concat_ws(chr(1), text, source)) AS h
        |  FROM documents WHERE doc_id % 11 <> 3),
        |n AS (
        |  SELECT doc_id AS id,
        |    md5(concat_ws(chr(1),
        |      CASE WHEN doc_id % 7 = 0 THEN text || ' v2' ELSE text END,
        |      source)) AS h
        |  FROM documents WHERE doc_id % 13 <> 5)
        |SELECT COALESCE(o.id, n.id) AS id,
        |  CASE WHEN o.h IS NULL THEN 'added'
        |       WHEN n.h IS NULL THEN 'removed'
        |       WHEN o.h <> n.h THEN 'changed'
        |       ELSE 'unchanged' END AS status
        |FROM o FULL OUTER JOIN n ON o.id = n.id
        |WHERE (CASE WHEN o.h IS NULL THEN 'added'
        |       WHEN n.h IS NULL THEN 'removed'
        |       WHEN o.h <> n.h THEN 'changed'
        |       ELSE 'unchanged' END) <> 'unchanged'
        |ORDER BY id""".stripMargin,

    // Median and MAD of integers land on .0/.5 — exact doubles both
    // engines rescale to the SAME micro longs; the row expression is
    // then pure integer arithmetic (div = // : both truncate to zero).
    "q135_robust_scale" ->
      """WITH m AS (
        |  SELECT CAST(round(quantile_cont(CAST(n_chars AS BIGINT), 0.5) * 1000000) AS BIGINT) AS med
        |  FROM documents),
        |d AS (
        |  SELECT CAST(round(quantile_cont(abs(CAST(n_chars AS BIGINT) * 1000000 - m.med), 0.5)) AS BIGINT) AS mad
        |  FROM documents, m)
        |SELECT doc_id, n_chars,
        |  CAST(((CAST(n_chars AS BIGINT) * 1000000 - m.med) * 1000000)
        |       // greatest(1, d.mad) AS BIGINT) AS robust_micro
        |FROM documents, m, d ORDER BY doc_id""".stripMargin,

    // q59's window/rewrite replay with the count filter swapped for a
    // needle-gram semi-join: spans come from trigrams of the benchmark
    // subset, the rewrite HOF is identical.
    "q136_excise_passages" ->
      """WITH toks AS (
        |  SELECT doc_id,
        |    list_filter(string_split_regex(COALESCE(text, ''), '\s+'), x -> x <> '') AS tk
        |  FROM documents WHERE doc_id % 50 <> 0),
        |wins AS (
        |  SELECT doc_id, u.pos, u.w FROM (
        |    SELECT doc_id, unnest(list_transform(range(1, greatest(len(tk) - 1, 1)), i ->
        |      struct_pack(pos := i - 1, w := tk[i] || ' ' || tk[i+1] || ' ' || tk[i+2]))) AS u
        |    FROM toks) x),
        |ntoks AS (
        |  SELECT list_filter(string_split_regex(COALESCE(text, ''), '\s+'), x -> x <> '') AS tk
        |  FROM documents WHERE doc_id % 50 = 0),
        |grams AS (
        |  SELECT DISTINCT u.w FROM (
        |    SELECT unnest(list_transform(range(1, greatest(len(tk) - 1, 1)), i ->
        |      struct_pack(pos := i - 1, w := tk[i] || ' ' || tk[i+1] || ' ' || tk[i+2]))) AS u
        |    FROM ntoks) x),
        |spans AS (
        |  SELECT doc_id, list(pos ORDER BY pos) AS starts
        |  FROM wins WHERE w IN (SELECT w FROM grams) GROUP BY doc_id),
        |joined AS (
        |  SELECT t.doc_id, t.tk, s.starts FROM toks t
        |  LEFT JOIN spans s ON t.doc_id = s.doc_id),
        |kept AS (
        |  SELECT doc_id, tk,
        |    CASE WHEN starts IS NULL THEN tk
        |         ELSE list_filter(tk, (x, i) ->
        |           NOT len(list_filter(starts, ss -> i - 1 >= ss AND i - 1 <= ss + 2)) > 0)
        |    END AS kp
        |  FROM joined)
        |SELECT doc_id,
        |  COALESCE(array_to_string(kp, ' '), '') AS clean_text,
        |  CAST(len(tk) AS INT) AS n_tokens,
        |  CAST(len(tk) - len(kp) AS INT) AS n_removed
        |FROM kept ORDER BY doc_id""".stripMargin,

    // Cut fractions rendered from the SAME Scala cumulative doubles
    // the operator folds (0.8 + 0.1 is not 0.9 in binary).
    "q133_split_stratified" -> {
      val cfs = Seq(0.8, 0.1, 0.1).scanLeft(0.0)(_ + _).tail
      s"""WITH c AS (
         |  SELECT doc_id, source, ${md5Hash64Sql("CAST(doc_id AS VARCHAR)")} AS h
         |  FROM documents),
         |n AS (SELECT source, COUNT(*) AS ns FROM c GROUP BY source),
         |r AS (
         |  SELECT doc_id, source,
         |    row_number() OVER (PARTITION BY source ORDER BY h ASC, doc_id ASC)
         |      AS rank
         |  FROM c)
         |SELECT r.doc_id, r.source,
         |  CASE WHEN rank <= floor(${cfs(0)} * ns) THEN 'train'
         |       WHEN rank <= floor(${cfs(1)} * ns) THEN 'val'
         |       ELSE 'test' END AS split
         |FROM r JOIN n USING (source)
         |ORDER BY doc_id""".stripMargin
    },

    // Same fold order as blendRanks: (p1*w1 + p2*w2) / totalW, floor.
    "q129_blend_ranks" ->
      """WITH t AS (
        |  SELECT doc_id,
        |    CAST(len(list_filter(string_split_regex(trim(text), '\s+'),
        |         w -> w <> '')) AS DOUBLE) AS n_tok,
        |    CAST(length(text) AS DOUBLE) AS n_chars
        |  FROM documents),
        |r1 AS (SELECT doc_id,
        |         row_number() OVER (ORDER BY n_tok ASC, doc_id ASC) AS rank,
        |         COUNT(*) OVER () AS n FROM t),
        |p1 AS (SELECT doc_id, CAST(CASE WHEN n <= 1 THEN 0
        |         ELSE ((rank - 1) * 1000000) // (n - 1) END AS BIGINT) AS pct_n_tok
        |       FROM r1),
        |r2 AS (SELECT doc_id,
        |         row_number() OVER (ORDER BY n_chars ASC, doc_id ASC) AS rank,
        |         COUNT(*) OVER () AS n FROM t),
        |p2 AS (SELECT doc_id, CAST(CASE WHEN n <= 1 THEN 0
        |         ELSE ((rank - 1) * 1000000) // (n - 1) END AS BIGINT) AS pct_n_chars
        |       FROM r2)
        |SELECT p1.doc_id, pct_n_tok, pct_n_chars,
        |  CAST(floor((pct_n_tok * 0.75 + pct_n_chars * 0.25) / 1.0) AS BIGINT)
        |    AS blend_micro
        |FROM p1 JOIN p2 USING (doc_id)
        |ORDER BY doc_id""".stripMargin,

    // q89's analyze replayed per side, joined, deltas in SQL.
    "q130_stats_drift" ->
      """WITH a AS (
        |  SELECT c_custkey, c_name, c_mktsegment, c_nationkey FROM customer),
        |b AS (
        |  SELECT c_custkey,
        |    CASE WHEN c_custkey % 7 = 0 THEN NULL ELSE c_name END AS c_name,
        |    CASE WHEN c_mktsegment = 'BUILDING' THEN 'ZBUILDING'
        |         ELSE c_mktsegment END AS c_mktsegment,
        |    c_nationkey
        |  FROM customer WHERE c_custkey % 11 <> 0),
        |la AS (
        |  SELECT 'c_custkey' AS col_name, COUNT(*) AS n_rows,
        |    CAST(COUNT(*) FILTER (c_custkey IS NULL) AS BIGINT) AS n_null,
        |    CAST(COUNT(DISTINCT c_custkey) AS BIGINT) AS n_distinct,
        |    CAST(MIN(c_custkey) AS VARCHAR) AS min_val,
        |    CAST(MAX(c_custkey) AS VARCHAR) AS max_val FROM a
        |  UNION ALL
        |  SELECT 'c_name', COUNT(*),
        |    CAST(COUNT(*) FILTER (c_name IS NULL) AS BIGINT),
        |    CAST(COUNT(DISTINCT c_name) AS BIGINT),
        |    CAST(MIN(c_name) AS VARCHAR), CAST(MAX(c_name) AS VARCHAR) FROM a
        |  UNION ALL
        |  SELECT 'c_mktsegment', COUNT(*),
        |    CAST(COUNT(*) FILTER (c_mktsegment IS NULL) AS BIGINT),
        |    CAST(COUNT(DISTINCT c_mktsegment) AS BIGINT),
        |    CAST(MIN(c_mktsegment) AS VARCHAR), CAST(MAX(c_mktsegment) AS VARCHAR) FROM a
        |  UNION ALL
        |  SELECT 'c_nationkey', COUNT(*),
        |    CAST(COUNT(*) FILTER (c_nationkey IS NULL) AS BIGINT),
        |    CAST(COUNT(DISTINCT c_nationkey) AS BIGINT),
        |    CAST(MIN(c_nationkey) AS VARCHAR), CAST(MAX(c_nationkey) AS VARCHAR) FROM a),
        |lb AS (
        |  SELECT 'c_custkey' AS col_name, COUNT(*) AS n_rows,
        |    CAST(COUNT(*) FILTER (c_custkey IS NULL) AS BIGINT) AS n_null,
        |    CAST(COUNT(DISTINCT c_custkey) AS BIGINT) AS n_distinct,
        |    CAST(MIN(c_custkey) AS VARCHAR) AS min_val,
        |    CAST(MAX(c_custkey) AS VARCHAR) AS max_val FROM b
        |  UNION ALL
        |  SELECT 'c_name', COUNT(*),
        |    CAST(COUNT(*) FILTER (c_name IS NULL) AS BIGINT),
        |    CAST(COUNT(DISTINCT c_name) AS BIGINT),
        |    CAST(MIN(c_name) AS VARCHAR), CAST(MAX(c_name) AS VARCHAR) FROM b
        |  UNION ALL
        |  SELECT 'c_mktsegment', COUNT(*),
        |    CAST(COUNT(*) FILTER (c_mktsegment IS NULL) AS BIGINT),
        |    CAST(COUNT(DISTINCT c_mktsegment) AS BIGINT),
        |    CAST(MIN(c_mktsegment) AS VARCHAR), CAST(MAX(c_mktsegment) AS VARCHAR) FROM b
        |  UNION ALL
        |  SELECT 'c_nationkey', COUNT(*),
        |    CAST(COUNT(*) FILTER (c_nationkey IS NULL) AS BIGINT),
        |    CAST(COUNT(DISTINCT c_nationkey) AS BIGINT),
        |    CAST(MIN(c_nationkey) AS VARCHAR), CAST(MAX(c_nationkey) AS VARCHAR) FROM b)
        |SELECT la.col_name,
        |  la.n_rows AS n_rows_a, lb.n_rows AS n_rows_b,
        |  lb.n_rows - la.n_rows AS row_delta,
        |  la.n_null AS n_null_a, lb.n_null AS n_null_b,
        |  lb.n_null - la.n_null AS null_delta,
        |  la.n_distinct AS n_distinct_a, lb.n_distinct AS n_distinct_b,
        |  lb.n_distinct - la.n_distinct AS distinct_delta,
        |  NOT (lb.min_val IS NOT DISTINCT FROM la.min_val) AS min_changed,
        |  NOT (lb.max_val IS NOT DISTINCT FROM la.max_val) AS max_changed
        |FROM la JOIN lb USING (col_name)
        |ORDER BY col_name""".stripMargin,

    // The oracle is the single-window form the operator replaces.
    "q128_rank_normalize" ->
      """WITH t AS (
        |  SELECT doc_id,
        |    CAST(len(list_filter(string_split_regex(trim(text), '\s+'),
        |         w -> w <> '')) AS DOUBLE) AS score
        |  FROM documents),
        |r AS (
        |  SELECT doc_id, score,
        |    row_number() OVER (ORDER BY score ASC, doc_id ASC) AS rank,
        |    COUNT(*) OVER () AS n
        |  FROM t)
        |SELECT doc_id, score AS score_key, CAST(rank AS BIGINT) AS rank,
        |  CAST(CASE WHEN n <= 1 THEN 0
        |       ELSE ((rank - 1) * 1000000) // (n - 1) END AS BIGINT) AS pct_micro
        |FROM r ORDER BY doc_id""".stripMargin,

    // Identical to the q127 replay minus the exact column: the store's
    // shard-merged registers must land on the single-pass sketch.
    "q131_hll_store" -> {
      val m = 1L << 10
      val am2 = (0.7213 / (1.0 + 1.079 / m)) * m * m
      s"""WITH t AS (
         |  SELECT DISTINCT source, tok FROM (
         |    SELECT source,
         |      unnest(list_filter(string_split_regex(trim(lower(text)), '\\s+'),
         |             w -> w <> '')) AS tok
         |    FROM documents) x),
         |h AS (SELECT source, ${md5Hash64Sql("tok")} AS h FROM t),
         |rv AS (SELECT source, h % $m AS bucket, h // $m AS v FROM h),
         |rk AS (SELECT source, bucket,
         |         CASE WHEN v = 0 THEN 51 ELSE 51 - length(bin(v)) END AS rank
         |       FROM rv),
         |regs AS (SELECT source, bucket, MAX(rank) AS r
         |         FROM rk GROUP BY source, bucket),
         |agg AS (
         |  SELECT source, CAST(COUNT(*) AS BIGINT) AS n_regs,
         |    list_reduce(list_transform(
         |      list_sort(list(struct_pack(bucket := bucket, r := r))),
         |      x -> power(2.0, -x.r)), (a, b) -> a + b) AS s
         |  FROM regs GROUP BY source)
         |SELECT source, n_regs,
         |  CAST(floor($am2 / (s + CAST($m - n_regs AS DOUBLE))) AS BIGINT)
         |    AS est_floor
         |FROM agg
         |ORDER BY source""".stripMargin
    },

    // alpha·m² rendered from the SAME Scala double hllEstimate uses
    // (Double.toString round-trips); power(2,-r) terms are FP-exact.
    "q127_hll_distinct" -> {
      val m = 1L << 10
      val am2 = (0.7213 / (1.0 + 1.079 / m)) * m * m
      s"""WITH t AS (
         |  SELECT DISTINCT source, tok FROM (
         |    SELECT source,
         |      unnest(list_filter(string_split_regex(trim(lower(text)), '\\s+'),
         |             w -> w <> '')) AS tok
         |    FROM documents) x),
         |h AS (SELECT source, ${md5Hash64Sql("tok")} AS h FROM t),
         |rv AS (SELECT source, h % $m AS bucket, h // $m AS v FROM h),
         |rk AS (SELECT source, bucket,
         |         CASE WHEN v = 0 THEN 51 ELSE 51 - length(bin(v)) END AS rank
         |       FROM rv),
         |regs AS (SELECT source, bucket, MAX(rank) AS r
         |         FROM rk GROUP BY source, bucket),
         |agg AS (
         |  SELECT source, CAST(COUNT(*) AS BIGINT) AS n_regs,
         |    list_reduce(list_transform(
         |      list_sort(list(struct_pack(bucket := bucket, r := r))),
         |      x -> power(2.0, -x.r)), (a, b) -> a + b) AS s
         |  FROM regs GROUP BY source),
         |ex AS (SELECT source, CAST(COUNT(DISTINCT tok) AS BIGINT) AS n_exact
         |       FROM t GROUP BY source)
         |SELECT a.source, n_regs,
         |  CAST(floor($am2 / (s + CAST($m - n_regs AS DOUBLE))) AS BIGINT)
         |    AS est_floor,
         |  n_exact
         |FROM agg a JOIN ex USING (source)
         |ORDER BY source""".stripMargin
    },

    "q126_prototype_prune" ->
      s"""WITH hashed AS (
         |  SELECT vec_id, embedding,
         |    ${md5Hash64Sql("CAST(vec_id AS VARCHAR)")} AS h
         |  FROM embeddings),
         |cents AS (
         |  SELECT h AS cell, CAST(embedding AS DOUBLE[]) AS cvec
         |  FROM hashed ORDER BY h LIMIT 16),
         |assign AS (
         |  SELECT hd.vec_id AS id, hd.embedding AS vec, c.cell,
         |    row_number() OVER (PARTITION BY hd.vec_id
         |      ORDER BY list_cosine_similarity(CAST(hd.embedding AS DOUBLE[]), c.cvec) DESC,
         |               c.cell DESC) AS rn
         |  FROM hashed hd CROSS JOIN cents c),
         |cells AS (SELECT id, vec, cell FROM assign WHERE rn = 1),
         |ranked AS (
         |  SELECT ce.id, ce.cell,
         |    row_number() OVER (PARTITION BY ce.cell
         |      ORDER BY ROUND(${cosSql("ce.vec", "ct.cvec")}, 6) DESC, ce.id ASC)
         |      AS proto_rank,
         |    COUNT(*) OVER (PARTITION BY ce.cell) AS n_cell
         |  FROM cells ce JOIN cents ct ON ce.cell = ct.cell)
         |SELECT id, cell, CAST(proto_rank AS BIGINT) AS proto_rank,
         |  CAST(n_cell AS BIGINT) AS n_cell,
         |  proto_rank > (n_cell * 300) // 1000 AS keep
         |FROM ranked ORDER BY id""".stripMargin,

    // 0.0-seeded fold == DuckDB's init-free list_reduce (x + 0.0 is
    // exact); both engines sum sqrt masses in source-sorted order.
    "q125_temperature_mix" ->
      """WITH c AS (
        |  SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs
        |  FROM documents GROUP BY source),
        |s AS (
        |  SELECT source, n_docs, sqrt(CAST(n_docs AS DOUBLE)) AS s FROM c),
        |t AS (
        |  SELECT list_reduce(
        |    list_transform(
        |      list_sort(list(struct_pack(source := source, s := s))),
        |      x -> x.s),
        |    (a, b) -> a + b) AS t
        |  FROM s)
        |SELECT source, n_docs,
        |  CAST(floor((s / t) * 1000000.0) AS BIGINT) AS weight_micro,
        |  CAST(floor(least(1.0, 300.0 * (s / t) / CAST(n_docs AS DOUBLE))
        |    * 1000000.0) AS BIGINT) AS rate_micro
        |FROM s, t ORDER BY source""".stripMargin,

    // Replace chain + counts GENERATED from TextAnalytics.mojibakeTable
    // (the same object the Spark query folds over) — drift impossible.
    "q124_fix_mojibake" -> {
      val tbl = operators.TextAnalytics.mojibakeTable
      val badSuffix = tbl.map(_._1).mkString(" ")
      val chain = tbl.foldLeft("txt") { case (acc, (bad, good)) =>
        s"replace($acc, '$bad', '$good')" }
      val counts = tbl.map { case (bad, _) =>
        s"(length(txt) - length(replace(txt, '$bad', ''))) // ${bad.length}"
      }.mkString("\n      + ")
      s"""WITH t AS (
         |  SELECT doc_id,
         |    CASE WHEN doc_id % 3 = 0 THEN text || ' $badSuffix'
         |         ELSE text END AS txt
         |  FROM documents)
         |SELECT doc_id,
         |  CAST($counts AS BIGINT) AS n_bad,
         |  CAST(length($chain) AS BIGINT) AS len_clean,
         |  md5($chain) AS h_clean
         |FROM t ORDER BY doc_id""".stripMargin
    },

    // range(0, stop, step) is end-EXCLUSIVE in DuckDB where Spark's
    // sequence is inclusive — the stop is (n_chunks-1)*stride + 1.
    // list_slice is 1-based inclusive-both-ends and clamps, matching
    // Spark's slice(toks, off+1, len) at the tail.
    "q123_chunk_docs" ->
      """WITH t AS (
        |  SELECT doc_id,
        |    list_filter(string_split_regex(trim(COALESCE(text, '')), '\s+'),
        |                w -> w <> '') AS toks
        |  FROM documents),
        |n AS (
        |  SELECT doc_id, toks, CAST(len(toks) AS BIGINT) AS n,
        |    1 + (CASE WHEN len(toks) > 32 THEN len(toks) - 32 ELSE 0 END + 23) // 24
        |      AS n_chunks
        |  FROM t WHERE len(toks) > 0)
        |SELECT doc_id,
        |  CAST(off // 24 AS BIGINT) AS chunk_idx,
        |  CAST(least(32, n - off) AS BIGINT) AS n_chunk_tokens,
        |  array_to_string(list_slice(toks, off + 1, off + 32), ' ') AS chunk_text
        |FROM n, UNNEST(range(0, CAST((n_chunks - 1) * 24 + 1 AS BIGINT), 24)) AS u(off)
        |ORDER BY doc_id, chunk_idx""".stripMargin,

    // Integer micro-unit DIVs throughout (// in DuckDB, div in Spark —
    // identical truncation on the non-negative operands here).
    "q122_gopher_rules" ->
      """WITH b AS (
        |  SELECT doc_id, COALESCE(text, '') AS text,
        |    list_filter(string_split_regex(trim(COALESCE(text, '')), '\s+'),
        |                w -> w <> '') AS toks
        |  FROM documents),
        |c AS (
        |  SELECT doc_id, text, toks,
        |    CAST(len(toks) AS BIGINT) AS n_words,
        |    CAST(COALESCE(list_sum(list_transform(toks, w -> length(w))), 0)
        |         AS BIGINT) AS sum_len,
        |    CAST(length(text) - length(replace(text, '#', ''))
        |      + (length(text) - length(replace(text, '...', ''))) // 3
        |      AS BIGINT) AS n_sym,
        |    CAST(len(list_filter(toks, w -> regexp_matches(w, '[A-Za-z]')))
        |         AS BIGINT) AS alpha_w,
        |    CAST(len(list_intersect(
        |      list_distinct(list_transform(toks, w -> lower(w))),
        |      ['the','be','to','of','and','that','have','with'])) AS BIGINT)
        |      AS required_hits,
        |    list_filter(list_transform(string_split(text, chr(10)), l -> trim(l)),
        |                l -> l <> '') AS lines
        |  FROM b),
        |d AS (
        |  SELECT doc_id, n_words, sum_len, n_sym, alpha_w, required_hits,
        |    CAST(len(lines) AS BIGINT) AS n_lines,
        |    CAST(len(list_filter(lines, l -> left(l, 1) IN ('-', '*', '•')))
        |         AS BIGINT) AS bullet_l,
        |    CAST(len(list_filter(lines, l -> right(l, 3) = '...' OR right(l, 1) = '…'))
        |         AS BIGINT) AS ell_l,
        |    CAST(len(lines) - len(list_distinct(lines)) AS BIGINT) AS dup_l
        |  FROM c),
        |m AS (
        |  SELECT doc_id, n_words,
        |    CASE WHEN n_words = 0 THEN 0 ELSE (sum_len * 1000000) // n_words END AS mean_len_micro,
        |    CASE WHEN n_words = 0 THEN 0 ELSE (n_sym * 1000000) // n_words END AS symbol_micro,
        |    CASE WHEN n_lines = 0 THEN 0 ELSE (bullet_l * 1000000) // n_lines END AS bullet_micro,
        |    CASE WHEN n_lines = 0 THEN 0 ELSE (ell_l * 1000000) // n_lines END AS ellipsis_micro,
        |    CASE WHEN n_words = 0 THEN 0 ELSE (alpha_w * 1000000) // n_words END AS alpha_micro,
        |    required_hits,
        |    CASE WHEN n_lines = 0 THEN 0 ELSE (dup_l * 1000000) // n_lines END AS dup_line_micro
        |  FROM d)
        |SELECT doc_id, n_words, mean_len_micro, symbol_micro, bullet_micro,
        |  ellipsis_micro, alpha_micro, required_hits, dup_line_micro,
        |  (n_words BETWEEN 50 AND 100000
        |    AND mean_len_micro BETWEEN 3000000 AND 10000000
        |    AND symbol_micro <= 100000 AND bullet_micro < 900000
        |    AND ellipsis_micro < 300000 AND alpha_micro >= 800000
        |    AND required_hits >= 2 AND dup_line_micro <= 300000) AS keep_doc
        |FROM m ORDER BY doc_id""".stripMargin,

    "q103_shuffle_order" ->
      """SELECT doc_id, md5('7:' || CAST(doc_id AS VARCHAR)) AS skey
        |FROM documents WHERE doc_id % 5 = 2
        |ORDER BY skey, doc_id""".stripMargin,

    "q104_split_leakage_free" ->
      s"""${shinglesSql.replaceFirst("WITH ", "WITH RECURSIVE ")},
         |hs AS (SELECT doc_id, ${md5Hash64Sql("shingle")} AS h FROM ex),
         |slot AS (
         |  SELECT doc_id, j, MIN(xor(h, salt)) AS m
         |  FROM hs CROSS JOIN (VALUES ${xorSaltsSql(64, 42L)}) s(j, salt)
         |  GROUP BY doc_id, j),
         |sig AS (SELECT doc_id, list(m ORDER BY j) AS sig FROM slot GROUP BY doc_id),
         |banded AS (
         |  SELECT doc_id, b, md5(array_to_string(sig[b*4+1 : b*4+4], ',')) AS bucket, sig
         |  FROM sig CROSS JOIN (SELECT unnest(range(16)) AS b) bb
         |  QUALIFY COUNT(*) OVER (PARTITION BY b, bucket) <= 1000),
         |prs AS (
         |  SELECT a.doc_id AS id_a, b.doc_id AS id_b,
         |         any_value(a.sig) AS sig_a, any_value(b.sig) AS sig_b
         |  FROM banded a JOIN banded b
         |    ON a.b = b.b AND a.bucket = b.bucket AND a.doc_id < b.doc_id
         |  GROUP BY a.doc_id, b.doc_id),
         |p2 AS (
         |  SELECT id_a, id_b FROM prs
         |  WHERE len(list_filter(range(1,65), i -> sig_a[i] = sig_b[i])) / 64.0 >= 0.35),
         |eg AS (SELECT id_a AS u, id_b AS v FROM p2
         |       UNION SELECT id_b, id_a FROM p2),
         |r(u, v) AS (
         |  SELECT u, v FROM eg
         |  UNION
         |  SELECT r.u, eg.v FROM r JOIN eg ON r.v = eg.u),
         |m2 AS (SELECT u AS id, LEAST(u, MIN(v)) AS rep FROM r GROUP BY u)
         |SELECT doc_id, source,
         |  CASE WHEN b < 80 THEN 'train' WHEN b < 90 THEN 'val' ELSE 'test' END AS split
         |FROM (
         |  SELECT d.doc_id, d.source,
         |    ${md5Hash64Sql("CAST(COALESCE(m2.rep, d.doc_id) AS VARCHAR)")} % 100 AS b
         |  FROM documents d LEFT JOIN m2 ON m2.id = d.doc_id) x
         |ORDER BY doc_id""".stripMargin,

    "q100_quality_classifier" ->
      s"""WITH f AS (
         |  SELECT doc_id,
         |    CAST(len(list_filter(string_split_regex(trim(text), '\\s+'), x -> x <> '')) AS BIGINT) AS n_tokens,
         |    CAST(length(text) AS BIGINT) AS n_chars,
         |    CAST(length(text) - length(regexp_replace(text, '[[:punct:]]', '', 'g')) AS BIGINT) AS n_punct,
         |    CAST(len(list_filter($toksLower,
         |           x -> list_contains(['the','a','an','and','or','of','to','in','is','it','that','for','on','with','as','was','at','by'], x))) AS BIGINT) AS n_stopwords
         |  FROM documents),
         |g AS (
         |  SELECT doc_id, n_tokens, n_chars, n_punct, n_stopwords,
         |    CAST(-3000000 + n_tokens * 40000 + n_chars * (-100)
         |         + n_punct * (-50000) + n_stopwords * 100000 AS BIGINT) AS logit_micro
         |  FROM f)
         |SELECT doc_id, n_tokens, n_chars, n_punct, n_stopwords, logit_micro,
         |       logit_micro >= 0 AS keep
         |FROM g ORDER BY doc_id""".stripMargin,

    "q101_dedup_keep_best" ->
      s"""${shinglesSql.replaceFirst("WITH ", "WITH RECURSIVE ")},
         |hs AS (SELECT doc_id, ${md5Hash64Sql("shingle")} AS h FROM ex),
         |slot AS (
         |  SELECT doc_id, j, MIN(xor(h, salt)) AS m
         |  FROM hs CROSS JOIN (VALUES ${xorSaltsSql(64, 42L)}) s(j, salt)
         |  GROUP BY doc_id, j),
         |sig AS (SELECT doc_id, list(m ORDER BY j) AS sig FROM slot GROUP BY doc_id),
         |banded AS (
         |  SELECT doc_id, b, md5(array_to_string(sig[b*4+1 : b*4+4], ',')) AS bucket, sig
         |  FROM sig CROSS JOIN (SELECT unnest(range(16)) AS b) bb
         |  QUALIFY COUNT(*) OVER (PARTITION BY b, bucket) <= 1000),
         |prs AS (
         |  SELECT a.doc_id AS id_a, b.doc_id AS id_b,
         |         any_value(a.sig) AS sig_a, any_value(b.sig) AS sig_b
         |  FROM banded a JOIN banded b
         |    ON a.b = b.b AND a.bucket = b.bucket AND a.doc_id < b.doc_id
         |  GROUP BY a.doc_id, b.doc_id),
         |p2 AS (
         |  SELECT id_a, id_b FROM prs
         |  WHERE len(list_filter(range(1,65), i -> sig_a[i] = sig_b[i])) / 64.0 >= 0.35),
         |eg AS (SELECT id_a AS u, id_b AS v FROM p2
         |       UNION SELECT id_b, id_a FROM p2),
         |r(u, v) AS (
         |  SELECT u, v FROM eg
         |  UNION
         |  SELECT r.u, eg.v FROM r JOIN eg ON r.v = eg.u),
         |m2 AS (SELECT u AS id, LEAST(u, MIN(v)) AS rep FROM r GROUP BY u),
         |keep AS (
         |  SELECT m2.id FROM m2 JOIN documents d ON d.doc_id = m2.id
         |  QUALIFY row_number() OVER (PARTITION BY m2.rep
         |    ORDER BY d.n_chars DESC NULLS LAST, m2.id ASC) = 1)
         |SELECT d.doc_id, d.n_chars, d.source
         |FROM documents d LEFT JOIN m2 ON d.doc_id = m2.id
         |             LEFT JOIN keep k ON d.doc_id = k.id
         |WHERE m2.rep IS NULL OR k.id IS NOT NULL
         |ORDER BY d.doc_id""".stripMargin,

    // The store's shard-summed cells must land on the single-pass
    // q93 replay verbatim.
    "q132_cms_store" ->
      s"""WITH toks AS (SELECT unnest($toksLower) AS tok FROM documents),
         |cells AS (
         |  SELECT i AS row,
         |         ${md5Hash64Sql("(CAST(i AS VARCHAR) || '|' || tok)")} % 512 AS col,
         |         COUNT(*) AS c
         |  FROM toks CROSS JOIN (SELECT unnest(range(4)) AS i) ii
         |  GROUP BY 1, 2),
         |probes(term) AS (VALUES ('key'), ('agg'), ('table'), ('value'),
         |                        ('spark'), ('window'), ('zzz_absent_term')),
         |pc AS (
         |  SELECT term, i AS row,
         |         ${md5Hash64Sql("(CAST(i AS VARCHAR) || '|' || term)")} % 512 AS col
         |  FROM probes CROSS JOIN (SELECT unnest(range(4)) AS i) ii)
         |SELECT term, CAST(MIN(COALESCE(c, 0)) AS BIGINT) AS est
         |FROM pc LEFT JOIN cells USING (row, col)
         |GROUP BY term ORDER BY term""".stripMargin,

    "q93_cms_estimate" ->
      s"""WITH toks AS (SELECT unnest($toksLower) AS tok FROM documents),
         |cells AS (
         |  SELECT i AS row,
         |         ${md5Hash64Sql("(CAST(i AS VARCHAR) || '|' || tok)")} % 512 AS col,
         |         COUNT(*) AS c
         |  FROM toks CROSS JOIN (SELECT unnest(range(4)) AS i) ii
         |  GROUP BY 1, 2),
         |probes(term) AS (VALUES ('key'), ('agg'), ('table'), ('value'),
         |                        ('spark'), ('window'), ('zzz_absent_term')),
         |pc AS (
         |  SELECT term, i AS row,
         |         ${md5Hash64Sql("(CAST(i AS VARCHAR) || '|' || term)")} % 512 AS col
         |  FROM probes CROSS JOIN (SELECT unnest(range(4)) AS i) ii)
         |SELECT term, CAST(MIN(COALESCE(c, 0)) AS BIGINT) AS est
         |FROM pc LEFT JOIN cells USING (row, col)
         |GROUP BY term ORDER BY term""".stripMargin,

    // Same bottom-k-per-key membership via the window form, ordered by
    // the same double-cast hash the aggregator ranks on.
    "q91_sample_per_key" ->
      s"""SELECT source, doc_id FROM (
         |  SELECT source, doc_id,
         |    row_number() OVER (PARTITION BY source
         |      ORDER BY CAST(${md5Hash64Sql("CAST(doc_id AS VARCHAR)")} AS DOUBLE) ASC,
         |               doc_id ASC) AS rn
         |  FROM documents) x
         |WHERE rn <= 3 ORDER BY source, doc_id""".stripMargin,

    "q69_mixture_manifest" ->
      """WITH t AS (
        |  SELECT source,
        |    CAST(len(list_filter(string_split_regex(trim(text), '\s+'), x -> x <> '')) AS BIGINT) AS n_tokens
        |  FROM documents),
        |a AS (
        |  SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs,
        |    CAST(SUM(n_tokens) AS BIGINT) AS n_tokens
        |  FROM t GROUP BY source)
        |SELECT source, n_docs, n_tokens,
        |  ROUND(CAST(n_tokens AS DOUBLE) /
        |        CAST(SUM(n_tokens) OVER () AS DOUBLE), 6) AS token_share
        |FROM a ORDER BY source""".stripMargin,

    // q67's slice table joined to the token arrays, chunk pieces
    // concatenated in id order (flatten of an ORDER BY id list agg).
    "q68_pack_sequences" ->
      s"""WITH t AS (
         |  SELECT doc_id AS id,
         |    list_filter(string_split_regex(trim(text), '\\s+'), x -> x <> '') AS tk
         |  FROM documents),
         |c AS (
         |  SELECT id, tk, CAST(len(tk) AS BIGINT) AS n_tokens,
         |    CAST(COALESCE(SUM(CAST(len(tk) AS BIGINT)) OVER (ORDER BY id
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS "offset"
         |  FROM t),
         |s AS (
         |  SELECT id, tk, n_tokens, "offset",
         |    unnest(range("offset" // 512, ("offset" + n_tokens - 1) // 512 + 1)) AS chunk_id
         |  FROM c WHERE n_tokens > 0),
         |p AS (
         |  SELECT chunk_id, id,
         |    tk[GREATEST("offset", chunk_id * 512) - "offset" + 1 :
         |       LEAST("offset" + n_tokens, (chunk_id + 1) * 512) - "offset"] AS piece
         |  FROM s)
         |SELECT chunk_id,
         |  array_to_string(flatten(list(piece ORDER BY id)), chr(31)) AS tokens
         |FROM p GROUP BY chunk_id ORDER BY chunk_id""".stripMargin,

    // -p·ln(p) per token type, rounded to micro-nats, summed exactly;
    // operand order mirrored: (c / CAST(n AS DOUBLE)).
    "q74_token_entropy" ->
      s"""WITH tk AS (
         |  SELECT doc_id,
         |    list_filter(string_split_regex($normText, ' '), x -> x <> '') AS tk
         |  FROM documents),
         |n AS (SELECT doc_id, CAST(len(tk) AS BIGINT) AS n_tokens FROM tk),
         |ex AS (SELECT doc_id, unnest(tk) AS t FROM tk),
         |c AS (SELECT doc_id, t, COUNT(*) AS c FROM ex GROUP BY doc_id, t),
         |m AS (
         |  SELECT c.doc_id,
         |    CAST(round(1e6 * -((c.c / CAST(n.n_tokens AS DOUBLE)) *
         |      ln(c.c / CAST(n.n_tokens AS DOUBLE)))) AS BIGINT) AS mm
         |  FROM c JOIN n ON c.doc_id = n.doc_id),
         |s AS (SELECT doc_id, CAST(SUM(mm) AS BIGINT) AS e FROM m GROUP BY doc_id)
         |SELECT n.doc_id, n.n_tokens, COALESCE(s.e, 0) AS entropy_micro
         |FROM n LEFT JOIN s ON n.doc_id = s.doc_id
         |ORDER BY n.doc_id""".stripMargin,

    // The oracle refits the add-one bigram LM from scratch: strict
    // adjacent bigrams (none for <2 tokens), context = first word,
    // V = distinct token types; per-occurrence micro-nat rounding
    // mirrors lmScores' ln((c2 + 1.0) / (c1 + V)) operand order.
    "q79_lm_score" ->
      s"""WITH tk AS (
         |  SELECT doc_id,
         |    list_filter(string_split_regex($normText, ' '), x -> x <> '') AS tk
         |  FROM documents),
         |bg AS (
         |  SELECT doc_id,
         |    CASE WHEN len(tk) < 2 THEN CAST([] AS VARCHAR[])
         |      ELSE list_transform(range(1, len(tk)), i -> tk[i] || ' ' || tk[i+1])
         |      END AS bg
         |  FROM tk),
         |n AS (SELECT doc_id, CAST(len(bg) AS BIGINT) AS n_bigrams FROM bg),
         |ex AS (SELECT doc_id, unnest(bg) AS b FROM bg),
         |c2 AS (SELECT b, COUNT(*) AS c2 FROM ex GROUP BY b),
         |c1 AS (SELECT split_part(b, ' ', 1) AS w1, COUNT(*) AS c1 FROM ex GROUP BY 1),
         |v AS (SELECT CAST(COUNT(DISTINCT t) AS DOUBLE) AS v
         |      FROM (SELECT unnest(tk) AS t FROM tk)),
         |m AS (
         |  SELECT ex.doc_id,
         |    CAST(round(1e6 * ln((c2.c2 + 1.0) / (c1.c1 + v.v))) AS BIGINT) AS mm
         |  FROM ex JOIN c2 ON ex.b = c2.b
         |  JOIN c1 ON split_part(ex.b, ' ', 1) = c1.w1 CROSS JOIN v),
         |s AS (SELECT doc_id, CAST(SUM(mm) AS BIGINT) AS lp FROM m GROUP BY doc_id)
         |SELECT n.doc_id, n.n_bigrams, COALESCE(s.lp, 0) AS logprob_micro
         |FROM n LEFT JOIN s ON n.doc_id = s.doc_id
         |ORDER BY n.doc_id""".stripMargin,

    // The same bit interleave, generated term-for-term: bit b of
    // column i lands at output bit b*2+i.
    "q81_zorder_key" -> {
      val z = (for (b <- 0 until 16; (c, i) <- Seq("o_custkey", "o_orderkey").zipWithIndex)
        yield s"(((CAST($c AS BIGINT) >> $b) & 1) << ${b * 2 + i})")
        .mkString(" | ")
      s"""SELECT o_orderkey, $z AS z
         |FROM orders ORDER BY o_orderkey""".stripMargin
    },

    // lag-change flag (IS DISTINCT FROM = the null-safe <=> test),
    // running SUM = version, MIN(date) per version, lead() closes.
    "q80_scd2_history" ->
      """WITH snap AS (
        |  SELECT o_custkey, o_orderdate, MAX(o_orderstatus) AS status
        |  FROM orders GROUP BY 1, 2),
        |f AS (
        |  SELECT o_custkey, o_orderdate, status,
        |    CASE WHEN status IS DISTINCT FROM lag(status) OVER w
        |      THEN 1 ELSE 0 END AS chg
        |  FROM snap WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate)),
        |v AS (
        |  SELECT o_custkey, o_orderdate, status,
        |    CAST(SUM(chg) OVER (PARTITION BY o_custkey ORDER BY o_orderdate
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS ver
        |  FROM f),
        |g AS (
        |  SELECT o_custkey, status, ver, MIN(o_orderdate) AS valid_from
        |  FROM v GROUP BY 1, 2, 3)
        |SELECT o_custkey, status, valid_from,
        |  lead(valid_from) OVER (PARTITION BY o_custkey ORDER BY valid_from)
        |    AS valid_to
        |FROM g ORDER BY o_custkey, valid_from""".stripMargin,

    // Same operation order as TextAnalytics.bm25Scores, term by term:
    // idf = ln(1 + (N - df + 0.5)/(df + 0.5)); s = idf * ((tf*(k1+1))
    // / (tf + k1*(1 - b + b*(dl/avgdl)))); micro = round(1e6*s).
    "q64_bm25" ->
      s"""WITH tk AS (
         |  SELECT doc_id,
         |    list_filter(string_split_regex($normText, ' '), x -> x <> '') AS tk
         |  FROM documents),
         |st AS (SELECT doc_id, CAST(len(tk) AS BIGINT) AS dl FROM tk),
         |tot AS (SELECT COUNT(*) AS n, CAST(SUM(dl) AS DOUBLE) / COUNT(*) AS avgdl
         |        FROM st),
         |ex AS (SELECT doc_id, unnest(tk) AS term FROM tk),
         |tf AS (
         |  SELECT doc_id, term, COUNT(*) AS tf FROM ex
         |  WHERE term IN ('spark', 'join', 'vector', 'stream')
         |  GROUP BY doc_id, term),
         |dfreq AS (SELECT term, COUNT(*) AS df FROM tf GROUP BY term),
         |sc AS (
         |  SELECT tf.doc_id,
         |    CAST(round(1e6 * (ln(1.0 + (t.n - d.df + 0.5) / (d.df + 0.5)) *
         |      ((tf.tf * (1.2 + 1.0)) /
         |       (tf.tf + 1.2 * ((1.0 - 0.75) + 0.75 * (s.dl / t.avgdl))))))
         |      AS BIGINT) AS m
         |  FROM tf JOIN dfreq d ON tf.term = d.term
         |  JOIN st s ON tf.doc_id = s.doc_id CROSS JOIN tot t),
         |agg AS (SELECT doc_id, CAST(SUM(m) AS BIGINT) AS score
         |        FROM sc GROUP BY doc_id)
         |SELECT st.doc_id, st.dl AS n_tokens,
         |  COALESCE(agg.score, 0) AS score_micro
         |FROM st LEFT JOIN agg ON st.doc_id = agg.doc_id
         |ORDER BY st.doc_id""".stripMargin,

    // Ground truth is the single global running-sum window DuckDB can
    // afford at oracle scale; the Spark side must reproduce it from
    // the distributed bucketed form value-for-value.
    "q62_pack_chunks" ->
      """WITH t AS (
        |  SELECT doc_id AS id,
        |    CAST(len(list_filter(string_split_regex(trim(text), '\s+'), x -> x <> '')) AS BIGINT) AS n_tokens
        |  FROM documents),
        |c AS (
        |  SELECT id, n_tokens,
        |    CAST(COALESCE(SUM(n_tokens) OVER (ORDER BY id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS "offset"
        |  FROM t)
        |SELECT id, n_tokens, "offset",
        |  CAST(COALESCE(CASE WHEN n_tokens > 0 THEN "offset" // 512 END, -1)
        |    AS BIGINT) AS start_chunk,
        |  CAST(COALESCE(CASE WHEN n_tokens > 0 THEN ("offset" + n_tokens - 1) // 512 END, -1)
        |    AS BIGINT) AS end_chunk
        |FROM c ORDER BY id""".stripMargin,

    "q200_kanonymity" ->
      """SELECT CAST(c_nationkey AS BIGINT) AS nat, c_mktsegment AS seg,
        |  CAST(COUNT(*) AS BIGINT) AS n,
        |  CAST(COUNT(DISTINCT CAST(round(c_acctbal * 100) AS BIGINT))
        |    AS BIGINT) AS n_sensitive,
        |  (COUNT(*) < 50) AS risky_k,
        |  (COUNT(DISTINCT CAST(round(c_acctbal * 100) AS BIGINT)) < 20)
        |    AS risky_l
        |FROM customer GROUP BY 1, 2 ORDER BY nat, seg""".stripMargin,

    // Sweep line replayed as one global running sum per key; the
    // per-timestamp NET collapse encodes ends-before-starts at equal
    // instants (half-open intervals) on both engines.
    "q201_max_concurrent" ->
      """WITH iv AS (
        |  SELECT event_type AS key, epoch_us(ts) AS s,
        |    epoch_us(ts) + ((CAST(round(value * 1000) AS BIGINT) % 3600)
        |      + 60) * 1000000 AS e
        |  FROM events),
        |d AS (SELECT key, s AS t, 1 AS dl FROM iv
        |      UNION ALL SELECT key, e, -1 FROM iv),
        |p AS (SELECT key, t, SUM(dl) AS net FROM d GROUP BY 1, 2),
        |r AS (SELECT key,
        |        SUM(net) OVER (PARTITION BY key ORDER BY t) AS run
        |      FROM p),
        |n AS (SELECT key, CAST(COUNT(*) AS BIGINT) AS n_intervals
        |      FROM iv GROUP BY 1),
        |m AS (SELECT key, CAST(GREATEST(MAX(run), 0) AS BIGINT)
        |        AS max_concurrent FROM r GROUP BY 1)
        |SELECT key, n_intervals, max_concurrent
        |FROM n JOIN m USING (key) ORDER BY key""".stripMargin,

    // Integer CUSUM: S_i = P_i·D − i·T through HUGEINT, argmax with
    // the earliest-day tie break.
    "q202_cusum" ->
      """WITH daily AS (
        |  SELECT event_type AS key, CAST(ts AS DATE) AS d,
        |    CAST(COUNT(*) AS BIGINT) AS c
        |  FROM events GROUP BY 1, 2),
        |s AS (SELECT key, d,
        |        ROW_NUMBER() OVER w AS i,
        |        SUM(c) OVER w AS p,
        |        COUNT(*) OVER (PARTITION BY key) AS nd,
        |        SUM(c) OVER (PARTITION BY key) AS t
        |      FROM daily
        |      WINDOW w AS (PARTITION BY key ORDER BY d)),
        |sc AS (SELECT key, nd, t, d,
        |         abs(CAST(p AS HUGEINT) * nd - CAST(i AS HUGEINT) * t) AS sa
        |       FROM s)
        |SELECT key, CAST(nd AS BIGINT) AS n_days, CAST(t AS BIGINT) AS total,
        |  d AS cp_date, CAST(sa AS BIGINT) AS s_abs_max
        |FROM sc
        |QUALIFY ROW_NUMBER() OVER (PARTITION BY key ORDER BY sa DESC, d ASC) = 1
        |ORDER BY key""".stripMargin,

    // Pairwise-slope floor over IEEE doubles (exact-integer inputs →
    // identical quotients), lower-median pick in pure integer rank
    // arithmetic.
    "q203_theilsen" ->
      """WITH daily AS (
        |  SELECT event_type AS key,
        |    CAST(CAST(ts AS DATE) - DATE '1970-01-01' AS BIGINT) AS d,
        |    CAST(COUNT(*) AS BIGINT) AS v
        |  FROM events GROUP BY 1, 2),
        |nd AS (SELECT key, CAST(COUNT(*) AS BIGINT) AS n_days
        |       FROM daily GROUP BY 1),
        |pr AS (SELECT a.key,
        |         CAST(FLOOR(CAST(b.v - a.v AS DOUBLE) * 1e6
        |           / CAST(b.d - a.d AS DOUBLE)) AS BIGINT) AS slope_micro
        |       FROM daily a JOIN daily b
        |         ON a.key = b.key AND a.d < b.d),
        |med AS (SELECT key,
        |          CAST(COUNT(*) OVER (PARTITION BY key) AS BIGINT) AS n_pairs,
        |          slope_micro,
        |          ROW_NUMBER() OVER (PARTITION BY key ORDER BY slope_micro) AS rn
        |        FROM pr)
        |SELECT key, n_days, n_pairs, slope_micro
        |FROM nd JOIN med USING (key)
        |WHERE rn = (n_pairs + 1) // 2 ORDER BY key""".stripMargin,

    // Doubled average ranks (2o + c + 1 — integers even under ties),
    // Pearson over them with HUGEINT moments and the fixed float
    // order; affine invariance makes it exactly Spearman's rho.
    "q204_spearman" ->
      """WITH rows_ AS (
        |  SELECT source AS key, CAST(n_chars AS BIGINT) AS xv,
        |    CAST(len(list_filter(string_split_regex(trim(text), '\s+'),
        |      z -> z <> '')) AS BIGINT) AS yv
        |  FROM documents),
        |gx AS (SELECT key, xv, CAST(COUNT(*) AS BIGINT) AS c
        |       FROM rows_ GROUP BY 1, 2),
        |ox AS (SELECT key, xv,
        |         2 * COALESCE(SUM(c) OVER (PARTITION BY key ORDER BY xv
        |           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
        |           + c + 1 AS rx
        |       FROM gx),
        |gy AS (SELECT key, yv, CAST(COUNT(*) AS BIGINT) AS c
        |       FROM rows_ GROUP BY 1, 2),
        |oy AS (SELECT key, yv,
        |         2 * COALESCE(SUM(c) OVER (PARTITION BY key ORDER BY yv
        |           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
        |           + c + 1 AS ry
        |       FROM gy),
        |j AS (SELECT r.key, ox.rx, oy.ry
        |      FROM rows_ r
        |      JOIN ox ON r.key = ox.key AND r.xv = ox.xv
        |      JOIN oy ON r.key = oy.key AND r.yv = oy.yv),
        |m AS (SELECT key, CAST(COUNT(*) AS BIGINT) AS n,
        |        SUM(CAST(rx AS HUGEINT)) AS sx, SUM(CAST(ry AS HUGEINT)) AS sy,
        |        SUM(CAST(rx AS HUGEINT) * ry) AS sxy,
        |        SUM(CAST(rx AS HUGEINT) * rx) AS sxx,
        |        SUM(CAST(ry AS HUGEINT) * ry) AS syy
        |      FROM j GROUP BY 1),
        |f AS (SELECT key, n,
        |        CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE)
        |          / CAST(n AS DOUBLE) AS cov,
        |        CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)
        |          / CAST(n AS DOUBLE) AS vx,
        |        CAST(syy AS DOUBLE) - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE)
        |          / CAST(n AS DOUBLE) AS vy
        |      FROM m)
        |SELECT key, n,
        |  CASE WHEN n >= 2 AND vx > 0 AND vy > 0
        |    THEN CAST(round(cov / sqrt(vx * vy) * 1e6) AS BIGINT)
        |  END AS rho_micro
        |FROM f ORDER BY key""".stripMargin,

    // q193's integer binning, then the PAVA minimax closed form over
    // bounded interval joins — identical IEEE interval averages →
    // identical monotone fit.
    "q205_isotonic" ->
      """WITH ev AS (
        |  SELECT CAST(round(value * 1000) AS BIGINT) AS v,
        |    (event_type = 'purchase') AS y
        |  FROM events WHERE value IS NOT NULL),
        |b AS (SELECT LEAST(GREATEST((v * 10) // 100000, 0), 9) AS bin,
        |        CAST(y AS BIGINT) AS y
        |      FROM ev),
        |c AS (SELECT CAST(bin AS BIGINT) AS bin,
        |        CAST(COUNT(*) AS BIGINT) AS n, CAST(SUM(y) AS BIGINT) AS pos
        |      FROM b GROUP BY 1),
        |p AS (SELECT bin, n, pos, SUM(n) OVER (ORDER BY bin) AS pn,
        |        SUM(pos) OVER (ORDER BY bin) AS pp
        |      FROM c),
        |ivl AS (SELECT j.bin AS j, k.bin AS k,
        |          CAST(k.pp - (j.pp - j.pos) AS DOUBLE)
        |            / CAST(k.pn - (j.pn - j.n) AS DOUBLE) AS avg_jk
        |        FROM p j JOIN p k ON j.bin <= k.bin),
        |pi AS (SELECT c.bin AS i, ivl.j, MIN(avg_jk) AS mn
        |       FROM c JOIN ivl ON ivl.j <= c.bin AND c.bin <= ivl.k
        |       GROUP BY 1, 2),
        |iso AS (SELECT i, MAX(mn) AS iso FROM pi GROUP BY 1)
        |SELECT c.bin, CAST(c.bin * 10000 AS BIGINT) AS lo_milli,
        |  CAST((c.bin + 1) * 10000 AS BIGINT) AS hi_milli, n, pos,
        |  CAST(round(iso * 1e6) AS BIGINT) AS iso_micro
        |FROM c JOIN iso ON iso.i = c.bin ORDER BY bin""".stripMargin,

    // Seeded md5₆₀ noise in [−50, 50] (mod 101 on a non-negative
    // hash, so % == pmod), non-negativity clamp on the release.
    "q206_dp_counts" ->
      s"""SELECT source AS key, CAST(COUNT(*) AS BIGINT) AS n,
         |  CAST(${md5Hash64Sql("'11:' || source")} % 101 - 50 AS BIGINT)
         |    AS noise,
         |  CAST(GREATEST(COUNT(*)
         |    + (${md5Hash64Sql("'11:' || source")} % 101 - 50), 0) AS BIGINT)
         |    AS n_noisy
         |FROM documents GROUP BY source ORDER BY key""".stripMargin,

    // The identical rule chain (ends_with / left — no regex captures)
    // replayed in SQL; edge-punctuation strip is the same RE2-safe
    // character-class pattern with the global flag.
    "q207_stem_terms" ->
      """WITH w0 AS (
        |  SELECT unnest(list_filter(string_split_regex(trim(lower(text)),
        |    '\s+'), x -> x <> '')) AS w
        |  FROM documents),
        |w1 AS (SELECT regexp_replace(w, '^[^a-z0-9]+|[^a-z0-9]+$', '', 'g')
        |         AS w FROM w0),
        |w2 AS (SELECT CASE
        |         WHEN ends_with(w, 'sses') THEN left(w, length(w) - 2)
        |         WHEN ends_with(w, 'ies') THEN left(w, length(w) - 2)
        |         WHEN ends_with(w, 'ss') THEN w
        |         WHEN ends_with(w, 's') AND length(w) >= 4
        |           THEN left(w, length(w) - 1)
        |         ELSE w END AS w
        |       FROM w1 WHERE w <> ''),
        |w3 AS (SELECT CASE
        |         WHEN ends_with(w, 'ing') AND length(w) >= 6
        |           THEN left(w, length(w) - 3)
        |         WHEN ends_with(w, 'ed') AND length(w) >= 5
        |           THEN left(w, length(w) - 2)
        |         WHEN ends_with(w, 'ly') AND length(w) >= 5
        |           THEN left(w, length(w) - 2)
        |         ELSE w END AS stem
        |       FROM w2)
        |SELECT stem, CAST(COUNT(*) AS BIGINT) AS n
        |FROM w3 GROUP BY 1 ORDER BY n DESC, stem ASC LIMIT 50""".stripMargin,

    // Span collapse: (a before b for a user) ⇔ min_ts(a) < max_ts(b) —
    // the T×T-per-user join, support = distinct users by construction.
    "q208_precedence" ->
      """WITH sp AS (
        |  SELECT user_id AS u, event_type AS t,
        |    MIN(epoch_us(ts)) AS lo, MAX(epoch_us(ts)) AS hi
        |  FROM events WHERE event_type IS NOT NULL AND ts IS NOT NULL
        |  GROUP BY 1, 2)
        |SELECT a.t AS t1, b.t AS t2, CAST(COUNT(*) AS BIGINT) AS support
        |FROM sp a JOIN sp b ON a.u = b.u AND a.t <> b.t AND a.lo < b.hi
        |GROUP BY 1, 2 HAVING COUNT(*) >= 5 ORDER BY t1, t2""".stripMargin,

    // 32-bit words in BIGINT lanes: no sign-bit shift on either
    // engine; popcount after the OR.
    "q209_bitmap_index" ->
      """WITH w AS (
        |  SELECT CAST(o_orderstatus AS VARCHAR) AS value,
        |    CAST(o_orderkey // 32 AS BIGINT) AS word_idx,
        |    CAST(bit_or(CAST(1 AS BIGINT)
        |      << CAST(o_orderkey % 32 AS INTEGER)) AS BIGINT) AS word
        |  FROM orders
        |  WHERE o_orderkey >= 0 AND o_orderstatus IS NOT NULL
        |  GROUP BY 1, 2)
        |SELECT value, word_idx, word, CAST(bit_count(word) AS BIGINT) AS bits
        |FROM w ORDER BY value, word_idx""".stripMargin,

    // gapFill's global-span zero-filled grid, then the five trailing
    // moment windows and the trendPerKey closed form in the same
    // float order.
    "q210_rolling_slope" ->
      """WITH daily AS (
        |  SELECT o_orderpriority AS grp, CAST(o_orderdate AS DATE) AS d,
        |    CAST(COUNT(*) AS BIGINT) AS n
        |  FROM orders GROUP BY 1, 2),
        |span AS (SELECT MIN(d) AS mn, MAX(d) AS mx FROM daily),
        |keys AS (SELECT DISTINCT grp FROM daily),
        |grid AS (SELECT grp, CAST(unnest(generate_series(mn, mx,
        |           INTERVAL 1 DAY)) AS DATE) AS d
        |         FROM keys CROSS JOIN span),
        |g AS (SELECT grid.grp, grid.d, COALESCE(daily.n, 0) AS n,
        |        CAST(grid.d - DATE '1970-01-01' AS BIGINT) AS x
        |      FROM grid LEFT JOIN daily
        |        ON daily.grp = grid.grp AND daily.d = grid.d),
        |w AS (SELECT grp, d, n,
        |        COUNT(*) OVER win AS c,
        |        SUM(x) OVER win AS sx, SUM(n) OVER win AS sy,
        |        SUM(CAST(x AS HUGEINT) * n) OVER win AS sxy,
        |        SUM(CAST(x AS HUGEINT) * x) OVER win AS sxx
        |      FROM g
        |      WINDOW win AS (PARTITION BY grp ORDER BY d
        |        ROWS BETWEEN 6 PRECEDING AND CURRENT ROW))
        |SELECT grp, d, n,
        |  CAST(round((CAST(c AS DOUBLE) * CAST(sxy AS DOUBLE)
        |      - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
        |    / (CAST(c AS DOUBLE) * CAST(sxx AS DOUBLE)
        |      - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)) * 1e6) AS BIGINT)
        |    AS slope_micro
        |FROM w
        |WHERE c >= 2 AND CAST(c AS DOUBLE) * CAST(sxx AS DOUBLE)
        |  - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE) > 0
        |ORDER BY grp, d""".stripMargin,

    // GROUPING(a, b) carries the same MSB-first bitmask as Spark's
    // grouping_id().
    "q211_cube" ->
      """SELECT l_returnflag, l_linestatus,
        |  CAST(GROUPING(l_returnflag, l_linestatus) AS BIGINT) AS gid,
        |  CAST(COUNT(*) AS BIGINT) AS n,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(28,4))) AS DOUBLE) AS sum_qty
        |FROM lineitem GROUP BY CUBE (l_returnflag, l_linestatus)
        |ORDER BY l_returnflag ASC NULLS FIRST,
        |  l_linestatus ASC NULLS FIRST, gid ASC""".stripMargin,

    // Pairwise sign sum in pure integers; tau through round (not
    // integer div — S goes negative).
    "q212_mann_kendall" ->
      """WITH daily AS (
        |  SELECT event_type AS key,
        |    CAST(CAST(ts AS DATE) - DATE '1970-01-01' AS BIGINT) AS d,
        |    CAST(COUNT(*) AS BIGINT) AS v
        |  FROM events GROUP BY 1, 2),
        |nd AS (SELECT key, CAST(COUNT(*) AS BIGINT) AS n_days
        |       FROM daily GROUP BY 1),
        |agg AS (SELECT a.key, CAST(COUNT(*) AS BIGINT) AS n_pairs,
        |          CAST(SUM(CAST(sign(b.v - a.v) AS BIGINT)) AS BIGINT)
        |            AS s_stat
        |        FROM daily a JOIN daily b
        |          ON a.key = b.key AND a.d < b.d
        |        GROUP BY 1)
        |SELECT key, n_days, n_pairs, s_stat,
        |  CAST(round(CAST(s_stat AS DOUBLE) / CAST(n_pairs AS DOUBLE) * 1e6)
        |    AS BIGINT) AS tau_micro
        |FROM nd JOIN agg USING (key) ORDER BY key""".stripMargin,

    // (epoch_day + 4) mod 7 on both engines — no dayofweek()
    // convention ever enters; micro mean by non-negative integer
    // division, index in the same fixed float order.
    "q213_seasonal" ->
      """WITH daily AS (
        |  SELECT event_type AS key,
        |    CAST(CAST(ts AS DATE) - DATE '1970-01-01' AS BIGINT) AS d,
        |    CAST(COUNT(*) AS BIGINT) AS v
        |  FROM events GROUP BY 1, 2),
        |dw AS (SELECT key, (d + 4) % 7 AS dow, v FROM daily),
        |bd AS (SELECT key, dow, CAST(COUNT(*) AS BIGINT) AS n_days,
        |         CAST(SUM(v) AS BIGINT) AS sd
        |       FROM dw GROUP BY 1, 2),
        |bk AS (SELECT key, CAST(COUNT(*) AS BIGINT) AS n,
        |         CAST(SUM(v) AS BIGINT) AS s
        |       FROM dw GROUP BY 1)
        |SELECT key, CAST(dow AS BIGINT) AS dow, n_days,
        |  CAST((sd * 1000000) // n_days AS BIGINT) AS mean_micro,
        |  CASE WHEN s > 0 THEN
        |    CAST(round((CAST(sd AS DOUBLE) / CAST(n_days AS DOUBLE))
        |      / (CAST(s AS DOUBLE) / CAST(n AS DOUBLE)) * 1e6) AS BIGINT)
        |  END AS index_micro
        |FROM bd JOIN bk USING (key) ORDER BY key, dow""".stripMargin,

    // The identical ⌊CDF·2⁶⁰⌋ integer thresholds (rendered from the
    // same Scala constants) against the same md5₆₀ draw — both
    // engines deal identical Poisson weights, so the replicate means
    // replay exactly.
    "q214_bootstrap" -> {
      val t = graft.operators.Stats.poissonThresholds
      val h = md5Hash64Sql(
        "'5:' || CAST(b AS VARCHAR) || ':' || CAST(event_id AS VARCHAR)")
      s"""WITH r AS (
         |  SELECT event_type AS key, event_id,
         |    CAST(round(value * 1000) AS BIGINT) AS v, b
         |  FROM events CROSS JOIN (SELECT unnest(range(16)) AS b) reps),
         |w AS (SELECT key, v, b,
         |        CASE WHEN $h < ${t(0)} THEN 0
         |             WHEN $h < ${t(1)} THEN 1
         |             WHEN $h < ${t(2)} THEN 2
         |             WHEN $h < ${t(3)} THEN 3
         |             WHEN $h < ${t(4)} THEN 4
         |             ELSE 5 END AS w
         |      FROM r),
         |m AS (SELECT key, CAST(b AS BIGINT) AS b,
         |        CAST(SUM(w) AS BIGINT) AS n_eff,
         |        SUM(CAST(w AS HUGEINT) * v) AS ws
         |      FROM w GROUP BY 1, 2)
         |SELECT key, b, n_eff,
         |  CASE WHEN n_eff > 0 THEN
         |    CAST(round(CAST(ws AS DOUBLE) / CAST(n_eff AS DOUBLE) * 1000)
         |      AS BIGINT)
         |  END AS mean_micro
         |FROM m ORDER BY key, b""".stripMargin
    },

    "q238_candidate_keys" ->
      """WITH a AS (SELECT CAST(COUNT(*) AS BIGINT) AS n,
        |  CAST(COUNT(DISTINCT o_orderkey) AS BIGINT) AS d0,
        |  CAST(SUM(CASE WHEN o_orderkey IS NULL THEN 1 ELSE 0 END)
        |    AS BIGINT) AS m0,
        |  CAST(COUNT(DISTINCT o_custkey) AS BIGINT) AS d1,
        |  CAST(SUM(CASE WHEN o_custkey IS NULL THEN 1 ELSE 0 END)
        |    AS BIGINT) AS m1,
        |  CAST(COUNT(DISTINCT o_orderstatus) AS BIGINT) AS d2,
        |  CAST(SUM(CASE WHEN o_orderstatus IS NULL THEN 1 ELSE 0 END)
        |    AS BIGINT) AS m2,
        |  CAST(COUNT(DISTINCT o_orderdate) AS BIGINT) AS d3,
        |  CAST(SUM(CASE WHEN o_orderdate IS NULL THEN 1 ELSE 0 END)
        |    AS BIGINT) AS m3
        |FROM orders)
        |SELECT "column", n, n_distinct, n_nulls,
        |  (n_distinct = n AND n_nulls = 0) AS is_key
        |FROM (
        |  SELECT 'o_orderkey' AS "column", n, d0 AS n_distinct,
        |    m0 AS n_nulls FROM a
        |  UNION ALL SELECT 'o_custkey', n, d1, m1 FROM a
        |  UNION ALL SELECT 'o_orderstatus', n, d2, m2 FROM a
        |  UNION ALL SELECT 'o_orderdate', n, d3, m3 FROM a)""".stripMargin,

    "q239_equidepth" ->
      """WITH r AS (SELECT o_orderpriority AS key,
        |             CAST(round(o_totalprice * 100) AS BIGINT) AS x
        |           FROM orders),
        |g AS (SELECT key, x, CAST(COUNT(*) AS BIGINT) AS c
        |      FROM r GROUP BY 1, 2),
        |cum AS (SELECT key, x, c,
        |          SUM(c) OVER (PARTITION BY key ORDER BY x) AS cum,
        |          SUM(c) OVER (PARTITION BY key) AS n
        |        FROM g),
        |ps AS (SELECT unnest([250000, 500000, 750000, 1000000]) AS p_micro)
        |SELECT key, CAST(p_micro AS BIGINT) AS p_micro,
        |  CAST(x AS BIGINT) AS value
        |FROM cum CROSS JOIN ps
        |WHERE cum - c < GREATEST((p_micro * n + 999999) // 1000000, 1)
        |  AND GREATEST((p_micro * n + 999999) // 1000000, 1) <= cum
        |ORDER BY key, p_micro""".stripMargin,

    // Null-safe tuple distincts via row(); the lattice prune replays
    // as CASE logic: a pair containing a single-column key carries the
    // -1 sentinels and is_key TRUE / is_minimal FALSE by implication.
    "q240_composite_keys" ->
      """WITH s AS (SELECT CAST(COUNT(*) AS BIGINT) AS n,
        |  CAST(COUNT(DISTINCT row(o_custkey)) AS BIGINT) AS dc,
        |  CAST(COALESCE(SUM(CASE WHEN o_custkey IS NULL THEN 1 ELSE 0 END), 0) AS BIGINT) AS mc,
        |  CAST(COUNT(DISTINCT row(o_orderdate)) AS BIGINT) AS dd,
        |  CAST(COALESCE(SUM(CASE WHEN o_orderdate IS NULL THEN 1 ELSE 0 END), 0) AS BIGINT) AS md,
        |  CAST(COUNT(DISTINCT row(o_orderkey)) AS BIGINT) AS dk,
        |  CAST(COALESCE(SUM(CASE WHEN o_orderkey IS NULL THEN 1 ELSE 0 END), 0) AS BIGINT) AS mk,
        |  CAST(COUNT(DISTINCT row(o_totalprice)) AS BIGINT) AS dt,
        |  CAST(COALESCE(SUM(CASE WHEN o_totalprice IS NULL THEN 1 ELSE 0 END), 0) AS BIGINT) AS mt,
        |  CAST(COUNT(DISTINCT row(o_custkey, o_orderdate)) AS BIGINT) AS dcd,
        |  CAST(COALESCE(SUM(CASE WHEN o_custkey IS NULL OR o_orderdate IS NULL THEN 1 ELSE 0 END), 0) AS BIGINT) AS mcd,
        |  CAST(COUNT(DISTINCT row(o_custkey, o_totalprice)) AS BIGINT) AS dct,
        |  CAST(COALESCE(SUM(CASE WHEN o_custkey IS NULL OR o_totalprice IS NULL THEN 1 ELSE 0 END), 0) AS BIGINT) AS mct,
        |  CAST(COUNT(DISTINCT row(o_orderdate, o_totalprice)) AS BIGINT) AS ddt,
        |  CAST(COALESCE(SUM(CASE WHEN o_orderdate IS NULL OR o_totalprice IS NULL THEN 1 ELSE 0 END), 0) AS BIGINT) AS mdt,
        |  CAST(COUNT(DISTINCT row(o_custkey, o_orderkey)) AS BIGINT) AS dck,
        |  CAST(COALESCE(SUM(CASE WHEN o_custkey IS NULL OR o_orderkey IS NULL THEN 1 ELSE 0 END), 0) AS BIGINT) AS mck,
        |  CAST(COUNT(DISTINCT row(o_orderdate, o_orderkey)) AS BIGINT) AS ddk,
        |  CAST(COALESCE(SUM(CASE WHEN o_orderdate IS NULL OR o_orderkey IS NULL THEN 1 ELSE 0 END), 0) AS BIGINT) AS mdk,
        |  CAST(COUNT(DISTINCT row(o_orderkey, o_totalprice)) AS BIGINT) AS dkt,
        |  CAST(COALESCE(SUM(CASE WHEN o_orderkey IS NULL OR o_totalprice IS NULL THEN 1 ELSE 0 END), 0) AS BIGINT) AS mkt
        |FROM orders)
        |SELECT columns, CAST(arity AS BIGINT) AS arity, n, n_distinct,
        |  n_nulls, is_key, is_minimal_key
        |FROM (
        |  SELECT 'o_custkey' AS columns, 1 AS arity, n, dc AS n_distinct,
        |    mc AS n_nulls, dc = n AS is_key, dc = n AS is_minimal_key FROM s
        |  UNION ALL SELECT 'o_orderdate', 1, n, dd, md, dd = n, dd = n FROM s
        |  UNION ALL SELECT 'o_orderkey', 1, n, dk, mk, dk = n, dk = n FROM s
        |  UNION ALL SELECT 'o_totalprice', 1, n, dt, mt, dt = n, dt = n FROM s
        |  UNION ALL SELECT 'o_custkey,o_orderdate', 2, n,
        |    CASE WHEN dc = n OR dd = n THEN -1 ELSE dcd END,
        |    CASE WHEN dc = n OR dd = n THEN -1 ELSE mcd END,
        |    CASE WHEN dc = n OR dd = n THEN TRUE ELSE dcd = n END,
        |    CASE WHEN dc = n OR dd = n THEN FALSE ELSE dcd = n END FROM s
        |  UNION ALL SELECT 'o_custkey,o_orderkey', 2, n,
        |    CASE WHEN dc = n OR dk = n THEN -1 ELSE dck END,
        |    CASE WHEN dc = n OR dk = n THEN -1 ELSE mck END,
        |    CASE WHEN dc = n OR dk = n THEN TRUE ELSE dck = n END,
        |    CASE WHEN dc = n OR dk = n THEN FALSE ELSE dck = n END FROM s
        |  UNION ALL SELECT 'o_custkey,o_totalprice', 2, n,
        |    CASE WHEN dc = n OR dt = n THEN -1 ELSE dct END,
        |    CASE WHEN dc = n OR dt = n THEN -1 ELSE mct END,
        |    CASE WHEN dc = n OR dt = n THEN TRUE ELSE dct = n END,
        |    CASE WHEN dc = n OR dt = n THEN FALSE ELSE dct = n END FROM s
        |  UNION ALL SELECT 'o_orderdate,o_orderkey', 2, n,
        |    CASE WHEN dd = n OR dk = n THEN -1 ELSE ddk END,
        |    CASE WHEN dd = n OR dk = n THEN -1 ELSE mdk END,
        |    CASE WHEN dd = n OR dk = n THEN TRUE ELSE ddk = n END,
        |    CASE WHEN dd = n OR dk = n THEN FALSE ELSE ddk = n END FROM s
        |  UNION ALL SELECT 'o_orderdate,o_totalprice', 2, n,
        |    CASE WHEN dd = n OR dt = n THEN -1 ELSE ddt END,
        |    CASE WHEN dd = n OR dt = n THEN -1 ELSE mdt END,
        |    CASE WHEN dd = n OR dt = n THEN TRUE ELSE ddt = n END,
        |    CASE WHEN dd = n OR dt = n THEN FALSE ELSE ddt = n END FROM s
        |  UNION ALL SELECT 'o_orderkey,o_totalprice', 2, n,
        |    CASE WHEN dk = n OR dt = n THEN -1 ELSE dkt END,
        |    CASE WHEN dk = n OR dt = n THEN -1 ELSE mkt END,
        |    CASE WHEN dk = n OR dt = n THEN TRUE ELSE dkt = n END,
        |    CASE WHEN dk = n OR dt = n THEN FALSE ELSE dkt = n END FROM s)
        |ORDER BY arity, columns""".stripMargin,

    // Quarter ends via month-series + last_day, names via strftime.
    "q243_fetch_plan" ->
      """WITH m AS (SELECT unnest(generate_series(DATE '2001-01-01',
        |             DATE '2005-12-31', INTERVAL 1 MONTH)) AS m),
        |q AS (SELECT DISTINCT last_day(m) AS period_end FROM m
        |      WHERE month(last_day(m)) IN (3, 6, 9, 12)
        |        AND last_day(m) >= DATE '2001-01-01'
        |        AND last_day(m) <= DATE '2005-12-31')
        |SELECT period_end,
        |  strftime(period_end, '%Y%m%d') AS period,
        |  'FFIEC CDR Call Bulk XBRL ' || strftime(period_end, '%m%d%Y')
        |    || '.zip' AS zip_name,
        |  'xbrl' AS kind
        |FROM q ORDER BY period_end""".stripMargin,

    // Same correlated scalar subquery; quantities are integral doubles
    // so AVG and 0.2* replay bit-identically.
    "q241_tpch_q17" ->
      """SELECT CAST(SUM(CAST(ROUND(l_extendedprice * 100) AS BIGINT))
        |         AS BIGINT) AS sum_cents,
        |       CAST(COUNT(*) AS BIGINT) AS n_rows
        |FROM lineitem JOIN part ON p_partkey = l_partkey
        |WHERE p_brand = 'Brand#12' AND p_size < 15
        |  AND l_quantity < (SELECT 0.2 * AVG(l2.l_quantity)
        |                    FROM lineitem l2
        |                    WHERE l2.l_partkey = p_partkey)""".stripMargin,

    // Group-filter-join-back; exact integer quantity sums.
    "q242_tpch_q18" ->
      """SELECT c_name, CAST(c_custkey AS BIGINT) AS c_custkey,
        |       CAST(o_orderkey AS BIGINT) AS o_orderkey,
        |       CAST(ROUND(o_totalprice * 100) AS BIGINT) AS total_cents,
        |       CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty
        |FROM customer, orders, lineitem
        |WHERE o_orderkey IN (SELECT l_orderkey
        |                     FROM lineitem
        |                     GROUP BY l_orderkey
        |                     HAVING SUM(CAST(l_quantity AS BIGINT)) > 180)
        |  AND c_custkey = o_custkey AND o_orderkey = l_orderkey
        |GROUP BY c_name, c_custkey, o_orderkey, o_totalprice
        |ORDER BY total_cents DESC, o_orderkey
        |LIMIT 100""".stripMargin,

    "q251_tpch_q20" ->
      s"""WITH partsupp AS ($partsuppDuckSql)
         |SELECT s.s_name
         |FROM supplier s JOIN nation n ON s.s_nationkey = n.n_nationkey
         |WHERE n.n_name = 'NATION_3'
         |  AND s.s_suppkey IN (
         |    SELECT ps.ps_suppkey FROM partsupp ps
         |    WHERE ps.ps_partkey IN (SELECT p_partkey FROM part
         |                            WHERE p_name LIKE 'red%')
         |      AND 2 * ps.ps_availqty >
         |        (SELECT CAST(SUM(CAST(l.l_quantity AS BIGINT)) AS BIGINT)
         |         FROM lineitem l
         |         WHERE l.l_partkey = ps.ps_partkey
         |           AND l.l_suppkey = ps.ps_suppkey
         |           AND l.l_shipdate >= TIMESTAMP '1995-01-01'
         |           AND l.l_shipdate < TIMESTAMP '1996-01-01'))
         |ORDER BY s_name""".stripMargin,

    "q252_margin_pairs" -> marginPairsOracleSql,

    "q262_kcenter_coreset" -> kCenterOracleSql(5),

    "q261_hard_negatives" ->
      s"""WITH hashed AS (
         |  SELECT vec_id, embedding,
         |    ${md5Hash64Sql("CAST(vec_id AS VARCHAR)")} AS h
         |  FROM embeddings),
         |cents AS (
         |  SELECT h AS cell, CAST(embedding AS DOUBLE[]) AS cvec
         |  FROM hashed ORDER BY h LIMIT 16),
         |assign AS (
         |  SELECT hd.vec_id AS id, hd.embedding AS vec, c.cell,
         |    row_number() OVER (PARTITION BY hd.vec_id
         |      ORDER BY list_cosine_similarity(CAST(hd.embedding AS DOUBLE[]), c.cvec) DESC,
         |               c.cell DESC) AS rn
         |  FROM hashed hd CROSS JOIN cents c),
         |cells AS (SELECT id, vec, cell FROM assign WHERE rn = 1),
         |qa AS (
         |  SELECT query_id, qvec, cell FROM (
         |    SELECT q.vec_id AS query_id, q.embedding AS qvec, c.cell,
         |      row_number() OVER (PARTITION BY q.vec_id
         |        ORDER BY list_cosine_similarity(CAST(q.embedding AS DOUBLE[]), c.cvec) DESC,
         |                 c.cell DESC) AS rk
         |    FROM embeddings q CROSS JOIN cents c) x
         |  WHERE rk <= 2),
         |scored AS (
         |  SELECT qa.query_id, cl.id AS neighbor_id,
         |    ROUND(${cosSql("cl.vec", "qa.qvec")}, 6) AS sim
         |  FROM cells cl JOIN qa ON cl.cell = qa.cell
         |  WHERE cl.id <> qa.query_id),
         |ranked AS (
         |  SELECT query_id, neighbor_id, sim,
         |    row_number() OVER (PARTITION BY query_id
         |                       ORDER BY sim DESC, neighbor_id ASC) AS rank
         |  FROM scored)
         |SELECT query_id, neighbor_id, sim, rank FROM ranked
         |WHERE rank BETWEEN 2 AND 5
         |ORDER BY query_id, rank""".stripMargin,

    "q260_entropy_ldiv" -> {
      val lnL = math.round(math.log(2.0) * 1e6)
      s"""WITH cells AS (
         |  SELECT o_orderpriority AS pri,
         |    CAST(year(o_orderdate) AS BIGINT) AS yr,
         |    o_orderstatus AS v, CAST(COUNT(*) AS BIGINT) AS c
         |  FROM orders WHERE o_orderstatus IS NOT NULL
         |  GROUP BY 1, 2, 3),
         |g AS (SELECT pri, yr, c,
         |        CAST(SUM(c) OVER (PARTITION BY pri, yr) AS BIGINT) AS n
         |      FROM cells),
         |t AS (SELECT pri, yr, n,
         |        CAST(round((-(CAST(c AS DOUBLE) / CAST(n AS DOUBLE)))
         |          * ln(CAST(c AS DOUBLE) / CAST(n AS DOUBLE)) * 1e6)
         |          AS BIGINT) AS tm
         |      FROM g)
         |SELECT pri, yr, CAST(MAX(n) AS BIGINT) AS n,
         |  CAST(COUNT(*) AS BIGINT) AS n_values,
         |  CAST(SUM(tm) AS BIGINT) AS entropy_micro,
         |  (SUM(tm) < $lnL) AS risky,
         |  CAST($lnL AS BIGINT) AS threshold_micro
         |FROM t GROUP BY 1, 2 ORDER BY pri, yr""".stripMargin
    },

    "q257_tpch_q11" ->
      s"""WITH partsupp AS ($partsuppDuckSql)
         |SELECT ps_partkey,
         |  CAST(SUM(ps_supplycost_c * ps_availqty) AS BIGINT) AS value_c
         |FROM partsupp, supplier, nation
         |WHERE ps_suppkey = s_suppkey AND s_nationkey = n_nationkey
         |  AND n_name = 'NATION_7'
         |GROUP BY ps_partkey
         |HAVING SUM(ps_supplycost_c * ps_availqty)
         |  > (SELECT SUM(ps_supplycost_c * ps_availqty) // 3000
         |     FROM partsupp, supplier, nation
         |     WHERE ps_suppkey = s_suppkey AND s_nationkey = n_nationkey
         |       AND n_name = 'NATION_7')
         |ORDER BY value_c DESC, ps_partkey""".stripMargin,

    "q258_tpch_q15" ->
      """WITH rev AS (
        |  SELECT l_suppkey,
        |    CAST(SUM(CAST(round(l_extendedprice * 100) AS BIGINT)
        |      * (10000 - CAST(round(l_discount * 10000) AS BIGINT)))
        |      AS BIGINT) AS total_e6
        |  FROM lineitem
        |  WHERE l_shipdate >= TIMESTAMP '1996-01-01'
        |    AND l_shipdate < TIMESTAMP '1996-04-01'
        |  GROUP BY l_suppkey)
        |SELECT s_suppkey, s_name, total_e6
        |FROM supplier JOIN rev ON s_suppkey = l_suppkey
        |WHERE total_e6 = (SELECT MAX(total_e6) FROM rev)
        |ORDER BY s_suppkey""".stripMargin,

    "q259_tpch_q22" ->
      """SELECT c_nationkey, CAST(COUNT(*) AS BIGINT) AS numcust,
        |  CAST(SUM(CAST(round(c_acctbal * 100) AS BIGINT)) AS BIGINT)
        |    AS totacctbal_c
        |FROM customer c
        |WHERE c_nationkey IN (1, 3, 5, 7)
        |  AND CAST(round(c_acctbal * 100) AS BIGINT)
        |    > (SELECT AVG(CAST(round(c2.c_acctbal * 100) AS BIGINT))
        |       FROM customer c2
        |       WHERE CAST(round(c2.c_acctbal * 100) AS BIGINT) > 0
        |         AND c2.c_nationkey IN (1, 3, 5, 7))
        |  AND NOT EXISTS (SELECT 1 FROM orders o
        |                  WHERE o.o_custkey = c.c_custkey
        |                    AND o.o_orderpriority = '1-URGENT')
        |GROUP BY c_nationkey
        |ORDER BY c_nationkey""".stripMargin,

    "q263_tpch_q7" ->
      """SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
        |  CAST(year(l.l_shipdate) AS BIGINT) AS l_year,
        |  CAST(SUM(CAST(round(l.l_extendedprice * 100) AS BIGINT)
        |    * (10000 - CAST(round(l.l_discount * 10000) AS BIGINT)))
        |    AS BIGINT) AS revenue_e6
        |FROM supplier s, lineitem l, orders o, customer c,
        |     nation n1, nation n2
        |WHERE s.s_suppkey = l.l_suppkey AND o.o_orderkey = l.l_orderkey
        |  AND c.c_custkey = o.o_custkey
        |  AND s.s_nationkey = n1.n_nationkey
        |  AND c.c_nationkey = n2.n_nationkey
        |  AND ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
        |    OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
        |  AND l.l_shipdate >= TIMESTAMP '1996-01-01'
        |  AND l.l_shipdate < TIMESTAMP '1998-01-01'
        |GROUP BY 1, 2, 3
        |ORDER BY supp_nation, cust_nation, l_year""".stripMargin,

    "q264_tpch_q8" ->
      """SELECT CAST(year(o.o_orderdate) AS BIGINT) AS o_year,
        |  CAST(SUM(CASE WHEN n2.n_name = 'NATION_3'
        |    THEN CAST(round(l.l_extendedprice * 100) AS BIGINT)
        |      * (10000 - CAST(round(l.l_discount * 10000) AS BIGINT))
        |    ELSE 0 END) AS BIGINT) AS nation_vol_e6,
        |  CAST(SUM(CAST(round(l.l_extendedprice * 100) AS BIGINT)
        |    * (10000 - CAST(round(l.l_discount * 10000) AS BIGINT)))
        |    AS BIGINT) AS total_vol_e6
        |FROM part p, supplier s, lineitem l, orders o,
        |     customer c, nation n1, nation n2
        |WHERE p.p_partkey = l.l_partkey AND s.s_suppkey = l.l_suppkey
        |  AND l.l_orderkey = o.o_orderkey AND o.o_custkey = c.c_custkey
        |  AND c.c_nationkey = n1.n_nationkey AND n1.n_regionkey = 0
        |  AND s.s_nationkey = n2.n_nationkey
        |  AND p.p_type = 'PROMO'
        |GROUP BY 1
        |ORDER BY o_year""".stripMargin,

    "q265_tpch_q9" ->
      """SELECT n.n_name AS nation,
        |  CAST(year(o.o_orderdate) AS BIGINT) AS o_year,
        |  CAST(SUM(CAST(round(l.l_extendedprice * 100) AS BIGINT)
        |      * (10000 - CAST(round(l.l_discount * 10000) AS BIGINT))
        |    - CAST(round(p.p_retailprice * 100) AS BIGINT) * 10000
        |      * CAST(l.l_quantity AS BIGINT)) AS BIGINT) AS profit_e6
        |FROM part p, supplier s, lineitem l, orders o, nation n
        |WHERE s.s_suppkey = l.l_suppkey AND p.p_partkey = l.l_partkey
        |  AND o.o_orderkey = l.l_orderkey
        |  AND s.s_nationkey = n.n_nationkey
        |  AND p.p_name LIKE '%red%'
        |GROUP BY 1, 2
        |ORDER BY nation, o_year DESC""".stripMargin,

    "q266_tpch_q12" ->
      """SELECT l.l_returnflag AS shipmode,
        |  CAST(SUM(CASE WHEN o.o_orderpriority IN ('1-URGENT', '2-HIGH')
        |    THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
        |  CAST(SUM(CASE WHEN o.o_orderpriority IN ('1-URGENT', '2-HIGH')
        |    THEN 0 ELSE 1 END) AS BIGINT) AS low_line_count
        |FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey
        |WHERE l.l_shipdate >= TIMESTAMP '1997-01-01'
        |  AND l.l_shipdate < TIMESTAMP '1998-01-01'
        |GROUP BY 1
        |ORDER BY shipmode""".stripMargin,

    "q267_tpch_q13" ->
      """SELECT c_count, CAST(COUNT(*) AS BIGINT) AS custdist FROM (
        |  SELECT c.c_custkey,
        |    CAST(COUNT(o.o_orderkey) AS BIGINT) AS c_count
        |  FROM customer c LEFT OUTER JOIN orders o
        |    ON c.c_custkey = o.o_custkey
        |    AND o.o_orderpriority <> '4-NOT SPECIFIED'
        |  GROUP BY c.c_custkey) t
        |GROUP BY c_count
        |ORDER BY custdist DESC, c_count DESC""".stripMargin,

    "q268_tpch_q14" ->
      """SELECT
        |  CAST(SUM(CASE WHEN p.p_type = 'PROMO'
        |    THEN CAST(round(l.l_extendedprice * 100) AS BIGINT)
        |      * (10000 - CAST(round(l.l_discount * 10000) AS BIGINT))
        |    ELSE 0 END) AS BIGINT) AS promo_e6,
        |  CAST(SUM(CAST(round(l.l_extendedprice * 100) AS BIGINT)
        |    * (10000 - CAST(round(l.l_discount * 10000) AS BIGINT)))
        |    AS BIGINT) AS total_e6
        |FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
        |WHERE l.l_shipdate >= TIMESTAMP '1997-03-01'
        |  AND l.l_shipdate < TIMESTAMP '1997-04-01'""".stripMargin,

    "q269_tpch_q16" ->
      s"""WITH partsupp AS ($partsuppDuckSql)
         |SELECT p.p_brand, p.p_type, p.p_size,
         |  CAST(COUNT(DISTINCT ps.ps_suppkey) AS BIGINT) AS supplier_cnt
         |FROM part p JOIN partsupp ps ON p.p_partkey = ps.ps_partkey
         |WHERE p.p_brand <> 'Brand#4' AND p.p_type NOT LIKE 'MED%'
         |  AND p.p_size IN (1, 9, 14, 19, 23, 36, 45, 49)
         |  AND ps.ps_suppkey NOT IN (SELECT s_suppkey FROM supplier
         |                            WHERE s_name LIKE '%000000014%')
         |GROUP BY 1, 2, 3
         |ORDER BY supplier_cnt DESC, p_brand, p_type, p_size""".stripMargin,

    "q270_tpch_q19" ->
      """SELECT
        |  CAST(SUM(CAST(round(l.l_extendedprice * 100) AS BIGINT)
        |    * (10000 - CAST(round(l.l_discount * 10000) AS BIGINT)))
        |    AS BIGINT) AS revenue_e6,
        |  CAST(COUNT(*) AS BIGINT) AS n_lines
        |FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
        |WHERE (p.p_brand = 'Brand#12' AND p.p_size BETWEEN 1 AND 5
        |    AND l.l_quantity BETWEEN 1 AND 11)
        |   OR (p.p_brand = 'Brand#23' AND p.p_size BETWEEN 1 AND 10
        |    AND l.l_quantity BETWEEN 10 AND 20)
        |   OR (p.p_brand = 'Brand#4' AND p.p_size BETWEEN 1 AND 15
        |    AND l.l_quantity BETWEEN 20 AND 30)""".stripMargin,

    "q271_hits" ->
      """WITH e AS (
        |  SELECT DISTINCT o_custkey AS src,
        |    -(l_suppkey + 1) AS dst
        |  FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey),
        |hub1 AS (SELECT src, CAST(COUNT(*) AS BIGINT) AS h
        |         FROM e GROUP BY src),
        |auth1 AS (SELECT e.dst, CAST(SUM(h) AS BIGINT) AS a
        |          FROM e JOIN hub1 ON e.src = hub1.src GROUP BY e.dst),
        |hub2 AS (SELECT e.src, CAST(SUM(a) AS BIGINT) AS h
        |         FROM e JOIN auth1 ON e.dst = auth1.dst GROUP BY e.src),
        |auth2 AS (SELECT e.dst, CAST(SUM(h) AS BIGINT) AS a
        |          FROM e JOIN hub2 ON e.src = hub2.src GROUP BY e.dst),
        |nodes AS (SELECT src AS node FROM e UNION SELECT dst FROM e)
        |SELECT n.node, COALESCE(hub2.h, 0) AS hub,
        |  COALESCE(auth2.a, 0) AS auth
        |FROM nodes n
        |LEFT JOIN hub2 ON n.node = hub2.src
        |LEFT JOIN auth2 ON n.node = auth2.dst
        |ORDER BY n.node""".stripMargin,

    "q272_adamic_adar" ->
      """WITH e AS (
        |  SELECT DISTINCT l_suppkey AS a, o_custkey AS z
        |  FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey),
        |deg AS (SELECT z, CAST(COUNT(*) AS BIGINT) AS d FROM e GROUP BY z),
        |keep AS (SELECT z,
        |    CAST(round(1e6 / ln(CAST(d AS DOUBLE))) AS BIGINT) AS term
        |  FROM deg WHERE d BETWEEN 2 AND 40),
        |p AS (SELECT e1.a AS a, e2.a AS b, k.term
        |      FROM e e1 JOIN e e2 ON e1.z = e2.z
        |      JOIN keep k ON k.z = e1.z
        |      WHERE e1.a < e2.a)
        |SELECT a, b, CAST(COUNT(*) AS BIGINT) AS common,
        |  CAST(SUM(term) AS BIGINT) AS aa_micro
        |FROM p GROUP BY a, b HAVING COUNT(*) >= 2
        |ORDER BY a, b""".stripMargin,

    "q273_kruskal_wallis" ->
      """WITH base AS (
        |  SELECT l_linestatus AS stratum, l_returnflag AS g,
        |    CAST(l_quantity AS BIGINT) AS v
        |  FROM lineitem
        |  WHERE l_quantity IS NOT NULL AND l_returnflag IS NOT NULL),
        |cells AS (SELECT stratum, v, CAST(COUNT(*) AS BIGINT) AS t
        |          FROM base GROUP BY 1, 2),
        |cells2 AS (SELECT stratum, v, t,
        |    COALESCE(CAST(SUM(t) OVER (PARTITION BY stratum ORDER BY v
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
        |      AS BIGINT), 0) AS c
        |  FROM cells),
        |r2 AS (SELECT stratum, v, 2 * c + t + 1 AS rank2 FROM cells2),
        |gv AS (SELECT stratum, g, v, CAST(COUNT(*) AS BIGINT) AS m
        |       FROM base GROUP BY 1, 2, 3),
        |grp AS (SELECT gv.stratum, g, CAST(SUM(m) AS BIGINT) AS ng,
        |    CAST(SUM(m * rank2) AS BIGINT) AS r2g
        |  FROM gv JOIN r2 ON gv.stratum = r2.stratum AND gv.v = r2.v
        |  GROUP BY 1, 2),
        |sums AS (SELECT stratum, CAST(SUM(ng) AS BIGINT) AS n,
        |    CAST(COUNT(*) AS BIGINT) AS k
        |  FROM grp GROUP BY 1),
        |terms AS (SELECT grp.stratum, n, k,
        |    CAST(round(3.0 * CAST(r2g AS DOUBLE) * CAST(r2g AS DOUBLE)
        |      / (CAST(n AS DOUBLE) * (CAST(n AS DOUBLE) + 1.0)
        |         * CAST(ng AS DOUBLE)) * 1e6) AS BIGINT) AS tq
        |  FROM grp JOIN sums ON grp.stratum = sums.stratum),
        |agg AS (SELECT stratum, CAST(MAX(n) AS BIGINT) AS n,
        |    CAST(MAX(k) AS BIGINT) AS k,
        |    CAST(SUM(tq) AS BIGINT) AS h_plus
        |  FROM terms GROUP BY 1),
        |ties AS (SELECT stratum,
        |    CAST(SUM(t * t * t - t) AS BIGINT) AS tie_sum
        |  FROM cells GROUP BY 1),
        |hcalc AS (SELECT a.stratum, n, k,
        |    h_plus - 3 * (n + 1) * 1000000 AS hm,
        |    1.0 - CAST(tie_sum AS DOUBLE)
        |      / (CAST(n AS DOUBLE) * CAST(n AS DOUBLE) * CAST(n AS DOUBLE)
        |         - CAST(n AS DOUBLE)) AS cfac
        |  FROM agg a JOIN ties t ON a.stratum = t.stratum)
        |SELECT stratum, n, k,
        |  CASE WHEN k >= 2 AND n > k
        |    THEN CAST(hm AS BIGINT) END AS h_micro,
        |  CASE WHEN k >= 2 AND n > k AND cfac > 0
        |    THEN CAST(round(CAST(hm AS DOUBLE) / cfac) AS BIGINT)
        |    END AS h_tied_micro
        |FROM hcalc ORDER BY stratum""".stripMargin,

    "q274_inclusion_deps" -> Seq(
      ("cust_nation_in_nation", "customer", "c_nationkey",
        "nation", "n_nationkey"),
      ("li_part_in_part", "lineitem", "l_partkey", "part", "p_partkey"),
      ("li_supp_in_supplier", "lineitem", "l_suppkey",
        "supplier", "s_suppkey"),
      ("ord_cust_in_customer", "orders", "o_custkey",
        "customer", "c_custkey"),
      ("part_in_li_part", "part", "p_partkey", "lineitem", "l_partkey"),
      ("supp_nation_in_cust_nation", "supplier", "s_nationkey",
        "customer", "c_nationkey"))
      .map { case (label, ct, cc, pt, pc) =>
        s"""SELECT '$label' AS pair,
           |  (SELECT CAST(COUNT(DISTINCT $cc) AS BIGINT) FROM $ct
           |   WHERE $cc IS NOT NULL) AS n_child_distinct,
           |  (SELECT CAST(COUNT(DISTINCT $pc) AS BIGINT) FROM $pt
           |   WHERE $pc IS NOT NULL) AS n_parent_distinct,
           |  (SELECT CAST(COUNT(*) AS BIGINT) FROM
           |    (SELECT DISTINCT $cc AS v FROM $ct
           |     WHERE $cc IS NOT NULL) c
           |   WHERE v NOT IN (SELECT $pc FROM $pt
           |                   WHERE $pc IS NOT NULL)) AS n_missing""".stripMargin
      }
      .map(q => s"SELECT pair, n_child_distinct, n_parent_distinct, " +
        s"n_missing, (n_missing = 0) AS holds FROM ($q)")
      .mkString("", "\nUNION ALL\n", "\nORDER BY pair"),

    "q275_doremi_step" ->
      """WITH g AS (SELECT source AS domain, CAST(COUNT(*) AS BIGINT) AS n,
        |    CAST(SUM(n_chars) AS BIGINT) AS sc
        |  FROM documents GROUP BY 1),
        |tot AS (SELECT CAST(SUM(n) AS BIGINT) AS tn,
        |    CAST(SUM(sc) AS BIGINT) AS tsc FROM g),
        |d AS (SELECT domain, CAST((n * 1000000) // tn AS BIGINT) AS weight_ppm,
        |    CAST(round((CAST(sc AS DOUBLE) / CAST(n AS DOUBLE)
        |        - CAST(tsc AS DOUBLE) / CAST(tn AS DOUBLE))
        |      / (CAST(tsc AS DOUBLE) / CAST(tn AS DOUBLE)) * 1e6)
        |      AS BIGINT) AS loss_micro
        |  FROM g CROSS JOIN tot),
        |r AS (SELECT domain, weight_ppm,
        |    CAST(round(CAST(weight_ppm AS DOUBLE)
        |      * exp(2000000.0 * CAST(loss_micro AS DOUBLE) / 1e12))
        |      AS BIGINT) AS raw_micro
        |  FROM d),
        |t2 AS (SELECT CAST(SUM(raw_micro) AS BIGINT) AS tot2,
        |    CAST(COUNT(*) AS BIGINT) AS k FROM r)
        |SELECT domain, weight_ppm, raw_micro,
        |  CAST((900000 * ((raw_micro * 1000000) // tot2)) // 1000000
        |    + (100000 // k) AS BIGINT) AS alpha_ppm
        |FROM r CROSS JOIN t2 ORDER BY domain""".stripMargin,

    "q276_matryoshka" ->
      s"""WITH q AS (SELECT vec_id AS query_id, embedding AS qvec
         |           FROM embeddings WHERE vec_id % 50 = 0),
         |fs AS (
         |  SELECT q.query_id, e.vec_id AS neighbor_id,
         |    ROUND(${cosSql("e.embedding", "q.qvec")}, 6) AS sim
         |  FROM embeddings e CROSS JOIN q WHERE e.vec_id <> q.query_id),
         |fr AS (SELECT query_id, neighbor_id FROM (
         |    SELECT query_id, neighbor_id,
         |      ROW_NUMBER() OVER (PARTITION BY query_id
         |        ORDER BY sim DESC, neighbor_id ASC) AS rank
         |    FROM fs) x WHERE rank <= 5),
         |ps AS (
         |  SELECT q.query_id, e.vec_id AS neighbor_id,
         |    ROUND(${cosSql("e.embedding[1:8]", "q.qvec[1:8]")}, 6) AS sim
         |  FROM embeddings e CROSS JOIN q WHERE e.vec_id <> q.query_id),
         |pr AS (SELECT query_id, neighbor_id FROM (
         |    SELECT query_id, neighbor_id,
         |      ROW_NUMBER() OVER (PARTITION BY query_id
         |        ORDER BY sim DESC, neighbor_id ASC) AS rank
         |    FROM ps) x WHERE rank <= 5)
         |SELECT fr.query_id, CAST(5 AS BIGINT) AS k,
         |  CAST(COUNT(pr.neighbor_id) AS BIGINT) AS hits
         |FROM fr LEFT JOIN pr ON fr.query_id = pr.query_id
         |  AND fr.neighbor_id = pr.neighbor_id
         |GROUP BY fr.query_id ORDER BY fr.query_id""".stripMargin,

    "q299_cliffs_delta" ->
      """WITH cells AS (
        |  SELECT l_linestatus AS stratum, l_returnflag AS g,
        |    CAST(l_quantity AS BIGINT) AS v,
        |    CAST(COUNT(*) AS BIGINT) AS c
        |  FROM lineitem
        |  WHERE l_quantity IS NOT NULL AND l_returnflag IN ('R', 'A')
        |  GROUP BY 1, 2, 3),
        |p AS (SELECT a.stratum,
        |    COALESCE(SUM(CASE WHEN a.v > b.v THEN a.c * b.c END), 0)
        |      AS gt,
        |    COALESCE(SUM(CASE WHEN a.v < b.v THEN a.c * b.c END), 0)
        |      AS lt,
        |    SUM(a.c * b.c) AS nn
        |  FROM cells a JOIN cells b
        |    ON a.stratum = b.stratum AND a.g = 'R' AND b.g = 'A'
        |  GROUP BY 1)
        |SELECT stratum,
        |  CAST(round((CAST(gt AS DOUBLE) - CAST(lt AS DOUBLE))
        |    / CAST(nn AS DOUBLE) * 1e6) AS BIGINT) AS delta_micro,
        |  CAST(nn AS BIGINT) AS n_pairs
        |FROM p ORDER BY stratum""".stripMargin,

    "q298_kendall_tau" ->
      """WITH cells AS (
        |  SELECT CAST(l_quantity AS BIGINT) AS x,
        |    CAST(round(l_discount * 100) AS BIGINT) AS y,
        |    CAST(COUNT(*) AS BIGINT) AS c
        |  FROM lineitem
        |  WHERE l_quantity IS NOT NULL AND l_discount IS NOT NULL
        |  GROUP BY 1, 2),
        |p AS (SELECT
        |    COALESCE(SUM(CASE WHEN b.y > a.y THEN a.c * b.c END), 0) AS cc,
        |    COALESCE(SUM(CASE WHEN b.y < a.y THEN a.c * b.c END), 0) AS dd
        |  FROM cells a JOIN cells b ON a.x < b.x),
        |tx AS (SELECT COALESCE(SUM(t * (t - 1)), 0) AS tx2,
        |    CAST(SUM(t) AS BIGINT) AS n
        |  FROM (SELECT CAST(SUM(c) AS BIGINT) AS t FROM cells GROUP BY x)),
        |ty AS (SELECT COALESCE(SUM(t * (t - 1)), 0) AS ty2
        |  FROM (SELECT CAST(SUM(c) AS BIGINT) AS t FROM cells GROUP BY y))
        |SELECT n, CAST(cc AS BIGINT) AS concordant,
        |  CAST(dd AS BIGINT) AS discordant,
        |  CASE WHEN n >= 2
        |    AND CAST(n AS DOUBLE) * (CAST(n AS DOUBLE) - 1.0)
        |        - CAST(tx2 AS DOUBLE) > 0
        |    AND CAST(n AS DOUBLE) * (CAST(n AS DOUBLE) - 1.0)
        |        - CAST(ty2 AS DOUBLE) > 0
        |  THEN CAST(round((CAST(cc AS DOUBLE) - CAST(dd AS DOUBLE))
        |    / (sqrt((CAST(n AS DOUBLE) * (CAST(n AS DOUBLE) - 1.0)
        |        - CAST(tx2 AS DOUBLE))
        |      * (CAST(n AS DOUBLE) * (CAST(n AS DOUBLE) - 1.0)
        |        - CAST(ty2 AS DOUBLE))) / 2.0) * 1e6) AS BIGINT)
        |  END AS tau_micro
        |FROM p CROSS JOIN tx CROSS JOIN ty""".stripMargin,

    "q297_fd_error" ->
      """WITH cells AS (
        |  SELECT l_partkey AS x, l_linestatus AS y,
        |    CAST(COUNT(*) AS BIGINT) AS c
        |  FROM lineitem
        |  WHERE l_partkey IS NOT NULL AND l_linestatus IS NOT NULL
        |  GROUP BY 1, 2),
        |px AS (SELECT x, CAST(MAX(c) AS BIGINT) AS mx,
        |    CAST(SUM(c) AS BIGINT) AS nx
        |  FROM cells GROUP BY 1)
        |SELECT CAST(SUM(nx) AS BIGINT) AS n,
        |  CAST(SUM(mx) AS BIGINT) AS n_keep,
        |  CAST(SUM(nx) - SUM(mx) AS BIGINT) AS n_remove,
        |  CAST(((SUM(nx) - SUM(mx)) * 1000000) // SUM(nx) AS BIGINT)
        |    AS g3_ppm,
        |  (SUM(mx) = SUM(nx)) AS holds
        |FROM px""".stripMargin,

    "q296_ljung_box" -> {
      def lagCte(k: Int): String =
        s"""SELECT a.key, $k AS lag, CAST(COUNT(*) AS BIGINT) AS m,
           |  CAST(SUM(a.x * b.x) AS BIGINT) AS sxy,
           |  CAST(SUM(a.x) AS BIGINT) AS sh,
           |  CAST(SUM(b.x) AS BIGINT) AS st
           |FROM daily a JOIN daily b
           |  ON a.key = b.key AND b.d = a.d + $k
           |GROUP BY 1""".stripMargin
      s"""WITH daily AS (
         |  SELECT event_type AS key,
         |    CAST(date_diff('day', DATE '1970-01-01', CAST(ts AS DATE))
         |      AS BIGINT) AS d,
         |    CAST(COUNT(*) AS BIGINT) AS x
         |  FROM events GROUP BY 1, 2),
         |g AS (SELECT key, CAST(COUNT(*) AS BIGINT) AS n,
         |    CAST(SUM(x) AS BIGINT) AS s1,
         |    CAST(SUM(x * x) AS BIGINT) AS s2
         |  FROM daily GROUP BY 1),
         |lags AS (${(1 to 4).map(lagCte).mkString("\n|UNION ALL\n|")}),
         |t AS (SELECT l.key, l.m,
         |    CAST(s2 AS DOUBLE) - CAST(n AS DOUBLE)
         |      * (CAST(s1 AS DOUBLE) / CAST(n AS DOUBLE))
         |      * (CAST(s1 AS DOUBLE) / CAST(n AS DOUBLE)) AS den,
         |    (CAST(sxy AS DOUBLE)
         |      - CAST(s1 AS DOUBLE) / CAST(n AS DOUBLE)
         |        * (CAST(sh AS DOUBLE) + CAST(st AS DOUBLE))
         |      + CAST(m AS DOUBLE) * (CAST(s1 AS DOUBLE) / CAST(n AS DOUBLE))
         |        * (CAST(s1 AS DOUBLE) / CAST(n AS DOUBLE)))
         |    / (CAST(s2 AS DOUBLE) - CAST(n AS DOUBLE)
         |      * (CAST(s1 AS DOUBLE) / CAST(n AS DOUBLE))
         |      * (CAST(s1 AS DOUBLE) / CAST(n AS DOUBLE))) AS r,
         |    n
         |  FROM lags l JOIN g ON l.key = g.key
         |  WHERE l.m > 0)
         |SELECT key, CAST(MAX(n) AS BIGINT) AS n,
         |  CAST(COUNT(*) AS BIGINT) AS k_lags,
         |  CASE WHEN MAX(n) > 4 AND
         |    COUNT(CASE WHEN den > 0 THEN 1 END) = COUNT(*)
         |  THEN CAST(MAX(n) * (MAX(n) + 2)
         |    * SUM(CASE WHEN den > 0
         |        THEN CAST(round(r * r * 1e6 / CAST(m AS DOUBLE))
         |          AS BIGINT) END) AS BIGINT)
         |  END AS q_micro
         |FROM t GROUP BY key ORDER BY key""".stripMargin
    },

    "q295_salted_join" ->
      """SELECT s_name, CAST(COUNT(*) AS BIGINT) AS n,
        |  CAST(SUM(CAST(round(l_extendedprice * 100) AS BIGINT))
        |    AS BIGINT) AS cents_total
        |FROM lineitem JOIN supplier ON l_suppkey = s_suppkey
        |GROUP BY s_name
        |ORDER BY s_name""".stripMargin,

    "q292_conformal" ->
      """WITH cells AS (
        |  SELECT o_orderpriority AS grp,
        |    CAST(round(o_totalprice * 100) AS BIGINT) AS v,
        |    CAST(COUNT(*) AS BIGINT) AS c
        |  FROM orders WHERE o_totalprice IS NOT NULL
        |  GROUP BY 1, 2),
        |r AS (SELECT grp, v, c,
        |    CAST(SUM(c) OVER (PARTITION BY grp ORDER BY v) AS BIGINT)
        |      AS cum,
        |    CAST(SUM(c) OVER (PARTITION BY grp) AS BIGINT) AS n
        |  FROM cells),
        |k AS (SELECT grp, v, cum, n,
        |    LEAST(n, ((n + 1) * 900000 + 999999) // 1000000) AS k
        |  FROM r)
        |SELECT grp AS "group", CAST(MAX(n) AS BIGINT) AS n,
        |  CAST(MAX(k) AS BIGINT) AS k,
        |  CAST(MIN(v) AS BIGINT) AS threshold
        |FROM k WHERE cum >= k GROUP BY grp
        |ORDER BY "group"""".stripMargin,

    "q293_simpson" ->
      """WITH cells AS (
        |  SELECT source AS grp, tok, CAST(COUNT(*) AS BIGINT) AS c
        |  FROM (SELECT source,
        |      unnest(list_filter(string_split_regex(trim(lower(text)),
        |        '\s+'), x -> x <> '')) AS tok
        |    FROM documents) t
        |  GROUP BY 1, 2),
        |g AS (SELECT grp, CAST(SUM(c) AS BIGINT) AS n_tokens,
        |    CAST(COUNT(*) AS BIGINT) AS n_types,
        |    SUM(c * (c - 1)) AS s2
        |  FROM cells GROUP BY 1)
        |SELECT grp AS "group", n_tokens, n_types,
        |  CASE WHEN n_tokens >= 2 THEN
        |    CAST(round(CAST(s2 AS DOUBLE)
        |      / (CAST(n_tokens AS DOUBLE)
        |         * (CAST(n_tokens AS DOUBLE) - 1.0)) * 1e6) AS BIGINT)
        |    END AS simpson_micro,
        |  CASE WHEN n_tokens >= 2 THEN
        |    CAST(round((1.0 - CAST(s2 AS DOUBLE)
        |      / (CAST(n_tokens AS DOUBLE)
        |         * (CAST(n_tokens AS DOUBLE) - 1.0))) * 1e6) AS BIGINT)
        |    END AS gini_simpson_micro
        |FROM g ORDER BY "group"""".stripMargin,

    "q294_nelson_aalen" ->
      """WITH a AS (SELECT user_id AS u, MIN(epoch_us(ts)) AS ta
        |           FROM events WHERE event_type = 'view' GROUP BY 1),
        |conv AS (SELECT a.u, (MIN(tb) - ta) // 1000000 AS t, true AS e
        |         FROM a JOIN (SELECT user_id AS u, epoch_us(ts) AS tb
        |                      FROM events WHERE event_type = 'purchase') b
        |           ON a.u = b.u AND b.tb > a.ta
        |         GROUP BY a.u, ta),
        |lastev AS (SELECT user_id AS u, MAX(epoch_us(ts)) AS tmax
        |           FROM events GROUP BY 1),
        |cens AS (SELECT a.u, (tmax - ta) // 1000000 AS t, false AS e
        |         FROM a JOIN lastev ON a.u = lastev.u
        |         WHERE a.u NOT IN (SELECT u FROM conv)),
        |subj AS (SELECT 'c' || CAST(u % 2 AS VARCHAR) AS key, t,
        |           CAST(e AS BIGINT) AS e
        |         FROM (SELECT * FROM conv UNION ALL SELECT * FROM cens)),
        |cells AS (SELECT key, t, CAST(COUNT(*) AS BIGINT) AS c,
        |            CAST(SUM(e) AS BIGINT) AS d
        |          FROM subj GROUP BY 1, 2),
        |ar AS (SELECT key, t, d,
        |         CAST(SUM(c) OVER (PARTITION BY key ORDER BY t DESC)
        |           AS BIGINT) AS n_risk
        |       FROM cells),
        |terms AS (SELECT key, t, n_risk, d,
        |    CAST(round(CAST(d AS DOUBLE) * 1e6
        |      / CAST(n_risk AS DOUBLE)) AS BIGINT) AS tm
        |  FROM ar WHERE d > 0)
        |SELECT key, t, n_risk, d,
        |  CAST(SUM(tm) OVER (PARTITION BY key ORDER BY t) AS BIGINT)
        |    AS h_micro
        |FROM terms ORDER BY key, t""".stripMargin,

    "q290_multi_needle" ->
      """WITH needles(needle) AS (VALUES ('batch window'),
        |  ('customer query'), ('key agg'), ('slow key'), ('spark'))
        |SELECT doc_id, needle,
        |  CAST((length(text) - length(replace(text, needle, '')))
        |    // length(needle) AS BIGINT) AS n_hits
        |FROM documents CROSS JOIN needles
        |WHERE contains(text, needle)
        |ORDER BY doc_id, needle""".stripMargin,

    "q291_heavy_hitters" ->
      """SELECT term, COUNT(*) AS n FROM (
        |  SELECT unnest(list_filter(string_split_regex(trim(lower(text)),
        |                            '\s+'), x -> x <> '')) AS term
        |  FROM documents) t
        |GROUP BY term
        |ORDER BY n DESC, term ASC
        |LIMIT 15""".stripMargin,

    // packed-BIGINT state (see holtHalfPerKey scaladoc: DuckDB's
    // list_reduce updates struct accumulators field-IN-PLACE, so a
    // struct fold diverges — a scalar state cannot); a raw first
    // element is < 2^40, any packed state is > 10^17
    "q288_holt" ->
      """SELECT user_id, CAST(cnt AS BIGINT) AS n,
        |  CASE WHEN st < 1099511627776 THEN st
        |    ELSE st // 2147483648 - 1073741824 END AS level_milli,
        |  CASE WHEN st < 1099511627776 THEN 0
        |    ELSE st % 2147483648 - 1073741824 END AS trend_milli
        |FROM (
        |  SELECT user_id, COUNT(*) AS cnt,
        |    list_reduce(
        |      list(CAST(round(value * 1000) AS BIGINT)
        |           ORDER BY ts, CAST(round(value * 1000) AS BIGINT)),
        |      (a, x) -> CASE WHEN a < 1099511627776 THEN
        |          ((x + a) // 2 + 1073741824) * 2147483648
        |          + ((((x + a) // 2) - a) // 2 + 1073741824)
        |        ELSE
        |          ((x + ((a // 2147483648) - 1073741824)
        |              + ((a % 2147483648) - 1073741824)) // 2
        |            + 1073741824) * 2147483648
        |          + ((((a % 2147483648) - 1073741824)
        |              + ((x + ((a // 2147483648) - 1073741824)
        |                  + ((a % 2147483648) - 1073741824)) // 2
        |                 - ((a // 2147483648) - 1073741824))) // 2
        |            + 1073741824)
        |        END) AS st
        |  FROM events GROUP BY user_id) z
        |ORDER BY user_id""".stripMargin,

    "q289_unimax" ->
      """WITH g AS (SELECT source AS grp,
        |    CAST(SUM(n_chars) AS BIGINT) AS n_units
        |  FROM documents WHERE n_chars IS NOT NULL GROUP BY 1),
        |c AS (SELECT grp, n_units, n_units * 2 AS capacity FROM g),
        |r1 AS (SELECT grp, n_units, capacity,
        |    ROW_NUMBER() OVER (ORDER BY capacity, grp) AS k,
        |    COUNT(*) OVER () AS n,
        |    COALESCE(SUM(capacity) OVER (ORDER BY capacity, grp
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
        |      AS prefix
        |  FROM c),
        |r2 AS (SELECT *,
        |    (capacity * (n - k + 1) <= 600000 - prefix) AS capped
        |  FROM r1),
        |r3 AS (SELECT *,
        |    COALESCE(SUM(CASE WHEN capped THEN capacity END) OVER (), 0)
        |      AS cap_total,
        |    n - COALESCE(SUM(CASE WHEN capped THEN 1 END) OVER (), 0)
        |      AS m,
        |    ROW_NUMBER() OVER (ORDER BY capped, capacity, grp) AS ur
        |  FROM r2)
        |SELECT grp, n_units, CAST(capacity AS BIGINT) AS capacity,
        |  capped,
        |  CAST(CASE WHEN capped THEN capacity
        |    ELSE (600000 - cap_total) // m
        |      + (CASE WHEN ur <= (600000 - cap_total) % m
        |         THEN 1 ELSE 0 END) END AS BIGINT) AS alloc
        |FROM r3 ORDER BY grp""".stripMargin,

    "q284_bh_fdr" ->
      s"""WITH tests AS (
         |  SELECT n_name AS test,
         |    ${md5Hash64Sql("n_name")} % 1000000 AS p_micro
         |  FROM nation),
         |ranked AS (SELECT test, CAST(p_micro AS BIGINT) AS p_micro,
         |    ROW_NUMBER() OVER (ORDER BY p_micro, test) AS rank,
         |    COUNT(*) OVER () AS m
         |  FROM tests),
         |ks AS (SELECT test, p_micro, CAST(rank AS BIGINT) AS rank,
         |    MAX(CASE WHEN p_micro * m <= rank * 200000
         |        THEN rank ELSE 0 END) OVER () AS kstar
         |  FROM ranked)
         |SELECT test, p_micro, rank, (rank <= kstar) AS reject
         |FROM ks ORDER BY rank""".stripMargin,

    "q285_vocab_overlap" ->
      """WITH gt AS (
        |  SELECT DISTINCT source AS g,
        |    unnest(list_filter(string_split_regex(trim(lower(text)),
        |      '\s+'), x -> x <> '')) AS tok
        |  FROM documents),
        |sizes AS (SELECT g, CAST(COUNT(*) AS BIGINT) AS v
        |          FROM gt GROUP BY g),
        |inter AS (SELECT a.g AS g_a, b.g AS g_b,
        |    CAST(COUNT(*) AS BIGINT) AS intersection
        |  FROM gt a JOIN gt b ON a.tok = b.tok AND a.g < b.g
        |  GROUP BY 1, 2)
        |SELECT g_a, g_b, sa.v AS vocab_a, sb.v AS vocab_b, intersection,
        |  (intersection * 1000000) // (sa.v + sb.v - intersection)
        |    AS jaccard_micro
        |FROM inter JOIN sizes sa ON sa.g = g_a
        |JOIN sizes sb ON sb.g = g_b
        |ORDER BY g_a, g_b""".stripMargin,

    "q286_neyman" ->
      """WITH g AS (
        |  SELECT o_orderpriority AS stratum,
        |    CAST(COUNT(*) AS BIGINT) AS n_rows,
        |    SUM(CAST(round(o_totalprice * 100) AS BIGINT)) AS s1,
        |    SUM(CAST(round(o_totalprice * 100) AS BIGINT)
        |      * CAST(round(o_totalprice * 100) AS BIGINT)) AS s2
        |  FROM orders WHERE o_totalprice IS NOT NULL
        |  GROUP BY 1),
        |sg AS (SELECT stratum, n_rows,
        |    CASE WHEN n_rows >= 2 AND
        |      (CAST(n_rows AS DOUBLE) * CAST(s2 AS DOUBLE)
        |        - CAST(s1 AS DOUBLE) * CAST(s1 AS DOUBLE))
        |      / (CAST(n_rows AS DOUBLE) * (CAST(n_rows AS DOUBLE) - 1.0))
        |      > 0
        |    THEN CAST(round(sqrt(
        |      (CAST(n_rows AS DOUBLE) * CAST(s2 AS DOUBLE)
        |        - CAST(s1 AS DOUBLE) * CAST(s1 AS DOUBLE))
        |      / (CAST(n_rows AS DOUBLE) * (CAST(n_rows AS DOUBLE) - 1.0))))
        |      AS BIGINT)
        |    ELSE 0 END AS sigma_int
        |  FROM g),
        |w AS (SELECT stratum, n_rows, sigma_int,
        |    n_rows * sigma_int AS w,
        |    CAST(SUM(n_rows * sigma_int) OVER () AS BIGINT) AS tw
        |  FROM sg),
        |b AS (SELECT stratum, n_rows, sigma_int, tw,
        |    CASE WHEN tw > 0 THEN (1000 * w) // tw ELSE 0 END AS base,
        |    CASE WHEN tw > 0 THEN (1000 * w) % tw ELSE 0 END AS rem
        |  FROM w),
        |fin AS (SELECT stratum, n_rows, sigma_int, tw, base,
        |    1000 - CAST(SUM(base) OVER () AS BIGINT) AS leftn,
        |    ROW_NUMBER() OVER (ORDER BY rem DESC, stratum ASC) AS pri
        |  FROM b)
        |SELECT stratum, n_rows, sigma_int,
        |  CAST(CASE WHEN tw > 0
        |    THEN base + (CASE WHEN pri <= leftn THEN 1 ELSE 0 END)
        |    ELSE 0 END AS BIGINT) AS alloc
        |FROM fin ORDER BY stratum""".stripMargin,

    "q287_cochran_armitage" ->
      """WITH cells AS (
        |  SELECT CAST(substr(o_orderpriority, 1, 1) AS BIGINT) AS w,
        |    CAST(COUNT(*) AS BIGINT) AS n,
        |    CAST(SUM(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END)
        |      AS BIGINT) AS r
        |  FROM orders
        |  WHERE o_orderpriority IS NOT NULL AND o_orderstatus IS NOT NULL
        |  GROUP BY 1),
        |c2 AS (SELECT w, n, r,
        |    CAST(SUM(n) OVER () AS BIGINT) AS tot_n,
        |    CAST(SUM(r) OVER () AS BIGINT) AS tot_r
        |  FROM cells),
        |agg AS (SELECT CAST(MAX(tot_n) AS BIGINT) AS nn,
        |    CAST(MAX(tot_r) AS BIGINT) AS rr,
        |    CAST(COUNT(*) AS BIGINT) AS k,
        |    SUM(w * n) AS swn, SUM(w * w * n) AS swwn,
        |    SUM(w * (r * tot_n - n * tot_r)) AS t_num
        |  FROM c2)
        |SELECT nn AS n, k, CAST(t_num AS BIGINT) AS t_num,
        |  CASE WHEN CAST(rr AS DOUBLE) / CAST(nn AS DOUBLE)
        |      * (1.0 - CAST(rr AS DOUBLE) / CAST(nn AS DOUBLE))
        |      * CAST(nn AS DOUBLE)
        |      * (CAST(nn AS DOUBLE) * CAST(swwn AS DOUBLE)
        |         - CAST(swn AS DOUBLE) * CAST(swn AS DOUBLE)) > 0
        |    THEN CAST(round(CAST(t_num AS DOUBLE)
        |      / sqrt(CAST(rr AS DOUBLE) / CAST(nn AS DOUBLE)
        |        * (1.0 - CAST(rr AS DOUBLE) / CAST(nn AS DOUBLE))
        |        * CAST(nn AS DOUBLE)
        |        * (CAST(nn AS DOUBLE) * CAST(swwn AS DOUBLE)
        |           - CAST(swn AS DOUBLE) * CAST(swn AS DOUBLE)))
        |      * 1e6) AS BIGINT)
        |    END AS z_micro
        |FROM agg""".stripMargin,

    "q283_label_prop" -> {
      def round(i: Int): String =
        s"""l$i AS (SELECT node, label FROM (
           |    SELECT g.src AS node, l.label,
           |      ROW_NUMBER() OVER (PARTITION BY g.src
           |        ORDER BY COUNT(*) DESC, l.label ASC) AS rn
           |    FROM sym g JOIN l${i - 1} l ON l.node = g.dst
           |    GROUP BY g.src, l.label) x
           |  WHERE rn = 1)""".stripMargin
      s"""WITH e0 AS (
         |  SELECT doc_id AS src, doc_id % 97 AS dst FROM documents
         |  UNION ALL SELECT doc_id, doc_id % 31 FROM documents),
         |sym AS (SELECT DISTINCT src, dst FROM (
         |    SELECT src, dst FROM e0
         |    UNION ALL SELECT dst, src FROM e0) u
         |  WHERE src <> dst),
         |l0 AS (SELECT DISTINCT src AS node, src AS label FROM sym),
         |${round(1)},
         |${round(2)},
         |${round(3)}
         |SELECT node, label FROM l3 ORDER BY node""".stripMargin
    },

    "q282_rake" ->
      """WITH t0 AS (
        |  SELECT ' ' || regexp_replace(lower(text), '[^a-z0-9\s]+',
        |    ' | ', 'g') || ' ' AS s
        |  FROM documents),
        |t2 AS (
        |  SELECT regexp_replace(regexp_replace(s,
        |    ' (?:the|a|an|of|and|or|to|in|on|for|with|is|are|was|be|as|at|by|it|this|that|from) ',
        |    ' | ', 'g'),
        |    ' (?:the|a|an|of|and|or|to|in|on|for|with|is|are|was|be|as|at|by|it|this|that|from) ',
        |    ' | ', 'g') AS s
        |  FROM t0),
        |ph0 AS (SELECT unnest(string_split(s, '|')) AS p FROM t2),
        |ww AS (SELECT list_filter(string_split_regex(trim(p), '\s+'),
        |         x -> x <> '') AS w
        |       FROM ph0),
        |ph AS (SELECT array_to_string(w, ' ') AS phrase,
        |         CAST(len(w) AS BIGINT) AS plen, w
        |       FROM ww WHERE len(w) BETWEEN 1 AND 4),
        |wstat AS (SELECT word, CAST(COUNT(*) AS BIGINT) AS freq,
        |    CAST(SUM(plen) AS BIGINT) AS deg
        |  FROM (SELECT unnest(w) AS word, plen FROM ph) x
        |  GROUP BY 1),
        |wsc AS (SELECT word, (deg * 1000000) // freq AS ws FROM wstat),
        |pc AS (SELECT phrase, CAST(COUNT(*) AS BIGINT) AS n_occurrences
        |       FROM ph GROUP BY 1),
        |psc AS (SELECT pc.phrase, pc.n_occurrences,
        |    CAST(SUM(ws) AS BIGINT) AS score_micro
        |  FROM pc, unnest(string_split(pc.phrase, ' ')) AS t(word)
        |  JOIN wsc USING (word)
        |  GROUP BY 1, 2)
        |SELECT phrase, n_occurrences, score_micro FROM psc
        |ORDER BY score_micro DESC, phrase LIMIT 25""".stripMargin,

    "q280_episode_pairs" ->
      """WITH e AS (
        |  SELECT user_id AS u, event_type AS t, epoch_us(ts) AS ts
        |  FROM events WHERE event_type IS NOT NULL AND ts IS NOT NULL)
        |SELECT a.t AS a, b.t AS b, CAST(COUNT(*) AS BIGINT) AS support
        |FROM e a JOIN e b ON a.u = b.u AND b.ts > a.ts
        |  AND b.ts - a.ts <= 86400 * CAST(1000000 AS BIGINT)
        |GROUP BY 1, 2 HAVING COUNT(*) >= 10
        |ORDER BY a, b""".stripMargin,

    "q281_phrase_search" ->
      """WITH tk AS (
        |  SELECT doc_id,
        |    list_filter(string_split_regex(trim(lower(text)), '\s+'),
        |      x -> x <> '') AS t
        |  FROM documents),
        |hits AS (
        |  SELECT doc_id, i
        |  FROM tk, unnest(range(1, len(t))) AS u(i)
        |  WHERE t[i] = 'table' AND t[i+1] = 'hash')
        |SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_occurrences
        |FROM hits GROUP BY doc_id
        |ORDER BY doc_id""".stripMargin,

    "q278_tcloseness" ->
      """WITH base AS (SELECT o_orderpriority AS pri,
        |    CAST(year(o_orderdate) AS BIGINT) AS yr,
        |    CAST(floor(o_totalprice / 20000.0) AS BIGINT) AS v
        |  FROM orders WHERE o_totalprice IS NOT NULL),
        |gc AS (SELECT pri, yr, v, CAST(COUNT(*) AS BIGINT) AS c
        |       FROM base GROUP BY 1, 2, 3),
        |vc AS (SELECT v, CAST(COUNT(*) AS BIGINT) AS cg
        |       FROM base GROUP BY 1),
        |grp AS (SELECT pri, yr, CAST(SUM(c) AS BIGINT) AS n
        |        FROM gc GROUP BY 1, 2),
        |tot AS (SELECT CAST(SUM(cg) AS BIGINT) AS nn,
        |        CAST(COUNT(*) AS BIGINT) AS m FROM vc),
        |grid AS (SELECT g.pri, g.yr, g.n, vc.v, vc.cg,
        |    COALESCE(gc.c, 0) AS c, tot.nn, tot.m
        |  FROM grp g CROSS JOIN vc
        |  LEFT JOIN gc ON gc.pri = g.pri AND gc.yr = g.yr AND gc.v = vc.v
        |  CROSS JOIN tot),
        |cum AS (SELECT pri, yr, n, m, nn,
        |    SUM(c * nn - cg * n) OVER (PARTITION BY pri, yr
        |      ORDER BY v) AS d
        |  FROM grid),
        |agg AS (SELECT pri, yr, CAST(MAX(n) AS BIGINT) AS n,
        |    CAST(MAX(m) AS BIGINT) AS m, CAST(MAX(nn) AS BIGINT) AS nn,
        |    CAST(SUM(ABS(d)) AS BIGINT) AS sabs
        |  FROM cum GROUP BY 1, 2),
        |e AS (SELECT pri, yr, n, m,
        |    CASE WHEN m <= 1 THEN 0
        |      ELSE CAST(round(CAST(sabs AS DOUBLE)
        |        / (CAST(n AS DOUBLE) * CAST(nn AS DOUBLE)
        |           * (CAST(m AS DOUBLE) - 1.0)) * 1e6) AS BIGINT)
        |      END AS emd_micro
        |  FROM agg)
        |SELECT pri, yr, n, m, emd_micro, (emd_micro > 150000) AS risky
        |FROM e ORDER BY pri, yr""".stripMargin,

    "q279_ppr" -> {
      def round(i: Int): String =
        s"""c$i AS (SELECT e2.dst, SUM(r.rank_micro // o.n) AS s
           |       FROM e2 JOIN r${i - 1} r ON r.node = e2.src
           |       JOIN outdeg o ON o.src = e2.src GROUP BY e2.dst),
           |r$i AS (SELECT nodes.node,
           |         CAST(CASE WHEN nodes.node % 50 = 0 THEN bs.b ELSE 0 END
           |              + (COALESCE(c$i.s, 0) * 85) // 100 AS BIGINT)
           |           AS rank_micro
           |       FROM nodes LEFT JOIN c$i ON c$i.dst = nodes.node
           |       CROSS JOIN bs)""".stripMargin
      s"""WITH e AS (
         |  SELECT doc_id AS src, doc_id % 97 AS dst FROM documents
         |  UNION ALL SELECT doc_id, doc_id % 31 FROM documents),
         |e2 AS (SELECT src, dst FROM e WHERE src <> dst),
         |nodes AS (SELECT src AS node FROM e2 UNION SELECT dst FROM e2),
         |ns AS (SELECT COUNT(*) AS n,
         |       COUNT(*) FILTER (node % 50 = 0) AS s FROM nodes),
         |bs AS (SELECT (15 * 10000 * n) // s AS b FROM ns),
         |outdeg AS (SELECT src, COUNT(*) AS n FROM e2 GROUP BY src),
         |r0 AS (SELECT node, CAST(1000000 AS BIGINT) AS rank_micro
         |       FROM nodes),
         |${round(1)},
         |${round(2)},
         |${round(3)}
         |SELECT node, rank_micro FROM r3 ORDER BY node""".stripMargin
    },

    "q277_jarque_bera" ->
      """WITH base AS (SELECT l_returnflag AS key,
        |    CAST(l_quantity AS BIGINT) AS q
        |  FROM lineitem WHERE l_quantity IS NOT NULL),
        |g AS (SELECT key, CAST(COUNT(*) AS BIGINT) AS n,
        |    CAST(SUM(q) AS BIGINT) AS s1, CAST(SUM(q*q) AS BIGINT) AS s2,
        |    CAST(SUM(q*q*q) AS BIGINT) AS s3,
        |    CAST(SUM(q*q*q*q) AS BIGINT) AS s4
        |  FROM base GROUP BY 1),
        |m AS (SELECT key, n,
        |    CAST(s1 AS DOUBLE) / CAST(n AS DOUBLE) AS m1,
        |    CAST(s2 AS DOUBLE) / CAST(n AS DOUBLE) AS r2,
        |    CAST(s3 AS DOUBLE) / CAST(n AS DOUBLE) AS r3,
        |    CAST(s4 AS DOUBLE) / CAST(n AS DOUBLE) AS r4
        |  FROM g),
        |cm AS (SELECT key, n,
        |    r2 - m1 * m1 AS m2,
        |    r3 - 3.0 * m1 * r2 + 2.0 * m1 * m1 * m1 AS m3,
        |    r4 - 4.0 * m1 * r3 + 6.0 * m1 * m1 * r2
        |      - 3.0 * m1 * m1 * m1 * m1 AS m4
        |  FROM m),
        |sk AS (SELECT key, n, m2,
        |    m3 / (m2 * sqrt(m2)) AS skew, m4 / (m2 * m2) AS kurt
        |  FROM cm)
        |SELECT key, n,
        |  CASE WHEN n >= 2 AND m2 > 0
        |    THEN CAST(round(skew * 1e6) AS BIGINT) END AS skew_micro,
        |  CASE WHEN n >= 2 AND m2 > 0
        |    THEN CAST(round(kurt * 1e6) AS BIGINT) END AS kurt_micro,
        |  CASE WHEN n >= 2 AND m2 > 0
        |    THEN CAST(round(CAST(n AS DOUBLE) / 6.0
        |      * (skew * skew + 0.25 * (kurt - 3.0) * (kurt - 3.0)) * 1e6)
        |      AS BIGINT) END AS jb_micro
        |FROM sk ORDER BY key""".stripMargin,

    // q22's whitespace words + the RE2-portable piece regex, summed
    // exactly per lang; the ratio in the operator's float order.
    "q253_fertility" ->
      """WITH h AS (
        |  SELECT lang AS key,
        |    len(list_filter(string_split_regex(trim(text), '\s+'),
        |                    x -> x <> '')) AS w,
        |    len(regexp_extract_all(text, '[A-Za-z0-9_]+|[^\sA-Za-z0-9_]')) AS p
        |  FROM documents WHERE lang IS NOT NULL)
        |SELECT key, CAST(COUNT(*) AS BIGINT) AS n_docs,
        |  CAST(COALESCE(SUM(w), 0) AS BIGINT) AS n_words,
        |  CAST(COALESCE(SUM(p), 0) AS BIGINT) AS n_pieces,
        |  CASE WHEN COALESCE(SUM(w), 0) > 0
        |    THEN CAST(round(CAST(SUM(p) AS DOUBLE) / CAST(SUM(w) AS DOUBLE)
        |      * 1e6) AS BIGINT) END AS fertility_micro
        |FROM h GROUP BY 1 ORDER BY key""".stripMargin,

    // Same synthetic chrome injection, per-(domain, line) distinct-doc
    // share vs domain doc count in pure integers, reassembly by
    // position-ordered string_agg of surviving lines.
    "q254_domain_boilerplate" ->
      """WITH synth AS (
        |  SELECT doc_id, CAST(doc_id % 12 AS VARCHAR) AS dom,
        |    'NAV home about contact dom=' || CAST(doc_id % 12 AS VARCHAR)
        |      || chr(10) || text || chr(10)
        |      || 'Copyright dom=' || CAST(doc_id % 12 AS VARCHAR) AS raw
        |  FROM documents),
        |base AS (SELECT doc_id, dom, string_split(raw, chr(10)) AS paras
        |         FROM synth),
        |kz AS (SELECT doc_id, dom,
        |         unnest(list_zip(paras, range(1, len(paras) + 1))) AS z
        |       FROM base),
        |k AS (SELECT doc_id, dom, z[1] AS line, z[2] AS pos FROM kz),
        |ld AS (SELECT dom, line, CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS c
        |       FROM k GROUP BY 1, 2),
        |nd AS (SELECT dom, CAST(COUNT(*) AS BIGINT) AS n FROM base GROUP BY 1),
        |boiler AS (SELECT ld.dom, ld.line FROM ld JOIN nd ON ld.dom = nd.dom
        |           WHERE n >= 3 AND c * 1000000 >= 600000 * n),
        |keep AS (SELECT k.doc_id, k.pos, k.line FROM k
        |         LEFT JOIN boiler b ON k.dom = b.dom AND k.line = b.line
        |         WHERE b.line IS NULL),
        |agg AS (SELECT doc_id,
        |          string_agg(line, chr(10) ORDER BY pos) AS clean_text,
        |          CAST(COUNT(*) AS BIGINT) AS kept
        |        FROM keep GROUP BY 1)
        |SELECT base.doc_id, COALESCE(agg.clean_text, '') AS clean_text,
        |  CAST(len(base.paras) AS INTEGER) AS n_lines,
        |  CAST(len(base.paras) - COALESCE(kept, 0) AS INTEGER) AS n_removed
        |FROM base LEFT JOIN agg ON base.doc_id = agg.doc_id
        |ORDER BY base.doc_id""".stripMargin,

    "q255_corr_matrix" -> corrMatrixOracleSql(
      """SELECT CAST(l_quantity AS BIGINT) AS qty,
        |  CAST(round(l_extendedprice * 100) AS BIGINT) AS price_c,
        |  CAST(round(l_discount * 10000) AS BIGINT) AS disc_bp,
        |  CAST(round(l_tax * 10000) AS BIGINT) AS tax_bp
        |FROM lineitem""".stripMargin,
      Seq("qty", "price_c", "disc_bp", "tax_bp")),

    "q256_tpch_q2" ->
      s"""WITH partsupp AS ($partsuppDuckSql)
         |SELECT CAST(round(s.s_acctbal * 100) AS BIGINT) AS acctbal_cents,
         |  s.s_name, n.n_name, p.p_partkey, ps.ps_supplycost_c
         |FROM part p, supplier s, partsupp ps, nation n, region r
         |WHERE p.p_partkey = ps.ps_partkey AND s.s_suppkey = ps.ps_suppkey
         |  AND p.p_size IN (5, 15, 25, 45) AND p.p_type LIKE '%MALL'
         |  AND s.s_nationkey = n.n_nationkey
         |  AND n.n_regionkey = r.r_regionkey AND r.r_name = 'EUROPE'
         |  AND ps.ps_supplycost_c = (
         |    SELECT MIN(ps2.ps_supplycost_c)
         |    FROM partsupp ps2, supplier s2, nation n2, region r2
         |    WHERE ps2.ps_partkey = p.p_partkey
         |      AND s2.s_suppkey = ps2.ps_suppkey
         |      AND s2.s_nationkey = n2.n_nationkey
         |      AND n2.n_regionkey = r2.r_regionkey AND r2.r_name = 'EUROPE')
         |ORDER BY acctbal_cents DESC, n_name, s_name, p_partkey
         |LIMIT 100""".stripMargin,

    "q249_composite_arity3" -> compositeKeysOracleSql("lineitem",
      Seq("l_linenumber", "l_orderkey", "l_partkey", "l_suppkey"), 3),

    "q250_composite_pruned" -> compositeKeysOracleSql("orders",
      Seq("o_custkey", "o_orderdate", "o_orderkey", "o_totalprice"), 3),

    "q248_tpch_q21" ->
      """SELECT s_name, CAST(COUNT(*) AS BIGINT) AS numwait
        |FROM supplier, lineitem l1, orders
        |WHERE s_suppkey = l1.l_suppkey
        |  AND o_orderkey = l1.l_orderkey
        |  AND o_orderstatus = 'F'
        |  AND l1.l_shipdate > TIMESTAMP '1997-01-01'
        |  AND EXISTS (SELECT 1 FROM lineitem l2
        |              WHERE l2.l_orderkey = l1.l_orderkey
        |                AND l2.l_suppkey <> l1.l_suppkey)
        |  AND NOT EXISTS (SELECT 1 FROM lineitem l3
        |                  WHERE l3.l_orderkey = l1.l_orderkey
        |                    AND l3.l_suppkey <> l1.l_suppkey
        |                    AND l3.l_shipdate > TIMESTAMP '1997-01-01')
        |GROUP BY s_name
        |ORDER BY numwait DESC, s_name
        |LIMIT 100""".stripMargin,

    // topTerms replay (q33 tokenization), row_number ranks over the
    // k-bounded head, micro-quantized logs summed exactly, then the
    // OLS close in the identical float order.
    "q244_zipf_fit" ->
      """WITH terms AS (
        |  SELECT term, CAST(COUNT(*) AS BIGINT) AS n FROM (
        |    SELECT unnest(list_filter(string_split_regex(trim(lower(text)), '\s+'),
        |                              x -> x <> '')) AS term
        |    FROM documents) t
        |  GROUP BY term ORDER BY n DESC, term ASC LIMIT 200),
        |ranked AS (
        |  SELECT n, row_number() OVER (ORDER BY n DESC, term ASC) AS r
        |  FROM terms),
        |pts AS (
        |  SELECT CAST(round(ln(CAST(r AS DOUBLE)) * 1e6) AS BIGINT) AS x,
        |    CAST(round(ln(CAST(n AS DOUBLE)) * 1e6) AS BIGINT) AS y
        |  FROM ranked),
        |m AS (SELECT CAST(COUNT(*) AS BIGINT) AS k,
        |        SUM(CAST(x AS HUGEINT)) AS sx, SUM(CAST(y AS HUGEINT)) AS sy,
        |        SUM(CAST(x AS HUGEINT) * y) AS sxy,
        |        SUM(CAST(x AS HUGEINT) * x) AS sxx
        |      FROM pts),
        |f AS (SELECT k,
        |        CAST(k AS DOUBLE) * CAST(sxx AS DOUBLE)
        |          - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE) AS det,
        |        (CAST(k AS DOUBLE) * CAST(sxy AS DOUBLE)
        |          - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
        |          / (CAST(k AS DOUBLE) * CAST(sxx AS DOUBLE)
        |             - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)) AS slope,
        |        sx, sy FROM m)
        |SELECT k AS n_ranks,
        |  CASE WHEN k >= 2 AND det <> 0.0
        |    THEN CAST(round(slope * 1e6) AS BIGINT) END AS slope_micro,
        |  CASE WHEN k >= 2 AND det <> 0.0
        |    THEN CAST(round((CAST(sy AS DOUBLE) - slope * CAST(sx AS DOUBLE))
        |      / CAST(k AS DOUBLE) / 1e6 * 1e6) AS BIGINT) END AS intercept_micro
        |FROM f""".stripMargin,

    // Type-1 median per source (q223 rank rule), |x − m| deviations,
    // then the q197 ANOVA replay over the deviations with a single
    // 'all' stratum — Brown–Forsythe IS that composition.
    "q245_brown_forsythe" ->
      """WITH r AS (
        |  SELECT source AS g, CAST(n_chars AS BIGINT) AS x
        |  FROM documents WHERE n_chars IS NOT NULL AND source IS NOT NULL),
        |g1 AS (SELECT g, x, CAST(COUNT(*) AS BIGINT) AS c
        |       FROM r GROUP BY 1, 2),
        |c1 AS (SELECT g, x, c,
        |         SUM(c) OVER (PARTITION BY g ORDER BY x) AS cum,
        |         SUM(c) OVER (PARTITION BY g) AS n
        |       FROM g1),
        |med AS (SELECT g, x AS m FROM c1
        |        WHERE cum - c < GREATEST((500000 * n + 999999) // 1000000, 1)
        |          AND GREATEST((500000 * n + 999999) // 1000000, 1) <= cum),
        |z AS (SELECT r.g, abs(r.x - med.m) AS z
        |      FROM r JOIN med ON r.g = med.g),
        |grp AS (SELECT g, CAST(COUNT(*) AS BIGINT) AS ng,
        |          CAST(SUM(z) AS BIGINT) AS sg,
        |          SUM(CAST(z AS HUGEINT) * z) AS ssg
        |        FROM z GROUP BY 1),
        |q AS (SELECT ng, sg, ssg,
        |        CAST(round((CAST(sg AS DOUBLE) * CAST(sg AS DOUBLE)
        |          / CAST(ng AS DOUBLE)) * 1e6) AS HUGEINT) AS rq6
        |      FROM grp),
        |a AS (SELECT CAST(SUM(ng) AS BIGINT) AS n,
        |        CAST(COUNT(*) AS BIGINT) AS k,
        |        CAST(SUM(sg) AS BIGINT) AS s, SUM(ssg) AS ss,
        |        SUM(rq6) AS rq6
        |      FROM q),
        |f AS (SELECT n, k,
        |        CAST(rq6 AS DOUBLE) / 1e6
        |          - CAST(s AS DOUBLE) * CAST(s AS DOUBLE)
        |            / CAST(n AS DOUBLE) AS ssb,
        |        CAST(ss AS DOUBLE) - CAST(rq6 AS DOUBLE) / 1e6 AS ssw
        |      FROM a)
        |SELECT n, k,
        |  CASE WHEN k >= 2 AND n > k AND ssw > 0
        |    THEN CAST(round((ssb / (CAST(k AS DOUBLE) - 1.0))
        |      / (ssw / (CAST(n AS DOUBLE) - CAST(k AS DOUBLE))) * 1e6)
        |      AS BIGINT) END AS f_micro
        |FROM f""".stripMargin,

    // Calendar-month block maxima, then the method-of-moments close
    // (β = s·√6/π, μ = x̄ − γβ) in the identical float order over
    // exact integer moments.
    "q246_gumbel" ->
      """WITH blocks AS (
        |  SELECT date_trunc('month', ts) AS block,
        |    MAX(CAST(round(value * 1000) AS BIGINT)) AS mx
        |  FROM events WHERE value IS NOT NULL AND ts IS NOT NULL
        |  GROUP BY 1),
        |m AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_blocks,
        |        CAST(SUM(mx) AS BIGINT) AS s,
        |        SUM(CAST(mx AS HUGEINT) * mx) AS ss
        |      FROM blocks),
        |f AS (SELECT n_blocks,
        |        CAST(s AS DOUBLE) / CAST(n_blocks AS DOUBLE) AS mean,
        |        (CAST(ss AS DOUBLE) - CAST(s AS DOUBLE) * CAST(s AS DOUBLE)
        |           / CAST(n_blocks AS DOUBLE))
        |          / (CAST(n_blocks AS DOUBLE) - 1.0) AS vs
        |      FROM m)
        |SELECT n_blocks,
        |  CASE WHEN n_blocks >= 1
        |    THEN CAST(round(mean * 1e6) AS BIGINT) END AS mean_micro,
        |  CASE WHEN n_blocks >= 2 AND vs > 0
        |    THEN CAST(round(sqrt(vs * 6.0) / pi() * 1e6) AS BIGINT)
        |  END AS beta_micro,
        |  CASE WHEN n_blocks >= 2 AND vs > 0
        |    THEN CAST(round((mean - 0.5772156649015329
        |      * (sqrt(vs * 6.0) / pi())) * 1e6) AS BIGINT)
        |  END AS mu_micro
        |FROM f""".stripMargin,

    // Exact counts per source on each side, full-outer aligned, then
    // the JS term ½p·ln(p/m) per half in the identical float order —
    // raw unsmoothed probabilities (the mixture absorbs zeros).
    "q247_js_divergence" ->
      """WITH a AS (
        |  SELECT CAST(source AS VARCHAR) AS v, CAST(COUNT(*) AS BIGINT) AS c_a
        |  FROM documents WHERE source IS NOT NULL AND lang = 'en'
        |  GROUP BY 1),
        |b AS (
        |  SELECT CAST(source AS VARCHAR) AS v, CAST(COUNT(*) AS BIGINT) AS c_b
        |  FROM documents WHERE source IS NOT NULL AND lang <> 'en'
        |  GROUP BY 1),
        |j AS (SELECT COALESCE(a.v, b.v) AS v,
        |        COALESCE(c_a, 0) AS c_a, COALESCE(c_b, 0) AS c_b
        |      FROM a FULL OUTER JOIN b ON a.v = b.v),
        |t AS (SELECT CAST(GREATEST(1, SUM(c_a)) AS BIGINT) AS na,
        |        CAST(GREATEST(1, SUM(c_b)) AS BIGINT) AS nb FROM j),
        |p AS (SELECT v, c_a, c_b,
        |        CAST(c_a AS DOUBLE) / CAST(na AS DOUBLE) AS pa,
        |        CAST(c_b AS DOUBLE) / CAST(nb AS DOUBLE) AS pb
        |      FROM j CROSS JOIN t)
        |SELECT v, c_a, c_b,
        |  CAST(round((CASE WHEN c_a > 0
        |      THEN pa * ln(pa / ((pa + pb) / 2.0)) ELSE 0.0 END * 0.5
        |    + CASE WHEN c_b > 0
        |      THEN pb * ln(pb / ((pa + pb) / 2.0)) ELSE 0.0 END * 0.5)
        |    * 1e6) AS BIGINT) AS js_term_micro
        |FROM p ORDER BY v""".stripMargin,

    // Integer micro-cents revenue: round-to-cents × (10000 − bp) —
    // identical longs on both engines, exact HUGEINT sum.
    "q236_tpch_q5" ->
      """SELECT n_name,
        |  CAST(SUM(CAST(round(l_extendedprice * 100) AS HUGEINT)
        |    * (10000 - CAST(round(l_discount * 10000) AS BIGINT)))
        |    AS BIGINT) AS revenue_e6
        |FROM customer
        |JOIN orders ON c_custkey = o_custkey
        |JOIN lineitem ON o_orderkey = l_orderkey
        |JOIN supplier ON l_suppkey = s_suppkey
        |  AND c_nationkey = s_nationkey
        |JOIN nation ON s_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |WHERE r_name = 'ASIA'
        |  AND o_orderdate >= TIMESTAMP '1996-01-01'
        |  AND o_orderdate < TIMESTAMP '1997-01-01'
        |GROUP BY n_name
        |ORDER BY revenue_e6 DESC, n_name""".stripMargin,

    "q237_tpch_q10" ->
      """SELECT c_custkey, c_name, n_name,
        |  CAST(SUM(CAST(round(l_extendedprice * 100) AS HUGEINT)
        |    * (10000 - CAST(round(l_discount * 10000) AS BIGINT)))
        |    AS BIGINT) AS revenue_e6
        |FROM customer
        |JOIN orders ON c_custkey = o_custkey
        |JOIN lineitem ON o_orderkey = l_orderkey
        |JOIN nation ON c_nationkey = n_nationkey
        |WHERE l_returnflag = 'R'
        |  AND o_orderdate >= TIMESTAMP '1996-01-01'
        |  AND o_orderdate < TIMESTAMP '1996-04-01'
        |GROUP BY c_custkey, c_name, n_name
        |ORDER BY revenue_e6 DESC, c_custkey
        |LIMIT 20""".stripMargin,

    // Per-cell χ² terms micro-quantized before the exact fold, V in
    // one final float.
    "q233_cramers_v" ->
      """WITH cells AS (
        |  SELECT CAST(source AS VARCHAR) AS a, CAST(lang AS VARCHAR) AS b,
        |    CAST(COUNT(*) AS BIGINT) AS o
        |  FROM documents WHERE source IS NOT NULL AND lang IS NOT NULL
        |  GROUP BY 1, 2),
        |ra AS (SELECT a, CAST(SUM(o) AS BIGINT) AS rt FROM cells GROUP BY 1),
        |cb AS (SELECT b, CAST(SUM(o) AS BIGINT) AS ct FROM cells GROUP BY 1),
        |t AS (SELECT CAST(SUM(o) AS BIGINT) AS n,
        |        CAST(COUNT(DISTINCT a) AS BIGINT) AS r,
        |        CAST(COUNT(DISTINCT b) AS BIGINT) AS c
        |      FROM cells),
        |spine AS (SELECT a, rt, b, ct, COALESCE(o, 0) AS o
        |          FROM ra CROSS JOIN cb
        |          LEFT JOIN cells USING (a, b)),
        |terms AS (SELECT
        |    CAST(round(
        |      CAST(CAST(o AS HUGEINT) * n - CAST(rt AS HUGEINT) * ct
        |        AS DOUBLE)
        |      * CAST(CAST(o AS HUGEINT) * n - CAST(rt AS HUGEINT) * ct
        |        AS DOUBLE)
        |      / CAST(CAST(n AS HUGEINT) * rt * ct AS DOUBLE) * 1e6)
        |      AS BIGINT) AS tm
        |  FROM spine CROSS JOIN t)
        |SELECT n, r, c,
        |  CAST(SUM(tm) AS BIGINT) AS chi2_micro,
        |  CASE WHEN r >= 2 AND c >= 2 THEN
        |    CAST(round(sqrt(CAST(SUM(tm) AS DOUBLE) / 1e6
        |      / (CAST(n AS DOUBLE) * LEAST(r - 1, c - 1))) * 1e6) AS BIGINT)
        |  END AS v_micro
        |FROM terms CROSS JOIN t GROUP BY n, r, c""".stripMargin,

    // welchZ's exact moments, pooled (n−1)-weighted variance, one
    // fixed-order d.
    "q234_effect_size" ->
      """WITH m AS (
        |  SELECT event_type AS stratum,
        |    CASE WHEN user_id % 2 = 0 THEN 'a' ELSE 'b' END AS g,
        |    CAST(COUNT(*) AS BIGINT) AS n,
        |    CAST(SUM(CAST(round(value * 1000) AS BIGINT)) AS BIGINT) AS s,
        |    SUM(CAST(round(value * 1000) AS HUGEINT)
        |      * CAST(round(value * 1000) AS HUGEINT)) AS ss
        |  FROM events GROUP BY 1, 2),
        |p AS (SELECT stratum,
        |        MAX(CASE WHEN g = 'a' THEN n END) AS n_a,
        |        MAX(CASE WHEN g = 'a' THEN s END) AS s_a,
        |        MAX(CASE WHEN g = 'a' THEN ss END) AS ss_a,
        |        MAX(CASE WHEN g = 'b' THEN n END) AS n_b,
        |        MAX(CASE WHEN g = 'b' THEN s END) AS s_b,
        |        MAX(CASE WHEN g = 'b' THEN ss END) AS ss_b
        |      FROM m GROUP BY 1),
        |f AS (SELECT stratum, n_a, n_b,
        |        (CAST(ss_a AS DOUBLE) - CAST(s_a AS DOUBLE)
        |            * CAST(s_a AS DOUBLE) / CAST(n_a AS DOUBLE)
        |          + (CAST(ss_b AS DOUBLE) - CAST(s_b AS DOUBLE)
        |            * CAST(s_b AS DOUBLE) / CAST(n_b AS DOUBLE)))
        |          / (CAST(n_a AS DOUBLE) + CAST(n_b AS DOUBLE) - 2.0)
        |          AS pooled,
        |        CAST(s_a AS DOUBLE) / CAST(n_a AS DOUBLE)
        |          - CAST(s_b AS DOUBLE) / CAST(n_b AS DOUBLE) AS diff
        |      FROM p WHERE n_a IS NOT NULL AND n_b IS NOT NULL)
        |SELECT stratum, n_a, n_b,
        |  CASE WHEN n_a + n_b >= 3 AND pooled > 0
        |    THEN CAST(round(diff / sqrt(pooled) * 1e6) AS BIGINT)
        |  END AS d_micro
        |FROM f ORDER BY stratum""".stripMargin,

    // Pooled-p̂ two-proportion z from exact counts.
    "q235_proportions" ->
      """WITH m AS (
        |  SELECT event_type AS stratum,
        |    CASE WHEN user_id % 2 = 0 THEN 'a' ELSE 'b' END AS g,
        |    CAST(COUNT(*) AS BIGINT) AS n,
        |    CAST(SUM(CASE WHEN value > 100.0 THEN 1 ELSE 0 END) AS BIGINT)
        |      AS pos
        |  FROM events GROUP BY 1, 2),
        |p AS (SELECT stratum,
        |        MAX(CASE WHEN g = 'a' THEN n END) AS n_a,
        |        MAX(CASE WHEN g = 'a' THEN pos END) AS pos_a,
        |        MAX(CASE WHEN g = 'b' THEN n END) AS n_b,
        |        MAX(CASE WHEN g = 'b' THEN pos END) AS pos_b
        |      FROM m GROUP BY 1),
        |f AS (SELECT stratum, n_a, pos_a, n_b, pos_b,
        |        (CAST(pos_a AS DOUBLE) + CAST(pos_b AS DOUBLE))
        |          / (CAST(n_a AS DOUBLE) + CAST(n_b AS DOUBLE)) AS ph
        |      FROM p WHERE n_a IS NOT NULL AND n_b IS NOT NULL)
        |SELECT stratum, n_a, pos_a, n_b, pos_b,
        |  CASE WHEN n_a > 0 AND n_b > 0 AND pos_a + pos_b > 0
        |      AND pos_a + pos_b < n_a + n_b
        |    THEN CAST(round((CAST(pos_a AS DOUBLE) / CAST(n_a AS DOUBLE)
        |        - CAST(pos_b AS DOUBLE) / CAST(n_b AS DOUBLE))
        |      / sqrt(ph * (1.0 - ph)
        |        * (1.0 / CAST(n_a AS DOUBLE) + 1.0 / CAST(n_b AS DOUBLE)))
        |      * 1e6) AS BIGINT)
        |  END AS z_micro
        |FROM f ORDER BY stratum""".stripMargin,

    // Doubled average ranks over distinct |diff| magnitudes, exact
    // integer moments incl. the Σ(t³−t) tie correction, one float z.
    "q231_wilcoxon" ->
      """WITH paired AS (
        |  SELECT 'c' || CAST(user_id % 2 AS VARCHAR) AS key,
        |    CAST(SUM(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END)
        |      - SUM(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END)
        |      AS BIGINT) AS dv
        |  FROM events GROUP BY user_id),
        |nz AS (SELECT key, dv, abs(dv) AS x FROM paired WHERE dv <> 0),
        |g AS (SELECT key, x, CAST(COUNT(*) AS BIGINT) AS c,
        |        CAST(SUM(CASE WHEN dv > 0 THEN 1 ELSE 0 END) AS BIGINT)
        |          AS pos
        |      FROM nz GROUP BY 1, 2),
        |r AS (SELECT key, x, c, pos,
        |        2 * COALESCE(SUM(c) OVER (PARTITION BY key ORDER BY x
        |          ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
        |          + c + 1 AS r2
        |      FROM g),
        |agg AS (SELECT key, CAST(SUM(c) AS BIGINT) AS n,
        |          CAST(SUM(CAST(pos AS HUGEINT) * r2) AS BIGINT) AS w2,
        |          CAST(SUM(CAST(c AS HUGEINT) * c * c - c) AS BIGINT)
        |            AS ties
        |        FROM r GROUP BY 1)
        |SELECT key, n, w2,
        |  CASE WHEN n >= 1
        |      AND 2.0 * n * (n + 1.0) * (2.0 * n + 1.0)
        |        - CAST(ties AS DOUBLE) > 0
        |    THEN CAST(round((CAST(w2 AS DOUBLE) - n * (n + 1.0) / 2.0)
        |      / sqrt((2.0 * n * (n + 1.0) * (2.0 * n + 1.0)
        |        - CAST(ties AS DOUBLE)) / 12.0) * 1e6) AS BIGINT)
        |  END AS z_micro
        |FROM agg ORDER BY key""".stripMargin,

    // Discordant-pair counts in one aggregate; (b−c)² micro by
    // non-negative division.
    "q232_mcnemar" ->
      """WITH paired AS (
        |  SELECT 'c' || CAST(user_id % 2 AS VARCHAR) AS key,
        |    MAX(event_type = 'view') AS a,
        |    MAX(event_type = 'purchase') AS b
        |  FROM events GROUP BY user_id)
        |SELECT key, CAST(COUNT(*) AS BIGINT) AS n_pairs,
        |  CAST(SUM(CASE WHEN a AND NOT b THEN 1 ELSE 0 END) AS BIGINT)
        |    AS b01,
        |  CAST(SUM(CASE WHEN NOT a AND b THEN 1 ELSE 0 END) AS BIGINT)
        |    AS c10,
        |  CASE WHEN SUM(CASE WHEN a AND NOT b THEN 1 ELSE 0 END)
        |      + SUM(CASE WHEN NOT a AND b THEN 1 ELSE 0 END) > 0
        |    THEN CAST(((SUM(CASE WHEN a AND NOT b THEN 1 ELSE 0 END)
        |        - SUM(CASE WHEN NOT a AND b THEN 1 ELSE 0 END))
        |      * (SUM(CASE WHEN a AND NOT b THEN 1 ELSE 0 END)
        |        - SUM(CASE WHEN NOT a AND b THEN 1 ELSE 0 END))
        |      * 1000000)
        |      // (SUM(CASE WHEN a AND NOT b THEN 1 ELSE 0 END)
        |        + SUM(CASE WHEN NOT a AND b THEN 1 ELSE 0 END))
        |      AS BIGINT)
        |  END AS stat_micro
        |FROM paired GROUP BY 1 ORDER BY key""".stripMargin,

    // Same length-group / position-distinct decision; rebuild is a
    // position-ordered string_agg.
    "q230_log_templates" ->
      s"""WITH base AS (
         |  SELECT doc_id, $toksLower AS toks FROM documents),
         |bb AS (SELECT doc_id, CAST(len(toks) AS BIGINT) AS n_tokens,
         |         toks[1:16] AS head
         |       FROM base WHERE len(toks) > 0),
         |nm AS (SELECT n_tokens, CAST(COUNT(*) AS BIGINT) AS n_messages
         |       FROM bb GROUP BY 1),
         |cells AS (SELECT n_tokens, pos, COUNT(DISTINCT tok) AS nd,
         |            MIN(tok) AS tok1
         |          FROM (SELECT n_tokens, unnest(head) AS tok,
         |                  generate_subscripts(head, 1) AS pos
         |                FROM bb)
         |          GROUP BY 1, 2),
         |tpl AS (SELECT n_tokens,
         |          string_agg(CASE WHEN nd = 1 THEN tok1 ELSE '<*>' END,
         |            ' ' ORDER BY pos) AS t
         |        FROM cells GROUP BY 1)
         |SELECT nm.n_tokens, n_messages,
         |  CASE WHEN nm.n_tokens > 16 THEN t || ' <…>' ELSE t END AS template
         |FROM nm JOIN tpl ON nm.n_tokens = tpl.n_tokens
         |ORDER BY nm.n_tokens""".stripMargin,

    // Survivor replay: per-step log factors micro-quantized FIRST
    // (identical IEEE ln), INTEGER cumulative, one exp per row; the
    // d = n_risk terminal step pins a sentinel the exp flushes to 0.
    "q228_kaplan_meier" ->
      """WITH a AS (SELECT user_id AS u, MIN(epoch_us(ts)) AS ta
        |           FROM events WHERE event_type = 'view' GROUP BY 1),
        |conv AS (SELECT a.u, (MIN(tb) - ta) // 1000000 AS t, true AS e
        |         FROM a JOIN (SELECT user_id AS u, epoch_us(ts) AS tb
        |                      FROM events WHERE event_type = 'purchase') b
        |           ON a.u = b.u AND b.tb > a.ta
        |         GROUP BY a.u, ta),
        |lastev AS (SELECT user_id AS u, MAX(epoch_us(ts)) AS tmax
        |           FROM events GROUP BY 1),
        |cens AS (SELECT a.u, (tmax - ta) // 1000000 AS t, false AS e
        |         FROM a JOIN lastev ON a.u = lastev.u
        |         WHERE a.u NOT IN (SELECT u FROM conv)),
        |subj AS (SELECT 'c' || CAST(u % 2 AS VARCHAR) AS key, t,
        |           CAST(e AS BIGINT) AS e
        |         FROM (SELECT * FROM conv UNION ALL SELECT * FROM cens)),
        |cells AS (SELECT key, t, CAST(COUNT(*) AS BIGINT) AS c,
        |            CAST(SUM(e) AS BIGINT) AS d
        |          FROM subj GROUP BY 1, 2),
        |ar AS (SELECT key, t, d,
        |         CAST(SUM(c) OVER (PARTITION BY key ORDER BY t DESC)
        |           AS BIGINT) AS n_risk
        |       FROM cells),
        |lf AS (SELECT key, t, d, n_risk,
        |         CASE WHEN d < n_risk THEN
        |           CAST(round(ln(CAST(n_risk - d AS DOUBLE)
        |             / CAST(n_risk AS DOUBLE)) * 1e6) AS BIGINT)
        |         ELSE -100000000 END AS lfm
        |       FROM ar WHERE d > 0)
        |SELECT key, t, n_risk, d,
        |  CAST(round(exp(CAST(SUM(lfm) OVER (PARTITION BY key ORDER BY t)
        |    AS DOUBLE) / 1e6) * 1e6) AS BIGINT) AS s_micro
        |FROM lf ORDER BY key, t""".stripMargin,

    // cusum's argmax day splits the daily series; per-segment OLS in
    // the trendPerKey float order; one-day segments → sentinel.
    "q229_segmented_trend" ->
      """WITH daily AS (
        |  SELECT event_type AS key, CAST(ts AS DATE) AS d,
        |    CAST(COUNT(*) AS BIGINT) AS v
        |  FROM events GROUP BY 1, 2),
        |s AS (SELECT key, d,
        |        ROW_NUMBER() OVER w AS i, SUM(v) OVER w AS p,
        |        COUNT(*) OVER (PARTITION BY key) AS nd,
        |        SUM(v) OVER (PARTITION BY key) AS tt
        |      FROM daily WINDOW w AS (PARTITION BY key ORDER BY d)),
        |cp AS (SELECT key, d AS cp_date
        |       FROM (SELECT key, d,
        |               abs(CAST(p AS HUGEINT) * nd
        |                 - CAST(i AS HUGEINT) * tt) AS sa
        |             FROM s)
        |       QUALIFY ROW_NUMBER() OVER (PARTITION BY key
        |         ORDER BY sa DESC, d ASC) = 1),
        |tagged AS (SELECT daily.key, cp.cp_date,
        |             CASE WHEN daily.d <= cp.cp_date THEN 'b'
        |                  ELSE 'a' END AS seg,
        |             CAST(daily.d - DATE '1970-01-01' AS BIGINT) AS x,
        |             v
        |           FROM daily JOIN cp ON daily.key = cp.key),
        |m AS (SELECT key, cp_date, seg, CAST(COUNT(*) AS BIGINT) AS n,
        |        CAST(SUM(x) AS BIGINT) AS sx, CAST(SUM(v) AS BIGINT) AS sy,
        |        SUM(CAST(x AS HUGEINT) * v) AS sxy,
        |        SUM(CAST(x AS HUGEINT) * x) AS sxx
        |      FROM tagged GROUP BY 1, 2, 3),
        |sc AS (SELECT key, cp_date, seg, n,
        |         CASE WHEN n >= 2
        |             AND CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
        |               - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE) > 0
        |           THEN CAST(round((CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
        |               - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
        |             / (CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
        |               - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)) * 1e6)
        |             AS BIGINT)
        |         END AS slope_micro
        |       FROM m)
        |SELECT key, cp_date,
        |  COALESCE(MAX(CASE WHEN seg = 'b' THEN n END), 0) AS n_before,
        |  COALESCE(MAX(CASE WHEN seg = 'b' THEN slope_micro END),
        |    -9223372036854775808) AS slope_before_micro,
        |  COALESCE(MAX(CASE WHEN seg = 'a' THEN n END), 0) AS n_after,
        |  COALESCE(MAX(CASE WHEN seg = 'a' THEN slope_micro END),
        |    -9223372036854775808) AS slope_after_micro
        |FROM sc GROUP BY 1, 2 ORDER BY key""".stripMargin,

    // Rule-by-rule conditional sums (false OR NULL = violation),
    // micro rates by integer division.
    "q225_rule_audit" ->
      """WITH v AS (SELECT
        |  CAST(COUNT(*) AS BIGINT) AS n,
        |  CAST(SUM(CASE WHEN COALESCE(o_orderkey > 0, false)
        |    THEN 0 ELSE 1 END) AS BIGINT) AS v0,
        |  CAST(SUM(CASE WHEN COALESCE(o_totalprice BETWEEN 0 AND 1000000,
        |    false) THEN 0 ELSE 1 END) AS BIGINT) AS v1,
        |  CAST(SUM(CASE WHEN COALESCE(o_orderstatus IN ('O','F','P'),
        |    false) THEN 0 ELSE 1 END) AS BIGINT) AS v2,
        |  CAST(SUM(CASE WHEN o_orderpriority IS NOT NULL
        |    THEN 0 ELSE 1 END) AS BIGINT) AS v3,
        |  CAST(SUM(CASE WHEN COALESCE(CAST(o_orderdate AS DATE)
        |      >= DATE '1990-01-01', false)
        |    THEN 0 ELSE 1 END) AS BIGINT) AS v4
        |FROM orders)
        |SELECT rule, n, n_violations,
        |  CASE WHEN n > 0 THEN (n_violations * 1000000) // n
        |       ELSE 0 END AS rate_micro
        |FROM (
        |  SELECT 'orderkey_positive' AS rule, n, v0 AS n_violations FROM v
        |  UNION ALL SELECT 'price_in_range', n, v1 FROM v
        |  UNION ALL SELECT 'status_known', n, v2 FROM v
        |  UNION ALL SELECT 'priority_nonnull', n, v3 FROM v
        |  UNION ALL SELECT 'date_modern', n, v4 FROM v)""".stripMargin,

    // First-exposure → first-qualifying-conversion latency per user,
    // then the exact rank-selected percentiles.
    "q226_time_to_convert" ->
      """WITH a AS (SELECT user_id AS u, MIN(epoch_us(ts)) AS ta
        |           FROM events WHERE event_type = 'view' GROUP BY 1),
        |b AS (SELECT user_id AS u, epoch_us(ts) AS tb
        |      FROM events WHERE event_type = 'purchase'),
        |lat AS (SELECT a.u, (MIN(tb) - ta) // 1000000 AS x
        |        FROM a JOIN b ON a.u = b.u AND b.tb > a.ta
        |        GROUP BY a.u, ta),
        |g AS (SELECT x, CAST(COUNT(*) AS BIGINT) AS c FROM lat GROUP BY 1),
        |cum AS (SELECT x, c, SUM(c) OVER (ORDER BY x) AS cum,
        |          SUM(c) OVER () AS n
        |        FROM g),
        |ps AS (SELECT unnest([500000, 900000]) AS p_micro)
        |SELECT 'view_to_purchase' AS key, CAST(p_micro AS BIGINT) AS p_micro,
        |  CAST(x AS BIGINT) AS value
        |FROM cum CROSS JOIN ps
        |WHERE cum - c < GREATEST((p_micro * n + 999999) // 1000000, 1)
        |  AND GREATEST((p_micro * n + 999999) // 1000000, 1) <= cum
        |ORDER BY p_micro""".stripMargin,

    // The q23 marker heuristic aggregated into confusion cells.
    "q227_langid_confusion" ->
      s"""WITH t AS (SELECT lang, $toksLower AS toks FROM documents),
         |h AS (SELECT lang,
         |  len(list_filter(toks, x -> list_contains(['der','die','und','ist','nicht','das','ein','zu'], x))) AS de,
         |  len(list_filter(toks, x -> list_contains(['the','and','is','of','to','in','that','it'], x))) AS en,
         |  len(list_filter(toks, x -> list_contains(['el','la','de','que','los','una','es','por'], x))) AS es,
         |  len(list_filter(toks, x -> list_contains(['le','la','les','des','est','une','dans','pas'], x))) AS fr
         |  FROM t),
         |p AS (SELECT lang,
         |  CASE WHEN greatest(de, en, es, fr) = 0 THEN 'und'
         |       WHEN de >= en AND de >= es AND de >= fr THEN 'de'
         |       WHEN en >= es AND en >= fr THEN 'en'
         |       WHEN es >= fr THEN 'es'
         |       ELSE 'fr' END AS lang_pred
         |  FROM h)
         |SELECT lang, lang_pred, CAST(COUNT(*) AS BIGINT) AS n
         |FROM p GROUP BY 1, 2 ORDER BY lang, lang_pred""".stripMargin,

    // Two type-1 rank-selected medians (value, then absolute
    // deviation), exact-integer 3·MAD threshold.
    "q223_mad" ->
      """WITH r AS (
        |  SELECT event_type AS key, CAST(round(value * 1000) AS BIGINT) AS x
        |  FROM events WHERE value IS NOT NULL),
        |g1 AS (SELECT key, x, CAST(COUNT(*) AS BIGINT) AS c
        |       FROM r GROUP BY 1, 2),
        |c1 AS (SELECT key, x, c,
        |         SUM(c) OVER (PARTITION BY key ORDER BY x) AS cum,
        |         SUM(c) OVER (PARTITION BY key) AS n
        |       FROM g1),
        |med AS (SELECT key, x AS median FROM c1
        |        WHERE cum - c < GREATEST((500000 * n + 999999) // 1000000, 1)
        |          AND GREATEST((500000 * n + 999999) // 1000000, 1) <= cum),
        |dev AS (SELECT r.key, med.median, abs(r.x - med.median) AS d
        |        FROM r JOIN med ON r.key = med.key),
        |g2 AS (SELECT key, d, CAST(COUNT(*) AS BIGINT) AS c
        |       FROM dev GROUP BY 1, 2),
        |c2 AS (SELECT key, d, c,
        |         SUM(c) OVER (PARTITION BY key ORDER BY d) AS cum,
        |         SUM(c) OVER (PARTITION BY key) AS n
        |       FROM g2),
        |mad AS (SELECT key, d AS mad FROM c2
        |        WHERE cum - c < GREATEST((500000 * n + 999999) // 1000000, 1)
        |          AND GREATEST((500000 * n + 999999) // 1000000, 1) <= cum)
        |SELECT dev.key, CAST(COUNT(*) AS BIGINT) AS n,
        |  CAST(MIN(dev.median) AS BIGINT) AS median,
        |  CAST(MIN(mad.mad) AS BIGINT) AS mad,
        |  CAST(SUM(CASE WHEN dev.d > 3 * mad.mad THEN 1 ELSE 0 END)
        |    AS BIGINT) AS n_outliers
        |FROM dev JOIN mad ON dev.key = mad.key
        |GROUP BY 1 ORDER BY dev.key""".stripMargin,

    // The store's clamp-binning over ALL orders (shard merge is
    // addition), then the same integer overlap interpolation.
    "q224_selectivity" ->
      """WITH src AS (
        |  SELECT o_orderpriority AS key,
        |    LEAST(GREATEST(CAST(round(o_totalprice * 100) AS BIGINT)
        |      // 500000, 0), 63) AS bin
        |  FROM orders),
        |cells AS (SELECT key, bin, CAST(COUNT(*) AS BIGINT) AS n
        |          FROM src GROUP BY 1, 2),
        |ov AS (SELECT key, n,
        |         GREATEST(LEAST(15250000, bin * 500000 + 500000)
        |           - GREATEST(2300000, bin * 500000), 0) AS o
        |       FROM cells)
        |SELECT key, CAST(SUM(n) AS BIGINT) AS n_total,
        |  CAST(SUM((n * o) // 500000) AS BIGINT) AS est
        |FROM ov GROUP BY 1 ORDER BY key""".stripMargin,

    // Both sketches rebuilt cell-for-cell; per-row dots with a 0..d-1
    // spine, min as the headline estimate.
    "q222_cms_joinsize" ->
      s"""WITH ta AS (SELECT unnest($toksLower) AS tok FROM documents
         |            WHERE lang = 'en'),
         |tb AS (SELECT unnest($toksLower) AS tok FROM documents
         |       WHERE lang <> 'en'),
         |ca AS (SELECT ii.i AS row,
         |         ${md5Hash64Sql("(CAST(ii.i AS VARCHAR) || '|' || tok)")} % 512
         |           AS col,
         |         COUNT(*) AS c
         |       FROM ta CROSS JOIN (SELECT unnest(range(4)) AS i) ii
         |       GROUP BY 1, 2),
         |cb AS (SELECT ii.i AS row,
         |         ${md5Hash64Sql("(CAST(ii.i AS VARCHAR) || '|' || tok)")} % 512
         |           AS col,
         |         COUNT(*) AS c
         |       FROM tb CROSS JOIN (SELECT unnest(range(4)) AS i) ii
         |       GROUP BY 1, 2),
         |dots AS (SELECT ca.row,
         |           CAST(SUM(CAST(ca.c AS HUGEINT) * cb.c) AS BIGINT) AS dot
         |         FROM ca JOIN cb ON ca.row = cb.row AND ca.col = cb.col
         |         GROUP BY 1),
         |spine AS (SELECT unnest(range(4)) AS row),
         |filled AS (SELECT CAST(spine.row AS BIGINT) AS row,
         |             COALESCE(dot, 0) AS dot
         |           FROM spine LEFT JOIN dots ON dots.row = spine.row)
         |SELECT row, dot,
         |  (SELECT MIN(dot) FROM filled) AS join_size_est
         |FROM filled ORDER BY row""".stripMargin,

    // Doubled Walsh sums (i ≤ j), lower-median rank pick, ×500000 —
    // no half ever floats.
    "q218_hodges_lehmann" ->
      """WITH daily AS (
        |  SELECT event_type AS key,
        |    CAST(CAST(ts AS DATE) - DATE '1970-01-01' AS BIGINT) AS d,
        |    CAST(COUNT(*) AS BIGINT) AS v
        |  FROM events GROUP BY 1, 2),
        |nd AS (SELECT key, CAST(COUNT(*) AS BIGINT) AS n_days
        |       FROM daily GROUP BY 1),
        |wl AS (SELECT a.key, a.v + b.v AS w2
        |       FROM daily a JOIN daily b
        |         ON a.key = b.key AND a.d <= b.d),
        |med AS (SELECT key,
        |          CAST(COUNT(*) OVER (PARTITION BY key) AS BIGINT) AS n_walsh,
        |          w2,
        |          ROW_NUMBER() OVER (PARTITION BY key ORDER BY w2) AS rn
        |        FROM wl)
        |SELECT key, n_days, n_walsh,
        |  CAST(w2 * 500000 AS BIGINT) AS hl_micro
        |FROM nd JOIN med USING (key)
        |WHERE rn = (n_walsh + 1) // 2 ORDER BY key""".stripMargin,

    // Same ln() per distinct degree, micro-quantized BEFORE the
    // weighted sum (order-free integer fold), CSN alpha in one float
    // expression.
    "q219_degree_dist" ->
      """WITH ends AS (
        |  SELECT CAST(o_custkey AS BIGINT) AS id FROM orders
        |  UNION ALL SELECT -CAST(o_orderkey AS BIGINT) FROM orders),
        |deg AS (SELECT id, CAST(COUNT(*) AS BIGINT) AS degree
        |        FROM ends GROUP BY 1),
        |hist AS (SELECT degree, CAST(COUNT(*) AS BIGINT) AS n_nodes
        |         FROM deg WHERE degree >= 1 GROUP BY 1),
        |mle AS (SELECT CAST(SUM(n_nodes) AS BIGINT) AS n,
        |          CAST(SUM(CAST(round(ln(CAST(degree AS DOUBLE) / 0.5) * 1e6)
        |            AS BIGINT) * n_nodes) AS BIGINT) AS slog_micro
        |        FROM hist)
        |SELECT degree, n_nodes,
        |  CAST(SUM(n_nodes) OVER (ORDER BY degree DESC) AS BIGINT) AS cum_ge,
        |  CAST(round(1e6 + CAST(n AS DOUBLE) * 1e12
        |    / CAST(slog_micro AS DOUBLE)) AS BIGINT) AS alpha_micro
        |FROM hist CROSS JOIN mle ORDER BY degree""".stripMargin,

    // LAG gaps (ties → 0 regardless of tie order), then the exact
    // type-1 rank selection over cumulative distinct-value counts.
    "q220_interarrival" ->
      """WITH e AS (
        |  SELECT event_type AS key, user_id, epoch_us(ts) AS t
        |  FROM events),
        |g AS (SELECT key,
        |        (t - LAG(t) OVER (PARTITION BY key, user_id ORDER BY t))
        |          // 1000000 AS x
        |      FROM e),
        |gr AS (SELECT key, x, CAST(COUNT(*) AS BIGINT) AS c
        |       FROM g WHERE x IS NOT NULL GROUP BY 1, 2),
        |cum AS (SELECT key, x, c,
        |          SUM(c) OVER (PARTITION BY key ORDER BY x) AS cum,
        |          SUM(c) OVER (PARTITION BY key) AS n
        |        FROM gr),
        |ps AS (SELECT unnest([500000, 900000]) AS p_micro)
        |SELECT key, CAST(p_micro AS BIGINT) AS p_micro,
        |  CAST(x AS BIGINT) AS value
        |FROM cum CROSS JOIN ps
        |WHERE cum - c < GREATEST((p_micro * n + 999999) // 1000000, 1)
        |  AND GREATEST((p_micro * n + 999999) // 1000000, 1) <= cum
        |ORDER BY key, p_micro""".stripMargin,

    // Σx² through HUGEINT, shares squared in one float expression.
    "q221_hhi" ->
      """WITH a AS (
        |  SELECT source AS key, CAST(COUNT(*) AS BIGINT) AS n,
        |    CAST(SUM(n_chars) AS BIGINT) AS total,
        |    SUM(CAST(n_chars AS HUGEINT) * n_chars) AS ss
        |  FROM documents WHERE n_chars IS NOT NULL GROUP BY 1)
        |SELECT key, n, total,
        |  CAST(round(CAST(ss AS DOUBLE)
        |    / (CAST(total AS DOUBLE) * CAST(total AS DOUBLE)) * 1e6)
        |    AS BIGINT) AS hhi_micro
        |FROM a WHERE total > 0 ORDER BY key""".stripMargin,

    "q215_bitmap_distinct" ->
      """SELECT event_type AS key,
        |  CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_distinct
        |FROM events WHERE user_id >= 0 GROUP BY 1 ORDER BY key""".stripMargin,

    // Ground truth from raw id sets — the bitmap result must agree
    // with plain set intersection/union cardinalities.
    "q216_bitmap_algebra" ->
      """WITH ids AS (
        |  SELECT DISTINCT CAST(o_orderstatus AS VARCHAR) AS value,
        |    o_orderkey AS id
        |  FROM orders WHERE o_orderkey >= 0 AND o_orderstatus IS NOT NULL),
        |tot AS (SELECT value, CAST(COUNT(*) AS BIGINT) AS t
        |        FROM ids GROUP BY 1),
        |pairs AS (SELECT a.value AS value_a, b.value AS value_b,
        |            CAST(COUNT(*) AS BIGINT) AS n_and
        |          FROM ids a JOIN ids b
        |            ON a.id = b.id AND a.value < b.value
        |          GROUP BY 1, 2),
        |spine AS (SELECT ta.value AS value_a, tb.value AS value_b,
        |            ta.t AS t_a, tb.t AS t_b
        |          FROM tot ta JOIN tot tb ON ta.value < tb.value)
        |SELECT value_a, value_b,
        |  COALESCE(n_and, 0) AS n_and,
        |  t_a + t_b - COALESCE(n_and, 0) AS n_or,
        |  CASE WHEN t_a + t_b - COALESCE(n_and, 0) > 0 THEN
        |    (COALESCE(n_and, 0) * 1000000)
        |      // (t_a + t_b - COALESCE(n_and, 0))
        |  END AS jaccard_micro
        |FROM spine LEFT JOIN pairs USING (value_a, value_b)
        |ORDER BY value_a, value_b""".stripMargin,

    // Brute-force trailing-window COUNT(DISTINCT) over the global-span
    // grid — the quadratic truth the range-delta plan must equal.
    "q217_sliding_distinct" ->
      """WITH occ AS (
        |  SELECT DISTINCT event_type AS key, user_id AS id,
        |    CAST(CAST(ts AS DATE) - DATE '1970-01-01' AS BIGINT) AS t
        |  FROM events),
        |span AS (SELECT MIN(t) AS mn, MAX(t) AS mx FROM occ),
        |keys AS (SELECT DISTINCT key FROM occ),
        |grid AS (SELECT key, unnest(range(mn, mx + 1)) AS d
        |         FROM keys CROSS JOIN span)
        |SELECT g.key, CAST(g.d AS BIGINT) AS d,
        |  CAST(COUNT(DISTINCT o.id) AS BIGINT) AS n_distinct
        |FROM grid g LEFT JOIN occ o
        |  ON o.key = g.key AND o.t BETWEEN g.d - 6 AND g.d
        |GROUP BY 1, 2 ORDER BY g.key, d""".stripMargin,

    "q41_window_suite" ->
      """SELECT o_custkey, o_orderkey, o_totalprice,
        |  dense_rank() OVER w AS drnk,
        |  ntile(4) OVER w AS quartile,
        |  lag(o_orderkey, 1) OVER w AS prev_key,
        |  lead(o_orderkey, 1) OVER w AS next_key,
        |  ROUND(cume_dist() OVER w, 6) AS cd
        |FROM orders
        |WINDOW w AS (PARTITION BY o_custkey
        |             ORDER BY o_totalprice DESC, o_orderkey ASC)
        |ORDER BY o_custkey, drnk, o_orderkey""".stripMargin,

    "q42_rollup" ->
      """SELECT r_name, n_name, COUNT(*) AS n_cust,
        |  CAST(SUM(CAST(c_acctbal AS DECIMAL(28,4))) AS DOUBLE) AS sum_bal
        |FROM customer
        |JOIN nation ON c_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |GROUP BY ROLLUP (r_name, n_name)
        |ORDER BY r_name ASC NULLS FIRST, n_name ASC NULLS FIRST""".stripMargin,

    "q43_distinct_agg" ->
      """SELECT l_returnflag,
        |  COUNT(DISTINCT l_suppkey) AS n_supp,
        |  COUNT(DISTINCT l_partkey) AS n_part,
        |  COUNT(*) AS n_rows
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,

    "q44_crossmodal_filter" ->
      s"""WITH q AS (
         |  SELECT doc_id,
         |    ROUND(least(len(list_filter(string_split_regex(trim(text), '\\s+'), x -> x <> '')) / 50.0, 1.0) * 0.4
         |      + greatest(0.0, 1.0 - (CASE WHEN length(text) = 0 THEN 0.0
         |          ELSE (length(text) - length(regexp_replace(text, '[[:punct:]]', '', 'g'))) * 1.0 / length(text) END) * 4.0) * 0.3
         |      + least((CASE WHEN len($toksLower) = 0 THEN 0.0
         |          ELSE len(list_filter($toksLower,
         |                 x -> list_contains(['the','a','an','and','or','of','to','in','is','it','that','for','on','with','as','was','at','by'], x))) * 1.0
         |               / len($toksLower) END) * 3.0, 1.0) * 0.3, 6) AS q
         |  FROM documents)
         |SELECT label, COUNT(*) AS n_docs,
         |  ROUND(CAST(SUM(CAST(q AS DECIMAL(28,8))) AS DOUBLE) / COUNT(*), 6) AS avg_quality
         |FROM embeddings e JOIN q ON e.vec_id = q.doc_id
         |WHERE q.q >= 0.5
         |GROUP BY label ORDER BY label""".stripMargin,

    // Rank-formula Gini from the same exact moments (row_number ties
    // broken by doc_id on both sides; Σ i·x through DECIMAL(38,0)).
    "q160_gini" ->
      """WITH t AS (
        |  SELECT source AS key, doc_id,
        |    CAST(len(list_filter(string_split_regex(trim(text), '\s+'), x -> x <> '')) AS BIGINT) AS x
        |  FROM documents),
        |r AS (SELECT key, x,
        |        row_number() OVER (PARTITION BY key ORDER BY x, doc_id) AS i
        |      FROM t),
        |a AS (SELECT key, COUNT(*) AS n, CAST(SUM(x) AS BIGINT) AS total,
        |        SUM(CAST(i AS DECIMAL(38,0)) * CAST(x AS DECIMAL(38,0))) AS s2
        |      FROM r GROUP BY key)
        |SELECT key, n, total,
        |  CAST(round((2.0 * CAST(s2 AS DOUBLE) / (CAST(n AS DOUBLE) * CAST(total AS DOUBLE))
        |    - (CAST(n AS DOUBLE) + 1.0) / CAST(n AS DOUBLE)) * 1e6) AS BIGINT) AS gini_micro
        |FROM a WHERE total > 0 ORDER BY key""".stripMargin,

    "q161_markov" ->
      """WITH p AS (
        |  SELECT event_type AS from_state,
        |    LEAD(event_type) OVER (PARTITION BY user_id ORDER BY ts) AS to_state
        |  FROM events),
        |c AS (SELECT from_state, to_state, COUNT(*) AS n
        |      FROM p WHERE to_state IS NOT NULL GROUP BY 1, 2),
        |t AS (SELECT from_state, CAST(SUM(n) AS BIGINT) AS row_total
        |      FROM c GROUP BY 1)
        |SELECT c.from_state, c.to_state, n,
        |  CAST(round(CAST(n AS DOUBLE) / CAST(row_total AS DOUBLE) * 1e6)
        |       AS BIGINT) AS p_micro
        |FROM c JOIN t USING (from_state)
        |ORDER BY from_state, to_state""".stripMargin,

    // The range frame [ts-7d, ts) in epoch micros replays Spark's
    // rangeBetween exactly; IGNORE NULLS skips other purchases.
    "q162_attribution" ->
      """WITH x AS (
        |  SELECT event_type, value, epoch_us(ts) AS e,
        |    last_value(CASE WHEN event_type <> 'purchase' THEN event_type END
        |               IGNORE NULLS) OVER w AS last_ch,
        |    first_value(CASE WHEN event_type <> 'purchase' THEN event_type END
        |                IGNORE NULLS) OVER w AS first_ch
        |  FROM events
        |  WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts)
        |               RANGE BETWEEN 604800000000 PRECEDING AND 1 PRECEDING)),
        |conv AS (SELECT *, CAST(round(value * 100) AS BIGINT) AS cents
        |         FROM x WHERE event_type = 'purchase')
        |SELECT touch, channel, COUNT(*) AS n_conversions,
        |  CAST(SUM(cents) AS BIGINT) AS revenue_cents
        |FROM (
        |  SELECT 'first' AS touch, first_ch AS channel, cents FROM conv
        |  UNION ALL
        |  SELECT 'last' AS touch, last_ch AS channel, cents FROM conv)
        |GROUP BY touch, channel
        |ORDER BY touch, channel NULLS FIRST""".stripMargin,

    // Canonical x<y<z triangle enumeration — orientation-free ground
    // truth for the degree-ordered Spark plan; per-corner credit via
    // unnest.
    "q163_triangles" ->
      """WITH lp AS (
        |  SELECT DISTINCT l_orderkey AS o, l_partkey AS p
        |  FROM lineitem WHERE l_partkey % 10 = 0),
        |e AS (
        |  SELECT DISTINCT LEAST(a.p, b.p) AS u, GREATEST(a.p, b.p) AS v
        |  FROM lp a JOIN lp b ON a.o = b.o AND a.p < b.p),
        |tri AS (
        |  SELECT e1.u AS x, e1.v AS y, e2.v AS z
        |  FROM e e1 JOIN e e2 ON e2.u = e1.v
        |  JOIN e e3 ON e3.u = e1.u AND e3.v = e2.v)
        |SELECT node, COUNT(*) AS n_triangles
        |FROM (SELECT unnest([x, y, z]) AS node FROM tri)
        |GROUP BY node ORDER BY node""".stripMargin,

    // Naive quadratic ground truth — the Spark side's binning must
    // prune candidates without changing the pair set.
    "q164_interval_overlap" ->
      """WITH iv AS (
        |  SELECT o_custkey AS k, o_orderkey AS id,
        |    CAST(o_orderdate AS DATE) AS s,
        |    CAST(o_orderdate AS DATE) + CAST(o_orderkey % 30 + 1 AS INTEGER) AS e
        |  FROM orders)
        |SELECT a.k AS k, a.id AS id_a, b.id AS id_b
        |FROM iv a JOIN iv b
        |  ON a.k = b.k AND a.id < b.id AND a.s <= b.e AND b.s <= a.e
        |ORDER BY 1, 2, 3""".stripMargin,

    // Same moment pivot, same fixed float order as the Spark side.
    "q165_welch" ->
      """WITH ev AS (
        |  SELECT event_type AS stratum,
        |    CASE WHEN user_id % 2 = 0 THEN 'a' ELSE 'b' END AS g,
        |    CAST(round(value * 1000) AS BIGINT) AS v
        |  FROM events),
        |m AS (
        |  SELECT stratum, g, COUNT(*) AS n, CAST(SUM(v) AS BIGINT) AS s,
        |    SUM(CAST(v AS DECIMAL(38,0)) * CAST(v AS DECIMAL(38,0))) AS ss
        |  FROM ev GROUP BY 1, 2),
        |p AS (
        |  SELECT stratum,
        |    MAX(CASE WHEN g = 'a' THEN n END) AS n_a,
        |    MAX(CASE WHEN g = 'a' THEN s END) AS s_a,
        |    MAX(CASE WHEN g = 'a' THEN ss END) AS ss_a,
        |    MAX(CASE WHEN g = 'b' THEN n END) AS n_b,
        |    MAX(CASE WHEN g = 'b' THEN s END) AS s_b,
        |    MAX(CASE WHEN g = 'b' THEN ss END) AS ss_b
        |  FROM m GROUP BY stratum)
        |SELECT stratum, n_a, n_b,
        |  CAST(round((CAST(s_a AS DOUBLE) / CAST(n_a AS DOUBLE)
        |    - CAST(s_b AS DOUBLE) / CAST(n_b AS DOUBLE)) * 1000) AS BIGINT)
        |    AS mean_diff_micro,
        |  CASE WHEN n_a >= 2 AND n_b >= 2 THEN
        |    CAST(round((CAST(s_a AS DOUBLE) / CAST(n_a AS DOUBLE)
        |        - CAST(s_b AS DOUBLE) / CAST(n_b AS DOUBLE))
        |      / sqrt(((CAST(ss_a AS DOUBLE) - CAST(s_a AS DOUBLE) * CAST(s_a AS DOUBLE)
        |               / CAST(n_a AS DOUBLE)) / (CAST(n_a AS DOUBLE) - 1.0))
        |            / CAST(n_a AS DOUBLE)
        |          + ((CAST(ss_b AS DOUBLE) - CAST(s_b AS DOUBLE) * CAST(s_b AS DOUBLE)
        |               / CAST(n_b AS DOUBLE)) / (CAST(n_b AS DOUBLE) - 1.0))
        |            / CAST(n_b AS DOUBLE)) * 1e6) AS BIGINT)
        |  END AS z_micro
        |FROM p WHERE n_a IS NOT NULL AND n_b IS NOT NULL
        |ORDER BY stratum""".stripMargin,

    // NOT EXISTS dominance ground truth for the window skyline.
    "q166_skyline" ->
      """WITH p AS (
        |  SELECT p_brand, p_partkey, p_size,
        |    CAST(round(p_retailprice * 100) AS BIGINT) AS price_cents
        |  FROM part)
        |SELECT p_brand, p_partkey, price_cents, p_size
        |FROM p a
        |WHERE NOT EXISTS (
        |  SELECT 1 FROM p b
        |  WHERE b.p_brand = a.p_brand
        |    AND b.price_cents <= a.price_cents AND b.p_size <= a.p_size
        |    AND (b.price_cents < a.price_cents OR b.p_size < a.p_size))
        |ORDER BY p_brand, p_partkey""".stripMargin,

    // list_reduce replays the (e + x) // 2 fold in ts order; values
    // are non-negative so // (floor) == Spark's div (trunc).
    "q167_ewma" ->
      """SELECT user_id, COUNT(*) AS n,
        |  list_reduce(list(CAST(round(value * 1000) AS BIGINT) ORDER BY ts),
        |              (a, b) -> (a + b) // 2) AS ewma_milli
        |FROM events GROUP BY user_id ORDER BY user_id""".stripMargin,

    // The basket cap replayed as a QUALIFY (q17 lesson: cap in query
    // AND oracle, key-for-key); no-op on this data, same predicate.
    "q168_assoc_rules" ->
      """WITH it AS (SELECT DISTINCT l_orderkey AS b, l_partkey AS i FROM lineitem),
        |capped AS (
        |  SELECT * FROM it QUALIFY COUNT(*) OVER (PARTITION BY b) <= 1000),
        |nb AS (SELECT COUNT(DISTINCT b) AS n FROM capped),
        |pairs AS (
        |  SELECT a.i AS item_a, c.i AS item_b, COUNT(*) AS n_ab
        |  FROM capped a JOIN capped c ON a.b = c.b AND a.i < c.i
        |  GROUP BY 1, 2 HAVING COUNT(*) >= 3),
        |supp AS (SELECT i, COUNT(*) AS n_i FROM capped GROUP BY 1)
        |SELECT item_a, item_b, n_ab, sa.n_i AS n_a, sb.n_i AS n_b,
        |  CAST(round(CAST(n_ab AS DOUBLE) / CAST(sa.n_i AS DOUBLE) * 1e6)
        |       AS BIGINT) AS conf_ab_micro,
        |  CAST(round(CAST(n_ab AS DOUBLE) / CAST(sb.n_i AS DOUBLE) * 1e6)
        |       AS BIGINT) AS conf_ba_micro,
        |  CAST(round(CAST(n_ab AS DOUBLE) * CAST(n AS DOUBLE)
        |    / (CAST(sa.n_i AS DOUBLE) * CAST(sb.n_i AS DOUBLE)) * 1e6)
        |       AS BIGINT) AS lift_micro
        |FROM pairs
        |JOIN supp sa ON sa.i = item_a
        |JOIN supp sb ON sb.i = item_b
        |CROSS JOIN nb
        |ORDER BY item_a, item_b""".stripMargin,

    // Expected micros interpolated from the SAME driver-side constants
    // the Spark operator embeds — no cross-engine log10 ever runs.
    "q169_benford" -> {
      val exp = operators.Stats.benfordExpectedMicro.toSeq.sorted
        .map { case (d, m) => s"($d, $m)" }.mkString(", ")
      s"""WITH src AS (
         |  SELECT o_orderpriority AS key,
         |    CAST(round(o_totalprice * 100) AS BIGINT) AS cents FROM orders),
         |pos AS (SELECT key, CAST(substr(CAST(cents AS VARCHAR), 1, 1) AS INTEGER) AS digit
         |        FROM src WHERE cents > 0),
         |counts AS (SELECT key, digit, CAST(COUNT(*) AS BIGINT) AS n_d
         |           FROM pos GROUP BY 1, 2),
         |totals AS (SELECT key, CAST(SUM(n_d) AS BIGINT) AS n FROM counts GROUP BY 1),
         |expd(digit, exp_micro) AS (VALUES $exp),
         |grid AS (SELECT t.key, e.digit, t.n, CAST(e.exp_micro AS BIGINT) AS exp_micro
         |         FROM totals t CROSS JOIN expd e)
         |SELECT g.key, g.digit, CAST(COALESCE(c.n_d, 0) AS BIGINT) AS n_d, g.n,
         |  CAST(round(1e6 * CAST(COALESCE(c.n_d, 0) AS DOUBLE) / CAST(g.n AS DOUBLE))
         |       AS BIGINT) AS obs_micro,
         |  g.exp_micro,
         |  CAST(round(1e6 * CAST(COALESCE(c.n_d, 0) AS DOUBLE) / CAST(g.n AS DOUBLE))
         |       AS BIGINT) - g.exp_micro AS dev_micro
         |FROM grid g LEFT JOIN counts c USING (key, digit)
         |ORDER BY key, digit""".stripMargin
    },

    // The KS argmax runs in exact integer cross-products (HUGEINT in
    // DuckDB, DECIMAL(38,0) in Spark); ONE float division at the end.
    "q170_ks_drift" ->
      """WITH src AS (
        |  SELECT o_orderpriority AS stratum, o_orderstatus AS g,
        |    CAST(round(o_totalprice * 100) AS BIGINT) AS v
        |  FROM orders WHERE o_orderstatus IN ('O', 'F')),
        |c AS (SELECT stratum, v,
        |        SUM(CASE WHEN g = 'O' THEN 1 ELSE 0 END) AS ca,
        |        SUM(CASE WHEN g = 'F' THEN 1 ELSE 0 END) AS cb
        |      FROM src GROUP BY 1, 2),
        |cum AS (SELECT stratum,
        |         SUM(ca) OVER w AS cuma, SUM(cb) OVER w AS cumb
        |        FROM c WINDOW w AS (PARTITION BY stratum ORDER BY v
        |          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)),
        |tot AS (SELECT stratum, CAST(SUM(ca) AS BIGINT) AS n_a,
        |          CAST(SUM(cb) AS BIGINT) AS n_b FROM c GROUP BY 1)
        |SELECT t.stratum, t.n_a, t.n_b,
        |  CAST(round(1e6 * CAST(MAX(ABS(cuma * t.n_b - cumb * t.n_a)) AS DOUBLE)
        |    / (CAST(t.n_a AS DOUBLE) * CAST(t.n_b AS DOUBLE))) AS BIGINT) AS d_micro
        |FROM cum JOIN tot t USING (stratum)
        |WHERE t.n_a > 0 AND t.n_b > 0
        |GROUP BY t.stratum, t.n_a, t.n_b
        |ORDER BY t.stratum""".stripMargin,

    "q171_top_paths" ->
      """WITH p AS (
        |  SELECT event_type AS p1,
        |    LEAD(event_type, 1) OVER w AS p2,
        |    LEAD(event_type, 2) OVER w AS p3
        |  FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts)),
        |c AS (SELECT p1, p2, p3, COUNT(*) AS n FROM p
        |      WHERE p3 IS NOT NULL GROUP BY 1, 2, 3)
        |SELECT p1, p2, p3, n FROM c
        |ORDER BY n DESC, p1, p2, p3 LIMIT 25""".stripMargin,

    // Shard merge is cell-wise addition, so the two-shard store must
    // answer exactly as one pass over all orders; the ceil-rank
    // (a + b−1) div b idiom is portable on non-negative numerators.
    "q173_hist_store" ->
      """WITH src AS (
        |  SELECT o_orderpriority AS key,
        |    LEAST(GREATEST((CAST(round(o_totalprice * 100) AS BIGINT) - 0) // 500000, 0), 63) AS bin
        |  FROM orders),
        |cells AS (SELECT key, bin, CAST(COUNT(*) AS BIGINT) AS n
        |          FROM src GROUP BY 1, 2),
        |cum AS (SELECT key, bin,
        |         SUM(n) OVER (PARTITION BY key ORDER BY bin
        |           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
        |        FROM cells),
        |tot AS (SELECT key, CAST(SUM(n) AS BIGINT) AS n FROM cells GROUP BY 1),
        |qs(q_micro) AS (VALUES (250000), (500000), (900000), (990000)),
        |r AS (SELECT t.key, q.q_micro, t.n,
        |        LEAST(GREATEST((q.q_micro * t.n + 999999) // 1000000, 1), t.n) AS rank
        |      FROM tot t CROSS JOIN qs q)
        |SELECT r.key, CAST(r.q_micro AS BIGINT) AS q_micro, r.n,
        |  CAST(MIN(c.bin) AS BIGINT) AS bin,
        |  CAST(0 + MIN(c.bin) * 500000 AS BIGINT) AS value_edge
        |FROM r JOIN cum c ON c.key = r.key AND c.cum >= r.rank
        |GROUP BY r.key, r.q_micro, r.n
        |ORDER BY r.key, q_micro""".stripMargin,

    // Replays the whole MDRM normalization chain the Spark side runs
    // over the synthesized export: snake-cased headers land as these
    // column names, the 12/31/9999 end date is the open-ended NULL
    // (surfaced as end_open to keep gate dtypes non-null), dates parse
    // M/d/yyyy, and the case pipeline (sentence case → U.S. → FFIEC →
    // Tier 1) resolves to a closed form over the lowercase p_name.
    "q175_mdrm_dict" ->
      """WITH b AS (
        |  SELECT CAST(p_partkey AS BIGINT) AS k, p_name AS nm,
        |    'RCON' || lpad(CAST(p_partkey AS VARCHAR), 5, '0') AS item
        |  FROM part)
        |SELECT item, 'RCON' AS mnemonic,
        |  lpad(CAST(k AS VARCHAR), 5, '0') AS item_code,
        |  'U.S. ' || nm || ' FFIEC Tier 1' AS item_name,
        |  CASE CAST(k % 3 AS INT) WHEN 0 THEN 'integer'
        |    WHEN 1 THEN 'string' ELSE 'date' END AS data_type,
        |  'FFIEC 031' AS reporting_form,
        |  CASE WHEN k % 2 = 0 THEN 'Y' ELSE 'N' END AS confidentiality,
        |  'Loans, net of ' || nm AS description,
        |  CASE WHEN k % 3 = 0 THEN 'F' ELSE 'D' END AS itemtype,
        |  make_date(CAST(2000 + k % 20 AS INT), CAST(k % 12 + 1 AS INT),
        |    CAST(k % 28 + 1 AS INT)) AS start_date,
        |  CAST(CASE WHEN k % 2 = 0 THEN 1 ELSE 0 END AS BIGINT) AS end_open,
        |  CASE WHEN k % 2 = 0 THEN DATE '1900-01-01'
        |    ELSE DATE '2010-06-30' END AS end_date_f
        |FROM b ORDER BY item""".stripMargin,

    // Naive token-inverted self-join — the prefix filter being
    // LOSSLESS means the exhaustive answer is the oracle.
    "q176_set_sim_join" ->
      """WITH tok AS (
        |  SELECT DISTINCT doc_id, lower(t) AS token
        |  FROM documents, UNNEST(list_filter(string_split_regex(trim(text), '\s+'),
        |    x -> x <> '')) AS u(t)
        |  WHERE doc_id % 3 = 0),
        |sz AS (SELECT doc_id, COUNT(*) AS s FROM tok GROUP BY 1),
        |pair AS (
        |  SELECT a.doc_id AS id_a, b.doc_id AS id_b, COUNT(*) AS inter
        |  FROM tok a JOIN tok b ON a.token = b.token AND a.doc_id < b.doc_id
        |  GROUP BY 1, 2)
        |SELECT id_a, id_b, sa.s AS size_a, sb.s AS size_b,
        |  CAST(inter AS BIGINT) AS inter,
        |  CAST((inter * 1000000) // (sa.s + sb.s - inter) AS BIGINT) AS jacc_micro
        |FROM pair JOIN sz sa ON sa.doc_id = id_a JOIN sz sb ON sb.doc_id = id_b
        |WHERE inter * 1000000 >= 700000 * (sa.s + sb.s - inter)
        |ORDER BY id_a, id_b""".stripMargin,

    "q177_fd_violations" ->
      """SELECT l_orderkey, COUNT(*) AS n_rows,
        |  COUNT(DISTINCT l_returnflag) AS n_distinct_rhs,
        |  CAST(MIN(l_returnflag) AS VARCHAR) AS rhs_min,
        |  CAST(MAX(l_returnflag) AS VARCHAR) AS rhs_max
        |FROM lineitem
        |GROUP BY 1 HAVING COUNT(DISTINCT l_returnflag) > 1
        |ORDER BY l_orderkey""".stripMargin,

    // 0-based pos replays zipWithIndex; the band join is a non-equi
    // range join DuckDB handles via IEJoin at oracle scale.
    "q178_sorted_neighborhood" ->
      """WITH k AS (
        |  SELECT c_custkey AS id,
        |    c_mktsegment || lpad(CAST(CAST(floor(c_acctbal) + 1000 AS BIGINT)
        |      AS VARCHAR), 5, '0') AS k
        |  FROM customer),
        |r AS (SELECT id, k,
        |        row_number() OVER (ORDER BY k, id) - 1 AS pos FROM k)
        |SELECT a.id AS id_a, b.id AS id_b, a.k AS key_a, b.k AS key_b,
        |  CAST(a.pos AS BIGINT) AS pos_a, CAST(b.pos AS BIGINT) AS pos_b,
        |  CAST(b.pos - a.pos AS BIGINT) AS gap
        |FROM r a JOIN r b ON b.pos - a.pos BETWEEN 1 AND 3
        |ORDER BY pos_a, pos_b""".stripMargin,

    // Descending row_number ranks (score DESC, id ASC) replay
    // rankNormalize-over-negated-score; rrf terms are integer
    // divisions so the sum is exact.
    "q179_rrf_fuse" ->
      """WITH t AS (
        |  SELECT doc_id, CAST(n_chars AS BIGINT) AS n_chars,
        |    CAST(len(list_filter(string_split_regex(trim(text), '\s+'),
        |      x -> x <> '')) AS BIGINT) AS n_tok
        |  FROM documents),
        |r AS (SELECT doc_id,
        |        CAST(row_number() OVER (ORDER BY CAST(n_chars AS DOUBLE) DESC,
        |          doc_id) AS BIGINT) AS rank_n_chars,
        |        CAST(row_number() OVER (ORDER BY CAST(n_tok AS DOUBLE) DESC,
        |          doc_id) AS BIGINT) AS rank_n_tok
        |      FROM t)
        |SELECT doc_id, rank_n_chars, rank_n_tok,
        |  CAST(1000000 // (60 + rank_n_chars)
        |     + 1000000 // (60 + rank_n_tok) AS BIGINT) AS rrf_micro
        |FROM r ORDER BY doc_id""".stripMargin,

    // Strict adjacent bigrams (docs with < 2 tokens contribute none);
    // the KN float formula replays Spark's fixed operation order.
    "q180_kn_bigram" ->
      s"""WITH toks AS (
         |  SELECT list_filter(string_split($normText, ' '), x -> x <> '') AS tk
         |  FROM documents),
         |bg AS (
         |  SELECT unnest(list_transform(range(1, len(tk)),
         |    i -> tk[i] || ' ' || tk[i+1])) AS bigram
         |  FROM toks WHERE len(tk) >= 2),
         |c AS (SELECT split_part(bigram, ' ', 1) AS w1,
         |        split_part(bigram, ' ', 2) AS w2, COUNT(*) AS c12
         |      FROM bg GROUP BY 1, 2),
         |l AS (SELECT w1, CAST(SUM(c12) AS BIGINT) AS c1,
         |        COUNT(*) AS n1p FROM c GROUP BY 1),
         |r AS (SELECT w2, COUNT(*) AS ncont FROM c GROUP BY 1),
         |d AS (SELECT COUNT(*) AS d FROM c)
         |SELECT w1, w2, c12, c1, n1p, ncont,
         |  CAST(round(1e6 * ((CAST(c12 AS DOUBLE) - 0.5) / CAST(c1 AS DOUBLE)
         |    + (CAST(n1p AS DOUBLE) / (2.0 * CAST(c1 AS DOUBLE)))
         |      * (CAST(ncont AS DOUBLE) / CAST(d AS DOUBLE)))) AS BIGINT)
         |    AS p_micro
         |FROM c JOIN l USING (w1) JOIN r USING (w2) CROSS JOIN d
         |WHERE c12 >= 5 ORDER BY w1, w2""".stripMargin,

    // Type-1 percentiles from distinct-value cumulative counts —
    // the operator's exact rank bounds in the same integer micros.
    "q181_winsorize" ->
      """WITH rowsrc AS (
        |  SELECT source AS key, doc_id AS id, CAST(n_chars AS BIGINT) AS x
        |  FROM documents),
        |g AS (SELECT key, x, COUNT(*) AS c FROM rowsrc
        |      WHERE x IS NOT NULL GROUP BY 1, 2),
        |cumt AS (SELECT key, x,
        |           SUM(c) OVER (PARTITION BY key ORDER BY x) AS cum,
        |           SUM(c) OVER (PARTITION BY key) AS n
        |         FROM g),
        |th AS (SELECT key,
        |         MIN(CASE WHEN cum >= greatest(1, (n * 50000 + 999999) // 1000000)
        |             THEN x END) AS x_lo,
        |         MIN(CASE WHEN cum >= greatest(1, (n * 950000 + 999999) // 1000000)
        |             THEN x END) AS x_hi
        |       FROM cumt GROUP BY 1)
        |SELECT key, id, x, x_lo, x_hi,
        |  CASE WHEN x IS NULL THEN NULL
        |       ELSE least(greatest(x, x_lo), x_hi) END AS x_wins
        |FROM rowsrc JOIN th USING (key)
        |ORDER BY key, id""".stripMargin,

    // Positional double-unnest (generate_subscripts) replays the
    // posexplode pair loop; HUGEINT products sum exactly.
    "q183_gram_matrix" ->
      """WITH e AS (
        |  SELECT vec_id, generate_subscripts(embedding, 1) - 1 AS i,
        |    CAST(round(CAST(unnest(embedding) AS DOUBLE) * 1000000) AS BIGINT)
        |      AS vi
        |  FROM embeddings)
        |SELECT CAST(a.i AS BIGINT) AS i, CAST(b.i AS BIGINT) AS j,
        |  CAST(SUM(CAST(a.vi AS HUGEINT) * b.vi) AS BIGINT) AS g
        |FROM e a JOIN e b ON a.vec_id = b.vec_id AND b.i >= a.i
        |GROUP BY 1, 2 ORDER BY i, j""".stripMargin,

    // The float term replays Spark's left-assoc (1e6 * pa) * ln(pa/pb)
    // with pa/pb in the identical (c+1)/(N+V) order.
    "q184_categorical_kl" ->
      """WITH ca AS (SELECT CAST(source AS VARCHAR) AS v, COUNT(*) AS c_a
        |            FROM documents WHERE doc_id % 2 = 0 GROUP BY 1),
        |cb AS (SELECT CAST(source AS VARCHAR) AS v, COUNT(*) AS c_b
        |       FROM documents WHERE doc_id % 2 = 1 GROUP BY 1),
        |j AS (SELECT v, CAST(COALESCE(c_a, 0) AS BIGINT) AS c_a,
        |        CAST(COALESCE(c_b, 0) AS BIGINT) AS c_b
        |      FROM ca FULL JOIN cb USING (v)),
        |t AS (SELECT CAST(SUM(c_a) AS BIGINT) AS na,
        |        CAST(SUM(c_b) AS BIGINT) AS nb, COUNT(*) AS vc FROM j)
        |SELECT v, c_a, c_b,
        |  CAST(round(1e6
        |    * ((CAST(c_a AS DOUBLE) + 1.0) / CAST(na + vc AS DOUBLE))
        |    * ln(((CAST(c_a AS DOUBLE) + 1.0) / CAST(na + vc AS DOUBLE))
        |       / ((CAST(c_b AS DOUBLE) + 1.0) / CAST(nb + vc AS DOUBLE))))
        |    AS BIGINT) AS kl_term_micro
        |FROM j CROSS JOIN t ORDER BY v""".stripMargin,

    // Both ranks are exact row_numbers over the same (x, id) total
    // order; the target-rank bridge is pure long arithmetic.
    "q185_quantile_normalize" ->
      """WITH rowsrc AS (
        |  SELECT source AS key, doc_id AS id, CAST(n_chars AS BIGINT) AS x
        |  FROM documents WHERE n_chars IS NOT NULL),
        |r AS (SELECT key, id, x,
        |        CAST(row_number() OVER (PARTITION BY key ORDER BY x, id)
        |          AS BIGINT) AS r,
        |        CAST(COUNT(*) OVER (PARTITION BY key) AS BIGINT) AS n_k,
        |        CAST(COUNT(*) OVER () AS BIGINT) AS n
        |      FROM rowsrc),
        |g AS (SELECT x AS gx,
        |        CAST(row_number() OVER (ORDER BY x, id) AS BIGINT) AS gpos
        |      FROM rowsrc)
        |SELECT key, id, x, r, n_k, gx AS x_norm
        |FROM r JOIN g ON (r * n + n_k - 1) // n_k = gpos
        |ORDER BY key, id""".stripMargin,

    // Exhaustive quadratic self-join — the lossless-ness check the
    // deletion-neighborhood join is graded against. DuckDB's
    // levenshtein is the same unit-cost edit distance as Spark's.
    "q186_editdist_pairs" ->
      """WITH c AS (SELECT c_custkey, c_name FROM customer
        |           WHERE c_nationkey < 5)
        |SELECT a.c_custkey AS id_a, b.c_custkey AS id_b,
        |  a.c_name AS s_a, b.c_name AS s_b,
        |  CAST(levenshtein(a.c_name, b.c_name) AS BIGINT) AS dist
        |FROM c a JOIN c b ON a.c_custkey < b.c_custkey
        |WHERE levenshtein(a.c_name, b.c_name) <= 1
        |ORDER BY id_a, id_b""".stripMargin,

    // Mode tie-break: highest count, then smallest value — both
    // sides pick via the same max-count filter + MIN.
    "q187_golden_record" ->
      """WITH base AS (SELECT c_nationkey AS cluster, c_acctbal, c_name,
        |                c_mktsegment FROM customer),
        |agg AS (SELECT cluster, CAST(COUNT(*) AS BIGINT) AS n_records,
        |          MAX(c_acctbal) AS c_acctbal_max, MIN(c_name) AS c_name_min
        |        FROM base GROUP BY 1),
        |cnt AS (SELECT cluster, c_mktsegment AS v, COUNT(*) AS cnt
        |        FROM base WHERE c_mktsegment IS NOT NULL GROUP BY 1, 2),
        |best AS (SELECT cluster, MAX(cnt) AS top FROM cnt GROUP BY 1),
        |pick AS (SELECT cluster, MIN(v) AS c_mktsegment_mode
        |         FROM cnt JOIN best USING (cluster) WHERE cnt = top
        |         GROUP BY 1)
        |SELECT cluster, n_records, c_acctbal_max, c_name_min,
        |  c_mktsegment_mode
        |FROM agg LEFT JOIN pick USING (cluster)
        |ORDER BY cluster""".stripMargin,

    // Half-unit rank sums over distinct-value counts; the z replays
    // Spark's fixed float order incl. the ±1 continuity correction
    // (2U units).
    "q188_mann_whitney" ->
      """WITH rowsrc AS (
        |  SELECT lang AS stratum,
        |    CASE WHEN source = 'src0' THEN 'a' ELSE 'b' END AS g,
        |    CAST(n_chars AS BIGINT) AS x
        |  FROM documents
        |  WHERE source IN ('src0', 'src1') AND n_chars IS NOT NULL),
        |grp AS (SELECT stratum, x,
        |          SUM(CASE WHEN g = 'a' THEN 1 ELSE 0 END) AS ca,
        |          SUM(CASE WHEN g = 'b' THEN 1 ELSE 0 END) AS cb
        |        FROM rowsrc GROUP BY 1, 2),
        |cum AS (SELECT stratum, x, ca, cb, ca + cb AS c,
        |          COALESCE(SUM(ca + cb) OVER (PARTITION BY stratum ORDER BY x
        |            ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS o
        |        FROM grp),
        |agg AS (SELECT stratum, CAST(SUM(ca) AS BIGINT) AS n_a,
        |          CAST(SUM(cb) AS BIGINT) AS n_b,
        |          CAST(SUM(CAST(ca AS HUGEINT) * (2 * o + c + 1)) AS BIGINT)
        |            AS r2_a,
        |          SUM(CAST(c AS HUGEINT) * c * c - c) AS ties
        |        FROM cum GROUP BY 1),
        |u AS (SELECT stratum, n_a, n_b, r2_a,
        |        CAST(r2_a - n_a * (n_a + 1) AS BIGINT) AS u2_a,
        |        n_a + n_b AS n, ties
        |      FROM agg),
        |f AS (SELECT *,
        |        CAST(u2_a AS DOUBLE)
        |          - CAST(n_a AS DOUBLE) * CAST(n_b AS DOUBLE) AS diff,
        |        (CAST(n_a AS DOUBLE) * CAST(n_b AS DOUBLE) / 3.0)
        |          * ((CAST(n AS DOUBLE) + 1.0)
        |            - CAST(ties AS DOUBLE)
        |              / (CAST(n AS DOUBLE) * (CAST(n AS DOUBLE) - 1.0)))
        |          AS s2
        |      FROM u)
        |SELECT stratum, n_a, n_b, r2_a, u2_a,
        |  CASE WHEN n_a >= 1 AND n_b >= 1 AND n >= 2 AND s2 > 0
        |    THEN CAST(round((CASE WHEN diff > 0 THEN diff - 1.0
        |                          WHEN diff < 0 THEN diff + 1.0
        |                          ELSE 0.0 END / sqrt(s2)) * 1e6) AS BIGINT)
        |  END AS z_micro
        |FROM f ORDER BY stratum""".stripMargin,

    // DuckDB ASOF joins replay both linear merges (pred on x, succ on
    // the negated axis); tie-low pick in the same CASE order.
    "q189_nn_match" ->
      """WITH a AS (SELECT lang AS stratum, doc_id AS id,
        |             CAST(n_chars AS BIGINT) AS x
        |           FROM documents
        |           WHERE source = 'src0' AND n_chars IS NOT NULL),
        |b AS (SELECT lang AS stratum, CAST(n_chars AS BIGINT) AS bx
        |      FROM documents
        |      WHERE source = 'src1' AND n_chars IS NOT NULL),
        |p AS (SELECT a.stratum, a.id, a.x, b.bx AS x_lo
        |      FROM a ASOF LEFT JOIN b
        |        ON a.stratum = b.stratum AND b.bx <= a.x),
        |nb AS (SELECT stratum, -bx AS nbx, bx FROM b),
        |na AS (SELECT stratum, id, -x AS nx FROM a),
        |s AS (SELECT na.stratum, na.id, nb.bx AS x_hi
        |      FROM na ASOF LEFT JOIN nb
        |        ON na.stratum = nb.stratum AND nb.nbx <= na.nx),
        |m AS (SELECT stratum, id, x,
        |        CASE WHEN x_lo IS NULL THEN x_hi
        |             WHEN x_hi IS NULL THEN x_lo
        |             WHEN x - x_lo <= x_hi - x THEN x_lo
        |             ELSE x_hi END AS x_match
        |      FROM p JOIN s USING (stratum, id))
        |SELECT stratum, id, x, x_match, ABS(x - x_match) AS gap
        |FROM m ORDER BY stratum, id""".stripMargin,

    // Closed-form ground truth: after the mod-6 chains, the mod-3
    // chains, and the (1,2) bridge, components are {≡0 mod 3} (rep 3
    // — id 0 never appears in any k>6 / k>3 edge) and {≡1 ∪ ≡2 mod 3}
    // (rep 1); ids 1..max all appear as edge endpoints.
    "q191_cc_store" ->
      """SELECT CAST(c_custkey AS BIGINT) AS id,
        |  CAST(CASE WHEN c_custkey % 3 = 0 THEN 3 ELSE 1 END AS BIGINT)
        |    AS rep
        |FROM customer WHERE c_custkey >= 1 AND c_custkey < 2000
        |ORDER BY id""".stripMargin,

    // 3×3 Cramer replay: HUGEINT moments, the identical cofactor
    // expansion order, DuckDB dow+1 == Spark dayofweek.
    "q196_ols2" ->
      """WITH e AS (
        |  SELECT event_type AS key, CAST(hour(ts) AS BIGINT) AS x1,
        |    CAST(EXTRACT(dow FROM ts) + 1 AS BIGINT) AS x2,
        |    CAST(round(value * 1000) AS BIGINT) AS y
        |  FROM events WHERE value IS NOT NULL),
        |m AS (SELECT key, CAST(COUNT(*) AS BIGINT) AS n,
        |        CAST(SUM(x1) AS BIGINT) AS s1, CAST(SUM(x2) AS BIGINT) AS s2,
        |        CAST(SUM(y) AS BIGINT) AS sy,
        |        SUM(CAST(x1 AS HUGEINT) * x1) AS s11,
        |        SUM(CAST(x1 AS HUGEINT) * x2) AS s12,
        |        SUM(CAST(x2 AS HUGEINT) * x2) AS s22,
        |        SUM(CAST(x1 AS HUGEINT) * y) AS s1y,
        |        SUM(CAST(x2 AS HUGEINT) * y) AS s2y
        |      FROM e GROUP BY 1),
        |f AS (SELECT key, n,
        |        CAST(n AS DOUBLE) AS an, CAST(s1 AS DOUBLE) AS a12,
        |        CAST(s2 AS DOUBLE) AS a13, CAST(s11 AS DOUBLE) AS a22,
        |        CAST(s12 AS DOUBLE) AS a23, CAST(s22 AS DOUBLE) AS a33,
        |        CAST(sy AS DOUBLE) AS r1, CAST(s1y AS DOUBLE) AS r2,
        |        CAST(s2y AS DOUBLE) AS r3
        |      FROM m),
        |dets AS (SELECT key, n,
        |    an*(a22*a33 - a23*a23) - a12*(a12*a33 - a23*a13)
        |      + a13*(a12*a23 - a22*a13) AS det,
        |    r1*(a22*a33 - a23*a23) - a12*(r2*a33 - a23*r3)
        |      + a13*(r2*a23 - a22*r3) AS det0,
        |    an*(r2*a33 - r3*a23) - r1*(a12*a33 - a23*a13)
        |      + a13*(a12*r3 - r2*a13) AS det1,
        |    an*(a22*r3 - a23*r2) - a12*(a12*r3 - r2*a13)
        |      + r1*(a12*a23 - a22*a13) AS det2,
        |    abs(an*a22*a33) + 1.0 AS scale_ref
        |  FROM f)
        |SELECT key, n,
        |  CASE WHEN n >= 3 AND abs(det) > scale_ref * 1e-9
        |    THEN CAST(round(det0 / det * 1e6) AS BIGINT) END AS b0_micro,
        |  CASE WHEN n >= 3 AND abs(det) > scale_ref * 1e-9
        |    THEN CAST(round(det1 / det * 1e6) AS BIGINT) END AS b1_micro,
        |  CASE WHEN n >= 3 AND abs(det) > scale_ref * 1e-9
        |    THEN CAST(round(det2 / det * 1e6) AS BIGINT) END AS b2_micro
        |FROM dets ORDER BY key""".stripMargin,

    // Group moments exact; the s²/n ratio is quantized to micros per
    // group BEFORE the stratum sum (order-independent), F replays
    // Spark's fixed float order.
    "q197_anova" ->
      """WITH g AS (
        |  SELECT lang AS stratum, source AS grp,
        |    CAST(COUNT(*) AS BIGINT) AS ng,
        |    CAST(SUM(CAST(n_chars AS BIGINT)) AS BIGINT) AS sg,
        |    SUM(CAST(n_chars AS HUGEINT) * n_chars) AS ssg
        |  FROM documents WHERE n_chars IS NOT NULL AND source IS NOT NULL
        |  GROUP BY 1, 2),
        |q AS (SELECT stratum, ng, sg, ssg,
        |        CAST(round((CAST(sg AS DOUBLE) * CAST(sg AS DOUBLE)
        |          / CAST(ng AS DOUBLE)) * 1e6) AS HUGEINT) AS rq6
        |      FROM g),
        |a AS (SELECT stratum, CAST(SUM(ng) AS BIGINT) AS n,
        |        CAST(COUNT(*) AS BIGINT) AS k,
        |        CAST(SUM(sg) AS BIGINT) AS s, SUM(ssg) AS ss,
        |        SUM(rq6) AS rq6
        |      FROM q GROUP BY 1),
        |f AS (SELECT stratum, n, k,
        |        CAST(rq6 AS DOUBLE) / 1e6
        |          - CAST(s AS DOUBLE) * CAST(s AS DOUBLE)
        |            / CAST(n AS DOUBLE) AS ssb,
        |        CAST(ss AS DOUBLE) - CAST(rq6 AS DOUBLE) / 1e6 AS ssw
        |      FROM a)
        |SELECT stratum, n, k,
        |  CASE WHEN k >= 2 AND n > k AND ssw > 0
        |    THEN CAST(round((ssb / (CAST(k AS DOUBLE) - 1.0))
        |      / (ssw / (CAST(n AS DOUBLE) - CAST(k AS DOUBLE))) * 1e6)
        |      AS BIGINT) END AS f_micro
        |FROM f ORDER BY stratum""".stripMargin,

    // Exact desc ranks over distinct-score runs (oracle may window
    // freely — the operator's two-phase ranks are the same integers),
    // integer slice cuts, HUGEINT-safe lift micros.
    "q198_lift" ->
      """WITH rowsrc AS (
        |  SELECT CAST(round(value * 1000) AS BIGINT) AS x,
        |    (event_type = 'purchase') AS y
        |  FROM events WHERE value IS NOT NULL),
        |g AS (SELECT x, CAST(COUNT(*) AS BIGINT) AS c,
        |        CAST(SUM(CAST(y AS BIGINT)) AS BIGINT) AS p
        |      FROM rowsrc GROUP BY 1),
        |t AS (SELECT CAST(SUM(c) AS BIGINT) AS n_tot,
        |        CAST(SUM(p) AS BIGINT) AS p_tot FROM g),
        |o AS (SELECT x, c, p,
        |        COALESCE(SUM(c) OVER (ORDER BY x DESC
        |          ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS o
        |      FROM g),
        |s AS (SELECT (o * 10) // n_tot AS slice, SUM(c) AS n, SUM(p) AS pos
        |      FROM o CROSS JOIN t GROUP BY 1),
        |cumt AS (SELECT slice, CAST(n AS BIGINT) AS n,
        |           CAST(pos AS BIGINT) AS pos,
        |           CAST(SUM(n) OVER (ORDER BY slice) AS BIGINT) AS cum_n,
        |           CAST(SUM(pos) OVER (ORDER BY slice) AS BIGINT) AS cum_pos
        |         FROM s)
        |SELECT CAST(slice AS BIGINT) AS slice, n, pos, cum_n, cum_pos,
        |  CASE WHEN p_tot > 0 THEN
        |    CAST((CAST(cum_pos AS HUGEINT) * n_tot * 1000000)
        |      // (CAST(cum_n AS HUGEINT) * p_tot) AS BIGINT) END AS lift_micro
        |FROM cumt CROSS JOIN t ORDER BY slice""".stripMargin,

    // The (c_ab/N)·ln(c_ab·N/(c_a·c_b)) term in the identical float
    // order over identical exact counts.
    "q199_mutual_info" ->
      """WITH cells AS (
        |  SELECT CAST(source AS VARCHAR) AS a, CAST(lang AS VARCHAR) AS b,
        |    CAST(COUNT(*) AS BIGINT) AS c_ab
        |  FROM documents WHERE source IS NOT NULL AND lang IS NOT NULL
        |  GROUP BY 1, 2),
        |ma AS (SELECT a, CAST(SUM(c_ab) AS BIGINT) AS c_a FROM cells GROUP BY 1),
        |mb AS (SELECT b, CAST(SUM(c_ab) AS BIGINT) AS c_b FROM cells GROUP BY 1),
        |t AS (SELECT CAST(SUM(c_ab) AS BIGINT) AS n FROM cells)
        |SELECT a, b, c_ab, c_a, c_b, n,
        |  CAST(round((CAST(c_ab AS DOUBLE) / CAST(n AS DOUBLE))
        |    * ln(CAST(c_ab AS DOUBLE) * CAST(n AS DOUBLE)
        |      / (CAST(c_a AS DOUBLE) * CAST(c_b AS DOUBLE))) * 1e6)
        |    AS BIGINT) AS mi_term_micro
        |FROM cells JOIN ma USING (a) JOIN mb USING (b) CROSS JOIN t
        |ORDER BY a, b""".stripMargin,

    // Peel fixpoint in closed form: only the 8-clique survives k = 3,
    // in-core degree 7 for every member.
    "q194_kcore" ->
      """SELECT CAST(c_custkey AS BIGINT) AS id, CAST(7 AS BIGINT) AS degree
        |FROM customer WHERE c_custkey < 8 ORDER BY id""".stripMargin,

    // Chain hops in closed form: dist = id div 300 (sources < 300 at
    // 0); every id below the cap is reachable.
    "q195_bfs" ->
      """SELECT CAST(c_custkey AS BIGINT) AS id,
        |  CAST(c_custkey // 300 AS BIGINT) AS dist
        |FROM customer WHERE c_custkey < 3000 ORDER BY id""".stripMargin,

    // Exhaustive shared-token join (lossless for τ > 0 since a
    // qualifying pair shares ≥ 1 token); the integer verify and the
    // floor-over-IEEE-sqrt cos replay the operator bit-for-bit.
    "q192_cosine_pairs" ->
      """WITH tok AS (
        |  SELECT DISTINCT doc_id, lower(t) AS token
        |  FROM documents, UNNEST(list_filter(string_split_regex(trim(text), '\s+'),
        |    x -> x <> '')) AS u(t)
        |  WHERE doc_id % 3 = 1),
        |sz AS (SELECT doc_id, COUNT(*) AS s FROM tok GROUP BY 1),
        |pair AS (
        |  SELECT a.doc_id AS id_a, b.doc_id AS id_b, COUNT(*) AS inter
        |  FROM tok a JOIN tok b ON a.token = b.token AND a.doc_id < b.doc_id
        |  GROUP BY 1, 2)
        |SELECT id_a, id_b, sa.s AS size_a, sb.s AS size_b,
        |  CAST(inter AS BIGINT) AS inter,
        |  CAST(FLOOR(CAST(inter AS DOUBLE) * 1000000
        |    / sqrt(CAST(sa.s * sb.s AS DOUBLE))) AS BIGINT) AS cos_micro
        |FROM pair JOIN sz sa ON sa.doc_id = id_a
        |  JOIN sz sb ON sb.doc_id = id_b
        |WHERE CAST(inter AS HUGEINT) * inter * 1000000000000
        |  >= CAST(360000000000 AS HUGEINT) * sa.s * sb.s
        |ORDER BY id_a, id_b""".stripMargin,

    // Integer bin arithmetic replayed with the same clamp (floor-vs-
    // truncate div differences die in the GREATEST(0)); -1 sentinel
    // for empty bins per the comparator dtype contract.
    "q193_calibration" ->
      """WITH ev AS (
        |  SELECT CAST(round(value * 1000) AS BIGINT) AS v,
        |    (event_type = 'purchase') AS y
        |  FROM events WHERE value IS NOT NULL),
        |b AS (SELECT LEAST(GREATEST((v * 10) // 100000, 0), 9) AS bin,
        |        CAST(y AS BIGINT) AS y
        |      FROM ev),
        |c AS (SELECT bin, CAST(COUNT(*) AS BIGINT) AS n,
        |        CAST(SUM(y) AS BIGINT) AS pos
        |      FROM b GROUP BY 1),
        |spine AS (SELECT unnest(range(0, 10)) AS bin)
        |SELECT CAST(bin AS BIGINT) AS bin,
        |  CAST(bin * 10000 AS BIGINT) AS lo_milli,
        |  CAST((bin + 1) * 10000 AS BIGINT) AS hi_milli,
        |  COALESCE(n, 0) AS n, COALESCE(pos, 0) AS pos,
        |  COALESCE((pos * 1000000) // n, -1) AS rate_micro
        |FROM spine LEFT JOIN c USING (bin) ORDER BY bin""".stripMargin,

    // The (d, d+1) pair join and the exact HUGEINT moments; r_micro
    // replays Spark's (cov/sqrt(vx*vy))*1e6 order.
    "q190_autocorr" ->
      """WITH daily AS (SELECT event_type AS key, CAST(ts AS DATE) AS d,
        |                 CAST(COUNT(*) AS BIGINT) AS v
        |               FROM events GROUP BY 1, 2),
        |pairs AS (SELECT a.key, a.v AS x, b.v AS y
        |          FROM daily a JOIN daily b
        |            ON a.key = b.key AND b.d = a.d + 1),
        |m AS (SELECT key, CAST(COUNT(*) AS BIGINT) AS np,
        |        CAST(SUM(x) AS BIGINT) AS sx, CAST(SUM(y) AS BIGINT) AS sy,
        |        SUM(CAST(x AS HUGEINT) * y) AS sxy,
        |        SUM(CAST(x AS HUGEINT) * x) AS sxx,
        |        SUM(CAST(y AS HUGEINT) * y) AS syy
        |      FROM pairs GROUP BY 1),
        |f AS (SELECT key, np,
        |        CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE)
        |          / CAST(np AS DOUBLE) AS cov,
        |        CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)
        |          / CAST(np AS DOUBLE) AS vx,
        |        CAST(syy AS DOUBLE) - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE)
        |          / CAST(np AS DOUBLE) AS vy
        |      FROM m)
        |SELECT key, np AS n_pairs,
        |  CASE WHEN np >= 2 AND vx > 0 AND vy > 0
        |    THEN CAST(round(cov / sqrt(vx * vy) * 1e6) AS BIGINT)
        |  END AS r_micro
        |FROM f ORDER BY key""".stripMargin,

    // HUGEINT floor-division replays Spark's DECIMAL(38,0) `div`.
    "q182_chi2_cells" ->
      """WITH c AS (SELECT source AS a, lang AS b, COUNT(*) AS o
        |           FROM documents GROUP BY 1, 2),
        |rt AS (SELECT a, CAST(SUM(o) AS BIGINT) AS row_total FROM c GROUP BY 1),
        |ct AS (SELECT b, CAST(SUM(o) AS BIGINT) AS col_total FROM c GROUP BY 1),
        |n AS (SELECT CAST(SUM(o) AS BIGINT) AS n FROM c)
        |SELECT a, b, o, row_total, col_total,
        |  CAST((CAST(row_total AS HUGEINT) * col_total * 1000000) // n
        |    AS BIGINT) AS e_micro,
        |  CAST(((CAST(o AS HUGEINT) * n - CAST(row_total AS HUGEINT) * col_total)
        |      * (CAST(o AS HUGEINT) * n - CAST(row_total AS HUGEINT) * col_total)
        |      * 1000000)
        |    // (CAST(row_total AS HUGEINT) * col_total * n) AS BIGINT)
        |    AS contrib_micro
        |FROM c JOIN rt USING (a) JOIN ct USING (b) CROSS JOIN n
        |ORDER BY a, b""".stripMargin,

    "q172_readability" ->
      """SELECT doc_id, n_words, n_sentences, n_syllables,
        |  CAST(round(1e6 * (206.835
        |    - 1.015 * (CAST(n_words AS DOUBLE) / CAST(n_sentences AS DOUBLE))
        |    - 84.6 * (CAST(n_syllables AS DOUBLE) / CAST(n_words AS DOUBLE))))
        |    AS BIGINT) AS flesch_micro
        |FROM (
        |  SELECT doc_id,
        |    CAST(len(list_filter(string_split_regex(trim(text), '\s+'), x -> x <> '')) AS BIGINT) AS n_words,
        |    GREATEST(CAST(1 AS BIGINT),
        |      CAST(len(regexp_extract_all(text, '[.!?]+')) AS BIGINT)) AS n_sentences,
        |    CAST(len(regexp_extract_all(lower(text), '[aeiouy]+')) AS BIGINT) AS n_syllables
        |  FROM documents WHERE doc_id % 7 = 2) x
        |WHERE n_words > 0
        |ORDER BY doc_id""".stripMargin,

    // Base rows enter at ts NULL (sorted last under DESC NULLS LAST)
    // so any log row beats the base; op DESC is a dead tie-break kept
    // for parity with the operator's total order.
    "q159_cdc_apply" ->
      """WITH log AS (
        |  SELECT o_custkey AS k, o_orderdate AS ts,
        |    CASE WHEN o_orderstatus = 'F' THEN 'D' ELSE 'U' END AS op,
        |    o_totalprice AS bal, o_orderpriority AS seg, o_orderkey AS seq
        |  FROM orders),
        |base AS (
        |  SELECT c_custkey AS k, CAST(NULL AS TIMESTAMP) AS ts, 'U' AS op,
        |    c_acctbal AS bal, c_mktsegment AS seg, CAST(NULL AS BIGINT) AS seq
        |  FROM customer),
        |u AS (SELECT * FROM base UNION ALL SELECT * FROM log),
        |r AS (SELECT *, row_number() OVER (PARTITION BY k
        |        ORDER BY ts DESC NULLS LAST, seq DESC NULLS LAST, op DESC) AS rn
        |      FROM u)
        |SELECT k, bal, seg FROM r WHERE rn = 1 AND op <> 'D' ORDER BY k""".stripMargin,

    "q36_asof_join" -> asofOracleSql,

    // Same ground truth as q36 — the bucketed two-phase merge must be
    // observationally identical to the linear form.
    "q70_asof_bucketed" -> asofOracleSql
  )


  /** The q112 measured-grid replay, shared with the q118 auto-pick
    * wrapper. */
  private lazy val lshGridOracleSql: String = {
    def bandCte(name: String, bands: Int, r: Int): String =
      s"""$name AS (
         |  SELECT doc_id, bnd,
         |         md5(array_to_string(sig[bnd*$r+1 : bnd*$r+$r], ',')) AS bucket
         |  FROM sig CROSS JOIN (SELECT unnest(range($bands)) AS bnd) x),
         |${name}c AS (
         |  SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
         |  FROM $name a JOIN $name b
         |    ON a.bnd = b.bnd AND a.bucket = b.bucket AND a.doc_id < b.doc_id)"""
        .stripMargin
    def metric(bands: Int, r: Int, c: String): String =
      s"""SELECT $bands AS bands, $r AS rows_per_band,
         |  (SELECT COUNT(*) FROM $c) AS n_candidates,
         |  (SELECT COUNT(*) FROM truth) AS n_truth,
         |  (SELECT COUNT(*) FROM $c x JOIN truth t
         |     ON x.id_a = t.id_a AND x.id_b = t.id_b) AS hits""".stripMargin
    s"""$shinglesSql,
       |capped AS (
       |  SELECT * FROM ex QUALIFY COUNT(*) OVER (PARTITION BY shingle) <= 1000),
       |truth AS (
       |  SELECT id_a, id_b FROM (
       |    SELECT a.doc_id AS id_a, b.doc_id AS id_b,
       |           COUNT(*) * 1.0 / (a.n_sh + b.n_sh - COUNT(*)) AS jaccard
       |    FROM capped a JOIN capped b
       |      ON a.shingle = b.shingle AND a.doc_id < b.doc_id
       |    GROUP BY a.doc_id, b.doc_id, a.n_sh, b.n_sh) p
       |  WHERE jaccard >= 0.35),
       |hs AS (SELECT doc_id, ${md5Hash64Sql("shingle")} AS h FROM ex),
       |slot AS (
       |  SELECT doc_id, j, MIN(xor(h, salt)) AS m
       |  FROM hs CROSS JOIN (VALUES ${xorSaltsSql(64, 42L)}) s(j, salt)
       |  GROUP BY doc_id, j),
       |sig AS (SELECT doc_id, list(m ORDER BY j) AS sig FROM slot GROUP BY doc_id),
       |${bandCte("g1", 16, 4)},
       |${bandCte("g2", 4, 16)},
       |${bandCte("g3", 32, 2)},
       |m AS (
       |  ${metric(16, 4, "g1c")}
       |  UNION ALL ${metric(4, 16, "g2c")}
       |  UNION ALL ${metric(32, 2, "g3c")})
       |SELECT CAST(bands AS INT) AS bands,
       |  CAST(rows_per_band AS INT) AS rows_per_band,
       |  CAST(n_candidates AS BIGINT) AS n_candidates,
       |  CAST(n_truth AS BIGINT) AS n_truth,
       |  CAST(hits AS BIGINT) AS hits,
       |  CASE WHEN n_candidates = 0 THEN 1.0
       |       ELSE CAST(hits AS DOUBLE) / n_candidates END AS "precision",
       |  CASE WHEN n_truth = 0 THEN 1.0
       |       ELSE CAST(hits AS DOUBLE) / n_truth END AS recall
       |FROM m ORDER BY bands, rows_per_band""".stripMargin
  }

  /** Generated DuckDB replay for [[graft.operators.KeyChecks
    * .compositeKeys]]: every combo's exact distinct/null counts in one
    * aggregate, then the lattice-implication CASE per row. A combo is
    * implied iff ANY proper subset's distinct count equals n — the
    * transitive closure of the operator's level-by-level key set
    * (supersets of keys are keys, so subset d = n is exactly
    * "contains a key"). Implied rows carry the -1 sentinels. */
  private def compositeKeysOracleSql(table: String, cols: Seq[String],
                                     maxArity: Int): String = {
    val combos = (1 to maxArity).flatMap(a =>
      cols.combinations(a).map(_.toList)).toList
    def alias(s: List[String]) = s.mkString("_").replaceAll("[^a-zA-Z0-9_]", "")
    val aggs = combos.flatMap { s =>
      val nullCond = s.map(c => s"$c IS NULL").mkString(" OR ")
      Seq(
        s"CAST(COUNT(DISTINCT row(${s.mkString(", ")})) AS BIGINT) AS d_${alias(s)}",
        s"CAST(COALESCE(SUM(CASE WHEN $nullCond THEN 1 ELSE 0 END), 0) AS BIGINT) AS m_${alias(s)}")
    }
    val rows = combos.map { s =>
      val subs = (1 until s.length).flatMap(a => s.combinations(a)).toList
      val cond =
        if (subs.isEmpty) "FALSE"
        else subs.map(sub => s"d_${alias(sub)} = n").mkString(" OR ")
      val d = s"d_${alias(s)}"; val m = s"m_${alias(s)}"
      s"""SELECT '${s.mkString(",")}' AS columns, ${s.length} AS arity, n,
         |    CASE WHEN $cond THEN -1 ELSE $d END AS n_distinct,
         |    CASE WHEN $cond THEN -1 ELSE $m END AS n_nulls,
         |    CASE WHEN $cond THEN TRUE ELSE $d = n END AS is_key,
         |    CASE WHEN $cond THEN FALSE ELSE $d = n END AS is_minimal_key
         |  FROM s""".stripMargin
    }
    s"""WITH s AS (SELECT CAST(COUNT(*) AS BIGINT) AS n,
       |  ${aggs.mkString(",\n  ")}
       |FROM $table)
       |SELECT columns, CAST(arity AS BIGINT) AS arity, n, n_distinct,
       |  n_nulls, is_key, is_minimal_key
       |FROM (${rows.mkString("\n  UNION ALL ")})
       |ORDER BY arity, columns""".stripMargin
  }

  /** Generated DuckDB replay for [[graft.operators.Stats.corrMatrix]]:
    * per pair, the six pairwise-complete exact moments as HUGEINTs in
    * one aggregate, then the Pearson close in the operator's fixed
    * float order (exact-integer → double casts on both engines round
    * identically). */
  private def corrMatrixOracleSql(srcSelect: String,
                                  cols: Seq[String]): String = {
    val pairs = cols.combinations(2).map { case Seq(a, b) => (a, b) }.toSeq
    val aggs = pairs.zipWithIndex.flatMap { case ((a, b), i) =>
      val both = s"$a IS NOT NULL AND $b IS NOT NULL"
      Seq(
        s"CAST(COUNT(CASE WHEN $both THEN 1 END) AS BIGINT) AS n_$i",
        s"COALESCE(SUM(CASE WHEN $both THEN CAST($a AS HUGEINT) END), 0) AS sx_$i",
        s"COALESCE(SUM(CASE WHEN $both THEN CAST($b AS HUGEINT) END), 0) AS sy_$i",
        s"COALESCE(SUM(CASE WHEN $both THEN CAST($a AS HUGEINT) * $a END), 0) AS sxx_$i",
        s"COALESCE(SUM(CASE WHEN $both THEN CAST($b AS HUGEINT) * $b END), 0) AS syy_$i",
        s"COALESCE(SUM(CASE WHEN $both THEN CAST($a AS HUGEINT) * $b END), 0) AS sxy_$i")
    }
    val rows = pairs.zipWithIndex.map { case ((a, b), i) =>
      val vx = s"CAST(n_$i AS DOUBLE) * CAST(sxx_$i AS DOUBLE) " +
        s"- CAST(sx_$i AS DOUBLE) * CAST(sx_$i AS DOUBLE)"
      val vy = s"CAST(n_$i AS DOUBLE) * CAST(syy_$i AS DOUBLE) " +
        s"- CAST(sy_$i AS DOUBLE) * CAST(sy_$i AS DOUBLE)"
      val cov = s"CAST(n_$i AS DOUBLE) * CAST(sxy_$i AS DOUBLE) " +
        s"- CAST(sx_$i AS DOUBLE) * CAST(sy_$i AS DOUBLE)"
      s"""SELECT '$a' AS col_a, '$b' AS col_b, n_$i AS n,
         |  CASE WHEN n_$i >= 2 AND $vx > 0 AND $vy > 0
         |    THEN CAST(round(($cov) / (sqrt($vx) * sqrt($vy)) * 1e6)
         |      AS BIGINT)
         |  END AS corr_micro FROM m""".stripMargin
    }
    s"""WITH src AS ($srcSelect),
       |m AS (SELECT
       |  ${aggs.mkString(",\n  ")}
       |FROM src)
       |SELECT col_a, col_b, n, corr_micro
       |FROM (${rows.mkString("\n  UNION ALL ")})
       |ORDER BY col_a, col_b""".stripMargin
  }

  /** Generated DuckDB replay of the greedy k-center traversal: one
    * chained CTE per round — pick i is the argmax of 1 − max(6-dp
    * cosines to centers 1..i−1), ties to the smallest id, previous
    * picks excluded — exactly the operator's per-round aggregate. */
  private def kCenterOracleSql(k: Int): String = {
    val sb = new StringBuilder
    sb ++= "WITH e AS (SELECT CAST(vec_id AS BIGINT) AS id, " +
      "embedding AS vec FROM embeddings),\n"
    sb ++= "c1 AS (SELECT MIN(id) AS id, CAST(0 AS BIGINT) " +
      "AS dist_micro FROM e),\n"
    sb ++= "v1 AS (SELECT e.vec FROM e JOIN c1 ON e.id = c1.id),\n"
    for (i <- 2 to k) {
      val sims = (1 until i).map(j => s"ROUND(${cosSql("e.vec", s"v$j.vec")}, 6)")
      val g = if (sims.size == 1) sims.head
        else s"GREATEST(${sims.mkString(", ")})"
      val joins = (1 until i).map(j => s"v$j").mkString(", ")
      val excl = (1 until i).map(j => s"SELECT id FROM c$j")
        .mkString(" UNION ALL ")
      sb ++= s"s$i AS (SELECT e.id, 1.0 - $g AS d FROM e, $joins " +
        s"WHERE e.id NOT IN ($excl)),\n"
      sb ++= s"c$i AS (SELECT id, CAST(round(d * 1e6) AS BIGINT) " +
        s"AS dist_micro FROM s$i ORDER BY d DESC, id LIMIT 1),\n"
      sb ++= s"v$i AS (SELECT e.vec FROM e JOIN c$i ON e.id = c$i.id),\n"
    }
    val sel = (1 to k).map(i =>
      s"SELECT $i AS rank, id, dist_micro FROM c$i").mkString("\nUNION ALL ")
    sb ++= s"out AS ($sel)\n"
    sb ++= "SELECT CAST(rank AS BIGINT) AS rank, id, dist_micro " +
      "FROM out ORDER BY rank"
    sb.toString
  }

  /** The q65 kNN-graph replay (k=3, c=16, nprobe=2, portable md5
    * hash) extended with the margin close: neighborhood sums as exact
    * BIGINT micros, margin in the operator's fixed float order. */
  private lazy val marginPairsOracleSql =
    s"""WITH hashed AS (
       |  SELECT vec_id, embedding,
       |    ${md5Hash64Sql("CAST(vec_id AS VARCHAR)")} AS h
       |  FROM embeddings),
       |cents AS (
       |  SELECT h AS cell, CAST(embedding AS DOUBLE[]) AS cvec
       |  FROM hashed ORDER BY h LIMIT 16),
       |assign AS (
       |  SELECT hd.vec_id AS id, hd.embedding AS vec, c.cell,
       |    row_number() OVER (PARTITION BY hd.vec_id
       |      ORDER BY list_cosine_similarity(CAST(hd.embedding AS DOUBLE[]), c.cvec) DESC,
       |               c.cell DESC) AS rn
       |  FROM hashed hd CROSS JOIN cents c),
       |cells AS (SELECT id, vec, cell FROM assign WHERE rn = 1),
       |qa AS (
       |  SELECT query_id, qvec, cell FROM (
       |    SELECT q.vec_id AS query_id, q.embedding AS qvec, c.cell,
       |      row_number() OVER (PARTITION BY q.vec_id
       |        ORDER BY list_cosine_similarity(CAST(q.embedding AS DOUBLE[]), c.cvec) DESC,
       |                 c.cell DESC) AS rk
       |    FROM embeddings q CROSS JOIN cents c) x
       |  WHERE rk <= 2),
       |scored AS (
       |  SELECT qa.query_id, cl.id AS neighbor_id,
       |    ROUND(${cosSql("cl.vec", "qa.qvec")}, 6) AS sim
       |  FROM cells cl JOIN qa ON cl.cell = qa.cell
       |  WHERE cl.id <> qa.query_id),
       |g AS (
       |  SELECT query_id, neighbor_id, sim,
       |    row_number() OVER (PARTITION BY query_id
       |                       ORDER BY sim DESC, neighbor_id ASC) AS rank
       |  FROM scored QUALIFY rank <= 3),
       |deg AS (
       |  SELECT query_id AS id,
       |    CAST(SUM(CAST(round(sim * 1e6) AS BIGINT)) AS BIGINT) AS s,
       |    CAST(COUNT(*) AS BIGINT) AS n
       |  FROM g GROUP BY 1)
       |SELECT g.query_id, g.neighbor_id, g.sim, g.rank,
       |  CAST(round(
       |    CAST(CAST(round(g.sim * 1e6) AS BIGINT) AS DOUBLE)
       |      / ((CAST(dq.s AS DOUBLE) / CAST(dq.n AS DOUBLE)
       |          + CAST(dn.s AS DOUBLE) / CAST(dn.n AS DOUBLE)) / 2.0)
       |    * 1e6) AS BIGINT) AS margin_micro
       |FROM g
       |JOIN deg dq ON dq.id = g.query_id
       |JOIN deg dn ON dn.id = g.neighbor_id
       |ORDER BY g.query_id, g.rank""".stripMargin

  private lazy val ivfOracleSql =
    s"""WITH hashed AS (
         |  SELECT vec_id, embedding,
         |    ${md5Hash64Sql("CAST(vec_id AS VARCHAR)")} AS h
         |  FROM embeddings),
         |cents AS (
         |  SELECT h AS cell, CAST(embedding AS DOUBLE[]) AS cvec
         |  FROM hashed ORDER BY h LIMIT 16),
         |assign AS (
         |  SELECT hd.vec_id AS id, hd.embedding AS vec, c.cell,
         |    row_number() OVER (PARTITION BY hd.vec_id
         |      ORDER BY list_cosine_similarity(CAST(hd.embedding AS DOUBLE[]), c.cvec) DESC,
         |               c.cell DESC) AS rn
         |  FROM hashed hd CROSS JOIN cents c),
         |cells AS (SELECT id, vec, cell FROM assign WHERE rn = 1),
         |qa AS (
         |  SELECT query_id, qvec, cell FROM (
         |    SELECT q.vec_id AS query_id, q.embedding AS qvec, c.cell,
         |      row_number() OVER (PARTITION BY q.vec_id
         |        ORDER BY list_cosine_similarity(CAST(q.embedding AS DOUBLE[]), c.cvec) DESC,
         |                 c.cell DESC) AS rk
         |    FROM embeddings q CROSS JOIN cents c WHERE q.vec_id % 100 = 0) x
         |  WHERE rk <= 4),
         |scored AS (
         |  SELECT qa.query_id, cl.id AS neighbor_id,
         |    ROUND(${cosSql("cl.vec", "qa.qvec")}, 6) AS sim
         |  FROM cells cl JOIN qa ON cl.cell = qa.cell
         |  WHERE cl.id <> qa.query_id),
         |ranked AS (
         |  SELECT query_id, neighbor_id, sim,
         |    row_number() OVER (PARTITION BY query_id
         |                       ORDER BY sim DESC, neighbor_id ASC) AS rank
         |  FROM scored)
         |SELECT query_id, neighbor_id, sim, rank FROM ranked WHERE rank <= 5
         |ORDER BY query_id, rank""".stripMargin

  private lazy val asofOracleSql =
    """WITH o1 AS (
      |  SELECT o_custkey, o_orderdate, o_orderkey, o_totalprice
      |  FROM orders
      |  QUALIFY row_number() OVER (PARTITION BY o_custkey, o_orderdate
      |                             ORDER BY o_orderkey) = 1)
      |SELECT e.event_id, e.user_id, o.o_orderkey,
      |  CAST(floor(epoch(o.o_orderdate)) AS BIGINT) AS order_epoch,
      |  o.o_totalprice
      |FROM events e
      |ASOF LEFT JOIN o1 o
      |  ON e.user_id = o.o_custkey AND e.ts >= o.o_orderdate
      |ORDER BY e.event_id""".stripMargin
}
