package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.{Hashes, Vectors}

/** Product quantization for compressed-vector ANN: vectors split into
  * `m` subspaces, each encoded as the id of its nearest codeword —
  * dim×4 bytes become m bytes (e.g. 64-dim float → 8 bytes, 32×
  * smaller), which is what lets a 100 TB embedding corpus fit a
  * shortlist scan. Search scores candidates with asymmetric distance
  * computation (ADC): per query a (m × k) dot-product table against
  * the codewords, candidate score = Σ_s table[s][code_s] ≈ q·v; an
  * exact re-rank over the shortlist recovers the precision the codes
  * lose. Pairs with Knn.writeIvfIndex (probe cells, then ADC inside).
  *
  * Codebook training uses the same deterministic hash-sampling as IVF
  * centroids — broadcast-scale metadata, reproducible across runs.
  */
object Pq {

  /** Codebooks: [subspace][codeword][subDim], trained by deterministic
    * hash-sampling `k` corpus vectors and slicing them (per-subspace
    * codewords come from the same sampled set — the cheap, replayable
    * baseline; swap in per-subspace k-means offline for quality). */
  def trainCodebooks(corpus: DataFrame, idCol: String, vecCol: String,
                     m: Int, k: Int, dim: Int): Array[Array[Array[Double]]] = {
    require(dim % m == 0, s"dim $dim must divide into $m subspaces")
    val subDim = dim / m
    val n = corpus.count()
    val stride = math.max(1L, n / k)
    val sampled = corpus
      .select(Hashes.md5Hash64(col(idCol)).as("h"),
        transform(col(vecCol), _.cast("double")).as("v"))
      .where(pmod(col("h"), lit(stride)) === 0)
      .orderBy("h").limit(k)
      .collect()
      .map(_.getSeq[Double](1).toArray)
    require(sampled.nonEmpty, "no codebook samples")
    Array.tabulate(m) { s =>
      sampled.map(v => v.slice(s * subDim, (s + 1) * subDim))
    }
  }

  /** Encode every vector as m codeword ids (nearest by L2 within each
    * subspace). Pure per-row expression over the broadcast codebooks —
    * zero shuffle, same shape as Knn.assignCells. */
  def encode(df: DataFrame, idCol: String, vecCol: String,
             codebooks: Array[Array[Array[Double]]]): DataFrame = {
    val m = codebooks.length
    val subDim = codebooks(0)(0).length
    val codeCols = (0 until m).map { s =>
      val cwArr = array(codebooks(s).map(cw =>
        array(cw.map(lit(_)): _*)): _*)
      val sub = slice(transform(col(vecCol), _.cast("double")),
        s * subDim + 1, subDim)
      // argmin_c ||sub - cw_c||² as a min over (dist, idx) structs
      val scored = transform(cwArr, cw =>
        aggregate(zip_with(sub, cw, (x, y) => (x - y) * (x - y)),
          lit(0.0), (acc, v) => acc + v))
      array_position(scored, array_min(scored)).cast("int") - 1
    }
    df.select(col(idCol).as("id"), col(vecCol).as("vec"),
      array(codeCols: _*).as("codes"))
  }

  /** ADC + exact re-rank: shortlist `shortlist` candidates per query by
    * the table-lookup score, then rank the shortlist by exact cosine.
    * Queries broadcast; the corpus side touches only (id, codes) until
    * the re-rank join pulls vectors for the shortlist — at scale the
    * codes table is the 32×-smaller scan. */
  def search(encoded: DataFrame, queries: DataFrame, queryId: String,
             queryVec: String, codebooks: Array[Array[Array[Double]]],
             k: Int, shortlist: Int = 50): DataFrame = {
    val m = codebooks.length
    val subDim = codebooks(0)(0).length
    // per-query ADC tables: tables[s][c] = dot(q_sub_s, cw_c)
    val tableCol = array((0 until m).map { s =>
      val qSub = slice(transform(col("qvec"), _.cast("double")),
        s * subDim + 1, subDim)
      array(codebooks(s).map { cw =>
        aggregate(zip_with(qSub, array(cw.map(lit(_)): _*),
          (x, y) => x * y), lit(0.0), (acc, v) => acc + v)
      }: _*)
    }: _*)
    val q = broadcast(queries
      .select(col(queryId).as("query_id"), col(queryVec).as("qvec"))
      .withColumn("tables", tableCol))
    val scored = encoded.join(q)
      .where(col("id") =!= col("query_id"))
      .select(col("query_id"), col("id").as("neighbor_id"),
        aggregate(sequence(lit(0), lit(m - 1)), lit(0.0), (acc, s) =>
          acc + element_at(element_at(col("tables"), s + 1),
            element_at(col("codes"), s + 1) + 1)).as("sim"))
    // shortlist via the bounded TopK aggregator (map-side partial
    // heaps), NOT a window — the corpus-sized stream never shuffles
    val short = Knn.topKPerQuery(scored, shortlist)
      .select("query_id", "neighbor_id")
    val exact = broadcast(short)
      .join(encoded.select(col("id").as("neighbor_id"), col("vec")), Seq("neighbor_id"))
      .join(broadcast(queries.select(col(queryId).as("query_id"),
        col(queryVec).as("qvec"))), Seq("query_id"))
      .select(col("query_id"), col("neighbor_id"),
        round(Vectors.cosine(col("vec"), col("qvec")), 6).as("sim"))
    Knn.topKPerQuery(exact, k)
  }

  /** Compression ratio of the code layout vs float32 vectors. */
  def compressionRatio(dim: Int, m: Int): Double = (dim * 4.0) / m
}
