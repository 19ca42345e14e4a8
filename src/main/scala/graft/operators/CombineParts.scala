package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Combine multipart schedule files into one wide table: full outer
  * join on the key, coalescing columns that overlap between parts
  * left-to-right (ref: /root/reference/R/ffiec_process.R:14
  * combine_call_parts).
  *
  * Scale notes: parts of one schedule share the IDRSSD key domain, so
  * the join key is high-cardinality and uniform — a plain shuffle join
  * partitions well. All parts are joined in a single `Reduce` chain,
  * which Catalyst collapses into one multi-way join stage; AQE picks
  * broadcast for small trailing parts automatically.
  */
object CombineParts {

  def combine(parts: Seq[DataFrame], key: String = "IDRSSD"): DataFrame = {
    require(parts.nonEmpty, "combine needs at least one part")
    parts.reduce { (x, y) =>
      val overlap = x.columns.toSet.intersect(y.columns.toSet) - key
      val yRenamed = overlap.foldLeft(y)((d, c) => d.withColumnRenamed(c, c + "__y"))
      val joined = x.join(yRenamed, Seq(key), "full_outer")
      val merged = overlap.foldLeft(joined) { (d, c) =>
        d.withColumn(c, coalesce(col(c), col(c + "__y"))).drop(c + "__y")
      }
      merged
    }
  }

  /** Validate multipart structure the way the reference does before
    * combining (ref: ffiec_process.R:106 resolve_n_parts + the
    * contiguity checks at ffiec_process.R:181-221): claimed count (from
    * filenames) must equal found count, part numbers must be exactly
    * 1..n with no gaps or duplicates. */
  def resolveNParts(partNums: Seq[Option[Int]], claimed: Seq[Option[Int]],
                    context: String): Int = {
    val found = partNums.size
    val claimedMax = claimed.flatten.reduceOption(_ max _)
    claimedMax.foreach { c =>
      require(c == found,
        s"Multipart count mismatch for $context: claimed n_parts=$c, found $found file(s).")
    }
    if (found > 1) {
      require(partNums.forall(_.isDefined),
        s"Missing part number for multipart schedule $context.")
      val nums = partNums.flatten.sorted
      require(nums.distinct.size == nums.size,
        s"Duplicate part numbers for schedule $context.")
      require(nums == (1 to found).toList,
        s"Non-contiguous part numbers for schedule $context: found {${nums.mkString(", ")}}.")
    }
    claimedMax.getOrElse(found)
  }
}
