package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Continuous cleaning entry points whose corpus-level statistics are
  * LEARNED batch-side and applied statelessly to the stream — the
  * lambda-architecture half of the cleaner family (the stateless
  * cleaners need no twin at all; StreamCleanSpec proves they run
  * verbatim on micro-batches).
  */
object StreamClean {

  /** Continuous per-domain boilerplate removal: the chrome set comes
    * from a batch [[graft.operators.Dedup.domainBoilerplateLines]]
    * pass over the historical corpus ((__dom, h) line-md5 rows);
    * arriving documents filter their lines against it IN-ROW after a
    * stream-static join — no streaming state, no watermark, nothing
    * to expire, and the application step is byte-identical to
    * [[graft.operators.Dedup.removeDomainBoilerplate]]'s for the same
    * chrome set (the parity the spec asserts). The static side
    * aggregates the chrome rows to one (domain → hash list) row per
    * domain — chrome lists are short by construction (lines above a
    * share threshold), so the joined payload is bounded.
    * Works verbatim on a batch frame too. Output: (id, clean_text,
    * n_lines, n_removed). */
  def boilerplateFilterStream(docs: DataFrame, idCol: String,
                              domainCol: String, textCol: String,
                              boiler: DataFrame,
                              sep: String = "\n"): DataFrame = {
    val lists = boiler.groupBy(col("__dom"))
      .agg(collect_list(col("h")).as("__bl"))
    def isChrome(p: org.apache.spark.sql.Column) =
      array_contains(col("__bl"), md5(p.cast("binary")))
    docs.select(col(idCol), col(domainCol).as("__dom"),
        split(coalesce(col(textCol), lit("")),
          java.util.regex.Pattern.quote(sep)).as("paras"))
      .join(lists, Seq("__dom"), "left")
      .select(col(idCol),
        array_join(
          filter(col("paras"), p => col("__bl").isNull || !isChrome(p)),
          sep).as("clean_text"),
        size(col("paras")).as("n_lines"),
        when(col("__bl").isNull, lit(0))
          .otherwise(size(filter(col("paras"), p => isChrome(p))))
          .as("n_removed"))
  }
}
