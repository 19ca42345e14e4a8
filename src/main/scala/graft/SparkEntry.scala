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
/** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    queries("q03_join_agg")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2 — the
    * driver contract, concatenated from the per-family registries
    * under [[graft.entry]] (round-10 split of the former 12k-line
    * monolith; key sets are disjoint by construction — every gate
    * name is unique — so ++ order is immaterial). */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    graft.entry.GatesRelational.queries ++
    graft.entry.GatesEtl.queries ++
    graft.entry.GatesDedup.queries ++
    graft.entry.GatesVectorStore.queries ++
    graft.entry.GatesMetrics.queries ++
    graft.entry.GatesSimilarity.queries ++
    graft.entry.GatesRetrieval.queries ++
    graft.entry.GatesTextAnalysis.queries ++
    graft.entry.GatesEvents.queries ++
    graft.entry.GatesGraphAnn.queries ++
    graft.entry.GatesAnalyticsCore.queries ++
    graft.entry.GatesAnalyticsPipeline.queries ++
    graft.entry.GatesProductAnalytics.queries ++
    graft.entry.GatesAnalyticsStats.queries ++
    graft.entry.GatesAnalyticsInference.queries ++
    graft.entry.GatesAnalyticsShapes.queries ++
    graft.entry.GatesTpch.queries

  /** For each key in queries, equivalent SQL runnable by DuckDB on the
    * same parquet tables. Non-SQL-expressible ops are omitted (driver
    * records a rows-only check). */
  def oracleSql: Map[String, String] =
    graft.entry.GatesRelational.oracles ++
    graft.entry.GatesEtl.oracles ++
    graft.entry.GatesDedup.oracles ++
    graft.entry.GatesVectorStore.oracles ++
    graft.entry.GatesMetrics.oracles ++
    graft.entry.GatesSimilarity.oracles ++
    graft.entry.GatesRetrieval.oracles ++
    graft.entry.GatesTextAnalysis.oracles ++
    graft.entry.GatesEvents.oracles ++
    graft.entry.GatesGraphAnn.oracles ++
    graft.entry.GatesAnalyticsCore.oracles ++
    graft.entry.GatesAnalyticsPipeline.oracles ++
    graft.entry.GatesProductAnalytics.oracles ++
    graft.entry.GatesAnalyticsStats.oracles ++
    graft.entry.GatesAnalyticsInference.oracles ++
    graft.entry.GatesAnalyticsShapes.oracles ++
    graft.entry.GatesTpch.oracles
}
