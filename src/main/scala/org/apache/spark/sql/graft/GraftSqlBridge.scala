package org.apache.spark.sql.graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.classic

/** The one `private[sql]` doorway graft uses: wrap a Catalyst LogicalPlan
  * as a DataFrame. Spark exposes plan-level extension seams (strategies,
  * rules) publicly but keeps `Dataset.ofRows` package-private, so a library
  * that contributes its own logical node needs this one-line bridge in an
  * `org.apache.spark.sql` subpackage — the established pattern among Spark
  * ecosystem libraries. Nothing else in the repo lives outside `graft.*`.
  */
object GraftSqlBridge {
  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    classic.Dataset.ofRows(spark.asInstanceOf[classic.SparkSession], plan)
}
