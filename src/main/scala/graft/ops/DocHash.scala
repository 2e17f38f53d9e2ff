package graft.ops

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** The content-free deterministic sampling hash every rebalancing operator
  * orders by: the top 6 hex chars (24 bits) of md5(prefix || doc_id), as a
  * long. One definition so the split/pack/sample/temp/mix/cap operators and
  * their DuckDB oracles (`('0x' || substr(md5(prefix || CAST(doc_id AS
  * VARCHAR)), 1, 6))::BIGINT`) can never drift apart one site at a time.
  * The prefix decorrelates the operators' orders from each other (a doc
  * early in the split order is not also early in every sample).
  */
private[ops] object DocHash {
  def hash24(prefix: String): Column =
    conv(substring(md5(concat(lit(prefix), col("doc_id").cast("string"))), 1, 6), 16, 10)
      .cast("long")
}
