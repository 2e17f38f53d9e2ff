package graft

import graft.functions.CosineSim
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** SparkSessionExtensions entry point: registers graft's native functions
  * for SQL users, so the engine composes with plain `spark.sql(...)`:
  *
  *   spark.sql.extensions=graft.GraftExtensions
  *   SELECT cosine_sim(a.embedding, b.embedding) FROM ...
  *
  * The injection-based registration is the supported way for a library to
  * extend Spark SQL without touching a session's function registry by hand.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      new FunctionIdentifier("cosine_sim"),
      new ExpressionInfo(classOf[CosineSim].getName, "cosine_sim"),
      (children: Seq[Expression]) => {
        require(children.length == 2, "cosine_sim(a, b) takes two array arguments")
        CosineSim(children.head, children(1))
      }))
  }
}
