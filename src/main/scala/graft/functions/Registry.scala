package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.Expression

/** Session-registry guard for graft's native Catalyst functions.
  *
  * Every catalog query calls its operator's `register(spark)` so the
  * SQL name is usable, but `createOrReplaceTempFunction` logs
  * "replaced a previously registered function" on each repeat — one
  * WARN per query per bench pass. Registration is once-per-SESSION by
  * contract: the builder closures are stateless, so the first
  * registration is as good as the last, and re-registering buys
  * nothing but log noise.
  */
private[graft] object Registry {

  /** Register `name` only if the session doesn't already know it. */
  def once(spark: SparkSession, name: String)(
      builder: Seq[Expression] => Expression): Unit = {
    val reg = spark.sessionState.functionRegistry
    if (!reg.functionExists(FunctionIdentifier(name)))
      reg.createOrReplaceTempFunction(name, builder, "built-in")
  }
}
