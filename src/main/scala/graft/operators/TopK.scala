package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.analysis.UnresolvedAttribute
import org.apache.spark.sql.catalyst.expressions.{Ascending, Descending,
  SortOrder}
import org.apache.spark.sql.graftbridge.Bridge
import graft.plans.TopKPerKey

/** User-facing entry for the custom per-key top-k operator
  * ([[graft.plans.TopKPerKey]] — see its scaladoc for the two-phase
  * physical plan and why it beats the window-function formulation at
  * scale).
  */
object TopK {

  /** First k rows per key group under `orderBy`.
    *
    * @param keys    grouping column names
    * @param orderBy (column, ascending) pairs; append a unique column
    *                (e.g. the primary key) to make ranking total —
    *                row_number semantics need a total order to be
    *                deterministic
    * @param k       rows kept per key
    */
  def perKey(df: DataFrame, keys: Seq[String],
      orderBy: Seq[(String, Boolean)], k: Int): DataFrame = {
    graft.GraftExtensions.register(df.sparkSession)
    val keyExprs = keys.map(n => UnresolvedAttribute.quoted(n))
    val ord = orderBy.map { case (c, asc) =>
      SortOrder(UnresolvedAttribute.quoted(c),
        if (asc) Ascending else Descending)
    }
    Bridge.ofRows(df.sparkSession,
      TopKPerKey(keyExprs, ord, k, Bridge.planOf(df)))
  }
}
