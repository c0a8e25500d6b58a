package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Session-safe helper for the SQL-surface operators: registers each
  * input DataFrame under an op-scoped, collision-free temp-view name,
  * runs the SQL with the scoped names substituted in, then drops the
  * views again. A library operator must never clobber a user's
  * same-named temp view ("documents", "lineitem", ...), and must not
  * leave session state behind — the `(spark, dir) => DataFrame`
  * contract is otherwise pure. The DuckDB oracle SQL keeps the bare
  * fixture names (the oracle harness registers bare views); only the
  * Spark-side text is rewritten.
  *
  * Dropping the views right after `spark.sql` returns is safe: the
  * returned Dataset captures the ANALYZED plan, so later optimization/
  * execution never re-resolves the view names. */
private[operators] object SqlViews {
  def withViews(spark: SparkSession, views: (String, DataFrame)*)(sql: String): DataFrame = {
    val suffix = java.util.UUID.randomUUID().toString.replace("-", "")
    val scoped = views.map { case (name, df) => (name, s"graft_${name}_$suffix", df) }
    scoped.foreach { case (_, viewName, df) => df.createOrReplaceTempView(viewName) }
    // word-boundary substitution: a bare replace() would also rewrite
    // the table name inside string literals, aliases like
    // `documents_total`, or a view name that is a substring of another
    try spark.sql(scoped.foldLeft(sql) { case (s, (name, viewName, _)) =>
      s.replaceAll("\\b" + java.util.regex.Pattern.quote(name) + "\\b",
        java.util.regex.Matcher.quoteReplacement(viewName))
    })
    finally scoped.foreach { case (_, viewName, _) => spark.catalog.dropTempView(viewName) }
  }
}
