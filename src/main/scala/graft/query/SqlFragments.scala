package graft.query

import org.apache.spark.sql.{DataFrame, SparkSession}

/**
 * Raw-SQL fragment assembly replicating `geodb_get_pg`
 * (xcube-geodb geodb.sql:1147-1167): the reference string-splices
 * `SELECT {select} FROM {table} [WHERE {where}] [GROUP BY {group}]
 * [ORDER BY {order}] [LIMIT n [OFFSET m]]` and EXECUTEs it. Here the Spark
 * SQL parser plays PostgreSQL's role over a temp view, and Catalyst plans it.
 *
 * Reference quirk preserved: OFFSET is only honored together with LIMIT
 * (geodb.sql:1161-1167).
 */
object SqlFragments {

  /** Rewrite the small Postgres-isms Spark's parser rejects. */
  private[query] def dialect(fragment: String): String = {
    // `expr::type` cast → CAST(expr AS type); conservative token-level rewrite.
    "(?i)([\\w.'\"\\)\\]]+)::(\\w+)".r.replaceAllIn(fragment, m =>
      scala.util.matching.Regex.quoteReplacement(
        s"CAST(${m.group(1)} AS ${m.group(2)})"))
  }

  def run(
      spark: SparkSession,
      df: DataFrame,
      select: String = "*",
      where: Option[String] = None,
      group: Option[String] = None,
      order: Option[String] = None,
      limit: Option[Int] = None,
      offset: Option[Int] = None): DataFrame = {
    val view = s"graft_pg_${java.util.UUID.randomUUID.toString.replace("-", "")}"
    df.createOrReplaceTempView(view)
    val sb = new StringBuilder(s"SELECT ${dialect(select)} FROM $view")
    where.filter(_.nonEmpty).foreach(w => sb.append(s" WHERE ${dialect(w)}"))
    group.filter(_.nonEmpty).foreach(g => sb.append(s" GROUP BY ${dialect(g)}"))
    order.filter(_.nonEmpty).foreach(o => sb.append(s" ORDER BY ${dialect(o)}"))
    limit.foreach { l =>
      sb.append(s" LIMIT $l")
      offset.foreach(o => sb.append(s" OFFSET $o")) // offset requires limit
    }
    try spark.sql(sb.toString())
    finally spark.catalog.dropTempView(view)
  }
}
