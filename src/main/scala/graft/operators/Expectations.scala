package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Declarative data-quality expectations, compiled into ONE scan — the
  * Deequ/Great-Expectations shape: a pipeline asserts a contract over
  * a table (nullability, uniqueness, ranges, enums, row counts,
  * referential integrity) and gets back one PASS/FAIL row per
  * expectation, cheap enough to run before every downstream stage.
  *
  * Scale shape: every single-table expectation contributes aggregate
  * expressions to a single map-side-combined aggregation, so N checks
  * cost one corpus pass regardless of N (the Deequ trick). The one-row
  * result is checkpointed and unpivoted to long rows — the qr04
  * ablation pattern: report branches read the 1-row frame, never the
  * corpus. Referential integrity is the one inherently-join-shaped
  * check, planned as a left-anti count per foreign key.
  *
  * All metrics are exact counts / min / max plus one rounded IEEE
  * division, so the report is deterministic and oracle-checkable —
  * unlike sampled profilers, a red row here is a fact.
  */
object Expectations {

  sealed trait Check
  /** null fraction of `column` must be ≤ maxNullFrac. */
  final case class NotNull(column: String, maxNullFrac: Double = 0.0) extends Check
  /** duplicate surplus (non-null count − distinct count) must be 0. */
  final case class Unique(column: String) extends Check
  /** min(column) must be ≥ atLeast. */
  final case class MinValue(column: String, atLeast: Double) extends Check
  /** max(column) must be ≤ atMost. */
  final case class MaxValue(column: String, atMost: Double) extends Check
  /** count of non-null values outside `allowed` must be 0. */
  final case class InSet(column: String, allowed: Seq[String]) extends Check
  /** row count must lie in [lo, hi]; reported threshold is hi. */
  final case class RowCountBetween(lo: Long, hi: Long) extends Check
  /** every non-matching `column` value (nulls included — a null FK
    * cannot join) counts as an orphan; orphans must be 0. */
  final case class ForeignKey(column: String, ref: DataFrame,
                              refColumn: String, refName: String) extends Check

  /** Evaluate `checks` against `df`. Output (long format, one row per
    * check): expectation, col_name, metric, threshold, pass. */
  def suite(df: DataFrame, checks: Seq[Check]): DataFrame = {
    require(checks.nonEmpty, "at least one check required")
    val aggCols = Seq.newBuilder[Column]
    aggCols += count(lit(1)).as("n_rows")
    checks.zipWithIndex.foreach { case (c, i) =>
      c match {
        case NotNull(cn, _) =>
          aggCols += sum(when(col(cn).isNull, 1L).otherwise(0L)).as(s"m$i")
        case Unique(cn) =>
          aggCols += countDistinct(col(cn)).as(s"d$i")
          aggCols += count(col(cn)).as(s"m$i")
        case MinValue(cn, _) => aggCols += min(col(cn)).cast("double").as(s"m$i")
        case MaxValue(cn, _) => aggCols += max(col(cn)).cast("double").as(s"m$i")
        case InSet(cn, allowed) =>
          aggCols += sum(when(col(cn).isNotNull && !col(cn).isin(allowed: _*), 1L)
            .otherwise(0L)).as(s"m$i")
        case _: RowCountBetween => ()
        case _: ForeignKey => ()
      }
    }
    val cols = aggCols.result()
    // one corpus pass; the 1-row result is the report's only input
    val a = df.agg(cols.head, cols.tail: _*).localCheckpoint(true)
    val rows: Seq[DataFrame] = checks.zipWithIndex.map { case (c, i) =>
      c match {
        case NotNull(cn, maxFrac) =>
          val v = round(col(s"m$i").cast("double") / col("n_rows").cast("double"), 6)
          report(a, "not_null", cn, v, maxFrac, v <= lit(maxFrac))
        case Unique(cn) =>
          val v = (col(s"m$i") - col(s"d$i")).cast("double")
          report(a, "unique", cn, v, 0.0, v <= lit(0.0))
        case MinValue(cn, atLeast) =>
          report(a, "min_value", cn, col(s"m$i"), atLeast,
            coalesce(col(s"m$i") >= lit(atLeast), lit(false)))
        case MaxValue(cn, atMost) =>
          report(a, "max_value", cn, col(s"m$i"), atMost,
            coalesce(col(s"m$i") <= lit(atMost), lit(false)))
        case InSet(cn, _) =>
          val v = col(s"m$i").cast("double")
          report(a, "in_set", cn, v, 0.0, v <= lit(0.0))
        case RowCountBetween(lo, hi) =>
          val v = col("n_rows").cast("double")
          report(a, "row_count", "*", v, hi.toDouble,
            v >= lit(lo.toDouble) && v <= lit(hi.toDouble))
        case ForeignKey(cn, ref, refCn, refName) =>
          val orphans = df.select(col(cn))
            .join(broadcast(ref.select(col(refCn)).distinct()),
              col(cn) === col(refCn), "left_anti")
            .agg(count(lit(1)).cast("double").as("v"))
          report(orphans, "foreign_key", s"$cn->$refName.$refCn",
            col("v"), 0.0, col("v") <= lit(0.0))
      }
    }
    rows.reduce(_ unionByName _).orderBy(col("expectation"), col("col_name"))
  }

  private def report(src: DataFrame, kind: String, colName: String,
                     value: Column, threshold: Double, pass: Column): DataFrame =
    src.select(lit(kind).as("expectation"), lit(colName).as("col_name"),
      value.cast("double").as("metric"), lit(threshold).as("threshold"),
      pass.as("pass"))
}
