package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Declarative data-quality expectations over a table — the admission
  * gate a training-data lake runs before a corpus snapshot is allowed
  * into curation (the Deequ/Great-Expectations check surface, Spark-
  * first): each suite evaluates to a tidy verdict frame
  * `(check, column, n_rows, n_violations, passed)`.
  *
  * Scale shape: every ROW-LEVEL check (null, accepted values, range,
  * regex, uniqueness) folds into ONE aggregation over ONE scan of the
  * table — adding a check adds a codegen'd indicator column, never a
  * pass. Uniqueness rides exact `count(distinct)` in the same aggregate
  * (Expand-planned, the `profile_table` exact-flavor cost — documented
  * there); referential checks are each one left-anti join against their
  * dimension (broadcast when the dimension is small). Nothing collects
  * row-level data; the verdict frame has one row per check.
  */
object Expectations {

  sealed trait Check
  /** Column must be non-null. */
  final case class NotNull(column: String) extends Check
  /** Column tuple must be unique across the table. */
  final case class Unique(columns: Seq[String]) extends Check
  /** Column value must be one of `values` (nulls violate). */
  final case class AcceptedValues(column: String, values: Seq[String]) extends Check
  /** Numeric column must lie in the closed range (nulls violate). */
  final case class InRange(column: String, lo: Double, hi: Double) extends Check
  /** String column must match the (RE2-subset) pattern (nulls violate). */
  final case class MatchesRegex(column: String, pattern: String) extends Check
  /** Every value must exist in `dim.dimColumn` (referential
    * containment; nulls violate — gate them separately with NotNull). */
  final case class SubsetOf(column: String, dim: DataFrame,
                            dimColumn: String) extends Check

  private def checkName(c: Check): (String, String) = c match {
    case NotNull(col) => ("not_null", col)
    case Unique(cols) => ("unique", cols.mkString(","))
    case AcceptedValues(col, _) => ("accepted_values", col)
    case InRange(col, _, _) => ("in_range", col)
    case MatchesRegex(col, _) => ("matches_regex", col)
    case SubsetOf(col, _, dimCol) => ("subset_of", s"$col->$dimCol")
  }

  /** Evaluate a suite; one verdict row per check, ordered as given. */
  def evaluate(df: DataFrame, checks: Seq[Check]): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._

    val scanChecks = checks.filter(!_.isInstanceOf[SubsetOf])
    val fkChecks = checks.collect { case s: SubsetOf => s }

    val scanVerdicts: Option[DataFrame] =
      if (scanChecks.isEmpty) None
      else {
        val aggs = count(lit(1)).as("__n") +: scanChecks.zipWithIndex.map {
          case (c, i) =>
            val name = s"__v$i"
            c match {
              case NotNull(cl) =>
                count(when(col(cl).isNull, 1)).as(name)
              case Unique(cols) =>
                (count(lit(1)) -
                  countDistinct(struct(cols.map(col): _*))).as(name)
              case AcceptedValues(cl, vs) =>
                count(when(!col(cl).isin(vs: _*) || col(cl).isNull, 1)).as(name)
              case InRange(cl, lo, hi) =>
                count(when(col(cl).isNull ||
                  col(cl) < lo || col(cl) > hi, 1)).as(name)
              case MatchesRegex(cl, p) =>
                count(when(col(cl).isNull ||
                  !col(cl).rlike(p), 1)).as(name)
              case _: SubsetOf => lit(0L).as(name) // unreachable
            }
        }
        val row = df.agg(aggs.head, aggs.tail: _*)
        // one-row wide frame -> tidy rows (stack keeps the scan single)
        val stacked = scanChecks.zipWithIndex.map { case (c, i) =>
          val (nm, cl) = checkName(c)
          s"'$nm', '$cl', __v$i"
        }.mkString(", ")
        Some(row.select(col("__n"),
            expr(s"stack(${scanChecks.size}, $stacked) " +
              "AS (check, column, n_violations)"))
          .select(col("check"), col("column"), col("__n").as("n_rows"),
            col("n_violations").cast("long").as("n_violations")))
      }

    val fkVerdicts = fkChecks.map { case s @ SubsetOf(cl, dim, dimCl) =>
      val (nm, detail) = checkName(s)
      val miss = df.select(col(cl))
        .join(dim.select(col(dimCl).as(cl)), Seq(cl), "left_anti")
        .agg(count(lit(1)).as("n_violations"))
      val n = df.agg(count(lit(1)).as("n_rows"))
      n.crossJoin(miss).select(lit(nm).as("check"), lit(detail).as("column"),
        col("n_rows"), col("n_violations"))
    }

    val all = (scanVerdicts.toSeq ++ fkVerdicts)
      .reduceOption(_ unionByName _)
      .getOrElse(Seq.empty[(String, String, Long, Long)]
        .toDF("check", "column", "n_rows", "n_violations"))
    all.withColumn("passed", col("n_violations") === 0L)
  }

  /** Per-ROW violation labels: adds `violations: array<string>` listing
    * every failed check as `name:column`, in suite order. Scan checks
    * stay pure column predicates in the same scan; `Unique` marks every
    * member of a duplicated key group (one groupBy + broadcast-sized
    * join of the duplicate keys); `SubsetOf` marks misses via a left
    * join on the (distinct, usually broadcast) dimension keys. */
  def rowFlags(df: DataFrame, checks: Seq[Check]): DataFrame = {
    val (joined, flags) = checks.zipWithIndex
      .foldLeft((df, Seq.empty[org.apache.spark.sql.Column])) {
        case ((d, fs), (c, i)) =>
          val (nm, cl) = checkName(c)
          val label = lit(s"$nm:$cl")
          c match {
            case NotNull(column) =>
              (d, fs :+ when(col(column).isNull, label))
            case AcceptedValues(column, vs) =>
              (d, fs :+ when(!col(column).isin(vs: _*) ||
                col(column).isNull, label))
            case InRange(column, lo, hi) =>
              (d, fs :+ when(col(column).isNull ||
                col(column) < lo || col(column) > hi, label))
            case MatchesRegex(column, p) =>
              (d, fs :+ when(col(column).isNull ||
                !col(column).rlike(p), label))
            case Unique(cols) =>
              // NULL-SAFE key join: evaluate() counts a duplicated
              // NULL-key group as violations, so the row gate must flag
              // its members too — plain equality would never match them
              val marker = s"__dup$i"
              val dupKeys = df.groupBy(cols.map(col): _*)
                .agg(count(lit(1)).as("__n"))
                .filter(col("__n") > 1)
                .select(cols.zipWithIndex.map { case (c, ci) =>
                  col(c).as(s"__k${i}_$ci")
                } :+ lit(true).as(marker): _*)
              val cond = cols.zipWithIndex.map { case (c, ci) =>
                col(c) <=> col(s"__k${i}_$ci")
              }.reduce(_ && _)
              (d.join(dupKeys, cond, "left")
                .drop(cols.indices.map(ci => s"__k${i}_$ci"): _*),
                fs :+ when(col(marker).isNotNull, label))
            case SubsetOf(column, dim, dimColumn) =>
              val marker = s"__in$i"
              val keys = dim.select(col(dimColumn).as(column)).distinct()
                .withColumn(marker, lit(true))
              (d.join(keys, Seq(column), "left"),
                fs :+ when(col(marker).isNull, label))
          }
      }
    joined
      .withColumn("violations",
        filter(array(flags: _*), x => x.isNotNull))
      .drop(joined.columns.filter(c =>
        c.startsWith("__dup") || c.startsWith("__in")): _*)
  }

  /** The gate itself: (clean rows, quarantined rows with their
    * violation labels) — the admission workflow [[evaluate]] reports
    * on, executed. */
  def quarantine(df: DataFrame, checks: Seq[Check]): (DataFrame, DataFrame) = {
    val flagged = rowFlags(df, checks)
    (flagged.filter(size(col("violations")) === 0).drop("violations"),
      flagged.filter(size(col("violations")) > 0))
  }
}
