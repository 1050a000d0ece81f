package graft.sql

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.{FunctionIdentifier, TableIdentifier}
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.parser.ParserInterface
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.types.{DataType, StructType}

/** SQL surface for the as-of join (Spark has none; the reference's users
  * write the events⋈pulses correlation by hand every time —
  * spark_events_by_time_parquet.py:205-243). Adds, by rewriting to stock
  * Spark SQL before delegation:
  *
  * {{{
  *   <left> ASOF JOIN <right>
  *     MATCH_CONDITION ( <leftTimeCol> >= <rightTimeCol> )   -- backward
  *     -- or: MATCH_CONDITION ( <leftTimeCol> <= <rightTimeCol> ) forward
  *     [USING (k1, k2, ...)]      -- equality keys joined alongside time
  *     [WITHIN <bucketWidth>]     -- time-bucket width (integer, same
  *                                --  unit as the time columns); default
  *                                --  spark.graft.asof.bucketWidth
  * }}}
  *
  * (Snowflake's ASOF JOIN grammar, restricted to `>=` — most recent right
  * row at-or-before the left time — and `<=` — earliest right row
  * at-or-after it. The forward rewrite mirrors the backward one with
  * LAG/(prev, rt] intervals and a per-key MIN(left)-1 cap.)
  * The rewrite produces the same bucketed-interval formulation as
  * [[graft.ops.AsOfJoin.backward]]: intervals from a keyed LEAD window,
  * exploded onto fixed-width buckets, then a plain equi join — never a
  * range nested-loop. Limitations (v1): left/right must be table/view
  * identifiers, time columns are named (qualifiers are stripped), and the
  * output carries both sides' columns unqualified (USING keys are emitted
  * once). Keyless ASOF (no USING) is rewritten scale-safely too: the LEAD
  * window is partitioned by the time bucket, and each bucket's last row
  * takes the next non-empty bucket's MIN time from a bucket-level
  * aggregate — the only single-partition window runs over that aggregate
  * (one row per non-empty bucket), never over the data. Same cost class
  * as the Scala API's range-partitioned graft.ops.Ranking.globalLead.
  */
class GraftSqlParser(session: SparkSession, delegate: ParserInterface)
    extends ParserInterface {

  private def rewrite(sqlText: String): String =
    AsofSqlRewrite(session, sqlText)

  override def parsePlan(sqlText: String): LogicalPlan =
    delegate.parsePlan(rewrite(sqlText))
  override def parseQuery(sqlText: String): LogicalPlan =
    delegate.parseQuery(rewrite(sqlText))
  override def parseExpression(sqlText: String): Expression =
    delegate.parseExpression(sqlText)
  override def parseTableIdentifier(sqlText: String): TableIdentifier =
    delegate.parseTableIdentifier(sqlText)
  override def parseFunctionIdentifier(sqlText: String): FunctionIdentifier =
    delegate.parseFunctionIdentifier(sqlText)
  override def parseMultipartIdentifier(sqlText: String): Seq[String] =
    delegate.parseMultipartIdentifier(sqlText)
  override def parseTableSchema(sqlText: String): StructType =
    delegate.parseTableSchema(sqlText)
  override def parseDataType(sqlText: String): DataType =
    delegate.parseDataType(sqlText)
  override def parseRoutineParam(sqlText: String): StructType =
    delegate.parseRoutineParam(sqlText)
}

object AsofSqlRewrite {

  val BucketConf = "spark.graft.asof.bucketWidth"

  // <l> [[AS] la] ASOF JOIN <r> [[AS] ra] MATCH_CONDITION
  //   ( [q.]lt >= [q.]rt )   (or <=)
  //   [USING (k, ...)] [WITHIN n]
  // Table names may be dot-qualified (db.tbl, global_temp.v, catalog
  // paths) — the qualified name is interpolated verbatim into the
  // rewritten FROM clauses. Either relation may carry an alias (AS
  // optional); aliases are accepted as MATCH_CONDITION qualifiers and
  // consumed — the join's output columns are UNQUALIFIED, so the
  // enclosing query must reference them without the alias prefix (the
  // two sides collapse into one projection; there is no per-side scope
  // to qualify into).
  // the keyword guard keeps the optional-alias group from mis-anchoring
  // one word early (e.g. reading "FROM events ASOF JOIN" as table FROM
  // aliased events)
  private val Pattern =
    ("""(?is)\b(?!(?:FROM|JOIN|SELECT|WHERE|AS|ON|AND|OR|NOT|UNION|ALL|WITH|CROSS|INNER|LEFT|RIGHT|FULL|LATERAL|ASOF)\b)""" +
     """((?:\w+\.)*\w+)(?:\s+(?:AS\s+)?(?!ASOF\b)(\w+))?""" +
     """\s+ASOF\s+JOIN\s+""" +
     """((?:\w+\.)*\w+)(?:\s+(?:AS\s+)?(?!MATCH_CONDITION\b)(\w+))?""" +
     """\s+MATCH_CONDITION\s*""" +
     """\(\s*(?:\w+\.)?(\w+)\s*(>=|<=)\s*(?:\w+\.)?(\w+)\s*\)""" +
     """(?:\s+USING\s*\(([^)]*)\))?""" +
     """(?:\s+WITHIN\s+(\d+))?""").r

  private val AsofJoinAnywhere = """(?is)\bASOF\s+JOIN\b""".r

  /** Blank out single-quoted literals, double-quoted identifiers, and
    * line (--) / block (slash-star) comments before the leftover-ASOF
    * scan: the words "ASOF JOIN" inside a string or comment are data,
    * not a join, and must not trip the unsupported-shape error.
    */
  private def scrubbed(sql: String): String = sql
    .replaceAll("(?s)'(?:[^']|'')*'", "''")
    .replaceAll("(?s)\"[^\"]*\"", "\"\"")
    .replaceAll("(?s)/\\*.*?\\*/", " ")
    .replaceAll("(?m)--.*$", "")

  def apply(session: SparkSession, sqlText: String): String =
    if (!sqlText.toUpperCase.contains("ASOF")) sqlText
    else {
      val out = Pattern.replaceAllIn(sqlText, m =>
        scala.util.matching.Regex.quoteReplacement(expand(session, m)))
      // an ASOF JOIN the pattern could not consume would otherwise fall
      // through to Spark's parser and die with a generic syntax error —
      // name the graft-side limitation instead
      if (AsofJoinAnywhere.findFirstIn(scrubbed(out)).isDefined)
        throw new IllegalArgumentException(
          "graft ASOF JOIN: unsupported shape. Supported: " +
            "<table> [[AS] alias] ASOF JOIN <table> [[AS] alias] " +
            "MATCH_CONDITION(lt >= rt | lt <= rt) [USING (k, ...)] " +
            "[WITHIN n] with plain or dot-qualified table/view names. " +
            "Subqueries and parenthesized relations are not supported — " +
            "register the subquery as a temp view first " +
            "(df.createOrReplaceTempView) and join the view.")
      out
    }

  private def expand(session: SparkSession,
                     m: scala.util.matching.Regex.Match): String = {
    val (l, r, lt, op, rt) =
      (m.group(1), m.group(3), m.group(5), m.group(6), m.group(7))
    val forward = op == "<="
    val keys = Option(m.group(8)).toSeq
      .flatMap(_.split(",")).map(_.trim).filter(_.nonEmpty)
    val width = Option(m.group(9)).map(_.toLong).getOrElse(
      session.conf.get(BucketConf, "3600").toLong)
    require(width > 0, s"ASOF WITHIN must be positive, got $width")

    val keyEquality =
      keys.map(k => s"AND __l.$k = __r.$k ").mkString
    val keyList = keys.mkString(", ")
    val partitionBy =
      if (keys.isEmpty) "" else keys.mkString("PARTITION BY ", ", ", " ")
    val on = keys.map(k => s"__rr.$k = __gm.$k").mkString(" AND ")

    // Backward (lt >= rt): each right row owns the interval
    // [rt, next_rt), intervals from LEAD; the open LAST interval is
    // capped at max(left)+1. Forward (lt <= rt): each right row owns
    // (prev_rt, rt], intervals from LAG; the open FIRST interval is
    // capped at min(left)-1. Caps are PER KEY when USING keys are
    // present (a global cap makes every key's open interval span the
    // whole corpus timeline and explode; see AsOfJoin.backward).
    // Intervals outside every left row are dropped, each interval
    // explodes onto its fixed-width buckets, and the join is a plain
    // equi join on the bucket.
    //
    // Keyless: a bare `LEAD/LAG(rt) OVER (ORDER BY rt)` would funnel the
    // whole right side into ONE partition. Instead the window is
    // partitioned by the row's time bucket, and the bucket-boundary row
    // is stitched from the neighboring NON-EMPTY bucket's MIN (backward)
    // / MAX (forward) via a bucket-level aggregate. The only
    // single-partition window runs over that aggregate (<= one row per
    // non-empty bucket, partial-agg'd map-side), never over the data:
    // the same stitch cost class as Ranking.globalLead's boundary
    // exchange.
    val innerRight =
      if (!forward && keys.isEmpty)
        s"""SELECT __rr.* EXCEPT (__gae0, __gb),
                 coalesce(__gae0, __nx.__gnext,
                          (SELECT MAX($lt) + 1 FROM $l)) AS __gae
          FROM (SELECT *, CAST($rt DIV $width AS BIGINT) AS __gb,
                       LEAD($rt) OVER (PARTITION BY CAST($rt DIV $width AS BIGINT)
                                       ORDER BY $rt) AS __gae0
                FROM $r) AS __rr
          LEFT JOIN (SELECT __gb, LEAD(__gmn) OVER (ORDER BY __gb) AS __gnext
                     FROM (SELECT CAST($rt DIV $width AS BIGINT) AS __gb,
                                  MIN($rt) AS __gmn
                           FROM $r GROUP BY 1) AS __gbm) AS __nx
            ON __rr.__gb = __nx.__gb"""
      else if (!forward)
        s"""SELECT __rr.* EXCEPT (__gae0),
                 coalesce(__gae0, __gm.__gcap) AS __gae
          FROM (SELECT *, LEAD($rt) OVER (${partitionBy}ORDER BY $rt) AS __gae0
                FROM $r) AS __rr
          LEFT JOIN (SELECT $keyList, MAX($lt) + 1 AS __gcap
                     FROM $l GROUP BY $keyList) AS __gm ON $on"""
      else if (keys.isEmpty)
        s"""SELECT __rr.* EXCEPT (__gas0, __gb),
                 coalesce(__gas0, __nx.__gprev,
                          (SELECT MIN($lt) - 1 FROM $l)) AS __gas
          FROM (SELECT *, CAST($rt DIV $width AS BIGINT) AS __gb,
                       LAG($rt) OVER (PARTITION BY CAST($rt DIV $width AS BIGINT)
                                      ORDER BY $rt) AS __gas0
                FROM $r) AS __rr
          LEFT JOIN (SELECT __gb, LAG(__gmx) OVER (ORDER BY __gb) AS __gprev
                     FROM (SELECT CAST($rt DIV $width AS BIGINT) AS __gb,
                                  MAX($rt) AS __gmx
                           FROM $r GROUP BY 1) AS __gbm) AS __nx
            ON __rr.__gb = __nx.__gb"""
      else
        s"""SELECT __rr.* EXCEPT (__gas0),
                 coalesce(__gas0, __gm.__gcap) AS __gas
          FROM (SELECT *, LAG($rt) OVER (${partitionBy}ORDER BY $rt) AS __gas0
                FROM $r) AS __rr
          LEFT JOIN (SELECT $keyList, MIN($lt) - 1 AS __gcap
                     FROM $l GROUP BY $keyList) AS __gm ON $on"""

    if (!forward) {
      // USING keys appear once (left side); helper cols never leak
      val exceptRight = (keys :+ "__gae" :+ "__gab").mkString(", ")
      s"""(
        SELECT __l.* EXCEPT (__gab), __r.* EXCEPT ($exceptRight)
        FROM (SELECT *, CAST($lt DIV $width AS BIGINT) AS __gab FROM $l) AS __l
        LEFT JOIN (
          SELECT *, explode(sequence(CAST($rt DIV $width AS BIGINT),
                                     CAST((__gae - 1) DIV $width AS BIGINT))) AS __gab
          FROM ($innerRight)
          WHERE $rt < __gae
        ) AS __r
        ON __l.__gab = __r.__gab AND __r.$rt <= __l.$lt AND __l.$lt < __r.__gae
           $keyEquality)"""
    } else {
      val exceptRight = (keys :+ "__gas" :+ "__gab").mkString(", ")
      s"""(
        SELECT __l.* EXCEPT (__gab), __r.* EXCEPT ($exceptRight)
        FROM (SELECT *, CAST($lt DIV $width AS BIGINT) AS __gab FROM $l) AS __l
        LEFT JOIN (
          SELECT *, explode(sequence(CAST((__gas + 1) DIV $width AS BIGINT),
                                     CAST($rt DIV $width AS BIGINT))) AS __gab
          FROM ($innerRight)
          WHERE $rt > __gas
        ) AS __r
        ON __l.__gab = __r.__gab AND __r.$rt >= __l.$lt AND __l.$lt > __r.__gas
           $keyEquality)"""
    }
  }
}
