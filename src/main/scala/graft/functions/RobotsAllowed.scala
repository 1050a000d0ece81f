package graft.functions

import org.apache.spark.sql.{Column, GraftColumnShim}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, BooleanType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** RFC 9309 robots-rule evaluation as a native codegen expression:
  * `allowed(path, rules)` where rules are the compact
  * `"A:<pattern>"`/`"D:<pattern>"` strings [[graft.text.Robots]]
  * parses per domain. Longest-match wins (pattern octet length),
  * allow winning ties; patterns support `*` wildcards and the `$` end
  * anchor; an empty rule list allows. Map-only in the scan — the gate
  * a 100 TB crawl pass runs per URL, so no UDF, no per-row regex
  * compilation (matching is a direct two-pointer wildcard walk).
  */
case class RobotsAllowed(left: Expression, right: Expression)
  extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (StringType, ArrayType(StringType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"graft_robots_allowed expects (STRING, ARRAY<STRING>), " +
          s"got ${l.sql}, ${r.sql}")
    }
  override def dataType: DataType = BooleanType
  override def prettyName: String = "graft_robots_allowed"

  override protected def nullSafeEval(p: Any, r: Any): Any =
    RobotsAllowed.allowed(p.asInstanceOf[UTF8String],
      r.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (p, r) =>
      s"graft.functions.RobotsAllowed.allowed($p, $r)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): RobotsAllowed =
    copy(left = newLeft, right = newRight)
}

object RobotsAllowed {

  /** RFC pattern match: literal octets, `*` matches any run (incl.
    * empty), a trailing `$` anchors the end; without `$` the pattern is
    * a prefix match. Two-pointer walk with greedy-star backtracking. */
  def matches(pattern: String, path: String): Boolean = {
    val anchored = pattern.nonEmpty && pattern.last == '$'
    val pat = if (anchored) pattern.substring(0, pattern.length - 1)
              else pattern
    // classic wildcard match over (pat, path-prefix): succeed when the
    // pattern is consumed (prefix semantics) — for anchored patterns
    // the path must be consumed too
    var pi = 0; var si = 0
    var starPi = -1; var starSi = -1
    while (si <= path.length) {
      if (pi < pat.length && pat.charAt(pi) == '*') {
        starPi = pi; starSi = si; pi += 1
      } else if (pi < pat.length && si < path.length &&
                 pat.charAt(pi) == path.charAt(si)) {
        pi += 1; si += 1
      } else if (pi == pat.length && (!anchored || si == path.length)) {
        return true
      } else if (starPi >= 0 && starSi < path.length) {
        starSi += 1; si = starSi; pi = starPi + 1
      } else {
        return false
      }
    }
    false
  }

  /** Longest-match evaluation; allow wins ties; no match → allowed.
    * Precedence counts the pattern's MATCHED octets: a trailing `$`
    * anchor matches nothing, so it's excluded — `Disallow: /foo$` and
    * `Allow: /foo` tie (and allow wins) rather than the anchor octet
    * outranking the allow. */
  def allowed(path: UTF8String, rules: ArrayData): Boolean = {
    val p = path.toString
    var bestLen = -1
    var bestAllow = true
    var i = 0
    val n = rules.numElements()
    while (i < n) {
      if (!rules.isNullAt(i)) {
        val r = rules.getUTF8String(i).toString
        if (r.length >= 2 && (r.charAt(0) == 'A' || r.charAt(0) == 'D') &&
            r.charAt(1) == ':') {
          val pat = r.substring(2)
          if (matches(pat, p)) {
            val isAllow = r.charAt(0) == 'A'
            val eff =
              if (pat.nonEmpty && pat.last == '$') pat.length - 1
              else pat.length
            if (eff > bestLen ||
                (eff == bestLen && isAllow && !bestAllow)) {
              if (eff > bestLen) { bestLen = eff; bestAllow = isAllow }
              else bestAllow = true
            }
          }
        }
      }
      i += 1
    }
    bestAllow
  }

  def col(path: Column, rules: Column): Column =
    GraftColumnShim.column(RobotsAllowed(
      GraftColumnShim.expression(path), GraftColumnShim.expression(rules)))
}
