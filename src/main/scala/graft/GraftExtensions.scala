package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal}

import graft.functions.RollingFingerprint

/** Session extensions registering graft's native expressions so they are
  * callable from SQL / `expr(...)` in any session configured with
  * `spark.sql.extensions=graft.GraftExtensions`.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      new FunctionIdentifier("graft_rolling_fingerprint"),
      new ExpressionInfo(classOf[RollingFingerprint].getName, "graft_rolling_fingerprint"),
      (args: Seq[Expression]) => args match {
        case Seq(text) => RollingFingerprint(text, 8)
        case Seq(text, Literal(w: Int, _)) => RollingFingerprint(text, w)
        case _ => throw new IllegalArgumentException(
          "graft_rolling_fingerprint(text[, window]) expects 1 or 2 args")
      }))
  }
}
