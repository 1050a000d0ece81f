package graft.tools

import org.apache.spark.sql.SparkSession

import graft.Tables
import graft.queries.QueryCatalog

/** Dump formatted physical plans for the headline queries — the working
  * artifact behind SURVEY.md §6's plan-quality claims (pushdown reaching
  * the scan, broadcasts where intended, no surplus shuffles).
  * Usage: runMain graft.tools.ExplainAudit [sfDir] [queryName...]
  */
object ExplainAudit {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val names = if (args.length > 1) args.tail.toSeq
                else QueryCatalog.all.filter(_.bench).map(_.name)
    val spark = Tables.configure(SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.ui.enabled", "false"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    names.foreach { n =>
      println(s"\n==================== $n ====================")
      QueryCatalog.byName(n).fn(spark, sfDir).explain("formatted")
    }
    spark.stop()
  }
}
