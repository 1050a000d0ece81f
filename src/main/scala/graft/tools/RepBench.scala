package graft.tools

import org.apache.spark.sql.SparkSession

import graft.Tables
import graft.queries.QueryCatalog

/** Repeated-measurement micro-bench for chasing round-over-round wobbles
  * in individual headline queries: N timed materializations per query
  * (after one untimed warm-up), printing every rep plus min/median — the
  * spread separates host-load variance from a real plan change.
  * Usage: SPARK_GRAFT_SF_DIR=... runMain graft.tools.RepBench [reps] [query...]
  */
object RepBench {
  def main(args: Array[String]): Unit = {
    val reps = args.headOption.map(_.toInt).getOrElse(5)
    val names = if (args.length > 1) args.tail.toSeq
                else Seq("training_pipeline", "ann_bruteforce")
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = Tables.configure(SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.ui.enabled", "false"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    names.foreach { n =>
      val q = QueryCatalog.byName(n)
      q.fn(spark, sfDir).count() // warm-up
      val ts = (1 to reps).map { _ =>
        val t0 = System.nanoTime()
        q.fn(spark, sfDir).count()
        (System.nanoTime() - t0) / 1e9
      }
      val sorted = ts.sorted
      println(f"[rep] $n reps=${ts.map(t => f"$t%.2f").mkString(",")} " +
        f"min=${sorted.head}%.3f median=${sorted(reps / 2)}%.3f")
    }
    spark.stop()
  }
}
