package graft.sources

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.SparkSuite

/** JSONL corpus source/sink: contract-schema read with corrupt-line
  * audit, deterministic shard assignment, roundtrips, and the
  * jsonl→parquet first-touch conversion.
  */
class CorpusIOSpec extends SparkSuite {
  import spark.implicits._

  private def tmpDir(name: String): String = {
    val d = Files.createTempDirectory(name)
    d.toFile.deleteOnExit()
    d.toString
  }

  test("reads a contract schema and retains malformed lines as audit rows") {
    val dir = tmpDir("jsonl_in")
    Files.writeString(Paths.get(dir, "part0.jsonl"),
      """{"doc_id": 1, "text": "alpha", "lang": "en"}
        |{"doc_id": 2, "text": "beta"}
        |this line is not json
        |{"doc_id": 3, "text": "gamma", "lang": "de"}
        |""".stripMargin)
    val docs = CorpusIO.readJsonlDocs(spark, dir,
      extra = Seq(StructField("lang", StringType)))
    val stats = CorpusIO.ingestStats(docs)
      .as[(Long, Long, Long)].collect().head
    assert(stats === ((4L, 3L, 1L)))
    val corrupt = CorpusIO.corruptRecords(docs)
      .as[(Option[Long], String)].collect()
    assert(corrupt.toSeq === Seq((None, "this line is not json")))
    val byId = CorpusIO.validDocs(docs)
      .select("doc_id", "text", "lang")
      .as[(Long, String, Option[String])].collect().map(r => r._1 -> r).toMap
    assert(byId(1L) === ((1L, "alpha", Some("en"))))
    assert(byId(2L) === ((2L, "beta", None)))
  }

  test("sharded write is deterministic and roundtrips") {
    val docs = (0L until 200L).map(i => (i, s"doc number $i")).toDF("doc_id", "text")
    val out1 = tmpDir("jsonl_s1")
    val out2 = tmpDir("jsonl_s2")
    CorpusIO.writeJsonlSharded(docs, out1, nShards = 4)
    // different input partitioning, same corpus -> identical membership
    CorpusIO.writeJsonlSharded(docs.repartition(13), out2, nShards = 4)
    val r1 = CorpusIO.readJsonlSharded(spark, out1)
      .select("doc_id", "text", "shard").as[(Long, String, Long)]
      .collect().sortBy(_._1).toSeq
    val r2 = CorpusIO.readJsonlSharded(spark, out2)
      .select("doc_id", "text", "shard").as[(Long, String, Long)]
      .collect().sortBy(_._1).toSeq
    assert(r1 === r2)
    assert(r1.map(_._1) === (0L until 200L))
    assert(r1.map(_._3).distinct.sorted === Seq(0L, 1L, 2L, 3L))
    // membership matches the declared xxhash64-mod rule
    val expected = docs
      .select(col("doc_id"), pmod(xxhash64(col("doc_id")), lit(4L)).as("s"))
      .as[(Long, Long)].collect().toMap
    assert(r1.forall { case (id, _, s) => expected(id) === s })
  }

  test("toParquet converts the valid subset") {
    val dir = tmpDir("jsonl_conv")
    Files.writeString(Paths.get(dir, "a.jsonl"),
      """{"doc_id": 10, "text": "x"}
        |broken
        |{"doc_id": 11, "text": "y"}
        |""".stripMargin)
    val pq = tmpDir("jsonl_pq") + "/out"
    assert(CorpusIO.toParquet(spark, dir, pq) === 2L)
    assert(spark.read.parquet(pq).columns.toSet === Set("doc_id", "text"))
  }
}
