package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkSuite

class SelectionSpec extends SparkSuite {
  import spark.implicits._

  // two "domains" with disjoint vocabulary: code-ish vs prose-ish
  private def prose(i: Long) =
    s"the quiet morning light settled over the valley as birds sang v$i"
  private def code(i: Long) =
    s"def main args println return static void class import package v$i"

  test("hashedNgramFeatures counts bigram buckets per doc") {
    val f = Selection.hashedNgramFeatures(
        Seq((1L, "a b a b")).toDF("doc_id", "text"),
        "text", "doc_id", n = 2, buckets = 16)
      .select("doc_id", "bucket", "n").as[(Long, Long, Long)].collect().toSeq
    // bigrams: "a b", "b a", "a b" -> one bucket with n=2, one with n=1
    // (unless the two distinct bigrams collide into one bucket)
    assert(f.map(_._3).sum === 3L)
    assert(f.forall(r => r._2 >= 0 && r._2 < 16))
  }

  test("importance weights rank target-like docs above source-like ones") {
    val target = Selection.bucketTotals(Selection.hashedNgramFeatures(
      (0L until 20L).map(i => (i, prose(i))).toDF("doc_id", "text"),
      "text", "doc_id", n = 2, buckets = 64))
    // raw pool: half prose-like, half code-like
    val pool = ((100L until 110L).map(i => (i, prose(i * 7))) ++
                (200L until 210L).map(i => (i, code(i)))).toDF("doc_id", "text")
    val poolFeatures = Selection.hashedNgramFeatures(
      pool, "text", "doc_id", n = 2, buckets = 64)
    val source = Selection.bucketTotals(poolFeatures)
    val w = Selection.importanceLogWeights(
      poolFeatures, target, source, buckets = 64, idCol = "doc_id")
    val selected = Selection.selectTopFraction(w, "doc_id", 0.5)
      .select("doc_id").as[Long].collect().toSet
    assert(selected.size === 10)
    // every selected doc is from the prose half
    assert(selected.forall(_ < 200L), s"selected code-like docs: $selected")
  }

  test("vector path == row path: features, totals, weights, selection") {
    val pool = ((100L until 110L).map(i => (i, prose(i * 7))) ++
                (200L until 210L).map(i => (i, code(i))) :+
                ((300L, "solo"))).toDF("doc_id", "text") // 1-token doc too
    val rows = Selection.hashedNgramFeatures(pool, "text", "doc_id",
      n = 2, buckets = 64)
    val vecs = Selection.hashedNgramFeatureVectors(pool, "text", "doc_id",
      n = 2, buckets = 64)
    // vectors explode back to exactly the row-form features
    val fromVec = vecs.select(col("doc_id"),
        posexplode(col("fv")).as(Seq("bucket", "n")))
      .filter(col("n") > 0)
      .select(col("doc_id"), col("bucket").cast("long"), col("n"))
      .as[(Long, Long, Long)].collect().toSet
    assert(fromVec === rows.select("doc_id", "bucket", "n")
      .as[(Long, Long, Long)].collect().toSet)
    // corpus totals agree
    val tRows = Selection.bucketTotals(rows)
      .as[(Long, Long)].collect().toSet
    val tVecs = Selection.bucketTotalsFromVectors(vecs, 64)
      .as[(Long, Long)].collect().toSet
    assert(tVecs === tRows)
    // log-weights agree to float tolerance (same smoothing/model math;
    // only the addition order differs)
    val target = Selection.bucketTotals(Selection.hashedNgramFeatures(
      (0L until 20L).map(i => (i, prose(i))).toDF("doc_id", "text"),
      "text", "doc_id", n = 2, buckets = 64))
    val wRows = Selection.importanceLogWeights(rows, target,
        Selection.bucketTotals(rows), 64, "doc_id")
      .as[(Long, Double)].collect().toMap
    val wVecs = Selection.importanceLogWeightsFromVectors(vecs, target,
        Selection.bucketTotalsFromVectors(vecs, 64), 64, "doc_id")
      .as[(Long, Double)].collect().toMap
    assert(wRows.keySet === wVecs.keySet)
    for ((k, v) <- wRows)
      assert(math.abs(v - wVecs(k)) < 1e-9, s"doc $k: $v vs ${wVecs(k)}")
    // and the selected set is identical
    val selRows = Selection.selectTopFraction(
      Selection.importanceLogWeights(rows, target,
        Selection.bucketTotals(rows), 64, "doc_id"), "doc_id", 0.5)
      .select("doc_id").as[Long].collect().toSet
    val selVecs = Selection.selectTopFraction(
      Selection.importanceLogWeightsFromVectors(vecs, target,
        Selection.bucketTotalsFromVectors(vecs, 64), 64, "doc_id"),
      "doc_id", 0.5)
      .select("doc_id").as[Long].collect().toSet
    assert(selVecs === selRows)
  }

  test("selectTopFraction is deterministic and keeps ceil(n*fraction)") {
    val w = Seq((1L, 2.0), (2L, 2.0), (3L, 1.0), (4L, 0.5), (5L, 0.1))
      .toDF("doc_id", "log_weight")
    val kept = Selection.selectTopFraction(w, "doc_id", 0.5)
      .select("doc_id").as[Long].collect().toSet
    assert(kept === Set(1L, 2L, 3L)) // ceil(5*0.5)=3; tie 1,2 by id
  }
}
