package graft.ops

import org.apache.spark.sql.functions.{array_contains, col}

import graft.SparkSuite

/** Data-quality expectations (ops/Expectations): per-check semantics on
  * a planted-violation fixture, single-scan plan for row-level suites,
  * referential checks in both directions. */
class ExpectationsSpec extends SparkSuite {
  import spark.implicits._
  import Expectations._

  private val fixture = Seq(
    (1L, "alpha", "en", 10.0),
    (2L, null: String, "en", 20.0),
    (3L, "gamma", "xx", -5.0),
    (3L, "delta", "fr", 999.0),
    (5L, "Epsilon7", null, 50.0))
    .toDF("id", "name", "lang", "score")

  private def verdicts(checks: Seq[Check]): Map[(String, String), (Long, Long, Boolean)] =
    evaluate(fixture, checks).collect().map(r =>
      (r.getString(0), r.getString(1)) ->
        ((r.getLong(2), r.getLong(3), r.getBoolean(4)))).toMap

  test("each row-level check counts its planted violations") {
    val v = verdicts(Seq(
      NotNull("name"),
      Unique(Seq("id")),
      AcceptedValues("lang", Seq("en", "fr")),
      InRange("score", 0, 100),
      MatchesRegex("name", "^[a-z]+$")))
    assert(v(("not_null", "name")) == ((5L, 1L, false)))
    assert(v(("unique", "id")) == ((5L, 1L, false))) // id 3 twice
    // lang: 'xx' and NULL violate
    assert(v(("accepted_values", "lang")) == ((5L, 2L, false)))
    // score: -5 and 999 violate
    assert(v(("in_range", "score")) == ((5L, 2L, false)))
    // name: NULL and 'Epsilon7' violate
    assert(v(("matches_regex", "name")) == ((5L, 2L, false)))
  }

  test("a clean check passes") {
    val v = verdicts(Seq(Unique(Seq("id", "name")), InRange("score", -10, 1000)))
    assert(v(("unique", "id,name")) == ((5L, 0L, true)))
    assert(v(("in_range", "score")) == ((5L, 0L, true)))
  }

  test("subset_of checks both directions") {
    val dim = Seq(1L, 2L, 3L).toDF("k")
    val v = verdicts(Seq(SubsetOf("id", dim, "k")))
    // id 5 missing from dim (id 3 duplicated rows both match)
    assert(v(("subset_of", "id->k")) == ((5L, 1L, false)))
    val back = evaluate(dim, Seq(SubsetOf("k", fixture, "id")))
      .collect().head
    assert(back.getLong(3) == 0L && back.getBoolean(4))
  }

  test("row-level suite is a single scan of the table") {
    val df = evaluate(fixture, Seq(
      NotNull("name"), Unique(Seq("id")), InRange("score", 0, 100),
      AcceptedValues("lang", Seq("en")), MatchesRegex("name", "a")))
    val plan = df.queryExecution.executedPlan.toString
    val scans = "LocalTableScan".r.findAllIn(plan).length
    assert(scans == 1, s"expected one scan, plan:\n$plan")
  }

  test("empty suite yields an empty verdict frame") {
    assert(evaluate(fixture, Nil).count() == 0L)
  }

  test("rowFlags labels every violated check per row, in suite order") {
    val dim = Seq("en", "fr").toDF("l")
    val flagged = rowFlags(fixture, Seq(
      NotNull("name"),
      InRange("score", 0, 100),
      Unique(Seq("id")),
      SubsetOf("lang", dim, "l")))
      .collect()
      .map(r => (r.getAs[Long]("id"), r.getAs[String]("name")) ->
        r.getSeq[String](r.fieldIndex("violations"))).toMap
    assert(flagged((1L, "alpha")) == Seq())
    assert(flagged((2L, null)) == Seq("not_null:name"))
    // both members of the duplicated id group are marked
    assert(flagged((3L, "gamma")) ==
      Seq("in_range:score", "unique:id", "subset_of:lang->l"))
    assert(flagged((3L, "delta")) == Seq("in_range:score", "unique:id"))
    assert(flagged((5L, "Epsilon7")) == Seq("subset_of:lang->l"))
  }

  test("quarantine splits clean rows from violators") {
    val (clean, bad) = quarantine(fixture, Seq(
      NotNull("name"), InRange("score", 0, 100)))
    assert(clean.columns.toSeq == fixture.columns.toSeq)
    assert(clean.collect().map(_.getLong(0)).toSet == Set(1L, 5L))
    assert(bad.count() == 3L)
    assert(bad.filter(array_contains(col("violations"), "in_range:score"))
      .count() == 2L)
  }
}
