package graft

import org.apache.spark.sql.functions._

/** Pins [[Tables.tsMicros]]'s dtype adapters — in particular FLOOR
  * division for the epoch-nanos Long branch: truncate-toward-zero would
  * diverge from DuckDB `epoch_us` by 1 µs on pre-1970 timestamps.
  */
class TablesSpec extends SparkSuite {
  import spark.implicits._

  test("tsMicros on epoch-nanos Long uses floor division (pre-1970 safe)") {
    val df = Seq(
      (1L, 1999L),    //  1999 ns →  1 µs
      (2L, -1L),      //    -1 ns → -1 µs (floor), NOT 0 (truncate)
      (3L, -1999L),   // -1999 ns → -2 µs (floor), NOT -1
      (4L, -2000L),   // exact multiple → -2 µs either way
      (5L, 0L))
      .toDF("id", "ts")
    val out = df.select(col("id"), Tables.tsMicros(df, "ts").as("us"))
      .as[(Long, Long)].collect().toMap
    assert(out === Map(1L -> 1L, 2L -> -1L, 3L -> -2L, 4L -> -2L, 5L -> 0L))
  }

  test("tsMicros on TIMESTAMP matches the Long branch at µs precision") {
    val ts = Seq((1L, java.sql.Timestamp.from(
        java.time.Instant.ofEpochSecond(3, 123456000))))
      .toDF("id", "ts")
    val out = ts.select(Tables.tsMicros(ts, "ts").as("us")).as[Long].head()
    assert(out === 3123456L)
  }
}
