package graft.sources

import java.util

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.catalog.procedures.{BoundProcedure, ProcedureParameter, UnboundProcedure}
import org.apache.spark.sql.connector.read.{LocalScan, Scan}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Table MAINTENANCE procedures for [[GraftTableCatalog]] — the Spark-4
  * `ProcedureCatalog` surface, so the standard lakehouse upkeep runs as
  * SQL (the `CALL catalog.system.rewrite_data_files(...)` shape every
  * Iceberg deployment schedules):
  *
  * {{{
  *   CALL gcat.system.rewrite_data_files(`table` => 't', smaller_than_bytes => 33554432)
  *   CALL gcat.system.compact(`table` => 't')
  *   CALL gcat.system.expire_snapshots(`table` => 't', keep_last => 3)
  *   CALL gcat.system.remove_orphan_files(`table` => 't')
  *   CALL gcat.system.rollback_to_snapshot(`table` => 't', snapshot_id => 2)
  *   CALL gcat.system.create_branch(`table` => 't', name => 'audit')
  *   CALL gcat.system.create_tag(`table` => 't', name => 'v1', snapshot_id => 2)
  *   CALL gcat.system.fast_forward(`table` => 't', to_branch => 'main', from_ref => 'audit')
  * }}}
  *
  * Each maps 1:1 onto the [[IcebergLite]] maintenance API and returns a
  * small result row (counts / the new head) through a `LocalScan` —
  * the procedure's real work is the underlying distributed rewrite or
  * the KB-scale metadata commit, never a driver data pass.
  */
private[sources] object GraftProcedures {

  private def p(name: String, dt: DataType): ProcedureParameter =
    ProcedureParameter.in(name, dt).build()
  private def pd(name: String, dt: DataType,
                 default: String): ProcedureParameter =
    ProcedureParameter.in(name, dt).defaultValue(default).build()

  private def str(s: String): UTF8String = UTF8String.fromString(s)
  private def row(vs: Any*): InternalRow =
    new GenericInternalRow(vs.toArray)

  /** name → procedure, bound to one catalog's warehouse resolver. */
  def all(dirOf: String => String): Map[String, GraftProcedure] = {
    def tdir(input: InternalRow): String = {
      val t = input.getUTF8String(0).toString
      dirOf(t)
    }
    Seq(
      new GraftProcedure("rewrite_data_files",
        Seq(p("table", StringType),
          pd("smaller_than_bytes", LongType, "134217728")),
        StructType(Seq(StructField("rewritten_files", LongType))),
        (s, input) => Seq(row(IcebergLite.compactSmallFiles(s, tdir(input),
          input.getLong(1))))),
      new GraftProcedure("compact",
        Seq(p("table", StringType)),
        StructType(Seq(StructField("compacted", BooleanType))),
        (s, input) => { IcebergLite.compact(s, tdir(input)); Seq(row(true)) }),
      new GraftProcedure("expire_snapshots",
        Seq(p("table", StringType), pd("keep_last", IntegerType, "1")),
        StructType(Seq(StructField("retained_snapshots", LongType))),
        (s, input) => {
          val dir = tdir(input)
          IcebergLite.expireSnapshots(s, dir, input.getInt(1))
          Seq(row(IcebergLite.snapshotIds(s, dir).size.toLong))
        }),
      new GraftProcedure("remove_orphan_files",
        Seq(p("table", StringType)),
        StructType(Seq(StructField("removed_path", StringType))),
        (s, input) => IcebergLite.removeOrphanFiles(s, tdir(input))
          .map(pth => row(str(pth)))),
      new GraftProcedure("rollback_to_snapshot",
        Seq(p("table", StringType), p("snapshot_id", LongType)),
        StructType(Seq(StructField("current_snapshot", LongType))),
        (s, input) => {
          val dir = tdir(input)
          IcebergLite.rollbackTo(s, dir, input.getLong(1))
          Seq(row(input.getLong(1)))
        }),
      new GraftProcedure("create_branch",
        Seq(p("table", StringType), p("name", StringType),
          pd("snapshot_id", LongType, "CAST(NULL AS BIGINT)")),
        StructType(Seq(StructField("ref", StringType))),
        (s, input) => {
          val at = if (input.isNullAt(2)) None else Some(input.getLong(2))
          IcebergLite.createBranch(s, tdir(input),
            input.getUTF8String(1).toString, at)
          Seq(row(input.getUTF8String(1)))
        }),
      new GraftProcedure("create_tag",
        Seq(p("table", StringType), p("name", StringType),
          pd("snapshot_id", LongType, "CAST(NULL AS BIGINT)")),
        StructType(Seq(StructField("ref", StringType))),
        (s, input) => {
          val at = if (input.isNullAt(2)) None else Some(input.getLong(2))
          IcebergLite.createTag(s, tdir(input),
            input.getUTF8String(1).toString, at)
          Seq(row(input.getUTF8String(1)))
        }),
      new GraftProcedure("fast_forward",
        Seq(p("table", StringType), p("to_branch", StringType),
          p("from_ref", StringType)),
        StructType(Seq(StructField("head", LongType))),
        (s, input) => {
          val dir = tdir(input)
          IcebergLite.fastForward(s, dir,
            input.getUTF8String(1).toString,
            input.getUTF8String(2).toString)
          Seq(row(IcebergLite.snapshotIds(s, dir).max))
        })
    ).map(pr => pr.name() -> pr).toMap
  }
}

/** One maintenance procedure: unbound ≡ bound (parameters are static),
  * result rows served through a `LocalScan`. */
private[sources] final class GraftProcedure(
    procName: String,
    params: Seq[ProcedureParameter],
    outSchema: StructType,
    body: (SparkSession, InternalRow) => Seq[InternalRow])
    extends UnboundProcedure with BoundProcedure {

  override def name(): String = procName
  override def description(): String =
    s"graft Iceberg maintenance procedure $procName"
  override def bind(inputType: StructType): BoundProcedure = this
  override def parameters(): Array[ProcedureParameter] = params.toArray
  override def isDeterministic: Boolean = false

  override def call(input: InternalRow): util.Iterator[Scan] = {
    val out = body(SparkSession.active, input).toArray
    val scan: Scan = new LocalScan {
      override def rows(): Array[InternalRow] = out
      override def readSchema(): StructType = outSchema
    }
    util.Collections.singletonList(scan).iterator()
  }
}
