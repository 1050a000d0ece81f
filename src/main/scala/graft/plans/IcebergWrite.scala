package graft.plans

import org.apache.spark.sql.{GraftColumnShim, GraftPlanShim, Row, SparkSession}
import org.apache.spark.sql.catalyst.analysis.{UnresolvedAttribute, UnresolvedRelation}
import org.apache.spark.sql.catalyst.expressions.{And, Attribute, AttributeReference, Cast, EqualTo, Expression}
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.execution.command.LeafRunnableCommand
import org.apache.spark.sql.functions.{col, count, countDistinct, lit}
import org.apache.spark.sql.types.{LongType, StructType}

import graft.sources.IcebergLite

/** SQL WRITE path for registered IcebergLite tables — the half the r15
  * scan planning left out: the reference's users INGEST through their
  * catalog (`df.writeTo(tbl).using("iceberg").append()` /
  * `.createOrReplace()`, ingest_neutron_data.py:209-211) and issue
  * row-level DML the same way. Over names registered by
  * [[graft.Catalog.registerIcebergTable]] this maps, at parse time
  * (the analyzer refuses DML on temp views, same reason the
  * time-travel rewrite lives in the parser):
  *
  *   - `INSERT INTO <name> [BY NAME | (cols)] <query>` →
  *     [[IcebergLite.appendSnapshot]], inheriting the table's PERSISTED
  *     partition spec, sort order, and Bloom columns (the writer names
  *     none, so the table contract governs — a second writer through
  *     SQL clusters exactly like the API writer that created the
  *     table). Schema contract: every table column must be supplied;
  *     types must match or upcast LOSSLESSLY (`Cast.canUpCast` — the
  *     ANSI store-assignment rule); anything else refuses with the
  *     column named. `PARTITION (...)` clauses refuse: partitioning is
  *     hidden (spec-derived), never writer-addressed.
  *   - `INSERT OVERWRITE <name> <query>` → metadata-only truncate +
  *     append (two snapshots: a `delete` with an EMPTY manifest list —
  *     zero data files read or written — then an `append`, both
  *     time-travelable — the createOrReplace shape without losing
  *     table history). The source is materialized BEFORE the truncate,
  *     so a self-referencing `OVERWRITE t SELECT ... FROM t` reads the
  *     pre-write snapshot and a mid-scan source failure leaves the
  *     table untouched.
  *   - `DELETE FROM <name> WHERE <cond>` → [[IcebergLite.deleteWhere]]
  *     (copy-on-write, default) or [[IcebergLite.deleteWhereMOR]]
  *     (position deletes) under `spark.graft.iceberg.deleteMode=mor`.
  *     Returns the deleted-row count as the command result.
  *   - `MERGE INTO <name> t USING <src> s ON t.k = s.k ...` for the two
  *     shapes the table format has native machinery for:
  *     UPSERT (`WHEN MATCHED THEN UPDATE SET * WHEN NOT MATCHED THEN
  *     INSERT *`) → [[IcebergLite.equalityDeleteMOR]] on the source
  *     keys followed by an append of the full source (sequence
  *     semantics: the re-appended rows postdate the delete and
  *     survive — the documented upsert composition), and KEYED DELETE
  *     (`WHEN MATCHED THEN DELETE`) → the equality delete alone.
  *     Duplicate source keys refuse (real MERGE errors on multiple
  *     matches; silently appending both would diverge from it).
  *     Conditional/partial-assignment actions refuse with a message
  *     naming the supported shapes.
  *
  * 100 TB shape: nothing here adds a driver-side pass — the writes ARE
  * the existing distributed appendSnapshot/delete machinery; the
  * rewrite only routes the statement. Unregistered names fall through
  * to Spark's own resolution untouched.
  */
object IcebergWriteRewrite {

  def apply(spark: SparkSession, plan: LogicalPlan): LogicalPlan = plan match {
    case InsertIntoStatement(rel, partSpec, userCols, query, overwrite,
        ifPartitionNotExists, byName) =>
      registered(spark, rel) match {
        case Some((name, dir)) =>
          if (partSpec.nonEmpty || ifPartitionNotExists)
            throw new IllegalArgumentException(
              s"INSERT INTO $name: PARTITION clauses are not supported — " +
                "the table's partitioning is hidden (derived from its " +
                "persisted spec), never writer-addressed")
          IcebergInsertCommand(name, dir, query, userCols, overwrite, byName)
        case None => plan
      }
    case DeleteFromTable(rel, condition) =>
      registered(spark, rel) match {
        case Some((name, dir)) =>
          IcebergDeleteCommand(name, dir,
            ExprBox(stripQualifier(condition, aliasesOf(rel, name))))
        case None => plan
      }
    case m: MergeIntoTable =>
      registered(spark, m.targetTable) match {
        case Some((name, dir)) => mergeCommand(name, dir, m)
        case None => plan
      }
    case _ => plan
  }

  /** The (registered-name, table-dir) of a single-part relation name
    * registered through the Iceberg catalog route, seen through any
    * alias. */
  private def registered(spark: SparkSession,
                         plan: LogicalPlan): Option[(String, String)] =
    plan match {
      case u: UnresolvedRelation if u.multipartIdentifier.size == 1 =>
        val n = u.multipartIdentifier.head
        IcebergSqlTables.get(spark, n).map(dir => (n, dir))
      case SubqueryAlias(_, child) => registered(spark, child)
      case _ => None
    }

  /** Table name + any alias wrapped around the relation — the
    * qualifiers a WHERE may legally carry. */
  private def aliasesOf(rel: LogicalPlan, name: String): Set[String] =
    rel match {
      case SubqueryAlias(id, _) => Set(name, id.name)
      case _ => Set(name)
    }

  /** `t.x` → `x` for qualifiers naming the target table (the pruned
    * read the predicate later resolves against carries no alias). */
  private def stripQualifier(e: Expression, quals: Set[String]): Expression =
    e.transformUp {
      case ua: UnresolvedAttribute
          if ua.nameParts.size == 2 && quals.contains(ua.nameParts.head) =>
        UnresolvedAttribute(Seq(ua.nameParts.last))
    }

  private def mergeCommand(name: String, dir: String,
                           m: MergeIntoTable): LogicalPlan = {
    def unsupported(why: String): Nothing =
      throw new IllegalArgumentException(
        s"MERGE INTO $name: $why. Supported shapes: " +
          "ON <conjunction of t.col = s.col> with either " +
          "WHEN MATCHED THEN UPDATE SET * WHEN NOT MATCHED THEN INSERT * " +
          "(upsert) or WHEN MATCHED THEN DELETE (keyed delete), " +
          "unconditional, no schema evolution")
    if (m.withSchemaEvolution) unsupported("WITH SCHEMA EVOLUTION")
    if (m.notMatchedBySourceActions.nonEmpty)
      unsupported("WHEN NOT MATCHED BY SOURCE actions")
    val upsert = (m.matchedActions, m.notMatchedActions) match {
      case (Seq(UpdateStarAction(None)), Seq(InsertStarAction(None))) => true
      case (Seq(DeleteAction(None)), Seq()) => false
      case _ => unsupported("this WHEN-action combination")
    }
    val targetQuals = aliasesOf(m.targetTable, name)
    // ON: a conjunction of target-col = source-col equalities; each
    // side must carry a qualifier so the pairing is unambiguous
    def conjuncts(e: Expression): Seq[Expression] = e match {
      case And(l, r) => conjuncts(l) ++ conjuncts(r)
      case other => Seq(other)
    }
    val pairs = conjuncts(m.mergeCondition).map {
      case EqualTo(a: UnresolvedAttribute, b: UnresolvedAttribute)
          if a.nameParts.size == 2 && b.nameParts.size == 2 =>
        if (targetQuals.contains(a.nameParts.head) &&
            !targetQuals.contains(b.nameParts.head))
          (a.nameParts.last, b.nameParts)
        else if (targetQuals.contains(b.nameParts.head) &&
            !targetQuals.contains(a.nameParts.head))
          (b.nameParts.last, a.nameParts)
        else unsupported(s"ON conjunct must pair one target-qualified " +
          s"and one source-qualified column, got ${a.sql} = ${b.sql}")
      case other =>
        unsupported(s"ON conjunct ${other.sql} is not a qualified " +
          "column equality")
    }
    IcebergMergeCommand(name, dir, m.sourceTable, pairs, upsert)
  }
}

/** `INSERT INTO` / `INSERT OVERWRITE` over a registered IcebergLite
  * name — see [[IcebergWriteRewrite]] for the contract. */
case class IcebergInsertCommand(name: String, tableDir: String,
                                query: LogicalPlan, userCols: Seq[String],
                                overwrite: Boolean, byName: Boolean)
    extends LeafRunnableCommand {
  override def innerChildren: Seq[LogicalPlan] = Seq(query)

  override def run(session: SparkSession): Seq[Row] = {
    val df0 = GraftPlanShim.ofRows(session, query)
    val target = IcebergLite.tableSchema(session, tableDir)
    val renamed =
      if (userCols.nonEmpty) {
        if (userCols.size != df0.schema.size)
          refuse(s"the column list names ${userCols.size} columns but the " +
            s"query produces ${df0.schema.size}")
        df0.toDF(userCols: _*)
      } else if (byName) df0
      else {
        if (df0.schema.size != target.size)
          refuse(s"positional insert needs ${target.size} columns " +
            s"(${target.fieldNames.mkString(", ")}), got ${df0.schema.size}")
        df0.toDF(target.fieldNames: _*)
      }
    val aligned0 = IcebergWriteAlign.byName(name, renamed.toDF(), target)
    // OVERWRITE pins the source BEFORE the table empties: a
    // self-referencing `INSERT OVERWRITE t SELECT ... FROM t` must read
    // the pre-write snapshot (the real Iceberg contract), and a source
    // that fails mid-scan must not leave the table already truncated —
    // localCheckpoint materializes the source rows eagerly, so the
    // truncate below happens only after the source has fully evaluated.
    val aligned =
      if (overwrite) aligned0.localCheckpoint(eager = true) else aligned0
    if (overwrite && IcebergLite.tableRowCount(session, tableDir) > 0)
      // metadata-only: one empty-manifest-list snapshot drops every
      // live file — zero data files read or written (deleteWhere(true)
      // would scan the full table twice to produce nothing); history
      // still time-travels to the pre-overwrite data
      IcebergLite.truncateTable(session, tableDir)
    IcebergLite.appendSnapshot(session, aligned, tableDir,
      partitionBy = IcebergLite.tablePartitionSpec(session, tableDir))
    Seq.empty
  }

  private def refuse(why: String): Nothing =
    throw new IllegalArgumentException(s"INSERT INTO $name: $why")
}

/** An opaque holder keeping a (deliberately unresolved) predicate out
  * of the command node's `expressions` — CheckAnalysis would otherwise
  * refuse the command before run() ever resolves the predicate against
  * the table's own scan. */
final case class ExprBox(e: Expression)

/** `DELETE FROM <name> WHERE <cond>` — copy-on-write by default,
  * merge-on-read under `spark.graft.iceberg.deleteMode=mor`. The
  * command's result set is the deleted-row count. */
case class IcebergDeleteCommand(name: String, tableDir: String,
                                condition: ExprBox)
    extends LeafRunnableCommand {
  override val output: Seq[Attribute] =
    Seq(AttributeReference("deleted_rows", LongType, nullable = false)())

  override def run(session: SparkSession): Seq[Row] = {
    val pred = GraftColumnShim.column(condition.e)
    if (graft.sources.IcebergLite.tableRowCount(session, tableDir) == 0)
      return Seq(Row(0L))
    val n =
      if (session.conf.get("spark.graft.iceberg.deleteMode", "cow") == "mor")
        IcebergLite.deleteWhereMOR(session, tableDir, pred)
      else IcebergLite.deleteWhere(session, tableDir, pred)
    Seq(Row(n))
  }
}

/** `MERGE INTO` upsert / keyed delete — see [[IcebergWriteRewrite]].
  * `pairs` maps each target key column to the source-side qualified
  * name it equates to in the ON clause. */
case class IcebergMergeCommand(name: String, tableDir: String,
                               source: LogicalPlan,
                               pairs: Seq[(String, Seq[String])],
                               upsert: Boolean)
    extends LeafRunnableCommand {
  override def innerChildren: Seq[LogicalPlan] = Seq(source)
  override val output: Seq[Attribute] =
    Seq(AttributeReference("merged_keys", LongType, nullable = false)())

  override def run(session: SparkSession): Seq[Row] = {
    // materialize the source ONCE: the key audit, the equality delete,
    // and the final append must all see the same rows — a
    // non-deterministic source (or one reading the target table)
    // re-evaluated per consumer could delete one key set and append
    // another, losing or duplicating rows
    val src = GraftPlanShim.ofRows(session, source)
      .localCheckpoint(eager = true)
    val keys = src.select(pairs.map { case (t, s) =>
      col(s.mkString(".")).as(t)
    }: _*)
    // real MERGE refuses multiple source rows per key; silently
    // appending duplicates would diverge from it. NULL merge keys are
    // audited separately: countDistinct drops them (understating the
    // distinct count with a misleading duplicate message), and a NULL
    // key can never match under SQL equality anyway.
    val (nKeys, nRows, nNullKeys) = {
      val anyNull = keys.columns.map(col(_).isNull)
        .reduce(_ || _)
      val r = keys.agg(countDistinct(struct_all(keys)).as("k"),
        count(lit(1)).as("n"),
        count(org.apache.spark.sql.functions.when(anyNull, 1)).as("nulls"))
        .head()
      (r.getLong(0), r.getLong(1), r.getLong(2))
    }
    if (nNullKeys > 0)
      throw new IllegalArgumentException(
        s"MERGE INTO $name: $nNullKeys source row(s) carry a NULL ON-key " +
          "column — a NULL key matches no target row under SQL equality; " +
          "filter them out (or fix the key) before merging")
    if (nKeys != nRows - nNullKeys)
      throw new IllegalArgumentException(
        s"MERGE INTO $name: the source has ${nRows - nNullKeys - nKeys} " +
          "duplicate rows on the ON key — MERGE requires at most one " +
          "source row per target row")
    val n = IcebergLite.equalityDeleteMOR(session, tableDir, keys)
    if (upsert) {
      val target = IcebergLite.tableSchema(session, tableDir)
      val aligned = IcebergWriteAlign.byName(s"MERGE INTO $name", src.toDF(),
        target)
      IcebergLite.appendSnapshot(session, aligned, tableDir,
        partitionBy = IcebergLite.tablePartitionSpec(session, tableDir))
    }
    Seq(Row(n))
  }

  private def struct_all(df: org.apache.spark.sql.DataFrame) =
    org.apache.spark.sql.functions.struct(
      df.columns.map(col).toIndexedSeq: _*)
}

/** Column alignment shared by insert and merge: every table column must
  * be present by name; types must match or upcast losslessly. */
object IcebergWriteAlign {
  def byName(what: String, df: org.apache.spark.sql.DataFrame,
             target: StructType): org.apache.spark.sql.DataFrame = {
    val have = df.schema.fields.map(f => f.name -> f).toMap
    if (have.size != df.schema.size)
      throw new IllegalArgumentException(
        s"$what: the query produces duplicate column names " +
          df.schema.fieldNames.mkString("(", ", ", ")"))
    val extra = df.schema.fieldNames.toSet -- target.fieldNames.toSet
    if (extra.nonEmpty)
      throw new IllegalArgumentException(
        s"$what: columns ${extra.toSeq.sorted.mkString(", ")} are not in " +
          s"the table schema (${target.fieldNames.mkString(", ")})")
    val cols = target.fields.map { tf =>
      val sf = have.getOrElse(tf.name, throw new IllegalArgumentException(
        s"$what: table column ${tf.name} is missing from the query " +
          "(every table column must be supplied)"))
      if (sf.dataType == tf.dataType) col(tf.name)
      else if (Cast.canUpCast(sf.dataType, tf.dataType))
        col(tf.name).cast(tf.dataType)
      else throw new IllegalArgumentException(
        s"$what: column ${tf.name} is ${sf.dataType.simpleString} but the " +
          s"table declares ${tf.dataType.simpleString} — no lossless cast; " +
          "cast explicitly in the query if the narrowing is intended")
    }
    df.select(cols.toIndexedSeq: _*)
  }
}
