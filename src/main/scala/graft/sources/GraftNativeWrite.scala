package graft.sources

import scala.collection.mutable

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{GraftParquetShim, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{BoundReference, UnsafeProjection}
import org.apache.spark.sql.connector.distributions.{Distribution, Distributions}
import org.apache.spark.sql.connector.expressions.{Expressions, SortDirection, SortOrder}
import org.apache.spark.sql.connector.read.ScanBuilder
import org.apache.spark.sql.connector.write.{BatchWrite, DataWriter, DataWriterFactory, LogicalWriteInfo, PhysicalWriteInfo, RequiresDistributionAndOrdering, RowLevelOperation, RowLevelOperationBuilder, RowLevelOperationInfo, Write, WriteBuilder, WriterCommitMessage}
import org.apache.spark.sql.connector.write.RowLevelOperation.Command
import org.apache.spark.sql.execution.datasources.OutputWriterFactory
import org.apache.spark.sql.sources.Filter
import org.apache.spark.sql.types.{DataType, IntegerType, LongType, StringType, StructType}
import org.apache.spark.sql.util.CaseInsensitiveStringMap

/** A serializable Hadoop `Configuration` (the standard write/readFields
  * envelope) — ships the session conf to executor DataWriters. */
class GraftHadoopConf(@transient var value: Configuration)
    extends Serializable {
  private def writeObject(out: java.io.ObjectOutputStream): Unit = {
    out.defaultWriteObject()
    value.write(out)
  }
  private def readObject(in: java.io.ObjectInputStream): Unit = {
    in.defaultReadObject()
    value = new Configuration(false)
    value.readFields(in)
  }
}

/** NATIVE V2 row-level DML over a graft catalog table — the
  * `SupportsRowLevelOperations` implementation that lets the STOCK
  * analyzer plan `DELETE` / `UPDATE` / `MERGE` with no graft session
  * extensions installed (the route a third-party tool that builds its
  * own plans takes; ingest tooling in the reference drives exactly this
  * API surface through its catalogs).
  *
  * GROUP-BASED (copy-on-write): the operation's scan plans the
  * candidate files — bounds/partition/Bloom-pruned by the pushed
  * command condition, so a targeted DELETE reads its slice, never the
  * table — and the write replaces exactly those groups with the
  * transformed rows, committed as ONE snapshot
  * ([[IcebergLite.commitReplaceGroups]]): no half-applied crash
  * window. Spark's own `OptimizeMetadataOnlyDeleteFromTable` still
  * short-circuits fully filter-expressible DELETEs onto the
  * metadata-only `SupportsDeleteV2` path before any of this runs.
  *
  * Executor `DataWriter`s write parquet through the session-configured
  * `ParquetFileFormat` factory in the SAME partitionBy directory
  * layout the DataFrame route produces (identity partition columns
  * move into the directory key; fanout writers roll a file per
  * partition tuple), so native-written files are indistinguishable
  * from API-written ones — one read path serves both. The write
  * requires a distribution CLUSTERED on the partition transforms
  * (resolved through [[GraftFunctions]]) to keep the file count
  * bounded at fleet scale, and the table's persisted sort order as the
  * within-partition ordering. */
class GraftRowLevelOperation(tableName: String, tableDir: String,
                             cmd: Command)
    extends RowLevelOperation {

  private def spark = SparkSession.active

  // the scan Spark plans for this operation — its file set IS the
  // group set the write replaces (captured at build, read at commit)
  @volatile private var builtScan: GraftNativeBatchScan = _

  override def command(): Command = cmd
  override def description(): String = s"GraftRowLevel $cmd $tableName"

  override def newScanBuilder(options: CaseInsensitiveStringMap)
      : ScanBuilder =
    new ScanBuilder
        with org.apache.spark.sql.connector.read.SupportsPushDownFilters
        with org.apache.spark.sql.connector.read.SupportsPushDownRequiredColumns {
      private var required: StructType =
        IcebergLite.tableSchema(spark, tableDir)
      private var pushed: Array[Filter] = Array.empty
      override def pushFilters(filters: Array[Filter]): Array[Filter] = {
        pushed = filters
        filters // group-pruning hints only; Spark keeps every row filter
      }
      override def pushedFilters(): Array[Filter] = Array.empty
      override def pruneColumns(requiredSchema: StructType): Unit =
        required = requiredSchema
      override def build(): org.apache.spark.sql.connector.read.Scan = {
        val preds = pushed.toSeq.flatMap(GraftTableCatalog.filterPreds)
        val info = IcebergLite.nativeScanInfo(spark, tableDir, preds)
          .getOrElse(throw new UnsupportedOperationException(
            s"$cmd on $tableName: the table carries merge-on-read " +
              "deletes or multiple schema/spec generations, which the " +
              "native row-level path cannot represent — run " +
              "IcebergLite.compact(...) first, or install " +
              "graft.GraftExtensions and use the SQL route"))
        builtScan = new GraftNativeBatchScan(spark, tableName, info,
          required, pushed.toSeq)
        builtScan
      }
    }

  override def newWriteBuilder(info: LogicalWriteInfo): WriteBuilder =
    new WriteBuilder {
      override def build(): Write = {
        val meta = IcebergLite.nativeScanInfo(spark, tableDir)
          .getOrElse(throw new UnsupportedOperationException(
            s"$cmd on $tableName: table state not native-writable"))
        new GraftReplaceGroupsWrite(spark, tableName, tableDir,
          info.schema(), meta,
          () => {
            require(builtScan != null,
              s"$cmd on $tableName: the operation's scan was never built")
            builtScan.plannedFiles.toSet
          })
      }
    }
}

/** The group-replacement `Write`: clustered on the partition
  * transforms, ordered by the persisted sort columns, committed as ONE
  * snapshot that drops the scanned groups and adopts the staged files. */
class GraftReplaceGroupsWrite(spark: SparkSession, tableName: String,
                              tableDir: String, writeSchema: StructType,
                              info: IcebergLite.NativeScanInfo,
                              replacedFiles: () => Set[String])
    extends Write with RequiresDistributionAndOrdering {

  override def description(): String = s"GraftReplaceGroups $tableName"

  override def requiredDistribution(): Distribution =
    if (info.specItems.isEmpty) Distributions.unspecified()
    else Distributions.clustered(
      info.specItems.map(GraftTableCatalog.toTransform)
        .toArray[org.apache.spark.sql.connector.expressions.Expression])

  override def requiredOrdering(): Array[SortOrder] =
    info.sortCols.map(c =>
      Expressions.sort(Expressions.column(c), SortDirection.ASCENDING))
      .toArray

  override def toBatch: BatchWrite = {
    // the staging dir is keyed to the snapshot this statement will
    // commit (single-writer discipline, as everywhere in IcebergLite);
    // "-w" keeps it clear of same-snapshot API writes
    val snapshotId = IcebergLite.nextSnapshotIdOf(spark, tableDir)
    val stagingDir = s"$tableDir/data/s$snapshotId-w"
    new GraftReplaceBatchWrite(spark, tableName, tableDir, stagingDir,
      writeSchema, info, replacedFiles)
  }
}

/** Commit message: the parquet files one task wrote. */
case class GraftWriteCommit(files: Seq[String]) extends WriterCommitMessage

class GraftReplaceBatchWrite(spark: SparkSession, tableName: String,
                             tableDir: String, stagingDir: String,
                             writeSchema: StructType,
                             info: IcebergLite.NativeScanInfo,
                             replacedFiles: () => Set[String])
    extends BatchWrite {

  override def createBatchWriterFactory(phys: PhysicalWriteInfo)
      : DataWriterFactory = {
    val identityNames = info.spec.collect {
      case (pf, _) if pf.transform == "identity" => pf.sourceCol
    }.toSet
    val fileIdx = writeSchema.fields.zipWithIndex
      .collect { case (f, i) if !identityNames(f.name) => i }.toSeq
    val fileSchema = StructType(fileIdx.map(writeSchema.fields(_)))
    val specEval = info.spec.map { case (pf, _) =>
      val srcIdx = writeSchema.fieldIndex(pf.sourceCol)
      (pf.name, pf.transform, writeSchema.fields(srcIdx).dataType, srcIdx)
    }
    val (owf, jobConf) =
      GraftParquetShim.parquetWriterFactory(spark, fileSchema)
    GraftDataWriterFactory(owf, new GraftHadoopConf(jobConf),
      stagingDir, writeSchema, fileIdx, fileSchema, specEval)
  }

  override def commit(messages: Array[WriterCommitMessage]): Unit = {
    // ONE snapshot: carried untouched files + the staged replacement
    // files (entries derived by the same read-back pass the DataFrame
    // writer uses — bounds, partition values, Bloom sidecars). Only
    // files named by COMMITTED task messages adopt — a crashed
    // speculative attempt's strays stay orphans.
    val staged = messages.toSeq.flatMap {
      case GraftWriteCommit(files) => files
      case _ => Nil
    }
    IcebergLite.commitReplaceGroups(spark, tableDir, replacedFiles(),
      stagingDir, staged)
  }

  override def abort(messages: Array[WriterCommitMessage]): Unit = {
    val p = new Path(stagingDir)
    val fs = p.getFileSystem(
      GraftParquetShim.sessionHadoopConf(spark))
    if (fs.exists(p)) fs.delete(p, true)
  }
}

/** Fanout parquet writer factory: one rolled file per partition tuple
  * per task (the bounded-file-count shape required clustering makes
  * cheap), writing through the session's parquet OutputWriterFactory. */
case class GraftDataWriterFactory(owf: OutputWriterFactory,
                                  conf: GraftHadoopConf,
                                  stagingDir: String,
                                  writeSchema: StructType,
                                  fileIdx: Seq[Int],
                                  fileSchema: StructType,
                                  specEval: Seq[(String, String, DataType, Int)])
    extends DataWriterFactory {

  override def createWriter(partitionId: Int,
                            taskId: Long): DataWriter[InternalRow] =
    new GraftFanoutDataWriter(owf, conf.value, stagingDir, writeSchema,
      fileIdx, fileSchema, specEval, partitionId, taskId)
}

class GraftFanoutDataWriter(owf: OutputWriterFactory, conf: Configuration,
                            stagingDir: String, writeSchema: StructType,
                            fileIdx: Seq[Int], fileSchema: StructType,
                            specEval: Seq[(String, String, DataType, Int)],
                            partitionId: Int, taskId: Long)
    extends DataWriter[InternalRow] {

  // Spark's plain writing task hands the ReplaceData query output RAW,
  // which carries a leading `__row_operation` int column when the
  // rewrite produced one (it only gets projected away on the
  // metadata-attribute path) — detect the offset from the first row and
  // shift every field index by it. Group-based replaces only emit
  // write-operation rows, so the op code never drops a row here; the
  // guard refuses anything unexpected rather than mis-writing.
  private var off = -1
  private var proj: UnsafeProjection = _
  private def bind(row: InternalRow): Unit = {
    off = row.numFields - writeSchema.size
    require(off == 0 || off == 1,
      s"row layout ${row.numFields} fields vs write schema " +
        s"${writeSchema.size} — unsupported shape")
    proj = UnsafeProjection.create(fileIdx.map(i =>
      BoundReference(i + off, writeSchema.fields(i).dataType,
        writeSchema.fields(i).nullable)).toIndexedSeq)
  }
  private val open = mutable.LinkedHashMap.empty[String,
    org.apache.spark.sql.execution.datasources.OutputWriter]
  private val ext = {
    // extension needs a TaskAttemptContext: synthesize one once
    val ctx = new org.apache.hadoop.mapreduce.task.TaskAttemptContextImpl(
      conf, new org.apache.hadoop.mapreduce.TaskAttemptID(
        new org.apache.hadoop.mapreduce.TaskID(
          new org.apache.hadoop.mapreduce.JobID("graft", 0),
          org.apache.hadoop.mapreduce.TaskType.MAP, partitionId), 0))
    owf.getFileExtension(ctx)
  }

  /** One row's partition directory (Hive p=v layout, Spark escaping),
    * "" for unpartitioned tables. */
  private def dirOf(row: InternalRow): String =
    specEval.map { case (name, transform, srcType, srcIdx0) =>
      val srcIdx = srcIdx0 + off
      val v =
        if (row.isNullAt(srcIdx)) null
        else IcebergTransforms.applyValue(transform, srcType,
          srcType match {
            case StringType => row.getUTF8String(srcIdx).toString
            case LongType => row.getLong(srcIdx)
            case IntegerType => row.getInt(srcIdx)
            case org.apache.spark.sql.types.DateType => row.getInt(srcIdx)
            case org.apache.spark.sql.types.TimestampType =>
              row.getLong(srcIdx)
            case other => sys.error(
              s"native write over partition source ${other.simpleString}")
          })
      val rendered =
        if (v == null) "__HIVE_DEFAULT_PARTITION__"
        else GraftParquetShim.escapePathName(v.toString)
      s"$name=$rendered"
    }.mkString("/")

  override def write(row: InternalRow): Unit = {
    if (off < 0) bind(row)
    val dir = dirOf(row)
    val w = open.getOrElseUpdate(dir, {
      val base = if (dir.isEmpty) stagingDir else s"$stagingDir/$dir"
      GraftParquetShim.newOutputWriter(owf, conf,
        s"$base/part-$partitionId-$taskId-${open.size}$ext", fileSchema,
        partitionId, open.size)
    })
    w.write(proj(row))
  }

  override def commit(): WriterCommitMessage = {
    val files = open.values.map(_.path()).toSeq
    open.values.foreach(_.close())
    open.clear()
    GraftWriteCommit(files)
  }

  override def abort(): Unit = {
    val files = open.values.map(_.path()).toSeq
    open.values.foreach { w =>
      try w.close() catch { case _: Exception => () }
    }
    open.clear()
    files.foreach { f =>
      val p = new Path(f)
      try p.getFileSystem(conf).delete(p, false)
      catch { case _: Exception => () }
    }
  }

  override def close(): Unit = {
    open.values.foreach { w =>
      try w.close() catch { case _: Exception => () }
    }
    open.clear()
  }
}
