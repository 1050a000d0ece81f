package graft.sources

import scala.collection.mutable
import scala.jdk.CollectionConverters._

import org.apache.avro.Schema
import org.apache.avro.file.{DataFileStream, DataFileWriter}
import org.apache.avro.generic.{GenericData, GenericDatumReader, GenericDatumWriter, GenericRecord}
import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types._

/** Iceberg TABLE-FORMAT read/write without the Iceberg runtime — the
  * lakehouse leg the reference's `init_neutron_data.py` /
  * `ingest_neutron_data.py` target (SURVEY §2.3 #24/25 generate the DDL
  * and the routing; the runtime itself has no jars in this container,
  * so the TABLE FORMAT is implemented here from the public Iceberg spec
  * (v1), the `graft.sources.Hdf5` move applied to the lakehouse):
  *
  *   table/
  *     metadata/version-hint.text        → latest metadata version
  *     metadata/vN.metadata.json         → schema (field-ids), specs,
  *                                         snapshots, current pointer
  *     metadata/snap-<id>.avro           → manifest list (avro)
  *     metadata/manifest-<id>-<k>.avro   → manifest: data-file entries
  *     data/s<id>/[<k>=<v>/]part-*.parquet
  *
  * Supported subset (loud errors outside it): format v1 — appends,
  * copy-on-write deleteWhere, compaction, snapshot expiry, schema
  * evolution (add/rename/widen), manifest column bounds + file-skipping
  * reads, plus the v2 MERGE-ON-READ delete mechanisms — position
  * deletes (deleteWhereMOR: content=1 delete manifests over
  * (file_path, pos) parquet; readers anti-join) and EQUALITY deletes
  * (equalityDeleteMOR: content=2 manifests whose key-row parquet drops
  * matches from files predating the delete — the CDC/upsert shape;
  * compact applies both physically) carried on the v1-lite metadata
  * chain, persisted sort-order metadata (identity asc; appendSnapshot/
  * sink inherit the table's clustering when the caller names none),
  * PARTITION TRANSFORMS incl. hidden partitioning — identity plus
  * `bucket[N]` (spec murmur3), `truncate[W]`, `day`/`month`/`year`/
  * `hour`, written as derived directory keys, pruned through
  * source-column predicates ([[IcebergTransforms]]) —
  * primitive column types (boolean/int/long/
  * float/double/string/binary/timestamp/date/decimal) plus nested
  * map/list/struct with spec-conformant unique field-id assignment —
  * everything the 8-table schemas (incl. their map<string,string>
  * attribute columns) and the corpus tables use. Snapshot ids are
  * sequential (1, 2, …) so appends are replay-deterministic.
  *
  * Scale shape: data files are written and read by Spark (distributed,
  * column-pruned, partition-dir recovery per snapshot); everything this
  * object touches directly is METADATA — KB-sized avro/json on the
  * driver, exactly how the real runtime treats it. Readers never list
  * the data directory: the file set comes from the manifests, so
  * concurrent writers/failed writes can't corrupt a read (the Iceberg
  * contract this format exists for).
  */
object IcebergLite {

  // ---- schema mapping ----------------------------------------------------

  private def icebergType(dt: DataType): String = dt match {
    case BooleanType => "boolean"
    case IntegerType | ShortType | ByteType => "int"
    case LongType => "long"
    case FloatType => "float"
    case DoubleType => "double"
    case StringType => "string"
    case BinaryType => "binary"
    case TimestampType => "timestamptz"
    case DateType => "date"
    case d: DecimalType => s"decimal(${d.precision}, ${d.scale})"
    case other => sys.error(
      s"unsupported Iceberg column type ${other.simpleString}")
  }

  /** Nested type JSON with spec-conformant unique field-id assignment
    * (`nextId` allocates ids for nested map/list/struct members). */
  private def icebergTypeJson(dt: DataType, nextId: () => Int): String =
    dt match {
      case MapType(k, v, valueNullable) =>
        val kid = nextId(); val vid = nextId()
        s"""{"type": "map", "key-id": $kid,
            "key": ${icebergTypeJson(k, nextId)},
            "value-id": $vid,
            "value": ${icebergTypeJson(v, nextId)},
            "value-required": ${!valueNullable}}"""
      case ArrayType(e, containsNull) =>
        val eid = nextId()
        s"""{"type": "list", "element-id": $eid,
            "element": ${icebergTypeJson(e, nextId)},
            "element-required": ${!containsNull}}"""
      case st: StructType =>
        val fields = st.fields.map { f =>
          val id = nextId()
          s"""{"id": $id, "name": ${q(f.name)},
              "required": ${!f.nullable},
              "type": ${icebergTypeJson(f.dataType, nextId)}}"""
        }
        s"""{"type": "struct", "fields": [${fields.mkString(", ")}]}"""
      case prim => q(icebergType(prim))
    }

  private def sparkType(node: com.fasterxml.jackson.databind.JsonNode): DataType =
    if (node.isTextual) node.asText() match {
      case "boolean" => BooleanType
      case "int" => IntegerType
      case "long" => LongType
      case "float" => FloatType
      case "double" => DoubleType
      case "string" => StringType
      case "binary" => BinaryType
      case "timestamptz" | "timestamp" => TimestampType
      case "date" => DateType
      case d if d.startsWith("decimal") =>
        val Array(p, s) = d.stripPrefix("decimal(").stripSuffix(")")
          .split(",").map(_.trim.toInt)
        DecimalType(p, s)
      case other => sys.error(s"unsupported Iceberg type '$other'")
    } else node.get("type").asText() match {
      case "map" =>
        MapType(sparkType(node.get("key")), sparkType(node.get("value")),
          !node.get("value-required").asBoolean())
      case "list" =>
        ArrayType(sparkType(node.get("element")),
          !node.get("element-required").asBoolean())
      case "struct" =>
        StructType(node.get("fields").elements().asScala.map(f =>
          StructField(f.get("name").asText(), sparkType(f.get("type")),
            !f.get("required").asBoolean())).toSeq)
      case other => sys.error(s"unsupported Iceberg nested type '$other'")
    }

  /** Returns (schema json, last-column-id). Top-level columns take ids
    * 1..n, nested members allocate upward from there — deterministic
    * for a given Spark schema, so append-time schema equality is a
    * string compare. */
  private def schemaJson(schema: StructType): (String, Int) = {
    var id = schema.fields.length
    val nextId = () => { id += 1; id }
    val fields = schema.fields.zipWithIndex.map { case (f, i) =>
      s"""{"id": ${i + 1}, "name": ${q(f.name)}, "required": ${!f.nullable}, """ +
        s""""type": ${icebergTypeJson(f.dataType, nextId)}}"""
    }
    (s"""{"type": "struct", "schema-id": 0, "fields": [${fields.mkString(", ")}]}""",
      id)
  }

  private def q(s: String): String =
    "\"" + s.replace("\\", "\\\\").replace("\"", "\\\"") + "\""

  private def renderSpec(pf: IcebergTransforms.PartField): String =
    if (pf.transform == "identity") pf.sourceCol
    else s"${pf.transform}:${pf.sourceCol}"

  // ---- avro manifest schemas (field-ids per the Iceberg v1 spec) ---------

  /** One spec entry: the partition field + the VALUE type its transform
    * produces over the current source type (what the avro partition
    * record and the pruning comparisons use). */
  private type TypedSpec = Seq[(IcebergTransforms.PartField, DataType)]

  /** Resolve a spec's partition-value types against a schema — also the
    * transform/source-type compatibility gate (loud error outside the
    * supported subset, at write/commit time rather than mid-scan). */
  private def typedSpec(spec: Seq[IcebergTransforms.PartField],
                        schema: StructType): TypedSpec =
    spec.map { pf =>
      require(schema.fieldNames.contains(pf.sourceCol),
        s"partition source column ${pf.sourceCol} not in schema")
      pf -> IcebergTransforms.resultType(pf.transform,
        schema(pf.sourceCol).dataType)
    }

  private def partitionAvroFields(spec: TypedSpec): String =
    spec.zipWithIndex.map { case ((pf, dt), i) =>
      val avroT = dt match {
        case IntegerType => "\"int\""
        case LongType => "\"long\""
        case StringType => "\"string\""
        case other => sys.error(
          s"partition value type ${other.simpleString} not supported " +
            "(int/long/string only)")
      }
      s"""{"name": ${q(pf.name)}, "type": ["null", $avroT], "default": null,
          "field-id": ${1000 + i}}"""
    }.mkString(", ")

  private def manifestEntrySchema(spec: TypedSpec): Schema =
    new Schema.Parser().parse(s"""
      {"type": "record", "name": "manifest_entry", "fields": [
        {"name": "status", "type": "int", "field-id": 0},
        {"name": "snapshot_id", "type": ["null", "long"], "default": null,
         "field-id": 1},
        {"name": "data_file", "field-id": 2, "type":
          {"type": "record", "name": "r2", "fields": [
            {"name": "file_path", "type": "string", "field-id": 100},
            {"name": "file_format", "type": "string", "field-id": 101},
            {"name": "partition", "field-id": 102, "type":
              {"type": "record", "name": "r102",
               "fields": [${partitionAvroFields(spec)}]}},
            {"name": "record_count", "type": "long", "field-id": 103},
            {"name": "file_size_in_bytes", "type": "long", "field-id": 104},
            {"name": "lower_bounds", "field-id": 125, "default": null,
             "type": ["null", {"type": "array", "items":
               {"type": "record", "name": "k126_v127", "fields": [
                 {"name": "key", "type": "int", "field-id": 126},
                 {"name": "value", "type": "bytes", "field-id": 127}]}}]},
            {"name": "upper_bounds", "field-id": 128, "default": null,
             "type": ["null", {"type": "array", "items":
               {"type": "record", "name": "k129_v130", "fields": [
                 {"name": "key", "type": "int", "field-id": 129},
                 {"name": "value", "type": "bytes", "field-id": 130}]}}]}
          ]}}
      ]}""")

  /** First `n` CODE POINTS of `s` (never splits a surrogate pair —
    * splitting would corrupt the UTF-8 bound bytes). */
  private def cpTake(s: String, n: Int): String = {
    val cps = s.codePointCount(0, s.length)
    if (cps <= n) s else s.substring(0, s.offsetByCodePoints(0, n))
  }

  /** A string strictly greater than every string sharing `prefix`:
    * the last incrementable code point +1, the tail dropped. None when
    * no code point can be incremented to a valid scalar (then the
    * column simply gets no upper bound — conservative). */
  private def incrementPrefix(prefix: String): Option[String] = {
    var end = prefix.length
    while (end > 0) {
      val cp = prefix.codePointBefore(end)
      val start = end - Character.charCount(cp)
      val next = cp + 1
      val valid = next <= 0x10FFFF &&
        !(next >= 0xD800 && next <= 0xDFFF)
      if (valid)
        return Some(prefix.substring(0, start) +
          new String(Character.toChars(next)))
      end = start
    }
    None
  }

  /** Iceberg single-value serialization for the bound maps (spec
    * Appendix D: little-endian fixed width numerics, UTF-8 strings). */
  private def boundBytes(dt: DataType, v: Any): Option[Array[Byte]] =
    Option(v).flatMap { value =>
      def le(n: Long, w: Int): Array[Byte] =
        Array.tabulate(w)(i => ((n >> (8 * i)) & 0xff).toByte)
      (dt, value) match {
        case (IntegerType, n: java.lang.Number) => Some(le(n.longValue(), 4))
        case (LongType, n: java.lang.Number) => Some(le(n.longValue(), 8))
        case (FloatType, n: java.lang.Number) =>
          Some(le(java.lang.Float.floatToIntBits(n.floatValue()).toLong & 0xffffffffL, 4))
        case (DoubleType, n: java.lang.Number) =>
          Some(le(java.lang.Double.doubleToLongBits(n.doubleValue()), 8))
        case (StringType, s: String) => Some(s.getBytes("UTF-8"))
        // temporal bounds serialize as their integral physical values
        // (spec Appendix D: date = days int, timestamp = micros long),
        // exactly the Catalyst-internal readings predicates arrive in
        case (DateType, d: java.sql.Date) =>
          Some(le(org.apache.spark.sql.catalyst.util.DateTimeUtils
            .fromJavaDate(d).toLong, 4))
        case (DateType, d: java.time.LocalDate) =>
          Some(le(d.toEpochDay, 4))
        case (DateType, n: java.lang.Number) => Some(le(n.longValue(), 4))
        case (TimestampType, t: java.sql.Timestamp) =>
          Some(le(org.apache.spark.sql.catalyst.util.DateTimeUtils
            .fromJavaTimestamp(t), 8))
        case (TimestampType, i: java.time.Instant) =>
          Some(le(org.apache.spark.sql.catalyst.util.DateTimeUtils
            .instantToMicros(i), 8))
        case (TimestampType, n: java.lang.Number) =>
          Some(le(n.longValue(), 8))
        case _ => None
      }
    }

  /** Decode a stored bound against the CURRENT column type. The byte
    * LENGTH carries the width the value was written at, so bounds
    * recorded before an int→long / float→double widening still decode
    * correctly (sign-extended / float-promoted). */
  private def boundValue(dt: DataType, b: Array[Byte]): Option[Any] = {
    def le(w: Int): Long = {
      var v = 0L; var i = 0
      while (i < w) { v |= (b(i) & 0xffL) << (8 * i); i += 1 }
      v
    }
    dt match {
      case IntegerType | LongType | DateType | TimestampType =>
        var v = le(b.length)
        val shift = 64 - 8 * b.length
        if (shift > 0) v = (v << shift) >> shift
        // temporal values decode to their Catalyst-internal integrals
        // (date = days INT, timestamp = micros LONG)
        Some(if (dt == IntegerType || dt == DateType) v.toInt else v)
      case FloatType | DoubleType =>
        val d =
          if (b.length == 4) java.lang.Float.intBitsToFloat(le(4).toInt).toDouble
          else java.lang.Double.longBitsToDouble(le(8))
        Some(if (dt == FloatType) d.toFloat else d)
      case StringType => Some(new String(b, "UTF-8"))
      case _ => None
    }
  }

  /** Integral reading of a bound-comparable value: numbers pass
    * through; temporal EXTERNALS (predicates arrive in both forms —
    * Catalyst-internal integrals from the catalyst routes, java.sql /
    * java.time values through the public Pred API) normalize to their
    * Catalyst-internal integrals (days / micros). */
  private def integralBound(v: Any): Long = v match {
    case n: java.lang.Number => n.longValue()
    case d: java.sql.Date =>
      org.apache.spark.sql.catalyst.util.DateTimeUtils.fromJavaDate(d).toLong
    case d: java.time.LocalDate => d.toEpochDay
    case t: java.sql.Timestamp =>
      org.apache.spark.sql.catalyst.util.DateTimeUtils.fromJavaTimestamp(t)
    case i: java.time.Instant =>
      org.apache.spark.sql.catalyst.util.DateTimeUtils.instantToMicros(i)
    case other => sys.error(s"no integral bound reading for $other")
  }

  private def cmpBound(dt: DataType, a: Any, b: Any): Int = dt match {
    case IntegerType | LongType | DateType | TimestampType =>
      java.lang.Long.compare(integralBound(a), integralBound(b))
    case FloatType | DoubleType => java.lang.Double.compare(
      a.asInstanceOf[Number].doubleValue(), b.asInstanceOf[Number].doubleValue())
    case StringType =>
      // UNSIGNED UTF-8 byte order — the order Spark's min/max computed
      // the stored bounds in. String.compareTo is UTF-16 code-unit
      // order, which disagrees above U+E000 vs supplementary planes
      // (emoji) and would prune files that contain matching rows.
      val x = a.toString.getBytes("UTF-8")
      val y = b.toString.getBytes("UTF-8")
      var i = 0
      val n = math.min(x.length, y.length)
      while (i < n) {
        val c = (x(i) & 0xff) - (y(i) & 0xff)
        if (c != 0) return c
        i += 1
      }
      x.length - y.length
    case other => sys.error(s"no bound ordering for ${other.simpleString}")
  }

  private val ManifestFileSchema: Schema = new Schema.Parser().parse("""
    {"type": "record", "name": "manifest_file", "fields": [
      {"name": "manifest_path", "type": "string", "field-id": 500},
      {"name": "manifest_length", "type": "long", "field-id": 501},
      {"name": "partition_spec_id", "type": "int", "field-id": 502},
      {"name": "content", "type": ["null", "int"], "default": null,
       "field-id": 517},
      {"name": "added_snapshot_id", "type": ["null", "long"],
       "default": null, "field-id": 503},
      {"name": "added_data_files_count", "type": ["null", "int"],
       "default": null, "field-id": 504},
      {"name": "added_rows_count", "type": ["null", "long"],
       "default": null, "field-id": 512},
      {"name": "existing_data_files_count", "type": ["null", "int"],
       "default": null, "field-id": 505},
      {"name": "existing_rows_count", "type": ["null", "long"],
       "default": null, "field-id": 513}
    ]}""")

  // ---- hadoop-fs helpers (storage-agnostic: local, HDFS, S3A…) -----------

  private def fs(spark: SparkSession, p: Path): FileSystem =
    p.getFileSystem(spark.sparkContext.hadoopConfiguration)

  private def writeBytes(spark: SparkSession, p: Path, bytes: Array[Byte]): Unit = {
    val out = fs(spark, p).create(p, true)
    try out.write(bytes) finally out.close()
  }

  private def readBytes(spark: SparkSession, p: Path): Array[Byte] = {
    val in = fs(spark, p).open(p)
    try {
      val bos = new java.io.ByteArrayOutputStream()
      val buf = new Array[Byte](65536)
      var n = in.read(buf)
      while (n >= 0) { bos.write(buf, 0, n); n = in.read(buf) }
      bos.toByteArray
    } finally in.close()
  }

  private def writeAvro(spark: SparkSession, p: Path, schema: Schema,
                        records: Seq[GenericRecord],
                        meta: Map[String, String]): Long = {
    val w = new DataFileWriter[GenericRecord](
      new GenericDatumWriter[GenericRecord](schema))
    meta.foreach { case (k, v) => w.setMeta(k, v) }
    val out = fs(spark, p).create(p, true)
    w.create(schema, out)
    records.foreach(w.append)
    w.close()
    fs(spark, p).getFileStatus(p).getLen
  }

  private def readAvro(spark: SparkSession, p: Path): Seq[GenericRecord] = {
    val in = new java.io.ByteArrayInputStream(readBytes(spark, p))
    val r = new DataFileStream[GenericRecord](in,
      new GenericDatumReader[GenericRecord]())
    try r.iterator().asScala.toVector finally r.close()
  }

  /** Manifest records plus the WRITE-TIME schema recorded in the avro
    * file metadata — the per-file name↔field-id mapping source that
    * makes reading old snapshots through an evolved schema possible. */
  private def readManifest(spark: SparkSession, p: Path)
      : (Seq[GenericRecord], String) = {
    val in = new java.io.ByteArrayInputStream(readBytes(spark, p))
    val r = new DataFileStream[GenericRecord](in,
      new GenericDatumReader[GenericRecord]())
    try (r.iterator().asScala.toVector,
      Option(r.getMetaString("schema")).getOrElse(
        sys.error(s"manifest $p has no schema metadata")))
    finally r.close()
  }

  // ---- write -------------------------------------------------------------

  /** Create the table with an initial snapshot (overwrites any existing
    * table dir). `partitionBy` items are plain column names (identity)
    * or transform specs — `"bucket[16]:id"`, `"truncate[8]:name"`,
    * `"day:ts"`, `"month:ts"`, `"year:ts"`, `"hour:ts"` (see
    * [[IcebergTransforms]]); `sortBy` range-clusters the batch (see
    * [[appendSnapshot]]). */
  def createTable(spark: SparkSession, df: DataFrame, tableDir: String,
                  partitionBy: Seq[String] = Nil,
                  sortBy: Seq[String] = Nil,
                  sortFiles: Int = 0,
                  bloomFor: Seq[String] = Nil): Unit = {
    val root = new Path(tableDir)
    fs(spark, root).delete(root, true)
    appendSnapshot(spark, df, tableDir, partitionBy, sortBy = sortBy,
      sortFiles = sortFiles, bloomFor = bloomFor)
  }

  /** Create the table from a SCHEMA alone — snapshot 1 carries an empty
    * manifest list, so the table reads back as zero rows of the
    * declared shape and the first [[appendSnapshot]] stacks on it like
    * any other commit. The plain `CREATE TABLE` (no AS SELECT) shape a
    * catalog needs; metadata-only, no data IO. Overwrites any existing
    * table dir (the createTable contract). */
  def createEmptyTable(spark: SparkSession, schema: StructType,
                       tableDir: String,
                       partitionBy: Seq[String] = Nil,
                       sortBy: Seq[String] = Nil,
                       bloomFor: Seq[String] = Nil): Unit = {
    val root = new Path(tableDir)
    fs(spark, root).delete(root, true)
    val reqSpec = partitionBy.map(IcebergTransforms.parse)
    (reqSpec.map(_.sourceCol) ++ sortBy ++ bloomFor).foreach(c =>
      require(schema.fieldNames.contains(c),
        s"column $c (partition/sort/bloom contract) not in the schema " +
          s"(${schema.fieldNames.mkString(", ")})"))
    val (schemaJs, lastColumnId) = schemaJson(schema)
    commit(spark, root, None, snapshotId = 1L, version = 1,
      manifests = Seq.empty, schemaJs, lastColumnId,
      specs = Seq(0 -> reqSpec), defaultSpecId = 0,
      operation = "append", sortCols = sortBy,
      props = if (bloomFor.nonEmpty)
        Map(BloomColsProp -> bloomFor.mkString(",")) else Map.empty)
  }

  /** REPLACE the table's contents and contract WITHOUT losing history —
    * the Iceberg `CREATE OR REPLACE TABLE` semantics (vs
    * [[createTable]], which deletes the directory): one commit empties
    * the manifest list and swaps in the new schema / partition spec /
    * sort order / bloom contract (operation `replace`), then the data
    * (if any) appends as the following snapshot. Every prior snapshot
    * still time-travels. Schema identity: a new column whose (name,
    * type) matches an existing one KEEPS its field id (old files read
    * through it after time travel); anything else allocates fresh ids
    * above last-column-id — the Iceberg REPLACE rule. Old partition
    * specs are retained while their source columns survive the
    * replace, so historical manifests keep resolving. */
  def replaceTable(spark: SparkSession, tableDir: String,
                   schema: StructType, df: Option[DataFrame],
                   partitionBy: Seq[String] = Nil,
                   sortBy: Seq[String] = Nil,
                   sortFiles: Int = 0,
                   bloomFor: Seq[String] = Nil): Unit = {
    val root = new Path(tableDir)
    val hint = new Path(new Path(root, "metadata"), "version-hint.text")
    if (!fs(spark, root).exists(hint)) {
      createEmptyTable(spark, schema, tableDir, partitionBy, sortBy, bloomFor)
    } else {
      val meta = readMeta(spark, tableDir)
      val reqSpec = partitionBy.map(IcebergTransforms.parse)
      (reqSpec.map(_.sourceCol) ++ sortBy ++ bloomFor).foreach(c =>
        require(schema.fieldNames.contains(c),
          s"column $c (partition/sort/bloom contract) not in the schema " +
            s"(${schema.fieldNames.mkString(", ")})"))
      // id-stable schema swap: same (name, type) reuses the old field's
      // json subtree verbatim (id AND nested ids); new/changed columns
      // allocate above the old last-column-id
      val oldByName = meta.schemaNode.get("fields").elements().asScala
        .map(f2 => f2.get("name").asText() -> f2).toMap
      var id = meta.lastColumnId
      val nextId = () => { id += 1; id }
      val fieldJs = schema.fields.map { f =>
        oldByName.get(f.name) match {
          case Some(old) if sparkType(old.get("type")) == f.dataType =>
            s"""{"id": ${old.get("id").asInt()}, "name": ${q(f.name)}, """ +
              s""""required": ${!f.nullable}, "type": ${old.get("type")}}"""
          case _ =>
            val fid = nextId()
            s"""{"id": $fid, "name": ${q(f.name)}, "required": ${!f.nullable}, """ +
              s""""type": ${icebergTypeJson(f.dataType, nextId)}}"""
        }
      }
      val schemaJs =
        s"""{"type": "struct", "schema-id": 0, "fields": [${
          fieldJs.mkString(", ")}]}"""
      val retained = meta.specs.filter(_._2.forall(pf =>
        schema.fieldNames.contains(pf.sourceCol)))
      val (specs, defaultSpecId) = retained.find(_._2 == reqSpec) match {
        case Some((sid, _)) => (retained, sid)
        case None =>
          val nid = meta.specs.map(_._1).max + 1
          (retained :+ (nid -> reqSpec), nid)
      }
      commit(spark, root, Some(meta), meta.nextSnapshotId, meta.version + 1,
        manifests = Seq.empty, schemaJs, id, specs, defaultSpecId,
        operation = "replace", sortCols = sortBy,
        props = if (bloomFor.nonEmpty)
          Map(BloomColsProp -> bloomFor.mkString(",")) else Map.empty)
    }
    df.foreach { d =>
      appendSnapshot(spark, d, tableDir, partitionBy, sortBy = sortBy,
        sortFiles = sortFiles, bloomFor = bloomFor)
    }
  }

  /** Append one snapshot: write the batch's data files, a manifest over
    * them, a manifest list covering ALL live manifests, and the next
    * metadata version. First call on an empty dir creates the table.
    *
    * `sortBy` range-clusters the batch before writing
    * (`repartitionByRange` + `sortWithinPartitions`): data files get
    * DISJOINT bound ranges on the sort columns, which is what turns
    * the manifest-bounds file skipping ([[readTableWhere]]) from
    * best-effort into ~1/N — the sorted-table discipline a 100 TB
    * time-series or keyed table lives on. */
  def appendSnapshot(spark: SparkSession, df0: DataFrame, tableDir: String,
                     partitionBy: Seq[String] = Nil,
                     commitKey: Option[String] = None,
                     sortBy: Seq[String] = Nil,
                     sortFiles: Int = 0,
                     toBranch: String = "main",
                     bloomFor: Seq[String] = Nil): Unit = {
    import org.apache.spark.sql.functions.{col => c0}
    val root = new Path(tableDir)
    val metaDir = new Path(root, "metadata")
    val hintPath = new Path(metaDir, "version-hint.text")
    val f = fs(spark, root)

    // a branch append stacks on the BRANCH HEAD's manifest list, not
    // main's (the write-audit-publish staging shape); tags are
    // immutable and refuse writes
    val prior: Option[TableMeta] =
      if (!f.exists(hintPath)) {
        require(toBranch == "main",
          s"cannot create a table on branch $toBranch")
        None
      } else {
        val m = readMeta(spark, tableDir)
        if (toBranch == "main") Some(m)
        else {
          val (head, typ) = m.refs.getOrElse(toBranch,
            sys.error(s"unknown ref $toBranch " +
              s"(have ${m.refs.keys.toSeq.sorted.mkString(", ")})"))
          require(typ == "branch", s"cannot append to tag $toBranch")
          Some(if (head == m.currentSnapshotId) m
          else readMeta(spark, tableDir, Some(head)))
        }
      }
    // the table's persisted sort order is the default: a caller that
    // names no sortBy still clusters the way the table contract says
    // (a second writer inherits the discipline); an explicit sortBy
    // becomes the NEW persisted order
    val effectiveSort =
      if (sortBy.nonEmpty) sortBy
      else prior.map(_.sortOrderCols).getOrElse(Nil)
    // sortFiles > 0 pins the range-partition count (a user-specified
    // repartition is exempt from AQE coalescing — without it, a small
    // batch collapses to one file and the disjoint-bounds property
    // this clustering exists for never materializes)
    val df =
      if (effectiveSort.isEmpty) df0
      else {
        val ranged =
          if (sortFiles > 0)
            df0.repartitionByRange(sortFiles, effectiveSort.map(c0): _*)
          else df0.repartitionByRange(effectiveSort.map(c0): _*)
        ranged.sortWithinPartitions(effectiveSort.map(c0): _*)
      }
    // exactly-once: a commit key already in the snapshot log means this
    // batch landed before a checkpoint replay — the fold is a no-op
    if (commitKey.exists(k => prior.exists(hasCommitKey(_, k)))) return
    // an empty batch (idle micro-batch, delta filter matching nothing)
    // appends nothing — writing it would crash the empty-dir read-back
    if (df.isEmpty) {
      require(prior.isDefined, "cannot create a table from an empty batch")
      return
    }
    // Against a live table the batch must match the DECLARED schema
    // (names + types in order) and the commit re-uses the table's
    // schema json VERBATIM — evolved field ids are never re-derived
    // from the Spark schema, which would renumber them.
    def canon(dt: DataType): String = canonType(dt)
    val reqSpec = partitionBy.map(IcebergTransforms.parse)
    val (schemaJs, lastColumnId) = prior match {
      case Some(m) =>
        require(m.partitionSpec == reqSpec,
          s"table is partitioned by ${m.partitionSpec.map(renderSpec)}, " +
            s"got ${reqSpec.map(renderSpec)}")
        val declared = declaredSchema(m)
        val got = df.schema
        require(declared.fields.map(f2 => (f2.name, canon(f2.dataType)))
            .sameElements(got.fields.map(f2 => (f2.name, canon(f2.dataType)))),
          s"appended schema ${got.simpleString} differs from the table " +
            s"schema ${declared.simpleString}")
        (m.schemaJs, m.lastColumnId)
      case None => schemaJson(df.schema)
    }

    val snapshotId = prior.map(_.nextSnapshotId).getOrElse(1L)
    val version = prior.map(_.version).getOrElse(0) + 1
    val specs = prior.map(_.specs).getOrElse(Seq(0 -> reqSpec))
    val defaultSpecId = prior.map(_.defaultSpecId).getOrElse(0)

    val spec = typedSpec(reqSpec, df.schema)
    val entrySchema = manifestEntrySchema(spec)

    // 1. data files + their manifest entries
    val fieldIds = topFields(new com.fasterxml.jackson.databind.ObjectMapper()
      .readTree(schemaJs)).map(f2 => f2._2 -> f2._1).toMap
    // bloom filters: an explicit bloomFor becomes the NEW persisted
    // contract; callers that name none inherit the table property
    // (the sortBy discipline). The filters ride writeDataFiles' bounds
    // pass — one read-back serves both.
    val effectiveBloom =
      if (bloomFor.nonEmpty) bloomFor
      else prior.map(_.bloomCols).getOrElse(Nil)
    val (entries, bloomPath) = writeDataFiles(spark, df, root, snapshotId,
      spec, entrySchema, fieldIds, distribute = effectiveSort.isEmpty,
      bloomCols = effectiveBloom)

    // 2. manifest for this snapshot's files
    val manifestPath = new Path(metaDir, f"manifest-$snapshotId%05d.avro")
    val manifestLen = writeAvro(spark, manifestPath, entrySchema, entries,
      Map("schema" -> schemaJs, "format-version" -> "1",
        "content" -> "data",
        "partition-spec-id" -> defaultSpecId.toString) ++
        bloomPath.map("bloom-paths" -> _))

    // 3. manifest list = prior live manifests + this one;
    //    4. next metadata version + hint
    val newRows = entries.map(_.get("data_file").asInstanceOf[GenericRecord]
      .get("record_count").asInstanceOf[Long]).sum
    commit(spark, root, prior, snapshotId, version,
      prior.toSeq.flatMap(_.manifests) :+
        MRef(manifestPath.toString, manifestLen, entries.size, snapshotId,
          newRows, content = 0, specId = defaultSpecId),
      schemaJs, lastColumnId, specs, defaultSpecId, operation = "append",
      commitKey = commitKey, sortCols = effectiveSort, toBranch = toBranch,
      props = prior.map(_.props).getOrElse(Map.empty) ++
        (if (effectiveBloom.nonEmpty)
          Map(BloomColsProp -> effectiveBloom.mkString(","))
        else Map.empty))
  }

  /** Canonical type rendering for append-time schema checks: narrow
    * integers (smallint/tinyint) canonicalize to "int" exactly as
    * schemaJson maps them at CREATE, so a frame that could create the
    * table can always append to it. */
  private def canonType(dt: DataType): String = dt match {
    case ShortType | ByteType => "int"
    case MapType(k2, v2, n2) => s"map<${canonType(k2)},${canonType(v2)},$n2>"
    case ArrayType(e2, n2) => s"array<${canonType(e2)},$n2>"
    case st: StructType => st.fields
      .map(f2 => s"${f2.name}:${canonType(f2.dataType)}")
      .mkString("struct<", ",", ">")
    case other => other.catalogString
  }

  private def hasCommitKey(m: TableMeta, key: String): Boolean = {
    val om = new com.fasterxml.jackson.databind.ObjectMapper()
    m.snapshots.exists { case (_, _, summary) =>
      Option(om.readTree(summary).get("graft-commit-key"))
        .exists(_.asText() == key)
    }
  }

  /** `writeStream.foreachBatch(IcebergLite.sink(dir))`: each micro-batch
    * appends ONE snapshot whose commit key is the batch id, so a
    * checkpoint-replayed batch appends nothing — exactly-once on the
    * table across restarts, the `IncrementalNearDedup`/
    * `IncrementalIvfIndex` epoch discipline applied to the lakehouse
    * commit log. */
  def sink(tableDir: String, partitionBy: Seq[String] = Nil,
           sortBy: Seq[String] = Nil,
           toBranch: String = "main"): (DataFrame, Long) => Unit =
    (df, batchId) => appendSnapshot(df.sparkSession, df, tableDir,
      partitionBy, Some(s"batch-$batchId"), sortBy, toBranch = toBranch)

  /** `writeStream.foreachBatch(IcebergLite.upsertSink(dir, Seq("id")))`:
    * the CDC/streaming-UPSERT sink. Each micro-batch equality-deletes
    * its own key set (dropping any prior versions merge-on-read — write
    * ∝ keys, no rewrite) and appends the new rows; sequence semantics
    * guarantee the appended rows survive their own delete. Exactly-once
    * across checkpoint replays at BOTH commits (distinct commit keys for
    * the delete and the append legs, so a crash between them replays
    * only the missing leg). The first batch on an empty dir creates the
    * table; the table's persisted sort order applies to every append.
    * The batch is persisted for the two passes — foreachBatch frames
    * may re-evaluate per action, and the delete and append legs must
    * see the SAME rows. */
  def upsertSink(tableDir: String, keyCols: Seq[String],
                 partitionBy: Seq[String] = Nil,
                 sortBy: Seq[String] = Nil): (DataFrame, Long) => Unit =
    (df0, batchId) => {
      require(keyCols.nonEmpty, "upsert needs at least one key column")
      val spark = df0.sparkSession
      val df = df0.persist()
      try {
        if (!df.isEmpty) {
          val root = new Path(tableDir)
          val exists = fs(spark, root)
            .exists(new Path(root, "metadata/version-hint.text"))
          if (exists)
            equalityDeleteMOR(spark, tableDir,
              df.select(keyCols.map(org.apache.spark.sql.functions.col): _*),
              commitKey = Some(s"upsert-$batchId-del"))
          appendSnapshot(spark, df, tableDir, partitionBy,
            Some(s"upsert-$batchId-add"), sortBy)
        }
      } finally df.unpersist()
    }

  /** Spark-distributed data-file write for one snapshot + the manifest
    * entries describing what landed (status ADDED), including per-file
    * COLUMN BOUNDS (spec fields 125/128) for scan pruning — one extra
    * min/max pair per primitive column in the same per-file aggregate
    * that was already computing record counts. `fieldIds` maps column
    * name → field id in the TABLE schema (evolution-stable). */
  /** Write the batch's parquet files and derive their manifest entries
    * (per-file row counts + column bounds) from ONE read-back pass.
    * When `bloomCols` is nonempty the per-file Bloom filters ride the
    * SAME groupBy as aggregate columns ([[BloomLongAgg]]/
    * [[BloomStringAgg]]) and the sidecar avro is written here — the
    * batch is never read back a second time. Returns (manifest entries,
    * bloom sidecar path if one was written). */
  private def writeDataFiles(spark: SparkSession, df: DataFrame, root: Path,
                             snapshotId: Long,
                             spec: TypedSpec,
                             entrySchema: Schema,
                             fieldIds: Map[String, Int],
                             distribute: Boolean = false,
                             bloomCols: Seq[String] = Nil,
                             dirSuffix: String = "")
      : (Seq[GenericRecord], Option[String]) = {
    import org.apache.spark.sql.functions.{col, count, input_file_name, lit, max, min}
    val f = fs(spark, root)
    val dataDir = new Path(root, s"data/s$snapshotId$dirSuffix")
    // HIDDEN partitioning: non-identity transforms derive their
    // partition value as an extra column (computed inside the scan —
    // bucket is a native codegen expression), which Spark's partitionBy
    // then moves OUT of the files into the directory key; the source
    // column stays in the files, the derived one never enters the
    // table schema
    val partNames = spec.map(_._1.name)
    val withDerived = spec.foldLeft(df) { case (acc, (pf, _)) =>
      if (pf.transform == "identity") acc
      else {
        require(!df.schema.fieldNames.contains(pf.name),
          s"partition field ${pf.name} collides with a data column")
        acc.withColumn(pf.name, IcebergTransforms.column(spark, pf.transform,
          col(pf.sourceCol), df.schema(pf.sourceCol).dataType))
      }
    }
    // HASH distribution mode (the Iceberg default for partitioned
    // writes): cluster the batch by its partition key so each
    // partition is written by ONE task — without it every task writes
    // a file into every partition dir and a 1000-executor append
    // explodes into files × executors small files. Range-clustered
    // (sorted) appends skip it: they are already distributed.
    val distributed =
      if (distribute && partNames.nonEmpty)
        withDerived.repartition(partNames.map(col): _*)
      else withDerived
    val writer = if (partNames.nonEmpty)
      distributed.write.partitionBy(partNames: _*) else distributed.write
    writer.mode("overwrite").parquet(dataDir.toString)
    deriveDataEntries(spark, root, spark.read.parquet(dataDir.toString),
      snapshotId, spec, entrySchema, fieldIds, df.schema, bloomCols,
      dirSuffix)
  }

  /** The READ-BACK half of [[writeDataFiles]], reusable over any
    * directory of parquet files in the partitionBy layout (the NATIVE
    * V2 writer stages files the same way): per-file rows, bounds,
    * partition values, and Bloom sidecars — manifest entries
    * indistinguishable from the DataFrame route's. */
  private def deriveDataEntries(spark: SparkSession, root: Path,
                                back: DataFrame, snapshotId: Long,
                                spec: TypedSpec, entrySchema: Schema,
                                fieldIds: Map[String, Int],
                                boundsSchema: StructType,
                                bloomCols: Seq[String],
                                bloomSuffix: String = "")
      : (Seq[GenericRecord], Option[String]) = {
    import org.apache.spark.sql.functions.{col, count, input_file_name, lit, max, min}
    val f = fs(spark, root)
    val partNames = spec.map(_._1.name)
    // boundable columns: primitive types with a total order the spec's
    // single-value serialization covers
    val bounded = boundsSchema.fields.toSeq
      .filter(fd => fieldIds.contains(fd.name))
      .filter(fd => fd.dataType match {
        case IntegerType | LongType | FloatType | DoubleType |
             StringType | DateType | TimestampType => true
        case _ => false
      })

    // per-file rows + bounds via a tiny metadata read of what was
    // written. Strings aggregate as 17-CODE-POINT prefixes (truncation
    // is monotone in UTF-8 binary order, so min/max over prefixes
    // still bound the column) — the Iceberg truncate(16) discipline:
    // manifests stay KB-sized even over document columns, and the
    // 17th point tells the driver whether the top value was truncated.
    def boundCol(fd: StructField) = fd.dataType match {
      case StringType =>
        org.apache.spark.sql.functions.substring(col(fd.name), 1, 17)
      case _ => col(fd.name)
    }
    // bloom columns ride the same per-file aggregation (one read-back
    // serves bounds AND filters); int casts to long so build-side
    // putLong matches the probe's mightContainLong
    val bloomTyped = bloomCols.map { c =>
      require(boundsSchema.fieldNames.contains(c),
        s"bloom column $c not in schema")
      val dt = boundsSchema(c).dataType
      require(dt == IntegerType || dt == LongType || dt == StringType,
        s"bloom column $c has type ${dt.simpleString} (int/long/string only)")
      (c, dt, fieldIds(c))
    }
    val bloomAggs = bloomTyped.map { case (c, dt, _) =>
      (if (dt == StringType) bloomStringUdaf(col(c))
       else bloomLongUdaf(col(c).cast(LongType))).as(s"__bf_$c")
    }
    val aggs = count(lit(1)).as("__n") +:
      (bounded.flatMap(fd => Seq(min(boundCol(fd)).as(s"__lo_${fd.name}"),
        max(boundCol(fd)).as(s"__hi_${fd.name}"))) ++ bloomAggs)
    val touched = (partNames ++ bounded.map(_.name) ++ bloomCols).distinct
    val perFile = back
      .select(input_file_name().as("f") +: touched.map(col): _*)
      .groupBy("f", partNames: _*)
      .agg(aggs.head, aggs.tail: _*)
      .collect()

    val bloomPath =
      if (bloomTyped.isEmpty || perFile.isEmpty) None
      else {
        val bloomAt = 2 + partNames.size + bounded.size * 2
        val records = perFile.toSeq.sortBy(_.getString(0)).flatMap { row =>
          bloomTyped.zipWithIndex.map { case ((_, _, fid), i) =>
            val r = new GenericData.Record(BloomSidecarSchema)
            r.put("file_path", row.getString(0))
            r.put("field_id", fid)
            r.put("bits", java.nio.ByteBuffer.wrap(
              row.getAs[Array[Byte]](bloomAt + i)))
            r
          }
        }
        val p = new Path(new Path(root, "metadata"),
          f"bloom-$snapshotId%05d$bloomSuffix.avro")
        writeAvro(spark, p, BloomSidecarSchema, records,
          Map("bloom-cols" -> bloomCols.mkString(",")))
        Some(p.toString)
      }

    val fileSchema = entrySchema.getField("data_file").schema()
    val partSchema = fileSchema.getField("partition").schema()
    val boundsItemSchemaLo = fileSchema.getField("lower_bounds").schema()
      .getTypes.get(1).getElementType
    val boundsItemSchemaHi = fileSchema.getField("upper_bounds").schema()
      .getTypes.get(1).getElementType
    val entries = perFile.toSeq.map { row =>
      val filePath = row.getString(0)
      val e = new GenericData.Record(entrySchema)
      e.put("status", 1) // ADDED
      e.put("snapshot_id", snapshotId)
      val d = new GenericData.Record(fileSchema)
      d.put("file_path", filePath)
      d.put("file_format", "PARQUET")
      val part = new GenericData.Record(partSchema)
      spec.zipWithIndex.foreach { case ((pf, dt), i) =>
        // partition-dir read-back re-infers types (1001 comes back as
        // Integer) — coerce to the DECLARED spec type for the avro union
        val raw = row.get(i + 1)
        part.put(pf.name, (dt, raw) match {
          case (_, null) => null
          case (IntegerType, n: java.lang.Number) =>
            java.lang.Integer.valueOf(n.intValue())
          case (LongType, n: java.lang.Number) =>
            java.lang.Long.valueOf(n.longValue())
          case (StringType, v) => v.toString
          case (_, v) => v
        })
      }
      d.put("partition", part)
      val nIdx = 1 + partNames.size
      d.put("record_count", row.getLong(nIdx))
      d.put("file_size_in_bytes",
        f.getFileStatus(new Path(new java.net.URI(filePath))).getLen)
      def kvs(loNotHi: Boolean, itemSchema: Schema) = {
        val out = new java.util.ArrayList[GenericRecord]()
        bounded.zipWithIndex.foreach { case (fd, bi) =>
          val v0 = row.get(nIdx + 1 + bi * 2 + (if (loNotHi) 0 else 1))
          val v: Option[Any] = (fd.dataType, v0) match {
            case (_, null) => None
            case (StringType, s: String) =>
              // lower: the 16-point prefix (≤ every value). upper: the
              // exact value when nothing was truncated, else the
              // incremented prefix (> every prefix-sharing value);
              // no safe increment → no upper bound (conservative).
              if (loNotHi) Some(cpTake(s, 16))
              else if (s.codePointCount(0, s.length) <= 16) Some(s)
              else incrementPrefix(cpTake(s, 16)).map(identity[Any])
            case (_, other) => Some(other)
          }
          v.flatMap(boundBytes(fd.dataType, _)).foreach { bytes =>
            val r = new GenericData.Record(itemSchema)
            r.put("key", fieldIds(fd.name))
            r.put("value", java.nio.ByteBuffer.wrap(bytes))
            out.add(r)
          }
        }
        out
      }
      d.put("lower_bounds", kvs(loNotHi = true, boundsItemSchemaLo))
      d.put("upper_bounds", kvs(loNotHi = false, boundsItemSchemaHi))
      e.put("data_file", d)
      e
    }
    (entries, bloomPath)
  }

  /** Write the manifest list + next metadata version + version hint. */
  private def commit(spark: SparkSession, root: Path, prior: Option[TableMeta],
                     snapshotId: Long, version: Int,
                     manifests: Seq[MRef],
                     schemaJs: String, lastColumnId: Int,
                     specs: Seq[(Int, Seq[IcebergTransforms.PartField])],
                     defaultSpecId: Int,
                     operation: String,
                     commitKey: Option[String] = None,
                     sortCols: Seq[String] = Nil,
                     toBranch: String = "main",
                     props: Map[String, String] = Map.empty): Unit = {
    val metaDir = new Path(root, "metadata")
    val listPath = new Path(metaDir, f"snap-$snapshotId%05d.avro")
    writeManifestList(spark, listPath, manifests)
    val parent = prior.map(_.currentSnapshotId).getOrElse(0L)
    val newSummary =
      summaryJson(operation, commitKey, parent, manifests, snapshotId)
    // the written branch advances to the new snapshot; main's head is
    // the current pointer (unchanged by a staging-branch commit)
    val priorRefs = prior.map(_.refs).getOrElse(Map.empty)
    val newRefs = priorRefs + (toBranch -> (snapshotId, "branch"))
    val mainHead =
      if (toBranch == "main") snapshotId
      else priorRefs.get("main").map(_._1)
        .getOrElse(sys.error("branch commit on a table with no main head"))
    val nowMs = System.currentTimeMillis()
    // main-head changes enter the snapshot-log (branch commits leave
    // main's pointer alone, so they don't — the Iceberg history rule)
    val newLog = prior.toSeq.flatMap(_.snapshotLog) ++
      (if (toBranch == "main") Seq((nowMs, snapshotId)) else Nil)
    writeMetadata(spark, root, version, schemaJs, lastColumnId,
      specs, defaultSpecId, mainHead,
      prior.toSeq.flatMap(_.snapshots) :+
        ((snapshotId, listPath.toString, newSummary)), sortCols,
      newRefs, props,
      prior.map(_.snapshotTs).getOrElse(Map.empty) + (snapshotId -> nowMs),
      newLog)
  }

  /** Write one MANIFEST LIST (snap-N.avro) over the given manifests —
    * shared by [[commit]] and the REST client's staged append. */
  private def writeManifestList(spark: SparkSession, listPath: Path,
                                manifests: Seq[MRef]): Unit = {
    val listRecords = manifests.map { m =>
      val r = new GenericData.Record(ManifestFileSchema)
      r.put("manifest_path", m.path)
      r.put("manifest_length", m.len)
      r.put("partition_spec_id", m.specId)
      r.put("content", m.content)
      r.put("added_snapshot_id", m.addedBy)
      r.put("added_data_files_count", m.nFiles)
      r.put("added_rows_count", m.nRows)
      r.put("existing_data_files_count", m.existingFiles)
      r.put("existing_rows_count", m.existingRows)
      r
    }
    writeAvro(spark, listPath, ManifestFileSchema, listRecords,
      Map("format-version" -> "1"))
  }

  /** One snapshot's summary JSON — operational metrics (the fields
    * every engine's UI reads): added-* from THIS snapshot's manifests,
    * total-* over the live set; `graft-parent` carries ancestry for
    * fastForward, `graft-commit-key` the exactly-once replay key. */
  private def summaryJson(operation: String, commitKey: Option[String],
                          parent: Long, manifests: Seq[MRef],
                          snapshotId: Long): String = {
    val newData = manifests.filter(m => m.content == 0 &&
      m.addedBy == snapshotId)
    val liveData = manifests.filter(_.content == 0)
    "{\"operation\": " + q(operation) +
      commitKey.map(k => ", \"graft-commit-key\": " + q(k)).getOrElse("") +
      s", \"graft-parent\": $parent" +
      s", \"added-data-files\": ${q(newData.map(_.nFiles.toLong).sum.toString)}" +
      s", \"added-records\": ${q(newData.map(_.nRows).sum.toString)}" +
      s", \"total-data-files\": ${q(liveData.map(_.totalFiles).sum.toString)}" +
      s", \"total-records\": ${q(liveData.map(_.totalRows).sum.toString)}" +
      s", \"total-delete-files\": ${q(manifests.filter(_.content != 0)
        .map(_.totalFiles).sum.toString)}" +
      "}"
  }

  // ---- REST-catalog support (r18) ------------------------------------------

  /** The Iceberg schema JSON of a Spark schema (what a REST
    * create-table request body carries). */
  def icebergSchemaJson(schema: StructType): String = schemaJson(schema)._1

  /** Spark schema back from an Iceberg schema JSON (the REST server's
    * side of create-table). */
  def schemaFromIcebergJson(js: String): StructType = {
    val node = new com.fasterxml.jackson.databind.ObjectMapper().readTree(js)
    StructType(node.get("fields").elements().asScala.map(f =>
      StructField(f.get("name").asText(), sparkType(f.get("type")),
        !f.get("required").asBoolean())).toSeq)
  }

  /** CLIENT side of a REST-catalog append, per the Iceberg REST
    * protocol's division of labor: the client writes EVERYTHING on
    * shared storage — data files, the content=0 manifest, and the new
    * MANIFEST LIST — and only then asks the catalog service to commit
    * (`add-snapshot` + ref update); NO metadata version moves here.
    * Returns (snapshotId, manifestListPath, summaryJson); `None` for an
    * empty batch. */
  def stageRestAppend(spark: SparkSession, tableDir: String,
                      df: DataFrame): Option[(Long, String, String)] = {
    val root = new Path(tableDir)
    val meta = readMeta(spark, tableDir)
    val snapshotId = meta.nextSnapshotId
    // Attempt-unique staging paths (Iceberg's snap-<id>-<attempt>-<uuid>
    // discipline): two REST clients staging concurrently both compute
    // the same next snapshot id, and with deterministic names the later
    // stager would clobber the earlier one's data dir + manifest list
    // BEFORE the catalog's 409 arbitration ever runs. The loser's
    // orphaned files are reclaimed by removeOrphanFiles, as with any
    // uncommitted staging.
    val attempt = "-" + java.util.UUID.randomUUID.toString.take(8)
    stageDataManifest(spark, root, meta, snapshotId, df, attempt).map {
      case (mref, _) =>
        val manifests = meta.manifests :+ mref
        val listPath = new Path(new Path(root, "metadata"),
          f"snap-$snapshotId%05d$attempt.avro")
        writeManifestList(spark, listPath, manifests)
        (snapshotId, listPath.toString,
          summaryJson("append", None, meta.currentSnapshotId, manifests,
            snapshotId))
    }
  }

  /** SERVER side of a REST `add-snapshot` + `set-current-snapshot`
    * commit: adopt a client-staged snapshot (its manifest list already
    * on storage) as the new main head — one metadata version, the same
    * atomicity as every other commit on this chain. */
  def adoptSnapshot(spark: SparkSession, tableDir: String,
                    snapshotId: Long, manifestListPath: String,
                    summary: String): Unit = {
    val root = new Path(tableDir)
    val meta = readMeta(spark, tableDir)
    require(snapshotId == meta.nextSnapshotId,
      s"stale commit: snapshot $snapshotId against a chain whose next " +
        s"id is ${meta.nextSnapshotId} (concurrent writer?)")
    val nowMs = System.currentTimeMillis()
    writeMetadata(spark, root, meta.version + 1, meta.schemaJs,
      meta.lastColumnId, meta.specs, meta.defaultSpecId, snapshotId,
      meta.snapshots :+ ((snapshotId, manifestListPath, summary)),
      meta.sortOrderCols, meta.refs + ("main" -> (snapshotId, "branch")),
      meta.props, meta.snapshotTs + (snapshotId -> nowMs),
      meta.snapshotLog :+ ((nowMs, snapshotId)))
  }

  /** The current metadata-file location (what a REST loadTable response
    * reports). */
  def metadataLocation(spark: SparkSession, tableDir: String): String = {
    val hint = new Path(tableDir, "metadata/version-hint.text")
    val v = new String(readBytes(spark, hint),
      java.nio.charset.StandardCharsets.UTF_8).trim.toInt
    new Path(tableDir, s"metadata/v$v.metadata.json").toString
  }

  /** Write vN.metadata.json + the version hint for the given snapshot
    * log — the single definition both commits and snapshot expiry use
    * (summaries are passed through verbatim). */
  private def writeMetadata(spark: SparkSession, root: Path, version: Int,
                            schemaJs: String, lastColumnId: Int,
                            specs: Seq[(Int, Seq[IcebergTransforms.PartField])],
                            defaultSpecId: Int,
                            currentSnapshotId: Long,
                            snapshots: Seq[(Long, String, String)],
                            sortCols: Seq[String] = Nil,
                            refs: Map[String, (Long, String)] = Map.empty,
                            props: Map[String, String] = Map.empty,
                            snapshotTs: Map[Long, Long] = Map.empty,
                            snapshotLog: Seq[(Long, Long)] = Nil): Unit = {
    val metaDir = new Path(root, "metadata")
    def specFieldsJson(spec: Seq[IcebergTransforms.PartField]): String =
      spec.zipWithIndex.map { case (pf, i) =>
        s"""{"name": ${q(pf.name)}, "transform": ${q(pf.transform)},
            "source-id": ${sourceFieldId(schemaJs, pf.sourceCol)},
            "field-id": ${1000 + i}}"""
      }.mkString(", ")
    // the v1 legacy single-spec field renders the DEFAULT spec; the
    // full history lives in partition-specs (what evolved readers use)
    val specJsonV1 = specFieldsJson(
      specs.find(_._1 == defaultSpecId).map(_._2).getOrElse(
        sys.error(s"default spec $defaultSpecId missing")))
    val specsJson = specs.map { case (id, sp) =>
      s"""{"spec-id": $id, "fields": [${specFieldsJson(sp)}]}"""
    }.mkString(", ")
    // persisted sort order: the table-level clustering CONTRACT — any
    // writer (a second engine, a later sink) inherits it instead of
    // depending on a caller argument; order-id 0 = unsorted (the spec's
    // reserved id)
    val sortOrderJson =
      if (sortCols.isEmpty)
        """"sort-orders": [{"order-id": 0, "fields": []}],
           "default-sort-order-id": 0,"""
      else {
        val fields = sortCols.map(c =>
          s"""{"transform": "identity",
               "source-id": ${sourceFieldId(schemaJs, c)},
               "direction": "asc", "null-order": "nulls-first"}""")
          .mkString(", ")
        s""""sort-orders": [{"order-id": 1, "fields": [$fields]}],
            "default-sort-order-id": 1,"""
      }
    // commit timestamps are written ONCE and preserved verbatim by
    // later rewrites (regenerating them would corrupt the AS OF
    // TIMESTAMP surface and the history table)
    val nowMs = System.currentTimeMillis()
    val snapshotsJson = snapshots.map { case (id, lp, summary) =>
      s"""{"snapshot-id": $id,
           "timestamp-ms": ${snapshotTs.getOrElse(id, nowMs)},
           "summary": $summary,
           "manifest-list": ${q(lp)}}"""
    }.mkString(", ")
    val snapshotLogJson = snapshotLog.map { case (ts, id) =>
      s"""{"timestamp-ms": $ts, "snapshot-id": $id}"""
    }.mkString(", ")
    // metadata-log: the chain of superseded metadata files (the spec's
    // previous-versions audit trail, capped like
    // write.metadata.previous-versions-max). Self-contained: the prior
    // version's own log is read back and extended with the prior file —
    // one KB-scale read per commit, zero caller threading.
    val metadataLogJson = {
      val prevPath = new Path(metaDir, s"v${version - 1}.metadata.json")
      if (version <= 1 || !fs(spark, prevPath).exists(prevPath)) ""
      else {
        val prev = new com.fasterxml.jackson.databind.ObjectMapper()
          .readTree(readBytes(spark, prevPath))
        val prevLog = Option(prev.get("metadata-log")).toSeq
          .flatMap(_.elements().asScala)
          .map(e => (e.get("timestamp-ms").asLong(),
            e.get("metadata-file").asText()))
        val prevTs = Option(prev.get("last-updated-ms"))
          .map(_.asLong()).getOrElse(System.currentTimeMillis())
        (prevLog :+ ((prevTs, prevPath.toString))).takeRight(100)
          .map { case (ts, f) =>
            s"""{"timestamp-ms": $ts, "metadata-file": ${q(f)}}"""
          }.mkString(", ")
      }
    }
    val metaJson = s"""{
      "format-version": 1,
      "table-uuid": "00000000-0000-0000-0000-${"%012d".format(version)}",
      "location": ${q(root.toString)},
      "last-updated-ms": ${System.currentTimeMillis()},
      "last-column-id": $lastColumnId,
      "schema": $schemaJs,
      "partition-spec": [$specJsonV1],
      "partition-specs": [$specsJson],
      "default-spec-id": $defaultSpecId,
      "last-partition-id": ${999 + specs.map(_._2.size).max},
      $sortOrderJson
      "refs": {${
        (refs + ("main" -> (currentSnapshotId, "branch"))).toSeq.sortBy(_._1)
          .map { case (n, (id, t)) =>
            s"${q(n)}: {\"snapshot-id\": $id, \"type\": ${q(t)}}"
          }.mkString(", ")}},
      "properties": {${props.toSeq.sortBy(_._1)
        .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString(", ")}},
      "current-snapshot-id": $currentSnapshotId,
      "snapshots": [$snapshotsJson],
      "snapshot-log": [$snapshotLogJson],
      "metadata-log": [$metadataLogJson]
    }"""
    writeBytes(spark, new Path(metaDir, s"v$version.metadata.json"),
      metaJson.getBytes("UTF-8"))
    writeBytes(spark, new Path(metaDir, "version-hint.text"),
      version.toString.getBytes("UTF-8"))
  }

  /** Top-level field id of `name` in the generated schema json (the
    * partition spec's source-id). */
  private def sourceFieldId(schemaJs: String, name: String): Int = {
    val node = new com.fasterxml.jackson.databind.ObjectMapper()
      .readTree(schemaJs)
    node.get("fields").elements().asScala
      .find(_.get("name").asText() == name)
      .map(_.get("id").asInt())
      .getOrElse(sys.error(s"partition column $name not in schema"))
  }

  // ---- read --------------------------------------------------------------

  /** One manifest of the current list: `content` 0 = data files,
    * 1 = position-delete files (the v2 merge-on-read leg). `specId` is
    * the partition spec the manifest's files were written under — after
    * spec evolution a list legitimately mixes manifests of different
    * generations, and every reader resolves each through ITS spec. */
  private case class MRef(path: String, len: Long, nFiles: Int,
                          addedBy: Long, nRows: Long, content: Int,
                          specId: Int = 0,
                          /** EXISTING (carried) entries — nonzero only
                            * on rewrite manifests; nFiles/nRows count
                            * ADDED entries per the spec field names. */
                          existingFiles: Int = 0,
                          existingRows: Long = 0L) {
    def totalFiles: Long = nFiles.toLong + existingFiles
    def totalRows: Long = nRows + existingRows
  }

  private case class TableMeta(
      version: Int,
      schemaNode: com.fasterxml.jackson.databind.JsonNode,
      /** every partition spec the table has ever had, by spec id
        * (ordered; `default-spec-id` names the one new writes use) */
      specs: Seq[(Int, Seq[IcebergTransforms.PartField])],
      defaultSpecId: Int,
      currentSnapshotId: Long,
      /** (snapshot id, manifest-list path, summary json verbatim) */
      snapshots: Seq[(Long, String, String)],
      /** manifests of the CURRENT list (data AND delete) */
      manifests: Seq[MRef],
      /** highest allocated field id — evolution allocates ABOVE it */
      lastColumnId: Int,
      /** the persisted default sort order's identity columns (empty =
        * unsorted) — the clustering contract every writer inherits */
      sortOrderCols: Seq[String],
      /** named refs: name → (snapshot id, "branch"|"tag"). `main` is
        * always present and mirrors current-snapshot-id. */
      refs: Map[String, (Long, String)],
      /** table properties (graft-bloom-cols etc.) — carried verbatim
        * across commits. */
      props: Map[String, String] = Map.empty,
      /** snapshot id → commit wall-clock (ms) — written once at commit
        * and PRESERVED verbatim by every later metadata rewrite. */
      snapshotTs: Map[Long, Long] = Map.empty,
      /** the `snapshot-log`: (timestamp-ms, snapshot-id) entries, one
        * per change of main's head — the AS OF TIMESTAMP surface. */
      snapshotLog: Seq[(Long, Long)] = Nil) {
    /** Bloom-filtered columns (a persisted contract, like sort order). */
    def bloomCols: Seq[String] =
      props.get(BloomColsProp).toSeq
        .flatMap(_.split(',')).filter(_.nonEmpty)
    /** The DEFAULT spec — what new writes partition by. */
    def partitionSpec: Seq[IcebergTransforms.PartField] =
      specOf(defaultSpecId)
    def specOf(id: Int): Seq[IcebergTransforms.PartField] =
      specs.find(_._1 == id).map(_._2).getOrElse(
        sys.error(s"partition spec $id not in table metadata " +
          s"(have ${specs.map(_._1).mkString(", ")})"))
    /** Next snapshot id — GLOBAL across branches (ids stay unique and
      * monotone even when branch heads run ahead of main). */
    def nextSnapshotId: Long = snapshots.map(_._1).max + 1
    /** The table schema json verbatim — committed unchanged by appends
      * and rewrites so evolved field ids are never re-derived. */
    def schemaJs: String = schemaNode.toString
  }

  private def readMeta(spark: SparkSession, tableDir: String,
                       snapshotId: Option[Long] = None): TableMeta = {
    val root = new Path(tableDir)
    val metaDir = new Path(root, "metadata")
    val version = new String(
      readBytes(spark, new Path(metaDir, "version-hint.text")), "UTF-8")
      .trim.toInt
    val node = new com.fasterxml.jackson.databind.ObjectMapper()
      .readTree(readBytes(spark, new Path(metaDir, s"v$version.metadata.json")))
    require(node.get("format-version").asInt() == 1,
      "only Iceberg format v1 supported")
    val schemaNode = node.get("schema")
    // source columns resolve by FIELD ID (evolution-stable); the
    // partition field name is the directory key and stays verbatim
    val idToName = schemaNode.get("fields").elements().asScala
      .map(f2 => f2.get("id").asInt() -> f2.get("name").asText()).toMap
    def parseFields(fields: com.fasterxml.jackson.databind.JsonNode)
        : Seq[IcebergTransforms.PartField] =
      fields.elements().asScala.map { fl =>
        IcebergTransforms.PartField(fl.get("name").asText(),
          fl.get("transform").asText(),
          idToName(fl.get("source-id").asInt()))
      }.toSeq
    val specs: Seq[(Int, Seq[IcebergTransforms.PartField])] =
      Option(node.get("partition-specs"))
        .map(_.elements().asScala.map(sp =>
          sp.get("spec-id").asInt() -> parseFields(sp.get("fields"))).toSeq)
        .getOrElse(Seq(0 -> parseFields(node.get("partition-spec"))))
    val defaultSpecId = Option(node.get("default-spec-id"))
      .map(_.asInt()).getOrElse(0)
    require(specs.exists(_._1 == defaultSpecId),
      s"default-spec-id $defaultSpecId not among partition-specs")
    val snapshots = node.get("snapshots").elements().asScala
      .map(s2 => (s2.get("snapshot-id").asLong(),
        s2.get("manifest-list").asText(),
        Option(s2.get("summary")).map(_.toString)
          .getOrElse("{\"operation\": \"append\"}"))).toSeq
    val snapshotTs: Map[Long, Long] =
      node.get("snapshots").elements().asScala.flatMap { s2 =>
        Option(s2.get("timestamp-ms")).map(ts =>
          s2.get("snapshot-id").asLong() -> ts.asLong())
      }.toMap
    val snapshotLog: Seq[(Long, Long)] =
      Option(node.get("snapshot-log")).toSeq
        .flatMap(_.elements().asScala)
        .map(e => (e.get("timestamp-ms").asLong(),
          e.get("snapshot-id").asLong()))
    val wantId = snapshotId.getOrElse(node.get("current-snapshot-id").asLong())
    val listPath = snapshots.find(_._1 == wantId).map(_._2).getOrElse(
      sys.error(s"snapshot $wantId not found (have ${snapshots.map(_._1)})"))
    val manifests = readAvro(spark, new Path(listPath)).map { r =>
      MRef(r.get("manifest_path").toString,
        r.get("manifest_length").asInstanceOf[Long],
        Option(r.get("added_data_files_count"))
          .map(_.asInstanceOf[Int]).getOrElse(0),
        Option(r.get("added_snapshot_id"))
          .map(_.asInstanceOf[Long]).getOrElse(0L),
        Option(r.get("added_rows_count"))
          .map(_.asInstanceOf[Long]).getOrElse(0L),
        Option(r.get("content")).map(_.asInstanceOf[Int]).getOrElse(0),
        Option(r.get("partition_spec_id"))
          .map(_.asInstanceOf[Int]).getOrElse(0),
        Option(r.get("existing_data_files_count"))
          .map(_.asInstanceOf[Int]).getOrElse(0),
        Option(r.get("existing_rows_count"))
          .map(_.asInstanceOf[Long]).getOrElse(0L))
    }
    val lastColumnId = Option(node.get("last-column-id")).map(_.asInt())
      .getOrElse(sys.error("metadata missing last-column-id"))
    // persisted sort order (identity transforms only in this subset);
    // resolve source-ids back to current column NAMES so the order
    // survives renames
    val sortOrderCols: Seq[String] = {
      val orderId = Option(node.get("default-sort-order-id"))
        .map(_.asInt()).getOrElse(0)
      if (orderId == 0) Nil
      else {
        Option(node.get("sort-orders")).toSeq
          .flatMap(_.elements().asScala)
          .filter(_.get("order-id").asInt() == orderId)
          .flatMap(_.get("fields").elements().asScala.map { sf =>
            require(sf.get("transform").asText() == "identity",
              s"unsupported sort transform ${sf.get("transform").asText()}")
            idToName(sf.get("source-id").asInt())
          }).toSeq
      }
    }
    val mainId = node.get("current-snapshot-id").asLong()
    val refs: Map[String, (Long, String)] =
      Option(node.get("refs")).map { r =>
        r.fieldNames().asScala.map { n =>
          n -> (r.get(n).get("snapshot-id").asLong(),
            r.get(n).get("type").asText())
        }.toMap
      }.getOrElse(Map.empty) + ("main" -> (mainId, "branch"))
    val props: Map[String, String] =
      Option(node.get("properties")).map { p =>
        p.fieldNames().asScala.map(n => n -> p.get(n).asText()).toMap
      }.getOrElse(Map.empty)
    TableMeta(version, schemaNode, specs, defaultSpecId, wantId, snapshots,
      manifests, lastColumnId, sortOrderCols, refs, props,
      snapshotTs, snapshotLog)
  }

  /** Read the table at its current (or a given) snapshot. The data-file
    * set comes from the manifests, never a directory listing; partition
    * columns recover per snapshot-group via `basePath`. */
  def readTable(spark: SparkSession, tableDir: String,
                snapshotId: Option[Long] = None): DataFrame = {
    val meta = readMeta(spark, tableDir, snapshotId)
    val files = liveFileEntries(spark, meta)
    // a snapshot with no live data files (fresh CREATE TABLE, a
    // metadata-only truncate) reads as an EMPTY frame of the declared
    // schema — refusing here would make every read-after-create and
    // read-after-overwrite path special-case emptiness
    if (files.isEmpty)
      spark.createDataFrame(
        new java.util.ArrayList[org.apache.spark.sql.Row](),
        declaredSchema(meta))
    else applyDeletes(spark, meta, readRaw(spark, meta, files))
      .drop("__file", "__pos")
  }

  /** Merge-on-read: anti-join the frame's (__file, __pos) provenance
    * against the live position-delete files, then apply EQUALITY
    * deletes with sequence semantics — an equality-delete file drops
    * matching rows only from data files written BEFORE it (entry
    * snapshot < delete snapshot), so a later re-append of the same key
    * survives: the upsert contract. A no-op (no join in the plan at
    * all) when the snapshot carries no deletes of either kind. */
  private def applyDeletes(spark: SparkSession, meta: TableMeta,
                           df: DataFrame): DataFrame = {
    import org.apache.spark.sql.functions.{broadcast, col, lit}
    val deletes = liveDeleteFiles(spark, meta)
    val pos =
      if (deletes.isEmpty) df
      else df.join(spark.read.parquet(deletes: _*),
        col("__file") === col("file_path") && col("__pos") === col("pos"),
        "left_anti")
    val eqs = liveEqualityDeletes(spark, meta)
    if (eqs.isEmpty) pos
    else {
      // per-row provenance: the snapshot that wrote the row's file —
      // KB-scale manifest arithmetic, broadcast as a two-column dim
      val snapDf = spark.createDataFrame(
        dataFileSnapshots(spark, meta).toSeq).toDF("__fp", "__fsnap")
      var out = pos.join(broadcast(snapDf),
        col("__file") === col("__fp"), "left").drop("__fp")
      eqs.sortBy(_._1).foreach { case (delSnap, keyCols, paths) =>
        // plain (AQE-broadcastable) left join marks hits; the filter
        // keeps a hit only when its file predates the delete. NULL key
        // values never match (left-join null semantics) — documented.
        val keys = spark.read.parquet(paths: _*).distinct()
          .withColumn("__eqhit", lit(1))
        out = out.join(keys, keyCols, "left")
          .filter(col("__eqhit").isNull || col("__fsnap") >= lit(delSnap))
          .drop("__eqhit")
      }
      out.drop("__fsnap")
    }
  }

  /** Live EQUALITY-delete manifests: (delete snapshot, key columns,
    * delete-file paths), oldest first. */
  private def liveEqualityDeletes(spark: SparkSession, meta: TableMeta)
      : Seq[(Long, Seq[String], Seq[String])] =
    meta.manifests.filter(_.content == 2).map { m =>
      val p = new Path(m.path)
      val cols = manifestMetaString(spark, p, "equality-cols")
        .getOrElse(sys.error(s"equality manifest ${m.path} has no " +
          "equality-cols metadata")).split(",").toSeq
      val paths = readManifest(spark, p)._1
        .filter(_.get("status").asInstanceOf[Int] != 2)
        .map(_.get("data_file").asInstanceOf[GenericRecord]
          .get("file_path").toString)
      (m.addedBy, cols, paths)
    }

  /** data-file path → the snapshot that ADDED it (entry snapshot_id —
    * stable across rewrites that carry entries as EXISTING). */
  private def dataFileSnapshots(spark: SparkSession, meta: TableMeta)
      : Map[String, Long] =
    meta.manifests.filter(_.content == 0).flatMap { m =>
      readManifest(spark, new Path(m.path))._1
        .filter(_.get("status").asInstanceOf[Int] != 2)
        .map(e => e.get("data_file").asInstanceOf[GenericRecord]
          .get("file_path").toString ->
          e.get("snapshot_id").asInstanceOf[Long])
    }.toMap

  /** Data files an outstanding EQUALITY delete still applies to (entry
    * snapshot predates a live equality-delete manifest). Any rewrite
    * that drops delete manifests (deleteWhere, compactSmallFiles) must
    * rewrite these with the deletes applied, or dropped rows would
    * resurrect. */
  private def eqAffectedFiles(spark: SparkSession,
                              meta: TableMeta): Set[String] = {
    val eqs = liveEqualityDeletes(spark, meta)
    if (eqs.isEmpty) Set.empty
    else {
      val maxEq = eqs.map(_._1).max
      dataFileSnapshots(spark, meta).collect {
        case (p2, s2) if s2 < maxEq => p2
      }.toSet
    }
  }

  private def manifestMetaString(spark: SparkSession, p: Path,
                                 key: String): Option[String] = {
    val in = new java.io.ByteArrayInputStream(readBytes(spark, p))
    val r = new DataFileStream[GenericRecord](in,
      new GenericDatumReader[GenericRecord]())
    try Option(r.getMetaString(key)) finally r.close()
  }


  // ---- copy-on-write maintenance ----------------------------------------

  private def declaredSchema(meta: TableMeta): StructType =
    StructType(meta.schemaNode.get("fields").elements().asScala.map(f =>
      StructField(f.get("name").asText(), sparkType(f.get("type")),
        !f.get("required").asBoolean())).toSeq)

  /** Live (not-DELETED) data files of the current snapshot, each paired
    * with the schema json its MANIFEST was written under — rewrites
    * carry EXISTING entries into per-source-schema manifests, so the
    * pairing survives deleteWhere/compact across evolutions. */
  private def liveFileEntries(spark: SparkSession, meta: TableMeta)
      : Seq[(String, String)] =
    meta.manifests.filter(_.content == 0).flatMap { m =>
      val (recs, schemaJs) = readManifest(spark, new Path(m.path))
      recs.filter(_.get("status").asInstanceOf[Int] != 2)
        .map(_.get("data_file").asInstanceOf[GenericRecord]
          .get("file_path").toString -> schemaJs)
    }

  /** Live POSITION-DELETE files (merge-on-read): parquet files of
    * (file_path, pos) rows committed through content=1 manifests. */
  private def liveDeleteFiles(spark: SparkSession, meta: TableMeta)
      : Seq[String] =
    meta.manifests.filter(_.content == 1).flatMap { m =>
      readManifest(spark, new Path(m.path))._1
        .filter(_.get("status").asInstanceOf[Int] != 2)
        .map(_.get("data_file").asInstanceOf[GenericRecord]
          .get("file_path").toString)
    }

  /** Top-level (field-id, name, type, required) of a schema json. */
  private def topFields(node: com.fasterxml.jackson.databind.JsonNode)
      : Seq[(Int, String, DataType, Boolean)] =
    node.get("fields").elements().asScala.map(f =>
      (f.get("id").asInt(), f.get("name").asText(),
        sparkType(f.get("type")), f.get("required").asBoolean())).toSeq

  /** Read a subset of the table's files with `__file`/`__pos`
    * provenance columns (file path + within-file row position — the
    * address a position delete names), projected to the CURRENT schema
    * BY FIELD ID: files are grouped by the schema that wrote them,
    * columns resolve through that schema's id→name mapping (renames),
    * cast to the current type (widenings), and fields the file
    * predates read as NULL (adds). */
  private def readRaw(spark: SparkSession, meta: TableMeta,
                      files: Seq[(String, String)]): DataFrame = {
    import org.apache.spark.sql.functions.{col, input_file_name, lit}
    val om = new com.fasterxml.jackson.databind.ObjectMapper()
    val current = topFields(meta.schemaNode)
    files.groupBy(_._2).map { case (schemaJs, group) =>
      val fileFields = topFields(om.readTree(schemaJs))
      val byId = fileFields.map(f2 => f2._1 -> f2).toMap
      val paths = group.map(_._1)
      // `_metadata` resolves only on the file-source relation — capture
      // the provenance columns per branch, BEFORE any union
      def withProv(df: DataFrame): DataFrame = df
        .withColumn("__file", input_file_name())
        .withColumn("__pos", col("_metadata.row_index"))
      val raw =
        if (meta.specs.forall(_._2.isEmpty))
          withProv(spark.read.parquet(paths: _*))
        else {
          val bySnapDir = paths.groupBy(fp =>
            fp.substring(0, fp.indexOf("/data/s") +
              fp.substring(fp.indexOf("/data/s")).indexOf('/', 7)))
          // allowMissingColumns: after SPEC evolution, snapshot groups
          // carry different partition-dir columns (a derived bucket/day
          // column exists only in its generation's directories); the
          // projection below reads only schema columns, so a NULL-filled
          // derived column is dropped, and identity partition columns
          // exist in every group (dir or file)
          bySnapDir.map { case (base, fs2) =>
            withProv(spark.read.option("basePath", base).parquet(fs2: _*))
          }.reduce(_.unionByName(_, allowMissingColumns = true))
        }
      raw.select(current.toIndexedSeq.map { case (id, name, dt, _) =>
        byId.get(id) match {
          case Some((_, fileName, _, _)) =>
            // cast off the ACTUAL read-back type, not the manifest-
            // declared one: partition-dir inference re-types values
            // (a long partition value reads back as int) and narrow
            // physical types (smallint) canonicalize to int
            val c = col(fileName)
            (if (raw.schema(fileName).dataType.catalogString == dt.catalogString) c
             else c.cast(dt)).as(name)
          case None => lit(null).cast(dt).as(name)
        }
      } :+ col("__file") :+ col("__pos"): _*)
    }.reduce(_ unionByName _)
  }

  /** Copy-on-write row deletion — the corpus REDACTION path (GDPR
    * erasure, eval-contamination removal): rows matching `predicate`
    * disappear from the new current snapshot, and the rewrite cost is
    * proportional to the AFFECTED FILES, never the table — untouched
    * files carry into the new manifest as EXISTING entries by
    * reference. Rows where the predicate is NULL are kept (not
    * matched). Prior snapshots still time-travel to the full data
    * (physical purge of unreferenced files would be an expireSnapshots
    * maintenance pass, out of scope). Returns the number of rows
    * deleted.
    */
  /** FILE-SKIPPING extraction for the DML paths: the row predicate a
    * DELETE/UPDATE evaluates exactly is ALSO mined, conservatively,
    * for [[Pred]]s so the match-finding scan visits only CANDIDATE
    * files (manifest bounds / partition transforms / Blooms) instead
    * of every live file — the difference between a partition-targeted
    * DELETE costing its partition and costing the table at 100 TB.
    * Returns DNF groups (`OR` of conjunctions): every group must be
    * extractable or the whole OR abandons pruning (a branch that
    * cannot be bounded might match anything); within a conjunction,
    * unextractable conjuncts simply drop (superset guarantee — the
    * exact row predicate still runs on every scanned row). Column
    * references may be unresolved (the parse-time DML route) or
    * resolved; values convert against the DECLARED schema. */
  private def predGroupsOf(e: org.apache.spark.sql.catalyst.expressions.Expression,
                           schema: StructType): Seq[Seq[Pred]] = {
    import org.apache.spark.sql.catalyst.expressions.{And => CAnd, AttributeReference, EqualNullSafe, EqualTo, GreaterThan, GreaterThanOrEqual, In => CIn, InSet, LessThan, LessThanOrEqual, Literal, Or => COr}
    import org.apache.spark.sql.catalyst.analysis.UnresolvedAttribute
    val byName = schema.fields.map(f => f.name -> f.dataType).toMap
    def nameOf(x: org.apache.spark.sql.catalyst.expressions.Expression)
        : Option[String] = x match {
      case a: AttributeReference => Some(a.name)
      case u: UnresolvedAttribute if u.nameParts.size == 1 =>
        Some(u.nameParts.head)
      case _ => None
    }
    def value(n: String, v: Any): Option[Any] =
      if (v == null) None
      else byName.get(n).flatMap {
        case StringType =>
          Some(v.asInstanceOf[org.apache.spark.unsafe.types.UTF8String]
            .toString)
        case IntegerType | LongType | FloatType | DoubleType => Some(v)
        case TimestampType => Some(v) // catalyst micros
        case DateType => Some(v) // catalyst days
        case _ => None
      }
    def cmp(a: org.apache.spark.sql.catalyst.expressions.Expression,
            v: Any, mk: (String, Any) => Pred): Seq[Pred] =
      (for { n <- nameOf(a); c <- value(n, v) } yield mk(n, c)).toSeq
    def conj(x: org.apache.spark.sql.catalyst.expressions.Expression)
        : Seq[Pred] = x match {
      case CAnd(l, r) => conj(l) ++ conj(r)
      case EqualTo(a, Literal(v, _)) => cmp(a, v, EqTo.apply)
      case EqualTo(Literal(v, _), a) => cmp(a, v, EqTo.apply)
      case EqualNullSafe(a, Literal(v, _)) => cmp(a, v, EqTo.apply)
      case EqualNullSafe(Literal(v, _), a) => cmp(a, v, EqTo.apply)
      case GreaterThanOrEqual(a, Literal(v, _)) => cmp(a, v, GtEq.apply)
      case GreaterThan(a, Literal(v, _)) => cmp(a, v, GtEq.apply)
      case LessThanOrEqual(a, Literal(v, _)) => cmp(a, v, LtEq.apply)
      case LessThan(a, Literal(v, _)) => cmp(a, v, LtEq.apply)
      case GreaterThanOrEqual(Literal(v, _), a) => cmp(a, v, LtEq.apply)
      case GreaterThan(Literal(v, _), a) => cmp(a, v, LtEq.apply)
      case LessThanOrEqual(Literal(v, _), a) => cmp(a, v, GtEq.apply)
      case LessThan(Literal(v, _), a) => cmp(a, v, GtEq.apply)
      case CIn(a, list) if list.forall(_.isInstanceOf[Literal]) =>
        (for {
          n <- nameOf(a)
          vs0 = list.map(_.asInstanceOf[Literal].value).filter(_ != null)
          vs = vs0.map(value(n, _))
          if vs.nonEmpty && vs.forall(_.isDefined) && vs.size <= 1000
        } yield AnyOf(n, vs.flatten)).toSeq
      case InSet(a, hset) =>
        (for {
          n <- nameOf(a)
          vs0 = hset.toSeq.filter(_ != null)
          vs = vs0.map(value(n, _))
          if vs.nonEmpty && vs.forall(_.isDefined) && vs.size <= 1000
        } yield AnyOf(n, vs.flatten)).toSeq
      case _ => Nil
    }
    def dnf(x: org.apache.spark.sql.catalyst.expressions.Expression)
        : Option[Seq[Seq[Pred]]] = x match {
      case COr(l, r) => for { a <- dnf(l); b <- dnf(r) } yield a ++ b
      case other => conj(other) match {
        case Nil => None
        case ps => Some(Seq(ps))
      }
    }
    // cap the group count: a 10k-branch OR would cost more to prune
    // than to scan
    dnf(e).filter(_.size <= 1024).getOrElse(Nil)
  }

  /** The candidate file set for a DML predicate: the union of
    * [[pruneFiles]] over the predicate's DNF groups, or every live
    * file when nothing extracts. */
  private def candidateFiles(spark: SparkSession, meta: TableMeta,
                             predicate: org.apache.spark.sql.Column,
                             files: Seq[(String, String)])
      : Seq[(String, String)] = {
    // a Spark-4 Column wraps a ColumnNode tree, not catalyst — analysis
    // against an empty frame of the declared schema is the supported
    // way to a TYPED expression (it also folds literal casts onto the
    // literal side where the mining can see them); an unresolvable
    // predicate mines nothing and the real scan surfaces its error
    val schema = declaredSchema(meta)
    val resolved =
      try {
        val empty = spark.createDataFrame(
          new java.util.ArrayList[org.apache.spark.sql.Row](), schema)
        org.apache.spark.sql.GraftPlanShim
          .analyzedPlan(empty.filter(predicate))
          .collectFirst {
            case f: org.apache.spark.sql.catalyst.plans.logical.Filter =>
              f.condition
          }
      } catch { case scala.util.control.NonFatal(_) => None }
    val groups = resolved.map(predGroupsOf(_, schema)).getOrElse(Nil)
    if (groups.isEmpty) files
    else {
      val keep = groups.flatMap(g => pruneFiles(spark, meta, g)._1)
        .map(_._1).toSet
      files.filter(e => keep(e._1))
    }
  }

  /** Metadata-only TRUNCATE: commit a snapshot whose manifest list is
    * empty — every live file drops in one KB-scale metadata write, ZERO
    * data files are read or written (vs routing `DELETE WHERE true`
    * through [[deleteWhere]], which scans the full table twice to
    * produce nothing). History intact: prior snapshots still
    * time-travel to the full data. Returns the manifest-accounted live
    * row count that was dropped. */
  def truncateTable(spark: SparkSession, tableDir: String): Long = {
    val meta = readMeta(spark, tableDir)
    val n = meta.manifests.filter(_.content == 0).map(_.totalRows).sum
    commit(spark, new Path(tableDir), Some(meta), meta.nextSnapshotId,
      meta.version + 1, manifests = Seq.empty, meta.schemaJs,
      meta.lastColumnId, meta.specs, meta.defaultSpecId,
      operation = "delete", sortCols = meta.sortOrderCols,
      props = meta.props)
    n
  }

  def deleteWhere(spark: SparkSession,
                  tableDir: String,
                  predicate: org.apache.spark.sql.Column): Long = {
    val root = new Path(tableDir)
    val meta = readMeta(spark, tableDir)
    if (liveFileEntries(spark, meta).isEmpty) return 0L
    val snapshotId = meta.nextSnapshotId
    stageDeleteWhere(spark, root, meta, snapshotId, predicate) match {
      case None => 0L
      case Some((groups, nDeleted)) =>
        commitRewrite(spark, root, meta, snapshotId, groups,
          operation = "overwrite")
        nDeleted
    }
  }

  /** STAGE a copy-on-write delete for `snapshotId`: the rewrite groups
    * (survivor rewrites + carried EXISTING entries) that physically
    * apply `predicate` — data files written, NO commit. `None` when no
    * live row matches (and no outstanding MOR delete forces a rewrite)
    * — the caller commits nothing. The shared head of [[deleteWhere]]
    * and the atomic [[overwriteWhere]]. */
  private def stageDeleteWhere(spark: SparkSession, root: Path,
                               meta: TableMeta, snapshotId: Long,
                               predicate: org.apache.spark.sql.Column)
      : Option[(Seq[RewriteGroup], Long)] = {
    import org.apache.spark.sql.functions.{coalesce, lit, not, sum => sum0}
    val files = liveFileEntries(spark, meta)
    if (files.isEmpty) return None

    // one column-pruned scan over the CANDIDATE files (the predicate
    // mined for bounds/partition/Bloom skipping — a partition-targeted
    // delete scans its partition, never the table) finds the files
    // containing LIVE matches (merge-on-read deletes applied first — a
    // row already deleted by position cannot match again) and the
    // matched count per file
    val cand = candidateFiles(spark, meta, predicate, files)
    val hitAgg =
      if (cand.isEmpty) Array.empty[org.apache.spark.sql.Row]
      else applyDeletes(spark, meta, readRaw(spark, meta, cand))
        .filter(coalesce(predicate, lit(false)))
        .groupBy("__file").agg(sum0(lit(1L)).as("__m"))
        .collect()
    val nDeleted = hitAgg.map(_.getLong(1)).sum
    // files referenced by outstanding position deletes rewrite too —
    // after this snapshot every delete is physically applied, so the
    // new manifest list legitimately drops the delete manifests
    val deleteRefs: Set[String] = {
      val dels = liveDeleteFiles(spark, meta)
      if (dels.isEmpty) Set.empty
      else spark.read.parquet(dels: _*).select("file_path").distinct()
        .collect().map(_.getString(0)).toSet
    }
    val liveSet = files.map(_._1).toSet
    val hits = hitAgg.map(_.getString(0)).toSet ++ (deleteRefs & liveSet) ++
      (eqAffectedFiles(spark, meta) & liveSet)
    if (hits.isEmpty) return None

    val schema = declaredSchema(meta)
    val spec = typedSpec(meta.partitionSpec, schema)
    val entrySchema = manifestEntrySchema(spec)

    // rewrite ONLY the hit files (projected to the current schema —
    // a rewrite is the one moment old-schema rows get rewritten new)
    val survivors = applyDeletes(spark, meta,
        readRaw(spark, meta, files.filter(e => hits(e._1))))
      .filter(not(coalesce(predicate, lit(false))))
      .drop("__file", "__pos")
    val survivorCount = survivors.count()
    val (newEntries, newBloomPath) =
      if (survivorCount == 0) (Seq.empty[GenericRecord], None)
      else writeDataFiles(spark, survivors, root, snapshotId,
        spec, entrySchema,
        topFields(meta.schemaNode).map(f2 => f2._2 -> f2._1).toMap,
        bloomCols = meta.bloomCols)

    // untouched files carry over by reference as EXISTING entries,
    // grouped by their SOURCE manifest's schema AND spec so an
    // old-generation file stays readable through its own id→name
    // mapping and prunable through its own partition shape
    val newBloom = newBloomPath.toSeq
    val groups = carryExisting(spark, meta, p => !hits.contains(p)) ++
      (if (newEntries.nonEmpty)
        Seq(RewriteGroup(meta.schemaJs, meta.defaultSpecId, entrySchema,
          newEntries, newBloom))
      else Nil)
    Some((groups, nDeleted))
  }

  /** ATOMIC overwrite-by-predicate: copy-on-write delete of the rows
    * matching `predicate` AND append of `df`, committed as ONE
    * snapshot — the `.overwrite(cond)` / dynamic-partition-overwrite
    * shape without the delete-landed-but-batch-never-did crash window
    * (a failure anywhere before the final metadata write leaves the
    * table at its prior version; staged files are orphans).
    * Returns the rows dropped. */
  def overwriteWhere(spark: SparkSession, tableDir: String,
                     predicate: org.apache.spark.sql.Column,
                     df: DataFrame): Long = {
    val root = new Path(tableDir)
    val meta = readMeta(spark, tableDir)
    val snapshotId = meta.nextSnapshotId
    val staged = stageDeleteWhere(spark, root, meta, snapshotId, predicate)
    val base = staged match {
      case Some((groups, _)) =>
        stageRewriteManifests(spark, root, meta, snapshotId, groups)
      case None => meta.manifests
    }
    val app = stageDataManifest(spark, root, meta, snapshotId, df)
    if (staged.isEmpty && app.isEmpty) return 0L
    commit(spark, root, Some(meta), snapshotId, meta.version + 1,
      base ++ app.map(_._1).toSeq, meta.schemaJs, meta.lastColumnId,
      meta.specs, meta.defaultSpecId, operation = "overwrite",
      sortCols = meta.sortOrderCols, props = meta.props)
    staged.map(_._2).getOrElse(0L)
  }

  /** DYNAMIC partition overwrite — replace exactly the partitions the
    * batch touches, leave every other partition untouched (the
    * `INSERT OVERWRITE ... partitionOverwriteMode=dynamic` /
    * `writeTo.overwritePartitions()` contract): the batch materializes
    * once (self-reference / mid-scan-failure pinning), its DISTINCT
    * partition tuples collect (bounded by the partitions touched —
    * refused above 1000, where a driver-side predicate stops being the
    * right tool), the matching rows copy-on-write delete through the
    * SAME transform expressions the writer partitions by (hidden
    * partitioning: the predicate is on derived values, day/bucket/...,
    * never writer-addressed columns), and the batch appends. An
    * UNPARTITIONED table degrades to the full metadata-only truncate +
    * append (the Iceberg rule). Returns the rows dropped. */
  def overwritePartitions(spark: SparkSession, tableDir: String,
                          df0: DataFrame): Long = {
    import org.apache.spark.sql.functions.{col, lit}
    val meta = readMeta(spark, tableDir)
    val spec = meta.partitionSpec
    val df = df0.localCheckpoint(eager = true)
    if (spec.isEmpty) {
      // unpartitioned: degrade to a full replace — ONE snapshot whose
      // manifest list carries only the new batch (the Iceberg rule),
      // with the dropped-row count from the prior live manifests.
      // Outstanding merge-on-read deletes (content 1/2) mean the data
      // manifests' totalRows OVERCOUNTS the live rows; position-delete
      // counts subtract exactly, but an equality delete's matched-row
      // count is not derivable from metadata (a key kills 0..n rows),
      // so that case pays one read of the (about-to-be-replaced) table.
      val dataRows = meta.manifests.filter(_.content == 0).map(_.totalRows).sum
      val n =
        if (meta.manifests.exists(_.content == 2))
          readTable(spark, tableDir).count()
        else dataRows -
          meta.manifests.filter(_.content == 1).map(_.totalRows).sum
      commitRowDelta(spark, tableDir, appendDf = Some(df),
        replaceAll = true, operation = "overwrite")
      return n
    }
    val schema = declaredSchema(meta)
    def derived(pf: IcebergTransforms.PartField) =
      IcebergTransforms.column(spark, pf.transform, col(pf.sourceCol),
        schema(pf.sourceCol).dataType)
    val touched = df.select(spec.map(pf =>
      derived(pf).as(pf.name)): _*).distinct().collect()
    require(touched.length <= 1000,
      s"dynamic overwrite touches ${touched.length} partitions (> 1000) " +
        "— use a full INSERT OVERWRITE or split the write")
    // delete-the-touched-partitions + append-the-batch commit as ONE
    // snapshot (overwriteWhere) — no half-applied crash window
    val pred = touched.toSeq.map { row =>
      spec.zipWithIndex.map { case (pf, i) =>
        if (row.isNullAt(i)) derived(pf).isNull
        else derived(pf) === lit(row.get(i))
      }.reduce(_ && _)
    }.reduceOption(_ || _).getOrElse(lit(false))
    overwriteWhere(spark, tableDir, pred, df)
  }

  /** Copy-on-write row UPDATE — `SET col = expr` applied to rows
    * matching `predicate`, with the [[deleteWhere]] cost shape: ONLY
    * the files containing matching rows rewrite (plus any files named
    * by outstanding merge-on-read deletes, which this snapshot applies
    * physically); untouched files carry into the new manifest as
    * EXISTING entries by reference. Assignment expressions read the
    * PRE-update row (simultaneous assignment, the SQL UPDATE rule) and
    * cast to the column\u0027s declared type under ANSI semantics; updating
    * a partition or sort column re-clusters the rewritten rows under
    * the table contract (writeDataFiles partitions by the spec on the
    * NEW values). Rows where the predicate is NULL keep their values.
    * Returns the number of rows updated. */
  def updateWhere(spark: SparkSession, tableDir: String,
                  predicate: org.apache.spark.sql.Column,
                  assignments: Seq[(String, org.apache.spark.sql.Column)])
      : Long = {
    import org.apache.spark.sql.functions.{coalesce, col, lit, sum => sum0, when => when0}
    val root = new Path(tableDir)
    val meta = readMeta(spark, tableDir)
    val files = liveFileEntries(spark, meta)
    if (files.isEmpty) return 0L // empty table: nothing to update
    val schema = declaredSchema(meta)
    val assignMap = validAssignments(schema, assignments)

    // one column-pruned scan over the CANDIDATE files (bounds/
    // partition/Bloom-mined from the predicate) finds the files
    // containing LIVE matches (merge-on-read deletes applied first)
    // and the match count per file
    val cand = candidateFiles(spark, meta, predicate, files)
    val hitAgg =
      if (cand.isEmpty) Array.empty[org.apache.spark.sql.Row]
      else applyDeletes(spark, meta, readRaw(spark, meta, cand))
        .filter(coalesce(predicate, lit(false)))
        .groupBy("__file").agg(sum0(lit(1L)).as("__m"))
        .collect()
    val nUpdated = hitAgg.map(_.getLong(1)).sum
    if (nUpdated == 0) return 0L
    // files referenced by outstanding position/equality deletes rewrite
    // too — after this snapshot every delete is physically applied, so
    // the new manifest list legitimately drops the delete manifests
    val deleteRefs: Set[String] = {
      val dels = liveDeleteFiles(spark, meta)
      if (dels.isEmpty) Set.empty
      else spark.read.parquet(dels: _*).select("file_path").distinct()
        .collect().map(_.getString(0)).toSet
    }
    val liveSet = files.map(_._1).toSet
    val hits = hitAgg.map(_.getString(0)).toSet ++ (deleteRefs & liveSet) ++
      (eqAffectedFiles(spark, meta) & liveSet)

    val spec = typedSpec(meta.partitionSpec, schema)
    val entrySchema = manifestEntrySchema(spec)
    val snapshotId = meta.nextSnapshotId

    // rewrite ONLY the hit files: matching rows take the assignments
    // (each expression reading the pre-update row), others pass through
    val matchedPred = coalesce(predicate, lit(false))
    val rewritten = applyDeletes(spark, meta,
        readRaw(spark, meta, files.filter(e => hits(e._1))))
      .select(schema.fields.toIndexedSeq.map { f =>
        assignMap.get(f.name) match {
          case Some(e) =>
            when0(matchedPred, e.cast(f.dataType))
              .otherwise(col(f.name)).as(f.name)
          case None => col(f.name)
        }
      }: _*)
    val (newEntries, newBloomPath) =
      writeDataFiles(spark, rewritten, root, snapshotId, spec, entrySchema,
        topFields(meta.schemaNode).map(f2 => f2._2 -> f2._1).toMap,
        bloomCols = meta.bloomCols)
    val groups = carryExisting(spark, meta, p => !hits.contains(p)) ++
      Seq(RewriteGroup(meta.schemaJs, meta.defaultSpecId, entrySchema,
        newEntries, newBloomPath.toSeq))
    commitRewrite(spark, root, meta, snapshotId, groups,
      operation = "overwrite")
    nUpdated
  }

  /** EXISTING-entry carry groups for a rewrite: every live data-file
    * entry whose path passes `keep`, deep-copied under its OWN entry
    * schema, grouped by (write-time schema, partition-spec id). */
  private def carryExisting(spark: SparkSession, meta: TableMeta,
                            keep: String => Boolean): Seq[RewriteGroup] = {
    val carried = mutable.LinkedHashMap
      .empty[(String, Int), (Schema, mutable.ArrayBuffer[GenericRecord])]
    val bloomsByGroup = mutable.LinkedHashMap
      .empty[(String, Int), mutable.LinkedHashSet[String]]
    meta.manifests.filter(_.content == 0).foreach { m =>
      val (recs, manifestSchemaJs) = readManifest(spark, new Path(m.path))
      // bloom sidecars ride along BY REFERENCE (keyed by file path, so
      // entries for rewritten-away files are simply never consulted)
      val srcBlooms = manifestMetaString(spark, new Path(m.path),
        "bloom-paths").toSeq.flatMap(_.split(',')).filter(_.nonEmpty)
      recs.filter(_.get("status").asInstanceOf[Int] != 2).foreach { e =>
        val d = e.get("data_file").asInstanceOf[GenericRecord]
        if (keep(d.get("file_path").toString)) {
          val c = GenericData.get()
            .deepCopy(e.getSchema, e).asInstanceOf[GenericRecord]
          c.put("status", 0) // EXISTING
          carried.getOrElseUpdate((manifestSchemaJs, m.specId),
            (e.getSchema, mutable.ArrayBuffer.empty))._2 += c
          bloomsByGroup.getOrElseUpdate((manifestSchemaJs, m.specId),
            mutable.LinkedHashSet.empty) ++= srcBlooms
        }
      }
    }
    carried.toSeq.map { case ((js, specId), (es, recs)) =>
      RewriteGroup(js, specId, es, recs.toSeq,
        bloomsByGroup.get((js, specId)).map(_.toSeq).getOrElse(Nil))
    }
  }

  /** MERGE-ON-READ row deletion (the v2 position-delete mechanism on
    * the lite metadata chain): matching rows are named by
    * (file_path, pos) in position-delete parquet files committed
    * through a content=1 manifest — write cost ∝ MATCHES, zero data
    * files rewritten (vs [[deleteWhere]]'s cost ∝ affected files).
    * Readers anti-join the delete set; [[compact]] applies deletes
    * physically and [[deleteWhere]] force-rewrites delete-referenced
    * files, so the two deletion paths compose. Returns rows deleted. */
  def deleteWhereMOR(spark: SparkSession,
                     tableDir: String,
                     predicate: org.apache.spark.sql.Column): Long = {
    import org.apache.spark.sql.functions.{coalesce, col, count, input_file_name, lit}
    val meta = readMeta(spark, tableDir)
    val files = liveFileEntries(spark, meta)
    if (files.isEmpty) return 0L // empty table: nothing to delete

    val cand = candidateFiles(spark, meta, predicate, files)
    if (cand.isEmpty) return 0L
    val matches = applyDeletes(spark, meta, readRaw(spark, meta, cand))
      .filter(coalesce(predicate, lit(false)))
      .select(col("__file").as("file_path"), col("__pos").as("pos"))
      .localCheckpoint() // one scan serves the count and the write
    if (matches.isEmpty) return 0L
    // stage + commit against the ALREADY-READ metadata (readMeta is
    // O(snapshots) of avro IO — a streaming caller pays it once per
    // batch, not twice)
    val root = new Path(tableDir)
    val snapshotId = meta.nextSnapshotId
    stagePositionDeletes(spark, root, meta, snapshotId, matches) match {
      case None => 0L
      case Some((mref, nDeleted)) =>
        commit(spark, root, Some(meta), snapshotId, meta.version + 1,
          meta.manifests :+ mref, meta.schemaJs, meta.lastColumnId,
          meta.specs, meta.defaultSpecId, operation = "delete",
          sortCols = meta.sortOrderCols, props = meta.props)
        nDeleted
    }
  }

  private def validAssignments(schema: StructType,
      assignments: Seq[(String, org.apache.spark.sql.Column)])
      : Map[String, org.apache.spark.sql.Column] = {
    require(assignments.nonEmpty, "UPDATE needs at least one assignment")
    val dup = assignments.map(_._1)
      .diff(assignments.map(_._1).distinct).distinct
    require(dup.isEmpty, s"duplicate assignment to ${dup.mkString(", ")}")
    assignments.foreach { case (c, _) =>
      require(schema.fieldNames.contains(c),
        s"UPDATE column $c not in the table schema " +
          s"(${schema.fieldNames.mkString(", ")})")
    }
    assignments.toMap
  }

  /** MERGE-ON-READ row UPDATE — the v2 position-delete composition of
    * [[updateWhere]]: matching rows are dropped by (file_path, pos)
    * delete files (write cost ∝ MATCHES, zero data files rewritten)
    * and their updated versions append IN THE SAME SNAPSHOT — position
    * deletes name pre-existing (file, pos) addresses, so the new files
    * are untouchable by construction, and the single
    * [[commitRowDelta]] commit makes the statement atomic (no
    * rows-deleted-but-updates-never-landed crash window). ONE scan
    * serves the delete positions and the updated rows (the matched
    * frame is checkpointed before the write); [[compact]] later makes
    * the deletes physical. Same assignment semantics as
    * [[updateWhere]] (pre-update row, ANSI cast, partition
    * re-clustering). Returns the number of rows updated. */
  def updateWhereMOR(spark: SparkSession, tableDir: String,
                     predicate: org.apache.spark.sql.Column,
                     assignments: Seq[(String, org.apache.spark.sql.Column)])
      : Long = {
    import org.apache.spark.sql.functions.{coalesce, col, lit}
    val meta = readMeta(spark, tableDir)
    val files = liveFileEntries(spark, meta)
    if (files.isEmpty) return 0L // empty table: nothing to update
    val schema = declaredSchema(meta)
    val assignMap = validAssignments(schema, assignments)
    val cand = candidateFiles(spark, meta, predicate, files)
    if (cand.isEmpty) return 0L
    val matches = applyDeletes(spark, meta, readRaw(spark, meta, cand))
      .filter(coalesce(predicate, lit(false)))
      .localCheckpoint()
    if (matches.isEmpty) return 0L
    val updated = matches.select(schema.fields.toIndexedSeq.map { f =>
      assignMap.get(f.name) match {
        case Some(e) => e.cast(f.dataType).as(f.name)
        case None => col(f.name)
      }
    }: _*)
    commitRowDelta(spark, tableDir,
      positions = Some(matches.select(col("__file").as("file_path"),
        col("__pos").as("pos"))),
      appendDf = Some(updated), operation = "overwrite")._1
  }

  /** Manifest entries over already-written DELETE parquet files (a
    * content=1/2 manifest's body): one entry per file, unpartitioned
    * (a delete file belongs to no partition). */
  private def deleteFileEntries(spark: SparkSession, root: Path,
                                snapshotId: Long,
                                perFile: Seq[(String, Long)])
      : (Schema, Seq[GenericRecord]) = {
    val delEntrySchema = manifestEntrySchema(Nil)
    val fileSchema = delEntrySchema.getField("data_file").schema()
    val partSchema = fileSchema.getField("partition").schema()
    val f = fs(spark, root)
    val entries = perFile.map { case (path, n) =>
      val e = new GenericData.Record(delEntrySchema)
      e.put("status", 1)
      e.put("snapshot_id", snapshotId)
      val d = new GenericData.Record(fileSchema)
      d.put("file_path", path)
      d.put("file_format", "PARQUET")
      d.put("partition", new GenericData.Record(partSchema))
      d.put("record_count", n)
      d.put("file_size_in_bytes", f.getFileStatus(
        new Path(new java.net.URI(path))).getLen)
      e.put("data_file", d)
      e
    }
    (delEntrySchema, entries)
  }

  /** STAGE position deletes for `snapshotId`: write `(file_path, pos)`
    * rows as delete parquet + ONE content=1 manifest — NO commit (the
    * [[commitRowDelta]] single-snapshot discipline). Returns the
    * manifest ref + delete-row count; `None` when `positions` is empty. */
  private def stagePositionDeletes(spark: SparkSession, root: Path,
                                   meta: TableMeta, snapshotId: Long,
                                   positions: DataFrame)
      : Option[(MRef, Long)] = {
    import org.apache.spark.sql.functions.{count, input_file_name, lit}
    val delDir = new Path(root, s"data/deletes-s$snapshotId")
    positions.write.mode("overwrite").parquet(delDir.toString)
    val perFile = spark.read.parquet(delDir.toString)
      .groupBy(input_file_name().as("f")).agg(count(lit(1)).as("n"))
      .collect().toSeq.map(r => (r.getString(0), r.getLong(1)))
    val nDeleted = perFile.map(_._2).sum
    if (nDeleted == 0) return None
    val (delEntrySchema, entries) =
      deleteFileEntries(spark, root, snapshotId, perFile)
    val manifestPath = new Path(new Path(root, "metadata"),
      f"manifest-$snapshotId%05d-del.avro")
    val manifestLen = writeAvro(spark, manifestPath, delEntrySchema, entries,
      Map("schema" -> meta.schemaJs, "format-version" -> "1",
        "content" -> "deletes"))
    Some((MRef(manifestPath.toString, manifestLen, entries.size, snapshotId,
      nDeleted, content = 1, specId = meta.defaultSpecId), nDeleted))
  }

  /** STAGE an equality delete for `snapshotId`: the key frame's
    * distinct rows as delete parquet + ONE content=2 manifest carrying
    * the key columns by name + field id — NO commit. Key columns must
    * exist in the table schema. Returns the manifest ref + distinct key
    * count; `None` when the key frame is empty. */
  private def stageEqualityDelete(spark: SparkSession, root: Path,
                                  meta: TableMeta, snapshotId: Long,
                                  keys: DataFrame): Option[(MRef, Long)] = {
    import org.apache.spark.sql.functions.{col, count, input_file_name, lit}
    val declared = declaredSchema(meta)
    val keyCols = keys.schema.fieldNames.toSeq
    require(keyCols.nonEmpty, "equality delete needs at least one key column")
    keyCols.foreach(c => require(declared.fieldNames.contains(c),
      s"equality column $c not in the table schema"))
    val delDir = new Path(root, s"data/eqdel-s$snapshotId")
    // cast to the DECLARED types so the MOR join is type-exact even if
    // the caller hands narrower literals
    val casted = keys.select(keyCols.map(c =>
      col(c).cast(declared(c).dataType).as(c)): _*).distinct()
    casted.write.mode("overwrite").parquet(delDir.toString)
    val perFile = spark.read.parquet(delDir.toString)
      .groupBy(input_file_name().as("f")).agg(count(lit(1)).as("n"))
      .collect().toSeq.map(r => (r.getString(0), r.getLong(1)))
    val nKeys = perFile.map(_._2).sum
    if (nKeys == 0) return None
    val (delEntrySchema, entries) =
      deleteFileEntries(spark, root, snapshotId, perFile)
    val manifestPath = new Path(new Path(root, "metadata"),
      f"manifest-$snapshotId%05d-eqdel.avro")
    // key columns ride the manifest metadata by NAME + field id (ids are
    // the evolution-stable identity; names are what the MOR join uses)
    val fieldIds = topFields(meta.schemaNode).map(f2 => f2._2 -> f2._1).toMap
    val manifestLen = writeAvro(spark, manifestPath, delEntrySchema, entries,
      Map("schema" -> meta.schemaJs, "format-version" -> "1",
        "content" -> "deletes",
        "equality-cols" -> keyCols.mkString(","),
        "equality-ids" -> keyCols.map(fieldIds).mkString(",")))
    Some((MRef(manifestPath.toString, manifestLen, entries.size, snapshotId,
      nKeys, content = 2, specId = meta.defaultSpecId), nKeys))
  }

  /** STAGE a data append for an EXISTING table under the table's own
    * persisted contract (partition spec, sort order, bloom columns —
    * exactly what [[appendSnapshot]] applies when the caller names
    * nothing): cluster + write the data files and ONE content=0
    * manifest for `snapshotId` — NO commit. The frame must match the
    * declared schema under the same canonical-type rule as
    * [[appendSnapshot]]. Returns the manifest ref + row count; `None`
    * when the frame is empty. */
  private def stageDataManifest(spark: SparkSession, root: Path,
                                meta: TableMeta, snapshotId: Long,
                                df0: DataFrame,
                                /** extra per-ATTEMPT token for paths —
                                  * REST clients stage before the catalog
                                  * arbitrates, so two concurrent stagers
                                  * computing the same next snapshot id
                                  * must never collide on storage (the
                                  * direct single-writer chain passes ""). */
                                attempt: String = ""): Option[(MRef, Long)] = {
    import org.apache.spark.sql.functions.{col => c0}
    val effectiveSort = meta.sortOrderCols
    val df =
      if (effectiveSort.isEmpty) df0
      else df0.repartitionByRange(effectiveSort.map(c0): _*)
        .sortWithinPartitions(effectiveSort.map(c0): _*)
    if (df.isEmpty) return None
    val declared = declaredSchema(meta)
    require(declared.fields.map(f2 => (f2.name, canonType(f2.dataType)))
        .sameElements(df.schema.fields.map(f2 =>
          (f2.name, canonType(f2.dataType)))),
      s"appended schema ${df.schema.simpleString} differs from the table " +
        s"schema ${declared.simpleString}")
    val spec = typedSpec(meta.partitionSpec, df.schema)
    val entrySchema = manifestEntrySchema(spec)
    val fieldIds = topFields(meta.schemaNode).map(f2 => f2._2 -> f2._1).toMap
    // "-a" keeps this dir clear of a same-snapshot COW rewrite's s<id>
    val (entries, bloomPath) = writeDataFiles(spark, df, root, snapshotId,
      spec, entrySchema, fieldIds, distribute = effectiveSort.isEmpty,
      bloomCols = meta.bloomCols, dirSuffix = s"-a$attempt")
    val manifestPath = new Path(new Path(root, "metadata"),
      f"manifest-$snapshotId%05d$attempt.avro")
    val manifestLen = writeAvro(spark, manifestPath, entrySchema, entries,
      Map("schema" -> meta.schemaJs, "format-version" -> "1",
        "content" -> "data",
        "partition-spec-id" -> meta.defaultSpecId.toString) ++
        bloomPath.map("bloom-paths" -> _))
    val newRows = entries.map(_.get("data_file").asInstanceOf[GenericRecord]
      .get("record_count").asInstanceOf[Long]).sum
    Some((MRef(manifestPath.toString, manifestLen, entries.size, snapshotId,
      newRows, content = 0, specId = meta.defaultSpecId), newRows))
  }

  /** ONE-snapshot row-level delta commit — the ATOMIC DML shape: any
    * combination of an equality-delete key frame, a position-delete
    * frame, and an appended data frame lands under a SINGLE manifest
    * list / metadata version. A crash before the final metadata write
    * leaves the table at its prior version with every staged file
    * unreferenced ([[removeOrphanFiles]] reclaims them) — the
    * half-applied statement window of delete-snapshot + append-snapshot
    * sequences is unrepresentable.
    *
    * Sequencing: manifest entries carry the snapshot that added them,
    * and the MOR reader applies an equality delete only to data files
    * from STRICTLY OLDER snapshots — so rows appended by this same
    * commit survive its own delete (the Iceberg same-sequence-number
    * rule), which is exactly what MERGE/UPDATE re-appends need.
    * Position deletes name pre-existing (file, pos) addresses and
    * cannot touch the new files by construction.
    *
    * `replaceAll` drops every prior manifest (the INSERT OVERWRITE /
    * truncate-and-load shape — full history still time-travels) and is
    * mutually exclusive with the delete frames. Returns
    * (deleted keys/rows, appended rows). No-op (no new snapshot) when
    * nothing stages and `replaceAll` is false. */
  def commitRowDelta(spark: SparkSession, tableDir: String,
                     equalityKeys: Option[DataFrame] = None,
                     positions: Option[DataFrame] = None,
                     appendDf: Option[DataFrame] = None,
                     replaceAll: Boolean = false,
                     operation: String = "overwrite",
                     commitKey: Option[String] = None): (Long, Long) = {
    require(!(replaceAll && (equalityKeys.nonEmpty || positions.nonEmpty)),
      "replaceAll drops every prior file — combining it with delete " +
        "frames is contradictory")
    val root = new Path(tableDir)
    val meta = readMeta(spark, tableDir)
    // exactly-once: a commit key already in the snapshot log means this
    // statement landed before a checkpoint replay — no-op
    if (commitKey.exists(k => hasCommitKey(meta, k))) return (0L, 0L)
    val snapshotId = meta.nextSnapshotId
    val hasLive = meta.manifests.exists(_.content == 0)
    // deletes against an empty table stage nothing (nothing to delete)
    val eq = equalityKeys.filter(_ => hasLive)
      .flatMap(k => stageEqualityDelete(spark, root, meta, snapshotId, k))
    val pos = positions.filter(_ => hasLive)
      .flatMap(p => stagePositionDeletes(spark, root, meta, snapshotId, p))
    val app = appendDf
      .flatMap(df => stageDataManifest(spark, root, meta, snapshotId, df))
    val staged = (eq.toSeq ++ pos.toSeq ++ app.toSeq).map(_._1)
    if (staged.isEmpty && !replaceAll && commitKey.isEmpty) return (0L, 0L)
    val base = if (replaceAll) Seq.empty else meta.manifests
    commit(spark, root, Some(meta), snapshotId, meta.version + 1,
      base ++ staged, meta.schemaJs, meta.lastColumnId, meta.specs,
      meta.defaultSpecId, operation, commitKey = commitKey,
      sortCols = meta.sortOrderCols, props = meta.props)
    ((eq.toSeq ++ pos.toSeq).map(_._2).sum, app.map(_._2).getOrElse(0L))
  }

  /** v2 merge-on-read EQUALITY delete — the CDC/streaming-upsert
    * deletion shape deleteWhereMOR cannot express: drop every row whose
    * values on the key frame's columns match ANY key row, across data
    * files written BEFORE this delete. Sequence semantics make
    * `append → equalityDeleteMOR(keys) → append(new versions)` an
    * UPSERT: the re-appended rows postdate the delete and survive.
    * Write cost ∝ |keys| — no file/position naming, no data scan, no
    * rewrite; readers merge on read, [[compact]]/[[compactSmallFiles]]
    * make it physical. Key columns must exist in the table schema; NULL
    * key values never match. Returns the distinct key count. */
  def equalityDeleteMOR(spark: SparkSession, tableDir: String,
                        keys: DataFrame,
                        commitKey: Option[String] = None): Long = {
    val root = new Path(tableDir)
    val meta = readMeta(spark, tableDir)
    // exactly-once: a commit key already in the snapshot log means this
    // delete landed before a checkpoint replay — no-op (the upsertSink
    // contract)
    if (commitKey.exists(k => hasCommitKey(meta, k))) return 0L
    if (liveFileEntries(spark, meta).isEmpty) {
      // empty table: nothing to delete — but a keyed call (upsertSink's
      // batch replay protection) must still RECORD its key, else a
      // replayed batch would re-run this delete against the rows its
      // own append landed and silently lose them
      commitKey.foreach { _ =>
        commit(spark, root, Some(meta), meta.nextSnapshotId,
          meta.version + 1, meta.manifests, meta.schemaJs,
          meta.lastColumnId, meta.specs, meta.defaultSpecId,
          operation = "delete", commitKey = commitKey,
          sortCols = meta.sortOrderCols, props = meta.props)
      }
      return 0L
    }
    // stage + commit against the ALREADY-READ metadata (readMeta is
    // O(snapshots) of avro IO — the streaming upsert path pays it once
    // per batch, not twice)
    val snapshotId = meta.nextSnapshotId
    stageEqualityDelete(spark, root, meta, snapshotId, keys) match {
      case None =>
        // empty key frame on a live table: a keyed call still RECORDS
        // its commit key (replay protection, as on the empty table)
        commitKey.foreach { _ =>
          commit(spark, root, Some(meta), snapshotId, meta.version + 1,
            meta.manifests, meta.schemaJs, meta.lastColumnId, meta.specs,
            meta.defaultSpecId, operation = "delete",
            commitKey = commitKey, sortCols = meta.sortOrderCols,
            props = meta.props)
        }
        0L
      case Some((mref, nKeys)) =>
        commit(spark, root, Some(meta), snapshotId, meta.version + 1,
          meta.manifests :+ mref, meta.schemaJs, meta.lastColumnId,
          meta.specs, meta.defaultSpecId, operation = "delete",
          commitKey = commitKey, sortCols = meta.sortOrderCols,
          props = meta.props)
        nKeys
    }
  }

  // ---- native V2 scan/write planning (r18) --------------------------------

  /** Per-file planning info for the NATIVE V2 batch scan: absolute
    * path, byte size, the manifest partition values as JVM values
    * (Integer/Long/String/null) aligned to the spec field order, and
    * the ENTRY snapshot id (what equality-delete sequence checks
    * compare against — stable across rewrites that carry entries as
    * EXISTING, same as [[dataFileSnapshots]]). */
  case class NativeFileInfo(path: String, sizeBytes: Long,
                            partValues: Seq[Any], rowCount: Long,
                            snapshotId: Long)

  /** Outstanding merge-on-read deletes of the CURRENT snapshot, in
    * planning shape for the native scan (r19 verdict task 1): the scan
    * applies position deletes as a per-file row-index anti-filter and
    * equality deletes as driver-resolved key sets with entry-snapshot
    * sequence checks — the exact [[applyDeletes]] semantics, so
    * CDC/upsert tables keep statistics, DPP and the direct parquet
    * read instead of dropping to the stat-less V1 fallback. */
  case class NativeDeletes(
      posDeleteFiles: Seq[String],
      /** (delete snapshot, key column names, delete parquet paths),
        * oldest first — [[liveEqualityDeletes]] order. */
      eqDeletes: Seq[(Long, Seq[String], Seq[String])],
      /** manifest-accounted position-delete row total (statistics). */
      posDeleteRows: Long,
      /** true iff NO predicate pruning shaped the planned file set —
        * only then may statistics subtract `posDeleteRows` from the
        * planned rows (a pruned file set can hold fewer rows than the
        * GLOBAL delete total, and under-estimating flips the broadcast
        * decision the wrong way). */
      coversWholeTable: Boolean = true)

  /** The NATIVE V2 scan plan of a table: declared schema, the spec
    * (items + value types), the persisted sort order, the
    * bounds/partition/Bloom-pruned live file set, and any outstanding
    * MOR deletes the scan must apply. */
  case class NativeScanInfo(schema: StructType, specItems: Seq[String],
                            spec: Seq[(IcebergTransforms.PartField, DataType)],
                            sortCols: Seq[String],
                            files: Seq[NativeFileInfo],
                            deletes: Option[NativeDeletes] = None)

  /** Plan a NATIVE V2 batch scan of the CURRENT snapshot, or `None`
    * when only the DataFrame route can represent the table state —
    * multiple schema/spec generations (files need field-id remapping /
    * per-generation partition shapes; [[compact]] collapses both), or
    * outstanding merge-on-read deletes unless the caller opts in with
    * `allowDeletes` (READ paths apply them inside the scan; the
    * row-level DML path keeps refusing, so group replacement semantics
    * are unchanged). Delete states larger than
    * `spark.graft.nativeScan.morDeletes.maxRows` (default 4M rows,
    * manifest-accounted before any file is read) also fall back: the
    * native scan resolves deletes into driver-held sets, and past that
    * size the V1 route's distributed anti-join is the right tool. File
    * skipping is the SAME [[pruneFiles]] pass the V1 route uses
    * (manifest bounds, partition transforms, Bloom sidecars). */
  def nativeScanInfo(spark: SparkSession, tableDir: String,
                     preds: Seq[Pred] = Nil,
                     allowDeletes: Boolean = false): Option[NativeScanInfo] = {
    val hint = new Path(tableDir, "metadata/version-hint.text")
    if (!fs(spark, hint).exists(hint)) return None
    val meta = readMeta(spark, tableDir)
    val hasDeletes = meta.manifests.exists(_.content != 0)
    if (hasDeletes) {
      if (!allowDeletes) return None
      // position deletes resolve to Array[Long] per file (~32 MB at the
      // 4M default); equality deletes resolve to a Set of boxed key
      // TUPLES — a far heavier shape (~100-250 B/row) — so they carry
      // their own, much lower cap. Past either cap the V1 route's
      // distributed anti-join is the right tool.
      val posRows =
        meta.manifests.filter(_.content == 1).map(_.totalRows).sum
      val eqRows =
        meta.manifests.filter(_.content == 2).map(_.totalRows).sum
      val posCap = spark.conf
        .get("spark.graft.nativeScan.morDeletes.maxRows", "4000000").toLong
      val eqCap = spark.conf
        .get("spark.graft.nativeScan.morDeletes.maxEqRows", "1000000").toLong
      if (posRows > posCap || eqRows > eqCap) return None
    }
    val perManifest = meta.manifests.filter(_.content == 0).map { m =>
      val (recs, schemaJs) = readManifest(spark, new Path(m.path))
      (m, recs, schemaJs)
    }
    // schema-generation equality is STRUCTURAL (manifests written at
    // create-time carry the generator's whitespace, later ones the
    // Jackson-normalized form — same schema either way)
    val om = new com.fasterxml.jackson.databind.ObjectMapper()
    val currentSchema = om.readTree(meta.schemaJs)
    if (perManifest.exists { case (m, _, js) =>
      om.readTree(js) != currentSchema ||
        m.specId != meta.defaultSpecId }) return None
    val keep: Set[String] =
      if (preds.isEmpty) null // no pruning requested: keep everything
      else pruneFiles(spark, meta, preds)._1.map(_._1).toSet
    val schema = declaredSchema(meta)
    val spec = typedSpec(meta.partitionSpec, schema)
    val files = perManifest.flatMap { case (_, recs, _) =>
      recs.filter(_.get("status").asInstanceOf[Int] != 2).flatMap { e =>
        val d = e.get("data_file").asInstanceOf[GenericRecord]
        val path = d.get("file_path").toString
        if (keep != null && !keep.contains(path)) None
        else {
          val part = d.get("partition").asInstanceOf[GenericRecord]
          val values = spec.map { case (pf, _) =>
            part.get(pf.name) match {
              case null => null
              case u: org.apache.avro.util.Utf8 => u.toString
              case other => other // Integer / Long / String
            }
          }
          Some(NativeFileInfo(path,
            d.get("file_size_in_bytes").asInstanceOf[Long], values,
            d.get("record_count").asInstanceOf[Long],
            e.get("snapshot_id").asInstanceOf[Long]))
        }
      }
    }
    val deletes =
      if (!hasDeletes) None
      else {
        val eqs = liveEqualityDeletes(spark, meta)
        // the reader applies equality deletes by JVM value equality of
        // boxed key tuples — exact for the primitive/string/temporal
        // family, but Array[Byte] (binary) and nested values compare by
        // REFERENCE, which would silently resurrect deleted rows. Gate
        // on key types; anything outside the proven set keeps the V1
        // route's real join.
        val eqKeyTypesOk = eqs.flatMap(_._2).distinct.forall { c =>
          schema.fields.find(_.name == c).map(_.dataType).exists {
            case _: NumericType | StringType | BooleanType | DateType |
                 TimestampType | TimestampNTZType => true
            case _ => false
          }
        }
        if (!eqKeyTypesOk) return None
        Some(NativeDeletes(liveDeleteFiles(spark, meta), eqs,
          meta.manifests.filter(_.content == 1).map(_.totalRows).sum,
          coversWholeTable = preds.isEmpty))
      }
    Some(NativeScanInfo(schema, meta.partitionSpec.map(renderSpec), spec,
      meta.sortOrderCols, files, deletes))
  }

  /** The snapshot id the NEXT commit will take — the native V2 write
    * keys its staging directory to it (single-writer discipline, as
    * everywhere on this metadata chain). */
  def nextSnapshotIdOf(spark: SparkSession, tableDir: String): Long =
    readMeta(spark, tableDir).nextSnapshotId

  /** ATOMIC group replacement — the commit half of the NATIVE V2
    * row-level write (ReplaceData): drop `replacedFiles` (the files the
    * operation's scan planned), adopt `stagedFiles` (written by
    * executor DataWriters under `stagingDir` in partitionBy layout),
    * and commit ONE snapshot. Entries for the new files derive from
    * the same read-back pass [[writeDataFiles]] uses (bounds,
    * partition values, Bloom sidecars), so a native-written file is
    * indistinguishable from an API-written one. Returns the appended
    * row count. */
  def commitReplaceGroups(spark: SparkSession, tableDir: String,
                          replacedFiles: Set[String],
                          stagingDir: String,
                          stagedFiles: Seq[String]): Long = {
    val root = new Path(tableDir)
    val meta = readMeta(spark, tableDir)
    val schema = declaredSchema(meta)
    val spec = typedSpec(meta.partitionSpec, schema)
    val entrySchema = manifestEntrySchema(spec)
    val snapshotId = meta.nextSnapshotId
    val fieldIds = topFields(meta.schemaNode).map(f2 => f2._2 -> f2._1).toMap
    if (replacedFiles.isEmpty && stagedFiles.isEmpty) return 0L
    val (entries, bloomPath) =
      if (stagedFiles.isEmpty) (Seq.empty[GenericRecord], None)
      else deriveDataEntries(spark, root,
        // basePath keeps partition-directory inference rooted at the
        // staging dir while reading ONLY the files the committed tasks
        // wrote (a crashed speculative attempt's strays never adopt)
        spark.read.option("basePath", stagingDir).parquet(stagedFiles: _*),
        snapshotId, spec, entrySchema, fieldIds, schema, meta.bloomCols,
        bloomSuffix = "-w")
    val groups = carryExisting(spark, meta, p => !replacedFiles.contains(p)) ++
      (if (entries.nonEmpty)
        Seq(RewriteGroup(meta.schemaJs, meta.defaultSpecId, entrySchema,
          entries, bloomPath.toSeq))
      else Nil)
    commitRewrite(spark, root, meta, snapshotId, groups,
      operation = "overwrite")
    entries.map(_.get("data_file").asInstanceOf[GenericRecord]
      .get("record_count").asInstanceOf[Long]).sum
  }

  /** Rewrite every live file into one fresh snapshot — the small-file
    * compaction pass after many incremental appends. Content-preserving
    * (pinned by test); prior snapshots still time-travel. */
  def compact(spark: SparkSession, tableDir: String): Unit = {
    val root = new Path(tableDir)
    val meta = readMeta(spark, tableDir)
    val files = liveFileEntries(spark, meta)
    require(files.nonEmpty, "table has no data files")
    val schema = declaredSchema(meta)
    val spec = typedSpec(meta.partitionSpec, schema)
    val entrySchema = manifestEntrySchema(spec)
    val snapshotId = meta.nextSnapshotId
    // merge-on-read deletes apply HERE — compaction is the pass that
    // makes them physical (the new list carries no delete manifests)
    val all = applyDeletes(spark, meta, readRaw(spark, meta, files))
      .drop("__file", "__pos")
    val (entries, newBloomPath) = writeDataFiles(spark, all, root, snapshotId,
      spec, entrySchema,
      topFields(meta.schemaNode).map(f2 => f2._2 -> f2._1).toMap,
      bloomCols = meta.bloomCols)
    val newBloom = newBloomPath.toSeq
    commitRewrite(spark, root, meta, snapshotId,
      Seq(RewriteGroup(meta.schemaJs, meta.defaultSpecId, entrySchema,
        entries, newBloom)),
      operation = "replace")
  }

  /** Size-TARGETED compaction — the production bin-pack shape: only
    * files smaller than `smallerThanBytes` (plus any file referenced by
    * outstanding position deletes, so deletes go physical) rewrite into
    * fresh right-sized files; everything else carries BY REFERENCE as
    * EXISTING entries. Rewrite cost ∝ the small-file tail, never the
    * table — on a 100 TB table the difference between a nightly
    * maintenance pass and an impossible one. Returns the number of
    * files rewritten. */
  def compactSmallFiles(spark: SparkSession, tableDir: String,
                        smallerThanBytes: Long): Long = {
    val root = new Path(tableDir)
    val meta = readMeta(spark, tableDir)
    val files = liveFileEntries(spark, meta)
    require(files.nonEmpty, "table has no data files")
    val schema = declaredSchema(meta)
    val spec = typedSpec(meta.partitionSpec, schema)
    val entrySchema = manifestEntrySchema(spec)
    val snapshotId = meta.nextSnapshotId

    // small files from the MANIFEST metadata (no file-system stats) +
    // the position-delete-referenced ones
    val small = mutable.LinkedHashSet.empty[String]
    meta.manifests.filter(_.content == 0).foreach { m =>
      readManifest(spark, new Path(m.path))._1
        .filter(_.get("status").asInstanceOf[Int] != 2)
        .map(_.get("data_file").asInstanceOf[GenericRecord])
        .filter(_.get("file_size_in_bytes").asInstanceOf[Long] < smallerThanBytes)
        .foreach(d => small += d.get("file_path").toString)
    }
    val dels = liveDeleteFiles(spark, meta)
    if (dels.nonEmpty)
      spark.read.parquet(dels: _*).select("file_path").distinct()
        .collect().map(_.getString(0))
        .filter(files.map(_._1).toSet).foreach(small += _)
    // files a live EQUALITY delete still applies to rewrite too (the
    // new list drops the delete manifests, so the merge goes physical)
    (eqAffectedFiles(spark, meta) & files.map(_._1).toSet)
      .foreach(small += _)
    if (small.isEmpty) return 0L

    val packed = applyDeletes(spark, meta,
        readRaw(spark, meta, files.filter(e => small.contains(e._1))))
      .drop("__file", "__pos")
    val (newEntries, newBloomPath) =
      if (packed.isEmpty) (Seq.empty[GenericRecord], None)
      else writeDataFiles(spark, packed.coalesce(
          math.max(1, spark.sparkContext.defaultParallelism / 4)),
        root, snapshotId, spec, entrySchema,
        topFields(meta.schemaNode).map(f2 => f2._2 -> f2._1).toMap,
        bloomCols = meta.bloomCols)

    val newBloom = newBloomPath.toSeq
    val groups = carryExisting(spark, meta, p => !small.contains(p)) ++
      (if (newEntries.nonEmpty)
        Seq(RewriteGroup(meta.schemaJs, meta.defaultSpecId, entrySchema,
          newEntries, newBloom))
      else Nil)
    commitRewrite(spark, root, meta, snapshotId, groups,
      operation = "replace")
    small.size.toLong
  }

  /** Orphan-file GC: delete files that NO snapshot references — a
    * failed or losing-concurrent writer's leftovers (manifest-driven
    * reads never see them, but they cost storage forever). Two sweeps
    * off ONE gathered reference set (the expireSnapshots discipline:
    * gather everything before deleting anything), walking every
    * snapshot in the log — data AND delete manifests — so time travel
    * stays intact:
    *
    *  - `data/`: files no manifest of any snapshot references;
    *  - `metadata/`: `snap-*` manifest lists no snapshot names and
    *    `manifest-*` / `bloom-*` files no live manifest list reaches —
    *    a losing concurrent REST stager's attempt-unique avro files
    *    land here and were previously never reclaimed.
    *
    * `olderThanMs` guards the CONCURRENT-STAGER race: an in-flight
    * writer's staged files are unreferenced until its commit wins, so a
    * sweep racing it could delete files a winning commit is about to
    * reference — for staged METADATA that corrupts the whole table, not
    * one file. Deployments with concurrent writers must pass a horizon
    * comfortably above their longest staging window (the Iceberg
    * remove_orphan_files discipline defaults to 3 days); 0 — the
    * default, for single-writer/maintenance-window use — sweeps
    * everything unreferenced. Returns the paths removed. */
  def removeOrphanFiles(spark: SparkSession, tableDir: String,
                        olderThanMs: Long = 0L): Seq[String] = {
    val root = new Path(tableDir)
    val meta = readMeta(spark, tableDir)
    val f = fs(spark, root)
    val cutoff =
      if (olderThanMs <= 0L) Long.MaxValue
      else System.currentTimeMillis() - olderThanMs
    def norm(p2: String): String = new Path(new java.net.URI(p2)).toUri.getPath
    // every file referenced by ANY snapshot, by kind — ONE read per
    // manifest (records + the bloom-paths header from the same bytes)
    val refLists = meta.snapshots.map(s2 => norm(s2._2)).toSet
    val manifestPaths = meta.snapshots.flatMap { case (_, listPath, _) =>
      readAvro(spark, new Path(listPath)).map(_.get("manifest_path").toString)
    }.distinct
    val refManifests = manifestPaths.map(norm).toSet
    val refBlooms = Set.newBuilder[String]
    val refData = Set.newBuilder[String]
    manifestPaths.foreach { m =>
      val in = new java.io.ByteArrayInputStream(readBytes(spark, new Path(m)))
      val r = new DataFileStream[GenericRecord](in,
        new GenericDatumReader[GenericRecord]())
      try {
        Option(r.getMetaString("bloom-paths")).toSeq
          .flatMap(_.split(',')).filter(_.nonEmpty)
          .foreach(b => refBlooms += norm(b))
        r.iterator().asScala.foreach(e =>
          refData += norm(e.get("data_file").asInstanceOf[GenericRecord]
            .get("file_path").toString))
      } finally r.close()
    }
    val refBloomSet = refBlooms.result()
    val refDataSet = refData.result()
    val orphans = mutable.ArrayBuffer.empty[String]
    val dataDir = new Path(root, "data")
    if (f.exists(dataDir)) {
      val it = f.listFiles(dataDir, true)
      while (it.hasNext) {
        val st = it.next()
        val p2 = st.getPath
        val isDataFile = st.isFile && !p2.getName.startsWith("_") &&
          !p2.getName.startsWith(".")
        if (isDataFile && st.getModificationTime <= cutoff &&
            !refDataSet.contains(p2.toUri.getPath))
          orphans += p2.toString
      }
    }
    val metaDir = new Path(root, "metadata")
    if (f.exists(metaDir)) {
      f.listStatus(metaDir).foreach { st =>
        val p2 = st.getPath
        val n = p2.getName
        val unreferenced =
          if (n.startsWith("snap-")) !refLists.contains(p2.toUri.getPath)
          else if (n.startsWith("manifest-"))
            !refManifests.contains(p2.toUri.getPath)
          else if (n.startsWith("bloom-"))
            !refBloomSet.contains(p2.toUri.getPath)
          else false // version files / hint: never swept here
        if (st.isFile && st.getModificationTime <= cutoff && unreferenced)
          orphans += p2.toString
      }
    }
    orphans.foreach(o => f.delete(new Path(o), false))
    orphans.toSeq
  }

  /** One manifest-to-be of a rewrite snapshot: entries sharing a
    * write-time schema AND partition spec (after spec evolution, carried
    * entries keep their generation's partition record shape — its avro
    * entry schema rides along so old-spec records never deep-copy into
    * a mismatched shape). */
  private case class RewriteGroup(schemaJs: String, specId: Int,
                                  entrySchema: Schema,
                                  entries: Seq[GenericRecord],
                                  bloomPaths: Seq[String] = Nil)

  /** Commit a rewrite snapshot: one manifest PER (SOURCE SCHEMA, SPEC)
    * holding its entries (existing + added), a manifest list referencing
    * them, and the next metadata version. The table's schema json and
    * last-column-id carry over VERBATIM — a rewrite never renumbers
    * evolved field ids. */
  private def commitRewrite(spark: SparkSession, root: Path, meta: TableMeta,
                            snapshotId: Long,
                            groups: Seq[RewriteGroup],
                            operation: String): Unit =
    commit(spark, root, Some(meta), snapshotId, meta.version + 1,
      stageRewriteManifests(spark, root, meta, snapshotId, groups),
      meta.schemaJs, meta.lastColumnId,
      meta.specs, meta.defaultSpecId, operation,
      sortCols = meta.sortOrderCols, props = meta.props)

  /** Write one manifest PER rewrite group (existing + added entries)
    * for `snapshotId` and return the refs — NO commit (the staging
    * half of [[commitRewrite]], reused by atomic delete+append
    * commits). */
  private def stageRewriteManifests(spark: SparkSession, root: Path,
                                    meta: TableMeta, snapshotId: Long,
                                    groups: Seq[RewriteGroup]): Seq[MRef] = {
    val metaDir = new Path(root, "metadata")
    groups.zipWithIndex.map { case (g, k) =>
        val manifestPath =
          new Path(metaDir, f"manifest-$snapshotId%05d-$k.avro")
        val manifestLen = writeAvro(spark, manifestPath, g.entrySchema,
          g.entries,
          Map("schema" -> g.schemaJs, "format-version" -> "1",
            "content" -> "data",
            "partition-spec-id" -> g.specId.toString) ++
            (if (g.bloomPaths.nonEmpty)
              Map("bloom-paths" -> g.bloomPaths.mkString(","))
            else Map.empty))
        // the spec's added_* fields count ADDED entries; carried
        // EXISTING entries ride the existing_* fields — so the summary
        // metrics stay honest for rewrite snapshots
        def rows(es: Seq[GenericRecord]): Long =
          es.map(_.get("data_file").asInstanceOf[GenericRecord]
            .get("record_count").asInstanceOf[Long]).sum
        val (added, existing) = g.entries.partition(
          _.get("status").asInstanceOf[Int] == 1)
        MRef(manifestPath.toString, manifestLen, added.size, snapshotId,
          rows(added), content = 0, specId = g.specId,
          existingFiles = existing.size, existingRows = rows(existing))
    }
  }

  /** Physically purge history: keep the `keepLast` most recent
    * snapshots, delete every data file, manifest, and manifest list
    * referenced ONLY by expired ones, and commit a metadata version
    * whose snapshot log contains the survivors. This is the pass that
    * makes [[deleteWhere]] a REAL erasure (until then, prior snapshots
    * still time-travel to the deleted rows — the Iceberg
    * expire-snapshots contract). */
  def expireSnapshots(spark: SparkSession, tableDir: String,
                      keepLast: Int = 1): Unit = {
    require(keepLast >= 1, "must keep at least the current snapshot")
    val root = new Path(tableDir)
    val meta = readMeta(spark, tableDir)
    // retention is LINEAGE-aware, not id-recency: after a rollback the
    // abandoned commits hold the HIGHEST ids, and an id-ordered
    // keepLast would retain the dead orphans while purging the live
    // head's own ancestors. Keep: the last `keepLast` ancestors of
    // main's head; every ref'd snapshot (expiring a named pointer's
    // target would corrupt the ref); and each BRANCH ref's private
    // ancestry (its recorded-parent walk must stay intact for
    // fastForward's ancestor check). Non-ref'd snapshots on no kept
    // lineage — rollback orphans, dropped staging branches — expire
    // NOW, which is what makes `rollbackTo` + expire (or `dropRef` +
    // expire) reclaim space.
    val parentOf = parentMap(meta)
    def lineageOf(head: Long): Seq[Long] = {
      val ids = scala.collection.mutable.ArrayBuffer.empty[Long]
      var cur = head
      val retained = meta.snapshots.map(_._1).toSet
      while (cur > 0 && retained.contains(cur)) {
        ids += cur
        cur = parentOf.getOrElse(cur, 0L)
      }
      ids.toSeq // newest first
    }
    val mainLineage = lineageOf(meta.refs("main")._1)
    val mainKeep = mainLineage.take(keepLast)
    val onMain = mainLineage.toSet
    // a branch keeps only its PRIVATE segment (above the fork) — its
    // shared prefix is main history, governed by keepLast like any
    val branchKeep = meta.refs.collect {
      case (name, (head, "branch")) if name != "main" =>
        lineageOf(head).takeWhile(id => !onMain.contains(id))
    }.flatten
    val keepIds = mainKeep.toSet ++ branchKeep ++ meta.refs.values.map(_._1)
    val (kept, dropped) = meta.snapshots.partition(s2 => keepIds(s2._1))
    if (dropped.isEmpty) return

    def refs(listPath: String): (Set[String], Set[String]) = {
      val manifests = readAvro(spark, new Path(listPath))
        .map(_.get("manifest_path").toString).toSet
      val files = manifests.flatMap(m => readAvro(spark, new Path(m))
        .map(_.get("data_file").asInstanceOf[GenericRecord]
          .get("file_path").toString))
      (manifests, files)
    }
    def bloomsOf(manifests: Set[String]): Set[String] =
      manifests.flatMap(m => manifestMetaString(spark, new Path(m),
        "bloom-paths").toSeq.flatMap(_.split(',')).filter(_.nonEmpty))
    // gather ALL references before deleting anything — a manifest can be
    // shared by several dropped snapshots' lists
    val keptRefs = kept.map(s2 => refs(s2._2))
    val keptManifests = keptRefs.flatMap(_._1).toSet
    val keptFiles = keptRefs.flatMap(_._2).toSet
    val droppedRefs = dropped.map(s2 => refs(s2._2))
    // bloom sidecars expire with their last referencing manifest (the
    // same gather-before-delete discipline); headers read BEFORE any
    // manifest deletion
    val keptBlooms = bloomsOf(keptManifests)
    val droppedBlooms = bloomsOf(droppedRefs.flatMap(_._1).toSet)
    val f = fs(spark, root)
    (droppedRefs.flatMap(_._2).toSet -- keptFiles).foreach(fp =>
      f.delete(new Path(new java.net.URI(fp)), false))
    (droppedRefs.flatMap(_._1).toSet -- keptManifests).foreach(m =>
      f.delete(new Path(m), false))
    (droppedBlooms -- keptBlooms).foreach(b =>
      f.delete(new Path(b), false))
    dropped.foreach { case (_, listPath, _) =>
      f.delete(new Path(listPath), false)
    }

    // next metadata version: survivors only, current pointer unchanged;
    // schema json + last-column-id verbatim (never renumber field ids)
    val keptIdSet = kept.map(_._1).toSet
    writeMetadata(spark, root, meta.version + 1, meta.schemaJs,
      meta.lastColumnId, meta.specs, meta.defaultSpecId,
      meta.currentSnapshotId, kept,
      meta.sortOrderCols, meta.refs, meta.props,
      meta.snapshotTs.filter(kv => keptIdSet(kv._1)),
      meta.snapshotLog.filter(e => keptIdSet(e._2)))
  }

  // ---- per-file Bloom filters (puffin-style sidecar) ----------------------
  //
  // Manifest MIN/MAX bounds prune RANGES on clustered columns; an
  // equality probe on a high-cardinality NON-sort column (doc_id lookup
  // in a time-sorted table) proves nothing by bounds and scans
  // everything. Per-file Bloom filters close that gap: for each data
  // file and each declared bloom column, a fixed-parameter Bloom filter
  // over the file's values lands in a SIDECAR avro next to the
  // manifest (puffin-style — filters are 10-100 KB each, far too big
  // for manifest entries at 100 TB file counts), referenced from the
  // manifest avro header ("bloom-paths"). readTableWhere's EqTo leg
  // consults them lazily (only when an equality predicate names a
  // bloom column), CONSERVATIVELY: a file with no filter always scans,
  // and a positive filter only ever ADDS the file. The column set is a
  // persisted table property (graft-bloom-cols) like the sort order,
  // so every later writer inherits the contract.

  /** Table property naming the Bloom-filtered columns. */
  private val BloomColsProp = "graft-bloom-cols"
  // fixed across all writers of a table: mergeInPlace requires
  // identical parameters, and probes must hash identically
  private val BloomExpectedItems = 100000L
  private val BloomFpp = 0.03

  private val BloomSidecarSchema: Schema = new Schema.Parser().parse("""
    {"type": "record", "name": "bloom_entry", "fields": [
      {"name": "file_path", "type": "string"},
      {"name": "field_id", "type": "int"},
      {"name": "bits", "type": "bytes"}
    ]}""")

  /** Bloom bits as an AGGREGATE (r15 — the builder's documented
    * follow-up, VERDICT r14 task 3): the filter build rides the SAME
    * groupBy-per-file pass that computes the manifest min/max bounds in
    * [[writeDataFiles]], so an append with bloom columns reads its
    * batch back ONCE instead of twice. Typed `Aggregator`s (a genuine
    * can't-express-with-builtins case): the buffer is the live
    * BloomFilter object (serialized only at partial/merge boundaries),
    * the output its spec serialization — byte-identical probe semantics
    * to the old two-pass build (putLong/putString ↔
    * mightContainLong/mightContainString). NULL inputs are skipped,
    * matching the old pass. */
  private class BloomLongAgg extends org.apache.spark.sql.expressions
      .Aggregator[java.lang.Long,
        org.apache.spark.util.sketch.BloomFilter, Array[Byte]] {
    def zero: org.apache.spark.util.sketch.BloomFilter =
      org.apache.spark.util.sketch.BloomFilter
        .create(BloomExpectedItems, BloomFpp)
    def reduce(b: org.apache.spark.util.sketch.BloomFilter,
               a: java.lang.Long): org.apache.spark.util.sketch.BloomFilter = {
      if (a != null) b.putLong(a.longValue())
      b
    }
    def merge(x: org.apache.spark.util.sketch.BloomFilter,
              y: org.apache.spark.util.sketch.BloomFilter)
        : org.apache.spark.util.sketch.BloomFilter = {
      x.mergeInPlace(y); x
    }
    def finish(b: org.apache.spark.util.sketch.BloomFilter): Array[Byte] = {
      val bo = new java.io.ByteArrayOutputStream()
      b.writeTo(bo); bo.toByteArray
    }
    def bufferEncoder: org.apache.spark.sql.Encoder[
        org.apache.spark.util.sketch.BloomFilter] =
      org.apache.spark.sql.Encoders.javaSerialization(
        classOf[org.apache.spark.util.sketch.BloomFilter])
    def outputEncoder: org.apache.spark.sql.Encoder[Array[Byte]] =
      org.apache.spark.sql.Encoders.BINARY
  }

  private class BloomStringAgg extends org.apache.spark.sql.expressions
      .Aggregator[String,
        org.apache.spark.util.sketch.BloomFilter, Array[Byte]] {
    def zero: org.apache.spark.util.sketch.BloomFilter =
      org.apache.spark.util.sketch.BloomFilter
        .create(BloomExpectedItems, BloomFpp)
    def reduce(b: org.apache.spark.util.sketch.BloomFilter,
               a: String): org.apache.spark.util.sketch.BloomFilter = {
      if (a != null) b.putString(a)
      b
    }
    def merge(x: org.apache.spark.util.sketch.BloomFilter,
              y: org.apache.spark.util.sketch.BloomFilter)
        : org.apache.spark.util.sketch.BloomFilter = {
      x.mergeInPlace(y); x
    }
    def finish(b: org.apache.spark.util.sketch.BloomFilter): Array[Byte] = {
      val bo = new java.io.ByteArrayOutputStream()
      b.writeTo(bo); bo.toByteArray
    }
    def bufferEncoder: org.apache.spark.sql.Encoder[
        org.apache.spark.util.sketch.BloomFilter] =
      org.apache.spark.sql.Encoders.javaSerialization(
        classOf[org.apache.spark.util.sketch.BloomFilter])
    def outputEncoder: org.apache.spark.sql.Encoder[Array[Byte]] =
      org.apache.spark.sql.Encoders.BINARY
  }

  private lazy val bloomLongUdaf = org.apache.spark.sql.functions.udaf(
    new BloomLongAgg, org.apache.spark.sql.Encoders.LONG)
  private lazy val bloomStringUdaf = org.apache.spark.sql.functions.udaf(
    new BloomStringAgg, org.apache.spark.sql.Encoders.STRING)

  /** Load sidecars into (file_path, field_id) → filter. */
  private def loadBlooms(spark: SparkSession, paths: Seq[String])
      : Map[(String, Int), org.apache.spark.util.sketch.BloomFilter] =
    paths.flatMap { p =>
      readAvro(spark, new Path(p)).map { r =>
        val bb = r.get("bits").asInstanceOf[java.nio.ByteBuffer].duplicate()
        val bytes = new Array[Byte](bb.remaining()); bb.get(bytes)
        (r.get("file_path").toString,
          r.get("field_id").asInstanceOf[Int]) ->
          org.apache.spark.util.sketch.BloomFilter
            .readFrom(new java.io.ByteArrayInputStream(bytes))
      }
    }.toMap

  /** Does the filter possibly contain the probe value? (type-aligned
    * with the build-side puts). */
  private def bloomMightContain(
      bf: org.apache.spark.util.sketch.BloomFilter, v: Any): Boolean =
    v match {
      case n: java.lang.Long => bf.mightContainLong(n.longValue())
      case n: java.lang.Integer => bf.mightContainLong(n.longValue())
      case s: String => bf.mightContainString(s)
      case other => true // unknown probe type: conservative
    }

  // ---- scan pruning via manifest column bounds ---------------------------

  /** File-skipping predicates evaluated against the per-file column
    * bounds the manifests record (spec fields 125/128). Pruning is
    * CONSERVATIVE: a file is skipped only when its bounds PROVE no row
    * can match; files without bounds for the column always scan. The
    * caller still applies the real row filter — pruning only shrinks
    * the file set, exactly like the runtime's scan planning. */
  sealed trait Pred { def col: String }
  /** rows with `col >= v` may exist */
  final case class GtEq(col: String, v: Any) extends Pred
  /** rows with `col <= v` may exist */
  final case class LtEq(col: String, v: Any) extends Pred
  /** rows with `col = v` may exist */
  final case class EqTo(col: String, v: Any) extends Pred
  /** rows with `col` equal to ANY of `vs` may exist (the IN-list /
    * OR-of-equalities shape): a file skips only when EVERY value is
    * excluded — by bounds, partition value, or Bloom — for that file.
    * An empty list prunes nothing (conservative). */
  final case class AnyOf(col: String, vs: Seq[Any]) extends Pred

  /** Predicates for `col LIKE 'prefix%'`: `[prefix, nextPrefix)` as
    * GtEq + LtEq when a byte-safe upper bound exists (the same
    * increment discipline the manifest string bounds use), GtEq alone
    * otherwise. An empty prefix prunes nothing. */
  def prefixPreds(col: String, prefix: String): Seq[Pred] =
    if (prefix.isEmpty) Nil
    else GtEq(col, prefix) +:
      incrementPrefix(prefix).map(LtEq(col, _)).toSeq

  private def entryBounds(d: GenericRecord, key: String): Map[Int, Array[Byte]] =
    Option(d.get(key)).map { arr =>
      arr.asInstanceOf[java.util.Collection[GenericRecord]].asScala.map { r =>
        val bb = r.get("value").asInstanceOf[java.nio.ByteBuffer].duplicate()
        val out = new Array[Byte](bb.remaining())
        bb.get(out)
        r.get("key").asInstanceOf[Int] -> out
      }.toMap
    }.getOrElse(Map.empty)

  /** Live files surviving pruning, paired with their manifest schema,
    * plus the total live-file count (for skip accounting). Two pruning
    * legs, both conservative (a file is excluded only when PROVEN
    * row-free; anything missing always scans):
    *   - column BOUNDS (spec fields 125/128) against the predicate,
    *   - PARTITION values mapped through the spec's transforms: a
    *     predicate on a SOURCE column prunes by the file's partition
    *     value — equality through any transform, ranges through the
    *     monotone ones (identity/truncate/day/month/year/hour; bucket
    *     scrambles order, so it prunes equality only). This is the
    *     HIDDEN-partitioning payoff: the query names `ts >= X` and the
    *     `day(ts)`-keyed layout answers with ~1/N of the files. */
  private def pruneFiles(spark: SparkSession, meta: TableMeta,
                         preds: Seq[Pred])
      : (Seq[(String, String)], Int) = {
    val byName = topFields(meta.schemaNode).map(f2 => f2._2 -> f2).toMap
    val resolved = preds.map { p =>
      val (id, _, dt, _) = byName.getOrElse(p.col,
        sys.error(s"predicate column ${p.col} not in the table schema"))
      (p, id, dt)
    }
    // predicate → (partition field, result type, transformed value,
    // monotone?) for every spec field derived from the predicate
    // column — computed PER SPEC GENERATION: after spec evolution each
    // manifest prunes through the spec its files were written under,
    // so a ranged/keyed read prunes correctly across generations
    val partPredsBySpec = meta.specs.map { case (specId, spec) =>
      specId -> resolved.flatMap { case (p, _, dt) =>
        spec.filter(_.sourceCol == p.col).map { pf =>
          val rt = IcebergTransforms.resultType(pf.transform, dt)
          (p, pf.name, rt,
            predValues(p).map(
              IcebergTransforms.applyValue(pf.transform, dt, _)),
            IcebergTransforms.isMonotone(pf.transform))
        }
      }
    }.toMap
    // the Bloom leg: equality probes on bloom-filtered columns, loaded
    // LAZILY (only when an EqTo/AnyOf names a filtered column) and
    // cached per sidecar within this planning call — always
    // conservative (no filter for a (file, column) → the file scans)
    val eqPreds = resolved.collect {
      case (EqTo(_, v), id, _) => (id, Seq(v))
      case (AnyOf(_, vs), id, _) if vs.nonEmpty => (id, vs)
    }
    val bloomCache = mutable.HashMap
      .empty[String, Map[(String, Int),
        org.apache.spark.util.sketch.BloomFilter]]
    def manifestBlooms(m: MRef)
        : Map[(String, Int), org.apache.spark.util.sketch.BloomFilter] =
      // gate on the TABLE contract too: without declared bloom columns
      // no manifest has a sidecar header, and reading every manifest a
      // second time just to confirm that would double planning I/O on
      // exactly the high-file-count tables this leg exists for
      if (eqPreds.isEmpty || meta.bloomCols.isEmpty) Map.empty
      else manifestMetaString(spark, new Path(m.path), "bloom-paths")
        .toSeq.flatMap(_.split(',')).filter(_.nonEmpty)
        .map(p => bloomCache.getOrElseUpdate(p, loadBlooms(spark, Seq(p))))
        .foldLeft(Map.empty[(String, Int),
          org.apache.spark.util.sketch.BloomFilter])(_ ++ _)

    var total = 0
    val kept = meta.manifests.filter(_.content == 0).flatMap { m =>
      val partPreds = partPredsBySpec.getOrElse(m.specId, Nil)
      val blooms = manifestBlooms(m)
      val (recs, schemaJs) = readManifest(spark, new Path(m.path))
      recs.filter(_.get("status").asInstanceOf[Int] != 2).flatMap { e =>
        total += 1
        val d = e.get("data_file").asInstanceOf[GenericRecord]
        val lower = entryBounds(d, "lower_bounds")
        val upper = entryBounds(d, "upper_bounds")
        def lo(id: Int, dt: DataType) =
          lower.get(id).flatMap(boundValue(dt, _))
        def hi(id: Int, dt: DataType) =
          upper.get(id).flatMap(boundValue(dt, _))
        val excluded = resolved.exists {
          case (GtEq(_, v), id, dt) =>
            hi(id, dt).exists(u => cmpBound(dt, u, v) < 0)
          case (LtEq(_, v), id, dt) =>
            lo(id, dt).exists(l => cmpBound(dt, l, v) > 0)
          case (EqTo(_, v), id, dt) =>
            hi(id, dt).exists(u => cmpBound(dt, u, v) < 0) ||
              lo(id, dt).exists(l => cmpBound(dt, l, v) > 0)
          case (AnyOf(_, vs), id, dt) =>
            vs.nonEmpty && vs.forall(v =>
              hi(id, dt).exists(u => cmpBound(dt, u, v) < 0) ||
                lo(id, dt).exists(l => cmpBound(dt, l, v) > 0))
        }
        val part = d.get("partition").asInstanceOf[GenericRecord]
        def pv(name: String): Option[Any] =
          if (part.getSchema.getField(name) == null) None
          else Option(part.get(name)).map {
            case u: org.apache.avro.util.Utf8 => u.toString
            case x => x
          }
        val excludedByPart = partPreds.exists {
          case (pred, name, rt, tvs, monotone) =>
            pv(name).exists { pval =>
              pred match {
                case EqTo(_, _) => cmpBound(rt, pval, tvs.head) != 0
                case AnyOf(_, _) => tvs.nonEmpty &&
                  tvs.forall(tv => cmpBound(rt, pval, tv) != 0)
                case GtEq(_, _) if monotone => cmpBound(rt, pval, tvs.head) < 0
                case LtEq(_, _) if monotone => cmpBound(rt, pval, tvs.head) > 0
                case _ => false
              }
            }
        }
        val fp = d.get("file_path").toString
        val excludedByBloom = blooms.nonEmpty && eqPreds.exists {
          case (id, vs) =>
            blooms.get((fp, id))
              .exists(bf => vs.forall(v => !bloomMightContain(bf, v)))
        }
        if (excluded || excludedByPart || excludedByBloom) None
        else Some(fp -> schemaJs)
      }
    }
    (kept, total)
  }

  private def predValues(p: Pred): Seq[Any] = p match {
    case GtEq(_, v) => Seq(v)
    case LtEq(_, v) => Seq(v)
    case EqTo(_, v) => Seq(v)
    case AnyOf(_, vs) => vs
  }

  /** [[readTable]] with manifest-bounds FILE SKIPPING: only files whose
    * recorded column bounds may satisfy every predicate are scanned —
    * the scan-planning move that makes a time/key-ranged query on a
    * 100 TB table read its slice instead of the table. The returned
    * frame still contains every row of the surviving files; apply the
    * real filter on top (pruning is a superset guarantee). An empty
    * surviving set returns an empty frame of the declared schema. */
  def readTableWhere(spark: SparkSession, tableDir: String,
                     preds: Seq[Pred],
                     snapshotId: Option[Long] = None): DataFrame = {
    val meta = readMeta(spark, tableDir, snapshotId)
    val (files, _) = pruneFiles(spark, meta, preds)
    if (files.isEmpty)
      spark.createDataFrame(new java.util.ArrayList[org.apache.spark.sql.Row](),
        declaredSchema(meta))
    else applyDeletes(spark, meta, readRaw(spark, meta, files))
      .drop("__file", "__pos")
  }

  /** (files surviving pruning, total live files) for the predicate set —
    * the skip-accounting diagnostic tests and audits read. */
  def scanFileCount(spark: SparkSession, tableDir: String,
                    preds: Seq[Pred]): (Int, Int) = {
    val meta = readMeta(spark, tableDir)
    val (files, total) = pruneFiles(spark, meta, preds)
    (files.size, total)
  }

  /** Live row count of the current snapshot from manifest-list
    * accounting alone (no data read) — the stats hint the SQL scan
    * node reports to the optimizer. */
  def tableRowCount(spark: SparkSession, tableDir: String): Long =
    readMeta(spark, tableDir).manifests.filter(_.content == 0)
      .map(_.totalRows).sum

  /** One request of the metadata-aggregate pushdown: a bare row count,
    * or the MIN/MAX of a named column. */
  sealed trait MetaAgg
  case object MetaCount extends MetaAgg
  final case class MetaMinMax(col: String, wantMax: Boolean) extends MetaAgg

  /** Answer a WHOLE pushed aggregation from ONE metadata snapshot —
    * `readMeta` once, each manifest read once, every expression
    * answered from the same state. (Answering each expression with an
    * independent metadata read could return a row mixing two snapshots
    * under a concurrent commit — a torn read the scan path, which pins
    * one snapshot at planning, can never produce.) Refuses (None)
    * wholesale when ANY expression is unanswerable:
    *
    *  - any outstanding MOR delete manifest (counts would overcount,
    *    bounds could name deleted rows);
    *  - MIN/MAX on a column that is not int/long/date/timestamp —
    *    strings refuse structurally (stored bounds are 17-code-point
    *    truncations: a prefix of the min, not the min), floats refuse
    *    (NaN / -0.0 aggregate-order hazards); temporal types are exact
    *    because their bounds serialize as the same integral physical
    *    values their ordering is defined on;
    *  - any live non-empty data file missing a recorded bound for a
    *    requested column (indistinguishable from a pre-bounds file, so
    *    its rows could fall outside the answer).
    *
    * Returned values align with `reqs`: counts as Long, MIN/MAX as the
    * Catalyst-internal value (date = days int, timestamp = micros
    * long), null for a provably-empty table (SQL NULL aggregate). */
  def exactAggsFromMetadata(spark: SparkSession, tableDir: String,
                            reqs: Seq[MetaAgg]): Option[Seq[Any]] = {
    if (reqs.isEmpty) return None
    val meta = readMeta(spark, tableDir)
    if (meta.manifests.exists(_.content != 0)) return None
    val fields = topFields(meta.schemaNode)
    // resolve every MIN/MAX up front (cheap refusals before any
    // manifest I/O)
    val minMax = reqs.collect { case MetaMinMax(col, wantMax) =>
      val (fieldId, _, dt, _) = fields.find(_._2 == col)
        .getOrElse(return None)
      if (dt != IntegerType && dt != LongType &&
          dt != DateType && dt != TimestampType) return None
      (col, wantMax, fieldId, dt)
    }
    val best = mutable.HashMap.empty[(String, Boolean), Any]
    if (minMax.nonEmpty) meta.manifests.foreach { m =>
      val (recs, _) = readManifest(spark, new Path(m.path))
      recs.filter(_.get("status").asInstanceOf[Int] != 2).foreach { e =>
        val d = e.get("data_file").asInstanceOf[GenericRecord]
        // zero-row files (possible via overwrite edge cases) carry no
        // bounds and contribute no rows — skip, not refuse
        if (d.get("record_count").asInstanceOf[Long] > 0L) {
          val lower = entryBounds(d, "lower_bounds")
          val upper = entryBounds(d, "upper_bounds")
          minMax.foreach { case (col, wantMax, fieldId, dt) =>
            (if (wantMax) upper else lower).get(fieldId)
              .flatMap(boundValue(dt, _)) match {
              case None => return None // unprovable: file without bounds
              case Some(v) =>
                val k = (col, wantMax)
                if (best.get(k).forall(b =>
                      if (wantMax) cmpBound(dt, v, b) > 0
                      else cmpBound(dt, v, b) < 0)) best(k) = v
            }
          }
        }
      }
    }
    Some(reqs.map {
      case MetaCount => meta.manifests.map(_.totalRows).sum
      case MetaMinMax(col, wantMax) => best.get((col, wantMax)).orNull
    })
  }

  /** Live row count when PROVABLE from metadata alone — see
    * [[exactAggsFromMetadata]]. */
  def exactRowCountFromMetadata(spark: SparkSession,
                                tableDir: String): Option[Long] =
    exactAggsFromMetadata(spark, tableDir, Seq(MetaCount))
      .map(_.head.asInstanceOf[Long])

  /** Exact MIN/MAX of one column when PROVABLE from metadata alone —
    * see [[exactAggsFromMetadata]]. `Some(None)` = provably empty
    * table (SQL NULL aggregate). */
  def exactMinMaxFromMetadata(spark: SparkSession, tableDir: String,
                              colName: String, wantMax: Boolean)
      : Option[Option[Any]] =
    exactAggsFromMetadata(spark, tableDir,
      Seq(MetaMinMax(colName, wantMax))).map(vs => Option(vs.head))

  // ---- schema evolution (v1-legal, metadata-only commits) ----------------
  //
  // Evolution changes METADATA only — no snapshot, no data rewrite
  // (the Iceberg contract). Field ids are the identity: adds allocate
  // NEW ids above last-column-id, rename/widen keep the id, and the
  // reader projects every data file through its write-time schema's
  // id→name mapping, so files from before the evolution read correctly
  // (NULL for added fields, old name for renamed, cast for widened).
  // Top-level columns only; partition columns cannot be renamed or
  // widened in this subset (loud error) — their names anchor the
  // partition directory layout.

  /** Add a nullable column at the end of the schema. The field (and any
    * nested members) take fresh ids above last-column-id; files written
    * before the evolution read NULL for it. */
  def addColumn(spark: SparkSession, tableDir: String, name: String,
                dataType: DataType): Unit = {
    val meta = readMeta(spark, tableDir)
    require(!topFields(meta.schemaNode).exists(_._2 == name),
      s"column $name already exists")
    var id = meta.lastColumnId
    val nextId = () => { id += 1; id }
    val fieldId = nextId()
    val fieldJson = s"""{"id": $fieldId, "name": ${q(name)},
      "required": false, "type": ${icebergTypeJson(dataType, nextId)}}"""
    val om = new com.fasterxml.jackson.databind.ObjectMapper()
    val schema = meta.schemaNode.deepCopy()
      .asInstanceOf[com.fasterxml.jackson.databind.node.ObjectNode]
    schema.withArray("fields").add(om.readTree(fieldJson))
    commitEvolution(spark, tableDir, meta, schema, id)
  }

  /** Rename a column; its field id (and every data file) is unchanged —
    * old files keep resolving through the id. */
  def renameColumn(spark: SparkSession, tableDir: String,
                   from: String, to: String): Unit = {
    val meta = readMeta(spark, tableDir)
    require(!meta.partitionSpec.exists(_.sourceCol == from),
      s"renaming partition source column $from is not supported " +
        "(partition directory layout and spec are keyed by it)")
    require(!topFields(meta.schemaNode).exists(_._2 == to),
      s"column $to already exists")
    val schema = meta.schemaNode.deepCopy()
      .asInstanceOf[com.fasterxml.jackson.databind.node.ObjectNode]
    val field = schema.withArray("fields").elements().asScala
      .find(_.get("name").asText() == from)
      .getOrElse(sys.error(s"column $from not found"))
      .asInstanceOf[com.fasterxml.jackson.databind.node.ObjectNode]
    field.put("name", to)
    commitEvolution(spark, tableDir, meta, schema, meta.lastColumnId)
  }

  /** Widen a column's type along a v1-legal promotion (int→long,
    * float→double, decimal(p,s)→decimal(p',s) with p'≥p); the field id
    * is unchanged and old files are cast at read. */
  def widenColumn(spark: SparkSession, tableDir: String,
                  name: String, to: DataType): Unit = {
    val meta = readMeta(spark, tableDir)
    require(!meta.partitionSpec.exists(_.sourceCol == name),
      s"widening partition source column $name is not supported")
    val schema = meta.schemaNode.deepCopy()
      .asInstanceOf[com.fasterxml.jackson.databind.node.ObjectNode]
    val field = schema.withArray("fields").elements().asScala
      .find(_.get("name").asText() == name)
      .getOrElse(sys.error(s"column $name not found"))
      .asInstanceOf[com.fasterxml.jackson.databind.node.ObjectNode]
    val from = sparkType(field.get("type"))
    val legal = (from, to) match {
      case (IntegerType, LongType) => true
      case (FloatType, DoubleType) => true
      case (f: DecimalType, t: DecimalType) =>
        t.scale == f.scale && t.precision >= f.precision
      case _ => false
    }
    require(legal, s"illegal type promotion ${from.catalogString} → " +
      s"${to.catalogString} (v1 allows int→long, float→double, " +
      "decimal precision widening)")
    field.put("type", icebergType(to))
    commitEvolution(spark, tableDir, meta, schema, meta.lastColumnId)
  }

  /** Commit an evolved schema: next metadata version, snapshot log and
    * current pointer untouched. */
  private def commitEvolution(spark: SparkSession, tableDir: String,
                              meta: TableMeta,
                              schema: com.fasterxml.jackson.databind.JsonNode,
                              lastColumnId: Int): Unit = {
    val root = new Path(tableDir)
    // sort order and bloom columns are held as NAMES; a rename changes
    // the name, so route old-name → field-id (old schema) → new-name
    val oldIds = topFields(meta.schemaNode).map(f2 => f2._2 -> f2._1).toMap
    val newNames = topFields(schema).map(f2 => f2._1 -> f2._2).toMap
    val sortCols = meta.sortOrderCols.map(c => newNames(oldIds(c)))
    val props = meta.props.map {
      case (BloomColsProp, v) => BloomColsProp ->
        v.split(',').filter(_.nonEmpty)
          .map(c => newNames(oldIds(c))).mkString(",")
      case kv => kv
    }
    writeMetadata(spark, root, meta.version + 1, schema.toString,
      lastColumnId, meta.specs, meta.defaultSpecId,
      meta.currentSnapshotId, meta.snapshots,
      sortCols, meta.refs, props, meta.snapshotTs, meta.snapshotLog)
  }

  /** PARTITION-SPEC evolution — the metadata-only commit that changes
    * how FUTURE writes are keyed (day→hour as volume grows, adding a
    * bucket dimension for a hot key) without touching a byte of data:
    * the new spec is appended to `partition-specs` under a fresh
    * spec-id and becomes `default-spec-id`. Existing files stay under
    * the spec they were written with (each manifest records its
    * `partition_spec_id`); readers resolve every manifest through ITS
    * spec, scan planning prunes each generation through its own
    * partition shape, and maintenance rewrites ([[compact]],
    * [[compactSmallFiles]], [[deleteWhere]]) re-key rewritten files
    * through the NEW spec while carrying untouched ones unchanged —
    * the Iceberg spec-evolution contract. Appends after this call must
    * pass the NEW `partitionBy`. Items use [[createTable]]'s transform
    * syntax; the new spec must differ from the current default. */
  def evolveSpec(spark: SparkSession, tableDir: String,
                 partitionBy: Seq[String]): Int = {
    val meta = readMeta(spark, tableDir)
    val newSpec = partitionBy.map(IcebergTransforms.parse)
    require(newSpec != meta.partitionSpec,
      s"new spec ${newSpec.map(renderSpec)} is already the default")
    val declared = declaredSchema(meta)
    // the same write-time gates appendSnapshot would hit, but at
    // evolution time: transforms resolve against the CURRENT schema,
    // derived field names must not shadow data columns
    typedSpec(newSpec, declared)
    newSpec.filter(_.transform != "identity").foreach { pf =>
      require(!declared.fieldNames.contains(pf.name),
        s"partition field ${pf.name} collides with a data column")
    }
    require(newSpec.map(_.name).distinct.size == newSpec.size,
      "duplicate partition field names in the new spec")
    val newId = meta.specs.map(_._1).max + 1
    writeMetadata(spark, new Path(tableDir), meta.version + 1,
      meta.schemaJs, meta.lastColumnId,
      meta.specs :+ (newId -> newSpec), newId,
      meta.currentSnapshotId, meta.snapshots,
      meta.sortOrderCols, meta.refs, meta.props,
      meta.snapshotTs, meta.snapshotLog)
    newId
  }

  /** The current default partition spec, rendered in [[createTable]]'s
    * transform syntax (what appends must pass as `partitionBy`). */
  def tablePartitionSpec(spark: SparkSession, tableDir: String): Seq[String] =
    readMeta(spark, tableDir).partitionSpec.map(renderSpec)

  /** Snapshot ids, oldest first — the time-travel surface. */
  def snapshotIds(spark: SparkSession, tableDir: String): Seq[Long] =
    readMeta(spark, tableDir).snapshots.map(_._1)

  /** AS OF TIMESTAMP time travel (r14): read the table as of a
    * wall-clock instant — the snapshot-log's LATEST entry at-or-before
    * `timestampMs` (the log records every change of main's head:
    * commits, fast-forward publishes, rollbacks — so a rollback
    * correctly makes later reads resolve to the RESTORED head). An
    * instant before the table existed refuses by name; an instant past
    * the last change reads the current head. Tables written before the
    * log existed fall back to commit timestamps along main's lineage
    * (conservative, same at-or-before rule). */
  def readTableAsOf(spark: SparkSession, tableDir: String,
                    timestampMs: Long): DataFrame =
    readTable(spark, tableDir, Some(snapshotIdAsOf(spark, tableDir, timestampMs)))

  /** The snapshot id a wall-clock instant resolves to (the
    * [[readTableAsOf]] rule, shared with the SQL `TIMESTAMP AS OF`
    * route). */
  def snapshotIdAsOf(spark: SparkSession, tableDir: String,
                     timestampMs: Long): Long = {
    val meta = readMeta(spark, tableDir)
    val log =
      if (meta.snapshotLog.nonEmpty) meta.snapshotLog
      else {
        // legacy fallback: main-lineage ancestors by commit timestamp
        val parentOf = parentMap(meta)
        val onMain = Iterator.iterate(meta.refs("main")._1)(
            id => parentOf.getOrElse(id, 0L))
          .takeWhile(_ > 0L).toSeq.toSet
        meta.snapshots.map(_._1).filter(onMain)
          .flatMap(id => meta.snapshotTs.get(id).map(ts => (ts, id)))
      }
    val at = log.filter(_._1 <= timestampMs)
    require(at.nonEmpty,
      s"no snapshot as of $timestampMs (earliest known change: " +
        s"${log.map(_._1).minOption.getOrElse(-1L)})")
    // the log is append-ordered: same-millisecond changes resolve to
    // the latest APPLIED one, not an arbitrary max
    at.last._2
  }

  // ---- refs: branches, tags, write-audit-publish ---------------------------

  /** Named refs: name → (snapshot id, "branch"|"tag"). `main` is always
    * present. */
  def tableRefs(spark: SparkSession, tableDir: String): Map[String, (Long, String)] =
    readMeta(spark, tableDir).refs

  /** Read the table at a named ref (branch head or tag). */
  def readTableRef(spark: SparkSession, tableDir: String,
                   ref: String): DataFrame = {
    val meta = readMeta(spark, tableDir)
    val (id, _) = meta.refs.getOrElse(ref, sys.error(
      s"unknown ref $ref (have ${meta.refs.keys.toSeq.sorted.mkString(", ")})"))
    readTable(spark, tableDir, Some(id))
  }

  private def commitRefs(spark: SparkSession, tableDir: String,
                         meta: TableMeta,
                         refs: Map[String, (Long, String)],
                         mainHead: Long): Unit = {
    // fastForward/rollback MOVE main's head: that is a history event
    // (the snapshot-log records every change of the current pointer)
    val log =
      if (mainHead != meta.refs("main")._1)
        meta.snapshotLog :+ ((System.currentTimeMillis(), mainHead))
      else meta.snapshotLog
    writeMetadata(spark, new Path(tableDir), meta.version + 1,
      meta.schemaJs, meta.lastColumnId,
      meta.specs, meta.defaultSpecId, mainHead,
      meta.snapshots, meta.sortOrderCols, refs, meta.props,
      meta.snapshotTs, log)
  }

  private def makeRef(spark: SparkSession, tableDir: String, name: String,
                      at: Option[Long], kind: String): Unit = {
    require(name != "main", "main is the table itself")
    val meta = readMeta(spark, tableDir)
    require(!meta.refs.contains(name), s"ref $name already exists")
    val id = at.getOrElse(meta.currentSnapshotId)
    require(meta.snapshots.exists(_._1 == id),
      s"snapshot $id not found (have ${meta.snapshots.map(_._1)})")
    commitRefs(spark, tableDir, meta, meta.refs + (name -> (id, kind)),
      meta.currentSnapshotId)
  }

  /** Create a BRANCH at a snapshot (default: current main head) — the
    * staging leg of write-audit-publish: `appendSnapshot(toBranch =
    * name)` / `sink(toBranch = name)` stack commits on it without
    * touching what main's readers see, and [[fastForward]] publishes. */
  def createBranch(spark: SparkSession, tableDir: String, name: String,
                   at: Option[Long] = None): Unit =
    makeRef(spark, tableDir, name, at, "branch")

  /** Create an immutable TAG at a snapshot (default: current main
    * head) — a named time-travel point ("training-run-17 read THIS")
    * that [[expireSnapshots]] will never purge. */
  def createTag(spark: SparkSession, tableDir: String, name: String,
                at: Option[Long] = None): Unit =
    makeRef(spark, tableDir, name, at, "tag")

  /** Drop a ref (the pointer only — snapshots stay until expiry). */
  def dropRef(spark: SparkSession, tableDir: String, name: String): Unit = {
    require(name != "main", "cannot drop main")
    val meta = readMeta(spark, tableDir)
    require(meta.refs.contains(name), s"unknown ref $name")
    commitRefs(spark, tableDir, meta, meta.refs - name,
      meta.currentSnapshotId)
  }

  /** PUBLISH: fast-forward `toBranch` to `fromRef`'s head. Requires the
    * target's head to be an ANCESTOR of the source head (walked through
    * each snapshot's recorded parent) — a diverged target refuses, the
    * git discipline. Fast-forwarding `main` is the write-audit-publish
    * commit: main's readers see every staged snapshot atomically. */
  def fastForward(spark: SparkSession, tableDir: String,
                  toBranch: String, fromRef: String): Unit = {
    val meta = readMeta(spark, tableDir)
    val (fromHead, _) = meta.refs.getOrElse(fromRef,
      sys.error(s"unknown ref $fromRef"))
    val (toHead, toType) = meta.refs.getOrElse(toBranch,
      sys.error(s"unknown ref $toBranch"))
    require(toType == "branch", s"cannot fast-forward tag $toBranch")
    if (fromHead == toHead) return
    require(isAncestor(parentMap(meta), toHead, fromHead),
      s"$toBranch (head $toHead) is not an ancestor of $fromRef " +
        s"(head $fromHead) — not a fast-forward")
    commitRefs(spark, tableDir, meta,
      meta.refs + (toBranch -> (fromHead, "branch")),
      if (toBranch == "main") fromHead else meta.currentSnapshotId)
  }

  /** snapshot id → its recorded parent (graft-parent; id-1 for pre-
    * ancestry metadata) — the primitive behind fastForward, rollback
    * and the lineage-aware incremental/changelog scans. */
  private def parentMap(meta: TableMeta): Map[Long, Long] = {
    val om = new com.fasterxml.jackson.databind.ObjectMapper()
    meta.snapshots.map { case (id, _, summary) =>
      id -> Option(om.readTree(summary).get("graft-parent"))
        .map(_.asLong()).getOrElse(id - 1)
    }.toMap
  }

  /** Walk `descendant`'s recorded parents down to `ancestor` (0 = the
    * empty table). Ids are globally monotone, so the walk is bounded. */
  private def isAncestor(parentOf: Map[Long, Long], ancestor: Long,
                         descendant: Long): Boolean = {
    var cur = descendant
    while (cur > ancestor) cur = parentOf.getOrElse(cur, 0L)
    cur == ancestor
  }

  /** The ids on the CURRENT lineage in `(fromExclusive, head]`, oldest
    * first — a rollback or a staging branch leaves RETAINED snapshots
    * that are NOT ancestors of the head, and no incremental consumer
    * should ever see them. Refuses when `fromExclusive` itself is not
    * on the lineage (nothing meaningful to resume from) or when the
    * walk crosses an expired snapshot. */
  private def lineageRange(meta: TableMeta, fromExclusive: Long)
      : Seq[Long] = {
    val parentOf = parentMap(meta)
    val retained = meta.snapshots.map(_._1).toSet
    val ids = scala.collection.mutable.ArrayBuffer.empty[Long]
    var cur = meta.currentSnapshotId
    while (cur > fromExclusive) {
      require(retained.contains(cur),
        s"range ($fromExclusive, ${meta.currentSnapshotId}] spans the " +
          s"expired snapshot $cur (retained: " +
          s"${meta.snapshots.map(_._1).mkString(", ")})")
      ids += cur
      cur = parentOf.getOrElse(cur, 0L)
    }
    require(cur == fromExclusive || fromExclusive == 0L,
      s"snapshot $fromExclusive is not on the current lineage of head " +
        s"${meta.currentSnapshotId} (a rollback moved past it) — " +
        "resume from a lineage snapshot or resync from 0")
    ids.reverse.toSeq
  }

  /** ROLLBACK: move main's head (and the table's current snapshot)
    * back to an ANCESTOR — the operational undo for a bad commit.
    * Metadata-only (one version flip, the fastForward primitive run
    * backwards): no data file moves, the rolled-back snapshots stay
    * retained for time travel / forensics until [[expireSnapshots]],
    * and the next append stacks on the restored head (its recorded
    * parent is the rollback target, so ancestry walks stay sound —
    * the abandoned commits become a dead branch nothing points at).
    * Rolling back to a non-ancestor (a staging branch's head) refuses:
    * that is [[fastForward]]'s job, not an undo. Incremental/changelog
    * consumers never see rolled-back rows (the restored head's
    * manifest list simply does not contain them). */
  def rollbackTo(spark: SparkSession, tableDir: String,
                 snapshotId: Long): Unit = {
    val meta = readMeta(spark, tableDir)
    require(meta.snapshots.exists(_._1 == snapshotId),
      s"unknown snapshot $snapshotId " +
        s"(retained: ${meta.snapshots.map(_._1).mkString(", ")})")
    if (snapshotId == meta.currentSnapshotId) return
    require(isAncestor(parentMap(meta), snapshotId, meta.currentSnapshotId),
      s"snapshot $snapshotId is not an ancestor of main's head " +
        s"${meta.currentSnapshotId} — cannot roll back to it")
    commitRefs(spark, tableDir, meta,
      meta.refs + ("main" -> (snapshotId, "branch")), snapshotId)
  }

  /** The table's persisted default sort order (identity columns; empty
    * = unsorted) — the clustering contract [[appendSnapshot]]/[[sink]]
    * apply when the caller names no sortBy. */
  /** The persisted Bloom-column contract (table property) — the third
    * leg of the clustering contract next to the partition spec and the
    * sort order. */
  def tableBloomCols(spark: SparkSession, tableDir: String): Seq[String] =
    readMeta(spark, tableDir).bloomCols

  def tableSortOrder(spark: SparkSession, tableDir: String): Seq[String] =
    readMeta(spark, tableDir).sortOrderCols

  /** The table's declared schema (from the metadata json, not from any
    * data file — the schema-as-contract Iceberg property). */
  def tableSchema(spark: SparkSession, tableDir: String): StructType =
    StructType(readMeta(spark, tableDir).schemaNode.get("fields")
      .elements().asScala.map(f =>
        StructField(f.get("name").asText(), sparkType(f.get("type")),
          !f.get("required").asBoolean())).toSeq)

  // ---- metadata tables (the operational surface) --------------------------

  /** Iceberg-style METADATA TABLES — the `table$snapshots` /
    * `table$manifests` / `table$files` / `table$partitions` operational
    * surface every lakehouse user queries to answer "what happened to
    * this table and what does it physically look like": commit log with
    * operations and exactly-once commit keys, the current snapshot's
    * manifest inventory, the live file set with row counts / sizes /
    * provenance, and per-partition physical stats. All of it derives
    * from the KB-scale driver-side metadata chain (json + avro) — no
    * data file is opened, which is what keeps these queries instant on
    * a 100 TB table. `snapshotId` time-travels the manifest-backed
    * kinds; `snapshots` always shows the full retained log. */
  def metaTable(spark: SparkSession, tableDir: String, kind: String,
                snapshotId: Option[Long] = None): DataFrame = {
    import org.apache.spark.sql.Row
    val meta = readMeta(spark, tableDir, snapshotId)
    val om = new com.fasterxml.jackson.databind.ObjectMapper()
    def frame(schema: StructType, rows: Seq[Row]): DataFrame =
      spark.createDataFrame(rows.asJava, schema)
    kind match {
      case "snapshots" =>
        frame(StructType(Seq(
          StructField("snapshot_id", LongType, nullable = false),
          StructField("operation", StringType, nullable = false),
          StructField("commit_key", StringType, nullable = true),
          StructField("manifest_list", StringType, nullable = false),
          StructField("committed_at", LongType, nullable = true),
          StructField("added_data_files", LongType, nullable = true),
          StructField("added_records", LongType, nullable = true),
          StructField("total_records", LongType, nullable = true))),
          meta.snapshots.map { case (id, listPath, summary) =>
            val node = om.readTree(summary)
            def metric(k: String): Any =
              Option(node.get(k)).map(v => v.asText().toLong).orNull
            Row(id, node.get("operation").asText(),
              Option(node.get("graft-commit-key")).map(_.asText()).orNull,
              listPath,
              meta.snapshotTs.get(id).map(Long.box).orNull,
              metric("added-data-files"), metric("added-records"),
              metric("total-records"))
          })
      case "manifests" =>
        frame(StructType(Seq(
          StructField("path", StringType, nullable = false),
          StructField("length", LongType, nullable = false),
          StructField("content", IntegerType, nullable = false),
          StructField("partition_spec_id", IntegerType, nullable = false),
          StructField("added_snapshot_id", LongType, nullable = false),
          StructField("added_data_files_count", IntegerType, nullable = false),
          StructField("added_rows_count", LongType, nullable = false))),
          meta.manifests.map(m =>
            Row(m.path, m.len, m.content, m.specId, m.addedBy, m.nFiles,
              m.nRows)))
      case "files" | "partitions" =>
        // live entries of the (possibly time-traveled) snapshot across
        // data AND delete manifests; partition values render as a
        // name→string map (transform-agnostic)
        val entries = meta.manifests.flatMap { m =>
          readManifest(spark, new Path(m.path))._1
            .filter(_.get("status").asInstanceOf[Int] != 2)
            .map { e =>
              val d = e.get("data_file").asInstanceOf[GenericRecord]
              val part = d.get("partition").asInstanceOf[GenericRecord]
              val partMap = part.getSchema.getFields.asScala.map { pf =>
                pf.name() -> Option(part.get(pf.name())).map(_.toString).orNull
              }.toMap
              (m.content, d.get("file_path").toString, partMap,
                d.get("record_count").asInstanceOf[Long],
                d.get("file_size_in_bytes").asInstanceOf[Long],
                e.get("snapshot_id").asInstanceOf[Long])
            }
        }
        if (kind == "files")
          frame(StructType(Seq(
            StructField("content", IntegerType, nullable = false),
            StructField("file_path", StringType, nullable = false),
            StructField("partition", MapType(StringType, StringType),
              nullable = false),
            StructField("record_count", LongType, nullable = false),
            StructField("file_size_in_bytes", LongType, nullable = false),
            StructField("added_snapshot_id", LongType, nullable = false))),
            entries.map(t => Row(t._1, t._2, t._3, t._4, t._5, t._6)))
        else
          frame(StructType(Seq(
            StructField("partition", MapType(StringType, StringType),
              nullable = false),
            StructField("n_files", LongType, nullable = false),
            StructField("record_count", LongType, nullable = false),
            StructField("total_bytes", LongType, nullable = false))),
            entries.filter(_._1 == 0).groupBy(_._3).toSeq.map {
              case (partMap, es) =>
                Row(partMap, es.size.toLong, es.map(_._4).sum,
                  es.map(_._5).sum)
            })
      case "refs" =>
        frame(StructType(Seq(
          StructField("name", StringType, nullable = false),
          StructField("type", StringType, nullable = false),
          StructField("snapshot_id", LongType, nullable = false))),
          meta.refs.toSeq.sortBy(_._1).map { case (n, (id, t)) =>
            Row(n, t, id)
          })
      case "history" =>
        // the Iceberg history table: every change of main's head, with
        // is_current_ancestor distinguishing the LIVE lineage from
        // rolled-back orphans (the log keeps both)
        val parentOf = parentMap(meta)
        val ancestors = Iterator.iterate(meta.refs("main")._1)(
            id => parentOf.getOrElse(id, 0L))
          .takeWhile(_ > 0L).toSeq.toSet
        frame(StructType(Seq(
          StructField("made_current_at", LongType, nullable = false),
          StructField("snapshot_id", LongType, nullable = false),
          StructField("is_current_ancestor", BooleanType, nullable = false))),
          meta.snapshotLog.map { case (ts, id) =>
            Row(ts, id, ancestors.contains(id))
          })
      case other => sys.error(
        s"unknown metadata table '$other' " +
          "(snapshots|manifests|files|partitions|refs|history)")
    }
  }

  // ---- incremental (snapshot-range) reads ---------------------------------

  /** INCREMENTAL append scan: the rows added by snapshots in
    * `(fromSnapshotExclusive, toSnapshotInclusive]` — the
    * change-capture surface a downstream consumer polls instead of
    * re-reading the table ("give me everything since the snapshot I
    * processed last"). Cost ∝ the new data, never the table: the file
    * set is the manifests ADDED in the range (KB-scale driver
    * arithmetic), so a 100 TB table with a 1 GB day hands the consumer
    * 1 GB. Every snapshot in the range must be an `append` (loud error
    * otherwise — after a rewrite or delete the per-row "is this new"
    * question has no manifest-level answer) and must still be retained
    * (expired history refuses). Rows carry `_added_snapshot_id`
    * provenance. Deletes never apply here: in-range appends postdate
    * any retained delete (sequence semantics), and delete operations
    * inside the range are refused. An empty range returns an empty
    * frame of the declared schema. */
  def readIncremental(spark: SparkSession, tableDir: String,
                      fromSnapshotExclusive: Long,
                      toSnapshot: Option[Long] = None): DataFrame = {
    import org.apache.spark.sql.functions.{broadcast, col}
    val meta = readMeta(spark, tableDir, toSnapshot)
    val to = meta.currentSnapshotId
    require(fromSnapshotExclusive >= 0 && fromSnapshotExclusive <= to,
      s"invalid incremental range ($fromSnapshotExclusive, $to]")
    // only LINEAGE snapshots count: a rollback's abandoned commits (or
    // a staging branch's) are retained in metadata but must neither
    // contribute rows nor trip the append-only check
    val lineage = lineageRange(meta, fromSnapshotExclusive).toSet
    val om = new com.fasterxml.jackson.databind.ObjectMapper()
    val inRange = meta.snapshots.filter(s2 => lineage.contains(s2._1))
    inRange.foreach { case (id, _, summary) =>
      val op = om.readTree(summary).get("operation").asText()
      require(op == "append",
        s"incremental read supports append-only ranges; snapshot $id " +
          s"is '$op' (read the table at a snapshot instead)")
    }
    val declared = declaredSchema(meta)
    val withProv = StructType(declared.fields :+
      StructField("_added_snapshot_id", LongType, nullable = false))
    if (inRange.isEmpty)
      return spark.createDataFrame(
        new java.util.ArrayList[org.apache.spark.sql.Row](), withProv)
    val files = meta.manifests
      .filter(m => m.content == 0 && m.addedBy > fromSnapshotExclusive)
      .flatMap { m =>
        val (recs, schemaJs) = readManifest(spark, new Path(m.path))
        recs.filter(e => e.get("status").asInstanceOf[Int] == 1 &&
            lineage.contains(e.get("snapshot_id").asInstanceOf[Long]))
          .map(e => (e.get("data_file").asInstanceOf[GenericRecord]
            .get("file_path").toString -> schemaJs,
            e.get("snapshot_id").asInstanceOf[Long]))
      }
    if (files.isEmpty)
      return spark.createDataFrame(
        new java.util.ArrayList[org.apache.spark.sql.Row](), withProv)
    val snapDf = spark.createDataFrame(
      files.map { case ((p, _), s2) => (p, s2) }).toDF("__fp", "__fsnap")
    readRaw(spark, meta, files.map(_._1))
      .join(broadcast(snapDf), col("__file") === col("__fp"))
      .drop("__file", "__pos", "__fp")
      .withColumnRenamed("__fsnap", "_added_snapshot_id")
  }

  /** CHANGELOG scan (CDC read): the row-level changes committed by
    * snapshots in `(fromSnapshotExclusive, toSnapshot]` as one frame
    * with `_change_type` ('insert' | 'delete') and
    * `_commit_snapshot_id` — the surface a downstream CDC consumer
    * polls to mirror upserts ("replay every change since the snapshot
    * I processed last"), generalizing [[readIncremental]] (appends
    * only) to ranges that contain merge-on-read deletes:
    *
    *  - `append` snapshots emit their new rows as inserts (manifest
    *    arithmetic names the files; cost ∝ the new data);
    *  - POSITION deletes ([[deleteWhereMOR]]) emit exactly the rows
    *    their delete files name — only the named data files are read
    *    and inner-joined on (file, pos), so cost ∝ the matches;
    *  - EQUALITY deletes ([[equalityDeleteMOR]]) emit the PRE-IMAGE
    *    rows the keys hit: the table as of the preceding snapshot
    *    (earlier deletes of both kinds already applied — a row deleted
    *    twice never emits twice) inner-joined on the key columns. This
    *    leg reads the pre-image's candidate files, the one changelog
    *    cost that is not ∝ the change — exactly the cost a real engine
    *    pays to resolve equality deletes to rows;
    *  - copy-on-write rewrites (`deleteWhere`, `compact`,
    *    `compactSmallFiles`) REFUSE BY NAME: after a rewrite the
    *    manifest level has no row-identity answer (an upsert written
    *    as delete+rewrite looks like a whole-file churn). CDC tables
    *    should maintain with MOR deletes and compact between
    *    changelog consumptions.
    *
    * An upsert batch (equality-delete + append at consecutive
    * snapshots) therefore reads back as delete-rows-then-insert-rows —
    * apply in `_commit_snapshot_id` order and the mirror converges.
    * Expired history refuses (the per-snapshot manifest lists are
    * gone). Empty ranges return an empty frame of the declared shape.
    */
  def readChangelog(spark: SparkSession, tableDir: String,
                    fromSnapshotExclusive: Long,
                    toSnapshot: Option[Long] = None): DataFrame = {
    import org.apache.spark.sql.functions.{col, lit}
    val metaTo = readMeta(spark, tableDir, toSnapshot)
    val to = metaTo.currentSnapshotId
    require(fromSnapshotExclusive >= 0 && fromSnapshotExclusive <= to,
      s"invalid changelog range ($fromSnapshotExclusive, $to]")
    // LINEAGE snapshots only (oldest first): a rollback's abandoned
    // commits are retained for time travel but are not changes any
    // consumer should replay — and their recorded parents, not numeric
    // adjacency, define each delete's pre-image
    val parentOf = parentMap(metaTo)
    val lineage = lineageRange(metaTo, fromSnapshotExclusive)
    val byId = metaTo.snapshots.map(s2 => s2._1 -> s2).toMap
    val inRange = lineage.map(byId)

    val declared = declaredSchema(metaTo)
    val outSchema = StructType(declared.fields ++ Seq(
      StructField("_change_type", StringType, nullable = false),
      StructField("_commit_snapshot_id", LongType, nullable = false)))
    def empty(): DataFrame = spark.createDataFrame(
      new java.util.ArrayList[org.apache.spark.sql.Row](), outSchema)
    if (inRange.isEmpty) return empty()

    val om = new com.fasterxml.jackson.databind.ObjectMapper()
    val dataEntries = liveFileEntries(spark, metaTo)
    val entrySnaps = dataFileSnapshots(spark, metaTo)

    val legs = inRange.map { case (sid, _, summary) =>
      val op = om.readTree(summary).get("operation").asText()
      val posManifests = metaTo.manifests
        .filter(m => m.content == 1 && m.addedBy == sid)
      val eqManifests = metaTo.manifests
        .filter(m => m.content == 2 && m.addedBy == sid)
      op match {
        case "append" =>
          val files = dataEntries.filter { case (p, _) =>
            entrySnaps.get(p).contains(sid)
          }
          if (files.isEmpty) empty()
          else readRaw(spark, metaTo, files).drop("__file", "__pos")
            .withColumn("_change_type", lit("insert"))
            .withColumn("_commit_snapshot_id", lit(sid))
        case "delete" =>
          require(posManifests.nonEmpty || eqManifests.nonEmpty,
            s"changelog: snapshot $sid is a copy-on-write delete (no " +
              "delete manifests) — no row-level change answer; maintain " +
              "CDC tables with deleteWhereMOR/equalityDeleteMOR")
          val posLeg: Option[DataFrame] = if (posManifests.isEmpty) None else {
            val delPaths = posManifests.flatMap { m =>
              readManifest(spark, new Path(m.path))._1
                .filter(_.get("status").asInstanceOf[Int] != 2)
                .map(_.get("data_file").asInstanceOf[GenericRecord]
                  .get("file_path").toString)
            }
            val dels = spark.read.parquet(delPaths: _*)
            val named = dels.select("file_path").distinct()
              .collect().map(_.getString(0)).toSet
            val files = dataEntries.filter(f => named.contains(f._1))
            if (files.isEmpty) None
            else Some(readRaw(spark, metaTo, files)
              .join(dels, col("__file") === col("file_path") &&
                col("__pos") === col("pos"))
              .drop("__file", "__pos", "file_path", "pos"))
          }
          val eqLeg: Option[DataFrame] = if (eqManifests.isEmpty) None else {
            // pre-image: the table as of this snapshot's RECORDED
            // parent (not numeric adjacency — a rollback or staging
            // branch can own the adjacent id), with every earlier
            // delete already applied
            val parentId = parentOf.getOrElse(sid, 0L)
            val metaPrevOpt =
              if (parentId == 0L) None
              else Some(readMeta(spark, tableDir, Some(parentId)))
            val prevFiles = metaPrevOpt
              .map(liveFileEntries(spark, _)).getOrElse(Nil)
            if (prevFiles.isEmpty) None
            else {
              val metaPrev = metaPrevOpt.get
              val pre = applyDeletes(spark, metaPrev,
                readRaw(spark, metaPrev, prevFiles)).drop("__file", "__pos")
              val hit = eqManifests.foldLeft(Option.empty[DataFrame]) {
                (acc, m) =>
                  val p = new Path(m.path)
                  val keyCols = manifestMetaString(spark, p, "equality-cols")
                    .getOrElse(sys.error(s"equality manifest ${m.path} " +
                      "has no equality-cols metadata")).split(",").toSeq
                  val keys = readManifest(spark, p)._1
                    .filter(_.get("status").asInstanceOf[Int] != 2)
                    .map(_.get("data_file").asInstanceOf[GenericRecord]
                      .get("file_path").toString)
                  val matched = pre.join(
                    spark.read.parquet(keys: _*).distinct(), keyCols)
                  Some(acc.map(_.unionByName(matched)).getOrElse(matched))
              }
              hit
            }
          }
          (posLeg.toSeq ++ eqLeg.toSeq) match {
            case Nil => empty()
            case dfs => dfs.reduce(_.unionByName(_))
              .withColumn("_change_type", lit("delete"))
              .withColumn("_commit_snapshot_id", lit(sid))
          }
        case other =>
          throw new IllegalArgumentException(
            s"changelog supports append and merge-on-read delete " +
              s"snapshots; snapshot $sid is '$other' (a copy-on-write " +
              "rewrite has no row-level change answer — maintain CDC " +
              "tables with MOR deletes and compact between consumptions)")
      }
    }
    legs.map(_.select(outSchema.fieldNames.map(col).toSeq: _*))
      .reduce(_.unionByName(_))
  }

  /** Incremental TABLE-TO-TABLE replication — the downstream-sync shape
    * ("mirror the curated table into the serving region, only what's
    * new"): append every source snapshot newer than what the
    * destination has consumed, one destination commit per source
    * snapshot. The consumed watermark IS the destination's commit-key
    * log (`sync-<source snapshot>`), so replication is exactly-once
    * with NO side state: resumable after any crash, idempotent under
    * re-runs, and cost ∝ the new data (the source file set is manifest
    * arithmetic). Appends-only, per [[readIncremental]]'s contract — a
    * source rewrite/delete requires a full resync, loudly. The first
    * sync creates the destination (`partitionBy`/`sortBy` apply then;
    * later syncs inherit the destination's own contracts). Returns rows
    * copied. */
  /** CDC TABLE MIRROR via the changelog — the consumer side of
    * [[readChangelog]] and the delete-capable twin of
    * [[replicateIncremental]] (which refuses delete-bearing
    * histories): apply every change the source committed since the
    * last sync to the mirror, keyed on `keyCols`. Per source snapshot,
    * IN COMMIT ORDER: the delete rows become ONE equality delete on
    * the mirror's key columns, then the insert rows append — each leg
    * exactly-once through its own commit key (`cdc-<sid>-del` /
    * `cdc-<sid>-ins`), so a crash between the legs replays only the
    * missing one and re-running is always safe. The consumed watermark
    * is the mirror's own commit-key log (no side state); the first
    * sync creates the mirror (its first insert leg carries
    * `partitionBy`/`sortBy`). Source COW rewrites refuse through
    * [[readChangelog]]'s contract — a rewritten source needs a full
    * resync. Returns (rows deleted by key on the mirror, rows
    * inserted). */
  def syncViaChangelog(spark: SparkSession, srcDir: String, dstDir: String,
                       keyCols: Seq[String],
                       partitionBy: Seq[String] = Nil,
                       sortBy: Seq[String] = Nil): (Long, Long) = {
    import org.apache.spark.sql.functions.col
    require(keyCols.nonEmpty, "syncViaChangelog needs key columns")
    val om = new com.fasterxml.jackson.databind.ObjectMapper()
    val dstRoot = new Path(dstDir)
    val dstExists0 = fs(spark, dstRoot)
      .exists(new Path(dstRoot, "metadata/version-hint.text"))
    val CdcKey = "cdc-(\\d+)-(del|ins)".r
    val maxSeen: Long =
      if (!dstExists0) 0L
      else readMeta(spark, dstDir).snapshots.flatMap { case (_, _, summary) =>
        Option(om.readTree(summary).get("graft-commit-key"))
          .map(_.asText()).collect { case CdcKey(sid, _) => sid.toLong }
      }.foldLeft(0L)(math.max)
    val srcMeta = readMeta(spark, srcDir)
    val srcHead = srcMeta.currentSnapshotId
    // re-process maxSeen itself (a crash may have landed only one of
    // its legs; committed legs no-op on their commit keys), then
    // everything after it — the resume point is maxSeen's RECORDED
    // parent on the source lineage (numeric adjacency can name a
    // rolled-back orphan)
    val fromEx =
      if (maxSeen == 0L) 0L else parentMap(srcMeta).getOrElse(maxSeen, 0L)
    if (srcHead <= fromEx) return (0L, 0L)
    val log = readChangelog(spark, srcDir, fromEx).persist()
    try {
      var dstExists = dstExists0
      var dstMeta = if (dstExists0) Some(readMeta(spark, dstDir)) else None
      var nDel = 0L; var nIns = 0L
      val sids = log.select(col("_commit_snapshot_id")).distinct()
        .collect().map(_.getLong(0)).sorted // bounded: one per snapshot
      sids.foreach { sid =>
        val dels = log.filter(col("_commit_snapshot_id") === sid &&
            col("_change_type") === "delete")
          .select(keyCols.map(col): _*).distinct()
        if (!dels.isEmpty) {
          require(dstExists,
            "changelog has deletes before the mirror's first insert")
          nDel += equalityDeleteMOR(spark, dstDir, dels,
            commitKey = Some(s"cdc-$sid-del"))
        }
        val ins = log.filter(col("_commit_snapshot_id") === sid &&
            col("_change_type") === "insert")
          .drop("_change_type", "_commit_snapshot_id")
        if (!ins.isEmpty) {
          // pre-run mirror metadata decides replay; keys committed by
          // THIS run are for other sids, so the cached meta is enough
          val replayed = dstMeta.exists(hasCommitKey(_, s"cdc-$sid-ins"))
          if (!replayed) {
            appendSnapshot(spark, ins, dstDir,
              partitionBy =
                if (dstExists)
                  dstMeta.map(_.partitionSpec.map(renderSpec))
                    .getOrElse(partitionBy)
                else partitionBy,
              commitKey = Some(s"cdc-$sid-ins"),
              sortBy = if (dstExists) Nil else sortBy)
            nIns += ins.count()
            if (dstMeta.isEmpty) dstMeta = Some(readMeta(spark, dstDir))
          }
          dstExists = true
        }
      }
      (nDel, nIns)
    } finally log.unpersist()
  }

  def replicateIncremental(spark: SparkSession, srcDir: String,
                           dstDir: String,
                           partitionBy: Seq[String] = Nil,
                           sortBy: Seq[String] = Nil): Long = {
    import org.apache.spark.sql.functions.col
    val dstRoot = new Path(dstDir)
    val dstExists = fs(spark, dstRoot)
      .exists(new Path(dstRoot, "metadata/version-hint.text"))
    val consumed: Long =
      if (!dstExists) 0L
      else readMeta(spark, dstDir).snapshots.flatMap { case (_, _, summary) =>
        val om = new com.fasterxml.jackson.databind.ObjectMapper()
        Option(om.readTree(summary).get("graft-commit-key")).map(_.asText())
          .filter(_.startsWith("sync-")).map(_.stripPrefix("sync-").toLong)
      }.foldLeft(0L)(math.max)
    val srcHead = readMeta(spark, srcDir).currentSnapshotId
    if (srcHead <= consumed) return 0L
    val inc = readIncremental(spark, srcDir, consumed).persist()
    try {
      var copied = 0L
      // one destination commit per source snapshot: the replay unit is
      // a snapshot, so a crash mid-sync resumes at the next one
      ((consumed + 1) to srcHead).foreach { sid =>
        val batch = inc.filter(col("_added_snapshot_id") === sid)
          .drop("_added_snapshot_id")
        copied += batch.count()
        appendSnapshot(spark, batch, dstDir,
          partitionBy = if (dstExists || sid > consumed + 1) {
            val m = readMeta(spark, dstDir)
            m.partitionSpec.map(renderSpec)
          } else partitionBy,
          commitKey = Some(s"sync-$sid"), sortBy = sortBy)
      }
      copied
    } finally inc.unpersist()
  }
}
