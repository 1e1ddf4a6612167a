package graft.sources.v2

import java.util
import scala.collection.mutable
import scala.jdk.CollectionConverters._

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{FileStatus, Path}
import org.apache.parquet.example.data.Group
import org.apache.parquet.hadoop.ParquetFileReader
import org.apache.parquet.hadoop.example.GroupReadSupport
import org.apache.parquet.hadoop.util.HadoopInputFile
import org.apache.parquet.schema.{LogicalTypeAnnotation, MessageType}
import org.apache.parquet.schema.PrimitiveType.PrimitiveTypeName
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.sources
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** DataSourceV2 skeleton for the reference's live ES/REST sources
  * (SURVEY §4 source story; reference api_clients.py:231-280,645-950):
  * a file-backed stand-in whose READER enforces the pushed predicates —
  * the moving parts of a live connector (filter translation, projection
  * pushdown, partition planning) are real; only the transport is a
  * parquet file instead of HTTP.
  *
  * - `SupportsPushDownFilters`: Catalyst filters are translated to the
  *   EsQuery bool-AST vocabulary (term / range / match_phrase — exactly
  *   what api_clients.py:677-741 can express server-side); translatable
  *   ones are evaluated INSIDE the partition reader ("server-side"),
  *   untranslatable ones stay as Spark's residual.
  * - `SupportsPushDownRequiredColumns`: the pruned schema becomes the
  *   parquet requested-projection (`_source` in ES terms) — unreferenced
  *   columns are never materialized.
  * - Partition planning: one InputPartition per file; a production
  *   connector would split by row group / ES slice-scroll here.
  *
  * Usage: spark.read.format(classOf[EsTableProvider].getName)
  *   .load(dir) — supported column types: BIGINT, DOUBLE, STRING, BOOLEAN.
  */
class EsTableProvider extends TableProvider {
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    EsFileSource.inferSchema(options.get("path"))
  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: util.Map[String, String]): Table =
    new EsFileTable(properties.get("path"), schema)
  override def supportsExternalMetadata(): Boolean = true
}

private[v2] object EsFileSource {
  def conf = new Configuration()

  def listFiles(dir: String): Seq[FileStatus] = {
    val p = new Path(dir)
    val fs = p.getFileSystem(conf)
    val root = fs.getFileStatus(p)
    if (root.isFile) Seq(root)
    else fs.listStatus(p).toSeq
      .filter(f => f.isFile && f.getPath.getName.endsWith(".parquet"))
      .sortBy(_.getPath.toString)
  }

  def inferSchema(dir: String): StructType = {
    val first = listFiles(dir).headOption.getOrElse(
      throw new IllegalArgumentException(s"no parquet files under $dir"))
    val footer = ParquetFileReader.open(HadoopInputFile.fromPath(first.getPath, conf))
    try fromParquet(footer.getFileMetaData.getSchema)
    finally footer.close()
  }

  /** Minimal parquet→Spark type conversion for the supported types. */
  def fromParquet(m: MessageType): StructType = StructType(
    m.getFields.asScala.toSeq.map { f =>
      val p = f.asPrimitiveType()
      val dt = p.getPrimitiveTypeName match {
        case PrimitiveTypeName.INT64 => LongType
        case PrimitiveTypeName.DOUBLE => DoubleType
        case PrimitiveTypeName.BOOLEAN => BooleanType
        case PrimitiveTypeName.BINARY
          if p.getLogicalTypeAnnotation ==
            LogicalTypeAnnotation.stringType() => StringType
        case other =>
          throw new IllegalArgumentException(s"unsupported parquet type $other")
      }
      StructField(f.getName, dt)
    })

  /** Requested projection: select the fetch columns from the FILE's own
    * schema (parsed from the string carried in the partition — no footer
    * re-read) so repetition (required vs optional) is preserved —
    * declaring everything optional fails checkContains on required
    * columns. */
  def projectionFor(fileSchemaStr: String, fetch: StructType): MessageType = {
    val fileSchema =
      org.apache.parquet.schema.MessageTypeParser.parseMessageType(fileSchemaStr)
    new MessageType("spark_schema",
      fetch.fields.toSeq.map(f =>
        fileSchema.getType(fileSchema.getFieldIndex(f.name))): _*)
  }

  /** Can this filter run "server-side" (ES bool-query vocabulary)? */
  def translatable(f: sources.Filter): Boolean = f match {
    case _: sources.EqualTo | _: sources.GreaterThan |
         _: sources.GreaterThanOrEqual | _: sources.LessThan |
         _: sources.LessThanOrEqual | _: sources.StringContains |
         _: sources.In | _: sources.IsNotNull | _: sources.IsNull => true
    case sources.And(l, r) => translatable(l) && translatable(r)
    case sources.Or(l, r) => translatable(l) && translatable(r)
    case sources.Not(c) => translatable(c)
    case _ => false
  }

  /** Row-level evaluation of a pushed filter — the "server" executing the
    * bool query. Nulls follow SQL semantics (comparisons → false). */
  def eval(f: sources.Filter, row: String => Any): Boolean = f match {
    case sources.EqualTo(a, v) => cmp(row(a), v).contains(0)
    case sources.GreaterThan(a, v) => cmp(row(a), v).exists(_ > 0)
    case sources.GreaterThanOrEqual(a, v) => cmp(row(a), v).exists(_ >= 0)
    case sources.LessThan(a, v) => cmp(row(a), v).exists(_ < 0)
    case sources.LessThanOrEqual(a, v) => cmp(row(a), v).exists(_ <= 0)
    case sources.StringContains(a, v) => row(a) match {
      case s: String => s.contains(v); case _ => false
    }
    case sources.In(a, vs) => vs.exists(v => cmp(row(a), v).contains(0))
    case sources.IsNull(a) => row(a) == null
    case sources.IsNotNull(a) => row(a) != null
    case sources.And(l, r) => eval(l, row) && eval(r, row)
    case sources.Or(l, r) => eval(l, row) || eval(r, row)
    case sources.Not(c) => { // three-valued NOT: null comparisons stay false
      val childNullFree = c match {
        case sources.IsNull(_) | sources.IsNotNull(_) => true
        case _ => refs(c).forall(row(_) != null)
      }
      childNullFree && !eval(c, row)
    }
    case _ => false
  }

  private def refs(f: sources.Filter): Seq[String] = f.references.toSeq

  private def cmp(a: Any, b: Any): Option[Int] = (a, b) match {
    case (null, _) | (_, null) => None
    case (x: Long, y: Number) => Some(java.lang.Long.compare(x, y.longValue()))
    case (x: Double, y: Number) => Some(java.lang.Double.compare(x, y.doubleValue()))
    // UTF8String byte order = code-point order, matching Spark's own
    // string comparisons; Java String.compareTo is UTF-16 code-unit
    // order, which disagrees beyond the BMP (supplementary chars sort
    // below some BMP chars there) — and pushed filters are NOT
    // re-checked by Spark, so the orders must agree exactly.
    case (x: String, y) => Some(UTF8String.fromString(x)
      .compareTo(UTF8String.fromString(y.toString)))
    case (x: Boolean, y: Boolean) => Some(java.lang.Boolean.compare(x, y))
    case _ => None
  }
}

private[v2] class EsFileTable(path: String, schema: StructType)
    extends Table with SupportsRead {
  override def name(): String = s"es_file($path)"
  override def schema(): StructType = schema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new EsScanBuilder(path, schema)
}

/** One pushed aggregate: kind ∈ count_star | count | min | max. */
private[v2] case class AggSpec(kind: String, column: String)

private[v2] class EsScanBuilder(path: String, full: StructType)
    extends ScanBuilder with SupportsPushDownFilters
    with SupportsPushDownRequiredColumns with SupportsPushDownLimit
    with SupportsPushDownAggregates {
  private var required: StructType = full
  private var pushed: Array[sources.Filter] = Array.empty
  private var limit: Int = -1
  private var groupCols: Seq[String] = Nil
  private var aggs: Seq[AggSpec] = Nil
  private var aggPushed = false

  override def pushFilters(filters: Array[sources.Filter]): Array[sources.Filter] = {
    val (ok, residual) = filters.partition(EsFileSource.translatable)
    pushed = ok
    // Only the residual is re-evaluated by Spark; `ok` filters are
    // trusted as FULLY applied by this reader, so eval() must match
    // Spark's comparison semantics exactly (see cmp: UTF8String order).
    residual
  }
  override def pushedFilters(): Array[sources.Filter] = pushed

  override def pruneColumns(requiredSchema: StructType): Unit =
    required = requiredSchema

  /** ES `size` analog: each partition reader stops after `l` matching
    * rows. Partial — Spark keeps its global limit on top. Not honored
    * when an aggregation is pushed (partial agg rows must be complete). */
  override def pushLimit(l: Int): Boolean =
    if (aggPushed) false else { limit = l; true }
  override def isPartiallyPushed(): Boolean = true

  /** ES terms-aggregation analog: GROUP BY plain columns with
    * count(*)/count(col)/min/max runs inside the reader, which emits one
    * PARTIAL row per group per row group; Spark's final aggregate merges
    * them (supportCompletePushDown stays false). The reader's state is
    * bounded by group-key cardinality — exactly the contract of an ES
    * terms agg. */
  override def pushAggregation(agg: org.apache.spark.sql.connector.expressions.aggregate.Aggregation): Boolean = {
    import org.apache.spark.sql.connector.expressions.NamedReference
    import org.apache.spark.sql.connector.expressions.aggregate._
    def colOf(e: org.apache.spark.sql.connector.expressions.Expression): Option[String] =
      e match {
        case nr: NamedReference if nr.fieldNames.length == 1 =>
          Some(nr.fieldNames.head)
        case _ => None
      }
    val g = agg.groupByExpressions.toSeq.map(colOf)
    val a = agg.aggregateExpressions.toSeq.map {
      case _: CountStar => Some(AggSpec("count_star", ""))
      case c: Count if !c.isDistinct => colOf(c.column).map(AggSpec("count", _))
      case m: Min => colOf(m.column).map(AggSpec("min", _))
      case m: Max => colOf(m.column).map(AggSpec("max", _))
      case _ => None
    }
    if (g.exists(_.isEmpty) || a.exists(_.isEmpty) || a.isEmpty) false
    else {
      groupCols = g.flatten
      aggs = a.flatten
      aggPushed = true
      limit = -1 // a previously pushed limit cannot apply to partial rows
      true
    }
  }

  private def aggOutSchema: StructType = StructType(
    groupCols.map(c => full(c)) ++ aggs.zipWithIndex.map { case (a, i) =>
      a.kind match {
        case "count_star" | "count" => StructField(s"agg_$i", LongType, nullable = false)
        case _ => StructField(s"agg_$i", full(a.column).dataType)
      }
    })

  override def build(): Scan =
    if (aggPushed)
      new EsAggScan(path, full, aggOutSchema, pushed, groupCols, aggs)
    else new EsScan(path, full, required, pushed, limit)
}

private[v2] class EsScan(path: String, full: StructType, required: StructType,
    pushed: Array[sources.Filter], limit: Int = -1) extends Scan with Batch {
  override def readSchema(): StructType = required
  override def toBatch: Batch = this
  override def description(): String =
    s"EsFileScan pushed=[${pushed.mkString(", ")}] " +
      s"read=${required.catalogString}" +
      (if (limit >= 0) s" limit=$limit" else "")

  override def planInputPartitions(): Array[InputPartition] =
    EsScan.rowGroupPartitions(path)

  override def createReaderFactory(): PartitionReaderFactory = {
    // pushed filters may reference columns outside the projection — the
    // reader fetches (projection ∪ filter refs), emits the projection
    val filterCols = pushed.flatMap(_.references).distinct
      .filterNot(required.fieldNames.contains)
    val fetch = StructType(required.fields ++ filterCols.map(c => full(c)))
    EsReaderFactory(fetch, required, pushed, limit)
  }
}

private[v2] object EsScan {
  /** One partition per parquet ROW GROUP (a 100 TB table is a few files
    * of many row groups — file granularity would starve the cluster).
    * Ranges use the row-group midpoint rule, same as Spark's own reader:
    * a group belongs to the split containing its midpoint. The file's
    * parquet schema rides along in each partition so readers never
    * re-open the footer (one footer read per FILE, at planning). */
  def rowGroupPartitions(path: String): Array[InputPartition] =
    EsFileSource.listFiles(path).flatMap { f =>
      val footer = ParquetFileReader.open(
        HadoopInputFile.fromPath(f.getPath, EsFileSource.conf))
      try {
        val schemaStr = footer.getFileMetaData.getSchema.toString
        footer.getFooter.getBlocks.asScala.toSeq.map { b =>
          val mid = b.getStartingPos + b.getCompressedSize / 2
          EsInputPartition(f.getPath.toString, b.getStartingPos,
            math.max(mid + 1 - b.getStartingPos, 1L), schemaStr)
        }
      } finally footer.close()
    }.toArray
}

/** Scan variant with a pushed (partial) aggregation. */
private[v2] class EsAggScan(path: String, full: StructType,
    out: StructType, pushed: Array[sources.Filter],
    groupCols: Seq[String], aggs: Seq[AggSpec]) extends Scan with Batch {
  override def readSchema(): StructType = out
  override def toBatch: Batch = this
  override def description(): String =
    s"EsFileScan pushed=[${pushed.mkString(", ")}] " +
      s"group=[${groupCols.mkString(", ")}] " +
      s"aggs=[${aggs.map(a => s"${a.kind}(${a.column})").mkString(", ")}]"

  override def planInputPartitions(): Array[InputPartition] =
    EsScan.rowGroupPartitions(path)

  override def createReaderFactory(): PartitionReaderFactory = {
    val needed = (groupCols ++ aggs.map(_.column).filter(_.nonEmpty) ++
      pushed.toSeq.flatMap(_.references.toSeq)).distinct
    val fetch = StructType(needed.map(c => full(c)))
    EsAggReaderFactory(fetch, out, pushed, groupCols, aggs)
  }
}

private[v2] case class EsInputPartition(file: String, start: Long,
    length: Long, fileSchema: String) extends InputPartition

private[v2] case class EsReaderFactory(fetch: StructType, out: StructType,
    pushed: Array[sources.Filter], limit: Int) extends PartitionReaderFactory {
  override def createReader(p: InputPartition): PartitionReader[InternalRow] = {
    val ep = p.asInstanceOf[EsInputPartition]
    new EsPartitionReader(ep, fetch, out, pushed, limit)
  }
}

/** Cursor over the filter-matching rows of one row-group range: reads the
  * parquet Group API with a pruned requested-projection and applies the
  * pushed bool-query filters row by row. */
private[v2] class MatchingRows(part: EsInputPartition, fetch: StructType,
    pushed: Array[sources.Filter]) extends AutoCloseable {
  private val reader = {
    val c = EsFileSource.conf
    c.set(org.apache.parquet.hadoop.api.ReadSupport.PARQUET_READ_SCHEMA,
      EsFileSource.projectionFor(part.fileSchema, fetch).toString)
    org.apache.parquet.hadoop.ParquetReader
      .builder(new GroupReadSupport(), new Path(part.file)).withConf(c)
      .withFileRange(part.start, part.start + part.length)
      .build()
  }

  /** The next matching row as (column → value), or null when drained. */
  def nextMatch(): mutable.LinkedHashMap[String, Any] = {
    var g: Group = reader.read()
    while (g != null) {
      val vals = mutable.LinkedHashMap.empty[String, Any]
      fetch.fields.foreach { f =>
        val idx = g.getType.getFieldIndex(f.name)
        val v =
          if (g.getFieldRepetitionCount(idx) == 0) null
          else f.dataType match {
            case LongType => g.getLong(idx, 0)
            case DoubleType => g.getDouble(idx, 0)
            case BooleanType => g.getBoolean(idx, 0)
            case StringType => g.getBinary(idx, 0).toStringUsingUTF8
            case other => throw new IllegalArgumentException(s"$other")
          }
        vals(f.name) = v
      }
      if (pushed.forall(EsFileSource.eval(_, vals.apply))) return vals
      g = reader.read()
    }
    null
  }

  override def close(): Unit = reader.close()
}

private[v2] object MatchingRows {
  /** Internal value → Catalyst value. */
  def toCatalyst(v: Any): Any = v match {
    case s: String => UTF8String.fromString(s)
    case other => other
  }
}

private[v2] case class EsAggReaderFactory(fetch: StructType, out: StructType,
    pushed: Array[sources.Filter], groupCols: Seq[String],
    aggs: Seq[AggSpec]) extends PartitionReaderFactory {
  override def createReader(p: InputPartition): PartitionReader[InternalRow] =
    new EsAggPartitionReader(p.asInstanceOf[EsInputPartition], fetch, out,
      pushed, groupCols, aggs)
}

/** Aggregating reader: folds the row group's matching rows into per-group
  * partial aggregates (state bounded by group cardinality — the ES
  * terms-agg contract), then emits one row per group. */
private[v2] class EsAggPartitionReader(part: EsInputPartition,
    fetch: StructType, out: StructType, pushed: Array[sources.Filter],
    groupCols: Seq[String], aggs: Seq[AggSpec])
    extends PartitionReader[InternalRow] {

  private def lt(a: Any, b: Any): Boolean = (a, b) match {
    case (x: Long, y: Long) => x < y
    case (x: Double, y: Double) => x < y
    case (x: String, y: String) => x < y
    case (x: Boolean, y: Boolean) => !x && y
    case _ => false
  }

  private val it: Iterator[InternalRow] = {
    val cursor = new MatchingRows(part, fetch, pushed)
    val state = mutable.LinkedHashMap.empty[Seq[Any], Array[Any]]
    try {
      var vals = cursor.nextMatch()
      while (vals != null) {
        val key = groupCols.map(vals.apply)
        val acc = state.getOrElseUpdate(key,
          aggs.map { a => a.kind match {
            case "count_star" | "count" => 0L
            case _ => null
          }}.toArray[Any])
        aggs.zipWithIndex.foreach { case (a, i) =>
          a.kind match {
            case "count_star" => acc(i) = acc(i).asInstanceOf[Long] + 1L
            case "count" =>
              if (vals(a.column) != null) acc(i) = acc(i).asInstanceOf[Long] + 1L
            case "min" =>
              val v = vals(a.column)
              if (v != null && (acc(i) == null || lt(v, acc(i)))) acc(i) = v
            case "max" =>
              val v = vals(a.column)
              if (v != null && (acc(i) == null || lt(acc(i), v))) acc(i) = v
          }
        }
        vals = cursor.nextMatch()
      }
    } finally cursor.close()
    state.iterator.map { case (key, acc) =>
      new GenericInternalRow(
        (key.map(MatchingRows.toCatalyst) ++ acc.map(MatchingRows.toCatalyst))
          .toArray[Any])
    }
  }
  private var row: InternalRow = _

  override def next(): Boolean =
    if (it.hasNext) { row = it.next(); true } else false
  override def get(): InternalRow = row
  override def close(): Unit = ()
}

/** Row-emitting reader (no aggregate pushed): stops after `limit` matches
  * when a limit is pushed. */
private[v2] class EsPartitionReader(part: EsInputPartition, fetch: StructType,
    out: StructType, pushed: Array[sources.Filter], limit: Int)
    extends PartitionReader[InternalRow] {

  private val cursor = new MatchingRows(part, fetch, pushed)
  private var row: InternalRow = _
  private var emitted = 0L

  override def next(): Boolean = {
    if (limit >= 0 && emitted >= limit) return false
    val vals = cursor.nextMatch()
    if (vals == null) return false
    row = new GenericInternalRow(
      out.fields.map(f => MatchingRows.toCatalyst(vals(f.name)))
        .asInstanceOf[Array[Any]])
    emitted += 1
    true
  }

  override def get(): InternalRow = row
  override def close(): Unit = cursor.close()
}
