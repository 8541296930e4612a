package graft.sources

import java.io.DataInputStream
import java.util

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.sources.{And, DataSourceRegister, EqualTo, Filter, GreaterThan, GreaterThanOrEqual, In, IsNotNull, IsNull, LessThan, LessThanOrEqual, Or, StringContains, StringEndsWith, StringStartsWith}
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

import graft.sinks.{Sinks, TfRecord}

/** DataSource V2 read path for the tfrecord sink — `spark.read
  * .format("tfrecord").load(dir)` over the files [[TfRecord.write]]
  * produces (the reference writes tfrecord via TensorFlow's writer,
  * `/root/reference/doc2dataset/writer.py:166-267`; a Spark-native engine
  * must be able to scan its own sink). One [[InputPartition]] per
  * .tfrecord file — files are partition-sized by construction (the sink
  * writes one per task), so the read parallelism mirrors the write
  * parallelism. Records stream straight off the Hadoop FileSystem input
  * stream (any scheme), no temp copies.
  *
  * Schema: pass one explicitly, or omit it and the provider reads the
  * sink's `_metadata.parquet` sidecar and appends the payload column
  * (options `payloadCol`, default "text"; `payloadType` string|binary).
  */
class TfRecordDataSource extends TableProvider with DataSourceRegister {
  override def shortName(): String = "tfrecord"
  override def supportsExternalMetadata(): Boolean = true

  override def inferSchema(options: CaseInsensitiveStringMap): StructType = {
    val path = pathOf(options)
    val payloadCol = Option(options.get("payloadCol")).getOrElse("text")
    val payloadType = Option(options.get("payloadType")).getOrElse("string") match {
      case "binary" => BinaryType
      case _        => StringType
    }
    val sidecar = s"$path/_metadata.parquet"
    val spark = SparkSession.active
    val fs = new Path(sidecar).getFileSystem(spark.sessionState.newHadoopConf())
    require(fs.exists(new Path(sidecar)),
      s"tfrecord: no $sidecar sidecar to infer a schema from — pass .schema(...) explicitly")
    spark.read.parquet(sidecar).schema.add(payloadCol, payloadType)
  }

  override def getTable(schema: StructType, partitioning: Array[Transform],
                        properties: util.Map[String, String]): Table = {
    val path = properties.get("path")
    require(path != null, "tfrecord source needs a single load(path)")
    new TfRecordTable(path, schema)
  }

  private def pathOf(options: CaseInsensitiveStringMap): String = {
    val p = options.get("path")
    require(p != null, "tfrecord source needs a single load(path)")
    p
  }
}

private[sources] class TfRecordTable(path: String, tableSchema: StructType)
    extends Table with SupportsRead {
  override def name(): String = s"tfrecord:$path"
  override def schema(): StructType = tableSchema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new TfRecordScanBuilder(path, tableSchema)
}

/** Column pruning pushes into the Example decode: unrequested features
  * are skipped, not materialized. Predicate pushdown evaluates supported
  * filters against each decoded record INSIDE the reader, so non-matching
  * rows never cross into Spark; every filter is also returned as a
  * residual (tfrecord files carry no row-group stats, so the pushdown
  * prunes rows, not byte ranges, and Spark's re-application keeps
  * semantics exact no matter what the reader skipped). */
private[graft] class TfRecordScanBuilder(path: String, full: StructType)
    extends ScanBuilder with SupportsPushDownRequiredColumns with SupportsPushDownFilters {
  private var required: StructType = full
  private var pushed: Array[Filter] = Array.empty
  override def pruneColumns(requiredSchema: StructType): Unit = required = requiredSchema
  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    pushed = filters.filter(TfRecordFilters.supports(full, _))
    filters // everything is a residual: the scan prunes, Spark re-checks
  }
  override def pushedFilters(): Array[Filter] = pushed
  override def build(): Scan = new TfRecordScan(path, required, pushed)
}

/** Row-level evaluation of pushed-down source filters over decoded
  * records. Supports the scalar comparison family on top-level
  * long/int/float/double/string columns — anything else stays a
  * residual-only filter. */
private[sources] object TfRecordFilters {
  private def scalarCol(schema: StructType, name: String): Boolean =
    schema.fields.exists(f => f.name == name && (f.dataType match {
      case LongType | IntegerType | FloatType | DoubleType | StringType => true
      case _ => false
    }))

  def supports(schema: StructType, f: Filter): Boolean = f match {
    case EqualTo(a, _)            => scalarCol(schema, a)
    case GreaterThan(a, _)        => scalarCol(schema, a)
    case GreaterThanOrEqual(a, _) => scalarCol(schema, a)
    case LessThan(a, _)           => scalarCol(schema, a)
    case LessThanOrEqual(a, _)    => scalarCol(schema, a)
    case IsNull(a)                => schema.fieldNames.contains(a)
    case IsNotNull(a)             => schema.fieldNames.contains(a)
    case In(a, _)                 => scalarCol(schema, a)
    case StringStartsWith(a, _)   => scalarCol(schema, a)
    case StringEndsWith(a, _)     => scalarCol(schema, a)
    case StringContains(a, _)     => scalarCol(schema, a)
    case And(l, r)                => supports(schema, l) && supports(schema, r)
    case Or(l, r)                 => supports(schema, l) && supports(schema, r)
    case _                        => false
  }

  /** three-valued compare: None = null/incomparable (filter -> false,
    * matching SQL null semantics for these predicate shapes) */
  private def cmp(v: Any, lit: Any): Option[Int] = (v, lit) match {
    case (null, _) => None
    case (a: java.lang.Long, b: Number)    => Some(java.lang.Long.compare(a, b.longValue))
    case (a: java.lang.Integer, b: Number) => Some(java.lang.Long.compare(a.longValue, b.longValue))
    case (a: java.lang.Float, b: Number)   => Some(java.lang.Double.compare(a.doubleValue, b.doubleValue))
    case (a: java.lang.Double, b: Number)  => Some(java.lang.Double.compare(a, b.doubleValue))
    case (a: UTF8String, b: String)        => Some(a.toString.compareTo(b))
    case _ => None
  }

  private def str(v: Any): Option[String] = v match {
    case s: UTF8String => Some(s.toString)
    case _ => None
  }

  def eval(f: Filter, get: String => Any): Boolean = f match {
    case EqualTo(a, v)            => cmp(get(a), v).contains(0)
    case GreaterThan(a, v)        => cmp(get(a), v).exists(_ > 0)
    case GreaterThanOrEqual(a, v) => cmp(get(a), v).exists(_ >= 0)
    case LessThan(a, v)           => cmp(get(a), v).exists(_ < 0)
    case LessThanOrEqual(a, v)    => cmp(get(a), v).exists(_ <= 0)
    case IsNull(a)                => get(a) == null
    case IsNotNull(a)             => get(a) != null
    case In(a, vs)                => vs.exists(v => cmp(get(a), v).contains(0))
    case StringStartsWith(a, p)   => str(get(a)).exists(_.startsWith(p))
    case StringEndsWith(a, p)     => str(get(a)).exists(_.endsWith(p))
    case StringContains(a, p)     => str(get(a)).exists(_.contains(p))
    case And(l, r)                => eval(l, get) && eval(r, get)
    case Or(l, r)                 => eval(l, get) || eval(r, get)
    case _                        => true
  }
}

private[graft] class TfRecordScan(path: String, schema: StructType,
                                    pushed: Array[Filter] = Array.empty)
    extends Scan with Batch {
  override def readSchema(): StructType = schema
  override def toBatch: Batch = this
  override def description(): String =
    s"tfrecord:$path PushedFilters: [${pushed.mkString(", ")}]"

  override def planInputPartitions(): Array[InputPartition] = {
    val p = new Path(path)
    val fs = p.getFileSystem(SparkSession.active.sessionState.newHadoopConf())
    fs.listStatus(p).map(_.getPath)
      .filter(_.getName.endsWith(".tfrecord")).sortBy(_.getName)
      .map(f => TfRecordInputPartition(f.toString): InputPartition)
  }

  override def createReaderFactory(): PartitionReaderFactory = {
    val conf = new Sinks.SerializableHadoopConf(
      SparkSession.active.sessionState.newHadoopConf())
    TfRecordReaderFactory(schema, conf, pushed)
  }

  // salvage observability: corrupt-tail count surfaces in the Spark UI /
  // SQL metrics for every scan, so silent data loss is alertable
  override def supportedCustomMetrics(): Array[org.apache.spark.sql.connector.metric.CustomMetric] =
    Array(new TfRecordCorruptTailMetric)
}

/** Sum over tasks of streams ended early by corruption (CRC mismatch,
  * bad length word, truncation mid-record). Nonzero means data was
  * dropped by the salvage policy. */
private[graft] class TfRecordCorruptTailMetric
    extends org.apache.spark.sql.connector.metric.CustomSumMetric {
  override def name(): String = "corruptTails"
  override def description(): String = "tfrecord streams ended early by corruption"
}

private[sources] case class TfRecordInputPartition(file: String) extends InputPartition

private[sources] case class TfRecordReaderFactory(
    schema: StructType, conf: Sinks.SerializableHadoopConf,
    filters: Array[Filter] = Array.empty)
    extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val file = partition.asInstanceOf[TfRecordInputPartition].file
    new TfRecordPartitionReader(file, schema, conf, filters)
  }
}

private[graft] class TfRecordPartitionReader(
    file: String, schema: StructType, conf: Sinks.SerializableHadoopConf,
    filters: Array[Filter] = Array.empty)
    extends PartitionReader[InternalRow] {
  private val p = new Path(file)
  private val in = new DataInputStream(p.getFileSystem(conf.value).open(p))
  private var current: InternalRow = _
  private val fieldIdx: Map[String, Int] =
    schema.fieldNames.zipWithIndex.toMap
  // a filter whose column was pruned out of the read schema cannot be
  // evaluated here — skipping it is always safe (Spark re-applies every
  // filter as a residual); evaluating it as null would DROP valid rows
  private val evaluable: Array[Filter] =
    filters.filter(_.references.forall(fieldIdx.contains))

  private def passes(row: InternalRow): Boolean =
    evaluable.isEmpty || {
      val get = (name: String) => {
        val i = fieldIdx(name)
        if (row.isNullAt(i)) null else row.get(i, schema.fields(i).dataType)
      }
      evaluable.forall(TfRecordFilters.eval(_, get))
    }

  private var corruptTails = 0L

  override def next(): Boolean = {
    var found = false
    var more = true
    while (!found && more) TfRecord.nextRecord(in, () => corruptTails += 1) match {
      case Some(data) =>
        val row = decode(data)
        if (passes(row)) { current = row; found = true }
      case None => more = false
    }
    found
  }
  override def get(): InternalRow = current
  override def close(): Unit = in.close()

  override def currentMetricsValues(): Array[org.apache.spark.sql.connector.metric.CustomTaskMetric] =
    Array(new org.apache.spark.sql.connector.metric.CustomTaskMetric {
      override def name(): String = "corruptTails"
      override def value(): Long = corruptTails
    })

  private def decode(data: Array[Byte]): InternalRow = {
    val feats = TfRecord.parseExample(data)
    val values = schema.fields.map { f =>
      feats.get(f.name) match {
        case None => null
        case Some(v) => f.dataType match {
          case LongType    => v.intList.headOption.map(java.lang.Long.valueOf).orNull
          case IntegerType => v.intList.headOption.map(l => Integer.valueOf(l.toInt)).orNull
          case FloatType   => v.floatList.headOption.map(java.lang.Float.valueOf).orNull
          case DoubleType  => v.floatList.headOption.map(fl => java.lang.Double.valueOf(fl.toDouble)).orNull
          case StringType  => v.bytesList.headOption.map(UTF8String.fromBytes).orNull
          case BinaryType  => v.bytesList.headOption.orNull
          case ArrayType(FloatType, _) => new GenericArrayData(v.floatList.toArray)
          case ArrayType(LongType, _)  => new GenericArrayData(v.intList.toArray)
          case ArrayType(StringType, _) =>
            new GenericArrayData(v.bytesList.map(UTF8String.fromBytes).toArray[Any])
          case other => throw new IllegalArgumentException(s"tfrecord read: unsupported $other")
        }
      }
    }
    new GenericInternalRow(values.asInstanceOf[Array[Any]])
  }
}
