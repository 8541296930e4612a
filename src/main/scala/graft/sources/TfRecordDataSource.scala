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
import org.apache.spark.sql.sources.DataSourceRegister
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
  * are skipped, not materialized. */
private[sources] class TfRecordScanBuilder(path: String, full: StructType)
    extends ScanBuilder with SupportsPushDownRequiredColumns {
  private var required: StructType = full
  override def pruneColumns(requiredSchema: StructType): Unit = required = requiredSchema
  override def build(): Scan = new TfRecordScan(path, required)
}

private[sources] class TfRecordScan(path: String, schema: StructType)
    extends Scan with Batch {
  override def readSchema(): StructType = schema
  override def toBatch: Batch = this

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
    TfRecordReaderFactory(schema, conf)
  }
}

private[sources] case class TfRecordInputPartition(file: String) extends InputPartition

private[sources] case class TfRecordReaderFactory(
    schema: StructType, conf: Sinks.SerializableHadoopConf)
    extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val file = partition.asInstanceOf[TfRecordInputPartition].file
    new TfRecordPartitionReader(file, schema, conf)
  }
}

private[sources] class TfRecordPartitionReader(
    file: String, schema: StructType, conf: Sinks.SerializableHadoopConf)
    extends PartitionReader[InternalRow] {
  private val p = new Path(file)
  private val in = new DataInputStream(p.getFileSystem(conf.value).open(p))
  private var current: InternalRow = _

  override def next(): Boolean = TfRecord.nextRecord(in) match {
    case Some(data) => current = decode(data); true
    case None       => false
  }
  override def get(): InternalRow = current
  override def close(): Unit = in.close()

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
