package graft.sinks

import java.io.{BufferedOutputStream, DataOutputStream, File, FileOutputStream}
import java.nio.{ByteBuffer, ByteOrder}
import java.nio.charset.StandardCharsets
import java.util.zip.CRC32C

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.types._

/** TFRecord sink (ref `writer.py:166-267`): one TF `Example` proto per
  * row in TFRecord framing. Hand-encoded protobuf wire format (the
  * Example schema is tiny and stable: `features { feature { map } }`)
  * — no TensorFlow dependency, verified byte-level in tests.
  *
  * Framing per record (TFRecord spec):
  *   uint64 length (LE) | uint32 masked_crc32c(length) |
  *   bytes data[length] | uint32 masked_crc32c(data)
  *
  * Value mapping follows the reference (`writer.py:228-267`):
  * int/long → int64_list, float/double → float_list, string/binary →
  * bytes_list, arrays thereof → multi-value lists.
  */
object TfRecord {

  // ------------------------------------------------------- protobuf enc

  private def varint(out: java.io.ByteArrayOutputStream, v0: Long): Unit = {
    var v = v0
    while ((v & ~0x7FL) != 0) { out.write(((v & 0x7F) | 0x80).toInt); v >>>= 7 }
    out.write(v.toInt)
  }
  private def keyed(out: java.io.ByteArrayOutputStream, field: Int, wire: Int): Unit =
    varint(out, (field << 3 | wire).toLong)
  private def lenDelim(out: java.io.ByteArrayOutputStream, field: Int, bytes: Array[Byte]): Unit = {
    keyed(out, field, 2); varint(out, bytes.length.toLong); out.write(bytes)
  }
  private def msg(f: java.io.ByteArrayOutputStream => Unit): Array[Byte] = {
    val b = new java.io.ByteArrayOutputStream(); f(b); b.toByteArray
  }

  /** Feature proto: bytes_list=1, float_list=2, int64_list=3. */
  def featureBytes(values: Seq[Array[Byte]]): Array[Byte] =
    msg { b => lenDelim(b, 1, msg { bl => values.foreach(v => lenDelim(bl, 1, v)) }) }
  def featureFloats(values: Seq[Float]): Array[Byte] =
    msg { b => lenDelim(b, 2, msg { fl =>
      // packed floats: field 1, wire 2
      keyed(fl, 1, 2); varint(fl, values.length * 4L)
      val bb = ByteBuffer.allocate(values.length * 4).order(ByteOrder.LITTLE_ENDIAN)
      values.foreach(bb.putFloat); fl.write(bb.array())
    }) }
  def featureInts(values: Seq[Long]): Array[Byte] =
    msg { b => lenDelim(b, 3, msg { il =>
      keyed(il, 1, 2)
      val tmp = new java.io.ByteArrayOutputStream()
      values.foreach(varint(tmp, _))
      varint(il, tmp.size.toLong); il.write(tmp.toByteArray)
    }) }

  /** Example proto: features(field 1) → map<string, Feature>(field 1..2). */
  def exampleBytes(features: Seq[(String, Array[Byte])]): Array[Byte] =
    msg { ex => lenDelim(ex, 1, msg { fs =>
      features.foreach { case (name, feat) =>
        lenDelim(fs, 1, msg { entry =>
          lenDelim(entry, 1, name.getBytes(StandardCharsets.UTF_8))
          lenDelim(entry, 2, feat)
        })
      }
    }) }

  def rowToExample(row: Row, schema: StructType): Array[Byte] = {
    val feats = schema.fields.zipWithIndex.flatMap { case (f, i) =>
      if (row.isNullAt(i)) None
      else Some(f.name -> (f.dataType match {
        case IntegerType => featureInts(Seq(row.getInt(i).toLong))
        case LongType => featureInts(Seq(row.getLong(i)))
        case ShortType => featureInts(Seq(row.getShort(i).toLong))
        case BooleanType => featureInts(Seq(if (row.getBoolean(i)) 1L else 0L))
        case FloatType => featureFloats(Seq(row.getFloat(i)))
        case DoubleType => featureFloats(Seq(row.getDouble(i).toFloat))
        case StringType => featureBytes(Seq(row.getString(i).getBytes(StandardCharsets.UTF_8)))
        case BinaryType => featureBytes(Seq(row.getAs[Array[Byte]](i)))
        case TimestampType => featureInts(Seq(row.getAs[java.sql.Timestamp](i).getTime))
        case ArrayType(LongType, _) => featureInts(row.getSeq[Long](i))
        case ArrayType(IntegerType, _) => featureInts(row.getSeq[Int](i).map(_.toLong))
        case ArrayType(FloatType, _) => featureFloats(row.getSeq[Float](i))
        case ArrayType(DoubleType, _) => featureFloats(row.getSeq[Double](i).map(_.toFloat))
        case ArrayType(StringType, _) =>
          featureBytes(row.getSeq[String](i).map(_.getBytes(StandardCharsets.UTF_8)))
        case other => throw new IllegalArgumentException(s"tfrecord: unsupported type $other for ${f.name}")
      }))
    }
    exampleBytes(feats.toSeq)
  }

  // ------------------------------------------------------ tfrecord frame

  def maskedCrc(bytes: Array[Byte]): Int = {
    val c = new CRC32C(); c.update(bytes)
    val crc = c.getValue.toInt
    ((crc >>> 15) | (crc << 17)) + 0xa282ead8
  }

  def writeRecord(out: DataOutputStream, data: Array[Byte]): Unit = {
    val len = ByteBuffer.allocate(8).order(ByteOrder.LITTLE_ENDIAN)
      .putLong(data.length.toLong).array()
    out.write(len)
    out.writeInt(Integer.reverseBytes(maskedCrc(len)))
    out.write(data)
    out.writeInt(Integer.reverseBytes(maskedCrc(data)))
  }

  /** Write one .tfrecord file per partition + parquet metadata sidecar
    * (ref writes parquet alongside, `writer.py:210-218`). */
  def write(df: DataFrame, out: String, payloadCol: String = "text"): Unit = {
    val schema = df.schema
    new File(out).mkdirs()
    df.foreachPartition { rows: Iterator[Row] =>
      if (rows.hasNext) {
        val pid = org.apache.spark.TaskContext.getPartitionId()
        val o = new DataOutputStream(new BufferedOutputStream(
          new FileOutputStream(new File(out, f"$pid%05d.tfrecord"))))
        try rows.foreach(r => writeRecord(o, rowToExample(r, schema)))
        finally o.close()
      }
    }
    df.drop(payloadCol).write.mode("overwrite").parquet(s"$out/_metadata.parquet")
  }

  /** Read back the framing (length/CRC-validated), returning raw Example
    * payload bytes — used by tests to verify the writer byte-level. */
  def readRecords(path: String): Seq[Array[Byte]] = {
    val in = new java.io.DataInputStream(new java.io.BufferedInputStream(
      new java.io.FileInputStream(path)))
    val outBuf = scala.collection.mutable.ArrayBuffer.empty[Array[Byte]]
    try {
      while (in.available() > 0) {
        val lenBytes = new Array[Byte](8); in.readFully(lenBytes)
        val lenCrc = Integer.reverseBytes(in.readInt())
        require(lenCrc == maskedCrc(lenBytes), "length crc mismatch")
        val len = ByteBuffer.wrap(lenBytes).order(ByteOrder.LITTLE_ENDIAN).getLong.toInt
        val data = new Array[Byte](len); in.readFully(data)
        val dataCrc = Integer.reverseBytes(in.readInt())
        require(dataCrc == maskedCrc(data), "data crc mismatch")
        outBuf += data
      }
    } finally in.close()
    outBuf.toSeq
  }
}
