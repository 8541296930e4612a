package graft.sources

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types._
import org.apache.arrow.memory.RootAllocator
import org.apache.arrow.vector.ipc.ArrowFileReader
import org.apache.arrow.vector.types.pojo.{ArrowType, Field}
import org.apache.arrow.vector.types.FloatingPointPrecision

/** Arrow IPC (random-access / Feather-v2) shard reader — the reference's
  * shard input format (`doc2dataset/downloader.py:229-231`:
  * `pa.ipc.open_file(f).read_all()`; the reader writes those shards in
  * `reader.py:125-138`). Closes the one SURVEY §2.1 row previously marked
  * by-design obsolete: a user migrating from the reference can point this
  * at the same `_tmp feather` shards.
  *
  * Built on the arrow-vector runtime Spark already ships (no new
  * dependency). Distributed shape: one Spark partition per IPC FILE —
  * exactly the reference's shard granularity — with the schema resolved
  * once on the driver from the first file; each task streams the file's
  * record batches through a task-local allocator. Files are read through
  * the Hadoop FileSystem API, so any scheme Spark can reach works; an IPC
  * shard is by construction small (`number_sample_per_shard` rows), so a
  * whole-shard buffer per task is the intended memory shape.
  */
object ArrowIpc {

  /** Map an Arrow field to a Spark field; unsupported types fail loudly
    * (silent coercion would corrupt a migration). Unsigned ints are
    * REJECTED here rather than coerced: their vectors' `getObject`
    * returns boxed Character/Integer/wrapped-Long values that would
    * pass through `toSpark` unconverted and fail (or silently corrupt)
    * row by row at runtime instead of loudly at schema resolution.
    * Likewise tz-aware timestamps: their vectors yield epoch Longs, not
    * the LocalDateTime the tz-naive path converts. */
  private def sparkType(f: Field): DataType = f.getType match {
    case _: ArrowType.Utf8 | _: ArrowType.LargeUtf8 => StringType
    case i: ArrowType.Int =>
      (i.getBitWidth, i.getIsSigned) match {
        case (64, true) => LongType
        case (32, true) => IntegerType
        case (16, true) => ShortType
        case (8, true) => ByteType
        case (w, false) =>
          throw new IllegalArgumentException(
            s"unsupported Arrow type for field '${f.getName}': uint$w " +
              "(unsigned vectors box values Spark rows cannot carry)")
        case other =>
          throw new IllegalArgumentException(
            s"unsupported Arrow int width for field '${f.getName}': $other")
      }
    case fp: ArrowType.FloatingPoint =>
      if (fp.getPrecision == FloatingPointPrecision.SINGLE) FloatType
      else DoubleType
    case _: ArrowType.Bool => BooleanType
    case _: ArrowType.Binary | _: ArrowType.LargeBinary => BinaryType
    case _: ArrowType.Date => DateType
    case ts: ArrowType.Timestamp =>
      if (ts.getTimezone == null) TimestampType
      else throw new IllegalArgumentException(
        s"unsupported Arrow type for field '${f.getName}': " +
          s"timestamp[tz=${ts.getTimezone}] (tz-aware vectors yield raw " +
          "epoch longs, not LocalDateTime)")
    case other =>
      throw new IllegalArgumentException(
        s"unsupported Arrow type for field '${f.getName}': $other")
  }

  private def toSpark(v: Any): Any = v match {
    case null => null
    case t: org.apache.arrow.vector.util.Text => t.toString
    case ldt: java.time.LocalDateTime => java.sql.Timestamp.valueOf(ldt)
    case ld: java.time.LocalDate => java.sql.Date.valueOf(ld)
    case other => other
  }

  /** All rows of one IPC payload as Spark Rows. */
  private def readBytes(bytes: Array[Byte]): Iterator[Row] = {
    val alloc = new RootAllocator(Long.MaxValue)
    val ch = new org.apache.arrow.vector.util.ByteArrayReadableSeekableByteChannel(bytes)
    val reader = new ArrowFileReader(ch, alloc)
    val out = scala.collection.mutable.ArrayBuffer.empty[Row]
    try {
      val root = reader.getVectorSchemaRoot
      while (reader.loadNextBatch()) {
        val vs = root.getFieldVectors
        var r = 0
        while (r < root.getRowCount) {
          val vals = new Array[Any](vs.size())
          var c = 0
          while (c < vs.size()) {
            vals(c) = toSpark(vs.get(c).getObject(r))
            c += 1
          }
          out += Row.fromSeq(vals.toIndexedSeq)
          r += 1
        }
      }
    } finally { reader.close(); alloc.close() }
    out.iterator
  }

  /** Hadoop conf as serializable key-values (Configuration itself is
    * not Serializable): executors rebuild it so driver-side filesystem
    * settings — remote-FS credentials, endpoints — survive the ship. */
  private def confEntries(conf: org.apache.hadoop.conf.Configuration): Array[(String, String)] = {
    val b = Array.newBuilder[(String, String)]
    val it = conf.iterator()
    while (it.hasNext) { val e = it.next(); b += (e.getKey -> e.getValue) }
    b.result()
  }

  private def rebuildConf(kv: Array[(String, String)]): org.apache.hadoop.conf.Configuration = {
    val c = new org.apache.hadoop.conf.Configuration(false)
    kv.foreach { case (k, v) => c.set(k, v) }
    c
  }

  private def fileBytes(path: String,
                        conf: org.apache.hadoop.conf.Configuration): Array[Byte] = {
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(conf)
    val len = fs.getFileStatus(p).getLen
    require(len <= (1L << 31) - 16, s"IPC shard over 2 GiB: $path")
    val buf = new Array[Byte](len.toInt)
    val in = fs.open(p)
    try in.readFully(0, buf) finally in.close()
    buf
  }

  /** Write a DataFrame as Arrow IPC shards — ONE FILE PER PARTITION
    * (`part-NNNNN.feather`, deterministic names so task retries
    * overwrite rather than duplicate), the reference's own shard
    * format (`reader.py:139-146`: `pa.ipc.new_file(...).write_table`),
    * so a migration can hand shards BACK to reference tooling. Core
    * types only (string/long/int/double/float/boolean/binary);
    * unsupported Spark types fail loudly before any file is written. */
  def write(df: DataFrame, dir: String, batchRows: Int = 4096): Unit = {
    import org.apache.arrow.vector._
    val schema = df.schema
    schema.fields.foreach { f =>
      require(Set[DataType](StringType, LongType, IntegerType, DoubleType,
        FloatType, BooleanType, BinaryType).contains(f.dataType),
        s"unsupported Spark type for Arrow shard write: ${f.name}: ${f.dataType}")
    }
    val names = schema.fieldNames
    val types = schema.fields.map(_.dataType)
    val confKV = confEntries(df.sparkSession.sparkContext.hadoopConfiguration)
    // pre-clean (commit hygiene): a prior write with MORE partitions
    // leaves stale part-NNNNN.feather files a directory read would
    // silently include, and a killed task attempt leaves a fully
    // written .tmp — both must go before any task commits
    val dirPath = new org.apache.hadoop.fs.Path(dir)
    val driverFs = dirPath.getFileSystem(
      df.sparkSession.sparkContext.hadoopConfiguration)
    if (driverFs.exists(dirPath))
      driverFs.listStatus(dirPath).foreach { st =>
        val nm = st.getPath.getName
        if (st.isFile && (nm.endsWith(".tmp") ||
            (nm.startsWith("part-") && nm.contains(".feather"))))
          driverFs.delete(st.getPath, false)
      }
    df.rdd.foreachPartition { rows =>
      val tc = org.apache.spark.TaskContext.get()
      val pid = tc.partitionId()
      val conf = rebuildConf(confKV)
      val path = new org.apache.hadoop.fs.Path(dir, f"part-$pid%05d.feather")
      // task-attempt-private temp + rename: a speculative twin or a
      // retried task must never interleave bytes into the final file
      val tmp = new org.apache.hadoop.fs.Path(dir,
        f"part-$pid%05d.feather.${tc.taskAttemptId()}.tmp")
      val fs = path.getFileSystem(conf)
      val alloc = new RootAllocator(Long.MaxValue)
      val vecs: Array[FieldVector] = types.zip(names).map {
        case (StringType, n) => new VarCharVector(n, alloc)
        case (LongType, n) => new BigIntVector(n, alloc)
        case (IntegerType, n) => new IntVector(n, alloc)
        case (DoubleType, n) => new Float8Vector(n, alloc)
        case (FloatType, n) => new Float4Vector(n, alloc)
        case (BooleanType, n) => new BitVector(n, alloc)
        case (_, n) => new VarBinaryVector(n, alloc)
      }
      val root = new VectorSchemaRoot(java.util.Arrays.asList(vecs: _*))
      val out = fs.create(tmp, true)
      val ch = java.nio.channels.Channels.newChannel(
        out.asInstanceOf[java.io.OutputStream])
      val w = new org.apache.arrow.vector.ipc.ArrowFileWriter(root, null, ch)
      var failed = false
      try {
        w.start()
        val buf = rows.grouped(batchRows)
        // an empty partition still writes a valid zero-batch shard
        var wrote = false
        while (buf.hasNext) {
          val chunk = buf.next()
          vecs.foreach(_.allocateNew())
          chunk.zipWithIndex.foreach { case (row, i) =>
            var c = 0
            while (c < vecs.length) {
              if (row.isNullAt(c)) vecs(c) match {
                case v: VarCharVector => v.setNull(i)
                case v: BigIntVector => v.setNull(i)
                case v: IntVector => v.setNull(i)
                case v: Float8Vector => v.setNull(i)
                case v: Float4Vector => v.setNull(i)
                case v: BitVector => v.setNull(i)
                case v: VarBinaryVector => v.setNull(i)
                case _ =>
              } else vecs(c) match {
                case v: VarCharVector => v.setSafe(i, row.getString(c).getBytes("UTF-8"))
                case v: BigIntVector => v.setSafe(i, row.getLong(c))
                case v: IntVector => v.setSafe(i, row.getInt(c))
                case v: Float8Vector => v.setSafe(i, row.getDouble(c))
                case v: Float4Vector => v.setSafe(i, row.getFloat(c))
                case v: BitVector => v.setSafe(i, if (row.getBoolean(c)) 1 else 0)
                case v: VarBinaryVector => v.setSafe(i, row.getAs[Array[Byte]](c))
                case _ =>
              }
              c += 1
            }
          }
          root.setRowCount(chunk.length)
          w.writeBatch()
          wrote = true
        }
        if (!wrote) { root.setRowCount(0); w.writeBatch() }
        w.end()
      } catch { case e: Throwable => failed = true; throw e
      } finally {
        w.close(); out.close(); root.close(); alloc.close()
        // a failing attempt removes its own .tmp so a retry (or the
        // next write's pre-clean) never sees a torn shard
        if (failed) { try fs.delete(tmp, false) catch { case _: Throwable => } }
      }
      fs.delete(path, false)
      require(fs.rename(tmp, path), s"rename failed for $path")
    }
    // post-commit sweep: a killed speculative twin's .tmp may survive
    // its own cleanup — directory reads ignore non-.feather names, but
    // the leftover must not linger into external tooling's listings
    if (driverFs.exists(dirPath))
      driverFs.listStatus(dirPath).foreach { st =>
        if (st.isFile && st.getPath.getName.endsWith(".tmp"))
          driverFs.delete(st.getPath, false)
      }
  }

  /** Read one file / directory / glob of Arrow IPC shards. */
  def read(spark: SparkSession, path: String): DataFrame = {
    val conf = spark.sparkContext.hadoopConfiguration
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(conf)
    val matched = Option(fs.globStatus(p)).map(_.toSeq).getOrElse(Nil)
    // a DIRECTORY listing takes only *.feather shards: task-attempt
    // .tmp leftovers (or any foreign file) must never be ingested as a
    // shard. An explicitly named file still reads whatever it is.
    val files = matched.flatMap { st =>
      if (st.isDirectory)
        fs.listStatus(st.getPath).toSeq.filter(f =>
          f.isFile && f.getPath.getName.endsWith(".feather"))
      else Seq(st)
    }.map(_.getPath.toString).sorted
    require(files.nonEmpty, s"no Arrow IPC files at $path")
    // driver: schema from the first shard (the reference assumes one
    // schema across shards the same way)
    val schema: StructType = {
      val alloc = new RootAllocator(Long.MaxValue)
      val ch = new org.apache.arrow.vector.util.ByteArrayReadableSeekableByteChannel(
        fileBytes(files.head, conf))
      val reader = new ArrowFileReader(ch, alloc)
      try {
        val fields = reader.getVectorSchemaRoot.getSchema.getFields
        StructType((0 until fields.size()).map { i =>
          val f = fields.get(i)
          StructField(f.getName, sparkType(f), nullable = true)
        })
      } finally { reader.close(); alloc.close() }
    }
    // executors: one partition per shard file; the DRIVER's hadoop conf
    // ships as key-values (remote-FS credentials/endpoints included)
    val confKV = confEntries(conf)
    val rdd = spark.sparkContext
      .parallelize(files, files.length)
      .mapPartitions { it =>
        val c = rebuildConf(confKV)
        it.flatMap(f => readBytes(fileBytes(f, c)))
      }
    spark.createDataFrame(rdd, schema)
  }
}
