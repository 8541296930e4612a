package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.arrow.memory.RootAllocator
import org.apache.arrow.vector.{BigIntVector, Float8Vector, VarCharVector, VectorSchemaRoot}
import org.apache.arrow.vector.ipc.ArrowFileWriter
import graft.sources.ManifestReader

/** Arrow IPC shard reading (r15 — closes the SURVEY §2.1 row previously
  * marked by-design obsolete): shards are WRITTEN here through the
  * arrow-vector API (the same wire format `pa.ipc.open_file` reads, ref
  * `downloader.py:229-231`) and must come back as a Spark DataFrame with
  * correct types, nulls, multi-batch content, and one partition per
  * shard file. */
class ArrowIpcSpec extends AnyFunSuite {

  /** Write one IPC file with the given (url, n, score) rows, split into
    * `batches` record batches. */
  private def writeShard(path: java.io.File,
                         rows: Seq[(String, Option[Long], Option[Double])],
                         batches: Int = 1): Unit = {
    val alloc = new RootAllocator(Long.MaxValue)
    val url = new VarCharVector("url", alloc)
    val n = new BigIntVector("n", alloc)
    val score = new Float8Vector("score", alloc)
    val root = VectorSchemaRoot.of(url, n, score)
    val ch = new java.io.FileOutputStream(path).getChannel
    val w = new ArrowFileWriter(root, null, ch)
    try {
      w.start()
      val per = math.max(1, (rows.length + batches - 1) / batches)
      for (chunk <- rows.grouped(per)) {
        url.allocateNew(); n.allocateNew(); score.allocateNew()
        chunk.zipWithIndex.foreach { case ((u, nv, sv), i) =>
          url.setSafe(i, u.getBytes("UTF-8"))
          nv.fold(n.setNull(i))(v => n.setSafe(i, v))
          sv.fold(score.setNull(i))(v => score.setSafe(i, v))
        }
        root.setRowCount(chunk.length)
        w.writeBatch()
      }
      w.end()
    } finally { w.close(); ch.close(); root.close(); alloc.close() }
  }

  test("reads a multi-batch IPC shard with nulls into typed Spark rows") {
    val spark = TestSpark.spark
    val dir = java.nio.file.Files.createTempDirectory("arrow_ipc").toFile
    val rows = (0 until 10).map(i =>
      (s"http://ex.com/$i",
        if (i % 3 == 0) None else Some(i.toLong * 7),
        if (i % 4 == 0) None else Some(i * 0.5)))
    writeShard(new java.io.File(dir, "shard_0.feather"), rows, batches = 3)
    val df = ManifestReader.arrow(spark, new java.io.File(dir, "shard_0.feather").getPath)
    assert(df.schema.map(f => (f.name, f.dataType.simpleString)) ==
      Seq(("url", "string"), ("n", "bigint"), ("score", "double")))
    val got = df.collect().map(r => (r.getString(0),
      if (r.isNullAt(1)) None else Some(r.getLong(1)),
      if (r.isNullAt(2)) None else Some(r.getDouble(2)))).toSeq
    assert(got.sortBy(_._1) == rows.sortBy(_._1))
  }

  test("a directory of shards reads as one DataFrame, one partition per file") {
    val spark = TestSpark.spark
    val dir = java.nio.file.Files.createTempDirectory("arrow_ipc2").toFile
    writeShard(new java.io.File(dir, "a.feather"),
      Seq(("u1", Some(1L), Some(0.1)), ("u2", None, Some(0.2))))
    writeShard(new java.io.File(dir, "b.feather"),
      Seq(("u3", Some(3L), None)))
    val df = ManifestReader.arrow(spark, dir.getPath + "/*.feather")
    assert(df.rdd.getNumPartitions == 2)
    assert(df.count() == 3)
    // the reference's normalize step runs unchanged on shard content
    val norm = ManifestReader.normalize(df, "url", None, "md5", Seq("n"))
    assert(norm.columns.toSeq == Seq("n", "url"))
  }

  test("ArrowIpc.write round-trips a DataFrame through IPC shards, one per partition") {
    val spark = TestSpark.spark
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("arrow_ipc3").toFile.getPath
    val src = (0 until 20).map(i =>
        (i.toLong, s"u$i", if (i % 5 == 0) None else Some(i * 1.5), i % 2 == 0))
      .toDF("id", "url", "score", "flag").repartition(3, $"id")
    graft.sources.ArrowIpc.write(src, dir, batchRows = 4)
    val back = graft.sources.ArrowIpc.read(spark, dir + "/*.feather")
    assert(back.rdd.getNumPartitions == 3)
    assert(back.schema.map(f => (f.name, f.dataType.simpleString)) ==
      Seq(("id", "bigint"), ("url", "string"), ("score", "double"),
        ("flag", "boolean")))
    val got = back.collect().map(r => (r.getLong(0), r.getString(1),
      if (r.isNullAt(2)) None else Some(r.getDouble(2)), r.getBoolean(3)))
      .sortBy(_._1).toSeq
    val want = src.collect().map(r => (r.getLong(0), r.getString(1),
      if (r.isNullAt(2)) None else Some(r.getDouble(2)), r.getBoolean(3)))
      .sortBy(_._1).toSeq
    assert(got == want)
    // unsupported Spark type fails BEFORE writing anything
    val bad = Seq((1, Seq("a"))).toDF("id", "arr")
    val ex = intercept[IllegalArgumentException] {
      graft.sources.ArrowIpc.write(bad, dir + "_bad")
    }
    assert(ex.getMessage.contains("unsupported Spark type"))
  }

  test("unsupported Arrow types and missing paths fail loudly") {
    val spark = TestSpark.spark
    val ex = intercept[IllegalArgumentException] {
      ManifestReader.arrow(spark, "/nonexistent/path/*.feather")
    }
    assert(ex.getMessage.contains("no Arrow IPC files"))
  }

  test("unsigned-int and tz-aware-timestamp shards are rejected at schema " +
       "resolution, not row decode (r16 ADVICE)") {
    import org.apache.arrow.vector.UInt4Vector
    val spark = TestSpark.spark
    val dir = java.nio.file.Files.createTempDirectory("arrow_u32").toFile
    val alloc = new RootAllocator(Long.MaxValue)
    val u = new UInt4Vector("u", alloc)
    val root = VectorSchemaRoot.of(u)
    val ch = new java.io.FileOutputStream(new java.io.File(dir, "s.feather")).getChannel
    val w = new ArrowFileWriter(root, null, ch)
    try {
      w.start(); u.allocateNew(); u.setSafe(0, -1) // 0xFFFFFFFF as u32
      root.setRowCount(1); w.writeBatch(); w.end()
    } finally { w.close(); ch.close(); root.close(); alloc.close() }
    val ex = intercept[IllegalArgumentException] {
      ManifestReader.arrow(spark, new java.io.File(dir, "s.feather").getPath)
    }
    assert(ex.getMessage.contains("uint32"))
  }

  test("write pre-cleans stale shards and .tmp leftovers; directory reads " +
       "ignore non-.feather files (r16 ADVICE: commit hygiene)") {
    val spark = TestSpark.spark
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("arrow_clean").toFile.getPath
    // first write: 4 partitions -> part-00000..00003
    graft.sources.ArrowIpc.write(
      (0L until 40L).toDF("id").repartition(4), dir)
    // plant a killed-attempt leftover and a foreign file
    java.nio.file.Files.write(
      java.nio.file.Paths.get(dir, "part-00007.feather.123.tmp"),
      "torn shard bytes".getBytes("UTF-8"))
    java.nio.file.Files.write(
      java.nio.file.Paths.get(dir, "README.txt"), "notes".getBytes("UTF-8"))
    // a directory read must see exactly the 4 real shards
    assert(graft.sources.ArrowIpc.read(spark, dir).count() == 40)
    // second write with FEWER partitions: stale part-0000{2,3} and the
    // .tmp must be gone, rows must be exactly the new frame's
    graft.sources.ArrowIpc.write(
      (100L until 120L).toDF("id").repartition(2), dir)
    val names = new java.io.File(dir).listFiles().map(_.getName).toSet
    assert(names.count(_.endsWith(".feather")) == 2, s"left: $names")
    assert(!names.exists(_.endsWith(".tmp")), s"tmp survived: $names")
    assert(names.contains("README.txt")) // foreign files are not ours to delete
    val got = graft.sources.ArrowIpc.read(spark, dir)
      .collect().map(_.getLong(0)).sorted.toSeq
    assert(got == (100L until 120L).toSeq)
  }
}
