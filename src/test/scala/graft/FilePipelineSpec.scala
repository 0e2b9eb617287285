package graft

import graft.core._
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import java.nio.file.Files

/** File-connector parity (ref `examples/localfs-subflow-localfs` and
  * the `io/file` sources): list a directory, read contents/lines,
  * transform, write — plus the AMQP-shaped source/sink stubs.
  */
class FilePipelineSpec extends SparkSpec {

  private def tmpDirWithFiles(): String = {
    val d = Files.createTempDirectory("graft-files")
    Files.writeString(d.resolve("a.txt"), "line one\nline two\n")
    Files.writeString(d.resolve("b.txt"), "line three\n")
    d.toString
  }

  test("FileListSource emits one Url row per file (ref file.Source)") {
    val dir = tmpDirWithFiles()
    val sink = new MemorySink
    Pipeline(spark).root(FileListSource(dir)).mergeOrdered().to(sink)
    val names = sink.rows.map(_.getAs[org.apache.spark.sql.Row]("value").getAs[String]("name"))
    assert(names.toSet == Set("a.txt", "b.txt"))
    val protos = sink.rows.map(_.getAs[org.apache.spark.sql.Row]("value").getAs[String]("proto"))
    assert(protos.forall(_ == "file"))
  }

  test("TextFileSource → map(upper) → ParquetSink (ref localfs-subflow-localfs)") {
    val dir = tmpDirWithFiles()
    val out = Files.createTempDirectory("graft-out").toString
    val res = Pipeline(spark).root(TextFileSource(dir))
      .map(StringType)(upper)
      .to(ParquetSink(out))
    assert(res == Sink.Done(3))
    val lines = spark.read.parquet(out).select("value")
      .collect().map(_.getString(0)).toSet
    assert(lines == Set("LINE ONE", "LINE TWO", "LINE THREE"))
  }

  test("BinaryFileSource reads whole-file bytes (ref file.Reader ByteStream)") {
    val dir = tmpDirWithFiles()
    val sink = new MemorySink
    Pipeline(spark).root(BinaryFileSource(dir))
      .adapt(StringType)   // injected str.Decoder
      .to(sink)
    assert(sink.values.map(_.toString).toSet ==
      Set("line one\nline two\n", "line three\n"))
  }

  test("AmqpLikeSource emits binary bodies; AmqpLikeSink(ordered) publishes per row in order") {
    val published = scala.collection.mutable.ArrayBuffer.empty[String]
    val res = Pipeline(spark)
      .root(AmqpLikeSource(ListSource(Seq("m1", "m2", "m3"))))
      .to(AmqpLikeSink(b => published.synchronized { published += new String(b, "UTF-8") },
        ordered = true))
    assert(res == Sink.Done(3))
    assert(published.toSeq == Seq("m1", "m2", "m3"))
  }

  test("AmqpLikeSink default path publishes executor-side (no driver collect)") {
    FilePipelineSpec.amqpPublished.clear()
    val res = Pipeline(spark)
      .root(AmqpLikeSource(ListSource((1 to 20).map(i => s"m$i"))))
      .to(AmqpLikeSink(FilePipelineSpec.amqpPublish))
    assert(res == Sink.Done(20))
    // per-partition publish: all messages delivered exactly once; global
    // order is not guaranteed (documented relaxation)
    val seen = FilePipelineSpec.amqpPublished.synchronized {
      FilePipelineSpec.amqpPublished.toSeq }
    assert(seen.sortBy(_.drop(1).toInt) == (1 to 20).map(i => s"m$i"))
  }

  test("string flow auto-adapts into AmqpLikeSink via coder injection") {
    val published = scala.collection.mutable.ArrayBuffer.empty[String]
    Pipeline(spark).root(ListSource(Seq("x")))
      .to(AmqpLikeSink(b => published.synchronized { published += new String(b, "UTF-8") },
        ordered = true))
    assert(published.toSeq == Seq("x"))
  }

  test("reference-TODO pipeline: mixed gz/plain files decode conditionally then split (localfs-subflow-localfs main.go:44-51 incl. its TODOs)") {
    val d = Files.createTempDirectory("graft-mixed")
    Files.writeString(d.resolve("a.txt"), "plain one\nplain two")
    val gz = new java.util.zip.GZIPOutputStream(
      Files.newOutputStream(d.resolve("b.txt.gz")))
    gz.write("zipped three\nzipped four".getBytes("UTF-8")); gz.close()
    val sink = new MemorySink
    Pipeline(spark).root(BinaryFileSource(d.toString))
      .mapRaw(graft.coders.Coders.gunzipIfGzipped)  // the ref's TODO, working
      .adapt(StringType)                             // injected str.Decoder
      .split("\n")                                   // the ref's TODO subflow
      .filter(length(_) > 0)
      .map(StringType)(upper)
      .to(sink)
    assert(sink.values.map(_.toString).toSet ==
      Set("PLAIN ONE", "PLAIN TWO", "ZIPPED THREE", "ZIPPED FOUR"))
  }

  test("auto-sniffing decompression handles gz, bz2 and plain in one pipeline (both ref TODO branches)") {
    val d = Files.createTempDirectory("graft-mixed3")
    Files.writeString(d.resolve("a.txt"), "plain one")
    val gz = new java.util.zip.GZIPOutputStream(
      Files.newOutputStream(d.resolve("b.txt.gz")))
    gz.write("zipped two".getBytes("UTF-8")); gz.close()
    val bz = new org.apache.commons.compress.compressors.bzip2
      .BZip2CompressorOutputStream(Files.newOutputStream(d.resolve("c.txt.bz2")))
    bz.write("bzipped three".getBytes("UTF-8")); bz.close()
    val sink = new MemorySink
    Pipeline(spark).root(BinaryFileSource(d.toString))
      .mapRaw(graft.coders.Coders.decompressAuto)
      .adapt(StringType)
      .map(StringType)(upper)
      .to(sink)
    assert(sink.values.map(_.toString).toSet ==
      Set("PLAIN ONE", "ZIPPED TWO", "BZIPPED THREE"))
  }

  test("CSV write/read round-trip preserves values and schema (format coverage)") {
    import spark.implicits._
    val out = java.nio.file.Files.createTempDirectory("graft-csv").toString
    val df = Seq((1L, "a,b\"quoted\"", 1.5), (2L, "plain", -0.25)).toDF("id", "s", "v")
    df.write.mode("overwrite").option("header", "true").csv(out)
    val back = spark.read.option("header", "true")
      .schema(df.schema).csv(out).orderBy("id")
    assert(back.as[(Long, String, Double)].collect().toSeq ==
      Seq((1L, "a,b\"quoted\"", 1.5), (2L, "plain", -0.25)))
  }

  test("JSON-lines write/read round-trip (format coverage)") {
    import spark.implicits._
    val out = java.nio.file.Files.createTempDirectory("graft-json").toString
    val df = Seq((1L, Seq("x", "y"), Map("a" -> 1)), (2L, Seq.empty[String], Map.empty[String, Int]))
      .toDF("id", "tags", "m")
    df.write.mode("overwrite").json(out)
    val back = spark.read.schema(df.schema).json(out).orderBy("id")
    assert(back.count() == 2)
    assert(back.select("tags").as[Seq[String]].collect().toSeq == Seq(Seq("x", "y"), Seq()))
  }
}

/** Static landing buffer for the executor-side publish test: task
  * closures are serialized even on local[n], so a captured ArrayBuffer
  * would receive appends only on its deserialized copy — a companion
  * object field resolves statically in the shared test JVM. */
object FilePipelineSpec {
  val amqpPublished = scala.collection.mutable.ArrayBuffer.empty[String]
  val amqpPublish: Array[Byte] => Unit =
    b => amqpPublished.synchronized { amqpPublished += new String(b, "UTF-8") }
}
