package graft

import graft.core._
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Pipeline semantics vs the reference's manual checklist
  * (`README.md:90-104`, SURVEY §5) + the M2 end-to-end slice.
  */
class PipelineSpec extends SparkSpec {

  test("bounded list root terminates with exact result (checklist: bounded termination)") {
    val sink = new MemorySink
    Pipeline(spark).root(ListSource((1 to 100).map(_.toString)))
      .map(IntegerType)(v => v.cast(IntegerType) * 2)
      .to(sink)
    assert(sink.values == (1 to 100).map(_ * 2))
  }

  test("filter drops non-matching (checklist) and preserves order") {
    val sink = new MemorySink
    Pipeline(spark).root(ListSource((1 to 50).map(_.toString)))
      .map(IntegerType)(_.cast(IntegerType))
      .filter(_ % 2 === 0)
      .to(sink)
    assert(sink.values == (2 to 50 by 2))
  }

  test("flatMap/split preserves per-element order (ref str.Split fixture, FIXTURES §1.6)") {
    val sink = new MemorySink
    Pipeline(spark)
      .root(ListSource(Seq("aaa\tbbb\tccc", "ddd", "eee", "fff", "ggg\thhh")))
      .split("\t")
      .map(StringType)(upper)
      .mergeOrdered()
      .to(sink)
    assert(sink.values == Seq("AAA", "BBB", "CCC", "DDD", "EEE", "FFF", "GGG", "HHH"))
  }

  test("flatMap children inherit the parent element's event time (ref: stamps propagate through fan-out)") {
    // stamp a fixed event time on the root, fan out, and check every
    // child carries the PARENT ts — not a fresh processing-time stamp
    val flow = Pipeline(spark).root(ListSource(Seq("a\tb", "c")))
    val fixed = flow.copy(df = flow.df.withColumn("ts",
      to_timestamp(lit("2024-01-01 00:00:00"))))
    val children = fixed.split("\t").df
      .select(col("value"), col("ts").cast(StringType)).collect()
    assert(children.length == 3)
    assert(children.forall(_.getString(1) == "2024-01-01 00:00:00"))
  }

  test("scatter then ordered gather restores stamp order (ref scatter/gather example)") {
    val sink = new MemorySink
    Pipeline(spark).root(ListSource((1 to 1000).map(_.toString)))
      .scatter(8)
      .map(StringType)(v => concat(lit("x"), v))
      .mergeOrdered()
      .to(sink)
    assert(sink.values == (1 to 1000).map("x" + _))
  }

  test("limit makes pipeline bounded with precise result (checklist: Limit correctness)") {
    val sink = new MemorySink
    Pipeline(spark).root(RoundRobinSource(10000, Seq("a", "b", "c")))
      .limit(7)
      .to(sink)
    assert(sink.values == Seq("a", "b", "c", "a", "b", "c", "a"))
  }

  test("count fold (ref .Count def.go:61-65)") {
    val sink = new MemorySink
    Pipeline(spark).root(RoundRobinSource(12345, Seq("x")))
      .countAll()
      .to(sink)
    assert(sink.values == Seq(12345L))
  }

  test("stacked folds (checklist: multiple folds)") {
    val sink = new MemorySink
    Pipeline(spark).root(ListSource((1 to 10).map(_.toString)))
      .map(IntegerType)(_.cast(IntegerType))
      .foldTriggered(3)(sum)   // running sums emitted every 3 + at end
      .countAll()              // count of emissions
    .to(sink)
    assert(sink.values == Seq(4L)) // emissions at n=3,6,9,10
  }

  test("coder auto-injection: string flow into kafka-shaped sink (ref pipeline.go:168-197)") {
    val out = java.nio.file.Files.createTempDirectory("graft-kafka").toString
    val res = Pipeline(spark).root(ListSource(Seq("hello", "world")))
      .to(KafkaLikeSink(out)) // string → binary → KVBinary → KVMBinary chain
    assert(res == Sink.Done(2))
    val rows = spark.read.parquet(out).orderBy("value").collect()
    assert(rows.map(r => new String(r.getAs[Array[Byte]]("value"), "UTF-8")).toSeq
      == Seq("hello", "world"))
    assert(rows.forall(_.isNullAt(0))) // nil key
  }

  test("coder chain search finds multi-step chains and rejects impossible ones") {
    val reg = graft.coders.Coders.registry
    val chain = reg.chain(StringType, graft.coders.Coders.kvmBinaryType)
    assert(chain.isDefined && chain.get.map(_.name) ==
      List("str.Encoder", "kv.NilKeyEncoder", "kv.NoMetaEncoder"))
    assert(reg.chain(DoubleType, graft.coders.Coders.urlType).isEmpty)
  }

  test("coder chain matching is nullability-loose (a cast-built KVM struct still matches)") {
    // a KVM struct produced by map().cast(...) or literals carries
    // nullable=false fields but IS the declared KVM type — the chain
    // search must not demand flag-exact equality
    def strict(dt: DataType): DataType = dt match {
      case s: StructType => StructType(s.fields.map(f =>
        StructField(f.name, strict(f.dataType), nullable = false)))
      case a: ArrayType => ArrayType(strict(a.elementType), containsNull = false)
      case m: MapType => MapType(strict(m.keyType), strict(m.valueType), valueContainsNull = false)
      case other => other
    }
    val reg = graft.coders.Coders.registry
    val nonNullKvm = strict(graft.coders.Coders.kvmBinaryType)
    assert(nonNullKvm != graft.coders.Coders.kvmBinaryType)
    val chain = reg.chain(nonNullKvm, BinaryType)
    assert(chain.isDefined && chain.get.map(_.name) ==
      List("kv.NoMetaDecoder", "kv.IgnoreKeyDecoder"),
      s"expected the loose-matched decode chain, got $chain")
  }

  test(".limit on an UNBOUNDED root drains the stream and bounds the pipeline") {
    import graft.core._
    // the reference's '.Limit makes any pipeline bounded': an unbounded
    // DSv2 root + limit must route into the batch sink path with the
    // first n elements in stamp order — not crash with 'streaming
    // sources must be executed with writeStream.start()'
    val sink = new MemorySink
    val res = Pipeline(spark)
      .root(DataSourceV2Source("graft.sources.RecordsDataSource",
        Map("rows" -> "100", "rowsperbatch" -> "40"), bounded = false))
      .limit(5)
      .to(sink)
    assert(res == Sink.Done(5))
    val ids = sink.rows.map(r =>
      new String(r.getAs[Array[Byte]]("value"), "UTF-8")).toSeq
    assert(ids == (0 until 5).map(i => s"record-$i"),
      s"first 5 in stamp order, got $ids")
  }

  test("MemorySink rejects an unbounded flow with a clear remedy") {
    import graft.core._
    val e = intercept[IllegalArgumentException] {
      Pipeline(spark)
        .root(DataSourceV2Source("graft.sources.RecordsDataSource",
          Map("rows" -> "10"), bounded = false))
        .to(new MemorySink)
    }
    assert(e.getMessage.contains(".limit"))
  }

  /** M2: the reference's flagship e2e pipeline
    * (`examples/list-xml-filter-stdout/main.go:42-50`): 500k XML strings
    * → extract name → filter !contains("B") → running fold sum(length)
    * emitted every 50k fold inputs → keep emissions > 210000. Golden is
    * an independent plain-Scala reimplementation (≙ compare.go). */
  test("M2 e2e: list-xml-filter-stdout parity at 500k elements") {
    val names = Seq("Adam", "Albert", "Alice", "Alex", "Bart", "Bob",
      "Brittney", "Brenda", "Cecilia", "Chad", "Elliot", "Wojtek")
    val xmls = names.map(n => s"<name>$n</name>")
    val n = 500000L

    // independent oracle (plain scala, mirrors compare.go:10-87)
    val expected = {
      val kept = (0L until n).iterator
        .map(i => names((i % names.size).toInt))
        .filter(!_.contains("B"))
        .toVector
      val emissions = Vector.newBuilder[Long]
      var acc = 0L
      kept.zipWithIndex.foreach { case (nm, idx) =>
        acc += nm.length
        if ((idx + 1) % 50000 == 0 || idx + 1 == kept.size) emissions += acc
      }
      emissions.result().filter(_ > 210000)
    }

    val sink = new MemorySink
    val xmlSchema = StructType(Seq(StructField("_VALUE", StringType)))
    Pipeline(spark).root(RoundRobinSource(n, xmls))
      .mapRaw(v => from_xml(v, xmlSchema).getField("_VALUE"))
      .filter(v => !v.contains("B"))
      .map(LongType)(length(_).cast(LongType))
      .foldTriggered(50000)(sum)
      .filter(_ > 210000)
      .to(sink)
    assert(sink.values == expected)
  }

  test("user-defined coder extends the injection catalog (ref kafka-custom-avro-stdout)") {
    import graft.coders.Coders
    val versionedType = StructType(Seq(
      StructField("version", IntegerType), StructField("payload", BinaryType)))
    val enc = Coder("user.VersionedEncoder", BinaryType, versionedType)(c =>
      struct(lit(1).as("version"), c.as("payload")))
    val chain = (Coders.registry ++ Seq(enc)).chain(StringType, versionedType)
    assert(chain.isDefined &&
      chain.get.map(_.name) == List("str.Encoder", "user.VersionedEncoder"))
    val sink = new MemorySink
    Pipeline(spark).withCoders(enc)
      .root(ListSource(Seq("x")))
      .adapt(versionedType)
      .to(sink)
    val row = sink.rows.head.getAs[org.apache.spark.sql.Row]("value")
    assert(row.getInt(0) == 1)
    assert(new String(row.getAs[Array[Byte]](1), "UTF-8") == "x")
  }

  test("parOrdered restores the reference's order-preserving Par guarantee through narrow stages") {
    // plain par drops global order (documented divergence); parOrdered
    // opts back in. Assert on the RAW frame in partition order (no
    // sink-side sort — MemorySink re-sorts by uniq and would mask
    // this): range partitions are globally ordered and the two narrow
    // stages preserve intra-partition order, so collect() must yield
    // exact input order
    val flow = Pipeline(spark).root(ListSource((1 to 200).map(_.toString)))
      .map(IntegerType)(_.cast(IntegerType))
      .parOrdered(5)
      .map(IntegerType)(_ * 3)
      .filter(_ % 2 === 0)
    val seen = flow.df.select("value").collect().map(_.getInt(0)).toSeq
    assert(seen == (1 to 200).map(_ * 3).filter(_ % 2 == 0))
    // and the fan-out is real: 5 range partitions carry the data
    assert(flow.df.rdd.getNumPartitions == 5)
  }

  test("ConsoleBatchedSink (Out2 done right): capacity flushes + termination flush, exact count") {
    // single partition so the flush sequence is deterministic: 7 rows
    // at capacity 3 must arrive as chunks of 3, 3, 1 — the last one
    // from close(), the termination hook the reference's Out2 lacked
    ConsoleBatchedSinkProbe.chunks.clear()
    val sink = ConsoleBatchedSink(capacity = 3, emit = ConsoleBatchedSinkProbe.record)
    val res = Pipeline(spark).root(ListSource((1 to 7).map(_.toString)))
      .par(1)
      .to(sink)
    assert(res == Sink.Done(7))
    val chunks = {
      import scala.jdk.CollectionConverters._
      ConsoleBatchedSinkProbe.chunks.asScala.toSeq
    }
    val sizes = chunks.map(_.linesIterator.size)
    assert(sizes == Seq(3, 3, 1), s"flush chunk sizes: $sizes")
    // every row printed exactly once
    assert(chunks.flatMap(_.linesIterator).size == 7)
  }

  test("ConsoleBatchedSink streaming path returns a query handle (foreach writer)") {
    val sink = ConsoleBatchedSink(capacity = 100, emit = ConsoleBatchedSinkProbe.record)
    Pipeline(spark).root(RateSource(10)).to(sink) match {
      case Sink.Streaming(q) => assert(q.isActive); q.stop()
      case other => fail(s"expected streaming handle, got $other")
    }
  }
}

/** Driver-JVM flush collector for the local-mode sink tests (executor
  * threads share the JVM; the lambda references the module statically,
  * so the sink stays serializable). */
object ConsoleBatchedSinkProbe {
  val chunks = new java.util.concurrent.ConcurrentLinkedQueue[String]()
  val record: String => Unit = s => chunks.add(s)
}
