package graft.sources

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.connector.read.streaming.{MicroBatchStream, Offset}
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap

import java.util

/** A complete DataSource V2 connector (batch + micro-batch streaming)
  * for deterministic synthetic records — the skeleton a production
  * queue connector (the reference's `amqp09.Source`/`kafka1.Source`,
  * SURVEY §2.1) drops its client code into:
  *
  *   - `TableProvider → Table → ScanBuilder → Batch` is the bounded
  *     path: `planInputPartitions` splits the id range so every
  *     executor reads its own slice (≙ consuming a partitioned topic).
  *   - `MicroBatchStream` is the unbounded path: `latestOffset`
  *     advances by `rowsPerBatch` per trigger (≙ broker poll), the
  *     engine persists offsets in the checkpoint log, and `commit`
  *     is the at-least-once source commit (≙ cumulative ack,
  *     `io/amqp09/source.go:96-143`).
  *
  * Usage: `spark.read.format("graft.sources.RecordsDataSource")
  * .option("rows", 1000).option("partitions", 8).load()` — and the
  * same format string on `readStream`.
  *
  * Scale: partition count is the parallelism contract; readers are
  * pure per-partition iterators with no driver involvement after
  * planning.
  */
class RecordsDataSource extends TableProvider {
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    RecordsDataSource.schema
  override def getTable(schema: StructType, partitioning: Array[Transform],
                        properties: util.Map[String, String]): Table = {
    // the engine hands getTable the CASE-SENSITIVE map — wrap it so the
    // naturally-cased .option("rowsPerBatch", ...) spelling is honored
    // rather than silently falling back to the default
    val opts = new CaseInsensitiveStringMap(properties)
    new RecordsTable(opts.getLong("rows", 100L),
      opts.getInt("partitions", 4),
      opts.getLong("rowsperbatch", 10L))
  }
}

object RecordsDataSource {
  val schema: StructType = StructType(Seq(
    StructField("id", LongType, nullable = false),
    StructField("body", BinaryType),
    StructField("ts", TimestampType)))
  /** Deterministic record payload for id i. */
  def bodyFor(i: Long): Array[Byte] = s"record-$i".getBytes("UTF-8")
  def tsFor(i: Long): Long = 1704067200000000L + i * 1000000L // 2024-01-01 + i sec, micros
}

private class RecordsTable(rows: Long, partitions: Int, rowsPerBatch: Long)
  extends Table with SupportsRead {
  override def name(): String = s"graft-records($rows)"
  override def schema(): StructType = RecordsDataSource.schema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ, TableCapability.MICRO_BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    () => new RecordsScan(rows, partitions, rowsPerBatch)
}

private class RecordsScan(rows: Long, partitions: Int, rowsPerBatch: Long) extends Scan {
  override def readSchema(): StructType = RecordsDataSource.schema

  override def toBatch: Batch = new Batch {
    override def planInputPartitions(): Array[InputPartition] = {
      val per = math.max(1L, (rows + partitions - 1) / partitions)
      (0L until rows by per).map(s => RecordsRange(s, math.min(s + per, rows))
        .asInstanceOf[InputPartition]).toArray
    }
    override def createReaderFactory(): PartitionReaderFactory = new RecordsReaderFactory
  }

  override def toMicroBatchStream(checkpointLocation: String): MicroBatchStream =
    new MicroBatchStream
      with org.apache.spark.sql.connector.read.streaming.SupportsTriggerAvailableNow {
      /** All `rows` are available from the start; the poll cursor keeps
        * its per-batch cadence and plateaus at `rows`, which satisfies
        * the AvailableNow contract (drain everything, then stop) —
        * without this trait the engine wraps the source and captures a
        * SINGLE poll, draining only one batch (≙ a Kafka source
        * snapshotting end offsets at query start). */
      override def prepareForTriggerAvailableNow(): Unit = ()
      /** Admission-control form the trait requires: our rowsPerBatch
        * cadence IS the admission policy, so the engine-supplied
        * ReadLimit is subsumed by the poll step. */
      override def latestOffset(start: Offset,
                                limit: org.apache.spark.sql.connector.read.streaming.ReadLimit): Offset =
        latestOffset()
      private var polled = 0L
      override def latestOffset(): Offset = {
        // broker-poll analogue: each poll surfaces up to rowsPerBatch
        // new records; the cursor advances independently of commits
        // (commits only bound replay on restart, like a consumer group)
        polled = math.min(polled + rowsPerBatch, rows)
        RecordsOffset(polled)
      }
      override def initialOffset(): Offset = RecordsOffset(0L)
      override def deserializeOffset(json: String): Offset = {
        // restart path: the engine replays the checkpointed offset —
        // resume the poll cursor there so latestOffset never regresses
        // behind what the checkpoint already committed
        val pos = json.toLong
        polled = math.max(polled, pos)
        RecordsOffset(pos)
      }
      override def planInputPartitions(start: Offset, end: Offset): Array[InputPartition] = {
        // the micro-batch honors the same parallelism contract as the
        // bounded path: the [start, end) slice splits across
        // `partitions` readers instead of pinning each trigger to one
        // task (a real queue connector maps these to topic partitions)
        val s = start.asInstanceOf[RecordsOffset].pos
        val e = end.asInstanceOf[RecordsOffset].pos
        val per = math.max(1L, (e - s + partitions - 1) / partitions)
        (s until e by per).map(lo => RecordsRange(lo, math.min(lo + per, e))
          .asInstanceOf[InputPartition]).toArray
      }
      override def createReaderFactory(): PartitionReaderFactory = new RecordsReaderFactory
      override def commit(end: Offset): Unit = ()
      // commit(end) is where a real connector cumulatively acks the
      // broker (io/amqp09/source.go:96-143); this synthetic source has
      // nothing to release — replay bounds live entirely in the
      // engine's checkpointed offsets
      override def stop(): Unit = ()
    }
}

private case class RecordsOffset(pos: Long) extends Offset {
  override def json(): String = pos.toString
}

private case class RecordsRange(start: Long, end: Long) extends InputPartition

private class RecordsReaderFactory extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val r = partition.asInstanceOf[RecordsRange]
    new PartitionReader[InternalRow] {
      private var i = r.start - 1
      override def next(): Boolean = { i += 1; i < r.end }
      override def get(): InternalRow =
        InternalRow(i, RecordsDataSource.bodyFor(i), RecordsDataSource.tsFor(i))
      override def close(): Unit = ()
    }
  }
}
