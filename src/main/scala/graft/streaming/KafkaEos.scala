package graft.streaming

import org.apache.spark.TaskContext
import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.DataStreamWriter

/** Transactional exactly-once Kafka sink — the Spark twin of the
  * reference's `processing.guarantee=exactly_once_v2`
  * (reference KafkaStreamApp.java:124-126).
  *
  * Shape: a `foreachBatch` writer where every Spark partition of every
  * micro-batch produces inside ONE Kafka transaction, with a
  * batch-ledger marker record in the same transaction:
  *
  *  - `transactional.id` is stable per (sink, partition) — so a task
  *    retry or a zombie executor from a previous attempt is FENCED by
  *    the broker the moment the new attempt calls `initTransactions()`
  *    (epoch bump), and its in-flight transaction is aborted. Stable
  *    ids per partition are what EOS v2 keys fencing on.
  *  - data records and a `(transactionalId -> batchId)` marker to a
  *    control topic commit ATOMICALLY. Consumers at
  *    `isolation.level=read_committed` never see aborted data.
  *  - on redelivery (Spark replays the last unacknowledged micro-batch
  *    from the checkpoint after a crash), the writer reads the ledger
  *    AFTER fencing and SKIPS partitions whose marker already
  *    committed — transactions alone don't dedup across transactions,
  *    the ledger is what makes replay idempotent.
  *
  * Failure matrix (each row pinned in KafkaEosSpec):
  *   crash before commit  -> transaction aborts, invisible at
  *                           read_committed; retry produces once.
  *   crash after commit   -> marker committed; replay skips.
  *   zombie producer      -> fenced at commit (epoch check).
  *   partial batch        -> committed partitions skip, failed ones
  *                           retry — per-partition ledger granularity.
  *
  * The broker API is the transactional slice of
  * `org.apache.kafka.clients.producer.KafkaProducer`, behind
  * [[TxProducer]]: this environment ships no kafka-clients jar (zero
  * egress), so the real binding is a thin adapter a deployment wraps
  * around `new KafkaProducer(props)` — every call here maps 1:1 to a
  * KafkaProducer method, and the semantics are pinned against an
  * in-memory broker that implements the same fencing/visibility rules.
  */
object KafkaEos {

  /** The transactional slice of KafkaProducer. One instance per
    * (transactional id, attempt); NOT thread-safe, like the real one.
    */
  trait TxProducer {
    /** Register the transactional id, bump its epoch, fence zombies. */
    def initTransactions(): Unit
    def beginTransaction(): Unit
    /** Buffer a record into the open transaction. */
    def send(topic: String, key: Array[Byte], value: Array[Byte]): Unit
    /** Atomically publish every buffered record. Throws if fenced. */
    def commitTransaction(): Unit
    /** Discard every buffered record. */
    def abortTransaction(): Unit
    def close(): Unit
  }

  /** Producer construction + ledger read. Serializable: instances are
    * shipped to executors inside the foreachPartition closure, so real
    * implementations carry only config (bootstrap servers etc.), never
    * live connections.
    */
  trait TxProducerFactory extends Serializable {
    def create(transactionalId: String): TxProducer

    /** Highest batchId whose marker committed under `transactionalId`,
      * or -1L. Real binding: consume `controlTopic` with
      * `isolation.level=read_committed` and take the last value keyed
      * by the id. Called after [[TxProducer.initTransactions]] fenced
      * older writers, so the read cannot race a concurrent commit for
      * the same id.
      */
    def lastCommittedBatch(transactionalId: String, controlTopic: String): Long
  }

  private[graft] def longBytes(v: Long): Array[Byte] =
    java.nio.ByteBuffer.allocate(8).putLong(v).array()
  private[graft] def bytesLong(b: Array[Byte]): Long =
    java.nio.ByteBuffer.wrap(b).getLong

  /** Produce one micro-batch transactionally. `batch` must already be
    * in wire shape (string/binary `key` and `value` columns, e.g. from
    * [[ModerationStream.encodeKafka]]).
    */
  def writeBatchTransactional(batch: DataFrame, batchId: Long, topic: String,
                              controlTopic: String, sinkId: String,
                              factory: TxProducerFactory): Unit = {
    val wire = batch.select(
      col("key").cast("binary").as("key"),
      col("value").cast("binary").as("value"))
    wire.foreachPartition { (it: Iterator[Row]) =>
      val txId = s"$sinkId-p${TaskContext.getPartitionId()}"
      val p = factory.create(txId)
      try {
        p.initTransactions() // fence first: we are now the sole writer
        if (factory.lastCommittedBatch(txId, controlTopic) < batchId) {
          p.beginTransaction()
          var ok = false
          try {
            it.foreach(r => p.send(topic,
              r.getAs[Array[Byte]]("key"), r.getAs[Array[Byte]]("value")))
            // the ledger marker rides in the SAME transaction: it is
            // visible iff the data committed
            p.send(controlTopic, txId.getBytes("UTF-8"), longBytes(batchId))
            p.commitTransaction()
            ok = true
          } finally if (!ok) p.abortTransaction()
        } // else: replayed batch, already committed — skip
      } finally p.close()
    }
  }

  /** Streaming wiring: checkpointed foreachBatch over
    * [[writeBatchTransactional]] — end-to-end exactly-once from a
    * replayable source to Kafka, the reference's EOS v2 contract.
    */
  def toKafkaTransactional(df: DataFrame, topic: String, controlTopic: String,
                           sinkId: String, factory: TxProducerFactory,
                           checkpointDir: String): DataStreamWriter[Row] =
    ModerationStream.encodeKafka(df).writeStream
      .foreachBatch((b: DataFrame, id: Long) =>
        writeBatchTransactional(b, id, topic, controlTopic, sinkId, factory))
      .option("checkpointLocation", checkpointDir)
}
