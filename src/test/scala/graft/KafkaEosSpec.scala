package graft

import java.nio.file.Files

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.ops.Moderation.Message
import graft.streaming.KafkaEos
import graft.MockKafkaBroker.{Factory, broker, reset}

/** Executes the transactional Kafka EOS writer's failure matrix
  * (SURVEY §2 T1, the reference's exactly_once_v2 twin —
  * KafkaStreamApp.java:124-126) against the in-memory broker:
  * commit atomicity, abort invisibility at read_committed, replay
  * idempotency via the batch ledger, and zombie fencing.
  */
class KafkaEosSpec extends SparkSpec {
  import spark.implicits._

  private def name(tag: String) = s"eos-$tag-${System.nanoTime()}"

  private def msgs(n: Int): Seq[Message] =
    (1 to n).map(i => Message(s"u$i", s"text $i", s"r$i"))

  private def wire(ms: Seq[Message]) =
    graft.streaming.ModerationStream.encodeKafka(ms.toDF())
      .repartition(2) // >1 partition: per-partition transactions

  test("happy path: records + ledger marker commit atomically, visible once") {
    val bn = name("happy")
    try {
      KafkaEos.writeBatchTransactional(wire(msgs(5)), 0L, "out", "ctl", "sink", Factory(bn))
      val out = broker(bn).consumeCommitted("out")
      assert(out.map(_.keyString).sorted === (1 to 5).map(i => s"u$i").sorted)
      // one marker per non-empty partition, all batch 0
      val ctl = broker(bn).consumeCommitted("ctl")
      assert(ctl.nonEmpty && ctl.forall(r => KafkaEos.bytesLong(r.value) === 0L))
      assert(broker(bn).aborted.isEmpty)
    } finally reset(bn)
  }

  test("crash before commit aborts: nothing visible at read_committed, retry lands once") {
    val bn = name("abort")
    try {
      broker(bn).failNextSends = 1 // first send of the attempt throws
      intercept[org.apache.spark.SparkException] {
        KafkaEos.writeBatchTransactional(wire(msgs(4)), 0L, "out", "ctl", "sink", Factory(bn))
      }
      // Spark task retries may have succeeded on re-attempt for the
      // failing partition (that IS the EOS contract) — what must hold:
      // no duplicate data, no aborted record ever visible
      val afterCrash = broker(bn).consumeCommitted("out").map(_.keyString)
      assert(afterCrash.distinct.length === afterCrash.length, "dup after crash")
      // driver-level redelivery of the whole batch (checkpoint replay)
      KafkaEos.writeBatchTransactional(wire(msgs(4)), 0L, "out", "ctl", "sink", Factory(bn))
      val out = broker(bn).consumeCommitted("out").map(_.keyString).sorted
      assert(out === (1 to 4).map(i => s"u$i").sorted, s"not exactly-once: $out")
    } finally reset(bn)
  }

  test("replay of a committed batch is skipped by the ledger; a NEW batch still writes") {
    val bn = name("replay")
    try {
      val f = Factory(bn)
      KafkaEos.writeBatchTransactional(wire(msgs(3)), 7L, "out", "ctl", "sink", f)
      val once = broker(bn).consumeCommitted("out").length
      // redelivered same batchId: transactions alone would duplicate —
      // the ledger must skip
      KafkaEos.writeBatchTransactional(wire(msgs(3)), 7L, "out", "ctl", "sink", f)
      assert(broker(bn).consumeCommitted("out").length === once, "replay duplicated")
      // a LATER batch for the same sink must still write
      KafkaEos.writeBatchTransactional(wire(msgs(2)), 8L, "out", "ctl", "sink", f)
      assert(broker(bn).consumeCommitted("out").length === once + 2)
    } finally reset(bn)
  }

  test("zombie producer is fenced: stale epoch cannot commit, buffered data stays invisible") {
    val bn = name("fence")
    try {
      val f = Factory(bn)
      val zombie = f.create("sink-p0")
      zombie.initTransactions()
      zombie.beginTransaction()
      zombie.send("out", "k".getBytes, "stale".getBytes)
      // a new attempt takes over the SAME transactional id
      val fresh = f.create("sink-p0")
      fresh.initTransactions() // epoch bump: zombie is now fenced
      val e = intercept[IllegalStateException](zombie.commitTransaction())
      assert(e.getMessage.contains("Fenced"), e.getMessage)
      assert(broker(bn).consumeCommitted("out").isEmpty, "zombie data leaked")
      // the fresh producer is unaffected
      fresh.beginTransaction()
      fresh.send("out", "k".getBytes, "new".getBytes)
      fresh.commitTransaction()
      assert(broker(bn).consumeCommitted("out").map(_.valueString) === Seq("new"))
    } finally reset(bn)
  }

  test("end-to-end streaming: checkpointed query + crash-replayed batch stays exactly-once") {
    implicit val ctx = spark.sqlContext
    val bn = name("stream")
    val ckpt = Files.createTempDirectory("graft_eos_kafka").toString
    try {
      val f = Factory(bn)
      val mem = MemoryStream[Message]
      def start() = KafkaEos.toKafkaTransactional(
        mem.toDF(), "filtered", "ctl", "mod", f, ckpt).start()
      val q = start()
      try {
        mem.addData(msgs(3): _*)
        q.processAllAvailable()
        mem.addData(msgs(5).drop(3): _*)
        q.processAllAvailable()
      } finally q.stop()
      val firstRun = broker(bn).consumeCommitted("filtered").map(_.keyString).sorted
      assert(firstRun === (1 to 5).map(i => s"u$i").sorted)
      // crash/restart from the same checkpoint: Structured Streaming
      // replays the last batch into foreachBatch with the SAME batchId;
      // the ledger must keep the output exactly-once
      val q2 = start()
      try {
        mem.addData(Message("u6", "text 6", "r6"))
        q2.processAllAvailable()
      } finally q2.stop()
      val after = broker(bn).consumeCommitted("filtered").map(_.keyString).sorted
      assert(after === (1 to 6).map(i => s"u$i").sorted, s"restart broke EOS: $after")
    } finally reset(bn)
  }
}
