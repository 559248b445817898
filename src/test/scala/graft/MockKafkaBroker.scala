package graft

import scala.collection.mutable

import graft.streaming.KafkaEos.{TxProducer, TxProducerFactory}

/** In-memory transactional broker implementing the Kafka semantics
  * [[graft.streaming.KafkaEos]] relies on — epoch fencing, atomic
  * commit, read_committed invisibility of aborted data — so the EOS
  * writer's failure matrix is executable without a kafka-clients jar.
  *
  * Single-JVM by design (local[*] tests): broker state lives in a
  * process-wide registry keyed by broker name, and the factory ships
  * only the name through the foreachPartition closure — the same trick
  * Spark's own MemorySink uses.
  */
object MockKafkaBroker {

  final case class Rec(topic: String, key: Array[Byte], value: Array[Byte]) {
    def keyString: String = new String(key, "UTF-8")
    def valueString: String = new String(value, "UTF-8")
  }

  final class Broker {
    val committed = mutable.ArrayBuffer.empty[Rec] // commit order
    val aborted = mutable.ArrayBuffer.empty[Rec]
    val epochs = mutable.HashMap.empty[String, Long] // txId -> epoch
    var failNextSends = 0 // fault injection: next N sends throw

    /** read_committed consumer view of one topic. */
    def consumeCommitted(topic: String): Seq[Rec] = synchronized {
      committed.filter(_.topic == topic).toSeq
    }
  }

  private val registry = new java.util.concurrent.ConcurrentHashMap[String, Broker]()

  def broker(name: String): Broker =
    registry.computeIfAbsent(name, _ => new Broker)

  def reset(name: String): Unit = registry.remove(name)

  final class Producer(b: Broker, txId: String) extends TxProducer {
    private var epoch = -1L
    private val buffer = mutable.ArrayBuffer.empty[Rec]
    private var open = false

    private def checkFenced(): Unit = b.synchronized {
      if (b.epochs.getOrElse(txId, -1L) != epoch)
        throw new IllegalStateException(
          s"ProducerFencedException: $txId epoch $epoch superseded")
    }

    override def initTransactions(): Unit = b.synchronized {
      // epoch bump: every older producer with this id is now fenced,
      // and its open transaction is implicitly aborted (its buffer
      // can never commit past checkFenced)
      epoch = b.epochs.getOrElse(txId, -1L) + 1
      b.epochs(txId) = epoch
    }

    override def beginTransaction(): Unit = {
      checkFenced(); buffer.clear(); open = true
    }

    override def send(topic: String, key: Array[Byte], value: Array[Byte]): Unit = {
      checkFenced()
      require(open, s"$txId: send outside a transaction")
      b.synchronized {
        if (b.failNextSends > 0) {
          b.failNextSends -= 1
          throw new RuntimeException(s"injected broker failure for $txId")
        }
      }
      buffer += Rec(topic, key, value)
    }

    override def commitTransaction(): Unit = b.synchronized {
      checkFenced() // a fenced zombie must NOT publish
      require(open, s"$txId: commit outside a transaction")
      b.committed ++= buffer // atomic: all-or-nothing under the lock
      buffer.clear(); open = false
    }

    override def abortTransaction(): Unit = b.synchronized {
      b.aborted ++= buffer
      buffer.clear(); open = false
    }

    override def close(): Unit = { buffer.clear(); open = false }
  }

  /** Factory shipping only the broker NAME through task closures. */
  final case class Factory(brokerName: String) extends TxProducerFactory {
    override def create(transactionalId: String): TxProducer =
      new Producer(broker(brokerName), transactionalId)

    override def lastCommittedBatch(txId: String, controlTopic: String): Long = {
      val b = broker(brokerName)
      b.synchronized {
        b.committed.iterator
          .filter(r => r.topic == controlTopic && r.keyString == txId)
          .map(r => graft.streaming.KafkaEos.bytesLong(r.value))
          .foldLeft(-1L)(math.max)
      }
    }
  }
}
