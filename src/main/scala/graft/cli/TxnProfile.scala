package graft.cli

import org.apache.spark.sql.SparkSession

/** Scratch profiler for the kafka-wire txn query's legs (publish /
  * read_uncommitted / read_committed / decode+sort) — identifies which
  * leg carries the superlinear term at sf1.0. Not registered anywhere;
  * run by hand: tools/run.sh graft.cli.TxnProfile <sfDir>.
  */
object TxnProfile {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val spark = SparkSession.builder().master("local[32]")
      .appName("txn-profile")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def t[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[txnprofile] $label: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }
    val broker = new graft.kafka.KafkaStubBroker(3)
    broker.start()
    try {
      val exchange = new graft.kafka.KafkaWireExchange("127.0.0.1", broker.port,
        transactionalId = Some("graft-eos"))
      val wire = graft.streaming.Ingest.toJsonWire(
        graft.core.Tables.events(spark, dir), "event_id")
      t("publish x2 (1 killed + 1 committed)") {
        exchange.publish(wire,
          graft.replay.Replay.ReplayConfig(input = "", topic = "events-txn",
            repeat = 2))
      }
      val unc = t("read_uncommitted count") {
        exchange.read(spark, "events-txn").count()
      }
      val committed = exchange.readCommitted(spark, "events-txn")
      val com = t("read_committed count") { committed.count() }
      println(s"[txnprofile] uncommitted=$unc committed=$com")
      val decodedFlat = graft.streaming.Ingest.decodeJsonWire(committed)
        .select("event_id", "user_id", "event_type", "value")
      t("decode only (count)") { decodedFlat.count() }
      t("decode+spill unsorted") {
        graft.core.Spill.materialize(decodedFlat)(())
      }
      t("decode+sort+materialize") {
        val decoded = decodedFlat.orderBy("event_id")
        graft.core.Spill.materialize(decoded)(())
      }
    } finally broker.stop()
    spark.stop()
  }
}
