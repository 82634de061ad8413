package graft

import java.sql.Timestamp
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.StreamingQuery
import graft.io.Sources
import graft.model.{OrderEvent, ReceiptEvent}
import graft.streaming.{CepLite, OrderTimeoutStream, TxMatchStream}

/** The transformWithState forms of the three keyed state machines must
  * reproduce every flatMapGroupsWithState scenario bit-for-bit: all four
  * order-timeout branches, out-of-order pay-before-create, asymmetric
  * lonely-side flushes, CEP match/timeout demux, and the reference
  * fixture replay (37 matched / 2 unmatched pays / 3 unmatched receipts).
  * Runs on the RocksDB state store, as transformWithState requires.
  */
class TwsMachinesSpec extends SparkSpec {
  import spark.implicits._

  private def ts(sec: Long) = new Timestamp(sec * 1000L)

  private def withRocksDb[A](body: => A): A = {
    val key = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.getOption(key)
    spark.conf.set(key,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try body
    finally prev match {
      case Some(p) => spark.conf.set(key, p)
      case None    => spark.conf.unset(key)
    }
  }

  private def runToMemory(df: org.apache.spark.sql.DataFrame, name: String)
      : StreamingQuery =
    df.writeStream.format("memory").queryName(name).outputMode("append").start()

  test("X3 on transformWithState: all four outcome branches") { withRocksDb {
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[OrderEvent]
    val q = runToMemory(
      OrderTimeoutStream.detectTws(in.toDS(), deadlineMs = 900 * 1000L).toDF(),
      "tws_order_results")
    try {
      in.addData(
        OrderEvent(1, "create", "t1", ts(10)), OrderEvent(1, "pay", "t1", ts(60)),
        OrderEvent(2, "create", "t2", ts(10)), OrderEvent(2, "pay", "t2", ts(1000)),
        OrderEvent(3, "create", "", ts(10)),
        OrderEvent(4, "pay", "t4", ts(10)))
      q.processAllAvailable()
      in.addData(OrderEvent(99, "create", "", ts(5000)))
      q.processAllAvailable()
      val got = spark.table("tws_order_results")
        .as[graft.model.OrderResult].collect()
        .map(r => r.orderId -> r.resultState).toMap
      assert(got(1L) == "payed successfully")
      assert(got(2L) == "payed but already timeout")
      assert(got(3L) == "timeout")
      assert(got(4L) == "payed but not found created")
    } finally q.stop()
  }}

  test("X3 on transformWithState: out-of-order pay-before-create") { withRocksDb {
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[OrderEvent]
    val q = runToMemory(
      OrderTimeoutStream.detectTws(in.toDS(), deadlineMs = 900 * 1000L).toDF(),
      "tws_order_ooo")
    try {
      in.addData(OrderEvent(7, "pay", "t7", ts(100)),
        OrderEvent(7, "create", "t7", ts(40)))
      q.processAllAvailable()
      // a stale deadline timer must NOT re-emit for the resolved order
      in.addData(OrderEvent(99, "create", "", ts(5000)))
      q.processAllAvailable()
      val got = spark.table("tws_order_ooo")
        .as[graft.model.OrderResult].collect()
      assert(got.map(r => r.orderId -> r.resultState).toMap ==
        Map(7L -> "payed successfully"))
      assert(got.length == 1)
    } finally q.stop()
  }}

  test("X4 on transformWithState: matched pair + asymmetric lonely flush") { withRocksDb {
    implicit val sqlCtx = spark.sqlContext
    val pays = MemoryStream[OrderEvent]
    val receipts = MemoryStream[ReceiptEvent]
    val q = runToMemory(
      TxMatchStream.detectTws(pays.toDS(), receipts.toDS()).toDF(),
      "tws_tx_results")
    try {
      pays.addData(OrderEvent(10, "pay", "A", ts(10)), OrderEvent(11, "pay", "B", ts(15)))
      receipts.addData(ReceiptEvent("A", "wechat", ts(12)), ReceiptEvent("C", "alipay", ts(20)))
      q.processAllAvailable()
      pays.addData(OrderEvent(99, "pay", "Z", ts(1000)))
      receipts.addData(ReceiptEvent("Z", "wechat", ts(1000)))
      q.processAllAvailable()
      val got = spark.table("tws_tx_results").as[TxMatchStream.TxResult].collect()
      val byTag = got.groupBy(_.tag).view.mapValues(_.map(_.txId).toSet).toMap
      assert(byTag("matched").contains("A"))
      assert(byTag("unmatched_pay") == Set("B"))
      assert(byTag("unmatched_receipt") == Set("C"))
    } finally q.stop()
  }}

  test("C1 on transformWithState: sequence match and within-timeout demux") { withRocksDb {
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[CepLite.KeyedEvent]
    val q = runToMemory(
      CepLite.detectTws(in.toDS(), Seq("create", "pay"), withinMs = 900 * 1000L).toDF(),
      "tws_cep_results")
    try {
      in.addData(
        CepLite.KeyedEvent(1, "create", 1000), CepLite.KeyedEvent(1, "pay", 60000),
        CepLite.KeyedEvent(2, "create", 1000),
        CepLite.KeyedEvent(3, "other", 1000), CepLite.KeyedEvent(3, "create", 1500),
        CepLite.KeyedEvent(3, "noise", 2000), CepLite.KeyedEvent(3, "pay", 3000))
      q.processAllAvailable()
      in.addData(CepLite.KeyedEvent(99, "other", 5000 * 1000L))
      q.processAllAvailable()
      val got = spark.table("tws_cep_results").as[CepLite.CepMatch].collect()
      val byKey = got.map(m => m.key -> m.tag).toMap
      assert(byKey(1L) == "matched")
      assert(byKey(2L) == "timeout")
      assert(byKey(3L) == "matched")
    } finally q.stop()
  }}

  test("TWS state AND timers survive a checkpointed restart exactly-once") { withRocksDb {
    implicit val sqlCtx = spark.sqlContext
    val ckpt = java.nio.file.Files.createTempDirectory("tws_ckpt").toString
    val outDir = java.nio.file.Files.createTempDirectory("tws_out").toString
    val in = MemoryStream[OrderEvent]
    def start() = OrderTimeoutStream.detectTws(in.toDS(), deadlineMs = 60000).toDF()
      .writeStream.format("parquet")
      .option("path", outDir)
      .option("checkpointLocation", ckpt)
      .outputMode("append").start()

    val q1 = start()
    in.addData(OrderEvent(1, "create", "a", ts(10)), OrderEvent(1, "pay", "a", ts(20)),
      OrderEvent(2, "create", "b", ts(10))) // order 2 parks with a live timer
    q1.processAllAvailable()
    q1.stop()

    // restart: order 2's ValueState and its 70 s deadline timer must both
    // come back from the checkpoint; the watermark jump then fires it
    val q2 = start()
    in.addData(OrderEvent(3, "create", "c", ts(30)), OrderEvent(3, "pay", "c", ts(40)),
      OrderEvent(9, "create", "", ts(10000)))
    q2.processAllAvailable()
    q2.stop()

    val out = spark.read.parquet(outDir).as[graft.model.OrderResult].collect()
      .filter(_.orderId != 9L)
    val byOrder = out.groupBy(_.orderId).view.mapValues(_.map(_.resultState)).toMap
    assert(byOrder(1L).toSeq == Seq("payed successfully")) // exactly once
    assert(byOrder(3L).toSeq == Seq("payed successfully"))
    assert(byOrder(2L).toSeq == Seq("timeout")) // state + timer survived
    assert(out.length == 3)
  }}

  // ---- reference fixture replays (FIXTURES.md §1 reconciliation) ----

  private val res = "/root/reference/src/main/resources"
  private def ts9() = new Timestamp(1999999999L * 1000L)

  test("X4 replay on transformWithState: 37 matched / 2 pays / 3 receipts") { withRocksDb {
    implicit val sqlCtx = spark.sqlContext
    val pIn = MemoryStream[OrderEvent]
    val rIn = MemoryStream[ReceiptEvent]
    val q = runToMemory(
      TxMatchStream.detectTws(pIn.toDS(), rIn.toDS(),
        payWaitMs = 5000, receiptWaitMs = 3000).toDF(), "tws_ref_tx")
    try {
      pIn.addData(Sources.orderEventCsv(spark, s"$res/OrderLog.csv")
        .filter(_.txId.nonEmpty).collect().toSeq)
      rIn.addData(Sources.receiptEventCsv(spark, s"$res/ReceiptLog.csv")
        .collect().toSeq)
      q.processAllAvailable()
      pIn.addData(OrderEvent(0, "pay", "zzz_flush", ts9()))
      q.processAllAvailable()
      val got = spark.table("tws_ref_tx").as[TxMatchStream.TxResult].collect()
        .filter(_.txId != "zzz_flush")
      assert(got.count(_.tag == "matched") == 37)
      assert(got.count(_.tag == "unmatched_pay") == 2)
      assert(got.count(_.tag == "unmatched_receipt") == 3)
    } finally q.stop()
  }}

  test("X3 replay on transformWithState: 37/1/1/1 branch counts") { withRocksDb {
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[OrderEvent]
    val q = runToMemory(
      OrderTimeoutStream.detectTws(in.toDS()).toDF(), "tws_ref_orders")
    try {
      in.addData(Sources.orderEventCsv(spark, s"$res/OrderLog.csv")
        .collect().toSeq)
      q.processAllAvailable()
      in.addData(OrderEvent(0, "create", "", ts9()))
      q.processAllAvailable()
      val got = spark.table("tws_ref_orders").as[graft.model.OrderResult]
        .collect().filter(_.orderId != 0L)
      val byState = got.groupBy(_.resultState).view.mapValues(_.length).toMap
      assert(byState.getOrElse("payed successfully", 0) == 37)
      assert(byState.getOrElse("payed but already timeout", 0) == 1)
      assert(byState.getOrElse("timeout", 0) == 1)
      assert(byState.getOrElse("payed but not found created", 0) == 1)
      assert(got.length == 40)
      assert(got.find(_.resultState == "payed but not found created")
        .get.orderId == 34768L)
    } finally q.stop()
  }}
}
