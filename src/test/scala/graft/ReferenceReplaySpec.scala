package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import graft.io.Sources
import graft.model.{OrderEvent, ReceiptEvent}
import graft.streaming.{OrderTimeoutStream, TxMatchStream}

/** Replay of the reference's bundled fixtures (read-only at
  * /root/reference/src/main/resources) against our operators, asserting the
  * data's documented reconciliation properties (FIXTURES.md §1):
  * 37 of 39 pay txIds match a receipt → 2 unmatched pays + 3 unmatched
  * receipts; 1 order created but never paid; 1 pay >15 min after create;
  * 1 pay with no create (order 34768).
  */
class ReferenceReplaySpec extends SparkSpec {
  import spark.implicits._

  private val res = "/root/reference/src/main/resources"

  private def pays = Sources.orderEventCsv(spark, s"$res/OrderLog.csv")
    .filter(_.txId.nonEmpty)
  private def receipts = Sources.receiptEventCsv(spark, s"$res/ReceiptLog.csv")

  test("batch reconciliation: 37 matched, 2 unmatched pays, 3 unmatched receipts") {
    val p = pays.toDF().select($"txId", $"ts".as("pay_ts"))
    val r = receipts.toDF().select($"txId".as("r_txid"), $"ts".as("receipt_ts"))
    val matched = p.join(r, $"txId" === $"r_txid")
    val unmatchedPays = p.join(r, $"txId" === $"r_txid", "left_anti")
    val unmatchedReceipts = r.join(p, $"txId" === $"r_txid", "left_anti")
    assert(matched.count() == 37)
    assert(unmatchedPays.count() == 2)
    assert(unmatchedReceipts.count() == 3)
  }

  test("streaming X4 clone reproduces the same reconciliation on replay") {
    implicit val sqlCtx = spark.sqlContext
    val pIn = MemoryStream[OrderEvent]
    val rIn = MemoryStream[ReceiptEvent]
    // generous waits: batch replay has no wall-clock; watermark jump flushes
    val q = TxMatchStream.detect(pIn.toDS(), rIn.toDS(),
        payWaitMs = 5000, receiptWaitMs = 3000).toDF()
      .writeStream.format("memory").queryName("ref_tx").outputMode("append").start()
    try {
      pIn.addData(pays.collect().toSeq)
      rIn.addData(receipts.collect().toSeq)
      q.processAllAvailable()
      // watermark far past every deadline flushes lonely sides
      pIn.addData(OrderEvent(0, "pay", "zzz_flush", ts9()))
      q.processAllAvailable()
      val got = spark.table("ref_tx").as[TxMatchStream.TxResult].collect()
        .filter(_.txId != "zzz_flush")
      assert(got.count(_.tag == "matched") == 37)
      assert(got.count(_.tag == "unmatched_pay") == 2)
      assert(got.count(_.tag == "unmatched_receipt") == 3)
    } finally q.stop()
  }

  private def ts9() = new java.sql.Timestamp(1999999999L * 1000L)

  test("streaming X3 on OrderLog: timeout & missing-create branches present") {
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[OrderEvent]
    val all = Sources.orderEventCsv(spark, s"$res/OrderLog.csv")
    val q = OrderTimeoutStream.detect(in.toDS()).toDF()
      .writeStream.format("memory").queryName("ref_orders").outputMode("append").start()
    try {
      in.addData(all.collect().toSeq)
      q.processAllAvailable()
      in.addData(OrderEvent(0, "create", "", ts9()))
      q.processAllAvailable()
      val got = spark.table("ref_orders").as[graft.model.OrderResult].collect()
        .filter(_.orderId != 0L)
      val byState = got.groupBy(_.resultState).view.mapValues(_.length).toMap
      // 39 create + 39 pay, one create never paid, one pay without create
      // (34768), one pay beyond the 15-min deadline
      assert(byState.getOrElse("timeout", 0) == 1)
      assert(byState.getOrElse("payed but not found created", 0) == 1)
      assert(byState.getOrElse("payed but already timeout", 0) == 1)
      assert(byState.getOrElse("payed successfully", 0) == 37)
      assert(got.length == 40)
      // the documented missing-create order
      assert(got.find(_.resultState == "payed but not found created")
        .get.orderId == 34768L)
    } finally q.stop()
  }
}
