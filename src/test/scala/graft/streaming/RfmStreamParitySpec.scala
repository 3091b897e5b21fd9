package graft.streaming

import org.apache.spark.sql.{Row, SparkSession}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode

import graft.SparkSpec
import graft.ext.Relational

/**
 * [[RfmStream]] vs batch [[Relational.rfmSegments]]: the per-customer
 * registers are max/count/sum (associative + commutative), so the
 * streamed register table must equal the batch rollup EXACTLY under
 * any micro-batch slicing, and scoring the register snapshot with the
 * shared [[Relational.rfmSegmentsFromRollup]] must reproduce batch
 * segments row for row — exact int64 equality, no FP tolerance
 * (spend is e4 BIGINT money end to end).
 */
class RfmStreamParitySpec extends SparkSpec {
  implicit lazy val s: SparkSession = spark
  import s.implicits._
  implicit lazy val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext

  // 9 customers spread across the R/F/M terciles: recency from 1992 to
  // 1998, frequency 1..5 orders, spend two orders of magnitude apart —
  // every score dimension takes all three values somewhere
  private lazy val orders: Seq[(Long, String, Double)] = Seq(
    (1L, "1992-01-05", 120.50), (1L, "1992-03-01", 80.25),
    (2L, "1993-06-10", 15000.00),
    (3L, "1994-02-20", 300.00), (3L, "1994-05-11", 310.10),
    (3L, "1994-08-30", 290.40),
    (4L, "1995-07-04", 50.00),
    (5L, "1996-10-19", 7200.99), (5L, "1996-11-02", 6800.01),
    (6L, "1997-01-15", 999.99), (6L, "1997-02-15", 1000.01),
    (6L, "1997-03-15", 1000.00), (6L, "1997-04-15", 1.11),
    (7L, "1997-12-31", 25000.00),
    (8L, "1998-05-05", 64.32), (8L, "1998-06-06", 128.64),
    (8L, "1998-07-07", 256.28), (8L, "1998-01-01", 32.16),
    (8L, "1998-02-02", 16.08),
    (9L, "1998-08-01", 4500.00))

  private def keyed(rows: Array[Row]): Map[Long, Seq[Any]] =
    rows.map(r => r.getLong(0) -> r.toSeq.tail).toMap

  test("streamed registers + shared scoring equal batch rfmSegments under sliced input") {
    val ordersDf = orders.toDF("o_custkey", "o_orderdate", "o_totalprice")
    val batch = keyed(Relational.rfmSegments(ordersDf).collect())

    val in = MemoryStream[(Long, String, Double)]
    val q = RfmStream.customerRegisters(
        in.toDF().toDF("o_custkey", "o_orderdate", "o_totalprice"))
      .writeStream.format("memory").queryName("rfm_regs")
      .outputMode(OutputMode.Update).start()
    try {
      // shuffled, uneven micro-batches — customers 1/3/6/8 split across
      // batches so their registers update incrementally
      val shuffled = Seq(orders(3), orders(17), orders(0), orders(9),
        orders(6), orders(12), orders(2), orders(15), orders(19),
        orders(4), orders(10), orders(1), orders(18), orders(7),
        orders(13), orders(5), orders(16), orders(8), orders(11),
        orders(14))
      assert(shuffled.toSet == orders.toSet && shuffled.size == orders.size)
      in.addData(shuffled.slice(0, 7): _*); q.processAllAvailable()
      in.addData(shuffled.slice(7, 8): _*); q.processAllAvailable()
      in.addData(shuffled.slice(8, 20): _*); q.processAllAvailable()

      val snap = RfmStream.registerSnapshot(spark.table("rfm_regs"))
      // register table parity first: exactly the batch rollup
      assert(keyed(snap.collect()) ==
        keyed(Relational.rfmRollup(ordersDf).collect()))
      // then end-to-end segment parity through the shared scoring half
      val streamed = keyed(Relational.rfmSegmentsFromRollup(snap).collect())
      assert(streamed == batch)
      assert(streamed.size == 9)
      // sanity: the fixture really exercises the score range
      val segs = streamed.values.map(_.last.asInstanceOf[Long]).toSet
      assert(segs.size >= 4, s"degenerate fixture: $segs")
    } finally q.stop()
  }

  test("update-mode changelog only re-emits touched customers") {
    val in = MemoryStream[(Long, String, Double)]
    val q = RfmStream.customerRegisters(
        in.toDF().toDF("o_custkey", "o_orderdate", "o_totalprice"))
      .writeStream.format("memory").queryName("rfm_regs_delta")
      .outputMode(OutputMode.Update).start()
    try {
      in.addData(orders.slice(0, 7): _*); q.processAllAvailable()
      val before = spark.table("rfm_regs_delta").count()
      // one new order for customer 4 only → exactly one changelog row
      in.addData((4L, "1995-09-09", 75.00)); q.processAllAvailable()
      val delta = spark.table("rfm_regs_delta").collect().drop(before.toInt)
      assert(delta.map(_.getLong(0)).toSeq == Seq(4L))
      assert(delta.head.getLong(2) == 2L) // n_orders register advanced
    } finally q.stop()
  }
}
