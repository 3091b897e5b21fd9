package graft

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

import graft.streaming.{EventsStream, IdStreamEvent, RfmStream, StreamEvent}

/**
 * Streaming SCALE probe (r12, VERDICT r11 ask #5): the stateful
 * streaming twins are parity- and checkpoint-pinned by spec, and their
 * state bounds are argued by construction — this main MEASURES them
 * across the same data decades the batch kernels certify. Each op is
 * driven through a MemoryStream in event-time order (the parity specs'
 * mechanism, so the probe exercises exactly the spec-pinned code path)
 * in fixed-size micro-batch chunks, against the events/orders tables of
 * each available scale dir (sf0.1 → target/sfx1 → target/sfx10 = two
 * decades), recording per (op, scale):
 *
 *   - throughput: input rows, wall seconds, rows/s;
 *   - state: peak and final state-store rows, final state bytes
 *     (StreamingQueryProgress.stateOperators — the store's own
 *     accounting, not an argued bound);
 *   - watermark health: rows dropped as late (ts-ordered feed ⇒ ~0).
 *
 * The claim under test: state grows with LIVE KEYS (users / customers /
 * the Space-Saving capacity), never with stream length — so a 10×
 * events replica (same time span, 10× users via ScaleUp id offsets)
 * should show ~10× state for the user-keyed ops, constant state for the
 * capacity-bounded sketch, and ~flat rows/s. Writes stream_bench.json.
 *
 * Driver-side collect of the input tables is the PROBE's mechanism
 * (MemoryStream is driver-fed by design — the parity specs do the
 * same); the operators under test never collect anything.
 */
object StreamBench {

  /** One op × scale measurement. */
  private final case class Probe(rows: Long, wallSec: Double, batches: Long,
      peakStateRows: Long, finalStateRows: Long, finalStateBytes: Long,
      droppedLate: Long)

  /** The orders-stream row of the RFM register probe (top level so the
    * case-class Encoder derives). */
  final case class Ord(o_custkey: Long, o_orderdate: Timestamp,
      o_totalprice: Double)

  /** Drive `build`'s query by feeding `chunks` through `feed`, one
    * processAllAvailable per chunk; gather progress metrics. */
  private def drive[T](chunks: Iterator[Seq[T]], feed: Seq[T] => Unit,
      query: StreamingQuery): Probe = {
    var rows = 0L
    var peak = 0L
    var dropped = 0L
    val seen = scala.collection.mutable.Set.empty[Long]
    val t0 = System.nanoTime()
    chunks.foreach { c =>
      rows += c.size
      feed(c)
      query.processAllAvailable()
      // accumulate per-batch metrics without double-counting (several
      // micro-batches can run inside one processAllAvailable)
      query.recentProgress.foreach { p =>
        if (p != null && seen.add(p.batchId)) {
          p.stateOperators.foreach { so =>
            dropped += so.numRowsDroppedByWatermark
          }
        }
        if (p != null)
          peak = math.max(peak, p.stateOperators.map(_.numRowsTotal).sum)
      }
    }
    query.processAllAvailable()
    val wall = (System.nanoTime() - t0) / 1e9
    val last = Option(query.lastProgress)
    val finalRows = last.map(_.stateOperators.map(_.numRowsTotal).sum).getOrElse(0L)
    val finalBytes = last.map(_.stateOperators.map(_.memoryUsedBytes).sum).getOrElse(0L)
    query.stop()
    Probe(rows, wall, seen.size, math.max(peak, finalRows), finalRows,
      finalBytes, dropped)
  }

  private def chunked[T](xs: Array[T], n: Int): Iterator[Seq[T]] =
    xs.grouped(n).map(_.toSeq)

  def main(args: Array[String]): Unit = {
    val spark = SparkSessions.local("graft-stream-bench",
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    spark.sparkContext.setLogLevel("WARN")
    val chunkSize = sys.env.getOrElse("SPARK_GRAFT_STREAM_CHUNK", "100000").toInt

    val scales: Seq[(String, String)] = Seq(
      "sf0.1" -> "/root/testdata/sf0.1",
      "sfx1" -> "/root/repo/target/sfx1",
      "sfx10" -> "/root/repo/target/sfx10")
      .filter { case (_, d) => new java.io.File(s"$d/events.parquet").exists() }
    val only = sys.env.get("SPARK_GRAFT_STREAM_ONLY")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSet)

    // op name → (scale dir → Probe)
    val out = scala.collection.mutable.LinkedHashMap
      .empty[String, scala.collection.mutable.LinkedHashMap[String, Probe]]
    def record(op: String, scale: String, p: Probe): Unit = {
      out.getOrElseUpdate(op, scala.collection.mutable.LinkedHashMap.empty)
        .put(scale, p)
      System.err.println(f"[stream-bench] $op/$scale rows=${p.rows} " +
        f"wall=${p.wallSec}%.1fs rate=${p.rows / math.max(p.wallSec, 1e-9)}%.0f/s " +
        f"state=${p.finalStateRows} (peak ${p.peakStateRows}, " +
        f"${p.finalStateBytes} B) late=${p.droppedLate}")
    }

    for ((scale, dir) <- scales) {
      // event-time-ordered feeds: the probe measures state/throughput,
      // not reordering tolerance (the parity specs pin that); ordering
      // keeps watermark drops at zero so state curves are clean
      val evRows = spark.read.parquet(s"$dir/events.parquet")
        .select(col("event_id"), col("user_id"),
          col("ts").cast("timestamp").as("ts"), col("event_type"),
          col("value"))
        .orderBy("ts", "event_id")
        .collect()
      val evs: Array[StreamEvent] = evRows.map(r => StreamEvent(
        r.getLong(1), r.getTimestamp(2), r.getString(3), r.getDouble(4)))
      val idEvs: Array[IdStreamEvent] = evRows.map(r => IdStreamEvent(
        r.getLong(0), r.getLong(1), r.getTimestamp(2), r.getString(3),
        r.getDouble(4)))

      def run(op: String)(mk: => (Seq[_] => Unit, StreamingQuery,
          Iterator[Seq[_]])): Unit =
        if (only.forall(_.contains(op))) {
          val (feed, q, chunks) = mk
          record(op, scale, drive(chunks, feed, q))
        }

      def startNoop(df: DataFrame, mode: String, name: String): StreamingQuery =
        df.writeStream.format("noop").outputMode(mode)
          .option("checkpointLocation",
            s"/tmp/graft_stream_bench/$name-$scale-${System.nanoTime()}")
          .start()

      run("sessionize") {
        val in = MemoryStream[StreamEvent]
        val q = startNoop(EventsStream.sessionize(in.toDS()).toDF(),
          "append", "sessionize")
        ((c: Seq[_]) => { in.addData(c.asInstanceOf[Seq[StreamEvent]]); () },
          q, chunked(evs, chunkSize).asInstanceOf[Iterator[Seq[_]]])
      }

      run("transitions") {
        val in = MemoryStream[IdStreamEvent]
        val q = startNoop(EventsStream.transitions(in.toDS()).toDF(),
          "append", "transitions")
        ((c: Seq[_]) => { in.addData(c.asInstanceOf[Seq[IdStreamEvent]]); () },
          q, chunked(idEvs, chunkSize).asInstanceOf[Iterator[Seq[_]]])
      }

      run("rolling_reach") {
        val in = MemoryStream[StreamEvent]
        val q = startNoop(EventsStream.rollingReach(in.toDS(),
            windowDays = 7, dayMs = 86400000L).toDF(),
          "append", "rolling_reach")
        ((c: Seq[_]) => { in.addData(c.asInstanceOf[Seq[StreamEvent]]); () },
          q, chunked(evs, chunkSize).asInstanceOf[Iterator[Seq[_]]])
      }

      run("top_users_space_saving") {
        val in = MemoryStream[StreamEvent]
        val q = startNoop(EventsStream.topUsersDeltas(in.toDS(),
            capacity = 64, k = 10).toDF(),
          "update", "top_users")
        ((c: Seq[_]) => { in.addData(c.asInstanceOf[Seq[StreamEvent]]); () },
          q, chunked(evs, chunkSize).asInstanceOf[Iterator[Seq[_]]])
      }

      run("rfm_registers") {
        // the orders stream: one register row per customer, Update mode
        val ords: Array[Ord] = spark.read.parquet(s"$dir/orders.parquet")
          .select(col("o_custkey"),
            col("o_orderdate").cast("timestamp").as("o_orderdate"),
            col("o_totalprice"))
          .orderBy("o_orderdate", "o_custkey")
          .collect()
          .map(r => Ord(r.getLong(0), r.getTimestamp(1), r.getDouble(2)))
        val in = MemoryStream[Ord]
        val q = startNoop(RfmStream.customerRegisters(in.toDF()),
          "update", "rfm_registers")
        ((c: Seq[_]) => { in.addData(c.asInstanceOf[Seq[Ord]]); () },
          q, chunked(ords, chunkSize).asInstanceOf[Iterator[Seq[_]]])
      }
    }

    spark.sparkContext.setLogLevel("OFF")
    spark.stop()
    def jstr(s: String) = "\"" + s.replace("\"", "\\\"") + "\""
    def r1(v: Double) = math.round(v * 10.0) / 10.0
    val opsJson = out.map { case (op, m) =>
      val scalesJson = m.map { case (sc, p) =>
        s"${jstr(sc)}:{" +
          s"\"rows\":${p.rows},\"wall_sec\":${r1(p.wallSec)}," +
          s"\"rows_per_sec\":${math.round(p.rows / math.max(p.wallSec, 1e-9))}," +
          s"\"micro_batches\":${p.batches}," +
          s"\"state_rows_peak\":${p.peakStateRows}," +
          s"\"state_rows_final\":${p.finalStateRows}," +
          s"\"state_bytes_final\":${p.finalStateBytes}," +
          s"\"rows_dropped_late\":${p.droppedLate}}"
      }.mkString("{", ",", "}")
      s"${jstr(op)}:$scalesJson"
    }.mkString("{", ",", "}")
    val note = "MemoryStream feed in event-time order, " +
      s"$chunkSize rows per micro-batch chunk, noop sink; state figures " +
      "are StreamingQueryProgress.stateOperators (store accounting). " +
      "Claim under test: state scales with live keys, not stream length."
    val line = s"""{"metric":"stream_bench","note":${jstr(note)},"ops":$opsJson}"""
    val outFile = sys.env.getOrElse("SPARK_GRAFT_STREAM_OUT",
      "/root/repo/stream_bench.json")
    java.nio.file.Files.writeString(java.nio.file.Paths.get(outFile), line + "\n")
    println(line)
  }
}
