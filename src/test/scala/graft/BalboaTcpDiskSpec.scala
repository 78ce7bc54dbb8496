package graft

import java.io.DataInputStream
import java.net.Socket
import java.sql.Timestamp

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.ObservationStore
import graft.serve.{BalboaTcp, BalboaTcpServer}
import graft.serve.BalboaTcp._

/** The TCP protocol against a DISK-backed bucket-pruned store under
  * concurrent clients — the Bench `tcp_query_qps` shape, pinned as a
  * test so a serving regression fails CI, not just the bench line. */
class BalboaTcpDiskSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("concurrent point queries against a disk store all stream cleanly") {
    import spark.implicits._
    val ts = Timestamp.valueOf("2018-01-01 00:00:00")
    val dir = java.nio.file.Files.createTempDirectory("graft-tcpdisk").toString
    val input = (1 to 50).map(i =>
      (s"host-$i.example", "s1", "A", i.toString, i.toLong, ts, ts))
      .toDF("rrname", "sensor_id", "rrtype", "rdata", "count",
        "timestamp_start", "timestamp_end")
    ObservationStore.writeDual(ObservationStore.aggregate(input), dir,
      numBuckets = 8)
    val store = ObservationStore.load(spark, dir)
    val srv = new BalboaTcpServer(store)
    srv.start()
    try {
      val pool = java.util.concurrent.Executors.newFixedThreadPool(5)
      try {
        val tasks = (1 to 40).map { i =>
          pool.submit(new java.util.concurrent.Callable[Seq[Entry]] {
            def call(): Seq[Entry] = {
              val sock = new Socket("localhost", srv.boundPort)
              try {
                sock.getOutputStream.write(encodeQueryRequest(
                  QueryRequest(None, Some(i.toString), None, None, 1000)))
                sock.getOutputStream.flush()
                val rd = new MsgReader(new DataInputStream(
                  new java.io.BufferedInputStream(sock.getInputStream)))
                val out = Seq.newBuilder[Entry]
                var done = false
                while (!done) {
                  val (t, inner) = rd.readTyped()
                  if (t == TypeQueryStreamDataResponse)
                    out += decodeEntry(inner)
                  else if (t == TypeErrorResponse)
                    throw new IllegalStateException(
                      "server error: " + decodeErrorResponse(inner))
                  else if (t == TypeQueryStreamEndResponse) done = true
                }
                out.result()
              } finally sock.close()
            }
          })
        }
        tasks.zipWithIndex.foreach { case (t, idx) =>
          val i = idx + 1
          val entries = t.get()
          assert(entries.size == 1, s"rdata=$i got ${entries.size}")
          assert(entries.head.rrname == s"host-$i.example")
          assert(entries.head.count == i.toLong)
        }
      } finally pool.shutdown()
    } finally srv.stop()
  }
}
