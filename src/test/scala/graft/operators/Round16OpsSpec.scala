package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestHarness

/** Round-16 operator specs: durable IVF-PQ index persistence (s20),
  * delete/tombstone (s21), the chunked trailing RANGE window (q28 scale
  * plan), and the r15-ADVICE fail-loud guard on binary sign-bit codes.
  */
class Round16OpsSpec extends AnyFunSuite with SparkTestHarness {
  import spark.implicits._

  private val sf = "/root/testdata/sf0.001"

  test("binaryCodes fails loud on a mis-dimensioned vector (no silent sign-0 fill)") {
    val e = spark.read.parquet(s"$sf/embeddings.parquet")
    val short = e.limit(3).select($"vec_id",
      slice($"embedding".cast("array<double>"), 1, 32).as("embedding"))
    val err = intercept[Exception] {
      Similarity.binaryCodes(short, "vec_id", "embedding", dim = 64)
        .collect()
    }
    def msgs(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x => Option(x.getMessage).toSeq ++ msgs(x.getCause))
    assert(msgs(err).exists(_.contains("binaryCodes: vector has")), s"got: $err")
    // The guard must also fire through the search entry point (raw-vector
    // path, not just direct encode calls).
    val err2 = intercept[Exception] {
      Similarity.binaryHammingTopK(short,
        e.filter($"vec_id" <= 1), "vec_id", "embedding", dim = 64, k = 2)
        .collect()
    }
    assert(msgs(err2).exists(_.contains("binaryCodes: vector has")), s"got: $err2")
  }
}
