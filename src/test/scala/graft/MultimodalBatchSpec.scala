package graft

import org.apache.spark.sql.functions._

/** Batch-shaped multimodal decode (SURVEY §2.J2): the per-partition iterator
  * path a real image/audio decoder would use — open codec once per
  * partition, stream a batch of binary payloads through it. The decoder here
  * is the same deterministic stub as q_multimodal_binary (no media libs in
  * this container); the point under test is the plumbing: binary payload
  * column, typed Dataset, partition-wise batching, metadata schema out.
  */
case class Payload(doc_id: Long, payload: Array[Byte])
case class Decoded(doc_id: Long, byte_len: Long, format: String)

class MultimodalBatchSpec extends SparkTestBase {
  import spark.implicits._

  test("mapPartitions batch decode matches the per-row UDF formulation") {
    val payloads = Catalog.load(spark, sf0001, "documents")
      .select($"doc_id", encode($"text", "UTF-8").as("payload"))
      .as[Payload]

    val decoded = payloads.mapPartitions { it =>
      // One "decoder" per partition (a real codec would be opened here,
      // once, not per row) …
      val digest = java.security.MessageDigest.getInstance("MD5")
      it.map { p =>
        digest.reset()
        val md5hex = digest.digest(p.payload).map("%02x".format(_)).mkString
        val fmt = md5hex.charAt(0).toInt % 3 match {
          case 0 => "png"; case 1 => "jpg"; case _ => "webp"
        }
        Decoded(p.doc_id, p.payload.length.toLong, fmt)
      }
    }

    val viaQuery = SparkEntry.queries("q_multimodal_binary")(spark, sf0001)
      .select($"doc_id", $"byte_len", $"format")
    assert(decoded.toDF().except(viaQuery).isEmpty &&
      viaQuery.except(decoded.toDF()).isEmpty)
    assert(decoded.count() == 500)
  }
}
