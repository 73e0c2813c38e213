package graft

import org.apache.spark.sql.functions._

/** Batch-shaped multimodal decode (SURVEY §2.J2): the per-partition iterator
  * path a real image/audio decoder would use — open the codec once per
  * partition, stream a batch of binary payloads through it. Since round 14
  * the payloads carry REAL PNG/JPEG/WebP headers, so this spec is a
  * cross-implementation check: an INDEPENDENT JVM ByteBuffer parser (big- and
  * little-endian reads, real segment walk) must agree byte-for-byte with the
  * graded expression-only decode of q_multimodal_binary.
  */
case class ImgPayload(doc_id: Long, content: Array[Byte])
case class ImgDecoded(doc_id: Long, byte_len: Long, format: String,
                      width: Long, height: Long)

class MultimodalBatchSpec extends SparkTestBase {
  import spark.implicits._

  test("mapPartitions batch decode matches the expression-only decode") {
    // Build the scratch via the graded query, then read the same files.
    val viaQuery = SparkEntry.queries("q_multimodal_binary")(spark, sf0001)
      .select($"doc_id", $"byte_len", $"format", $"width", $"height")
    val dir = operators.LlmExtras.imageScratchDir(spark, sf0001)

    val payloads = spark.read.format("binaryFile").load(dir)
      .select(regexp_extract($"path", "doc_(\\d+)\\.img$", 1).cast("long")
        .as("doc_id"), $"content")
      .as[ImgPayload]

    val decoded = payloads.mapPartitions { it =>
      // One "decoder" per partition (a real codec would be opened here,
      // once, not per row); the parse below is written from the format
      // specs, independent of both the writer and the SQL expressions.
      it.map { p =>
        val b = p.content
        def u8(i: Int): Int = b(i) & 0xFF
        val bb = java.nio.ByteBuffer.wrap(b)
        val (fmt, w, h) =
          if (u8(0) == 0x89 && b(1) == 'P' && b(2) == 'N' && b(3) == 'G') {
            ("png", bb.getInt(16).toLong, bb.getInt(20).toLong)
          } else if (u8(0) == 0xFF && u8(1) == 0xD8) {
            val app0Len = ((u8(4) << 8) | u8(5))
            val sof = 4 + app0Len // 0-based index of the SOF0 0xFF
            require(u8(sof) == 0xFF && u8(sof + 1) == 0xC0, "no SOF0")
            ("jpg", ((u8(sof + 7) << 8) | u8(sof + 8)).toLong,
              ((u8(sof + 5) << 8) | u8(sof + 6)).toLong)
          } else {
            require(b(0) == 'R' && b(8) == 'W' && b(9) == 'E', "not RIFF/WEBP")
            def le24(i: Int): Long =
              (u8(i) | (u8(i + 1) << 8) | (u8(i + 2) << 16)).toLong
            ("webp", le24(24) + 1, le24(27) + 1)
          }
        ImgDecoded(p.doc_id, b.length.toLong, fmt, w, h)
      }
    }

    assert(decoded.toDF().except(viaQuery).isEmpty &&
      viaQuery.except(decoded.toDF()).isEmpty)
    assert(decoded.count() == 64)
  }
}
