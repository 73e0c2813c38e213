package graft

import org.apache.spark.sql.functions._

/** Round-14 multimodal invariants: the expression-level header decode
  * reads REAL format bytes (not the writer's closed form — the spec
  * builds payloads with an independent byte layout), malformed headers
  * raise instead of nulling out, and the PNG scratch files carry a valid
  * IHDR CRC32 an independent re-computation confirms.
  */
class Round14ASpec extends SparkTestBase {
  import spark.implicits._

  private def bytes(xs: Int*): Array[Byte] = xs.map(_.toByte).toArray

  // Independent header builders (written from the PNG/JFIF/RIFF specs, not
  // shared with LlmExtras' writer) with arbitrary non-closed-form dims.
  private def png(w: Int, h: Int): Array[Byte] = {
    val td = java.nio.ByteBuffer.allocate(17)
    td.put("IHDR".getBytes("US-ASCII")).putInt(w).putInt(h)
      .put(bytes(8, 2, 0, 0, 0))
    val crc = new java.util.zip.CRC32(); crc.update(td.array())
    java.nio.ByteBuffer.allocate(33)
      .put(bytes(0x89, 0x50, 0x4E, 0x47, 0x0D, 0x0A, 0x1A, 0x0A))
      .putInt(13).put(td.array()).putInt(crc.getValue.toInt).array()
  }
  private def jpg(w: Int, h: Int): Array[Byte] =
    java.nio.ByteBuffer.allocate(39)
      .put(bytes(0xFF, 0xD8, 0xFF, 0xE0, 0x00, 0x10))
      .put("JFIF".getBytes("US-ASCII")).put(0.toByte)
      .put(bytes(1, 1, 0, 0, 1, 0, 1, 0, 0))
      .put(bytes(0xFF, 0xC0, 0x00, 0x11, 0x08))
      .putShort(h.toShort).putShort(w.toShort).put(3.toByte)
      .put(bytes(1, 0x22, 0, 2, 0x11, 1, 3, 0x11, 1)).array()
  private def webp(w: Int, h: Int, bodyLen: Int): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(30)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.put("RIFF".getBytes("US-ASCII")).putInt(22 + bodyLen)
      .put("WEBP".getBytes("US-ASCII"))
      .put("VP8X".getBytes("US-ASCII")).putInt(10)
      .put(bytes(0, 0, 0, 0))
    def le24(v: Int): Unit =
      bb.put((v & 0xFF).toByte).put(((v >> 8) & 0xFF).toByte)
        .put(((v >> 16) & 0xFF).toByte)
    le24(w - 1); le24(h - 1)
    bb.array()
  }

  private def decode(payloads: Seq[(Long, Array[Byte])]) =
    operators.LlmExtras.decodeImageMeta(
      payloads.toDF("doc_id", "content")
        .withColumn("byte_len", octet_length($"content").cast("long")))

  test("header decode reads the actual bytes for all three formats") {
    val body = "graft-spec-body".getBytes("UTF-8")
    val rows = decode(Seq(
      (1L, png(1920, 1080) ++ body),
      (2L, jpg(640, 480) ++ body),
      (3L, webp(333, 77, body.length) ++ body)))
      .select($"doc_id", $"format", $"width", $"height", $"byte_len")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2),
        r.getLong(3), r.getLong(4))).sortBy(_._1)
    assert(rows(0) === ((1L, "png", 1920L, 1080L, 33L + body.length)))
    assert(rows(1) === ((2L, "jpg", 640L, 480L, 39L + body.length)))
    assert(rows(2) === ((3L, "webp", 333L, 77L, 30L + body.length)))
  }

  test("body digest covers exactly the bytes after the header") {
    val body = "digest-me".getBytes("UTF-8")
    val got = decode(Seq((1L, png(8, 8) ++ body)))
      .select($"body_md5").head().getString(0)
    val hex = body.map("%02X".format(_)).mkString
    val exp = java.security.MessageDigest.getInstance("MD5")
      .digest(hex.getBytes("UTF-8")).map("%02x".format(_)).mkString
    assert(got === exp)
  }

  test("unknown magic bytes raise instead of nulling out") {
    val e = intercept[Exception] {
      decode(Seq((1L, "not an image at all padding padding".getBytes("UTF-8"))))
        .collect()
    }
    assert(e.getMessage.contains("unrecognized magic bytes") ||
      Option(e.getCause).exists(_.getMessage.contains("unrecognized magic bytes")))
  }

  test("a JPEG whose APP0 walk does not land on SOF0 raises") {
    val broken = jpg(10, 10)
    broken(21) = 0xC4.toByte // overwrite SOF0 marker second byte
    val e = intercept[Exception] {
      decode(Seq((1L, broken ++ "x".getBytes("UTF-8")))).collect()
    }
    assert(e.getMessage.contains("SOF0") ||
      Option(e.getCause).exists(_.getMessage.contains("SOF0")))
  }

  test("a WebP whose RIFF size disagrees with the file length raises") {
    val broken = webp(10, 10, 99) // claims a 99-byte body
    val e = intercept[Exception] {
      decode(Seq((1L, broken ++ "xy".getBytes("UTF-8")))).collect()
    }
    assert(e.getMessage.contains("RIFF size") ||
      Option(e.getCause).exists(_.getMessage.contains("RIFF size")))
  }

  private def wav(channels: Int, rate: Int, dataLen: Int): Array[Byte] = {
    // Independent writer, from the RIFF/WAVE spec.
    val bb = java.nio.ByteBuffer.allocate(44)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.put("RIFF".getBytes("US-ASCII")).putInt(36 + dataLen)
      .put("WAVE".getBytes("US-ASCII"))
      .put("fmt ".getBytes("US-ASCII")).putInt(16)
      .putShort(1.toShort).putShort(channels.toShort)
      .putInt(rate).putInt(rate * channels * 2)
      .putShort((channels * 2).toShort).putShort(16.toShort)
      .put("data".getBytes("US-ASCII")).putInt(dataLen)
    bb.array()
  }

  private def decodeWav(payloads: Seq[(Long, Array[Byte])]) =
    operators.LlmExtras.decodeWavMeta(
      payloads.toDF("doc_id", "content")
        .withColumn("byte_len", octet_length($"content").cast("long")))

  test("wav decode reads the little-endian fields from the actual bytes") {
    val body = Array.fill(4410)(7.toByte)
    val rows = decodeWav(Seq((1L, wav(2, 44100, body.length) ++ body)))
      .collect()
    assert(rows.length === 1)
    val r = rows.head
    assert(r.getAs[Long]("channels") === 2L)
    assert(r.getAs[Long]("sample_rate") === 44100L)
    assert(r.getAs[Long]("bits") === 16L)
    assert(r.getAs[Long]("data_bytes") === 4410L)
    assert(r.getAs[Long]("n_samples") === 4410L / 4)
    assert(r.getAs[Long]("duration_ms") === 4410L * 1000 / (44100 * 4))
  }

  test("wav magic-byte mismatch raises (guard lives in a selected column)") {
    val broken = wav(1, 8000, 8)
    broken(8) = 'X'.toByte // corrupt 'WAVE'
    val e = intercept[Exception] {
      decodeWav(Seq((1L, broken ++ Array.fill(8)(0.toByte)))).collect()
    }
    assert(e.getMessage.contains("magic mismatch") ||
      Option(e.getCause).exists(_.getMessage.contains("magic mismatch")))
  }

  test("wav RIFF size disagreement raises") {
    val broken = wav(1, 8000, 99) ++ Array.fill(8)(0.toByte) // claims 99
    val e = intercept[Exception] { decodeWav(Seq((1L, broken))).collect() }
    assert(e.getMessage.contains("RIFF size") ||
      Option(e.getCause).exists(_.getMessage.contains("RIFF size")))
  }

  test("scratch PNG files carry a valid IHDR CRC32") {
    // Drive the graded query once so the scratch exists, then re-verify a
    // real file's CRC independently of both the writer and the decode.
    // The scratch is resolved through the deterministic package hook (this
    // session's own dir), NOT a shared-tmpdir glob that stale or
    // concurrent JVMs' scratch dirs could pollute (round-15 ADVICE fix).
    SparkEntry.queries("q_multimodal_binary")(spark, sf0001).count()
    val dir = new java.io.File(
      graft.operators.LlmExtras.imageScratchDir(spark, sf0001))
    val pngs = dir.listFiles((f: java.io.File) =>
      f.getName == "doc_0.img" || f.getName == "doc_3.img")
    assert(pngs.nonEmpty, "image scratch should contain PNG docs (id % 3 == 0)")
    pngs.foreach { f =>
      val b = java.nio.file.Files.readAllBytes(f.toPath)
      assert((b(0) & 0xFF) === 0x89 && b(1) === 'P'.toByte)
      val crc = new java.util.zip.CRC32(); crc.update(b, 12, 17)
      val stored = java.nio.ByteBuffer.wrap(b, 29, 4).getInt & 0xFFFFFFFFL
      assert(stored === crc.getValue, s"IHDR CRC mismatch in ${f.getName}")
    }
  }
}
