package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._
import java.awt.image.BufferedImage
import java.io.ByteArrayOutputStream
import javax.imageio.ImageIO

/** MediaHeader parser vs REAL encoder output: the JDK's own
  * javax.imageio writers (java.desktop — present in this JDK, no
  * external media libs) produce genuine PNG/JFIF-JPEG/GIF containers,
  * so the parser is tested against the actual byte layouts the specs
  * mandate, not against payloads we built with the same arithmetic we
  * are testing. JPEG is the important one: ImageIO emits an APP0
  * (JFIF) segment before the frame header, so dimensions are only
  * reachable through the marker walk.
  */
class MediaHeaderSpec extends SparkSpec {

  private def encode(fmt: String, w: Int, h: Int): Array[Byte] = {
    val out = new ByteArrayOutputStream()
    ImageIO.write(new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB), fmt, out)
    out.toByteArray
  }

  // Dimensions straddle the 1-byte / 2-byte boundary in both axes so
  // BE vs LE confusion (PNG/JPEG vs GIF) cannot cancel out.
  private val dims = Seq((1, 1), (321, 87), (87, 321), (300, 511), (1920, 1080))

  test("parses real ImageIO-encoded PNG/JPEG/GIF dimensions") {
    for ((fmt, want) <- Seq("png" -> "png", "jpg" -> "jpeg", "gif" -> "gif");
         (w, h) <- dims) {
      val r = MediaHeaderUtil.parse(encode(fmt, w, h))
      assert(r.getString(0) == want, s"$fmt $w x $h format")
      assert(r.getInt(1) == w && r.getInt(2) == h, s"$fmt $w x $h dims: $r")
    }
  }

  test("JPEG walk skips standalone markers and non-frame segments to a progressive SOF2") {
    def be16(v: Int) = Array[Byte](((v >> 8) & 0xFF).toByte, (v & 0xFF).toByte)
    val payload =
      Array[Byte](0xFF.toByte, 0xD8.toByte) ++                       // SOI
      Array[Byte](0xFF.toByte, 0x01) ++                              // standalone TEM
      (Array[Byte](0xFF.toByte, 0xE1.toByte) ++ be16(2 + 5) ++       // APP1, 5 payload bytes
        Array.fill[Byte](5)(0x41)) ++
      (Array[Byte](0xFF.toByte, 0xFE.toByte) ++ be16(2 + 3) ++       // COM, 3 payload bytes
        Array.fill[Byte](3)(0x42)) ++
      Array[Byte](0xFF.toByte, 0xD0.toByte) ++                       // standalone RST0
      (Array[Byte](0xFF.toByte, 0xC2.toByte) ++ be16(17) ++          // SOF2 (progressive)
        Array[Byte](8) ++ be16(511) ++ be16(300) ++ Array[Byte](3))
    val r = MediaHeaderUtil.parse(payload)
    assert(r.getString(0) == "jpeg" && r.getInt(1) == 300 && r.getInt(2) == 511)
  }

  test("DHT/DQT-style C4/C8/CC markers are not mistaken for frame headers") {
    // C4 (DHT) sits inside the C0-CF range but carries no dimensions;
    // the walk must hop over it to the following SOF0.
    def be16(v: Int) = Array[Byte](((v >> 8) & 0xFF).toByte, (v & 0xFF).toByte)
    val payload =
      Array[Byte](0xFF.toByte, 0xD8.toByte) ++
      (Array[Byte](0xFF.toByte, 0xC4.toByte) ++ be16(2 + 4) ++ Array.fill[Byte](4)(7)) ++
      (Array[Byte](0xFF.toByte, 0xC0.toByte) ++ be16(17) ++
        Array[Byte](8) ++ be16(44) ++ be16(99) ++ Array[Byte](1))
    val r = MediaHeaderUtil.parse(payload)
    assert(r.getString(0) == "jpeg" && r.getInt(1) == 99 && r.getInt(2) == 44)
  }

  test("every truncation of every valid payload parses without throwing") {
    for (fmt <- Seq("png", "jpg", "gif")) {
      val full = encode(fmt, 321, 87)
      for (n <- 0 until full.length) {
        val r = MediaHeaderUtil.parse(full.take(n)) // must not throw
        // a truncated payload either still resolves correctly (cut
        // after the header) or degrades to unknown — never garbage
        val f = r.getString(0)
        assert(f == "unknown" || (!r.isNullAt(1) && r.getInt(1) == 321 && r.getInt(2) == 87),
          s"$fmt truncated at $n: $r")
      }
    }
  }

  test("GIF87a variant and non-media bytes") {
    val gif87 = "GIF87a".getBytes("US-ASCII") ++
      Array[Byte](0x40, 0x01, 0x58, 0x02) // 320 x 600 little-endian
    val r = MediaHeaderUtil.parse(gif87)
    assert(r.getString(0) == "gif" && r.getInt(1) == 320 && r.getInt(2) == 600)
    assert(MediaHeaderUtil.parse(null).getString(0) == "unknown")
    assert(MediaHeaderUtil.parse(Array.emptyByteArray).getString(0) == "unknown")
    assert(MediaHeaderUtil.parse("plain text".getBytes).getString(0) == "unknown")
  }

  test("expression end-to-end under codegen (fallback disabled in this session)") {
    import spark.implicits._
    import MediaHeader.media_header
    val rows = Seq("png", "jpg", "gif").map(f => Tuple1(encode(f, 640, 480))) :+
      Tuple1(Array[Byte](1, 2, 3))
    val got = rows.toDF("b")
      .select(media_header(col("b")).as("h"))
      .select($"h.format", $"h.width", $"h.height")
      .collect()
      .map(r => (r.getString(0), if (r.isNullAt(1)) -1 else r.getInt(1)))
      .toSeq
    assert(got == Seq(("png", 640), ("jpeg", 640), ("gif", 640), ("unknown", -1)))
  }
}
