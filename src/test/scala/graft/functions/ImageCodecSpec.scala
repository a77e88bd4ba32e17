package graft.functions

import org.scalatest.funsuite.AnyFunSuite

/** The REAL half of the multimodal seam: JDK ImageIO BMP/PNG encode +
  * decode. The oracle gate (q_image_decode) proves the round-trip on
  * sums; this spec pins it per-pixel and proves the bytes are genuine
  * container files (magic numbers), not a private serialization. */
class ImageCodecSpec extends AnyFunSuite {
  import graft.functions.Multimodal.{ImageBlob, ImageCodec}

  test("encoded bytes are genuine BMP / PNG containers (magic numbers)") {
    val bmp = ImageCodec.encode(42L, "bmp")
    assert(bmp(0) == 'B'.toByte && bmp(1) == 'M'.toByte)
    val png = ImageCodec.encode(43L, "png")
    assert((png(0) & 0xff) == 0x89 && png(1) == 'P'.toByte &&
      png(2) == 'N'.toByte && png(3) == 'G'.toByte)
  }

  test("decode reproduces every pixel of the closed-form pattern, both formats") {
    for (id <- Seq(0L, 7L, 15L, 104L); fmt <- Seq("bmp", "png")) {
      val blob = ImageBlob(id, fmt, ImageCodec.encode(id, fmt))
      val img = javax.imageio.ImageIO.read(
        new java.io.ByteArrayInputStream(blob.bytes))
      assert(img.getWidth == ImageCodec.widthOf(id))
      assert(img.getHeight == ImageCodec.heightOf(id))
      for (y <- 0 until img.getHeight; x <- 0 until img.getWidth) {
        val p = img.getRGB(x, y)
        assert(((p >> 16) & 0xff) == ImageCodec.r(id, x, y), s"R at ($x,$y) id=$id $fmt")
        assert(((p >> 8) & 0xff) == ImageCodec.g(id, x, y), s"G at ($x,$y) id=$id $fmt")
        assert((p & 0xff) == ImageCodec.b(id, x, y), s"B at ($x,$y) id=$id $fmt")
      }
    }
  }

  test("decode facts fold the raster exactly (hand-computed 1x-pixel sums)") {
    val id = 20L // width 8 + 20%9 = 10, height 8 + 20%7 = 14
    val facts = ImageCodec.decode(ImageBlob(id, "bmp", ImageCodec.encode(id, "bmp")))
    assert(facts.width == 10 && facts.height == 14)
    var (sr, sg, sb) = (0L, 0L, 0L)
    for (y <- 0 until 14; x <- 0 until 10) {
      sr += ImageCodec.r(id, x, y); sg += ImageCodec.g(id, x, y)
      sb += ImageCodec.b(id, x, y)
    }
    assert(facts.sum_r == sr && facts.sum_g == sg && facts.sum_b == sb)
  }

  test("q_image_decode runs the distributed path end-to-end at sf0.001") {
    val s = graft.SparkTestSession.spark
    val rows = Multimodal.qImageDecode(s, "/root/testdata/sf0.001").collect()
    assert(rows.length == 100) // 500 docs, every 5th
    // spot-check one row against the closed forms
    val r0 = rows.find(_.getLong(0) == 10L).get
    assert(r0.getString(1) == "bmp")
    assert(r0.getLong(2) == 8 + 10 % 9 && r0.getLong(3) == 8 + 10 % 7)
  }
}
