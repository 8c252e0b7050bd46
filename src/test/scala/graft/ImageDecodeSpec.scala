package graft

import java.awt.image.BufferedImage
import java.io.ByteArrayOutputStream

import org.apache.spark.sql.functions._
import graft.media.Multimodal
import graft.media.Multimodal.MediaRecord

/** Real javax.imageio decode path ([[Multimodal.decodeImageBands]] /
  * extractImageFeatures / synthGrayPng): round trips through actual
  * PNG and BMP codecs, pixel-exact feature math, and corrupt-payload
  * tolerance — the decode is no longer a stub for image formats.
  */
class ImageDecodeSpec extends SparkSpec {
  import spark.implicits._

  /** The m5 pixel formula, computed directly (no codec): expected band
    * means for the 16×16 synthetic gray image of `id`.
    */
  private def expectedBands(id: Long): Array[Double] = {
    val sums = new Array[Long](8)
    for (y <- 0 until 16; x <- 0 until 16)
      sums(y / 2) += java.lang.Math.floorMod(id * 31 + x * 7 + y * 13, 256L)
    sums.map(s => s / 32.0 / 255.0 - 0.5)
  }

  test("PNG gray round trip: decoded band means equal the pixel formula") {
    val media = Multimodal.synthGrayPng(
      spark, Seq(1L, 2L, 42L).toDF("doc_id"), "doc_id")
    val rows = Multimodal.extractImageFeatures(media, bands = 8)
      .collect().groupBy(_.media_id)
    assert(rows.keySet == Set(1L, 2L, 42L))
    rows.foreach { case (id, rs) =>
      assert(rs.forall(r => r.width == 16 && r.height == 16))
      val got = rs.sortBy(_.j).map(_.feat)
      val exp = expectedBands(id)
      got.zip(exp).foreach { case (g, e) =>
        assert(math.abs(g - e) < 1e-12, s"id=$id got=$g exp=$e")
      }
    }
  }

  test("BMP RGB decode: Rec.601 luminance over real color pixels") {
    // Top half pure red, bottom half pure blue, 8x8 -> with bands=2 the
    // band means are the Rec.601 weights times 255.
    val img = new BufferedImage(8, 8, BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until 8; x <- 0 until 8)
      img.setRGB(x, y, if (y < 4) 0xff0000 else 0x0000ff)
    val bos = new ByteArrayOutputStream()
    assert(javax.imageio.ImageIO.write(img, "bmp", bos))
    val Some((w, h, feats)) =
      Multimodal.decodeImageBands(bos.toByteArray, bands = 2)
    assert(w == 8 && h == 8)
    assert(math.abs(feats(0) - (0.299 * 255 / 255.0 - 0.5)) < 1e-9,
      s"red band ${feats(0)}")
    assert(math.abs(feats(1) - (0.114 * 255 / 255.0 - 0.5)) < 1e-9,
      s"blue band ${feats(1)}")
  }

  test("undecodable payloads are dropped, not fatal") {
    val junk = Seq(
      MediaRecord(1L, "text/plain", "not an image".getBytes("UTF-8")),
      MediaRecord(2L, "image/png", Array[Byte]()),
      MediaRecord(3L, "image/png", Array.fill[Byte](64)(0x7f)))
    val out = Multimodal.extractImageFeatures(junk.toDS(), bands = 8).count()
    assert(out == 0L)
    // Mixed corpus: the real image survives the same pass.
    val good = Multimodal.synthGrayPng(spark, Seq(9L).toDF("doc_id"), "doc_id")
      .collect().head
    val mixed = Multimodal.extractImageFeatures(
      (junk :+ good).toDS(), bands = 8).collect()
    assert(mixed.length == 8 && mixed.forall(_.media_id == 9L))
  }

  test("m5 query on sf0.001: codec output matches the closed-form features") {
    val got = api.PipelineQueries.queries("m5_image_decode")(spark, Sf001)
      .collect()
    assert(got.length == 500 * 8)
    got.take(32).foreach { r =>
      val id = r.getLong(0)
      val exp = expectedBands(id)(r.getLong(3).toInt)
      val expRounded = BigDecimal(exp)
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      assert(r.getDouble(4) == expRounded,
        s"id=$id j=${r.getLong(3)} got=${r.getDouble(4)} exp=$expRounded")
    }
  }
}
