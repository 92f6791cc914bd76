package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Multimodal

/** Integer-exact image dHash over the real ImageIO decode path. */
class ImageDHashSpec extends AnyFunSuite {
  lazy val spark = TestSpark.session
  import spark.implicits._

  private def grayPng(w: Int, h: Int)(v: (Int, Int) => Int): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until h; x <- 0 until w) {
      val g = v(x, y) & 0xFF
      img.setRGB(x, y, (g << 16) | (g << 8) | g)
    }
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  private def hashOf(png: Array[Byte]): Option[Long] = {
    val r = Multimodal.imageDHash(
        Seq(Tuple1(png)).toDF("payload"), "payload")
      .select(col("dhash")).head()
    if (r.isNullAt(0)) None else Some(r.getLong(0))
  }

  test("monotone left-to-right gradient sets every bit; reverse sets none") {
    // 36x32 = 4x4 equal blocks: brightness strictly increases with x
    assert(hashOf(grayPng(36, 32)((x, _) => x * 7)).contains(-1L)) // all 64
    assert(hashOf(grayPng(36, 32)((x, _) => 255 - x * 7)).contains(0L))
  }

  test("hand vector: single bright block flips exactly its row-neighbor bits") {
    // flat image except block (bx=2, by=3) is brighter: bit (y=3, x=2)
    // compares S(2)<S(3) -> 0-side... left neighbor bit (y=3,x=1):
    // S(1) < S(2) -> 1; bit (y=3,x=2): S(2) > S(3) -> 0; all others equal -> 0
    val png = grayPng(36, 32)((x, y) =>
      if (x / 4 == 2 && y / 4 == 3) 200 else 100)
    assert(hashOf(png).contains(1L << (3 * 8 + 1)))
  }

  test("uneven block areas compare means, not sums (cross-multiplied)") {
    // 13 px wide -> 9 columns of widths {1,2,1,2,1,2,1,2,1}: a flat image
    // must hash to 0 even though neighboring block SUMS differ 2x
    assert(hashOf(grayPng(13, 16)((_, _) => 150)).contains(0L))
  }

  test("PNG roundtrip is lossless: formula image hashes to the closed form") {
    // the q191 generator shape: v = (base*31 + 7x + 13y) mod 256
    val png = grayPng(36, 32)((x, y) => ((54 * 31 + x * 7 + y * 13) % 256))
    val viaCodec = hashOf(png).get
    // closed form: equal 4x4 blocks -> compare block sums of v
    def blockSum(bx: Int, by: Int): Long =
      (for (x <- bx * 4 until bx * 4 + 4; y <- by * 4 until by * 4 + 4)
        yield ((54 * 31 + x * 7 + y * 13) % 256).toLong).sum
    var want = 0L
    for (y <- 0 until 8; x <- 0 until 8)
      if (blockSum(x, y) < blockSum(x + 1, y)) want |= 1L << (y * 8 + x)
    assert(viaCodec == want)
  }

  test("undecodable payloads yield NULL, never a stub hash") {
    val out = Multimodal.imageDHash(
        Seq(Tuple1(Array[Byte](1, 2, 3))).toDF("payload"), "payload")
      .select(col("dhash"), col("img_w")).head()
    assert(out.isNullAt(0) && out.isNullAt(1))
  }

  private def aHashOf(img: java.awt.image.BufferedImage): Long = {
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    Multimodal.imageAHash(
        Seq(Tuple1(bos.toByteArray)).toDF("payload"), "payload")
      .select(col("ahash")).head().getLong(0)
  }

  test("aHash: uniform image hashes to 0 (no block strictly above the mean)") {
    val img = new java.awt.image.BufferedImage(32, 32,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until 32; x <- 0 until 32)
      img.setRGB(x, y, 0x646464)
    assert(aHashOf(img) == 0L)
  }

  test("aHash: half-bright 32x32 sets exactly the bright half's bits") {
    // left half luma 0, right half 200: blocks bx 0-3 below the mean,
    // bx 4-7 above -> bits (by*8+bx) for bx >= 4
    val img = new java.awt.image.BufferedImage(32, 32,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until 32; x <- 0 until 32)
      img.setRGB(x, y, if (x < 16) 0 else 0xC8C8C8)
    var want = 0L
    for (by <- 0 until 8; bx <- 4 until 8) want |= 1L << (by * 8 + bx)
    assert(aHashOf(img) == want)
  }

  test("aHash via the codec path equals the pixel-formula closed form") {
    // the q212 construction: gray v = (base*29 + 11x + 5y) % 256 on 32x32
    val base = 54L
    val img = new java.awt.image.BufferedImage(32, 32,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until 32; x <- 0 until 32) {
      val v = ((base * 29 + x * 11 + y * 5) % 256).toInt
      img.setRGB(x, y, (v << 16) | (v << 8) | v)
    }
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    val viaCodec = Multimodal.imageAHash(
        Seq(Tuple1(bos.toByteArray)).toDF("payload"), "payload")
      .select(col("ahash")).head().getLong(0)
    def blockSum(bx: Int, by: Int): Long = {
      var s = 0L
      for (y <- by * 4 until by * 4 + 4; x <- bx * 4 until bx * 4 + 4)
        s += (base * 29 + x * 11 + y * 5) % 256
      s
    }
    val total = (for (bx <- 0 until 8; by <- 0 until 8)
      yield blockSum(bx, by)).sum
    var want = 0L
    for (by <- 0 until 8; bx <- 0 until 8)
      if (64L * blockSum(bx, by) > total) want |= 1L << (by * 8 + bx)
    assert(viaCodec == want)
    // undecodable -> NULL, same contract as dHash
    assert(Multimodal.imageAHash(
        Seq(Tuple1(Array[Byte](9, 9))).toDF("payload"), "payload")
      .select(col("ahash")).head().isNullAt(0))
  }
}
