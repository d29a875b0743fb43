package graft

import graft.operators.Multimodal
import graft.operators.Multimodal.{ImageIoDecoder, MediaRecord}

/** Pins that `mm_decode_real` exercises a REAL codec, not arithmetic on
  * payload bytes: the decoder must read genuine PNG structure (and reject
  * non-images), and the decoded raster must survive the encode→decode
  * round trip bit-exactly.
  */
class MultimodalSpec extends SparkSpec {

  test("ImageIoDecoder probes real dims from real PNG bytes") {
    val img = new java.awt.image.BufferedImage(
      5, 3, java.awt.image.BufferedImage.TYPE_INT_RGB)
    img.setRGB(4, 2, 0xabcdef)
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    assert(ImageIoDecoder.probe(bos.toByteArray) === ((5, 3, 1)))
  }

  test("ImageIoDecoder rejects non-image bytes (a stub would not)") {
    val garbage = "definitely not a PNG".getBytes("UTF-8")
    intercept[IllegalArgumentException](ImageIoDecoder.probe(garbage))
  }

  test("PNG round trip is pixel-lossless end to end") {
    import spark.implicits._
    val ids = spark.createDataset(Seq(0L, 1L, 12L, 90L, 1001L))
      .toDF("doc_id")
    // pngMediaTable reads documents(doc_id); fake a minimal table via the
    // decode path directly: encode each id the same way and decode back.
    val media = ids.as[Long].map { id =>
      val w = 1 + (id % 13).toInt
      val h = 1 + (id % 7).toInt
      val img = new java.awt.image.BufferedImage(
        w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
      for (y <- 0 until h; x <- 0 until w)
        img.setRGB(x, y, ((id * 31 + x * 7 + y * 13) % 256).toInt * 0x010101)
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "png", bos)
      MediaRecord(id, "png", bos.toByteArray)
    }
    val metas = Multimodal.decodeImages(media).collect()
      .map(m => m.media_id -> m).toMap
    for (id <- Seq(0L, 1L, 12L, 90L, 1001L)) {
      val w = 1 + (id % 13).toInt
      val h = 1 + (id % 7).toInt
      val expected = (for (y <- 0 until h; x <- 0 until w)
        yield (id * 31 + x * 7 + y * 13) % 256).sum
      val m = metas(id)
      assert((m.width, m.height, m.px_sum) === ((w, h, expected)))
    }
  }
}
