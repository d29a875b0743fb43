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

  test("wavMediaTable's container is real WAV: AudioSystem parses it back losslessly") {
    // the converse interop direction: OUR writer, the JDK's parser.
    // (AudioSystem is fine single-threaded in a test; it is banned on
    // executors because its provider-registry lock scales negatively.)
    val ids = Seq(0L, 1L, 128L, 4000L)
    val byId = Multimodal.wavMediaTable(spark, sf("sf0.001"))
      .filter(_.media_id <= 4000L).collect()
      .map(r => r.media_id -> r.payload).toMap
    for (id <- ids if byId.contains(id)) {
      val ais = javax.sound.sampled.AudioSystem.getAudioInputStream(
        new java.io.ByteArrayInputStream(byId(id)))
      val fmt = ais.getFormat
      assert((fmt.getSampleRate, fmt.getSampleSizeInBits, fmt.getChannels) ===
        ((8000f, 16, 1)))
      val bytes = ais.readAllBytes()
      val n = 64 + (id % 129).toInt
      assert(bytes.length === n * 2)
      val sum = bytes.grouped(2)
        .map(p => ((p(0) & 0xff) | (p(1) << 8)).toShort.toLong).sum
      val expected = (0 until n)
        .map(i => (id * 31 + i * 17) % 65536 - 32768).sum
      assert(sum === expected, s"id $id")
    }
    assert(ids.count(byId.contains) >= 2, "fixture ids missing from sf0.001")
  }

  test("WAV round trip parses real RIFF structure and is sample-lossless") {
    import spark.implicits._
    val ids = Seq(0L, 1L, 128L, 4000L)
    val media = spark.createDataset(ids).map { id =>
      val n = 64 + (id % 129).toInt
      val pcm = new Array[Byte](n * 2)
      for (i <- 0 until n) {
        val v = (((id * 31 + i * 17) % 65536) - 32768).toInt
        pcm(2 * i) = (v & 0xff).toByte
        pcm(2 * i + 1) = ((v >> 8) & 0xff).toByte
      }
      val fmt = new javax.sound.sampled.AudioFormat(8000f, 16, 1, true, false)
      val bos = new java.io.ByteArrayOutputStream()
      javax.sound.sampled.AudioSystem.write(
        new javax.sound.sampled.AudioInputStream(
          new java.io.ByteArrayInputStream(pcm), fmt, n.toLong),
        javax.sound.sampled.AudioFileFormat.Type.WAVE, bos)
      MediaRecord(id, "wav", bos.toByteArray)
    }
    // the payload really is a RIFF container, not raw PCM
    val first = media.head()
    assert(new String(first.payload.take(4), "US-ASCII") === "RIFF")
    val metas = Multimodal.decodeAudioDs(media).collect()
      .map(m => m.media_id -> m).toMap
    for (id <- ids) {
      val n = 64 + (id % 129).toInt
      val expected = (0 until n)
        .map(i => (id * 31 + i * 17) % 65536 - 32768).sum
      val m = metas(id)
      assert((m.sample_rate, m.n_samples, m.pcm_sum) ===
        ((8000, n.toLong, expected)))
    }
  }

  test("jpegMediaTable emits genuine JPEG bytes and decode stays close to the source raster") {
    val byId = Multimodal.jpegMediaTable(spark, sf("sf0.001"))
      .filter(_.media_id <= 40L).collect()
      .map(r => r.media_id -> r.payload).toMap
    assert(byId.size >= 2, "fixture ids missing from sf0.001")
    for ((id, payload) <- byId) {
      // JPEG SOI marker FF D8 at the start, EOI FF D9 at the end — these
      // are real entropy-coded JPEG streams, not renamed rasters
      assert((payload(0) & 0xff, payload(1) & 0xff) === ((0xff, 0xd8)), s"id $id SOI")
      assert((payload(payload.length - 2) & 0xff,
        payload(payload.length - 1) & 0xff) === ((0xff, 0xd9)), s"id $id EOI")
      // lossy decode: dims exact, raster within a tight mean-abs-error of
      // the generator formula (smooth gradients compress near-losslessly)
      val img = javax.imageio.ImageIO.read(
        new java.io.ByteArrayInputStream(payload))
      val w = 16 + (id % 17).toInt
      val h = 16 + (id % 11).toInt
      assert((img.getWidth, img.getHeight) === ((w, h)), s"id $id dims")
      var absErr = 0L
      for (y <- 0 until h; x <- 0 until w) {
        val want = (id * 31 + x * 7 + y * 13) % 256
        val got = img.getRGB(x, y) & 0xff
        absErr += math.abs(got - want)
      }
      val mae = absErr.toDouble / (w * h)
      assert(mae < 24.0, s"id $id decoded raster MAE $mae")
    }
  }

  test("aviMediaTable emits a real RIFF/AVI container with genuine MJPEG frames") {
    val byId = Multimodal.aviMediaTable(spark, sf("sf0.001"))
      .filter(_.media_id <= 40L).collect()
      .map(r => r.media_id -> r.payload).toMap
    assert(byId.size >= 2, "fixture ids missing from sf0.001")
    for ((id, payload) <- byId) {
      // real RIFF grammar: form tag, hdrl dims, movi frame chunks
      assert(new String(payload.take(4), "US-ASCII") === "RIFF", s"id $id")
      assert(new String(payload, 8, 4, "US-ASCII") === "AVI ", s"id $id")
      val w = 16 + (id % 17).toInt
      val h = 16 + (id % 11).toInt
      val nf = 2 + (id % 4).toInt
      assert(Multimodal.AviDecoder.probe(payload) === ((w, h, nf)), s"id $id")
      for (f <- 0 until nf) {
        val jpeg = Multimodal.AviDecoder.frame(payload, f)
        // every frame chunk is an independent entropy-coded JPEG stream
        assert((jpeg(0) & 0xff, jpeg(1) & 0xff) === ((0xff, 0xd8)), s"id $id f$f SOI")
        assert((jpeg(jpeg.length - 2) & 0xff, jpeg(jpeg.length - 1) & 0xff) ===
          ((0xff, 0xd9)), s"id $id f$f EOI")
        // lossy per-frame decode stays close to the generator raster
        val img = javax.imageio.ImageIO.read(
          new java.io.ByteArrayInputStream(jpeg))
        assert((img.getWidth, img.getHeight) === ((w, h)), s"id $id f$f dims")
        var absErr = 0L
        for (y <- 0 until h; x <- 0 until w) {
          val want = (id * 31 + f * 41 + x * 7 + y * 13) % 256
          absErr += math.abs((img.getRGB(x, y) & 0xff) - want)
        }
        val mae = absErr.toDouble / (w * h)
        assert(mae < 24.0, s"id $id frame $f decoded raster MAE $mae")
      }
    }
  }

  test("AviDecoder rejects non-AVI bytes (garbage, and a valid WAV)") {
    intercept[IllegalArgumentException](
      Multimodal.AviDecoder.probe("definitely not an AVI".getBytes("UTF-8")))
    // a well-formed RIFF of the WRONG form must also be rejected: the
    // parser reads the form tag, not just the RIFF magic
    val wav = Multimodal.wavMediaTable(spark, sf("sf0.001"))
      .filter(_.media_id == 0L).collect().head.payload
    intercept[IllegalArgumentException](Multimodal.AviDecoder.probe(wav))
  }

  test("AviDecoder fails loudly when movi is truncated vs the avih header") {
    val good = Multimodal.aviMediaTable(spark, sf("sf0.001"))
      .filter(_.media_id == 1L).collect().head.payload
    val (w, h, frames) = Multimodal.parseAvi(good, 1L)
    assert(frames.size >= 2)
    // rebuild the container with the LAST frame dropped but leave the
    // header's dwTotalFrames as-is by patching the rebuilt header back
    val fewer = frames.dropRight(1).map { case (o, l) =>
      java.util.Arrays.copyOfRange(good, o, o + l)
    }
    val rebuilt = Multimodal.buildAvi(w, h, fewer)
    // dwTotalFrames lives at hdrl avih data offset 16 → absolute 12+12+8+16
    rebuilt(12 + 12 + 8 + 16) = frames.size.toByte
    intercept[IllegalArgumentException](Multimodal.parseAvi(rebuilt, 1L))
  }

  test("phashEdges stays linear on a pathological all-identical-hash corpus") {
    import org.apache.spark.sql.functions.{col, lit, when}
    // 20,000 threshold-identical images (e.g. constant-color rasters all
    // hashing to the same 64-bit value): the r6 all-pairs semantics would
    // emit ~2×10^8 pairs through ONE band bucket; the class/banding edge
    // set must emit exactly N−1 rep→member edges and see a single row in
    // the banding stage.
    val n = 20000
    val degenerate = spark.range(n)
      .select(col("id").as("media_id"), lit(0L).as("hi"), lit(0L).as("lo"))
    val edges = Multimodal.phashEdges(degenerate)
    assert(edges.count() === (n - 1).toLong)
    assert(edges.agg(org.apache.spark.sql.functions.max(col("hamming")))
      .head().getInt(0) === 0)
    // near-pair structure is preserved across classes: two classes one
    // bit apart yield their members' rep edges plus ONE class-pair row
    val twoClasses = spark.range(6).select(col("id").as("media_id"),
      lit(0L).as("hi"), when(col("id") % 2 === 0, 0L).otherwise(1L).as("lo"))
    val e2 = Multimodal.phashEdges(twoClasses).collect()
    assert(e2.count(_.getInt(2) == 0) === 4) // 3-member classes → 2 edges each
    assert(e2.count(_.getInt(2) == 1) === 1) // one distinct-hash pair row
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
