package graft

import java.nio.file.{Files, Paths}
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import graft.ingest.{CaseJson, Sinks}
import graft.multimodal.Multimodal
import graft.schema._

/** Specs for the multimodal column surface (S3 stub plumbing) and the S4
  * explicit-schema JSON round-trip.
  */
class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  /** Real codec-produced images (JDK ImageIO) with known dimensions, plus
    * one non-image file — the decode is header parsing, but the fixtures
    * are genuine PNG/JPEG/GIF bytes.
    */
  private def realImage(format: String, w: Int, h: Int): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    (0 until w).foreach(x => (0 until h).foreach(y =>
      img.setRGB(x, y, (x * 31 + y) & 0xFFFFFF)))
    val bos = new java.io.ByteArrayOutputStream()
    assert(javax.imageio.ImageIO.write(img, format, bos),
      s"no JDK writer for $format")
    bos.toByteArray
  }

  private def mediaDir(): String = {
    val dir = Files.createTempDirectory("media").toString
    Files.write(Paths.get(dir, "a.png"), realImage("png", 37, 23))
    Files.write(Paths.get(dir, "b.jpg"), realImage("jpg", 64, 48))
    Files.write(Paths.get(dir, "d.gif"), realImage("gif", 12, 7))
    Files.write(Paths.get(dir, "c.bin"), Array[Byte](1, 2, 3, 4, 5))
    dir
  }

  test("S3: typed metadata struct with TRUE header-parsed dimensions") {
    val df = Multimodal.withMeta(
      Multimodal.readBinaryDir(spark, mediaDir()), "content")
    val metas = df
      .select(regexp_extract(col("path"), "([^/]+)$", 1).as("name"),
        col("meta"), col("length"))
      .collect()
      .map(r => (r.getString(0), r.getAs[Row](1), r.getLong(2)))
    val byName = metas.map(m => m._1 -> m._2).toMap
    assert(byName("a.png").getAs[String]("mime") === "image/png")
    assert(byName("a.png").getAs[Int]("width") === 37)
    assert(byName("a.png").getAs[Int]("height") === 23)
    assert(byName("b.jpg").getAs[String]("mime") === "image/jpeg")
    assert(byName("b.jpg").getAs[Int]("width") === 64)
    assert(byName("b.jpg").getAs[Int]("height") === 48)
    assert(byName("d.gif").getAs[String]("mime") === "image/gif")
    assert(byName("d.gif").getAs[Int]("width") === 12)
    assert(byName("d.gif").getAs[Int]("height") === 7)
    assert(byName("c.bin").getAs[String]("mime") === "application/octet-stream")
    assert(byName("c.bin").isNullAt(byName("c.bin").fieldIndex("width")))
    metas.foreach { case (_, meta, len) =>
      assert(meta.getAs[Long]("n_bytes") === len)
    }
  }

  test("S3: feature extraction decodes real pixels into a layout descriptor") {
    val dir = Files.createTempDirectory("media-feat").toString
    // left half black, right half white → strip lumas step from 0 to 1
    val img = new java.awt.image.BufferedImage(
      40, 10, java.awt.image.BufferedImage.TYPE_INT_RGB)
    (0 until 40).foreach(x => (0 until 10).foreach(y =>
      img.setRGB(x, y, if (x < 20) 0x000000 else 0xFFFFFF)))
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    Files.write(Paths.get(dir, "split.png"), bos.toByteArray)
    Files.write(Paths.get(dir, "junk.bin"), Array[Byte](1, 2, 3))

    val df = Multimodal.readBinaryDir(spark, dir)
    val rows = Multimodal.extractFeatures(df, 4)
      .as[(String, Seq[Float], Boolean)].collect()
      .map(r => (r._1.substring(r._1.lastIndexOf('/') + 1), (r._2, r._3)))
      .toMap
    val (split, splitDecoded) = rows("split.png")
    assert(splitDecoded, "real PNG must decode")
    assert(split.length === 4)
    assert(split(0) < 0.05f && split(1) < 0.05f,
      s"left strips must be dark: $split")
    assert(split(2) > 0.95f && split(3) > 0.95f,
      s"right strips must be bright: $split")
    val (junk, junkDecoded) = rows("junk.bin")
    assert(!junkDecoded, "non-image bytes fall back, flagged undecoded")
    assert(junk.length === 4)
    // determinism across invocations
    val again = Multimodal.extractFeatures(df, 4)
      .as[(String, Seq[Float], Boolean)].collect()
      .map(r => (r._1.substring(r._1.lastIndexOf('/') + 1), (r._2, r._3)))
      .toMap
    assert(again === rows)
  }

  test("S3: frame sampling shape (every step-th chunk as binary frame)") {
    val bytes = Array.tabulate[Byte](100)(_.toByte)
    val df = Seq(("v1", bytes)).toDF("id", "content")
    val frames = Multimodal.sampleFrames(df, "content", 10, 2)
      .select("frames").as[Seq[Array[Byte]]].head()
    assert(frames.length === 5) // 100 bytes / (10*2) chunks
    assert(frames.forall(_.length === 10))
    assert(frames(1).head === 20.toByte) // frame i starts at i*chunk*step
  }

  test("S3: corrupt GIF8 header falls back to byte chunks, not empty frames") {
    // ADVICE r10: a 'GIF8' blob the decoder can't open used to yield an
    // EMPTY frames array; the documented contract is the chunk fallback
    val junk = ("GIF8" + "x" * 96).getBytes("US-ASCII") // 100 bytes, no GIF body
    val df = Seq(("bad", junk)).toDF("id", "content")
    val frames = Multimodal.sampleFrames(df, "content", 10, 2)
      .select("frames").as[Seq[Array[Byte]]].head()
    assert(frames.length === 5) // same shape as the plain-bytes fallback
    assert(frames.forall(_.length === 10))
  }

  test("S3: MJPEG-AVI yields its real JPEG frames (RIFF walk, no codec)") {
    // hand-rolled minimal AVI: RIFF(AVI  LIST(movi 00dc... )) — MJPEG
    // stores each frame as a standalone JPEG chunk
    def jpeg(shade: Int): Array[Byte] = {
      val img = new java.awt.image.BufferedImage(
        8, 6, java.awt.image.BufferedImage.TYPE_INT_RGB)
      val g = img.createGraphics()
      g.setColor(new java.awt.Color(shade, shade, shade)); g.fillRect(0, 0, 8, 6)
      g.dispose()
      val bos = new java.io.ByteArrayOutputStream()
      assert(javax.imageio.ImageIO.write(img, "jpg", bos))
      bos.toByteArray
    }
    def chunk(id: String, data: Array[Byte]): Array[Byte] = {
      val out = new java.io.ByteArrayOutputStream()
      out.write(id.getBytes("US-ASCII"))
      val sz = data.length
      out.write(Array[Byte](sz.toByte, (sz >> 8).toByte, (sz >> 16).toByte,
        (sz >> 24).toByte))
      out.write(data)
      if ((sz & 1) == 1) out.write(0) // RIFF even padding
      out.toByteArray
    }
    val fr = Seq(jpeg(40), jpeg(120), jpeg(200))
    val movi = "movi".getBytes("US-ASCII") ++
      fr.flatMap(j => chunk("00dc", j))
    val body = "AVI ".getBytes("US-ASCII") ++ chunk("LIST", movi)
    val avi = chunk("RIFF", body)

    // step=2 → frames 0 and 2, byte-identical to the source JPEGs
    val got = Multimodal.sampleFrames(
      Seq(("v1", avi)).toDF("id", "content"), "content", 10, 2)
      .select("frames").as[Seq[Array[Byte]]].head()
    assert(got.length === 2)
    assert(got(0).toSeq === fr(0).toSeq)
    assert(got(1).toSeq === fr(2).toSeq)
    assert(got.forall(f => (f(0) & 0xFF) == 0xFF && (f(1) & 0xFF) == 0xD8),
      "every frame is a standalone JPEG (SOI marker)")
    // and the extracted frame decodes through the real feature path
    val dims = graft.expr.ImageDims.compute(got(0))
    assert(dims.getUTF8String(0).toString === "image/jpeg")
    assert(dims.getInt(1) === 8 && dims.getInt(2) === 6)

    // robustness: every truncation of the valid AVI, plus random and
    // adversarial (huge-declared-size) bytes, must return cleanly — a
    // corrupt container yields fewer/no frames, never an exception
    (0 to avi.length by 7).foreach { n =>
      Multimodal.mjpegFrames(java.util.Arrays.copyOf(avi, n), 1)
    }
    val rnd = new scala.util.Random(7)
    (1 to 200).foreach { _ =>
      val junk = Array.fill[Byte](rnd.nextInt(64))(rnd.nextInt().toByte)
      val isRiff = junk.length >= 4 && junk(0) == 'R' && junk(1) == 'I' &&
        junk(2) == 'F' && junk(3) == 'F'
      val frames = Multimodal.mjpegFrames(junk, 1) // must not throw
      assert(isRiff || frames.isEmpty, "non-RIFF junk yields nothing")
    }
    val evil = avi.clone()
    evil(16) = 0xFC.toByte; evil(17) = 0xFF.toByte
    evil(18) = 0xFF.toByte; evil(19) = 0x7F.toByte // LIST size 0x7FFFFFFC
    Multimodal.mjpegFrames(evil, 1) // must not throw (long-math guard)
  }

  test("S3: animated GIF frames decode through the JDK codec, re-encoded PNG") {
    def frame(c: java.awt.Color): java.awt.image.BufferedImage = {
      val img = new java.awt.image.BufferedImage(
        8, 6, java.awt.image.BufferedImage.TYPE_INT_RGB)
      val g = img.createGraphics()
      g.setColor(c); g.fillRect(0, 0, 8, 6); g.dispose()
      img
    }
    // solid primaries survive GIF's palette quantization exactly
    val colors = Seq(
      new java.awt.Color(255, 0, 0), new java.awt.Color(0, 255, 0),
      new java.awt.Color(0, 0, 255), new java.awt.Color(255, 255, 255))
    val bos = new java.io.ByteArrayOutputStream()
    val ios = javax.imageio.ImageIO.createImageOutputStream(bos)
    val w = javax.imageio.ImageIO.getImageWritersByFormatName("gif").next()
    w.setOutput(ios)
    w.prepareWriteSequence(null)
    colors.foreach(c => w.writeToSequence(
      new javax.imageio.IIOImage(frame(c), null, null), null))
    w.endWriteSequence(); w.dispose(); ios.close()
    val gif = bos.toByteArray
    assert(new String(gif, 0, 4, "US-ASCII") === "GIF8")

    // step=2 → stored frames 0 and 2, decoded + PNG re-encoded
    val got = Multimodal.sampleFrames(
      Seq(("v1", gif)).toDF("id", "content"), "content", 10, 2)
      .select("frames").as[Seq[Array[Byte]]].head()
    assert(got.length === 2)
    Seq(0, 2).zip(got).foreach { case (i, png) =>
      assert((png(0) & 0xFF) == 0x89 && png(1) == 'P', "PNG signature")
      val img = javax.imageio.ImageIO.read(
        new java.io.ByteArrayInputStream(png))
      assert(img.getWidth === 8 && img.getHeight === 6)
      assert(new java.awt.Color(img.getRGB(4, 3)) === colors(i), s"frame $i")
    }
    // truncations and junk return cleanly — fewer/no frames, no throw
    (0 to gif.length by 5).foreach { n =>
      Multimodal.gifFrames(java.util.Arrays.copyOf(gif, n), 1)
    }
    assert(Multimodal.gifFrames("GIF8junk-not-a-gif".getBytes, 1).isEmpty)
    assert(Multimodal.gifFrames(Array[Byte](1, 2, 3), 1).isEmpty)
  }

  test("S3: uncompressed BI_RGB AVI frames decode as real BMPs (dims, orientation, color)") {
    def chunk(id: String, data: Array[Byte]): Array[Byte] = {
      val out = new java.io.ByteArrayOutputStream()
      out.write(id.getBytes("US-ASCII"))
      val sz = data.length
      out.write(Array[Byte](sz.toByte, (sz >> 8).toByte, (sz >> 16).toByte,
        (sz >> 24).toByte))
      out.write(data)
      if ((sz & 1) == 1) out.write(0)
      out.toByteArray
    }
    def le32(v: Int) = Array[Byte](v.toByte, (v >> 8).toByte,
      (v >> 16).toByte, (v >> 24).toByte)
    def le16(v: Int) = Array[Byte](v.toByte, (v >> 8).toByte)
    // BITMAPINFOHEADER: 4x2, 1 plane, 24bpp, BI_RGB
    val bih = le32(40) ++ le32(4) ++ le32(2) ++ le16(1) ++ le16(24) ++
      le32(0) ++ le32(0) ++ le32(0) ++ le32(0) ++ le32(0) ++ le32(0)
    assert(bih.length === 40)
    // DIB pixels, bottom-up BGR, 4px*3B = 12B rows (already 4-aligned):
    // stored row 0 = image BOTTOM row — all green except a RED first px;
    // stored row 1 = image TOP row — all blue
    val bgr = (px: (Int, Int, Int)) =>
      Array[Byte](px._3.toByte, px._2.toByte, px._1.toByte) // (r,g,b)→BGR
    val bottom = bgr((255, 0, 0)) ++ bgr((0, 255, 0)) ++
      bgr((0, 255, 0)) ++ bgr((0, 255, 0))
    val top = Array.fill(4)(bgr((0, 0, 255))).flatten
    val frame = bottom ++ top
    val strl = "strl".getBytes("US-ASCII") ++ chunk("strf", bih)
    val hdrl = "hdrl".getBytes("US-ASCII") ++ chunk("LIST", strl)
    val movi = "movi".getBytes("US-ASCII") ++
      chunk("00db", frame) ++ chunk("00db", frame)
    val body = "AVI ".getBytes("US-ASCII") ++
      chunk("LIST", hdrl) ++ chunk("LIST", movi)
    val avi = chunk("RIFF", body)

    val frames = Multimodal.aviFrames(avi, 1)
    assert(frames.length === 2)
    frames.foreach { f =>
      assert(f(0) === 'B'.toByte && f(1) === 'M'.toByte, "BMP magic")
      val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(f))
      assert(img != null, "JDK ImageIO must decode the wrapped frame")
      assert(img.getWidth === 4 && img.getHeight === 2)
      assert((img.getRGB(0, 1) & 0xFFFFFF) === 0xFF0000,
        "bottom-up DIB: stored row 0 is the image's bottom row (red px)")
      assert((img.getRGB(1, 1) & 0xFFFFFF) === 0x00FF00)
      assert((img.getRGB(0, 0) & 0xFFFFFF) === 0x0000FF, "top row blue")
    }
    // a db-frame AVI with NO usable strf (e.g. audio-only header) passes
    // raw bytes through rather than wrapping garbage
    val bodyNoHdr = "AVI ".getBytes("US-ASCII") ++
      chunk("LIST", "movi".getBytes("US-ASCII") ++ chunk("00db", frame))
    val raw = Multimodal.aviFrames(chunk("RIFF", bodyNoHdr), 1)
    assert(raw.length === 1 && raw.head.toSeq === frame.toSeq)
  }

  /** Hand-rolled RIFF WAVE bytes: `make` fills sample index → amplitude
    * in [-1, 1]; 16-bit PCM unless overridden.
    */
  private def wav(nFrames: Int, channels: Int = 1, rate: Int = 8000,
      bits: Int = 16, floatFmt: Boolean = false)(
      make: Int => Float): Array[Byte] = {
    val bytesPer = bits / 8
    val data = new java.io.ByteArrayOutputStream()
    (0 until nFrames).foreach { f =>
      val v = make(f)
      (0 until channels).foreach { _ =>
        if (floatFmt) {
          val b = java.lang.Float.floatToIntBits(v)
          data.write(b & 0xFF); data.write((b >> 8) & 0xFF)
          data.write((b >> 16) & 0xFF); data.write((b >> 24) & 0xFF)
        } else if (bits == 16) {
          val s = math.max(-32768, math.min(32767, (v * 32768).toInt))
          data.write(s & 0xFF); data.write((s >> 8) & 0xFF)
        } else data.write(
          math.max(0, math.min(255, (v * 128).toInt + 128)))
      }
    }
    def le16(v: Int) = Array[Byte](v.toByte, (v >> 8).toByte)
    def le32(v: Int) = Array[Byte](v.toByte, (v >> 8).toByte,
      (v >> 16).toByte, (v >> 24).toByte)
    val align = channels * bytesPer
    val fmt = le16(if (floatFmt) 3 else 1) ++ le16(channels) ++
      le32(rate) ++ le32(rate * align) ++ le16(align) ++ le16(bits)
    val payload = data.toByteArray
    val body = "WAVE".getBytes("US-ASCII") ++
      "fmt ".getBytes("US-ASCII") ++ le32(fmt.length) ++ fmt ++
      "data".getBytes("US-ASCII") ++ le32(payload.length) ++ payload
    "RIFF".getBytes("US-ASCII") ++ le32(body.length) ++ body
  }

  test("S3: WAV metadata parses channels, rate, depth, frame count") {
    val b = wav(nFrames = 100, channels = 2, rate = 44100, bits = 16)(
      i => math.sin(i / 10.0).toFloat)
    assert(Multimodal.wavInfo(b) === Some(("pcm", 2, 44100, 16, 100L)))
    val dir = Files.createTempDirectory("audio").toString
    Files.write(Paths.get(dir, "x.wav"), b)
    Files.write(Paths.get(dir, "junk.bin"), Array[Byte](9, 9, 9, 9, 9))
    val metas = Multimodal.withAudioMeta(
      Multimodal.readBinaryDir(spark, dir), "content")
      .select(regexp_extract(col("path"), "([^/]+)$", 1), col("audio_meta"))
      .collect().map(r => r.getString(0) -> r.getAs[Row](1)).toMap
    assert(metas("x.wav").getAs[String]("mime") === "audio/wav")
    assert(metas("x.wav").getAs[Int]("sample_rate") === 44100)
    assert(metas("x.wav").getAs[Long]("n_frames") === 100L)
    assert(metas("junk.bin").isNullAt(metas("junk.bin").fieldIndex("mime")))
  }

  test("S3: audio features are the real waveform, not the fallback hash") {
    // amplitude ramps 0 → 1 across the file: the loudness-layout strips
    // must be monotonically increasing, which no byte-hash fallback is;
    // a pure tone's zero-crossing rate matches 2·f/rate
    val n = 8000
    val ramp = wav(n)(i => (i.toFloat / n) *
      (if (i % 2 == 0) 1 else -1)) // alternating sign: max ZCR
    val tone = wav(n, rate = 8000)(
      i => (0.8 * math.sin(2 * math.Pi * 440 * i / 8000.0)).toFloat)
    val dir = Files.createTempDirectory("audio2").toString
    Files.write(Paths.get(dir, "ramp.wav"), ramp)
    Files.write(Paths.get(dir, "tone.wav"), tone)
    Files.write(Paths.get(dir, "junk.bin"), Array[Byte](1, 2, 3))
    val rows = Multimodal.extractAudioFeatures(
      Multimodal.readBinaryDir(spark, dir), dim = 8)
      .collect().map(r => (
        r.getString(0).split('/').last,
        r.getSeq[Float](1), r.getFloat(2), r.getBoolean(3))).toSeq
    val byName = rows.map(r => r._1 -> r).toMap
    val (_, rampF, rampZ, rampOk) = byName("ramp.wav")
    assert(rampOk && rampF.sliding(2).forall(p => p(0) < p(1)),
      s"ramp strips not increasing: $rampF")
    assert(rampZ > 0.95f, s"alternating-sign ramp ZCR ≈ 1, got $rampZ")
    val (_, toneF, toneZ, toneOk) = byName("tone.wav")
    assert(toneOk && math.abs(toneZ - 2 * 440.0 / 8000) < 0.01,
      s"440 Hz at 8 kHz crosses ~0.11/sample, got $toneZ")
    assert(toneF.forall(v => v > 0.4f && v < 0.6f),
      s"|sin| mean ≈ 2·0.8/π ≈ 0.51 per strip: $toneF")
    assert(!byName("junk.bin")._4, "junk must flag decoded = false")
  }

  test("S3: 8-bit, stereo-mix, and float32 WAV variants decode identically") {
    val n = 1000
    def sig(i: Int) = (0.5 * math.sin(2 * math.Pi * 50 * i / 8000.0)).toFloat
    val variants = Seq(
      wav(n, bits = 16)(sig),
      wav(n, bits = 8)(sig),
      wav(n, channels = 2)(sig), // both channels equal → mono mix = signal
      wav(n, floatFmt = true, bits = 32)(sig))
    val feats = variants.map { b =>
      val s = Multimodal.wavSamples(b).get
      assert(s.length === n)
      s
    }
    // all four decode to the same waveform within quantization error
    // (8-bit has 1/128 resolution)
    feats.tail.foreach { f =>
      val maxErr = feats.head.lazyZip(f).map((a, b) => math.abs(a - b)).max
      assert(maxErr < 0.02f, s"variant diverges: $maxErr")
    }
  }

  test("S4: K1-written case JSON round-trips through the explicit schema") {
    val fc = FailureCase(
      case_id = "CZ0000001", url = "https://example.org/cf/CZ0000001.html",
      case_name = "試験事例", date = "2006-06-05", location = "東京",
      facility = "工場", summary = "概要", phenomenon = "事象",
      process = "経過1\n\n経過2", cause = "原因", response = "対処",
      countermeasure = "対策", knowledge = Seq("知識1", "知識2"),
      background = "背景",
      scenario = Scenario(Seq(Seq("無知", "無知識")), Seq(), Seq(Seq("被害"))),
      images = Images("DZ.jpg", Seq(MultimediaItem("MZ1", "写真"))),
      sources = Seq("出典1"), casualties = Casualties(1, 0),
      financial_damage = "1億円", social_impact = "大", notes = "",
      field = "機械", authors = Seq("山田 太郎"))
    val dir = Files.createTempDirectory("s4").toString
    val routedLike = Seq(fc).toDF()
      .withColumn("status", lit("success"))
      .withColumn("missing_fields", array().cast("array<string>"))
    Sinks.writePerCaseJson(routedLike, dir)
    val back = CaseJson.read(spark, s"$dir/*.json").as[FailureCase].head()
    assert(back === fc)
  }

  /** A photo-like test scene rendered at any resolution: a seeded coarse
    * 9×9 gray grid, bilinearly interpolated — content is resolution-
    * independent by construction (a "resized copy" is the same scene,
    * not a rescale artifact) and its spectrum fills the low-frequency
    * block pHash thresholds over, the way natural images do. A sparse
    * synthetic scene (a sinusoid + checkerboard) leaves most AC
    * coefficients at ≈0, where sign bits flip on any perturbation —
    * a fixture pathology, not a hash property. `shift` brightens every
    * pixel (range stays inside [0, 230] so +12 never clips — clipping
    * would be a genuine content change); `seed` changes the content.
    */
  private def scene(w: Int, h: Int, shift: Int = 0,
      seed: Int = 0): Array[Byte] = {
    val rng = new scala.util.Random(seed * 7919 + 17)
    val grid = Array.fill(9, 9)(40 + rng.nextInt(176))
    val img = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    (0 until w).foreach { x =>
      (0 until h).foreach { y =>
        val (gx, gy) = ((x + 0.5) / w * 8, (y + 0.5) / h * 8)
        val (i, j) = (math.min(7, gx.toInt), math.min(7, gy.toInt))
        val (fx, fy) = (gx - i, gy - j)
        val base =
          grid(j)(i) * (1 - fx) * (1 - fy) + grid(j)(i + 1) * fx * (1 - fy) +
            grid(j + 1)(i) * (1 - fx) * fy + grid(j + 1)(i + 1) * fx * fy
        val g = math.max(0, math.min(255, base.toInt + shift))
        img.setRGB(x, y, (g << 16) | (g << 8) | g)
      }
    }
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  test("pHash: invariant to resize/brightness, far for distinct content") {
    def ham(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)
    val orig = Multimodal.pHash64(scene(64, 64)).get
    // determinism
    assert(Multimodal.pHash64(scene(64, 64)).get === orig)
    // the SAME scene at a different resolution: area-resample + low-pass
    // must keep the hash within the near-dup threshold
    val resized = Multimodal.pHash64(scene(96, 96)).get
    assert(ham(orig, resized) <= 3, s"resize moved ${ham(orig, resized)} bits")
    // a global brightness shift only moves the (excluded) DC term
    val bright = Multimodal.pHash64(scene(64, 64, shift = 12)).get
    assert(ham(orig, bright) <= 3, s"brightness moved ${ham(orig, bright)} bits")
    // DIFFERENT content must be far — near half the 63 informative bits
    val other = Multimodal.pHash64(scene(64, 64, seed = 3)).get
    assert(ham(orig, other) > 10, s"distinct content only ${ham(orig, other)} apart")
    // undecodable bytes: None, no crash, caller keeps the row
    assert(Multimodal.pHash64(Array[Byte](1, 2, 3)) === None)
    assert(Multimodal.pHash64(Array.empty[Byte]) === None)
  }

  test("imageNearDup: banded join catches the plants, skips distinct pairs") {
    val dir = Files.createTempDirectory("phash").toString
    Files.write(Paths.get(dir, "orig.png"), scene(64, 64))
    Files.write(Paths.get(dir, "resized.png"), scene(96, 96))
    Files.write(Paths.get(dir, "bright.png"), scene(64, 64, shift = 12))
    Files.write(Paths.get(dir, "other.png"), scene(64, 64, seed = 3))
    Files.write(Paths.get(dir, "corrupt.bin"), Array[Byte](9, 9, 9))
    val df = Multimodal.readBinaryDir(spark, dir)
    val pairs = Multimodal.imageNearDup(df, maxHamming = 3)
      .as[(String, String, Long)].collect()
      .map(r => (r._1.split('/').last, r._2.split('/').last, r._3)).toSeq
    val caught = pairs.map(p => Set(p._1, p._2))
    // all three variants of the scene pair up with each other...
    assert(caught.contains(Set("orig.png", "resized.png")))
    assert(caught.contains(Set("orig.png", "bright.png")))
    assert(caught.contains(Set("bright.png", "resized.png")))
    // ...the distinct scene and the undecodable file pair with nothing
    assert(!pairs.exists(p => p._1.contains("other") || p._2.contains("other")))
    assert(!pairs.exists(p => p._1.contains("corrupt") || p._2.contains("corrupt")))
    // and every reported distance respects the threshold
    pairs.foreach { case (a, b, d) => assert(d <= 3, s"($a,$b) at $d") }
  }

  test("audio near-dup: gain-scaled recopy caught, different recording " +
    "and junk bytes pair with nothing") {
    // amplitude-modulated tones: the ENVELOPE is the fingerprinted
    // structure, so a different AM rate is a different recording even
    // at the same carrier, and a pure gain change preserves every
    // delta sign exactly
    def am(amRate: Double, gain: Float)(i: Int): Float =
      (gain * math.abs(math.sin(2 * math.Pi * amRate * i / 8000.0)) *
        math.sin(2 * math.Pi * 440 * i / 8000.0)).toFloat
    val orig = wav(nFrames = 8000)(am(3.0, 0.9f))
    val quiet = wav(nFrames = 8000)(am(3.0, 0.3f))     // gain-scaled copy
    val other = wav(nFrames = 8000)(am(11.0, 0.9f))    // different envelope
    // gain invariance holds at the hash level, not just within 3 bits
    assert(Multimodal.audioHash64(orig).get ===
      Multimodal.audioHash64(quiet).get,
      "uniform gain must preserve every energy-delta sign")
    assert(java.lang.Long.bitCount(Multimodal.audioHash64(orig).get ^
      Multimodal.audioHash64(other).get) > 10,
      "different AM envelopes must be far apart")
    assert(Multimodal.audioHash64("RIFFjunk".getBytes).isEmpty)
    val df = Seq(
      ("orig.wav", orig), ("quiet.wav", quiet), ("other.wav", other),
      ("junk.bin", Array[Byte](9, 9, 9, 9))).toDF("path", "content")
    val pairs = Multimodal.audioNearDup(df)
      .as[(String, String, Long)].collect().toSeq
    assert(pairs.map(p => Set(p._1, p._2)) ===
      Seq(Set("orig.wav", "quiet.wav")),
      s"exactly the gain pair must be caught, got $pairs")
    assert(pairs.head._3 === 0L, "gain pair is hash-identical")
  }

  test("video near-dup: brightness-shifted recopy caught on shared " +
    "frames, one incidental shared still stays below the gate") {
    def toImg(png: Array[Byte]) =
      javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(png))
    def gifOf(frames: Seq[Array[Byte]]): Array[Byte] = {
      val bos = new java.io.ByteArrayOutputStream()
      val ios = javax.imageio.ImageIO.createImageOutputStream(bos)
      val w = javax.imageio.ImageIO.getImageWritersByFormatName("gif").next()
      w.setOutput(ios)
      w.prepareWriteSequence(null)
      frames.foreach(f => w.writeToSequence(
        new javax.imageio.IIOImage(toImg(f), null, null), null))
      w.endWriteSequence(); w.dispose(); ios.close()
      bos.toByteArray
    }
    // A and B share two scenes (B's copies brightness-shifted — the
    // re-encode case); B's third frame is new. C shares ONE still with
    // A (the incidental title card) plus its own scenes. D is junk.
    val vA = gifOf(Seq(scene(64, 64, 0, 0), scene(64, 64, 0, 1),
      scene(64, 64, 0, 2)))
    val vB = gifOf(Seq(scene(64, 64, 25, 0), scene(64, 64, 25, 1),
      scene(64, 64, 0, 9)))
    val vC = gifOf(Seq(scene(64, 64, 0, 2), scene(64, 64, 0, 5),
      scene(64, 64, 0, 6)))
    val got = Multimodal.videoNearDup(Seq(
      ("a.gif", vA), ("b.gif", vB), ("c.gif", vC),
      ("junk.bin", Array[Byte](9, 9, 9))).toDF("path", "content"))
      .as[(String, String, Long, Long)].collect().toSeq
    assert(got.map(p => (p._1, p._2)) === Seq(("a.gif", "b.gif")),
      s"exactly the recopy pair must clear the 2-shared-frame gate: $got")
    assert(got.head._3 >= 2L, "both shared scenes must match")
    // ...the single shared still IS visible at minShared = 1 (so the
    // gate, not the matching, is what excluded a↔c)
    val loose = Multimodal.videoNearDup(Seq(
      ("a.gif", vA), ("c.gif", vC)).toDF("path", "content"),
      minShared = 1)
      .as[(String, String, Long, Long)].collect().toSeq
    assert(loose.map(p => (p._1, p._2)) === Seq(("a.gif", "c.gif")) &&
      loose.head._3 === 1L,
      s"the incidental still must match exactly once: $loose")
  }

  test("q114 bytes side: real image bytes join onto the refs and each " +
    "record re-collects in order with contiguous offsets") {
    val sf = "/root/testdata/sf0.001"
    val segs = graft.queries.Catalog.queries("q114_interleave_mm")(spark, sf)
    val refs = segs.filter(col("kind") === "image")
      .select("ref").distinct().as[String].collect().toSeq.sorted
    assert(refs.nonEmpty, "no image segments at this sf")
    // genuine PNG bytes per ref — all 9×6 so the decode claim is sharp;
    // withhold every 5th ref to exercise the missing-bytes path
    val supplied = refs.zipWithIndex.filter(_._2 % 5 != 4).map(_._1).toSet
    val images = supplied.toSeq.sorted
      .map(r => (r, realImage("png", 9, 6)))
      .toDF("ref", "content")
    val got = Multimodal.assembleRecords(segs, images)
      .orderBy("doc_id")
      .as[(Long, Seq[(Long, String, String, Long, Long, Option[(String, Option[Int], Option[Int], Long)])], Long, Long, Long)]
      .collect().toSeq
    val docsWithSegs = segs.select("doc_id").distinct().count()
    assert(got.size.toLong === docsWithSegs, "one record per document")
    var prevEnd = -1L
    var sawResolved = 0L
    var sawMissing = 0L
    got.foreach { case (doc, rec, recToks, nImg, nRes) =>
      // order: seg_idx 0..k dense; offsets contiguous inside the record
      assert(rec.map(_._1) === rec.indices.map(_.toLong),
        s"doc $doc: segment order broken")
      rec.sliding(2).foreach {
        case Seq(a, b) =>
          assert(b._5 === a._5 + a._4,
            s"doc $doc: g_off gap between ${a._1} and ${b._1}")
        case _ =>
      }
      assert(recToks === rec.map(_._4).sum)
      // ...and across records: the global stream has no holes (records
      // ordered by doc_id — the q96 concat order)
      if (prevEnd >= 0)
        assert(rec.head._5 === prevEnd, s"doc $doc: global stream hole")
      prevEnd = rec.last._5 + rec.last._4
      assert(nImg === rec.count(_._2 == "image").toLong)
      rec.foreach { seg =>
        if (seg._2 == "text")
          assert(seg._6.isEmpty, s"doc $doc: text segment grew metadata")
        else if (supplied(seg._3)) {
          val m = seg._6.getOrElse(fail(s"doc $doc: supplied ${seg._3} unresolved"))
          assert(m._1 === "image/png" && m._2 === Some(9) && m._3 === Some(6),
            s"doc $doc: wrong decoded dims for ${seg._3}")
          sawResolved += 1
        } else {
          assert(seg._6.isEmpty, s"doc $doc: phantom bytes for ${seg._3}")
          sawMissing += 1
        }
      }
      assert(nRes === rec.count(s2 => s2._2 == "image" && supplied(s2._3)).toLong)
    }
    assert(sawResolved > 0 && sawMissing > 0,
      "both the resolved and missing-bytes paths must be exercised")
  }
}
