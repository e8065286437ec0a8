package graft.operators

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class MultimodalSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private lazy val media = Multimodal.asMedia(
    Seq((1L, "hello world"), (2L, ""), (3L, "payload three"))
      .toDF("doc_id", "text"), "doc_id", "text", "text/plain")

  test("media schema: binary payload + typed metadata struct") {
    val f = media.schema("payload")
    assert(f.dataType.typeName == "binary")
    val meta = media.select("meta.byte_len", "meta.content_hash", "meta.mime")
      .collect().head
    assert(meta.getInt(0) == 11)
    assert(meta.getString(2) == "text/plain")
  }

  test("feature extraction is deterministic and total (no nulls poison it)") {
    val out1 = Multimodal.extractFeatures(spark, media).collect().sortBy(_.media_id)
    val out2 = Multimodal.extractFeatures(spark, media).collect().sortBy(_.media_id)
    assert(out1.toSeq == out2.toSeq)
    assert(out1.length == 3)
    assert(out1.forall(f => f.width >= 1 && f.height >= 1))
  }

  test("null payload yields zeroed features instead of task failure") {
    val withNull = media.withColumn("payload",
      when(col("media_id") === 2, lit(null)).otherwise(col("payload")))
    val out = Multimodal.extractFeatures(spark, withNull)
      .collect().find(_.media_id == 2L).get
    assert(out.byte_len == 0)
  }

  test("frame sampling: stride + cap honored, bytes from the source payload") {
    // 1000-byte payload -> 4 stub frames of 256/256/256/232 bytes
    val big = Seq((7L, Array.fill[Byte](1000)(3))).toDF("media_id", "payload")
    val m = Multimodal.asMedia(big, "media_id", "payload", "video/fake")
    val frames = Multimodal.sampleFrames(spark, m, stride = 2, maxFrames = 10)
      .collect().sortBy(_.frame_no)
    assert(frames.map(_.frame_no).toSeq == Seq(0, 2)) // every 2nd of 4
    assert(frames.head.frame_payload.length == 256)
    assert(frames.head.ts_ms == 0 && frames(1).ts_ms == 67) // 2/30s = 66.7ms
    val capped = Multimodal.sampleFrames(spark, m, stride = 1, maxFrames = 2)
      .collect()
    assert(capped.length == 2)
    // empty payload -> no frames, no failure
    val empty = Multimodal.asMedia(
      Seq((8L, Array.emptyByteArray)).toDF("media_id", "payload"),
      "media_id", "payload", "video/fake")
    assert(Multimodal.sampleFrames(spark, empty, 1, 10).count() == 0)
  }

  test("resize: output byte budget and determinism") {
    val out = Multimodal.resize(spark, media, 4, 3).collect().sortBy(_.media_id)
    assert(out.forall(r => r.width == 4 && r.height == 3))
    assert(out.forall(r => r.thumb.length <= 12))
    val again = Multimodal.resize(spark, media, 4, 3).collect().sortBy(_.media_id)
    assert(out.map(_.thumb.toSeq).toSeq == again.map(_.thumb.toSeq).toSeq)
  }

  /** A real PNG: w×h gradient (distinct luma per pixel so sharpness > 0). */
  private def png(w: Int, h: Int): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(w, h,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until h; x <- 0 until w) {
      val v = (x * 37 + y * 101) % 256
      img.setRGB(x, y, (v << 16) | (v << 8) | v)
    }
    val baos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", baos)
    baos.toByteArray
  }

  test("image/* decodes for REAL via javax.imageio: true dimensions and a " +
       "nonzero Laplacian sharpness") {
    val bytes = png(8, 6)
    val m = Multimodal.asMedia(Seq((1L, bytes)).toDF("media_id", "payload"),
      "media_id", "payload", "image/png")
    val f = Multimodal.extractFeatures(spark, m).collect().head
    assert(f.width == 8 && f.height == 6)
    assert(f.byte_len == bytes.length)
    assert(f.sharpness > 0.0 && f.sharpness <= 1.0)
    // a flat image is perfectly unsharp — the measure is real, not hashed
    val flat = new java.awt.image.BufferedImage(8, 6,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    val baos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(flat, "png", baos)
    val mFlat = Multimodal.asMedia(
      Seq((2L, baos.toByteArray)).toDF("media_id", "payload"),
      "media_id", "payload", "image/png")
    assert(Multimodal.extractFeatures(spark, mFlat).collect().head.sharpness == 0.0)
  }

  test("corrupt image payload falls back to zeroed features, not task failure") {
    val m = Multimodal.asMedia(
      Seq((3L, "not a png at all".getBytes("UTF-8")))
        .toDF("media_id", "payload"),
      "media_id", "payload", "image/png")
    val f = Multimodal.extractFeatures(spark, m).collect().head
    assert(f.width == 0 && f.height == 0 && f.sharpness == 0.0)
    assert(f.byte_len == 16)
  }

  test("image resize really rescales: thumb decodes back at target size") {
    val m = Multimodal.asMedia(Seq((4L, png(16, 12))).toDF("media_id", "payload"),
      "media_id", "payload", "image/png")
    val r = Multimodal.resize(spark, m, 4, 3).collect().head
    val back = javax.imageio.ImageIO.read(
      new java.io.ByteArrayInputStream(r.thumb))
    assert(back.getWidth == 4 && back.getHeight == 3)
  }

  /** Real 16-bit signed mono PCM WAV: a sine at `amp` (of full scale),
    * written through javax.sound.sampled itself.
    */
  private def wav(sampleRate: Float, seconds: Double, amp: Double,
                  freqHz: Double = 440.0): Array[Byte] = {
    import javax.sound.sampled.{AudioFileFormat, AudioFormat, AudioInputStream, AudioSystem}
    val n = math.round(sampleRate * seconds).toInt
    val pcm = new Array[Byte](n * 2)
    var i = 0
    while (i < n) {
      val s = math.round(amp * 32767.0 *
        math.sin(2 * math.Pi * freqHz * i / sampleRate)).toShort
      pcm(2 * i) = (s & 0xff).toByte
      pcm(2 * i + 1) = ((s >> 8) & 0xff).toByte
      i += 1
    }
    val fmt = new AudioFormat(sampleRate, 16, 1, true, false)
    val ais = new AudioInputStream(
      new java.io.ByteArrayInputStream(pcm), fmt, n.toLong)
    val baos = new java.io.ByteArrayOutputStream()
    AudioSystem.write(ais, AudioFileFormat.Type.WAVE, baos)
    baos.toByteArray
  }

  test("audio/* decodes for REAL via javax.sound.sampled: true sample rate, " +
       "channels, duration and sine RMS") {
    val bytes = wav(sampleRate = 8000f, seconds = 0.25, amp = 0.5)
    val m = Multimodal.asMedia(Seq((1L, bytes)).toDF("media_id", "payload"),
      "media_id", "payload", "audio/wav")
    val a = Multimodal.extractAudioFeatures(spark, m).collect().head
    assert(a.sample_rate == 8000.0 && a.channels == 1)
    assert(a.duration_ms == 250L)
    // RMS of a sine at amplitude 0.5 is 0.5/sqrt(2) ~ 0.3536
    assert(math.abs(a.rms - 0.5 / math.sqrt(2.0)) < 0.01, s"rms=${a.rms}")
    assert(a.byte_len == bytes.length)
    // silence really measures 0 — the feature is computed, not hashed
    val silent = Multimodal.extractAudioFeatures(spark,
      Multimodal.asMedia(
        Seq((2L, wav(8000f, 0.1, amp = 0.0))).toDF("media_id", "payload"),
        "media_id", "payload", "audio/wav")).collect().head
    assert(silent.rms == 0.0 && silent.duration_ms == 100L)
  }

  test("audio/* rides the shared extractFeatures pass (rate/channels/rms " +
       "under the MediaFeatures contract)") {
    val bytes = wav(sampleRate = 16000f, seconds = 0.125, amp = 0.25)
    val m = Multimodal.asMedia(Seq((5L, bytes)).toDF("media_id", "payload"),
      "media_id", "payload", "audio/wav")
    val f = Multimodal.extractFeatures(spark, m).collect().head
    assert(f.width == 16000 && f.height == 1) // := sample rate, channels
    assert(math.abs(f.sharpness - 0.25 / math.sqrt(2.0)) < 0.01) // := rms
  }

  test("corrupt audio payload yields zeroed features, not task failure") {
    val m = Multimodal.asMedia(
      Seq((6L, "definitely not a wav".getBytes("UTF-8")))
        .toDF("media_id", "payload"),
      "media_id", "payload", "audio/wav")
    val a = Multimodal.extractAudioFeatures(spark, m).collect().head
    assert(a.sample_rate == 0.0 && a.channels == 0 && a.rms == 0.0)
    assert(a.byte_len == 20)
    val f = Multimodal.extractFeatures(spark, m).collect().head
    assert(f.width == 0 && f.height == 0 && f.sharpness == 0.0)
  }

  // --- minimal ISO BMFF builders for the Mp4Codec tests ---
  private def beInt(v: Int): Array[Byte] =
    Array(((v >> 24) & 0xff).toByte, ((v >> 16) & 0xff).toByte,
      ((v >> 8) & 0xff).toByte, (v & 0xff).toByte)
  private def atom(typ: String, payload: Array[Byte]): Array[Byte] =
    beInt(8 + payload.length) ++ typ.getBytes("ISO-8859-1") ++ payload

  /** mvhd v0: ver/flags, ctime, mtime, timescale, duration (trailing
    * rate/volume/matrix fields omitted — the parser only needs 20 bytes). */
  private def mvhdV0(timescale: Int, duration: Int): Array[Byte] =
    atom("mvhd", beInt(0) ++ beInt(0) ++ beInt(0) ++
      beInt(timescale) ++ beInt(duration))

  /** tkhd v0 up to width/height (16.16 fixed) at payload offsets 76/80. */
  private def tkhdV0(w: Int, h: Int): Array[Byte] =
    atom("tkhd", Array.fill[Byte](76)(0) ++ beInt(w << 16) ++ beInt(h << 16))

  private def minimalMp4: Array[Byte] =
    atom("ftyp", "isom".getBytes("ISO-8859-1") ++ beInt(512)) ++
      atom("moov", mvhdV0(600, 3000) ++ atom("trak", tkhdV0(640, 360)))

  test("video/mp4 container parses for REAL: true duration, dims, tracks " +
       "from moov/mvhd/tkhd") {
    val meta = Multimodal.Mp4Codec.decodeVideo(minimalMp4).get
    assert(meta.timescale == 600L)
    assert(meta.durationMs == 5000L) // 3000 / 600 ticks = 5 s
    assert(meta.width == 640 && meta.height == 360)
    assert(meta.nTracks == 1)
  }

  test("mvhd version 1 (64-bit duration) parses too") {
    val mvhd1 = atom("mvhd", Array[Byte](1, 0, 0, 0) ++
      Array.fill[Byte](16)(0) ++ // ctime + mtime, 8 bytes each
      beInt(1000) ++ beInt(0) ++ beInt(90000)) // timescale, duration u64
    val bytes = atom("moov", mvhd1 ++ atom("trak", tkhdV0(1920, 1080)))
    val meta = Multimodal.Mp4Codec.decodeVideo(bytes).get
    assert(meta.durationMs == 90000L && meta.width == 1920)
  }

  test("video/* rides the shared extractFeatures pass; corrupt payloads " +
       "yield zeroed features") {
    val m = Multimodal.asMedia(
      Seq((7L, minimalMp4), (8L, "not a movie at all".getBytes("UTF-8")))
        .toDF("media_id", "payload"),
      "media_id", "payload", "video/mp4")
    val fs = Multimodal.extractFeatures(spark, m).collect()
      .sortBy(_.media_id)
    assert(fs(0).width == 640 && fs(0).height == 360 && fs(0).sharpness == 5.0)
    assert(fs(1).width == 0 && fs(1).height == 0 && fs(1).sharpness == 0.0)
    val v = Multimodal.extractVideoFeatures(spark, m).collect()
      .sortBy(_.media_id)
    assert(v(0).duration_ms == 5000L && v(0).timescale == 600L && v(0).n_tracks == 1)
    assert(v(1).duration_ms == 0L && v(1).n_tracks == 0)
  }

  test("truncated moov stops the atom walk without throwing") {
    val good = minimalMp4
    // cut mid-moov: still parses the intact prefix or yields None, never throws
    val cut = good.take(good.length - 10)
    val r = Multimodal.Mp4Codec.decodeVideo(cut)
    assert(r.isEmpty || r.get.timescale == 600L)
  }

  test("law: the atom walk is total — arbitrary bytes and arbitrary " +
       "truncations of a valid file never throw") {
    import org.scalacheck.{Gen, rng}
    val genBytes = Gen.choose(0, 4096).flatMap(n =>
      Gen.listOfN(n, Gen.choose(Byte.MinValue, Byte.MaxValue)))
    (1 to 32).foreach { seed =>
      val bytes = genBytes(Gen.Parameters.default, rng.Seed(seed.toLong))
        .get.toArray
      Multimodal.Mp4Codec.decodeVideo(bytes) // must not throw
    }
    val good = minimalMp4
    (0 until good.length).foreach { n =>
      Multimodal.Mp4Codec.decodeVideo(good.take(n)) // every prefix is safe
    }
    // adversarial sizes: size==0 (to-end), size==1 without largesize room,
    // size overflowing the buffer, negative-looking size (high bit set)
    Seq(beInt(0), beInt(1), beInt(Int.MaxValue), beInt(0x80000001.toInt))
      .foreach { sz =>
        val b = sz ++ "moov".getBytes("ISO-8859-1") ++ Array.fill[Byte](16)(7)
        Multimodal.Mp4Codec.decodeVideo(b) // must not throw
      }
  }

  // --- minimal RIFF/AVI builders for the AviMjpegCodec tests ---
  private def leInt(v: Int): Array[Byte] =
    Array((v & 0xff).toByte, ((v >> 8) & 0xff).toByte,
      ((v >> 16) & 0xff).toByte, ((v >> 24) & 0xff).toByte)
  /** RIFF chunk: id + u32le size + data + pad byte when size is odd. */
  private def riffChunk(id: String, data: Array[Byte]): Array[Byte] =
    id.getBytes("ISO-8859-1") ++ leInt(data.length) ++ data ++
      (if (data.length % 2 == 1) Array[Byte](0) else Array.emptyByteArray)
  private def riffList(listType: String, kids: Array[Byte]): Array[Byte] =
    riffChunk("LIST", listType.getBytes("ISO-8859-1") ++ kids)
  private def avih(usPerFrame: Int, totalFrames: Int, w: Int, h: Int): Array[Byte] =
    riffChunk("avih", leInt(usPerFrame) ++ Array.fill[Byte](12)(0) ++
      leInt(totalFrames) ++ Array.fill[Byte](12)(0) ++ leInt(w) ++ leInt(h) ++
      Array.fill[Byte](16)(0))
  private def jpegBytes(w: Int, h: Int): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(w, h,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (x <- 0 until w; y <- 0 until h)
      img.setRGB(x, y, ((x * 255 / w) << 16) | ((y * 255 / h) << 8))
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "jpg", bos)
    bos.toByteArray
  }
  private def mjpegAvi(usPerFrame: Int, frames: Seq[Array[Byte]],
                       w: Int, h: Int): Array[Byte] =
    riffChunk("RIFF", "AVI ".getBytes("ISO-8859-1") ++
      riffList("hdrl", avih(usPerFrame, frames.size, w, h)) ++
      riffList("movi", frames.flatMap(f => riffChunk("00dc", f)).toArray))

  test("MJPEG-AVI frames decode for REAL: demuxed chunks are decodable " +
       "JPEGs with true dimensions") {
    val f0 = jpegBytes(32, 24)
    val f1 = jpegBytes(32, 24).dropRight(0) // second frame, distinct content
    val avi = mjpegAvi(40000, Seq(f0, f1), 32, 24)
    val (meta, frames) = Multimodal.AviMjpegCodec.parse(avi)
    assert(meta.get == Multimodal.AviMjpegCodec.AviMeta(40000L, 2L, 32, 24))
    assert(frames.length == 2)
    assert(frames(0).toSeq == f0.toSeq, "demux must return byte-exact frames")
    val img = javax.imageio.ImageIO.read(
      new java.io.ByteArrayInputStream(frames(0)))
    assert(img.getWidth == 32 && img.getHeight == 24)
    // odd-size frame chunks must respect RIFF even-padding
    val odd = Array.tabulate[Byte](33)(_.toByte)
    val avi2 = riffChunk("RIFF", "AVI ".getBytes("ISO-8859-1") ++
      riffList("movi", riffChunk("00dc", odd) ++ riffChunk("01db", odd)))
    val fs2 = Multimodal.AviMjpegCodec.splitFrames(avi2)
    assert(fs2.length == 2 && fs2.forall(_.toSeq == odd.toSeq))
  }

  test("video/* dispatch sniffs AVI: real per-frame pixels in " +
       "extractFeatures, real demux + container timestamps in sampleFrames") {
    val avi = mjpegAvi(40000, Seq(jpegBytes(48, 32), jpegBytes(48, 32),
      jpegBytes(48, 32)), 48, 32)
    val m = Multimodal.asMedia(
      Seq((1L, avi), (2L, minimalMp4)).toDF("media_id", "payload"),
      "media_id", "payload", "video/avi")
    val fs = Multimodal.extractFeatures(spark, m).collect().sortBy(_.media_id)
    assert(fs(0).width == 48 && fs(0).height == 32,
      "AVI dims from the avih header")
    assert(fs(0).sharpness > 0.0, "sharpness from REAL decoded pixels")
    assert(fs(1).width == 640, "non-AVI video still rides the BMFF walk")
    val frames = Multimodal.sampleFrames(spark, m, stride = 1, maxFrames = 8)
      .collect().filter(_.media_id == 1L).sortBy(_.frame_no)
    assert(frames.length == 3)
    assert(frames.map(_.ts_ms).toSeq == Seq(0L, 40L, 80L),
      "timestamps from the container's us/frame, not the fps default")
    assert(javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(
      frames(1).frame_payload)).getWidth == 48)
  }

  test("law: the RIFF walk is total — arbitrary bytes, every truncation " +
       "prefix, and adversarial sizes never throw; non-AVI keeps the stub") {
    import org.scalacheck.{Gen, rng}
    val genBytes = Gen.choose(0, 4096).flatMap(n =>
      Gen.listOfN(n, Gen.choose(Byte.MinValue, Byte.MaxValue)))
    (1 to 32).foreach { seed =>
      val bytes = genBytes(Gen.Parameters.default, rng.Seed(seed.toLong))
        .get.toArray
      Multimodal.AviMjpegCodec.parse(bytes) // must not throw
    }
    val good = mjpegAvi(33333, Seq(jpegBytes(8, 8)), 8, 8)
    (0 until good.length).foreach { n =>
      Multimodal.AviMjpegCodec.parse(good.take(n)) // every prefix is safe
    }
    // adversarial chunk sizes: overflow, high bit, zero; deep LIST nesting
    Seq(leInt(Int.MaxValue), leInt(0x80000001.toInt), leInt(0)).foreach { sz =>
      val b = "RIFF".getBytes("ISO-8859-1") ++ leInt(100) ++
        "AVI ".getBytes("ISO-8859-1") ++ "00dc".getBytes("ISO-8859-1") ++
        sz ++ Array.fill[Byte](64)(7)
      Multimodal.AviMjpegCodec.parse(b) // must not throw
    }
    val deep = (1 to 64).foldLeft(riffChunk("avih", Array.fill[Byte](56)(1))) {
      (inner, _) => riffList("hdrl", inner) }
    Multimodal.AviMjpegCodec.parse(
      riffChunk("RIFF", "AVI ".getBytes("ISO-8859-1") ++ deep)) // depth-capped
    // a non-AVI video payload must keep the byte-exact stub windows
    val stub = Multimodal.sampleFrames(spark,
      Multimodal.asMedia(Seq((9L, Array.tabulate[Byte](600)(_.toByte)))
        .toDF("media_id", "payload"), "media_id", "payload", "video/mp4"),
      stride = 1, maxFrames = 8).collect().sortBy(_.frame_no)
    assert(stub.length == 3 && stub(0).frame_payload.length == 256)
    assert(stub.map(_.ts_ms).toSeq == Seq(0L, 33L, 67L),
      "stub arm keeps the round(i*1000/fps) timestamps the oracle replays")
  }

  // ---- image perceptual hashing (dHash) ----

  test("gray PNG raster round-trips byte-exact through the real codec") {
    val px = Array.tabulate(18 * 16)(i => (i * 37 + 11) % 256)
    val png = Multimodal.GrayPng.encode(px, 18, 16)
    val Some((back, w, h)) = Multimodal.GrayPng.decode(png)
    assert(w == 18 && h == 16 && back.toSeq == px.toSeq,
      "lossless gray PNG is the determinism foundation of the phash pipeline")
  }

  test("dhash is exactly invariant under integer nearest-neighbour upscale " +
      "through the real codec") {
    val words = Array("spark", "stream", "batch", "window", "value")
    val png = Multimodal.renderTextImage(words, 18, 16)
    val up = Multimodal.upscaleNearest(png, 2).get
    val Some((p0, w0, h0)) = Multimodal.GrayPng.decode(png)
    val Some((p2, w2, h2)) = Multimodal.GrayPng.decode(up)
    assert((w2, h2) == (36, 32))
    assert(Multimodal.dhash64(p0, w0, h0) == Multimodal.dhash64(p2, w2, h2),
      "integer box-avg over duplicated pixels equals the original average")
  }

  test("planted transformed duplicates pair up; distinct images do not") {
    import graft.operators.Dedup
    val docs = Seq(
      (0L, "spark table stream batch window column value filter"),   // %7==0 -> upscale twin
      (1L, "the customer data join key row order group sort line"),  // %7==1 -> brighten twin
      (2L, "hash scan query agg merge small big fast slow vector"),
      (3L, "spark table stream batch window column value filter")    // exact content dup of 0
    ).toDF("doc_id", "text")
    val media = Multimodal.textImageCorpus(spark, docs, "doc_id", "text").toDF()
    val fps = Multimodal.imagePhash(spark, media).toDF()
    val pairs = Dedup.fingerprintPairs(fps, "media_id", "phash", maxDist = 6)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    val got = pairs.map { case (a, b, _) => (a, b) }
    assert(got.contains((0L, 100000L)), "2x-upscaled twin must pair at 0")
    assert(got.contains((1L, 200001L)), "brightness twin must pair (clamp-only drift)")
    assert(pairs.filter { case (a, b, _) => Set(a, b) == Set(0L, 3L) }
      .forall(_._3 == 0) && got.contains((0L, 3L)),
      "identical content renders identical images")
    assert(!got.exists { case (a, b) => Set(a, b) == Set(0L, 2L) } &&
      !got.exists { case (a, b) => Set(a, b) == Set(1L, 2L) },
      "distinct images stay far apart")
  }

  // ---- audio perceptual fingerprinting ----

  test("16-bit PCM WAV round-trips sample-exact through the real codec") {
    val ss = Array.tabulate(4160)(i => ((i * 2731 + 17) % 65536) - 32768)
    val wav = Multimodal.WavPcm.encode(ss)
    val Some(back) = Multimodal.WavPcm.decode(wav)
    assert(back.toSeq == ss.toSeq,
      "lossless PCM is the determinism foundation of the audio fingerprint")
  }

  test("audio fingerprint is invariant under decode->re-encode and stable " +
      "under half volume; corrupt payloads are dropped") {
    import graft.operators.Dedup
    val docs = Seq(
      (2L, "spark table stream batch window column value filter data row"),
      (3L, "the customer data join key row order group sort line merge"),
      (4L, "hash scan query agg merge small big fast slow vector part")
    ).toDF("doc_id", "text")
    val media = Multimodal.textAudioCorpus(spark, docs, "doc_id", "text").toDF()
    val fps = Multimodal.audioFp(spark, media).toDF()
    val pairs = Dedup.fingerprintPairs(fps, "media_id", "phash", maxDist = 6)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    val got = pairs.map { case (a, b, _) => (a, b) }
    assert(pairs.contains((2L, 300002L, 0)),
      "re-encoded copy must hash identically (codec losslessness)")
    assert(got.contains((3L, 400003L)),
      "half-volume copy must pair (floor-rounding drift only)")
    assert(!got.exists { case (a, b) =>
      Set(a, b).subsetOf(Set(2L, 3L, 4L)) && a != b },
      "distinct audio stays far apart")
    // corrupt payload: dropped, not failed
    import spark.implicits._
    val corrupt = Seq(Multimodal.MediaRow(9L, "audio/wav",
      Array.fill[Byte](64)(3))).toDF()
    assert(Multimodal.audioFp(spark, corrupt).count() == 0L)
  }

  test("real-world bilinear resize (ImageIoCodec) stays NEAR in hash space " +
      "(tolerant law -- interpolation is not bit-contracted)") {
    val words = Array("stream", "spark", "data", "key", "row", "table")
    val png = Multimodal.renderTextImage(words, 18, 16)
    val resized = Multimodal.ImageIoCodec.resize(png, 36, 32).get
    val Some((p0, w0, h0)) = Multimodal.GrayPng.decode(png)
    val Some((p2, w2, h2)) = Multimodal.GrayPng.decode(resized)
    val d = java.lang.Long.bitCount(
      Multimodal.dhash64(p0, w0, h0) ^ Multimodal.dhash64(p2, w2, h2))
    assert(d <= 12, s"bilinear 2x resize drifted $d bits -- dHash should " +
      "keep a rescaled copy near its original")
  }
}
