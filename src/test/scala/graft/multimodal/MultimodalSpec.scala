package graft.multimodal

import graft.SparkSpec

class MultimodalSpec extends SparkSpec {

  // ---- BMP codec -----------------------------------------------------

  test("Bmp round-trip incl. stride padding widths") {
    // w=2 → row 6 bytes + 2 pad; w=4 → 12, no pad; w=5 → 15 + 1 pad
    for ((w, h) <- Seq((2, 3), (4, 2), (5, 7), (32, 18), (1, 1))) {
      val bytes = Bmp.encode(w, h, (x, y) => x + y)
      assert(bytes.length === 54 + Bmp.stride(w) * h)
      val info = Bmp.decode(bytes)
      assert(info.width === w && info.height === h && info.bpp === 24)
      // gradient mean closed form: (w-1)/2 + (h-1)/2
      assert(info.meanGray === (w + h - 2) / 2.0, s"mean for ${w}x$h")
    }
  }

  test("Bmp decode honours non-54 pixel offset and top-down rows") {
    val base = Bmp.encode(3, 2, (x, _) => x * 10)
    // move the pixel array 8 bytes out (as a palette/extension would) —
    // a decoder hard-coding offset 54 reads garbage
    val shifted = new Array[Byte](base.length + 8)
    System.arraycopy(base, 0, shifted, 0, 54)
    System.arraycopy(base, 54, shifted, 62, base.length - 54)
    shifted(10) = 62 // patch pixel-array offset (fits one byte)
    assert(Bmp.decode(shifted).meanGray === Bmp.decode(base).meanGray)
    // negative height = top-down storage; mean is row-order independent
    // only if the walker still reads whole rows correctly
    val topDown = base.clone()
    topDown(22) = (-2 & 0xff).toByte; topDown(23) = 0xff.toByte
    topDown(24) = 0xff.toByte; topDown(25) = 0xff.toByte
    val td = Bmp.decode(topDown)
    assert(td.height === 2 && td.meanGray === Bmp.decode(base).meanGray)
  }

  test("Bmp rejects bad magic / truncation / compression / bpp") {
    val good = Bmp.encode(4, 4, (_, _) => 7)
    def mutated(f: Array[Byte] => Unit): Array[Byte] = { val b = good.clone(); f(b); b }
    assertThrows[IllegalArgumentException](Bmp.decode(mutated(b => b(0) = 'X')))
    assertThrows[IllegalArgumentException](Bmp.decode(good.take(53)))
    assertThrows[IllegalArgumentException](Bmp.decode(good.take(60))) // pixels cut
    assertThrows[IllegalArgumentException](Bmp.decode(mutated(b => b(30) = 1))) // RLE
    assertThrows[IllegalArgumentException](Bmp.decode(mutated(b => b(28) = 8))) // 8bpp
  }

  test("Bmp rejects adversarial headers cleanly (no out-of-bounds walk)") {
    val good = Bmp.encode(4, 4, (_, _) => 7)
    def mutated(f: Array[Byte] => Unit): Array[Byte] = { val b = good.clone(); f(b); b }
    def putLe32(b: Array[Byte], off: Int, v: Int): Unit = {
      b(off) = v.toByte; b(off + 1) = (v >>> 8).toByte
      b(off + 2) = (v >>> 16).toByte; b(off + 3) = (v >>> 24).toByte
    }
    // width 0x40000000: 3*width overflows Int — the truncated-pixel-array
    // guard must still reject via Long arithmetic, not walk and crash
    assertThrows[IllegalArgumentException](
      Bmp.decode(mutated(b => putLe32(b, 18, 0x40000000))))
    // width 0x55555556: 3*width wraps to a small positive Int
    assertThrows[IllegalArgumentException](
      Bmp.decode(mutated(b => putLe32(b, 18, 0x55555556))))
    // unsigned pixel offset / header size near 2^32 must not wrap negative
    assertThrows[IllegalArgumentException](
      Bmp.decode(mutated(b => putLe32(b, 10, 0xfffffff0))))
    assertThrows[IllegalArgumentException](
      Bmp.decode(mutated(b => putLe32(b, 14, 0xfffffff0))))
    // height Int.MinValue: math.abs is a no-op there
    assertThrows[IllegalArgumentException](
      Bmp.decode(mutated(b => putLe32(b, 22, Int.MinValue))))
  }

  // ---- WAV codec -----------------------------------------------------

  test("Wav round-trip: chunk walk skips junk LIST, LE samples, peak") {
    val samples = Array[Short](0, -5, 300, -32768, 12, 32767)
    val bytes = Wav.encode(11025, samples)
    val info = Wav.decode(bytes)
    assert(info === Wav.Info(11025, 1, 16, samples.length, 32768))
    // empty stream decodes with peak 0
    assert(Wav.decode(Wav.encode(8000, Array.empty[Short])) ===
      Wav.Info(8000, 1, 16, 0L, 0))
  }

  test("Wav walker honours the odd-size chunk padding rule") {
    // hand-build: RIFF [ junk chunk size 3 (padded to 4) ] fmt data
    val inner = Wav.encode(8000, Array[Short](100, -200))
    val fmtAndData = inner.drop(12) // chunks only
    val junk = Array[Byte]('j', 'u', 'n', 'k', 3, 0, 0, 0, 1, 2, 3, 0) // 3+1 pad
    val riffLen = 4 + junk.length + fmtAndData.length
    val out = java.nio.ByteBuffer.allocate(8 + riffLen)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    out.put("RIFF".getBytes("US-ASCII")).putInt(riffLen)
      .put("WAVE".getBytes("US-ASCII")).put(junk).put(fmtAndData)
    assert(Wav.decode(out.array()) === Wav.Info(8000, 1, 16, 2L, 200))
  }

  test("Wav rejects bad magic / missing chunks / overrun / non-PCM") {
    val good = Wav.encode(8000, Array[Short](1, 2))
    def mutated(f: Array[Byte] => Unit): Array[Byte] = { val b = good.clone(); f(b); b }
    assertThrows[IllegalArgumentException](Wav.decode(mutated(b => b(0) = 'X')))
    assertThrows[IllegalArgumentException](Wav.decode(good.take(30))) // fmt cut
    assertThrows[IllegalArgumentException](Wav.decode(good.dropRight(1))) // data overrun
    assertThrows[IllegalArgumentException](Wav.decode(mutated(b => b(20) = 3))) // float fmt
  }

  test("Wav rejects duplicate fmt/data chunks instead of blending state") {
    val good = Wav.encode(8000, Array[Short](1, 2))
    val chunksOnly = good.drop(12)
    def withExtra(extra: Array[Byte]): Array[Byte] = {
      val riffLen = 4 + chunksOnly.length + extra.length
      val out = java.nio.ByteBuffer.allocate(8 + riffLen)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      out.put("RIFF".getBytes("US-ASCII")).putInt(riffLen)
        .put("WAVE".getBytes("US-ASCII")).put(chunksOnly).put(extra)
      out.array()
    }
    // a second data chunk would overwrite nSamples while peak kept
    // accumulating across both — an inconsistent Info, so fail loudly
    val data2 = Array[Byte]('d', 'a', 't', 'a', 2, 0, 0, 0, 9, 0)
    assertThrows[IllegalArgumentException](Wav.decode(withExtra(data2)))
    val fmt2 = good.slice(12, 12 + 8 + 16) // the original fmt chunk again
    assertThrows[IllegalArgumentException](Wav.decode(withExtra(fmt2)))
  }

  test("Y4m round-trip: header parse, per-frame marker scan, luma means") {
    // 3 frames, 6x4 C420, gradient base 10*f: mean = 10f + (6+4-2)/2 = 10f+4
    val b = Y4m.encode(6, 4, 30, 1, 3, (f, x, y) => 10 * f + x + y)
    val v = Y4m.decode(b)
    assert(v.width === 6 && v.height === 4 && v.fpsNum === 30 && v.fpsDen === 1)
    assert(v.nFrames === 3)
    assert(v.frameMeanY.toSeq === Seq(4.0, 14.0, 24.0))
    // zero frames is a legal stream
    assert(Y4m.decode(Y4m.encode(4, 4, 24, 1, 0, (_, _, _) => 0)).nFrames === 0)
  }

  test("Y4m decode survives variable-length FRAME params (no fixed offsets)") {
    // splice extra X params into the STREAM header and widen one FRAME
    // marker — a decoder assuming fixed marker widths misreads the planes
    val b = Y4m.encode(4, 4, 24, 1, 2, (f, _, _) => 100 + f)
    val s = new String(b.map(_.toChar))
    val hEnd = s.indexOf('\n')
    val widened = (s.substring(0, hEnd) + " Xconverter=graft Ip" +
      s.substring(hEnd)).replaceFirst("FRAME Xseq=0", "FRAME Xseq=0 Xtag=zz")
    val v = Y4m.decode(widened.toCharArray.map(_.toByte))
    assert(v.nFrames === 2 && v.frameMeanY.toSeq === Seq(100.0, 101.0))
  }

  test("Y4m rejects malformed streams instead of guessing") {
    val good = Y4m.encode(4, 4, 24, 1, 2, (_, _, _) => 7)
    def str(b: Array[Byte]) = new String(b.map(_.toChar))
    def bytes(s: String) = s.toCharArray.map(_.toByte)
    assertThrows[IllegalArgumentException](Y4m.decode(bytes(
      str(good).replace("YUV4MPEG2", "YUV4MPEG3")))) // bad magic
    assertThrows[IllegalArgumentException](Y4m.decode(bytes(
      str(good).replace("C420", "C444")))) // foreign plane geometry
    assertThrows[IllegalArgumentException](Y4m.decode(bytes(
      str(good).replace("W4", "W5")))) // odd width for 4:2:0
    assertThrows[IllegalArgumentException](Y4m.decode(good.dropRight(1))) // short frame
    assertThrows[IllegalArgumentException](Y4m.decode(good ++ Array[Byte](0))) // trailing
    assertThrows[IllegalArgumentException](Y4m.decode(bytes(
      str(good).replace("F24:1", "F24")))) // malformed rate
    assertThrows[IllegalArgumentException](Y4m.decode(good.take(3))) // no newline
    // frame marker corrupted mid-stream
    val s2 = str(good).replaceFirst("FRAME Xseq=1", "FRAMX Xseq=1")
    assertThrows[IllegalArgumentException](Y4m.decode(bytes(s2)))
  }

  test("Y4m fuzz: 40 random streams round-trip exactly") {
    val rnd = new scala.util.Random(20260812L)
    (1 to 40).foreach { trial =>
      val w = (1 + rnd.nextInt(16)) * 2        // 2..32, even
      val h = (1 + rnd.nextInt(12)) * 2        // 2..24, even
      val (fn, fd) = (1 + rnd.nextInt(60), 1 + rnd.nextInt(2))
      val nF = rnd.nextInt(6)                  // 0..5 frames
      // random-but-reproducible luma per (f,x,y) — exercises every pixel
      val seed = rnd.nextInt(1000)
      def lum(f: Int, x: Int, y: Int): Int = ((f * 131 + x * 31 + y * 17 + seed) % 256)
      val v = Y4m.decode(Y4m.encode(w, h, fn, fd, nF, lum))
      assert(v.width === w && v.height === h, s"trial $trial geometry")
      assert(v.fpsNum === fn && v.fpsDen === fd, s"trial $trial rate")
      assert(v.nFrames === nF, s"trial $trial frame count")
      (0 until nF).foreach { f =>
        val exp = (for { y <- 0 until h; x <- 0 until w } yield lum(f, x, y).toLong)
          .sum.toDouble / (w * h)
        assert(v.frameMeanY(f) === exp, s"trial $trial frame $f mean")
      }
    }
  }

  test("videoFrameStats emits one decoded row per frame") {
    import spark.implicits._
    val docs = Seq((2L, "abcde"), (3L, "ab")).toDF("doc_id", "text")
    val out = Multimodal.videoFrameStats(spark,
      Multimodal.videoFixtures(spark, docs).toDF())
      .collect().sortBy(r => (r.doc_id, r.frame_idx))
    // id=2: L=5 → w=(5%8+2)*2=14, h=(5%5+2)*2=4; frames=2%4+2=4; fps=24
    val d2 = out.filter(_.doc_id == 2L)
    assert(d2.length === 4 && d2.head.width === 14 && d2.head.height === 4)
    assert(d2.head.fps_num === 24 && d2.forall(_.n_frames === 4L))
    // mean = (2*31 + 7f) % 200 + (14+4-2)/2 = (62+7f)%200 + 8
    assert(d2.map(_.mean_y).toSeq === Seq(70.0, 77.0, 84.0, 91.0))
    // id=3: L=2 → w=8, h=8; frames=3%4+2=5; fps=25; mean=(93+7f)%200+7
    val d3 = out.filter(_.doc_id == 3L)
    assert(d3.length === 5 && d3.head.width === 8 && d3.head.fps_num === 25)
    assert(d3.map(_.mean_y).toSeq === Seq(100.0, 107.0, 114.0, 121.0, 128.0))
  }

  // ---- Spark operator ------------------------------------------------

  test("extractFeatures dispatches per media_type over real payloads") {
    import spark.implicits._
    val media = Seq(
      Multimodal.MediaRow(0L, "image", Multimodal.bmpFixture("hello world")),
      Multimodal.MediaRow(1L, "audio", Multimodal.wavFixture("hello world")))
      .toDS()
    val out = Multimodal.extractFeatures(spark, media.toDF())
      .collect().sortBy(_.doc_id)
    val img = out(0)
    // L=11 → w=13, h=13; mean = (13+13-2)/2 = 12.0
    assert(img.width === 13 && img.height === 13 && img.bpp === 24)
    assert(img.mean_gray === 12.0 && img.n_frames === 1L)
    assert(img.n_bytes === 54L + Bmp.stride(13) * 13)
    val aud = out(1)
    // L=11 → rate 8000+3*500; ns = 27; frames = ceil(27/256) = 1
    assert(aud.sample_rate === 9500 && aud.n_samples === 27L && aud.n_frames === 1L)
    assert(aud.peak >= 15000) // ramp guarantees the floor
    val frames = Multimodal.sampleFrames(
      Multimodal.extractFeatures(spark, media.toDF()).toDF(), stride = 4,
      carry = Seq("sample_rate")).collect()
    assert(frames.length === 2 && frames.forall(_.getLong(3) === 0L))
  }

  test("sampleFrames strides through multi-frame payloads") {
    import spark.implicits._
    // 2000 text bytes → ns = 2016 → 8 frames of 256 → stride 4 → idx 0, 4
    val media = Seq(
      Multimodal.MediaRow(0L, "audio", Multimodal.wavFixture("x" * 2000)))
      .toDS()
    val idx = Multimodal.sampleFrames(
        Multimodal.extractFeatures(spark, media.toDF()).toDF(), stride = 4)
      .select("frame_idx").as[Long].collect().sorted
    assert(idx.toSeq === Seq(0L, 4L))
  }

  test("extractFeatures dispatches video rows too (mixed corpus must not crash)") {
    import spark.implicits._
    val media = Seq(
      Multimodal.MediaRow(2L, "video", Multimodal.y4mFixture(2L, "abcde")),
      Multimodal.MediaRow(3L, "image", Multimodal.bmpFixture("abcde")))
      .toDS()
    val out = Multimodal.extractFeatures(spark, media.toDF())
      .collect().sortBy(_.doc_id)
    val vid = out(0)
    // id=2, L=5 → 14x4, 4 frames; frame-0 mean = (2*31)%200 + (14+4-2)/2 = 70
    assert(vid.width === 14 && vid.height === 4 && vid.bpp === 12)
    assert(vid.n_frames === 4L && vid.mean_gray === 70.0)
    assert(out(1).media_type === "image" && out(1).bpp === 24)
  }

  test("extractFeatures fails loudly on unknown media_type") {
    import spark.implicits._
    val bad = Seq(Multimodal.MediaRow(9L, "hologram", Array[Byte](1))).toDS()
    val e = intercept[org.apache.spark.SparkException] {
      Multimodal.extractFeatures(spark, bad.toDF()).collect()
    }
    assert(e.getMessage.contains("unknown media_type") ||
      Option(e.getCause).exists(_.getMessage.contains("unknown media_type")))
  }

  test("Y4m rejects dimension-overflow headers instead of NaN features") {
    // W*H would wrap Int multiplication to 0 — the truncation guard
    // passes, the plane walk is skipped, and means become 0/0 = NaN
    val good = Y4m.encode(4, 4, 24, 1, 1, (_, _, _) => 7)
    val s = new String(good.map(_.toChar))
    assertThrows[IllegalArgumentException](Y4m.decode(
      s.replace("W4 H4", "W262144 H65536").toCharArray.map(_.toByte)))
  }

  test("Bmp resizeNearest picks (x*f, y*f) and re-encodes canonically") {
    // 5x4, gray(x,y) = 10x + y: factor 2 keeps (0,0)=0 (2,0)=20 (4,0)=40
    // is out of range of the 2x2... wo = 2, ho = 2: picks
    // (0,0)=0 (2,0)=20 (0,2)=2 (2,2)=22 -> mean 11.0. Width 5 has a
    // padded stride (15 -> 16), so a resampler that forgets padding
    // reads shifted pixels.
    val src = Bmp.encode(5, 4, (x, y) => 10 * x + y)
    val half = Bmp.resizeNearest(src, 2)
    val info = Bmp.decode(half)
    assert(info.width === 2 && info.height === 2)
    assert(info.meanGray === 11.0)
    // factor 1 is an exact content round-trip (fresh canonical buffer)
    assert(Bmp.decode(Bmp.resizeNearest(src, 1)) === Bmp.decode(src))
  }

  test("Bmp resizeNearest honours top-down sources and emits bottom-up") {
    val base = Bmp.encode(4, 4, (x, y) => x + 4 * y)
    val topDown = base.clone()
    topDown(22) = (-4 & 0xff).toByte; topDown(23) = 0xff.toByte
    topDown(24) = 0xff.toByte; topDown(25) = 0xff.toByte
    // same IMAGE pixels, opposite storage order: resample must agree.
    // (the top-down clone's rows are physically reversed, so its image
    // is vertically flipped; flip the expectation accordingly)
    val down = Bmp.decode(Bmp.resizeNearest(base, 2))
    val downTd = Bmp.decode(Bmp.resizeNearest(topDown, 2))
    // base picks y in {0, 2} of g = x + 4y; the flipped image's rows are
    // y' = 3 - y so it picks {3, 1}: means differ by exactly 4*((3+1)-(0+2))/2
    assert(down.meanGray === (0.0 + 2.0) / 2 * 4 + (0 + 2) / 2.0)
    assert(downTd.meanGray === (3.0 + 1.0) / 2 * 4 + (0 + 2) / 2.0)
    // output is canonical bottom-up regardless of source order
    assert(Bmp.resizeNearest(topDown, 2)(22) === Bmp.resizeNearest(base, 2)(22))
  }

  test("Bmp resizeNearest preserves independent channels (non-gray source)") {
    val src = Bmp.encodeRgb(2, 2, (x, y) => (x * 100) | ((y * 50) << 8) | (200 << 16))
    val out = Bmp.resizeNearest(src, 2) // 1x1: picks (0,0) = B=0,G=0,R=200
    assert(Bmp.decode(out).meanGray === 200.0 / 3.0)
  }

  test("Bmp resizeNearest rejects factor > dims and factor < 1") {
    val src = Bmp.encode(3, 2, (_, _) => 1)
    assertThrows[IllegalArgumentException](Bmp.resizeNearest(src, 0))
    assertThrows[IllegalArgumentException](Bmp.resizeNearest(src, 3)) // h=2 < 3
  }

  test("resizeImages: distributed round trip matches closed form") {
    import spark.implicits._
    val docs = Seq((0L, "abcdefgh"), (2L, "xy")).toDF("doc_id", "text")
    val out = Multimodal.resizeImages(spark,
      Multimodal.mediaFixtures(spark, docs).toDF(), factor = 2)
      .collect().map(r => r.doc_id -> r).toMap
    // L=8: w=10,h=10 -> 5x5, mean=(5-1)+(5-1)=8; L=2: w=4,h=4 -> 2x2, mean 2
    assert(out(0L).width === 5 && out(0L).height === 5 && out(0L).mean_gray === 8.0)
    assert(out(2L).width === 2 && out(2L).height === 2 && out(2L).mean_gray === 2.0)
  }

  test("fused textured hashes equal the composed fixture->codec paths (r20)") {
    // texturedDHash / texturedAudioHash compute only the windows the
    // hash reads; the composed path (render fixture, decode, hash) is
    // THE definition. Pin equality over texts exercising: ASCII,
    // non-ASCII (byte/char offsets diverge), lengths below/at/above the
    // 16-char window, and md5-avalanche variety.
    val rnd = new scala.util.Random(200820L)
    val texts = Seq("a", "ab", "abcdefghijklmnop", "abcdefghijklmnopq",
      "\u00e9l\u00e8ve caf\u00e9 \u4e16\u754c",
      "the quick brown fox jumps over the lazy dog") ++
      (1 to 40).map(_ => (1 to (1 + rnd.nextInt(300)))
        .map(_ => ('a' + rnd.nextInt(26)).toChar).mkString) ++
      (1 to 10).map(_ => (1 to (1 + rnd.nextInt(60)))
        .map(_ => "ab\u00e9\u4e16 "(rnd.nextInt(5))).mkString.trim + "x")
    texts.foreach { t =>
      assert(Multimodal.texturedDHash(t) ===
        Bmp.dHash(Multimodal.texturedBmpFixture(t)), s"dhash for '$t'")
      val e = Wav.frameAbsSums(Multimodal.texturedWavFixture(t), 64)
      var ref = 0L
      (0 until math.min(64, e.length - 1)).foreach { f =>
        if (e(f + 1) > e(f)) ref |= 1L << f
      }
      assert(Multimodal.texturedAudioHash(t) === ref, s"ahash for '$t'")
    }
    // and the distributed frames agree with the composed operators
    import spark.implicits._
    val docs = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("doc_id", "text")
    val dFused = Multimodal.texturedImageDHashes(spark, docs)
      .as[(Long, Long)].collect().toMap
    val dComposed = Multimodal.imageDHashes(spark,
      Multimodal.texturedImageFixtures(spark, docs).toDF())
      .as[(Long, Long)].collect().toMap
    assert(dFused === dComposed)
    val aFused = Multimodal.texturedAudioHashes(spark, docs)
      .as[(Long, Long)].collect().toMap
    val aComposed = Multimodal.audioEnergyHashes(spark,
      Multimodal.texturedAudioFixtures(spark, docs).toDF())
      .as[(Long, Long)].collect().toMap
    assert(aFused === aComposed)
  }
}
