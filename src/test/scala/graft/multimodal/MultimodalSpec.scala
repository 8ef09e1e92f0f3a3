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

  test("extractFeatures fails loudly on unknown media_type") {
    import spark.implicits._
    val bad = Seq(Multimodal.MediaRow(9L, "video", Array[Byte](1))).toDS()
    val e = intercept[org.apache.spark.SparkException] {
      Multimodal.extractFeatures(spark, bad.toDF()).collect()
    }
    assert(e.getMessage.contains("unknown media_type") ||
      Option(e.getCause).exists(_.getMessage.contains("unknown media_type")))
  }
}
