package graft.multimodal

/** Dependency-free WAV (RIFF/WAVE) codec — 16-bit PCM. Public layout:
  * a 12-byte RIFF header, then tagged chunks (`fmt `, optional metadata
  * chunks like `LIST`, `data`), each `[4-byte id][4-byte LE size][size
  * bytes][pad to even]`.
  *
  * The decoder is a real chunk walker: it does NOT assume `data` sits at
  * byte 44 — it skips unknown chunks (honouring the RIFF even-byte
  * padding rule) until it has seen both `fmt ` and `data`, then decodes
  * every little-endian int16 sample to find the peak amplitude. The
  * encoder deliberately writes a junk `LIST` chunk between `fmt ` and
  * `data` so any "fixed offset 44" shortcut fails the oracle check
  * immediately.
  */
object Wav {

  /** Decoded facts about one WAV payload. `peak` is max(|sample|) over
    * the decoded int16 stream (32768 possible for -32768).
    */
  final case class Info(sampleRate: Int, channels: Int, bitsPerSample: Int,
                        nSamples: Long, peak: Int)

  private def le32(b: Array[Byte], off: Int): Int =
    (b(off) & 0xff) | ((b(off + 1) & 0xff) << 8) |
      ((b(off + 2) & 0xff) << 16) | ((b(off + 3) & 0xff) << 24)

  private def le16(b: Array[Byte], off: Int): Int =
    (b(off) & 0xff) | ((b(off + 1) & 0xff) << 8)

  private def tag(b: Array[Byte], off: Int): String =
    new String(b, off, 4, java.nio.charset.StandardCharsets.US_ASCII)

  /** Encode mono 16-bit PCM, with a junk `LIST/INFO` chunk ahead of
    * `data` (see object doc).
    */
  def encode(sampleRate: Int, samples: Array[Short]): Array[Byte] = {
    require(sampleRate > 0, s"bad sample rate $sampleRate")
    val listBody = 12 // "INFO" + 8 zero bytes of padding-to-walk-over
    val dataLen = samples.length * 2
    val riffLen = 4 + (8 + 16) + (8 + listBody) + (8 + dataLen)
    val out = java.nio.ByteBuffer.allocate(8 + riffLen)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    out.put("RIFF".getBytes("US-ASCII")).putInt(riffLen)
      .put("WAVE".getBytes("US-ASCII"))
    out.put("fmt ".getBytes("US-ASCII")).putInt(16)
      .putShort(1)                    // PCM
      .putShort(1)                    // mono
      .putInt(sampleRate)
      .putInt(sampleRate * 2)         // byte rate
      .putShort(2)                    // block align
      .putShort(16)                   // bits per sample
    out.put("LIST".getBytes("US-ASCII")).putInt(listBody)
      .put("INFO".getBytes("US-ASCII")).put(new Array[Byte](8))
    out.put("data".getBytes("US-ASCII")).putInt(dataLen)
    samples.foreach(out.putShort)
    out.array()
  }

  /** Parse + full sample walk. Rejects anything that is not PCM 16-bit
    * with a complete `fmt ` + `data` pair.
    */
  /** Validated chunk geometry — shared by every sample walk ([[decode]],
    * [[frameAbsSums]]) so they cannot diverge on header semantics. */
  private final case class Parsed(rate: Int, channels: Int, bits: Int,
                                  dataOff: Int, dataLen: Int)

  private def parse(bytes: Array[Byte]): Parsed = {
    def fail(msg: String) = throw new IllegalArgumentException(s"WAV: $msg")
    if (bytes.length < 12) fail("truncated RIFF header")
    if (tag(bytes, 0) != "RIFF" || tag(bytes, 8) != "WAVE") fail("bad magic")
    var off = 12
    var rate = -1; var channels = -1; var bits = -1; var blockAlign = -1
    var dataOff = -1; var dataLen = -1
    while (off + 8 <= bytes.length) {
      val id = tag(bytes, off)
      val size = le32(bytes, off + 4)
      if (size < 0 || off + 8 + size.toLong > bytes.length) fail(s"chunk '$id' overruns payload")
      val body = off + 8
      id match {
        case "fmt " =>
          // a second fmt/data chunk would silently overwrite or blend
          // state — reject loudly, matching the other validations
          if (rate >= 0) fail("duplicate fmt chunk")
          if (size < 16) fail("fmt chunk too short")
          if (le16(bytes, body) != 1) fail("non-PCM format unsupported")
          channels = le16(bytes, body + 2)
          rate = le32(bytes, body + 4)
          blockAlign = le16(bytes, body + 12)
          bits = le16(bytes, body + 14)
          if (bits != 16) fail(s"unsupported bit depth $bits")
          if (channels <= 0 || rate <= 0 || blockAlign != channels * 2)
            fail(s"inconsistent fmt: ch=$channels rate=$rate align=$blockAlign")
        case "data" =>
          if (rate < 0) fail("data chunk before fmt")
          if (dataOff >= 0) fail("duplicate data chunk")
          if (size % blockAlign != 0) fail("data length not frame-aligned")
          dataOff = body; dataLen = size
        case _ => () // unknown chunk (LIST, fact, ...) — skip
      }
      off = body + size + (size & 1) // RIFF pads odd chunks to even
    }
    if (rate < 0) fail("missing fmt chunk")
    if (dataOff < 0) fail("missing data chunk")
    Parsed(rate, channels, bits, dataOff, dataLen)
  }

  def decode(bytes: Array[Byte]): Info = {
    val h = parse(bytes)
    var peak = 0
    var p = h.dataOff
    val end = h.dataOff + h.dataLen
    while (p < end) {
      val v = le16(bytes, p).toShort.toInt
      val a = math.abs(v)
      if (a > peak) peak = a
      p += 2
    }
    Info(h.rate, h.channels, h.bits, h.dataLen.toLong / 2 / h.channels, peak)
  }

  /** Per-frame Σ|sample| over consecutive `frameSamples`-sample frames
    * (channels interleaved; the tail partial frame is dropped) — the
    * exact-integer energy envelope an audio fingerprint reads. A real
    * decode pass through the validated chunk walk, not a header trick.
    */
  def frameAbsSums(bytes: Array[Byte], frameSamples: Int): Array[Long] = {
    require(frameSamples > 0, s"frameSamples=$frameSamples must be positive")
    val h = parse(bytes)
    val total = h.dataLen / 2
    val nFrames = total / frameSamples
    val out = new Array[Long](nFrames)
    var f = 0
    while (f < nFrames) {
      var acc = 0L
      var i = 0
      var p = h.dataOff + f * frameSamples * 2
      while (i < frameSamples) {
        acc += math.abs(le16(bytes, p).toShort.toInt)
        i += 1
        p += 2
      }
      out(f) = acc
      f += 1
    }
    out
  }
}
