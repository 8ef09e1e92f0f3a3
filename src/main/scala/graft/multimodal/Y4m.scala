package graft.multimodal

/** Dependency-free Y4M (YUV4MPEG2) codec — the public raw-video container
  * the mjpegtools/ffmpeg ecosystems document: an ASCII stream header
  * `YUV4MPEG2 W<w> H<h> F<num>:<den> [I..] [A..] [C..] [X..]\n`, then per
  * frame an ASCII `FRAME[ <params>]\n` marker followed by the raw planar
  * pixels — for 4:2:0 chroma (the C420 default) a `w*h` luma (Y) plane
  * and two `(w/2)*(h/2)` chroma (Cb, Cr) planes.
  *
  * The decoder is a real stream walker: headers and FRAME markers are
  * scanned to their terminating newline (params legally vary per frame,
  * so "FRAME\n is 6 bytes" is NOT a valid shortcut — the encoder writes a
  * per-frame `Xseq` param precisely so any fixed-offset shortcut fails
  * the oracle check), every luma byte of every frame is visited for the
  * per-frame mean, and structural damage (odd dimensions for 4:2:0, a
  * truncated plane, trailing bytes, an unsupported chroma mode) fails
  * loudly rather than yielding plausible features. Same discipline as the
  * sibling [[Bmp]]/[[Wav]] codecs — third modality, video.
  */
object Y4m {

  /** Decoded facts about one Y4M payload: geometry, frame rate, and the
    * mean luma of EVERY frame (the per-frame walk is the point — a frame
    * sampler reads `frameMeanY(idx)`).
    */
  final case class Info(width: Int, height: Int, fpsNum: Int, fpsDen: Int,
                        frameMeanY: Array[Double]) {
    def nFrames: Int = frameMeanY.length
  }

  private val Magic = "YUV4MPEG2"

  /** Encode a C420 stream; `luma(frame, x, y)` supplies Y in 0..255,
    * chroma planes are neutral (128). A per-frame `Xseq=<n>` param makes
    * every FRAME marker a different length (see object doc).
    */
  def encode(width: Int, height: Int, fpsNum: Int, fpsDen: Int,
             nFrames: Int, luma: (Int, Int, Int) => Int): Array[Byte] = {
    require(width > 0 && height > 0 && width % 2 == 0 && height % 2 == 0,
      s"C420 needs positive even dims, got ${width}x$height")
    require(fpsNum > 0 && fpsDen > 0, s"bad frame rate $fpsNum:$fpsDen")
    require(nFrames >= 0, s"bad frame count $nFrames")
    val header = s"$Magic W$width H$height F$fpsNum:$fpsDen Ip A1:1 C420\n"
      .getBytes(java.nio.charset.StandardCharsets.US_ASCII)
    val chromaLen = (width / 2) * (height / 2)
    val buf = new java.io.ByteArrayOutputStream(
      header.length + nFrames * (16 + width * height + 2 * chromaLen))
    buf.write(header, 0, header.length)
    var f = 0
    while (f < nFrames) {
      val marker = s"FRAME Xseq=$f\n"
        .getBytes(java.nio.charset.StandardCharsets.US_ASCII)
      buf.write(marker, 0, marker.length)
      var y = 0
      while (y < height) {
        var x = 0
        while (x < width) {
          val v = luma(f, x, y)
          require(v >= 0 && v <= 255, s"luma out of range: $v at ($f,$x,$y)")
          buf.write(v)
          x += 1
        }
        y += 1
      }
      var c = 0
      while (c < 2 * chromaLen) { buf.write(128); c += 1 }
      f += 1
    }
    buf.toByteArray
  }

  /** Parse + full luma walk of every frame. Rejects anything that is not
    * a complete, well-formed C420 stream.
    */
  def decode(bytes: Array[Byte]): Info = {
    def fail(msg: String) = throw new IllegalArgumentException(s"Y4M: $msg")
    def lineEnd(from: Int): Int = {
      var i = from
      while (i < bytes.length && bytes(i) != '\n') i += 1
      if (i >= bytes.length) fail("unterminated header/marker line")
      i
    }
    val hEnd = lineEnd(0)
    val header = new String(bytes, 0, hEnd,
      java.nio.charset.StandardCharsets.US_ASCII)
    val tokens = header.split(" ").filter(_.nonEmpty)
    if (tokens.isEmpty || tokens(0) != Magic) fail("bad magic")
    var w = -1; var h = -1; var fn = -1; var fd = -1
    tokens.drop(1).foreach { t =>
      (t.head, t.tail) match {
        case ('W', v) => w = v.toInt
        case ('H', v) => h = v.toInt
        case ('F', v) => v.split(":") match {
          case Array(n, d) => fn = n.toInt; fd = d.toInt
          case _ => fail(s"malformed frame rate '$t'")
        }
        case ('C', v) =>
          // only 4:2:0 layouts share our plane geometry; decoding C444
          // bytes with 420 strides would yield plausible-but-wrong means
          if (!v.startsWith("420")) fail(s"unsupported chroma mode C$v")
        case ('I', _) | ('A', _) | ('X', _) => () // interlace/aspect/app params
        case _ => fail(s"unknown header token '$t'")
      }
    }
    if (w <= 0 || h <= 0) fail("missing W/H")
    // bound BEFORE multiplying: crafted huge dims (e.g. W262144 H65536)
    // would wrap w*h to 0 in Int, skip the plane walk, and "decode" to
    // NaN features — the plausible-but-wrong outcome this codec rejects
    if (w > 32768 || h > 32768) fail(s"implausible dims ${w}x$h (max 32768)")
    if (w % 2 != 0 || h % 2 != 0) fail(s"C420 needs even dims, got ${w}x$h")
    if (fn <= 0 || fd <= 0) fail("missing/invalid F rate")
    val lumaLen = w * h
    val frameLen = lumaLen + 2 * ((w / 2) * (h / 2))
    val means = scala.collection.mutable.ArrayBuffer.empty[Double]
    var off = hEnd + 1
    while (off < bytes.length) {
      if (off + 5 > bytes.length ||
          new String(bytes, off, 5,
            java.nio.charset.StandardCharsets.US_ASCII) != "FRAME")
        fail(s"expected FRAME marker at byte $off")
      val mEnd = lineEnd(off)
      if (mEnd > off + 5 && bytes(off + 5) != ' ')
        fail("malformed FRAME params (missing space)")
      var p = mEnd + 1
      if (p + frameLen > bytes.length)
        fail(s"truncated frame ${means.length}: need $frameLen bytes")
      var sum = 0L
      val yEnd = p + lumaLen
      while (p < yEnd) { sum += (bytes(p) & 0xff); p += 1 }
      means += sum.toDouble / lumaLen
      off = mEnd + 1 + frameLen
    }
    if (off != bytes.length) fail("trailing bytes after last frame")
    Info(w, h, fn, fd, means.toArray)
  }
}
