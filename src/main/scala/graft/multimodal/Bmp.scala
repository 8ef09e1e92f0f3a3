package graft.multimodal

/** Dependency-free BMP (Windows bitmap) codec — 24-bpp uncompressed
  * (BI_RGB), the fixed public layout: 14-byte BITMAPFILEHEADER +
  * 40-byte BITMAPINFOHEADER + bottom-up pixel rows padded to 4-byte
  * stride. Same from-scratch discipline as `export/Xls.scala`'s CFB
  * container: public spec, no library.
  *
  * The decoder is the real thing: it validates the magic/header fields,
  * honours the pixel-array offset (which need not be 54 — palettes or
  * extended headers push it out), walks every row at the PADDED stride
  * in bottom-up or top-down (negative height) order, and folds the
  * B,G,R channel bytes into a mean intensity. A walker that forgets the
  * row padding or misreads the offset produces a wrong mean on any
  * width where `3*width % 4 != 0` — exactly what the oracle check and
  * the spec's padded-width cases catch.
  */
object Bmp {

  /** Decoded facts about one BMP payload. `meanGray` is the mean of
    * (B+G+R)/3 over all pixels, computed with an exact integer sum —
    * deterministic across engines for integer channel values.
    */
  final case class Info(width: Int, height: Int, bpp: Int, meanGray: Double)

  private val FileHeaderLen = 14
  private val InfoHeaderLen = 40

  private def le32(b: Array[Byte], off: Int): Int =
    (b(off) & 0xff) | ((b(off + 1) & 0xff) << 8) |
      ((b(off + 2) & 0xff) << 16) | ((b(off + 3) & 0xff) << 24)

  private def le16(b: Array[Byte], off: Int): Int =
    (b(off) & 0xff) | ((b(off + 1) & 0xff) << 8)

  private def putLe32(b: Array[Byte], off: Int, v: Int): Unit = {
    b(off) = v.toByte; b(off + 1) = (v >>> 8).toByte
    b(off + 2) = (v >>> 16).toByte; b(off + 3) = (v >>> 24).toByte
  }

  private def putLe16(b: Array[Byte], off: Int, v: Int): Unit = {
    b(off) = v.toByte; b(off + 1) = (v >>> 8).toByte
  }

  /** Padded bytes per pixel row: 3 bytes/pixel rounded up to 4. Computed
    * in Long — an adversarial header width (e.g. 0x40000000) overflows
    * `width * 3` in Int, which would let the truncated-pixel-array guard
    * pass and turn the contract's IllegalArgumentException into an
    * ArrayIndexOutOfBoundsException mid-walk.
    */
  def stride(width: Int): Int = {
    val s = (3L * width + 3) / 4 * 4
    require(s > 0 && s <= Int.MaxValue, s"row stride overflows Int for width $width")
    s.toInt
  }

  /** Write a 24-bpp bottom-up BMP with independent channels;
    * `bgr(x, y)` returns the packed 0xBBGGRR int for that pixel.
    */
  def encodeRgb(width: Int, height: Int, bgr: (Int, Int) => Int): Array[Byte] = {
    require(width > 0 && height > 0, s"bad dimensions ${width}x$height")
    val rowLen = stride(width)
    val pixelBytes = rowLen * height
    val total = FileHeaderLen + InfoHeaderLen + pixelBytes
    val out = new Array[Byte](total) // zero-filled → padding bytes are 0
    out(0) = 'B'; out(1) = 'M'
    putLe32(out, 2, total)
    putLe32(out, 10, FileHeaderLen + InfoHeaderLen) // pixel-array offset
    putLe32(out, 14, InfoHeaderLen)
    putLe32(out, 18, width)
    putLe32(out, 22, height) // positive → bottom-up
    putLe16(out, 26, 1)      // planes
    putLe16(out, 28, 24)     // bpp
    putLe32(out, 30, 0)      // BI_RGB
    putLe32(out, 34, pixelBytes)
    putLe32(out, 38, 2835); putLe32(out, 42, 2835) // 72 DPI in px/metre
    var y = 0
    while (y < height) {
      // row y of the IMAGE is stored at slot (height-1-y) — bottom-up
      val base = FileHeaderLen + InfoHeaderLen + (height - 1 - y) * rowLen
      var x = 0
      while (x < width) {
        val v = bgr(x, y)
        val p = base + x * 3
        out(p) = (v & 0xff).toByte
        out(p + 1) = ((v >>> 8) & 0xff).toByte
        out(p + 2) = ((v >>> 16) & 0xff).toByte
        x += 1
      }
      y += 1
    }
    out
  }

  /** Write a 24-bpp bottom-up BMP; `gray(x, y)` in 0..255 is stored as
    * B=G=R (grayscale in an RGB container — every channel byte is real).
    */
  def encode(width: Int, height: Int, gray: (Int, Int) => Int): Array[Byte] =
    encodeRgb(width, height, (x, y) => {
      val g = gray(x, y)
      require(g >= 0 && g <= 255, s"gray out of range at ($x,$y): $g")
      g | (g << 8) | (g << 16)
    })

  /** Validated geometry of a parsed payload — shared by the pixel walks
    * ([[decode]], [[resizeNearest]]) so they cannot diverge on header
    * semantics (offset honouring, stride padding, top-down order).
    */
  private final case class Header(width: Int, height: Int, topDown: Boolean,
                                  pixelOff: Int, rowLen: Int) {
    /** Byte offset of pixel (x, y) in IMAGE coordinates (y=0 is the top
      * row regardless of storage order). */
    def at(x: Int, y: Int): Int = {
      val slot = if (topDown) y else height - 1 - y
      pixelOff + slot * rowLen + x * 3
    }
  }

  private def parseHeader(bytes: Array[Byte]): Header = {
    def fail(msg: String) = throw new IllegalArgumentException(s"BMP: $msg")
    if (bytes.length < FileHeaderLen + InfoHeaderLen) fail("truncated header")
    if (bytes(0) != 'B' || bytes(1) != 'M') fail("bad magic")
    // offset/size fields are unsigned in the spec — widen to Long for
    // every bound check so adversarial values can't wrap negative
    val pixelOffL = le32(bytes, 10) & 0xffffffffL
    val infoLenL = le32(bytes, 14) & 0xffffffffL
    if (infoLenL < InfoHeaderLen) fail(s"unsupported header size $infoLenL")
    val width = le32(bytes, 18)
    val rawHeight = le32(bytes, 22)
    val topDown = rawHeight < 0
    if (rawHeight == Int.MinValue) fail(s"bad dimensions ${width}x$rawHeight")
    val height = math.abs(rawHeight)
    if (width <= 0 || height == 0) fail(s"bad dimensions ${width}x$rawHeight")
    if (3L * width + 3 > Int.MaxValue) fail(s"width $width stride overflows")
    if (le16(bytes, 26) != 1) fail("planes != 1")
    val bpp = le16(bytes, 28)
    if (bpp != 24) fail(s"unsupported bpp $bpp")
    if (le32(bytes, 30) != 0) fail("compressed BMP unsupported")
    val rowLen = stride(width)
    if (pixelOffL < FileHeaderLen + infoLenL) fail("pixel offset inside header")
    if (bytes.length < pixelOffL + rowLen.toLong * height) fail("truncated pixel array")
    Header(width, height, topDown, pixelOffL.toInt /* < bytes.length, so exact */ ,
      rowLen)
  }

  /** Parse + full pixel walk. Rejects anything that is not an
    * uncompressed 24-bpp BMP with a complete pixel array.
    */
  def decode(bytes: Array[Byte]): Info = {
    val h = parseHeader(bytes)
    var sumRgb = 0L // ≤ 255*3 per pixel — exact in Long for any real image
    var y = 0
    while (y < h.height) {
      var x = 0
      while (x < h.width) {
        val p = h.at(x, y)
        sumRgb += (bytes(p) & 0xff) + (bytes(p + 1) & 0xff) + (bytes(p + 2) & 0xff)
        x += 1
      }
      y += 1
    }
    // integer sum then ONE division: both engines see the same exact
    // numerator, and a correctly-rounded IEEE divide of exact operands
    // is bit-identical
    Info(h.width, h.height, 24, sumRgb.toDouble / (3.0 * h.width * h.height))
  }

  /** Nearest-neighbor downscale by an integer factor — a REAL resample
    * through the codec (validated header walk in, fresh pixel array
    * out), not a header rewrite: output pixel (x, y) copies source
    * pixel (x·f, y·f)'s three channel bytes, so non-gray sources
    * survive, and the output is always the canonical bottom-up layout
    * whatever the source's row order was.
    */
  /** 64-bit DIFFERENCE HASH (dHash — Krawetz's public perceptual-hash
    * construction): sample a fixed 9×8 nearest-neighbor grid through the
    * validated header walk (source pixel (⌊x·w/9⌋, ⌊y·h/8⌋) — pure
    * integer arithmetic, any source geometry), integer luma
    * (b+g+r)/3 per sample, bit (y·8+x) = 1 iff luma(x+1,y) > luma(x,y).
    * Robust to resize/re-encode (the grid normalizes geometry) and
    * brightness-monotone edits (only gradient SIGNS survive) — the
    * image-side analog of SimHash for near-duplicate detection.
    */
  def dHash(bytes: Array[Byte]): Long = {
    val h = parseHeader(bytes)
    var hash = 0L
    var y = 0
    while (y < 8) {
      val sy = y * h.height / 8
      var x = 0
      var prev = 0
      while (x < 9) {
        val sx = x * h.width / 9
        val p = h.at(sx, sy)
        val luma = ((bytes(p) & 0xff) + (bytes(p + 1) & 0xff)
          + (bytes(p + 2) & 0xff)) / 3
        if (x > 0 && luma > prev) hash |= 1L << (y * 8 + (x - 1))
        prev = luma
        x += 1
      }
      y += 1
    }
    hash
  }

  def resizeNearest(bytes: Array[Byte], factor: Int): Array[Byte] = {
    val h = parseHeader(bytes)
    require(factor >= 1, s"factor=$factor must be >= 1")
    require(h.width >= factor && h.height >= factor,
      s"factor=$factor exceeds source ${h.width}x${h.height}")
    val wo = h.width / factor
    val ho = h.height / factor
    encodeRgb(wo, ho, (x, y) => {
      val p = h.at(x * factor, y * factor)
      (bytes(p) & 0xff) | ((bytes(p + 1) & 0xff) << 8) | ((bytes(p + 2) & 0xff) << 16)
    })
  }
}
