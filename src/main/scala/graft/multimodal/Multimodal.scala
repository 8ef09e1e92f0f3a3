package graft.multimodal

import org.apache.spark.sql.{Column, DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column processing (builder brief): image/audio as opaque
  * BINARY payloads with typed metadata, decoded by a per-partition batch
  * operator using the REAL dependency-free codecs in [[Bmp]] and [[Wav]].
  *
  * Spark shape: a binary column flows into a typed `mapPartitions` that
  * amortizes per-batch decoder setup (exactly where a JNI/FFmpeg handle
  * would be opened once per partition); features come out as one unified
  * row type so mixed-modality corpora stay in a single Dataset. No
  * shuffle — decode runs inside the scan stage and scales linearly with
  * input splits.
  *
  * The deterministic FIXTURE builders ([[bmpFixture]]/[[wavFixture]])
  * derive real container bytes from a document's text, so the oracle can
  * predict every decoded feature from the text in closed form — the
  * decode step itself (header parse, padded pixel walk, chunk walk,
  * little-endian sample scan) is fully exercised, not faked.
  */
object Multimodal {

  case class MediaRow(doc_id: Long, media_type: String, payload: Array[Byte])

  /** Unified decoded-feature row: image fields are zero for audio rows
    * and vice versa (a nullable struct-per-modality would also work; flat
    * zeros keep the oracle comparison simple and the schema stable).
    */
  case class MediaFeatures(doc_id: Long, media_type: String, n_bytes: Long,
                           width: Int, height: Int, bpp: Int, mean_gray: Double,
                           sample_rate: Int, n_samples: Long, peak: Int,
                           n_frames: Long)

  /** Samples per audio "frame" for frame accounting (n_frames). */
  val AudioFrameSamples = 256L

  /** Deterministic BMP payload for a document: dimensions from the text's
    * byte length, a gray gradient `g(x,y) = x+y` over the pixels (bounded
    * w+h keeps it < 256). Mean gray has the closed form (w+h-2)/2 — what
    * the oracle checks the decoder's padded pixel walk against.
    */
  def bmpFixture(text: String): Array[Byte] = {
    val L = text.getBytes(java.nio.charset.StandardCharsets.UTF_8).length
    val w = L % 31 + 2 // 2..32
    val h = L % 17 + 2 // 2..18  → max gray 48, no mod-256 wrap
    Bmp.encode(w, h, (x, y) => x + y)
  }

  /** Deterministic WAV payload: rate from the byte length, then a fixed
    * 16-sample ramp (0,1000,...,15000 — real little-endian variation)
    * followed by one constant sample per text byte whose value is the
    * first two md5 bytes as an int16. Peak has the closed form
    * max(15000, |md5-derived value|).
    */
  def wavFixture(text: String): Array[Byte] = {
    val b = text.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    val rate = 8000 + (b.length % 8) * 500
    val hex = java.security.MessageDigest.getInstance("MD5").digest(b)
      .take(2).map(x => f"${x & 0xff}%02x").mkString
    val u = Integer.parseInt(hex, 16)
    val base = (if (u >= 32768) u - 65536 else u).toShort
    val ramp = Array.tabulate(16)(i => (i * 1000).toShort)
    Wav.encode(rate, ramp ++ Array.fill(b.length)(base))
  }

  /** Mixed-modality fixture corpus from the documents table: even doc_ids
    * carry a BMP image payload, odd ones a WAV audio payload.
    */
  def mediaFixtures(spark: SparkSession, docs: DataFrame): Dataset[MediaRow] = {
    import spark.implicits._
    docs.select(col("doc_id").cast("long"), col("text")).as[(Long, String)]
      .map { case (id, text) =>
        if (id % 2 == 0) MediaRow(id, "image", bmpFixture(text))
        else MediaRow(id, "audio", wavFixture(text))
      }
  }

  /** Normalize any (doc_id, media_type, payload)-shaped frame to the
    * typed MediaRow boundary both batch decoders share.
    */
  private def asMediaRows(spark: SparkSession, media: DataFrame): Dataset[MediaRow] = {
    import spark.implicits._
    media.select(col("doc_id").cast("long"), col("media_type").cast("string"),
      col("payload").cast("binary")).as[MediaRow]
  }

  /** Batch feature extraction: binary payloads through the real codecs,
    * one partition at a time, dispatching on `media_type`. Unknown types
    * fail loudly (silent nulls would hide corpus corruption).
    */
  def extractFeatures(spark: SparkSession, media: DataFrame): Dataset[MediaFeatures] = {
    import spark.implicits._
    asMediaRows(spark, media)
      .mapPartitions { rows =>
        // a stateful decoder handle would be opened here, once per batch
        rows.map { r =>
          val n = r.payload.length.toLong
          r.media_type match {
            case "image" =>
              val i = Bmp.decode(r.payload)
              MediaFeatures(r.doc_id, r.media_type, n, i.width, i.height,
                i.bpp, i.meanGray, 0, 0L, 0, n_frames = 1L)
            case "audio" =>
              val a = Wav.decode(r.payload)
              MediaFeatures(r.doc_id, r.media_type, n, 0, 0, 0, 0.0,
                a.sampleRate, a.nSamples, a.peak,
                n_frames = (a.nSamples + AudioFrameSamples - 1) / AudioFrameSamples)
            case "video" =>
              // the third modality rides the SAME dispatcher (a mixed
              // corpus must not crash on video rows): geometry + frame
              // count from the header walk, mean_gray = frame 0's mean
              // luma, bpp = 12 (4:2:0 bits per pixel). Per-frame features
              // are videoFrameStats' job.
              val v = Y4m.decode(r.payload)
              MediaFeatures(r.doc_id, r.media_type, n, v.width, v.height,
                bpp = 12,
                mean_gray = if (v.nFrames > 0) v.frameMeanY(0) else 0.0,
                sample_rate = 0, n_samples = 0L, peak = 0,
                n_frames = v.nFrames.toLong)
            case other =>
              throw new IllegalArgumentException(s"unknown media_type '$other'")
          }
        }
      }
  }

  /** One decoded VIDEO frame: geometry + rate from the stream header,
    * mean luma from that frame's full Y-plane walk.
    */
  case class VideoFrame(doc_id: Long, width: Int, height: Int, fps_num: Int,
                        n_frames: Long, frame_idx: Long, mean_y: Double)

  /** Deterministic Y4M payload for a document: even 4:2:0 geometry from
    * the text's byte length, 2-5 frames and the fps from the doc id, and
    * each frame's luma a per-frame-based gradient
    * `Y(f,x,y) = (id*31 + f*7) % 200 + x + y` (bounded dims keep it
    * < 256). Both even dims make the per-frame mean the INTEGER
    * `base + (w+h-2)/2` — exact in both engines, so the oracle checks the
    * decoder's full plane walk in closed form.
    */
  def y4mFixture(id: Long, text: String): Array[Byte] = {
    val L = text.getBytes(java.nio.charset.StandardCharsets.UTF_8).length
    val w = (L % 8 + 2) * 2 // 4..18, even
    val h = (L % 5 + 2) * 2 // 4..12, even  → max luma 199+16+10 < 256
    Y4m.encode(w, h, fpsNum = 24 + (id % 2).toInt, fpsDen = 1,
      nFrames = (id % 4 + 2).toInt,
      luma = (f, x, y) => ((id * 31 + f * 7) % 200).toInt + x + y)
  }

  /** Video fixture corpus: every document carries a Y4M payload. */
  def videoFixtures(spark: SparkSession, docs: DataFrame): Dataset[MediaRow] = {
    import spark.implicits._
    docs.select(col("doc_id").cast("long"), col("text")).as[(Long, String)]
      .map { case (id, text) => MediaRow(id, "video", y4mFixture(id, text)) }
  }

  /** Per-FRAME feature extraction for video payloads: one decode per row
    * (full stream walk), one output row per frame — the flatMap shape a
    * real frame extractor has, still shuffle-free inside the scan stage.
    */
  def videoFrameStats(spark: SparkSession, media: DataFrame): Dataset[VideoFrame] = {
    import spark.implicits._
    asMediaRows(spark, media)
      .mapPartitions { rows =>
        rows.flatMap { r =>
          require(r.media_type == "video", s"not a video row: ${r.media_type}")
          val v = Y4m.decode(r.payload)
          v.frameMeanY.iterator.zipWithIndex.map { case (m, f) =>
            VideoFrame(r.doc_id, v.width, v.height, v.fpsNum,
              v.nFrames.toLong, f.toLong, m)
          }
        }
      }
  }

  /** Frame sampling: every `stride`-th frame index of each media row —
    * explode produces the (doc, frame) work-list a real frame extractor
    * would map over. `carry` names feature columns to keep on each frame
    * row (e.g. sample_rate for a resampler).
    */
  def sampleFrames(features: DataFrame, stride: Int,
                   carry: Seq[String] = Nil): DataFrame =
    features.select(Seq(col("doc_id"), col("media_type")) ++ carry.map(col) :+
      explode(sequence(lit(0L), col("n_frames") - 1, lit(stride.toLong)))
        .as("frame_idx"): _*)

  /** One resized image, described by DECODING the re-encoded payload —
    * the features prove the full decode → resample → encode → decode
    * round trip, not just the resampler arithmetic.
    */
  case class ResizedImage(doc_id: Long, width: Int, height: Int, bpp: Int,
                          mean_gray: Double, n_bytes: Long)

  /** Batch image resize (nearest-neighbor, integer factor) through the
    * real BMP codec: image rows only, one partition at a time. The same
    * mapPartitions shape as [[extractFeatures]] — binary payloads never
    * leave the executors, nothing collects, and at 100 TB the operator
    * is embarrassingly parallel (per-row work, zero shuffle).
    */
  /** CONTENT-TEXTURED image fixture: 36×32 gray BMP whose pixel (x, y)
    * is the first md5 byte of the 16-char text window starting at
    * ((y·36+x)·7 mod L) — a deterministic stand-in for "the document's
    * image render". Locality-sensitive by construction: an edit touches
    * only the windows overlapping it, so near-duplicate TEXTS yield
    * near-duplicate TEXTURES (small dHash hamming), while unrelated
    * texts get avalanche-independent pixels — unlike [[bmpFixture]]'s
    * gradient (whose dHash collapses to one value for every w ≥ 9,
    * a degenerate clique under near-dup pairing). Windows are CHAR
    * slices md5'd as UTF-8, so the oracle's substr/md5 mirrors exactly
    * at any encoding.
    */
  def texturedBmpFixture(text: String): Array[Byte] = {
    val l = text.length
    require(l > 0, "textured fixture needs non-empty text")
    // one digest instance per image, reset per window — a fresh
    // getInstance per pixel measured ~2× the whole fixture cost
    val md = java.security.MessageDigest.getInstance("MD5")
    val bytes = text.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    // ASCII fast path: char offsets == byte offsets, so the window can
    // feed the digest as an in-place slice (no substring / re-encode
    // per pixel); non-ASCII text falls back to the char-correct form
    // the oracle's substr mirrors
    val ascii = bytes.length == l
    Bmp.encode(36, 32, (x, y) => {
      val p = ((y * 36 + x) * 7) % l
      md.reset()
      if (ascii) md.update(bytes, p, math.min(16, l - p))
      else md.update(text.substring(p, math.min(p + 16, l))
        .getBytes(java.nio.charset.StandardCharsets.UTF_8))
      md.digest()(0) & 0xff
    })
  }

  /** One textured image per document (all doc_ids — this is the
    * image-dedup fixture corpus, not [[mediaFixtures]]' mixed one). */
  def texturedImageFixtures(spark: SparkSession, docs: DataFrame): Dataset[MediaRow] = {
    import spark.implicits._
    docs.select(col("doc_id").cast("long"), col("text")).as[(Long, String)]
      .map { case (id, text) => MediaRow(id, "image", texturedBmpFixture(text)) }
  }

  /** FUSED fixture→dHash (r20, guide §1.2 #2 per-task work): the dHash
    * of [[texturedBmpFixture]]'s image samples a fixed 9×8 nearest grid
    * — 72 of the 1152 pixels — so rendering the full BMP, shipping it
    * through a Dataset row, and decoding it back computes 16× the md5
    * work the hash reads plus a dead encode/decode round-trip. This
    * computes ONLY the sampled windows, by the same formulas:
    * `Bmp.dHash` reads pixel (x·36/9, y·32/8) = (4x, 4y); the fixture's
    * gray at (px, py) is md5(window((py·36+px)·7 mod L))[0], stored
    * B=G=R so decoded luma ≡ gray. The composed path stays THE
    * definition — MultimodalSpec pins this equal to
    * `Bmp.dHash(texturedBmpFixture(text))` over random corpora
    * (ASCII and non-ASCII, lengths straddling the 16-char window).
    */
  def texturedDHash(text: String): Long = {
    val l = text.length
    require(l > 0, "textured fixture needs non-empty text")
    val md = java.security.MessageDigest.getInstance("MD5")
    val bytes = text.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    val ascii = bytes.length == l
    def gray(px: Int, py: Int): Int = {
      val p = ((py * 36 + px) * 7) % l
      md.reset()
      if (ascii) md.update(bytes, p, math.min(16, l - p))
      else md.update(text.substring(p, math.min(p + 16, l))
        .getBytes(java.nio.charset.StandardCharsets.UTF_8))
      md.digest()(0) & 0xff
    }
    var hash = 0L
    var y = 0
    while (y < 8) {
      var x = 0
      var prev = 0
      while (x < 9) {
        val luma = gray(x * 4, y * 4)
        if (x > 0 && luma > prev) hash |= 1L << (y * 8 + (x - 1))
        prev = luma
        x += 1
      }
      y += 1
    }
    hash
  }

  /** (doc_id, dhash) for every document via [[texturedDHash]] — the
    * fused equivalent of `imageDHashes(s, texturedImageFixtures(s,
    * docs).toDF())`, one scan-stage map with no payload row. */
  def texturedImageDHashes(spark: SparkSession, docs: DataFrame): DataFrame = {
    import spark.implicits._
    docs.select(col("doc_id").cast("long"), col("text")).as[(Long, String)]
      .mapPartitions(rows => rows.map { case (id, t) => (id, texturedDHash(t)) })
      .toDF("doc_id", "dhash")
  }

  /** CONTENT-TEXTURED audio fixture: 65 frames × 64 samples of 16-bit
    * PCM, frame f held constant at the int16 read from the first two
    * md5 bytes of the 16-char text window starting at (f·11 mod L) —
    * [[texturedBmpFixture]]'s audio sibling, same locality argument
    * (an edit perturbs only the frames whose windows overlap it).
    */
  def texturedWavFixture(text: String): Array[Byte] = {
    val l = text.length
    require(l > 0, "textured fixture needs non-empty text")
    val md = java.security.MessageDigest.getInstance("MD5")
    val bytes = text.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    val ascii = bytes.length == l
    val samples = new Array[Short](65 * 64)
    var f = 0
    while (f < 65) {
      val p = (f * 11) % l
      md.reset()
      if (ascii) md.update(bytes, p, math.min(16, l - p))
      else md.update(text.substring(p, math.min(p + 16, l))
        .getBytes(java.nio.charset.StandardCharsets.UTF_8))
      val d = md.digest()
      val u = ((d(0) & 0xff) << 8) | (d(1) & 0xff)
      val a = (if (u >= 32768) u - 65536 else u).toShort
      java.util.Arrays.fill(samples, f * 64, (f + 1) * 64, a)
      f += 1
    }
    Wav.encode(8000, samples)
  }

  /** One textured audio clip per document — the audio-dedup fixture. */
  def texturedAudioFixtures(spark: SparkSession, docs: DataFrame): Dataset[MediaRow] = {
    import spark.implicits._
    docs.select(col("doc_id").cast("long"), col("text")).as[(Long, String)]
      .map { case (id, text) => MediaRow(id, "audio", texturedWavFixture(text)) }
  }

  /** FUSED fixture→energy-hash (r20 — [[texturedDHash]]'s audio
    * sibling): [[texturedWavFixture]] holds frame f constant at the
    * int16 a_f read from md5(window(f·11 mod L)), so
    * `Wav.frameAbsSums(·, 64)`(f) = 64·|a_f| and the energy-delta bit
    * f is simply |a_(f+1)| > |a_f| — computable from the 65 window
    * digests alone, skipping the 8 KB WAV encode/decode round-trip.
    * Composed path stays THE definition; MultimodalSpec pins equality.
    */
  def texturedAudioHash(text: String): Long = {
    val l = text.length
    require(l > 0, "textured fixture needs non-empty text")
    val md = java.security.MessageDigest.getInstance("MD5")
    val bytes = text.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    val ascii = bytes.length == l
    var hash = 0L
    var prevE = 0L
    var f = 0
    while (f < 65) {
      val p = (f * 11) % l
      md.reset()
      if (ascii) md.update(bytes, p, math.min(16, l - p))
      else md.update(text.substring(p, math.min(p + 16, l))
        .getBytes(java.nio.charset.StandardCharsets.UTF_8))
      val d = md.digest()
      val u = ((d(0) & 0xff) << 8) | (d(1) & 0xff)
      val a = if (u >= 32768) u - 65536 else u
      val e = 64L * math.abs(a) // frameAbsSums over 64 constant samples
      if (f > 0 && e > prevE) hash |= 1L << (f - 1)
      prevE = e
      f += 1
    }
    hash
  }

  /** (doc_id, ahash) for every document via [[texturedAudioHash]] — the
    * fused equivalent of `audioEnergyHashes(s, texturedAudioFixtures(s,
    * docs).toDF())`. */
  def texturedAudioHashes(spark: SparkSession, docs: DataFrame): DataFrame = {
    import spark.implicits._
    docs.select(col("doc_id").cast("long"), col("text")).as[(Long, String)]
      .mapPartitions(rows => rows.map { case (id, t) => (id, texturedAudioHash(t)) })
      .toDF("doc_id", "ahash")
  }

  /** ENERGY-DELTA audio fingerprint — (doc_id, ahash LONG): bit f = 1
    * iff frame f+1's Σ|sample| exceeds frame f's, over the first 65
    * decoded 64-sample frames (→ 64 bits). The Haitsma-Kalker-family
    * sign-of-derivative construction on the exact integer energy
    * envelope (`Wav.frameAbsSums` — no fp anywhere): amplitude-scale
    * edits that preserve the envelope's SHAPE keep the hash, so it
    * feeds `NearDup.hammingPairs` exactly like the image dHash. Clips
    * shorter than 66 frames hash their available deltas (remaining
    * bits 0). Scan-stage mapPartitions, zero shuffle.
    */
  def audioEnergyHashes(spark: SparkSession, media: DataFrame,
                        frameSamples: Int = 64): DataFrame = {
    import spark.implicits._
    asMediaRows(spark, media.filter(col("media_type") === "audio"))
      .mapPartitions(rows => rows.map { r =>
        val e = Wav.frameAbsSums(r.payload, frameSamples)
        var hash = 0L
        var f = 0
        val nBits = math.min(64, e.length - 1)
        while (f < nBits) {
          if (e(f + 1) > e(f)) hash |= 1L << f
          f += 1
        }
        (r.doc_id, hash)
      })
      .toDF("doc_id", "ahash")
  }

  /** Perceptual dHash per image payload — (doc_id, dhash LONG) through
    * the real codec, scan-stage mapPartitions, zero shuffle. Feed the
    * result to `NearDup.hammingPairs` for banded image near-dup pairs
    * (the multimodal arm of the dedup family: the hash is 64 bits per
    * image regardless of pixel count, so the pair stage costs the same
    * as SimHash text dedup at any image size).
    */
  def imageDHashes(spark: SparkSession, media: DataFrame): DataFrame = {
    import spark.implicits._
    asMediaRows(spark, media.filter(col("media_type") === "image"))
      .mapPartitions(rows => rows.map(r => (r.doc_id, Bmp.dHash(r.payload))))
      .toDF("doc_id", "dhash")
  }

  def resizeImages(spark: SparkSession, media: DataFrame,
                   factor: Int): Dataset[ResizedImage] = {
    import spark.implicits._
    asMediaRows(spark, media.filter(col("media_type") === "image"))
      .mapPartitions { rows =>
        rows.map { r =>
          val out = Bmp.resizeNearest(r.payload, factor)
          val i = Bmp.decode(out)
          ResizedImage(r.doc_id, i.width, i.height, i.bpp, i.meanGray,
            out.length.toLong)
        }
      }
  }
}
