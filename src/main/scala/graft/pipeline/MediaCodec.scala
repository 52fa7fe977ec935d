package graft.pipeline

import java.io.ByteArrayOutputStream
import java.util.zip.CRC32

/** Real public-format media container codecs — byte-level synthesis and
  * parsing of PNG, JPEG/JFIF, GIF, WAV (RIFF/WAVE) and AVI (RIFF/AVI )
  * headers, from the published format specifications only.
  *
  * What is REAL here: magic-number detection, PNG chunk walking with
  * correct CRC32s (java.util.zip), JPEG marker-segment walking (APP0 is
  * skipped by its declared length; any SOF0-SOF15 frame header except
  * DHT/JPG/DAC yields the dimensions), GIF logical screen descriptor,
  * RIFF chunk walking for both WAVE (fmt /data) and AVI (LIST hdrl/avih,
  * LIST movi) including the odd-size pad rule. What remains a stand-in:
  * the pixel/sample payload carried INSIDE the containers (no image or
  * audio codec libraries exist in this environment, documented in
  * Multimodal.scala) — the container structure around it is genuine and
  * the parsers read only spec-defined fields.
  *
  * Synthesis is deterministic in (docId, body): dimensions are closed
  * forms of docId and body length (mirrored relationally by the DuckDB
  * oracle — PipelineOracle.multimodalMeta), so the correctness gate
  * re-proves on every run that the parsers invert the writers on real
  * bytes. MediaCodecSpec additionally pins the parsers against
  * hand-written fixtures built independently from the specs, so writer
  * and parser cannot drift together.
  */
object MediaCodec {

  /** Parsed container metadata. `bodyOffset`/`bodyLen` locate the
    * embedded stream payload (PNG IDAT data, JPEG entropy data, GIF
    * block stream, WAV data chunk, AVI movi 00dc chunk) so downstream
    * operators (frame sampling, thumbnails) slice the real embedded
    * bytes rather than the whole file. */
  final case class Meta(format: String, width: Int, height: Int,
      nFrames: Int, bodyOffset: Int, bodyLen: Int, ok: Boolean)

  val Failed: Meta = Meta("unknown", 0, 0, 0, 0, 0, ok = false)

  // ---- deterministic synthesis parameters (oracle-mirrored) ----------

  /** Image/video dims: closed forms of docId, bounded well inside every
    * format's 16-bit limits. */
  def dimsFor(docId: Long): (Int, Int) =
    (16 + ((docId * 37) % 2000).toInt, 16 + ((docId * 59) % 1200).toInt)

  /** Audio channel count (1 or 2); 16-bit samples, so blockAlign = 2ch. */
  def channelsFor(docId: Long): Int = 1 + (docId % 2).toInt
  def sampleRateFor(docId: Long): Int = ((docId / 3) % 3) match {
    case 0 => 8000
    case 1 => 16000
    case _ => 44100
  }

  /** Video frame count: 1 + bodyLen mod 240 (mirrors the old stub's
    * formula so gate cardinality stays put; now WRITTEN into the real
    * avih dwTotalFrames and read back by parsing). */
  def videoFramesFor(bodyLen: Int): Int = 1 + bodyLen % 240

  /** Which container a doc synthesizes into: docId mod 97 == 0 docs are
    * deliberately CORRUPT (0x00-prefixed raw bytes no format starts
    * with — exercises the decoded_ok=false path); otherwise images
    * (docId mod 3 == 0) rotate png/jpeg/gif by (docId/3) mod 3, audio is
    * wav, video is avi. */
  def formatFor(docId: Long): String =
    if (docId % 97 == 0) "raw"
    else (docId % 3) match {
      case 0 => ((docId / 3) % 3) match {
        case 0 => "png"
        case 1 => "jpeg"
        case _ => "gif"
      }
      case 1 => "wav"
      case _ => "avi"
    }

  /** Synthesize the container bytes for a doc: real headers around the
    * body payload. */
  def encode(docId: Long, body: Array[Byte]): Array[Byte] =
    formatFor(docId) match {
      case "raw" => Array[Byte](0) ++ body
      case "png" =>
        val (w, h) = dimsFor(docId); writePng(w, h, body)
      case "jpeg" =>
        val (w, h) = dimsFor(docId); writeJpeg(w, h, body)
      case "gif" =>
        val (w, h) = dimsFor(docId); writeGif(w, h, body)
      case "wav" =>
        writeWav(channelsFor(docId), sampleRateFor(docId), body)
      case "avi" =>
        val (w, h) = dimsFor(docId)
        writeAvi(w, h, videoFramesFor(body.length), body)
    }

  // ---- byte plumbing -------------------------------------------------

  private def be16(v: Int): Array[Byte] = Array(((v >> 8) & 0xff).toByte, (v & 0xff).toByte)
  private def be32(v: Int): Array[Byte] =
    Array((v >>> 24).toByte, ((v >> 16) & 0xff).toByte, ((v >> 8) & 0xff).toByte, (v & 0xff).toByte)
  private def le16(v: Int): Array[Byte] = Array((v & 0xff).toByte, ((v >> 8) & 0xff).toByte)
  private def le32(v: Int): Array[Byte] =
    Array((v & 0xff).toByte, ((v >> 8) & 0xff).toByte, ((v >> 16) & 0xff).toByte, (v >>> 24).toByte)

  private def rdBe16(b: Array[Byte], o: Int): Int = ((b(o) & 0xff) << 8) | (b(o + 1) & 0xff)
  private def rdBe32(b: Array[Byte], o: Int): Int =
    ((b(o) & 0xff) << 24) | ((b(o + 1) & 0xff) << 16) | ((b(o + 2) & 0xff) << 8) | (b(o + 3) & 0xff)
  private def rdLe16(b: Array[Byte], o: Int): Int = (b(o) & 0xff) | ((b(o + 1) & 0xff) << 8)
  private def rdLe32(b: Array[Byte], o: Int): Int =
    (b(o) & 0xff) | ((b(o + 1) & 0xff) << 8) | ((b(o + 2) & 0xff) << 16) | ((b(o + 3) & 0xff) << 24)

  private def ascii(s: String): Array[Byte] = s.getBytes("US-ASCII")
  private def startsWith(b: Array[Byte], prefix: Array[Byte], off: Int = 0): Boolean =
    b.length >= off + prefix.length && prefix.indices.forall(i => b(off + i) == prefix(i))

  // ---- PNG (spec: PNG 1.2 / ISO 15948) -------------------------------

  private val PngSig = Array(0x89, 0x50, 0x4e, 0x47, 0x0d, 0x0a, 0x1a, 0x0a).map(_.toByte)

  private def pngChunk(out: ByteArrayOutputStream, typ: String, data: Array[Byte]): Unit = {
    out.write(be32(data.length))
    val t = ascii(typ)
    out.write(t)
    out.write(data)
    val crc = new CRC32
    crc.update(t)
    crc.update(data)
    out.write(be32(crc.getValue.toInt))
  }

  /** sig + IHDR(13) + IDAT(body) + IEND, all chunk CRCs real.
    * Total size: 8 + 25 + (12 + bodyLen) + 12 = 57 + bodyLen. */
  def writePng(w: Int, h: Int, body: Array[Byte]): Array[Byte] = {
    val out = new ByteArrayOutputStream
    out.write(PngSig)
    val ihdr = new ByteArrayOutputStream
    ihdr.write(be32(w)); ihdr.write(be32(h))
    // bit depth 8, color type 2 (truecolor), deflate, filter 0, no interlace
    ihdr.write(Array[Byte](8, 2, 0, 0, 0))
    pngChunk(out, "IHDR", ihdr.toByteArray)
    pngChunk(out, "IDAT", body) // stand-in stream (not zlib) in a real chunk
    pngChunk(out, "IEND", Array.emptyByteArray)
    out.toByteArray
  }

  /** Chunk walk: verify signature, then read chunks until IHDR (the spec
    * requires it first, but walking tolerates leading ancillary chunks);
    * body = first IDAT's data. */
  private def parsePng(b: Array[Byte]): Meta = {
    var off = 8
    var meta = Failed
    var bodyOff = 0
    var bodyLen = 0
    while (off + 8 <= b.length && (meta == Failed || bodyLen == 0)) {
      val len = rdBe32(b, off)
      val typ = new String(b.slice(off + 4, off + 8), "US-ASCII")
      if (len < 0 || off + 12 + len > b.length) return meta
      if (typ == "IHDR" && len >= 8 && meta == Failed)
        meta = Meta("png", rdBe32(b, off + 8), rdBe32(b, off + 12), 1, 0, 0, ok = true)
      else if (typ == "IDAT" && bodyLen == 0) { bodyOff = off + 8; bodyLen = len }
      else if (typ == "IEND") {
        return if (meta.ok) meta.copy(bodyOffset = bodyOff, bodyLen = bodyLen) else meta
      }
      off += 12 + len
    }
    if (meta.ok) meta.copy(bodyOffset = bodyOff, bodyLen = bodyLen) else meta
  }

  // ---- JPEG/JFIF (spec: ITU-T T.81 + JFIF 1.02) ----------------------

  /** SOI + APP0(JFIF) + SOF0 + SOS + entropy body + EOI.
    * Total size: 2 + 18 + 19 + 14 + bodyLen + 2 = 55 + bodyLen. */
  def writeJpeg(w: Int, h: Int, body: Array[Byte]): Array[Byte] = {
    val out = new ByteArrayOutputStream
    out.write(Array[Byte](0xff.toByte, 0xd8.toByte)) // SOI
    // APP0 JFIF: len 16 = 2 + "JFIF\0"(5) + ver(2) + units(1) + dens(4) + thumb(2)
    out.write(Array[Byte](0xff.toByte, 0xe0.toByte))
    out.write(be16(16))
    out.write(ascii("JFIF")); out.write(0)
    out.write(Array[Byte](1, 1, 0)) // version 1.1, units 0
    out.write(be16(1)); out.write(be16(1)) // density 1x1
    out.write(Array[Byte](0, 0)) // no thumbnail
    // SOF0: len 17 = 2 + precision(1) + h(2) + w(2) + ncomp(1) + 3*3
    out.write(Array[Byte](0xff.toByte, 0xc0.toByte))
    out.write(be16(17))
    out.write(8) // precision
    out.write(be16(h)); out.write(be16(w))
    out.write(3)
    Seq(1, 2, 3).foreach { id => out.write(id); out.write(0x11); out.write(0) }
    // SOS: len 12 = 2 + ncomp(1) + 3*2 + spectral(3); entropy data follows
    out.write(Array[Byte](0xff.toByte, 0xda.toByte))
    out.write(be16(12))
    out.write(3)
    Seq(1, 2, 3).foreach { id => out.write(id); out.write(0) }
    out.write(Array[Byte](0, 63, 0))
    out.write(body) // stand-in entropy-coded stream
    out.write(Array[Byte](0xff.toByte, 0xd9.toByte)) // EOI
    out.toByteArray
  }

  /** Marker-segment walk from after SOI: skip each segment by its
    * declared big-endian length; any SOF marker (0xC0-0xCF except C4
    * DHT, C8 JPG, CC DAC) carries precision, height, width. The entropy
    * body is everything after the SOS segment header up to EOI. */
  private def parseJpeg(b: Array[Byte]): Meta = {
    var off = 2
    var meta = Failed
    while (off + 4 <= b.length) {
      if ((b(off) & 0xff) != 0xff) return meta
      val m = b(off + 1) & 0xff
      if (m == 0xd9) return meta // EOI before SOS
      if (m >= 0xd0 && m <= 0xd7) { off += 2 } // RSTn: standalone
      else {
        val len = rdBe16(b, off + 2)
        if (len < 2 || off + 2 + len > b.length) return meta
        if (m >= 0xc0 && m <= 0xcf && m != 0xc4 && m != 0xc8 && m != 0xcc) {
          if (len >= 7)
            meta = Meta("jpeg", rdBe16(b, off + 7), rdBe16(b, off + 5), 1, 0, 0, ok = true)
        } else if (m == 0xda) {
          // entropy data runs to EOI (no restart-marker scan needed: we
          // only need the extent)
          val bodyOff = off + 2 + len
          val end = b.length - 2
          val bodyLen = math.max(0, end - bodyOff)
          return if (meta.ok) meta.copy(bodyOffset = bodyOff, bodyLen = bodyLen) else meta
        }
        off += 2 + len
      }
    }
    meta
  }

  // ---- GIF (spec: GIF89a) --------------------------------------------

  /** Header + logical screen descriptor (no GCT) + body + trailer.
    * The 13 leading bytes are real; the block stream is the stand-in.
    * Total size: 13 + bodyLen + 1. */
  def writeGif(w: Int, h: Int, body: Array[Byte]): Array[Byte] = {
    val out = new ByteArrayOutputStream
    out.write(ascii("GIF89a"))
    out.write(le16(w)); out.write(le16(h))
    out.write(Array[Byte](0, 0, 0)) // no GCT, bg 0, aspect 0
    out.write(body)
    out.write(0x3b) // trailer
    out.toByteArray
  }

  private def parseGif(b: Array[Byte]): Meta = {
    if (b.length < 13) return Failed
    val hasTrailer = (b(b.length - 1) & 0xff) == 0x3b
    val bodyLen = if (hasTrailer) b.length - 14 else b.length - 13
    Meta("gif", rdLe16(b, 6), rdLe16(b, 8), 1, 13, math.max(0, bodyLen), ok = true)
  }

  // ---- RIFF: WAV + AVI (spec: Microsoft RIFF / AVI 1.0) --------------

  /** RIFF/WAVE with a 16-byte PCM fmt chunk and the body as the data
    * chunk. Sample frames = bodyLen / blockAlign.
    * Total size: 12 + 24 + 8 + bodyLen (+ pad if odd). */
  def writeWav(channels: Int, sampleRate: Int, body: Array[Byte]): Array[Byte] = {
    val blockAlign = channels * 2
    val byteRate = sampleRate * blockAlign
    val out = new ByteArrayOutputStream
    val riffSize = 4 + 24 + 8 + body.length + (body.length & 1)
    out.write(ascii("RIFF")); out.write(le32(riffSize)); out.write(ascii("WAVE"))
    out.write(ascii("fmt ")); out.write(le32(16))
    out.write(le16(1)) // PCM
    out.write(le16(channels))
    out.write(le32(sampleRate))
    out.write(le32(byteRate))
    out.write(le16(blockAlign))
    out.write(le16(16)) // bits per sample
    out.write(ascii("data")); out.write(le32(body.length))
    out.write(body) // stand-in samples
    if ((body.length & 1) == 1) out.write(0) // RIFF pad rule
    out.toByteArray
  }

  /** 14 little-endian DWORDs of the avih main header; only the
    * spec-defined fields the parser reads are populated. */
  private def avihData(w: Int, h: Int, frames: Int): Array[Byte] = {
    val out = new ByteArrayOutputStream
    out.write(le32(33333)) // dwMicroSecPerFrame (~30 fps)
    out.write(le32(0)); out.write(le32(0)); out.write(le32(0))
    out.write(le32(frames)) // dwTotalFrames
    out.write(le32(0))
    out.write(le32(1)) // dwStreams
    out.write(le32(0))
    out.write(le32(w)); out.write(le32(h))
    (0 until 4).foreach(_ => out.write(le32(0)))
    out.toByteArray
  }

  /** RIFF/AVI : LIST hdrl { avih } + LIST movi { 00dc body }.
    * Total size: 12 + 76 + 20 + bodyLen (+ pad if odd). */
  def writeAvi(w: Int, h: Int, frames: Int, body: Array[Byte]): Array[Byte] = {
    val out = new ByteArrayOutputStream
    val moviSize = 4 + 8 + body.length + (body.length & 1)
    val riffSize = 4 + (8 + 4 + 64) + (8 + moviSize)
    out.write(ascii("RIFF")); out.write(le32(riffSize)); out.write(ascii("AVI "))
    out.write(ascii("LIST")); out.write(le32(4 + 64)); out.write(ascii("hdrl"))
    out.write(ascii("avih")); out.write(le32(56)); out.write(avihData(w, h, frames))
    out.write(ascii("LIST")); out.write(le32(moviSize)); out.write(ascii("movi"))
    out.write(ascii("00dc")); out.write(le32(body.length))
    out.write(body) // stand-in compressed frames
    if ((body.length & 1) == 1) out.write(0)
    out.toByteArray
  }

  /** Shared RIFF chunk walk. WAVE: fmt (blockAlign) + data (size) give
    * the sample-frame count. AVI: LIST hdrl's avih gives dims + frame
    * count; LIST movi's first 00dc/00db chunk is the stream body. The
    * odd-size pad byte is honored at every level. */
  private def parseRiff(b: Array[Byte]): Meta = {
    if (b.length < 12) return Failed
    val form = new String(b.slice(8, 12), "US-ASCII")
    var off = 12
    if (form == "WAVE") {
      var blockAlign = 0
      var dataLen = -1
      var dataOff = 0
      while (off + 8 <= b.length) {
        val id = new String(b.slice(off, off + 4), "US-ASCII")
        val len = rdLe32(b, off + 4)
        if (len < 0 || off + 8 + len > b.length) return Failed
        if (id == "fmt " && len >= 16) blockAlign = rdLe16(b, off + 8 + 12)
        else if (id == "data") { dataLen = len; dataOff = off + 8 }
        off += 8 + len + (len & 1)
      }
      if (blockAlign <= 0 || dataLen < 0) Failed
      else Meta("wav", 0, 0, dataLen / blockAlign, dataOff, dataLen, ok = true)
    } else if (form == "AVI ") {
      var meta = Failed
      var bodyOff = 0
      var bodyLen = 0
      while (off + 8 <= b.length) {
        val id = new String(b.slice(off, off + 4), "US-ASCII")
        val len = rdLe32(b, off + 4)
        if (len < 0 || off + 8 + len > b.length) return meta
        if (id == "LIST" && len >= 4) {
          val listType = new String(b.slice(off + 8, off + 12), "US-ASCII")
          var in = off + 12
          val end = off + 8 + len
          while (in + 8 <= end) {
            val cid = new String(b.slice(in, in + 4), "US-ASCII")
            val clen = rdLe32(b, in + 4)
            if (clen < 0 || in + 8 + clen > end) return meta
            if (listType == "hdrl" && cid == "avih" && clen >= 40)
              meta = Meta("avi", rdLe32(b, in + 8 + 32), rdLe32(b, in + 8 + 36),
                rdLe32(b, in + 8 + 16), 0, 0, ok = true)
            else if (listType == "movi" && (cid == "00dc" || cid == "00db") && bodyLen == 0) {
              bodyOff = in + 8; bodyLen = clen
            }
            in += 8 + clen + (clen & 1)
          }
        }
        off += 8 + len + (len & 1)
      }
      if (meta.ok) meta.copy(bodyOffset = bodyOff, bodyLen = bodyLen) else meta
    } else Failed
  }

  /** Detect the container by magic bytes and parse it. Anything
    * unrecognized or structurally broken yields ok=false — corrupt blobs
    * must flow through the pipeline as data, never as exceptions. */
  def decode(payload: Array[Byte]): Meta =
    try {
      if (startsWith(payload, PngSig)) parsePng(payload)
      else if (startsWith(payload, ascii("GIF87a")) || startsWith(payload, ascii("GIF89a")))
        parseGif(payload)
      else if (payload.length >= 2 && (payload(0) & 0xff) == 0xff && (payload(1) & 0xff) == 0xd8)
        parseJpeg(payload)
      else if (startsWith(payload, ascii("RIFF"))) parseRiff(payload)
      else Failed
    } catch { case _: IndexOutOfBoundsException => Failed }
}
