package graft

import graft.pipeline.MediaCodec
import org.scalatest.funsuite.AnyFunSuite

/** Pins the media container parsers against HAND-WRITTEN fixtures built
  * directly from the published specs (byte literals, not the writers), so
  * the writer and parser cannot drift together, then round-trips the
  * writers through the parsers across the synthesis parameter space.
  */
class MediaCodecSpec extends AnyFunSuite {

  private def bytes(xs: Int*): Array[Byte] = xs.map(_.toByte).toArray

  // ---- hand-written fixtures ----------------------------------------

  test("PNG: spec fixture 800x600 parses via IHDR (big-endian)") {
    // 8-byte signature; IHDR: len 13, type, w=0x320, h=0x258, bit depth 8,
    // color 2, compression/filter/interlace 0, then the real CRC32 of
    // type+data (computed here independently with java.util.zip)
    val ihdrData = bytes(0, 0, 3, 0x20, 0, 0, 2, 0x58, 8, 2, 0, 0, 0)
    val crc = new java.util.zip.CRC32
    crc.update("IHDR".getBytes("US-ASCII")); crc.update(ihdrData)
    val c = crc.getValue.toInt
    val fix = bytes(0x89, 0x50, 0x4e, 0x47, 0x0d, 0x0a, 0x1a, 0x0a) ++
      bytes(0, 0, 0, 13) ++ "IHDR".getBytes("US-ASCII") ++ ihdrData ++
      bytes(c >>> 24, (c >> 16) & 0xff, (c >> 8) & 0xff, c & 0xff)
    val m = MediaCodec.decode(fix)
    assert(m.ok && m.format == "png" && m.width == 800 && m.height == 600 && m.nFrames == 1)
  }

  test("JPEG: spec fixture walks APP0 + a COM segment to SOF2 (height before width)") {
    // SOI; APP0 len 8 (skipped by length); COM len 4; SOF2 (progressive,
    // 0xC2) len 11 with precision 8, h=0x0061=97, w=0x00AD=173, 1 component
    val fix = bytes(0xff, 0xd8,
      0xff, 0xe0, 0, 8, 'J', 'F', 'I', 'F', 0, 0,
      0xff, 0xfe, 0, 4, 'h', 'i',
      0xff, 0xc2, 0, 11, 8, 0, 0x61, 0, 0xad, 1, 1, 0x11, 0)
    val m = MediaCodec.decode(fix)
    assert(m.ok && m.format == "jpeg" && m.width == 173 && m.height == 97)
  }

  test("GIF: spec fixture logical screen descriptor (little-endian)") {
    // "GIF89a", w = 0x0140 = 320 LE, h = 0x00C8 = 200 LE, flags/bg/aspect
    val fix = "GIF89a".getBytes("US-ASCII") ++
      bytes(0x40, 0x01, 0xc8, 0x00, 0, 0, 0) ++ bytes(0x3b)
    val m = MediaCodec.decode(fix)
    assert(m.ok && m.format == "gif" && m.width == 320 && m.height == 200)
  }

  test("WAV: spec fixture fmt + data chunks give sample frames") {
    // RIFF/WAVE; fmt 16: PCM, 2 ch, 44100 Hz, byteRate, blockAlign 4,
    // 16-bit; data chunk of 12 bytes => 3 sample frames
    def le16(v: Int) = bytes(v & 0xff, (v >> 8) & 0xff)
    def le32(v: Int) = bytes(v & 0xff, (v >> 8) & 0xff, (v >> 16) & 0xff, (v >>> 24) & 0xff)
    val fix = "RIFF".getBytes("US-ASCII") ++ le32(4 + 24 + 8 + 12) ++
      "WAVE".getBytes("US-ASCII") ++
      "fmt ".getBytes("US-ASCII") ++ le32(16) ++ le16(1) ++ le16(2) ++
      le32(44100) ++ le32(44100 * 4) ++ le16(4) ++ le16(16) ++
      "data".getBytes("US-ASCII") ++ le32(12) ++ Array.fill[Byte](12)(0x7f)
    val m = MediaCodec.decode(fix)
    assert(m.ok && m.format == "wav" && m.nFrames == 3 && m.bodyLen == 12)
  }

  test("AVI: spec fixture avih carries frames and dims; movi carries the stream") {
    def le32(v: Int) = bytes(v & 0xff, (v >> 8) & 0xff, (v >> 16) & 0xff, (v >>> 24) & 0xff)
    val avih = le32(33333) ++ le32(0) ++ le32(0) ++ le32(0) ++ le32(42) ++
      le32(0) ++ le32(1) ++ le32(0) ++ le32(640) ++ le32(480) ++
      le32(0) ++ le32(0) ++ le32(0) ++ le32(0)
    val body = "streamdata".getBytes("US-ASCII")
    val movi = "movi".getBytes("US-ASCII") ++
      "00dc".getBytes("US-ASCII") ++ le32(body.length) ++ body
    val hdrl = "hdrl".getBytes("US-ASCII") ++
      "avih".getBytes("US-ASCII") ++ le32(56) ++ avih
    val fix = "RIFF".getBytes("US-ASCII") ++
      le32(4 + 8 + hdrl.length + 8 + movi.length) ++ "AVI ".getBytes("US-ASCII") ++
      "LIST".getBytes("US-ASCII") ++ le32(hdrl.length) ++ hdrl ++
      "LIST".getBytes("US-ASCII") ++ le32(movi.length) ++ movi
    val m = MediaCodec.decode(fix)
    assert(m.ok && m.format == "avi" && m.width == 640 && m.height == 480 &&
      m.nFrames == 42)
    assert(new String(fix.slice(m.bodyOffset, m.bodyOffset + m.bodyLen),
      "US-ASCII") == "streamdata")
  }

  // ---- failure paths -------------------------------------------------

  test("corrupt, truncated and foreign payloads fail loudly as data") {
    assert(!MediaCodec.decode(Array[Byte](0) ++ "GIF89a junk".getBytes("US-ASCII")).ok)
    assert(!MediaCodec.decode(Array.emptyByteArray).ok)
    assert(!MediaCodec.decode("plain text that is no container".getBytes("US-ASCII")).ok)
    // PNG signature but truncated before IHDR completes
    assert(!MediaCodec.decode(bytes(0x89, 0x50, 0x4e, 0x47, 0x0d, 0x0a, 0x1a, 0x0a, 0, 0)).ok)
    // JPEG SOI but a segment whose declared length overruns the buffer
    assert(!MediaCodec.decode(bytes(0xff, 0xd8, 0xff, 0xe0, 0x7f, 0x00, 1, 2)).ok)
    // RIFF with an unknown form type
    assert(!MediaCodec.decode(("RIFF" + "\u0000\u0000\u0000\u0000" + "XXXX")
      .getBytes("ISO-8859-1")).ok)
  }

  // ---- writer/parser round trip over the synthesis space -------------

  test("writers round-trip through the parsers for every format and body size") {
    for (docId <- 0L to 40L; bodyLen <- Seq(0, 1, 7, 64, 501)) {
      val body = Array.tabulate[Byte](bodyLen)(i => (32 + (i % 95)).toByte)
      val payload = MediaCodec.encode(docId, body)
      val m = MediaCodec.decode(payload)
      val fmt = MediaCodec.formatFor(docId)
      if (fmt == "raw") assert(!m.ok, s"doc $docId should be corrupt")
      else {
        assert(m.ok && m.format == fmt, s"doc $docId fmt $fmt got $m")
        fmt match {
          case "png" | "jpeg" | "gif" =>
            assert((m.width, m.height) == MediaCodec.dimsFor(docId))
            assert(m.nFrames == 1)
          case "wav" =>
            val ba = 2 * MediaCodec.channelsFor(docId)
            assert(m.nFrames == bodyLen / ba)
          case "avi" =>
            assert((m.width, m.height) == MediaCodec.dimsFor(docId))
            assert(m.nFrames == MediaCodec.videoFramesFor(bodyLen))
        }
        // the located body is exactly the embedded stream bytes
        assert(payload.slice(m.bodyOffset, m.bodyOffset + m.bodyLen).sameElements(body),
          s"doc $docId fmt $fmt body mismatch")
      }
    }
  }

  test("synthesized sizes match the oracle's closed forms") {
    // n_bytes per format must equal the relational formulas the DuckDB
    // oracle uses (PipelineOracle.multimodalMeta)
    for (docId <- 1L to 30L; n <- Seq(0, 5, 43, 100)) {
      val body = Array.fill[Byte](n)('x')
      val len = MediaCodec.encode(docId, body).length
      val expect = MediaCodec.formatFor(docId) match {
        case "raw" => 1 + n
        case "png" => 57 + n
        case "jpeg" => 55 + n
        case "gif" => 14 + n
        case "wav" => 44 + n + n % 2
        case "avi" => 108 + n + n % 2
      }
      assert(len == expect, s"doc $docId n $n: $len != $expect")
    }
  }

}
