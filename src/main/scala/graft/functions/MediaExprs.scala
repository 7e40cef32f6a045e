package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, TernaryExpression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Multimodal column plumbing: opaque `binary` blobs in, typed metadata
  * out. [[MediaDecode]] is a REAL pure-JVM header parser for the PNG and
  * WAV container formats (public specs: PNG RFC 2083 / ISO 15948 IHDR
  * chunk; RIFF/WAVE fmt chunk) — no image/audio libraries needed for the
  * metadata path. Pixel/sample decoding would slot in behind the same
  * schema via mapInPandas-style batch UDFs in a full deployment; the
  * container here has no codec libraries, so decode stops at the (fully
  * real) container-header level, and [[FakeMediaDecode]] remains as the
  * clearly-marked stub for arbitrary formats. */
object MediaDecode {
  val schema: StructType = new StructType()
    .add("format", StringType, nullable = false)     // png | wav | unknown
    .add("width", IntegerType, nullable = false)     // png: pixels, else 0
    .add("height", IntegerType, nullable = false)
    .add("channels", IntegerType, nullable = false)  // png color channels / wav channels
    .add("sample_rate", IntegerType, nullable = false) // wav Hz, else 0
    .add("bit_depth", IntegerType, nullable = false) // png bit depth / wav bits per sample
    .add("num_bytes", LongType, nullable = false)

  private def be32(b: Array[Byte], i: Int): Int =
    ((b(i) & 0xff) << 24) | ((b(i + 1) & 0xff) << 16) | ((b(i + 2) & 0xff) << 8) | (b(i + 3) & 0xff)
  private def le32(b: Array[Byte], i: Int): Int =
    (b(i) & 0xff) | ((b(i + 1) & 0xff) << 8) | ((b(i + 2) & 0xff) << 16) | ((b(i + 3) & 0xff) << 24)
  private def le16(b: Array[Byte], i: Int): Int =
    (b(i) & 0xff) | ((b(i + 1) & 0xff) << 8)

  private val PngMagic = Array(0x89, 0x50, 0x4e, 0x47, 0x0d, 0x0a, 0x1a, 0x0a).map(_.toByte)

  /** PNG color type -> sample channels (spec table 11.15). */
  private def pngChannels(colorType: Int): Int = colorType match {
    case 0 => 1 // greyscale
    case 2 => 3 // truecolour
    case 3 => 1 // indexed
    case 4 => 2 // grey + alpha
    case 6 => 4 // truecolour + alpha
    case _ => 0
  }

  def decode(bytes: Array[Byte]): InternalRow = {
    val n = bytes.length.toLong
    // PNG: 8-byte magic, then IHDR chunk: len(4) 'IHDR' width(4) height(4)
    // bitDepth(1) colorType(1) ...
    if (bytes.length >= 29 && java.util.Arrays.equals(
        java.util.Arrays.copyOf(bytes, 8), PngMagic) &&
        bytes(12) == 'I' && bytes(13) == 'H' && bytes(14) == 'D' && bytes(15) == 'R') {
      val w = be32(bytes, 16)
      val h = be32(bytes, 20)
      // hostile IHDR sizes (>= 2^31 reads as negative; PNG spec caps
      // dimensions at 2^31-1 but real images stay far below) are corrupt
      // input, not a png — mirror the WAV path's hostile-size guard
      if (w > 0 && h > 0 && w <= (1 << 30) && h <= (1 << 30)) {
        return InternalRow(UTF8String.fromString("png"),
          w, h, pngChannels(bytes(25) & 0xff), 0, bytes(24) & 0xff, n)
      }
    }
    // WAV: 'RIFF' size 'WAVE', then chunk walk for 'fmt ' (channels at
    // +2, sample rate at +4, bits per sample at +14 within the chunk)
    if (bytes.length >= 12 &&
        bytes(0) == 'R' && bytes(1) == 'I' && bytes(2) == 'F' && bytes(3) == 'F' &&
        bytes(8) == 'W' && bytes(9) == 'A' && bytes(10) == 'V' && bytes(11) == 'E') {
      var i = 12
      while (i + 8 <= bytes.length && i >= 0) {
        val size = le32(bytes, i + 4)
        // size >= 16: a fmt chunk DECLARING fewer than the 16 standard
        // bytes must fall through to 'unknown', not read channels/rate/
        // depth out of the NEXT chunk's bytes (the i+8+16 length check
        // alone cannot tell the two apart)
        if (bytes(i) == 'f' && bytes(i + 1) == 'm' && bytes(i + 2) == 't' &&
            bytes(i + 3) == ' ' && size >= 16 && i + 8 + 16 <= bytes.length) {
          return InternalRow(UTF8String.fromString("wav"),
            0, 0, le16(bytes, i + 10), le32(bytes, i + 12), le16(bytes, i + 22), n)
        }
        // corrupt/hostile sizes (negative, or large enough to overflow the
        // Int cursor) terminate the walk -> format 'unknown', never a throw
        if (size < 0 || size > bytes.length - i - 8) i = bytes.length
        else i += 8 + size + (size & 1) // chunks are word-aligned
      }
    }
    InternalRow(UTF8String.fromString("unknown"), 0, 0, 0, 0, 0, n)
  }

  /** Minimal structurally-valid PNG: magic + IHDR (with real CRC32) +
    * IEND. Deterministic from (width, height, channels). */
  def synthPng(width: Int, height: Int, channels: Int): Array[Byte] = {
    val colorType = channels match {
      case 1 => 0
      case 2 => 4
      case 4 => 6
      case _ => 2
    }
    val out = java.nio.ByteBuffer.allocate(8 + 25 + 12)
    out.put(PngMagic)
    val ihdr = java.nio.ByteBuffer.allocate(17)
    ihdr.put("IHDR".getBytes("US-ASCII"))
    ihdr.putInt(width).putInt(height)
    ihdr.put(8.toByte).put(colorType.toByte)
    ihdr.put(0.toByte).put(0.toByte).put(0.toByte)
    val crc = new java.util.zip.CRC32
    crc.update(ihdr.array())
    out.putInt(13).put(ihdr.array()).putInt(crc.getValue.toInt)
    val iend = "IEND".getBytes("US-ASCII")
    val crc2 = new java.util.zip.CRC32
    crc2.update(iend)
    out.putInt(0).put(iend).putInt(crc2.getValue.toInt)
    out.array()
  }

  /** Minimal structurally-valid WAV: RIFF/WAVE + fmt chunk + empty data
    * chunk. Deterministic from (channels, sampleRate, bitsPerSample). */
  def synthWav(channels: Int, sampleRate: Int, bitsPerSample: Int): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(44).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.put("RIFF".getBytes("US-ASCII")).putInt(36)
    bb.put("WAVE".getBytes("US-ASCII"))
    bb.put("fmt ".getBytes("US-ASCII")).putInt(16)
    bb.putShort(1.toShort).putShort(channels.toShort)
    bb.putInt(sampleRate).putInt(sampleRate * channels * bitsPerSample / 8)
    bb.putShort((channels * bitsPerSample / 8).toShort).putShort(bitsPerSample.toShort)
    bb.put("data".getBytes("US-ASCII")).putInt(0)
    bb.array()
  }
}

/** Parse PNG / WAV container headers out of a binary blob (see
  * [[MediaDecode]]). Unrecognized formats yield format='unknown' with the
  * byte length — never a failure, so a mixed crawl column decodes in one
  * pass. */
case class MediaDecodeExpr(child: Expression)
    extends UnaryExpression with CodegenFallback {
  override def prettyName: String = "media_decode"
  override def dataType: DataType = MediaDecode.schema
  override def nullSafeEval(v: Any): Any =
    MediaDecode.decode(v.asInstanceOf[Array[Byte]])
  override protected def withNewChildInternal(c: Expression): MediaDecodeExpr =
    copy(child = c)
}

/** Deterministic synthetic media blob: kind 0 -> PNG(width, height),
  * kind 1 -> WAV(channels=1+(a%2), sampleRate=8000+b, bits=16). Test/data
  * plumbing for the multimodal path — real container bytes, real parse. */
case class SynthMediaBlob(first: Expression, second: Expression, third: Expression)
    extends TernaryExpression with CodegenFallback {
  override def prettyName: String = "synth_media_blob"
  override def dataType: DataType = BinaryType
  override def nullSafeEval(kind: Any, a: Any, b: Any): Any = {
    val ka = a.asInstanceOf[Int]
    val kb = b.asInstanceOf[Int]
    if (kind.asInstanceOf[Int] == 0)
      MediaDecode.synthPng(1 + (ka & 0xfff), 1 + (kb & 0xfff), 1 + (ka % 4))
    else
      MediaDecode.synthWav(1 + (ka % 2), 8000 + (kb & 0xffff), 16)
  }
  override protected def withNewChildrenInternal(a: Expression, b: Expression,
      c: Expression): SynthMediaBlob = copy(first = a, second = b, third = c)
}
