package graft.pipeline

import graft.GraftMediaDecodeError

/** Minimal REAL binary-image codec: P6 PPM (netpbm), the simplest widely
  * published raster format — ASCII header `P6\n<width> <height>\n255\n`
  * followed by width·height·3 raw RGB bytes.
  *
  * This replaces the m-family's former byte-derived decode STUB: the
  * decoder genuinely interprets the format — validates the magic, parses
  * the ASCII dimensions and maxval, and checks the raster length against
  * the header's promise — and raises [[GraftMediaDecodeError]] on any
  * malformed input instead of deriving fake metadata from raw bytes.
  * (The heavyweight codecs a production pipeline would use are not in
  * this container; PPM keeps the decode real while staying dependency-
  * free and deterministic, so the octet-based oracles still apply.)
  */
object Ppm {

  final case class Image(width: Int, height: Int, raster: Array[Byte])

  /** Serialize a raster as P6. Encoder counterpart used by the operators
    * to synthesize each document's stored media payload deterministically
    * from its bytes (the container's stand-in for reading real media
    * files), so decode exercises a true round-trip.
    */
  def encode(img: Image): Array[Byte] = {
    require(img.raster.length == 3 * img.width * img.height,
      s"raster ${img.raster.length} != 3*${img.width}*${img.height}")
    val header = s"P6\n${img.width} ${img.height}\n255\n"
      .getBytes(java.nio.charset.StandardCharsets.US_ASCII)
    val out = new Array[Byte](header.length + img.raster.length)
    System.arraycopy(header, 0, out, 0, header.length)
    System.arraycopy(img.raster, 0, out, header.length, img.raster.length)
    out
  }

  /** Strict P6 parse. Deliberately rejects the format's optional laxities
    * (comments, arbitrary whitespace runs, maxval ≠ 255) — the operators
    * only ever feed canonical payloads, and a strict parser makes header
    * corruption loud instead of best-effort.
    */
  def decode(bytes: Array[Byte]): Image = {
    if (bytes.length < 2 || bytes(0) != 'P' || bytes(1) != '6')
      throw new GraftMediaDecodeError("not a P6 ppm: bad magic")
    var pos = 2

    def expect(c: Char, what: String): Unit = {
      if (pos >= bytes.length || bytes(pos) != c)
        throw new GraftMediaDecodeError(s"malformed ppm header: expected $what at byte $pos")
      pos += 1
    }

    def readInt(what: String): Int = {
      val start = pos
      var v = 0L
      while (pos < bytes.length && bytes(pos) >= '0' && bytes(pos) <= '9') {
        v = v * 10 + (bytes(pos) - '0')
        if (v > Int.MaxValue)
          throw new GraftMediaDecodeError(s"ppm $what overflows int")
        pos += 1
      }
      if (pos == start)
        throw new GraftMediaDecodeError(s"malformed ppm header: missing $what at byte $pos")
      v.toInt
    }

    expect('\n', "newline after magic")
    val w = readInt("width")
    expect(' ', "separator between dimensions")
    val h = readInt("height")
    expect('\n', "newline after dimensions")
    val maxval = readInt("maxval")
    if (maxval != 255)
      throw new GraftMediaDecodeError(s"unsupported ppm maxval $maxval (only 255)")
    expect('\n', "newline after maxval")
    if (w <= 0 || h <= 0)
      throw new GraftMediaDecodeError(s"invalid ppm dimensions ${w}x$h")
    val expected = 3L * w * h
    val actual = bytes.length - pos
    if (actual != expected)
      throw new GraftMediaDecodeError(
        s"ppm raster length $actual != header promise $expected (${w}x$h x3)")
    Image(w, h, java.util.Arrays.copyOfRange(bytes, pos, bytes.length))
  }
}
