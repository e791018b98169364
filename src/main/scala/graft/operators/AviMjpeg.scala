package graft.operators

import java.awt.image.BufferedImage
import java.io.ByteArrayInputStream
import java.nio.{ByteBuffer, ByteOrder}

/** Pure-JVM MJPEG-in-AVI codec: a hand-rolled RIFF/AVI 1.0 container
  * (`avih`/`strh`/`strf` headers, `movi` payload list, `idx1` index) whose
  * frames are real JPEGs encoded/decoded through `javax.imageio`. This is
  * the video twin of the PNG (image) and RIFF/WAV (audio) paths in
  * [[Multimodal]] — the container layout, chunk padding rules, and frame
  * codec are the genuine formats, so `decode(encode(frames)) == frames`
  * up to JPEG quantization.
  *
  * Scope: single 'vids' stream, MJPG fourcc, 24-bit frames — the subset a
  * training-data lake actually stores for thumbnail-sized clips. Writer and
  * parser are driver/executor-safe (no shared state) and allocation-bounded
  * per row, so they run inside `mapPartitions` over a 100 TB media table.
  */
object AviMjpeg {

  /** A decoded clip: dims + frame rate + per-frame images. */
  final case class Clip(
      width: Int,
      height: Int,
      fps: Int,
      frames: IndexedSeq[BufferedImage])

  /** Raw (still-encoded) view of a clip: per-frame JPEG payloads. Lets
    * frame-level operators ship encoded bytes without re-encoding. */
  final case class RawClip(
      width: Int,
      height: Int,
      fps: Int,
      jpegFrames: IndexedSeq[Array[Byte]])

  private val AVIF_HASINDEX = 0x00000010

  def encodeJpeg(img: BufferedImage): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "jpg", bos)
    bos.toByteArray
  }

  def decodeJpeg(bytes: Array[Byte]): BufferedImage =
    javax.imageio.ImageIO.read(new ByteArrayInputStream(bytes))

  /** Encode frames as one MJPEG AVI. All frames must share the clip dims. */
  def encode(width: Int, height: Int, fps: Int,
             frames: Seq[BufferedImage]): Array[Byte] =
    encodeRaw(width, height, fps, frames.map(encodeJpeg))

  /** Encode pre-compressed JPEG frames as one MJPEG AVI. */
  def encodeRaw(width: Int, height: Int, fps: Int,
                jpegFrames: Seq[Array[Byte]]): Array[Byte] = {
    require(fps > 0 && jpegFrames.nonEmpty, "fps > 0 and at least one frame")
    val n = jpegFrames.length
    val maxFrame = jpegFrames.iterator.map(_.length).max
    val pad = (b: Array[Byte]) => b.length + (b.length & 1) // even chunk rule

    // ---- hdrl ----
    val avih = chunk("avih", put(56) { bb =>
      bb.putInt(1000000 / fps)            // dwMicroSecPerFrame
        .putInt(maxFrame * fps)           // dwMaxBytesPerSec
        .putInt(0)                        // dwPaddingGranularity
        .putInt(AVIF_HASINDEX)            // dwFlags
        .putInt(n)                        // dwTotalFrames
        .putInt(0)                        // dwInitialFrames
        .putInt(1)                        // dwStreams
        .putInt(maxFrame)                 // dwSuggestedBufferSize
        .putInt(width).putInt(height)
        .putInt(0).putInt(0).putInt(0).putInt(0) // dwReserved[4]
    })
    val strh = chunk("strh", put(56) { bb =>
      bb.put(fcc("vids")).put(fcc("MJPG"))
        .putInt(0)                        // dwFlags
        .putShort(0).putShort(0)          // priority, language
        .putInt(0)                        // dwInitialFrames
        .putInt(1)                        // dwScale
        .putInt(fps)                      // dwRate (rate/scale = fps)
        .putInt(0)                        // dwStart
        .putInt(n)                        // dwLength (frames)
        .putInt(maxFrame)                 // dwSuggestedBufferSize
        .putInt(-1)                       // dwQuality (default)
        .putInt(0)                        // dwSampleSize (0: varies)
        .putShort(0).putShort(0).putShort(width.toShort)
        .putShort(height.toShort)         // rcFrame
    })
    val strf = chunk("strf", put(40) { bb => // BITMAPINFOHEADER
      bb.putInt(40)
        .putInt(width).putInt(height)
        .putShort(1)                      // biPlanes
        .putShort(24)                     // biBitCount
        .put(fcc("MJPG"))                 // biCompression
        .putInt(width * height * 3)       // biSizeImage
        .putInt(0).putInt(0).putInt(0).putInt(0)
    })
    val hdrl = list("hdrl", avih ++ list("strl", strh ++ strf))

    // ---- movi + idx1 ----
    val movi = list("movi", jpegFrames.flatMap(f => chunk("00dc", f)).toArray)
    val idx1 = chunk("idx1", put(16 * n) { bb =>
      var off = 4 // offsets are relative to the start of 'movi' fourcc
      jpegFrames.foreach { f =>
        bb.put(fcc("00dc")).putInt(0x10 /* AVIIF_KEYFRAME */)
          .putInt(off).putInt(f.length)
        off += 8 + pad(f)
      }
    })

    val body = fcc("AVI ") ++ hdrl ++ movi ++ idx1
    chunk("RIFF", body)
  }

  /** Parse an MJPEG AVI back to decoded frames. Walks the real chunk
    * structure (even-byte padding, nested LISTs); tolerates unknown chunks.
    */
  def decode(avi: Array[Byte]): Clip = {
    val raw = decodeRaw(avi)
    Clip(raw.width, raw.height, raw.fps, raw.jpegFrames.map(decodeJpeg))
  }

  /** Parse container + frame boundaries without JPEG-decoding the frames. */
  def decodeRaw(avi: Array[Byte]): RawClip = {
    require(avi.length >= 12 && fccAt(avi, 0) == "RIFF" &&
      fccAt(avi, 8) == "AVI ", "not a RIFF/AVI payload")
    var width = 0; var height = 0; var fps = 0
    val frames = scala.collection.mutable.ArrayBuffer[Array[Byte]]()

    def walk(from: Int, until: Int): Unit = {
      var p = from
      while (p + 8 <= until) {
        val id = fccAt(avi, p)
        val len = intAt(avi, p + 4)
        val dataStart = p + 8
        if (id == "LIST") {
          val listType = fccAt(avi, dataStart)
          if (listType == "hdrl" || listType == "strl" || listType == "movi")
            walk(dataStart + 4, dataStart + len)
        } else if (id == "avih") {
          fps = math.max(1, math.round(1e6 / intAt(avi, dataStart)).toInt)
          width = intAt(avi, dataStart + 32)
          height = intAt(avi, dataStart + 36)
        } else if (id.endsWith("dc") || id.endsWith("db")) {
          frames += java.util.Arrays.copyOfRange(avi, dataStart, dataStart + len)
        }
        p = dataStart + len + (len & 1) // chunks pad to even offsets
      }
    }
    walk(12, 8 + intAt(avi, 4))
    require(frames.nonEmpty, "AVI has no video frames")
    RawClip(width, height, fps, frames.toIndexedSeq)
  }

  // ---- byte-twiddling helpers ----

  private def fcc(s: String): Array[Byte] = s.getBytes("US-ASCII")

  private def fccAt(b: Array[Byte], off: Int): String =
    new String(b, off, 4, "US-ASCII")

  private def intAt(b: Array[Byte], off: Int): Int =
    ByteBuffer.wrap(b, off, 4).order(ByteOrder.LITTLE_ENDIAN).getInt

  private def put(n: Int)(f: ByteBuffer => Any): Array[Byte] = {
    val arr = new Array[Byte](n)
    f(ByteBuffer.wrap(arr).order(ByteOrder.LITTLE_ENDIAN))
    arr
  }

  private def chunk(id: String, data: Array[Byte]): Array[Byte] = {
    val padded = data.length + (data.length & 1)
    val out = ByteBuffer.allocate(8 + padded).order(ByteOrder.LITTLE_ENDIAN)
    out.put(fcc(id)).putInt(data.length).put(data)
    out.array()
  }

  private def list(listType: String, data: Array[Byte]): Array[Byte] =
    chunk("LIST", fcc(listType) ++ data)
}
