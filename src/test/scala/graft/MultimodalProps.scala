package graft

import org.scalacheck.{Gen, Properties}
import org.scalacheck.Prop.forAll
import javax.imageio.metadata.IIOMetadataNode

/**
 * Property test pinning the GIF compositing core to a PURE SEQUENTIAL
 * reference: `Multimodal.sampleGif` decides from metadata alone which
 * frames to rasterize (delta chains back to the nearest covering frame,
 * nothing past the last sample) — an optimization that is only correct if
 * a full-screen opaque frame really erases all earlier history, including
 * restore-to-background fills. Random containers (random sub-rectangle
 * frames, solid grays, random disposal) are written through the real JDK
 * GIF encoder and the decoded sampled-canvas luminance must equal a plain
 * frame-0-to-last simulation over a 2-D array — no skipping, no cover
 * analysis. Solid single-color frames round-trip the encoder bit-exactly
 * (the derived-palette guarantee the decode oracles rely on), so any
 * divergence is a compositing bug, not codec noise.
 */
object MultimodalProps extends Properties("graft.multimodal") {

  private final case class Frame(gray: Int, x: Int, y: Int, w: Int, h: Int,
                                 restoreBg: Boolean)

  /** Frame 0 is full-screen (the writer derives the logical screen from
    * it); later frames are arbitrary in-bounds sub-rectangles. */
  private def framesGen(sw: Int, sh: Int): Gen[List[Frame]] = for {
    g0 <- Gen.choose(0, 255)
    r0 <- Gen.oneOf(true, false)
    rest <- Gen.listOfN(4, for {
      g <- Gen.choose(0, 255)
      x <- Gen.choose(0, sw - 1)
      y <- Gen.choose(0, sh - 1)
      w <- Gen.choose(1, sw - x)
      h <- Gen.choose(1, sh - y)
      r <- Gen.oneOf(true, false)
    } yield Frame(g, x, y, w, h, r))
    take <- Gen.choose(0, 4)
  } yield Frame(g0, 0, 0, sw, sh, r0) :: rest.take(take)

  private def writeGif(frames: Seq[Frame]): Array[Byte] = {
    val writer = javax.imageio.ImageIO.getImageWritersByFormatName("gif").next()
    val baos = new java.io.ByteArrayOutputStream()
    val ios = new javax.imageio.stream.MemoryCacheImageOutputStream(baos)
    try {
      writer.setOutput(ios)
      writer.prepareWriteSequence(null)
      frames.foreach { fr =>
        val im = new java.awt.image.BufferedImage(
          fr.w, fr.h, java.awt.image.BufferedImage.TYPE_INT_RGB)
        val rgb = (fr.gray << 16) | (fr.gray << 8) | fr.gray
        for (y <- 0 until fr.h; x <- 0 until fr.w) im.setRGB(x, y, rgb)
        val md = writer.getDefaultImageMetadata(
          new javax.imageio.ImageTypeSpecifier(im), null)
        val fmt = "javax_imageio_gif_image_1.0"
        val tree = md.getAsTree(fmt).asInstanceOf[IIOMetadataNode]
        val desc = tree.getElementsByTagName("ImageDescriptor").item(0)
          .asInstanceOf[IIOMetadataNode]
        desc.setAttribute("imageLeftPosition", fr.x.toString)
        desc.setAttribute("imageTopPosition", fr.y.toString)
        val gces = tree.getElementsByTagName("GraphicControlExtension")
        val gce =
          if (gces.getLength > 0) gces.item(0).asInstanceOf[IIOMetadataNode]
          else {
            val n = new IIOMetadataNode("GraphicControlExtension")
            tree.appendChild(n); n
          }
        gce.setAttribute("disposalMethod",
          if (fr.restoreBg) "restoreToBackgroundColor" else "doNotDispose")
        gce.setAttribute("userInputFlag", "FALSE")
        gce.setAttribute("transparentColorFlag", "FALSE")
        gce.setAttribute("delayTime", "0")
        gce.setAttribute("transparentColorIndex", "0")
        md.setFromTree(fmt, tree)
        writer.writeToSequence(new javax.imageio.IIOImage(im, null, md), null)
      }
      writer.endWriteSequence()
      ios.flush()
    } finally { ios.close(); writer.dispose() }
    baos.toByteArray
  }

  /** The definitional compositor: every frame 0..n-1 in order, no
    * skipping — draw the rect, snapshot sampled indices, apply disposal. */
  private def refMeanLuma(sw: Int, sh: Int, frames: Seq[Frame], every: Int): Double = {
    val canvas = Array.fill(sh, sw)(0)
    var sum = 0.0
    var count = 0
    frames.zipWithIndex.foreach { case (fr, i) =>
      for (y <- fr.y until fr.y + fr.h; x <- fr.x until fr.x + fr.w)
        canvas(y)(x) = fr.gray
      if (i % every == 0) {
        sum += canvas.iterator.flatten
          .map(g => 0.299 * g + 0.587 * g + 0.114 * g).sum
        count += 1
      }
      if (fr.restoreBg)
        for (y <- fr.y until fr.y + fr.h; x <- fr.x until fr.x + fr.w)
          canvas(y)(x) = 0
    }
    sum / (count.toLong * sw * sh)
  }

  property("cover-analysis sampling equals full sequential compositing") =
    forAll(Gen.choose(8, 12), Gen.choose(8, 12), Gen.choose(1, 4)) { (sw, sh, every) =>
      forAll(framesGen(sw, sh)) { frames =>
        val got = graft.pipeline.Multimodal.sampleGif(writeGif(frames), every)
        val expectSampled = (frames.size + every - 1) / every
        got match {
          case Some((w, h, n, sampled, luma)) =>
            w == sw && h == sh && n == frames.size && sampled == expectSampled &&
              math.abs(luma - refMeanLuma(sw, sh, frames, every)) < 1e-9
          case None => false
        }
      }
    }

  // ---- lock-free PCM16LE WAV codec (the audio slots' hot path) --------

  private def jdkWav(rate: Int, channels: Int, data: Array[Byte]): Array[Byte] = {
    val fmt = new javax.sound.sampled.AudioFormat(
      javax.sound.sampled.AudioFormat.Encoding.PCM_SIGNED,
      rate.toFloat, 16, channels, channels * 2, rate.toFloat, false)
    val ais = new javax.sound.sampled.AudioInputStream(
      new java.io.ByteArrayInputStream(data), fmt,
      data.length.toLong / (channels * 2))
    val baos = new java.io.ByteArrayOutputStream()
    javax.sound.sampled.AudioSystem.write(
      ais, javax.sound.sampled.AudioFileFormat.Type.WAVE, baos)
    baos.toByteArray
  }

  /** The writer that replaced AudioSystem.write in the codec slots must
    * stay byte-identical to it — artifacts a WAV consumer reads today
    * must not change shape — and the lock-free reader must invert it. */
  property("Wav.writePcm16 is byte-identical to the JDK WaveFileWriter " +
    "and readPcm16 inverts it") =
    forAll(Gen.choose(1, 2), Gen.oneOf(4000, 8000, 44100),
      Gen.choose(0, 300)) { (ch, rate, frames) =>
      val data = Array.tabulate(frames * ch * 2)(i => ((i * 31 + 7) % 251).toByte)
      val ours = graft.pipeline.Multimodal.Wav.writePcm16(rate, ch, data)
      val jdk = jdkWav(rate, ch, data)
      val back = graft.pipeline.Multimodal.Wav.readPcm16(ours)
      java.util.Arrays.equals(ours, jdk) &&
        (back match {
          case Some((r, c, d)) =>
            r == rate && c == ch && java.util.Arrays.equals(d, data)
          case None => false
        })
    }

  /** Non-PCM16 containers must be declined (None), never mis-parsed —
    * the AudioSystem fallback keeps handling them. */
  property("Wav.readPcm16 declines foreign containers") =
    forAll(Gen.oneOf(8, 24, 32), Gen.choose(1, 100)) { (bits, frames) =>
      val bytesPer = bits / 8
      val data = Array.tabulate(frames * bytesPer)(i => (i % 120).toByte)
      val fmt = new javax.sound.sampled.AudioFormat(
        javax.sound.sampled.AudioFormat.Encoding.PCM_SIGNED,
        8000f, bits, 1, bytesPer, 8000f, false)
      val ais = new javax.sound.sampled.AudioInputStream(
        new java.io.ByteArrayInputStream(data), fmt, frames.toLong)
      val baos = new java.io.ByteArrayOutputStream()
      javax.sound.sampled.AudioSystem.write(
        ais, javax.sound.sampled.AudioFileFormat.Type.WAVE, baos)
      graft.pipeline.Multimodal.Wav.readPcm16(baos.toByteArray).isEmpty &&
        graft.pipeline.Multimodal.Wav.readPcm16(Array[Byte](1, 2, 3)).isEmpty
    }
}
