package graft.sources

import java.nio.file.{Files, Paths}

import graft.SparkSpec

/** The raw-file multimodal ingest: binaryFile rows arrive with content
  * intact, magic-byte sniffing tags kinds correctly, listing-time glob
  * pruning works, and the projected MediaRow frame feeds the real
  * Multimodal decoders. */
class BinaryFilesSpec extends SparkSpec {

  private def png(w: Int, h: Int): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(w, h,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (x <- 0 until w; y <- 0 until h) img.setRGB(x, y, 0x336699)
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  private def header(magic: (Int, String)*): Array[Byte] = {
    // build a byte array by writing each string at its 0-based offset
    val len = magic.map { case (off, s) => off + s.length }.max.max(16)
    val b = Array.fill[Byte](len)(0)
    for ((off, s) <- magic; (c, i) <- s.zipWithIndex) b(off + i) = c.toByte
    b
  }

  test("binaryFile ingest: content round-trips, kinds sniff, glob prunes at listing") {
    val dir = Files.createTempDirectory("binfiles").toString
    val pngBytes = png(7, 5)
    Files.write(Paths.get(dir, "a.png"), pngBytes)
    Files.write(Paths.get(dir, "b.wav"), header(0 -> "RIFF", 8 -> "WAVE"))
    Files.write(Paths.get(dir, "c.mp4"), header(4 -> "ftyp"))
    Files.write(Paths.get(dir, "d.txt"), "just text".getBytes("UTF-8"))

    val all = BinaryFiles.read(spark, dir)
    assert(all.count() == 4)
    val byKind = BinaryFiles.toMedia(all).collect().groupBy(_.kind).view.mapValues(_.length).toMap
    assert(byKind == Map("image" -> 1, "audio" -> 1, "video" -> 1, "other" -> 1), s"$byKind")

    // glob prunes BEFORE reading: only the png row exists
    val onlyPng = BinaryFiles.read(spark, dir, glob = Some("*.png"))
    assert(onlyPng.count() == 1)
    // content is byte-identical to what was written
    val got = onlyPng.select("content").collect().head.getAs[Array[Byte]](0)
    assert(java.util.Arrays.equals(got, pngBytes))

    // the projected MediaRow frame feeds the REAL image decoder
    val stats = Multimodal_imageStats(onlyPng)
    assert(stats == (7, 5))
  }

  private def Multimodal_imageStats(files: org.apache.spark.sql.DataFrame): (Int, Int) = {
    val media = BinaryFiles.toMedia(files)
    val s = graft.ops.Multimodal.imageStats(media).collect().head
    (s.width, s.height)
  }
}
