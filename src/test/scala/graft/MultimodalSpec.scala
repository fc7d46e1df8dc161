package graft

import org.apache.spark.sql.functions._

import graft.llm.Multimodal
import graft.llm.Multimodal.{Media, MediaMeta}

/** The multimodal plumbing: typed batch iteration (mapInPandas analogue),
  * deterministic stub decode, and byte sampling — schema and values
  * pinned so a real codec can replace the stub without touching the
  * distributed shape.
  */
class MultimodalSpec extends SparkSpecBase {

  test("extractMeta: mapPartitions batch decode keeps schema + determinism") {
    import spark.implicits._
    val media = Seq(
      Media(1L, "image", "abcdef".getBytes("UTF-8")),
      Media(2L, "audio", Array[Byte](0, 1, 2, 3))).toDS()
    val out = Multimodal.extractMeta(media).collect().sortBy(_.media_id)
    assert(out.map(_.media_id).toSeq === Seq(1L, 2L))
    assert(out.forall(m => m.width >= 64 && m.width < 128 && m.height >= 64 && m.height < 128))
    // decode is deterministic: same bytes → same meta
    val again = Multimodal.extractMeta(media).collect().sortBy(_.media_id)
    assert(out.toSeq === again.toSeq)
    // checksum matches a direct fold
    val expect = "abcdef".getBytes("UTF-8").foldLeft(0L)((a, b) => (a * 131 + (b & 0xff)) % 1000000007L)
    assert(out.head.checksum === expect)
  }

  test("PPM codec swaps into the same seam: real header parse, same distributed shape") {
    import spark.implicits._
    // a 2×3 binary PPM with a header comment + 18 pixel bytes
    val ppm = ("P6\n# test image\n2 3\n255\n".getBytes("US-ASCII") ++
      Array.tabulate[Byte](18)(_.toByte))
    val media = Seq(
      Media(1L, "image", ppm),
      Media(2L, "image", "not a ppm".getBytes("UTF-8"))).toDS()
    val out = Multimodal.extractMeta(media, Multimodal.PpmCodec)
      .collect().sortBy(_.media_id)
    assert(out(0).width === 2 && out(0).height === 3)
    assert(out(0).n_bytes === ppm.length.toLong)
    assert(out(1).width === 0 && out(1).height === 0, "non-PPM decodes to 0x0, not a throw")
    // same seam, same schema: stub and real codec outputs are union-able
    val stub = Multimodal.extractMeta(media).collect()
    assert(stub.map(_.media_id).sorted.toSeq === out.map(_.media_id).toSeq)
  }

  test("ImageIO codec: generated BMP decodes real dims via the seam; magic dispatch; resize ≡ plan") {
    import spark.implicits._
    // generate a real 37×21 BMP with the JDK encoder — no fixtures on disk
    def bmp(w: Int, h: Int): Array[Byte] = {
      val img = new java.awt.image.BufferedImage(w, h,
        java.awt.image.BufferedImage.TYPE_INT_RGB)
      (0 until w).foreach(x => (0 until h).foreach(y =>
        img.setRGB(x, y, (x * 31 + y * 7) & 0xffffff)))
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "bmp", bos)
      bos.toByteArray
    }
    val payload = bmp(37, 21)
    val media = Seq(
      Media(1L, "image", payload),
      Media(2L, "text", "just some text".getBytes("UTF-8")), // magic miss → stub
      Media(3L, "image", Array[Byte]('B', 'M', 1, 2, 3, 4, 5, 6, 7))) // corrupt
      .toDS()
    val out = Multimodal.extractMeta(media, Multimodal.ImageIoCodec)
      .collect().sortBy(_.media_id)
    assert(out(0).width === 37 && out(0).height === 21, "real header decode")
    assert(out(0).n_bytes === payload.length.toLong)
    // non-image magic falls through to the stub's deterministic fake
    assert(out(1) === Multimodal.decodeStub(Media(2L, "text", "just some text".getBytes("UTF-8"))))
    // magic matches but payload is corrupt: 0×0 poison row, no throw
    assert(out(2).width === 0 && out(2).height === 0)

    // real raster resize: produced dims ≡ mediaResize's integer plan
    val resized = Multimodal.resizeImage(payload, shortSide = 224).get
    val back = Multimodal.decodeImage(resized)
    val sh = math.min(37, 21)
    assert(back.getWidth === ((2L * 224 * 37 + sh) / (2L * sh)).toInt) // 395
    assert(back.getHeight === 224, "short side lands exactly on target")
    assert(Multimodal.resizeImage("not an image".getBytes("UTF-8")).isEmpty)
  }

  test("ingest + mediaMeta: binary payload with byte-exact length and hash") {
    val df = Multimodal.mediaMeta(spark, sfDir)
    val r = df.filter(col("media_id") === 0).head()
    assert(r.getAs[String]("modality") === "text")
    assert(r.getAs[Int]("n_bytes") > 0)
    assert(r.getAs[String]("h").length === 32)
  }

  test("mediaDedup: byte-identical payloads collapse to the lowest id with exact reclaim") {
    val out = Multimodal.mediaDedup(spark, sfDir).collect()
    // one output row per distinct (modality, digest); keeper never
    // exceeds any member; reclaimed = (n_copies - 1) · payload bytes
    assert(out.nonEmpty)
    out.foreach { r =>
      val n = r.getAs[Long]("n_copies")
      val reclaimed = r.getAs[Long]("bytes_reclaimed")
      assert(n >= 1L)
      if (n == 1L) assert(reclaimed === 0L, "unique payload reclaims nothing")
      else assert(reclaimed > 0L && reclaimed % (n - 1) === 0L,
        "copies are byte-identical so reclaim divides evenly")
    }
    // keep_id is a real media_id and total output ≤ corpus size
    val total = Multimodal.ingestDocuments(spark, sfDir).count()
    assert(out.map(_.getAs[Long]("n_copies")).sum === total,
      "every payload lands in exactly one digest group")
  }

  test("sampleBytes: every stride-th byte, deterministic") {
    import spark.implicits._
    val df = Seq((1L, "abcdefghij")).toDF("id", "s")
      .withColumn("bytes", col("s").cast("binary"))
    val out = Multimodal.sampleBytes(df, stride = 3).select("sampled").head().getSeq[Array[Byte]](0)
    assert(out.map(b => new String(b, "UTF-8")).toSeq === Seq("a", "d", "g", "j"))
  }

  test("mediaPack (two-pass prefix sum) ≡ per-modality window twin") {
    val key = (r: org.apache.spark.sql.Row) =>
      r.getAs[Long]("media_id") -> ((r.getAs[String]("modality"),
        r.getAs[Long]("n_bytes"), r.getAs[Long]("shard_id"), r.getAs[Long]("shard_off")))
    val got = Multimodal.mediaPack(spark, sfDir).collect().map(key).toMap
    val twin = Multimodal.mediaPackWindow(spark, sfDir).collect().map(key).toMap
    assert(got === twin)
    assert(got.nonEmpty)
    // offsets live inside the shard budget
    assert(got.values.forall { case (_, _, _, off) => off >= 0 && off < 4096 })
  }

  test("perceptual hash: re-encode-stable, edit-tolerant, and banded near-dup join finds the pair") {
    import spark.implicits._
    def img(w: Int, h: Int)(px: (Int, Int) => Int): java.awt.image.BufferedImage = {
      val i = new java.awt.image.BufferedImage(w, h,
        java.awt.image.BufferedImage.TYPE_INT_RGB)
      (0 until w).foreach(x => (0 until h).foreach(y => i.setRGB(x, y, px(x, y))))
      i
    }
    def enc(i: java.awt.image.BufferedImage, fmt: String): Array[Byte] = {
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(i, fmt, bos)
      bos.toByteArray
    }
    // left-dark / right-bright gradient; a noised copy; an inverted image
    def grad(x: Int, y: Int): Int = { val v = x * 255 / 63; (v << 16) | (v << 8) | v }
    val base = img(64, 64)(grad)
    val noisy = img(64, 64)((x, y) =>
      if ((x * 13 + y * 7) % 97 == 0) 0x808080 else grad(x, y))
    val inverted = img(64, 64)((x, y) => { val v = 255 - x * 255 / 63; (v << 16) | (v << 8) | v })

    val hBmp = Multimodal.imageAHash(enc(base, "bmp")).get
    val hPng = Multimodal.imageAHash(enc(base, "png")).get
    assert(hBmp === hPng, "lossless re-encode must not move the hash")
    def ham(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)
    val hNoise = Multimodal.imageAHash(enc(noisy, "bmp")).get
    val hInv = Multimodal.imageAHash(enc(inverted, "bmp")).get
    assert(ham(hBmp, hNoise) <= 3, s"sparse noise must stay near: ${ham(hBmp, hNoise)}")
    assert(ham(hBmp, hInv) >= 32, s"inversion must flip far: ${ham(hBmp, hInv)}")
    assert(Multimodal.imageAHash("not an image".getBytes("UTF-8")).isEmpty)

    // end-to-end: mapPartitions phash stage + banded near-dup join
    val media = Seq(
      Media(1L, "image", enc(base, "bmp")),
      Media(2L, "image", enc(noisy, "bmp")),
      Media(3L, "image", enc(inverted, "bmp")),
      Media(4L, "text", "poison".getBytes("UTF-8"))).toDS()
    val ph = Multimodal.mediaPhash(media)
    assert(ph.count() === 3, "undecodable payload must skip, not fail")
    val pairs = Multimodal.phashNearDups(ph)
      .select(col("media_id1").as[Long], col("media_id2").as[Long]).collect().toSet
    assert(pairs === Set((1L, 2L)), s"only the noised copy pairs with base: $pairs")
  }

  test("PPM P6 raster path: aHash ≡ the ImageIO path on the same pixels; poison rows skip") {
    // round 12 (the multimodal_phash row's decode seam): identical
    // pixels written as raw P6 and as BMP must hash bit-identically —
    // the two luminance sources share one aHash accumulation
    def pix(m: Long, b: Int): Int = ((m * 131 + 7L * b) % 256).toInt
    def ppm(m: Long, w: Int, h: Int): Array[Byte] = {
      val px = Array.tabulate(3 * w * h)(b => pix(m, b).toByte)
      s"P6\n$w $h\n255\n".getBytes("US-ASCII") ++ px
    }
    def bmp(m: Long, w: Int, h: Int): Array[Byte] = {
      val img = new java.awt.image.BufferedImage(w, h,
        java.awt.image.BufferedImage.TYPE_INT_RGB)
      for (y <- 0 until h; x <- 0 until w) {
        val p = 3 * (y * w + x)
        img.setRGB(x, y, (pix(m, p) << 16) | (pix(m, p + 1) << 8) | pix(m, p + 2))
      }
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "bmp", bos)
      bos.toByteArray
    }
    for (m <- Seq(0L, 3L, 17L, 499L); (w, h) <- Seq((16, 16), (24, 8), (9, 33))) {
      val hp = Multimodal.imageAHash(ppm(m, w, h))
      val hb = Multimodal.imageAHash(bmp(m, w, h))
      assert(hp.isDefined && hp === hb, s"PPM ≠ ImageIO at m=$m ${w}x$h")
    }
    // comment in the header survives the tokenizer
    val withComment = ("P6\n# a netpbm comment\n16 16\n255\n").getBytes("US-ASCII") ++
      Array.tabulate(768)(b => pix(7L, b).toByte)
    assert(Multimodal.imageAHash(withComment) ===
      Multimodal.imageAHash(ppm(7L, 16, 16)))
    // poison rows: truncated raster, 16-bit maxval, sub-8×8 grid, bad dims
    assert(Multimodal.imageAHash(ppm(1L, 16, 16).dropRight(10)).isEmpty)
    assert(Multimodal.imageAHash(("P6\n16 16\n65535\n".getBytes("US-ASCII") ++
      Array.fill[Byte](1536)(1))).isEmpty)
    assert(Multimodal.imageAHash(ppm(1L, 4, 4)).isEmpty)
    assert(Multimodal.imageAHash("P6\n-3 xyz\n255\n".getBytes("US-ASCII")).isEmpty)
  }

  test("WAV codec: generated PCM header decodes real rate/channels/duration; poison + non-WAV ride through") {
    import spark.implicits._
    // canonical 44-byte PCM WAV: mono, 8 kHz, 16-bit, 4000 frames = 500 ms
    def wav(ch: Int, rate: Int, bits: Int, frames: Int): Array[Byte] = {
      val block = ch * bits / 8
      val dataSize = frames * block
      val bb = java.nio.ByteBuffer.allocate(44 + dataSize)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      bb.put("RIFF".getBytes("US-ASCII")).putInt(36 + dataSize)
        .put("WAVE".getBytes("US-ASCII"))
        .put("fmt ".getBytes("US-ASCII")).putInt(16)
        .putShort(1.toShort).putShort(ch.toShort).putInt(rate)
        .putInt(rate * block).putShort(block.toShort).putShort(bits.toShort)
        .put("data".getBytes("US-ASCII")).putInt(dataSize)
      (0 until frames * block / 2).foreach(i => bb.putShort((i % 251).toShort))
      bb.array()
    }
    val ds = Seq(
      Media(1L, "audio", wav(ch = 1, rate = 8000, bits = 16, frames = 4000)),
      Media(2L, "audio", wav(ch = 2, rate = 44100, bits = 16, frames = 44100)),
      Media(3L, "audio", Array[Byte]('R', 'I', 'F', 'F', 1, 2, 3)), // truncated magic
      Media(4L, "text", "not audio".getBytes("UTF-8"))).toDS()
    val out = Multimodal.extractWavMeta(ds).collect().sortBy(_.media_id)
    assert(out(0).channels === 1 && out(0).sample_rate === 8000 &&
      out(0).bits_per_sample === 16 && out(0).n_frames === 4000L &&
      out(0).duration_ms === 500L)
    assert(out(1).channels === 2 && out(1).sample_rate === 44100 &&
      out(1).n_frames === 44100L && out(1).duration_ms === 1000L)
    // poison + magic-miss rows: zero audio fields, payload identity kept
    Seq(out(2), out(3)).foreach { m =>
      assert(m.channels === 0 && m.sample_rate === 0 && m.n_frames === 0L &&
        m.duration_ms === 0L)
      assert(m.n_bytes > 0 && m.checksum ===
        Multimodal.decodeStub(Media(m.media_id, m.modality,
          ds.collect().find(_.media_id == m.media_id).get.bytes)).checksum)
    }
  }

  test("MP4 codec: generated ISO-BMFF header decodes brand/timescale/duration; mdat skipped by size") {
    import spark.implicits._
    def box(tpe: String, payload: Array[Byte]): Array[Byte] = {
      val bb = java.nio.ByteBuffer.allocate(8 + payload.length)
        .order(java.nio.ByteOrder.BIG_ENDIAN)
      bb.putInt(8 + payload.length).put(tpe.getBytes("US-ASCII")).put(payload)
      bb.array()
    }
    def mvhdV0(timescale: Int, duration: Int): Array[Byte] = {
      val p = java.nio.ByteBuffer.allocate(100).order(java.nio.ByteOrder.BIG_ENDIAN)
      p.putInt(0)                 // version 0 + flags
        .putInt(1).putInt(2)      // creation / modification
        .putInt(timescale).putInt(duration)
      box("mvhd", p.array())      // rest (rate/volume/matrix/…) zero-padded
    }
    def mp4(timescale: Int, duration: Int): Array[Byte] = {
      val ftyp = box("ftyp", "isommp42".getBytes("US-ASCII")) // brand + compat
      val moov = box("moov", mvhdV0(timescale, duration))
      val mdat = box("mdat", Array.fill[Byte](256)(7))
      ftyp ++ mdat ++ moov // moov AFTER mdat — the walk must skip by size
    }
    val ds = Seq(
      Media(1L, "video", mp4(timescale = 1000, duration = 2500)),
      Media(2L, "video", mp4(timescale = 90000, duration = 450000)),
      Media(3L, "video", Array[Byte](0, 0, 0, 8, 'f', 't', 'y', 'p')), // magic, no moov
      Media(4L, "text", "not a video".getBytes("UTF-8"))).toDS()
    val out = Multimodal.extractMp4Meta(ds).collect().sortBy(_.media_id)
    assert(out(0).brand === "isom" && out(0).timescale === 1000 &&
      out(0).duration_units === 2500L && out(0).duration_ms === 2500L)
    assert(out(1).timescale === 90000 && out(1).duration_ms === 5000L)
    assert(out(2).brand === "" && out(2).timescale === 0 && out(2).duration_ms === 0L)
    assert(out(3).brand === "" && out(3).duration_ms === 0L)
    out.foreach(m => assert(m.checksum === Multimodal.decodeStub(
      Media(m.media_id, m.modality,
        ds.collect().find(_.media_id == m.media_id).get.bytes)).checksum))
  }

  test("codec walks survive malformed size fields: no hang, no throw, zero fields (review regression)") {
    // WAV with a chunk size of 0xFFFFFFF8: the truncated step would be
    // 0 (infinite loop) — the walk must END instead
    val wavBad = java.nio.ByteBuffer.allocate(32)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      .put("RIFF".getBytes("US-ASCII")).putInt(24)
      .put("WAVE".getBytes("US-ASCII"))
      .put("fmt ".getBytes("US-ASCII")).putInt(0xFFFFFFF8)
      .putInt(0).putInt(0).putInt(0).array()
    val w = Multimodal.WavCodec.decode(Media(1L, "audio", wavBad))
    assert(w.channels === 0 && w.sample_rate === 0 && w.duration_ms === 0L)

    // fmt chunk declaring size 8 (< the 16 bytes PCM fmt needs) followed
    // by a data chunk: the fields must poison to zero, not be read from
    // the NEXT chunk's bytes (round-12 ADVICE regression)
    val wavShortFmt = java.nio.ByteBuffer.allocate(44)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      .put("RIFF".getBytes("US-ASCII")).putInt(36)
      .put("WAVE".getBytes("US-ASCII"))
      .put("fmt ".getBytes("US-ASCII")).putInt(8)
      .putInt(0x01020304).putInt(0x05060708) // 8-byte truncated fmt body
      .put("data".getBytes("US-ASCII")).putInt(4)
      .putInt(0x41424344).array()
    val ws = Multimodal.WavCodec.decode(Media(9L, "audio", wavShortFmt))
    assert(ws.channels === 0 && ws.sample_rate === 0 &&
      ws.bits_per_sample === 0 && ws.n_frames === 0L && ws.duration_ms === 0L)

    // MP4 with a 64-bit largesize of 2^32: the truncated step would be
    // 0 (infinite loop); and a top-level size of 0x80000000: the
    // truncated step would be negative (index crash)
    def mp4Bad(hi: Int, lo: Int): Array[Byte] =
      java.nio.ByteBuffer.allocate(32).order(java.nio.ByteOrder.BIG_ENDIAN)
        .putInt(16).put("ftyp".getBytes("US-ASCII"))
        .put("isomisom".getBytes("US-ASCII"))
        .putInt(1).put("mdat".getBytes("US-ASCII")) // size=1 → largesize
        .putInt(hi).putInt(lo).array()
    val m1 = Multimodal.Mp4Codec.decode(Media(2L, "video", mp4Bad(1, 0))) // 2^32
    assert(m1.brand === "isom" && m1.timescale === 0 && m1.duration_ms === 0L)
    val neg = java.nio.ByteBuffer.allocate(24).order(java.nio.ByteOrder.BIG_ENDIAN)
      .putInt(16).put("ftyp".getBytes("US-ASCII"))
      .put("isomisom".getBytes("US-ASCII"))
      .putInt(0x80000000).put("mdat".getBytes("US-ASCII")).array()
    val m2 = Multimodal.Mp4Codec.decode(Media(3L, "video", neg))
    assert(m2.timescale === 0 && m2.duration_ms === 0L)
    // a moov CHILD with a backwards size must not stall the inner walk
    val childBad = {
      val mvhdBroken = java.nio.ByteBuffer.allocate(8)
        .order(java.nio.ByteOrder.BIG_ENDIAN)
        .putInt(0xFFFFFFF8).put("mvhd".getBytes("US-ASCII")).array()
      val bb = java.nio.ByteBuffer.allocate(16 + 8 + mvhdBroken.length)
        .order(java.nio.ByteOrder.BIG_ENDIAN)
      bb.putInt(16).put("ftyp".getBytes("US-ASCII"))
        .put("isomisom".getBytes("US-ASCII"))
        .putInt(8 + mvhdBroken.length).put("moov".getBytes("US-ASCII"))
        .put(mvhdBroken).array()
    }
    val m3 = Multimodal.Mp4Codec.decode(Media(4L, "video", childBad))
    assert(m3.timescale === 0 && m3.duration_ms === 0L)
  }
}
