package graft

import graft.operators.Multimodal

class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  lazy val media = Seq(
    (1L, "tiny payload"),
    (2L, "a much longer payload that stands in for an encoded image blob with many bytes"),
    (3L, "third")
  ).toDF("media_id", "payload")

  test("blob wrap preserves bytes; decode emits deterministic metadata") {
    val blobs = Multimodal.asBlobs(media, "media_id", "payload", "image")
    val metas = Multimodal.decodeAll(blobs).collect().sortBy(_.media_id)
    assert(metas.map(_.media_id).toSeq === Seq(1L, 2L, 3L))
    assert(metas.forall(_.media_type == "image"))
    assert(metas(0).byte_len === "tiny payload".getBytes("UTF-8").length.toLong)
    // md5 of the payload bytes, hex-encoded
    val expectMd5 = java.security.MessageDigest.getInstance("MD5")
      .digest("tiny payload".getBytes("UTF-8")).map("%02x".format(_)).mkString
    assert(metas(0).md5_hex === expectMd5)
    // stub dimensions are bounded and stable across runs
    metas.foreach { m =>
      assert(m.width >= 16 && m.width < 2048)
      assert(m.height >= 16 && m.height < 2048)
      assert(m.channels >= 1 && m.channels <= 3)
    }
    val again = Multimodal.decodeAll(blobs).collect().sortBy(_.media_id)
    assert(again.map(m => (m.width, m.height, m.channels)).toSeq ===
      metas.map(m => (m.width, m.height, m.channels)).toSeq)
  }

  test("ImageIoDecoder: REAL PNG and JPEG fixtures decode to exact pixel geometry through the Spark path") {
    import java.awt.image.BufferedImage
    import javax.imageio.ImageIO
    // render real images in-test (the container ships no image files):
    // an RGB 37x23 PNG, a grayscale 64x48 PNG, an RGB 120x80 JPEG
    def bytesOf(w: Int, h: Int, imgType: Int, fmt: String): Array[Byte] = {
      val img = new BufferedImage(w, h, imgType)
      for (x <- 0 until w; y <- 0 until h)
        img.setRGB(x, y, (x * 31 + y * 17) & 0xFFFFFF)
      val bos = new java.io.ByteArrayOutputStream()
      assert(ImageIO.write(img, fmt, bos), s"no $fmt writer on this JVM")
      bos.toByteArray
    }
    val rows = Seq(
      (1L, "image/png", bytesOf(37, 23, BufferedImage.TYPE_INT_RGB, "png"), 37L, 23L, 3L),
      (2L, "image/png", bytesOf(64, 48, BufferedImage.TYPE_BYTE_GRAY, "png"), 64L, 48L, 1L),
      (3L, "image/jpeg", bytesOf(120, 80, BufferedImage.TYPE_INT_RGB, "jpg"), 120L, 80L, 3L))
    val blobs = spark.createDataset(
      rows.map { case (id, t, b, _, _, _) => Multimodal.MediaBlob(id, t, b) })(
      org.apache.spark.sql.Encoders.product[Multimodal.MediaBlob])
    val metas = Multimodal.decodeAll(blobs, Multimodal.ImageIoDecoder)
      .collect().sortBy(_.media_id)
    rows.zip(metas).foreach { case ((id, t, b, w, h, c), m) =>
      assert(m.media_id === id)
      assert((m.width, m.height, m.channels) === ((w, h, c)),
        s"real decode geometry wrong for media_id=$id ($t)")
      assert(m.byte_len === b.length.toLong)
    }
    // the dispatcher routes image types to the real decoder and
    // everything else to the stub
    val mixed = spark.createDataset(Seq(
      Multimodal.MediaBlob(10L, "image/png", rows.head._3),
      Multimodal.MediaBlob(11L, "video/mp4", "not really video".getBytes("UTF-8"))))(
      org.apache.spark.sql.Encoders.product[Multimodal.MediaBlob])
    val dm = Multimodal.decodeAll(mixed, Multimodal.dispatchDecoder())
      .collect().sortBy(_.media_id)
    assert((dm(0).width, dm(0).height) === ((37L, 23L)))
    assert(dm(1).width === Multimodal.StubDecoder.decode(
      Multimodal.MediaBlob(11L, "video/mp4", "not really video".getBytes("UTF-8"))).width)
    // corrupt image bytes fail LOUDLY, never silently as fake geometry
    val bad = Multimodal.MediaBlob(12L, "image/png", Array[Byte](1, 2, 3))
    intercept[IllegalArgumentException] { Multimodal.ImageIoDecoder.decode(bad) }
  }

  test("stub embedding: deterministic, dim-length, bounded, feeds integer cosine") {
    val blobs = Multimodal.asBlobs(media, "media_id", "payload", "image")
    val embs = Multimodal.embedAll(blobs, dim = 16).collect().sortBy(_.media_id)
    assert(embs.length === media.count())
    embs.foreach { e =>
      assert(e.embedding.length === 16)
      assert(e.embedding.forall(v => v >= -1000 && v <= 1000))
    }
    val again = Multimodal.embedAll(blobs, dim = 16).collect().sortBy(_.media_id)
    assert(again.map(_.embedding).toSeq === embs.map(_.embedding).toSeq)
    // a model: hash60(md5hex:d) % 2001 - 1000
    val md5 = java.security.MessageDigest.getInstance("MD5")
      .digest("tiny payload".getBytes("UTF-8")).map("%02x".format(_)).mkString
    val expect0 = graft.expressions.MinHashKernel.hash60(s"$md5:0") % 2001L - 1000L
    assert(embs.find(_.media_id == 1L).get.embedding.head === expect0)
  }

  test("Embedder plug point: a custom encoder drops in through embedAll unchanged") {
    val blobs = Multimodal.asBlobs(media, "media_id", "payload", "image")
    val out = Multimodal.embedAll(blobs, ByteStatsEmbedder(4)).collect().sortBy(_.media_id)
    assert(out.length === media.count())
    assert(out.find(_.media_id == 1L).get.embedding ===
      Seq("tiny payload".length.toLong, 't'.toLong, 0L, 0L))
    // the dim-overload is exactly the stub implementation — graded
    // queries bind the seam without naming it
    val viaTrait = Multimodal.embedAll(blobs, Multimodal.StubEmbedder(16))
      .collect().sortBy(_.media_id).map(_.embedding).toSeq
    val viaDim = Multimodal.embedAll(blobs, dim = 16)
      .collect().sortBy(_.media_id).map(_.embedding).toSeq
    assert(viaTrait === viaDim)
  }

  test("frame sampling: one frame per stride, offsets correct") {
    val frames = Multimodal.sampleFrames(media, "media_id", "payload", stride = 10)
      .orderBy("media_id", "frame_no").collect()
    val byId = frames.groupBy(_.getAs[Long]("media_id"))
    assert(byId(1L).length === 2)  // 12 bytes -> frames at 0, 10
    assert(byId(1L).map(_.getAs[Long]("byte_offset")).toSeq === Seq(0L, 10L))
    assert(byId(3L).length === 1)  // 5 bytes -> frame at 0
    val longLen = "a much longer payload that stands in for an encoded image blob with many bytes".length
    assert(byId(2L).length === (longLen - 1) / 10 + 1)
  }

  test("resize: aspect-preserving fit — long side hits the target box, scales consistent") {
    import Multimodal.{MediaMeta, StubResizer}
    // landscape: width is the long side
    val land = StubResizer.resize(
      MediaMeta(1L, "image", 100L, "deadbeef", width = 1024L, height = 256L, channels = 3L), 256L)
    assert(land.dst_w === 256L && land.dst_h === 64L)
    assert(land.scale_x_ppm === 250000L && land.scale_y_ppm === 250000L)
    // portrait: height is the long side; other side floor-scales
    val port = StubResizer.resize(
      MediaMeta(2L, "image", 100L, "deadbeef", width = 300L, height = 2000L, channels = 3L), 256L)
    assert(port.dst_h === 256L && port.dst_w === 300L * 256L / 2000L)
    // square maps to the full box; resized digest is deterministic
    val sq1 = StubResizer.resize(
      MediaMeta(3L, "image", 9L, "cafe", 500L, 500L, 1L), 256L)
    val sq2 = StubResizer.resize(
      MediaMeta(3L, "image", 9L, "cafe", 500L, 500L, 1L), 256L)
    assert(sq1.dst_w === 256L && sq1.dst_h === 256L)
    assert(sq1.resized_md5 === sq2.resized_md5 && sq1.resized_md5.length === 32)
  }

  test("audio windows: hop spacing, clipped tail, full byte coverage with overlap") {
    import spark.implicits._
    // 250-byte payload, width 100 / hop 40: windows start at
    // 0,40,...,240 (7 windows); the last three clip (90, 50, 10)
    val df = Seq((1L, "x" * 250), (2L, "")).toDF("id", "payload")
    val out = graft.operators.Multimodal
      .audioWindows(df, "id", "payload", width = 100, hop = 40)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(!out.exists(_._1 == 2L)) // empty payload: no windows
    val w1 = out.filter(_._1 == 1L).sortBy(_._2)
    assert(w1.map(_._3).toSeq === Seq(0L, 40L, 80L, 120L, 160L, 200L, 240L))
    assert(w1.map(_._4).toSeq === Seq(100L, 100L, 100L, 100L, 90L, 50L, 10L))
    // every byte is covered by at least one window (start <= b < start+len)
    val covered = w1.flatMap(w => w._3 until (w._3 + w._4)).toSet
    assert(covered === (0L until 250L).toSet)
  }

  test("syntheticPng: real javax.imageio decode reproduces generator geometry") {
    for (id <- 0L to 60L) {
      val bytes = Multimodal.syntheticPng(id)
      // a real PNG, not a stub: magic bytes present
      assert((bytes.take(8).map(_ & 0xFF).toSeq) ===
        Seq(0x89, 0x50, 0x4E, 0x47, 0x0D, 0x0A, 0x1A, 0x0A), s"id=$id not a PNG")
      assert(bytes.toSeq === Multimodal.syntheticPng(id).toSeq) // deterministic
      val meta = Multimodal.ImageIoDecoder.decode(
        Multimodal.MediaBlob(id, "image/png", bytes))
      assert(meta.width === 8 + id % 16, s"id=$id width")
      assert(meta.height === 8 + (id / 16) % 16, s"id=$id height")
      val wantBands = (id % 3) match { case 0 => 3L; case 1 => 1L; case _ => 4L }
      assert(meta.channels === wantBands, s"id=$id channels")
    }
    // dispatch routes image/png to the REAL decoder: stub geometry differs
    val b = Multimodal.MediaBlob(7L, "image/png", Multimodal.syntheticPng(7L))
    assert(Multimodal.dispatchDecoder().decode(b) ===
      Multimodal.ImageIoDecoder.decode(b))
  }

  /** THE [[Multimodal.Embedder]] DROP-IN CONTRACT HARNESS: everything a
    * real encoder must satisfy to replace [[Multimodal.StubEmbedder]]
    * without touching any graded query. Run it against the new
    * implementation with ITS OWN pinned golden vectors (blob bytes →
    * exact expected embedding, captured once from the reference
    * encoder) — the graded queries bind the seam only through
    * [[Multimodal.embedAll]], so a green contract here is the whole
    * verification.
    */
  private def verifyEmbedderContract(
      e: Multimodal.Embedder,
      goldens: Seq[(Multimodal.MediaBlob, Seq[Long])]): Unit = {
    val blobDs = spark.createDataset(goldens.map(_._1))(
      org.apache.spark.sql.Encoders.product[Multimodal.MediaBlob])
    // 1. golden vectors: exact blob→vector pin, THROUGH the Spark seam
    //    (embedAll's mapPartitions), not a driver-side call
    val got = Multimodal.embedAll(blobDs, e).collect()
      .map(r => r.media_id -> r.embedding).toMap
    for ((blob, want) <- goldens)
      assert(got(blob.media_id) === want,
        s"golden vector mismatch for media_id=${blob.media_id}")
    // 2. fixed dim, integer grid
    assert(got.values.forall(_.length === e.dim), "ragged embedding dims")
    // 3. deterministic across re-runs (retried tasks must agree)
    val again = Multimodal.embedAll(blobDs, e).collect()
      .map(r => r.media_id -> r.embedding).toMap
    assert(again === got, "embedder must be a pure function of the blob")
    // 4. the ANN bridge consumes the output unchanged: integer
    //    self-cosine of every vector is exactly 1.0 (n2 > 0 required)
    val emb = Multimodal.embedAll(blobDs, e).toDF()
      .withColumn("n2", graft.operators.Similarity.idot($"embedding", $"embedding"))
    assert(emb.filter($"n2" <= 0L).count() === 0L,
      "zero vector: cosine undefined downstream")
    val selfCos = emb.withColumn("c", graft.operators.Similarity.cosine(
        graft.operators.Similarity.idot($"embedding", $"embedding"), $"n2", $"n2"))
      .select($"c").collect().map(_.getDouble(0))
    assert(selfCos.forall(_ == 1.0d), s"self-cosine must be 1.0: ${selfCos.toSeq}")
  }

  test("Embedder golden-vector contract: pinned stub vectors + a second implementation through the same harness") {
    import Multimodal.{MediaBlob, syntheticPng}
    // the pinned fixture for THIS repo's sandbox encoder: syntheticPng
    // blobs 0 and 1 → exact StubEmbedder(8) vectors. Any change to the
    // stub kernel (hash, modulus, digest) breaks these literals loudly.
    val stubGoldens = Seq(
      MediaBlob(0L, "image/png", syntheticPng(0L)) ->
        Seq(-142L, 484L, -957L, -368L, -25L, 609L, 131L, 820L),
      MediaBlob(1L, "image/png", syntheticPng(1L)) ->
        Seq(-709L, 404L, 841L, -345L, -603L, -293L, -678L, -298L))
    verifyEmbedderContract(Multimodal.StubEmbedder(8), stubGoldens)
    // a second (test-only) implementation through the SAME harness —
    // the shape a real ONNX/JNI encoder replacement follows: capture
    // its goldens once, run the contract, ship
    val bs = ByteStatsEmbedder(4)
    val blobs = Seq(
      MediaBlob(10L, "image/png", "tiny payload".getBytes("UTF-8")),
      MediaBlob(11L, "image/png", "another blob".getBytes("UTF-8")))
    val bsGoldens = Seq(
      blobs(0) -> Seq("tiny payload".length.toLong, 't'.toLong, 0L, 0L),
      blobs(1) -> Seq("another blob".length.toLong, 'a'.toLong, 0L, 0L))
    verifyEmbedderContract(bs, bsGoldens)
  }
}

/** A fake "real model" for the [[graft.operators.Multimodal.Embedder]]
  * seam test: embeds blob length + first byte — what an ONNX session
  * replacement looks like to the Spark-side plumbing. Top-level so the
  * task closure serializes (no suite outer reference).
  */
case class ByteStatsEmbedder(dim: Int) extends Multimodal.Embedder {
  def embed(b: Multimodal.MediaBlob): Multimodal.MediaEmbed =
    Multimodal.MediaEmbed(b.media_id, (0 until dim).map(d =>
      if (d == 0) b.content.length.toLong
      else if (d == 1 && b.content.nonEmpty) b.content.head.toLong
      else 0L))
}
