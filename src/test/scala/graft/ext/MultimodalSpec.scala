package graft.ext

import org.apache.spark.sql.SparkSession

import graft.SparkSpec

class MultimodalSpec extends SparkSpec {
  implicit lazy val s: SparkSession = spark
  import s.implicits._

  private lazy val docs = Seq((0L, "abc"), (1L, "a much longer payload here")).toDF("doc_id", "text")

  test("metadata: byte length and position-weighted header checksum") {
    val m = Multimodal.metadata(docs, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(m(0L)._1 == 3L)
    // 'a'*1 + 'b'*2 + 'c'*3 = 97 + 196 + 297
    assert(m(0L)._2 == 97 + 2 * 98 + 3 * 99)
    assert(m(1L)._1 == 26L) // full byte length even though header stops at 16
  }

  test("metadata works with a non-default text column name (ADVICE r2)") {
    val renamed = docs.withColumnRenamed("text", "body")
    val m = Multimodal.metadata(renamed, "doc_id", "body")
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(m(0L) == (3L, 97 + 2 * 98 + 3 * 99))
  }

  test("sampleFrames: fixed windows, stride selection, short docs dropped") {
    val d = Seq((0L, "abcdefgh"), (1L, "x")).toDF("doc_id", "text")
    val f = Multimodal.sampleFrames(d, "doc_id", "text", frameChars = 2, stride = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1),
        new String(r.getAs[Array[Byte]](2), "UTF-8")))
    // 4 frames ab|cd|ef|gh, every 2nd kept; doc 1 is shorter than a frame
    assert(f.toSet == Set((0L, 0L, "ab"), (0L, 2L, "ef")))
    // sampled frames feed the decoder seam unchanged
    val feats = Multimodal.decodeFeatures(
      Multimodal.sampleFrames(d, "doc_id", "text", 2, 2), "doc_id", "frame")
      .collect()
    assert(feats.length == 2 && feats.forall(_.n_bytes == 2L))
  }

  test("plantedPng → imageStats: REAL ImageIO encode/decode round-trip") {
    val ids = Seq(0L, 1L, 7L, 12L, 90L).toDF("doc_id")
    val stats = Multimodal.imageStats(
      Multimodal.withPngPayload(ids, "doc_id"), "doc_id", "payload")
      .collect().map(x => x.doc_id -> x).toMap
    assert(stats.size == 5)
    ids.as[Long].collect().foreach { id =>
      val w = Multimodal.plantedWidth(id); val h = Multimodal.plantedHeight(id)
      val exp = (for (x <- 0 until w; y <- 0 until h) yield (
        Math.floorMod(id + 31L * x + 17L * y, 256L),
        Math.floorMod(2L * id + 13L * x + 7L * y, 256L),
        Math.floorMod(3L * id + 5L * x + 23L * y, 256L)))
      val st = stats(id)
      assert(st.width == w && st.height == h && st.n_pixels == w.toLong * h)
      assert(st.r_sum == exp.map(_._1).sum)
      assert(st.g_sum == exp.map(_._2).sum)
      assert(st.b_sum == exp.map(_._3).sum)
    }
  }

  test("resizeStats: nearest-neighbor thumbnail sums match the closed form") {
    val ids = Seq(5L, 17L)
    val d = ids.toDF("doc_id")
    val got = Multimodal.resizeStats(
        Multimodal.withPngPayload(d, "doc_id"), "doc_id", "payload",
        tw = 8, th = 6)
      .collect().map(r => r.doc_id -> r).toMap
    for (id <- ids) {
      val w = Multimodal.plantedWidth(id)
      val h = Multimodal.plantedHeight(id)
      var rs = 0L; var gs = 0L; var bs = 0L
      for (j <- 0 until 6; i <- 0 until 8) {
        val x = i * w / 8; val y = j * h / 6
        rs += Math.floorMod(id + 31L * x + 17L * y, 256L)
        gs += Math.floorMod(2L * id + 13L * x + 7L * y, 256L)
        bs += Math.floorMod(3L * id + 5L * x + 23L * y, 256L)
      }
      val r = got(id)
      assert((r.src_w, r.src_h, r.dst_w, r.dst_h) ===
        ((w.toLong, h.toLong, 8L, 6L)))
      assert((r.r_sum, r.g_sum, r.b_sum) === ((rs, gs, bs)), s"doc $id")
    }
  }

  test("plantedPng bytes are genuine PNG; ImageIoDecoder features match") {
    val png = Multimodal.plantedPng(3L)
    // PNG magic: 89 50 4E 47 0D 0A 1A 0A
    assert((png(0) & 0xff) == 0x89 && png(1) == 'P' && png(2) == 'N' && png(3) == 'G')
    val f = new Multimodal.ImageIoDecoder().decode(png)
    assert(f.length == 5)
    assert(f(0) == Multimodal.plantedWidth(3L).toFloat)
    assert(f(1) == Multimodal.plantedHeight(3L).toFloat)
    // corrupt blob → zero vector, not a crash
    val junk = new Multimodal.ImageIoDecoder().decode(Array[Byte](1, 2, 3))
    assert(junk.toSeq == Seq(0f, 0f, 0f, 0f, 0f))
  }

  test("imageStats drops unparseable payloads (corrupt-blob tolerance)") {
    val mixed = Seq((5L, Multimodal.plantedPng(5L)),
      (6L, Array[Byte](9, 9, 9))).toDF("doc_id", "payload")
    val out = Multimodal.imageStats(mixed, "doc_id", "payload").collect()
    assert(out.map(_.doc_id).toSeq == Seq(5L))
  }

  test("audioStats reads back exactly the planted WAV amplitudes") {
    val ids = Seq(0L, 1L, 7L, 96L, 97L).toDF("doc_id")
    val stats = Multimodal.audioStats(
      Multimodal.withWavPayload(ids, "doc_id"), "doc_id", "payload")
      .collect().map(x => x.doc_id -> x).toMap
    assert(stats.size == 5)
    ids.as[Long].collect().foreach { id =>
      val n = Multimodal.plantedSampleCount(id)
      val amps = (0 until n).map(i => Multimodal.plantedSample(id, i).toLong)
      val st = stats(id)
      assert(st.n_samples == n.toLong)
      assert(st.sample_rate == 8000L && st.n_channels == 1L)
      assert(st.sum_amp == amps.sum)
      assert(st.sum_abs == amps.map(Math.abs).sum)
      assert(st.peak_abs == amps.map(Math.abs).max)
    }
  }

  test("plantedWav bytes are a genuine RIFF/WAVE container") {
    val wav = Multimodal.plantedWav(5L)
    assert(wav(0) == 'R' && wav(1) == 'I' && wav(2) == 'F' && wav(3) == 'F')
    assert(wav(8) == 'W' && wav(9) == 'A' && wav(10) == 'V' && wav(11) == 'E')
  }

  test("audioStats drops unparseable payloads (corrupt-blob tolerance)") {
    val mixed = Seq((5L, Multimodal.plantedWav(5L)),
      (6L, Array[Byte](9, 9, 9))).toDF("doc_id", "payload")
    val out = Multimodal.audioStats(mixed, "doc_id", "payload").collect()
    assert(out.map(_.doc_id).toSeq == Seq(5L))
  }

  test("dHashWords: brightness-shift tolerance and cross-image distance") {
    def hashOf(bytes: Array[Byte]) = Multimodal.dHashWords(
      javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes)))
    def hamming(a: (Long, Long), b: (Long, Long)) =
      java.lang.Long.bitCount(a._1 ^ b._1) + java.lang.Long.bitCount(a._2 ^ b._2)
    // group 0, deltas 0 and 3: same base image, red channel shifted —
    // the uniform shift preserves neighbor comparisons except at
    // mod-256 wrap pixels, so the hash moves by at most a few bits
    val base = hashOf(Multimodal.plantedPngGrouped(0L, 25))
    val shifted = hashOf(Multimodal.plantedPngGrouped(3L, 25))
    assert(hamming(base, shifted) <= 6, hamming(base, shifted))
    // a different group's image is a different hash (far past any cut)
    val other = hashOf(Multimodal.plantedPngGrouped(60L, 25))
    assert(hamming(base, other) > 6, hamming(base, other))
    // identical payloads hash identically
    assert(hashOf(Multimodal.plantedPngGrouped(1L, 25)) ==
      hashOf(Multimodal.plantedPngGrouped(1L, 25)))
  }

  test("imageDHash + phashDups: banded join finds the planted variants") {
    val ids = ((0L to 4L) ++ (50L to 54L)).toDF("doc_id")
    val hashes = Multimodal.imageDHash(
      Multimodal.withGroupedPngPayload(ids, "doc_id", 25),
      "doc_id", "payload").localCheckpoint()
    assert(hashes.count() == 10)
    val pairs = Multimodal.phashDups(hashes, maxHamming = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    // exact duplicates of the hash must be found at hamming 0: compute
    // the expected set independently from the hash values themselves
    val hv = hashes.collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2)))
    val expected = (for {
      (i, hi) <- hv; (j, hj) <- hv if i < j
      d = java.lang.Long.bitCount(hi._1 ^ hj._1) +
        java.lang.Long.bitCount(hi._2 ^ hj._2) if d <= 3
    } yield (i, j) -> d.toLong).toMap
    assert(pairs == expected, s"got $pairs expected $expected")
    // the planted groups actually produce matches (non-vacuous fixture)
    assert(expected.nonEmpty)
    // and no cross-group pair sneaks under the cut in this sample
    assert(expected.keys.forall { case (a, b) => a / 25 == b / 25 })
  }

  test("phashDups maxBucket drops hot-bucket candidates, keeps the rest") {
    val ids = (0L to 199L).toDF("doc_id") // 8 groups of 25
    val hashes = Multimodal.imageDHash(
      Multimodal.withGroupedPngPayload(ids, "doc_id", 25),
      "doc_id", "payload").localCheckpoint()
    val uncapped = Multimodal.phashDups(hashes, 3)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // expected capped set, computed independently from the hash values:
    // a pair survives iff hamming <= 3 AND at least one AGREEING band
    // sits in a bucket within the cap
    val cap = 60L
    val hv = hashes.collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2)))
    def bandsOf(lo: Long, hi: Long) = Seq(
      0 -> (lo & 0xffffL), 1 -> ((lo >> 16) & 0xffffL),
      2 -> (hi & 0xffffL), 3 -> ((hi >> 16) & 0xffffL))
    val occ = hv.flatMap { case (_, (lo, hi)) => bandsOf(lo, hi) }
      .groupBy(identity).view.mapValues(_.size.toLong).toMap
    val expected = (for {
      (i, hi0) <- hv; (j, hj) <- hv if i < j
      d = java.lang.Long.bitCount(hi0._1 ^ hj._1) +
        java.lang.Long.bitCount(hi0._2 ^ hj._2) if d <= 3
      shared = bandsOf(hi0._1, hi0._2).toSet
        .intersect(bandsOf(hj._1, hj._2).toSet)
      if shared.exists(occ(_) <= cap)
    } yield (i, j)).toSet
    val capped = Multimodal.phashDups(hashes, 3, maxBucket = Some(cap))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(capped == expected, s"capped=${capped.size} expected=${expected.size}")
    assert(capped.subsetOf(uncapped))
    // the fixture's within-group pairs survive this cap (non-vacuous)
    assert(capped.nonEmpty)
  }

  test("decodeFeatures: partition-batched stub decoder, stable output") {
    val f = Multimodal.decodeFeatures(
      Multimodal.withPayload(docs, "text"), "doc_id", "payload")
      .collect().map(x => x.doc_id -> x).toMap
    assert(f(0L).n_bytes == 3L)
    assert(f(0L).feature.length == 8)
    // deterministic: same input → same features
    val again = Multimodal.decodeFeatures(
      Multimodal.withPayload(docs, "text"), "doc_id", "payload")
      .collect().map(x => x.doc_id -> x.feature.toSeq).toMap
    assert(again(1L) == f(1L).feature.toSeq)
  }
}
