package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkSpecBase

class DedupSimilaritySpec extends SparkSpecBase {
  import spark.implicits._

  private val docs = Seq(
    (1L, "the quick brown fox jumps over the lazy dog near the river bank"),
    (2L, "the quick brown fox jumps over the lazy dog near the river bank"), // exact dup of 1
    (3L, "the quick brown fox jumps over the lazy dog near the green bank"), // near dup of 1
    (4L, "completely different words about spark catalyst shuffle exchange")
  ).toDF("doc_id", "text")

  test("Dedup.exact groups identical texts under one keeper") {
    val out = Dedup.exact(docs, col("doc_id"), col("text"))
    assert(out.count() == 3)
    val dup = out.filter(col("n_docs") === 2).head()
    assert(dup.getAs[Long]("keeper") == 1L)
  }

  test("Dedup.ngramJaccardPairs: exact dup pair has jaccard 1.0; near dup high") {
    val pairs = Dedup.ngramJaccardPairs(docs, "doc_id", col("text"),
      n = 3, minJaccard = 0.05).collect()
      .map(r => (r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b")) ->
        r.getAs[Double]("jaccard")).toMap
    assert(pairs((1L, 2L)) == 1.0)
    assert(pairs((1L, 3L)) > 0.5 && pairs((1L, 3L)) < 1.0)
    assert(!pairs.keySet.exists { case (a, b) => b == 4L || a == 4L })
  }

  test("ngramJaccardPairs prefix-filter path is bit-identical to the " +
    "posting-join path at J >= 0.4 (lossless by the prefix theorem)") {
    // real corpus, both thresholds that route to the prefix path; the
    // posting path is forced with a no-op df cap (cap >= any df leaves
    // postings untouched, so it computes the legacy full join exactly)
    val corpus = spark.read.parquet("/root/testdata/sf0.01/documents.parquet")
    for (t <- Seq(0.5, 0.8)) {
      val fast = Dedup.ngramJaccardPairs(corpus, "doc_id", col("text"),
        n = 3, minJaccard = t)
      val full = Dedup.ngramJaccardPairs(corpus, "doc_id", col("text"),
        n = 3, minJaccard = t, maxDocFreq = Some(Int.MaxValue))
      assert(fast.schema == full.schema, s"t=$t schemas differ")
      val extra = fast.exceptAll(full).count()
      val missing = full.exceptAll(fast).count()
      assert(extra == 0 && missing == 0,
        s"t=$t prefix path diverges: extra=$extra missing=$missing")
      assert(fast.count() > 0, s"t=$t degenerate test: no pairs at all")
    }
  }

  test("MinHash: identical docs share signatures; LSH finds the dup pairs") {
    val sigs = Dedup.minhashSignatures(docs, "doc_id", col("text"))
    val byId = sigs.collect()
      .map(r => r.getAs[Long]("doc_id") ->
        r.getAs[collection.Seq[Long]]("sig").toList).toMap
    assert(byId(1L) == byId(2L))
    assert(byId(1L) != byId(4L))
    // near-dup should agree on most minhash components
    val agree = byId(1L).zip(byId(3L)).count { case (x, y) => x == y }
    assert(agree >= 8, s"only $agree/16 components agree")
    val cands = Dedup.minhashLshCandidates(sigs, "doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(cands.contains((1L, 2L)))
  }

  test("AsOfJoin: latest preceding right row; null when none precedes") {
    val trades = Seq((1L, 10L, "t1"), (1L, 20L, "t2"), (2L, 5L, "t3"))
      .toDF("k", "t", "trade")
    val quotes = Seq((1L, 10L, 1.5), (1L, 15L, 2.5), (2L, 9L, 9.9))
      .toDF("k", "t", "px")
    val out = AsOfJoin.lastBefore(trades, quotes, "k", "t", "t", Seq("px"))
      .collect().map(r => r.getString(2) ->
        Option(r.get(3)).map(_.asInstanceOf[Double])).toMap
    assert(out("t1").contains(1.5)) // same-instant quote IS visible
    assert(out("t2").contains(2.5)) // latest of the two preceding
    assert(out("t3").isEmpty)       // no quote at or before t=5
  }

  test("AsOfJoin: matched row's NULL value stays NULL; NULL times never match") {
    val trades = Seq((1L, 20L, "t1"), (2L, 20L, "t2"))
      .toDF("k", "t", "trade")
    val quotes = Seq(
      (1L, Some(10L), Some(1.5)),
      (1L, Some(15L), None),        // matched row carries a NULL px
      (2L, None, Some(9.9)))        // NULL time: must never match
      .toDF("k", "t", "px")
    val out = AsOfJoin.lastBefore(trades, quotes, "k", "t", "t", Seq("px"))
      .collect().map(r => r.getString(2) ->
        Option(r.get(3)).map(_.asInstanceOf[Double])).toMap
    // as-of matches the t=15 row: its px is NULL and must NOT be
    // replaced by the older t=10 value
    assert(out("t1").isEmpty)
    assert(out("t2").isEmpty)
  }

  test("Components: chains collapse to the min id; clusters pick keepers") {
    // 1-2, 2-3 chain (diameter 2, needs >1 propagation round), 5-6 pair
    val edges = Seq((2L, 3L), (1L, 2L), (5L, 6L)).toDF("a", "b")
    val comp = Components.connected(edges, "a", "b").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(comp == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 5L -> 5L, 6L -> 5L))
    val cl = Components.clusters(edges, "a", "b").collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(cl == Map(1L -> (3L, 1L), 5L -> (2L, 5L)))
  }

  test("Components.bestKeepers: highest score wins, min id on ties") {
    val edges = Seq((2L, 3L), (1L, 2L), (5L, 6L)).toDF("a", "b")
    val scores = Seq((1L, 10L), (2L, 30L), (3L, 30L), (5L, 7L), (6L, 7L))
      .toDF("id", "len")
    val got = Components.bestKeepers(edges, "a", "b", scores, "id", "len")
      .collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3)))
      .toMap
    // cluster 1: docs 2 and 3 tie at 30 -> min id 2; cluster 5: tie -> 5
    assert(got == Map(1L -> (3L, 2L, 30L), 5L -> (2L, 5L, 7L)))
  }

  test("Components.memberWeights: 1/|cluster| per member, 1.0 singletons, " +
    "cluster weights sum to one distinct work each") {
    val edges = Seq((2L, 3L), (1L, 2L), (5L, 6L)).toDF("a", "b")
    val docs = (1L to 8L).toDF("doc_id") // 4,7,8 outside any cluster
    val got = Components.memberWeights(docs, "doc_id", edges, "a", "b")
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2)))
      .toMap
    assert(got(1L) == (3L, 1.0 / 3) && got(2L) == (3L, 1.0 / 3) &&
      got(3L) == (3L, 1.0 / 3))
    assert(got(5L) == (2L, 0.5) && got(6L) == (2L, 0.5))
    assert(Seq(4L, 7L, 8L).forall(got(_) == (1L, 1.0)))
    // the defining invariant: summed over any cluster the weight is
    // exactly 1 — each distinct work counts once in the sampled mix
    assert(math.abs(got.values.map(_._2).sum - 5.0) < 1e-12) // 2 clusters + 3 singletons
  }

  test("Split.assignByRepresentative: a cluster never straddles splits; " +
    "singletons match the plain per-id split") {
    val edges = Seq((2L, 3L), (1L, 2L), (5L, 6L)).toDF("a", "b")
    val splits = Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1)
    val docs = (1L to 2000L).toDF("doc_id")
    val comp = Components.connected(edges, "a", "b")
      .withColumnRenamed("id", "doc_id")
    val got = Split.assignByRepresentative(
      docs.join(comp, Seq("doc_id"), "left"),
      col("doc_id"), col("component"), splits)
    // every member of {1,2,3} and of {5,6} lands in ONE split
    val perCluster = got.filter(col("component").isNotNull)
      .groupBy("component").agg(countDistinct(col("split")).as("n"))
      .collect().map(_.getLong(1))
    assert(perCluster.nonEmpty && perCluster.forall(_ == 1L))
    // outside any cluster the assignment IS the plain per-id split
    val plain = Split.assign(docs, col("doc_id"), splits)
      .withColumnRenamed("split", "plain_split")
    val diverging = got.filter(col("component").isNull)
      .join(plain, "doc_id")
      .filter(col("split") =!= col("plain_split")).count()
    assert(diverging == 0)
  }

  test("Components: reliable checkpoint path matches; non-convergence throws") {
    val dir = java.nio.file.Files.createTempDirectory("graft-cc-ckpt")
      .toString
    // long chain: exercises several truncation rounds under RELIABLE
    // checkpointing (the executor-loss-survivable mode)
    // localThreshold = 0 forces the DISTRIBUTED loop (the default would
    // take the driver-local union-find fast path on a graph this small)
    val edges = (1L until 12L).map(i => (i, i + 1)).toDF("a", "b")
    val comp = Components.connected(edges, "a", "b",
        checkpointDir = Some(dir), localThreshold = 0).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(comp == (1L to 12L).map(_ -> 1L).toMap)
    // a diameter-24 chain cannot reach fixpoint in 1 round (3 props):
    // must throw, never silently return wrong components
    val long = (1L until 25L).map(i => (i, i + 1)).toDF("a", "b")
    intercept[IllegalStateException] {
      Components.connected(long, "a", "b", maxIters = 1,
        localThreshold = 0).collect()
    }
  }

  test("Split: proportional, repartition-stable, subset-invariant") {
    val ids = (1L to 2000L).toDF("id")
    val splits = Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1)
    val a = Split.assign(ids, col("id"), splits).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    // proportions within a few points of the weights at n=2000
    val counts = a.values.groupBy(identity).view.mapValues(_.size).toMap
    assert(math.abs(counts("train") - 1600) < 100, counts.toString)
    assert(math.abs(counts("val") - 200) < 60, counts.toString)
    // partitioning must not change assignment
    val b = Split.assign(ids.repartition(7), col("id"), splits).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(a == b)
    // a row keeps its split when the corpus grows (subset invariance)
    val sub = Split.assign((1L to 100L).toDF("id"), col("id"), splits)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    sub.foreach { case (id, s) => assert(a(id) == s) }
  }

  test("Int8 quantization: round-trip error bounded, ranking preserved") {
    import graft.functions.VectorFunctions._
    val vs = Seq(
      (0L, Array(0.9, -0.3, 0.05)), (1L, Array(0.85, -0.25, 0.1)),
      (2L, Array(-0.2, 0.95, 0.0)), (3L, Array(1.7, -2.0, 0.4)))
      .toDF("id", "v")
    val rt = vs.select(col("id"),
        col("v"), dequantizeInt8(quantizeInt8(col("v"))).as("q"))
      .collect()
    rt.foreach { r =>
      val orig = r.getSeq[Double](1)
      val q = r.getSeq[Double](2)
      orig.zip(q).foreach { case (o, d) =>
        // clamp to [-1,1], then per-component error <= 1/254
        val clamped = math.max(-1.0, math.min(1.0, o))
        assert(math.abs(clamped - d) <= 0.5 / 127 + 1e-12, s"$o -> $d")
      }
    }
    // nearest neighbour of 0 is still 1 after quantization
    val dq = vs.select(col("id"),
      dequantizeInt8(quantizeInt8(col("v"))).as("vec"))
    val q0 = dq.filter(col("id") === 0)
      .select(col("id").as("qid"), col("vec").as("qvec"))
    val top = Similarity.bruteForceTopK(q0, dq, 1).collect()
    assert(top.head.getLong(1) == 1L)
  }

  test("Winnowing: shared run >= n+w-1 tokens shares a fingerprint; " +
    "disjoint docs share none") {
    // n=3, w=4 → guarantee threshold n+w-1 = 6 common tokens
    val docs = Seq(
      (1L, "alpha beta gamma delta epsilon zeta eta theta"),
      (2L, "one two alpha beta gamma delta epsilon zeta nine"), // shares 7-run
      (3L, "red orange yellow green blue indigo violet"))
      .toDF("doc_id", "text")
    val fps = Fingerprint.winnowFingerprints(docs, "doc_id", col("text"))
      .collect().map(r => r.getLong(0) -> r.getString(1))
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    assert((fps(1L) intersect fps(2L)).nonEmpty,
      "a shared 7-token run must yield a shared fingerprint")
    assert((fps(1L) intersect fps(3L)).isEmpty)
    // identical text → identical fingerprint set, wherever it appears
    val shifted = Seq((9L, "padding words alpha beta gamma delta epsilon zeta eta theta"))
      .toDF("doc_id", "text")
    val fps9 = Fingerprint.winnowFingerprints(shifted, "doc_id", col("text"))
      .collect().map(_.getString(1)).toSet
    assert((fps(1L) intersect fps9).nonEmpty,
      "position independence: the same run elsewhere still shares")
  }

  test("SimHash: equal texts hash equal; near dups within small hamming") {
    val sh = Dedup.simhash64(docs, "doc_id", col("text")).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("simhash")).toMap
    assert(sh(1L) == sh(2L))
    assert(java.lang.Long.bitCount(sh(1L) ^ sh(3L)) <= 16)
    assert(java.lang.Long.bitCount(sh(1L) ^ sh(4L)) > 16)
  }

  private val vecs = Seq(
    (0L, Array(1.0, 0.0, 0.0)), (1L, Array(0.9, 0.1, 0.0)),
    (2L, Array(0.0, 1.0, 0.0)), (3L, Array(-1.0, 0.0, 0.0))
  ).toDF("id", "vec")

  test("Similarity.cosine: identity 1, orthogonal 0, opposite -1") {
    val q = vecs.select(col("id").as("qid"), col("vec").as("qvec"))
    val out = Similarity.bruteForceTopK(q.filter(col("qid") === 0), vecs, 3)
      .collect().map(r => r.getAs[Long]("id") ->
        (r.getAs[Double]("cosine"), r.getAs[Int]("rank"))).toMap
    assert(out(1L)._2 == 1) // nearest neighbour
    assert(math.abs(out(2L)._1) < 1e-12)
    assert(math.abs(out(3L)._1 + 1.0) < 1e-12)
  }

  test("Similarity.nearDupPairs finds only the close pair") {
    val out = Similarity.nearDupPairs(vecs, 0.9).collect()
    assert(out.map(r => (r.getLong(0), r.getLong(1))).toSet == Set((0L, 1L)))
  }

  test("nearDupPairsBlocked == brute force on real embeddings (exactness)") {
    // The blocked plan prunes cluster pairs by the triangle-inequality
    // bound, so its candidate set provably covers every pair >= tau;
    // this pins the end-to-end guarantee: identical (id_a, id_b) sets
    // AND bit-identical cosines against the brute-force cross product.
    val emb = graft.Tables.embeddings(spark, sf)
      .select(col("vec_id").as("id"),
        Similarity.asDouble(col("embedding")).as("vec"))
    def key(r: org.apache.spark.sql.Row) =
      (r.getLong(0), r.getLong(1), r.getDouble(2))
    val brute = Similarity.nearDupPairs(emb, 0.3).collect().map(key).toSet
    val blocked = Similarity.nearDupPairsBlocked(emb, 0.3, k = 8)
      .collect().map(key).toSet
    assert(brute.nonEmpty)
    assert(blocked == brute,
      s"blocked missed ${(brute -- blocked).take(5)} / extra ${(blocked -- brute).take(5)}")
  }

  test("LSH buckets: close vectors collide, opposite vectors do not") {
    val b = vecs.withColumn("bucket", Similarity.lshBucket(col("vec"), 4))
      .collect().map(r => r.getAs[Long]("id") -> r.getAs[Int]("bucket")).toMap
    assert(b(0L) == b(1L))
    assert(b(0L) != b(3L))
  }

  test("Multimodal: mapPartitions stub decode and frame sampling") {
    implicit val s = spark
    val media = Seq(
      Multimodal.MediaRow(1L, Array[Byte](1, 2, 3), "image"),
      Multimodal.MediaRow(2L, Array.fill[Byte](250)(7), "video"))
      .toDS()
    val meta = Multimodal.decode(media)
    val m = meta.collect().map(x => x.media_id -> x).toMap
    assert(m(1L).byte_len == 3 && m(1L).width == 4) // 3 % 640 + 1
    assert(m(2L).n_frames == 3) // 250/100 + 1
    assert(m(1L).feature.length == 4)
    val frames = Multimodal.sampleFrames(meta.toDF(), step = 2)
      .filter(col("media_id") === 2L).collect().map(_.getInt(1)).sorted
    assert(frames.toSeq == Seq(0, 2)) // frames 0..2 step 2
  }

  test("Multimodal: ImageIoDecoder decodes real PNG/JPEG/GIF/BMP bytes") {
    implicit val s = spark
    // encode through the JDK writers for every sniffable container
    def enc(fmt: String): Array[Byte] = {
      val img = new java.awt.image.BufferedImage(
        17, 9, java.awt.image.BufferedImage.TYPE_INT_RGB)
      val bos = new java.io.ByteArrayOutputStream()
      assert(javax.imageio.ImageIO.write(img, fmt, bos), s"no $fmt writer")
      bos.toByteArray
    }
    val media = Seq("png", "jpg", "gif", "bmp").zipWithIndex.map {
      case (fmt, i) => Multimodal.MediaRow(i.toLong, enc(fmt), "image")
    }.toDS()
    val m = Multimodal.decode(media, Multimodal.ImageIoDecoder)
      .collect().map(x => x.media_id -> x).toMap
    assert(m.values.forall(x => x.width == 17 && x.height == 9),
      "decoded dimensions must come from the actual raster")
    assert(m(0L).kind == "png" && m(1L).kind == "jpeg" &&
      m(2L).kind == "gif" && m(3L).kind == "bmp")
    // the deterministic fixture encoder round-trips through the decoder
    val rt = Multimodal.ImageIoDecoder.decode(
      Multimodal.MediaRow(9L, Multimodal.encodePng(33, 21, seed = 9L), "image"))
    assert(rt.width == 33 && rt.height == 21 && rt.kind == "png")
    assert(rt.feature.length == 4 && rt.feature.exists(_ > 0f),
      "luminance feature must reflect decoded pixels")
    // non-image bytes fail loudly, never fake dimensions
    intercept[IllegalArgumentException] {
      Multimodal.ImageIoDecoder.decode(
        Multimodal.MediaRow(10L, Array[Byte](1, 2, 3), "image"))
    }
  }

  test("Multimodal: WavCodec decodes real RIFF/WAV headers") {
    val bytes = Multimodal.WavCodec.encodeWav(
      nFrames = 441, sampleRate = 22050, seed = 5L)
    // RIFF magic proves a real container came out of the encoder
    assert(new String(bytes.take(4), "US-ASCII") == "RIFF")
    val m = Multimodal.WavCodec.decode(5L, bytes)
    assert(m.kind == "wave" && m.sample_rate == 22050 &&
      m.channels == 1 && m.n_frames == 441)
    assert(m.duration_ms == 441L * 1000 / 22050)
    intercept[IllegalArgumentException] {
      Multimodal.WavCodec.decode(6L, Array[Byte](9, 9, 9, 9))
    }
  }

  test("TextStats + LangId + Fingerprint semantics") {
    val df = Seq((1L, "The the THE of and xyzzy")).toDF("doc_id", "text")
    val ts = TextStats(df, col("text")).head()
    assert(ts.getAs[Long]("n_tokens") == 6)
    assert(ts.getAs[Long]("n_stopwords") == 5)
    val li = LangId(Seq((1L, "der und das ist"), (2L, "le et les est"))
      .toDF("doc_id", "text"), col("text"))
      .collect().map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("lang_pred")).toMap
    assert(li == Map(1L -> "de", 2L -> "fr"))
    // fingerprint collapses word order + repetition
    val fp = Seq((1L, "b a a c"), (2L, "c b a"), (3L, "c b d"))
      .toDF("doc_id", "text")
      .select(col("doc_id"), Fingerprint.bagFingerprint(col("text")).as("fp"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(fp(1L) == fp(2L) && fp(1L) != fp(3L))
  }
}
