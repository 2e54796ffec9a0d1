package graft.pipeline

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Dedup / ANN / text-stats operator tests: planted duplicates are
  * found, LSH candidates ⊇ verified near-dups, ANN-LSH recall vs brute
  * force, multimodal plumbing shape. */
class PipelineSpec extends SparkSpec {

  private def docsDf(texts: Seq[String]) = {
    import spark.implicits._
    texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("doc_id", "text")
  }

  private val base = "spark builds an inverted index with posting lists and block max scores"
  private val corpus: Seq[String] = Seq(
    base,                                                     // 0
    base,                                                     // 1 exact dup of 0
    base.replace("block max", "blockmax wand"),               // 2 near dup of 0
    "totally different text about training data pipelines at scale",  // 3
    "the quick brown fox jumps over the lazy dog every day",  // 4
    base + " plus a small tail")                              // 5 near dup of 0

  test("exact dedup finds planted exact duplicates") {
    val g = Dedup.exactDedup(docsDf(corpus)).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(g(1L) === 0L) // dup points at keeper
    assert(g(0L) === 0L)
    assert(g(3L) === 3L)
  }

  test("dedup verdict faces: 10^5 planted identical docs, NO per-signature Window") {
    import spark.implicits._
    // one text value dominating the corpus — the degenerate group that
    // breaks a Window-partitioned-by-signature plan (every row of the
    // group in one task); groupBy+join keeps per-task input bounded by
    // map-side partial aggregation
    val n = 100000
    val big = spark.range(n).select(col("id").as("doc_id"),
      when(col("id") % 10 === 0, concat(lit("unique-"), col("id").cast("string")))
        .otherwise(lit("the same boilerplate page body")).as("text"))
    val verdict = Dedup.exactDedup(big)
    val pe = verdict.queryExecution.executedPlan.toString
    assert(!pe.contains("Window"), s"per-signature Window in exactDedup plan:\n${pe.take(2000)}")
    val dupRows = verdict.filter(col("doc_id") =!= col("keep_id")).count()
    assert(dupRows === (n - n / 10 - 1).toLong) // all dominators except the keeper
    // signatureDedup: same corpus through the URP face — one survivor
    // for the dominating signature, every unique row kept
    val kept = Urp.signatureDedup(Seq("text"), "doc_id")(big)
    val pk = kept.queryExecution.executedPlan.toString
    assert(!pk.contains("Window"), s"per-signature Window in signatureDedup plan:\n${pk.take(2000)}")
    assert(kept.count() === (n / 10 + 1).toLong)
    assert(kept.filter(col("text") === "the same boilerplate page body")
      .select("doc_id").as[Long].collect().toSeq === Seq(1L)) // min key
  }

  test("ngram jaccard finds planted near-dups, skips unrelated") {
    val pairs = Dedup.ngramJaccardPairs(docsDf(corpus), n = 3, threshold = 0.4)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.contains((0L, 1L)))
    assert(pairs.contains((0L, 5L)))
    assert(!pairs.exists { case (a, b) => a == 3L || b == 3L })
  }

  test("minhash-LSH near-dups ⊆-verified and find planted dups") {
    val got = Dedup.minhashNearDups(docsDf(corpus), threshold = 0.4)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got.contains((0L, 1L)))
    assert(got.contains((0L, 5L)))
    // verification step guarantees: every reported pair has true
    // jaccard >= threshold (compare against exact pairs)
    val exact = Dedup.ngramJaccardPairs(docsDf(corpus), n = 3, threshold = 0.4)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got.subsetOf(exact))
  }

  test("simhash bucketing == exact pair set at recall-guaranteed distances") {
    val df = docsDf(corpus)
    val sh = Dedup.simhash(df).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(sh(0L) === sh(1L)) // identical text ⇒ identical hash
    // pigeonhole guarantee: at maxDist ≤ bands−1 the banded candidates
    // cover EVERY qualifying pair, so output == brute-force pair set
    for (maxDist <- Seq(0, 3, 7)) {
      val expected = (for {
        a <- sh.keys; b <- sh.keys; if a < b
        if java.lang.Long.bitCount(sh(a) ^ sh(b)) <= maxDist
      } yield (a, b)).toSet
      val got = Dedup.simhashNearDups(df, maxDist)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(got === expected, s"maxDist=$maxDist")
    }
    // distances past the band guarantee are rejected, not silently lossy
    assertThrows[IllegalArgumentException](Dedup.simhashNearDups(df, 18))
  }

  test("ANN: LSH recall vs brute force on real embeddings") {
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
      .select(col("vec_id"), col("embedding").cast("array<double>").as("embedding"))
    val q = emb.filter(col("vec_id") < 8)
      .select(col("vec_id").as("q_id"), col("embedding").as("q_embedding"))
    val brute = Ann.bruteTopK(emb, q, 5).collect()
      .map(r => (r.getLong(0), r.getLong(2))).toSet
    // rank 1 of each query must be the query itself (cosine=1)
    Ann.bruteTopK(emb, q, 5).collect().filter(_.getInt(1) == 1)
      .foreach(r => assert(r.getLong(0) === r.getLong(2)))
    val lsh = Ann.lshTopK(emb, q, 5, dim = 64, numPlanes = 4).collect()
      .map(r => (r.getLong(0), r.getLong(2))).toSet
    val recall = (brute intersect lsh).size.toDouble / brute.size
    assert(recall > 0.25, s"LSH recall $recall too low") // 4 planes, 1 probe
  }

  test("ANN: IVF recall vs brute force; full probe = exact; plan bounded") {
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
      .select(col("vec_id"), col("embedding").cast("array<double>").as("embedding"))
    val q = emb.filter(col("vec_id") < 8)
      .select(col("vec_id").as("q_id"), col("embedding").as("q_embedding"))
    val brute = Ann.bruteTopK(emb, q, 5).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2)))
    // probing EVERY list searches the whole corpus ⇒ identical to brute
    val full = Ann.ivfTopK(emb, q, 5, nList = 4, nProbe = 4).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2)))
    assert(full === brute)
    // nProbe=2 of 4: approximate but each query still finds itself, and
    // recall stays reasonable on real embeddings
    val ivf = Ann.ivfTopK(emb, q, 5, nList = 4, nProbe = 2).collect()
    ivf.filter(_.getInt(1) == 1).foreach(r => assert(r.getLong(0) === r.getLong(2)))
    val ivfSet = ivf.map(r => (r.getLong(0), r.getLong(2))).toSet
    val bruteSet = brute.map(t => (t._1, t._3)).toSet
    val recall = (bruteSet intersect ivfSet).size.toDouble / bruteSet.size
    assert(recall > 0.4, s"IVF recall $recall too low")
    // plan: bounded aggregator ranking, no Window over unbounded input
    val p = Ann.ivfTopK(emb, q, 5, nList = 4, nProbe = 2)
      .queryExecution.executedPlan.toString
    assert(!p.contains("Window"), s"Window in IVF plan:\n${p.take(2000)}")
    assert(p.contains("ObjectHashAggregate"), p.take(2000))
  }

  test("boundedSelfJoinPairs == naive self-join pairs (tiny cap forces splits)") {
    import spark.implicits._
    // random-ish buckets: 60 rows over 5 buckets, cap 4 ⇒ every bucket
    // triangle-splits; the emitted pair set must be EXACTLY the naive one
    val rows = (0 until 60).map(i => (i.toLong, (i * 7 % 5).toLong, s"p$i"))
    val df = rows.toDF("id", "bucket", "payload")
    val got = Skew.boundedSelfJoinPairs(df, Seq("bucket"), "id", cap = 4)
      .select(col("a.id"), col("b.id"), col("a.payload"), col("b.payload"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getString(3)))
    val expected = (for {
      (a, ba, _) <- rows; (b, bb, _) <- rows
      if ba == bb && a < b
    } yield (a, b, s"p$a", s"p$b")).toSet
    assert(got.toSet === expected)
    assert(got.length === expected.size, "each pair emitted exactly once")
  }

  test("planted degenerate bucket: capped LSH joins keep the full pair set") {
    // 200 identical docs all share every band bucket — uncapped this is
    // one quadratic task; with cap=16 it must still emit all C(200,2)
    // pairs (triangle split, nothing dropped), plus the distinct docs
    val planted = Seq.fill(200)(base) ++ corpus.drop(1)
    val df = docsDf(planted)
    val got = Dedup.minhashNearDups(df, threshold = 0.95, bucketCap = 16)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val identIds = (0 until 200).map(_.toLong) :+ 200L // index 200 = corpus(1) = base
    val expectedIdent = (for {
      a <- identIds; b <- identIds; if a < b
    } yield (a, b)).toSet
    assert(expectedIdent.subsetOf(got),
      s"missing ${(expectedIdent -- got).size} identical-doc pairs")
    // every reported pair really has jaccard ≥ 0.95 (identical shingles)
    assert(got.forall { case (a, b) =>
      expectedIdent.contains((a, b)) || a > 199L })
  }

  test("wide SimHash (multi-table permuted): exact pair set at maxDist 8") {
    val df = docsDf(corpus)
    val sh = Dedup.simhash(df).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    for (maxDist <- Seq(8, 12)) {
      val expected = (for {
        a <- sh.keys; b <- sh.keys; if a < b
        if java.lang.Long.bitCount(sh(a) ^ sh(b)) <= maxDist
      } yield (a, b)).toSet
      val got = Dedup.simhashNearDupsWide(df, maxDist, numBlocks = maxDist + 2)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(got === expected, s"maxDist=$maxDist")
    }
  }

  test("ANN top-k plan: bounded Aggregator, no Window over unbounded input") {
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
      .select(col("vec_id"), col("embedding").cast("array<double>").as("embedding"))
    val q = emb.filter(col("vec_id") < 8)
      .select(col("vec_id").as("q_id"), col("embedding").as("q_embedding"))
    for (df <- Seq(Ann.bruteTopK(emb, q, 5),
                   Ann.lshTopK(emb, q, 5, dim = 64, numPlanes = 4))) {
      val p = df.queryExecution.executedPlan.toString
      assert(!p.contains("Window"), s"Window in ANN plan:\n${p.take(2000)}")
      // partial + final object-hash aggregation: O(k) heaps map-side,
      // only ≤k buffers cross the shuffle
      assert(p.contains("ObjectHashAggregate"), p.take(2000))
    }
  }

  test("TopKAggregator: order, ties, bound, merge-order independence") {
    val agg = new TopKAggregator(3)
    val items = Seq(ScoredId(1.0, 5), ScoredId(2.0, 4), ScoredId(1.0, 2),
      ScoredId(0.5, 1), ScoredId(2.0, 9), ScoredId(1.5, 7))
    val expected = Seq(ScoredId(2.0, 4), ScoredId(2.0, 9), ScoredId(1.5, 7))
    // every permutation and every split point reduces+merges to the same
    for (perm <- items.permutations.take(50)) {
      val whole = perm.foldLeft(agg.zero)(agg.reduce)
      assert(agg.finish(whole) === expected)
      val (l, r) = perm.splitAt(2)
      val merged = agg.merge(l.foldLeft(agg.zero)(agg.reduce),
        r.foldLeft(agg.zero)(agg.reduce))
      assert(agg.finish(merged) === expected)
    }
  }

  test("TopKAggregator: NaN ranks first (Spark/DuckDB DESC order), -0.0 == 0.0") {
    val agg = new TopKAggregator(3)
    // a zero-norm embedding's 0/0 cosine is NaN — the Window path it
    // replaced ranked NaN first (Spark NaN = largest); IEEE `>` would
    // instead drop it from a full buffer, partition-order-dependently
    val items = Seq(ScoredId(1.0, 5), ScoredId(Double.NaN, 8),
      ScoredId(2.0, 4), ScoredId(0.5, 1), ScoredId(Double.NaN, 3))
    val expected = Seq(ScoredId(Double.NaN, 3), ScoredId(Double.NaN, 8),
      ScoredId(2.0, 4))
    def eq(a: Seq[ScoredId], b: Seq[ScoredId]): Boolean =
      a.length == b.length && a.zip(b).forall { case (x, y) =>
        x.id == y.id && (x.cos == y.cos || (x.cos.isNaN && y.cos.isNaN)) }
    for (perm <- items.permutations) {
      assert(eq(agg.finish(perm.foldLeft(agg.zero)(agg.reduce)), expected))
      val (l, r) = perm.splitAt(2)
      assert(eq(agg.finish(agg.merge(l.foldLeft(agg.zero)(agg.reduce),
        r.foldLeft(agg.zero)(agg.reduce))), expected))
    }
    // -0.0 ties 0.0 (Spark sort collapses signed zero) → id order decides
    val z = Seq(ScoredId(0.0, 9), ScoredId(-0.0, 2)).foldLeft(agg.zero)(agg.reduce)
    assert(agg.finish(z).map(_.id) === Seq(2L, 9L))
  }

  test("text stats: counts and quality bounded") {
    val df = docsDf(corpus)
    val counts = TextStats.countingStats(df).collect()
    counts.foreach { r =>
      assert(r.getLong(1) > 0) // n_tokens
      assert(r.getLong(2) > 0) // n_chars
    }
    val q = TextStats.qualityScore(df).collect()
    q.foreach(r => assert(r.getDouble(1) >= 0.0 && r.getDouble(1) <= 1.0))
  }

  test("lang id heuristic on distinctive samples") {
    assert(TextStats.langIdOf("the cat and the dog are in the house") === "en")
    assert(TextStats.langIdOf("der Hund und die Katze sind schön") === "de")
    assert(TextStats.langIdOf("这是一个中文句子，我们在这里") === "zh")
    assert(TextStats.langIdOf("") === "und")
  }

  test("multimodal decode: crafted PNG/GIF/JPEG headers decode byte-exactly") {
    // PNG: signature + IHDR, 640×480, color type 6 (RGBA)
    val png = Array[Int](
      0x89, 0x50, 0x4E, 0x47, 0x0D, 0x0A, 0x1A, 0x0A, // signature
      0x00, 0x00, 0x00, 0x0D, 'I', 'H', 'D', 'R',     // IHDR chunk
      0x00, 0x00, 0x02, 0x80,                         // width 640
      0x00, 0x00, 0x01, 0xE0,                         // height 480
      0x08, 0x06                                      // bit depth 8, color 6
    ).map(_.toByte)
    assert(MultiModal.decodeImageMeta(png) ===
      Some(MultiModal.ImageMeta("png", 640, 480, 6)))
    // GIF89a: 320×200, packed flags 0xF7 → color depth (7&7)+1 = 8
    val gif = ("GIF89a".getBytes("ASCII") ++ Array[Int](
      0x40, 0x01, // width 320 LE
      0xC8, 0x00, // height 200 LE
      0xF7, 0x00, 0x00).map(_.toByte))
    assert(MultiModal.decodeImageMeta(gif) ===
      Some(MultiModal.ImageMeta("gif", 320, 200, 8)))
    // JPEG: SOI, APP0 (skipped via its length), SOF0 1024×768, 3 comps
    val jpg = Array[Int](
      0xFF, 0xD8,                                     // SOI
      0xFF, 0xE0, 0x00, 0x04, 0x00, 0x00,             // APP0 len 4
      0xFF, 0xC0, 0x00, 0x11, 0x08,                   // SOF0 len 17, prec 8
      0x03, 0x00,                                     // height 768 BE
      0x04, 0x00,                                     // width 1024 BE
      0x03                                            // 3 components
    ).map(_.toByte)
    assert(MultiModal.decodeImageMeta(jpg) ===
      Some(MultiModal.ImageMeta("jpeg", 1024, 768, 3)))
    // non-images decode to None (the corpus html payloads)
    assert(MultiModal.decodeImageMeta("plain text".getBytes) === None)
    assert(MultiModal.decodeImageMeta(Array.empty[Byte]) === None)
    // byte histogram: exact fractions, bins by value range
    val h = MultiModal.byteHistogram(Array[Int](0, 0, 64, 255).map(_.toByte), 4)
    assert(h.toSeq === Seq(0.5f, 0.25f, 0f, 0.25f))
  }

  test("multimodal plumbing: deterministic features over binary column") {
    import spark.implicits._
    val media = MultiModal.mediaFromPages(spark, "/root/testdata/sf0.001").limit(20)
    val feats = MultiModal.extractFeatures(spark, media).collect()
    assert(feats.length === 20)
    feats.foreach { f =>
      assert(f.features.length === 8)
      assert(f.n_bytes > 0)
      assert(f.digest.length === 32)
    }
    // determinism
    val feats2 = MultiModal.extractFeatures(spark, media).collect()
    assert(feats.sortBy(_.media_id).map(_.digest).toSeq ===
      feats2.sortBy(_.media_id).map(_.digest).toSeq)
  }
}
