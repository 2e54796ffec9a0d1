package graft.index

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths, StandardCopyOption}

import scala.collection.mutable

import org.apache.spark.TaskContext
import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

import graft.analysis.Analysis
import graft.model._
import graft.search.{BM25, Bm25Stats}
import graft.util.{SmallFloat, VarInt, ByteBuilder}

/** Index build configuration.
  *
  * @param partsPerSegment input partitions grouped into one segment
  *        (segment = contiguous docId range holding ALL its terms — the
  *        Lucene segment model, which is what lets a query be answered
  *        per-partition without a cross-term shuffle).
  * @param hotTermDf df threshold above which a term's merge is salted
  *        into `numSalts` docId-contiguous slices (skew split,
  *        SURVEY.md §4.4). At web scale this would be ~1e7; tests use a
  *        low value to exercise the path.
  */
final case class IndexConfig(
    stopWords: Seq[String] = Nil,
    maxTokenLength: Int = 255,
    numPartitions: Int = 32,
    partsPerSegment: Int = 4,
    blockSize: Int = 128,
    hotTermDf: Long = 10000000L,
    numSalts: Int = 4)

/** Batch inverted-index build (SURVEY.md §3.A):
  *
  *   pages → analyze → range-partition by url → deterministic docIds
  *   → docs+norms table → per-partition SPIMI runs → salted sort-merge
  *   shuffle → 128-doc blocks (delta-varint + block-max) → parquet
  *   segments → stats/lineage → atomic manifest commit.
  *
  * Replaces the reference's IndexWriter pipeline
  * [U lucene/core/.../index/IndexWriter.java, DocumentsWriterPerThread,
  * SegmentMerger]; each stage is idempotent and marked complete by its
  * parquet _SUCCESS, the driver writes `manifest.json` last (the
  * `segments_N` commit-point analogue
  * [U lucene/core/.../index/SegmentInfos.java]); a rerun skips finished
  * stages (resume per BASELINE.json north_rule).
  */
object IndexBuilder {

  final case class AnalyzedDoc(
      partId: Int, segId: Int, docId: Long, url: String, lang: String,
      tokens: Seq[String])

  def build(spark: SparkSession, pages: Dataset[Page], dir: String,
            cfg: IndexConfig = IndexConfig()): InvertedIndex = {
    if (Files.exists(Paths.get(dir, "manifest.json")))
      return InvertedIndex.open(spark, dir)
    import spark.implicits._

    Files.createDirectories(Paths.get(dir))

    // ---- analyze + deterministic docId assignment ---------------------
    // docId is (normatively, FIXTURES.md §3) `row_number() over (order by
    // url) - 1`, computed scalably: range-partition by url, count per
    // partition, prefix-sum offsets on the driver (P longs — O(partitions),
    // never O(rows)), then per-partition sequential assignment. This is
    // how a global row_number survives 10^12 rows; a single Window would
    // funnel everything through one task.
    val analyzed = pages
      .select(col("url"), col("lang"),
        Analysis.analyzeCol(col("text"), cfg.stopWords).as("tokens"))
      .as[(String, String, Seq[String])]
      .repartitionByRange(cfg.numPartitions, col("url"))
      .sortWithinPartitions("url")
      .persist(StorageLevel.MEMORY_AND_DISK)

    val counts: Array[Long] =
      analyzed.mapPartitions(it => Iterator.single(it.size.toLong)).collect()
    val offsets: Array[Long] = counts.scanLeft(0L)(_ + _)
    val bcOffsets = spark.sparkContext.broadcast(offsets)
    val partsPerSeg = cfg.partsPerSegment

    val assigned: Dataset[AnalyzedDoc] = analyzed.mapPartitions { it =>
      val pid = TaskContext.getPartitionId()
      val off = bcOffsets.value(pid)
      val segId = pid / partsPerSeg
      var i = -1L
      it.map { case (url, lang, tokens) =>
        i += 1
        AnalyzedDoc(pid, segId, off + i, url, lang, tokens)
      }
    }.persist(StorageLevel.MEMORY_AND_DISK)

    // ---- docs table (norms) -------------------------------------------
    val docsPath = s"$dir/docs"
    runStage(docsPath) {
      assigned.map { a =>
        val dl = a.tokens.length
        val norm = SmallFloat.intToByte4(dl)
        DocRow(a.segId, a.docId, a.url, a.lang, dl, norm, SmallFloat.byte4ToInt(norm))
      }.toDF()
        .write.partitionBy("segId").mode("overwrite").parquet(docsPath)
    }
    val docsDf = spark.read.parquet(docsPath)

    // ---- collection stats (BM25 inputs; north_star equality gate) ----
    val statsPath = s"$dir/stats"
    runStage(statsPath) {
      docsDf.agg(
        count(lit(1)).as("docCount"),
        sum(col("dl")).cast("long").as("sumTotalTermFreq"))
        .withColumn("avgdl", col("sumTotalTermFreq") / col("docCount"))
        .as[CollStats].toDF()
        .coalesce(1).write.mode("overwrite").parquet(statsPath)
    }
    val stats0 = spark.read.parquet(statsPath).as[CollStats].head()
    val bcStats = spark.sparkContext.broadcast(
      Bm25Stats(stats0.docCount, stats0.sumTotalTermFreq))

    // ---- SPIMI: per-partition in-memory inversion ---------------------
    val runs: Dataset[Run] = assigned.mapPartitions(spimi).persist(StorageLevel.MEMORY_AND_DISK)

    // ---- per-term global stats (df, ttf) — exact, and doubles as the
    // hot-term detector for salting. Map-side partial agg is automatic.
    val termStatsPath = s"$dir/termstats"
    runStage(termStatsPath) {
      runs.toDF()
        .select(col("term"), size(col("docIds")).cast("long").as("pdf"),
          aggregate(col("tfs"), lit(0L), (acc, x) => acc + x).as("pttf"))
        .groupBy("term")
        .agg(sum(col("pdf")).as("df"), sum(col("pttf")).as("ttf"))
        .write.mode("overwrite").parquet(termStatsPath)
    }
    val termStatsDf = spark.read.parquet(termStatsPath)

    val hotTerms: Set[String] = termStatsDf
      .filter(col("df") >= cfg.hotTermDf).select("term").as[String]
      .collect().toSet
    val bcHot = spark.sparkContext.broadcast(hotTerms)
    val numSalts = cfg.numSalts

    // ---- salted sort-merge shuffle (the SegmentMerger analogue) -------
    // Key = (segId, term, salt): equal keys land in one range partition;
    // runs of a hot term fan out over `numSalts` docId-contiguous slices
    // so no reducer ever owns a whole web-scale posting list.
    val blockSize = cfg.blockSize
    val salted = runs.map { r =>
      if (bcHot.value.contains(r.term))
        r.copy(salt = (r.partId % partsPerSeg) * numSalts / partsPerSeg)
      else r
    }

    val postingsPath = s"$dir/postings"
    runStage(postingsPath) {
      salted
        .repartitionByRange(cfg.numPartitions, col("segId"), col("term"), col("salt"))
        .sortWithinPartitions("segId", "term", "salt", "firstDocId")
        .mapPartitions(it => mergeRuns(it, bcStats.value, blockSize))
        .toDF()
        .write.partitionBy("segId").mode("overwrite").parquet(postingsPath)
    }

    // ---- lineage + segment metadata (manifest inputs) -----------------
    val postingsDf = spark.read.parquet(postingsPath)
    val lineagePath = s"$dir/lineage"
    runStage(lineagePath) {
      postingsDf.groupBy("segId")
        .agg(count(lit(1)).as("postingsRows"), sum("df").as("postings"),
          min("term").as("minTerm"), max("term").as("maxTerm"))
        .coalesce(1).write.mode("overwrite").parquet(lineagePath)
    }
    val segsPath = s"$dir/segments"
    runStage(segsPath) {
      docsDf.groupBy("segId")
        .agg(count(lit(1)).as("nDocs"), min("docId").as("minDocId"),
          max("docId").as("maxDocId"))
        .as[SegmentInfo].toDF()
        .coalesce(1).write.mode("overwrite").parquet(segsPath)
    }

    analyzed.unpersist()
    assigned.unpersist()
    runs.unpersist()

    // ---- atomic manifest commit (segments_N analogue): temp + rename --
    val segInfos = spark.read.parquet(segsPath).as[SegmentInfo].collect()
      .sortBy(_.segId)
    val manifest = manifestJson(stats0, segInfos, cfg, hotTerms.size)
    val tmp = Paths.get(dir, ".manifest.json.tmp")
    Files.write(tmp, manifest.getBytes(StandardCharsets.UTF_8))
    Files.move(tmp, Paths.get(dir, "manifest.json"),
      StandardCopyOption.ATOMIC_MOVE, StandardCopyOption.REPLACE_EXISTING)

    InvertedIndex.open(spark, dir)
  }

  /** Idempotent stage guard: skip if a previous run completed it. */
  private def runStage(path: String)(f: => Unit): Unit =
    if (!Files.exists(Paths.get(path, "_SUCCESS"))) f

  /** SPIMI in-memory inversion of one partition
    * (≈ one DocumentsWriterPerThread at flush). Docs arrive in docId
    * order, so per-term docId arrays are built already sorted —
    * no sort needed at emit, only at the term level. */
  private def spimi(docs: Iterator[AnalyzedDoc]): Iterator[Run] = {
    var partId = -1
    var segId = -1
    val inv = new java.util.HashMap[String, PostingsBuf]()
    val perDoc = new java.util.HashMap[String, mutable.ArrayBuilder.ofInt]()
    docs.foreach { d =>
      partId = d.partId
      segId = d.segId
      perDoc.clear()
      var pos = 0
      d.tokens.foreach { t =>
        var b = perDoc.get(t)
        if (b == null) { b = new mutable.ArrayBuilder.ofInt; perDoc.put(t, b) }
        b += pos
        pos += 1
      }
      val norm = SmallFloat.intToByte4(d.tokens.length)
      perDoc.forEach { (term, posB) =>
        var buf = inv.get(term)
        if (buf == null) { buf = new PostingsBuf; inv.put(term, buf) }
        buf.add(d.docId, posB.result(), norm)
      }
    }
    if (inv.isEmpty) Iterator.empty
    else {
      val terms = inv.keySet().toArray(new Array[String](0))
      java.util.Arrays.sort(terms.asInstanceOf[Array[AnyRef]])
      val p = partId; val s = segId
      terms.iterator.map { term =>
        val buf = inv.get(term)
        Run(p, s, term, 0, buf.firstDocId, buf.docIds, buf.tfs, buf.norms,
          buf.positionsEncoded)
      }
    }
  }

  private final class PostingsBuf {
    private val docB = new mutable.ArrayBuilder.ofLong
    private val tfB = new mutable.ArrayBuilder.ofInt
    private val normB = new ByteBuilder(16)
    private val posB = new ByteBuilder(32)
    var firstDocId: Long = -1L
    def add(docId: Long, positions: Array[Int], norm: Byte): Unit = {
      if (firstDocId < 0) firstDocId = docId
      docB += docId
      tfB += positions.length
      normB += norm
      var prev = 0
      var i = 0
      while (i < positions.length) {
        VarInt.write(posB, (positions(i) - prev).toLong)
        prev = positions(i)
        i += 1
      }
    }
    def docIds: Array[Long] = docB.result()
    def tfs: Array[Int] = tfB.result()
    def norms: Array[Byte] = normB.result()
    def positionsEncoded: Array[Byte] = posB.result()
  }

  /** Merge consecutive runs with equal (segId, term, salt) — input is
    * sorted, so this is a single streaming pass (the k-way merge of the
    * reference's SegmentMerger degenerates to ordered concatenation
    * because runs arrive sorted by firstDocId and partitions are
    * docId-disjoint). Emits block-compressed PostingsRows. */
  private def mergeRuns(it: Iterator[Run], stats: Bm25Stats,
                        blockSize: Int): Iterator[PostingsRow] = {
    if (!it.hasNext) return Iterator.empty
    val cache = BM25.buildCache(stats.avgdl)
    val in = it.buffered
    new Iterator[PostingsRow] {
      def hasNext: Boolean = in.hasNext
      def next(): PostingsRow = {
        val head = in.next()
        val group = mutable.ArrayBuffer(head)
        while (in.hasNext && {
          val n = in.head
          n.segId == head.segId && n.term == head.term && n.salt == head.salt
        }) group += in.next()
        buildRow(group, head, cache, blockSize)
      }
    }
  }

  private def buildRow(group: mutable.ArrayBuffer[Run], head: Run,
                       cache: Array[Float], blockSize: Int): PostingsRow = {
    val n = group.iterator.map(_.docIds.length).sum
    val docIds = new Array[Long](n)
    val tfs = new Array[Int](n)
    val norms = new Array[Byte](n)
    val positions = new Array[Array[Int]](n)
    var o = 0
    group.foreach { r =>
      System.arraycopy(r.docIds, 0, docIds, o, r.docIds.length)
      System.arraycopy(r.tfs, 0, tfs, o, r.tfs.length)
      System.arraycopy(r.norms, 0, norms, o, r.norms.length)
      val pos = VarInt.decodePositions(r.positions, r.tfs)
      System.arraycopy(pos, 0, positions, o, pos.length)
      o += r.docIds.length
    }
    val blocks = Vector.newBuilder[Block]
    var start = 0
    var ttf = 0L
    var i = 0
    while (i < n) { ttf += tfs(i); i += 1 }
    while (start < n) {
      val end = math.min(start + blockSize, n)
      val bDocs = java.util.Arrays.copyOfRange(docIds, start, end)
      val bTfs = java.util.Arrays.copyOfRange(tfs, start, end)
      val bNorms = java.util.Arrays.copyOfRange(norms, start, end)
      val bPos = java.util.Arrays.copyOfRange(
        positions.asInstanceOf[Array[AnyRef]], start, end)
        .asInstanceOf[Array[Array[Int]]]
      var maxTf = 0
      var minNorm = bNorms(0)
      var maxImpact = 0f
      var j = 0
      while (j < bTfs.length) {
        if (bTfs(j) > maxTf) maxTf = bTfs(j)
        // norm bytes encode monotonically increasing lengths
        if ((bNorms(j) & 0xFF) < (minNorm & 0xFF)) minNorm = bNorms(j)
        val imp = BM25.score(1f, bTfs(j).toFloat, cache(bNorms(j) & 0xFF))
        if (imp > maxImpact) maxImpact = imp
        j += 1
      }
      blocks += Block(
        firstDocId = bDocs(0), maxDocId = bDocs(bDocs.length - 1),
        count = bDocs.length, maxTf = maxTf, minNorm = minNorm,
        maxImpact = maxImpact,
        docs = VarInt.encodeDeltas(bDocs, bDocs(0)),
        tfs = VarInt.encodeInts(bTfs),
        norms = bNorms,
        positions = VarInt.encodePositions(bPos))
      start = end
    }
    PostingsRow(head.segId, head.term, head.salt, n.toLong, ttf,
      blocks.result())
  }

  private def manifestJson(stats: CollStats, segs: Array[SegmentInfo],
                           cfg: IndexConfig, hotTerms: Int): String = {
    val segJson = segs.map(s =>
      s"""{"segId":${s.segId},"nDocs":${s.nDocs},"minDocId":${s.minDocId},"maxDocId":${s.maxDocId}}""")
      .mkString("[", ",", "]")
    s"""{
       |  "generation": 1,
       |  "docCount": ${stats.docCount},
       |  "sumTotalTermFreq": ${stats.sumTotalTermFreq},
       |  "avgdl": ${stats.avgdl},
       |  "hotTermsSalted": $hotTerms,
       |  "config": {"numPartitions": ${cfg.numPartitions}, "partsPerSegment": ${cfg.partsPerSegment}, "blockSize": ${cfg.blockSize}, "hotTermDf": ${cfg.hotTermDf}, "numSalts": ${cfg.numSalts}},
       |  "segments": $segJson
       |}""".stripMargin
  }
}
