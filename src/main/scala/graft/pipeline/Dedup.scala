package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame, Dataset}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Large-scale training-data deduplication operators over a
  * `documents(doc_id, text, …)` table. All hash functions are
  * deterministic (no runtime RNG) so results are reproducible across
  * cluster sizes and resumes.
  *
  * Scale notes (the 100 TB story):
  *  - exact dedup is one hash-shuffle on a 16-byte digest, never on the
  *    raw text;
  *  - MinHash-LSH and SimHash fan candidate generation out by band
  *    buckets (equi-join shuffles on short keys) and verify only within
  *    buckets — the classic sub-quadratic near-dup pipeline;
  *  - exact n-gram Jaccard is the verification oracle; its shingle
  *    self-join is quadratic per shared shingle and is used on samples /
  *    candidate pairs, not the full corpus.
  */
object Dedup {

  // ---------- exact ----------

  /** Exact duplicate groups by content digest: one row per distinct
    * text, keeping the smallest doc_id (hash groupBy — a single shuffle
    * on md5, with map-side partial aggregation). */
  def exactGroups(documents: DataFrame): DataFrame =
    documents
      .select(col("doc_id").cast("long").as("doc_id"), md5(col("text")).as("h"))
      .groupBy("h")
      .agg(min("doc_id").as("keep_id"), count(lit(1)).cast("long").as("n_docs"))
      .select("keep_id", "n_docs")

  /** Per-doc exact-dup verdict: (doc_id, keep_id); doc is a duplicate
    * iff doc_id != keep_id. groupBy(min) + equi-join back on the digest
    * — partial aggregation bounds per-task input even when ONE text
    * value dominates the corpus (a Window partitioned by the digest
    * would move every row of that group into a single task). */
  def exactDedup(documents: DataFrame): DataFrame = {
    val hashed = documents
      .select(col("doc_id").cast("long").as("doc_id"), md5(col("text")).as("h"))
    hashed
      .join(hashed.groupBy("h").agg(min("doc_id").as("keep_id")), "h")
      .select("doc_id", "keep_id")
  }

  // ---------- deterministic hashing primitives ----------

  /** FNV-1a 64-bit over UTF-8 — stable, seedable, cheap. */
  def fnv64(s: String, seed: Long = 0xcbf29ce484222325L): Long = {
    var h = seed
    val bytes = s.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    var i = 0
    while (i < bytes.length) {
      h ^= (bytes(i) & 0xffL)
      h *= 0x100000001b3L
      i += 1
    }
    h
  }

  /** Word n-gram shingles of an analyzed token array. */
  def shingles(tokens: Seq[String], n: Int): Seq[String] =
    if (tokens.length < n) Seq(tokens.mkString(" "))
    else tokens.sliding(n).map(_.mkString(" ")).toSeq

  // ---------- MinHash + LSH ----------

  /** Universal-hash permutations h_i(x) = (a_i·x + b_i) applied to the
    * 64-bit shingle fingerprint; min per permutation = signature. */
  private def minhashSig(shingleHashes: Array[Long], numHashes: Int): Array[Long] = {
    val sig = Array.fill(numHashes)(Long.MaxValue)
    var i = 0
    while (i < shingleHashes.length) {
      val x = shingleHashes(i)
      var j = 0
      while (j < numHashes) {
        // deterministic per-permutation odd multiplier + offset
        val a = 0x9E3779B97F4A7C15L * (2L * j + 1L)
        val b = 0xC2B2AE3D27D4EB4FL * (j + 1L)
        val h = a * x + b
        if (h < sig(j)) sig(j) = h
        j += 1
      }
      i += 1
    }
    sig
  }

  private val shingleHashUdf = udf { (text: String, n: Int) =>
    shingles(text.split(' ').toSeq, n).map(fnv64(_)).toArray.distinct
  }
  private val minhashUdf = udf { (hs: Array[Long], numHashes: Int) =>
    minhashSig(hs, numHashes)
  }

  /** MinHash signatures: (doc_id, sig array<long>). */
  def minhashSignatures(documents: DataFrame, numHashes: Int = 64,
                        shingleSize: Int = 3): DataFrame =
    documents.select(
      col("doc_id").cast("long").as("doc_id"),
      minhashUdf(shingleHashUdf(col("text"), lit(shingleSize)), lit(numHashes))
        .as("sig"))

  /** LSH candidate pairs + exact-Jaccard verification:
    * band the signature, bucket-join equal bands, then verify candidate
    * pairs against exact shingle-set Jaccard ≥ threshold.
    * Returns (a, b, jaccard) with a < b — an UNORDERED pair set
    * (relational semantics); pass `sorted=true` only for small outputs
    * where a reproducible listing matters, since at corpus scale the
    * global sort is a full extra shuffle of every surviving pair. */
  def minhashNearDups(documents: DataFrame, numHashes: Int = 64,
                      bands: Int = 16, shingleSize: Int = 3,
                      threshold: Double = 0.8,
                      bucketCap: Int = 1024,
                      sorted: Boolean = false): DataFrame = {
    val rowsPerBand = numHashes / bands
    val sigs = minhashSignatures(documents, numHashes, shingleSize)
      .withColumn("band", explode(sequence(lit(0), lit(bands - 1))))
      .withColumn("bandKey",
        hash(col("band"), slice(col("sig"), col("band") * rowsPerBand + 1, lit(rowsPerBand))))
      .select("doc_id", "band", "bandKey")
    // triangle-split bucket join: a degenerate band bucket (boilerplate
    // pages) spreads over bounded tasks instead of one quadratic task
    val cands = Skew
      .boundedSelfJoinPairs(sigs, Seq("band", "bandKey"), "doc_id",
        bucketCap, "minhash")
      .select(col("a.doc_id").as("a"), col("b.doc_id").as("b"))
      .distinct()
    val sh = documents.select(col("doc_id").cast("long").as("doc_id"),
        shingleHashUdf(col("text"), lit(shingleSize)).as("sh"))
    cands
      .join(sh.select(col("doc_id").as("a"), col("sh").as("shA")), "a")
      .join(sh.select(col("doc_id").as("b"), col("sh").as("shB")), "b")
      .withColumn("inter", size(array_intersect(col("shA"), col("shB"))).cast("double"))
      .withColumn("jaccard",
        col("inter") / (size(col("shA")) + size(col("shB")) - col("inter")))
      .filter(col("jaccard") >= threshold)
      .select("a", "b", "jaccard")
      .transform(d => if (sorted) d.orderBy("a", "b") else d)
  }

  // ---------- SimHash ----------

  private val simhashUdf = udf { (tokens: Seq[String]) =>
    val acc = new Array[Int](64)
    tokens.foreach { t =>
      val h = fnv64(t)
      var b = 0
      while (b < 64) {
        if (((h >>> b) & 1L) == 1L) acc(b) += 1 else acc(b) -= 1
        b += 1
      }
    }
    var out = 0L
    var b = 0
    while (b < 64) { if (acc(b) > 0) out |= (1L << b); b += 1 }
    out
  }

  /** 64-bit SimHash per doc: (doc_id, simhash). */
  def simhash(documents: DataFrame): DataFrame =
    documents.select(col("doc_id").cast("long").as("doc_id"),
      simhashUdf(split(col("text"), " ")).as("simhash"))

  /** SimHash near-dups: Hamming distance ≤ maxDist via (maxDist+1)-band
    * bucketing — any pair within distance maxDist leaves at least one
    * band untouched (pigeonhole), so candidate recall is 100% BY
    * CONSTRUCTION at the requested distance; exact popcount verify
    * inside buckets. maxDist is capped so bands keep ≥ 8 bits (wider
    * distances need multi-table permuted SimHash, not narrower bands —
    * 1-bit bands would bucket the universe together). */
  def simhashNearDups(documents: DataFrame, maxDist: Int = 3,
                      bucketCap: Int = 1024,
                      sorted: Boolean = false): DataFrame = {
    require(maxDist >= 0 && maxDist <= 7,
      s"maxDist=$maxDist: band guarantee supported for 0..7 " +
        "(use simhashNearDupsWide for wider distances)")
    val bands = maxDist + 1
    val width = (64 + bands - 1) / bands
    // width == 64 (maxDist = 0): the band IS the whole hash — (1L<<64)-1
    // would overflow to 0 and bucket the universe together
    val mask = if (width >= 64) -1L else (1L << width) - 1
    val sh = simhash(documents)
    val banded = sh.withColumn("band", explode(sequence(lit(0), lit(bands - 1))))
      .withColumn("bandKey",
        concat_ws(":", col("band"),
          expr(s"shiftrightunsigned(simhash, band * $width) & ${mask}L")))
    val pairs = Skew
      .boundedSelfJoinPairs(banded, Seq("bandKey"), "doc_id",
        bucketCap, "simhash")
      .select(col("a.doc_id").as("a"), col("b.doc_id").as("b"),
        col("a.simhash").as("ha"), col("b.simhash").as("hb"))
      .distinct()
    pairs
      .withColumn("dist", bit_count(col("ha").bitwiseXOR(col("hb"))))
      .filter(col("dist") <= maxDist)
      .select("a", "b", "dist")
      .transform(d => if (sorted) d.orderBy("a", "b") else d)
  }

  /** Multi-table permuted SimHash for WIDE Hamming distances (the
    * Manku/Jain/Sarma web-crawl near-dup table design
    * [Detecting Near-Duplicates for Web Crawling, WWW'07]): split the
    * 64-bit SimHash into `numBlocks` > maxDist bit blocks; one lookup
    * table per (numBlocks − maxDist)-subset of blocks, keyed on those
    * blocks' concatenated bits. Recall is 100% BY CONSTRUCTION: a pair
    * within distance d has its differing bits inside at most d blocks,
    * so at least numBlocks − d blocks are untouched and the subset made
    * of untouched blocks keys both docs identically in that table.
    * Exact popcount verification inside buckets; bucket joins are
    * triangle-split like the narrow path.
    *
    * Table count is C(numBlocks, maxDist) — keep numBlocks − maxDist
    * small (2–3); e.g. maxDist=8, numBlocks=10 → 45 tables of ~13-bit
    * keys. At 100 TB the table explode is a 45× row fan-out of an
    * 8-byte hash (not the text), and the per-table key width trades
    * against bucketCap. */
  def simhashNearDupsWide(documents: DataFrame, maxDist: Int,
                          numBlocks: Int = 10,
                          bucketCap: Int = 1024,
                          sorted: Boolean = false): DataFrame = {
    require(maxDist >= 1 && maxDist < numBlocks && numBlocks <= 32,
      s"need 1 <= maxDist < numBlocks <= 32: maxDist=$maxDist numBlocks=$numBlocks")
    val keep = numBlocks - maxDist
    val combos = (0 until numBlocks).combinations(keep).toSeq
    require(combos.length <= 4096,
      s"C($numBlocks,$keep)=${combos.length} tables — choose a smaller numBlocks−maxDist")
    // block i covers bits [off(i), off(i) + w(i)); widths differ by ≤1
    val base = 64 / numBlocks
    val extra = 64 % numBlocks
    val widths = (0 until numBlocks).map(i => if (i < extra) base + 1 else base)
    val offs = widths.scanLeft(0)(_ + _)
    def blockVal(i: Int): Column = {
      val mask = if (widths(i) >= 64) -1L else (1L << widths(i)) - 1
      expr(s"shiftrightunsigned(simhash, ${offs(i)}) & ${mask}L")
    }
    val tables = combos.zipWithIndex.map { case (blocks, t) =>
      // key = table id + the selected blocks' bits, packed left-to-right
      val packed = blocks.foldLeft(lit(0L)) { (acc, i) =>
        shiftleft(acc, widths(i)).bitwiseOR(blockVal(i))
      }
      struct(lit(t).as("tbl"), packed.as("bkey"))
    }
    val banded = simhash(documents)
      .withColumn("tk", explode(array(tables: _*)))
      .select(col("doc_id"), col("simhash"),
        col("tk.tbl").as("tbl"), col("tk.bkey").as("bkey"))
    Skew.boundedSelfJoinPairs(banded, Seq("tbl", "bkey"), "doc_id",
        bucketCap, "simhash-wide")
      .select(col("a.doc_id").as("a"), col("b.doc_id").as("b"),
        col("a.simhash").as("ha"), col("b.simhash").as("hb"))
      .distinct()
      .withColumn("dist", bit_count(col("ha").bitwiseXOR(col("hb"))))
      .filter(col("dist") <= maxDist)
      .select("a", "b", "dist")
      .transform(d => if (sorted) d.orderBy("a", "b") else d)
  }

  // ---------- exact n-gram Jaccard (verification oracle) ----------

  /** Exact pairwise n-gram Jaccard ≥ threshold via distinct-shingle
    * self-join (relational; DuckDB-checkable). */
  def ngramJaccardPairs(documents: DataFrame, n: Int = 3,
                        threshold: Double = 0.5,
                        sorted: Boolean = false): DataFrame = {
    val sh = documents
      .select(col("doc_id").cast("long").as("doc_id"),
        explode(shingleArrayCol(col("text"), n)).as("sh"))
      .distinct()
    val sizes = sh.groupBy("doc_id").agg(count(lit(1)).as("sz"))
    val inter = sh.as("l").join(sh.as("r"),
        col("l.sh") === col("r.sh") && col("l.doc_id") < col("r.doc_id"))
      .groupBy(col("l.doc_id").as("a"), col("r.doc_id").as("b"))
      .agg(count(lit(1)).as("inter"))
    inter
      .join(sizes.select(col("doc_id").as("a"), col("sz").as("szA")), "a")
      .join(sizes.select(col("doc_id").as("b"), col("sz").as("szB")), "b")
      .withColumn("jaccard",
        col("inter").cast("double") / (col("szA") + col("szB") - col("inter")))
      .filter(col("jaccard") >= threshold)
      .select("a", "b")
      .transform(d => if (sorted) d.orderBy("a", "b") else d)
  }

  /** Word n-gram shingle array as a pure Column expression (built-ins
    * only — transform over token indices, codegen-friendly). */
  def shingleArrayCol(text: org.apache.spark.sql.Column, n: Int): org.apache.spark.sql.Column = {
    val toks = split(text, " ")
    when(size(toks) < n, array(array_join(toks, " ")))
      .otherwise(
        transform(sequence(lit(0), size(toks) - n),
          i => array_join(slice(toks, i + 1, lit(n)), " ")))
  }
}
