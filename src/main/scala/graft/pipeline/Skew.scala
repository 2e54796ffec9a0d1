package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-bounded LSH-bucket self-joins.
  *
  * A plain `df.as("l").join(df.as("r"), key && l.id < r.id)` explodes
  * quadratically inside one task when a bucket degenerates (boilerplate
  * pages, empty docs, all-zero embeddings): every row of the bucket
  * lands in ONE join task. `boundedSelfJoinPairs` triangle-partitions
  * each oversized bucket instead: members are sliced by id-hash into
  * g = ceil(size / cap) slices and every slice PAIR (i ≤ j) becomes its
  * own join task, so no task ever holds more than ~cap rows per side
  * while the emitted pair set stays EXACTLY the uncapped one — nothing
  * is dropped, the quadratic work is spread over g·(g+1)/2 tasks.
  * (This is the skew-salting pattern from SURVEY.md §4.4 applied to a
  * self-join, where plain salting would lose cross-slice pairs.)
  */
object Skew {

  /** All unordered within-bucket pairs (as structs `a`, `b` of the
    * original columns, with a.idCol < b.idCol), each emitted exactly
    * once, with per-task input bounded by `cap` rows per side.
    *
    * Exactness: a pair in slices (sa ≤ sb) matches exactly in task
    * (sa, sb) — the left leg enumerates tasks (s, j ≥ s), the right leg
    * tasks (i ≤ s, s); same-slice pairs are halved by the id order on
    * the diagonal, cross-slice pairs are normalized by id afterwards.
    * Oversized buckets are counted and logged — no silent behavior. */
  def boundedSelfJoinPairs(df: DataFrame, keyCols: Seq[String], idCol: String,
                           cap: Int = 1024, label: String = "lsh"): DataFrame = {
    require(cap > 0, s"cap must be positive: $cap")
    val origCols = df.columns.toSeq
    // persisted: the oversized-bucket diagnostic below materializes this
    // aggregation ONCE and the pair join then reuses the cache — without
    // it every caller paid the bucket-count pass twice (once eagerly for
    // the log line, once again inside the join)
    val sizes = df.groupBy(keyCols.map(col): _*)
      .agg(count(lit(1)).as("__bsz"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)

    val sliced = df.join(sizes, keyCols)
      .withColumn("__g",
        greatest(lit(1), ceil(col("__bsz").cast("double") / cap)).cast("int"))
      .withColumn("__s", pmod(xxhash64(col(idCol)), col("__g")).cast("int"))

    // left leg owns tasks (__s, j) for j in [__s, g); right leg owns
    // tasks (i, __s) for i in [0, __s] — the equi-join below pairs task
    // (i, j) keys, so the shuffle key is (bucket, i, j) and each task's
    // input is one slice per side (≤ ~cap rows)
    val left = sliced.withColumn("__tj", explode(sequence(col("__s"), col("__g") - 1)))
    val right = sliced.withColumn("__ti", explode(sequence(lit(0), col("__s"))))

    val keyEq = keyCols.map(c => col(s"l.$c") === col(s"r.$c")).reduce(_ && _)
    val joined = left.as("l").join(right.as("r"),
      keyEq &&
        col("l.__s") === col("r.__ti") && col("l.__tj") === col("r.__s") &&
        (col("l.__s") =!= col("r.__s") ||
          col(s"l.$idCol") < col(s"r.$idCol")) &&
        col(s"l.$idCol") =!= col(s"r.$idCol"))

    def side(prefix: String): Column =
      struct(origCols.map(c => col(s"$prefix.$c").as(c)): _*)
    val swap = col(s"l.$idCol") > col(s"r.$idCol")
    val out = joined.select(
      when(swap, side("r")).otherwise(side("l")).as("a"),
      when(swap, side("l")).otherwise(side("r")).as("b"))

    val oversized = sizes.filter(col("__bsz") > cap)
      .agg(count(lit(1)).as("n"), max("__bsz").as("mx")).head()
    if (oversized.getLong(0) > 0)
      println(s"[skew:$label] ${oversized.getLong(0)} bucket(s) over cap=$cap " +
        s"(largest=${oversized.getLong(1)}) triangle-split; no pairs dropped")
    out
  }
}
