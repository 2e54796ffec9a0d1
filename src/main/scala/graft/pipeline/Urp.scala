package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Update-request-processor chain — the reference's pre-index document
  * pipeline [U solr/core/src/java/org/apache/solr/update/processor/:
  * SignatureUpdateProcessorFactory, CloneFieldUpdateProcessorFactory,
  * RegexReplaceProcessorFactory, DefaultValueUpdateProcessorFactory,
  * TrimFieldUpdateProcessorFactory, TruncateFieldUpdateProcessorFactory,
  * LangDetectLanguageIdentifierUpdateProcessor], re-expressed as
  * composable `DataFrame => DataFrame` transforms that run BEFORE
  * `IndexBuilder.build` / `StreamingIndexer.appendGeneration`.
  *
  * Every processor is pure Column expressions (codegen, no UDFs, no
  * shuffle) except `signatureDedup` — one partitioned-window shuffle on
  * the signature, so the chain costs O(1) extra shuffles at corpus
  * scale — and `langDetect`, whose language scorer is a scalar UDF
  * (TextStats.langIdUdf): correct but not codegen, keep it off the
  * hottest chains or stamp lang once at ingest. */
object Urp {

  type Processor = DataFrame => DataFrame

  /** Left-to-right composition, as the reference chains factories. */
  def chain(ps: Processor*): Processor =
    ps.reduceLeftOption(_ andThen _).getOrElse(identity)

  /** DefaultValueUpdateProcessorFactory: null field → literal. */
  def defaultValue(field: String, v: String): Processor =
    df => df.withColumn(field, coalesce(col(field), lit(v)))

  /** CloneFieldUpdateProcessorFactory: copy src into dst. */
  def cloneField(src: String, dst: String): Processor =
    df => df.withColumn(dst, col(src))

  /** RegexReplaceProcessorFactory over one field. */
  def regexReplace(field: String, pattern: String, replacement: String): Processor =
    df => df.withColumn(field, regexp_replace(col(field), pattern, replacement))

  /** TrimFieldUpdateProcessorFactory. */
  def trimFields(fields: String*): Processor =
    df => fields.foldLeft(df)((d, f) => d.withColumn(f, trim(col(f))))

  /** TruncateFieldUpdateProcessorFactory: cap a string field. */
  def truncate(field: String, maxLen: Int): Processor =
    df => df.withColumn(field, substring(col(field), 1, maxLen))

  /** LangDetect analogue: stamp `dst` with the n-gram language-ID
    * heuristic over `textField` (TextStats.langId — same scorer the
    * tx_langid gate verifies). */
  def langDetect(textField: String, dst: String): Processor =
    df => df.withColumn(dst, TextStats.langIdCol(col(textField)))

  /** SignatureUpdateProcessor with overwriteDupes: md5 signature over
    * `sigFields` (concatenated with a NUL separator, null-safe), keep
    * ONE row per signature — deterministically the minimum `keyField`
    * (the reference keeps the last write; a distributed batch has no
    * write order, so the stable key order is the documented pin).
    * EXACTLY one row survives per signature even when keys tie or are
    * null (a min-key semi join would keep every tied row and drop
    * all-null-key groups entirely): the survivor is min-of-structs over
    * (key-is-null, key, whole row) — the full row as the final
    * comparand makes the order total, so ties on the key break
    * deterministically by row content. One hash aggregation with
    * map-side partials: per-task input stays bounded even when ONE
    * signature dominates the corpus (a per-signature Window would move
    * every row of that group into a single task). */
  def signatureDedup(sigFields: Seq[String], keyField: String): Processor = { df =>
    val sig = md5(concat_ws("\u0000", sigFields.map(f => coalesce(col(f).cast("string"), lit(""))): _*))
    val rowStruct = struct(df.columns.map(col): _*)
    val ordered = struct(
      col(keyField).isNull.cast("int").as("nullsLast"),
      col(keyField).as("k"),
      rowStruct.as("r"))
    df.groupBy(sig.as("__sig"))
      .agg(min(ordered).as("__min"))
      .select(df.columns.map(c => col(s"__min.r.$c").as(c)): _*)
  }
}
