package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** End-to-end corpus curation: the composed filter chain a training-data
  * pipeline actually ships — the individually-gated operators wired
  * together into one declarative plan.
  *
  * A document survives when it
  *   1. meets the token floor (quality gate, map-only);
  *   2. is its content hash's canonical copy (exact dedup keep);
  *   3. shares no word n-gram with the benchmark corpus (decontamination,
  *      broadcast semi-join);
  *   4. passes the deterministic per-source sampling hash (map-only).
  *
  * Scale shape: every criterion yields a doc_id-keyed verdict; the final
  * intersection is a chain of equi-joins on doc_id that AQE co-partitions,
  * and two of the four criteria never shuffle the corpus at all. Order
  * matters only for the optimizer — the cheap map-side predicates (tokens,
  * sampling hash) are applied FIRST on the base relation so the dedup
  * shuffle and the gram explode see a pre-filtered corpus. Cheap-first
  * also changes no results: all four criteria are pure per-doc or
  * per-content verdicts, except dedup's canonical-copy election, which is
  * deliberately computed on the FULL corpus (dropping a canonical doc via
  * sampling must not resurrect its duplicates).
  */
object Curation {

  def curate(docs: DataFrame, benchmark: DataFrame, minTokens: Long = 40L,
      ngram: Int = 5, rate: Double = 0.8, salt: String = "cur"): DataFrame = {
    // map-only predicates evaluated directly on the scan
    val cheap = docs
      .filter(regexp_count(col("text"), lit("\\S+")).cast("long") >= minTokens)
      .filter(Sampling.hash60(col("doc_id"), col("source"), salt)
        < lit(Sampling.threshold(rate)))
    // canonical-copy election over the FULL corpus (see scaladoc)
    val canonical = Dedup.exact(docs).filter(col("keep")).select("doc_id")
    val clean = Dedup.decontaminate(cheap, benchmark, ngram)
      .filter(!col("contaminated")).select("doc_id")
    cheap.select(col("doc_id"), col("source"))
      .join(canonical, "doc_id")
      .join(clean, "doc_id")
  }
}
