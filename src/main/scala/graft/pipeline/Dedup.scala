package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deduplication operators for large-scale document pipelines.
  *
  * All operators are shuffle-lean by construction:
  *  - exact dedup: one shuffle keyed by content hash;
  *  - MinHash+LSH: shingles are aggregated map-side into per-doc signatures
  *    (8 min-aggregates, no hash-index explosion), candidate pairs come from
  *    band-bucket equi-joins — never an O(n^2) cross join;
  *  - SimHash: per-doc 16-bit signature via 16 conditional sums in ONE
  *    aggregation pass; pairs bounded by a blocking key (source);
  *  - n-gram Jaccard: pair generation blocked on (source, gram) so bucket
  *    sizes bound the join fan-out; hot shingles can additionally be salted.
  *
  * Hashing is md5-hex (lexicographic min == numeric min on fixed-width hex;
  * both engines share binary collation), so every step has an exact DuckDB
  * oracle.
  */
object Dedup {

  /** Content hash per document. */
  def contentHash(text: Column): Column = md5(text.cast("binary"))

  /** Exact dedup: keep the lowest doc_id per identical content
    * (hash-groupBy; single shuffle by content hash). */
  def exact(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"), contentHash(col("text")).as("content_hash"))
      .withColumn("keep",
        row_number().over(Window.partitionBy("content_hash").orderBy("doc_id")) === 1)

  /** Character shingles of length k as an exploded (doc_id, sh) relation. */
  def shingles(docs: DataFrame, k: Int): DataFrame =
    docs.select(col("doc_id"),
      explode(expr(s"transform(sequence(1, greatest(length(text) - ${k - 1}, 1))," +
        s" i -> substring(text, i, $k))")).as("sh"))

  /** Per-doc MinHash signature: numHashes min-aggregates over the shingle
    * relation (map-side combinable — no per-hash row explosion). */
  def minhashSignature(docs: DataFrame, k: Int = 5, numHashes: Int = 8): DataFrame = {
    val aggs = (1 to numHashes).map(j =>
      min(md5(concat(lit(s"$j:"), col("sh")).cast("binary"))).as(s"h$j"))
    shingles(docs, k).groupBy("doc_id").agg(aggs.head, aggs.tail: _*)
  }

  /** MinHash+LSH candidate pairs: band signatures (rows-per-band hashes
    * concatenated) bucket the corpus; docs sharing any band bucket are
    * candidates. bands*rowsPerBand = numHashes. */
  def minhashLsh(docs: DataFrame, k: Int = 5, bands: Int = 4,
      rowsPerBand: Int = 2): DataFrame = {
    val numHashes = bands * rowsPerBand
    val sig = minhashSignature(docs, k, numHashes)
    val bandStructs = (0 until bands).map { b =>
      val cols = (1 to rowsPerBand).map(r => col(s"h${b * rowsPerBand + r}"))
      struct(lit(b).as("band"), concat(cols: _*).as("sig"))
    }
    val banded = sig.select(col("doc_id"),
      explode(array(bandStructs: _*)).as("bs"))
      .select(col("doc_id"), col("bs.band").as("band"), col("bs.sig").as("sig"))
    val a = banded.as("a")
    val b = banded.as("b")
    a.join(b, col("a.band") === col("b.band") && col("a.sig") === col("b.sig") &&
        col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
      .distinct()
  }

  /** 16-bit SimHash per doc over distinct whitespace tokens: bit b is set
    * when the signed sum of token-hash bit b is positive. One aggregation
    * pass with 16 conditional sums. */
  def simhash(docs: DataFrame): DataFrame = {
    val toks = docs.select(col("doc_id"),
        explode(split(col("text"), " +")).as("tok"))
      .filter(col("tok") =!= "").distinct()
    // 16-bit token hash from the first 4 hex chars of md5
    val v = conv(substring(md5(col("tok").cast("binary")), 1, 4), 16, 10).cast("long")
    val withV = toks.withColumn("v", v)
    val sums = (0 until 16).map(b =>
      sum(when(shiftright(col("v"), b).bitwiseAND(lit(1L)) === 1L, 1L).otherwise(-1L))
        .as(s"s$b"))
    val agg = withV.groupBy("doc_id").agg(sums.head, sums.tail: _*)
    val sh = (0 until 16).map(b =>
      when(col(s"s$b") > 0, lit(1L << b)).otherwise(lit(0L))).reduce(_ + _)
    agg.select(col("doc_id"), sh.as("simhash"))
  }

  /** SimHash near-dup pairs within a blocking key (hamming <= maxHamming). */
  def simhashPairs(docs: DataFrame, maxHamming: Int = 3): DataFrame = {
    val sh = simhash(docs)
      .join(docs.select(col("doc_id"), col("source")), "doc_id")
    val a = sh.as("a")
    val b = sh.as("b")
    a.join(b, col("a.source") === col("b.source") && col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"),
        bit_count(col("a.simhash").bitwiseXOR(col("b.simhash"))).as("hamming"))
      .filter(col("hamming") <= maxHamming)
  }

  /** n-gram Jaccard similarity for doc pairs within the same source
    * (blocking key bounds the (source, gram) bucket join). */
  def ngramJaccard(docs: DataFrame, k: Int = 4, threshold: Double = 0.6): DataFrame = {
    val grams = docs.select(col("doc_id"), col("source"),
        explode(expr(s"transform(sequence(1, greatest(length(text) - ${k - 1}, 1))," +
          s" i -> substring(text, i, $k))")).as("g"))
      .distinct()
    val sizes = grams.groupBy("doc_id").agg(count(lit(1)).as("sz"))
    val a = grams.as("a")
    val b = grams.as("b")
    val inter = a.join(b, col("a.source") === col("b.source") &&
        col("a.g") === col("b.g") && col("a.doc_id") < col("b.doc_id"))
      .groupBy(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
      .agg(count(lit(1)).as("inter"))
    inter
      .join(sizes.withColumnRenamed("doc_id", "doc_a").withColumnRenamed("sz", "sa"), "doc_a")
      .join(sizes.withColumnRenamed("doc_id", "doc_b").withColumnRenamed("sz", "sb"), "doc_b")
      .withColumn("jaccard",
        col("inter").cast("double") / (col("sa") + col("sb") - col("inter")).cast("double"))
      .filter(col("jaccard") >= threshold)
      .select("doc_a", "doc_b", "jaccard")
  }
}
