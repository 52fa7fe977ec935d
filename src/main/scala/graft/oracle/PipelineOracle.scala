package graft.oracle

import graft.pipeline.TextAnalysis

/** DuckDB oracle SQL for the pipeline operators (graft.pipeline.*).
  *
  * Same semantics as the Spark implementations, re-expressed in DuckDB's
  * dialect: md5 hex hashing, ordered aggregates for fold-order-identical
  * dot products, length-replace occurrence counting, exact integer
  * rolling hashes.
  */
object PipelineOracle {

  /** SQL string literal with single quotes doubled — interpolated source
    * names / salts must not break or alter the oracle query. */
  private def q(s: String): String = "'" + s.replace("'", "''") + "'"

  val dedupExact: String =
    "SELECT doc_id, md5(text) AS content_hash, " +
      "ROW_NUMBER() OVER (PARTITION BY md5(text) ORDER BY doc_id) = 1 AS keep " +
      "FROM documents"

  /** Mirrors Dedup.exactNormalized ('g' flag: DuckDB's regexp_replace is
    * first-match-only by default, Spark's is global). */
  val dedupNormalized: String =
    "WITH n AS (SELECT doc_id, " +
      "md5(lower(regexp_replace(trim(text), '\\s+', ' ', 'g'))) AS content_hash " +
      "FROM documents) " +
      "SELECT doc_id, content_hash, " +
      "ROW_NUMBER() OVER (PARTITION BY content_hash ORDER BY doc_id) = 1 AS keep FROM n"

  /** Mirrors StreamingHist.streamingDedup run on a batch frame: with empty
    * initial state each hash group is processed once and the lowest doc_id
    * is the first_seen event — exactly the exact-dedup keep rule. */
  val streamDedup: String =
    "SELECT doc_id, md5(text) AS content_hash, " +
      "ROW_NUMBER() OVER (PARTITION BY md5(text) ORDER BY doc_id) = 1 AS first_seen " +
      "FROM documents"

  /** Mirrors TextAnalysis.bpeTokens: per-word BPE encoding as a recursive
    * CTE. Each step merges the LEFTMOST occurrence of the minimum-rank
    * adjacent symbol pair — exactly BpeVocab.encodeCount's loop — and the
    * merge table is interpolated from BpeVocab.merges, so the vocabulary
    * has a single source of truth and the gate re-proves the merge LOOP
    * itself (not a pinned fixture). Distinct words are encoded once;
    * per-doc counts come from joining the instance relation back. */
  /** The recursive per-word encode CTEs (__w instances, __dw distinct
    * words, __enc merge loop, __wc terminal counts, __bpe per-doc totals)
    * — shared by the q97 gate and the BPE-budgeted sampling oracle. */
  private def bpeCtes: String = {
    import graft.functions.BpeVocab
    val rankMap = BpeVocab.merges.zipWithIndex
      .map { case ((a, b), i) => s"${q(a + " " + b)}: $i" }
      .mkString("MAP {", ", ", "}")
    val miss = 1000000
    s"__w AS (SELECT doc_id, UNNEST(regexp_extract_all(text, ${q(BpeVocab.WordRe)})) AS word FROM documents), " +
      "__dw AS (SELECT DISTINCT word FROM __w), " +
      "__enc AS (" +
      "SELECT word, list_transform(generate_series(1, length(word)), i -> substr(word, i, 1)) AS toks FROM __dw " +
      "UNION ALL " +
      "SELECT word, list_concat(list_concat(list_slice(toks, 1, pos-1), " +
      "[toks[pos] || toks[pos+1]]), list_slice(toks, pos+2, len(toks))) AS toks " +
      "FROM (SELECT word, toks, list_min(ranks) AS bestr, " +
      "list_position(ranks, list_min(ranks)) AS pos " +
      "FROM (SELECT word, toks, list_transform(generate_series(1, len(toks)-1), " +
      s"i -> coalesce(map_extract($rankMap, toks[i] || ' ' || toks[i+1])[1], $miss)) AS ranks " +
      s"FROM __enc)) WHERE bestr < $miss), " +
      "__wc AS (SELECT word, len(toks) AS n FROM __enc " +
      "QUALIFY ROW_NUMBER() OVER (PARTITION BY word ORDER BY len(toks)) = 1), " +
      "__bpe AS (SELECT d.doc_id, CAST(COALESCE(SUM(__wc.n), 0) AS BIGINT) AS n_bpe_tokens " +
      "FROM documents d LEFT JOIN __w ON __w.doc_id = d.doc_id " +
      "LEFT JOIN __wc ON __wc.word = __w.word GROUP BY d.doc_id)"
  }

  def bpeTokens: String =
    s"WITH RECURSIVE $bpeCtes SELECT doc_id, n_bpe_tokens FROM __bpe"

  /** Mirrors TextAnalysis.bpeEncode: the same recursive merge loop, but
    * keeping each word's FINAL token list (the minimal-length __enc row)
    * and flattening back in document order — pos = exclusive cumsum of
    * preceding words' token counts + the within-word index. */
  def bpeEncodeSeq(where: String = "TRUE"): String = {
    import graft.functions.BpeVocab
    val rankMap = BpeVocab.merges.zipWithIndex
      .map { case ((a, b), i) => s"${q(a + " " + b)}: $i" }
      .mkString("MAP {", ", ", "}")
    s"WITH RECURSIVE ${bpeEncodeChain(where, rankMap, "")} $bpeEncodeSelect"
  }

  /** The encode CTE chain, parameterized over the rank lookup: `mapExpr`
    * is a map VALUE expression (a literal MAP for the embedded vocab; a
    * cross-joined column for a trained table via `extraJoin`). */
  private def bpeEncodeChain(where: String, mapExpr: String,
      extraJoin: String): String = {
    import graft.functions.BpeVocab
    val miss = 1000000
    val arr = s"regexp_extract_all(text, ${q(BpeVocab.WordRe)})"
    s"__w AS (SELECT doc_id, UNNEST($arr) AS word, generate_subscripts($arr, 1) AS wi " +
      s"FROM documents WHERE $where), " +
      "__dw AS (SELECT DISTINCT word FROM __w), " +
      "__enc AS (" +
      "SELECT word, list_transform(generate_series(1, length(word)), i -> substr(word, i, 1)) AS toks FROM __dw " +
      "UNION ALL " +
      "SELECT word, list_concat(list_concat(list_slice(toks, 1, pos-1), " +
      "[toks[pos] || toks[pos+1]]), list_slice(toks, pos+2, len(toks))) AS toks " +
      "FROM (SELECT word, toks, list_min(ranks) AS bestr, " +
      "list_position(ranks, list_min(ranks)) AS pos " +
      "FROM (SELECT word, toks, list_transform(generate_series(1, len(toks)-1), " +
      s"i -> coalesce(map_extract($mapExpr, toks[i] || ' ' || toks[i+1])[1], $miss)) AS ranks " +
      s"FROM __enc$extraJoin)) WHERE bestr < $miss), " +
      "__wt AS (SELECT word, toks FROM __enc " +
      "QUALIFY ROW_NUMBER() OVER (PARTITION BY word ORDER BY len(toks)) = 1), " +
      "__doc AS (SELECT w.doc_id, w.wi, t.toks FROM __w w JOIN __wt t USING (word)), " +
      "__cum AS (SELECT doc_id, wi, toks, COALESCE(SUM(len(toks)) OVER " +
      "(PARTITION BY doc_id ORDER BY wi ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS base FROM __doc)"
  }

  private val bpeEncodeSelect: String =
    "SELECT doc_id, CAST(base + generate_subscripts(toks, 1) - 1 AS BIGINT) AS pos, " +
      "UNNEST(toks) AS token FROM __cum"

  /** Mirrors TextAnalysis.bpeEncodeWith ∘ bpeTrain: the full
    * train-then-tokenize loop in one query — the trained merge table
    * (bpeTrain's CTE blocks) is collapsed to a rank MAP and drives the
    * same encode recursion the embedded-vocab oracle runs. Rank values
    * are 1-based here vs the literal map's 0-based; only relative order
    * reaches the merge loop. */
  def bpeEncodeTrained(nMerges: Int, trainWhere: String,
      encodeWhere: String): String = {
    val out = (1 to nMerges).map(k =>
      s"SELECT CAST($k AS INT) AS rank, l, r FROM b$k").mkString(" UNION ALL ")
    s"WITH RECURSIVE ${bpeTrainCtes(nMerges, trainWhere)}, " +
      s"__tm AS MATERIALIZED ($out), " +
      "__rm AS MATERIALIZED (SELECT MAP(list(l || ' ' || r ORDER BY rank), " +
      "list(rank ORDER BY rank)) AS m FROM __tm), " +
      s"${bpeEncodeChain(encodeWhere, "m", " CROSS JOIN __rm")} $bpeEncodeSelect"
  }

  /** Mirrors TextAnalysis.bpeTrain: the same trainer unrolled — one CTE
    * block per merge rank k: pair counts (pK: ordinary GROUP BY over the
    * word table), argmax with the (c DESC, l, r) tie-break (bK: ORDER BY
    * LIMIT 1), and a RECURSIVE apply (aK: splice the FIRST occurrence of
    * the pair until none remains — for a single fixed pair that equals
    * the trainer's left-to-right non-overlapping mergeAll, because a
    * merge of (l,r) can never create an earlier (l,r) occurrence), with
    * wK picking each word's shortest (= final) state. Every chained CTE
    * is AS MATERIALIZED: inlined, the k-level chain re-expands ~3^k ways
    * and the planner never returns at k = 12 (measured hang → 0.7 s). */
  def bpeTrain(nMerges: Int, where: String = "TRUE"): String = {
    val out = (1 to nMerges).map(k =>
      s"SELECT CAST($k AS INT) AS rank, l AS lhs, r AS rhs, c AS pair_count FROM b$k")
      .mkString(" UNION ALL ")
    s"WITH RECURSIVE ${bpeTrainCtes(nMerges, where)} $out"
  }

  /** The trainer's CTE blocks alone (w0, p/b/a/w per rank) — shared by
    * [[bpeTrain]] and the composed [[bpeEncodeTrained]]. */
  private def bpeTrainCtes(nMerges: Int, where: String): String = {
    import graft.functions.BpeVocab
    val arr = s"regexp_extract_all(text, ${q(BpeVocab.WordRe)})"
    val w0 = s"w0 AS MATERIALIZED (SELECT w, list_transform(generate_series(1, length(w)), i -> substr(w, i, 1)) AS toks, " +
      s"CAST(COUNT(*) AS BIGINT) AS cnt FROM " +
      s"(SELECT UNNEST($arr) AS w FROM documents WHERE $where) GROUP BY w)"
    val blocks = (1 to nMerges).map { k =>
      val prev = s"w${k - 1}"
      s"p$k AS MATERIALIZED (SELECT l, r, CAST(SUM(cnt) AS BIGINT) AS c FROM " +
        s"(SELECT cnt, toks[i] AS l, toks[i + 1] AS r FROM " +
        s"(SELECT toks, cnt, UNNEST(generate_series(1, len(toks) - 1)) AS i " +
        s"FROM $prev WHERE len(toks) >= 2)) GROUP BY l, r), " +
        s"b$k AS MATERIALIZED (SELECT l, r, c FROM p$k ORDER BY c DESC, l, r LIMIT 1), " +
        s"a$k AS (SELECT w, toks, cnt FROM $prev " +
        "UNION ALL " +
        "SELECT w, list_concat(list_concat(toks[1:CAST(pos - 1 AS INT)], [ml || mr]), " +
        "toks[CAST(pos + 2 AS INT):len(toks)]) AS toks, cnt FROM " +
        s"(SELECT a.w AS w, a.toks AS toks, a.cnt AS cnt, b.l AS ml, b.r AS mr, " +
        "list_min(list_filter(generate_series(1, len(a.toks) - 1), " +
        s"i -> a.toks[i] = b.l AND a.toks[i + 1] = b.r)) AS pos " +
        s"FROM a$k a, b$k b) WHERE pos IS NOT NULL), " +
        s"w$k AS MATERIALIZED (SELECT w, toks, cnt FROM a$k " +
        "QUALIFY ROW_NUMBER() OVER (PARTITION BY w ORDER BY len(toks)) = 1)"
    }.mkString(", ")
    s"$w0, $blocks"
  }

  /** Mirrors Sampling.sampleTokenBudget with the BPE counter: per-source
    * totals over __bpe, same hash-threshold filter. */
  def sampleTokenBudgetBpe(budgetTokens: Long, salt: String): String = {
    val scale = java.lang.Double.toString(math.pow(2.0, 60))
    s"WITH RECURSIVE $bpeCtes, " +
      "t AS (SELECT d.source, CAST(SUM(b.n_bpe_tokens) AS BIGINT) AS tot " +
      "FROM documents d JOIN __bpe b ON b.doc_id = d.doc_id GROUP BY d.source) " +
      "SELECT d.doc_id, d.source FROM documents d JOIN t USING (source) " +
      s"WHERE ('0x' || substr(md5(CAST(d.doc_id AS VARCHAR) || ':' || d.source || ':' || ${q(salt)}), 1, 15))::BIGINT " +
      s"< CAST(FLOOR(LEAST(CAST(1.0 AS DOUBLE), CAST($budgetTokens AS DOUBLE) / CAST(tot AS DOUBLE)) * CAST('$scale' AS DOUBLE)) AS BIGINT)"
  }

  /** Mirrors Sampling.packSequences with the BPE counter: the __bpe
    * counts feed the identical shard / (hash, doc_id) / cumsum layout. */
  def packSequencesBpe(contextLen: Long, nShards: Int, salt: String): String =
    s"WITH RECURSIVE $bpeCtes, " +
      "__pd AS (SELECT d.doc_id, d.source, b.n_bpe_tokens AS n_tokens, " +
      s"('0x' || substr(md5(CAST(d.doc_id AS VARCHAR) || ':' || d.source || ':' || ${q(salt)}), 1, 15))::BIGINT AS hh " +
      "FROM documents d JOIN __bpe b ON b.doc_id = d.doc_id), " +
      s"__ps AS (SELECT *, CAST(hh % $nShards AS INT) AS shard FROM __pd), " +
      "__pc AS (SELECT *, CAST(COALESCE(SUM(n_tokens) OVER " +
      "(PARTITION BY shard ORDER BY hh, doc_id ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS cum FROM __ps) " +
      s"SELECT doc_id, source, shard, n_tokens, CAST(cum // $contextLen AS BIGINT) AS pack, " +
      s"CAST(cum % $contextLen AS BIGINT) AS pack_offset FROM __pc"

  /** Mirrors TextAnalysis.patternCounts (RE2/Java-regex-agreeing patterns). */
  val patternCounts: String =
    "SELECT doc_id, " +
      "CAST(len(regexp_extract_all(text, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}')) AS BIGINT) AS n_emails, " +
      "CAST(len(regexp_extract_all(text, 'https?://[^\\s]+')) AS BIGINT) AS n_urls, " +
      "CAST(len(regexp_extract_all(text, '[0-9]{6,}')) AS BIGINT) AS n_digit_runs " +
      "FROM documents"

  /** CTE chain ending in cand(doc_a, doc_b) — MinHash+LSH candidates. */
  /** CTE chain sh/hh/sig/banded — per-doc MinHash signatures exploded
    * into band rows, shared by the self-join and bipartite candidates. */
  private def minhashBandCtes(k: Int, bands: Int, rowsPerBand: Int): String = {
    import graft.pipeline.Dedup.{mhA, mhB, MhMod}
    val numHashes = bands * rowsPerBand
    val mins = (1 to numHashes)
      .map(j => s"min((${mhA(j)} * h + ${mhB(j)}) % $MhMod) AS h$j").mkString(", ")
    val rowNames = (1 to rowsPerBand).map(r => s"s$r")
    val bandSelects = (0 until bands).map { b =>
      val cols = (0 until rowsPerBand)
        .map(r => s"h${b * rowsPerBand + r + 1} AS ${rowNames(r)}").mkString(", ")
      s"SELECT doc_id, $b AS band, $cols FROM sig"
    }.mkString(" UNION ALL ")
    s"sh AS (SELECT doc_id, substring(text, CAST(i AS INT), $k) AS sh " +
      s"FROM (SELECT doc_id, text, UNNEST(generate_series(1, greatest(length(text) - ${k - 1}, 1))) AS i FROM documents)), " +
      s"hh AS (SELECT doc_id, ('0x' || substr(md5(sh), 1, 15))::BIGINT % $MhMod AS h FROM sh), " +
      s"sig AS (SELECT doc_id, $mins FROM hh GROUP BY doc_id), " +
      s"banded AS ($bandSelects)"
  }

  private def bandJoinKeys(rowsPerBand: Int): String =
    ("band" +: (1 to rowsPerBand).map(r => s"s$r"))
      .map(c => s"a.$c = b.$c").mkString(" AND ")

  private def minhashCandCtes(k: Int, bands: Int, rowsPerBand: Int): String =
    s"${minhashBandCtes(k, bands, rowsPerBand)}, " +
      "cand AS (SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b " +
      s"FROM banded a JOIN banded b ON ${bandJoinKeys(rowsPerBand)} AND a.doc_id < b.doc_id)"

  def minhashLsh(k: Int = 5, bands: Int = 16, rowsPerBand: Int = 4): String =
    s"WITH ${minhashCandCtes(k, bands, rowsPerBand)} SELECT doc_a, doc_b FROM cand"

  /** Mirrors Dedup.blockingReport: the banded CTEs, per-bucket exact
    * s(s−1)/2, HUGEINT totals, the identical ratio op order. */
  def blockingReport(k: Int = 5, bands: Int = 16,
      rowsPerBand: Int = 4): String = {
    val keys = ("band" +: (1 to rowsPerBand).map(r => s"s$r")).mkString(", ")
    s"WITH ${minhashBandCtes(k, bands, rowsPerBand)}, " +
      s"bu AS (SELECT $keys, CAST(COUNT(*) AS BIGINT) AS s FROM banded GROUP BY $keys), " +
      "nd AS (SELECT CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS n_docs FROM banded), " +
      "m AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_buckets, " +
      "CAST(SUM(CASE WHEN s = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_singletons, " +
      "CAST(MAX(s) AS BIGINT) AS max_bucket, " +
      "SUM(CAST(s * (s - 1) // 2 AS HUGEINT)) AS cand FROM bu) " +
      "SELECT n_docs, n_buckets, n_singletons, max_bucket, " +
      "CAST(cand AS BIGINT) AS candidate_pairs, " +
      "CASE WHEN n_docs < 2 THEN CAST(NULL AS DOUBLE) " +
      "ELSE CAST(cand AS DOUBLE) / " +
      "(CAST(CAST(n_docs AS HUGEINT) * CAST(n_docs - 1 AS HUGEINT) AS DOUBLE) / " +
      "CAST('2.0' AS DOUBLE)) END AS reduction_ratio FROM m CROSS JOIN nd"
  }

  /** Mirrors Dedup.crossNearDup: same signature/banding CTEs computed over
    * the full documents table (A and B are doc_id slices of it, and
    * per-doc signatures are side-independent), each side carved out by an
    * UNQUALIFIED predicate over banded rows (e.g. "doc_id < 100", "TRUE"),
    * optionally bucket-capped per side exactly as the Spark form (lowest
    * doc_ids per band bucket AFTER the side filter), then bipartite-joined
    * and verified with the same exact k-gram jaccard. */
  def crossNearDup(aWhere: String, bWhere: String, k: Int = 5,
      threshold: Double = 0.7, bands: Int = 16, rowsPerBand: Int = 4,
      bucketCap: Option[Int] = None): String = {
    val jac = "CAST(inter AS DOUBLE) / CAST(sa.sz + sb.sz - inter AS DOUBLE)"
    val bandCols = ("band" +: (1 to rowsPerBand).map(r => s"s$r")).mkString(", ")
    def side(name: String, where: String): String = bucketCap match {
      case Some(cap) =>
        s"$name AS (SELECT doc_id, $bandCols FROM " +
          s"(SELECT *, ROW_NUMBER() OVER (PARTITION BY $bandCols ORDER BY doc_id) AS __rn " +
          s"FROM banded WHERE ($where)) WHERE __rn <= $cap)"
      case None =>
        s"$name AS (SELECT doc_id, $bandCols FROM banded WHERE ($where))"
    }
    s"WITH ${minhashBandCtes(k, bands, rowsPerBand)}, " +
      s"${side("banded_a", aWhere)}, ${side("banded_b", bWhere)}, " +
      "cand AS (SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b " +
      s"FROM banded_a a JOIN banded_b b ON ${bandJoinKeys(rowsPerBand)} AND a.doc_id <> b.doc_id), " +
      s"g AS (SELECT DISTINCT doc_id, substring(text, CAST(i AS INT), $k) AS g " +
      s"FROM (SELECT doc_id, text, UNNEST(generate_series(1, greatest(length(text) - ${k - 1}, 1))) AS i FROM documents)), " +
      "sz AS (SELECT doc_id, COUNT(*) AS sz FROM g GROUP BY doc_id), " +
      "inter AS (SELECT cand.doc_a, cand.doc_b, COUNT(*) AS inter FROM cand " +
      "JOIN g ga ON ga.doc_id = cand.doc_a " +
      "JOIN g gb ON gb.doc_id = cand.doc_b AND gb.g = ga.g GROUP BY 1, 2) " +
      s"SELECT doc_a, doc_b, $jac AS jaccard " +
      "FROM inter JOIN sz sa ON sa.doc_id = doc_a JOIN sz sb ON sb.doc_id = doc_b " +
      s"WHERE $jac >= CAST('${java.lang.Double.toString(threshold)}' AS DOUBLE)"
  }

  /** Two-stage near-dup: minhash candidates verified with exact k-gram
    * jaccard (mirrors Dedup.nearDupPairs; gram hashing is engine-internal —
    * jaccard over gram SETS is hash-independent). */
  def nearDupPairs(k: Int = 5, threshold: Double = 0.7, bands: Int = 16,
      rowsPerBand: Int = 4): String = {
    val jac = "CAST(inter AS DOUBLE) / CAST(sa.sz + sb.sz - inter AS DOUBLE)"
    s"WITH ${minhashCandCtes(k, bands, rowsPerBand)}, " +
      s"g AS (SELECT DISTINCT doc_id, substring(text, CAST(i AS INT), $k) AS g " +
      s"FROM (SELECT doc_id, text, UNNEST(generate_series(1, greatest(length(text) - ${k - 1}, 1))) AS i FROM documents)), " +
      "sz AS (SELECT doc_id, COUNT(*) AS sz FROM g GROUP BY doc_id), " +
      "inter AS (SELECT cand.doc_a, cand.doc_b, COUNT(*) AS inter FROM cand " +
      "JOIN g ga ON ga.doc_id = cand.doc_a " +
      "JOIN g gb ON gb.doc_id = cand.doc_b AND gb.g = ga.g GROUP BY 1, 2) " +
      s"SELECT doc_a, doc_b, $jac AS jaccard " +
      "FROM inter JOIN sz sa ON sa.doc_id = doc_a JOIN sz sb ON sb.doc_id = doc_b " +
      s"WHERE $jac >= CAST('${java.lang.Double.toString(threshold)}' AS DOUBLE)"
  }

  /** Mirrors RankStats.bestThreshold: the [[auc]] CTEs plus totals,
    * the per-candidate tp/fp/fn identities, the identical IEEE
    * precision/recall/F1 tail, argmax as ORDER BY f1 DESC, v LIMIT 1. */
  def bestThreshold(posCond: String): String = {
    val prec = "(CAST(tp AS DOUBLE) / CAST(tp + fp AS DOUBLE))"
    val rec = "(CAST(tp AS DOUBLE) / CAST(pt AS DOUBLE))"
    val f1 = s"(CAST(2 AS DOUBLE) * $prec * $rec / ($prec + $rec))"
    "WITH s AS (SELECT CAST(value AS DOUBLE) AS v, " +
      s"CAST(SUM(CASE WHEN $posCond THEN 1 ELSE 0 END) AS BIGINT) AS p, " +
      s"CAST(SUM(CASE WHEN $posCond THEN 0 ELSE 1 END) AS BIGINT) AS n " +
      "FROM events WHERE value IS NOT NULL AND NOT isnan(CAST(value AS DOUBLE)) " +
      "GROUP BY CAST(value AS DOUBLE)), " +
      "c AS (SELECT v, p, n, " +
      "CAST(COALESCE(SUM(p) OVER (ORDER BY v ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS cp, " +
      "CAST(COALESCE(SUM(n) OVER (ORDER BY v ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS cn FROM s), " +
      "tot AS (SELECT CAST(COALESCE(SUM(p), 0) AS BIGINT) AS pt, " +
      "CAST(COALESCE(SUM(n), 0) AS BIGINT) AS nt FROM s), " +
      "r AS (SELECT v, pt - cp AS tp, nt - cn AS fp, cp AS fn, pt " +
      "FROM c CROSS JOIN tot WHERE pt > 0 AND nt > 0), " +
      "x AS (SELECT v AS threshold, tp, fp, fn, " +
      s"CASE WHEN tp = 0 THEN CAST(NULL AS DOUBLE) ELSE $prec END AS precision, " +
      s"$rec AS recall, " +
      s"CASE WHEN tp = 0 THEN CAST(0 AS DOUBLE) ELSE $f1 END AS f1 FROM r) " +
      "SELECT threshold, tp, fp, fn, precision, recall, f1 FROM x " +
      "ORDER BY f1 DESC, threshold ASC LIMIT 1"
  }

  /** Mirrors StreamingHist.windowedAuc over score = value/512: hourly
    * windows, per-(window, bin) class counts, the per-window 2U fold
    * as a window cumsum partitioned by window, one IEEE division. */
  def windowedAuc(posCond: String, nBins: Int = 64): String = {
    val s = "LEAST(GREATEST(CAST(value AS DOUBLE) / CAST(512 AS DOUBLE), " +
      "CAST(0 AS DOUBLE)), CAST(1 AS DOUBLE))"
    "WITH b AS (SELECT make_timestamp(((epoch_ns(ts) // 1000) // 3600000000) * 3600000000) AS ws, " +
      s"LEAST(CAST(FLOOR($s * CAST($nBins AS DOUBLE)) AS BIGINT), ${nBins - 1}) AS bin, " +
      s"CASE WHEN $posCond THEN 1 ELSE 0 END AS y FROM events " +
      "WHERE ts IS NOT NULL AND value IS NOT NULL AND NOT isnan(CAST(value AS DOUBLE))), " +
      "g AS (SELECT ws, bin, CAST(SUM(y) AS BIGINT) AS p, " +
      "CAST(SUM(1 - y) AS BIGINT) AS n FROM b GROUP BY ws, bin), " +
      "c AS (SELECT ws, bin, p, n, CAST(COALESCE(SUM(n) OVER (PARTITION BY ws " +
      "ORDER BY bin ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS cn FROM g), " +
      "t AS (SELECT ws, CAST(SUM(p) AS BIGINT) AS tp, CAST(SUM(n) AS BIGINT) AS tn, " +
      "CAST(SUM(p * (cn * 2 + n)) AS BIGINT) AS u2 FROM c GROUP BY ws) " +
      "SELECT ws AS window_start, tp AS n_pos, tn AS n_neg, " +
      "CASE WHEN tp = 0 OR tn = 0 THEN CAST(NULL AS DOUBLE) " +
      "ELSE CAST(u2 AS DOUBLE) / (CAST(2 AS DOUBLE) * CAST(tp AS DOUBLE) * " +
      "CAST(tn AS DOUBLE)) END AS auc FROM t"
  }

  /** Mirrors RankStats.logisticFit over x = value/512: the distinct-
    * feature CTE, `iters` unrolled MATERIALIZED gradient rounds
    * (1e-9-quantized sigmoid, 1e-6-integer gradient sums, the
    * identical IEEE update sequence), and the final quantized-ln
    * cross-entropy. */
  def logisticFit(posCond: String, iters: Int, lr: Double): String = {
    val six = "CAST('1000000.0' AS DOUBLE)"
    val nine = "CAST('1.0E9' AS DOUBLE)"
    val lrL = s"CAST('${java.lang.Double.toString(lr)}' AS DOUBLE)"
    def qsig(z: String) =
      s"(FLOOR((CAST(1 AS DOUBLE) / (CAST(1 AS DOUBLE) + EXP(-($z)))) * $nine) / $nine)"
    def qln(x: String) = s"(FLOOR(LN($x) * $nine) / $nine)"
    def resid(wb: String) =
      s"(CAST(p AS DOUBLE) - CAST(p + n AS DOUBLE) * ${qsig(wb)})"
    val rounds = (1 to iters).map { k =>
      val prev = if (k == 1) "r0" else s"r${k - 1}"
      val rd = resid("w * v + b")
      s"g$k AS MATERIALIZED (SELECT w, b, " +
        s"CAST(SUM(CAST(FLOOR($rd * v * $six) AS DECIMAL(38,0))) AS DECIMAL(38,0)) AS sw, " +
        s"CAST(SUM(CAST(FLOOR($rd * $six) AS DECIMAL(38,0))) AS DECIMAL(38,0)) AS sb " +
        s"FROM s CROSS JOIN $prev GROUP BY w, b), " +
        s"r$k AS MATERIALIZED (SELECT w + $lrL * (CAST(sw AS DOUBLE) / $six / nd) AS w, " +
        s"b + $lrL * (CAST(sb AS DOUBLE) / $six / nd) AS b FROM g$k CROSS JOIN t)"
    }.mkString(", ")
    val sC = s"LEAST(GREATEST(${qsig("w * v + b")}, CAST('1.0E-9' AS DOUBLE)), " +
      s"CAST('${java.lang.Double.toString(1.0 - 1.0e-9)}' AS DOUBLE))"
    val lterm = s"(-(CAST(p AS DOUBLE) * ${qln("sc")} + " +
      s"CAST(n AS DOUBLE) * ${qln("CAST(1 AS DOUBLE) - sc")}))"
    "WITH s AS MATERIALIZED (SELECT CAST(value AS DOUBLE) / CAST(512 AS DOUBLE) AS v, " +
      s"CAST(SUM(CASE WHEN $posCond THEN 1 ELSE 0 END) AS BIGINT) AS p, " +
      s"CAST(SUM(CASE WHEN $posCond THEN 0 ELSE 1 END) AS BIGINT) AS n " +
      "FROM events WHERE value IS NOT NULL AND NOT isnan(CAST(value AS DOUBLE)) " +
      "GROUP BY CAST(value AS DOUBLE) / CAST(512 AS DOUBLE)), " +
      "t AS MATERIALIZED (SELECT CAST(COALESCE(SUM(p), 0) AS BIGINT) AS pt, " +
      "CAST(COALESCE(SUM(n), 0) AS BIGINT) AS nt, " +
      "CAST(CAST(COALESCE(SUM(p), 0) + COALESCE(SUM(n), 0) AS BIGINT) AS DOUBLE) AS nd FROM s), " +
      "r0 AS (SELECT CAST(0 AS DOUBLE) AS w, CAST(0 AS DOUBLE) AS b), " +
      s"$rounds, " +
      s"lf AS (SELECT w, b, sc, p, n FROM (SELECT w, b, $sC AS sc, p, n " +
      s"FROM s CROSS JOIN r$iters) q), " +
      "ls AS (SELECT w, b, " +
      s"CAST(SUM(CAST(FLOOR($lterm * $six) AS DECIMAL(38,0))) AS DECIMAL(38,0)) AS sl " +
      "FROM lf GROUP BY w, b) " +
      "SELECT t.pt AS n_pos, t.nt AS n_neg, ls.w, ls.b, " +
      s"CAST(ls.sl AS DOUBLE) / $six / t.nd AS loss FROM ls CROSS JOIN t"
  }

  /** Mirrors RankStats.calibratedEval: the full unrolled
    * [[logisticFit]] nested as the `fit` CTE, every row scored with
    * the quantized σ(w·x+b), then the [[reliability]] arithmetic on
    * the calibrated score with w/b carried through. */
  def calibratedEval(posCond: String, iters: Int, lr: Double,
      nBins: Int = 10): String = {
    val nine = "CAST('1.0E9' AS DOUBLE)"
    val x = "(CAST(value AS DOUBLE) / CAST(512 AS DOUBLE))"
    val sRaw = s"(FLOOR((CAST(1 AS DOUBLE) / (CAST(1 AS DOUBLE) + " +
      s"EXP(-(fit.w * $x + fit.b)))) * $nine) / $nine)"
    val s = s"LEAST(GREATEST($sRaw, CAST(0 AS DOUBLE)), CAST(1 AS DOUBLE))"
    val conf = Oracle.exactDbl("SUM(TRY_CAST(CAST(s AS VARCHAR) AS DECIMAL(38,14)))") +
      " / CAST(COUNT(*) AS DOUBLE)"
    s"WITH fit AS (${logisticFit(posCond, iters, lr)}), " +
      s"b0 AS (SELECT LEAST(CAST(FLOOR(s * CAST($nBins AS DOUBLE)) AS BIGINT), " +
      s"${nBins - 1}) AS bin, s, y, w, b FROM " +
      s"(SELECT $s AS s, CASE WHEN $posCond THEN 1 ELSE 0 END AS y, " +
      "fit.w AS w, fit.b AS b FROM events CROSS JOIN fit " +
      "WHERE value IS NOT NULL AND NOT isnan(CAST(value AS DOUBLE))) src), " +
      "r AS (SELECT bin, CAST(COUNT(*) AS BIGINT) AS n, " +
      s"CAST(SUM(y) AS BIGINT) AS pos, $conf AS conf, " +
      s"CAST(CAST(SUM(y) AS BIGINT) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE) AS acc, " +
      s"ABS($conf - CAST(CAST(SUM(y) AS BIGINT) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE)) AS gap, " +
      "MAX(w) AS w, MAX(b) AS b FROM b0 GROUP BY bin), " +
      "tt AS (SELECT CAST(COALESCE(SUM(n), 0) AS BIGINT) AS tot FROM r), " +
      "e AS (SELECT SUM(CAST(n AS DOUBLE) / CAST(tot AS DOUBLE) * gap ORDER BY bin) AS ece " +
      "FROM r CROSS JOIN tt) " +
      "SELECT r.bin, r.n, r.pos, r.conf, r.acc, r.gap, e.ece, r.w, r.b " +
      "FROM r CROSS JOIN e"
  }

  /** Mirrors RankStats.prCurve: the [[bestThreshold]] sweep CTEs,
    * eleven conditional maxes with the integer cross-multiplied recall
    * comparisons, AP as the ordered 11-point mean. */
  def prCurve(posCond: String): String = {
    val prec = "(CAST(tp AS DOUBLE) / CAST(tp + fp AS DOUBLE))"
    val maxes = (0 to 10).map { l =>
      s"MAX(CASE WHEN tp * 10 >= $l * pt THEN $prec END) AS m$l"
    }.mkString(", ")
    val gridRows = (0 to 10).map { l =>
      s"(CAST('${java.lang.Double.toString(l.toDouble / 10.0)}' AS DOUBLE), $l)"
    }.mkString(", ")
    val pick = "CASE gl " + (0 to 10).map(l => s"WHEN $l THEN m$l")
      .mkString(" ", " ", " END")
    "WITH s AS (SELECT CAST(value AS DOUBLE) AS v, " +
      s"CAST(SUM(CASE WHEN $posCond THEN 1 ELSE 0 END) AS BIGINT) AS p, " +
      s"CAST(SUM(CASE WHEN $posCond THEN 0 ELSE 1 END) AS BIGINT) AS n " +
      "FROM events WHERE value IS NOT NULL AND NOT isnan(CAST(value AS DOUBLE)) " +
      "GROUP BY CAST(value AS DOUBLE)), " +
      "c AS (SELECT v, p, n, " +
      "CAST(COALESCE(SUM(p) OVER (ORDER BY v ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS cp, " +
      "CAST(COALESCE(SUM(n) OVER (ORDER BY v ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS cn FROM s), " +
      "tot AS (SELECT CAST(COALESCE(SUM(p), 0) AS BIGINT) AS pt, " +
      "CAST(COALESCE(SUM(n), 0) AS BIGINT) AS nt FROM s), " +
      "r AS (SELECT pt - cp AS tp, nt - cn AS fp " +
      "FROM c CROSS JOIN tot WHERE pt > 0 AND nt > 0), " +
      s"m AS (SELECT CAST(COUNT(*) AS BIGINT) AS cnt, $maxes FROM r CROSS JOIN tot " +
      "WHERE pt > 0 AND nt > 0), " +
      s"g AS (SELECT * FROM (VALUES $gridRows) v(recall_level, gl)), " +
      s"curve AS (SELECT recall_level, COALESCE($pick, CAST(0 AS DOUBLE)) AS precision " +
      "FROM g CROSS JOIN m WHERE cnt > 0), " +
      "a AS (SELECT SUM(precision ORDER BY recall_level) / CAST(11 AS DOUBLE) AS ap FROM curve) " +
      "SELECT curve.recall_level, curve.precision, a.ap FROM curve CROSS JOIN a"
  }

  /** Mirrors RankStats.aucByGroup keyed by event day: the [[auc]] CTEs
    * with the cumsum window PARTITIONED BY day. */
  def aucByDay(posCond: String): String =
    "WITH s AS (SELECT (epoch_ns(ts) // 1000) // 86400000000 AS day, " +
      "CAST(value AS DOUBLE) AS v, " +
      s"CAST(SUM(CASE WHEN $posCond THEN 1 ELSE 0 END) AS BIGINT) AS p, " +
      s"CAST(SUM(CASE WHEN $posCond THEN 0 ELSE 1 END) AS BIGINT) AS n " +
      "FROM events WHERE value IS NOT NULL AND NOT isnan(CAST(value AS DOUBLE)) " +
      "AND ts IS NOT NULL GROUP BY 1, 2), " +
      "c AS (SELECT day, v, p, n, CAST(COALESCE(SUM(n) OVER (PARTITION BY day " +
      "ORDER BY v ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS cn FROM s), " +
      "t AS (SELECT day, CAST(COALESCE(SUM(p), 0) AS BIGINT) AS n_pos, " +
      "CAST(COALESCE(SUM(n), 0) AS BIGINT) AS n_neg, " +
      "CAST(COALESCE(SUM(p * (cn * 2 + n)), 0) AS BIGINT) AS u2 FROM c GROUP BY day) " +
      "SELECT day, n_pos, n_neg, CASE WHEN n_pos = 0 OR n_neg = 0 THEN CAST(NULL AS DOUBLE) " +
      "ELSE CAST(u2 AS DOUBLE) / (CAST(2 AS DOUBLE) * CAST(n_pos AS DOUBLE) * " +
      "CAST(n_neg AS DOUBLE)) END AS auc FROM t"

  /** Mirrors RankStats.abPower: the [[abTest]] user/arm CTEs, the
    * injected z-quantile literal, and the pinned MDE / required-n
    * IEEE tails. */
  def abPower(convType: String): String = {
    val z = s"CAST('${java.lang.Double.toString(1.959963984540054 + 0.8416212335729143)}' AS DOUBLE)"
    def d(x: String) = s"CAST($x AS DOUBLE)"
    val pp = s"((${d("conv_a")} + ${d("conv_b")}) / (${d("n_a")} + ${d("n_b")}))"
    val mde = s"($z * SQRT($pp * (CAST(1 AS DOUBLE) - $pp) * " +
      s"(CAST(1 AS DOUBLE) / ${d("n_a")} + CAST(1 AS DOUBLE) / ${d("n_b")})))"
    val delta = s"ABS(${d("conv_b")} / ${d("n_b")} - ${d("conv_a")} / ${d("n_a")})"
    val reqN = s"($z * $z * CAST(2 AS DOUBLE) * $pp * (CAST(1 AS DOUBLE) - $pp) / " +
      s"($delta * $delta))"
    "WITH u AS (SELECT user_id, CAST(MAX(CASE WHEN user_id % 2 = 1 THEN 1 ELSE 0 END) AS INT) AS b, " +
      s"MAX(CASE WHEN event_type = ${q(convType)} THEN 1 ELSE 0 END) AS c " +
      "FROM events WHERE user_id IS NOT NULL GROUP BY user_id), " +
      "a AS (SELECT CAST(SUM(CASE WHEN b = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_a, " +
      "CAST(SUM(CASE WHEN b = 0 AND c = 1 THEN 1 ELSE 0 END) AS BIGINT) AS conv_a, " +
      "CAST(SUM(CASE WHEN b = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_b, " +
      "CAST(SUM(CASE WHEN b = 1 AND c = 1 THEN 1 ELSE 0 END) AS BIGINT) AS conv_b FROM u) " +
      "SELECT n_a, n_b, " +
      s"CASE WHEN n_a = 0 OR n_b = 0 THEN CAST(NULL AS DOUBLE) ELSE $pp END AS pooled_rate, " +
      s"CASE WHEN n_a = 0 OR n_b = 0 THEN CAST(NULL AS DOUBLE) ELSE $mde END AS mde, " +
      s"CASE WHEN n_a = 0 OR n_b = 0 OR $delta = CAST(0 AS DOUBLE) THEN CAST(NULL AS DOUBLE) " +
      s"ELSE $reqN END AS required_n_per_arm FROM a"
  }

  /** Mirrors RankStats.kmSummary: the [[kmSurvival]] SQL nested, the
    * step-function RMST as an ordered sum of S·Δlife plus the leading
    * full-survival segment, median as the first ≤ 0.5 crossing. */
  def kmSummary(censorDays: Int): String =
    s"WITH km AS (${kmSurvival(censorDays)}), " +
      "st AS (SELECT life, survival, LEAD(life) OVER (ORDER BY life) AS nxt FROM km), " +
      "tl AS (SELECT COALESCE(SUM(survival * CAST(nxt - life AS DOUBLE) ORDER BY life), " +
      "CAST(0 AS DOUBLE)) AS tail FROM st WHERE nxt IS NOT NULL), " +
      "hd AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_lifetimes, MIN(life) AS lo, " +
      "CAST(MAX(life) AS BIGINT) AS max_life, " +
      "CAST(MIN(CASE WHEN survival <= CAST('0.5' AS DOUBLE) THEN life END) AS BIGINT) AS median_life FROM km) " +
      "SELECT n_lifetimes, max_life, median_life, " +
      "CASE WHEN n_lifetimes = 0 THEN CAST(NULL AS DOUBLE) " +
      "ELSE CAST(lo AS DOUBLE) + tl.tail END AS rmst FROM hd CROSS JOIN tl"

  /** Mirrors StreamingHist.windowedBenford: hourly windows, per-window
    * digit counts, the dense 1–9 grid with identical expectation
    * literals, χ² as SUM(term ORDER BY digit) per window. */
  def windowedBenford(): String = {
    val gridRows = (1 to 9).map { d =>
      val e = java.lang.Double.toString(math.log10(1.0 + 1.0 / d))
      s"($d, CAST('$e' AS DOUBLE))"
    }.mkString(", ")
    "WITH c AS (SELECT make_timestamp(((epoch_ns(ts) // 1000) // 3600000000) * 3600000000) AS ws, " +
      "CAST(SUBSTRING(CAST(CAST(ROUND(CAST(value AS DOUBLE) * CAST(100 AS DOUBLE)) AS BIGINT) AS VARCHAR), 1, 1) AS BIGINT) AS digit " +
      "FROM events WHERE ts IS NOT NULL AND value IS NOT NULL " +
      "AND NOT isnan(CAST(value AS DOUBLE)) AND CAST(value AS DOUBLE) > CAST(0 AS DOUBLE)), " +
      "g AS (SELECT ws, digit, CAST(COUNT(*) AS BIGINT) AS cnt FROM c " +
      "WHERE digit BETWEEN 1 AND 9 GROUP BY ws, digit), " +
      "t AS (SELECT ws, CAST(SUM(cnt) AS BIGINT) AS n FROM g GROUP BY ws), " +
      s"grid AS (SELECT * FROM (VALUES $gridRows) v(digit, exp_share)), " +
      "dense AS (SELECT t.ws, t.n, CAST(grid.digit AS BIGINT) AS digit, grid.exp_share, " +
      "CAST(COALESCE(g.cnt, 0) AS BIGINT) AS cnt FROM t CROSS JOIN grid " +
      "LEFT JOIN g ON g.ws = t.ws AND g.digit = grid.digit) " +
      "SELECT ws AS window_start, n, " +
      "SUM((CAST(cnt AS DOUBLE) - exp_share * CAST(n AS DOUBLE)) * " +
      "(CAST(cnt AS DOUBLE) - exp_share * CAST(n AS DOUBLE)) / " +
      "(exp_share * CAST(n AS DOUBLE)) ORDER BY digit) AS chi2 " +
      "FROM dense GROUP BY ws, n"
  }

  /** Mirrors RankStats.benfordAudit: integer-space leading digit via
    * the BIGINT decimal string, identical expectation literals, dense
    * 1–9 grid, χ² as SUM(term ORDER BY digit). */
  def benfordAudit(): String = {
    val gridRows = (1 to 9).map { d =>
      val e = java.lang.Double.toString(math.log10(1.0 + 1.0 / d))
      s"($d, CAST('$e' AS DOUBLE))"
    }.mkString(", ")
    "WITH c AS (SELECT CAST(SUBSTRING(CAST(CAST(ROUND(CAST(value AS DOUBLE) * " +
      "CAST(100 AS DOUBLE)) AS BIGINT) AS VARCHAR), 1, 1) AS BIGINT) AS digit " +
      "FROM events WHERE value IS NOT NULL AND NOT isnan(CAST(value AS DOUBLE)) " +
      "AND CAST(value AS DOUBLE) > CAST(0 AS DOUBLE)), " +
      "g AS (SELECT digit, CAST(COUNT(*) AS BIGINT) AS cnt FROM c GROUP BY digit), " +
      s"grid AS (SELECT * FROM (VALUES $gridRows) v(digit, exp_share)), " +
      "dense AS (SELECT CAST(grid.digit AS BIGINT) AS digit, grid.exp_share, " +
      "CAST(COALESCE(g.cnt, 0) AS BIGINT) AS cnt FROM grid LEFT JOIN g ON g.digit = grid.digit), " +
      "t AS (SELECT CAST(COALESCE(SUM(cnt), 0) AS BIGINT) AS n FROM dense), " +
      "r AS (SELECT digit, cnt, exp_share, " +
      "CASE WHEN t.n = 0 THEN CAST(NULL AS DOUBLE) " +
      "ELSE CAST(cnt AS DOUBLE) / CAST(t.n AS DOUBLE) END AS obs_share, " +
      "CASE WHEN t.n = 0 THEN CAST(NULL AS DOUBLE) " +
      "ELSE (CAST(cnt AS DOUBLE) - exp_share * CAST(t.n AS DOUBLE)) * " +
      "(CAST(cnt AS DOUBLE) - exp_share * CAST(t.n AS DOUBLE)) / " +
      "(exp_share * CAST(t.n AS DOUBLE)) END AS term FROM dense CROSS JOIN t), " +
      "x AS (SELECT SUM(term ORDER BY digit) AS chi2 FROM r) " +
      "SELECT r.digit, r.cnt, r.exp_share, r.obs_share, x.chi2 " +
      "FROM r CROSS JOIN x"
  }

  /** Mirrors RankStats.classifierEval: exact confusion counts, the
    * identical IEEE precision/recall/F1/accuracy tails with per-rate
    * NULL-on-zero-denominator. */
  def classifierEval(posCond: String, threshold: Double): String = {
    def d(x: String) = s"CAST($x AS DOUBLE)"
    val thr = s"CAST('${java.lang.Double.toString(threshold)}' AS DOUBLE)"
    val prec = s"(${d("tp")} / (${d("tp")} + ${d("fp")}))"
    val rec = s"(${d("tp")} / (${d("tp")} + ${d("fn")}))"
    "WITH m AS (SELECT " +
      s"CAST(COALESCE(SUM(CASE WHEN pred AND pos THEN 1 ELSE 0 END), 0) AS BIGINT) AS tp, " +
      s"CAST(COALESCE(SUM(CASE WHEN pred AND NOT pos THEN 1 ELSE 0 END), 0) AS BIGINT) AS fp, " +
      s"CAST(COALESCE(SUM(CASE WHEN NOT pred AND pos THEN 1 ELSE 0 END), 0) AS BIGINT) AS fn, " +
      s"CAST(COALESCE(SUM(CASE WHEN NOT pred AND NOT pos THEN 1 ELSE 0 END), 0) AS BIGINT) AS tn " +
      s"FROM (SELECT CAST(value AS DOUBLE) >= $thr AS pred, ($posCond) AS pos " +
      "FROM events WHERE value IS NOT NULL AND NOT isnan(CAST(value AS DOUBLE)))) " +
      s"SELECT $thr AS threshold, tp, fp, fn, tn, " +
      s"CASE WHEN tp + fp = 0 THEN CAST(NULL AS DOUBLE) ELSE $prec END AS precision, " +
      s"CASE WHEN tp + fn = 0 THEN CAST(NULL AS DOUBLE) ELSE $rec END AS recall, " +
      s"CASE WHEN tp + fp = 0 OR tp + fn = 0 OR $prec + $rec = CAST(0 AS DOUBLE) " +
      s"THEN CAST(NULL AS DOUBLE) ELSE CAST(2 AS DOUBLE) * $prec * $rec / ($prec + $rec) END AS f1, " +
      "CASE WHEN tp + fp + fn + tn = 0 THEN CAST(NULL AS DOUBLE) " +
      s"ELSE ${d("tp + tn")} / ${d("tp + fp + fn + tn")} END AS accuracy FROM m"
  }

  /** Mirrors Similarity.knnClassify: the [[annBruteForce]] top-k
    * nested, neighbor labels joined, majority vote with the (votes
    * desc, label asc) tie-break as a row_number pick. */
  def knnClassify(k: Int, queryMaxId: Long): String =
    s"WITH ex AS (${annBruteForce(k, queryMaxId)}), " +
      "v AS (SELECT ex.query_id, e.label AS nl, CAST(COUNT(*) AS BIGINT) AS c " +
      "FROM ex JOIN embeddings e ON e.vec_id = ex.neighbor_id GROUP BY 1, 2), " +
      "p AS (SELECT query_id, nl AS predicted FROM " +
      "(SELECT query_id, nl, ROW_NUMBER() OVER (PARTITION BY query_id " +
      "ORDER BY c DESC, nl) AS r FROM v) rv WHERE r = 1) " +
      "SELECT p.query_id, e.label, p.predicted, e.label = p.predicted AS correct " +
      "FROM p JOIN embeddings e ON e.vec_id = p.query_id"

  /** Mirrors Similarity.ndcgAnn: the [[annBruteForce]] and [[annLsh]]
    * rankings nested as CTEs, graded gains k+1−exact_rank, quantized-ln
    * DCG/IDCG folds in rank order, NDCG one division (zero-result
    * queries score 0 via the left join). */
  def ndcgAnn(k: Int, queryMaxId: Long, tables: Int = 4, bits: Int = 16,
      probeHamming: Int = 2): String = {
    def qln(rank: String): String =
      s"(FLOOR(LN(CAST($rank AS DOUBLE) + CAST(1 AS DOUBLE)) * " +
        "CAST('1.0E9' AS DOUBLE)) / CAST('1.0E9' AS DOUBLE))"
    s"WITH ex AS (${annBruteForce(k, queryMaxId)}), " +
      s"ap AS (${annLsh(k, queryMaxId, tables, bits, probeHamming)}), " +
      s"rel AS (SELECT query_id, neighbor_id, CAST(${k + 1} - rank AS BIGINT) AS rel FROM ex), " +
      "g AS (SELECT ap.query_id, ap.rank, " +
      s"CAST(COALESCE(rel.rel, 0) AS DOUBLE) / ${qln("ap.rank")} AS t " +
      "FROM ap LEFT JOIN rel ON rel.query_id = ap.query_id " +
      "AND rel.neighbor_id = ap.neighbor_id), " +
      "d AS (SELECT query_id, SUM(t ORDER BY rank) AS dcg FROM g GROUP BY query_id), " +
      s"ig AS (SELECT query_id, rank, CAST(CAST(${k + 1} - rank AS BIGINT) AS DOUBLE) / " +
      s"${qln("rank")} AS t FROM ex), " +
      "i AS (SELECT query_id, SUM(t ORDER BY rank) AS idcg FROM ig GROUP BY query_id) " +
      "SELECT i.query_id, COALESCE(d.dcg, CAST(0 AS DOUBLE)) AS dcg, i.idcg, " +
      "COALESCE(d.dcg, CAST(0 AS DOUBLE)) / i.idcg AS ndcg " +
      "FROM i LEFT JOIN d ON d.query_id = i.query_id"
  }

  /** Mirrors Similarity.gridDensityClusters (dims 1,2): the q02
    * auto-range bin formula per axis, exact cell counts, 8-neighbor
    * adjacency, and the min-label components as a recursive-CTE
    * transitive closure over the ≤ n² dense cells. */
  def gridDensity(n: Int, minCount: Long): String = {
    def idx(v: String, lo: String, hi: String): String =
      s"CASE WHEN $hi = $lo THEN CAST(0 AS BIGINT) ELSE " +
        s"LEAST(CAST(FLOOR(($v - $lo) / ($hi - $lo) * CAST($n AS DOUBLE)) AS BIGINT), " +
        s"CAST(${n - 1} AS BIGINT)) END"
    "WITH RECURSIVE p AS (SELECT CAST(embedding[1] AS DOUBLE) AS x, " +
      "CAST(embedding[2] AS DOUBLE) AS y FROM embeddings " +
      "WHERE embedding IS NOT NULL AND len(embedding) >= 2), " +
      "r AS (SELECT MIN(x) AS lox, MAX(x) AS hix, MIN(y) AS loy, MAX(y) AS hiy FROM p), " +
      s"c AS (SELECT ${idx("x", "lox", "hix")} AS ci, ${idx("y", "loy", "hiy")} AS cj " +
      "FROM p CROSS JOIN r), " +
      "cells AS (SELECT ci, cj, CAST(COUNT(*) AS BIGINT) AS cnt FROM c GROUP BY ci, cj), " +
      s"dense AS (SELECT ci, cj, ci * $n + cj AS id FROM cells WHERE cnt >= $minCount), " +
      "edges AS (SELECT a.id AS s, b.id AS t FROM dense a JOIN dense b " +
      "ON ABS(a.ci - b.ci) <= 1 AND ABS(a.cj - b.cj) <= 1 AND a.id <> b.id), " +
      "rr(id, comp) AS (SELECT id, id FROM dense " +
      "UNION SELECT e.t, rr.comp FROM rr JOIN edges e ON e.s = rr.id), " +
      "reach AS (SELECT id, CAST(MIN(comp) AS BIGINT) AS cluster FROM rr GROUP BY id) " +
      "SELECT cells.ci, cells.cj, cells.cnt, dense.id IS NOT NULL AS is_dense, " +
      "reach.cluster FROM cells " +
      "LEFT JOIN dense ON dense.ci = cells.ci AND dense.cj = cells.cj " +
      "LEFT JOIN reach ON reach.id = dense.id"
  }

  /** Mirrors Dedup.dupGraphStats: the [[nearDupPairs]] SQL nested as
    * the edge CTE, degree/wedge aggregates, the oriented a<b<c
    * triangle join, one IEEE division for transitivity. */
  def dupTriangles(k: Int = 5, threshold: Double = 0.7, bands: Int = 16,
      rowsPerBand: Int = 4): String =
    s"WITH e AS (${nearDupPairs(k, threshold, bands, rowsPerBand)}), " +
      "deg AS (SELECT v, CAST(COUNT(*) AS BIGINT) AS d FROM " +
      "(SELECT doc_a AS v FROM e UNION ALL SELECT doc_b AS v FROM e) u GROUP BY v), " +
      "w AS (SELECT CAST(COALESCE(SUM(d * (d - 1) // 2), 0) AS BIGINT) AS n_wedges, " +
      "CAST(COUNT(*) AS BIGINT) AS n_nodes FROM deg), " +
      "tr AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_triangles FROM e e1 " +
      "JOIN e e2 ON e2.doc_a = e1.doc_b " +
      "JOIN e e3 ON e3.doc_a = e1.doc_a AND e3.doc_b = e2.doc_b), " +
      "ne AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_edges FROM e) " +
      "SELECT n_nodes, n_edges, n_wedges, n_triangles, " +
      "CASE WHEN n_wedges = 0 THEN CAST(NULL AS DOUBLE) " +
      "ELSE CAST(3 * n_triangles AS DOUBLE) / CAST(n_wedges AS DOUBLE) END AS transitivity " +
      "FROM w CROSS JOIN tr CROSS JOIN ne"

  /** Mirrors Dedup.minhashAccuracy: per LSH candidate pair, the
    * signature-slot agreement estimate beside the exact k-gram jaccard.
    * Signatures are md5-derived identically in both engines, so the
    * agreement COUNT is engine-exact; the estimate and jaccard are one
    * IEEE division each. */
  def minhashAccuracy(k: Int = 5, bands: Int = 16,
      rowsPerBand: Int = 4): String = {
    val m = (1 to rowsPerBand)
      .map(r => s"(CASE WHEN a.s$r = b.s$r THEN 1 ELSE 0 END)").mkString(" + ")
    val jac = "CAST(inter AS DOUBLE) / CAST(sa.sz + sb.sz - inter AS DOUBLE)"
    s"WITH ${minhashCandCtes(k, bands, rowsPerBand)}, " +
      s"pb AS (SELECT cand.doc_a, cand.doc_b, $m AS m " +
      "FROM cand JOIN banded a ON a.doc_id = cand.doc_a " +
      "JOIN banded b ON b.doc_id = cand.doc_b AND b.band = a.band), " +
      "ag AS (SELECT doc_a, doc_b, CAST(SUM(m) AS BIGINT) AS m FROM pb GROUP BY 1, 2), " +
      s"g AS (SELECT DISTINCT doc_id, substring(text, CAST(i AS INT), $k) AS g " +
      s"FROM (SELECT doc_id, text, UNNEST(generate_series(1, greatest(length(text) - ${k - 1}, 1))) AS i FROM documents)), " +
      "sz AS (SELECT doc_id, COUNT(*) AS sz FROM g GROUP BY doc_id), " +
      "inter0 AS (SELECT ag.doc_a, ag.doc_b, COUNT(*) AS inter FROM ag " +
      "JOIN g ga ON ga.doc_id = ag.doc_a " +
      "JOIN g gb ON gb.doc_id = ag.doc_b AND gb.g = ga.g GROUP BY 1, 2), " +
      // LEFT join + COALESCE: unlike nearDupPairs there is no
      // jaccard-threshold filter here, so a candidate pair with ZERO
      // shared grams (possible via a gram-hash collision filling a band)
      // must still emit a jaccard-0 row exactly like the Spark side's
      // sorted_intersect_count = 0
      "inter AS (SELECT ag.doc_a, ag.doc_b, CAST(COALESCE(i.inter, 0) AS BIGINT) AS inter " +
      "FROM ag LEFT JOIN inter0 i ON i.doc_a = ag.doc_a AND i.doc_b = ag.doc_b) " +
      s"SELECT ag.doc_a, ag.doc_b, CAST(ag.m AS DOUBLE) / CAST(${bands * rowsPerBand} AS DOUBLE) AS est_jaccard, " +
      s"$jac AS jaccard " +
      "FROM ag JOIN inter ON inter.doc_a = ag.doc_a AND inter.doc_b = ag.doc_b " +
      "JOIN sz sa ON sa.doc_id = ag.doc_a JOIN sz sb ON sb.doc_id = ag.doc_b"
  }

  /** Near-dup survivor set (mirrors Dedup.nearDupKeep). */
  def nearDupKeep(k: Int = 5, threshold: Double = 0.7, bands: Int = 16,
      rowsPerBand: Int = 4): String =
    s"WITH p AS (${nearDupPairs(k, threshold, bands, rowsPerBand)}) " +
      "SELECT doc_id FROM documents " +
      "WHERE doc_id NOT IN (SELECT doc_b FROM p)"

  /** 64-bit SimHash pairs, deliberately in the UNBLOCKED all-pairs-within-
    * source form: the Spark side uses pigeonhole chunk blocking (see
    * Dedup.simhashPairs), and pigeonhole completeness (hamming <= 3 pairs
    * share one of 4 whole 16-bit chunks) makes the two forms provably
    * row-identical — so this oracle re-verifies the blocking's
    * completeness, not just the hamming arithmetic. The token hash's bit b
    * is bit b of the big-endian first-8-bytes value of md5, read from the
    * hex prefix as two 32-bit halves (BIGINT-safe; a single 64-bit hex
    * parse could overflow DuckDB's signed cast). The signature is carried
    * as 4 non-negative 16-bit chunks so xor/bit_count never touch a sign
    * bit in either engine. */
  def simhashPairs(maxHamming: Int = 3): String = {
    val sums = (0 until 64).map { b =>
      val src = if (b < 32) s"(lo >> $b)" else s"(hi >> ${b - 32})"
      s"SUM(CASE WHEN $src & 1 = 1 THEN 1 ELSE -1 END) AS s$b"
    }.mkString(", ")
    val chunks = (0 until 4).map { c =>
      (0 until 16).map { j =>
        s"(CASE WHEN s${c * 16 + j} > 0 THEN CAST(${1L << j} AS BIGINT) ELSE CAST(0 AS BIGINT) END)"
      }.mkString("(", " + ", s") AS c$c")
    }.mkString(", ")
    val hamming = (0 until 4)
      .map(c => s"bit_count(xor(a.c$c, b.c$c))").mkString(" + ")
    "WITH toks AS (SELECT DISTINCT doc_id, tok FROM " +
      "(SELECT doc_id, UNNEST(string_split_regex(text, ' +')) AS tok FROM documents) WHERE tok <> ''), " +
      "v AS (SELECT doc_id, ('0x' || substr(md5(tok), 1, 8))::BIGINT AS hi, " +
      "('0x' || substr(md5(tok), 9, 8))::BIGINT AS lo FROM toks), " +
      s"s AS (SELECT doc_id, $sums FROM v GROUP BY doc_id), " +
      s"sh AS (SELECT doc_id, $chunks FROM s), " +
      "j AS (SELECT sh.*, d.source FROM sh JOIN documents d ON d.doc_id = sh.doc_id) " +
      "SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, " +
      s"CAST($hamming AS INTEGER) AS hamming " +
      "FROM j a JOIN j b ON a.source = b.source AND a.doc_id < b.doc_id " +
      s"WHERE $hamming <= $maxHamming"
  }

  def ngramJaccard(k: Int = 8, threshold: Double = 0.8): String = {
    val jac = "CAST(inter AS DOUBLE) / CAST(sa.sz + sb.sz - inter AS DOUBLE)"
    val oneMinusT = java.lang.Double.toString(1.0 - threshold)
    s"WITH g AS (SELECT DISTINCT doc_id, source, substring(text, CAST(i AS INT), $k) AS g " +
      s"FROM (SELECT doc_id, source, text, UNNEST(generate_series(1, greatest(length(text) - ${k - 1}, 1))) AS i FROM documents)), " +
      "sz AS (SELECT doc_id, COUNT(*) AS sz FROM g GROUP BY doc_id), " +
      "freq AS (SELECT source, g, COUNT(*) AS f FROM g GROUP BY 1, 2), " +
      "rk AS (SELECT g.doc_id, g.source, g.g, sz.sz, " +
      "ROW_NUMBER() OVER (PARTITION BY g.doc_id ORDER BY freq.f, g.g) AS rn " +
      "FROM g JOIN freq ON freq.source = g.source AND freq.g = g.g " +
      "JOIN sz ON sz.doc_id = g.doc_id), " +
      s"pfx AS (SELECT doc_id, source, g FROM rk WHERE rn <= CAST(FLOOR(CAST('$oneMinusT' AS DOUBLE) * sz) AS BIGINT) + 1), " +
      "cand AS (SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b FROM pfx a " +
      "JOIN pfx b ON a.source = b.source AND a.g = b.g AND a.doc_id < b.doc_id), " +
      "inter AS (SELECT cand.doc_a, cand.doc_b, COUNT(*) AS inter FROM cand " +
      "JOIN g ga ON ga.doc_id = cand.doc_a " +
      "JOIN g gb ON gb.doc_id = cand.doc_b AND gb.source = ga.source AND gb.g = ga.g " +
      "GROUP BY 1, 2) " +
      s"SELECT doc_a, doc_b, $jac AS jaccard " +
      "FROM inter JOIN sz sa ON sa.doc_id = doc_a JOIN sz sb ON sb.doc_id = doc_b " +
      s"WHERE $jac >= CAST('${java.lang.Double.toString(threshold)}' AS DOUBLE)"
  }

  /** Mirrors Dedup.containment: same character-gram relation as the
    * jaccard oracle, A-side prefix in the oracle's own (frequency, gram)
    * order (a different-but-sound blocking — agreement with the Spark
    * side's hash-order blocking cross-proves both), B side unblocked,
    * exact |A∩B|/|A| tail. */
  def containment(k: Int = 8, threshold: Double = 0.8): String = {
    val t = s"CAST('${java.lang.Double.toString(threshold)}' AS DOUBLE)"
    val con = "CAST(inter AS DOUBLE) / CAST(sa.sz AS DOUBLE)"
    s"WITH g AS (SELECT DISTINCT doc_id, source, substring(text, CAST(i AS INT), $k) AS g " +
      s"FROM (SELECT doc_id, source, text, UNNEST(generate_series(1, greatest(length(text) - ${k - 1}, 1))) AS i FROM documents)), " +
      "sz AS (SELECT doc_id, COUNT(*) AS sz FROM g GROUP BY doc_id), " +
      "freq AS (SELECT source, g, COUNT(*) AS f FROM g GROUP BY 1, 2), " +
      "rk AS (SELECT g.doc_id, g.source, g.g, sz.sz, " +
      "ROW_NUMBER() OVER (PARTITION BY g.doc_id ORDER BY freq.f, g.g) AS rn " +
      "FROM g JOIN freq ON freq.source = g.source AND freq.g = g.g " +
      "JOIN sz ON sz.doc_id = g.doc_id), " +
      s"pfx AS (SELECT doc_id, source, g FROM rk WHERE rn <= sz - CAST(CEIL($t * CAST(sz AS DOUBLE) - 1e-9) AS BIGINT) + 1), " +
      "cand AS (SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b FROM pfx a " +
      "JOIN g b ON b.source = a.source AND b.g = a.g AND b.doc_id <> a.doc_id), " +
      "inter AS (SELECT cand.doc_a, cand.doc_b, COUNT(*) AS inter FROM cand " +
      "JOIN g ga ON ga.doc_id = cand.doc_a " +
      "JOIN g gb ON gb.doc_id = cand.doc_b AND gb.source = ga.source AND gb.g = ga.g " +
      "GROUP BY 1, 2) " +
      s"SELECT doc_a, doc_b, $con AS containment " +
      "FROM inter JOIN sz sa ON sa.doc_id = doc_a " +
      s"WHERE $con >= $t"
  }

  /** Shared element/norm CTEs over embeddings (ordered sums = Spark's
    * left-to-right array fold). */
  private val embBase: String =
    "e AS (SELECT vec_id, label, embedding FROM embeddings), " +
      "el AS (SELECT vec_id, CAST(i AS INT) AS i, CAST(embedding[CAST(i AS INT)] AS DOUBLE) AS v " +
      "FROM (SELECT vec_id, embedding, UNNEST(generate_series(1, len(embedding))) AS i FROM e)), " +
      "nrm AS (SELECT vec_id, SQRT(SUM(v * v ORDER BY i)) AS nrm FROM el GROUP BY vec_id)"

  /** Mirrors Similarity.mmrRerank: the annBruteForce candidate CTE at
    * top-n, candidate-pair cosines (canonical x < y, same ordered-fold
    * dots), then k−1 UNROLLED greedy stages — stage j scores every
    * unselected candidate lam·rel − (1−lam)·MAX(pair cosine to the
    * selected set) and picks by (score DESC, id), exactly the Spark
    * side's in-row fold (MAX over a non-empty set == the greatest
    * fold; the score is the same multiply-multiply-subtract on the
    * same literal lambda). */
  def mmrRerank(k: Int, n: Int, queryMaxId: Long, lam: Double): String = {
    def d(x: Double) = s"CAST('${java.lang.Double.toString(x)}' AS DOUBLE)"
    val lamS = d(lam)
    val mumS = d(1.0 - lam)
    val base =
      s"WITH $embBase, " +
        s"q AS (SELECT vec_id FROM e WHERE vec_id < $queryMaxId), " +
        "bd AS MATERIALIZED (SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id, " +
        "SUM(eq.v * ec.v ORDER BY eq.i) AS dot " +
        "FROM q JOIN e c ON c.vec_id <> q.vec_id " +
        "JOIN el eq ON eq.vec_id = q.vec_id " +
        "JOIN el ec ON ec.vec_id = c.vec_id AND ec.i = eq.i GROUP BY 1, 2), " +
        "bs AS (SELECT query_id, neighbor_id, dot / (na.nrm * nb.nrm) AS cosine " +
        "FROM bd JOIN nrm na ON na.vec_id = query_id " +
        "JOIN nrm nb ON nb.vec_id = neighbor_id), " +
        "cand AS MATERIALIZED (SELECT query_id, neighbor_id AS id, cosine AS rel FROM " +
        "(SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id " +
        "ORDER BY cosine DESC, neighbor_id) AS rank FROM bs) " +
        s"WHERE rank <= $n), " +
        "pd AS (SELECT a.query_id, a.id AS x, b.id AS y, " +
        "SUM(ex.v * ey.v ORDER BY ex.i) AS dot " +
        "FROM cand a JOIN cand b ON a.query_id = b.query_id AND a.id < b.id " +
        "JOIN el ex ON ex.vec_id = a.id " +
        "JOIN el ey ON ey.vec_id = b.id AND ey.i = ex.i GROUP BY 1, 2, 3), " +
        "pc AS MATERIALIZED (SELECT query_id, x, y, dot / (nx.nrm * ny.nrm) AS pcos " +
        "FROM pd JOIN nrm nx ON nx.vec_id = x JOIN nrm ny ON ny.vec_id = y), " +
        "sel1 AS MATERIALIZED (SELECT query_id, id, rel, 1 AS r FROM " +
        "(SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id " +
        "ORDER BY rel DESC, id) AS rn FROM cand) WHERE rn = 1)"
    val stages = (2 to k).map { j =>
      val prevU = (1 until j)
        .map(i => s"SELECT query_id, id, rel, r FROM sel$i")
        .mkString(" UNION ALL ")
      s"selu${j - 1} AS MATERIALIZED ($prevU), " +
        s"sc$j AS (SELECT c.query_id, c.id, c.rel, " +
        s"$lamS * c.rel - $mumS * (SELECT MAX(pc.pcos) FROM pc " +
        "WHERE pc.query_id = c.query_id AND " +
        s"((pc.x = c.id AND pc.y IN (SELECT id FROM selu${j - 1} u " +
        "WHERE u.query_id = c.query_id)) OR " +
        s"(pc.y = c.id AND pc.x IN (SELECT id FROM selu${j - 1} u " +
        "WHERE u.query_id = c.query_id)))) AS score " +
        s"FROM cand c WHERE NOT EXISTS (SELECT 1 FROM selu${j - 1} u " +
        "WHERE u.query_id = c.query_id AND u.id = c.id)), " +
        s"sel$j AS MATERIALIZED (SELECT query_id, id, rel, $j AS r FROM " +
        "(SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id " +
        s"ORDER BY score DESC, id) AS rn FROM sc$j) WHERE rn = 1)"
    }.mkString(", ")
    val finalU = (1 to k)
      .map(i => s"SELECT query_id, id, rel, r FROM sel$i")
      .mkString(" UNION ALL ")
    base + ", " + stages + " SELECT query_id, id AS neighbor_id, rel, " +
      s"CAST(r AS INT) AS mmr_rank FROM ($finalU) fin"
  }

  /** Mirrors Sampling.unimax: per-source exact whitespace-token sizes,
    * the waterfilling cap predicate in HUGEINT (== Spark's
    * DECIMAL(38,0)), capped allocations as exact longs, the uncapped
    * share as ONE division of exact longs. */
  def unimax(budget: Long, epochCap: Int): String =
    "WITH s AS (SELECT source, CAST(COALESCE(" +
      "SUM(len(regexp_extract_all(text, '\\S+'))), 0) AS BIGINT) AS tokens " +
      "FROM documents GROUP BY source), " +
      "r AS (SELECT *, ROW_NUMBER() OVER (ORDER BY tokens, source) AS i, " +
      "COUNT(*) OVER () AS n, " +
      // HUGEINT running sum (== Spark's DECIMAL(38,0) window sum): the
      // cumulative term crosses int64 at ~2e13 tokens x 1e5 sources
      s"CAST(COALESCE(SUM(CAST(tokens AS HUGEINT) * $epochCap) " +
      "OVER (ORDER BY tokens, source " +
      "ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS HUGEINT) " +
      "AS cumBefore FROM s), " +
      s"c AS (SELECT *, (CAST(tokens AS HUGEINT) * $epochCap * (n - i + 1) <= " +
      s"CAST($budget AS HUGEINT) - cumBefore) AS capped FROM r), " +
      "g AS (SELECT CAST(COALESCE(SUM(CASE WHEN capped THEN " +
      s"tokens * $epochCap END), 0) AS BIGINT) AS cappedSum, " +
      "SUM(CASE WHEN capped THEN 0 ELSE 1 END) AS nUn FROM c) " +
      "SELECT source, tokens, " +
      s"CASE WHEN capped THEN CAST(tokens * $epochCap AS DOUBLE) " +
      s"ELSE CAST($budget - cappedSum AS DOUBLE) / CAST(nUn AS DOUBLE) END " +
      "AS allocated, " +
      "CASE WHEN tokens > 0 THEN CASE WHEN capped THEN " +
      s"CAST($epochCap AS DOUBLE) " +
      s"ELSE CAST($budget - cappedSum AS DOUBLE) / CAST(nUn AS DOUBLE) / " +
      "CAST(tokens AS DOUBLE) END END AS epochs " +
      "FROM c CROSS JOIN g"

  /** Mirrors RankStats.isotonicCalibrate on the q290 score
    * (value/512, purchase label): same clamp/bin, exact prefix sums,
    * every interval mean ONE division of exact ints, minimax via the
    * same ≤ nBins³ join + MIN/MAX. */
  def isotonicCalibrate(nBins: Int): String =
    "WITH pb AS (SELECT LEAST(CAST(FLOOR(LEAST(GREATEST(" +
      s"CAST(value / 512.0 AS DOUBLE), 0.0), 1.0) * $nBins.0) AS BIGINT), " +
      s"${nBins - 1}) AS bin, CAST(COUNT(*) AS BIGINT) AS n, " +
      "CAST(SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) " +
      "AS BIGINT) AS pos FROM events " +
      "WHERE value IS NOT NULL AND NOT isnan(CAST(value AS DOUBLE)) " +
      "GROUP BY 1), " +
      "pr AS (SELECT bin, n, pos, ROW_NUMBER() OVER (ORDER BY bin) AS i, " +
      "CAST(SUM(n) OVER (ORDER BY bin) AS BIGINT) AS cn, " +
      "CAST(SUM(pos) OVER (ORDER BY bin) AS BIGINT) AS cp FROM pb), " +
      "jk AS (SELECT a.i AS j, b.i AS k, " +
      "CAST(b.cp - a.cp + a.pos AS DOUBLE) / " +
      "CAST(b.cn - a.cn + a.n AS DOUBLE) AS m " +
      "FROM pr a JOIN pr b ON a.i <= b.i), " +
      "mn AS (SELECT p.i, p.bin, p.n, p.pos, jk.j, MIN(jk.m) AS mk " +
      "FROM jk JOIN pr p ON jk.j <= p.i AND p.i <= jk.k " +
      "GROUP BY 1, 2, 3, 4, 5) " +
      "SELECT bin, n, pos, CAST(pos AS DOUBLE) / CAST(n AS DOUBLE) AS rate, " +
      "MAX(mk) AS iso FROM mn GROUP BY 1, 2, 3, 4"

  /** Mirrors Curation.chi2Independence over (source, lang): dense grid
    * from the marginals, HUGEINT marginal products (== Spark's
    * DECIMAL(38,0)), the same subtract-square-divide per cell folded
    * in (a, b) order. */
  def chi2Independence: String =
    "WITH cells AS (SELECT source AS a, lang AS b, " +
      "CAST(COUNT(*) AS BIGINT) AS nab FROM documents " +
      "WHERE source IS NOT NULL AND lang IS NOT NULL GROUP BY 1, 2), " +
      "ma AS (SELECT a, CAST(SUM(nab) AS BIGINT) AS na FROM cells GROUP BY a), " +
      "mb AS (SELECT b, CAST(SUM(nab) AS BIGINT) AS nb FROM cells GROUP BY b), " +
      "g AS (SELECT ma.a, mb.b, na, nb, " +
      "CAST(COALESCE(cells.nab, 0) AS BIGINT) AS o " +
      "FROM ma CROSS JOIN mb " +
      "LEFT JOIN cells ON cells.a = ma.a AND cells.b = mb.b), " +
      "t AS (SELECT CAST(COALESCE(SUM(o), 0) AS BIGINT) AS n, " +
      "CAST(COUNT(DISTINCT a) AS BIGINT) AS r, " +
      "CAST(COUNT(DISTINCT b) AS BIGINT) AS c FROM g), " +
      "s AS (SELECT SUM((CAST(o AS DOUBLE) - " +
      "CAST(CAST(na AS HUGEINT) * nb AS DOUBLE) / CAST(t.n AS DOUBLE)) * " +
      "(CAST(o AS DOUBLE) - " +
      "CAST(CAST(na AS HUGEINT) * nb AS DOUBLE) / CAST(t.n AS DOUBLE)) / " +
      "(CAST(CAST(na AS HUGEINT) * nb AS DOUBLE) / CAST(t.n AS DOUBLE)) " +
      "ORDER BY a, b) AS chi2 FROM g CROSS JOIN t GROUP BY t.n, t.r, t.c) " +
      "SELECT t.n AS n_rows, t.r AS n_a, t.c AS n_b, " +
      "(t.r - 1) * (t.c - 1) AS dof, s.chi2, " +
      "CASE WHEN (t.r - 1) * (t.c - 1) > 0 AND t.n > 0 THEN " +
      "SQRT(s.chi2 / (CAST(t.n AS DOUBLE) * " +
      "CAST(LEAST(t.r - 1, t.c - 1) AS DOUBLE))) END AS cramers_v " +
      "FROM t CROSS JOIN s"

  /** Mirrors Curation.conformalThreshold on (documents, source,
    * n_chars): same hash60 calibration slice, same corrected-rank
    * order statistic, NULL when the rank exceeds the slice. */
  def conformalThreshold(alpha: Double, calFrac: Double,
      salt: String): String = {
    def d(x: Double) = s"CAST('${java.lang.Double.toString(x)}' AS DOUBLE)"
    val thr = graft.pipeline.Sampling.threshold(calFrac)
    "WITH cal AS (SELECT source AS \"group\", " +
      "CAST(n_chars AS DOUBLE) AS s FROM documents " +
      "WHERE ('0x' || substr(md5(CAST(doc_id AS VARCHAR) || ':' || source " +
      s"|| ':' || '$salt'), 1, 15))::BIGINT < $thr " +
      "AND n_chars IS NOT NULL AND NOT isnan(CAST(n_chars AS DOUBLE))), " +
      "r AS (SELECT \"group\", s, " +
      "ROW_NUMBER() OVER (PARTITION BY \"group\" ORDER BY s) AS rk, " +
      "COUNT(*) OVER (PARTITION BY \"group\") AS n FROM cal) " +
      "SELECT \"group\", CAST(MAX(n) AS BIGINT) AS n_cal, " +
      "MAX(CASE WHEN rk = CAST(CEIL(CAST(n + 1 AS DOUBLE) * " +
      s"${d(1.0 - alpha)}) AS BIGINT) THEN s END) AS threshold " +
      "FROM r GROUP BY 1"
  }

  /** Mirrors Curation.conformalCoverage on (documents, source,
    * n_chars): the q354 threshold CTE re-derived, holdout = the hash
    * complement, covered/total exact longs, one division; no-threshold
    * groups report NULL coverage. */
  def conformalCoverage(alpha: Double, calFrac: Double,
      salt: String): String = {
    def d(x: Double) = s"CAST('${java.lang.Double.toString(x)}' AS DOUBLE)"
    val thr = graft.pipeline.Sampling.threshold(calFrac)
    val h60 = "('0x' || substr(md5(CAST(doc_id AS VARCHAR) || ':' || " +
      s"source || ':' || '$salt'), 1, 15))::BIGINT"
    "WITH cal AS (SELECT source AS \"group\", " +
      "CAST(n_chars AS DOUBLE) AS s FROM documents " +
      s"WHERE $h60 < $thr " +
      "AND n_chars IS NOT NULL AND NOT isnan(CAST(n_chars AS DOUBLE))), " +
      "r AS (SELECT \"group\", s, " +
      "ROW_NUMBER() OVER (PARTITION BY \"group\" ORDER BY s) AS rk, " +
      "COUNT(*) OVER (PARTITION BY \"group\") AS n FROM cal), " +
      "t AS (SELECT \"group\", CAST(MAX(n) AS BIGINT) AS n_cal, " +
      "MAX(CASE WHEN rk = CAST(CEIL(CAST(n + 1 AS DOUBLE) * " +
      s"${d(1.0 - alpha)}) AS BIGINT) THEN s END) AS threshold " +
      "FROM r GROUP BY 1), " +
      "h AS (SELECT source AS \"group\", CAST(n_chars AS DOUBLE) AS s " +
      s"FROM documents WHERE $h60 >= $thr " +
      "AND n_chars IS NOT NULL AND NOT isnan(CAST(n_chars AS DOUBLE))) " +
      "SELECT h.\"group\", MAX(t.n_cal) AS n_cal, " +
      "MAX(t.threshold) AS threshold, " +
      "CAST(COUNT(*) AS BIGINT) AS n_holdout, " +
      "CASE WHEN MAX(t.threshold) IS NOT NULL THEN " +
      "CAST(SUM(CASE WHEN h.s <= t.threshold THEN 1 ELSE 0 END) AS DOUBLE) " +
      "/ CAST(COUNT(*) AS DOUBLE) END AS coverage " +
      "FROM h LEFT JOIN t ON t.\"group\" = h.\"group\" GROUP BY 1"
  }

  /** Mirrors Curation.tailIndex on events.value: the same top-(k+1)
    * value multiset (ties at the boundary are value-ties, so the
    * multiset is well-defined), 1e-9-quantized logs, rank-ordered
    * fold, one division. */
  def tailIndex(k: Int): String = {
    def d(x: Double) = s"CAST('${java.lang.Double.toString(x)}' AS DOUBLE)"
    def qln(x: String) = s"FLOOR(LN($x) * ${d(1.0e9)}) / ${d(1.0e9)}"
    s"WITH top AS (SELECT CAST(value AS DOUBLE) AS x FROM events " +
      "WHERE value IS NOT NULL AND NOT isnan(CAST(value AS DOUBLE)) " +
      s"AND CAST(value AS DOUBLE) > 0 ORDER BY x DESC LIMIT ${k + 1}), " +
      "a AS (SELECT CAST(COUNT(*) AS BIGINT) AS m, MIN(x) AS xk1 FROM top), " +
      s"s AS (SELECT SUM(${qln("x")} - (SELECT ${qln("MIN(x)")} FROM top) " +
      "ORDER BY x DESC) AS hs FROM top) " +
      s"SELECT CAST($k AS INT) AS k, a.m AS n_top, " +
      s"CASE WHEN a.m = ${k + 1} THEN a.xk1 END AS x_k1, " +
      s"CASE WHEN a.m = ${k + 1} AND s.hs > 0 THEN ${d(k.toDouble)} / s.hs " +
      "END AS hill_alpha FROM a CROSS JOIN s"
  }

  /** Bucket expression for LSH table `t` with `bits` hyperplanes (mirrors
    * Similarity.lshTableBucket: bit j = sign of element t*bits+j+1;
    * out-of-range indexing yields NULL > 0 = NULL -> ELSE 0, matching the
    * Spark size guard). */
  private def tableBucketSql(t: Int, bits: Int): String =
    (0 until bits)
      .map(j => s"(CASE WHEN embedding[${t * bits + j + 1}] > 0 THEN CAST(${1L << j} AS BIGINT) ELSE CAST(0 AS BIGINT) END)")
      .mkString(" + ")

  /** bk(vec_id, label, tbl, bucket): one row per (vector, LSH table). */
  private def multiTableCte(tables: Int, bits: Int): String =
    (0 until tables)
      .map(t => s"SELECT vec_id, label, $t AS tbl, ${tableBucketSql(t, bits)} AS bucket FROM e")
      .mkString("bk AS (", " UNION ALL ", ")")

  /** pr(vec_id, label, tbl, pb): the probe set — own bucket plus each
    * one-bit flip (hamming<=1 multi-probe). */
  private def probeCte(bits: Int): String =
    ("SELECT vec_id, label, tbl, bucket AS pb FROM bk" +:
      (0 until bits).map(j =>
        s"SELECT vec_id, label, tbl, xor(bucket, CAST(${1L << j} AS BIGINT)) AS pb FROM bk"))
      .mkString("pr AS (", " UNION ALL ", ")")

  /** Mirrors Similarity.nearDup's (label, table, bucket) blocking +
    * multi-probe + exact cosine verify. */
  def embedNearDup(threshold: Double, tables: Int = 4, bits: Int = 4): String =
    s"WITH $embBase, " +
      s"${multiTableCte(tables, bits)}, " +
      s"${probeCte(bits)}, " +
      "cand AS (SELECT DISTINCT a.vec_id AS vec_a, b.vec_id AS vec_b FROM pr a " +
      "JOIN bk b ON a.label = b.label AND a.tbl = b.tbl AND a.pb = b.bucket AND a.vec_id < b.vec_id), " +
      "d AS (SELECT cand.vec_a, cand.vec_b, SUM(ea.v * eb.v ORDER BY ea.i) AS dot " +
      "FROM cand JOIN el ea ON ea.vec_id = cand.vec_a JOIN el eb ON eb.vec_id = cand.vec_b AND eb.i = ea.i " +
      "GROUP BY cand.vec_a, cand.vec_b) " +
      "SELECT d.vec_a, d.vec_b, d.dot / (na.nrm * nb.nrm) AS cosine " +
      "FROM d JOIN nrm na ON na.vec_id = d.vec_a JOIN nrm nb ON nb.vec_id = d.vec_b " +
      s"WHERE d.dot / (na.nrm * nb.nrm) >= CAST('${java.lang.Double.toString(threshold)}' AS DOUBLE)"

  def annBruteForce(k: Int, queryMaxId: Long): String =
    s"WITH $embBase, " +
      s"q AS (SELECT vec_id FROM e WHERE vec_id < $queryMaxId), " +
      "d AS (SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id, " +
      "SUM(eq.v * ec.v ORDER BY eq.i) AS dot " +
      "FROM q JOIN e c ON c.vec_id <> q.vec_id " +
      "JOIN el eq ON eq.vec_id = q.vec_id JOIN el ec ON ec.vec_id = c.vec_id AND ec.i = eq.i " +
      "GROUP BY 1, 2), " +
      "s AS (SELECT query_id, neighbor_id, dot / (na.nrm * nb.nrm) AS cosine " +
      "FROM d JOIN nrm na ON na.vec_id = query_id JOIN nrm nb ON nb.vec_id = neighbor_id), " +
      "r AS (SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY cosine DESC, neighbor_id) AS rank FROM s) " +
      s"SELECT query_id, neighbor_id, cosine, CAST(rank AS INT) AS rank FROM r WHERE rank <= $k"

  /** Mirrors Similarity.hardNegatives: annBruteForce with the
    * different-label join predicate (positives and the query itself never
    * become candidates). Same sequential-fold dot product, same
    * (cosine desc, neighbor asc) rank. */
  def hardNegatives(k: Int, queryMaxId: Long): String =
    s"WITH $embBase, " +
      s"q AS (SELECT vec_id, label FROM e WHERE vec_id < $queryMaxId), " +
      "d AS (SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id, " +
      "SUM(eq.v * ec.v ORDER BY eq.i) AS dot " +
      "FROM q JOIN e c ON c.vec_id <> q.vec_id AND c.label <> q.label " +
      "JOIN el eq ON eq.vec_id = q.vec_id JOIN el ec ON ec.vec_id = c.vec_id AND ec.i = eq.i " +
      "GROUP BY 1, 2), " +
      "s AS (SELECT query_id, neighbor_id, dot / (na.nrm * nb.nrm) AS cosine " +
      "FROM d JOIN nrm na ON na.vec_id = query_id JOIN nrm nb ON nb.vec_id = neighbor_id), " +
      "r AS (SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY cosine DESC, neighbor_id) AS rank FROM s) " +
      s"SELECT query_id, neighbor_id, cosine, CAST(rank AS INT) AS rank FROM r WHERE rank <= $k"

  /** Mirrors Similarity.annLsh: multi-table sign-LSH buckets, query-side
    * hamming<=probeHamming probes, distinct candidates, exact cosine
    * top-k. The probe set is expressed as one UNNEST over the flip masks
    * rather than 137 UNION ALL branches. */
  def annLsh(k: Int, queryMaxId: Long, tables: Int = 4, bits: Int = 16,
      probeHamming: Int = 2): String = {
    val flips = graft.pipeline.Similarity.probeFlips(bits, probeHamming)
      .mkString("[", ", ", "]")
    s"WITH $embBase, " +
      s"${multiTableCte(tables, bits)}, " +
      s"bq AS (SELECT * FROM bk WHERE vec_id < $queryMaxId), " +
      s"pr AS (SELECT vec_id, tbl, xor(bucket, f) AS pb FROM (SELECT vec_id, tbl, bucket, UNNEST($flips) AS f FROM bq)), " +
      "cand AS (SELECT DISTINCT q.vec_id AS query_id, c.vec_id AS neighbor_id FROM pr q " +
      "JOIN bk c ON c.tbl = q.tbl AND c.bucket = q.pb AND c.vec_id <> q.vec_id), " +
      "d AS (SELECT cand.query_id, cand.neighbor_id, SUM(eq.v * ec.v ORDER BY eq.i) AS dot " +
      "FROM cand JOIN el eq ON eq.vec_id = cand.query_id " +
      "JOIN el ec ON ec.vec_id = cand.neighbor_id AND ec.i = eq.i GROUP BY 1, 2), " +
      "s AS (SELECT query_id, neighbor_id, dot / (na.nrm * nb.nrm) AS cosine " +
      "FROM d JOIN nrm na ON na.vec_id = query_id JOIN nrm nb ON nb.vec_id = neighbor_id), " +
      "r AS (SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY cosine DESC, neighbor_id) AS rank FROM s) " +
      s"SELECT query_id, neighbor_id, cosine, CAST(rank AS INT) AS rank FROM r WHERE rank <= $k"
  }

  /** Mirrors Similarity.annIvf with the TRAINED quantizer: the training
    * subset is the nCells*8 embeddings with the smallest 60-bit salted
    * md5(vec_id || ':ivf') (ties by vec_id — the unbiased hash-rank
    * sample), init centroids = the first nCells in that same hash order
    * (cent_id = rank), `iters` unrolled Lloyd rounds — cosine assignment
    * (ROW_NUMBER ties to lowest cent_id = the TopKByScore order) and
    * per-dimension decimal-exact means (Oracle.exactDbl split, TRY_CAST
    * via VARCHAR = Dec.toDec), empty cells keeping the previous centroid
    * via LEFT JOIN + COALESCE — then the standard assign / nprobe-probe /
    * exact top-k tail. */
  /** CTE chain through `rkd` (per-vector centroid ranking) and `asg`
    * (nearest-cell assignment) — the trained-quantizer prefix shared by
    * annIvf and clusterAssign.
    *
    * MATERIALIZED everywhere: DuckDB inlines CTEs by default, and the
    * unrolled Lloyd rounds reference each previous round 2-3x — inlining
    * re-executes the element-level joins exponentially in iters (observed
    * as an OOM); materialization makes each round run once.
    * elt = the deterministic training subset (8 vectors per cell; mirrors
    * Similarity.kmeansCentroids' hash-rank sample) */
  private def ivfAsgCtes(nCells: Int, iters: Int): String = {
    def assignCte(c: String, rel: String): String =
      s"MATERIALIZED (SELECT $rel.vec_id, cn.cent_id, " +
        s"SUM($rel.v * cn.cv ORDER BY $rel.i) / (nv.nrm * nn.cnrm) AS ccos " +
        s"FROM $rel JOIN $c cn ON cn.i = $rel.i " +
        s"JOIN nrm nv ON nv.vec_id = $rel.vec_id " +
        s"JOIN (SELECT cent_id, SQRT(SUM(cv * cv ORDER BY i)) AS cnrm FROM $c GROUP BY cent_id) nn " +
        "ON nn.cent_id = cn.cent_id " +
        s"GROUP BY $rel.vec_id, cn.cent_id, nv.nrm, nn.cnrm)"
    val meanExpr = Oracle.exactDbl(
      "SUM(TRY_CAST(CAST(elt.v AS VARCHAR) AS DECIMAL(38,14)))") +
      " / CAST(COUNT(*) AS DOUBLE)"
    val train = (1 to iters).map { it =>
      val prev = s"c${it - 1}"
      s"s$it AS ${assignCte(prev, "elt")}, " +
        s"a$it AS MATERIALIZED (SELECT vec_id, cent_id AS cell FROM (SELECT *, " +
        "ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY ccos DESC, cent_id) AS rn " +
        s"FROM s$it) WHERE rn = 1), " +
        s"m$it AS MATERIALIZED (SELECT a$it.cell, elt.i, $meanExpr AS cv " +
        s"FROM a$it JOIN elt ON elt.vec_id = a$it.vec_id GROUP BY a$it.cell, elt.i), " +
        s"c$it AS MATERIALIZED (SELECT $prev.cent_id, $prev.i, COALESCE(m$it.cv, $prev.cv) AS cv " +
        s"FROM $prev LEFT JOIN m$it ON m$it.cell = $prev.cent_id AND m$it.i = $prev.i)"
    }.mkString(", ")
    val embMat = embBase
      .replace("e AS (", "e AS MATERIALIZED (")
      .replace("el AS (", "el AS MATERIALIZED (")
      .replace("nrm AS (", "nrm AS MATERIALIZED (")
    s"$embMat, " +
      "hs AS (SELECT vec_id, ('0x' || substr(md5(CAST(vec_id AS VARCHAR) || ':ivf'), 1, 15))::BIGINT AS hh FROM e), " +
      "smp AS MATERIALIZED (SELECT vec_id, rk FROM (SELECT vec_id, " +
      s"ROW_NUMBER() OVER (ORDER BY hh, vec_id) AS rk FROM hs) WHERE rk <= ${nCells * 8L}), " +
      "elt AS MATERIALIZED (SELECT el.* FROM el JOIN smp ON smp.vec_id = el.vec_id), " +
      s"cent0 AS (SELECT rk - 1 AS cent_id, vec_id FROM smp WHERE rk <= $nCells), " +
      "c0 AS MATERIALIZED (SELECT cent0.cent_id, el.i, el.v AS cv FROM cent0 " +
      "JOIN el ON el.vec_id = cent0.vec_id), " +
      s"$train, " +
      s"sf AS ${assignCte(s"c$iters", "el")}, " +
      "rkd AS (SELECT *, ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY ccos DESC, cent_id) AS rn FROM sf), " +
      "asg AS (SELECT vec_id, cent_id AS cell FROM rkd WHERE rn = 1)"
  }

  /** Mirrors Similarity.pqEncode: per-subspace independent L2 Lloyd on
    * the shared ':pq' hash-rank sample — the ivfAsgCtes structure with
    * Euclidean assignment (ORDER BY d2 ASC, cent_id; NaN greatest in
    * both engines), the same decimal-exact per-dimension means, empty
    * codes keeping the previous codeword — then every vector's nearest
    * codeword per subspace, UNION ALL across subspaces. The d2 is the
    * in-j-order SUM((v−cv)·(v−cv)) fold VecL2FD pins. */
  private def pqCtes(m: Int, k: Int, iters: Int): String = {
    val meanExpr = Oracle.exactDbl(
      "SUM(TRY_CAST(CAST(t.v AS VARCHAR) AS DECIMAL(38,14)))") +
      " / CAST(COUNT(*) AS DOUBLE)"
    def d2Cte(name: String, rel: String, cents: String): String =
      s"$name AS MATERIALIZED (SELECT r.vec_id, cn.cent_id, " +
        "SUM((r.v - cn.cv) * (r.v - cn.cv) ORDER BY r.j) AS d2 " +
        s"FROM $rel r JOIN $cents cn ON cn.j = r.j " +
        "GROUP BY r.vec_id, cn.cent_id)"
    val perSub = (0 until m).map { ss =>
      // the subspace element relation derives its own bounds from the
      // vector length (dim/m contiguous elements starting at ss*dim/m)
      val rounds = (1 to iters).map { it =>
        val prev = s"c${it - 1}_$ss"
        s"${d2Cte(s"s${it}_$ss", s"elt_$ss", prev)}, " +
          s"a${it}_$ss AS MATERIALIZED (SELECT vec_id, cent_id AS cell FROM " +
          s"(SELECT *, ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY d2 ASC, cent_id) AS rn " +
          s"FROM s${it}_$ss) WHERE rn = 1), " +
          s"m${it}_$ss AS MATERIALIZED (SELECT a.cell, t.j, $meanExpr AS cv " +
          s"FROM a${it}_$ss a JOIN elt_$ss t ON t.vec_id = a.vec_id GROUP BY a.cell, t.j), " +
          s"c${it}_$ss AS MATERIALIZED (SELECT p.cent_id, p.j, COALESCE(mm.cv, p.cv) AS cv " +
          s"FROM c${it - 1}_$ss p LEFT JOIN m${it}_$ss mm ON mm.cell = p.cent_id AND mm.j = p.j)"
      }.mkString(", ")
      s"el_$ss AS MATERIALIZED (SELECT vec_id, i - $ss * (dim // $m) AS j, v " +
        s"FROM el CROSS JOIN dims WHERE i > $ss * (dim // $m) AND i <= ($ss + 1) * (dim // $m)), " +
        s"elt_$ss AS MATERIALIZED (SELECT el_$ss.* FROM el_$ss JOIN smp ON smp.vec_id = el_$ss.vec_id), " +
        s"c0_$ss AS MATERIALIZED (SELECT rk - 1 AS cent_id, el_$ss.j, el_$ss.v AS cv " +
        s"FROM smp JOIN el_$ss ON el_$ss.vec_id = smp.vec_id WHERE rk <= $k), " +
        s"$rounds, " +
        s"${d2Cte(s"sf_$ss", s"el_$ss", s"c${iters}_$ss")}, " +
        s"best_$ss AS (SELECT vec_id, cent_id, d2 FROM (SELECT *, ROW_NUMBER() OVER " +
        s"(PARTITION BY vec_id ORDER BY d2 ASC, cent_id) AS rn FROM sf_$ss) WHERE rn = 1), " +
        s"asg_$ss AS (SELECT vec_id, cent_id AS code FROM best_$ss)"
    }.mkString(", ")
    "WITH e AS MATERIALIZED (SELECT vec_id, embedding FROM embeddings), " +
      "el AS MATERIALIZED (SELECT vec_id, CAST(i AS INT) AS i, " +
      "CAST(embedding[CAST(i AS INT)] AS DOUBLE) AS v " +
      "FROM (SELECT vec_id, embedding, UNNEST(generate_series(1, len(embedding))) AS i FROM e)), " +
      "dims AS (SELECT MAX(len(embedding)) AS dim FROM e), " +
      "hs AS (SELECT vec_id, ('0x' || substr(md5(CAST(vec_id AS VARCHAR) || ':pq'), 1, 15))::BIGINT AS hh FROM e), " +
      "smp AS MATERIALIZED (SELECT vec_id, rk FROM (SELECT vec_id, " +
      s"ROW_NUMBER() OVER (ORDER BY hh, vec_id) AS rk FROM hs) WHERE rk <= ${k * 8L}), " +
      s"$perSub"
  }

  def pqEncode(m: Int, k: Int, iters: Int = 2): String = {
    val union = (0 until m)
      .map(ss => s"SELECT vec_id, $ss AS subspace, code FROM asg_$ss")
      .mkString(" UNION ALL ")
    s"${pqCtes(m, k, iters)} $union"
  }

  /** Mirrors Similarity.pqError: the best_ss argmin rows' d2 aggregated
    * per subspace — floor(d2·1e9) integers in DECIMAL(38,0), one final
    * double cast and the (s / 1e9) / n division order, raw MAX. */
  def pqError(m: Int, k: Int, iters: Int = 2): String = {
    val union = (0 until m).map { ss =>
      s"SELECT $ss AS subspace, CAST(COUNT(*) AS BIGINT) AS n, " +
        "CAST(SUM(CAST(CAST(FLOOR(d2 * 1e9) AS BIGINT) AS DECIMAL(38,0))) AS DOUBLE) " +
        "/ 1e9 / CAST(COUNT(*) AS DOUBLE) AS mean_d2, " +
        s"MAX(d2) AS max_d2 FROM best_$ss"
    }.mkString(" UNION ALL ")
    s"${pqCtes(m, k, iters)} $union"
  }

  def annIvf(k: Int, queryMaxId: Long, nCells: Int = 8, nprobe: Int = 1,
      iters: Int = 2): String =
    s"WITH ${ivfAsgCtes(nCells, iters)}, " +
      s"q AS (SELECT vec_id, cent_id AS cell FROM rkd WHERE rn <= $nprobe AND vec_id < $queryMaxId), " +
      "cand AS (SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id FROM q " +
      "JOIN asg c ON c.cell = q.cell AND c.vec_id <> q.vec_id), " +
      "d AS (SELECT cand.query_id, cand.neighbor_id, SUM(eq.v * ec.v ORDER BY eq.i) AS dot " +
      "FROM cand JOIN el eq ON eq.vec_id = cand.query_id " +
      "JOIN el ec ON ec.vec_id = cand.neighbor_id AND ec.i = eq.i GROUP BY 1, 2), " +
      "s AS (SELECT query_id, neighbor_id, dot / (na.nrm * nb.nrm) AS cosine " +
      "FROM d JOIN nrm na ON na.vec_id = query_id JOIN nrm nb ON nb.vec_id = neighbor_id), " +
      "r AS (SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY cosine DESC, neighbor_id) AS rank FROM s) " +
      s"SELECT query_id, neighbor_id, cosine, CAST(rank AS INT) AS rank FROM r WHERE rank <= $k"

  /** Mirrors Similarity.cluster: the trained-quantizer assignment alone —
    * every corpus vector with its nearest k-means cell. */
  def clusterAssign(nCells: Int = 8, iters: Int = 2): String =
    s"WITH ${ivfAsgCtes(nCells, iters)} SELECT vec_id, cell FROM asg"

  /** Mirrors Similarity.clusterStats: the rn=1 assignment row keeps its
    * ccos; min/max raw, the mean through the floor(ccos·1e12) integer
    * quantization summed in DECIMAL(38,0), one double division. */
  def clusterStats(nCells: Int = 8, iters: Int = 2): String = {
    val q12 = "CAST('1.0E12' AS DOUBLE)"
    s"WITH ${ivfAsgCtes(nCells, iters)}, " +
      "st AS (SELECT cent_id AS cell, ccos FROM rkd WHERE rn = 1) " +
      "SELECT cell, CAST(COUNT(*) AS BIGINT) AS n, MIN(ccos) AS min_cos, " +
      "MAX(ccos) AS max_cos, " +
      s"CAST(SUM(CAST(CAST(FLOOR(ccos * $q12) AS BIGINT) AS DECIMAL(38,0))) AS BIGINT) AS sum_qcos, " +
      s"CAST(SUM(CAST(CAST(FLOOR(ccos * $q12) AS BIGINT) AS DECIMAL(38,0))) AS DOUBLE) / " +
      s"(CAST(COUNT(*) AS DOUBLE) * $q12) AS mean_cos " +
      "FROM st GROUP BY cell"
  }

  /** Mirrors Similarity.embedOutliers: the rn=1 assignment keeps its
    * ccos, quantized to the floor(·1e12) integer; per-cell moments as
    * exact HUGEINT sums (Spark's DECIMAL(38,0) lane), then the q153
    * fixed z-score IEEE tail; NULL z (and verdict) for n < 2 or zero
    * variance. */
  def embedOutliers(nCells: Int, k: Double, iters: Int = 2): String = {
    val q12 = "CAST('1.0E12' AS DOUBLE)"
    val negK = s"CAST('${java.lang.Double.toString(-k)}' AS DOUBLE)"
    s"WITH ${ivfAsgCtes(nCells, iters)}, " +
      s"st AS (SELECT vec_id, cent_id AS cell, CAST(FLOOR(ccos * $q12) AS BIGINT) AS qcos " +
      "FROM rkd WHERE rn = 1), " +
      "ag AS (SELECT cell, CAST(COUNT(*) AS BIGINT) AS n, " +
      "SUM(CAST(qcos AS HUGEINT)) AS s, " +
      "SUM(CAST(qcos AS HUGEINT) * CAST(qcos AS HUGEINT)) AS ss FROM st GROUP BY cell), " +
      "zc AS (SELECT st.vec_id, st.cell, st.qcos, " +
      "CASE WHEN n >= 2 AND SQRT(GREATEST(CAST(0.0 AS DOUBLE), " +
      "CAST(n AS DOUBLE) * CAST(ss AS DOUBLE) - CAST(s AS DOUBLE) * CAST(s AS DOUBLE)) / " +
      "(CAST(n AS DOUBLE) * CAST(n - 1 AS DOUBLE))) > CAST(0.0 AS DOUBLE) THEN " +
      "(CAST(qcos AS DOUBLE) - CAST(s AS DOUBLE) / CAST(n AS DOUBLE)) / " +
      "SQRT(GREATEST(CAST(0.0 AS DOUBLE), " +
      "CAST(n AS DOUBLE) * CAST(ss AS DOUBLE) - CAST(s AS DOUBLE) * CAST(s AS DOUBLE)) / " +
      "(CAST(n AS DOUBLE) * CAST(n - 1 AS DOUBLE))) END AS z " +
      "FROM st JOIN ag USING (cell)) " +
      s"SELECT vec_id, cell, qcos, z, z < $negK AS is_outlier FROM zc"
  }

  /** Mirrors Similarity.semDedup: trained-quantizer assignment, within-
    * cell pairwise cosine (same ORDER BY i left-to-right dot), drop the
    * higher vec_id of every pair at/above threshold. */
  def semDedup(nCells: Int, threshold: Double, iters: Int = 2): String = {
    val thr = s"CAST('${java.lang.Double.toString(threshold)}' AS DOUBLE)"
    s"WITH ${ivfAsgCtes(nCells, iters)}, " +
      "p AS (SELECT a.vec_id AS va, b.vec_id AS vb FROM asg a " +
      "JOIN asg b ON a.cell = b.cell AND a.vec_id < b.vec_id), " +
      "d AS (SELECT p.va, p.vb, SUM(ea.v * eb.v ORDER BY ea.i) AS dot " +
      "FROM p JOIN el ea ON ea.vec_id = p.va " +
      "JOIN el eb ON eb.vec_id = p.vb AND eb.i = ea.i GROUP BY p.va, p.vb), " +
      "s AS (SELECT va, vb, dot / (na.nrm * nb.nrm) AS cosine " +
      "FROM d JOIN nrm na ON na.vec_id = va JOIN nrm nb ON nb.vec_id = vb), " +
      s"dr AS (SELECT DISTINCT vb AS vec_id FROM s WHERE cosine >= $thr) " +
      "SELECT asg.vec_id, asg.cell, (dr.vec_id IS NULL) AS keep " +
      "FROM asg LEFT JOIN dr ON dr.vec_id = asg.vec_id"
  }

  /** Mirrors Sampling.clusterBalancedSample: assignment + the per-cell
    * hash reservoir (cell rendered as its base-10 string inside the salt
    * hash, exactly like the Spark side's cast to the source column). */
  def clusterBalancedSample(nCells: Int, n: Int, salt: String,
      iters: Int = 2): String =
    s"WITH ${ivfAsgCtes(nCells, iters)}, " +
      "sh AS (SELECT cell, vec_id, ('0x' || substr(md5(CAST(vec_id AS VARCHAR) || ':' || " +
      s"CAST(cell AS VARCHAR) || ':' || ${q(salt)}), 1, 15))::BIGINT AS hh FROM asg), " +
      "sr AS (SELECT cell, vec_id, ROW_NUMBER() OVER (PARTITION BY cell ORDER BY hh, vec_id) AS rn FROM sh) " +
      s"SELECT cell, vec_id FROM sr WHERE rn <= $n"

  val langId: String = {
    def occ(pat: String): String = {
      val esc = pat.replace("'", "''")
      s"CAST((length(p) - length(replace(p, '$esc', ''))) / ${pat.length} AS BIGINT)"
    }
    val scores = TextAnalysis.langMarkers
      .map { case (lang, pats) => pats.map(occ).mkString(" + ") + s" AS s_$lang" }
      .mkString(", ")
    val langs = TextAnalysis.langMarkers.map(_._1)
    val pred = langs.map { lang =>
      val isMax = langs.filter(_ != lang).map(o => s"s_$lang >= s_$o").mkString(" AND ")
      s"WHEN s_$lang > 0 AND $isMax THEN '$lang'"
    }.mkString("CASE ", " ", " ELSE 'und' END")
    "WITH s AS (SELECT doc_id, " + scores +
      " FROM (SELECT doc_id, ' ' || text || ' ' AS p FROM documents)) " +
      s"SELECT doc_id, ${langs.map(l => s"s_$l").mkString(", ")}, $pred AS pred_lang FROM s"
  }

  val quality: String = {
    val ratio = "CAST(n_punct AS DOUBLE) / CAST(GREATEST(n_words, 1) AS DOUBLE)"
    def occ(pat: String): String = {
      val esc = pat.replace("'", "''")
      s"CAST((length(p) - length(replace(p, '$esc', ''))) / ${pat.length} AS BIGINT)"
    }
    val stop = TextAnalysis.qualityStopwords.map(occ).mkString(" + ")
    "WITH c AS (SELECT doc_id, " +
      "CAST(len(regexp_extract_all(text, '[A-Za-z]+')) AS BIGINT) AS n_words, " +
      "CAST(len(regexp_extract_all(text, '[.!?]')) AS BIGINT) AS n_punct, " +
      "CAST(len(regexp_extract_all(text, '[A-Z]')) AS BIGINT) AS n_upper, " +
      s"$stop AS n_stop " +
      "FROM (SELECT doc_id, text, ' ' || text || ' ' AS p FROM documents)) " +
      "SELECT doc_id, n_words, n_punct, n_upper, n_stop, " +
      s"$ratio AS punct_ratio, " +
      "CAST(n_upper AS DOUBLE) / CAST(GREATEST(n_words, 1) AS DOUBLE) AS upper_ratio, " +
      "CAST(n_stop AS DOUBLE) / CAST(GREATEST(n_words, 1) AS DOUBLE) AS stopword_ratio, " +
      s"CASE WHEN n_words >= 40 AND $ratio < CAST('0.1' AS DOUBLE) THEN 'high' " +
      "WHEN n_words >= 15 THEN 'medium' ELSE 'low' END AS bucket FROM c"
  }

  val tokens: String =
    "SELECT doc_id, " +
      "CAST(len(regexp_extract_all(text, '\\S+')) AS BIGINT) AS ws_tokens, " +
      "CAST(len(regexp_extract_all(text, '[A-Za-z]+|[0-9]|[^A-Za-z0-9\\s]')) AS BIGINT) AS bpe_tokens " +
      "FROM documents"

  /** Repetition signals (mirrors TextAnalysis.repetition): token counts
    * from the same trim + ' +'-regex split, ratios as single divisions
    * over the exact integer counts. */
  val repetition: String = {
    "WITH a AS (SELECT doc_id, string_split_regex(trim(text), ' +') AS arr FROM documents), " +
      "t AS (SELECT doc_id, CAST(i AS BIGINT) AS i, arr[CAST(i AS INT)] AS tok " +
      "FROM (SELECT doc_id, arr, UNNEST(generate_series(1, len(arr))) AS i FROM a)), " +
      "wc AS (SELECT doc_id, tok, COUNT(*) AS c FROM t GROUP BY 1, 2), " +
      "w AS (SELECT doc_id, CAST(SUM(c) AS BIGINT) AS n_tokens, " +
      "CAST(COUNT(*) AS BIGINT) AS n_distinct, CAST(MAX(c) AS BIGINT) AS top_token_cnt " +
      "FROM wc GROUP BY 1), " +
      "bgc AS (SELECT x.doc_id, x.tok || ' ' || y.tok AS bg, COUNT(*) AS c " +
      "FROM t x JOIN t y ON y.doc_id = x.doc_id AND y.i = x.i + 1 GROUP BY 1, 2), " +
      "bw AS (SELECT doc_id, CAST(MAX(c) AS BIGINT) AS top_bigram_cnt FROM bgc GROUP BY 1) " +
      "SELECT w.doc_id, n_tokens, n_distinct, top_token_cnt, " +
      "COALESCE(bw.top_bigram_cnt, 0) AS top_bigram_cnt, " +
      "CAST(n_tokens - n_distinct AS DOUBLE) / CAST(n_tokens AS DOUBLE) AS dup_frac, " +
      "CAST(top_token_cnt AS DOUBLE) / CAST(n_tokens AS DOUBLE) AS top_token_frac, " +
      "CAST(COALESCE(bw.top_bigram_cnt, 0) AS DOUBLE) / " +
      "CAST(GREATEST(n_tokens - 1, 1) AS DOUBLE) AS top_bigram_frac " +
      "FROM w LEFT JOIN bw ON bw.doc_id = w.doc_id"
  }

  /** Deterministic per-source sampling (mirrors Sampling.sampleBySource):
    * identical integer thresholds computed driver-side. */
  def sampleBySource(rates: Map[String, Double], defaultRate: Double,
      salt: String): String = {
    import graft.pipeline.Sampling.threshold
    val thr = rates.toSeq.sortBy(_._1)
      .map { case (s, r) => s"WHEN source = ${q(s)} THEN CAST(${threshold(r)} AS BIGINT)" }
      .mkString("CASE ", " ", s" ELSE CAST(${threshold(defaultRate)} AS BIGINT) END")
    s"SELECT doc_id, source FROM documents WHERE " +
      s"('0x' || substr(md5(CAST(doc_id AS VARCHAR) || ':' || source || ':' || ${q(salt)}), 1, 15))::BIGINT < $thr"
  }

  /** Mirrors Dedup.decontaminate: word n-gram overlap against a
    * benchmark slice (benchWhere), LEFT JOIN for the full-corpus
    * (doc_id, contaminated) verdict relation. */
  def decontaminate(n: Int, benchWhere: String): String = {
    def grams(src: String, idSel: String, idGrp: String) =
      s"(SELECT $idSel array_to_string(t[CAST(i AS INT):CAST(i + ${n - 1} AS INT)], ' ') AS g " +
        s"FROM (SELECT $idGrp t, UNNEST(generate_series(1, len(t) - ${n - 1})) AS i " +
        s"FROM $src WHERE len(t) >= $n))"
    val bt = s"(SELECT regexp_extract_all(text, '\\S+') AS t FROM documents WHERE $benchWhere) __bt"
    val dt = "(SELECT doc_id, regexp_extract_all(text, '\\S+') AS t FROM documents) __dt"
    s"WITH bg AS (SELECT DISTINCT g FROM ${grams(bt, "", "")}), " +
      s"dg AS ${grams(dt, "doc_id, ", "doc_id, ")}, " +
      "bad AS (SELECT DISTINCT dg.doc_id FROM dg JOIN bg USING (g)) " +
      "SELECT d.doc_id, (bad.doc_id IS NOT NULL) AS contaminated " +
      "FROM documents d LEFT JOIN bad ON bad.doc_id = d.doc_id"
  }

  /** Mirrors Dedup.dupNgramRate: per-source gram-instance counts
    * collapsed first, corpus-wide totals from the collapsed relation,
    * exact integer sums, one IEEE division per source. */
  def dupNgramRate(n: Int): String =
    "WITH dt AS (SELECT source, regexp_extract_all(text, '\\S+') AS t FROM documents), " +
      s"gr AS (SELECT source, array_to_string(t[CAST(i AS INT):CAST(i + ${n - 1} AS INT)], ' ') AS g " +
      s"FROM (SELECT source, t, UNNEST(generate_series(1, len(t) - ${n - 1})) AS i " +
      s"FROM dt WHERE len(t) >= $n)), " +
      "sg AS (SELECT source, g, CAST(COUNT(*) AS BIGINT) AS c FROM gr GROUP BY source, g), " +
      "gc AS (SELECT g, CAST(SUM(c) AS BIGINT) AS cg FROM sg GROUP BY g) " +
      "SELECT source, CAST(SUM(c) AS BIGINT) AS total_grams, " +
      "CAST(SUM(CASE WHEN cg > 1 THEN c ELSE CAST(0 AS BIGINT) END) AS BIGINT) AS dup_grams, " +
      "CAST(SUM(CASE WHEN cg > 1 THEN c ELSE CAST(0 AS BIGINT) END) AS DOUBLE) / " +
      "CAST(SUM(c) AS DOUBLE) AS dup_rate " +
      "FROM sg JOIN gc USING (g) GROUP BY source"

  /** Mirrors Dedup.leakFreeSplit: the [[dupComponents]] transitive
    * closure, then the split CASE on the 60-bit md5 of (component,
    * ':component:', salt) against the integer thresholds — the whole
    * component inherits one verdict. (tools/check_one.py replays the
    * closure iteratively at large sf, like q85/q104, with this tail.) */
  def leakFreeSplit(fracVal: Double, fracTest: Double, salt: String,
      k: Int = 5, threshold: Double = 0.7, bands: Int = 16,
      rowsPerBand: Int = 4): String = {
    import graft.pipeline.Sampling.{threshold => thr}
    s"WITH RECURSIVE p AS (${nearDupPairs(k, threshold, bands, rowsPerBand)}), " +
      "e AS (SELECT doc_a AS u, doc_b AS v FROM p UNION SELECT doc_b, doc_a FROM p), " +
      "walk(node, lab) AS (SELECT doc_id, doc_id FROM documents " +
      "UNION SELECT e.v, w.lab FROM walk w JOIN e ON e.u = w.node), " +
      "c AS (SELECT node AS doc_id, MIN(lab) AS component FROM walk GROUP BY node) " +
      "SELECT doc_id, component, " +
      s"CASE WHEN h < ${thr(fracVal)} THEN 'val' " +
      s"WHEN h < ${thr(fracVal + fracTest)} THEN 'test' ELSE 'train' END AS split " +
      "FROM (SELECT doc_id, component, ('0x' || substr(md5(" +
      s"CAST(component AS VARCHAR) || ':component:' || ${q(salt)}), 1, 15))::BIGINT AS h " +
      "FROM c) __c"
  }

  /** Mirrors Dedup.winnowingPairs: the same 60-bit gram hash, the same
    * doc-partitioned window MIN, DISTINCT (doc, fp), the df in [2,
    * dfCap] bucket filter, pair counts with the minShared floor. */
  def winnowingPairs(k: Int, w: Int, dfCap: Int, minShared: Int): String =
    s"WITH toks AS (SELECT doc_id, regexp_extract_all(text, '\\S+') AS t FROM documents), " +
      "g AS (SELECT doc_id, n, p, ('0x' || substr(md5(" +
      s"array_to_string(t[CAST(p AS INT):CAST(p + ${k - 1} AS INT)], ' ')), 1, 15))::BIGINT AS h " +
      s"FROM (SELECT doc_id, t, len(t) AS n, UNNEST(generate_series(1, len(t) - ${k - 1})) AS p " +
      s"FROM toks WHERE len(t) >= ${k + w - 1})), " +
      "f AS (SELECT DISTINCT doc_id, fp FROM (SELECT doc_id, p, n, " +
      s"MIN(h) OVER (PARTITION BY doc_id ORDER BY p ROWS BETWEEN CURRENT ROW AND ${w - 1} FOLLOWING) AS fp " +
      s"FROM g) __w WHERE p <= n - ${k + w - 2}), " +
      "kept AS (SELECT fp FROM (SELECT fp, COUNT(*) AS df FROM f GROUP BY fp) __d " +
      s"WHERE df >= 2 AND df <= $dfCap), " +
      "pf AS (SELECT f.doc_id, f.fp FROM f JOIN kept USING (fp)) " +
      "SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, CAST(COUNT(*) AS BIGINT) AS shared " +
      "FROM pf a JOIN pf b ON a.fp = b.fp AND a.doc_id < b.doc_id " +
      s"GROUP BY a.doc_id, b.doc_id HAVING COUNT(*) >= $minShared"

  /** Mirrors Dedup.winnowingContainment: the [[winnowingPairs]] CTEs
    * plus per-doc TOTAL selected-fingerprint counts and the
    * shared/min(|A|, |B|) division. */
  def winnowingContainment(k: Int, w: Int, dfCap: Int,
      minShared: Int): String =
    s"WITH toks AS (SELECT doc_id, regexp_extract_all(text, '\\S+') AS t FROM documents), " +
      "g AS (SELECT doc_id, n, p, ('0x' || substr(md5(" +
      s"array_to_string(t[CAST(p AS INT):CAST(p + ${k - 1} AS INT)], ' ')), 1, 15))::BIGINT AS h " +
      s"FROM (SELECT doc_id, t, len(t) AS n, UNNEST(generate_series(1, len(t) - ${k - 1})) AS p " +
      s"FROM toks WHERE len(t) >= ${k + w - 1})), " +
      "f AS (SELECT DISTINCT doc_id, fp FROM (SELECT doc_id, p, n, " +
      s"MIN(h) OVER (PARTITION BY doc_id ORDER BY p ROWS BETWEEN CURRENT ROW AND ${w - 1} FOLLOWING) AS fp " +
      s"FROM g) __w WHERE p <= n - ${k + w - 2}), " +
      "cnts AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS nf FROM f GROUP BY doc_id), " +
      "kept AS (SELECT fp FROM (SELECT fp, COUNT(*) AS df FROM f GROUP BY fp) __d " +
      s"WHERE df >= 2 AND df <= $dfCap), " +
      "pf AS (SELECT f.doc_id, f.fp FROM f JOIN kept USING (fp)), " +
      "pr AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, CAST(COUNT(*) AS BIGINT) AS shared " +
      "FROM pf a JOIN pf b ON a.fp = b.fp AND a.doc_id < b.doc_id " +
      s"GROUP BY a.doc_id, b.doc_id HAVING COUNT(*) >= $minShared) " +
      "SELECT doc_a, doc_b, shared, ca.nf AS fp_a, cb.nf AS fp_b, " +
      "CAST(shared AS DOUBLE) / CAST(LEAST(ca.nf, cb.nf) AS DOUBLE) AS containment " +
      "FROM pr JOIN cnts ca ON ca.doc_id = pr.doc_a " +
      "JOIN cnts cb ON cb.doc_id = pr.doc_b"

  /** Mirrors Dedup.contaminationScore: distinct word n-grams per doc,
    * overlap with the benchmark's distinct gram set, exact fraction.
    * The relational string-gram form — the Spark side counts via sorted
    * distinct XXH64 arrays, so each gate run re-proves the hash-set
    * counting against true string sets. */
  def contaminationScore(n: Int, benchWhere: String): String = {
    def grams(src: String, idSel: String, idGrp: String) =
      s"(SELECT $idSel array_to_string(t[CAST(i AS INT):CAST(i + ${n - 1} AS INT)], ' ') AS g " +
        s"FROM (SELECT $idGrp t, UNNEST(generate_series(1, len(t) - ${n - 1})) AS i " +
        s"FROM $src WHERE len(t) >= $n))"
    val bt = s"(SELECT regexp_extract_all(text, '\\S+') AS t FROM documents WHERE $benchWhere) __bt"
    val dt = "(SELECT doc_id, regexp_extract_all(text, '\\S+') AS t FROM documents) __dt"
    s"WITH bg AS (SELECT DISTINCT g FROM ${grams(bt, "", "")}), " +
      s"dg AS (SELECT DISTINCT doc_id, g FROM ${grams(dt, "doc_id, ", "doc_id, ")}), " +
      "c AS (SELECT dg.doc_id, CAST(COUNT(*) AS BIGINT) AS n_grams, " +
      "CAST(COUNT(bg.g) AS BIGINT) AS n_contaminated " +
      "FROM dg LEFT JOIN bg USING (g) GROUP BY dg.doc_id) " +
      "SELECT d.doc_id, COALESCE(c.n_grams, 0) AS n_grams, " +
      "COALESCE(c.n_contaminated, 0) AS n_contaminated, " +
      "CASE WHEN COALESCE(c.n_grams, 0) = 0 THEN CAST(0.0 AS DOUBLE) " +
      "ELSE CAST(c.n_contaminated AS DOUBLE) / CAST(c.n_grams AS DOUBLE) END " +
      "AS frac_contaminated " +
      "FROM documents d LEFT JOIN c ON c.doc_id = d.doc_id"
  }

  /** Mirrors Dedup.novelty: distinct word n-grams per new doc LEFT JOINed
    * against the reference corpus's distinct gram set (join-keyed — the
    * corpus-vs-corpus complement of contaminationScore's broadcast),
    * exact unseen fraction, NULL for gram-less docs. */
  def novelty(n: Int, newWhere: String, refWhere: String): String = {
    def grams(src: String, idSel: String, idGrp: String) =
      s"(SELECT $idSel array_to_string(t[CAST(i AS INT):CAST(i + ${n - 1} AS INT)], ' ') AS g " +
        s"FROM (SELECT $idGrp t, UNNEST(generate_series(1, len(t) - ${n - 1})) AS i " +
        s"FROM $src WHERE len(t) >= $n))"
    val rt = s"(SELECT regexp_extract_all(text, '\\S+') AS t FROM documents WHERE $refWhere) __rt"
    val nt = s"(SELECT doc_id, regexp_extract_all(text, '\\S+') AS t FROM documents WHERE $newWhere) __nt"
    s"WITH rg AS (SELECT DISTINCT g FROM ${grams(rt, "", "")}), " +
      s"ng AS (SELECT DISTINCT doc_id, g FROM ${grams(nt, "doc_id, ", "doc_id, ")}), " +
      "c AS (SELECT ng.doc_id, CAST(COUNT(*) AS BIGINT) AS n_grams, " +
      "CAST(COUNT(rg.g) AS BIGINT) AS n_seen " +
      "FROM ng LEFT JOIN rg USING (g) GROUP BY ng.doc_id) " +
      "SELECT d.doc_id, COALESCE(c.n_grams, 0) AS n_grams, " +
      "COALESCE(c.n_seen, 0) AS n_seen, " +
      "CASE WHEN COALESCE(c.n_grams, 0) = 0 THEN CAST(NULL AS DOUBLE) " +
      "ELSE CAST(c.n_grams - c.n_seen AS DOUBLE) / CAST(c.n_grams AS DOUBLE) END AS novelty " +
      s"FROM (SELECT doc_id FROM documents WHERE $newWhere) d LEFT JOIN c ON c.doc_id = d.doc_id"
  }

  /** Mirrors TextAnalysis.redact: same three patterns, same order,
    * global replacement ('g' — Spark's regexp_replace is global by
    * default, DuckDB's is first-match-only). */
  val redact: String = {
    import graft.pipeline.TextAnalysis.{DigitRunRe, EmailRe, UrlRe}
    "SELECT doc_id, regexp_replace(regexp_replace(regexp_replace(text, " +
      s"'$EmailRe', '<EMAIL>', 'g'), '$UrlRe', '<URL>', 'g'), " +
      s"'$DigitRunRe', '<NUM>', 'g') AS text_redacted FROM documents"
  }

  /** Mirrors Sampling.sampleTokenBudget: per-source token totals, keep
    * rate min(1, budget/total), hash-threshold filter. The 2^60 scale and
    * the rate arithmetic are the same IEEE doubles in both engines. */
  def sampleTokenBudget(budgetTokens: Long, salt: String): String = {
    val scale = java.lang.Double.toString(math.pow(2.0, 60))
    "WITH t AS (SELECT source, CAST(SUM(len(regexp_extract_all(text, '\\S+'))) AS BIGINT) AS tot " +
      "FROM documents GROUP BY source) " +
      "SELECT d.doc_id, d.source FROM documents d JOIN t USING (source) " +
      s"WHERE ('0x' || substr(md5(CAST(d.doc_id AS VARCHAR) || ':' || d.source || ':' || ${q(salt)}), 1, 15))::BIGINT " +
      s"< CAST(FLOOR(LEAST(CAST(1.0 AS DOUBLE), CAST($budgetTokens AS DOUBLE) / CAST(tot AS DOUBLE)) * CAST('$scale' AS DOUBLE)) AS BIGINT)"
  }

  /** Mirrors Sampling.sampleTemperature: per-source counts, n^alpha
    * weights (sqrt/identity exact; other alphas floor-quantized to 1e-9
    * so both engines feed identical inputs downstream of a pow() that is
    * not guaranteed correctly rounded), the pinned-order sequential
    * weight-sum fold (SUM ORDER BY source — the drift precedent),
    * identical left-associated rate arithmetic, hash-threshold filter. */
  def sampleTemperature(totalDocs: Long, alpha: Double, salt: String): String = {
    val scale = java.lang.Double.toString(math.pow(2.0, 60))
    val w =
      if (alpha == 1.0) "CAST(n AS DOUBLE)"
      else if (alpha == 0.5) "SQRT(CAST(n AS DOUBLE))"
      else s"FLOOR(POW(CAST(n AS DOUBLE), CAST('${java.lang.Double.toString(alpha)}' AS DOUBLE)) * CAST('1.0E9' AS DOUBLE)) / CAST('1.0E9' AS DOUBLE)"
    val wsum = "SUM(w ORDER BY source)"
    "WITH t AS (SELECT source, CAST(COUNT(*) AS BIGINT) AS n FROM documents GROUP BY source), " +
      s"w AS (SELECT source, n, $w AS w FROM t), " +
      s"ws AS (SELECT $wsum AS ws FROM w) " +
      "SELECT d.doc_id, d.source FROM documents d JOIN w USING (source) CROSS JOIN ws " +
      s"WHERE ('0x' || substr(md5(CAST(d.doc_id AS VARCHAR) || ':' || d.source || ':' || ${q(salt)}), 1, 15))::BIGINT " +
      s"< CAST(FLOOR(LEAST(CAST(1.0 AS DOUBLE), CAST($totalDocs AS DOUBLE) * w / ws / CAST(n AS DOUBLE)) * CAST('$scale' AS DOUBLE)) AS BIGINT)"
  }

  /** Mirrors Sampling.packSequences: same hash shard, same (hash,
    * doc_id) layout order, exclusive window cumsum, integer div/mod
    * slots (cumsum >= 0, so `div` and `//` agree). */
  def packSequences(contextLen: Long, nShards: Int, salt: String): String =
    "WITH d AS (SELECT doc_id, source, " +
      "CAST(COALESCE(len(regexp_extract_all(text, '\\S+')), 0) AS BIGINT) AS n_tokens, " +
      s"('0x' || substr(md5(CAST(doc_id AS VARCHAR) || ':' || source || ':' || ${q(salt)}), 1, 15))::BIGINT AS hh " +
      "FROM documents), " +
      s"s AS (SELECT *, CAST(hh % $nShards AS INT) AS shard FROM d), " +
      "c AS (SELECT *, CAST(COALESCE(SUM(n_tokens) OVER " +
      "(PARTITION BY shard ORDER BY hh, doc_id ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS cum FROM s) " +
      s"SELECT doc_id, source, shard, n_tokens, CAST(cum // $contextLen AS BIGINT) AS pack, " +
      s"CAST(cum % $contextLen AS BIGINT) AS pack_offset FROM c"

  /** Mirrors Curation.topFractionBySource over n_chars scores: same
    * (score desc, doc_id) rank, same ceil-of-double-product cutoff. */
  def topFractionBySource(frac: Double): String = {
    val f = java.lang.Double.toString(frac)
    "WITH s AS (SELECT doc_id, source, CAST(n_chars AS BIGINT) AS score, " +
      "COUNT(*) OVER (PARTITION BY source) AS n, " +
      "ROW_NUMBER() OVER (PARTITION BY source ORDER BY n_chars DESC, doc_id) AS r " +
      "FROM documents) " +
      s"SELECT doc_id, source, score, r <= CEIL(CAST('$f' AS DOUBLE) * CAST(n AS DOUBLE)) AS keep FROM s"
  }

  /** Mirrors Curation.topFractionBySourceSketch in its provably-exact
    * regime: the per-source threshold is the value at 1-based rank
    * ceil(p·n) ascending (the GK query rule with every sample retained —
    * see the operator's scaladoc), then keep = score >= threshold. The
    * p·n product and the ceil are the same IEEE double ops in both
    * engines (p shipped via Double.toString round-trip). Ranks over
    * CAST(score AS DOUBLE) ascending — tie order is immaterial because
    * tied ranks hold equal values. */
  def topFractionBySourceSketch(frac: Double): String = {
    val p = java.lang.Double.toString(1.0 - frac)
    "WITH s AS (SELECT doc_id, source, CAST(n_chars AS BIGINT) AS score FROM documents), " +
      "n AS (SELECT source, CAST(COUNT(*) AS BIGINT) AS n FROM s GROUP BY source), " +
      "rk AS (SELECT source, CAST(score AS DOUBLE) AS v, " +
      "ROW_NUMBER() OVER (PARTITION BY source ORDER BY CAST(score AS DOUBLE)) AS r FROM s), " +
      "th AS (SELECT rk.source, rk.v AS thr FROM rk JOIN n USING (source) " +
      s"WHERE rk.r = CAST(CEIL(CAST('$p' AS DOUBLE) * CAST(n AS DOUBLE)) AS BIGINT)) " +
      "SELECT s.doc_id, s.source, s.score, CAST(s.score AS DOUBLE) >= th.thr AS keep " +
      "FROM s JOIN th USING (source)"
  }

  /** Mirrors Curation.winsorizeBySource in the exact regime: both
    * thresholds are the values at ranks ceil(pLo·n)/ceil(pHi·n) ascending
    * (the GK query rule with every sample retained), then ONE
    * least(greatest(score, lo), hi) clip — identical IEEE comparisons. */
  def winsorizeBySource(pLo: Double, pHi: Double): String = {
    val lo = java.lang.Double.toString(pLo)
    val hi = java.lang.Double.toString(pHi)
    "WITH s AS (SELECT doc_id, source, CAST(n_chars AS BIGINT) AS score FROM documents), " +
      "n AS (SELECT source, CAST(COUNT(*) AS BIGINT) AS n FROM s GROUP BY source), " +
      "rk AS (SELECT source, CAST(score AS DOUBLE) AS v, " +
      "ROW_NUMBER() OVER (PARTITION BY source ORDER BY CAST(score AS DOUBLE)) AS r FROM s), " +
      "th AS (SELECT n.source, " +
      s"MAX(CASE WHEN rk.r = CAST(CEIL(CAST('$lo' AS DOUBLE) * CAST(n.n AS DOUBLE)) AS BIGINT) THEN rk.v END) AS lo, " +
      s"MAX(CASE WHEN rk.r = CAST(CEIL(CAST('$hi' AS DOUBLE) * CAST(n.n AS DOUBLE)) AS BIGINT) THEN rk.v END) AS hi " +
      "FROM rk JOIN n USING (source) GROUP BY n.source) " +
      "SELECT s.doc_id, s.source, s.score, " +
      "LEAST(GREATEST(CAST(s.score AS DOUBLE), th.lo), th.hi) AS clipped " +
      "FROM s JOIN th USING (source)"
  }

  /** Mirrors Funnel.eventRateAnomaly: per (type, day) counts, EXACT
    * integer trailing-window sums, then the fixed IEEE z-score tail
    * (mean, w·Σc²−(Σc)² clamp, sqrt, k·std compare) verbatim — identical
    * doubles in, identical flag out. Partial windows yield NULLs. */
  def eventRateAnomaly(windowDays: Int, k: Double): String = {
    val kk = java.lang.Double.toString(k)
    val w = windowDays
    "WITH ev AS (SELECT event_type, (epoch_ns(ts) // 1000) // 86400000000 AS day " +
      "FROM events WHERE ts IS NOT NULL), " +
      "c AS (SELECT event_type, day, CAST(COUNT(*) AS BIGINT) AS n FROM ev GROUP BY 1, 2), " +
      "a AS (SELECT event_type, day, n, " +
      "CAST(COUNT(*) OVER win AS BIGINT) AS w, " +
      "CAST(COALESCE(SUM(n) OVER win, 0) AS BIGINT) AS s, " +
      "CAST(COALESCE(SUM(n * n) OVER win, 0) AS BIGINT) AS ss " +
      "FROM c WINDOW win AS (PARTITION BY event_type ORDER BY day " +
      s"ROWS BETWEEN $w PRECEDING AND 1 PRECEDING)) " +
      "SELECT event_type, day, n, " +
      s"CASE WHEN w = $w THEN CAST(s AS DOUBLE) / CAST(w AS DOUBLE) END AS mean, " +
      s"CASE WHEN w = $w THEN SQRT(GREATEST(CAST(0.0 AS DOUBLE), CAST(w AS DOUBLE) * CAST(ss AS DOUBLE) - CAST(s AS DOUBLE) * CAST(s AS DOUBLE)) / (CAST(w AS DOUBLE) * CAST(w - 1 AS DOUBLE))) END AS std, " +
      s"CASE WHEN w = $w THEN ABS(CAST(n AS DOUBLE) - CAST(s AS DOUBLE) / CAST(w AS DOUBLE)) > CAST('$kk' AS DOUBLE) * SQRT(GREATEST(CAST(0.0 AS DOUBLE), CAST(w AS DOUBLE) * CAST(ss AS DOUBLE) - CAST(s AS DOUBLE) * CAST(s AS DOUBLE)) / (CAST(w AS DOUBLE) * CAST(w - 1 AS DOUBLE))) END AS is_anomaly " +
      "FROM a"
  }

  /** Per-source corpus profile (mirrors TextAnalysis.corpusStats). */
  val corpusStats: String =
    "SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs, " +
      "CAST(SUM(len(regexp_extract_all(text, '\\S+'))) AS BIGINT) AS total_tokens, " +
      "CAST(SUM(length(text)) AS BIGINT) AS total_chars, " +
      "CAST(SUM(length(text)) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE) AS avg_chars " +
      "FROM documents GROUP BY source"

  /** Exact per-source reservoir (mirrors Sampling.sampleExactPerSource):
    * the n smallest salted hashes per source. */
  def sampleExactPerSource(n: Int, salt: String): String =
    "WITH h AS (SELECT source, doc_id, " +
      s"('0x' || substr(md5(CAST(doc_id AS VARCHAR) || ':' || source || ':' || ${q(salt)}), 1, 15))::BIGINT AS hh " +
      "FROM documents), " +
      "r AS (SELECT *, ROW_NUMBER() OVER (PARTITION BY source ORDER BY hh, doc_id) AS rn FROM h) " +
      s"SELECT source, doc_id FROM r WHERE rn <= $n"

  /** Shared CTE for the media oracles: each doc's synthesis parameters
    * as MediaCodec's closed forms — container format (doc_id mod 97 == 0
    * is the deliberate corrupt slice; images rotate png/jpeg/gif by
    * (doc_id/3) mod 3), dimensions 16 + (doc_id·37) mod 2000 ×
    * 16 + (doc_id·59) mod 1200, WAV block align 2·(1 + doc_id mod 2),
    * AVI frame count 1 + n mod 240. The Spark side derives every one of
    * these numbers ONLY by parsing the synthesized bytes (MediaCodec
    * walkers), so a hash match proves the parsers invert the writers. */
  private def mediaBase: String =
    "m AS (SELECT doc_id, text, CAST(length(text) AS BIGINT) AS n, " +
      "CASE WHEN doc_id % 97 = 0 THEN 'unknown' " +
      "WHEN doc_id % 3 = 0 THEN (CASE (doc_id // 3) % 3 WHEN 0 THEN 'png' WHEN 1 THEN 'jpeg' ELSE 'gif' END) " +
      "WHEN doc_id % 3 = 1 THEN 'wav' ELSE 'avi' END AS fmt, " +
      "CASE WHEN doc_id % 3 = 0 THEN 'image' WHEN doc_id % 3 = 1 THEN 'audio' ELSE 'video' END AS media_type, " +
      "CAST(16 + (doc_id * 37) % 2000 AS INT) AS dw, " +
      "CAST(16 + (doc_id * 59) % 1200 AS INT) AS dh, " +
      "CAST(2 * (1 + doc_id % 2) AS BIGINT) AS block_align " +
      "FROM documents)"

  /** Mirrors Multimodal.pipeline over the REAL container codecs:
    * media_type from doc_id mod 3; format, dims, frame counts and total
    * container sizes from the synthesis closed forms (size = header +
    * trailer overhead per format + body + RIFF pad). decoded_ok is false
    * exactly on the corrupt slice. */
  def multimodalMeta(): String =
    s"WITH $mediaBase " +
      "SELECT doc_id, media_type, fmt AS format, " +
      "CAST(CASE fmt WHEN 'unknown' THEN 1 + n WHEN 'png' THEN 57 + n " +
      "WHEN 'jpeg' THEN 55 + n WHEN 'gif' THEN 14 + n " +
      "WHEN 'wav' THEN 44 + n + n % 2 ELSE 108 + n + n % 2 END AS BIGINT) AS n_bytes, " +
      "CAST(CASE WHEN fmt IN ('png', 'jpeg', 'gif', 'avi') THEN dw ELSE 0 END AS INT) AS width, " +
      "CAST(CASE WHEN fmt IN ('png', 'jpeg', 'gif', 'avi') THEN dh ELSE 0 END AS INT) AS height, " +
      "CAST(CASE WHEN fmt IN ('png', 'jpeg', 'gif') THEN 1 " +
      "WHEN fmt = 'wav' THEN n // block_align " +
      "WHEN fmt = 'avi' THEN 1 + n % 240 ELSE 0 END AS INT) AS n_frames, " +
      "fmt <> 'unknown' AS decoded_ok " +
      "FROM m"

  /** Mirrors Multimodal.qaReport: the [[multimodalMeta]] relation
    * aggregated per (media_type, format) — exact longs, two IEEE
    * divisions, decoded-only dimension means. */
  def mediaQa(): String =
    s"WITH meta AS (${multimodalMeta()}), " +
      "g AS (SELECT media_type, format, CAST(COUNT(*) AS BIGINT) AS n_assets, " +
      "CAST(SUM(CASE WHEN decoded_ok THEN 1 ELSE 0 END) AS BIGINT) AS n_ok, " +
      "CAST(SUM(n_bytes) AS BIGINT) AS total_bytes, " +
      "CAST(SUM(CASE WHEN decoded_ok THEN CAST(width AS BIGINT) END) AS BIGINT) AS sw, " +
      "CAST(SUM(CASE WHEN decoded_ok THEN CAST(height AS BIGINT) END) AS BIGINT) AS sh " +
      "FROM meta GROUP BY 1, 2) " +
      "SELECT media_type, format, n_assets, n_ok, " +
      "CAST(n_ok AS DOUBLE) / CAST(n_assets AS DOUBLE) AS ok_rate, total_bytes, " +
      "CASE WHEN n_ok = 0 THEN CAST(NULL AS DOUBLE) " +
      "ELSE CAST(sw AS DOUBLE) / CAST(n_ok AS DOUBLE) END AS mean_width, " +
      "CASE WHEN n_ok = 0 THEN CAST(NULL AS DOUBLE) " +
      "ELSE CAST(sh AS DOUBLE) / CAST(n_ok AS DOUBLE) END AS mean_height FROM g"

  /** Mirrors Multimodal.sampleFrames: parseable AVI videos only (doc_id
    * mod 3 = 2, excluding the corrupt slice), frame indices 0, 24, 48...
    * below the avih frame count (1 + n mod 240 by synthesis — the Spark
    * side READS it from the parsed header), frame payload = the rotated
    * slice of the movi stream body, which is the text bytes (ASCII
    * corpus: string rotation == byte rotation). */
  def frameSample(everyN: Int = 24): String =
    "WITH v AS (SELECT doc_id, text, CAST(length(text) AS BIGINT) AS n " +
      "FROM documents WHERE doc_id % 3 = 2 AND doc_id % 97 <> 0), " +
      "f AS (SELECT doc_id, text, n, " +
      s"UNNEST(generate_series(0, CAST(1 + n % 240 AS BIGINT) - 1, $everyN)) AS fi FROM v) " +
      // off mirrors Spark's empty-body guard: fi % 0 would be NULL here
      // while sampleFrames pins off = 0 for empty bodies
      "SELECT doc_id, CAST(fi AS INT) AS frame_idx, " +
      "md5(substring(text, CAST(CASE WHEN n = 0 THEN 0 ELSE fi % n END AS INT) + 1) || " +
      "substring(text, 1, CAST(CASE WHEN n = 0 THEN 0 ELSE fi % n END AS INT))) AS payload_md5 " +
      "FROM f"

  /** Mirrors Multimodal.thumbnail: images carry their PARSED dims scaled
    * aspect-preserving into the bounding box with exact integer floors
    * (greatest(1, d·box // maxDim)) plus the md5 of the truncated stream
    * body; non-images and the corrupt slice pass through with zeroed
    * thumb dims and an empty payload (md5 of '' on both engines). AVI
    * records keep their parsed width/height but get no thumbnail. */
  def thumbnail(box: Int = 128, maxBytes: Int = 256): String =
    s"WITH $mediaBase " +
      "SELECT doc_id, media_type, fmt AS format, " +
      "CAST(CASE WHEN fmt IN ('png', 'jpeg', 'gif', 'avi') THEN dw ELSE 0 END AS INT) AS width, " +
      "CAST(CASE WHEN fmt IN ('png', 'jpeg', 'gif', 'avi') THEN dh ELSE 0 END AS INT) AS height, " +
      "CAST(CASE WHEN fmt NOT IN ('png', 'jpeg', 'gif') THEN 0 " +
      s"WHEN GREATEST(dw, dh) <= $box THEN dw " +
      s"ELSE GREATEST(1, (dw * $box) // GREATEST(dw, dh)) END AS INT) AS thumb_w, " +
      "CAST(CASE WHEN fmt NOT IN ('png', 'jpeg', 'gif') THEN 0 " +
      s"WHEN GREATEST(dw, dh) <= $box THEN dh " +
      s"ELSE GREATEST(1, (dh * $box) // GREATEST(dw, dh)) END AS INT) AS thumb_h, " +
      "CASE WHEN fmt IN ('png', 'jpeg', 'gif') " +
      s"THEN md5(substring(text, 1, $maxBytes)) ELSE md5('') END AS payload_md5 " +
      "FROM m"

  def fingerprint(maxLen: Int = 64): String = {
    val pows = TextAnalysis.fingerprintPows(maxLen).mkString("[", ", ", "]")
    s"WITH ch AS (SELECT doc_id, CAST(i AS INT) AS i, ascii(substring(text, CAST(i AS INT), 1)) AS c " +
      s"FROM (SELECT doc_id, text, UNNEST(generate_series(1, least(length(text), $maxLen))) AS i FROM documents)), " +
      s"t AS (SELECT doc_id, CAST(c AS BIGINT) * ($pows[i]) AS term FROM ch) " +
      s"SELECT doc_id, CAST(SUM(term) % ${TextAnalysis.FpMod} AS BIGINT) AS fingerprint " +
      "FROM t GROUP BY doc_id"
  }

  /** Mirrors Dedup.components over the nearDupPairs graph: a recursive
    * reachability walk carries every label to every node of its component
    * (edges doubled to undirected), then MIN per node — the closed-form
    * fixpoint of the Spark side's min-label propagation loop, so the gate
    * proves the iterative algorithm converged to the true transitive
    * closure, not just to a stable point. */
  def dupComponents(k: Int = 5, threshold: Double = 0.7, bands: Int = 16,
      rowsPerBand: Int = 4): String =
    s"WITH RECURSIVE p AS (${nearDupPairs(k, threshold, bands, rowsPerBand)}), " +
      "e AS (SELECT doc_a AS u, doc_b AS v FROM p UNION SELECT doc_b, doc_a FROM p), " +
      "walk(node, lab) AS (SELECT doc_id, doc_id FROM documents " +
      "UNION SELECT e.v, w.lab FROM walk w JOIN e ON e.u = w.node) " +
      "SELECT node AS doc_id, MIN(lab) AS component, node = MIN(lab) AS keep " +
      "FROM walk GROUP BY node"

  /** Mirrors Dedup.componentsKeepBy over n_chars scores: the same
    * transitive closure, canonical doc = argmax(score) per component
    * with ties to the lowest doc_id. */
  def componentsKeepBy(k: Int = 5, threshold: Double = 0.7, bands: Int = 16,
      rowsPerBand: Int = 4): String =
    s"WITH RECURSIVE p AS (${nearDupPairs(k, threshold, bands, rowsPerBand)}), " +
      "e AS (SELECT doc_a AS u, doc_b AS v FROM p UNION SELECT doc_b, doc_a FROM p), " +
      "walk(node, lab) AS (SELECT doc_id, doc_id FROM documents " +
      "UNION SELECT e.v, w.lab FROM walk w JOIN e ON e.u = w.node), " +
      "c AS (SELECT node AS doc_id, MIN(lab) AS component FROM walk GROUP BY node), " +
      "s AS (SELECT c.doc_id, c.component, CAST(d.n_chars AS BIGINT) AS score " +
      "FROM c JOIN documents d USING (doc_id)), " +
      "b AS (SELECT component, doc_id AS best_id FROM s " +
      "QUALIFY ROW_NUMBER() OVER (PARTITION BY component ORDER BY score DESC, doc_id) = 1) " +
      "SELECT s.doc_id, s.component, s.score, s.doc_id = b.best_id AS keep " +
      "FROM s JOIN b USING (component)"

  /** Mirrors StreamingHist.sessionize over events: the lag/cumsum
    * sessionization identity — a session breaks only when the gap to the
    * previous event EXCEEDS the window gap (Spark's session_window merges
    * touching windows: an event exactly `gap` after the previous one still
    * extends the session), session end = last event + gap. The value sum
    * goes through the engine-exact DECIMAL(38,14) route (Dec/exactDbl). */
  def sessionize(gapUs: Long): String =
    "WITH o AS (SELECT user_id, epoch_ns(ts) // 1000 AS us, value FROM events WHERE ts IS NOT NULL), " +
      "m AS (SELECT user_id, us, value, CASE WHEN us - LAG(us) OVER (PARTITION BY user_id ORDER BY us) " +
      s"> $gapUs THEN 1 ELSE 0 END AS brk FROM o), " +
      "s AS (SELECT user_id, us, value, SUM(brk) OVER (PARTITION BY user_id ORDER BY us " +
      "ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid FROM m) " +
      "SELECT user_id, make_timestamp(MIN(us)) AS session_start, " +
      s"make_timestamp(MAX(us) + $gapUs) AS session_end, " +
      "CAST(COUNT(*) AS BIGINT) AS n_events, " +
      Oracle.exactDbl("SUM(TRY_CAST(CAST(value AS VARCHAR) AS DECIMAL(38,14)))") +
      " AS sum_value FROM s GROUP BY user_id, sid"

  /** Mirrors Curation.cartography over events keyed by user_id:
    * 1e-6-floor-quantized exact long scores, Σq / Σq² in DECIMAL(38,0)
    * (no double→string round-trip), the pinned CAST/1e6/n and
    * CAST/1e12/n sequences, correctness an exact-long ratio, the
    * region CASE on those reproducible doubles. */
  def cartography(thr: Double, cHi: Double, vLo: Double): String = {
    def d(x: Double) = s"CAST('${java.lang.Double.toString(x)}' AS DOUBLE)"
    val q6 = s"CAST(FLOOR(value * ${d(1.0e6)}) AS BIGINT)"
    "WITH a AS (SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n, " +
      s"SUM(CAST($q6 AS DECIMAL(38,0))) AS s, " +
      s"SUM(CAST(CAST($q6 AS DECIMAL(13,0)) * CAST($q6 AS DECIMAL(13,0)) AS DECIMAL(38,0))) AS ss, " +
      s"CAST(SUM(CASE WHEN value > ${d(thr)} THEN 1 ELSE 0 END) AS BIGINT) AS c " +
      "FROM events WHERE user_id IS NOT NULL AND value IS NOT NULL GROUP BY user_id), " +
      s"b AS (SELECT user_id, n, CAST(s AS DOUBLE) / ${d(1.0e6)} / CAST(n AS DOUBLE) AS confidence, " +
      s"SQRT(GREATEST(CAST(0 AS DOUBLE), CAST(ss AS DOUBLE) / ${d(1.0e12)} / CAST(n AS DOUBLE) - " +
      s"(CAST(s AS DOUBLE) / ${d(1.0e6)} / CAST(n AS DOUBLE)) * " +
      s"(CAST(s AS DOUBLE) / ${d(1.0e6)} / CAST(n AS DOUBLE)))) AS variability, " +
      "CAST(c AS DOUBLE) / CAST(n AS DOUBLE) AS correctness FROM a) " +
      "SELECT user_id, n, confidence, variability, correctness, " +
      s"CASE WHEN variability >= ${d(vLo)} THEN 'ambiguous' " +
      s"WHEN confidence >= ${d(cHi)} THEN 'easy' ELSE 'hard' END AS region FROM b"
  }

  /** Mirrors QuantileBins.groupQuantiles over events.value by
    * event_type: same 0-based ranks, same h = (n-1)·q, same
    * a + (h-l)·(b-a) interpolation sequence (NOT quantile_cont, whose
    * internal expression differs in rounding). */
  def groupQuantiles(qs: Seq[Double]): String = {
    val qlist = qs.map(q => s"CAST('${java.lang.Double.toString(q)}' AS DOUBLE)")
      .mkString("[", ", ", "]")
    "WITH b AS (SELECT event_type, CAST(value AS DOUBLE) AS v FROM events WHERE value IS NOT NULL), " +
      "r AS (SELECT event_type, v, ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY v) - 1 AS rn FROM b), " +
      "s AS (SELECT event_type, COUNT(*) AS n FROM b GROUP BY event_type), " +
      s"qv AS (SELECT event_type, n, UNNEST($qlist) AS q FROM s), " +
      "c AS (SELECT event_type, q, CAST(n - 1 AS DOUBLE) * q AS h FROM qv), " +
      "d AS (SELECT event_type, q, h, CAST(FLOOR(h) AS BIGINT) AS l FROM c), " +
      "e AS (SELECT d.event_type, d.q, d.h, d.l, rl.v AS xl, COALESCE(ru.v, rl.v) AS xu " +
      "FROM d JOIN r rl ON rl.event_type = d.event_type AND rl.rn = d.l " +
      "LEFT JOIN r ru ON ru.event_type = d.event_type AND ru.rn = d.l + 1) " +
      "SELECT event_type, q, xl + (h - CAST(l AS DOUBLE)) * (xu - xl) AS quantile FROM e"
  }

  /** Mirrors Funnel.sessionPaths: the sessionize lag/cumsum identity,
    * per-session type sequence ordered by (time, type), count per path,
    * top-k with ties to the lexicographically first path. */
  def sessionPaths(gapUs: Long, k: Int): String =
    "WITH o AS (SELECT user_id, epoch_ns(ts) // 1000 AS us, event_type FROM events " +
      "WHERE ts IS NOT NULL AND event_type IS NOT NULL), " +
      "m AS (SELECT user_id, us, event_type, CASE WHEN us - LAG(us) OVER (PARTITION BY user_id ORDER BY us) " +
      s"> $gapUs THEN 1 ELSE 0 END AS brk FROM o), " +
      "s AS (SELECT user_id, us, event_type, SUM(brk) OVER (PARTITION BY user_id ORDER BY us " +
      "ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid FROM m), " +
      "p AS (SELECT user_id, sid, string_agg(event_type, '>' ORDER BY us, event_type) AS path " +
      "FROM s GROUP BY user_id, sid), " +
      "c AS (SELECT path, CAST(COUNT(*) AS BIGINT) AS n_sessions FROM p GROUP BY path), " +
      "r AS (SELECT *, ROW_NUMBER() OVER (ORDER BY n_sessions DESC, path) AS rn FROM c) " +
      s"SELECT path, n_sessions, CAST(rn AS INT) AS rank FROM r WHERE rn <= $k"

  /** Mirrors Funnel.sessionFunnel: the sessionPaths lag/sum session ids,
    * then first-from / first-strictly-later-to per session (the FILTER
    * predicate goes NULL when t_from is NULL, so from-less sessions
    * never convert — same null-strict semantics as the array filter). */
  def sessionFunnel(gapUs: Long, fromType: String, toType: String): String =
    "WITH o AS (SELECT user_id, epoch_ns(ts) // 1000 AS us, event_type FROM events " +
      "WHERE ts IS NOT NULL AND event_type IS NOT NULL), " +
      "m AS (SELECT user_id, us, event_type, CASE WHEN us - LAG(us) OVER (PARTITION BY user_id ORDER BY us) " +
      s"> $gapUs THEN 1 ELSE 0 END AS brk FROM o), " +
      "s AS (SELECT user_id, us, event_type, SUM(brk) OVER (PARTITION BY user_id ORDER BY us " +
      "ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid FROM m), " +
      "g AS (SELECT user_id, sid, MIN(us) AS session_start, CAST(COUNT(*) AS BIGINT) AS n_events, " +
      s"MIN(us) FILTER (WHERE event_type = ${q(fromType)}) AS t_from FROM s GROUP BY user_id, sid), " +
      "g2 AS (SELECT g.user_id, g.sid, g.session_start, g.n_events, g.t_from, " +
      s"MIN(s.us) FILTER (WHERE s.event_type = ${q(toType)} AND s.us > g.t_from) AS t_to " +
      "FROM g JOIN s ON s.user_id = g.user_id AND s.sid = g.sid " +
      "GROUP BY g.user_id, g.sid, g.session_start, g.n_events, g.t_from) " +
      "SELECT user_id, session_start, n_events, t_from, t_to, " +
      "(t_to IS NOT NULL) AS converted, t_to - t_from AS latency_us FROM g2"

  /** Mirrors Sampling.stratifiedSplit: same salted 60-bit hash, same
    * (hash, doc_id) rank, same floor'd double-arithmetic thresholds
    * (double literals, not DuckDB's decimal 0.1). */
  def stratifiedSplit(fracVal: Double, fracTest: Double,
      salt: String): String = {
    def dbl(x: Double): String =
      s"CAST('${java.lang.Double.toString(x)}' AS DOUBLE)"
    def flr(f: Double): String =
      s"CAST(FLOOR(${dbl(f)} * CAST(n AS DOUBLE)) AS BIGINT)"
    "WITH h AS (SELECT doc_id, source, " +
      s"('0x' || substr(md5(CAST(doc_id AS VARCHAR) || ':' || source || ':' || ${q(salt)}), 1, 15))::BIGINT AS hh " +
      "FROM documents WHERE doc_id IS NOT NULL AND source IS NOT NULL), " +
      "r AS (SELECT *, ROW_NUMBER() OVER (PARTITION BY source ORDER BY hh, doc_id) AS rn, " +
      "COUNT(*) OVER (PARTITION BY source) AS n FROM h) " +
      s"SELECT doc_id, source, CASE WHEN rn <= ${flr(fracVal)} THEN 'val' " +
      s"WHEN rn <= ${flr(fracVal)} + ${flr(fracTest)} THEN 'test' " +
      "ELSE 'train' END AS split FROM r"
  }

  /** Mirrors Curation.profileTable: one aggregate row per profiled
    * column (exact null / distinct counts; no value rendering). */
  def profileTable(table: String, cols: Seq[String]): String =
    cols.map { c =>
      s"SELECT '$c' AS column, CAST(COUNT(*) AS BIGINT) AS n, " +
        s"CAST(COUNT(*) - COUNT($c) AS BIGINT) AS n_null, " +
        s"CAST(COUNT(DISTINCT $c) AS BIGINT) AS n_distinct FROM $table"
    }.mkString(" UNION ALL ")

  /** Mirrors Curation.profileWindowed over events: the [[profileTable]]
    * branches grouped by the same microsecond window floor. */
  def profileWindowed(durUs: Long, cols: Seq[String]): String = {
    val base = "(SELECT *, ((epoch_ns(ts) // 1000) // " +
      s"$durUs) * $durUs AS __ws FROM events WHERE ts IS NOT NULL) __b"
    cols.map { c =>
      s"SELECT make_timestamp(__ws) AS window_start, '$c' AS column, " +
        "CAST(COUNT(*) AS BIGINT) AS n, " +
        s"CAST(COUNT(*) - COUNT($c) AS BIGINT) AS n_null, " +
        s"CAST(COUNT(DISTINCT $c) AS BIGINT) AS n_distinct FROM $base GROUP BY __ws"
    }.mkString(" UNION ALL ")
  }

  /** Mirrors Curation.profileWindowedSketch: the exact profile columns
    * plus the pinned contract verdict (q172 convention — the HLL
    * estimate is engine-specific; TRUE is what both must agree on). */
  def profileWindowedSketch(durUs: Long, cols: Seq[String]): String = {
    val base = "(SELECT *, ((epoch_ns(ts) // 1000) // " +
      s"$durUs) * $durUs AS __ws FROM events WHERE ts IS NOT NULL) __b"
    cols.map { c =>
      s"SELECT make_timestamp(__ws) AS window_start, '$c' AS column, " +
        "CAST(COUNT(*) AS BIGINT) AS n, " +
        s"CAST(COUNT(*) - COUNT($c) AS BIGINT) AS n_null, " +
        s"CAST(COUNT(DISTINCT $c) AS BIGINT) AS n_distinct, " +
        s"TRUE AS within_bound FROM $base GROUP BY __ws"
    }.mkString(" UNION ALL ")
  }

  /** Mirrors TextAnalysis.negSamplingTable: exact vocabulary counts,
    * 1e6 floor-quantized POWER, exact HUGEINT normalizer, one IEEE
    * division. */
  def negSamplingTable(alpha: Double): String = {
    val a = s"CAST('${java.lang.Double.toString(alpha)}' AS DOUBLE)"
    "WITH v AS (SELECT term, CAST(COUNT(*) AS BIGINT) AS f FROM (" +
      "SELECT UNNEST(regexp_extract_all(text, '\\S+')) AS term FROM documents " +
      "WHERE text IS NOT NULL) t GROUP BY term), " +
      s"w AS (SELECT term, f, CAST(FLOOR(POWER(CAST(f AS DOUBLE), $a) * " +
      "CAST('1000000.0' AS DOUBLE)) AS BIGINT) AS wq FROM v), " +
      "tot AS (SELECT SUM(wq) AS t FROM w) " +
      "SELECT term, f, CAST(wq AS DOUBLE) / CAST(t AS DOUBLE) AS p_neg " +
      "FROM w CROSS JOIN tot"
  }

  /** Mirrors Dedup.sourceOverlap: distinct (md5, source), self-join
    * pair counts with a < b, Jaccard as one IEEE division. */
  val sourceOverlap: String =
    "WITH hs AS (SELECT DISTINCT md5(text) AS h, source AS s FROM documents " +
      "WHERE text IS NOT NULL AND source IS NOT NULL), " +
      "sz AS (SELECT s, CAST(COUNT(*) AS BIGINT) AS n FROM hs GROUP BY s), " +
      "p AS (SELECT x.s AS source_a, y.s AS source_b, CAST(COUNT(*) AS BIGINT) AS n_shared " +
      "FROM hs x JOIN hs y ON y.h = x.h AND x.s < y.s GROUP BY 1, 2) " +
      "SELECT p.source_a, p.source_b, a.n AS n_a, b.n AS n_b, p.n_shared, " +
      "CAST(p.n_shared AS DOUBLE) / CAST(a.n + b.n - p.n_shared AS DOUBLE) AS jaccard " +
      "FROM p JOIN sz a ON a.s = p.source_a JOIN sz b ON b.s = p.source_b"

  /** Mirrors Curation.quantileCalibrate over documents.n_chars: the
    * (score, doc_id) percentile rule, the floor(p·(N−1))+1 global rank,
    * the exact-rank equi-join. */
  val quantileCalibrate: String =
    "WITH b AS (SELECT doc_id, source, CAST(n_chars AS DOUBLE) AS s " +
      "FROM documents WHERE n_chars IS NOT NULL), " +
      "p AS (SELECT doc_id, source, s, CASE WHEN cnt = 1 THEN CAST(0 AS DOUBLE) " +
      "ELSE CAST(rn - 1 AS DOUBLE) / CAST(cnt - 1 AS DOUBLE) END AS pctl FROM (" +
      "SELECT doc_id, source, s, " +
      "ROW_NUMBER() OVER (PARTITION BY source ORDER BY s, doc_id) AS rn, " +
      "COUNT(*) OVER (PARTITION BY source) AS cnt FROM b)), " +
      "g AS (SELECT s AS gs, CAST(ROW_NUMBER() OVER (ORDER BY s, doc_id) AS BIGINT) AS rg FROM b), " +
      "tot AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM b) " +
      "SELECT p.doc_id, p.source, p.s AS score, p.pctl, g.gs AS calibrated " +
      "FROM p CROSS JOIN tot JOIN g " +
      "ON g.rg = CAST(FLOOR(p.pctl * CAST(n - 1 AS DOUBLE)) + 1 AS BIGINT)"

  /** Mirrors Curation.mutualInfo: exact cell/marginal counts, 1e-9
    * quantized ln, cell-ordered folds (SUM ORDER BY == the Spark
    * sorted-array fold; acc−x ≡ acc+(−x) in IEEE). */
  def mutualInfo(table: String, aCol: String, bCol: String): String = {
    def d(s: String) = s"CAST($s AS DOUBLE)"
    def qln(x: String) =
      s"FLOOR(LN($x) * CAST('1.0e9' AS DOUBLE)) / CAST('1.0e9' AS DOUBLE)"
    s"WITH cells AS (SELECT $aCol AS a, $bCol AS b, CAST(COUNT(*) AS BIGINT) AS nab " +
      s"FROM $table WHERE $aCol IS NOT NULL AND $bCol IS NOT NULL GROUP BY 1, 2), " +
      "ma AS (SELECT a, CAST(SUM(nab) AS BIGINT) AS na FROM cells GROUP BY a), " +
      "mb AS (SELECT b, CAST(SUM(nab) AS BIGINT) AS nb FROM cells GROUP BY b), " +
      "tot AS (SELECT CAST(COALESCE(SUM(nab), 0) AS BIGINT) AS n FROM cells), " +
      "m AS (SELECT COALESCE(SUM(" +
      s"(${d("nab")} / ${d("n")}) * (${qln(s"${d("nab")} * ${d("n")} / (${d("na")} * ${d("nb")})")}) " +
      "ORDER BY a, b), CAST(0 AS DOUBLE)) AS mi " +
      "FROM cells JOIN ma USING (a) JOIN mb USING (b) CROSS JOIN tot), " +
      "ha AS (SELECT COALESCE(SUM(" +
      s"-(${d("na")} / ${d("n")}) * (${qln(s"${d("na")} / ${d("n")}")}) " +
      "ORDER BY a), CAST(0 AS DOUBLE)) AS h_a FROM ma CROSS JOIN tot), " +
      "hb AS (SELECT COALESCE(SUM(" +
      s"-(${d("nb")} / ${d("n")}) * (${qln(s"${d("nb")} / ${d("n")}")}) " +
      "ORDER BY b), CAST(0 AS DOUBLE)) AS h_b FROM mb CROSS JOIN tot) " +
      "SELECT n AS n_rows, mi, h_a, h_b FROM tot CROSS JOIN m CROSS JOIN ha CROSS JOIN hb"
  }

  /** Mirrors Funnel.funnel over events: per-step conditional-min CTEs
    * (t_k = min time of step k strictly after t_{k-1}), microsecond
    * precision like the Spark side's `ts div 1000` event_time. */
  def funnel(steps: Seq[String], horizonUs: Option[Long] = None): String = {
    require(steps.nonEmpty)
    val stepCtes = steps.zipWithIndex.map { case (s, i) =>
      val k = i + 1
      if (i == 0)
        s"s1 AS (SELECT user_id, MIN(us) AS t1 FROM e WHERE event_type = ${q(s)} GROUP BY user_id)"
      else {
        // windowed form: re-join s1 for the horizon bound (k=2 already
        // has t1 via s1 itself)
        val t1Join = if (horizonUs.isDefined && k > 2) " JOIN s1 USING (user_id)" else ""
        val bound = horizonUs.map(h => s" AND us <= t1 + $h").getOrElse("")
        s"s$k AS (SELECT e.user_id, MIN(us) AS t$k FROM e JOIN s${k - 1} USING (user_id)$t1Join " +
          s"WHERE event_type = ${q(s)} AND us > t${k - 1}$bound GROUP BY e.user_id)"
      }
    }.mkString(", ")
    val joins = steps.indices.map(i => s"LEFT JOIN s${i + 1} USING (user_id)").mkString(" ")
    val tsSel = steps.indices.map(i => s"make_timestamp(t${i + 1}) AS t${i + 1}").mkString(", ")
    val completed = steps.indices.reverse.map(i =>
      s"WHEN t${i + 1} IS NOT NULL THEN ${i + 1}").mkString("CASE ", " ", " ELSE 0 END")
    "WITH e AS (SELECT user_id, event_type, epoch_ns(ts) // 1000 AS us FROM events WHERE ts IS NOT NULL), " +
      "u AS (SELECT DISTINCT user_id FROM e), " +
      s"$stepCtes " +
      s"SELECT u.user_id, $tsSel, CAST($completed AS BIGINT) AS steps_completed " +
      s"FROM u $joins"
  }

  /** Mirrors TextAnalysis.topTermsApprox in its EXACT regime (capacity >=
    * per-source vocabulary, so SpaceSaving never evicts): plain tf
    * ranking (cnt desc, term asc) with err = 0. */
  def topTermsApprox(k: Int): String =
    "WITH tok AS (SELECT source, UNNEST(regexp_extract_all(text, '\\S+')) AS term FROM documents), " +
      "tf AS (SELECT source, term, CAST(COUNT(*) AS BIGINT) AS cnt FROM tok GROUP BY source, term), " +
      "r AS (SELECT *, ROW_NUMBER() OVER (PARTITION BY source ORDER BY cnt DESC, term) AS rn FROM tf) " +
      s"SELECT source, term, cnt, CAST(0 AS BIGINT) AS err, CAST(rn AS INT) AS rank FROM r WHERE rn <= $k"

  /** Mirrors StreamingHist.windowedTopTerms in its EXACT regime
    * (capacity >= per-window distinct terms): per-tumbling-window exact
    * tf ranking (cnt desc, term asc), err = 0. Window key is the same
    * integer floor the batch branch uses. */
  def windowedTopTerms(durUs: Long, k: Int): String =
    "WITH e AS (SELECT epoch_ns(ts) // 1000 AS us, event_type AS term " +
      "FROM events WHERE ts IS NOT NULL AND event_type IS NOT NULL), " +
      // floor division (//), not %: pmod on the Spark side floors toward
      // -inf, so a pre-epoch timestamp must land in its floor window here
      // too (the sign-of-dividend % would shift it one window up)
      s"w AS (SELECT (us // $durUs) * $durUs AS ws, term FROM e), " +
      "tf AS (SELECT ws, term, CAST(COUNT(*) AS BIGINT) AS cnt FROM w GROUP BY ws, term), " +
      "r AS (SELECT *, ROW_NUMBER() OVER (PARTITION BY ws ORDER BY cnt DESC, term) AS rn FROM tf) " +
      s"SELECT make_timestamp(ws) AS window_start, make_timestamp(ws + $durUs) AS window_end, " +
      s"term, cnt, CAST(0 AS BIGINT) AS err, CAST(rn AS INT) AS rank FROM r WHERE rn <= $k"

  /** Mirrors Funnel.topTermsRbo over event types: the exact-regime
    * windowed ranking, rank-ordered term lists, epoch-shift pairing,
    * and the truncated-RBO weighted sum with the SAME driver-computed
    * (1−p)·p^(d−1)/d literals folded in fixed depth order. */
  def topTermsRbo(durUs: Long, k: Int, p: Double): String = {
    def d(x: Double) = s"CAST('${java.lang.Double.toString(x)}' AS DOUBLE)"
    val rboExpr = (1 to k).map { dep =>
      val w = (1.0 - p) * math.pow(p, dep - 1) / dep
      s"${d(w)} * CAST(len(list_intersect(c.t[1:$dep], pr.t[1:$dep])) AS DOUBLE)"
    }.mkString(" + ")
    "WITH e AS (SELECT epoch_ns(ts) // 1000 AS us, event_type AS term " +
      "FROM events WHERE ts IS NOT NULL AND event_type IS NOT NULL), " +
      s"w AS (SELECT (us // $durUs) * $durUs AS ws, term FROM e), " +
      "tf AS (SELECT ws, term, CAST(COUNT(*) AS BIGINT) AS cnt FROM w GROUP BY ws, term), " +
      "rk AS (SELECT ws, term, rn FROM (SELECT *, ROW_NUMBER() OVER (" +
      s"PARTITION BY ws ORDER BY cnt DESC, term) AS rn FROM tf) __r WHERE rn <= $k), " +
      "l AS (SELECT ws, list(term ORDER BY rn) AS t FROM rk GROUP BY ws) " +
      "SELECT make_timestamp(c.ws) AS window_start, " +
      "CAST(len(c.t) AS BIGINT) AS n_cur, CAST(len(pr.t) AS BIGINT) AS n_prev, " +
      s"$rboExpr AS rbo " +
      s"FROM l c JOIN l pr ON pr.ws = c.ws - $durUs"
  }

  /** Mirrors Funnel.topTermsChurn over event types: the
    * [[windowedTopTerms]] exact ranking, consecutive windows paired by
    * the epoch-shift key, shared = term equi-join count, |A∪B| = |A| +
    * |B| − shared, one division. Windows without an immediate
    * predecessor emit nothing. */
  def topTermsChurn(durUs: Long, k: Int): String = {
    def d(x: Double) = s"CAST('${java.lang.Double.toString(x)}' AS DOUBLE)"
    "WITH e AS (SELECT epoch_ns(ts) // 1000 AS us, event_type AS term " +
      "FROM events WHERE ts IS NOT NULL AND event_type IS NOT NULL), " +
      s"w AS (SELECT (us // $durUs) * $durUs AS ws, term FROM e), " +
      "tf AS (SELECT ws, term, CAST(COUNT(*) AS BIGINT) AS cnt FROM w GROUP BY ws, term), " +
      "rk AS (SELECT ws, term FROM (SELECT *, ROW_NUMBER() OVER (" +
      s"PARTITION BY ws ORDER BY cnt DESC, term) AS rn FROM tf) __r WHERE rn <= $k), " +
      "cn AS (SELECT ws, CAST(COUNT(*) AS BIGINT) AS n FROM rk GROUP BY ws), " +
      s"sh AS (SELECT a.ws, CAST(COUNT(*) AS BIGINT) AS s FROM rk a JOIN rk b " +
      s"ON b.ws = a.ws - $durUs AND b.term = a.term GROUP BY a.ws) " +
      "SELECT make_timestamp(c.ws) AS window_start, c.n AS n_terms, " +
      "COALESCE(sh.s, CAST(0 AS BIGINT)) AS n_shared, " +
      s"${d(1.0)} - CAST(COALESCE(sh.s, CAST(0 AS BIGINT)) AS DOUBLE) / " +
      "CAST(c.n + p.n - COALESCE(sh.s, CAST(0 AS BIGINT)) AS DOUBLE) AS churn " +
      s"FROM cn c JOIN cn p ON p.ws = c.ws - $durUs " +
      "LEFT JOIN sh ON sh.ws = c.ws"
  }

  /** Mirrors Funnel.activeUsers: distinct (user, day) activity, each
    * user-day exploded into its windowDays trailing windows, exact
    * distinct-user count per window-end day. Day floor matches the
    * retention oracle (`//` floor == Funnel.epochDay's exact floor on
    * every epoch, negative included). */
  def activeUsers(windowDays: Int): String =
    "WITH a AS (SELECT DISTINCT user_id, (epoch_ns(ts) // 1000) // 86400000000 AS d " +
      "FROM events WHERE ts IS NOT NULL), " +
      s"w AS (SELECT user_id, d + UNNEST(generate_series(0, ${windowDays - 1})) AS day FROM a) " +
      "SELECT day, CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_active " +
      "FROM w GROUP BY day"

  /** Mirrors Funnel.retention: integer-floor day indices, distinct
    * (user, day) activity, first day = cohort, distinct users per
    * (cohort, offset) cell. */
  val retention: String =
    "WITH a AS (SELECT DISTINCT user_id, (epoch_ns(ts) // 1000) // 86400000000 AS d " +
      "FROM events WHERE ts IS NOT NULL), " +
      "f AS (SELECT user_id, MIN(d) AS cohort_day FROM a GROUP BY user_id) " +
      "SELECT cohort_day, d - cohort_day AS offset_days, " +
      "CAST(COUNT(DISTINCT a.user_id) AS BIGINT) AS n_users " +
      "FROM a JOIN f USING (user_id) GROUP BY cohort_day, d - cohort_day"

  /** Mirrors Funnel.sessionPerplexity: the (time, id) total order, the
    * same transition/unigram model (transition denominator = outgoing
    * transitions, so rows sum to 1), 1e-9-quantized ln, per-user
    * position-ordered fold, one IEEE division. */
  val sessionPerplexity: String = {
    def d(x: String) = s"CAST($x AS DOUBLE)"
    def qln(num: String, den: String) =
      s"FLOOR(LN(${d(num)} / ${d(den)}) * CAST('1.0e9' AS DOUBLE)) / CAST('1.0e9' AS DOUBLE)"
    "WITH b AS (SELECT user_id, epoch_ns(ts) // 1000 AS us, event_id, event_type AS t " +
      "FROM events WHERE ts IS NOT NULL AND user_id IS NOT NULL " +
      "AND event_type IS NOT NULL AND event_id IS NOT NULL), " +
      "lg AS (SELECT user_id, us, event_id, t, " +
      "LAG(t) OVER (PARTITION BY user_id ORDER BY us, event_id) AS prev FROM b), " +
      "uni AS (SELECT t, CAST(COUNT(*) AS BIGINT) AS c1 FROM b GROUP BY t), " +
      "tt AS (SELECT CAST(COUNT(*) AS BIGINT) AS tt FROM b), " +
      "big AS (SELECT prev, t, CAST(COUNT(*) AS BIGINT) AS c2 FROM lg " +
      "WHERE prev IS NOT NULL GROUP BY prev, t), " +
      "ft AS (SELECT prev, CAST(SUM(c2) AS BIGINT) AS cf FROM big GROUP BY prev), " +
      "lp AS (" +
      s"SELECT user_id, us, event_id, ${qln("c1", "tt")} AS lp " +
      "FROM lg JOIN uni USING (t) CROSS JOIN tt WHERE prev IS NULL " +
      "UNION ALL " +
      s"SELECT l.user_id, l.us, l.event_id, ${qln("c2", "cf")} AS lp " +
      "FROM lg l JOIN big g ON g.prev = l.prev AND g.t = l.t " +
      "JOIN ft ON ft.prev = l.prev WHERE l.prev IS NOT NULL) " +
      "SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n_events, " +
      "SUM(lp ORDER BY us, event_id) / CAST(COUNT(*) AS DOUBLE) AS markov_score " +
      "FROM lp GROUP BY user_id"
  }

  /** Mirrors Funnel.rollingRetention: per-user (cohort, max offset),
    * generate_series explode, exact counts. */
  val rollingRetention: String =
    "WITH a AS (SELECT DISTINCT user_id, (epoch_ns(ts) // 1000) // 86400000000 AS d " +
      "FROM events WHERE ts IS NOT NULL), " +
      "s AS (SELECT user_id, MIN(d) AS cohort, MAX(d) - MIN(d) AS mo FROM a GROUP BY user_id), " +
      "e AS (SELECT cohort, UNNEST(generate_series(0, mo)) AS offset_days FROM s) " +
      "SELECT cohort AS cohort_day, CAST(offset_days AS BIGINT) AS offset_days, " +
      "CAST(COUNT(*) AS BIGINT) AS n_users FROM e GROUP BY 1, 2"

  /** Mirrors Funnel.retentionHalfLife: the retention triangle → rates →
    * per-cohort OLS of 1e-3-quantized ln(rate) on offset, slope → λ →
    * half-life, with ln 2 as the same literal double. Exact BIGINT
    * moments; identical IEEE op sequence. */
  val retentionHalfLife: String =
    s"WITH r AS ($retention), " +
      "b AS (SELECT cohort_day, n_users AS n0 FROM r WHERE offset_days = 0), " +
      "q AS (SELECT r.cohort_day, CAST(r.offset_days AS BIGINT) AS x, " +
      "CAST(FLOOR(LN(CAST(r.n_users AS DOUBLE) / CAST(b.n0 AS DOUBLE)) * " +
      "CAST('1000.0' AS DOUBLE)) AS BIGINT) AS y FROM r JOIN b USING (cohort_day)), " +
      "m AS (SELECT cohort_day, CAST(COUNT(*) AS BIGINT) AS n_points, " +
      "SUM(x) AS sx, SUM(y) AS sy, SUM(x * y) AS sxy, SUM(x * x) AS sxx " +
      "FROM q GROUP BY cohort_day), " +
      "s AS (SELECT cohort_day, n_points, " +
      "CASE WHEN n_points >= 2 AND (CAST(n_points AS DOUBLE) * CAST(sxx AS DOUBLE) - " +
      "CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)) > CAST(0 AS DOUBLE) " +
      "THEN -((CAST(n_points AS DOUBLE) * CAST(sxy AS DOUBLE) - " +
      "CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE)) / " +
      "(CAST(n_points AS DOUBLE) * CAST(sxx AS DOUBLE) - " +
      "CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))) / CAST('1000.0' AS DOUBLE) " +
      "ELSE NULL END AS decay_rate FROM m) " +
      "SELECT cohort_day, n_points, decay_rate, " +
      "CASE WHEN decay_rate > CAST(0 AS DOUBLE) " +
      "THEN CAST('0.6931471805599453' AS DOUBLE) / decay_rate " +
      "ELSE NULL END AS half_life_days FROM s"

  /** Mirrors TextAnalysis.topTerms: score = tf * N / df in double-FIRST
    * arithmetic (exactly representable longs, two correctly-rounded IEEE
    * ops — bit-identical doubles, no ln, no BIGINT overflow at corpus
    * scale), ties broken by term ascending. */
  def topTerms(k: Int = 5): String =
    "WITH tok AS (SELECT doc_id, source, UNNEST(regexp_extract_all(text, '\\S+')) AS term FROM documents), " +
      "n AS (SELECT COUNT(*) AS n_total FROM documents), " +
      "dfr AS (SELECT term, CAST(COUNT(*) AS BIGINT) AS df FROM (SELECT DISTINCT term, doc_id FROM tok) GROUP BY term), " +
      "tf AS (SELECT source, term, CAST(COUNT(*) AS BIGINT) AS tf FROM tok GROUP BY source, term), " +
      "sc AS (SELECT source, term, tf, df, CAST(tf AS DOUBLE) * CAST(n_total AS DOUBLE) / CAST(df AS DOUBLE) AS score " +
      "FROM tf JOIN dfr USING (term) CROSS JOIN n), " +
      "r AS (SELECT *, ROW_NUMBER() OVER (PARTITION BY source ORDER BY score DESC, term) AS rn FROM sc) " +
      s"SELECT source, term, tf, df, score, CAST(rn AS INT) AS rank FROM r WHERE rn <= $k"

  /** Mirrors Curation.curate: the composed curation chain re-expressed
    * from the already-mirrored pieces — token floor + sampling hash on the
    * base table, dedup keep over the FULL corpus, decontamination verdict
    * (computed over all docs here; the Spark side computes it on the
    * pre-filtered corpus, identical on the intersection). */
  def curate(minTokens: Long, ngram: Int, benchWhere: String, rate: Double,
      salt: String): String = {
    import graft.pipeline.Sampling.threshold
    s"WITH ch AS (SELECT doc_id, source FROM documents " +
      s"WHERE CAST(len(regexp_extract_all(text, '\\S+')) AS BIGINT) >= $minTokens " +
      s"AND ('0x' || substr(md5(CAST(doc_id AS VARCHAR) || ':' || source || ':' || ${q(salt)}), 1, 15))::BIGINT < ${threshold(rate)}), " +
      s"k AS (SELECT doc_id FROM ($dedupExact) WHERE keep), " +
      s"c AS (SELECT doc_id FROM (${decontaminate(ngram, benchWhere)}) WHERE NOT contaminated) " +
      "SELECT ch.doc_id, ch.source FROM ch JOIN k USING (doc_id) JOIN c USING (doc_id)"
  }

  /** Mirrors Sampling.sampleByWeight: the same hash60·Σw < k·w·2^60
    * integer keep predicate in HUGEINT (DuckDB's exact 128-bit lane for
    * Spark's DECIMAL(38,0)); weight = whitespace token count; NULL
    * weights drop the doc. */
  def sampleByWeight(k: Long, salt: String): String = {
    val two60 = "CAST(1152921504606846976 AS HUGEINT)" // 2^60, exact
    s"WITH w AS (SELECT doc_id, source, " +
      "CAST(len(regexp_extract_all(text, '\\S+')) AS BIGINT) AS w " +
      "FROM documents), " +
      "f AS (SELECT * FROM w WHERE w IS NOT NULL AND w >= 0), " +
      "t AS (SELECT CAST(SUM(w) AS HUGEINT) AS tot FROM f) " +
      "SELECT f.doc_id, f.source, f.w FROM f CROSS JOIN t " +
      s"WHERE CAST(('0x' || substr(md5(CAST(f.doc_id AS VARCHAR) || ':' || f.source || ':' || ${q(salt)}), 1, 15))::BIGINT AS HUGEINT) * tot " +
      s"< CAST($k AS HUGEINT) * CAST(f.w AS HUGEINT) * $two60"
  }

  /** Mirrors Sampling.sampleWeightedExactK: the q184 hash60 uniform,
    * the 1e12 floor-quantized u^(1/w) key, ORDER BY key DESC, doc_id
    * LIMIT k. */
  def sampleWeightedExactK(k: Int, salt: String): String = {
    val two60 = "CAST(1152921504606846976 AS DOUBLE)" // 2^60 exact
    s"WITH w AS (SELECT doc_id, source, " +
      "CAST(len(regexp_extract_all(text, '\\S+')) AS BIGINT) AS w " +
      "FROM documents), " +
      "f AS (SELECT * FROM w WHERE w IS NOT NULL AND w >= 0), " +
      "kq AS (SELECT doc_id, source, w, CAST(FLOOR(POWER(" +
      s"CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR) || ':' || source || ':' || ${q(salt)}), 1, 15))::BIGINT AS DOUBLE) / $two60, " +
      "CAST(1 AS DOUBLE) / CAST(w AS DOUBLE)) * CAST('1.0e12' AS DOUBLE)) AS BIGINT) AS kk FROM f) " +
      s"SELECT doc_id, source, w FROM kq ORDER BY kk DESC, doc_id LIMIT $k"
  }

  /** Mirrors Sampling.bootstrapCi over documents.n_chars: the same
    * per-(doc, replica) hash60 uniform, the identical Poisson(1) CDF
    * threshold literals, DECIMAL replica sums, ordered replica folds,
    * the fixed sd/CI tail. */
  def bootstrapCi(b: Int, salt: String): String = {
    def d(x: Double) = s"CAST('${java.lang.Double.toString(x)}' AS DOUBLE)"
    val e = math.exp(-1.0)
    val thr = Seq(e, e * 2.0, e * 2.5, e * (2.5 + 1.0 / 6.0))
    val two60 = "CAST(1152921504606846976 AS DOUBLE)"
    val u = "CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR) || ':' || " +
      s"source || ':' || CAST(rb AS VARCHAR) || ':' || ${q(salt)}), 1, 15))::BIGINT AS DOUBLE) / $two60"
    s"WITH base AS (SELECT doc_id, source, CAST(n_chars AS BIGINT) AS x " +
      "FROM documents WHERE n_chars IS NOT NULL), " +
      s"rep AS (SELECT doc_id, source, x, UNNEST(generate_series(1, $b)) AS rb FROM base), " +
      s"wts AS (SELECT rb, x, CASE WHEN $u < ${d(thr(0))} THEN 0 " +
      s"WHEN $u < ${d(thr(1))} THEN 1 WHEN $u < ${d(thr(2))} THEN 2 " +
      s"WHEN $u < ${d(thr(3))} THEN 3 ELSE 4 END AS w FROM rep), " +
      "pr AS (SELECT rb, CAST(SUM(CAST(w AS HUGEINT) * CAST(x AS HUGEINT)) AS DOUBLE) / " +
      "CAST(SUM(CAST(w AS HUGEINT)) AS DOUBLE) AS m FROM wts GROUP BY rb), " +
      "nt AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_docs, " +
      "CAST(SUM(CAST(x AS HUGEINT)) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE) AS point_mean FROM base), " +
      "f AS (SELECT SUM(m ORDER BY rb) AS sm, SUM(m * m ORDER BY rb) AS smm FROM pr) " +
      s"SELECT n_docs, point_mean, sm / ${d(b.toDouble)} AS boot_mean, " +
      s"SQRT(GREATEST(${d(0.0)}, (smm * ${d(b.toDouble)} - sm * sm) / " +
      s"(${d(b.toDouble)} * (${d(b.toDouble)} - ${d(1.0)})))) AS boot_sd, " +
      s"sm / ${d(b.toDouble)} - ${d(2.0)} * SQRT(GREATEST(${d(0.0)}, (smm * ${d(b.toDouble)} - sm * sm) / " +
      s"(${d(b.toDouble)} * (${d(b.toDouble)} - ${d(1.0)})))) AS ci_lo, " +
      s"sm / ${d(b.toDouble)} + ${d(2.0)} * SQRT(GREATEST(${d(0.0)}, (smm * ${d(b.toDouble)} - sm * sm) / " +
      s"(${d(b.toDouble)} * (${d(b.toDouble)} - ${d(1.0)})))) AS ci_hi " +
      "FROM f CROSS JOIN nt"
  }

  /** Mirrors Curation.curateExplain: every criterion's verdict per doc
    * over the FULL corpus, three-valued logic intact (NULL text ->
    * NULL token/quality flags; keep follows SQL AND). */
  def curateExplain(minBlend: String, minTokens: Long, ngram: Int,
      benchWhere: String, rate: Double, salt: String): String = {
    import graft.pipeline.Sampling.threshold
    s"WITH t AS (SELECT doc_id, source, " +
      s"CAST(len(regexp_extract_all(text, '\\S+')) AS BIGINT) >= $minTokens AS pass_tokens, " +
      s"('0x' || substr(md5(CAST(doc_id AS VARCHAR) || ':' || source || ':' || ${q(salt)}), 1, 15))::BIGINT < ${threshold(rate)} AS pass_sample " +
      "FROM documents), " +
      s"k AS (SELECT doc_id, keep AS is_canonical FROM ($dedupExact)), " +
      s"c AS (SELECT doc_id, NOT contaminated AS is_clean FROM (${decontaminate(ngram, benchWhere)})), " +
      s"qy AS (SELECT doc_id, blend >= $minBlend AS pass_quality FROM ($blendPercentiles) __bp) " +
      "SELECT t.doc_id, t.source, pass_tokens, pass_sample, is_canonical, is_clean, pass_quality, " +
      "pass_tokens AND pass_sample AND is_canonical AND is_clean AND pass_quality AS keep " +
      "FROM t JOIN k USING (doc_id) JOIN c USING (doc_id) JOIN qy USING (doc_id)"
  }

  /** Mirrors TextAnalysis.bm25: same tokenization, the 1e-9-quantized
    * LN idf (the q141 pow convention), the identical pinned association
    * order for every IEEE op, and SUM(c ORDER BY term) for the per-doc
    * fold (the sequential-sum contract). */
  def bm25(queryTerms: Seq[String], k1: Double, b: Double): String = {
    def d(x: Double) = s"CAST('${java.lang.Double.toString(x)}' AS DOUBLE)"
    val terms = queryTerms.map(q).mkString(", ")
    val idf = s"FLOOR(LN(${d(1.0)} + (CAST(nd AS DOUBLE) - CAST(df AS DOUBLE) + ${d(0.5)}) / " +
      s"(CAST(df AS DOUBLE) + ${d(0.5)})) * ${d(1.0e9)}) / ${d(1.0e9)}"
    val denom = s"CAST(tf AS DOUBLE) + ${d(k1)} * (${d(1.0 - b)} + ${d(b)} * " +
      "(CAST(len AS DOUBLE) / (CAST(tl AS DOUBLE) / CAST(nd AS DOUBLE))))"
    "WITH base AS (SELECT doc_id, CAST(len(regexp_extract_all(text, '\\S+')) AS BIGINT) AS len, " +
      "regexp_extract_all(text, '\\S+') AS toks FROM documents WHERE text IS NOT NULL), " +
      "st AS (SELECT CAST(COUNT(*) AS BIGINT) AS nd, CAST(SUM(len) AS BIGINT) AS tl FROM base), " +
      "tok AS (SELECT doc_id, len, UNNEST(toks) AS term FROM base), " +
      s"tf AS (SELECT doc_id, len, term, CAST(COUNT(*) AS BIGINT) AS tf FROM tok WHERE term IN ($terms) GROUP BY doc_id, len, term), " +
      "dfr AS (SELECT term, CAST(COUNT(*) AS BIGINT) AS df FROM tf GROUP BY term), " +
      s"c AS (SELECT tf.doc_id, tf.term, $idf * (CAST(tf AS DOUBLE) * ${d(k1 + 1.0)}) / ($denom) AS c " +
      "FROM tf JOIN dfr USING (term) CROSS JOIN st) " +
      "SELECT doc_id, SUM(c ORDER BY term) AS score FROM c GROUP BY doc_id"
  }

  /** Mirrors TextAnalysis.bm25TopK: the [[bm25]] scores (bit-identical
    * by construction) ranked desc with the doc_id tie-break. */
  def bm25TopK(queryTerms: Seq[String], k: Int, k1: Double,
      b: Double): String =
    s"SELECT doc_id, score, CAST(rank AS INT) AS rank FROM (" +
      s"SELECT doc_id, score, ROW_NUMBER() OVER (ORDER BY score DESC, doc_id) AS rank " +
      s"FROM (${bm25(queryTerms, k1, b)}) __b) __r WHERE rank <= $k"

  /** Mirrors TextAnalysis.rrfFusion: BOTH heads' scores from the same
    * tf CTEs ([[bm25]]'s exact arithmetic for head A, quantized
    * tf·ln(N/df) for head B), head ranks via ROW_NUMBER (score DESC,
    * doc_id) capped at kList, the two-term fused score in fixed order
    * (BM25 head first, absent head COALESCEs to 0.0), final rank ties
    * to doc_id. */
  def rrfFusion(queryTerms: Seq[String], k: Int, kList: Int,
      kRrf: Int, k1: Double, b: Double): String = {
    def d(x: Double) = s"CAST('${java.lang.Double.toString(x)}' AS DOUBLE)"
    val terms = queryTerms.map(q).mkString(", ")
    val idfA = s"FLOOR(LN(${d(1.0)} + (CAST(nd AS DOUBLE) - CAST(df AS DOUBLE) + ${d(0.5)}) / " +
      s"(CAST(df AS DOUBLE) + ${d(0.5)})) * ${d(1.0e9)}) / ${d(1.0e9)}"
    val denomA = s"CAST(tf AS DOUBLE) + ${d(k1)} * (${d(1.0 - b)} + ${d(b)} * " +
      "(CAST(len AS DOUBLE) / (CAST(tl AS DOUBLE) / CAST(nd AS DOUBLE))))"
    val idfB = s"FLOOR(LN(CAST(nd AS DOUBLE) / CAST(df AS DOUBLE)) * ${d(1.0e9)}) / ${d(1.0e9)}"
    val krd = s"CAST($kRrf AS DOUBLE)"
    "WITH base AS (SELECT doc_id, CAST(len(regexp_extract_all(text, '\\S+')) AS BIGINT) AS len, " +
      "regexp_extract_all(text, '\\S+') AS toks FROM documents WHERE text IS NOT NULL), " +
      "st AS (SELECT CAST(COUNT(*) AS BIGINT) AS nd, CAST(SUM(len) AS BIGINT) AS tl FROM base), " +
      "tok AS (SELECT doc_id, len, UNNEST(toks) AS term FROM base), " +
      s"tf AS (SELECT doc_id, len, term, CAST(COUNT(*) AS BIGINT) AS tf FROM tok WHERE term IN ($terms) GROUP BY doc_id, len, term), " +
      "dfr AS (SELECT term, CAST(COUNT(*) AS BIGINT) AS df FROM tf GROUP BY term), " +
      s"ca AS (SELECT tf.doc_id, tf.term, $idfA * (CAST(tf AS DOUBLE) * ${d(k1 + 1.0)}) / ($denomA) AS c " +
      "FROM tf JOIN dfr USING (term) CROSS JOIN st), " +
      "sa AS (SELECT doc_id, SUM(c ORDER BY term) AS score FROM ca GROUP BY doc_id), " +
      s"cb AS (SELECT tf.doc_id, tf.term, CAST(tf AS DOUBLE) * ($idfB) AS c " +
      "FROM tf JOIN dfr USING (term) CROSS JOIN st), " +
      "sb AS (SELECT doc_id, SUM(c ORDER BY term) AS score FROM cb GROUP BY doc_id), " +
      "ra AS (SELECT doc_id, rn FROM (SELECT doc_id, ROW_NUMBER() OVER (ORDER BY score DESC, doc_id) AS rn " +
      s"FROM sa) __ra WHERE rn <= $kList), " +
      "rb AS (SELECT doc_id, rn FROM (SELECT doc_id, ROW_NUMBER() OVER (ORDER BY score DESC, doc_id) AS rn " +
      s"FROM sb) __rb WHERE rn <= $kList), " +
      "f AS (SELECT COALESCE(ra.doc_id, rb.doc_id) AS doc_id, " +
      s"COALESCE(${d(1.0)} / ($krd + CAST(ra.rn AS DOUBLE)), ${d(0.0)}) + " +
      s"COALESCE(${d(1.0)} / ($krd + CAST(rb.rn AS DOUBLE)), ${d(0.0)}) AS rrf " +
      "FROM ra FULL OUTER JOIN rb ON ra.doc_id = rb.doc_id) " +
      "SELECT doc_id, rrf AS rrf_score, CAST(rank AS INT) AS rank FROM (" +
      "SELECT doc_id, rrf, ROW_NUMBER() OVER (ORDER BY rrf DESC, doc_id) AS rank FROM f) __f " +
      s"WHERE rank <= $k"
  }

  /** Mirrors Curation.curateBlend: the [[curate]] chain plus the
    * [[blendPercentiles]] relative-quality verdict as a fourth join —
    * blend ranks computed over the FULL corpus (like the dedup
    * election), `minBlend` rendered as the identical double literal on
    * both engines. */
  def curateBlend(minBlend: String, minTokens: Long, ngram: Int,
      benchWhere: String, rate: Double, salt: String): String = {
    import graft.pipeline.Sampling.threshold
    s"WITH ch AS (SELECT doc_id, source FROM documents " +
      s"WHERE CAST(len(regexp_extract_all(text, '\\S+')) AS BIGINT) >= $minTokens " +
      s"AND ('0x' || substr(md5(CAST(doc_id AS VARCHAR) || ':' || source || ':' || ${q(salt)}), 1, 15))::BIGINT < ${threshold(rate)}), " +
      s"k AS (SELECT doc_id FROM ($dedupExact) WHERE keep), " +
      s"c AS (SELECT doc_id FROM (${decontaminate(ngram, benchWhere)}) WHERE NOT contaminated), " +
      s"bl AS (SELECT doc_id, blend FROM ($blendPercentiles) __bp WHERE blend >= $minBlend) " +
      "SELECT ch.doc_id, ch.source, bl.blend FROM ch JOIN k USING (doc_id) " +
      "JOIN c USING (doc_id) JOIN bl USING (doc_id)"
  }

  /** Mirrors AsOf.asOfJoin on events (left = `leftType`, right =
    * `rightType`, key = user, <=): the same tagged-union running
    * last_value(IGNORE NULLS) — rights sort before lefts at equal ts,
    * ties among rights broken by event_id, so both engines pick the
    * identical row — carried as ONE struct so a NULL payload field can
    * never stitch values from different right rows. */
  def asOfJoin(leftType: String, rightType: String,
      tolUs: Option[Long] = None): String = {
    // ONE struct per right row (NULL for left rows), so last_value
    // (IGNORE NULLS) picks whole rows exactly like the Spark side's
    // single-struct match — per-column last_value would stitch fields
    // from DIFFERENT right rows whenever a payload field is NULL
    def field(f: String): String = s"struct_extract(mm, '$f')"
    def guard(e: String): String = tolUs.fold(e)(t =>
      s"CASE WHEN l_ts - ${field("ts")} <= $t THEN $e ELSE NULL END")

    "WITH u AS (" +
      "SELECT user_id AS k, epoch_ns(ts) // 1000 AS tsn, 1 AS side, CAST(0 AS BIGINT) AS oid, " +
      "CAST(NULL AS STRUCT(eid BIGINT, ts BIGINT, val DOUBLE)) AS r, " +
      "event_id, epoch_ns(ts) // 1000 AS l_ts " +
      s"FROM events WHERE event_type = ${q(leftType)} AND ts IS NOT NULL AND user_id IS NOT NULL " +
      "UNION ALL " +
      "SELECT user_id, epoch_ns(ts) // 1000, 0, event_id, " +
      "{'eid': event_id, 'ts': epoch_ns(ts) // 1000, 'val': value}, NULL, NULL " +
      s"FROM events WHERE event_type = ${q(rightType)} AND ts IS NOT NULL AND user_id IS NOT NULL), " +
      "m AS (SELECT *, last_value(r IGNORE NULLS) OVER w AS mm " +
      "FROM u WINDOW w AS (PARTITION BY k ORDER BY tsn, side, oid " +
      "ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)) " +
      s"SELECT event_id, k AS user_id, l_ts AS ts, ${guard(field("eid"))} AS ${rightType}_event_id, " +
      s"${guard(field("ts"))} AS ${rightType}_ts, ${guard(field("val"))} AS ${rightType}_value FROM m WHERE side = 1"
  }

  /** Mirrors AsOf.asOfJoinForward: the same tagged-union running window
    * with the traversal flipped (tsn DESC, side, oid DESC), so the
    * carried struct is the right row with the smallest (ts, id) at or
    * after each left row; tolerance guards matches further AHEAD than
    * the bound. */
  def asOfJoinForward(leftType: String, rightType: String,
      tolUs: Option[Long] = None): String = {
    def field(f: String): String = s"struct_extract(mm, '$f')"
    def guard(e: String): String = tolUs.fold(e)(t =>
      s"CASE WHEN ${field("ts")} - l_ts <= $t THEN $e ELSE NULL END")

    "WITH u AS (" +
      "SELECT user_id AS k, epoch_ns(ts) // 1000 AS tsn, 1 AS side, CAST(0 AS BIGINT) AS oid, " +
      "CAST(NULL AS STRUCT(eid BIGINT, ts BIGINT, val DOUBLE)) AS r, " +
      "event_id, epoch_ns(ts) // 1000 AS l_ts " +
      s"FROM events WHERE event_type = ${q(leftType)} AND ts IS NOT NULL AND user_id IS NOT NULL " +
      "UNION ALL " +
      "SELECT user_id, epoch_ns(ts) // 1000, 0, event_id, " +
      "{'eid': event_id, 'ts': epoch_ns(ts) // 1000, 'val': value}, NULL, NULL " +
      s"FROM events WHERE event_type = ${q(rightType)} AND ts IS NOT NULL AND user_id IS NOT NULL), " +
      "m AS (SELECT *, last_value(r IGNORE NULLS) OVER w AS mm " +
      "FROM u WINDOW w AS (PARTITION BY k ORDER BY tsn DESC, side, oid DESC " +
      "ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)) " +
      s"SELECT event_id, k AS user_id, l_ts AS ts, ${guard(field("eid"))} AS next_${rightType}_event_id, " +
      s"${guard(field("ts"))} AS next_${rightType}_ts, ${guard(field("val"))} AS next_${rightType}_value FROM m WHERE side = 1"
  }

  /** Mirrors Dedup.repeatedSpans: the same \\S+ tokens and 60-bit
    * sliding L-gram hash, total-occurrence count >= 2 marks repeated
    * positions, then the identical LAG-based interval union (new island
    * when p > prev + L) and per-island MIN/MAX span bounds. */
  def repeatedSpans(spanTokens: Int = 8): String = {
    val L = spanTokens
    "WITH toks AS (SELECT doc_id, regexp_extract_all(text, '\\S+') AS t FROM documents), " +
      "w AS (SELECT doc_id, p, ('0x' || substr(md5(" +
      s"array_to_string(t[CAST(p AS INT):CAST(p + ${L - 1} AS INT)], ' ')), 1, 15))::BIGINT AS h " +
      s"FROM (SELECT doc_id, t, UNNEST(generate_series(1, len(t) - ${L - 1})) AS p " +
      s"FROM toks WHERE len(t) >= $L)), " +
      "dup AS (SELECT h FROM (SELECT h, COUNT(*) AS c FROM w GROUP BY h) __c WHERE c >= 2), " +
      "dp AS (SELECT doc_id, p FROM w JOIN dup USING (h)), " +
      "br AS (SELECT doc_id, p, CASE WHEN p > LAG(p) OVER " +
      s"(PARTITION BY doc_id ORDER BY p) + $L THEN 1 ELSE 0 END AS b FROM dp), " +
      "gr AS (SELECT doc_id, p, SUM(b) OVER " +
      "(PARTITION BY doc_id ORDER BY p) AS g FROM br) " +
      "SELECT doc_id, CAST(MIN(p) AS BIGINT) AS span_start, " +
      s"CAST(MAX(p) + ${L - 1} AS BIGINT) AS span_end, " +
      s"CAST(MAX(p) - MIN(p) + $L AS BIGINT) AS span_len " +
      "FROM gr GROUP BY doc_id, g"
  }

  /** Mirrors Dedup.removeRepeatedSpans: the [[repeatedSpans]] window/
    * count CTEs give the repeated positions; a token at 1-based index i
    * is covered iff some repeated position p has p <= i <= p+L-1; kept
    * tokens rejoin in order and hash (the q86 kept-md5 convention);
    * every doc appears via the left join, clean docs keeping all. */
  def removeRepeatedSpans(spanTokens: Int = 8): String = {
    val L = spanTokens
    "WITH toks AS (SELECT doc_id, COALESCE(regexp_extract_all(text, '\\S+'), []) AS t FROM documents), " +
      "w AS (SELECT doc_id, p, ('0x' || substr(md5(" +
      s"array_to_string(t[CAST(p AS INT):CAST(p + ${L - 1} AS INT)], ' ')), 1, 15))::BIGINT AS h " +
      s"FROM (SELECT doc_id, t, UNNEST(generate_series(1, len(t) - ${L - 1})) AS p " +
      s"FROM toks WHERE len(t) >= $L)), " +
      "dup AS (SELECT h FROM (SELECT h, COUNT(*) AS c FROM w GROUP BY h) __c WHERE c >= 2), " +
      "dp AS (SELECT doc_id, p FROM w JOIN dup USING (h)), " +
      "pos AS (SELECT doc_id, UNNEST(generate_series(1, len(t))) AS i, t " +
      "FROM toks WHERE len(t) >= 1), " +
      "cov AS (SELECT DISTINCT pos.doc_id, pos.i FROM pos JOIN dp " +
      s"ON dp.doc_id = pos.doc_id AND dp.p <= pos.i AND pos.i <= dp.p + ${L - 1}), " +
      "kept AS (SELECT pos.doc_id, " +
      "COALESCE(string_agg(CASE WHEN cov.i IS NULL THEN pos.t[pos.i] END, ' ' ORDER BY pos.i) " +
      "FILTER (WHERE cov.i IS NULL), '') AS ktxt, " +
      "CAST(COUNT(*) FILTER (WHERE cov.i IS NOT NULL) AS BIGINT) AS n_rm " +
      "FROM pos LEFT JOIN cov ON cov.doc_id = pos.doc_id AND cov.i = pos.i " +
      "GROUP BY pos.doc_id) " +
      "SELECT toks.doc_id, CAST(len(toks.t) AS BIGINT) AS n_tokens, " +
      "COALESCE(kept.n_rm, 0) AS n_removed, " +
      "md5(COALESCE(kept.ktxt, '')) AS kept_md5 " +
      "FROM toks LEFT JOIN kept ON kept.doc_id = toks.doc_id"
  }

  /** Mirrors Dedup.removeRepeatedSpansKeepFirst: the same window/count
    * CTEs, but a repeated-gram occurrence marks coverage only when it is
    * NOT the gram's corpus-first occurrence — MIN(ROW(doc_id, p)), the
    * same lexicographic struct min Spark elects (the chunkDedup
    * cross-engine discipline); the apply tail is [[removeRepeatedSpans]]
    * verbatim. */
  def removeRepeatedSpansKeepFirst(spanTokens: Int = 8): String = {
    val L = spanTokens
    "WITH toks AS (SELECT doc_id, COALESCE(regexp_extract_all(text, '\\S+'), []) AS t FROM documents), " +
      "w AS (SELECT doc_id, p, ('0x' || substr(md5(" +
      s"array_to_string(t[CAST(p AS INT):CAST(p + ${L - 1} AS INT)], ' ')), 1, 15))::BIGINT AS h " +
      s"FROM (SELECT doc_id, t, UNNEST(generate_series(1, len(t) - ${L - 1})) AS p " +
      s"FROM toks WHERE len(t) >= $L)), " +
      "g AS (SELECT h, MIN(ROW(doc_id, p)) AS f FROM w GROUP BY h HAVING COUNT(*) >= 2), " +
      "dp AS (SELECT w.doc_id, w.p FROM w JOIN g USING (h) WHERE ROW(w.doc_id, w.p) <> g.f), " +
      "pos AS (SELECT doc_id, UNNEST(generate_series(1, len(t))) AS i, t " +
      "FROM toks WHERE len(t) >= 1), " +
      "cov AS (SELECT DISTINCT pos.doc_id, pos.i FROM pos JOIN dp " +
      s"ON dp.doc_id = pos.doc_id AND dp.p <= pos.i AND pos.i <= dp.p + ${L - 1}), " +
      "kept AS (SELECT pos.doc_id, " +
      "COALESCE(string_agg(CASE WHEN cov.i IS NULL THEN pos.t[pos.i] END, ' ' ORDER BY pos.i) " +
      "FILTER (WHERE cov.i IS NULL), '') AS ktxt, " +
      "CAST(COUNT(*) FILTER (WHERE cov.i IS NOT NULL) AS BIGINT) AS n_rm " +
      "FROM pos LEFT JOIN cov ON cov.doc_id = pos.doc_id AND cov.i = pos.i " +
      "GROUP BY pos.doc_id) " +
      "SELECT toks.doc_id, CAST(len(toks.t) AS BIGINT) AS n_tokens, " +
      "COALESCE(kept.n_rm, 0) AS n_removed, " +
      "md5(COALESCE(kept.ktxt, '')) AS kept_md5 " +
      "FROM toks LEFT JOIN kept ON kept.doc_id = toks.doc_id"
  }

  /** Mirrors Dedup.spanDedup: same \\S+ tokens, same max(1, ceil(n/w))
    * span count (token-less docs keep one empty span), 1-based inclusive
    * array slices, document frequency > maxDocs = boilerplate, md5 of the
    * surviving spans rejoined in span order. */
  def spanDedup(spanWords: Int = 8, maxDocs: Int = 1): String = {
    val w = spanWords
    "WITH d AS (SELECT doc_id, regexp_extract_all(text, '\\S+') AS t FROM documents), " +
      s"s AS (SELECT doc_id, i AS si, array_to_string(t[CAST(i * $w + 1 AS INT):CAST(i * $w + $w AS INT)], ' ') AS span " +
      s"FROM (SELECT doc_id, t, UNNEST(generate_series(0, CAST(greatest(ceil(len(t) / ${w}.0), 1.0) AS BIGINT) - 1)) AS i FROM d)), " +
      s"f AS (SELECT span FROM (SELECT span, COUNT(DISTINCT doc_id) AS df FROM s GROUP BY span) WHERE df > $maxDocs), " +
      "m AS (SELECT s.doc_id, s.si, s.span, (f.span IS NOT NULL) AS bp FROM s LEFT JOIN f ON f.span = s.span) " +
      "SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_spans, " +
      "CAST(SUM(CASE WHEN bp THEN 1 ELSE 0 END) AS BIGINT) AS n_removed, " +
      "md5(COALESCE(string_agg(span, ' ' ORDER BY si) FILTER (WHERE NOT bp), '')) AS kept_md5 " +
      "FROM m GROUP BY doc_id"
  }

  /** Mirrors Funnel.transitionMatrix: LAG over the total (us, event_id)
    * order per user, counts per (from, to), one IEEE division for the
    * row-conditional probability. */
  val transitionMatrix: String =
    "WITH o AS (SELECT user_id, epoch_ns(ts) // 1000 AS us, event_id, event_type FROM events " +
      "WHERE ts IS NOT NULL AND user_id IS NOT NULL AND event_type IS NOT NULL " +
      "AND event_id IS NOT NULL), " +
      "m AS (SELECT event_type AS to_type, LAG(event_type) OVER " +
      "(PARTITION BY user_id ORDER BY us, event_id) AS from_type FROM o), " +
      "c AS (SELECT from_type, to_type, CAST(COUNT(*) AS BIGINT) AS n " +
      "FROM m WHERE from_type IS NOT NULL GROUP BY from_type, to_type) " +
      "SELECT from_type, to_type, n, CAST(n AS DOUBLE) / " +
      "CAST(SUM(n) OVER (PARTITION BY from_type) AS DOUBLE) AS p FROM c"

  /** Mirrors TextAnalysis.vocabGrowth: identical '\S+' tokenization,
    * per-token first doc, checkpoint buckets by integer floor division
    * (doc ids non-negative), cumulative windows over the tiny bucket
    * relation. */
  def vocabGrowth(bucketSize: Long): String =
    "WITH tk AS (SELECT doc_id, UNNEST(regexp_extract_all(text, '\\S+')) AS tok " +
      "FROM documents WHERE text IS NOT NULL), " +
      "ft AS (SELECT tok, MIN(doc_id) AS fd FROM tk GROUP BY tok), " +
      s"nt AS (SELECT fd // $bucketSize AS bucket, CAST(COUNT(*) AS BIGINT) AS new_types FROM ft GROUP BY 1), " +
      s"vol AS (SELECT doc_id // $bucketSize AS bucket, CAST(COUNT(*) AS BIGINT) AS n_tokens FROM tk GROUP BY 1) " +
      "SELECT vol.bucket, vol.n_tokens, CAST(COALESCE(nt.new_types, 0) AS BIGINT) AS new_types, " +
      "CAST(SUM(vol.n_tokens) OVER (ORDER BY vol.bucket) AS BIGINT) AS cum_tokens, " +
      "CAST(SUM(COALESCE(nt.new_types, 0)) OVER (ORDER BY vol.bucket) AS BIGINT) AS cum_types " +
      "FROM vol LEFT JOIN nt USING (bucket)"

  /** Mirrors TextAnalysis.hashEmbed: identical tokenization, md5-hex
    * dimension/sign hashing (engine-identical), exact signed-count sum. */
  def hashEmbed(dim: Int): String =
    "WITH tk AS (SELECT doc_id, UNNEST(regexp_extract_all(text, '\\S+')) AS tok " +
      "FROM documents WHERE text IS NOT NULL), " +
      "h AS (SELECT doc_id, " +
      s"('0x' || substr(md5(tok), 1, 6))::BIGINT % $dim AS dim, " +
      "CASE WHEN ('0x' || substr(md5(tok), 7, 1))::BIGINT % 2 = 0 THEN 1 ELSE -1 END AS s " +
      "FROM tk) " +
      "SELECT doc_id, dim, CAST(SUM(s) AS BIGINT) AS v FROM h GROUP BY doc_id, dim"

  /** Mirrors Curation.dsirWeights: identical md5 bucket hashing, exact
    * integer bucket counts, Laplace +1 smoothing, 1e-9-floor-quantized
    * LN per bucket×side, and the per-doc in-bucket-order sequential sum
    * (SUM ... ORDER BY b — the dot-product oracles' contract). */
  def dsirWeights(targetWhere: String, buckets: Int): String =
    s"WITH tk AS (SELECT doc_id, ($targetWhere) AS t, " +
      s"('0x' || substr(md5(tok), 1, 6))::BIGINT % $buckets AS b " +
      "FROM (SELECT doc_id, source, UNNEST(regexp_extract_all(text, '\\S+')) AS tok " +
      "FROM documents WHERE text IS NOT NULL)), " +
      "tf AS (SELECT doc_id, t, b, COUNT(*) AS tf FROM tk GROUP BY 1, 2, 3), " +
      "bs AS (SELECT b, SUM(CASE WHEN t THEN tf ELSE 0 END) AS ct, " +
      "SUM(CASE WHEN NOT t THEN tf ELSE 0 END) AS cc FROM tf GROUP BY b), " +
      "tot AS (SELECT SUM(ct) AS tt, SUM(cc) AS tc FROM bs), " +
      "r AS (SELECT b, " +
      s"FLOOR(LN(CAST(ct + 1 AS DOUBLE) / CAST(tt + $buckets AS DOUBLE)) * 1e9) / 1e9 - " +
      s"FLOOR(LN(CAST(cc + 1 AS DOUBLE) / CAST(tc + $buckets AS DOUBLE)) * 1e9) / 1e9 AS r " +
      "FROM bs CROSS JOIN tot) " +
      "SELECT doc_id, SUM(CAST(tf.tf AS DOUBLE) * r.r ORDER BY tf.b) AS log_weight " +
      "FROM tf JOIN r ON r.b = tf.b WHERE NOT t GROUP BY doc_id"

  /** Mirrors Funnel.cohortValue: the retention triangle's floor-division
    * day math and cohort join, count + the Dec DECIMAL(38,14) value sum
    * rendered through the exactDbl boundary. */
  val cohortValue: String =
    "WITH a AS (SELECT user_id, (epoch_ns(ts) // 1000) // 86400000000 AS d, value " +
      "FROM events WHERE ts IS NOT NULL AND user_id IS NOT NULL), " +
      "f AS (SELECT user_id, MIN(d) AS cohort_day FROM a GROUP BY user_id) " +
      "SELECT f.cohort_day, a.d - f.cohort_day AS offset_days, " +
      "CAST(COUNT(*) AS BIGINT) AS n_events, " +
      Oracle.exactDbl("SUM(TRY_CAST(CAST(a.value AS VARCHAR) AS DECIMAL(38,14)))") +
      " AS value_sum FROM a JOIN f USING (user_id) GROUP BY 1, 2"

  /** The derived inter-event-gap relation (mirrors Funnel.interEventGaps
    * composed into the q168 histogram): LAG over the (us, event_id)
    * total order, whole-second gaps (non-negative, so `//` == `div`). */
  val interEventGapsSrc: String =
    "(SELECT event_type, CAST((us - pus) // 1000000 AS DOUBLE) AS gap_s FROM " +
      "(SELECT event_type, us, LAG(us) OVER (PARTITION BY user_id ORDER BY us, event_id) AS pus FROM " +
      "(SELECT user_id, event_id, event_type, epoch_ns(ts) // 1000 AS us FROM events " +
      "WHERE ts IS NOT NULL AND user_id IS NOT NULL AND event_type IS NOT NULL " +
      "AND event_id IS NOT NULL) o) m " +
      "WHERE pus IS NOT NULL) __gaps"

  /** The derived session-duration relation (mirrors
    * StreamingHist.sessionize's lag/cumsum identity composed into the
    * q173 histogram): active span MAX(us)-MIN(us) per session in whole
    * seconds (non-negative, `//` == `div`). Same NULL-ts-only filter
    * and us-ordered LAG as the q87 oracle. */
  def sessionDurationSrc(gapUs: Long): String =
    "(SELECT CAST((MAX(us) - MIN(us)) // 1000000 AS DOUBLE) AS dur_s FROM " +
      "(SELECT user_id, us, SUM(brk) OVER (PARTITION BY user_id ORDER BY us " +
      "ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid FROM " +
      "(SELECT user_id, us, CASE WHEN us - LAG(us) OVER (PARTITION BY user_id ORDER BY us) " +
      s"> $gapUs THEN 1 ELSE 0 END AS brk FROM " +
      "(SELECT user_id, epoch_ns(ts) // 1000 AS us FROM events WHERE ts IS NOT NULL) o) m) s " +
      "GROUP BY user_id, sid) __sd"

  /** Mirrors Funnel.suppressRapidFire: LAG over the (us, event_id) total
    * order within (user, type); kept = first-of-stream or gap strictly
    * greater than the threshold. */
  def suppressRapidFire(gapSec: Long): String =
    "SELECT event_id, user_id, event_type, us, value FROM " +
      "(SELECT event_id, user_id, event_type, us, value, " +
      "LAG(us) OVER (PARTITION BY user_id, event_type ORDER BY us, event_id) AS pus FROM " +
      "(SELECT event_id, user_id, event_type, epoch_ns(ts) // 1000 AS us, value FROM events " +
      "WHERE ts IS NOT NULL AND user_id IS NOT NULL AND event_type IS NOT NULL " +
      "AND event_id IS NOT NULL) o) m " +
      s"WHERE pus IS NULL OR us - pus > ${gapSec * 1000000L}"

  /** Mirrors TextAnalysis.corpusRollup: the langId argmax + whitespace
    * token count per doc, then ANSI GROUP BY ROLLUP (source, lang) with
    * exact BIGINT counts (DuckDB SUM(BIGINT) widens to HUGEINT — cast
    * back at the boundary). */
  def corpusRollup: String = {
    def occ(pat: String): String = {
      val esc = pat.replace("'", "''")
      s"CAST((length(p) - length(replace(p, '$esc', ''))) / ${pat.length} AS BIGINT)"
    }
    val scores = TextAnalysis.langMarkers
      .map { case (lang, pats) => pats.map(occ).mkString(" + ") + s" AS s_$lang" }
      .mkString(", ")
    val langs = TextAnalysis.langMarkers.map(_._1)
    val pred = langs.map { lang =>
      val isMax = langs.filter(_ != lang).map(o => s"s_$lang >= s_$o").mkString(" AND ")
      s"WHEN s_$lang > 0 AND $isMax THEN '$lang'"
    }.mkString("CASE ", " ", " ELSE 'und' END")
    "WITH s AS (SELECT source, " + scores +
      ", CAST(len(regexp_extract_all(text, '\\S+')) AS BIGINT) AS tok " +
      "FROM (SELECT source, text, ' ' || text || ' ' AS p FROM documents)), " +
      s"l AS (SELECT source, $pred AS lang, tok FROM s) " +
      "SELECT source, lang, CAST(COUNT(*) AS BIGINT) AS n_docs, " +
      "CAST(SUM(tok) AS BIGINT) AS n_tokens FROM l GROUP BY ROLLUP (source, lang)"
  }

  /** The derived tokenizer-fertility relation (mirrors
    * TextAnalysis.fertility composed into the q179 histogram): langId
    * argmax + both token counts per doc, one IEEE division of exact
    * longs, zero-word docs excluded. */
  def fertilitySrc: String = {
    def occ(pat: String): String = {
      val esc = pat.replace("'", "''")
      s"CAST((length(p) - length(replace(p, '$esc', ''))) / ${pat.length} AS BIGINT)"
    }
    val scores = TextAnalysis.langMarkers
      .map { case (lang, pats) => pats.map(occ).mkString(" + ") + s" AS s_$lang" }
      .mkString(", ")
    val langs = TextAnalysis.langMarkers.map(_._1)
    val pred = langs.map { lang =>
      val isMax = langs.filter(_ != lang).map(o => s"s_$lang >= s_$o").mkString(" AND ")
      s"WHEN s_$lang > 0 AND $isMax THEN '$lang'"
    }.mkString("CASE ", " ", " ELSE 'und' END")
    "(WITH s AS (SELECT source, " + scores +
      ", CAST(len(regexp_extract_all(text, '\\S+')) AS BIGINT) AS ws, " +
      "CAST(len(regexp_extract_all(text, '[A-Za-z]+|[0-9]|[^A-Za-z0-9\\s]')) AS BIGINT) AS bpe " +
      "FROM (SELECT source, text, ' ' || text || ' ' AS p FROM documents)) " +
      s"SELECT $pred AS lang, CAST(bpe AS DOUBLE) / CAST(ws AS DOUBLE) AS fertility " +
      "FROM s WHERE ws > 0) __ft"
  }

  /** Mirrors Curation.blendPercentiles over (n_chars, ws_tokens): the
    * same (value, doc_id) row_number ranks, the same left-associated
    * (p_chars + p_tokens) / 2 IEEE blend. */
  /** Mirrors Curation.curriculumMix over the n_chars score: the
    * [[blendPercentiles]] per-source rank percentile, decile =
    * LEAST(FLOOR(pctl·10), 9), and the ten driver-computed integer
    * thresholds as a CASE — the identical hash60 keep rule. */
  def curriculumMix(alpha: Double, salt: String): String = {
    import graft.pipeline.Sampling.threshold
    def d(x: Double) = s"CAST('${java.lang.Double.toString(x)}' AS DOUBLE)"
    val cases = (0 to 9).map(dd =>
      s"WHEN $dd THEN ${threshold(math.pow((dd + 1) / 10.0, alpha))}")
      .mkString(" ")
    "WITH b AS (SELECT doc_id, source, CAST(n_chars AS DOUBLE) AS sc FROM documents), " +
      "n AS (SELECT source, CAST(COUNT(*) AS BIGINT) AS n FROM b GROUP BY source), " +
      "r AS (SELECT doc_id, source, " +
      "ROW_NUMBER() OVER (PARTITION BY source ORDER BY sc, doc_id) - 1 AS rc FROM b), " +
      "p AS (SELECT r.doc_id, r.source, " +
      "CASE WHEN n.n = 1 THEN CAST(0 AS DOUBLE) ELSE CAST(rc AS DOUBLE) / CAST(n.n - 1 AS DOUBLE) END AS pctl " +
      "FROM r JOIN n USING (source)), " +
      s"dd AS (SELECT doc_id, source, LEAST(CAST(FLOOR(pctl * ${d(10.0)}) AS INT), 9) AS decile FROM p) " +
      "SELECT doc_id, source, decile FROM dd " +
      "WHERE ('0x' || substr(md5(CAST(doc_id AS VARCHAR) || ':' || source || ':' || " +
      s"${q(salt)}), 1, 15))::BIGINT < CASE decile $cases ELSE 0 END"
  }

  val blendPercentiles: String =
    "WITH b AS (SELECT doc_id, source, CAST(n_chars AS DOUBLE) AS sc, " +
      "CAST(len(regexp_extract_all(text, '\\S+')) AS DOUBLE) AS st FROM documents), " +
      "n AS (SELECT source, CAST(COUNT(*) AS BIGINT) AS n FROM b GROUP BY source), " +
      "r AS (SELECT doc_id, source, " +
      "ROW_NUMBER() OVER (PARTITION BY source ORDER BY sc, doc_id) - 1 AS rc, " +
      "ROW_NUMBER() OVER (PARTITION BY source ORDER BY st, doc_id) - 1 AS rt FROM b), " +
      "p AS (SELECT r.doc_id, r.source, " +
      "CASE WHEN n.n = 1 THEN CAST(0 AS DOUBLE) ELSE CAST(rc AS DOUBLE) / CAST(n.n - 1 AS DOUBLE) END AS pctl_chars, " +
      "CASE WHEN n.n = 1 THEN CAST(0 AS DOUBLE) ELSE CAST(rt AS DOUBLE) / CAST(n.n - 1 AS DOUBLE) END AS pctl_tokens " +
      "FROM r JOIN n USING (source)) " +
      "SELECT doc_id, source, pctl_chars, pctl_tokens, " +
      "(pctl_chars + pctl_tokens) / CAST(2 AS DOUBLE) AS blend FROM p"

  /** Mirrors Similarity.normalizeL2: the q150 per-element rendering with
    * the dot-product oracles' ordered-sum norm (SQRT(SUM(v*v ORDER BY
    * i))); zero-norm components NULL. */
  val normalizeL2: String =
    "WITH el AS (SELECT vec_id, CAST(i AS INT) AS i, " +
      "CAST(embedding[CAST(i AS INT)] AS DOUBLE) AS v " +
      "FROM (SELECT vec_id, embedding, UNNEST(generate_series(1, len(embedding))) AS i FROM embeddings)), " +
      "n AS (SELECT vec_id, SQRT(SUM(v * v ORDER BY i)) AS nrm FROM el GROUP BY vec_id) " +
      "SELECT el.vec_id, el.i, n.nrm, " +
      "CASE WHEN n.nrm = CAST(0 AS DOUBLE) THEN NULL ELSE el.v / n.nrm END AS x " +
      "FROM el JOIN n USING (vec_id)"

  /** Mirrors StreamingHist.windowedDistinct's batch form: floor-division
    * tumbling window (pmod == `//` on any sign), exact COUNT(DISTINCT). */
  def windowedDistinct(durUs: Long): String =
    s"SELECT make_timestamp(ws) AS window_start, " +
      "CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_keys FROM " +
      s"(SELECT ((epoch_ns(ts) // 1000) // $durUs) * $durUs AS ws, user_id FROM events " +
      "WHERE ts IS NOT NULL AND user_id IS NOT NULL) w GROUP BY ws"

  /** Mirrors StreamingHist.windowedNovelty's batch form: exact
    * min-window per key (floor-division tumbling window), count per
    * first-window. */
  def windowedNovelty(durUs: Long): String =
    "SELECT make_timestamp(fw) AS window_start, " +
      "CAST(COUNT(*) AS BIGINT) AS novel_keys FROM " +
      s"(SELECT user_id, MIN(((epoch_ns(ts) // 1000) // $durUs) * $durUs) AS fw " +
      "FROM events WHERE ts IS NOT NULL AND user_id IS NOT NULL " +
      "GROUP BY user_id) f GROUP BY fw"

  /** Mirrors StreamingHist.windowedNoveltyBounded's batch contract:
    * (key, ts) ties collapse first (DISTINCT), an occurrence is novel
    * iff it has no same-key predecessor within `horUs`, then the q322
    * windowed count. */
  def windowedNoveltyBounded(durUs: Long, horUs: Long): String =
    "SELECT make_timestamp(ws) AS window_start, " +
      "CAST(COUNT(*) AS BIGINT) AS novel_keys FROM " +
      s"(SELECT ((us // $durUs) * $durUs) AS ws FROM " +
      "(SELECT user_id, us, " +
      "LAG(us) OVER (PARTITION BY user_id ORDER BY us) AS prev FROM " +
      "(SELECT DISTINCT user_id, (epoch_ns(ts) // 1000) AS us FROM events " +
      "WHERE ts IS NOT NULL AND user_id IS NOT NULL) o) l " +
      s"WHERE prev IS NULL OR us - prev > $horUs) n GROUP BY ws"

  /** Mirrors TextAnalysis.lmScore: same tokenization, the 1e-9-quantized
    * LN of the corpus-trained unigram probability, SUM(c ORDER BY term)
    * for the per-doc fold (the sequential-sum contract), and the mean
    * as one IEEE division. */
  def lmScore: String = {
    def d(x: Double) = s"CAST('${java.lang.Double.toString(x)}' AS DOUBLE)"
    "WITH tok AS (SELECT doc_id, UNNEST(regexp_extract_all(text, '\\S+')) AS term " +
      "FROM documents WHERE text IS NOT NULL), " +
      "v AS (SELECT term, CAST(COUNT(*) AS BIGINT) AS cnt FROM tok GROUP BY term), " +
      "tt AS (SELECT CAST(COUNT(*) AS BIGINT) AS tt FROM tok), " +
      "tf AS (SELECT doc_id, term, CAST(COUNT(*) AS BIGINT) AS tf FROM tok GROUP BY doc_id, term), " +
      s"c AS (SELECT doc_id, term, tf, CAST(tf AS DOUBLE) * (FLOOR(LN(CAST(cnt AS DOUBLE) / CAST(tt AS DOUBLE)) * ${d(1.0e9)}) / ${d(1.0e9)}) AS c " +
      "FROM tf JOIN v USING (term) CROSS JOIN tt) " +
      "SELECT doc_id, CAST(SUM(tf) AS BIGINT) AS n_tokens, " +
      "SUM(c ORDER BY term) / CAST(CAST(SUM(tf) AS BIGINT) AS DOUBLE) AS lm_score " +
      "FROM c GROUP BY doc_id"
  }

  /** Mirrors TextAnalysis.chunkDocs: identical tokenization, the same
    * ceil-division last-start rule (operands positive, so `//` ==
    * Spark's `div`), 1-based inclusive list_slice == Spark's
    * (start, length) slice, single-space re-join. */
  def chunkDocs(window: Int, stride: Int): String =
    "WITH base AS (SELECT doc_id, regexp_extract_all(text, '\\S+') AS t, " +
      "CAST(len(regexp_extract_all(text, '\\S+')) AS BIGINT) AS len " +
      "FROM documents WHERE text IS NOT NULL), " +
      "b2 AS (SELECT doc_id, t, len, " +
      s"UNNEST(generate_series(0, CASE WHEN len <= $window THEN 0 ELSE ((len - $window + $stride - 1) // $stride) * $stride END, $stride)) AS s " +
      "FROM base WHERE len > 0) " +
      s"SELECT doc_id, CAST(s // $stride AS INT) AS chunk_id, CAST(s AS BIGINT) AS start_tok, " +
      s"CAST(LEAST($window, len - s) AS BIGINT) AS n_tok, " +
      s"array_to_string(list_slice(t, s + 1, LEAST(s + $window, len)), ' ') AS chunk_text " +
      "FROM b2"

  /** Mirrors TextAnalysis.mixedLang: the [[chunkDocs]] non-overlapping
    * chunk CTE feeding the [[langId]] marker argmax per chunk, per-doc
    * language vote counts, majority via ORDER BY c DESC, lang (the
    * struct-min mirror), one IEEE division. */
  def mixedLang(window: Int): String = {
    def occ(pat: String): String = {
      val esc = pat.replace("'", "''")
      s"CAST((length(p) - length(replace(p, '$esc', ''))) / ${pat.length} AS BIGINT)"
    }
    val scores = TextAnalysis.langMarkers
      .map { case (lang, pats) => pats.map(occ).mkString(" + ") + s" AS s_$lang" }
      .mkString(", ")
    val langs = TextAnalysis.langMarkers.map(_._1)
    val pred = langs.map { lang =>
      val isMax = langs.filter(_ != lang).map(o => s"s_$lang >= s_$o").mkString(" AND ")
      s"WHEN s_$lang > 0 AND $isMax THEN '$lang'"
    }.mkString("CASE ", " ", " ELSE 'und' END")
    "WITH base AS (SELECT doc_id, regexp_extract_all(text, '\\S+') AS t, " +
      "CAST(len(regexp_extract_all(text, '\\S+')) AS BIGINT) AS len " +
      "FROM documents WHERE text IS NOT NULL), " +
      "b2 AS (SELECT doc_id, t, len, " +
      s"UNNEST(generate_series(0, CASE WHEN len <= $window THEN 0 ELSE ((len - $window + $window - 1) // $window) * $window END, $window)) AS s " +
      "FROM base WHERE len > 0), " +
      "ch AS (SELECT doc_id, ' ' || " +
      s"array_to_string(list_slice(t, s + 1, LEAST(s + $window, len)), ' ') || ' ' AS p " +
      "FROM b2), " +
      s"sc AS (SELECT doc_id, $scores FROM ch), " +
      s"l AS (SELECT doc_id, $pred AS lng FROM sc), " +
      "bl AS (SELECT doc_id, lng, CAST(COUNT(*) AS BIGINT) AS c FROM l GROUP BY doc_id, lng), " +
      "m AS (SELECT doc_id, CAST(SUM(c) AS BIGINT) AS n_chunks, " +
      "CAST(COUNT(*) AS BIGINT) AS n_langs FROM bl GROUP BY doc_id), " +
      "b AS (SELECT doc_id, lng AS majority_lang, c AS mc FROM bl " +
      "QUALIFY ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY c DESC, lng) = 1) " +
      "SELECT m.doc_id, m.n_chunks, m.n_langs, b.majority_lang, " +
      "CAST(b.mc AS DOUBLE) / CAST(m.n_chunks AS DOUBLE) AS majority_frac, " +
      "m.n_langs > 1 AS mixed " +
      "FROM m JOIN b USING (doc_id)"
  }

  /** Mirrors TextAnalysis.tfidfTopK: the 1e-9-quantized LN(N/df) idf,
    * tf·idf as one IEEE multiply on bit-identical operands, rank ties
    * by term ascending. */
  def tfidfTopK(k: Int): String = {
    def d(x: Double) = s"CAST('${java.lang.Double.toString(x)}' AS DOUBLE)"
    "WITH tok AS (SELECT doc_id, UNNEST(regexp_extract_all(text, '\\S+')) AS term " +
      "FROM documents WHERE text IS NOT NULL), " +
      "n AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM documents WHERE text IS NOT NULL), " +
      "tf AS (SELECT doc_id, term, CAST(COUNT(*) AS BIGINT) AS tf FROM tok GROUP BY doc_id, term), " +
      "dfr AS (SELECT term, CAST(COUNT(*) AS BIGINT) AS df FROM tf GROUP BY term), " +
      s"sc AS (SELECT doc_id, term, tf, df, CAST(tf AS DOUBLE) * (FLOOR(LN(CAST(n AS DOUBLE) / CAST(df AS DOUBLE)) * ${d(1.0e9)}) / ${d(1.0e9)}) AS score " +
      "FROM tf JOIN dfr USING (term) CROSS JOIN n) " +
      "SELECT doc_id, term, tf, df, score, CAST(rank AS INT) AS rank FROM (" +
      "SELECT doc_id, term, tf, df, score, " +
      "ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY score DESC, term) AS rank FROM sc) r " +
      s"WHERE rank <= $k"
  }

  /** Mirrors Similarity.embedCovariance: 1e-4 floor-quantized longs,
    * in-row upper-triangle pair terms (1-based list slice), exact
    * HUGEINT sums cast through DOUBLE in the same IEEE op order. */
  val embedCovariance: String =
    "WITH q AS (SELECT list_transform(embedding, " +
      "v -> CAST(FLOOR(CAST(v AS DOUBLE) * CAST('10000.0' AS DOUBLE)) AS BIGINT)) AS qa " +
      "FROM embeddings WHERE embedding IS NOT NULL), " +
      "x AS (SELECT CAST(generate_subscripts(qa, 1) - 1 AS INT) AS i, " +
      "UNNEST(qa) AS qi, qa FROM q), " +
      "p AS (SELECT i, qi, CAST(generate_subscripts(qa[i+1:], 1) - 1 AS INT) AS o, " +
      "UNNEST(qa[i+1:]) AS qj FROM x), " +
      "c AS (SELECT i AS dim_i, i + o AS dim_j, CAST(COUNT(*) AS BIGINT) AS n_vecs, " +
      "SUM(qi * qj) AS sxy FROM p GROUP BY 1, 2), " +
      "m AS (SELECT i, SUM(qi) AS sx FROM x GROUP BY i) " +
      "SELECT c.dim_i, c.dim_j, c.n_vecs, " +
      "(CAST(c.sxy AS DOUBLE) / CAST(c.n_vecs AS DOUBLE) - " +
      "(CAST(mi.sx AS DOUBLE) / CAST(c.n_vecs AS DOUBLE)) * " +
      "(CAST(mj.sx AS DOUBLE) / CAST(c.n_vecs AS DOUBLE))) / CAST('1.0e8' AS DOUBLE) AS cov " +
      "FROM c JOIN m mi ON mi.i = c.dim_i JOIN m mj ON mj.i = c.dim_j"

  /** Mirrors Similarity.pcaPower: the q246 covariance CTE, `iters`
    * unrolled quantized power-iteration rounds (ordered j-fold
    * matrix·vector, order-free L∞ MAX, the same floor(y/m·1e6)/1e6
    * normalize), trace folded in dim order. */
  def pcaPower(iters: Int): String = {
    val six = "CAST('1000000.0' AS DOUBLE)"
    // MATERIALIZED everywhere: DuckDB inlines plain CTEs, and a chain
    // of k rounds each referencing the previous would expand into a
    // 2^k-leaf plan re-opening the parquet per leaf
    val rounds = (1 to iters).map { k =>
      val prev = if (k == 1) "x0" else s"x${k - 1}"
      s"y$k AS MATERIALIZED (SELECT a.i AS dim, SUM(a.cov * p.v ORDER BY a.j) AS y " +
        s"FROM a JOIN $prev p ON p.dim = a.j GROUP BY a.i), " +
        s"m$k AS MATERIALIZED (SELECT MAX(ABS(y)) AS m FROM y$k), " +
        s"x$k AS MATERIALIZED (SELECT dim, CASE WHEN m > CAST(0 AS DOUBLE) " +
        s"THEN FLOOR(y / m * $six) / $six ELSE CAST(0 AS DOUBLE) END AS v " +
        s"FROM y$k CROSS JOIN m$k)"
    }.mkString(", ")
    s"WITH c AS MATERIALIZED ($embedCovariance), " +
      "a AS MATERIALIZED (SELECT dim_i AS i, dim_j AS j, cov FROM c " +
      "UNION ALL SELECT dim_j, dim_i, cov FROM c WHERE dim_i <> dim_j), " +
      "x0 AS MATERIALIZED (SELECT DISTINCT dim_i AS dim, CAST(1 AS DOUBLE) AS v FROM c), " +
      s"$rounds, " +
      "t AS (SELECT SUM(cov ORDER BY dim_i) AS tr FROM c WHERE dim_i = dim_j) " +
      s"SELECT x$iters.dim, x$iters.v AS loading, m$iters.m AS eigenvalue, " +
      "CASE WHEN tr > CAST(0 AS DOUBLE) THEN m / tr ELSE NULL END AS explained_share " +
      s"FROM x$iters CROSS JOIN m$iters CROSS JOIN t"
  }

  /** One unrolled quantized power-iteration chain over matrix CTE
    * `mat` with CTE-name prefix `p` (shared by [[pcaPower]] /
    * [[pcaDeflate]]). */
  private def powerRounds(mat: String, p: String, iters: Int): String = {
    val six = "CAST('1000000.0' AS DOUBLE)"
    (1 to iters).map { k =>
      val prev = if (k == 1) s"${p}x0" else s"${p}x${k - 1}"
      s"${p}y$k AS MATERIALIZED (SELECT a.i AS dim, SUM(a.cov * q.v ORDER BY a.j) AS y " +
        s"FROM $mat a JOIN $prev q ON q.dim = a.j GROUP BY a.i), " +
        s"${p}m$k AS MATERIALIZED (SELECT MAX(ABS(y)) AS m FROM ${p}y$k), " +
        s"${p}x$k AS MATERIALIZED (SELECT dim, CASE WHEN m > CAST(0 AS DOUBLE) " +
        s"THEN FLOOR(y / m * $six) / $six ELSE CAST(0 AS DOUBLE) END AS v " +
        s"FROM ${p}y$k CROSS JOIN ${p}m$k)"
    }.mkString(", ")
  }

  /** Mirrors Similarity.pcaDeflate: the pcaPower chain, an L2-normalized
    * u (ordered sum of squares, correctly-rounded SQRT), the deflated
    * matrix cov − (λ·uᵢ)·uⱼ, and a second identical chain. */
  def pcaDeflate(iters: Int): String =
    s"WITH c AS MATERIALIZED ($embedCovariance), " +
      "a AS MATERIALIZED (SELECT dim_i AS i, dim_j AS j, cov FROM c " +
      "UNION ALL SELECT dim_j, dim_i, cov FROM c WHERE dim_i <> dim_j), " +
      "x0 AS MATERIALIZED (SELECT DISTINCT dim_i AS dim, CAST(1 AS DOUBLE) AS v FROM c), " +
      s"${powerRounds("a", "", iters)}, " +
      s"nrm AS MATERIALIZED (SELECT SQRT(SUM(v * v ORDER BY dim)) AS s FROM x$iters), " +
      s"u AS MATERIALIZED (SELECT dim, CASE WHEN s > CAST(0 AS DOUBLE) THEN v / s " +
      s"ELSE CAST(0 AS DOUBLE) END AS v FROM x$iters CROSS JOIN nrm), " +
      "a2 AS MATERIALIZED (SELECT a.i, a.j, " +
      s"a.cov - (m$iters.m * ui.v) * uj.v AS cov FROM a " +
      s"JOIN u ui ON ui.dim = a.i JOIN u uj ON uj.dim = a.j CROSS JOIN m$iters), " +
      "bx0 AS MATERIALIZED (SELECT DISTINCT dim_i AS dim, CAST(1 AS DOUBLE) AS v FROM c), " +
      s"${powerRounds("a2", "b", iters)}, " +
      "t AS (SELECT SUM(cov ORDER BY dim_i) AS tr FROM c WHERE dim_i = dim_j) " +
      s"SELECT CAST(0 AS INT) AS component, x$iters.dim, x$iters.v AS loading, " +
      s"m$iters.m AS eigenvalue, CASE WHEN tr > CAST(0 AS DOUBLE) " +
      s"THEN m$iters.m / tr ELSE NULL END AS explained_share " +
      s"FROM x$iters CROSS JOIN m$iters CROSS JOIN t " +
      "UNION ALL " +
      s"SELECT CAST(1 AS INT), bx$iters.dim, bx$iters.v, bm$iters.m, " +
      s"CASE WHEN tr > CAST(0 AS DOUBLE) THEN bm$iters.m / tr ELSE NULL END " +
      s"FROM bx$iters CROSS JOIN bm$iters CROSS JOIN t"

  /** Mirrors Similarity.pcaProject2d: the pcaDeflate CTE pivoted into
    * two loading relations, ordered j-fold dots. */
  def pcaProject2d(iters: Int): String =
    s"WITH comp AS MATERIALIZED (${pcaDeflate(iters)}), " +
      "e AS (SELECT vec_id, CAST(generate_subscripts(embedding, 1) - 1 AS INT) AS j, " +
      "CAST(UNNEST(embedding) AS DOUBLE) AS v FROM embeddings WHERE embedding IS NOT NULL) " +
      "SELECT e.vec_id, " +
      "SUM(e.v * c0.loading ORDER BY e.j) AS proj0, " +
      "SUM(e.v * c1.loading ORDER BY e.j) AS proj1 " +
      "FROM e JOIN (SELECT dim, loading FROM comp WHERE component = 0) c0 ON c0.dim = e.j " +
      "JOIN (SELECT dim, loading FROM comp WHERE component = 1) c1 ON c1.dim = e.j " +
      "GROUP BY e.vec_id"

  /** Mirrors Similarity.removeTopComponent: the pcaPower CTE, the
    * deflation-normalized u, ordered projection folds, one
    * multiply+subtract per coordinate. */
  def removeTopComponent(iters: Int): String =
    s"WITH comp AS MATERIALIZED (${pcaPower(iters)}), " +
      "nrm AS (SELECT SQRT(SUM(loading * loading ORDER BY dim)) AS s FROM comp), " +
      "u AS MATERIALIZED (SELECT dim, CASE WHEN s > CAST(0 AS DOUBLE) " +
      "THEN loading / s ELSE CAST(0 AS DOUBLE) END AS v FROM comp CROSS JOIN nrm), " +
      "e AS (SELECT vec_id, CAST(generate_subscripts(embedding, 1) - 1 AS INT) AS j, " +
      "CAST(UNNEST(embedding) AS DOUBLE) AS v FROM embeddings WHERE embedding IS NOT NULL), " +
      "p AS MATERIALIZED (SELECT e.vec_id, SUM(e.v * u.v ORDER BY e.j) AS projection " +
      "FROM e JOIN u ON u.dim = e.j GROUP BY e.vec_id) " +
      "SELECT e.vec_id, CAST(e.j + 1 AS INT) AS i, p.projection, " +
      "e.v - p.projection * u.v AS x " +
      "FROM e JOIN u ON u.dim = e.j JOIN p ON p.vec_id = e.vec_id"

  /** Mirrors Similarity.centerEmbeddings: per-dim 1e-9-floor-quantized
    * exact long sums cast through DOUBLE in the pinned /1e9/n sequence,
    * one subtract per coordinate. */
  val centerEmbeddings: String =
    "WITH e AS (SELECT vec_id, CAST(generate_subscripts(embedding, 1) - 1 AS INT) AS i, " +
      "CAST(UNNEST(embedding) AS DOUBLE) AS v FROM embeddings WHERE embedding IS NOT NULL), " +
      "m AS (SELECT i, CAST(SUM(CAST(FLOOR(v * CAST('1.0E9' AS DOUBLE)) AS BIGINT)) AS DOUBLE) " +
      "/ CAST('1.0E9' AS DOUBLE) / CAST(COUNT(*) AS DOUBLE) AS m " +
      "FROM e WHERE v IS NOT NULL GROUP BY i) " +
      "SELECT e.vec_id, CAST(e.i + 1 AS INT) AS i, e.v - m.m AS x " +
      "FROM e JOIN m ON m.i = e.i"

  /** Mirrors the q331 equal-frequency Z-order cells: both axes' exact
    * rank-based quantile edges re-derived in SQL (the q170 CTEs at
    * `nBins`), per-row half-open Variable indexes, Morton interleave of
    * the in-range (i, j) cells, exact counts. */
  def zorderQCells(nBins: Int, bits: Int): String = {
    require((1 << bits) >= nBins, s"bits=$bits too narrow for $nBins cells")
    def axisCtes(p: String, colSql: String): String =
      s"s$p AS (SELECT CAST($colSql AS DOUBLE) AS v FROM lineitem WHERE $colSql IS NOT NULL), " +
        s"c$p AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM s$p), " +
        s"rk$p AS (SELECT v, ROW_NUMBER() OVER (ORDER BY v) AS r FROM s$p), " +
        s"tg$p AS (SELECT GREATEST(CAST(1 AS BIGINT), CAST(CEIL(CAST(j AS DOUBLE) / CAST($nBins AS DOUBLE) * CAST(n AS DOUBLE)) AS BIGINT)) AS r " +
        s"FROM (SELECT UNNEST(generate_series(1, ${nBins - 1})) AS j) CROSS JOIN c$p), " +
        s"qe$p AS (SELECT DISTINCT rk$p.v FROM rk$p JOIN tg$p ON tg$p.r = rk$p.r), " +
        s"mm$p AS (SELECT MIN(v) AS lo, MAX(v) AS hi FROM s$p), " +
        s"ed$p AS (SELECT DISTINCT v FROM (SELECT lo AS v FROM mm$p UNION ALL SELECT v FROM qe$p UNION ALL SELECT hi AS v FROM mm$p)), " +
        s"ec$p AS (SELECT CAST(COUNT(*) AS BIGINT) - 1 AS nb FROM ed$p)"
    val zkey = (for {
      (c, o) <- Seq(("i", 0), ("j", 1))
      b <- 0 until bits
    } yield s"((($c >> $b) & 1) << ${b * 2 + o})").mkString("(", " | ", ")")
    s"WITH ${axisCtes("x", "l_quantity")}, ${axisCtes("y", "l_extendedprice")}, " +
      "src AS (SELECT CAST(l_quantity AS DOUBLE) AS x, CAST(l_extendedprice AS DOUBLE) AS y FROM lineitem), " +
      "ix AS (SELECT (SELECT COUNT(*) FROM edx WHERE edx.v <= src.x) - 1 AS i, " +
      "(SELECT COUNT(*) FROM edy WHERE edy.v <= src.y) - 1 AS j FROM src), " +
      "f AS (SELECT i, j FROM ix CROSS JOIN ecx CROSS JOIN ecy " +
      "WHERE i >= 0 AND i <= ecx.nb - 1 AND j >= 0 AND j <= ecy.nb - 1) " +
      "SELECT CAST(i AS BIGINT) AS cell_q, CAST(j AS BIGINT) AS cell_p, " +
      s"$zkey AS zkey, CAST(COUNT(*) AS BIGINT) AS cnt FROM f GROUP BY i, j"
  }

  /** Mirrors Similarity.jlProject: the md5-parity ±1 hyperplanes
    * (hashEmbed convention), ordered i-fold dots, one IEEE multiply by
    * the 1/√k literal. */
  def jlProject(k: Int): String = {
    val inv = s"CAST('${java.lang.Double.toString(1.0 / math.sqrt(k.toDouble))}' AS DOUBLE)"
    // one GROUP BY vec_id pass with k aggregate expressions (the q249
    // memory class), NOT a (vec, j)-keyed join: the k-times-larger
    // ordered aggregate OOMs DuckDB's allocator at sf1 (131M rows)
    def sign(j: Int): String =
      s"CASE WHEN ('0x' || substr(md5(CAST(i AS VARCHAR) || ':$j'), 1, 1))::BIGINT % 2 = 0 " +
        "THEN CAST(1 AS DOUBLE) ELSE CAST(-1 AS DOUBLE) END"
    val ys = (0 until k).map(j =>
      s"SUM(v * ${sign(j)} ORDER BY i) * $inv AS y$j").mkString(", ")
    val arms = (0 until k).map(j =>
      s"SELECT vec_id, CAST($j AS INT) AS j, y$j AS y FROM a").mkString(" UNION ALL ")
    "WITH e AS (SELECT vec_id, CAST(generate_subscripts(embedding, 1) - 1 AS INT) AS i, " +
      "CAST(UNNEST(embedding) AS DOUBLE) AS v FROM embeddings WHERE embedding IS NOT NULL), " +
      s"a AS MATERIALIZED (SELECT vec_id, $ys FROM e GROUP BY vec_id) " +
      arms
  }

  /** Mirrors Similarity.pcaWhiten: the pcaDeflate CTE, per-component
    * L2 normalization (ordered sum of squares, correctly-rounded SQRT),
    * ordered projection folds, one IEEE divide by √λ; λ ≤ 0 whitens to
    * NULL. */
  def pcaWhiten(iters: Int): String =
    s"WITH comp AS MATERIALIZED (${pcaDeflate(iters)}), " +
      "nrm AS (SELECT component, SQRT(SUM(loading * loading ORDER BY dim)) AS s " +
      "FROM comp GROUP BY component), " +
      "u AS MATERIALIZED (SELECT comp.component, dim, CASE WHEN s > CAST(0 AS DOUBLE) " +
      "THEN loading / s ELSE CAST(0 AS DOUBLE) END AS v, eigenvalue " +
      "FROM comp JOIN nrm ON nrm.component = comp.component), " +
      "e AS (SELECT vec_id, CAST(generate_subscripts(embedding, 1) - 1 AS INT) AS j, " +
      "CAST(UNNEST(embedding) AS DOUBLE) AS v FROM embeddings WHERE embedding IS NOT NULL) " +
      "SELECT e.vec_id, CAST(u.component AS INT) AS component, " +
      "CASE WHEN u.eigenvalue > CAST(0 AS DOUBLE) " +
      "THEN SUM(e.v * u.v ORDER BY e.j) / SQRT(u.eigenvalue) ELSE NULL END AS y " +
      "FROM e JOIN u ON u.dim = e.j GROUP BY e.vec_id, u.component, u.eigenvalue"

  /** Mirrors Similarity.pcaProject: the pcaPower CTE joined back onto
    * the unnested embeddings, projection = ordered j-fold dot. */
  def pcaProject(iters: Int): String =
    s"WITH comp AS MATERIALIZED (${pcaPower(iters)}), " +
      "e AS (SELECT vec_id, CAST(generate_subscripts(embedding, 1) - 1 AS INT) AS j, " +
      "CAST(UNNEST(embedding) AS DOUBLE) AS v FROM embeddings WHERE embedding IS NOT NULL) " +
      "SELECT e.vec_id, SUM(e.v * comp.loading ORDER BY e.j) AS projection " +
      "FROM e JOIN comp ON comp.dim = e.j GROUP BY e.vec_id"

  /** Mirrors TextAnalysis.skipgramCounts: positional tokenization, one
    * LAG per distance 1..window, exact pair counts, top-k with the same
    * total order (n DESC, t1, t2). */
  def skipgramCounts(window: Int, k: Int): String = {
    val lags = (1 to window).map(j =>
      s"LAG(term, $j) OVER (PARTITION BY doc_id ORDER BY pos) AS l$j").mkString(", ")
    val arms = (1 to window).map(j =>
      s"SELECT l$j AS t1, term AS t2 FROM lg WHERE l$j IS NOT NULL").mkString(" UNION ALL ")
    "WITH base AS (SELECT doc_id, regexp_extract_all(text, '\\S+') AS a " +
      "FROM documents WHERE text IS NOT NULL), " +
      "tok AS (SELECT doc_id, UNNEST(a) AS term, " +
      "CAST(generate_subscripts(a, 1) - 1 AS INT) AS pos FROM base), " +
      s"lg AS (SELECT doc_id, pos, term, $lags FROM tok), " +
      s"p AS ($arms), " +
      "c AS (SELECT t1, t2, CAST(COUNT(*) AS BIGINT) AS n FROM p GROUP BY t1, t2) " +
      "SELECT t1, t2, n, CAST(rn AS INT) AS rank FROM " +
      "(SELECT *, ROW_NUMBER() OVER (ORDER BY n DESC, t1, t2) AS rn FROM c) " +
      s"WHERE rn <= $k"
  }

  /** Mirrors TextAnalysis.lmScoreBigram: positional tokenization
    * (generate_subscripts, 0-based like posexplode), the same lag
    * window, 1e-9-quantized conditional/unigram LN, SUM(lp ORDER BY
    * pos) for the per-doc fold, mean as one IEEE division. */
  def lmScoreBigram: String = {
    def d(x: Double) = s"CAST('${java.lang.Double.toString(x)}' AS DOUBLE)"
    def qln(num: String, den: String) =
      s"FLOOR(LN(CAST($num AS DOUBLE) / CAST($den AS DOUBLE)) * ${d(1.0e9)}) / ${d(1.0e9)}"
    "WITH base AS (SELECT doc_id, regexp_extract_all(text, '\\S+') AS a " +
      "FROM documents WHERE text IS NOT NULL), " +
      "tok AS (SELECT doc_id, UNNEST(a) AS term, " +
      "CAST(generate_subscripts(a, 1) - 1 AS INT) AS pos FROM base), " +
      "lg AS (SELECT doc_id, pos, term, " +
      "LAG(term) OVER (PARTITION BY doc_id ORDER BY pos) AS prev FROM tok), " +
      "uni AS (SELECT term, CAST(COUNT(*) AS BIGINT) AS c1 FROM tok GROUP BY term), " +
      "tt AS (SELECT CAST(COUNT(*) AS BIGINT) AS tt FROM tok), " +
      "big AS (SELECT prev, term, CAST(COUNT(*) AS BIGINT) AS c2 FROM lg " +
      "WHERE prev IS NOT NULL GROUP BY prev, term), " +
      "lp AS (" +
      s"SELECT doc_id, pos, ${qln("c1", "tt")} AS lp " +
      "FROM lg JOIN uni USING (term) CROSS JOIN tt WHERE prev IS NULL " +
      "UNION ALL " +
      s"SELECT l.doc_id, l.pos, ${qln("c2", "u.c1")} AS lp " +
      "FROM lg l JOIN big b ON b.prev = l.prev AND b.term = l.term " +
      "JOIN uni u ON u.term = l.prev WHERE l.prev IS NOT NULL) " +
      "SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_tokens, " +
      "SUM(lp ORDER BY pos) / CAST(COUNT(*) AS DOUBLE) AS lm2_score " +
      "FROM lp GROUP BY doc_id"
  }

  /** Mirrors TextAnalysis.pmiCollocations: the same lag-window bigram
    * counts, minCount floor, 1e-9-quantized PMI ln on exact integer
    * ratios, ties (pmi DESC, prev, term). */
  def pmiCollocations(k: Int, minCount: Long): String = {
    def d(x: Double) = s"CAST('${java.lang.Double.toString(x)}' AS DOUBLE)"
    "WITH base AS (SELECT doc_id, regexp_extract_all(text, '\\S+') AS a " +
      "FROM documents WHERE text IS NOT NULL), " +
      "tok AS (SELECT doc_id, UNNEST(a) AS term, " +
      "CAST(generate_subscripts(a, 1) - 1 AS INT) AS pos FROM base), " +
      "lg AS (SELECT doc_id, pos, term, " +
      "LAG(term) OVER (PARTITION BY doc_id ORDER BY pos) AS prev FROM tok), " +
      "uni AS (SELECT term, CAST(COUNT(*) AS BIGINT) AS c1 FROM tok GROUP BY term), " +
      "tt AS (SELECT CAST(COUNT(*) AS BIGINT) AS tt FROM tok), " +
      "big AS (SELECT prev, term, CAST(COUNT(*) AS BIGINT) AS pair_count FROM lg " +
      s"WHERE prev IS NOT NULL GROUP BY prev, term HAVING COUNT(*) >= $minCount), " +
      "sc AS (SELECT b.prev, b.term, pair_count, " +
      "FLOOR(LN((CAST(pair_count AS DOUBLE) * CAST(tt AS DOUBLE)) / " +
      s"(CAST(up.c1 AS DOUBLE) * CAST(ut.c1 AS DOUBLE))) * ${d(1.0e9)}) / ${d(1.0e9)} AS pmi " +
      "FROM big b JOIN uni up ON up.term = b.prev JOIN uni ut ON ut.term = b.term CROSS JOIN tt) " +
      "SELECT prev, term, pair_count, pmi, CAST(rank AS INT) AS rank FROM (" +
      "SELECT prev, term, pair_count, pmi, " +
      "ROW_NUMBER() OVER (ORDER BY pmi DESC, prev, term) AS rank FROM sc) r " +
      s"WHERE rank <= $k"
  }

  /** Mirrors TextAnalysis.oovRate: the reference's DISTINCT vocabulary,
    * a term-keyed LEFT join of the target tf relation, occurrence-
    * weighted OOV sum, one IEEE division. The reference is synthesized
    * as the doc_id-modulo slice registered in SparkEntry. */
  def oovRate(refWhere: String): String =
    "WITH tf AS (SELECT doc_id, UNNEST(regexp_extract_all(text, '\\S+')) AS term " +
      "FROM documents WHERE text IS NOT NULL), " +
      "tfc AS (SELECT doc_id, term, CAST(COUNT(*) AS BIGINT) AS tf FROM tf GROUP BY doc_id, term), " +
      "v AS (SELECT DISTINCT UNNEST(regexp_extract_all(text, '\\S+')) AS term " +
      s"FROM documents WHERE text IS NOT NULL AND ($refWhere)) " +
      "SELECT doc_id, CAST(SUM(tf) AS BIGINT) AS n_tokens, " +
      "CAST(SUM(CASE WHEN v.term IS NULL THEN tf ELSE 0 END) AS BIGINT) AS n_oov, " +
      "CAST(SUM(CASE WHEN v.term IS NULL THEN tf ELSE 0 END) AS DOUBLE) / CAST(SUM(tf) AS DOUBLE) AS oov_rate " +
      "FROM tfc LEFT JOIN v ON v.term = tfc.term GROUP BY doc_id"

  /** Mirrors Similarity.centroidShift: floor(v·1e7) HUGEINT-exact
    * component sums per (label, dim), two IEEE divisions + subtract per
    * dimension, squares folded in dimension order, sqrt then /1e7. The
    * old snapshot is synthesized as in the q188 convention (every 7th
    * vector new, every 5th reversed — a pure permutation, no float
    * arithmetic). */
  def centroidShift: String = {
    def d(x: Double) = s"CAST('${java.lang.Double.toString(x)}' AS DOUBLE)"
    def expl(src: String) =
      s"SELECT label, CAST(generate_subscripts(embedding, 1) - 1 AS INT) AS dim, " +
        s"CAST(UNNEST(embedding) AS DOUBLE) AS v FROM $src WHERE embedding IS NOT NULL"
    "WITH nw AS (SELECT label, embedding FROM embeddings), " +
      "ol AS (SELECT label, CASE WHEN vec_id % 5 = 0 THEN list_reverse(embedding) " +
      "ELSE embedding END AS embedding FROM embeddings WHERE vec_id % 7 <> 0), " +
      s"en AS (${expl("nw")}), " +
      s"eo AS (${expl("ol")}), " +
      s"an AS (SELECT label, dim, SUM(CAST(FLOOR(v * ${d(1.0e7)}) AS BIGINT)) AS sN, " +
      "CAST(COUNT(*) AS BIGINT) AS nN FROM en GROUP BY label, dim), " +
      s"ao AS (SELECT label, dim, SUM(CAST(FLOOR(v * ${d(1.0e7)}) AS BIGINT)) AS sO, " +
      "CAST(COUNT(*) AS BIGINT) AS nO FROM eo GROUP BY label, dim), " +
      "dd AS (SELECT an.label, an.dim, nN, nO, " +
      "(CAST(sN AS DOUBLE) / CAST(nN AS DOUBLE) - CAST(sO AS DOUBLE) / CAST(nO AS DOUBLE)) AS delta " +
      "FROM an JOIN ao ON ao.label = an.label AND ao.dim = an.dim) " +
      "SELECT label, MAX(nO) AS n_old, MAX(nN) AS n_new, " +
      s"SQRT(SUM(delta * delta ORDER BY dim)) / ${d(1.0e7)} AS shift " +
      "FROM dd GROUP BY label"
  }

  /** Mirrors Funnel.intervalJoin — as the UNBLOCKED per-key form (plain
    * key equi-join + |Δ| <= tol), so every gate re-proves the bucket
    * blocking's completeness (the q42 discipline). */
  def intervalJoin(leftType: String, rightType: String, tolUs: Long): String =
    s"WITH l AS (SELECT user_id, event_id AS left_id, epoch_ns(ts) // 1000 AS lus " +
      s"FROM events WHERE event_type = ${q(leftType)} AND ts IS NOT NULL AND user_id IS NOT NULL), " +
      s"r AS (SELECT user_id, event_id AS right_id, epoch_ns(ts) // 1000 AS rus " +
      s"FROM events WHERE event_type = ${q(rightType)} AND ts IS NOT NULL AND user_id IS NOT NULL) " +
      "SELECT l.user_id, left_id, right_id, CAST(rus - lus AS BIGINT) AS dt_us " +
      s"FROM l JOIN r ON r.user_id = l.user_id AND ABS(rus - lus) <= $tolUs"

  /** Mirrors Funnel.rateLimit: the same (time, id) order, exact
    * floor-division day, rank <= n. */
  def rateLimit(n: Int): String =
    "WITH b AS (SELECT user_id, event_id, epoch_ns(ts) // 1000 AS us, " +
      "(epoch_ns(ts) // 1000) // 86400000000 AS day FROM events " +
      "WHERE ts IS NOT NULL AND user_id IS NOT NULL AND event_id IS NOT NULL) " +
      "SELECT user_id, day, event_id, CAST(rn AS INT) AS rn FROM (" +
      "SELECT user_id, day, event_id, " +
      "ROW_NUMBER() OVER (PARTITION BY user_id, day ORDER BY us, event_id) AS rn " +
      s"FROM b) r WHERE rn <= $n"

  /** Mirrors Curation.sourceGini: rank-sorted source sizes, HUGEINT-
    * exact Σi·x and Σx, one IEEE division. */
  def sourceGini: String =
    "WITH c AS (SELECT source, CAST(COUNT(*) AS BIGINT) AS x FROM documents GROUP BY source), " +
      "r AS (SELECT x, CAST(ROW_NUMBER() OVER (ORDER BY x, source) AS BIGINT) AS i FROM c), " +
      "m AS (SELECT CAST(COUNT(*) AS BIGINT) AS n, CAST(SUM(x) AS BIGINT) AS tx, " +
      "SUM(CAST(i AS HUGEINT) * CAST(x AS HUGEINT)) AS six FROM r) " +
      "SELECT n AS n_sources, tx AS total_docs, " +
      "CAST(2 * six - CAST(n + 1 AS HUGEINT) * CAST(tx AS HUGEINT) AS DOUBLE) / " +
      "CAST(CAST(n AS HUGEINT) * CAST(tx AS HUGEINT) AS DOUBLE) AS gini FROM m"

  /** Mirrors TextAnalysis.lexicalRichness: exact (source, term)
    * counts, two IEEE divisions. */
  val lexicalRichness: String =
    "WITH t AS (SELECT source, UNNEST(regexp_extract_all(text, '\\S+')) AS term " +
      "FROM documents WHERE text IS NOT NULL), " +
      "c AS (SELECT source, term, CAST(COUNT(*) AS BIGINT) AS c FROM t GROUP BY 1, 2), " +
      "m AS (SELECT source, CAST(SUM(c) AS BIGINT) AS n_tokens, " +
      "CAST(COUNT(*) AS BIGINT) AS n_types, " +
      "CAST(SUM(CASE WHEN c = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_hapax " +
      "FROM c GROUP BY source) " +
      "SELECT source, n_tokens, n_types, " +
      "CAST(n_types AS DOUBLE) / CAST(n_tokens AS DOUBLE) AS ttr, " +
      "CAST(n_hapax AS DOUBLE) / CAST(n_types AS DOUBLE) AS hapax_rate FROM m"

  /** Mirrors StreamingHist.windowedGini over events: the [[sourceGini]]
    * formula per microsecond window floor, ranks PARTITIONED BY
    * window. */
  def windowedGini(durUs: Long): String =
    s"WITH c AS (SELECT ((epoch_ns(ts) // 1000) // $durUs) * $durUs AS ws, " +
      "event_type AS k, CAST(COUNT(*) AS BIGINT) AS x FROM events " +
      "WHERE ts IS NOT NULL AND event_type IS NOT NULL GROUP BY 1, 2), " +
      "r AS (SELECT ws, x, CAST(ROW_NUMBER() OVER (PARTITION BY ws ORDER BY x, k) AS BIGINT) AS i FROM c), " +
      "m AS (SELECT ws, CAST(COUNT(*) AS BIGINT) AS n, CAST(SUM(x) AS BIGINT) AS tx, " +
      "SUM(CAST(i AS HUGEINT) * CAST(x AS HUGEINT)) AS six FROM r GROUP BY ws) " +
      "SELECT make_timestamp(ws) AS window_start, n AS n_keys, tx AS total_rows, " +
      "CAST(2 * six - CAST(n + 1 AS HUGEINT) * CAST(tx AS HUGEINT) AS DOUBLE) / " +
      "CAST(CAST(n AS HUGEINT) * CAST(tx AS HUGEINT) AS DOUBLE) AS gini FROM m"

  /** Mirrors Curation.lorenzCurve: (size, source) rank order, exact
    * cumulative longs, two IEEE divisions per row. */
  val lorenzCurve: String =
    "WITH c AS (SELECT source, CAST(COUNT(*) AS BIGINT) AS x FROM documents GROUP BY source), " +
      "t AS (SELECT CAST(COUNT(*) AS BIGINT) AS ns, CAST(SUM(x) AS BIGINT) AS ndocs FROM c), " +
      "r AS (SELECT source, x, CAST(ROW_NUMBER() OVER (ORDER BY x, source) AS BIGINT) AS rank, " +
      "CAST(SUM(x) OVER (ORDER BY x, source ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cd FROM c) " +
      "SELECT source, x AS n_docs, rank, " +
      "CAST(rank AS DOUBLE) / CAST(ns AS DOUBLE) AS cum_source_frac, " +
      "CAST(cd AS DOUBLE) / CAST(ndocs AS DOUBLE) AS cum_doc_frac " +
      "FROM r CROSS JOIN t"

  /** Mirrors TextAnalysis.zipfFit: floor(ln·1e3) millinat integer
    * moments — every sum below 2^53, so the int→double casts are exact
    * in both engines — and the identical IEEE slope/r² tail. */
  def zipfFit: String = {
    def d(x: Double) = s"CAST('${java.lang.Double.toString(x)}' AS DOUBLE)"
    "WITH v AS (SELECT term, CAST(COUNT(*) AS BIGINT) AS f FROM (" +
      "SELECT UNNEST(regexp_extract_all(text, '\\S+')) AS term FROM documents " +
      "WHERE text IS NOT NULL) t GROUP BY term), " +
      "r AS (SELECT f, CAST(ROW_NUMBER() OVER (ORDER BY f DESC, term) AS BIGINT) AS rk FROM v), " +
      s"q AS (SELECT CAST(FLOOR(LN(CAST(rk AS DOUBLE)) * ${d(1.0e3)}) AS BIGINT) AS x, " +
      s"CAST(FLOOR(LN(CAST(f AS DOUBLE)) * ${d(1.0e3)}) AS BIGINT) AS y FROM r), " +
      "m AS (SELECT CAST(COUNT(*) AS BIGINT) AS n, SUM(x) AS sx, SUM(y) AS sy, " +
      "SUM(x * y) AS sxy, SUM(x * x) AS sxx, SUM(y * y) AS syy FROM q) " +
      "SELECT n AS n_terms, " +
      "CASE WHEN n >= 2 AND (CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)) > CAST(0 AS DOUBLE) " +
      "THEN (CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE)) / " +
      "(CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)) ELSE NULL END AS slope, " +
      "CASE WHEN n >= 2 AND (CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)) > CAST(0 AS DOUBLE) " +
      "AND (CAST(n AS DOUBLE) * CAST(syy AS DOUBLE) - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE)) > CAST(0 AS DOUBLE) " +
      "THEN ((CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE)) * " +
      "(CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))) / " +
      "((CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)) * " +
      "(CAST(n AS DOUBLE) * CAST(syy AS DOUBLE) - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE))) ELSE NULL END AS r2 FROM m"
  }

  /** Mirrors TextAnalysis.heapsFit: the [[vocabGrowth]] CTEs, millinat
    * integer quantization of both lns, exact moment sums, the zipfFit
    * IEEE slope/r² tail verbatim. */
  def heapsFit(bucketSize: Long): String = {
    def d(x: Double) = s"CAST('${java.lang.Double.toString(x)}' AS DOUBLE)"
    "WITH tk AS (SELECT doc_id, UNNEST(regexp_extract_all(text, '\\S+')) AS tok " +
      "FROM documents WHERE text IS NOT NULL), " +
      "ft AS (SELECT tok, MIN(doc_id) AS fd FROM tk GROUP BY tok), " +
      s"nt AS (SELECT fd // $bucketSize AS bucket, CAST(COUNT(*) AS BIGINT) AS new_types FROM ft GROUP BY 1), " +
      s"vol AS (SELECT doc_id // $bucketSize AS bucket, CAST(COUNT(*) AS BIGINT) AS n_tokens FROM tk GROUP BY 1), " +
      "g AS (SELECT CAST(SUM(vol.n_tokens) OVER (ORDER BY vol.bucket) AS BIGINT) AS ct, " +
      "CAST(SUM(COALESCE(nt.new_types, 0)) OVER (ORDER BY vol.bucket) AS BIGINT) AS cv " +
      "FROM vol LEFT JOIN nt USING (bucket)), " +
      s"q AS (SELECT CAST(FLOOR(LN(CAST(ct AS DOUBLE)) * ${d(1.0e3)}) AS BIGINT) AS x, " +
      s"CAST(FLOOR(LN(CAST(cv AS DOUBLE)) * ${d(1.0e3)}) AS BIGINT) AS y " +
      "FROM g WHERE ct > 0 AND cv > 0), " +
      "m AS (SELECT CAST(COUNT(*) AS BIGINT) AS n, SUM(x) AS sx, SUM(y) AS sy, " +
      "SUM(x * y) AS sxy, SUM(x * x) AS sxx, SUM(y * y) AS syy FROM q) " +
      "SELECT n AS n_points, " +
      "CASE WHEN n >= 2 AND (CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)) > CAST(0 AS DOUBLE) " +
      "THEN (CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE)) / " +
      "(CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)) ELSE NULL END AS beta, " +
      "CASE WHEN n >= 2 AND (CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)) > CAST(0 AS DOUBLE) " +
      "AND (CAST(n AS DOUBLE) * CAST(syy AS DOUBLE) - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE)) > CAST(0 AS DOUBLE) " +
      "THEN ((CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE)) * " +
      "(CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))) / " +
      "((CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)) * " +
      "(CAST(n AS DOUBLE) * CAST(syy AS DOUBLE) - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE))) ELSE NULL END AS r2 FROM m"
  }

  /** Mirrors Contracts.cmsContract: the sketch REBUILT from the same
    * md5 row hashes (depth bucket aggregations over the tf relation,
    * est = LEAST over depth sums), verdicts re-derived with the
    * identical all-integer overshoot inequality. */
  def cmsContract(width: Int, depth: Int): String = {
    def h(j: Int): String =
      s"('0x' || substr(md5('$j:' || term), 1, 8))::BIGINT % $width"
    val bucketCtes = (0 until depth).map { j =>
      s"b$j AS (SELECT ${h(j)} AS b, CAST(SUM(tf) AS BIGINT) AS s$j FROM tf GROUP BY 1)"
    }.mkString(", ")
    val joins = (0 until depth).map { j =>
      s"JOIN b$j ON b$j.b = ${h(j)}"
    }.mkString(" ")
    val est = s"LEAST(${(0 until depth).map(j => s"s$j").mkString(", ")})"
    "WITH tk AS (SELECT UNNEST(regexp_extract_all(text, '\\S+')) AS term " +
      "FROM documents WHERE text IS NOT NULL), " +
      "tf AS (SELECT term, CAST(COUNT(*) AS BIGINT) AS tf FROM tk GROUP BY term), " +
      bucketCtes + ", " +
      s"e AS (SELECT tf.term, tf.tf, $est AS est FROM tf $joins), " +
      "t AS (SELECT CAST(COALESCE(SUM(tf), 0) AS BIGINT) AS n FROM tf) " +
      "SELECT CAST(COUNT(*) AS BIGINT) AS n_keys, " +
      "CAST(COALESCE(SUM(tf), 0) AS BIGINT) AS n_tokens, " +
      "COALESCE(BOOL_AND(est >= tf), TRUE) AS never_under, " +
      s"CAST(COALESCE(SUM(CASE WHEN (est - tf) * $width > 2 * t.n " +
      "THEN 1 ELSE 0 END), 0) AS BIGINT) AS n_over_eps " +
      "FROM e CROSS JOIN t"
  }

  /** Mirrors Funnel.fkAudit on orders→customer with the synthesized
    * parent gap (`parentWhere`): exact counts, one IEEE division. */
  def fkAudit(childTable: String, childKey: String, parentTable: String,
      parentKey: String, parentWhere: String): String =
    s"WITH pk AS (SELECT DISTINCT $parentKey AS k FROM $parentTable WHERE $parentWhere), " +
      s"j AS (SELECT c.$childKey AS fk, pk.k FROM $childTable c LEFT JOIN pk ON pk.k = c.$childKey), " +
      "m AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_rows, " +
      "CAST(SUM(CASE WHEN fk IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_null_keys, " +
      "CAST(SUM(CASE WHEN fk IS NOT NULL AND k IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_orphans FROM j) " +
      "SELECT n_rows, n_null_keys, n_orphans, " +
      "CASE WHEN n_rows > 0 THEN CAST(n_rows - n_null_keys - n_orphans AS DOUBLE) / CAST(n_rows AS DOUBLE) " +
      "ELSE NULL END AS match_rate FROM m"

  /** Mirrors Funnel.eventTrigrams: the same (time, id) order, two lags,
    * global triple counts, rank ties (n DESC, t1, t2, t3). */
  def eventTrigrams(k: Int): String =
    "WITH b AS (SELECT user_id, epoch_ns(ts) // 1000 AS us, event_id, event_type " +
      "FROM events WHERE ts IS NOT NULL AND user_id IS NOT NULL " +
      "AND event_type IS NOT NULL AND event_id IS NOT NULL), " +
      "lg AS (SELECT event_type AS t3, " +
      "LAG(event_type, 1) OVER (PARTITION BY user_id ORDER BY us, event_id) AS t2, " +
      "LAG(event_type, 2) OVER (PARTITION BY user_id ORDER BY us, event_id) AS t1 FROM b), " +
      "c AS (SELECT t1, t2, t3, CAST(COUNT(*) AS BIGINT) AS n FROM lg " +
      "WHERE t1 IS NOT NULL GROUP BY t1, t2, t3) " +
      "SELECT t1, t2, t3, n, CAST(rank AS INT) AS rank FROM (" +
      "SELECT t1, t2, t3, n, ROW_NUMBER() OVER (ORDER BY n DESC, t1, t2, t3) AS rank FROM c) r " +
      s"WHERE rank <= $k"

  /** Mirrors Funnel.typeCooccurrence: DISTINCT (key, type), self-join
    * pair counts with a<b once, lift = (n_both·N)/(n_a·n_b) as the same
    * two IEEE multiplies and one division — no transcendental. */
  def typeCooccurrence: String =
    "WITH kt AS (SELECT DISTINCT user_id AS k, event_type AS t FROM events " +
      "WHERE user_id IS NOT NULL AND event_type IS NOT NULL), " +
      "p1 AS (SELECT t, CAST(COUNT(*) AS BIGINT) AS n1 FROM kt GROUP BY t), " +
      "nk AS (SELECT CAST(COUNT(DISTINCT k) AS BIGINT) AS nk FROM kt), " +
      "pr AS (SELECT a.t AS type_a, b.t AS type_b, CAST(COUNT(*) AS BIGINT) AS n_both " +
      "FROM kt a JOIN kt b ON b.k = a.k AND a.t < b.t GROUP BY a.t, b.t) " +
      "SELECT type_a, type_b, n_both, pa.n1 AS n_a, pb.n1 AS n_b, " +
      "CAST(n_both AS DOUBLE) * CAST(nk AS DOUBLE) / " +
      "(CAST(pa.n1 AS DOUBLE) * CAST(pb.n1 AS DOUBLE)) AS lift " +
      "FROM pr JOIN p1 pa ON pa.t = type_a JOIN p1 pb ON pb.t = type_b CROSS JOIN nk"

  /** Mirrors Funnel.keySkew: exact per-key counts, one-row total, rank
    * ties by key ASC NULLS LAST (Spark asc_nulls_last aligned). */
  def keySkew(keyCol: String, k: Int): String =
    s"WITH c AS (SELECT $keyCol, CAST(COUNT(*) AS BIGINT) AS cnt FROM events GROUP BY $keyCol), " +
      "t AS (SELECT CAST(COUNT(*) AS BIGINT) AS t FROM events) " +
      s"SELECT $keyCol, cnt, share, CAST(rank AS INT) AS rank FROM (" +
      s"SELECT $keyCol, cnt, CAST(cnt AS DOUBLE) / CAST(t AS DOUBLE) AS share, " +
      s"ROW_NUMBER() OVER (ORDER BY cnt DESC, $keyCol ASC NULLS LAST) AS rank " +
      s"FROM c CROSS JOIN t) r WHERE rank <= $k"

  /** Mirrors Funnel.burstiness: microsecond gaps from the same
    * user-partitioned lag order (us, event_id), Σg / Σg² as exact
    * integer DECIMAL(38,0) sums with ONE double cast each (the
    * q123/q189 integer route — g² ≈ 1e22 is past every long window),
    * the identical GREATEST-clamped √ tail, NULL when σ + μ = 0. */
  val burstiness: String = {
    val sig = "SQRT(GREATEST(CAST(0 AS DOUBLE), sgg / n - (sg / n) * (sg / n)))"
    "WITH e AS (SELECT user_id, event_id, epoch_ns(ts) // 1000 AS us " +
      "FROM events WHERE ts IS NOT NULL AND user_id IS NOT NULL), " +
      "g AS (SELECT user_id, us - LAG(us) OVER (" +
      "PARTITION BY user_id ORDER BY us, event_id) AS gp FROM e), " +
      "a AS (SELECT user_id, CAST(COUNT(*) AS DOUBLE) AS n, " +
      "CAST(SUM(CAST(gp AS DECIMAL(38,0))) AS DOUBLE) AS sg, " +
      "CAST(SUM(CAST(gp AS DECIMAL(19,0)) * CAST(gp AS DECIMAL(19,0))) AS DOUBLE) AS sgg " +
      "FROM g WHERE gp IS NOT NULL GROUP BY user_id) " +
      "SELECT user_id, CAST(n AS BIGINT) AS n_gaps, sg / n AS mean_gap_us, " +
      s"CASE WHEN $sig + sg / n > 0 THEN ($sig - sg / n) / ($sig + sg / n) " +
      "ELSE CAST(NULL AS DOUBLE) END AS burstiness FROM a"
  }

  /** Mirrors Funnel.attribution with the UNBLOCKED range join (the gate
    * re-proves the bucket blocking's completeness, the q205 pattern):
    * one-sided window [conv − tol, conv), position/count windows keyed
    * by conversion, the identical 40/20/40 CASE with one division. */
  def attribution(convType: String, touchType: String, tolUs: Long): String = {
    def d(x: Double) = s"CAST('${java.lang.Double.toString(x)}' AS DOUBLE)"
    def side(t: String, idAs: String, usAs: String): String =
      s"SELECT user_id, event_id AS $idAs, epoch_ns(ts) // 1000 AS $usAs " +
        s"FROM events WHERE event_type = ${q(t)} AND ts IS NOT NULL AND user_id IS NOT NULL"
    s"WITH c AS (${side(convType, "conv_id", "cus")}), " +
      s"t AS (${side(touchType, "touch_id", "tus")}), " +
      "j AS (SELECT c.user_id, conv_id, touch_id, tus FROM c JOIN t " +
      s"ON t.user_id = c.user_id AND t.tus >= c.cus - $tolUs AND t.tus < c.cus), " +
      "r AS (SELECT user_id, conv_id, touch_id, " +
      "ROW_NUMBER() OVER (PARTITION BY conv_id ORDER BY tus, touch_id) AS pos, " +
      "COUNT(*) OVER (PARTITION BY conv_id) AS m FROM j) " +
      "SELECT user_id, conv_id, touch_id, CAST(pos AS INT) AS position, " +
      "CAST(m AS BIGINT) AS n_touches, " +
      s"CASE WHEN m = 1 THEN ${d(1.0)} WHEN m = 2 THEN ${d(0.5)} " +
      s"WHEN pos = 1 OR pos = m THEN ${d(0.4)} " +
      s"ELSE ${d(0.2)} / CAST(m - 2 AS DOUBLE) END AS credit FROM r"
  }

  /** Mirrors Skyline.skyline2d over lineitem (maximize price,
    * discount): per-distinct-x max-y candidates, strict staircase over
    * x DESC, join-back on (x, y = maxY). Comparisons only — no float
    * arithmetic. */
  val skylineLineitem: String =
    "WITH b AS (SELECT l_orderkey, l_linenumber, " +
      "CAST(l_extendedprice AS DOUBLE) AS x, CAST(l_discount AS DOUBLE) AS y " +
      "FROM lineitem WHERE l_extendedprice IS NOT NULL AND l_discount IS NOT NULL), " +
      "dx AS (SELECT x, MAX(y) AS my FROM b GROUP BY x), " +
      "st AS (SELECT x, my, MAX(my) OVER (ORDER BY x DESC " +
      "ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS pm FROM dx), " +
      "sv AS (SELECT x, my FROM st WHERE pm IS NULL OR my > pm) " +
      "SELECT l_orderkey, l_linenumber, b.x AS price, b.y AS discount " +
      "FROM b JOIN sv ON sv.x = b.x AND sv.my = b.y"

  /** Mirrors Funnel.cusumFrom (and thereby streamingCusum's gated
    * batch path): the [[cusum]] SQL with the trained baseline mean as
    * a literal. */
  def cusumFrom(mu: Double, k: Double, h: Double): String = {
    def d(x: Double) = s"CAST('${java.lang.Double.toString(x)}' AS DOUBLE)"
    val cum = "ORDER BY wh ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW"
    "WITH b AS (SELECT epoch_ns(ts) // 1000 AS us FROM events " +
      "WHERE ts IS NOT NULL AND epoch_ns(ts) // 1000 >= 0), " +
      "w AS (SELECT us // 3600000000 AS wh, CAST(COUNT(*) AS BIGINT) AS n FROM b GROUP BY 1), " +
      "dv AS (SELECT wh, n, " +
      s"CAST(FLOOR((CAST(n AS DOUBLE) - ${d(mu)} - ${d(k)}) * ${d(1.0e6)}) AS BIGINT) AS dqp, " +
      s"CAST(FLOOR((CAST(n AS DOUBLE) - ${d(mu)} + ${d(k)}) * ${d(1.0e6)}) AS BIGINT) AS dqm " +
      "FROM w), " +
      s"c AS (SELECT wh, n, SUM(dqp) OVER ($cum) AS p, SUM(dqm) OVER ($cum) AS pm FROM dv), " +
      s"r AS (SELECT wh, n, p, pm, LEAST(CAST(0 AS HUGEINT), MIN(p) OVER ($cum)) AS rmin, " +
      s"GREATEST(CAST(0 AS HUGEINT), MAX(pm) OVER ($cum)) AS rmax FROM c) " +
      "SELECT make_timestamp(wh * 3600000000) AS window_start, n, " +
      s"CAST(p - rmin AS DOUBLE) / ${d(1.0e6)} AS cusum_pos, " +
      s"CAST(rmax - pm AS DOUBLE) / ${d(1.0e6)} AS cusum_neg, " +
      s"(CAST(p - rmin AS DOUBLE) / ${d(1.0e6)} > ${d(h)} OR " +
      s"CAST(rmax - pm AS DOUBLE) / ${d(1.0e6)} > ${d(h)}) AS alarm FROM r"
  }

  /** Mirrors Funnel.cusum: hourly counts, exact-decimal mean, 1e6
    * floor-quantized deviations, exact-long prefix sums + running
    * extrema, one IEEE division per row. */
  def cusum(k: Double, h: Double): String = {
    def d(x: Double) = s"CAST('${java.lang.Double.toString(x)}' AS DOUBLE)"
    val cum = "ORDER BY wh ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW"
    "WITH b AS (SELECT epoch_ns(ts) // 1000 AS us FROM events " +
      "WHERE ts IS NOT NULL AND epoch_ns(ts) // 1000 >= 0), " +
      "w AS (SELECT us // 3600000000 AS wh, CAST(COUNT(*) AS BIGINT) AS n FROM b GROUP BY 1), " +
      "m AS (SELECT CAST(SUM(CAST(n AS HUGEINT)) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE) AS mu FROM w), " +
      "dv AS (SELECT wh, n, " +
      s"CAST(FLOOR((CAST(n AS DOUBLE) - mu - ${d(k)}) * ${d(1.0e6)}) AS BIGINT) AS dqp, " +
      s"CAST(FLOOR((CAST(n AS DOUBLE) - mu + ${d(k)}) * ${d(1.0e6)}) AS BIGINT) AS dqm " +
      "FROM w CROSS JOIN m), " +
      s"c AS (SELECT wh, n, SUM(dqp) OVER ($cum) AS p, SUM(dqm) OVER ($cum) AS pm FROM dv), " +
      s"r AS (SELECT wh, n, p, pm, LEAST(CAST(0 AS HUGEINT), MIN(p) OVER ($cum)) AS rmin, " +
      s"GREATEST(CAST(0 AS HUGEINT), MAX(pm) OVER ($cum)) AS rmax FROM c) " +
      "SELECT make_timestamp(wh * 3600000000) AS window_start, n, " +
      s"CAST(p - rmin AS DOUBLE) / ${d(1.0e6)} AS cusum_pos, " +
      s"CAST(rmax - pm AS DOUBLE) / ${d(1.0e6)} AS cusum_neg, " +
      s"(CAST(p - rmin AS DOUBLE) / ${d(1.0e6)} > ${d(h)} OR " +
      s"CAST(rmax - pm AS DOUBLE) / ${d(1.0e6)} > ${d(h)}) AS alarm FROM r"
  }

  /** Mirrors Funnel.abTest (arm = user_id parity, conversion =
    * `convType`): exact user-level collapse, identical IEEE z tail. */
  def abTest(convType: String): String = {
    def d(x: String) = s"CAST($x AS DOUBLE)"
    val pa = s"(${d("conv_a")} / ${d("n_a")})"
    val pb = s"(${d("conv_b")} / ${d("n_b")})"
    val pp = s"((${d("conv_a")} + ${d("conv_b")}) / (${d("n_a")} + ${d("n_b")}))"
    val se2 = s"($pp * (CAST(1 AS DOUBLE) - $pp) * " +
      s"(CAST(1 AS DOUBLE) / ${d("n_a")} + CAST(1 AS DOUBLE) / ${d("n_b")}))"
    "WITH u AS (SELECT user_id, CAST(MAX(CASE WHEN user_id % 2 = 1 THEN 1 ELSE 0 END) AS INT) AS b, " +
      s"MAX(CASE WHEN event_type = ${q(convType)} THEN 1 ELSE 0 END) AS c " +
      "FROM events WHERE user_id IS NOT NULL GROUP BY user_id), " +
      "a AS (SELECT CAST(SUM(CASE WHEN b = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_a, " +
      "CAST(SUM(CASE WHEN b = 0 AND c = 1 THEN 1 ELSE 0 END) AS BIGINT) AS conv_a, " +
      "CAST(SUM(CASE WHEN b = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_b, " +
      "CAST(SUM(CASE WHEN b = 1 AND c = 1 THEN 1 ELSE 0 END) AS BIGINT) AS conv_b FROM u) " +
      "SELECT n_a, conv_a, n_b, conv_b, " +
      s"CASE WHEN n_a = 0 THEN CAST(NULL AS DOUBLE) ELSE $pa END AS rate_a, " +
      s"CASE WHEN n_b = 0 THEN CAST(NULL AS DOUBLE) ELSE $pb END AS rate_b, " +
      s"CASE WHEN n_a = 0 OR n_b = 0 OR $se2 = CAST(0 AS DOUBLE) THEN CAST(NULL AS DOUBLE) " +
      s"ELSE ($pb - $pa) / SQRT($se2) END AS z FROM a"
  }

  /** Mirrors Funnel.abTrajectory (arm = user parity): per-user firsts,
    * hourly deltas over the observed-hours grid, exact cumulative
    * longs, the abTest IEEE tail per row. */
  def abTrajectory(convType: String): String = {
    def d(x: String) = s"CAST($x AS DOUBLE)"
    val pa = s"(${d("conv_a")} / ${d("n_a")})"
    val pb = s"(${d("conv_b")} / ${d("n_b")})"
    val pp = s"((${d("conv_a")} + ${d("conv_b")}) / (${d("n_a")} + ${d("n_b")}))"
    val se2 = s"($pp * (CAST(1 AS DOUBLE) - $pp) * " +
      s"(CAST(1 AS DOUBLE) / ${d("n_a")} + CAST(1 AS DOUBLE) / ${d("n_b")}))"
    val cum = "ORDER BY h ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW"
    "WITH b AS (SELECT user_id, event_type, epoch_ns(ts) // 1000 AS us, " +
      "CASE WHEN user_id % 2 = 1 THEN 1 ELSE 0 END AS arm FROM events " +
      "WHERE user_id IS NOT NULL AND ts IS NOT NULL), " +
      "u AS (SELECT user_id, MAX(arm) AS arm, MIN(us) // 3600000000 AS h0, " +
      s"MIN(CASE WHEN event_type = ${q(convType)} THEN us END) // 3600000000 AS hc " +
      "FROM b GROUP BY user_id), " +
      "hrs AS (SELECT DISTINCT us // 3600000000 AS h FROM b), " +
      "dna AS (SELECT h0 AS h, CAST(COUNT(*) AS BIGINT) AS v FROM u WHERE arm = 0 GROUP BY h0), " +
      "dca AS (SELECT hc AS h, CAST(COUNT(*) AS BIGINT) AS v FROM u WHERE arm = 0 AND hc IS NOT NULL GROUP BY hc), " +
      "dnb AS (SELECT h0 AS h, CAST(COUNT(*) AS BIGINT) AS v FROM u WHERE arm = 1 GROUP BY h0), " +
      "dcb AS (SELECT hc AS h, CAST(COUNT(*) AS BIGINT) AS v FROM u WHERE arm = 1 AND hc IS NOT NULL GROUP BY hc), " +
      "g AS (SELECT hrs.h, COALESCE(dna.v, 0) AS xna, COALESCE(dca.v, 0) AS xca, " +
      "COALESCE(dnb.v, 0) AS xnb, COALESCE(dcb.v, 0) AS xcb FROM hrs " +
      "LEFT JOIN dna ON dna.h = hrs.h LEFT JOIN dca ON dca.h = hrs.h " +
      "LEFT JOIN dnb ON dnb.h = hrs.h LEFT JOIN dcb ON dcb.h = hrs.h), " +
      s"c AS (SELECT h, CAST(SUM(xna) OVER ($cum) AS BIGINT) AS n_a, " +
      s"CAST(SUM(xca) OVER ($cum) AS BIGINT) AS conv_a, " +
      s"CAST(SUM(xnb) OVER ($cum) AS BIGINT) AS n_b, " +
      s"CAST(SUM(xcb) OVER ($cum) AS BIGINT) AS conv_b FROM g) " +
      "SELECT make_timestamp(h * 3600000000) AS window_start, " +
      "n_a, conv_a, n_b, conv_b, " +
      s"CASE WHEN n_a = 0 OR n_b = 0 OR $se2 = CAST(0 AS DOUBLE) THEN CAST(NULL AS DOUBLE) " +
      s"ELSE ($pb - $pa) / SQRT($se2) END AS z FROM c"
  }

  /** Mirrors Funnel.rfm: floor day indices, corpus max day broadcast,
    * exact counts, the DECIMAL(38,14) monetary sum. */
  val rfm: String = {
    val mon = Oracle.exactDbl(
      "SUM(TRY_CAST(CAST(CAST(value AS DOUBLE) AS VARCHAR) AS DECIMAL(38,14)))")
    "WITH b AS (SELECT user_id, (epoch_ns(ts) // 1000) // 86400000000 AS d, value " +
      "FROM events WHERE ts IS NOT NULL AND user_id IS NOT NULL), " +
      "mx AS (SELECT MAX(d) AS maxd FROM b), " +
      "g AS (SELECT user_id, MAX(d) AS lastd, " +
      "CAST(COUNT(DISTINCT d) AS BIGINT) AS active_days, " +
      s"CAST(COUNT(*) AS BIGINT) AS n_events, $mon AS monetary " +
      "FROM b GROUP BY user_id) " +
      "SELECT user_id, maxd - lastd AS recency_days, active_days, n_events, " +
      "COALESCE(monetary, CAST(0 AS DOUBLE)) AS monetary FROM g CROSS JOIN mx"
  }

  /** Mirrors Funnel.pagerank: the lag-window transition counts,
    * row-stochastic edges, `iters` unrolled MATERIALIZED damped
    * rounds with ordered folds and 1e-9 quantization. */
  def pagerank(damping: Double, iters: Int): String = {
    def d(x: Double) = s"CAST('${java.lang.Double.toString(x)}' AS DOUBLE)"
    val base1 = d((1.0 - damping) / 1.0) // (1−d) literal; /n applied in SQL
    val rounds = (1 to iters).map { k =>
      val prev = if (k == 1) "r0" else s"r${k - 1}"
      s"d$k AS MATERIALIZED (SELECT COALESCE(SUM(v ORDER BY od.i), CAST(0 AS DOUBLE)) AS dang " +
        s"FROM $prev r JOIN od ON od.i = r.j WHERE od.o = 0), " +
        s"s$k AS MATERIALIZED (SELECT e.j, SUM(r.v * e.p ORDER BY e.i) AS s " +
        s"FROM e JOIN $prev r ON r.j = e.i GROUP BY e.j), " +
        s"r$k AS MATERIALIZED (SELECT ty.t AS j, " +
        s"FLOOR(($base1 / CAST(n AS DOUBLE) + ${d(damping)} * " +
        s"(COALESCE(s, CAST(0 AS DOUBLE)) + dang / CAST(n AS DOUBLE))) * ${d(1.0e9)}) / ${d(1.0e9)} AS v " +
        s"FROM ty LEFT JOIN s$k ON s$k.j = ty.t CROSS JOIN d$k CROSS JOIN nn)"
    }.mkString(", ")
    "WITH b AS (SELECT user_id, epoch_ns(ts) // 1000 AS us, event_id, event_type AS t " +
      "FROM events WHERE ts IS NOT NULL AND user_id IS NOT NULL " +
      "AND event_type IS NOT NULL AND event_id IS NOT NULL), " +
      "lg AS (SELECT t, LAG(t) OVER (PARTITION BY user_id ORDER BY us, event_id) AS prev FROM b), " +
      "tc AS MATERIALIZED (SELECT prev AS i, t AS j, CAST(COUNT(*) AS BIGINT) AS c " +
      "FROM lg WHERE prev IS NOT NULL GROUP BY 1, 2), " +
      "ty AS MATERIALIZED (SELECT DISTINCT t FROM b), " +
      "nn AS MATERIALIZED (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM ty), " +
      "od AS MATERIALIZED (SELECT ty.t AS i, CAST(COALESCE(SUM(c), 0) AS BIGINT) AS o " +
      "FROM ty LEFT JOIN tc ON tc.i = ty.t GROUP BY ty.t), " +
      "e AS MATERIALIZED (SELECT tc.i, tc.j, CAST(c AS DOUBLE) / CAST(od.o AS DOUBLE) AS p " +
      "FROM tc JOIN od ON od.i = tc.i), " +
      "r0 AS MATERIALIZED (SELECT t AS j, CAST(1 AS DOUBLE) / CAST(n AS DOUBLE) AS v " +
      "FROM ty CROSS JOIN nn), " +
      s"$rounds " +
      s"SELECT j AS event_type, v AS pagerank FROM r$iters"
  }

  /** Mirrors Funnel.seasonality: integer microsecond day/hour
    * arithmetic ((d+4) mod 7, 0=Sunday), exact counts, one IEEE
    * division per cell. */
  val seasonality: String =
    "WITH b AS (SELECT epoch_ns(ts) // 1000 AS us FROM events " +
      "WHERE ts IS NOT NULL AND epoch_ns(ts) // 1000 >= 0), " +
      "c AS (SELECT CAST((us // 86400000000 + 4) % 7 AS INT) AS dow, " +
      "CAST((us % 86400000000) // 3600000000 AS INT) AS hour, " +
      "CAST(COUNT(*) AS BIGINT) AS n FROM b GROUP BY 1, 2), " +
      "t AS (SELECT SUM(n) AS tt FROM c) " +
      "SELECT dow, hour, n, CAST(n AS DOUBLE) / CAST(tt AS DOUBLE) AS share " +
      "FROM c CROSS JOIN t"

  /** Mirrors Funnel.seasonalAnomaly: hourly counts, (dow, hour)
    * DECIMAL-exact cell moments, identical IEEE z tail. */
  val seasonalAnomaly: String =
    "WITH b AS (SELECT epoch_ns(ts) // 1000 AS us FROM events " +
      "WHERE ts IS NOT NULL AND epoch_ns(ts) // 1000 >= 0), " +
      "w AS (SELECT us // 3600000000 AS wh, CAST(COUNT(*) AS BIGINT) AS n " +
      "FROM b GROUP BY 1), " +
      "wd AS (SELECT wh, n, CAST((wh // 24 + 4) % 7 AS INT) AS dow, " +
      "CAST(wh % 24 AS INT) AS hour FROM w), " +
      "c AS (SELECT dow, hour, CAST(COUNT(*) AS BIGINT) AS m, " +
      "SUM(CAST(n AS HUGEINT)) AS sn, SUM(CAST(n AS HUGEINT) * CAST(n AS HUGEINT)) AS snn " +
      "FROM wd GROUP BY 1, 2), " +
      "cm AS (SELECT dow, hour, " +
      "CAST(sn AS DOUBLE) / CAST(m AS DOUBLE) AS cell_mean, " +
      "SQRT(GREATEST(CAST(0 AS DOUBLE), CAST(snn AS DOUBLE) / CAST(m AS DOUBLE) - " +
      "(CAST(sn AS DOUBLE) / CAST(m AS DOUBLE)) * (CAST(sn AS DOUBLE) / CAST(m AS DOUBLE)))) AS cell_std " +
      "FROM c) " +
      "SELECT make_timestamp(wh * 3600000000) AS window_start, wd.dow, wd.hour, " +
      "n, cell_mean, cell_std, " +
      "CASE WHEN cell_std = CAST(0 AS DOUBLE) THEN CAST(NULL AS DOUBLE) " +
      "ELSE (CAST(n AS DOUBLE) - cell_mean) / cell_std END AS z " +
      "FROM wd JOIN cm ON cm.dow = wd.dow AND cm.hour = wd.hour"

  /** Mirrors Funnel.attributionTimeDecay with the UNBLOCKED range join:
    * 1e6 floor-quantized POWER(2, −Δt/h), exact per-conversion long
    * normalizer, one IEEE division, zero-weight conversions NULL. */
  def attributionTimeDecay(convType: String, touchType: String,
      tolUs: Long, halfLifeUs: Long): String = {
    def side(t: String, idAs: String, usAs: String): String =
      s"SELECT user_id, event_id AS $idAs, epoch_ns(ts) // 1000 AS $usAs " +
        s"FROM events WHERE event_type = ${q(t)} AND ts IS NOT NULL AND user_id IS NOT NULL"
    val h = s"CAST('${java.lang.Double.toString(halfLifeUs.toDouble)}' AS DOUBLE)"
    s"WITH c AS (${side(convType, "conv_id", "cus")}), " +
      s"t AS (${side(touchType, "touch_id", "tus")}), " +
      "j AS (SELECT c.user_id, conv_id, touch_id, cus - tus AS dt_us FROM c JOIN t " +
      s"ON t.user_id = c.user_id AND t.tus >= c.cus - $tolUs AND t.tus < c.cus), " +
      "w AS (SELECT *, CAST(FLOOR(POWER(CAST(2 AS DOUBLE), " +
      s"-(CAST(dt_us AS DOUBLE) / $h)) * CAST('1000000.0' AS DOUBLE)) AS BIGINT) AS wq FROM j), " +
      "s AS (SELECT *, CAST(SUM(wq) OVER (PARTITION BY conv_id) AS BIGINT) AS sw FROM w) " +
      "SELECT user_id, conv_id, touch_id, CAST(dt_us AS BIGINT) AS dt_us, " +
      "CASE WHEN sw = 0 THEN CAST(NULL AS DOUBLE) " +
      "ELSE CAST(wq AS DOUBLE) / CAST(sw AS DOUBLE) END AS credit FROM s"
  }

  /** Mirrors TextAnalysis.tokenEntropy: one (doc, term) tf aggregate,
    * 1e-9-quantized LN(tf/len), SUM ORDER BY term, one division and
    * negate. No corpus-wide state at all. */
  def tokenEntropy: String = {
    def d(x: Double) = s"CAST('${java.lang.Double.toString(x)}' AS DOUBLE)"
    "WITH tok AS (SELECT doc_id, UNNEST(regexp_extract_all(text, '\\S+')) AS term " +
      "FROM documents WHERE text IS NOT NULL), " +
      "tf AS (SELECT doc_id, term, CAST(COUNT(*) AS BIGINT) AS tf FROM tok GROUP BY doc_id, term), " +
      "n AS (SELECT doc_id, CAST(SUM(tf) AS BIGINT) AS n_tokens FROM tf GROUP BY doc_id), " +
      "c AS (SELECT tf.doc_id, term, n_tokens, " +
      s"CAST(tf AS DOUBLE) * (FLOOR(LN(CAST(tf AS DOUBLE) / CAST(n_tokens AS DOUBLE)) * ${d(1.0e9)}) / ${d(1.0e9)}) AS c " +
      "FROM tf JOIN n USING (doc_id)) " +
      "SELECT doc_id, CAST(MAX(n_tokens) AS BIGINT) AS n_tokens, " +
      "-(SUM(c ORDER BY term)) / CAST(MAX(n_tokens) AS DOUBLE) AS entropy " +
      "FROM c GROUP BY doc_id"
  }

  /** Mirrors Curation.trimmedMeanBySource: the same (score, doc_id)
    * rank, k = FLOOR(n·p) as one IEEE multiply, HUGEINT-exact sum of
    * the kept band, one division. NULL scores excluded up front. */
  def trimmedMean(p: Double, scoreCol: String): String = {
    def d(x: Double) = s"CAST('${java.lang.Double.toString(x)}' AS DOUBLE)"
    s"WITH b AS (SELECT doc_id, source, CAST($scoreCol AS BIGINT) AS x " +
      s"FROM documents WHERE $scoreCol IS NOT NULL), " +
      "rk AS (SELECT source, x, COUNT(*) OVER (PARTITION BY source) AS n, " +
      s"CAST(FLOOR(CAST(COUNT(*) OVER (PARTITION BY source) AS DOUBLE) * ${d(p)}) AS BIGINT) AS k, " +
      "ROW_NUMBER() OVER (PARTITION BY source ORDER BY x, doc_id) AS r FROM b) " +
      "SELECT source, CAST(MAX(n) AS BIGINT) AS n, CAST(MAX(k) AS BIGINT) AS k_trimmed, " +
      "CAST(SUM(x) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE) AS trimmed_mean " +
      "FROM rk WHERE r > k AND r <= n - k GROUP BY source"
  }

  /** Mirrors Curation.lmFilter: the [[lmScore]] CTE joined back for the
    * source, the percentileBySource rank rule ((rank−1)/(n−1),
    * (score, doc_id) tie-break, single-row source = 0.0), filter at
    * minPctl. Unscoreable docs drop via the inner join. */
  def lmFilter(minPctl: String): String =
    s"WITH ls AS (${lmScore}), " +
      "j AS (SELECT d.doc_id, d.source, ls.lm_score FROM documents d " +
      "JOIN ls ON ls.doc_id = d.doc_id), " +
      "rk AS (SELECT doc_id, source, lm_score, " +
      "COUNT(*) OVER (PARTITION BY source) AS n, " +
      "ROW_NUMBER() OVER (PARTITION BY source ORDER BY lm_score, doc_id) AS r FROM j) " +
      "SELECT doc_id, source, lm_score, pctl FROM (" +
      "SELECT doc_id, source, lm_score, CASE WHEN n = 1 THEN CAST(0 AS DOUBLE) " +
      "ELSE CAST(r - 1 AS DOUBLE) / CAST(n - 1 AS DOUBLE) END AS pctl FROM rk) p " +
      s"WHERE pctl >= $minPctl"

  /** Mirrors Layout.cell + Layout.interleave over lineitem
    * (l_quantity, l_extendedprice): the same IEEE quantizer sequence
    * ((v − lo) / (hi − lo) · 2^bits, FLOOR, BIGINT cast, clamp) and the
    * same Morton shift/and/or bit math. */
  def zorderCells(bits: Int, loQ: Double, hiQ: Double,
      loP: Double, hiP: Double): String = {
    def d(x: Double) = s"CAST('${java.lang.Double.toString(x)}' AS DOUBLE)"
    val maxCell = (1L << bits) - 1L
    val scale = (1L << bits).toDouble
    def cell(v: String, lo: Double, hi: Double): String =
      s"LEAST($maxCell, GREATEST(0, CAST(FLOOR((CAST($v AS DOUBLE) - ${d(lo)}) / " +
        s"${d(hi - lo)} * ${d(scale)}) AS BIGINT)))"
    def interleave(cells: Seq[String]): String = {
      val n = cells.size
      (for {
        (c, i) <- cells.zipWithIndex
        j <- 0 until bits
      } yield s"((($c >> $j) & 1) << ${j * n + i})").mkString("(", " | ", ")")
    }
    "WITH c AS (SELECT " +
      s"${cell("l_quantity", loQ, hiQ)} AS cell_q, " +
      s"${cell("l_extendedprice", loP, hiP)} AS cell_p " +
      "FROM lineitem WHERE l_quantity IS NOT NULL AND l_extendedprice IS NOT NULL) " +
      s"SELECT cell_q, cell_p, ${interleave(Seq("cell_q", "cell_p"))} AS zkey, " +
      "CAST(COUNT(*) AS BIGINT) AS cnt FROM c GROUP BY cell_q, cell_p"
  }

  /** Mirrors HistStats.theilSen: 1e-6-quantized exact daily means, the
    * bounded pairwise-slope relation, the q116 median interpolation
    * over rank-ordered slopes. */
  def theilSen: String = {
    def d(x: Double) = s"CAST('${java.lang.Double.toString(x)}' AS DOUBLE)"
    "WITH dd AS (SELECT ((epoch_ns(ts) // 1000) // 86400000000) AS d, " +
      s"CAST(FLOOR(value * ${d(1.0e6)}) AS BIGINT) AS q " +
      "FROM events WHERE ts IS NOT NULL AND value IS NOT NULL), " +
      s"m AS (SELECT d, CAST(SUM(CAST(q AS DECIMAL(38,0))) AS DOUBLE) / ${d(1.0e6)} " +
      "/ CAST(COUNT(*) AS DOUBLE) AS m FROM dd GROUP BY d), " +
      "nd AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_days FROM m), " +
      "p AS (SELECT (b.m - a.m) / CAST(b.d - a.d AS DOUBLE) AS s " +
      "FROM m a JOIN m b ON a.d < b.d), " +
      "np AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_pairs FROM p), " +
      "r AS (SELECT s, ROW_NUMBER() OVER (ORDER BY s) AS rn FROM p), " +
      s"c AS (SELECT CAST(n_pairs - 1 AS DOUBLE) * ${d(0.5)} AS h, " +
      "CAST(FLOOR(CAST(n_pairs - 1 AS DOUBLE) * " + d(0.5) +
      ") AS BIGINT) AS l, n_pairs FROM np), " +
      "e AS (SELECT c.n_pairs, c.h, c.l, rl.s AS xl, COALESCE(ru.s, rl.s) AS xu " +
      "FROM c LEFT JOIN r rl ON rl.rn = c.l + 1 LEFT JOIN r ru ON ru.rn = c.l + 2) " +
      "SELECT nd.n_days, e.n_pairs, CASE WHEN e.n_pairs = 0 THEN NULL " +
      "ELSE e.xl + (e.h - CAST(e.l AS DOUBLE)) * (e.xu - e.xl) END AS trend_per_day " +
      "FROM nd CROSS JOIN e"
  }

  /** Mirrors HistStats.dailyAcf1: quantized daily means, day-ordered
    * folds for m̄ / denominator / numerator (LAG pairs; non-consecutive
    * rows contribute an exact 0.0, matching the Spark fold), the
    * zero-denominator / no-pair NULL. */
  def dailyAcf1: String = {
    def d(x: Double) = s"CAST('${java.lang.Double.toString(x)}' AS DOUBLE)"
    "WITH dd AS (SELECT ((epoch_ns(ts) // 1000) // 86400000000) AS d, " +
      s"CAST(FLOOR(value * ${d(1.0e6)}) AS BIGINT) AS q " +
      "FROM events WHERE ts IS NOT NULL AND value IS NOT NULL), " +
      s"m AS (SELECT d, CAST(SUM(CAST(q AS DECIMAL(38,0))) AS DOUBLE) / ${d(1.0e6)} " +
      "/ CAST(COUNT(*) AS DOUBLE) AS m FROM dd GROUP BY d), " +
      "n AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_days FROM m), " +
      "mb AS (SELECT SUM(m ORDER BY d) / CAST(ANY_VALUE(n_days) AS DOUBLE) AS mb " +
      "FROM m CROSS JOIN n), " +
      "de AS (SELECT SUM((m - mb) * (m - mb) ORDER BY d) AS den " +
      "FROM m CROSS JOIN mb), " +
      "l AS (SELECT d, m, LAG(d) OVER (ORDER BY d) AS pd, " +
      "LAG(m) OVER (ORDER BY d) AS pm FROM m), " +
      "np AS (SELECT CAST(COALESCE(SUM(CASE WHEN d = pd + 1 THEN 1 ELSE 0 END), 0) " +
      "AS BIGINT) AS n_pairs FROM l), " +
      "nu AS (SELECT SUM(CASE WHEN d = pd + 1 THEN (pm - mb) * (m - mb) " +
      s"ELSE ${d(0.0)} END ORDER BY d) AS num FROM l CROSS JOIN mb) " +
      "SELECT n.n_days, np.n_pairs, " +
      s"CASE WHEN np.n_pairs = 0 OR de.den = ${d(0.0)} THEN NULL " +
      "ELSE nu.num / de.den END AS acf1 " +
      "FROM n CROSS JOIN np CROSS JOIN de CROSS JOIN nu"
  }

  /** Mirrors HistStats.theilSenByKey over event_type: the [[theilSen]]
    * CTEs keyed, per-key rank-ordered slopes, the same median
    * interpolation, single-day keys NULL. */
  def theilSenByKey: String = {
    def d(x: Double) = s"CAST('${java.lang.Double.toString(x)}' AS DOUBLE)"
    "WITH dd AS (SELECT event_type AS k, ((epoch_ns(ts) // 1000) // 86400000000) AS d, " +
      s"CAST(FLOOR(value * ${d(1.0e6)}) AS BIGINT) AS q " +
      "FROM events WHERE ts IS NOT NULL AND event_type IS NOT NULL AND value IS NOT NULL), " +
      s"m AS (SELECT k, d, CAST(SUM(CAST(q AS DECIMAL(38,0))) AS DOUBLE) / ${d(1.0e6)} " +
      "/ CAST(COUNT(*) AS DOUBLE) AS m FROM dd GROUP BY k, d), " +
      "nd AS (SELECT k, CAST(COUNT(*) AS BIGINT) AS n_days FROM m GROUP BY k), " +
      "p AS (SELECT a.k, (b.m - a.m) / CAST(b.d - a.d AS DOUBLE) AS s " +
      "FROM m a JOIN m b ON a.k = b.k AND a.d < b.d), " +
      "np AS (SELECT k, CAST(COUNT(*) AS BIGINT) AS n_pairs FROM p GROUP BY k), " +
      "r AS (SELECT k, s, ROW_NUMBER() OVER (PARTITION BY k ORDER BY s) AS rn FROM p), " +
      s"c AS (SELECT k, n_pairs, CAST(n_pairs - 1 AS DOUBLE) * ${d(0.5)} AS h, " +
      s"CAST(FLOOR(CAST(n_pairs - 1 AS DOUBLE) * ${d(0.5)}) AS BIGINT) AS l FROM np), " +
      "e AS (SELECT c.k, c.n_pairs, c.h, c.l, rl.s AS xl, COALESCE(ru.s, rl.s) AS xu " +
      "FROM c LEFT JOIN r rl ON rl.k = c.k AND rl.rn = c.l + 1 " +
      "LEFT JOIN r ru ON ru.k = c.k AND ru.rn = c.l + 2) " +
      "SELECT nd.k AS event_type, nd.n_days, " +
      "CAST(COALESCE(e.n_pairs, 0) AS BIGINT) AS n_pairs, " +
      "CASE WHEN COALESCE(e.n_pairs, 0) = 0 THEN NULL " +
      "ELSE e.xl + (e.h - CAST(e.l AS DOUBLE)) * (e.xu - e.xl) END AS trend_per_day " +
      "FROM nd LEFT JOIN e ON e.k = nd.k"
  }

  /** Mirrors RankStats.aucCi: the [[auc]] CTE plus the Hanley–McNeil
    * tail in the same IEEE sequence; NULL AUC propagates. */
  def aucCi(posCond: String, z: Double): String = {
    def d(x: Double) = s"CAST('${java.lang.Double.toString(x)}' AS DOUBLE)"
    val np = "CAST(n_pos AS DOUBLE)"
    val nn = "CAST(n_neg AS DOUBLE)"
    val q1 = s"(auc / (${d(2.0)} - auc))"
    val q2 = s"(((${d(2.0)} * auc) * auc) / (${d(1.0)} + auc))"
    val se = s"SQRT((auc * (${d(1.0)} - auc) + " +
      s"($np - ${d(1.0)}) * ($q1 - auc * auc) + " +
      s"($nn - ${d(1.0)}) * ($q2 - auc * auc)) / ($np * $nn))"
    s"WITH a AS (${auc(posCond)}) " +
      s"SELECT n_pos, n_neg, auc, $se AS se, " +
      s"auc - ${d(z)} * $se AS ci_lo, auc + ${d(z)} * $se AS ci_hi FROM a"
  }

  /** Mirrors Curation.dsirEss: the dsirWeights CTE, the max-shifted
    * 1e-9-quantized exp, explicit-width DECIMAL moment sums, one IEEE
    * division (and the derived ess_frac). */
  def dsirEss(targetWhere: String, buckets: Int): String = {
    def d(x: Double) = s"CAST('${java.lang.Double.toString(x)}' AS DOUBLE)"
    s"WITH w AS MATERIALIZED (${dsirWeights(targetWhere, buckets)}), " +
      "mx AS (SELECT MAX(log_weight) AS m FROM w), " +
      s"q AS (SELECT CAST(FLOOR(EXP(log_weight - m) * ${d(1.0e9)}) AS BIGINT) AS q " +
      "FROM w CROSS JOIN mx), " +
      "t AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_docs, " +
      "CAST(COALESCE(SUM(q), 0) AS BIGINT) AS s, " +
      "COALESCE(SUM(CAST(CAST(q AS DECIMAL(19,0)) * CAST(q AS DECIMAL(19,0)) " +
      "AS DECIMAL(38,0))), CAST(0 AS DECIMAL(38,0))) AS s2 FROM q) " +
      "SELECT n_docs, " +
      "CASE WHEN n_docs = 0 THEN NULL ELSE " +
      "CAST(CAST(s AS DECIMAL(19,0)) * CAST(s AS DECIMAL(19,0)) AS DOUBLE) / " +
      "CAST(s2 AS DOUBLE) END AS ess, " +
      "CASE WHEN n_docs = 0 THEN NULL ELSE " +
      "(CAST(CAST(s AS DECIMAL(19,0)) * CAST(s AS DECIMAL(19,0)) AS DOUBLE) / " +
      "CAST(s2 AS DOUBLE)) / CAST(n_docs AS DOUBLE) END AS ess_frac FROM t"
  }

  /** Mirrors Curation.doremiWeights: the two LM CTEs, per-doc excess
    * floor-quantized to 1e-9 longs, exact integer sums cast through
    * DOUBLE in the pinned /1e9/n sequence, 1e-9-floor-quantized EXP,
    * source-ordered softmax fold. */
  def doremiWeights(eta: Double): String = {
    def d(x: Double) = s"CAST('${java.lang.Double.toString(x)}' AS DOUBLE)"
    s"WITH u AS MATERIALIZED (${lmScore}), " +
      s"b AS MATERIALIZED (${lmScoreBigram}), " +
      "ex AS (SELECT d.source, " +
      s"CAST(FLOOR((b.lm2_score - u.lm_score) * ${d(1.0e9)}) AS BIGINT) AS q " +
      "FROM documents d JOIN u ON u.doc_id = d.doc_id " +
      "JOIN b ON b.doc_id = d.doc_id), " +
      "per AS (SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs, " +
      s"CAST(SUM(q) AS DOUBLE) / ${d(1.0e9)} / CAST(COUNT(*) AS DOUBLE) AS mean_excess " +
      "FROM ex GROUP BY source), " +
      "w AS (SELECT source, n_docs, mean_excess, " +
      s"FLOOR(EXP(${d(eta)} * mean_excess) * ${d(1.0e9)}) / ${d(1.0e9)} AS wr FROM per), " +
      "ws AS (SELECT SUM(wr ORDER BY source) AS s FROM w) " +
      "SELECT source, n_docs, mean_excess, wr / s AS weight FROM w CROSS JOIN ws"
  }

  /** Mirrors Curation.excessLossSelect: both LM-score CTEs, excess =
    * one IEEE subtract, the lmFilter rank discipline per source. */
  def excessLossSelect(minPctl: String): String =
    s"WITH u AS MATERIALIZED (${lmScore}), " +
      s"b AS MATERIALIZED (${lmScoreBigram}), " +
      "j AS (SELECT d.doc_id, d.source, b.lm2_score - u.lm_score AS excess " +
      "FROM documents d JOIN u ON u.doc_id = d.doc_id " +
      "JOIN b ON b.doc_id = d.doc_id), " +
      "rk AS (SELECT doc_id, source, excess, " +
      "COUNT(*) OVER (PARTITION BY source) AS n, " +
      "ROW_NUMBER() OVER (PARTITION BY source ORDER BY excess, doc_id) AS r FROM j) " +
      "SELECT doc_id, source, excess, pctl FROM (" +
      "SELECT doc_id, source, excess, CASE WHEN n = 1 THEN CAST(0 AS DOUBLE) " +
      "ELSE CAST(r - 1 AS DOUBLE) / CAST(n - 1 AS DOUBLE) END AS pctl FROM rk) p " +
      s"WHERE pctl >= $minPctl"

  /** Mirrors RankStats.auc: the distinct-score relation with pos/neg
    * counts, an exact strictly-below window cumsum (the oracle may use
    * the window — row count = distinct scores; Spark uses the
    * distributed two-pass prefix sum), the integer 2U identity, and
    * ONE IEEE division. */
  def auc(posCond: String): String =
    "WITH s AS (SELECT CAST(value AS DOUBLE) AS v, " +
      s"CAST(SUM(CASE WHEN $posCond THEN 1 ELSE 0 END) AS BIGINT) AS p, " +
      s"CAST(SUM(CASE WHEN $posCond THEN 0 ELSE 1 END) AS BIGINT) AS n " +
      "FROM events WHERE value IS NOT NULL AND NOT isnan(CAST(value AS DOUBLE)) " +
      "GROUP BY CAST(value AS DOUBLE)), " +
      "c AS (SELECT v, p, n, CAST(COALESCE(SUM(n) OVER (ORDER BY v " +
      "ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS cn FROM s), " +
      "t AS (SELECT CAST(COALESCE(SUM(p), 0) AS BIGINT) AS n_pos, " +
      "CAST(COALESCE(SUM(n), 0) AS BIGINT) AS n_neg, " +
      "CAST(COALESCE(SUM(p * (cn * 2 + n)), 0) AS BIGINT) AS u2 FROM c) " +
      "SELECT n_pos, n_neg, CASE WHEN n_pos = 0 OR n_neg = 0 THEN CAST(NULL AS DOUBLE) " +
      "ELSE CAST(u2 AS DOUBLE) / (CAST(2 AS DOUBLE) * CAST(n_pos AS DOUBLE) * " +
      "CAST(n_neg AS DOUBLE)) END AS auc FROM t"

  /** Mirrors RankStats.mannWhitney: the [[auc]] CTEs plus the
    * DECIMAL tie-correction sum Σ(t³−t), then the pinned IEEE σ²/z
    * sequence — every subexpression associated exactly as the Spark
    * Column tree. */
  def mannWhitney(posCond: String): String = {
    val pd = "CAST(n_pos AS DOUBLE)"; val nd = "CAST(n_neg AS DOUBLE)"
    val td = s"($pd + $nd)"
    val sig2 = s"($pd * $nd / CAST(12 AS DOUBLE)) * " +
      s"(($td + CAST(1 AS DOUBLE)) - CAST(st3 AS DOUBLE) / " +
      s"($td * ($td - CAST(1 AS DOUBLE))))"
    "WITH s AS (SELECT CAST(value AS DOUBLE) AS v, " +
      s"CAST(SUM(CASE WHEN $posCond THEN 1 ELSE 0 END) AS BIGINT) AS p, " +
      s"CAST(SUM(CASE WHEN $posCond THEN 0 ELSE 1 END) AS BIGINT) AS n " +
      "FROM events WHERE value IS NOT NULL AND NOT isnan(CAST(value AS DOUBLE)) " +
      "GROUP BY CAST(value AS DOUBLE)), " +
      "c AS (SELECT v, p, n, CAST(COALESCE(SUM(n) OVER (ORDER BY v " +
      "ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS cn, " +
      "CAST(p + n AS DECIMAL(12,0)) AS tdv FROM s), " +
      "t AS (SELECT CAST(COALESCE(SUM(p), 0) AS BIGINT) AS n_pos, " +
      "CAST(COALESCE(SUM(n), 0) AS BIGINT) AS n_neg, " +
      "CAST(COALESCE(SUM(p * (cn * 2 + n)), 0) AS BIGINT) AS u2, " +
      "CAST(COALESCE(SUM(tdv * tdv * tdv - tdv), 0) AS DECIMAL(38,0)) AS st3 FROM c) " +
      "SELECT n_pos, n_neg, " +
      "CASE WHEN n_pos = 0 OR n_neg = 0 THEN CAST(NULL AS DOUBLE) " +
      "ELSE CAST(u2 AS DOUBLE) / CAST(2 AS DOUBLE) END AS u, " +
      s"CASE WHEN n_pos = 0 OR n_neg = 0 OR n_pos + n_neg < 2 OR $sig2 <= CAST(0 AS DOUBLE) " +
      "THEN CAST(NULL AS DOUBLE) " +
      s"ELSE (CAST(u2 AS DOUBLE) - $pd * $nd) / (CAST(2 AS DOUBLE) * SQRT($sig2)) END AS z " +
      "FROM t"
  }

  /** Mirrors RankStats.reliability over score = value/512 clamped to
    * [0,1]: the nBins-sized per-bin relation (DECIMAL score sums →
    * exact-double conf), and the ECE fold as SUM(term ORDER BY bin) —
    * the ordered-aggregate mirror of Spark's sorted-array fold. */
  def reliability(posCond: String, nBins: Int = 10): String = {
    val s = "LEAST(GREATEST(CAST(value AS DOUBLE) / CAST(512 AS DOUBLE), " +
      "CAST(0 AS DOUBLE)), CAST(1 AS DOUBLE))"
    val conf = Oracle.exactDbl("SUM(TRY_CAST(CAST(s AS VARCHAR) AS DECIMAL(38,14)))") +
      " / CAST(COUNT(*) AS DOUBLE)"
    s"WITH b AS (SELECT LEAST(CAST(FLOOR($s * CAST($nBins AS DOUBLE)) AS BIGINT), " +
      s"${nBins - 1}) AS bin, $s AS s, " +
      s"CASE WHEN $posCond THEN 1 ELSE 0 END AS y FROM events " +
      "WHERE value IS NOT NULL AND NOT isnan(CAST(value AS DOUBLE))), " +
      "r AS (SELECT bin, CAST(COUNT(*) AS BIGINT) AS n, " +
      s"CAST(SUM(y) AS BIGINT) AS pos, $conf AS conf, " +
      s"CAST(SUM(y) AS BIGINT) / CAST(COUNT(*) AS DOUBLE) AS acc, " +
      s"ABS($conf - CAST(SUM(y) AS BIGINT) / CAST(COUNT(*) AS DOUBLE)) AS gap " +
      "FROM b GROUP BY bin), " +
      "tt AS (SELECT CAST(COALESCE(SUM(n), 0) AS BIGINT) AS tot FROM r), " +
      "e AS (SELECT SUM(CAST(n AS DOUBLE) / CAST(tot AS DOUBLE) * gap ORDER BY bin) AS ece " +
      "FROM r CROSS JOIN tt) " +
      "SELECT r.bin, r.n, r.pos, r.conf, r.acc, r.gap, e.ece FROM r CROSS JOIN e"
  }

  /** Mirrors RankStats.spearman over (l_quantity, l_extendedprice):
    * doubled midranks from distinct-value cumulative counts (the
    * window runs over distinct values only — the auc oracle license),
    * the same explicit-width DECIMAL moment arithmetic, one IEEE
    * tail. */
  def spearman: String = {
    def rankCte(c: String, p: String): String =
      s"c$p AS (SELECT $c AS v, CAST(COUNT(*) AS BIGINT) AS c FROM b GROUP BY $c), " +
        s"r$p AS (SELECT v, 2 * COALESCE(SUM(c) OVER (ORDER BY v " +
        "ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) + c + 1 AS r2 " +
        s"FROM c$p)"
    def mom(a: String, bb: String): String =
      s"SUM(CAST(CAST($a AS DECIMAL(13,0)) * CAST($bb AS DECIMAL(13,0)) AS DECIMAL(38,0)))"
    def cross(m: String, s1: String, s2: String): String =
      s"(CAST(n AS DECIMAL(13,0)) * CAST($m AS DECIMAL(25,0)) - " +
        s"CAST($s1 AS DECIMAL(19,0)) * CAST($s2 AS DECIMAL(19,0)))"
    "WITH b AS (SELECT CAST(l_quantity AS DOUBLE) AS x, " +
      "CAST(l_extendedprice AS DOUBLE) AS y FROM lineitem " +
      "WHERE l_quantity IS NOT NULL AND l_extendedprice IS NOT NULL), " +
      s"${rankCte("x", "x")}, ${rankCte("y", "y")}, " +
      "j AS (SELECT rx.r2 AS a, ry.r2 AS bb FROM b " +
      "JOIN rx ON rx.v = b.x JOIN ry ON ry.v = b.y), " +
      "s AS (SELECT CAST(COUNT(*) AS BIGINT) AS n, " +
      "CAST(COALESCE(SUM(a), 0) AS BIGINT) AS sa, " +
      "CAST(COALESCE(SUM(bb), 0) AS BIGINT) AS sb, " +
      s"COALESCE(${mom("a", "bb")}, CAST(0 AS DECIMAL(38,0))) AS sab, " +
      s"COALESCE(${mom("a", "a")}, CAST(0 AS DECIMAL(38,0))) AS sa2, " +
      s"COALESCE(${mom("bb", "bb")}, CAST(0 AS DECIMAL(38,0))) AS sb2 FROM j) " +
      "SELECT n, CASE WHEN n = 0 OR " +
      s"${cross("sa2", "sa", "sa")} = 0 OR ${cross("sb2", "sb", "sb")} = 0 " +
      s"THEN NULL ELSE CAST(${cross("sab", "sa", "sb")} AS DOUBLE) / " +
      s"SQRT(CAST(${cross("sa2", "sa", "sa")} AS DOUBLE) * " +
      s"CAST(${cross("sb2", "sb", "sb")} AS DOUBLE)) END AS rho FROM s"
  }

  /** Mirrors RankStats.brierDecomposition over score = value/512
    * clamped: 1e-6-quantized exact longs for Σs and Σ(s−y)², pinned
    * CAST/1e6/n means, bin-ordered REL/RES sums, the N = 0 NULL
    * guard. */
  def brierDecomposition(posCond: String, nBins: Int = 10): String = {
    def d(x: Double) = s"CAST('${java.lang.Double.toString(x)}' AS DOUBLE)"
    val s = "LEAST(GREATEST(CAST(value AS DOUBLE) / CAST(512 AS DOUBLE), " +
      "CAST(0 AS DOUBLE)), CAST(1 AS DOUBLE))"
    s"WITH b AS (SELECT LEAST(CAST(FLOOR(s * CAST($nBins AS DOUBLE)) AS BIGINT), " +
      s"${nBins - 1}) AS bin, " +
      s"CAST(FLOOR(s * ${d(1.0e6)}) AS BIGINT) AS q, y FROM " +
      s"(SELECT $s AS s, CASE WHEN $posCond THEN 1 ELSE 0 END AS y FROM events " +
      "WHERE value IS NOT NULL AND NOT isnan(CAST(value AS DOUBLE)))), " +
      "r AS (SELECT bin, CAST(COUNT(*) AS BIGINT) AS n, " +
      "CAST(SUM(y) AS BIGINT) AS pos, " +
      "SUM(CAST(q AS DECIMAL(38,0))) AS sq, " +
      "SUM(CAST(CAST(q - y * 1000000 AS DECIMAL(13,0)) * " +
      "CAST(q - y * 1000000 AS DECIMAL(13,0)) AS DECIMAL(38,0))) AS se2 " +
      "FROM b GROUP BY bin), " +
      "t AS (SELECT CAST(COALESCE(SUM(n), 0) AS BIGINT) AS N, " +
      "CAST(COALESCE(SUM(pos), 0) AS BIGINT) AS P, " +
      "COALESCE(SUM(se2), CAST(0 AS DECIMAL(38,0))) AS SE2 FROM r), " +
      s"m AS (SELECT bin, n, CAST(sq AS DOUBLE) / ${d(1.0e6)} / CAST(n AS DOUBLE) AS cf, " +
      "CAST(pos AS DOUBLE) / CAST(n AS DOUBLE) AS ac FROM r), " +
      "rel AS (SELECT SUM(CAST(n AS DOUBLE) * ((cf - ac) * (cf - ac)) ORDER BY bin) AS v FROM m), " +
      "res AS (SELECT SUM(CAST(m.n AS DOUBLE) * " +
      "((m.ac - CAST(t.P AS DOUBLE) / CAST(t.N AS DOUBLE)) * " +
      "(m.ac - CAST(t.P AS DOUBLE) / CAST(t.N AS DOUBLE))) ORDER BY m.bin) AS v " +
      "FROM m CROSS JOIN t) " +
      "SELECT t.N AS n, " +
      "CASE WHEN t.N = 0 THEN NULL ELSE CAST(t.P AS DOUBLE) / CAST(t.N AS DOUBLE) END AS base_rate, " +
      s"CASE WHEN t.N = 0 THEN NULL ELSE CAST(t.SE2 AS DOUBLE) / ${d(1.0e12)} / CAST(t.N AS DOUBLE) END AS brier, " +
      "CASE WHEN t.N = 0 THEN NULL ELSE rel.v / CAST(t.N AS DOUBLE) END AS reliability, " +
      "CASE WHEN t.N = 0 THEN NULL ELSE res.v / CAST(t.N AS DOUBLE) END AS resolution, " +
      "CASE WHEN t.N = 0 THEN NULL ELSE (CAST(t.P AS DOUBLE) / CAST(t.N AS DOUBLE)) * " +
      "(CAST(1 AS DOUBLE) - CAST(t.P AS DOUBLE) / CAST(t.N AS DOUBLE)) END AS uncertainty " +
      "FROM t CROSS JOIN rel CROSS JOIN res"
  }

  /** Mirrors StreamingHist.windowedEce over score = value/512 clamped:
    * hourly windows, per-(window, bin) exact counts + DECIMAL score
    * sums, per-window ECE as SUM(term ORDER BY bin) — the
    * [[reliability]] arithmetic per window. */
  def windowedEce(posCond: String, nBins: Int = 10): String = {
    val s = "LEAST(GREATEST(CAST(value AS DOUBLE) / CAST(512 AS DOUBLE), " +
      "CAST(0 AS DOUBLE)), CAST(1 AS DOUBLE))"
    val conf = Oracle.exactDbl("SUM(TRY_CAST(CAST(s AS VARCHAR) AS DECIMAL(38,14)))") +
      " / CAST(COUNT(*) AS DOUBLE)"
    val acc = "CAST(CAST(SUM(y) AS BIGINT) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE)"
    "WITH b AS (SELECT make_timestamp(((epoch_ns(ts) // 1000) // 3600000000) * 3600000000) AS ws, " +
      s"LEAST(CAST(FLOOR(s * CAST($nBins AS DOUBLE)) AS BIGINT), ${nBins - 1}) AS bin, s, y " +
      s"FROM (SELECT ts, $s AS s, CASE WHEN $posCond THEN 1 ELSE 0 END AS y " +
      "FROM events WHERE ts IS NOT NULL AND value IS NOT NULL " +
      "AND NOT isnan(CAST(value AS DOUBLE))) src), " +
      "r AS (SELECT ws, bin, CAST(COUNT(*) AS BIGINT) AS n, " +
      s"$conf AS conf, $acc AS acc FROM b GROUP BY ws, bin), " +
      "t AS (SELECT ws, CAST(SUM(n) AS BIGINT) AS tot FROM r GROUP BY ws) " +
      "SELECT r.ws AS window_start, t.tot AS n, " +
      "SUM(CAST(r.n AS DOUBLE) / CAST(t.tot AS DOUBLE) * ABS(r.conf - r.acc) " +
      "ORDER BY r.bin) AS ece " +
      "FROM r JOIN t ON t.ws = r.ws GROUP BY r.ws, t.tot"
  }

  /** Mirrors RankStats.kmSurvival: per-key lifetime days with the
    * end-of-window censoring rule, the lifetimes-sized at-risk
    * cumsum, and the cumulative product as an ordered PRODUCT in a
    * correlated subquery — sequential multiplies in lifetime order,
    * the exact sequence of Spark's slice-fold. */
  def kmSurvival(censorDays: Int): String =
    "WITH k AS (SELECT user_id, CAST(MIN(epoch_ns(ts) // 1000) AS BIGINT) AS lo, " +
      "CAST(MAX(epoch_ns(ts) // 1000) AS BIGINT) AS hi " +
      "FROM events WHERE user_id IS NOT NULL AND ts IS NOT NULL GROUP BY user_id), " +
      "e AS (SELECT CAST(MAX(hi) AS BIGINT) AS fin FROM k), " +
      "l AS (SELECT (hi // 86400000000) - (lo // 86400000000) AS life, " +
      s"(hi // 86400000000) >= (fin // 86400000000) - $censorDays AS cens FROM k CROSS JOIN e), " +
      "p AS (SELECT life, CAST(SUM(CASE WHEN cens THEN 0 ELSE 1 END) AS BIGINT) AS deaths, " +
      "CAST(SUM(CASE WHEN cens THEN 1 ELSE 0 END) AS BIGINT) AS censored FROM l GROUP BY life), " +
      "c AS (SELECT life, deaths, censored, " +
      "CAST((SELECT COALESCE(SUM(deaths + censored), 0) FROM p) AS BIGINT) - " +
      "CAST(COALESCE(SUM(deaths + censored) OVER (ORDER BY life " +
      "ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS at_risk FROM p), " +
      "f AS (SELECT life, at_risk, deaths, censored, " +
      "CASE WHEN deaths > 0 THEN CAST(1 AS DOUBLE) - CAST(deaths AS DOUBLE) / " +
      "CAST(at_risk AS DOUBLE) ELSE CAST(1 AS DOUBLE) END AS fac FROM c) " +
      "SELECT life, at_risk, deaths, censored, " +
      "(SELECT COALESCE(PRODUCT(f2.fac ORDER BY f2.life), CAST(1 AS DOUBLE)) " +
      "FROM f f2 WHERE f2.life <= f.life) AS survival FROM f"

  /** Mirrors Curation.robustStandardizeBySource: integral scores make
    * every interpolated median an exact multiple of 1/2 and the MAD an
    * exact multiple of 1/4, so quantile_cont and Spark's percentile
    * agree bit-exactly whatever each engine's interpolation formula;
    * rz is one IEEE division, NULL when MAD = 0. */
  def robustStandardize(scoreCol: String): String =
    s"WITH m AS (SELECT source, quantile_cont(CAST($scoreCol AS BIGINT), 0.5) AS med " +
      "FROM documents GROUP BY source), " +
      "s AS (SELECT d.source, m.med, " +
      s"quantile_cont(ABS(CAST(CAST($scoreCol AS BIGINT) AS DOUBLE) - m.med), 0.5) AS mad " +
      "FROM documents d JOIN m USING (source) GROUP BY d.source, m.med) " +
      s"SELECT doc_id, d.source, $scoreCol, med, mad, " +
      s"CASE WHEN mad > CAST(0 AS DOUBLE) THEN (CAST(CAST($scoreCol AS BIGINT) AS DOUBLE) - med) / mad ELSE NULL END AS rz " +
      "FROM documents d JOIN s USING (source)"

  /** Mirrors Dedup.chunkDedup: positional whitespace tokens, fixed
    * chunk groups rebuilt in token order, first-occurrence election as
    * MIN(ROW(doc_id, chunk)) — the same lexicographic struct min Spark
    * computes, exact integers on both engines, no packed key and so no
    * overflow anywhere — per-doc rollup over ALL docs. `hashKey`
    * mirrors the 100 TB constant-width-shuffle variant: the election
    * groups by md5(ctext) (both engines hash the identical UTF-8
    * bytes), identical output absent md5 collisions. */
  def chunkDedup(chunkTokens: Int, hashKey: Boolean = false): String = {
    val key = if (hashKey) "md5(ctext)" else "ctext"
    "WITH tk AS (SELECT doc_id, " +
      "UNNEST(regexp_extract_all(COALESCE(text, ''), '\\S+')) AS tok, " +
      "generate_subscripts(regexp_extract_all(COALESCE(text, ''), '\\S+'), 1) - 1 AS pos " +
      "FROM documents), " +
      s"ch AS (SELECT doc_id, pos // $chunkTokens AS chunk, " +
      "CAST(COUNT(*) AS BIGINT) AS ctoks, " +
      "string_agg(tok, ' ' ORDER BY pos) AS ctext FROM tk GROUP BY 1, 2), " +
      s"fs AS (SELECT $key AS ckey, MIN(ROW(doc_id, chunk)) AS fk " +
      "FROM ch GROUP BY 1), " +
      "ag AS (SELECT ch.doc_id, CAST(COUNT(*) AS BIGINT) AS n_chunks, " +
      "CAST(SUM(CASE WHEN ROW(ch.doc_id, ch.chunk) = fs.fk " +
      "THEN 1 ELSE 0 END) AS BIGINT) AS n_kept, " +
      "CAST(SUM(ctoks) AS BIGINT) AS n_tokens, " +
      "CAST(SUM(CASE WHEN ROW(ch.doc_id, ch.chunk) = fs.fk " +
      "THEN ctoks ELSE 0 END) AS BIGINT) AS kept_tokens " +
      s"FROM ch JOIN fs ON $key = fs.ckey GROUP BY 1) " +
      "SELECT d.doc_id, COALESCE(n_chunks, 0) AS n_chunks, " +
      "COALESCE(n_kept, 0) AS n_kept, COALESCE(n_tokens, 0) AS n_tokens, " +
      "COALESCE(kept_tokens, 0) AS kept_tokens, " +
      "CASE WHEN COALESCE(n_tokens, 0) > 0 THEN " +
      "CAST(kept_tokens AS DOUBLE) / CAST(n_tokens AS DOUBLE) END " +
      "AS kept_fraction FROM documents d LEFT JOIN ag USING (doc_id)"
  }

}
