package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Large-scale training-data pipeline operators over the `documents` /
  * `embeddings` tables: deduplication (exact, n-gram Jaccard, MinHash+LSH,
  * SimHash), similarity search (brute-force + LSH-bucketed ANN), and text
  * analysis (token stats, quality scores, language-ID, fingerprints).
  *
  * Everything is Spark built-ins (codegen'd, shuffle-aware) except where a
  * genuine per-row algorithm needs a typed map. Operators that must agree
  * with the DuckDB oracle use only IEEE-exact arithmetic (integer hashes or
  * floor-scaled integers); float-summing variants are exposed separately
  * and checked rows-only.
  *
  * Scale notes: every dedup path is a shuffle on a *derived short key*
  * (hash, shingle, band) — never on raw text; LSH banding bounds the
  * candidate-pair blowup so the exact verification join touches only
  * plausible pairs (the standard MinHash-LSH design, Broder 1997 /
  * Leskovec-Rajaraman-Ullman ch. 3).
  */
object PipelineOps {

  // ------------------------------------------------------------ exact dedup

  /** Exact duplicate groups by content hash: one keeper (min id) per
    * distinct text; `dup_cnt` > 1 marks exact duplicates. Map-side-combined
    * groupBy on a 128-bit hash — at 100 TB this is the cheapest dedup pass
    * and always runs first.
    */
  def exactDupGroups(docs: DataFrame): DataFrame =
    docs.groupBy(md5(col("text").cast("binary")).as("h"))
      .agg(min("doc_id").as("keeper"), count(lit(1)).as("dup_cnt"))
      .select("h", "keeper", "dup_cnt")

  // ------------------------------------------------------------- shingles

  /** Distinct word n-gram shingles per document, 1-based positions so the
    * SQL twin (`list_transform(range(1, len-n+2), ...)`) aligns exactly.
    */
  def shingles(docs: DataFrame, n: Int = 3): DataFrame = {
    val toks = split(col("text"), " ")
    val grams = transform(
      sequence(lit(1), size(toks) - lit(n - 1)),
      i => concat_ws(" ",
        (0 until n).map(j => element_at(toks, i + lit(j))): _*))
    docs
      // guard: Spark's sequence(1, k) DESCENDS when k < 1; the SQL twin's
      // range() is empty there — filter short docs identically on both sides
      .where(size(toks) >= n)
      .select(col("doc_id"), explode(array_distinct(grams)).as("shingle"))
  }

  /** Exact n-gram Jaccard near-duplicate pairs (a < b, J ≥ threshold):
    * shingle equi-join → per-pair intersection count → |A∪B| by inclusion-
    * exclusion. No cross join anywhere; the shuffle key is the shingle.
    */
  def ngramJaccardPairs(docs: DataFrame, n: Int = 3,
      threshold: Double = 0.7): DataFrame = {
    val sh = shingles(docs, n).cache()
    val cnt = sh.groupBy("doc_id").agg(count(lit(1)).as("n"))
    val inter = sh.as("a").join(sh.as("b"),
        col("a.shingle") === col("b.shingle") &&
          col("a.doc_id") < col("b.doc_id"))
      .groupBy(col("a.doc_id").as("a"), col("b.doc_id").as("b"))
      .agg(count(lit(1)).as("c"))
    inter
      .join(cnt.select(col("doc_id").as("a"), col("n").as("na")), Seq("a"))
      .join(cnt.select(col("doc_id").as("b"), col("n").as("nb")), Seq("b"))
      .withColumn("jac", col("c").cast("double") / (col("na") + col("nb") - col("c")))
      .where(col("jac") >= threshold)
      .select("a", "b", "jac")
  }

  // -------------------------------------------------------- MinHash + LSH

  /** MinHash signatures (numPerms permutations via seeded xxhash64) banded
    * for LSH: output (doc_id, band, band_hash). Near-duplicate candidates
    * are pairs sharing any (band, band_hash) bucket — the scale path: the
    * only shuffle is on the band hash, never on pairs.
    */
  def minhashBands(docs: DataFrame, n: Int = 3, numPerms: Int = 16,
      bands: Int = 4): DataFrame = {
    val rowsPerBand = numPerms / bands
    val sigCols = (0 until numPerms).map(p =>
      min(xxhash64(lit(p), col("shingle"))).as(s"h$p"))
    val sig = shingles(docs, n)
      .groupBy("doc_id")
      .agg(sigCols.head, sigCols.tail: _*)
    val bandCols = (0 until bands).map { b =>
      struct(lit(b).as("band"),
        xxhash64((0 until rowsPerBand).map(r => col(s"h${b * rowsPerBand + r}")): _*)
          .as("band_hash"))
    }
    sig.select(col("doc_id"), explode(array(bandCols: _*)).as("bb"))
      .select(col("doc_id"), col("bb.band").as("band"),
        col("bb.band_hash").as("band_hash"))
  }

  /** MinHash-LSH near-dup pairs with exact Jaccard verification: bucket
    * self-join proposes candidates; only those pairs pay the exact shingle
    * intersection. Standard LSH recall caveat applies (tunable via
    * perms/bands); the exact `ngramJaccardPairs` is the semantic oracle.
    */
  def minhashLshPairs(docs: DataFrame, n: Int = 3, threshold: Double = 0.7,
      numPerms: Int = 16, bands: Int = 4): DataFrame = {
    val bb = minhashBands(docs, n, numPerms, bands)
    val cand = bb.as("x").join(bb.as("y"),
        col("x.band") === col("y.band") &&
          col("x.band_hash") === col("y.band_hash") &&
          col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id").as("a"), col("y.doc_id").as("b"))
      .distinct()
    // exact verification restricted to candidates
    val sh = shingles(docs, n).cache()
    val cnt = sh.groupBy("doc_id").agg(count(lit(1)).as("n"))
    cand
      .join(sh.toDF("a", "shingle"), Seq("a"))
      .join(sh.toDF("b", "shingle"), Seq("b", "shingle"))
      .groupBy("a", "b").agg(count(lit(1)).as("c"))
      .join(cnt.select(col("doc_id").as("a"), col("n").as("na")), Seq("a"))
      .join(cnt.select(col("doc_id").as("b"), col("n").as("nb")), Seq("b"))
      .withColumn("jac", col("c").cast("double") / (col("na") + col("nb") - col("c")))
      .where(col("jac") >= threshold)
      .select("a", "b", "jac")
  }

  // --------------------------------------------------------------- SimHash

  /** 64-bit SimHash document fingerprint: per-token xxhash64, bitwise
    * majority vote. Near-dups have small Hamming distance. Pure column
    * arithmetic (bit tricks over an exploded token stream).
    */
  def simhash(docs: DataFrame): DataFrame = {
    val tok = docs.select(col("doc_id"),
      explode(split(col("text"), " ")).as("tok"))
      .withColumn("h", xxhash64(col("tok")))
    val bitCols = (0 until 64).map { b =>
      sum(when(shiftright(col("h"), b).bitwiseAND(lit(1L)) === 1L, 1L)
        .otherwise(-1L)).as(s"b$b")
    }
    val agg = tok.groupBy("doc_id").agg(bitCols.head, bitCols.tail: _*)
    val fp = (0 until 64).map(b =>
      when(col(s"b$b") > 0, shiftleft(lit(1L), b)).otherwise(lit(0L)))
      .reduce(_.bitwiseOR(_))
    agg.select(col("doc_id"), fp.as("simhash"))
  }

  // ----------------------------------------------------------- text stats

  /** Token/char statistics with integer-exact arithmetic (space counting —
    * identical in any SQL engine; documents are single-space tokenized).
    */
  def tokenStats(docs: DataFrame): DataFrame = {
    val chars = length(col("text"))
    val spaces = chars - length(regexp_replace(col("text"), " ", ""))
    docs.select(col("doc_id"),
      chars.cast("long").as("n_chars"),
      (spaces + lit(1)).cast("long").as("n_tokens"))
  }

  /** Quality scores: exact integer counts plus IEEE-exact ratios. */
  def textQuality(docs: DataFrame): DataFrame = {
    val chars = length(col("text")).cast("long")
    val spaces = (length(col("text")) -
      length(regexp_replace(col("text"), " ", ""))).cast("long")
    val tokens = spaces + lit(1L)
    val theCnt = ((length(col("text")) -
      length(regexp_replace(col("text"), "the", ""))) / lit(3)).cast("long")
    docs.select(col("doc_id"),
      chars.as("n_chars"), tokens.as("n_tokens"),
      ((chars - spaces).cast("double") / tokens).as("avg_tok_len"),
      (theCnt.cast("double") / tokens).as("stop_ratio"))
  }

  /** Language-ID by stopword-profile voting (n-gram-free heuristic: score
    * each language by hits from a tiny characteristic-word list; argmax with
    * lexicographic tiebreak). Deterministic; a real model would slot in at
    * the same typed-map seam.
    */
  val langProfiles: Map[String, Set[String]] = Map(
    "en" -> Set("the", "and", "of", "to", "a", "in"),
    "de" -> Set("der", "die", "das", "und", "ist"),
    "fr" -> Set("le", "la", "et", "les", "des"),
    "es" -> Set("el", "la", "los", "que", "y"))

  def langId(docs: DataFrame): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select("doc_id", "text").as[(Long, String)].map { case (id, text) =>
      val toks = text.split(' ')
      val scores = langProfiles.toSeq.sortBy(_._1).map { case (lang, ws) =>
        (lang, toks.count(ws.contains))
      }
      val best = scores.maxBy(s => (s._2, s._1))._1
      (id, best)
    }.toDF("doc_id", "pred_lang")
  }

  /** The composed training-corpus cleaner — the end-to-end shape a 100 TB
    * text pipeline runs nightly: exact dedup (content hash, keep min id) →
    * near-dup removal (MinHash-LSH candidates, exact-verified, keep the
    * smaller id of each pair) → quality gates (length + token bounds) →
    * language allowlist. Every stage is a narrow-key shuffle or a filter;
    * text travels untouched (the byte-identity invariant applies to the
    * survivors).
    */
  def cleanCorpus(
      docs: DataFrame,
      minChars: Int = 50,
      minTokens: Int = 8,
      maxAvgTokLen: Double = 12.0,
      nearDupThreshold: Double = 0.9,
      langs: Seq[String] = Seq.empty): DataFrame = {
    // 1. exact dedup: keep the min doc_id of every identical-text group
    val keepers = exactDupGroups(docs).select(col("keeper").as("doc_id"))
    val exactDeduped = docs.join(keepers, Seq("doc_id"), "left_semi")
    // 2. near-dup removal: drop the larger id of each verified pair.
    // 32 perms / 8 bands of 4: P(miss) at J=0.9 is (1-0.9^4)^8 ≈ 2e-4 —
    // the 16/4 default misses ~1.4% of strong pairs, which a cleaner
    // cannot afford.
    val losers = minhashLshPairs(exactDeduped, threshold = nearDupThreshold,
        numPerms = 32, bands = 8)
      .select(col("b").as("doc_id")).distinct()
    val nearDeduped = exactDeduped.join(losers, Seq("doc_id"), "left_anti")
    // 3. quality gates
    val q = textQuality(nearDeduped).where(
      col("n_chars") >= minChars && col("n_tokens") >= minTokens &&
        col("avg_tok_len") <= maxAvgTokLen)
      .select("doc_id")
    val qualified = nearDeduped.join(q, Seq("doc_id"), "left_semi")
    // 4. language allowlist (empty = keep all)
    if (langs.isEmpty) qualified
    else qualified.where(col("lang").isin(langs: _*))
  }

  // ------------------------------------------------------------------ ANN

  /** Brute-force top-k inner-product search with floor-scaled integer
    * arithmetic — bit-exact in any engine, so it carries the DuckDB oracle.
    * `queries` rows are flagged by a predicate on vec_id; ranking tiebreak
    * is (dot DESC, id).
    */
  def annTopKInt(emb: DataFrame, nQueries: Int, k: Int): DataFrame = {
    val qe = emb.where(col("vec_id") < nQueries)
      .select(col("vec_id").as("qid"),
        transform(col("embedding"), x =>
          floor(x.cast("double") * lit(1000.0)).cast("long")).as("qe"))
    val de = emb.select(col("vec_id").as("id"),
      transform(col("embedding"), x =>
        floor(x.cast("double") * lit(1000.0)).cast("long")).as("de"))
    val dot = aggregate(
      zip_with(col("qe"), col("de"), (a, b) => a * b),
      lit(0L), (acc, x) => acc + x)
    val w = Window.partitionBy("qid").orderBy(col("dot").desc, col("id"))
    qe.crossJoin(de)
      .select(col("qid"), col("id"), dot.as("dot"))
      .withColumn("rn", row_number().over(w).cast("long"))
      .where(col("rn") <= k)
  }

  /** Brute-force cosine top-k (float path, rows-only check): exact ranking
    * for the data at hand; the IEEE-sum order is fixed (array order) but not
    * oracle-portable.
    */
  def annCosine(emb: DataFrame, nQueries: Int, k: Int): DataFrame = {
    def norm(v: Column): Column =
      sqrt(aggregate(v, lit(0.0d), (acc, x) =>
        acc + x.cast("double") * x.cast("double")))
    val qe = emb.where(col("vec_id") < nQueries)
      .select(col("vec_id").as("qid"), col("embedding").as("qe"),
        norm(col("embedding")).as("qn"))
    val de = emb.select(col("vec_id").as("id"), col("embedding").as("de"),
      norm(col("embedding")).as("dn"))
    val dot = aggregate(zip_with(col("qe"), col("de"),
      (a, b) => a.cast("double") * b.cast("double")), lit(0.0d), (acc, x) => acc + x)
    val w = Window.partitionBy("qid").orderBy(col("cos").desc, col("id"))
    qe.crossJoin(de)
      .select(col("qid"), col("id"),
        (dot / (col("qn") * col("dn"))).as("cos"))
      .withColumn("rn", row_number().over(w).cast("long"))
      .where(col("rn") <= k)
  }

  /** Scale path: random-hyperplane LSH (vector SimHash). Each vector gets a
    * `nBits`-bit bucket from sign(v · h_i) against deterministic pseudo-
    * random hyperplanes; probing is restricted to same-bucket vectors, so
    * the pair blowup is bounded by bucket occupancy — the 100 TB answer to
    * the brute-force crossJoin. (IVF would slot in the same way with
    * k-means centroids instead of hyperplanes.)
    */
  def annLshBuckets(emb: DataFrame, nBits: Int = 8): DataFrame = {
    // hyperplane j, component i: xxhash64(j, i) scaled to [-1, 1)
    // (no raw multiplies — ANSI mode treats wrap-around as overflow)
    def comp(j: Int, i: Column): Column =
      xxhash64(lit(j), i).cast("double") / lit(9.223372036854776e18)
    val dims = sequence(lit(0), size(col("embedding")) - 1)
    val bits = (0 until nBits).map { j =>
      val dot = aggregate(
        zip_with(col("embedding"), dims, (x, i) => x.cast("double") * comp(j, i)),
        lit(0.0d), (acc, x) => acc + x)
      when(dot >= 0, shiftleft(lit(1L), j)).otherwise(lit(0L))
    }
    emb.select(col("vec_id"), bits.reduce(_.bitwiseOR(_)).as("bucket"))
  }
}
