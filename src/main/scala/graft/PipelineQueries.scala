package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.pipeline.{MediaOps, PipelineOps}
import TpchGeo.load

/** Training-data-pipeline operators exposed through SparkEntry, over the
  * driver's `documents` / `embeddings` / `events` tables. Oracle-carrying
  * entries use integer-exact or IEEE-exact arithmetic only; hash-dependent
  * scale paths (MinHash/SimHash/LSH — xxhash64 has no DuckDB twin) are
  * checked rows-only by the driver and cross-checked against their exact
  * counterparts in PipelineSpec.
  */
object PipelineQueries {

  // ------------------------------------------------------------- dedup

  def dedupExact(spark: SparkSession, dir: String): DataFrame =
    PipelineOps.exactDupGroups(load(spark, dir, "documents")).orderBy("h")

  val dedupExactSql: String =
    """SELECT md5(text) AS h, MIN(doc_id) AS keeper, COUNT(*) AS dup_cnt
      |FROM documents GROUP BY md5(text) ORDER BY h""".stripMargin

  def ngramDup(spark: SparkSession, dir: String): DataFrame =
    PipelineOps.ngramJaccardPairs(load(spark, dir, "documents"), 3, 0.7)
      .orderBy("a", "b")

  val ngramDupSql: String =
    """WITH t AS (SELECT doc_id, string_split(text, ' ') AS l FROM documents
      |           WHERE len(string_split(text, ' ')) >= 3),
      |sh AS (SELECT DISTINCT doc_id,
      |  unnest(list_transform(range(1, len(l) - 1),
      |    i -> l[i] || ' ' || l[i+1] || ' ' || l[i+2])) AS shingle FROM t),
      |cnt AS (SELECT doc_id, COUNT(*) AS n FROM sh GROUP BY doc_id),
      |inter AS (SELECT x.doc_id AS a, y.doc_id AS b, COUNT(*) AS c
      |  FROM sh x JOIN sh y ON x.shingle = y.shingle AND x.doc_id < y.doc_id
      |  GROUP BY x.doc_id, y.doc_id)
      |SELECT i.a, i.b, CAST(i.c AS DOUBLE) / (ca.n + cb.n - i.c) AS jac
      |FROM inter i JOIN cnt ca ON ca.doc_id = i.a JOIN cnt cb ON cb.doc_id = i.b
      |WHERE CAST(i.c AS DOUBLE) / (ca.n + cb.n - i.c) >= 0.7
      |ORDER BY a, b""".stripMargin

  def minhashDup(spark: SparkSession, dir: String): DataFrame =
    PipelineOps.minhashLshPairs(load(spark, dir, "documents"), 3, 0.7)
      .orderBy("a", "b")

  def simhash(spark: SparkSession, dir: String): DataFrame =
    PipelineOps.simhash(load(spark, dir, "documents")).orderBy("doc_id")

  /** Composed corpus cleaner (rows-only check: the near-dup stage is
    * xxhash-based). Deterministic output ordering by doc_id.
    */
  def cleanCorpus(spark: SparkSession, dir: String): DataFrame =
    PipelineOps.cleanCorpus(load(spark, dir, "documents"),
      langs = Seq("en", "de", "fr", "es"))
      .select("doc_id", "lang", "n_chars")
      .orderBy("doc_id")

  // --------------------------------------------------------- text stats

  def tokenStats(spark: SparkSession, dir: String): DataFrame =
    PipelineOps.tokenStats(load(spark, dir, "documents")).orderBy("doc_id")

  val tokenStatsSql: String =
    """SELECT doc_id, CAST(LENGTH(text) AS BIGINT) AS n_chars,
      | CAST(LENGTH(text) - LENGTH(REPLACE(text, ' ', '')) + 1 AS BIGINT) AS n_tokens
      |FROM documents ORDER BY doc_id""".stripMargin

  def textQuality(spark: SparkSession, dir: String): DataFrame =
    PipelineOps.textQuality(load(spark, dir, "documents")).orderBy("doc_id")

  val textQualitySql: String =
    """WITH s AS (SELECT doc_id,
      |  CAST(LENGTH(text) AS BIGINT) AS chars,
      |  CAST(LENGTH(text) - LENGTH(REPLACE(text, ' ', '')) AS BIGINT) AS spaces,
      |  CAST((LENGTH(text) - LENGTH(REPLACE(text, 'the', ''))) / 3 AS BIGINT) AS the_cnt
      |  FROM documents)
      |SELECT doc_id, chars AS n_chars, spaces + 1 AS n_tokens,
      |  CAST(chars - spaces AS DOUBLE) / (spaces + 1) AS avg_tok_len,
      |  CAST(the_cnt AS DOUBLE) / (spaces + 1) AS stop_ratio
      |FROM s ORDER BY doc_id""".stripMargin

  def langId(spark: SparkSession, dir: String): DataFrame =
    PipelineOps.langId(load(spark, dir, "documents")).orderBy("doc_id")

  // --------------------------------------------------------------- ANN

  def annTopK(spark: SparkSession, dir: String): DataFrame =
    PipelineOps.annTopKInt(load(spark, dir, "embeddings"), nQueries = 10, k = 10)
      .orderBy("qid", "rn")

  val annTopKSql: String =
    """WITH q AS (SELECT vec_id AS qid,
      |  list_transform(embedding, x -> CAST(FLOOR(CAST(x AS DOUBLE) * 1000.0) AS BIGINT)) AS qe
      |  FROM embeddings WHERE vec_id < 10),
      |d AS (SELECT vec_id AS id,
      |  list_transform(embedding, x -> CAST(FLOOR(CAST(x AS DOUBLE) * 1000.0) AS BIGINT)) AS de
      |  FROM embeddings),
      |j AS (SELECT q.qid, d.id,
      |  CAST(list_sum(list_transform(list_zip(q.qe, d.de), p -> p[1] * p[2])) AS BIGINT) AS dot
      |  FROM q CROSS JOIN d),
      |r AS (SELECT qid, id, dot,
      |  ROW_NUMBER() OVER (PARTITION BY qid ORDER BY dot DESC, id) AS rn FROM j)
      |SELECT qid, id, dot, CAST(rn AS BIGINT) AS rn FROM r WHERE rn <= 10
      |ORDER BY qid, rn""".stripMargin

  /** Embedding-cosine near-duplicate pairs, integer-exact: pairs (a < b)
    * whose floor-scaled dot product clears the threshold (the int dot is a
    * monotone proxy for cosine on these unit-ish vectors; the float-cosine
    * variant is `annCosine`). Brute force here; the LSH-bucketed path
    * (`annLsh`) is the 100 TB candidate generator.
    */
  def embedDup(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    // Brute-force baseline with the n² collapsed into primitive loops:
    // broadcast the floor-scaled vectors (a baseline op — LSH buckets are
    // the at-scale candidate generator), distribute the outer side, fused
    // integer dot per pair. Same exact output as the crossJoin/zip_with
    // formulation, ~20x less per-pair overhead.
    val vecs: Array[(Long, Array[Long])] =
      load(spark, dir, "embeddings").select(col("vec_id"),
        transform(col("embedding"), x =>
          floor(x.cast("double") * lit(1000.0)).cast("long")).as("v"))
        .as[(Long, Array[Long])].collect().sortBy(_._1)
    val vecsB = spark.sparkContext.broadcast(vecs)
    spark.range(vecs.length).as[Long].mapPartitions { it =>
      val vs = vecsB.value
      it.flatMap { ai =>
        val i = ai.toInt
        val (aId, av) = vs(i)
        (i + 1 until vs.length).iterator.flatMap { j =>
          val (bId, bv) = vs(j)
          var dot = 0L
          var d = 0
          while (d < av.length) { dot += av(d) * bv(d); d += 1 }
          if (dot >= 450000L) {
            val (lo, hi) = if (aId < bId) (aId, bId) else (bId, aId)
            Some((lo, hi, dot))
          } else None
        }
      }
    }.toDF("a", "b", "dot")
      .orderBy("a", "b")
  }

  val embedDupSql: String =
    """WITH e AS (SELECT vec_id,
      |  list_transform(embedding, x -> CAST(FLOOR(CAST(x AS DOUBLE) * 1000.0) AS BIGINT)) AS v
      |  FROM embeddings)
      |SELECT a.vec_id AS a, b.vec_id AS b,
      |  CAST(list_sum(list_transform(list_zip(a.v, b.v), p -> p[1] * p[2])) AS BIGINT) AS dot
      |FROM e a JOIN e b ON a.vec_id < b.vec_id
      |WHERE CAST(list_sum(list_transform(list_zip(a.v, b.v), p -> p[1] * p[2])) AS BIGINT) >= 450000
      |ORDER BY a, b""".stripMargin

  def annCosine(spark: SparkSession, dir: String): DataFrame =
    PipelineOps.annCosine(load(spark, dir, "embeddings"), nQueries = 10, k = 10)
      .orderBy("qid", "rn")

  def annLsh(spark: SparkSession, dir: String): DataFrame =
    PipelineOps.annLshBuckets(load(spark, dir, "embeddings")).orderBy("vec_id")

  // ------------------------------------------------------------- events

  def eventsWindow(spark: SparkSession, dir: String): DataFrame =
    load(spark, dir, "events")
      .groupBy(date_trunc("hour", col("ts")).as("hour"), col("event_type"))
      .agg(count(lit(1)).as("cnt"),
        min("value").as("min_v"), max("value").as("max_v"))
      .orderBy("hour", "event_type")

  val eventsWindowSql: String =
    """SELECT date_trunc('hour', ts) AS hour, event_type, COUNT(*) AS cnt,
      | MIN(value) AS min_v, MAX(value) AS max_v
      |FROM events GROUP BY date_trunc('hour', ts), event_type
      |ORDER BY hour, event_type""".stripMargin

  // -------------------------------------------------------- multimodal

  /** Column-tier media stats (binary payload derived from text); the typed
    * mapPartitions decode path is exercised in PipelineSpec.
    */
  def mediaMeta(spark: SparkSession, dir: String): DataFrame =
    load(spark, dir, "documents")
      .select(col("lang"),
        length(encode(col("text"), "UTF-8")).cast("long").as("b"))
      .groupBy("lang")
      .agg(count(lit(1)).as("cnt"),
        sum(lit(320L) + col("b") % 320L).as("sum_w"),
        sum(lit(240L) + col("b") % 240L).as("sum_h"))
      .orderBy("lang")

  val mediaMetaSql: String =
    """WITH m AS (SELECT lang, CAST(OCTET_LENGTH(ENCODE(text)) AS BIGINT) AS b
      |           FROM documents)
      |SELECT lang, COUNT(*) AS cnt, CAST(SUM(320 + b % 320) AS BIGINT) AS sum_w,
      | CAST(SUM(240 + b % 240) AS BIGINT) AS sum_h
      |FROM m GROUP BY lang ORDER BY lang""".stripMargin
}
