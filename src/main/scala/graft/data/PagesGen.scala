package graft.data

import org.apache.spark.sql.{Column, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Deterministic synthesis of the Common-Crawl-shaped `pages` input table
  * (BASELINE.json `input_hint`: url, warc_ts, html, text, lang) plus the
  * secondary tile / POI layers (FIXTURES.md §2-3). No external data, no
  * wall-clock, no RNG state: every field is a pure function of the row id
  * via SplitMix64, and `text` is a pure function of `url` — which makes the
  * north-rule invariant (byte-identical extracted text per url) checkable
  * end-to-end.
  *
  * Geo-entities are printf-encoded into `text` as `@geo(lon,lat)` markers
  * with 5 decimals; extraction (`PagesGen.entities`) parses them back with
  * Spark built-ins only. A configurable share of entities is drawn from a
  * handful of "urban" hot spots to exercise the hot-cell skew path
  * (north_rule: salted cell-split repartitioning + AQE).
  */
object PagesGen {

  final case class Page(
      url: String,
      warc_ts: java.sql.Timestamp,
      html: Array[Byte],
      text: String,
      lang: String)

  final case class Tile(
      tile_id: Long, minX: Double, minY: Double, maxX: Double, maxY: Double,
      name: String)

  final case class Poi(poi_id: Long, lon: Double, lat: Double, name: String)

  /** SplitMix64 (public domain; Steele, Lea, Flood — JDK SplittableRandom). */
  def splitmix64(seed: Long): Long = {
    var z = seed + 0x9e3779b97f4a7c15L
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z ^ (z >>> 31)
  }
  def uniform(seed: Long, i: Long): Double =
    (splitmix64(seed * 0x100000001b3L + i) >>> 11).toDouble / (1L << 53).toDouble

  private val langs = Array("en", "de", "fr", "es", "zh", "ru", "pt", "ja")
  private val words = Array(
    "the", "crawl", "page", "links", "to", "a", "market", "and", "harbor",
    "with", "old", "streets", "near", "river", "district", "museum", "of",
    "city", "data", "web")

  /** Hot spots: (lon, lat) of five dense "urban" centers. */
  val urbanCenters: Array[(Double, Double)] = Array(
    (13.40495, 52.52001),   // Berlin-ish
    (-74.00597, 40.71278),  // NYC-ish
    (139.69171, 35.68949),  // Tokyo-ish
    (2.35222, 48.85661),    // Paris-ish
    (-0.12776, 51.50735))   // London-ish

  /** The page text for row `id` — the single source of truth, used by both
    * the generator and tests. Byte-identical regeneration from the id
    * encoded in the url is the per-row invariant.
    */
  def textFor(id: Long, skewShare: Double): String = {
    val sb = new java.lang.StringBuilder(160)
    val nWords = 8 + (splitmix64(id * 31 + 1) & 15).toInt
    var w = 0
    while (w < nWords) {
      if (w > 0) sb.append(' ')
      sb.append(words((splitmix64(id * 31 + 2 + w) & 0x7fffffff).toInt % words.length))
      w += 1
    }
    val nEntities = (splitmix64(id * 31 + 19) & 3).toInt // 0..3
    var e = 0
    while (e < nEntities) {
      val hot = uniform(id, 100 + 3 * e) < skewShare
      val (lon, lat) =
        if (hot) {
          val c = urbanCenters(
            (splitmix64(id * 31 + 23 + e) & 0x7fffffff).toInt % urbanCenters.length)
          (c._1 + (uniform(id, 101 + 3 * e) - 0.5) * 0.2,
            c._2 + (uniform(id, 102 + 3 * e) - 0.5) * 0.2)
        } else {
          (uniform(id, 101 + 3 * e) * 360.0 - 180.0,
            uniform(id, 102 + 3 * e) * 170.0 - 85.0)
        }
      sb.append(" @geo(")
        .append(f"$lon%.5f").append(',').append(f"$lat%.5f").append(')')
      e += 1
    }
    sb.toString
  }

  def pageFor(id: Long, skewShare: Double): Page = {
    val text = textFor(id, skewShare)
    Page(
      url = s"https://site-${splitmix64(id) >>> 48}.example/$id",
      warc_ts = new java.sql.Timestamp(1735689600000L + id * 1000L),
      html = ("<html><body>" + text + "</body></html>")
        .getBytes(java.nio.charset.StandardCharsets.UTF_8),
      text = text,
      lang = langs((splitmix64(id * 31 + 5) & 0x7fffffff).toInt % langs.length))
  }

  /** Row id encoded in the url — lets tests regenerate `text` from `url`
    * alone and compare byte-for-byte.
    */
  def idFromUrl(url: String): Long = url.substring(url.lastIndexOf('/') + 1).toLong

  def pages(spark: SparkSession, n: Long, skewShare: Double = 0.3,
      partitions: Int = 0): Dataset[Page] = {
    import spark.implicits._
    val base = if (partitions > 0) spark.range(0, n, 1, partitions)
      else spark.range(n)
    base.map(id => pageFor(id, skewShare))
  }

  /** Extracted geo-entities as `array<struct<lon,lat,kind>>` — Spark
    * built-ins only (`regexp_extract_all` + split + cast), fully codegen.
    * Parsing "%.5f"-printed decimals back to double is deterministic.
    */
  def entities(text: Column): Column =
    transform(
      regexp_extract_all(text, lit("@geo\\(([-0-9.]+),([-0-9.]+)\\)"), lit(0)),
      m => struct(
        split(regexp_replace(m, "@geo\\(|\\)", ""), ",")(0)
          .cast("double").as("lon"),
        split(regexp_replace(m, "@geo\\(|\\)", ""), ",")(1)
          .cast("double").as("lat"),
        lit("geo").as("kind")))

  /** Rectangle layer for the pairwise spatial join (J1) / PIP (F3);
    * `Rectangle` semantics per rstar/src/primitives/rectangle.rs:17-22.
    */
  def tiles(spark: SparkSession, n: Long, maxW: Double = 2.0): Dataset[Tile] = {
    import spark.implicits._
    spark.range(n).map { id =>
      val lon = uniform(id + 7, 1) * 360.0 - 180.0
      val lat = uniform(id + 7, 2) * 170.0 - 85.0
      val w = uniform(id + 7, 3) * maxW + 0.05
      val h = uniform(id + 7, 4) * maxW + 0.05
      Tile(id, lon, lat, math.min(lon + w, 180.0), math.min(lat + h, 85.0),
        s"tile-$id")
    }
  }

  /** Point layer for kNN joins (K1-K3). */
  def pois(spark: SparkSession, n: Long): Dataset[Poi] = {
    import spark.implicits._
    spark.range(n).map { id =>
      Poi(id,
        uniform(id + 13, 1) * 360.0 - 180.0,
        uniform(id + 13, 2) * 170.0 - 85.0,
        s"poi-$id")
    }
  }
}
