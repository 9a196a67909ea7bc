package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Deterministic derived geometry over the driver's TPC-H-ish tables
  * (TESTDATA.md): numeric keys → coordinates via modular arithmetic that is
  * expressible identically in Spark Columns and ANSI SQL (DuckDB oracle).
  * Only IEEE-exact ops (+,-,*,/, %) in identical order on both sides, so
  * result doubles are bit-identical — never pow/ln/trig, whose libm
  * rounding may differ between engines (FIXTURES.md §4).
  *
  * The Scala column builders and the SQL snippet builders below are kept in
  * lockstep; every SparkEntry oracle is generated from the same snippets.
  */
object TpchGeo {
  val M1 = 2654435761L // Knuth multiplicative hash constants / large primes
  val M2 = 2246822519L
  val M3 = 1099511628211L
  val M4 = 179424673L
  val M5 = 694847539L
  val M6 = 2860486313L
  val P = 1000003L
  val PW = 997L

  // Reduce the key mod P BEFORE multiplying (identical value by modular
  // arithmetic, since (k·m) mod P = ((k mod P)·m) mod P): keeps the product
  // ≤ (P-1)·M3 ≈ 1.1e18 < Long.MaxValue for ANY key, where the unreduced
  // form silently wraps in Spark / errors in DuckDB past key ≈ 3.5e9
  // (large scale factors).
  private def frac(key: Column, m: Long): Column =
    (key % lit(P) * lit(m) % lit(P)) / lit(P.toDouble)
  private def fracSql(key: String, m: Long): String =
    s"(($key % $P * $m % $P) / $P.0)"

  /** Point coordinates for a key column (data side). */
  def px(key: Column): Column = frac(key, M1) * lit(360.0) - lit(180.0)
  def py(key: Column): Column = frac(key, M2) * lit(170.0) - lit(85.0)
  def pxSql(key: String): String = s"(${fracSql(key, M1)} * 360.0 - 180.0)"
  def pySql(key: String): String = s"(${fracSql(key, M2)} * 170.0 - 85.0)"

  /** Unit-interval coordinate in [0,1) for the n-dim tier (3-D kNN over
    * CellGridN.unit): pick per-axis multipliers from M1..M6 so data and
    * query layouts are independent.
    */
  def u3(key: Column, m: Long): Column = frac(key, m)
  def u3Sql(key: String, m: Long): String = fracSql(key, m)

  /** Query-point coordinates (different multipliers, independent layout). */
  def qx(key: Column): Column = frac(key, M3) * lit(360.0) - lit(180.0)
  def qy(key: Column): Column = frac(key, M4) * lit(170.0) - lit(85.0)
  def qxSql(key: String): String = s"(${fracSql(key, M3)} * 360.0 - 180.0)"
  def qySql(key: String): String = s"(${fracSql(key, M4)} * 170.0 - 85.0)"

  /** Rectangle for a key column: lower corner + width/height in [0, 10). */
  def rMinX(key: Column): Column = frac(key, M1) * lit(350.0) - lit(180.0)
  def rMinY(key: Column): Column = frac(key, M2) * lit(160.0) - lit(85.0)
  def rW(key: Column): Column =
    (key % lit(PW) * lit(M3) % lit(PW)) / lit(PW.toDouble) * lit(10.0)
  def rH(key: Column): Column =
    (key % lit(PW) * lit(M4) % lit(PW)) / lit(PW.toDouble) * lit(10.0)
  def rMinXSql(key: String): String = s"(${fracSql(key, M1)} * 350.0 - 180.0)"
  def rMinYSql(key: String): String = s"(${fracSql(key, M2)} * 160.0 - 85.0)"
  def rWSql(key: String): String = s"(($key % $PW * $M3 % $PW) / $PW.0 * 10.0)"
  def rHSql(key: String): String = s"(($key % $PW * $M4 % $PW) / $PW.0 * 10.0)"

  /** SQL CTE body producing (id, min_x, min_y, max_x, max_y) rects. */
  def rectsSql(table: String, key: String): String =
    s"""SELECT $key AS id, ${rMinXSql(key)} AS min_x, ${rMinYSql(key)} AS min_y,
       | ${rMinXSql(key)} + ${rWSql(key)} AS max_x,
       | ${rMinYSql(key)} + ${rHSql(key)} AS max_y FROM $table""".stripMargin

  /** Spark twin of [[rectsSql]]. */
  def rects(df: DataFrame, key: String): DataFrame =
    df.select(
      col(key).as("id"),
      rMinX(col(key)).as("min_x"), rMinY(col(key)).as("min_y"),
      (rMinX(col(key)) + rW(col(key))).as("max_x"),
      (rMinY(col(key)) + rH(col(key))).as("max_y"))

  def pointsSql(table: String, key: String): String =
    s"SELECT $key AS id, ${pxSql(key)} AS x, ${pySql(key)} AS y FROM $table"

  def points(df: DataFrame, key: String): DataFrame =
    df.select(col(key).as("id"),
      px(col(key)).as("x"), py(col(key)).as("y"))

  def load(spark: SparkSession, dir: String, table: String): DataFrame =
    spark.read.parquet(s"$dir/$table.parquet")

  // -------------------------------------------------- polygon layer (PIP)

  /** Unit-octagon vertex offsets (cos/sin of 2πi/8), fixed Scala doubles
    * baked as exact literals into BOTH plans (the OracleHash pattern —
    * never evaluate libm inside either engine). Consecutive uy values
    * always differ, so every ray-cast edge has a nonzero y-span and the
    * division in the crossing test can never hit zero (ANSI-safe).
    */
  val polyUx: Array[Double] = {
    val r = math.sqrt(2.0) / 2.0
    Array(1.0, r, 0.0, -r, -1.0, -r, 0.0, r)
  }
  val polyUy: Array[Double] = {
    val r = math.sqrt(2.0) / 2.0
    Array(0.0, r, 1.0, r, 0.0, -r, -1.0, -r)
  }

  /** Octagon polygon layer for a key column: center = point coords, radii
    * from the rect width/height (+0.01 keeps them nondegenerate). Columns:
    * id, px1..px8, py1..py8 — scalar columns, not arrays, so the PIP
    * predicate stays in plain whole-stage codegen.
    */
  def polygons(df: DataFrame, key: String): DataFrame = {
    val k = col(key)
    val cx = px(k); val cy = py(k)
    val rx = rW(k) + lit(0.01); val ry = rH(k) + lit(0.01)
    val cols = (0 until 8).flatMap { i =>
      Seq((cx + rx * lit(polyUx(i))).as(s"px${i + 1}"),
        (cy + ry * lit(polyUy(i))).as(s"py${i + 1}"))
    }
    df.select(k.as("id") +: cols: _*)
  }

  /** SQL twin of [[polygons]]. */
  def polygonsSql(table: String, key: String): String = {
    import graft.functions.OracleHash.dbl
    val cx = pxSql(key); val cy = pySql(key)
    val rx = s"(${rWSql(key)} + 0.01)"; val ry = s"(${rHSql(key)} + 0.01)"
    val cols = (0 until 8).flatMap { i =>
      Seq(s"$cx + $rx * ${dbl(polyUx(i))} AS px${i + 1}",
        s"$cy + $ry * ${dbl(polyUy(i))} AS py${i + 1}")
    }
    s"SELECT $key AS id, ${cols.mkString(",\n  ")} FROM $table"
  }

  // --------------------------------- variable-vertex polygon layer (PIP)

  /** Unit k-gon vertex offsets for k = 3..10 — cos/sin of 2πi/k + θ0
    * computed ONCE in Scala and baked as exact double literals into both
    * plans (the octagon pattern generalized). The small per-k rotation
    * θ0 = 0.5/k guarantees NO horizontal edge (consecutive uy always
    * differ, checked below), so the ray-cast crossing division can never
    * see a zero denominator in either engine regardless of conjunct
    * evaluation order.
    */
  val polyNUnit: Map[Int, (Array[Double], Array[Double])] =
    (3 to 10).map { k =>
      val th0 = 0.5 / k
      val ux = Array.tabulate(k)(i => math.cos(2.0 * math.Pi * i / k + th0))
      val uy = Array.tabulate(k)(i => math.sin(2.0 * math.Pi * i / k + th0))
      (0 until k).foreach { i =>
        val j = (i + k - 1) % k
        require(math.abs(uy(i) - uy(j)) > 1e-9,
          s"horizontal edge in unit $k-gon")
      }
      k -> (ux, uy)
    }.toMap

  /** Variable-vertex polygon layer: k = key % 8 + 3 vertices (3..10),
    * center/radii from the shared point/rect arithmetic, vertex ARRAYS
    * (pxs, pys) instead of scalar columns — the general shape a real
    * polygon layer has. Columns: id, k, pxs, pys.
    */
  def polygonsN(df: DataFrame, key: String): DataFrame = {
    val kcol = col(key)
    val cx = px(kcol); val cy = py(kcol)
    val rx = rW(kcol) + lit(0.01); val ry = rH(kcol) + lit(0.01)
    val k = (kcol.cast("long") % 8 + 3).cast("int")
    def vertArr(unit: Int => Array[Double], c: Column, r: Column) = {
      val branches = (3 to 10).map { kk =>
        kk -> array(unit(kk).map(o => c + r * lit(o)): _*)
      }
      branches.tail.foldLeft(when(k === branches.head._1, branches.head._2)) {
        case (acc, (kk, arr)) => acc.when(k === kk, arr)
      }
    }
    df.select(kcol.as("id"), k.as("k"),
      vertArr(kk => polyNUnit(kk)._1, cx, rx).as("pxs"),
      vertArr(kk => polyNUnit(kk)._2, cy, ry).as("pys"))
  }

  /** SQL twin of [[polygonsN]]. */
  def polygonsNSql(table: String, key: String): String = {
    import graft.functions.OracleHash.dbl
    val cx = pxSql(key); val cy = pySql(key)
    val rx = s"(${rWSql(key)} + 0.01)"; val ry = s"(${rHSql(key)} + 0.01)"
    def vertCase(unit: Int => Array[Double], c: String, r: String) = {
      val branches = (3 to 10).map { kk =>
        val elems = unit(kk).map(o => s"$c + $r * ${dbl(o)}").mkString(", ")
        s"WHEN $kk THEN [$elems]"
      }.mkString("\n    ")
      s"CASE (CAST($key AS BIGINT) % 8 + 3)\n    $branches END"
    }
    s"""SELECT $key AS id, CAST(CAST($key AS BIGINT) % 8 + 3 AS INT) AS k,
       |  ${vertCase(kk => polyNUnit(kk)._1, cx, rx)} AS pxs,
       |  ${vertCase(kk => polyNUnit(kk)._2, cy, ry)} AS pys
       |FROM $table""".stripMargin
  }
}
