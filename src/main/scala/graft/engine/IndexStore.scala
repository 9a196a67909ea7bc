package graft.engine

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, ObjectInputStream, ObjectOutputStream}

import org.apache.hadoop.fs.{FileSystem, Path => HPath}
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

import graft.index.{CellGrid, PointRTree2D}

/** Persisted two-level index — C5 (serde/persist) at scale. The driver
  * grid's per-cell packed trees are serialized into a `(cell BIGINT,
  * n BIGINT, tree BINARY)` table, committed group-by-group through
  * [[Checkpoint]] (kill/resume at group granularity, per-group lineage),
  * and PROBED from the stored bytes — queries deserialize and descend, they
  * never rebuild. At 100 TB, rebuilding every per-cell tree per query job
  * is a large standing tax; this table is the standing index.
  *
  * Reference: rstar's serde feature persists the whole R-tree structure and
  * round-trips it (rstar/src/rtree.rs:171-179, test :1289-1305); here the
  * unit of persistence is the per-cell tree, because the cell grid is the
  * distribution layer (SURVEY §2.1 maps C5 to exactly this table shape).
  *
  * Cells stay whole within a group (group = cell mod nGroups), so a probe
  * touches exactly the groups its cells hash to, and a killed build loses
  * at most one uncommitted group.
  */
object IndexStore {

  /** The store's filesystem, resolved from the root's scheme — `file:`,
    * `hdfs:`, `s3a:`, … — through the session's Hadoop configuration.
    * The store lives wherever the cluster's data lives; nothing in this
    * object touches driver-local POSIX paths.
    */
  private def hfs(spark: SparkSession, root: String): FileSystem =
    new HPath(root).getFileSystem(spark.sparkContext.hadoopConfiguration)

  def treeBytes(t: PointRTree2D): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val oos = new ObjectOutputStream(bos)
    oos.writeObject(t)
    oos.close()
    bos.toByteArray
  }

  def treeFrom(b: Array[Byte]): PointRTree2D = {
    val ois = new ObjectInputStream(new ByteArrayInputStream(b))
    val t = ois.readObject().asInstanceOf[PointRTree2D]
    ois.close()
    t
  }

  /** Build (or resume building) the persisted index under `root`. Each
    * group's slice bulk-loads one packed tree per cell inside mapGroups —
    * the per-partition STR build — and commits atomically via Checkpoint.
    * Returns the full `(cell, n, tree)` table.
    */
  def build(spark: SparkSession, points: Dataset[PointRow], grid: CellGrid,
      root: String, nGroups: Int = 8): DataFrame = {
    import spark.implicits._
    val cp = new Checkpoint(spark, root)
    val celled = points.map(p => (grid.cellId(p.x, p.y), p))
    cp.runStage("trees", nGroups, { g =>
      celled.filter(_._1 % nGroups == g)
        .groupByKey(_._1)
        .mapGroups { (cell, it) =>
          val arr = it.map(_._2).toArray
          val tree = PointRTree2D.build(
            arr.map(_.id), arr.map(_.x), arr.map(_.y))
          (cell, arr.length.toLong, treeBytes(tree))
        }
        .toDF("cell", "n", "tree")
    })
  }

  /** Committed generations under `root`, oldest first. Three stage kinds:
    * the base `trees` stage (generation 0), appends `trees_g<k>` (k ≥ 1),
    * and compactions `trees_c<k>` — a compacted stage RECORDS the maximum
    * generation it subsumed, so it owns no number a future append could
    * want, and at equal k the compaction outranks the append (it already
    * contains it; matters when a stream replaying an old batchId
    * recreates a retired `trees_g<k>`). A stage counts only once it has
    * ≥ 1 committed group marker. Returns (gen, kindRank, stage) with
    * kindRank 1 for compactions, 0 otherwise, ordered by (gen, kindRank).
    */
  private def generations(spark: SparkSession,
      root: String): Seq[(Int, Int, String)] = {
    val cp = new Checkpoint(spark, root)
    val fs = hfs(spark, root)
    val rootP = new HPath(root)
    val names =
      if (!fs.exists(rootP)) Array.empty[String]
      else fs.listStatus(rootP).filter(_.isDirectory).map(_.getPath.getName)
        .filter(n => n == "trees" || n.matches("trees_[gc]\\d+"))
    names.toSeq
      .map {
        case "trees" => (0, 0, "trees")
        case n if n.startsWith("trees_c") =>
          (n.stripPrefix("trees_c").toInt, 1, n)
        case n => (n.stripPrefix("trees_g").toInt, 0, n)
      }
      .filter { case (_, _, n) => cp.completedGroups(n).nonEmpty }
      .sortBy(t => (t._1, t._2))
  }

  /** Number of committed stages (base + appends + compactions) — the LSM
    * depth a maintenance scheduler triggers on; a probe unions exactly
    * this many stages before latest-wins.
    */
  def generationCount(spark: SparkSession, root: String): Int =
    generations(spark, root).size

  /** Retire a stage crash-safely: the commit MARKERS go first, so a kill
    * mid-retirement leaves either an invisible orphan directory (markers
    * gone — `generations` no longer lists it) or a still-consistent
    * partial stage (surviving markers all still have their data); never a
    * stage whose markers promise data that was already deleted.
    */
  private def retireStage(spark: SparkSession, root: String,
      stage: String): Unit = {
    val fs = hfs(spark, root)
    val d = new HPath(root, stage)
    if (!fs.exists(d)) return
    fs.listStatus(d).filter(_.getPath.getName.startsWith("_done_"))
      .foreach(s => fs.delete(s.getPath, false))
    fs.delete(d, true)
  }

  private def readStage(spark: SparkSession, root: String,
      stage: String): DataFrame = {
    val cp = new Checkpoint(spark, root)
    spark.read.parquet(cp.completedGroups(stage).toSeq.sorted
      .map(g => new HPath(new HPath(root, stage), s"group=$g").toString): _*)
  }

  /** The stored index table: latest generation wins per cell. An appended
    * cell's generation-k tree already holds the cell's FULL point set (the
    * append merged the prior tree before rebuilding), so the view is a
    * plain last-writer-wins over ≤ 4^res rows per generation — untouched
    * cells keep serving their original bytes, which never move (the
    * LSM-style contract that makes appends O(touched cells), not
    * O(store), at 100 TB). Single-generation stores skip the window.
    */
  def table(spark: SparkSession, root: String): DataFrame = {
    val view = tableUpTo(spark, root, Int.MaxValue)
    require(view.isDefined, s"no committed index groups under $root")
    view.get
  }

  /** The latest-wins view over stages with generation ≤ maxGen; None when
    * no such stage exists (a replayed append whose base generations were
    * compacted away hits this — its output is dominated by the compacted
    * stage anyway, see [[append]]).
    */
  private def tableUpTo(spark: SparkSession, root: String,
      maxGen: Int): Option[DataFrame] = {
    import org.apache.spark.sql.expressions.Window
    val gens = generations(spark, root).filter(_._1 <= maxGen)
    if (gens.isEmpty) None
    else if (gens.size == 1) Some(readStage(spark, root, gens.head._3))
    else {
      val unioned = gens.map { case (g, kr, stage) =>
        readStage(spark, root, stage)
          .withColumn("gen", lit(g)).withColumn("kr", lit(kr))
      }.reduce(_.unionByName(_))
      val w = Window.partitionBy("cell")
        .orderBy(col("gen").desc, col("kr").desc)
      Some(unioned.withColumn("rk", row_number().over(w))
        .where(col("rk") === 1)
        .select("cell", "n", "tree"))
    }
  }

  /** C4 over the PERSISTED index — incremental append without touching
    * untouched cells: the new batch's cells are merged with their stored
    * trees (deserialize, concat point arrays, rebuild at bulk rate) and
    * committed as generation `gen`; every other cell's bytes stay exactly
    * where they are and keep serving. Group-committed through Checkpoint
    * like the base build, so a killed append resumes and a re-invocation
    * with the same `gen` is a no-op (marker-idempotent).
    *
    * Reference analog: bulk-then-insert (rstar/src/rtree.rs:1307-1371) —
    * here the insert unit is the cell, and the rebuilt cell tree is the
    * same packed STR structure the base build produces, so probe paths
    * are generation-oblivious.
    */
  def append(spark: SparkSession, points: Dataset[PointRow], grid: CellGrid,
      root: String, gen: Int, nGroups: Int = 8): DataFrame = {
    require(gen >= 1, s"append generations start at 1, got $gen")
    import spark.implicits._
    val cp = new Checkpoint(spark, root)
    val celled = points.map(p => (grid.cellId(p.x, p.y), p))
    // materialize the touched-cell slice of the base view ONCE (semi-join
    // on the batch's cell set, no driver collect): without this, every
    // one of the nGroups group jobs re-scans all generations and re-runs
    // the latest-wins window — O(nGroups·store) instead of O(touched).
    // LAZY: the slice is only needed by uncommitted groups' compute
    // closures — a marker-idempotent re-invocation (every re-run of the
    // persisted bench queries, every stream batch replay) previously paid
    // the distinct + eager-checkpoint jobs just to skip all groups.
    lazy val base = tableUpTo(spark, root, gen - 1) match {
      case Some(view) =>
        val touched = celled.map(_._1).distinct().toDF("cell")
        view.join(broadcast(touched), Seq("cell"), "left_semi")
          .localCheckpoint(true)
      case None =>
        // no base ≤ gen-1: either a store seeded by append alone, or a
        // stream REPLAYING a batch whose generations a compaction already
        // subsumed and retired — in that case this stage's rows are
        // outranked by the compacted stage (kindRank), so building them
        // against an empty base is safe and the replay stays a no-op
        // in the served view
        spark.createDataFrame(
          spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
          org.apache.spark.sql.types.StructType(Seq(
            org.apache.spark.sql.types.StructField("cell",
              org.apache.spark.sql.types.LongType, nullable = false),
            org.apache.spark.sql.types.StructField("n",
              org.apache.spark.sql.types.LongType, nullable = false),
            org.apache.spark.sql.types.StructField("tree",
              org.apache.spark.sql.types.BinaryType, nullable = true))))
    }
    cp.runStage(s"trees_g$gen", nGroups, { g =>
      val newCells = celled.filter(_._1 % nGroups == g)
        .groupByKey(_._1)
        .mapGroups { (cell, it) =>
          val arr = it.map(_._2).toArray
          (cell, arr.map(_.id), arr.map(_.x), arr.map(_.y))
        }
        .toDF("cell", "ids", "xs", "ys")
      newCells.join(base.select(col("cell"), col("tree")), Seq("cell"), "left")
        .select(col("cell"), col("ids"), col("xs"), col("ys"), col("tree"))
        .as[(Long, Array[Long], Array[Double], Array[Double], Array[Byte])]
        .map { case (cell, ids, xs, ys, old) =>
          val (oi, ox, oy) =
            if (old == null)
              (Array.empty[Long], Array.empty[Double], Array.empty[Double])
            else { val t = treeFrom(old); (t.ids, t.xs, t.ys) }
          val tree = PointRTree2D.build(oi ++ ids, ox ++ xs, oy ++ ys)
          (cell, (oi.length + ids.length).toLong, treeBytes(tree))
        }
        .toDF("cell", "n", "tree")
    })
    table(spark, root)
  }

  /** F1 over the persisted index: prune the cell table to the query box's
    * covered cells (an `IN` predicate the parquet scan can push down — the
    * persisted analog of envelope-based subtree pruning), deserialize just
    * those trees, and probe point-in-box. Output: (id, x, y).
    */
  def rangeQuery(spark: SparkSession, root: String, grid: CellGrid,
      qMinX: Double, qMinY: Double, qMaxX: Double, qMaxY: Double): DataFrame = {
    import spark.implicits._
    val cells = grid.cover(graft.geom.AABB.of2d(qMinX, qMinY, qMaxX, qMaxY))
    table(spark, root)
      .where(col("cell").isin(cells: _*))
      .select("tree")
      .as[Array[Byte]]
      .mapPartitions { it =>
        it.flatMap { bytes =>
          val t = treeFrom(bytes)
          val out = Vector.newBuilder[(Long, Double, Double)]
          t.foreachInBox(qMinX, qMinY, qMaxX, qMaxY) { p =>
            out += ((t.ids(p), t.xs(p), t.ys(p)))
          }
          out.result()
        }
      }
      .toDF("id", "x", "y")
  }

  /** K1/J2 over the persisted index — the 100 TB cold-start serving path:
    * answer a kNN join by DESERIALIZING the stored per-cell trees and
    * probing them, never rebuilding (reference analog: serde round-trip
    * then query, rstar/src/rtree.rs:1289-1305). Two passes mirroring
    * [[SpatialOps.knnJoin]]: ring expansion over the stored `(cell, n)`
    * histogram until ≥ k candidates are guaranteed, a probe pass for the
    * k-th-distance upper bound, then a disc-cover probe pass; per-cell
    * probes keep float-exact boundary ties and the final (d2, id) window
    * cut replicates the window path's tiebreak, so the output is
    * bit-equal to the in-memory kNN join on the same inputs.
    *
    * Each probe pass groups its candidate queries BY CELL before touching
    * the store, so every stored tree is deserialized at most once per
    * pass regardless of how many queries hit it.
    */
  def knnQuery(spark: SparkSession, root: String, grid: CellGrid,
      queries: Dataset[QueryRow], k: Int): DataFrame = {
    import spark.implicits._
    import org.apache.spark.sql.expressions.Window
    // materialize the generational view ONCE: the query runs three jobs
    // against it (histogram collect + both probe passes), and on a
    // multi-generation store each would otherwise re-run the union +
    // latest-wins window — same single-pass-view treatment append/compact
    // already apply
    val store = table(spark, root).localCheckpoint(true)
    // bounded: ≤ 4^res non-empty cells (the knnJoin histogram contract)
    val histRows = store.select(col("cell"), col("n"))
      .as[(Long, Long)].collect().sortBy(_._1)
    val histKeys = histRows.map(_._1)
    val histCnts = histRows.map(_._2)
    val histB = spark.sparkContext.broadcast((histKeys, histCnts))

    def probe(cand: DataFrame): DataFrame =
      cand.groupBy("cell")
        .agg(collect_list(struct(col("qid"), col("qx"), col("qy"))).as("qs"))
        .join(store, Seq("cell"))
        .select(col("tree"), col("qs"))
        .as[(Array[Byte], Seq[(Long, Double, Double)])]
        .flatMap { case (bytes, qs) =>
          val t = treeFrom(bytes) // once per (cell, pass), not per query
          qs.iterator.flatMap { case (qid, qx, qy) =>
            val buf = Vector.newBuilder[(Long, Long, Double)]
            t.nearestK(qx, qy, k, keepTies = true) { (p, d2) =>
              buf += ((qid, t.ids(p), d2))
            }
            buf.result()
          }
        }
        .toDF("qid", "id", "d2")

    // Pass A: ring expansion per query until ≥ k stored points are
    // guaranteed (same walk as SpatialOps.knnJoin pass A).
    val candA = queries.flatMap { q =>
      val (hk, hc) = histB.value
      def cnt(c: Long): Long = {
        val i = java.util.Arrays.binarySearch(hk, c)
        if (i >= 0) hc(i) else 0L
      }
      val cx = grid.ix(q.x); val cy = grid.iy(q.y)
      var cum = 0L
      var ring = 0
      val cells = scala.collection.mutable.ArrayBuffer.empty[Long]
      val maxRing = grid.cellsPerAxis
      while (cum < k && ring <= maxRing) {
        grid.ring(cx, cy, ring).foreach { c =>
          val n = cnt(c)
          if (n > 0) { cells += c; cum += n }
        }
        ring += 1
      }
      cells.map(c => (q.qid, q.x, q.y, c))
    }.toDF("qid", "qx", "qy", "cell")

    val wAsc = Window.partitionBy("qid").orderBy(col("d2"), col("id"))
    val dUp = probe(candA)
      .withColumn("rn", row_number().over(wAsc))
      .where(col("rn") <= k)
      .groupBy("qid").agg(max("d2").as("dUp"))
      .join(queries.toDF().select(col("qid"),
        col("x").as("qx"), col("y").as("qy")), Seq("qid"))

    // Pass B: cover the disc of radius sqrt(dUp) — provably contains the
    // true k nearest, so the final cut is exact.
    val candB = dUp.select(col("qid"), col("qx"), col("qy"),
      explode(graft.functions.SpatialFunctions.stCoverCells(grid)(
        col("qx") - sqrt(col("dUp")), col("qy") - sqrt(col("dUp")),
        col("qx") + sqrt(col("dUp")), col("qy") + sqrt(col("dUp"))))
        .as("cell"))

    probe(candB)
      .withColumn("rn", row_number().over(wAsc))
      .where(col("rn") <= k)
      .select(col("qid"), col("id"), col("d2"), col("rn"))
  }

  /** LSM COMPACTION for the generational store: materialize the
    * last-writer-wins view as ONE compacted stage `trees_c<m>` — m being
    * the maximum generation it subsumes, NOT a fresh number, so the
    * append sequence (e.g. streaming batchIds) is never stolen: a later
    * append at gen > m wins its cells as usual, and a stream REPLAYING a
    * retired batch ≤ m recreates a stage the compacted one outranks
    * (kindRank tiebreak). Old stages retire only after the full commit,
    * markers first ([[retireStage]]), so a crash anywhere leaves a store
    * every read still serves correctly; a partial compacted stage holds
    * cells identical to the view it was computed from, masked until the
    * next compaction subsumes it. Correctness never depends on a
    * compaction finishing — it is pure maintenance, exactly like an LSM
    * level merge. The view is materialized once (localCheckpoint) — a
    * compaction is inherently O(store), but never O(nGroups·store).
    */
  def compact(spark: SparkSession, root: String,
      nGroups: Int = 8): DataFrame = {
    val gens = generations(spark, root)
    require(gens.nonEmpty, s"no committed index groups under $root")
    if (gens.size == 1) return readStage(spark, root, gens.head._3)
    val m = gens.map(_._1).max
    val target = s"trees_c$m"
    val cur = table(spark, root).localCheckpoint(true)
    val cp = new Checkpoint(spark, root)
    cp.runStage(target, nGroups, { g =>
      cur.where(col("cell") % nGroups === g)
    })
    gens.filter(_._3 != target)
      .foreach { case (_, _, stage) => retireStage(spark, root, stage) }
    table(spark, root)
  }

  /** F4 over the persisted index: within-distance probe of the covered
    * disc's cells. Output: (id, d2).
    */
  def withinDistance(spark: SparkSession, root: String, grid: CellGrid,
      px: Double, py: Double, r2: Double): DataFrame = {
    import spark.implicits._
    val r = math.sqrt(r2)
    val cells = grid.cover(graft.geom.AABB.of2d(px - r, py - r, px + r, py + r))
    table(spark, root)
      .where(col("cell").isin(cells: _*))
      .select("tree")
      .as[Array[Byte]]
      .mapPartitions { it =>
        it.flatMap { bytes =>
          val t = treeFrom(bytes)
          val out = Vector.newBuilder[(Long, Double)]
          t.foreachWithin(px, py, r2) { p =>
            val dx = t.xs(p) - px
            val dy = t.ys(p) - py
            out += ((t.ids(p), dx * dx + dy * dy))
          }
          out.result()
        }
      }
      .toDF("id", "d2")
  }
}
