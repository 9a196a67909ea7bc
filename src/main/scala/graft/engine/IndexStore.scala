package graft.engine

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, ObjectInputStream, ObjectOutputStream}

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

  /** The stored index table (all committed groups). */
  def table(spark: SparkSession, root: String): DataFrame = {
    val cp = new Checkpoint(spark, root)
    val groups = cp.completedGroups("trees")
    require(groups.nonEmpty, s"no committed index groups under $root")
    spark.read.parquet(
      groups.toSeq.sorted.map(g => s"$root/trees/group=$g"): _*)
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
