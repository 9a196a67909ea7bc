package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

import graft.geom.AABB

/** Typed envelope-of-group aggregator (SURVEY §7.3): folds (x, y) rows into
  * their bounding box starting from the empty box — the aggregate form of
  * `AABB::from_points` (rstar/src/aabb.rs:85-102), with the reference's
  * empty-box/merge-identity convention, usable on
  * `KeyValueGroupedDataset.agg` where the untyped min/max column spread is
  * awkward. Buffer is a flat 4-double tuple so Tungsten keeps it off-heap.
  */
object EnvelopeAggregator
    extends Aggregator[(Double, Double), (Double, Double, Double, Double),
      (Double, Double, Double, Double)] {

  // empty box per rstar convention: lower=+Max, upper=-Max
  def zero: (Double, Double, Double, Double) =
    (Double.MaxValue, Double.MaxValue, -Double.MaxValue, -Double.MaxValue)

  def reduce(b: (Double, Double, Double, Double),
      p: (Double, Double)): (Double, Double, Double, Double) =
    (math.min(b._1, p._1), math.min(b._2, p._2),
      math.max(b._3, p._1), math.max(b._4, p._2))

  def merge(a: (Double, Double, Double, Double),
      b: (Double, Double, Double, Double)): (Double, Double, Double, Double) =
    (math.min(a._1, b._1), math.min(a._2, b._2),
      math.max(a._3, b._3), math.max(a._4, b._4))

  def finish(b: (Double, Double, Double, Double)): (Double, Double, Double, Double) = b

  def toAABB(b: (Double, Double, Double, Double)): AABB =
    AABB.of2d(b._1, b._2, b._3, b._4)

  def bufferEncoder: Encoder[(Double, Double, Double, Double)] =
    Encoders.tuple(Encoders.scalaDouble, Encoders.scalaDouble,
      Encoders.scalaDouble, Encoders.scalaDouble)
  def outputEncoder: Encoder[(Double, Double, Double, Double)] = bufferEncoder
}
