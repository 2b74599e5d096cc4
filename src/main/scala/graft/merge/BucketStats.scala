package graft.merge

import org.apache.spark.sql.{Column, Encoder}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions

/** Per-bucket merge-output statistics as ONE aggregate expression, riding
  * the merge write via `Dataset.observe` — no second pass over the staged
  * output.
  *
  * History (the serial-floor lineage): round 1 collected these stats with
  * 8 x numBuckets FLAT conditional aggregates in an Observation — a
  * 256-expression CollectMetrics whose analysis alone cost seconds of
  * serial driver time per batch. Round 2 replaced it with a columnar
  * READ-BACK of the staged files — a fixed small plan, but a second full
  * scan (decode + aggregate) of every row the merge just wrote, plus one
  * extra Spark job on the per-batch serial path. This round collapses the
  * whole thing into a single typed [[Aggregator]]: one expression (O(1)
  * analysis), per-row cost one hash probe + array bump, partial merge
  * shipping <= numBuckets entries per task — the stats now ride the write
  * for free and the read-back job is gone. That job was the largest
  * REMOVABLE term in the ~0.9 s/batch serial driver floor capping the
  * north rule's 2->8 scaling (see BENCH.md).
  *
  * Layout per bucket: Array(n, minLsn, maxLsn, nInsert, nUpdate, nDelete,
  * nDeleteNoop, nStale).
  */
object BucketStats {

  /** Index names into the per-bucket stats array. */
  final val N = 0; final val MinL = 1; final val MaxL = 2
  final val NI = 3; final val NU = 4; final val ND = 5
  final val NDn = 6; final val NS = 7
  final val Width = 8

  private def fresh(): Array[Long] =
    Array(0L, Long.MaxValue, Long.MinValue, 0L, 0L, 0L, 0L, 0L)

  private def bump(a: Array[Long], status: String, lsn: Option[Long]): Unit = {
    a(N) += 1
    lsn.foreach { l =>
      if (l < a(MinL)) a(MinL) = l
      if (l > a(MaxL)) a(MaxL) = l
    }
    status match {
      case "insert" => a(NI) += 1
      case "update" => a(NU) += 1
      case "delete" => a(ND) += 1
      case "delete_noop" => a(NDn) += 1
      case "stale" => a(NS) += 1
      case _ => () // "keep" and anything future count only toward n
    }
  }

  private def mergeInto(into: Array[Long], from: Array[Long]): Unit = {
    into(N) += from(N)
    if (from(MinL) < into(MinL)) into(MinL) = from(MinL)
    if (from(MaxL) > into(MaxL)) into(MaxL) = from(MaxL)
    var i = NI
    while (i < Width) { into(i) += from(i); i += 1 }
  }

  /** The aggregator. Buffer is an immutable Map of MUTABLE arrays: the
    * hot path mutates the array in place; the map itself only copies when
    * a bucket first appears (<= numBuckets times per partition), keeping
    * the buffer encoder-friendly.
    */
  private final class Agg
      extends Aggregator[(Int, String, Option[Long]),
        Map[Int, Array[Long]], Map[Int, Seq[Long]]] {
    def zero: Map[Int, Array[Long]] = Map.empty
    def reduce(b: Map[Int, Array[Long]],
        in: (Int, String, Option[Long])): Map[Int, Array[Long]] = {
      val (bucket, status, lsn) = in
      b.get(bucket) match {
        case Some(a) => bump(a, status, lsn); b
        case None =>
          val a = fresh(); bump(a, status, lsn); b + (bucket -> a)
      }
    }
    def merge(x: Map[Int, Array[Long]],
        y: Map[Int, Array[Long]]): Map[Int, Array[Long]] =
      y.foldLeft(x) { case (acc, (bucket, a)) =>
        acc.get(bucket) match {
          case Some(into) => mergeInto(into, a); acc
          case None => acc + (bucket -> a)
        }
      }
    def finish(b: Map[Int, Array[Long]]): Map[Int, Seq[Long]] =
      b.map { case (k, v) => k -> v.toSeq }
    def bufferEncoder: Encoder[Map[Int, Array[Long]]] =
      ExpressionEncoder[Map[Int, Array[Long]]]()
    def outputEncoder: Encoder[Map[Int, Seq[Long]]] =
      ExpressionEncoder[Map[Int, Seq[Long]]]()
  }

  private lazy val udafFn = functions.udaf(new Agg)

  /** The observation column: `agg(_bucket, _status, lsn)`. */
  def agg(bucket: Column, status: Column, lsn: Column): Column =
    udafFn(bucket, status, lsn)

  /** Decode the observation value back to bucket -> stats array. */
  def decode(v: Any): Map[Int, Array[Long]] = v match {
    case null => Map.empty
    case m: scala.collection.Map[_, _] =>
      m.map { case (k, s) =>
        k.asInstanceOf[Number].intValue() ->
          s.asInstanceOf[scala.collection.Seq[Long]].toArray
      }.toMap
    case other =>
      throw new IllegalStateException(
        s"unexpected bucket-stats metric value: ${other.getClass}")
  }
}
