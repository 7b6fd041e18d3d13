package sivbp.spark.topk

import org.apache.spark.sql.{Encoder, Encoders, SparkSession, functions}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

import scala.collection.mutable.ArrayBuffer

/** One (score, docid) candidate row flowing into the aggregate. */
case class ScoredDoc(score: Double, docid: String)

/** Same, for numeric document ids (ties must compare numerically). */
case class ScoredDocL(score: Double, docid: Long)

/** Bounded-heap per-group top-k: the typed-`Aggregator` alternative to
  * `Window.partitionBy(qid).orderBy(desc(score)) + row_number() <= k`.
  *
  * Semantics mirror the reference's chunked bounded min-heap merge
  * (reference `experiments/auto_run_tests.py:119-145`: heapq push/replace per
  * chunk, final descending sort), distributed: `reduce` is the per-partition
  * partial top-k, `merge` the cross-partition heap merge — so only k rows per
  * group cross the shuffle instead of the window operator's full sort of
  * every candidate row in the group. Ordering is (score desc, docid asc),
  * identical to the window implementation in `operators/search.py`.
  *
  * The buffer lives as a JVM object inside ObjectHashAggregate and is only
  * kryo-serialized at shuffle boundaries, so the hot loop is pure JVM — no
  * Python, no per-row Arrow transfer.
  */
abstract class BoundedTopK[IN: scala.reflect.ClassTag](k: Int)
    extends Aggregator[IN, ArrayBuffer[IN], Array[IN]] {

  require(k > 0, s"k must be positive, got $k")

  /** Strict "a ranks ahead of b" under (score desc, docid asc). */
  protected def beats(a: IN, b: IN): Boolean

  // The buffer is a binary min-heap rooted at index 0 whose root is the WORST
  // retained row: a parent never beats its children, so evicting the root
  // drops the current k-th best in O(log k).

  private def siftUp(buf: ArrayBuffer[IN], start: Int): Unit = {
    var i = start
    while (i > 0) {
      val p = (i - 1) / 2
      if (beats(buf(p), buf(i))) {
        val t = buf(p); buf(p) = buf(i); buf(i) = t
        i = p
      } else return
    }
  }

  private def siftDown(buf: ArrayBuffer[IN]): Unit = {
    var i = 0
    val n = buf.length
    var done = false
    while (!done) {
      val l = 2 * i + 1
      val r = l + 1
      var worst = i
      if (l < n && beats(buf(worst), buf(l))) worst = l
      if (r < n && beats(buf(worst), buf(r))) worst = r
      if (worst == i) done = true
      else {
        val t = buf(i); buf(i) = buf(worst); buf(worst) = t
        i = worst
      }
    }
  }

  private def push(buf: ArrayBuffer[IN], in: IN): Unit = {
    if (buf.length < k) {
      buf += in
      siftUp(buf, buf.length - 1)
    } else if (beats(in, buf(0))) {
      buf(0) = in
      siftDown(buf)
    }
  }

  override def zero: ArrayBuffer[IN] = ArrayBuffer.empty

  override def reduce(buf: ArrayBuffer[IN], in: IN): ArrayBuffer[IN] = {
    push(buf, in)
    buf
  }

  override def merge(
      b1: ArrayBuffer[IN], b2: ArrayBuffer[IN]): ArrayBuffer[IN] = {
    val (into, from) = if (b1.length >= b2.length) (b1, b2) else (b2, b1)
    from.foreach(push(into, _))
    into
  }

  /** Best-first (score desc, docid asc) array of at most k rows. */
  override def finish(buf: ArrayBuffer[IN]): Array[IN] =
    buf.toArray.sortWith(beats(_, _))
}

class TopKAggregator(k: Int) extends BoundedTopK[ScoredDoc](k) {
  override protected def beats(a: ScoredDoc, b: ScoredDoc): Boolean = {
    val c = java.lang.Double.compare(a.score, b.score)
    if (c != 0) c > 0 else a.docid.compareTo(b.docid) < 0
  }
  override def bufferEncoder: Encoder[ArrayBuffer[ScoredDoc]] =
    Encoders.kryo[ArrayBuffer[ScoredDoc]]
  override def outputEncoder: Encoder[Array[ScoredDoc]] =
    ExpressionEncoder[Array[ScoredDoc]]()
}

class TopKAggregatorLong(k: Int) extends BoundedTopK[ScoredDocL](k) {
  override protected def beats(a: ScoredDocL, b: ScoredDocL): Boolean = {
    val c = java.lang.Double.compare(a.score, b.score)
    if (c != 0) c > 0 else a.docid < b.docid
  }
  override def bufferEncoder: Encoder[ArrayBuffer[ScoredDocL]] =
    Encoders.kryo[ArrayBuffer[ScoredDocL]]
  override def outputEncoder: Encoder[Array[ScoredDocL]] =
    ExpressionEncoder[Array[ScoredDocL]]()
}

/** Py4J-friendly registration entry points.
  *
  * From PySpark (jar on the driver classpath):
  * {{{
  * spark._jvm.sivbp.spark.topk.TopK.register(spark._jsparkSession, "topk_heap", 10)
  * df.groupBy("qid").agg(F.expr("topk_heap(score, docid)").alias("hits"))
  * }}}
  * When the jar arrives via `ADD JAR` instead, load `TopK$` through
  * `sharedState().jarClassLoader()` and invoke reflectively (see
  * `operators/search.py:register_topk_heap`).
  */
object TopK {
  def register(spark: SparkSession, name: String, k: Int): Unit =
    spark.udf.register(
      name, functions.udaf(new TopKAggregator(k), Encoders.product[ScoredDoc]))

  def registerLong(spark: SparkSession, name: String, k: Int): Unit =
    spark.udf.register(
      name,
      functions.udaf(new TopKAggregatorLong(k), Encoders.product[ScoredDocL]))
}
