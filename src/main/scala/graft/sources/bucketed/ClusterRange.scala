package graft.sources.bucketed

import org.apache.spark.sql.Row
import org.apache.spark.sql.sources._
import org.apache.spark.sql.types.StructType

/** Range bounds on a clustered column, provable from a scan's pushed
  * conjuncts — the fetch-side companion of [[BucketPruning]]: where
  * bucket pruning bounds WHICH buckets a key predicate can touch,
  * cluster-range slicing bounds WHERE IN a sorted bucket a range
  * predicate's rows can live. Both are strictly conservative fetch
  * optimizations: every fetched row is still evaluated against the
  * full pushed-filter set ([[FilterEval]]), so correctness never
  * depends on the slice — only pages moved do.
  *
  * At 100 TB this is the clustered-index scan: a time-series table
  * clustered on `ts` serves `WHERE ts BETWEEN …` by binary-searching
  * each bucket's sorted run and streaming pages of the qualifying
  * slice — I/O proportional to the answer, not the bucket (the same
  * reason Parquet row-group min/max pruning works; here the layout is
  * the store's, so the "server" skips before any page crosses the
  * wire).
  */
final case class ClusterRange(lo: Option[(Any, Boolean)], hi: Option[(Any, Boolean)]) {
  def isBounded: Boolean = lo.isDefined || hi.isDefined
  def describe: String = {
    def b(side: Option[(Any, Boolean)], op: String, opEq: String) =
      side.map { case (v, incl) => s"${if (incl) opEq else op}$v" }
    s"[${(b(lo, ">", ">=") ++ b(hi, "<", "<=")).mkString(", ")}]"
  }
}

object ClusterRange {

  /** Total order with SQL sort semantics: null sorts FIRST (before
    * every value), matching the clustered layout [[BucketStore]]
    * maintains. Non-null comparisons delegate to [[FilterEval.cmp]].
    */
  private[bucketed] def cmpNullsFirst(a: Any, b: Any): Int =
    if (a == null && b == null) 0
    else if (a == null) -1
    else if (b == null) 1
    else FilterEval.cmp(a, b)

  /** Bounds on `col` provable from the pushed conjuncts. Only
    * top-level comparisons participate (the filter array is an AND);
    * anything else is ignored — conservative by construction.
    */
  def from(filters: Array[Filter], col: String): ClusterRange =
    filters.foldLeft(ClusterRange(None, None)) { (acc, f) =>
      f match {
        case GreaterThan(c, v) if c == col && v != null => tightenLo(acc, v, incl = false)
        case GreaterThanOrEqual(c, v) if c == col && v != null => tightenLo(acc, v, incl = true)
        case LessThan(c, v) if c == col && v != null => tightenHi(acc, v, incl = false)
        case LessThanOrEqual(c, v) if c == col && v != null => tightenHi(acc, v, incl = true)
        case EqualTo(c, v) if c == col && v != null =>
          tightenHi(tightenLo(acc, v, incl = true), v, incl = true)
        case _ => acc
      }
    }

  private def tightenLo(r: ClusterRange, v: Any, incl: Boolean): ClusterRange = r.lo match {
    case None => r.copy(lo = Some((v, incl)))
    case Some((cur, curIncl)) =>
      val c = cmpNullsFirst(v, cur)
      if (c > 0) r.copy(lo = Some((v, incl)))
      else if (c == 0) r.copy(lo = Some((cur, curIncl && incl)))
      else r
  }

  private def tightenHi(r: ClusterRange, v: Any, incl: Boolean): ClusterRange = r.hi match {
    case None => r.copy(hi = Some((v, incl)))
    case Some((cur, curIncl)) =>
      val c = cmpNullsFirst(v, cur)
      if (c < 0) r.copy(hi = Some((v, incl)))
      else if (c == 0) r.copy(hi = Some((cur, curIncl && incl)))
      else r
  }

  /** The [start, end) slice of `rows` (sorted on column `i`, nulls
    * first) that can satisfy the range. Binary searches both edges —
    * O(log n) comparisons, never a scan. A defined lower bound also
    * excludes the null prefix (NULL never satisfies a range
    * predicate); with only an upper bound the nulls stay in the slice
    * and [[FilterEval]] drops them per row (conservative, simple).
    */
  def sliceSorted(rows: Array[Row], i: Int, range: ClusterRange): (Int, Int) = {
    def valueAt(m: Int): Any = if (rows(m).isNullAt(i)) null else rows(m).get(i)
    // first index whose value makes `keep` true (keep is monotone)
    def lowerBound(keep: Any => Boolean): Int = {
      var lo = 0
      var hi = rows.length
      while (lo < hi) {
        val m = (lo + hi) >>> 1
        if (keep(valueAt(m))) hi = m else lo = m + 1
      }
      lo
    }
    val start = range.lo match {
      case None => 0
      case Some((v, incl)) =>
        lowerBound(x => x != null && (if (incl) cmpNullsFirst(x, v) >= 0 else cmpNullsFirst(x, v) > 0))
    }
    val end = range.hi match {
      case None => rows.length
      case Some((v, incl)) =>
        lowerBound(x => x != null && (if (incl) cmpNullsFirst(x, v) > 0 else cmpNullsFirst(x, v) >= 0))
    }
    (start, math.max(start, end))
  }
}
