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
  def sliceSorted(rows: Array[Row], i: Int, range: ClusterRange): (Int, Int) =
    sliceSortedCompound(rows, Array(i), Seq(range))

  /** The per-column bounds a COMPOUND cluster key can actually use:
    * the composite-index prefix rule. A lexicographic sort on
    * (c1, …, cn) localizes a predicate only through the longest
    * prefix of EQUALITY-bounded columns plus at most one range-bounded
    * column after it — bounds on columns past the first non-equality
    * cannot narrow the binary search (rows matching `c2 > 5` are
    * scattered across every c1 run) and are left to the row filter.
    * Returns one [[ClusterRange]] per usable column, possibly empty.
    */
  def compoundFrom(filters: Array[Filter], cols: Seq[String]): Seq[ClusterRange] = {
    val out = Seq.newBuilder[ClusterRange]
    var open = true
    for (c <- cols if open) {
      val r = from(filters, c)
      val exact = (r.lo, r.hi) match {
        case (Some((lv, true)), Some((hv, true))) => cmpNullsFirst(lv, hv) == 0
        case _ => false
      }
      if (exact) out += r
      else {
        if (r.isBounded) out += r
        open = false // range (or unbounded) column ends the usable prefix
      }
    }
    out.result()
  }

  /** Compound [[sliceSorted]]: `rows` sorted lexicographically on the
    * columns at `idxs` (each asc, nulls first), `ranges` the usable
    * per-column bounds from [[compoundFrom]] (equalities, then at most
    * one trailing range). Both edges are one lexicographic binary
    * search over the bound TUPLE — the tuple's last component carries
    * the only open inclusivity; everything before it is an equality.
    */
  def sliceSortedCompound(rows: Array[Row], idxs: Array[Int], ranges: Seq[ClusterRange]): (Int, Int) = {
    if (ranges.isEmpty) return (0, rows.length)
    def valueAt(m: Int, i: Int): Any = {
      val r = rows(m)
      // pre-ALTER short rows read added columns as NULL (fetch-path padding)
      if (i >= r.size || r.isNullAt(i)) null else r.get(i)
    }
    // row's key prefix vs bound tuple, lexicographic
    def cmpRow(m: Int, bound: IndexedSeq[Any]): Int = {
      var k = 0
      while (k < bound.length) {
        val c = cmpNullsFirst(valueAt(m, idxs(k)), bound(k))
        if (c != 0) return c
        k += 1
      }
      0
    }
    // first index where keep(m) is true (keep monotone over the sort)
    def lowerBound(keep: Int => Boolean): Int = {
      var lo = 0
      var hi = rows.length
      while (lo < hi) {
        val m = (lo + hi) >>> 1
        if (keep(m)) hi = m else lo = m + 1
      }
      lo
    }
    // the bound tuple for one side: bounds up to the first missing one
    // (equality columns always carry both sides; only the trailing
    // range column can be one-sided). Inclusivity = the tuple's LAST
    // component's — earlier components are exact matches.
    def tuple(side: ClusterRange => Option[(Any, Boolean)]): (IndexedSeq[Any], Boolean) = {
      val defined = ranges.map(side).takeWhile(_.isDefined).map(_.get)
      (defined.map(_._1).toIndexedSeq, defined.lastOption.forall(_._2))
    }
    val (loT, loIncl) = tuple(_.lo)
    val (hiT, hiIncl) = tuple(_.hi)
    // bound values are non-null by construction (from() requires it),
    // so a row with NULL in a bounded component compares < and the
    // null prefix falls outside a defined lower bound — matching the
    // single-column contract
    val start =
      if (loT.isEmpty) 0
      else lowerBound(m => { val c = cmpRow(m, loT); if (loIncl) c >= 0 else c > 0 })
    val end =
      if (hiT.isEmpty) rows.length
      else lowerBound(m => { val c = cmpRow(m, hiT); if (hiIncl) c > 0 else c >= 0 })
    (start, math.max(start, end))
  }
}

/** A provable slice of a compound-clustered bucket: the cluster
  * columns (layout order) paired with the usable bounds
  * ([[ClusterRange.compoundFrom]]). What the scan hands the fetch so
  * the server binary-searches the sorted run once, lexicographically.
  */
final case class ClusterSlice(cols: Seq[String], ranges: Seq[ClusterRange]) {
  def describe: String =
    cols.zip(ranges).map { case (c, r) => s"$c${r.describe}" }.mkString("(", ", ", ")")
}

object ClusterSlice {
  /** The slice provable from `filters` over cluster columns `cols` —
    * None when no usable bound exists (fetch streams the bucket).
    */
  def from(filters: Array[Filter], cols: Seq[String]): Option[ClusterSlice] = {
    val ranges = ClusterRange.compoundFrom(filters, cols)
    if (ranges.isEmpty) None else Some(ClusterSlice(cols.take(ranges.length), ranges))
  }
}
