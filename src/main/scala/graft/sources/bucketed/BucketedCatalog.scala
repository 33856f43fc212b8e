package graft.sources.bucketed

import java.util.{Map => JMap}

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog._
import org.apache.spark.sql.connector.catalog.functions.{BoundFunction, ScalarFunction, UnboundFunction}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.hash.Murmur3_x86_32

/** Catalog plugin for the bucket store: resolves `spark.table("<cat>.t")`
  * to [[BucketedTable]]s AND — the part a bare TableProvider cannot do —
  * exposes the `bucket` partition function through FunctionCatalog.
  * That resolution is what lets Spark prove two graft tables bucketed
  * the same way are co-partitioned, turning joins on the bucket key
  * into storage-partitioned joins with NO Exchange on either side
  * (`spark.sql.sources.v2.bucketing.enabled=true`).
  *
  * Register: `spark.sql.catalog.graft = graft.sources.bucketed.BucketedCatalog`.
  */
object BucketedCatalog {
  /** Graft-owned TBLPROPERTIES vocabulary (lower-cased), validated in
    * [[BucketedCatalog.createTable]] the way [[ConnectorOptions.parse]]
    * validates scan options.
    */
  val KnownTableProps: Set[String] =
    Set("cluster_by", "write.dml.mode", "check", "vacuum.min_age_ms")
}

class BucketedCatalog extends TableCatalog with FunctionCatalog with ProcedureCatalog {

  private var catalogName: String = _

  override def initialize(name: String, options: CaseInsensitiveStringMap): Unit =
    catalogName = name

  override def name(): String = catalogName

  override def listTables(namespace: Array[String]): Array[Identifier] = {
    // flat catalog: only the root namespace exists — listing a made-up
    // one must fail, not return phantom copies of every table
    if (namespace.nonEmpty)
      throw new org.apache.spark.sql.catalyst.analysis.NoSuchNamespaceException(
        name() +: namespace)
    BucketStore.tableNames().map(Identifier.of(Array.empty[String], _)).toArray
  }

  override def loadTable(ident: Identifier): Table = {
    if (!BucketStore.exists(ident.name()))
      throw new org.apache.spark.sql.catalyst.analysis.NoSuchTableException(ident)
    new BucketedTable(ident.name())
  }

  /** SQL time travel — `SELECT … FROM graft.t VERSION AS OF v`: pin
    * the scan to retained MVCC snapshot `v` (loud failure at planning
    * if `v` was vacuumed, [[BucketStore.snapshot]]).
    */
  override def loadTable(ident: Identifier, version: String): Table = {
    if (!BucketStore.exists(ident.name()))
      throw new org.apache.spark.sql.catalyst.analysis.NoSuchTableException(ident)
    // non-numeric versions resolve as snapshot TAGS ('release-v1' →
    // its pinned numeric version; see BucketStore.setTag / CALL
    // graft.tag)
    val v = version.toLongOption
      .orElse(BucketStore.tagOf(ident.name(), version))
      .getOrElse(throw new IllegalArgumentException(
        s"graft time travel takes a numeric store version or a known tag, got '$version' " +
          s"(tags on '${ident.name()}': " +
          s"${BucketStore.tagsOf(ident.name()).keys.toSeq.sorted.mkString(", ")})"))
    // same validation (and wording) as the 'versionasof' scan option —
    // VERSION AS OF 0 / negative gets the instructive message, not the
    // generic "snapshot v0 not retained" failure downstream
    require(v > 0,
      s"graft-buckets: option 'versionasof' must be a positive integer version, got '$version'")
    new BucketedTable(ident.name(),
      ConnectorOptions.Defaults.copy(table = ident.name(), versionAsOf = Some(v)))
  }

  /** SQL time travel by timestamp — `SELECT … FROM graft.t TIMESTAMP
    * AS OF ts`: Spark hands the parsed timestamp in MICROSECONDS since
    * the epoch; the store maps it to the latest retained version whose
    * commit stamp is ≤ ts ([[BucketStore.versionAt]] — loud when the
    * timestamp predates the oldest retained commit) and the scan pins
    * that version exactly like `VERSION AS OF`.
    */
  override def loadTable(ident: Identifier, timestamp: Long): Table = {
    if (!BucketStore.exists(ident.name()))
      throw new org.apache.spark.sql.catalyst.analysis.NoSuchTableException(ident)
    val v = BucketStore.versionAt(ident.name(), timestamp)
    new BucketedTable(ident.name(),
      ConnectorOptions.Defaults.copy(table = ident.name(), versionAsOf = Some(v)))
  }

  /** CREATE TABLE (incl. CTAS): the partitioning MUST be the store's
    * `bucket(n, key)` transform — an unbucketed bucket-store table is
    * a contradiction, rejected loudly rather than defaulted.
    */
  override def createTable(ident: Identifier, schema: StructType,
      partitions: Array[Transform], properties: JMap[String, String]): Table = {
    import org.apache.spark.sql.connector.expressions.{Literal, NamedReference}
    val parsed = partitions.toSeq match {
      case Seq(t) if t.name == "bucket" =>
        val n = t.arguments.collectFirst { case l: Literal[_] =>
          l.value.toString.toInt }
        val key = t.arguments.collectFirst { case nr: NamedReference =>
          nr.fieldNames.mkString(".") }
        n.zip(key)
      case _ => None
    }
    val (n, key) = parsed.getOrElse(throw new UnsupportedOperationException(
      s"graft tables must be partitioned by bucket(n, key); got [${partitions.mkString(", ")}]"))
    // TBLPROPERTIES('cluster_by'='col'): keep each bucket sorted on
    // `col` so range predicates fetch a binary-searched slice
    // (clustered index; see ClusterRange). The property vocabulary is
    // validated like ConnectorOptions.parse validates scan options —
    // a typo ('Cluster_By' accepted case-insensitively, 'clusterby'
    // rejected with the vocabulary) must not silently yield an
    // unclustered table. Spark-managed reserved properties pass through.
    val sparkReserved = Set(TableCatalog.PROP_COMMENT, TableCatalog.PROP_PROVIDER,
      TableCatalog.PROP_OWNER, TableCatalog.PROP_LOCATION, TableCatalog.PROP_EXTERNAL,
      TableCatalog.PROP_IS_MANAGED_LOCATION)
    val allKeys = properties.keySet().asScala.toSet
    // an OPTIONS(...) clause arrives BOTH bare and 'option.'-prefixed
    // (Spark's CatalogV2Util) — validate the option names against the
    // SCAN vocabulary (loud on typos) and keep them out of the
    // table-property check
    val optionKeys = allKeys.filter(_.startsWith("option."))
    optionKeys.foreach { k =>
      val opt = k.stripPrefix("option.").toLowerCase(java.util.Locale.ROOT)
      require(ConnectorOptions.Known.contains(opt),
        s"graft-buckets: unknown option '$opt' in OPTIONS; " +
          s"supported: ${ConnectorOptions.Known.toSeq.sorted.mkString(", ")}")
    }
    val optionBare = optionKeys.map(_.stripPrefix("option."))
    val userKeys = allKeys -- sparkReserved -- optionKeys -- optionBare
    val unknownProps = userKeys.filterNot(k =>
      BucketedCatalog.KnownTableProps.contains(k.toLowerCase(java.util.Locale.ROOT)))
    require(unknownProps.isEmpty,
      s"graft-buckets: unknown table propert${if (unknownProps.size == 1) "y" else "ies"} " +
        s"${unknownProps.toSeq.sorted.mkString("'", "', '", "'")}; " +
        s"supported: ${BucketedCatalog.KnownTableProps.toSeq.sorted.mkString(", ")}")
    val clusterBy = userKeys.find(_.equalsIgnoreCase("cluster_by"))
      .flatMap(k => Option(properties.get(k))).filter(_.nonEmpty)
    // TBLPROPERTIES('write.dml.mode'='merge-on-read'): row-level DML
    // commits deletion vectors + delta rows instead of copy-on-write
    // bucket rewrites (validated loudly by setDmlMode)
    val dmlMode = userKeys.find(_.equalsIgnoreCase("write.dml.mode"))
      .flatMap(k => Option(properties.get(k))).filter(_.nonEmpty)
    // TBLPROPERTIES('check'='<boolean sql expr>'): write-path CHECK
    // constraint, enforced task-side and at every commit choke point
    // (see CheckConstraint)
    val check = userKeys.find(_.equalsIgnoreCase("check"))
      .flatMap(k => Option(properties.get(k))).filter(_.nonEmpty)
    // TBLPROPERTIES('vacuum.min_age_ms'='604800000'): the table's
    // vacuum retention floor — automatic retention GC and floor-less
    // vacuums never collect snapshots/files younger than this (the
    // Delta deletedFileRetentionDuration analog; see BucketStore)
    val vacuumFloor = userKeys.find(_.equalsIgnoreCase("vacuum.min_age_ms"))
      .flatMap(k => Option(properties.get(k))).filter(_.nonEmpty)
      .map(v => v.toLongOption.getOrElse(throw new IllegalArgumentException(
        s"graft-buckets: vacuum.min_age_ms must be a non-negative integer, got '$v'")))
    BucketStore.createEmpty(ident.name(), schema, key, n, clusterBy = clusterBy)
    dmlMode.foreach(BucketStore.setDmlMode(ident.name(), _))
    check.foreach(BucketStore.setCheck(ident.name(), _))
    vacuumFloor.foreach(BucketStore.setVacuumFloor(ident.name(), _))
    new BucketedTable(ident.name())
  }

  /** Schema evolution: `ALTER TABLE … ADD COLUMN` (nullable, appended
    * at the end, no default). Publishes a new MVCC version with the
    * extended schema and the SAME bucket arrays — zero rewrite;
    * readers NULL-pad pre-ALTER rows at fetch, earlier snapshots keep
    * their own schema (time travel shows the world as it was), and
    * the CDC diff normalizes arity so an ALTER emits no phantom
    * deltas. Everything else (drop/rename/retype — they would force a
    * rewrite or break old snapshots' reads) is rejected loudly.
    */
  override def alterTable(ident: Identifier, changes: TableChange*): Table = {
    // translate + validate EVERY change before applying ANY: a
    // multi-change ALTER publishes one version or nothing (a partial
    // DDL surviving its own error would poison history and the CDC feed)
    val fields = changes.map {
      case add: TableChange.AddColumn =>
        require(add.fieldNames.length == 1,
          s"graft ADD COLUMN: nested columns not supported (got ${add.fieldNames.mkString(".")})")
        require(add.position() == null,
          "graft ADD COLUMN: columns append at the end (FIRST/AFTER would reorder " +
            "stored rows)")
        require(add.defaultValue() == null,
          "graft ADD COLUMN: defaults not supported — existing rows read as NULL")
        StructField(add.fieldNames.head, add.dataType, add.isNullable)
      case other => throw new UnsupportedOperationException(
        s"graft catalog supports only ADD COLUMN (nullable, appended); got $other")
    }
    BucketStore.addColumns(ident.name(), fields)
    loadTable(ident)
  }

  override def dropTable(ident: Identifier): Boolean = BucketStore.drop(ident.name())

  override def tableExists(ident: Identifier): Boolean = BucketStore.exists(ident.name())

  override def renameTable(oldIdent: Identifier, newIdent: Identifier): Unit =
    throw new UnsupportedOperationException("read-only catalog")

  // — FunctionCatalog —

  override def listFunctions(namespace: Array[String]): Array[Identifier] =
    Array(Identifier.of(Array.empty, "bucket"))

  override def loadFunction(ident: Identifier): UnboundFunction =
    if (ident.name() == "bucket") BucketFunction
    else throw new UnsupportedOperationException(s"no such function: $ident")

  // — ProcedureCatalog (store maintenance via SQL CALL) —

  override def listProcedures(namespace: Array[String]): Array[Identifier] =
    Array(Identifier.of(Array.empty, "vacuum"), Identifier.of(Array.empty, "history"),
      Identifier.of(Array.empty, "rebucket"), Identifier.of(Array.empty, "rebucket_hrw"),
      Identifier.of(Array.empty, "recluster"),
      Identifier.of(Array.empty, "repartition_range"), Identifier.of(Array.empty, "stats"),
      Identifier.of(Array.empty, "analyze"), Identifier.of(Array.empty, "compact"),
      Identifier.of(Array.empty, "reorder"), Identifier.of(Array.empty, "tag"),
      Identifier.of(Array.empty, "branch"), Identifier.of(Array.empty, "publish_branch"),
      Identifier.of(Array.empty, "drop_branch"), Identifier.of(Array.empty, "rollback"),
      Identifier.of(Array.empty, "rebase_branch"), Identifier.of(Array.empty, "refresh"),
      Identifier.of(Array.empty, "refresh_policy"),
      Identifier.of(Array.empty, "retention"))

  override def loadProcedure(ident: Identifier)
      : org.apache.spark.sql.connector.catalog.procedures.UnboundProcedure =
    ident.name() match {
      case "vacuum" => BucketedProcedures.Vacuum
      case "history" => BucketedProcedures.History
      case "rebucket" => BucketedProcedures.Rebucket
      case "rebucket_hrw" => BucketedProcedures.RebucketHrw
      case "recluster" => BucketedProcedures.Recluster
      case "repartition_range" => BucketedProcedures.RepartitionRange
      case "stats" => BucketedProcedures.Stats
      case "analyze" => BucketedProcedures.Analyze
      case "refresh" => BucketedProcedures.Refresh
      case "refresh_policy" => BucketedProcedures.RefreshPolicy
      case "retention" => BucketedProcedures.Retention
      case "compact" => BucketedProcedures.Compact
      case "reorder" => BucketedProcedures.Reorder
      case "tag" => BucketedProcedures.Tag
      case "branch" => BucketedProcedures.Branch
      case "publish_branch" => BucketedProcedures.PublishBranch
      case "drop_branch" => BucketedProcedures.DropBranch
      case "rollback" => BucketedProcedures.Rollback
      case "rebase_branch" => BucketedProcedures.RebaseBranch
      case other => throw new UnsupportedOperationException(
        s"no such procedure: $other (supported: analyze, branch, compact, drop_branch, " +
          "history, publish_branch, rebase_branch, rebucket, rebucket_hrw, recluster, " +
          "reorder, repartition_range, rollback, stats, tag, vacuum)")
    }
}

/** The store's bucketing function: pmod(murmur3(key), numBuckets) —
  * byte-identical to the `pmod(hash(key), n)` used at load time
  * ([[BucketStore.load]]), which is what makes reported partitioning
  * trustworthy.
  */
object BucketFunction extends UnboundFunction {
  override def name(): String = "bucket"
  override def description(): String = "bucket(numBuckets, key): graft store hash bucketing"

  override def bind(inputType: StructType): BoundFunction = {
    require(inputType.length == 2, s"bucket expects (numBuckets, key), got $inputType")
    inputType.fields(1).dataType match {
      case LongType => LongBucketFunction
      case IntegerType => IntBucketFunction
      case StringType => StringBucketFunction
      case DateType => DateBucketFunction
      case t => throw new UnsupportedOperationException(s"bucket key type $t")
    }
  }

  private def pmod(h: Int, n: Int): Int = { val m = h % n; if (m < 0) m + n else m }

  /** THE key-hash domain both placement functions share: Murmur3
    * seed 42 over the key's Spark-hash representation — longs/ints as
    * themselves, strings as their UTF-8 bytes (exactly Spark's
    * `hash()` of a StringType column), dates as their epoch-day Int,
    * null as the seed. `None` for any other type — mod and HRW layouts
    * disagree only in PLACEMENT ([[BucketStore.hrwBucketFor]] argmaxes
    * where this pmods), never in what is routable.
    */
  private[bucketed] def keyHash32(value: Any): Option[Int] = value match {
    case v: Long => Some(Murmur3_x86_32.hashLong(v, 42))
    case v: Int => Some(Murmur3_x86_32.hashInt(v, 42))
    case v: String =>
      val u = org.apache.spark.unsafe.types.UTF8String.fromString(v)
      Some(Murmur3_x86_32.hashUnsafeBytes(u.getBaseObject, u.getBaseOffset, u.numBytes, 42))
    case v: java.sql.Date =>
      Some(Murmur3_x86_32.hashInt(
        org.apache.spark.sql.catalyst.util.DateTimeUtils.fromJavaDate(v), 42))
    // Spark's hash(NULL) is the seed itself — load-time pmod(hash(k), n)
    // therefore puts null keys in bucket pmod(42, n); the writer must
    // agree byte-for-byte
    case null => Some(42)
    case _ => None
  }

  /** The bucket a key VALUE lands in — byte-identical to the
    * load-time `pmod(hash(col), n)` (Murmur3 seed 42) for the key
    * types the store buckets on (integrals, strings, dates). `None`
    * for any other type: the caller must then NOT prune (correctness
    * over cleverness).
    */
  def bucketFor(value: Any, numBuckets: Int): Option[Int] =
    keyHash32(value).map(pmod(_, numBuckets))

  object LongBucketFunction extends ScalarFunction[Integer] {
    override def inputTypes(): Array[DataType] = Array(IntegerType, LongType)
    override def resultType(): DataType = IntegerType
    override def name(): String = "bucket"
    override def canonicalName(): String = "graft.bucket.long"
    override def produceResult(input: InternalRow): Integer =
      pmod(Murmur3_x86_32.hashLong(input.getLong(1), 42), input.getInt(0))
  }

  object IntBucketFunction extends ScalarFunction[Integer] {
    override def inputTypes(): Array[DataType] = Array(IntegerType, IntegerType)
    override def resultType(): DataType = IntegerType
    override def name(): String = "bucket"
    override def canonicalName(): String = "graft.bucket.int"
    override def produceResult(input: InternalRow): Integer =
      pmod(Murmur3_x86_32.hashInt(input.getInt(1), 42), input.getInt(0))
  }

  /** String keys hash their UTF-8 bytes — the exact bytes Spark's own
    * `hash()` hashes for a StringType column, so the SQL transform,
    * the writer ([[BucketStore.routeBucket]]), and the pruner agree on
    * a URL/content-hash keyed corpus the way they do on a numeric id.
    */
  object StringBucketFunction extends ScalarFunction[Integer] {
    override def inputTypes(): Array[DataType] = Array(IntegerType, StringType)
    override def resultType(): DataType = IntegerType
    override def name(): String = "bucket"
    override def canonicalName(): String = "graft.bucket.string"
    override def produceResult(input: InternalRow): Integer = {
      val u = input.getUTF8String(1)
      pmod(Murmur3_x86_32.hashUnsafeBytes(u.getBaseObject, u.getBaseOffset, u.numBytes, 42),
        input.getInt(0))
    }
  }

  /** Date keys hash their epoch-day Int (Spark's internal DateType). */
  object DateBucketFunction extends ScalarFunction[Integer] {
    override def inputTypes(): Array[DataType] = Array(IntegerType, DateType)
    override def resultType(): DataType = IntegerType
    override def name(): String = "bucket"
    override def canonicalName(): String = "graft.bucket.date"
    override def produceResult(input: InternalRow): Integer =
      pmod(Murmur3_x86_32.hashInt(input.getInt(1), 42), input.getInt(0))
  }
}
