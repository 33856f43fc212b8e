package graft.sources.bucketed

import java.nio.file.{Files, Path, StandardCopyOption}

/** The storage primitives the COMMIT PROTOCOL's correctness actually
  * rests on, extracted behind one seam so the protocol is portable to
  * the object stores where 100 TB corpora live. Everything else
  * [[FileStore]] does (immutable uniquely-named block files, manifest
  * JSON, retention refcounts) is plain data movement; exactly three
  * properties are load-bearing and storage-specific:
  *
  *  1. **Conditional put** ([[putIfAbsent]]): publishing manifest
  *     version v must be an atomic create-if-absent — two writers
  *     racing the same version produce exactly one winner and a LOUD
  *     loser, and a reader never observes a torn manifest. Local FS:
  *     write-temp + link(2) (EEXIST is the CAS failure; rename(2)
  *     silently replaces, so a plain atomic move is NOT a CAS). S3:
  *     `PutObject` with `If-None-Match: *` (412 = lost the race);
  *     GCS: `x-goog-if-generation-match: 0`; ADLS2: create with
  *     `If-None-Match: *`. All of these are server-side atomic and
  *     all-or-nothing, so the temp-file staging step simply
  *     disappears there.
  *  2. **List-after-write visibility** ([[list]]): the pre-flight
  *     listing every commit runs (highest version present) and the
  *     open path's manifest discovery must see every completed put.
  *     Local FS: directory listing is immediately consistent. S3 has
  *     been strongly read-after-write + list-after-write consistent
  *     since 2020 (GCS/ADLS2 likewise), with the one operational
  *     caveat that listings PAGINATE — a binding must drain
  *     continuation tokens before answering, never return page one.
  *  3. **Age source** ([[modifiedMillis]]): the vacuum retention
  *     floor refuses to delete objects younger than `minAgeMs`, so
  *     GC needs each candidate's write time. Local FS: POSIX mtime.
  *     S3/GCS/ADLS2: the object's `Last-Modified` / generation time —
  *     server-assigned at put, immutable (objects are never edited in
  *     place), which is STRONGER than mtime: nothing can touch(1) an
  *     object into looking fresh or stale.
  *
  * [[putReplace]] is the one sanctioned in-place rewrite
  * (re-publishing the CURRENT version's manifest with richer
  * statistics — same snapshot, same name): last-writer-wins is
  * acceptable there by construction, so a plain unconditional put
  * serves it on every store. [[delete]] needs only best-effort
  * idempotence (GC re-runs).
  *
  * The one shipped binding is [[LocalFsSubstrate]];
  * CommitSubstrateContractSpec is the conformance test any future
  * binding must pass (the contract is asserted, not assumed). The
  * protocol code in [[FileStore]] routes every commit-path storage
  * touch through [[FileStore.substrate]].
  */
trait CommitSubstrate {

  /** Atomically publish `bytes` at `dir/name` iff no object exists
    * there. Throws [[java.nio.file.FileAlreadyExistsException]] when
    * another writer already published `name` — the commit-race CAS
    * failure, which the caller maps to a retryable conflict. After a
    * successful return the object is complete, readable, and visible
    * to [[list]].
    */
  def putIfAbsent(dir: Path, name: String, bytes: Array[Byte]): Unit

  /** Unconditionally (re)publish `bytes` at `dir/name`, atomically —
    * readers see the old content or the new, never a mix.
    */
  def putReplace(dir: Path, name: String, bytes: Array[Byte]): Unit

  /** Drain `f` over the complete current listing of `dir` (empty for
    * a missing dir). Bindings must return the FULL listing — on
    * paginated stores that means draining every continuation token —
    * and must reflect every [[putIfAbsent]]/[[putReplace]] that
    * returned before this call started.
    */
  def list[T](dir: Path)(f: Iterator[Path] => T): T

  /** Epoch millis the object at `p` was last written, or None if it
    * no longer exists. The GC retention floor's age source.
    */
  def modifiedMillis(p: Path): Option[Long]

  /** The object's full content, or None if it does not exist. After a
    * successful [[putIfAbsent]]/[[putReplace]] a read returns the
    * complete put bytes — never a torn prefix (read-after-write).
    */
  def getBytes(p: Path): Option[Array[Byte]]

  /** Best-effort idempotent delete. */
  def delete(p: Path): Unit
}

/** The local-filesystem binding — the one implementation in this
  * environment. CAS = write-temp + hard link (per-attempt unique temp
  * name, so two same-version racers in one directory never stage
  * through the same file); age = POSIX mtime; listing = one readdir.
  */
object LocalFsSubstrate extends CommitSubstrate {
  import scala.jdk.CollectionConverters._

  private val attempt = new java.util.concurrent.atomic.AtomicLong()

  def putIfAbsent(dir: Path, name: String, bytes: Array[Byte]): Unit = {
    Files.createDirectories(dir)
    val tmp = dir.resolve(s".$name.${attempt.incrementAndGet()}.tmp")
    Files.write(tmp, bytes)
    val target = dir.resolve(name)
    try {
      // hard-link is the POSIX create-if-absent primitive (rename(2)
      // silently replaces, so ATOMIC_MOVE alone is NOT a CAS): link()
      // fails with EEXIST when another writer already committed this
      // name, and the published file appears atomically — a reader
      // never sees a torn object
      try Files.createLink(target, tmp)
      catch {
        case _: UnsupportedOperationException =>
          // no-hardlink filesystems: existence check + plain atomic
          // move — a weaker CAS window, still loud in practice
          if (Files.exists(target))
            throw new java.nio.file.FileAlreadyExistsException(target.toString)
          Files.move(tmp, target, StandardCopyOption.ATOMIC_MOVE)
      }
    } finally Files.deleteIfExists(tmp)
    ()
  }

  def putReplace(dir: Path, name: String, bytes: Array[Byte]): Unit = {
    Files.createDirectories(dir)
    val tmp = dir.resolve(s".$name.${attempt.incrementAndGet()}.tmp")
    Files.write(tmp, bytes)
    Files.move(tmp, dir.resolve(name), StandardCopyOption.ATOMIC_MOVE,
      StandardCopyOption.REPLACE_EXISTING)
    ()
  }

  /** `Files.list` holds an open directory fd until closed, and the
    * pre-flight listing runs on EVERY publish, so leaking it to GC
    * scales descriptor pressure with commit rate.
    */
  def list[T](dir: Path)(f: Iterator[Path] => T): T =
    if (!Files.isDirectory(dir)) f(Iterator.empty)
    else {
      val s = Files.list(dir)
      try f(s.iterator().asScala) finally s.close()
    }

  def modifiedMillis(p: Path): Option[Long] =
    try Some(Files.getLastModifiedTime(p).toMillis)
    catch { case _: java.io.IOException => None }

  def getBytes(p: Path): Option[Array[Byte]] =
    try Some(Files.readAllBytes(p))
    catch { case _: java.io.IOException => None }

  def delete(p: Path): Unit = { Files.deleteIfExists(p); () }
}

/** An in-memory binding with OBJECT-STORE semantics — flat keyspace,
  * server-side-atomic conditional put, no directories, no staging
  * files, write-time stamps. It exists for two reasons: the contract
  * suite runs against it alongside [[LocalFsSubstrate]], proving the
  * contract is implementation-agnostic (a trait with one
  * implementation is a rename, not a seam); and it is the executable
  * sketch of what an S3 binding looks like — each method body maps
  * 1:1 to one S3 call, annotated below. Metadata-plane only: block
  * files are parquet on real paths, so this binding cannot host a
  * table by itself in this environment.
  */
final class HeapObjectSubstrate extends CommitSubstrate {
  // key = the object's full path string (S3: bucket/key)
  private val objects =
    new java.util.concurrent.ConcurrentHashMap[String, (Array[Byte], Long)]()

  /** S3: PutObject with `If-None-Match: *` — 412 ⇒ already exists. */
  def putIfAbsent(dir: Path, name: String, bytes: Array[Byte]): Unit = {
    val k = dir.resolve(name).toString
    if (objects.putIfAbsent(k, (bytes.clone(), System.currentTimeMillis())) != null)
      throw new java.nio.file.FileAlreadyExistsException(k)
  }

  /** S3: plain PutObject (last writer wins, atomic per object). */
  def putReplace(dir: Path, name: String, bytes: Array[Byte]): Unit = {
    objects.put(dir.resolve(name).toString, (bytes.clone(), System.currentTimeMillis()))
    ()
  }

  /** S3: ListObjectsV2 under the prefix, DRAINING continuation tokens
    * (modeled by iterating the whole map — the binding must never
    * answer with page one).
    */
  def list[T](dir: Path)(f: Iterator[Path] => T): T = {
    val prefix = dir.toString + java.io.File.separator
    import scala.jdk.CollectionConverters._
    f(objects.keySet().asScala.iterator
      .filter(k => k.startsWith(prefix) && !k.stripPrefix(prefix).contains(java.io.File.separator))
      .map(java.nio.file.Paths.get(_)))
  }

  /** S3: the object's `Last-Modified` — server-assigned at put. */
  def modifiedMillis(p: Path): Option[Long] =
    Option(objects.get(p.toString)).map(_._2)

  /** S3: GetObject. */
  def getBytes(p: Path): Option[Array[Byte]] =
    Option(objects.get(p.toString)).map(_._1.clone())

  /** S3: DeleteObject (idempotent by contract). */
  def delete(p: Path): Unit = { objects.remove(p.toString); () }
}
