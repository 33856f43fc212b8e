package graft.sources.bucketed

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Path}

import org.scalatest.funsuite.AnyFunSuite

/** The conformance contract ANY [[CommitSubstrate]] binding must pass,
  * run against BOTH shipped bindings — the local filesystem
  * ([[LocalFsSubstrate]]: link(2) CAS, POSIX mtime) and the in-memory
  * object store ([[HeapObjectSubstrate]]: S3-semantics conditional
  * put, flat keyspace) — so the contract is proven
  * implementation-agnostic, not a description of one backend. These
  * are exactly the properties the commit protocol's correctness rests
  * on; a future S3/GCS binding passes this suite or it is not a valid
  * substrate: conditional put is an atomic one-winner CAS with a loud
  * loser and intact winner content; listings are complete and
  * immediately reflect finished puts (with no staging residue); reads
  * return complete put bytes; the age source orders writes and
  * reports deletion.
  */
class CommitSubstrateContractSpec extends AnyFunSuite {

  private val bindings: Seq[(String, () => CommitSubstrate)] = Seq(
    "local-fs" -> (() => LocalFsSubstrate),
    "heap-object-store" -> (() => new HeapObjectSubstrate))

  private def tmpDir(): Path = Files.createTempDirectory("substrate-contract")

  private def bytes(s: String): Array[Byte] = s.getBytes(StandardCharsets.UTF_8)
  private def read(sub: CommitSubstrate, p: Path): String =
    new String(sub.getBytes(p).getOrElse(fail(s"expected $p to exist")),
      StandardCharsets.UTF_8)

  for ((label, mk) <- bindings) {

    test(s"[$label] putIfAbsent: a second put of the same name fails loudly, winner intact") {
      val sub = mk()
      val dir = tmpDir()
      sub.putIfAbsent(dir, "manifest-v1.json", bytes("winner"))
      val ex = intercept[java.nio.file.FileAlreadyExistsException] {
        sub.putIfAbsent(dir, "manifest-v1.json", bytes("loser"))
      }
      assert(ex.getFile != null)
      assert(read(sub, dir.resolve("manifest-v1.json")) === "winner",
        "a lost CAS must never clobber the committed object")
      // a different name still publishes
      sub.putIfAbsent(dir, "manifest-v2.json", bytes("next"))
      assert(read(sub, dir.resolve("manifest-v2.json")) === "next")
    }

    test(s"[$label] putIfAbsent: N concurrent racers on one name produce exactly one winner") {
      val sub = mk()
      val dir = tmpDir()
      val n = 16
      val wins = new java.util.concurrent.atomic.AtomicInteger()
      val losses = new java.util.concurrent.atomic.AtomicInteger()
      val start = new java.util.concurrent.CountDownLatch(1)
      val done = new java.util.concurrent.CountDownLatch(n)
      (0 until n).foreach { i =>
        new Thread(() => {
          start.await()
          try {
            sub.putIfAbsent(dir, "manifest-v7.json", bytes(s"writer-$i"))
            wins.incrementAndGet()
          }
          catch { case _: java.nio.file.FileAlreadyExistsException => losses.incrementAndGet() }
          finally done.countDown()
        }).start()
      }
      start.countDown()
      assert(done.await(30, java.util.concurrent.TimeUnit.SECONDS))
      assert(wins.get() === 1, s"exactly one of $n racers must win (got ${wins.get()})")
      assert(losses.get() === n - 1)
      val content = read(sub, dir.resolve("manifest-v7.json"))
      assert(content.startsWith("writer-"), "content must be exactly one writer's bytes, untorn")
    }

    test(s"[$label] list-after-write: a finished put is visible at once, with no residue") {
      val sub = mk()
      val dir = tmpDir()
      (1 to 5).foreach(v => sub.putIfAbsent(dir, s"manifest-v$v.json", bytes(s"v$v")))
      // a lost race must ALSO leave no residue behind
      intercept[java.nio.file.FileAlreadyExistsException] {
        sub.putIfAbsent(dir, "manifest-v3.json", bytes("late"))
      }
      val names = sub.list(dir)(_.map(_.getFileName.toString).toVector).sorted
      assert(names === (1 to 5).map(v => s"manifest-v$v.json").toVector,
        s"listing must be complete and staging-free, got $names")
      // a missing directory lists empty, not an error (open-before-create probes)
      assert(sub.list(dir.resolve("nope"))(_.toVector).isEmpty)
    }

    test(s"[$label] age source: orders writes, survives replace, reports deletion as gone") {
      val sub = mk()
      val dir = tmpDir()
      sub.putIfAbsent(dir, "a", bytes("a"))
      Thread.sleep(20)
      sub.putIfAbsent(dir, "b", bytes("b"))
      val (ageA, ageB) =
        (sub.modifiedMillis(dir.resolve("a")), sub.modifiedMillis(dir.resolve("b")))
      assert(ageA.nonEmpty && ageB.nonEmpty)
      assert(ageA.get <= ageB.get, "an earlier put must never look younger than a later one")
      assert(math.abs(System.currentTimeMillis() - ageB.get) < 60000L,
        "a fresh object's age must be current-ish, not epoch garbage")
      sub.delete(dir.resolve("a"))
      assert(sub.modifiedMillis(dir.resolve("a")).isEmpty, "deleted ⇒ None (GC treats as old)")
      assert(sub.getBytes(dir.resolve("a")).isEmpty)
      sub.delete(dir.resolve("a")) // idempotent
    }

    test(s"[$label] putReplace: atomic in-place rewrite; still exactly one listed object") {
      val sub = mk()
      val dir = tmpDir()
      sub.putIfAbsent(dir, "manifest-v1.json", bytes("lean"))
      sub.putReplace(dir, "manifest-v1.json", bytes("rich-stats"))
      assert(read(sub, dir.resolve("manifest-v1.json")) === "rich-stats")
      assert(sub.list(dir)(_.size) === 1)
    }
  }
}
