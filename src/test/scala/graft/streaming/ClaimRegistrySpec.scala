package graft.streaming

import java.net.URI

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{FSDataInputStream, Path, RawLocalFileSystem}
import org.scalatest.funsuite.AnyFunSuite

/** A local filesystem whose `open` throws FileNotFoundException for named
  * claim files — deterministically reproducing the list/read and
  * create/read races where another writer releases a claim between this
  * writer's two filesystem calls.
  */
private class VanishingOpenFs(denyNames: Set[String]) extends RawLocalFileSystem {
  initialize(URI.create("file:///"), new Configuration())
  override def open(f: Path, bufferSize: Int): FSDataInputStream =
    if (denyNames(f.getName))
      throw new java.io.FileNotFoundException(s"vanished: $f")
    else super.open(f, bufferSize)
}

class ClaimRegistrySpec extends AnyFunSuite {

  private def freshDir(): Path = new Path(
    java.nio.file.Files.createTempDirectory("claimreg").toString)

  private def realFs = {
    val fs = new RawLocalFileSystem()
    fs.initialize(URI.create("file:///"), new Configuration())
    fs
  }

  private def writeClaim(dir: Path, version: String, owner: String): Unit = {
    val fs = realFs
    fs.mkdirs(dir)
    val out = fs.create(new Path(dir, version), true)
    try out.write(owner.getBytes("UTF-8")) finally out.close()
  }

  private val v1 = "v_" + "0" * 19 + "1"
  private val v2 = "v_" + "0" * 19 + "2"

  test("a claim vanishing between create-conflict and owner read is a retryable conflict") {
    val dir = freshDir()
    // the claim exists (create-if-absent will fail) but every read of it
    // sees it already deleted — the racer released between our two calls
    writeClaim(dir, v1, "other-writer")
    val reg = new ClaimRegistry(() => new VanishingOpenFs(Set(v1)), dir, "me")
    val ex = intercept[ConcurrentWriteException] {
      reg.acquire(v1, None, () => None)
    }
    assert(ex.getMessage.contains("vanished"),
      s"expected the race-translated message, got: ${ex.getMessage}")
  }

  test("outstanding drops a claim deleted between the listing and its owner read") {
    val dir = freshDir()
    writeClaim(dir, v1, "w1")
    writeClaim(dir, v2, "w2")
    val reg = new ClaimRegistry(() => new VanishingOpenFs(Set(v1)), dir, "me")
    // v1 is listed but unreadable (released mid-scan): the scan must not
    // throw, and must report only the still-live claim
    assert(reg.outstanding == Seq(v2 -> "w2"))
  }

  test("an owned live foreign claim still raises the ownership conflict") {
    val dir = freshDir()
    writeClaim(dir, v1, "other-writer")
    val reg = new ClaimRegistry(() => new VanishingOpenFs(Set.empty), dir, "me")
    val ex = intercept[ConcurrentWriteException] {
      reg.acquire(v1, None, () => None)
    }
    assert(ex.getMessage.contains("other-writer"))
  }
}
