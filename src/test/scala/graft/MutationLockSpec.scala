package graft

import graft.format.{GpxDelete, GpxMutationLock}
import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.sources.LessThan

/** The storage-level mutation mutex: concurrent destructive ops fail
  * fast instead of silently duplicating survivors (publish-then-retire
  * race), stale locks of crashed drivers are stolen after the TTL. */
class MutationLockSpec extends GraftSpec {
  private def sp = spark
  private val conf = new Configuration()

  private def writeRange(dir: String, n: Int): Unit = {
    val sp2 = sp
    import sp2.implicits._
    (0 until n).map(i => (i.toLong, s"row$i")).toDF("id", "s")
      .coalesce(1).write.format("gpx").mode("overwrite").save(dir)
  }

  test("a held lock makes DELETE fail fast with the holder's description") {
    val dir = java.nio.file.Files.createTempDirectory("mutlock").toString
    writeRange(dir, 100)
    val schema = sp.read.format("gpx").load(dir).schema
    val h = GpxMutationLock.acquire(dir, conf, "test-holder-op")
    try {
      val e = intercept[java.util.ConcurrentModificationException] {
        GpxDelete.run(schema, Seq(dir), Array(LessThan("id", 10L)))
      }
      assert(e.getMessage.contains("test-holder-op"))
      // refused op left the table untouched
      assert(sp.read.format("gpx").load(dir).count() == 100)
    } finally GpxMutationLock.release(h)
    // released: the same DELETE now runs (and releases its own lock)
    GpxDelete.run(schema, Seq(dir), Array(LessThan("id", 10L)))
    assert(sp.read.format("gpx").load(dir).count() == 90)
    assert(!new java.io.File(dir, GpxMutationLock.LockName).exists())
  }

  test("a stale lock (crashed holder) is stolen after the TTL") {
    val dir = java.nio.file.Files.createTempDirectory("mutlock2").toString
    writeRange(dir, 50)
    // fake a crashed holder: lock file whose mtime is far in the past
    val fs = new Path(dir).getFileSystem(conf)
    val lock = new Path(dir, GpxMutationLock.LockName)
    val out = fs.create(lock, false)
    out.write("dead-token\ncrashed-op\n0".getBytes("UTF-8")); out.close()
    fs.setTimes(lock, System.currentTimeMillis() - 24 * 3600 * 1000L, -1)
    val h = GpxMutationLock.acquire(dir, conf, "stealer")
    try assert(h.token != "dead-token")
    finally GpxMutationLock.release(h)
    assert(!fs.exists(lock))
  }

  test("release is ownership-checked: a stolen-from holder cannot drop the thief's lock") {
    val dir = java.nio.file.Files.createTempDirectory("mutlock3").toString
    writeRange(dir, 10)
    val fs = new Path(dir).getFileSystem(conf)
    val slow = GpxMutationLock.acquire(dir, conf, "slow-op")
    // simulate the TTL elapsing, then a second driver stealing
    fs.setTimes(slow.path, System.currentTimeMillis() - 24 * 3600 * 1000L, -1)
    val thief = GpxMutationLock.acquire(dir, conf, "thief-op")
    // the slow holder wakes up and releases: must be a no-op
    GpxMutationLock.release(slow)
    assert(fs.exists(thief.path), "thief's lock survived the stale release")
    GpxMutationLock.release(thief)
    assert(!fs.exists(thief.path))
  }

  test("a holder past the TTL never deletes on release (steal race window)") {
    val dir = java.nio.file.Files.createTempDirectory("mutlock4").toString
    writeRange(dir, 10)
    val fs = new Path(dir).getFileSystem(conf)
    val h = GpxMutationLock.acquire(dir, conf, "slow-op")
    // simulate the hold having outlived the TTL: release must leave the
    // file (a thief may own it NOW, between our token read and delete)
    val aged = h.copy(acquiredAtMs =
      System.currentTimeMillis() - h.ttlAtAcquireMs - 1000L)
    GpxMutationLock.release(aged)
    assert(fs.exists(h.path), "TTL-expired release must not delete")
    fs.delete(h.path, false) // cleanup
  }

  test("sidecar-state fingerprint detects a concurrent merge-on-read mask") {
    val dir = java.nio.file.Files.createTempDirectory("mutlock5").toString
    writeRange(dir, 100)
    val captured = GpxMutationLock.sidecarState(dir, conf)
    // a concurrent MOR delete lands after this op 'planned'
    val schema = sp.read.format("gpx").load(dir).schema
    val prev = sp.conf.getOption("spark.graft.gpx.deleteMode")
    sp.conf.set("spark.graft.gpx.deleteMode", "mor")
    try GpxDelete.run(schema, Seq(dir), Array(LessThan("id", 5L)))
    finally prev match {
      case Some(v) => sp.conf.set("spark.graft.gpx.deleteMode", v)
      case None => sp.conf.unset("spark.graft.gpx.deleteMode")
    }
    val e = intercept[java.util.ConcurrentModificationException] {
      GpxMutationLock.verifySidecarsUnchanged(dir, conf, captured, "test-op")
    }
    assert(e.getMessage.contains("sidecars changed"))
    // a fresh capture reflects the new state and passes
    GpxMutationLock.verifySidecarsUnchanged(dir, conf,
      GpxMutationLock.sidecarState(dir, conf), "test-op")
  }
}
