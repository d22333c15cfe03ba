package graft

import org.scalatest.funsuite.AnyFunSuite

/** CacheLifecycle — the self-release listener behind the public-API
  * cached intermediates. Pins the r19-ADVICE leak bound: listeners
  * for frames that are never materialized are evicted (unregistered
  * AND released) once more than [[CacheLifecycle.MaxOutstanding]] are
  * outstanding, and a materialized frame removes its own listener.
  */
class CacheLifecycleSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  test("abandoned frames evict oldest-first past the cap; fire removes self") {
    import spark.implicits._
    val before = CacheLifecycle.outstandingCount
    var released = Vector.empty[Int]
    // register cap+3 listeners, never materializing any frame
    val n = CacheLifecycle.MaxOutstanding + 3
    (1 to n).foreach { i =>
      CacheLifecycle.selfReleasing(
        Seq(i).toDF("x"), () => released :+= i)
    }
    assert(CacheLifecycle.outstandingCount - before <= CacheLifecycle.MaxOutstanding,
      "outstanding listeners must be capped")
    // the 3 oldest of THIS batch were evicted and their releases ran
    // (pre-existing outstanding listeners, if any, evict first)
    assert(released.size >= 3, s"expected >= 3 evictions, got $released")
    assert(released == released.sorted, "eviction must be oldest-first")

    // a materialized frame fires its listener and leaves the queue
    val mid = CacheLifecycle.outstandingCount
    var fired = false
    val df = CacheLifecycle.selfReleasing(
      Seq(1, 2, 3).toDF("x"), () => fired = true)
    assert(df.count() == 3)
    // QueryExecutionListener delivery is async — poll for the fire
    val deadline = System.nanoTime() + 5e9.toLong
    while (!fired && System.nanoTime() < deadline) Thread.sleep(10)
    assert(fired, "listener must release after the first materialization")
    assert(CacheLifecycle.outstandingCount <= mid,
      "a fired listener must remove itself from the outstanding queue")
  }
}
