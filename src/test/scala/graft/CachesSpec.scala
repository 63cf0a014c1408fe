package graft

import org.apache.spark.storage.StorageLevel

class CachesSpec extends SparkSpec {

  test("withScope releases exactly this scope's caches, not the global ones") {
    Caches.unpersistAll()
    val outside = Caches.track(spark.range(10).toDF("a").persist())
    outside.count()
    Caches.withScope {
      val inside = Caches.track(spark.range(20).toDF("b").persist())
      inside.count()
      assert(inside.storageLevel != StorageLevel.NONE)
    }
    // scope closed: its cache is gone, the globally tracked one survives
    assert(outside.storageLevel != StorageLevel.NONE,
      "global cache must survive a scope close")
    Caches.unpersistAll()
    assert(outside.storageLevel == StorageLevel.NONE)
  }

  test("concurrent scopes on different threads do not unpersist each other") {
    Caches.unpersistAll()
    import java.util.concurrent.CountDownLatch
    val aTracked = new CountDownLatch(1)
    val bClosed = new CountDownLatch(1)
    @volatile var aLevelAfterBClose: StorageLevel = null
    val a = new Thread(() => Caches.withScope {
      val dfA = Caches.track(spark.range(30).toDF("a").persist())
      dfA.count()
      aTracked.countDown()
      bClosed.await() // B's scope has opened, tracked, and closed
      aLevelAfterBClose = dfA.storageLevel
    })
    val b = new Thread(() => {
      aTracked.await()
      Caches.withScope {
        Caches.track(spark.range(40).toDF("b").persist()).count()
      } // closes B's scope while A's is still open
      bClosed.countDown()
    })
    a.start(); b.start(); a.join(30000); b.join(30000)
    assert(aLevelAfterBClose != null && aLevelAfterBClose != StorageLevel.NONE,
      "thread B's scope close must not unpersist thread A's live cache")
  }

  test("withScope restores the outer scope and releases on failure") {
    Caches.unpersistAll()
    var inner: org.apache.spark.sql.DataFrame = null
    Caches.withScope {
      intercept[RuntimeException] {
        Caches.withScope {
          inner = Caches.track(spark.range(5).toDF("x").persist())
          inner.count()
          throw new RuntimeException("boom")
        }
      }
      assert(inner.storageLevel == StorageLevel.NONE,
        "failed scope must still release its caches")
      // outer scope is active again: tracking goes to it, not global
      val outer = Caches.track(spark.range(6).toDF("y").persist())
      outer.count()
    }
  }
}
