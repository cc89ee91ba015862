package graft.core

import graft.SparkSpec

class DemoSpec extends SparkSpec {

  test("once runs a build exactly once per (session, key)") {
    var n = 0
    Demo.once(spark, "demo-spec-a") { n += 1 }
    Demo.once(spark, "demo-spec-a") { n += 1 }
    assert(n == 1, "second call must not rebuild")
    Demo.once(spark, "demo-spec-b") { n += 1 }
    assert(n == 2, "a different key builds independently")
  }

  test("a failed build caches nothing and is retried") {
    var attempts = 0
    intercept[RuntimeException] {
      Demo.once(spark, "demo-spec-fail") { attempts += 1; throw new RuntimeException("boom") }
    }
    Demo.once(spark, "demo-spec-fail") { attempts += 1 }
    assert(attempts == 2, "the failure must not be cached as a success")
    Demo.once(spark, "demo-spec-fail") { attempts += 1 }
    assert(attempts == 2, "the eventual success IS cached")
  }
}
