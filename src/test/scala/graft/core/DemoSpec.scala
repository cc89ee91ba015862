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

  test("dirTag distinguishes source dirs sharing a basename; filesystem-safe") {
    val a = Demo.dirTag("/data/x/sf0.01")
    val b = Demo.dirTag("/data/y/sf0.01")
    assert(a != b, "same basename under different parents must not collide")
    assert(a == Demo.dirTag("/data/x/sf0.01"), "stable")
    assert(a.matches("[A-Za-z0-9._-]+"), s"filesystem-safe, got $a")
  }

  test("refreshCopy resets the destination to a flat copy of the source") {
    val src = java.nio.file.Files.createTempDirectory("demo-copy-src")
    val dst = java.nio.file.Files.createTempDirectory("demo-copy-dst")
    java.nio.file.Files.write(src.resolve("a.txt"), "aa".getBytes)
    java.nio.file.Files.write(src.resolve("b.txt"), "bb".getBytes)
    java.nio.file.Files.write(dst.resolve("stale.txt"), "zz".getBytes)
    Demo.refreshCopy(src.toString, dst.toString)
    val got = Option(dst.toFile.listFiles).get.map(_.getName).sorted.toSeq
    assert(got == Seq("a.txt", "b.txt"), s"stale files must not survive, got $got")
    assert(new String(java.nio.file.Files.readAllBytes(dst.resolve("a.txt"))) == "aa")
    // idempotent: a second refresh over the fresh copy is a no-op set
    Demo.refreshCopy(src.toString, dst.toString)
    assert(Option(dst.toFile.listFiles).get.length == 2)
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
