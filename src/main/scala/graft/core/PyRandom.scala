package graft.core

/** Bit-exact reimplementation of CPython's seeded sampling:
  * `random.seed(n); random.sample(population, k)` — the reference
  * seeds the stdlib RNG for its reproducible subset selections
  * (`random.seed(27)`/`sample` at `dags/my_dag.py:55-57` and
  * `random.seed(20)`/`sample(…, 1)` at `dags/my_dag.py:109-111`).
  *
  * Three public-spec pieces compose:
  *  - MT19937 (Matsumoto & Nishimura 1998) with the `init_by_array`
  *    seeding CPython applies to integer seeds (the |n| split into
  *    little-endian 32-bit words);
  *  - `getrandbits(k)` (top k bits of one tempered word for k ≤ 32)
  *    and `_randbelow(n)` (rejection on `n.bit_length()` bits);
  *  - `sample`'s two selection paths — partial Fisher–Yates over a
  *    pool when the population is small relative to k, otherwise
  *    rejection against a seen-set — switched on CPython's exact
  *    `setsize` rule.
  *
  * DRIVER-SIDE by design, like CPython itself: the reference samples
  * small id lists held in Python memory. The distributed,
  * engine-scale analogues are `Ops.sampleN` (scramble-ranked) and
  * friends; this class exists so the pipeline twin can reproduce the
  * reference's picks bit-for-bit given the same population order.
  * All golden values in PyRandomSpec were generated with CPython 3.
  */
final class PyRandom private (key: Array[Int]) {

  def this(seed: Long) = this(PyRandom.seedKey(BigInt(seed)))
  def this(seed: BigInt) = this(PyRandom.seedKey(seed))

  private val N = 624
  private val mt = new Array[Int](N)
  private var mti = N + 1
  initByArray(key)

  private def initGenrand(s: Int): Unit = {
    mt(0) = s
    var i = 1
    while (i < N) {
      mt(i) = 1812433253 * (mt(i - 1) ^ (mt(i - 1) >>> 30)) + i
      i += 1
    }
    mti = N
  }

  private def initByArray(initKey: Array[Int]): Unit = {
    initGenrand(19650218)
    var i = 1
    var j = 0
    var k = math.max(N, initKey.length)
    while (k > 0) {
      mt(i) = (mt(i) ^ ((mt(i - 1) ^ (mt(i - 1) >>> 30)) * 1664525)) + initKey(j) + j
      i += 1; j += 1
      if (i >= N) { mt(0) = mt(N - 1); i = 1 }
      if (j >= initKey.length) j = 0
      k -= 1
    }
    k = N - 1
    while (k > 0) {
      mt(i) = (mt(i) ^ ((mt(i - 1) ^ (mt(i - 1) >>> 30)) * 1566083941)) - i
      i += 1
      if (i >= N) { mt(0) = mt(N - 1); i = 1 }
      k -= 1
    }
    mt(0) = 0x80000000 // MSB is 1, assuring non-zero initial state
  }

  /** One tempered 32-bit word (as the low 32 bits of a Long). */
  private def genrandUint32(): Long = {
    if (mti >= N) { // generate N words at one time
      val UPPER = 0x80000000
      val LOWER = 0x7fffffff
      var kk = 0
      while (kk < N - 397) {
        val y = (mt(kk) & UPPER) | (mt(kk + 1) & LOWER)
        mt(kk) = mt(kk + 397) ^ (y >>> 1) ^ (if ((y & 1) != 0) 0x9908b0df else 0)
        kk += 1
      }
      while (kk < N - 1) {
        val y = (mt(kk) & UPPER) | (mt(kk + 1) & LOWER)
        mt(kk) = mt(kk + (397 - N)) ^ (y >>> 1) ^ (if ((y & 1) != 0) 0x9908b0df else 0)
        kk += 1
      }
      val y = (mt(N - 1) & UPPER) | (mt(0) & LOWER)
      mt(N - 1) = mt(396) ^ (y >>> 1) ^ (if ((y & 1) != 0) 0x9908b0df else 0)
      mti = 0
    }
    var y = mt(mti)
    mti += 1
    y ^= (y >>> 11)
    y ^= (y << 7) & 0x9d2c5680
    y ^= (y << 15) & 0xefc60000
    y ^= (y >>> 18)
    y.toLong & 0xffffffffL
  }

  /** CPython `getrandbits(k)` for 1 ≤ k ≤ 32: the TOP k bits of one
    * tempered word (not the low bits — the distinction that makes or
    * breaks parity). */
  def getrandbits(k: Int): Long = {
    require(k >= 1 && k <= 32, s"getrandbits supports 1..32 bits here, got $k")
    genrandUint32() >>> (32 - k)
  }

  /** CPython `_randbelow(n)`: draw `n.bit_length()` bits, reject
    * until < n. */
  def randbelow(n: Int): Int = {
    require(n > 0, s"randbelow needs n > 0, got $n")
    val k = 32 - Integer.numberOfLeadingZeros(n)
    var r = getrandbits(k)
    while (r >= n) r = getrandbits(k)
    r.toInt
  }

  /** CPython `random.sample(population, k)` — identical draws,
    * identical result order. The population ORDER is part of the
    * contract (CPython samples by index); callers define it. */
  def sample[T](population: IndexedSeq[T], k: Int): Seq[T] = {
    val n = population.length
    require(k >= 0 && k <= n, s"sample size $k out of range for population $n")
    // CPython's pool-vs-set switch: setsize = 21, plus
    // 4**ceil(log(k*3, 4)) when k > 5. k*3 is never a power of 4
    // (4^m ≡ 1 mod 3), so the ceil sits far from any ulp boundary.
    var setsize = 21
    if (k > 5)
      setsize += math.pow(4.0, math.ceil(math.log(k * 3.0) / math.log(4.0))).toInt
    if (n <= setsize) {
      // partial Fisher-Yates over a copied pool
      val pool = scala.collection.mutable.ArrayBuffer.from(population)
      (0 until k).map { i =>
        val j = randbelow(n - i)
        val v = pool(j)
        pool(j) = pool(n - i - 1)
        v
      }
    } else {
      // rejection against the already-selected index set
      val selected = scala.collection.mutable.Set.empty[Int]
      (0 until k).map { _ =>
        var j = randbelow(n)
        while (selected(j)) j = randbelow(n)
        selected += j
        population(j)
      }
    }
  }
}

object PyRandom {
  /** CPython `random.seed(int)`: |n| as little-endian 32-bit words
    * (at least one word; 0 → [0]). */
  private def seedKey(seed: BigInt): Array[Int] = {
    var a = seed.abs
    if (a == 0) Array(0)
    else {
      val words = scala.collection.mutable.ArrayBuffer.empty[Int]
      while (a > 0) {
        words += (a & 0xffffffffL).toInt
        a >>= 32
      }
      words.toArray
    }
  }
}
