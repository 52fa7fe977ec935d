package graft.tools

/** Micro-profile for the SpaceSaving summary's update path (dev tool —
  * no Spark session needed: the structure under test is the aggregation
  * buffer itself). Streams a deterministic zipf-ish token mix through
  * Summary.offer at several capacities and prints Mtokens/s; the point
  * is that throughput stays flat as m grows (O(log m) eviction), where
  * the pre-heap O(m) min-scan collapsed quadratically once the stream's
  * distinct count exceeded m.
  */
object ProfileHeavyHitters {
  def main(args: Array[String]): Unit = {
    val nTokens = if (args.nonEmpty) args(0).toInt else 5000000
    // zipf-ish skew over a vocabulary ~4x the largest capacity tested:
    // frequent heads hit the in-summary fast path, the long tail forces
    // evictions — the regime SpaceSaving exists for
    val vocab = 4000000
    def stream(m: Int): Double = {
      val s = new graft.functions.HeavyHitters.Summary(m)
      var x = 88172645463325252L // deterministic xorshift
      var i = 0
      val t0 = System.nanoTime()
      while (i < nTokens) {
        x ^= x << 13; x ^= x >>> 7; x ^= x << 17
        val u = (x >>> 11).toDouble / (1L << 53).toDouble
        val id = math.min((u * u * u * vocab).toInt, vocab - 1)
        s.offer("t" + id, 1L, 0L)
        i += 1
      }
      nTokens / ((System.nanoTime() - t0) / 1e3)
    }
    stream(1000) // warm up JIT
    for (m <- Seq(10000, 100000, 1000000)) {
      val mps = stream(m)
      println(f"[profile] m=$m%7d: $mps%.1f Mtokens/s")
    }
    // the pre-heap O(m) min-scan, for the ratio (same stream, fewer
    // tokens — at m = 10^5 it is already orders slower)
    def streamScan(m: Int, tokens: Int): Double = {
      val entries = scala.collection.mutable.HashMap[String, (Long, Long)]()
      var x = 88172645463325252L
      var i = 0
      val t0 = System.nanoTime()
      while (i < tokens) {
        x ^= x << 13; x ^= x >>> 7; x ^= x << 17
        val u = (x >>> 11).toDouble / (1L << 53).toDouble
        val t = "t" + math.min((u * u * u * vocab).toInt, vocab - 1)
        entries.get(t) match {
          case Some((c0, e0)) => entries.put(t, (c0 + 1, e0))
          case None =>
            if (entries.size < m) entries.put(t, (1L, 0L))
            else {
              var minT: String = null; var minC = Long.MaxValue; var minE = -1L
              entries.foreach { case (t0x, (c0, e0)) =>
                if (c0 < minC || (c0 == minC && (e0 > minE ||
                    (e0 == minE && (minT == null || t0x > minT))))) {
                  minT = t0x; minC = c0; minE = e0
                }
              }
              entries.remove(minT)
              entries.put(t, (minC + 1, minC))
            }
        }
        i += 1
      }
      tokens / ((System.nanoTime() - t0) / 1e3)
    }
    for (m <- Seq(10000, 100000)) {
      val mps = streamScan(m, nTokens / 50)
      println(f"[profile] min-scan m=$m%7d: $mps%.3f Mtokens/s")
    }
  }
}
