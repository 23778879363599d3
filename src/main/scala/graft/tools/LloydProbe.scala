package graft.tools

/**
 * Measures the driver-Lloyd assignment rate (distance ops/second) that
 * SCALE.md's "Lloyd at the k-clamp" row and `Ivf.plannedIters`' ops
 * budget are calibrated from. Assignment cost is exactly
 * `sample x k x d` ops per iteration — a three-deep counted loop with
 * no data-dependent branches — so measuring feasible k and
 * extrapolating linearly to the 16384 clamp is sound (and the probe
 * prints the per-k rates so the linearity claim is itself checked).
 * No Spark session: the train loop is driver-local by design.
 */
object LloydProbe {
  def main(args: Array[String]): Unit = {
    val d = 64
    val n = 100000
    // deterministic synthetic unit vectors (splitmix64 stream)
    var s = 42L
    def next(): Long = { s = graft.ext.TextOps.mix64(s); s }
    val sample = Array.fill(n) {
      val v = Array.fill(d)(((next() >>> 11).toFloat / (1L << 53)) - 0.5f)
      val norm = math.sqrt(v.map(x => x.toDouble * x).sum).toFloat
      v.map(_ / norm)
    }
    // JIT warmup
    graft.ext.Ivf.trainFromSample(sample.take(10000), 64, maxIter = 2, seed = 1L)
    for (k <- Seq(256, 1024, 4096)) {
      val iters = 2
      val t0 = System.nanoTime()
      graft.ext.Ivf.trainFromSample(sample, k, maxIter = iters, seed = 42L)
      val sec = (System.nanoTime() - t0) / 1e9
      val ops = n.toLong * k * d * iters
      val rate = ops / sec
      val clampPerIterSec = n.toLong * 16384L * d / rate
      println(f"LLOYD k=$k%5d iters=$iters n=$n d=$d wall=$sec%.2f s " +
        f"rate=${rate / 1e9}%.2f Gops/s -> extrapolated clamp (k=16384) " +
        f"per-iter=$clampPerIterSec%.0f s, 2-iter floor=${2 * clampPerIterSec}%.0f s, 10-iter=${10 * clampPerIterSec}%.0f s")
    }
  }
}
