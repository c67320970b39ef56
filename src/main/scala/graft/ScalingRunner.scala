package graft

import org.apache.spark.sql.SparkSession

/**
 * Single-configuration scaling measurement: runs the extraction job at one
 * parallelism level and prints the best steady-state throughput. Launched
 * by [[Bench]] in a CPU-pinned child JVM (taskset) so an N-core run is a
 * faithful N-core executor emulation — without pinning, a local[N] JVM on a
 * 4N-core host runs GC/JIT on the idle cores and inflates the small-N
 * baseline, understating true cluster scaling efficiency.
 */
object ScalingRunner {

  /** Machine-ceiling microbenchmark: a pure `threads`-way regex+string loop
    * with no Spark, no shared state and near-zero allocation amortization —
    * the best thread-scaling this box can physically deliver for
    * string-processing work. On a virtualized single-socket host, memory
    * bandwidth caps this well below 1.0; the extraction's measured
    * efficiency should be read against this ceiling (a real 4N-executor
    * cluster multiplies bandwidth with node count). */
  def ceilingOpsPerSec(threads: Int): Double = {
    val pat = java.util.regex.Pattern.compile(
      "(?<name>.+?)\\s+(?<qty>[0-9\\s.,]+)\\s*(шт|кг)?\\s+(?<price>[0-9\\s.,]+)")
    val workPer = 2000000L
    def run(n: Long): Unit = {
      val ts = (0 until threads).map { t =>
        new Thread(() => {
          var acc = 0L
          var i = 0L
          while (i < n) {
            val s = "Товар А" + (i % 97) + "   " + (i % 50) + " шт  " + (i % 1000) + ",5" + t
            val m = pat.matcher(s)
            if (m.find()) acc += m.group("name").length
            i += 1
          }
          if (acc == Long.MinValue) println(acc) // keep acc alive
        })
      }
      ts.foreach(_.start()); ts.foreach(_.join())
    }
    run(workPer / 4) // warmup (JIT both the loop and the regex paths)
    var best = Double.MaxValue
    (1 to 3).foreach { _ =>
      val t0 = System.nanoTime()
      run(workPer)
      val dt = (System.nanoTime() - t0) / 1e9
      if (dt < best) best = dt
    }
    threads * workPer / best
  }

  /** REPRESENTATIVE ceiling: the exact per-turn engine (all 7 parsers) in
    * plain threads — no Spark, no scan, no row conversion. Thread-scaling
    * of this loop IS this box's physical ceiling for the actual workload
    * (allocation rate + memory bandwidth shared across one socket); the
    * Spark job cannot scale better than the computation it distributes.
    * On a real N->4N-node cluster those resources multiply with nodes. */
  def engineOpsPerSec(threads: Int): Double = {
    val texts = (0L until 2000L).map(id => graft.io.Transcripts.payload(42L, id)).toArray
    val perThread = 8000L
    def run(n: Long): Unit = {
      val ts = (0 until threads).map { t =>
        new Thread(() => {
          var acc = 0L
          var i = 0L
          while (i < n) {
            val r = graft.core.Engine.parseTurn("c", t, texts(((i + t) % texts.length).toInt))
            acc += r.best_count
            i += 1
          }
          if (acc == Long.MinValue) println(acc) // keep acc alive
        })
      }
      ts.foreach(_.start()); ts.foreach(_.join())
    }
    run(perThread / 4) // warmup
    var best = Double.MaxValue
    (1 to 3).foreach { _ =>
      val t0 = System.nanoTime()
      run(perThread)
      val dt = (System.nanoTime() - t0) / 1e9
      if (dt < best) best = dt
    }
    threads * perThread / best
  }

  /** Socket memory-bandwidth probe: `threads` streams each summing a
    * disjoint 64 MiB long[] slice (sequential reads, no allocation, no
    * sharing). If this loop's aggregate GB/s stops growing from N to 4N
    * threads, the socket's memory bus is saturated — the direct physical
    * evidence behind the scaling ceiling (a real 4N-node cluster brings
    * 4x this resource, one VM does not). */
  def memBandwidthGBps(threads: Int): Double = {
    // cap the probe's TOTAL footprint at 1 GiB (per-thread slice shrinks as
    // threads grow, floor 8 MiB so each stream stays DRAM-bound, far past
    // L2/L3 slices) — the former fixed 64 MiB/thread was 2 GiB at 32 CPUs
    // inside a child heap that is only 8g on small hosts, enough to GC-skew
    // the Spark scaling phase that follows (ADVICE r3). The arrays are
    // method-local, so they are unreachable the moment this returns.
    val perThreadBytes = math.max(8L << 20, (1L << 30) / threads)
    val perThreadLongs = (perThreadBytes / 8).toInt
    val arrays = Array.fill(threads)(new Array[Long](perThreadLongs))
    arrays.foreach { a => var i = 0; while (i < a.length) { a(i) = i; i += 1 } }
    val sink = new java.util.concurrent.atomic.AtomicLong()
    def run(passes: Int): Double = {
      val t0 = System.nanoTime()
      val ts = (0 until threads).map { t =>
        new Thread(() => {
          val a = arrays(t)
          var acc = 0L
          var p = 0
          while (p < passes) {
            var i = 0
            while (i < a.length) { acc += a(i); i += 1 }
            p += 1
          }
          sink.addAndGet(acc)
        })
      }
      ts.foreach(_.start()); ts.foreach(_.join())
      val dt = (System.nanoTime() - t0) / 1e9
      threads.toDouble * perThreadLongs * 8L * passes / dt / 1e9
    }
    run(1) // warmup
    (1 to 3).map(_ => run(4)).max
  }

  def main(args: Array[String]): Unit = {
    val cpus = args(0).toInt
    val n = args(1).toLong
    val reps = if (args.length > 2) args(2).toInt else 4
    // optional 4th arg: also measure the ceilings at this smaller thread
    // count INSIDE this same (big) JVM — back-to-back, same warm JIT, same
    // hardware slice; far less variance than comparing two JVMs
    val ceilSmall = if (args.length > 3) args(3).toInt else 0
    if (ceilSmall > 0) {
      println(f"CEILING_SMALL cpus=$ceilSmall ops_per_sec=${ceilingOpsPerSec(ceilSmall)}%.0f")
      println(f"ENGINE_SMALL cpus=$ceilSmall ops_per_sec=${engineOpsPerSec(ceilSmall)}%.0f")
      println(f"MEMBW_SMALL cpus=$ceilSmall gbps=${memBandwidthGBps(ceilSmall)}%.2f")
    }
    println(f"CEILING_RESULT cpus=$cpus ops_per_sec=${ceilingOpsPerSec(cpus)}%.0f")
    if (ceilSmall > 0) {
      println(f"ENGINE_RESULT cpus=$cpus ops_per_sec=${engineOpsPerSec(cpus)}%.0f")
      println(f"MEMBW_RESULT cpus=$cpus gbps=${memBandwidthGBps(cpus)}%.2f")
    }
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    // materialize the input once (not timed): the production job reads a
    // table scan, so synthesis cost must not pollute the measurement
    val dir = java.nio.file.Files.createTempDirectory("graft-scaling").toString
    graft.io.Transcripts.generate(spark, n, partitions = cpus * 4).toDF()
      .write.mode("overwrite").parquet(dir)
    val turns = spark.read.parquet(dir)
    var best = Double.MaxValue
    (1 to reps).foreach { _ =>
      val t0 = System.nanoTime()
      Pipeline.extractTurns(turns).toDF().selectExpr("sum(best_count)").collect()
      val dt = (System.nanoTime() - t0) / 1e9
      if (dt < best) best = dt
    }
    println(f"SCALING_RESULT cpus=$cpus n=$n best_sec=$best%.3f tps=${n / best}%.1f")
    spark.stop()
    def rm(f: java.io.File): Unit = {
      if (f.isDirectory) f.listFiles().foreach(rm)
      f.delete(): Unit
    }
    rm(new java.io.File(dir))
  }
}
