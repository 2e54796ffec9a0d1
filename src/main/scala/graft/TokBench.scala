package graft

import java.util.concurrent.{Executors, TimeUnit}

import graft.analysis.Analysis

/** Scratch microbench: raw tokenizer thread-scaling outside Spark. */
object TokBench {
  def main(args: Array[String]): Unit = {
    val threads = args(0).toInt
    val perThread = 200000
    val text = "spark group query row data slow small filter customer line the batch value merge line table data line join agg line merge slow join sort agg part merge column filter key data a part batch merge data row column column big merge"
    // warmup
    (1 to 20000).foreach(_ => Analysis.analyze(text))
    val pool = Executors.newFixedThreadPool(threads)
    val t0 = System.nanoTime()
    val futures = (1 to threads).map { _ =>
      pool.submit(new Runnable {
        def run(): Unit =
          (1 to perThread).foreach(_ => Analysis.analyze(text))
      })
    }
    futures.foreach(_.get())
    pool.shutdown()
    pool.awaitTermination(1, TimeUnit.MINUTES)
    val sec = (System.nanoTime() - t0) / 1e9
    val docs = threads.toLong * perThread
    println(f"[tokbench] threads=$threads docs=$docs time=$sec%.2f s rate=${docs / sec}%.0f docs/s")
  }
}
