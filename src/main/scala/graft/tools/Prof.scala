package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Phase-level profiling harness for the heavy round-trip gates
  * (measurement only — never part of the query registry). Splits a
  * composite query into its pipeline phases and times each with the
  * noop sink (guide §1.4), so optimization effort lands on the phase
  * that actually owns the wall-clock instead of the whole black box.
  *
  * Usage: `sbt "runMain graft.tools.Prof t48"` (phases of one gate).
  */
object Prof {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("graft-prof")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.files.maxPartitionBytes", "16m")
      .config("spark.sql.optimizer.canChangeCachedPlanOutputPartitioning",
        sys.env.getOrElse("GRAFT_PROF_CACHEAQE", "false"))
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.Tables.documents(spark, sfDir).count()

    val jobs = new java.util.concurrent.atomic.AtomicInteger
    val stages = new java.util.concurrent.atomic.AtomicInteger
    val tasks = new java.util.concurrent.atomic.AtomicInteger
    val jobStart = new java.util.concurrent.ConcurrentHashMap[Int, Long]()
    spark.sparkContext.addSparkListener(
      new org.apache.spark.scheduler.SparkListener {
        override def onJobStart(
            j: org.apache.spark.scheduler.SparkListenerJobStart): Unit = {
          jobs.incrementAndGet(); stages.addAndGet(j.stageInfos.size)
          tasks.addAndGet(j.stageInfos.map(_.numTasks).sum)
          jobStart.put(j.jobId, System.nanoTime())
          if (sys.env.contains("GRAFT_PROF_JOBS")) {
            val site = j.stageInfos.lastOption.map(_.name).getOrElse("?")
            println(f"[job] start ${j.jobId}%4d stages=${j.stageInfos.size}%3d" +
              f" tasks=${j.stageInfos.map(_.numTasks).sum}%5d  $site")
          }
          ()
        }
        override def onJobEnd(
            j: org.apache.spark.scheduler.SparkListenerJobEnd): Unit = {
          if (sys.env.contains("GRAFT_PROF_JOBS")) {
            val t0 = Option(jobStart.get(j.jobId)).getOrElse(0L)
            println(f"[job] end   ${j.jobId}%4d ${(System.nanoTime()-t0)/1e9}%7.3f s")
          }
          ()
        }
      })

    def phase[A](name: String)(f: => A): A = {
      spark.sparkContext.setJobDescription(name)
      val (j0, s0, k0) = (jobs.get, stages.get, tasks.get)
      val t0 = System.nanoTime()
      val r = f
      println(f"[prof] $name%-28s ${(System.nanoTime() - t0) / 1e9}%8.3f s" +
        f"  jobs=${jobs.get - j0}%3d stages=${stages.get - s0}%3d" +
        f" tasks=${tasks.get - k0}%5d")
      r
    }
    def sink(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()

    args.headOption.getOrElse("t48") match {
      case "t48" =>
        for (i <- 1 to 2) {
          println(s"[prof] --- iteration $i ---")
          val docs = graft.Tables.documents(spark, sfDir)
          val path = "/tmp/graft_prof_t48.arpa"
          val m3 = phase("kn3Train (lazy)") {
            graft.ops.LanguageModel.kn3Train(docs, "doc_id", "text") }
          phase("saveArpa")(m3.saveArpa(path))
          val model = phase("loadArpa (lazy)") {
            graft.ops.LanguageModel.loadArpa(spark, path) }
          phase("arpaScore")(sink(graft.ops.LanguageModel.arpaScore(
            model, docs, "doc_id", "text", escapeLiteralUnk = true)))
          phase("direct score")(sink(m3.score(docs, "doc_id", "text")))
          phase("final join+agg") {
            val ar = graft.ops.LanguageModel.arpaScore(
              model, docs, "doc_id", "text", escapeLiteralUnk = true)
            sink(m3.score(docs, "doc_id", "text")
              .select(col("doc_id"), col("kn3_ppl"))
              .join(ar.select(col("doc_id"), col("arpa_ppl"),
                col("n_trigrams")), "doc_id")
              .join(docs.select("doc_id", "lang"), "doc_id")
              .groupBy("lang")
              .agg(count(lit(1)).as("n_docs"),
                sum("n_trigrams").as("total_trigrams"),
                round(avg("kn3_ppl"), 4).as("avg_ppl_engine"),
                round(avg("arpa_ppl"), 4).as("avg_ppl_arpa"))
              .orderBy("lang"))
          }
          m3.unpersist()
        }

      case "t53" =>
        for (i <- 1 to 2) {
          println(s"[prof] --- iteration $i ---")
          val docs = graft.Tables.documents(spark, sfDir)
            .filter(col("doc_id") % 17 === 0)
          val path = "/tmp/graft_prof_t53.arpa"
          val m = phase("knTrain (lazy)") {
            graft.ops.LanguageModel.knTrain(docs, "doc_id", "text", 5) }
          phase("saveArpa")(m.saveArpa(path))
          val model = phase("loadArpaN") {
            graft.ops.LanguageModel.loadArpaN(spark, path) }
          phase("arpaScoreN")(sink(graft.ops.LanguageModel.arpaScoreN(
            model, docs, "doc_id", "text", escapeLiteralUnk = true)))
          phase("direct score")(sink(m.score(docs, "doc_id", "text")))
          m.unpersist(); model.unpersist()
        }

      case "g1" =>
        for (i <- 1 to 2) {
          println(s"[prof] --- iteration $i ---")
          val edges = phase("edges build") {
            val orders = graft.Tables.orders(spark, sfDir)
            val lineitem = graft.Tables.lineitem(spark, sfDir)
            val cs = orders.join(lineitem,
                orders("o_orderkey") === lineitem("l_orderkey"))
              .select(concat(lit("c"), col("o_custkey")).as("src"),
                concat(lit("s"), col("l_suppkey")).as("dst"))
            val sp = lineitem.select(
              concat(lit("s"), col("l_suppkey")).as("src"),
              concat(lit("p"), col("l_partkey")).as("dst"))
            cs.unionByName(sp)
          }
          phase("pageRank 5 rounds")(sink(
            graft.ops.Graph.pageRank(edges, iterations = 5).orderBy("node")))
        }

      case "q" =>
        // generic: profile any registered gate queries (2 iterations
        // each, warm second) with job/stage/task counts
        for (name <- args.drop(1); i <- 1 to 2)
          phase(s"$name #$i")(
            sink(graft.SparkEntry.queries(name)(spark, sfDir)))

      case other => sys.error(s"unknown profile target: $other")
    }
    spark.stop()
  }
}
