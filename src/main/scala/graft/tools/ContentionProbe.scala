package graft.tools

import java.util.concurrent.atomic.AtomicBoolean

import org.apache.spark.sql.SparkSession

/** One-off adjudication harness for the round-14 q_ksql_exists bench
  * regression: runs the query's build/optimize/execute split (PlanSplit)
  * while a background pool replays the suite's heavy tail — the exact
  * co-scheduling the 8-way bench pool produces — to attribute the
  * overlapped wall to a phase. Not part of the gate; kept as a tool the
  * next overlap-regression can reuse.
  */
object ContentionProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = Runtime.getRuntime.availableProcessors().toString
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.GraftExtensions.register(spark)
    graft.SparkEntry.queries("q_agg_core")(spark, sfDir).count()
    graft.SparkEntry.prepares.toSeq.sortBy(_._1).foreach { case (_, p) =>
      try p(spark, sfDir) catch { case _: Throwable => () }
    }
    val target = args.headOption.getOrElse("q_ksql_exists")
    val heavy = Seq("q_triangles", "q_pagerank", "q_dedup_jaccard",
      "q_bfs_hops", "q_basket_pairs", "q_winsorize", "q_span_dedup")
    val stop = new AtomicBoolean(false)
    val threads = heavy.map { n =>
      val fn = graft.SparkEntry.queries(n)
      val t = new Thread(() => {
        while (!stop.get()) {
          try fn(spark, sfDir).write.format("noop").mode("overwrite").save()
          catch { case _: Throwable => () }
        }
      })
      t.setDaemon(true); t.start(); t
    }
    Thread.sleep(2000)
    import scala.jdk.CollectionConverters._
    def gcMillis: Long = java.lang.management.ManagementFactory
      .getGarbageCollectorMXBeans.asScala.map(_.getCollectionTime).sum
    val fn = graft.SparkEntry.queries(target)
    // stall attribution: sample the measuring thread's stack at 50 Hz
    // while a run is in flight; a multi-second stall then names its own
    // frame instead of hiding inside a phase wall number
    val measuring = new AtomicBoolean(false)
    val samples = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    val mainT = Thread.currentThread()
    val sampler = new Thread(() => while (true) {
      if (measuring.get()) {
        val st = mainT.getStackTrace
        if (st.nonEmpty)
          samples.add(st.iterator.take(14).mkString(" <- "))
      }
      Thread.sleep(20)
    })
    sampler.setDaemon(true); sampler.start()
    (1 to 8).foreach { i =>
      val g0 = gcMillis
      samples.clear(); measuring.set(true)
      val (b, o, e) = graft.PlanSplit.split(spark, sfDir, fn)
      measuring.set(false)
      val g1 = gcMillis
      println(f"""{"probe":"contention","query":"$target","run":$i,"build_sec":$b%.3f,"optimize_sec":$o%.3f,"exec_sec":$e%.3f,"gc_ms_during":${g1 - g0}}""")
      if (b + o + e > 1.0) {
        val top = samples.asScala.toSeq.groupBy(identity)
          .map { case (k, v) => (v.size, k) }.toSeq.sortBy(-_._1).take(3)
        top.foreach { case (n, s) => println(s"STACK[$n]: $s") }
      }
    }
    // fine-grained: the q_ksql_exists build phase, step by step
    if (target == "q_ksql_exists") (1 to 8).foreach { i =>
      import graft.ksql.Translator
      val t0 = System.nanoTime()
      val cat: Translator.Catalog = Map(
        "events" -> Translator.Source(graft.Tables.events(spark, sfDir), "ts"),
        "orders" -> Translator.Source(graft.Tables.orders(spark, sfDir), "o_orderdate"),
        "customer" -> Translator.Source(graft.Tables.customer(spark, sfDir), "o_orderdate"),
        "nation" -> Translator.Source(graft.Tables.nation(spark, sfDir), "n_nationkey"))
      val t1 = System.nanoTime()
      cat.foreach { case (n, c) => c.df.createOrReplaceTempView("__cp_" + n) }
      val t2 = System.nanoTime()
      val df = spark.sql(
        """SELECT c_custkey, c_name FROM __cp_customer c
          |WHERE NOT EXISTS (SELECT 1 FROM __cp_orders o
          |  WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 300000)"""
          .stripMargin)
      val t3 = System.nanoTime()
      cat.keys.foreach(n => spark.catalog.dropTempView("__cp_" + n))
      df.queryExecution.executedPlan
      val t4 = System.nanoTime()
      def s(a: Long, b: Long) = f"${(b - a) / 1e9}%.3f"
      println(s"""{"probe":"steps","run":$i,"catalog":${s(t0, t1)},"views":${s(t1, t2)},"sql_analyze":${s(t2, t3)},"optimize":${s(t3, t4)}}""")
    }
    stop.set(true)
    threads.foreach(_.join(2000))
    spark.stop()
  }
}
