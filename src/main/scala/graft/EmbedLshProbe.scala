package graft

import graft.operators.Dedup
import org.apache.spark.sql.{Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Production-threshold scale probe for the sized-bits embedding-LSH
  * dedup (SURVEY §6, round 12): the one measurement the replicated
  * ScaleProbe corpus cannot give.
  *
  * Why a separate probe: ScaleProbe's 10× corpus replicates every base
  * vector into a 10-copy near-dup family (direction perturbation
  * preserves cosine), so at any usable threshold TRUE output grows
  * ~1,900× and the wall measures dup structure, not organic growth —
  * the all-duplicate pathology §6 documents. Here both corpora are
  * INDEPENDENTLY random gaussian 64-dim (different seeds per size, no
  * shared rows), with a controlled 1%-of-rows planted near-dup set
  * (partner = v + 0.5·g, E[cos] ≈ 0.89 ≥ the 0.8 production
  * threshold), so true-pair volume grows LINEARLY and recall is
  * measurable against a known ground truth.
  *
  * At production thresholds (cos ≥ 0.8) the per-hyperplane agreement
  * probability for a true pair is p = 1 − acos(0.8)/π ≈ 0.795, high
  * enough to afford aggressive bit-sizing: this probe sizes bits with
  * targetBucket = 5 (vs the gated 0.5-threshold query's 40), pinning
  * expected bucket size ≈ 5 while 16 bands × hamming-1 multi-probe
  * keep analytic recall ≈ 1. That is the §6 claim under test: the n^ρ
  * residual shrinks as the threshold rises, so the serving wall and
  * candidate volume approach linear at exactly the settings a real
  * dedup pass runs.
  *
  * Usage: runMain graft.EmbedLshProbe [n1] [factor] [threshold]
  * Prints one JSON line: walls (prepare/serve, both sizes), candidate
  * counts + exponent, output pairs, planted-pair recall at both sizes.
  */
object EmbedLshProbe {

  def main(args: Array[String]): Unit = {
    val n1 = args.lift(0).map(_.toInt).getOrElse(2000)
    val factor = args.lift(1).map(_.toInt).getOrElse(10)
    val threshold = args.lift(2).map(_.toDouble).getOrElse(0.8)
    val dim = 64
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      // MB-scale splits like ScaleProbe: probe tables are a few MB and
      // default split packing would hand whole scans to one task
      .config("spark.sql.files.maxPartitionBytes", "1048576")
      .config("spark.sql.files.openCostInBytes", "65536")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.GraftExtensions.register(spark)

    val schema = StructType(Seq(
      StructField("vec_id", LongType),
      StructField("embedding", ArrayType(FloatType)),
      StructField("label", IntegerType)))

    /** Seeded corpus: n random vectors, the last n/100 are perturbed
      * copies of the first n/100 (the planted near-dup pairs). Returns
      * (dir, planted pairs with exact cosine). */
    def corpus(n: Int): (String, Seq[(Long, Long, Double)]) = {
      val rnd = new scala.util.Random(7001 + n) // size-keyed: corpora independent
      val vecs = Array.tabulate(n)(_ => Array.fill(dim)(rnd.nextGaussian()))
      val nP = n / 100
      val planted = (0 until nP).map { i =>
        val partner = n - nP + i
        vecs(partner) = vecs(i).zip(Array.fill(dim)(rnd.nextGaussian()))
          .map { case (v, g) => v + 0.5 * g }
        def dot(a: Array[Double], b: Array[Double]) =
          a.zip(b).map { case (x, y) => x * y }.sum
        val cos = dot(vecs(i), vecs(partner)) /
          (math.sqrt(dot(vecs(i), vecs(i))) *
            math.sqrt(dot(vecs(partner), vecs(partner))))
        (i.toLong, partner.toLong, cos)
      }
      val dir = java.nio.file.Files.createTempDirectory(s"lsh_probe_$n")
        .toString
      val rows = new java.util.ArrayList[Row](n)
      (0 until n).foreach(i =>
        rows.add(Row(i.toLong, vecs(i).map(_.toFloat).toSeq, 0)))
      spark.createDataFrame(rows, schema)
        .repartition(8)
        .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
      (dir, planted)
    }

    def fmt(v: Double) =
      String.format(java.util.Locale.ROOT, "%.3f", Double.box(v))

    def measure(n: Int): Map[String, String] = {
      val (dir, planted) = corpus(n)
      val emb = Tables.embeddings(spark, dir)
      val bits = Dedup.sizedBits(n, targetBucket = 5)
      // prepare: the write-once band-index artifact (its own timing,
      // like Bench's prepare phases)
      val t0 = System.nanoTime()
      val idx = Dedup.lshBandIndexTable(spark, dir, bits)
      val prep = (System.nanoTime() - t0) / 1e9
      // candidate volume through the exact serving stage
      val t1 = System.nanoTime()
      val cand = Dedup.lshCandidatePairs(idx, bits).count()
      val tCand = (System.nanoTime() - t1) / 1e9
      // serving wall: candidates + exact rescore at the threshold
      val t2 = System.nanoTime()
      val out = Dedup.embeddingPairsLsh(emb, threshold = threshold,
        bitsPerBand = bits, index = Some(idx))
        .select(col("vec_a"), col("vec_b")).collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      val serve = (System.nanoTime() - t2) / 1e9
      val truePairs = planted.filter(_._3 >= threshold)
      val hits = truePairs.count(p => out.contains((p._1, p._2)))
      Map(
        "n" -> n.toString, "bits" -> bits.toString,
        "prep" -> fmt(prep), "cand" -> cand.toString,
        "cand_sec" -> fmt(tCand), "serve" -> fmt(serve),
        "out_pairs" -> out.size.toString,
        "true_pairs" -> truePairs.size.toString,
        "recall" -> fmt(if (truePairs.nonEmpty)
          hits.toDouble / truePairs.size else 1.0))
    }

    // warm-up at the small size (codegen + plan compilation), untimed
    measure(math.max(n1 / 4, 200))
    val m1 = measure(n1)
    val mN = measure(n1 * factor)
    def d(m: Map[String, String], k: String) = m(k).toDouble
    val wallRatio = d(mN, "serve") / d(m1, "serve")
    val candExp = math.log(d(mN, "cand") / d(m1, "cand")) /
      math.log(factor.toDouble)
    def obj(m: Map[String, String]) = m.toSeq.sortBy(_._1)
      .map { case (k, v) => s""""$k":$v""" }.mkString("{", ",", "}")
    println(s"""{"metric":"embedlsh_probe","threshold":$threshold,""" +
      s""""factor":$factor,"wall_ratio":${fmt(wallRatio)},""" +
      s""""cand_exponent":${fmt(candExp)},""" +
      s""""small":${obj(m1)},"large":${obj(mN)}}""")
    spark.stop()
  }
}
