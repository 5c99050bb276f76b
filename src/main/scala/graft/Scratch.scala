package graft

// Temporary iteration aid for the r15 optimization round — ad-hoc
// counts/inspections at sfDir. Not part of any query path.
object Scratch {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    GraftExtensions.register(spark)
    import org.apache.spark.sql.functions._
    val part = spark.read.parquet(s"$sfDir/part.parquet")
      .select(col("p_partkey"),
        concat(col("p_name"), lit("#"), col("p_partkey")).as("p_ent"))
    val cut = (col("p_partkey") % length(col("p_ent"))).cast("int")
    val dirty = part.select(
      (col("p_partkey") + lit(10000000L)).as("d_id"),
      concat(col("p_ent").substr(lit(1), cut),
        col("p_ent").substr(cut + 2, length(col("p_ent"))))
        .as("d_name"))
    println("part rows: " + part.count())
    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"  $label: ${(System.nanoTime() - t0) / 1e9}%6.2f s")
      r
    }
    val catalog = part.select(col("p_partkey").as("c_id"),
      col("p_ent").as("c_name"))
    // hot-gram diagnosis: rebuild the postings as candidatePairs does
    // and show where the 6.5M pairs come from
    for (q <- Seq(3, 5)) {
      val k = 1
      def gramSetD(sC: org.apache.spark.sql.Column) = {
        val n = length(sC) - q + 1
        val grams = when(n >= 1,
          transform(sequence(lit(1), n), i => sC.substr(i, lit(q))))
          .otherwise(array().cast("array<string>"))
        transform(grams, (g, i) => {
          val occ = size(filter(slice(grams, lit(1), i), x => x === g))
          struct(g.as("g"), occ.as("occ"))
        })
      }
      def allG(df: org.apache.spark.sql.DataFrame, id: String, str: String,
          side: String) =
        df.select(col(id).as(s"${side}_id"), col(str).as(s"${side}_s"))
          .filter(col(s"${side}_s").isNotNull)
          .select(col(s"${side}_id"),
            explode(gramSetD(col(s"${side}_s"))).as("e"))
          .select(col(s"${side}_id"), col("e.g"), col("e.occ"))
      val lg = allG(dirty, "d_id", "d_name", "l").localCheckpoint(true)
      val rg = allG(catalog, "c_id", "c_name", "r").localCheckpoint(true)
      val dfreq = lg.select(col("g"), col("occ"))
        .unionAll(rg.select(col("g"), col("occ")))
        .groupBy(col("g"), col("occ")).agg(count(lit(1)).as("_df"))
        .localCheckpoint(true)
      def posting(grams: org.apache.spark.sql.DataFrame, side: String) = {
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy(col(s"${side}_id"))
          .orderBy(col("_df"), col("g"), col("occ"))
        grams.join(dfreq, Seq("g", "occ"), "left").na.fill(1L, Seq("_df"))
          .repartition(32, col(s"${side}_id"))
          .withColumn("_rn", row_number().over(w))
          .filter(col("_rn") <= k * q + 1)
          .select(col(s"${side}_id"), col("g"), col("occ"))
      }
      val lp = posting(lg, "l").localCheckpoint(true)
      val rp = posting(rg, "r").localCheckpoint(true)
      println(s"q=$q lp rows: " + lp.count() + " rp rows: " + rp.count())
      val hot = lp.groupBy("g", "occ").agg(count(lit(1)).as("nl"))
        .join(rp.groupBy("g", "occ").agg(count(lit(1)).as("nr")),
          Seq("g", "occ"))
        .withColumn("pairs", col("nl") * col("nr"))
      println(s"q=$q raw pair total: " +
        hot.agg(sum("pairs")).head().getLong(0))
      hot.orderBy(desc("pairs")).show(15, false)
    }
    // 1. candidates, materialized
    val cands = time("cands (materialize)") {
      operators.FuzzyJoin.candidatePairs(dirty, "d_id", "d_name",
        catalog, "c_id", "c_name", maxDist = 1).localCheckpoint(true)
    }
    println("  cands rows: " + cands.count())
    // 2. verify from materialized cands
    val dp = spark.sparkContext.defaultParallelism
    val verified = time("verify (from ckpt cands)") {
      cands
        .repartition(dp, col("l_id"))
        .join(dirty.select(col("d_id").as("l_id"),
          col("d_name").as("l_s")), Seq("l_id"))
        .repartition(dp, col("r_id"))
        .join(catalog.select(col("c_id").as("r_id"),
          col("c_name").as("r_s")), Seq("r_id"))
        .filter(abs(length(col("l_s")) - length(col("r_s"))) <= 1)
        .withColumn("dist", levenshtein(col("l_s"), col("r_s"), 1))
        .filter(col("dist") >= 0)
        .select(col("l_id").as("a"), col("r_id").as("b"))
        .localCheckpoint(true)
    }
    println("  matches rows: " + verified.count())
    // 3. CC over materialized matches
    val labels = time("connectedComponents") {
      operators.Clustering.connectedComponents(verified)
        .localCheckpoint(true)
    }
    println("  labels rows: " + labels.count())
    println("  cc stats: " + operators.Clustering.lastStats)
    // 4. resolve aggregate
    val records = part
      .select(col("p_partkey").as("rec_id"), col("p_ent").as("name"))
      .unionByName(dirty
        .select(col("d_id").as("rec_id"), col("d_name").as("name")))
    time("resolve agg") {
      records.join(labels.withColumnRenamed("node", "rec_id"),
          Seq("rec_id"), "left")
        .withColumn("cluster_id", coalesce(col("component"), col("rec_id")))
        .groupBy(col("cluster_id"))
        .agg(count(lit(1)).as("n_members"),
          min_by(col("name"), col("rec_id")).as("canonical_name"))
        .queryExecution.toRdd.foreachPartition(it => while (it.hasNext) it.next())
    }
    QuietExit.emitAndExit(spark, None)
  }
}
