package graft.tools
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.ext.Dedup
object SoakProfile {
  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toLong).getOrElse(2000000L)
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "64")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = spark.read.parquet(s"/tmp/graft_soak_$n")
    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"[prof] $label%-22s ${(System.nanoTime() - t0) / 1e9}%8.2f s"); r }
    val sh = Dedup.WordShingles(3)
    val sigs = time("signatures+persist") {
      val s0 = Dedup.minHashSignatures(docs, "doc_id", "text", 64, sh)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      s0.count(); s0 }
    val cand = time("bands+candidates") {
      val c = Dedup.candidatePairs(Dedup.lshBands(sigs, "doc_id", 16, 4), "doc_id")
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      println(s"  candidates: ${c.count()}"); c }
    val probable = time("est-prefilter") {
      val p = Dedup.estimatedJaccard(cand, sigs, "doc_id", 64)
        .filter(col("est_jaccard") >= 0.3).select("id1", "id2")
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      println(s"  probable: ${p.count()}"); p }
    time("exact-verify") {
      println(s"  verified: ${Dedup.exactJaccard(probable, docs, "doc_id", "text", sh)
        .filter(col("jaccard") >= 0.5).count()}") }
    spark.stop()
  }
}
