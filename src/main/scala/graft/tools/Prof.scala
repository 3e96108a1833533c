package graft.tools
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
object Prof {
  def main(args: Array[String]): Unit = {
    val spark = graft.spark.Sessions.local("32", "32")
    val dir = "/root/testdata/sf0.1"
    def t(name: String)(f: => Long): Unit = { val t0=System.nanoTime; val n=f; println(f"[prof] $name%-22s ${(System.nanoTime-t0)/1e9}%6.2f s  rows=$n") }
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    t("scan")(docs.count())
    val toks = split(col("text"), " ")
    val gramArr = array_distinct(when(size(toks) >= 3, transform(sequence(lit(1), size(toks) - 2), i => md5(concat_ws(" ", slice(toks, i, lit(3)))))).otherwise(array().cast("array<string>")))
    val items = docs.select(col("doc_id"), col("lang"), col("source"), size(gramArr).as("n_item"), explode(gramArr).as("item"))
    t("grams")(items.count())
    t("grams2")(items.count())
    val dfc = items.groupBy(col("lang"), col("source"), col("item")).agg(count(lit(1)).as("df"))
    t("df")(dfc.count())
    val prefix = items.join(dfc, Seq("lang","source","item")).withColumn("pos", row_number().over(Window.partitionBy(col("doc_id")).orderBy(col("df"), col("item")))).filter(col("pos") <= col("n_item") - ceil(col("n_item") * lit(0.599999)) + 1)
    t("prefix")(prefix.count())
    val a = prefix.select(col("doc_id").as("doc_a"), col("n_item").as("n_a"), col("lang"), col("source"), col("item"))
    val b = prefix.select(col("doc_id").as("doc_b"), col("n_item").as("n_b"), col("lang"), col("source"), col("item"))
    val cand = a.join(b, Seq("lang","source","item")).filter(col("doc_a") < col("doc_b") && col("n_a") * lit(0.599999) <= col("n_b") && col("n_b") * lit(0.599999) <= col("n_a")).select(col("doc_a"), col("doc_b")).distinct()
    t("cand")(cand.count())
    val sets = items.groupBy(col("doc_id")).agg(collect_list(col("item")).as("set"), first(col("n_item")).as("n"))
    t("sets")(sets.count())
    val res = cand.join(sets.select(col("doc_id").as("doc_a"), col("set").as("set_a"), col("n").as("n_a")), Seq("doc_a")).join(sets.select(col("doc_id").as("doc_b"), col("set").as("set_b"), col("n").as("n_b")), Seq("doc_b")).withColumn("n_inter", size(array_intersect(col("set_a"), col("set_b")))).withColumn("jaccard", round(col("n_inter").cast("double") / (col("n_a") + col("n_b") - col("n_inter")), 6)).filter(col("jaccard") >= 0.6)
    t("full")(res.count())
    t("full2")(res.count())
    spark.stop()
  }
}
