package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Per-group embedding outlier scoring (north-star scope: embedding
  * quality auditing — find the vectors that least belong to their
  * labeled group, i.e. mislabeled or junk training examples).
  *
  * Centroid per group via the same posexplode + decimal-exact
  * per-dimension mean as [[Ivf.train]]'s update step (reproducible
  * across engines/partitionings), then each vector's squared L2 to its
  * OWN group's centroid ([[Ivf.dist2]] — the dot-product identity, so
  * the arithmetic matches the `list_dot_product` oracle fragment), and
  * a per-group distance rank: `is_outlier` = the top `k` farthest per
  * group, ties broken on id.
  *
  * Scale shape: centroid build is two hash aggregates keyed
  * (group, dim) / (group) — tiny output (#groups rows), broadcast back
  * onto the corpus; the rank window partitions by group (no global
  * window). One corpus shuffle total (the window's), since the centroid
  * join is broadcast.
  */
object Outliers {

  /** @param df (id LONG, grp, vec ARRAY<DOUBLE>)
    * @return (id, grp, sq_dist, rank, is_outlier). */
  def byGroup(df: DataFrame, k: Int): DataFrame = {
    val centroids = df
      .select(col("grp"), posexplode(col("vec")).as(Seq("pos", "x")))
      .groupBy("grp", "pos")
      .agg(graft.functions.Exact.davg(col("x")).as("m"))
      .groupBy("grp")
      .agg(array_sort(collect_list(struct(col("pos"), col("m"))))
        .as("sorted"))
      .select(col("grp"), expr("transform(sorted, s -> s.m)").as("centroid"))
    val w = org.apache.spark.sql.expressions.Window.partitionBy("grp")
      .orderBy(col("sq_dist").desc, col("id").asc)
    df.join(broadcast(centroids), Seq("grp"))
      .withColumn("sq_dist", Ivf.dist2(col("vec"), col("centroid")))
      .withColumn("rank", row_number().over(w))
      .select(col("id"), col("grp"), col("sq_dist"), col("rank"),
        (col("rank") <= k).as("is_outlier"))
  }
}
