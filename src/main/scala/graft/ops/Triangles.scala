package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Triangle / wedge census over an undirected pair graph — the density
  * diagnostic for near-duplicate graphs: a high global clustering
  * coefficient (3·triangles / wedges) means candidate pairs form tight
  * cliques (true duplicate clusters); a low one means chains of borderline
  * matches that a transitive-closure dedup would over-merge. Runs on the
  * SAME pair set the clustering consumes, so the diagnostic describes
  * exactly the graph being cut.
  *
  * Scale design: edges normalize to a < b and dedup (one shuffle); the
  * triangle count is the standard two-join ordered enumeration a<b<c — every
  * triangle counted exactly once, join keys are vertices (equi-joins, AQE
  * handles hub skew); wedges are ONE degree aggregate, Σ d·(d−1)/2. Output
  * is a single row of exact integers; the closure coefficient is emitted in
  * permille with one floor division.
  */
object Triangles {

  /** Census over `pairs` (two vertex columns, any orientation/multiplicity).
    * Output: n_vertices, n_edges, n_wedges, n_triangles, closure_permille.
    */
  def census(pairs: DataFrame, aCol: String, bCol: String): DataFrame = {
    val e = pairs.select(
        least(col(aCol), col(bCol)).as("a"),
        greatest(col(aCol), col(bCol)).as("b"))
      .where(col("a") =!= col("b"))
      .distinct()
      .localCheckpoint(false) // three consumers; derive the edge set once
    val tri = e.as("e1")
      .join(e.as("e2"), col("e2.a") === col("e1.b"))
      .join(e.as("e3"),
        col("e3.a") === col("e1.a") && col("e3.b") === col("e2.b"))
      .agg(count(lit(1)).as("n_triangles"))
    val deg = e.select(col("a").as("v")).union(e.select(col("b").as("v")))
      .groupBy("v").agg(count(lit(1)).as("d"))
    val wedges = deg.agg(count(lit(1)).as("n_vertices"),
      sum(expr("(d * (d - 1)) div 2")).as("n_wedges"))
    val edges = e.agg(count(lit(1)).as("n_edges"))
    wedges.crossJoin(edges).crossJoin(tri)
      .withColumn("closure_permille",
        expr("(3000 * n_triangles) div greatest(n_wedges, 1L)"))
      .select(col("n_vertices"), col("n_edges"), col("n_wedges"),
        col("n_triangles"), col("closure_permille"))
  }
}
