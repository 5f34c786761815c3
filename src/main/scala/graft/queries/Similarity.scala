package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DoubleType

import graft.QuerySpec
import graft.engine.Tables

/** Similarity search over the `embeddings` table (64-dim float vectors).
  *
  * s01 is the exact brute-force baseline: broadcast the (small) query set,
  * linear scan the corpus — at 100 TB this is one shuffle-free pass, the
  * correct exact-kNN shape. s02/s03 are the scale path: sign-random-
  * projection LSH buckets shrink the candidate set so the exact rerank
  * touches a fraction of the corpus; d06-style cosine near-dup pairing uses
  * the same buckets.
  *
  * All dot products are computed in double from the float inputs with a
  * sequential left fold — bit-identical between Spark's `aggregate` and
  * DuckDB's `list_sum` (verified by the oracle gate).
  */
object Similarity {

  private def emb(s: SparkSession, d: String): DataFrame = Tables(s, d, "embeddings")

  /** Σ aᵢ·bᵢ in double precision, sequential fold. */
  def ddot(a: Column, b: Column): Column =
    aggregate(
      zip_with(a, b, (x, y) => x.cast(DoubleType) * y.cast(DoubleType)),
      lit(0.0),
      (acc, x) => acc + x)

  def cosine(a: Column, b: Column): Column =
    ddot(a, b) / (sqrt(ddot(a, a)) * sqrt(ddot(b, b)))

  /** DuckDB equivalent of [[cosine]] with identical evaluation order. */
  private def duckCos(a: String, b: String): String = {
    def dot(x: String, y: String) =
      s"""list_sum(list_transform(list_zip($x, $y),
         |    p -> CAST(p[1] AS DOUBLE) * CAST(p[2] AS DOUBLE)))""".stripMargin
    s"(${dot(a, b)} / (sqrt(${dot(a, a)}) * sqrt(${dot(b, b)})))"
  }

  /** Sign-random-projection bucket code: `nBits` hyperplanes whose ±1
    * weights come from a deterministic integer mix of (table, bit, dim).
    * Pure column expressions — codegen'd, no UDF.
    */
  def lshCode(vec: Column, table: Int, nBits: Int): Column = {
    val bits = (0 until nBits).map { j =>
      when(lshProj(vec, table, j) > 0, 1 << j).otherwise(0)
    }
    bits.reduce(_ + _)
  }

  /** Signed projection of `vec` onto hyperplane (table, bit). */
  private def lshProj(vec: Column, table: Int, j: Int): Column =
    aggregate(
      zip_with(vec, sequence(lit(0), lit(63)), (v, i) => {
        // deterministic ±1 weight per (table, bit, dim index)
        val h = (i * 2654435761L + lit(table.toLong * 40503L + j * 65537L))
        v.cast(DoubleType) * when(pmod(h, lit(2)) === 0, 1.0).otherwise(-1.0)
      }),
      lit(0.0),
      (acc, x) => acc + x)

  /** All `nBits` projections for one table as an array column. */
  def lshProjs(vec: Column, table: Int, nBits: Int): Column =
    array((0 until nBits).map(j => lshProj(vec, table, j)): _*)

  /** Code from a materialized projection array. */
  def codeOf(projs: Column, nBits: Int): Column =
    (0 until nBits)
      .map(j => when(element_at(projs, j + 1) > 0, 1 << j).otherwise(0))
      .reduce(_ + _)

  /** Multi-probe code: flip the bit whose projection has the smallest
    * magnitude — the hyperplane the vector is closest to, i.e. the flip a
    * near-neighbor is most likely to differ in.
    */
  def probeCodeOf(projs: Column, nBits: Int): Column = {
    val absArr = transform(projs, p => abs(p))
    val minIdx = array_position(absArr, array_min(absArr)) // 1-based
    codeOf(projs, nBits)
      .bitwiseXOR(pow(lit(2.0), (minIdx - 1).cast(DoubleType)).cast("int"))
  }

  val specs: Vector[QuerySpec] = Vector(
    // Exact brute-force top-5 cosine neighbors for 10 query vectors.
    QuerySpec(
      "s01_ann_brute",
      (s, d) => {
        val e = emb(s, d)
        val q = e.filter(col("vec_id") < 10)
          .select(col("vec_id").as("q_id"), col("embedding").as("q_emb"))
        e.crossJoin(broadcast(q))
          .filter(col("vec_id") =!= col("q_id"))
          .withColumn("cos", cosine(col("q_emb"), col("embedding")))
          .withColumn("rank",
            row_number().over(
              Window.partitionBy("q_id").orderBy(col("cos").desc, col("vec_id"))))
          .filter(col("rank") <= 5)
          .select(col("q_id"), col("vec_id").as("neighbor_id"), col("rank"), col("cos"))
          .orderBy("q_id", "rank")
      },
      Some(s"""WITH q AS (
              |  SELECT vec_id AS q_id, embedding AS q_emb FROM embeddings WHERE vec_id < 10),
              |scored AS (
              |  SELECT q.q_id, e.vec_id AS neighbor_id,
              |    ${duckCos("q.q_emb", "e.embedding")} AS cos
              |  FROM embeddings e CROSS JOIN q
              |  WHERE e.vec_id != q.q_id),
              |ranked AS (
              |  SELECT q_id, neighbor_id, cos,
              |    ROW_NUMBER() OVER (PARTITION BY q_id ORDER BY cos DESC, neighbor_id)
              |      AS rank
              |  FROM scored)
              |SELECT q_id, neighbor_id, rank, cos FROM ranked
              |WHERE rank <= 5 ORDER BY q_id, rank""".stripMargin),
      headline = true,
    ),
    // LSH-bucketed ANN: 4 tables × 10-bit codes; the corpus is indexed under
    // its primary code per table, queries additionally probe the code with
    // the lowest-margin bit flipped (multi-probe — recall of a 2nd table per
    // probe at zero extra index size). Exact cosine rerank on candidates.
    // Custom bucketing → rows-only; SimilaritySpec measures recall vs s01.
    QuerySpec(
      "s02_ann_lsh",
      (s, d) => {
        val nTables = 4
        val nBits = 10
        val e = emb(s, d)
        // one row per (vector, table) carrying the projection array; code and
        // probe code are derived from the SAME materialized projections
        val coded = e.select(
          col("vec_id"), col("embedding"),
          posexplode(array((0 until nTables).map(t =>
            lshProjs(col("embedding"), t, nBits)): _*)).as(Seq("tbl", "projs")))
          .select(col("vec_id"), col("embedding"), col("tbl"),
            codeOf(col("projs"), nBits).as("code"),
            probeCodeOf(col("projs"), nBits).as("probe"))
          .persist() // 40 fold-projections per row; reused by probe + corpus side
        val q = coded.filter(col("vec_id") < 10)
          .select(col("tbl"),
            explode(array(col("code"), col("probe"))).as("code"),
            col("vec_id").as("q_id"), col("embedding").as("q_emb"))
        val cand = coded.join(q, Seq("tbl", "code"))
          .filter(col("vec_id") =!= col("q_id"))
          .select(col("q_id"), col("q_emb"), col("vec_id"), col("embedding"))
          .distinct()
        cand
          .withColumn("cos", cosine(col("q_emb"), col("embedding")))
          .withColumn("rank",
            row_number().over(
              Window.partitionBy("q_id").orderBy(col("cos").desc, col("vec_id"))))
          .filter(col("rank") <= 5)
          .select(col("q_id"), col("vec_id").as("neighbor_id"), col("rank"), col("cos"))
          .orderBy("q_id", "rank")
      },
      None,
    ),
    // IVF (inverted-file) ANN: deterministic coarse quantizer (centroids =
    // one Lloyd step from hash-picked seeds), vectors indexed by nearest
    // centroid, queries probe the nprobe closest cells and rerank exactly.
    // At 100 TB the index build is one pass + a tiny per-cell state, and a
    // query touches |corpus| · nprobe/k vectors instead of all of them.
    QuerySpec(
      "s04_ann_ivf",
      (s, d) => {
        val k = 16
        val nprobe = 4
        val e = emb(s, d).select(col("vec_id"), col("embedding"))
        // Nearest-centroid assignment is a PER-ROW argmax over the broadcast
        // centroid array — zero shuffle. (The round-1 shape exploded
        // corpus×k and Window-argmin'd per vec_id: a 16×-corpus shuffle,
        // twice. With only k=16 broadcastable centroids that work belongs
        // inside the row.) Tie-break matches the old (cos DESC, cell ASC):
        // struct max on (cos, -cell).
        def nearestCell(cents: Column, vec: Column): Column =
          array_max(transform(cents, c =>
            struct(
              cosine(vec, c.getField("cvec")).as("cos"),
              (-c.getField("cell")).as("neg_cell"),
              c.getField("cell").as("cell"))))
            .getField("cell")
        // deterministic seeds: the k lowest vec_ids, as ONE array row
        val seedArr = e.filter(col("vec_id") < k)
          .agg(collect_list(struct(col("vec_id").as("cell"),
            col("embedding").as("cvec"))).as("cents"))
        // one Lloyd iteration: per-row nearest seed, mean per cell & dim
        val assigned0 = e.crossJoin(broadcast(seedArr))
          .select(col("vec_id"), col("embedding"),
            nearestCell(col("cents"), col("embedding")).as("cell"))
        val centroids = assigned0
          .select(col("cell"), posexplode(col("embedding")).as(Seq("dim", "v")))
          .groupBy("cell", "dim").agg(avg(col("v")).as("m"))
          .groupBy("cell")
          .agg(array_sort(collect_list(struct(col("dim"), col("m")))).as("dm"))
          .select(col("cell"), transform(col("dm"), x => x.getField("m")).as("cvec"))
        val centArr = centroids
          .agg(collect_list(struct(col("cell"), col("cvec"))).as("cents"))
          .persist()
        // index: per-row assignment of the corpus to its final centroid
        val index = e.crossJoin(broadcast(centArr))
          .select(col("vec_id"), col("embedding"),
            nearestCell(col("cents"), col("embedding")).as("cell"))
          .persist()
        // queries probe nprobe cells: per-row top-nprobe via array_sort on
        // (-cos, cell) — ascending sort = cos DESC, cell ASC — then explode
        val q = e.filter(col("vec_id") < 10)
          .select(col("vec_id").as("q_id"), col("embedding").as("q_emb"))
        val probes = q.crossJoin(broadcast(centArr))
          .select(col("q_id"), col("q_emb"),
            explode(slice(array_sort(transform(col("cents"), c =>
              struct(
                (-cosine(col("q_emb"), c.getField("cvec"))).as("neg_cos"),
                c.getField("cell").as("cell")))), 1, nprobe)).as("pc"))
          .select(col("q_id"), col("q_emb"), col("pc.cell").as("cell"))
        probes.join(index, "cell")
          .filter(col("vec_id") =!= col("q_id"))
          .withColumn("cos", cosine(col("q_emb"), col("embedding")))
          .withColumn("rank", row_number().over(
            Window.partitionBy("q_id").orderBy(col("cos").desc, col("vec_id"))))
          .filter(col("rank") <= 5)
          .select(col("q_id"), col("vec_id").as("neighbor_id"), col("rank"), col("cos"))
          .orderBy("q_id", "rank")
      },
      None,
    ),
    // Embedding-cosine near-duplicate pairs: planted perturbed copies
    // (id+1M, v*0.98 + 0.01 per element) must pair with their originals.
    // LSH buckets generate candidates; exact cosine ≥ 0.99 verifies.
    QuerySpec(
      "s03_embedding_neardup",
      (s, d) => {
        val nTables = 4
        val nBits = 10
        val e = emb(s, d).select(col("vec_id"), col("embedding"))
        val perturbed = e.filter(col("vec_id") % 10 === 0)
          .select((col("vec_id") + 1000000L).as("vec_id"),
            transform(col("embedding"),
              v => (v.cast(DoubleType) * 0.98 + 0.01).cast("float")).as("embedding"))
        val corpus = e.unionByName(perturbed)
        val coded = corpus.select(
          col("vec_id"), col("embedding"),
          posexplode(array((0 until nTables).map(t =>
            lshCode(col("embedding"), t, nBits)): _*)).as(Seq("tbl", "code")))
          .persist() // reused by both sides of the bucket self-join
        val a = coded.select(col("tbl"), col("code"),
          col("vec_id").as("a_id"), col("embedding").as("a_emb"))
        val b = coded.select(col("tbl"), col("code"),
          col("vec_id").as("b_id"), col("embedding").as("b_emb"))
        a.join(b, Seq("tbl", "code"))
          .filter(col("a_id") < col("b_id"))
          .select("a_id", "b_id", "a_emb", "b_emb")
          .distinct()
          .withColumn("cos", cosine(col("a_emb"), col("b_emb")))
          .filter(col("cos") >= 0.99)
          .select(col("a_id"), col("b_id"), col("cos"))
          .orderBy("a_id", "b_id")
      },
      None,
    ),
  )
}
