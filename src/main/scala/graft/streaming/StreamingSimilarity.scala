package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.ops.Similarity

/** Streaming semantic screen — the vector sibling of
  * [[StreamingDedup.screenAgainstCorpus]], completing the streaming-ingest
  * story for the SemDeDup path: each ARRIVING embedding is assigned its
  * trained k-means cell in-flight and stream-static-joined against the
  * persisted corpus cell table, so a near-duplicate of yesterday's corpus
  * is flagged at ingest instead of waiting for the next batch pass.
  *
  * Scale shape: the centroid table is C-bounded and rides along as ONE
  * broadcast row (an array of C (cent_id, cv, cnorm) structs), so cell
  * assignment is a pure per-row computation — no state, no shuffle on the
  * stream side. The assignment argmax is evaluated by interpreted array
  * lambdas; the repo's no-interpreted-HOF rule targets per-PAIR hot loops
  * (corpus × corpus), while this cost is C·dims multiplies per ARRIVAL,
  * bounded by ingest rate — the same trade [[StreamingDedup]] makes for its
  * in-flight minhash. The candidate join is an equi-join on the int cell
  * id (never stream × full corpus), and the exact rounded cosine verifies
  * candidates, exactly like the batch `semantic_dedup` pair stage.
  *
  * In-flight assignment is bit-equal to the batch [[Similarity.ivfAssign]]
  * (spec-pinned): same rounded cosine (`+1e-12`, 6 decimals), same
  * higher-score-then-lower-centroid-id total order as `TopN.topNPer`'s
  * `(score desc, cent_id asc)` rank.
  */
object StreamingSimilarity {

  /** The trained centroid table packed into ONE broadcastable row:
    * (cents: array<struct<cent_id, cv, cnorm>>), sorted by cent_id. C is a
    * model constant (SemDeDup uses √n cells at most), so this row is small
    * by construction — the streaming analogue of the batch side's
    * C-bounded `broadcast(centroids)`.
    */
  def centroidArray(centroids: DataFrame): DataFrame =
    centroids.agg(sort_array(collect_list(struct(
      col("cent_id"), col("cv"), col("cnorm")))).as("cents"))

  /** The static side of the screen: every corpus vector with its trained
    * cell — (corpus_id, cell, v, norm). In production this is yesterday's
    * persisted assignment table; re-planned per micro-batch like any
    * stream-static join side.
    */
  def corpusCells(corpus: DataFrame, centroids: DataFrame): DataFrame =
    corpus.join(Similarity.ivfAssign(corpus, centroids), "vec_id")
      .select(col("vec_id").as("corpus_id"), col("cell"), col("v"),
        col("norm"))

  /** Screen a watermarked embedding stream against an existing corpus.
    * Input needs (vec_id, embedding: array<float>, `tsCol`); emits
    * (vec_id, ts, cell, corpus_id, sim) for every corpus vector in the
    * arrival's cell with rounded cosine ≥ `threshold`. Non-colliding
    * arrivals pass the screen silently (anti-join on vec_id downstream).
    */
  def screenAgainstCorpus(
      stream: DataFrame, tsCol: String, delay: String,
      centroids: DataFrame, cells: DataFrame, threshold: Double): DataFrame = {
    // the rounded cosine of the arriving vector against centroid struct
    // `c` — inlined three times below because SQL lambdas cannot bind
    // intermediates; MUST stay textually in sync with Similarity.cosine
    def score(c: String): String =
      s"round(aggregate(zip_with(v, $c.cv, (x, y) -> x * y), " +
        s"cast(0.0 as double), (acc, x) -> acc + x) / (norm * $c.cnorm) " +
        "+ 1e-12, 6)"
    // fold over the centroid array keeping (best score, best id); strict
    // `>` plus the `< acc.id` tie-arm IS topNPer's (score desc, id asc)
    // total order, so iteration order cannot matter
    val assignCell =
      "aggregate(cents, " +
        "named_struct('s', cast(-2.0 as double), 'id', cast(-1 as bigint)), " +
        s"(acc, c) -> IF(${score("c")} > acc.s " +
        s"OR (${score("c")} = acc.s AND c.cent_id < acc.id), " +
        s"named_struct('s', ${score("c")}, 'id', c.cent_id), acc)).id"
    val assigned = stream
      .withWatermark(tsCol, delay)
      .withColumn("v", col("embedding").cast("array<double>"))
      .withColumn("norm", graft.functions.VectorFunctions.l2_norm(col("v")))
      .crossJoin(broadcast(centroidArray(centroids)))
      .withColumn("cell", expr(assignCell))
      .drop("cents", "embedding")
    assigned.alias("s").join(cells.alias("c"),
        col("s.cell") === col("c.cell"))
      .select(col("s.vec_id"), col(s"s.$tsCol").as(tsCol),
        col("s.cell").as("cell"), col("c.corpus_id"),
        Similarity.cosine(col("s.v"), col("s.norm"), col("c.v"),
          col("c.norm")).as("sim"))
      .filter(col("sim") >= threshold)
  }

  // ---- ADC screen from the persisted IVF×PQ index ----

  /** The loaded PQ codebook packed into ONE broadcastable row:
    * (cb: array<struct<s, code, cv>>) sorted by (s, code) — position
    * s·k + code + 1 holds subspace s's entry for `code`, because the
    * seed codebook is complete (codes 0..k−1 per subspace). m·k entries:
    * model-sized, like [[centroidArray]].
    */
  def codebookArray(codebook: DataFrame): DataFrame =
    codebook.agg(sort_array(collect_list(struct(
      col("s"), col("code"), col("cv")))).as("cb"))

  /** Static serving side built once from the persisted index frames:
    * per-vector PQ codes packed s-ordered into one array, joined with the
    * cell assignment — (corpus_id, cell, codes). The stream never touches
    * a full-precision corpus vector: m ints per corpus row is the entire
    * per-candidate payload, exactly the batch IVF×PQ discipline.
    */
  def packedCodes(cells: DataFrame, codes: DataFrame): DataFrame =
    codes.groupBy(col("vec_id"))
      .agg(transform(sort_array(collect_list(struct(col("s"), col("code")))),
        c => c("code")).as("codes"))
      .join(cells, "vec_id")
      .select(col("vec_id").as("corpus_id"), col("cell"), col("codes"))

  /** Screen a watermarked embedding stream against the SERVED IVF×PQ
    * index ([[graft.ops.Similarity.ivfPqRerankServed]]'s layout): each
    * arrival ranks the broadcast centroids for its `nprobe` probe cells
    * (same rounded-cosine total order as the batch `TopN.topNPer`),
    * computes its m·k ADC distance table against the broadcast codebook
    * in-row ([[Similarity.pqQdistOf]] — the shared expression, so
    * stream and batch distances are bit-equal by construction), then
    * stream-static-joins the packed-code corpus on the int cell id and
    * sums the m table lookups IN-ROW — no streaming aggregation state at
    * all, so the query runs append-mode with only the watermark.
    *
    * Emits (vec_id, ts, cell, corpus_id, adist) for every probed-cell
    * corpus vector with adist ≤ `maxAdist`. Per-arrival cost is
    * C + m·k lambda evaluations plus an m-lookup per candidate — bounded
    * by ingest rate and shortlist mass, never corpus-sized.
    */
  def adcScreenFromIndex(
      stream: DataFrame, tsCol: String, delay: String,
      centroids: DataFrame, packed: DataFrame, codebook: DataFrame,
      nprobe: Int, m: Int, k: Int, dims: Int, maxAdist: Long): DataFrame = {
    require(dims % m == 0, s"dims=$dims not divisible by m=$m")
    val sub = dims / m
    val withIndex = stream
      .withWatermark(tsCol, delay)
      .withColumn("v", col("embedding").cast("array<double>"))
      .withColumn("norm", graft.functions.VectorFunctions.l2_norm(col("v")))
      .crossJoin(broadcast(centroidArray(centroids)))
      .crossJoin(broadcast(codebookArray(codebook)))
    // negated rounded cosine makes ascending array_sort the batch rank's
    // (score desc, cent_id asc) total order; rounding to 6 decimals
    // happens BEFORE negation, so the negation is exact
    val probeCells = slice(array_sort(transform(col("cents"), c =>
      struct((-Similarity.cosine(col("v"), col("norm"), c("cv"),
        c("cnorm"))).as("ns"), c("cent_id").as("cid")))), 1, nprobe)
    val qarr = transform(col("cb"), e =>
      Similarity.pqQdistOf(
        slice(col("v"), e("s") * lit(sub) + lit(1), lit(sub)), e("cv")))
    val probes = withIndex
      .withColumn("qarr", qarr)
      .withColumn("pc", explode(probeCells))
      .select(col("vec_id"), col(tsCol), col("pc.cid").as("cell"),
        col("qarr"))
    probes.alias("s").join(packed.alias("c"),
        col("s.cell") === col("c.cell") &&
          col("s.vec_id") =!= col("c.corpus_id"))
      .withColumn("adist", aggregate(
        transform(sequence(lit(0), lit(m - 1)), s =>
          element_at(col("qarr"),
            s * lit(k) + element_at(col("codes"), s + lit(1)) + lit(1))),
        lit(0L), (acc, x) => acc + x))
      .filter(col("adist") <= maxAdist)
      .select(col("s.vec_id"), col(s"s.$tsCol").as(tsCol),
        col("s.cell").as("cell"), col("c.corpus_id"), col("adist"))
  }

  /** Delta-cell refresh of the served IVF×PQ index — the freshness leg
    * [[adcScreenFromIndex]] alone leaves open: a foreachBatch handler
    * that encodes each micro-batch of arriving embeddings with the
    * FROZEN model — cell by [[Similarity.ivfAssign]], codes by
    * [[Similarity.pqEncodeWith]], the same expressions the batch index
    * build evaluates, so an appended row is bit-equal to the row a full
    * rebuild would produce for that vector — and APPENDS them to
    * `indexPath` in [[packedCodes]]' (corpus_id, cell, codes) layout.
    * The model stays frozen in-flight (standard IVF serving: cell
    * CONTENTS grow; centroids and codebook retrain offline), appends are
    * additive, so after ANY prefix of micro-batches the served table
    * equals a frozen-model batch rebuild over corpus ∪ prefix — the
    * spec's contract — and the next screening micro-batch probes cells
    * that already contain this morning's arrivals.
    *
    * Scale: per batch the cost is batch-sized (one C-bounded broadcast
    * argmax, one m·k-bounded code argmin, one appended parquet file);
    * the served index is never rewritten or re-scanned. Batch input
    * needs (vec_id, embedding: array<float>).
    */
  def indexRefreshBatches(centroids: DataFrame, codebook: DataFrame,
      m: Int, dims: Int, indexPath: String): (DataFrame, Long) => Unit =
    (batch, _) => if (!batch.isEmpty) {
      val vecs = Similarity.withNorm(
        batch.select(col("vec_id"), col("embedding")),
        col("vec_id"), col("embedding"))
      Similarity.ivfAssign(vecs, centroids)
        .join(Similarity.pqEncodeWith(vecs, codebook, m, dims), "vec_id")
        .select(col("vec_id").as("corpus_id"), col("cell"),
          array((0 until m).map(s => col(s"c$s")): _*).as("codes"))
        .write.mode("append").parquet(indexPath)
    }

  /** Novelty screen against persisted k-center coreset centers
    * ([[graft.ops.Similarity.kCenterCenters]]'s (center_id, cqv, cn2)
    * layout): each arrival computes its exact integer-quantized squared
    * distance to all k broadcast centers IN-ROW (the batch
    * `assignToCenters` arithmetic — same quantization, same (dist2,
    * center_id) argmin tie-break, so flags are bit-equal by
    * construction) and is marked `novel` when its nearest center is
    * farther than `noveltyQ`. The streaming use of a diversity coreset:
    * arrivals near an existing representative are redundant; far ones
    * are the candidates worth keeping/labeling.
    *
    * Stateless (broadcast k-row model + per-row arithmetic, no streaming
    * aggregation), so it runs append-mode with only the watermark —
    * per-arrival cost is k codegen'd dot products, never corpus-sized.
    */
  def noveltyScreenFromCenters(
      stream: DataFrame, tsCol: String, delay: String,
      centers: DataFrame, noveltyQ: Long): DataFrame = {
    val centArr = centers.agg(sort_array(collect_list(struct(
      col("center_id"), col("cqv"), col("cn2")))).as("cs"))
    stream
      .withWatermark(tsCol, delay)
      .withColumn("qv", expr("transform(cast(embedding as array<double>), " +
        s"x -> cast(cast(round(x * ${Similarity.KmeansQuantScale} + 1e-9) " +
        "as bigint) as double))"))
      .withColumn("n2",
        graft.functions.VectorFunctions.dot_product(col("qv"), col("qv")))
      .crossJoin(broadcast(centArr))
      .withColumn("scored", array_sort(transform(col("cs"), c =>
        struct((col("n2") + c("cn2") - lit(2.0) *
          graft.functions.VectorFunctions.dot_product(col("qv"), c("cqv")))
          .cast("long").as("d"),
          c("center_id").as("cid")))))
      .select(col("vec_id"), col(tsCol),
        element_at(col("scored"), 1)("cid").as("center_id"),
        element_at(col("scored"), 1)("d").as("dist2"))
      .withColumn("novel", col("dist2") > noveltyQ)
  }
}
