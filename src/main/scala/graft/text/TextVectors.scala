package graft.text

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.util.Tokens

/** Hashed-TF document vectors — the bridge from RAW TEXT to the
  * vector stack: every document becomes a [[Dim]]-dim integer
  * term-frequency vector via the hashing trick (dim = 60-bit token
  * hash mod [[Dim]] — no vocabulary relation at ANY corpus size, the
  * q171 rule), so the semantic machinery (cosine pairs, clustering,
  * ANN) applies to corpora that ship no embedding table at all.
  *
  * Long-form output (doc_id, dim, v) on purpose: integer cells
  * hash-gate exactly, and the sparse relation IS the inverted-index
  * form the scalable dot-product join consumes.
  *
  * Scale shape: q191 is one corpus scan → (doc_id, dim)-keyed
  * partial agg (≤ Dim rows per doc). q192's gate mode scores pairs
  * through the dim-keyed join — the sparse-dot spelling that, on a
  * REAL hashed-TF space (2¹⁸ dims, idf-pruned postings), is exactly
  * the q117 prefix-filter machinery; at this gate's 64 dense dims
  * it is deliberately exhaustive (the oracle surface). Production at
  * 100 TB: quantize these vectors into the existing int8/SRP/PQ
  * paths (q143/q52/q186) — the representation, not the operator,
  * is what this module adds. Overflow: v ≤ doc tokens, so norms²
  * stay ≤ 64·maxTf² — BIGINT-safe to ~10⁸-token documents. */
object TextVectors {

  val Dim = 64

  /** Cosine floor of the q192 pair report. */
  val Tau = 0.95

  /** q191: the hashed-TF relation (doc_id, dim, v). */
  def hashedTf(s: SparkSession, dir: String): DataFrame = {
    val zone = graft.util.Scratch.memo(s, "span-tokens",
      s"span-tokens:$dir")(
      Tables.load(s, dir, "documents")
        .select(col("doc_id"), Tokens.whitespace(col("text")).as("w")))
    zone.select(col("doc_id"), explode(col("w")).as("tok"))
      .select(col("doc_id"),
        (graft.dedup.Md5Prefix.h(col("tok")) % Dim).cast("int")
          .as("dim"))
      .groupBy(col("doc_id"), col("dim"))
      .agg(count(lit(1)).as("v"))
      .orderBy("doc_id", "dim")
  }

  /** q192: text near-dup pairs by hashed-TF cosine ≥ [[Tau]] — the
    * semantic complement of the lexical pair family (q36 shingles
    * see copies; TF cosine sees topic-identical rewrites) computed
    * from TEXT alone. Exact integer dot and norms; ONE double
    * (dot / √(n2a·n2b)) per surviving pair.
    *
    * EXACT-SET COLLAPSE (the round-11 jaccard fix, applied at birth
    * here): cosine is a pure function of the token multiset, so
    * byte-identical documents share one REPRESENTATIVE through the
    * dim-join — candidate volume tracks DISTINCT texts, and a 10×
    * verbatim-clone corpus (the sf1 stress) costs the same scoring
    * as its distinct core. The pair list re-expands algebraically:
    * cross-family pairs inherit the rep pair's exact integers;
    * within-family pairs are (n2, cosine(n2,n2)) by identity — both
    * spelled through the SAME cosine expression, so the output is
    * bit-identical to the brute derivation and the oracle stays the
    * brute spelling (outputs, not plans, are the contract). */
  def tfCosinePairs(s: SparkSession, dir: String): DataFrame =
    // memoized: q192's surface AND q193's edge source read the stored
    // pair relation — the rep-level dense scoring runs once per
    // application, not once per consumer (the >=2-consumer rule;
    // measured ~3 s/query at sf0.1 for the re-derive)
    graft.util.Scratch.memo(s, "tf-pairs", s"tf-pairs:$dir")(
      tfCosinePairsDerive(s, dir)).orderBy("id1", "id2")

  private def tfCosinePairsDerive(s: SparkSession, dir: String): DataFrame = {
    val docs = Tables.load(s, dir, "documents")
      .select(col("doc_id"), md5(coalesce(col("text"), lit("")))
        .as("dg"))
    val fam = docs.groupBy(col("dg"))
      .agg(sort_array(collect_list(col("doc_id"))).as("members"),
        min(col("doc_id")).as("rep"))
    val reps = fam.select(col("rep"))
    val tf = hashedTf(s, dir)
      .join(reps.select(col("rep").as("doc_id")), "doc_id")
    // DENSE rep vectors + codegen'd LongDot all-pairs scoring: the
    // dim-keyed product join shuffles |pairs|·|shared dims| rows
    // (measured 92 s at sf0.1 — these 64-dim vectors are DENSE), so
    // the rep×rep scoring runs map-side instead: one 64-long array
    // per rep, broadcast nested-loop pairs, zero-allocation dot
    // (the q155 Int8Dot precedent). Quadratic in DISTINCT texts —
    // the gate/report surface; at corpus scale the same vectors ride
    // the banding/quantization paths (q52/q143/q186).
    def longDot(a: org.apache.spark.sql.Column,
                b: org.apache.spark.sql.Column) =
      org.apache.spark.sql.GraftBridge.column(
        graft.functions.LongDot(
          org.apache.spark.sql.GraftBridge.expression(a),
          org.apache.spark.sql.GraftBridge.expression(b)))
    val tfArr = tf.groupBy(col("doc_id"))
      .agg(map_from_entries(collect_list(struct(col("dim"), col("v"))))
        .as("mp"))
      .select(col("doc_id"), expr(
        s"transform(sequence(0, ${Dim - 1}), d -> " +
          "coalesce(element_at(mp, d), CAST(0 AS BIGINT)))").as("arr"))
    val nrm = tfArr.select(col("doc_id"),
      longDot(col("arr"), col("arr")).as("n2"))
    def cosineCol = col("dot").cast("double") /
      sqrt((col("n2a") * col("n2b")).cast("double"))
    val left = tfArr
      .repartition(s.sparkContext.defaultParallelism)
      .select(col("doc_id").as("r1"), col("arr").as("aa"))
    val right = tfArr
      .select(col("doc_id").as("r2"), col("arr").as("ab"))
    val repPairs = left.join(right, col("r1") < col("r2"))
      .select(col("r1"), col("r2"),
        longDot(col("aa"), col("ab")).as("dot"))
      .join(nrm.select(col("doc_id").as("r1"), col("n2").as("n2a")),
        "r1")
      .join(nrm.select(col("doc_id").as("r2"), col("n2").as("n2b")),
        "r2")
      .withColumn("cosine", cosineCol)
      .where(col("cosine") >= Tau)
    // cross-family expansion: every member pair inherits the rep
    // pair's exact integers (identical vectors ⇒ identical dot/norms)
    val cross = repPairs
      .join(fam.select(col("rep").as("r1"), col("members").as("ma")),
        "r1")
      .join(fam.select(col("rep").as("r2"), col("members").as("mb")),
        "r2")
      .select(explode(col("ma")).as("a"), col("mb"), col("dot"),
        col("cosine"))
      .select(col("a"), explode(col("mb")).as("b"), col("dot"),
        col("cosine"))
      .select(least(col("a"), col("b")).as("id1"),
        greatest(col("a"), col("b")).as("id2"),
        col("dot"), col("cosine"))
    // within-family expansion: identical vectors, dot = n2 and the
    // SAME cosine expression on (n2, n2, n2) — families whose rep
    // has no tokens produce no tf rows and correctly drop here
    val within = fam.where(size(col("members")) > 1)
      .join(nrm.select(col("doc_id").as("rep"), col("n2")), "rep")
      .select(col("members"), col("n2").as("dot"),
        col("n2").as("n2a"), col("n2").as("n2b"))
      .withColumn("cosine", cosineCol)
      .where(col("cosine") >= Tau)
      .select(explode(expr(
        """flatten(transform(sequence(0, size(members) - 2), i ->
          |  transform(sequence(i + 1, size(members) - 1), j ->
          |    struct(members[i] AS id1, members[j] AS id2))))
          |""".stripMargin)).as("p"), col("dot"), col("cosine"))
      .select(col("p.id1").as("id1"), col("p.id2").as("id2"),
        col("dot"), col("cosine"))
    cross.unionByName(within)
      .select(col("id1"), col("id2"), col("dot"), col("cosine"))
      .orderBy("id1", "id2")
  }

  /** q193: text semantic dedup CLUSTERS — the q192 pair graph folded
    * into connected components with a survivor per cluster: semantic
    * dedup for corpora that ship NO embedding table, the full q98 →
    * q107 arc replayed from raw text. Same star-contraction CC
    * operator, same min-id survivor contract, same recursive-CTE
    * oracle closure. */
  def tfClusters(s: SparkSession, dir: String): DataFrame = {
    val docs = Tables.load(s, dir, "documents").select(col("doc_id"))
    val pairs = tfCosinePairs(s, dir)
      .select(col("id1").as("a"), col("id2").as("b"))
    val labels = graft.dedup.Dedup.connectedComponents(pairs)
    docs.join(labels, docs("doc_id") === labels("id"), "left")
      .select(col("doc_id"),
        coalesce(col("label"), col("doc_id")).as("cluster_id"))
      .withColumn("keep", col("doc_id") === col("cluster_id"))
      .orderBy("doc_id")
  }

  /** q292's holdout modulus (the q102 hash-split discipline): a doc
    * is test iff its salted hash lands in residue 0 — ≈20%. */
  val RocchioMod = 5

  /** q292: Rocchio centroid classification + confusion matrix — the
    * relational "train a text classifier" loop closed end-to-end:
    * class centroids are summed hashed-TF vectors over the TRAIN
    * slice (one rollup — training IS aggregation for this family),
    * every TEST doc scores against each centroid through the
    * dim-keyed sparse dot, and the argmax by cosine-vs-centroid
    * (doc-norm dropped — constant per doc, argmax-invariant) gives
    * the prediction; the output is the (true_source, predicted)
    * count matrix a data-quality dashboard reads as "are sources
    * separable in TF space". The ordering float is ONE IEEE
    * expression (dot/√‖c‖²) over exact integers — identical doubles
    * in both engines, so the argmax can't drift (ties broken by
    * source name).
    *
    * Scale shape: centroids are a ≤|classes|·[[Dim]] CONSTANT-bounded
    * relation (the sanctioned small side — unhinted, AQE broadcasts);
    * scoring is one dim-keyed join + (doc, class) rollup; no
    * corpus×corpus anything. */
  def rocchioConfusion(s: SparkSession, dir: String): DataFrame = {
    import graft.dedup.Md5Prefix
    val zone = graft.util.Scratch.memo(s, "span-tokens",
      s"span-tokens:$dir")(
      Tables.load(s, dir, "documents")
        .select(col("doc_id"), Tokens.whitespace(col("text")).as("w")))
    val tf = zone.select(col("doc_id"), explode(col("w")).as("tok"))
      .select(col("doc_id"),
        (Md5Prefix.h(col("tok")) % Dim).cast("int").as("dim"))
      .groupBy(col("doc_id"), col("dim"))
      .agg(count(lit(1)).as("v"))
    val docs = Tables.load(s, dir, "documents")
      .select(col("doc_id"), col("source"),
        (pmod(Md5Prefix.h(concat(col("doc_id").cast("string"),
          lit("|rocchio"))), lit(RocchioMod.toLong)) === 0L)
          .as("is_test"))
    val cent = tf.join(docs.where(!col("is_test"))
        .select(col("doc_id"), col("source")), "doc_id")
      .groupBy(col("source"), col("dim"))
      .agg(sum(col("v")).as("cv"))
    val norms = cent.groupBy(col("source"))
      .agg(sum(col("cv") * col("cv")).as("n2"))
    val scores = tf.join(docs.where(col("is_test"))
        .select(col("doc_id")), "doc_id")
      .join(cent, "dim")
      .groupBy(col("doc_id"), col("source"))
      .agg(sum(col("v") * col("cv")).as("dot"))
      .join(norms, "source")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("doc_id"))
      .orderBy((col("dot").cast("double")
        / sqrt(col("n2").cast("double"))).desc, col("source"))
    val pred = scores.withColumn("rn", row_number().over(w))
      .where(col("rn") === 1)
      .select(col("doc_id"), col("source").as("predicted"))
    pred.join(docs.select(col("doc_id"),
        col("source").as("true_source")), "doc_id")
      .groupBy(col("true_source"), col("predicted"))
      .agg(count(lit(1)).as("n"))
      .orderBy("true_source", "predicted")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q191_hashed_tf" -> (hashedTf _),
    "q192_tf_cosine_pairs" -> (tfCosinePairs _),
    "q292_rocchio_confusion" -> (rocchioConfusion _),
    "q193_tf_clusters" -> (tfClusters _))

  private val tfSql: String =
    raw"""tok AS (
      |  SELECT doc_id, unnest(string_split_regex(trim(text),
      |    '[ \t\n\v\f\r]+')) AS t
      |  FROM documents),
      |tf AS MATERIALIZED (
      |  SELECT doc_id,
      |    CAST((('0x' || substr(md5(t), 1, 15))::BIGINT % $Dim)
      |      AS INT) AS dim,
      |    CAST(count(*) AS BIGINT) AS v
      |  FROM tok GROUP BY 1, 2)""".stripMargin

  val oracle: Map[String, String] = Map(
    "q292_rocchio_confusion" ->
      s"""WITH $tfSql,
         |dx AS MATERIALIZED (
         |  SELECT doc_id, source,
         |    (('0x' || substr(md5(CAST(doc_id AS VARCHAR)
         |      || '|rocchio'), 1, 15))::BIGINT % $RocchioMod = 0)
         |      AS is_test
         |  FROM documents),
         |cent AS MATERIALIZED (
         |  SELECT d.source, tf.dim, CAST(sum(tf.v) AS BIGINT) AS cv
         |  FROM tf JOIN dx d USING (doc_id)
         |  WHERE NOT d.is_test GROUP BY 1, 2),
         |nrm AS (
         |  SELECT source, CAST(sum(cv * cv) AS BIGINT) AS n2
         |  FROM cent GROUP BY 1),
         |sc AS (
         |  SELECT tf.doc_id, c.source,
         |    CAST(sum(tf.v * c.cv) AS BIGINT) AS dot
         |  FROM tf
         |  JOIN dx d USING (doc_id)
         |  JOIN cent c USING (dim)
         |  WHERE d.is_test GROUP BY 1, 2),
         |pred AS (
         |  SELECT doc_id, source AS predicted FROM (
         |    SELECT sc.doc_id, sc.source,
         |      row_number() OVER (PARTITION BY sc.doc_id
         |        ORDER BY CAST(sc.dot AS DOUBLE)
         |          / sqrt(CAST(n.n2 AS DOUBLE)) DESC, sc.source) AS rn
         |    FROM sc JOIN nrm n ON n.source = sc.source)
         |  WHERE rn = 1)
         |SELECT d.source AS true_source, p.predicted,
         |  CAST(count(*) AS BIGINT) AS n
         |FROM pred p JOIN dx d USING (doc_id)
         |GROUP BY 1, 2 ORDER BY true_source, predicted""".stripMargin,
    "q191_hashed_tf" ->
      s"""WITH $tfSql
         |SELECT doc_id, dim, v FROM tf ORDER BY doc_id, dim
         |""".stripMargin,
    "q192_tf_cosine_pairs" ->
      s"""WITH $tfSql,
         |nrm AS (SELECT doc_id, CAST(sum(v * v) AS BIGINT) AS n2
         |        FROM tf GROUP BY 1),
         |dt AS (
         |  SELECT a.doc_id AS id1, b.doc_id AS id2,
         |    CAST(sum(a.v * b.v) AS BIGINT) AS dot
         |  FROM tf a JOIN tf b ON a.dim = b.dim
         |    AND a.doc_id < b.doc_id
         |  GROUP BY 1, 2)
         |SELECT id1, id2, dot,
         |  CAST(dot AS DOUBLE)
         |    / sqrt(CAST(na.n2 * nb.n2 AS DOUBLE)) AS cosine
         |FROM dt JOIN nrm na ON na.doc_id = dt.id1
         |JOIN nrm nb ON nb.doc_id = dt.id2
         |WHERE CAST(dot AS DOUBLE)
         |    / sqrt(CAST(na.n2 * nb.n2 AS DOUBLE)) >= $Tau
         |ORDER BY id1, id2
         |""".stripMargin,
    // the q98-family recursive-CTE min-label fixpoint over the q192
    // pair derivation
    "q193_tf_clusters" ->
      s"""WITH RECURSIVE $tfSql,
         |nrm AS (SELECT doc_id, CAST(sum(v * v) AS BIGINT) AS n2
         |        FROM tf GROUP BY 1),
         |dt AS (
         |  SELECT a.doc_id AS id1, b.doc_id AS id2,
         |    CAST(sum(a.v * b.v) AS BIGINT) AS dot
         |  FROM tf a JOIN tf b ON a.dim = b.dim
         |    AND a.doc_id < b.doc_id
         |  GROUP BY 1, 2),
         |p AS (
         |  SELECT id1, id2 FROM dt
         |  JOIN nrm na ON na.doc_id = dt.id1
         |  JOIN nrm nb ON nb.doc_id = dt.id2
         |  WHERE CAST(dot AS DOUBLE)
         |    / sqrt(CAST(na.n2 * nb.n2 AS DOUBLE)) >= $Tau),
         |e(src, dst) AS (
         |  SELECT id1, id2 FROM p UNION ALL SELECT id2, id1 FROM p),
         |reach(id, label) AS (
         |  SELECT doc_id, doc_id FROM documents
         |  UNION
         |  SELECT e.dst, r.label FROM reach r JOIN e ON e.src = r.id)
         |SELECT id AS doc_id, min(label) AS cluster_id,
         |  (id = min(label)) AS keep
         |FROM reach GROUP BY id ORDER BY doc_id
         |""".stripMargin)
}
