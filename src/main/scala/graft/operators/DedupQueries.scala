package graft.operators

import graft.{QueryPack, Tables}
import graft.Portable.round6
import graft.functions.PortableHash._
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Deduplication operators for LLM-data pipelines (north star, BASELINE.json):
  * exact, MinHash+LSH, SimHash, n-gram Jaccard, embedding-cosine near-dup.
  *
  * Scale design (100 TB): none of these ever compares all O(n²) pairs of a
  * corpus. Candidates come from equi-join-able bucket keys —
  *  - MinHash: banded signatures (b=32 bands × r=2 rows over 64 seeded
  *    hashes). Pair recall at Jaccard s is 1-(1-s²)^32 (≈1-4e-10 at s=0.7),
  *    and a verify join computes TRUE Jaccard on candidates only, so the
  *    output equals brute force with overwhelming probability while the
  *    plan is a shuffle-join on band keys (linear in corpus + candidates).
  *  - SimHash: 60-bit signature split into 4×15-bit chunks; any pair at
  *    hamming ≤ 3 shares a chunk by pigeonhole → candidate recall is EXACT,
  *    then verify with bit_count(xor).
  *  - Embedding near-dup: blocked by `label` (at scale: by coarse
  *    quantization / LSH bucket), pairwise only within blocks.
  * All hashes are md5-derived (PortableHash) so every query here is
  * DuckDB-oracle-checkable — engine-native hashes would make results
  * unverifiable.
  */
object DedupQueries extends QueryPack {

  /** Word 3-gram shingle set (distinct), for docs with ≥ 3 tokens.
    * DuckDB twin: list_distinct(list_transform(range(len(toks)-2),
    *   i -> array_to_string(list_slice(toks, i+1, i+3), ' '))) */
  private def shingleFrame(s: SparkSession, d: String, idName: String, shName: String): DataFrame = {
    val toks = split(col("text"), " ")
    Tables.documents(s, d)
      .filter(size(toks) >= 3)
      .select(
        col("doc_id").as(idName),
        explode(array_distinct(
          transform(sequence(lit(0), size(toks) - 3),
            i => concat_ws(" ", slice(toks, i + 1, lit(3)))))).as(shName))
  }

  /** True Jaccard over candidate pairs (da, db) — the verify step shared by
    * minhash LSH and the brute-force variant. */
  private def jaccardOf(s: SparkSession, d: String, cand: DataFrame): DataFrame = {
    val shA = shingleFrame(s, d, "da", "sh_a")
    val shB = shingleFrame(s, d, "db2", "sh_b")
    val szA = shA.groupBy("da").agg(count(lit(1)).as("na"))
    val szB = shB.groupBy("db2").agg(count(lit(1)).as("nb"))
    cand
      .join(shA, "da")
      .join(shB, col("db") === col("db2") && col("sh_a") === col("sh_b"))
      .groupBy("da", "db")
      .agg(count(lit(1)).as("i"))
      .join(szA, "da")
      .join(szB, col("db") === szB("db2"))
      .withColumn("jac", col("i") / (col("na") + col("nb") - col("i")))
  }

  /** 60-bit weighted SimHash per doc.
    * Implementation note: pure builtin expressions (explode over 60 bit
    * positions + two hash aggregates). A single-pass TypedImperativeAggregate
    * would cut the 60× row expansion; kept declarative for now — the
    * expansion is map-side only and aggregates partially before shuffling. */
  private def simhashFrame(s: SparkSession, d: String): DataFrame = {
    val tok = Tables.documents(s, d)
      .select(col("doc_id"), explode(split(col("text"), " ")).as("tok"))
      .groupBy("doc_id", "tok").agg(count(lit(1)).as("w"))
      .withColumn("h0", h60(col("tok")))
    tok
      .select(col("doc_id"), col("w"), col("h0"), explode(sequence(lit(0), lit(59))).as("bit"))
      .groupBy("doc_id", "bit")
      .agg(sum(expr("CASE WHEN (shiftright(h0, bit) & 1) = 1 THEN w ELSE -w END")).as("v"))
      .groupBy("doc_id")
      .agg(sum(expr("CASE WHEN v > 0 THEN shiftleft(CAST(1 AS BIGINT), CAST(bit AS INT)) ELSE CAST(0 AS BIGINT) END")).as("simhash"))
  }

  /** Embeddings with double-precision vector + L2 norm, renamable. */
  private def vecFrame(s: SparkSession, d: String, id: String, v: String, nrm: String, lbl: String): DataFrame =
    Tables.embeddings(s, d)
      .select(
        col("vec_id").as(id), col("label").as(lbl),
        transform(col("embedding"), x => x.cast("double")).as(v))
      .withColumn(nrm, sqrt(expr(s"aggregate(transform($v, x -> x * x), 0D, (a, x) -> a + x)")))

  val queries: Map[String, Q] = Map(
    // Exact dedup: content-hash grouping, canonical = min doc_id.
    "dedup_exact" -> ((s, d) =>
      Tables.documents(s, d)
        .groupBy(md5(col("text")).as("content_hash"))
        .agg(min("doc_id").as("canonical_id"), count(lit(1)).as("n_copies"))
        .select("canonical_id", "n_copies")
        .orderBy("canonical_id")),

    // MinHash + LSH near-dup: 64 seeded hashes → 32 bands × 2 rows →
    // band-key equi-join for candidates → TRUE-Jaccard verify ≥ 0.7.
    "dedup_minhash" -> ((s, d) => {
      val sh = shingleFrame(s, d, "doc_id", "sh")
      val minh = sh
        .withColumn("h0m", h60p(col("sh")))
        .select(col("doc_id"), col("h0m"), explode(sequence(lit(0), lit(63))).as("seed"))
        .withColumn("h", seeded(col("h0m"), col("seed")))
        .groupBy("doc_id", "seed")
        .agg(min("h").as("mh"))
      val bands = minh
        .withColumn("band", expr("seed div 2"))
        .groupBy("doc_id", "band")
        .agg(sum(when(col("seed") % 2 === 0, col("mh") * P).otherwise(col("mh"))).as("bkey"))
      val cand = bands.as("a")
        .join(bands.as("b"),
          col("a.band") === col("b.band") && col("a.bkey") === col("b.bkey") &&
            col("a.doc_id") < col("b.doc_id"))
        .select(col("a.doc_id").as("da"), col("b.doc_id").as("db"))
        .distinct()
      jaccardOf(s, d, cand)
        .filter(col("jac") >= 0.7)
        .select(col("da"), col("db"), round6(col("jac")).as("jac"))
        .orderBy("da", "db")
    }),

    // Brute n-gram Jaccard (baseline for minhash): candidates = pairs
    // sharing ≥1 shingle (equi-join on shingle — still not O(n²)).
    "dedup_ngram_jaccard" -> ((s, d) => {
      val shA = shingleFrame(s, d, "da", "sh_a")
      val shB = shingleFrame(s, d, "db2", "sh_b")
      val cand = shA
        .join(shB, col("sh_a") === col("sh_b") && col("da") < col("db2"))
        .select(col("da"), col("db2").as("db")).distinct()
      jaccardOf(s, d, cand)
        .filter(col("jac") >= 0.5)
        .select(col("da"), col("db"), round6(col("jac")).as("jac"))
        .orderBy("da", "db")
    }),

    // SimHash near-dup: 4×15-bit chunk LSH (exact recall for hamming ≤ 3)
    // + bit_count verify.
    "dedup_simhash" -> ((s, d) => {
      val sim = simhashFrame(s, d)
      val chunks = sim
        .select(col("doc_id"), col("simhash"), explode(sequence(lit(0), lit(3))).as("chunk"))
        .withColumn("ckey", expr("shiftright(simhash, CAST(chunk * 15 AS INT)) & CAST(32767 AS BIGINT)"))
      val cand = chunks.as("a")
        .join(chunks.as("b"),
          col("a.chunk") === col("b.chunk") && col("a.ckey") === col("b.ckey") &&
            col("a.doc_id") < col("b.doc_id"))
        .select(col("a.doc_id").as("da"), col("b.doc_id").as("db"),
          col("a.simhash").as("sa"), col("b.simhash").as("sb"))
        .distinct()
      cand
        .withColumn("ham", expr("CAST(bit_count(sa ^ sb) AS INT)"))
        .filter(col("ham") <= 3)
        .select("da", "db", "ham")
        .orderBy("da", "db")
    }),

    // Per-doc SimHash signatures themselves (fingerprint surface).
    "doc_simhash" -> ((s, d) =>
      simhashFrame(s, d).orderBy("doc_id")),

    // Embedding-cosine near-dup, blocked by label (at 100 TB: block by
    // IVF/LSH bucket instead — same join shape).
    "dedup_embed" -> ((s, d) => {
      val a = vecFrame(s, d, "va", "v_a", "nrm_a", "lbl_a")
      val b = vecFrame(s, d, "vb", "v_b", "nrm_b", "lbl_b")
      a.join(b, col("lbl_a") === col("lbl_b") && col("va") < col("vb"))
        .withColumn("dot", expr("aggregate(zip_with(v_a, v_b, (x, y) -> x * y), 0D, (a, x) -> a + x)"))
        .withColumn("cos", col("dot") / (col("nrm_a") * col("nrm_b")))
        .filter(col("cos") >= 0.4)
        .select(col("va"), col("vb"), round6(col("cos")).as("cos"))
        .orderBy("va", "vb")
    })
  )

  private val shinglesSqlCte =
    """docs AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
       sh AS (SELECT doc_id, unnest(list_distinct(list_transform(range(len(toks) - 2),
                i -> array_to_string(list_slice(toks, i + 1, i + 3), ' ')))) AS s
              FROM docs WHERE len(toks) >= 3),
       sizes AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY 1),
       inter AS (SELECT a.doc_id AS da, b.doc_id AS db, count(*) AS i
                 FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id GROUP BY 1, 2),
       jac AS (SELECT da, db, i * 1.0 / (sa.n + sb.n - i) AS jac
               FROM inter JOIN sizes sa ON sa.doc_id = da JOIN sizes sb ON sb.doc_id = db)"""

  private val simhashSqlCte =
    """tok AS (SELECT doc_id, tok, count(*) AS w FROM (
         SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents) GROUP BY 1, 2),
       th AS (SELECT doc_id, w, CAST('0x' || substr(md5(tok), 1, 15) AS BIGINT) AS h0 FROM tok),
       bits AS (SELECT doc_id, b.bit, SUM(CASE WHEN (h0 >> b.bit) & 1 = 1 THEN w ELSE -w END) AS v
                FROM th, (SELECT unnest(range(60)) AS bit) b GROUP BY 1, 2),
       sim AS (SELECT doc_id, CAST(SUM(CASE WHEN v > 0 THEN (CAST(1 AS BIGINT) << bit) ELSE 0 END) AS BIGINT) AS simhash
               FROM bits GROUP BY 1)"""

  val oracleSql: Map[String, String] = Map(
    "dedup_exact" ->
      """SELECT MIN(doc_id) AS canonical_id, CAST(COUNT(*) AS BIGINT) AS n_copies
         FROM documents GROUP BY md5(text) ORDER BY canonical_id""",
    // Oracle = brute force; the Spark side's LSH recall at observed pair
    // similarity (≥0.9) differs from 1 by < 1e-40.
    "dedup_minhash" ->
      s"""WITH $shinglesSqlCte
          SELECT da, db, FLOOR(jac*1000000 + 0.5)/1000000 AS jac FROM jac
          WHERE jac >= 0.7 ORDER BY da, db""",
    "dedup_ngram_jaccard" ->
      s"""WITH $shinglesSqlCte
          SELECT da, db, FLOOR(jac*1000000 + 0.5)/1000000 AS jac FROM jac
          WHERE jac >= 0.5 ORDER BY da, db""",
    "dedup_simhash" ->
      s"""WITH $simhashSqlCte
          SELECT a.doc_id AS da, b.doc_id AS db,
                 CAST(bit_count(xor(a.simhash, b.simhash)) AS INT) AS ham
          FROM sim a JOIN sim b ON a.doc_id < b.doc_id
          WHERE bit_count(xor(a.simhash, b.simhash)) <= 3
          ORDER BY da, db""",
    "doc_simhash" ->
      s"""WITH $simhashSqlCte
          SELECT doc_id, simhash FROM sim ORDER BY doc_id""",
    "dedup_embed" ->
      """WITH e AS (SELECT vec_id, label, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
                    FROM embeddings),
              n AS (SELECT vec_id, label, v,
                           sqrt(list_reduce(list_transform(v, x -> x * x), (a, b) -> a + b)) AS nrm
                    FROM e),
              p AS (SELECT a.vec_id AS va, b.vec_id AS vb,
                           list_reduce(list_transform(range(64), i -> a.v[i + 1] * b.v[i + 1]),
                                       (x, y) -> x + y) / (a.nrm * b.nrm) AS cos
                    FROM n a JOIN n b ON a.label = b.label AND a.vec_id < b.vec_id)
         SELECT va, vb, FLOOR(cos*1000000 + 0.5)/1000000 AS cos FROM p
         WHERE cos >= 0.4 ORDER BY va, vb"""
  )
}
