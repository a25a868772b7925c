package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import graft.ext.{Similarity, SurprisalScore}

/** Training-data mining: corpus-LM surprisal quality scoring (q86) and
  * contrastive hard-negative mining (q87). */
object MiningQueries {

  /** q86: integer surprisal per document — the perplexity-style quality
    * gate with the corpus's own token-bigram counts as the LM and
    * bit-length arithmetic instead of floating logs. */
  def q86Surprisal(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    SurprisalScore.tokenBigramSurprisal(
        Tables.load(s, dir, "documents"), "doc_id", "text")
      .select($"id".as("doc_id"), $"n_bigrams", $"surprisal_bits", $"millibits_per_gram")
      .orderBy($"doc_id")
  }

  val q86Sql: String =
    """WITH toks AS (SELECT doc_id, string_split_regex(trim(text), '\s+') AS t FROM documents),
      |g2 AS (SELECT doc_id, unnest(list_transform(generate_series(1, len(t)-1),
      |        i -> t[i] || ' ' || t[i+1])) AS g FROM toks),
      |c AS (SELECT g, COUNT(*) AS c FROM g2 GROUP BY g),
      |n AS (SELECT CAST(SUM(c) AS BIGINT) AS n_total FROM c),
      |s AS (SELECT g2.doc_id, COUNT(*) AS n_bigrams,
      |    CAST(SUM(CAST(length(bin(n.n_total)) AS BIGINT)
      |             - CAST(length(bin(c.c)) AS BIGINT)) AS BIGINT) AS surprisal_bits
      |  FROM g2 JOIN c USING (g) CROSS JOIN n GROUP BY g2.doc_id)
      |SELECT d.doc_id,
      |  CAST(COALESCE(s.n_bigrams, 0) AS BIGINT) AS n_bigrams,
      |  s.surprisal_bits,
      |  CAST(CASE WHEN s.n_bigrams > 0 THEN s.surprisal_bits * 1000 // s.n_bigrams END AS BIGINT)
      |    AS millibits_per_gram
      |FROM documents d LEFT JOIN s USING (doc_id) ORDER BY doc_id""".stripMargin

  /** q87: hard negatives — for each of the first 10 query vectors, the
    * 5 most cosine-similar vectors with a DIFFERENT label. */
  def q87HardNegatives(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val emb = Tables.load(s, dir, "embeddings")
    Similarity.hardNegatives(emb, emb.filter($"vec_id" < 10),
        "vec_id", "embedding", "label", k = 5)
      .orderBy($"query_id", $"rank")
  }

  val q87Sql: String =
    """WITH v AS (SELECT vec_id, label, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS e FROM embeddings),
      |n AS (SELECT vec_id, label, e, sqrt(list_sum(list_transform(e, x -> x*x))) AS nrm FROM v),
      |q AS (SELECT vec_id AS query_id, label AS query_label, e AS qe, nrm AS qnrm
      |  FROM n WHERE vec_id < 10),
      |sc AS (SELECT q.query_id, q.query_label, n.vec_id AS neighbor_id, n.label AS neighbor_label,
      |    list_sum(list_transform(generate_series(1, 64), i -> q.qe[i]*n.e[i])) / (q.qnrm*n.nrm) AS cos
      |  FROM q JOIN n ON n.label != q.query_label),
      |r AS (SELECT *, CAST(ROW_NUMBER() OVER
      |  (PARTITION BY query_id ORDER BY cos DESC, neighbor_id) AS BIGINT) AS rank FROM sc)
      |SELECT query_id, query_label, neighbor_id, neighbor_label, rank, cos
      |FROM r WHERE rank <= 5 ORDER BY query_id, rank""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q86_surprisal" -> (q86Surprisal _),
    "q87_hard_negatives" -> (q87HardNegatives _))

  val oracle: Map[String, String] = Map(
    "q86_surprisal" -> q86Sql,
    "q87_hard_negatives" -> q87Sql)
}
