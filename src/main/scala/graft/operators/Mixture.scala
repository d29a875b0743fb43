package graft.operators

import org.apache.spark.sql.functions._
import graft.{QueryDef, Tables}

/** Training-data mixture operators: deterministic weighted document
  * sampling and temperature-scaled domain mixture weights — the two steps
  * that turn a curated corpus into an actual pretraining data recipe
  * (choose how much of each source to see, then draw the documents).
  *
  * Determinism discipline: sampling decisions come from the portable
  * rolling hash (`roll_hash`, the `q39_hash_sample` convention), never
  * `rand()` — a 100 TB pipeline must be able to regenerate the exact same
  * sample for reproducibility and for holdout stability across reruns.
  * Mixture arithmetic sticks to operations IEEE 754 defines exactly
  * (integer sums, `sqrt`, single divisions), so Spark and DuckDB agree
  * bit-for-bit without any summation-order caveats.
  */
object Mixture {

  def all: Seq[QueryDef] = Seq(weightedSample, temperatureMix)

  /** Deterministic length-weighted Bernoulli sample: document kept iff
    * roll_hash(doc_id) mod 2000 < min(n_chars, 2000) — keep probability
    * proportional to capped length, decided per-row with no shuffle at
    * all until the final per-source aggregate (one hash agg over ~5
    * groups). The selection is a pure function of the row, so the sample
    * is stable under repartitioning, retries, and cluster size — the
    * property `TABLESAMPLE`/`rand()` cannot give. */
  val weightedSample = QueryDef("sample_weighted",
    (s, d) => {
      graft.functions.HashExpressions.register(s)
      Tables.documents(s, d)
        .withColumn("kept",
          (expr("roll_hash(cast(doc_id as string)) % 2000") <
            least(col("n_chars"), lit(2000))).cast("long"))
        .groupBy(col("source"))
        .agg(count(lit(1)).as("n_docs"),
          sum(col("kept")).as("n_kept"),
          sum(col("kept") * col("n_chars")).as("kept_chars"))
        .orderBy(col("source"))
    },
    Some("""SELECT source, COUNT(*) AS n_docs,
        CAST(SUM(kept) AS BIGINT) AS n_kept,
        CAST(SUM(kept * n_chars) AS BIGINT) AS kept_chars
      FROM (SELECT source, n_chars,
        CAST(list_reduce(list_prepend(CAST(0 AS BIGINT),
          list_transform(string_split(CAST(doc_id AS VARCHAR),''),
            c -> CAST(unicode(c) AS BIGINT))),
          (h,c) -> (h*31+c) % 1000000007) % 2000
          < LEAST(n_chars, 2000) AS BIGINT) AS kept
        FROM documents)
      GROUP BY source ORDER BY source"""))

  /** Temperature-scaled (α = 0.5) mixture weights per source: the usual
    * "sample low-resource domains more than their token share" transform
    * (multilingual-LM style). Per source: its exact character count, its
    * uniform share `chars / total_chars`, and its temperature weight
    * relative to the largest source `sqrt(chars) / sqrt(max_chars)`, plus
    * the implied oversampling factor. All four are exact: integer sums,
    * then `sqrt` (correctly rounded per IEEE 754) and one division each —
    * no order-dependent double summation anywhere, so any engine and any
    * partitioning produces identical bits. */
  val temperatureMix = QueryDef("mix_temperature",
    (s, d) => {
      val bySrc = Tables.documents(s, d)
        .groupBy(col("source")).agg(sum(col("n_chars")).as("chars"))
      val tot = bySrc.agg(
        sum(col("chars")).as("total"), max(col("chars")).as("mx"))
      bySrc.crossJoin(broadcast(tot))
        .select(col("source"), col("chars"),
          (col("chars").cast("double") / col("total").cast("double"))
            .as("p_uniform"),
          (sqrt(col("chars").cast("double")) / sqrt(col("mx").cast("double")))
            .as("w_temp"),
          ((sqrt(col("chars").cast("double")) / sqrt(col("mx").cast("double"))) /
            (col("chars").cast("double") / col("total").cast("double")))
            .as("oversample"))
        .orderBy(col("source"))
    },
    Some("""WITH by_src AS (
        SELECT source, SUM(n_chars) AS chars FROM documents GROUP BY source),
      tot AS (SELECT SUM(chars) AS total, MAX(chars) AS mx FROM by_src)
      SELECT source, CAST(chars AS BIGINT) AS chars,
        CAST(chars AS DOUBLE) / CAST(total AS DOUBLE) AS p_uniform,
        sqrt(CAST(chars AS DOUBLE)) / sqrt(CAST(mx AS DOUBLE)) AS w_temp,
        (sqrt(CAST(chars AS DOUBLE)) / sqrt(CAST(mx AS DOUBLE))) /
          (CAST(chars AS DOUBLE) / CAST(total AS DOUBLE)) AS oversample
      FROM by_src CROSS JOIN tot ORDER BY source"""))
}
