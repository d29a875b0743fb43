package graft.operators

import org.apache.spark.sql.functions._
import graft.{QueryDef, Tables}

/** Market-basket co-occurrence analytics — the association-rule family
  * (Agrawal & Srikant's Apriori measures over pair itemsets): which
  * parts are bought together more often than independence predicts.
  * This is the recommender/affinity workload OLAP engines ship beside
  * plain rollups, and at training-data scale the same shape surfaces as
  * tag/domain co-occurrence mining over document metadata.
  *
  * Scale stance: the pair generation is a self-equi-join on the order
  * key with an `a < b` orientation — per-order fan-out is C(items, 2)
  * bounded by the per-order item count (≤17 in this corpus, O(basket²)
  * in general, the standard market-basket bound; a corpus with
  * pathological mega-baskets caps them upstream). Everything after is
  * hash aggregation: pair counts, per-item order counts, one global
  * 1-row total. Lift = (n_ab·N)/(n_a·n_b) is computed as ONE IEEE
  * division of exact BIGINT products — bit-identical cross-engine —
  * and the final top-20 plans as TakeOrderedAndProject, so nothing
  * after the pair agg scales with the corpus.
  */
object Basket {

  def all: Seq[QueryDef] = Seq(copurchaseLift)

  /** Top co-purchased part pairs by lift, min pair support 3. */
  val copurchaseLift = QueryDef("basket_copurchase",
    (s, d) => {
      val items = Tables.lineitem(s, d)
        .select(col("l_orderkey").as("k"), col("l_partkey").as("p"))
        .distinct()
      val pairCnt = items.select(col("k"), col("p").as("a"))
        .join(items.select(col("k"), col("p").as("b")), "k")
        .where(col("a") < col("b"))
        .groupBy(col("a"), col("b")).agg(count(lit(1)).as("n_ab"))
        .where(col("n_ab") >= 3)
      val itemCnt = items.groupBy(col("p")).agg(count(lit(1)).as("n_p"))
      val total = items.select(col("k")).distinct()
        .agg(count(lit(1)).as("n_orders"))
      pairCnt
        .join(itemCnt.select(col("p").as("a"), col("n_p").as("n_a")), "a")
        .join(itemCnt.select(col("p").as("b"), col("n_p").as("n_b")), "b")
        .crossJoin(broadcast(total))
        .withColumn("lift",
          (col("n_ab") * col("n_orders")).cast("double") /
            (col("n_a") * col("n_b")).cast("double"))
        .select(col("a"), col("b"), col("n_ab"), col("n_a"), col("n_b"),
          col("lift"))
        .orderBy(col("lift").desc, col("a"), col("b"))
        .limit(20)
    },
    Some("""WITH i AS (SELECT DISTINCT l_orderkey AS k, l_partkey AS p
          FROM lineitem),
      pc AS (SELECT x.p AS a, y.p AS b, COUNT(*) AS n_ab
        FROM i x JOIN i y ON x.k = y.k AND x.p < y.p
        GROUP BY 1, 2 HAVING COUNT(*) >= 3),
      ic AS (SELECT p, COUNT(*) AS n_p FROM i GROUP BY 1),
      tot AS (SELECT COUNT(DISTINCT k) AS n_orders FROM i)
      SELECT pc.a, pc.b, pc.n_ab, ia.n_p AS n_a, ib.n_p AS n_b,
        CAST(pc.n_ab * tot.n_orders AS DOUBLE) /
          CAST(ia.n_p * ib.n_p AS DOUBLE) AS lift
      FROM pc JOIN ic ia ON ia.p = pc.a JOIN ic ib ON ib.p = pc.b
        CROSS JOIN tot
      ORDER BY lift DESC, a, b LIMIT 20"""))
}
