package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** The crawl loop's CONSUMER: the composed "what do we fetch next" query
  * the individual crawl operators feed. [[Url.discoveredFromLinks]] surfaces
  * candidate URLs, [[Robots.decide]] gates politeness, [[LinkGraph.domainRank]]
  * supplies the quality signal, and per-domain capping enforces fetch-rate
  * fairness — this object joins them into one ordered fetch queue, the
  * crawl-side analogue of the reference's claim-next work query (the
  * orchestrator's `SELECT ... FROM work_queue FINAL WHERE status='pending'
  * ORDER BY id LIMIT 1`, `/root/reference/src/core/orchestrator.js:126-150`:
  * filter eligibility, order by priority, take the head — here the
  * eligibility filter is robots, the priority is link-graph rank, and the
  * head is a per-domain-capped top-K).
  */
object Crawl {

  /** Ordered fetch queue over a discovered frontier: frontier rows minus
    * robots-denied URLs, ranked by their registrable domain's
    * [[LinkGraph.domainRank]] score, capped at `cap` URLs per domain
    * (politeness: one batch must not concentrate on one site no matter how
    * highly it ranks). Output = the frontier columns plus `domain`,
    * `domain_rank_fp` (0 for domains absent from the rank table — e.g.
    * brand-new domains nothing ranked yet), and `queue_pos` (1-based
    * position within the domain: most-referenced first, key-ascending on
    * ties — in-degree is the within-domain priority the rank table cannot
    * see). `k > 0` additionally takes the global head of the queue ordered
    * by (domain_rank_fp desc, domain, queue_pos) — a TakeOrderedAndProject,
    * never a full sort.
    *
    * Scale shape: the robots side folds to one tiny per-host rule array and
    * broadcasts ([[Robots.decide]]); the rank table is one row per domain
    * and broadcasts under AQE; so the frontier pays exactly ONE exchange —
    * the hash partition on `domain` that the cap window needs (PlanSpec
    * pins this). `frontier` is [[Url.discoveredFromLinks]] output (or any
    * frame with `link_key`/`link`/`n_refs`); `domainRank` is (node,
    * rank_fp); `domainOf` must be the SAME policy hook the rank table was
    * built with, or domains miss their own scores. */
  def frontierOrder(frontier: DataFrame,
                    robots: DataFrame, hostCol: String, robotsCol: String,
                    domainRank: DataFrame, cap: Int, k: Int = -1,
                    domainOf: Column => Column = Url.registrableDomain): DataFrame = {
    require(cap >= 1, s"cap must be >= 1, got $cap")
    val allowed = Robots.decide(frontier, "link", robots, hostCol, robotsCol)
      .filter(col("allowed")).drop("allowed")
    val rank = broadcast(domainRank.select(col("node").as("domain"),
      col("rank_fp").as("domain_rank_fp")))
    val w = Window.partitionBy("domain")
      .orderBy(col("n_refs").desc, col("link_key"))
    val q = allowed
      .withColumn("domain", domainOf(Url.hostOf(col("link_key"))))
      .join(rank, Seq("domain"), "left")
      .withColumn("domain_rank_fp", coalesce(col("domain_rank_fp"), lit(0L)))
      .withColumn("queue_pos", row_number().over(w))
      .filter(col("queue_pos") <= cap)
    if (k > 0)
      q.orderBy(col("domain_rank_fp").desc, col("domain"), col("queue_pos"))
        .limit(k)
    else q
  }
}
