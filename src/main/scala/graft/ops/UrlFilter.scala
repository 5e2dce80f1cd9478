package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Domain-blocklist screening (the C4/RefinedWeb URL filter): a host is
  * blocked when the host itself or ANY dot-boundary parent domain is on
  * the blocklist — `spam.com` blocks `cdn.spam.com` and `a.b.spam.com`.
  *
  * Scale shape: the suffix hierarchy is exploded on the DISTINCT host
  * table only (label depth ≤ ~4 — bounded fan-out over unique domains,
  * never the corpus), matched with a broadcast join against the
  * blocklist, and the resulting blocked-host set (≤ blocklist coverage)
  * broadcasts back onto the corpus scan. The corpus stays linear and no
  * shuffle ever carries document text.
  */
object UrlFilter {

  /** Distinct hosts from `hosts.hostCol` that the blocklist covers
    * (exact or parent-domain match). `blocklist` has one column of bare
    * registrable domains.
    */
  def blockedHosts(hosts: DataFrame, blocklist: DataFrame,
      hostCol: String = "host"): DataFrame = {
    val b = blocklist.toDF("b")
    hosts.select(col(hostCol)).distinct()
      .withColumn("parts", split(col(hostCol), "\\."))
      .select(col(hostCol), explode(expr(
        "transform(sequence(1, size(parts))," +
          " i -> array_join(slice(parts, i, size(parts) - i + 1), '.'))"))
        .as("suffix"))
      .join(broadcast(b), col("suffix") === col("b"))
      .select(col(hostCol)).distinct()
  }
}
