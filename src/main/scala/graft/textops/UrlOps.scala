package graft.textops

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** URL canonicalization for Common-Crawl-style web tables (the input schema
  * is keyed by `url:string`). Canonical-URL equality is the standard FIRST
  * dedup pass in a web pipeline — far cheaper than any text comparison, it
  * collapses recrawls of the same resource whose URLs differ only in case,
  * default ports, tracking parameters, parameter order, or fragments —
  * and the SURT form (reversed host labels) is the standard sort/partition
  * key that co-locates a domain's pages in range partitioning.
  *
  * Everything here is pure Catalyst column expressions — regexp extraction
  * plus two codegen kernels ([[graft.functions.TextKernels.canonQuery]] for
  * the parameter filter/sort/join and
  * [[graft.functions.TextKernels.reverseLabels]] for the SURT host
  * reversal; the HOF lambda forms of those steps are CodegenFallback and
  * would knock the projection out of whole-stage codegen). At 100 TB this
  * is one codegen'd projection over the scan, no shuffle (PlanSpec-asserted).
  *
  * Scope (documented, deterministic): scheme://[userinfo@]host[:port]
  * [path][?query][#fragment]. IPv6 bracket hosts and scheme-relative URLs
  * are out of scope — any value without a `scheme://` prefix passes through
  * unchanged (nulls stay null), so the operator is total over dirty crawl
  * data.
  */
object UrlOps {

  /** Query parameters dropped during canonicalization — single source of
    * truth lives beside the kernel that applies it.
    */
  val trackingParamRegex: String =
    graft.functions.TextKernels.trackingParamRegex

  private def hasScheme(url: Column): Column = url.rlike("^[^:/?#]+://")

  /** Lowercased host with userinfo, trailing dots, and port stripped. */
  def host(url: Column): Column = {
    val authority = regexp_extract(url, "^[^:/?#]+://([^/?#]*)", 1)
    val noUser = substring_index(authority, "@", -1)
    // \.+$ not \.$: stripping only ONE trailing dot would make the
    // canonical form of "host.." non-idempotent (and key "host." and
    // "host.." differently)
    regexp_replace(lower(substring_index(noUser, ":", 1)), "\\.+$", "")
  }

  /** Canonical form:
    *  - scheme and host lowercased; userinfo and trailing host dot dropped
    *  - default ports dropped (http:80, https:443); explicit others kept
    *  - empty path becomes "/"
    *  - query parameters: tracking params dropped, the rest SORTED (byte
    *    order) so parameter permutations collapse; empty query dropped
    *  - fragment dropped (never sent to the server)
    */
  def canonicalUrl(url: Column): Column = {
    val scheme = lower(regexp_extract(url, "^([^:/?#]+)://", 1))
    val authority = regexp_extract(url, "^[^:/?#]+://([^/?#]*)", 1)
    val noUser = substring_index(authority, "@", -1)
    val h = regexp_replace(lower(substring_index(noUser, ":", 1)), "\\.+$", "")
    val port = regexp_extract(noUser, ":([0-9]+)$", 1)
    val keepPort = (port =!= "") &&
      !((scheme === "http" && port === "80") ||
        (scheme === "https" && port === "443"))
    val path0 = regexp_extract(url, "^[^:/?#]+://[^/?#]*([^?#]*)", 1)
    val path = when(path0 === "", lit("/")).otherwise(path0)
    // the query starts at the FIRST '?' (RFC 3986): the prefix excludes '?'
    // — a greedy "^[^#]*\?" would backtrack to the LAST '?', silently
    // deleting anything between two '?'s (common in redirect/return-url
    // parameter values)
    val query = regexp_extract(url, "^[^#?]*\\?([^#]*)", 1)
    val canonQ = graft.functions.GraftFunctions.canonQuery(query)
    val built = concat(
      scheme, lit("://"), h,
      when(keepPort, concat(lit(":"), port)).otherwise(lit("")),
      path,
      when(canonQ === "", lit("")).otherwise(concat(lit("?"), canonQ)))
    when(hasScheme(url), built).otherwise(url)
  }

  /** SURT-style sort key: host labels reversed and comma-joined, then `)`
    * and the canonical path+query. Range-partitioning or sorting by this key
    * clusters a domain's pages (and its subdomains, prefix-adjacent) into
    * the same partitions — the standard layout for per-site processing at
    * crawl scale. `surt("http://www.example.com/a")` = `com,example,www)/a`.
    */
  def surtKey(url: Column): Column = {
    val canon = canonicalUrl(url)
    val rev = graft.functions.GraftFunctions.reverseLabels(host(canon))
    val tail = regexp_extract(canon, "^[^:/?#]+://[^/?#]*(.*)$", 1)
    when(hasScheme(url), concat(rev, lit(")"), tail)).otherwise(url)
  }
}
