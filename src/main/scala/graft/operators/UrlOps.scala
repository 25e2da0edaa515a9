package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** URL canonicalization for crawl dedup — the normalization step web
  * corpora (C4, RefinedWeb, Dolma) apply before URL-keyed dedup so the
  * same page fetched as `HTTPS://Host/p/?utm_source=x#top` and
  * `https://host/p` collapses to one key.
  *
  * Rules (the standard, order-sensitive set):
  *   1. lowercase the scheme and host (path/query stay case-sensitive),
  *   2. drop the `#fragment`,
  *   3. strip tracking parameters (`utm_*`, `ref`, `fbclid`),
  *   4. re-anchor the query: if stripping removed the leading `?`, the
  *      first surviving `&` becomes `?`,
  *   5. drop a dangling `?` and trailing slashes on the path.
  *
  * Every step is a codegen'd `regexp_replace`/`regexp_extract` chain —
  * pure per-row compute, no UDF, nothing leaves whole-stage codegen —
  * so canonicalization costs one narrow pass at any corpus size. The
  * patterns avoid lookaround so they behave identically under Java
  * regex (Spark) and RE2 (DuckDB); two dialect points differ and the
  * oracle spells both natively: the replacement-reference syntax
  * (`$1` vs `\1`), and GLOBAL replacement — Spark's `regexp_replace`
  * always replaces every match, DuckDB's only the first unless the
  * `'g'` option is passed, so every oracle step carries `'g'` (it
  * matters for the multi-match steps like trailing-slash removal and
  * is a no-op for the anchored single-match ones).
  */
object UrlOps {

  /** Canonical form of `url` per the rules above. */
  def canonicalize(url: Column): Column = {
    // 1. lowercase scheme://host (host ends at the first of / ? #)
    val head = lower(regexp_extract(url, "^[A-Za-z]+://[^/?#]*", 0))
    val tail = regexp_replace(url, "^[A-Za-z]+://[^/?#]*", "")
    val u1 = concat(head, tail)
    // 2. drop fragment
    val u2 = regexp_replace(u1, "#.*$", "")
    // 3. strip tracking params together with their ? or & prefix
    val u3 = regexp_replace(u2, "[?&](utm_[a-z]+|ref|fbclid)=[^&]*", "")
    // 4. if the ? was stripped, promote the first & (only fires when an
    //    & appears before any ?)
    val u4 = regexp_replace(u3, "^([^?&]*)&", "$1?")
    // 5. dangling '?' and trailing slashes (also directly before the ?)
    val u5 = regexp_replace(u4, "/+(\\?|$)", "$1")
    regexp_replace(u5, "\\?$", "")
  }
}
