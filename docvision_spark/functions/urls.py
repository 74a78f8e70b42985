"""URL canonicalization + host utilities — expression-only (JVM-side).

A web-scale crawl dedups at three levels: exact content (t05), near-dup
content (d01/d02), and URL identity — the same resource crawled as
`HTTP://Example.COM:80/a/../b/?utm_source=x#frag` and
`http://example.com/b/` must collapse BEFORE fetch/extract cost is paid.
Canonicalization rules (conservative subset of RFC 3986 normalization +
standard tracking-param strip):

  1. scheme + host lowercased
  2. default ports stripped (:80 http, :443 https)
  3. fragment stripped
  4. tracking query params dropped (utm_*, fbclid, gclid, ref); a query
     left empty by the strip loses its '?'
  5. duplicate slashes in the path collapsed; trailing slash dropped
     (except root)

Every rule is a regexp_replace chain with identical Java-regex/RE2
semantics, so the DuckDB oracle runs the same expressions.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

def canonical_url(col: Column) -> Column:
    """Apply the canonicalization chain. Pure expressions, no UDF."""
    u = F.trim(col)
    # fragment off first (everything after is case-preserved user data)
    u = F.regexp_replace(u, r"#.*$", "")
    # lowercase scheme+host only: split at the first '/', '?' or end
    head = F.regexp_extract(u, r"^([a-zA-Z][a-zA-Z0-9+.-]*://[^/?]*)", 1)
    tail = F.substring(u, F.length(head) + 1, F.lit(1 << 30))
    u = F.concat(F.lower(head), tail)
    # default ports
    u = F.regexp_replace(u, r"^(http://[^/?:]+):80(/|\?|$)", r"$1$2")
    u = F.regexp_replace(u, r"^(https://[^/?:]+):443(/|\?|$)", r"$1$2")
    # tracking params (leading '?p=v&' / '&p=v' / lone '?p=v')
    u = F.regexp_replace(u, r"([?&])(utm_[a-z]+|fbclid|gclid|ref)=[^&#]*&", r"$1")
    u = F.regexp_replace(u, r"[?&](utm_[a-z]+|fbclid|gclid|ref)=[^&#]*$", "")
    # repeat once for adjacent tracked params left by the first pass
    u = F.regexp_replace(u, r"([?&])(utm_[a-z]+|fbclid|gclid|ref)=[^&#]*&", r"$1")
    u = F.regexp_replace(u, r"[?&](utm_[a-z]+|fbclid|gclid|ref)=[^&#]*$", "")
    # dangling '?'
    u = F.regexp_replace(u, r"\?$", "")
    # duplicate path slashes (not the scheme's //)
    u = F.regexp_replace(u, r"(?<!:)//+", "/")
    # trailing slash (keep root '/')
    u = F.regexp_replace(u, r"(://[^/?]+/[^?]*?)/(\?|$)", r"$1$2")
    return u


# DuckDB twins of the same chain: (pattern, replacement, flags). Java's $1
# backrefs become RE2's \1; the lookbehind in the slash rule is expressed
# differently (RE2 has no lookbehind).
def canonical_url_sql(col: str) -> str:
    e = f"trim({col})"
    e = f"regexp_replace({e}, '#.*$', '')"
    head = f"regexp_extract({e}, '^([a-zA-Z][a-zA-Z0-9+.-]*://[^/?]*)', 1)"
    e = f"(lower({head}) || substring({e}, length({head}) + 1))"
    e = f"regexp_replace({e}, '^(http://[^/?:]+):80(/|\\?|$)', '\\1\\2')"
    e = f"regexp_replace({e}, '^(https://[^/?:]+):443(/|\\?|$)', '\\1\\2')"
    for _ in range(2):
        e = f"regexp_replace({e}, '([?&])(utm_[a-z]+|fbclid|gclid|ref)=[^&#]*&', '\\1')"
        e = f"regexp_replace({e}, '[?&](utm_[a-z]+|fbclid|gclid|ref)=[^&#]*$', '')"
    e = f"regexp_replace({e}, '\\?$', '')"
    # RE2 lookbehind workaround: protect '://' then collapse then restore
    e = f"regexp_replace({e}, '://', chr(1))"
    e = f"regexp_replace({e}, '//+', '/', 'g')"
    e = f"regexp_replace({e}, chr(1), '://')"
    e = f"regexp_replace({e}, '(://[^/?]+/[^?]*?)/(\\?|$)', '\\1\\2')"
    return e


def with_canonical_url(df: DataFrame, url_col: str = "url") -> DataFrame:
    return df.withColumn("canonical_url", canonical_url(F.col(url_col)))


def url_dedup(df: DataFrame, url_col: str = "url") -> DataFrame:
    """Keep one row per canonical url (lowest original url wins —
    deterministic, monotone policy; same shape as exact_dedup)."""
    c = with_canonical_url(df, url_col)
    keep = c.groupBy("canonical_url").agg(F.min(url_col).alias(url_col))
    return c.join(keep, ["canonical_url", url_col])
