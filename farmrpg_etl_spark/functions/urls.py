"""URL canonicalization for web-corpus curation.

URL-level dedup of a crawl only works after canonicalization: the
same page is fetched as ``HTTP://WWW.Site.com:80/a/?utm_source=x``
and ``http://site.com/a``, and a byte-equality dedup treats those as
distinct. This module is the deterministic, engine-parallel (Spark ≡
ANSI-SQL) canonical form used by the ``url_canonicalize_docs``
oracle row; the rules are the common subset of the ones crawl
pipelines apply (scheme/host lowercasing, default-port and fragment
removal, tracking-parameter stripping, query-parameter sorting).

All pure column expressions — JVM-side, whole-stage codegen, no UDFs.

Documented non-goals (kept out so both engines agree byte-for-byte):
percent-decoding (see the §2.7 URL decode scalar for that), IDN/punycode,
path-segment ``..`` resolution.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Tracking parameters stripped during canonicalization (prefix match
# for the utm_ family, exact name match otherwise).
TRACKING_PARAM_RE = r"^(utm_[^=]*|ref|sessionid|fbclid|gclid|msclkid)="

_SCHEME_RE = r"^([A-Za-z][A-Za-z0-9+.-]*)://"
_HOSTPORT_RE = r"^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]+)"
_PATH_RE = r"^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*([^?#]*)"
_QUERY_RE = r"[?]([^#]*)"

_DEFAULT_PORTS = {"http": "80", "https": "443"}


def url_scheme(url: Column) -> Column:
    return F.lower(F.regexp_extract(url, _SCHEME_RE, 1))


def url_host(url: Column) -> Column:
    """Lowercased host with the scheme's default port and a leading
    ``www.`` stripped."""
    hostport = F.lower(F.regexp_extract(url, _HOSTPORT_RE, 1))
    scheme = url_scheme(url)
    host = hostport
    for sch, port in _DEFAULT_PORTS.items():
        host = F.when(
            (scheme == sch) & host.endswith(f":{port}"),
            F.substring(host, F.lit(1), F.length(host) - (len(port) + 1)),
        ).otherwise(host)
    return F.regexp_replace(host, r"^www\.", "")


def url_path(url: Column) -> Column:
    """Path with a trailing slash removed (roots normalize to ``/``);
    an empty path becomes ``/``."""
    p = F.regexp_extract(url, _PATH_RE, 1)
    p = F.when(p == "", F.lit("/")).otherwise(p)
    return F.when(
        (F.length(p) > 1) & p.endswith("/"),
        F.substring(p, F.lit(1), F.length(p) - 1),
    ).otherwise(p)


def url_query_canonical(url: Column) -> Column:
    """Query string with tracking parameters removed and the
    remaining ``k=v`` pairs sorted lexicographically; ``''`` when
    nothing survives. The fragment never participates."""
    q = F.regexp_extract(url, _QUERY_RE, 1)
    params = F.filter(
        F.split(q, "&"),
        lambda x: (F.length(x) > 0) & ~x.rlike(TRACKING_PARAM_RE),
    )
    return F.array_join(F.array_sort(params), "&")


def canonicalize_url(url: Column) -> Column:
    """The full canonical form. Returns NULL for strings with no
    ``scheme://`` prefix (the caller's quarantine channel decides
    what to do with those — this function never guesses)."""
    scheme = url_scheme(url)
    q = url_query_canonical(url)
    canon = F.concat(
        scheme,
        F.lit("://"),
        url_host(url),
        url_path(url),
        F.when(q == "", F.lit("")).otherwise(F.concat(F.lit("?"), q)),
    )
    return F.when(scheme == "", F.lit(None).cast("string")).otherwise(canon)
