"""URL canonicalization + host extraction — pure Column expressions.

The reference canonicalizes URLs in scattered string ops:
- strip ``?search`` query strings (lib/request.js:260-262)
- strip RFC-6570 templates ``{/member}`` (providers/fetcher/githubFetcher.js:111-122)
- lowercase org/login comparisons (lib/crawler.js:583-585)

We define ONE deterministic canonical form used as the dedup/locking identity
(the reference keys locks and tracker tags on the exact URL string,
lib/crawler.js:170, providers/queuing/redisRequestTracker.js:113-117):

  1. trim whitespace
  2. drop fragment (``#...``)
  3. drop query string (``?...``)
  4. drop ``{template}`` segments
  5. lowercase scheme and host; strip default ports ``:80``/``:443``
  6. collapse duplicate ``/`` in the path; strip the trailing ``/``

Implemented twice from one spec: as Spark Columns (whole-stage codegen, no
UDF) and as a DuckDB SQL fragment (oracle parity). Both are tested equal in
tests/test_urls.py.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

_SCHEME_RE = "^([A-Za-z][A-Za-z0-9+.-]*)://"
_HOST_RE = "^[A-Za-z][A-Za-z0-9+.-]*://([^/]+)"
_PATH_RE = "^[A-Za-z][A-Za-z0-9+.-]*://[^/]*(/.*)$"


def _stripped(url: Column) -> Column:
    s = F.trim(url)
    s = F.regexp_replace(s, "#.*$", "")
    s = F.regexp_replace(s, r"\?.*$", "")
    s = F.regexp_replace(s, r"\{[^}]*\}", "")
    return s


def canonicalize_url(url: Column | str) -> Column:
    c = F.col(url) if isinstance(url, str) else url
    s = _stripped(c)
    scheme = F.lower(F.regexp_extract(s, _SCHEME_RE, 1))
    host = F.lower(F.regexp_extract(s, _HOST_RE, 1))
    host = F.regexp_replace(host, ":(80|443)$", "")
    path = F.regexp_extract(s, _PATH_RE, 1)
    path = F.regexp_replace(path, "/{2,}", "/")
    path = F.regexp_replace(path, "/$", "")
    # No scheme → not a URL we can canonicalize; pass the trimmed form through.
    return F.when(scheme == "", F.trim(c)).otherwise(
        F.concat(scheme, F.lit("://"), host, path)
    )


def extract_host(url: Column | str) -> Column:
    """Lowercased host (politeness / partition key), default port stripped."""
    c = F.col(url) if isinstance(url, str) else url
    host = F.lower(F.regexp_extract(_stripped(c), _HOST_RE, 1))
    return F.regexp_replace(host, ":(80|443)$", "")


# --- DuckDB oracle fragments (same spec, SQL text) -------------------------

def _stripped_sql(expr: str) -> str:
    s = f"trim({expr})"
    s = f"regexp_replace({s}, '#.*$', '')"
    s = f"regexp_replace({s}, '\\?.*$', '')"
    s = f"regexp_replace({s}, '\\{{[^}}]*\\}}', '', 'g')"
    return s


def canonicalize_url_sql(expr: str) -> str:
    s = _stripped_sql(expr)
    scheme = f"lower(regexp_extract({s}, '{_SCHEME_RE}', 1))"
    host = f"regexp_replace(lower(regexp_extract({s}, '{_HOST_RE}', 1)), ':(80|443)$', '')"
    path = (
        f"regexp_replace(regexp_replace("
        f"regexp_extract({s}, '{_PATH_RE}', 1), '/{{2,}}', '/', 'g'), '/$', '')"
    )
    return (
        f"CASE WHEN {scheme} = '' THEN trim({expr}) "
        f"ELSE {scheme} || '://' || {host} || {path} END"
    )


def extract_host_sql(expr: str) -> str:
    s = _stripped_sql(expr)
    return (
        f"regexp_replace(lower(regexp_extract({s}, '{_HOST_RE}', 1)), ':(80|443)$', '')"
    )
