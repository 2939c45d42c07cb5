"""URL canonicalization, hashing and host extraction.

The reference builds URLs with string concat + query escaping
(``/root/reference/src/client/main.go:96-107``) and never canonicalizes —
two spellings of one URL are two frontier messages. Our engine
canonicalizes at enqueue time (lowercase scheme/host, strip default port,
drop fragments and tracking params, collapse empty path to "/"), which is
a prerequisite for a meaningful URL-seen set at 10^10 scale.

One implementation, two call paths:
- ``canonicalize_series`` operates on a pandas Series with vectorized
  ``.str`` ops — this is what runs inside Arrow-batched UDFs on executors.
- the reference simulator (sim.py) calls the same function on 1-element
  series, so engine and oracle can never diverge.

Hashing: ``F.xxhash64`` (JVM-side, 64-bit) is the seen-set/partitioning
hash (SURVEY.md C1/C2 mapping — the reference's SHA-1/SHA-256 ring keys
collapse to this).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F

_TRACKING_PARAMS = ("utm_source", "utm_medium", "utm_campaign", "ref", "tag")


def canonicalize_series(urls: pd.Series) -> pd.Series:
    """Vectorized URL canonicalization over a pandas Series of strings."""
    s = urls.fillna("").str.strip()
    # split off fragment
    s = s.str.replace(r"#.*$", "", regex=True)
    # lowercase scheme and host (authority part only)
    parts = s.str.extract(r"^(?P<scheme>[A-Za-z][A-Za-z0-9+.-]*://)?(?P<rest>.*)$")
    scheme = parts["scheme"].fillna("http://").str.lower()
    rest = parts["rest"].fillna("")
    hostpath = rest.str.extract(r"^(?P<auth>[^/?]*)(?P<path>.*)$")
    auth = hostpath["auth"].str.lower()
    # strip default ports
    auth = auth.str.replace(r":80$", "", regex=True)
    auth = auth.str.replace(r":443$", "", regex=True)
    path = hostpath["path"].fillna("")
    # drop tracking params; keep others in original order
    q = path.str.extract(r"^(?P<p>[^?]*)(?:\?(?P<q>.*))?$")
    base = q["p"].replace("", "/")
    query = q["q"]

    def _filter_query(qs: object) -> str:
        if not isinstance(qs, str) or qs == "":
            return ""
        kept = [
            kv
            for kv in qs.split("&")
            if kv and kv.split("=", 1)[0].lower() not in _TRACKING_PARAMS
        ]
        return ("?" + "&".join(kept)) if kept else ""

    query = query.map(_filter_query)
    return scheme + auth + base + query


def resolve_series(parents: pd.Series, raws: pd.Series) -> pd.Series:
    """Resolve possibly-relative link spellings against their parent page
    URL (RFC 3986 join), then canonicalize. Used by the engine's HTTP
    mode, where extracted hrefs are relative ("/item/3") — the synthetic
    web emits absolute links so the batch path never pays this. urljoin
    has no vectorized form; the per-row map runs inside Arrow-batched
    UDFs only, never on the driver."""
    from urllib.parse import urljoin

    joined = pd.Series(
        [urljoin(p if isinstance(p, str) else "", r if isinstance(r, str) else "")
         for p, r in zip(parents, raws)],
        index=raws.index,
    )
    return canonicalize_series(joined)


def canonicalize_url(url: str) -> str:
    """Single-URL convenience wrapper (simulator / tests)."""
    return canonicalize_series(pd.Series([url])).iloc[0]


def host_of_series(urls: pd.Series) -> pd.Series:
    """Host extraction for canonical URLs (pandas path)."""
    return urls.str.extract(r"^[a-z][a-z0-9+.-]*://([^/:?]*)", expand=False).fillna("")


def host_col(url: Column) -> Column:
    """Host extraction as a JVM-side column expression (C8 mapping)."""
    return F.parse_url(url, F.lit("HOST"))


def url_hash_col(url: Column) -> Column:
    """64-bit URL hash for seen-set membership and hash partitioning."""
    return F.xxhash64(url)
