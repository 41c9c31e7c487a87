"""URL canonicalization / domain extraction for web-corpus pipelines.

The reference has no URL handling (its pattern bank only *validates*
url-shaped strings, pattern_validation_pack/main.py:19-35); a web-scale
training-data pipeline needs the normalization side: dedup-by-URL and
per-domain mixing/blocking both require a canonical form.  Rules follow
the common crawl-dedup conventions: lowercase scheme/host, strip a
leading ``www.``, strip the scheme's default port, strip the URL
fragment, drop tracking query params (``utm_*``/``gclid``/``fbclid``),
sort the remaining params, and strip a trailing slash from the path.

Everything is a stateless ``map_batches`` stage over pandas string
kernels (split/explode/groupby-join — no per-row Python loop); the
per-domain roll-up reuses the bucketed ``keyed_count`` reduce, and the
blocklist filter broadcasts the (small) blocked set inside the batch fn.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

_TRACKING_RE = r"^(?:utm_[^=]*|gclid|fbclid)="


def _canon_frame(s: pd.Series) -> pd.DataFrame:
    """Vectorized canonicalization of a string Series of URLs ->
    DataFrame(url_canon, host, domain).  Null/empty input -> empty
    strings (kept, so row counts are stable)."""
    s = s.fillna("").astype(str)
    nofrag = s.str.split("#", n=1).str[0]
    bq = nofrag.str.split("?", n=1)
    base, query = bq.str[0], bq.str[1]

    sr = base.str.split("://", n=1)
    has_scheme = sr.str.len() == 2
    scheme = pd.Series(np.where(has_scheme, sr.str[0].str.lower(), "http"),
                       index=s.index)
    rest = pd.Series(np.where(has_scheme, sr.str[-1], base), index=s.index)

    hp = rest.str.split("/", n=1)
    host = hp.str[0].str.lower().str.replace(r"^www\.", "", regex=True)
    strip80 = (scheme == "http") & host.str.endswith(":80")
    strip443 = (scheme == "https") & host.str.endswith(":443")
    host = pd.Series(np.where(strip80, host.str[:-3],
                              np.where(strip443, host.str[:-4], host)),
                     index=s.index)

    path = "/" + hp.str[1].fillna("")
    path = path.str.replace(r"/+$", "", regex=True)

    # query params: explode -> drop tracking keys -> sort within row ->
    # re-join.  Lexicographic sort on the raw "k=v" strings matches
    # DuckDB's list_sort default collation on ASCII.
    ex = query.fillna("").str.split("&").explode()
    ex = ex[(ex != "") & ~ex.str.match(_TRACKING_RE)]
    if len(ex):
        ex = ex.reset_index(name="p").sort_values(["index", "p"],
                                                  kind="stable")
        joined = ex.groupby("index", sort=False)["p"].agg("&".join)
    else:
        joined = pd.Series(dtype="object")
    qcanon = pd.Series("", index=s.index, dtype="object")
    qcanon.loc[joined.index] = "?" + joined

    url = scheme + "://" + host + path + qcanon
    url[s == ""] = ""

    # host/domain columns never carry a port (a non-default port stays
    # in url_canon only)
    host = host.str.replace(r":\d+$", "", regex=True)
    labels = host.str.rsplit(".", n=2)
    domain = pd.Series(
        [".".join(ls[-2:]) if isinstance(ls, list) else ""
         for ls in labels], index=s.index)
    return pd.DataFrame({"url_canon": url, "host": host, "domain": domain})


def canonicalize_urls(ds, url_col: str, keep_cols: list[str] | None = None):
    """Lazy Dataset: keep_cols + (url_canon, host, domain)."""
    keep_cols = keep_cols or []

    def fn(batch: pa.Table) -> pa.Table:
        out = _canon_frame(batch.column(url_col).to_pandas())
        t = batch.select(keep_cols) if keep_cols else None
        res = pa.Table.from_pandas(out, preserve_index=False)
        for i, c in enumerate(keep_cols):
            res = res.add_column(i, c, t.column(c))
        return res

    return ds.map_batches(fn, batch_format="pyarrow")


def domain_counts(ds, url_col: str, num_partitions: int | None = None):
    """(domain, n_docs) via the bucketed partial-count reduce — the
    per-domain histogram that drives mixing weights and block decisions."""
    from packs_ray.functions.agg import keyed_count

    canon = canonicalize_urls(ds.select_columns([url_col]), url_col)
    return keyed_count(canon.select_columns(["domain"]), ["domain"],
                       count_col="n_docs", num_partitions=num_partitions)


def filter_blocked_domains(ds, url_col: str, blocked: set[str],
                           keep_cols: list[str] | None = None):
    """Drop rows whose registered domain is in ``blocked`` (broadcast
    small side — the set ships once per task via closure capture, never
    per batch)."""
    blocked = frozenset(blocked)

    def fn(batch: pa.Table) -> pa.Table:
        dom = _canon_frame(batch.column(url_col).to_pandas())["domain"]
        mask = ~dom.isin(blocked)
        return batch.filter(pa.array(mask.to_numpy()))

    out = ds.map_batches(fn, batch_format="pyarrow")
    return out.select_columns(keep_cols) if keep_cols else out
