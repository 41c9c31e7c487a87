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
from packs_ray.stages.util import table_from_pandas as _table_from_pandas

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
        res = _table_from_pandas(out, preserve_index=False)
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


def path_rollup(ds, url_col: str, *, max_depth: int = 3,
                num_partitions: int | None = None):
    """Path-prefix hierarchy rollup over canonicalized URLs: for each
    depth d <= max_depth, count URLs under every /seg1/../segd prefix
    — the crawl-structure census that sits between
    :func:`domain_counts` (host level) and full-URL dedup (leaf
    level): which sections of a site dominate the corpus, where to
    aim crawl budget or block rules.

    Prefixes come from the canonical URL (tracking params dropped,
    trailing slash stripped) with the query part removed; a URL
    shallower than d contributes no depth-d row.  Pure string
    vectorization + ONE bucketed count reduce on (depth, prefix);
    output is bounded by the distinct-prefix domain.

    Returns a lazy Dataset (depth, prefix, n_urls)."""
    from packs_ray.functions.agg import keyed_count

    canon = canonicalize_urls(ds.select_columns([url_col]), url_col)

    def prefixes(batch: pa.Table) -> pa.Table:
        u = batch.column("url_canon").to_pandas().fillna("").astype(str)
        path = (u.str.split("?", n=1).str[0]
                .str.split("://", n=1).str[-1]
                .str.replace(r"^[^/]*", "", regex=True))
        out_d, out_p = [], []
        for d in range(1, max_depth + 1):
            pre = path.str.extract(r"^((?:/[^/]+){%d})" % d)[0].dropna()
            out_d.append(np.full(len(pre), d, dtype=np.int64))
            out_p.append(pre.to_numpy())
        if not out_d:
            return pa.table({"depth": pa.array([], type=pa.int64()),
                             "prefix": pa.array([], type=pa.string())})
        return pa.table({
            "depth": pa.array(np.concatenate(out_d), type=pa.int64()),
            "prefix": pa.array(np.concatenate(out_p), type=pa.string())})

    return keyed_count(canon.map_batches(prefixes, batch_format="pyarrow"),
                       ["depth", "prefix"], count_col="n_urls",
                       num_partitions=num_partitions)
