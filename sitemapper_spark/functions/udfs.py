"""Arrow-batched pandas UDFs wrapping the pure-function core.

Per BASELINE.json.input_hint the engine uses vectorized pandas/Arrow
UDFs only — no row-at-a-time Python UDFs. Each UDF here receives whole
Arrow batches as ``pd.Series``; the per-element Python work
(canonicalization / HTML parse) is inherently string-shaped, so the
batch loop lives inside the UDF where it amortizes serialization.
Everything else in the engine stays on JVM-side built-ins.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..html_extract import extract_links
from ..urlnorm import clean_links, host_of


@F.pandas_udf(T.ArrayType(T.StringType()))
def clean_links_udf(
    links: pd.Series, root: pd.Series, parent: pd.Series
) -> pd.Series:
    """Vectorized ``cleanLinks`` (`crawler.go:204-257`).

    ``parent`` must be the post-redirect final URL of the fetched page
    (`crawler.go:176,193`).
    """
    out = []
    for ls, r, p in zip(links, root, parent):
        if ls is None or r is None or p is None:
            out.append([])
        else:
            out.append(clean_links(list(ls), r, p))
    return pd.Series(out)


@F.pandas_udf(T.ArrayType(T.StringType()))
def extract_links_udf(html: pd.Series) -> pd.Series:
    """Vectorized ``extractLinks`` (`crawler.go:280-313`): ordered,
    deduped anchor hrefs; empty body → []."""
    return html.map(lambda c: extract_links(c) if c else [])


@F.pandas_udf(T.StringType())
def host_udf(url: pd.Series) -> pd.Series:
    """Host (with port, no userinfo) per URL, '' when unparseable."""
    return url.map(lambda u: host_of(u) if u is not None else "")
