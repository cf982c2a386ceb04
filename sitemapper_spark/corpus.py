"""Deterministic corpus synthesis — the crawlable web as a table.

A "fetch" in this engine is a join against the ``pages`` corpus instead
of an HTTP GET (`crawler.go:260-276` getHTML → corpus row; null join =
fetch error; ``status != 200`` = HTTP error; ``final_url`` = the
post-redirect URL the reference resolves relative links against).

Three generators, all seeded and wall-clock-free:

* :func:`testsite_corpus` — exact replica of the reference's golden test
  site (`/root/reference/sitemapper/testsite/*.html`, served by a file
  server that redirects ``/aubergine`` → ``/aubergine/``).
* :func:`synth_corpus` — parameterized multi-host graph with log-uniform
  (Zipf-ish) host sizes for skew/salting tests and the benchmark;
  generated distributively via ``mapInPandas`` over ``spark.range`` so
  it scales with the cluster, with a 10^10 logical URL-ID space.
* :func:`corpus_from_documents` — derives a page graph from the driver's
  ``documents`` parquet (no external data) for entry()/smoke use.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession

from .functions.images import (
    dhash64,
    encode_image,
    splitmix64,
    synth_pixels,
)
from .html_extract import extract_links
from .schemas import PAGES_SCHEMA
from .urlnorm import host_of

_TESTSITE_ROOT = "http://localhost:2015"

# Verbatim anchor lists of the reference test site pages
# (`/root/reference/sitemapper/testsite/`), keyed by request URL. The
# aubergine page is a directory: the file server 301s ``/aubergine`` →
# ``/aubergine/`` and the reference resolves links against the
# post-redirect URL — hence final_url differs there.
_TESTSITE_PAGES: list[tuple[str, str, list[str]]] = [
    # (url, final_url, raw hrefs in document order)
    (_TESTSITE_ROOT, _TESTSITE_ROOT,
     ["/aubergine", "biscuit/pomegranate.html", "tomato.html", "/"]),
    (f"{_TESTSITE_ROOT}/aubergine", f"{_TESTSITE_ROOT}/aubergine/",
     ["/kiwi.html", "cabbage/banana.html",
      f"{_TESTSITE_ROOT}/biscuit/pomegranate.html"]),
    (f"{_TESTSITE_ROOT}/tomato.html", f"{_TESTSITE_ROOT}/tomato.html",
     ["tomato.html", "/", "/aubergine/lemon.html"]),
    (f"{_TESTSITE_ROOT}/kiwi.html", f"{_TESTSITE_ROOT}/kiwi.html", []),
    (f"{_TESTSITE_ROOT}/biscuit/pomegranate.html",
     f"{_TESTSITE_ROOT}/biscuit/pomegranate.html",
     ["/aubergine/lemon.html"]),
    (f"{_TESTSITE_ROOT}/aubergine/cabbage/banana.html",
     f"{_TESTSITE_ROOT}/aubergine/cabbage/banana.html",
     ["/aubergine/lemon.html", "/kiwi.html"]),
    (f"{_TESTSITE_ROOT}/aubergine/lemon.html",
     f"{_TESTSITE_ROOT}/aubergine/lemon.html",
     ["cabbage/banana.html", f"{_TESTSITE_ROOT}/biscuit/pomegranate.html"]),
]


def _html_for(title: str, hrefs: list[str]) -> str:
    anchors = "\n".join(f'    <a href="{h}">{h}</a>' for h in hrefs)
    return (
        "<!DOCTYPE html>\n<html>\n  <head><title>%s</title></head>\n"
        "  <body>\n    <p>%s</p>\n%s\n  </body>\n</html>\n"
        % (title, title, anchors)
    )


def caption_for(url: str) -> str:
    """Deterministic caption from URL (equality-checked per row)."""
    return f"caption of {url} [{splitmix64(len(url)) & 0xffff:04x}]"


def _page_payload(image_id: str, w: int, h: int, fmt: str) -> tuple[bytes, int]:
    pixels = synth_pixels(image_id, w, h)
    return encode_image(pixels, fmt), dhash64(pixels)


def testsite_root() -> str:
    return _TESTSITE_ROOT


def testsite_corpus(spark: SparkSession, w: int = 24, h: int = 16) -> DataFrame:
    """The 7-page reference test site as a pages corpus DataFrame."""
    rows = []
    for i, (url, final_url, hrefs) in enumerate(_TESTSITE_PAGES):
        html = _html_for(url.rsplit("/", 1)[-1] or "index", hrefs)
        fmt = "png" if i % 2 == 0 else "qjpg"
        image_id = f"testsite-{i}"
        data, phash = _page_payload(image_id, w, h, fmt)
        rows.append(
            (url, host_of(url), 200, final_url, html, extract_links(html),
             image_id, data, w, h, fmt, caption_for(url), phash)
        )
    return spark.createDataFrame(rows, PAGES_SCHEMA)


def _host_boundaries(n_pages: int, n_hosts: int, seed: int) -> np.ndarray:
    """Cumulative page-count boundaries per host, Zipf(~1)-skewed.

    Host k gets weight 1/(k+1); host 0 ends up with a large share so
    skew/salting paths are genuinely exercised. Deterministic in
    (n_pages, n_hosts, seed).
    """
    ranks = np.arange(1, n_hosts + 1, dtype=np.float64)
    weights = 1.0 / ranks
    # deterministic shuffle of which host id is hot, so host names don't
    # encode their size
    order = np.argsort(
        [splitmix64(seed * 0x9E37 + k) for k in range(n_hosts)], kind="stable"
    )
    weights = weights[np.argsort(order, kind="stable")]
    counts = np.maximum(1, np.floor(weights / weights.sum() * n_pages)).astype(np.int64)
    # fix rounding so totals match exactly
    diff = n_pages - counts.sum()
    counts[np.argmax(counts)] += diff
    return np.concatenate([[0], np.cumsum(counts)])


def synth_corpus(
    spark: SparkSession,
    n_pages: int,
    n_hosts: int = 16,
    links_per_page: int = 6,
    cross_host_fraction: float = 0.2,
    error_fraction: float = 0.02,
    seed: int = 42,
    with_images: bool = True,
    img_w: int = 16,
    img_h: int = 12,
    num_partitions: int | None = None,
) -> DataFrame:
    """Distributed deterministic multi-host page-graph corpus.

    Page ids live in a 10^10 logical URL-ID space (ids are positions;
    URLs embed ``splitmix64``-derived 10-digit tokens). Each host's
    pages form one contiguous id range; links target the same host with
    probability ``1 - cross_host_fraction`` (cross-host links exercise
    the same-site drop path, `crawler.go:247-251`). A deterministic
    ``error_fraction`` of pages return HTTP 500 to exercise the
    fetch-error path (`crawler.go:267-269`).
    """
    bounds = _host_boundaries(n_pages, n_hosts, seed)
    bounds_bc = spark.sparkContext.broadcast(bounds)
    if num_partitions is None:
        num_partitions = spark.sparkContext.defaultParallelism

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        b = bounds_bc.value

        def url_of(pid: int, hidx: int) -> str:
            # token samples the 10^10 logical URL-ID space; the pid
            # suffix makes URLs injective (two pages of one host must
            # never collide into the same URL — duplicate corpus rows
            # would multiply the fetch left-join and double-count
            # lineage counts)
            token = splitmix64(seed ^ (pid * 0x2545F4914F6CDD1D)) % 10_000_000_000
            return f"http://host{hidx}.example.com/p/{token:010d}-{pid}.html"

        for pdf in batches:
            ids = pdf["id"].to_numpy()
            rows = []
            # yield in small chunks: with image payloads a whole Arrow
            # batch of rows would hold hundreds of MB in one pandas frame
            def flush():
                out = pd.DataFrame(
                    rows, columns=[f.name for f in PAGES_SCHEMA.fields]
                )
                rows.clear()
                return out

            for pid in ids:
                pid = int(pid)
                hidx = int(np.searchsorted(b, pid, side="right") - 1)
                lo, hi = int(b[hidx]), int(b[hidx + 1])
                url = url_of(pid, hidx)
                status = 200
                if error_fraction > 0 and (
                    splitmix64(seed + pid * 31 + 7) % 10_000
                    < int(error_fraction * 10_000)
                ):
                    status = 500
                links = []
                n_links = splitmix64(seed + pid * 17 + 3) % (links_per_page + 1)
                for j in range(n_links):
                    r = splitmix64(seed + pid * 1_315_423_911 + j)
                    if (r % 1000) < int(cross_host_fraction * 1000):
                        # cross-host link — dropped by the same-site filter
                        ohidx = r % n_hosts
                        opid = int(b[ohidx]) + r % max(1, int(b[ohidx + 1]) - int(b[ohidx]))
                        links.append(url_of(opid, ohidx))
                    else:
                        tpid = lo + (r % max(1, hi - lo))
                        links.append(url_of(tpid, hidx))
                # ordered dedup, as extractLinks produces (crawler.go:288-303)
                seen: set[str] = set()
                links = [x for x in links if not (x in seen or seen.add(x))]
                image_id = f"img-{pid}"
                fmt = "png" if pid % 2 == 0 else "qjpg"
                if with_images:
                    data, phash = _page_payload(image_id, img_w, img_h, fmt)
                else:
                    data, phash = None, int(splitmix64(pid) - (1 << 63))
                rows.append(
                    (url, f"host{hidx}.example.com", status, url, None, links,
                     image_id, data, img_w, img_h, fmt, caption_for(url), phash)
                )
                if len(rows) >= 1024:
                    yield flush()
            if rows:
                yield flush()

    return (
        spark.range(0, n_pages, numPartitions=num_partitions)
        .mapInPandas(gen, schema=PAGES_SCHEMA)
    )


def corpus_from_documents(
    spark: SparkSession,
    sf_dir: str,
    links_per_page: int = 4,
    n_hosts: int = 5,
    with_images: bool = False,
    seed: int = 42,
    link_rule: str = "splitmix",
) -> DataFrame:
    """Page graph derived from the driver's ``documents`` parquet.

    Deterministic: doc_id → url on host ``doc_id % n_hosts``; links
    target other docs on the same host via a splitmix64 chain (or, with
    ``link_rule="modular"``, a pure-modular-arithmetic chain that a SQL
    oracle can reproduce — used by the oracled BFS query). Captions are
    ``caption_for(url)`` so the decode-verify caption-equality invariant
    (input_hint) holds on this corpus exactly as on the synthetic ones.
    """
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    n_docs = docs.count()

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id in pdf["doc_id"]:
                doc_id = int(doc_id)
                hidx = doc_id % n_hosts
                url = f"http://docs{hidx}.example.com/d/{doc_id}.html"
                links = []
                # docs on this host are ids ≡ hidx (mod n_hosts); link only
                # to existing same-host docs so the graph is closed
                n_on_host = max(1, (n_docs - hidx + n_hosts - 1) // n_hosts)
                for j in range(links_per_page):
                    if link_rule == "modular":
                        # SQL-expressible chain (DuckDB recursive-CTE
                        # oracle reproduces it verbatim): plain modular
                        # arithmetic, no bit mixing
                        t = doc_id * 37 + j * 101 + 13
                    else:
                        t = splitmix64(seed + doc_id * 2654435761 + j)
                    target = hidx + n_hosts * (t % n_on_host)
                    links.append(f"http://docs{hidx}.example.com/d/{target}.html")
                seen: set[str] = set()
                links = [x for x in links if not (x in seen or seen.add(x))]
                image_id = f"doc-{doc_id}"
                fmt = "png" if doc_id % 2 == 0 else "qjpg"
                if with_images:
                    data, phash = _page_payload(image_id, 16, 12, fmt)
                else:
                    data, phash = None, int(splitmix64(doc_id) - (1 << 63))
                caption = caption_for(url)
                rows.append(
                    (url, f"docs{hidx}.example.com", 200, url, None, links,
                     image_id, data, 16, 12, fmt, caption, phash)
                )
            yield pd.DataFrame(rows, columns=[f.name for f in PAGES_SCHEMA.fields])

    return docs.select("doc_id").mapInPandas(gen, schema=PAGES_SCHEMA)
