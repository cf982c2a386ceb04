"""HTML anchor extraction with reference parity.

Pure-Python port of ``extractLinks``
(`/root/reference/sitemapper/internal/crawler.go:280-313`): walk every
``<a>`` element, take the **first** ``href`` attribute, trim whitespace,
and deduplicate while preserving document order. Uses the stdlib
``html.parser`` (lenient, like ``golang.org/x/net/html``).

Pure function so it can be table-tested (`crawler_test.go:108-133`) and
vectorized over pandas Series inside Arrow-batched pandas UDFs.
"""

from __future__ import annotations

from html.parser import HTMLParser

__all__ = ["extract_links"]


class _AnchorHrefParser(HTMLParser):
    def __init__(self) -> None:
        super().__init__(convert_charrefs=True)
        self.seen: set[str] = set()
        self.links: list[str] = []

    def handle_starttag(self, tag: str, attrs: list[tuple[str, str | None]]) -> None:
        if tag != "a":
            return
        for key, val in attrs:
            if key == "href":
                v = (val or "").strip()
                if v not in self.seen:
                    self.seen.add(v)
                    self.links.append(v)
                break  # first href attribute only (crawler.go:302)

    # <a/> self-closing anchors still carry hrefs
    handle_startendtag = handle_starttag


def extract_links(content: str) -> list[str]:
    """All unique anchor hrefs in document order; [] when none."""
    if not content:
        return []
    p = _AnchorHrefParser()
    try:
        p.feed(content)
        p.close()
    except Exception:
        return list(p.links)
    return p.links
