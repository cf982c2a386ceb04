"""URL canonicalization with reference parity.

Pure-Python port of the link-cleaning contract of the reference crawler
(`/root/reference/sitemapper/internal/crawler.go:204-257` ``cleanLinks``),
including the Go stdlib behaviors the reference silently relies on:

* ``url.Parse`` rejecting ASCII control characters
  (go ``net/url``: "invalid control character in URL");
* ``path.Join`` = concatenate + ``path.Clean`` (dot/dotdot collapse, no
  trailing slash);
* ``url.URL.String()`` inserting a leading ``/`` before a rootless path
  when a host is present, and dropping query/fragment because the
  reference rebuilds URLs from ``{Scheme, Host, Path}`` only
  (`crawler.go:235,239,245,248`).

These are *pure* functions so they can be exercised exhaustively by the
table tests ported from `crawler_test.go:188-250`, and vectorized over
pandas Series inside Arrow-batched pandas UDFs (see
:mod:`sitemapper_spark.functions.udfs`). No per-row Python UDFs are used
on the Spark side.
"""

from __future__ import annotations

from urllib.parse import unquote, urlsplit

__all__ = [
    "go_path_clean",
    "go_path_join",
    "parse_url",
    "url_string",
    "clean_link",
    "clean_links",
    "host_of",
]

# Go net/url rejects ASCII control characters outright.
_CTRL = {chr(c) for c in range(0x21)} | {chr(0x7F)}
_CTRL -= {" "}  # space is escaped by Go's parser, not rejected
# Characters Go's shouldEscape(c, encodePath) KEEPS: unreserved (§2.3)
# plus the reserved set "$&+,/:;=?@" minus '?' (escaped in path mode).
# Everything else — including the sub-delims !'()* and a literal '%'
# from a decoded %25 — is percent-escaped with UPPERCASE hex, exactly
# like Go's URL.String() on a {Scheme, Host, Path}-only struct (which
# has no RawPath and therefore re-escapes the decoded Path).
_PATH_SAFE = (
    "ABCDEFGHIJKLMNOPQRSTUVWXYZabcdefghijklmnopqrstuvwxyz0123456789"
    "-._~$&+,/:;=@"
)


def go_path_clean(p: str) -> str:
    """Port of Go ``path.Clean`` (lexical processing only)."""
    if p == "":
        return "."
    rooted = p.startswith("/")
    out: list[str] = []
    for seg in p.split("/"):
        if seg == "" or seg == ".":
            continue
        if seg == "..":
            if out and out[-1] != "..":
                out.pop()
            elif not rooted:
                out.append("..")
            # rooted with nothing to pop: drop the ".."
        else:
            out.append(seg)
    res = "/".join(out)
    if rooted:
        res = "/" + res
    if res == "":
        return "."
    return res


def go_path_join(*parts: str) -> str:
    """Port of Go ``path.Join``: skip empties, join with '/', Clean."""
    elems = [p for p in parts if p != ""]
    if not elems:
        return ""
    return go_path_clean("/".join(elems))


def parse_url(raw: str) -> tuple[str, str, str] | None:
    """Parse ``raw`` into ``(scheme, host, path)`` like Go ``url.Parse``.

    Returns ``None`` on the inputs Go rejects (control characters,
    malformed percent escapes). Query and fragment are discarded — the
    reference never uses them (`crawler.go:235-248`). Userinfo is
    stripped from the host (Go keeps it in ``URL.User``, not ``Host``).
    """
    if any(ch in _CTRL for ch in raw):
        return None
    # Go rejects invalid percent-encodings anywhere in the URL.
    i = 0
    while True:
        i = raw.find("%", i)
        if i < 0:
            break
        hexpart = raw[i + 1 : i + 3]
        if len(hexpart) < 2 or not all(c in "0123456789abcdefABCDEF" for c in hexpart):
            return None
        i += 3
    try:
        sp = urlsplit(raw)
    except ValueError:
        return None
    scheme = sp.scheme.lower()
    host = sp.netloc
    if "@" in host:
        host = host.rsplit("@", 1)[1]
    # Go's url.Parse DECODES the path into URL.Path (RawPath is dropped
    # when the reference rebuilds url.URL{Scheme, Host, Path}), so an
    # encoded slash '%2F' becomes a real path separator and '%c3%a9'
    # round-trips through the decoded character. surrogateescape keeps
    # non-UTF-8 percent sequences byte-exact, as Go's byte strings do.
    path = unquote(sp.path, errors="surrogateescape")
    return scheme, host, path


def _escape_path(path: str) -> str:
    """Go ``URL.EscapedPath()`` on a decoded Path (no RawPath):
    re-escape with ``shouldEscape(c, encodePath)``, uppercase hex."""
    if all(c in _PATH_SAFE for c in path):
        return path
    out = []
    for ch in path:
        if ch in _PATH_SAFE:
            out.append(ch)
        else:
            out.extend(
                "%%%02X" % b for b in ch.encode("utf-8", "surrogateescape")
            )
    return "".join(out)


def url_string(scheme: str, host: str, path: str) -> str:
    """Port of Go ``url.URL.String()`` for ``{Scheme, Host, Path}``-only URLs."""
    s = ""
    if scheme:
        s += scheme + ":"
    if scheme or host:
        s += "//"
    s += host
    epath = _escape_path(path)
    if epath and not epath.startswith("/") and host:
        s += "/"
    return s + epath


def clean_link(link: str, root: str, parent_url: str) -> str | None:
    """Port of one iteration of ``cleanLinks`` (`crawler.go:204-257`).

    ``parent_url`` is the *post-redirect* URL of the fetched page
    (`crawler.go:176,193` resolves against ``resp.Request.URL``).
    Returns the canonical URL string, or ``None`` when the link is
    dropped (bad parse, foreign scheme, root link, foreign host).
    """
    parsed = parse_url(link)
    if parsed is None:
        return None
    l_scheme, l_host, l_path = parsed

    if l_scheme not in ("", "http", "https"):
        return None
    if l_host == "" and (l_path == "" or l_path == "/"):
        return None

    root_parsed = parse_url(root)
    if root_parsed is None:
        return None
    r_scheme, r_host, _ = root_parsed

    p_parsed = parse_url(parent_url)
    if p_parsed is None:
        return None
    p_scheme, p_host, p_path = p_parsed

    if l_host == "" and l_path.startswith("/"):
        # Host-relative link: root scheme + parent host (crawler.go:234-235)
        return url_string(r_scheme, p_host, l_path)
    if l_host == "" and l_path != "" and p_path.endswith("/"):
        # Parent is a directory: append (crawler.go:237-239)
        return url_string(p_scheme, p_host, go_path_join(p_path, l_path))
    if l_host == "" and l_path != "":
        # Sibling: join with the parent *directory* (crawler.go:241-245)
        li = p_path.rfind("/")
        parent_dir = p_path[: li + 1]  # rfind==-1 → "" (Go slice [:0])
        return url_string(p_scheme, p_host, go_path_join(parent_dir, l_path))
    if l_host == r_host:
        # Absolute same-host link, query+fragment dropped (crawler.go:247-248)
        return url_string(l_scheme, l_host, l_path)
    return None


def clean_links(links: list[str], root: str, parent_url: str) -> list[str]:
    """Port of ``cleanLinks``: order-preserving, drops return ``None``."""
    out = []
    for link in links:
        c = clean_link(link, root, parent_url)
        if c is not None:
            out.append(c)
    return out


def host_of(url: str) -> str:
    """Host (with port, without userinfo) of a URL; '' if unparseable."""
    parsed = parse_url(url)
    return parsed[1] if parsed else ""
