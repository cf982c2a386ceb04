"""Port of the reference's canonicalization table tests
(`/root/reference/sitemapper/internal/crawler_test.go:188-250`) plus the
Go stdlib edge cases the goldens depend on."""

import pytest

from sitemapper_spark.urlnorm import (
    clean_link,
    clean_links,
    go_path_clean,
    go_path_join,
    parse_url,
    url_string,
)

ROOT = "https://example.com"


# crawler_test.go:196-210 "parent trailing slash"
def test_parent_trailing_slash():
    got = clean_links(
        [
            "relative/link/index.html",
            "/absolute/index.html",
            "/",
            "https://anotherhost.com/link.html",
            "mailto://test@email.com",
            "https://example.com/index.html#anchor",
        ],
        ROOT,
        "https://example.com/parent/",
    )
    assert got == [
        "https://example.com/parent/relative/link/index.html",
        "https://example.com/absolute/index.html",
        "https://example.com/index.html",
    ]


# crawler_test.go:211-228 "parent index.html" (www. is a different host)
def test_parent_index_html():
    got = clean_links(
        [
            "relative/link/index.html",
            "/absolute/index.html",
            "/",
            "https://anotherhost.com/link.html",
            "mailto://test@email.com",
            "https://example.com/index.html#anchor",
            "https://myexample.com/foo.html",
        ],
        ROOT,
        "https://www.example.com/parent/index.html",
    )
    assert got == [
        "https://www.example.com/parent/relative/link/index.html",
        "https://www.example.com/absolute/index.html",
        "https://example.com/index.html",
    ]


# crawler_test.go:229-238: unparseable link / root → dropped
def test_bad_link_and_root():
    assert clean_links(["\x7f"], ROOT, "https://example.com/parent/index.html") == []
    assert (
        clean_links(
            ["https://example.com/link.html"], "\x7f",
            "https://example.com/parent/index.html",
        )
        == []
    )


@pytest.mark.parametrize(
    "link,root,parent,expected",
    [
        # root page with empty path: sibling join against "" parent dir
        ("tomato.html", "http://localhost:2015", "http://localhost:2015",
         "http://localhost:2015/tomato.html"),
        # root link dropped (crawler.go:220-223)
        ("/", "http://localhost:2015", "http://localhost:2015", None),
        ("", "http://localhost:2015", "http://localhost:2015", None),
        # directory parent (post-redirect trailing slash) appends
        ("cabbage/banana.html", "http://localhost:2015",
         "http://localhost:2015/aubergine/",
         "http://localhost:2015/aubergine/cabbage/banana.html"),
        # file parent joins with parent directory
        ("cabbage/banana.html", "http://localhost:2015",
         "http://localhost:2015/aubergine/lemon.html",
         "http://localhost:2015/aubergine/cabbage/banana.html"),
        # absolute same-host keeps own scheme, strips query+fragment
        ("http://localhost:2015/a.html?q=1#f", "http://localhost:2015",
         "http://localhost:2015/x.html", "http://localhost:2015/a.html"),
        # self link kept (golden: tomato.html → tomato.html)
        ("tomato.html", "http://localhost:2015",
         "http://localhost:2015/tomato.html",
         "http://localhost:2015/tomato.html"),
        # scheme filter (crawler.go:215-218)
        ("ftp://localhost:2015/x", "http://localhost:2015",
         "http://localhost:2015/", None),
        ("javascript:void(0)", "http://localhost:2015",
         "http://localhost:2015/", None),
        # dotdot collapse via Go path.Join
        ("../up.html", "http://localhost:2015",
         "http://localhost:2015/a/b/c.html", "http://localhost:2015/a/up.html"),
        # host-relative uses ROOT scheme + PARENT host (crawler.go:234-235)
        ("/abs.html", "https://example.com",
         "http://www.example.com/d/", "https://www.example.com/abs.html"),
    ],
)
def test_clean_link_cases(link, root, parent, expected):
    assert clean_link(link, root, parent) == expected


def test_go_path_semantics():
    assert go_path_clean("/a/b/../c/") == "/a/c"
    assert go_path_clean("") == "."
    assert go_path_clean("//a//b") == "/a/b"
    assert go_path_clean("a/../..") == ".."
    assert go_path_clean("/..") == "/"
    assert go_path_join("/parent/", "x.html") == "/parent/x.html"
    assert go_path_join("", "x.html") == "x.html"
    assert go_path_join() == ""


def test_url_string_rootless_path_gets_slash():
    # Go url.URL.String() inserts "/" before a rootless path when a
    # host is present — the golden root-page links depend on this.
    assert url_string("http", "h:1", "x.html") == "http://h:1/x.html"
    assert url_string("http", "h:1", "/x.html") == "http://h:1/x.html"
    assert url_string("", "h", "/p") == "//h/p"


def test_parse_url_go_quirks():
    assert parse_url("\x7f") is None
    assert parse_url("http://h/%zz") is None  # invalid percent escape
    assert parse_url("mailto://test@email.com")[0] == "mailto"
    s, h, p = parse_url("https://user:pw@h:8080/p?q#f")
    assert (s, h, p) == ("https", "h:8080", "/p")
