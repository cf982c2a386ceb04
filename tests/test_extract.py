"""Port of extractLinks table tests (`crawler_test.go:108-133`) against
the reference's own HTML fixtures, plus getLinks-shape cases
(`crawler_test.go:252-296`)."""

from sitemapper_spark.html_extract import extract_links

FOURLINKS = "/root/reference/sitemapper/internal/testdata/fourlinks.html"
NOLINKS = "/root/reference/sitemapper/internal/testdata/nolinks.html"


def test_fourlinks_document_order():
    content = open(FOURLINKS).read()
    assert extract_links(content) == [
        "/aubergine",
        "biscuit/pomegranate.html",
        "tomato.html",
        "/",
    ]


def test_nolinks():
    assert extract_links(open(NOLINKS).read()) == []


def test_plain_text_no_anchors():
    assert extract_links("no links here") == []


def test_single_anchor():
    assert extract_links('<a href="https://example.com">link</a>') == [
        "https://example.com"
    ]


def test_first_href_wins_and_dedup_and_trim():
    html = (
        '<a href=" /a " href="/b">x</a>'  # first href attribute only
        '<a href="/a">dup after trim</a>'
        '<a id="k" href="/c">attr order</a>'
        "<a>no href</a>"
    )
    assert extract_links(html) == ["/a", "/c"]


def test_empty_content():
    assert extract_links("") == []
    assert extract_links(None) == []
