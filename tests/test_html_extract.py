"""Stage A unit tests — block segmentation, boilerplate classification, and
quality-metric ordering relations (mirroring the reference's synthetic-input
strategy, tests/test_quality.py:55-133)."""

from __future__ import annotations

from ocr_spark.extraction.html_extract import extract_page
from ocr_spark.fixtures.corpus import make_page


def test_basic_content_extraction():
    html = b"<html><body><p>hello wide world of text</p></body></html>"
    assert extract_page(html).text == "hello wide world of text"


def test_script_style_comments_stripped():
    html = (
        b"<html><head><style>p{color:red}</style><script>var x=1;</script></head>"
        b"<body><!-- note --><p>real content stays here</p></body></html>"
    )
    out = extract_page(html)
    assert out.text == "real content stays here"
    assert "color" not in out.text


def test_nav_footer_are_boilerplate():
    html = (
        b"<html><body><nav>Home About Contact Links Here</nav>"
        b"<p>main body content of the page</p>"
        b"<footer>copyright legal terms privacy contact</footer></body></html>"
    )
    assert extract_page(html).text == "main body content of the page"


def test_link_density_filter():
    html = (
        b'<html><body><div><a href="/a">one link</a> <a href="/b">two link</a>'
        b' <a href="/c">three link</a></div>'
        b"<p>prose paragraph with no links at all</p></body></html>"
    )
    out = extract_page(html)
    assert out.text == "prose paragraph with no links at all"
    assert out.link_chars > 0


def test_short_blocks_dropped():
    html = b"<html><body><p>ok</p><p>this block is long enough</p></body></html>"
    assert extract_page(html).text == "this block is long enough"


def test_entities_unescaped():
    html = b"<html><body><p>fish &amp; chips &lt;daily&gt;</p></body></html>"
    assert extract_page(html).text == "fish & chips <daily>"


def test_empty_and_garbage_input():
    assert extract_page(b"").text == ""
    assert extract_page(b"\xff\xfe\x00garbage").text == ""


def test_payload_marker_found():
    html = b'<html><body><p>content body here</p><img data-payload-id="u1"/></body></html>'
    assert extract_page(html).payload_ids == ["u1"]


def test_ground_truth_equality_over_corpus():
    """The fixture `text` column IS what the extractor must return (byte-for-byte)."""
    for i in range(200):
        p = make_page(i)
        assert extract_page(p["html"]).text == p["text"], f"doc {i}"


def test_quality_metric_ordering():
    """Analog of reference test_quality.py ordering assertions: a content-rich
    page scores higher than a link-farm page."""
    rich = extract_page(make_page(0)["html"])
    farm_html = (
        b"<html><body><nav>"
        + b" ".join(b'<a href="/x%d">Link Number %d Here</a>' % (i, i) for i in range(40))
        + b"</nav></body></html>"
    )
    farm = extract_page(farm_html)
    assert rich.blur_raw > farm.blur_raw
    assert rich.glare_raw < farm.glare_raw or farm.text == ""
    assert farm.text == ""


def test_determinism_repeated_calls():
    p = make_page(7)
    a = extract_page(p["html"])
    b = extract_page(p["html"])
    assert a.text == b.text
    assert a.blur_raw == b.blur_raw
    assert a.glare_raw == b.glare_raw
