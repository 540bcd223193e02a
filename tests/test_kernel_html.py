"""Golden tests for the DOM tokenizer + boilerplate classifier.

Mirrors the reference's literal-expected-value unit style
(reference: tests/utils/test_formatter.py, tests/voters/test_weighted_voter.py).
"""

from openllm_ocr_annotator_spark.kernel.html import (
    classify_blocks,
    extract_html_items,
    tokenize_html,
)

LONG = "alpha beta gamma delta epsilon zeta eta theta iota kappa lambda mu"  # 12 words


def test_tokenize_splits_blocks_and_tracks_link_density():
    items = tokenize_html(f"<p>{LONG}</p><p><a href='/x'>home</a> link row</p>")
    assert [it[0] for it in items] == ["text", "text"]
    assert items[0][1] == LONG
    assert items[0][2] == 0.0  # no link chars
    assert items[1][2] > 0.2  # 'home' inside <a>


def test_script_and_style_subtrees_dropped():
    html = f"<p>{LONG}</p><script>var x = 'noise noise noise';</script><style>p{{}}</style><p>{LONG}</p>"
    items = tokenize_html(html)
    assert len(items) == 2
    assert all("noise" not in it[1] for it in items)


def test_entities_and_whitespace_normalized():
    items = tokenize_html("<p>a&amp;b   c\n\nd &lt;tag&gt;</p>")
    assert items[0][1] == "a&b c d <tag>"


def test_chrome_ancestors_flagged():
    items = tokenize_html(f"<nav><p>{LONG}</p></nav><p>{LONG}</p>")
    assert items[0][3] is True  # inside <nav>
    assert items[1][3] is False


def test_img_emits_media_item_in_order():
    items = tokenize_html(f'<p>{LONG}</p><img src="s3://b/i.jpg"><p>{LONG}</p>')
    assert [it[0] for it in items] == ["text", "media", "text"]
    assert items[1][1] == "s3://b/i.jpg"


def test_classify_keeps_strong_drops_chrome_and_linkfarm():
    html = (
        f"<nav><ul><li><a href='/a'>{LONG}</a></li></ul></nav>"
        f"<p>{LONG} {LONG}</p>"
        "<div><p><a href='/1'>t1</a> <a href='/2'>t2</a> <a href='/3'>t3</a></p></div>"
        "<footer><p>copyright 2024</p></footer>"
    )
    kept = extract_html_items(html)
    assert len(kept) == 1
    assert kept[0] == ("text", f"{LONG} {LONG}")


def test_weak_block_promoted_only_next_to_strong():
    strong = f"<p>{LONG}</p>"
    weak = "<p>short weak block</p>"  # 3 words: eligible, not strong
    kept_adjacent = extract_html_items(strong + weak)
    assert [k[1] for k in kept_adjacent] == [LONG, "short weak block"]
    kept_isolated = extract_html_items("<footer><p>x</p></footer>" + weak)
    assert kept_isolated == []


def test_media_kept_only_next_to_content():
    in_content = f'<p>{LONG}</p><img src="s3://b/keep.jpg"><p>{LONG}</p>'
    assert ("media", "s3://b/keep.jpg") in extract_html_items(in_content)
    in_chrome = '<nav><p>navnav</p></nav><img src="s3://b/drop.jpg"><footer><p>f</p></footer>'
    assert extract_html_items(in_chrome) == []


def test_classify_blocks_empty():
    assert classify_blocks([]) == []


def test_misnested_and_unterminated_tags_tolerated():
    items = tokenize_html(f"<div><p>{LONG}</div></p><p>{LONG}")
    texts = [it[1] for it in items if it[0] == "text"]
    assert texts == [LONG, LONG]


def test_inline_tags_do_not_split_words():
    """Inline (non-block) tag boundaries concatenate — '<b>wor</b>ld' is
    one word 'world', not 'wor ld'. A space-separated join corrupted every
    doc with mid-word inline markup, and the corruption propagated into
    word counts, link-density denominators, shingle fingerprints, and the
    exported corpus text itself."""
    items = tokenize_html("<p>Hello <b>wor</b>ld</p>")
    assert items == [("text", "Hello world", 0.0, False)]
    # whitespace-only gaps between inline elements still separate words
    assert tokenize_html("<p><b>a</b> <b>b</b></p>")[0][1] == "a b"
    # and truly adjacent inline elements concatenate (HTML rendering)
    assert tokenize_html("<p>foo<span>bar</span></p>")[0][1] == "foobar"
    # anchors behave the same; link chars still counted for density
    kind, text, density, _ = tokenize_html("<p>click <a href=x>here</a> now</p>")[0]
    assert text == "click here now" and abs(density - 4 / 12) < 1e-9


def test_src_attr_not_shadowed_by_data_src():
    """_extract_attr must scan attributes, not substrings: lazy-load markup
    (data-src) and quoted values containing 'src=' must not shadow the
    real src."""
    items = tokenize_html('<p><img data-src="lazy.jpg" src="real.jpg"></p>')
    assert ("media", "real.jpg") in items
    items = tokenize_html('<p><img alt="see src=foo" src="real.jpg"></p>')
    assert ("media", "real.jpg") in items
    # bare attribute / absent attribute yield no media item
    assert all(it[0] != "media" for it in tokenize_html("<p><img width=5></p>"))
