"""Extraction-chain conformance — one test per HTML archetype (FIXTURES.md §1,
reference semantics at crawler.py:520-628, 574-601, 564-571, 1040-1043)."""

import hashlib
import json

from raycrawl.extract import (
    clean_text,
    content_hash,
    create_excerpt,
    extract_document,
    extract_images,
    extract_lang,
    extract_main_content,
    get_title,
)
from raycrawl.minidom import parse_html

LONG = " ".join(f"mot{i}" for i in range(80))  # ~480 chars, no punctuation


def _dom(html):
    return parse_html(html)


# -- title ladder (crawler.py:564-571) --------------------------------------

def test_title_og_first():
    h = '<html><head><meta property="og:title" content=" OG Titre "><title>T2</title></head><body><h1>H</h1></body></html>'
    assert get_title(_dom(h)) == "OG Titre"


def test_title_tag_second():
    h = "<html><head><title> Le Titre </title></head><body><h1>H</h1></body></html>"
    assert get_title(_dom(h)) == "Le Titre"


def test_title_h1_third():
    h = "<html><body><h1> Un  H1 </h1></body></html>"
    assert get_title(_dom(h)) == "Un  H1"


def test_title_default():
    h = "<html><body><p>rien</p></body></html>"
    assert get_title(_dom(h)) == "Sans titre"


# -- main-content ladder (crawler.py:520-561) -------------------------------

def test_selector_hit_tier1():
    h = f'<html><body><div class="zone">cible {LONG}</div><article>autre {LONG}</article></body></html>'
    assert extract_main_content(_dom(h), ".zone") == f"cible {LONG}"


def test_selector_miss_falls_through():
    h = f"<html><body><article>{LONG}</article></body></html>"
    assert extract_main_content(_dom(h), ".nope") == LONG


def test_candidate_selector_best_by_length():
    short = "petit texte"
    h = f"<html><body><main>{short}</main><article>{LONG}</article></body></html>"
    # article beats main because its stripped text is longer
    assert extract_main_content(_dom(h), None) == LONG


def test_candidate_below_250_falls_to_largest_element():
    small = "contenu de section assez court"
    big = LONG
    h = f'<html><body><article>{small}</article><div id="x"><p>{big}</p></div></body></html>'
    # article < 250 chars → largest-element fallback picks the div (first, same len as p)
    assert extract_main_content(_dom(h), None) == big


def test_largest_element_skips_nav_header_footer_a_form():
    h = (
        f"<html><body><nav>{LONG} {LONG}</nav>"
        f"<p>{LONG}</p>"
        f"<footer>{LONG} {LONG}</footer></body></html>"
    )
    assert extract_main_content(_dom(h), None) == LONG


def test_boilerplate_decomposed_inside_target():
    h = (
        f'<html><body><article>{LONG}'
        f'<div class="social-share">partage</div>'
        f'<div class="cookie-banner">cookies</div>'
        f'<aside>encart</aside> fin</article></body></html>'
    )
    assert extract_main_content(_dom(h), None) == f"{LONG} fin"


def test_get_text_separator_and_strip():
    h = f"<html><body><article><p> a{LONG} </p><p> b </p><span></span><p>c</p></article></body></html>"
    assert extract_main_content(_dom(h), None) == f"a{LONG} b c"


def test_no_body_returns_empty():
    assert extract_main_content(_dom("<html></html>"), None) == ""


# -- clean_text (crawler.py:594-601) ----------------------------------------

def test_clean_text_collapses_whitespace_and_strips_controls():
    assert clean_text("a\t\tb\n\nc   d") == "a b c d"
    assert clean_text("x\x00y\x08z") == "xyz"
    assert clean_text("  bord  ") == "bord"


def test_clean_text_truncates_3000():
    t = "y" * 4000
    assert clean_text(t) == "y" * 3000


def test_clean_text_removes_fr_boilerplate_patterns():
    assert clean_text("debut Partager : facebook twitter") == "debut"
    assert clean_text("texte Cookies policy blah") == "texte"


# -- excerpt (crawler.py:574-591) -------------------------------------------

def test_excerpt_accumulates_sentences_ge20():
    c = "Une premiere phrase assez longue ici. Ok. Une deuxieme phrase assez longue aussi. " + LONG
    e = create_excerpt(c)
    # 'Ok.' (<20 chars) skipped; two long sentences fit in 250
    assert e.startswith("Une premiere phrase assez longue ici. Une deuxieme phrase")
    assert e.endswith("...")


def test_excerpt_short_content_no_ellipsis():
    c = "Texte court sans ponctuation finale longue"
    assert create_excerpt(c) == c


def test_excerpt_fallback_prefix_when_no_sentence_fits():
    c = "m" * 400  # one 400-char 'sentence' → loop breaks, fallback prefix
    e = create_excerpt(c)
    assert e == "m" * 250 + "..."


def test_excerpt_rstrips_punctuation_before_ellipsis():
    c = "Une phrase finale qui se termine par un point. " + "z" * 300
    e = create_excerpt(c)
    assert e == "Une phrase finale qui se termine par un point..."


def test_excerpt_empty():
    assert create_excerpt("") == ""


# -- images (crawler.py:604-628) --------------------------------------------

def test_images_rules():
    h = """<html><body><article>
    <img src="/a.png" alt="A" width="200" height="150">
    <img src="/small.png" alt="S" width="50" height="200">
    <img data-src="/lazy.png" alt="">
    <img data-lazy-src="/lazy2.png" alt="L2" width="abc" height="200">
    <img alt="nosrc">
    <img src="/a.png" alt="dup">
    <img src="/b.png"><img src="/c.png"><img src="/d.png"><img src="/e.png">
    </article></body></html>"""
    imgs = extract_images(_dom(h), "https://a.org/page")
    urls = [i["url"] for i in imgs]
    # small.png dropped (declared <100), nosrc dropped, dup dedup'd, cap at 5
    assert urls == [
        "https://a.org/a.png",
        "https://a.org/lazy.png",
        "https://a.org/lazy2.png",  # non-int dims → kept
        "https://a.org/b.png",
        "https://a.org/c.png",
    ]
    assert imgs[1]["alt"] == "Image"  # empty alt → 'Image'
    assert imgs[0]["description"] == "A"


# -- lang (crawler.py:1040-1043) --------------------------------------------

def test_lang_extraction():
    assert extract_lang(_dom('<html lang="en-US"><body>x</body></html>')) == "en"
    assert extract_lang(_dom('<html lang="DE"><body>x</body></html>')) == "de"
    assert extract_lang(_dom("<html><body>x</body></html>")) == "fr"


# -- content hash (crawler.py:393-396) --------------------------------------

def test_content_hash_matches_reference_formula():
    imgs = [{"url": "u", "alt": "a", "description": "d"}]
    expected = hashlib.md5(
        f"T|E|C|{json.dumps(imgs, sort_keys=True)}".encode()
    ).hexdigest()
    assert content_hash("C", "T", imgs, "E") == expected


# -- full document + links --------------------------------------------------

def test_extract_document_links_normalized_and_ordered():
    h = (
        f'<html lang="fr"><body><nav><a href="/x#f">x</a>'
        f'<a href="rel/y/">y</a><a href="https://b.org/z">z</a></nav>'
        f"<article>{LONG}</article></body></html>"
    )
    d = extract_document(h, "https://a.org/dir/page")
    assert d["links"] == ["https://a.org/x", "https://a.org/dir/rel/y", "https://b.org/z"]
    assert d["content"] == LONG
    assert d["lang"] == "fr"


def test_links_inside_decomposed_boilerplate_are_dropped():
    h = (
        f'<html><body><article>{LONG}'
        f'<div class="sidebar"><a href="/hidden">h</a></div></article>'
        f'<nav><a href="/kept">k</a></nav></body></html>'
    )
    d = extract_document(h, "https://a.org/p")
    assert d["links"] == ["https://a.org/kept"]


def test_fixture_template_roundtrip():
    """Generator-built pages must extract to exactly the oracle text column."""
    from raycrawl.fixtures import build_page_html

    text = "contenu principal " + LONG
    h = build_page_html("T", text, "en", links=["/a", "/b#f"], og_title=None)
    d = extract_document(h, "https://h.example.org/p")
    assert d["content"] == text
    assert d["title"] == "T"
    assert d["lang"] == "en"
    assert d["links"][:2] == ["https://h.example.org/a", "https://h.example.org/b"]


# ---------------------------------------------------------------------------
# tier-2 density extractor (trafilatura stand-in, opt-in)


def test_density_extract_keeps_prose_drops_nav_and_links():
    """Block-density rules: prose paragraphs survive; nav-nested blocks,
    link-heavy blocks, and tiny blocks are dropped; nested blocks are not
    double-counted; short totals fall through (return '')."""
    from raycrawl.extract import density_extract
    from raycrawl.minidom import parse_html

    prose1 = "word " * 60                     # ~300 chars of prose
    prose2 = "body " * 60
    html = f"""<html><body>
      <nav><p>{'menu ' * 20}</p></nav>
      <p>{prose1}</p>
      <p>short</p>
      <p><a href="/x">{'linktext ' * 30}</a> tail</p>
      <blockquote><p>{prose2}</p></blockquote>
      <footer><p>{'legal ' * 20}</p></footer>
    </body></html>"""
    out = density_extract(parse_html(html))
    assert prose1.strip() in out
    assert prose2.strip() in out
    assert "menu" not in out and "legal" not in out
    assert "linktext" not in out and "short" not in out
    # blockquote kept as the OUTERMOST block: its <p> appears once — 60
    # 'body' words = 30 non-overlapping 'body body' pairs (a double-count
    # bug would give 120 words = 60 pairs)
    assert out.count("body body") == 30

    # below the 250-char total gate -> '' (fall through to tier 3)
    assert density_extract(parse_html("<body><p>tiny prose here</p></body>")) == ""


def test_tier2_density_opt_in_changes_nothing_by_default():
    """Default extract chain ignores the density tier (byte-stable vs the
    oracle simulator); opting in routes qualifying pages through it."""
    from raycrawl.extract import extract_main_content
    from raycrawl.minidom import parse_html

    prose = "alpha " * 60
    # no candidate selector matches; tier 3 would fall to largest element
    html = f"<html><body><div><p>{prose}</p></div></body></html>"
    dom1 = parse_html(html)
    default = extract_main_content(dom1, None)
    dom2 = parse_html(html)
    dens = extract_main_content(dom2, None, tier2_density=True)
    # both extract the prose here; the point is the default path does NOT
    # invoke the density tier (same output as before the flag existed)
    assert prose.strip() in default and prose.strip() in dens
    # site selector (tier 1) still wins over the density tier
    html_sel = f"<html><body><main>{prose}</main><p>{'other ' * 60}</p></body></html>"
    dom3 = parse_html(html_sel)
    assert "other" not in extract_main_content(dom3, "main",
                                               tier2_density=True)
