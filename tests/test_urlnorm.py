"""URL canonicalization conformance (reference crawler.py:470-499)."""

from raycrawl.urlnorm import (
    generate_doc_id,
    has_binary_extension,
    is_excluded,
    is_same_domain,
    is_valid_url,
    join_and_normalize,
    normalize_url,
    url_key_hex,
)


def test_normalize_strips_fragment_and_trailing_slash():
    assert normalize_url("https://a.org/x#frag") == "https://a.org/x"
    assert normalize_url("https://a.org/x/") == "https://a.org/x"
    assert normalize_url("https://a.org/") == "https://a.org"
    assert normalize_url("https://a.org/x/#f/") == "https://a.org/x"
    assert normalize_url("https://a.org/x?q=1#f") == "https://a.org/x?q=1"


def test_valid_url():
    assert is_valid_url("https://a.org/x")
    assert is_valid_url("http://a.org")
    assert not is_valid_url("ftp://a.org/x")
    assert not is_valid_url("mailto:x@a.org")
    assert not is_valid_url("https://localhost/x")
    assert not is_valid_url("http://127.0.0.1/x")
    assert not is_valid_url("javascript:void(0)")


def test_same_domain_is_netloc_equality():
    assert is_same_domain("https://a.org/1", "http://a.org/2")
    assert not is_same_domain("https://www.a.org/1", "https://a.org/2")
    assert not is_same_domain("https://b.org", "https://a.org")


def test_excluded_substring_semantics():
    assert is_excluded("https://a.org/login/form", ["/login"])
    assert is_excluded("https://a.org/x?rest_route=/wp", ["?rest_route="])
    assert not is_excluded("https://a.org/blog", ["/login"])
    assert not is_excluded("https://a.org/blog", [])


def test_binary_extension_case_insensitive():
    assert has_binary_extension("https://a.org/i.PNG")
    assert has_binary_extension("https://a.org/d.pdf")
    assert not has_binary_extension("https://a.org/page")
    assert not has_binary_extension("https://a.org/page.html")


def test_doc_id_is_md5_of_url():
    import hashlib

    u = "https://a.org/x"
    assert generate_doc_id(u) == hashlib.md5(u.encode()).hexdigest()


def test_url_key_is_sha1_of_canonical():
    assert url_key_hex("https://a.org/x#f") == url_key_hex("https://a.org/x/")


def test_join_and_normalize():
    assert join_and_normalize("https://a.org/dir/page", "../up") == "https://a.org/up"
    assert join_and_normalize("https://a.org/d/", "child#s") == "https://a.org/d/child"
    assert join_and_normalize("https://a.org/d", "https://b.org/x/") == "https://b.org/x"


def test_surt_key_rules():
    """SURT subset: scheme drop, host lowercase + dot-reverse + commas,
    default-port drop (non-default ports kept), ')' close, lowercased
    path+query, bare hosts get '/'."""
    from raycrawl.urlnorm import surt_key

    assert surt_key("https://Src1.Example.org/Doc/9?B=2") == \
        "org,example,src1)/doc/9?b=2"
    assert surt_key("http://www.example.org:80/A/B") == \
        "org,example,www)/a/b"
    assert surt_key("https://example.org:443/x") == "org,example)/x"
    assert surt_key("https://example.org:8443/x") == "org,example:8443)/x"
    assert surt_key("https://example.org") == "org,example)/"
    assert surt_key("https://example.org/") == "org,example)/"
    # sort order clusters a registered domain's hosts contiguously
    keys = sorted(surt_key(u) for u in [
        "https://b.example.org/1", "https://a.example.org/2",
        "https://a.zzz.net/3", "https://example.org/0"])
    assert keys == ["net,zzz,a)/3", "org,example)/0",
                    "org,example,a)/2", "org,example,b)/1"]


def test_surt_key_query_without_path_and_scheme_aware_ports():
    """Review regressions: a query with no path must not fold into the
    host (domain-contiguous sort order), and default-port dropping is
    scheme-aware — :80 under https is a DISTINCT origin and survives."""
    from raycrawl.urlnorm import surt_key

    assert surt_key("https://example.org?a=1") == "org,example)/?a=1"
    assert surt_key("https://example.org#frag") == "org,example)/#frag"
    assert surt_key("https://example.org:80/x") == "org,example:80)/x"
    assert surt_key("http://example.org:443/x") == "org,example:443)/x"
    assert surt_key("http://example.org:80/x") == "org,example)/x"
