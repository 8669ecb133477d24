"""MediaWiki / JSON-API source + query-side operator conformance
(reference mediawiki_crawler.py:246-358, crawler.py:444-467 + 1255-1292,
api/services/{merger,reranker,safety}.py)."""

import pyarrow as pa

from raycrawl.ops.queryside import SafetyFilter, normalize_merge_url
from raycrawl.sources.json_api import (
    concat_content,
    get_nested_value,
    render_template,
)
from raycrawl.sources.mediawiki import (
    clean_wikitext,
    is_safe_title,
    synthesize_wikitext,
)


# -- wikitext cleaner (mediawiki_crawler.py:262-334) ------------------------

def test_clean_wikitext_templates_nested():
    assert clean_wikitext("{{a|b={{c}}}}texte") == "texte"


def test_clean_wikitext_links_and_categories():
    # reference quirk (faithful): the generic [[link|text]] replacement runs
    # BEFORE the category/file regexes, so those never see brackets and the
    # labels survive as text (mediawiki_crawler.py:293-301 order)
    s = "[[Page|libellé]] et [[Autre]] [[Catégorie:Test]] [[Fichier:x.png]]"
    assert clean_wikitext(s) == "libellé et Autre Catégorie:Test Fichier:x.png"


def test_clean_wikitext_refs_and_html():
    # generic HTML-tag strip runs FIRST (reference order), so ref bodies
    # survive as plain text once their tags are gone
    assert clean_wikitext("a<ref>source</ref>b <b>gras</b>") == "asourceb gras"
    assert clean_wikitext('x<ref name="n"/>y') == "xy"


def test_clean_wikitext_quotes_and_headings():
    assert clean_wikitext("'''gras''' et ''italique''") == "gras et italique"
    # reference quirk (faithful): the heading pattern ={2,}[^=]+=={2,}
    # requires >=3 trailing '=' — level-2 headings survive, level-3+ don't
    assert clean_wikitext("== Titre ==contenu ici") == "== Titre ==contenu ici"
    assert clean_wikitext("=== Titre ===contenu ici") == "contenu ici"


def test_clean_wikitext_tail_cut_only_past_500():
    short = "texte " * 10 + "== Références ==suite"
    # position < 500 → no cut; heading removed, body text stays
    assert "suite" in clean_wikitext(short)
    long = "mot " * 200 + "== Références == tout le reste"
    assert "reste" not in clean_wikitext(long)


def test_safe_title_blocklist():
    assert not is_safe_title("Attentat de 1995")
    assert not is_safe_title("Le massacre oublié")
    assert is_safe_title("Les papillons")


def test_synthesize_roundtrip():
    text = "contenu simple de test avec plusieurs mots"
    assert clean_wikitext(synthesize_wikitext(text, "T")) == text


# -- json nested paths (crawler.py:444-467) ---------------------------------

def test_nested_value_paths():
    d = {"a": {"b": 1}, "items": [{"name": "x"}, {"name": "y"}, {}]}
    assert get_nested_value(d, "a.b") == 1
    assert get_nested_value(d, "a.missing") is None
    assert get_nested_value(d, "items[].name") == ["x", "y"]
    assert get_nested_value(d, "items[]") == d["items"]
    assert get_nested_value([], "x") is None
    assert get_nested_value(d, "") is None


def test_render_template():
    item = {"id": 7, "slug": "abc"}
    assert render_template("https://x/{{id}}/{{slug}}", item) == "https://x/7/abc"
    assert render_template("https://x/{{nope}}", item) is None


def test_concat_content():
    item = {"t": "titre", "tags": ["a", "b"], "body": {"x": "corps"}}
    assert concat_content(item, "t, tags, body.x") == "titre a b corps"


# -- query-side (merger.py:97-130, safety.py:103-188) ------------------------

def test_normalize_merge_url():
    assert normalize_merge_url("https://www.A.org/x/") == "https://a.org/x"
    assert normalize_merge_url("https://a.org/x#frag") == "https://a.org/x"
    assert normalize_merge_url("https://a.org/x?q=1#f") == "https://a.org/x?q=1"


def test_safety_filter_rules():
    f = SafetyFilter(blocked_domains=["bad.org"], blocked_keywords=["interdit"],
                     blocked_patterns=[r"\d{4}-\d{4}"])
    t = pa.table(
        {
            "url": ["https://ok.org/a", "https://www.bad.org/b",
                    "https://ok.org/interdit-page", "https://ok.org/c",
                    "https://ok.org/d"],
            "title": ["bien", "bien", "bien", "contenu interdit", "code 1234-5678"],
            "excerpt": ["", "", "", "", ""],
            "content": ["sain", "sain", "sain", "sain", "sain"],
        }
    )
    out = f(t)
    assert out["url"].to_pylist() == ["https://ok.org/a"]


def test_safety_whitelist():
    f = SafetyFilter(allowed_domains=["ok.org"])
    t = pa.table({"url": ["https://ok.org/a", "https://other.org/b"],
                  "title": ["x", "y"], "excerpt": ["", ""], "content": ["", ""]})
    assert f(t)["url"].to_pylist() == ["https://ok.org/a"]


class FakeWikiAPI:
    """In-memory MediaWiki API: 3-request apcontinue listing + batched
    revisions endpoint (ref mediawiki_crawler.py:95-140, 494-503)."""

    def __init__(self, n_pages=120, list_page=50):
        self.pages = {
            i: (f"Page {i}", f"[[lien interne|{'word ' * 30}page {i} body]]")
            for i in range(n_pages)
        }
        self.list_page = list_page
        self.calls = []

    def __call__(self, params):
        self.calls.append(dict(params))
        if params.get("list") == "allpages":
            assert params["apfilterredir"] == "nonredirects"
            assert params["aplimit"] == "max"
            start = int(params.get("apcontinue", 0))
            ids = sorted(self.pages)[start: start + self.list_page]
            out = {"query": {"allpages": [{"pageid": i, "title": self.pages[i][0]}
                                          for i in ids]}}
            if start + self.list_page < len(self.pages):
                out["continue"] = {"apcontinue": str(start + self.list_page)}
            return out
        pids = [int(x) for x in params["pageids"].split("|")]
        assert len(pids) <= 50
        # full reference request shape (mediawiki_crawler.py:151-160)
        assert params["prop"] == "extracts|info|pageimages|revisions"
        assert params["piprop"] == "thumbnail"
        assert params["pithumbsize"] == 500
        assert params["inprop"] == "url"
        out = {}
        for i in pids:
            if i not in self.pages:
                continue
            p = {"pageid": i, "ns": 0, "title": self.pages[i][0],
                 "revisions": [{"*": self.pages[i][1]}]}
            # every 5th page carries a thumbnail (ref :217-224 branch)
            if i % 5 == 0:
                p["thumbnail"] = {
                    "source": f"https://img.example.org/thumb/{i}.png",
                    "width": 500, "height": 300}
            out[str(i)] = p
        return {"query": {"pages": out}}


def test_wiki_apcontinue_pagination_lists_everything():
    from raycrawl.sources.mediawiki import list_all_page_ids

    api = FakeWikiAPI(n_pages=120, list_page=50)
    ids = list_all_page_ids(api, namespaces=(0,))
    assert ids == list(range(120))
    listing_calls = [c for c in api.calls if c.get("list") == "allpages"]
    assert len(listing_calls) == 3            # 50 + 50 + 20
    assert "apcontinue" not in listing_calls[0]
    assert listing_calls[1]["apcontinue"] == "50"


def test_wiki_crawl_end_to_end(ray_session):
    import sys as _sys

    from ray import cloudpickle

    cloudpickle.register_pickle_by_value(_sys.modules[__name__])
    from raycrawl.sources.mediawiki import wiki_crawl

    api = FakeWikiAPI(n_pages=120, list_page=50)
    docs = wiki_crawl(api, api_batch_size=50).to_pandas()
    assert len(docs) == 120
    assert docs["content"].str.contains("page").all()
    # content batches respected the 50-page request cap
    content_calls = [c for c in api.calls if "pageids" in c]
    assert all(len(c["pageids"].split("|")) <= 50 for c in content_calls)
    # pageimages parity (ref mediawiki_crawler.py:217-224): thumbnailed
    # pages carry one images struct (url=thumbnail source, alt=desc=title);
    # the rest an EMPTY list (not null)
    docs = docs.sort_values("page_id").reset_index(drop=True)
    for _, row in docs.iterrows():
        pid = row["page_id"]
        if pid % 5 == 0:
            assert list(row["images"]) and row["images"][0]["url"] == \
                f"https://img.example.org/thumb/{pid}.png"
            assert row["images"][0]["alt"] == f"Page {pid}"
            assert row["images"][0]["description"] == f"Page {pid}"
        else:
            assert len(row["images"]) == 0


# -- query-side wiki search (S13, wiki_client.py:103-161) --------------------

def test_detect_wiki_lang_reference_asymmetry():
    from raycrawl.sources.mediawiki import detect_wiki_lang

    # en/fr match wikipedia AND vikidia; es/de only wikipedia; default en
    assert detect_wiki_lang("https://en.wikipedia.org/w/api.php") == "en"
    assert detect_wiki_lang("https://fr.vikidia.org/w/api.php") == "fr"
    assert detect_wiki_lang("https://es.wikipedia.org/w/api.php") == "es"
    assert detect_wiki_lang("https://es.vikidia.org/w/api.php") == "en"
    assert detect_wiki_lang("https://de.wikipedia.org/w/api.php") == "de"
    assert detect_wiki_lang("https://wiki.example.org/api.php") == "en"


def test_build_api_url_reference_rule():
    from raycrawl.sources.mediawiki import build_api_url

    # /wiki/ page URL → origin + /w/api.php (mediawiki_crawler.py:44-51)
    assert (build_api_url("https://fr.vikidia.org/wiki/Accueil")
            == "https://fr.vikidia.org/w/api.php")
    assert (build_api_url("https://en.wikipedia.org/wiki/Main_Page")
            == "https://en.wikipedia.org/w/api.php")
    # non-/wiki/ URLs get /w/api.php appended after rstrip('/')
    assert (build_api_url("https://wiki.example.org/")
            == "https://wiki.example.org/w/api.php")
    assert (build_api_url("https://wiki.example.org")
            == "https://wiki.example.org/w/api.php")


def test_select_transport_cloudflare_gate():
    from raycrawl.sources.mediawiki import select_transport

    default = object()
    bypass = object()
    # vikidia + bypass available → bypass (mediawiki_crawler.py:53-59);
    # the match is case-insensitive on the site NAME, not the URL
    assert select_transport("Vikidia FR", default, bypass) is bypass
    assert select_transport("vikidia-en", default, bypass) is bypass
    # other sites keep the default session even when a bypass exists
    assert select_transport("Wikipedia FR", default, bypass) is default
    # bypass unavailable (CURL_CFFI_AVAILABLE=False, ref :16-21) → default
    assert select_transport("Vikidia FR", default, None) is default
    assert select_transport(None, default, bypass) is default


def _search_batch(rows):
    return pa.table({
        "qid": pa.array([r[0] for r in rows], pa.int64()),
        "query": pa.array([r[1] for r in rows], pa.string()),
        "srlimit": pa.array([r[2] for r in rows], pa.int64()),
    })


def test_wiki_search_stage_ranking_snippet_and_quirks():
    from raycrawl.sources.mediawiki import (
        CorpusWikiSearchAPI, WikiSearchStage, build_search_snippet)

    api = CorpusWikiSearchAPI(
        page_ids=[0, 1, 2, 3],
        titles=["Zero", "One", "Two", "Three"],
        texts=["cat cat cat", "cat cat dog", "a cat", "dog only"],
    )
    calls = []

    def spy(params):
        calls.append(dict(params))
        return api(params)

    st = WikiSearchStage(spy, "https://fr.vikidia.org/wiki/index.php",
                         "Vikidia", api_url="https://fr.vikidia.org/w/api.php")
    out = st(_search_batch([(7, "cat", 2)]))
    # pageid 0 tops the server's srlimit=2 response but is falsy → dropped
    # client-side AFTER the limit (ref :140-143), so only one row survives —
    # the reference does not refill the limit
    assert out["id"].to_pylist() == ["wiki_1"]
    assert out["url"].to_pylist()[0].endswith("?curid=1")
    assert out["title"].to_pylist() == ["One"]
    # at srlimit=3 the next page by (occ desc, pageid asc) appears
    out3 = st(_search_batch([(7, "cat", 3)]))
    assert out3["id"].to_pylist() == ["wiki_1", "wiki_2"]
    assert out["excerpt"].to_pylist()[0] == (
        '<span class="searchmatch">cat</span> cat dog')
    assert out["lang"].to_pylist() == ["fr"]  # detected from api_url
    assert out["site"].to_pylist() == ["Vikidia"]
    assert out["source"].to_pylist() == ["wiki"]
    assert out["score"].to_pylist() == [1.0]
    # request protocol (ref :118-126)
    assert calls[0]["list"] == "search" and calls[0]["srsearch"] == "cat"
    assert calls[0]["srprop"] == "snippet|titlesnippet"
    assert calls[0]["origin"] == "*"
    # case-insensitive match, snippet preserves original casing
    assert build_search_snippet("The Cat sat", "cat").startswith(
        '<span class="searchmatch">Cat</span>')


def test_wiki_search_stage_malformed_and_missing_fields():
    from raycrawl.sources.mediawiki import WikiSearchStage

    def bad_api(params):
        q = params["srsearch"]
        if q == "boom":
            return {}                                     # malformed → no rows
        if q == "partial":
            return {"query": {"search": [
                {"pageid": 5},                            # no title → skipped
                {"title": "NoId"},                        # no pageid → skipped
                {"pageid": 6, "title": "Ok", "snippet": "s"},
            ]}}
        return {"query": {}}                              # no 'search' key

    st = WikiSearchStage(bad_api, "https://s", "S", lang="en")
    out = st(_search_batch([(0, "boom", 5), (1, "partial", 5), (2, "other", 5)]))
    assert out["id"].to_pylist() == ["wiki_6"]
    assert out["qid"].to_pylist() == [1]
    assert out["excerpt"].to_pylist() == ["s"]


# ---------------------------------------------------------------- sitemap


def test_parse_sitemap_urlset_and_index():
    from raycrawl.sources.sitemap import parse_sitemap

    ns = 'xmlns="http://www.sitemaps.org/schemas/sitemap/0.9"'
    kind, ents = parse_sitemap(
        f'<urlset {ns}><url><loc> https://a/1 </loc>'
        f'<lastmod>2026-02-03</lastmod></url>'
        f'<url><loc>https://a/2</loc></url>'
        f'<url><lastmod>2026-01-01</lastmod></url></urlset>')
    assert kind == "urlset"
    # loc whitespace stripped; missing-loc entry skipped; missing lastmod ''
    assert ents == [("https://a/1", "2026-02-03"), ("https://a/2", "")]

    kind2, ents2 = parse_sitemap(
        f'<sitemapindex {ns}><sitemap><loc>https://a/sm1.xml</loc>'
        f'</sitemap></sitemapindex>')
    assert kind2 == "sitemapindex" and ents2 == [("https://a/sm1.xml", "")]

    import pytest
    with pytest.raises(ValueError):
        parse_sitemap("<rss></rss>")


def test_parse_sitemap_refuses_entities_and_oversize():
    """r4 ADVICE: sitemap XML arrives from arbitrary hosts and parses on
    the driver — DTD/entity declarations (billion-laughs vector) and
    over-cap documents must be refused, well-formed sitemaps unaffected."""
    import pytest
    from raycrawl.sources.sitemap import MAX_SITEMAP_BYTES, parse_sitemap

    bomb = (
        '<?xml version="1.0"?>'
        '<!DOCTYPE lolz [<!ENTITY lol "lol">'
        '<!ENTITY lol2 "&lol;&lol;&lol;&lol;&lol;&lol;&lol;&lol;&lol;&lol;">'
        ']>'
        "<urlset><url><loc>https://a/&lol2;</loc></url></urlset>"
    )
    with pytest.raises(ValueError, match="entity|DTD|doctype|refused"):
        parse_sitemap(bomb)
    # a bare DOCTYPE (no entities) is refused too — sitemaps never need one
    with pytest.raises(ValueError):
        parse_sitemap("<!DOCTYPE urlset SYSTEM 'http://evil/x.dtd'>"
                      "<urlset></urlset>")
    with pytest.raises(ValueError, match="cap"):
        parse_sitemap(b"<urlset>" + b" " * MAX_SITEMAP_BYTES + b"</urlset>")


def test_negative_samples_rejects_single_doc(ray_session):
    """r4 ADVICE: with n_docs == 1 the collision bump (raw+1) % n would
    return the anchor itself — guard with a ValueError."""
    import pytest
    import ray.data as rd
    from raycrawl.ops.sampling import negative_samples

    ds = rd.from_arrow(pa.table({"doc_id": pa.array([0], pa.int64())}))
    with pytest.raises(ValueError, match="n_docs=1"):
        negative_samples(ds, n_docs=1)


def test_expand_sitemap_tree_recursion_cycle_and_guard():
    import pytest
    from raycrawl.sources.sitemap import expand_sitemap_tree

    site = {
        "https://a/sitemap.xml":
            '<sitemapindex><sitemap><loc>https://a/sm1.xml</loc></sitemap>'
            '<sitemap><loc>https://a/sm2.xml</loc></sitemap>'
            # cycle back to the root: must not loop
            '<sitemap><loc>https://a/sitemap.xml</loc></sitemap>'
            '</sitemapindex>',
        "https://a/sm1.xml":
            '<urlset><url><loc>https://a/p1</loc>'
            '<lastmod>2026-05-01</lastmod></url></urlset>',
        "https://a/sm2.xml":
            '<urlset><url><loc>https://a/p2</loc></url></urlset>',
    }
    out = expand_sitemap_tree(lambda u: site[u], "https://a/sitemap.xml")
    assert out == [("https://a/p1", "2026-05-01"), ("https://a/p2", "")]
    with pytest.raises(ValueError):
        expand_sitemap_tree(lambda u: site[u], "https://a/sitemap.xml",
                            max_sitemaps=2)


def test_sitemap_entries_and_changed_since(ray_session):
    import ray.data as rd
    from raycrawl.sources.sitemap import (changed_since,
                                          sitemap_entries_batch)

    blobs = rd.from_arrow(pa.table({
        "host": ["h1", "h2"],
        "sitemap_xml": [
            '<urlset><url><loc>https://h1/a</loc>'
            '<lastmod>2026-03-31</lastmod></url>'
            '<url><loc>https://h1/b</loc>'
            '<lastmod>2026-04-01</lastmod></url></urlset>',
            '<urlset><url><loc>https://h2/c</loc></url></urlset>',
        ],
    }))
    ents = blobs.map_batches(sitemap_entries_batch, batch_format="pyarrow")
    kept = changed_since(ents, "2026-04-01").to_pandas()
    # 03-31 dropped; 04-01 kept (>=); unknown lastmod kept
    assert sorted(kept["url"]) == ["https://h1/b", "https://h2/c"]

    import pytest
    with pytest.raises(Exception):
        # index blob in the distributed tier is a hard error
        rd.from_arrow(pa.table({
            "host": ["h"], "sitemap_xml": [
                '<sitemapindex><sitemap><loc>x</loc></sitemap>'
                '</sitemapindex>']})).map_batches(
            sitemap_entries_batch, batch_format="pyarrow").take_all()


def test_discover_from_robots_and_crawl_integration(ray_session):
    """Sitemap autodiscovery feeds the live wave engine: robots.txt
    advertises a sitemap index, its urlsets name orphan pages no link
    reaches, and a crawl seeded from the discovery visits exactly them."""
    import sys as _sys

    from ray import cloudpickle

    from raycrawl.pipeline import CrawlConfig, CrawlEngine
    from raycrawl.robots import make_robots_fetcher
    from raycrawl.sources.sitemap import discover_from_robots
    from tests.test_livefetch import DictTransport

    cloudpickle.register_pickle_by_value(_sys.modules["tests.test_livefetch"])

    host = "smap.example.org"
    pages = {
        f"https://{host}/orphan/{i}": (
            f"<html><body><p>orphan page {i} with enough text to clear "
            f"the fifty character stub filter easily</p></body></html>"
            .encode(), None, "text/html")
        for i in range(3)
    }
    idx = dict(pages)
    idx[f"https://{host}/robots.txt"] = (
        f"User-agent: *\nAllow: /\nSitemap: https://{host}/sitemap.xml\n"
        .encode(), None, "text/plain")
    idx[f"https://{host}/sitemap.xml"] = (
        (f'<sitemapindex><sitemap><loc>https://{host}/sm-0.xml</loc>'
         f'</sitemap></sitemapindex>').encode(), None, "application/xml")
    idx[f"https://{host}/sm-0.xml"] = (
        ('<urlset xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">'
         + "".join(f"<url><loc>https://{host}/orphan/{i}</loc>"
                   f"<lastmod>2026-0{i + 1}-01</lastmod></url>"
                   for i in range(3)) + "</urlset>").encode(),
        None, "application/xml")

    tr = DictTransport(idx)
    robots_fetcher = make_robots_fetcher(tr)

    def fetch(url):
        return tr(url, {}, 10.0).body

    seeds = discover_from_robots(robots_fetcher, fetch, [host])
    assert [(u, lm) for _, u, lm in seeds] == [
        (f"https://{host}/orphan/{i}", f"2026-0{i + 1}-01")
        for i in range(3)]

    # crawl the discovered urls over the live tier: all three orphans are
    # visited and indexed even though nothing links to them
    from raycrawl.fixtures import SiteSpec

    sites = [SiteSpec(name=f"sm{i}", crawl=u, depth=0, delay=0.0)
             for i, (_, u, _) in enumerate(seeds)]
    r = CrawlEngine(None, sites, cfg=CrawlConfig(mode="wave"),
                    transport=tr).run()
    assert sorted(d["url"] for d in r.docs.to_pylist()) == sorted(pages)


def test_cse_search_stage_reference_parity(ray_session):
    """r4 (VERDICT missing #4 / S12): the live-GET CSE client through an
    injectable transport — request params, md5(link) ids, num capped at
    10, pagemap.cse_image parsing with missing-src skip, empty-items
    path (cse_client.py:98-220)."""
    import hashlib

    import ray.data as rd
    from raycrawl.ops.searchapi import CseSearchStage

    calls = []

    def api(params):
        calls.append(dict(params))
        if params["q"] == "none":
            return {}
        assert params["safe"] == "active"
        assert params["lr"] == "lang_en"
        return {"items": [
            {"link": "https://a.org/x", "title": "X", "snippet": "sx",
             "displayLink": "a.org",
             "pagemap": {"cse_image": [{"src": None}, {"nope": 1},
                                       {"src": "https://a.org/i.png"}]}},
            {"title": "no link -> skipped"},
            {"link": "https://b.org/y", "title": "Y", "snippet": "sy",
             "displayLink": "b.org"},
        ]}

    # drive the stage callable directly (the api-call capture lives in this
    # process; the actor-pool plumbing itself is exercised by q_cse_search's
    # oracle-gated driver query)
    stage = CseSearchStage(api)
    tbl = pa.table({
        "qid": pa.array([0, 1], pa.int64()),
        "query": pa.array(["hash", "none"], pa.string()),
        "lang": pa.array(["en", "en"], pa.string()),
        "num": pa.array([25, 10], pa.int64()),
    })
    out = (stage(tbl).to_pandas()
           .sort_values(["qid", "url"]).reset_index(drop=True))
    assert len(out) == 2  # linkless item skipped, 'none' query empty
    assert (out["qid"] == 0).all()
    a = out.iloc[0]
    assert a["id"] == hashlib.md5(b"https://a.org/x").hexdigest()
    assert a["img_url"] == "https://a.org/i.png" and a["n_images"] == 1
    assert out.iloc[1]["n_images"] == 0 and out.iloc[1]["img_url"] == ""
    assert (out["source"] == "google_cse").all()
    # num capped at 10 in the request (ref :162)
    hash_calls = [c for c in calls if c["q"] == "hash"]
    assert hash_calls and all(c["num"] == 10 for c in hash_calls)
