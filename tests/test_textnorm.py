"""Unit tests for the pure-Python parse core — the byte-parity layer.

Expected values are hand-derived from the reference pipeline's semantics
(BeautifulSoup(html,'html.parser') + the exact post-processing of
job_extraction_service.py:1726-1737 etc.), since bs4 is not installed in
this sandbox. Each case pins a bs4 behavior the scanner must reproduce:
no-separator text-node concatenation, entity decoding, comment exclusion,
subtree decompose, void-element handling.
"""

from crawler_ai_spark.functions import textnorm as T
from crawler_ai_spark.functions import urlrules as U


def test_canonical_text_decompose_and_collapse():
    html = """<html><head><title>T</title><script>x=1;</script>
    <style>.a{}</style></head><body>
    <nav>skip nav</nav><header>skip header</header>
    <p>Hello   world</p>
    <aside>skip aside</aside><noscript>skip ns</noscript>
    <p>Second &amp; third  paragraph with enough length to pass the fifty char minimum gate.</p>
    <footer>skip footer</footer></body></html>"""
    out = T.canonical_text(html)
    assert "skip" not in out
    assert out.startswith("T Hello world Second & third paragraph")
    # \s+ collapse leaves single spaces only
    assert "  " not in out


def test_canonical_text_adjacent_nodes_concatenate_without_separator():
    # bs4 get_text() inserts NO separator between adjacent elements
    html = "<h1>One</h1><h2>Two</h2><p>" + "x" * 60 + "</p>"
    out = T.canonical_text(html)
    assert out.startswith("OneTwo")


def test_canonical_text_short_content_empty():
    # <=50 chars → '' (job_extraction_service.py:1736)
    assert T.canonical_text("<p>short</p>") == ""


def test_canonical_text_truncates_at_5000():
    html = "<p>" + ("word " * 2000) + "</p>"
    assert len(T.canonical_text(html)) == 5000


def test_comments_excluded():
    html = "<p><!-- hidden comment -->visible " + "y" * 60 + "</p>"
    assert "hidden" not in T.canonical_text(html)


def test_title_and_meta():
    p = T.scan_html(
        '<head><title> Spaced &quot;Title&quot; </title>'
        '<meta name="description" content="Desc here."></head>'
    )
    assert p.title == 'Spaced "Title"'
    assert p.meta_description == "Desc here."


def test_heading_cascade_skips_generic_h1():
    p = T.scan_html("<h1>Welcome</h1><h1>Data Engineer</h1><h2>Other Role</h2>")
    assert T.pick_title_from_headings(p) == "Data Engineer"


def test_heading_cascade_h2_breaks_after_first_long_h2():
    # first h2 (len>3) is generic -> break WITHOUT taking the second h2
    p = T.scan_html("<h1>Hi</h1><h2>Contact page</h2><h2>Java Developer</h2>")
    assert T.pick_title_from_headings(p) == ""


def test_links_with_slots_in_document_order():
    p = T.scan_html(
        '<nav><a href="/a">A</a></nav><div class="menu"><a href="/m">M</a></div>'
        '<p><a href="/b">B</a></p><footer><a href="/f">F</a></footer>'
    )
    assert p.out_links == [
        ("/a", "nav", "A"),
        ("/m", "nav", "M"),
        ("/b", "body", "B"),
        ("/f", "footer", "F"),
    ]


def test_footer_contacts_tel_first_then_text_ordered_dedup():
    html = (
        "<footer>Hotline <a href='tel:+84 912 345 678'>call</a> "
        "or 0912.345.678 / 0988 777 665 — mail: HR@x.vn info@x.vn</footer>"
    )
    p = T.scan_html(html)
    phones, emails = T.footer_contacts(p)
    assert phones == ["0912345678", "0988777665"]
    assert emails == ["hr@x.vn", "info@x.vn"]


def test_phone_nbsp_and_zero_width_separators():
    # NBSP (\xa0) and zero-width space (​) are in the separator class
    text = "Gọi 09\xa012​345\xa0678 ngay"
    assert T.extract_phones_strict(text) == ["0912345678"]


def test_clean_phone_plus84_and_length_gate():
    assert T.clean_phone("+84 912-345-678") == "0912345678"
    assert T.clean_phone("123") is None
    assert T.clean_phone("012345678901") is None  # 12 digits


def test_email_rejects():
    html = "contact a@b.vn and favicon@2x.png-style junk cropped-favicon@site.com x@y.png"
    assert T.extract_emails(html) == ["a@b.vn"]


def test_summarize_description():
    assert T.summarize_description("short text") == "short text"
    long = ("Sentence one is here. " * 20).strip()  # > 300 chars with periods
    s = T.summarize_description(long)
    assert s.endswith(". ...")
    assert len(s) <= 304
    nospace = "x" * 400
    assert T.summarize_description(nospace) == "x" * 300 + " ..."


def test_urljoin_canonicalize():
    assert U.canonicalize("https://a.example/x/", "y") == "https://a.example/x/y"
    assert U.canonicalize("https://a.example/x", "/z#frag") == "https://a.example/z"
    assert U.canonicalize("https://a.example/", "?page=2") == "https://a.example/?page=2"
    assert U.canonicalize("https://a.example/", "//cdn.example/a") == "https://cdn.example/a"


def test_is_valid_link_reference_rules():
    d = "site1.example"
    assert U.is_valid_link("/careers", d)
    assert not U.is_valid_link("#top", d)
    assert not U.is_valid_link("javascript:void(0)", d)
    assert not U.is_valid_link("mailto:a@b.c", d)
    assert not U.is_valid_link("https://other.example/x", d)  # external
    assert U.is_valid_link(f"https://{d}/careers", d)
    assert not U.is_valid_link("/about", d)          # menu keyword
    assert not U.is_valid_link("/blog/post", d)      # menu keyword 'blog'
    assert not U.is_valid_link("/x.pdf", d)          # extension
    assert not U.is_valid_link("/services/", d)      # non-job pattern
    assert U.is_valid_link("/services", d)           # no trailing slash → passes


def test_link_priority_buckets():
    assert U.link_priority("/careers") == 100
    assert U.link_priority("/tuyen-dung") == 100
    assert U.link_priority("/services") == 80
    assert U.link_priority("/news-room") == 50
    assert U.link_priority("/misc") == 10


def test_is_job_url_cascade():
    assert U.is_job_url("https://careers.x.example/senior-dev")  # career subdomain w/ path
    assert not U.is_job_url("https://careers.x.example/")        # subdomain, no path
    assert U.is_job_url("https://x.example/jobs/123")            # /jobs/ pattern
    assert U.is_job_url("https://x.example/positions?id=7")      # query param
    assert U.is_job_url("https://x.example/opening/456")
    assert U.is_job_url("https://x.example/x/789")               # numeric tail
    assert not U.is_job_url("https://x.example/careers")         # generic tail
    assert not U.is_job_url("https://x.example/about/team")      # non-job pattern
    assert not U.is_job_url("mailto:x@y.z")
    assert not U.is_job_url("https://x.example/sitemap.xml")
    # '/careers/slug' hits the generic-career REJECT only when it ends there;
    # a slug path under /careers/ has no job pattern → falls through to False
    assert not U.is_job_url("https://x.example/page")            # short path


def test_career_listing_and_score():
    content = "apply now — current openings. join us and apply today"
    assert U.is_career_listing_page("https://x.example/careers", content, "careers")
    assert not U.is_career_listing_page("https://x.example/", content, "home")
    assert not U.is_career_listing_page(
        "https://x.example/careers/senior-java-developer", content, "job"
    )
    s = U.career_score("https://x.example/careers", "apply position hiring", "careers at x")
    # url hit 0.4 + title hit 0.3 + content: base .7 → one hit then break = 0.8
    assert abs(s - 0.8) < 1e-9


def test_company_from_url():
    assert U.company_from_url("https://www.skyvietnam.com.vn/x") == "Skyvietnam"
    assert U.company_from_url("https://ekotek.vn") == "Ekotek"
