"""Pure-Python text/HTML primitives shared by the Spark UDFs and the tests.

These reproduce the reference's row-level semantics exactly; the Spark side
wraps them in Arrow-batched pandas UDFs (see ``functions/html.py``), so this
module must stay import-light (stdlib only — the sandbox has no bs4, and the
reference's BeautifulSoup(html, 'html.parser') behavior is reproduced here
with the same underlying stdlib ``html.parser`` tokenizer that bs4's
HTMLParserTreeBuilder uses; entity handling matches because both rely on
``convert_charrefs=True``).

Reference semantics reproduced (file:line in /root/reference):
- canonical HTML→text: app/services/job_extraction_service.py:1726-1737
  (decompose script/style/nav/header/footer/aside/noscript; get_text();
  re.sub(r'\\s+', ' ', t).strip(); truncate [:5000] when len>50)
- title / meta description: app/services/crawler.py:330-386
- link extraction with nav/footer priority: scrapy_career_spider.py:211-262
- footer location + footer contacts: app/utils/contact_footer.py:30-83
- phone normalization: app/utils/text.py:48-55
- description summarize: job_extraction_service.py:1102-1118
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field
from html.parser import HTMLParser

from crawler_ai_spark import constants as K

# ---------------------------------------------------------------------------
# regex objects (compiled once per executor)
# ---------------------------------------------------------------------------

_WS_COLLAPSE = re.compile(r"\s+")
_PHONE_WS = re.compile(rf"[{K.PHONE_WS_CLASS}]+")
_VN_PHONE_RX = re.compile(K.VN_PHONE_PATTERN)
_FOOTER_EMAIL_RX = re.compile(K.FOOTER_EMAIL_PATTERN, re.I)
_EMAIL_RXS = [re.compile(p, re.IGNORECASE) for p in K.EMAIL_PATTERNS]
_NAIVE_PHONE_RXS = [re.compile(p) for p in K.PHONE_PATTERNS_NAIVE]
_NON_DIGIT_PLUS = re.compile(r"[^\d+]")
_NON_DIGIT = re.compile(r"\D")
_TAG_STRIP = re.compile(r"<[^>]+>")

# void elements per the HTML spec — html.parser reports them as start tags
_VOID_TAGS = frozenset(
    "area base br col embed hr img input link meta param source track wbr".split()
)

# class/id tokens the spider's nav CSS selectors target
# (scrapy_career_spider.py:218-235: nav/header tags + .navbar .menu
# .navigation .main-menu .top-menu .header .nav .main-nav .primary-nav
# .site-nav .page-nav .breadcrumb .menu-item .nav-item)
_NAV_CLASS_TOKENS = frozenset(
    (
        "navbar", "menu", "navigation", "main-menu", "top-menu", "header",
        "nav", "main-nav", "primary-nav", "site-nav", "page-nav",
        "breadcrumb", "menu-item", "nav-item",
    )
)
_FOOTER_CLASS_TOKENS = frozenset(("footer", "site-footer", "main-footer", "bottom-footer"))


def collapse_ws(text: str) -> str:
    """``re.sub(r'\\s+', ' ', t).strip()`` — job_extraction_service.py:1733."""
    return _WS_COLLAPSE.sub(" ", text).strip()


def normalize_unicode_ws(text: str) -> str:
    """Unicode-whitespace collapse — app/utils/text.py:44-46."""
    return _PHONE_WS.sub(" ", text or "").strip()


def clean_phone(candidate: str) -> str | None:
    """VN phone normalize — app/utils/text.py:48-55 (+84→0, keep 10-11 digits)."""
    s = _NON_DIGIT_PLUS.sub("", candidate or "")
    if s.startswith("+84"):
        s = "0" + s[3:]
    s = _NON_DIGIT.sub("", s)
    return s if 10 <= len(s) <= 11 else None


def strip_tags(text: str) -> str:
    """Job-title HTML strip — scrapy_career_spider.py:709-720."""
    if not text:
        return ""
    return collapse_ws(_TAG_STRIP.sub("", text))


# ---------------------------------------------------------------------------
# streaming HTML document scan
# ---------------------------------------------------------------------------


@dataclass
class PageParse:
    """Everything the engine extracts from one HTML document in one pass."""

    text: str = ""                    # canonical text (P2) — the byte-parity column
    full_text: str = ""               # get_text() without decompose (career scoring uses raw content)
    title: str = ""                   # <title> text, stripped (crawler.py:336-338)
    meta_description: str = ""        # meta[name=description] content (crawler.py:341-343)
    h1_texts: list[str] = field(default_factory=list)      # all h1 texts, doc order
    h2_texts: list[str] = field(default_factory=list)      # all h2 texts, doc order
    paragraphs: list[str] = field(default_factory=list)   # <p> texts (crawler.py:363-384)
    out_links: list[tuple[str, str, str]] = field(default_factory=list)
    # (href, slot, anchor_text); slot ∈ {nav, footer, body}; document order
    footer_text: str = ""             # footer node text (contact_footer.py:60)
    footer_tel_hrefs: list[str] = field(default_factory=list)  # a[href^=tel:] in footer
    script_texts: list[str] = field(default_factory=list)      # raw <script> bodies (S7 embedded JSON)


class _DocScanner(HTMLParser):
    """Single-pass scanner reproducing the reference's bs4 queries.

    Instead of materializing a DOM (bs4) we track open-tag state on a stack;
    for the well-formed pages this engine ingests this yields exactly
    ``soup.get_text()``-after-``decompose()`` output, because get_text() is
    document-order concatenation of text nodes and decompose() removes whole
    subtrees — both expressible as "skip text while inside tag X".
    """

    def __init__(self) -> None:
        super().__init__(convert_charrefs=True)
        self.out = PageParse()
        # depth counters for subtree-scoped behavior
        self._skip_depth = 0          # inside any TEXT_DECOMPOSE_TAGS subtree
        self._script_depth = 0
        self._style_depth = 0
        self._title_depth = 0
        self._h1_depth = 0
        self._h2_depth = 0
        self._p_depth = 0
        self._a_depth = 0
        self._nav_depth = 0
        self._footer_depth = 0
        self._stack: list[tuple[str, bool, bool, bool]] = []  # (tag, is_skip, is_nav, is_footer)
        self._text_parts: list[str] = []
        self._full_parts: list[str] = []
        self._footer_parts: list[str] = []
        self._title_parts: list[str] = []
        self._h1_parts: list[str] = []
        self._h2_parts: list[str] = []
        self._p_parts: list[str] = []
        self._a_parts: list[str] = []
        self._a_href: str | None = None
        self._a_slot: str = "body"
        self._script_parts: list[str] = []

    # -- helpers ------------------------------------------------------------

    @staticmethod
    def _ident_tokens(attrs: list[tuple[str, str | None]]) -> set[str]:
        toks: set[str] = set()
        for k, v in attrs:
            if k in ("class", "id") and v:
                toks.update(v.lower().split())
        return toks

    # -- tag events ----------------------------------------------------------

    def handle_starttag(self, tag, attrs):
        if tag in _VOID_TAGS:
            self._handle_void(tag, attrs)
            return
        toks = self._ident_tokens(attrs)
        is_skip = tag in K.TEXT_DECOMPOSE_TAGS
        is_nav = tag in ("nav", "header") or bool(toks & _NAV_CLASS_TOKENS)
        is_footer = tag == "footer" or bool(toks & _FOOTER_CLASS_TOKENS)
        self._stack.append((tag, is_skip, is_nav, is_footer))
        if is_skip:
            self._skip_depth += 1
        if is_nav:
            self._nav_depth += 1
        if is_footer:
            self._footer_depth += 1
        if tag == "script":
            self._script_depth += 1
        elif tag == "style":
            self._style_depth += 1
        elif tag == "title":
            self._title_depth += 1
        elif tag == "h1":
            self._h1_depth += 1
            self._h1_parts = []
        elif tag == "h2":
            self._h2_depth += 1
            self._h2_parts = []
        elif tag == "p":
            self._p_depth += 1
            self._p_parts = []
        elif tag == "a":
            self._a_depth += 1
            href = dict(attrs).get("href")
            self._a_href = href
            self._a_parts = []
            self._a_slot = (
                "nav" if self._nav_depth > 0 else "footer" if self._footer_depth > 0 else "body"
            )
            if href and self._footer_depth > 0 and href.lower().startswith("tel:"):
                self.out.footer_tel_hrefs.append(href)
        elif tag == "meta":  # non-void path unreachable; kept for symmetry
            pass

    def _handle_void(self, tag, attrs):
        if tag == "meta":
            d = dict(attrs)
            if (d.get("name") or "").lower() == "description" and not self.out.meta_description:
                self.out.meta_description = (d.get("content") or "").strip()

    def handle_startendtag(self, tag, attrs):
        self._handle_void(tag, attrs) if tag in _VOID_TAGS else None

    def handle_endtag(self, tag):
        if tag in _VOID_TAGS:
            return
        # pop up to the matching open tag (tolerates mild misnesting)
        for i in range(len(self._stack) - 1, -1, -1):
            if self._stack[i][0] == tag:
                for _ in range(len(self._stack) - i):
                    t, is_skip, is_nav, is_footer = self._stack.pop()
                    if is_skip:
                        self._skip_depth -= 1
                    if is_nav:
                        self._nav_depth -= 1
                    if is_footer:
                        self._footer_depth -= 1
                    if t == "script":
                        self._script_depth -= 1
                        body = "".join(self._script_parts)
                        if body.strip():
                            self.out.script_texts.append(body)
                        self._script_parts = []
                    elif t == "style":
                        self._style_depth -= 1
                    elif t == "title":
                        self._title_depth -= 1
                        if not self.out.title:
                            self.out.title = "".join(self._title_parts).strip()
                    elif t == "h1":
                        self._h1_depth -= 1
                        self.out.h1_texts.append("".join(self._h1_parts).strip())
                    elif t == "h2":
                        self._h2_depth -= 1
                        self.out.h2_texts.append("".join(self._h2_parts).strip())
                    elif t == "p":
                        self._p_depth -= 1
                        self.out.paragraphs.append("".join(self._p_parts).strip())
                    elif t == "a":
                        self._a_depth -= 1
                        if self._a_href is not None:
                            self.out.out_links.append(
                                (self._a_href, self._a_slot, "".join(self._a_parts).strip())
                            )
                        self._a_href = None
                break

    # -- text events -----------------------------------------------------------

    def handle_data(self, data):
        if self._script_depth > 0:
            self._script_parts.append(data)
            return
        if self._style_depth > 0:
            return
        self._full_parts.append(data)
        if self._skip_depth == 0:
            self._text_parts.append(data)
        if self._footer_depth > 0:
            self._footer_parts.append(data)
        if self._title_depth > 0:
            self._title_parts.append(data)
        if self._h1_depth > 0:
            self._h1_parts.append(data)
        if self._h2_depth > 0:
            self._h2_parts.append(data)
        if self._p_depth > 0:
            self._p_parts.append(data)
        if self._a_depth > 0:
            self._a_parts.append(data)

    # -- finish -----------------------------------------------------------------

    def result(self) -> PageParse:
        out = self.out
        out.text = "".join(self._text_parts)
        out.full_text = "".join(self._full_parts)
        # bs4 footer.get_text(" ", strip=True): strip each string, join by " "
        out.footer_text = " ".join(
            s.strip() for s in self._footer_parts if s.strip()
        )
        return out


def scan_html(html: str) -> PageParse:
    """Parse one document; never raises (parity with the reference's
    try/except-everything style — errors yield empty fields)."""
    scanner = _DocScanner()
    try:
        scanner.feed(html or "")
        scanner.close()
    except Exception:
        pass
    return scanner.result()


# ---------------------------------------------------------------------------
# reference row-level pipelines built on the scan
# ---------------------------------------------------------------------------


def canonical_text(html: str) -> str:
    """The byte-identical-text invariant (P2).

    job_extraction_service.py:1726-1737: decompose
    script/style/nav/header/footer/aside/noscript → get_text() →
    ``re.sub(r'\\s+', ' ', t).strip()`` → keep only if len>50 → ``[:5000]``.
    """
    raw = scan_html(html).text
    if not raw:
        return ""
    cleaned = collapse_ws(raw)
    if len(cleaned) > K.TEXT_MIN_LENGTH:
        return cleaned[: K.TEXT_TRUNCATE]
    return ""


def pick_title_from_headings(parse: PageParse) -> str:
    """h1-then-h2 title cascade — job_extraction_service.py:1696-1720.

    h1 loop: take the first h1 with len>3 whose lowercase doesn't contain a
    generic word (keeps scanning past rejected h1s). h2 fallback: only the
    FIRST h2 with len>3 is tested — the reference's h2 loop breaks
    unconditionally after it (:1720)."""
    for cand in parse.h1_texts:
        if cand and len(cand) > 3:
            if not any(g in cand.lower() for g in K.GENERIC_TITLE_WORDS):
                return cand
    for cand in parse.h2_texts:
        if cand and len(cand) > 3:
            if not any(g in cand.lower() for g in K.GENERIC_TITLE_WORDS):
                return cand
            break
    return ""


def page_description(parse: PageParse) -> str:
    """Meta-description cascade — crawler.py:340-384.

    meta[name=description]; else longest <p> over 100 chars; else first 5
    paragraphs (>50 chars each) concatenated until >300 chars."""
    description = parse.meta_description
    if description and len(description) >= 50:
        return description
    description = description or ""
    for p in parse.paragraphs:
        t = p.strip()
        if len(t) > 100 and len(t) > len(description):
            description = t
    if len(description) < 200:
        combined = ""
        for p in parse.paragraphs[:5]:
            t = p.strip()
            if len(t) > 50:
                combined = f"{combined} {t}".strip()
                if len(combined) > 300:
                    break
        if len(combined) > len(description):
            description = combined
    return description


def extract_emails(content: str) -> list[str]:
    """Email extraction — crawler.py:292-316 (two regexes, lowercase,
    substring rejects, set-dedup). Returns sorted for determinism (the
    reference's list(set()) order is hash-dependent; spider sorts at close,
    scrapy_career_spider.py:678)."""
    found: list[str] = []
    for rx in _EMAIL_RXS:
        found.extend(rx.findall(content or ""))
    valid = set()
    for email in found:
        email = email.strip().lower()
        if "@" in email and "." in email.split("@", 1)[1]:
            if not any(bad in email for bad in K.EMAIL_INVALID_SUBSTRINGS):
                valid.add(email)
    return sorted(valid)


def extract_phones_strict(text: str) -> list[str]:
    """Strict VN phone extraction — contact_footer.py:60-66 (normalize
    unicode ws → VN_PHONE_RX finditer → clean_phone → ordered dedup)."""
    text = normalize_unicode_ws(text or "")
    out: list[str] = []
    for m in _VN_PHONE_RX.finditer(text):
        n = clean_phone(m.group(0))
        if n and n not in out:
            out.append(n)
    return out


def extract_phones_naive(content: str) -> list[str]:
    """Naive phone extraction — crawler.py:319-327 (3 regexes, concat)."""
    phones: list[str] = []
    for rx in _NAIVE_PHONE_RXS:
        phones.extend(rx.findall(content or ""))
    return phones


def footer_contacts(parse: PageParse) -> tuple[list[str], list[str]]:
    """Footer-scoped contacts — contact_footer.py:47-83.

    tel: links first, then strict text phones, ordered-dedup merged;
    emails from the normalized footer text, first-seen order."""
    tel_nums: list[str] = []
    for href in parse.footer_tel_hrefs:
        n = clean_phone(href[4:])
        if n and n not in tel_nums:
            tel_nums.append(n)
    text = normalize_unicode_ws(parse.footer_text)
    text_nums: list[str] = []
    for m in _VN_PHONE_RX.finditer(text):
        n = clean_phone(m.group(0))
        if n and n not in text_nums:
            text_nums.append(n)
    phones = list(dict.fromkeys(tel_nums + text_nums))
    emails: list[str] = []
    for m in _FOOTER_EMAIL_RX.finditer(text):
        e = m.group(0).lower()
        if e not in emails:
            emails.append(e)
    return phones, emails


def summarize_description(description: str, max_length: int = K.DESCRIPTION_SUMMARY_LIMIT) -> str:
    """Description summarize (P12) — job_extraction_service.py:1102-1118.

    Collapse whitespace; ≤300 chars keep; else cut at the last '.' past 60%
    of the limit, else last space, and append ' ...'."""
    if not description:
        return ""
    text = collapse_ws(description)
    if len(text) <= max_length:
        return text
    cutoff = text[:max_length]
    period_pos = cutoff.rfind(".")
    if period_pos >= int(max_length * 0.6):
        return cutoff[: period_pos + 1].strip() + " ..."
    space_pos = cutoff.rfind(" ")
    if space_pos > 0:
        return cutoff[:space_pos].strip() + " ..."
    return cutoff.strip() + " ..."


# ---------------------------------------------------------------------------
# P3 — variant-B text (the "AI-extraction" feed)
# ---------------------------------------------------------------------------

_AI_DECOMPOSE_TAGS = frozenset({"script", "style", "nav", "header", "footer"})


class _AiTextScanner(HTMLParser):
    """Variant-B scanner: decompose script/style/nav/header/footer ONLY
    (job_extractor.py:260-262 — unlike canonical_text, aside/noscript are
    KEPT), then document-order text concatenation (get_text())."""

    def __init__(self) -> None:
        super().__init__(convert_charrefs=True)
        self._skip = 0
        self._stack: list[tuple[str, bool]] = []  # (tag, is_skip)
        self._parts: list[str] = []

    def handle_starttag(self, tag, attrs):
        if tag in _VOID_TAGS:
            return
        is_skip = tag in _AI_DECOMPOSE_TAGS
        self._stack.append((tag, is_skip))
        if is_skip:
            self._skip += 1

    def handle_startendtag(self, tag, attrs):
        pass

    def handle_endtag(self, tag):
        # same discipline as _DocScanner.handle_endtag: ignore end tags of
        # void elements (</br> must not pop a real entry) and pop up to the
        # MATCHING open tag — a blind pop flips the skip state on mildly
        # misnested HTML and diverges from bs4's tree-based decompose
        if tag in _VOID_TAGS:
            return
        for i in range(len(self._stack) - 1, -1, -1):
            if self._stack[i][0] == tag:
                for _ in range(len(self._stack) - i):
                    _t, was_skip = self._stack.pop()
                    if was_skip:
                        self._skip -= 1
                break

    def handle_data(self, data):
        if self._skip == 0:
            self._parts.append(data)

    def text(self) -> str:
        return "".join(self._parts)


def ai_text(html: str) -> str:
    """P3 — HTML→text variant B (job_extractor.py:257-269): decompose
    script/style/nav/header/footer, get_text(), then the reference's
    line/chunk cleanup: per-line strip, split each line on DOUBLE spaces,
    strip chunks, join the non-empty ones with single spaces."""
    scanner = _AiTextScanner()
    try:
        scanner.feed(html or "")
        scanner.close()
    except Exception:
        pass
    raw = scanner.text()
    lines = (line.strip() for line in raw.splitlines())
    chunks = (phrase.strip() for line in lines for phrase in line.split("  "))
    return " ".join(chunk for chunk in chunks if chunk)
