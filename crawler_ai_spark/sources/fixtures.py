"""Deterministic synthetic crawl corpus (FIXTURES.md) — no external data.

Generates the ``pages`` table in exactly the driver's ``input_hint`` shape
(url STRING, warc_ts TIMESTAMP, html BINARY, text STRING, lang STRING) plus
``seeds`` and ``host_rules`` side tables, at three scales, under
``/root/repo/fixtures/{sf}``. Host page-counts follow a Zipf(α≈1.1)
distribution so one hot host dominates (the hot-host-skew scenario of
SURVEY.md W2). Seeded ``random.Random(42)``; every run is byte-identical.

The ``text`` column is this engine's canonical HTML→text output
(functions/textnorm.canonical_text — the reference pipeline of
job_extraction_service.py:1726-1737) computed at generation time; it is the
golden value for the byte-identical-text invariant.

HTML archetypes cover every extraction path in SURVEY.md §2 / FIXTURES.md §3:
homepage-with-nav, career listing (individual links / embedded cards /
table), job detail, contact/footer (with favicon-email + NBSP-phone traps),
hidden-jobs JSON, sitemap.xml, pagination, blog noise, vi mirror.
"""

from __future__ import annotations

import datetime as dt
import math
import pathlib
import random

import pyarrow as pa
import pyarrow.parquet as pq

from crawler_ai_spark.functions.textnorm import canonical_text

FIXTURE_ROOT = pathlib.Path(__file__).resolve().parents[2] / "fixtures"
SF_SITES = {"sf0.001": 20, "sf0.01": 200, "sf0.1": 2000}
_BASE_TS = dt.datetime(2025, 6, 1, 0, 0, 0)

_JOB_SLUGS = [
    ("senior-java-developer", "Senior Java Developer", "Hà Nội", "15-20 triệu"),
    ("flutter-developer", "Flutter Developer", "Ho Chi Minh City", "1200 USD"),
    ("business-analyst", "Business Analyst", "Da Nang", "900 USD"),
    ("qa-engineer", "QA Engineer", "Hà Nội", "12 triệu"),
    ("devops-engineer", "DevOps Engineer", "Remote", "2000 USD"),
    ("frontend-developer", "Frontend Developer", "Hà Nội", "18 triệu"),
    ("backend-developer", "Backend Developer", "Ho Chi Minh City", "22 triệu"),
    ("data-engineer", "Data Engineer", "Singapore", "4500 USD"),
    ("product-manager", "Product Manager", "Hà Nội", "30 triệu"),
    ("ui-ux-designer", "UI UX Designer", "Remote", "16 triệu"),
    ("python-developer", "Python Developer", "Hà Nội", "20 triệu"),
    ("security-analyst", "Security Analyst", "Ho Chi Minh City", "25 triệu"),
]

_NAV = """<nav class="navbar">
<a href="/careers">Careers</a> <a href="/services">Services</a>
<a href="/blog">Blog</a> <a href="/products">Products</a>
<a href="#top">Top</a> <a href="javascript:void(0)">Menu</a>
</nav>"""


def _footer(host: str, idx: int) -> str:
    return f"""<footer class="site-footer">
<p>Contact us: <a href="mailto:hr@{host}">hr@{host}</a> info@{host}</p>
<p>Hotline: <a href="tel:+84 912 {300 + idx % 100:03d} 678">call</a> 09{idx % 10}2 345 67{idx % 10} </p>
<img src="/cropped-favicon@2x.png" alt="logo">
<a href="https://facebook.com/{host.split('.')[0]}">fb</a>
<a href="https://linkedin.com/company/{host.split('.')[0]}">li</a>
</footer>"""


def _page(title: str, body: str, host: str, idx: int, desc: str = "") -> str:
    meta = f'<meta name="description" content="{desc}">' if desc else ""
    return (
        f"<html><head><title>{title}</title>{meta}"
        f"<style>body {{ color: #222; }}</style>"
        f'<script>window.analytics = "{host}";</script></head>'
        f"<body>{_NAV}<header class=\"header\"><a href=\"/\">{host}</a></header>"
        f"{body}{_footer(host, idx)}</body></html>"
    )


def _homepage(host: str, company: str, idx: int) -> str:
    body = f"""<h1>Welcome to {company}</h1>
<p>{company} builds software platforms for logistics, retail and finance
customers across Southeast Asia. Our engineering teams ship cloud products
used by millions of people every day of the year.</p>
<p>We partner with enterprises to deliver data pipelines, mobile apps and
infrastructure automation with measurable outcomes and reliable support.</p>
<div class="menu"><a href="/careers">Join our team</a>
<a href="/tuyen-dung">Tuyển dụng</a></div>
<a href="/blog/2024/05/announcing-platform">Announcing our platform</a>
<a href="https://{host}/contact-page">Contact page</a>
<a href="https://other-site.example/partners">Partner site</a>"""
    return _page(f"{company} - Home", body, host, idx, f"{company} official website.")


def _careers_individual(host: str, company: str, idx: int, n_jobs: int) -> str:
    links = "\n".join(
        f'<article class="job-card"><a href="/careers/{slug}">{title}</a>'
        f"<span>{loc} · Full-time</span></article>"
        for slug, title, loc, _ in _JOB_SLUGS[:n_jobs]
    )
    body = f"""<h1>Open Positions at {company}</h1>
<p>Apply now to join our team. We are hiring across engineering and product.
Browse the current openings below and submit your application online.</p>
{links}
<a href="/careers?page=2">Next page</a>"""
    return _page(f"Careers - {company}", body, host, idx)


def _careers_cards(host: str, company: str, idx: int, n_jobs: int) -> str:
    cards = "\n".join(
        f"<div class='position-item'><h3>{title}</h3>\n"
        f"<p>Fulltime. Nơi làm việc: {loc}\nMức lương: {salary}\nApply now</p></div>"
        for _, title, loc, salary in _JOB_SLUGS[:n_jobs]
    )
    body = f"""<h1>Tuyển dụng - {company}</h1>
<p>Current openings. Work with us — we are hiring talented engineers.
Ứng tuyển ngay hôm nay để tham gia đội ngũ của chúng tôi.</p>
{cards}
<a href="/jobs/view/{100 + idx}">Apply fast</a>
<a href="/tuyen-dung/ky-su-{idx}">Ứng tuyển nhanh</a>"""
    return _page(f"Tuyển dụng | {company}", body, host, idx)


def _careers_table(host: str, company: str, idx: int, n_jobs: int) -> str:
    rows = "\n".join(
        f"<tr><td><a href='/careers/{slug}'>{title}</a></td><td>{loc}</td><td>{salary}</td></tr>"
        for slug, title, loc, salary in _JOB_SLUGS[:n_jobs]
    )
    body = f"""<h1>Job Openings</h1>
<p>View all jobs at {company}. Apply now — current openings listed below
with location and salary band for every open position this quarter.</p>
<table><tr><th>Position</th><th>Location</th><th>Salary</th></tr>{rows}</table>"""
    return _page(f"Jobs at {company}", body, host, idx)


def _job_detail(host: str, company: str, idx: int, slug: str, title: str, loc: str, salary: str) -> str:
    body = f"""<h1>{title}</h1>
<div class="content"><p>{company} is hiring a {title} to join our platform team.
You will design, build and operate distributed services processing millions of
requests per day. This is a full-time position based in {loc}.</p>
<p>Requirements: 3+ years of professional software engineering experience,
strong knowledge of algorithms and data structures, experience with cloud
infrastructure and CI/CD pipelines. English communication skills required.</p>
<p>Benefits: competitive salary, annual bonus, premium health insurance,
14 days paid leave, training budget and flexible hybrid working policy.</p>
<p>Mức lương: {salary}</p><p>Nơi làm việc: {loc}</p>
<p>Posted date: 2025-05-{(idx % 28) + 1:02d}</p>
<p>Apply now by sending your CV to <a href="mailto:hr@{host}">hr@{host}</a>.</p></div>
<a href="/careers">Back to careers</a>"""
    return _page(f"{title} - {company}", body, host, idx)


def _contact(host: str, company: str, idx: int) -> str:
    body = f"""<h1>Contact {company}</h1>
<p>Get in touch with our team. Head office: 12 Duy Tan Street, Cau Giay,
Hanoi, Vietnam. Business hours 9:00-18:00 Monday through Friday.</p>
<p>Phone: +84 24 3123 4567 or 0988.777.66{idx % 10}</p>
<p>Email: contact@{host}</p>"""
    return _page(f"Contact - {company}", body, host, idx)


def _blog(host: str, company: str, idx: int) -> str:
    body = f"""<h1>Announcing our new platform</h1>
<p>Today {company} announces the general availability of its data platform.
The release includes streaming ingestion, lakehouse storage and a query
engine with sub-second latency on terabyte-scale datasets for analytics.</p>
<a href="/blog/2024/04/previous-post">Previous post</a>"""
    return _page(f"Blog - {company}", body, host, idx)


def _services(host: str, company: str, idx: int) -> str:
    # /our-offices is this site's fetch-error page (status/message cycles
    # by rank — _ERROR_CYCLE); the path is keyword-neutral so linking it
    # changes no career score, only schedules the error URL
    body = f"""<h1>Services</h1>
<p>{company} offers consulting, managed cloud operations and bespoke software
delivery. Our services teams operate across three time zones with 24/7
support coverage and strict SLAs for enterprise customers worldwide.</p>
<a href="/our-offices">Our offices</a>"""
    return _page(f"Services - {company}", body, host, idx)


def _hidden_jobs(host: str, company: str, idx: int) -> str:
    body = f"""<h1>Opportunities</h1>
<p>Explore opportunities at {company}. Some roles are loaded dynamically by
script; see the embedded data island below for the machine-readable list.</p>
<script type="text/javascript">
var jobs = [{{"title": "Cloud Architect", "location": "Hà Nội", "type": "Full-time"}},
{{"title": "Mobile Developer", "location": "Remote", "type": "Contract"}}];
</script>
<div data-job='{{"title": "Site Reliability Engineer", "location": "Ho Chi Minh City"}}'>SRE</div>"""
    return _page(f"Opportunities - {company}", body, host, idx)


def _sitemap(host: str, n_jobs: int) -> str:
    locs = "\n".join(
        f"<loc>https://{host}/careers/{slug}</loc>" for slug, _, _, _ in _JOB_SLUGS[:n_jobs]
    )
    return (
        '<?xml version="1.0" encoding="UTF-8"?>\n'
        '<urlset xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">\n'
        f"<url><loc>https://{host}/</loc></url>\n<url>{locs}</url>\n"
        f"<url><loc>https://{host}/blog/2024/05/announcing-platform</loc></url>\n"
        "</urlset>"
    )


def _careers_page2(host: str, company: str, idx: int, n_jobs: int) -> str:
    extra = _JOB_SLUGS[n_jobs : min(n_jobs + 3, len(_JOB_SLUGS))]
    links = "\n".join(
        f'<article class="job-card"><a href="/careers/{slug}">{title}</a></article>'
        for slug, title, _, _ in extra
    )
    body = f"""<h1>Open Positions page 2</h1>
<p>More openings at {company}. Apply now for any position below; we are
hiring continuously and review every application within five working days.</p>
{links}"""
    return _page(f"Careers p2 - {company}", body, host, idx)


def _tuyen_dung(host: str, company: str, idx: int, n_jobs: int) -> str:
    cards = "\n".join(
        f"<div class='job-item'><h3>Tuyển {title}</h3>"
        f"<p>Toàn thời gian. Địa điểm: {loc}. Lương: {salary}. Ứng tuyển ngay.</p></div>"
        for _, title, loc, salary in _JOB_SLUGS[: max(2, n_jobs // 2)]
    )
    body = f"""<h1>Tuyển dụng</h1>
<p>{company} đang tuyển dụng nhiều vị trí. Cơ hội nghề nghiệp hấp dẫn,
môi trường làm việc chuyên nghiệp, chế độ đãi ngộ cạnh tranh cho ứng viên.</p>
{cards}"""
    return _page(f"Tuyển dụng - {company}", body, host, idx)


def _zipf_jobs(rank: int, n_sites: int) -> int:
    """Jobs per site, Zipf-ish: the rank-0 host is the hot host."""
    return max(2, min(len(_JOB_SLUGS), int(12 / ((rank + 1) ** 1.1))))


def generate_site(rank: int, n_sites: int) -> list[tuple[str, str, str]]:
    """Return [(url, html, lang)] for one synthetic site, document order."""
    host = f"site{rank}.example"
    company = f"Acme{rank}"
    n_jobs = _zipf_jobs(rank, n_sites)
    variant = rank % 3
    pages: list[tuple[str, str, str]] = []
    pages.append((f"https://{host}/", _homepage(host, company, rank), "en"))
    careers_html = (
        _careers_individual(host, company, rank, n_jobs)
        if variant == 0
        else _careers_cards(host, company, rank, n_jobs)
        if variant == 1
        else _careers_table(host, company, rank, n_jobs)
    )
    pages.append((f"https://{host}/careers", careers_html, "en"))
    for j, (slug, title, loc, salary) in enumerate(_JOB_SLUGS[:n_jobs]):
        pages.append(
            (
                f"https://{host}/careers/{slug}",
                _job_detail(host, company, rank * 31 + j, slug, title, loc, salary),
                "en",
            )
        )
    pages.append((f"https://{host}/contact-page", _contact(host, company, rank), "en"))
    pages.append((f"https://{host}/blog/2024/05/announcing-platform", _blog(host, company, rank), "en"))
    pages.append((f"https://{host}/services", _services(host, company, rank), "en"))
    if rank % 2 == 0:
        pages.append((f"https://{host}/hidden-jobs", _hidden_jobs(host, company, rank), "en"))
    if rank % 3 == 0:
        pages.append((f"https://{host}/careers?page=2", _careers_page2(host, company, rank, n_jobs), "en"))
    pages.append((f"https://{host}/sitemap.xml", _sitemap(host, n_jobs), "en"))
    if rank % 2 == 1:
        pages.append((f"https://{host}/tuyen-dung", _tuyen_dung(host, company, rank, n_jobs), "vi"))
    return pages


_SCHEMA = pa.schema(
    [
        ("url", pa.string()),
        ("warc_ts", pa.timestamp("us")),
        ("html", pa.binary()),
        ("text", pa.string()),
        ("lang", pa.string()),
        ("status", pa.int32()),
        ("fetch_error", pa.string()),
    ]
)

# bump when the generated corpus changes shape/content so stale fixture
# dirs regenerate instead of being reused
# v3: card career pages link reference-accepted job-URL shapes
# (/jobs/view/<id>, /tuyen-dung/ky-su-<n>) so the loop's F3 accept path
# (job_urls table) is exercised end-to-end
_FIXTURE_VERSION = 3

# per-site fetch-error rows (crawler.py:197-233 status ladder, :424-446
# message taxonomy): the services page links /our-offices, so the crawl
# reaches these URLs; html is NULL (fetch failed), the class cycles with
# site rank. Messages are the reference's own strings.
_ERROR_CYCLE: list[tuple[int | None, str]] = [
    (404, "Permanent error: HTTP 404 - Not Found"),
    (410, "Permanent error: HTTP 410 - Gone"),
    (503, "503 Service Unavailable - server overloaded"),
    (429, "429 Rate Limited - too many requests"),
    (403, "403 Forbidden - likely blocked by server"),
    (None, "Connection timeout to host"),
]


def generate(sf: str, root: pathlib.Path | None = None, force: bool = False) -> pathlib.Path:
    """Generate the fixture tables for one scale factor; idempotent."""
    n_sites = SF_SITES[sf]
    out_dir = (root or FIXTURE_ROOT) / sf
    marker = out_dir / "_GENERATED"
    if (
        marker.exists()
        and not force
        and marker.read_text().startswith(f"v={_FIXTURE_VERSION} ")
    ):
        return out_dir
    out_dir.mkdir(parents=True, exist_ok=True)
    rng = random.Random(42)  # reserved for future perturbations; keeps API stable

    urls: list[str] = []
    tss: list[dt.datetime] = []
    htmls: list[bytes | None] = []
    texts: list[str | None] = []
    langs: list[str | None] = []
    statuses: list[int | None] = []
    errors: list[str | None] = []
    seeds: list[str] = []
    hosts: list[str] = []
    row = 0
    for rank in range(n_sites):
        site_pages = generate_site(rank, n_sites)
        seeds.append(site_pages[0][0])
        hosts.append(f"site{rank}.example")
        for url, html, lang in site_pages:
            urls.append(url)
            tss.append(_BASE_TS + dt.timedelta(minutes=row))
            htmls.append(html.encode("utf-8"))
            texts.append(canonical_text(html))
            langs.append(lang)
            statuses.append(200)
            errors.append(None)
            row += 1
        # fetch-error row: linked from the services page, html-less
        status, msg = _ERROR_CYCLE[rank % len(_ERROR_CYCLE)]
        urls.append(f"https://site{rank}.example/our-offices")
        tss.append(_BASE_TS + dt.timedelta(minutes=row))
        htmls.append(None)
        texts.append(None)
        langs.append(None)
        statuses.append(status)
        errors.append(msg)
        row += 1

    pages_tbl = pa.Table.from_arrays(
        [
            pa.array(urls, pa.string()),
            pa.array(tss, pa.timestamp("us")),
            pa.array(htmls, pa.binary()),
            pa.array(texts, pa.string()),
            pa.array(langs, pa.string()),
            pa.array(statuses, pa.int32()),
            pa.array(errors, pa.string()),
        ],
        schema=_SCHEMA,
    )
    pq.write_table(pages_tbl, out_dir / "pages.parquet")

    seeds_tbl = pa.Table.from_pydict(
        {
            "seed_url": seeds,
            "max_pages": [50] * len(seeds),
            "max_career_pages": [10] * len(seeds),
        }
    )
    pq.write_table(seeds_tbl, out_dir / "seeds.parquet")

    host_rules_tbl = pa.Table.from_pydict(
        {
            "host": hosts,
            # reference disobeys robots (crawler_ai/settings.py:9) — default
            # empty; every 7th host gets a disallow to exercise the gate
            "disallow_prefixes": [
                ["/private", "/admin"] if i % 7 == 3 else [] for i in range(len(hosts))
            ],
            "crawl_delay_s": [1.0] * len(hosts),
        }
    )
    pq.write_table(host_rules_tbl, out_dir / "host_rules.parquet")

    marker.write_text(f"v={_FIXTURE_VERSION} sites={n_sites} rows={row}\n")
    return out_dir


def ensure_all(root: pathlib.Path | None = None) -> None:
    for sf in SF_SITES:
        generate(sf, root=root)


if __name__ == "__main__":
    ensure_all()
    for sf in SF_SITES:
        print(sf, (FIXTURE_ROOT / sf / "_GENERATED").read_text().strip())
