"""Keyword / pattern constants reproduced verbatim from the reference.

Each list cites the reference file:line it reproduces (behavioral parity —
the reference treats these as the *semantics* of its classifiers, so they
must match exactly). They are plain Python tuples; in Spark plans they are
embedded as literal arrays (broadcast with the plan, never shuffled).

Reference: jayceho3203/crawler-ai at /root/reference (read-only).
"""

# ---------------------------------------------------------------------------
# Spider link filtering — app/services/scrapy_career_spider.py
# ---------------------------------------------------------------------------

# scrapy_career_spider.py:63-79
EXCLUDE_MENU_KEYWORDS = (
    "about", "about-us", "company", "team", "leadership",
    "contact", "contact-us", "support", "help",
    "marketing", "advertising", "seo", "sem", "social-media",
    "content", "blog", "news", "press", "media",
    "api", "documentation", "docs", "tutorial", "guide",
    "pricing", "plans", "features", "benefits",
    "privacy", "terms", "policy", "sitemap", "search",
    "login", "register", "signup", "dashboard",
)

# scrapy_career_spider.py:82-90 (re.match'd, i.e. anchored at start)
EXCLUDE_MENU_PATTERNS = (
    r".*/(about|company|team|leadership).*",
    r".*/(contact|support|help).*",
    r".*/(marketing|advertising|seo).*",
    r".*/(api|docs|documentation).*",
    r".*/(pricing|plans|features).*",
    r".*/(privacy|terms|policy).*",
    r".*/(login|register|signup).*",
)

# scrapy_career_spider.py:297-318 (substring rejects in is_valid_link)
NON_JOB_LINK_PATTERNS = (
    "google.com/maps", "facebook.com", "twitter.com", "linkedin.com",
    "youtube.com", "instagram.com", "tiktok.com",
    "/services/", "/service/", "/products/", "/product/",
    "/solutions/", "/solution/", "/portfolio/", "/about/",
    "/contact/", "/team/", "/company/", "/news/", "/blog/",
    "/press/", "/media/", "/investor/",
    "/dich-vu/", "/san-pham/", "/giai-phap/", "/gioi-thieu/",
    "/lien-he/", "/doi-ngu/", "/cong-ty/", "/tin-tuc/",
    "/bai-viet/", "/thong-cao/", "/truyen-thong/",
    "/privacy/", "/terms/", "/cookie/", "/sitemap/",
    "/search/", "/login/", "/register/", "/signup/",
    "/admin/", "/dashboard/", "/account/", "/profile/",
    ".jpg", ".jpeg", ".png", ".gif", ".svg", ".ico",
    ".css", ".js", ".woff", ".woff2", ".ttf", ".eot",
    ".xml", ".json", ".pdf", ".doc", ".docx",
)

# scrapy_career_spider.py:284 (prefix rejects)
INVALID_LINK_PREFIXES = ("#", "javascript:", "mailto:", "tel:")

# ---------------------------------------------------------------------------
# Priority bucketing — scrapy_career_spider.py:327-415 (prioritize_links)
# ---------------------------------------------------------------------------

# scrapy_career_spider.py:332-372
CAREER_KEYWORDS = (
    "tuyen-dung", "tuyển-dụng", "tuyendung",
    "viec-lam", "việc-làm", "vieclam",
    "co-hoi", "cơ-hội", "cohoi",
    "nhan-vien", "nhân-viên", "nhanvien",
    "ung-vien", "ứng-viên", "ungvien",
    "cong-viec", "công-việc", "congviec",
    "lam-viec", "làm-việc", "lamviec",
    "thu-viec", "thử-việc", "thuviec",
    "chinh-thuc", "chính-thức", "chinhthuc",
    "nghe-nghiep", "nghề-nghiệp", "nghenghiep",
    "tim-viec", "tìm-việc", "timviec",
    "dang-tuyen", "đang-tuyển", "dangtuyen",
    "career", "careers", "job", "jobs",
    "recruitment", "employment", "hiring",
    "work", "position", "opportunity", "vacancy",
    "apply", "application", "join-us",
    "team", "talent", "open-role", "open-roles",
    "we-are-hiring", "work-with-us", "join-our-team",
    "grow-with-us", "build-with-us", "create-with-us",
    "full-time", "part-time", "remote", "hybrid",
    "onsite", "on-site", "freelance", "contract",
    "internship", "intern", "graduate", "entry-level",
    "senior", "junior", "lead", "principal",
    "hr", "human-resource", "human-resources",
    "staff", "employee", "employees",
    "developer", "engineer", "analyst", "manager",
    "specialist", "consultant", "coordinator",
    "assistant", "director", "executive",
    "programmer", "designer", "architect",
    "tester", "qa", "quality-assurance",
    "devops", "admin", "administrator",
    "sales", "marketing", "business",
    "finance", "accounting", "legal",
    "support", "customer-service", "operations",
)

# scrapy_career_spider.py:375-380
NAV_KEYWORDS = (
    "about", "about-us", "company", "team", "contact",
    "services", "products", "solutions", "portfolio",
    "giới-thiệu", "công-ty", "đội-ngũ", "liên-hệ",
    "dịch-vụ", "sản-phẩm", "giải-pháp",
)

# scrapy_career_spider.py:383-386
CONTENT_KEYWORDS = (
    "news", "blog", "article", "press", "media",
    "tin-tức", "bài-viết", "thông-cáo", "truyền-thông",
)

# priority -> per-page link budget; scrapy_career_spider.py:185 / :482
# (max_links = 5 if priority == 100 else 3 if priority == 80 else 2)
PRIORITY_BUDGETS = {100: 5, 80: 3, 50: 2, 10: 2}
PRIORITY_LEVELS = (100, 80, 50, 10)

# stop conditions; app/api/routes.py:60, scrapy_career_spider.py:187,462
DEFAULT_MAX_PAGES = 50
DEFAULT_MAX_CAREER_PAGES = 10

# ---------------------------------------------------------------------------
# Career scoring — scrapy_career_spider.py:497-546 (calculate_career_score)
# ---------------------------------------------------------------------------

# scrapy_career_spider.py:508-512
CAREER_URL_INDICATORS = (
    "career", "careers", "job", "jobs", "recruitment", "employment",
    "tuyen-dung", "viec-lam", "co-hoi", "nhan-vien", "ung-vien",
    "cong-viec", "lam-viec", "thu-viec", "chinh-thuc", "nghe-nghiep",
)

# scrapy_career_spider.py:520-524
CAREER_TITLE_INDICATORS = (
    "career", "job", "recruitment", "employment", "hiring",
    "tuyển dụng", "việc làm", "cơ hội", "nhân viên", "ứng viên",
    "công việc", "làm việc", "thử việc", "chính thức", "nghề nghiệp",
)

# scrapy_career_spider.py:532-538
CAREER_CONTENT_INDICATORS = (
    "apply", "application", "submit", "join", "work with us",
    "position", "role", "opportunity", "vacancy", "opening",
    "hiring", "recruiting", "employment", "career opportunity",
    "ứng tuyển", "nộp đơn", "tham gia", "làm việc cùng chúng tôi",
    "vị trí", "cơ hội", "tuyển dụng", "việc làm",
)

CAREER_SCORE_THRESHOLD = 0.3  # scrapy_career_spider.py:439

# ---------------------------------------------------------------------------
# Career listing page classification — scrapy_career_spider.py:591-655
# ---------------------------------------------------------------------------

# scrapy_career_spider.py:588
HOMEPAGE_PATHS = ("/", "", "/index.html", "/index.php", "/default.html", "/default.php")

# scrapy_career_spider.py:614-619
JOB_DETAIL_INDICATORS = (
    "/career/", "/job/", "/position/", "/opportunity/",
    "/tuyen-dung/", "/viec-lam/", "/co-hoi/",
    "senior", "junior", "developer", "engineer", "analyst",
    "manager", "lead", "specialist", "consultant",
)

# scrapy_career_spider.py:627-632
CAREER_LISTING_INDICATORS = (
    "career.html", "careers.html", "job.html", "jobs.html",
    "tuyen-dung.html", "viec-lam.html", "co-hoi.html",
    "recruitment", "employment", "hiring", "join us",
    "work with us", "open positions", "current openings",
)

# scrapy_career_spider.py:640-644
CAREER_PATH_PATTERNS = (
    "/career", "/careers", "/jobs", "/positions", "/tuyen-dung",
    "/recruitment", "/vacancies", "/openings", "/opportunities",
    "/viec-lam", "/co-hoi", "/nhan-vien", "/ung-vien",
)

# scrapy_career_spider.py:652
CAREER_CONTENT_LISTING_HINTS = (
    "apply now", "view all jobs", "browse positions", "current openings",
)

# ---------------------------------------------------------------------------
# Job-URL classifier — scrapy_career_spider.py:828-953 (_is_job_url)
# ---------------------------------------------------------------------------

# scrapy_career_spider.py:835-838
JOB_URL_SKIP_PATTERNS = ("javascript:", "mailto:", "tel:", "#", "void(0)", "undefined", "null")
# scrapy_career_spider.py:845
JOB_URL_SKIP_FILES = ("sitemap.xml", "robots.txt", ".xml", ".json", ".pdf", ".doc", ".docx")
# scrapy_career_spider.py:859-863
CAREER_SUBDOMAINS = (
    "career.", "careers.", "jobs.", "job.", "work.", "employment.",
    "recruitment.", "hiring.", "talent.", "opportunities.",
    "tuyen-dung.", "viec-lam.", "co-hoi.",
)
# scrapy_career_spider.py:874-892
JOB_URL_PATTERNS = (
    "/job/", "/jobs/", "/position/", "/positions/", "/vacancy/", "/vacancies/",
    "/opportunity/", "/opportunities/", "/opening/", "/openings/",
    "/role/", "/roles/", "/posting/", "/postings/", "/listing/", "/listings/",
    "/tuyen-dung/", "/viec-lam/", "/co-hoi/", "/nhan-vien/", "/ung-vien/",
    "/cong-viec/", "/lam-viec/", "/thu-viec/", "/chinh-thuc/",
    "/nghe-nghiep/", "/tim-viec/", "/dang-tuyen/", "/vi-tri/",
    "/developer/", "/engineer/", "/analyst/", "/manager/", "/specialist/",
    "/consultant/", "/coordinator/", "/assistant/", "/director/", "/lead/",
    "/senior/", "/junior/", "/intern/", "/trainee/", "/graduate/",
    "/remote/", "/hybrid/", "/full-time/", "/part-time/", "/contract/",
    "/freelance/", "/temporary/", "/permanent/",
    "/apply/", "/application/", "/candidate/", "/applicant/",
)
# scrapy_career_spider.py:901-904
JOB_QUERY_PARAMS = (
    "id=", "job=", "position=", "vacancy=", "role=", "posting=",
    "search=", "q=", "keyword=", "title=", "location=",
)
# scrapy_career_spider.py:917-935
OBVIOUS_NON_JOB_PATTERNS = (
    "google.com/maps", "facebook.com", "twitter.com", "linkedin.com",
    "youtube.com", "instagram.com", "tiktok.com",
    ".jpg", ".jpeg", ".png", ".gif", ".svg", ".ico",
    ".css", ".js", ".woff", ".woff2", ".ttf", ".eot",
    "/admin/", "/dashboard/", "/login/", "/register/", "/signup/",
    "/privacy/", "/terms/", "/cookie/", "/sitemap/",
    "/about/", "/company/", "/team/", "/contact/", "/services/",
    "/products/", "/solutions/", "/portfolio/", "/news/", "/blog/",
    "/press/", "/media/", "/investor/", "/career/", "/careers/",
    "/gioi-thieu/", "/cong-ty/", "/doi-ngu/", "/lien-he/",
    "/dich-vu/", "/san-pham/", "/giai-phap/", "/tin-tuc/",
    "/bai-viet/", "/thong-cao/", "/truyen-thong/",
)

# job link text patterns; scrapy_career_spider.py:793-804
JOB_TEXT_PATTERNS = (
    "developer", "engineer", "analyst", "manager", "specialist",
    "consultant", "coordinator", "assistant", "director", "lead",
    "senior", "junior", "intern", "trainee", "graduate",
    "remote", "hybrid", "full-time", "part-time", "contract",
    "freelance", "temporary", "position", "role", "vacancy",
    "opening", "opportunity", "employment", "hiring",
    "tuyen-dung", "viec-lam", "co-hoi", "nhan-vien", "ung-vien",
    "cong-viec", "lam-viec", "thu-viec", "chinh-thuc",
    "nghe-nghiep", "tim-viec", "dang-tuyen", "vi-tri",
)

# ---------------------------------------------------------------------------
# Contact extraction — app/services/crawler.py, contact_extractor_service.py
# ---------------------------------------------------------------------------

# crawler.py:292-295 / scrapy_career_spider.py:964-967 (findall, IGNORECASE)
EMAIL_PATTERNS = (
    r"\b[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Z|a-z]{2,}\b",
    r"[a-zA-Z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Z|a-z]{2,}",
)
# contact_footer.py:15
FOOTER_EMAIL_PATTERN = r"[A-Z0-9._%+-]+@[A-Z0-9.-]+\.[A-Z]{2,}"

# crawler.py:309-312 (substring rejects applied to lowercased email)
EMAIL_INVALID_SUBSTRINGS = (
    "cropped-favicon", "favicon", ".png", ".jpg", ".jpeg", ".gif",
    "data:", "javascript:", "mailto:", "tel:", "http", "https",
)

# crawler.py:319-323 (naive VN phone patterns)
PHONE_PATTERNS_NAIVE = (
    r"\+84\s?\d{1,2}\s?\d{3}\s?\d{3}\s?\d{3}",
    r"0\d{1,2}\s?\d{3}\s?\d{3}\s?\d{3}",
    r"\d{10,11}",
)

# app/utils/text.py:40-42 / contact_footer.py:9-14 (strict Unicode-separator rx)
PHONE_WS_CLASS = r"\s\u00A0\u2000-\u200B"
PHONE_SEP_CLASS = rf"[{PHONE_WS_CLASS}\.\-\(\)]"
PHONE_SEP = rf"{PHONE_SEP_CLASS}*"
VN_PHONE_PATTERN = rf"(?<!\d)(?:\+?84|0)(?:{PHONE_SEP}\d){{8,10}}(?!\d)"

# contact_extractor_service.py:56-63
SOCIAL_PATTERNS = {
    "facebook": r"facebook\.com/[^/\s]+",
    "linkedin": r"linkedin\.com/(company|in)/[^/\s]+",
    "twitter": r"twitter\.com/[^/\s]+",
    "instagram": r"instagram\.com/[^/\s]+",
    "youtube": r"youtube\.com/(channel|c|user)/[^/\s]+",
    "github": r"github\.com/[^/\s]+",
}

# contact_footer.py:33-35 (footer node CSS cascade)
FOOTER_SELECTORS = (
    "footer", "[role=contentinfo]", "#footer", ".footer",
    ".site-footer", ".main-footer", ".bottom-footer",
)

# ---------------------------------------------------------------------------
# HTML→text canonical pipeline — job_extraction_service.py:1726-1737
# ---------------------------------------------------------------------------

# tags decomposed before get_text(); job_extraction_service.py:1726
TEXT_DECOMPOSE_TAGS = ("script", "style", "nav", "header", "footer", "aside", "noscript")
TEXT_TRUNCATE = 5000           # job_extraction_service.py:1737
TEXT_MIN_LENGTH = 50           # job_extraction_service.py:1736

# generic h1/h2 title rejects; job_extraction_service.py:1702-1703
GENERIC_TITLE_WORDS = ("home", "about", "contact", "career", "careers", "welcome", "blog", "news")

# ---------------------------------------------------------------------------
# Job field extraction — job_extraction_service.py
# ---------------------------------------------------------------------------

# job_type keyword cascades; job_extraction_service.py:1746-1757 (detail pages)
JOB_TYPE_DETAIL_RULES = (
    ("Full-time", ("full-time", "full time", "fulltime")),
    ("Part-time", ("part-time", "part time", "parttime")),
    ("Contract", ("contract", "contractor")),
    ("Internship", ("intern", "internship")),
    ("Remote", ("remote",)),
    ("Hybrid", ("hybrid",)),
)

# job_extraction_service.py:2393-2402 (card text; default Full-time)
JOB_TYPE_CARD_RULES = (
    ("Full-time", ("fulltime", "full-time", "toàn thời gian")),
    ("Part-time", ("part-time", "parttime", "bán thời gian")),
    ("Contract", ("contract", "hợp đồng")),
    ("Internship", ("intern", "thực tập")),
)

# job_extraction_service.py:2413-2418
LOCATION_LINE_PATTERNS = (
    r"nơi làm việc[:\s]+([^\n]+)",
    r"location[:\s]+([^\n]+)",
    r"địa điểm[:\s]+([^\n]+)",
    r"work location[:\s]+([^\n]+)",
)
# job_extraction_service.py:2424 (suffix cleanup on matched location)
LOCATION_CLEANUP_PATTERN = (
    r"(Download JD|Apply now|Xem Thêm|Số lượng tuyển|Junior|Senior|Tuyển gấp).*$"
)

# job_extraction_service.py:2437-2439 (card text)
SALARY_LINE_PATTERNS = (
    r"mức lương[:\s]+([^\n]+)",
    r"salary[:\s]+([^\n]+)",
    r"lương[:\s]+([^\n]+)",
)

# job_extraction_service.py:633-646 (description sweep)
SALARY_DESC_PATTERNS = (
    r"lương\s*up\s*to[:\s]*([^,\n]+)",
    r"lương[:\s]*([^,\n]+)",
    r"salary[:\s]*([^,\n]+)",
    r"up\s*to[:\s]*([^,\n]+)",
    r"(\d+[kKmM])",
    r"(\$\d+[kKmM]?)",
    r"(\d+\s*[tT]r[iỉ][eệ][uú])",
    r"(\d+\s*[mM]illion)",
    r"(\d{1,3}(?:,\d{3})*(?:\.\d{2})?)\s*(?:USD|VND|đồng|dollar)",
    r"(\d{1,3}(?:,\d{3})*(?:\.\d{2})?)\s*(?:triệu|million)",
    r"(\d{1,3}(?:,\d{3})*(?:\.\d{2})?)\s*(?:k|K)",
    r"(\d{1,3}(?:,\d{3})*(?:\.\d{2})?)\s*(?:USD|VND)",
)

# title suffix/prefix cleanup; job_extraction_service.py:2297-2299
TITLE_SUFFIX_CLEANUP = r"\s*(Singapore Only|Fully Remote|Remote|See Details|See)\s*$"
TITLE_PREFIX_CLEANUP = r"^com\s*"

# job-title predicate; job_extraction_service.py:2531-2544
JOB_TITLE_INDICATORS = (
    "developer", "engineer", "manager", "analyst", "specialist",
    "coordinator", "assistant", "director", "lead", "head", "chief",
    "architect", "consultant", "advisor", "expert", "professional",
    "programmer", "coder", "tester", "qa", "devops", "sre",
    "senior", "junior", "mid", "entry", "level", "principal", "staff",
    "associate", "executive", "vice", "deputy",
    "full-stack", "frontend", "backend", "mobile", "web",
    "data", "ai", "ml", "blockchain", "crypto", "fintech",
    "marketing", "sales", "hr", "finance", "legal", "operations",
    "python", "java", "javascript", "react", "vue", "angular",
    "node", "php", "c#", "dotnet", "ruby", "go", "rust",
    "aws", "azure", "gcp", "docker", "kubernetes",
)
# job_extraction_service.py:2547-2554
NON_JOB_TITLE_INDICATORS = (
    "health insurance", "working per week", "appreciation bonus",
    "competitive salary", "benefits", "human-centric", "culture",
    "work from home", "remote work", "flexible", "vacation",
    "sick leave", "maternity", "paternity", "retirement",
    "gym membership", "free lunch", "snacks", "coffee",
    "team building", "company events", "training", "education",
)

# fuzzy-dedup stopwords; job_extraction_service.py:2166
TITLE_COMMON_WORDS = ("the", "a", "an", "and", "or", "of", "in", "at", "to", "for", "with", "by")
# generic single-word titles dropped; job_extraction_service.py:2123
GENERIC_SINGLE_TITLES = ("engineer", "developer", "manager", "analyst", "assistant", "specialist")

# date formats; job_extraction_service.py:547-550
DATE_FORMATS = ("%Y-%m-%d", "%d/%m/%Y", "%m/%d/%Y", "%d-%m-%Y", "%Y/%m/%d", "%d.%m.%Y", "%Y.%m.%d")
# same list as Spark to_timestamp patterns (order preserved)
DATE_FORMATS_SPARK = ("yyyy-MM-dd", "dd/MM/yyyy", "MM/dd/yyyy", "dd-MM-yyyy", "yyyy/MM/dd", "dd.MM.yyyy", "yyyy.MM.dd")

# description summarize; job_extraction_service.py:1102-1118
DESCRIPTION_SUMMARY_LIMIT = 300

# pagination; job_extraction_service.py:446-449 / :267-321
PAGINATION_PARAMS = ("page=", "paged=", "p=", "pg=")
PAGINATION_MAX_PAGE = 10

# fetch cache semantics; app/services/cache.py:15, crawler.py:462,474
CACHE_TTL_SECONDS = 3600
CACHE_MIN_HTML_LEN = 500

# page size cap kept as a semantic predicate; scrapy_career_spider.py:105
MAX_PAGE_BYTES = 1024 * 1024


# ---------------------------------------------------------------------------
# F5 early-rejection + C2 detector score inputs — career_detector.py:56-267
# ---------------------------------------------------------------------------

# app/utils/constants.py:154-202
STRONG_NON_CAREER_INDICATORS = (
    'blog', 'news', 'article', 'post', 'story', 'tin-tuc', 'tin', 'bai-viet',
    'whitepaper', 'ebook', 'ebooks', 'guide', 'tutorial', 'manual',
    'documentation', 'case-study', 'case-studies', 'success-story',
    'testimonial', 'review', 'press', 'media', 'publication', 'research',
    'analysis', 'report', 'product', 'products', 'service', 'services',
    'solution', 'solutions', 'about', 'contact', 'company', 'team',
    'leadership', 'investor', 'partnership', 'partners', 'client',
    'customer', 'enterprise', 'industry', 'market', 'business', 'commercial',
    'trade', 'technology', 'tech', 'digital', 'transformation',
    'implementation', 'deployment', 'development', 'deploy', 'successfully',
    'application', 'software', 'platform', 'system', 'infrastructure',
    'architecture', 'api', 'sdk', 'framework', 'library', 'tool', 'tools',
    'webinar', 'conference', 'workshop', 'training', 'certification',
    'event', 'events', 'seminar', 'meetup', 'summit', 'forum', 'award',
    'recognition', 'milestone', 'achievement', 'celebration', 'login',
    'register', 'signup', 'signin', 'account', 'profile', 'dashboard',
    'panel', 'admin', 'control', 'manage', 'settings', 'user', 'member',
    'community', 'forum', 'support', 'help', 'cart', 'checkout', 'payment',
    'order', 'purchase', 'buy', 'shop', 'store', 'marketplace', 'pricing',
    'price', 'cost', 'fee', 'home', 'main', 'index', 'search', 'filter',
    'sort', 'category', 'tag', 'author', 'privacy', 'terms', 'policy',
    'legal', 'sitemap', 'rss', 'feed', 'subscribe', 'newsletter',
    'doanh-nghiep', 'khach-hang', 'doi-tac', 'san-pham', 'dich-vu',
    'giai-phap', 'cong-nghe', 'chuyen-gia', 'kinh-nghiem', 'du-an',
    'nghien-cuu', 'phan-tich', 'bao-cao', 'tai-lieu', 'huong-dan',
    'thanh-cong', 'danh-gia', 'nhan-xet', 'cam-nhan', 'chia-se', 'su-kien',
    'hoi-thao', 'dao-tao', 'chung-chi', 'giai-thuong', 'dang-nhap',
    'dang-ky', 'tai-khoan', 'quan-ly', 'cai-dat', 'gio-hang', 'thanh-toan',
    'dat-hang', 'mua-hang', 'cua-hang', 'trang-chu', 'tim-kiem', 'danh-muc',
    'the', 'tac-gia', 'quyen-rieng-tu', 'dieu-khoan', 'chinh-sach',
    'phap-ly',
)

# app/utils/constants.py:8-60 (career_detector scoring keywords)
CAREER_KEYWORDS_VI = (
    'tuyen-dung', 'tuyển-dụng', 'tuyendung', 'viec-lam', 'việc-làm',
    'vieclam', 'co-hoi', 'cơ-hội', 'cohoi', 'nhan-vien', 'nhân-viên',
    'nhanvien', 'tuyen', 'tuyển', 'ung-vien', 'ứng-viên', 'ungvien',
    'cong-viec', 'công-việc', 'congviec', 'lam-viec', 'làm-việc', 'lamviec',
    'moi', 'mời', 'thu-viec', 'thử-việc', 'thuviec', 'chinh-thuc',
    'chính-thức', 'chinhthuc', 'nghe-nghiep', 'nghề-nghiệp', 'nghenghiep',
    'co-hoi-nghe-nghiep', 'cơ-hội-nghề-nghiệp', 'cohoinghenghiep',
    'tim-viec', 'tìm-việc', 'timviec', 'dang-tuyen', 'đang-tuyển',
    'dangtuyen', 'tuyen-dung-nhan-vien', 'tuyển-dụng-nhân-viên',
    'tuyendungnhanvien', 'tuyen-dung-developer', 'tuyển-dụng-developer',
    'tuyendungdeveloper', 'tuyen-dung-engineer', 'tuyển-dụng-engineer',
    'tuyendungengineer', 'tuyen-dung-analyst', 'tuyển-dụng-analyst',
    'tuyendunganalyst', 'tuyen-dung-manager', 'tuyển-dụng-manager',
    'tuyendungmanager', 'tuyen-dung-designer', 'tuyển-dụng-designer',
    'tuyendungdesigner', 'tuyen-dung-tester', 'tuyển-dụng-tester',
    'tuyendungtester', 'tuyen-dung-qa', 'tuyển-dụng-qa', 'tuyendungqa',
    'tuyen-dung-devops', 'tuyển-dụng-devops', 'tuyendungdevops',
    'tuyen-dung-data', 'tuyển-dụng-data', 'tuyendungdata', 'tuyen-dung-ai',
    'tuyển-dụng-ai', 'tuyendungai', 'tuyen-dung-ml', 'tuyển-dụng-ml',
    'tuyendungml', 'tuyen-dung-ui', 'tuyển-dụng-ui', 'tuyendungui',
    'tuyen-dung-ux', 'tuyển-dụng-ux', 'tuyendungux', 'tuyen-dung-pm',
    'tuyển-dụng-pm', 'tuyendungpm', 'tuyen-dung-ba', 'tuyển-dụng-ba',
    'tuyendungba', 'tuyen-dung-scrum', 'tuyển-dụng-scrum', 'tuyendungscrum',
    'tuyen-dung-agile', 'tuyển-dụng-agile', 'tuyendungagile', 'developer',
    'dev', 'programmer', 'engineer', 'software', 'tech', 'technology', 'it',
    'career', 'job', 'recruitment', 'employment', 'work', 'position',
    'opportunity', 'vacancy', 'apply', 'application', 'hiring', 'join-us',
    'team', 'talent', 'careers', 'jobs', 'open-role', 'open-roles',
    'we-are-hiring', 'work-with-us', 'join-our-team', 'grow-with-us',
    'build-with-us', 'create-with-us', 'innovate-with-us', 'full-time',
    'part-time', 'remote', 'hybrid', 'onsite', 'on-site', 'freelance',
    'contract', 'internship', 'intern', 'graduate', 'entry-level', 'senior',
    'junior', 'lead', 'principal', 'frontend', 'front-end', 'backend',
    'back-end', 'fullstack', 'full-stack', 'mobile', 'web', 'data', 'ai',
    'ml', 'machine-learning', 'devops', 'qa', 'test', 'testing', 'ui', 'ux',
    'design', 'product',
)

# app/utils/constants.py:215-233
CAREER_EXACT_PATTERNS = (
    '/tuyen-dung', '/tuyển-dụng', '/tuyendung', '/viec-lam', '/việc-làm',
    '/vieclam', '/co-hoi', '/cơ-hội', '/cohoi', '/nhan-vien', '/nhân-viên',
    '/nhanvien', '/ung-vien', '/ứng-viên', '/ungvien', '/cong-viec',
    '/công-việc', '/congviec', '/lam-viec', '/làm-việc', '/lamviec', '/moi',
    '/mời', '/thu-viec', '/thử-việc', '/thuviec', '/chinh-thuc',
    '/chính-thức', '/chinhthuc', '/nghe-nghiep', '/nghề-nghiệp',
    '/nghenghiep', '/co-hoi-nghe-nghiep', '/cơ-hội-nghề-nghiệp',
    '/cohoinghenghiep', '/tim-viec', '/tìm-việc', '/timviec', '/dang-tuyen',
    '/đang-tuyển', '/dangtuyen', '/career', '/careers', '/job', '/jobs',
    '/hiring', '/recruitment', '/employment', '/vacancy', '/vacancies',
    '/opportunity', '/opportunities', '/position', '/positions', '/apply',
    '/application', '/applications', '/join-us', '/joinus', '/work-with-us',
    '/workwithus', '/open-role', '/open-roles', '/openrole', '/openroles',
    '/we-are-hiring', '/wearehiring', '/talent', '/team',
)

# career_detector.py:69-75 (note the bare '/\d{4}' — any 4-digit run)
EARLY_DATE_PATTERNS = (r"/\d{4}[/-]\d{1,2}[/-]\d{1,2}", r"/\d{4}/\d{1,2}", r"/\d{1,2}/\d{4}", r"/\d{4}")
# career_detector.py:80-85 (note '[a-f0-9]{4,}' catches hex-looking words)
EARLY_ID_PATTERNS = (r"/[a-f0-9]{8,}", r"/\d{5,}", r"/[a-z0-9]{10,}", r"/[a-f0-9]{4,}")
# career_detector.py:91-93
EARLY_FILE_EXTENSIONS = (
    ".pdf", ".doc", ".docx", ".xls", ".xlsx", ".ppt", ".pptx", ".jpg",
    ".jpeg", ".png", ".gif", ".mp4", ".avi", ".zip", ".xml", ".json",
    ".txt", ".csv", ".html", ".htm")
# career_detector.py:100 (depth limit) / constants.py:260
EARLY_MAX_PATH_DEPTH = 2
# career_detector.py:148-157
EARLY_JOB_DETAIL_INDICATORS = (
    "/job/", "/jobs/", "/position/", "/career/", "/opportunity/", "/vacancy/",
    "/apply/", "/application/", "/tuyen-dung/", "/viec-lam/", "/co-hoi/",
    "/ung-vien/", "/cong-viec/")
# career_detector.py:166-171 (C2 high), :187-194 (medium), :173-180 + :216-222 (subpage excl.)
C2_HIGH_PRIORITY_PATTERNS = (
    "/tuyen-dung", "/tuyển-dụng", "/tuyendung", "/career", "/careers",
    "/job", "/jobs", "/recruitment", "/hiring", "/employment")
C2_MEDIUM_PRIORITY_PATTERNS = (
    "/viec-lam", "/việc-làm", "/vieclam", "/co-hoi", "/cơ-hội", "/cohoi",
    "/nhan-vien", "/nhân-viên", "/nhanvien", "/ung-vien", "/ứng-viên",
    "/ungvien", "/position", "/positions", "/opportunity", "/vacancy",
    "/vacancies", "/apply")
C2_NON_CAREER_SUBPAGES = (
    "/careers/our-culture", "/careers/benefits", "/careers/recruitment-process",
    "/careers/training-courses", "/careers/opening-positions",
    "/careers/career-your-benefits", "/careers/team", "/careers/leadership",
    "/careers/company", "/careers/about", "/careers/contact",
    "/careers/partnership", "/careers/investor")
# career_detector.py:232-236
C2_QUERY_PARAMS = ("job", "career", "position", "hiring", "recruitment", "apply")
# career_detector.py:239-241
C2_CLEAN_PATHS = ("/career", "/careers", "/job", "/jobs", "/tuyen-dung", "/viec-lam")
# career_detector.py:247-250
C2_NON_CAREER_KEYWORDS = ("blog", "news", "article", "product", "service", "about", "contact")
# app/utils/constants.py:254
C2_ACCEPT_THRESHOLD = 8

# career_detector.py:102-137 (rule 6 path list)
EARLY_NON_CAREER_PATHS = (
    '/services/', '/service/', '/products/', '/product/', '/solutions/',
    '/solution/', '/about/', '/contact/', '/news/', '/blog/', '/article/',
    '/post/', '/events/', '/event/', '/webinar/', '/conference/',
    '/training/', '/certification/', '/workshop/', '/case-study/',
    '/case-studies/', '/success-story/', '/testimonial/', '/review/',
    '/whitepaper/', '/ebook/', '/ebooks/', '/guide/', '/tutorial/',
    '/documentation/', '/manual/', '/api/', '/sdk/', '/framework/',
    '/library/', '/tool/', '/tools/', '/platform/', '/system/',
    '/infrastructure/', '/architecture/', '/deployment/', '/implementation/',
    '/login/', '/register/', '/signup/', '/signin/', '/account/',
    '/profile/', '/dashboard/', '/panel/', '/admin/', '/control/',
    '/manage/', '/settings/', '/cart/', '/checkout/', '/payment/', '/order/',
    '/purchase/', '/buy/', '/shop/', '/store/', '/marketplace/', '/pricing/',
    '/price/', '/cost/', '/fee/', '/search/', '/filter/', '/sort/',
    '/category/', '/tag/', '/author/', '/privacy/', '/terms/', '/policy/',
    '/legal/', '/sitemap/', '/rss/', '/feed/', '/subscribe/', '/newsletter/',
    '/dich-vu/', '/san-pham/', '/giai-phap/', '/tin-tuc/', '/bai-viet/',
    '/su-kien/', '/hoi-thao/', '/dao-tao/', '/chung-chi/', '/giai-thuong/',
    '/thanh-cong/', '/danh-gia/', '/nhan-xet/', '/cam-nhan/', '/chia-se/',
    '/dang-nhap/', '/dang-ky/', '/tai-khoan/', '/quan-ly/', '/cai-dat/',
    '/gio-hang/', '/thanh-toan/', '/dat-hang/', '/mua-hang/', '/cua-hang/',
    '/trang-chu/', '/tim-kiem/', '/danh-muc/', '/the/', '/tac-gia/',
    '/quyen-rieng-tu/', '/dieu-khoan/', '/chinh-sach/', '/phap-ly/',
)


# ---------------------------------------------------------------------------
# C3 — URL career confidence (career_pages_service.py:328-476)
# ---------------------------------------------------------------------------

# :383 — 8 exact keywords, +1.0 each (substring in path)
C3_EXACT_KEYWORDS = ('career', 'careers', 'jobs', 'employment', 'tuyen-dung', 'viec-lam', 'co-hoi-nghe-nghiep', 'tuyen-nhan-vien')
# :389 — generic keywords, +0.3 each (segment/dash/slash-bounded-ish)
C3_GENERIC_KEYWORDS = ('dev', 'software', 'tech', 'ml', 'ai', 'testing', 'it', 'digital')
# :399-406 — career patterns, +1.2 each ('/careers' matches '/career' AND '/careers' AND '/careers/')
C3_CAREER_PATTERNS = (
    '/career', '/careers', '/jobs', '/employment', '/tuyen-dung', '/viec-lam', '/co-hoi-nghe-nghiep', '/tuyen-nhan-vien', '/tuyendung', '/vieclam', '/cohoi', '/tuyennhanvien', '/recruitment', '/hiring', '/opportunities', '/positions', '/vacancies', '/openings', '/join-us', '/work-with-us', '/careers/', '/tuyen-dung/', '/viec-lam/', '/hop-tac-tuyen-dung')

# career_pages_service.py:28-32 — CAREER_KEYWORDS_VI + extras (duplicates kept: they double-count)
C3_DOMAIN_KEYWORDS = (
    'tuyen-dung', 'tuyển-dụng', 'tuyendung', 'viec-lam', 'việc-làm',
    'vieclam', 'co-hoi', 'cơ-hội', 'cohoi', 'nhan-vien', 'nhân-viên',
    'nhanvien', 'tuyen', 'tuyển', 'ung-vien', 'ứng-viên', 'ungvien',
    'cong-viec', 'công-việc', 'congviec', 'lam-viec', 'làm-việc', 'lamviec',
    'moi', 'mời', 'thu-viec', 'thử-việc', 'thuviec', 'chinh-thuc',
    'chính-thức', 'chinhthuc', 'nghe-nghiep', 'nghề-nghiệp', 'nghenghiep',
    'co-hoi-nghe-nghiep', 'cơ-hội-nghề-nghiệp', 'cohoinghenghiep',
    'tim-viec', 'tìm-việc', 'timviec', 'dang-tuyen', 'đang-tuyển',
    'dangtuyen', 'tuyen-dung-nhan-vien', 'tuyển-dụng-nhân-viên',
    'tuyendungnhanvien', 'tuyen-dung-developer', 'tuyển-dụng-developer',
    'tuyendungdeveloper', 'tuyen-dung-engineer', 'tuyển-dụng-engineer',
    'tuyendungengineer', 'tuyen-dung-analyst', 'tuyển-dụng-analyst',
    'tuyendunganalyst', 'tuyen-dung-manager', 'tuyển-dụng-manager',
    'tuyendungmanager', 'tuyen-dung-designer', 'tuyển-dụng-designer',
    'tuyendungdesigner', 'tuyen-dung-tester', 'tuyển-dụng-tester',
    'tuyendungtester', 'tuyen-dung-qa', 'tuyển-dụng-qa', 'tuyendungqa',
    'tuyen-dung-devops', 'tuyển-dụng-devops', 'tuyendungdevops',
    'tuyen-dung-data', 'tuyển-dụng-data', 'tuyendungdata', 'tuyen-dung-ai',
    'tuyển-dụng-ai', 'tuyendungai', 'tuyen-dung-ml', 'tuyển-dụng-ml',
    'tuyendungml', 'tuyen-dung-ui', 'tuyển-dụng-ui', 'tuyendungui',
    'tuyen-dung-ux', 'tuyển-dụng-ux', 'tuyendungux', 'tuyen-dung-pm',
    'tuyển-dụng-pm', 'tuyendungpm', 'tuyen-dung-ba', 'tuyển-dụng-ba',
    'tuyendungba', 'tuyen-dung-scrum', 'tuyển-dụng-scrum', 'tuyendungscrum',
    'tuyen-dung-agile', 'tuyển-dụng-agile', 'tuyendungagile', 'developer',
    'dev', 'programmer', 'engineer', 'software', 'tech', 'technology', 'it',
    'career', 'job', 'recruitment', 'employment', 'work', 'position',
    'opportunity', 'vacancy', 'apply', 'application', 'hiring', 'join-us',
    'team', 'talent', 'careers', 'jobs', 'open-role', 'open-roles',
    'we-are-hiring', 'work-with-us', 'join-our-team', 'grow-with-us',
    'build-with-us', 'create-with-us', 'innovate-with-us', 'full-time',
    'part-time', 'remote', 'hybrid', 'onsite', 'on-site', 'freelance',
    'contract', 'internship', 'intern', 'graduate', 'entry-level', 'senior',
    'junior', 'lead', 'principal', 'frontend', 'front-end', 'backend',
    'back-end', 'fullstack', 'full-stack', 'mobile', 'web', 'data', 'ai',
    'ml', 'machine-learning', 'devops', 'qa', 'test', 'testing', 'ui', 'ux',
    'design', 'product', 'career', 'careers', 'jobs', 'employment',
    'work-with-us', 'join-us', 'opportunities', 'vacancies', 'positions',
    'tuyen-dung', 'viec-lam', 'co-hoi', 'tuyen-nhan-vien',
)

# career_pages_service.py:34-37 — JOB_BOARD_DOMAINS + extras (dupes kept; set order irrelevant: all +0.5)
C3_JOB_BOARDS = (
    '123job.vn', 'angel.co', 'careerbuilder.vn', 'careerlink.vn', 'dice.com',
    'github.com/jobs', 'glassdoor.com', 'indeed.com', 'jobstreet.vn',
    'linkedin.com/jobs', 'monster.com', 'mywork.com.vn', 'remote.co',
    'simplyhired.com', 'stackoverflow.com/jobs', 'timviec365.vn', 'topcv.vn',
    'vietnamworks.com', 'weworkremotely.com', 'ziprecruiter.com', 'jobs.vn',
    'careerlink.vn', 'topcv.vn', 'mywork.vn', 'indeed.com',
    'linkedin.com/jobs', 'glassdoor.com',
)

# :441-461 — penalties in dict (insertion) order; reason set when <= -0.5
C3_PENALTIES = (
    ('/product', -0.5), ('/service', -0.5), ('/news', -0.4), ('/blog', -0.4),
    ('/blogs', -0.4), ('/post', -0.4), ('/posts', -0.4), ('/article', -0.4),
    ('/insights', -0.4), ('/showcase', -0.4), ('/case-', -0.4), ('/about', -0.3),
    ('/contact', -0.3), ('/admin', -0.8), ('/login', -0.8), ('sitemap.xml', -1.0),
    ('robots.txt', -1.0), ('.xml', -0.8), ('.json', -0.8),
)


# ---------------------------------------------------------------------------
# C7 — job analyzers (job_analyzer.py:54-388; app/utils/job_constants.py)
# ---------------------------------------------------------------------------

# job_constants.py TECHNOLOGY_KEYWORDS (category order preserved)
TECHNOLOGY_KEYWORDS = (
    ('PROGRAMMING_LANGUAGES', ('javascript', 'js', 'typescript', 'ts', 'python', 'java', 'c#', 'c++', 'php', 'ruby', 'go', 'rust', 'swift', 'kotlin', 'scala', 'r', 'matlab')),
    ('FRONTEND_FRAMEWORKS', ('react', 'angular', 'vue', 'svelte', 'next.js', 'nuxt', 'gatsby', 'ember', 'backbone', 'jquery', 'bootstrap', 'tailwind')),
    ('BACKEND_FRAMEWORKS', ('node.js', 'express', 'django', 'flask', 'laravel', 'spring', 'asp.net', 'rails', 'fastapi', 'gin', 'echo')),
    ('DATABASES', ('mysql', 'postgresql', 'mongodb', 'redis', 'elasticsearch', 'cassandra', 'dynamodb', 'firebase', 'supabase', 'sqlite')),
    ('CLOUD_PLATFORMS', ('aws', 'azure', 'google cloud', 'gcp', 'heroku', 'digitalocean', 'linode', 'vultr', 'cloudflare', 'vercel', 'netlify')),
    ('DEVOPS_TOOLS', ('docker', 'kubernetes', 'jenkins', 'gitlab', 'github actions', 'terraform', 'ansible', 'prometheus', 'grafana', 'elk stack')),
    ('MOBILE_FRAMEWORKS', ('react native', 'flutter', 'xamarin', 'ionic', 'cordova', 'native android', 'native ios', 'swift', 'kotlin')),
)

# job_constants.py JOB_LEVEL_PATTERNS (first-match order)
JOB_LEVEL_PATTERNS = (
    ('JUNIOR', ('junior\\s+\\w+', 'entry\\s*level', 'beginner', 'fresh', 'graduate', 'new\\s+grad', 'recent\\s+graduate', '0-2\\s+years', '1-3\\s+years')),
    ('MIDDLE', ('middle\\s+\\w+', 'mid\\s*level', 'intermediate', 'mid\\s+level', '3-5\\s+years', '2-5\\s+years', '3-7\\s+years')),
    ('SENIOR', ('senior\\s+\\w+', 'experienced', 'advanced', 'expert', '5\\+\\s+years', '5-10\\s+years', '7\\+\\s+years')),
    ('LEAD', ('lead\\s+\\w+', 'team\\s+lead', 'technical\\s+lead', 'senior\\s+lead', 'leadership', 'team\\s+leader')),
    ('PRINCIPAL', ('principal\\s+\\w+', 'architect', 'specialist', 'consultant', 'expert\\s+level', 'senior\\s+specialist')),
)

# job_constants.py JOB_CATEGORIES (first-match order)
JOB_CATEGORIES = (
    ('ENGINEERING', ('software engineer', 'developer', 'programmer', 'coder', 'frontend developer', 'backend developer', 'full-stack developer', 'devops engineer', 'data engineer', 'machine learning engineer', 'mobile developer', 'qa engineer', 'test engineer', 'system administrator')),
    ('DESIGN', ('ui/ux designer', 'graphic designer', 'product designer', 'visual designer', 'interaction designer', 'user researcher', 'designer', 'creative designer')),
    ('MANAGEMENT', ('project manager', 'product manager', 'engineering manager', 'team lead', 'technical lead', 'scrum master', 'agile coach', 'program manager')),
    ('MARKETING', ('marketing specialist', 'digital marketing', 'content marketing', 'social media manager', 'seo specialist', 'growth hacker', 'brand manager')),
    ('SALES', ('sales representative', 'account manager', 'business development', 'sales manager', 'customer success', 'sales engineer')),
    ('DATA', ('data scientist', 'data analyst', 'business analyst', 'data engineer', 'machine learning engineer', 'statistician', 'research analyst')),
    ('HR', ('hr manager', 'recruiter', 'talent acquisition', 'hr specialist', 'people operations', 'hr coordinator', 'talent manager')),
    ('FINANCE', ('financial analyst', 'accountant', 'finance manager', 'controller', 'cfo', 'financial advisor', 'investment analyst')),
    ('OPERATIONS', ('operations manager', 'operations analyst', 'process improvement', 'supply chain', 'logistics', 'operations specialist')),
)


# ---------------------------------------------------------------------------
# F7 — rule-based job validation (job_extraction_service.py:1120-1279)
# ---------------------------------------------------------------------------

# job_extraction_service.py:1135-1148
F7_NON_JOB_URL_PATTERNS = (
    '/chinh-sach-bao-mat', '/privacy-policy', '/privacy',
    '/dieu-khoan-dich-vu', '/terms-of-service', '/terms', '/cookie-policy',
    '/cookies', '/legal', '/about', '/about-us', '/gioi-thieu', '/contact',
    '/lien-he', '/lien-lac', '/news', '/tin-tuc', '/blog', '/services',
    '/dich-vu', '/san-pham', '/products', '/home', '/homepage', '/trang-chu',
    '/login', '/register', '/sign-up', '/dang-nhap', '/dang-ky', '/en/',
    '/english/', '/lang/', '.jpg', '.png', '.gif', '.pdf', '.doc', '.docx',
)

# job_extraction_service.py:1176-1193
F7_CRITICAL_REJECT = (
    '404', 'not found', 'page not found', 'error', 'trang không tìm thấy',
    'privacy policy', 'chính sách bảo mật', 'terms of service',
    'điều khoản dịch vụ', 'cookie policy', 'chính sách cookie',
    'legal notice', 'thông báo pháp lý', 'about us', 'giới thiệu công ty',
    'company overview', 'tổng quan công ty', 'our story',
    'câu chuyện của chúng tôi', 'company history', 'lịch sử công ty',
    'our team', 'đội ngũ của chúng tôi', 'leadership team', 'ban lãnh đạo',
    'mission vision', 'tầm nhìn sứ mệnh', 'core values', 'giá trị cốt lõi',
    'contact us', 'liên hệ với chúng tôi', 'get in touch',
    'contact information', 'our services', 'dịch vụ của chúng tôi',
    'service portfolio', 'danh mục dịch vụ', 'our products',
    'sản phẩm của chúng tôi', 'product catalog', 'danh mục sản phẩm',
    'login', 'đăng nhập', 'register', 'đăng ký', 'sign up', 'sign in',
    'create account', 'tạo tài khoản', 'forgot password', 'quên mật khẩu',
)

# job_extraction_service.py:1201-1236
F7_POSITIVE_INDICATORS = (
    'responsibilities', 'requirements', 'qualifications', 'skills required',
    'job description', 'position summary', 'role overview',
    'what you will do', 'we are looking for', 'ideal candidate',
    'successful candidate', 'experience', 'years of experience', 'education',
    'degree', 'salary', 'compensation', 'benefits', 'package', 'bonus',
    'apply', 'application', 'submit cv', 'send resume', 'full-time',
    'part-time', 'contract', 'temporary', 'permanent', 'remote', 'hybrid',
    'on-site', 'work from home', 'developer', 'engineer', 'manager',
    'analyst', 'designer', 'specialist', 'coordinator', 'assistant',
    'executive', 'senior', 'junior', 'lead', 'principal', 'intern',
    'vacancy', 'opening', 'opportunity', 'hiring', 'trách nhiệm', 'yêu cầu',
    'kỹ năng', 'kinh nghiệm', 'mô tả công việc', 'vị trí tuyển dụng',
    'ứng viên lý tưởng', 'bạn sẽ làm gì', 'chúng tôi đang tìm kiếm',
    'học vấn', 'bằng cấp', 'chứng chỉ', 'lương', 'mức lương', 'phúc lợi',
    'chế độ đãi ngộ', 'ứng tuyển', 'nộp hồ sơ', 'gửi cv',
    'làm việc toàn thời gian', 'làm việc bán thời gian', 'hợp đồng',
    'thời vụ', 'làm việc từ xa', 'làm việc tại nhà', 'hybrid',
    'lập trình viên', 'kỹ sư', 'quản lý', 'phân tích', 'thiết kế',
    'chuyên viên', 'điều phối viên', 'trợ lý', 'giám đốc', 'cấp cao',
    'cấp thấp', 'trưởng nhóm', 'thực tập sinh', 'vị trí tuyển dụng',
    'cơ hội việc làm',
)

# job_extraction_service.py:1246-1258
F7_JOB_TITLE_KEYWORDS = (
    'assistant', 'designer', 'engineer', 'developer', 'manager', 'analyst',
    'specialist', 'coordinator', 'executive', 'intern', 'senior', 'junior',
    'lead', 'principal', 'administrative', 'ux', 'ui', 'full', 'stack',
    'frontend', 'backend', 'mobile', 'web', 'software', 'data', 'qa', 'test',
    'devops', 'product', 'marketing', 'sales', 'hr', 'finance', 'accounting',
    'legal', 'operations', 'support', 'customer', 'content', 'social',
    'digital', 'growth', 'business', 'strategy', 'consultant', 'advisor',
    'director', 'head', 'chief', 'vp', 'cfo', 'cto', 'ceo', 'management',
    'quản lý', 'nhân sự', 'hrm', 'thực tập sinh', 'intern', 'trainee',
    'chuyên viên', 'nhân viên', 'kế toán', 'accountant', 'trưởng phòng',
    'giám đốc', 'phó giám đốc', 'phân tích viên', 'trợ lý', 'assistant',
    'quản lý dự án', 'project management', 'phát triển kinh doanh',
    'business development', 'giải pháp', 'solution', 'triển khai',
    'delivery',
)

# job_extraction_service.py:1270 — borderline accept words
F7_BORDERLINE_TITLE_WORDS = ('tuyển dụng', 'hiring', 'job', 'position', 'developer', 'engineer', 'manager')
# :1166 — minimum description length
F7_MIN_DESCRIPTION_LEN = 30
