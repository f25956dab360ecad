"""DUST rule mining (operators/dust.py): LCP/LCS decomposition, digit
generalization, support filtering, star pairing bounds, and the
constant-rule applier. Cross-engine byte identity of the mined rules is
pinned by the catalog's dust_rules oracle row."""

from __future__ import annotations

from pyspark.sql import functions as F

from crawler_ai_spark.operators.dust import apply_dust_rules, mine_dust_rules


def _pages(spark, rows):
    return spark.createDataFrame(rows, "url string, text string")


def _mk(base_count=12, session=True, printv=True):
    rows = []
    for d in range(base_count):
        base = f"https://h{d % 3}.example.com/item/{d}"
        txt = f"content-{d}"
        rows.append((base, txt))
        if session:
            rows.append((base + f"?sid={d * 131 + 3}", txt))
        if printv and d % 2 == 0:
            rows.append((base + "/print", txt))
    return rows


def test_mines_constant_and_generalized_rules(spark):
    rules = {
        (r.rule_from, r.rule_to): r
        for r in mine_dust_rules(_pages(spark, _mk())).collect()
    }
    assert ("/print", "") in rules and rules[("/print", "")].support == 6
    # per-doc session values only aggregate through the '*' bucketing
    assert ("?sid=*", "") in rules and rules[("?sid=*", "")].support == 12
    assert rules[("?sid=*", "")].n_hosts == 3


def test_accidental_collisions_lack_support(spark):
    rows = _mk(session=False, printv=False)
    # one accidental same-content pair with unrelated paths
    rows += [
        ("https://h0.example.com/a/zzz", "acc"),
        ("https://h0.example.com/b/qqq", "acc"),
    ]
    rules = mine_dust_rules(_pages(spark, rows)).collect()
    assert rules == []  # nothing reaches min_support


def test_prefix_contained_variant(spark):
    # canon is a strict prefix of the variant: lcp consumes all of canon,
    # suffix must cap at 0 (no overlap), rule_to is the empty string
    rows = []
    for d in range(4):
        rows.append((f"https://h.example.com/p{d}", f"t{d}"))
        rows.append((f"https://h.example.com/p{d}/amp", f"t{d}"))
    rules = {(r.rule_from, r.rule_to) for r in mine_dust_rules(_pages(spark, rows)).collect()}
    assert ("/amp", "") in rules


def test_group_cap_bounds_pairs(spark):
    # 40 same-content variants on one host, cap 16: at most 15 pairs
    rows = [(f"https://h.example.com/v/{i}", "same") for i in range(40)]
    rules = mine_dust_rules(_pages(spark, rows), min_support=1, max_group=16).collect()
    assert sum(r.support for r in rules) == 15


def test_applier_constant_rules_only_and_specificity(spark):
    rules = spark.createDataFrame(
        [("/print", "", 10, 3), ("?sid=*", "", 10, 3), ("/print/long", "/l", 10, 3)],
        "rule_from string, rule_to string, support long, n_hosts long",
    )
    fr = spark.createDataFrame(
        [
            ("https://h/x/print/long",),
            ("https://h/x/print",),
            ("https://h/x?sid=99",),
        ],
        "url string",
    )
    got = {r.url: r.canonical_url for r in apply_dust_rules(fr, rules).collect()}
    # longest rule wins on the overlapping match; '*' rules stay advisory
    assert got["https://h/x/print/long"] == "https://h/x/l"
    assert got["https://h/x/print"] == "https://h/x"
    assert got["https://h/x?sid=99"] == "https://h/x?sid=99"


def test_applier_guards_block_coincidental_rules(spark):
    rules = spark.createDataFrame(
        [
            ("a", "", 10, 3),  # too short: would rewrite nearly every URL
            ("/print", "", 10, 1),  # single-host evidence: stays advisory
            ("/page", "/p", 10, 3),  # healthy rule
        ],
        "rule_from string, rule_to string, support long, n_hosts long",
    )
    fr = spark.createDataFrame(
        [
            ("https://h/a/page/all",),  # 'a' rule must NOT strip chars
            ("https://h/x/print",),  # 1-host rule must NOT fire
            ("https://h/page/page",),  # two occurrences: outside evidence
        ],
        "url string",
    )
    got = {r.url: r.canonical_url for r in apply_dust_rules(fr, rules).collect()}
    assert got["https://h/a/page/all"] == "https://h/a/p/all"
    assert got["https://h/x/print"] == "https://h/x/print"
    assert got["https://h/page/page"] == "https://h/page/page"
