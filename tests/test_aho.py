"""Native vs Python Aho-Corasick equivalence + semantics."""
import pytest

from mobius_rag_tpu.ingest.aho import AhoCorasick

PATTERNS = ["prior authorization", "dme", "timely filing", "pa", "h0019",
            "durable medical equipment"]
TEXT = ("DME over $500 requires prior authorization (PA). H0019 residential "
        "treatment also needs preauthorization; see the timely filing table. "
        "Paris has no pa-perwork... durable medical equipment rentals.")


def test_native_builds():
    ac = AhoCorasick(PATTERNS)
    # the toolchain is baked into this image — native must load
    assert ac.is_native


def test_match_set_semantics():
    ac = AhoCorasick(PATTERNS)
    got = {PATTERNS[i] for i in ac.match_set(TEXT)}
    assert got == {"prior authorization", "dme", "timely filing", "pa",
                   "h0019", "durable medical equipment"}


def test_word_boundaries():
    ac = AhoCorasick(["pa"])
    assert ac.match_set("PA required") == {0}
    assert ac.match_set("paperwork in paris") == set()
    assert ac.match_set("(pa)") == {0}


def test_overlapping_patterns():
    ac = AhoCorasick(["medical equipment", "durable medical equipment"])
    assert ac.match_set("durable medical equipment list") == {0, 1}


def test_native_matches_python_fallback():
    native = AhoCorasick(PATTERNS)
    py = AhoCorasick(PATTERNS)
    py._native = False
    py._build_python()
    for text in [TEXT, "", "pa", "nothing relevant here", "dme dme dme PA"]:
        assert native.match_set(text) == py.match_set(text), text


def test_match_positions():
    ac = AhoCorasick(["ab", "abc"], word_boundary=False)
    pos = ac.match_positions("zabcz")
    # "ab" ends at byte 3, "abc" ends at byte 4
    assert (0, 3) in pos and (1, 4) in pos


def test_empty_patterns():
    ac = AhoCorasick([])
    assert ac.match_set("anything") == set()


def test_large_scale_consistency():
    pats = [f"term{i:04d} phrase" for i in range(500)]
    ac = AhoCorasick(pats)
    text = " ".join(f"term{i:04d} phrase" for i in range(0, 500, 7))
    assert ac.match_set(text) == set(range(0, 500, 7))
