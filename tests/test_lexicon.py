from mobius_rag_tpu.query.lexicon import Lexicon, LexiconEntry
from mobius_rag_tpu.testing import sample_lexicon


def test_sample_lexicon_loads():
    lex = sample_lexicon()
    assert lex.tag_count("j") >= 5
    assert lex.tag_count("d") >= 8
    assert lex.num_phrases > 20


def test_expand_matches_payer_and_domain():
    lex = sample_lexicon()
    exp = lex.expand(
        "What is the timely filing deadline for Sunshine Health FL Medicaid claims?"
    )
    assert "j:payor.sunshine_health" in exp.matched_codes
    assert "d:claims.timely_filing" in exp.matched_codes
    assert "timely filing" in exp.expansion_phrases
    # j-tag slots carry binary doc credit markers
    j_slots = [s for s in exp.phrase_slots if s[2] >= 0]
    assert j_slots, "expected j-tag slots"


def test_expand_alias_matches():
    lex = sample_lexicon()
    exp = lex.expand("DME prior auth for molina")
    codes = set(exp.matched_codes)
    assert "d:benefits.dme" in codes
    assert "d:utilization_management.prior_authorization" in codes
    assert "j:payor.molina" in codes
    # expansion contains the canonical strong phrase for the alias
    assert "durable medical equipment" in exp.expansion_phrases


def test_single_word_stoplist_suppressed():
    lex = Lexicon([
        LexiconEntry(kind="d", code="x.generic", phrases=["coverage"]),
        LexiconEntry(kind="d", code="y.speczz", phrases=["specializedterm"]),
    ])
    assert lex.expand("what coverage applies").matched_codes == []
    assert lex.expand("specializedterm question").matched_codes == ["d:y.speczz"]


def test_entry_cap():
    entries = [
        LexiconEntry(kind="d", code=f"c.t{i}", phrases=[f"term{i}"]) for i in range(20)
    ]
    lex = Lexicon(entries, max_entries_per_query=12)
    q = " ".join(f"term{i}" for i in range(20))
    assert len(lex.expand(q).matched_codes) == 12


def test_word_boundary_matching():
    lex = Lexicon([LexiconEntry(kind="d", code="a.pa", phrases=["pa"])])
    assert lex.expand("pa required").matched_codes == ["d:a.pa"]
    assert lex.expand("paris trip").matched_codes == []
