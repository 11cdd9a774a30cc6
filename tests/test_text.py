from mobius_rag_tpu.query.text import hash_bucket, normalize_query, stem, tokenize


def test_normalize_strips_question_lead():
    q = ("how many days do I have to file an appeal a denied claim "
         "with Sunshine Health")
    n = normalize_query(q)
    assert not n.lower().startswith("how")
    assert "many" not in n.lower().split()
    assert "Sunshine" in n


def test_normalize_never_empty():
    assert normalize_query("how many") != ""


def test_stem_joins_inflections():
    assert stem("claims") == stem("claim")
    assert stem("filing") == stem("file") or stem("filing") == "fil"
    assert stem("denied") == stem("deny") or stem("denied").startswith("deni")
    assert stem("providers") == stem("provider")


def test_tokenize_drops_stopwords():
    toks = tokenize("what is the deadline for claims", drop_stopwords=True)
    assert "the" not in toks and "is" not in toks
    assert any(t.startswith("deadlin") for t in toks)


def test_hash_bucket_stable_and_bounded():
    assert hash_bucket("claim", 1024) == hash_bucket("claim", 1024)
    assert 0 <= hash_bucket("anything", 64) < 64
