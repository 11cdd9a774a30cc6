from mobius_rag_tpu.query.router import (RoutePreferences, Router, linear_features,
                                         linear_score)


def _features(**kw):
    base = {"query_class": "tight_pool", "canonicality": 0.0, "pool_size": 100,
            "has_literal": False, "has_j_payor_tag": True, "thematic_policy": False}
    base.update(kw)
    return base


def test_decide_returns_ordered_strategies():
    r = Router()
    d = r.decide(_features())
    assert d.strategy == d.order[0]
    assert set(d.order).issubset({"a", "b", "c", "d"})
    assert d.scores[d.order[0]] >= d.scores[d.order[-1]]
    assert d.priors_version


def test_vague_withdraws_low_recall_arms(tmp_path):
    """Withdrawal MECHANISM: arms whose effective score falls below the
    threshold are withdrawn. Pinned against a synthetic priors file —
    the live data/router_priors.json is calibration OUTPUT and moves
    with every derive_priors run (it did in round 5, which is why this
    test no longer hard-codes the shipped cells)."""
    import json

    from mobius_rag_tpu.query.router import _default_priors_path

    raw = json.load(open(_default_priors_path()))
    for sid in ("c", "d"):
        cell = raw["priors"][sid].setdefault(
            "vague", dict(next(iter(raw["priors"][sid].values()))))
        cell["accuracy"] = 0.01
        cell["recall_capacity"] = 0.01
        cell["accuracy_std"] = 0.02
    p = tmp_path / "priors.json"
    p.write_text(json.dumps(raw))
    r = Router(priors_path=str(p))
    d = r.decide(_features(query_class="vague"), RoutePreferences(accuracy_need=0.9))
    # c and d have ~0 effective recall on vague → withdrawn
    assert "c" in d.withdrawn and "d" in d.withdrawn


def test_high_accuracy_need_penalizes_variance():
    r = Router()
    lo = r.decide(_features(query_class="conceptual"), RoutePreferences(accuracy_need=0.5))
    hi = r.decide(_features(query_class="conceptual"), RoutePreferences(accuracy_need=1.0))
    # b has huge std on conceptual; its relative score must drop at high need
    rel_lo = lo.scores.get("b", 0) - lo.scores.get("a", 0)
    rel_hi = hi.scores.get("b", 0) - hi.scores.get("a", 0)
    assert rel_hi < rel_lo


def test_canonical_blend_lifts_b():
    r = Router()
    factual = r.decide(_features(query_class="tight_pool", canonicality=0.0))
    canonical = r.decide(_features(query_class="tight_pool", canonicality=1.0))
    assert canonical.scores["b"] > factual.scores["b"]


def test_decide_override_forces():
    r = Router()
    d = r.decide_override("c", _features())
    assert d.strategy == "c"
    assert d.order[0] == "c"
    assert d.multi_invoke == ["c"]


def test_v2_multi_invoke_on_near_tie():
    r = Router(version="v2")
    # canonical tight_pool is where a and d/b run close
    d = r.decide(_features(query_class="tight_pool", canonicality=1.0))
    if len(d.multi_invoke) > 1:
        s0, s1 = d.multi_invoke[0], d.multi_invoke[1]
        assert abs(d.scores[s0] - d.scores[s1]) < 0.08
    # v1 never multi-invokes
    assert len(Router(version="v1").decide(_features()).multi_invoke) == 1


def test_linear_scoring_shapes():
    feats = linear_features({"pool_size": 30, "has_literal": True,
                             "has_j_payor_tag": True, "thematic_policy": False,
                             "crawlability": 0.8})
    assert feats["exclusivity"] > 0.9
    sa = linear_score("a", feats)
    sb = linear_score("b", feats)
    assert sa > sb  # literal + narrow pool → a dominates
    # crawlable payer fades d's corpus_depth penalty
    d_crawl = linear_score("d", feats)
    feats0 = dict(feats, crawlability=0.0)
    assert d_crawl > linear_score("d", feats0)
