"""Caption -> scene graph -> tagger candidates pipeline."""

from rlipv2_tpu.tools.caption_to_sg import (
    build_tagger_candidates,
    grammatical_transform,
    match_graph_to_box_names,
    parse_caption,
    span_matches,
)


def test_parse_simple():
    g = parse_caption("A man riding a horse.")
    spans = [e["span"] for e in g["entities"]]
    assert "man" in spans and "horse" in spans
    assert len(g["relations"]) == 1
    r = g["relations"][0]
    assert g["entities"][r["subject"]]["span"] == "man"
    assert g["entities"][r["object"]]["span"] == "horse"
    assert r["relation"] == "riding"


def test_parse_chained():
    g = parse_caption("a man sitting on a bench near a tree")
    rels = {
        (
            g["entities"][r["subject"]]["span"],
            r["relation"],
            g["entities"][r["object"]]["span"],
        )
        for r in g["relations"]
    }
    assert ("man", "sitting on", "bench") in rels
    assert ("bench", "near", "tree") in rels


def test_parse_no_relation():
    g = parse_caption("a beautiful sunset")
    assert g["relations"] == []


def test_span_matching():
    assert span_matches("young man", "man")
    assert span_matches("man", "man")
    assert not span_matches("woman", "man")
    assert span_matches("puppy", "dog", synonyms={"dog": ["puppy"]})


def test_match_and_candidates():
    g = parse_caption("a man riding a brown horse")
    matched = match_graph_to_box_names(g, ["person", "horse", "man"])
    assert len(matched["relations"]) == 1
    assert matched["relations"][0]["subject_class"] == "man"
    assert matched["relations"][0]["object_class"] == "horse"

    groups = build_tagger_candidates(
        [matched], box_names=["man", "horse", "horse", "tree"]
    )
    assert len(groups) == 1
    pairs, rels = groups[0]
    assert set(pairs) == {(0, 1), (0, 2)}
    assert rels == ["riding"]


def test_overlap_filter():
    g = match_graph_to_box_names(
        parse_caption("a man riding a horse"), ["man", "horse"]
    )
    boxes = [(0, 0, 10, 10), (100, 100, 10, 10)]  # disjoint
    groups = build_tagger_candidates(
        [g], ["man", "horse"], require_overlap=True, boxes_xywh=boxes
    )
    assert groups == []


def test_grammatical_transform():
    graphs = {"1": [{"entities": [{"span": "Big DOG"}], "relations": []}]}
    out = grammatical_transform(graphs)
    assert out["1"][0]["entities"][0]["span"] == "big dog"
