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


# ---------------------------------------------------------------------------
# Reference-exact machinery (VERDICT r2 item 7): oracle parity against the
# reference helpers, loaded with stubs for their unavailable heavy deps.
# Three matching strategies covered: original_text, paraphrases, and the
# OD-candidate anchor matching (match_anchor_obj_with_free_form_texts).
# ---------------------------------------------------------------------------

import copy
import importlib.util
import sys
import types

import pytest

from rlipv2_tpu.tools.caption_to_sg import (
    SceneGraphBoxMatcher,
    check_overlap,
    group_pairs_into_tagger_slots,
    match_span_original_text,
    match_span_paraphrases,
    od_relation_candidate_groups,
    pseudo_relations_from_matched_graphs,
    tagger_input_from_caption_triplets,
    vg_relation_candidates_for_objects,
)

HELPER_DIR = "/root/reference/datasets/rlipv2_helper"


def _load_ref_helper(name):
    """Import a reference rlipv2_helper module with stubs for the heavy
    deps it pulls in at module level but that the tested functions never
    touch (mmcv, clip, sng_parser, pycocotools, torchvision, the
    reference-local `transforms`)."""
    pytest.importorskip("torch")
    for stub_name, attrs in {
        "mmcv": {},
        "mmcv.image": {"imread": None, "imwrite": None},
        "mmcv.utils": {"is_str": lambda x: isinstance(x, str)},
        "clip": {"load": None, "tokenize": None},
        "sng_parser": {"parse": None},
        "pycocotools": {},
        "pycocotools.mask": {"decode": None, "frPyObjects": None},
        "transforms": {
            "Compose": object, "ToTensor": object, "Normalize": object,
            "RandomHorizontalFlip": object, "RandomSelect": object,
            "RandomResize": object, "RandomSizeCrop": object,
        },
    }.items():
        if stub_name not in sys.modules:
            mod = types.ModuleType(stub_name)
            mod.__path__ = []
            for a, v in attrs.items():
                setattr(mod, a, v)
            sys.modules[stub_name] = mod
    import ref_import

    ref_import.install_stubs()
    tv = sys.modules["torchvision"]
    if not hasattr(tv, "datasets"):
        tvd = types.ModuleType("torchvision.datasets")
        tvd.CocoDetection = type("CocoDetection", (), {})
        sys.modules["torchvision.datasets"] = tvd
        tv.datasets = tvd
    if HELPER_DIR not in sys.path:
        sys.path.insert(0, HELPER_DIR)  # o365 helper flat-imports siblings
    spec = importlib.util.spec_from_file_location(
        name, f"{HELPER_DIR}/{name}.py"
    )
    mod = importlib.util.module_from_spec(spec)
    sys.modules[name] = mod
    spec.loader.exec_module(mod)
    return mod


CANNED_GRAPHS = [
    {
        "entities": [{"span": "a young man"}, {"span": "brown horse"},
                     {"span": "the field"}],
        "relations": [
            {"subject": 0, "object": 1, "relation": "riding"},
            {"subject": 1, "object": 2, "relation": "standing in"},
            {"subject": 0, "object": 2, "relation": "in"},
        ],
    },
    {
        "entities": [{"span": "dog"}, {"span": "frisbee"}],
        "relations": [{"subject": 0, "object": 1, "relation": "catching"}],
    },
    {   # multi-match entity: 'man with dog' contains both class names ->
        # reference keeps the LAST matching name
        "entities": [{"span": "man with dog"}, {"span": "sofa"}],
        "relations": [{"subject": 0, "object": 1, "relation": "sitting on"}],
    },
]
BOX_NAMES = [["man", "horse"], ["dog", "frisbee"], ["man", "dog", "sofa"]]
PARAPHRASES = {
    "person": ["man", "woman", "person", "boy", "girl"],
    "horse": ["horse", "pony"],
    "dog": ["dog", "puppy"],
    "couch": ["sofa", "couch"],
    "frisbee": ["frisbee"],
}


def test_matcher_original_text_parity_vs_reference():
    ref = _load_ref_helper("coco_caption_helper")
    ref_matcher = ref.MatchWithGTbboxes(match_strategy="original_text")
    ours = SceneGraphBoxMatcher("original_text")
    for graph, names in zip(CANNED_GRAPHS, BOX_NAMES):
        expect = ref_matcher.match_one_img_bboxes_with_one_scene_graph(
            bboxes_names=names, scene_graph_one_sent=copy.deepcopy(graph)
        )
        got = ours.match_graph(names, copy.deepcopy(graph))
        assert got["relations"] == expect["relations"]
        assert [e.get("coco_name") for e in got["entities"]] == [
            e.get("coco_name") for e in expect["entities"]
        ]


def test_matcher_paraphrases_parity_vs_reference():
    ref = _load_ref_helper("coco_caption_helper")
    # reference __init__('paraphrases') opens a hardcoded path; build with
    # original_text then install the canned table, as its methods only read
    # self.obj_paraphrase / self.match_strategy
    ref_matcher = ref.MatchWithGTbboxes(match_strategy="original_text")
    ref_matcher.match_strategy = "paraphrases"
    ref_matcher.obj_paraphrase = PARAPHRASES
    ours = SceneGraphBoxMatcher("paraphrases", paraphrase_table=PARAPHRASES)
    names_by_img = [["person", "horse"], ["dog", "frisbee"],
                    ["person", "dog", "couch"]]
    for graph, names in zip(CANNED_GRAPHS, names_by_img):
        expect = ref_matcher.match_one_img_bboxes_with_one_scene_graph(
            bboxes_names=names, scene_graph_one_sent=copy.deepcopy(graph)
        )
        got = ours.match_graph(names, copy.deepcopy(graph))
        assert got["relations"] == expect["relations"]
        assert [e.get("coco_name") for e in got["entities"]] == [
            e.get("coco_name") for e in expect["entities"]
        ]
        # ensure the canned set exercises real paraphrase hits (e.g. span
        # 'a young man' matched to class 'person')
    assert match_span_paraphrases(PARAPHRASES["person"], "a young man")
    assert not match_span_original_text("person", "a young man")


def test_od_anchor_matching_parity_vs_reference():
    od = _load_ref_helper("OD_rel_cand_select")
    free_forms = ["young man", "brown pony", "puppy dog", "sofa bed", "tree"]
    for anchor in PARAPHRASES:
        for text in free_forms:
            assert match_span_paraphrases(
                PARAPHRASES[anchor], text
            ) == od.match_anchor_obj_with_free_form_texts(
                anchor_obj=anchor, free_form_texts=text,
                obj_paraphrase=PARAPHRASES,
            )


def test_check_overlap_parity_vs_reference():
    ref = _load_ref_helper("coco_caption_helper")
    cases = [
        ([0, 0, 10, 10], [5, 5, 10, 10]),
        ([0, 0, 10, 10], [20, 0, 10, 10]),
        ([0, 0, 10, 10], [10, 10, 10, 10]),  # exactly touching -> False
        ([2, 3, 4, 5], [3, 4, 1, 1]),
        ([0, 0, 0, 0], [0, 0, 0, 0]),  # degenerate
    ]
    for b1, b2 in cases:
        assert check_overlap(b1, b2) == ref.check_overlap(b1, b2)


def test_grammatical_transform_parity_vs_reference():
    ref = _load_ref_helper("coco_caption_helper")
    sng = {"1": [{"entities": [{"span": "Big DOG"}, {"span": "Tree"}],
                  "relations": []}]}
    ours = grammatical_transform(copy.deepcopy(sng))
    theirs = ref.grammartical_tranform(copy.deepcopy(sng))
    assert ours == theirs


def test_group_pairs_reference_semantics():
    # 5 pairs, num_pairs=2 -> reference formula 5//2+1 = 3 groups: 2/2/1
    pairs = [(0, 1), (1, 0), (0, 2), (2, 0), (1, 2)]
    texts = ["on", "under", "on", "near", "on"]
    groups = group_pairs_into_tagger_slots(pairs, texts, num_pairs=2)
    assert [g[0] for g in groups] == [
        [(0, 1), (1, 0)], [(0, 2), (2, 0)], [(1, 2)]
    ]
    # merged texts keep first-seen order, deduped
    assert groups[0][1] == ["on", "under"]
    assert groups[1][1] == ["on", "near"]
    # exact multiple -> the reference's trailing empty group is dropped
    groups = group_pairs_into_tagger_slots(pairs[:4], texts[:4], num_pairs=2)
    assert len(groups) == 2


def test_tagger_input_from_caption_triplets():
    matched = SceneGraphBoxMatcher("original_text").match_graph(
        ["man", "horse"], copy.deepcopy(CANNED_GRAPHS[0])
    )
    # boxes: man, horse, horse -> pairs (0,1) and (0,2) for 'riding'
    groups = tagger_input_from_caption_triplets(
        [matched], ["man", "horse", "horse"], num_pairs=100
    )
    assert len(groups) == 1
    pairs, texts = groups[0]
    assert (0, 1) in pairs and (0, 2) in pairs
    assert "riding" in texts
    # overlap prior filters disjoint pairs
    boxes = [[0, 0, 10, 10], [5, 5, 10, 10], [100, 100, 5, 5]]
    groups = tagger_input_from_caption_triplets(
        [matched], ["man", "horse", "horse"], boxes_xywh=boxes,
        num_pairs=100, bbox_overlap=True,
    )
    assert groups[0][0] == [(0, 1)]


def test_pseudo_relations_naive_product():
    matched = SceneGraphBoxMatcher("original_text").match_graph(
        ["man", "horse"], copy.deepcopy(CANNED_GRAPHS[0])
    )
    rels = pseudo_relations_from_matched_graphs(
        [matched], ["man", "horse", "horse"], start_rel_idx=7
    )
    riding = [r for r in rels if r["predicate"] == "riding"]
    assert {(r["subject_id"], r["object_id"]) for r in riding} == {
        (0, 1), (0, 2)
    }
    assert rels[0]["relationship_id"] == 7


def test_vg_candidate_table_and_od_groups():
    annos = [{
        "objects": [
            {"object_id": 1, "names": "young man"},
            {"object_id": 2, "names": "brown pony"},
        ],
        "relationships": [
            {"predicate": "riding", "subject_id": 1, "object_id": 2},
            {"predicate": "next to", "subject_id": 2, "object_id": 1},
        ],
    }]
    table = vg_relation_candidates_for_objects(
        annos, ["person", "horse"], PARAPHRASES
    )
    assert table["person"]["horse"] == ["riding"]
    assert table["horse"]["person"] == ["next to"]
    assert table["person"]["person"] == []

    # OD image with classes [person, horse, person]: 6 permutations; pairs
    # with empty candidate lists are dropped, but the group count uses the
    # PRE-filter permutation count (reference quirk)
    groups = od_relation_candidate_groups(
        ["person", "horse", "person"], table, num_pairs=4
    )
    flat_pairs = [p for g in groups for p in g[0]]
    assert (0, 1) in flat_pairs and (2, 1) in flat_pairs  # person->horse
    assert (1, 0) in flat_pairs and (1, 2) in flat_pairs  # horse->person
    assert (0, 2) not in flat_pairs  # person->person has no candidates
    assert all("riding" in g[1] or "next to" in g[1] for g in groups)
