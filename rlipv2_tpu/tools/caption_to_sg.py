"""Caption -> scene-graph -> tagger-candidate pipeline (step 2 of the
RLIPv2 scale-up, SURVEY.md §2.7).

Capability parity with the reference helpers
(datasets/rlipv2_helper/BLIP_coco_caption_helper.py:31-200 +
coco_caption_helper.py:115-816):
  * parse generated captions into scene graphs (the reference uses the
    spaCy-based `sng_parser`; this module uses it when installed and falls
    back to a dependency-free rule-based parser over relation keywords);
  * grammatical normalization (lower-casing spans, :799-815);
  * filter relations whose subject/object spans do not match any GT box
    class name in the image (exact / substring / synonym strategies,
    `MatchWithGTbboxes`);
  * emit verb-tagger input: per image, candidate (sub, obj) box-pair
    groups with their candidate relation texts, consumed by
    tools/generate_relations.py.
"""

from __future__ import annotations

from itertools import permutations
from typing import Optional, Sequence

# prepositions/verbs that delimit relations in the fallback parser
RELATION_MARKERS = [
    "sitting on", "standing on", "lying on", "riding on", "walking on",
    "looking at", "next to", "in front of", "on top of", "attached to",
    "parked on", "leaning against", "covered in", "covered with",
    "holding", "wearing", "riding", "eating", "watching", "carrying",
    "playing", "crossing", "touching", "pushing", "pulling", "feeding",
    "hitting", "jumping", "throwing", "catching", "behind", "under",
    "above", "over", "beside", "near", "with", "on", "in", "at", "by",
]

ARTICLES = {"a", "an", "the", "some", "two", "three", "several", "his",
            "her", "its", "their", "this", "that", "these", "those"}


def _strip_np(phrase: str) -> str:
    words = [w for w in phrase.strip().split() if w]
    while words and words[0] in ARTICLES:
        words = words[1:]
    return " ".join(words)


def parse_caption(caption: str) -> dict:
    """Caption -> {'entities': [{'span': str}], 'relations':
    [{'subject': i, 'object': j, 'relation': str}]} — the sng_parser
    output shape (subject/object as entity indices)."""
    try:  # optional: the reference's parser, when available
        import sng_parser

        # a stubbed sng_parser (e.g. installed to import reference helpers
        # in tests) may exist without a usable parse()
        if not callable(getattr(sng_parser, "parse", None)):
            raise ImportError("sng_parser.parse unavailable")
        g = sng_parser.parse(caption)
        return {
            "entities": [{"span": e["span"].lower()} for e in g["entities"]],
            "relations": [
                {
                    "subject": r["subject"],
                    "object": r["object"],
                    "relation": r["relation"].lower(),
                }
                for r in g["relations"]
            ],
        }
    except ImportError:
        pass

    text = caption.lower().strip().rstrip(".")
    entities: list[dict] = []
    relations: list[dict] = []

    def entity_index(span: str) -> Optional[int]:
        span = _strip_np(span)
        if not span:
            return None
        for i, e in enumerate(entities):
            if e["span"] == span:
                return i
        entities.append({"span": span})
        return len(entities) - 1

    # greedy left-to-right: find the first marker; left = subject NP,
    # recurse right for chained relations ("a man on a horse near a tree")
    def split_once(segment: str):
        for marker in RELATION_MARKERS:
            probe = f" {marker} "
            if probe in f" {segment} ":
                padded = f" {segment} "
                left, right = padded.split(probe, 1)
                return left.strip(), marker, right.strip()
        return None

    segment = text
    subject_span = None
    while True:
        parts = split_once(segment)
        if parts is None:
            break
        left, marker, right = parts
        subj = subject_span if not left else left
        if subj is None:
            break
        tail = split_once(right)
        obj_span = right if tail is None else tail[0]
        si = entity_index(subj)
        oi = entity_index(obj_span)
        if si is not None and oi is not None and si != oi:
            relations.append({"subject": si, "object": oi, "relation": marker})
        subject_span = obj_span
        segment = right
        if tail is None:
            break
    return {"entities": entities, "relations": relations}


def grammatical_transform(graphs: dict) -> dict:
    """Lower-case entity spans (reference :799-815)."""
    for _, graph_list in graphs.items():
        for g in graph_list:
            for e in g["entities"]:
                e["span"] = e["span"].lower()
    return graphs


def span_matches(span: str, class_name: str, synonyms: Optional[dict] = None) -> bool:
    """original_text strategy: the class name appears in the span (the
    head noun match used by the reference), plus optional synonym table."""
    span = span.lower()
    class_name = class_name.lower()
    if class_name == span or span.endswith(" " + class_name) or span == class_name:
        return True
    if class_name in span.split():
        return True
    if synonyms:
        for syn in synonyms.get(class_name, []):
            if span == syn or span.endswith(" " + syn) or syn in span.split():
                return True
    return False


def match_graph_to_box_names(
    graph: dict, box_names: Sequence[str], synonyms: Optional[dict] = None
) -> dict:
    """Keep relations whose subject AND object spans match some GT class
    present in the image; annotate matched class names."""
    kept = []
    for rel in graph["relations"]:
        s_span = graph["entities"][rel["subject"]]["span"]
        o_span = graph["entities"][rel["object"]]["span"]
        s_cls = next((c for c in box_names if span_matches(s_span, c, synonyms)), None)
        o_cls = next((c for c in box_names if span_matches(o_span, c, synonyms)), None)
        if s_cls is not None and o_cls is not None:
            kept.append(
                {
                    "subject_class": s_cls,
                    "object_class": o_cls,
                    "relation": rel["relation"],
                }
            )
    return {"entities": graph["entities"], "relations": kept}


# ---------------------------------------------------------------------------
# Reference-exact matching machinery (VERDICT r2 item 7). The functions above
# are the enhanced word-boundary heuristics; the ones below replicate the
# reference helper semantics bit-for-bit so pseudo-label generation can
# reproduce the published pipeline exactly. Oracle parity:
# tests/test_caption_to_sg.py imports the reference helpers and asserts
# identical outputs on canned scene graphs for all three strategies.
# ---------------------------------------------------------------------------


def match_span_original_text(class_name: str, span: str) -> bool:
    """The reference 'original_text' strategy: plain substring test
    (reference: coco_caption_helper.py:941-942 `if name in entity['span']`)."""
    return class_name in span


def match_span_paraphrases(paraphrases: Sequence[str], span: str) -> bool:
    """The reference 'paraphrases' strategy: any human-collected paraphrase
    of the class name appears as a substring of the entity span
    (reference: coco_caption_helper.py:895-911 `MatchWithGTbboxes.
    match_with_paraphrases`; same core in BLIP_o365_caption_helper.py:442-458
    and OD_rel_cand_select.py:230-240 match_anchor_obj_with_free_form_texts)."""
    for p in paraphrases:
        if p in span:
            return True
    return False


class SceneGraphBoxMatcher:
    """Match parsed scene-graph entities against the GT box class names of an
    image, reference-exact (coco_caption_helper.py:887-959 `MatchWithGTbboxes`
    / BLIP_o365_caption_helper.py:433-505 `MatchWithGTbboxes_O365`):

    * every entity is kept (so relation subject/object indices stay valid);
    * an entity matching several class names keeps the LAST match as its
      `coco_name` (the reference loop overwrites on every hit);
    * a relation survives iff both its subject and object entity matched;
      surviving relations are annotated with `subject_coco_name`,
      `object_coco_name`, `subject_span`, `object_span`.

    `strategy` is 'original_text' (substring) or 'paraphrases' (requires
    `paraphrase_table`: {class_name: [paraphrase, ...]}, the reference's
    datasets/priors/hico_obj_paraphrase.json format).
    """

    def __init__(self, strategy: str = "original_text",
                 paraphrase_table: Optional[dict] = None):
        if strategy not in ("original_text", "paraphrases"):
            raise ValueError(f"unknown match strategy: {strategy}")
        if strategy == "paraphrases" and paraphrase_table is None:
            raise ValueError("paraphrases strategy needs a paraphrase_table")
        self.strategy = strategy
        self.paraphrase_table = paraphrase_table or {}

    def _matches(self, class_name: str, span: str) -> bool:
        if self.strategy == "original_text":
            return match_span_original_text(class_name, span)
        return match_span_paraphrases(
            self.paraphrase_table[class_name], span
        )

    def match_graph(self, box_names: Sequence[str], graph: dict) -> dict:
        entities = [dict(e) for e in graph["entities"]]
        keep = []
        for ei, entity in enumerate(entities):
            for name in box_names:
                if self._matches(name, entity["span"]):
                    entity["coco_name"] = name
                    keep.append(ei)
        relations = []
        for rel in graph["relations"]:
            if rel["subject"] in keep and rel["object"] in keep:
                rel = dict(rel)
                rel["subject_coco_name"] = entities[rel["subject"]]["coco_name"]
                rel["object_coco_name"] = entities[rel["object"]]["coco_name"]
                rel["subject_span"] = entities[rel["subject"]]["span"]
                rel["object_span"] = entities[rel["object"]]["span"]
                relations.append(rel)
        return {"entities": entities, "relations": relations}


def check_overlap(bbox1, bbox2) -> bool:
    """Center-distance overlap test on [x, y, w, h] boxes, reference-exact
    (coco_caption_helper.py:1140-1157)."""
    cx1, cy1 = bbox1[0] + bbox1[2] / 2, bbox1[1] + bbox1[3] / 2
    cx2, cy2 = bbox2[0] + bbox2[2] / 2, bbox2[1] + bbox2[3] / 2
    return (
        abs(cx1 - cx2) < bbox1[2] / 2 + bbox2[2] / 2
        and abs(cy1 - cy2) < bbox1[3] / 2 + bbox2[3] / 2
    )


def pseudo_relations_from_matched_graphs(
    matched_graphs: Sequence[dict],
    box_names: Sequence[str],
    start_rel_idx: int = 0,
) -> list:
    """Caption-triplet x GT-box product for ONE image: every (sub box with
    the triplet's subject class) x (obj box with its object class) becomes a
    pseudo relation — the reference's naive (no-CLIP) matching loop
    (coco_caption_helper.py:246-295). Returns VG-format relationship dicts
    with box indices as subject_id/object_id."""
    triplets = []
    for g in matched_graphs:
        for rel in g["relations"]:
            triplets.append(
                [rel["subject_coco_name"], rel["relation"],
                 rel["object_coco_name"]]
            )
    rels, idx = [], start_rel_idx
    for sub_name, predicate, obj_name in triplets:
        for si, sname in enumerate(box_names):
            if sname == sub_name:
                for oi, oname in enumerate(box_names):
                    if oname == obj_name:
                        rels.append(
                            {
                                "relationship_id": idx,
                                "predicate": predicate,
                                "subject_id": si,
                                "object_id": oi,
                            }
                        )
                        idx += 1
    return rels


def group_pairs_into_tagger_slots(
    pairs: Sequence[tuple],
    per_pair_texts: Sequence,
    num_pairs: int,
    num_groups: Optional[int] = None,
) -> list:
    """Chunk candidate (sub, obj) pairs into tagger query groups of at most
    `num_pairs`, merging the relation texts of each chunk in first-seen
    order — the reference's group-merge loop
    (BLIP_o365_caption_helper.py:264-283, OD_rel_cand_select.py:305-325).
    `per_pair_texts[i]` is either one text or a list of texts for pair i.
    `num_groups` overrides the chunk count (the reference OD path sizes it
    from the PRE-filter pair count, OD_rel_cand_select.py:306); default is
    the reference formula len(pairs)//num_pairs + 1 (note: one trailing
    empty group when len(pairs) is an exact multiple — replicated, then
    dropped, since an empty group carries no queries)."""
    if num_groups is None:
        num_groups = len(pairs) // num_pairs + 1
    groups = []
    for i in range(num_groups):
        if i == num_groups - 1:
            i_pairs = list(pairs[i * num_pairs:])
            i_texts = list(per_pair_texts[i * num_pairs:])
        else:
            i_pairs = list(pairs[i * num_pairs:(i + 1) * num_pairs])
            i_texts = list(per_pair_texts[i * num_pairs:(i + 1) * num_pairs])
        merged = []
        for t in i_texts:
            for k in (t if isinstance(t, (list, tuple)) else [t]):
                if k not in merged:
                    merged.append(k)
        if i_pairs:
            groups.append((i_pairs, merged))
    return groups


def tagger_input_from_caption_triplets(
    matched_graphs: Sequence[dict],
    box_names: Sequence[str],
    boxes_xywh=None,
    num_pairs: int = 100,
    bbox_overlap: bool = False,
) -> list:
    """Verb-tagger input for ONE image from caption-derived triplets: every
    (sub, obj) box permutation whose class names equal a triplet's
    subject/object classes becomes a candidate pair carrying that triplet's
    relation text; pairs are chunked into `num_pairs` groups with merged
    texts (reference: BLIP_o365_caption_helper.py:228-283
    transform_BLIP_sngs_to_verb_tagger_input_format; optional `bbox_overlap`
    prior at :256-259). A pair matching k triplets appears k times, as in
    the reference. Returns [(pairs, rel_texts)]."""
    triplets = []
    for g in matched_graphs:
        for rel in g["relations"]:
            t = [rel["subject_coco_name"], rel["relation"],
                 rel["object_coco_name"]]
            if t not in triplets:
                triplets.append(t)

    valid_pairs, valid_texts = [], []
    for pair in permutations(range(len(box_names)), 2):
        s_name, o_name = box_names[pair[0]], box_names[pair[1]]
        if bbox_overlap and boxes_xywh is not None:
            if not check_overlap(boxes_xywh[pair[0]], boxes_xywh[pair[1]]):
                continue
        for t in triplets:
            if t[0] == s_name and t[2] == o_name:
                valid_pairs.append(pair)
                valid_texts.append(t[1])
    return group_pairs_into_tagger_slots(valid_pairs, valid_texts, num_pairs)


def vg_relation_candidates_for_objects(
    vg_annotations: Sequence[dict],
    object_names: Sequence[str],
    paraphrase_table: dict,
) -> dict:
    """{subject_class: {object_class: [relation texts]}} harvested from
    VG-format scene-graph annotations: a VG relation contributes its
    predicate to every (anchor sub, anchor obj) whose paraphrases match the
    free-form VG subject/object names (reference:
    OD_rel_cand_select.py:159-215 sel_vg_candidate_given_objects +
    match_anchor_obj_with_free_form_texts)."""
    table = {s: {o: [] for o in object_names} for s in object_names}
    for anno in vg_annotations:
        obj_by_id = {o["object_id"]: o for o in anno["objects"]}
        for rel in anno["relationships"]:
            sub_name = obj_by_id[rel["subject_id"]]["names"]
            obj_name = obj_by_id[rel["object_id"]]["names"]
            for s in object_names:
                if match_span_paraphrases(paraphrase_table[s], sub_name):
                    for o in object_names:
                        if match_span_paraphrases(paraphrase_table[o], obj_name):
                            if rel["predicate"] not in table[s][o]:
                                table[s][o].append(rel["predicate"])
    return table


def od_relation_candidate_groups(
    box_class_names: Sequence[str],
    rel_text_table: dict,
    num_pairs: int = 100,
) -> list:
    """Tagger input for ONE image from OD labels alone: all (sub, obj) box
    permutations, candidate texts looked up per class pair in the
    VG-harvested `rel_text_table`, zero-candidate pairs dropped, then
    grouped. Reference-exact including the quirk that the group count is
    computed from the PRE-filter permutation count
    (OD_rel_cand_select.py:279-325 relation_candidate_selection_from_OD).
    Returns [(pairs, rel_texts)]."""
    possible_pairs = list(permutations(range(len(box_class_names)), 2))
    num_possible_pairs = len(possible_pairs)
    kept_pairs, kept_texts = [], []
    for pair in possible_pairs:
        texts = rel_text_table[box_class_names[pair[0]]][box_class_names[pair[1]]]
        if len(texts) > 0:
            kept_pairs.append(pair)
            kept_texts.append(texts)
    return group_pairs_into_tagger_slots(
        kept_pairs, kept_texts, num_pairs,
        num_groups=num_possible_pairs // num_pairs + 1,
    )


def build_tagger_candidates(
    graphs: Sequence[dict],  # matched graphs for ONE image
    box_names: Sequence[str],  # per-box class names (len n)
    require_overlap: bool = False,
    boxes_xywh=None,
) -> list:
    """-> [(pairs, rel_texts)]: all (sub, obj) box permutations whose
    classes appear as a (subject_class, object_class) in some parsed
    relation, grouped with the relation texts proposed for that class
    pair (reference: transform_BLIP_sngs_to_verb_tagger_input_format)."""
    from rlipv2_tpu.data.vg import boxes_overlap

    pair_rels: dict[tuple, list] = {}
    for g in graphs:
        for rel in g["relations"]:
            key = (rel["subject_class"], rel["object_class"])
            pair_rels.setdefault(key, [])
            if rel["relation"] not in pair_rels[key]:
                pair_rels[key].append(rel["relation"])

    groups = []
    n = len(box_names)
    for (s_cls, o_cls), rels in pair_rels.items():
        pairs = [
            (i, j)
            for i, j in permutations(range(n), 2)
            if box_names[i] == s_cls and box_names[j] == o_cls
        ]
        if require_overlap and boxes_xywh is not None:
            pairs = [
                (i, j)
                for i, j in pairs
                if boxes_overlap(boxes_xywh[i], boxes_xywh[j])
            ]
        if pairs:
            groups.append((pairs, rels))
    return groups
