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
