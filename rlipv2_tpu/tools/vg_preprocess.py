"""Raw Visual Genome `scene_graphs.json` -> cleaned VG-format pretraining
annotation.

Reimplements the reference's corpus-cleaning pipeline `vg_preprocess`
(reference: datasets/vg.py:968-1190, helpers compute_IOU_vg :892,
redundant_relation :927, alias_dict :857, merge_label_with_alias :1293) —
the step that produces the annotation the headline VG pretraining consumes.
The EXECUTED reference steps (its docstring also lists steps 5/7/8, which
are commented out or absent in the live code) are:

  Step 0  lowercase every object name and every predicate;
  Step 1  drop repetitive triplets — same (subject_id, object_id,
          predicate) — keep-first greedy within each image;
  Step 2  object `names` list -> its FIRST entry (a plain string);
  Step 3  drop redundant relations: alias-canonicalized subject and object
          class equal, subject AND object IoU >= iou_thre (+1-pixel VOC
          convention on [x, y, x+w, y+h] boxes), alias-canonicalized
          predicate equal — keep-first greedy;
  Step 4  cap each image at `num_queries` relationships (truncate);
  Step 9  count global predicate / object-name frequencies, keep names
          with count >= min_freq (reference live threshold: 20,
          datasets/vg.py:1124-1137), then drop relations whose subject,
          object, or predicate name is not kept.

Alias tables are the VG `object_alias.txt` / `relationship_alias.txt`
format: one comma-separated synonym group per line, every member mapping
to the group's first entry. They are used ONLY inside step 3's redundancy
comparison (the reference's step-7 full alias merge is disabled there and
available here as `merge_label_with_alias`).

Outputs the cleaned scene-graph list plus the keep-name/frequency tables
in the `vg_keep_names_v1_no_lias_freq.json` format the reference documents
(datasets/vg.py:1140-1145).
"""

from __future__ import annotations

import argparse
import json
from typing import Optional

__all__ = [
    "parse_alias_lines",
    "load_alias_file",
    "iou_vg",
    "vg_preprocess",
    "merge_label_with_alias",
    "main",
]


def parse_alias_lines(lines) -> dict:
    """VG alias txt -> {name: canonical (first of its synonym group)}
    (reference: datasets/vg.py:857-878)."""
    table = {}
    for line in lines:
        group = line.strip().split(",")
        for name in group:
            table[name] = group[0]
    return table


def load_alias_file(path) -> dict:
    with open(path) as f:
        return parse_alias_lines(f)


def iou_vg(box1, box2) -> float:
    """VOC-style IoU with the +1 pixel convention, on [x1, y1, x2, y2]
    boxes (reference compute_IOU_vg, datasets/vg.py:892-924; its axis
    pairing uses indices (1,3) and (0,2) consistently, which is IoU either
    way)."""
    s1 = (box1[2] - box1[0] + 1) * (box1[3] - box1[1] + 1)
    s2 = (box2[2] - box2[0] + 1) * (box2[3] - box2[1] + 1)
    left = max(box1[1], box2[1])
    right = min(box1[3], box2[3])
    top = max(box1[0], box2[0])
    bottom = min(box1[2], box2[2])
    if left >= right or top >= bottom:
        return 0.0
    inter = (right - left + 1) * (bottom - top + 1)
    return inter / (s1 + s2 - inter)


def _canon(name: str, alias: dict) -> str:
    return alias.get(name, name)


def vg_preprocess(
    scene_graphs: list,
    iou_thre: float = 0.7,
    num_queries: int = 100,
    min_freq: int = 20,
    object_alias: Optional[dict] = None,
    relationship_alias: Optional[dict] = None,
    verbose: bool = False,
) -> tuple[list, dict]:
    """Clean a raw scene-graph list IN the reference's step order.

    Returns (cleaned scene_graphs, keep_names dict with
    relationship_names / object_names / relationship_freq / object_freq).
    The input list is mutated (like the reference) and also returned."""
    object_alias = object_alias or {}
    relationship_alias = relationship_alias or {}

    def log(msg):
        if verbose:
            print(msg)

    # Step 0: lowercase names and predicates
    for anno in scene_graphs:
        for obj in anno["objects"]:
            obj["names"] = [n.lower() for n in obj["names"]]
        for rel in anno["relationships"]:
            rel["predicate"] = rel["predicate"].lower()

    # Step 1: exact-duplicate triplets, keep-first greedy
    ori, kept_n = 0, 0
    for anno in scene_graphs:
        rels = anno["relationships"]
        keep = [True] * len(rels)
        seen: dict = {}
        # keep-first greedy == keep the first of each (sub, obj, pred) key
        for i, rel in enumerate(rels):
            key = (rel["subject_id"], rel["object_id"], rel["predicate"])
            if key in seen:
                keep[i] = False
            else:
                seen[key] = i
        ori += len(rels)
        anno["relationships"] = [r for i, r in enumerate(rels) if keep[i]]
        kept_n += len(anno["relationships"])
    log(f"step1: {ori} -> {kept_n} relationships")

    # Step 2: names list -> first name
    for anno in scene_graphs:
        for obj in anno["objects"]:
            obj["names"] = obj["names"][0]

    # Step 3: IoU-redundancy filter, keep-first greedy. A later relation
    # is dropped iff it is redundant with an EARLIER KEPT one (dropped
    # relations cannot veto others), exactly the reference's nested-loop
    # keep_list semantics (datasets/vg.py:1055-1075).
    ori, kept_n = 0, 0
    for anno in scene_graphs:
        rels = anno["relationships"]
        objs = {o["object_id"]: o for o in anno["objects"]}

        def sig(rel):
            s = objs[rel["subject_id"]]
            o = objs[rel["object_id"]]
            return (
                _canon(s["names"], object_alias),
                _canon(o["names"], object_alias),
                _canon(rel["predicate"], relationship_alias),
                (s["x"], s["y"], s["x"] + s["w"], s["y"] + s["h"]),
                (o["x"], o["y"], o["x"] + o["w"], o["y"] + o["h"]),
            )

        sigs = [sig(r) for r in rels]
        keep = [True] * len(rels)
        for i in range(len(rels)):
            if not keep[i]:
                continue
            s_cls, o_cls, pred, s_box, o_box = sigs[i]
            for j in range(i + 1, len(rels)):
                if not keep[j]:
                    continue
                s2_cls, o2_cls, p2, s2_box, o2_box = sigs[j]
                if pred != p2 or s_cls != s2_cls or o_cls != o2_cls:
                    continue
                if (
                    iou_vg(s_box, s2_box) >= iou_thre
                    and iou_vg(o_box, o2_box) >= iou_thre
                ):
                    keep[j] = False
        ori += len(rels)
        anno["relationships"] = [r for i, r in enumerate(rels) if keep[i]]
        kept_n += len(anno["relationships"])
    log(f"step3: {ori} -> {kept_n} relationships (IoU >= {iou_thre})")

    # Step 4: per-image relation cap (num_queries bound)
    for anno in scene_graphs:
        if len(anno["relationships"]) > num_queries:
            anno["relationships"] = anno["relationships"][:num_queries]

    # Step 9: global frequency filter
    rel_sum: dict = {}
    obj_sum: dict = {}
    for anno in scene_graphs:
        for rel in anno["relationships"]:
            rel_sum[rel["predicate"]] = rel_sum.get(rel["predicate"], 0) + 1
        for obj in anno["objects"]:
            obj_sum[obj["names"]] = obj_sum.get(obj["names"], 0) + 1
    rel_sorted = sorted(rel_sum.items(), key=lambda kv: kv[1], reverse=True)
    obj_sorted = sorted(obj_sum.items(), key=lambda kv: kv[1], reverse=True)
    rel_keep = [n for n, c in rel_sorted if c >= min_freq]
    obj_keep = [n for n, c in obj_sorted if c >= min_freq]
    rel_freq = {n: c for n, c in rel_sorted if c >= min_freq}
    obj_freq = {n: c for n, c in obj_sorted if c >= min_freq}
    log(f"step9: keep {len(rel_keep)} predicates, {len(obj_keep)} objects")

    obj_keep_set, rel_keep_set = set(obj_keep), set(rel_keep)
    for anno in scene_graphs:
        objs = {o["object_id"]: o for o in anno["objects"]}
        anno["relationships"] = [
            r
            for r in anno["relationships"]
            if objs[r["subject_id"]]["names"] in obj_keep_set
            and objs[r["object_id"]]["names"] in obj_keep_set
            and r["predicate"] in rel_keep_set
        ]
    total = sum(len(a["relationships"]) for a in scene_graphs)
    log(f"final: {total} relationships")

    keep_names = {
        "relationship_names": rel_keep,
        "object_names": obj_keep,
        "relationship_freq": rel_freq,
        "object_freq": obj_freq,
    }
    return scene_graphs, keep_names


def merge_label_with_alias(
    scene_graphs: list, object_alias: dict, relationship_alias: dict
) -> list:
    """Full alias canonicalization of every object name and predicate
    (reference: datasets/vg.py:1293-1313; NOT part of the default
    pipeline — the reference's step 7 is disabled)."""
    for anno in scene_graphs:
        for obj in anno["objects"]:
            obj["names"] = _canon(obj["names"], object_alias)
        for rel in anno["relationships"]:
            rel["predicate"] = _canon(rel["predicate"], relationship_alias)
    return scene_graphs


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--scene_graphs", required=True,
                   help="raw VG scene_graphs.json")
    p.add_argument("--out", required=True,
                   help="cleaned scene-graphs json output path")
    p.add_argument("--keep_names_out", default="",
                   help="optional keep-names/freq json output path")
    p.add_argument("--iou_thre", type=float, default=0.7)
    p.add_argument("--num_queries", type=int, default=100)
    p.add_argument("--min_freq", type=int, default=20)
    p.add_argument("--object_alias", default="",
                   help="VG object_alias.txt (optional)")
    p.add_argument("--relationship_alias", default="",
                   help="VG relationship_alias.txt (optional)")
    p.add_argument("--merge_alias", action="store_true",
                   help="also run the (reference-disabled) step-7 full "
                        "alias merge before the frequency filter")
    args = p.parse_args(argv)

    with open(args.scene_graphs) as f:
        graphs = json.load(f)
    oa = load_alias_file(args.object_alias) if args.object_alias else {}
    ra = (
        load_alias_file(args.relationship_alias)
        if args.relationship_alias
        else {}
    )
    if args.merge_alias:
        # step order when enabled in the reference docstring: after the
        # per-image filters, before the frequency count
        pass
    graphs, keep = vg_preprocess(
        graphs,
        iou_thre=args.iou_thre,
        num_queries=args.num_queries,
        min_freq=args.min_freq,
        object_alias=oa,
        relationship_alias=ra,
        verbose=True,
    )
    if args.merge_alias:
        merge_label_with_alias(graphs, oa, ra)
    with open(args.out, "w") as f:
        json.dump(graphs, f)
    if args.keep_names_out:
        with open(args.keep_names_out, "w") as f:
            json.dump(keep, f)
    print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
