"""BPE tokenizer vs transformers' RobertaTokenizer built from the same
local vocab/merges files (offline oracle)."""

import json

import numpy as np
import pytest

from rlipv2_tpu.utils.tokenizer import RobertaTokenizer, bytes_to_unicode


def make_assets(tmp_path):
    """Tiny but real BPE: enough merges to exercise the merge loop."""
    be = bytes_to_unicode()
    space = be[ord(" ")]  # 'Ġ'
    base_tokens = ["<s>", "<pad>", "</s>", "<unk>"]
    chars = [be[b] for b in range(33, 127)] + [space]
    merges = [
        (space, "r"), (space + "r", "i"), (space + "ri", "d"),
        (space + "rid", "e"),
        ("r", "i"), ("ri", "d"), ("rid", "e"),
        ("c", "a"), ("ca", "t"),
        (space, "c"), (space + "c", "a"), (space + "ca", "t"),
        ("d", "o"), ("do", "g"),
    ]
    vocab_tokens = base_tokens + chars + ["".join(m) for m in merges]
    vocab = {t: i for i, t in enumerate(dict.fromkeys(vocab_tokens))}
    vf = tmp_path / "vocab.json"
    mf = tmp_path / "merges.txt"
    vf.write_text(json.dumps(vocab))
    mf.write_text("#version: 0.2\n" + "\n".join(" ".join(m) for m in merges) + "\n")
    return vf, mf


def test_matches_transformers_slow_tokenizer(tmp_path):
    transformers = pytest.importorskip("transformers")
    vf, mf = make_assets(tmp_path)
    theirs = transformers.RobertaTokenizer(str(vf), str(mf))
    ours = RobertaTokenizer.from_files(vf, mf)

    for text in ["cat", "ride cat", "dog rides a cat", "zebra!?"]:
        ref = theirs(text)["input_ids"]
        got = [ours.bos] + ours.encode(text) + [ours.eos]
        assert got == ref, (text, got, ref)


def test_batch_encode_padding(tmp_path):
    vf, mf = make_assets(tmp_path)
    tok = RobertaTokenizer.from_files(vf, mf)
    ids, mask = tok.batch_encode(["cat", "dog rides a cat"])
    assert ids.shape == mask.shape
    assert (ids[:, 0] == tok.bos).all()
    assert mask[0].sum() < mask[1].sum()
    assert (ids[0][mask[0] == 0] == tok.pad).all()
