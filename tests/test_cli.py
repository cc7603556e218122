"""CLI surface: parser coverage and help."""

from rlipv2_tpu.cli import get_parser


def test_parser_defaults():
    args = get_parser().parse_args([])
    assert args.preset == "rlip_parseda_v2_r50"
    assert args.epochs == 20


def test_parser_flags():
    args = get_parser().parse_args(
        ["--eval", "--zero_shot_setting", "UC-RF", "--few_shot_transfer", "1",
         "--use_nms_filter", "--giou_verb_label", "--hoi_path", "/data/hico"]
    )
    assert args.eval and args.zero_shot_setting == "UC-RF"
    assert args.few_shot_transfer == 1
    assert args.use_nms_filter and args.giou_verb_label
