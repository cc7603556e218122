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


def test_experiment_scripts_parse():
    """Every scripts/*.sh invoking main.py must use flags the parser knows
    and presets that exist (guards the script suite against CLI drift)."""
    import pathlib
    import re

    from rlipv2_tpu.config import PRESETS

    root = pathlib.Path(__file__).resolve().parents[1]
    for sh in sorted((root / "scripts").glob("*.sh")):
        text = sh.read_text()
        if "python main.py" not in text:
            continue
        body = text[text.index("python main.py"):]
        argv = []
        for tok in re.findall(r'--[\w]+(?:\s+"?\$?\{?[\w./,-]*\}?"?)?', body):
            parts = tok.replace('"', "").split()
            argv.append(parts[0])
            if len(parts) > 1 and not parts[1].startswith("$"):
                argv.append(parts[1])
            elif len(parts) > 1:
                argv.append("/dev/null")
        args = get_parser().parse_args(argv)
        assert args.preset in PRESETS, f"{sh.name}: unknown preset {args.preset}"
