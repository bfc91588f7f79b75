"""Differential: rule-based decoupler vs the reference's ACTUAL spaCy parser.

VERDICT r4 missing-item 3: the decoupler replaces
``sng_parser/backends/spacy_parser.py:75-449`` wholesale, and until this
harness existed its validation was self-referential (hand-transcribed
expectations). This test runs the reference's own ``sng_parser.parse`` on
the full curated corpus (``test_decouple.py``: GOLDEN + CORPUS + CORPUS_R3
+ the round-5 free-form NR3D set) and diffs every span group against
``eda_tpu.data.decouple.parse``.

It is SKIPPED in this image: spaCy (and ``en_core_web_sm-3.3.0``,
reference ``README.md:31-34``) is not installed, and installing packages
is out of scope here. On a machine with the reference's environment:

    pip install spacy==3.3.0 && python -m spacy download en_core_web_sm
    python -m pytest tests/test_decouple_vs_sngparser.py -s

The run writes a per-utterance diff report to
``/tmp/decouple_vs_sngparser.json`` and asserts agreement floors (main
spans >= 90%, per-group token-level F1 >= 0.8 overall) rather than exact
equality — the rule-based chunker's documented deviations
(``decouple.py`` module docstring: vocabulary-matched relation words, the
positional subject walk, kept no-landmark relations) are real differences
the report is meant to QUANTIFY, not hide.
"""

import json

import pytest

spacy = pytest.importorskip("spacy")

import sys  # noqa: E402

sys.path.insert(0, "/root/reference")

try:
    import sng_parser  # the reference's vendored parser
    sng_parser.parse("the chair next to the table .")
except Exception as e:  # pragma: no cover - needs en_core_web_sm
    pytest.skip(f"reference sng_parser unusable: {e}", allow_module_level=True)

from eda_tpu.data.annotations import normalize_utterance  # noqa: E402
from eda_tpu.data.decouple import parse as our_parse  # noqa: E402


def _corpus():
    sys.path.insert(0, "tests")
    import test_decouple as td

    out = [("scanrefer", c) for c, _ in td.GOLDEN]
    for name in ("CORPUS", "CORPUS_R3", "CORPUS_R5"):
        out += [(ds, raw) for ds, raw, _ in getattr(td, name, [])]
    return out


def _ref_groups(caption):
    nodes, edges = sng_parser.parse(caption)
    main = next((n for n in nodes if n["node_id"] == 0), None)
    others = [
        s for n in nodes
        if n["node_id"] != 0 and n["node_type"] == "Object"
        for s in n["target_char_span"]
    ]
    return {
        "main": list(main["target_char_span"]) if main else [],
        "modifiers": list(main["mod_char_span"]) if main else [],
        "pronouns": list(main["pron_char_span"]) if main else [],
        "relations": list(main["rel_char_span"]) if main else [],
        "others": others,
    }


def _our_groups(caption):
    res = our_parse(caption)
    main = res.main
    others = [
        s for n in res.nodes
        if n.node_id != 0 and n.node_type == "Object"
        for s in n.target_char_span
    ]
    return {
        "main": list(main.target_char_span) if main else [],
        "modifiers": list(main.mod_char_span) if main else [],
        "pronouns": list(main.pron_char_span) if main else [],
        "relations": list(main.rel_char_span) if main else [],
        "others": others,
    }


def _char_set(spans):
    return {i for s, e in spans for i in range(s, e)}


def test_decoupler_vs_reference_spacy_parser():
    diffs, agree_main, f1_num, f1_den = [], 0, 0.0, 0
    cases = _corpus()
    for ds, raw in cases:
        caption = normalize_utterance(raw, ds)
        ref = _ref_groups(caption)
        ours = _our_groups(caption)
        entry = {"caption": caption}
        exact_main = sorted(ref["main"]) == sorted(ours["main"])
        agree_main += exact_main
        for key in ref:
            a, b = _char_set(ref[key]), _char_set(ours[key])
            inter = len(a & b)
            f1 = (2 * inter / (len(a) + len(b))) if (a or b) else 1.0
            f1_num += f1
            f1_den += 1
            if a != b:
                entry[key] = {
                    "ref": [caption[s:e] for s, e in ref[key]],
                    "ours": [caption[s:e] for s, e in ours[key]],
                }
        if len(entry) > 1:
            diffs.append(entry)
    report = {
        "cases": len(cases),
        "main_exact_agreement": agree_main / len(cases),
        "mean_char_f1": f1_num / f1_den,
        "diffs": diffs,
    }
    with open("/tmp/decouple_vs_sngparser.json", "w") as f:
        json.dump(report, f, indent=2)
    print(
        f"main exact agreement {report['main_exact_agreement']:.3f}, "
        f"mean char F1 {report['mean_char_f1']:.3f}, "
        f"{len(diffs)}/{len(cases)} utterances differ somewhere "
        "(full diff at /tmp/decouple_vs_sngparser.json)"
    )
    assert report["main_exact_agreement"] >= 0.90
    assert report["mean_char_f1"] >= 0.80
