"""Differential parity tests for the data pipeline against the ACTUAL
reference ``src/joint_det_dataset.py`` (loaded with wandb/sng_parser/plyfile
stubs — none of its module-level code needs them on this image).

Oracles exercised here:

* ``get_positive_map`` (:1150-1177) — char-span -> token map with the
  +-1/+-2 probing and the per-span normalize-then-sum contract;
* ``Joint3DDataset._get_token_positive_map_by_parse`` (:579-680) — the full
  6-map assembly from decoupled graph nodes, incl. the SR3D auxi row;
* ``Joint3DDataset._get_token_positive_map`` (:520-573) — the scannet
  detection-prompt span search;
* ``rot_x/rot_y/rot_z`` + ``box2points``/``points2box`` (:1180-1241) and
  ``Joint3DDataset._augment`` (:421-466) — geometry parity on recorded
  parameters;
* ``ScannetDatasetConfig(485)`` (data/model_util_scannet.py:28-33) — the
  curated class vocabulary baked into ``eda_tpu/data/meta/class485_vocab.tsv``.

Both sides tokenize through OUR deterministic tokenizer (the reference's
char_to_token contract is the only thing get_positive_map needs), so these
tests pin the map-construction algebra, not RoBERTa BPE (that parity lives
in test_roberta_hf_parity.py).
"""

from __future__ import annotations

import importlib
import importlib.machinery
import importlib.util
import sys
import types

import numpy as np
import pytest

torch = pytest.importorskip("torch")

REF = "/root/reference"


def _stub_module(name):
    """A stub with a real ModuleSpec: libraries probe optional deps with
    importlib.util.find_spec, which raises on __spec__ = None."""
    mod = types.ModuleType(name)
    mod.__spec__ = importlib.machinery.ModuleSpec(name, loader=None)
    return mod


@pytest.fixture(scope="module")
def ref_jd():
    for name in ("wandb", "sng_parser"):
        if name not in sys.modules:
            mod = _stub_module(name)
            if name == "sng_parser":
                mod.parse = lambda *a, **k: ({}, [])
            sys.modules[name] = mod
    try:
        import plyfile  # noqa: F401
    except ImportError:
        pf = _stub_module("plyfile")
        pf.PlyData = object
        pf.PlyElement = object
        sys.modules["plyfile"] = pf
    for pkg_name, path in (("data", f"{REF}/data"), ("src", f"{REF}/src")):
        if pkg_name not in sys.modules:
            pkg = _stub_module(pkg_name)
            pkg.__path__ = [path]
            sys.modules[pkg_name] = pkg
    return importlib.import_module("src.joint_det_dataset")


class _Tokenized:
    """HF BatchEncoding stand-in over our TokenBatch (single caption)."""

    def __init__(self, batch):
        self._batch = batch

    def char_to_token(self, idx):
        return self._batch.char_to_token(0, int(idx))


class _Tokenizer:
    """RobertaTokenizerFast stand-in: batch_encode_plus -> char_to_token."""

    def __init__(self, tok, max_len=256):
        self._tok = tok
        self._max_len = max_len

    def batch_encode_plus(self, texts, **_kw):
        return _Tokenized(self._tok.encode_batch(texts, max_len=self._max_len))


def _our_tok():
    from eda_tpu.models.tokenizer import SimpleTokenizer

    return SimpleTokenizer(4096)


WORDS = (
    "the a brown wooden chair table desk window door shelf lamp trash can "
    "next to left of right behind under near above between it this that"
).split()


def _random_caption(rng, n=12):
    return " ".join(WORDS[i] for i in rng.integers(0, len(WORDS), n))


def _random_spans(rng, caption, k):
    """Word-aligned spans plus deliberately misaligned ones (probing path)."""
    starts = [0] + [i + 1 for i, ch in enumerate(caption) if ch == " "]
    spans = []
    for _ in range(k):
        w = int(rng.integers(0, len(starts)))
        s = starts[w]
        e = caption.find(" ", s)
        e = len(caption) if e < 0 else e
        jitter = int(rng.integers(-1, 2))
        spans.append((max(0, s + jitter), min(len(caption), e + jitter)))
    return spans


@pytest.mark.parametrize("seed", [0, 1, 2, 3])
def test_get_positive_map_parity(ref_jd, seed):
    """spans_to_map == reference get_positive_map(...).sum(axis=0) on random
    word-aligned AND off-by-one spans (probing fallbacks), via the same
    char_to_token table."""
    from eda_tpu.data.positive_maps import spans_to_map

    rng = np.random.default_rng(seed)
    tok = _our_tok()
    for _ in range(10):
        caption = _random_caption(rng)
        batch = tok.encode_batch([caption], max_len=256)
        spans = _random_spans(rng, caption, int(rng.integers(1, 5)))
        ref_map = ref_jd.get_positive_map(
            _Tokenized(batch), np.asarray(spans, float)
        ).sum(axis=0)
        ours = spans_to_map(batch, 0, spans)
        np.testing.assert_allclose(ours, ref_map, atol=1e-6)


def _graph_node_from_decoupled(d):
    nodes = [
        {
            "node_id": 0,
            "node_type": "Object",
            "target_char_span": [list(s) for s in d["main"]],
            "mod_char_span": [list(s) for s in d["modifiers"]],
            "pron_char_span": [list(s) for s in d["pronouns"]],
            "rel_char_span": [list(s) for s in d["relations"]],
        }
    ]
    if d["others"]:
        nodes.append(
            {
                "node_id": 1,
                "node_type": "Object",
                "target_char_span": [list(s) for s in d["others"]],
            }
        )
    return nodes


CAPTIONS = [
    "the brown chair next to the table",
    "it is a tall wooden shelf behind the desk near the window",
    "the trash can between the door and the lamp",
    "this is the second chair from the left under the window",
]


@pytest.mark.parametrize("dataset", ["sr3d", "scanrefer"])
@pytest.mark.parametrize("caption", CAPTIONS)
def test_token_positive_map_by_parse_parity(ref_jd, dataset, caption):
    """Full 6-map assembly matches _get_token_positive_map_by_parse on the
    same decoupled spans: row 0 of every component map, plus the SR3D rule
    that puts the auxi map in row 1 of the target map."""
    from eda_tpu.data.decouple import decoupled_spans
    from eda_tpu.data.positive_maps import build_positive_maps

    tok = _our_tok()
    d = decoupled_spans(caption)
    anno = {
        "utterance": caption,
        "dataset": dataset,
        "graph_node": _graph_node_from_decoupled(d),
        "graph_edge": [],
        "auxi_entity": {"target_char_span": [list(s) for s in d["auxi"]]}
        if d["auxi"]
        else {"target_char_span": []},
    }
    stub = types.SimpleNamespace(tokenizer=_Tokenizer(tok))
    auxi_box = np.zeros(6) if d["auxi"] else None
    (
        _tspan, ref_target, ref_modify, ref_pron, ref_other, ref_auxi, ref_rel
    ) = ref_jd.Joint3DDataset._get_token_positive_map_by_parse(
        stub, anno, auxi_box
    )

    batch = tok.encode_batch([caption], max_len=256)
    ours = build_positive_maps(batch, 0, d)
    np.testing.assert_allclose(ours["main"], ref_target[0], atol=1e-6)
    np.testing.assert_allclose(ours["modifiers"], ref_modify[0], atol=1e-6)
    np.testing.assert_allclose(ours["pronouns"], ref_pron[0], atol=1e-6)
    np.testing.assert_allclose(ours["others"], ref_other[0], atol=1e-6)
    np.testing.assert_allclose(ours["relations"], ref_rel[0], atol=1e-6)
    np.testing.assert_allclose(ours["auxi"], ref_auxi[0], atol=1e-6)
    if dataset == "sr3d" and d["auxi"]:
        np.testing.assert_allclose(ref_target[1], ours["auxi"], atol=1e-6)
    else:
        assert ref_target[1].sum() == 0


def test_scannet_prompt_span_search_parity(ref_jd):
    """The detection-prompt positive map (class-name span search + map)
    matches _get_token_positive_map on a ' . '-joined prompt."""
    from eda_tpu.data.positive_maps import spans_to_map

    tok = _our_tok()
    names = ["cabinet", "bed", "chair", "shower curtain", "other furniture"]
    caption = " . ".join(names)
    anno = {"utterance": caption, "target": list(names)}
    stub = types.SimpleNamespace(
        tokenizer=_Tokenizer(tok), detect_intermediate=False
    )
    tokens_positive, ref_map = ref_jd.Joint3DDataset._get_token_positive_map(
        stub, anno
    )[:2]

    batch = tok.encode_batch([caption], max_len=256)
    padded = " " + caption + " "
    for row, name in enumerate(names):
        start = padded.find(" " + name + " ")
        assert start >= 0
        span = (start, start + len(name))
        assert tuple(tokens_positive[row]) == span
        ours = spans_to_map(batch, 0, [span])
        np.testing.assert_allclose(ours, ref_map[row], atol=1e-6)


# ---------------------------------------------------------------------------
# Geometry: rotations, box corners, _augment
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("axis", [0, 1, 2])
def test_rot_parity(ref_jd, axis):
    from eda_tpu.data.augment import _rot

    rng = np.random.default_rng(axis)
    pc = rng.normal(size=(40, 3))
    theta = float(rng.uniform(-180, 180))
    ref_fn = (ref_jd.rot_x, ref_jd.rot_y, ref_jd.rot_z)[axis]
    np.testing.assert_allclose(
        pc @ _rot(theta, axis).T, ref_fn(pc, theta), atol=1e-12
    )


def test_apply_boxes_matches_reference_pipeline_no_flip(ref_jd):
    """apply_boxes == the reference's box2points -> rot_z/x/y -> shift ->
    scale -> points2box chain when no flip fires (with a flip the reference
    applies it AFTER the rotations, inconsistently with its own point cloud
    — a documented deviation, see augment.Augmentation.apply_boxes)."""
    from eda_tpu.data.augment import Augmentation, _rot

    rng = np.random.default_rng(5)
    boxes = np.concatenate(
        [rng.uniform(-2, 2, (7, 3)), rng.uniform(0.2, 2.0, (7, 3))], -1
    )
    tz, tx, ty = rng.uniform(-90, 90), rng.uniform(-2.5, 2.5), rng.uniform(-2.5, 2.5)
    shift = rng.random(3) - 0.5
    scale = 0.98 + 0.04 * rng.random()

    pts = ref_jd.box2points(boxes).reshape(-1, 3)
    pts = ref_jd.rot_z(pts, tz)
    pts = ref_jd.rot_x(pts, tx)
    pts = ref_jd.rot_y(pts, ty)
    pts += shift
    pts *= scale
    ref_boxes = ref_jd.points2box(pts.reshape(-1, 8, 3))

    aug = Augmentation(
        rotation=_rot(ty, 1) @ _rot(tx, 0) @ _rot(tz, 2),
        flip_x=False,
        flip_y=False,
        shift=shift,
        scale=scale,
    )
    np.testing.assert_allclose(aug.apply_boxes(boxes), ref_boxes, atol=1e-9)


@pytest.mark.parametrize("rotate", [False, True])
def test_augment_points_parity(ref_jd, rotate):
    """apply_points reproduces the reference _augment's point transform
    bit-for-bit given the parameters _augment actually sampled (flips ->
    rotations -> +noise -> +shift -> *scale; the noise IS scaled)."""
    from eda_tpu.data.augment import Augmentation, _rot

    rng = np.random.default_rng(17)
    pc = rng.normal(size=(100, 3))
    stub = types.SimpleNamespace(mean_rgb=np.zeros(3))
    np.random.seed(42 + rotate)
    ref_pc, _color, aug_params = ref_jd.Joint3DDataset._augment(
        stub, pc.copy(), None, rotate
    )

    aug = Augmentation(
        rotation=_rot(aug_params["theta_y"], 1)
        @ _rot(aug_params["theta_x"], 0)
        @ _rot(float(aug_params["theta_z"]), 2),
        flip_x=bool(aug_params.get("yz_flip", False)),
        flip_y=bool(aug_params.get("xz_flip", False)),
        shift=aug_params["shift"][0],
        scale=aug_params["scale"],
    )
    ours = aug.apply_points(pc, noise=aug_params["noise"])
    np.testing.assert_allclose(ours, ref_pc, atol=1e-9)


# ---------------------------------------------------------------------------
# 485-class vocabulary
# ---------------------------------------------------------------------------


def test_class485_vocab_matches_reference():
    """class485_vocab.tsv == ScannetDatasetConfig(485): names per rank, TSV
    ids, and the rank mapping used for det_class_ids."""
    spec = importlib.util.spec_from_file_location(
        "_ref_mus", f"{REF}/data/model_util_scannet.py"
    )
    mus = importlib.util.module_from_spec(spec)
    sys.modules["_ref_mus"] = mus
    spec.loader.exec_module(mus)
    DC = mus.ScannetDatasetConfig(485)

    from eda_tpu.data.class_config import class485_names, dc485

    cfg = dc485()
    assert class485_names() == [DC.class2type[i] for i in range(485)]
    assert cfg.nyu40ids == [int(i) for i in DC.nyu40ids]
    assert cfg.nyu40id2class == {
        int(k): v for k, v in DC.nyu40id2class.items()
    }


def test_instance_label_to_class485_matches_reference_lookup(ref_jd):
    """instance_label_to_class485(label) == DC.nyu40id2class[label_map[label]]
    for every TSV category in the 485 vocabulary (the exact composition the
    reference applies to GroupFree classes, joint_det_dataset.py:807-809)."""
    from eda_tpu.data.class_config import (
        dc485,
        instance_label_in_class485,
        instance_label_to_class485,
        raw_to_tsv_id,
    )

    cfg = dc485()
    checked = 0
    for label, tsv_id in raw_to_tsv_id().items():
        if tsv_id in cfg.nyu40id2class:
            assert instance_label_in_class485(label)
            assert instance_label_to_class485(label) == cfg.nyu40id2class[tsv_id]
            checked += 1
        else:
            assert not instance_label_in_class485(label)
    assert checked >= 400


# ---------------------------------------------------------------------------
# Annotation loaders (sr3d / nr3d / scanrefer)
# ---------------------------------------------------------------------------


def _fake_parse(caption):
    """sng_parser stand-in: a valid main node so Scene_graph_parse never
    prefixes the caption — the loader mechanics under test are the filters,
    distractors, and unique flags, not the parse."""
    return (
        [
            {
                "node_id": 0,
                "node_type": "Object",
                "target_char_span": [[0, min(3, len(caption))]],
                "mod_char_span": [],
                "pron_char_span": [],
                "rel_char_span": [],
            }
        ],
        [],
    )


class _RefScan:
    def __init__(self, labels):
        self.three_d_objects = [{"instance_label": l} for l in labels]

    def get_object_instance_label(self, ind):
        return self.three_d_objects[ind]["instance_label"]


class _OurScan:
    """GroundingDataset-shaped scan view over the same objects."""

    def __init__(self, labels):
        self.three_d_objects = [
            {"object_id": i, "instance_label": l} for i, l in enumerate(labels)
        ]

    def object_by_id(self, object_id):
        return object_id if object_id < len(self.three_d_objects) else None


# 'sofa' exercises the name-keyed quirk: nyu40class 'sofa' is not a
# DC18.type2class key ('couch' is), so sofas count as class 17
SCENE_LABELS = {
    "scene0000_00": ["chair", "chair", "sofa", "table", "sofa"],
    "scene0000_01": ["table", "chair", "trash can"],
}


def _write_loader_fixtures(tmp_path):
    import csv as _csv
    import json as _json

    rid = tmp_path / "ReferIt3D"
    rid.mkdir()
    sr3d_cols = [
        "scan_id", "target_id", "distractor_ids", "utterance",
        "instance_type", "anchors_types", "anchor_ids",
        "mentions_target_class",
    ]
    rows = [
        ["scene0000_00", "1", "[0]", "the chair near the sofa", "chair",
         "['sofa']", "[2]", "True"],
        ["scene0000_00", "2", "[4]", "the sofa by the table", "sofa",
         "['table']", "[3]", "true"],
        ["scene0000_00", "3", "[]", "ignore me", "table", "[]", "[]",
         "False"],
        # not in sr3d_train_scans.txt -> filtered out by scan membership
        ["scene9999_00", "0", "[]", "the ghost chair", "chair", "[]", "[]",
         "True"],
    ]
    with open(rid / "sr3d.csv", "w", newline="") as f:
        w = _csv.writer(f)
        w.writerow(sr3d_cols)
        w.writerows(rows)

    nr3d_cols = ["scan_id", "target_id", "instance_type", "utterance",
                 "correct_guess"]
    nrows = [
        ["scene0000_00", "0", "chair", "the chair under the table", "True"],
        ["scene0000_00", "2", "sofa", "the sofa near the wall", "False"],
        ["scene9999_00", "0", "chair", "chair not in nr3d train scans",
         "True"],
    ]
    with open(rid / "nr3d.csv", "w", newline="") as f:
        w = _csv.writer(f)
        w.writerow(nr3d_cols)
        w.writerows(nrows)

    sr = tmp_path / "ScanRefer"
    sr.mkdir()
    (sr / "ScanRefer_filtered_train.txt").write_text(
        "scene0000_00\nscene0000_01\n"
    )
    annos = [
        {"scene_id": "scene0000_00", "object_id": "2", "ann_id": "0",
         "token": ["the", "sofa", "near", "the", "table"],
         "object_name": "sofa"},
        {"scene_id": "scene0000_00", "object_id": "4", "ann_id": "1",
         "token": ["the", "other", "sofa"], "object_name": "sofa"},
        {"scene_id": "scene0000_01", "object_id": "2", "ann_id": "0",
         "token": ["the", "trash", "can"], "object_name": "trash_can"},
        {"scene_id": "scene1111_11", "object_id": "0", "ann_id": "0",
         "token": ["not", "in", "txt"], "object_name": "chair"},
    ]
    (sr / "ScanRefer_filtered_train.json").write_text(_json.dumps(annos))


def _ref_loader_stub(ref_jd, tmp_path, split="train"):
    import csv as _csv

    label_mapclass = {}
    with open(f"{REF}/data/meta_data/scannetv2-labels.combined.tsv") as f:
        for row in _csv.DictReader(f, delimiter="\t"):
            label_mapclass[row["raw_category"]] = row["nyu40class"]
    stub = types.SimpleNamespace(
        split=split,
        data_path=str(tmp_path) + "/",
        wo_obj_name="None",
        overfit=False,
        scans={k: _RefScan(v) for k, v in SCENE_LABELS.items()},
        label_mapclass=label_mapclass,
    )
    return stub


_LOADER_KEYS = (
    "scan_id", "target_id", "distractor_ids", "target", "anchors",
    "anchor_ids", "utterance",
)


def _loader_view(annos, keys=_LOADER_KEYS):
    return [{k: a[k] for k in keys if k in a} for a in annos]


def test_sr3d_loader_parity(ref_jd, tmp_path, monkeypatch):
    """Row filters (scan membership via sr3d_train_scans.txt,
    mentions_target_class string compare) and every anno field match
    load_sr3d_annos (joint_det_dataset.py:158-189)."""
    from eda_tpu.data import annotations as anno_lib

    _write_loader_fixtures(tmp_path)
    sys.modules["sng_parser"].parse = _fake_parse
    monkeypatch.chdir(REF)  # reference reads data/meta_data/* relative paths
    ref_annos = ref_jd.Joint3DDataset.load_sr3d_annos(
        _ref_loader_stub(ref_jd, tmp_path)
    )
    ours = anno_lib.load_sr3d(str(tmp_path), "train")
    assert _loader_view(ours) == _loader_view(ref_annos)
    assert [a["dataset"] for a in ours] == ["sr3d", "sr3d"]


def test_nr3d_loader_parity(ref_jd, tmp_path, monkeypatch):
    """Scan membership + correct_guess semantics + fine-grained distractors
    match load_nr3d_annos (joint_det_dataset.py:191-239) for train (keeps
    wrong guesses) and val (drops them, maps to the test scan list)."""
    from eda_tpu.data import annotations as anno_lib
    from eda_tpu.data.class_config import instance_label_to_scanrefer18
    from eda_tpu.data.dataset import GroundingDataset  # noqa: F401

    _write_loader_fixtures(tmp_path)
    sys.modules["sng_parser"].parse = _fake_parse
    monkeypatch.chdir(REF)
    stub = _ref_loader_stub(ref_jd, tmp_path)
    ref_annos = ref_jd.Joint3DDataset.load_nr3d_annos(stub)

    ours = anno_lib.load_nr3d(str(tmp_path), "train")
    scans = {k: _OurScan(v) for k, v in SCENE_LABELS.items()}
    anno_lib.compute_scanrefer_flags(
        ours, scans, instance_label_to_scanrefer18
    )
    assert _loader_view(ours) == _loader_view(ref_annos)
    # train keeps the correct_guess=False row, drops out-of-list scans
    assert len(ours) == 2


def test_scanrefer_loader_parity(ref_jd, tmp_path, monkeypatch):
    """ScanRefer JSON load + the NAME-keyed 18-class distractor/unique pass
    (both sofas are class 17, so they are mutual distractors and non-unique;
    joint_det_dataset.py:243-330)."""
    from eda_tpu.data import annotations as anno_lib
    from eda_tpu.data.class_config import instance_label_to_scanrefer18

    _write_loader_fixtures(tmp_path)
    sys.modules["sng_parser"].parse = _fake_parse
    monkeypatch.chdir(REF)
    stub = _ref_loader_stub(ref_jd, tmp_path)
    ref_annos = ref_jd.Joint3DDataset.load_scanrefer_annos(stub)

    ours = anno_lib.load_scanrefer(str(tmp_path), "train")
    scans = {k: _OurScan(v) for k, v in SCENE_LABELS.items()}
    anno_lib.compute_scanrefer_flags(
        ours, scans, instance_label_to_scanrefer18
    )
    assert _loader_view(ours) == _loader_view(ref_annos)
    assert [a["unique"] for a in ours] == [a["unique"] for a in ref_annos]
    # the sofa pair: distractors of object 2 include 4 and vice versa
    by_tid = {a["target_id"]: a for a in ours if a["scan_id"] == "scene0000_00"}
    assert by_tid[2]["distractor_ids"] == [4]
    assert by_tid[4]["distractor_ids"] == [2]


# ---------------------------------------------------------------------------
# View-dependence flags / rotation gates / relation lookup
# ---------------------------------------------------------------------------

GATE_UTTERANCES = [
    "the chair to the left of the desk",
    "left of the desk is the chair",  # starts with a rel word
    "the mug next to the pot",
    "the couch lying on the floor",
    "it is behind the door",
    "the table . it is far away from the window",
    "a leftmost chair",
    "the shelf across from the bed",
    "the chair , facing the wall",
    "plain chair with no relations",
]


def test_view_dep_and_rotation_gate_parity(ref_jd):
    """is_view_dependent == _is_view_dep (word set), rotate_natural ==
    _augment_nr3d (substring with the leading-space quirk), and find_rel ==
    _find_rel (longest REL_ALIASES match) on every gate utterance."""
    from eda_tpu.data.augment import is_view_dependent, rotate_natural
    from eda_tpu.data.vocab import find_rel

    for utt in GATE_UTTERANCES:
        assert is_view_dependent(utt) == ref_jd.Joint3DDataset._is_view_dep(
            utt
        ), utt
        assert rotate_natural(utt) == ref_jd.Joint3DDataset._augment_nr3d(
            utt
        ), utt
        assert find_rel(utt) == ref_jd.Joint3DDataset._find_rel(utt), utt


def test_sr3d_rotation_gate_matches_reference_composition(ref_jd):
    """rotate_sr3d == (_find_rel(utterance) not in VIEW_DEP_RELS), the
    composition at joint_det_dataset.py:497-505."""
    import importlib.util as ilu

    from eda_tpu.data.augment import rotate_sr3d

    spec = ilu.spec_from_file_location(
        "_ref_sc", f"{REF}/src/scannet_classes.py"
    )
    sc = ilu.module_from_spec(spec)
    sys.modules["_ref_sc"] = sc
    spec.loader.exec_module(sc)
    for utt in GATE_UTTERANCES:
        want = ref_jd.Joint3DDataset._find_rel(utt) not in sc.VIEW_DEP_RELS
        assert rotate_sr3d(utt) == want, utt


# ---------------------------------------------------------------------------
# Scan loading (visual_data_handlers.py)
# ---------------------------------------------------------------------------


def _write_fake_scan(tmp_path, scan_id="scene0000_00", n=2000, seed=3):
    import json as _json

    from eda_tpu.data.ply import write_ply_vertices

    rng = np.random.default_rng(seed)
    d = tmp_path / scan_id
    d.mkdir()
    xyz = rng.uniform(-2, 2, (n, 3)).astype(np.float32)
    rgb = rng.integers(0, 255, (n, 3)).astype(np.uint8)
    write_ply_vertices(
        str(d / f"{scan_id}_vh_clean_2.ply"),
        {
            "x": xyz[:, 0], "y": xyz[:, 1], "z": xyz[:, 2],
            "red": rgb[:, 0], "green": rgb[:, 1], "blue": rgb[:, 2],
        },
    )
    seg = np.zeros(n, int)
    seg[:300] = 1
    seg[300:700] = 2
    seg[700:800] = 3
    with open(d / f"{scan_id}_vh_clean_2.0.010000.segs.json", "w") as f:
        _json.dump({"segIndices": seg.tolist()}, f)
    with open(d / f"{scan_id}.aggregation.json", "w") as f:
        _json.dump(
            {
                "segGroups": [
                    {"objectId": 0, "segments": [1], "label": "chair"},
                    {"objectId": 1, "segments": [2, 3], "label": "table"},
                    {"objectId": 2, "segments": [3, 2], "label": "table"},
                ]
            },
            f,
        )


class _ShimPlyData:
    """plyfile.PlyData stand-in backed by our own PLY reader, so the
    reference Scan loader runs without the plyfile package."""

    def __init__(self, verts):
        self.elements = [types.SimpleNamespace(data=verts)]

    @classmethod
    def read(cls, path):
        from eda_tpu.data.ply import read_ply_vertices

        return cls(read_ply_vertices(str(path)))


def test_scan_loader_parity(ref_jd, tmp_path, monkeypatch):
    """Full Scan load parity on a fabricated scene: seed-1184 downsample
    choices, axis alignment, colors, per-object point sets after the
    choices remap, the duplicate-object filter (segments [2,3] vs [3,2]
    give the same point set), and AABBs
    (visual_data_handlers.py:69-178,246-259)."""
    import importlib as _il
    import json as _json

    from eda_tpu.data.scannet import Scan

    scan_id = "scene0000_00"  # a real id: the axis-alignment JSON needs it
    _write_fake_scan(tmp_path, scan_id)

    vdh = _il.import_module("src.visual_data_handlers")
    monkeypatch.setattr(vdh, "PlyData", _ShimPlyData)
    monkeypatch.chdir(REF)  # ScanNetMappings reads data/meta_data/* via cwd
    ref_scan = vdh.Scan(scan_id, str(tmp_path))

    with open(f"{REF}/data/meta_data/scans_axis_alignment_matrices.json") as f:
        matrix = _json.load(f)[scan_id]
    ours = Scan(scan_id, str(tmp_path), axis_alignment=np.asarray(matrix))

    np.testing.assert_allclose(ours.pc, ref_scan.pc, atol=2e-4)
    np.testing.assert_allclose(ours.color, ref_scan.color, atol=1e-7)
    np.testing.assert_array_equal(ours.choices, ref_scan.choices)

    assert len(ours.three_d_objects) == len(ref_scan.three_d_objects) == 2
    for o_ours, o_ref in zip(ours.three_d_objects, ref_scan.three_d_objects):
        assert o_ours["object_id"] == o_ref["object_id"]
        assert o_ours["instance_label"] == o_ref["instance_label"]
        assert set(o_ours["points"].tolist()) == set(o_ref["points"].tolist())
        # reference boxes are (min, max) corners, converted to cxcyczwhd by
        # the dataset (_get_target_boxes, joint_det_dataset.py:703-707)
        ref_box = np.asarray(
            ref_scan.get_object_bbox(o_ref["object_id"])
        ).reshape(-1)
        ref_cxyzwhd = np.concatenate(
            [(ref_box[:3] + ref_box[3:]) * 0.5, ref_box[3:] - ref_box[:3]]
        )
        np.testing.assert_allclose(
            ours.get_object_bbox(o_ours["object_id"]), ref_cxyzwhd, atol=2e-4
        )


# ---------------------------------------------------------------------------
# Detected-box loader + augmentation co-transform (_get_detected_objects)
# ---------------------------------------------------------------------------


def _write_groupfree_npy(tmp_path, scan_id, rng, split="train"):
    d = tmp_path / "group_free_pred_bboxes" / f"group_free_pred_bboxes_{split}"
    d.mkdir(parents=True, exist_ok=True)
    lo = rng.uniform(-2, 0, (5, 3))
    hi = lo + rng.uniform(0.3, 1.5, (5, 3))
    corners = np.concatenate([lo, hi], -1).astype(np.float32)
    classes = ["chair", "table", "sofa", "trash can", "lamp"]
    np.save(
        d / f"{scan_id}.npy",
        {"box": corners, "class": classes, "logits": np.zeros((5, 485))},
    )
    return corners, classes


def _ref_det_stub(ref_jd, tmp_path, augment):
    import csv as _csv

    label_map = {}
    with open(f"{REF}/data/meta_data/scannetv2-labels.combined.tsv") as f:
        for row in _csv.DictReader(f, delimiter="\t"):
            label_map[row["raw_category"]] = int(row["id"])
    return types.SimpleNamespace(
        data_path=str(tmp_path) + "/",
        butd=True,
        butd_cls=False,
        augment=augment,
        augment_det=False,
        split="train",
        label_map=label_map,
    )


def test_detected_objects_loader_parity_no_flip(ref_jd, tmp_path):
    """_get_detected_objects parity without flips: box conversion, 485-way
    class ids, and the rot/shift/scale co-transform all match
    (joint_det_dataset.py:785-835)."""
    from eda_tpu.data.augment import Augmentation, _rot
    from eda_tpu.data.class_config import instance_label_to_class485

    rng = np.random.default_rng(9)
    scan_id = "scene0000_00"
    corners, classes = _write_groupfree_npy(tmp_path, scan_id, rng)
    augmentations = {
        "theta_z": 37.0, "theta_x": 1.5, "theta_y": -2.0,
        "yz_flip": False, "xz_flip": False,
        "shift": np.array([[0.1, -0.2, 0.3]]), "scale": 1.01,
    }
    stub = _ref_det_stub(ref_jd, tmp_path, augment=True)
    ref_boxes, ref_mask, ref_cids, _ = ref_jd.Joint3DDataset._get_detected_objects(
        stub, "train", scan_id, augmentations
    )

    boxes = np.concatenate(
        [(corners[:, :3] + corners[:, 3:]) / 2, corners[:, 3:] - corners[:, :3]],
        -1,
    )
    aug = Augmentation(
        rotation=_rot(-2.0, 1) @ _rot(1.5, 0) @ _rot(37.0, 2),
        flip_x=False, flip_y=False,
        shift=np.array([0.1, -0.2, 0.3]), scale=1.01,
    )
    ours = aug.apply_boxes(boxes)
    np.testing.assert_allclose(ours, ref_boxes[:5], atol=1e-5)
    assert not ref_mask[5:].any() and ref_mask[:5].all()
    want_cids = [instance_label_to_class485(c) for c in classes]
    assert ref_cids[:5].astype(int).tolist() == want_cids


def test_detected_box_flip_deviation_documented(ref_jd, tmp_path):
    """Under a flip the reference rotates THEN flips detected boxes while
    flipping its point cloud BEFORE rotating — leaving the boxes rotated
    away from the scene (augment.Augmentation.apply_boxes docstring). We
    keep boxes consistent with the cloud: this test pins that the two
    genuinely differ under a flip AND that ours matches the point
    transform."""
    from eda_tpu.data.augment import Augmentation, _rot

    rng = np.random.default_rng(10)
    scan_id = "scene0000_00"
    corners, _ = _write_groupfree_npy(tmp_path, scan_id, rng)
    augmentations = {
        "theta_z": 95.0, "theta_x": 0.0, "theta_y": 0.0,
        "yz_flip": True, "xz_flip": False,
        "shift": np.array([[0.0, 0.0, 0.0]]), "scale": 1.0,
    }
    stub = _ref_det_stub(ref_jd, tmp_path, augment=True)
    ref_boxes, _, _, _ = ref_jd.Joint3DDataset._get_detected_objects(
        stub, "train", scan_id, augmentations
    )

    boxes = np.concatenate(
        [(corners[:, :3] + corners[:, 3:]) / 2, corners[:, 3:] - corners[:, :3]],
        -1,
    )
    aug = Augmentation(
        rotation=_rot(95.0, 2), flip_x=True, flip_y=False,
        shift=np.zeros(3), scale=1.0,
    )
    ours = aug.apply_boxes(boxes)
    # the deviation is real: reference boxes land elsewhere under the flip
    assert np.abs(ours - ref_boxes[:5]).max() > 0.5
    # and ours rides the SAME composite as the point cloud
    pts = ref_jd.box2points(boxes).reshape(-1, 3)
    pts[:, 0] = -pts[:, 0]  # flip FIRST, like the reference's _augment
    pts = ref_jd.rot_z(pts, 95.0)
    want = ref_jd.points2box(pts.reshape(-1, 8, 3))
    np.testing.assert_allclose(ours, want, atol=1e-5)


# ---------------------------------------------------------------------------
# Typo-table normalization (Scene_graph_parse's caption rewriting)
# ---------------------------------------------------------------------------

TYPO_UTTERANCES = [
    "it's the 2-tiered shelf , next to the 4-drawers dresser .",
    "the 5-drawer chest by the 8-hole rack and the 7-shaped desk .",
    "a 2-door cabinet with a 3-compartment organizer on the computer/ desk .",
    "the 3-tier stand near the 3-seater couch and the 4-seat bench .",
    "theses chairs i'm looking at are brown .",
]

NR3D_TYPO_UTTERANCES = [
    "the pillow; it's on the left-hand side (near the wheel-chair)",
    "you're looking for the lamp. thats the one... isn't it?",
    "doesnt matter which; itis the chair youre facing",
    "Don't pick the one that cant be seen; they arent visible",
    'the "big" mirror: $100 #1 choice / it’s great! id the room',
]


@pytest.mark.parametrize("dataset,utterances", [
    ("scanrefer", TYPO_UTTERANCES),
    ("nr3d", NR3D_TYPO_UTTERANCES),
    ("sr3d", TYPO_UTTERANCES),
])
def test_typo_normalization_parity(ref_jd, dataset, utterances):
    """normalize_utterance == the caption rewriting Scene_graph_parse
    applies in place (joint_det_dataset.py:1313-1373), for the ScanRefer
    table (every dataset) and the NR3D-only punctuation/contraction table,
    with a parse stub that never prefixes."""
    from eda_tpu.data.annotations import normalize_utterance

    sys.modules["sng_parser"].parse = _fake_parse
    for utt in utterances:
        annos = [{"utterance": utt, "dataset": dataset}]
        ref_jd.Scene_graph_parse(annos)
        assert normalize_utterance(utt, dataset) == annos[0]["utterance"], utt
