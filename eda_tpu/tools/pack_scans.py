"""CLI for packing ScanNet scans into the pickle store.

Equivalent of the reference ``Pack_scan_files.py`` driving
``save_data`` (``src/joint_det_dataset.py:1249-1279``).

Usage:
    python -m eda_tpu.tools.pack_scans --scan_dir /path/to/scans \
        --split train --data_root data/
"""

from __future__ import annotations

import argparse
import os.path as osp


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--scan_dir", required=True)
    parser.add_argument("--data_root", default="data/")
    parser.add_argument("--split", default="train", choices=["train", "val", "test"])
    parser.add_argument("--processes", type=int, default=4)
    args = parser.parse_args()

    from eda_tpu.data.scannet import load_axis_alignments, pack_scans

    meta = osp.join(osp.dirname(osp.dirname(__file__)), "data", "meta")
    split_file = osp.join(meta, f"scannetv2_{args.split}.txt")
    with open(split_file) as f:
        scan_ids = [line.strip() for line in f if line.strip()]
    align_path = osp.join(args.data_root, "meta_data", "scans_axis_alignment_matrices.json")
    alignments = load_axis_alignments(align_path) if osp.exists(align_path) else {}

    out = osp.join(args.data_root, f"{args.split}_v3scans.pkl")
    scans = pack_scans(
        scan_ids, args.scan_dir, out, alignments, processes=args.processes
    )
    print(f"packed {len(scans)} scans -> {out}")


if __name__ == "__main__":
    main()
