"""`jcf-cls` — folder-of-result-files -> merged result txt
(the reference's offline utility ``cls.py:6-23``): reads every txt in a
folder of per-shard top-5 outputs, cleans the impath column, and merges
them into one result file (later files win on key collisions).
"""

from __future__ import annotations

import argparse
import glob
import os

from jcf_tpu.infer.predict import load_txt_to_dict, process_line


def merge_results(folder: str, output: str) -> int:
    merged = {}
    for path in sorted(glob.glob(os.path.join(folder, "*.txt"))):
        merged.update(load_txt_to_dict(path))
    os.makedirs(os.path.dirname(output) or ".", exist_ok=True)
    with open(output, "w") as f:
        for key, values in merged.items():
            f.write(process_line(f"{key} {' '.join(values)}\n"))
    return len(merged)


def main() -> None:
    p = argparse.ArgumentParser(description="merge per-shard result files")
    p.add_argument("folder")
    p.add_argument("--output", default="final_results/result.txt")
    args = p.parse_args()
    n = merge_results(args.folder, args.output)
    print(f"merged {n} entries into {args.output}")


if __name__ == "__main__":
    main()
