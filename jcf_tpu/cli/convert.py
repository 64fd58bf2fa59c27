"""`jcf-convert` — torch checkpoint -> framework pkl
(the reference's ``pth_to_pkl.py:1-20``).

Reads a torch/torchscript/.pth/.pkl checkpoint, converts every tensor to
numpy, and writes a plain pickle loadable by ``load_state_dict_file``.
"""

from __future__ import annotations

import argparse
import pickle

import numpy as np


def convert(src: str, dst: str) -> int:
    from jcf_tpu.models.loader import load_state_dict_file

    sd = load_state_dict_file(src)
    with open(dst, "wb") as f:
        pickle.dump({k: np.asarray(v) for k, v in sd.items()}, f)
    return len(sd)


def main() -> None:
    p = argparse.ArgumentParser(description="torch checkpoint -> pkl converter")
    p.add_argument("src")
    p.add_argument("dst")
    args = p.parse_args()
    n = convert(args.src, args.dst)
    print(f"wrote {n} tensors to {args.dst}")


if __name__ == "__main__":
    main()
