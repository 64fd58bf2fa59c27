"""Round-5 scheduling-knob re-sweep at the shipped geometry.

VERDICT r4 #1(b) / ADVICE r4: every scheduling knob rejected in r4
(SUBTILES, GROUP_ATTN, PARGRID, ATTN_BATCHPAIRS) was A/B'd at the OLD
tile geometry (s_pad 56 and/or padded rows). This runner re-measures
each at the shipped default (S_ALIGN=16 + dense rows + conv1d + static
full), serialized on the one chip, cert/smoke off (throughput A/B only —
any adopted default gets a full certed run afterwards).

Usage: python scripts/sweep_r5.py [name ...]   (default: all)
Appends one line per config to /tmp/sweep_r5.log and prints a table.
"""

import json
import os
import subprocess
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

CONFIGS = [
    # name, extra env
    ("default", {}),
    ("batchpairs", {"JCF_BENCH_ATTN_BATCHPAIRS": "1"}),
    ("subtiles2", {"JCF_BENCH_SUBTILES": "2"}),
    ("group_attn32", {"JCF_BENCH_GROUP_ATTN": "32"}),
    ("group_mlp32", {"JCF_BENCH_GROUP_MLP": "32"}),
    ("group32", {"JCF_BENCH_GROUP": "32"}),
    ("group8", {"JCF_BENCH_GROUP": "8"}),
    ("mlp_nsplit2", {"JCF_BENCH_MLP_NSPLIT": "2"}),
    ("pargrid", {"JCF_BENCH_PARGRID": "1"}),
    ("block", {"JCF_BENCH_FUSE": "block"}),
    # r5: whole-block + hidden-dim chunking — targets the r4 block
    # rejection's named cause (the [rows, 3072] f32 hidden in VMEM)
    ("block+nsplit2", {"JCF_BENCH_FUSE": "block", "JCF_BENCH_MLP_NSPLIT": "2"}),
    ("block+nsplit4", {"JCF_BENCH_FUSE": "block", "JCF_BENCH_MLP_NSPLIT": "4"}),
    ("block+nsplit2+g32", {
        "JCF_BENCH_FUSE": "block", "JCF_BENCH_MLP_NSPLIT": "2",
        "JCF_BENCH_GROUP": "32"}),
    ("b2048", {"JCF_BENCH_BATCH": "2048"}),
    ("batchpairs+ga32", {
        "JCF_BENCH_ATTN_BATCHPAIRS": "1", "JCF_BENCH_GROUP_ATTN": "32"}),
]


def run_one(name: str, extra: dict) -> dict:
    env = dict(os.environ)
    env.update({"JCF_BENCH_CERT": "0", "JCF_BENCH_SMOKE": "0"})
    env.update(extra)
    proc = subprocess.run(
        [sys.executable, os.path.join(ROOT, "bench.py")],
        env=env, capture_output=True, text=True, timeout=900,
    )
    line = proc.stdout.strip().splitlines()[-1] if proc.stdout.strip() else ""
    try:
        rec = json.loads(line)
        val = rec["value"]
    except Exception:
        val = None
    row = {"name": name, "env": extra, "img_s": val,
           "rc": proc.returncode,
           "err_tail": proc.stderr.strip().splitlines()[-3:] if val is None else []}
    with open("/tmp/sweep_r5.log", "a") as f:
        f.write(json.dumps(row) + "\n")
    print(f"{name:18s} {val if val is not None else 'FAIL ' + str(proc.returncode)}",
          flush=True)
    return row


def main():
    names = sys.argv[1:]
    todo = [c for c in CONFIGS if not names or c[0] in names]
    rows = [run_one(n, e) for n, e in todo]
    print("\n== sweep_r5 results ==")
    for r in rows:
        print(f"{r['name']:18s} {r['img_s']}")


if __name__ == "__main__":
    main()
