"""Build the native host library: `python setup_native.py build` drops
`efg_tpu/native/libefg_host.so` (plain C ABI, loaded via ctypes)."""

import os
import subprocess
import sys


def build():
    root = os.path.dirname(os.path.abspath(__file__))
    out_dir = os.path.join(root, "efg_tpu", "native")
    os.makedirs(out_dir, exist_ok=True)
    out = os.path.join(out_dir, "libefg_host.so")
    src = os.path.join(root, "csrc", "efg_host.cpp")
    # -ffp-contract=off: no FMA contraction — the geometry predicates
    # (cross-product signs) must round exactly like numpy's mult-then-sub
    cmd = ["g++", "-O3", "-march=native", "-ffp-contract=off", "-shared",
           "-fPIC", "-std=c++17", src, "-o", out]
    print(" ".join(cmd))
    subprocess.check_call(cmd)
    print(f"Built {out}")


if __name__ == "__main__":
    build()
